"""Property test for the native encrypted-XLS path: arbitrary small
tables survive author -> RC4 encrypt -> CFB wrap -> CFB read ->
verifier check -> decrypt -> BIFF8 parse, exactly.

The generator (tools/make_xls_fixture.py) and the reader
(sources/xls_native.py) share only the key-derivation helpers — the
record writers and parsers are independent code, so a round-trip
failure localizes a real spec violation on one side.
"""

from __future__ import annotations

import sys
from pathlib import Path

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from open_data_pipelines_spark.sources.xls_native import (  # noqa: E402
    read_encrypted_xls_native,
)
from tools.make_xls_fixture import (  # noqa: E402
    PASSWORD,
    SALT,
    build_workbook_stream,
    rc4_crypt_stream,
    write_cfb,
)

cell_text = st.text(
    alphabet=st.characters(codec="utf-8", categories=("L", "N", "P", "Zs")),
    min_size=1,
    max_size=24,
).filter(lambda s: s.strip() == s and s.strip() != "")
cell_float = st.floats(allow_nan=False, allow_infinity=False, width=64)
cell = st.one_of(cell_text, cell_float)


@st.composite
def tables(draw):
    n_cols = draw(st.integers(1, 5))
    n_rows = draw(st.integers(1, 8))
    headers = draw(
        st.lists(cell_text, min_size=n_cols, max_size=n_cols, unique=True)
    )
    rows = [
        tuple(draw(cell) for _ in range(n_cols)) for _ in range(n_rows)
    ]
    return headers, rows


@settings(max_examples=25, deadline=None)
@given(tables(), st.booleans())
def test_author_encrypt_decrypt_roundtrip(tmp_path_factory, table, encrypted):
    headers, rows = table
    stream = build_workbook_stream(
        encrypted=encrypted, pad=encrypted, headers=headers, data=rows, title="t"
    )
    if encrypted:
        stream = rc4_crypt_stream(stream, PASSWORD, SALT)
    blob = write_cfb(stream)
    path = tmp_path_factory.mktemp("xlsprop") / "t.xls"
    path.write_bytes(blob)

    pdf = read_encrypted_xls_native(str(path))
    assert list(pdf.columns) == headers
    assert len(pdf) == len(rows)
    for i, row in enumerate(rows):
        for j, want in enumerate(row):
            got = pdf.iloc[i, j]
            assert got == want, (i, j, got, want)
