"""Independent checks on the RC4 key-derivation path (advice r6).

The author->encrypt->decrypt round trip shares ``derive_rc4_key`` /
``rc4_crypt_stream`` between fixture generator and reader, so it cannot
catch a *shared* misreading of MS-OFFCRYPTO/MS-XLS. No real
Excel-produced fixture or msoffcrypto install is available in this
container, so the strongest offline check is:

1. a SECOND derivation implementation transcribed line-by-line from the
   MS-OFFCRYPTO 2.3.6.2 prose (each numbered step literal, no helper
   reuse), property-compared against the library's;
2. an independent textbook RC4 (KSA + PRGA transcribed from the
   published cipher description) compared against ``rc4_keystream``;
3. a cross-engine interop test that runs whenever ``msoffcrypto`` is
   importable — decrypting our authored fixture with the third-party
   engine — so gaining the dependency upgrades coverage automatically.
"""

from __future__ import annotations

import hashlib
import struct
import sys
from pathlib import Path

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from open_data_pipelines_spark.sources.xls_native import (  # noqa: E402
    derive_rc4_key,
    rc4_keystream,
)


def _derive_key_spec_2362(password: str, salt: bytes, block: int) -> bytes:
    """MS-OFFCRYPTO 2.3.6.2 transcribed literally, one statement per
    numbered spec step (independent of the library helper):

    step 1: H0 = MD5(UNICODE(password))  # UTF-16LE, no BOM/terminator
    step 2: truncate H0 to its first 5 bytes
    step 3: form the 336-byte intermediate buffer: (truncated H0 +
            16-byte salt) concatenated 16 times
    step 4: H1 = MD5(intermediate buffer)
    step 5: truncate H1 to its first 5 bytes
    step 6: Hfinal = MD5(truncated H1 + LE32(block number))
    step 7: the 128-bit RC4 key is Hfinal's first 16 bytes
    """
    step1 = hashlib.md5(password.encode("utf-16-le")).digest()
    step2 = step1[0] , step1[1], step1[2], step1[3], step1[4]
    step3 = b""
    for _ in range(16):
        step3 += bytes(step2) + salt
    assert len(step3) == 336
    step4 = hashlib.md5(step3).digest()
    step5 = bytes([step4[0], step4[1], step4[2], step4[3], step4[4]])
    step6 = hashlib.md5(step5 + struct.pack("<I", block)).digest()
    return step6[:16]


def _rc4_textbook(key: bytes, n: int) -> bytes:
    """Textbook RC4 as published (KSA then PRGA), written with explicit
    loops — no reuse of the library's generator-based implementation."""
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) % 256
        S[i], S[j] = S[j], S[i]
    out = bytearray()
    i = j = 0
    for _ in range(n):
        i = (i + 1) % 256
        j = (j + S[i]) % 256
        S[i], S[j] = S[j], S[i]
        out.append(S[(S[i] + S[j]) % 256])
    return bytes(out)


@settings(max_examples=60, deadline=None)
@given(
    st.text(min_size=0, max_size=20),
    st.binary(min_size=16, max_size=16),
    st.integers(min_value=0, max_value=2**20),
)
def test_key_derivation_matches_spec_transcription(password, salt, block):
    assert derive_rc4_key(password, salt, block) == _derive_key_spec_2362(
        password, salt, block
    )


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=5, max_size=16), st.integers(min_value=1, max_value=2048))
def test_rc4_keystream_matches_textbook(key, n):
    assert rc4_keystream(key, n) == _rc4_textbook(key, n)


def test_velvetsweatshop_block0_key_pinned():
    """Pin the VelvetSweatshop/zero-salt block-0 key so any future
    refactor of the derivation chain is caught byte-for-byte (the value
    is reproducible from the spec transcription above, which is the
    independent side)."""
    salt = bytes(16)
    assert derive_rc4_key("VelvetSweatshop", salt, 0) == _derive_key_spec_2362(
        "VelvetSweatshop", salt, 0
    )


def test_msoffcrypto_interop_when_available(tmp_path):
    """Cross-engine interop: decrypt our authored encrypted fixture with
    msoffcrypto-tool and parse it with xlrd, comparing against the
    native reader. Skipped until the container gains the deps — the
    test exists so the interop direction is covered the moment it can
    be."""
    msoffcrypto = pytest.importorskip("msoffcrypto")

    import io

    from open_data_pipelines_spark.sources.xls_native import read_encrypted_xls_native
    from tools.make_xls_fixture import (
        PASSWORD,
        SALT,
        build_workbook_stream,
        rc4_crypt_stream,
        write_cfb,
    )

    headers, rows = ["a", "b"], [("x", 1.5), ("y", 2.0)]
    stream = build_workbook_stream(
        encrypted=True, pad=True, headers=headers, data=rows, title="t"
    )
    blob = write_cfb(rc4_crypt_stream(stream, PASSWORD, SALT))
    path = tmp_path / "interop.xls"
    path.write_bytes(blob)

    f = msoffcrypto.OfficeFile(io.BytesIO(blob))
    f.load_key(password=PASSWORD)
    decrypted = io.BytesIO()
    f.decrypt(decrypted)

    xlrd = pytest.importorskip("xlrd")
    book = xlrd.open_workbook(file_contents=decrypted.getvalue())
    sheet = book.sheet_by_index(0)
    third_party = [
        [sheet.cell_value(r, c) for c in range(sheet.ncols)]
        for r in range(sheet.nrows)
    ]
    native = read_encrypted_xls_native(str(path))
    assert third_party[0] == list(native.columns)
    for got, (a, b) in zip(third_party[1:], rows):
        assert got == [a, b]
