"""Property-based round-trip for the native ODS parser: arbitrary
cell grids (strings with XML-hostile characters, floats, bools,
Nones) written as OASIS content.xml must come back with
pd.read_excel(header=N) shape and values. Pure driver-side — no
Spark session, so hypothesis can run many examples cheaply."""

from __future__ import annotations

import zipfile
from xml.sax.saxutils import escape

import pandas as pd
from hypothesis import given, settings, strategies as st

from open_data_pipelines_spark.sources.spreadsheet import read_ods_native

_cell = st.one_of(
    st.none(),
    # strings with XML specials and unicode; no control chars (XML 1.0
    # cannot encode them) and no leading/trailing whitespace ambiguity
    st.text(
        alphabet=st.characters(
            codec="utf-8", categories=("L", "N", "P", "S"), include_characters="<>&\"'"
        ),
        min_size=1,
        max_size=12,
    ),
    st.floats(min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False),
    st.booleans(),
)


def _cell_xml(v) -> str:
    if v is None:
        return "<table:table-cell/>"
    if isinstance(v, bool):
        return (
            f'<table:table-cell office:value-type="boolean" '
            f'office:boolean-value="{"true" if v else "false"}"/>'
        )
    if isinstance(v, float):
        return f'<table:table-cell office:value-type="float" office:value="{v!r}"/>'
    return (
        '<table:table-cell office:value-type="string">'
        f"<text:p>{escape(v)}</text:p></table:table-cell>"
    )


def _write_ods(path, grid: list[list]) -> None:
    rows = "".join(
        "<table:table-row>" + "".join(_cell_xml(c) for c in row) + "</table:table-row>"
        for row in grid
    )
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        "<office:document-content"
        ' xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"'
        ' xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"'
        ' xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        "<office:body><office:spreadsheet>"
        '<table:table table:name="S">' + rows + "</table:table>"
        "</office:spreadsheet></office:body></office:document-content>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("mimetype", "application/vnd.oasis.opendocument.spreadsheet")
        z.writestr("content.xml", content)


@settings(max_examples=40, deadline=None)
@given(
    grid=st.lists(
        st.lists(_cell, min_size=1, max_size=5),
        min_size=2,
        max_size=6,
    )
)
def test_grid_round_trips(tmp_path_factory, grid):
    # header row must be non-empty after the parser's trailing-None
    # trim; force a string header as wide as the widest row
    width = max(len(r) for r in grid)
    header = [f"c{i}" for i in range(width)]
    path = str(tmp_path_factory.mktemp("ods") / "g.ods")
    _write_ods(path, [header] + grid)
    pdf = read_ods_native(path, header_row=0)
    assert list(pdf.columns) == header
    # fully-empty trailing data rows are trimmed (ODS filler
    # convention); every kept row must match cell-for-cell
    kept = list(grid)
    while kept and all(c is None or (isinstance(c, str) and c == "") for c in kept[-1]):
        kept.pop()
    assert len(pdf) == len(kept)
    for i, row in enumerate(kept):
        padded = list(row) + [None] * (width - len(row))
        for j, want in enumerate(padded):
            got = pdf.iloc[i, j]
            if want is None or (isinstance(want, str) and want == ""):
                assert got is None or pd.isna(got), (i, j, got)
            elif isinstance(want, float):
                assert got == want
            else:
                assert got == want
