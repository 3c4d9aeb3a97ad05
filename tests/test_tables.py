"""Table extraction: frozen grid policy matrix + engine==oracle parity
over the whole fixture family + the actor-pool stage end to end."""

import pyarrow as pa
import pytest

from fixtures.gen_pages import generate_tables_table
from rayxt.tables import extract_tables, page_tables
from tests.oracle.tables_oracle import oracle_page_tables

U = "https://t.example.org/x.html"


def cells(html, **pick):
    rows = page_tables(U, html if isinstance(html, bytes)
                       else html.encode())
    for k, v in pick.items():
        rows = [r for r in rows if r[k] == v]
    return rows


def grid(html):
    return [(r["row_idx"], r["col_idx"], r["cell_text"])
            for r in cells(html)]


def test_plain_grid_and_headers():
    rows = cells("<table><tr><th>H</th><td>d</td></tr></table>")
    assert [(r["is_header"], r["col_idx"]) for r in rows] == \
        [(True, 0), (False, 1)]


def test_rowspan_shifts_later_rows():
    g = grid("<table><tr><td rowspan=2>L</td><td>a</td></tr>"
             "<tr><td>b</td></tr></table>")
    assert g == [(0, 0, "L"), (0, 1, "a"), (1, 1, "b")]


def test_colspan_advances_cursor():
    g = grid("<table><tr><td colspan=3>w</td><td>x</td></tr></table>")
    assert g == [(0, 0, "w"), (0, 3, "x")]


def test_span_parse_policy():
    rows = cells("<table><tr>"
                 "<td colspan='abc'>a</td>"      # junk -> 1
                 "<td colspan=' 2 '>b</td>"      # strip ok -> 2
                 "<td colspan='03'>c</td>"       # leading zero ok -> 3
                 "<td rowspan='0'>d</td>"        # 0 -> 1
                 "<td colspan='99999'>e</td>"    # clamp -> 1000
                 "<td rowspan='+2'>f</td>"       # sign = junk -> 1
                 "</tr></table>")
    assert [(r["rowspan"], r["colspan"]) for r in rows] == \
        [(1, 1), (1, 2), (1, 3), (1, 1), (1, 1000), (1, 1)]


def test_origin_only_collision_model_error():
    # rowspan blocks col 0; row 1's wide cell starts at col 1 and may
    # overlap nothing to its right; row 2 tail starts at col 1
    g = grid("<table><tr><td rowspan=3>L</td><td>r0</td></tr>"
             "<tr><td colspan=4>w</td></tr><tr><td>t</td></tr></table>")
    assert g == [(0, 0, "L"), (0, 1, "r0"), (1, 1, "w"), (2, 1, "t")]


def test_section_wrappers_transparent():
    g = grid("<table><thead><tr><th>h</th></tr></thead>"
             "<tbody><tr><td>b</td></tr></tbody>"
             "<tfoot><tr><td>f</td></tr></tfoot></table>")
    assert [r for r, _, _ in g] == [0, 1, 2]


def test_implied_close_tag_soup():
    g = grid("<TABLE><TR><TD>a<TD>b<TR><TD>c</TABLE>")
    assert g == [(0, 0, "a"), (0, 1, "b"), (1, 0, "c")]


def test_nested_table_is_its_own_table_and_excised_from_text():
    rows = cells("<table><tr><td>out "
                 "<table><tr><td>in</td></tr></table>"
                 " er</td></tr></table>")
    outer = [r for r in rows if r["table_idx"] == 0]
    inner = [r for r in rows if r["table_idx"] == 1]
    assert [r["cell_text"] for r in outer] == ["out er"]
    assert [r["cell_text"] for r in inner] == ["in"]


def test_td_inside_td_is_second_cell_of_same_row():
    g = grid("<table><tr><td>host<div><td>in</div></td>"
             "<td>last</td></tr></table>")
    # the frozen DOM does NOT implied-close td across the div, so the
    # inner td stays NESTED under the host cell; its nearest tr/table
    # are still the row's, so it emits its own cell at col 1, and —
    # since only nested TABLE subtrees are excised from cell_text —
    # its text also appears inside the host cell's text
    assert g == [(0, 0, "hostin"), (0, 1, "in"), (0, 2, "last")]


def test_orphan_rows_and_cells_ignored():
    assert cells("<tr><td>o</td></tr><td>s</td><p>x</p>") == []


def test_cell_text_policy():
    rows = cells("<table><tr>"
                 "<td>a &amp; b<!--c--><script>x()</script>kept</td>"
                 "<td>  ws \t collapse  </td><td></td></tr></table>")
    assert [r["cell_text"] for r in rows] == \
        ["a & bkept", "ws collapse", ""]


def test_null_and_garbage_html():
    assert page_tables(U, None) == []
    assert page_tables(U, b"") == []
    assert page_tables(U, b"\xff\xfe not html") == []


def test_full_family_engine_equals_oracle():
    t = generate_tables_table(400)
    for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
        assert page_tables(u, h) == oracle_page_tables(u, h), u


def test_extract_tables_stage(ray_session):
    import ray.data as rd

    t = generate_tables_table(60)
    want = []
    for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
        want.extend(oracle_page_tables(u, h))
    got = (extract_tables(rd.from_arrow(t).repartition(5), concurrency=1)
           .to_pandas())
    assert len(got) == len(want)
    key = ["url", "table_idx", "row_idx", "col_idx"]
    got = got.sort_values(key).reset_index(drop=True)
    import pandas as pd
    wdf = pd.DataFrame(want).sort_values(key).reset_index(drop=True)
    for c in got.columns:
        assert list(got[c]) == list(wdf[c]), c


def test_wide_cell_over_longer_rowspan_does_not_shrink_occupancy():
    # B holds col 1 for 5 rows; C (rs=2, cs=2) overlaps cols 1-2 as a
    # model error — its shorter span must NOT shrink B's: at row 3, E
    # lands at col 2, not col 1 (engine == oracle slot-set semantics)
    html = ("<table><tr><td>A</td><td rowspan=5>B</td></tr>"
            "<tr><td rowspan=2 colspan=2>C</td></tr><tr></tr>"
            "<tr><td>D</td><td>E</td></tr></table>")
    g = grid(html)
    from tests.oracle.tables_oracle import oracle_page_tables
    assert [r for r in cells(html)] == \
        oracle_page_tables(U, html.encode())
    assert (3, 2, "E") in g
