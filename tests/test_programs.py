"""Golden tests for the three rule programs (FIXTURES section 2)."""

from rayxt.dom import parse_html, parse_xml
from rayxt.kernel import extract_one
from rayxt.programs import get_program_factory


def test_main_content_golden():
    html = (
        b"<html><head><title>T</title><script>junk()</script></head>"
        b"<body><nav>Home</nav><div class='ads'>BUY</div>"
        b"<article><h1>Head &amp; line</h1><p>Body one.</p><p>Body two.</p></article>"
        b"<div id='footer'>foot</div><footer>bottom</footer></body></html>"
    )
    r = extract_one(html, get_program_factory("main_content")())
    assert r["status"] == "ok"
    assert r["text"] == "Head & line\nBody one.\nBody two."
    hits = dict(r["rule_hits"])
    assert hits["drop_tag"] == 3  # script, nav, footer
    assert hits["drop_class"] == 1
    assert hits["drop_id"] == 1  # div#footer
    assert r["spans"] and all(k == "article" for _, _, k in r["spans"])


def test_main_content_error_paths():
    prog = get_program_factory("main_content")()
    assert extract_one(b"", prog)["status"] == "empty"
    assert extract_one(None, prog)["status"] == "empty"
    assert extract_one(b"x" * 10, prog, hard_cap=5)["status"] == "too_large"
    r = extract_one(b"   \n  ", prog)
    assert r["status"] == "ok" and r["text"] == ""


def test_wikitable_golden():
    html = (
        b"<html><body><table class='wikitable'>"
        b"<tr><th>City</th><th>Pop</th></tr>"
        b"<tr><td>Berlin</td><td>3.6M</td></tr>"
        b"<tr><td>Paris</td><td>2.1M</td></tr>"
        b"</table><table><tr><td>ignored</td></tr></table>"
        b"<table class='wikitable'><tr><td>nohdr</td></tr></table>"
        b"</body></html>"
    )
    recs = get_program_factory("wikipedia_table")()(parse_html(html))
    assert recs == [
        {"table_idx": 0, "row_idx": 0, "City": "Berlin", "Pop": "3.6M"},
        {"table_idx": 0, "row_idx": 1, "City": "Paris", "Pop": "2.1M"},
        {"table_idx": 1, "row_idx": 0, "col0": "nohdr"},
    ]


def test_mods_to_tei_golden():
    mods = (
        b'<mods:mods xmlns:mods="http://www.loc.gov/mods/v3">'
        b"<mods:titleInfo><mods:title>Titel</mods:title></mods:titleInfo>"
        b'<mods:name type="personal"><mods:namePart>Doe, Jane</mods:namePart></mods:name>'
        b'<mods:name type="corporate"><mods:namePart>ACME</mods:namePart></mods:name>'
        b"<mods:originInfo><mods:dateIssued>1999</mods:dateIssued></mods:originInfo>"
        b"</mods:mods>"
    )
    root, nsmap = parse_xml(mods)
    out = get_program_factory("mods_to_tei")()(root, nsmap=nsmap)
    assert out == (
        '<ns0:teiHeader xmlns:ns0="http://www.tei-c.org/ns/1.0">'
        "<ns0:fileDesc><ns0:titleStmt><ns0:title>Titel</ns0:title>"
        "<ns0:author>Doe, Jane</ns0:author></ns0:titleStmt>"
        "<ns0:publicationStmt><ns0:date>1999</ns0:date></ns0:publicationStmt>"
        "</ns0:fileDesc></ns0:teiHeader>"
    )
