"""Head-metadata extraction tests: the frozen policy's edge cases
hand-checked, full parity vs the independent regex-scanner oracle
across the fixture family, and the distributed stage end to end."""

import pytest

from fixtures.gen_pages import generate_meta_table, meta_page_of
from rayxt.metadata import METADATA_FIELDS, extract_metadata, page_metadata
from tests.oracle.metadata_oracle import oracle_metadata

URL = "https://h.example.org/d/page.html"


def _md(html: str) -> dict:
    return page_metadata(URL, html.encode())


# -- hand-checked policy cases ------------------------------------------------

def test_first_occurrence_wins():
    m = _md("<head><title>one</title><title>two</title>"
            '<meta name="description" content="a">'
            '<meta name="description" content="b"></head>')
    assert m["title"] == "one"
    assert m["meta_description"] == "a"


def test_meta_without_content_does_not_claim():
    m = _md('<head><meta name="keywords">'
            '<meta name="keywords" content="k1,k2"></head>')
    assert m["meta_keywords"] == "k1,k2"


def test_empty_content_claims_slot_as_null():
    m = _md('<head><meta name="robots" content="">'
            '<meta name="robots" content="noindex"></head>')
    assert m["meta_robots"] is None


def test_title_subtree_text_skips_comments_and_truncates():
    m = _md("<head><title> a  <b>b<!--x--></b> &amp; c </title></head>")
    assert m["title"] == "a b & c"
    long = _md(f"<head><title>{'w' * 400}</title></head>")
    assert len(long["title"]) == 300


def test_canonical_resolved_against_base_http_only():
    m = _md('<head><base href="https://other.example.net/bd/">'
            '<link rel="alternate canonical" href="sub/x.html"></head>')
    assert m["canonical"] == "https://other.example.net/bd/sub/x.html"
    m2 = _md('<head><link rel="canonical" href="mailto:x@y"></head>')
    assert m2["canonical"] is None  # claimed, non-http
    m3 = _md('<head><link rel="canonical" href="mailto:x@y">'
             '<link rel="canonical" href="/real"></head>')
    assert m3["canonical"] is None  # first claim sticks


def test_og_fields_property_and_name_spellings():
    m = _md('<head><meta property="OG:Title" content="T">'
            '<meta name="og:description" content="D">'
            '<meta property="og:image" content=" /i.png "></head>')
    assert m["og_title"] == "T"
    assert m["og_description"] == "D"
    assert m["og_image"] == "https://h.example.org/i.png"
    # property= present but different: name= fallback must NOT apply
    m2 = _md('<head><meta property="article:tag" name="og:title" '
             'content="no"></head>')
    assert m2["og_title"] is None


def test_og_image_data_uri_claims_null():
    m = _md('<head><meta property="og:image" '
            'content="data:image/png;base64,AA">'
            '<meta property="og:image" content="/late.png"></head>')
    assert m["og_image"] is None


def test_html_lang_normalized():
    assert _md('<html lang=" EN-us "><body>x</body></html>')["html_lang"] \
        == "en-us"
    assert _md('<html lang=""><body>x</body></html>')["html_lang"] is None


def test_poison_rows():
    assert page_metadata(URL, None)["status"] == "empty"
    assert page_metadata(URL, b"")["status"] == "empty"
    garbage = page_metadata(URL, b"\xff\xfe\x00garbage<<>>")
    assert garbage["status"] in ("ok", "error")  # never raises


# -- full parity vs the independent oracle ------------------------------------

def test_kernel_matches_oracle_on_fixture_family():
    t = generate_meta_table(400)
    for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
        assert page_metadata(url, html) == oracle_metadata(url, html), url


def test_kernel_matches_oracle_on_handmade_edges():
    cases = [
        "<head><META NAME='Description' CONTENT='single &quot;q&quot;'>"
        "</head>",
        "<head><meta content='orphan'><link rel='canonical'></head>",
        "<html LANG='Fr'><head><title></title></head></html>",
        "<body><meta name='robots' content='body'>"
        "<title>late title</title></body>",
        "<head><base href='ftp://x.example.org/'>"
        "<link rel='canonical' href='/keeps-page-base'></head>",
    ]
    for html in cases:
        assert page_metadata(URL, html.encode()) == \
            oracle_metadata(URL, html.encode()), html


# -- distributed stage ---------------------------------------------------------

def test_extract_metadata_stage_matches_kernel(ray_session):
    import ray.data as rd

    t = generate_meta_table(120)
    got = (extract_metadata(rd.from_arrow(t).repartition(5), concurrency=2)
           .to_pandas().sort_values("url").reset_index(drop=True))
    assert got.shape[0] == 120
    assert list(got.columns) == ["url"] + list(METADATA_FIELDS) + ["status"]
    want = {u: page_metadata(u, h)
            for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist())}
    for _, row in got.iterrows():
        w = want[row["url"]]
        for f in list(METADATA_FIELDS) + ["status"]:
            got_v = None if row[f] is None or row[f] != row[f] else row[f]
            assert got_v == w[f], (row["url"], f)


def test_published_time_policy():
    from rayxt.metadata import page_metadata

    def _pt(html):
        return page_metadata("https://h/p", html.encode())["published_time"]

    # property spelling, normalized
    assert _pt('<head><meta property="article:published_time" '
               'content=" 2025-01-02T03:04:05Z "></head>') \
        == "2025-01-02T03:04:05Z"
    # name fallback only when no property attr
    assert _pt('<meta name="article:published_time" content="2024-01-01">') \
        == "2024-01-01"
    assert _pt('<meta property="x" name="article:published_time" '
               'content="2024-01-01">') is None
    # empty content claims the slot: a later <time> never overrides
    assert _pt('<meta property="article:published_time" content="">'
               '<time datetime="2020-01-01">x</time>') is None
    # first in document order wins
    assert _pt('<time datetime="2023-05-06">x</time>'
               '<meta property="article:published_time" '
               'content="2024-01-01">') == "2023-05-06"
    # <time> without datetime never claims
    assert _pt('<time>yesterday</time>'
               '<time datetime="2022-02-02">y</time>') == "2022-02-02"


def test_filter_noindex(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rayxt.metadata import filter_noindex

    rows = [
        ("a", None, "ok", True),            # null directive: indexable
        ("b", "index, follow", "ok", True),
        ("c", "noindex", "ok", False),
        ("d", "NOINDEX, follow", "ok", False),   # case-insensitive
        ("e", " none ", "ok", False),            # token ws ignored
        ("f", "nonetheless", "ok", True),        # substring != token
        ("g", "prenoindex", "ok", True),
        ("h", "follow,\tnoindex", "ok", False),
        ("i", "index", "error", False),          # non-ok dropped
    ]
    t = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "meta_robots": pa.array([r[1] for r in rows], pa.string()),
        "status": pa.array([r[2] for r in rows], pa.string()),
    })
    got = set(filter_noindex(rd.from_arrow(t)).to_pandas()["url"])
    assert got == {r[0] for r in rows if r[3]}
