"""Link-graph tests: outlink extraction + PageRank vs the independent
oracle (regex scanner + urljoin + dense numpy power iteration), plus
broadcast-vs-join mode parity."""

import numpy as np
import pyarrow as pa
import pytest

from fixtures.gen_pages import generate_link_table, link_page_of
from rayxt.linkgraph import (
    extract_outlinks, host_edges, host_of_url, page_outlinks, pagerank,
    resolve_url,
)
from tests.oracle.linkgraph_oracle import oracle_outlinks, oracle_pagerank

# -- URL resolution parity vs urllib (the independent mechanism) ------------

_BASES = [
    "https://a.example.org/d/x/page.html",
    "https://a.example.org/",
    "https://a.example.org",
    "https://a.example.org/one/two/three?q=1",
    "http://b.example.net:8080/p/q.html",
]
_REFS = [
    "", "#frag", "?q=2", "?q=2#f", "/abs/path", "/abs/../up", "rel.html",
    "./rel.html", "../up.html", "../../../over.html", "sub/dir/",
    "//other.example.org/pp", "https://c.example.com/full#x",
    "HTTPS://C.EXAMPLE.COM/scheme-case", "mailto:x@y", "javascript:void(0)",
    "a/./b/../c", "/", ".", "..", "x?y#z", "//h:99/p",
]


def test_resolve_url_matches_urljoin_matrix():
    from urllib.parse import urljoin

    for base in _BASES:
        for ref in _REFS:
            want = urljoin(base, ref).split("#", 1)[0]
            got = resolve_url(base, ref)
            assert got == want, (base, ref, got, want)


def test_host_of_url_matches_urlsplit():
    from urllib.parse import urlsplit

    cases = [
        "https://A.Example.ORG/p", "https://a.example.org:8443/p",
        "http://user:pw@h.example.net/x", "https://h9.example.org",
        "https://h.example.org?q=1", "https://h.example.org#f",
    ]
    for u in cases:
        assert host_of_url(u) == (urlsplit(u).hostname or ""), u


# -- per-document kernel vs the oracle scanner -------------------------------

def test_page_outlinks_matches_oracle_on_fixture_family():
    for i in range(120):
        url, html = link_page_of(i)
        assert page_outlinks(url, html) == oracle_outlinks(url, html), (i, url)


def test_page_outlinks_anchor_matches_oracle_on_fixture_family():
    for i in range(120):
        url, html = link_page_of(i)
        got = page_outlinks(url, html, with_anchor=True)
        want = oracle_outlinks(url, html, with_anchor=True)
        assert got == want, (i, url)


def test_anchor_text_edge_cases():
    url = "https://h.example.org/a/b.html"
    html = (b'<a href="/x">click <b>here</b>, or '
            b'<i>else<!--hidden--></i></a>'
            b'<a href="/y">pre<script>var z="in";</script>post</a>'
            b'<a href="/z"><img src="p.png"></a>'
            b'<a href="/w">  A &amp; B \r\n\t C  </a>'
            b'<a href="/long">' + b"ab " * 200 + b'</a>')
    got = {k[0].rsplit("/", 1)[1]: k[3]
           for k in page_outlinks(url, html, with_anchor=True)}
    assert got["x"] == "click here, or else"
    assert got["y"] == "prepost"  # skipped subtree: no separator
    assert got["z"] == ""
    assert got["w"] == "A & B C"
    assert len(got["long"]) == 200
    want = {k[0].rsplit("/", 1)[1]: k[3]
            for k in oracle_outlinks(url, html, with_anchor=True)}
    assert got == want


def test_page_outlinks_edge_cases():
    url = "https://h.example.org/a/b.html"
    assert page_outlinks(url, None) == {}
    assert page_outlinks(url, b"") == {}
    # base rebase applies to every anchor; first base wins
    html = (b'<html><head><base href="/root/"><base href="/other/"></head>'
            b'<body><a href="x.html">x</a></body></html>')
    got = page_outlinks(url, html)
    assert set(got) == {("https://h.example.org/root/x.html",
                         "h.example.org", 0)}
    # non-http base is ignored
    html2 = (b'<head><base href="ftp://f/"></head>'
             b'<a href="y.html">y</a>')
    got2 = page_outlinks(url, html2)
    assert set(got2) == {("https://h.example.org/a/y.html",
                          "h.example.org", 0)}


# -- distributed stages -------------------------------------------------------

@pytest.fixture(scope="module")
def link_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(generate_link_table(80)).repartition(6)


def test_extract_outlinks_matches_oracle(ray_session, link_ds):
    got = (extract_outlinks(link_ds, concurrency=2).to_pandas()
           .sort_values(["url", "dst_url", "nofollow"])
           .reset_index(drop=True))
    rows = []
    for i in range(80):
        url, html = link_page_of(i)
        sh = host_of_url(url)
        for (dst, dh, nf), n in sorted(oracle_outlinks(url, html).items()):
            rows.append((url, sh, dst, dh, nf, n))
    rows.sort(key=lambda r: (r[0], r[2], r[4]))
    assert got["url"].tolist() == [r[0] for r in rows]
    assert got["src_host"].tolist() == [r[1] for r in rows]
    assert got["dst_url"].tolist() == [r[2] for r in rows]
    assert got["dst_host"].tolist() == [r[3] for r in rows]
    assert got["nofollow"].tolist() == [r[4] for r in rows]
    assert got["n"].tolist() == [r[5] for r in rows]


def _oracle_edges(n_pages):
    edges = []
    for i in range(n_pages):
        url, html = link_page_of(i)
        sh = host_of_url(url)
        for (dst, dh, nf), cnt in oracle_outlinks(url, html).items():
            if nf == 0 and sh and dh:
                edges.append((sh, dh))
    return edges


def test_pagerank_both_modes_match_oracle(ray_session, link_ds):
    links = extract_outlinks(link_ds, concurrency=2)
    edges = host_edges(links).materialize()
    want = oracle_pagerank(_oracle_edges(80), damping=0.85, iters=8)

    for mode in ("broadcast", "join"):
        got = pagerank(edges, damping=0.85, iters=8, mode=mode).to_pandas()
        assert sorted(got["host"]) == sorted(want)
        got_map = dict(zip(got["host"], got["pagerank"]))
        for h, v in want.items():
            assert abs(got_map[h] - v) < 1e-9, (mode, h)
        assert abs(got["pagerank"].sum() - 1.0) < 1e-9


def test_pagerank_empty_and_dangling(ray_session):
    import ray.data as rd

    empty = rd.from_arrow(pa.table({
        "src_host": pa.array([], pa.string()),
        "dst_host": pa.array([], pa.string()),
        "n": pa.array([], pa.int64())}))
    got = pagerank(empty, iters=3)
    assert got.count() == 0
    assert got.schema().names == ["host", "pagerank"]

    # one edge a->b: b is dangling; matches the dense oracle
    one = rd.from_arrow(pa.table({
        "src_host": pa.array(["a"]), "dst_host": pa.array(["b"]),
        "n": pa.array([3], pa.int64())}))
    for mode in ("broadcast", "join"):
        got = pagerank(one, iters=6, mode=mode).to_pandas()
        want = oracle_pagerank([("a", "b")], iters=6)
        got_map = dict(zip(got["host"], got["pagerank"]))
        assert got_map.keys() == want.keys()
        assert all(abs(got_map[h] - want[h]) < 1e-12 for h in want)


def test_pagerank_rejects_unknown_mode(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "src_host": pa.array(["a"]), "dst_host": pa.array(["b"]),
        "n": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError):
        pagerank(ds, mode="nope")


def test_top_anchors_matches_duckdb(ray_session, link_ds):
    import duckdb

    from rayxt.linkgraph import top_anchors

    links = extract_outlinks(link_ds, concurrency=2, with_anchor=True)
    flat = links.to_pandas()
    got = (top_anchors(links, by="dst_host", k=3).to_pandas()
           .sort_values(["dst_host", "anchor"]).reset_index(drop=True))
    want = duckdb.sql("""
        SELECT dst_host, anchor, n_links FROM (
          SELECT dst_host, anchor, SUM(n) AS n_links,
                 ROW_NUMBER() OVER (PARTITION BY dst_host
                   ORDER BY SUM(n) DESC, anchor ASC) AS rk
          FROM flat WHERE anchor <> ''
          GROUP BY dst_host, anchor) WHERE rk <= 3
        ORDER BY dst_host, anchor""").df()
    assert got["dst_host"].tolist() == want["dst_host"].tolist()
    assert got["anchor"].tolist() == want["anchor"].tolist()
    assert got["n_links"].astype(int).tolist() == \
        want["n_links"].astype(int).tolist()


def test_host_degrees_matches_duckdb(ray_session, link_ds):
    import duckdb

    from rayxt.linkgraph import host_degrees

    edges = host_edges(extract_outlinks(link_ds, concurrency=2))
    flat = edges.to_pandas()
    got = (host_degrees(edges).to_pandas()
           .sort_values("host").reset_index(drop=True))
    want = duckdb.sql("""
        SELECT host, SUM(od) AS out_degree, SUM(id_) AS in_degree,
               SUM(ol) AS out_links, SUM(il) AS in_links
        FROM (SELECT src_host AS host, 1 AS od, 0 AS id_,
                     n_links AS ol, 0 AS il FROM flat
              UNION ALL
              SELECT dst_host, 0, 1, 0, n_links FROM flat)
        GROUP BY host ORDER BY host""").df()
    assert got["host"].tolist() == want["host"].tolist()
    for c in ("out_degree", "in_degree", "out_links", "in_links"):
        assert got[c].astype(int).tolist() == want[c].astype(int).tolist(), c


def test_pagerank_tol_early_stop_matches_converged(ray_session):
    import ray.data as rd

    edges = rd.from_arrow(pa.table({
        "src_host": pa.array(["a", "b", "c", "c"]),
        "dst_host": pa.array(["b", "c", "a", "b"]),
        "n": pa.array([1, 1, 1, 1], pa.int64())}))
    full = pagerank(edges, iters=60, mode="broadcast").to_pandas()
    early = pagerank(edges, iters=60, tol=1e-12,
                     mode="broadcast").to_pandas()
    f = dict(zip(full["host"], full["pagerank"]))
    e = dict(zip(early["host"], early["pagerank"]))
    assert f.keys() == e.keys()
    assert all(abs(f[h] - e[h]) < 1e-9 for h in f)


def test_host_edges_collapses_and_filters(ray_session):
    import ray.data as rd

    links = rd.from_arrow(pa.table({
        "src_host": pa.array(["a", "a", "a", "", "a"]),
        "dst_host": pa.array(["b", "b", "c", "b", ""]),
        "nofollow": pa.array([0, 0, 1, 0, 0], pa.int32()),
        "n": pa.array([2, 3, 1, 1, 1], pa.int64())}))
    got = (host_edges(links).to_pandas()
           .sort_values(["src_host", "dst_host"]).reset_index(drop=True))
    assert got["src_host"].tolist() == ["a"]
    assert got["dst_host"].tolist() == ["b"]
    assert got["n_links"].tolist() == [5]
    got2 = (host_edges(links, drop_nofollow=False).to_pandas()
            .sort_values(["src_host", "dst_host"]).reset_index(drop=True))
    assert got2["dst_host"].tolist() == ["b", "c"]
