"""Feed parsing: frozen policy matrix, engine==oracle parity over the
whole fixture family, and the dataset stage end to end."""

import gzip

import pytest

from fixtures.gen_pages import generate_feed_table
from rayxt.feeds import parse_feed, parse_feeds
from tests.oracle.feed_oracle import oracle_parse_feed


def rss(items: str) -> bytes:
    return (f'<rss version="2.0" xmlns:atom="http://www.w3.org/2005/'
            f'Atom"><channel>{items}</channel></rss>').encode()


def atom(entries: str) -> bytes:
    return (f'<feed xmlns="http://www.w3.org/2005/Atom">{entries}'
            f"</feed>").encode()


def test_rss_basic_fields():
    k, e = parse_feed(rss(
        "<item><title> T </title><link>https://x.example/a</link>"
        "<guid>g1</guid><pubDate> Mon, 01 Jun 2026 00:00:00 GMT "
        "</pubDate></item>"))
    assert k == "rss"
    assert e == [("T", "https://x.example/a", "g1",
                  "Mon, 01 Jun 2026 00:00:00 GMT")]


def test_rss_link_policy():
    # first link with non-empty text wins; self-closing atom:link and
    # empty links never win; non-http entries are skipped
    k, e = parse_feed(rss(
        '<item><atom:link rel="self" href="https://x/self"/>'
        "<link></link><link>https://x.example/real</link>"
        "<link>https://x.example/later</link></item>"
        "<item><link>ftp://x.example/f</link></item>"
        "<item><title>no link</title></item>"))
    assert [r[1] for r in e] == ["https://x.example/real"]


def test_atom_link_rel_policy():
    k, e = parse_feed(atom(
        '<entry><link rel="self" href="https://x/self"/>'
        '<link rel="enclosure" href="https://x/enc"/>'
        '<link rel="alternate" href=" https://x.example/alt "/>'
        "</entry>"
        '<entry><link href="https://x.example/plain"/></entry>'
        '<entry><link rel="self" href="https://x/only-self"/></entry>'
        '<entry><link href=""/><link href="https://x/second"/></entry>'))
    assert k == "atom"
    # rel=self/enclosure skipped until alternate; rel-less counts;
    # self-only entry skipped; FIRST matching link with empty href
    # skips the entry (no fallback to the second)
    assert [r[1] for r in e] == ["https://x.example/alt",
                                 "https://x.example/plain"]


def test_atom_published_fallback_and_id():
    k, e = parse_feed(atom(
        '<entry><link href="https://x/a"/><id>i1</id>'
        "<updated>U1</updated></entry>"
        '<entry><link href="https://x/b"/><published>P2</published>'
        "<updated>U2</updated></entry>"))
    assert [(r[2], r[3]) for r in e] == [("i1", "U1"), (None, "P2")]


def test_title_direct_text_only():
    k, e = parse_feed(rss(
        "<item><title><b>markup</b></title>"
        "<link>https://x/a</link></item>"
        "<item><title>plain &amp; text</title>"
        "<link>https://x/b</link></item>"))
    assert [r[0] for r in e] == [None, "plain & text"]


def test_invalid_and_edge_documents():
    assert parse_feed(None)[0] == "invalid"
    assert parse_feed(b"not xml <")[0] == "invalid"
    assert parse_feed(b"\x1f\x8b\x08\x00broken")[0] == "invalid"
    assert parse_feed(b"<urlset></urlset>")[0] == "invalid"
    assert parse_feed(b"<rss></rss>") == ("rss", [])  # channel-less
    assert parse_feed(atom(""))[1] == []
    body = gzip.compress(rss("<item><link>https://x/a</link></item>"))
    assert parse_feed(body)[1][0][1] == "https://x/a"


def test_max_entries_counts_before_skips():
    items = ("<item><link>bad</link></item>"
             "<item><link>https://x/keep</link></item>"
             "<item><link>https://x/dropped</link></item>")
    k, e = parse_feed(rss(items), max_entries=2)
    assert [r[1] for r in e] == ["https://x/keep"]


def test_full_family_engine_equals_oracle():
    t = generate_feed_table()
    for u, b in zip(t["feed_url"].to_pylist(), t["body"].to_pylist()):
        assert parse_feed(b) == oracle_parse_feed(b), u


def test_parse_feeds_stage(ray_session):
    import ray.data as rd

    t = generate_feed_table()
    got = parse_feeds(rd.from_arrow(t).repartition(4)).to_pandas()
    want = []
    for u, b in zip(t["feed_url"].to_pylist(), t["body"].to_pylist()):
        kind, entries = oracle_parse_feed(b)
        if kind == "invalid":
            want.append((u, "invalid", None, None, None, None))
        else:
            want.extend((u, kind, *e) for e in entries)
    assert len(got) == len(want)
    key = ["feed_url", "link"]
    got = got.sort_values(key, na_position="first").reset_index(drop=True)
    import pandas as pd
    wdf = pd.DataFrame(want, columns=list(got.columns)) \
        .sort_values(key, na_position="first").reset_index(drop=True)
    for c in got.columns:
        assert list(got[c].fillna("~")) == list(wdf[c].fillna("~")), c


def test_nested_descendants_are_not_direct_children():
    # a <source> wrapper carrying its own link/title/id must not leak
    # into the entry's fields (direct-children-only policy) — this
    # exact shape broke the first regex-based oracle
    k, e = parse_feed(rss(
        '<item><source url="s"><link>https://nested.example/x</link>'
        "<title>nested</title></source>"
        "<link>https://real.example/y</link></item>"))
    assert e == [(None, "https://real.example/y", None, None)]
    k, e = parse_feed(atom(
        "<entry><source><title>t</title><id>i</id>"
        '<link href="https://nested.example/z"/></source>'
        '<link href="https://real.example/w"/></entry>'))
    assert e == [(None, "https://real.example/w", None, None)]
    for b in (rss('<item><source url="s">'
                  "<link>https://nested.example/x</link></source>"
                  "<link>https://real.example/y</link></item>"),
              atom("<entry><source><id>i</id></source>"
                   '<link href="https://real.example/w"/></entry>')):
        assert parse_feed(b) == oracle_parse_feed(b)
