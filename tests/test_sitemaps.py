"""Sitemap parsing + robots directive extraction: policy edge cases,
engine-vs-oracle parity over the fixture family, dataset stages."""

import gzip

import pyarrow as pa
import pytest

from rayxt.robots import parse_directives, robots_directives
from rayxt.sitemaps import parse_sitemap, parse_sitemaps
from tests.oracle.sitemap_oracle import (oracle_directives,
                                         oracle_parse_sitemap)

NS = "http://www.sitemaps.org/schemas/sitemap/0.9"


def _urlset(inner: str) -> bytes:
    return f'<urlset xmlns="{NS}">{inner}</urlset>'.encode()


def test_basic_urlset_fields():
    kind, entries = parse_sitemap(_urlset(
        "<url><loc> https://a/x </loc><lastmod> 2025-01-02 </lastmod>"
        "<changefreq> Daily </changefreq><priority>0.8</priority></url>"))
    assert kind == "url"
    assert entries == [("https://a/x", "2025-01-02", "daily", 0.8)]


def test_sitemapindex_ignores_urlset_fields():
    kind, entries = parse_sitemap(
        f'<sitemapindex xmlns="{NS}"><sitemap>'
        "<loc>https://a/s.xml</loc><lastmod>2025-01-01</lastmod>"
        "<changefreq>daily</changefreq><priority>0.9</priority>"
        "</sitemap></sitemapindex>".encode())
    assert kind == "sitemap"
    assert entries == [("https://a/s.xml", "2025-01-01", None, None)]


@pytest.mark.parametrize("body", [
    None,
    b"not xml at all",
    b"<urlset><url><loc>https://a/x",          # truncated
    b"<feed><url><loc>https://a/x</loc></url></feed>",  # wrong root
    b"\x1f\x8bgarbage-not-gzip",                # broken gzip
])
def test_invalid_documents(body):
    assert parse_sitemap(body) == ("invalid", [])


def test_gzip_and_bom_and_crlf():
    body = ("﻿<urlset>\r\n<url><loc>https://a/x</loc></url>\r\n"
            "</urlset>").encode()
    assert parse_sitemap(body)[1] == [("https://a/x", None, None, None)]
    gz = gzip.compress(_urlset("<url><loc>https://a/y</loc></url>"))
    assert parse_sitemap(gz)[1] == [("https://a/y", None, None, None)]


def test_loc_validation_skips():
    kind, entries = parse_sitemap(_urlset(
        "<url><lastmod>2025-01-01</lastmod></url>"   # no loc
        "<url><loc>  </loc></url>"                    # empty loc
        "<url><loc>ftp://a/f</loc></url>"             # non-http
        "<url><loc>HTTPS://A/UP</loc></url>"          # scheme case ok
        "<url><loc>https://a/q?x=1&amp;y=2</loc></url>"))
    assert entries == [("HTTPS://A/UP", None, None, None),
                       ("https://a/q?x=1&y=2", None, None, None)]


def test_first_child_wins_and_bad_priority():
    kind, entries = parse_sitemap(_urlset(
        "<url><loc>https://a/1</loc><loc>https://a/2</loc>"
        "<priority>high</priority></url>"))
    assert entries == [("https://a/1", None, None, None)]


def test_max_entries_cap_counts_before_validation():
    inner = ("<url><loc></loc></url>"              # counted, then skipped
             "<url><loc>https://a/1</loc></url>"
             "<url><loc>https://a/2</loc></url>")
    kind, entries = parse_sitemap(_urlset(inner), max_entries=2)
    assert entries == [("https://a/1", None, None, None)]


def test_namespace_prefixed_elements():
    body = (f'<sm:urlset xmlns:sm="{NS}"><sm:url>'
            "<sm:loc>https://a/ns</sm:loc></sm:url></sm:urlset>").encode()
    assert parse_sitemap(body) == ("url", [("https://a/ns", None, None,
                                            None)])


def test_engine_matches_oracle_on_fixture_family():
    from fixtures.gen_pages import _SM_HOSTS, sitemap_docs_of_host

    for k in range(_SM_HOSTS):
        for url, body in sitemap_docs_of_host(k):
            assert parse_sitemap(body) == oracle_parse_sitemap(body), url


# --- robots directives ------------------------------------------------------

def test_directives_sitemaps_filewide_dedup_and_validation():
    body = (b"Sitemap: https://a/s1.xml\n"
            b"User-agent: *\nDisallow: /x/\n"
            b"Sitemap: https://a/s1.xml\n"     # duplicate dropped
            b"Sitemap: /relative.xml\n"        # non-absolute dropped
            b"Sitemap:\n"                      # empty dropped
            b"Sitemap: https://a/s2.xml\n")
    delay, maps = parse_directives(body, "bot")
    assert maps == ["https://a/s1.xml", "https://a/s2.xml"]
    assert delay is None


def test_directives_delay_group_selection():
    body = (b"User-agent: rayxtbot\nCrawl-delay: 1\n"
            b"User-agent: *\nCrawl-delay: 30\n")
    assert parse_directives(body, "rayxtbot/1.0")[0] == 1.0
    assert parse_directives(body, "otherbot")[0] == 30.0


@pytest.mark.parametrize("value,want", [
    (b"soon", None), (b"-4", None), (b"-0", None), (b"1_000", None),
    (b"nan", None), (b"inf", None), (b"2.5", 2.5), (b"+0.5", 0.5),
    (b"1e2", 100.0), (b".5", 0.5),
])
def test_directives_delay_parsing(value, want):
    body = b"User-agent: *\nCrawl-delay: " + value + b"\n"
    assert parse_directives(body, "bot")[0] == want


def test_directives_first_parseable_in_group_order():
    body = (b"User-agent: *\nCrawl-delay: soon\nCrawl-delay: 7\n"
            b"User-agent: *\nCrawl-delay: 3\n")
    assert parse_directives(body, "bot")[0] == 7.0


def test_directives_match_oracle_on_fixture_family():
    from fixtures.gen_pages import _SM_HOSTS, robots_sm_of_host

    agent = "rayxtbot/1.0"
    for k in range(_SM_HOSTS):
        body = robots_sm_of_host(k)
        assert parse_directives(body, agent) == \
            oracle_directives(body, agent), k


def test_dataset_stages(ray_session):
    import ray.data as rd

    from fixtures.gen_pages import (generate_robots_sm_table,
                                    generate_sitemap_table)

    sm = parse_sitemaps(rd.from_arrow(generate_sitemap_table())).to_pandas()
    assert set(sm["kind"]) == {"url", "sitemap", "invalid"}
    assert sm.loc[sm["kind"] == "invalid", "loc"].isna().all()
    assert sm.loc[sm["kind"] == "url", "loc"].notna().all()

    dirs = robots_directives(
        rd.from_arrow(generate_robots_sm_table()),
        agent="rayxtbot/1.0").to_pandas()
    # hosts without sitemap directives still appear (null sitemap_url)
    assert dirs["host"].nunique() < len(dirs) or len(dirs) > 0
    assert dirs["sitemap_url"].isna().any()
    assert dirs["sitemap_url"].notna().any()
    assert dirs["crawl_delay"].notna().any()
