"""robots.txt matcher: unit edge cases, engine-vs-oracle parity over
the fixture family, and broadcast-vs-join dataset-mode parity."""

import pyarrow as pa
import pytest

from rayxt.robots import (RobotsMatcher, allowed, compile_rules,
                          parse_robots, path_query_of, robots_check,
                          robots_filter, select_rules)
from tests.oracle.robots_oracle import oracle_allowed


def _verdict(body, agent, url):
    m = RobotsMatcher.from_pairs([("h.example", body)], agent)
    return m.allowed_url(url.replace("://any", "://h.example"))


def test_parse_groups_and_header_runs():
    body = (b"Disallow: /orphan/\n"          # before any UA: ignored
            b"User-agent: a\n"
            b"User-agent: b\n"
            b"Disallow: /ab/\n"
            b"User-agent: c\n"               # after rules: new group
            b"Allow: /c/\n")
    groups = parse_robots(body)
    assert groups == [(("a", "b"), [(False, "/ab/")]),
                      (("c",), [(True, "/c/")])]


def test_parse_empty_value_dropped_and_comments():
    groups = parse_robots(b"User-agent: *\nDisallow:  # nothing\n"
                          b"Disallow: /x/ # trail\n")
    assert groups == [(("*",), [(False, "/x/")])]


def test_select_longest_prefix_wins_over_star():
    groups = parse_robots(b"User-agent: ray\nDisallow: /short/\n"
                          b"User-agent: rayxtbot\nDisallow: /long/\n"
                          b"User-agent: *\nDisallow: /star/\n")
    assert select_rules(groups, "rayxtbot/1.0") == [(False, "/long/")]
    assert select_rules(groups, "raybot") == [(False, "/short/")]
    assert select_rules(groups, "otherbot") == [(False, "/star/")]


def test_star_groups_union():
    groups = parse_robots(b"User-agent: *\nDisallow: /a/\n"
                          b"User-agent: *\nDisallow: /b/\n")
    assert select_rules(groups, "x") == [(False, "/a/"), (False, "/b/")]


def test_no_applicable_group_allows_everything():
    groups = parse_robots(b"User-agent: unrelated\nDisallow: /\n")
    assert select_rules(groups, "me") == []
    assert allowed(compile_rules([]), "/anything") is True


@pytest.mark.parametrize("pattern,path,want", [
    ("/a/", "/a/x", True),
    ("/a/", "/b/a/", False),
    ("/a/*.html$", "/a/x.html", True),
    ("/a/*.html$", "/a/x.html5", False),
    ("/*?session=", "/item/3?session=abc", True),
    ("/*?session=", "/item/3", False),
    ("/a/*/z", "/a/b/c/z-more", True),     # '*' spans '/'
    ("/dl/*", "/dl/", True),
    ("/free$", "/free", True),
    ("/free$", "/freeware", False),
    ("/$", "/", True),
    ("/$", "/x", False),
    ("/a**b", "/ab", True),                # consecutive wildcards
    ("/a*b$", "/a-b-b", True),             # greedy-to-end under $
    ("/a*b$", "/a-b-c", False),
])
def test_pattern_match(pattern, path, want):
    assert allowed(compile_rules([(False, pattern)]), path) is (not want)


def test_longest_pattern_wins_tie_goes_to_allow():
    rules = [(False, "/ties/"), (True, "/ties*")]  # equal length 6
    assert allowed(compile_rules(rules), "/ties/x") is True
    rules = [(False, "/deep/path/"), (True, "/deep/")]
    assert allowed(compile_rules(rules), "/deep/path/y") is False


@pytest.mark.parametrize("url,want", [
    ("https://h/x/y?q=1#frag", "/x/y?q=1"),
    ("https://h", "/"),
    ("https://h?q=1", "/?q=1"),
    ("http://h:8080/p", "/p"),
])
def test_path_query_of(url, want):
    assert path_query_of(url) == want


def test_engine_matches_oracle_on_fixture_family():
    from fixtures.gen_pages import (AGENT, _RB_HOSTS, crawl_url_of,
                                    robots_of_host)
    from urllib.parse import urlsplit

    bodies = {f"rb{k}.example.org": robots_of_host(k)
              for k in range(_RB_HOSTS)}
    m = RobotsMatcher.from_pairs(list(bodies.items()), AGENT)
    for i in range(1500):
        url = crawl_url_of(i)
        body = bodies[urlsplit(url).hostname]
        assert m.allowed_url(url) == oracle_allowed(body, AGENT, url), url


def test_broadcast_guard_raises(ray_session):
    import ray.data as rd

    robots = rd.from_arrow(pa.table({
        "host": ["a", "b"], "robots_txt": [b"x", b"y"]}))
    pages = rd.from_arrow(pa.table({"url": ["https://a/"]}))
    with pytest.raises(ValueError, match="max_broadcast_hosts"):
        robots_check(pages, robots, max_broadcast_hosts=1)


def test_join_mode_matches_broadcast_mode(ray_session):
    import ray.data as rd

    from fixtures.gen_pages import (AGENT, crawl_url_of,
                                    generate_robots_table)

    urls = [crawl_url_of(i) for i in range(400)]
    pages = rd.from_arrow(pa.table({"url": urls}))
    robots = rd.from_arrow(generate_robots_table())
    bc = robots_check(pages, robots, agent=AGENT, mode="broadcast") \
        .to_pandas().sort_values("url").reset_index(drop=True)
    jn = robots_check(pages, robots, agent=AGENT, mode="join",
                      num_partitions=4) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    assert bc.equals(jn)
    assert 0 < bc["allowed"].sum() < len(bc)  # both verdicts exercised


def test_robots_filter_keeps_allowed_rows_only(ray_session):
    import ray.data as rd

    from fixtures.gen_pages import (AGENT, crawl_url_of,
                                    generate_robots_table)

    urls = [crawl_url_of(i) for i in range(300)]
    pages = rd.from_arrow(pa.table({
        "url": urls, "payload": list(range(300))}))
    robots = rd.from_arrow(generate_robots_table())
    kept = robots_filter(pages, robots, agent=AGENT).to_pandas()
    verdicts = robots_check(pages, robots, agent=AGENT).to_pandas()
    want = set(verdicts[verdicts["allowed"] == 1]["url"])
    assert set(kept["url"]) == want
    assert list(kept.columns) == ["url", "payload"]  # schema preserved
