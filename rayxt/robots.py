"""robots.txt parsing and URL permission checking (RFC 9309), the
crawl-politeness filter a Common-Crawl-scale pipeline applies before
(or while re-processing) a fetch corpus.

Frozen policy (the independent oracle in
``tests/oracle/robots_oracle.py`` restates it from this spec text —
never from the code):

Parsing
  * bytes decode UTF-8-with-replacement; a leading BOM is stripped.
  * lines split on CR / LF / CRLF; ``#`` starts a comment to EOL.
  * a line is ``key: value`` with the key case-insensitive and both
    sides ASCII-stripped; recognized keys: ``user-agent``, ``allow``,
    ``disallow`` — everything else (``sitemap``, ``crawl-delay``, …)
    is ignored.
  * groups: one or more CONSECUTIVE ``user-agent`` lines open a group;
    the allow/disallow rules that follow belong to every agent named
    in that header run.  A ``user-agent`` line after at least one rule
    starts a NEW group.  Rules before any ``user-agent`` line are
    ignored.
  * an ``allow``/``disallow`` with an EMPTY value is dropped (an empty
    ``Disallow:`` therefore allows everything, per the RFC's ABNF).

Agent matching and group selection
  * an agent matches a ``user-agent`` value if the value is ``*`` or a
    case-insensitive PREFIX of the agent's product token (so the line
    ``FooBot`` matches the agent ``foobot/1.2``; the line
    ``FooBot-Images`` does not).
  * the effective rule set is the union of the rules of every group
    whose header contains the LONGEST matching non-``*`` value; if no
    specific value matches, the union of all ``*`` groups; if there is
    no ``*`` group either, everything is allowed.

Rule matching (per URL)
  * the matched string is ``path?query`` of the url (path defaults to
    ``/``; the fragment never participates).
  * ``*`` in a pattern matches any character run (including ``/``);
    a TERMINAL ``$`` anchors the match at end-of-string (a ``$``
    anywhere else is a literal).
  * match comparison is raw-octet (no percent-decoding) — documented
    divergence from RFC 9309 §2.2.3's %-normalization nuance.
  * the applicable rule is the matching rule with the LONGEST pattern
    (octet length, wildcards counted); ties go to ``allow``.  No
    matching rule -> allowed.  No robots.txt for the host -> allowed.

Directive extraction (``robots_directives``) — frozen policy
  * ``sitemap`` values are FILE-WIDE (independent of groups, per RFC
    9309 §2.3's treatment of other records): collected in file order,
    ASCII-stripped, empties dropped, case-sensitive duplicates
    removed, and only absolute http(s) URLs kept.
  * ``crawl-delay`` lines belong to the current group and close its
    header run exactly like allow/disallow rules do; the effective
    delay for an agent is the FIRST ``float()``-parseable value among
    the groups group-selection picks (same longest-UA-prefix rule as
    permissions), scanning groups in file order; none -> null.
    Negative or non-finite values are unparseable.
  * permission checking (:func:`parse_robots`) is untouched by
    directive lines — the two walks are independent by design.

Scale shape: two dataset modes.  ``broadcast`` compiles the per-host
matcher table ONCE on the driver (robots tables are per-HOST — orders
of magnitude smaller than the page corpus) under an explicit row-count
guard and ships it via ``ray.put``; pages stream through a stateless
``map_batches`` with zero exchanges.  ``join`` (beyond-broadcast host
universes) hash-joins the narrow ``(url, host)`` projection against
the robots table and evaluates per batch with a per-actor compiled-
rules cache — the page corpus' wide columns never enter the exchange.
``robots_directives`` is a stateless per-row map over the robots table
itself (already host-granular) — zero exchanges.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from .linkgraph import host_of_url

__all__ = [
    "parse_robots",
    "select_rules",
    "compile_rules",
    "path_query_of",
    "allowed",
    "RobotsMatcher",
    "robots_check",
    "robots_filter",
    "parse_directives",
    "robots_directives",
]


def _decode(text) -> str:
    if isinstance(text, bytes):
        s = text.decode("utf-8", "replace")
    else:
        s = text
    return s.lstrip("﻿")


def parse_robots(text) -> list[tuple[tuple[str, ...], list[tuple[bool, str]]]]:
    """Parse a robots.txt body into groups:
    ``[(ua_values_lowercased, [(is_allow, pattern), ...]), ...]``."""
    groups: list = []
    cur_uas: list[str] = []
    cur_rules: list | None = None  # None = header run still open
    for raw in _decode(text).replace("\r\n", "\n").replace("\r", "\n") \
                            .split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if cur_rules is not None:  # rules seen: new group starts
                groups.append((tuple(cur_uas), cur_rules))
                cur_uas, cur_rules = [], None
            cur_uas.append(value.lower())
        elif key in ("allow", "disallow"):
            if not cur_uas:
                continue  # rules before any user-agent line: ignored
            if cur_rules is None:
                cur_rules = []
            if value:
                cur_rules.append((key == "allow", value))
    if cur_uas:
        groups.append((tuple(cur_uas), cur_rules or []))
    return groups


def select_rules(groups, agent: str) -> list[tuple[bool, str]]:
    """The effective rule list for ``agent`` (most-specific matching
    group union, ``*`` fallback)."""
    token = agent.lower()
    best_len = -1
    for uas, _ in groups:
        for ua in uas:
            if ua != "*" and token.startswith(ua) and len(ua) > best_len:
                best_len = len(ua)
    rules: list = []
    for uas, grp_rules in groups:
        if best_len >= 0:
            if any(ua != "*" and len(ua) == best_len
                   and token.startswith(ua) for ua in uas):
                rules.extend(grp_rules)
        elif "*" in uas:
            rules.extend(grp_rules)
    return rules


def _match_one(pattern: str, path: str) -> bool:
    """Iterative greedy wildcard match — deliberately not regex (the
    oracle uses regex translation as its independent mechanism)."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = pattern.split("*")
    if not path.startswith(parts[0]):
        return False
    pos = len(parts[0])
    last = len(parts) - 1
    for k in range(1, len(parts)):
        part = parts[k]
        if not part:
            continue  # consecutive/trailing '*' — nothing to pin
        if anchored and k == last:
            # last literal under $: must sit at the very end
            idx = len(path) - len(part)
            if idx < pos or not path.endswith(part):
                return False
            pos = len(path)
            continue
        idx = path.find(part, pos)
        if idx < 0:
            return False
        pos = idx + len(part)
    if anchored and last == 0:
        return pos == len(path)
    return True


def compile_rules(rules) -> list[tuple[int, bool, str]]:
    """Longest-pattern-first, allow-before-disallow order, so the FIRST
    matching entry is the verdict."""
    return sorted(((len(p), a, p) for a, p in rules),
                  key=lambda t: (-t[0], not t[1]))


def path_query_of(url: str) -> str:
    """``path?query`` of an absolute URL (fragment stripped, empty
    path -> ``/``)."""
    rest = url
    if "#" in rest:
        rest = rest.split("#", 1)[0]
    scheme_end = rest.find("://")
    if scheme_end >= 0:
        rest = rest[scheme_end + 3:]
        slash = -1
        for k, ch in enumerate(rest):
            if ch in "/?":
                slash = k
                break
        if slash < 0:
            return "/"
        rest = rest[slash:]
    if rest.startswith("?"):
        rest = "/" + rest
    return rest or "/"


def allowed(compiled, path_query: str) -> bool:
    for _, is_allow, pattern in compiled:
        if _match_one(pattern, path_query):
            return is_allow
    return True


class RobotsMatcher:
    """Per-host compiled verdict table: ``host -> compiled rules``;
    hosts absent from the table are allowed."""

    def __init__(self, by_host: dict):
        self._by_host = by_host

    @classmethod
    def from_pairs(cls, pairs, agent: str) -> "RobotsMatcher":
        by_host = {}
        for host, body in pairs:
            if body is None:
                continue
            compiled = compile_rules(select_rules(parse_robots(body), agent))
            if compiled:
                by_host[host.lower()] = compiled
        return cls(by_host)

    def allowed_url(self, url: str) -> bool:
        rules = self._by_host.get(host_of_url(url))
        if not rules:
            return True
        return allowed(rules, path_query_of(url))


# ---------------------------------------------------------------------------
# dataset stages
# ---------------------------------------------------------------------------

_MAX_BROADCAST_HOSTS = 2_000_000


def _broadcast_matcher(robots, agent: str, host_col: str, body_col: str,
                       max_hosts: int) -> "RobotsMatcher":
    """Driver-side compile of the per-host rule table — a BOUNDED
    aggregate (one row per host, guarded by ``max_hosts``), the same
    documented envelope as the dup-set broadcasts in rayxt/dedup.py."""
    narrow = robots.select_columns([host_col, body_col])
    n = narrow.count()
    if n > max_hosts:
        raise ValueError(
            f"robots table has {n} hosts > max_broadcast_hosts={max_hosts}; "
            "use mode='join'")
    pairs: list = []
    for batch in narrow.iter_batches(batch_format="pyarrow",
                                     batch_size=65536):
        pairs.extend(zip(batch[host_col].to_pylist(),
                         batch[body_col].to_pylist()))
    return RobotsMatcher.from_pairs(pairs, agent)


class _CheckJoined:
    """Join-mode stage: (url, robots body) rows -> (url, allowed) with
    a per-actor compiled-rules cache keyed by the body's crc+length
    (one compile per distinct robots file per actor, not per row)."""

    def __init__(self, agent: str, body_col: str):
        self._agent = agent
        self._body_col = body_col
        self._cache: dict = {}

    def _rules_for(self, body):
        if body is None:
            return None
        key = (len(body), zlib.crc32(body if isinstance(body, bytes)
                                     else body.encode()))
        rules = self._cache.get(key)
        if rules is None:
            rules = compile_rules(
                select_rules(parse_robots(body), self._agent))
            self._cache[key] = rules
        return rules

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        bodies = batch[self._body_col].to_pylist()
        out = np.ones(len(urls), np.int8)
        for k, (u, b) in enumerate(zip(urls, bodies)):
            rules = self._rules_for(b)
            if rules:
                out[k] = allowed(rules, path_query_of(u))
        return pa.table({"url": pa.array(urls, pa.string()),
                         "allowed": pa.array(out, pa.int8())})


def _host_col_batch(batch: pa.Table) -> pa.Table:
    hosts = [host_of_url(u) for u in batch["url"].to_pylist()]
    return batch.append_column("host", pa.array(hosts, pa.string()))


def robots_check(pages, robots, *, agent: str = "*",
                 host_col: str = "host", body_col: str = "robots_txt",
                 mode: str = "broadcast",
                 max_broadcast_hosts: int = _MAX_BROADCAST_HOSTS,
                 num_partitions: int = 16):
    """``(url, allowed int8)`` for every page row.

    ``broadcast``: compile once on the driver (row-count guarded),
    ``ray.put`` the matcher, stream pages through one stateless map —
    zero exchanges.  ``join``: left-join the narrow ``(url, host)``
    projection against the robots table and compile per batch behind a
    per-actor cache — two exchanges of narrow rows, no driver state.
    """
    import ray

    urls = pages.select_columns(["url"])
    if mode == "broadcast":
        matcher = _broadcast_matcher(robots, agent, host_col, body_col,
                                     max_broadcast_hosts)
        ref = ray.put(matcher)

        def check(batch: pa.Table) -> pa.Table:
            m = ray.get(ref)  # plasma-local after the first fetch
            us = batch["url"].to_pylist()
            ok = np.fromiter((m.allowed_url(u) for u in us), np.int8,
                             len(us))
            return pa.table({"url": pa.array(us, pa.string()),
                             "allowed": pa.array(ok, pa.int8())})

        return urls.map_batches(check, batch_format="pyarrow")
    if mode != "join":
        raise ValueError(f"unknown mode {mode!r}")
    with_host = urls.map_batches(_host_col_batch, batch_format="pyarrow")
    joined = with_host.join(
        robots.select_columns([host_col, body_col]), "left_outer",
        num_partitions=num_partitions, on=("host",),
        right_on=(host_col,) if host_col != "host" else None)
    return joined.map_batches(
        _CheckJoined, batch_format="pyarrow", concurrency=(1, 8),
        fn_constructor_args=(agent, body_col), num_cpus=1)


def parse_directives(body, agent: str):
    """``(crawl_delay, sitemaps)`` for one robots.txt body under the
    frozen directive policy (module docstring)."""
    if body is None:
        return None, []
    sitemaps: list[str] = []
    seen_sitemaps: set[str] = set()
    groups: list = []           # (uas, delays) with rule-like grouping
    cur_uas: list[str] = []
    cur_body: list | None = None  # delays; None = header run open
    for raw in _decode(body).replace("\r\n", "\n").replace("\r", "\n") \
                            .split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "sitemap":
            if (value and value not in seen_sitemaps
                    and value.lower().startswith(("http://", "https://"))):
                seen_sitemaps.add(value)
                sitemaps.append(value)
            continue
        if key == "user-agent":
            if cur_body is not None:
                groups.append((tuple(cur_uas), cur_body))
                cur_uas, cur_body = [], None
            cur_uas.append(value.lower())
        elif key in ("allow", "disallow", "crawl-delay"):
            if not cur_uas:
                continue
            if cur_body is None:
                cur_body = []
            if key == "crawl-delay" and value:
                cur_body.append(value)
    if cur_uas:
        groups.append((tuple(cur_uas), cur_body or []))

    token = agent.lower()
    best_len = -1
    for uas, _ in groups:
        for ua in uas:
            if ua != "*" and token.startswith(ua) and len(ua) > best_len:
                best_len = len(ua)
    delay = None
    for uas, delays in groups:
        if best_len >= 0:
            picked = any(ua != "*" and len(ua) == best_len
                         and token.startswith(ua) for ua in uas)
        else:
            picked = "*" in uas
        if not picked:
            continue
        for v in delays:
            # float() allows 1_000 and -0; the policy does not
            if "_" in v or v.startswith("-"):
                continue
            try:
                d = float(v)
            except ValueError:
                continue
            if d >= 0 and d == d and d != float("inf"):
                delay = d
                break
        if delay is not None:
            break
    return delay, sitemaps


def robots_directives(robots, *, agent: str = "*",
                      host_col: str = "host",
                      body_col: str = "robots_txt"):
    """One row per (host, sitemap URL): ``(host, crawl_delay,
    sitemap_url)``; a host with no sitemap directives emits one row
    with a null ``sitemap_url``.  Stateless map over the host-granular
    robots table — zero exchanges."""

    def extract(batch: pa.Table) -> pa.Table:
        hosts, delays, maps = [], [], []
        for host, body in zip(batch[host_col].to_pylist(),
                              batch[body_col].to_pylist()):
            delay, sitemaps = parse_directives(body, agent)
            for sm in sitemaps or [None]:
                hosts.append(host)
                delays.append(delay)
                maps.append(sm)
        return pa.table({
            "host": pa.array(hosts, pa.string()),
            "crawl_delay": pa.array(delays, pa.float64()),
            "sitemap_url": pa.array(maps, pa.string()),
        })

    return robots.map_batches(extract, batch_format="pyarrow")


def robots_filter(pages, robots, *, agent: str = "*",
                  host_col: str = "host", body_col: str = "robots_txt",
                  max_broadcast_hosts: int = _MAX_BROADCAST_HOSTS):
    """Pages whose url the host's robots.txt allows for ``agent`` —
    broadcast mode only (the wide page columns never need an exchange;
    beyond-broadcast host universes should ``robots_check`` + join the
    verdicts instead)."""
    import ray

    matcher = _broadcast_matcher(robots, agent, host_col, body_col,
                                 max_broadcast_hosts)
    ref = ray.put(matcher)

    def keep(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)  # plasma-local after the first fetch
        mask = np.fromiter(
            (m.allowed_url(u) for u in batch["url"].to_pylist()),
            np.bool_, batch.num_rows)
        return batch.filter(pa.array(mask))

    return pages.map_batches(keep, batch_format="pyarrow")
