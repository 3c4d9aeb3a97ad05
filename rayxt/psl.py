"""Registered-domain extraction under the Public Suffix List
ALGORITHM with a FROZEN snapshot rule table.

Web pipelines group by *registered domain* (crawl budgets, host
quality gates, dedup scopes): ``a.blog.co.uk`` and ``b.blog.co.uk``
are one site, but ``a.co.uk`` and ``b.co.uk`` are not.  The mapping
is the publicsuffix.org algorithm; the rule data is a living list no
offline engine can bundle current, so this module freezes a
SNAPSHOT SUBSET (documented below — changing it changes goldens) and
implements the full algorithm over it, wildcards and exceptions
included.  The independent oracle (``tests/oracle/psl_oracle.py``)
restates the ALGORITHM from this spec text with a different
mechanism (a right-to-left label trie vs the tail-string set lookups
here) over the same frozen table.

FROZEN POLICY:

* host handling: lowercase; ONE trailing dot strips; an empty host,
  any empty label, or a host that still ends/starts with a dot ->
  null domain.
* IPv4 literals (exactly four dot-separated all-digit octets, each
  0-255 with no leading ``+``/``-``) pass through AS the domain —
  grouping by IP is the only sane scope for IP-hosted captures.
* rule match: a rule matches when its labels equal the host's tail
  labels right-to-left; ``*`` matches exactly one label.  An
  exception rule (``!www.ck``) beats everything and names the suffix
  WITHOUT its leftmost label; otherwise the matching rule with the
  most labels prevails; no match -> the implicit ``*`` rule (the
  bare TLD is the suffix).
* registered domain = public suffix plus ONE more host label; a host
  that IS a public suffix (or shorter) -> null.

Scale shape: one stateless batch map, the per-batch work runs once
per DISTINCT host via ``dictionary_encode`` (the MinHash trick);
zero exchanges.
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["registered_domain", "add_registered_domain",
           "PSL_NORMAL", "PSL_WILDCARD", "PSL_EXCEPTION"]

# the frozen snapshot subset (suffix strings, no leading dot)
PSL_NORMAL = frozenset([
    "com", "net", "org", "io", "dev", "app", "info", "biz", "edu",
    "gov", "mil", "int", "xyz",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk", "ltd.uk", "plc.uk",
    "jp", "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "au", "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "br", "com.br", "net.br", "org.br",
    "cn", "com.cn", "net.cn", "org.cn", "gov.cn",
    "in", "co.in", "net.in", "org.in",
    "kr", "co.kr", "or.kr",
    "nz", "co.nz", "org.nz",
    "za", "co.za", "org.za",
    "de", "fr", "it", "nl", "es", "se", "no", "fi", "dk", "pl",
    "ru", "ca", "us", "eu", "ch", "at", "be", "cz", "gr", "hu",
    "pt", "ro", "ie", "mx", "ar", "cl", "tr", "il", "sg", "hk",
    "tw",
    "github.io", "gitlab.io", "blogspot.com", "s3.amazonaws.com",
])
PSL_WILDCARD = frozenset(["ck", "np"])      # the label under the *
PSL_EXCEPTION = frozenset(["www.ck"])

# longest normal rule (s3.amazonaws.com); derived so a future table
# edit cannot silently out-range the tail scan
_MAX_RULE_LABELS = max(s.count(".") + 1 for s in PSL_NORMAL)


def _is_ipv4(host: str) -> bool:
    parts = host.split(".")
    if len(parts) != 4:
        return False
    for p in parts:
        if not p.isdigit() or not p.isascii() or int(p) > 255:
            return False
    return True


def registered_domain(host) -> str | None:
    """The registered domain of one host under the frozen policy."""
    if not host:
        return None
    host = host.lower()
    if host.endswith("."):
        host = host[:-1]
    if not host:
        return None
    labels = host.split(".")
    if any(not lb for lb in labels):
        return None
    if _is_ipv4(host):
        return host
    n = len(labels)
    # exception rules first (suffix = rule minus its leftmost label)
    for k in range(min(n, _MAX_RULE_LABELS + 1), 0, -1):
        if ".".join(labels[-k:]) in PSL_EXCEPTION:
            suffix_len = k - 1
            break
    else:
        suffix_len = None
        # longest prevailing rule: wildcard rules span 2 labels
        for k in range(min(n, _MAX_RULE_LABELS), 0, -1):
            if ".".join(labels[-k:]) in PSL_NORMAL:
                suffix_len = k
                break
            if k >= 2 and labels[-(k - 1)] in PSL_WILDCARD and (
                    k - 1 == 1):
                suffix_len = k
                break
        if suffix_len is None:
            suffix_len = 1  # the implicit * rule
    if n <= suffix_len:
        return None
    return ".".join(labels[-(suffix_len + 1):])


def add_registered_domain(ds, host_col: str = "host",
                          out: str = "domain"):
    """Append the registered-domain column — one computation per
    batch-DISTINCT host, null-safe, zero exchanges."""

    def add(t: pa.Table) -> pa.Table:
        enc = t[host_col].combine_chunks().dictionary_encode()
        vals = [registered_domain(h)
                for h in enc.dictionary.to_pylist()]
        idx = enc.indices.to_pylist()
        col = pa.array(
            [vals[i] if i is not None else None for i in idx],
            pa.string())
        return t.append_column(out, col)

    return ds.map_batches(add, batch_format="pyarrow")
