"""Independent naive oracle for registered-domain extraction.

Restates the Public-Suffix algorithm from the ``rayxt/psl.py`` spec
text over the SAME frozen snapshot table, with a deliberately
different mechanism: rules load into a right-to-left label TRIE, a
walk collects EVERY matching rule, and the spec precedence
(exception > most labels > implicit ``*``) is applied over the
collected set — versus the engine's longest-first tail-string set
lookups that never materialize the match set.
"""

from __future__ import annotations

from rayxt.psl import PSL_EXCEPTION, PSL_NORMAL, PSL_WILDCARD

_TRIE: dict = {}


def _insert(labels, kind):
    node = _TRIE
    for lb in reversed(labels):
        node = node.setdefault(lb, {})
    node["$"] = kind


for _s in PSL_NORMAL:
    _insert(_s.split("."), "normal")
for _tld in PSL_WILDCARD:
    _insert(["*", _tld], "wildcard")
for _s in PSL_EXCEPTION:
    _insert(["!"] + _s.split("."), None)  # marker; see _matches


def _matches(labels):
    """Every (rule_label_count, kind) whose rule matches the host."""
    found = []

    def walk(node, i, depth):
        if "$" in node:
            found.append((depth, node["$"]))
        if i < 0:
            return
        lb = labels[i]
        if lb in node:
            walk(node[lb], i - 1, depth + 1)
        if "*" in node:
            walk(node["*"], i - 1, depth + 1)

    walk(_TRIE, len(labels) - 1, 0)
    # exception rules live under a leading "!" label: re-walk for them
    exc = []
    for s in PSL_EXCEPTION:
        rl = s.split(".")
        if labels[-len(rl):] == rl:
            exc.append(len(rl) - 1)  # suffix drops the leftmost label
    return found, exc


def oracle_registered_domain(host):
    if not host:
        return None
    host = host.lower()
    if host.endswith("."):
        host = host[:-1]
    if not host:
        return None
    labels = host.split(".")
    if any(lb == "" for lb in labels):
        return None
    parts = host.split(".")
    if len(parts) == 4 and all(
            p.isdigit() and p.isascii() and int(p) <= 255
            for p in parts):
        return host
    found, exc = _matches(labels)
    if exc:
        suffix_len = min(exc)
    elif found:
        suffix_len = max(d for d, _k in found)
    else:
        suffix_len = 1
    if len(labels) <= suffix_len:
        return None
    return ".".join(labels[-(suffix_len + 1):])
