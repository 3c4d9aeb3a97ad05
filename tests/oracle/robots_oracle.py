"""Independent naive oracle for robots.txt permission checking.

Deliberately different mechanism from ``rayxt/robots.py``: every
allow/disallow pattern is translated to an anchored regular expression
(``re.escape`` literals joined by ``.*``), candidates are collected
exhaustively and the verdict picked by an explicit ``max()`` over
``(pattern_length, is_allow)``; the parser is a line-regex state
machine, and ``path?query`` comes from ``urllib.parse.urlsplit``.  It
restates the frozen policy from the spec text in ``rayxt/robots.py``'s
module docstring — never from the engine code.  Goldens are generated
from THIS module only.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

_LINE = re.compile(r"^\s*([A-Za-z-]+)\s*:\s*(.*?)\s*$")


def _lines(text):
    if isinstance(text, bytes):
        text = text.decode("utf-8", "replace")
    if text.startswith("﻿"):
        text = text[1:]
    return re.split(r"\r\n|\r|\n", text)


def oracle_parse(text):
    """``[(set_of_ua_values, [(is_allow, pattern), ...]), ...]``"""
    groups = []
    uas: list = []
    rules: list = []
    in_rules = False
    for raw in _lines(text):
        raw = re.sub(r"#.*", "", raw)
        m = _LINE.match(raw)
        if m is None:
            continue
        key, value = m.group(1).lower(), m.group(2)
        if key == "user-agent":
            if in_rules:
                groups.append((set(uas), rules))
                uas, rules, in_rules = [], [], False
            uas.append(value.lower())
        elif key in ("allow", "disallow"):
            if not uas:
                continue
            in_rules = True
            if value:
                rules.append((key == "allow", value))
    if uas:
        groups.append((set(uas), rules))
    return groups


def _pattern_re(pattern: str) -> re.Pattern:
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    body = ".*".join(re.escape(p) for p in pattern.split("*"))
    return re.compile("^" + body + (r"\Z" if anchored else ""))


def oracle_rules(groups, agent: str):
    token = agent.lower()
    specific = [len(ua) for uas, _ in groups for ua in uas
                if ua != "*" and token.startswith(ua)]
    rules = []
    if specific:
        want = max(specific)
        for uas, grp in groups:
            if any(ua != "*" and len(ua) == want and token.startswith(ua)
                   for ua in uas):
                rules.extend(grp)
    else:
        for uas, grp in groups:
            if "*" in uas:
                rules.extend(grp)
    return rules


def oracle_allowed(body, agent: str, url: str) -> bool:
    if body is None:
        return True
    parts = urlsplit(url)
    pq = parts.path or "/"
    if parts.query:
        pq += "?" + parts.query
    candidates = []
    for is_allow, pattern in oracle_rules(oracle_parse(body), agent):
        if _pattern_re(pattern).match(pq):
            candidates.append((len(pattern), is_allow))
    if not candidates:
        return True
    return max(candidates)[1]
