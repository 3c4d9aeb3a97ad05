"""Condition language: compilation of rule conditions to matchers.

Reproduces the reference condition semantics (SURVEY.md section 2.2,
rows D1-D4 / E1-E6, reconstructed from funkyfuture/inxs — conditions are
AND-ed within a Rule, strings dispatch to tag / XPath matchers, dicts to
attribute matchers, callables are dependency-injected predicates).

Compilation happens once per :class:`~rayxt.rules.Transformation`
construction; per-document work is limited to an optional ``prepare``
pass (XPath node-set evaluation, done once per document per rule) and
cheap per-element ``matches`` calls.
"""

from __future__ import annotations

import operator as _operator

from .dom import Node
from .xpath import XPath, parse_css, parse_xpath

__all__ = [
    "Matcher",
    "Any",
    "OneOf",
    "Not",
    "HasNamespace",
    "If",
    "MatchesXPath",
    "MatchesCSS",
    "MatchesAttributes",
    "compile_condition",
    "compile_conditions",
]


class Matcher:
    """Compiled condition. ``prepare`` runs once per document traversal."""

    def prepare(self, run) -> None:
        pass

    def matches(self, element: Node, run) -> bool:  # pragma: no cover - abstract
        raise NotImplementedError

    # -- dispatch-compilation hooks (used by rules._RuleGroup) ------------
    def tag_domain(self):
        """frozenset of tags this matcher can possibly accept, or None.

        Non-None lets the rule engine index the rule into per-tag
        dispatch buckets and skip evaluating it entirely for elements
        outside the domain (SURVEY D2's "transformation table" as an
        actual tag-keyed table). Only matchers whose acceptance is
        EXACTLY "element.tag in domain" may return a set — the engine
        drops them from the per-bucket residual matcher list.
        """
        return None

    def fast_matches(self):
        """Return the cheapest callable(element, run) for the hot loop."""
        return self.matches


class _MatchAll(Matcher):
    def matches(self, element, run):
        return element.is_element()

    def fast_matches(self):
        # inline Node.is_element (tags never start with '#' for elements)
        return lambda element, run: element.tag[:1] != "#"


class _TagMatcher(Matcher):
    """D2: namespace-aware tag equality (Clark notation / prefix:local)."""

    def __init__(self, name: str):
        self.name = name
        self._resolved = name if (name.startswith("{") or ":" not in name) else None

    def matches(self, element, run):
        name = self._resolved
        if name is None:
            prefix, local = self.name.split(":", 1)
            uri = (run.nsmap or {}).get(prefix)
            if uri is None:
                return False
            name = "{%s}%s" % (uri, local)
        return element.tag == name

    def tag_domain(self):
        return frozenset((self._resolved,)) if self._resolved else None

    def fast_matches(self):
        if self._resolved is None:
            return self.matches
        name = self._resolved
        return lambda element, run: element.tag == name


class _XPathMatcher(Matcher):
    """D3: membership in the rule's XPath node-set, evaluated once per doc."""

    def __init__(self, xpath):
        self.xpath = xpath  # XPath | callable -> str|XPath
        self._ids = frozenset()

    def prepare(self, run):
        xp = self.xpath
        if callable(xp) and not isinstance(xp, XPath):
            from .rules import _invoke  # late import to avoid cycle

            xp = _invoke(xp, run)
        if isinstance(xp, str):
            xp = parse_xpath(xp)
        nodes = xp.evaluate(run.root, run.nsmap)
        self._ids = frozenset(id(n) for n in nodes)

    def matches(self, element, run):
        return id(element) in self._ids


_MISS = object()


class _AttrMatcher(Matcher):
    """D4: all constraints hold over the element's attributes.

    Keys/values may be strings or predicates; a ``None`` value means
    "attribute present" (reference semantics [R:L], frozen here); a
    callable key is a predicate over attribute *names* (matches if any
    attribute name satisfies it, and the paired value constraint applies
    to those attributes' values).
    """

    def __init__(self, constraints: dict):
        self.constraints = list(constraints.items())

    @staticmethod
    def _value_ok(value, constraint) -> bool:
        if constraint is None:
            return True
        if callable(constraint):
            return bool(constraint(value))
        return value == constraint

    def matches(self, element, run):
        attrs = element.attrs
        for key, val in self.constraints:
            if callable(key):
                hits = [v for k, v in attrs.items() if key(k)]
                if not hits or not any(self._value_ok(v, val) for v in hits):
                    return False
            else:
                if key not in attrs or not self._value_ok(attrs[key], val):
                    return False
        return True

    def fast_matches(self):
        # single plain-key constraint (the overwhelmingly common shape,
        # e.g. {"class": pred}): one dict probe, no loop, no method calls
        if len(self.constraints) == 1:
            key, val = self.constraints[0]
            if not callable(key):
                if val is None:
                    return lambda element, run, _k=key: _k in element.attrs
                if callable(val):
                    def _fm(element, run, _k=key, _v=val, _miss=_MISS):
                        got = element.attrs.get(_k, _miss)
                        return got is not _miss and bool(_v(got))
                    return _fm

                def _fe(element, run, _k=key, _v=val, _miss=_MISS):
                    return element.attrs.get(_k, _miss) == _v
                return _fe
        return self.matches


class _CallableMatcher(Matcher):
    """E6: user predicate, dependency-injected like handlers."""

    def __init__(self, fn):
        self.fn = fn

    def matches(self, element, run):
        from .rules import _invoke

        return bool(_invoke(self.fn, run, element=element))


class _CombinatorBase(Matcher):
    def __init__(self, *conditions):
        self.parts = [compile_condition(c) for c in conditions]

    def prepare(self, run):
        for p in self.parts:
            p.prepare(run)


class Any(_CombinatorBase):
    """E1: OR combinator.

    Fast path: when every sub-condition is a plain (non-namespaced) tag
    matcher the OR collapses to one frozenset membership test — the hot
    case for boilerplate tag lists (this is the tag-bucketed
    "transformation table" lookup of SURVEY D2)."""

    def __init__(self, *conditions):
        super().__init__(*conditions)
        self._tag_set = None
        if all(
            isinstance(p, _TagMatcher) and p._resolved is not None
            for p in self.parts
        ):
            self._tag_set = frozenset(p._resolved for p in self.parts)

    def matches(self, element, run):
        if self._tag_set is not None:
            return element.tag in self._tag_set
        return any(p.matches(element, run) for p in self.parts)

    def tag_domain(self):
        return self._tag_set

    def fast_matches(self):
        if self._tag_set is None:
            return self.matches
        tset = self._tag_set
        return lambda element, run: element.tag in tset


class OneOf(_CombinatorBase):
    """E2: exactly one sub-condition is true."""

    def matches(self, element, run):
        return sum(1 for p in self.parts if p.matches(element, run)) == 1


class Not(_CombinatorBase):
    """E3: true iff no sub-condition matches."""

    def matches(self, element, run):
        return not any(p.matches(element, run) for p in self.parts)


class HasNamespace(Matcher):
    """E4: element namespace URI equality."""

    def __init__(self, namespace: str):
        self.namespace = namespace

    def matches(self, element, run):
        return element.namespace == self.namespace


_UNSET = object()


class If(Matcher):
    """E5: operator over context values (Refs resolved late).

    Binary form ``If(Ref('n'), operator.gt, 3)``; unary form
    ``If(Ref('flag'), bool)`` applies the operator to x alone.
    """

    def __init__(self, x, op=_operator.eq, y=_UNSET):
        self.x, self.op, self.y = x, op, y

    def matches(self, element, run):
        from .rules import Ref

        def res(v):
            return v.resolve(run) if isinstance(v, Ref) else v

        if self.y is _UNSET:
            return bool(self.op(res(self.x)))
        return bool(self.op(res(self.x), res(self.y)))


class MatchesXPath(_XPathMatcher):
    """D3 explicit form: ``MatchesXPath('//div[@id="x"]')`` or callable."""

    def __init__(self, xpath):
        if isinstance(xpath, str):
            xpath = parse_xpath(xpath)
        super().__init__(xpath)


class MatchesCSS(_XPathMatcher):
    """CSS selector condition (north-star surface), compiled to XPath AST."""

    def __init__(self, selector: str):
        super().__init__(parse_css(selector))


class MatchesAttributes(_AttrMatcher):
    """D4 explicit form."""


def _looks_like_xpath(s: str) -> bool:
    if s.startswith("{"):  # Clark-notation tag — the URI's slashes are not a path
        return False
    return "/" in s or "[" in s or s == "." or s.startswith(("@", "("))


def compile_condition(condition) -> Matcher:
    """Dispatch a raw condition to its compiled matcher (D1-D4, E6)."""
    if isinstance(condition, Matcher):
        return condition
    if isinstance(condition, str):
        if condition == "*":
            return _MatchAll()
        if _looks_like_xpath(condition):
            return _XPathMatcher(parse_xpath(condition))
        return _TagMatcher(condition)
    if isinstance(condition, dict):
        return _AttrMatcher(condition)
    if isinstance(condition, XPath):
        return _XPathMatcher(condition)
    if callable(condition):
        return _CallableMatcher(condition)
    raise TypeError(f"unsupported condition {condition!r}")


def compile_conditions(conditions) -> list[Matcher]:
    if conditions is None:
        return []
    if isinstance(conditions, (str, dict, Matcher)) or callable(conditions):
        conditions = (conditions,)
    return [compile_condition(c) for c in conditions]
