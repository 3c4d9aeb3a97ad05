"""XPath / CSS selector subset over :mod:`rayxt.dom` trees.

Implements exactly the subset needed by the rule programs and the
conformance corpus (SURVEY.md section 7.4 / M3); anything outside the
subset raises :class:`SelectorError` at *compile* time rather than
silently mis-evaluating.

XPath subset::

    /a/b   //a   a/b   .//a   *   .   ..
    explicit axes: child:: descendant:: descendant-or-self:: self::
                   parent:: ancestor:: ancestor-or-self::
                   following-sibling:: preceding-sibling::
                   following:: preceding:: attribute::
                   (reverse axes count position nearest-first per spec;
                   namespace:: raises)
    attribute steps (final step only): @name  @*  attribute::name —
                yield attribute VALUE strings, lxml-style
    predicates: [n] [last()] [last()-n] [@attr] [@attr='v'] [@attr!='v']
                [tag] [text()] [text()='v'] [text()!='v']
                [position() <op> n|last()|last()-n]  (<op> in = != < <= > >=)
                [not(<pred-expr>)]
                [contains(<arg>, 'v')] [starts-with(<arg>, 'v')]
                [normalize-space(<arg>?)] [normalize-space(<arg>?)='v']
                [string-length(<arg>?) <op> n]
                [@attr <op> N]  (XPath number() semantics: the
                attribute string converts, NaN and missing -> false;
                N may be negative / decimal)
                [count(rel-path) <op> N]  (relative paths only,
                nested predicates allowed)
                where <arg> is @attr | text() | . (the string-value;
                text() is the element's FIRST text node per XPath's
                node-set->string rule)
                plus 'and' / 'or' of those
    unions: p1 | p2
    names: local, prefix:local (resolved against the nsmap), {uri}local

CSS subset (compiled onto the same AST)::

    tag  .class  #id  [attr]  [attr=v]  [attr~=v] [attr^=v] [attr$=v]
    [attr*=v] [attr|=v]  *
    descendant (space), child (>), comma (union), compounds (div.a#b)
    pseudo-classes: :first-child :last-child :not(<simple compound>)
                    :nth-child(an+b | odd | even)  :nth-of-type(an+b)
                    :nth-last-child(an+b)  :nth-last-of-type(an+b)
                    :first-of-type :last-of-type :only-child
                    :empty  :has(<simple compound>)  :has(> <...>)
                    (others raise)

Evaluation returns elements in document order without duplicates.
Namespace resolution of ``prefix:local`` happens at evaluation time via
the supplied nsmap (so one compiled selector serves many documents).
"""

from __future__ import annotations

import re

from .dom import Node

__all__ = ["SelectorError", "XPath", "parse_xpath", "css_to_xpath", "parse_css"]


class SelectorError(ValueError):
    """Selector outside the supported subset (raised at compile time)."""


_TOKEN_RE = re.compile(
    r"""
    (?P<dslash>//)
  | (?P<slash>/)
  | (?P<axisop>::)
  | (?P<lbrack>\[)
  | (?P<rbrack>\])
  | (?P<union>\|)
  | (?P<at>@)
  | (?P<neq>!=)
  | (?P<le><=)
  | (?P<ge>>=)
  | (?P<lt><)
  | (?P<gt>>)
  | (?P<eq>=)
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<comma>,)
  | (?P<string>'[^']*'|"[^"]*")
  | (?P<number>\d+(?:\.\d+)?)
  | (?P<dotdot>\.\.)
  | (?P<dot>\.)
  | (?P<star>\*)
  | (?P<name>\{[^}]*\}[\w.\-]+|[\w.\-]+(?::[\w.\-]+)?(?:\(\))?)
  | (?P<ws>\s+)
""",
    re.VERBOSE,
)


def _tokenize(s: str):
    tokens = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            raise SelectorError(f"cannot tokenize xpath {s!r} at offset {pos}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        val = m.group()
        if kind == "name" and re.fullmatch(r"-\d*(?:\.\d+)?", val):
            # the name pattern greedily eats '-1' in 'last()-1'; no real
            # tag name is a bare minus or minus-digits, so re-split
            tokens.append(("minus", "-"))
            if len(val) > 1:
                tokens.append(("number", val[1:]))
            continue
        tokens.append((kind, val))
    return tokens


# -- AST --------------------------------------------------------------------


class _Pred:
    def matches(self, node, position, size, nsmap):  # pragma: no cover - abstract
        raise NotImplementedError


class _PosPred(_Pred):
    def __init__(self, n):
        self.n = n

    def matches(self, node, position, size, nsmap):
        return position == self.n


class _LastPred(_Pred):
    def matches(self, node, position, size, nsmap):
        return position == size


class _AttrPred(_Pred):
    def __init__(self, name, value=None, negate=False):
        self.name = name
        self.value = value
        self.negate = negate

    def matches(self, node, position, size, nsmap):
        if self.value is None:
            return self.name in node.attrs
        got = node.attrs.get(self.name)
        if got is None:
            # XPath node-set comparison: an empty node-set compares
            # false under BOTH = and != (lxml agrees)
            return False
        return (got != self.value) if self.negate else (got == self.value)


_XPATH_NUM_RE = re.compile(r"^-?(\d+(\.\d*)?|\.\d+)$")
_XML_WS = " \t\r\n"


def _xpath_number(s: str):
    """XPath 1.0 ``number()`` of a string: optional surrounding XML
    whitespace, optional leading minus, decimal digits — anything
    else is NaN (returned as None here so comparisons are false)."""
    s = s.strip(_XML_WS)
    if not _XPATH_NUM_RE.match(s):
        return None
    return float(s)


class _AttrNumPred(_Pred):
    """``[@attr <op> N]`` — XPath numeric comparison: the attribute's
    string converts via ``number()`` (NaN -> false), a missing
    attribute (empty node-set) compares false under every operator."""

    def __init__(self, name, op, n: float):
        self.name = name
        self.op = op
        self.n = n

    def matches(self, node, position, size, nsmap):
        raw = node.attrs.get(self.name)
        if raw is None:
            return False
        v = _xpath_number(raw)
        if v is None:
            return False
        return _num_cmp(v, self.op, self.n)


def _num_cmp(v, op, n) -> bool:
    if op == "=":
        return v == n
    if op == "!=":
        return v != n
    if op == "<":
        return v < n
    if op == "<=":
        return v <= n
    if op == ">":
        return v > n
    return v >= n


class _CountPred(_Pred):
    """``[count(rel-path) <op> N]`` — the size of the node-set the
    RELATIVE path selects from the candidate node (absolute paths
    raise at compile: a predicate has no document root)."""

    def __init__(self, steps, op, n: float, source: str):
        self.steps = steps
        self.op = op
        self.n = n
        # a throwaway XPath carries the step evaluator; its dedup per
        # step makes len() the node-set size
        self._xp = XPath([(False, steps)], source)

    def matches(self, node, position, size, nsmap):
        found = self._xp._eval_path(node, False, self.steps, nsmap)
        return _num_cmp(float(len(found)), self.op, self.n)


class _ClassWordPred(_Pred):
    """CSS ``.cls``: class attribute contains the word."""

    def __init__(self, word):
        self.word = word

    def matches(self, node, position, size, nsmap):
        return self.word in (node.attrs.get("class") or "").split()


class _ChildTagPred(_Pred):
    def __init__(self, name):
        self.name = name

    def matches(self, node, position, size, nsmap):
        return any(
            c.is_element() and _tag_matches(c, self.name, nsmap)
            for c in node.children
        )


class _FirstChildPred(_Pred):
    """CSS ``:first-child`` — first ELEMENT child of its parent."""

    def matches(self, node, position, size, nsmap):
        p = node.parent
        if p is None:
            return True
        return next((c for c in p.children if c.is_element()),
                    None) is node


class _LastChildPred(_Pred):
    """CSS ``:last-child`` — last ELEMENT child of its parent."""

    def matches(self, node, position, size, nsmap):
        p = node.parent
        if p is None:
            return True
        return next((c for c in reversed(p.children) if c.is_element()),
                    None) is node


class _NthChildPred(_Pred):
    """CSS ``:nth-child(an+b)`` — 1-based index among ELEMENT siblings
    equals ``a*k + b`` for some integer ``k >= 0`` (CSS Selectors L3;
    ``odd`` = 2n+1, ``even`` = 2n)."""

    def __init__(self, a: int, b: int, from_end: bool = False):
        self.a, self.b = a, b
        self.from_end = from_end

    def matches(self, node, position, size, nsmap):
        p = node.parent
        idx = 1
        if p is not None:
            idx = 0
            kids = reversed(p.children) if self.from_end else p.children
            for c in kids:
                if c.is_element():
                    idx += 1
                if c is node:
                    break
        if self.a == 0:
            return idx == self.b
        k, r = divmod(idx - self.b, self.a)
        return r == 0 and k >= 0


_NTH_RE = re.compile(r"^([+-]?\d*)n(?:\s*([+-]\s*\d+))?$|^([+-]?\d+)$")


def _parse_nth(text: str):
    """'odd' | 'even' | 'an+b' | 'b' | 'an' -> (a, b)."""
    t = text.strip().lower().replace(" ", "")
    if t == "odd":
        return 2, 1
    if t == "even":
        return 2, 0
    m = _NTH_RE.match(t)
    if not m:
        raise SelectorError(f"bad nth-child argument {text!r}")
    if m.group(3) is not None:
        return 0, int(m.group(3))
    a_txt = m.group(1)
    a = {"": 1, "+": 1, "-": -1}.get(a_txt)
    if a is None:
        a = int(a_txt)
    b = int(m.group(2)) if m.group(2) else 0
    return a, b


class _AttrOpPred(_Pred):
    """CSS attribute operators: ``~=`` word, ``^=`` prefix, ``$=`` suffix,
    ``*=`` substring, ``|=`` exact-or-dash-prefix (Selectors L3 6.3.1;
    an empty test string never matches for ^= $= *=)."""

    def __init__(self, name, op, value):
        self.name = name
        self.op = op
        self.value = value

    def matches(self, node, position, size, nsmap):
        got = node.attrs.get(self.name)
        if got is None:
            return False
        v = self.value
        if self.op == "~=":
            return v in got.split()
        if not v and self.op in ("^=", "$=", "*="):
            return False
        if self.op == "^=":
            return got.startswith(v)
        if self.op == "$=":
            return got.endswith(v)
        if self.op == "*=":
            return v in got
        return got == v or got.startswith(v + "-")  # |=


class _NthOfTypePred(_Pred):
    """CSS ``:nth-of-type(an+b)`` / ``:first-of-type`` (a=0,b=1) —
    1-based index among SAME-TAG element siblings matches an+b."""

    def __init__(self, a: int, b: int, from_end: bool = False):
        self.a, self.b, self.from_end = a, b, from_end

    def matches(self, node, position, size, nsmap):
        p = node.parent
        if p is None:
            idx = 1
        else:
            same = [c for c in p.children
                    if c.is_element() and c.tag == node.tag]
            if self.from_end:
                same = same[::-1]
            idx = next(i for i, c in enumerate(same, 1) if c is node)
        if self.a == 0:
            return idx == self.b
        k, r = divmod(idx - self.b, self.a)
        return r == 0 and k >= 0


class _OnlyChildPred(_Pred):
    """CSS ``:only-child`` — the parent has exactly one element child."""

    def matches(self, node, position, size, nsmap):
        p = node.parent
        if p is None:
            return True
        return sum(1 for c in p.children if c.is_element()) == 1


class _EmptyPred(_Pred):
    """CSS ``:empty`` — no element children and no text content.
    Comment children are ignorable per the CSS spec (their BODY never
    counts), but any tail text after one does."""

    def matches(self, node, position, size, nsmap):
        if node.text:
            return False
        for c in node.children:
            if c.is_element():
                return False
            if c.tail:
                return False
        return True


class _HasPred(_Pred):
    """CSS ``:has(<simple compound>)`` / ``:has(> <simple compound>)``
    subset — some descendant (or, with ``>``, some child) matches the
    combinator-free compound.  Inner predicates evaluate against the
    candidate's own parent/sibling context (every CSS pred here is
    parent-derived, so the step position args are unused — the
    :not() convention)."""

    def __init__(self, name, preds, child_only: bool):
        self.name = name
        self.preds = preds
        self.child_only = child_only

    def matches(self, node, position, size, nsmap):
        stack = list(reversed(node.children))
        while stack:
            c = stack.pop()
            if not c.is_element():
                continue
            if _tag_matches(c, self.name, nsmap) and all(
                    p.matches(c, 0, 0, nsmap) for p in self.preds):
                return True
            if not self.child_only:
                stack.extend(reversed(c.children))
        return False


class _NotCompoundPred(_Pred):
    """CSS ``:not(<simple compound>)`` — negate a tag + preds compound."""

    def __init__(self, name, preds):
        self.name = name
        self.preds = preds

    def matches(self, node, position, size, nsmap):
        inner = _tag_matches(node, self.name, nsmap) and all(
            p.matches(node, position, size, nsmap) for p in self.preds)
        return not inner


class _TextEqPred(_Pred):
    def __init__(self, value, negate=False):
        self.value = value
        self.negate = negate

    def matches(self, node, position, size, nsmap):
        got = (node.text or "") == self.value
        return not got if self.negate else got


def _string_value(node: Node) -> str:
    """XPath string-value of an element: every descendant text node in
    document order, concatenated raw (comment text excluded, comment
    *tails* included — they are the parent's character data)."""
    out = []
    if node.text:
        out.append(node.text)
    stack = [(c, True) for c in reversed(node.children)]
    while stack:
        n, fresh = stack.pop()
        if not fresh:
            if n.tail:
                out.append(n.tail)
            continue
        stack.append((n, False))
        if n.is_element():
            if n.text:
                out.append(n.text)
            stack.extend((c, True) for c in reversed(n.children))
    return "".join(out)


#: string-argument forms inside predicate functions:
#: ('attr', name) | ('text',) | ('self',).  Resolution returns None for
#: a missing attribute (empty node-set -> the function call is false /
#: length 0 per XPath's string() of an empty node-set being '').
def _resolve_strarg(arg, node, nsmap):
    if arg[0] == "attr":
        name = arg[1]
        if ":" in name and not name.startswith("{"):
            name = _resolve_name(name, nsmap)
        return node.attrs.get(name)
    if arg[0] == "text":
        # node-set -> string takes the FIRST text node; our DOM stores
        # the element's leading text on .text and later runs on child
        # tails, so the first text node is .text when present, else the
        # first non-empty child tail
        if node.text:
            return node.text
        for c in node.children:
            if c.tail:
                return c.tail
        return None
    return _string_value(node)


class _StrFnPred(_Pred):
    """``contains(arg, 'v')`` / ``starts-with(arg, 'v')``."""

    def __init__(self, fn, arg, value):
        self.fn = fn
        self.arg = arg
        self.value = value

    def matches(self, node, position, size, nsmap):
        s = _resolve_strarg(self.arg, node, nsmap)
        if s is None:
            s = ""
        if self.fn == "contains":
            return self.value in s
        return s.startswith(self.value)


class _NormSpacePred(_Pred):
    """``normalize-space(arg?)`` bare (truthy) or compared to a string."""

    def __init__(self, arg, op, value):
        self.arg = arg
        self.op = op  # 'truthy' | '=' | '!='
        self.value = value

    def matches(self, node, position, size, nsmap):
        s = _resolve_strarg(self.arg, node, nsmap) or ""
        norm = " ".join(s.split())
        if self.op == "truthy":
            return bool(norm)
        if self.op == "=":
            return norm == self.value
        return norm != self.value


_CMP_FNS = {
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
}


class _StrLenPred(_Pred):
    """``string-length(arg?) <op> n``."""

    def __init__(self, arg, op, n):
        self.arg = arg
        self.op = op
        self.n = n

    def matches(self, node, position, size, nsmap):
        s = _resolve_strarg(self.arg, node, nsmap) or ""
        return _CMP_FNS[self.op](len(s), self.n)


class _PosCmpPred(_Pred):
    """``position() <op> rhs`` where rhs is ('lit', n) | ('last', delta)."""

    def __init__(self, op, rhs):
        self.op = op
        self.rhs = rhs

    def matches(self, node, position, size, nsmap):
        target = self.rhs[1] if self.rhs[0] == "lit" else size + self.rhs[1]
        return _CMP_FNS[self.op](position, target)


class _NotPred(_Pred):
    """XPath ``not(<pred-expr>)``."""

    def __init__(self, inner):
        self.inner = inner

    def matches(self, node, position, size, nsmap):
        return not self.inner.matches(node, position, size, nsmap)


class _HasTextNodePred(_Pred):
    """Bare ``[text()]`` — the element has at least one non-empty text
    node child (leading .text or any child tail)."""

    def matches(self, node, position, size, nsmap):
        if node.text:
            return True
        return any(c.tail for c in node.children)


class _BoolPred(_Pred):
    def __init__(self, op, parts):
        self.op = op
        self.parts = parts

    def matches(self, node, position, size, nsmap):
        it = (p.matches(node, position, size, nsmap) for p in self.parts)
        return all(it) if self.op == "and" else any(it)


class _Step:
    __slots__ = ("axis", "name", "preds")

    def __init__(self, axis, name, preds):
        # 'child' | 'descendant' ('//' per-parent semantics) | 'self' |
        # 'parent' | explicit axes: 'descendant-explicit' |
        # 'descendant-or-self' | 'ancestor' | 'ancestor-or-self' |
        # 'following-sibling' | 'preceding-sibling'
        self.axis = axis
        self.name = name  # '*' | 'text()' | tag name (plain/prefix/clark)
        self.preds = preds


#: axes whose results are collected in non-document order (reverse axes
#: count position nearest-first per the XPath spec) — evaluate() re-sorts
#: the final node-set into document order when any step uses one.
_UNORDERED_AXES = frozenset(
    {"ancestor", "ancestor-or-self", "preceding-sibling", "preceding"})


def _resolve_name(name: str, nsmap) -> str:
    """prefix:local -> Clark notation via nsmap; others pass through."""
    if name.startswith("{") or ":" not in name:
        if not name.startswith("{") and nsmap and "" in nsmap and nsmap[""]:
            # default namespace applies to unprefixed names in XML mode
            return "{%s}%s" % (nsmap[""], name)
        return name
    prefix, local = name.split(":", 1)
    if nsmap and prefix in nsmap:
        return "{%s}%s" % (nsmap[prefix], local)
    raise SelectorError(f"undeclared namespace prefix {prefix!r}")


def _tag_matches(node: Node, name: str, nsmap) -> bool:
    if name == "*":
        return node.is_element()
    return node.tag == _resolve_name(name, nsmap)


class XPath:
    """A compiled selector: a union of absolute/relative location paths."""

    def __init__(self, paths, source: str):
        self._paths = paths  # list of (absolute: bool, [steps])
        self.source = source
        self._needs_order = any(
            step.axis in _UNORDERED_AXES
            for _, steps in paths for step in steps)

    def __repr__(self):
        return f"XPath({self.source!r})"

    def evaluate(self, start: Node, nsmap=None):
        """Select elements; ``start`` is both context node and tree root."""
        result = []
        seen = set()
        for absolute, steps in self._paths:
            nodes = self._eval_path(start, absolute, steps, nsmap)
            for n in nodes:
                if isinstance(n, str):  # attribute values never dedup
                    result.append(n)    # (small strings intern)
                elif id(n) not in seen:
                    seen.add(id(n))
                    result.append(n)
        if len(self._paths) > 1 or self._needs_order:
            order = {id(n): i for i, n in enumerate(_document_order(start))}
            result.sort(key=lambda n: order.get(id(n), 1 << 30))
        return result

    def _eval_path(self, start, absolute, steps, nsmap):
        if absolute:
            virtual = Node("#document-virtual")
            virtual.children = [start]
            current = [virtual]
        else:
            current = [start]
        for step in steps:
            current = self._apply_step(current, step, nsmap)
            if not current:
                return []
        # note: the virtual document node never sets start.parent (children
        # assigned directly), so the real tree is untouched.  Attribute
        # steps yield plain strings — keep them alongside elements.
        return [n for n in current if isinstance(n, (Node, str))]

    def _apply_step(self, nodes, step, nsmap):
        out = []
        seen = set()
        for ctx in nodes:
            if step.axis == "self":
                cands = [ctx]
                self._filter_into(cands, step, nsmap, out, seen)
            elif step.axis == "parent":
                if step.name == "*" and not step.preds:
                    # bare '..' — may surface a non-element document node
                    if ctx.parent is not None and id(ctx.parent) not in seen:
                        seen.add(id(ctx.parent))
                        out.append(ctx.parent)
                elif ctx.parent is not None and ctx.parent.is_element():
                    self._filter_into([ctx.parent], step, nsmap, out, seen)
            elif step.axis in ("ancestor", "ancestor-or-self"):
                # reverse axis: candidates nearest-first for positions
                cands = []
                n = ctx if step.axis == "ancestor-or-self" else ctx.parent
                while n is not None:
                    if n.is_element():
                        cands.append(n)
                    n = n.parent
                self._filter_into(cands, step, nsmap, out, seen)
            elif step.axis == "attribute":
                # attribute VALUES (strings), lxml-style; '@*' yields
                # values sorted by attribute name for determinism.  No
                # id()-dedup: equal values from different elements are
                # distinct attribute nodes (and small strings intern).
                if not ctx.is_element():
                    continue
                if step.name == "*":
                    out.extend(ctx.attrs[k] for k in sorted(ctx.attrs))
                else:
                    name = step.name
                    if ":" in name and not name.startswith("{"):
                        # prefixed attr names resolve via nsmap; plain
                        # names are in NO namespace (default ns never
                        # applies to attributes, XML-Names 6.2)
                        name = _resolve_name(name, nsmap)
                    if name in ctx.attrs:
                        out.append(ctx.attrs[name])
            elif step.axis in ("following", "preceding"):
                # whole-document axes relative to the evaluation root
                root = ctx
                while root.parent is not None:
                    root = root.parent
                order = [n for n in root.iter() if n.is_element()]
                try:
                    i = next(j for j, n in enumerate(order) if n is ctx)
                except StopIteration:
                    continue  # ctx outside the tree (virtual doc node)
                if step.axis == "following":
                    # pre-order: ctx's descendants sit contiguously
                    # right after it; everything past them follows
                    ndesc = sum(1 for d in ctx.iter() if d.is_element()) - 1
                    cands = order[i + 1 + ndesc:]
                else:  # preceding: before ctx, minus ancestors; the
                    # reverse axis counts positions nearest-first
                    anc = set()
                    n = ctx.parent
                    while n is not None:
                        anc.add(id(n))
                        n = n.parent
                    cands = [n for n in order[:i]
                             if id(n) not in anc][::-1]
                self._filter_into(cands, step, nsmap, out, seen)
            elif step.axis in ("following-sibling", "preceding-sibling"):
                parent = ctx.parent
                if parent is None:
                    continue
                sibs = [c for c in parent.children if c.is_element()]
                try:
                    i = next(j for j, c in enumerate(sibs) if c is ctx)
                except StopIteration:
                    continue
                if step.axis == "following-sibling":
                    cands = sibs[i + 1:]
                else:  # reverse axis: nearest sibling is position 1
                    cands = sibs[:i][::-1]
                self._filter_into(cands, step, nsmap, out, seen)
            elif step.axis in ("descendant-explicit", "descendant-or-self"):
                # positions span the WHOLE axis result per context node
                # (unlike '//name', whose positions are per parent)
                cands = [d for d in ctx.iter()
                         if d.is_element()
                         and (d is not ctx
                              or step.axis == "descendant-or-self")]
                self._filter_into(cands, step, nsmap, out, seen)
            elif step.axis == "child":
                cands = [c for c in ctx.children if c.is_element()]
                self._filter_into(cands, step, nsmap, out, seen)
            else:  # descendant-or-self then name test (the '//' semantics)
                groups = {}
                order = []
                for d in ctx.iter():
                    for c in d.children:
                        if c.is_element():
                            key = id(d)
                            if key not in groups:
                                groups[key] = []
                                order.append(key)
                            groups[key].append(c)
                # include ctx itself as candidate under '//name' from virtual? no:
                # '//x' expands to /descendant-or-self::node()/child::x per spec.
                for key in order:
                    self._filter_into(groups[key], step, nsmap, out, seen)
        return out

    @staticmethod
    def _filter_into(cands, step, nsmap, out, seen):
        named = [c for c in cands if _tag_matches(c, step.name, nsmap)] \
            if step.name not in ("*",) else [c for c in cands if c.is_element()]
        size = len(named)
        for pos, c in enumerate(named, 1):
            ok = all(p.matches(c, pos, size, nsmap) for p in step.preds)
            if ok and id(c) not in seen:
                seen.add(id(c))
                out.append(c)


def _document_order(root: Node):
    return list(root.iter())


# -- parser -----------------------------------------------------------------


class _Parser:
    def __init__(self, tokens, source):
        self.toks = tokens
        self.i = 0
        self.source = source

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind):
        k, v = self.next()
        if k != kind:
            raise SelectorError(f"expected {kind} in {self.source!r}, got {v!r}")
        return v

    def parse(self):
        paths = [self.parse_path()]
        while self.peek()[0] == "union":
            self.next()
            paths.append(self.parse_path())
        if self.peek()[0] is not None:
            raise SelectorError(f"trailing tokens in xpath {self.source!r}")
        return paths

    def parse_path(self):
        absolute = False
        steps = []
        kind, _ = self.peek()
        if kind == "dslash":
            self.next()
            absolute = True
            steps.append(self.parse_step("descendant"))
        elif kind == "slash":
            self.next()
            absolute = True
            steps.append(self.parse_step("child"))
        else:
            steps.append(self.parse_step("child"))
        while True:
            kind, _ = self.peek()
            if kind == "dslash":
                self.next()
                steps.append(self.parse_step("descendant"))
            elif kind == "slash":
                self.next()
                steps.append(self.parse_step("child"))
            else:
                break
        for s in steps[:-1]:
            if s.axis == "attribute":
                raise SelectorError(
                    f"attribute step must be final in {self.source!r} "
                    "(attribute nodes have no children)")
        return absolute, steps

    #: explicit-axis spellings -> internal axis names; everything else
    #: (namespace::) raises.
    AXES = {
        "child": "child",
        "self": "self",
        "parent": "parent",
        "descendant": "descendant-explicit",
        "descendant-or-self": "descendant-or-self",
        "ancestor": "ancestor",
        "ancestor-or-self": "ancestor-or-self",
        "following-sibling": "following-sibling",
        "preceding-sibling": "preceding-sibling",
        "following": "following",
        "preceding": "preceding",
        "attribute": "attribute",
    }

    def parse_step(self, axis):
        kind, val = self.next()
        if kind == "at":  # '@name' path step == attribute::name
            if axis == "descendant":
                raise SelectorError(
                    f"'//@attr' unsupported in {self.source!r}; spell "
                    "the element step explicitly ('//*/@attr')")
            kind, val = self.next()
            if kind == "star":
                return self._attr_step("*")
            if kind != "name" or val.endswith("()"):
                raise SelectorError(
                    f"bad attribute name {val!r} in {self.source!r}")
            return self._attr_step(val)
        if kind == "name" and self.peek()[0] == "axisop":
            self.next()
            if val not in self.AXES:
                raise SelectorError(
                    f"unsupported axis {val!r} in {self.source!r}")
            if axis == "descendant":
                # '//axis::x' == /descendant-or-self::node()/axis::x —
                # outside the subset; spell the expansion explicitly
                raise SelectorError(
                    f"explicit axis after '//' unsupported in "
                    f"{self.source!r}")
            axis = self.AXES[val]
            kind, val = self.next()
            if axis == "attribute":
                if kind == "star":
                    return self._attr_step("*")
                if kind != "name" or val.endswith("()"):
                    raise SelectorError(
                        f"bad attribute name {val!r} in {self.source!r}")
                return self._attr_step(val)
        if kind == "dot":
            return _Step("self", "*", [])
        if kind == "dotdot":
            return _Step("parent", "*", [])
        if kind == "star":
            name = "*"
        elif kind == "name":
            if val.endswith("()"):
                if val != "text()":
                    raise SelectorError(f"unsupported function {val!r}")
                # text() is supported only as the [text()='v'] predicate
                raise SelectorError("text() as a location step is not selectable")
            name = val
        else:
            raise SelectorError(f"unexpected token {val!r} in {self.source!r}")
        preds = []
        while self.peek()[0] == "lbrack":
            self.next()
            preds.append(self.parse_pred_expr())
            self.expect("rbrack")
        return _Step(axis, name, preds)

    def _attr_step(self, name):
        if self.peek()[0] == "lbrack":
            raise SelectorError(
                f"predicates on attribute steps unsupported in "
                f"{self.source!r}")
        return _Step("attribute", name, [])

    def parse_pred_expr(self):
        parts = [self.parse_pred_atom()]
        op = None
        while self.peek() == ("name", "and") or self.peek() == ("name", "or"):
            _, word = self.next()
            if op is not None and word != op:
                raise SelectorError("mixed and/or without parentheses unsupported")
            op = word
            parts.append(self.parse_pred_atom())
        if op is None:
            return parts[0]
        return _BoolPred(op, parts)

    _CMP_TOKENS = {"eq": "=", "neq": "!=", "lt": "<", "le": "<=",
                   "gt": ">", "ge": ">="}

    def _cmp_op(self) -> str:
        kind, val = self.next()
        op = self._CMP_TOKENS.get(kind)
        if op is None:
            raise SelectorError(
                f"expected comparison operator in {self.source!r}, got {val!r}")
        return op

    def _number_value(self) -> float:
        """A (possibly negative, possibly decimal) numeric literal."""
        neg = False
        if self.peek()[0] == "minus":
            self.next()
            neg = True
        v = float(self.expect("number"))
        return -v if neg else v

    def _num_or_last(self):
        """Parse a numeric rhs: n | last() | last()-n -> ('lit'|'last', v)."""
        kind, val = self.next()
        if kind == "number":
            return ("lit", _int_tok(val, self.source))
        if kind == "name" and val == "last()":
            delta = 0
            if self.peek()[0] == "minus":
                self.next()
                delta = -_int_tok(self.expect("number"), self.source)
            return ("last", delta)
        raise SelectorError(
            f"expected number or last() in {self.source!r}, got {val!r}")

    def _parse_strarg(self, *, optional=False):
        """@attr | text() | .  (optional: absent -> the string-value)."""
        kind, val = self.peek()
        if kind == "at":
            self.next()
            return ("attr", self.expect("name"))
        if kind == "name" and val == "text()":
            self.next()
            return ("text",)
        if kind == "dot":
            self.next()
            return ("self",)
        if optional and kind == "rparen":
            return ("self",)
        raise SelectorError(
            f"expected @attr, text() or . as function argument in "
            f"{self.source!r}, got {val!r}")

    def parse_pred_atom(self):
        kind, val = self.peek()
        if kind == "number":
            self.next()
            return _PosPred(_int_tok(val, self.source))
        if kind == "at":
            self.next()
            attr = self.expect("name")
            k2 = self.peek()[0]
            if k2 in ("eq", "neq"):
                self.next()
                k3, v3 = self.peek()
                if k3 == "string":
                    self.next()
                    return _AttrPred(attr, v3[1:-1], negate=(k2 == "neq"))
                # numeric rhs: XPath number() comparison semantics
                return _AttrNumPred(attr, "=" if k2 == "eq" else "!=",
                                    self._number_value())
            if k2 in ("lt", "le", "gt", "ge"):
                op = self._cmp_op()
                return _AttrNumPred(attr, op, self._number_value())
            return _AttrPred(attr)
        if kind == "name":
            self.next()
            if val == "last()":
                if self.peek()[0] == "minus":
                    self.next()
                    delta = -_int_tok(self.expect("number"), self.source)
                    return _PosCmpPred("=", ("last", delta))
                return _LastPred()
            if val == "position()":
                op = self._cmp_op()
                return _PosCmpPred(op, self._num_or_last())
            if val == "text()":
                k2 = self.peek()[0]
                if k2 in ("eq", "neq"):
                    self.next()
                    s = self.expect("string")
                    return _TextEqPred(s[1:-1], negate=(k2 == "neq"))
                return _HasTextNodePred()
            if val == "count" and self.peek()[0] == "lparen":
                self.next()
                absolute, steps = self.parse_path()
                if absolute:
                    raise SelectorError(
                        f"count() argument must be a relative path in "
                        f"{self.source!r} (a predicate has no root)")
                self.expect("rparen")
                op = self._cmp_op()
                return _CountPred(steps, op, self._number_value(),
                                  self.source)
            if val == "not" and self.peek()[0] == "lparen":
                self.next()
                inner = self.parse_pred_expr()
                self.expect("rparen")
                return _NotPred(inner)
            if val in ("contains", "starts-with") and self.peek()[0] == "lparen":
                self.next()
                arg = self._parse_strarg()
                self.expect("comma")
                s = self.expect("string")
                self.expect("rparen")
                return _StrFnPred(val, arg, s[1:-1])
            if val == "normalize-space()" or (
                    val == "normalize-space" and self.peek()[0] == "lparen"):
                # no-arg spelling tokenizes with the parens folded in
                if val.endswith("()"):
                    arg = ("self",)
                else:
                    self.next()
                    arg = self._parse_strarg(optional=True)
                    self.expect("rparen")
                k2 = self.peek()[0]
                if k2 in ("eq", "neq"):
                    self.next()
                    s = self.expect("string")
                    return _NormSpacePred(
                        arg, "=" if k2 == "eq" else "!=", s[1:-1])
                return _NormSpacePred(arg, "truthy", None)
            if val == "string-length()" or (
                    val == "string-length" and self.peek()[0] == "lparen"):
                if val.endswith("()"):
                    arg = ("self",)
                else:
                    self.next()
                    arg = self._parse_strarg(optional=True)
                    self.expect("rparen")
                op = self._cmp_op()
                n = _int_tok(self.expect("number"), self.source)
                return _StrLenPred(arg, op, n)
            if val.endswith("()"):
                raise SelectorError(f"unsupported predicate function {val!r}")
            return _ChildTagPred(val)
        raise SelectorError(f"unsupported predicate near {val!r} in {self.source!r}")



def _int_tok(val, source: str) -> int:
    """Integer-only numeric token (positions, lengths): a decimal
    literal here is outside the subset — fail loud."""
    if "." in val:
        raise SelectorError(
            f"integer expected in {source!r}, got {val!r}")
    return int(val)


def parse_xpath(source: str) -> XPath:
    return XPath(_Parser(_tokenize(source), source).parse(), source)


# -- CSS --------------------------------------------------------------------

_CSS_TOKEN_RE = re.compile(
    r"""
    (?P<comma>,)
  | (?P<gt>\s*>\s*)
  | (?P<ws>\s+)
  | (?P<hash>\#[\w\-]+)
  | (?P<class>\.[\w\-]+)
  | (?P<attr>\[\s*[\w\-]+\s*(?:[~^$*|]?=\s*(?:'[^']*'|"[^"]*"|[\w\-]+)\s*)?\])
  | (?P<pseudo>:[\w\-]+(?:\([^()]*\))?)
  | (?P<star>\*)
  | (?P<tag>[\w\-]+(?:\|[\w\-]+)?)
""",
    re.VERBOSE,
)

_CSS_ATTR_RE = re.compile(
    r"""\[\s*(?P<name>[\w\-]+)\s*
        (?:(?P<op>[~^$*|]?=)\s*(?P<val>'[^']*'|"[^"]*"|[\w\-]*)\s*)?\]""",
    re.VERBOSE,
)


def _css_attr_pred(text: str) -> _Pred:
    am = _CSS_ATTR_RE.match(text)
    if not am:
        raise SelectorError(f"bad attr selector {text!r}")
    val = am.group("val")
    if val and val[0] in "'\"":
        val = val[1:-1]
    op = am.group("op")
    if op and op != "=":
        return _AttrOpPred(am.group("name"), op, val)
    return _AttrPred(am.group("name"), val)


def _css_pseudo_pred(text: str, source: str) -> _Pred:
    if text == ":first-child":
        return _FirstChildPred()
    if text == ":last-child":
        return _LastChildPred()
    if text == ":first-of-type":
        return _NthOfTypePred(0, 1)
    if text == ":last-of-type":
        return _NthOfTypePred(0, 1, from_end=True)
    if text == ":only-child":
        return _OnlyChildPred()
    if text.startswith(":not(") and text.endswith(")"):
        name, preds = _css_compound(text[5:-1].strip(), source)
        return _NotCompoundPred(name, preds)
    if text == ":empty":
        return _EmptyPred()
    if text.startswith(":has(") and text.endswith(")"):
        arg = text[5:-1].strip()
        child_only = arg.startswith(">")
        if child_only:
            arg = arg[1:].strip()
        name, preds = _css_compound(arg, source)
        return _HasPred(name, preds, child_only)
    if text.startswith(":nth-last-child(") and text.endswith(")"):
        return _NthChildPred(*_parse_nth(text[16:-1]), from_end=True)
    if text.startswith(":nth-child(") and text.endswith(")"):
        return _NthChildPred(*_parse_nth(text[11:-1]))
    if text.startswith(":nth-of-type(") and text.endswith(")"):
        return _NthOfTypePred(*_parse_nth(text[13:-1]))
    if text.startswith(":nth-last-of-type(") and text.endswith(")"):
        return _NthOfTypePred(*_parse_nth(text[18:-1]), from_end=True)
    raise SelectorError(f"unsupported pseudo-class {text!r} in {source!r}")


def _css_compound(sel: str, source: str):
    """Parse a combinator-free compound selector -> (name, preds)."""
    name, preds = "*", []
    pos = 0
    if not sel:
        raise SelectorError(f"empty compound selector in {source!r}")
    while pos < len(sel):
        m = _CSS_TOKEN_RE.match(sel, pos)
        if not m:
            raise SelectorError(f"cannot parse css {source!r} at {pos}")
        pos = m.end()
        kind = m.lastgroup
        text = m.group()
        if kind in ("ws", "gt", "comma"):
            raise SelectorError(
                f":not() argument must be a simple compound in {source!r}")
        if kind in ("tag", "star"):
            name = "*" if kind == "star" else text
        elif kind == "hash":
            preds.append(_AttrPred("id", text[1:]))
        elif kind == "class":
            preds.append(_ClassWordPred(text[1:]))
        elif kind == "attr":
            preds.append(_css_attr_pred(text))
        elif kind == "pseudo":
            preds.append(_css_pseudo_pred(text, source))
    return name, preds


def parse_css(source: str) -> XPath:
    """Compile the CSS subset straight onto the XPath AST."""
    paths = []
    for selector in source.split(","):
        selector = selector.strip()
        if not selector:
            raise SelectorError(f"empty selector in {source!r}")
        steps = []
        axis = "descendant"  # top-level CSS selectors match anywhere
        pos = 0
        cur = None  # current compound: [name, preds]

        def flush():
            nonlocal cur
            if cur is not None:
                steps.append(_Step(cur[2], cur[0], cur[1]))
                cur = None

        while pos < len(selector):
            m = _CSS_TOKEN_RE.match(selector, pos)
            if not m:
                raise SelectorError(f"cannot parse css {source!r} at {pos}")
            pos = m.end()
            kind = m.lastgroup
            text = m.group()
            if kind == "ws":
                flush()
                axis = "descendant"
            elif kind == "gt":
                flush()
                axis = "child"
            elif kind in ("tag", "star"):
                flush()
                cur = ["*" if kind == "star" else text, [], axis]
            else:
                if cur is None:
                    cur = ["*", [], axis]
                if kind == "hash":
                    cur[1].append(_AttrPred("id", text[1:]))
                elif kind == "class":
                    cur[1].append(_ClassWordPred(text[1:]))
                elif kind == "attr":
                    cur[1].append(_css_attr_pred(text))
                elif kind == "pseudo":
                    cur[1].append(_css_pseudo_pred(text, source))
        flush()
        if not steps:
            raise SelectorError(f"empty selector in {source!r}")
        paths.append((True, steps))
    return XPath(paths, source)


def css_to_xpath(source: str) -> XPath:
    return parse_css(source)
