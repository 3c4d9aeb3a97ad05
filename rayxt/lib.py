"""Handler / function library (SURVEY.md section 2.3, rows L1-L35).

Reproduces the reference's ``inxs/lib.py`` handler surface
(reconstructed): factory-style handlers return closures whose parameters
are dependency-injected by name (see :mod:`rayxt.rules`); ``Ref``
arguments are resolved at execution time against the run context.

Handlers marked "element" require an ``element`` symbol (i.e. must be
used inside a :class:`~rayxt.rules.Rule`); doc-level handlers work as
simple steps too.
"""

from __future__ import annotations

import logging
import re

from .dom import Node, extract_text, new_element, serialize
from .rules import AbortRule, AbortTransformation, Ref, resolve
from .xpath import parse_xpath

logger = logging.getLogger("rayxt")
logger.addHandler(logging.NullHandler())

__all__ = [
    "get_attribute", "get_localname", "get_text", "get_variable",
    "put_variable", "append", "concatenate", "join_to_string", "f",
    "resolve_xpath_to_element", "sorter", "remove_elements", "remove_element",
    "drop_siblings", "set_attribute", "pop_attribute", "pop_attributes",
    "clear_attributes", "rename_attributes", "prefix_attributes",
    "set_localname", "set_text", "strip_namespace", "cleanup_namespaces",
    "merge", "add_html_classes", "insert_fontawesome_icon",
    "init_elementmaker", "has_attributes", "has_children", "has_text",
    "has_tail", "has_matching_text", "text_equals", "debug_dump_document",
    "debug_message", "debug_symbols", "extract_text_handler", "abort_rule",
    "abort_transformation",
]


# ---------------------------------------------------------------------------
# getters / context ops (L1-L10)
# ---------------------------------------------------------------------------


def get_attribute(name):
    """L1: element's attribute value -> previous_result."""

    def handler(element):
        return element.attrs.get(name)

    return handler


def get_localname(element):
    """L2: element tag local name."""
    return element.localname


def get_text(element):
    """element.text (convenience, present in reference lib [R:M])."""
    return element.text


def get_variable(name):
    """L3: context value -> previous_result."""

    def handler(context):
        return getattr(context, name)

    return handler


def put_variable(name, value=Ref("previous_result")):
    """L4: store a value into the context ("grab")."""

    def handler(transformation, context, previous_result, element=None):
        run = _run_of(transformation, context, previous_result, element)
        setattr(context, name, resolve(value, run))
        return previous_result

    def _fast(run):
        setattr(run.context, name, resolve(value, run))
        return run.previous_result

    handler._fast_run = _fast
    return handler


def append(name, symbol=Ref("previous_result"), copy_element=False):
    """L5: append a value to a context list accumulator."""

    def handler(transformation, context, previous_result, element=None):
        run = _run_of(transformation, context, previous_result, element)
        val = resolve(symbol, run)
        if copy_element and isinstance(val, Node):
            val = val.deepcopy()
        bucket = getattr(context, name, None)
        if bucket is None:
            bucket = []
            setattr(context, name, bucket)
        bucket.append(val)
        return val

    def _fast(run):
        val = resolve(symbol, run)
        if copy_element and isinstance(val, Node):
            val = val.deepcopy()
        context = run.context
        bucket = getattr(context, name, None)
        if bucket is None:
            bucket = []
            setattr(context, name, bucket)
        bucket.append(val)
        return val

    handler._fast_run = _fast
    return handler


def concatenate(*parts):
    """L6: string-concatenate literals / Refs."""

    def handler(transformation, context, previous_result, element=None):
        run = _run_of(transformation, context, previous_result, element)
        return "".join(str(resolve(p, run)) for p in parts)

    return handler


def join_to_string(separator, object=Ref("previous_result")):
    """L7: ``separator.join(iterable)`` — the text-assembly primitive."""

    def handler(transformation, context, previous_result, element=None):
        run = _run_of(transformation, context, previous_result, element)
        return separator.join(resolve(object, run))

    return handler


def f(callable_, *args, **kwargs):
    """L8: deferred call with Refs resolved at execution time."""

    def handler(transformation, context, previous_result, element=None):
        run = _run_of(transformation, context, previous_result, element)
        a = [resolve(x, run) for x in args]
        kw = {k: resolve(v, run) for k, v in kwargs.items()}
        return callable_(*a, **kw)

    return handler


def resolve_xpath_to_element(*names):
    """L9: replace context vars holding XPath strings with their element."""

    def handler(context, root, nsmap):
        for name in names:
            expr = getattr(context, name, None)
            if not isinstance(expr, str):
                continue
            nodes = parse_xpath(expr).evaluate(root, nsmap)
            setattr(context, name, nodes[0] if nodes else None)

    return handler


def sorter(name="previous_result", key=None):
    """L10: sort an iterable held in the run namespace."""

    def handler(transformation, context, previous_result, element=None):
        run = _run_of(transformation, context, previous_result, element)
        obj = Ref(name).resolve(run)
        return sorted(obj, key=key)

    return handler


# ---------------------------------------------------------------------------
# mutators (L11-L26)
# ---------------------------------------------------------------------------


def remove_elements(
    *references,
    keep_children=False,
    preserve_text=False,
    preserve_tail=False,
    clear_ref=True,
):
    """L11: detach all elements accumulated in the named context list(s).

    The canonical drop-boilerplate primitive: rules ``append`` unwanted
    elements during traversal, then a simple step sweeps them out.
    """

    def handler(context):
        for ref in references:
            bucket = getattr(context, ref, None) or []
            for el in bucket:
                if isinstance(el, Node) and el.parent is not None:
                    el.detach(
                        keep_children=keep_children,
                        preserve_text=preserve_text,
                        preserve_tail=preserve_tail,
                    )
            if clear_ref:
                setattr(context, ref, [])

    handler._fast_run = lambda run: handler(run.context)
    return handler


def remove_element(element, keep_children=False, preserve_text=False,
                   preserve_tail=False):
    """Immediate single-element removal (element handler form)."""
    element.detach(
        keep_children=keep_children,
        preserve_text=preserve_text,
        preserve_tail=preserve_tail,
    )


def drop_siblings(side):
    """L12: delete all siblings on one side of the matched element."""
    if side not in ("left", "right"):
        raise ValueError("side must be 'left' or 'right'")

    def handler(element):
        parent = element.parent
        if parent is None:
            return
        idx = parent.children.index(element)
        doomed = parent.children[:idx] if side == "left" else parent.children[idx + 1:]
        for sib in list(doomed):
            sib.detach()

    return handler


def set_attribute(name, value):
    """L13: set an attribute (Refs resolved)."""

    def handler(transformation, context, previous_result, element):
        run = _run_of(transformation, context, previous_result, element)
        element.attrs[resolve(name, run)] = str(resolve(value, run))
        return element

    return handler


def pop_attribute(name):
    """L14: remove an attribute, return its value."""

    def handler(element):
        return element.attrs.pop(name, None)

    return handler


def pop_attributes(*names, ignore_missing=False):
    """L15: pop several attributes -> dict."""

    def handler(element):
        out = {}
        for n in names:
            if n in element.attrs:
                out[n] = element.attrs.pop(n)
            elif not ignore_missing:
                raise KeyError(n)
        return out

    return handler


def clear_attributes(element):
    """L16: drop all attributes."""
    element.attrs.clear()
    return element


def rename_attributes(translation_map):
    """L17: rename attributes old -> new."""

    def handler(element):
        for old, new in translation_map.items():
            if old in element.attrs:
                element.attrs[new] = element.attrs.pop(old)
        return element

    return handler


def prefix_attributes(prefix, *names):
    """L18: rename attributes to ``prefix + name``."""
    return rename_attributes({n: prefix + n for n in names})


def set_localname(name):
    """L19: rename the element's tag, keeping its namespace."""

    def handler(element):
        ns = element.namespace
        element.tag = ("{%s}%s" % (ns, name)) if ns else name
        return element

    return handler


def set_text(text=Ref("previous_result")):
    """L20: set element text."""

    def handler(transformation, context, previous_result, element):
        run = _run_of(transformation, context, previous_result, element)
        element.text = resolve(text, run)
        return element

    return handler


def strip_namespace(element):
    """L21: drop the namespace from the element's tag."""
    element.tag = element.localname
    return element


def cleanup_namespaces(root):
    """L22: normalize namespace declarations (no-op until serialization —
    our serializer regenerates prefix declarations deterministically)."""
    return root


def merge(source=Ref("previous_result"), destination=Ref("root")):
    """L23 [R:L]: merge a source tree into the destination by structural
    alignment: walk source children; when the destination has a child
    with the same tag, recurse; otherwise deep-copy the child over."""

    def _merge_into(dst: Node, src: Node):
        for s_child in src.children:
            match = next(
                (d for d in dst.children if d.is_element() and d.tag == s_child.tag),
                None,
            )
            if match is None:
                dst.append(s_child.deepcopy())
            else:
                _merge_into(match, s_child)

    def handler(transformation, context, previous_result, element=None):
        run = _run_of(transformation, context, previous_result, element)
        src = resolve(source, run)
        dst = resolve(destination, run)
        _merge_into(dst, src)
        return dst

    return handler


def add_html_classes(*classes):
    """L24: append CSS classes to the class attribute."""

    def handler(element):
        current = (element.attrs.get("class") or "").split()
        for c in classes:
            if c not in current:
                current.append(c)
        element.attrs["class"] = " ".join(current)
        return element

    return handler


def insert_fontawesome_icon(name, position="after", spin=False):
    """L25: insert an ``<i class="fa fa-NAME">`` node near the element."""

    def handler(element):
        cls = f"fa fa-{name}" + (" fa-spin" if spin else "")
        icon = new_element("i", {"class": cls})
        if position == "first-child":
            element.insert(0, icon)
        elif position == "last-child":
            element.append(icon)
        elif position == "after":
            parent = element.parent
            parent.insert(parent.children.index(element) + 1, icon)
        elif position == "before":
            parent = element.parent
            parent.insert(parent.children.index(element), icon)
        else:
            raise ValueError(f"unknown position {position!r}")
        return icon

    return handler


def init_elementmaker(name="e", **_kwargs):
    """L26: put the element factory into the context."""

    def handler(context):
        setattr(context, name, new_element)

    return handler


# ---------------------------------------------------------------------------
# element tests (L27-L32) — usable as conditions or mid-chain guards
# ---------------------------------------------------------------------------


def has_attributes(element):
    """L27."""
    return len(element.attrs) > 0


def has_children(element):
    """L28."""
    return any(c.is_element() for c in element.children)


def has_text(element):
    """L29."""
    return bool(element.text)


def has_tail(element):
    """L30."""
    return bool(element.tail)


def has_matching_text(pattern):
    """L31: regex search on element.text (compiled once)."""
    rx = re.compile(pattern)

    def condition(element):
        return bool(element.text) and rx.search(element.text) is not None

    return condition


def text_equals(text):
    """L32."""

    def condition(element):
        return (element.text or "") == text

    return condition


# ---------------------------------------------------------------------------
# debug / flow helpers (L33-L35 + conveniences)
# ---------------------------------------------------------------------------


def debug_dump_document(name="tree"):
    """L33: log the serialized document."""

    def handler(transformation, context, previous_result, root):
        run = _run_of(transformation, context, previous_result, None)
        obj = Ref(name).resolve(run) if name != "tree" else root
        logger.debug(serialize(obj))

    return handler


def debug_message(msg):
    """L34."""

    def handler():
        logger.debug(msg)

    return handler


def debug_symbols(*names):
    """L35."""

    def handler(transformation, context, previous_result, element=None):
        run = _run_of(transformation, context, previous_result, element)
        for n in names:
            logger.debug("%s = %r", n, Ref(n).resolve(run))

    return handler


def extract_text_handler(source=Ref("root")):
    """Frozen-policy text extraction as a handler (engine addition)."""

    def handler(transformation, context, previous_result, element=None):
        run = _run_of(transformation, context, previous_result, element)
        return extract_text(resolve(source, run))

    handler._fast_run = lambda run: extract_text(resolve(source, run))
    return handler


def abort_rule():
    raise AbortRule


def abort_transformation():
    raise AbortTransformation


# ---------------------------------------------------------------------------
# internal: a lightweight namespace adapter so handlers can resolve Refs
# without having the real _Run object injected.
# ---------------------------------------------------------------------------


class _RunView:
    __slots__ = ("transformation", "config", "context", "previous_result",
                 "element", "root", "tree", "nsmap")

    def __init__(self, transformation, context, previous_result, element):
        self.transformation = transformation
        self.config = transformation.config
        self.context = context
        self.previous_result = previous_result
        self.element = element
        self.root = getattr(context, "root", None)
        self.tree = getattr(context, "tree", None)
        self.nsmap = {}


def _run_of(transformation, context, previous_result, element):
    return _RunView(transformation, context, previous_result, element)
