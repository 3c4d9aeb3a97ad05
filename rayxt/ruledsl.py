"""Declarative (JSON-serializable) rule programs.

The rule engine's native surface is Python objects (``Transformation``
/ ``Rule`` / handler factories — SURVEY.md P17), which cannot cross a
process boundary except by code.  This module adds a data-only program
format: a JSON-compatible dict that :func:`load_program` compiles into
the same ``Transformation`` the Python surface builds, so a rule set
can live in a config file, ship to every actor as a tiny broadcast
value, and be authored without writing Python.

Grammar (all keys optional unless stated):

```
program := {
  "name": str,
  "copy": bool,
  "result_object": str | null,
  "traversal_order": TRAVERSAL,
  "context": {str: VALUE},
  "common_rule_conditions": [CONDITION] | CONDITION,
  "fuse_rules": bool,
  "rules": [RULE | STEP]            # required
}
RULE := {"conditions": [CONDITION] | CONDITION,   # required
         "handlers": [HANDLER] | HANDLER,         # required
         "name": str, "traversal_order": TRAVERSAL}
STEP := {"step": [HANDLER] | HANDLER}             # once per document
CONDITION :=
    "tagname" | "*" | "xpath-or-css-looking string"   # engine dispatch
  | {"tag": str} | {"xpath": str} | {"css": str}
  | {"attributes": {name: str | null | {"re": pattern}}}
  | {"any": [CONDITION]} | {"one_of": [CONDITION]} | {"not": CONDITION}
  | {"has_namespace": str}
  | {"if": {"x": VALUE, "op": OP, "y": VALUE}}    # y optional (unary)
HANDLER :=
    "lib_name"                                    # no-arg lib entry
  | {"fn": "lib_name", "args": [VALUE], "kwargs": {str: VALUE}}
  | {"import": "pkg.mod:attr", "args": ..., "kwargs": ...}  # extension
VALUE := JSON scalar | [VALUE] | {str: VALUE} | {"$ref": "dotted.path"}
TRAVERSAL := "preorder" | "preorder_rtl" | "bottom_up" | "root_only"
OP := "eq" | "ne" | "gt" | "ge" | "lt" | "le" | "contains" | "truth"
```

``{"$ref": "previous_result"}`` compiles to the late-bound
:class:`rayxt.rules.Ref` — the DSL spelling of the reference's ``Ref``.
``{"import": ...}`` is the user-extension escape hatch (P17): it
imports an attribute from an importable module — only load programs
from trusted sources, exactly like loading a Python rule file.
"""

from __future__ import annotations

import importlib
import json
import operator as _operator
import re as _re

from . import lib as _lib
from .matchers import (Any, HasNamespace, If, MatchesAttributes, MatchesCSS,
                       MatchesXPath, Not, OneOf)
from .rules import (TRAVERSE_BOTTOM_TO_TOP, TRAVERSE_DEPTH_FIRST,
                    TRAVERSE_LEFT_TO_RIGHT, TRAVERSE_RIGHT_TO_LEFT,
                    TRAVERSE_ROOT_ONLY, TRAVERSE_TOP_TO_BOTTOM, Ref, Rule,
                    Transformation)

__all__ = ["load_program", "load_program_file"]

_TRAVERSALS = {
    "preorder": TRAVERSE_DEPTH_FIRST | TRAVERSE_LEFT_TO_RIGHT
    | TRAVERSE_TOP_TO_BOTTOM,
    "preorder_rtl": TRAVERSE_DEPTH_FIRST | TRAVERSE_RIGHT_TO_LEFT
    | TRAVERSE_TOP_TO_BOTTOM,
    "bottom_up": TRAVERSE_DEPTH_FIRST | TRAVERSE_LEFT_TO_RIGHT
    | TRAVERSE_BOTTOM_TO_TOP,
    "root_only": TRAVERSE_ROOT_ONLY,
}

_OPS = {
    "eq": _operator.eq, "ne": _operator.ne, "gt": _operator.gt,
    "ge": _operator.ge, "lt": _operator.lt, "le": _operator.le,
    "contains": _operator.contains, "truth": _operator.truth,
}

# lib entries that ARE handlers (dependency-injected directly); every
# other lib name is a factory called with the spec's args/kwargs
_DIRECT = frozenset({
    "get_localname", "get_text", "clear_attributes", "strip_namespace",
    "cleanup_namespaces", "has_attributes", "has_children", "has_text",
    "has_tail",
})


def _value(v):
    """JSON value -> handler argument; ``{"$ref": path}`` becomes Ref."""
    if isinstance(v, dict):
        if set(v) == {"$ref"}:
            return Ref(v["$ref"])
        return {k: _value(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_value(x) for x in v]
    return v


def _attr_value(v):
    if v is None or isinstance(v, str):
        return v
    if isinstance(v, dict) and set(v) == {"re"}:
        return _re.compile(v["re"]).search  # truthy on match (D4 callable)
    raise ValueError(f"unsupported attribute constraint {v!r}")


def _condition(c):
    if isinstance(c, str):
        return c  # engine dispatch: '*', tag, or xpath/css-looking
    if not isinstance(c, dict) or len(c) != 1:
        raise ValueError(f"unsupported condition {c!r}")
    (key, val), = c.items()
    if key == "tag":
        return str(val)
    if key == "xpath":
        return MatchesXPath(val)
    if key == "css":
        return MatchesCSS(val)
    if key == "attributes":
        return MatchesAttributes({k: _attr_value(v) for k, v in val.items()})
    if key == "any":
        return Any(*[_condition(x) for x in val])
    if key == "one_of":
        return OneOf(*[_condition(x) for x in val])
    if key == "not":
        return Not(_condition(val))
    if key == "has_namespace":
        return HasNamespace(val)
    if key == "if":
        if not isinstance(val, dict) or "x" not in val:
            raise ValueError(f"'if' condition needs an 'x' value: {val!r}")
        op = val.get("op", "eq")
        if op not in _OPS:
            raise ValueError(f"unknown op {op!r}; known: {sorted(_OPS)}")
        args = [_value(val["x"]), _OPS[op]]
        if "y" in val:
            args.append(_value(val["y"]))
        return If(*args)
    raise ValueError(f"unsupported condition key {key!r}")


def _import_attr(path: str):
    mod, _, attr = path.partition(":")
    if not attr:
        mod, _, attr = path.rpartition(".")
    return getattr(importlib.import_module(mod), attr)


def _handler(h):
    if isinstance(h, str):
        h = {"fn": h}
    if not isinstance(h, dict):
        raise ValueError(f"unsupported handler {h!r}")
    if "import" in h:
        obj = _import_attr(h["import"])
        if "args" in h or "kwargs" in h:
            return obj(*[_value(a) for a in h.get("args", [])],
                       **{k: _value(v) for k, v in h.get("kwargs", {}).items()})
        return obj
    if "fn" not in h:
        raise ValueError(f"handler needs 'fn' or 'import': {h!r}")
    name = h["fn"]
    if name not in _lib.__all__:
        raise ValueError(f"unknown handler {name!r}; known: lib entries "
                         f"or {{'import': 'pkg.mod:attr'}}")
    obj = getattr(_lib, name)
    if name in _DIRECT:
        if "args" in h or "kwargs" in h:
            raise ValueError(f"{name!r} takes no spec arguments")
        return obj
    return obj(*[_value(a) for a in h.get("args", [])],
               **{k: _value(v) for k, v in h.get("kwargs", {}).items()})


def _handlers(spec):
    if isinstance(spec, (list, tuple)):
        return [_handler(h) for h in spec]
    return [_handler(spec)]


def _traversal(name):
    if name is None:
        return None
    try:
        return _TRAVERSALS[name]
    except KeyError:
        raise ValueError(
            f"unknown traversal {name!r}; known: {sorted(_TRAVERSALS)}"
        ) from None


def load_program(spec) -> Transformation:
    """Compile a declarative program spec (dict or JSON string) into a
    reusable :class:`Transformation` — the same object the Python
    surface builds, so everything downstream (pipeline actors, CLI,
    conformance goldens) is format-agnostic."""
    if isinstance(spec, (str, bytes)):
        spec = json.loads(spec)
    if not isinstance(spec, dict) or "rules" not in spec:
        raise ValueError("program spec must be a dict with a 'rules' list")
    steps = []
    for r in spec["rules"]:
        if not isinstance(r, dict):
            raise ValueError(f"rule must be a dict: {r!r}")
        if "step" in r:
            steps.append(_handlers(r["step"]))
            continue
        if "conditions" not in r or "handlers" not in r:
            raise ValueError(
                f"rule needs 'conditions' and 'handlers' (or 'step'): {r!r}")
        conds = r["conditions"]
        conds = [_condition(c) for c in
                 (conds if isinstance(conds, list) else [conds])]
        steps.append(Rule(conds, _handlers(r["handlers"]),
                          name=r.get("name"),
                          traversal_order=_traversal(r.get("traversal_order"))))
    config = {}
    for key in ("name", "copy", "result_object", "fuse_rules"):
        if key in spec:
            config[key] = spec[key]
    if "traversal_order" in spec:
        config["traversal_order"] = _traversal(spec["traversal_order"])
    if "context" in spec:
        config["context"] = {k: _value(v) for k, v in spec["context"].items()}
    if "common_rule_conditions" in spec:
        crc = spec["common_rule_conditions"]
        config["common_rule_conditions"] = [
            _condition(c) for c in (crc if isinstance(crc, list) else [crc])
        ]
    return Transformation(*steps, **config)


def load_program_file(path: str) -> Transformation:
    with open(path, "r", encoding="utf-8") as fh:
        return load_program(json.load(fh))
