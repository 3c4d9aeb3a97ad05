"""rayxt — a Ray-Data-native rule-based XML/HTML transformation engine.

A from-scratch reimplementation of the query/data-processing
capabilities of funkyfuture/inxs (rule-based single-document
transformations: condition matchers over tag names, XPath/CSS selectors
and attribute predicates, chained dependency-injected handlers),
re-expressed as a distributed main-content extraction pipeline on
``ray.data.Dataset`` + ``map_batches`` over zero-copy Arrow batches.

Layers:

* :mod:`rayxt.dom` — stdlib DOM (frozen tag-soup + text policies);
* :mod:`rayxt.xpath` — XPath/CSS selector subset;
* :mod:`rayxt.matchers` / :mod:`rayxt.rules` / :mod:`rayxt.lib` — the
  inxs-equivalent rule engine (Transformation/Rule/Ref + handler lib);
* :mod:`rayxt.kernel` — the per-row extraction kernel;
* :mod:`rayxt.pipeline` — Ray Data pipeline operators (read, two-tier
  extract, url-hash partitioning, dedup, stats, partitioned sink);
* :mod:`rayxt.manifest` — lineage records + checkpoint/resume manifest;
* :mod:`rayxt.text`, :mod:`rayxt.dedup`, :mod:`rayxt.ann`,
  :mod:`rayxt.multimodal` — large-scale training-data operators;
* :mod:`rayxt.programs` — rule programs (main_content, wikipedia_table,
  mods_to_tei).
"""

from .dom import Node, extract_text, new_element, parse_html, parse_xml, serialize
from .matchers import (
    Any,
    HasNamespace,
    If,
    MatchesAttributes,
    MatchesCSS,
    MatchesXPath,
    Not,
    OneOf,
)
from .rules import (
    AbortRule,
    AbortTransformation,
    Ref,
    Rule,
    Transformation,
    TRAVERSE_BOTTOM_TO_TOP,
    TRAVERSE_DEPTH_FIRST,
    TRAVERSE_LEFT_TO_RIGHT,
    TRAVERSE_RIGHT_TO_LEFT,
    TRAVERSE_ROOT_ONLY,
    TRAVERSE_TOP_TO_BOTTOM,
)

__version__ = "0.1.0"


def _register_pickle_by_value() -> None:
    """Ship this package's code inside serialized UDFs.

    Ray workers import UDF classes by module name; when the driver ran
    from outside the repo the workers cannot import ``rayxt``.
    Registering the package for cloudpickle by-value serialization makes
    every ``map_batches`` UDF self-contained (the package is ~100 KB of
    source — negligible against actor startup)."""
    try:
        import sys as _sys

        from ray import cloudpickle as _cp

        _cp.register_pickle_by_value(_sys.modules[__name__])
    except Exception:  # pragma: no cover - cloudpickle API drift
        pass


_register_pickle_by_value()

__all__ = [
    "Node", "parse_html", "parse_xml", "extract_text", "serialize",
    "new_element", "Transformation", "Rule", "Ref", "AbortRule",
    "AbortTransformation", "Any", "OneOf", "Not", "HasNamespace", "If",
    "MatchesXPath", "MatchesCSS", "MatchesAttributes",
    "TRAVERSE_DEPTH_FIRST", "TRAVERSE_LEFT_TO_RIGHT",
    "TRAVERSE_RIGHT_TO_LEFT", "TRAVERSE_TOP_TO_BOTTOM",
    "TRAVERSE_BOTTOM_TO_TOP", "TRAVERSE_ROOT_ONLY",
]
