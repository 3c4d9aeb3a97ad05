"""The flagship main-content extraction program (boilerplate strip).

FROZEN SEMANTICS (byte-identity target — the vendored oracle in
``tests/oracle`` re-states these naively and golden outputs are
generated from it):

1. mark for removal every element whose tag is one of the boilerplate
   tags (script, style, noscript, template, nav, footer, header, aside,
   form, iframe, svg, select, button);
2. mark every element carrying a boilerplate class word (ads, ad,
   advert, advertisement, banner, sidebar, menu, nav, navbar, footer,
   header, breadcrumb, comment, comments, social, share, related,
   promo) or ``id`` equal to one of those words;
3. sweep all marked elements out (whole subtrees, tails preserved in
   the parent flow — i.e. ``detach()`` default);
4. extracted text = frozen policy of :func:`rayxt.dom.extract_text`
   over the pruned tree.

Mark-then-sweep (append to ``trash`` + ``remove_elements``) mirrors the
reference's canonical drop-boilerplate idiom (SURVEY.md L11) and avoids
mutation-during-traversal hazards.
"""

from __future__ import annotations

from ..lib import append, extract_text_handler, put_variable, remove_elements
from ..matchers import Any
from ..rules import Ref, Rule, Transformation

BOILERPLATE_TAGS = (
    "script", "style", "noscript", "template", "nav", "footer", "header",
    "aside", "form", "iframe", "svg", "select", "button",
)

BOILERPLATE_CLASS_WORDS = frozenset(
    (
        "ads ad advert advertisement banner sidebar menu nav navbar footer "
        "header breadcrumb comment comments social share related promo"
    ).split()
)


def _has_boilerplate_class(value: str) -> bool:
    return any(w in BOILERPLATE_CLASS_WORDS for w in value.split())


def _is_boilerplate_id(value: str) -> bool:
    return value in BOILERPLATE_CLASS_WORDS


def main_content_program() -> Transformation:
    """Compile the flagship program (one instance per actor)."""
    return Transformation(
        Rule(Any(*BOILERPLATE_TAGS), append("trash", Ref("element")),
             name="drop_tag"),
        Rule({"class": _has_boilerplate_class}, append("trash", Ref("element")),
             name="drop_class"),
        Rule({"id": _is_boilerplate_id}, append("trash", Ref("element")),
             name="drop_id"),
        remove_elements("trash"),
        [extract_text_handler(), put_variable("text")],
        copy=False,           # the kernel parses a fresh tree per row
        fuse_rules=True,      # pure mark-for-removal rules: one tree pass
        result_object="context",
        name="main_content",
    )
