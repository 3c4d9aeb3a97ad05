"""Rule engine core tests (SURVEY C1-C13, FIXTURES section 2)."""

import pytest

from rayxt import (
    AbortRule,
    AbortTransformation,
    Any,
    HasNamespace,
    If,
    MatchesAttributes,
    MatchesCSS,
    MatchesXPath,
    Not,
    OneOf,
    Ref,
    Rule,
    TRAVERSE_BOTTOM_TO_TOP,
    TRAVERSE_DEPTH_FIRST,
    TRAVERSE_LEFT_TO_RIGHT,
    TRAVERSE_RIGHT_TO_LEFT,
    TRAVERSE_ROOT_ONLY,
    TRAVERSE_TOP_TO_BOTTOM,
    Transformation,
    parse_html,
    parse_xml,
)
from rayxt.lib import append, get_localname, put_variable

DOC = (
    b"<html><body>"
    b'<div id="a" class="x">A</div>'
    b'<div id="b">B<span class="x">S</span></div>'
    b"<p>P</p>"
    b"</body></html>"
)


def collect_ids(*conditions, **config):
    """Run a one-rule program collecting matched element identities."""
    t = Transformation(
        Rule(list(conditions), append("hits", Ref("element"))),
        result_object="context.hits",
        copy=False,
        **config,
    )
    got = t(parse_html(DOC))
    return [(n.tag, n.attrs.get("id") or n.attrs.get("class") or n.text) for n in (got or [])]


# -- condition matrix (D1-D4, E1-E6) ---------------------------------------

def test_match_all_star():
    assert [t for t, _ in collect_ids("*")] == ["html", "body", "div", "div", "span", "p"]


def test_tag_condition():
    assert collect_ids("div") == [("div", "a"), ("div", "b")]


def test_attr_dict_condition():
    assert collect_ids({"id": "a"}) == [("div", "a")]
    assert collect_ids({"class": None}) == [("div", "a"), ("span", "x")]
    assert collect_ids({"id": lambda v: v in ("a", "b")}) == [("div", "a"), ("div", "b")]
    # callable key: any attribute name satisfying the predicate
    assert collect_ids({(lambda k: k == "class"): "x"}) == [("div", "a"), ("span", "x")]


def test_xpath_string_condition():
    assert collect_ids('//div[@id="b"]/span') == [("span", "x")]
    # relative paths resolve from the root element (html), like lxml's tree.xpath
    assert collect_ids("body/div") == [("div", "a"), ("div", "b")]
    assert collect_ids("/html/body/div") == [("div", "a"), ("div", "b")]


def test_explicit_matchers():
    assert collect_ids(MatchesXPath("//p")) == [("p", "P")]
    assert collect_ids(MatchesCSS("div.x")) == [("div", "a")]
    assert collect_ids(MatchesAttributes({"id": "b"})) == [("div", "b")]


def test_combinators():
    assert collect_ids(Any("p", "span")) == [("span", "x"), ("p", "P")]
    got = collect_ids(Not("div", "span", "p"))
    assert [t for t, _ in got] == ["html", "body"]
    # OneOf: exactly one of the two conditions (div.x satisfies both -> out)
    assert collect_ids(OneOf("div", {"class": "x"})) == [("div", "b"), ("span", "x")]


def test_callable_condition_injection():
    def cond(element):
        return element.localname == "span"

    assert collect_ids(cond) == [("span", "x")]


def test_if_condition_over_context():
    t = Transformation(
        Rule(["div", If(Ref("go"), bool)], append("hits", Ref("element"))),
        result_object="context.hits",
        copy=False,
    )
    assert t(parse_html(DOC), go=False) is None
    assert len(t(parse_html(DOC), go=True)) == 2


def test_has_namespace():
    root, nsmap = parse_xml(b'<m:r xmlns:m="urn:m"><m:k>x</m:k><plain>y</plain></m:r>')
    t = Transformation(
        Rule(HasNamespace("urn:m"), append("hits", Ref("element"))),
        result_object="context.hits",
        copy=False,
    )
    assert [n.localname for n in t(root, nsmap=nsmap)] == ["r", "k"]


def test_prefixed_tag_condition_uses_nsmap():
    root, nsmap = parse_xml(b'<m:r xmlns:m="urn:m"><m:k>x</m:k></m:r>')
    t = Transformation(
        Rule("m:k", append("hits", Ref("element"))),
        result_object="context.hits",
        copy=False,
    )
    assert [n.text for n in t(root, nsmap=nsmap)] == ["x"]


# -- execution semantics (C1-C12) ------------------------------------------

def test_handler_chaining_previous_result():
    log = []

    def first():
        return 1

    def second(previous_result):
        log.append(previous_result)
        return previous_result + 1

    t = Transformation([first, second, second], result_object="previous_result")
    assert t(parse_html(DOC)) == 3
    assert log == [1, 2]


def test_simple_step_runs_once_per_document():
    calls = []
    t = Transformation(lambda: calls.append(1), result_object=None)
    t(parse_html(DOC))
    assert calls == [1]


def test_ref_late_binding_and_context_kwargs():
    t = Transformation(
        put_variable("out", Ref("seed")),
        result_object="context.out",
    )
    assert t(parse_html(DOC), seed="v1") == "v1"
    assert t(parse_html(DOC), seed="v2") == "v2"  # reusable instance


def test_config_context_defaults_and_override():
    t = Transformation(
        put_variable("out", Ref("k")),
        context={"k": "default"},
        result_object="context.out",
    )
    assert t(parse_html(DOC)) == "default"
    assert t(parse_html(DOC), k="override") == "override"


def test_result_object_variants():
    t = Transformation(result_object="context.root", copy=False)
    root = parse_html(DOC)
    assert t(root) is root
    t2 = Transformation(result_object=None)
    assert t2(parse_html(DOC)) is None
    t3 = Transformation(lambda: 42, result_object="previous_result")
    assert t3(parse_html(DOC)) == 42


def test_copy_semantics():
    root = parse_html(DOC)
    t = Transformation(
        Rule("div", lambda element: element.detach()),
        result_object="context.root",
        copy=True,
    )
    out = t(root)
    assert out is not root
    assert len([n for n in root.iter() if n.tag == "div"]) == 2  # source untouched
    assert len([n for n in out.iter() if n.tag == "div"]) == 0


def test_abort_rule_stops_current_rule_only():
    seen = []

    def grab(element):
        seen.append(element.tag)
        if len(seen) == 2:
            raise AbortRule

    t = Transformation(
        Rule("*", grab),
        put_variable("done", "yes"),
        result_object="context.done",
    )
    assert t(parse_html(DOC)) == "yes"
    assert seen == ["html", "body"]


def test_abort_transformation_stops_everything():
    def grab(element):
        raise AbortTransformation

    t = Transformation(
        Rule("div", grab),
        put_variable("done", "yes"),
        result_object="context.done",
    )
    assert t(parse_html(DOC)) is None  # second step never ran


def test_common_rule_conditions():
    t = Transformation(
        Rule("*", append("hits", Ref("element"))),
        common_rule_conditions={"id": None},
        result_object="context.hits",
        copy=False,
    )
    assert [n.attrs["id"] for n in t(parse_html(DOC))] == ["a", "b"]


def test_sub_transformation_as_step():
    inner = Transformation(
        Rule("p", append("hits", Ref("element"))),
        result_object="context.hits",
        copy=False,
    )
    outer = Transformation(
        inner,
        put_variable("n", Ref("previous_result")),
        result_object="context.n",
        copy=False,
    )
    out = outer(parse_html(DOC))
    assert [n.text for n in out] == ["P"]


# -- traversal orders (C10) -------------------------------------------------

def order_of(traversal):
    t = Transformation(
        Rule("*", lambda element, context: context.order.append(element.tag),
             traversal_order=traversal),
        context={"order": None},
        result_object="context.order",
        copy=False,
    )
    return t(parse_html(DOC), order=[])


def test_traversal_default_preorder():
    assert order_of(None) == ["html", "body", "div", "div", "span", "p"]


def test_traversal_right_to_left():
    rtl = TRAVERSE_DEPTH_FIRST | TRAVERSE_RIGHT_TO_LEFT | TRAVERSE_TOP_TO_BOTTOM
    assert order_of(rtl) == ["html", "body", "p", "div", "span", "div"]


def test_traversal_bottom_up():
    bu = TRAVERSE_DEPTH_FIRST | TRAVERSE_LEFT_TO_RIGHT | TRAVERSE_BOTTOM_TO_TOP
    assert order_of(bu) == ["div", "span", "div", "p", "body", "html"]


def test_traversal_root_only():
    assert order_of(TRAVERSE_ROOT_ONLY) == ["html"]


def test_unsupported_traversal_raises():
    with pytest.raises(NotImplementedError):
        order_of(TRAVERSE_LEFT_TO_RIGHT)  # breadth-first not implemented


# -- mutation during traversal (SURVEY 7.5 adversarial cases) ---------------

def test_rule_removing_its_match_parent():
    # removing the parent of the current match must not crash and must
    # skip the detached subtree for the rest of the traversal
    def nuke_parent(element):
        if element.parent is not None and element.parent.tag != "html":
            element.parent.detach()

    t = Transformation(
        Rule("span", nuke_parent),
        result_object="context.root",
        copy=False,
    )
    out = t(parse_html(DOC))
    assert len([n for n in out.iter() if n.tag == "div"]) == 1  # div#b removed


def test_rule_removing_next_sibling():
    def nuke_next(element, context):
        context.seen.append(element.attrs.get("id") or element.tag)
        parent = element.parent
        idx = parent.children.index(element)
        if idx + 1 < len(parent.children):
            parent.children[idx + 1].detach()

    t = Transformation(
        Rule("div", nuke_next),
        context={"seen": None},
        result_object="context.seen",
        copy=False,
    )
    # first div removes second div; traversal must then skip it
    assert t(parse_html(DOC), seen=[]) == ["a"]


def test_rule_hits_collected():
    t = Transformation(
        Rule("div", lambda: None, name="divs"),
        Rule("nothing", lambda: None, name="none"),
        result_object=None,
    )
    _, hits = t.call_with_stats(parse_html(DOC))
    assert hits == {"divs": 2}


def test_fused_rules_match_unfused():
    from rayxt.lib import append, remove_elements
    from rayxt.dom import extract_text

    def build(fused):
        return Transformation(
            Rule("i", append("trash", Ref("element")), name="r1"),
            Rule({"class": "x"}, append("trash", Ref("element")), name="r2"),
            remove_elements("trash"),
            copy=False,
            fuse_rules=fused,
            result_object="context.root",
        )

    doc = (b"<html><body><i>a</i><b class='x'>b</b><i class='x'>both</i>"
           b"<p>keep</p></body></html>")
    out_a = extract_text(build(False)(parse_html(doc)))
    out_b = extract_text(build(True)(parse_html(doc)))
    assert out_a == out_b == "keep"
    _, hits_a = build(False).call_with_stats(parse_html(doc))
    _, hits_b = build(True).call_with_stats(parse_html(doc))
    assert hits_a == hits_b == {"r1": 2, "r2": 2}


def test_fused_abort_rule_stops_only_that_rule():
    from rayxt.lib import append

    def aborting(element, context):
        context.seen.append(element.tag)
        raise AbortRule

    t = Transformation(
        Rule("i", aborting, name="r1"),
        Rule("b", lambda element, context: context.bs.append(element.text), name="r2"),
        context={"seen": None, "bs": None},
        copy=False,
        fuse_rules=True,
        result_object="context.bs",
    )
    doc = b"<html><body><i>1</i><b>x</b><i>2</i><b>y</b></body></html>"
    out = t(parse_html(doc), seen=[], bs=[])
    assert out == ["x", "y"]  # r2 unaffected by r1's abort


# -- round-4 axis / pseudo-class conformance program -----------------------

AXES_DOC = (
    b"<html><body>"
    b"<article><h1>Title</h1><p>intro</p><aside>ad</aside>"
    b"<p>body1</p><p>body2</p></article>"
    b"<footer><p>legal</p></footer>"
    b"</body></html>"
)

# golden: produced once by hand-walking the document; frozen here
AXES_GOLDEN = {
    "after_h1": ["intro", "ad", "body1", "body2"],
    "before_aside": ["intro"],
    "p_in_article": ["intro", "body1", "body2"],
    "p_not_first_child": ["intro", "body1", "body2"],
    "first_p": ["legal"],
}


def test_axis_pseudo_conformance_program():
    """A multi-rule program whose conditions exercise the new
    following-sibling:: / preceding-sibling:: / ancestor:: axes and the
    CSS :not()/:first-child pseudo-classes, asserted against a frozen
    golden (VERDICT r3 item 4)."""
    t = Transformation(
        Rule(MatchesXPath("//h1/following-sibling::*"),
             append("after_h1", Ref("element"))),
        Rule(MatchesXPath("//aside/preceding-sibling::p"),
             append("before_aside", Ref("element"))),
        Rule(MatchesXPath("/html/body/article/descendant::p"),
             append("p_in_article", Ref("element"))),
        Rule([MatchesXPath("//article/descendant::*"),
              MatchesCSS("p:not(:first-child)")],
             append("p_not_first_child", Ref("element"))),
        Rule(MatchesCSS("p:first-child"),
             append("first_p", Ref("element"))),
        result_object="context",
        copy=False,
    )
    ctx = t(parse_html(AXES_DOC))
    got = {k: [n.text for n in getattr(ctx, k)] for k in AXES_GOLDEN}
    assert got == AXES_GOLDEN
