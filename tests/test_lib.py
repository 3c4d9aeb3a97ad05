"""Handler library tests (SURVEY L1-L35)."""

import logging

import pytest

from rayxt import Ref, Rule, Transformation, parse_html, parse_xml, serialize
from rayxt import lib


def run_on(doc, *steps, result="context.out", **config):
    t = Transformation(*steps, result_object=result, copy=False, **config)
    return t(parse_html(doc))


DOC = b'<html><body><div id="a" class="x y">A<span>S</span>tail</div><p>P</p></body></html>'


def test_get_attribute_and_localname():
    out = run_on(
        DOC,
        Rule("div", [lib.get_attribute("id"), lib.put_variable("out")]),
    )
    assert out == "a"
    out = run_on(DOC, Rule("span", [lib.get_localname, lib.put_variable("out")]))
    assert out == "span"


def test_get_put_variable_and_append():
    out = run_on(
        DOC,
        lib.put_variable("x", 1),
        Rule("div", [lib.get_variable("x"), lib.put_variable("out")]),
    )
    assert out == 1
    out = run_on(
        DOC,
        Rule("*", [lib.get_localname, lib.append("out")]),
    )
    assert out == ["html", "body", "div", "span", "p"]


def test_append_copy_element():
    out = run_on(DOC, Rule("span", lib.append("out", Ref("element"), copy_element=True)))
    span = out[0]
    assert span.text == "S" and span.parent is None


def test_concatenate_and_join():
    out = run_on(
        DOC,
        lib.put_variable("who", "world"),
        [lib.concatenate("hello ", Ref("who")), lib.put_variable("out")],
    )
    assert out == "hello world"
    out = run_on(
        DOC,
        lib.put_variable("items", ["a", "b", "c"]),
        [lib.join_to_string("-", Ref("items")), lib.put_variable("out")],
    )
    assert out == "a-b-c"


def test_f_deferred_call():
    out = run_on(
        DOC,
        lib.put_variable("n", 20),
        [lib.f(lambda a, b: a + b, Ref("n"), 22), lib.put_variable("out")],
    )
    assert out == 42


def test_resolve_xpath_to_element():
    out = run_on(
        DOC,
        lib.put_variable("target", "//span"),
        lib.resolve_xpath_to_element("target"),
        Rule("html", [lib.get_variable("target"), lib.put_variable("out")]),
    )
    assert out.tag == "span"


def test_sorter():
    out = run_on(
        DOC,
        lib.put_variable("vals", [3, 1, 2]),
        [lib.sorter("vals"), lib.put_variable("out")],
    )
    assert out == [1, 2, 3]


def test_remove_elements_sweep():
    t = Transformation(
        Rule("span", lib.append("trash", Ref("element"))),
        lib.remove_elements("trash"),
        result_object="context.root",
        copy=False,
    )
    out = t(parse_html(DOC))
    assert [n.tag for n in out.iter() if n.is_element()] == ["html", "body", "div", "p"]


def test_remove_elements_keep_children_preserve_text():
    doc = b"<html><body><div>pre<wrap>inner<span>s</span></wrap>post</div></body></html>"
    t = Transformation(
        Rule("wrap", lib.append("trash", Ref("element"))),
        lib.remove_elements("trash", keep_children=True, preserve_text=True),
        result_object="context.root",
        copy=False,
    )
    out = t(parse_html(doc))
    div = out.children[0].children[0]
    assert div.text == "preinner"
    assert [c.tag for c in div.children] == ["span"]


def test_drop_siblings():
    doc = b"<html><body><i>1</i><b id='k'>2</b><i>3</i><i>4</i></body></html>"
    t = Transformation(
        Rule("b", lib.drop_siblings("right")),
        result_object="context.root",
        copy=False,
    )
    body = t(parse_html(doc)).children[0]
    assert [c.tag for c in body.children] == ["i", "b"]
    t = Transformation(
        Rule("b", lib.drop_siblings("left")),
        result_object="context.root",
        copy=False,
    )
    body = t(parse_html(doc)).children[0]
    assert [c.tag for c in body.children] == ["b", "i", "i"]


def test_attribute_handlers():
    out = run_on(DOC, Rule("div", [lib.set_attribute("k", "v"), ]), result="context.root")
    div = out.children[0].children[0]
    assert div.attrs["k"] == "v"

    out = run_on(DOC, Rule("div", [lib.pop_attribute("id"), lib.put_variable("out")]))
    assert out == "a"

    out = run_on(
        DOC,
        Rule("div", [lib.pop_attributes("id", "class"), lib.put_variable("out")]),
    )
    assert out == {"id": "a", "class": "x y"}

    with pytest.raises(Exception):
        run_on(DOC, Rule("div", lib.pop_attributes("nope")), result="context.root")
    out = run_on(
        DOC,
        Rule("div", [lib.pop_attributes("nope", ignore_missing=True), lib.put_variable("out")]),
    )
    assert out == {}

    out = run_on(DOC, Rule("div", lib.clear_attributes), result="context.root")
    assert out.children[0].children[0].attrs == {}

    out = run_on(DOC, Rule("div", lib.rename_attributes({"id": "data-id"})), result="context.root")
    assert out.children[0].children[0].attrs["data-id"] == "a"

    out = run_on(DOC, Rule("div", lib.prefix_attributes("p-", "id")), result="context.root")
    assert out.children[0].children[0].attrs["p-id"] == "a"

    out = run_on(DOC, Rule("div", lib.add_html_classes("z", "x")), result="context.root")
    assert out.children[0].children[0].attrs["class"] == "x y z"


def test_set_localname_and_text():
    out = run_on(DOC, Rule("span", lib.set_localname("em")), result="context.root")
    assert [n.tag for n in out.iter() if n.tag == "em"] == ["em"]
    out = run_on(DOC, Rule("p", lib.set_text("new")), result="context.root")
    assert out.children[0].children[1].text == "new"


def test_strip_namespace_keeps_localname():
    root, nsmap = parse_xml(b'<m:r xmlns:m="urn:m"><m:k/></m:r>')
    t = Transformation(
        Rule("*", lib.strip_namespace),
        result_object="context.root",
        copy=False,
    )
    out = t(root, nsmap=nsmap)
    assert out.tag == "r" and out.children[0].tag == "k"


def test_set_localname_keeps_namespace():
    root, nsmap = parse_xml(b'<m:r xmlns:m="urn:m"><m:k/></m:r>')
    t = Transformation(
        Rule("{urn:m}k", lib.set_localname("renamed")),
        result_object="context.root",
        copy=False,
    )
    out = t(root, nsmap=nsmap)
    assert out.children[0].tag == "{urn:m}renamed"


def test_merge_structural():
    dst, _ = parse_xml(b"<r><a><x>1</x></a></r>")
    src, _ = parse_xml(b"<r><a><y>2</y></a><b>3</b></r>")
    t = Transformation(
        lib.merge(source=Ref("src"), destination=Ref("root")),
        result_object="context.root",
        copy=False,
    )
    out = t(dst, src=src)
    assert serialize(out) == "<r><a><x>1</x><y>2</y></a><b>3</b></r>"


def test_insert_fontawesome_icon():
    out = run_on(DOC, Rule("p", lib.insert_fontawesome_icon("star", "first-child")),
                 result="context.root")
    p = out.children[0].children[1]
    assert p.children[0].attrs["class"] == "fa fa-star"


def test_init_elementmaker():
    out = run_on(
        DOC,
        lib.init_elementmaker("e"),
        Rule("html", [lib.f(lambda e: e("x", None, "hi"), Ref("e")), lib.put_variable("out")]),
    )
    assert out.tag == "x" and out.text == "hi"


def test_element_tests():
    root = parse_html(b'<html><body><div id="a">t<span>s</span></div><p></p></body></html>')
    body = root.children[0]
    div, p = body.children
    assert lib.has_attributes(div) and not lib.has_attributes(p)
    assert lib.has_children(div) and not lib.has_children(p)
    assert lib.has_text(div) and not lib.has_text(p)
    span = div.children[0]
    assert not lib.has_tail(span)
    assert lib.has_matching_text("^t$")(div)
    assert not lib.has_matching_text("z")(div)
    assert lib.text_equals("t")(div)
    assert not lib.text_equals("t")(p)


def test_element_tests_usable_as_conditions():
    out = run_on(DOC, Rule(lib.has_attributes, [lib.get_localname, lib.append("out")]))
    assert out == ["div"]


def test_debug_handlers_log(caplog):
    with caplog.at_level(logging.DEBUG, logger="rayxt"):
        run_on(
            DOC,
            lib.put_variable("x", 7),
            lib.debug_message("hello-log"),
            lib.debug_symbols("x"),
            lib.debug_dump_document(),
            result=None,
        )
    text = caplog.text
    assert "hello-log" in text and "x = 7" in text and "<html>" in text
