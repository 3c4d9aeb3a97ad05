"""Selector subset tests (SURVEY M3)."""

import pytest

from rayxt.dom import parse_html, parse_xml
from rayxt.xpath import SelectorError, parse_css, parse_xpath

HTML = (
    b"<html><body>"
    b'<div id="main"><p class="lead big">one</p><p>two</p>'
    b"<span><p>deep</p></span></div>"
    b'<div class="side"><p>three</p></div>'
    b"</body></html>"
)


def _texts(nodes):
    return [n.text for n in nodes]


def test_descendant_and_child():
    root = parse_html(HTML)
    assert _texts(parse_xpath("//p").evaluate(root)) == ["one", "two", "deep", "three"]
    assert _texts(parse_xpath('//div[@id="main"]/p').evaluate(root)) == ["one", "two"]
    assert _texts(parse_xpath('//div[@id="main"]//p').evaluate(root)) == [
        "one", "two", "deep",
    ]


def test_absolute_path_and_star():
    root = parse_html(HTML)
    assert parse_xpath("/html/body").evaluate(root)[0].tag == "body"
    assert parse_xpath("/html").evaluate(root)[0] is root
    assert len(parse_xpath("/html/body/*").evaluate(root)) == 2
    assert parse_xpath("/div").evaluate(root) == []


def test_positional_predicates():
    root = parse_html(HTML)
    assert _texts(parse_xpath('//div[@id="main"]/p[1]').evaluate(root)) == ["one"]
    assert _texts(parse_xpath('//div[@id="main"]/p[2]').evaluate(root)) == ["two"]
    assert _texts(parse_xpath('//div[@id="main"]/p[last()]').evaluate(root)) == ["two"]
    # position is computed among same-named siblings, per parent
    assert _texts(parse_xpath("//p[1]").evaluate(root)) == ["one", "deep", "three"]


def test_attribute_predicates():
    root = parse_html(HTML)
    assert _texts(parse_xpath("//p[@class]").evaluate(root)) == ["one"]
    assert _texts(parse_xpath('//p[@class="lead big"]').evaluate(root)) == ["one"]
    assert parse_xpath('//p[@class="lead"]').evaluate(root) == []


def test_child_tag_and_text_predicates():
    root = parse_html(HTML)
    assert [n.attrs.get("id") for n in parse_xpath("//div[span]").evaluate(root)] == ["main"]
    assert _texts(parse_xpath('//p[text()="two"]').evaluate(root)) == ["two"]


def test_and_or_predicates():
    root = parse_html(b'<html><body><a x="1" y="2">a</a><a x="1">b</a></body></html>')
    assert _texts(parse_xpath('//a[@x and @y]').evaluate(root)) == ["a"]
    assert _texts(parse_xpath('//a[@y or @x]').evaluate(root)) == ["a", "b"]


def test_union_document_order():
    root = parse_html(HTML)
    got = parse_xpath('//div[@class="side"]/p | //div[@id="main"]/p[1]').evaluate(root)
    assert _texts(got) == ["one", "three"]  # document order, deduped


def test_relative_path_and_dot_dotdot():
    root = parse_html(HTML)
    body = root.children[0]
    main = parse_xpath('div[@id="main"]').evaluate(body)[0]
    assert main.attrs["id"] == "main"
    assert parse_xpath(".").evaluate(main) == [main]
    assert parse_xpath("..").evaluate(main) == [body]
    assert _texts(parse_xpath(".//p").evaluate(main)) == ["one", "two", "deep"]


def test_namespaced_xpath():
    root, nsmap = parse_xml(
        b'<m:r xmlns:m="urn:m"><m:kid>a</m:kid><m:kid>b</m:kid></m:r>'
    )
    assert _texts(parse_xpath("//m:kid").evaluate(root, nsmap)) == ["a", "b"]
    assert _texts(parse_xpath("//{urn:m}kid").evaluate(root, nsmap)) == ["a", "b"]
    with pytest.raises(SelectorError):
        parse_xpath("//zz:kid").evaluate(root, nsmap)


def test_out_of_subset_raises_at_compile():
    # (following-sibling:: joined the subset in round 4; following::/
    # preceding::/attribute::, the common predicate functions AND
    # [count(rel)=n] in round 5 — location-step functions and the
    # rest stay out)
    for bad in ["count(//p)", "//p/namespace::a",
                "//p[substring(@a,1,2)='x']", "//p[count(/html/a)=1]",
                "//p[foo()]", "//p[contains(@a)]",
                "//p[string-length()]", "//p[position()]",
                "//p[contains(foo,'x')]"]:
        with pytest.raises(SelectorError):
            parse_xpath(bad)


def test_css_subset():
    root = parse_html(HTML)
    assert _texts(parse_css("p").evaluate(root)) == ["one", "two", "deep", "three"]
    assert _texts(parse_css("#main > p").evaluate(root)) == ["one", "two"]
    assert _texts(parse_css("div.side p").evaluate(root)) == ["three"]
    assert _texts(parse_css("p.lead").evaluate(root)) == ["one"]
    assert _texts(parse_css("p.big").evaluate(root)) == ["one"]  # class word match
    assert _texts(parse_css("p[class]").evaluate(root)) == ["one"]
    assert _texts(parse_css('p[class="lead big"]').evaluate(root)) == ["one"]
    assert _texts(parse_css("div.side p, #main p.lead").evaluate(root)) == ["one", "three"]


def test_css_errors():
    with pytest.raises(SelectorError):
        parse_css("p:hover")
    with pytest.raises(SelectorError):
        parse_css("")


AXES_HTML = (
    b"<html><body>"
    b'<section id="s1"><h2>t1</h2><p>a</p><p>b</p><ul><li>x</li>'
    b"<li>y</li></ul><p>c</p></section>"
    b'<section id="s2"><p class="solo">d</p></section>'
    b"</body></html>"
)


def test_explicit_axis_aliases():
    root = parse_html(HTML)
    # child:: / self:: / descendant:: spellings agree with the shorthand
    assert _texts(parse_xpath('//div[@id="main"]/child::p').evaluate(root)) \
        == ["one", "two"]
    got = parse_xpath('/html/body/descendant::p').evaluate(root)
    assert _texts(got) == ["one", "two", "deep", "three"]
    # descendant:: positions span the whole axis (NOT per parent)
    assert _texts(parse_xpath('/html/body/descendant::p[3]').evaluate(root)) \
        == ["deep"]
    assert parse_xpath('/html/body/descendant-or-self::body').evaluate(
        root)[0].tag == "body"


def test_ancestor_axes():
    root = parse_html(AXES_HTML)
    deep = parse_xpath("//li[1]").evaluate(root)[0]
    # via a path: every p with a section ancestor named s1
    hits = parse_xpath('//li/ancestor::section').evaluate(root)
    assert [n.attrs["id"] for n in hits] == ["s1"]
    # reverse axis: position 1 is the NEAREST ancestor
    assert parse_xpath("//li/ancestor::*[1]").evaluate(root)[0].tag == "ul"
    anc_self = parse_xpath("//ul/ancestor-or-self::*[1]").evaluate(root)
    assert anc_self[0].tag == "ul"
    # results come back in document order
    order = parse_xpath("//li/ancestor::*").evaluate(root)
    assert [n.tag for n in order] == ["html", "body", "section", "ul"]
    assert deep.tag == "li"


def test_sibling_axes():
    root = parse_html(AXES_HTML)
    assert _texts(parse_xpath("//h2/following-sibling::p").evaluate(root)) \
        == ["a", "b", "c"]
    assert _texts(parse_xpath("//h2/following-sibling::p[2]").evaluate(
        root)) == ["b"]
    assert _texts(parse_xpath("//ul/preceding-sibling::p").evaluate(root)) \
        == ["a", "b"]
    # reverse axis: [1] is the nearest preceding sibling
    assert _texts(parse_xpath("//ul/preceding-sibling::p[1]").evaluate(
        root)) == ["b"]
    assert parse_xpath(
        '//p[@class="solo"]/following-sibling::*').evaluate(root) == []


def test_unsupported_axes_raise():
    for bad in ("//x/namespace::y", "//ancestor::x", "//following::y",
                "//@href", "/a/@b/c", "/a/@b[1]", "/a/attribute::text()"):
        with pytest.raises(SelectorError):
            parse_xpath(bad)


def test_following_preceding_axes():
    root = parse_html(AXES_HTML)
    # following:: = everything after s1's first p, minus its subtree
    got = parse_xpath('//section[@id="s1"]/p[1]/following::p') \
        .evaluate(root)
    assert _texts(got) == ["b", "c", "d"]
    got = parse_xpath('//li[1]/following::p').evaluate(root)
    assert _texts(got) == ["c", "d"]
    # descendants of the context are NOT on the following axis
    got = parse_xpath('//section[@id="s1"]/following::p').evaluate(root)
    assert _texts(got) == ["d"]
    # preceding:: excludes ancestors; reverse axis => [1] is nearest,
    # document order restored in the result set
    got = parse_xpath('//section[@id="s2"]/preceding::p').evaluate(root)
    assert _texts(got) == ["a", "b", "c"]
    got = parse_xpath('//section[@id="s2"]/preceding::p[1]') \
        .evaluate(root)
    assert _texts(got) == ["c"]
    got = parse_xpath('//li[2]/preceding::li').evaluate(root)
    assert _texts(got) == ["x"]
    # ancestors (body, section) never appear on preceding::
    got = parse_xpath('//li[1]/preceding::*').evaluate(root)
    assert all(n.tag not in ("html", "body", "section", "ul")
               for n in got)
    assert [n.tag for n in got] == ["h2", "p", "p"]


def test_attribute_axis_steps():
    root = parse_html(HTML)
    assert parse_xpath('//div/@id').evaluate(root) == ["main"]
    assert parse_xpath('//div/attribute::class').evaluate(root) \
        == ["side"]
    assert parse_xpath('//p/@class').evaluate(root) == ["lead big"]
    assert parse_xpath('//div/@*').evaluate(root) == ["main", "side"]
    assert parse_xpath('//span/@id').evaluate(root) == []
    # equal values from DIFFERENT elements both survive (no id dedup)
    twin = parse_html(b'<html><body><a href="x">1</a>'
                      b'<a href="x">2</a></body></html>')
    assert parse_xpath("//a/@href").evaluate(twin) == ["x", "x"]
    # union of element and attribute results keeps both kinds
    mixed = parse_xpath('//p[@class] | //div/@id').evaluate(root)
    assert [m if isinstance(m, str) else m.text for m in mixed] \
        == ["one", "main"]


def test_css_pseudo_classes():
    root = parse_html(AXES_HTML)
    assert _texts(parse_css("li:first-child").evaluate(root)) == ["x"]
    assert _texts(parse_css("li:last-child").evaluate(root)) == ["y"]
    assert _texts(parse_css("section > p:first-child").evaluate(root)) \
        == ["d"]  # s2's p is a first child; s1's first child is h2
    assert _texts(parse_css("p:not(.solo)").evaluate(root)) == ["a", "b", "c"]
    assert _texts(parse_css("section p:not([class])").evaluate(root)) \
        == ["a", "b", "c"]
    got = parse_css("*:not(p):not(li)").evaluate(root)
    assert all(n.tag not in ("p", "li") for n in got)
    with pytest.raises(SelectorError):
        parse_css("p:not(div > a)")


def test_css_nth_child():
    root = parse_html(AXES_HTML)
    # s1 children: h2(1) p(2) p(3) ul(4) p(5); s2: p(1)
    assert _texts(parse_css("section > p:nth-child(2)").evaluate(root)) \
        == ["a"]
    assert _texts(parse_css("section > p:nth-child(odd)").evaluate(root)) \
        == ["b", "c", "d"]
    assert _texts(parse_css("section > p:nth-child(even)")
                  .evaluate(root)) == ["a"]
    assert _texts(parse_css("section > :nth-child(2n+1)").evaluate(root)) \
        == ["t1", "b", "c", "d"]
    assert _texts(parse_css("li:nth-child(n+2)").evaluate(root)) == ["y"]
    assert _texts(parse_css("section > p:nth-child(-n+2)")
                  .evaluate(root)) == ["a", "d"]
    assert _texts(parse_css("li:nth-child(0n+1)").evaluate(root)) == ["x"]
    for bad in ("p:nth-child()", "p:nth-child(x)", "p:nth-child(n+)"):
        with pytest.raises(SelectorError):
            parse_css(bad)


FN_HTML = (
    b"<html><body>"
    b'<div class="nav-bar top" id="nav"><p>skip</p></div>'
    b'<div class="content main"><p>one</p><p>  two  words </p><p></p>'
    b"<span>x<em>y</em>z</span><p>four</p></div>"
    b"<ul><li>a</li><li>b</li><li>c</li><li>d</li></ul>"
    b'<a href="https://x.example/aa">A</a>'
    b'<a href="http://y.example/b">B</a>'
    b'<a href="https://z.example/c" rel="nofollow">C</a>'
    b"</body></html>"
)


def test_xpath_string_functions():
    root = parse_html(FN_HTML)
    assert [n.attrs["id"] for n in
            parse_xpath("//div[contains(@class,'nav')]").evaluate(root)] \
        == ["nav"]
    assert parse_xpath("//a[starts-with(@href,'https')]/@href") \
        .evaluate(root) == ["https://x.example/aa", "https://z.example/c"]
    # missing attribute -> empty string-value -> contains('') semantics
    assert parse_xpath("//a[contains(@rel,'no')]").evaluate(root)[0] \
        .text == "C"
    assert parse_xpath("//a[starts-with(@rel,'x')]").evaluate(root) == []
    # '.' argument = full string-value (descendant text incl. tails)
    assert [n.tag for n in
            parse_xpath("//span[contains(., 'xyz')]").evaluate(root)] \
        == ["span"]
    assert _texts(parse_xpath("//p[contains(text(),'two')]")
                  .evaluate(root)) == ["  two  words "]


def test_xpath_normalize_space_and_length():
    root = parse_html(FN_HTML)
    assert _texts(parse_xpath("//p[normalize-space()='two words']")
                  .evaluate(root)) == ["  two  words "]
    # bare normalize-space() drops the empty <p></p>
    assert _texts(parse_xpath(
        "//div[@class='content main']/p[normalize-space()]")
        .evaluate(root)) == ["one", "  two  words ", "four"]
    assert [n.attrs["id"] for n in
            parse_xpath("//div[normalize-space(@id)='nav']")
            .evaluate(root)] == ["nav"]
    assert _texts(parse_xpath("//p[normalize-space()!='one']/..")
                  .evaluate(root)) is not None  # parses; result unused
    assert _texts(parse_xpath("//li[string-length() > 0]")
                  .evaluate(root)) == ["a", "b", "c", "d"]
    assert _texts(parse_xpath("//p[string-length(.) >= 4]")
                  .evaluate(root)) == ["skip", "  two  words ", "four"]
    assert parse_xpath("//a[string-length(@href) <= 20]/@href") \
        .evaluate(root) == ["https://x.example/aa", "http://y.example/b",
                            "https://z.example/c"]


def test_xpath_position_arithmetic_and_not():
    root = parse_html(FN_HTML)
    assert _texts(parse_xpath("//ul/li[position()>1]").evaluate(root)) \
        == ["b", "c", "d"]
    assert _texts(parse_xpath("//ul/li[position()<=2]").evaluate(root)) \
        == ["a", "b"]
    assert _texts(parse_xpath("//ul/li[last()-1]").evaluate(root)) == ["c"]
    assert _texts(parse_xpath("//ul/li[position()!=last()]")
                  .evaluate(root)) == ["a", "b", "c"]
    assert _texts(parse_xpath("//ul/li[position()=last()-2]")
                  .evaluate(root)) == ["b"]
    assert _texts(parse_xpath("//a[not(@rel)]").evaluate(root)) \
        == ["A", "B"]
    assert _texts(parse_xpath(
        "//li[not(position()=1 or position()=last())]")
        .evaluate(root)) == ["b", "c"]
    # bare [text()] keeps elements owning at least one text node
    assert _texts(parse_xpath("//div[@class='content main']/p[text()]")
                  .evaluate(root)) == ["one", "  two  words ", "four"]
    # != on attributes: missing attribute is FALSE (node-set semantics)
    assert _texts(parse_xpath("//a[@rel!='x']").evaluate(root)) == ["C"]
    assert _texts(parse_xpath("//p[text()!='one']").evaluate(root)) \
        == ["skip", "  two  words ", None, "four"]


def test_css_attr_operators():
    root = parse_html(FN_HTML)
    assert _texts(parse_css("a[href^='https']").evaluate(root)) \
        == ["A", "C"]
    assert _texts(parse_css("a[href$='/b']").evaluate(root)) == ["B"]
    assert _texts(parse_css("a[href*='example']").evaluate(root)) \
        == ["A", "B", "C"]
    assert _texts(parse_css("div[class~='main'] > p[class]")
                  .evaluate(root)) == []
    assert [n.attrs["id"] for n in
            parse_css("div[class|='nav']").evaluate(root)] == ["nav"]
    assert parse_css("a[href^='']").evaluate(root) == []  # empty never matches
    assert parse_css("a[href*='']").evaluate(root) == []


def test_css_of_type_pseudos():
    root = parse_html(FN_HTML)
    assert _texts(parse_css("div.content p:nth-of-type(2)")
                  .evaluate(root)) == ["  two  words "]
    assert _texts(parse_css("div.content p:first-of-type")
                  .evaluate(root)) == ["one"]
    assert _texts(parse_css("div.content p:last-of-type")
                  .evaluate(root)) == ["four"]
    assert _texts(parse_css("div.content p:nth-last-of-type(2)")
                  .evaluate(root)) == [None]
    # span is the 4th element child but the 1st (and only) span
    assert [n.tag for n in
            parse_css("div.content span:first-of-type").evaluate(root)] \
        == ["span"]
    assert _texts(parse_css("div p:only-child").evaluate(root)) == ["skip"]
    assert _texts(parse_css("li:nth-of-type(even)").evaluate(root)) \
        == ["b", "d"]


NUMDOC = parse_html(
    '<html><body>'
    '<img src="a" width="50"><img src="b" width="150">'
    '<img src="c" width=" 150.5 "><img src="d" width="x150">'
    '<img src="e"><img src="f" width="-2">'
    '<ul id="u1"><li>1</li><li>2</li><li>3</li></ul>'
    '<ul id="u2"><li>only</li></ul>'
    '<ul id="u3"></ul>'
    '<div id="d1"><p><a href="#">x</a></p><p></p></div>'
    '</body></html>')


def _srcs(sel):
    return [n.attrs.get("src") for n in parse_xpath(sel).evaluate(NUMDOC)]


def _ids(sel):
    return [n.attrs.get("id") for n in parse_xpath(sel).evaluate(NUMDOC)]


def test_xpath_numeric_attribute_comparisons():
    assert _srcs("//img[@width > 100]") == ["b", "c"]
    assert _srcs("//img[@width >= 150]") == ["b", "c"]
    assert _srcs("//img[@width < 100]") == ["a", "f"]
    assert _srcs("//img[@width = 150]") == ["b"]      # numeric, not string
    assert _srcs("//img[@width = 150.5]") == ["c"]    # ws-stripped decimal
    # NaN ('x150') and missing width are false under EVERY operator,
    # including != (empty node-set semantics)
    assert _srcs("//img[@width != 150]") == ["a", "c", "f"]
    assert _srcs("//img[@width > -3]") == ["a", "b", "c", "f"]
    # string equality still distinguishes: ' 150.5 ' != '150.5'
    assert _srcs("//img[@width='150.5']") == []
    assert _srcs("//img[@width=' 150.5 ']") == ["c"]


def test_xpath_count_predicate():
    assert _ids("//ul[count(li) > 2]") == ["u1"]
    assert _ids("//ul[count(li) = 1]") == ["u2"]
    assert _ids("//ul[count(li) = 0]") == ["u3"]
    assert _ids("//ul[count(li) >= 1]") == ["u1", "u2"]
    # multi-step relative path + nested predicate
    assert _ids("//div[count(p/a) = 1]") == ["d1"]
    assert _ids("//div[count(.//a) = 1]") == ["d1"]
    assert _ids("//ul[count(li[2]) = 1]") == ["u1"]
    # combinable with and/or and not()
    assert _ids("//ul[count(li) > 0 and count(li) < 3]") == ["u2"]
    assert _ids("//ul[not(count(li) > 1)]") == ["u2", "u3"]


def test_xpath_numeric_subset_errors():
    for bad in ("//ul[count(/html//li) > 1]",   # absolute count arg
                "//li[1.5]",                     # decimal position
                "//li[position() = 1.5]",
                "//ul[count(li) >"):
        with pytest.raises(SelectorError):
            parse_xpath(bad)


CSSDOC = parse_html(
    '<html><body>'
    '<div id="e1"></div>'
    '<div id="e2"><!-- c --></div>'
    '<div id="e3"> </div>'
    '<div id="e4"><!-- c -->tail</div>'
    '<div id="e5"><span></span></div>'
    '<ul id="h1"><li><a href="#">x</a></li><li>plain</li></ul>'
    '<ul id="h2"><li>no links</li></ul>'
    '<div id="h3"><a class="deep">d</a></div>'
    '<div id="h4"><p><a class="deep">d</a></p></div>'
    '<ol id="n1"><li id="x1">1</li><li id="x2">2</li>'
    '<li id="x3">3</li><li id="x4">4</li></ol>'
    '</body></html>')


def _css_ids(sel):
    return [n.attrs.get("id") for n in parse_css(sel).evaluate(CSSDOC)]


def test_css_empty():
    # comments are ignorable content, whitespace text and comment
    # tails are not
    assert _css_ids("div:empty") == ["e1", "e2"]


def test_css_has():
    assert _css_ids("ul:has(a)") == ["h1"]
    assert _css_ids("div:has(a.deep)") == ["h3", "h4"]
    assert _css_ids("div:has(> a.deep)") == ["h3"]   # child-only
    assert _css_ids("ul:has(> li)") == ["h1", "h2"]
    with pytest.raises(SelectorError):
        parse_css("div:has(p a)")        # combinators inside: out
    with pytest.raises(SelectorError):
        parse_css("div:has(:has(a))")


def test_css_nth_last_child():
    assert _css_ids("ol > li:nth-last-child(1)") == ["x4"]
    assert _css_ids("ol > li:nth-last-child(odd)") == ["x2", "x4"]
    assert _css_ids("ol > li:nth-last-child(-n+2)") == ["x3", "x4"]
