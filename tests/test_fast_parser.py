"""Differential equivalence: the fast regex tokenizer must reproduce
the html.parser-based reference builder EXACTLY — tree shape, text,
attributes, source offsets — on the conformance corpus and on
adversarial/fuzz inputs.  This is the guard that keeps the frozen
tag-soup policy byte-identical after the tokenizer swap.
"""

import os

import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rayxt.dom import (
    _parse_html_fast,
    _parse_html_stdlib,
    decode_html,
    extract_text,
    parse_html,
    serialize,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAGES = os.path.join(REPO, "fixtures", "data", "pages_conf.parquet")


def tree_repr(doc):
    """Full structural fingerprint including source offsets."""
    parts = []

    def walk(n, depth):
        parts.append((depth, n.tag, tuple(n.attrs.items()), n.text, n.tail,
                      n.src_start, n.src_end))
        for c in n.children:
            walk(c, depth + 1)

    walk(doc, 0)
    return parts


def both(text):
    try:
        a = ("ok", tree_repr(_parse_html_fast(text)))
    except Exception as exc:  # noqa: BLE001 — compare failure modes too
        a = ("err", type(exc).__name__)
    try:
        b = ("ok", tree_repr(_parse_html_stdlib(text)))
    except Exception as exc:  # noqa: BLE001
        b = ("err", type(exc).__name__)
    return a, b


EDGE_CASES = [
    "",
    "plain text only",
    "<p>a<p>b<p>c",
    "<ul><li>1<li>2</ul>",
    "<table><tr><td>a<td>b<tr><td>c</table>",
    "<script>if (a < b && c > d) { x = '</div>'; }</script>tail",
    "<style>p > a { color: red }</style>",
    "<script>unterminated at eof",
    "<SCRIPT>UPPER</SCRIPT>after",
    "<script></SCRIPT >after",
    "text &amp; more &lt;tag&gt; &#65; &#x42; &notasemicolon",
    "&amp no-semi &ampx &",
    "<div class='a' id=\"b\" checked data-x=bare>text</div>",
    "<div class='a' class='b'>first wins</div>",
    "<a href='x'/>selfclose",
    "<br><br/><hr>",
    "<!-- comment --><p>after</p>",
    "<!-- unterminated comment",
    "<!-- tricky -- ->not closed --><p>ok</p>",
    "<!DOCTYPE html><html><body>x</body></html>",
    "<!doctype junk",
    "<![CDATA[raw <b> text]]>after",
    "<![cdata[lowercase]]>",
    "<!bogus decl>after",
    "</bogus comment>after",
    "</>empty endtag",
    "</ spaced>x",
    "< notatag",
    "<",
    "<p",
    "<p attr",
    "<p attr='unterminated",
    "a < b",
    "<?php echo 1 ?>after",
    "<?unterminated pi",
    "<div><span>unclosed",
    "</div>stray end",
    "<div foo=bar baz>x</div>",
    "<div a=1/>x",
    "<div/ >x",
    "<x:y>ns-ish</x:y>",
    "<div\nclass='multi\nline'>x</div>",
    "tail<!---->empty comment",
    "<em>a</em \t >b",
    "<option>1<option>2<optgroup><option>3",
    "<head><title>t</title><body>b",
    "<td>no table context</td>",
    "&#;broken charref",
    "&#x;also broken",
    "text ending with &am",
    "<![",     # marked section truncated at EOF: data, not AssertionError
    "<![cd",   # name truncated at EOF
    "<![[",    # non-name after '<![': AssertionError on BOTH sides
]


@pytest.mark.parametrize("case", EDGE_CASES)
def test_edge_cases_match_stdlib(case):
    a, b = both(case)
    assert a == b, f"divergence on {case!r}"


def test_conformance_corpus_matches_stdlib():
    """Every document in the committed 5000-page corpus parses to an
    identical tree (offsets included) under both builders."""
    htmls = pq.read_table(PAGES, columns=["html"]).column("html").to_pylist()
    for k, html in enumerate(htmls):
        text, _ = decode_html(html)
        a, b = both(text)
        assert a == b, f"divergence on corpus doc {k}"


def test_parse_html_uses_fast_path_and_extracts():
    root = parse_html(b"<html><body><p>hello <b>world</b></p></body></html>")
    assert extract_text(root) == "hello world"
    assert serialize(root).startswith("<html>")


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=600))
def test_fuzz_text_matches_stdlib(text):
    a, b = both(text)
    assert a == b


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="<>&;!/-='\"abc \n\t[]?#x", max_size=200))
def test_fuzz_markup_soup_matches_stdlib(text):
    """Adversarial alphabet: dense in markup metacharacters."""
    a, b = both(text)
    assert a == b


ATTR_EDGE_CASES = [
    # boundary shapes around the attributed-tag fast path (_ATTR_TAG)
    '<div class="a">x</div>',
    '<div class="a" id="b">x</div>',
    '<div checked>x</div>',
    '<div checked class="a">x</div>',
    '<div class="">empty value</div>',
    '<div class="a&amp;b">entity in value</div>',
    '<div class="a" class="b">dup first wins</div>',
    '<div data-x:y.z="q">exotic name chars</div>',
    '<div class="a>b">gt inside value</div>',
    '<div class="a<b">lt inside value</div>',
    '<div class="a" >trailing space</div>',
    '<div\tclass="a"\n>mixed ws</div>',
    '<div class ="a">space before eq (slow path)</div>',
    '<div class= "a">space after eq (slow path)</div>',
    '<div class=="a">double eq (slow path)</div>',
    '<div CLASS="a">upper name (slow path)</div>',
    '<div class="a"/>selfclose (slow path)</div>',
    '<div class="a" />selfclose ws (slow path)</div>',
    "<div class='a'>single quotes (slow path)</div>",
    '<div class=bare>bare value (slow path)</div>',
    '<div class="unterminated>x</div>',
    '<div 9lead="x">digit-lead attr (slow path)</div>',
    '<script src="x.js">var a = "</notscript>";</script>after',
    '<img src="x.png" alt="">void with attrs',
    '<div class="\xa0unicode ws in value">x</div>',
    '<div\xa0class="a">unicode ws between (tolerant \\s)</div>',
]


@pytest.mark.parametrize("case", ATTR_EDGE_CASES)
def test_attr_fast_path_edges_match_stdlib(case):
    a, b = both(case)
    assert a == b, f"divergence on {case!r}"


_ATTR_NAMES = st.sampled_from(
    ["class", "id", "href", "data-x", "x:y", "a.b", "checked", "Class", "9x"]
)
_ATTR_VALS = st.one_of(
    st.none(),
    st.text(alphabet='ab<>&;#" \'=/\n\t', max_size=12),
)
_WS = st.sampled_from([" ", "  ", "\t", "\n", " \xa0"])


@st.composite
def _attr_tags(draw):
    name = draw(st.sampled_from(["div", "span", "a", "img", "script", "DIV"]))
    parts = [f"<{name}"]
    for _ in range(draw(st.integers(0, 4))):
        parts.append(draw(_WS))
        parts.append(draw(_ATTR_NAMES))
        val = draw(_ATTR_VALS)
        if val is not None:
            quote = draw(st.sampled_from(['"', "'", ""]))
            eq = draw(st.sampled_from(["=", " = ", "=="]))
            parts.append(f"{eq}{quote}{val}{quote}")
    parts.append(draw(st.sampled_from(["", " ", "/"])))
    parts.append(draw(st.sampled_from([">", "/>", ""])))
    parts.append(draw(st.text(alphabet="ab </>", max_size=8)))
    return "".join(parts)


@settings(max_examples=500, deadline=None)
@given(st.lists(_attr_tags(), max_size=4).map("".join))
def test_fuzz_attributed_tags_match_stdlib(text):
    """Dense generator around the attributed-tag fast-path boundary."""
    a, b = both(text)
    assert a == b
