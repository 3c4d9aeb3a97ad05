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
