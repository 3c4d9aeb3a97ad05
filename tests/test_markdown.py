"""HTML -> Markdown conversion tests: the frozen policy's edge cases
hand-checked against literal expected markdown, full parity vs the
independent IR-pipeline oracle across the fixture family, and the
distributed stage end to end."""

from fixtures.gen_pages import generate_markdown_table
from rayxt.markdown import to_markdown
from tests.oracle.markdown_oracle import oracle_markdown


def _md(html: str) -> str:
    r = to_markdown(html.encode())
    assert r["status"] == "ok"
    return r["markdown"]


# -- hand-checked policy cases ------------------------------------------------

def test_headings_and_paragraphs():
    assert _md("<h1>One</h1><p>a b</p><h3> Two <b>x</b> </h3>") \
        == "# One\n\na b\n\n### Two **x**"
    assert _md("<h2>  </h2><p></p>") == ""  # empty blocks dropped


def test_inline_markup_and_links():
    assert _md("<p>a <b>b</b> <em>c</em> <code>d()</code></p>") \
        == "a **b** *c* `d()`"
    assert _md('<p><a href=" /x ">t</a></p>') == "[t](/x)"
    assert _md('<p><a href="">t</a></p>') == "t"  # empty href: text only
    assert _md('<p><a href="/x"></a>z</p>') == "z"  # empty text: nothing
    assert _md("<p>a<b> b </b>c</p>") == "a**b**c"  # edge ws dropped
    assert _md("<p>x<br>y</p>") == "x y"  # br is a space


def test_code_span_backtick_escape():
    assert _md("<p><code>a ` b</code></p>") == "`` a ` b ``"
    assert _md("<p><code><b>rm</b> -rf</code></p>") == "`rm -rf`"  # text only


def test_images():
    assert _md('<p><img src="/i.png" alt=" a  b "></p>') == "![a b](/i.png)"
    assert _md('<p><img src="/i.png"></p>') == "![](/i.png)"
    assert _md('<p><img alt="x">y</p>') == "y"  # no src: nothing
    assert _md('<p><a href="/b"><img src="/t.jpg" alt="t"></a></p>') \
        == "[![t](/t.jpg)](/b)"


def test_lists_nested_and_ordered():
    assert _md("<ul><li>a</li><li>b</li></ul>") == "- a\n- b"
    assert _md("<ol><li>a</li><li></li><li>b</li></ol>") == "1. a\n3. b"
    assert _md("<ul><li>a<ul><li>x</li></ul></li></ul>") == "- a\n  - x"
    # ordered continuation lines align under the marker
    got = _md("<ol><li><p>p1</p><p>p2</p></li></ol>")
    assert got == "1. p1\n   p2"
    assert _md("<ul></ul>") == ""  # itemless list: no block


def test_pre_fences():
    assert _md("<pre>\nx = 1\n\ny = 2\n</pre>") == "```\nx = 1\n\ny = 2\n```"
    assert _md("<pre>has ``` fence</pre>") == "````\nhas ``` fence\n````"
    assert _md("<pre>   </pre>") == ""  # whitespace-only: no block


def test_blockquote():
    assert _md("<blockquote><p>a</p><p>b</p></blockquote>") \
        == "> a\n>\n> b"
    assert _md("<blockquote><blockquote><p>d</p></blockquote></blockquote>") \
        == "> > d"


def test_tables():
    assert _md("<table><tr><th>H1</th><th>H|2</th></tr>"
               "<tr><td>a</td></tr></table>") \
        == "| H1 | H\\|2 |\n| --- | --- |\n| a |  |"
    assert _md("<table><thead><tr><td>x</td></tr></thead>"
               "<tbody><tr><td>y</td></tr></tbody></table>") \
        == "| x |\n| --- |\n| y |"
    assert _md("<table></table>") == ""


def test_hr_and_skip_subtrees():
    assert _md("<p>a</p><hr><p>b</p>") == "a\n\n---\n\nb"
    assert _md("<p>x<script>v=1</script> tail<!-- c -->.</p>") == "x tail."


def test_transparent_containers_and_soup():
    assert _md("<div><section>a</section><p>b</p></div>") == "a\n\nb"
    assert _md("<ul><li>one<li>two</ul>") == "- one\n- two"  # implied </li>
    assert _md("<dl><dt>t</dt><dd>d</dd></dl>") == "t\n\nd"


def test_status_rows():
    assert to_markdown(None) == {"markdown": None, "status": "empty"}
    assert to_markdown(b"") == {"markdown": None, "status": "empty"}
    deep = (b"<div>" * 10000) + b"x" + (b"</div>" * 10000)
    assert to_markdown(deep)["status"] == "error"


# -- oracle parity + distributed stage ----------------------------------------

def test_kernel_matches_oracle_on_fixture_family():
    t = generate_markdown_table(400)
    for h in t["html"].to_pylist():
        assert to_markdown(h) == oracle_markdown(h)


def test_extract_markdown_stage_matches_kernel(ray_session):
    import ray.data as rd

    from rayxt.markdown import extract_markdown

    t = generate_markdown_table(120)
    got = (extract_markdown(rd.from_arrow(t).repartition(5), concurrency=2)
           .to_pandas().sort_values("url").reset_index(drop=True))
    assert got.shape[0] == 120
    assert list(got.columns) == ["url", "markdown", "status"]
    want = {u: to_markdown(h)
            for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist())}
    for _, row in got.iterrows():
        w = want[row["url"]]
        md = None if row["markdown"] is None or row["markdown"] != \
            row["markdown"] else row["markdown"]
        assert md == w["markdown"] and row["status"] == w["status"], \
            row["url"]
