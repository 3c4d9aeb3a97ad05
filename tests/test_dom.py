"""DOM layer tests: frozen tag-soup, encoding and text policies."""

from rayxt.dom import (
    Node,
    decode_html,
    extract_text,
    new_element,
    parse_html,
    parse_xml,
    serialize,
)


def test_basic_tree():
    root = parse_html(b"<html><body><div id='a'><p>hi</p></div></body></html>")
    assert root.tag == "html"
    body = root.children[0]
    assert body.tag == "body"
    div = body.children[0]
    assert div.attrs == {"id": "a"}
    assert div.children[0].text == "hi"


def test_root_synthesis_wraps_fragments():
    root = parse_html(b"hello <p>world</p> tail")
    assert root.tag == "html"
    body = root.children[0]
    assert body.tag == "body"
    assert body.text == "hello "
    assert body.children[0].tag == "p"
    assert body.children[0].tail == " tail"


def test_void_elements_never_nest():
    root = parse_html(b"<html><body><p>a<br>b<img src=x>c</p></body></html>")
    p = root.children[0].children[0]
    assert [c.tag for c in p.children] == ["br", "img"]
    assert p.text == "a"
    assert p.children[0].tail == "b"
    assert p.children[1].tail == "c"


def test_implied_end_tags_p_li_td():
    root = parse_html(
        b"<html><body><p>one<p>two<ul><li>a<li>b</ul>"
        b"<table><tr><td>x<td>y<tr><td>z</table></body></html>"
    )
    body = root.children[0]
    tags = [c.tag for c in body.children]
    assert tags == ["p", "p", "ul", "table"]
    ul = body.children[2]
    assert [li.text for li in ul.children] == ["a", "b"]
    table = body.children[3]
    trs = [c for c in table.children if c.tag == "tr"]
    assert len(trs) == 2
    assert [td.text for td in trs[0].children] == ["x", "y"]


def test_stray_end_tags_ignored():
    root = parse_html(b"<html><body><div>a</span></div>b</em></body></html>")
    body = root.children[0]
    assert body.children[0].text == "a"
    assert body.children[0].tail == "b"


def test_comments_become_nodes_and_skip_text():
    root = parse_html(b"<html><body><!-- note <p>x</p> -->real</body></html>")
    body = root.children[0]
    assert body.children[0].tag == "#comment"
    assert "note" in body.children[0].text
    assert extract_text(root) == "real"


def test_script_style_content_raw():
    root = parse_html(
        b"<html><body><script>if (a<b) { x('<div>'); }</script>"
        b"<style>p:before{content:'&amp;'}</style><p>keep</p></body></html>"
    )
    assert extract_text(root) == "keep"
    script = root.children[0].children[0]
    assert "<div>" in script.text
    style = root.children[0].children[1]
    assert "&amp;" in style.text  # no charref decoding in raw text


def test_entity_decoding_in_text():
    root = parse_html(b"<html><body><p>&amp; &lt;x&gt; &#x41;&#66; &nbsp;q</p></body></html>")
    p = root.children[0].children[0]
    assert p.text == "& <x> AB \xa0q"
    assert extract_text(root) == "& <x> AB q"  # nbsp collapses as whitespace


def test_encoding_sniff_chain():
    assert decode_html("abc")[0] == "abc"
    assert decode_html(None)[1] == "empty"
    assert decode_html(b"") == ("", "utf-8")
    # BOM wins
    text, enc = decode_html(b"\xef\xbb\xbfh\xc3\xa9")
    assert (text, enc) == ("h\xe9", "utf-8-sig")
    # meta charset honoured
    data = b'<meta charset="iso-8859-1"><p>caf\xe9</p>'
    text, enc = decode_html(data)
    assert "caf\xe9" in text and enc == "iso-8859-1"
    # meta lies (utf-8 declared, latin-1 bytes) -> fall through to latin-1
    data = b'<meta charset="utf-8"><p>caf\xe9</p>'
    text, enc = decode_html(data)
    assert "caf\xe9" in text and enc == "latin-1"
    # plain utf-8
    assert decode_html("h\xe9".encode())[1] == "utf-8"
    # invalid utf-8 -> latin-1
    assert decode_html(b"a\xffb")[1] == "latin-1"
    # \r\n normalization
    assert decode_html(b"a\r\nb\rc")[0] == "a\nb\nc"


def test_extract_text_block_boundaries():
    root = parse_html(
        b"<html><body><h1>Title</h1><p>one <b>two</b> three</p>"
        b"<div>four</div>inline <i>five</i></body></html>"
    )
    assert extract_text(root) == "Title\none two three\nfour\ninline five"


def test_extract_text_newlines_in_source_collapse():
    root = parse_html(b"<html><body><p>a\n   b\n\nc</p></body></html>")
    assert extract_text(root) == "a b c"


def test_extract_text_skips_head_and_skip_subtrees():
    root = parse_html(
        b"<html><head><title>T</title></head><body>"
        b"<noscript>ns</noscript><template>tp</template>"
        b"<iframe>if</iframe><p>keep</p></body></html>"
    )
    assert extract_text(root) == "keep"


def test_skipped_subtree_tail_still_flows():
    root = parse_html(b"<html><body><p>a<script>x</script>tail</p></body></html>")
    assert extract_text(root) == "atail"


def test_detach_variants():
    root = parse_html(b"<html><body><div>pre<span>mid</span>post</div></body></html>")
    div = root.children[0].children[0]
    span = div.children[0]
    span.detach(preserve_text=True, preserve_tail=True)
    assert div.children == []
    assert div.text == "premidpost"

    root = parse_html(b"<html><body><div><wrap><p>a</p><p>b</p></wrap></div></body></html>")
    div = root.children[0].children[0]
    wrap = div.children[0]
    wrap.detach(keep_children=True)
    assert [c.tag for c in div.children] == ["p", "p"]
    assert all(c.parent is div for c in div.children)


def test_detach_marks_subtree_detached():
    root = parse_html(b"<html><body><div><p>a</p></div></body></html>")
    div = root.children[0].children[0]
    p = div.children[0]
    div.detach()
    assert div.detached and p.detached


def test_parse_xml_namespaces():
    root, nsmap = parse_xml(
        b'<m:a xmlns:m="urn:m" xmlns="urn:d"><m:b x="1"/><c/></m:a>'
    )
    assert root.tag == "{urn:m}a"
    assert root.children[0].tag == "{urn:m}b"
    assert root.children[0].attrs == {"x": "1"}
    assert root.children[1].tag == "{urn:d}c"
    assert nsmap["m"] == "urn:m" and nsmap[""] == "urn:d"


def test_serialize_html_and_xml():
    root = parse_html(b"<html><body><p class='x'>a &amp; b</p><br></body></html>")
    s = serialize(root)
    assert s == '<html><body><p class="x">a &amp; b</p><br/></body></html>'
    n = new_element("{urn:x}r", None, new_element("{urn:x}c", {"k": "v"}, text="t"))
    assert (
        serialize(n, xml_mode=True)
        == '<ns0:r xmlns:ns0="urn:x"><ns0:c k="v">t</ns0:c></ns0:r>'
    )


def test_new_element_factory():
    n = new_element("div", {"id": "x"}, "lead", new_element("b", text="bold"), "tail")
    assert n.text == "lead"
    assert n.children[0].tail == "tail"
    assert serialize(n) == '<div id="x">lead<b>bold</b>tail</div>'


def test_node_deepcopy_independent():
    a = parse_html(b"<html><body><p>x</p></body></html>")
    b = a.deepcopy()
    b.children[0].children[0].text = "y"
    assert a.children[0].children[0].text == "x"
