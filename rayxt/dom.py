"""DOM layer: stdlib-only HTML/XML tree, serializer and text extraction.

This module is the *frozen* byte-identity substrate of the engine
(SURVEY.md section 7.4).  Both the engine kernel and the vendored
conformance oracle (``tests/oracle``) share it, so parser quirks cancel
out and byte-identity statements are about the rule engine, not the
parser.  lxml is unavailable in this environment; the builder is based
on ``html.parser.HTMLParser`` and ``xml.etree.ElementTree``.

FROZEN TAG-SOUP POLICY (changing any of this changes golden bytes):

* encoding sniff: BOM (utf-8-sig / utf-16le / utf-16be) -> ``<meta
  charset>`` / ``http-equiv`` declaration within the first 4096 bytes
  (tried strictly; on failure fall through) -> UTF-8 strict -> latin-1.
  After decoding, ``\\r\\n`` and bare ``\\r`` are normalized to ``\\n``.
* void elements never take children; ``<br>``-style tags close
  immediately.
* implied end tags: ``p`` is closed by any open of a block-level tag;
  ``li`` by ``li``; ``dt``/``dd`` by ``dt``/``dd``; ``tr`` by ``tr``;
  ``td``/``th`` by ``td``/``th``/``tr``; ``option`` by
  ``option``/``optgroup``; ``thead``/``tbody``/``tfoot`` by each other;
  ``head`` by ``body``.
* stray end tags with no matching open element are ignored.
* comments become ``#comment`` nodes (text = comment body); DOCTYPE and
  processing instructions are dropped.
* entity and character references are decoded in text (``&amp;`` etc.),
  except inside ``<script>``/``<style>`` whose content is raw text.
* root synthesis: if the parse yields exactly one top-level element
  named ``html`` it becomes the root; otherwise an ``html`` root with a
  single ``body`` child is synthesized and all top-level nodes move into
  the body.

FROZEN TEXT-EXTRACTION POLICY (``extract_text``):

* subtrees of SKIP_SUBTREE tags (script, style, noscript, template,
  iframe, svg, head, #comment) contribute no text; their *tail* text
  still belongs to the parent flow.
* a newline boundary is emitted before and after every BLOCK_TAGS
  element; all other element boundaries are seamless.
* the concatenation is then normalized: split on newlines, each line's
  whitespace runs (unicode) collapsed to single spaces and stripped,
  empty lines dropped, lines joined with a single ``\\n``.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from html.parser import HTMLParser
from io import BytesIO, StringIO

__all__ = [
    "Node",
    "ParseTimeout",
    "parse_html",
    "parse_xml",
    "decode_html",
    "extract_text",
    "serialize",
    "new_element",
    "BLOCK_TAGS",
    "SKIP_SUBTREE",
    "VOID_ELEMENTS",
]


class ParseTimeout(Exception):
    """Raised when a cooperative parse deadline expires (SURVEY P15:
    row-level timeout for pathological documents)."""

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

BLOCK_TAGS = frozenset(
    (
        "html body article section div p h1 h2 h3 h4 h5 h6 ul ol li table thead "
        "tbody tfoot tr caption td th nav header footer aside main blockquote pre "
        "br hr figure figcaption form fieldset address dl dt dd select option "
        "textarea title"
    ).split()
)

SKIP_SUBTREE = frozenset(
    "script style noscript template iframe svg head #comment".split()
)

_BLOCK_CLOSES_P = frozenset(
    (
        "address article aside blockquote div dl fieldset figcaption figure footer "
        "form h1 h2 h3 h4 h5 h6 header hr main nav ol p pre section table ul"
    ).split()
)

# start tag T closes an open element S when S in _IMPLIED_END and T in its set
_IMPLIED_END = {
    "p": _BLOCK_CLOSES_P,
    "li": frozenset({"li"}),
    "dt": frozenset({"dt", "dd"}),
    "dd": frozenset({"dt", "dd"}),
    "tr": frozenset({"tr"}),
    "td": frozenset({"td", "th", "tr"}),
    "th": frozenset({"td", "th", "tr"}),
    "option": frozenset({"option", "optgroup"}),
    "thead": frozenset({"tbody", "tfoot"}),
    "tbody": frozenset({"tbody", "tfoot"}),
    "tfoot": frozenset({"tbody"}),
    "head": frozenset({"body"}),
}


class Node:
    """Mutable tree node (element or ``#comment``).

    Tags use Clark notation (``{uri}local``) when namespaced (XML mode);
    plain lowercase names in HTML mode.  ``detached`` marks nodes that
    were removed from the tree while a traversal may still hold them.
    """

    __slots__ = (
        "tag",
        "attrs",
        "text",
        "tail",
        "children",
        "parent",
        "src_start",
        "src_end",
        "detached",
    )

    def __init__(self, tag, attrs=None, text=None, tail=None):
        self.tag = tag
        self.attrs = attrs if attrs is not None else {}
        self.text = text
        self.tail = tail
        self.children = []
        self.parent = None
        self.src_start = -1
        self.src_end = -1
        self.detached = False

    # -- structure ---------------------------------------------------------
    def append(self, child: "Node") -> "Node":
        child.parent = self
        self.children.append(child)
        return child

    def insert(self, index: int, child: "Node") -> "Node":
        child.parent = self
        self.children.insert(index, child)
        return child

    def index_in_parent(self) -> int:
        return self.parent.children.index(self)

    def remove_child(self, child: "Node") -> None:
        self.children.remove(child)
        child.parent = None
        child.detached = True

    def detach(self, keep_children=False, preserve_text=False, preserve_tail=False):
        """Remove this node from its parent (the L11 primitive).

        ``keep_children`` splices children into the parent at this
        node's position; ``preserve_text`` / ``preserve_tail`` merge the
        node's text/tail into the surrounding text flow instead of
        dropping them.
        """
        parent = self.parent
        if parent is None:
            return
        idx = parent.children.index(self)

        def _merge_before(s: str) -> None:
            if not s:
                return
            if idx > 0:
                prev = parent.children[idx - 1]
                prev.tail = (prev.tail or "") + s
            else:
                parent.text = (parent.text or "") + s

        if preserve_text and self.text:
            _merge_before(self.text)
        parent.children.pop(idx)
        if keep_children:
            for off, c in enumerate(self.children):
                c.parent = parent
                parent.children.insert(idx + off, c)
            if self.children:
                last = self.children[-1]
                if preserve_tail and self.tail:
                    last.tail = (last.tail or "") + self.tail
            elif preserve_tail:
                _merge_before(self.tail or "")
            self.children = []
        elif preserve_tail and self.tail:
            _merge_before(self.tail)
        self.parent = None
        self.detached = True
        _mark_detached(self)

    # -- accessors ---------------------------------------------------------
    @property
    def localname(self) -> str:
        t = self.tag
        return t.rsplit("}", 1)[1] if t.startswith("{") else t

    @property
    def namespace(self):
        t = self.tag
        return t[1:].split("}", 1)[0] if t.startswith("{") else None

    def is_element(self) -> bool:
        return not self.tag.startswith("#")

    def iter(self):
        """Pre-order (document order) over self and descendants."""
        stack = [self]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(reversed(node.children))

    def find_all(self, tag):
        return [n for n in self.iter() if n.tag == tag]

    def deepcopy(self) -> "Node":
        n = Node(self.tag, dict(self.attrs), self.text, self.tail)
        n.src_start, n.src_end = self.src_start, self.src_end
        for c in self.children:
            n.append(c.deepcopy())
        return n

    def __repr__(self):  # pragma: no cover - debug aid
        return f"<Node {self.tag} attrs={self.attrs} children={len(self.children)}>"


def _mark_detached(node: Node) -> None:
    for d in node.iter():
        d.detached = True


def new_element(tag, attrs=None, *children, text=None, tail=None) -> Node:
    """Tiny element factory (the engine's ElementMaker, L26)."""
    n = Node(tag, dict(attrs) if attrs else {}, text=text, tail=tail)
    for c in children:
        if isinstance(c, Node):
            n.append(c)
        elif isinstance(c, str):
            if n.children:
                last = n.children[-1]
                last.tail = (last.tail or "") + c
            else:
                n.text = (n.text or "") + c
        else:
            raise TypeError(f"cannot append {type(c)!r} to element")
    return n


# ---------------------------------------------------------------------------
# encoding sniff
# ---------------------------------------------------------------------------

_META_CHARSET_RE = re.compile(
    rb"""charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""", re.IGNORECASE
)


def _normalize_newlines(text: str) -> str:
    # scan-before-copy: most documents carry no \r, skip two allocations
    if "\r" in text:
        return text.replace("\r\n", "\n").replace("\r", "\n")
    return text


def decode_html(data) -> tuple[str, str]:
    """bytes -> (decoded text, encoding used).  Frozen sniff chain."""
    if isinstance(data, str):
        return _normalize_newlines(data), "str"
    if data is None:
        return "", "empty"
    enc = None
    if data.startswith(b"\xef\xbb\xbf"):
        enc = "utf-8-sig"
    elif data.startswith(b"\xff\xfe"):
        enc = "utf-16-le"
        data = data[2:]
    elif data.startswith(b"\xfe\xff"):
        enc = "utf-16-be"
        data = data[2:]
    text = None
    if enc is not None:
        try:
            text = data.decode(enc)
        except (UnicodeDecodeError, LookupError):
            text, enc = None, None
    if text is None:
        m = _META_CHARSET_RE.search(data[:4096])
        if m:
            declared = m.group(1).decode("ascii", "replace").lower()
            try:
                text = data.decode(declared)
                enc = declared
            except (UnicodeDecodeError, LookupError):
                text = None
    if text is None:
        try:
            text = data.decode("utf-8")
            enc = "utf-8"
        except UnicodeDecodeError:
            text = data.decode("latin-1")
            enc = "latin-1"
    return _normalize_newlines(text), enc


# ---------------------------------------------------------------------------
# HTML builder
# ---------------------------------------------------------------------------


class _TreeBuilder(HTMLParser):
    def __init__(self, line_offsets):
        super().__init__(convert_charrefs=True)
        self.doc = Node("#document")
        self.stack = [self.doc]
        self._line_offsets = line_offsets

    def _abs_pos(self) -> int:
        line, col = self.getpos()
        try:
            return self._line_offsets[line - 1] + col
        except IndexError:
            return -1

    def _add_text(self, data: str) -> None:
        cur = self.stack[-1]
        if cur.children:
            last = cur.children[-1]
            last.tail = (last.tail or "") + data
        else:
            cur.text = (cur.text or "") + data

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        implied = _IMPLIED_END
        while len(self.stack) > 1:
            top = self.stack[-1].tag
            closers = implied.get(top)
            if closers is not None and tag in closers:
                self.stack.pop()
            else:
                break
        attr_dict = {}
        for k, v in attrs:
            if k not in attr_dict:
                attr_dict[k] = v if v is not None else ""
        node = Node(tag, attr_dict)
        node.src_start = self._abs_pos()
        self.stack[-1].append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)
        else:
            raw = self.get_starttag_text() or ""
            node.src_end = node.src_start + len(raw)

    def handle_startendtag(self, tag, attrs):
        tag = tag.lower()
        attr_dict = {}
        for k, v in attrs:
            if k not in attr_dict:
                attr_dict[k] = v if v is not None else ""
        node = Node(tag, attr_dict)
        node.src_start = self._abs_pos()
        raw = self.get_starttag_text() or ""
        node.src_end = node.src_start + len(raw)
        self.stack[-1].append(node)

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                end = self._abs_pos() + len(tag) + 3  # '</' + tag + '>'
                for n in self.stack[i:]:
                    if n.src_end < 0:
                        n.src_end = end
                del self.stack[i:]
                return
        # stray end tag: ignored (frozen policy)

    def handle_data(self, data):
        if data:
            self._add_text(data)

    def handle_comment(self, data):
        node = Node("#comment", text=data)
        node.src_start = self._abs_pos()
        node.src_end = node.src_start + len(data) + 7  # <!-- -->
        self.stack[-1].append(node)

    def handle_decl(self, decl):
        pass

    def handle_pi(self, data):
        pass

    def unknown_decl(self, data):
        # CDATA sections and other marked sections become raw text
        if data.startswith("CDATA["):
            self._add_text(data[6:])


# ---------------------------------------------------------------------------
# fast tokenizer
# ---------------------------------------------------------------------------
#
# A direct regex tokenizer that mirrors html.parser's goahead() control
# flow construct by construct (same tolerant regexes, same recovery
# paths, same entity handling) but builds the Node tree inline with no
# handler indirection and — the big win — no line/column bookkeeping:
# html.parser's updatepos() re-counts newlines for every data segment,
# which dominates parse time, while source offsets here are just the
# scan index.  Byte-identity with the stdlib builder is enforced by
# tests/test_fast_parser.py (conformance corpus + differential fuzz);
# set RAYXT_PARSER=stdlib to fall back to html.parser.

from html import unescape as _unescape  # noqa: E402  (html5 charref rules)
from time import monotonic as _monotonic  # noqa: E402

_TAGFIND = re.compile(r"([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*")
_ATTRFIND = re.compile(
    r"((?<=[\'\"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*"
    r"(\'[^\']*\'|\"[^\"]*\"|(?![\'\"])[^>\s]*))?(?:\s|/(?!>))*"
)
_LOCATESTARTTAGEND = re.compile(r"""
  <[a-zA-Z][^\t\n\r\f />\x00]*       # tag name
  (?:[\s/]*                          # optional whitespace before attribute name
    (?:(?<=['"\s/])[^\s/>][^\s/=>]*  # attribute name
      (?:\s*=+\s*                    # value indicator
        (?:'[^']*'                   # LITA-enclosed value
          |"[^"]*"                   # LIT-enclosed value
          |(?!['"])[^>\s]*           # bare value
         )
        \s*                          # possibly followed by a space
       )?(?:\s|/(?!>))*
     )*
   )?
  \s*                                # trailing whitespace
""", re.VERBOSE)
_ENDTAGFIND = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_COMMENTCLOSE = re.compile(r"--\s*>")
_MARKEDSECTIONCLOSE = re.compile(r"]\s*]\s*>")
_MSMARKEDSECTIONCLOSE = re.compile(r"]\s*>")
_DECLNAME = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*")
_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script\s*>", re.IGNORECASE),
    "style": re.compile(r"</\s*style\s*>", re.IGNORECASE),
}
_ALNUM_EQ_SLASH = frozenset("abcdefghijklmnopqrstuvwxyz=/"
                            "ABCDEFGHIJKLMNOPQRSTUVWXYZ")
# fast path for the overwhelmingly common `<tag>` shape: lowercase name,
# no attributes, no self-close — semantics provably identical to the
# tolerant machinery, which stays the fallback for everything else
_SIMPLE_TAG = re.compile(r"<([a-z][a-z0-9]*)>")
# second fast path: lowercase tag with only `name` / `name="value"`
# attributes (no self-close, no single quotes, no bare values, no spaces
# around `=`). For inputs this matches, the tolerant machinery provably
# produces the same (tag, attrs, endpos): the attr-name charset is a
# subset of _ATTRFIND's, `"[^"]*"` is _ATTRFIND's LIT value verbatim,
# duplicate attrs stay first-wins, and html.unescape short-circuits on
# values without '&' exactly like the fallback path. Locked by the
# differential corpus + fuzz suite in tests/test_fast_parser.py.
# NB: separators are ASCII whitespace ONLY — _TAGFIND treats Unicode
# whitespace (e.g. \xa0) as part of the tag name, so `\s` here would
# diverge; non-ASCII-ws tags simply fall through to the slow path.
_ATTR_TAG = re.compile(
    r'<([a-z][a-z0-9]*)'
    r'((?:[ \t\n\r\f]+[a-z][a-z0-9_:.-]*(?:="[^"]*")?)*)'
    r'[ \t\n\r\f]*>'
)
_ATTR_ITEM = re.compile(r'[ \t\n\r\f]+([a-z][a-z0-9_:.-]*)(?:="([^"]*)")?')
_STD_SECTIONS = frozenset({"temp", "cdata", "ignore", "include", "rcdata"})
_MS_SECTIONS = frozenset({"if", "else", "endif"})


def _parse_html_fast(text: str, deadline: float | None = None) -> Node:
    """One-pass tree build; see the mirror-of-html.parser note above.

    ``deadline`` (``time.monotonic()`` value) is checked cooperatively
    every ~2048 constructs — a pathological document raises
    :class:`ParseTimeout` instead of stalling its whole batch.
    """
    doc = Node("#document")
    stack = [doc]
    n = len(text)
    find = text.find
    startswith = text.startswith
    implied = _IMPLIED_END
    voids = VOID_ELEMENTS

    def add_text(data):
        cur = stack[-1]
        if cur.children:
            last = cur.children[-1]
            last.tail = (last.tail or "") + data
        else:
            cur.text = (cur.text or "") + data

    def end_tag(tag, pos):
        if tag in voids:
            return
        for idx in range(len(stack) - 1, 0, -1):
            if stack[idx].tag == tag:
                end = pos + len(tag) + 3  # '</' + tag + '>'
                for node in stack[idx:]:
                    if node.src_end < 0:
                        node.src_end = end
                del stack[idx:]
                return
        # stray end tag: ignored (frozen policy)

    def parse_starttag(i):
        sm = _SIMPLE_TAG.match(text, i)
        if sm:
            tag = sm.group(1)
            endpos = sm.end()
            node = Node(tag, {})
            node.src_start = i
            while len(stack) > 1:
                closers = implied.get(stack[-1].tag)
                if closers is not None and tag in closers:
                    stack.pop()
                else:
                    break
            stack[-1].append(node)
            if tag not in voids:
                stack.append(node)
                if tag in _CDATA_CLOSE:
                    return ~endpos
            else:
                node.src_end = endpos
            return endpos
        am = _ATTR_TAG.match(text, i)
        if am:
            tag = am.group(1)
            endpos = am.end()
            attrs = {}
            for aname, aval in _ATTR_ITEM.findall(am.group(2)):
                if aname not in attrs:
                    attrs[aname] = _unescape(aval) if aval else ""
            node = Node(tag, attrs)
            node.src_start = i
            while len(stack) > 1:
                closers = implied.get(stack[-1].tag)
                if closers is not None and tag in closers:
                    stack.pop()
                else:
                    break
            stack[-1].append(node)
            if tag not in voids:
                stack.append(node)
                if tag in _CDATA_CLOSE:
                    return ~endpos
            else:
                node.src_end = endpos
            return endpos
        m = _LOCATESTARTTAGEND.match(text, i)
        j = m.end()
        nxt = text[j:j + 1]
        if nxt == ">":
            endpos = j + 1
        elif nxt == "/":
            if startswith("/>", j):
                endpos = j + 2
            else:
                return -1
        elif nxt == "":
            return -1
        elif nxt in _ALNUM_EQ_SLASH:
            return -1
        elif j > i:
            endpos = j
        else:
            endpos = i + 1
        tm = _TAGFIND.match(text, i + 1)
        tag = tm.group(1).lower()
        attrs = {}
        k = tm.end()
        while k < endpos:
            am = _ATTRFIND.match(text, k)
            if not am:
                break
            name, rest, value = am.group(1, 2, 3)
            if not rest:
                value = ""
            else:
                if (value[:1] == "'" == value[-1:]
                        or value[:1] == '"' == value[-1:]):
                    value = value[1:-1]
                if value:
                    value = _unescape(value)
            name = name.lower()
            if name not in attrs:
                attrs[name] = value
            k = am.end()
        end = text[k:endpos].strip()
        if end not in (">", "/>"):
            add_text(text[i:endpos])  # bogus input: raw, NOT unescaped
            return endpos
        node = Node(tag, attrs)
        node.src_start = i
        if end == "/>":
            # XHTML-style empty tag: no implied-end pops, no push
            node.src_end = endpos
            stack[-1].append(node)
            return endpos
        while len(stack) > 1:
            closers = implied.get(stack[-1].tag)
            if closers is not None and tag in closers:
                stack.pop()
            else:
                break
        stack[-1].append(node)
        if tag not in voids:
            stack.append(node)
            if tag in _CDATA_CLOSE:
                return ~endpos  # flag: caller enters cdata mode
        else:
            node.src_end = endpos
        return endpos

    def parse_bogus_comment(i):
        pos = find(">", i + 2)
        if pos == -1:
            return -1
        node = Node("#comment", text=text[i + 2:pos])
        node.src_start = i
        node.src_end = i + (pos - i - 2) + 7
        stack[-1].append(node)
        return pos + 1

    def parse_comment(i):
        m = _COMMENTCLOSE.search(text, i + 4)
        if not m:
            return -1
        data = text[i + 4:m.start()]
        node = Node("#comment", text=data)
        node.src_start = i
        node.src_end = i + len(data) + 7
        stack[-1].append(node)
        return m.end()

    def parse_marked_section(i):
        if i + 3 == n:
            return -1  # '<![' at EOF: incomplete, not an error
        m = _DECLNAME.match(text, i + 3)
        if not m:
            raise AssertionError(
                "expected name token at %r" % text[i:i + 20]
            )
        s = m.group()
        if i + 3 + len(s) == n:
            return -1
        name = s.strip().lower()
        if name in _STD_SECTIONS:
            mm = _MARKEDSECTIONCLOSE.search(text, i + 3)
        elif name in _MS_SECTIONS:
            mm = _MSMARKEDSECTIONCLOSE.search(text, i + 3)
        else:
            raise AssertionError(
                "unknown status keyword %r in marked section" % text[i + 3:m.end()]
            )
        if not mm:
            return -1
        content = text[i + 3:mm.start()]
        if content.startswith("CDATA["):
            add_text(content[6:])
        return mm.end()

    def parse_decl(i):
        if startswith("<![", i):
            return parse_marked_section(i)
        if text[i:i + 9].lower() == "<!doctype":
            gt = find(">", i + 9)
            if gt == -1:
                return -1
            return gt + 1  # DOCTYPE dropped
        return parse_bogus_comment(i)

    cdata_elem = None
    i = 0
    ticks = 0
    while i < n:
        if deadline is not None:
            ticks += 1
            if not ticks & 2047 and _monotonic() > deadline:
                raise ParseTimeout(f"parse exceeded deadline at offset {i}")
        if cdata_elem is None:
            j = find("<", i)
            if j < 0:
                j = n
            if i < j:
                add_text(_unescape(text[i:j]))
        else:
            m = _CDATA_CLOSE[cdata_elem].search(text, i)
            if not m:
                return doc  # EOF inside script/style: content dropped
            j = m.start()
            if i < j:
                add_text(text[i:j])  # raw text, no charref decoding
        i = j
        if i == n:
            break
        nxt = text[i + 1:i + 2]
        if nxt and (("a" <= nxt <= "z") or ("A" <= nxt <= "Z")):
            k = parse_starttag(i)
            if k < -1:  # entered script/style raw-text mode
                cdata_elem = stack[-1].tag
                k = ~k
        elif startswith("</", i):
            gt = find(">", i + 1)
            if gt < 0:
                k = -1
            else:
                gtpos = gt + 1
                em = _ENDTAGFIND.match(text, i)
                if em is None:
                    if cdata_elem is not None:
                        add_text(text[i:gtpos])
                        k = gtpos
                    else:
                        nm = _TAGFIND.match(text, i + 2)
                        if nm is None:
                            k = i + 3 if text[i:i + 3] == "</>" else \
                                parse_bogus_comment(i)
                        else:
                            end_tag(nm.group(1).lower(), i)
                            k = find(">", nm.end()) + 1
                else:
                    elem = em.group(1).lower()
                    if cdata_elem is not None and elem != cdata_elem:
                        add_text(text[i:gtpos])
                        k = gtpos
                    else:
                        end_tag(elem, i)
                        cdata_elem = None
                        k = gtpos
        elif startswith("<!--", i):
            k = parse_comment(i)
        elif startswith("<?", i):
            gt = find(">", i + 2)
            k = -1 if gt < 0 else gt + 1  # PI dropped
        elif startswith("<!", i):
            k = parse_decl(i)
        elif i + 1 < n:
            add_text("<")
            k = i + 1
        else:
            break  # lone '<' at EOF: flushed below
        if k < 0:
            # unterminated construct at EOF (html.parser close() path)
            k = find(">", i + 1)
            if k < 0:
                k = find("<", i + 1)
                if k < 0:
                    k = i + 1
            else:
                k += 1
            add_text(_unescape(text[i:k]))
        i = k
    if i < n and cdata_elem is None:
        add_text(_unescape(text[i:n]))
    return doc


def _parse_html_stdlib(text: str) -> Node:
    """Reference builder on html.parser (RAYXT_PARSER=stdlib)."""
    line_offsets = [0]
    pos = text.find("\n")
    while pos != -1:
        line_offsets.append(pos + 1)
        pos = text.find("\n", pos + 1)
    builder = _TreeBuilder(line_offsets)
    builder.feed(text)
    builder.close()
    return builder.doc


import os as _os  # noqa: E402

_USE_FAST = _os.environ.get("RAYXT_PARSER", "fast") != "stdlib"


def parse_html(data, deadline: float | None = None) -> Node:
    """Parse HTML bytes/str into a Node tree rooted at ``html``.

    ``deadline``: optional ``time.monotonic()`` cutoff enforced
    cooperatively by the fast tokenizer (:class:`ParseTimeout`); the
    stdlib fallback parser has no preemption point and ignores it.
    """
    text, _enc = decode_html(data)
    doc = _parse_html_fast(text, deadline) if _USE_FAST \
        else _parse_html_stdlib(text)
    elems = [c for c in doc.children if c.is_element()]
    if len(elems) == 1 and elems[0].tag == "html" and (doc.text or "").strip() == "":
        root = elems[0]
        root.parent = None
        root.tail = None
        return root
    root = Node("html")
    body = Node("body")
    root.append(body)
    body.text = doc.text
    for c in doc.children:
        body.append(c)
    root.src_start = 0
    root.src_end = body.src_end = len(text)
    body.src_start = 0
    return root


# ---------------------------------------------------------------------------
# XML builder (namespaced documents, mods->tei style)
# ---------------------------------------------------------------------------


def parse_xml(data) -> tuple[Node, dict]:
    """Parse well-formed XML -> (root Node with Clark-notation tags, nsmap).

    nsmap maps prefix ('' for default) -> namespace uri, accumulated over
    every ``xmlns`` declaration in the document (later declarations of
    the same prefix win).
    """
    if isinstance(data, str):
        stream = StringIO(data)
    else:
        stream = BytesIO(data)
    nsmap = {}
    root_et = None
    for event, payload in ET.iterparse(stream, events=("start", "start-ns")):
        if event == "start-ns":
            prefix, uri = payload
            nsmap[prefix] = uri
        elif root_et is None:
            root_et = payload
    if root_et is None:
        raise ValueError("empty XML document")

    def convert(el: ET.Element) -> Node:
        n = Node(el.tag, dict(el.attrib), el.text, el.tail)
        for c in el:
            if isinstance(c.tag, str):
                n.append(convert(c))
        return n

    root = convert(root_et)
    root.tail = None
    return root, nsmap


# ---------------------------------------------------------------------------
# serialization
# ---------------------------------------------------------------------------

_ESC_TEXT = {"&": "&amp;", "<": "&lt;", ">": "&gt;"}
_ESC_ATTR = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;"}


def _esc(s: str, table) -> str:
    out = s
    for ch, rep in table.items():
        if ch in out:
            out = out.replace(ch, rep)
    return out


def serialize(node: Node, xml_mode: bool = False) -> str:
    """Serialize a tree deterministically.

    XML mode assigns ``ns0..nsN`` prefixes to Clark-notation namespaces
    in first-seen document order (deterministic); HTML mode writes void
    elements self-closed.  Attribute order is insertion order.
    """
    ns_order: list[str] = []

    def collect(n: Node) -> None:
        if n.tag.startswith("{"):
            uri = n.namespace
            if uri not in ns_order:
                ns_order.append(uri)
        for c in n.children:
            collect(c)

    if xml_mode:
        collect(node)
    prefix_of = {uri: f"ns{i}" for i, uri in enumerate(ns_order)}

    def qname(tag: str) -> str:
        if tag.startswith("{"):
            uri, local = tag[1:].split("}", 1)
            return f"{prefix_of[uri]}:{local}"
        return tag

    out: list[str] = []

    def emit(n: Node, is_root: bool) -> None:
        if n.tag == "#comment":
            out.append(f"<!--{n.text or ''}-->")
            if n.tail:
                out.append(_esc(n.tail, _ESC_TEXT))
            return
        name = qname(n.tag)
        out.append(f"<{name}")
        if is_root and xml_mode:
            for uri in ns_order:
                out.append(f' xmlns:{prefix_of[uri]}="{_esc(uri, _ESC_ATTR)}"')
        for k, v in n.attrs.items():
            out.append(f' {qname(k) if k.startswith("{") else k}="{_esc(v, _ESC_ATTR)}"')
        if not n.children and not n.text:
            if xml_mode or n.tag in VOID_ELEMENTS:
                out.append("/>")
            else:
                out.append(f"></{name}>")
        else:
            out.append(">")
            if n.text:
                out.append(_esc(n.text, _ESC_TEXT))
            for c in n.children:
                emit(c, False)
            out.append(f"</{name}>")
        if n.tail:
            out.append(_esc(n.tail, _ESC_TEXT))
    emit(node, True)
    return "".join(out)


# ---------------------------------------------------------------------------
# text extraction (THE frozen invariant)
# ---------------------------------------------------------------------------


_BOUNDARY = "\x00"


def extract_text(root: Node) -> str:
    """Document-order text of the tree under the frozen policy above.

    Newlines *inside* source text are ordinary whitespace (collapsed);
    only BLOCK_TAGS boundaries produce output line breaks.  Iterative
    (explicit work stack) — this runs once per document in the hot
    kernel and the recursive version's call overhead measured ~5% of
    extraction time.
    """
    parts: list[str] = []
    append = parts.append
    skip = SKIP_SUBTREE
    blocks = BLOCK_TAGS
    # work items: Node = visit; True = closing block boundary; str = tail text
    stack: list = [root]
    pop = stack.pop
    push = stack.append
    while stack:
        item = pop()
        cls = item.__class__
        if cls is Node:
            local = item.tag
            if local.startswith("{"):
                local = local.rsplit("}", 1)[1]
            if local in skip:
                continue
            if local in blocks:
                append(_BOUNDARY)
                push(True)
            if item.text:
                append(item.text)
            for c in reversed(item.children):
                if c.tail:
                    push(c.tail)
                push(c)
        elif cls is bool:
            append(_BOUNDARY)
        else:
            append(item)
    raw = "".join(parts)
    lines = []
    for segment in raw.split(_BOUNDARY):
        norm = " ".join(segment.split())
        if norm:
            lines.append(norm)
    return "\n".join(lines)
