"""Declarative rule-program format (rayxt.ruledsl).

The DSL must compile to the SAME Transformation the Python surface
builds: the flagship program restated as JSON
(rayxt/programs/main_content.json) is byte-identical — text, statuses,
rule_hits and spans — to the Python factory over the conformance
corpus, and every grammar production has a behavior test.
"""

import json

import pytest

from fixtures.gen_pages import html_of
from rayxt.dom import parse_html, parse_xml
from rayxt.kernel import extract_one
from rayxt.programs import get_program_factory
from rayxt.ruledsl import load_program, load_program_file

DSL_PATH = "rayxt/programs/main_content.json"

N_DOCS = 300  # all template families (cycle = 100) several times


def test_flagship_dsl_restatement_byte_identical():
    py = get_program_factory("main_content")()
    dsl = load_program_file(DSL_PATH)
    for i in range(N_DOCS):
        html = html_of(i, giant_cap=131072)
        a = extract_one(html, py)
        b = extract_one(html, dsl)
        assert a["status"] == b["status"], i
        assert a["text"] == b["text"], i
        assert a["rule_hits"] == b["rule_hits"], i
        assert a["spans"] == b["spans"], i


def _run(spec, html=b"<html><body><p class='keep'>A</p>"
                     b"<p class='drop'>B</p><div id='x'>C</div></body></html>"):
    prog = load_program(spec)
    return prog(parse_html(html))


def _collector_rules(condition):
    """One-rule program: collect matching elements' text into ctx.hits."""
    return {
        "context": {"hits": []},
        "result_object": "context.hits",
        "copy": False,
        "rules": [{"conditions": condition,
                   "handlers": {"import": "tests.test_ruledsl:collect_text"}}],
    }


def collect_text(element, hits):
    hits.append(element.text or "")


# each condition production drives the same collector rule ------------------

CASES = [
    ("p", ["A", "B"]),                             # bare tag string
    ({"tag": "div"}, ["C"]),                       # explicit tag
    ({"css": "p.keep"}, ["A"]),                    # css
    ({"xpath": "//div"}, ["C"]),                   # xpath
    ({"attributes": {"class": "keep"}}, ["A"]),    # attr equality
    ({"attributes": {"id": None}}, ["C"]),         # attr present
    ({"attributes": {"class": {"re": "^dr"}}}, ["B"]),  # attr regex
    ({"any": ["div", {"css": "p.keep"}]}, ["A", "C"]),
    # xor: p.keep satisfies both arms -> excluded; p.drop only the tag arm
    ({"one_of": [{"attributes": {"class": "keep"}}, "p"]}, ["B"]),
    ({"not": {"any": ["html", "body", "p"]}}, ["C"]),
]


@pytest.mark.parametrize("cond,expected", CASES, ids=[str(c) for c, _ in CASES])
def test_condition_productions(cond, expected):
    hits = _run(_collector_rules(cond))
    assert sorted(hits) == expected


def test_condition_has_namespace():
    root, nsmap = parse_xml(
        b'<r xmlns:m="urn:m"><m:k>v</m:k><p>w</p></r>')
    prog = load_program(_collector_rules({"has_namespace": "urn:m"}))
    assert prog(root, nsmap=nsmap) == ["v"]


def test_condition_if_binary_and_unary():
    spec = _collector_rules(
        [{"tag": "p"},
         {"if": {"x": {"$ref": "context.want"}, "op": "eq", "y": "keep"}},
         {"attributes": {"class": "keep"}}])
    spec["context"]["want"] = "keep"
    assert _run(spec) == ["A"]
    # unary truth: falsy context value suppresses every match
    spec2 = _collector_rules([{"if": {"x": {"$ref": "context.on"},
                                      "op": "truth"}}, "p"])
    spec2["context"]["on"] = False
    assert _run(spec2) == []
    spec2["context"]["on"] = True
    assert _run(spec2) == ["A", "B"]


def test_handler_forms_and_refs():
    # string handler (no-arg lib factory), fn+args with $ref, chaining,
    # simple steps, named rules, fuse_rules config
    spec = {
        "name": "t",
        "copy": False,
        "fuse_rules": True,
        "result_object": "context",
        "rules": [
            {"name": "drop_b",
             "conditions": {"attributes": {"class": "drop"}},
             "handlers": {"fn": "append", "args": ["trash", {"$ref": "element"}]}},
            {"step": {"fn": "remove_elements", "args": ["trash"]}},
            {"step": [{"fn": "extract_text_handler"},
                      {"fn": "put_variable", "args": ["text"]}]},
        ],
    }
    ctx = load_program(spec)(parse_html(
        b"<html><body><p class='keep'>A</p><p class='drop'>B</p></body></html>"))
    assert ctx.text == "A"


def test_import_escape_hatch_factory_and_plain():
    # {"import": mod:attr} without args injects the attribute directly;
    # with args it is called as a factory first
    spec = {
        "context": {"hits": []},
        "result_object": "context.hits",
        "copy": False,
        "rules": [{"conditions": "p",
                   "handlers": {"import": "tests.test_ruledsl:make_tagger",
                                "kwargs": {"prefix": "t-"}}}],
    }
    assert _run(spec) == ["t-A", "t-B"]


def make_tagger(prefix):
    def tagger(element, hits):
        hits.append(prefix + (element.text or ""))
    return tagger


def test_common_rule_conditions_and_traversal():
    spec = {
        "context": {"hits": []},
        "result_object": "context.hits",
        "copy": False,
        "common_rule_conditions": {"attributes": {"class": None}},
        "traversal_order": "preorder_rtl",
        "rules": [{"conditions": "p",
                   "handlers": {"import": "tests.test_ruledsl:collect_text"}}],
    }
    # only class-carrying <p>, right-to-left document order
    assert _run(spec) == ["B", "A"]


def test_json_string_and_registry_inline_spec():
    raw = open(DSL_PATH, encoding="utf-8").read()
    a = extract_one(html_of(7), load_program(raw))           # JSON text
    b = extract_one(html_of(7), get_program_factory(raw)())  # registry inline
    c = extract_one(html_of(7), get_program_factory("main_content")())
    assert a == b == c


@pytest.mark.parametrize("spec,err", [
    ({}, "rules"),
    ({"rules": [{"conditions": "p", "handlers": "no_such_fn"}]}, "unknown handler"),
    ({"rules": [{"conditions": "p", "handlers": {"fn": "get_text",
                                                 "args": [1]}}]}, "no spec arguments"),
    ({"rules": [{"conditions": {"bogus": 1}, "handlers": "get_text"}]},
     "unsupported condition"),
    ({"traversal_order": "sideways", "rules": []}, "unknown traversal"),
    ({"rules": [{"conditions": {"attributes": {"a": 3}},
                 "handlers": "get_text"}]}, "unsupported attribute"),
    ({"rules": [{"conditions": {"if": {"x": 1, "op": "bogus"}},
                 "handlers": "get_text"}]}, "unknown op"),
    ({"rules": [{"conditions": "p"}]}, "needs 'conditions' and 'handlers'"),
    ({"rules": [{"conditions": "p", "handlers": {"args": []}}]},
     "needs 'fn' or 'import'"),
])
def test_grammar_errors(spec, err):
    with pytest.raises(ValueError, match=err):
        load_program(spec)


def test_pipeline_accepts_inline_spec(ray_session, tmp_path):
    """The actor-pool extraction stage takes the JSON spec as its program
    reference — the tiny string ships by value, each actor compiles it
    once (SURVEY P2)."""
    from fixtures.gen_pages import ensure_pages_parquet
    from rayxt.pipeline import extract_pages, read_pages

    path = str(tmp_path / "pages.parquet")
    ensure_pages_parquet(path, 120, giant_cap=65536)
    raw = open(DSL_PATH, encoding="utf-8").read()
    cols = ["url", "text", "status", "n_chars"]
    a = (extract_pages(read_pages(path), program=raw, concurrency=2,
                       batch_size=32)
         .select_columns(cols).to_pandas().sort_values(cols).reset_index(drop=True))
    b = (extract_pages(read_pages(path), program="main_content", concurrency=2,
                       batch_size=32)
         .select_columns(cols).to_pandas().sort_values(cols).reset_index(drop=True))
    assert a.equals(b)
