"""Byte-identity conformance: engine vs vendored oracle (SURVEY 5.3).

The oracle (tests/oracle) restates the main-content semantics naively;
the engine must produce byte-identical text for every document of the
deterministic synthetic corpus (all templates: articles, tables, tag
soup, encodings, edge sizes, entities, giants).
"""

import sys

import pytest

from fixtures.gen_pages import html_of, url_of
from rayxt.kernel import extract_one
from rayxt.programs import get_program_factory
from tests.oracle import oracle_extract

N_DOCS = 600  # covers all templates several times (template cycle = 100)


@pytest.fixture(scope="module")
def program():
    return get_program_factory("main_content")()


def test_byte_identity_over_corpus(program):
    mismatches = []
    for i in range(N_DOCS):
        html = html_of(i, giant_cap=262144)
        engine = extract_one(html, program)
        oracle = oracle_extract(html)
        if engine["status"] != oracle["status"]:
            mismatches.append((i, "status", engine["status"], oracle["status"]))
        elif engine["text"].encode() != oracle["text"].encode():
            mismatches.append((i, "text", engine["text"][:80], oracle["text"][:80]))
    assert not mismatches, f"{len(mismatches)} mismatches; first: {mismatches[:3]}"


def test_statuses_present(program):
    statuses = {
        extract_one(html_of(i, giant_cap=262144), program)["status"]
        for i in range(N_DOCS)
    }
    assert "ok" in statuses and "empty" in statuses


def test_corpus_determinism():
    assert html_of(123) == html_of(123)
    assert url_of(123) == url_of(123)
    # duplicate-url rows share the url of the earlier row, later timestamp
    u_dup, ts_dup = url_of(399)
    u_orig, ts_orig = url_of(200)
    assert u_dup == u_orig and ts_dup > ts_orig
