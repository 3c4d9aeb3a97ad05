"""Unicode NFC normalization: frozen policy, python==DuckDB parity
over adversarial strings, and the dataset stage."""

import duckdb
import pyarrow as pa
import pytest

from rayxt.text import NORMALIZE_CTRL_RE, normalize_sql_expr, normalize_text

CASES = [
    "plain ascii",
    "",
    "café composed-on-normalize",
    "각 jamo to syllable",
    "Å ring",
    "already é composed",
    "ﬁ ligature stays under NFC",
    "ọ̈ multiple combining (reorders)",
    "q̣̇ ccc ordering",
    "tab\tand\nnewline\rkept",
    "bell\x07 null\x00 c1\x9f stripped",
    "\x1b[31mansi\x1b[0m",
    "Å angstrom sign composes to Å",
    "Ω ohm to omega",
]


def test_python_matches_duckdb_on_adversarial_strings():
    con = duckdb.connect()
    for s in CASES:
        want = con.execute(
            f"select {normalize_sql_expr('$1')}", [s]).fetchone()[0]
        got = _norm_one(s)
        assert got == want, repr(s)


def _norm_one(s):
    import re
    import unicodedata

    stripped = re.sub(NORMALIZE_CTRL_RE, "", s)
    return unicodedata.normalize("NFC", stripped)


def test_stage_policy(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": list(range(len(CASES) + 1)),
                  "text": pa.array(CASES + [None], pa.string())})
    got = normalize_text(rd.from_arrow(t).repartition(3)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    for i, s in enumerate(CASES):
        assert got["text_nfc"][i] == _norm_one(s), repr(s)
    assert got["text_nfc"][len(CASES)] is None or \
        got["text_nfc"].isna()[len(CASES)]
    # controls stripped, tab/LF/CR kept
    row = got["text_nfc"][CASES.index("bell\x07 null\x00 c1\x9f stripped")]
    assert row == "bell null c1 stripped"
    row = got["text_nfc"][CASES.index("tab\tand\nnewline\rkept")]
    assert row == "tab\tand\nnewline\rkept"
    # dictionary broadcast: repeated values normalize identically
    t2 = pa.table({"doc_id": [1, 2, 3],
                   "text": ["café", "café", "café"]})
    got2 = normalize_text(rd.from_arrow(t2)).to_pandas()
    assert set(got2["text_nfc"]) == {"café"}
