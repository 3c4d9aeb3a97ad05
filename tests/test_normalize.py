"""Unicode NFC normalization: frozen policy, python==DuckDB parity
over adversarial strings, and the dataset stage."""

import duckdb
import pyarrow as pa
import pytest

from rayxt.text import (NORMALIZE_CTRL_RE, nfc_strip_controls,
                        normalize_sql_expr)

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
    got = nfc_strip_controls(rd.from_arrow(t).repartition(3)) \
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
    got2 = nfc_strip_controls(rd.from_arrow(t2)).to_pandas()
    assert set(got2["text_nfc"]) == {"café"}


# ---------------------------------------------------------------------------
# sentence splitting
# ---------------------------------------------------------------------------


def _sentences(rows, ray_session=None):
    import ray.data as rd

    from rayxt.text import split_sentences

    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string())})
    df = split_sentences(rd.from_arrow(t).repartition(2)).to_pandas()
    return df.sort_values(["doc_id", "sent_idx"]).reset_index(drop=True)


def test_split_sentences_policy(ray_session):
    got = _sentences([
        (1, "One. Two! (Three?) Four v. end."),
        (2, "no terminal punctuation"),
        (3, ""),        # no rows
        (4, None),      # no rows
        (5, 'He said "Stop!" Then left... Done?! yes.'),
        (6, "trailing.   "),
    ])
    by_doc = {k: list(g["sentence"]) for k, g in got.groupby("doc_id")}
    assert by_doc[1] == ["One.", "Two!", "(Three?)", "Four v.", "end."]
    assert by_doc[2] == ["no terminal punctuation"]
    assert 3 not in by_doc and 4 not in by_doc
    assert by_doc[5] == ['He said "Stop!"', "Then left...", "Done?!",
                         "yes."]
    assert by_doc[6] == ["trailing."]
    one = got[got["doc_id"] == 1]
    assert list(one["sent_idx"]) == [0, 1, 2, 3, 4]
    assert list(one["n_words"]) == [1, 1, 1, 2, 1]


def test_split_sentences_matches_duckdb(ray_session):
    from rayxt.text import sentences_sql

    rows = [(i, txt) for i, txt in enumerate([
        "Mixed.  Spacing!\tTabs? done",
        "Ellipsis... more!? (Quoted.) 'Single.' end",
        "A.B. initials. Next",
        "nul\x00already. inside",
        "",
        None,
    ])]
    got = _sentences(rows)
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string())})
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(sentences_sql()).df() \
        .sort_values(["doc_id", "sent_idx"]).reset_index(drop=True)
    assert len(got) == len(want)
    for c in got.columns:
        assert list(got[c]) == list(want[c]), c
