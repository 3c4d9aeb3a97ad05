"""Mojibake repair: policy cases, a from-scratch-UTF-8-decoder fuzz
against CPython's codec, engine-vs-oracle parity, dataset stage."""

import pyarrow as pa
import pytest

from rayxt.mojibake import fix_mojibake, fix_text_encoding
from tests.oracle.mojibake_oracle import _utf8_decode_strict, oracle_fix


def _mangle(s: str) -> str:
    out = []
    for b in s.encode("utf-8"):
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))
    return "".join(out)


@pytest.mark.parametrize("clean", [
    "café au lait", "naïve œuvre", "’curly’ “quotes” — dash…",
    "€99 •bullet", "emoji \U0001f600 four-byte", "ħêåvý mix ±°",
])
def test_single_round_repair(clean):
    assert fix_mojibake(_mangle(clean)) == (clean, 1)


def test_double_round_repair():
    clean = "résumé"
    assert fix_mojibake(_mangle(_mangle(clean))) == (clean, 2)


@pytest.mark.parametrize("untouched", [
    "pure ascii only",
    "café",            # real accents: é -> 0xE9 alone is invalid UTF-8
    "Ã stray lead then ascii",     # C3 20 invalid continuation
    "mixed Ã© with 漢字",          # CJK outside the byte table
    "",
    None,
])
def test_untouched_cases(untouched):
    assert fix_mojibake(untouched) == (untouched, 0)


def test_false_positive_envelope_documented():
    # the literal bigram Ã© IS repaired — the frozen trade-off
    assert fix_mojibake("Ã©") == ("é", 1)


def test_oracle_utf8_decoder_fuzz_vs_cpython():
    import hashlib

    for trial in range(300):
        seed = hashlib.sha256(f"moji-fuzz-{trial}".encode()).digest()
        bs = list((seed * 3)[: 8 + trial % 40])
        cps, _ = _utf8_decode_strict(bs)
        try:
            want = [ord(c) for c in bytes(bs).decode("utf-8", "strict")]
        except UnicodeDecodeError:
            want = None
        assert cps == want, bytes(bs)


def test_oracle_utf8_decoder_edge_sequences():
    cases = {
        (0xC0, 0x80): None,            # overlong NUL
        (0xE0, 0x80, 0x80): None,      # overlong 3-byte
        (0xED, 0xA0, 0x80): None,      # surrogate D800
        (0xED, 0x9F, 0xBF): [0xD7FF],  # just below surrogates
        (0xF4, 0x8F, 0xBF, 0xBF): [0x10FFFF],
        (0xF4, 0x90, 0x80, 0x80): None,  # above U+10FFFF
        (0xC2,): None,                 # truncated
        (0x80,): None,                 # stray continuation
    }
    for bs, want in cases.items():
        assert _utf8_decode_strict(list(bs))[0] == want, bs


def test_engine_matches_oracle_on_fixture_family():
    from fixtures.gen_pages import mojibake_text_of

    for i in range(600):
        t = mojibake_text_of(i)
        assert fix_mojibake(t) == oracle_fix(t), i


def test_dataset_stage(ray_session):
    import ray.data as rd

    from fixtures.gen_pages import generate_mojibake_table

    src = generate_mojibake_table(300)
    out = fix_text_encoding(rd.from_arrow(src)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out.columns) == ["doc_id", "text", "mojibake_rounds"]
    for i in range(300):
        want_text, want_rounds = oracle_fix(src["text"][i].as_py())
        assert out["text"][i] == want_text
        assert out["mojibake_rounds"][i] == want_rounds
    assert (out["mojibake_rounds"] > 0).any()


def test_dataset_stage_out_column_and_all_clean(ray_session):
    import ray.data as rd

    src = pa.table({"id": [1, 2], "text": ["plain", "also plain"]})
    out = fix_text_encoding(rd.from_arrow(src), out="text_fixed") \
        .to_pandas().sort_values("id")
    assert list(out.columns) == ["id", "text", "text_fixed",
                                 "mojibake_rounds"]
    assert (out["text_fixed"] == out["text"]).all()
    assert (out["mojibake_rounds"] == 0).all()
