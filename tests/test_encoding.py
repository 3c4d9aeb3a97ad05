"""Encoding sniff: engine==oracle parity over the conformance corpus
and adversarial byte strings, plus the detect_encoding Dataset stage."""

import random

import pyarrow.parquet as pq
import pytest

from rayxt.dom import decode_html
from tests.oracle.encoding_oracle import oracle_sniff

CASES = [
    b"",
    None,
    "already a str\r\nwith\rreturns",
    b"plain ascii",
    b"\xef\xbb\xbfutf8 bom caf\xc3\xa9",
    b"\xef\xbb\xbfbad utf8 after bom \xff",
    b"\xff\xfe" + "utf16le café".encode("utf-16-le"),
    b"\xfe\xff" + "utf16be café".encode("utf-16-be"),
    b"\xff\xfeodd-length-so-utf16-fails\xff",
    b'<meta charset="iso-8859-1">caf\xe9',
    b"<meta charset = 'UTF-8' >caf\xc3\xa9",
    b'<meta http-equiv="Content-Type" content="text/html; '
    b'charset=windows-1252">\x93quoted\x94',
    b"charset=nonsense-codec \xff then latin fallback",
    b"charset but no equals sign; charset='koi8-r' \xf0\xd2\xc9",
    b"x" * 4090 + b' charset="utf-8" \xff',   # decl straddles 4096
    b"x" * 5000 + b' charset="iso-8859-1" late decl \xff',
    b'<meta charset="">empty name then utf-8',
    b"\r\nbare\rreturns\r\n",
    b'CHARSET="ISO-8859-1" upper \xe9',
]


@pytest.mark.parametrize("i", range(len(CASES)))
def test_sniff_cases(i):
    data = CASES[i]
    text, enc = decode_html(data)
    otext, oenc = oracle_sniff(data)
    assert (enc, text) == (oenc, otext)


def test_sniff_fuzz_vs_oracle():
    rng = random.Random(42)
    boms = [b"", b"\xef\xbb\xbf", b"\xff\xfe", b"\xfe\xff"]
    decls = [b"", b'charset="utf-8"', b"charset=iso-8859-1",
             b"charset = 'no-such-enc'", b"charset"]
    for _ in range(400):
        blob = (rng.choice(boms) + rng.choice(decls)
                + bytes(rng.randrange(256)
                        for _ in range(rng.randrange(0, 60))))
        text, enc = decode_html(blob)
        otext, oenc = oracle_sniff(blob)
        assert (enc, text) == (oenc, otext), blob


def test_full_corpus_parity():
    t = pq.read_table("fixtures/data/pages_conf.parquet",
                      columns=["html"])
    for data in t["html"].to_pylist():
        text, enc = decode_html(data)
        otext, oenc = oracle_sniff(data)
        assert (enc, len(text)) == (oenc, len(otext))


def test_detect_encoding_stage(ray_session):
    import ray.data as rd

    from rayxt.pipeline import detect_encoding

    rows = [{"url": f"u{i}", "html": c} for i, c in enumerate(CASES)
            if isinstance(c, (bytes, type(None)))]
    got = detect_encoding(
        rd.from_items(rows).repartition(3)).to_pandas()
    for _, r in got.iterrows():
        otext, oenc = oracle_sniff(r["html"])
        assert r["encoding"] == oenc
        assert r["n_chars_decoded"] == len(otext)
