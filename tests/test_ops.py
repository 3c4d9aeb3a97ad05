"""Training-data operator tests: text analysis, dedup, ANN, multimodal."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet")


def test_hash_sample_int_partition_independent_and_sql_exact(ray_session, docs):
    """P8 scale-path sampler: same rows at any partitioning, and the
    numpy arithmetic equals DuckDB's BIGINT restatement exactly."""
    import duckdb

    from rayxt.sampling import hash_sample_int, sample_sql_predicate

    got = sorted(hash_sample_int(docs, "doc_id", 0.1)
                 .to_pandas()["doc_id"].tolist())
    re_part = sorted(hash_sample_int(docs.repartition(7), "doc_id", 0.1)
                     .to_pandas()["doc_id"].tolist())
    assert got == re_part
    want = [r[0] for r in duckdb.sql(
        f"SELECT doc_id FROM '{SF}/documents.parquet' "
        f"WHERE {sample_sql_predicate('doc_id', 0.1)} ORDER BY doc_id"
    ).fetchall()]
    assert got == want
    n_total = docs.count()
    assert 0.05 * n_total <= len(got) <= 0.15 * n_total


def test_temperature_mix_sample(ray_session, docs):
    """Temperature mixing: oracle parity, partition independence, and
    the flattening semantics (alpha=0 equalizes expected per-domain
    rows, alpha=1 preserves the corpus mix)."""
    from rayxt.sampling import temperature_mix_rates, temperature_mix_sample
    from tests.oracle.sketches import oracle_temperature_mix

    got = sorted(map(tuple, temperature_mix_sample(
        docs, "doc_id", "lang", alpha=0.5, target_rows=200)
        .select_columns(["doc_id", "lang"]).to_pandas().values))
    re_part = sorted(map(tuple, temperature_mix_sample(
        docs.repartition(7), "doc_id", "lang", alpha=0.5, target_rows=200)
        .select_columns(["doc_id", "lang"]).to_pandas().values))
    assert got == re_part
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    want = sorted(oracle_temperature_mix(
        t["doc_id"].to_pylist(), t["lang"].to_pylist(),
        alpha=0.5, target_rows=200))
    assert got == want
    # semantics on a skewed synthetic mix
    counts = {"big": 9000, "small": 100}
    r0 = temperature_mix_rates(counts, alpha=0.0, target_rows=200)
    assert abs(counts["big"] * r0["big"] - 100) < 1e-6   # equalized
    assert r0["small"] == 1.0                            # capped at 1
    r1 = temperature_mix_rates(counts, alpha=1.0, target_rows=200)
    assert abs(r1["big"] - r1["small"]) < 1e-12          # corpus mix


# -- text analysis ----------------------------------------------------------

def test_token_count_matches_split(ray_session, docs):
    from rayxt.text import add_token_count

    df = add_token_count(docs).select_columns(["doc_id", "text", "n_tokens"]).to_pandas()
    expect = df["text"].str.split(" ").str.len()
    assert (df["n_tokens"] == expect).all()


def test_quality_columns(ray_session, docs):
    from rayxt.text import add_quality_columns

    df = add_quality_columns(docs).to_pandas().head(50)
    for _, r in df.iterrows():
        toks = r["text"].split(" ")
        assert r["n_tokens"] == len(toks)
        awl = round((len(r["text"]) - (len(toks) - 1)) / len(toks), 6)
        assert abs(r["avg_word_len"] - awl) < 1e-9
        assert r["the_count"] == r["text"].count("the")


def test_langid_stage(ray_session):
    import ray.data as rd

    from rayxt.text import LangId

    ds = rd.from_items(
        [
            {"text": "the cat and the dog of a house that is big"},
            {"text": "der hund und die katze ist nicht ein vogel"},
            {"text": "le chat et la maison est une grande pour les"},
            {"text": "el perro y la casa es una grande que por"},
            {"text": "这是一个中文句子 这是一个中文句子"},
            {"text": ""},
        ]
    )
    out = ds.map_batches(LangId, batch_format="pyarrow", concurrency=1).to_pandas()
    # row order is not preserved through the pool; key on the text
    got = dict(zip(out["text"], out["lang_guess"]))
    assert got[ds.take_all()[0]["text"]] == "en"
    expected = {
        "the cat": "en", "der hund": "de", "le chat": "fr",
        "el perro": "es", "这是一个中文句子": "zh", "": "",
    }
    for prefix, lang in expected.items():
        if prefix == "":
            matches = [g for t, g in got.items() if t == ""]
        else:
            matches = [g for t, g in got.items() if t.startswith(prefix)]
        assert matches == [lang], (prefix, matches)


def test_fingerprint_deterministic(ray_session, docs):
    from rayxt.text import add_fingerprint, fingerprint_of

    df = add_fingerprint(docs).select_columns(["text", "fingerprint"]).to_pandas().head(20)
    for _, r in df.iterrows():
        assert r["fingerprint"] == format(fingerprint_of(r["text"]), "016x")
    # same text -> same fp; different text -> different fp (w.h.p.)
    assert fingerprint_of("a b c") == fingerprint_of("a b c")
    assert fingerprint_of("a b c") != fingerprint_of("a b d")


def test_compression_ratio(ray_session, docs):
    from rayxt.text import add_compression_ratio, compression_ratio_of
    from tests.oracle.sketches import oracle_compression

    df = add_compression_ratio(docs).select_columns(
        ["text", "compression_ratio"]).to_pandas().head(20)
    for _, r in df.iterrows():
        assert r["compression_ratio"] == oracle_compression(r["text"])
    # repetitive text compresses harder than high-entropy text
    assert compression_ratio_of("spam " * 500) \
        < compression_ratio_of("the quick brown fox says something new")
    assert compression_ratio_of("") is None
    for s in ("a", "héllo wörld", "x" * 10, "\n".join(str(i) for i in
                                                      range(100))):
        assert compression_ratio_of(s) == oracle_compression(s)


# -- dedup ------------------------------------------------------------------

def test_exact_dedup(ray_session):
    import ray.data as rd

    from rayxt.dedup import exact_dedup

    ds = rd.from_items(
        [
            {"doc_id": 1, "text": "aaa"},
            {"doc_id": 2, "text": "bbb"},
            {"doc_id": 3, "text": "aaa"},
            {"doc_id": 4, "text": "aaa"},
        ]
    )
    out = exact_dedup(ds, "doc_id").to_pandas().sort_values("rep_doc_id")
    assert out["rep_doc_id"].tolist() == [1, 2]
    assert out["n_dups"].tolist() == [3, 1]


def test_minhash_vectorized_matches_reference():
    """The batch signature/shingle-set kernels are byte-identical to the
    per-row reference path — including whitespace edge cases, empty
    docs, sub-k docs, and the \\x1c-\\x1f chars only Python splits on."""
    import numpy as np
    import pyarrow as pa

    from rayxt.dedup import (_shingle_hashes, _shingle_set_rows,
                             minhash_signatures)

    texts = ["", "   ", "a", "a b", "a b c", "a b c d", "  x\ty\nz  ",
             None, "a  b", "c a b", "b a", "q\x1cr s t", "dup dup dup dup",
             "the quick brown fox jumps over the lazy dog " * 5]
    sig = minhash_signatures("id")
    batch = pa.table({"id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    got = sig(batch)["sig"].to_pylist()
    want = [sig.signature(t or "").astype("<i8").tobytes() for t in texts]
    assert got == want
    got_sh = _shingle_set_rows(batch, id_col="id", text_col="text",
                               k=3)["sh"].to_pylist()
    want_sh = [np.sort(_shingle_hashes(t or "", 3)).astype("<i8").tobytes()
               for t in texts]
    assert got_sh == want_sh
    # empty batch
    empty = batch.slice(0, 0)
    assert len(sig(empty)) == 0
    assert len(_shingle_set_rows(empty, id_col="id", text_col="text",
                                 k=3)) == 0


def test_minhash_lsh_finds_neardups(ray_session):
    import ray.data as rd

    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep green forest while birds sing songs").split()
    near = list(base)
    near[5] = "leaps"  # one-token edit -> high jaccard
    far = ("completely different words describing unrelated things like "
           "mathematics chemistry physics biology and astronomy topics").split()
    ds = rd.from_items(
        [
            {"doc_id": 1, "text": " ".join(base)},
            {"doc_id": 2, "text": " ".join(near)},
            {"doc_id": 3, "text": " ".join(far)},
            {"doc_id": 4, "text": " ".join(base)},  # exact dup
        ]
    )
    from rayxt.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(ds, "doc_id", threshold=0.5, concurrency=1).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (1, 4) in got  # exact dup estimated jaccard 1.0
    assert (1, 2) in got and (2, 4) in got
    assert not any(3 in p for p in got)
    exact = pairs[(pairs.id_a == 1) & (pairs.id_b == 4)]["jaccard"].iloc[0]
    assert exact == 1.0


def test_minhash_lsh_tiny_candidate_set_many_partitions(ray_session):
    # regression: a candidate-pair table smaller than the join partition
    # count left some join partitions with zero shards from the cand
    # side, crashing Ray's hash join (ArrowInvalid FieldRef id_a); the
    # n//32 partition rule + empty short-circuit must hold under heavy
    # input partitioning (empty map_groups partitions in the LSH bucket
    # groupby emit schema-less blocks)
    import ray.data as rd

    from rayxt.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    rows = (
        [{"doc_id": i, "text": "the quick brown fox jumps over the lazy dog " * 3}
         for i in range(4)]
        + [{"doc_id": 4 + i, "text": f"unique text number {i} with words " * 3}
           for i in range(4)]
    )
    ds = rd.from_items(rows).repartition(16)
    pairs = minhash_lsh_pairs(ds, "doc_id").to_pandas()
    assert set(zip(pairs["id_a"], pairs["id_b"])) == {
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)}

    # zero-candidate short-circuit: all-distinct corpus, typed empty out
    distinct = rd.from_items(
        [{"doc_id": i,
          "text": f"totally distinct document {i} about topic {i * 7} " * 2}
         for i in range(6)]
    ).repartition(8)
    none = ngram_jaccard_pairs(distinct, "doc_id", threshold=0.9)
    # typed even when empty (ray's to_pandas drops columns at 0 rows, so
    # assert on the Dataset schema)
    assert none.schema().names == ["id_a", "id_b", "jaccard"]
    assert none.count() == 0


def test_simhash_pairs(ray_session):
    import ray.data as rd

    from rayxt.dedup import simhash_of, simhash_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " \
           "lambda mu nu xi omicron pi rho sigma tau upsilon"
    near = base.replace(" pi ", " phi ")
    ds = rd.from_items(
        [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": near},
            {"doc_id": 3, "text": "unrelated totally different content here now"},
            {"doc_id": 4, "text": base},  # exact dup: guaranteed hamming 0
        ]
    )
    d12 = bin(simhash_of(base) ^ simhash_of(near)).count("1")
    pairs = simhash_pairs(ds, "doc_id", max_hamming=max(3, d12)).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (1, 4) in got
    if d12 <= 3:  # banding guarantees a collision only within 3 bits
        assert (1, 2) in got
    assert not any(3 in p for p in got)


def test_ngram_jaccard_values():
    from rayxt.dedup import ngram_jaccard

    assert ngram_jaccard("a b c d", "a b c d") == 1.0
    assert ngram_jaccard("a b c d", "x y z w") == 0.0
    assert 0.0 < ngram_jaccard("a b c d e", "a b c d x") < 1.0


def test_embedding_neardup(ray_session):
    import ray.data as rd

    from rayxt.dedup import embedding_neardup_pairs

    v = [1.0, 0.0, 0.0, 0.0]
    v2 = [0.999, 0.01, 0.0, 0.0]
    w = [0.0, 1.0, 0.0, 0.0]
    ds = rd.from_items(
        [
            {"vec_id": 1, "embedding": v, "label": 0},
            {"vec_id": 2, "embedding": v2, "label": 0},
            {"vec_id": 3, "embedding": w, "label": 0},
            {"vec_id": 4, "embedding": v, "label": 1},  # other bucket: unseen pair
        ]
    )
    pairs = embedding_neardup_pairs(ds, threshold=0.95).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert got == {(1, 2)}


# -- ANN --------------------------------------------------------------------

def test_brute_force_topk_matches_numpy(ray_session):
    import ray.data as rd

    from rayxt.ann import brute_force_topk

    rng = np.random.default_rng(3)
    n, dim, k = 300, 16, 5
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(n)]
    )
    queries = [(0, mat[0].tolist()), (1, mat[1].tolist())]
    out = brute_force_topk(ds, queries, k=k, concurrency=1, batch_size=64).to_pandas()

    m64 = mat.astype(np.float64)
    mn = m64 / np.linalg.norm(m64, axis=1)[:, None]
    for qid in (0, 1):
        sims = mn @ mn[qid]
        expect = np.lexsort((np.arange(n), -sims))[:k]
        got = out[out.query_id == qid].sort_values("rank")["id"].tolist()
        assert got == expect.tolist()
        assert out[out.query_id == qid]["rank"].tolist() == [1, 2, 3, 4, 5]


def test_lsh_topk_recall(ray_session):
    import ray.data as rd

    from rayxt.ann import brute_force_topk, lsh_topk

    rng = np.random.default_rng(5)
    n, dim, k = 400, 16, 10
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(n)]
    )
    queries = [(0, mat[0].tolist())]
    exact = set(
        brute_force_topk(ds, queries, k=k, concurrency=1).to_pandas()["id"]
    )
    approx = set(
        lsh_topk(ds, queries, k=k, n_planes=4, concurrency=1).to_pandas()["id"]
    )
    # the query itself always collides with its own bucket
    assert 0 in approx
    assert len(exact & approx) >= 2  # nonzero recall at 4 planes


def test_bpe_tokens_stopword_ratio_and_dedup_rows(ray_session):
    import re

    import pyarrow as pa
    import ray.data as rd

    from rayxt.dedup import dedup_keep_first
    from rayxt.text import (
        BPE_TOKEN_PATTERN,
        STOPWORD_PATTERN,
        add_bpe_token_count,
        add_stopword_ratio,
    )

    texts = ["the cat, and 42 dogs!", "no stops here", "", "a a a the the",
             "dup text", "dup text", "punct... only!?"]
    ds = rd.from_arrow(pa.table({
        "doc_id": list(range(len(texts))), "text": texts,
    }))
    got = add_bpe_token_count(ds).to_pandas().sort_values("doc_id")
    want = [len(re.findall(BPE_TOKEN_PATTERN, t)) for t in texts]
    assert got["n_bpe_tokens"].tolist() == want

    r = add_stopword_ratio(ds).to_pandas().sort_values("doc_id")
    for t, val in zip(texts, r["stopword_ratio"]):
        expect = round(len(re.findall(STOPWORD_PATTERN, t))
                       / len(t.split(" ")), 6)
        assert val == expect

    survivors = dedup_keep_first(ds, "doc_id").to_pandas()
    assert sorted(survivors["doc_id"]) == [0, 1, 2, 3, 4, 6]  # one dup dropped
    assert set(survivors["text"]) == set(texts)


# -- multimodal -------------------------------------------------------------

def test_media_decode_and_stages(ray_session, tmp_path):
    import ray.data as rd

    from fixtures.gen_media import ensure_media_parquet, media_row
    from rayxt.multimodal import decode_media, resize_images, sample_frames

    path = ensure_media_parquet(str(tmp_path / "media.parquet"), 30)
    ds = rd.read_parquet(path)
    out = decode_media(ds, concurrency=1).to_pandas()
    assert len(out) == 30
    assert (out["decode_status"] == "ok").all()
    assert (out["width"] == out["declared_w"]).all()
    assert (out["n_frames"] == out["declared_frames"]).all()
    assert "payload" not in out.columns  # heavy bytes dropped at decode

    resized = decode_media(
        resize_images(rd.read_parquet(path), 8, 8, concurrency=1), concurrency=1
    ).to_pandas()
    # PNG/JPEG images and RAYX video frames resize; audio and MJPEG-AVI
    # video (compressed — resize would force a lossy re-encode) pass
    # through unchanged
    from fixtures.gen_media import (_gif_spec, _is_avi_row, _is_gif_row,
                                    _is_mp4_row)

    def _passthrough(i):
        # compressed video, and animated GIFs (video-like), keep their
        # original payload; single-frame GIFs resize to PNG
        if _is_gif_row(i):
            return _gif_spec(i)[2] > 1
        return _is_avi_row(i) or _is_mp4_row(i)

    avi = resized["media_id"].map(_passthrough)
    vis = resized[(resized.kind != "audio") & ~avi]
    assert (vis["width"] == 8).all() and (vis["height"] == 8).all()
    kept = resized[avi].set_index("media_id")
    orig_avi = out[out["media_id"].map(_passthrough)].set_index("media_id")
    assert (kept["width"] == orig_avi["width"]).all()
    aud = resized[resized.kind == "audio"].set_index("media_id")
    orig_aud = out[out.kind == "audio"].set_index("media_id")
    assert (aud["width"] == orig_aud["width"]).all()

    sampled = decode_media(
        sample_frames(rd.read_parquet(path), stride=2, concurrency=1), concurrency=1
    ).to_pandas()
    vids = sampled[sampled.kind == "video"]
    orig = out[out.kind == "video"].set_index("media_id")
    for _, r in vids.iterrows():
        assert r["n_frames"] == (orig.loc[r["media_id"], "n_frames"] + 1) // 2


def test_media_gif_frame_sample(ray_session):
    """Animated-GIF frame sampling: container-level remux (no LZW
    re-encode) — engine == independent span-grouping oracle on every
    GIF fixture row at strides 1..3, single-frame GIFs byte-identical,
    and the sampled decode equals every stride-th source frame."""
    import numpy as np
    import ray.data as rd

    from fixtures.gen_media import _gif_spec, _is_gif_row, media_row
    from rayxt.multimodal import (_gif_frames, _gif_sample, decode_media,
                                  sample_frames)
    from tests.oracle.gif_oracle import oracle_gif_sample

    gif_ids = [i for i in range(120) if _is_gif_row(i)]
    assert len(gif_ids) >= 8
    rows = [media_row(i) for i in gif_ids]
    multi = 0
    for i, row in zip(gif_ids, rows):
        payload = row["payload"]
        for stride in (1, 2, 3):
            got = _gif_sample(payload, stride)
            assert got == oracle_gif_sample(payload, stride), (i, stride)
        n = _gif_spec(i)[2]
        if n == 1:
            assert _gif_sample(payload, 2) == payload  # verbatim
        else:
            multi += 1
            w, h, src = _gif_frames(payload)
            w2, h2, kept = _gif_frames(_gif_sample(payload, 2))
            assert (w2, h2) == (w, h)
            assert len(kept) == (n + 1) // 2
            for a, b in zip(kept, src[::2]):
                assert np.array_equal(a, b)
    assert multi >= 3  # the family actually exercises animations

    # through the distributed stage: animated rows halve, stills keep 1
    ds = rd.from_items(rows)
    before = decode_media(ds, concurrency=1).to_pandas() \
        .set_index("media_id")
    after = decode_media(sample_frames(ds, stride=2, concurrency=1),
                         concurrency=1).to_pandas().set_index("media_id")
    for i in gif_ids:
        assert after.loc[i, "n_frames"] == \
            (before.loc[i, "n_frames"] + 1) // 2


def test_media_avi_mjpeg_decode_and_sample(ray_session):
    """MJPEG-AVI: engine demux+decode == independent oracle == generator
    ground truth on fixture rows; frame sampling demuxes/re-muxes the
    untouched JPEG bytes; damaged payloads degrade to statuses."""
    import ray.data as rd

    from fixtures.gen_media import _is_avi_row, media_ground_truth, media_row
    from rayxt.multimodal import (_avi_frames, _decode_payload, decode_media,
                                  sample_frames)
    from tests.oracle.avi_oracle import oracle_avi_decode, oracle_avi_frames

    avi_ids = [i for i in range(60) if i % 3 == 2 and _is_avi_row(i)]
    assert len(avi_ids) >= 4
    rows = [media_row(i) for i in avi_ids]

    for i, row in zip(avi_ids, rows):
        gt = media_ground_truth(i)
        ew, eh, ef, em = _decode_payload(row["payload"])
        ow, oh, of, om = oracle_avi_decode(row["payload"])
        assert (ew, eh, ef, round(em, 6)) == (
            gt["width"], gt["height"], gt["n_frames"], gt["mean_value"])
        assert (ow, oh, of, round(om, 6)) == (ew, eh, ef, round(em, 6))

    # frame sampling: stride-2 keeps ceil(n/2) frames, and the kept
    # JPEG bytes are byte-identical to the source frames (no re-encode)
    ds = rd.from_items(rows)
    sampled = decode_media(
        sample_frames(ds, stride=2, concurrency=1), concurrency=1
    ).to_pandas().set_index("media_id")
    src_frames = {i: _avi_frames(r["payload"])[2]
                  for i, r in zip(avi_ids, rows)}
    for i in avi_ids:
        assert sampled.loc[i, "n_frames"] == (len(src_frames[i]) + 1) // 2
        assert sampled.loc[i, "decode_status"] == "ok"
    sampled_payloads = sample_frames(ds, stride=2, concurrency=1).to_pandas()
    for _, r in sampled_payloads.iterrows():
        kept = oracle_avi_frames(r["payload"])
        assert kept == src_frames[r["media_id"]][::2]

    # damaged container -> error; non-MJPG codec -> unsupported_codec
    broken = rows[0]["payload"][:40]
    alien = bytearray(rows[0]["payload"])
    alien[alien.index(b"MJPG"):alien.index(b"MJPG") + 4] = b"H264"
    bad = rd.from_items([
        dict(rows[0], media_id=900, payload=bytes(broken)),
        dict(rows[0], media_id=901, payload=bytes(alien)),
    ])
    out = decode_media(bad, concurrency=1).to_pandas().set_index("media_id")
    assert out.loc[900, "decode_status"] == "error"
    assert out.loc[901, "decode_status"] == "unsupported_codec"


def test_media_unsupported_codec_is_graceful(ray_session):
    import ray.data as rd

    from rayxt.multimodal import decode_media

    ds = rd.from_items(
        [{"media_id": 1, "kind": "image", "payload": b"\x89PNG\r\n" + b"x" * 64,
          "declared_w": 0, "declared_h": 0, "declared_frames": 0}]
    )
    out = decode_media(ds, concurrency=1).to_pandas()
    assert out["decode_status"].tolist() == ["unsupported_codec"]


def test_audio_features_match_independent_oracle(ray_session):
    """Engine features (own RIFF walk) == stdlib-wave oracle bit-for-bit
    on every fixture audio row; poison payloads become statuses."""
    import ray.data as rd

    from fixtures.gen_media import media_row
    from rayxt.multimodal import _audio_features, extract_audio_features
    from tests.oracle.audio_oracle import oracle_audio_features

    rows = [media_row(i) for i in range(90) if i % 3 == 1]
    assert len(rows) == 30
    for r in rows:
        assert _audio_features(r["payload"]) == \
            oracle_audio_features(r["payload"])

    import struct
    pcm8 = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)  # 8-bit PCM
            + b"data" + struct.pack("<I", 0))
    poisoned = rows + [
        dict(rows[0], media_id=900, payload=rows[0]["payload"][:30]),
        dict(rows[0], media_id=901, payload=pcm8),
    ]
    out = extract_audio_features(rd.from_items(poisoned), concurrency=1) \
        .to_pandas().set_index("media_id")
    for r in rows:
        want = oracle_audio_features(r["payload"])
        got = out.loc[r["media_id"]]
        assert got["audio_status"] == "ok"
        for k, v in want.items():
            assert got[k] == v, (r["media_id"], k)
    assert out.loc[900, "audio_status"] == "error"
    assert out.loc[901, "audio_status"] == "unsupported_codec"
    assert out.loc[901, "rms"] == 0.0


def test_phash_matches_naive_oracle():
    """Integer-DCT pHash: vectorized engine == per-coefficient Python
    oracle on grey/RGB/RGBA images of odd sizes (exact integer spec —
    no tolerance), and a uniform brightness shift is hash-invariant."""
    import numpy as np

    from rayxt.multimodal import phash64_of_array
    from tests.oracle.phash_oracle import oracle_phash

    rng = np.random.RandomState(7)
    for trial in range(10):
        h, w = rng.randint(8, 70), rng.randint(8, 70)
        ch = [None, 1, 3, 4][trial % 4]
        shape = (h, w) if ch is None else (h, w, ch)
        img = rng.randint(0, 256, shape).astype(np.uint8)
        assert phash64_of_array(img) == oracle_phash(img.tolist())

    img = rng.randint(10, 240, (40, 40, 3)).astype(np.uint8)  # no clipping
    shifted = (img.astype(np.int64) + 5).astype(np.uint8)
    # +5 moves only the DC coefficient; all compared bits use the
    # non-DC median, so the hash's non-DC bits are unchanged
    d = (phash64_of_array(img) ^ phash64_of_array(shifted)) \
        & 0x7FFFFFFFFFFFFFFF
    assert bin(d & ((1 << 63) - 1)).count("1") <= 1


def test_image_neardup_banded_equals_bruteforce(ray_session):
    """End-to-end: engine pHash over encoded payloads == oracle ground
    truth, and the banded hamming join == brute-force all-pairs (exact
    by pigeonhole for max_hamming < bands)."""
    import ray.data as rd

    from fixtures.gen_media import (generate_phash_media_table,
                                    phash_ground_truth_hash)
    from rayxt.multimodal import image_neardup_pairs, phash_images
    from tests.oracle.phash_oracle import oracle_hamming_pairs

    n = 60
    tbl = generate_phash_media_table(n)
    truth = {j: phash_ground_truth_hash(j) for j in range(n)}

    hashed = phash_images(rd.from_arrow(tbl), concurrency=1).to_pandas()
    assert (hashed["phash_status"] == "ok").all()
    assert {r.media_id: r.phash for r in hashed.itertuples()} == truth

    got = image_neardup_pairs(rd.from_arrow(tbl), max_hamming=7,
                              concurrency=1).to_pandas()
    got_pairs = sorted(map(tuple, got[["id_a", "id_b", "hamming"]].values))
    want = oracle_hamming_pairs(list(truth), list(truth.values()), 7)
    assert got_pairs == [tuple(map(int, p)) for p in want]
    assert len(got_pairs) > 0


def test_hamming_pairs_banded_equals_bruteforce(ray_session):
    """Generic hamming_pairs on a raw int64 hash column: banded == brute
    force for max_hamming < bands, including planted near-collisions."""
    import numpy as np
    import ray.data as rd

    from rayxt.dedup import hamming_pairs
    from tests.oracle.phash_oracle import oracle_hamming_pairs

    rng = np.random.RandomState(3)
    hashes = rng.randint(-2**63, 2**63, 50, dtype=np.int64).tolist()
    for i in range(0, 20, 2):  # plant near-dups at distances 0..4
        flip = int(hashes[i])
        for b in rng.choice(64, size=i % 5, replace=False):
            flip ^= 1 << int(b)
        flip &= 0xFFFFFFFFFFFFFFFF
        hashes[i + 1] = flip - (1 << 64) if flip >= (1 << 63) else flip
    ids = list(range(50))
    ds = rd.from_items([{"id": i, "h": h} for i, h in zip(ids, hashes)])
    got = hamming_pairs(ds, "id", "h", bands=8, max_hamming=7).to_pandas()
    got_pairs = sorted(map(tuple, got[["id_a", "id_b", "hamming"]].values))
    want = oracle_hamming_pairs(ids, hashes, 7)
    assert got_pairs == [tuple(map(int, p)) for p in want]
    assert len(got_pairs) >= 10

    import pytest as _pytest
    with _pytest.raises(ValueError, match="divide"):
        hamming_pairs(ds, "id", "h", bands=7)


def test_connected_components(ray_session):
    import ray.data as rd

    from rayxt.dedup import connected_components

    # two components: {1,2,3,4} via chain, {10,11}
    pairs = rd.from_items(
        [
            {"id_a": 1, "id_b": 2},
            {"id_a": 2, "id_b": 3},
            {"id_a": 3, "id_b": 4},
            {"id_a": 10, "id_b": 11},
        ]
    )
    out = connected_components(pairs).to_pandas().sort_values("id")
    got = dict(zip(out["id"], out["cluster_id"]))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_tfidf_top_terms(ray_session):
    import math

    import ray.data as rd

    from rayxt.text import tfidf_top_terms

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "apple banana apple cherry",
            "banana banana cherry",
            "",                      # zero tokens: contributes no rows
            "Apple APPLE zz9",       # case folds into 'apple'; rare 'zz9'
            "cherry cherry cherry",
        ],
    })
    n = len(docs)
    got = tfidf_top_terms(
        rd.from_pandas(docs).repartition(3), n_docs=n, id_col="doc_id",
        text_col="text", k=1,
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)

    # brute force: ASCII token runs, lowercased, tf * ln(N/df)
    import re as _re
    toks = {r.doc_id: [w.lower() for w in _re.findall("[A-Za-z0-9]+", r.text)]
            for r in docs.itertuples()}
    df = {}
    for ws in toks.values():
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    want = {}
    for did, ws in toks.items():
        if not ws:
            continue
        scores = {w: round(ws.count(w) * math.log(n / df[w]), 6)
                  for w in set(ws)}
        best = min(scores, key=lambda w: (-scores[w], w))  # ties: lexic.
        want[did] = (best, scores[best])

    assert got["doc_id"].tolist() == sorted(want)  # doc 3 absent
    for _, r in got.iterrows():
        assert (r["term"], r["tfidf"]) == want[r["doc_id"]], r["doc_id"]
    # doc 4: 'apple' (tf=2, df=2) must beat 'zz9' (tf=1, df=1) here
    assert got.set_index("doc_id").loc[4, "term"] == "apple"


def test_grouped_mode_ties_and_partition_independence(ray_session):
    import ray.data as rd

    from rayxt.windows import grouped_mode

    df = pd.DataFrame({
        "u": [1, 1, 1, 2, 2, 3, 3, 3, 3],
        "t": ["a", "b", "b", "c", "a", "z", "y", "z", "y"],
    })
    for parts in (1, 4):
        out = grouped_mode(rd.from_pandas(df).repartition(parts), key="u",
                           value_col="t", out_col="m", count_col="n"
                           ).to_pandas().sort_values("u").reset_index(drop=True)
        # u=2 ties 1-1 -> 'a'; u=3 ties 2-2 -> 'y'
        assert out.to_dict("records") == [
            {"u": 1, "m": "b", "n": 2}, {"u": 2, "m": "a", "n": 1},
            {"u": 3, "m": "y", "n": 2}]


def test_stratified_sample_is_per_stratum_hash_sample(ray_session):
    import ray.data as rd

    from rayxt.sampling import hash_sample_int, stratified_hash_sample

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "id": np.arange(4000),
        "s": rng.choice(["en", "de", "xx"], size=4000),
    })
    rates = {"en": 0.1, "de": 0.5}
    got = stratified_hash_sample(
        rd.from_pandas(df).repartition(5), "id", "s", rates,
        default_rate=0.0).to_pandas().sort_values("id").reset_index(drop=True)
    # equivalent to running the flat sampler per stratum; 'xx' dropped
    parts = []
    for s, r in rates.items():
        sub = df[df["s"] == s]
        parts.append(hash_sample_int(
            rd.from_pandas(sub), "id", r).to_pandas())
    want = (pd.concat(parts).sort_values("id").reset_index(drop=True))
    assert got["id"].tolist() == want["id"].tolist()
    assert (got["s"] != "xx").all() and len(got) > 0


def test_top_ngrams_matches_bruteforce(ray_session):
    import re as _re
    from collections import Counter

    import ray.data as rd

    from rayxt.text import top_ngrams

    rng = np.random.default_rng(17)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 30)))
             for _ in range(200)]
    df = pd.DataFrame({"doc_id": range(200), "text": texts})
    got = top_ngrams(rd.from_pandas(df).repartition(6), text_col="text",
                     n=2, k=5)

    cnt = Counter()
    for t in texts:
        ws = [w.lower() for w in _re.findall("[A-Za-z0-9]+", t)]
        cnt.update(" ".join(p) for p in zip(ws, ws[1:]))
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(zip(got["ngram"], got["n"])) == want


def test_tfidf_join_path_matches_broadcast(ray_session):
    """The open-vocabulary hash-join path must produce exactly the
    broadcast path's output (same float64 op sequence)."""
    import ray.data as rd

    from rayxt.text import tfidf_top_terms

    rng = np.random.default_rng(29)
    vocab = [f"w{i}" for i in range(60)]
    docs = pd.DataFrame({
        "doc_id": range(150),
        "text": [" ".join(rng.choice(vocab, size=rng.integers(1, 40)))
                 for _ in range(150)],
    })
    ds = rd.from_pandas(docs).repartition(5)
    a = (tfidf_top_terms(ds, n_docs=150, k=2)
         .to_pandas().sort_values(["doc_id", "term"]).reset_index(drop=True))
    b = (tfidf_top_terms(ds, n_docs=150, k=2, join_path=True,
                         join_partitions=3)
         .to_pandas().sort_values(["doc_id", "term"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert len(a) > 0


def test_grouped_corr_matches_pandas(ray_session):
    import ray.data as rd

    from rayxt.stats import grouped_corr

    rng = np.random.default_rng(31)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], size=400),
        "x": rng.random(400) * 50,
        "y": rng.random(400) * 10,
    })
    # make one key genuinely correlated, one key degenerate (n=1)
    df.loc[df.k == "a", "y"] = df.loc[df.k == "a", "x"] * 0.5 + 1
    df = pd.concat([df, pd.DataFrame({"k": ["solo"], "x": [1.0],
                                      "y": [2.0]})], ignore_index=True)
    out = grouped_corr(rd.from_pandas(df).repartition(5),
                       key="k", x_col="x", y_col="y").set_index("k")
    want = df.groupby("k").apply(
        lambda g: g["x"].corr(g["y"]), include_groups=False)
    for k in ("a", "b", "c"):
        assert abs(out.loc[k, "corr"] - round(want[k], 6)) <= 1e-6, k
    assert np.isnan(out.loc["solo", "corr"])
    assert out.loc["a", "corr"] == 1.0


def test_zscore_matches_pandas(ray_session):
    import ray.data as rd

    from rayxt.stats import zscore

    rng = np.random.default_rng(37)
    df = pd.DataFrame({
        "rid": range(300),
        "k": rng.choice(["a", "b"], size=300),
        "v": rng.random(300) * 100,
    })
    out = (zscore(rd.from_pandas(df).repartition(5), key="k",
                  value_col="v", keep_cols=("rid",))
           .to_pandas().sort_values("rid").reset_index(drop=True))
    g = df.groupby("k")["v"]
    want = (df["v"] - df["k"].map(g.mean())) / df["k"].map(g.std(ddof=1))
    assert np.allclose(out["z"], np.round(want, 6), atol=2e-6)


def test_broadcast_semi_filter_matches_isin(ray_session):
    import ray.data as rd

    from rayxt.joins import broadcast_semi_filter

    big = pd.DataFrame({"id": range(200), "val": range(200)})
    small = pd.DataFrame({"fk": [3, 3, 7, 150, 199, 400]})
    semi = broadcast_semi_filter(
        rd.from_pandas(big).repartition(4), rd.from_pandas(small),
        key_col="id", keys_key="fk").to_pandas()
    assert sorted(semi["id"]) == [3, 7, 150, 199]
    anti = broadcast_semi_filter(
        rd.from_pandas(big).repartition(4), rd.from_pandas(small),
        key_col="id", keys_key="fk", negate=True).to_pandas()
    assert len(anti) == 196 and 3 not in set(anti["id"])


def test_streaming_dedup_first_seen_index(ray_session):
    import ray.data as rd

    from rayxt.state import streaming_dedup

    rng = np.random.default_rng(41)
    keys = rng.integers(0, 120, size=1000)
    df = pd.DataFrame({"k": [f"key-{k}" for k in keys],
                       "payload": np.arange(1000)})
    ds = rd.from_pandas(df).repartition(8)
    deduped, dd = streaming_dedup(ds, key_col="k", n_shards=3,
                                  batch_size=64)
    out = deduped.to_pandas()
    # the distinct key set is deterministic; the surviving rows are not
    assert sorted(out["k"].unique()) == sorted(df["k"].unique())
    assert len(out) == df["k"].nunique()  # exactly one row per key
    assert dd.total_seen() == df["k"].nunique()
    # second pass through the SAME index drops everything
    again, _ = (ds.map_batches(dd.filter_batch, batch_format="pyarrow",
                               batch_size=64), dd)
    assert again.count() == 0


def test_add_json_int_field(ray_session):
    import ray.data as rd

    from rayxt.text import add_json_int_field

    df = pd.DataFrame({"props": ['{"k": 12, "j": 1}', '{"j": 2}',
                                 '{"k": -3}', '{"k":7}']})
    out = add_json_int_field(rd.from_pandas(df), col="props", field="k",
                             out="k").to_pandas()
    assert out["k"].tolist()[0] == 12
    assert pd.isna(out["k"][1])  # missing field -> null
    assert out["k"].tolist()[2] == -3
    assert out["k"].tolist()[3] == 7  # no space after colon


def test_char_entropy_and_url_parts(ray_session):
    import math

    import ray.data as rd

    from rayxt.text import add_char_entropy, add_url_parts, char_entropy_of

    assert char_entropy_of("aabb") == 1.0
    assert char_entropy_of("") == 0.0
    # uniform over 4 symbols -> 2 bits
    assert abs(char_entropy_of("abcd") - 2.0) < 1e-12

    df = pd.DataFrame({"url": ["https://a.example.com/x/y?q=1#frag",
                               "http://b.org/"],
                       "text": ["aabb", "abcd"]})
    out = add_url_parts(
        add_char_entropy(rd.from_pandas(df))).to_pandas()
    out = out.sort_values("url").reset_index(drop=True)
    assert out.loc[1, "scheme"] == "https"
    assert out.loc[1, "host"] == "a.example.com"
    assert out.loc[1, "path"] == "/x/y"
    assert out.loc[0, "path"] == "/"
    assert out.loc[0, "char_entropy"] == 2.0


def test_normalize_text(ray_session):
    """NFC + whitespace canonicalization: Arrow kernels == Python
    restatement (unicodedata.normalize + split/join) on unicode and
    whitespace edge cases."""
    import unicodedata

    import ray.data as rd

    from rayxt.text import normalize_text

    cases = [
        "étude  du\tmatin\n",      # combining acute -> é (NFC)
        "  plain   text  ",
        "\t\n mixed\r\nws \f",
        "",
        "already clean",
        "café déjà",       # precomposed stays
        "Å ring",              # A + ring -> Å
    ]
    df = pd.DataFrame({"doc_id": range(len(cases)), "text": cases})
    out = normalize_text(rd.from_pandas(df)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for i, s in enumerate(cases):
        want = unicodedata.normalize("NFC", " ".join(s.split()))
        assert out.loc[i, "text_norm"] == want, i


def test_paragraph_dedup(ray_session):
    """Corpus-wide paragraph dedup == brute-force Python restatement,
    on BOTH the broadcast-anti path and the hash-join fallback; dup-free
    input passes through; a doc whose every line is duplicated drops."""
    import ray.data as rd

    from rayxt.dedup import paragraph_dedup

    docs = {
        1: "alpha\nshared one\nbeta",
        2: "gamma\nshared one\ndelta\nshared two",
        3: "shared two\nepsilon",
        4: "shared one\nshared two",          # all lines duplicated -> drops
        5: "self\nself\nzeta",                # within-doc duplicate counts
        6: "unique only",
    }

    def brute(docs, min_count=2):
        from collections import Counter
        c = Counter(p for t in docs.values() for p in t.split("\n"))
        out = {}
        for k, t in docs.items():
            keep = [p for p in t.split("\n") if c[p] < min_count]
            if keep:
                out[k] = ("\n".join(keep), len(keep))
        return out

    want = brute(docs)
    assert 4 not in want and want[5] == ("zeta", 1)  # fixture sanity

    ds = rd.from_items([{"doc_id": k, "text": t} for k, t in docs.items()])
    for thr in (5_000_000, 0):  # broadcast path / hash-join path
        got = paragraph_dedup(ds, "doc_id", broadcast_threshold=thr) \
            .to_pandas().set_index("doc_id")
        assert {k: (r["text_dedup"], r["n_paras"])
                for k, r in got.iterrows()} == want, thr

    clean = rd.from_items([{"doc_id": 1, "text": "a\nb"},
                           {"doc_id": 2, "text": "c"}])
    got = paragraph_dedup(clean, "doc_id").to_pandas().set_index("doc_id")
    assert got.loc[1, "text_dedup"] == "a\nb" and got.loc[2, "n_paras"] == 1


def test_inverted_index(ray_session):
    """term -> (df, tf, ascending postings) == brute-force restatement;
    case folding, multi-occurrence tf, and bucket-count invariance."""
    import ray.data as rd

    from rayxt.text import inverted_index

    docs = {1: "Apple banana apple", 2: "banana cherry",
            3: "APPLE cherry cherry 42", 4: ""}

    def brute(docs):
        import re
        from collections import Counter, defaultdict
        tf = defaultdict(Counter)
        for d, t in docs.items():
            for w in re.findall(r"[A-Za-z0-9]+", t):
                tf[w.lower()][d] += 1
        return {
            term: (len(c), sum(c.values()),
                   ",".join(str(d) for d in sorted(c)))
            for term, c in tf.items()
        }

    want = brute(docs)
    assert want["apple"] == (2, 3, "1,3") and want["42"] == (1, 1, "3")

    ds = rd.from_items([{"doc_id": k, "text": t} for k, t in docs.items()])
    for buckets in (64, 1):
        got = inverted_index(ds, buckets=buckets).to_pandas()
        got_map = {r.term: (int(r.df), int(r.tf), r.postings)
                   for r in got.itertuples()}
        assert got_map == want, buckets


def test_pca_project_matches_oracle_any_batching(ray_session):
    """Distributed moment-partial PCA == naive full-matrix oracle
    bit-for-bit (after the spec's rounding) under adversarial batch
    sizes, and projections capture descending variance."""
    import ray.data as rd

    from rayxt.ann import pca_project
    from tests.oracle.sketches import oracle_pca

    rng = np.random.RandomState(11)
    # anisotropic cloud: distinct eigenvalues by construction
    base = rng.randn(300, 8) * np.array([5, 3, 2, 1.2, .8, .5, .3, .1])
    rows = [{"vec_id": i, "embedding": base[i].astype(np.float32).tolist()}
            for i in range(300)]
    want = oracle_pca([r["vec_id"] for r in rows],
                      [r["embedding"] for r in rows], k=3)

    ds = rd.from_items(rows)
    for bs in (17, 300):
        got = pca_project(
            ds.map_batches(lambda t: t, batch_size=bs,
                           batch_format="pyarrow"),
            k=3).to_pandas().set_index("vec_id")
        bad = [i for i, r in got.iterrows()
               if [r.pc1, r.pc2, r.pc3] != want[i]]
        assert not bad, (bs, bad[:3])

    var = got[["pc1", "pc2", "pc3"]].var().to_numpy()
    assert var[0] > var[1] > var[2]


def test_dup_ngram_stats(ray_session):
    """Duplicated-span stats == Python-int oracle on both the broadcast
    path and the join fallback; within-doc repeats count; short docs get
    one whole-doc window; zero-token docs are absent."""
    import ray.data as rd

    from rayxt.dedup import dup_ngram_stats
    from tests.oracle.sketches import oracle_dup_ngram_stats

    docs = {
        1: "a b c d e f",      # shares the c-d-e-f window with doc 2
        2: "c d e f g h",
        3: "solo words here",  # < n tokens: one whole-doc window
        4: "",
        5: "a b c d e f",      # exact dup of doc 1
        6: "r r r r r r r r",  # within-doc repeated windows
    }
    want = oracle_dup_ngram_stats(list(docs), list(docs.values()), n=4)
    assert 4 not in want and want[3] == (1, 0, 0.0)
    assert want[6][1] == want[6][0]  # all windows self-duplicated

    ds = rd.from_items([{"doc_id": k, "text": t} for k, t in docs.items()])
    for thr in (5_000_000, 0):
        got = dup_ngram_stats(ds, "doc_id", n=4, broadcast_threshold=thr) \
            .to_pandas().set_index("doc_id")
        got_map = {k: (int(r["n_windows"]), int(r["n_dup_windows"]),
                       r["dup_fraction"]) for k, r in got.iterrows()}
        assert got_map == want, thr


def test_canonicalize_url(ray_session):
    """Engine (single RE2 decomposition) == urllib-based oracle on the
    messy fixture family plus handwritten edges; non-URLs pass through."""
    import ray.data as rd

    from fixtures.gen_pages import messy_url_of
    from rayxt.text import canonicalize_url
    from tests.oracle.url_oracle import oracle_canonicalize_url

    urls = [messy_url_of(i) for i in range(150)] + [
        "HTTP://A.B:80/",              # default port dropped
        "http://a.b:443/x",            # non-default port for http kept
        "https://a.b/?utm_source=x",   # all params tracking -> no '?'
        "https://a.b/p?a=1&utm_x=2&b=3#f",
        "not a url",
        "ftp://Host/Path",             # non-http scheme: policy still applies
    ]
    ds = rd.from_items([{"url_id": i, "url": u} for i, u in enumerate(urls)])
    got = canonicalize_url(ds).to_pandas().set_index("url_id")
    for i, u in enumerate(urls):
        assert got.loc[i, "url_canon"] == oracle_canonicalize_url(u), u
    assert got.loc[len(urls) - 2, "url_canon"] == "not a url"


def test_bpe_train_and_apply(ray_session):
    """Distributed BPE training == naive full-scan restatement (exact
    merge sequence incl. lexicographic tie-breaks) for any batching;
    the BpeApply actor stage reproduces the naive per-word encode."""
    import ray.data as rd

    from rayxt.bpe import bpe_token_counts, bpe_train
    from tests.oracle.sketches import (oracle_bpe_token_counts,
                                       oracle_bpe_train)

    texts = (["low low low lower lowest", "new newer newest wide wider",
              "ab ab abc", ""] * 10)[:-1] + ["tie tei"]  # tie-break case
    ids = list(range(len(texts)))
    want = oracle_bpe_train(texts, n_merges=12)
    assert len(want) == 12 and want[0][0] == 0

    ds = rd.from_items([{"doc_id": i, "text": t}
                        for i, t in zip(ids, texts)])
    for bs in (3, 200):
        batched = ds.map_batches(lambda t: t, batch_size=bs,
                                 batch_format="pyarrow")
        m = bpe_train(batched, n_merges=12)
        got = list(zip(m["rank"].to_pylist(), m["left"].to_pylist(),
                       m["right"].to_pylist(), m["count"].to_pylist()))
        assert got == want, bs

    cnt = bpe_token_counts(ds, m, concurrency=1).to_pandas() \
        .set_index("doc_id")["n_bpe_learned"].to_dict()
    assert cnt == oracle_bpe_token_counts(ids, texts, want)
    # merged symbols shrink the count below the char count
    assert cnt[0] < sum(len(w) for w in texts[0].split())


def test_chunk_documents(ray_session):
    """Chunking == brute-force restatement (python-split spec, incl.
    multi-space/short/empty docs); overlap window sizes verified."""
    import ray.data as rd

    from rayxt.text import chunk_documents

    texts = {1: " ".join(f"w{i}" for i in range(50)),
             2: "a  b   c", 3: "solo", 4: ""}

    def brute(texts, max_tokens=8, overlap=3):
        stride = max_tokens - overlap
        out = []
        for k, t in texts.items():
            toks = t.split()
            for s in range(0, len(toks), stride):
                piece = toks[s:s + max_tokens]
                out.append((k, s // stride, " ".join(piece), len(piece)))
        return sorted(out)

    want = brute(texts)
    assert (4, 0, "", 0) not in want  # empty doc: no chunks
    assert [w for w in want if w[0] == 3] == [(3, 0, "solo", 1)]

    ds = rd.from_items([{"doc_id": k, "text": t} for k, t in texts.items()])
    got = chunk_documents(ds, max_tokens=8, overlap=3).to_pandas()
    got_rows = sorted((int(r.doc_id), int(r.chunk_idx), r.chunk_text,
                       int(r.n_tokens)) for r in got.itertuples())
    assert got_rows == want
    # neighboring chunks share exactly `overlap` tokens
    c0, c1 = got_rows[0][2].split(), got_rows[1][2].split()
    assert c0[-3:] == c1[:3]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(ds, max_tokens=8, overlap=8)


def test_logreg_train_and_predict(ray_session):
    """Distributed GD == naive full-matrix oracle exactly (per-iteration
    rounding), any batching; the classifier actually separates a
    separable synthetic set; predict matches the oracle scores."""
    import ray.data as rd

    from rayxt.stats import logreg_predict, logreg_train
    from tests.oracle.sketches import oracle_logreg, oracle_logreg_scores

    rng = np.random.RandomState(5)
    x1 = np.concatenate([rng.randn(150) - 2.0, rng.randn(150) + 2.0])
    x2 = rng.randn(300)
    y = np.concatenate([np.zeros(150), np.ones(150)])
    want = oracle_logreg([x1, x2], y, iters=30, lr=1.0)

    rows = [{"i": i, "x1": float(x1[i]), "x2": float(x2[i]),
             "y": float(y[i])} for i in range(300)]
    ds = rd.from_items(rows)
    for bs in (32, 300):
        b = ds.map_batches(lambda t: t, batch_size=bs, batch_format="pyarrow")
        w = logreg_train(b, feature_cols=["x1", "x2"], label_col="y",
                         iters=30, lr=1.0)
        assert w == want, bs
    assert want[1] > 1.0  # x1 separates the classes

    scored = logreg_predict(ds, want, feature_cols=["x1", "x2"]) \
        .to_pandas().sort_values("i")
    assert scored["score"].tolist() == oracle_logreg_scores([x1, x2], want)
    acc = ((scored["score"] > 0.5).astype(float) == y).mean()
    assert acc > 0.9


def test_incremental_group_stats(ray_session, tmp_path):
    """Append-only incremental aggregation: result == full recompute at
    every step; old files are never reprocessed (their partials stay
    byte-identical and n_new counts only arrivals); idempotent rerun."""
    import pyarrow.parquet as _pq

    from rayxt.incremental import incremental_group_stats

    data_dir = tmp_path / "in"
    data_dir.mkdir()
    state = str(tmp_path / "state")

    def write(name, langs, chars):
        _pq.write_table(pa.table({"lang": pa.array(langs, pa.string()),
                                  "n_chars": pa.array(chars, pa.int64())}),
                        str(data_dir / name))

    def full():
        tabs = [_pq.read_table(str(p)).to_pandas()
                for p in sorted(data_dir.iterdir())]
        df = pd.concat(tabs, ignore_index=True)
        out = df.groupby("lang", as_index=False).agg(
            n=("n_chars", "size"), s=("n_chars", "sum"))
        return out.sort_values("lang").reset_index(drop=True)

    write("a.parquet", ["en", "en", "de"], [10, 20, 5])
    write("b.parquet", ["en", "fr"], [1, 2])
    got, n_new = incremental_group_stats(str(data_dir), state,
                                         key_col="lang", sum_col="n_chars")
    assert n_new == 2
    assert got[["lang", "n", "s"]].astype({"s": "int64"}).equals(
        full().astype({"s": "int64"}))

    import os
    partials = sorted(os.listdir(os.path.join(state, "partials")))
    stamps = {f: os.path.getmtime(os.path.join(state, "partials", f))
              for f in partials}

    write("c.parquet", ["de", "de"], [7, 8])
    got2, n_new2 = incremental_group_stats(str(data_dir), state,
                                           key_col="lang", sum_col="n_chars")
    assert n_new2 == 1  # only the arrival was processed
    assert got2[["lang", "n", "s"]].astype({"s": "int64"}).equals(
        full().astype({"s": "int64"}))
    for f, ts in stamps.items():  # old partials untouched
        assert os.path.getmtime(os.path.join(state, "partials", f)) == ts

    got3, n_new3 = incremental_group_stats(str(data_dir), state,
                                           key_col="lang", sum_col="n_chars")
    assert n_new3 == 0 and got3.equals(got2)  # idempotent rerun


def test_incremental_group_stats_edge_cases(ray_session, tmp_path):
    """Review-found failure modes pinned: zero-row files get a seen
    marker (no eternal reprocessing, no crash), in-place rewrites
    invalidate the stale partial (no double count), same-basename
    files in different dirs don't collide, format mismatches rebuild."""
    import os

    import pyarrow.parquet as _pq

    from rayxt.incremental import incremental_group_stats

    d1 = tmp_path / "d1"; d1.mkdir()
    d2 = tmp_path / "d2"; d2.mkdir()
    state = str(tmp_path / "state")

    def write(p, langs, chars):
        _pq.write_table(pa.table({"lang": pa.array(langs, pa.string()),
                                  "n_chars": pa.array(chars, pa.int64())}),
                        str(p))

    # zero-row file: processed once, then seen; merge never crashes
    write(d1 / "a.parquet", [], [])
    got, n = incremental_group_stats(str(d1), state, key_col="lang",
                                     sum_col="n_chars")
    assert n == 1 and len(got) == 0
    got, n = incremental_group_stats(str(d1), state, key_col="lang",
                                     sum_col="n_chars")
    assert n == 0 and len(got) == 0

    # in-place rewrite (size change): stale partial invalidated
    write(d1 / "a.parquet", ["en"], [5])
    got, n = incremental_group_stats(str(d1), state, key_col="lang",
                                     sum_col="n_chars")
    assert n == 1 and got.loc[0, "n"] == 1 and got.loc[0, "s"] == 5
    write(d1 / "a.parquet", ["en", "en"], [5, 7])
    got, n = incremental_group_stats(str(d1), state, key_col="lang",
                                     sum_col="n_chars")
    assert n == 1
    assert got.loc[0, "n"] == 2 and got.loc[0, "s"] == 12  # not 3/17

    # same basename + same size in two dirs: both counted
    state2 = str(tmp_path / "state2")
    write(d1 / "p.parquet", ["de"], [1])
    write(d2 / "p.parquet", ["fr"], [2])
    assert os.path.getsize(d1 / "p.parquet") == os.path.getsize(d2 / "p.parquet")
    got, n = incremental_group_stats(
        [str(d1 / "p.parquet"), str(d2 / "p.parquet")], state2,
        key_col="lang", sum_col="n_chars")
    assert n == 2 and sorted(got["lang"]) == ["de", "fr"]

    # unknown state format: rebuilt, not merged
    with open(os.path.join(state2, "FORMAT"), "w") as fh:
        fh.write("0")
    got2, n2 = incremental_group_stats(
        [str(d1 / "p.parquet"), str(d2 / "p.parquet")], state2,
        key_col="lang", sum_col="n_chars")
    assert n2 == 2 and got2.equals(got)


def test_decontaminate(ray_session):
    """Engine flags == python-int oracle on planted overlaps: eval
    13-gram (here 4-gram) windows anywhere in a doc flag it; clean and
    empty docs stay clean; eval members self-flag."""
    import ray.data as rd

    from rayxt.dedup import decontaminate
    from tests.oracle.sketches import oracle_decontaminate

    evals = ["the quick brown fox jumps", "pack my box with five dozen"]
    docs = {
        1: "prefix words the quick brown fox jumps and more",  # overlap
        2: "totally unrelated text with no shared windows at all",
        3: "pack my box with five dozen liquor jugs",          # overlap
        4: "",
        5: "the quick brown fox jumps",                        # == eval
        6: "quick brown fox",                                  # < n: whole-doc window, no match
    }
    want = oracle_decontaminate(list(docs), list(docs.values()), evals, n=4)
    assert want[1][1] and want[3][1] and want[5][1]
    assert not want[2][1] and not want[6][1]
    assert 4 in want and want[4] == (0, False)  # empty doc: a row, clean

    ds = rd.from_items([{"doc_id": k, "text": t} for k, t in docs.items()])
    got = decontaminate(ds, evals, "doc_id", n=4).to_pandas() \
        .set_index("doc_id")
    got_map = {k: (int(r["n_overlap_windows"]), bool(r["contaminated"]))
               for k, r in got.iterrows()}
    assert got_map == want


def test_winsorize(ray_session):
    """Sketch-clip == oracle bounds + plain clip for any batching;
    tails actually clip, the middle passes through; empty input
    passes values through."""
    import ray.data as rd

    from rayxt.stats import winsorize
    from tests.oracle.sketches import ddsketch_group_quantiles

    rng = np.random.RandomState(2)
    vals = np.concatenate([rng.uniform(1, 100, 500),
                           [0.001, 0.002, 5000.0, 9000.0]])  # fat tails
    lo, hi = ddsketch_group_quantiles(
        (("all", v) for v in vals), qs=(0.05, 0.95), alpha=0.01)["all"]
    want = np.round(np.clip(vals, lo, hi), 6)

    rows = [{"i": i, "value": float(v)} for i, v in enumerate(vals)]
    ds = rd.from_items(rows)
    for bs in (37, 504):
        b = ds.map_batches(lambda t: t, batch_size=bs, batch_format="pyarrow")
        got = winsorize(b, value_col="value", q_lo=0.05, q_hi=0.95) \
            .to_pandas().sort_values("i")
        assert got["value_w"].tolist() == want.tolist(), bs
    assert got["value_w"].max() < 9000.0 and got["value_w"].min() > 0.001


def test_media_mp4_mjpeg_decode_and_sample(ray_session):
    """MJPEG-in-MP4 (ISO-BMFF): engine box-walk demux+decode ==
    independent flat-scan oracle == generator ground truth; frame
    sampling re-muxes the untouched JPEG bytes; non-MJPEG codecs map
    to unsupported_codec."""
    import ray.data as rd

    from fixtures.gen_media import _is_mp4_row, media_ground_truth, media_row
    from rayxt.multimodal import (_decode_payload, _mp4_frames, decode_media,
                                  sample_frames)
    from tests.oracle.mp4_oracle import oracle_mp4_decode, oracle_mp4_frames

    mp4_ids = [i for i in range(60) if _is_mp4_row(i)]
    assert len(mp4_ids) >= 4
    rows = [media_row(i) for i in mp4_ids]

    for i, row in zip(mp4_ids, rows):
        gt = media_ground_truth(i)
        ew, eh, ef, em = _decode_payload(row["payload"])
        ow, oh, of, om = oracle_mp4_decode(row["payload"])
        assert (ew, eh, ef, round(em, 6)) == (
            gt["width"], gt["height"], gt["n_frames"], gt["mean_value"])
        assert (ow, oh, of, round(om, 6)) == (ew, eh, ef, round(em, 6))

    # frame sampling keeps ceil(n/2) frames, bytes untouched
    ds = rd.from_items(rows)
    sampled = decode_media(
        sample_frames(ds, stride=2, concurrency=1), concurrency=1
    ).to_pandas().set_index("media_id")
    src_frames = {i: _mp4_frames(r["payload"])[3]
                  for i, r in zip(mp4_ids, rows)}
    for i in mp4_ids:
        assert sampled.loc[i, "n_frames"] == (len(src_frames[i]) + 1) // 2
        assert sampled.loc[i, "decode_status"] == "ok"
    sampled_payloads = sample_frames(ds, stride=2, concurrency=1).to_pandas()
    for _, r in sampled_payloads.iterrows():
        kept = oracle_mp4_frames(r["payload"])
        assert kept == src_frames[r["media_id"]][::2]

    # patent codec -> unsupported_codec, truncated container -> error
    alien = rows[0]["payload"].replace(b"jpeg", b"avc1", 1)
    bad = rd.from_items([
        {"media_id": 0, "kind": "video", "payload": alien,
         "declared_w": 1, "declared_h": 1, "declared_frames": 1},
        {"media_id": 1, "kind": "video", "payload": rows[0]["payload"][:60],
         "declared_w": 1, "declared_h": 1, "declared_frames": 1},
    ])
    st = decode_media(bad, concurrency=1).to_pandas().set_index("media_id")
    assert st.loc[0, "decode_status"] == "unsupported_codec"
    assert st.loc[1, "decode_status"] == "error"


def test_profile_table_matches_pandas(ray_session):
    """ANALYZE-style profile == pandas brute force: numerics by value,
    strings by length, nulls counted, exact distinct, partitioning-
    independent."""
    import ray.data as rd

    from rayxt.stats import profile_table

    df = pd.DataFrame({
        "x": [1.5, 2.5, None, 2.5, -7.0, 0.0],
        "s": ["a", None, "abc", "abc", "", "zz"],
        "k": pd.array([3, 3, 1, None, 2, 2], dtype="Int64"),
    })
    got = profile_table(rd.from_pandas(df).repartition(3),
                        columns=["x", "s", "k"]).set_index("column")
    assert got.loc["x", "n"] == 6 and got.loc["x", "n_null"] == 1
    assert got.loc["x", "n_distinct"] == 4
    assert got.loc["x", "min_v"] == -7.0 and got.loc["x", "max_v"] == 2.5
    assert got.loc["x", "mean_v"] == round((1.5+2.5+2.5-7.0+0.0)/5, 6)
    assert got.loc["s", "n_null"] == 1 and got.loc["s", "n_distinct"] == 4
    assert got.loc["s", "min_v"] == 0.0 and got.loc["s", "max_v"] == 3.0
    assert got.loc["k", "n_distinct"] == 3 and got.loc["k", "n_null"] == 1
    # partition independence
    got2 = profile_table(rd.from_pandas(df).repartition(1),
                         columns=["x", "s", "k"]).set_index("column")
    pd.testing.assert_frame_equal(got, got2)


def test_lm_perplexity_engine_matches_oracle(ray_session):
    """Bigram-LM quality scoring: distributed count passes + broadcast
    scoring == the naive dict/loop restatement; vocabulary selection
    total order; short docs score the -1 sentinel; partitioning cannot
    change a score."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rayxt.lm import lm_perplexity, lm_train
    from tests.oracle.sketches import oracle_lm_ppl, oracle_lm_train

    rng = np.random.default_rng(13)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "Iota", "KAPPA", "42", "x9"]
    texts = [" ".join(rng.choice(words, size=rng.integers(0, 40)))
             for _ in range(300)]
    texts += ["", "one", "  ", "!!!", "one two"]
    ds = rd.from_arrow(pa.table({
        "doc_id": list(range(len(texts))), "text": texts})).repartition(6)

    model = lm_train(ds, vocab_size=7, alpha=0.25)
    om = oracle_lm_train(texts, vocab_size=7, alpha=0.25)
    assert model["vocab"] == om["vocab"]
    got = (lm_perplexity(ds, model, key_cols=("doc_id",))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = [oracle_lm_ppl(om, t) for t in texts]
    assert np.allclose(got["ppl"], want, atol=1e-6)
    assert (got["ppl"].iloc[-5:-1] == -1.0).sum() == 4  # <2-token docs
    # partition independence
    m2 = lm_train(ds.repartition(1), vocab_size=7, alpha=0.25)
    assert m2["vocab"] == model["vocab"]
    assert np.array_equal(m2["pairs"], model["pairs"])
    assert np.array_equal(m2["pair_counts"], model["pair_counts"])


def test_pack_documents_budget_and_determinism(ray_session):
    """Sequence packing: budget respected (except oversize singleton
    packs), next-fit order within bucket, partition independence."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rayxt.text import pack_documents

    rng = np.random.default_rng(23)
    texts = [" ".join(["w"] * int(n))
             for n in rng.integers(1, 120, size=400)]
    texts[7] = " ".join(["w"] * 999)  # oversize doc
    ds = rd.from_arrow(pa.table({
        "doc_id": list(range(len(texts))), "text": texts}))
    got = (pack_documents(ds.repartition(5), max_tokens=256)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(got) == len(texts)
    # every non-oversize pack fits the budget
    sums = got.groupby("pack_id").agg(tot=("n_tokens", "sum"),
                                      over=("oversize", "any"))
    assert (sums.loc[~sums["over"], "tot"] <= 256).all()
    # oversize doc sits alone in its pack
    over_pack = got.loc[got["doc_id"] == 7, "pack_id"].iloc[0]
    assert (got["pack_id"] == over_pack).sum() == 1
    # pack_pos is a contiguous 0..k run within each pack (id order)
    for _, grp in got.groupby("pack_id"):
        grp = grp.sort_values("doc_id")
        assert grp["pack_pos"].tolist() == list(range(len(grp)))
    # partition independence
    got2 = (pack_documents(ds.repartition(1), max_tokens=256)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, got2)


def test_remove_dup_substrings(ray_session):
    """ExactSubstr span removal == Python-int oracle on both the
    broadcast path and the join fallback; all copies of a duplicated
    span are removed (short exact-dup docs empty out entirely)."""
    import ray.data as rd

    from rayxt.dedup import remove_dup_substrings
    from tests.oracle.sketches import oracle_remove_dup_substrings

    docs = {
        1: "a b c d e f",      # every window duplicated vs docs 2/5
        2: "c d e f g h",      # cdef dup -> tokens 0..3 removed
        3: "solo words here",  # < n tokens, unique: untouched
        4: "",
        5: "a b c d e f",      # exact dup of doc 1
        6: "r r r r r r r r",  # within-doc repeats cover everything
        7: "x y z w v u t s",  # fully unique: untouched
    }
    want = oracle_remove_dup_substrings(list(docs), list(docs.values()),
                                        n=4)
    assert want[1] == (6, 6, "") and want[5] == (6, 6, "")
    assert want[2] == (6, 4, "g h")
    assert want[3] == (3, 0, "solo words here")
    assert want[4] == (0, 0, "")
    assert want[6] == (8, 8, "")
    assert want[7] == (8, 0, "x y z w v u t s")

    ds = rd.from_items([{"doc_id": k, "text": t} for k, t in docs.items()])
    for thr in (5_000_000, 0):
        got = remove_dup_substrings(
            ds, "doc_id", n=4, broadcast_threshold=thr) \
            .to_pandas().set_index("doc_id")
        got_map = {k: (int(r["n_tokens"]), int(r["n_removed"]),
                       r["text_dedup"]) for k, r in got.iterrows()}
        assert got_map == want, thr


def test_semdedup_matches_oracle_any_batching(ray_session):
    """SemDeDup == naive restatement (per-pair dots, python greedy) on
    planted exact/near duplicates, across block layouts; kmeans stays
    byte-stable under the refactor that semdedup shares."""
    import ray.data as rd

    from rayxt.ann import semdedup
    from tests.oracle.sketches import oracle_semdedup

    rng = np.random.default_rng(11)
    base = rng.normal(size=(40, 8))
    rows = []
    for i, v in enumerate(base):
        rows.append({"vec_id": i, "embedding": [float(x) for x in v]})
    # planted duplicates: exact copies and tiny perturbations
    for j, src in enumerate((3, 7, 7, 12)):
        v = base[src] + (0.0 if j < 2 else 1e-4)
        rows.append({"vec_id": 100 + j,
                     "embedding": [float(x) for x in v]})
    ids = [r["vec_id"] for r in rows]
    vecs = [r["embedding"] for r in rows]
    want = oracle_semdedup(ids, vecs, k=4, threshold=0.9)
    assert sum(1 for v in want.values() if not v[2]) >= 3  # dups dropped

    for nblocks in (1, 5):
        ds = rd.from_items(rows).repartition(nblocks)
        got = semdedup(ds, k=4, threshold=0.9).to_pandas() \
            .set_index("vec_id")
        got_map = {int(i): (int(r["cluster"]), r["centroid_sim"],
                            bool(r["kept"])) for i, r in got.iterrows()}
        assert got_map == want, nblocks


def test_dsir_weights_and_resample(ray_session, tmp_path):
    """DSIR log importance weights + Gumbel-top-k sample == naive
    restatement; weights rank target-like docs above off-target ones;
    resampling is deterministic in (id, seed)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from rayxt.dsir import dsir_logweights, dsir_resample
    from tests.oracle.sketches import oracle_dsir

    target = ["the cat sat on the mat", "a cat and a dog",
              "the dog chased the cat"]
    tpath = str(tmp_path / "target.parquet")
    pq.write_table(pa.table({"text": pa.array(target, pa.string())}), tpath)

    corpus = {
        1: "the cat sat on the mat all day",
        2: "stock prices fell sharply in tokyo trading",
        3: "a dog and a cat played",
        4: "quantum chromodynamics lattice simulation results",
        5: "",
        6: "the the the the",
    }
    want = oracle_dsir(list(corpus), list(corpus.values()), target)
    # target-like docs outscore off-target ones
    assert want[1][1] > want[2][1] and want[3][1] > want[4][1]
    assert want[5] == (0, 0.0, want[5][2])

    ds = rd.from_items([{"doc_id": k, "text": t}
                        for k, t in corpus.items()]).repartition(3)
    got = dsir_logweights(ds, tpath, "doc_id").to_pandas() \
        .set_index("doc_id")
    got_map = {int(i): (int(r["n_grams"]), r["dsir_logw"])
               for i, r in got.iterrows()}
    assert got_map == {k: v[:2] for k, v in want.items()}

    samp = dsir_resample(ds, tpath, "doc_id", 3).to_pandas()
    want_order = sorted(want, key=lambda i: (-want[i][2], i))[:3]
    assert list(samp["doc_id"]) == want_order
    assert list(samp["gumbel_key"]) == [want[i][2] for i in want_order]


def test_remove_dup_substrings_randomized(ray_session):
    """Engine == oracle on a seeded random small-vocab corpus (natural
    window collisions, docs of every length class), both dataflow paths
    and a non-default min_count."""
    import ray.data as rd

    from rayxt.dedup import remove_dup_substrings
    from tests.oracle.sketches import oracle_remove_dup_substrings

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(12)]
    docs = {}
    for i in range(80):
        ln = int(rng.integers(0, 14))
        docs[i] = " ".join(rng.choice(vocab, size=ln))
    ids, texts = list(docs), list(docs.values())
    for n, mc in ((3, 2), (4, 2)):
        want = oracle_remove_dup_substrings(ids, texts, n=n, min_count=mc)
        assert any(v[1] for v in want.values())  # some spans removed
        ds = rd.from_items(
            [{"doc_id": k, "text": t} for k, t in docs.items()]) \
            .repartition(7)
        for thr in (5_000_000, 0):
            got = remove_dup_substrings(
                ds, "doc_id", n=n, min_count=mc,
                broadcast_threshold=thr).to_pandas().set_index("doc_id")
            got_map = {k: (int(r["n_tokens"]), int(r["n_removed"]),
                           r["text_dedup"]) for k, r in got.iterrows()}
            assert got_map == want, (n, mc, thr)


def test_redact_pii_matches_duckdb(ray_session):
    """Vectorized RE2 redaction == DuckDB's regexp_replace(...,'g')
    restatement over the same pattern strings (both engines RE2),
    including null text, lookalike near-misses and unicode filler."""
    import duckdb
    import pyarrow.parquet as pq
    import ray.data as rd

    from fixtures.gen_pages import generate_pii_table
    from rayxt.text import redact_sql_expr, redact_text

    t = generate_pii_table(120)
    path = "/tmp/rayxt_pii_unit.parquet"
    pq.write_table(t, path)
    got = redact_text(rd.from_arrow(t).repartition(4), "row_id") \
        .to_pandas().sort_values("row_id").reset_index(drop=True)
    assert got["n_email"].sum() > 0 and got["n_ip"].sum() > 0
    cols = redact_sql_expr()
    sql = ("SELECT row_id, "
           + ", ".join(f"{e} AS {n}" for n, e in cols.items())
           + f" FROM '{path}' ORDER BY row_id")
    want = duckdb.sql(sql).df()
    for c in want.columns:
        assert list(got[c]) == list(want[c]), c


def test_keyword_filter(ray_session):
    import ray.data as rd

    from rayxt.text import add_keyword_flag, filter_keywords, keyword_pattern

    assert keyword_pattern(["B", "a", "b "]) == r"(?i)\b(a|b)\b"
    rows = [
        ("hit one", "the Spark engine"),        # case-insensitive
        ("miss sub", "sparkle and dupes"),      # substrings don't count
        ("hit phrase", "a hash  join here"),    # ws-exact phrase? no
        ("hit exact", "one hash join here"),
        ("miss", "clean text"),
        ("null", None),
    ]
    ds = rd.from_items([{"k": k, "text": t} for k, t in rows])
    phrases = ["spark", "dup", "hash join"]
    flags = {r["k"]: r["hit"] for r in
             add_keyword_flag(ds, phrases, out="hit").take_all()}
    assert flags == {"hit one": True, "miss sub": False,
                     "hit phrase": False,  # double space: not the phrase
                     "hit exact": True, "miss": False, "null": False}
    kept = {r["k"] for r in filter_keywords(ds, phrases).take_all()}
    assert kept == {"miss sub", "hit phrase", "miss", "null"}
    # DuckDB parity on the same pattern (both RE2)
    import duckdb

    pat = keyword_pattern(phrases)
    for _, t in rows:
        if t is None:
            continue
        want = duckdb.sql(
            "SELECT regexp_matches(?, ?)", params=[t, pat]).fetchone()[0]
        got = flags[[k for k, tt in rows if tt == t][0]]
        assert got == want, t


def test_clean_lines_policy_and_duckdb_parity(ray_session):
    """C4-style line cleaning: frozen keep policy (>=3 words, terminal
    punctuation, no "javascript"), null/empty/zero-kept edges, and
    exact parity with the DuckDB list_filter restatement over the SAME
    RE2 pattern strings."""
    import duckdb
    import pyarrow.parquet as pq
    import ray.data as rd

    from rayxt.text import clean_lines, clean_lines_sql_exprs

    rows = [
        (0, "Hello there world.\nshort\nUse javascript here now.\n"
            "A good long line!  \nJavaScript is case-folded away."),
        (1, ""),                               # 1 line, 0 kept -> null
        (2, None),                             # null in, nulls out
        (3, "one two"),                        # too few words
        (4, 'ends with quote words here."'),   # quote counts as terminal
        (5, "tab\tseparated words count fine?"),
        (6, "line one is kept here.\n\nline three is kept too!"),
        (7, "ecmascript/javascripty words are not word-matches ok."),
        (8, "trailing blanks survive the join.   \nsecond keeper here."),
    ]
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string())})
    got = clean_lines(rd.from_arrow(t).repartition(3), "doc_id") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    by = {int(r["doc_id"]): r for _, r in got.iterrows()}
    assert by[0]["text_clean"] == "Hello there world.\nA good long line!  "
    assert (by[0]["n_lines"], by[0]["n_kept"]) == (5, 2)
    assert by[1]["text_clean"] is None and by[1]["n_kept"] == 0
    assert by[2]["text_clean"] is None and pd.isna(by[2]["n_lines"])
    assert by[3]["text_clean"] is None
    assert by[4]["text_clean"] == rows[4][1]
    assert by[5]["text_clean"] == rows[5][1]     # tabs delimit words
    assert by[6]["n_kept"] == 2
    # \b boundary: "javascripty" has no trailing boundary -> no word
    # match -> the line survives
    assert by[7]["text_clean"] == rows[7][1]
    assert by[8]["text_clean"] == rows[8][1]

    path = "/tmp/rayxt_clean_lines_unit.parquet"
    pq.write_table(t, path)
    cols = clean_lines_sql_exprs("text")
    sql = ("SELECT doc_id, "
           + ", ".join(f"{e} AS {n}" for n, e in cols.items())
           + f" FROM '{path}' ORDER BY doc_id")
    want = duckdb.sql(sql).df()
    for c in ("n_lines", "n_kept", "text_clean"):
        gv = [None if pd.isna(v) else v for v in got[c]]
        wv = [None if pd.isna(v) else v for v in want[c]]
        assert gv == wv, c


def test_group_stats_filter_modes_match_brute_force(ray_session):
    import ray.data as rd

    from rayxt.stats import group_keep_keys, group_stats_filter

    rows = []
    for i in range(300):
        k = f"h{i % 17:02d}"
        rows.append({"id": i, "key": k,
                     "v": float((i * 37) % 250) if i % 29 else None})
    rows.append({"id": 300, "key": None, "v": 10.0})  # null key drops
    df = pd.DataFrame(rows)

    valid = df.dropna(subset=["key", "v"])
    g = valid.groupby("key")["v"].agg(["count", "mean"])
    passing = set(g[(g["count"] >= 12) & (g["mean"].round(6) >= 100)
                    & (g["mean"].round(6) <= 140)].index)

    ds = rd.from_pandas(df).repartition(5)
    keys = sorted(group_keep_keys(
        ds, key_col="key", value_col="v", min_count=12,
        min_mean=100.0, max_mean=140.0).to_pandas()["key"])
    assert keys == sorted(passing)

    for mode in ("broadcast", "join"):
        kept = group_stats_filter(
            ds, key_col="key", value_col="v", min_count=12,
            min_mean=100.0, max_mean=140.0, mode=mode).to_pandas()
        # every surviving row's key passes; every passing key's rows
        # survive IN FULL (null-v rows of a passing key included)
        want = df[df["key"].isin(passing)]
        assert sorted(kept["id"]) == sorted(want["id"]), mode


def test_group_keep_keys_empty_input(ray_session):
    import ray.data as rd

    from rayxt.stats import group_keep_keys

    empty = rd.from_pandas(pd.DataFrame({"key": pd.Series([], dtype=object),
                                         "v": pd.Series([], dtype=float)}))
    got = group_keep_keys(empty, key_col="key", value_col="v",
                          min_count=1)
    assert got.count() == 0


def test_word_stats_duckdb_parity_fuzz(ray_session):
    import random

    import duckdb

    from rayxt.text import (_word_stats_table, add_word_stats,
                            gopher_filter, word_stats_sql_exprs)

    rng = random.Random(77)
    pieces = ["hello", "a#b", "...", "…", "•", "- x", "* y",
              "wor...d", "\t", "\n", " ", "end...", "läñg", "123",
              "!!!", ""]
    rows = ["hello world", "", None, "  \t  "]
    for _ in range(300):
        rows.append("".join(rng.choice(pieces)
                            for _ in range(rng.randrange(0, 25))))
    t = pa.table({"doc_id": list(range(len(rows))),
                  "text": pa.array(rows, pa.string())})
    got = _word_stats_table(t, "text").to_pandas()
    con = duckdb.connect()
    con.register("d", t)
    exprs = word_stats_sql_exprs("text")
    want = con.execute(
        "SELECT doc_id, " + ", ".join(f"{e} AS {k}"
                                      for k, e in exprs.items())
        + " FROM d ORDER BY doc_id").df()
    for c in exprs:
        gv = [None if pd.isna(v) else round(float(v), 6)
              for v in got[c]]
        wv = [None if pd.isna(v) else round(float(v), 6)
              for v in want[c]]
        assert gv == wv, c

    # explicit expectations on handcrafted rows
    by = {r["doc_id"]: r for _, r in got.iterrows()}
    assert by[0]["n_words"] == 2 and by[0]["mean_word_len"] == 5.0
    assert by[1]["n_words"] == 0 and pd.isna(by[1]["mean_word_len"])
    assert pd.isna(by[2]["n_words"])          # null text
    assert by[3]["n_words"] == 0              # whitespace only

    # the Dataset stage + the composite filter agree with the SQL gates
    import ray.data as rd

    ds = rd.from_arrow(t).repartition(3)
    stats = add_word_stats(ds).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert list(stats["n_words"].fillna(-1)) == \
        list(got["n_words"].fillna(-1))
    kept = sorted(gopher_filter(ds, min_words=1, min_mwl=0.0,
                                max_mwl=100.0, min_alpha=0.0,
                                max_symbol=10.0)
                  .to_pandas()["doc_id"])
    want_kept = sorted(
        int(r["doc_id"]) for _, r in got.iterrows()
        if not pd.isna(r["n_words"]) and r["n_words"] >= 1
        and r["bullet_line_frac"] <= 0.9
        and r["ellipsis_line_frac"] <= 0.3)
    assert kept == want_kept
