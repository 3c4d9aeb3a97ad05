"""Engine vs naive-oracle agreement for the sketch/heuristic operators
(tests/oracle/sketches.py restates each frozen definition; these tests
keep engine and oracle from drifting apart) + the LSH ANN recall gate.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tests.oracle.sketches import (
    oracle_components,
    oracle_fingerprint,
    oracle_langid,
    oracle_minhash_pairs,
    oracle_ngram_jaccard_pairs,
    oracle_simhash_pairs,
)

_WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
          "kilo lima mike november oscar papa quebec romeo sierra tango").split()


def _make_docs(n=60, seed=3):
    """Deterministic corpus with planted near-dup families: every third
    doc is a light mutation of the previous one."""
    rng = np.random.default_rng(seed)
    ids, texts = [], []
    base = ""
    for i in range(n):
        if i % 3 == 0 or not base:
            base = " ".join(rng.choice(_WORDS, size=40))
            text = base
        else:
            toks = base.split()
            toks[int(rng.integers(len(toks)))] = str(rng.choice(_WORDS))
            text = " ".join(toks)
        ids.append(i)
        texts.append(text)
    return ids, texts


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    ids, texts = _make_docs()
    return rd.from_arrow(pa.table({"doc_id": ids, "text": texts})), ids, texts


def test_minhash_pairs_match_oracle(docs_ds):
    from rayxt.dedup import minhash_lsh_pairs

    ds, ids, texts = docs_ds
    got = minhash_lsh_pairs(ds, "doc_id", threshold=0.5,
                            concurrency=1).to_pandas()
    got = sorted(map(tuple, got[["id_a", "id_b", "jaccard"]].to_numpy()))
    want = [(float(a), float(b), j)
            for a, b, j in oracle_minhash_pairs(ids, texts, threshold=0.5)]
    assert [(int(a), int(b), round(j, 6)) for a, b, j in got] == \
           [(int(a), int(b), j) for a, b, j in want]
    assert len(want) > 0  # planted families must surface


def test_ngram_jaccard_pairs_match_oracle(docs_ds):
    from rayxt.dedup import ngram_jaccard_pairs

    ds, ids, texts = docs_ds
    got = ngram_jaccard_pairs(ds, "doc_id", threshold=0.5,
                              concurrency=1).to_pandas()
    got = sorted((int(a), int(b), round(float(j), 6))
                 for a, b, j in got[["id_a", "id_b", "jaccard"]].to_numpy())
    want = oracle_ngram_jaccard_pairs(ids, texts, threshold=0.5)
    assert got == [(int(a), int(b), j) for a, b, j in want]
    assert len(got) > 0  # planted families must surface
    # exact Jaccard, not the MinHash estimate: the one-token mutations
    # must come out at their true similarity (38 shared / 44 union of
    # 3-shingles for a single mid-doc substitution is ~0.7-0.9, never 1.0
    # unless the mutation re-picked the same token)
    est = {(a, b): j for a, b, j in
           oracle_minhash_pairs(ids, texts, threshold=0.5)}
    exact = {(a, b): j for a, b, j in want}
    both = set(est) & set(exact)
    assert both and any(abs(est[p] - exact[p]) > 1e-9 for p in both)


def test_simhash_pairs_match_oracle(docs_ds):
    from rayxt.dedup import simhash_pairs

    ds, ids, texts = docs_ds
    got = simhash_pairs(ds, "doc_id", max_hamming=6).to_pandas()
    got = sorted((int(a), int(b), int(d))
                 for a, b, d in got[["id_a", "id_b", "hamming"]].to_numpy())
    assert got == oracle_simhash_pairs(ids, texts, max_hamming=6)
    assert len(got) > 0


def test_components_match_union_find(docs_ds):
    from rayxt.dedup import connected_components, minhash_lsh_pairs

    ds, ids, texts = docs_ds
    pairs = minhash_lsh_pairs(ds, "doc_id", threshold=0.5, concurrency=1)
    got = connected_components(pairs).to_pandas()
    got = sorted((int(i), int(c))
                 for i, c in got[["id", "cluster_id"]].to_numpy())
    want = oracle_components(oracle_minhash_pairs(ids, texts, threshold=0.5))
    assert got == want


def test_langid_fingerprint_match_oracle(docs_ds):
    from rayxt.text import LangId, fingerprint_of

    _, _, texts = docs_ds
    li = LangId()
    samples = texts[:10] + ["der die das und ist", "le la les et est",
                            "一二三四五六七八九十", ""]
    for t in samples:
        assert li._guess(t) == oracle_langid(t)
        assert format(fingerprint_of(t), "016x") == oracle_fingerprint(t)


def test_repetition_signals_match_oracle(docs_ds):
    """Engine repetition profile == independent Counter restatement on
    the corpus plus the word-count edge cases (0/1/2 words, all-same)."""
    from rayxt.text import add_repetition_signals, repetition_profile
    from tests.oracle.sketches import oracle_repetition

    ds, ids, texts = docs_ds
    samples = texts[:20] + ["", "one", "two words", "a a a a a",
                            "x y x y x y", "a b c a b c a b c"]
    for t in samples:
        assert repetition_profile(t) == oracle_repetition(t), t

    got = (add_repetition_signals(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    for i, t in enumerate(sorted(zip(ids, texts))):
        want = oracle_repetition(t[1])
        row = got.iloc[i]
        assert (row["max_word_frac"], row["top_2gram_frac"],
                row["dup_3gram_frac"]) == want


def test_media_decode_round_trips_ground_truth():
    """PNG / WAV / RAYX decoders must invert the fixture encodings:
    decode(encode(source)) == the generator's pre-encoding stats."""
    from fixtures.gen_media import media_ground_truth, media_row
    from rayxt.multimodal import _decode_payload

    kinds = set()
    for i in range(60):
        row = media_row(i)
        kinds.add(row["kind"])
        w, h, f, mean = _decode_payload(row["payload"])
        gt = media_ground_truth(i)
        assert (w, h, f, round(mean, 6)) == (
            gt["width"], gt["height"], gt["n_frames"], gt["mean_value"]
        ), f"row {i} ({row['kind']})"
    assert kinds == {"image", "audio", "video"}
    # JPEG is supported now; a truncated/garbage JPEG is a poison row
    with pytest.raises(ValueError):
        _decode_payload(b"\xff\xd8\xff\xe0" + b"\0" * 30)
    # MP4 is a real demuxer now (round 4): a bare ftyp with no sample
    # tables is a MALFORMED container (-> error status); only a real
    # track with a patent codec maps to unsupported_codec (covered by
    # test_media_mp4_mjpeg_decode_and_sample)
    with pytest.raises(ValueError):
        _decode_payload(b"\x00\x00\x00\x18ftypmp42" + b"\0" * 30)


def test_jpeg_ff_fill_bytes_before_markers():
    """T.81 B.1.1.2 allows runs of FF fill bytes before any marker —
    both the header walk and the entropy-segment skipper must treat
    the first non-FF byte of a run as the marker code (baseline and
    progressive, where the walk resumes after each SOS)."""
    import numpy as np

    from fixtures.gen_media import (_body, _jpeg_encode,
                                    _jpeg_encode_progressive)
    from rayxt.multimodal import _decode_jpeg_array

    src = _body(77, 24 * 24 * 3).reshape(24, 24, 3)
    for enc in (_jpeg_encode, _jpeg_encode_progressive):
        p = enc(src, 85)
        want = _decode_jpeg_array(p)
        # fill run after SOI (before the first segment marker) and
        # before EOI (after the last entropy segment)
        assert p[-2:] == b"\xff\xd9"
        padded = p[:2] + b"\xff" * 3 + p[2:-2] + b"\xff" * 4 + p[-2:]
        got = _decode_jpeg_array(padded)
        assert np.array_equal(got, want)


def test_gif_engine_matches_independent_oracle():
    """Every GIF fixture row (animated, interlaced, local tables,
    forced LZW resets, 4/16/256-colour palettes) decodes bit-identical
    between the engine and the independently-architected oracle, and
    the engine inverts the encoder exactly (lossless)."""
    import numpy as np

    from fixtures.gen_media import (_gif_frame_indices, _gif_spec,
                                    _is_gif_row, media_row)
    from rayxt.multimodal import _gif_frames
    from tests.oracle.gif_oracle import oracle_decode_gif

    seen = {"interlace": 0, "local": 0, "reset": 0, "multi": 0}
    n = 0
    for i in range(400):
        if not _is_gif_row(i):
            continue
        w, h, frames, palette, inter, local, reset = _gif_spec(i)
        seen["interlace"] += inter
        seen["local"] += local
        seen["reset"] += bool(reset)
        seen["multi"] += frames > 1
        p = media_row(i)["payload"]
        w1, h1, fr1 = _gif_frames(p)
        w2, h2, fr2 = oracle_decode_gif(p)
        assert (w1, h1, len(fr1)) == (w2, h2, len(fr2)) == (w, h, frames)
        for f, (a, b) in enumerate(zip(fr1, fr2)):
            assert np.array_equal(a, b), (i, f)
            src = palette[_gif_frame_indices(i, f, w, h, len(palette))]
            assert np.array_equal(a, src), (i, f)  # lossless inversion
        n += 1
    assert n >= 30
    assert all(v > 0 for v in seen.values()), seen


def test_gif_lzw_kwkwk_and_reset():
    """The KwKwK code (cScSc pattern) and mid-stream CLEARs decode
    correctly in both engine and oracle."""
    import numpy as np

    from fixtures.gen_media import _gif_encode
    from rayxt.multimodal import _gif_frames
    from tests.oracle.gif_oracle import oracle_decode_gif

    # abababab... guarantees the encoder emits a just-created code
    idx = np.tile(np.array([[0, 1]], np.uint8), (8, 8))
    pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
    for reset in (None, 3):
        p = _gif_encode([idx], pal, reset_every=reset)
        _, _, [fr] = _gif_frames(p)
        assert np.array_equal(fr, pal[idx])
        _, _, [fo] = oracle_decode_gif(p)
        assert np.array_equal(fo, pal[idx])


def test_webp_engine_matches_independent_oracle():
    """Every WebP fixture variant (pure literals, cache+LZ77,
    subtract-green, predictor with all 14 modes, colour transform,
    palette at every bundling width, meta prefix groups, the combined
    stack, VP8X+alpha) decodes bit-identically in the engine and the
    independently-architected oracle, and BOTH invert the spec-true
    encoder exactly — VP8L is lossless."""
    import numpy as np

    from fixtures.gen_media import _is_webp_row, _webp_payload, _webp_spec
    from rayxt.webp import decode_webp, vp8l_pixels
    from tests.oracle.webp_oracle import oracle_decode_webp

    variants = set()
    for i in range(648):
        if not _is_webp_row(i):
            continue
        w, h, argb, alpha_hint, _opts, _ext = _webp_spec(i)
        payload = _webp_payload(i)
        ow, oh, ohint, opx = oracle_decode_webp(payload)
        assert (ow, oh, ohint) == (w, h, alpha_hint)
        assert np.array_equal(opx, argb)  # oracle inverts the encoder
        # engine container walk agrees on dims and the pixel mean
        dw, dh, nf, mean = decode_webp(payload)
        assert (dw, dh, nf) == (w, h, 1)
        chans = argb if alpha_hint else argb[..., 1:4]
        assert mean == float(chans.astype(np.float64).mean())
        # engine chunk decode is bit-identical to the oracle's
        pos = 12
        while payload[pos:pos + 4] != b"VP8L":
            n = int.from_bytes(payload[pos + 4:pos + 8], "little")
            pos += 8 + n + (n & 1)
        n = int.from_bytes(payload[pos + 4:pos + 8], "little")
        _, _, _, epx = vp8l_pixels(payload[pos + 8:pos + 8 + n])
        assert np.array_equal(epx, opx)
        variants.add((i // 24) % 9)
    assert variants == set(range(9))  # the corpus hits every variant


def test_webp_lossy_and_garbage_statuses():
    """``VP8 `` (lossy) and animated payloads surface as
    unsupported_codec; truncated/corrupt ones as errors."""
    import struct

    import pytest as _pytest

    from rayxt.webp import decode_webp

    lossy = (b"RIFF" + struct.pack("<I", 16) + b"WEBP"
             + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4)
    with _pytest.raises(NotImplementedError):
        decode_webp(lossy)
    anim = (b"RIFF" + struct.pack("<I", 16) + b"WEBP"
            + b"ANIM" + struct.pack("<I", 6) + b"\x00" * 6)
    with _pytest.raises(NotImplementedError):
        decode_webp(anim)
    with _pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00WEBPVP8L\x04\x00\x00\x00abcd")
    with _pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00WAVEdata")


def test_webp_resize_to_png():
    """Resizing a lossless WebP re-encodes the nearest-neighbour
    subsample of the SOURCE pixels as PNG, exactly."""
    import numpy as np

    from fixtures.gen_media import _is_webp_row, _webp_payload, _webp_spec
    from rayxt.multimodal import ResizeImages, _decode_png_array

    done = 0
    for i in range(648):
        if not _is_webp_row(i):
            continue
        w, h, argb, alpha_hint, _opts, _ext = _webp_spec(i)
        rz = ResizeImages(8, 8)
        out = rz._resize(_webp_payload(i))
        recon, ow, oh, ch, colour = _decode_png_array(out)
        assert (ow, oh) == (8, 8)
        yi = np.arange(8) * h // 8
        xi = np.arange(8) * w // 8
        sub = argb[np.ix_(yi, xi)]
        want = sub[..., [1, 2, 3, 0]] if alpha_hint else sub[..., 1:4]
        assert np.array_equal(
            recon.reshape(oh, ow, ch), want)
        done += 1
        if done >= 6:
            break
    assert done


def test_png_adam7_matches_plain():
    """An Adam7-interlaced encoding of the same pixels decodes
    bit-identical to the progressive encoding — every colour type,
    including dims not divisible by 8 and degenerate 1-pixel-wide/tall
    images where several passes are empty."""
    import numpy as np

    from fixtures.gen_media import _png_encode, _png_encode_adam7
    from rayxt.multimodal import _decode_png_array

    rng = np.random.default_rng(5)
    for colour, ch in ((0, 1), (2, 3), (6, 4)):
        for w, h in ((17, 9), (8, 8), (1, 13), (13, 1), (3, 3), (40, 33)):
            arr = rng.integers(0, 256, size=(h, w * ch), dtype=np.uint8)
            plain, _, _, _, _ = _decode_png_array(_png_encode(arr, colour))
            inter, iw, ih, ich, _ = _decode_png_array(
                _png_encode_adam7(arr, colour))
            assert (iw, ih, ich) == (w, h, ch)
            assert np.array_equal(plain, arr)
            assert np.array_equal(inter, arr)


def test_ivf_ann_recall_gate(ray_session):
    """IVF with list-aligned clusters must recover the exact top-k
    (nprobe covers the true clusters) and return exact cosines."""
    import ray.data as rd

    from rayxt.ann import brute_force_topk, ivf_topk

    rng = np.random.default_rng(9)
    centers = rng.standard_normal((6, 24)) * 4
    labels = np.array([i % 6 for i in range(300)])
    vecs = np.stack([centers[l] + rng.standard_normal(24) * 0.3
                     for l in labels])
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(300), pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))
    queries = [(i, vecs[i]) for i in range(3)]
    exact = brute_force_topk(ds, queries, k=5, concurrency=1).to_pandas()
    approx = ivf_topk(ds, queries, k=5, nprobe=2, concurrency=1).to_pandas()
    hits = sum(
        len(set(exact[exact["query_id"] == q]["id"])
            & set(approx[approx["query_id"] == q]["id"]))
        for q in (0, 1, 2)
    )
    assert hits / 15 >= 0.9
    merged = approx.merge(exact, on=["query_id", "id"], suffixes=("_i", "_b"))
    assert np.allclose(merged["cos_i"], merged["cos_b"])


def test_lsh_ann_recall_gate(ray_session):
    """Multi-table multi-probe LSH must recover >= 80% of the exact
    top-k on clustered embeddings (the favourable-and-typical case;
    the near-uniform sf0.01 gate data measures 0.80 — see rayxt/ann.py
    module docstring)."""
    import ray.data as rd

    from rayxt.ann import brute_force_topk, lsh_topk

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((8, 32)) * 3
    vecs = np.concatenate(
        [centers[i % 8] + rng.standard_normal(32) * 0.3 for i in range(400)]
    ).reshape(400, 32)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(400), pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
    }))
    queries = [(i, vecs[i]) for i in range(3)]
    exact = brute_force_topk(ds, queries, k=5, concurrency=1).to_pandas()
    approx = lsh_topk(ds, queries, k=5, concurrency=1).to_pandas()
    hits = total = 0
    for qid in (0, 1, 2):
        truth = set(exact[exact["query_id"] == qid]["id"])
        got = set(approx[approx["query_id"] == qid]["id"])
        hits += len(truth & got)
        total += len(truth)
    assert hits / total >= 0.8
    # approximate cos values must still be EXACT cosines (pruning only)
    merged = approx.merge(exact, on=["query_id", "id"], suffixes=("_l", "_b"))
    assert np.allclose(merged["cos_l"], merged["cos_b"])


def test_ddsketch_quantiles_match_oracle_and_accuracy(ray_session):
    """Engine sketch == naive oracle restatement on any batching, and
    each estimate is within relative error alpha of the exact value at
    the same rank (the DDSketch guarantee)."""
    import ray.data as rd

    from rayxt.windows import group_quantiles_sketch
    from tests.oracle.sketches import ddsketch_group_quantiles

    rng = np.random.default_rng(11)
    keys = np.repeat(["a", "b", "c"], 4000)
    # heavy-tailed positives + some negatives and zeros in key 'c'
    vals = np.concatenate([
        rng.lognormal(0.0, 2.0, 4000),
        rng.exponential(50.0, 4000),
        np.concatenate([rng.normal(0, 10, 3990), np.zeros(10)]),
    ])
    df = pd.DataFrame({"k": keys, "v": vals})
    qs, alpha = (0.5, 0.95), 0.01

    # deliberately awkward batching: 7 blocks -> partials merge across
    # batch boundaries; result must not depend on the split
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    ds = ds.repartition(7)
    got = (group_quantiles_sketch(ds, key="k", value_col="v", qs=qs,
                                  alpha=alpha)
           .to_pandas().sort_values("k").reset_index(drop=True))

    want = ddsketch_group_quantiles(
        zip(df["k"], df["v"]), qs=qs, alpha=alpha)
    for _, row in got.iterrows():
        assert [row["p50"], row["p95"]] == want[row["k"]]

    # accuracy: estimate within alpha relative error of the exact
    # rank-floor(q*(n-1)) element (zero maps to zero exactly)
    for k in ("a", "b", "c"):
        sub = np.sort(df[df["k"] == k]["v"].to_numpy())
        for q, col in zip(qs, ("p50", "p95")):
            exact = sub[int(q * (len(sub) - 1))]
            est = float(got[got["k"] == k][col].iloc[0])
            if exact == 0:
                assert est == 0
            else:
                assert abs(est / exact - 1.0) <= alpha + 1e-9, (k, q, est, exact)


def test_jpeg_engine_matches_independent_oracle():
    """Engine JPEG decoder == tests/oracle/jpeg_oracle.py bit-for-bit
    on every JPEG fixture row, and the decode is a faithful lossy
    round trip of the source (bounded RMSE)."""
    from fixtures.gen_media import _body, _image_spec, _is_jpeg_row, media_row
    from rayxt.multimodal import _decode_jpeg_array
    from tests.oracle.jpeg_oracle import oracle_decode_jpeg

    checked = 0
    for i in range(0, 300):
        if not _is_jpeg_row(i):
            continue
        row = media_row(i)
        a = _decode_jpeg_array(row["payload"])
        b = oracle_decode_jpeg(row["payload"])
        assert (a == b).all(), f"engine/oracle divergence on media_id {i}"
        w, h, _ = _image_spec(i)
        assert a.shape == (h, w, 3)
        src = _body(i, h * w * 3).reshape(h, w, 3).astype(np.float64)
        rmse = float(np.sqrt(((a.astype(np.float64) - src) ** 2).mean()))
        # uniform-noise source is the worst case for JPEG q85
        assert rmse < 80.0, (i, rmse)
        checked += 1
    assert checked >= 20
    # the fixture must actually exercise the restart-marker path
    from fixtures.gen_media import _jpeg_ri

    assert any(_jpeg_ri(i) > 0 for i in range(300) if _is_jpeg_row(i))


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn framing changes the bitstream, never the pixels: for any
    restart interval the engine and oracle decoders must both produce
    exactly the no-DRI decode of the same source."""
    from fixtures.gen_media import _jpeg_encode
    from rayxt.multimodal import _decode_jpeg_array
    from tests.oracle.jpeg_oracle import oracle_decode_jpeg

    rng = np.random.default_rng(11)
    for (h, w) in [(8, 8), (17, 33), (48, 40), (16, 64)]:
        src = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        base = oracle_decode_jpeg(_jpeg_encode(src, 85))
        for ri in (1, 2, 3, 5):
            enc = _jpeg_encode(src, 85, restart_interval=ri)
            assert b"\xff\xdd" in enc  # DRI segment present
            o = oracle_decode_jpeg(enc)
            e = _decode_jpeg_array(enc)
            assert np.array_equal(o, base), (h, w, ri)
            assert np.array_equal(e, o), (h, w, ri)


def test_hll_matches_oracle_and_accuracy(ray_session):
    """Engine HLL == naive oracle restatement regardless of batching
    (Max-merge is order-free and the estimator has no float
    accumulation), and the estimate is within 4*stderr (1.04/sqrt(m))
    of the exact distinct count.  Cardinalities straddle the linear-
    counting/raw-estimator switch so BOTH branches are exercised."""
    import ray.data as rd

    from rayxt.sketches import group_distinct_hll
    from tests.oracle.sketches import oracle_hll_distinct

    rng = np.random.default_rng(23)
    # 'small' stays in linear counting (m=1024, n<<2.5m); 'big' exceeds
    # 2.5*m so the raw estimator path runs
    keys = np.concatenate([np.repeat("small", 5000), np.repeat("big", 60000)])
    vals = np.concatenate([
        rng.integers(0, 400, 5000),
        rng.integers(0, 40000, 60000),
    ]).astype(np.int64)
    df = pd.DataFrame({"k": keys, "v": vals})

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = (group_distinct_hll(ds.repartition(9), key="k", value_col="v",
                              p=10, out_col="n")
           .to_pandas().sort_values("k").reset_index(drop=True))

    want = oracle_hll_distinct(df["k"].tolist(), df["v"].tolist(), p=10)
    assert {r["k"]: int(r["n"]) for _, r in got.iterrows()} == want

    tol = 4 * 1.04 / np.sqrt(1024)  # 4 standard errors ~ 13%
    for k in ("small", "big"):
        exact = df[df["k"] == k]["v"].nunique()
        est = int(got[got["k"] == k]["n"].iloc[0])
        assert abs(est / exact - 1.0) <= tol, (k, est, exact)
        if k == "big":
            assert exact > 2.5 * 1024  # raw-estimator branch really ran


def test_corpus_quantiles_sketch_matches_oracle(ray_session):
    """Corpus-wide DDSketch == the naive restatement with a constant
    key, for any batching, and within the alpha relative-error bound of
    the exact rank element."""
    import ray.data as rd

    from rayxt.windows import corpus_quantiles_sketch
    from tests.oracle.sketches import ddsketch_group_quantiles

    rng = np.random.default_rng(59)
    vals = np.concatenate([rng.lognormal(0, 2.0, 20000),
                           -rng.lognormal(1, 1.0, 5000), [0.0] * 37])
    rng.shuffle(vals)

    ds = rd.from_arrow(pa.table({"value": pa.array(vals, pa.float64())}))
    got = corpus_quantiles_sketch(ds.repartition(11), value_col="value",
                                  qs=(0.5, 0.95), alpha=0.01)
    want = ddsketch_group_quantiles((("all", v) for v in vals),
                                    qs=(0.5, 0.95), alpha=0.01)["all"]
    assert got["p50"].iloc[0] == want[0]
    assert got["p95"].iloc[0] == want[1]
    for q, est in (("p50", got["p50"].iloc[0]), ("p95", got["p95"].iloc[0])):
        exact = np.sort(vals)[int({"p50": .5, "p95": .95}[q] * (len(vals) - 1))]
        assert abs(est - exact) <= 0.011 * abs(exact) + 1e-12, (q, est, exact)


def test_heavy_hitters_equals_exact_topk(ray_session):
    """Candidate pass + exact recount == exact top-k whenever every
    top-k value's count exceeds n/m — asserted on a Zipf-ish skew over
    many small blocks, so local-heaviness thresholds really trigger."""
    import ray.data as rd

    from rayxt.sketches import heavy_hitters

    rng = np.random.default_rng(41)
    # ~40 hot values with Zipf-ish counts over a 5000-word long tail
    hot = [f"hot{i:02d}" for i in range(40)]
    hot_counts = (4000 / np.arange(1, 41)).astype(int)
    vals = ([v for v, c in zip(hot, hot_counts) for _ in range(int(c))]
            + [f"tail{int(i)}" for i in rng.integers(0, 5000, 12000)])
    rng.shuffle(vals)
    df = pd.DataFrame({"v": vals})

    exact = (df["v"].value_counts().rename_axis("v").reset_index(name="n")
             .sort_values(["n", "v"], ascending=[False, True]).head(10)
             .reset_index(drop=True))
    n = len(df)
    assert exact["n"].min() * 256 > n  # the documented m precondition

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = (heavy_hitters(ds.repartition(16), value_col="v", k=10, m=256)
           .to_pandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, exact.astype({"n": "int64"}), check_dtype=False)


def test_kmeans_matches_oracle_any_partitioning(ray_session):
    """Engine k-means == naive oracle restatement for any batching
    (centroid rounding decouples assignments from partial-sum merge
    order), and the clustering actually separates planted clusters."""
    import ray.data as rd

    from rayxt.ann import kmeans
    from tests.oracle.sketches import oracle_kmeans

    rng = np.random.default_rng(31)
    centers = rng.standard_normal((4, 16)) * 6.0
    labels = rng.integers(0, 4, size=300)
    vecs = (centers[labels] + rng.standard_normal((300, 16))).astype(
        np.float32)
    ids = np.arange(300)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
    }))
    want = oracle_kmeans(ids.tolist(), vecs.tolist(), k=4, iters=4)
    for parts in (2, 7):
        got = (kmeans(ds.repartition(parts), id_col="vec_id",
                      vec_col="embedding", k=4, iters=4)
               .to_pandas().sort_values("vec_id"))
        assert dict(zip(got["vec_id"], got["cluster"])) == want
    # planted structure partially recovered (id-seeded init can drop a
    # planted cluster, so gate the row-weighted purity, not the worst
    # cluster) and all k clusters are non-empty
    dfm = pd.DataFrame({"c": got["cluster"].to_numpy(),
                        "l": labels[got["vec_id"].to_numpy()]})
    purity = (dfm.groupby("c")["l"]
              .agg(lambda s: s.value_counts().iloc[0]).sum()) / len(dfm)
    assert purity > 0.6
    assert dfm["c"].nunique() == 4


def test_as_matrix_zero_copy_paths():
    """Arrow fixed-size-list / uniform list / ragged list / python
    sequences all decode to the same float64 matrix (VERDICT r3 item 7:
    the fast paths avoid per-row Python objects)."""
    import numpy as np
    import pyarrow as pa

    from rayxt.ann import _as_matrix

    rows = [[1.0, 2.0, 3.0], [4.5, 5.5, 6.5]]
    want = np.asarray(rows, dtype=np.float64)

    fsl = pa.array(rows, pa.list_(pa.float32(), 3))
    assert np.allclose(_as_matrix(fsl), want, atol=1e-6)
    lst = pa.array(rows, pa.list_(pa.float64()))
    assert np.array_equal(_as_matrix(lst), want)
    chunked = pa.chunked_array([pa.array(rows[:1], pa.list_(pa.float64())),
                                pa.array(rows[1:], pa.list_(pa.float64()))])
    assert np.array_equal(_as_matrix(chunked), want)
    # sliced array: offsets must be honored
    assert np.array_equal(_as_matrix(lst.slice(1, 1)), want[1:])
    # python list fallback
    assert np.array_equal(_as_matrix(rows), want)


def test_progressive_jpeg_exactness_and_oracle():
    """Progressive (SOF2) streams carry the SAME quantized coefficients
    as the baseline stream of the same image, so a correct decoder
    yields bit-identical pixels for both — asserted for both DC scan
    shapes, plus engine==oracle on the progressive streams themselves
    (independent implementations), plus fixture-mode coverage."""
    from fixtures.gen_media import (_body, _is_jpeg_row, _jpeg_encode,
                                    _jpeg_encode_progressive, _jpeg_mode)
    from rayxt.multimodal import _decode_jpeg_array
    from tests.oracle.jpeg_oracle import oracle_decode_jpeg

    for i, (w, h) in enumerate([(8, 8), (20, 12), (33, 17), (47, 31)]):
        src = _body(i + 501, h * w * 3).reshape(h, w, 3)
        base = _decode_jpeg_array(_jpeg_encode(src, 85))
        for split in (False, True):
            payload = _jpeg_encode_progressive(src, 85, dc_split=split)
            got = _decode_jpeg_array(payload)
            assert (got == base).all(), (w, h, split)
            assert (oracle_decode_jpeg(payload) == got).all(), (w, h, split)
    # the media corpus exercises baseline AND both progressive shapes
    modes = {_jpeg_mode(i) for i in range(300) if _is_jpeg_row(i)}
    assert modes == {0, 1, 2}


def test_bloom_filter_engine_matches_oracle(ray_session):
    """Distributed Bloom build (partial-bitmap OR AggregateFn) ==
    naive per-value oracle restatement bit-for-bit — including WHICH
    non-members false-positive; no false negatives ever; measured FPR
    within theory; partial-bitmap merge is order/partition-independent;
    negate=True keeps only definite non-members."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rayxt.sketches import (bloom_build, bloom_contains,
                                bloom_filter_ds, bloom_positions)
    from tests.oracle.sketches import oracle_bloom_bits, oracle_bloom_hits

    members = [f"url-{i}" for i in range(2000)]
    n_bits, k = 1 << 14, 5
    ds = rd.from_arrow(pa.table({"k": members})).repartition(7)
    bits = bloom_build(ds, key_col="k", n_bits=n_bits, n_hashes=k)

    # bit-for-bit vs the oracle's position set
    eng_set = {int(w_i * 64 + b) for w_i, w in enumerate(bits.tolist())
               for b in range(64) if (w >> b) & 1}
    assert eng_set == oracle_bloom_bits(members, n_bits, k)

    # no false negatives; FP parity with the oracle on mixed probes
    assert bloom_contains(bits, pa.array(members), k).all()
    probes = [f"url-{i}" for i in range(1500, 3500)]
    got = bloom_contains(bits, pa.array(probes), k).tolist()
    want = [h for _, h in oracle_bloom_hits(members, probes,
                                            n_bits=n_bits, n_hashes=k)]
    assert got == want
    # measured FPR within 3x of (1 - e^{-kn/m})^k
    theory = (1 - np.exp(-k * len(members) / n_bits)) ** k
    fpr = np.mean(got[500:])
    assert fpr <= max(3 * theory, 0.02), (fpr, theory)

    # partition independence: different partitioning, same bitmap
    bits2 = bloom_build(ds.repartition(2), key_col="k",
                        n_bits=n_bits, n_hashes=k)
    assert np.array_equal(bits, bits2)

    # filter / negate semantics
    probe_ds = rd.from_arrow(pa.table({"k": probes}))
    kept = bloom_filter_ds(probe_ds, bits, key_col="k",
                           n_hashes=k).to_pandas()
    anti = bloom_filter_ds(probe_ds, bits, key_col="k", n_hashes=k,
                           negate=True).to_pandas()
    assert len(kept) + len(anti) == len(probes)
    assert set(p for p in probes if p in set(members)) <= set(kept["k"])
    assert not (set(anti["k"]) & set(members))

    # numeric keys share the frozen spec
    ints = list(range(777))
    ids = rd.from_arrow(pa.table({"k": pa.array(ints, pa.int64())}))
    ibits = bloom_build(ids, key_col="k", n_bits=1 << 12, n_hashes=4)
    iset = {int(w_i * 64 + b) for w_i, w in enumerate(ibits.tolist())
            for b in range(64) if (w >> b) & 1}
    assert iset == oracle_bloom_bits(ints, 1 << 12, 4)
    # empty build: nothing is a member
    ebits = bloom_build(ids.filter(lambda r: False), key_col="k",
                        n_bits=1 << 12, n_hashes=4)
    assert not bloom_contains(ebits, pa.array(ints, pa.int64()), 4).any()
    assert bloom_positions(pa.array(["x"]), 1 << 12, 4).shape == (1, 4)
