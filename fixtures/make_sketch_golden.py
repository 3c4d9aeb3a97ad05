"""Generate golden parquet for the sketch / heuristic queries from the
NAIVE oracle restatements (``tests/oracle/sketches.py``), never from
the engine — same discipline as ``make_golden.py``.

Inputs are all deterministic: the driver's seed-42 synthetic tables at
sf0.01 (the correctness-gate scale; TESTDATA.md), the committed pages
conformance corpus, and the index-derived media table.  Run once
(``python fixtures/make_sketch_golden.py``); outputs under
``fixtures/data/`` are committed.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fixtures.gen_media import (  # noqa: E402
    generate_media_table,
    media_ground_truth,
    media_row,
    phash_ground_truth_hash,
)
from fixtures.gen_pages import generate_url_table  # noqa: E402
from tests.oracle.audio_oracle import oracle_audio_features  # noqa: E402
from tests.oracle.url_oracle import oracle_canonicalize_url  # noqa: E402
from tests.oracle.phash_oracle import oracle_hamming_pairs  # noqa: E402
from tests.oracle import oracle_rule_hits, oracle_selector_probe  # noqa: E402
from tests.oracle.sketches import (
    oracle_bloom_hits,
    oracle_lm_ppl,
    oracle_lm_train,
    oracle_pack_documents,  # noqa: E402
    ddsketch_group_quantiles,
    oracle_bpe_token_counts,
    oracle_bpe_train,
    oracle_components,
    oracle_compression,
    oracle_fingerprint,
    oracle_temperature_mix,
    oracle_hll_distinct,
    oracle_kmeans,
    oracle_logreg,
    oracle_logreg_scores,
    oracle_ivf_topk,
    oracle_langid,
    oracle_lsh_topk,
    oracle_decontaminate,
    oracle_dup_ngram_stats,
    oracle_remove_dup_substrings,
    oracle_semdedup,
    oracle_dsir,
    oracle_minhash_pairs,
    oracle_ngram_jaccard_pairs,
    oracle_pca,
    oracle_repetition,
    oracle_simhash_pairs,
)

SF_DIR = os.environ.get("RAYXT_GOLDEN_SF_DIR", "/root/testdata/sf0.01")
DATA_DIR = os.path.join(REPO, "fixtures", "data")
ANN_K = 5      # keep in sync with __ray_entry__._ANN_K
ANN_NQ = 3     # keep in sync with __ray_entry__._ANN_NQ
N_MEDIA = 300  # keep in sync with __ray_entry__._q_media_decode
N_PHASH = 120  # keep in sync with __ray_entry__._q_media_phash
PHASH_MAX_HAMMING = 7  # keep in sync with __ray_entry__._q_media_image_neardup
N_URLS = 400   # keep in sync with __ray_entry__._q_pages_url_canon
N_BPE_MERGES = 25  # keep in sync with __ray_entry__._q_doc_bpe_merges
BLOOM_BITS = 1 << 12  # keep in sync with __ray_entry__._q_customers_bloom_hits
BLOOM_K = 5
LM_VOCAB = 500   # keep in sync with __ray_entry__._q_doc_lm_ppl
LM_ALPHA = 0.1
PACK_MAX = 256   # keep in sync with __ray_entry__._q_doc_pack
MIX_ALPHA = 0.5  # keep in sync with __ray_entry__._q_doc_mix_sample
MIX_TARGET = 200


def main() -> None:
    os.makedirs(DATA_DIR, exist_ok=True)
    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                         columns=["doc_id", "text"])
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()

    mh = oracle_minhash_pairs(ids, texts, threshold=0.8)
    pq.write_table(pa.table({
        "id_a": pa.array([p[0] for p in mh], pa.int64()),
        "id_b": pa.array([p[1] for p in mh], pa.int64()),
        "jaccard": pa.array([p[2] for p in mh], pa.float64()),
    }), os.path.join(DATA_DIR, "golden_minhash_pairs.parquet"))

    nj = oracle_ngram_jaccard_pairs(ids, texts, threshold=0.5)
    pq.write_table(pa.table({
        "id_a": pa.array([p[0] for p in nj], pa.int64()),
        "id_b": pa.array([p[1] for p in nj], pa.int64()),
        "jaccard": pa.array([p[2] for p in nj], pa.float64()),
    }), os.path.join(DATA_DIR, "golden_jaccard_pairs.parquet"))

    sh = oracle_simhash_pairs(ids, texts, max_hamming=3)
    pq.write_table(pa.table({
        "id_a": pa.array([p[0] for p in sh], pa.int64()),
        "id_b": pa.array([p[1] for p in sh], pa.int64()),
        "hamming": pa.array([p[2] for p in sh], pa.int64()),
    }), os.path.join(DATA_DIR, "golden_simhash_pairs.parquet"))

    cc = oracle_components(mh)
    pq.write_table(pa.table({
        "id": pa.array([p[0] for p in cc], pa.int64()),
        "cluster_id": pa.array([p[1] for p in cc], pa.int64()),
    }), os.path.join(DATA_DIR, "golden_neardup_clusters.parquet"))

    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "lang_guess": pa.array([oracle_langid(t or "") for t in texts],
                               pa.string()),
    }), os.path.join(DATA_DIR, "golden_langid.parquet"))

    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "fingerprint": pa.array([oracle_fingerprint(t or "") for t in texts],
                                pa.string()),
    }), os.path.join(DATA_DIR, "golden_fingerprint.parquet"))

    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "compression_ratio": pa.array(
            [oracle_compression(t or "") for t in texts], pa.float64()),
    }), os.path.join(DATA_DIR, "golden_compression.parquet"))

    langs = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                          columns=["doc_id", "lang"])
    mix = oracle_temperature_mix(
        langs.column("doc_id").to_pylist(),
        langs.column("lang").to_pylist(),
        alpha=MIX_ALPHA, target_rows=MIX_TARGET)
    pq.write_table(pa.table({
        "doc_id": pa.array([m[0] for m in mix], pa.int64()),
        "lang": pa.array([m[1] for m in mix], pa.string()),
    }), os.path.join(DATA_DIR, "golden_mix_sample.parquet"))

    reps = [oracle_repetition(t or "") for t in texts]
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "max_word_frac": pa.array([r[0] for r in reps], pa.float64()),
        "top_2gram_frac": pa.array([r[1] for r in reps], pa.float64()),
        "dup_3gram_frac": pa.array([r[2] for r in reps], pa.float64()),
    }), os.path.join(DATA_DIR, "golden_repetition.parquet"))

    emb = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"),
                        columns=["vec_id", "embedding", "label"])
    vids = emb.column("vec_id").to_pylist()
    vecs = emb.column("embedding").to_pylist()
    labels = emb.column("label").to_pylist()
    # query selection mirrors __ray_entry__._ann_queries: vec_id < NQ
    # among the first 64 rows, sorted by vec_id
    queries = sorted(
        ((i, v) for i, v in zip(vids[:64], vecs[:64]) if i < ANN_NQ),
        key=lambda t: t[0],
    )
    lsh = oracle_lsh_topk(vids, vecs, queries, k=ANN_K)
    pq.write_table(pa.table({
        "query_id": pa.array([r[0] for r in lsh], pa.int64()),
        "id": pa.array([r[1] for r in lsh], pa.int64()),
        "rank": pa.array([r[2] for r in lsh], pa.int64()),
        "cos": pa.array([r[3] for r in lsh], pa.float64()),
    }), os.path.join(DATA_DIR, "golden_ann_lsh.parquet"))

    ivf = oracle_ivf_topk(vids, vecs, labels, queries, k=ANN_K, nprobe=3)
    pq.write_table(pa.table({
        "query_id": pa.array([r[0] for r in ivf], pa.int64()),
        "id": pa.array([r[1] for r in ivf], pa.int64()),
        "rank": pa.array([r[2] for r in ivf], pa.int64()),
        "cos": pa.array([r[3] for r in ivf], pa.float64()),
    }), os.path.join(DATA_DIR, "golden_ann_ivf.parquet"))

    # media golden = the generator's GROUND TRUTH stats (computed from
    # the source arrays before encoding) — the engine must invert the
    # PNG/WAV/RAYX encodings to match; no decoder runs here
    media = generate_media_table(N_MEDIA)
    dec = [media_ground_truth(i) for i in media.column("media_id").to_pylist()]
    out = media.drop_columns(["payload"])
    out = out.append_column("width", pa.array([d["width"] for d in dec], pa.int32()))
    out = out.append_column("height", pa.array([d["height"] for d in dec], pa.int32()))
    out = out.append_column("n_frames",
                            pa.array([d["n_frames"] for d in dec], pa.int32()))
    out = out.append_column("mean_value",
                            pa.array([d["mean_value"] for d in dec], pa.float64()))
    out = out.append_column("decode_status",
                            pa.array([d["decode_status"] for d in dec], pa.string()))
    pq.write_table(out, os.path.join(DATA_DIR, "golden_media_decode.parquet"))

    # audio features golden = the INDEPENDENT stdlib-wave oracle over the
    # media table's audio rows (the engine parses RIFF itself)
    aud_ids, feats = [], []
    for i in range(N_MEDIA):
        row = media_row(i)
        if row["kind"] != "audio":
            continue
        aud_ids.append(i)
        feats.append(oracle_audio_features(row["payload"]))
    pq.write_table(pa.table({
        "media_id": pa.array(aud_ids, pa.int64()),
        "duration_s": pa.array([f["duration_s"] for f in feats], pa.float64()),
        "rms": pa.array([f["rms"] for f in feats], pa.float64()),
        "zcr": pa.array([f["zcr"] for f in feats], pa.float64()),
        "spectral_centroid": pa.array(
            [f["spectral_centroid"] for f in feats], pa.float64()),
        "dominant_freq": pa.array(
            [f["dominant_freq"] for f in feats], pa.float64()),
    }), os.path.join(DATA_DIR, "golden_audio_features.parquet"))

    # pHash goldens: hashes via the naive per-coefficient oracle (source
    # arrays for PNG rows, independent JPEG decode for lossy rows), and
    # near-dup pairs via brute-force all-pairs hamming
    ph_ids = list(range(N_PHASH))
    ph_hashes = [phash_ground_truth_hash(j) for j in ph_ids]
    pq.write_table(pa.table({
        "media_id": pa.array(ph_ids, pa.int64()),
        "phash": pa.array(ph_hashes, pa.int64()),
    }), os.path.join(DATA_DIR, "golden_phash.parquet"))
    pairs = oracle_hamming_pairs(ph_ids, ph_hashes, PHASH_MAX_HAMMING)
    pq.write_table(pa.table({
        "id_a": pa.array([p[0] for p in pairs], pa.int64()),
        "id_b": pa.array([p[1] for p in pairs], pa.int64()),
        "hamming": pa.array([p[2] for p in pairs], pa.int64()),
    }), os.path.join(DATA_DIR, "golden_phash_pairs.parquet"))
    icl = oracle_components([(a, b) for a, b, _d in pairs])
    pq.write_table(pa.table({
        "id": pa.array([r[0] for r in icl], pa.int64()),
        "cluster_id": pa.array([r[1] for r in icl], pa.int64()),
    }), os.path.join(DATA_DIR, "golden_image_clusters.parquet"))

    ev = pq.read_table(os.path.join(SF_DIR, "events.parquet"),
                       columns=["event_type", "value"])
    dq = ddsketch_group_quantiles(
        zip(ev.column("event_type").to_pylist(),
            ev.column("value").to_pylist()),
        qs=(0.5, 0.95), alpha=0.01)
    etypes = sorted(dq)
    pq.write_table(pa.table({
        "event_type": pa.array(etypes, pa.string()),
        "p50": pa.array([dq[k][0] for k in etypes], pa.float64()),
        "p95": pa.array([dq[k][1] for k in etypes], pa.float64()),
    }), os.path.join(DATA_DIR, "golden_ev_quantiles_sketch.parquet"))

    # corpus-wide (one giant group): same restatement with a constant key
    gq = ddsketch_group_quantiles(
        (("all", v) for v in ev.column("value").to_pylist()),
        qs=(0.5, 0.95), alpha=0.01)["all"]
    pq.write_table(pa.table({
        "p50": pa.array([gq[0]], pa.float64()),
        "p95": pa.array([gq[1]], pa.float64()),
    }), os.path.join(DATA_DIR, "golden_ev_quantiles_global.parquet"))

    # winsorization: clip bounds from the same sketch restatement at
    # p01/p99, then a plain clip over every event row
    evw = pq.read_table(os.path.join(SF_DIR, "events.parquet"),
                        columns=["user_id", "ts", "value"])
    wvals = evw.column("value").to_numpy()
    lo, hi = ddsketch_group_quantiles(
        (("all", v) for v in wvals), qs=(0.01, 0.99), alpha=0.01)["all"]
    import numpy as _np
    clipped = _np.round(_np.clip(wvals.astype("float64"), lo, hi), 6)
    pq.write_table(evw.append_column(
        "value_w", pa.array(clipped, pa.float64())),
        os.path.join(DATA_DIR, "golden_winsorize.parquet"))

    # bigram LM perplexity: model trained on the documents corpus by
    # the naive restatement, every doc scored by it
    lm_model = oracle_lm_train(texts, vocab_size=LM_VOCAB, alpha=LM_ALPHA)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "ppl": pa.array([oracle_lm_ppl(lm_model, t) for t in texts],
                        pa.float64()),
    }), os.path.join(DATA_DIR, "golden_lm_ppl.parquet"))

    # sequence packing golden
    packed = oracle_pack_documents(ids, texts, max_tokens=PACK_MAX)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_tokens": pa.array([packed[i][0] for i in ids], pa.int64()),
        "pack_id": pa.array([packed[i][1] for i in ids], pa.int64()),
        "pack_pos": pa.array([packed[i][2] for i in ids], pa.int64()),
        "oversize": pa.array([packed[i][3] for i in ids], pa.bool_()),
    }), os.path.join(DATA_DIR, "golden_pack.parquet"))

    # Bloom membership: build over the custkeys of URGENT orders,
    # probe every customer — hits INCLUDE the frozen spec's false
    # positives (the filtered build guarantees true non-members exist)
    ords_t = pq.read_table(os.path.join(SF_DIR, "orders.parquet"),
                           columns=["o_custkey", "o_orderpriority"])
    import pyarrow.compute as _pc
    ords = ords_t.filter(
        _pc.equal(ords_t["o_orderpriority"], "1-URGENT"))
    cust = pq.read_table(os.path.join(SF_DIR, "customer.parquet"),
                         columns=["c_custkey"])
    bh = oracle_bloom_hits(
        [int(v) for v in ords.column("o_custkey").to_pylist()],
        [int(v) for v in cust.column("c_custkey").to_pylist()],
        n_bits=BLOOM_BITS, n_hashes=BLOOM_K)
    pq.write_table(pa.table({
        "c_custkey": pa.array([k for k, _ in bh], pa.int64()),
        "bloom_hit": pa.array([h for _, h in bh], pa.bool_()),
    }), os.path.join(DATA_DIR, "golden_bloom.parquet"))

    emb = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    km = oracle_kmeans(emb.column("vec_id").to_pylist(),
                       emb.column("embedding").to_pylist(), k=8, iters=5)
    kids = sorted(km)
    pq.write_table(pa.table({
        "vec_id": pa.array(kids, pa.int64()),
        "cluster": pa.array([km[i] for i in kids], pa.int64()),
    }), os.path.join(DATA_DIR, "golden_kmeans.parquet"))

    pca = oracle_pca(emb.column("vec_id").to_pylist(),
                     emb.column("embedding").to_pylist(), k=4)
    pids = sorted(pca)
    pq.write_table(pa.table({
        "vec_id": pa.array(pids, pa.int64()),
        **{f"pc{j + 1}": pa.array([pca[i][j] for i in pids], pa.float64())
           for j in range(4)},
    }), os.path.join(DATA_DIR, "golden_pca.parquet"))

    evu = pq.read_table(os.path.join(SF_DIR, "events.parquet"),
                        columns=["event_type", "user_id"])
    hll = oracle_hll_distinct(evu.column("event_type").to_pylist(),
                              evu.column("user_id").to_pylist(), p=10)
    etypes = sorted(hll)
    pq.write_table(pa.table({
        "event_type": pa.array(etypes, pa.string()),
        "n_users_hll": pa.array([hll[k] for k in etypes], pa.int64()),
    }), os.path.join(DATA_DIR, "golden_ev_hll.parquet"))

    # decontamination: eval set = docs with doc_id % 25 == 0, 13-grams
    dd = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                       columns=["doc_id", "text"])
    d_ids = dd.column("doc_id").to_pylist()
    d_texts = dd.column("text").to_pylist()
    ev_texts = [t for i, t in zip(d_ids, d_texts) if i % 25 == 0]
    dec = oracle_decontaminate(d_ids, d_texts, ev_texts, n=13)
    dkeys = sorted(dec)
    pq.write_table(pa.table({
        "doc_id": pa.array(dkeys, pa.int64()),
        "n_overlap_windows": pa.array([dec[i][0] for i in dkeys], pa.int64()),
        "contaminated": pa.array([dec[i][1] for i in dkeys], pa.bool_()),
    }), os.path.join(DATA_DIR, "golden_decontaminate.parquet"))

    # logistic regression (feature spec: x1 = n_chars/100, y = lang=='en')
    ltab = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                         columns=["doc_id", "n_chars", "lang"])
    order = pa.compute.sort_indices(ltab.column("doc_id"))
    ltab = ltab.take(order)
    x1 = ltab.column("n_chars").to_numpy().astype("float64") / 100.0
    y = pa.compute.equal(ltab.column("lang"), "en") \
        .to_numpy(zero_copy_only=False).astype("float64")
    lw = oracle_logreg([x1], y, iters=20, lr=1.0)
    pq.write_table(pa.table({
        "idx": pa.array(range(len(lw)), pa.int64()),
        "weight": pa.array([round(w, 6) for w in lw], pa.float64()),
    }), os.path.join(DATA_DIR, "golden_logreg_weights.parquet"))
    scores = oracle_logreg_scores([x1], lw)
    pq.write_table(pa.table({
        "doc_id": ltab.column("doc_id"),
        "score": pa.array(scores, pa.float64()),
    }), os.path.join(DATA_DIR, "golden_logreg_scores.parquet"))

    # BPE tokenizer training + application (naive full-scan restatement)
    dtab = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                         columns=["doc_id", "text"])
    merges = oracle_bpe_train(dtab.column("text").to_pylist(),
                              n_merges=N_BPE_MERGES)
    pq.write_table(pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int64()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "count": pa.array([m[3] for m in merges], pa.int64()),
    }), os.path.join(DATA_DIR, "golden_bpe_merges.parquet"))
    bc = oracle_bpe_token_counts(dtab.column("doc_id").to_pylist(),
                                 dtab.column("text").to_pylist(), merges)
    bids = sorted(bc)
    pq.write_table(pa.table({
        "doc_id": pa.array(bids, pa.int64()),
        "n_bpe_learned": pa.array([bc[i] for i in bids], pa.int64()),
    }), os.path.join(DATA_DIR, "golden_bpe_counts.parquet"))

    # URL canonicalization golden via the urllib-based oracle
    urls = generate_url_table(N_URLS)
    canon = [oracle_canonicalize_url(u)
             for u in urls.column("url").to_pylist()]
    pq.write_table(urls.append_column(
        "url_canon", pa.array(canon, pa.string())),
        os.path.join(DATA_DIR, "golden_url_canon.parquet"))

    # duplicated n-gram spans over the committed extraction golden
    gx = pq.read_table(os.path.join(DATA_DIR, "golden_extract.parquet"),
                       columns=["url", "warc_ts", "text", "status"])
    ok = gx.filter(pa.compute.equal(gx["status"], "ok"))
    keys = list(zip(ok.column("url").to_pylist(),
                    ok.column("warc_ts").to_pylist()))
    stats = oracle_dup_ngram_stats(keys, ok.column("text").to_pylist(), n=20)
    skeys = sorted(stats)
    pq.write_table(pa.table({
        "url": pa.array([k[0] for k in skeys], pa.string()),
        "warc_ts": pa.array([k[1] for k in skeys],
                            ok.schema.field("warc_ts").type),
        "n_windows": pa.array([stats[k][0] for k in skeys], pa.int64()),
        "n_dup_windows": pa.array([stats[k][1] for k in skeys], pa.int64()),
        "dup_fraction": pa.array([stats[k][2] for k in skeys], pa.float64()),
    }), os.path.join(DATA_DIR, "golden_dup_ngrams.parquet"))

    # SemDeDup over the sf0.01 embeddings (k=8, threshold=0.4 — the
    # synthetic embeddings are near-orthogonal, so the paper's 0.9+
    # regime would be a no-op gate)
    eids = emb.column("vec_id").to_pylist()
    evecs = emb.column("embedding").to_pylist()
    sd = oracle_semdedup(eids, evecs, k=8, threshold=0.4)
    pq.write_table(pa.table({
        "vec_id": pa.array(eids, pa.int64()),
        "cluster": pa.array([sd[i][0] for i in eids], pa.int64()),
        "centroid_sim": pa.array([sd[i][1] for i in eids], pa.float64()),
        "kept": pa.array([sd[i][2] for i in eids], pa.bool_()),
    }), os.path.join(DATA_DIR, "golden_semdedup.parquet"))

    # DSIR importance weights + gumbel-top-k sample: target = the
    # English docs with doc_id % 5 == 0 (a lang-skewed exemplar set)
    dtab = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                         columns=["doc_id", "text", "lang"])
    dmask = [(l == "en" and i % 5 == 0) for i, l in
             zip(dtab.column("doc_id").to_pylist(),
                 dtab.column("lang").to_pylist())]
    tgt_texts = [t for t, m in
                 zip(dtab.column("text").to_pylist(), dmask) if m]
    dsir = oracle_dsir(ids, texts, tgt_texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_grams": pa.array([dsir[i][0] for i in ids], pa.int64()),
        "dsir_logw": pa.array([dsir[i][1] for i in ids], pa.float64()),
    }), os.path.join(DATA_DIR, "golden_dsir_weights.parquet"))
    picked = sorted(dsir, key=lambda i: (-dsir[i][2], i))[:100]
    pq.write_table(pa.table({
        "doc_id": pa.array(picked, pa.int64()),
        "dsir_logw": pa.array([dsir[i][1] for i in picked], pa.float64()),
        "gumbel_key": pa.array([dsir[i][2] for i in picked], pa.float64()),
    }), os.path.join(DATA_DIR, "golden_dsir_sample.parquet"))

    # ExactSubstr span removal over the sf0.01 documents table
    rds = oracle_remove_dup_substrings(ids, texts, n=20)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_tokens": pa.array([rds[i][0] for i in ids], pa.int64()),
        "n_removed": pa.array([rds[i][1] for i in ids], pa.int64()),
        "text_dedup": pa.array([rds[i][2] for i in ids], pa.string()),
    }), os.path.join(DATA_DIR, "golden_remove_dup_substrings.parquet"))

    pages = pq.read_table(os.path.join(DATA_DIR, "pages_conf.parquet"),
                          columns=["html"])
    totals: dict[str, int] = {}
    for html in pages.column("html").to_pylist():
        for rule, hits in oracle_rule_hits(html).items():
            totals[rule] = totals.get(rule, 0) + hits
    rules = sorted(totals)
    pq.write_table(pa.table({
        "rule": pa.array(rules, pa.string()),
        "hits": pa.array([totals[r] for r in rules], pa.int64()),
    }), os.path.join(DATA_DIR, "golden_rule_hits.parquet"))

    # selector-tail probe golden: naive document-order walks (no
    # selector engine) over the same conformance pages
    sp: dict[str, int] = {}
    for html in pages.column("html").to_pylist():
        for probe, hits in oracle_selector_probe(html).items():
            sp[probe] = sp.get(probe, 0) + hits
    probes = sorted(sp)
    pq.write_table(pa.table({
        "probe": pa.array(probes, pa.string()),
        "hits": pa.array([sp[p] for p in probes], pa.int64()),
    }), os.path.join(DATA_DIR, "golden_selector_probe.parquet"))

    for name in ("golden_minhash_pairs", "golden_jaccard_pairs",
                 "golden_simhash_pairs",
                 "golden_neardup_clusters", "golden_langid",
                 "golden_fingerprint", "golden_repetition",
                 "golden_ann_lsh", "golden_ann_ivf",
                 "golden_media_decode", "golden_audio_features",
                 "golden_phash", "golden_phash_pairs", "golden_rule_hits",
                 "golden_ev_quantiles_sketch", "golden_ev_quantiles_global",
                 "golden_ev_hll", "golden_kmeans", "golden_pca",
                 "golden_dup_ngrams", "golden_remove_dup_substrings",
                 "golden_semdedup", "golden_dsir_weights", "golden_dsir_sample",
                 "golden_url_canon",
                 "golden_bpe_merges", "golden_bpe_counts",
                 "golden_logreg_weights", "golden_logreg_scores",
                 "golden_decontaminate", "golden_winsorize", "golden_bloom",
                 "golden_lm_ppl", "golden_pack", "golden_selector_probe",
                 "golden_image_clusters"):
        p = os.path.join(DATA_DIR, f"{name}.parquet")
        print(f"{name}: {pq.read_metadata(p).num_rows} rows")


if __name__ == "__main__":
    main()
