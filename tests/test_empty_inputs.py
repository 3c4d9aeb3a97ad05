"""Every library operator must survive an EMPTY (but correctly typed)
input dataset — at corpus scale a filter routinely drains whole
partitions, and Ray Data's schema-less empty blocks are a documented
crash class (see dedup.connected_components notes).  Each test asserts
a zero-row result with the right columns, not an exception."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _empty(schema: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(
        {k: pa.array([], t) for k, t in schema.items()}))


EV = {"event_id": pa.int64(), "user_id": pa.int64(),
      "ts": pa.timestamp("us"), "value": pa.float64()}
DOC = {"doc_id": pa.int64(), "text": pa.string(), "lang": pa.string(),
       "n_chars": pa.int64()}


def test_windows_ops_on_empty(ray_session):
    from rayxt.windows import (assign_hopping_windows, corpus_quantiles_sketch,
                               grouped_mode, grouped_topk,
                               group_quantiles_sketch, sequence_stats,
                               sessionize, pivot_count, global_rank)

    ds = _empty(EV)
    assert assign_hopping_windows(
        ds, ts_col="ts", size_us=7_200_000_000, hop_us=1_800_000_000,
        cols=["user_id", "value"]).count() == 0
    assert sessionize(ds, key="user_id", ts_col="ts").count() == 0
    assert grouped_topk(ds, key="user_id", order_col="value",
                        k=3).count() == 0
    assert grouped_mode(ds, key="user_id",
                        value_col="event_id").count() == 0
    assert group_quantiles_sketch(ds, key="user_id",
                                  value_col="value").count() == 0
    assert len(corpus_quantiles_sketch(ds, value_col="value")) == 0
    assert sequence_stats(ds, key="user_id", ts_col="ts",
                          tie_col="event_id", first_gap=-1).count() == 0
    piv = pivot_count(ds.map_batches(
        lambda t: t.append_column("kind", pa.array([], pa.string())),
        batch_format="pyarrow"), key="user_id", cat_col="kind",
        categories=("a", "b"))
    assert piv.count() == 0
    assert global_rank(ds, order_col="value",
                       tie_col="event_id").count() == 0


def test_joins_on_empty(ray_session):
    from rayxt.joins import asof_join, broadcast_lookup, range_join_count

    left = _empty(EV)
    right = _empty(EV)
    assert asof_join(left, right, key="user_id", on="ts",
                     left_cols=["event_id", "user_id", "ts"],
                     right_cols=["event_id"],
                     right_suffix="_b").count() == 0
    assert range_join_count(
        left, right, key="user_id", on="ts", before=10, after=0,
        left_cols=["event_id", "user_id", "ts"]).count() == 0
    assert broadcast_lookup(left, key_col="user_id", keys=[1], values=["x"],
                            out_col="v").count() == 0
    # one-sided empties: every left row still counts zero right matches
    import ray.data as rd
    l2 = rd.from_pandas(pd.DataFrame({
        "event_id": [1], "user_id": [7],
        "ts": pd.to_datetime(["2024-01-01"]).astype("datetime64[us]"),
        "value": [0.5]}))
    out = range_join_count(l2, right, key="user_id", on="ts", before=10,
                           after=0, left_cols=["event_id", "user_id", "ts"],
                           out_col="n").to_pandas()
    assert out["n"].tolist() == [0]


def test_text_and_sampling_on_empty(ray_session):
    from rayxt.sampling import hash_sample_int, stratified_hash_sample
    from rayxt.text import (add_bpe_token_count, add_fingerprint,
                            add_stopword_ratio, add_token_count,
                            document_frequency, tfidf_top_terms, top_ngrams)

    ds = _empty(DOC)
    assert add_token_count(ds).count() == 0
    assert add_bpe_token_count(ds).count() == 0
    assert add_stopword_ratio(ds).count() == 0
    assert add_fingerprint(ds).count() == 0
    assert hash_sample_int(ds, "doc_id", 0.5).count() == 0
    assert stratified_hash_sample(ds, "doc_id", "lang",
                                  {"en": 0.5}).count() == 0
    assert document_frequency(ds).count() == 0
    assert tfidf_top_terms(ds, n_docs=1).count() == 0
    ng = top_ngrams(ds, n=2, k=5)
    assert len(ng) == 0


def test_dedup_and_sketches_on_empty(ray_session):
    from rayxt.dedup import dedup_keep_first, exact_dedup
    from rayxt.sketches import group_distinct_hll, heavy_hitters

    ds = _empty(DOC)
    assert exact_dedup(ds, "doc_id").count() == 0
    assert dedup_keep_first(ds, "doc_id", join_partitions=2).count() == 0
    assert group_distinct_hll(_empty(EV), key="user_id",
                              value_col="event_id").count() == 0
    assert heavy_hitters(ds, value_col="lang", k=3).count() == 0


def test_new_session_ops_on_empty(ray_session):
    """Round-3 late additions: rolling/string-agg/grid, stats,
    broadcast semi, streaming dedup, JSON/entropy/url, pdf, heuristic
    main-content."""
    from rayxt.joins import broadcast_semi_filter
    from rayxt.stats import grouped_corr, zscore
    from rayxt.state import streaming_dedup
    from rayxt.windows import dense_grid, ordered_string_agg, rolling_stats

    ds = _empty(EV)
    assert rolling_stats(ds, key="user_id", ts_col="ts",
                         tie_col="event_id", value_col="value",
                         window=5).count() == 0
    et = ds.map_batches(
        lambda t: t.append_column("kind", pa.array([], pa.string())),
        batch_format="pyarrow")
    assert ordered_string_agg(et, key="user_id", ts_col="ts",
                              tie_col="event_id",
                              cat_col="kind").count() == 0
    day = ds.map_batches(
        lambda t: t.append_column("day", pa.array([], pa.string())),
        batch_format="pyarrow")
    assert len(dense_grid(day, dim_a="day", dim_b="user_id")) == 0
    assert len(grouped_corr(ds, key="user_id", x_col="value",
                            y_col="value")) == 0
    assert zscore(ds, key="user_id", value_col="value").count() == 0
    assert broadcast_semi_filter(ds, _empty(EV), key_col="user_id",
                                 keys_key="user_id").count() == 0
    deduped, _dd = streaming_dedup(_empty(DOC), key_col="text")
    assert deduped.count() == 0


def test_new_text_and_extract_ops_on_empty(ray_session):
    from rayxt.boilerplate import extract_main_content
    from rayxt.pdf import PDF_SCHEMA, extract_pdf_text
    from rayxt.text import add_char_entropy, add_json_int_field, add_url_parts

    doc = _empty(DOC)
    assert add_char_entropy(doc).count() == 0
    props = _empty({"props": pa.string()})
    assert add_json_int_field(props, col="props", field="k",
                              out="k").count() == 0
    urls = _empty({"url": pa.string()})
    assert add_url_parts(urls).count() == 0
    pages = _empty({"url": pa.string(), "html": pa.binary()})
    assert extract_main_content(pages, concurrency=1).count() == 0
    pdfs = _empty({f.name: f.type for f in PDF_SCHEMA})
    assert extract_pdf_text(pdfs, concurrency=1).count() == 0


def test_session2_ops_on_empty(ray_session):
    """This session's operators over zero-row TYPED inputs: chunking,
    normalization, URL canonicalization, inverted index, paragraph
    dedup (both paths), dup-ngram stats (both paths), hamming pairs,
    pHash/audio stages, BPE train+apply, PCA, logreg."""
    import ray.data as rd

    from rayxt.bpe import bpe_token_counts, bpe_train
    from rayxt.dedup import dup_ngram_stats, hamming_pairs, paragraph_dedup
    from rayxt.multimodal import (MEDIA_SCHEMA, extract_audio_features,
                                  image_neardup_pairs, phash_images)
    from rayxt.stats import logreg_predict, logreg_train
    from rayxt.text import (canonicalize_url, chunk_documents,
                            inverted_index, normalize_text)

    doc = _empty(DOC)
    assert chunk_documents(doc).count() == 0
    assert normalize_text(doc).count() == 0
    assert inverted_index(doc).count() == 0
    for thr in (10, 0):
        assert paragraph_dedup(doc, "doc_id",
                               broadcast_threshold=thr).count() == 0
        assert dup_ngram_stats(doc, "doc_id",
                               broadcast_threshold=thr).count() == 0

    urls = _empty({"url_id": pa.int64(), "url": pa.string()})
    assert canonicalize_url(urls).count() == 0

    hashes = _empty({"id": pa.int64(), "h": pa.int64()})
    assert hamming_pairs(hashes, "id", "h").count() == 0

    media = rd.from_arrow(pa.table(
        {f.name: pa.array([], f.type) for f in MEDIA_SCHEMA}))
    assert extract_audio_features(media, concurrency=1).count() == 0
    assert phash_images(media, concurrency=1).count() == 0
    assert image_neardup_pairs(media, concurrency=1).count() == 0

    merges = bpe_train(doc, n_merges=5)
    assert merges.num_rows == 0
    assert bpe_token_counts(doc, merges, concurrency=1).count() == 0

    feat = _empty({"i": pa.int64(), "x1": pa.float64(), "y": pa.float64()})
    w = logreg_train(feat, feature_cols=["x1"], label_col="y", iters=3)
    assert w == [0.0, 0.0]  # n == 0: weights stay at init
    assert logreg_predict(feat, w, feature_cols=["x1"]).count() == 0

    from rayxt.ann import pca_project
    emb = _empty({"vec_id": pa.int64(),
                  "embedding": pa.list_(pa.float32())})
    try:
        assert pca_project(emb, k=2).count() == 0
    except ZeroDivisionError:
        pytest.fail("pca_project must survive an empty input")


def test_connected_components_on_empty(ray_session):
    """Regression: the hi/lo checksum split returned a None-valued
    dict (not None) on an empty edge set and crashed int(None)."""
    from rayxt.dedup import connected_components

    pairs = _empty({"id_a": pa.int64(), "id_b": pa.int64()})
    out = connected_components(pairs)
    assert out.count() == 0


def test_session3_ops_on_empty(ray_session):
    from rayxt.markdown import extract_markdown
    from rayxt.metadata import filter_noindex
    from rayxt.sampling import temperature_mix_sample
    from rayxt.text import add_compression_ratio, filter_keywords
    from rayxt.wat import build_wat

    pages = _empty({"url": pa.string(), "warc_ts": pa.timestamp("us"),
                    "html": pa.binary()})
    assert extract_markdown(pages).count() == 0
    assert build_wat(pages).count() == 0
    meta = _empty({"url": pa.string(), "meta_robots": pa.string(),
                   "status": pa.string()})
    assert filter_noindex(meta).count() == 0
    docs = _empty(DOC)
    assert add_compression_ratio(docs).count() == 0
    assert filter_keywords(docs, ["x"]).count() == 0
    assert temperature_mix_sample(docs, "doc_id", "lang",
                                  target_rows=10).count() == 0


def test_session4_ops_on_empty(ray_session, tmp_path):
    import ray.data as rd

    from rayxt.cdx import export_zipnum, zipnum_fetch, zipnum_lookup
    from rayxt.pipeline import detect_encoding
    from rayxt.psl import add_registered_domain
    from rayxt.stats import group_stats_filter
    from rayxt.text import add_word_stats, gopher_filter
    from rayxt.warc import read_records_at

    doc = _empty(DOC)
    assert add_word_stats(doc).count() == 0
    assert gopher_filter(doc).count() == 0
    assert group_stats_filter(doc, key_col="lang",
                              value_col="n_chars",
                              min_count=1).count() == 0

    pages = _empty({"url": pa.string(), "html": pa.binary()})
    enc = detect_encoding(pages)
    assert enc.count() == 0

    hosts = _empty({"host": pa.string()})
    assert add_registered_domain(hosts).count() == 0

    coords = _empty({"filename": pa.string(), "offset": pa.int64(),
                     "length": pa.int64()})
    assert read_records_at(coords, str(tmp_path)).count() == 0

    cdx = _empty({"urlkey": pa.string(), "ts": pa.timestamp("us"),
                  "url": pa.string(), "mime": pa.string(),
                  "status": pa.int32(), "digest": pa.string(),
                  "length": pa.int64(), "offset": pa.int64(),
                  "filename": pa.string()})
    zdir = str(tmp_path / "z")
    export_zipnum(cdx, zdir, num_parts=2, lines_per_block=4,
                  sample_mod=1)
    assert zipnum_lookup(zdir, "anything").num_rows == 0
    probes = _empty({"urlkey": pa.string()})
    assert zipnum_fetch(probes, zdir).count() == 0
