"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship main-content extraction pipeline;
``queries()`` exposes one callable per implemented operator/pipeline
from SURVEY.md section 2; ``oracle_sql()`` gives the DuckDB-equivalent
SQL for every SQL-expressible query (same column names, floats rounded
identically on both sides).  Non-SQL-expressible operators (language
ID, fingerprints, MinHash/SimHash pairs, LSH ANN, media decode) have no
oracle entry and get the driver's rows-only check.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init`` / ``ray.shutdown``.

Pages-based queries run over the COMMITTED deterministic conformance
corpus (``fixtures/data/pages_conf.parquet``, 5000 rows) and compare
against oracle-golden parquet generated once by the vendored naive
oracle (``tests/oracle``, via ``fixtures/make_golden.py``) — the
byte-identity gate: the extraction query's value-hash match IS the
per-url text identity check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

_DATA = os.path.join(_REPO, "fixtures", "data")
_PAGES = os.path.join(_DATA, "pages_conf.parquet")
_GOLDEN_EXTRACT = os.path.join(_DATA, "golden_extract.parquet")
_GOLDEN_WIKITABLE = os.path.join(_DATA, "golden_wikitable.parquet")
_GOLDEN_MODS = os.path.join(_DATA, "golden_mods.parquet")
_MEDIA = "/tmp/rayxt_media_conf.parquet"

_ANN_K = 5
_ANN_NQ = 3
_NEARDUP_T = 0.35


def _rd():
    import ray.data as rd

    return rd


def _pool(cap: int = 8):
    """Actor-pool bound that never starves the task operators: at most
    ``cap``, always leaving ~25% of the cluster's CPUs free."""
    try:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 4))
    except Exception:  # pragma: no cover
        ncpu = 4
    return (1, max(2, min(cap, (ncpu * 3) // 4)))


def _docs(sf_dir, columns=None):
    return _rd().read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship pipeline: pages -> actor-pool extraction -> result Dataset."""
    from rayxt.pipeline import extract_pages, read_pages

    ds = read_pages(_PAGES).limit(500)
    ex = extract_pages(ds, concurrency=_pool(4), batch_size=64)
    return ex.select_columns(["url", "warc_ts", "lang", "text", "n_chars", "status"])


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_doc_filter_en(sf_dir):
    import pyarrow.compute as pc

    ds = _docs(sf_dir, columns=["doc_id", "n_chars", "lang"])
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t["lang"], "en")).select(["doc_id", "n_chars"]),
        batch_format="pyarrow",
    )


def _q_doc_token_counts(sf_dir):
    from rayxt.text import add_token_count

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    return add_token_count(ds).select_columns(["doc_id", "n_tokens"])


def _q_doc_quality(sf_dir):
    from rayxt.text import add_quality_columns

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    return add_quality_columns(ds).select_columns(
        ["doc_id", "n_tokens", "avg_word_len", "the_count"]
    )


def _q_doc_groupby_lang(sf_dir):
    from ray.data.aggregate import Count, Sum

    ds = _docs(sf_dir, columns=["lang", "n_chars"])
    agg = ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars")
    )
    df = agg.to_pandas()
    df["avg_chars"] = (df["sum_chars"].astype(float) / df["n_docs"]).round(4)
    return df


def _q_doc_topk_longest(sf_dir):
    ds = _docs(sf_dir, columns=["doc_id", "n_chars", "lang"])
    return ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(10)


def _q_doc_dedup_exact(sf_dir):
    from rayxt.dedup import exact_dedup

    return exact_dedup(_docs(sf_dir, columns=["doc_id", "text"]), "doc_id")


def _q_doc_lang_union(sf_dir):
    import pyarrow.compute as pc

    ds = _docs(sf_dir, columns=["doc_id", "lang"])

    def pick(lang):
        return ds.map_batches(
            lambda t, lang=lang: t.filter(pc.equal(t["lang"], lang)).select(["doc_id"]),
            batch_format="pyarrow",
        )

    return pick("en").union(pick("de"))


def _q_doc_distinct_lang(sf_dir):
    import pyarrow as pa

    vals = _docs(sf_dir, columns=["lang"]).unique("lang")
    return pa.table({"lang": pa.array(sorted(vals), pa.string())})


def _q_doc_except_en(sf_dir):
    import pyarrow.compute as pc

    ds = _docs(sf_dir, columns=["doc_id", "n_chars", "lang"])
    return ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater(t["n_chars"], 300), pc.not_equal(t["lang"], "en"))
        ).select(["doc_id"]),
        batch_format="pyarrow",
    )


def _q_ev_type_agg(sf_dir):
    from ray.data.aggregate import Count, Sum

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    df = ds.groupby("event_type").aggregate(
        Count(alias_name="n_events"), Sum("value", alias_name="sum_value")
    ).to_pandas()
    df["sum_value"] = df["sum_value"].round(4)
    return df


def _q_ev_daily(sf_dir):
    import pandas as pd
    from ray.data.aggregate import Count

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def day_col(df: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame({"day": df["ts"].dt.strftime("%Y-%m-%d")})

    return ds.map_batches(day_col, batch_format="pandas").groupby("day").aggregate(
        Count(alias_name="n_events")
    )


def _q_ev_user_top(sf_dir):
    from ray.data.aggregate import Count

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    agg = ds.groupby("user_id").aggregate(Count(alias_name="n_events"))
    return agg.sort(["n_events", "user_id"], descending=[True, False]).limit(10)


def _q_ev_tumbling(sf_dir):
    import pandas as pd
    from ray.data.aggregate import Count, Sum

    ds = _rd().read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "value"]
    )

    def win_col(df: "pd.DataFrame") -> "pd.DataFrame":
        epoch_s = df["ts"].astype("int64") // 1_000_000
        return pd.DataFrame(
            {"user_id": df["user_id"], "win": epoch_s // 3600, "value": df["value"]}
        )

    agg = (
        ds.map_batches(win_col, batch_format="pandas")
        .groupby(["user_id", "win"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )
    df = agg.to_pandas()
    df["sum_value"] = df["sum_value"].round(4)
    return df


def _q_q1_pricing(sf_dir):
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Mean, Sum

    ds = _rd().read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def revenue(t: "pa.Table") -> "pa.Table":
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        return t.append_column("disc_price", rev)

    agg = (
        ds.map_batches(revenue, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Mean("l_discount", alias_name="avg_disc"),
            Count(alias_name="count_order"),
        )
    )
    df = agg.to_pandas()
    df["sum_qty"] = df["sum_qty"].round(2)
    df["sum_disc_price"] = df["sum_disc_price"].round(2)
    df["avg_disc"] = df["avg_disc"].round(6)
    return df


def _q_seg_revenue(sf_dir):
    """Broadcast join: the small customer side travels via ray.put once."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Count, Sum

    cust = _rd().read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    seg_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))
    orders = _rd().read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def add_seg(df: "pd.DataFrame") -> "pd.DataFrame":
        seg = ray.get(seg_ref)
        out = pd.DataFrame(
            {"c_mktsegment": df["o_custkey"].map(seg), "o_totalprice": df["o_totalprice"]}
        )
        return out[out["c_mktsegment"].notna()]

    agg = (
        orders.map_batches(add_seg, batch_format="pandas")
        .groupby("c_mktsegment")
        .aggregate(Sum("o_totalprice", alias_name="revenue"),
                   Count(alias_name="n_orders"))
    )
    df = agg.to_pandas()
    df["revenue"] = df["revenue"].round(2)
    return df


def _q_region_customers(sf_dir):
    import pandas as pd
    import ray
    from ray.data.aggregate import Count

    nation = _rd().read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
    region = _rd().read_parquet(f"{sf_dir}/region.parquet").to_pandas()
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    lookup_ref = ray.put({k: r2name[v] for k, v in n2r.items() if v in r2name})
    cust = _rd().read_parquet(f"{sf_dir}/customer.parquet", columns=["c_nationkey"])

    def add_region(df: "pd.DataFrame") -> "pd.DataFrame":
        lk = ray.get(lookup_ref)
        return pd.DataFrame({"r_name": df["c_nationkey"].map(lk)})

    return (
        cust.map_batches(add_region, batch_format="pandas")
        .groupby("r_name")
        .aggregate(Count(alias_name="n_customers"))
    )


def _q_part_brand_stats(sf_dir):
    from ray.data.aggregate import Count, Mean

    ds = _rd().read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_brand", "p_retailprice"]
    )
    df = ds.groupby("p_brand").aggregate(
        Count(alias_name="n_parts"), Mean("p_retailprice", alias_name="avg_price")
    ).to_pandas()
    df["avg_price"] = df["avg_price"].round(4)
    return df


def _q_lineitem_filter(sf_dir):
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _rd().read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_shipdate", "l_discount"],
    )
    cutoff = pa.scalar(__import__("datetime").datetime(1997, 1, 1), pa.timestamp("us"))
    return ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["l_shipdate"], cutoff),
                    pc.greater(t["l_discount"], 0.05))
        ).select(["l_orderkey", "l_linenumber"]),
        batch_format="pyarrow",
    )


def _q_order_priority_revenue(sf_dir):
    """Large-to-large hash join via Dataset.join (both sides shuffle)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    li = _rd().read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def revenue(t: "pa.Table") -> "pa.Table":
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "revenue": rev})

    li = li.map_batches(revenue, batch_format="pyarrow")
    orders = _rd().read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    joined = li.join(orders, "inner", num_partitions=4,
                     on=("l_orderkey",), right_on=("o_orderkey",))
    df = joined.groupby("o_orderpriority").aggregate(
        Sum("revenue", alias_name="revenue"), Count(alias_name="n_items")
    ).to_pandas()
    df["revenue"] = df["revenue"].round(2)
    return df


def _q_customers_without_orders(sf_dir):
    """Anti join via Dataset.join(left_anti): customers with no 1998-H2 orders."""
    import datetime

    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    cust = _rd().read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    cutoff = pa.scalar(datetime.datetime(1998, 6, 1), pa.timestamp("us"))
    orders = _rd().read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(pc.greater_equal(t["o_orderdate"], cutoff)).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
    )
    df = cust.join(orders, "left_anti", num_partitions=4,
                   on=("c_custkey",), right_on=("o_custkey",)).to_pandas()
    if "c_custkey" not in df.columns:  # empty result loses its schema
        df = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64")})
    return df[["c_custkey"]]


# -- pages (conformance corpus; byte-identity gate) -------------------------


def _q_pages_extract_text(sf_dir):
    from rayxt.pipeline import extract_pages, read_pages

    ex = extract_pages(read_pages(_PAGES), concurrency=_pool(), batch_size=64)
    return ex.select_columns(["url", "warc_ts", "text", "status"])


def _q_pages_wikitable(sf_dir):
    from rayxt.pipeline import ExtractWikitables

    return _rd().read_parquet(_PAGES, columns=["url", "html"]).map_batches(
        ExtractWikitables, batch_format="pyarrow", batch_size=64,
        concurrency=_pool(4), num_cpus=1,
    )


def _q_pages_mods_tei(sf_dir):
    from rayxt.pipeline import ExtractModsTei

    return _rd().read_parquet(_PAGES, columns=["url", "html"]).map_batches(
        ExtractModsTei, batch_format="pyarrow", batch_size=64,
        concurrency=_pool(4), num_cpus=1,
    )


def _q_pages_dedup_url(sf_dir):
    from ray.data.aggregate import Count, Max

    ds = _rd().read_parquet(_PAGES, columns=["url", "warc_ts"])
    return ds.groupby("url").aggregate(
        Max("warc_ts", alias_name="latest_ts"), Count(alias_name="n_copies")
    )


def _q_pages_hot_hosts(sf_dir):
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    ds = _rd().read_parquet(_PAGES, columns=["url"])

    def host_col(t: "pa.Table") -> "pa.Table":
        after = pc.list_element(pc.split_pattern(t["url"], "//"), 1)
        host = pc.list_element(pc.split_pattern(after, "/"), 0)
        return pa.table({"host": host})

    agg = ds.map_batches(host_col, batch_format="pyarrow").groupby("host").aggregate(
        Count(alias_name="n_pages")
    )
    return agg.sort(["n_pages", "host"], descending=[True, False]).limit(10)


def _q_pages_lang_filter(sf_dir):
    import pyarrow.compute as pc

    ds = _rd().read_parquet(_PAGES, columns=["url", "lang"])
    return ds.map_batches(
        lambda t: t.filter(pc.is_in(t["lang"], value_set=__import__("pyarrow").array(["en", "de"]))),
        batch_format="pyarrow",
    )


def _q_pages_len_topk(sf_dir):
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _rd().read_parquet(_PAGES, columns=["url", "html"])

    def len_col(t: "pa.Table") -> "pa.Table":
        return pa.table(
            {"url": t["url"],
             "html_len": pc.cast(pc.binary_length(t["html"]), pa.int64())}
        )

    return ds.map_batches(len_col, batch_format="pyarrow").sort(
        ["html_len", "url"], descending=[True, False]
    ).limit(20)


def _q_pages_stats_by_lang(sf_dir):
    from rayxt.pipeline import corpus_stats, extract_pages, read_pages

    ex = extract_pages(read_pages(_PAGES), concurrency=_pool(), batch_size=64)
    return corpus_stats(ex)


# -- embeddings -------------------------------------------------------------


def _ann_queries(sf_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    rows = t.slice(0, 64).to_pylist()
    picked = [r for r in rows if r["vec_id"] < _ANN_NQ]
    return [(r["vec_id"], r["embedding"]) for r in sorted(picked, key=lambda r: r["vec_id"])]


def _q_emb_ann_topk(sf_dir):
    from rayxt.ann import brute_force_topk

    ds = _rd().read_parquet(f"{sf_dir}/embeddings.parquet")
    return brute_force_topk(ds, _ann_queries(sf_dir), k=_ANN_K, concurrency=_pool(4))


def _q_emb_ann_lsh(sf_dir):
    from rayxt.ann import lsh_topk

    ds = _rd().read_parquet(f"{sf_dir}/embeddings.parquet")
    return lsh_topk(ds, _ann_queries(sf_dir), k=_ANN_K, concurrency=_pool(4))


def _q_emb_neardup(sf_dir):
    import pandas as pd

    from rayxt.dedup import embedding_neardup_pairs

    ds = _rd().read_parquet(f"{sf_dir}/embeddings.parquet")
    df = embedding_neardup_pairs(ds, threshold=_NEARDUP_T).to_pandas()
    return df.astype({"id_a": "int64", "id_b": "int64", "cos": "float64"})


# -- non-SQL-expressible (rows-only checks) ---------------------------------


def _q_doc_langid(sf_dir):
    from rayxt.text import LangId

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(
        LangId, batch_format="pyarrow", concurrency=_pool(4)
    ).select_columns(["doc_id", "lang_guess"])


def _q_doc_fingerprint(sf_dir):
    from rayxt.text import add_fingerprint

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    return add_fingerprint(ds).select_columns(["doc_id", "fingerprint"])


def _q_doc_minhash_pairs(sf_dir):
    from rayxt.dedup import minhash_lsh_pairs

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    return minhash_lsh_pairs(ds, "doc_id", threshold=0.8, concurrency=_pool(4))


def _q_doc_simhash_pairs(sf_dir):
    from rayxt.dedup import simhash_pairs

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    return simhash_pairs(ds, "doc_id", max_hamming=3)


def _q_doc_neardup_clusters(sf_dir):
    """MinHash LSH pairs -> connected components (cluster resolution)."""
    from rayxt.dedup import connected_components, minhash_lsh_pairs

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    pairs = minhash_lsh_pairs(ds, "doc_id", threshold=0.8, concurrency=_pool(4))
    return connected_components(pairs)


def _q_doc_sample(sf_dir):
    """Seeded deterministic sample (P8); rows-only (sampler-specific)."""
    return _docs(sf_dir, columns=["doc_id", "lang"]).random_sample(0.1, seed=42)


def _q_media_decode(sf_dir):
    from fixtures.gen_media import ensure_media_parquet
    from rayxt.multimodal import decode_media

    path = ensure_media_parquet(_MEDIA, 300)
    return decode_media(_rd().read_parquet(path), concurrency=_pool(4))


def _q_pages_rule_hits(sf_dir):
    from rayxt.pipeline import extract_pages, read_pages, rule_hit_totals

    ex = extract_pages(read_pages(_PAGES), concurrency=_pool(), batch_size=64)
    return rule_hit_totals(ex)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "doc_filter_en": _q_doc_filter_en,
        "doc_token_counts": _q_doc_token_counts,
        "doc_quality": _q_doc_quality,
        "doc_groupby_lang": _q_doc_groupby_lang,
        "doc_topk_longest": _q_doc_topk_longest,
        "doc_dedup_exact": _q_doc_dedup_exact,
        "doc_lang_union": _q_doc_lang_union,
        "doc_distinct_lang": _q_doc_distinct_lang,
        "doc_except_en": _q_doc_except_en,
        "ev_type_agg": _q_ev_type_agg,
        "ev_daily": _q_ev_daily,
        "ev_user_top": _q_ev_user_top,
        "ev_tumbling": _q_ev_tumbling,
        "q1_pricing": _q_q1_pricing,
        "seg_revenue": _q_seg_revenue,
        "region_customers": _q_region_customers,
        "part_brand_stats": _q_part_brand_stats,
        "lineitem_filter": _q_lineitem_filter,
        "order_priority_revenue": _q_order_priority_revenue,
        "customers_without_orders": _q_customers_without_orders,
        "pages_extract_text": _q_pages_extract_text,
        "pages_wikitable": _q_pages_wikitable,
        "pages_mods_tei": _q_pages_mods_tei,
        "pages_dedup_url": _q_pages_dedup_url,
        "pages_hot_hosts": _q_pages_hot_hosts,
        "pages_lang_filter": _q_pages_lang_filter,
        "pages_len_topk": _q_pages_len_topk,
        "pages_stats_by_lang": _q_pages_stats_by_lang,
        "emb_ann_topk": _q_emb_ann_topk,
        "emb_ann_lsh": _q_emb_ann_lsh,
        "emb_neardup": _q_emb_neardup,
        "doc_langid": _q_doc_langid,
        "doc_fingerprint": _q_doc_fingerprint,
        "doc_minhash_pairs": _q_doc_minhash_pairs,
        "doc_simhash_pairs": _q_doc_simhash_pairs,
        "doc_neardup_clusters": _q_doc_neardup_clusters,
        "doc_sample": _q_doc_sample,
        "media_decode": _q_media_decode,
        "pages_rule_hits": _q_pages_rule_hits,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "doc_filter_en":
            "SELECT doc_id, n_chars FROM documents WHERE lang = 'en'",
        "doc_token_counts":
            "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens "
            "FROM documents",
        "doc_quality": """
            SELECT doc_id, n_tokens,
                   ROUND((CAST(length(text) AS DOUBLE) - (n_tokens - 1)) / n_tokens, 6)
                       AS avg_word_len,
                   CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS BIGINT)
                       AS the_count
            FROM (SELECT doc_id, text,
                         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                  FROM documents)
        """,
        "doc_groupby_lang": """
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) AS avg_chars
            FROM documents GROUP BY lang
        """,
        "doc_topk_longest":
            "SELECT doc_id, n_chars, lang FROM documents "
            "ORDER BY n_chars DESC, doc_id LIMIT 10",
        "doc_dedup_exact":
            "SELECT MIN(doc_id) AS rep_doc_id, CAST(COUNT(*) AS BIGINT) AS n_dups "
            "FROM documents GROUP BY text",
        "doc_lang_union":
            "SELECT doc_id FROM documents WHERE lang = 'en' "
            "UNION ALL SELECT doc_id FROM documents WHERE lang = 'de'",
        "doc_distinct_lang":
            "SELECT DISTINCT lang FROM documents",
        "doc_except_en":
            "SELECT doc_id FROM documents WHERE n_chars > 300 "
            "EXCEPT SELECT doc_id FROM documents WHERE lang = 'en'",
        "ev_type_agg": """
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
                   ROUND(SUM(value), 4) AS sum_value
            FROM events GROUP BY event_type
        """,
        "ev_daily":
            "SELECT strftime(ts, '%Y-%m-%d') AS day, "
            "CAST(COUNT(*) AS BIGINT) AS n_events FROM events GROUP BY 1",
        "ev_user_top":
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events FROM events "
            "GROUP BY user_id ORDER BY n_events DESC, user_id LIMIT 10",
        "ev_tumbling": """
            SELECT user_id,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) AS win,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   ROUND(SUM(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "q1_pricing": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   ROUND(AVG(l_discount), 6) AS avg_disc,
                   CAST(COUNT(*) AS BIGINT) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "seg_revenue": """
            SELECT c_mktsegment, ROUND(SUM(o_totalprice), 2) AS revenue,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "region_customers": """
            SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_customers
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "part_brand_stats": """
            SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
                   ROUND(AVG(p_retailprice), 4) AS avg_price
            FROM part GROUP BY p_brand
        """,
        "lineitem_filter":
            "SELECT l_orderkey, l_linenumber FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_discount > 0.05",
        "order_priority_revenue": """
            SELECT o_orderpriority,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   CAST(COUNT(*) AS BIGINT) AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        "customers_without_orders":
            "SELECT c_custkey FROM customer "
            "EXCEPT SELECT o_custkey FROM orders "
            "WHERE o_orderdate >= TIMESTAMP '1998-06-01'",
        "pages_extract_text":
            f"SELECT url, warc_ts, text, status FROM '{_GOLDEN_EXTRACT}'",
        "pages_wikitable":
            f"SELECT url, table_idx, row_idx, name, count, note FROM '{_GOLDEN_WIKITABLE}'",
        "pages_mods_tei":
            f"SELECT url, tei_xml FROM '{_GOLDEN_MODS}'",
        "pages_dedup_url": f"""
            SELECT url, MAX(warc_ts) AS latest_ts, CAST(COUNT(*) AS BIGINT) AS n_copies
            FROM '{_PAGES}' GROUP BY url
        """,
        "pages_hot_hosts": f"""
            SELECT split_part(split_part(url, '//', 2), '/', 1) AS host,
                   CAST(COUNT(*) AS BIGINT) AS n_pages
            FROM '{_PAGES}' GROUP BY 1 ORDER BY n_pages DESC, host LIMIT 10
        """,
        "pages_lang_filter":
            f"SELECT url, lang FROM '{_PAGES}' WHERE lang IN ('en', 'de')",
        "pages_len_topk": f"""
            SELECT url, CAST(octet_length(html) AS BIGINT) AS html_len
            FROM '{_PAGES}' ORDER BY html_len DESC, url LIMIT 20
        """,
        "pages_stats_by_lang": f"""
            SELECT p.lang,
                   CAST(COUNT(*) AS BIGINT) AS docs,
                   CAST(SUM(CASE WHEN g.status = 'ok' THEN 1 ELSE 0 END) AS BIGINT)
                       AS ok_docs,
                   CAST(SUM(length(g.text)) AS BIGINT) AS chars_out,
                   CAST(SUM(octet_length(p.html)) AS BIGINT) AS bytes_in
            FROM '{_PAGES}' p
            JOIN '{_GOLDEN_EXTRACT}' g ON p.url = g.url AND p.warc_ts = g.warc_ts
            GROUP BY p.lang
        """,
        "emb_ann_topk": f"""
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                       FROM embeddings WHERE vec_id < {_ANN_NQ}),
                 s AS (SELECT q.query_id, e.vec_id AS id,
                              list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                                     CAST(e.embedding AS DOUBLE[])) AS c
                       FROM q CROSS JOIN embeddings e),
                 r AS (SELECT query_id, id, c,
                              ROW_NUMBER() OVER (PARTITION BY query_id
                                                 ORDER BY c DESC, id) AS rank
                       FROM s)
            SELECT query_id, id, CAST(rank AS BIGINT) AS rank, ROUND(c, 6) AS cos
            FROM r WHERE rank <= {_ANN_K}
        """,
        "emb_neardup": f"""
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 6) AS cos
            FROM embeddings a
            JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                               CAST(b.embedding AS DOUBLE[])), 6)
                  >= {_NEARDUP_T}
        """,
        # doc_langid, doc_fingerprint, doc_minhash_pairs, doc_simhash_pairs,
        # emb_ann_lsh, media_decode, pages_rule_hits: not SQL-expressible
        # (stateful heuristics / sketches / stubbed codecs) -> rows-only.
    }
