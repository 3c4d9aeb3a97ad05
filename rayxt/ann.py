"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — one numpy matmul per batch against
a BROADCAST query matrix (``ray.put`` once on the driver, ``ray.get``
once per actor in ``__init__``), partial top-k per batch, final merge
via a small ``groupby(query_id)`` over partials.  The shuffle therefore
moves at most ``n_queries * k`` rows per batch, never embeddings.

Scale path: an LSH-bucketed variant — multi-TABLE (independent
hyperplane sets, union of candidates) multi-PROBE (buckets within
hamming distance ``probe_radius`` of the query bucket also count)
random-hyperplane pruning, then the same partial-top-k merge.  Recall
vs pruning is tunable per dataset: the defaults measure recall@5 = 0.80
on the near-uniform synthetic gate embeddings (an adversarial case —
top-neighbor cosines are ~0.35, so sign-LSH collisions are barely above
chance); clustered real-world embeddings prune far harder at the same
recall.  ``tests/test_sketch_oracle.py`` asserts the recall gate
against :func:`brute_force_topk`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["brute_force_topk", "lsh_topk", "ivf_topk", "hyperplane_bucket", "kmeans",
           "embedding_centroids", "pca_project"]


def embedding_centroids(ds, *, key: str = "label", vec_col: str = "embedding",
                        ndigits: int = 6):
    """Per-key mean vector (class prototypes / one k-means step),
    expressed entirely as aggregates: each batch emits one
    ``(key, dim, sum, n)`` partial row per key and dimension
    (vectorized numpy), then a tiny ``groupby.aggregate(Sum)`` merges
    partials — no per-group UDF, shuffle moves ``n_keys * dim`` rows
    per batch regardless of corpus size.

    Returns one row per (key, dim): ``(key, dim, centroid)`` with
    ``dim`` 1-based and ``centroid`` rounded to ``ndigits`` (SQL
    parity with ``ROUND(AVG(...), n)`` over an unnested list column).
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        keys = np.asarray(t[key].to_pylist())
        m = _as_matrix(t[vec_col])
        dim = m.shape[1]
        out_k, out_d, out_s, out_n = [], [], [], []
        for kv in np.unique(keys):
            sel = m[keys == kv]
            sums = sel.sum(axis=0)
            out_k.extend([kv.item() if hasattr(kv, "item") else kv] * dim)
            out_d.extend(range(1, dim + 1))
            out_s.extend(sums.tolist())
            out_n.extend([sel.shape[0]] * dim)
        return pa.table({
            key: pa.array(out_k),
            "dim": pa.array(out_d, pa.int64()),
            "vsum": pa.array(out_s, pa.float64()),
            "n": pa.array(out_n, pa.int64()),
        })

    agg = (
        ds.select_columns([key, vec_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby([key, "dim"])
        .aggregate(Sum("vsum", alias_name="vsum"), Sum("n", alias_name="n"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        centroid = pc.round(pc.divide(t["vsum"], pc.cast(t["n"], pa.float64())),
                            ndigits=ndigits)
        return pa.table({key: t[key], "dim": t["dim"], "centroid": centroid})

    return agg.map_batches(finalize, batch_format="pyarrow")


def _as_matrix(col) -> np.ndarray:
    """Embedding column → ``(n, dim)`` float64 matrix.

    Arrow fixed-size-list / uniform-width list columns decode WITHOUT
    per-row Python objects: combine chunks, ``flatten()`` to the value
    buffer (slice/offset-aware) and reshape — one vectorized cast at
    most (float32 → float64).  Ragged or null-bearing lists and plain
    Python sequences fall back to the row loop.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.Array):
        typ = col.type
        if col.null_count == 0 and pa.types.is_fixed_size_list(typ):
            vals = col.flatten().to_numpy(zero_copy_only=False)
            return vals.astype(np.float64, copy=False).reshape(
                len(col), typ.list_size)
        if col.null_count == 0 and (pa.types.is_list(typ)
                                    or pa.types.is_large_list(typ)):
            off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            widths = np.diff(off)
            if len(widths) and (widths == widths[0]).all():
                vals = col.flatten().to_numpy(zero_copy_only=False)
                return vals.astype(np.float64, copy=False).reshape(
                    len(col), int(widths[0]))
        col = col.to_pylist()
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    return m / norms[:, None]


class _PartialTopK:
    """Actor-pool stage: per-batch cosine top-k against the broadcast
    query matrix; emits (query_id, id, cos) partials."""

    def __init__(self, queries_ref, id_col: str, vec_col: str, k: int):
        import ray

        qids, qmat = ray.get(queries_ref)  # fetched once per actor
        self.qids = qids
        self.qmat = _normalize(qmat)
        self.id_col, self.vec_col, self.k = id_col, vec_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].to_pylist())
        m = _normalize(_as_matrix(batch[self.vec_col]))
        sims = self.qmat @ m.T  # (n_queries, batch)
        k = min(self.k, sims.shape[1])
        out_q, out_i, out_c = [], [], []
        for qi in range(sims.shape[0]):
            # top-k by (cos desc, id asc) — deterministic tie-break
            idx = np.lexsort((ids, -sims[qi]))[:k]
            out_q.extend([self.qids[qi]] * len(idx))
            out_i.extend(ids[idx].tolist())
            out_c.extend(sims[qi][idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "id": pa.array(out_i, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )


def _merge_topk_factory(k: int):
    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["cos"] = np.round(g["cos"], 6)
        return g[["query_id", "id", "rank", "cos"]]

    return merge


def brute_force_topk(ds, queries, *, id_col: str = "vec_id",
                     vec_col: str = "embedding", k: int = 10,
                     concurrency=(1, 4), batch_size: int = 4096):
    """Exact cosine top-k for each query vector.

    ``queries``: list of (query_id, vector).  Returns
    (query_id, id, rank, cos) with rank 1..k by (cos desc, id asc).
    """
    import ray

    qids = [int(q) for q, _ in queries]
    qmat = np.stack([np.asarray(v, dtype=np.float64) for _, v in queries])
    queries_ref = ray.put((qids, qmat))
    partial = ds.select_columns([id_col, vec_col]).map_batches(
        _PartialTopK,
        fn_constructor_kwargs=dict(
            queries_ref=queries_ref, id_col=id_col, vec_col=vec_col, k=k
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    return partial.groupby("query_id").map_groups(
        _merge_topk_factory(k), batch_format="pandas"
    )


def hyperplane_bucket(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Random-hyperplane LSH bucket ids (sign bits packed to ints)."""
    signs = (m @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return signs @ weights


def probe_buckets(bucket: int, n_planes: int, radius: int) -> set[int]:
    """All bucket ids within hamming distance <= radius (multi-probe)."""
    from itertools import combinations

    out = {bucket}
    for dist in range(1, radius + 1):
        for flips in combinations(range(n_planes), dist):
            b = bucket
            for f in flips:
                b ^= 1 << f
            out.add(b)
    return out


class _LshPartialTopK(_PartialTopK):
    """Prunes each batch to rows whose bucket (in ANY of the hash
    tables) falls within probe distance of some query's bucket, then
    runs the exact matmul on the survivors (recall < 1.0; the scale
    path).  Probe sets are precomputed once per actor in __init__."""

    def __init__(self, queries_ref, id_col, vec_col, k, planes_ref,
                 probe_radius: int):
        super().__init__(queries_ref, id_col, vec_col, k)
        import ray

        self.planes = ray.get(planes_ref)  # (n_tables, n_planes, dim)
        n_planes = self.planes.shape[1]
        # per table: union of every query's probe set, as a sorted array
        # (np.isin against a sorted array per batch)
        self.qprobes = []
        for table in self.planes:
            probes: set[int] = set()
            for b in hyperplane_bucket(self.qmat, table).tolist():
                probes |= probe_buckets(int(b), n_planes, probe_radius)
            self.qprobes.append(np.sort(np.fromiter(probes, dtype=np.int64,
                                                    count=len(probes))))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].to_pylist())
        m = _normalize(_as_matrix(batch[self.vec_col]))
        mask = np.zeros(len(ids), dtype=bool)
        for table, probes in zip(self.planes, self.qprobes):
            mask |= np.isin(hyperplane_bucket(m, table), probes)
        if not mask.any():
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "id": pa.array([], pa.int64()),
                 "cos": pa.array([], pa.float64())}
            )
        ids, m = ids[mask], m[mask]
        sims = self.qmat @ m.T
        k = min(self.k, sims.shape[1])
        out_q, out_i, out_c = [], [], []
        for qi in range(sims.shape[0]):
            idx = np.lexsort((ids, -sims[qi]))[:k]
            out_q.extend([self.qids[qi]] * len(idx))
            out_i.extend(ids[idx].tolist())
            out_c.extend(sims[qi][idx].tolist())
        return pa.table(
            {"query_id": pa.array(out_q, pa.int64()),
             "id": pa.array(out_i, pa.int64()),
             "cos": pa.array(out_c, pa.float64())}
        )


class _IvfPartialTopK(_PartialTopK):
    """Prunes each batch to rows whose inverted list (``list_col``) is
    in the probed set before the exact matmul."""

    def __init__(self, queries_ref, id_col, vec_col, k, list_col, probes_ref):
        super().__init__(queries_ref, id_col, vec_col, k)
        import ray

        self.list_col = list_col
        self.probes = ray.get(probes_ref)  # sorted np array of list ids

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = np.isin(np.asarray(batch[self.list_col].to_pylist()),
                       self.probes)
        if not mask.any():
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        sub = batch.filter(pa.array(mask))
        return super().__call__(sub)


def ivf_topk(ds, queries, *, id_col: str = "vec_id",
             vec_col: str = "embedding", list_col: str = "label",
             k: int = 10, nprobe: int = 3,
             concurrency=(1, 4), batch_size: int = 4096):
    """IVF-style ANN: coarse quantizer = the per-list centroid table.

    Phase 1 computes list centroids with :func:`embedding_centroids`
    (aggregate-only; nlist x dim rows to the driver — tiny).  Each
    query probes its ``nprobe`` nearest lists by centroid cosine (ties
    toward the smaller list id), and phase 2 runs the exact cosine
    top-k ONLY over member rows of probed lists — pruning by list
    membership before the matmul, then the same partial-top-k merge as
    brute force.  Recall depends on how well the list partition aligns
    with the metric (classic IVF tradeoff); candidates' cosines are
    exact.
    """
    import ray

    cents = embedding_centroids(ds, key=list_col, vec_col=vec_col).to_pandas()
    cents = cents.sort_values([list_col, "dim"])
    lists = cents[list_col].unique()
    dim = cents["dim"].max()
    cmat = cents["centroid"].to_numpy().reshape(len(lists), dim)
    cn = _normalize(cmat.astype(np.float64))

    qids = [int(q) for q, _ in queries]
    qmat = _normalize(
        np.stack([np.asarray(v, dtype=np.float64) for _, v in queries])
    )
    sims = qmat @ cn.T  # (nq, nlist)
    probe: set = set()
    for qi in range(sims.shape[0]):
        order = np.lexsort((lists, -sims[qi]))[:nprobe]
        probe.update(lists[order].tolist())
    probes = np.array(sorted(probe))

    queries_ref = ray.put((qids, np.stack(
        [np.asarray(v, dtype=np.float64) for _, v in queries])))
    probes_ref = ray.put(probes)
    partial = ds.select_columns([id_col, vec_col, list_col]).map_batches(
        _IvfPartialTopK,
        fn_constructor_kwargs=dict(
            queries_ref=queries_ref, id_col=id_col, vec_col=vec_col, k=k,
            list_col=list_col, probes_ref=probes_ref,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    return partial.groupby("query_id").map_groups(
        _merge_topk_factory(k), batch_format="pandas"
    )


def lsh_topk(ds, queries, *, id_col: str = "vec_id", vec_col: str = "embedding",
             k: int = 10, n_planes: int = 8, n_tables: int = 4,
             probe_radius: int = 2, seed: int = 11,
             concurrency=(1, 4), batch_size: int = 4096):
    """Multi-table multi-probe LSH cosine top-k (approximate).

    Candidates = rows whose sign-bucket in any of ``n_tables``
    independent hyperplane tables lies within hamming distance
    ``probe_radius`` of a query's bucket in that table; exact cosine
    top-k over the candidates.  See the module docstring for the
    measured recall/pruning tradeoff.
    """
    import ray

    qids = [int(q) for q, _ in queries]
    qmat = np.stack([np.asarray(v, dtype=np.float64) for _, v in queries])
    dim = qmat.shape[1]
    planes = np.random.default_rng(seed).standard_normal(
        (n_tables, n_planes, dim)
    )
    queries_ref = ray.put((qids, qmat))
    planes_ref = ray.put(planes)
    partial = ds.select_columns([id_col, vec_col]).map_batches(
        _LshPartialTopK,
        fn_constructor_kwargs=dict(
            queries_ref=queries_ref, id_col=id_col, vec_col=vec_col, k=k,
            planes_ref=planes_ref, probe_radius=probe_radius,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    return partial.groupby("query_id").map_groups(
        _merge_topk_factory(k), batch_format="pandas"
    )


def kmeans(ds, *, id_col: str = "vec_id", vec_col: str = "embedding",
           k: int = 8, iters: int = 5, ndigits: int = 9):
    """Distributed Lloyd's k-means — the canonical iterative algorithm,
    expressed so every pass is streaming and aggregate-only.

    Deterministic contract (restated by the naive oracle in
    ``tests/oracle/sketches.py``): init = the vectors of the ``k``
    smallest ids; distance = squared L2 in float64, argmin ties -> the
    lowest cluster index; after each update the centroids are ROUNDED
    to ``ndigits`` before broadcast, so the 1e-15-ulp spread from
    partial-sum merge order cannot feed back into assignments.
    Empty clusters keep their previous centroid.

    Per iteration: centroids go through ``ray.put`` once (k*dim — tiny);
    each batch assigns vectors by one vectorized distance matrix and emits
    ``k*dim`` partial ``(cluster, dim, sum, n)`` rows; a pure Sum
    aggregate merges partials; the driver recomputes the k*dim table.
    The embeddings themselves never shuffle; each iteration re-streams
    the source (at corpus scale, re-reading pruned parquet beats
    pinning the dataset in the object store).

    Returns the final per-vector assignment dataset ``(id_col,
    cluster)``.
    """
    import ray

    centroids = _kmeans_centroids(ds, id_col=id_col, vec_col=vec_col,
                                  k=k, iters=iters, ndigits=ndigits)
    cref = ray.put(centroids)

    def final_assign(t: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        m = _as_matrix(t[vec_col])
        return pa.table({
            id_col: t[id_col],
            "cluster": pa.array(_kmeans_assign(m, cents), pa.int64()),
        })

    return ds.map_batches(final_assign, batch_format="pyarrow")


def _kmeans_assign(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 is constant
    # per row, so argmin over (-2 x.c + ||c||^2) suffices — but the
    # oracle restates FULL squared distances, so compute them too
    # (identical float64 op sequence on both sides)
    d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1)


def _kmeans_centroids(ds, *, id_col: str, vec_col: str, k: int,
                      iters: int, ndigits: int) -> np.ndarray:
    """The Lloyd iteration of :func:`kmeans`, returning the final
    ROUNDED centroid matrix (the frozen deterministic contract lives in
    the :func:`kmeans` docstring)."""
    import ray
    from ray.data.aggregate import Sum

    # deterministic init: the k rows with the smallest ids
    seed_rows = (ds.sort(id_col).limit(k).select_columns([vec_col])
                 .take_all())
    centroids = np.round(
        np.stack([np.asarray(r[vec_col], dtype=np.float64)
                  for r in seed_rows]), ndigits)

    assign = _kmeans_assign

    for _ in range(iters):
        cref = ray.put(centroids)

        def partial(t: pa.Table) -> pa.Table:
            cents = ray.get(cref)
            m = _as_matrix(t[vec_col])
            lab = assign(m, cents)
            dim = m.shape[1]
            kk = cents.shape[0]
            sums = np.zeros((kk, dim), dtype=np.float64)
            np.add.at(sums, lab, m)
            cnt = np.bincount(lab, minlength=kk).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.repeat(np.arange(kk), dim),
                                    pa.int64()),
                "dim": pa.array(np.tile(np.arange(dim), kk), pa.int64()),
                "s": pa.array(sums.ravel(), pa.float64()),
                "n": pa.array(np.repeat(cnt, dim), pa.int64()),
            })

        agg = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(["cluster", "dim"])
               .aggregate(Sum("s", alias_name="s"),
                          Sum("n", alias_name="n")).to_pandas())
        new = centroids.copy()
        agg = agg.sort_values(["cluster", "dim"])
        for c, g in agg.groupby("cluster"):
            n = int(g["n"].iloc[0])
            if n > 0:
                new[int(c)] = g["s"].to_numpy() / n
        centroids = np.round(new, ndigits)

    return centroids


def semdedup(ds, *, id_col: str = "vec_id", vec_col: str = "embedding",
             k: int = 8, iters: int = 5, threshold: float = 0.9,
             ndigits: int = 9, sim_digits: int = 6,
             max_cluster: int = 100_000):
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embeddings,
    then inside each cluster greedily drop points whose cosine
    similarity to an already-kept point is ``>= threshold`` — keeping
    the points FARTHEST from the centroid first (the paper's
    keep-the-most-novel policy).

    FROZEN spec (restated by ``tests/oracle/sketches.py::
    oracle_semdedup``): clusters = :func:`kmeans`'s frozen contract;
    ``centroid_sim`` = cosine(vector, own rounded centroid) rounded to
    ``sim_digits``; visit order within a cluster = (centroid_sim asc,
    id asc); a visited point is kept iff every ROUNDED pairwise cosine
    against the kept-so-far set is ``< threshold`` (rounding both
    centroid and pairwise similarities to ``sim_digits`` absorbs
    matmul-vs-per-pair summation-order ulps, the same trick as the
    kmeans centroid rounding).  Zero vectors get similarity 0.

    Dataflow: the centroid loop is aggregate-only (embeddings never
    shuffle during clustering); the prune needs cluster-mates
    CO-LOCATED, so the embedding table crosses exactly ONE hash
    exchange keyed by cluster id — at corpus scale ``k`` is chosen so
    clusters stay bounded (the paper uses 50k clusters for LAION), and
    ``max_cluster`` fails loudly rather than letting one degenerate
    cluster quadratically blow up a reducer.  Pairwise work is one
    normalized matmul per cluster.

    Returns one row per input row: ``id_col`` + ``cluster`` +
    ``centroid_sim`` + ``kept``.
    """
    import ray

    cents = _kmeans_centroids(ds, id_col=id_col, vec_col=vec_col,
                              k=k, iters=iters, ndigits=ndigits)
    cn = cents / np.maximum(
        np.linalg.norm(cents, axis=1, keepdims=True), 1e-300)
    cref = ray.put((cents, cn))

    def tag(t: pa.Table) -> pa.Table:
        c, cnorm = ray.get(cref)
        m = _as_matrix(t[vec_col])
        lab = _kmeans_assign(m, c)
        mn = m / np.maximum(
            np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        csim = np.round((mn * cnorm[lab]).sum(axis=1), sim_digits)
        return pa.table({
            id_col: t[id_col],
            "cluster": pa.array(lab.astype(np.int64), pa.int64()),
            "centroid_sim": pa.array(csim, pa.float64()),
            vec_col: t[vec_col],
        })

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > max_cluster:
            raise ValueError(
                f"semdedup cluster of {len(g)} rows exceeds max_cluster="
                f"{max_cluster}; raise k (more, smaller clusters) or "
                f"max_cluster")
        ids = g[id_col].to_numpy()
        order = np.lexsort((ids, g["centroid_sim"].to_numpy()))
        m = np.stack([np.asarray(v, dtype=np.float64)
                      for v in g[vec_col]])
        mn = m / np.maximum(
            np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        sim = np.round(mn @ mn.T, sim_digits)
        kept = np.zeros(len(g), dtype=bool)
        kept_idx: list[int] = []
        for i in order:
            if not kept_idx or (sim[i, kept_idx] < threshold).all():
                kept[i] = True
                kept_idx.append(i)
        out = g[[id_col, "cluster", "centroid_sim"]].copy()
        out["kept"] = kept
        return out

    schema = {id_col: pa.int64(), "cluster": pa.int64(),
              "centroid_sim": pa.float64(), "kept": pa.bool_()}
    from ._blockutil import ensure_typed
    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("cluster").map_groups(prune, batch_format="pandas")
            .map_batches(lambda t: ensure_typed(t, schema),
                         batch_format="pyarrow"))


def pca_project(ds, *, id_col: str = "vec_id", vec_col: str = "embedding",
                k: int = 4, ndigits: int = 6):
    """Distributed PCA: project every embedding onto the top-``k``
    principal components.

    Dataflow (the 100 TB shape): each batch emits its moment PARTIALS
    as ``(idx, v)`` rows — dim sums, dim x dim second moments and the
    row count, ``dim^2 + dim + 1`` rows per batch regardless of batch
    size — merged by one pure ``groupby(idx).Sum``.  The driver sees
    only that tiny aggregate (the documented small-aggregate exception),
    builds mean/covariance, rounds the covariance to ``ndigits`` and
    eigendecomposes (dim x dim).  Projection is a stateless vectorized
    second pass; embeddings never shuffle.

    DETERMINISM: float partial sums merge in nondeterministic order,
    but covariance entries are rounded to ``ndigits`` BEFORE ``eigh``
    — sums agree to ~1e-12 relative, so the rounded matrix (and hence
    the whole decomposition, run on identical float64 input) is a pure
    function of the data, independent of batching.  Sign convention:
    each component's largest-|weight| entry is made positive.  The
    naive oracle restatement (``tests/oracle/sketches.oracle_pca``)
    must match bit-for-bit after output rounding.
    """
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        m = _as_matrix(t[vec_col]).astype(np.float64)
        dim = m.shape[1]
        s = m.sum(axis=0)                      # dim
        ss = (m.T @ m).ravel()                 # dim*dim
        idx = np.arange(dim + dim * dim + 1, dtype=np.int64)
        v = np.concatenate([s, ss, [float(len(m))]])
        return pa.table({"idx": pa.array(idx),
                         "v": pa.array(v, pa.float64())})

    agg = (ds.select_columns([vec_col]).map_batches(
        partials, batch_format="pyarrow")
        .groupby("idx").aggregate(Sum("v", alias_name="v"))
        .to_pandas())
    if "v" not in agg.columns or not len(agg):
        # empty input: no moments to decompose — emit a typed empty
        # projection (actual id type + k pc columns; with no rows the
        # dimension is unknowable, so k stays as requested)
        import ray.data as _rd

        id_type = ds.schema().base_schema.field(id_col).type
        return _rd.from_arrow(pa.table(
            {id_col: pa.array([], id_type),
             **{f"pc{j + 1}": pa.array([], pa.float64())
                for j in range(k)}}))
    vals = agg.sort_values("idx")["v"].to_numpy()
    # infer dim from the row count: dim^2 + dim + 1
    dim = int((np.sqrt(4 * (len(vals) - 1) + 1) - 1) // 2)
    k = min(k, dim)  # at most dim components exist (oracle_pca clamps too)
    n = vals[-1]
    mean = vals[:dim] / n
    second = vals[dim:dim + dim * dim].reshape(dim, dim) / n
    cov = np.round(second - np.outer(mean, mean), ndigits)
    eigvals, eigvecs = np.linalg.eigh(cov)
    comp = eigvecs[:, ::-1][:, :k]             # descending eigenvalue
    flip = np.sign(comp[np.abs(comp).argmax(axis=0), np.arange(k)])
    comp = comp * np.where(flip == 0, 1.0, flip)[None, :]

    mean_c = mean.copy()
    comp_c = comp.copy()

    def project(t: pa.Table) -> pa.Table:
        m = _as_matrix(t[vec_col]).astype(np.float64)
        p = np.round((m - mean_c[None, :]) @ comp_c, ndigits)
        out = {id_col: t[id_col]}
        for j in range(k):
            out[f"pc{j + 1}"] = pa.array(p[:, j], pa.float64())
        return pa.table(out)

    return ds.select_columns([id_col, vec_col]).map_batches(
        project, batch_format="pyarrow")
