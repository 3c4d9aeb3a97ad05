"""Link-graph operators: outlink extraction and host-level PageRank.

The missing half of a Common-Crawl-style corpus pipeline next to text
extraction (SURVEY §2 P-family; the north rule's "web pages at 10^12
document scale"): every page yields its resolved outbound links, the
links collapse to a host graph, and PageRank over that graph supplies
the classic quality prior for corpus filtering (the original
"importance sampling by link structure" signal).

Scale shape:

* ``extract_outlinks`` is a stateless-per-doc actor-pool ``map_batches``
  stage like ``ExtractDocs``: the html bytes are dropped in-stage, the
  explode happens before any exchange, and only (url, dst) rows leave.
* ``pagerank`` is the connected-components pattern from
  ``rayxt/dedup.py`` (join + aggregate rounds, every per-round table is
  |hosts| or |edges| rows, never the corpus): the edge table is
  degree-annotated ONCE and reused; each iteration is one hash join
  (ranks are re-keyed to the edge source) plus one union+Sum groupby.
  Driver state per iteration is two scalars (N, dangling mass) — no
  driver materialization of nodes or edges.

URL resolution is RFC 3986 §5.2 from scratch, matching
``urllib.parse.urljoin`` on the http(s) surface (the independent test
oracle resolves with ``urljoin``; parity is asserted on a vector
matrix).  Like ``urljoin`` — and unlike a strict RFC reading — a
reference that already carries a scheme is returned verbatim (no dot
segment removal), which is also what the oracle does.
"""

from __future__ import annotations

import sys
from collections import Counter

import pyarrow as pa

from .dom import SKIP_SUBTREE, parse_html

try:  # UDFs travel by value: workers must not re-import from the filesystem
    from ray import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

__all__ = [
    "resolve_url",
    "host_of_url",
    "anchor_text",
    "page_outlinks",
    "ExtractOutlinks",
    "extract_outlinks",
    "host_edges",
    "host_degrees",
    "top_anchors",
    "pagerank",
]

_WS = " \t\n\r\f"


def _split_scheme(ref: str) -> tuple[str | None, str]:
    """(scheme, rest) if ref starts with a valid RFC 3986 scheme."""
    for i, ch in enumerate(ref):
        if ch == ":":
            return (ref[:i], ref[i + 1:]) if i > 0 else (None, ref)
        if ch.isalpha() or (i > 0 and (ch.isdigit() or ch in "+-.")):
            continue
        return None, ref
    return None, ref


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    out: list[str] = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if out:
                out.pop()
        elif path == "/..":
            path = "/"
            if out:
                out.pop()
        elif path in (".", ".."):
            path = ""
        else:
            i = path.find("/", 1)
            if i < 0:
                out.append(path)
                path = ""
            else:
                out.append(path[:i])
                path = path[i:]
    return "".join(out)


def _split_base(base: str) -> tuple[str, str, str]:
    """base (no fragment) -> (scheme, authority, path+query split later)."""
    scheme, rest = _split_scheme(base)
    if scheme is None:
        scheme, rest = "https", base  # defensive; page urls are absolute
    if rest.startswith("//"):
        j = len(rest)
        for k in range(2, len(rest)):
            if rest[k] in "/?#":
                j = k
                break
        return scheme, rest[2:j], rest[j:]
    return scheme, "", rest


def resolve_url(base: str, ref: str) -> str:
    """Resolve ``ref`` against absolute ``base`` (RFC 3986 §5.2; the
    result carries no fragment), matching ``urljoin``'s legacy
    behaviour on scheme-ful refs: a DIFFERENT scheme is returned
    verbatim (no dot-segment removal, case preserved); the SAME scheme
    (case-insensitive) is lowercased and — when the ref carries no
    authority — resolved as a relative reference (RFC 3986 §5.2.1
    non-strict mode, which is what ``urljoin`` implements)."""
    ref = ref.split("#", 1)[0]
    base = base.split("#", 1)[0]
    scheme, rest = _split_scheme(ref)
    b_scheme, b_auth, b_pathq = _split_base(base)
    if scheme is not None:
        if scheme.lower() != b_scheme.lower():
            return ref
        if rest.startswith("//"):
            return f"{scheme.lower()}:{rest}"
        ref = rest  # same scheme, no authority: non-strict relative ref
    if not ref:
        return base
    if ref.startswith("//"):
        return f"{b_scheme}:{ref}"
    b_path = b_pathq.split("?", 1)[0]
    if ref.startswith("?"):
        return f"{b_scheme}://{b_auth}{b_path}{ref}"
    if "?" in ref:
        path, query = ref.split("?", 1)
        query = "?" + query
    else:
        path, query = ref, ""
    if path.startswith("/"):
        path = _remove_dot_segments(path)
    else:
        if b_auth and not b_path:
            merged = "/" + path
        else:
            merged = b_path[: b_path.rfind("/") + 1] + path
        path = _remove_dot_segments(merged)
    return f"{b_scheme}://{b_auth}{path}{query}"


def host_of_url(url: str) -> str:
    """Lowercased registered host of an absolute http(s) URL: authority
    minus userinfo and port (mirrors ``urlsplit(...).hostname``)."""
    scheme, rest = _split_scheme(url)
    if not rest.startswith("//"):
        return ""
    auth = rest[2:]
    for k, ch in enumerate(auth):
        if ch in "/?#":
            auth = auth[:k]
            break
    if "@" in auth:
        auth = auth.rsplit("@", 1)[1]
    if auth.startswith("["):  # IPv6 literal
        end = auth.find("]")
        return auth[: end + 1].lower() if end >= 0 else auth.lower()
    if ":" in auth:
        auth = auth.rsplit(":", 1)[0]
    return auth.lower()


def _is_http(url: str) -> bool:
    return url.startswith("http://") or url.startswith("https://")


ANCHOR_MAX_CHARS = 200


def anchor_text(node, max_chars: int = ANCHOR_MAX_CHARS) -> str:
    """Whitespace-normalized text of an anchor's subtree under the
    frozen extraction policy: ``SKIP_SUBTREE`` tags (script / style /
    comments / ...) contribute nothing and their neighbours concatenate
    with NO separator (matching :func:`rayxt.dom.extract_text`); the
    normalized string is truncated to ``max_chars``."""
    parts: list[str] = []
    stack: list = [node]
    while stack:
        item = stack.pop()
        if isinstance(item, str):
            parts.append(item)
            continue
        local = item.tag
        if local.startswith("{"):
            local = local.rsplit("}", 1)[1]
        if local in SKIP_SUBTREE:
            continue
        if item.text:
            parts.append(item.text)
        for c in reversed(item.children):
            if c.tail:
                stack.append(c.tail)
            stack.append(c)
    return " ".join("".join(parts).split())[:max_chars]


def page_outlinks(url: str, html, *, with_anchor: bool = False) -> Counter:
    """Per-document kernel: ``Counter[(dst_url, dst_host, nofollow)]``
    -> n (or ``(dst_url, dst_host, nofollow, anchor)`` keys when
    ``with_anchor``).

    Document-order walk over the frozen tag-soup DOM; the FIRST
    ``<base href>`` (resolved against the page url) rebases every
    anchor in the document, per the whole-document ``document.baseURI``
    semantics.  href values are ASCII-whitespace-stripped (HTML URL
    attribute rule); only http(s) targets survive; fragments drop.
    """
    out: Counter = Counter()
    if html is None:
        return out
    try:
        root = parse_html(html)
    except Exception:
        return out
    nodes = list(root.iter())
    base = url
    for n in nodes:
        if n.tag == "base" and "href" in n.attrs:
            cand = resolve_url(url, n.attrs["href"].strip(_WS))
            if _is_http(cand):
                base = cand
            break
    for n in nodes:
        if n.tag != "a":
            continue
        href = n.attrs.get("href")
        if href is None:
            continue
        dst = resolve_url(base, href.strip(_WS))
        if not _is_http(dst):
            continue
        nf = 1 if "nofollow" in n.attrs.get("rel", "").lower().split() else 0
        if with_anchor:
            out[(dst, host_of_url(dst), nf, anchor_text(n))] += 1
        else:
            out[(dst, host_of_url(dst), nf)] += 1
    return out


class ExtractOutlinks:
    """Actor-pool stage: (url, html, ...) -> exploded outlink rows
    ``(url, src_host, dst_url, dst_host, nofollow, n)``, plus an
    ``anchor`` column (normalized, ``ANCHOR_MAX_CHARS``-truncated
    subtree text) when ``with_anchor``.

    Per-document DOM work is inherently Python (the same envelope as
    ``ExtractDocs`` / ``ExtractMainContent``); html bytes are dropped
    in-stage so only link rows ever reach an exchange.
    """

    def __init__(self, with_anchor: bool = False):
        self._kernel = page_outlinks  # warm per-actor handle
        self._with_anchor = with_anchor

    def __call__(self, batch: pa.Table) -> pa.Table:
        with_anchor = self._with_anchor
        srcs: list[str] = []
        shosts: list[str] = []
        dsts: list[str] = []
        dhosts: list[str] = []
        nofollow: list[int] = []
        anchors: list[str] = []
        ns: list[int] = []
        for url, html in zip(batch["url"].to_pylist(),
                             batch["html"].to_pylist()):
            links = self._kernel(url, html, with_anchor=with_anchor)
            if not links:
                continue
            sh = host_of_url(url)
            for key, n in links.items():
                srcs.append(url)
                shosts.append(sh)
                dsts.append(key[0])
                dhosts.append(key[1])
                nofollow.append(key[2])
                if with_anchor:
                    anchors.append(key[3])
                ns.append(n)
        cols = {
            "url": pa.array(srcs, pa.string()),
            "src_host": pa.array(shosts, pa.string()),
            "dst_url": pa.array(dsts, pa.string()),
            "dst_host": pa.array(dhosts, pa.string()),
            "nofollow": pa.array(nofollow, pa.int32()),
        }
        if with_anchor:
            cols["anchor"] = pa.array(anchors, pa.string())
        cols["n"] = pa.array(ns, pa.int64())
        return pa.table(cols)


def extract_outlinks(ds, *, batch_size: int = 64, concurrency=(1, 8),
                     with_anchor: bool = False):
    return ds.select_columns(["url", "html"]).map_batches(
        ExtractOutlinks, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
        fn_constructor_kwargs={"with_anchor": with_anchor},
    )


def top_anchors(links, *, by: str = "dst_host", k: int = 3):
    """Per-``by`` top-k anchor texts by total link count (the classic
    aggregated anchor-text signal).  Empty anchors (image-only links)
    are dropped; ties break ascending on the anchor string, so the
    result is deterministic and partition-independent.

    Scale shape: one groupby over (by, anchor) rows — the text column
    never travels, only the already-exploded link rows — then the
    bounded partial-top-k merge of :func:`rayxt.windows.grouped_topk`.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .windows import grouped_topk

    def pre(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["anchor"], ""))
        return pa.table({by: t[by], "anchor": t["anchor"], "n": t["n"]})

    agg = (links.map_batches(pre, batch_format="pyarrow")
           .groupby([by, "anchor"])
           .aggregate(Sum("n", alias_name="n_links")))
    return grouped_topk(agg, key=by, order_col="n_links", k=k,
                        descending=True, tie_cols=("anchor",))


def host_edges(links, *, drop_nofollow: bool = True,
               drop_self: bool = False, coalesce_blocks=True):
    """Collapse outlink rows to the DISTINCT host graph
    ``(src_host, dst_host)`` with a link multiplicity column ``n_links``
    (sum of per-page counts).  One groupby; the distinct-edge table is
    what every iteration of :func:`pagerank` re-reads."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def pre(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.not_equal(t["src_host"], ""),
                       pc.not_equal(t["dst_host"], ""))
        if drop_nofollow:
            mask = pc.and_(mask, pc.equal(t["nofollow"], 0))
        if drop_self:
            mask = pc.and_(mask, pc.not_equal(t["src_host"], t["dst_host"]))
        t = t.filter(mask).select(["src_host", "dst_host", "n"])
        # in-batch partial combine before the exchange: pages link to
        # the same host pair repeatedly, so this collapses most rows
        # map-side (the P9 pre-aggregation pattern)
        part = t.group_by(["src_host", "dst_host"]).aggregate([("n", "sum")])
        return pa.table({"src_host": part["src_host"],
                         "dst_host": part["dst_host"],
                         "n": part["n_sum"]})

    pre_ds = links.map_batches(pre, batch_format="pyarrow")
    if coalesce_blocks:
        # the extract pool hands over hundreds of small blocks and the
        # sort exchange pays per input block; a split/merge repartition
        # (no shuffle) collapses them first.  The partial-combined link
        # rows are tiny, so cpu-count blocks stay small even when the
        # page corpus is huge; pass coalesce_blocks=None to disable for
        # edge tables beyond memory-per-block comfort.
        import ray

        b = coalesce_blocks if coalesce_blocks is not True else max(
            2, int(ray.cluster_resources().get("CPU", 8)))
        pre_ds = pre_ds.repartition(b, shuffle=False)
    return (pre_ds.groupby(["src_host", "dst_host"])
            .aggregate(Sum("n", alias_name="n_links")))


def host_degrees(edges, *, src: str = "src_host", dst: str = "dst_host",
                 weight: str = "n_links"):
    """Per-host degree statistics over a distinct-edge table (the
    :func:`host_edges` output): ``out_degree`` / ``in_degree`` count
    distinct neighbour hosts, ``out_links`` / ``in_links`` sum the link
    multiplicities.  One exchange — each edge row contributes a source
    half and a destination half in-batch, merged by a single
    four-``Sum`` groupby (the node-universe union trick, no join)."""
    from ray.data.aggregate import Sum

    schema = pa.schema([
        ("host", pa.string()), ("out_degree", pa.int64()),
        ("in_degree", pa.int64()), ("out_links", pa.int64()),
        ("in_links", pa.int64())])

    def halves(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        ones = [1] * t.num_rows
        zeros = [0] * t.num_rows
        w = t[weight]
        z = pa.array(zeros, pa.int64())
        return pa.table({
            "host": pa.concat_arrays(
                [t[src].combine_chunks(), t[dst].combine_chunks()]),
            "out_degree": pa.array(ones + zeros, pa.int64()),
            "in_degree": pa.array(zeros + ones, pa.int64()),
            "out_links": pa.concat_arrays([w.cast(pa.int64()).combine_chunks(), z]),
            "in_links": pa.concat_arrays([z, w.cast(pa.int64()).combine_chunks()]),
        })

    return (edges.map_batches(halves, batch_format="pyarrow")
            .groupby("host")
            .aggregate(Sum("out_degree", alias_name="out_degree"),
                       Sum("in_degree", alias_name="in_degree"),
                       Sum("out_links", alias_name="out_links"),
                       Sum("in_links", alias_name="in_links")))


def _typed(t: pa.Table, schema: pa.Schema) -> pa.Table:
    if t.num_rows == 0:
        return schema.empty_table()
    return t.cast(schema)


_RANK_SCHEMA = pa.schema([("host", pa.string()), ("r", pa.float64()),
                          ("dang", pa.float64())])


def pagerank(edges, *, src: str = "src_host", dst: str = "dst_host",
             damping: float = 0.85, iters: int = 12, tol: float = 0.0,
             join_partitions: int = 64, mode: str = "auto",
             node_threshold: int = 4_000_000):
    """Host-level PageRank over a directed edge table (duplicate edges
    collapse to one).  Returns ``(host, pagerank)``; ranks sum to 1.

    Fixed-iteration power method with uniform teleport and dangling-mass
    redistribution (``tol > 0`` adds an early stop in broadcast mode
    when the per-iteration L1 delta drops below ``tol``; join mode
    always runs ``iters`` rounds)::

        r'(v) = (1-d)/N + d * (sum_{u->v} r(u)/outdeg(u) + dangling/N)

    Two execution modes, parity-tested against each other (and both
    against the dense numpy oracle):

    * ``broadcast`` (default when the host count fits
      ``node_threshold``): the rank VECTOR travels by ``ray.put`` once
      per iteration (the documented small-side broadcast envelope —
      hosts, not pages; 4M hosts ~= 32 MiB of float64), edges are
      index-encoded once and re-scanned distributed per round with a
      per-batch ``reduceat`` partial combine, and one |hosts|-bounded
      groupby merges partials.  One map + one small groupby per
      iteration — no hash join.
    Both modes first pin the (deduplicated) edge table in the object
    store and coalesce its block count by row count — the edge table is
    the HOST graph, orders of magnitude smaller than the page corpus,
    and it is re-read by every downstream stage (and per round in join
    mode), so one materialization replaces N re-executions and stops
    near-empty upstream reduce partitions from cascading into every
    exchange below.

    * ``join``: nothing driver-side beyond two scalars — the
      ``connected_components`` pattern (rayxt/dedup.py): the edge list
      is deduplicated and degree-annotated ONCE; one iteration = one
      hash join (ranks re-keyed onto edge sources) + one union+Sum
      groupby.  The beyond-broadcast fallback when the host universe
      itself outgrows the object-store envelope.  Partition counts are
      bounded below 32 rows/partition — Ray's hash join builds
      schema-less tables for partitions that get zero shards and acero
      then rejects the join (same guard as dedup.py).
    """
    from ray.data.aggregate import Count, Sum

    # collapse the input's block count before the groupby cascade: an
    # upstream aggregate hands over ~200 near-empty blocks (its reduce
    # partition count), and every exchange below would inherit that
    # 200x200 tiny-task matrix (measured: ~30s of fixed overhead on a
    # 901-edge graph).  One repartition sized by row count, done once.
    edges = edges.materialize()
    n_edges_in = edges.count()
    blocks_target = max(1, min(256, n_edges_in // 250_000 + 1))
    if edges.num_blocks() > 4 * blocks_target:
        edges = edges.repartition(blocks_target).materialize()
    # the distinct edge table is re-read by outdeg / node-universe /
    # encode (and join mode) — materialize it ONCE instead of
    # re-executing the dedup groupby per consumer
    edges_d = (edges.groupby([src, dst])
               .aggregate(Count(alias_name="__m"))
               .map_batches(lambda t: pa.table({"src": t[src],
                                                "dst": t[dst]}),
                           batch_format="pyarrow")
               .materialize())
    outdeg = (edges_d.groupby("src").aggregate(Count(alias_name="deg"))
              .map_batches(lambda t: pa.table(
                  {"host": t["src"],
                   "deg": t["deg"].cast(pa.float64()),
                   "dang": pa.array([0.0] * t.num_rows, pa.float64())}),
                  batch_format="pyarrow"))
    # node universe = src ∪ dst, with outdegree (0 => dangling)
    dst_nodes = edges_d.map_batches(
        lambda t: pa.table({"host": t["dst"],
                            "deg": pa.array([0.0] * t.num_rows),
                            "dang": pa.array([0.0] * t.num_rows)}),
        batch_format="pyarrow")
    node_schema = pa.schema([("host", pa.string()), ("deg", pa.float64()),
                             ("dang", pa.float64())])
    nodes0 = (outdeg.union(dst_nodes)
              .groupby("host")
              .aggregate(Sum("deg", alias_name="deg"))
              .map_batches(lambda t: _typed(pa.table({
                  "host": t["host"], "deg": t["deg"],
                  "dang": pa.compute.cast(
                      pa.compute.equal(t["deg"], 0.0), pa.float64())}),
                  node_schema), batch_format="pyarrow")
              .materialize())
    n_nodes = nodes0.count()
    out_schema = pa.schema([("host", pa.string()),
                            ("pagerank", pa.float64())])
    if n_nodes == 0:
        import ray.data as rd

        return rd.from_arrow(out_schema.empty_table())

    if mode not in ("auto", "broadcast", "join"):
        raise ValueError(f"unknown pagerank mode: {mode!r}")
    if mode == "auto":
        mode = "broadcast" if n_nodes <= node_threshold else "join"
    if mode == "broadcast":
        return _pagerank_broadcast(edges_d, nodes0, n_nodes,
                                   damping=damping, iters=iters, tol=tol,
                                   out_schema=out_schema)

    n_edges = edges_d.count()
    parts = max(1, min(join_partitions, n_edges // 32))
    # degree-annotated edges, computed once, re-joined every round
    edges_deg = (edges_d.join(
        outdeg.map_batches(lambda t: pa.table({"src": t["host"],
                                               "deg": t["deg"]}),
                           batch_format="pyarrow"),
        "inner", num_partitions=parts, on=("src",))
        .materialize())

    invn = 1.0 / n_nodes
    ranks = nodes0.map_batches(
        lambda t: _typed(pa.table({
            "host": t["host"],
            "r": pa.array([invn] * t.num_rows, pa.float64()),
            "dang": t["dang"]}), _RANK_SCHEMA),
        batch_format="pyarrow").materialize()
    base = nodes0.map_batches(
        lambda t: _typed(pa.table({
            "host": t["host"],
            "r": pa.array([0.0] * t.num_rows, pa.float64()),
            "dang": t["dang"]}), _RANK_SCHEMA),
        batch_format="pyarrow").materialize()

    import pyarrow.compute as pc

    for _ in range(iters):
        dmass = ranks.map_batches(
            lambda t: pa.table({"x": pc.multiply(t["r"], t["dang"])}),
            batch_format="pyarrow").sum("x") or 0.0
        teleport = (1.0 - damping) * invn + damping * dmass * invn
        contrib = (edges_deg.join(
            ranks.map_batches(lambda t: pa.table({"src": t["host"],
                                                  "r": t["r"]}),
                              batch_format="pyarrow"),
            "inner", num_partitions=parts, on=("src",))
            .map_batches(lambda t: _typed(pa.table({
                "host": t["dst"],
                "r": pc.divide(t["r"], t["deg"]),
                "dang": pa.array([0.0] * t.num_rows, pa.float64())}),
                _RANK_SCHEMA), batch_format="pyarrow"))
        ranks = (contrib.union(base)
                 .groupby("host")
                 .aggregate(Sum("r", alias_name="r"),
                            Sum("dang", alias_name="dang"))
                 .map_batches(lambda t, tp=teleport: _typed(pa.table({
                     "host": t["host"],
                     "r": pc.add(pc.multiply(t["r"], damping), tp),
                     "dang": t["dang"]}), _RANK_SCHEMA),
                     batch_format="pyarrow")
                 .materialize())
    return ranks.map_batches(
        lambda t: _typed(pa.table({"host": t["host"], "pagerank": t["r"]}),
                         out_schema),
        batch_format="pyarrow")


_MAX_EDGE_BLOCKS = 64


def _lazy_remotes():
    """Build the iteration's remote functions on first use (keeps the
    module importable without Ray side effects)."""
    global _contrib_block, _vec_sum
    if _contrib_block is not None:
        return
    import numpy as np
    import ray

    @ray.remote
    def contrib_block(tbl, rv, n):
        s = tbl["s"].to_numpy(zero_copy_only=False)
        d = tbl["d"].to_numpy(zero_copy_only=False)
        w = tbl["w"].to_numpy(zero_copy_only=False)
        return np.bincount(d, weights=rv[s] * w, minlength=n)

    @ray.remote
    def vec_sum(*vs):
        return np.sum(vs, axis=0)

    _contrib_block, _vec_sum = contrib_block, vec_sum


_contrib_block = None
_vec_sum = None


def _pagerank_broadcast(edges_d, nodes0, n_nodes: int, *, damping: float,
                        iters: int, out_schema: pa.Schema,
                        tol: float = 0.0):
    """Broadcast-mode power iteration (hosts fit the small-side
    envelope; the corpus-scale edge table never leaves the cluster).

    The host universe with outdegrees is pulled ONCE to the driver
    (|hosts| rows — the same bounded-aggregate envelope as the dedup
    broadcast sets), edges are index-encoded ONCE into compact
    ``(s:int64, d:int64, w:float64)`` rows carrying the pre-divided
    1/outdeg weight, and each iteration is: ``ray.put`` the rank
    vector, one distributed edge scan with a per-batch sort+``reduceat``
    partial combine, one |hosts|-bounded groupby Sum, and a bounded
    driver pull of the merged contributions.  No hash join anywhere.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    _lazy_remotes()
    # skip schema-less empty blocks Ray's Aggregate emits for empty
    # sort partitions (same quirk guarded by ensure_typed in dedup.py)
    node_tbl = pa.concat_tables(
        [b for b in ray.get(nodes0.to_arrow_refs()) if b.num_rows > 0])
    node_tbl = node_tbl.take(pc.sort_indices(node_tbl["host"]))
    hosts_np = node_tbl["host"].to_numpy(zero_copy_only=False)
    deg_np = node_tbl["deg"].to_numpy(zero_copy_only=False).astype(
        np.float64)
    dang_mask = deg_np == 0.0
    hosts_ref = ray.put(hosts_np)
    deg_ref = ray.put(deg_np)

    enc_schema = pa.schema([("s", pa.int64()), ("d", pa.int64()),
                            ("w", pa.float64())])

    def _encode(t: pa.Table, hosts_ref=hosts_ref, deg_ref=deg_ref):
        if t.num_rows == 0:
            return enc_schema.empty_table()
        hosts = ray.get(hosts_ref)
        deg = ray.get(deg_ref)
        s = np.searchsorted(hosts, t["src"].to_numpy(zero_copy_only=False))
        d = np.searchsorted(hosts, t["dst"].to_numpy(zero_copy_only=False))
        return pa.table({"s": pa.array(s, pa.int64()),
                         "d": pa.array(d, pa.int64()),
                         "w": pa.array(1.0 / deg[s], pa.float64())})

    edges_enc = edges_d.map_batches(
        _encode, batch_format="pyarrow").materialize()
    # bound the dense-partial footprint: <= _MAX_EDGE_BLOCKS concurrent
    # length-n float64 vectors in flight (32 MiB each at the 4M-host
    # threshold); one repartition, done once
    if edges_enc.num_blocks() > _MAX_EDGE_BLOCKS:
        edges_enc = edges_enc.repartition(_MAX_EDGE_BLOCKS).materialize()
    blocks = [b for b in edges_enc.to_arrow_refs()]

    # per-iteration work is raw Ray tasks, not a Dataset exchange: the
    # Dataset groupby's sort shuffle costs seconds of fixed overhead
    # PER ITERATION, while a dense np.bincount partial per pinned edge
    # block + an 8-ary tree reduce is one task wave (measured 57s -> ~4s
    # for 8 iterations on the 600k-page bench corpus).  This is the
    # documented "raw tasks where the Dataset API can't express it"
    # case: an iterative numeric kernel with driver-side convergence
    # control over immutable, already-materialized blocks.
    n = n_nodes
    invn = 1.0 / n
    r = np.full(n, invn)
    for _ in range(iters):
        dang = float(r[dang_mask].sum())
        r_ref = ray.put(r)
        refs = [_contrib_block.remote(b, r_ref, n) for b in blocks]
        while len(refs) > 1:
            refs = [_vec_sum.remote(*refs[i:i + 8])
                    for i in range(0, len(refs), 8)]
        contrib = ray.get(refs[0]) if refs else np.zeros(n)
        r_new = (1.0 - damping) * invn + damping * (contrib + dang * invn)
        # tol > 0: stop once the L1 delta converges (driver-side, two
        # length-n vectors; only available in broadcast mode)
        if tol > 0.0 and float(np.abs(r_new - r).sum()) < tol:
            r = r_new
            break
        r = r_new

    out = pa.table({"host": node_tbl["host"],
                    "pagerank": pa.array(r, pa.float64())}).cast(out_schema)
    return rd.from_arrow(out)
