"""Ray Data pipeline operators around the extraction kernel (SURVEY P1-P17).

Design notes (100 TB scale):

* the extract stage is an ACTOR POOL (`map_batches(ExtractDocs, ...)`):
  the compiled rule program + signature caches are built once per actor
  in ``__init__`` and stay warm across batches (BASELINE.json north
  star); batches are zero-copy Arrow in and Arrow out;
* column pruning happens at the read (`columns=[url, warc_ts, html,
  lang]`); the heavy ``html`` column never survives past the extract
  stage, so the url-hash shuffle moves only extracted text (small);
* ``part_id = crc32(url) % P`` is the ONE partitioning key reused by
  dedup, the sink and resume; the default streaming sink writes
  hive-partitioned shards with ZERO all-to-all exchanges (the optional
  exchange sink is the single end-to-end shuffle);
* giant-row skew: rows above ``hard_cap`` are never parsed (status
  ``too_large``); an optional per-row deadline (``timeout_s``) stops a
  pathological parse cooperatively (status ``timeout``); the optional
  two-tier mode routes big rows to a dedicated pool with
  ``batch_size=1``.  The input is materialized ONCE
  before the tier fork so the parquet read never runs twice; the cost
  is pinning the pruned 4-column input in the object store for the
  run.  (A single pool with per-yield block boundaries is not
  expressible: Ray coalesces generator-UDF output batches back into
  target-size blocks — measured; and batch_size=1 for everything costs
  2.7x in per-batch overhead.)  At multi-TB scale prefer tiering at
  the file layout level: route oversized documents to their own input
  shards at ingest and run the two tiers as separate jobs.
"""

from __future__ import annotations

import hashlib
import os
import sys
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Baked at driver import time; worker-side UDFs bootstrap their import
# path from it (the UDF objects themselves travel by value — see
# rayxt.__init__._register_pickle_by_value — but runtime imports inside
# methods still resolve through the filesystem).  On a real multi-node
# cluster ship the package with `runtime_env={"py_modules": [rayxt]}`.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ensure_worker_importable() -> None:
    if (
        os.path.isdir(os.path.join(_REPO_ROOT, "rayxt"))
        and _REPO_ROOT not in sys.path
    ):
        sys.path.insert(0, _REPO_ROOT)

from . import __version__
from .state import key_digests
from .dom import decode_html, parse_html, parse_xml
from .xpath import parse_css, parse_xpath
from .kernel import DEFAULT_HARD_CAP, extract_one
from .linkgraph import host_of_url
from .manifest import (
    clean_partial_shards,
    partition_dir,
    reset_manifest,
    scan_done,
    write_lineage_record,
    write_marker,
    write_partition,
)
from .programs import get_program_factory

import logging

logger = logging.getLogger(__name__)

RULE_HITS_TYPE = pa.list_(
    pa.struct([("rule", pa.string()), ("hits", pa.int32())])
)
SPANS_TYPE = pa.list_(
    pa.struct([("start", pa.int64()), ("end", pa.int64()), ("kind", pa.string())])
)

EXTRACT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("text", pa.string()),
        ("n_chars", pa.int64()),
        ("html_len", pa.int64()),
        ("status", pa.string()),
        ("error", pa.string()),
        ("rule_hits", RULE_HITS_TYPE),
        ("spans", SPANS_TYPE),
    ]
)

PAGES_COLUMNS = ["url", "warc_ts", "html", "lang"]


def strip_schema_metadata(t: pa.Table) -> pa.Table:
    """Drop parquet-embedded pandas metadata from a block's schema.

    pa.Schema hashes its metadata as a dict, so metadata-bearing
    schemas are unhashable and defeat Ray's block-schema dedup with a
    per-concat "Failed to hash the schemas" warning.  Zero-copy: only
    the schema object changes, and the stage fuses with the read."""
    return t.replace_schema_metadata(None)


def read_parquet_clean(path, *, columns=None, **kwargs):
    """``ray.data.read_parquet`` with metadata-free schemas.

    Passing an explicit metadata-stripped ``schema`` keeps even the
    blocks INSIDE the fused read task (SplitBlocks concats) hashable;
    the strip stage after the read covers layouts where the one-file
    schema probe does not apply (directories, glob lists)."""
    import ray.data as rd

    probe = path[0] if isinstance(path, (list, tuple)) and path else path
    if "schema" not in kwargs and isinstance(probe, str) \
            and probe.endswith(".parquet") and os.path.isfile(probe):
        import pyarrow.parquet as pq

        s = pq.read_schema(probe)
        fields = [s.field(i).remove_metadata() for i in range(len(s))]
        if columns:
            by_name = {f.name: f for f in fields}
            fields = [by_name[c] for c in columns if c in by_name]
        kwargs["schema"] = pa.schema(fields)
    ds = rd.read_parquet(
        path, columns=list(columns) if columns else None, **kwargs)
    return ds.map_batches(strip_schema_metadata, batch_format="pyarrow")


def read_pages(path, columns=PAGES_COLUMNS, **kwargs):
    """P1: parquet source with column pruning (html read only here)."""
    return read_parquet_clean(path, columns=columns, **kwargs)


def detect_encoding(ds, col: str = "html", out_enc: str = "encoding",
                    out_chars: str = "n_chars_decoded"):
    """Expose the S2 encoding sniff as a diagnostic column pair: the
    encoding :func:`rayxt.dom.decode_html` settles on (the frozen BOM
    -> declared-charset -> UTF-8-strict -> latin-1 chain) and the
    decoded character count AFTER newline normalization — a value
    that depends on the whole decode, so an oracle match pins the
    chain, not just the label.  Stateless map, payload dies in-stage
    unless the caller keeps it; per-row decode is the identical work
    the extract kernel performs, surfaced without a parse."""

    def sniff(t: pa.Table) -> pa.Table:
        encs = []
        counts = []
        for data in t[col].to_pylist():
            text, enc = decode_html(data)
            encs.append(enc)
            counts.append(len(text))
        out = t.append_column(out_enc, pa.array(encs, pa.string()))
        return out.append_column(out_chars,
                                 pa.array(counts, pa.int64()))

    return ds.map_batches(sniff, batch_format="pyarrow")


class ExtractDocs:
    """P3: stateful parse+extract batch operator (actor pool member).

    ``program`` is a NAME from :mod:`rayxt.programs` — the actor
    compiles its own program once; only the small string crosses the
    process boundary.
    """

    def __init__(self, program: str = "main_content",
                 hard_cap: int = DEFAULT_HARD_CAP,
                 timeout_s: float | None = None,
                 program_overrides: dict | None = None):
        # NOTE: get_program_factory is a module-level import captured in
        # the by-value pickle payload — do NOT re-import rayxt here: a
        # filesystem re-import would create a second copy of the class
        # hierarchy and break isinstance checks inside the kernel.
        ensure_worker_importable()
        self.program = get_program_factory(program)()
        self.hard_cap = hard_cap
        self.timeout_s = timeout_s
        # P10a per-domain rule overrides: {host -> program name} ships
        # by value (small state); each DISTINCT program compiles once
        # per actor, hosts share the compiled object
        self._host_programs = {}
        if program_overrides:
            compiled: dict = {}
            for host, name in program_overrides.items():
                if name not in compiled:
                    compiled[name] = get_program_factory(name)()
                self._host_programs[host.lower()] = compiled[name]

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        n = len(urls)
        texts = [""] * n
        n_chars = [0] * n
        html_len = [0] * n
        status = [""] * n
        error = [""] * n
        rule_hits = [None] * n
        spans = [None] * n
        program = self.program
        host_programs = self._host_programs
        cap = self.hard_cap
        timeout_s = self.timeout_s
        for k in range(n):
            html = htmls[k]
            html_len[k] = len(html) if html is not None else 0
            prog = host_programs.get(host_of_url(urls[k]), program) \
                if host_programs else program
            r = extract_one(html, prog, cap, timeout_s)
            texts[k] = r["text"]
            n_chars[k] = r["n_chars"]
            status[k] = r["status"]
            error[k] = r["error"]
            rule_hits[k] = [{"rule": a, "hits": b} for a, b in r["rule_hits"]]
            spans[k] = [
                {"start": s, "end": e, "kind": kind} for s, e, kind in r["spans"]
            ]
        out = pa.Table.from_arrays(
            [
                batch.column("url"),
                batch.column("warc_ts"),
                batch.column("lang"),
                pa.array(texts, pa.string()),
                pa.array(n_chars, pa.int64()),
                pa.array(html_len, pa.int64()),
                pa.array(status, pa.string()),
                pa.array(error, pa.string()),
                pa.array(rule_hits, RULE_HITS_TYPE),
                pa.array(spans, SPANS_TYPE),
            ],
            schema=EXTRACT_SCHEMA,
        )
        # pass the partition key through when tagging happened upstream
        # (resume filters BEFORE extraction that way — see run_extraction_job)
        if "part_id" in batch.column_names:
            out = out.append_column("part_id", batch.column("part_id"))
        return out


def extract_pages(
    ds,
    program: str = "main_content",
    *,
    batch_size: int = 64,
    concurrency=(2, 8),
    hard_cap: int = DEFAULT_HARD_CAP,
    two_tier: bool = False,
    size_threshold: int = 256 * 1024,
    timeout_s: float | None = None,
    program_overrides: dict | None = None,
):
    """P3 + P15: run the extraction actor pool over a pages Dataset.

    ``two_tier=True`` splits rows at ``size_threshold`` html bytes: the
    big tier runs with ``batch_size=1`` so one multi-MB document never
    blocks a whole batch (head-of-line) and memory per in-flight batch
    stays bounded.  The input is materialized once before the fork —
    both tiers then filter shared object-store blocks instead of
    re-running the read (see module docstring for the tradeoff).

    ``program_overrides`` maps hosts to program names (P10a per-domain
    rule overrides): the small dict broadcasts by value, each actor
    compiles every distinct program once, and rows route by
    ``host_of_url``.
    """
    kwargs = dict(
        fn_constructor_kwargs={"program": program, "hard_cap": hard_cap,
                               "timeout_s": timeout_s,
                               "program_overrides": program_overrides},
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
    if not two_tier:
        return ds.map_batches(ExtractDocs, batch_size=batch_size, **kwargs)
    ds = ds.materialize()  # ONE read; the two tier branches share blocks

    def _len_expr(t: pa.Table, big: bool) -> pa.Table:
        lens = pc.binary_length(t.column("html"))
        mask = pc.greater_equal(lens, size_threshold) if big else pc.less(
            lens, size_threshold
        )
        return t.filter(mask)

    small = ds.map_batches(
        lambda t: _len_expr(t, False), batch_format="pyarrow"
    ).map_batches(ExtractDocs, batch_size=batch_size, **kwargs)
    big = ds.map_batches(
        lambda t: _len_expr(t, True), batch_format="pyarrow"
    ).map_batches(ExtractDocs, batch_size=1, **kwargs)
    return small.union(big)


class ExtractWikitables:
    """Actor-pool stage: wikitable record extraction (doc -> rows).

    Flattens the wikipedia_table program's per-document record list into
    one output row per table row: (url, table_idx, row_idx, name, count,
    note) — the fixed template headers lowercased.  Rows without a
    'wikitable' byte marker are skipped before parsing (cheap prefilter).
    """

    def __init__(self):
        ensure_worker_importable()
        self.program = get_program_factory("wikipedia_table")()

    def __call__(self, batch: pa.Table) -> pa.Table:
        # vectorized prefilter on the BINARY column: rows without the
        # marker never cross into Python lists (null html drops too)
        batch = batch.filter(pc.match_substring(batch["html"], "wikitable"))
        # parse_html is module-level: the by-value pickle graph must stay
        # self-consistent (see ExtractDocs.__init__ note)
        urls_out, t_idx, r_idx, names, counts, notes = [], [], [], [], [], []
        for url, html in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
            if not html:
                continue
            try:
                records = self.program(parse_html(html)) or []
            except Exception:  # noqa: BLE001 — poison rows yield no records
                continue
            for rec in records:
                urls_out.append(url)
                t_idx.append(rec.get("table_idx", 0))
                r_idx.append(rec.get("row_idx", 0))
                names.append(rec.get("Name", ""))
                counts.append(rec.get("Count", ""))
                notes.append(rec.get("Note", ""))
        return pa.table(
            {
                "url": pa.array(urls_out, pa.string()),
                "table_idx": pa.array(t_idx, pa.int64()),
                "row_idx": pa.array(r_idx, pa.int64()),
                "name": pa.array(names, pa.string()),
                "count": pa.array(counts, pa.string()),
                "note": pa.array(notes, pa.string()),
            }
        )


class ExtractModsTei:
    """Actor-pool stage: MODS->TEI doc-to-doc transformation (url, tei_xml)."""

    def __init__(self):
        ensure_worker_importable()
        self.program = get_program_factory("mods_to_tei")()

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.match_substring(batch["html"], "loc.gov/mods"))
        urls_out, xml_out = [], []
        for url, html in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
            if not html:
                continue
            try:
                root, nsmap = parse_xml(html)
                xml_out.append(self.program(root, nsmap=nsmap))
                urls_out.append(url)
            except Exception:  # noqa: BLE001
                continue
        return pa.table(
            {"url": pa.array(urls_out, pa.string()),
             "tei_xml": pa.array(xml_out, pa.string())}
        )


# ---------------------------------------------------------------------------
# partitioning / dedup / stats
# ---------------------------------------------------------------------------


def add_part_id(ds, num_partitions: int, key_col: str = "url"):
    """P6: deterministic key-hash partition key (crc32(key) % P).
    ``key_col`` defaults to the url (the engine-wide routing
    convention); exporters that must CO-LOCATE rows by another key
    (canonical url, SURT urlkey) pass theirs — one kernel, no per-site
    reimplementations to drift."""

    def tag(batch: pa.Table) -> pa.Table:
        pid = np.fromiter(
            (zlib.crc32(str(u).encode("utf-8")) % num_partitions
             for u in batch.column(key_col).to_pylist()),
            dtype=np.int64,
            count=batch.num_rows,
        )
        return batch.append_column("part_id", pa.array(pid, pa.int64()))

    return ds.map_batches(tag, batch_format="pyarrow")


def dedup_latest_by_url(ds, *, ts_col: str = "warc_ts"):
    """P7: keep one row per url — max ``warc_ts``; ties broken
    deterministically by the greatest remaining row tuple (column
    order), so the survivor is a pure function of the data, independent
    of block layout and arrival order.

    Implemented as an argmax-row ``AggregateFn``: each block contributes
    at most ONE candidate row per group (vectorized max + filter inside
    ``accumulate_block``), merges compare two candidate rows — no
    per-group Python UDF over billions of url groups.  The groupby is
    hash-partitioned and the payload through the shuffle is extracted
    text, not html.  Rows must not contain nulls in comparison columns
    (extraction output never does).
    """
    from ray.data.aggregate import AggregateFn

    def row_key(row: dict, names) -> tuple:
        return (row[ts_col], *(row[c] for c in names if c != ts_col))

    def accumulate_block(acc, block):
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block, preserve_index=False)
        if block.num_rows == 0:
            return acc
        mx = pc.max(block[ts_col])
        sub = block.filter(pc.equal(block[ts_col], mx))
        if sub.num_rows > 1:
            sub = sub.sort_by([(c, "descending") for c in sub.column_names])
        row = sub.slice(0, 1).to_pylist()[0]
        names = block.column_names
        if acc is None or row_key(row, names) > row_key(acc, names):
            return row
        return acc

    def merge(a, b):
        if a is None:
            return b
        if b is None:
            return a
        names = list(a)
        return a if row_key(a, names) >= row_key(b, names) else b

    latest = ds.groupby("url").aggregate(
        AggregateFn(init=lambda k: None, merge=merge, name="latest_row",
                    accumulate_block=accumulate_block)
    )

    def unpack(t: pa.Table) -> pa.Table:
        col = t["latest_row"].combine_chunks()
        fields = {f.name: pc.struct_field(col, f.name)
                  for f in col.type}
        return pa.table(fields)

    return latest.map_batches(unpack, batch_format="pyarrow")


def corpus_stats(ds):
    """P9: per-language corpus aggregates over the extraction output.

    Partial aggregation happens inside ``map_batches`` (one row per lang
    per batch), so the shuffle moves partials, not rows."""

    def partial(t: pa.Table) -> pa.Table:
        is_ok = pc.cast(pc.equal(t["status"], "ok"), pa.int64())
        narrow = pa.table({
            "lang": t["lang"],
            "is_ok": is_ok,
            "n_chars": t["n_chars"],
            "html_len": t["html_len"],
        })
        # null-lang rows are dropped (the former pandas-groupby behavior;
        # Arrow's group_by would keep a null key with count=0 instead)
        narrow = narrow.filter(pc.is_valid(narrow["lang"]))
        g = narrow.group_by("lang").aggregate([
            ("lang", "count"), ("is_ok", "sum"),
            ("n_chars", "sum"), ("html_len", "sum"),
        ])
        return g.rename_columns(
            ["lang", "docs", "ok_docs", "chars_out", "bytes_in"])

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("docs", alias_name="docs"),
            Sum("ok_docs", alias_name="ok_docs"),
            Sum("chars_out", alias_name="chars_out"),
            Sum("bytes_in", alias_name="bytes_in"),
        )
    )


def rule_hit_totals(ds):
    """P9: merge per-row rule-hit maps into corpus totals (partial
    combine inside map_batches, tiny groupby on rule name)."""

    def partial(t: pa.Table) -> pa.Table:
        totals: dict[str, int] = {}
        for row in t.column("rule_hits").to_pylist():
            if row:
                for entry in row:
                    totals[entry["rule"]] = totals.get(entry["rule"], 0) + entry["hits"]
        rules = sorted(totals)
        return pa.table(
            {
                "rule": pa.array(rules, pa.string()),
                "hits": pa.array([totals[r] for r in rules], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("rule")
        .aggregate(Sum("hits", alias_name="hits"))
    )


class SelectorProbe:
    """Actor-pool stage: count selector matches per page, emitting ONE
    partial-total row per (batch, probe) — the :func:`rule_hit_totals`
    partial-combine shape applied to arbitrary XPath/CSS selectors.

    ``probes`` maps a probe name to ``("xpath"|"css", selector)``.
    Selectors compile once per actor in ``__init__``; per row the page
    parses once and every probe evaluates against the same tree.
    Attribute-axis probes count VALUES (strings), element probes count
    elements — ``len()`` of the node-set either way.  Parse policy
    mirrors the conformance oracle: empty / over-cap / unparseable
    pages contribute zero.
    """

    HARD_CAP = 32 * 1024 * 1024  # == tests.oracle.ORACLE_HARD_CAP

    def __init__(self, probes: dict):
        # NOTE: parse_xpath/parse_css/parse_html are the MODULE-LEVEL
        # imports captured in the by-value pickle — a runtime relative
        # import here would load a second copy of the class hierarchy
        # in the worker and its isinstance(Node) checks would silently
        # drop every result (the ExtractDocs gotcha).
        ensure_worker_importable()
        self.compiled = {
            name: (parse_xpath(sel) if kind == "xpath" else parse_css(sel))
            for name, (kind, sel) in probes.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        totals = {name: 0 for name in self.compiled}
        for html in batch.column("html").to_pylist():
            if html is None or len(html) == 0 or len(html) > self.HARD_CAP:
                continue
            try:
                root = parse_html(html)
            except Exception:  # poison rows contribute zero
                continue
            for name, sel in self.compiled.items():
                totals[name] += len(sel.evaluate(root))
        names = sorted(totals)
        return pa.table({
            "probe": pa.array(names, pa.string()),
            "hits": pa.array([totals[n] for n in names], pa.int64()),
        })


def selector_probe_totals(ds, probes: dict, *, batch_size: int = 64,
                          concurrency=(1, 4)):
    """Corpus-wide selector match counts: actor-pool partials (one row
    per probe per batch) merged by a tiny Sum groupby."""
    from ray.data.aggregate import Sum

    return (
        ds.map_batches(
            SelectorProbe, fn_constructor_kwargs=dict(probes=probes),
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency, num_cpus=1,
        )
        .groupby("probe")
        .aggregate(Sum("hits", alias_name="hits"))
    )


def run_extraction_job(
    input_path,
    out_dir: str,
    num_partitions: int = 256,
    *,
    program: str = "main_content",
    batch_size: int = 128,
    concurrency=None,
    two_tier: bool = False,
    resume: bool = True,
    hard_cap: int = DEFAULT_HARD_CAP,
    sink: str = "streaming",
    timeout_s: float | None = None,
    target_block_mb: int | None = 32,
):
    """The composed flagship job: read -> tag part_id -> RESUME FILTER ->
    extract -> partitioned sink.

    The url-hash partition key is a pure function of the url, so it is
    computed BEFORE extraction and completed partitions are filtered out
    before any html is parsed — a resumed job pays only the read of the
    skipped rows' key columns, not their extraction (SURVEY P13).

    ``sink="streaming"`` (default) pipelines the partitioned write with
    extraction in one execution and never exchanges the corpus;
    ``sink="exchange"`` is the url-hash shuffle sink (one file per
    partition, in-run incremental markers).  See the sink-mode note
    above :func:`write_partitioned_streaming`.
    """
    if concurrency is None:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(1, min(int(ncpu) - 1, max(2, round(ncpu * 0.75))))
    # smaller blocks -> more sink tasks: with the default 128 MiB blocks
    # the streaming sink ran only ~10 write tasks at 32 CPUs (measured
    # r2, BENCH/STATS_32cpu.txt) and becomes the straggler as cores
    # grow; 32 MiB keeps sink tasks ≈ cores at this corpus scale while
    # staying far above per-task overhead.  Set on the context BEFORE
    # dataset creation (captured there), restored after.
    from ray.data import DataContext

    ctx = DataContext.get_current()
    prev_block = getattr(ctx, "target_max_block_size", None)
    if target_block_mb is not None:
        ctx.target_max_block_size = target_block_mb << 20
    try:
        return _run_extraction_job(
            input_path, out_dir, num_partitions, program=program,
            batch_size=batch_size, concurrency=concurrency,
            two_tier=two_tier, resume=resume, hard_cap=hard_cap,
            sink=sink, timeout_s=timeout_s,
        )
    finally:
        if target_block_mb is not None:
            ctx.target_max_block_size = prev_block


def _run_extraction_job(
    input_path,
    out_dir: str,
    num_partitions: int,
    *,
    program: str,
    batch_size: int,
    concurrency,
    two_tier: bool,
    resume: bool,
    hard_cap: int,
    sink: str,
    timeout_s: float | None,
):
    ds = read_pages(input_path)
    ds = add_part_id(ds, num_partitions)
    done = scan_done(out_dir) if resume else set()
    if done:
        done_set = pa.array(sorted(done), pa.int64())
        ds = ds.map_batches(
            lambda t: t.filter(
                pc.invert(pc.is_in(t.column("part_id"), value_set=done_set))
            ),
            batch_format="pyarrow",
        )
    ex = extract_pages(
        ds,
        program=program,
        batch_size=batch_size,
        concurrency=concurrency,
        hard_cap=hard_cap,
        two_tier=two_tier,
        timeout_s=timeout_s,
    )
    ex_cols = [f.name for f in EXTRACT_SCHEMA] + ["part_id"]
    if sink == "streaming":
        return write_partitioned_streaming(
            ex, out_dir, num_partitions, program_name=program, resume=resume,
            columns=ex_cols,
        )
    return write_partitioned(
        ex, out_dir, num_partitions, program_name=program, resume=resume,
        columns=ex_cols,
    )


# ---------------------------------------------------------------------------
# partitioned, resumable sinks
# ---------------------------------------------------------------------------
#
# Two sink modes, an explicit scale tradeoff:
#
# * STREAMING (default): every sink task writes its rows straight into
#   hive-style partition directories (``part_id=NNNN/shard-*.parquet``,
#   atomic tmp+rename).  Read, extraction actor pool and writes overlap
#   in ONE streaming execution and the corpus NEVER crosses an
#   all-to-all exchange — at 100 TB the exchange (2x the corpus through
#   the object store + a barrier) is the scale risk, not the write.
#   Cost: several shard files per partition, and in-RUN crash
#   granularity is the whole run (markers are committed by the driver
#   after the execution finishes).  ACROSS-run resume is identical to
#   the exchange sink: done partitions are filtered out before the
#   parse stage, stale shards of unfinished partitions are deleted at
#   start.
# * EXCHANGE: url-hash shuffle -> one file per partition + per-partition
#   markers committed as each group lands (in-run incremental resume).
#   Keep for workloads that need exactly-one-file partitions or
#   mid-run checkpointing; the exchange cost is the price.


def _shard_name(sub: pa.Table, pid: int) -> str:
    """Deterministic shard filename from the shard's logical content.

    Ray may RETRY a sink task (worker crash, lineage re-execution after
    object-store eviction); shard writing is a side effect, so retry
    idempotency comes from naming: re-executed tasks replay the same
    input block and thus the same batches, the digest matches, and
    ``os.replace`` overwrites the first attempt's file instead of
    duplicating its rows (the former random-UUID names silently doubled
    rows on retry — ADVICE r2).  Digest = sha1 over the key columns'
    value sequences + row count + partition id — a pure function of the
    shard's logical content, so it is retry-correct under every replay
    mode (fresh worker, same worker, partial re-execution).  Residual
    caveat: two shards of one partition whose (url, warc_ts, n_chars)
    sequences are byte-identical would collide and keep one file — that
    requires an exactly repeated 10^4-row run of the corpus.
    """
    h = hashlib.sha1()
    h.update(b"%d:%d" % (pid, sub.num_rows))
    names = sub.column_names
    keys = [c for c in ("url", "warc_ts", "n_chars") if c in names] or [names[0]]
    for key in keys:
        # vectorized: one 128-bit digest array per key column (fixed,
        # process-stable hash keys) instead of a per-value repr loop
        h.update(key_digests(sub.column(key)).tobytes())
    return f"shard-{h.hexdigest()[:20]}.parquet"


def _write_shard_batch(batch: pa.Table, *, out_dir: str) -> pa.Table:
    """Sink task body: write one batch's rows into their partition dirs.

    One file per (task, partition-present-in-batch); ``part_id`` is
    carried by the directory name (hive), not duplicated in the file.
    Shard names are deterministic (:func:`_shard_name`) so task retries
    overwrite rather than duplicate.  Returns per-partition partials
    ``(part_id, rows, bytes_out, ok_rows)`` — the driver sums them (no
    Ray shuffle for the summary).
    """
    import pyarrow.parquet as pq
    if batch.num_rows == 0:
        return pa.table({"part_id": pa.array([], pa.int64()),
                         "rows": pa.array([], pa.int64()),
                         "bytes_out": pa.array([], pa.int64()),
                         "ok_rows": pa.array([], pa.int64())})
    t = batch.sort_by("part_id")
    pids = t.column("part_id").to_numpy()
    bounds = np.flatnonzero(np.diff(pids)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(pids)]))
    body = t.drop_columns(["part_id"])
    has_status = "status" in body.column_names
    out_pid, out_rows, out_bytes, out_ok = [], [], [], []
    for s, e in zip(starts, ends):
        pid = int(pids[s])
        sub = body.slice(int(s), int(e - s))
        pdir = partition_dir(out_dir, pid)
        os.makedirs(pdir, exist_ok=True)
        final = os.path.join(pdir, _shard_name(sub, pid))
        tmp = final + f".tmp-{os.getpid()}"
        pq.write_table(sub, tmp)
        os.replace(tmp, final)
        out_pid.append(pid)
        out_rows.append(sub.num_rows)
        out_bytes.append(int(sub.nbytes))
        out_ok.append(
            int(pc.sum(pc.equal(sub.column("status"), "ok")).as_py() or 0)
            if has_status else sub.num_rows
        )
    return pa.table({"part_id": pa.array(out_pid, pa.int64()),
                     "rows": pa.array(out_rows, pa.int64()),
                     "bytes_out": pa.array(out_bytes, pa.int64()),
                     "ok_rows": pa.array(out_ok, pa.int64())})


def write_partitioned_streaming(
    ds,
    out_dir: str,
    num_partitions: int,
    *,
    program_name: str = "main_content",
    resume: bool = True,
    drop_columns: tuple = ("rule_hits", "spans"),
    rows_per_write: int | None = None,
    columns: list | None = None,
):
    """P12/P13/P14 streaming sink: partitioned write with NO exchange.

    See the mode comparison above.  Returns a pandas summary
    ``(part_id, rows)`` like the exchange sink.

    ``columns`` lets the caller DECLARE the input's column names.
    Without it the sink asks ``ds.columns()``, which executes the
    upstream plan to its first row — harmless on a pure map pipeline
    (streaming early-exit) but a FULL extra execution when an
    all-to-all barrier (groupby/sort) sits upstream.  Callers that
    know their schema should always pass it.

    ``rows_per_write`` is the sink batch size and therefore the sink
    TASK granularity (Ray coalesces input blocks into batches of this
    many rows, one task per batch).  The former fixed 65536 meant a
    600k-row corpus ran only ~10 write tasks regardless of core count —
    the straggler stage at 32 CPUs (r2 VERDICT item 4).  Default: scale
    to the cluster so sink tasks ≈ cores, floored so shard files stay
    reasonably sized (each task writes one shard per partition present
    in its batch).
    """
    import time

    import pandas as pd

    if rows_per_write is None:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8)) or 8
        rows_per_write = max(8192, 524288 // ncpu)

    done = scan_done(out_dir) if resume else set()
    if not resume:
        # fresh-run semantics: stale markers/lineage from previous runs
        # must not survive (a marker whose partition gets zero rows in
        # THIS run would falsely report done data that was just deleted)
        reset_manifest(out_dir)
    n_stale = clean_partial_shards(out_dir, done)
    if n_stale:
        logger.info("removed %d stale shard files from unfinished partitions",
                    n_stale)
    cols = columns if columns is not None else (ds.columns() or [])
    to_drop = [c for c in drop_columns if c in cols]
    if to_drop:
        ds = ds.drop_columns(to_drop)
    if "part_id" not in cols:
        ds = add_part_id(ds, num_partitions)
    if done:
        done_set = pa.array(sorted(done), pa.int64())
        ds = ds.map_batches(
            lambda t: t.filter(
                pc.invert(pc.is_in(t.column("part_id"), value_set=done_set))
            ),
            batch_format="pyarrow",
        )
    t0 = time.time()
    partials_ds = ds.map_batches(
        _write_shard_batch,
        fn_kwargs={"out_dir": out_dir},
        batch_size=rows_per_write,
        batch_format="pyarrow",
    )
    partials = partials_ds.to_pandas()  # tiny: one row per (task, partition)
    wall_ms = int((time.time() - t0) * 1000)
    # expose the executed plan's stage stats for bench capture
    try:
        write_partitioned_streaming.last_stats = partials_ds.stats()
    except Exception:  # pragma: no cover — stats are best-effort
        write_partitioned_streaming.last_stats = ""
    if partials.empty:
        return pd.DataFrame({"part_id": pd.Series([], dtype="int64"),
                             "rows": pd.Series([], dtype="int64")})
    summary = (
        partials.groupby("part_id", sort=True)
        .agg(rows=("rows", "sum"), bytes_out=("bytes_out", "sum"),
             ok_rows=("ok_rows", "sum"))
        .reset_index()
    )
    # commit point: markers + lineage AFTER the streaming execution
    for rec in summary.itertuples(index=False):
        write_lineage_record(out_dir, {
            "part_id": int(rec.part_id),
            "row_count": int(rec.rows),
            "status_counts": {"ok": int(rec.ok_rows)},
            "bytes_out": int(rec.bytes_out),
            "wall_ms": wall_ms,
            "engine_version": __version__,
            "program": program_name,
            "sink": "streaming",
        })
        write_marker(out_dir, int(rec.part_id), int(rec.rows))
    logger.info("streaming sink: %d rows into %d partitions in %.1fs",
                int(summary["rows"].sum()), len(summary), wall_ms / 1000)
    return summary[["part_id", "rows"]]


def write_partitioned(
    ds,
    out_dir: str,
    num_partitions: int,
    *,
    program_name: str = "main_content",
    resume: bool = True,
    drop_columns: tuple = ("rule_hits", "spans"),
    materialize_boundary: bool = True,
    columns: list | None = None,
):
    """P12/P13/P14: url-hash partitioned sink with lineage + manifest.

    Adds ``part_id``, skips partitions whose done-marker exists
    (resume), then writes each group atomically inside the per-group
    task.  Returns the list of lineage records for this run.
    """
    done = scan_done(out_dir) if resume else set()
    if not resume:
        # fresh-run semantics: wipe prior markers/lineage AND prior
        # partition files — a partition this run emits no rows for must
        # not surface a previous run's data or commit state
        reset_manifest(out_dir)
        if os.path.isdir(out_dir):
            for name in os.listdir(out_dir):
                if name.startswith("part_id="):
                    stale = os.path.join(out_dir, name, "part.parquet")
                    if os.path.exists(stale):
                        os.remove(stale)
    # drop nested (list<struct>) columns BEFORE the all-to-all exchange:
    # they slow the sort-based shuffle ~5x (measured 30s -> 6s on 40k
    # rows) and are not part of the persisted partition schema anyway
    cols = columns if columns is not None else (ds.columns() or [])
    to_drop = [c for c in drop_columns if c in cols]
    if to_drop:
        ds = ds.drop_columns(to_drop)
    if "part_id" not in cols:
        ds = add_part_id(ds, num_partitions)
    # phase boundary: the groupby shuffle is a barrier (it materializes
    # every row in the object store regardless), so an explicit
    # materialize() costs nothing asymptotically — and it ENDS the
    # extraction execution, releasing the actor pool's CPU reservation
    # so the shuffle phase gets the whole machine (measured: 128s -> ~50s
    # end-to-end on a 300k-doc corpus at 32 CPUs).
    import time as _time

    _t0 = _time.time()
    if materialize_boundary:
        ds = ds.materialize()
        logger.info("[write_partitioned] extract+materialize: %.1fs",
                    _time.time() - _t0)
        _t0 = _time.time()
    if done:
        done_arr = frozenset(done)
        ds = ds.map_batches(
            lambda t: t.filter(
                pc.invert(pc.is_in(t.column("part_id"),
                                   value_set=pa.array(list(done_arr), pa.int64())))
            ),
            batch_format="pyarrow",
        )

    def write_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"part_id": pa.array([], pa.int64()),
                             "rows": pa.array([], pa.int64())})
        pid = int(group.column("part_id")[0].as_py())
        table = group.drop_columns(
            [c for c in drop_columns if c in group.column_names]
        )
        rec = write_partition(
            table,
            pid,
            out_dir,
            engine_version=__version__,
            program_name=program_name,
        )
        return pa.table(
            {"part_id": pa.array([pid], pa.int64()),
             "rows": pa.array([rec["row_count"]], pa.int64())}
        )

    # hash shuffle beats the default sort shuffle ~2x for this key-
    # partitioned exchange (measured 27.7s -> 12.6s on ~1 GB); restore
    # the caller's strategy afterwards.
    from ray.data import DataContext

    ctx = DataContext.get_current()
    prev_strategy = getattr(ctx, "shuffle_strategy", None)
    prev_aggs = getattr(ctx, "max_hash_shuffle_aggregators", None)
    try:
        import ray
        from ray.data.context import ShuffleStrategy

        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        # one aggregator per CPU: the default (64) oversubscribes small
        # machines and anti-scales (measured 25.8s @64 -> 11.2s @32 aggs
        # on 32 CPUs for a ~1 GB exchange)
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        ctx.max_hash_shuffle_aggregators = max(4, min(64, ncpu))
    except ImportError:  # older ray: keep default
        pass
    try:
        summary = ds.groupby("part_id").map_groups(write_group, batch_format="pyarrow")
        out = summary.to_pandas()
        logger.info("[write_partitioned] shuffle+write: %.1fs",
                    _time.time() - _t0)
        return out
    finally:
        if prev_strategy is not None:
            ctx.shuffle_strategy = prev_strategy
        if prev_aggs is not None:
            ctx.max_hash_shuffle_aggregators = prev_aggs
