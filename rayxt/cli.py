"""Command-line entry points.

Two commands (SURVEY S1; the reference's ``inxs`` console script is the
single-document form, the pipeline runner is the ``ray job submit``
entry the north star requires):

single document (API parity with the reference CLI)::

    python -m rayxt transform my_transformation.py input.xml [-o out.xml]

Imports the module, picks ``main`` (or the sole Transformation object),
parses the document (XML if it starts with ``<?xml`` / the file ends in
``.xml``, lenient HTML otherwise), applies, serializes the result to
stdout or the output file.

distributed pipeline (the flagship)::

    python -m rayxt pipeline --input PATH --output DIR \
        [--program main_content] [--partitions 256] [--num-cpus N] \
        [--batch-size 128] [--no-resume] [--two-tier] \
        [--sink streaming|exchange]

Runs read -> actor-pool extract -> partitioned parquet write (default
streaming sink: hive shards, zero exchange; ``--sink exchange`` for
one-file-per-partition via the url-hash shuffle) with lineage +
manifest resume; prints a JSON summary.
On a real cluster submit this module via ``ray job submit --
python -m rayxt pipeline ...`` (Ray Data then spans all nodes).
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time


def _load_transformation(path: str):
    from .rules import Transformation

    spec = importlib.util.spec_from_file_location("_rayxt_user_transformation", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    if hasattr(mod, "main") and isinstance(mod.main, Transformation):
        return mod.main
    candidates = [
        v for v in vars(mod).values() if isinstance(v, Transformation)
    ]
    if len(candidates) != 1:
        raise SystemExit(
            f"{path} must define `main` or exactly one Transformation "
            f"(found {len(candidates)})"
        )
    return candidates[0]


def cmd_transform(args) -> int:
    from .dom import Node, parse_html, parse_xml, serialize

    transformation = _load_transformation(args.transformation)
    raw = open(args.document, "rb").read()
    nsmap = {}
    if args.document.endswith((".xml", ".mods")) or raw.lstrip().startswith(b"<?xml"):
        root, nsmap = parse_xml(raw)
    else:
        root = parse_html(raw)
    result = transformation(root, nsmap=nsmap)
    if isinstance(result, Node):
        out = serialize(result, xml_mode=bool(nsmap))
    elif isinstance(result, (dict, list)):
        out = json.dumps(result, indent=2, default=str)
    else:
        out = str(result)
    if args.output:
        with open(args.output, "w") as fh:
            fh.write(out)
    else:
        sys.stdout.write(out + "\n")
    return 0


def cmd_pipeline(args) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from .manifest import read_lineage
    from .pipeline import run_extraction_job

    program = args.program
    if program.endswith(".json"):  # declarative rule program (rayxt.ruledsl)
        with open(program, "r", encoding="utf-8") as fh:
            program = fh.read()

    t0 = time.time()
    summary = run_extraction_job(
        args.input,
        args.output,
        args.partitions,
        program=program,
        batch_size=args.batch_size,
        two_tier=args.two_tier,
        resume=not args.no_resume,
        sink=args.sink,
        timeout_s=args.row_timeout,
    )
    lineage = read_lineage(args.output)
    report = {
        "partitions_written": len(summary),
        "rows_written": int(summary["rows"].sum()) if len(summary) else 0,
        "partitions_total": len(lineage),
        "rows_total": sum(r["row_count"] for r in lineage),
        "wall_sec": round(time.time() - t0, 2),
        "output": args.output,
    }
    print(json.dumps(report))
    ray.shutdown()
    return 0


def cmd_lookup(args) -> int:
    """Seek-based ZipNum index lookup from the shell: binary-search
    cluster.idx, decompress only the touched blocks, print one TSV
    row per capture (no Ray session — the driver-utility path)."""
    from .cdx import zipnum_lookup

    t = zipnum_lookup(args.index_dir, args.prefix, exact=args.exact)
    cols = t.column_names
    out = sys.stdout
    out.write("\t".join(cols) + "\n")
    for row in t.to_pylist():
        out.write("\t".join(
            "" if row[c] is None else
            row[c].isoformat() if c == "ts" else str(row[c])
            for c in cols) + "\n")
    return 0 if t.num_rows else 1


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="rayxt")
    sub = parser.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("transform", help="apply a transformation to one document")
    t.add_argument("transformation", help="python file defining the Transformation")
    t.add_argument("document", help="XML/HTML input document")
    t.add_argument("-o", "--output", default=None)
    t.set_defaults(fn=cmd_transform)

    p = sub.add_parser("pipeline", help="run the distributed extraction pipeline")
    p.add_argument("--input", required=True, help="pages parquet path/dir")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--program", default="main_content",
                   help="registered program name, or a path to a "
                        "declarative .json rule program (rayxt.ruledsl)")
    p.add_argument("--partitions", type=int, default=256)
    p.add_argument("--num-cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--two-tier", action="store_true")
    p.add_argument("--sink", choices=("streaming", "exchange"),
                   default="streaming",
                   help="streaming: hive shards, no exchange (default); "
                        "exchange: one file per partition via shuffle")
    p.add_argument("--row-timeout", type=float, default=None,
                   help="per-row parse deadline in seconds "
                        "(status='timeout' instead of stalling a batch)")
    p.set_defaults(fn=cmd_pipeline)

    lk = sub.add_parser(
        "index-lookup",
        help="seek-based capture lookup in a ZipNum index directory")
    lk.add_argument("index_dir", help="directory with cluster.idx + "
                                      "cdx-*.gz parts (cdx.export_zipnum)")
    lk.add_argument("prefix", help="SURT urlkey or prefix")
    lk.add_argument("--exact", action="store_true",
                    help="exact-urlkey lookup (appends the field "
                         "separator) instead of prefix match")
    lk.set_defaults(fn=cmd_lookup)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
