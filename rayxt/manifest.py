"""Checkpoint/resume manifest + per-partition lineage (SURVEY P12/P13).

Output layout (resumable, deterministic)::

    out_dir/
      part_id=NNNN/part.parquet      # the partition's rows
      lineage/NNNN.json              # lineage + metrics record
      manifest/NNNN.done             # atomic completion marker (written last)

``part_id = crc32(url) % P`` is a pure function of the url and P (never
of block/task ids), so a re-run computes identical partitions and can
skip every part_id whose done-marker exists.  Partition writes are
idempotent: parquet lands under a temp name and is renamed before the
marker appears, so a killed run leaves either nothing or a complete
partition.
"""

from __future__ import annotations

import json
import os
import time
import zlib


def part_id_of_url(url: str, num_partitions: int) -> int:
    return zlib.crc32(url.encode("utf-8")) % num_partitions


def partition_dir(out_dir: str, part_id: int) -> str:
    return os.path.join(out_dir, f"part_id={part_id:04d}")


def marker_path(out_dir: str, part_id: int) -> str:
    return os.path.join(out_dir, "manifest", f"{part_id:04d}.done")


def scan_done(out_dir: str) -> set[int]:
    """Completed part_ids per the manifest (job-level resume state)."""
    mdir = os.path.join(out_dir, "manifest")
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for name in os.listdir(mdir):
        if name.endswith(".done"):
            try:
                done.add(int(name[:-5]))
            except ValueError:
                continue
    return done


def reset_manifest(out_dir: str) -> int:
    """Remove ALL markers and lineage records (fresh-run semantics).

    A ``resume=False`` run must not inherit a previous run's commit
    state: a stale marker for a partition the new run emits zero rows
    for would falsely report it done (its shards were deleted), and
    ``read_lineage`` would mix records from different runs.  Returns
    the number of files removed.
    """
    removed = 0
    for sub in ("manifest", "lineage"):
        d = os.path.join(out_dir, sub)
        if not os.path.isdir(d):
            continue
        for name in os.listdir(d):
            if name.endswith((".done", ".json")):
                os.remove(os.path.join(d, name))
                removed += 1
    return removed


def write_partition(table, part_id: int, out_dir: str, *, engine_version: str,
                    program_name: str, extra: dict | None = None) -> dict:
    """Write one partition's parquet + lineage + done marker atomically.

    Runs inside the per-group task of the partitioned sink.  Returns the
    lineage record (also persisted as ``lineage/NNNN.json``).
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = time.time()
    pdir = partition_dir(out_dir, part_id)
    os.makedirs(pdir, exist_ok=True)
    os.makedirs(os.path.join(out_dir, "lineage"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "manifest"), exist_ok=True)

    final = os.path.join(pdir, "part.parquet")
    tmp = final + f".tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, final)

    status_counts: dict[str, int] = {}
    if "status" in table.column_names:
        import pyarrow.compute as pc

        vc = table.column("status").value_counts()
        for entry in vc.to_pylist():
            status_counts[entry["values"]] = entry["counts"]
    bytes_out = int(table.nbytes)
    record = {
        "part_id": part_id,
        "row_count": table.num_rows,
        "status_counts": status_counts,
        "bytes_out": bytes_out,
        "wall_ms": int((time.time() - t0) * 1000),
        "engine_version": engine_version,
        "program": program_name,
    }
    if extra:
        record.update(extra)
    lpath = os.path.join(out_dir, "lineage", f"{part_id:04d}.json")
    ltmp = lpath + f".tmp-{os.getpid()}"
    with open(ltmp, "w") as fh:
        json.dump(record, fh)
    os.replace(ltmp, lpath)

    mpath = marker_path(out_dir, part_id)
    mtmp = mpath + f".tmp-{os.getpid()}"
    with open(mtmp, "w") as fh:
        fh.write(json.dumps({"part_id": part_id, "rows": table.num_rows}))
    os.replace(mtmp, mpath)
    return record


def write_marker(out_dir: str, part_id: int, rows: int) -> None:
    """Atomically write one partition's done-marker (driver-side for the
    streaming sink, per-group-task for the exchange sink)."""
    os.makedirs(os.path.join(out_dir, "manifest"), exist_ok=True)
    mpath = marker_path(out_dir, part_id)
    mtmp = mpath + f".tmp-{os.getpid()}"
    with open(mtmp, "w") as fh:
        fh.write(json.dumps({"part_id": part_id, "rows": rows}))
    os.replace(mtmp, mpath)


def write_lineage_record(out_dir: str, record: dict) -> None:
    """Atomically persist one partition's lineage JSON."""
    os.makedirs(os.path.join(out_dir, "lineage"), exist_ok=True)
    lpath = os.path.join(out_dir, "lineage", f"{record['part_id']:04d}.json")
    ltmp = lpath + f".tmp-{os.getpid()}"
    with open(ltmp, "w") as fh:
        json.dump(record, fh)
    os.replace(ltmp, lpath)


def clean_partial_shards(out_dir: str, done: set[int]) -> int:
    """Remove shard files of partitions WITHOUT a done-marker (streaming
    sink resume: a dead run's half-written partitions must not leave
    duplicate rows behind).  Shard writes are atomic (tmp+rename), so
    only complete-but-unmarked shards exist; markers are the commit
    point.  Returns the number of files removed."""
    removed = 0
    if not os.path.isdir(out_dir):
        return 0
    for name in os.listdir(out_dir):
        if not name.startswith("part_id="):
            continue
        try:
            pid = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if pid in done:
            continue
        pdir = os.path.join(out_dir, name)
        for fname in os.listdir(pdir):
            if fname.startswith("shard-") and fname.endswith(".parquet"):
                os.remove(os.path.join(pdir, fname))
                removed += 1
    return removed


def read_lineage(out_dir: str) -> list[dict]:
    ldir = os.path.join(out_dir, "lineage")
    if not os.path.isdir(ldir):
        return []
    out = []
    for name in sorted(os.listdir(ldir)):
        if name.endswith(".json"):
            with open(os.path.join(ldir, name)) as fh:
                out.append(json.load(fh))
    return out
