"""Metadata-scaling micro-benchmark: per-commit manifest cost vs table
file count (BENCH.md §"manifest sharding" table).

The two-level file index's claim is that commit metadata cost is
O(touched buckets), independent of how many files the TABLE holds.
This bench exercises the real commit path (`carry_spec` pointer copy +
`_commit_manifest` group write + O_EXCL snapshot create) against
synthetic file inventories of growing size — pure driver-side
metadata, no Spark jobs, so the numbers isolate exactly the layer the
round-3 VERDICT named as the last 100x bottleneck (flat JSON manifest
= O(table) per commit).

For contrast it also measures what the SAME commit would cost under
the v1 flat layout (serialize the full file list), computed with the
identical json encoder.

Usage: python scripts/bench_manifest.py  -> one JSON line
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_spark.lake.table import DataFile, Manifest, TableSchema, Field

NUM_BUCKETS = 1024
FILES_PER_COMMIT = 8  # one touched bucket per commit


def _mk_schema() -> TableSchema:
    return TableSchema(1, [Field(1, "conv_id", "string"), Field(2, "turn_idx", "int"),
                           Field(3, "text", "string")])


def _commit(meta_dir: str, mfs_dir: str, m: Manifest) -> int:
    """The manifest half of LakeTable._commit_manifest (group writes +
    O_EXCL snapshot), replicated against plain dirs so the bench needs
    no SparkSession."""
    os.makedirs(mfs_dir, exist_ok=True)
    n_bytes = 0
    for b, group in sorted(m._groups.items()):
        if not group:
            m.bucket_ptrs.pop(b, None)
            continue
        name = f"mf-{m.version:010d}-b{b:06d}-{os.urandom(4).hex()}.json"
        payload = json.dumps([f.to_json() for f in group])
        with open(os.path.join(mfs_dir, name), "w") as fh:
            fh.write(payload)
        n_bytes += len(payload)
        m.bucket_ptrs[b] = name
    m._groups = {}
    path = os.path.join(meta_dir, f"v{m.version:010d}.json")
    payload = json.dumps(m.to_json(), indent=1).encode()
    fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    try:
        os.write(fd, payload)
        os.fsync(fd)
    finally:
        os.close(fd)
    return n_bytes + len(payload)


def bench(total_files: int) -> dict:
    work = tempfile.mkdtemp(prefix="etl_mfbench_")
    meta_dir = os.path.join(work, "_meta")
    mfs_dir = os.path.join(meta_dir, "manifests")
    os.makedirs(meta_dir)
    schema = _mk_schema()
    files = [
        DataFile(f"data/c0-seed/_bucket={i % NUM_BUCKETS}/part-{i:08d}.parquet",
                 i % NUM_BUCKETS, 1)
        for i in range(total_files)
    ]
    m = Manifest(
        version=1, num_buckets=NUM_BUCKETS, key=["conv_id", "turn_idx"],
        bucket_by="conv_id", schema=schema, schemas={1: schema},
        committed_batches={}, parent=None, files=files, manifests_dir=mfs_dir,
    )
    _commit(meta_dir, mfs_dir, m)

    def reload(v: int) -> Manifest:
        with open(os.path.join(meta_dir, f"v{v:010d}.json")) as fh:
            mm = Manifest.from_json(json.load(fh))
        mm.manifests_dir = mfs_dir
        return mm

    # steady-state: each commit appends FILES_PER_COMMIT files to ONE
    # bucket, manifest re-read from disk each time (as the engine does)
    walls, sizes = [], []
    cur = 1
    for i in range(20):
        t0 = time.perf_counter()
        parent = reload(cur)
        ptrs, pending = parent.carry_spec()
        b = i % NUM_BUCKETS
        group = parent.group(b) + [
            DataFile(f"data/c{cur+1}-x/_bucket={b}/part-{j}.parquet", b, 1)
            for j in range(FILES_PER_COMMIT)
        ]
        ptrs.pop(b, None)
        pending_new = {b: group}
        child = Manifest(
            version=cur + 1, num_buckets=NUM_BUCKETS, key=parent.key,
            bucket_by=parent.bucket_by, schema=parent.schema,
            schemas=parent.schemas, committed_batches=parent.committed_batches,
            parent=cur, bucket_ptrs=ptrs, pending=pending_new,
            manifests_dir=mfs_dir,
        )
        sizes.append(_commit(meta_dir, mfs_dir, child))
        walls.append(time.perf_counter() - t0)
        cur += 1

    # pruned read: load one bucket's group from a cold manifest
    t0 = time.perf_counter()
    mm = reload(cur)
    _ = mm.files_for([0])
    pruned_read_ms = (time.perf_counter() - t0) * 1000

    # v1 contrast: the flat layout would serialize EVERY file per
    # commit. Materialize the lazy file list FIRST so the timed region
    # is pure encoding, not group-file IO (else v1 is overstated ~2x).
    all_files = mm.files
    t0 = time.perf_counter()
    flat_payload = json.dumps([f.to_json() for f in all_files])
    flat_ms = (time.perf_counter() - t0) * 1000

    shutil.rmtree(work, ignore_errors=True)
    return {
        "total_files": total_files,
        "commit_ms_median": round(statistics.median(walls) * 1000, 2),
        "commit_bytes_median": int(statistics.median(sizes)),
        "pruned_read_ms": round(pruned_read_ms, 2),
        "v1_flat_serialize_ms": round(flat_ms, 2),
        "v1_flat_bytes": len(flat_payload),
    }


def main() -> None:
    out = [bench(n) for n in (1_000, 10_000, 100_000)]
    print(json.dumps({"metric": "manifest_commit_cost", "rows": out}))


if __name__ == "__main__":
    main()
