"""Small shared driver-side helpers used across the lake and engine
layers (single-sourced: the export/MV cursors and the three former
copies of the parquet footer row counter must not drift apart)."""

from __future__ import annotations

import json
import os


def read_cursor(path: str, key: str) -> int:
    """Read a one-value JSON cursor file; 0 when it does not exist."""
    if not os.path.exists(path):
        return 0
    with open(path) as fh:
        return int(json.load(fh)[key])


def write_cursor(path: str, key: str, version: int) -> None:
    """Atomically (tmp + os.replace) advance a one-value JSON cursor."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({key: version}, fh)
    os.replace(tmp, path)


def footer_row_count(path: str) -> int:
    """Exact row count of every parquet file under `path` from the
    footers — driver-side metadata reads, no Spark job."""
    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if fn.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, fn)).metadata.num_rows
    return total
