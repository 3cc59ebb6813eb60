"""Deterministic seeded binlog generator (FIXTURES.md §§1-3).

Engine-independent (pandas/pyarrow only — the generator is the *mock
producer*, analogous to the reference's
tests/e2e/mock_data_producer.py:11-42, generalized from one golden
record to a full perturbed change log). Everything is a pure function
of the seed: no wall clock, no process entropy.

Perturbations (all seeded, FIXTURES.md §2):
- hot keys: conversation pick is Zipf-weighted -> a few conv_ids carry
  a large share of events (skew/salting tests);
- multi-event keys: several U for one (conv_id, turn_idx), U-after-D,
  I-after-D;
- duplicates: `dup_rate` of events re-emitted later *within the same
  segment* with identical (key, lsn) — at-least-once delivery;
- out-of-order: emit order locally shuffled within `disorder_window`
  positions, within a segment (bounded lag, watermark-safe);
- schema evolution: canonical op script at configurable LSN fractions.

Segment files are the unit the streaming file source tails; keeping
dups/disorder within a segment keeps per-batch LSN ranges disjoint,
which the lineage invariant checker asserts.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from etl_spark.cdc_schema import (
    BASE_VERSION,
    SchemaOp,
    canonical_ops,
    payload_fields,
    version_at_lsn,
)
from etl_spark.engine.normalize import normalize_text_py

BASE_EPOCH = pd.Timestamp("2026-01-01T00:00:00Z").tz_localize(None)  # UTC wall time
VOCAB = (
    "the a spark stream merge table row column key value batch window "
    "join filter sort agg data query fast slow big small order part "
    "customer line vector hash scan dup tool turn reply plan act"
).split()
ROLES = ["user", "assistant", "tool"]
TOOLS = ["search", "python", "browser", "none"]


@dataclass
class GenConfig:
    seed: int = 42
    n_convs: int = 10
    max_turns: int = 8  # base turns per conversation (upper bound)
    n_events: int = 200
    p_insert: float = 0.40
    p_update: float = 0.45
    p_delete: float = 0.15
    dup_rate: float = 0.05
    disorder_window: int = 8
    segment_size: int = 50
    zipf_alpha: float = 1.2
    messy_text: bool = True  # inject whitespace/NFD mess into event text
    # fractions of n_events where the canonical schema ops land; empty -> no evolution
    schema_op_fracs: tuple = field(default_factory=tuple)


def _text(rng: np.random.Generator, lo: int = 5, hi: int = 40) -> str:
    n = int(rng.integers(lo, hi))
    return " ".join(VOCAB[i] for i in rng.integers(0, len(VOCAB), n))


def _mess(rng: np.random.Generator, s: str) -> str:
    """Denormalize: random double spaces / tabs / NFD 'é' — the
    normalization UDF must map it back to canonical form."""
    toks = s.split()
    out = []
    for t in toks:
        out.append(t)
        r = rng.random()
        if r < 0.1:
            out.append("")  # double space
        elif r < 0.15:
            out[-1] = t + "\t"
    if rng.random() < 0.3:
        out.append("café")  # NFD é -> NFC 'café'
    return "  ".join(out) + ("  " if rng.random() < 0.3 else "")


def gen_base(cfg: GenConfig) -> pd.DataFrame:
    """Initial transcripts state (already in normalized text form)."""
    rng = np.random.default_rng(cfg.seed)
    rows = []
    for i in range(cfg.n_convs):
        conv = f"conv-{i:08d}"
        n_turns = int(rng.integers(1, cfg.max_turns + 1))
        for t in range(n_turns):
            role = ROLES[(t + int(rng.integers(0, 2))) % 3]
            rows.append(
                dict(
                    conv_id=conv,
                    turn_idx=t,
                    role=role,
                    text=_text(rng),
                    tool=str(np.random.default_rng((cfg.seed, i, t)).choice(TOOLS))
                    if role == "tool"
                    else None,
                    ts=int((BASE_EPOCH - pd.Timestamp(0)).total_seconds()) + t,
                )
            )
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["ts"] = df["ts"].astype("int64")
    return df


def gen_schema_ops(cfg: GenConfig) -> list[SchemaOp]:
    return canonical_ops(
        [max(1, int(f * cfg.n_events)) for f in cfg.schema_op_fracs]
    )


def gen_binlog(
    cfg: GenConfig, base: pd.DataFrame, ops: list[SchemaOp]
) -> pd.DataFrame:
    """Emit-ordered change events. Columns = BINLOG_SCHEMA; `ts` inside
    the payload JSON (long epoch-sec pre-widen, ISO string post-widen)."""
    rng = np.random.default_rng(cfg.seed + 1)
    convs = sorted(base["conv_id"].unique().tolist())
    # live-turn mirror + next fresh turn index per conversation
    live: dict[str, set] = {
        c: set(base.loc[base.conv_id == c, "turn_idx"].tolist()) for c in convs
    }
    next_turn = {c: (max(v) + 1 if v else 0) for c, v in live.items()}
    # Zipf-ish conversation weights (hot keys)
    w = 1.0 / np.arange(1, len(convs) + 1) ** cfg.zipf_alpha
    w /= w.sum()

    events = []
    for lsn in range(1, cfg.n_events + 1):
        conv = convs[int(rng.choice(len(convs), p=w))]
        has_rows = bool(live[conv])
        r = rng.random()
        if not has_rows or r < cfg.p_insert:
            op, turn = "I", next_turn[conv]
            next_turn[conv] += 1
            live[conv].add(turn)
        elif r < cfg.p_insert + cfg.p_update:
            op, turn = "U", int(rng.choice(sorted(live[conv])))
        else:
            op, turn = "D", int(rng.choice(sorted(live[conv])))
            live[conv].discard(turn)
        version = version_at_lsn(ops, lsn)
        payload = None
        if op != "D":
            role = ROLES[int(rng.integers(0, 3))]
            text = _text(rng)
            if cfg.messy_text:
                text = _mess(rng, text)
            ts_sec = int((BASE_EPOCH - pd.Timestamp(0)).total_seconds()) + 10_000 + lsn
            vals = {
                "role": role,
                "text": text,
                "tool": str(rng.choice(TOOLS)) if role == "tool" else None,
                "ts": ts_sec,
                "lang": str(rng.choice(["en", "es", "zh"])),
            }
            fields = payload_fields(ops, version)
            doc = {}
            for f in fields:
                # map current logical meaning by field id: ids 3..6 are
                # role,text,tool,ts; 7+ added columns (lang)
                base_name = {3: "role", 4: "text", 5: "tool", 6: "ts"}.get(f.id, f.name)
                v = vals.get(base_name)
                if f.id == 6 and f.type == "string" and v is not None:
                    v = pd.Timestamp(v, unit="s").strftime("%Y-%m-%d %H:%M:%S")
                doc[f.name] = v
            payload = json.dumps(doc)
        events.append(
            dict(
                lsn=lsn,
                op=op,
                conv_id=conv,
                turn_idx=turn,
                schema_version=version,
                payload=payload,
            )
        )

    # ---- perturb per segment: duplicates then bounded disorder.
    # Dups/disorder stay INSIDE a segment (a `_seg` tag carries the
    # boundary to write_segments) so per-batch LSN ranges stay disjoint.
    out = []
    for seg_id, s0 in enumerate(range(0, len(events), cfg.segment_size)):
        seg = events[s0 : s0 + cfg.segment_size]
        n_dup = int(cfg.dup_rate * len(seg))
        if n_dup:
            idxs = rng.choice(len(seg), size=n_dup, replace=False)
            for i in sorted(idxs):
                pos = int(rng.integers(i, len(seg)))
                seg = seg[: pos + 1] + [dict(seg[i])] + seg[pos + 1 :]
        if cfg.disorder_window > 1:
            keys = np.arange(len(seg)) + rng.uniform(0, cfg.disorder_window, len(seg))
            seg = [seg[i] for i in np.argsort(keys, kind="stable")]
        for e in seg:
            e = dict(e)
            e["_seg"] = seg_id
            out.append(e)

    df = pd.DataFrame(out)
    df["op_ts"] = BASE_EPOCH + pd.to_timedelta(np.arange(len(df)), unit="s")
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["schema_version"] = df["schema_version"].astype("int32")
    df["lsn"] = df["lsn"].astype("int64")
    return df[
        ["lsn", "op", "conv_id", "turn_idx", "op_ts", "schema_version", "payload", "_seg"]
    ]


def write_segments(
    binlog: pd.DataFrame, out_dir: str, segment_size: int | None = None
) -> list[str]:
    """LSN-segment parquet files the streaming file source tails.
    Splits on the generator's `_seg` tag when present (keeps dups and
    disorder inside one file), else slices by `segment_size`."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    if "_seg" in binlog.columns:
        groups = [(int(k), g.drop(columns="_seg")) for k, g in binlog.groupby("_seg")]
    else:
        assert segment_size, "segment_size required without _seg tags"
        groups = [
            (i // segment_size, binlog.iloc[i : i + segment_size])
            for i in range(0, len(binlog), segment_size)
        ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    for seg_id, seg in groups:
        p = os.path.join(out_dir, f"binlog-{seg_id:06d}.parquet")
        # micros on disk: Spark's vectorized reader rejects pandas'
        # default nanosecond timestamps
        tbl = pa.Table.from_pandas(seg, preserve_index=False)
        pq.write_table(tbl, p, coerce_timestamps="us", allow_truncated_timestamps=True)
        paths.append(p)
    return paths


def expected_event_count(binlog: pd.DataFrame) -> int:
    """Distinct LSNs (dedup-adjusted event count)."""
    return int(binlog["lsn"].nunique())
