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
    SchemaOp,
    canonical_ops,
    payload_fields,
    version_at_lsn,
)

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
    # fraction of UPDATE events emitted as partial-image patches
    # (op='P'): payload carries only a seeded non-empty subset of the
    # version's payload fields plus a `_changed` name mask (Debezium
    # partial row image). Patches only ever target live rows — the
    # generator draws them from the same live set as U, so 'P' never
    # lands between a key's D and its next I.
    patch_rate: float = 0.0
    disorder_window: int = 8
    segment_size: int = 50
    zipf_alpha: float = 1.2
    messy_text: bool = True  # inject whitespace/NFD mess into event text
    # fractions of n_events where the canonical schema ops land; empty -> no evolution
    schema_op_fracs: tuple = field(default_factory=tuple)


def _text(rng: np.random.Generator, lo: int = 5, hi: int = 40) -> str:
    n = int(rng.integers(lo, hi))
    return " ".join(VOCAB[i] for i in rng.integers(0, len(VOCAB), n))


def _text_pool(rng: np.random.Generator, size: int, messy: bool) -> list[str]:
    """Pre-generated distinct texts; per-row text is a vectorized pool
    pick (per-row scalar RNG calls are the generation bottleneck at
    bench scale: 10^6+ events)."""
    pool = [_text(rng) for _ in range(size)]
    if messy:
        pool = [_mess(rng, t) for t in pool]
    return pool


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
    """Initial transcripts state (already in normalized text form).
    Fully vectorized (numpy draws + pool texts) so multi-100k-row base
    states generate in seconds."""
    rng = np.random.default_rng(cfg.seed)
    n_turns = rng.integers(1, cfg.max_turns + 1, size=cfg.n_convs)
    total = int(n_turns.sum())
    conv_idx = np.repeat(np.arange(cfg.n_convs), n_turns)
    turn = np.concatenate([np.arange(k) for k in n_turns]) if total else np.array([], dtype=int)
    jitter = rng.integers(0, 2, size=total)
    role_idx = (turn + jitter) % 3
    pool = _text_pool(rng, min(max(64, total), 20000), messy=False)
    text_idx = rng.integers(0, len(pool), size=total)
    tool_idx = rng.integers(0, len(TOOLS), size=total)
    epoch0 = int((BASE_EPOCH - pd.Timestamp(0)).total_seconds())
    df = pd.DataFrame(
        {
            "conv_id": [f"conv-{i:08d}" for i in conv_idx],
            "turn_idx": turn.astype("int32"),
            "role": [ROLES[r] for r in role_idx],
            "text": [pool[i] for i in text_idx],
            "tool": [
                TOOLS[ti] if ROLES[r] == "tool" else None
                for r, ti in zip(role_idx, tool_idx)
            ],
            "ts": (epoch0 + turn).astype("int64"),
        }
    )
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
    # live-turn mirror (list + position map for O(1) random pick and
    # swap-pop removal — keeps generation O(n_events) at bench scale)
    live: dict[str, list[int]] = {c: [] for c in convs}
    live_pos: dict[str, dict[int, int]] = {c: {} for c in convs}
    for c, t in zip(base["conv_id"].tolist(), base["turn_idx"].tolist()):
        live_pos[c][int(t)] = len(live[c])
        live[c].append(int(t))
    next_turn = {c: (max(v) + 1 if v else 0) for c, v in live.items()}
    # Zipf-ish conversation weights (hot keys); conv picks pre-drawn
    # vectorized (per-event choice with p= is O(n_convs) each)
    w = 1.0 / np.arange(1, len(convs) + 1) ** cfg.zipf_alpha
    w /= w.sum()
    conv_picks = rng.choice(len(convs), size=cfg.n_events, p=w)
    op_draws = rng.random(cfg.n_events)
    role_picks = rng.integers(0, 3, size=cfg.n_events)
    tool_picks = rng.integers(0, len(TOOLS), size=cfg.n_events)
    lang_picks = rng.integers(0, 3, size=cfg.n_events)
    pool = _text_pool(
        rng, min(max(64, cfg.n_events), 20000), messy=cfg.messy_text
    )
    text_picks = rng.integers(0, len(pool), size=cfg.n_events)
    patch_draws = rng.random(cfg.n_events)
    # per-event field-subset selector for patches: bit i keeps payload
    # field i; drawn over a wide range so any field count is covered
    patch_bits = rng.integers(1, 1 << 16, size=cfg.n_events)

    def _pick_live(conv: str) -> int:
        lst = live[conv]
        return lst[int(rng.integers(0, len(lst)))]

    def _remove_live(conv: str, turn: int) -> None:
        lst, pos = live[conv], live_pos[conv]
        i = pos.pop(turn)
        last = lst.pop()
        if last != turn:
            lst[i] = last
            pos[last] = i

    events = []
    for lsn in range(1, cfg.n_events + 1):
        conv = convs[int(conv_picks[lsn - 1])]
        has_rows = bool(live[conv])
        r = op_draws[lsn - 1]
        if not has_rows or r < cfg.p_insert:
            op, turn = "I", next_turn[conv]
            next_turn[conv] += 1
            live_pos[conv][turn] = len(live[conv])
            live[conv].append(turn)
        elif r < cfg.p_insert + cfg.p_update:
            op, turn = "U", _pick_live(conv)
            if cfg.patch_rate and patch_draws[lsn - 1] < cfg.patch_rate:
                op = "P"
        else:
            op, turn = "D", _pick_live(conv)
            _remove_live(conv, turn)
        version = version_at_lsn(ops, lsn)
        payload = None
        if op != "D":
            role = ROLES[int(role_picks[lsn - 1])]
            text = pool[int(text_picks[lsn - 1])]
            ts_sec = int((BASE_EPOCH - pd.Timestamp(0)).total_seconds()) + 10_000 + lsn
            vals = {
                "role": role,
                "text": text,
                "tool": TOOLS[int(tool_picks[lsn - 1])] if role == "tool" else None,
                "ts": ts_sec,
                "lang": ["en", "es", "zh"][int(lang_picks[lsn - 1])],
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
            if op == "P":
                # partial image: keep a seeded non-empty subset of the
                # version's payload fields and name them in `_changed`
                bits = int(patch_bits[lsn - 1])
                keep = [f.name for i, f in enumerate(fields) if bits & (1 << i)]
                if not keep:
                    keep = [fields[bits % len(fields)].name]
                doc = {k: doc[k] for k in keep}
                doc["_changed"] = keep
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
            # re-emit each chosen event at a later position; built via
            # one keyed sort (repeated list insertion is O(seg^2))
            idxs = rng.choice(len(seg), size=n_dup, replace=False)
            keyed = [(float(j), e) for j, e in enumerate(seg)]
            for rank, i in enumerate(sorted(idxs)):
                pos = int(rng.integers(i, len(seg)))
                keyed.append((pos + 0.5 + 1e-9 * rank, dict(seg[i])))
            keyed.sort(key=lambda kv: kv[0])
            seg = [e for _, e in keyed]
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
        # default nanosecond timestamps. zstd over default snappy:
        # segment bytes are the serial-IO term of replay ingest, and
        # decompression parallelizes while the disk queue does not.
        tbl = pa.Table.from_pandas(seg, preserve_index=False)
        pq.write_table(tbl, p, coerce_timestamps="us", allow_truncated_timestamps=True,
                       row_group_size=20_000, compression="zstd", compression_level=3)
        paths.append(p)
    return paths


def expected_event_count(binlog: pd.DataFrame) -> int:
    """Distinct LSNs (dedup-adjusted event count)."""
    return int(binlog["lsn"].nunique())
