"""Spark-distributed seeded binlog generator (FIXTURES.md §§1-3).

The driver-side generator (`gen_binlog`, 10x-vectorized in round 4)
still assembles the whole corpus in one Python process — fine to ~10M
events, a wall at the 10^10-event scale the north rule names. This
module generates the SAME corpus family (identical schema, envelope
encoding via the shared `payload_templates`, I/U/D/P legality, dups,
bounded disorder, Zipf skew, schema evolution) as a Spark job, so
corpus size is bounded by the cluster, not the driver.

Determinism without a sequential RNG: every random draw is a pure
function of (seed, draw-kind, global position) through a vectorized
splitmix64 finalizer — any task can derive any slice of any draw
stream independently, so the output is bit-identical at every
parallelism level (asserted by tests/test_gen_spark.py). This is a
DIFFERENT draw order than `gen_binlog`'s shared-stream RNG, so the
two paths produce different (equally valid) corpora for the same
GenConfig; callers cache them under different tags.

Plan shape (three stages, all Arrow-batched, no driver loop):
  1. positions: `spark.range(n)` -> (pos, conv, group-bucket), the
     Zipf conversation pick via inverse-CDF searchsorted over a
     broadcast cumulative weight vector;
  2. the only order-dependent state — per-conversation live-turn
     legality (I/U/D/P) — cogroups positions with the base state by
     conversation GROUP-BUCKET (conv % G: bounded task count, many
     conversations per group) and replays each conversation's events
     in position order inside the task, exactly the driver
     generator's simulation;
  3. events regroup by SEGMENT (pos // segment_size); each task
     assembles payload JSON from the shared templates, applies the
     in-segment perturbations (dup re-emits at later positions,
     bounded-window disorder), and writes its `binlog-NNNNNN.parquet`
     executor-side — the same file layout `write_segments` produces,
     so the streaming source and every downstream consumer are
     unchanged.

The inherent serial residue: a single conversation's event chain is
sequential by definition, so one Zipf-dominant conversation (alpha
>~2) serializes its own group's simulation — the same skew the ENGINE
handles with the write-skew guard; the generator inherits it by
construction, not by accident. The residue is a MEMORY bound as well
as a time bound: cogroup materializes each group's full position set
as one pandas frame in the simulating task, so a conversation holding
fraction f of n_events needs O(f * n_events) rows resident in that
one executor (~40 B/row for the three int64 columns + op strings —
f=0.5 of 10^10 events ≈ 200 GB, past any executor). At that scale,
chunk the dominant group: the live-set state dicts are small (O(live
turns)), so the position arrays can stream through the simulation
loop in bounded slices; only the per-group pandas materialization
forces the all-at-once footprint today. Documented as the known wall;
alpha <= 1.5 (the shipped configs) keeps the largest group under
~1.5% of n and the bound irrelevant.

Mock-producer surface (reference analog
/root/reference/tests/e2e/mock_data_producer.py:11-42), distributed.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from etl_spark.cdc_schema import SchemaOp
from etl_spark.gen.binlog import (
    BASE_EPOCH,
    ROLES,
    TOOLS,
    GenConfig,
    _text_pool,
    payload_templates,
)

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_PHI = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)

# draw-kind stream ids (any distinct constants)
K_CONV, K_OP, K_PICK, K_PATCH, K_BITS = 1, 2, 3, 4, 5
K_ROLE, K_TOOL, K_LANG, K_TEXT = 6, 7, 8, 9
K_DUP, K_DUPPOS, K_DIS = 10, 11, 12


def _h64(seed: int, kind: int, idx: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over (seed, kind, index):
    statistically independent 64-bit streams, sliceable at any offset
    — the property that makes the generation order-free."""
    with np.errstate(over="ignore"):
        z = (idx.astype(np.uint64) + np.uint64(1)) * _PHI
        z ^= np.uint64((seed * 0x9E3779B9 + kind) & 0xFFFFFFFFFFFFFFFF) * _PHI
        z = (z ^ (z >> np.uint64(30))) * _MIX1
        z = (z ^ (z >> np.uint64(27))) * _MIX2
        return z ^ (z >> np.uint64(31))


def _uniform(seed: int, kind: int, idx: np.ndarray) -> np.ndarray:
    """floats in [0, 1): top 53 bits of the hash."""
    return (_h64(seed, kind, idx) >> np.uint64(11)).astype(np.float64) / float(
        1 << 53
    )


def _ints(seed: int, kind: int, idx: np.ndarray, m: int) -> np.ndarray:
    return (_h64(seed, kind, idx) % np.uint64(m)).astype(np.int64)


def _zipf_cumweights(n_convs: int, alpha: float) -> np.ndarray:
    w = 1.0 / np.arange(1, n_convs + 1) ** alpha
    return np.cumsum(w / w.sum())


def _versions_for(lsns: np.ndarray, ops: list[SchemaOp]) -> np.ndarray:
    v = np.full(len(lsns), 1, dtype="int32")
    for op_ in sorted(ops, key=lambda o: o.lsn):
        v[lsns >= op_.lsn] = op_.version
    return v


def gen_binlog_spark(
    spark,
    cfg: GenConfig,
    base: pd.DataFrame,
    ops: list[SchemaOp],
    out_dir: str,
    routes: int = 0,
    group_buckets: int | None = None,
) -> list[str]:
    """Generate cfg.n_events change events over `base` as segment
    parquet files under `out_dir` (same layout as `write_segments`),
    distributed. Returns the sorted segment paths. `routes` > 0 tags
    each event with its conversation's entity (conv index mod routes),
    the multi-entity routed-log shape."""
    from pyspark.sql import functions as F

    n = int(cfg.n_events)
    seed = int(cfg.seed)
    seg_size = int(cfg.segment_size)
    n_segments = (n + seg_size - 1) // seg_size
    # simulation-stage width: enough groups to feed every core even
    # when the corpus has few segments (the WRITE stage is bounded by
    # n_segments regardless — size segments so n_segments >= cores
    # when generation throughput matters)
    G = int(
        group_buckets
        or min(
            512,
            max(32, n_segments, spark.sparkContext.defaultParallelism * 2),
        )
    )
    os.makedirs(out_dir, exist_ok=True)

    cumw = _zipf_cumweights(cfg.n_convs, cfg.zipf_alpha)
    bc_cumw = spark.sparkContext.broadcast(cumw)

    # ---- stage 1: position -> conversation (stateless Zipf pick)
    def assign(batches):
        for pdf in batches:
            pos = pdf["id"].to_numpy()
            u = _uniform(seed, K_CONV, pos)
            # clamp: the normalized weights' floating cumsum can land
            # a few ULPs below 1.0, and a draw above cumw[-1] would
            # index a phantom conversation outside the n_convs domain
            conv = np.minimum(
                np.searchsorted(bc_cumw.value, u, side="right"),
                len(bc_cumw.value) - 1,
            )
            yield pd.DataFrame(
                {"pos": pos, "conv": conv, "gb": conv % G}
            )

    positions = spark.range(
        0, n, numPartitions=max(G, int(spark.sparkContext.defaultParallelism))
    ).mapInPandas(assign, "pos long, conv long, gb long")

    # base live turns per conversation (turn order = insertion order,
    # matching the driver generator's initial live lists)
    conv_idx = base["conv_id"].str[5:].astype(np.int64)
    base_small = pd.DataFrame(
        {"conv": conv_idx, "turn": base["turn_idx"].astype(np.int64)}
    )
    base_small["gb"] = base_small["conv"] % G
    base_df = spark.createDataFrame(base_small)

    p_ins, p_cum = cfg.p_insert, cfg.p_insert + cfg.p_update
    patch_rate = float(cfg.patch_rate)

    # ---- stage 2: per-conversation live-set simulation (the ONLY
    # order-dependent state; one task handles conv % G == gb)
    def simulate(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if not len(left):
            return pd.DataFrame(
                {"pos": pd.Series(dtype="int64"),
                 "conv": pd.Series(dtype="int64"),
                 "op": pd.Series(dtype="object"),
                 "turn": pd.Series(dtype="int64")}
            )
        left = left.sort_values("pos")
        pos = left["pos"].to_numpy()
        conv_a = left["conv"].to_numpy()
        opd = _uniform(seed, K_OP, pos).tolist()
        pick = _uniform(seed, K_PICK, pos).tolist()
        patchd = _uniform(seed, K_PATCH, pos).tolist()
        live: dict[int, list[int]] = {}
        live_pos: dict[int, dict[int, int]] = {}
        next_turn: dict[int, int] = {}
        rs = right.sort_values(["conv", "turn"])
        for c, t in zip(rs["conv"].to_numpy(), rs["turn"].to_numpy()):
            c, t = int(c), int(t)
            lst = live.setdefault(c, [])
            live_pos.setdefault(c, {})[t] = len(lst)
            lst.append(t)
            next_turn[c] = t + 1
        ops_out: list[str] = []
        turns_out: list[int] = []
        conv_l = conv_a.tolist()
        for i in range(len(pos)):
            c = conv_l[i]
            lst = live.setdefault(c, [])
            r = opd[i]
            if not lst or r < p_ins:
                op, turn = "I", next_turn.get(c, 0)
                next_turn[c] = turn + 1
                live_pos.setdefault(c, {})[turn] = len(lst)
                lst.append(turn)
            elif r < p_cum:
                turn = lst[int(pick[i] * len(lst))]
                op = "P" if patch_rate and patchd[i] < patch_rate else "U"
            else:
                op = "D"
                turn = lst[int(pick[i] * len(lst))]
                pmap = live_pos[c]
                j = pmap.pop(turn)
                last = lst.pop()
                if last != turn:
                    lst[j] = last
                    pmap[last] = j
            ops_out.append(op)
            turns_out.append(turn)
        return pd.DataFrame(
            {"pos": pos, "conv": conv_a,
             "op": np.array(ops_out, dtype=object),
             "turn": np.array(turns_out, dtype="int64")}
        )

    simulated = (
        positions.groupBy("gb")
        .cogroup(base_df.groupBy("gb"))
        .applyInPandas(simulate, "pos long, conv long, op string, turn long")
    )

    # ---- stage 3: per-segment payload assembly + perturbation + write
    distinct_versions = sorted({1} | {o.version for o in ops})
    tmpl, names_json = payload_templates(ops, distinct_versions)
    pool = _text_pool(
        np.random.default_rng(seed + 3),
        min(max(64, n), 20000),
        messy=cfg.messy_text,
    )
    pool_json = [json.dumps(t) for t in pool]
    LANGS_J = [json.dumps(x) for x in ("en", "es", "zh")]
    ROLES_J = [json.dumps(x) for x in ROLES]
    TOOLS_J = [json.dumps(x) for x in TOOLS]
    bc_pool = spark.sparkContext.broadcast(pool_json)
    epoch0 = int((BASE_EPOCH - pd.Timestamp(0)).total_seconds())
    ops_sorted = sorted(ops, key=lambda o: o.lsn)
    dup_rate = float(cfg.dup_rate)
    dis_w = int(cfg.disorder_window)
    # emit-clock offset per segment is closed-form: every full segment
    # emits seg_size + int(dup_rate * seg_size) rows
    full_extra = int(dup_rate * seg_size)

    def emit_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.parquet as pq

        pdf = pdf.sort_values("pos")
        pos = pdf["pos"].to_numpy()
        seg_id = int(pos[0] // seg_size)
        m_seg = len(pos)
        lsn = pos + 1
        versions = _versions_for(lsn, ops_sorted)
        role_i = _ints(seed, K_ROLE, pos, 3).tolist()
        tool_i = _ints(seed, K_TOOL, pos, len(TOOLS)).tolist()
        lang_i = _ints(seed, K_LANG, pos, 3).tolist()
        text_i = _ints(seed, K_TEXT, pos, len(bc_pool.value)).tolist()
        bits_l = _ints(seed, K_BITS, pos, (1 << 16) - 1).tolist()
        pjson = bc_pool.value
        ops_l = pdf["op"].tolist()
        ver_l = versions.tolist()
        ts_num = (epoch0 + 10_000 + lsn).astype(str).tolist()
        ts_iso = None
        if any(
            k == "ts_iso" for v in set(ver_l) for _, k in tmpl[v]
        ):
            iso = (
                BASE_EPOCH + pd.to_timedelta(10_000 + lsn, unit="s")
            ).strftime("%Y-%m-%d %H:%M:%S")
            ts_iso = ['"' + s + '"' for s in iso]
        payloads: list = []
        for i in range(m_seg):
            if ops_l[i] == "D":
                payloads.append(None)
                continue
            parts = tmpl[ver_l[i]]
            segs = []
            for prefix, kind in parts:
                if kind == "text":
                    segs.append(prefix + pjson[text_i[i]])
                elif kind == "role":
                    segs.append(prefix + ROLES_J[role_i[i]])
                elif kind == "tool":
                    segs.append(
                        prefix
                        + (TOOLS_J[tool_i[i]] if role_i[i] == 2 else "null")
                    )
                elif kind == "ts_num":
                    segs.append(prefix + ts_num[i])
                elif kind == "ts_iso":
                    segs.append(prefix + ts_iso[i])
                elif kind == "lang":
                    segs.append(prefix + LANGS_J[lang_i[i]])
                else:
                    segs.append(prefix + "null")
            if ops_l[i] == "P":
                bits = bits_l[i] + 1  # [1, 2^16): never the empty mask
                keep = [k for k in range(len(parts)) if bits >> k & 1]
                if not keep:
                    keep = [bits % len(parts)]
                nj = names_json[ver_l[i]]
                segs = [segs[k] for k in keep] + [
                    '"_changed": [' + ", ".join(nj[k] for k in keep) + "]"
                ]
            payloads.append("{" + ", ".join(segs) + "}")

        # ---- in-segment perturbation (same scheme as gen_binlog):
        # dup re-emits at later positions via one keyed sort, then
        # bounded-window disorder — all draws stateless on (seg, i)
        n_dup = int(dup_rate * m_seg)
        if n_dup:
            kidx = np.arange(m_seg, dtype=np.int64) + seg_id * seg_size
            ranks = np.argsort(_h64(seed, K_DUP, kidx), kind="stable")[:n_dup]
            extra_idx, extra_keys = [], []
            for rank, i in enumerate(sorted(int(x) for x in ranks)):
                u = _uniform(
                    seed, K_DUPPOS, np.array([seg_id * seg_size + i])
                )[0]
                p = i + int(u * (m_seg - i))
                extra_idx.append(i)
                extra_keys.append(p + 0.5 + 1e-9 * rank)
            keys = np.concatenate(
                [np.arange(m_seg, dtype=float), np.array(extra_keys)]
            )
            local = np.concatenate(
                [np.arange(m_seg), np.array(extra_idx, dtype=int)]
            )
            local = local[np.argsort(keys, kind="stable")]
        else:
            local = np.arange(m_seg)
        if dis_w > 1:
            kidx2 = np.arange(len(local), dtype=np.int64) + seg_id * seg_size
            keys2 = np.arange(len(local)) + _uniform(seed, K_DIS, kidx2) * dis_w
            local = local[np.argsort(keys2, kind="stable")]

        emit0 = seg_id * (seg_size + full_extra)
        conv_a = pdf["conv"].to_numpy()[local]
        out = {
            "lsn": lsn[local].astype("int64"),
            "op": np.array(ops_l, dtype=object)[local],
            "conv_id": np.array(
                [f"conv-{c:08d}" for c in conv_a], dtype=object
            ),
            "turn_idx": pdf["turn"].to_numpy()[local].astype("int32"),
            "op_ts": BASE_EPOCH
            + pd.to_timedelta(emit0 + np.arange(len(local)), unit="s"),
            "schema_version": versions[local],
            "payload": np.array(payloads, dtype=object)[local],
        }
        if routes:
            out["entity"] = np.array(
                ["e" + str(int(c) % routes) for c in conv_a], dtype=object
            )
        seg = pd.DataFrame(out)
        path = os.path.join(out_dir, f"binlog-{seg_id:06d}.parquet")
        tmp = path + ".tmp"
        tbl = pa.Table.from_pandas(seg, preserve_index=False)
        pq.write_table(
            tbl, tmp, coerce_timestamps="us",
            allow_truncated_timestamps=True, row_group_size=20_000,
            compression="zstd", compression_level=3,
        )
        os.replace(tmp, path)
        return pd.DataFrame({"seg": [seg_id], "rows": [len(seg)]})

    summary = (
        simulated.withColumn("seg", F.floor(F.col("pos") / F.lit(seg_size)))
        .groupBy("seg")
        .applyInPandas(
            lambda pdf: emit_segment(pdf.drop(columns=["seg"])),
            "seg long, rows long",
        )
        .collect()
    )
    bc_cumw.destroy()
    bc_pool.destroy()
    assert len(summary) == n_segments, (len(summary), n_segments)
    return sorted(
        os.path.join(out_dir, f"binlog-{r['seg']:06d}.parquet")
        for r in summary
    )
