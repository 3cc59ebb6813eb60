"""Sequential replay oracle — the semantic reference for correctness.

Plain-Python dict replay of the binlog in LSN order (generalizing the
reference's golden-record verifier, /root/reference/tests/e2e/
data_verifier.py:55-158, to full-table state): last LSN wins, deletes
remove keys, duplicate (key, lsn) re-emits are no-ops, schema ops are
applied in place at their LSN position. The engine's distributed
replay must reproduce this exactly — full-frame equality on rows
sorted by (conv_id, turn_idx), exact per-turn `text` equality
(BASELINE.json input_hint invariant).
"""

from __future__ import annotations

import json

import pandas as pd

from etl_spark.cdc_schema import BASE_VERSION, SchemaOp, fields_at_version
from etl_spark.engine.normalize import normalize_text_py


def replay_oracle(
    base: pd.DataFrame, binlog: pd.DataFrame, ops: list[SchemaOp]
) -> pd.DataFrame:
    """Expected final table state after replaying `binlog` over `base`."""
    state: dict[tuple, dict] = {}
    for r in base.to_dict("records"):
        key = (r["conv_id"], int(r["turn_idx"]))
        state[key] = {k: v for k, v in r.items() if k not in ("conv_id", "turn_idx")}

    pending = sorted(ops, key=lambda o: o.lsn)
    applied = 0

    def apply_ops_up_to(lsn: int) -> None:
        nonlocal applied
        while applied < len(pending) and pending[applied].lsn <= lsn:
            op = pending[applied]
            if op.kind == "add_column":
                for row in state.values():
                    row[op.col] = None
            elif op.kind == "rename_column":
                for row in state.values():
                    row[op.new_name] = row.pop(op.col)
            elif op.kind == "widen_type":
                if op.new_type == "timestamp":
                    for row in state.values():
                        v = row.get(op.col)
                        if v is not None and not isinstance(v, pd.Timestamp):
                            row[op.col] = pd.Timestamp(int(v), unit="s")
            applied += 1

    # unique LSNs in increasing order; duplicates collapse
    events = (
        binlog.sort_values("lsn").drop_duplicates(subset=["lsn"]).to_dict("records")
    )
    for e in events:
        apply_ops_up_to(int(e["lsn"]))
        key = (e["conv_id"], int(e["turn_idx"]))
        if e["op"] == "D":
            state.pop(key, None)
            continue
        doc = json.loads(e["payload"])
        changed = doc.pop("_changed", None)
        if "text" in doc and doc["text"] is not None:
            doc["text"] = normalize_text_py(doc["text"])
        # post-widen ISO ts string -> Timestamp
        final_fields = {f.name: f for f in fields_at_version(ops, BASE_VERSION + applied)}
        for name, f in final_fields.items():
            if f.type == "timestamp" and isinstance(doc.get(name), str):
                doc[name] = pd.Timestamp(doc[name])
        if e["op"] == "P":
            # partial image: patch only the carried fields onto the
            # live row (the generator never patches a dead key)
            row = state.setdefault(key, {})
            for k in changed or doc.keys():
                row[k] = doc.get(k)
        else:
            state[key] = doc
    apply_ops_up_to(1 << 62)

    final_names = [f.name for f in fields_at_version(ops, BASE_VERSION + len(pending))]
    rows = []
    for (conv, turn), payload in state.items():
        row = {"conv_id": conv, "turn_idx": turn}
        for n in final_names:
            if n not in ("conv_id", "turn_idx"):
                row[n] = payload.get(n)
        rows.append(row)
    out = pd.DataFrame(rows, columns=final_names)
    out = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    out["turn_idx"] = out["turn_idx"].astype("int32")
    return out
