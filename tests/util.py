from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def assert_frames_equal(engine_df: DataFrame, oracle: pd.DataFrame) -> None:
    """Full-frame equality on (conv_id, turn_idx)-sorted rows with
    exact per-turn text equality (the input_hint invariant)."""
    got = (
        engine_df.toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = oracle.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), f"row count {len(got)} != {len(exp)}"
    for col in exp.columns:
        g, e = got[col], exp[col]
        if pd.api.types.is_datetime64_any_dtype(e):
            g = pd.to_datetime(g)
            e = pd.to_datetime(e)
        elif pd.api.types.is_float_dtype(e):
            pd.testing.assert_series_equal(
                g.astype("float64"), e.astype("float64"), check_names=False
            )
            continue
        elif pd.api.types.is_integer_dtype(e):
            g = g.astype("Int64")
            e = e.astype("Int64")
        mism = (g.isna() != e.isna()) | ((g == e) == False) & ~(g.isna() & e.isna())  # noqa: E712
        bad = mism & ~(g.isna() & e.isna())
        if bad.any():
            i = bad.idxmax()
            raise AssertionError(
                f"column {col} mismatch at row {i}: engine={g[i]!r} oracle={e[i]!r}\n"
                f"key={got.loc[i, ['conv_id', 'turn_idx']].tolist()}"
            )
