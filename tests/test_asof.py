"""As-of join: randomized equivalence against pandas merge_asof.

q73's oracle checks against DuckDB's native ASOF JOIN on the real
events table; this file cross-checks the operator against a SECOND
independent implementation (pandas.merge_asof, backward direction,
exact matches allowed) on seeded random inputs that force the edge
cases real data may not hit: equal-ts ties between the sides, keys
with no right rows at all, left rows before every right row, and
duplicate (key, ts) right rows resolved by the deterministic max-
tiebreak dedup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from redshift_avro_spark.operators.asof import asof_join


def _random_case(seed: int, n_left: int = 120, n_right: int = 80):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n_left),
            "ts": rng.integers(0, 50, n_left).astype("int64"),
            "lid": np.arange(n_left, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 10, n_right),  # some keys never appear on the left
            "ts": rng.integers(0, 50, n_right).astype("int64"),
            "rv": np.arange(100, 100 + n_right, dtype="int64"),
        }
    )
    return left, right


def _reference(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    # mirror the operator's dedup: one right row per (k, ts), max rv wins
    r = (
        right.sort_values(["k", "ts", "rv"])
        .groupby(["k", "ts"], as_index=False)
        .last()
    )
    out = pd.merge_asof(
        left.sort_values(["ts", "lid"]),
        r.sort_values("ts").rename(columns={"ts": "ts_asof"}),
        left_on="ts",
        right_on="ts_asof",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    )
    return out.rename(columns={"rv": "rv_asof"})[["k", "ts", "lid", "ts_asof", "rv_asof"]]


def test_asof_join_matches_merge_asof(spark):
    for seed in (7, 23, 91):
        left_pd, right_pd = _random_case(seed)
        left = spark.createDataFrame(left_pd)
        right = spark.createDataFrame(right_pd)
        got = (
            asof_join(left, right, on=["k"], ts_col="ts", value_cols=["rv"])
            .toPandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        want = _reference(left_pd, right_pd).sort_values("lid").reset_index(drop=True)
        for col_got, col_want in (("ts_asof", "ts_asof"), ("rv_asof", "rv_asof")):
            g = got[col_got].astype("float64")  # NaN-safe compare for misses
            w = want[col_want].astype("float64")
            mism = (g.fillna(-1) != w.fillna(-1)).sum()
            assert mism == 0, f"seed {seed}: {mism} mismatches in {col_got}"


def test_asof_join_no_right_rows_for_key(spark):
    left = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "ts": [10, 20], "lid": [0, 1]}))
    right = spark.createDataFrame(pd.DataFrame({"k": [1], "ts": [5], "rv": [100]}))
    got = {
        r.lid: (r.ts_asof, r.rv_asof)
        for r in asof_join(left, right, on=["k"], ts_col="ts", value_cols=["rv"]).collect()
    }
    assert got[0] == (5, 100)
    assert got[1] == (None, None)
