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


def test_asof_join_validation(spark):
    import pytest

    left = spark.createDataFrame(pd.DataFrame({"k": [1], "ts": [10], "lid": [0]}))
    right = spark.createDataFrame(pd.DataFrame({"k": [1], "ts": [5], "rv": [100]}))
    with pytest.raises(ValueError, match="value_cols must name at least one"):
        asof_join(left, right, on=["k"], ts_col="ts", value_cols=[])
    bad = left.withColumnRenamed("lid", "__side")
    with pytest.raises(ValueError, match="reserved working column"):
        asof_join(bad, right, on=["k"], ts_col="ts", value_cols=["rv"])
    with pytest.raises(ValueError, match="not in right side"):
        asof_join(left, right, on=["k"], ts_col="ts", value_cols=["nope"])
    with pytest.raises(ValueError, match="must exist on both sides"):
        asof_join(left, right.withColumnRenamed("k", "kk"), on=["k"], ts_col="ts", value_cols=["rv"])


def test_asof_join_salted_matches_unsalted_hot_key(spark):
    """Pathological skew: ONE key owns 95% of both sides. The salted
    two-level plan (8-tick time slices -> parallel windows + carried
    cross-slice state) must return exactly the unsalted answer,
    including slices with no right rows at all (carry from earlier
    slices) and left rows before every right row (null match)."""
    rng = np.random.default_rng(41)
    n_l, n_r = 400, 150
    hot = rng.random(n_l) < 0.95
    left_pd = pd.DataFrame(
        {
            "k": np.where(hot, 0, rng.integers(1, 5, n_l)),
            "ts": rng.integers(0, 200, n_l).astype("int64"),
            "lid": np.arange(n_l, dtype="int64"),
        }
    )
    # right rows clustered into the early timeline so many later slices
    # have no right rows and must rely on the carry
    right_pd = pd.DataFrame(
        {
            "k": np.where(rng.random(n_r) < 0.95, 0, rng.integers(1, 5, n_r)),
            "ts": rng.integers(0, 90, n_r).astype("int64"),
            "rv": np.arange(100, 100 + n_r, dtype="int64"),
        }
    )
    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)
    plain = (
        asof_join(left, right, on=["k"], ts_col="ts", value_cols=["rv"])
        .toPandas().sort_values("lid").reset_index(drop=True)
    )
    salted = (
        asof_join(left, right, on=["k"], ts_col="ts", value_cols=["rv"], salt_interval_s=8)
        .toPandas().sort_values("lid").reset_index(drop=True)
    )
    for col in ("ts_asof", "rv_asof"):
        g = salted[col].astype("float64").fillna(-1)
        w = plain[col].astype("float64").fillna(-1)
        assert (g != w).sum() == 0, col
    # and both must match the independent pandas reference
    want = _reference(left_pd, right_pd).sort_values("lid").reset_index(drop=True)
    for col in ("ts_asof", "rv_asof"):
        g = salted[col].astype("float64").fillna(-1)
        w = want[col].astype("float64").fillna(-1)
        assert (g != w).sum() == 0, col
