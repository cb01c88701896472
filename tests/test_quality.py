"""Data-quality constraint engine on crafted frames."""

from __future__ import annotations

import pytest

from redshift_avro_spark.operators.quality import (
    ForeignKeyConstraint,
    RowConstraint,
    UniqueConstraint,
    validate,
)


def test_validate_counts_each_violation_kind(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (2, 200, "b"), (2, 5, None), (3, -1, "c")],
        "k long, v long, s string",
    )
    ref = spark.createDataFrame([(1,), (2,)], "rk long")
    report = validate(
        df,
        [
            RowConstraint("v_in_range", "v BETWEEN 0 AND 100"),
            RowConstraint("s_not_null", "s IS NOT NULL"),
            UniqueConstraint("k_unique", ("k",)),
            ForeignKeyConstraint("k_in_ref", ("k",), ref, ("rk",)),
        ],
    )
    rows = {r.expr: (r.kind, r.n_rows, r.n_violations, r.passed) for r in report.collect()}
    assert rows["v_in_range"] == ("row", 4, 2, 0)     # 200 and -1
    assert rows["s_not_null"] == ("row", 4, 1, 0)
    assert rows["k_unique"] == ("unique", 4, 2, 0)    # both k=2 rows count
    assert rows["k_in_ref"] == ("fk", 4, 1, 0)        # k=3 missing
    # constraint order preserved
    assert [r.constraint_id for r in report.collect()] == [0, 1, 2, 3]


def test_validate_all_pass_and_null_predicate_is_violation(spark):
    df = spark.createDataFrame([(1, None)], "k long, v long")
    report = validate(df, [RowConstraint("v_pos", "v > 0")])
    r = report.collect()[0]
    assert (r.n_violations, r.passed) == (1, 0)  # NULL predicate counts

    ok = validate(df, [RowConstraint("k_pos", "k > 0")]).collect()[0]
    assert (ok.n_violations, ok.passed) == (0, 1)


def test_validate_rejects_bad_input(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="no constraints"):
        validate(df, [])
    with pytest.raises(ValueError, match="unknown constraint"):
        validate(df, ["not-a-constraint"])


def test_fk_null_keys_are_exempt(spark):
    df = spark.createDataFrame([(1,), (None,), (9,)], "k long")
    ref = spark.createDataFrame([(1,)], "rk long")
    r = validate(df, [ForeignKeyConstraint("k_in_ref", ("k",), ref, ("rk",))]).collect()[0]
    # only k=9 violates; the NULL key is exempt per standard FK semantics
    assert (r.n_rows, r.n_violations, r.passed) == (3, 1, 0)
