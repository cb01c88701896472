"""Local replica of the driver's correctness gate at sf0.01.

Runs the DECLARED surface (``__spark_entry__.queries()`` — the gated
≤50 entries) against the DuckDB oracles at the driver's scale factor
and prints a CORRECTNESS-style JSON. Use before every round close to
predict the driver's CORRECTNESS_r{N}.json.

Usage::

    python tools/gate_replica.py [query ...]   # default: whole gated surface
"""

from __future__ import annotations

import datetime
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from redshift_avro_spark.queries import ALL_TABLES, gated_names, load_all  # noqa: E402
from redshift_avro_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return repr(v)


def _norm_df(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return cols, sorted(rows)


def run(names: list[str] | None = None) -> dict:
    """Run the replica over ``names`` (default: the gated surface) and
    return {name: row}. Callable in-process (tools/soak.py) — stops
    the SparkSession it creates."""
    registry = load_all()
    names = names or gated_names()
    spark = get_spark(app_name="gate-replica")
    spark.sparkContext.setLogLevel("ERROR")
    # bounded oracle connection (defaults are 80%-of-RAM / 32 threads;
    # see tests/test_queries_oracle.py:_duck for the round-7
    # exhaustion). 32 GiB: the ONE shared replica connection must fit
    # the heaviest composite oracle — q93 embeds q115's recursive
    # power-iteration CTE, which OOMs under 8 GiB at sf0.01.
    con = duckdb.connect(config={"memory_limit": "32GB", "threads": 8})
    for t in ALL_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    out = {}
    for name in names:
        spec = registry[name]
        row = {"rows_match": None, "schema_match": None, "hash_match": None, "err": None}
        try:
            spark_pdf = spec.fn(spark, SF_DIR).toPandas()
            row["spark_rows"] = len(spark_pdf)
            if spec.oracle:
                duck_pdf = con.sql(spec.oracle).df()
                row["oracle_rows"] = len(duck_pdf)
                s_cols, s_rows = _norm_df(spark_pdf)
                d_cols, d_rows = _norm_df(duck_pdf)
                row["rows_match"] = len(s_rows) == len(d_rows)
                row["schema_match"] = s_cols == d_cols
                row["hash_match"] = s_rows == d_rows
            else:
                row["rows_match"] = row["schema_match"] = row["hash_match"] = None
        except Exception as e:  # noqa: BLE001
            row["err"] = f"{type(e).__name__}: {e}"[:500]
        out[name] = row
        ok = row["hash_match"] if row["err"] is None else "ERR"
        print(f"  {name}: {ok}", file=sys.stderr)

    spark.stop()
    return out


def main() -> None:
    out = run(sys.argv[1:] or None)
    bad = {k: v for k, v in out.items() if v["err"] or v["hash_match"] is False}
    print(json.dumps({"n": len(out), "bad": bad or None}, indent=1))


if __name__ == "__main__":
    main()
