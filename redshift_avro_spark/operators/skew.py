"""Skew-resilient join helpers.

First choice at runtime is AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py) — it
handles skew it can SEE. Salting is for the cases AQE can't fix: a
single hot key whose matching build side is too big to broadcast, or
sinks that require a deterministic pre-partitioning. The trade is
explicit: the probe side gets a per-row salt, the build side is
replicated ``n_salts``× — so the hot key's rows spread over
``n_salts`` tasks at the cost of a build-side blowup that must stay
small relative to the probe side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the probe side salted and the build side
    replicated across every salt value.

    Result is identical to ``probe.join(build, probe[probe_key] ==
    build[build_key], how)``; only the shuffle distribution changes:
    a key holding 50% of the probe rows lands on ``n_salts`` reducers
    instead of one. The salt derives from xxhash64 over the whole probe
    row (deterministic, no rand())."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(n_salts))
    salted_probe = probe.withColumn("__salt", salt.cast("int"))
    salted_build = build.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = salted_probe.join(
        salted_build,
        (salted_probe[probe_key] == salted_build[build_key])
        & (salted_probe["__salt"] == salted_build["__salt"]),
        how,
    )
    return joined.drop("__salt")
