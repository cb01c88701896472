"""Distributed linear algebra — PCA top component by power iteration.

Dimensionality reduction is a standard pass over a 100 TB embedding
store (compression, visualization, whitening before ANN). The heavy,
data-sized step — accumulating the d×d second-moment matrix — is a
single exploded uniform-key aggregation here; the d×d eigen-solve
itself is tiny and stays declarative as a fixed number of power-
iteration rounds over the (i, j, c) covariance DataFrame, so a DuckDB
oracle can replay it as unrolled CTEs (the q45-Lloyd / q102-PageRank
pattern).

Determinism contract: every sum that Spark may partially aggregate in
arbitrary order is a DECIMAL(30,15) sum of per-term casts (exact,
associative — the registry-wide rule); everything else is one fixed
tree of IEEE double mult/div/sqrt (sqrt is correctly-rounded by IEEE
754, unlike ln/exp, so it is engine-stable). Floats widen to double
exactly. No randomness: the start vector is the constant 1/√d.

100 TB story: the moment matrix is ONE explode(d²)-and-aggregate pass
over the corpus (map-side combine collapses it to d² rows per task;
d² = 4096 here), the mean is a d-row aggregate of the same shape, and
the iteration then runs on broadcast-size state (d² rows) regardless
of corpus size. The final projection is one broadcast join back over
the corpus — no corpus-wide shuffle anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pca_power_projection"]

_DEC = "DECIMAL(30,15)"


def pca_power_projection(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    iterations: int = 8,
) -> DataFrame:
    """Project every vector onto the top principal component.

    Returns ``(id, pc1)`` with pc1 = (x − μ)·v rounded to 6 places,
    where v is the unit eigenvector estimate after ``iterations``
    rounds of v ← C v / ‖C v‖ from the constant start vector 1/√d,
    and C is the centered covariance  C_ij = E[x_i x_j] − μ_i μ_j.

    The caller passes ``dim`` explicitly (embeddings schemas carry no
    length); rows whose array length differs are the caller's bug and
    surface as nulls in element_at.
    """
    if iterations < 1:
        raise ValueError(f"pca_power_projection: iterations must be >= 1, got {iterations}")
    if dim < 1:
        raise ValueError(f"pca_power_projection: dim must be >= 1, got {dim}")
    for c in (id_col, vec_col):
        if c not in embeddings.columns:
            raise ValueError(f"pca_power_projection: column {c!r} not in embeddings")

    e = embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("x"))
    n = e.agg(F.count("*").cast("long").alias("n"))

    # (i, x_i, x) exploded once; the second index explodes off the
    # carried array so the corpus is read a single time
    xi = e.select(
        F.explode(F.expr(f"sequence(0, {dim - 1})")).alias("i"),
        F.col("x"),
    ).select("i", F.expr("CAST(element_at(x, i + 1) AS DOUBLE)").alias("xi"), "x")

    moments = (
        xi.select(
            "i",
            F.explode(F.expr(f"sequence(0, {dim - 1})")).alias("j"),
            F.col("xi"),
            F.col("x"),
        )
        .select(
            "i",
            "j",
            F.expr(f"CAST(xi * CAST(element_at(x, j + 1) AS DOUBLE) AS {_DEC})").alias("p"),
        )
        .groupBy("i", "j")
        .agg(F.sum("p").alias("sxx"))
    )
    mu = (
        xi.select("i", F.expr(f"CAST(xi AS {_DEC})").alias("xd"))
        .groupBy("i")
        .agg(F.sum("xd").alias("sx"))
        .crossJoin(F.broadcast(n))
        .select("i", F.expr("CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)").alias("mu"))
    )
    cov = (
        moments.crossJoin(F.broadcast(n))
        .join(F.broadcast(mu.select(F.col("i"), F.col("mu").alias("mu_i"))), "i")
        .join(
            F.broadcast(mu.select(F.col("i").alias("j"), F.col("mu").alias("mu_j"))), "j"
        )
        .select(
            "i",
            "j",
            F.expr("CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) - mu_i * mu_j").alias("c"),
        )
        .localCheckpoint()
    )

    v = cov.select("i").distinct().select(
        "i", F.lit(1.0 / float(dim) ** 0.5).alias("v")
    )
    for _ in range(iterations):
        w = (
            cov.join(F.broadcast(v.select(F.col("i").alias("j"), "v")), "j")
            .select("i", F.expr(f"CAST(c * v AS {_DEC})").alias("t"))
            .groupBy("i")
            .agg(F.expr("CAST(SUM(t) AS DOUBLE)").alias("w"))
        )
        nrm = w.agg(
            F.expr(f"sqrt(CAST(SUM(CAST(w * w AS {_DEC})) AS DOUBLE))").alias("nrm")
        )
        v = w.crossJoin(F.broadcast(nrm)).select("i", F.expr("w / nrm").alias("v"))
        # d rows — eager checkpoint keeps the per-round plan flat, the
        # q63/q102 iterative pattern
        v = v.localCheckpoint()

    proj = (
        e.select("vid", F.explode(F.expr(f"sequence(0, {dim - 1})")).alias("i"), "x")
        .join(F.broadcast(mu), "i")
        .join(F.broadcast(v), "i")
        .select(
            "vid",
            F.expr(
                f"CAST((CAST(element_at(x, i + 1) AS DOUBLE) - mu) * v AS {_DEC})"
            ).alias("t"),
        )
        .groupBy("vid")
        .agg(F.expr("ROUND(CAST(SUM(t) AS DOUBLE), 6)").alias("pc1"))
    )
    return proj.select(F.col("vid").alias(id_col), "pc1")
