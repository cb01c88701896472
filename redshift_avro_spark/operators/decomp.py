"""Distributed linear algebra — PCA top component by power iteration.

Dimensionality reduction is a standard pass over a 100 TB embedding
store (compression, visualization, whitening before ANN). The heavy,
data-sized step — accumulating the d×d second-moment matrix — is ONE
Arrow-batched ``mapInPandas`` pass emitting per-batch int64 outer-
product partials (a numpy ``Yᵀ @ Y`` matmul per batch), merged by a
single exact DECIMAL aggregation; the d×d eigen-solve itself is tiny
and stays declarative as a fixed number of power-iteration rounds
over the (i, j, c) covariance DataFrame, so a DuckDB oracle can
replay it as unrolled CTEs (the q45-Lloyd / q102-PageRank pattern).

Determinism contract: elements quantize ONCE to integers ``y =
floor(double(x) · 10⁷ + 0.5)`` — one IEEE multiply, add and floor,
bit-identical in numpy, Spark SQL and DuckDB — so every data-sized
sum is integer arithmetic (exact, associative, partition-order-free):
int64 partials per batch, DECIMAL(38,0) merge. Downstream sums whose
accumulation order Spark may choose remain DECIMAL(30,15) casts of
per-term doubles (the registry-wide rule); everything else is one
fixed tree of IEEE double mult/div/sqrt (sqrt is correctly-rounded by
IEEE 754, unlike ln/exp, so it is engine-stable). No randomness: the
start vector is the constant 1/√d. The 10⁷ quantization discards
nothing material from float32-origin embeddings of unit scale (~7
significant digits) and buys a ~5× cheaper moment pass than the
previous exploded per-term DECIMAL aggregation (VERDICT r3 #3).

100 TB story: the moment matrix is ONE narrow corpus pass — each
Arrow batch contributes a d×d int64 partial (d² = 4096 values), so
only O(batches · d²) tiny rows ever shuffle; the per-batch row-slice
guard keeps every partial under int64 range for any element scale.
The iteration then runs on broadcast-size state (d² rows) regardless
of corpus size. The final projection is one broadcast join back over
the corpus — no corpus-wide shuffle anywhere.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pca_power_projection"]

_DEC = "DECIMAL(30,15)"
_SCALE = 1e7  # element quantization: y = floor(x * 1e7 + 0.5)


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
    fail loudly in the moment pass.
    """
    if iterations < 1:
        raise ValueError(f"pca_power_projection: iterations must be >= 1, got {iterations}")
    if dim < 1:
        raise ValueError(f"pca_power_projection: dim must be >= 1, got {dim}")
    for c in (id_col, vec_col):
        if c not in embeddings.columns:
            raise ValueError(f"pca_power_projection: column {c!r} not in embeddings")

    e = embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("x"))

    def moment_partials(batches: "Iterator") -> "Iterator":
        """Per-batch integer outer-product partials: (i, j, p) rows for
        the quantized second-moment matrix, plus (i, -1, p) rows for
        the element sums — all int64-exact by the row-slice guard."""
        import numpy as np
        import pandas as pd

        ii = np.repeat(np.arange(dim), dim)
        jj = np.tile(np.arange(dim), dim)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = [np.asarray(a, dtype=np.float64) for a in pdf["x"]]
            bad = [k for k, r in enumerate(rows) if r.ndim != 1 or len(r) != dim]
            if bad:
                raise ValueError(
                    f"pca_power_projection: row {bad[0]} has embedding length "
                    f"{len(rows[bad[0]])}, expected {dim}"
                )
            y = np.floor(np.stack(rows) * _SCALE + 0.5).astype(np.int64)
            # slice so each partial stays inside int64: rows_per_slice
            # * max|y|^2 < 2^63 with headroom
            ymax = max(1, int(np.abs(y).max()))
            step = max(1, int(4e18 // (ymax * ymax)))
            for lo in range(0, len(y), step):
                ys = y[lo:lo + step]
                xx = (ys.T @ ys).ravel()
                xs = ys.sum(axis=0)
                yield pd.DataFrame(
                    {
                        "i": np.concatenate([ii, np.arange(dim), [-1]]),
                        "j": np.concatenate([jj, np.full(dim, -1), [-1]]),
                        "p": np.concatenate([xx, xs, [len(ys)]]),
                    }
                )

    partials = e.select("x").mapInPandas(moment_partials, "i int, j int, p long")
    # exact merge of integer partials; DECIMAL(38,0) so the corpus-wide
    # total can exceed int64 at scale. The merged matrix is d² + d + 1
    # rows — broadcast-sized state, so it collects in ONE action and the
    # 8 power-iteration rounds run in-process with the IDENTICAL decimal
    # arithmetic the round-4 DataFrame loop ran (each round there was a
    # join + agg + checkpoint job over ≤ d² rows: pure scheduling
    # overhead at any corpus size — the data-sized work is only the
    # moment pass above and the projection below).
    rows = (
        partials.groupBy("i", "j")
        .agg(F.expr("SUM(CAST(p AS DECIMAL(38,0)))").alias("s"))
        .collect()
    )
    from decimal import ROUND_HALF_UP, Decimal

    q15 = Decimal(1).scaleb(-15)

    def _dec(x: float) -> Decimal:
        # CAST(double AS DECIMAL(30,15)) — Spark routes the cast through
        # Double.toString (the SHORTEST decimal repr), then HALF_UP at
        # 15 dp. repr(x) is the same shortest repr, so quantizing it is
        # the JVM cast bit-for-bit; quantizing Decimal(x) (the EXACT
        # binary value) differs when the shortest repr lands exactly on
        # the half boundary at dp 15 (test_decimal_cast_boundaries pins
        # the equivalence on such values). DuckDB's cast scales in
        # double arithmetic and may differ on those razor-edge values —
        # the oracle gates equality on real data, not the edge.
        return Decimal(repr(x)).quantize(q15, rounding=ROUND_HALF_UP)

    n_rows = 0
    sx = [0] * dim
    sxx = [[0] * dim for _ in range(dim)]
    for r in rows:
        i, j, s = int(r["i"]), int(r["j"]), int(r["s"])
        if i == -1:
            n_rows = s
        elif j == -1:
            sx[i] = s
        else:
            sxx[i][j] = s
    if n_rows == 0:
        raise ValueError("pca_power_projection: empty input")
    nd = float(n_rows)
    # same expression order as the SQL the oracle mirrors:
    # (CAST(sx AS DOUBLE)/1e7)/n and (CAST(sxx AS DOUBLE)/1e14)/n − μμ
    mu = [(float(sx[i]) / 1e7) / nd for i in range(dim)]
    cov = [
        [(float(sxx[i][j]) / 1e14) / nd - mu[i] * mu[j] for j in range(dim)]
        for i in range(dim)
    ]
    v = [1.0 / float(dim) ** 0.5] * dim
    import math

    for _ in range(iterations):
        # w_i = CAST(SUM(CAST(c*v AS DEC)) AS DOUBLE): decimal sums are
        # exact and associative, so driver order ≡ any shuffle order
        w = [float(sum(_dec(cov[i][j] * v[j]) for j in range(dim))) for i in range(dim)]
        nrm = math.sqrt(float(sum(_dec(wi * wi) for wi in w)))
        v = [wi / nrm for wi in w]

    mu_t = tuple(mu)
    v_t = tuple(v)

    @F.pandas_udf("double")
    def _pc1(xs: "pd.Series") -> "pd.Series":  # noqa: F821
        import pandas as pd

        out = []
        for a in xs:
            acc = Decimal(0)
            for d_i in range(dim):
                acc += _dec((float(a[d_i]) - mu_t[d_i]) * v_t[d_i])
            out.append(float(acc))
        return pd.Series(out)

    # ROUND stays in Spark so the last rounding step is the engine's own
    return e.select(
        F.col("vid").alias(id_col), F.round(_pc1(F.col("x")), 6).alias("pc1")
    )
