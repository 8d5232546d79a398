"""Grid period search (folded sinusoid fit) as a native aggregation — the
spin/period dimension of the reference's SSOFT surface.

The reference's SHG1G2/SOCCA phase-curve models add a spin axis to the
HG1G2 fit and scan candidate orientations per object
(ztf/ssoft/processor.py:436-671 `estimate_sso_params` with
``model='SHG1G2'``); CATS likewise carries a 'Periodic' broad class
(rubin/cats/processor.py:41-169). Both reduce to the same engine shape:
*for each candidate in a small frozen grid, solve a linear least-squares
subproblem, then keep the argmin-residual candidate per object*.

Spark-first rendition: for each candidate period P in a literal grid,

    y(t) ≈ c + a·sin(2πt/P) + b·cos(2πt/P)

is linear in (a, b, c), so per (group, P) the fit needs only ten
sufficient statistics — Σ over products of {sin, cos, 1, y} pairs plus
Σy² for the residual. The candidate axis is generated with ``posexplode``
of a literal array (a per-row ×G fan-out, NO join), the statistics are
ONE map-combinable hash aggregation keyed (group, candidate), and the
argmin is a window over the tiny per-group candidate table. Total: one
shuffle of O(groups × G) int64 rows, whole-stage codegen end to end —
the reference's per-object scipy minimize loop becomes a hash agg.

Determinism contract (shared with operators/phase_curve): inputs are
quantized to int64 before summation, so the sums are exactly associative
and the downstream double algebra (Cramer 3×3, RSS identity
rss = Σy² − aᵀ·b) is the same operation sequence in Spark and the DuckDB
oracle — bit-identical, no rounding races. Ties on RSS break on the
lowest candidate index.

At 100 TB: the fan-out multiplies scan output ×G but each emitted row is
a handful of int64s; per-group state is O(G), independent of history
length, and keys are (object, candidate) — uniformly distributed, no
skew. This is the plan you'd want on a 1000-executor cluster.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Quantization grid: trig terms are O(1); callers pre-scale y to O(1).
_QX = 1_000_000.0
_QY = 10_000_000.0


def _q(col, scale):
    # floor(v*Q + 0.5) = round-half-away for the positive-shifted range;
    # identical expression in the SQL twin.
    return F.floor(col * F.lit(scale) + F.lit(0.5)).cast("long")


def period_scan_native(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    value_col: str,
    periods: list[float],
    min_points: int = 6,
) -> DataFrame:
    """Best-fit sinusoid period per key tuple from a frozen candidate
    grid. ``time_col`` in days, ``value_col`` pre-scaled to O(1).

    Returns one row per group: (keys…, n, best_period, amp, level, rss)
    where amp = √(a²+b²) and level = the fitted constant c.
    """
    g = F.posexplode(F.array(*[F.lit(float(p)) for p in periods]))
    fan = df.select(*keys, time_col, value_col, g.alias("p_idx", "period"))
    omega_t = F.lit(2.0 * math.pi) * F.col(time_col) / F.col("period")
    x1, x2 = F.sin(omega_t), F.cos(omega_t)
    y = F.col(value_col)
    x1q, x2q, yq = _q(x1, _QX), _q(x2, _QX), _q(y, _QY)
    x3q = F.lit(int(_QX)).cast("long")  # constant regressor
    agg = (
        fan.groupBy(*keys, "p_idx", "period")
        .agg(
            F.count("*").alias("n"),
            F.sum(x1q * x1q).alias("s11"),
            F.sum(x1q * x2q).alias("s12"),
            F.sum(x1q * x3q).alias("s13"),
            F.sum(x2q * x2q).alias("s22"),
            F.sum(x2q * x3q).alias("s23"),
            F.sum(x3q * x3q).alias("s33"),
            F.sum(x1q * yq).alias("b1"),
            F.sum(x2q * yq).alias("b2"),
            F.sum(x3q * yq).alias("b3"),
            F.sum(yq * yq).alias("syy"),
        )
        .filter(F.col("n") >= min_points)
    )

    def s(name, scale):
        return F.col(name).cast("double") / F.lit(scale)

    s11, s12, s13 = s("s11", _QX * _QX), s("s12", _QX * _QX), s("s13", _QX * _QX)
    s22, s23, s33 = s("s22", _QX * _QX), s("s23", _QX * _QX), s("s33", _QX * _QX)
    b1, b2, b3 = s("b1", _QX * _QY), s("b2", _QX * _QY), s("b3", _QX * _QY)
    syy = s("syy", _QY * _QY)
    det = (
        s11 * (s22 * s33 - s23 * s23)
        - s12 * (s12 * s33 - s23 * s13)
        + s13 * (s12 * s23 - s22 * s13)
    )
    a1 = (
        b1 * (s22 * s33 - s23 * s23)
        - s12 * (b2 * s33 - s23 * b3)
        + s13 * (b2 * s23 - s22 * b3)
    ) / det
    a2 = (
        s11 * (b2 * s33 - s23 * b3)
        - b1 * (s12 * s33 - s23 * s13)
        + s13 * (s12 * b3 - b2 * s13)
    ) / det
    a3 = (
        s11 * (s22 * b3 - b2 * s23)
        - s12 * (s12 * b3 - b2 * s13)
        + b1 * (s12 * s23 - s22 * s13)
    ) / det
    rss = F.greatest(F.lit(0.0), syy - (a1 * b1 + a2 * b2 + a3 * b3))
    cand = agg.select(
        *keys,
        "p_idx",
        "period",
        "n",
        F.when(det > 0, F.sqrt(a1 * a1 + a2 * a2)).alias("amp"),
        F.when(det > 0, a3).alias("level"),
        F.when(det > 0, rss).otherwise(F.lit(float("inf"))).alias("rss"),
    )
    w = Window.partitionBy(*keys).orderBy(F.col("rss").asc(), F.col("p_idx").asc())
    return (
        cand.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .filter(F.col("rss") != float("inf"))
        .drop("__rk", "p_idx")
    )


def period_scan_sql(
    source_sql: str,
    keys: list[str],
    time_expr: str,
    value_expr: str,
    periods: list[float],
    min_points: int = 6,
) -> str:
    """DuckDB twin of :func:`period_scan_native`: identical quantization,
    identical sufficient statistics, identical Cramer/RSS algebra and
    tie-break. ``source_sql`` must expose the key columns plus the time
    and value expressions."""
    ks = ", ".join(keys)
    grid = ", ".join(
        f"({i}, {float(p)!r}::DOUBLE)" for i, p in enumerate(periods)
    )
    qx, qy = repr(_QX), repr(_QY)
    sxx, sxy, syy2 = repr(_QX * _QX), repr(_QX * _QY), repr(_QY * _QY)
    return f"""
WITH grid(p_idx, period) AS (VALUES {grid}),
fan AS (
  SELECT {ks}, p_idx, period,
         CAST(floor(sin(2 * pi() * ({time_expr}) / period) * {qx} + 0.5) AS BIGINT) AS x1q,
         CAST(floor(cos(2 * pi() * ({time_expr}) / period) * {qx} + 0.5) AS BIGINT) AS x2q,
         CAST({int(_QX)} AS BIGINT) AS x3q,
         CAST(floor(({value_expr}) * {qy} + 0.5) AS BIGINT) AS yq
  FROM ({source_sql}) src, grid
),
agg AS (
  SELECT {ks}, p_idx, period, count(*) AS n,
         sum(x1q * x1q) AS s11, sum(x1q * x2q) AS s12, sum(x1q * x3q) AS s13,
         sum(x2q * x2q) AS s22, sum(x2q * x3q) AS s23, sum(x3q * x3q) AS s33,
         sum(x1q * yq) AS b1, sum(x2q * yq) AS b2, sum(x3q * yq) AS b3,
         sum(yq * yq) AS syy
  FROM fan GROUP BY {ks}, p_idx, period
  HAVING count(*) >= {min_points}
),
solved AS (
  SELECT {ks}, p_idx, period, n,
         s11 / {sxx} AS d11, s12 / {sxx} AS d12, s13 / {sxx} AS d13,
         s22 / {sxx} AS d22, s23 / {sxx} AS d23, s33 / {sxx} AS d33,
         b1 / {sxy} AS e1, b2 / {sxy} AS e2, b3 / {sxy} AS e3,
         syy / {syy2} AS eyy
  FROM agg
),
fit AS (
  SELECT {ks}, p_idx, period, n, eyy, e1, e2, e3,
         d11 * (d22 * d33 - d23 * d23)
           - d12 * (d12 * d33 - d23 * d13)
           + d13 * (d12 * d23 - d22 * d13) AS det,
         e1 * (d22 * d33 - d23 * d23)
           - d12 * (e2 * d33 - d23 * e3)
           + d13 * (e2 * d23 - d22 * e3) AS n1,
         d11 * (e2 * d33 - d23 * e3)
           - e1 * (d12 * d33 - d23 * d13)
           + d13 * (d12 * e3 - e2 * d13) AS n2,
         d11 * (d22 * e3 - e2 * d23)
           - d12 * (d12 * e3 - e2 * d13)
           + e1 * (d12 * d23 - d22 * d13) AS n3
  FROM solved
),
cand AS (
  SELECT {ks}, p_idx, period, n,
         CASE WHEN det > 0
              THEN sqrt((n1 / det) * (n1 / det) + (n2 / det) * (n2 / det))
         END AS amp,
         CASE WHEN det > 0 THEN n3 / det END AS level,
         CASE WHEN det > 0 THEN greatest(
                  0.0,
                  eyy - ((n1 / det) * e1 + (n2 / det) * e2 + (n3 / det) * e3))
              ELSE 1e308 END AS rss
  FROM fit
),
ranked AS (
  SELECT *, row_number() OVER (
           PARTITION BY {ks} ORDER BY rss ASC, p_idx ASC) AS rk
  FROM cand
)
SELECT {ks}, period, n, amp, level, rss
FROM ranked WHERE rk = 1 AND rss < 1e308
"""
