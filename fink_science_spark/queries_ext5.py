"""Query registry, wave 5 (round 2): the frozen-weight model-scoring
pipeline (the reference's ML-UDF shape, numpy-only), the SSOFT HG
phase-curve fit, and the scale-hardened variants the round-1 verdict
called for — each with a bit-portable DuckDB oracle.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fink_science_spark.queries import _events_us, _t

# --------------------------------------------------------------------------
# §2.8 model scoring: frozen-weight MLP, end-to-end (closes the one "no"
# in the round-1 coverage table without ML libs)
# --------------------------------------------------------------------------

# Native feature expressions (codegen'd; the Python kernel sees only the
# four feature columns — the reference's featurize step is Python too, but
# these features are SQL-expressible so the oracle can replay them).
_MODEL_FEATURES_SQL = [
    "log10(l_quantity + 1.0)",
    "l_extendedprice / 100000.0",
    "l_discount * 10.0",
    "l_tax * 10.0",
]
# Selection cuts (the rfscore mask: quality cuts applied natively BEFORE
# Python, ztf/random_forest_snia/processor.py:40-75). Cut rows score 0.0,
# the reference's default for non-candidates (processor.py:208-212).
_MODEL_MASK_SQL = "l_quantity >= 5.0 AND l_discount > 0.0"


def q_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen-weight MLP scoring over lineitem: native selection cuts →
    codegen'd features → Arrow forward pass (executor-singleton weights)
    → default-fill for cut rows → candidate flag at p > 0.5 — the exact
    lifecycle of rfscore_sigmoid_full
    (ztf/random_forest_snia/processor.py:77-216) with numpy in the
    predict_proba slot. No shuffle; Python cost scales with rows passing
    the cuts only."""
    from fink_science_spark.operators.enrich import apply_masked_pandas_kernel
    from fink_science_spark.operators.models import make_mlp_score_udf

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        *[
            F.expr(e).alias(f"__x{k + 1}")
            for k, e in enumerate(_MODEL_FEATURES_SQL)
        ],
        F.expr(_MODEL_MASK_SQL).alias("__sel"),
    )
    scored = apply_masked_pandas_kernel(
        li,
        mask=F.col("__sel"),
        kernel_udf=make_mlp_score_udf(),
        input_cols=["__x1", "__x2", "__x3", "__x4"],
        output_col="__p",
        default=0.0,
        output_type="double",
    )
    return scored.select(
        "l_orderkey",
        "l_linenumber",
        F.round("__p", 6).alias("score"),
        (F.round("__p", 6) > 0.5).alias("is_candidate"),
    )


def _oracle_model_score() -> str:
    from fink_science_spark.operators.models import mlp_score_sql

    p = mlp_score_sql([f"x{k}" for k in range(1, 5)])
    return f"""
WITH f AS (
  SELECT l_orderkey, l_linenumber,
         {_MODEL_FEATURES_SQL[0]} AS x1,
         {_MODEL_FEATURES_SQL[1]} AS x2,
         {_MODEL_FEATURES_SQL[2]} AS x3,
         {_MODEL_FEATURES_SQL[3]} AS x4,
         ({_MODEL_MASK_SQL}) AS sel
  FROM lineitem
),
p AS (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN sel THEN round({p}, 6) ELSE 0.0 END AS score
  FROM f
)
SELECT l_orderkey, l_linenumber, score, score > 0.5 AS is_candidate
FROM p
"""


# --------------------------------------------------------------------------
# §2.8 SSOFT phase-curve fit: closed-form HG per (object, band)
# --------------------------------------------------------------------------

# Deterministic synthetic phase curve: phase angle from event_id, reduced
# magnitude follows an H=15, G=0.15 Bowell curve + a value-derived
# perturbation (±0.245 mag). Both engines compute the identical columns.
_ALPHA_DEG_SQL = "3.0 + (event_id % 2160) * (27.0 / 2160)"
_H_TRUE, _G_TRUE = 15.0, 0.15
_HG_MIN_POINTS = 5


def _alpha_deg_spark():
    return F.lit(3.0) + (F.col("event_id") % 2160) * (27.0 / 2160)


def q_ssoft_hg_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSOFT batch pipeline: aggregate per-(object, band) light curves,
    then the closed-form HG phase-curve fit (the linear-least-squares form
    of ztf/ssoft/processor.py:436-671 `estimate_sso_params` for the HG
    model). One shuffle + one scalar Arrow kernel; see
    operators/phase_curve.py for the algebra and the 100 TB story."""
    from fink_science_spark.operators.phase_curve import (
        hg_fit_per_group,
        hg_phase_terms_sql,
    )

    alpha = F.radians(_alpha_deg_spark())
    phi1_sql, phi2_sql = hg_phase_terms_sql("alpha")
    # reduced magnitude on the true curve + perturbation, computed natively
    ev = (
        _events_us(spark, sf_dir)
        .withColumn("alpha", alpha)
        .withColumn(
            "mred",
            F.lit(_H_TRUE)
            - 2.5
            * F.log10(
                F.lit(1.0 - _G_TRUE) * F.expr(phi1_sql)
                + F.lit(_G_TRUE) * F.expr(phi2_sql)
            )
            + (F.col("value") - 245.0) / 1000.0,
        )
    )
    fit = hg_fit_per_group(
        ev, ["user_id", "event_type"], "alpha", "mred",
        min_points=_HG_MIN_POINTS,
    )
    return fit.select(
        "user_id",
        "event_type",
        "n",
        F.round("h", 6).alias("h"),
        F.round("g", 6).alias("g"),
    )


def _oracle_ssoft_hg_fit() -> str:
    from fink_science_spark.operators.phase_curve import hg_phase_terms_sql

    phi1, phi2 = hg_phase_terms_sql("alpha")
    return f"""
WITH obs AS (
  SELECT user_id, event_type,
         radians({_ALPHA_DEG_SQL}) AS alpha, value
  FROM events
),
xy AS (
  SELECT user_id, event_type,
         {phi1} AS x1, {phi2} AS x2,
         pow(10.0, -0.4 * ({_H_TRUE!r} - 2.5 * log10(
             ({1.0 - _G_TRUE!r}) * {phi1} + ({_G_TRUE!r}) * {phi2})
             + (value - 245.0) / 1000.0)) AS y
  FROM obs
),
s AS (
  SELECT user_id, event_type, count(*) AS n,
         sum(x1 * x1) AS s11, sum(x1 * x2) AS s12, sum(x2 * x2) AS s22,
         sum(x1 * y) AS s1y, sum(x2 * y) AS s2y
  FROM xy GROUP BY user_id, event_type
  HAVING count(*) >= {_HG_MIN_POINTS}
),
ab AS (
  SELECT user_id, event_type, n,
         s11 * s22 - s12 * s12 AS det,
         (s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12) AS a1,
         (s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12) AS a2
  FROM s
)
SELECT user_id, event_type, n,
       CASE WHEN det > 0 AND a1 + a2 > 0
            THEN round(-2.5 * log10(a1 + a2), 6) END AS h,
       CASE WHEN det > 0 AND a1 + a2 > 0
            THEN round(a2 / (a1 + a2), 6) END AS g
FROM ab
"""


# --------------------------------------------------------------------------
# M7 dedup: doc-frequency-capped exact Jaccard (the 100 TB default)
# --------------------------------------------------------------------------

# A shingle shared by k documents expands to C(k,2) pairs; one ubiquitous
# shingle in 10^6 docs emits 5*10^11 pairs. Capping posting-list length is
# the standard fix (drops only stop-shingles, which carry ~no identity
# signal); this is the documented DEFAULT at scale — the uncapped variant
# exists for exactness on bounded corpora.
_JACCARD_MAX_DOC_FREQ = 50


def q_dedup_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard pairs with the doc-frequency cap ON (posting
    lists longer than max_doc_freq dropped before pair expansion) — the
    scale-default variant of dedup_ngram_jaccard. Set sizes |A|, |B| stay
    the full distinct-shingle counts; only intersection counting skips
    capped shingles, so the score is a (slightly conservative) lower
    bound on true Jaccard."""
    from fink_science_spark.operators.dedup import ngram_jaccard_pairs
    from fink_science_spark.queries_ext import _doc_shingles

    return ngram_jaccard_pairs(
        _doc_shingles(spark, sf_dir),
        "doc_id",
        "shingles",
        threshold=0.5,
        max_doc_freq=_JACCARD_MAX_DOC_FREQ,
    )


def _oracle_dedup_ngram_jaccard_capped() -> str:
    from fink_science_spark.functions.hashing import hash64_sql
    from fink_science_spark.queries_ext import _DOCS_TOK_CTE

    return f"""
WITH {_DOCS_TOK_CTE},
raw AS (SELECT doc_id, len(shingles) n, unnest(shingles) g0 FROM sh),
inv AS (SELECT doc_id, n, {hash64_sql('g0')} AS g FROM raw),
df AS (SELECT g, count(*) AS k FROM inv GROUP BY g),
capped AS (
  SELECT inv.* FROM inv JOIN df USING (g)
  WHERE df.k > 1 AND df.k <= {_JACCARD_MAX_DOC_FREQ}
),
pairs AS (
  SELECT a.doc_id id_a, b.doc_id id_b, a.n na, b.n nb, count(*) inter
  FROM capped a JOIN capped b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b, round(inter * 1.0 / (na + nb - inter), 6) AS jaccard
FROM pairs
WHERE inter * 1.0 / (na + nb - inter) >= 0.5
"""


QUERIES_EXT5: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "model_score": q_model_score,
    "ssoft_hg_fit": q_ssoft_hg_fit,
    "dedup_ngram_jaccard_capped": q_dedup_ngram_jaccard_capped,
}

ORACLES_EXT5: dict[str, str] = {
    "model_score": _oracle_model_score(),
    "ssoft_hg_fit": _oracle_ssoft_hg_fit(),
    "dedup_ngram_jaccard_capped": _oracle_dedup_ngram_jaccard_capped(),
}
