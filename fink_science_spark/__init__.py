"""fink_science_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
fink-science alert-enrichment library (reference capability set only; no
code is shared). One row carries its own time-series history as nested
array columns; every operator is expressed Spark-first: declarative
DataFrame/SQL plans that Catalyst can optimize (predicate pushdown, column
pruning, broadcast joins, AQE), with Arrow-vectorized pandas UDFs reserved
for genuinely non-relational kernels.

Subpackages
-----------
functions   column-expression builders (history arrays, text, hashing)
operators   multi-column/multi-table operators (joins, dedup, similarity,
            aggregation, enrichment framework)
sources     readers and broadcast catalog registry
plans       plan-inspection helpers (pushdown / broadcast assertions)
streaming   Structured Streaming shell (stateless per-micro-batch enrich)
"""

__version__ = "0.1.0"

# Public API: the operator surface a user of the reference library would
# reach for, importable from the package root — resolved LAZILY (PEP 562).
# Eager root imports pulled pandas/numpy and every operator module into
# any process that touched ANY submodule (the package __init__ runs
# first), which taxed every fresh Python worker fork ~0.45 s: Spark's
# driver-side DataSource plan/stream-runner workers unpickle
# fink_science_spark.sources classes per query, and paid the whole
# operator surface's import for a codec that needs none of it (guide §4
# — the Python boundary; measured: ~0.7 s fixed plan-time overhead per
# avro_replay read). `from fink_science_spark import X` still works for
# every name below; each resolves (and is then cached in globals) on
# first attribute access.
_EXPORTS = {
    "collect_history": "fink_science_spark.functions.arrays",
    "concat_col": "fink_science_spark.functions.arrays",
    "delta_last": "fink_science_spark.functions.arrays",
    "trapezoid_integral": "fink_science_spark.functions.arrays",
    "asof_join": "fink_science_spark.operators.asof",
    "argmin_dedup": "fink_science_spark.operators.dedup",
    "exact_dedup": "fink_science_spark.operators.dedup",
    "minhash_lsh_pairs": "fink_science_spark.operators.dedup",
    "ngram_jaccard_pairs": "fink_science_spark.operators.dedup",
    "simhash_pairs": "fink_science_spark.operators.dedup",
    "EnrichModule": "fink_science_spark.operators.enrich",
    "enrich_pipeline": "fink_science_spark.operators.enrich",
    "connected_components": "fink_science_spark.operators.graph",
    "service_xmatch": "fink_science_spark.operators.remote",
    "cosine_topk_blocked": "fink_science_spark.operators.similarity",
    "ivf_topk_blocked": "fink_science_spark.operators.similarity",
    "nearest_join_1d": "fink_science_spark.operators.spatial",
    "nearest_join_sky": "fink_science_spark.operators.spatial",
    "get_session": "fink_science_spark.session",
    "build_alerts": "fink_science_spark.sources.alerts",
    "CatalogRegistry": "fink_science_spark.sources.catalogs",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name: str):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}"
        )
    import importlib

    obj = getattr(importlib.import_module(mod), name)
    globals()[name] = obj  # cache: subsequent accesses skip __getattr__
    return obj


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))
