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
