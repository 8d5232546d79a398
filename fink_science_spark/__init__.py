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
# reach for, importable from the package root.
from fink_science_spark.functions.arrays import (  # noqa: E402,F401
    collect_history,
    concat_col,
    delta_last,
    trapezoid_integral,
)
from fink_science_spark.operators.asof import asof_join  # noqa: E402,F401
from fink_science_spark.operators.dedup import (  # noqa: E402,F401
    argmin_dedup,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from fink_science_spark.operators.enrich import (  # noqa: E402,F401
    EnrichModule,
    enrich_pipeline,
)
from fink_science_spark.operators.graph import connected_components  # noqa: E402,F401
from fink_science_spark.operators.remote import service_xmatch  # noqa: E402,F401
from fink_science_spark.operators.similarity import (  # noqa: E402,F401
    cosine_topk_blocked,
    ivf_topk_blocked,
)
from fink_science_spark.operators.spatial import (  # noqa: E402,F401
    nearest_join_1d,
    nearest_join_sky,
)
from fink_science_spark.session import get_session  # noqa: E402,F401
from fink_science_spark.sources.alerts import build_alerts  # noqa: E402,F401
from fink_science_spark.sources.catalogs import CatalogRegistry  # noqa: E402,F401
