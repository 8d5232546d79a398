"""The canonical enrichment-module template, as a first-class operator.

Every science module in the reference follows one shape (observed at e.g.
ztf/random_forest_snia/processor.py:174-216): *native selection cuts →
reshape history arrays → vectorized kernel per row → scatter results back
with a default for masked rows*. The reference hides the mask inside each
pandas UDF; we hoist it into the DataFrame plan so Catalyst can push the
cut below the scan (UDFs are opaque to the optimizer — the pre-filter is
exactly what the reference documents as manual policy,
ztf/hostless_detection/processor.py:44-47).

Two kernel flavors:
- a native Column expression (preferred — stays in codegen), applied under
  ``when(mask, kernel).otherwise(default)``;
- an Arrow-vectorized pandas UDF, applied only to the masked subset via
  filter → withColumn → unionByName with the default-filled complement, so
  Python never sees rows the cuts rejected.

Executor-side model state (the "load once per worker" pattern,
rubin/cats/processor.py:34-38) lives in :class:`ExecutorRegistry`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class EnrichModule:
    """Declarative enrichment module: appends ``output_col`` to the frame.

    kernel is either a Column (native path) or a callable returning a
    Column from input columns (pandas UDF path — pass the already-wrapped
    ``pandas_udf`` result applied to columns).
    """

    name: str
    output_col: str
    kernel: Column | Callable[[DataFrame], Column]
    prefilter: Column | None = None
    default: Any = None
    required_cols: list[str] = field(default_factory=list)

    def apply(self, df: DataFrame) -> DataFrame:
        kernel = self.kernel if isinstance(self.kernel, Column) else self.kernel(df)
        if self.prefilter is None:
            return df.withColumn(self.output_col, kernel)
        default = F.lit(self.default)
        return df.withColumn(
            self.output_col, F.when(self.prefilter, kernel).otherwise(default)
        )


def apply_masked_pandas_kernel(
    df: DataFrame,
    mask: Column,
    kernel_udf,
    input_cols: list[str],
    output_col: str,
    default,
    output_type: str,
) -> DataFrame:
    """Run an Arrow kernel only on rows passing the mask; fill the rest
    with the default. Python cost scales with the selected subset, not the
    table — the split/union is two narrow passes over the same scan (no
    shuffle), which AQE dedups via exchange reuse when cached."""
    selected = df.filter(mask).withColumn(output_col, kernel_udf(*input_cols))
    rejected = df.filter(~F.coalesce(mask, F.lit(False))).withColumn(
        output_col, F.lit(default).cast(output_type)
    )
    return selected.unionByName(rejected)


class ExecutorRegistry:
    """Process-level singleton cache for per-executor state (models,
    catalogs): loaded once per Python worker, reused across Arrow batches.
    Replaces the reference's module-global model loads."""

    _cache: dict[str, Any] = {}

    @classmethod
    def get(cls, key: str, loader: Callable[[], Any]) -> Any:
        if key not in cls._cache:
            cls._cache[key] = loader()
        return cls._cache[key]

    @classmethod
    def clear(cls) -> None:
        cls._cache.clear()


def enrich_pipeline(df: DataFrame, modules: list[EnrichModule]) -> DataFrame:
    """Apply modules in order (later modules may consume earlier outputs,
    exactly like the reference's chained science pipeline)."""
    for m in modules:
        df = m.apply(df)
    return df
