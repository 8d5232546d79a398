"""Reference-catalog registry: small static side tables, read once,
cached, and joined broadcast.

The reference loads its catalogs (GCVS/VSX/TNS/... parquet, CSV, FITS)
*inside* pandas UDFs on every batch (ztf/xmatch/utils.py:105-244) — an
anti-pattern this engine replaces with ``spark.read`` + ``F.broadcast``
joins, the policy SURVEY.md §1.4 prescribes. A catalog registered here is:

- read once through the DataFrame reader (schema explicit, no inference),
- cached (StorageLevel MEMORY_AND_DISK) so repeated micro-batches reuse it,
- always joined with an explicit broadcast hint — at 100 TB the stream
  side never shuffles for a catalog join.

CSV quirks the reference handles in pandas (whitespace-padded headers,
sexagesimal coordinates) become explicit post-read projections. FITS has
no Spark datasource; :func:`register_pandas` accepts any pandas loader
output (driver-side, small tables only by definition of "catalog").
"""

from __future__ import annotations

from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CatalogRegistry:
    """Session-scoped registry of small broadcast-joinable side tables."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._catalogs: dict[str, DataFrame] = {}

    def register_parquet(self, name: str, path: str, select: list[str] | None = None):
        df = self.spark.read.parquet(path)
        if select:
            df = df.select(*select)
        self._catalogs[name] = df.cache()
        return self._catalogs[name]

    def register_csv(
        self, name: str, path: str, schema: str | None = None, **options
    ) -> DataFrame:
        reader = self.spark.read.options(header="true", **options)
        if schema:
            reader = reader.schema(schema)
        self._catalogs[name] = reader.csv(path).cache()
        return self._catalogs[name]

    def register_pandas(self, name: str, pdf: pd.DataFrame, schema=None) -> DataFrame:
        """Driver-side bridge for formats without a Spark datasource
        (e.g. FITS read via astropy upstream)."""
        self._catalogs[name] = self.spark.createDataFrame(pdf, schema=schema).cache()
        return self._catalogs[name]

    def register_fits(
        self, name: str, path: str, select: list[str] | None = None
    ) -> DataFrame:
        """Native FITS BINTABLE catalog read, astropy-free — the 4LAC
        load of ztf/xmatch/utils.py:118-150 through the pure-Python
        codec (sources/fits_codec.py, FITS 4.0 standard subset). Falls
        back to astropy transparently if it is installed and the codec
        hits an unsupported TFORM."""
        try:
            from fink_science_spark.sources.fits_codec import read_bintable

            pdf = read_bintable(path)
        except ValueError as codec_err:
            try:
                from astropy.table import Table  # optional fallback
            except ImportError:
                # no astropy: surface the codec's diagnostic, not a
                # ModuleNotFoundError that masks it
                raise codec_err
            pdf = Table.read(path).to_pandas()
        if select:
            pdf = pdf[select]
        return self.register_pandas(name, pdf)

    def register_df(self, name: str, df: DataFrame) -> DataFrame:
        self._catalogs[name] = df.cache()
        return self._catalogs[name]

    def get(self, name: str) -> DataFrame:
        return self._catalogs[name]

    def broadcast_join(
        self, df: DataFrame, name: str, on, how: str = "left"
    ) -> DataFrame:
        """Join the stream frame against a registered catalog with an
        explicit broadcast hint."""
        return df.join(F.broadcast(self._catalogs[name]), on, how)

    def upsert(self, name: str, new_rows: DataFrame, key: str) -> DataFrame:
        """Catalog refresh: keep old rows whose key is absent from the new
        batch, append the new batch (anti-join + unionByName — the
        reference's catalog-production merge,
        data/catalogs/blazar_catalog_production.py:139-169)."""
        old = self._catalogs[name]
        kept = old.join(new_rows.select(key), key, "left_anti")
        merged = kept.unionByName(new_rows).cache()
        self._catalogs[name] = merged
        return merged


def sexagesimal_to_degrees(ra_col: str, dec_col: str) -> tuple:
    """Native-SQL sexagesimal → decimal degrees (the 3HSP CSV conversion,
    ztf/xmatch/utils.py:153-197, without pandas): 'HH MM SS.S' → deg."""
    def parts(c):
        return F.split(F.trim(F.col(c)), r"[\s:]+")

    ra_p, dec_p = parts(ra_col), parts(dec_col)
    ra_deg = (
        ra_p.getItem(0).cast("double") * 15.0
        + ra_p.getItem(1).cast("double") / 4.0
        + ra_p.getItem(2).cast("double") / 240.0
    )
    sign = F.when(F.trim(F.col(dec_col)).startswith("-"), -1.0).otherwise(1.0)
    dec_deg = sign * (
        F.abs(dec_p.getItem(0).cast("double"))
        + dec_p.getItem(1).cast("double") / 60.0
        + dec_p.getItem(2).cast("double") / 3600.0
    )
    return ra_deg, dec_deg


def bounded_to_pandas(df: DataFrame, bound: int, why: str) -> pd.DataFrame:
    """Driver-side materialization with a PROVEN bound: takes bound+1
    rows and refuses if the relation exceeds it. The engine-wide policy
    is that no registered query's input construction may collect
    unbounded data at any SF; fixed-size dimension tables (nation: 25
    rows at every TPC-H scale) go through this gate so the bound is
    enforced, not assumed."""
    rows = df.take(bound + 1)
    if len(rows) > bound:
        raise ValueError(
            f"bounded_to_pandas({why}): relation exceeds bound={bound}"
        )
    return pd.DataFrame([r.asDict() for r in rows], columns=df.columns)
