"""FITS BINTABLE codec tests: roundtrip over the supported TFORM subset,
the 4LAC-catalog shape from the reference's xmatch path, and the full
catalog-registry → broadcast-join flow through Spark."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fink_science_spark.sources.fits_codec import read_bintable, write_bintable


def test_bintable_roundtrip_all_types(tmp_path):
    pdf = pd.DataFrame(
        {
            "name": ["4FGL J0001.2+4741", "x", "longer-name-here"],
            "ra": np.array([0.3126, 10.5, 359.9999], dtype=np.float64),
            "dec": np.array([47.69, -5.25, 0.0], dtype=np.float32),
            "nobs": np.array([12, -3, 2**40], dtype=np.int64),
            "fid": np.array([1, 2, 3], dtype=np.int32),
            "short": np.array([-7, 0, 300], dtype=np.int16),
            "ok": [True, False, True],
        }
    )
    path = str(tmp_path / "t.fits")
    write_bintable(path, pdf)
    got = read_bintable(path)
    assert list(got.columns) == list(pdf.columns)
    assert got["name"].tolist() == pdf["name"].tolist()
    assert np.allclose(got["ra"], pdf["ra"])
    assert got["dec"].dtype == np.float32
    assert got["nobs"].tolist() == pdf["nobs"].tolist()
    assert got["short"].dtype == np.int16
    assert got["ok"].tolist() == [True, False, True]
    # the file is standard-shaped: 2880-byte blocks
    import os

    assert os.path.getsize(path) % 2880 == 0


def test_bintable_unsupported_tform_raises(tmp_path):
    from fink_science_spark.sources.fits_codec import _parse_tform

    with pytest.raises(ValueError):
        _parse_tform("3E")  # repeated numeric field (array cell)
    with pytest.raises(ValueError):
        _parse_tform("C")  # complex


def test_fits_catalog_broadcast_join(spark, tmp_path):
    """The reference's 4LAC flow (ztf/xmatch/utils.py:118-150): a FITS
    catalog registered once, broadcast-joined against the fact side —
    here nation names onto customers, checked against the parquet
    tables directly."""
    from pyspark.sql import functions as F

    from fink_science_spark.sources.catalogs import CatalogRegistry

    sf = "/root/testdata/sf0.001"
    nation = spark.read.parquet(f"{sf}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    pdf = nation.toPandas()
    path = str(tmp_path / "nation.fits")
    write_bintable(path, pdf)

    reg = CatalogRegistry(spark)
    cat = reg.register_fits("nation_fits", path)
    assert cat.count() == nation.count()

    cust = spark.read.parquet(f"{sf}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    got = (
        reg.broadcast_join(
            cust, "nation_fits", cust.c_nationkey == cat.n_nationkey
        )
        .groupBy("n_name")
        .agg(F.count("*").alias("n"))
    )
    expected = (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n"))
    )
    canon = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert canon(got) == canon(expected)
