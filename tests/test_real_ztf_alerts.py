"""Integration against the reference's REAL ZTF alert sample
(51 genuine alert packets at
/root/reference/fink_science/data/alerts/alerts.parquet — the table the
reference's own doctests process): the engine's kernels run on the TRUE
nested alert layout, the real gzipped FITS cutout stamps decode through
the pure-Python codecs, and real alert rows survive an Avro container
round-trip. This is the parity evidence synthetic analogues cannot give:
no schema detail was invented here."""

from __future__ import annotations

import gzip
import math

import numpy as np
import pytest

from pyspark.sql import functions as F

ALERTS = "/root/reference/fink_science/data/alerts/alerts.parquet"


@pytest.fixture(scope="module")
def alerts(spark):
    return spark.read.parquet(ALERTS)


def test_history_kernels_on_real_alerts(spark, alerts):
    """concat_col + delta_last + non-NaN count on the real
    prv_candidates/candidate layout — the reference's c-column +
    deltamaglatest + nalerthist stack (ztf/nalerthist, utils.concat_col)."""
    from fink_science_spark.functions.arrays import concat_col, delta_last

    df = concat_col(alerts, "magpsf")
    out = df.select(
        "objectId",
        F.size("cmagpsf").alias("n_hist"),
        delta_last("cmagpsf").alias("dmag"),
        F.size(
            F.filter("cmagpsf", lambda x: ~F.isnan(x) & x.isNotNull())
        ).alias("nalerthist"),
    ).collect()
    assert len(out) == 51
    for r in out:
        assert r["n_hist"] >= 1  # candidate itself always present
        assert 0 <= r["nalerthist"] <= r["n_hist"]
    # at least one object has real history and a finite last delta
    assert any(
        r["n_hist"] > 1 and r["dmag"] is not None and not math.isnan(r["dmag"])
        for r in out
    )


def test_photometry_on_real_candidates(spark, alerts):
    """SNANA FLUXCAL and DC-mag algebra on the real magpsf/sigmapsf/
    magnr/sigmagnr/isdiffpos fields (isdiffpos is the reference's
    't'/'1' STRING convention, not a boolean)."""
    from fink_science_spark.functions.photometry import (
        apparent_flux,
        dc_mag,
        mag2fluxcal_snana,
    )

    c = alerts.select("objectId", "candidate.*")
    flux, err = mag2fluxcal_snana(F.col("magpsf"), F.col("sigmapsf"))
    ispos = F.col("isdiffpos").isin("t", "1")
    dcf, dcs = apparent_flux(
        F.col("magpsf"), F.col("sigmapsf"), F.col("magnr"),
        F.col("sigmagnr"), ispos,
    )
    m, sig = dc_mag(dcf, dcs)
    out = c.select(
        "objectId", "magpsf",
        flux.alias("fluxcal"), err.alias("fluxcalerr"),
        m.alias("dcmag"), sig.alias("dcsig"),
    ).collect()
    assert len(out) == 51
    for r in out:
        if r["magpsf"] is not None and not math.isnan(r["magpsf"]):
            # FLUXCAL = 10^(-0.4 m) * 1e11 — spot-check the algebra
            assert r["fluxcal"] == pytest.approx(
                10.0 ** (-0.4 * r["magpsf"]) * 1e11, rel=1e-12
            )
            assert r["fluxcalerr"] > 0
    # DC mag defined for at least some rows, NULL only where flux <= 0
    assert any(r["dcmag"] is not None for r in out)


def test_real_cutout_stamps_decode(spark, alerts):
    """Every real cutoutScience stamp gunzips and parses as a FITS
    IMAGE HDU through the pure-Python codec — executed INSIDE Spark via
    the multimodal mapInPandas plumbing, blob never shuffled."""
    import pandas as pd

    def stats(batches):
        from fink_science_spark.sources.fits_codec import read_image

        for pdf in batches:
            rows = []
            for oid, blob in zip(pdf["objectId"], pdf["blob"]):
                img = read_image(gzip.decompress(bytes(blob)))
                rows.append(
                    (
                        oid,
                        img.shape[0],
                        img.shape[1],
                        float(np.nanmin(img)),
                        float(np.nanmax(img)),
                        float(np.nanmean(img)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["objectId", "h", "w", "vmin", "vmax", "vmean"],
            )

    out = (
        alerts.select("objectId", F.col("cutoutScience.stampData").alias("blob"))
        .mapInPandas(
            stats,
            schema="objectId string, h int, w int, vmin double, "
            "vmax double, vmean double",
        )
        .collect()
    )
    assert len(out) == 51
    for r in out:
        assert (r["h"], r["w"]) == (63, 63)
        assert r["vmin"] <= r["vmean"] <= r["vmax"]
        assert math.isfinite(r["vmean"])


def test_real_alerts_roundtrip_through_avro(spark, alerts):
    """Real alert packets (nested candidate + full prv_candidates
    history) survive our Avro container encode/decode bit-for-bit —
    the wire-format claim exercised on genuine broker data, not a
    synthetic schema."""
    from fink_science_spark.sources.avro_codec import (
        read_container,
        write_container,
    )

    cand_fields = ["jd", "fid", "ra", "dec", "magpsf", "sigmapsf"]
    rows = alerts.select(
        "objectId",
        F.struct(*[F.col(f"candidate.{f}") for f in cand_fields]).alias("c"),
        F.transform(
            "prv_candidates",
            lambda p: F.struct(*[p[f].alias(f) for f in cand_fields]),
        ).alias("prv"),
    ).collect()

    cand_rec = {
        "type": "record",
        "name": "cand",
        "fields": [
            {"name": "jd", "type": "double"},
            {"name": "fid", "type": "int"},
            {"name": "ra", "type": ["null", "double"]},
            {"name": "dec", "type": ["null", "double"]},
            {"name": "magpsf", "type": ["null", "double"]},
            {"name": "sigmapsf", "type": ["null", "double"]},
        ],
    }
    schema = {
        "type": "record",
        "name": "alert",
        "fields": [
            {"name": "objectId", "type": "string"},
            {"name": "candidate", "type": cand_rec},
            {"name": "prv_candidates",
             "type": {"type": "array", "items": "cand"}},
        ],
    }

    def clean(v):
        # NaN is valid Avro double; keep as-is. Rows → plain dicts.
        return {
            "objectId": v["objectId"],
            "candidate": v["c"].asDict(),
            "prv_candidates": [p.asDict() for p in v["prv"]],
        }

    records = [clean(r) for r in rows]
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/real_alerts.avro"
        write_container(path, schema, records, codec="deflate",
                        records_per_block=10)
        _s, got = read_container(path)

    def canon(rec):
        def n(x):
            if isinstance(x, float) and math.isnan(x):
                return "NaN"
            return x

        return (
            rec["objectId"],
            tuple(n(rec["candidate"][f]) for f in cand_fields),
            tuple(
                tuple(n(p[f]) for f in cand_fields)
                for p in rec["prv_candidates"]
            ),
        )

    assert sorted(map(canon, got)) == sorted(map(canon, records))
    assert sum(len(r["prv_candidates"]) for r in got) > 0  # real history
