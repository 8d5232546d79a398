"""Photometry conversions — the magnitude/flux algebra the reference's
processors lean on (imported there from the public fink-utils package):
``mag2fluxcal_snana`` (ztf/kilonova/processor.py:25,149,256;
ztf/superluminous/slsn_classifier.py), ``apparent_flux`` / ``dc_mag``
(ztf/standardized_flux/utils.py:4,36-38; ztf/ad_features/processor.py:181).

Re-derived here as NATIVE Spark column expressions (pow/log10/sqrt —
whole-stage codegen, no Python), each with a duckdb SQL twin using the
identical literals and operation order:

- SNANA calibrated flux:  FLUXCAL = 10^(−0.4·m) · 10^11, with the
  first-order error  σ_F = F · σ_m · ln10 / 2.5.
- DC (direct-camera) photometry: difference-image PSF flux added to
  (isdiffpos) or subtracted from the reference flux, errors in
  quadrature; apparent magnitude −2.5·log10(F_dc) with
  σ_mag = σ_F / F_dc · 2.5 / ln10 (defined only for F_dc > 0 — the
  negative-flux rows come out NULL in both engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LN10_OVER_2P5 = 0.9210340371976184  # ln(10)/2.5 = 0.4·ln10, repr-exact
FLUXCAL_ZP = 1.0e11  # SNANA zero-point scale 10^11


def mag2fluxcal_snana(mag: Column, sig: Column) -> tuple[Column, Column]:
    """(FLUXCAL, FLUXCAL_err) from a PSF magnitude and its error."""
    flux = F.pow(F.lit(10.0), -0.4 * mag) * F.lit(FLUXCAL_ZP)
    err = flux * sig * F.lit(LN10_OVER_2P5)
    return flux, err


def mag2fluxcal_snana_sql(mag: str, sig: str) -> tuple[str, str]:
    flux = f"(pow(10.0, -0.4 * ({mag})) * {FLUXCAL_ZP!r})"
    err = f"({flux} * ({sig}) * {LN10_OVER_2P5!r})"
    return flux, err


def apparent_flux(
    magpsf: Column,
    sigmapsf: Column,
    magnr: Column,
    sigmagnr: Column,
    ispos: Column,
) -> tuple[Column, Column]:
    """DC flux from difference photometry: reference flux ± difference
    flux (``ispos`` boolean = isdiffpos), errors in quadrature. Returned
    in FLUXCAL units (×10^11) so downstream rounding keeps precision."""
    diff = F.pow(F.lit(10.0), -0.4 * magpsf) * F.lit(FLUXCAL_ZP)
    dsig = diff * sigmapsf * F.lit(LN10_OVER_2P5)
    ref = F.pow(F.lit(10.0), -0.4 * magnr) * F.lit(FLUXCAL_ZP)
    rsig = ref * sigmagnr * F.lit(LN10_OVER_2P5)
    dc_flux = F.when(ispos, ref + diff).otherwise(ref - diff)
    dc_sigflux = F.sqrt(dsig * dsig + rsig * rsig)
    return dc_flux, dc_sigflux


def apparent_flux_sql(
    magpsf: str, sigmapsf: str, magnr: str, sigmagnr: str, ispos: str
) -> tuple[str, str]:
    diff = f"(pow(10.0, -0.4 * ({magpsf})) * {FLUXCAL_ZP!r})"
    dsig = f"({diff} * ({sigmapsf}) * {LN10_OVER_2P5!r})"
    ref = f"(pow(10.0, -0.4 * ({magnr})) * {FLUXCAL_ZP!r})"
    rsig = f"({ref} * ({sigmagnr}) * {LN10_OVER_2P5!r})"
    dc_flux = f"(CASE WHEN {ispos} THEN {ref} + {diff} ELSE {ref} - {diff} END)"
    dc_sigflux = f"sqrt({dsig} * {dsig} + {rsig} * {rsig})"
    return dc_flux, dc_sigflux


def dc_mag(dc_flux: Column, dc_sigflux: Column) -> tuple[Column, Column]:
    """Apparent DC magnitude + error from DC flux (FLUXCAL units; the
    10^11 zero point shifts the magnitude by a constant −2.5·log10(10^11),
    removed here so the result matches the unscaled formula). NULL when
    the subtracted flux is non-positive — same rows in both engines."""
    mag = F.when(
        dc_flux > 0,
        -2.5 * F.log10(dc_flux / F.lit(FLUXCAL_ZP)),
    )
    sigmag = F.when(dc_flux > 0, dc_sigflux / dc_flux / F.lit(LN10_OVER_2P5))
    return mag, sigmag


def dc_mag_sql(dc_flux: str, dc_sigflux: str) -> tuple[str, str]:
    mag = (
        f"(CASE WHEN {dc_flux} > 0 "
        f"THEN -2.5 * log10({dc_flux} / {FLUXCAL_ZP!r}) END)"
    )
    sigmag = (
        f"(CASE WHEN {dc_flux} > 0 "
        f"THEN {dc_sigflux} / {dc_flux} / {LN10_OVER_2P5!r} END)"
    )
    return mag, sigmag


# --- standardized flux against a monitored-source catalog -----------------

JANSKY_ZP = 3631.0  # AB zero point: flux[Jy] = 3631 · 10^(−0.4·m)


def save_flux_catalog(path: str, rows: list[dict]) -> None:
    """Freeze a monitored-source flux catalog (the reference ships this
    as plain data: CTAO_blazars_ztf_*.parquet with per-band flux medians
    and alert thresholds — ztf/standardized_flux/processor.py:140-143)
    into the engine's JSON checkpoint format. Each row:
    {ztf_name, median_g, median_r, low_threshold, high_threshold}."""
    import json

    with open(path, "w") as f:
        json.dump({"format": "flux_catalog_v1", "rows": rows}, f)


def load_flux_catalog(spark, path: str):
    """Checkpoint → broadcast-sized catalog DataFrame. The monitored set
    is hundreds of rows (231 in the shipped DR23 catalog), so it always
    broadcasts; the alert side never shuffles."""
    import json

    with open(path) as f:
        obj = json.load(f)
    if obj.get("format") != "flux_catalog_v1":
        raise ValueError(f"not a flux_catalog_v1 artifact: {path}")

    def _f(v):
        # real catalogs carry missing thresholds/medians as null
        return float(v) if v is not None else float("nan")

    return spark.createDataFrame(
        [
            (
                r["ztf_name"],
                _f(r["median_g"]),
                _f(r["median_r"]),
                _f(r.get("low_threshold")),
                _f(r.get("high_threshold")),
            )
            for r in obj["rows"]
        ],
        "ztf_name string, median_g double, median_r double, "
        "low_threshold double, high_threshold double",
    )


def standardized_flux_hist(
    df,
    catalog,
    object_col: str = "objectId",
    out_flux: str = "cstd_flux",
    out_sigma: str = "csigma_std_flux",
):
    """Per-alert standardized flux history — the reference's
    ``standardized_flux`` module (ztf/standardized_flux/processor.py:
    31-179, utils.py:7-58) as native column algebra instead of a
    per-alert pandas loop:

    - DC flux per history point from difference photometry
      (isdiffpos ∈ {'t','1'} adds, else subtracts), scaled to Jansky
      (fink-utils ``apparent_flux(jansky=True)``),
    - divided by the catalog's per-band flux median (g=fid 1, r=fid 2;
      other bands stay NaN, matching the reference's g/r-only loop),
    - objects absent from the monitored catalog yield EMPTY arrays
      (the reference's ``CTAO_data.empty`` branch).

    One broadcast join + one array transform: no shuffle of the alert
    side, no Python. Expects the concatenated history arrays
    (``cmagpsf``/``csigmapsf``/``cmagnr``/``csigmagnr``/``cisdiffpos``/
    ``cfid`` — build with :func:`...functions.arrays.concat_col`)."""
    nan = F.lit(float("nan"))
    scale = F.lit(JANSKY_ZP / FLUXCAL_ZP)

    def elem(x, med_g, med_r, want_sigma):
        flux, sig = apparent_flux(
            x["cmagpsf"],
            x["csigmapsf"],
            x["cmagnr"],
            x["csigmagnr"],
            x["cisdiffpos"].isin("t", "1"),
        )
        val = (sig if want_sigma else flux) * scale
        med = (
            F.when(x["cfid"] == 1, med_g)
            .when(x["cfid"] == 2, med_r)
        )
        # NaN for non-g/r bands and for history points with missing
        # photometry (the reference's apparent_flux yields nan there)
        return F.coalesce(val / med, nan)

    zipped = F.arrays_zip(
        "cmagpsf", "csigmapsf", "cmagnr", "csigmagnr", "cisdiffpos", "cfid"
    )
    joined = df.join(
        F.broadcast(catalog),
        df[object_col] == catalog["ztf_name"],
        "left",
    ).drop("ztf_name")
    empty = F.array().cast("array<double>")
    mg, mr = F.col("median_g"), F.col("median_r")
    return (
        joined.withColumn(
            out_flux,
            F.when(mg.isNull(), empty).otherwise(
                F.transform(zipped, lambda x: elem(x, mg, mr, False))
            ),
        )
        .withColumn(
            out_sigma,
            F.when(mg.isNull(), empty).otherwise(
                F.transform(zipped, lambda x: elem(x, mg, mr, True))
            ),
        )
        # the contract is "alert frame + out_flux/out_sigma": drop the
        # remaining joined catalog internals, which would otherwise leak
        # into writes and collide on a re-join against the catalog
        .drop(*[c for c in catalog.columns if c != "ztf_name"])
    )
