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
