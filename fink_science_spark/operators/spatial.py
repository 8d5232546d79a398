"""Bucketed nearest-neighbor and range joins — the crossmatch family.

The reference's flagship join is the 1-NN sky crossmatch: for each left
row the nearest right row within radius r (reference semantics:
cross_match_astropy KD-tree + d2d < r, ztf/xmatch/utils.py:32-82, with
manual dec-band pruning rubin/xmatch/processor.py:674-687). A KD-tree
doesn't distribute; the Spark-native shape is:

    bucket both sides on floor(coord / radius)
    → candidates = equi-join on bucket, with the LEFT side exploded to
      its 3 adjacent buckets (so every true neighbor lands in some bucket)
    → refine with the exact distance predicate
    → arg-min per left row (window row_number == 1, deterministic ties)

The bucket column is the generalized "zone/healpix id": the equi-join key
that lets Catalyst plan a plain shuffled (or broadcast) hash join and
prune partitions, instead of a cross join. At 100 TB the right side is
usually a small catalog → broadcast; both sides large → the bucket join
shuffles each side once, keys are uniform by construction (fixed-width
buckets), and no pair outside ±1 bucket is ever materialized.

1-D here (acctbal/price/jd domains of the test tables); the 2-D sky
version composes two of these bucket dimensions with a great-circle
refine — same plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _bucket(col: Column, width: float) -> Column:
    return F.floor(col / F.lit(width)).cast("long")


def nearest_join_1d(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_coord: str,
    right_id: str,
    right_coord: str,
    radius: float,
    broadcast_right: bool = True,
    payload: list[str] | None = None,
) -> DataFrame:
    """For each left row, the single nearest right row with
    |left_coord − right_coord| ≤ radius. Ties break on smallest right id
    (deterministic). Left rows with no neighbor in radius are dropped
    (semi-join semantics, as in the reference's match-only output).

    Returns (left_id, right_id, dist, *payload).
    """
    l = left.select(
        F.col(left_id).alias("__lid"),
        F.col(left_coord).cast("double").alias("__lc"),
    ).withColumn("__b0", _bucket(F.col("__lc"), radius))
    # explode left row into its 3 candidate buckets
    l = l.withColumn(
        "__b", F.explode(F.array(F.col("__b0") - 1, F.col("__b0"), F.col("__b0") + 1))
    ).drop("__b0")

    r = right.select(
        F.col(right_id).alias("__rid"),
        F.col(right_coord).cast("double").alias("__rc"),
        *[F.col(p) for p in (payload or [])],
    ).withColumn("__b", _bucket(F.col("__rc"), radius))
    if broadcast_right:
        r = F.broadcast(r)

    cand = (
        l.join(r, "__b")
        .withColumn("__dist", F.abs(F.col("__lc") - F.col("__rc")))
        .filter(F.col("__dist") <= radius)
    )
    w = Window.partitionBy("__lid").orderBy(F.col("__dist").asc(), F.col("__rid").asc())
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            F.col("__dist").alias("dist"),
            *[F.col(p) for p in (payload or [])],
        )
    )


def haversine_deg(ra1: Column, dec1: Column, ra2: Column, dec2: Column) -> Column:
    """Great-circle separation in DEGREES between two (ra, dec) points —
    the crossmatch distance (reference semantics: astropy
    match_to_catalog_sky d2d, ztf/xmatch/utils.py:48-54). Haversine form:
    numerically stable for small separations, wrap-safe in RA."""
    dphi = F.radians(dec2 - dec1)
    dlam = F.radians(ra2 - ra1)
    a = (
        F.sin(dphi / 2) * F.sin(dphi / 2)
        + F.cos(F.radians(dec1))
        * F.cos(F.radians(dec2))
        * F.sin(dlam / 2)
        * F.sin(dlam / 2)
    )
    return F.degrees(2 * F.asin(F.sqrt(a)))


def nearest_join_sky(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_ra: str,
    left_dec: str,
    right_id: str,
    right_ra: str,
    right_dec: str,
    radius_deg: float,
    broadcast_right: bool = True,
    payload: list[str] | None = None,
    keep_unmatched: bool = False,
) -> DataFrame:
    """The flagship 2-D sky crossmatch: for each left row, the nearest
    right row within ``radius_deg`` great-circle degrees (reference
    semantics: cross_match_astropy two-pass 1-NN, ztf/xmatch/utils.py:32-82;
    callers ztf/xmatch/processor.py:555-598).

    Spark-native plan (a KD-tree doesn't distribute):
    (ra_block, dec_zone) grid bucketing — dec zones of height radius;
    RA blocks of width radius/cos(dec_cap) so the block width covers the
    worst-case RA shrink at high declination (the generalized dec-band
    prune of rubin/xmatch/processor.py:674-687) — left side exploded to
    its 3×3 neighbor buckets with RA wraparound, equi-join on the bucket
    key (broadcast when the right side is a catalog), exact haversine
    refine, arg-min per left row via row_number()==1 with deterministic
    ties on right id. No pair outside the 3×3 neighborhood is ever
    materialized; bucket keys are uniform by construction.

    Zoned RA widths (the Gray–Szalay "zones" refinement): instead of one
    global RA-block width sized for the worst-case shrink at dec_cap
    (which over-widens every equatorial cell by 1/cos(dec_cap) — ~2× of
    wasted candidates at dec_cap 60°, ~10× at 84°), each dec zone gets
    its own block count n_ra(zone) from the rigorous per-zone RA bound:
    a pair within ``radius_deg`` whose higher-|dec| side is at δ has
    wrapped ΔRA ≤ 2·asin(sin(radius/2)/cos δ) (from the haversine lower
    bound sin(d/2) ≥ cos δ·sin(ΔRA/2); the asin form matters at wide
    radii where ΔRA > radius/cos δ). δ is bounded by the right row's
    zone extent + radius (a matching left row sits within one zone).
    Both sides derive n_ra from the zone id alone, so the (ra_block,
    dec_zone) key stays a plain equi-join key; occupancy is ~uniform for
    uniform sky density instead of decaying by cos(dec).

    The bound is applied UNCLAMPED, so the grid alone is all-sky
    complete — the completeness the reference gets from its KD-tree
    (astropy handles poles natively, ztf/xmatch/utils.py:32-82): as the
    zone's worst-case δ approaches the pole the margin saturates at
    180° → n_ra = 2 (the ±1 block explode then covers the whole ring),
    and past it (cos δ_eff ≤ 0) the ring collapses to n_ra = 1 — the
    polar ring becomes a single all-pairs cell exactly the height of one
    dec zone, which is the minimal region where no RA prune is sound.
    (Earlier revisions clamped the bound at a dec_cap and unioned in
    per-hemisphere cap cells; the cap membership |dec| > dec_cap −
    radius made the all-pairs region ~radius/2 of the sphere at wide
    radii — strictly more work than the unclamped polar rings, for the
    same answer. Property tests at ±89°–90° pin the equivalence.)

    Returns (left_id, right_id, dist_deg, *payload) — matched rows only.

    ``keep_unmatched=True`` restores the reference's every-row-gets-a-
    result contract (crossmatch_mangrove's default-dict fill,
    ztf/xmatch/processor.py:685-688) WITHOUT a join back to the left
    table: one all-null sentinel candidate per left row is unioned in
    before the arg-min window, and nulls-last ordering makes it lose to
    any real match. Unmatched rows come back with null right_id / dist /
    payload, and the plan gains only a second columnar scan of the left
    keys — never a second shuffle (the sentinels ride the window's
    existing left_id partitioning).
    """
    import math

    sin_half_r = math.sin(math.radians(radius_deg / 2.0))

    def dec_zone(c: Column) -> Column:
        return F.floor((c + F.lit(90.0)) / F.lit(radius_deg)).cast("long")

    def zone_n_ra(z: Column) -> Column:
        # blocks in this zone's ring: 360 / (the zone's rigorous ΔRA
        # bound), computed from the zone id ONLY so both join sides and
        # all 3 exploded neighbor zones agree exactly.
        d_lo = F.lit(-90.0) + z.cast("double") * F.lit(radius_deg)
        d_hi = d_lo + F.lit(radius_deg)
        d_max = F.greatest(F.abs(d_lo), F.abs(d_hi))
        # unclamped: cos(d_eff) → 0⁺ gives margin 180° (n=2, ring fully
        # covered by the ±1 explode); cos(d_eff) ≤ 0 means no RA bound is
        # sound in this ring, so it is ONE cell. The ≤ 0 branch must be
        # explicit: feeding a negative cosine through asin produces NaN
        # whenever |cos| < sin(r/2) (ratio < −1, outside asin's domain),
        # and NaN propagated through greatest→cast→ra_block into a NULL
        # join key — silently dropping every row in a near-polar band for
        # radii where frac(90/r) puts a zone edge just past the pole
        # (caught by code review; regression-pinned at radius 0.65°).
        d_eff = d_max + F.lit(radius_deg)
        cos_eff = F.cos(F.radians(d_eff))
        margin = F.degrees(
            2.0 * F.asin(F.least(F.lit(1.0), F.lit(sin_half_r) / cos_eff))
        )
        n_from_margin = F.greatest(
            F.floor(F.lit(360.0) / margin), F.lit(1)
        ).cast("long")
        return F.when(cos_eff <= 0, F.lit(1).cast("long")).otherwise(
            n_from_margin
        )

    def ra_block(ra: Column, n: Column) -> Column:
        # exact ring tiling: width = 360/n, then wrap into [0, n)
        b = F.floor(ra / (F.lit(360.0) / n.cast("double"))).cast("long")
        return ((b % n) + n) % n

    l = left.select(
        F.col(left_id).alias("__lid"),
        F.col(left_ra).cast("double").alias("__lra"),
        F.col(left_dec).cast("double").alias("__ldec"),
    )
    l = (
        l.withColumn("__dz0", dec_zone(F.col("__ldec")))
        .withColumn("__ddec", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("__dz", F.col("__dz0") + F.col("__ddec"))
        .withColumn("__n", zone_n_ra(F.col("__dz")))
        .withColumn("__rb0", ra_block(F.col("__lra"), F.col("__n")))
        .withColumn("__dra", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            "__lid",
            "__lra",
            "__ldec",
            (((F.col("__rb0") + F.col("__dra")) % F.col("__n") + F.col("__n"))
             % F.col("__n")).alias("__rb"),
            "__dz",
        )
    )

    r = right.select(
        F.col(right_id).alias("__rid"),
        F.col(right_ra).cast("double").alias("__rra"),
        F.col(right_dec).cast("double").alias("__rdec"),
        *[F.col(p) for p in (payload or [])],
    ).withColumn("__dz", dec_zone(F.col("__rdec"))).withColumn(
        "__rb", ra_block(F.col("__rra"), zone_n_ra(F.col("__dz")))
    )
    if broadcast_right:
        r = F.broadcast(r)

    pay = [F.col(p) for p in (payload or [])]
    dist = haversine_deg(
        F.col("__lra"), F.col("__ldec"), F.col("__rra"), F.col("__rdec")
    )
    cand = (
        l.join(r, ["__rb", "__dz"])
        .withColumn("__dist", dist)
        .filter(F.col("__dist") <= radius_deg)
        .select("__lid", "__rid", "__dist", *pay)
    )

    if keep_unmatched:
        sentinel = left.select(
            F.col(left_id).alias("__lid"),
            F.lit(None).cast(r.schema["__rid"].dataType).alias("__rid"),
            F.lit(None).cast("double").alias("__dist"),
            *[
                F.lit(None).cast(right.schema[p].dataType).alias(p)
                for p in (payload or [])
            ],
        )
        cand = cand.unionByName(sentinel)

    w = Window.partitionBy("__lid").orderBy(
        F.col("__dist").asc_nulls_last(), F.col("__rid").asc_nulls_last()
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            F.col("__dist").alias("dist_deg"),
            *[F.col(p) for p in (payload or [])],
        )
    )


def range_count_join_1d(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_coord: str,
    right_coord: str,
    radius: float,
    broadcast_right: bool = True,
) -> DataFrame:
    """Count right rows within ±radius of each left coordinate — the band
    (range) join, bucketed exactly like :func:`nearest_join_1d`. Left rows
    with zero neighbors keep count 0 via the left join + coalesce."""
    l = left.select(
        F.col(left_id).alias("__lid"),
        F.col(left_coord).cast("double").alias("__lc"),
    ).withColumn("__b0", _bucket(F.col("__lc"), radius))
    l = l.withColumn(
        "__b", F.explode(F.array(F.col("__b0") - 1, F.col("__b0"), F.col("__b0") + 1))
    ).drop("__b0")

    r = right.select(F.col(right_coord).cast("double").alias("__rc")).withColumn(
        "__b", _bucket(F.col("__rc"), radius)
    )
    if broadcast_right:
        r = F.broadcast(r)

    counted = (
        l.join(r, "__b", "left")
        .withColumn(
            "__hit",
            F.when(F.abs(F.col("__lc") - F.col("__rc")) <= radius, 1).otherwise(0),
        )
        .groupBy("__lid")
        .agg(F.sum("__hit").alias("n_neighbors"))
    )
    return counted.select(
        F.col("__lid").alias(left_id),
        F.coalesce("n_neighbors", F.lit(0)).alias("n_neighbors"),
    )


# --------------------------------------------------------------------------
# Equal-area hierarchical sky pixelization ("healpix-grade" bucketing).
#
# The reference handles spatial locality with manual dec-band pruning
# (rubin/xmatch/processor.py:674-687) and, ecosystem-wide, HEALPix ids.
# Proper HEALPix ang2pix is awkward as portable SQL; the property that
# matters for a distributed engine is EQUAL AREA (uniform key occupancy
# for isotropic skies -> no hot shuffle partitions at the poles, unlike
# the plain lat-lon grid). The Lambert cylindrical equal-area grid has
# exactly that property with two floors:
#
#     iy  = floor((sin(dec) + 1) / 2 * nside)          nside equal-AREA
#           (clamped to nside-1 at dec=+90)            latitude rings
#     ix  = floor(ra / 360 * 2*nside)  (clamped)       2*nside RA columns
#     pix = iy * 2*nside + ix
#
# Every pixel covers the same solid angle 4*pi / (2*nside^2). The grid is
# hierarchical by construction: the depth-(k-1) parent of a depth-k pixel
# is (iy>>1, ix>>1) — a pure column expression, so a coarse rollup never
# re-reads the points, it re-aggregates the fine aggregate (the
# hypertable-rollup shape). Used as an alternative bucketing to the
# (ra_block, dec_zone) grid of nearest_join_sky for aggregation queries.
# --------------------------------------------------------------------------


def _clamped_floor(x: Column, cap: int) -> Column:
    """floor(x) clamped to cap — via CASE, not least(): least/greatest
    SKIP nulls in both Spark and DuckDB, so a NULL coordinate would
    silently land in the clamp pixel instead of staying NULL (caught by
    tests/test_empty_inputs.py::test_equal_area_pixel_null_safe)."""
    f = F.floor(x)
    return F.when(f > cap, F.lit(cap)).otherwise(f).cast("long")


def equal_area_pixel(
    ra: Column, dec: Column, nside: int
) -> tuple[Column, Column, Column]:
    """(ix, iy, pix) equal-area pixel coordinates for ra/dec in degrees.
    NULL coordinates yield NULL pixels (never a default cell)."""
    z = F.sin(F.radians(dec))
    iy = _clamped_floor(
        (z + F.lit(1.0)) / F.lit(2.0) * F.lit(float(nside)), nside - 1
    )
    ix = _clamped_floor(ra / F.lit(360.0) * F.lit(2.0 * nside), 2 * nside - 1)
    pix = iy * F.lit(2 * nside) + ix
    return ix, iy, pix


def equal_area_pixel_sql(ra: str, dec: str, nside: int) -> tuple[str, str, str]:
    """SQL twins of :func:`equal_area_pixel` (identical literals/order;
    CASE clamp for the same null-propagation reason as the Column form)."""
    fy = f"floor((sin(radians({dec})) + 1.0) / 2.0 * {float(nside)!r})"
    iy = f"(CASE WHEN {fy} > {nside - 1} THEN {nside - 1} ELSE {fy} END)"
    fx = f"floor({ra} / 360.0 * {2.0 * nside!r})"
    ix = f"(CASE WHEN {fx} > {2 * nside - 1} THEN {2 * nside - 1} ELSE {fx} END)"
    pix = f"(({iy}) * {2 * nside} + ({ix}))"
    return ix, iy, pix


def parent_pixel(ix: Column, iy: Column, nside: int) -> Column:
    """Depth-(k-1) parent pixel id of depth-k pixel coords (nside halves)."""
    return F.floor(iy / F.lit(2)).cast("long") * F.lit(nside) + F.floor(
        ix / F.lit(2)
    ).cast("long")


def parent_pixel_sql(ix: str, iy: str, nside: int) -> str:
    return f"(floor(({iy}) / 2) * {nside} + floor(({ix}) / 2))"
