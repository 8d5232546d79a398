"""Unit tests of the history-array kernel on alert-shaped nested rows —
the reference's data model (candidate struct + prv_candidates array,
FIXTURES.md §1), including the null/upper-limit conventions."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from fink_science_spark.functions.arrays import (
    any_matching,
    band_peak,
    concat_col,
    delta_last,
    first_above,
    last_in_band,
    non_null_count,
)


@pytest.fixture(scope="module")
def alerts(spark):
    """Three alert-shaped rows: normal history, history with upper limits
    (null magpsf), and empty history."""
    rows = [
        {
            "candid": 1,
            "objectId": "OBJ1",
            "candidate": {"jd": 2459010.0, "fid": 1, "magpsf": 17.5},
            "prv_candidates": [
                {"jd": 2459001.0, "fid": 1, "magpsf": 19.0},
                {"jd": 2459002.0, "fid": 2, "magpsf": 18.5},
                {"jd": 2459005.0, "fid": 1, "magpsf": 18.0},
            ],
        },
        {
            "candid": 2,
            "objectId": "OBJ2",
            "candidate": {"jd": 2459011.0, "fid": 2, "magpsf": 16.0},
            "prv_candidates": [
                {"jd": 2459003.0, "fid": 1, "magpsf": None},  # upper limit
                {"jd": 2459004.0, "fid": 2, "magpsf": 17.0},
            ],
        },
        {
            "candid": 3,
            "objectId": "OBJ3",
            "candidate": {"jd": 2459012.0, "fid": 1, "magpsf": 20.0},
            "prv_candidates": [],
        },
    ]
    schema = (
        "candid long, objectId string, "
        "candidate struct<jd:double, fid:int, magpsf:double>, "
        "prv_candidates array<struct<jd:double, fid:int, magpsf:double>>"
    )
    return spark.createDataFrame(rows, schema)


def _c_cols(df):
    for c in ("jd", "fid", "magpsf"):
        df = concat_col(df, c)
    return df


def test_concat_col_appends_current_last(alerts):
    out = _c_cols(alerts).select("candid", "cjd", "cmagpsf").collect()
    by_id = {r.candid: r for r in out}
    assert by_id[1].cjd == [2459001.0, 2459002.0, 2459005.0, 2459010.0]
    assert by_id[1].cmagpsf[-1] == 17.5  # current value is last
    assert by_id[3].cjd == [2459012.0]  # empty history → [current]


def test_non_null_count_ignores_upper_limits(alerts):
    out = (
        _c_cols(alerts)
        .select("candid", non_null_count("cmagpsf").alias("n"))
        .collect()
    )
    by_id = {r.candid: r.n for r in out}
    assert by_id[1] == 4
    assert by_id[2] == 2  # null magpsf (upper limit) not counted
    assert by_id[3] == 1


def test_delta_last(alerts):
    out = (
        _c_cols(alerts)
        .select("candid", delta_last("cmagpsf").alias("d"))
        .collect()
    )
    by_id = {r.candid: r.d for r in out}
    assert math.isclose(by_id[1], 17.5 - 18.0)
    assert by_id[3] is None  # single measurement → no delta


def test_last_in_band_and_first_above(alerts):
    df = _c_cols(alerts)
    out = df.select(
        "candid",
        last_in_band("cjd", "cmagpsf", "cfid", 1).alias("last_g"),
        first_above("cjd", "cmagpsf", 18.4).alias("first_faint_jd"),
    ).collect()
    by_id = {r.candid: r for r in out}
    assert by_id[1].last_g == 17.5  # current row is fid=1
    assert by_id[1].first_faint_jd == 2459001.0
    assert by_id[2].last_g is None  # no fid=1 with non-null? fid1 is null-mag
    assert by_id[3].first_faint_jd == 2459012.0


def test_band_peak_and_exists(alerts):
    df = _c_cols(alerts)
    zipped = F.arrays_zip(F.col("cmagpsf").alias("v"), F.col("cfid").alias("b"))
    out = df.select(
        "candid",
        band_peak("cmagpsf", "cfid", 1).alias("peak_g"),
        any_matching(zipped, lambda s: (s["b"] == 2) & (s["v"] < 17.5)).alias(
            "bright_r"
        ),
    ).collect()
    by_id = {r.candid: r for r in out}
    assert by_id[1].peak_g == 17.5  # brightest (min mag) in band 1
    assert by_id[1].bright_r is False
    assert by_id[2].bright_r is True  # current r-band 16.0 < 17.5
    assert by_id[3].bright_r is False  # empty history → coalesce(False)


def test_all_array_kernels_survive_empty_and_singleton(spark):
    """Edge sweep: every history-array kernel must return a well-defined
    value (not throw) on zero- and one-element arrays — the first
    micro-batch of a new key (the trapezoid_integral negative-slice
    crash was exactly this class)."""
    from pyspark.sql import functions as F

    from fink_science_spark.functions.arrays import (
        any_matching,
        band_peak,
        count_in_window,
        delta_last,
        first_above,
        last_in_band,
        non_null_count,
        trapezoid_integral,
    )

    df = spark.createDataFrame(
        [
            (0, [], [], []),
            (1, [5.0], [7.0], ["g"]),
        ],
        "k long, t array<double>, v array<double>, b array<string>",
    )
    out = df.select(
        "k",
        delta_last("v").alias("dl"),
        non_null_count("v").alias("nn"),
        count_in_window("t", 0.0, 10.0).alias("cw"),
        last_in_band("t", "v", "b", "g").alias("lib"),
        first_above("t", "v", 6.0).alias("fa"),
        band_peak("v", "b", "g").alias("bp"),
        F.round(trapezoid_integral("t", "v"), 6).alias("ti"),
        any_matching("v", lambda x: x > 6.0).alias("am"),
    ).orderBy("k").collect()
    empty, single = out
    assert empty["dl"] is None
    assert empty["nn"] == 0 and empty["cw"] == 0
    assert empty["lib"] is None and empty["fa"] is None
    assert empty["bp"] is None
    assert empty["ti"] == 0.0
    assert empty["am"] is False
    assert single["nn"] == 1 and single["cw"] == 1
    assert single["lib"] == 7.0 and single["fa"] == 5.0
    assert single["bp"] == 7.0
    assert single["ti"] == 0.0  # < 2 points
    assert single["am"] is True
