"""Focused unit tests for operator edge semantics the parity suite's
fixed datasets may not exercise: as-of tie handling, sexagesimal
conversion, the catalog upsert, and the enrichment pipeline order."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_asof_tie_matches_equal_timestamp(spark):
    from fink_science_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100), (1, 200), (2, 50)], "k long, lt long"
    )
    right = spark.createDataFrame(
        [(1, 100, 10.0), (1, 150, 11.0), (2, 60, 12.0)], "k long, rt long, v double"
    )
    out = asof_join(left, right, "k", "lt", "rt", ["v"]).orderBy("k", "lt")
    rows = [(r["k"], r["lt"], r["asof_v"], r["asof_ts"]) for r in out.collect()]
    # lt=100 ties rt=100 → matches (<= semantics); lt=200 takes rt=150;
    # k=2 lt=50 has no right row at or before → nulls
    assert rows == [(1, 100, 10.0, 100), (1, 200, 11.0, 150), (2, 50, None, None)]


def test_asof_inner_drops_unmatched(spark):
    from fink_science_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 5), (1, 500)], "k long, lt long")
    right = spark.createDataFrame([(1, 100, 1.0)], "k long, rt long, v double")
    out = asof_join(left, right, "k", "lt", "rt", ["v"], how="inner")
    assert [(r["lt"], r["asof_v"]) for r in out.collect()] == [(500, 1.0)]


def test_sexagesimal_to_degrees(spark):
    from fink_science_spark.sources.catalogs import sexagesimal_to_degrees

    df = spark.createDataFrame(
        [("12 30 00.0", "-45 30 00.0"), ("00 00 00.0", "00 00 00.0"),
         ("23 59 60.0", "+89 59 60.0")],
        "ra string, dec string",
    )
    ra, dec = sexagesimal_to_degrees("ra", "dec")
    rows = df.select(ra.alias("rad"), dec.alias("decd")).collect()
    assert rows[0]["rad"] == 187.5 and rows[0]["decd"] == -45.5
    assert rows[1]["rad"] == 0.0 and rows[1]["decd"] == 0.0
    assert rows[2]["rad"] == 360.0 and rows[2]["decd"] == 90.0


def test_catalog_upsert_semantics(spark):
    from fink_science_spark.sources.catalogs import CatalogRegistry

    reg = CatalogRegistry(spark)
    reg.register_df(
        "cat", spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    )
    merged = reg.upsert(
        "cat", spark.createDataFrame([(2, "B"), (3, "C")], "k long, v string"), "k"
    )
    got = sorted((r["k"], r["v"]) for r in merged.collect())
    assert got == [(1, "a"), (2, "B"), (3, "C")]


def test_connected_components_known_graph(spark):
    from fink_science_spark.operators.graph import connected_components

    # chain 1-2-3-4, triangle 10-11-12, isolated edge 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_diameter_guard(spark):
    import pytest as _pytest

    from fink_science_spark.operators.graph import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=1)


def test_connected_components_chain_logarithmic_rounds(spark):
    """Adversarial diameter: a 64-node chain must converge in O(log n)
    star-contraction rounds, not O(diameter) label-propagation rounds."""
    from fink_science_spark.operators.graph import connected_components

    n = 64
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(chain, shuffle_partitions=4).collect()
    }
    assert got == {i: 0 for i in range(n)}
    # diameter is 63; star contraction must finish way below that
    assert connected_components.last_rounds <= 10, (
        connected_components.last_rounds
    )


def test_enrich_pipeline_chains_outputs(spark):
    from fink_science_spark.operators.enrich import EnrichModule, enrich_pipeline

    df = spark.createDataFrame([(1.0,), (10.0,)], "x double")
    m1 = EnrichModule(name="double", output_col="y", kernel=F.col("x") * 2)
    # later module consumes the earlier module's output — the chained
    # science-pipeline property
    m2 = EnrichModule(
        name="flag",
        output_col="big",
        kernel=F.col("y") > 10,
        prefilter=F.col("x") > 0,
        default=False,
    )
    out = enrich_pipeline(df, [m1, m2]).orderBy("x").collect()
    assert [(r["y"], r["big"]) for r in out] == [(2.0, False), (20.0, True)]
