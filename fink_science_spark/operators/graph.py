"""Connected components — near-dup clustering over a pair graph.

Dedup pipelines end with clustering: MinHash/SimHash emit near-dup PAIRS;
keeping one canonical document per duplicate CLUSTER requires the
connected components of that pair graph. This is the engine's one
genuinely iterative algorithm (not SQL-expressible in one pass).

Algorithm (round 2): alternating **large-star / small-star** contraction
(the published MapReduce CC algorithm — Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014):

- large-star: each node u connects every strictly-larger neighbor to
  min(N(u) ∪ {u});
- small-star: each node u (over edges oriented large→small) connects its
  smaller neighbors and itself to the minimum.

Both steps preserve connectivity and strictly shrink tall trees; the
edge set converges to per-component stars (v → root) in O(log² n)
rounds on ANY graph — unlike plain min-label propagation, whose round
count is the graph DIAMETER (a 10⁶-long chain at 100 TB would mean 10⁶
blocking rounds; here it's ~20).

Each round is two shuffles (one groupBy per star step) over the PAIR
graph only — orders of magnitude smaller than the corpus.
``localCheckpoint`` cuts lineage so round N never re-executes rounds
1..N-1. Convergence is detected from a (count, hash-sum) aggregate over
the just-materialized edges — one cheap scalar read per round, NOT a
labels-vs-labels diff join (which was a full extra shuffle per round in
round 1 of this engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u}).
    Input/output edges oriented (u > v); output keeps that invariant."""
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("__mb"))
    m = F.least(F.col("__mb"), F.col("u"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m.alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Connect each node's smaller-or-equal neighbors (and itself) to the
    minimum of that set. Input edges oriented (u > v)."""
    mins = e.groupBy("u").agg(F.min("v").alias("__m"))
    nbr = (
        e.join(mins, "u")
        .filter(F.col("v") != F.col("__m"))
        .select(F.col("v").alias("u"), F.col("__m").alias("v"))
    )
    own = mins.select("u", F.col("__m").alias("v"))
    return nbr.unionByName(own).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    shuffle_partitions: int | None = None,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component
    is the minimum node id in the node's connected component.

    Deterministic; raises if the star contraction has not provably
    converged within ``max_iter`` rounds (convergence needs one extra
    round to confirm the edge set is stable, so even a trivial graph
    requires max_iter ≥ 2 — silent wrong answers are worse than
    failures). Convergence is read from a (count, xxhash64-sum) pair on
    the materialized edge set (count + xxhash64 XOR); a false "stable"
    verdict needs a 64-bit
    hash collision between successive DISTINCT edge sets of equal
    size — negligible against any realistic failure mode.

    ``shuffle_partitions`` scopes the per-round shuffle width to the pair
    graph's size for the duration of the loop: near-dup graphs are orders
    of magnitude smaller than the corpus, and a batch-sized shuffle width
    pays fixed per-partition overhead every round.

    ``driver_threshold``: edge sets at or below this size (measured from
    the already-materialized distinct edge set — one cheap scalar) run a
    driver-side union-find instead of the iterative loop. The verified
    near-dup pair graph is typically orders of magnitude smaller than the
    corpus (256 pairs at sf0.1 here), and every distributed round costs
    2 shuffles + a checkpoint + a convergence job of pure fixed overhead
    — path-halving union-find on ≤10⁶ pairs (≈16 MB collected) is
    microseconds. Same min-id-root output, bit for bit; set 0 to force
    the distributed path (the regression tests do).

    The round count of the last call is exposed as
    ``connected_components.last_rounds`` (observability + the O(log n)
    regression test)."""
    from fink_science_spark.streaming.shell import scoped_shuffle_partitions

    if shuffle_partitions is not None:
        spark = edges.sparkSession
        with scoped_shuffle_partitions(spark, shuffle_partitions):
            return connected_components(
                edges, src, dst, max_iter, None, driver_threshold
            )

    # materialize the narrow (u, v) projection ONCE, self-loops included:
    # everything below (node set, canonical edge set, the loop, the final
    # join) derives from this checkpoint, so the upstream pair pipeline —
    # typically a full LSH candidate generation — is evaluated exactly
    # once instead of once per consumer (nodes used to read the raw
    # `edges` plan and re-ran the whole pipeline a second time)
    base = edges.select(
        F.greatest(F.col(src), F.col(dst)).alias("u"),
        F.least(F.col(src), F.col(dst)).alias("v"),
    ).localCheckpoint(eager=True)
    nodes = (
        base.select(F.col("u").alias("node"))
        .unionByName(base.select(F.col("v").alias("node")))
        .distinct()
    )
    e = (
        base.filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    if e.count() <= driver_threshold:
        rows = e.collect()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])  # path halving
                x = parent[x]
            return x

        for r in rows:
            ra, rb = find(r["u"]), find(r["v"])
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra  # union by min ⇒ every root is its set's min
        seen = {x for r in rows for x in (r["u"], r["v"])}
        connected_components.last_rounds = 0
        roots = edges.sparkSession.createDataFrame(
            [(x, find(x)) for x in sorted(seen)], "node long, __root long"
        )
        return nodes.join(roots, "node", "left").select(
            "node", F.coalesce("__root", F.col("node")).alias("component")
        )

    prev: tuple | None = None
    converged = False
    for rounds in range(1, max_iter + 1):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        row = e.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).first()
        cur = (row["n"], row["h"])
        if cur == prev:
            converged = True
            break
        prev = cur
    connected_components.last_rounds = rounds
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(star contraction not yet stable)"
        )

    # e is now a star set: (node, root) for every non-root node.
    return nodes.join(
        e.select(F.col("u").alias("node"), F.col("v").alias("__root")),
        "node",
        "left",
    ).select(
        "node", F.coalesce("__root", F.col("node")).alias("component")
    )
