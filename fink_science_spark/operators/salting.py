"""Salted equi-join — the manual remedy for shuffle-key skew.

A shuffle join on a low-cardinality or heavy-hitter key sends every row
of a hot key to one reducer. Salting splits each hot key into
``salt_buckets`` sub-keys: the large (skewed) side gets a deterministic
salt derived from a unique column; the small side is replicated once per
salt value; the join runs on (key, salt) — identical results, and every
reducer handles at most 1/B of a hot key.

When to use WHICH remedy, in order:
1. broadcast the small side (no shuffle at all) — the default here;
2. AQE skew-join splitting (`spark.sql.adaptive.skewJoin`) — automatic,
   but only splits post-shuffle partitions of sort-merge joins;
3. explicit salting (this operator) — when the small side is too big to
   broadcast AND the skew is in the join key itself (e.g. joining a
   100 TB event stream to a per-category table on a 4-value category).

The salt is deterministic (hash of a caller-named unique column), so
results are stable run-to-run — required by the differential oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_equi_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    unique_col: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on ``on`` with salt-spread shuffle keys.

    ``unique_col`` is any column of the large side with per-row-distinct
    values (an id); the salt is ``pmod(hash(unique_col), salt_buckets)``.
    The small side is replicated ``salt_buckets``× (explode of a literal
    sequence — cheap relative to the large side's shuffle). Join output
    equals the unsalted join exactly — for join types that preserve the
    large side only: an unmatched SMALL-side row exists once per salt
    copy, so right/full/right_semi/right_anti outputs would multiply it
    ``salt_buckets``×; those types are rejected rather than silently
    wrong (de-salt the small side with a post-join dedup if you need
    them)."""
    norm = how.replace("_", "").lower()
    if norm in {"right", "rightouter", "full", "outer", "fullouter"}:
        raise ValueError(
            f"salted_equi_join: how={how!r} would emit unmatched "
            f"small-side rows once per salt copy ({salt_buckets}×); "
            "use the unsalted join or dedup the small side afterwards"
        )
    salt = F.pmod(F.hash(F.col(unique_col)), F.lit(salt_buckets))
    l = large.withColumn("__salt", salt)
    r = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return l.join(r, [*on, "__salt"], how).drop("__salt")
