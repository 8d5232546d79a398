"""Portable deterministic hashing — the foundation of the dedup family.

Every hash here is derived from md5, which both Spark and standard SQL
engines (the duckdb correctness oracle included) implement identically, so
MinHash/SimHash signatures are bit-for-bit reproducible outside Spark.
We take the first 15 hex digits (60 bits) so the value always fits a
signed BIGINT in any engine.

Spark's builtin ``hash()`` (Murmur3) and ``xxhash64`` are faster but
engine-specific; swap :func:`hash64` for them when oracle portability is
not needed (e.g. production LSH at 100 TB) — the operator structure is
unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_HEX_DIGITS = 15  # 60 bits < 63 → always a valid signed BIGINT


def hash64(col: Column | str, seed: str = "") -> Column:
    """60-bit deterministic hash of a string column (md5-derived)."""
    c = F.col(col) if isinstance(col, str) else col
    if seed:
        c = F.concat(F.lit(seed + ":"), c)
    return F.conv(F.substring(F.md5(c), 1, HASH_HEX_DIGITS), 16, 10).cast("long")


def hash64_sql(expr: str, seed: str = "") -> str:
    """The duckdb-oracle-equivalent SQL text of :func:`hash64`."""
    inner = f"'{seed}:' || {expr}" if seed else expr
    return f"('0x' || substr(md5({inner}), 1, {HASH_HEX_DIGITS}))::BIGINT"


def minhash_signature(tokens: Column | str, num_hashes: int = 16) -> Column:
    """MinHash signature: array of ``num_hashes`` minima of seeded hashes
    over the token/shingle array. Entirely JVM-side (transform + array_min);
    cost is O(num_hashes * |tokens|) per row with no shuffle."""
    t = F.col(tokens) if isinstance(tokens, str) else tokens

    def hasher(i):
        # NB: a plain closure, not a default arg — PySpark interprets a
        # second lambda parameter as the array-index argument.
        return lambda x: hash64(x, seed=f"mh{i}")

    return F.array(
        *[F.array_min(F.transform(t, hasher(i))) for i in range(num_hashes)]
    )


def minhash_sql(tokens_expr: str, num_hashes: int = 16) -> str:
    """duckdb equivalent of :func:`minhash_signature` (a LIST expression)."""
    mins = ",\n      ".join(
        f"list_min(list_transform({tokens_expr}, x -> {hash64_sql('x', seed=f'mh{i}')}))"
        for i in range(num_hashes)
    )
    return f"[{mins}]"


def simhash64(tokens: Column | str, bits: int = 64) -> Column:
    """SimHash: per bit position, majority vote of token-hash bits; packed
    into one BIGINT. Unit weights. Pure column expressions (aggregate over
    the token array), no Python.

    Note bit 63 is excluded when bits=64 would overflow signed range; we
    default to the low 60 bits of the md5-derived hash anyway.
    """
    t = F.col(tokens) if isinstance(tokens, str) else tokens
    bits = min(bits, 60)
    hashed = F.transform(t, lambda x: hash64(x))

    def voter(j):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_cols = []
    for j in range(bits):
        # sum over tokens of +1/-1 depending on bit j
        vote = F.aggregate(hashed, F.lit(0), voter(j))
        bit_cols.append(
            F.when(vote > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bit_cols[0]
    for b in bit_cols[1:]:
        out = out.bitwiseOR(b)
    return out


def simhash_sql(tokens_expr: str, bits: int = 64) -> str:
    """duckdb equivalent of :func:`simhash64`."""
    bits = min(bits, 60)
    h = hash64_sql("x")
    terms = []
    for j in range(bits):
        vote = (
            f"list_sum(list_transform({tokens_expr}, "
            f"x -> CASE WHEN (({h}) >> {j}) & 1 = 1 THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN ({vote}) > 0 THEN (1::BIGINT << {j}) ELSE 0 END)")
    return "(" + " | ".join(terms) + ")"


def simhash_sql_hashed(hashed_expr: str, bits: int = 64) -> str:
    """duckdb equivalent of :func:`simhash64` over a PRE-HASHED token list
    (each element already a 60-bit hash). Avoids re-running md5 per bit —
    use ``list_transform(toks, x -> {hash64_sql('x')})`` once in a CTE."""
    bits = min(bits, 60)
    terms = []
    for j in range(bits):
        vote = (
            f"list_sum(list_transform({hashed_expr}, "
            f"h -> CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN ({vote}) > 0 THEN (1::BIGINT << {j}) ELSE 0 END)")
    return "(" + " | ".join(terms) + ")"


def hamming_distance(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two packed-bit BIGINT signatures."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.bit_count(ca.bitwiseXOR(cb))
