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


HASH28_HEX_DIGITS = 7  # 28 bits: (2^28-1) * (2^28-1 multiplier) + b < 2^63

MINHASH_PRIME = 268435399  # largest prime < 2^28 — permutation modulus


def hash28(col: Column | str, seed: str = "") -> Column:
    """28-bit deterministic hash of a string column (md5-derived) — the
    MinHash base hash. 28 bits so affine permutations ``a*h + b`` stay
    inside a signed 64-bit integer in every engine."""
    c = F.col(col) if isinstance(col, str) else col
    if seed:
        c = F.concat(F.lit(seed + ":"), c)
    return F.conv(F.substring(F.md5(c), 1, HASH28_HEX_DIGITS), 16, 10).cast("long")


def hash28_sql(expr: str, seed: str = "") -> str:
    """The duckdb-oracle-equivalent SQL text of :func:`hash28`."""
    inner = f"'{seed}:' || {expr}" if seed else expr
    return f"('0x' || substr(md5({inner}), 1, {HASH28_HEX_DIGITS}))::BIGINT"


def minhash_perm_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic affine-permutation coefficients (a_i, b_i) for MinHash,
    md5-derived so any engine (and any re-run) generates the same family."""
    import hashlib

    coeffs = []
    for i in range(num_hashes):
        a = int(hashlib.md5(f"mh-a{i}".encode()).hexdigest()[:7], 16)
        b = int(hashlib.md5(f"mh-b{i}".encode()).hexdigest()[:7], 16)
        coeffs.append((a % (MINHASH_PRIME - 1) + 1, b % MINHASH_PRIME))
    return coeffs


def minhash_from_hashed(hashed: Column | str, num_hashes: int = 16) -> Column:
    """MinHash signature from a PRE-HASHED token array (array<long> of
    :func:`hash28` values): sig_i = min over tokens of (a_i*h + b_i) mod p.

    One md5 pass per token (done by the caller, materialized as a real
    column so CollapseProject cannot re-inline it), then ``num_hashes``
    cheap multiply-add folds — O(num_hashes * |tokens|) integer ops per
    row, no shuffle, no Python."""
    t = F.col(hashed) if isinstance(hashed, str) else hashed

    def perm(a, b):
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME)

    return F.array(
        *[
            F.array_min(F.transform(t, perm(a, b)))
            for (a, b) in minhash_perm_coeffs(num_hashes)
        ]
    )


def minhash_sql_hashed(hashed_expr: str, num_hashes: int = 16) -> str:
    """duckdb equivalent of :func:`minhash_from_hashed` (a LIST expression
    over a pre-hashed token list)."""
    mins = ",\n      ".join(
        f"list_min(list_transform({hashed_expr}, "
        f"h -> ({a} * h + {b}) % {MINHASH_PRIME}))"
        for (a, b) in minhash_perm_coeffs(num_hashes)
    )
    return f"[{mins}]"


def simhash_from_hashed(hashed: Column | str, bits: int = 64) -> Column:
    """SimHash from a PRE-HASHED token array (array<long> of :func:`hash64`
    values): per bit position, majority vote of token-hash bits; packed into
    one BIGINT. Unit weights. Pure column expressions, no Python.

    The caller materializes the hashed array as a real column — higher-order
    functions are interpreted (no codegen), so an inline md5-transform
    subexpression would be re-evaluated once per bit position (60×).

    Note bit 63 is excluded when bits=64 would overflow signed range; we
    default to the low 60 bits of the md5-derived hash anyway.
    """
    t = F.col(hashed) if isinstance(hashed, str) else hashed
    bits = min(bits, 60)

    def voter(j):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_cols = []
    for j in range(bits):
        # sum over tokens of +1/-1 depending on bit j
        vote = F.aggregate(t, F.lit(0), voter(j))
        bit_cols.append(
            F.when(vote > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bit_cols[0]
    for b in bit_cols[1:]:
        out = out.bitwiseOR(b)
    return out


def simhash64(tokens: Column | str, bits: int = 64) -> Column:
    """SimHash of a raw token array. Convenience wrapper that hashes inline;
    prefer materializing ``transform(tokens, hash64)`` as a column and
    calling :func:`simhash_from_hashed` in hot paths (see that docstring)."""
    t = F.col(tokens) if isinstance(tokens, str) else tokens
    return simhash_from_hashed(F.transform(t, lambda x: hash64(x)), bits)


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
