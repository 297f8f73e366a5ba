"""Cross-engine deterministic 60-bit hashing.

MinHash / SimHash / LSH need a hash function that is IDENTICAL in Spark and
in the DuckDB oracle. Neither engine's native hash() is portable, so we use
md5 (bit-identical everywhere) and take the first 15 hex digits = 60 bits,
which fits a signed BIGINT in both engines:

  Spark : CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)
  DuckDB: CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)

(verified equal, e.g. h64('abc') = 648541476951500027 in both).

md5-per-row is pricier than murmur3 but stays JVM-side in Spark (built-in
expression, whole-stage codegen) — no Python in the hot path. At 100 TB the
hash cost is dwarfed by the shuffle it feeds.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BITS = 60


def h64(c: Column) -> Column:
    """Portable 60-bit hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h64_sql(expr: str) -> str:
    """Portable 60-bit hash of a string expression (DuckDB oracle side)."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


# --- universal-hash permutation family over the 60-bit space --------------
#
# MinHash needs K independent permutations per shingle. K md5 calls per
# shingle row is K× the string-hash cost; instead hash ONCE with h64 and
# derive each permutation with a Carter-Wegman-style integer hash
#
#   perm_k(h) = (a1_k * hi(h) + a2_k * lo(h) + b_k) mod M,   M = 2^61 - 1
#
# where hi/lo split h into two 30-bit halves so every product fits a signed
# 64-bit integer in BOTH engines (DuckDB raises on BIGINT overflow — no
# wraparound to hide behind). Coefficients are md5-seeded constants < 2^30,
# inlined as literals on both sides.

PERM_MOD = (1 << 61) - 1
_LO_MASK = (1 << 30) - 1


def perm_coeffs(k: int) -> tuple[int, int, int]:
    """Deterministic (a1, a2, b) for permutation k, each < 2^30."""
    import hashlib

    d = hashlib.md5(f"perm:{k}".encode()).hexdigest()
    a1 = int(d[0:8], 16) % (1 << 30) or 1
    a2 = int(d[8:16], 16) % (1 << 30) or 1
    b = int(d[16:24], 16) % (1 << 30)
    return a1, a2, b


def perm_hash(h: Column, k: int) -> Column:
    """k-th permuted value of a 60-bit hash column (Spark side)."""
    a1, a2, b = perm_coeffs(k)
    hi = F.shiftright(h, 30)
    lo = h.bitwiseAND(F.lit(_LO_MASK))
    return (F.lit(a1) * hi + F.lit(a2) * lo + F.lit(b)) % F.lit(PERM_MOD)


def perm_hash_sql(expr: str, k: int) -> str:
    """k-th permuted value of a 60-bit hash expression (DuckDB side)."""
    a1, a2, b = perm_coeffs(k)
    return f"(({a1} * (({expr}) >> 30) + {a2} * (({expr}) & {_LO_MASK}) + {b}) % {PERM_MOD})"


# --- polynomial character-gram hash ---------------------------------------
#
# Fingerprinting hashes EVERY character n-gram of every document — an md5
# per gram makes the string hash the whole stage's cost. A fixed-width
# polynomial hash over the gram's code points is ~an order of magnitude
# cheaper and exactly mirrorable: per position i a 40-bit md5-seeded
# coefficient Ci, hash = Σ (Ci * codepoint_i) mod M folded pairwise so no
# intermediate exceeds 62 bits (DuckDB errors on BIGINT overflow).


def gram_coeffs(n: int) -> list[int]:
    """Deterministic 40-bit coefficients for an n-position gram hash."""
    import hashlib

    out = []
    for i in range(n):
        d = hashlib.md5(f"gram:{i}".encode()).hexdigest()
        out.append(int(d[:10], 16) or 1)
    return out


def gram_hash_sql(expr: str, n: int) -> str:
    """Polynomial n-gram hash (DuckDB oracle side) — same fold order."""
    acc = "0"
    for i, c in enumerate(gram_coeffs(n)):
        term = f"(({c} * ascii(substr({expr}, {i + 1}, 1))) % {PERM_MOD})"
        acc = f"(({acc} + {term}) % {PERM_MOD})"
    return acc
