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
