"""Cross-engine deterministic hashing.

The engine needs hashes that are (a) computable JVM-side in Spark (no
Python in the hot path) and (b) reproducible in DuckDB for the driver's
oracle harness and in pure Python for the reference-semantics simulator.

Spark's ``xxhash64``/``hash`` (murmur3) have no DuckDB equivalent, so the
oracle-checked operators use an md5-prefix hash instead: take the first 15
hex chars of md5 (60 bits, always non-negative, fits int64):

  Spark : CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)
  DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT
  Python: int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

Verified identical across all three (see tests/test_xhash.py).

Engine-internal hashes that never need the oracle (bloom keys, bucket/salt
assignment) use the native ``xxhash64``/``hash`` — faster, codegen'd.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

MD5_PREFIX_HEX_CHARS = 15  # 60 bits < 63 → always a valid positive BIGINT


def md5_64(col: Column | str) -> Column:
    """60-bit integer hash of a string column, DuckDB/Python-reproducible."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, MD5_PREFIX_HEX_CHARS), 16, 10).cast("bigint")


def md5_64_sql(expr: str) -> str:
    """DuckDB SQL for the same hash (expr is a SQL string expression)."""
    return f"(('0x' || substr(md5({expr}), 1, {MD5_PREFIX_HEX_CHARS}))::BIGINT)"


def md5_64_py(s: str) -> int:
    """Pure-Python same hash — used by the crawl-semantics simulator."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:MD5_PREFIX_HEX_CHARS], 16)


def bucket_of(col: Column | str, n_buckets: int) -> Column:
    """Engine-internal bucket assignment: murmur3 via F.hash, non-negative."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.hash(c), F.lit(n_buckets)).cast("int")


def url_hash(col: Column | str) -> Column:
    """Engine-internal 64-bit URL hash for the seen-set: xxhash64."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c)
