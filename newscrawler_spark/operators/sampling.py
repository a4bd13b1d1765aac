"""Deterministic corpus sampling and training-shard layout.

Every large-corpus pipeline ends with three sampling-shaped steps:
down-sampling strata to a target mixture (rate-based), balancing strata
to an exact per-stratum count (quota-based), and writing the final
corpus as pseudo-randomly shuffled shards for sequential training reads.
All three are implemented here as hash-driven, fully deterministic
DataFrame ops — rerunning on the same input yields byte-identical
output, which is what makes corpus builds auditable and resumable.

100 TB shape:
  * rate sampling is a stateless filter (hash < threshold) — no
    shuffle at all, embarrassingly parallel, prunes at the scan;
  * exact-k-per-stratum uses one window per stratum ordered by a
    64-bit hash; the partition is a stratum, which in a mixture
    pipeline is bounded by design (salt the window with the same
    two-stage pre-cap as operators/scheduling.py if a stratum is
    huge relative to k);
  * shard layout is a hash-partition + one window per shard for
    positions — exactly the shuffle a training-data writer pays to
    produce shard files, no extra passes.

Hashes are md5_64 (xhash.py) with distinct domain-separation prefixes
("smp:", "bal:", "shard:", "pos:"), so the three operators' decisions
are mutually independent and each is reproducible in DuckDB and Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..xhash import md5_64

RATE_DENOM = 10_000  # basis points
N_SHARDS = 32


def stratified_rates(docs: DataFrame, stratum_col: str = "source") -> DataFrame:
    """A deterministic per-stratum rate table (stratum, rate_bp): the
    demo mixture derives each stratum's keep-rate in basis points from
    the stratum name (500..9499 bp).  Production would pass a curated
    mixture table instead — the sampler only needs (stratum, rate_bp).
    """
    return (
        docs.select(F.col(stratum_col).alias("stratum"))
        .distinct()
        .select(
            "stratum",
            (
                F.lit(500)
                + F.pmod(md5_64(F.concat(F.lit("rate:"), F.col("stratum"))), F.lit(9000))
            ).cast("int").alias("rate_bp"),
        )
    )


def sample_stratified(
    docs: DataFrame,
    rates: DataFrame,
    id_col: str = "doc_id",
    stratum_col: str = "source",
) -> DataFrame:
    """Rate-based stratified sampling: keep a row iff
    md5_64("smp:" || id) mod 10000 < its stratum's rate_bp.

    The rate table is KB-scale → broadcast; the keep decision is a
    per-row hash compare — no shuffle, fully scan-parallel, and stable
    under corpus growth (a kept row stays kept when new rows arrive).
    Returns (id, stratum, rate_bp, bucket) for kept rows.
    """
    bucket = F.pmod(
        md5_64(F.concat(F.lit("smp:"), F.col(id_col).cast("string"))),
        F.lit(RATE_DENOM),
    ).cast("int")
    return (
        docs.select(
            F.col(id_col), F.col(stratum_col).alias("stratum")
        )
        .join(F.broadcast(rates), "stratum")
        .withColumn("bucket", bucket)
        .filter(F.col("bucket") < F.col("rate_bp"))
        .select(id_col, "stratum", "rate_bp", "bucket")
    )


def sample_balanced(
    docs: DataFrame,
    id_col: str = "doc_id",
    stratum_col: str = "source",
    k: int | None = None,
) -> DataFrame:
    """Quota sampling: exactly k rows per stratum, chosen by hash order
    (a deterministic 'random' draw).  With k=None the quota is the
    smallest stratum's size — full balance, the downsample-to-min
    mixture used for source-balanced eval slices.

    Returns (id, stratum, draw_rank).
    """
    base = docs.select(F.col(id_col), F.col(stratum_col).alias("stratum"))
    if k is None:
        counts = base.groupBy("stratum").agg(F.count(F.lit(1)).alias("n"))
        k_col = counts.agg(F.min("n").cast("long").alias("k_min"))
        base = base.crossJoin(F.broadcast(k_col))
        quota = F.col("k_min")
    else:
        quota = F.lit(k)
    h = md5_64(F.concat(F.lit("bal:"), F.col(id_col).cast("string")))
    w = Window.partitionBy("stratum").orderBy(h.asc(), F.col(id_col).asc())
    return (
        base.withColumn("draw_rank", F.row_number().over(w))
        .filter(F.col("draw_rank") <= quota)
        .select(id_col, "stratum", F.col("draw_rank").cast("int").alias("draw_rank"))
    )


def shuffle_shards(
    docs: DataFrame, n_shards: int = N_SHARDS, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic pseudo-random shard layout for training reads:
    shard = md5_64("shard:" || id) mod n_shards, position within the
    shard by a second independent hash.  Sequentially reading shard
    files in position order IS a uniform shuffle of the corpus — no
    training-time shuffle buffer needed.

    Returns (id, shard, pos).  A writer would follow with
    ``.repartition(n_shards, "shard").sortWithinPartitions("pos")`` —
    one shuffle, the minimum any shuffled-shard writer pays.
    """
    sid = F.col(id_col).cast("string")
    shard = F.pmod(md5_64(F.concat(F.lit("shard:"), sid)), F.lit(n_shards)).cast("int")
    pos_h = md5_64(F.concat(F.lit("pos:"), sid))
    w = Window.partitionBy("shard").orderBy(pos_h.asc(), F.col(id_col).asc())
    return (
        docs.select(F.col(id_col))
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("int"))
    )


def write_shards(
    docs: DataFrame,
    path: str,
    n_shards: int = N_SHARDS,
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize the shuffled-shard layout: one parquet file per
    shard, rows in shard-position order — the exact file set a training
    loader consumes for sequential-read shuffled epochs.

    Exactly ONE shuffle (repartition on the shard id); the in-shard
    order comes free from sortWithinPartitions.  partitionBy('shard')
    keeps shard membership explicit in the directory layout, so a
    loader maps shard->worker without reading footers.  The layout is a
    pure function of the ids: re-running on the same corpus writes
    byte-identical shard contents (resume/audit-safe).

    Returns the frame that was written (one row per input row, every
    input column preserved plus shard/pos).  The layout columns are
    computed INLINE on the full rows (same hashes as shuffle_shards)
    rather than joined back — no self-join, the only exchanges are the
    position window and the writer's shard repartition.
    """
    sid = F.col(id_col).cast("string")
    shard = F.pmod(md5_64(F.concat(F.lit("shard:"), sid)), F.lit(n_shards)).cast("int")
    pos_h = md5_64(F.concat(F.lit("pos:"), sid))
    w = Window.partitionBy("shard").orderBy(pos_h.asc(), F.col(id_col).asc())
    out = (
        docs.withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("int"))
    )
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    return out
