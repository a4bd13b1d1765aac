"""Catalog maintenance: compaction (Iceberg rewrite_data_files analog)
and snapshot expiration — reads must be equivalent before/after, time
travel must keep working on unexpired deltas and fail loudly on expired
ones."""

import pytest
from pyspark.sql import functions as F

from newscrawler_spark.sources.catalog import Catalog


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(tmp_path / "cat")
    for r in range(4):
        df = spark.range(r * 100, r * 100 + 100).select(
            F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
            F.lit(r).alias("round"),
            (F.col("id") % 7).alias("payload"),
        )
        c.write_delta(df, "docs", r)
        c.commit_round(r, {"docs": 100})
    return c


def _rows(df):
    return {(r.doc_id, r.round, r.payload) for r in df.collect()}


def test_compact_is_read_equivalent(spark, cat):
    before = _rows(cat.read_table(spark, "docs"))
    n = cat.compact_table(spark, "docs", upto_round=2)
    assert n == 300
    after = _rows(cat.read_table(spark, "docs"))
    assert before == after
    # the read now uses 1 compacted path + 1 tail delta
    assert len(cat._delta_paths("docs", 3)) == 2


def test_time_travel_below_horizon_before_expiry(spark, cat):
    cat.compact_table(spark, "docs", upto_round=2)
    # deltas still on disk — time travel to round 1 still works
    tt = cat.read_table(spark, "docs", upto_round=1)
    assert tt.count() == 200
    assert {r.round for r in tt.select("round").distinct().collect()} == {0, 1}


def test_expire_then_time_travel_raises(spark, cat):
    cat.compact_table(spark, "docs", upto_round=2)
    removed = cat.expire_rounds("docs")
    assert removed == 3
    # full read still fine (compacted snapshot + tail)
    assert cat.read_table(spark, "docs").count() == 400
    # but time travel below the horizon now fails loudly
    with pytest.raises(ValueError, match="expired"):
        cat.read_table(spark, "docs", upto_round=1)


def test_recompact_later_supersedes(spark, cat):
    cat.compact_table(spark, "docs", upto_round=1)
    cat.expire_rounds("docs")
    n = cat.compact_table(spark, "docs", upto_round=3)
    assert n == 400
    assert cat.read_table(spark, "docs").count() == 400
    # one compacted path only; old snapshot dir superseded and removed
    paths = cat._delta_paths("docs", 3)
    assert len(paths) == 1 and "compact_upto=3" in paths[0]


def test_non_compactable_table_rejected(spark, cat):
    with pytest.raises(ValueError, match="not compactable"):
        cat.compact_table(spark, "frontier")
