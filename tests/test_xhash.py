"""Cross-engine hash parity: Spark == DuckDB == pure Python."""

import duckdb
from pyspark.sql import functions as F

from newscrawler_spark.xhash import md5_64, md5_64_py, md5_64_sql

SAMPLES = ["abc", "", "https://www.toutiao.com/article/74x/", "日本語テキスト", "a" * 500]


def test_md5_64_three_way(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["s"])
    got_spark = [r[0] for r in df.select(md5_64("s")).collect()]
    con = duckdb.connect()
    got_duck = [con.execute(f"select {md5_64_sql('?')}", [s]).fetchone()[0] for s in SAMPLES]
    got_py = [md5_64_py(s) for s in SAMPLES]
    assert got_spark == got_duck == got_py
    assert all(h >= 0 for h in got_py)


def test_md5_64_is_stable(spark):
    df = spark.createDataFrame([("abc",)], ["s"])
    assert df.select(md5_64("s")).collect()[0][0] == 648541476951500027
