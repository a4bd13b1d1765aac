"""newscrawler_spark — a PySpark-native URL-frontier + politeness-scheduler
analytics engine with the query/data-processing capabilities of the reference
crawler collection (NanmiCoder/NewsCrawler, studied read-only at
/root/reference).

This is NOT a port: the reference is a single-process, per-URL imperative
crawler; this engine is a table-at-a-time Spark pipeline.  The reference
supplies three things (see SURVEY.md):

  * the data contract — documents as interleaved text+media span sequences
    (``doc_id``, ``spans: array<struct<kind,text,media_ref,offset>>``);
  * the crawl semantics — URL canonicalization / article ids, retry,
    per-domain politeness budgets, deterministic crawl ordering,
    seen-set idempotence;
  * the extraction semantics — HTML -> span sequence per platform dialect.

Layout:
  schema.py      — every table schema (frontier, docs, url_seen, budgets, ...)
  session.py     — SparkSession factory tuned for this engine
  xhash.py       — cross-engine deterministic hashing (Spark <-> DuckDB parity)
  canonical.py   — URL canonicalization + platform detection (pure expressions)
  synth.py       — deterministic synthetic web, generated JVM-side (scales)
  operators/     — dedup, scheduling, seen-set, similarity, textstats, ...
  sources/       — fetch stage, parquet-manifest catalog (Iceberg-style seam)
  functions/     — pandas-UDF extraction dialects (stdlib html.parser inside)
  plans/         — crawl-round pipeline + resumable round scheduler
  oracle/        — pure-Python single-threaded reference-semantics simulator
"""

__version__ = "0.1.0"
