"""Table schemas for the engine (see SURVEY.md §1, FIXTURES.md).

The docs/spans shape is the authoritative input contract from
BASELINE.json `input_hint`:
  (doc_id:string, spans:array<struct<kind:string,text:string,
                                     media_ref:string,offset:int32>>)

Reference provenance (data model studied, not ported):
  ContentItem  -> span struct        /root/reference/news_crawler/core/models.py:47-52
  NewsMetaInfo -> meta struct        /root/reference/news_crawler/core/models.py:55-61
  NewsItem     -> docs row           /root/reference/news_crawler/core/models.py:64-98
  FetchRequest -> frontier row       /root/reference/news_crawler/core/fetchers.py:11-24
  APIKeyPool   -> budgets table      /root/reference/video_crawler/pixabay/common/base.py:13-79
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Span / document — the canonical output contract
# ---------------------------------------------------------------------------

SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),       # text | image | video
        T.StructField("text", T.StringType(), True),        # payload for text spans
        T.StructField("media_ref", T.StringType(), True),   # URL for image/video spans
        T.StructField("offset", T.IntegerType(), False),    # 0-based document order
    ]
)

META = T.StructType(
    [
        T.StructField("author_name", T.StringType(), True),
        T.StructField("author_url", T.StringType(), True),
        # publish_time stays a string: the reference never parses it to a
        # uniform timestamp (ISO at bbc_news.py:96-97 vs '%Y-%m-%d %H:%M'
        # at wechat_news.py:530-533)
        T.StructField("publish_time", T.StringType(), True),
    ]
)

DOCS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("subtitle", T.StringType(), True),
        T.StructField("news_url", T.StringType(), True),
        T.StructField("platform", T.StringType(), True),
        T.StructField("meta", META, True),
        # lineage (engine-added): which crawl round / partition produced this row
        T.StructField("round", T.IntegerType(), True),
        T.StructField("domain_bucket", T.IntegerType(), True),
        T.StructField("source_seed", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Frontier — the scheduler input/output (one row per candidate fetch)
# ---------------------------------------------------------------------------

FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("domain", T.StringType(), True),
        T.StructField("priority", T.IntegerType(), False),  # lower = sooner
        T.StructField("depth", T.IntegerType(), False),     # 0 for seeds
        T.StructField("seq", T.LongType(), False),          # deterministic tie-break
        T.StructField("round_added", T.IntegerType(), False),
        T.StructField("attempt", T.IntegerType(), False),   # retry counter (<=3)
        T.StructField("source_seed", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Synthetic web (offline fetch oracle) — FIXTURES.md §3
# ---------------------------------------------------------------------------

PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("html", T.StringType(), True),
        T.StructField("out_links", T.ArrayType(T.StringType()), True),
    ]
)

# ---------------------------------------------------------------------------
# URL-seen state + bloom sidecar
# ---------------------------------------------------------------------------

URL_SEEN = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),     # xxhash64(canonical)
        T.StructField("bucket", T.IntegerType(), False),    # pmod(hash, n_buckets)
        T.StructField("canonical_url", T.StringType(), False),
        T.StructField("round_seen", T.IntegerType(), False),
    ]
)

BLOOM = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("bitset", T.BinaryType(), False),
        T.StructField("n_items", T.LongType(), False),
    ]
)

# cuckoo-filter sidecar (operators/cuckoo.py — the north star's other
# URL-seen filter kind; same per-bucket layout as BLOOM)
CUCKOO = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("table", T.BinaryType(), False),
        T.StructField("n_rows", T.IntegerType(), False),
        T.StructField("stash", T.ArrayType(T.LongType()), True),
        T.StructField("n_items", T.LongType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Politeness state — budgets & robots (FIXTURES.md §5)
# ---------------------------------------------------------------------------

BUDGETS = T.StructType(
    [
        T.StructField("domain", T.StringType(), False),
        T.StructField("capacity", T.IntegerType(), False),   # fetches per round
        T.StructField("window_s", T.IntegerType(), True),
        T.StructField("reset_ts", T.DoubleType(), True),
    ]
)

ROBOTS = T.StructType(
    [
        T.StructField("domain", T.StringType(), False),
        T.StructField("path_prefix", T.StringType(), False),
        T.StructField("allow", T.BooleanType(), False),
        T.StructField("crawl_delay_s", T.DoubleType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Quarantine + metrics (per-row failure isolation, round counters — §3.3)
# ---------------------------------------------------------------------------

QUARANTINE = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("attempt", T.IntegerType(), True),
    ]
)

METRICS = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("scheduled", T.LongType(), False),
        T.StructField("docs", T.LongType(), False),
        T.StructField("quarantined", T.LongType(), False),
        T.StructField("new_seen", T.LongType(), False),
        T.StructField("frontier_next", T.LongType(), False),
    ]
)

SPAN_DDL = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
