"""One crawl round — the engine's core physical plan (SURVEY.md §4):

  frontier_n
    → canonicalize (X1/F1/F2)            [staged JVM exprs]
    → within-round first-wins dedup       [window over canonical_url]
    → bloom probe + exact anti-join (J4)  [prune, then confirm]
    → robots gate (broadcast)             [deny → quarantine, seen]
    → budget gate (A5/A6)                 [rank ≤ cap; rest deferred]
    → salt + repartition (skew)           [fetch locality]
    → fetch (U3)                          [fixture join or mapInPandas]
    → extract (U1, pandas UDF)            [interleaved spans]
    → validate (F3)                       [empty/invalid → quarantine]
    → deltas: docs, round_log (seen ∪ order ∪ quarantine, one write),
      frontier_{n+1} = deferred ∪ discovered out-links

Seen-set semantics (the contract the simulator oracle also implements):
a canonical URL becomes *seen* the round it is scheduled (eligible after
the budget gate) or robots-denied/unsupported (terminal without fetch).
Deferred rows are not seen — they re-compete next round.  Retries happen
*inside* the fetch stage (tenacity-style, base.py:73-78), never across
rounds, so every scheduled URL reaches a terminal state in its round.

Determinism: every derived value is a pure function of (url, round,
config) — discovered rows get seq = md5_64(url), so two cluster sizes
(or a killed+resumed run) produce identical frontiers and orderings.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..canonical import with_url_identity
from ..operators.scheduling import apply_robots, budget_gate, dedup_within_round
from ..operators.seen import filter_unseen
from ..xhash import md5_64

FRONTIER_COLS = [
    "url", "domain", "priority", "depth", "seq", "round_added", "attempt",
    "source_seed",
]


@dataclass
class RoundConfig:
    n_buckets: int = 64
    m_bits: int = 1 << 20
    n_partitions: int = 32
    salt_factor: int = 8
    max_depth: int = 10
    # URL-seen sidecar kind: "bloom" (OR-mergeable bitsets) or "cuckoo"
    # (deletable fingerprint tables, operators/cuckoo.py).  Prune-only
    # either way — crawl results are identical by construction (tested).
    seen_filter: str = "bloom"
    # cuckoo sizing: fingerprint slots reserved per hash bucket
    cuckoo_capacity: int = 1 << 16
    # per-round incremental dedup: check each round's new docs against
    # the accumulated corpus LSH index (dedup.incremental_neardup) and
    # write neardup/dedup_index/dedup_sigs deltas
    dedup_docs: bool = False
    dedup_min_common: int = 3
    # hot-bucket cutoff for the per-round probe (see
    # dedup.incremental_neardup) — boilerplate band keys shared by more
    # docs than this are skipped, keeping the probe O(batch) even on
    # template-heavy corpora
    dedup_bucket_cap: int = 128
    # opt-in crawl-trap guard (operators/webgraph.py::trap_detect):
    # domains whose PRE-dedup URL shape this round matches the
    # explosion signature are quarantined wholesale as `trap_denied`
    trap_guard: bool = False
    # opt-in AIMD politeness budgets (operators/profiling.py::
    # adaptive_budget): each round's fetch outcomes update the budget
    # table, which is persisted as a per-round `budgets` delta — crawl
    # STATE, so a killed run resumes with the evolved capacities and
    # reproduces the uninterrupted run bit-identically
    adaptive_budgets: bool = False
    trap_min_urls: int = 100


@dataclass
class RoundResult:
    docs: DataFrame
    # unified seen ∪ order ∪ quarantine log, discriminated by `kind` —
    # ONE write job per round instead of three (catalog.write_round_log;
    # `round` is carried by the delta path, not a data column)
    round_log: DataFrame
    frontier_next: DataFrame
    counters: dict  # filled by the scheduler after actions run
    persisted: list = None  # frames to unpersist after the round commits
    # the extracted frame — the round's heaviest blocks and the ONLY
    # checkpoint the (backgroundable) docs write still reads after the
    # foreground writes finish; released separately so the pipelined
    # scheduler can free everything else before the next round's compile
    # (holding a whole round's checkpoints across the overlap window was
    # measured as a 25%-of-runtime GC storm at 32 threads)
    persisted_heavy: list = None

    @staticmethod
    def _release(frames: list) -> None:
        for df in frames or []:
            df.unpersist()
            try:
                plan = df._jdf.queryExecution().analyzed()
                if plan.getClass().getSimpleName() == "LogicalRDD":
                    plan.rdd().unpersist(False)
            except Exception:
                pass  # cleanup is best-effort; the ContextCleaner backstops

    def unpersist_light(self) -> None:
        """Release every materialized frame EXCEPT the extracted one.

        ``Dataset.unpersist`` only clears CacheManager entries — the
        RDD behind a localCheckpoint is invisible to it and otherwise
        waits for the ContextCleaner (driver GC + async queue), so
        blocks from every completed round pile up in executor memory
        and push later rounds into eviction/spill thrash.  Reach into
        the LogicalRDD leaf and unpersist the checkpoint RDD directly
        (verified: getPersistentRDDs drops to zero immediately)."""
        frames, self.persisted = self.persisted, None
        self._release(frames)

    def unpersist(self) -> None:
        """Release ALL the round's materialized frames (idempotent)."""
        self.unpersist_light()
        frames, self.persisted_heavy = self.persisted_heavy, None
        self._release(frames)


def run_round(
    frontier: DataFrame,
    url_seen: DataFrame | None,
    sidecar: DataFrame | None,  # bloom or cuckoo frame, per conf.seen_filter
    budgets: DataFrame,
    robots: DataFrame,
    fetcher,
    round_no: int,
    conf: RoundConfig,
    fetch_size_hint: int | None = None,
    boot_config: "DataFrame | None" = None,
) -> RoundResult:
    spark = frontier.sparkSession

    # fine-grained driver-time attribution for the plan-construction
    # phase (same env var as the scheduler's stage timing): plan build
    # is the round's serial Amdahl term, so knowing WHICH sub-step
    # grows is what makes it optimizable
    import os as _os
    import sys as _sys
    import time as _time

    _timing = bool(_os.environ.get("SPARK_GRAFT_ROUND_TIMING"))
    _marks: list = [_time.time()]

    def _m(label: str) -> None:
        if _timing:
            now = _time.time()
            print(
                f"      [plan {round_no}] {label}: {now - _marks[0]:.2f}s",
                file=_sys.stderr,
            )
            _marks[0] = now

    # The round's outputs (docs, seen, quarantine, order, next frontier)
    # all fan out of a few pivotal frames; without materialization each
    # delta write re-executes the whole chain (measured 5x fetch+extract
    # per round).  In the sandbox we materialize those frames; on a
    # cluster the same seam would checkpoint them as short-lived catalog
    # tables.
    #
    # LAZY localCheckpoint, not persist: persist keeps the full logical
    # plan, so every later transformation re-runs CheckAnalysis over the
    # whole round lineage (hundreds of nodes x the 11-platform identity
    # CASE trees) — measured ~4 s of DRIVER time per round just
    # constructing the plan, pure fixed cost that never parallelizes.
    # localCheckpoint truncates the plan to a leaf; construction drops
    # ~35% and every downstream analysis/AQE pass shrinks with it.
    # Blocks are MEMORY_AND_DISK like persist and are released by the
    # ContextCleaner once the round's references are dropped.
    persisted: list = []
    persisted_heavy: list = []
    overlap = os.environ.get("SPARK_GRAFT_BG_MATERIALIZE", "1") != "0"
    # Checkpoint block format: "ser" stores lz4-compressed serialized
    # rows (python StorageLevel.MEMORY_AND_DISK has deserialized=False;
    # spark.rdd.compress=true in session.py supplies the lz4), default
    # the JVM-native deserialized InternalRows.  The ser hypothesis —
    # trade decompress CPU for DRAM traffic on the round's text-heavy
    # frames — was MEASURED NEGATIVE in this JVM: JavaSerializer churn
    # put the checkpoint-materialization stage at 84% GC time (event-log
    # audit, 32 threads) with steady throughput a wash vs deser in the
    # same window.  Knob kept so the A/B is reproducible.
    _ckpt_level = None
    if os.environ.get("SPARK_GRAFT_CKPT_LEVEL", "deser") == "ser":
        from pyspark import StorageLevel as _SL

        _ckpt_level = _SL.MEMORY_AND_DISK

    def _p(df: DataFrame, heavy: bool = False) -> DataFrame:
        df = df.localCheckpoint(eager=False, storageLevel=_ckpt_level)
        (persisted_heavy if heavy else persisted).append(df)
        # overlap materialization with downstream plan compiles: each
        # checkpoint's toRdd costs 2-4 s of serial DRIVER Catalyst time
        # while the executors sit idle — kick the checkpoint's compute
        # job in a background thread NOW so it runs underneath the next
        # sub-plan's compile instead of lazily inside the first write.
        # The checkpoint RDD is already compiled and shared, so the
        # background count materializes the same blocks the write jobs
        # would (FIFO-queued; content and AQE decisions are fixed at
        # compile time — determinism is untouched, and the crawl-swap
        # bit-identity tests assert it).  Errors are swallowed: the
        # same lineage re-raises in the foreground write if real.
        # Gate: SPARK_GRAFT_BG_MATERIALIZE=0 disables the overlap (A/B
        # benchmarking + safety valve on busy shared drivers).
        if not overlap:
            return df
        from pyspark import InheritableThread

        def _materialize(d: DataFrame = df) -> None:
            try:
                d.count()
            except Exception:
                pass  # foreground consumers surface real failures

        InheritableThread(target=_materialize, daemon=True).start()
        return df

    # 1-2. identity + within-round dedup
    cand = with_url_identity(frontier)
    # 2b. optional crawl-trap guard: URL-shape explosion stats are
    # computed over the PRE-dedup candidates (the raw-URL volume IS the
    # signal — 300 ?session= variants of one page collapse to a single
    # canonical row right below); flagged domains are a tiny frame,
    # broadcast against the post-gate candidates further down
    trap_domains = None
    if conf.trap_guard:
        from ..operators.webgraph import trap_detect

        trap_domains = (
            trap_detect(cand.select("url", "domain"), min_urls=conf.trap_min_urls)
            .filter(F.col("flagged"))
            .select("domain")
        )
    cand = dedup_within_round(cand)
    _m("identity+dedup")

    # 3. seen-set anti-join (bloom prune + exact) over ALL candidates —
    # one probe pass; the supported/unsupported split happens after
    # (splitting first would run the cogroup probe twice)
    if url_seen is not None:
        if sidecar is not None and conf.seen_filter == "cuckoo":
            from ..operators.cuckoo import filter_unseen_cuckoo

            cand = filter_unseen_cuckoo(cand, url_seen, sidecar, conf.n_buckets)
        else:
            cand = filter_unseen(
                cand, url_seen, sidecar, conf.n_buckets, conf.m_bits
            )
    cand = _p(cand)
    _m("seen probe + checkpoint")

    # unsupported-platform rows are terminal (extractor has no dialect —
    # mirrors detect_platform → None → error, extractor.py:56-73)
    new = cand.filter(F.col("platform").isNotNull())
    unsupported = cand.filter(F.col("platform").isNull())

    # 4. robots gate
    allowed, denied = apply_robots(new, robots)

    # 4b. trap gate: quarantine the flagged domains' rows for this
    # round (terminal, like robots denials — they enter the seen set so
    # the trap's URL space is never re-scheduled)
    trap_denied = None
    if trap_domains is not None:
        trap_denied = allowed.join(F.broadcast(trap_domains), "domain", "left_semi")
        allowed = allowed.join(F.broadcast(trap_domains), "domain", "left_anti")

    # 5. budget gate → (eligible, deferred); ranked frame materialized
    eligible, deferred = budget_gate(allowed, budgets, persist_fn=_p)
    _m("robots + budget gate")

    # 6. fetch + extract.  Partitioning for the fetch is the FETCHER's
    # concern: HttpFetcher salts by (domain, salt) for politeness
    # locality + skew spread (salt_domains); FixtureFetcher joins on url
    # (its own shuffle) — salting first would just add a dead exchange.
    # size hint = previous round's committed frontier_next counter (an
    # upper bound on this round's eligible rows, known for free) — lets
    # FixtureFetcher withhold its broadcast hint for oversized rounds.
    #
    # fetch and extract FUSE into one pipeline whose output is persisted
    # ONCE, html-free: persisting the raw fetched frame as well would
    # hold the round's entire HTML corpus in storage a second time and
    # add a full materialization pass (measured: the two big persists
    # were the round's dominant memory-bandwidth cost).  extract_udf
    # returns an error struct for non-200 rows (html is null), so every
    # downstream consumer — valid/invalid docs, http failures,
    # discovered out-links — reads the same persisted frame.
    # S2/S4 — attach per-platform fetch config (impersonate target +
    # header map, optionally overridden by the round's header bootstrap)
    # whenever a live fetcher declares it consumes it (the reference
    # always sends its per-crawler headers, base.py:24-29).  Fixture
    # fetchers skip the (cheap, 11-row broadcast) join entirely.
    if boot_config is not None or getattr(fetcher, "wants_fetch_config", False):
        from ..operators.projections import platform_config_df, with_fetch_config

        eligible = with_fetch_config(
            eligible, platform_config_df(spark), boot_config
        )
    fetched = fetcher.fetch(eligible, size_hint_rows=fetch_size_hint)
    _m("fetch plan")

    from ..functions.extract import extract_udf

    # coalesce bounds the persisted frame to the round's configured
    # width: FixtureFetcher's found∪missing (×2 for the iframe hop)
    # union inflates partition count to ~2×(corpus + request) — every
    # downstream consumer of the persisted frame then launches one task
    # per partition per scan.  coalesce is shuffle-free, never raises
    # the count, and n_partitions is the engine's explicit sizing knob
    # (a cluster sizes it to total cores).
    extracted = _p(
        fetched.coalesce(conf.n_partitions)
        .withColumn(
            "ex", extract_udf(F.col("html"), F.col("url"), F.col("platform"))
        )
        .drop("html"),
        heavy=True,  # the docs write's input — released at commit, after
        # every lighter frame (see RoundResult.unpersist_light)
    )
    _m("extract + checkpoint")
    # SLIM twin of the extracted checkpoint: everything the round_log
    # and next-frontier consumers need — which is NOT the span text.
    # localCheckpoint blocks are row-based InternalRows, so a consumer
    # scan reads every column's bytes regardless of projection; without
    # the twin, the round_log and discovered scans each re-read the
    # round's full extracted text (the heaviest frame) for a handful of
    # skinny columns.  Building slim costs one extra scan of the heavy
    # blocks; its two consumers then read ~10x fewer bytes — net one
    # full-text pass saved per round, and the saving grows with page
    # size.  docs (the only spans consumer) keeps reading the heavy
    # frame once.
    slim = _p(
        extracted.select(
            "url", "canonical_url", "domain", "rank", "status", "attempts",
            "depth", "priority", "source_seed", "out_links",
            F.col("ex.error").alias("ex_error"),
            F.size("ex.spans").alias("n_spans"),
        )
    )
    _m("slim checkpoint")
    ok = extracted.filter(F.col("status") == 200)
    valid = ok.filter(
        F.col("ex.error").isNull()
        & (F.size("ex.spans") > 0)
        & F.col("ex.title").isNotNull()
    )

    docs = valid.select(
        F.col("canonical_url").alias("doc_id"),
        F.col("ex.spans").alias("spans"),
        F.col("ex.title").alias("title"),
        F.col("ex.subtitle").alias("subtitle"),
        F.col("url").alias("news_url"),
        "platform",
        F.struct(
            F.col("ex.author_name").alias("author_name"),
            F.col("ex.author_url").alias("author_url"),
            F.col("ex.publish_time").alias("publish_time"),
        ).alias("meta"),
        F.lit(round_no).alias("round"),
        F.pmod(F.xxhash64("domain"), F.lit(conf.n_buckets)).cast("int").alias(
            "domain_bucket"
        ),
        "source_seed",
    )

    # 7-9. unified round log — seen delta (everything that reached a
    # terminal state), deterministic crawl order, and quarantine rows
    # (fetch failures + invalid extractions + robots denials +
    # unsupported platforms; per-row isolation, server.py:130-182) in
    # ONE frame discriminated by `kind`, written as one job
    # (catalog.write_round_log).  `round` rides in the delta path.
    #
    # Shape: each source frame is scanned ONCE, emitting its 1-3 log
    # entries per row as an exploded struct array (seen + order +
    # conditional quarantine for fetched rows; seen + quarantine for
    # robots denials / unsupported platforms).  The previous 6-branch
    # filter-union re-scanned the persisted parents once per branch —
    # hundreds of near-empty map tasks per round at sandbox scale, and
    # 6x the cache-read bandwidth at any scale.
    def _entry(kind, url=False, canonical=False, hash_bucket=False,
               domain_rank=False, error=None, attempt=None):
        return F.struct(
            F.lit(kind).alias("kind"),
            (F.col("url") if url else F.lit(None).cast("string")).alias("url"),
            (F.col("canonical_url") if canonical else F.lit(None).cast("string")).alias("canonical_url"),
            (
                F.xxhash64("canonical_url")
                if hash_bucket
                else F.lit(None).cast("long")
            ).alias("url_hash"),
            (
                F.pmod(F.xxhash64("canonical_url"), F.lit(conf.n_buckets)).cast("int")
                if hash_bucket
                else F.lit(None).cast("int")
            ).alias("bucket"),
            (F.col("domain") if domain_rank else F.lit(None).cast("string")).alias("domain"),
            (F.col("rank") if domain_rank else F.lit(None).cast("int")).alias("rank"),
            (error if error is not None else F.lit(None).cast("string")).alias("error"),
            (attempt if attempt is not None else F.lit(None).cast("int")).alias("attempt"),
        )

    def _log_rows(df, *entries):
        return df.select(
            F.explode(F.array_compact(F.array(*entries))).alias("e")
        ).select("e.*")

    # quarantine reason for a fetched row, NULL when the row is a valid
    # doc (same predicates as the failed/invalid splits above)
    fetch_quarantine_error = F.when(
        F.col("status") != 200, F.concat(F.lit("http_"), F.col("status"))
    ).when(
        F.col("ex_error").isNotNull() | (F.col("n_spans") <= 0),
        F.coalesce(F.col("ex_error"), F.lit("empty content")),
    )
    round_log = (
        _log_rows(
            slim,
            _entry("seen", canonical=True, hash_bucket=True),
            _entry("order", url=True, canonical=True, domain_rank=True),
            F.when(
                fetch_quarantine_error.isNotNull(),
                _entry(
                    "quarantine",
                    url=True,
                    error=fetch_quarantine_error,
                    attempt=F.col("attempts"),
                ),
            ),
        )
        .unionByName(
            _log_rows(
                denied,
                _entry("seen", canonical=True, hash_bucket=True),
                _entry("quarantine", url=True,
                       error=F.lit("robots_denied"), attempt=F.lit(0)),
            )
        )
        .unionByName(
            _log_rows(
                unsupported,
                _entry("seen", canonical=True, hash_bucket=True),
                _entry("quarantine", url=True,
                       error=F.lit("unsupported_platform"), attempt=F.lit(0)),
            )
        )
    )
    if trap_denied is not None:
        round_log = round_log.unionByName(
            _log_rows(
                trap_denied,
                _entry("seen", canonical=True, hash_bucket=True),
                _entry("quarantine", url=True,
                       error=F.lit("trap_denied"), attempt=F.lit(0)),
            )
        )

    # 10. next frontier = deferred ∪ discovered out-links
    discovered = (
        slim.filter((F.col("status") == 200) & (F.col("depth") < conf.max_depth))
        .select(
            F.col("source_seed"),
            F.col("priority"),
            (F.col("depth") + 1).alias("depth"),
            F.explode("out_links").alias("url"),
        )
        .select(
            "url",
            F.parse_url("url", F.lit("HOST")).alias("domain"),
            "priority",
            "depth",
            md5_64(F.col("url")).alias("seq"),
            F.lit(round_no + 1).alias("round_added"),
            F.lit(0).alias("attempt"),
            "source_seed",
        )
    )
    frontier_next = deferred.select(*FRONTIER_COLS).unionByName(
        discovered.select(*FRONTIER_COLS)
    )
    _m("log + frontier_next")

    return RoundResult(
        docs=docs,
        round_log=round_log,
        frontier_next=frontier_next,
        counters={},
        persisted=persisted,
        persisted_heavy=persisted_heavy,
    )
