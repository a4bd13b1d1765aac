"""J4 (variant) — partitioned cuckoo-filter URL-seen prune.

The north star names a "bloom/cuckoo URL-seen filter"; ``seen.py`` is
the bloom half, this is the cuckoo half.  Same contract: the filter is
*prune-only* — a negative is definitive (no false negatives), a
positive goes to the exact anti-join — so swapping it for the bloom
sidecar cannot change any result, only the pruned fraction.  What the
cuckoo variant adds over bloom:

  * **deletion** — a fingerprint can be removed, so "un-seeing" a URL
    (forced re-crawl of a quarantined/stale page, the reference's
    manual re-run of a failed article, server.py:130-182) is a filter
    update instead of a full rebuild from url_seen;
  * **bounded lookup cost** — a probe reads exactly 2 buckets (8
    fingerprint slots), independent of filter size, vs BLOOM_K
    scattered bit reads.

Layout (mirrors the bloom sidecar): one row per hash-partition bucket
``(bucket, table, n_rows, stash, n_items)`` where ``table`` is an
``n_rows x CUCKOO_SLOTS`` array of 16-bit fingerprints (0 = empty
slot) and ``stash`` is the exact overflow list.  Buckets partition by
``pmod(xxhash64(canonical_url), n_buckets)`` — identical to url_seen's
layout, so build/merge/probe are all co-partitioned cogroups.

Insertion is BULK-VECTORIZED (no per-row Python): each round bin-sorts
the pending fingerprints by target bucket-row, ranks them within equal
rows via one cumsum pass, and scatters ``rank < free_slots`` in a
single fancy-index store; unplaced items flip to their alternate row
(i XOR h(fp), the standard partial-key cuckoo step) and retry.  There
is NO eviction loop — the table is sized to ~40% load where two-choice
x 4-slot overflow is vanishingly rare, and the few overflows land in
the exact ``stash`` (probed by full 64-bit hash, so stash items can
never false-positive).  The trade: ~5 bytes/key vs bloom's ~1.2 at the
same FP rate, bought back by deletion + O(1) probes.

Resizing caveat (inherent to cuckoo filters): the table stores 16-bit
fingerprints, not keys, so it cannot re-hash itself larger.  Size
``capacity`` up-front from the expected seen count (the engine's
catalog tracks exact n_items per bucket); a saturated bucket is
rebuilt from url_seen — the same maintenance a saturated bloom needs.

Scale: at 10^10 URLs with n_buckets ~4k, each bucket holds ~2.4M keys
→ a ~12 MB fingerprint table per bucket, built/merged/probed by one
vectorized numpy pass inside a cogroup — the same
co-partitioned-sidecar shape as the bloom path, never a broadcast of
the whole filter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CUCKOO_SLOTS = 4           # fingerprint slots per table row
TARGET_LOAD = 0.4          # sizing: slots_total * load >= capacity
MAX_PLACE_ROUNDS = 8       # i1, i2, then re-tries; leftovers -> stash
_FP_SEED = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 increment
_ALT_MULT = np.uint64(0x5BD1E995)         # MurmurHash2 multiplier

CUCKOO_SCHEMA = (
    "bucket int, table binary, n_rows int, stash array<long>, n_items bigint"
)


def _fingerprints(hashes: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprints from int64 url hashes (vectorized).

    Mixes the high half down so the fingerprint is independent of the
    row index bits (which come from the low half)."""
    h = hashes.astype(np.uint64)
    mixed = (h ^ (h >> np.uint64(33))) * _FP_SEED
    fp = ((mixed >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = np.uint16(0x9E37)  # 0 marks an empty slot
    return fp


def _row_index(hashes: np.ndarray, n_rows: int) -> np.ndarray:
    """Primary row from MIXED bits (16..), not the raw low bits.

    The bucket assignment is pmod(hash, n_buckets); with a power-of-two
    n_buckets that is exactly the raw low bits, so a raw-low-bits row
    index would be constant-per-bucket in those bits — only 1/n_buckets
    of each table's rows reachable as primary rows, ~44x the designed
    overflow at 0.4 load (measured).  Mixing first (same splitmix-style
    mix as _fingerprints; row takes bits 16.., fp takes bits 48..63 —
    disjoint) makes the row index independent of the bucket id."""
    h = hashes.astype(np.uint64)
    mixed = (h ^ (h >> np.uint64(33))) * _FP_SEED
    return ((mixed >> np.uint64(16)) & np.uint64(n_rows - 1)).astype(np.int64)


def _alt_row(rows: np.ndarray, fps: np.ndarray, n_rows: int) -> np.ndarray:
    """Partial-key alternate: i XOR hash(fp), mod n_rows (power of 2)."""
    fh = (fps.astype(np.uint64) * _ALT_MULT) & np.uint64(n_rows - 1)
    return (rows.astype(np.uint64) ^ fh).astype(np.int64)


def _size_rows(capacity: int) -> int:
    need = max(1, int(np.ceil(capacity / (CUCKOO_SLOTS * TARGET_LOAD))))
    return 1 << int(np.ceil(np.log2(need)))


def _bulk_insert(
    table: np.ndarray, hashes: np.ndarray
) -> list[int]:
    """Insert fingerprints of ``hashes`` into ``table`` (n_rows x SLOTS,
    uint16, mutated in place); returns indices into ``hashes`` that
    overflowed (caller stashes the full 64-bit hash).

    Each round is three vectorized passes (argsort, run-rank cumsum,
    fancy-index scatter) over the still-pending set — no per-item
    Python.  (idx_row, slot) scatter targets are unique by construction
    (rank is unique within a row), so the fancy-index store is safe."""
    n_rows = table.shape[0]
    fps = _fingerprints(hashes)
    rows = _row_index(hashes, n_rows)
    # invariant: occupied slots are left-compacted within each row
    # (maintained by _delete_from_table), so occ + rank is a free slot
    occ = (table != 0).sum(axis=1).astype(np.int64)
    pending = np.arange(len(hashes))
    for _ in range(MAX_PLACE_ROUNDS):
        if len(pending) == 0:
            break
        p_rows = rows[pending]
        order = np.argsort(p_rows, kind="stable")
        srows = p_rows[order]
        first = np.empty(len(srows), dtype=bool)
        first[0] = True
        first[1:] = srows[1:] != srows[:-1]
        run_start = np.flatnonzero(first)
        rank = np.arange(len(srows)) - np.repeat(
            run_start, np.diff(np.append(run_start, len(srows)))
        )
        free = CUCKOO_SLOTS - occ[srows]
        place = rank < free
        placed_rows = srows[place]
        placed_slot = occ[placed_rows] + rank[place]
        table[placed_rows, placed_slot] = fps[pending[order[place]]]
        placed_idx, counts = np.unique(placed_rows, return_counts=True)
        occ[placed_idx] += counts
        remaining = pending[order[~place]]
        if len(remaining) == 0:
            pending = remaining
            break
        # flip survivors to their other candidate row and retry
        # (alt is an involution, so odd rounds try i2, even retry i1)
        rows[remaining] = _alt_row(
            rows[remaining], fps[remaining], n_rows
        )
        pending = remaining
    return list(pending)


def _probe_table(
    hashes: np.ndarray, table: np.ndarray, stash: np.ndarray
) -> np.ndarray:
    """Vectorized membership: fp in either candidate row, or exact hash
    in the stash.  Returns a bool 'maybe seen' mask."""
    n_rows = table.shape[0]
    fps = _fingerprints(hashes)
    r1 = _row_index(hashes, n_rows)
    r2 = _alt_row(r1, fps, n_rows)
    hit = (table[r1] == fps[:, None]).any(axis=1) | (
        table[r2] == fps[:, None]
    ).any(axis=1)
    if len(stash):
        hit |= np.isin(hashes, stash)
    return hit


def _delete_from_table(
    table: np.ndarray, stash: list, hashes: np.ndarray
) -> int:
    """Remove one fingerprint occurrence per hash (stash first — exact —
    then either candidate row).  Standard cuckoo-filter discipline: only
    hashes actually inserted may be deleted (enforced by callers, which
    delete from url_seen in the same maintenance op).  Deletion is a
    KB-scale maintenance path (forced re-crawl lists), not the crawl
    hot path, so a per-item loop over the *delete list* is fine — each
    iteration is O(SLOTS) numpy ops.  Returns #removed."""
    n_rows = table.shape[0]
    fps = _fingerprints(hashes)
    r1 = _row_index(hashes, n_rows)
    r2 = _alt_row(r1, fps, n_rows)
    removed = 0
    for h, fp, a, b in zip(hashes.tolist(), fps, r1, r2):
        if h in stash:
            stash.remove(h)
            removed += 1
            continue
        for row in (a, b):
            slots = np.flatnonzero(table[row] == fp)
            if len(slots):
                table[row, slots[0]] = 0
                # re-compact the row: _bulk_insert's rank-scatter
                # assumes occupied slots sit left-contiguous
                vals = table[row]
                nz = vals[vals != 0]
                vals[:] = 0
                vals[: len(nz)] = nz
                removed += 1
                break
    return removed


def _emit(bucket: int, table: np.ndarray, stash: list, n_items: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "bucket": [bucket],
            "table": [table.tobytes()],
            "n_rows": [table.shape[0]],
            "stash": [list(stash)],
            "n_items": [n_items],
        }
    )


def _load(row: pd.Series) -> tuple[np.ndarray, list]:
    table = (
        np.frombuffer(row["table"], dtype=np.uint16)
        .reshape(int(row["n_rows"]), CUCKOO_SLOTS)
        .copy()
    )
    return table, list(row["stash"])


def build_cuckoo(
    url_seen: DataFrame, n_buckets: int, capacity_per_bucket: int
) -> DataFrame:
    """Per-bucket cuckoo tables from a url_seen table (url_hash, bucket)."""

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        # sorted: table layout becomes a pure function of the hash SET,
        # so two cluster sizes (or local-vs-distributed folds) write
        # byte-identical sidecars — same discipline as the bloom OR
        hashes = np.sort(pdf["url_hash"].to_numpy())
        table = np.zeros(
            (_size_rows(max(capacity_per_bucket, len(hashes))), CUCKOO_SLOTS),
            dtype=np.uint16,
        )
        overflow = _bulk_insert(table, hashes)
        stash = [int(hashes[i]) for i in overflow]
        return _emit(int(pdf["bucket"].iloc[0]), table, stash, len(pdf))

    return (
        url_seen.select("bucket", "url_hash")
        .groupBy("bucket")
        .applyInPandas(per_bucket, schema=CUCKOO_SCHEMA)
    )


def merge_cuckoo(
    cuckoo: DataFrame, new_seen: DataFrame, capacity_per_bucket: int = 0
) -> DataFrame:
    """Insert a round's new hashes into the existing per-bucket tables
    (incremental URL-seen merge, cuckoo flavor) — a co-partitioned
    cogroup; each bucket's table crosses the wire once."""

    def merge(ndf: pd.DataFrame, cdf: pd.DataFrame) -> pd.DataFrame:
        # sorted for byte-determinism (see build_cuckoo)
        hashes = (
            np.sort(ndf["url_hash"].to_numpy())
            if len(ndf)
            else np.empty(0, np.int64)
        )
        if len(cdf) == 0:
            table = np.zeros(
                (
                    _size_rows(max(capacity_per_bucket, len(hashes))),
                    CUCKOO_SLOTS,
                ),
                dtype=np.uint16,
            )
            prior = 0
            stash: list = []
            bucket = int(ndf["bucket"].iloc[0])
        else:
            table, stash = _load(cdf.iloc[0])
            prior = int(cdf["n_items"].iloc[0])
            bucket = int(cdf["bucket"].iloc[0])
        overflow = _bulk_insert(table, hashes)
        stash.extend(int(hashes[i]) for i in overflow)
        return _emit(bucket, table, stash, prior + len(hashes))

    return (
        new_seen.select("bucket", "url_hash")
        .groupBy("bucket")
        .cogroup(cuckoo.groupBy("bucket"))
        .applyInPandas(merge, schema=CUCKOO_SCHEMA)
    )


def delete_cuckoo(cuckoo: DataFrame, removals: DataFrame) -> DataFrame:
    """Un-see URLs: remove their fingerprints so a forced re-crawl can
    re-schedule them.  ``removals`` carries (url_hash, bucket) of rows
    the caller is ALSO deleting from url_seen (cuckoo deletion is only
    sound for keys actually inserted).  Buckets with no removals pass
    through untouched."""

    def drop(rdf: pd.DataFrame, cdf: pd.DataFrame) -> pd.DataFrame:
        if len(cdf) == 0:
            return pd.DataFrame(
                {c: [] for c in ["bucket", "table", "n_rows", "stash", "n_items"]}
            )
        table, stash = _load(cdf.iloc[0])
        n_items = int(cdf["n_items"].iloc[0])
        removed = (
            _delete_from_table(table, stash, rdf["url_hash"].to_numpy())
            if len(rdf)
            else 0
        )
        return _emit(
            int(cdf["bucket"].iloc[0]), table, stash, n_items - removed
        )

    return (
        removals.select("bucket", "url_hash")
        .groupBy("bucket")
        .cogroup(cuckoo.groupBy("bucket"))
        .applyInPandas(drop, schema=CUCKOO_SCHEMA)
    )


def filter_unseen_cuckoo(
    candidates: DataFrame,
    url_seen: DataFrame,
    cuckoo: DataFrame,
    n_buckets: int,
) -> DataFrame:
    """Drop-in for seen.filter_unseen with the cuckoo sidecar: slim
    cogroup probe emits the maybe-seen minority, exact semi/anti joins
    confirm — identical single-pass plan shape (see seen.py:123-139),
    identical results by construction."""
    cand = candidates.withColumn(
        "url_hash", F.xxhash64("canonical_url")
    ).withColumn("bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int"))

    def probe(cdf: pd.DataFrame, fdf: pd.DataFrame) -> pd.DataFrame:
        if len(fdf) == 0:
            return cdf.iloc[0:0][["bucket", "url_hash"]]
        table, stash = _load(fdf.iloc[0])
        hit = _probe_table(
            cdf["url_hash"].to_numpy(), table, np.asarray(stash, dtype=np.int64)
        )
        return cdf[["bucket", "url_hash"]][hit]

    slim = cand.select("bucket", "url_hash")
    maybe = (
        slim.groupBy("bucket")
        .cogroup(cuckoo.select("bucket", "table", "n_rows", "stash").groupBy("bucket"))
        .applyInPandas(probe, schema="bucket int, url_hash bigint")
    )
    confirmed_seen = maybe.join(
        url_seen.select("bucket", "url_hash"), ["bucket", "url_hash"], "left_semi"
    )
    return cand.join(
        confirmed_seen, ["bucket", "url_hash"], "left_anti"
    ).drop("url_hash", "bucket")
