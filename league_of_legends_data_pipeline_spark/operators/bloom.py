"""Distributed Bloom filter for membership pruning at corpus scale.

The 100 TB decontamination problem: a benchmark key set (doc digests or
n-grams) can reach billions of entries — too large for a broadcast hash
join — while the corpus side is far too large to shuffle by key. A Bloom
filter collapses the key set into a fixed-size bitmap (m bits, k probes)
that DOES broadcast, and its one guarantee (no false negatives) routes the
work: rows the filter rejects are definitively clean and never touch a
join; only the tiny surviving fraction (true hits + ~FP-rate of the
corpus) pays an exact verification join.

Engineering constraints honored here:

- **Build side is a real aggregation**, not a driver loop: k probe
  positions per key (explode), distinct, OR-folded into 64-bit words by
  ``bit_or`` — all JVM-side; only the finished word table (m/32 rows,
  then one map row) ever reaches a single partition, and that table is
  bounded by the filter geometry, not the data.
- **Probe side is zero-shuffle**: the bitmap rides along as one broadcast
  map column (the same in-row pattern as the J1 participant lookup,
  plans/etl.py) and membership is a pure Column expression — ``forall``
  over the k positions with an ``element_at`` word lookup and a
  literal-array mask (no variable-shift, which ``F.shiftleft`` cannot
  express and signed 64-bit engines disagree on at bit 63; 32-bit words
  in a long container keep every mask positive and portable).
- **Deterministic and engine-portable**: positions come from md5 of a
  seeded key string (the same scheme as operators/sampling.py), so an
  oracle can replicate the bitmap bit-for-bit in ANSI SQL if it wants to
  check the pruning itself, and re-runs/backfills build the identical
  filter.

Sizing: FP rate ≈ (1 - e^(-k·n/m))^k. The defaults (k=4) want m ≈ 10·n
bits for ~1–2% FP; callers size ``m_bits`` from the expected key count.

No reference parity: the reference has no membership-pruning surface at
all (its joins are row loops over Python dicts, Lambda/lambda_function.py);
this module is part of the beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# word layout: 32 bits used per 64-bit container → every mask fits in a
# positive long on every engine (no sign-bit / shift-overflow edge cases)
_WORD_BITS = 32
_MASKS = F.array(*[F.lit(1 << i).cast("long") for i in range(_WORD_BITS)])
# collision-safe internal name for the broadcast map column ('__'-prefixed
# temp-column convention) — a user DataFrame legitimately named 'bloom'
# must not collide with the filter's ride-along column
_BITMAP_COL = "__bloom_bitmap"


def bloom_positions(key: Column, m_bits: int, k: int = 4,
                    seed: int = 42) -> Column:
    """Array of ``k`` probe positions in [0, m_bits) for one key.

    Position i is the top 60 bits of md5("seed:i:key") mod m_bits —
    independent draws per probe index, deterministic across engines,
    partitionings, and re-runs.
    """
    return F.array(*[
        F.conv(F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)), F.lit(str(i)),
                              key.cast("string"))), 1, 15), 16, 10)
        .cast("long") % m_bits
        for i in range(k)
    ])


def bloom_bitmap(keys: DataFrame, key_col: str, m_bits: int, k: int = 4,
                 seed: int = 42) -> DataFrame:
    """One-row DataFrame holding the filter as ``__bloom_bitmap:
    map<long, long>`` (word index → 32-bit word in a long).

    The heavy part — hashing every key and OR-folding bit positions —
    runs distributed; the single-partition tail only folds ≤ m/32 finished
    words into one map value, which is geometry-bounded (a 2^27-bit filter
    is 4M map entries ~ 64 MB broadcast, the practical ceiling; beyond
    that, shard the filter by key range and union the prune results).
    No de-dup pass on the k·n exploded positions: ``bit_or`` is
    idempotent, so the groupBy's map-side partial aggregation absorbs
    duplicates for free — a ``distinct()`` here would be a second full
    shuffle of the probe positions for zero semantic gain.
    """
    pos = keys.select(F.explode(
        bloom_positions(F.col(key_col), m_bits, k, seed)).alias("p"))
    words = (
        pos.groupBy(F.shiftright(F.col("p"), 5).alias("w"))
        .agg(F.bit_or(F.element_at(
            _MASKS, (F.col("p").bitwiseAND(F.lit(_WORD_BITS - 1)) + 1)
            .cast("int"))).alias("bits"))
    )
    return words.agg(F.map_from_entries(
        F.collect_list(F.struct("w", "bits"))).alias(_BITMAP_COL))


def bloom_might_contain(bloom_map: Column, key: Column, m_bits: int,
                        k: int = 4, seed: int = 42) -> Column:
    """Membership test against a ``bloom_bitmap`` map column.

    False ⇒ the key is DEFINITELY absent (the side a pruning plan relies
    on); True ⇒ present or a false positive (callers verify with an exact
    join on the survivors). Pure Column expression: evaluated in-row,
    inside codegen, no shuffle and no UDF.
    """
    return F.forall(
        bloom_positions(key, m_bits, k, seed),
        lambda p: F.coalesce(bloom_map[F.shiftright(p, 5)], F.lit(0))
        .bitwiseAND(F.element_at(
            _MASKS, (p.bitwiseAND(F.lit(_WORD_BITS - 1)) + 1).cast("int")))
        != 0,
    )


def bloom_prune(df: DataFrame, key: Column, bitmap: DataFrame, m_bits: int,
                k: int = 4, seed: int = 42, keep_members: bool = True,
                flag_col: str | None = None) -> DataFrame:
    """Attach (or filter by) the membership verdict.

    ``keep_members=True`` keeps possible members (the verify-me stream);
    False keeps definite non-members (the guaranteed-clean stream). With
    ``flag_col`` set, no filtering happens — the verdict lands in a column
    so one scan can feed both streams. The bitmap is broadcast-crossJoined
    (1 row), never shuffled.
    """
    tagged = df.crossJoin(F.broadcast(bitmap))
    verdict = bloom_might_contain(F.col(_BITMAP_COL), key, m_bits, k, seed)
    if flag_col is not None:
        return tagged.withColumn(flag_col, verdict).drop(_BITMAP_COL)
    return tagged.filter(
        verdict if keep_members else ~verdict).drop(_BITMAP_COL)
