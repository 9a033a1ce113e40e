"""Document deduplication operators for large-scale training-data pipelines:
exact, MinHash+LSH, SimHash, and n-gram Jaccard — all pure Column
expressions (JVM-side, whole-stage-codegen'd), no Python UDFs.

The reference deduplicates only by exact id (`set(matchesList)`,
EC2/fetcher.py:136 — SURVEY A1/T5); everything beyond exact dedup is the
beyond-reference LLM-pipeline surface.

Scale notes
-----------
- Exact dedup groups on a 128-bit content digest, not the raw text: the
  shuffle moves 16-byte keys + doc ids, not documents.
- MinHash signatures are computed per-row from a shingle array (map-side,
  no shuffle); LSH banding turns all-pairs similarity into an equi-join on
  (band_id, band_hash). Degenerate buckets (boilerplate shingles shared by
  millions of docs) are capped via `max_bucket_size` so one hot bucket
  cannot produce a quadratic pair blow-up.
- SimHash packs the signature into one BIGINT; candidate pairs come from
  banding the 64 bits into chunks (pigeonhole: hamming <= k implies an
  exact match on >= 1 of k+1 chunks), verified with bit_count(xor) —
  all integer ops.
- All hash functions are md5-based and engine-portable (same values in
  DuckDB), so every operator here is oracle-checkable.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from league_of_legends_data_pipeline_spark.operators._util import (
    default_parallelism as _par,
    jaccard_verified_pairs,
)

# Mersenne prime 2^31-1: (a*h + b) % P stays under 2^62 — no BIGINT overflow.
MINHASH_PRIME = 2_147_483_647



def content_digest(*cols: str | Column) -> Column:
    """128-bit md5 digest over the columns (exact-dedup key).

    Each column is framed as ``N`` (null) or ``V<len>:<value>`` before
    concatenation: a bare separator join would make NULL indistinguishable
    from absence (concat_ws skips NULLs) and let values containing the
    separator collide with value boundaries — both silently merge distinct
    documents. Length-prefix framing is injective.
    """
    parts = []
    for c in cols:
        col = (F.col(c) if isinstance(c, str) else c).cast("string")
        parts.append(F.when(col.isNull(), F.lit("N")).otherwise(
            F.concat(F.lit("V"), F.length(col).cast("string"), F.lit(":"), col)))
    return F.md5(F.concat(*parts))


def exact_dedup(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Keep one row per distinct (cols) content — the one with the smallest
    ``id_col`` — plus the duplicate count. Shuffles digests, not content.
    """
    keyed = df.withColumn("__digest", content_digest(*cols))
    w = Window.partitionBy("__digest").orderBy(F.col(id_col).asc())
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .withColumn("n_dups", F.count(F.lit(1)).over(Window.partitionBy("__digest")))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__digest")
    )


def portable_hash64(col: Column) -> Column:
    """Deterministic 60-bit integer hash of a string, identical in Spark and
    DuckDB: first 15 hex chars of md5, parsed base-16.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def char_shingles(col: str | Column, k: int = 5) -> Column:
    """Distinct character k-grams of a string column, as an array."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.greatest(F.length(c) - F.lit(k - 1), F.lit(1))
    return F.array_distinct(F.transform(F.sequence(F.lit(1), n), lambda i: c.substr(i, F.lit(k))))


def _dedup_pairs(cands: DataFrame, df: DataFrame) -> DataFrame:
    """Dedup candidate (id_a, id_b) rows on an EXPLICIT-count exchange.

    ``dropDuplicates`` alone plans an AQE-coalescible exchange, and a
    candidate key set is only a few MB however many pairs it holds — so
    AQE collapses it to ONE post-shuffle partition, which then runs the
    downstream array-attach joins and the O(|arrays|) verify
    intersections single-threaded (r14 measurement on the q186 verify
    chain: 1.5-2.1 s single-task vs 0.37-0.49 s spread). An explicit
    ``repartition(n, keys)`` is never coalesced, and dropDuplicates
    reuses its hashpartitioning, so spreading costs no extra exchange.
    """
    return (cands.repartition(_par(df), "id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"]))


def minhash_coefficients(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, MINHASH_PRIME), rng.randrange(0, MINHASH_PRIME))
        for _ in range(num_hashes)
    ]


def minhash_signature(shingles: Column, num_hashes: int = 16, seed: int = 42) -> Column:
    """Array of ``num_hashes`` MinHash values over a shingle array.

    min_i over shingles of (a_i * (H(s) mod P) + b_i) mod P, H = md5-based.
    Pure per-row expression: computed map-side, no shuffle, no UDF.
    """
    base = lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % MINHASH_PRIME
    coeffs = minhash_coefficients(num_hashes, seed)

    def slot(a: int, b: int):
        # closure (not default args): pyspark counts defaulted params as
        # lambda arguments and would reject the higher-order function call
        return lambda s: (F.lit(a) * base(s) + F.lit(b)) % MINHASH_PRIME

    return F.array(*[
        F.array_min(F.transform(shingles, slot(a, b))) for a, b in coeffs
    ])


def minhash_signature_table(
    hashed: DataFrame,
    id_col: str,
    hm_col: str,
    num_hashes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """(id, sig) MinHash signatures from pre-hashed shingle arrays — all
    ``num_hashes`` running mins in one numpy pass per Arrow batch.

    The dense (shingles x num_hashes) min-reduction is the same class of
    problem as the sign-LSH plane projection (similarity.py): a
    higher-order-function fold allocates a num_hashes-long array PER
    SHINGLE (~10M transient arrays per run at sf0.1), whose GC pressure
    made repeat runs degrade 2-3x in a long session; per-slot
    transform+array_min re-walks (and for inlined hashing re-md5s) the
    shingle array once per slot. The int64 arithmetic ((a*(h%P)+b)%P) is
    bit-identical to :func:`minhash_signature`, so DuckDB oracles that
    replicate the scheme are unaffected; md5 shingle hashing stays
    JVM-side (upstream), keeping the portable-hash contract in one place.
    """
    import numpy as np
    import pandas as pd

    coeffs = minhash_coefficients(num_hashes, seed)
    A = np.array([a for a, _ in coeffs], dtype=np.int64)
    B = np.array([b for _, b in coeffs], dtype=np.int64)

    # NULL QUARANTINE: a single null VALUE anywhere in an Arrow batch's
    # list column makes the pandas conversion promote the ENTIRE chunk's
    # flat values buffer to float64 — silently destroying 60-bit hash
    # precision for every other row in the partition (53-bit mantissa).
    # Null text reaches here as [null] (char_shingles' greatest(..,1)
    # floor turns a null length into one null shingle), so both null
    # lists AND null elements are stripped; the empty-input branch below
    # emits the sentinel signature for them either way.
    hashed = hashed.select(
        id_col,
        F.coalesce(F.filter(F.col(hm_col), lambda x: x.isNotNull()),
                   F.array().cast("array<long>")).alias(hm_col))

    def signature(batches):
        for pdf in batches:
            sigs = []
            # positional pairing: constructing the result from a pandas
            # Series pairs by INDEX while the sigs list pairs by position;
            # a non-default batch index would silently misalign ids/sigs
            ids = pdf[id_col].to_numpy()
            for hm in pdf[hm_col]:
                # NULL text upstream yields a null shingle array; emit the
                # same empty-input sentinel instead of crashing the batch
                # (np.asarray(None) raises) — preserves the null tolerance
                # of the pure-Column signature form this replaced.
                if hm is None:
                    sigs.append([MINHASH_PRIME] * num_hashes)
                    continue
                h = np.asarray(hm, dtype=np.int64) % MINHASH_PRIME
                if h.size == 0:
                    sigs.append([MINHASH_PRIME] * num_hashes)
                else:
                    sigs.append(
                        ((h[:, None] * A[None, :] + B[None, :])
                         % MINHASH_PRIME).min(axis=0).tolist())
            yield pd.DataFrame({id_col: ids, "sig": sigs})

    return hashed.select(id_col, hm_col).mapInPandas(
        signature, f"{id_col} long, sig array<long>")


def minhash_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 5,
    num_hashes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """(doc_id, hm: array<long>, sig: array<long>) in ONE Arrow stage:
    distinct character k-grams → md5 top-60-bit hash per shingle → all
    ``num_hashes`` MinHash slots, fused.

    Replaces the pure-Column ``transform(char_shingles, portable_hash64)``
    front end, which fell out of whole-stage codegen (nested higher-order
    functions) and measured ~77 µs/shingle interpreted — 3.5 s per fresh
    run at sf0.1 vs ~0.3 s for this stage (C md5, no hex round trip, one
    numpy pass for the signature). Hash values are bit-identical to
    :func:`portable_hash64` (md5 digest top 60 bits == first 15 hex chars
    parsed base-16), so every DuckDB oracle that replicates the scheme is
    unaffected; the equivalence is pinned by a pytest oracle.

    Built on ``mapInArrow``: hm/sig go back as Arrow ListArrays built
    from flat int64 buffers + offsets — no per-element Python objects on
    the output path. Callers repartition upstream for spread; put an
    exchange ABOVE this stage when several consumers reuse the result
    (exchange reuse then runs the hashing once per action).
    """
    import pyarrow as pa

    import numpy as np

    coeffs = minhash_coefficients(num_hashes, seed)
    A = np.array([a for a, _ in coeffs], dtype=np.int64)
    B = np.array([b for _, b in coeffs], dtype=np.int64)
    sentinel = [MINHASH_PRIME] * num_hashes

    def fused(batches):
        import hashlib
        md5 = hashlib.md5
        k = shingle_k
        for batch in batches:
            tbl = batch.to_pydict()
            ids = tbl[id_col]
            texts = tbl[text_col]
            hm_flat: list[int] = []
            hm_off = [0]
            sig_flat: list[int] = []
            for t in texts:
                if t is not None:
                    # dict.fromkeys: first-seen order, like array_distinct.
                    # max(.., 1): docs shorter than k (incl. empty) yield
                    # ONE whole-doc shingle — the char_shingles contract.
                    ss = dict.fromkeys(
                        t[i:i + k] for i in range(max(len(t) - k + 1, 1)))
                    hs = [int.from_bytes(md5(s.encode("utf-8")).digest()[:8],
                                         "big") >> 4 for s in ss]
                    hm_flat.extend(hs)
                    h = np.asarray(hs, dtype=np.int64) % MINHASH_PRIME
                    sig_flat.extend(
                        ((h[:, None] * A[None, :] + B[None, :])
                         % MINHASH_PRIME).min(axis=0).tolist())
                else:
                    sig_flat.extend(sentinel)
                hm_off.append(len(hm_flat))
            n = len(ids)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()),
                 pa.ListArray.from_arrays(
                     pa.array(hm_off, pa.int32()),
                     pa.array(hm_flat, pa.int64())),
                 pa.ListArray.from_arrays(
                     pa.array([i * num_hashes for i in range(n + 1)],
                              pa.int32()),
                     pa.array(sig_flat, pa.int64()))],
                names=["doc_id", "hm", "sig"])

    return df.select(F.col(id_col).alias("doc_id"),
                     F.col(text_col).alias(text_col)) \
        .mapInArrow(fused, "doc_id long, hm array<long>, sig array<long>")


def _minhash_banded(df: DataFrame, id_col: str, text_col: str,
                    shingle_k: int, num_hashes: int, bands: int, rows: int,
                    seed: int, materialize: bool = False
                    ) -> tuple[DataFrame, DataFrame]:
    """Shared MinHash front end: (hashed shingles+sigs, banded signatures).

    ``base`` = (doc_id, hm, sig) from the fused Arrow stage, exchanged on
    doc_id ABOVE the stage so every consumer (banding + both verify-side
    joins) reads the one materialized hashing pass (runtime exchange
    reuse); ``banded`` = (doc_id, band_id, band_hash) — ids only.

    ``materialize=True`` eagerly localCheckpoints ``base``: runtime
    exchange reuse only spans ONE job, so a caller that runs the two
    outputs through SEPARATE actions (build_near_dup_index's two
    bucketed table writes) would otherwise re-execute the full signing
    pass per action. Single-action callers (the pairs operators) keep
    the default — their one plan already reuses the exchange.
    """
    n = _par(df)
    base = minhash_table(
        df.repartition(n, F.col(id_col)), id_col, text_col,
        shingle_k=shingle_k, num_hashes=num_hashes, seed=seed,
    ).repartition(n, "doc_id")
    if materialize:
        base = base.localCheckpoint(eager=True)
    sig = F.col("sig")
    banded = base.select(
        "doc_id",
        F.posexplode(F.array(*[
            F.md5(F.concat_ws(",", *[sig[i].cast("string")
                                     for i in range(b * rows,
                                                    (b + 1) * rows)]))
            for b in range(bands)
        ])).alias("band_id", "band_hash"),
    )
    return base.select("doc_id", "hm"), banded


def _cap_buckets(banded: DataFrame, max_bucket_size: int,
                 observation=None) -> DataFrame:
    """Drop (band_id, band_hash) buckets larger than ``max_bucket_size``.

    The cap is the hot-bucket guard (a bucket of m docs yields m^2/2
    candidate pairs), implemented as a window count — it exchanges on the
    same (band_id, band_hash) key the candidate self-join needs, so the
    sort/exchange is computed once and reused.

    The cap is also a silent recall eater: every dropped bucket is a set
    of candidates that will never be verified, and the caller otherwise
    has no signal that it fired. Pass a ``pyspark.sql.Observation`` as
    ``observation`` to surface, piggybacked on the caller's own action
    (zero extra jobs — ``observe`` plants a CollectMetrics node, not a
    count; the ``Observation``-object form is batch-only, which these
    batch dedup passes are):

    - ``banded_rows``: total (doc, band) rows entering the cap;
    - ``rows_in_dropped_buckets``: rows discarded by the cap;
    - ``dropped_buckets``: number of distinct over-cap buckets
      (CollectMetrics forbids DISTINCT aggregates, so each over-cap row
      contributes 1/bucket_size — the per-bucket sum is exactly 1).

    After the action: ``observation.get["rows_in_dropped_buckets"]`` etc.
    A nonzero drop count on a recall-sensitive path (containment pairs
    with the permissive ``bands=num_hashes`` default especially) means
    the cap is eating the recall the default was chosen for — raise
    ``max_bucket_size`` or pre-filter boilerplate shingles.
    """
    bw = Window.partitionBy("band_id", "band_hash")
    banded = banded.withColumn("__bc", F.count(F.lit(1)).over(bw))
    if observation is not None:
        over = F.col("__bc") > max_bucket_size
        banded = banded.observe(
            observation,
            F.count(F.lit(1)).alias("banded_rows"),
            F.sum(F.when(over, 1).otherwise(0)).alias(
                "rows_in_dropped_buckets"),
            F.round(F.sum(F.when(over, 1.0 / F.col("__bc"))
                          .otherwise(0.0))).cast("long").alias(
                "dropped_buckets"),
        )
    return banded.filter(F.col("__bc") <= max_bucket_size).drop("__bc")


def lsh_bucket_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 5,
    num_hashes: int = 16,
    bands: int | None = None,
    seed: int = 42,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Standalone LSH bucket-health report: one row of
    (n_buckets, banded_rows, dropped_buckets, rows_in_dropped_buckets,
    max_bucket) for the SAME banding a ``minhash_lsh_*`` call with these
    parameters would build. ``dropped_*`` counts what the
    ``max_bucket_size`` cap would silently discard — the monitoring dual
    of the inline ``bucket_cap_observation`` channel (:func:`_cap_buckets`):
    run this periodically over a corpus to size the cap BEFORE a dedup
    pass, or to alert when boilerplate growth starts eating recall.
    One extra aggregate over (band_id, band_hash) — no pair join, so it
    is safe at any corpus size."""
    if bands is None:
        bands = num_hashes
    if num_hashes % bands:
        raise ValueError(f"num_hashes ({num_hashes}) must divide evenly "
                         f"into bands ({bands})")
    rows = num_hashes // bands
    _, banded = _minhash_banded(df, id_col, text_col, shingle_k,
                                num_hashes, bands, rows, seed)
    per_bucket = banded.groupBy("band_id", "band_hash").agg(
        F.count(F.lit(1)).alias("c"))
    over = F.col("c") > max_bucket_size
    return per_bucket.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("c").alias("banded_rows"),
        F.sum(F.when(over, 1).otherwise(0)).alias("dropped_buckets"),
        F.sum(F.when(over, F.col("c")).otherwise(0))
        .alias("rows_in_dropped_buckets"),
        F.max("c").alias("max_bucket"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    seed: int = 42,
    max_bucket_size: int | None = 1000,
    jaccard_threshold: float = 0.5,
    bucket_cap_observation=None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH, exact-Jaccard verified.

    Returns (id_a, id_b, jaccard) with id_a < id_b and
    jaccard >= ``jaccard_threshold``.

    Candidate generation: band the signature into ``bands`` groups of
    ``num_hashes/bands`` values; docs colliding on any full band become a
    candidate pair (equi-join on (band_id, band_hash)). Verification: exact
    Jaccard on the shingle arrays of candidates only.
    ``max_bucket_size=None`` skips the degenerate-bucket cap (and its
    window pass) entirely — for corpora known to lack hot buckets.
    """
    if num_hashes % bands:
        raise ValueError(f"num_hashes ({num_hashes}) must divide evenly "
                         f"into bands ({bands})")
    rows = num_hashes // bands
    # Stage layout is driven by what each shuffle CARRIES, not just how
    # many shuffles there are — the hashed-shingle arrays (~8 bytes x
    # shingle count per doc) must never ride through the wide exchanges:
    #  1. exchange RAW text (small rows) — spreads a single input file
    #     across the cluster;
    #  2. one md5 per shingle → 60-bit long array `hm` (the only expensive
    #     hashing, done exactly once, in parallel); the doc_id-keyed
    #     exchange below it is reused by the two verify-side joins;
    #  3. banding/candidate generation moves (doc_id, band) rows ONLY —
    #     ids, never arrays. The signature collapses to band hashes in one
    #     aggregate pass over `hm` (not num_hashes transform+array_min
    #     passes: those materialize num_hashes temp arrays per row).
    #  4. candidate id-pairs dedupe while still array-free, and the shingle
    #     arrays are re-attached by two doc_id equi-joins against the stage-2
    #     exchange — each array crosses the wire once per side, not once per
    #     duplicated candidate.
    hashed, banded = _minhash_banded(df, id_col, text_col, shingle_k,
                                     num_hashes, bands, rows, seed)
    if max_bucket_size is not None:
        banded = _cap_buckets(banded, max_bucket_size,
                              bucket_cap_observation)

    a = banded.select("band_id", "band_hash", F.col("doc_id").alias("id_a"))
    b = banded.select("band_id", "band_hash", F.col("doc_id").alias("id_b"))
    cands = _dedup_pairs(
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b"), df)
    # exact Jaccard verified on the hashed shingle arrays: identical to
    # string-shingle Jaccard up to 60-bit hash collisions (~2^-61 per pair)
    # and far cheaper to intersect/carry.
    pairs = cands.join(hashed.select(F.col("doc_id").alias("id_a"),
                                     F.col("hm").alias("sh_a")), "id_a") \
                 .join(hashed.select(F.col("doc_id").alias("id_b"),
                                     F.col("hm").alias("sh_b")), "id_b")
    return jaccard_verified_pairs(pairs, "sh_a", "sh_b", jaccard_threshold)


def minhash_lsh_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 5,
    num_hashes: int = 16,
    bands: int | None = None,
    seed: int = 42,
    max_bucket_size: int | None = 1000,
    containment_threshold: float = 0.5,
    bucket_cap_observation=None,
) -> DataFrame:
    """Asymmetric near-dup pairs: Jaccard CONTAINMENT |A∩B|/|A| (and
    /|B|) over LSH-banded candidates — catches sub/superset duplication
    (one doc embedded in a longer one) that symmetric Jaccard scores low
    because the union is dominated by the longer side, and classifies
    each surviving pair by its asymmetry.

    Same sub-quadratic candidate machinery as :func:`minhash_lsh_pairs`
    (banded signatures, bucket equi-join, bucket-size cap) — the scale
    path, vs the blocked all-pairs verifier tier. Recall note: MinHash
    band-collision probability is ~J^rows where J is the SYMMETRIC
    Jaccard, and the pairs this operator exists to find (one doc
    embedded in a much longer one) have LOW symmetric Jaccard even at
    containment 1.0 — multi-row bands would recall almost none of them.
    ``bands`` therefore defaults to ``num_hashes`` (one signature row
    per band, collision prob ~J per band — the permissive end of the
    S-curve), trading more candidate pairs for the recall the operator
    is for; the exact containment verifier below prunes the extras.
    Callers that want a tighter candidate set (higher-J subsets only)
    pass a smaller ``bands`` explicitly.

    The flip side of the permissive default: single-hash bands collide
    with probability ~J, so corpora with common boilerplate shingles grow
    hot buckets, and ``max_bucket_size`` silently drops them — exactly
    the recall the default buys. Pass a ``pyspark.sql.Observation`` as
    ``bucket_cap_observation`` to surface dropped-bucket/row counts on
    your own action (see :func:`_cap_buckets`); nonzero drops mean raise
    the cap, strip boilerplate shingles, or accept the recall loss
    knowingly. Emits pairs where ``|A∩B| / min(|A|, |B|)`` >= the
    threshold, with both directions' containments.
    """
    if bands is None:
        bands = num_hashes
    if num_hashes % bands:
        raise ValueError(f"num_hashes ({num_hashes}) must divide evenly "
                         f"into bands ({bands})")
    rows = num_hashes // bands
    hashed, banded = _minhash_banded(df, id_col, text_col, shingle_k,
                                     num_hashes, bands, rows, seed)
    if max_bucket_size is not None:
        banded = _cap_buckets(banded, max_bucket_size,
                              bucket_cap_observation)
    a = banded.select("band_id", "band_hash", F.col("doc_id").alias("id_a"))
    b = banded.select("band_id", "band_hash", F.col("doc_id").alias("id_b"))
    cands = _dedup_pairs(
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b"), df)
    pairs = cands.join(hashed.select(F.col("doc_id").alias("id_a"),
                                     F.col("hm").alias("sh_a")), "id_a") \
                 .join(hashed.select(F.col("doc_id").alias("id_b"),
                                     F.col("hm").alias("sh_b")), "id_b")
    # alias the intersection before filtering (the jaccard_verified_pairs
    # rationale): one array_intersect per pair feeds both directions
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    return (pairs.withColumn("n_shared", inter)
            .filter(F.col("n_shared")
                    / F.least(F.size("sh_a"), F.size("sh_b"))
                    >= containment_threshold)
            .select("id_a", "id_b", "n_shared",
                    F.round(F.col("n_shared").cast("double")
                            / F.size("sh_a"), 6).alias("containment_a"),
                    F.round(F.col("n_shared").cast("double")
                            / F.size("sh_b"), 6).alias("containment_b")))


def minhash_lsh_pairs_bipartite(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    seed: int = 42,
    max_bucket_size: int | None = None,
    jaccard_threshold: float = 0.5,
    bucket_cap_observation=None,
) -> DataFrame:
    """Cross-CORPUS near-duplicate pairs: (id_a ∈ left, id_b ∈ right,
    jaccard) — fuzzy decontamination, the near-dup generalization of
    n-gram contamination checks: an eval document that survives exact
    13-gram screening still leaks if a TRAINING document is a light
    paraphrase/near-copy of it. Both corpora are signed with the SAME
    seeded MinHash coefficients (band hashes are only comparable under
    identical coefficients), banded independently, and candidates come
    from the left-bands ⋈ right-bands equi-join on (band_id, band_hash)
    — never a self-join, so a doc duplicated WITHIN one corpus costs
    nothing here. Verification is exact Jaccard on candidates only.

    Scale shape is :func:`minhash_lsh_pairs` with the self-join replaced
    by the bipartite join: the eval/benchmark side is typically tiny, so
    its banded rows broadcast and the training corpus streams past them
    map-side. ``max_bucket_size`` caps the LEFT side's hot buckets (the
    big side; a viral boilerplate band would otherwise multiply against
    every right-side collision).
    """
    if num_hashes % bands:
        raise ValueError(f"num_hashes ({num_hashes}) must divide evenly "
                         f"into bands ({bands})")
    rows = num_hashes // bands
    hashed_l, banded_l = _minhash_banded(left, id_col, text_col, shingle_k,
                                         num_hashes, bands, rows, seed)
    hashed_r, banded_r = _minhash_banded(right, id_col, text_col, shingle_k,
                                         num_hashes, bands, rows, seed)
    if max_bucket_size is not None:
        banded_l = _cap_buckets(banded_l, max_bucket_size,
                                bucket_cap_observation)
    cands = _dedup_pairs(
        banded_l.select("band_id", "band_hash",
                        F.col("doc_id").alias("id_a"))
        .join(banded_r.select("band_id", "band_hash",
                              F.col("doc_id").alias("id_b")),
              ["band_id", "band_hash"])
        .select("id_a", "id_b"), left)
    pairs = cands.join(hashed_l.select(F.col("doc_id").alias("id_a"),
                                       F.col("hm").alias("sh_a")), "id_a") \
                 .join(hashed_r.select(F.col("doc_id").alias("id_b"),
                                       F.col("hm").alias("sh_b")), "id_b")
    return jaccard_verified_pairs(pairs, "sh_a", "sh_b", jaccard_threshold)


def build_near_dup_index(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    table_prefix: str,
    *,
    shingle_k: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    seed: int = 42,
    num_buckets: int = 32,
) -> None:
    """Persist the corpus's MinHash index as two hash-BUCKETED tables so
    later batches are near-dup screened WITHOUT re-signing (or even
    re-shuffling) the corpus — the fuzzy completion of q143's exact-digest
    admission front door (r11 verdict #8).

    - ``{prefix}_bands``  (band_key string, doc_id long), bucketed by
      ``band_key`` = ``band_id || ':' || band_hash`` (one join key, so the
      bucketed scan's hash partitioning satisfies the admission join's
      distribution exactly — a two-column key would need both sides
      co-bucketed on the pair);
    - ``{prefix}_shingles`` (doc_id, hm array<long>), bucketed by
      ``doc_id`` for the exchange-free verify-side array attach.

    Build cost is one signing pass over the corpus — paid ONCE; every
    refresh after that signs only the arriving batch. At 100 TB the band
    index is ids+32-char keys (a few % of corpus bytes) and the shingle
    store rides the same bucket layout every batch join reuses.
    """
    from league_of_legends_data_pipeline_spark.sinks import (
        drop_managed_table, write_bucketed,
    )

    if num_hashes % bands:
        raise ValueError(f"num_hashes ({num_hashes}) must divide evenly "
                         f"into bands ({bands})")
    rows = num_hashes // bands
    spark = corpus.sparkSession
    # a prior session's warehouse leftovers would fail the saveAsTable
    drop_managed_table(spark, f"{table_prefix}_bands")
    drop_managed_table(spark, f"{table_prefix}_shingles")
    # materialize=True: the two bucketed writes below are separate
    # actions, and runtime exchange reuse does not span jobs — without
    # the checkpoint each write re-ran the full corpus signing pass.
    # The writes themselves are independent, so overlap them from a
    # 2-thread driver pool (guide §2.6).
    hashed, banded = _minhash_banded(corpus, id_col, text_col, shingle_k,
                                     num_hashes, bands, rows, seed,
                                     materialize=True)
    band_key = F.concat_ws(":", F.col("band_id").cast("string"),
                           F.col("band_hash"))
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=2) as pool:
        fb = pool.submit(
            write_bucketed,
            banded.select(band_key.alias("band_key"), "doc_id"),
            f"{table_prefix}_bands", ["band_key"], num_buckets)
        fs = pool.submit(
            write_bucketed, hashed.select("doc_id", "hm"),
            f"{table_prefix}_shingles", ["doc_id"], num_buckets)
        fb.result(), fs.result()


def near_dup_admission(
    batch: DataFrame,
    id_col: str,
    text_col: str,
    table_prefix: str,
    *,
    shingle_k: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    seed: int = 42,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Screen an arriving batch against a :func:`build_near_dup_index`
    store: returns the batch's rows with ``n_near_dups`` (count of corpus
    docs whose exact Jaccard with the doc is >= threshold) and
    ``admitted`` (no near-dup found). MinHash parameters MUST match the
    ones the index was built with (band hashes are only comparable under
    identical seeded coefficients).

    Scale shape: only the BATCH is signed; candidates come from the
    batch-bands equi-join against the bucketed band index (corpus side:
    bucketed scan, ZERO exchange — pinned in
    tests/test_operators.py::test_near_dup_admission_index_side_is_exchange_free),
    verification re-attaches corpus shingle arrays from the bucketed
    shingle store (again exchange-free on the corpus side). Each refresh
    therefore shuffles O(batch) rows regardless of corpus size.
    """
    if num_hashes % bands:
        raise ValueError(f"num_hashes ({num_hashes}) must divide evenly "
                         f"into bands ({bands})")
    rows = num_hashes // bands
    spark = batch.sparkSession
    hashed_b, banded_b = _minhash_banded(batch, id_col, text_col, shingle_k,
                                         num_hashes, bands, rows, seed)
    band_key = F.concat_ws(":", F.col("band_id").cast("string"),
                           F.col("band_hash"))
    idx = spark.table(f"{table_prefix}_bands")
    cands = _dedup_pairs(
        banded_b.select(band_key.alias("band_key"),
                        F.col("doc_id").alias("id_b"))
        .join(idx.select("band_key", F.col("doc_id").alias("id_a")),
              "band_key")
        .select("id_a", "id_b"), batch)
    store = spark.table(f"{table_prefix}_shingles")
    pairs = (
        cands.join(store.select(F.col("doc_id").alias("id_a"),
                                F.col("hm").alias("sh_a")), "id_a")
        .join(hashed_b.select(F.col("doc_id").alias("id_b"),
                              F.col("hm").alias("sh_b")), "id_b")
    )
    verified = jaccard_verified_pairs(pairs, "sh_a", "sh_b",
                                      jaccard_threshold)
    counts = (verified.groupBy(F.col("id_b").alias("__id"))
              .agg(F.count(F.lit(1)).alias("n_near_dups")))
    return (batch.join(counts, batch[id_col] == F.col("__id"), "left")
            .drop("__id")
            .withColumn("n_near_dups",
                        F.coalesce(F.col("n_near_dups"), F.lit(0)))
            .withColumn("admitted", F.col("n_near_dups") == 0))


def simhash_from_hashes(hashes: Column, bits: int = 32) -> Column:
    """SimHash over an already-hashed token array (long values).

    Bit j is set when sum over tokens of (+1 if bit j of hash else -1) is
    positive. Implemented as ONE pass with an array-of-counters accumulator
    (zip_with inside aggregate): ``bits`` separate vote aggregates would
    generate enormous codegen (seconds of JIT per query) and re-walk the
    token array ``bits`` times. Bit extraction is ``(h div 2^j) mod 2`` on
    the non-negative 60-bit hashes — shift functions take only literal
    shift amounts. ``bits`` must be <= 60 (2^(j+1) literals in a signed long).
    """
    if bits > 60:
        raise ValueError("bits must be <= 60 (2^(j+1) literals in a signed long)")
    pow2 = F.array(*[F.lit(1 << j).cast("long") for j in range(bits)])
    zero = F.array_repeat(F.lit(0).cast("long"), bits)
    # bit test as (h mod 2p) >= p: pure integer ops — `/` would go through
    # double (53-bit mantissa loses bits of a 60-bit hash) and shift
    # functions only accept literal shift amounts
    counts = F.aggregate(
        hashes, zero,
        lambda acc, h: F.zip_with(
            acc, pow2,
            lambda c, p: c + F.when((h % (p * 2)) >= p, 1).otherwise(-1)),
    )
    bitvals = F.zip_with(
        counts, pow2,
        lambda c, p: F.when(c > 0, p).otherwise(F.lit(0).cast("long")))
    return F.aggregate(bitvals, F.lit(0).cast("long"), lambda a, x: a + x)


def simhash_signature_table(
    hashed: DataFrame,
    id_col: str,
    ht_col: str,
    bits: int = 32,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """(id, *extra, sig) SimHash signatures from pre-hashed token arrays —
    all ``bits`` majority votes in one numpy pass per Arrow batch.

    Same vectorization rationale as :func:`minhash_signature_table`: the
    pure-Column form (:func:`simhash_from_hashes`) expands to a wide
    aggregate/zip_with codegen tree whose one-time JIT was measured at
    ~11 s for bits=60 (BENCH_DETAIL cold_first_run q44, round 3) — paid on
    every fresh plan, i.e. every new (session, query) pair on a real
    cluster. The integer arithmetic (bit j set when the +1/-1 token vote
    sum is positive) is bit-identical, so DuckDB oracles replicating the
    scheme are unaffected; md5 token hashing stays JVM-side upstream,
    keeping the portable-hash contract in one place. A null token array
    (null text) yields a null signature, matching the Column form's null
    propagation.
    """
    import numpy as np
    import pandas as pd

    extra_cols = extra_cols or []
    weights = (np.int64(1) << np.arange(bits, dtype=np.int64))

    # NULL QUARANTINE (same hazard as minhash_signature_table): one null
    # list OR null element per Arrow batch floats the whole chunk's
    # values buffer and silently rounds 60-bit hashes. Null must map to
    # null SIG here, so null-ness travels as a sidecar flag and the list
    # goes over as empty/stripped.
    hashed = hashed.select(
        id_col, *extra_cols,
        F.col(ht_col).isNull().alias("__was_null"),
        F.coalesce(F.filter(F.col(ht_col), lambda x: x.isNotNull()),
                   F.array().cast("array<long>")).alias(ht_col))

    def signature(batches):
        for pdf in batches:
            sigs: list[int | None] = []
            for ht, was_null in zip(pdf[ht_col], pdf["__was_null"]):
                if was_null:
                    sigs.append(None)
                    continue
                h = np.asarray(ht, dtype=np.int64)
                if h.size == 0:
                    sigs.append(0)
                    continue
                # votes_j = 2 * (count of tokens with bit j set) - n
                ones = ((h[:, None] >> np.arange(bits)) & 1).sum(axis=0)
                sigs.append(int(weights[2 * ones > h.size].sum()))
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                **{c: pdf[c].to_numpy() for c in extra_cols},
                "sig": pd.array(sigs, dtype="Int64"),
            })

    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}"
         for f in hashed.select(id_col, *extra_cols).schema.fields]
        + ["sig long"])
    return hashed.select(id_col, *extra_cols, "__was_null", ht_col) \
        .mapInPandas(signature, schema)


def simhash_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """(id, *extra, sig) SimHash straight from TEXT in one Arrow stage:
    whitespace tokenize → md5 top-60-bit hash per token → all ``bits``
    majority votes, fused.

    Same rationale as :func:`minhash_table`: the per-token
    ``transform(toks, portable_hash64)`` Column form runs interpreted
    (nested higher-order functions fall out of codegen) and its list
    output pays the Arrow list round trip into the vote stage. Hash
    values and votes are bit-identical to the split path
    (:func:`simhash_signature_table`, kept for pre-hashed inputs) —
    pinned by a pytest oracle. The whitespace class is explicit
    ([ \\t\\n\\x0b\\f\\r], Java's ASCII \\s) so Python and JVM
    tokenization agree character-for-character; null text → null sig,
    empty/whitespace-only text → sig 0, matching the split path.
    """
    import re

    import numpy as np
    import pandas as pd

    extra_cols = extra_cols or []
    weights_hi = (np.int64(1) << np.arange(bits, dtype=np.int64))
    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def signature(batches):
        import hashlib
        md5 = hashlib.md5
        for pdf in batches:
            sigs: list[int | None] = []
            for t in pdf[text_col]:
                if t is None:
                    sigs.append(None)
                    continue
                toks = [x for x in ws.split(t) if x]
                if not toks:
                    sigs.append(0)
                    continue
                hs = np.fromiter(
                    (int.from_bytes(md5(x.encode("utf-8")).digest()[:8],
                                    "big") >> 4 for x in toks),
                    dtype=np.int64, count=len(toks))
                ones = ((hs[:, None] >> np.arange(bits)) & 1).sum(axis=0)
                sigs.append(int(weights_hi[2 * ones > hs.size].sum()))
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                **{c: pdf[c].to_numpy() for c in extra_cols},
                "sig": pd.array(sigs, dtype="Int64"),
            })

    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}"
         for f in df.select(id_col, *extra_cols).schema.fields]
        + ["sig long"])
    return df.select(id_col, *extra_cols, text_col).mapInPandas(
        signature, schema)


def simhash64(tokens: Column, bits: int = 32) -> Column:
    """SimHash of a token array packed into one BIGINT (hashing inlined —
    convenient for small inputs; for corpus-scale use hash + exchange +
    :func:`simhash_from_hashes` as ``simhash_pairs`` does)."""
    return simhash_from_hashes(F.transform(tokens, portable_hash64), bits)


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    bits: int = 32,
    chunks: int = 4,
    max_hamming: int = 3,
    max_bucket_size: int = 1000,
    band_cols: list[str] | None = None,
) -> DataFrame:
    """Near-duplicate pairs with hamming(simhash) <= max_hamming.

    Pigeonhole banding: with ``chunks`` >= max_hamming + 1 chunks, any pair
    within the hamming budget agrees exactly on at least one chunk, so
    candidates come from an equi-join on (chunk_id, chunk_value) — lossless
    vs the all-pairs formulation. ``band_cols`` adds blocking keys (e.g.
    language) to the join. Tokens are whitespace-split with empties dropped.
    """
    if chunks < max_hamming + 1:
        raise ValueError("need chunks >= max_hamming + 1 for lossless banding")
    band_cols = band_cols or []
    chunk_bits = bits // chunks
    mask = (1 << chunk_bits) - 1
    # exchange the RAW text first (spreads a single input file across the
    # cluster), then hash each token exactly once above that exchange —
    # the md5 work runs at full parallelism and is never recomputed
    raw = df.select(
        F.col(id_col).alias("doc_id"), *band_cols,
        F.col(text_col).alias("__text"),
    ).repartition(_par(df), "doc_id")
    # second exchange: three consumers below (bucket counts + both
    # self-join sides) all reuse ONE materialized signature (ReuseExchange);
    # without it the fused tokenize+hash+vote pass runs three times. The
    # exchanged rows are (id, bands, 8-byte sig) — negligible at any scale.
    sigs = simhash_table(
        raw, "doc_id", "__text", bits, extra_cols=band_cols,
    ).repartition(_par(df), "doc_id")
    return hamming_pairs(sigs, "doc_id", "sig", bits=bits, chunks=chunks,
                         max_hamming=max_hamming,
                         max_bucket_size=max_bucket_size,
                         band_cols=band_cols)


def hamming_pairs(
    sigs: DataFrame,
    id_col: str,
    sig_col: str,
    *,
    bits: int = 32,
    chunks: int = 4,
    max_hamming: int = 3,
    max_bucket_size: int = 1000,
    band_cols: list[str] | None = None,
) -> DataFrame:
    """Generic hamming-distance near-dup join over ANY 64-bit-packed
    signature column (simhash, aHash/pHash media fingerprints, packed
    sketch bits): pairs with ``bit_count(xor) <= max_hamming``.

    The pigeonhole banding is the same lossless device as simhash_pairs
    (any pair within the budget agrees exactly on >= 1 of the ``chunks``
    chunks when chunks >= max_hamming + 1); ``max_bucket_size`` caps a
    degenerate chunk value (e.g. the all-zero signature of empty inputs)
    from going quadratic. Returns (id_a, id_b, hamming).
    """
    if chunks < max_hamming + 1:
        raise ValueError("need chunks >= max_hamming + 1 for lossless banding")
    band_cols = band_cols or []
    chunk_bits = bits // chunks
    mask = (1 << chunk_bits) - 1
    chunked = sigs.select(
        F.col(id_col).alias("__hid"), F.col(sig_col).alias("__sig"),
        *band_cols,
        F.posexplode(F.array(*[
            F.shiftright(F.col(sig_col), i * chunk_bits)
            .bitwiseAND(F.lit(mask))
            for i in range(chunks)
        ])).alias("chunk_id", "chunk_val"),
    )
    # bucket cap stays the groupBy+join form: an r13 interleaved A/B of
    # the window-count alternative (one shared exchange, the _cap_buckets
    # device) measured SLOWER here — steady 1.4-1.8 s vs 1.8-2.1 s on the
    # q44 simhash path and 5-10 s vs 8-18 s on the q181 audio path — the
    # partial-aggregated counts branch is cheaper than sorting every
    # chunk row for WindowExec.
    counts = chunked.groupBy("chunk_id", "chunk_val").agg(
        F.count(F.lit(1)).alias("__bc"))
    chunked = chunked.join(counts.filter(F.col("__bc") <= max_bucket_size),
                           ["chunk_id", "chunk_val"]).drop("__bc")
    a = chunked.select("chunk_id", "chunk_val", *band_cols,
                       F.col("__hid").alias("id_a"),
                       F.col("__sig").alias("sig_a"))
    b = chunked.select("chunk_id", "chunk_val", *band_cols,
                       F.col("__hid").alias("id_b"),
                       F.col("__sig").alias("sig_b"))
    return (
        a.join(b, ["chunk_id", "chunk_val", *band_cols])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming",
                    F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 3,
    band_cols: list[str] | None = None,
    length_col: str | None = None,
    length_tolerance: int = 5,
    threshold: float = 0.3,
    max_block_size: int = 10_000,
) -> DataFrame:
    """Exact n-gram Jaccard over a bounded candidate set.

    Candidates = pairs agreeing on ``band_cols`` with |length difference|
    <= tolerance (blocking). For unconstrained all-pairs at scale, use
    ``minhash_lsh_pairs`` — this operator is the exact verifier.
    (Verification intersects xxhash64-hashed shingle arrays — the
    minhash_lsh_pairs convention — so "exact" is collision-probability-
    exact, ~2^-64 per shingle pair; blocking is hash-free, so the
    candidate set itself is unaffected.)

    ``max_block_size`` is the quadratic-blowup guard (the q105
    ``max_codewords`` precedent): verification cost inside one block of
    size s is O(s²) shingle-set intersections, so a degenerate blocking
    key (one language, all lengths equal) silently turns the "bounded"
    verifier into all-pairs. Any (band, length-bucket) block larger than
    the cap raises with the offending block named — route such corpora
    through ``minhash_lsh_pairs`` + ``jaccard_verified_pairs`` instead.
    ``max_block_size=None`` disables the check (and the one small count
    aggregate it costs) for callers that have already bounded the blocks.
    """
    band_cols = band_cols or []
    # Order of operations matters for both parallelism and shuffle bytes:
    # exchange the RAW text first (small rows; spreads a single input file
    # across the cluster), and compute the shingle arrays after the
    # exchange so they are never serialized through a shuffle. r14 (the
    # prefix_filter_pairs hashed-shingle + attach-after convention):
    # shingles are carried as xxhash64 longs — Jaccard on the hashed
    # arrays is identical to string-set Jaccard up to 64-bit collisions
    # (~2^-64 per shingle pair, the minhash_lsh_pairs convention;
    # transform preserves array length, so set sizes match exactly) —
    # and the (id, hs) relation is checkpointed ONCE for its consumers
    # (guard count, both blocking-join sides, both verify attaches).
    # Previously the shingle projection re-ran per branch and the
    # 3x-exploded a-side shipped each doc's full STRING array through
    # the blocking exchange; now the blocking join moves (band, id, len)
    # rows only and arrays are re-attached by two doc_id equi-joins for
    # single-transfer verification. ABAB same session at sf0.1 (q25):
    # 2.0-2.4 s -> 1.37-1.6 s, 59196 result rows identical.
    w = max(length_tolerance, 1)
    docs = (
        df.select(
            F.col(id_col).alias("doc_id"),
            *[F.col(c) for c in band_cols],
            (F.col(length_col) if length_col else F.length(text_col))
            .alias("__len"),
            F.col(text_col).alias("__text"),
        )
        .repartition(_par(df), "doc_id")
        .select("doc_id", *band_cols, "__len",
                F.transform(char_shingles("__text", shingle_k),
                            lambda s: F.xxhash64(s)).alias("hs"))
        .localCheckpoint(eager=True)
    )
    # Length bucketing folds the |len_a - len_b| <= tol predicate into the
    # equi-join key: the build row sits in bucket floor(len/w); the probe row
    # checks buckets -1/0/+1 — every qualifying pair meets in exactly one
    # bucket, and the hash lookup prunes non-candidates instead of the join
    # condition evaluating per same-band pair.
    if max_block_size is not None:
        # one count over (band, bucket) key rows — no shingles, no text —
        # against the checkpointed relation the joins also read
        over = (docs.groupBy(*band_cols,
                             F.floor(F.col("__len") / w).alias("__lb"))
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > max_block_size)
                .orderBy(F.col("__n").desc())
                .first())
        if over is not None:
            key = {c: over[c] for c in band_cols} | {"len_bucket": over["__lb"]}
            raise ValueError(
                f"ngram_jaccard_pairs: block {key} holds {over['__n']} "
                f"docs (> max_block_size={max_block_size}); exact "
                f"verification is O(n²) per block — prune candidates "
                f"with minhash_lsh_pairs first, or raise/disable "
                f"max_block_size if the quadratic cost is intended")
    a = docs.select(
        *band_cols, F.col("doc_id").alias("id_a"),
        F.col("__len").alias("len_a"),
        F.explode(F.array(*[F.floor(F.col("__len") / w) + d for d in (-1, 0, 1)]))
         .alias("__lb"),
    )
    b = docs.select(*band_cols, F.col("doc_id").alias("id_b"),
                    F.col("__len").alias("len_b"),
                    F.floor(F.col("__len") / w).alias("__lb"))
    cands = (a.join(b, band_cols + ["__lb"]).filter(
        (F.col("id_a") < F.col("id_b"))
        & (F.abs(F.col("len_a") - F.col("len_b")) <= length_tolerance)
    ).select("id_a", "id_b")
     # no dedup needed (each pair meets in exactly one bucket) — the
     # explicit-count repartition alone spreads the verify stage, which
     # AQE otherwise coalesces to one task (see _dedup_pairs)
     .repartition(_par(df), "id_a", "id_b"))
    pairs = (
        cands.join(docs.select(F.col("doc_id").alias("id_a"),
                               F.col("hs").alias("sh_a")), "id_a")
        .join(docs.select(F.col("doc_id").alias("id_b"),
                          F.col("hs").alias("sh_b")), "id_b")
    )
    return jaccard_verified_pairs(pairs, "sh_a", "sh_b", threshold)


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    band_cols: list[str] | None = None,
    length_col: str | None = None,
    length_tolerance: int | None = None,
    max_distance: int = 5,
    max_block_size: int = 10_000,
) -> DataFrame:
    """Levenshtein near-dup pairs over a bounded candidate set:
    (id_a, id_b, distance) for blocked pairs with edit distance
    <= ``max_distance``. The typo/OCR-noise dedup tier: catches pairs
    whose shingle Jaccard stays high-ish but whose bytes differ by a
    handful of character edits (the case exact-digest dedup misses and
    full Jaccard over-triggers on).

    Same blocking/guard scheme as :func:`ngram_jaccard_pairs` — equal
    ``band_cols`` + length-bucketed |len diff| <= tolerance (a valid
    prune: edit distance >= length difference, so the blocking is
    LOSSLESS exactly when ``length_tolerance >= max_distance``).
    ``length_tolerance`` therefore defaults to ``max_distance`` — the
    no-missed-pairs condition — so default-parameter output is complete;
    callers who knowingly accept missing long-insertion pairs for a
    tighter candidate set pass a smaller tolerance explicitly.
    Verification is the JVM ``levenshtein`` expression — O(len²) per
    candidate pair, which is why ``max_block_size`` refuses degenerate
    blocks just like the Jaccard verifier.
    """
    if length_tolerance is None:
        length_tolerance = max_distance
    band_cols = band_cols or []
    raw = df.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in band_cols],
        (F.col(length_col) if length_col else F.length(text_col))
        .alias("__len"),
        F.col(text_col).alias("__text"),
    ).repartition(_par(df), "doc_id")
    w = max(length_tolerance, 1)
    if max_block_size is not None:
        over = (raw.groupBy(*band_cols,
                            F.floor(F.col("__len") / w).alias("__lb"))
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > max_block_size)
                .orderBy(F.col("__n").desc())
                .first())
        if over is not None:
            key = {c: over[c] for c in band_cols} | {"len_bucket": over["__lb"]}
            raise ValueError(
                f"edit_distance_pairs: block {key} holds {over['__n']} "
                f"docs (> max_block_size={max_block_size}); levenshtein "
                f"verification is O(n²·len²) per block — prune candidates "
                f"first or raise/disable max_block_size")
    a = raw.select(
        *band_cols, F.col("doc_id").alias("id_a"),
        F.col("__len").alias("len_a"), F.col("__text").alias("text_a"),
        F.explode(F.array(*[F.floor(F.col("__len") / w) + d
                            for d in (-1, 0, 1)])).alias("__lb"))
    b = raw.select(*band_cols, F.col("doc_id").alias("id_b"),
                   F.col("__len").alias("len_b"),
                   F.col("__text").alias("text_b"),
                   F.floor(F.col("__len") / w).alias("__lb"))
    # thresholded levenshtein (Spark 3.5+): banded DP that only fills the
    # 2k+1 diagonal and bails out (returns -1) once the distance provably
    # exceeds max_distance — O(len·k) per pair instead of O(len²), which
    # is the difference between "verifier" and "bottleneck" when candidate
    # texts are hundreds of chars and k is single-digit.
    return (a.join(b, band_cols + ["__lb"])
            .filter((F.col("id_a") < F.col("id_b"))
                    & (F.abs(F.col("len_a") - F.col("len_b"))
                       <= length_tolerance))
            .select("id_a", "id_b",
                    F.levenshtein("text_a", "text_b", max_distance)
                    .alias("distance"))
            .filter(F.col("distance") >= 0))


def _span_rows(df: DataFrame, id_col: str, text_col: str, span_len: int,
               stride: int = 1, with_pos: bool = False) -> DataFrame:
    """Exploded (id[, pos], span) window rows in one Arrow stage.

    The Column rendering — ``posexplode(transform(sequence, substr))`` —
    is interpreted end to end (higher-order functions are
    CodegenFallback), measured ~3 s at sf0.1 for the 1.4M windows of
    q103; this stage is plain string slicing in C-backed Python
    (~0.1 s), emitting Arrow arrays directly. ``pos`` is the 1-based
    character offset of the window start. Documents shorter than
    ``span_len`` yield no rows — the same contract as the Column form.
    """
    import pyarrow as pa

    import pyarrow as _pa

    id_type = df.schema[id_col].dataType.simpleString()
    pa_id = {"bigint": _pa.int64(), "int": _pa.int32(),
             "smallint": _pa.int16(), "string": _pa.string()}.get(
        id_type, _pa.int64())
    cols = [f"{id_col} {id_type}"] + (["pos int"] if with_pos else []) \
        + ["span string"]
    schema = ", ".join(cols)

    def gen(batches):
        for batch in batches:
            tbl = batch.to_pydict()
            ids_out: list = []
            pos_out: list[int] = []
            spans: list[str] = []
            for did, t in zip(tbl[id_col], tbl[text_col]):
                if not t:
                    continue
                top = len(t) - span_len
                for p in range(0, top + 1, stride):
                    ids_out.append(did)
                    spans.append(t[p:p + span_len])
                    if with_pos:
                        pos_out.append(p + 1)
            arrays = [pa.array(ids_out, pa_id)]
            names = [id_col]
            if with_pos:
                arrays.append(pa.array(pos_out, pa.int32()))
                names.append("pos")
            arrays.append(pa.array(spans, pa.string()))
            names.append("span")
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return df.select(id_col, text_col).mapInArrow(gen, schema)


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_len: int = 30,
    min_docs: int = 2,
    stride: int = 1,
    hash_spans: bool = False,
) -> DataFrame:
    """Exact duplicated-substring detection: every length-``span_len``
    character window of every document, grouped by content; spans seen in
    >= ``min_docs`` distinct documents come back as (span, n_docs, n_occ).

    The windowed form of exact substring dedup ("Deduplicating Training
    Data Makes Language Models Better", Lee et al. 2022 — the suffix-array
    formulation): a fixed window at every offset finds every cross-document
    duplicated run of length >= span_len (any such run contains at least
    one aligned window), trading the suffix array's arbitrary-length output
    for a shuffle-friendly plan. Everything stays in JVM codegen:
    sequence -> transform(substr) -> explode, then one groupBy with partial
    aggregation. Shuffle rows are (span_len chars, id) — never documents.

    100 TB levers, in order: raise ``stride`` (windows at every s-th
    offset still catch every run >= span_len + s - 1), hash the span into
    the grouping key keeping one exemplar string (``hash_spans=True`` —
    8-byte shuffle keys), or pre-filter
    with a frequency sketch so only candidate hashes shuffle. The
    every-offset exact form here is the ground-truth dual the stride/
    sketch variants are measured against.
    """
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    spans = _span_rows(df.repartition(_par(df), F.col(id_col)), id_col,
                       text_col, span_len, stride) \
        .withColumnRenamed(id_col, "__id")
    if hash_spans:
        # scale lever #2: group on an 8-byte xxhash64 instead of the
        # span_len-char string — the shuffle carries (8 bytes, id) and one
        # exemplar string rides along via first(). Collision probability
        # is ~n_windows²/2⁶⁵ (birthday bound on 64 bits) — negligible for
        # duplicate DETECTION; use the exact form when a false merge is
        # unacceptable.
        return (spans.groupBy(F.xxhash64("span").alias("span_hash"))
                .agg(F.first("span").alias("span"),
                     F.countDistinct("__id").alias("n_docs"),
                     F.count(F.lit(1)).alias("n_occ"))
                .filter(F.col("n_docs") >= min_docs)
                .select("span", "n_docs", "n_occ"))
    return (spans.groupBy("span")
            .agg(F.countDistinct("__id").alias("n_docs"),
                 F.count(F.lit(1)).alias("n_occ"))
            .filter(F.col("n_docs") >= min_docs))


def span_dedup_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_len: int = 30,
    stride: int = 1,
    max_dup_fraction: float = 0.5,
) -> DataFrame:
    """Drop documents whose fraction of windows duplicated ACROSS documents
    exceeds ``max_dup_fraction`` — the filter step of exact-substring dedup
    (Lee et al. 2022 remove duplicated text; this is the document-level
    policy form: a doc that is mostly boilerplate/copy goes entirely).

    Composition of :func:`duplicated_spans`: windows whose content appears
    in >= 2 distinct documents are "duplicated"; each document's duplicated
    fraction = duplicated windows / total windows. Documents shorter than
    ``span_len`` have no windows and are always kept (nothing to judge).

    Scale shape: the window relation is built ONCE and reused for both the
    cross-document span counts and the per-document totals (same
    sequence->transform->explode lineage); the only added shuffle beyond
    duplicated_spans is the per-document fraction aggregate, whose rows are
    (id, two longs). Returns the surviving rows of ``df`` plus their
    ``dup_fraction``.
    """
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    windows = _span_rows(df.repartition(_par(df), F.col(id_col)), id_col,
                         text_col, span_len, stride) \
        .withColumnRenamed(id_col, "__id")
    dup_spans = (windows.groupBy("span")
                 .agg(F.countDistinct("__id").alias("__nd"))
                 .filter(F.col("__nd") >= 2)
                 .select("span"))
    per_doc = (windows.join(dup_spans.withColumn("__dup", F.lit(1)),
                            "span", "left")
               .groupBy("__id")
               .agg(F.count(F.lit(1)).alias("__total"),
                    F.sum(F.coalesce(F.col("__dup"), F.lit(0)))
                     .alias("__dupn")))
    frac = (per_doc.select(
        F.col("__id"),
        (F.col("__dupn") / F.col("__total")).alias("dup_fraction")))
    return (df.join(frac, df[id_col] == frac["__id"], "left")
            .filter(F.col("dup_fraction").isNull()
                    | (F.col("dup_fraction") <= max_dup_fraction))
            .drop("__id")
            .withColumn("dup_fraction",
                        F.coalesce(F.col("dup_fraction"), F.lit(0.0))))


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_len: int = 30,
    min_docs: int = 2,
) -> DataFrame:
    """Cut cross-document duplicated text OUT of each document — the
    removal step of exact-substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better": duplicated substrings are
    REMOVED from the corpus, not whole documents dropped).

    Every length-``span_len`` window whose content appears in >=
    ``min_docs`` distinct documents is a duplicated interval
    ``[pos, pos+span_len)``; per document, overlapping/adjacent-by-overlap
    intervals are merged (gaps-and-islands) and the surviving text is the
    concatenation of the gaps. Returns ``df``'s (id, text) plus
    ``clean_text``, ``n_islands`` (merged removed regions) and
    ``removed_chars``. Documents with no duplicated window pass through
    unchanged (n_islands = 0).

    Scale shape: the span relation crosses the wire exactly ONCE — the
    groupBy(span) aggregation carries each occurrence's (id, pos) along
    in a map-side-partial collect_list, so the duplicated intervals
    explode straight out of the filtered groups instead of paying a
    second windows scan + join back (measured 7.0 → 3.4 s at sf0.1).
    Everything after moves (id, pos) int pairs. Island merging is the
    classic cumulative-max window, and the splice is a single sequential
    fold over each doc's ordered island array (``F.aggregate`` —
    O(islands) per doc, in codegen). The same ``stride``/``hash_spans``
    levers as :func:`duplicated_spans` apply upstream at 100 TB;
    every-offset exact form kept here because removal must not miss an
    aligned window. A span's occurrence list is bounded by its corpus
    frequency — the same quantity the group itself carries; a truly
    viral span (millions of occurrences) should be stripped by a
    frequency prefilter before removal, as in duplicated_spans.
    """
    t = F.col(text_col)
    windows = _span_rows(df.repartition(_par(df), F.col(id_col)), id_col,
                         text_col, span_len, with_pos=True) \
        .select(F.col(id_col).alias("__id"), F.col("pos").alias("__p1"),
                "span")
    occ = windows.groupBy("span").agg(
        F.collect_list(F.struct("__id", "__p1")).alias("__occ"))
    n_docs = F.size(F.array_distinct(
        F.transform(F.col("__occ"), lambda o: o["__id"])))
    # duplicated intervals, 1-based inclusive [s, e]
    hits = (occ.filter(n_docs >= min_docs)
            .select(F.explode("__occ").alias("o"))
            .select(F.col("o.__id").alias("__id"),
                    F.col("o.__p1").alias("s"),
                    (F.col("o.__p1") + span_len - 1).alias("e")))
    # gaps-and-islands: an interval starts a new island when it begins
    # past the running max end of everything before it
    w_ord = Window.partitionBy("__id").orderBy("s", "e")
    prev_max = F.max("e").over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1))
    isl = (hits
           .withColumn("__new", F.when(
               F.col("s") > F.coalesce(prev_max, F.lit(0)), 1).otherwise(0))
           .withColumn("__isl", F.sum("__new").over(
               w_ord.rowsBetween(Window.unboundedPreceding, 0)))
           .groupBy("__id", "__isl")
           .agg(F.min("s").alias("s"), F.max("e").alias("e")))
    islands = (isl.groupBy("__id")
               .agg(F.sort_array(F.collect_list(F.struct("s", "e")))
                    .alias("__islands")))
    joined = df.join(islands, df[id_col] == islands["__id"], "left")
    spliced = F.aggregate(
        F.col("__islands"),
        F.struct(F.lit(0).alias("prev"),
                 F.lit("").cast("string").alias("acc")),
        lambda a, s: F.struct(
            s["e"].alias("prev"),
            F.concat(a["acc"],
                     t.substr(a["prev"] + 1, s["s"] - a["prev"] - 1))
            .alias("acc")),
        lambda a: F.concat(a["acc"], t.substr(a["prev"] + 1,
                                              F.length(t) - a["prev"])))
    return (joined
            .withColumn("clean_text",
                        F.when(F.col("__islands").isNull(), t)
                        .otherwise(spliced))
            .withColumn("n_islands",
                        F.coalesce(F.size("__islands"), F.lit(0)))
            .withColumn("removed_chars",
                        F.length(t) - F.length("clean_text"))
            .drop("__id", "__islands"))


# Rabin-Karp rolling-hash constants for cdc_chunks(mode="rolling").
# Arithmetic is uint64 wraparound (implicit mod 2^64): the base is odd
# (FNV-1a prime) so it is invertible mod 2^64, which is what lets the
# incremental prefix form recover every window hash in O(1)/byte; the
# mixer is the 64-bit golden-ratio constant (splitmix64 finalizer
# multiplier) so the boundary test reads well-mixed HIGH bits instead of
# the weak low bits of a raw polynomial hash.
_RK_BASE = 0x100000001B3
_RK_BASE_INV = pow(_RK_BASE, -1, 1 << 64)
_RK_MIX = 0x9E3779B97F4A7C15


def _rk_window_hash(data: bytes, window: int) -> list[int]:
    """Direct (non-incremental) per-window polynomial hash — the slow
    reference the property tests check the vectorized prefix form
    against. hash(i) covers bytes [i-window+1 .. i], newest byte gets
    weight base^0, all mod 2^64."""
    out = []
    mask = (1 << 64) - 1
    for i in range(window - 1, len(data)):
        h = 0
        for k in range(i - window + 1, i + 1):
            h = (h * _RK_BASE + data[k]) & mask
        out.append(h)
    return out


def _rk_boundary(h: int, modulus: int) -> bool:
    """Boundary predicate shared by the reference and vectorized paths."""
    return ((h * _RK_MIX & ((1 << 64) - 1)) >> 32) % modulus == 0


def _chunk_rows(out, did, raw, cuts, n_units, digest):
    """Emit (id, chunk_idx, chunk_len, chunk_digest) rows for one doc.

    ``cuts`` are 1-based end positions; chunk_idx numbering matches the
    SQL path (posexplode BEFORE the empty-tail filter — only the tail
    can be empty, when a cut lands exactly at the end)."""
    bounds = [0] + cuts + [n_units]
    idx = 0
    for a, b in zip(bounds[:-1], bounds[1:]):
        n = b - a
        if n > 0:
            out[0].append(did)
            out[1].append(idx)
            out[2].append(n)
            out[3].append(digest(raw[a:b]))
        idx += 1


def cdc_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    window: int = 16,
    modulus: int = 64,
    fast_hash: bool = False,
    mode: str | None = None,
    engine: str = "arrow",
) -> DataFrame:
    """Content-defined chunking (rsync/LBFS-style): cut each document
    where the hash of the trailing ``window`` units ≡ 0 mod ``modulus``
    — boundaries are decided by CONTENT, so an insertion near the front
    shifts only the chunks it touches and everything after the next
    boundary re-aligns. Fixed-offset chunking loses every chunk after an
    edit; CDC is why chunk-level storage dedup survives document
    revisions. Expected chunk length ~ ``modulus`` units.

    Returns (id, chunk_idx, chunk_len, chunk_digest) — one row per
    chunk, digests only (chunk text never leaves the row); downstream
    chunk-level dedup shuffles 16-byte digests, never text. Documents
    shorter than ``window`` form one whole-document chunk; empty/null
    text yields no rows. The raw text is exchanged across the cluster
    FIRST (the simhash_pairs pattern): a corpus landing in a few large
    files would otherwise scan in as few tasks as there are files.

    Three hash modes (boundaries differ BETWEEN modes — pick one per
    corpus and stay with it):

    - ``mode="md5"`` (default): engine-portable boundaries a DuckDB
      oracle replicates verbatim (md5 of each ``window``-char substring,
      top 60 bits mod ``modulus``; units = characters). Two bit-identical
      engines, property-tested equal: ``engine="arrow"`` (default) scans
      in an Arrow mapInPandas stage — one C md5 over the raw window
      bytes per position, no hex-string round trip, measured ~3x the
      Column form; ``engine="sql"`` is the pure Column-expression
      rendering (zero Python, the shape the oracle SQL mirrors).
    - ``mode="xxhash"`` (or legacy ``fast_hash=True``): JVM xxhash64 on
      the window substring — Column-only, no oracle (measured only 1.3x:
      per-window SUBSTRING materialization dominates, which is the
      argument for the rolling mode).
    - ``mode="rolling"``: the 100 TB production lever — true Rabin-Karp
      over UTF-8 BYTES (units = bytes), O(1)/byte instead of
      O(window)/char. One vectorized numpy pass per Arrow batch over the
      CONCATENATED batch bytes: window hashes come from the prefix form
      ``H_i = base^i * (T_i - T_{i-w})`` with ``T`` a cumulative sum of
      ``byte_k * base^{-k}`` (uint64 wraparound; base odd, hence
      invertible), so the per-byte cost is a handful of elementwise
      uint64 ops — no per-window loop in ANY language. Windows that
      straddle document edges are masked out by position, so batching
      does not change boundaries. Oracle-exempt (no engine-portable SQL
      rendering of wraparound uint64 arithmetic exists); correctness is
      pinned by property tests against the direct per-window reference
      (:func:`_rk_window_hash`) and the edit-stability suite.
    """
    if window < 2 or modulus < 2:
        raise ValueError("window and modulus must each be >= 2")
    if mode is None:
        mode = "xxhash" if fast_hash else "md5"
    if mode not in ("md5", "xxhash", "rolling"):
        raise ValueError(f"unknown cdc_chunks mode {mode!r}")
    df = df.repartition(_par(df), F.col(id_col))
    if mode == "rolling":
        return _cdc_chunks_rolling(df, id_col, text_col, window, modulus)
    if mode == "md5" and engine == "arrow":
        return _cdc_chunks_md5_arrow(df, id_col, text_col, window, modulus)
    t = F.col(text_col)
    L = F.length(t)
    if mode == "xxhash":
        wh = lambda i: F.pmod(
            F.xxhash64(t.substr(i - window + 1, F.lit(window))),
            F.lit(modulus))
    else:
        wh = lambda i: F.conv(F.substring(F.md5(
            t.substr(i - window + 1, F.lit(window))), 1, 15), 16, 10) \
            .cast("long") % modulus
    cuts = F.filter(F.sequence(F.lit(window), F.greatest(L, F.lit(window))),
                    lambda i: (i <= L) & (wh(i) == 0))
    starts = F.concat(F.array(F.lit(0)), cuts)
    ends = F.concat(cuts, F.array(L))
    chunks = F.zip_with(
        starts, ends,
        lambda a, b: F.struct(t.substr(a + 1, b - a).alias("c"),
                              (b - a).alias("n")))
    return (
        df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx",
                                                            "__ch"))
        .filter(F.col("__ch.n") > 0)  # a cut at the exact end → empty tail
        .select(id_col, "chunk_idx",
                F.col("__ch.n").alias("chunk_len"),
                F.md5(F.col("__ch.c")).alias("chunk_digest"))
    )


def _cdc_out_schema(df: DataFrame, id_col: str) -> str:
    return (f"{id_col} {df.schema[id_col].dataType.simpleString()}, "
            "chunk_idx int, chunk_len int, chunk_digest string")


def _cdc_chunks_md5_arrow(df: DataFrame, id_col: str, text_col: str,
                          window: int, modulus: int) -> DataFrame:
    """md5-mode boundary scan as an Arrow stage — bit-identical cuts to
    the Column form (same md5-of-window-chars, top-60-bits test; ASCII
    docs slice a pre-encoded bytes buffer, non-ASCII fall back to char
    slicing so the window stays ``window`` CHARS, exactly matching
    ``F.md5(substr(...))`` which hashes the chars' UTF-8 bytes)."""
    import pandas as pd

    def scan(batches):
        import hashlib
        md5 = hashlib.md5
        for pdf in batches:
            out = ([], [], [], [])
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None or len(text) == 0:
                    continue
                L = len(text)
                cuts = []
                if L >= window:
                    if text.isascii():
                        b = text.encode()
                        for i in range(window, L + 1):
                            d = md5(b[i - window:i]).digest()
                            if (int.from_bytes(d[:8], "big") >> 4) \
                                    % modulus == 0:
                                cuts.append(i)
                    else:
                        for i in range(window, L + 1):
                            d = md5(text[i - window:i]
                                    .encode("utf-8")).digest()
                            if (int.from_bytes(d[:8], "big") >> 4) \
                                    % modulus == 0:
                                cuts.append(i)
                _chunk_rows(out, did, text, cuts, L,
                            lambda c: md5(c.encode("utf-8")).hexdigest())
            yield pd.DataFrame({id_col: out[0], "chunk_idx": out[1],
                                "chunk_len": out[2], "chunk_digest": out[3]})

    return df.select(id_col, text_col).mapInPandas(
        scan, _cdc_out_schema(df, id_col))


def _cdc_chunks_rolling(df: DataFrame, id_col: str, text_col: str,
                        window: int, modulus: int) -> DataFrame:
    """Rabin-Karp mode: one vectorized uint64 pass over the concatenated
    batch bytes (see :func:`cdc_chunks` docstring for the math)."""
    import numpy as np
    import pandas as pd

    def scan(batches):
        import hashlib
        md5 = hashlib.md5
        u64 = np.uint64
        base, binv, mix = u64(_RK_BASE), u64(_RK_BASE_INV), u64(_RK_MIX)
        for pdf in batches:
            ids, texts = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                b = text.encode("utf-8")
                if b:
                    ids.append(did)
                    texts.append(b)
            out = ([], [], [], [])
            if ids:
                lens = np.fromiter((len(b) for b in texts), dtype=np.int64,
                                   count=len(texts))
                offs = np.concatenate(([0], np.cumsum(lens)))
                blob = np.frombuffer(b"".join(texts), dtype=np.uint8)
                n = blob.size
                g = np.empty(0, dtype=np.int64)
                if n >= window:
                    c = blob.astype(np.uint64)
                    bp = np.full(n, base, dtype=np.uint64)
                    bp[0] = 1
                    np.cumprod(bp, out=bp)          # base^i  (mod 2^64)
                    dp = np.full(n, binv, dtype=np.uint64)
                    dp[0] = 1
                    np.cumprod(dp, out=dp)          # base^-i (mod 2^64)
                    T = np.cumsum(c * dp, dtype=np.uint64)
                    diff = T[window - 1:].copy()
                    diff[1:] -= T[:n - window]
                    hw = bp[window - 1:] * diff     # window hash at i>=w-1
                    hit = (((hw * mix) >> u64(32)) % u64(modulus)) == 0
                    # global END positions (1-based within the blob)
                    g = np.flatnonzero(hit).astype(np.int64) + window
                for k, (did, raw) in enumerate(zip(ids, texts)):
                    s, e = offs[k], offs[k + 1]
                    # a valid cut's window must sit fully inside the doc:
                    # end position >= s + window, <= e
                    lo = np.searchsorted(g, s + window)
                    hi = np.searchsorted(g, e, side="right")
                    cuts = (g[lo:hi] - s).tolist()
                    _chunk_rows(out, did, raw, cuts, len(raw),
                                lambda cb: md5(cb).hexdigest())
            yield pd.DataFrame({id_col: out[0], "chunk_idx": out[1],
                                "chunk_len": out[2], "chunk_digest": out[3]})

    return df.select(id_col, text_col).mapInPandas(
        scan, _cdc_out_schema(df, id_col))


def prefix_filter_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.5,
    shingle_n: int = 1,
) -> DataFrame:
    """LOSSLESS sub-quadratic set-similarity self-join via prefix
    filtering (AllPairs/PPJoin family, Bayardo et al. WWW'07 /
    Xiao et al. WWW'08): (id_a, id_b, jaccard) for every pair of docs
    whose word-set Jaccard >= ``threshold`` — exact recall, unlike the
    probabilistic MinHash tier (``minhash_lsh_pairs``).

    Principle: order the token universe globally by ascending document
    frequency (rarest first, token string as tie-break). If
    J(A, B) >= t then |A ∩ B| >= ceil(t·max(|A|,|B|)), so A and B must
    share at least one token within each one's first
    ``|T| - ceil(t·|T|) + 1`` tokens under that global order (the
    "prefix"). Candidates are therefore generated by an equi-join on
    PREFIX tokens only — and because the prefix holds each doc's RAREST
    tokens, join buckets are self-limiting: a token appearing in k docs
    fans out at most k² candidate slots, and high-frequency tokens
    (the quadratic killers) are exactly the ones the ordering pushes
    OUT of prefixes. The size filter min >= t·max prunes length-skewed
    candidates before verification; exact Jaccard on the distinct-token
    arrays verifies survivors.

    Shuffle discipline mirrors ``minhash_lsh_pairs``: the candidate
    join moves (token_hash, doc_id, size, rank) rows only — never
    arrays or token strings (the join key is ``xxhash64(tok)``, 8
    bytes, instead of the shingle string; a hash collision can only
    ADD a candidate pair, which exact verification removes, so the
    key narrowing is lossless) — and the token arrays are re-attached
    by two doc_id equi-joins for single-transfer verification.
    Verification intersects arrays of the same 64-bit token hashes
    rather than the shingle strings (the ``minhash_lsh_pairs`` hashed-
    shingle convention: identical to string-set Jaccard up to 64-bit
    collisions, ~2^-64 per token pair, and several times cheaper to
    carry and intersect).

    100 TB shape: one explode + one token-frequency aggregate + one
    per-doc window (partitioned by doc — no global sort) + one
    prefix-token equi-join. Everything is linear in corpus size except
    the candidate join, whose fan-out is bounded by prefix-token
    rarity; corpora with degenerate vocabularies (every doc the same
    tokens) degrade gracefully to the same cost as their true output
    size, which is inherently quadratic for such corpora. The two
    ``localCheckpoint`` calls materialize corpus-linear relations (one
    (id, shingles) row per doc; one prefix row per prefix token) that
    are each consumed by 2+ downstream branches — without them the
    shingling projection ran once per branch (6 parquet scans in the
    r13 formatted plan) and the freq-join+window ran once per
    candidate-join side.

    Float guard: prefix length and the size filter subtract 1e-9
    before ceil/compare so binary-float dust (0.4*5 = 2.0000...4)
    can only lengthen a prefix, never shorten one — losslessness is
    preserved for any threshold.

    ``shingle_n`` picks the set representation: 1 = word unigrams
    (bag-of-words similarity), n>1 = space-joined word n-grams
    (sequence-aware — the right feature when the vocabulary is small
    relative to the corpus and unigram sets saturate).
    """
    from league_of_legends_data_pipeline_spark.operators.text import (
        tokens, word_ngrams,
    )

    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    t = float(threshold)
    elems = (tokens("__t") if shingle_n <= 1
             else word_ngrams("__t", shingle_n))
    # repartition the RAW (id, text) rows BEFORE the shingle projection —
    # projected-then-repartitioned, the projection sits under the exchange
    # and a single-file input shingles in one task; materialize the result
    # once for its 4 consumers (token explode used twice, both verify
    # sides). `hs` = per-token xxhash64, the narrow join/verify currency.
    docs = (
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t"))
        .repartition(_par(df), "doc_id")
        .select("doc_id", F.array_sort(F.array_distinct(elems)).alias("toks"))
        .filter(F.size("toks") > 0)
        .select("doc_id", "toks",
                F.transform("toks", lambda s: F.xxhash64(s)).alias("hs"))
        .localCheckpoint(eager=True)
    )
    tok_rows = docs.select(
        "doc_id", F.size("toks").alias("sz"),
        F.explode(F.arrays_zip("toks", "hs")).alias("__z")
    ).select("doc_id", "sz", F.col("__z.toks").alias("tok"),
             F.col("__z.hs").alias("h"))
    freq = tok_rows.groupBy("h").agg(F.count(F.lit(1)).alias("dfc"))
    # dfc is counted per HASH, not per token string: it equals the token's
    # document frequency except on 64-bit collisions, where colliding
    # tokens share one (slightly larger) dfc — still a function of the
    # token, so (dfc, tok) below remains a consistent GLOBAL total order
    # and the prefix guarantee holds exactly. The string tie-break keeps
    # the order total even across collisions.
    ranked = (
        tok_rows.join(freq, "h")
        .withColumn("rnk", F.row_number().over(
            Window.partitionBy("doc_id").orderBy("dfc", "tok")))
        .filter(F.col("rnk") <=
                F.col("sz") - F.ceil(F.lit(t) * F.col("sz") - 1e-9) + 1)
        .select("h", "doc_id", "sz", "rnk")
        .localCheckpoint(eager=True)
    )
    a = ranked.select("h", F.col("doc_id").alias("id_a"),
                      F.col("sz").alias("sz_a"),
                      F.col("rnk").alias("pos_a"))
    b = ranked.select("h", F.col("doc_id").alias("id_b"),
                      F.col("sz").alias("sz_b"),
                      F.col("rnk").alias("pos_b"))
    # PPJoin positional filter (Xiao et al. WWW'08): J >= t forces
    # overlap O >= ceil(t/(1+t) * (|A|+|B|)), and a shared token at
    # (1-based) global-order positions (i, j) bounds the achievable
    # overlap by 1 + min(|A|-i, |B|-j) — every other shared token must
    # sit strictly after it in BOTH docs.  Lossless because the FIRST
    # shared token of a true pair lies inside both prefixes (prefix
    # length |T| - ceil(t|T|) + 1 with the size filter guarantees it)
    # and trivially satisfies the bound; dropping later-position
    # generating occurrences only removes redundant candidate rows
    # BEFORE the dropDuplicates shuffle and the two array-attach joins
    # — the stages that dominate as token df grows with corpus size.
    # The epsilon inside ceil can only LOWER the requirement
    # (conservative, same guard direction as the prefix length).
    minoverlap = F.ceil(F.lit(t / (1.0 + t))
                        * (F.col("sz_a") + F.col("sz_b")) - 1e-9)
    cands = _dedup_pairs(
        a.join(b, "h")
        .filter((F.col("id_a") < F.col("id_b"))
                & (F.least("sz_a", "sz_b")
                   >= F.lit(t) * F.greatest("sz_a", "sz_b") - 1e-9)
                & (1 + F.least(F.col("sz_a") - F.col("pos_a"),
                               F.col("sz_b") - F.col("pos_b"))
                   >= minoverlap))
        .select("id_a", "id_b"), df)
    pairs = (
        cands.join(docs.select(F.col("doc_id").alias("id_a"),
                               F.col("hs").alias("sh_a")), "id_a")
        .join(docs.select(F.col("doc_id").alias("id_b"),
                          F.col("hs").alias("sh_b")), "id_b")
    )
    return jaccard_verified_pairs(pairs, "sh_a", "sh_b", t)


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    window: int = 5,
    prefix_len: int = 8,
    threshold: float = 0.3,
    shingle_n: int = 3,
) -> DataFrame:
    """Sorted-neighborhood near-dup blocking (Hernández & Stolfo
    SIGMOD'95, the record-linkage classic): sort the corpus by a
    content-derived key, compare each doc only against its ``window``
    rank-neighbors, verify survivors by exact word-shingle Jaccard.
    The third candidate-generation family next to probabilistic
    MinHash banding (q26/q35) and lossless prefix filtering (q186) —
    SNM wins when near-dups share a PREFIX (crawl re-fetches, version
    suffixes) because the sort clusters them regardless of how much
    tail text diverges.

    The sort key packs the first ``prefix_len`` normalized chars into
    one BIGINT (base-37 over [space, 0-9, a-z] — order-preserving, so
    lexicographic prefix order == numeric order; 37^12 still < 2^63).
    A numeric key matters: the distributed exact ranker range-buckets
    on its first column via percentile boundaries, keeping the global
    sort shuffle-parallel instead of single-partition.

    Shape: one slim (id, key) global rank (no arrays ride that
    shuffle), rank-offset explode (each doc probes ranks r+1..r+w —
    an equi-join, not a range predicate), and shingle arrays attach by
    two id equi-joins for the verify only. Linear in corpus size with
    a fixed w-fold candidate fan-out.
    """
    from league_of_legends_data_pipeline_spark.operators.sampling import (
        global_rank,
    )
    from league_of_legends_data_pipeline_spark.operators.text import (
        normalize_text, tokens, word_ngrams,
    )

    if prefix_len > 12:
        raise ValueError("prefix_len > 12 overflows the base-37 BIGINT key")
    # Normalize only a bounded RAW prefix (8x the packed length is ample
    # headroom for dropped punctuation), never the whole document: the
    # when/otherwise ladder below embeds its char expression ~6x per
    # position, and Catalyst inlines the normalization pipeline into
    # every copy — ~50 full regex passes per doc when fed the whole
    # text (measured 200 s on 5k docs), trivial over 64 chars. A sort
    # key derived from a raw-prefix normalization is exactly as valid a
    # neighborhood key as one from the full-text normalization.
    norm = normalize_text(F.substring(F.col("__text"), 1, prefix_len * 8))
    key = F.lit(0).cast("long")
    for i in range(1, prefix_len + 1):
        c = F.ascii(F.substring(norm, i, 1))
        code = (F.when((c >= 48) & (c <= 57), c - 47)
                .when((c >= 97) & (c <= 122), c - 86)
                .otherwise(0))
        key = key + code.cast("long") * F.lit(37 ** (prefix_len - i)).cast("long")
    elems = (tokens("__text") if shingle_n <= 1
             else word_ngrams("__text", shingle_n))
    # r14, the ngram_jaccard_pairs/prefix_filter_pairs convention:
    # repartition the RAW (id, text) rows BEFORE the key ladder + shingle
    # projection (select-then-repartition left the whole projection under
    # the single-file scan on one task AND shipped the arrays through the
    # exchange); carry shingles as xxhash64 longs (collision-probability-
    # exact, ~2^-64 per shingle pair); checkpoint ONCE for the three
    # consumers (the slim rank input — whose global_rank runs two driver
    # actions of its own — and both verify attach sides).
    docs = (df.select(F.col(id_col).alias("doc_id"),
                      (F.col(text_col) if isinstance(text_col, str)
                       else text_col).alias("__text"))
            .repartition(_par(df), "doc_id")
            .select("doc_id", key.alias("__key"),
                    F.transform(F.array_sort(F.array_distinct(elems)),
                                lambda s: F.xxhash64(s)).alias("toks"))
            .localCheckpoint(eager=True))
    slim = docs.select("doc_id", "__key")
    ranked = global_rank(slim, ["__key", "doc_id"], rank_col="__r")
    a = ranked.select(F.col("doc_id").alias("left_id"),
                      F.explode(F.array(*[F.col("__r") + d
                                          for d in range(1, window + 1)]))
                      .alias("__r"))
    b = ranked.select(F.col("doc_id").alias("right_id"), "__r")
    cands = _dedup_pairs(
        a.join(b, "__r")
        .select(F.least("left_id", "right_id").alias("id_a"),
                F.greatest("left_id", "right_id").alias("id_b")), df)
    pairs = (cands
             .join(docs.select(F.col("doc_id").alias("id_a"),
                               F.col("toks").alias("sh_a")), "id_a")
             .join(docs.select(F.col("doc_id").alias("id_b"),
                               F.col("toks").alias("sh_b")), "id_b"))
    return jaccard_verified_pairs(pairs, "sh_a", "sh_b", threshold)
