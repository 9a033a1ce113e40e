"""Similarity search over an embedding column (array<float>).

Two paths, per the LLM-pipeline requirement:
- ``cosine_topk``: brute-force exact top-k — the baseline. O(N*Q): the
  query set is broadcast, the corpus is scanned once, dot products run as
  JVM higher-order functions (zip_with/aggregate), top-k via per-query
  window. Correct at any N; cost scales linearly in corpus size so it's
  the right tool when Q is small (the common "probe set" case).
- ``ann_lsh_topk``: approximate scale path — random-hyperplane (sign) LSH
  buckets; only same-bucket (or neighboring-probe) candidates are scored.
  Deterministic hyperplanes from a seeded generator, so results are
  reproducible. Recall/cost is tuned by (num_planes, num_tables).

No Python UDFs: all arithmetic is Column expressions; at 100 TB the only
shuffle is the equi-join on bucket ids.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from league_of_legends_data_pipeline_spark.operators._util import (
    default_parallelism as _par,
)



def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two numeric arrays."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors in ``corpus`` for each row of
    ``queries``. Returns (query_id, neighbor_id, rank, cosine).

    The query side is broadcast; ties broken by neighbor id ascending.
    """
    # repartition: the query side broadcasts, so without this the scoring
    # loop would run in as few tasks as the corpus has input files
    c = corpus.repartition(_par(corpus), F.col(id_col)).select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__cv"),
    ).withColumn("__cn", l2_norm(F.col("__cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("__qv"),
    ).withColumn("__qn", l2_norm(F.col("__qv")))

    pairs = c.crossJoin(F.broadcast(q))
    if not include_self:
        pairs = pairs.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.withColumn(
        "cosine",
        F.round(dot(F.col("__cv"), F.col("__qv")) / (F.col("__cn") * F.col("__qn")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold). The brute-force O(N²) baseline: right for probe-sized sets
    and as the verifier behind an LSH/IVF candidate generator; at corpus
    scale swap the self-join for ``ann_lsh_topk``-style bucket blocking.

    The self-join reuses one exchange for both sides (ReuseExchange); the
    norm is computed once per row before the join, so the pair stage does
    only the dot product.
    """
    v = df.repartition(_par(df), F.col(id_col)).select(
        F.col(id_col).alias("__id"),
        _as_double(F.col(vec_col)).alias("__v"),
    ).withColumn("__n", l2_norm(F.col("__v")))
    a = v.select(F.col("__id").alias("id_a"), F.col("__v").alias("__va"),
                 F.col("__n").alias("__na"))
    b = v.select(F.col("__id").alias("id_b"), F.col("__v").alias("__vb"),
                 F.col("__n").alias("__nb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
    return (
        pairs.select("id_a", "id_b", cos.alias("__cos"))
        .filter(F.col("__cos") >= threshold)
        .select("id_a", "id_b", F.round("__cos", 6).alias("cosine"))
    )


def cosine_near_dup_pairs_blocked(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    num_blocks: int = 8,
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs via block-partitioned numpy
    matmul — same result set as :func:`cosine_near_dup_pairs`, built for
    corpus scale.

    All-pairs cosine is dense linear algebra: per pair, the Column-
    expression form pays interpreted per-element evaluation plus two
    64-double array copies through the join, ~5 µs/pair; one BLAS matmul
    does the same arithmetic in ~0.02 µs/pair. This is the one place the
    engine's "built-ins first" rule loses by 100×, so the block structure
    (the actual distribution problem) stays in DataFrame land and ONLY the
    dense math drops into an Arrow-batched ``applyInPandas``:

    - each vector lands in block ``xxhash64(id) % B`` — deterministic,
      layout-independent;
    - a row is replicated to every block pair its block participates in
      (~B copies; B ~ sqrt(cluster cores), the classic block-nested-loop
      replication bound), then one shuffle groups each (ba, bb) pair;
    - per group, normalized matrices multiply (``A @ B.T``) and only pairs
      clearing ``threshold`` come back — output rows are (id, id, score),
      never vectors.

    Verified against the Column-expression form in tests (bit-level float
    caveat: BLAS sums in a different order; scores within 1e-12 of the
    threshold can differ — irrelevant at the 6-dp rounding both emit).
    """
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    B = num_blocks
    v = df.select(
        F.col(id_col).cast("long").alias("__id"),
        _as_double(F.col(vec_col)).alias("__v"),
    ).withColumn("__b", F.pmod(F.xxhash64(F.col("__id")), F.lit(B)))
    # replicate: block b serves as the "a" side of pairs (b, b..B-1) and
    # the "b" side of pairs (0..b, b); diagonal groups get one copy
    sides = F.filter(
        F.flatten(F.array(
            F.transform(F.sequence(F.col("__b"), F.lit(B - 1)),
                        lambda hi: F.struct(F.col("__b").alias("ba"),
                                            hi.alias("bb"),
                                            F.lit(0).alias("side"))),
            F.transform(F.sequence(F.lit(0), F.col("__b")),
                        lambda lo: F.struct(lo.alias("ba"),
                                            F.col("__b").alias("bb"),
                                            F.lit(1).alias("side"))),
        )),
        lambda s: (s["ba"] != s["bb"]) | (s["side"] == 0),  # diagonal once
    )
    replicated = v.select("__id", "__v", F.explode(sides).alias("__s")) \
                  .select("__id", "__v", "__s.ba", "__s.bb", "__s.side")

    out_schema = StructType([
        StructField("id_a", LongType()),
        StructField("id_b", LongType()),
        StructField("cosine", DoubleType()),
    ])

    def score(key, pdf):
        # untyped on purpose: pyspark infers GROUPED_MAP from the
        # applyInPandas call, and partial hints only trigger a warning
        import numpy as np

        ba, bb = key[0], key[1]
        diag = ba == bb
        left = pdf if diag else pdf[pdf["side"] == 0]
        right = pdf if diag else pdf[pdf["side"] == 1]
        if not len(left) or not len(right):
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"})
        la = np.stack(left["__v"].to_numpy())
        rb = np.stack(right["__v"].to_numpy())
        la /= np.linalg.norm(la, axis=1, keepdims=True)
        rb /= np.linalg.norm(rb, axis=1, keepdims=True)
        sims = la @ rb.T
        ia, ib = np.nonzero(sims >= threshold)
        id_a = left["__id"].to_numpy()[ia]
        id_b = right["__id"].to_numpy()[ib]
        if diag:
            # each unordered pair appears as (x,y) AND (y,x): keep one
            keep = id_a < id_b
            id_a, id_b, s = id_a[keep], id_b[keep], sims[ia, ib][keep]
        else:
            # blocks are disjoint: each unordered pair appears exactly
            # once, but in arbitrary id order — orient, don't filter
            s = sims[ia, ib]
            id_a, id_b = np.minimum(id_a, id_b), np.maximum(id_a, id_b)
        # half-away-from-zero at 6dp (what DuckDB round and Spark F.round
        # both do), NOT np.round's half-even: a cosine landing exactly on
        # a dyadic half would otherwise hash differently cross-engine
        # (same failure class as byte_features' mean at sf0.1)
        return pd.DataFrame({"id_a": id_a, "id_b": id_b,
                             "cosine": np.sign(s)
                             * np.floor(np.abs(s) * 1e6 + 0.5) / 1e6})

    return (
        replicated.groupBy("ba", "bb")
        .applyInPandas(score, out_schema)
        .select("id_a", "id_b", "cosine")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    centroid_stride: int = 64,
    nprobe: int = 3,
) -> DataFrame:
    """IVF-style approximate top-k cosine: partition the corpus into
    inverted lists by nearest centroid, probe only the ``nprobe`` lists
    nearest each query, exact-rerank the candidates.

    Deterministic "training": centroids are the corpus vectors with
    ``id % centroid_stride == 0`` (seed-free, reproducible, and
    oracle-checkable; swap in k-means centroids for production quality —
    the plan shape is identical). Scale: the centroid set is broadcast
    twice (assignment + probe); the only shuffle is the equi-join on
    centroid id, so cost is |corpus|·C dots for assignment plus the probed
    fraction (~nprobe/C) of the corpus for scoring.
    """
    cents = corpus.filter(F.col(id_col) % centroid_stride == 0).select(
        F.col(id_col).alias("cid"),
        _as_double(F.col(vec_col)).alias("__ce"),
    ).withColumn("__cn", l2_norm(F.col("__ce")))

    def nearest(df: DataFrame, prefix: str, n: int) -> DataFrame:
        v = df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            _as_double(F.col(vec_col)).alias(f"__{prefix}v"),
        ).withColumn(f"__{prefix}n", l2_norm(F.col(f"__{prefix}v")))
        scored = v.join(F.broadcast(cents)).withColumn(
            "__ccos",
            dot(F.col(f"__{prefix}v"), F.col("__ce"))
            / (F.col(f"__{prefix}n") * F.col("__cn")))
        w = Window.partitionBy(f"{prefix}_id").orderBy(
            F.col("__ccos").desc(), F.col("cid").asc())
        return (scored.withColumn("__crk", F.row_number().over(w))
                .filter(F.col("__crk") <= n)
                .select(f"{prefix}_id", f"__{prefix}v", f"__{prefix}n", "cid"))

    assigned = nearest(corpus.repartition(_par(corpus), F.col(id_col)),
                       "neighbor", 1)
    probes = nearest(queries, "query", nprobe)
    cands = (
        assigned.join(probes, "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.withColumn(
        "cosine",
        F.round(dot(F.col("__neighborv"), F.col("__queryv"))
                / (F.col("__neighborn") * F.col("__queryn")), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivf_topk_curve(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    centroid_stride: int = 64,
    nprobes: tuple[int, ...] = (1, 2, 3),
) -> dict[int, DataFrame]:
    """:func:`ivf_topk` evaluated at SEVERAL ``nprobe`` values with the
    expensive parts shared (r13): the corpus-side centroid assignment is
    identical for every nprobe, and a query's top-``n`` probe list is the
    rank-filtered prefix of its top-``max(nprobes)`` list (row_number
    with the same deterministic tie-break) — so one assignment pass +
    one probe ranking serve the whole recall curve instead of
    ``len(nprobes)`` full rebuilds. Per-value results are bit-identical
    to independent ``ivf_topk`` calls; both frames are eagerly
    checkpointed because every curve point re-joins them.
    """
    cents = corpus.filter(F.col(id_col) % centroid_stride == 0).select(
        F.col(id_col).alias("cid"),
        _as_double(F.col(vec_col)).alias("__ce"),
    ).withColumn("__cn", l2_norm(F.col("__ce")))

    def nearest(df: DataFrame, prefix: str, n: int) -> DataFrame:
        v = df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            _as_double(F.col(vec_col)).alias(f"__{prefix}v"),
        ).withColumn(f"__{prefix}n", l2_norm(F.col(f"__{prefix}v")))
        scored = v.join(F.broadcast(cents)).withColumn(
            "__ccos",
            dot(F.col(f"__{prefix}v"), F.col("__ce"))
            / (F.col(f"__{prefix}n") * F.col("__cn")))
        w = Window.partitionBy(f"{prefix}_id").orderBy(
            F.col("__ccos").desc(), F.col("cid").asc())
        return (scored.withColumn("__crk", F.row_number().over(w))
                .filter(F.col("__crk") <= n)
                .select(f"{prefix}_id", f"__{prefix}v", f"__{prefix}n",
                        "cid", "__crk"))

    assigned = (nearest(corpus.repartition(_par(corpus), F.col(id_col)),
                        "neighbor", 1).drop("__crk")
                .localCheckpoint(eager=True))
    probes_all = (nearest(queries, "query", max(nprobes))
                  .localCheckpoint(eager=True))
    out: dict[int, DataFrame] = {}
    for nprobe in nprobes:
        probes = probes_all.filter(F.col("__crk") <= nprobe).drop("__crk")
        cands = (
            assigned.join(probes, "cid")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .dropDuplicates(["query_id", "neighbor_id"])
        )
        scored = cands.withColumn(
            "cosine",
            F.round(dot(F.col("__neighborv"), F.col("__queryv"))
                    / (F.col("__neighborn") * F.col("__queryn")), 6))
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc())
        out[nprobe] = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cosine")
        )
    return out


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector affine int8 quantization — the storage scale path for ANN
    at 100 TB (4x smaller vectors; IVF/LSH probing works unchanged on
    codes, with exact rerank on the float originals for the short list).

    code_i = floor((x_i - lo) / scale + 0.5), scale = (hi - lo)/255,
    lo/hi = per-vector min/max; constant vectors get code 0. ``floor(z+.5)``
    (not round()) so Spark and any oracle agree on halfway cases.

    Returns (id, n_dims, codes array<long> in [0,255], scale, lo,
    max_abs_err) — max_abs_err is the reconstruction error
    max|lo + code*scale - x|, bounded by scale/2 by construction.
    Everything is per-row Column arithmetic: quantizing a corpus is a
    map-only scan, no shuffle, no UDF.
    """
    out = (
        df.select(
            F.col(id_col),
            _as_double(F.col(vec_col)).alias("__v"),
        )
        .withColumn("lo", F.array_min("__v"))
        .withColumn("scale", (F.array_max("__v") - F.col("lo")) / F.lit(255.0))
        .withColumn(
            "codes",
            F.transform(
                "__v",
                lambda x: F.when(F.col("scale") == 0, F.lit(0).cast("long"))
                .otherwise(F.floor((x - F.col("lo")) / F.col("scale") + F.lit(0.5))),
            ),
        )
        .withColumn(
            "max_abs_err",
            F.when(F.col("scale") == 0, F.lit(0.0)).otherwise(
                F.array_max(F.zip_with(
                    "__v", "codes",
                    lambda x, c: F.abs(F.col("lo") + c * F.col("scale") - x),
                ))),
        )
    )
    return out.select(
        F.col(id_col), F.size("__v").alias("n_dims"), "codes",
        "scale", "lo", "max_abs_err",
    )


def hyperplanes(dim: int, num_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit i = (vec . plane_i) >= 0, packed into a long."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(vec, F.array(*[F.lit(p) for p in plane]), lambda x, y: x * y),
                F.lit(0.0), lambda acc, x: acc + x,
            ) >= 0,
            F.lit(1 << i),
        ).otherwise(F.lit(0))
        for i, plane in enumerate(planes)
    ]
    return sum(bits, F.lit(0).cast("long"))


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    num_planes: int = 8,
    num_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine via multi-table sign-LSH.

    Each table hashes with its own hyperplanes; candidates = union over
    tables of same-bucket pairs; exact cosine re-ranks candidates. Returns
    (query_id, neighbor_id, rank, cosine) — rank within retrieved set.

    The hyperplane projection is dense linear algebra (every vector dots
    every plane), so like :func:`cosine_near_dup_pairs_blocked` it runs as
    ONE numpy matmul per Arrow batch inside ``mapInPandas`` instead of
    ``num_tables * num_planes`` interpreted higher-order-function folds per
    row (~4x the whole-operator time at 5k vectors; the gap widens with
    corpus size). Float caveat as documented on the blocked matmul: BLAS
    sums in a different order than a sequential fold, so a dot within
    ~1e-13 of exactly 0 could bucket differently — probability ~0 for
    real-valued embeddings.
    """
    import numpy as np
    import pandas as pd

    P = np.array([plane
                  for t in range(num_tables)
                  for plane in hyperplanes(dim, num_planes, seed + t)])
    bit_weights = 1 << np.arange(num_planes, dtype="int64")

    def bucketize(df: DataFrame, prefix: str) -> DataFrame:
        # declare the id field from the INPUT schema instead of casting:
        # a blanket cast("long") silently nulls out non-numeric ids
        prepared = df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            _as_double(F.col(vec_col)).alias(f"__{prefix}v"),
        )
        id_type = prepared.schema[f"{prefix}_id"].dataType.simpleString()

        def project(batches):
            for pdf in batches:
                n = len(pdf)
                if not n:
                    continue
                V = np.stack(pdf[f"__{prefix}v"].to_numpy())
                signs = (V @ P.T) >= 0
                buckets = (signs.reshape(n, num_tables, num_planes)
                           * bit_weights).sum(axis=2)
                yield pd.DataFrame({
                    f"{prefix}_id": np.repeat(
                        pdf[f"{prefix}_id"].to_numpy(), num_tables),
                    f"__{prefix}v": [v for v in pdf[f"__{prefix}v"]
                                     for _ in range(num_tables)],
                    "table_id": np.tile(
                        np.arange(num_tables, dtype="int32"), n),
                    "bucket": buckets.ravel().astype("int64"),
                })

        return prepared.mapInPandas(
            project,
            f"{prefix}_id {id_type}, __{prefix}v array<double>, "
            f"table_id int, bucket long")

    c = bucketize(corpus, "neighbor")
    q = bucketize(queries, "query")
    cands = (
        c.join(q, ["table_id", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.withColumn(
        "cosine",
        F.round(
            dot(F.col("__neighborv"), F.col("__queryv"))
            / (l2_norm(F.col("__neighborv")) * l2_norm(F.col("__queryv"))),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def kmeans_refine(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    centroid_stride: int = 64,
    iterations: int = 2,
    max_centroids: int = 4096,
    top2: bool = False,
) -> DataFrame:
    """Deterministic Lloyd refinement for corpus clustering (SemDeDup-style
    topic bucketing): seed centroids = every ``centroid_stride``-th vector
    (ivf_topk's seeding), then ``iterations`` rounds of assign-to-nearest
    (cosine, ties to the smallest cluster id) and element-wise mean
    recompute. Returns (id, cluster, cosine) — each vector's final cluster
    (keyed by seed id) and its similarity to that cluster's centroid.
    With ``top2=True`` also returns ``cosine2``, the similarity to the
    nearest OTHER centroid (the runner-up of the same in-row argmax, no
    extra scan) — the ingredient simplified-silhouette needs.

    Means are rounded (9 dp) each round: parallel aggregation order makes
    the last ulp nondeterministic, and an unrounded centroid could flip an
    argmax tie between runs/engines.

    Scale shape per round: one broadcast of the C centroids (C <=
    ``max_centroids`` enforced — the stride widens with N so the driver
    never holds more than a fixed C x dim matrix) as a single row, a
    MAP-ONLY in-row argmax over them (no shuffle touches the N x C
    expansion — each vector scores all C centroids where it sits), and one
    groupBy(cluster) whose element-wise mean is ``dim`` aggregate
    expressions — C rows of state through that only exchange. Driver holds
    only the C x dim centroid matrix. Fixed iteration count keeps the
    whole computation a deterministic, oracle-checkable plan.
    """
    base = df.select(F.col(id_col).alias("__id"),
                     _as_double(F.col(vec_col)).alias("__v"))
    # Bound the driver-side centroid matrix: at a fixed stride C = N/stride
    # grows with the corpus, so widen the stride until C <= max_centroids.
    # The corpus count rides the seed-collect action as an Observation
    # (CollectMetrics sits above the scan and below the seed filter —
    # predicates are not pushed through it — so one job yields both N
    # and the stride-``centroid_stride`` seeds); only if N forces a wider
    # stride does a second, rarer collect re-seed. At test scales
    # (N <= stride * max_centroids) the stride is unchanged, so the
    # oracle's literal `id % stride = 0` seeding still matches.
    from pyspark.sql import Observation

    obs = Observation()
    seed_rows = (base.observe(obs, F.count(F.lit(1)).alias("n"))
                 .filter(F.col("__id") % centroid_stride == 0).collect())
    n = obs.get["n"]
    stride = max(centroid_stride, -(-n // max_centroids))  # ceil div
    if stride != centroid_stride:
        seed_rows = base.filter(F.col("__id") % stride == 0).collect()
    cents = [(int(r["__id"]), list(r["__v"])) for r in seed_rows]
    if top2 and len(cents) < 2:
        # the runner-up centroid is undefined with a single centroid —
        # fail loudly rather than emit null cosine2 (the
        # personalized_pagerank degenerate-input convention)
        raise ValueError(
            "kmeans_refine(top2=True): need at least 2 seed centroids "
            f"(got {len(cents)}; widen the corpus or shrink "
            "centroid_stride)")
    # one up-front spread of the (id, vector) rows for the iteration path:
    # assignment itself is map-only, so without this the whole scoring
    # loop would run in as few tasks as the source has input splits (one,
    # for a single parquet file)
    v = base.repartition(_par(df), F.col("__id"))

    spark = df.sparkSession

    def assign(frame: DataFrame, centroids: list[tuple[int, list[float]]]):
        # MAP-ONLY argmax: the C centroids travel as ONE broadcast row
        # holding an array<struct<cid,ce,cn>> (data-plane, so the plan
        # stays small at C=4096 — an unrolled when-chain or a literal
        # array would put C x dim constants into analysis/codegen), and
        # each vector scores them in-row. Struct max on (cos, -cid) keeps
        # the smallest cid on exact ties — the same winner as the previous
        # groupBy(max_by(cos, -cid)) form and the oracle's
        # row_number(ORDER BY cos DESC, cid). Replaces the old
        # crossJoin -> groupBy(__id) assignment, which re-shuffled N x C
        # vector-carrying rows per iteration — the one part of this
        # operator that did NOT survive the 100 TB test.
        import math

        rows = []
        for cid, ce in sorted(centroids):
            # centroid norm, folded sequentially in index order — the same
            # IEEE op sequence the engines' folds produce, so precomputing
            # it here cannot perturb a single bit
            acc = 0.0
            for x in ce:
                acc += float(x) * float(x)
            rows.append((int(cid), [float(x) for x in ce], math.sqrt(acc)))
        cent_df = spark.createDataFrame(
            [(rows,)],
            "cents array<struct<cid: bigint, ce: array<double>, cn: double>>")
        # each cosine computed exactly ONCE (transform), then one max pass;
        # struct max on (c, -cid) resolves exact ties to the smallest cid
        scored = F.transform(
            F.col("cents"),
            lambda s: F.struct(
                (dot(F.col("__v"), s["ce"]) / (F.col("__nv") * s["cn"]))
                .alias("c"),
                (-s["cid"]).alias("t")))
        out = (frame.withColumn("__nv", l2_norm(F.col("__v")))
               .crossJoin(F.broadcast(cent_df))
               .withColumn("__b", F.array_max(scored)))
        if top2:
            # runner-up: max over entries whose cid differs from the
            # winner, identical tie rule (highest cos, then smallest cid).
            # Costs a second in-row pass over the scored array (2*C dots
            # per row) on the top2 path only; still map-only.
            out = out.withColumn(
                "__b2",
                F.array_max(F.filter(scored,
                                     lambda s: s["t"] != F.col("__b.t"))))
        cols = ["__id", "__v",
                (-F.col("__b.t")).alias("cluster"),
                F.col("__b.c").alias("cosine")]
        if top2:
            cols.append(F.col("__b2.c").alias("cosine2"))
        return out.select(*cols)

    assigned = assign(v, cents)
    for _ in range(iterations - 1):
        # element-wise means as a NARROW posexplode + groupBy(cluster, dim)
        # aggregate: the previous 64-avg-expression-wide form spent seconds
        # per round in generated-code size alone (the r13 q306/q302
        # finding); the rounding contract is unchanged — 9 dp absorbs the
        # last-ulp aggregation-order nondeterminism either shape has.
        mrows = (assigned
                 .select("cluster", F.posexplode("__v").alias("__j", "__xv"))
                 .groupBy("cluster", "__j")
                 .agg(F.round(F.avg("__xv"), 9).alias("__m"))
                 .collect())
        by_c: dict[int, list] = {}
        for r in mrows:
            by_c.setdefault(int(r["cluster"]), [None] * dim)[r["__j"]] = r["__m"]
        cents = sorted(by_c.items())
        if top2 and len(cents) < 2:
            # a cluster can empty DURING refinement (every vector argmaxed
            # elsewhere); with one centroid left the runner-up is undefined
            # — enforce the fail-loudly contract after every recompute,
            # not just on the seeds (r10 ADVICE)
            raise ValueError(
                "kmeans_refine(top2=True): refinement collapsed to "
                f"{len(cents)} centroid(s); need at least 2 for cosine2 "
                "(widen the corpus or shrink centroid_stride)")
        assigned = assign(v, cents)
    out_cols = [F.col("__id").alias(id_col), F.col("cluster"),
                F.round("cosine", 6).alias("cosine")]
    if top2:
        out_cols.append(F.round("cosine2", 6).alias("cosine2"))
    return assigned.select(*out_cols)


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    centroid_stride: int = 64,
    iterations: int = 2,
    threshold: float = 0.35,
    max_centroids: int = 4096,
    max_cluster_size: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus with :func:`kmeans_refine`, then
    inside each cluster drop every vector whose cosine to a smaller-id
    cluster member is >= ``threshold``. Returns the survivors as
    (``id_col``, cluster), one row per kept vector.

    This is the composition the paper runs at web scale: the O(N²) cosine
    comparison is confined to cluster blocks, and the cluster count C grows
    with the corpus (kmeans_refine widens the seed stride only when C would
    exceed ``max_centroids``), so expected block size stays ~``stride``
    and total pair work is N * stride, linear in N for fixed stride. The
    intra-cluster stage is one equi-join on cluster id — rows carry their
    vector across that single shuffle, then all arithmetic is JVM
    higher-order functions (sequential-fold dot, the engine-replicable
    convention every similarity oracle here relies on). For very hot
    clusters the BLAS route of :func:`cosine_near_dup_pairs_blocked` is the
    drop-in replacement for the pair stage.

    Greedy smallest-id-wins matches the paper's "keep one exemplar"
    semantics deterministically: a vector survives iff no same-cluster
    vector with a smaller id is within ``threshold``.

    ``max_cluster_size`` is the hot-cluster safety valve (the analogue of
    LSH's ``max_bucket_size``): a cluster larger than the cap skips the
    pair stage entirely — its members all SURVIVE (conservative: never
    drops without comparing) — so one degenerate centroid cannot go
    quadratic. Default None compares every cluster (the exact paper
    semantics, and what the q101 oracle replays).
    """
    assigned = kmeans_refine(df, id_col, vec_col, dim=dim,
                             centroid_stride=centroid_stride,
                             iterations=iterations,
                             max_centroids=max_centroids)
    sized = assigned.select(F.col(id_col), F.col("cluster"))
    if max_cluster_size is not None:
        csize = Window.partitionBy("cluster")
        sized = (sized.withColumn("__csz", F.count(F.lit(1)).over(csize))
                 .filter(F.col("__csz") <= max_cluster_size)
                 .drop("__csz"))
    v = df.select(F.col(id_col).alias("__id"),
                  _as_double(F.col(vec_col)).alias("__v"))
    m = (sized
         .join(v, F.col(id_col) == F.col("__id"))
         .select(F.col(id_col).alias("__mid"), "cluster",
                 F.col("__v").alias("__mv"),
                 l2_norm(F.col("__v")).alias("__mn")))
    a = m.select(F.col("__mid").alias("__ida"), F.col("cluster").alias("__ca"),
                 F.col("__mv").alias("__va"), F.col("__mn").alias("__na"))
    b = m.select(F.col("__mid").alias("__idb"), F.col("cluster").alias("__cb"),
                 F.col("__mv").alias("__vb"), F.col("__mn").alias("__nb"))
    cos = dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
    dups = (a.join(b, (F.col("__ca") == F.col("__cb"))
                      & (F.col("__idb") < F.col("__ida")))
            .filter(cos >= F.lit(threshold))
            .select(F.col("__ida").alias("__dup")).distinct())
    return (assigned.select(F.col(id_col), F.col("cluster"))
            .join(dups, F.col(id_col) == F.col("__dup"), "left_anti"))


def jl_sign_matrix(dim: int, out_dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic ±1 Johnson–Lindenstrauss sign matrix (Achlioptas 2003
    database-friendly projections): entry (j, i) is +1 when the last hex
    digit of md5("{seed}:{j}:{i}") is even, else -1. md5 of an explicit
    string is engine-replicable, so an oracle can rebuild the exact matrix
    in SQL — unlike a Gaussian matrix, which would pin results to one RNG.
    """
    import hashlib

    return [[1.0 if int(hashlib.md5(f"{seed}:{j}:{i}".encode())
                        .hexdigest()[-1], 16) % 2 == 0 else -1.0
             for i in range(dim)]
            for j in range(out_dim)]


def random_projection(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    out_dim: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Johnson–Lindenstrauss sign random projection: maps ``vec_col``
    (``dim`` floats) to ``out_dim`` doubles, proj[j] = dot(v, s_j) /
    sqrt(out_dim) with s_j the ±1 rows of :func:`jl_sign_matrix`. Distances
    are preserved within (1 ± eps) for out_dim = O(log N / eps²) — the
    standard pre-step that makes downstream clustering / ANN / near-dup
    O(out_dim) per distance instead of O(dim).

    Scale shape: map-only. The (out_dim × dim) sign matrix is a plan
    literal (broadcast with the closure); each output coordinate is one
    sequential-fold dot over the input array — JVM higher-order functions,
    no shuffle, no Python, no codegen blowup (HOF folds are loops, not
    unrolled expression trees — the q44 cold-JIT lesson).

    Returns (``id_col``, proj array<double>).
    """
    signs = jl_sign_matrix(dim, out_dim, seed)
    scale = float(out_dim) ** 0.5
    v = _as_double(F.col(vec_col))
    proj = F.array(*[
        (dot(v, F.array(*[F.lit(x) for x in row])) / F.lit(scale))
        for row in signs
    ])
    return df.select(F.col(id_col), proj.alias("proj"))


def _pq_subvectors(df: DataFrame, id_col: str, vec_col: str, dim: int,
                   num_subspaces: int) -> DataFrame:
    """(id, j, s): the dim/num_subspaces-dim subvector of each vector in
    each subspace j — the exploded form both PQ stages work in."""
    d = dim // num_subspaces
    slices = F.array(*[
        F.slice(_as_double(F.col(vec_col)), j * d + 1, d)
        for j in range(num_subspaces)
    ])
    return df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(slices).alias("j", "s"))


def _l2_sq(a: Column, b: Column) -> Column:
    """Sequential-fold squared L2 distance (engine-replicable order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, x: acc + x)


def pq_encode(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_subspaces: int = 8,
    centroid_stride: int = 64,
    max_codewords: int | None = None,
) -> DataFrame:
    """Product-quantization encoding: each vector becomes ``num_subspaces``
    codebook indices — the compressed-corpus scale path for ANN (a 64-dim
    float vector collapses to 8 one-byte codes, a 32x storage cut; Jégou
    et al. 2011). Returns the exploded code table (vec_id, j, code).

    Codebook "training" is the same deterministic device as ivf_topk:
    subspace-j codewords are the j-subvectors of corpus rows with
    ``id % centroid_stride == 0`` (seed-free, reproducible,
    oracle-checkable; swap in per-subspace k-means for production quality
    — the plan is unchanged). Encoding joins every subvector against the
    BROADCAST codebook and keeps the argmin (sequential-fold squared L2,
    ties to the smallest codeword id), so the only shuffle is the
    per-(vector, subspace) window — rows of (id, j, 2 small arrays).
    """
    if dim % num_subspaces:
        raise ValueError(f"dim ({dim}) must divide evenly into "
                         f"num_subspaces ({num_subspaces})")
    sub = _pq_subvectors(corpus, id_col, vec_col, dim, num_subspaces)
    cb = _pq_codebook(sub, centroid_stride, max_codewords)
    return _pq_assign(sub, cb).select(
        F.col("__id").alias(id_col), "j", "code")


def _pq_codebook(sub: DataFrame, centroid_stride: int,
                 max_codewords: int | None = None) -> DataFrame:
    """(cid, j, cs): subspace codewords from stride-selected rows.

    ``max_codewords`` bounds the codebook at ``id < stride·max`` — the
    production shape: with the cap, C is a CONSTANT and encode cost is
    linear in corpus size; without it, C grows with N and encode goes
    quadratic (measured: q105's 10x probe leg ran at factor 106 uncapped).
    """
    cb = sub.filter(F.col("__id") % centroid_stride == 0)
    if max_codewords is not None:
        cb = cb.filter(F.col("__id") < centroid_stride * max_codewords)
    return cb.select(F.col("__id").alias("cid"), "j", F.col("s").alias("cs"))


def _pq_assign(sub: DataFrame, cb: DataFrame) -> DataFrame:
    """(__id, j, code): nearest codeword per (vector, subspace) — argmin
    of the sequential-fold squared L2, ties to the smallest codeword id.

    The argmin is ``min(struct(d2, cid))`` — struct ordering compares d2
    first then cid, exactly the old row_number window's (d2 asc, cid asc)
    winner (Spark's double ordering is total, NaN greatest, both ways).
    An aggregate instead of a window lets the N x C expansion collapse
    MAP-SIDE to one row per (vector, subspace) before the exchange; the
    window form shuffled and sorted every scored candidate row.
    """
    return (
        sub.join(F.broadcast(cb), "j")
        .withColumn("__d2", _l2_sq(F.col("s"), F.col("cs")))
        .groupBy("__id", "j")
        .agg(F.min(F.struct("__d2", "cid")).alias("__b"))
        .select("__id", "j", F.col("__b.cid").alias("code"))
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    num_subspaces: int = 8,
    centroid_stride: int = 64,
    rerank_shortlist: int | None = None,
    max_codewords: int | None = None,
) -> DataFrame:
    """Approximate top-k nearest (squared-L2) neighbors via PQ asymmetric
    distance (ADC): d(q, x) ~ sum_j ||q_j - codeword(code_j(x))||^2.

    Scale shape: the per-query lookup table (|Q| x num_subspaces x C
    partial distances) is tiny and BROADCAST, so scoring the encoded
    corpus is a map-side join — the compressed codes are scanned once and
    full vectors are never touched after encoding. The ADC sum folds the
    per-subspace partials IN j ORDER (sort_array before the fold), not in
    aggregation order, so two engines summing the same doubles get
    bit-identical totals — argmin/rank decisions replicate exactly.

    ``rerank_shortlist`` is the production accuracy lever: keep that many
    ADC candidates per query, then exact-L2 rerank just the shortlist
    against the float vectors (broadcast shortlist, one corpus-side
    semi-scan — |Q| x shortlist exact distances, a fixed per-query cost
    that does not grow with corpus size). On the synthetic sf0.01
    embeddings this lifts recall@5 from 0.15 to 0.75.

    Returns (query_id, neighbor_id, rank, dist2) — dist2 is the ADC
    approximation without rerank, the exact squared L2 with it.
    """
    if dim % num_subspaces:
        raise ValueError(f"dim ({dim}) must divide evenly into "
                         f"num_subspaces ({num_subspaces})")
    # one shared subvector frame feeds codebook + encoding (a production
    # pipeline would persist pq_encode's output and skip both)
    sub = _pq_subvectors(corpus, id_col, vec_col, dim, num_subspaces)
    cb = _pq_codebook(sub, centroid_stride, max_codewords)
    enc = _pq_assign(sub, cb).withColumnRenamed("__id", "__nid")
    qsub = _pq_subvectors(queries, id_col, vec_col, dim, num_subspaces) \
        .select(F.col("__id").alias("query_id"), "j", F.col("s").alias("qs"))
    lut = (qsub.join(F.broadcast(cb), "j")
           .select("query_id", "j", "cid",
                   _l2_sq(F.col("qs"), F.col("cs")).alias("pd")))
    scored = (
        enc.join(F.broadcast(lut),
                 (enc["j"] == lut["j"]) & (enc["code"] == lut["cid"]))
        .filter(F.col("__nid") != F.col("query_id"))
        .select("query_id", F.col("__nid").alias("neighbor_id"),
                enc["j"].alias("j"), "pd")
    )
    adc = (
        scored.groupBy("query_id", "neighbor_id")
        .agg(F.aggregate(
            F.sort_array(F.collect_list(F.struct("j", "pd"))),
            F.lit(0.0), lambda acc, s: acc + s["pd"]).alias("__adist2"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__adist2").asc(), F.col("neighbor_id").asc())
    ranked = adc.withColumn("rank", F.row_number().over(w))
    if rerank_shortlist is None:
        return (ranked.filter(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "rank",
                        F.round("__adist2", 6).alias("dist2")))
    short = (ranked.filter(F.col("rank") <= rerank_shortlist)
             .select("query_id", "neighbor_id"))
    cvec = corpus.select(F.col(id_col).alias("neighbor_id"),
                         _as_double(F.col(vec_col)).alias("__cv"))
    qvec = queries.select(F.col(id_col).alias("query_id"),
                          _as_double(F.col(vec_col)).alias("__qv"))
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("__d2").asc(), F.col("neighbor_id").asc())
    return (
        cvec.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .withColumn("__d2", _l2_sq(F.col("__cv"), F.col("__qv")))
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.round("__d2", 6).alias("dist2"))
    )


def label_centroid_pairs(
    df: DataFrame,
    label_col: str,
    vec_col: str,
) -> DataFrame:
    """Pairwise separation of per-label embedding centroids:
    (label_a, label_b, cosine, l2) for every unordered label pair — the
    cluster-quality / class-contrast report a curation pipeline runs to
    check that sources or quality tiers occupy distinct embedding regions.

    Scale shape: the corpus-sized work is ONE aggregation — posexplode to
    (label, dim, value) and sum per (label, dim) with map-side partial
    aggregation, so the shuffle carries labels x dim rows of integer
    micro-units, never embeddings. Everything after (centroids, the
    pairwise self-join, the per-pair fold) is labels x dim sized — tiny at
    any corpus scale. All cross-row sums are 6dp/12dp integer micro-units
    so both the centroid means and the pair distances are
    summation-order-independent (engine-portable; see kmeans_refine's
    rationale for why raw double sums are not).
    """
    elems = df.select(
        F.col(label_col).alias("__lbl"),
        F.posexplode(_as_double(F.col(vec_col))).alias("__pos", "__v"),
    )
    cent = (elems.groupBy("__lbl", "__pos")
            .agg((F.sum(F.round(F.col("__v") * 1_000_000).cast("long"))
                  / (F.count(F.lit(1)) * 1_000_000.0)).alias("__c")))
    a = cent.select(F.col("__lbl").alias("label_a"), "__pos",
                    F.col("__c").alias("__ca"))
    bb = cent.select(F.col("__lbl").alias("label_b"), "__pos",
                     F.col("__c").alias("__cb"))
    TERA = 1_000_000_000_000
    joined = (a.join(bb, "__pos")
              .filter(F.col("label_a") < F.col("label_b"))
              .select(
                  "label_a", "label_b",
                  F.round(F.col("__ca") * F.col("__cb") * TERA)
                   .cast("long").alias("__dot"),
                  F.round(F.col("__ca") * F.col("__ca") * TERA)
                   .cast("long").alias("__na"),
                  F.round(F.col("__cb") * F.col("__cb") * TERA)
                   .cast("long").alias("__nb"),
                  F.round((F.col("__ca") - F.col("__cb"))
                          * (F.col("__ca") - F.col("__cb")) * TERA)
                   .cast("long").alias("__d2")))
    return (joined.groupBy("label_a", "label_b")
            .agg(F.round(F.sum("__dot")
                         / F.sqrt(F.sum("__na").cast("double")
                                  * F.sum("__nb")), 6).alias("cosine"),
                 F.round(F.sqrt(F.sum("__d2") / float(TERA)), 6).alias("l2")))


def kcenter_coreset(df: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    k: int = 4) -> list[tuple]:
    """Greedy k-center coreset selection (Gonzalez 1985 2-approximation
    — the farthest-point heuristic behind active-learning/coreset data
    selection): pick the ``k`` embeddings that minimize (within 2x) the
    maximum distance from any corpus vector to its nearest pick.
    Returns ``[(step, center_id, sep), ...]`` where ``sep`` is the
    selected point's min-distance to the already-chosen set (step 1 =
    the deterministic min-id seed, sep 0.0) — the sequence every
    other 100 TB scan can reuse as broadcast anchors.

    Per step ONE argmax aggregate over the corpus (a 1-row collect —
    the k-means precedent: only k center vectors ever reach the
    driver) and one map-side running-min distance update against the
    newly chosen center's broadcast literal; no joins, no windows,
    k scans total. Distances are sequential-fold squared L2
    (engine-replicable order), surfaced as round(sqrt, 6).
    """
    v = df.select(F.col(id_col).alias("vid"),
                  _as_double(F.col(vec_col)).alias("v"))
    seed = v.orderBy("vid").first()
    centers = [(1, seed["vid"], 0.0)]
    lit_seed = F.array(*[F.lit(float(x)) for x in seed["v"]])
    cur = v.withColumn("__d", _l2_sq(F.col("v"), lit_seed))
    for step in range(2, k + 1):
        far = cur.orderBy(F.col("__d").desc(), "vid").first()
        centers.append((step, far["vid"],
                        round(float(far["__d"]) ** 0.5, 6)))
        lit_c = F.array(*[F.lit(float(x)) for x in far["v"]])
        cur = cur.withColumn(
            "__d", F.least(F.col("__d"), _l2_sq(F.col("v"), lit_c)))
    return centers


def embedding_health(df: DataFrame, label_col: str,
                     vec_col: str = "embedding",
                     scale: int = 1_000_000) -> DataFrame:
    """Per-label embedding-space health check — the collapse/anisotropy
    screen run before trusting embeddings for dedup or retrieval:
    (label, n, mean_norm, anisotropy) where anisotropy is the exact
    mean pairwise cosine of the label's NORMALIZED vectors, via the
    identity  mean_cos = (||Σu||² - n) / (n(n-1)).  Healthy diverse
    embeddings sit near 0; a collapsed/anisotropic space (all vectors
    pointing one way — the classic bad-pooling symptom) nears 1.

    Engine-exactness: unit vectors quantize to 1e-6 integer grid
    per dimension BEFORE summation (posexplode → per-(label, dim)
    BIGINT sums — order-free), so ||Σu||² is exact integer arithmetic
    both engines replicate; one float division at the edge. Shuffle
    carries (label, dim, long) rows: corpus × dim, linear.
    """
    v = _as_double(F.col(vec_col))
    n = l2_norm(v)
    u_micro = F.transform(v, lambda x: F.round(x / n * scale).cast("long"))
    dims = (df.select(F.col(label_col).alias("label"),
                      F.round(n * scale).cast("long").alias("__nrm"),
                      F.posexplode(u_micro).alias("dim", "__u")))
    per_dim = dims.groupBy("label", "dim").agg(
        F.sum("__u").alias("__s"),
        F.count(F.lit(1)).alias("__n"),
        F.sum("__nrm").alias("__nrm_sum"))
    return (per_dim.groupBy("label")
            .agg(F.first("__n").alias("n"),
                 F.round(F.first("__nrm_sum")
                         / F.first("__n") / scale, 6).alias("mean_norm"),
                 F.sum(F.col("__s") * F.col("__s")).alias("__ss"))
            .withColumn(
                "anisotropy",
                F.round((F.col("__ss") / F.lit(float(scale)) / scale
                         - F.col("n")) / (F.col("n") * (F.col("n") - 1)),
                        6))
            .select("label", "n", "mean_norm", "anisotropy"))


def bitext_margin_mining(
    src: DataFrame,
    tgt: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    margin_threshold: float = 1.0,
) -> DataFrame:
    """Ratio-margin bitext mining (Artetxe & Schwenk 2019, the CCMatrix/
    LASER scorer): for every source vector, the best target candidate by

        margin(x, y) = cos(x, y) / ((avgTopK(x, T) + avgTopK(y, S)) / 2)

    — raw cosine normalized by each side's local neighborhood density,
    which is what makes mined pairs comparable across hubs and sparse
    regions. Returns (src_id, tgt_id, cosine, margin) for the
    argmax-margin target per source with margin > ``margin_threshold``.

    This is the EXACT all-pairs form — the verification baseline, same
    contract as cosine_near_dup_pairs. The 100 TB path generates the
    top-k candidate lists per side with ivf_topk / ann_lsh_topk (probe
    nprobe/C of the corpus) and re-scores margins on candidates only;
    the margin arithmetic here is reused unchanged since it only needs
    each side's top-k list.

    Determinism contract: cosines come from the sequential zip_with/
    aggregate fold (``dot``), and each side's top-k mean folds a
    (cosine, id)-DESC-sorted slice in list order — so an oracle that
    sums the identically-sorted slice reproduces every float bit-exact.
    """
    # zero-norm vectors would make every cosine NaN and NaN ordering is
    # engine-divergent — drop them (cosine undefined for the zero vector)
    s = src.select(F.col(id_col).alias("src_id"),
                   _as_double(F.col(vec_col)).alias("__sv"))
    s = s.withColumn("__sn", l2_norm(F.col("__sv"))).where(F.col("__sn") > 0)
    t = tgt.select(F.col(id_col).alias("tgt_id"),
                   _as_double(F.col(vec_col)).alias("__tv"))
    t = t.withColumn("__tn", l2_norm(F.col("__tv"))).where(F.col("__tn") > 0)
    s = s.repartition(_par(src), F.col("src_id"))
    pairs = (s.crossJoin(F.broadcast(t))
             .select("src_id", "tgt_id",
                     (dot(F.col("__sv"), F.col("__tv"))
                      / (F.col("__sn") * F.col("__tn"))).alias("cos"))
             .localCheckpoint(eager=False))

    def _topk_mean(frame: DataFrame, key: str, other: str,
                   out: str) -> DataFrame:
        # deterministic k-mean: sort (cos, other_id) DESC, slice k, fold
        # in list order, divide by the slice's actual size (side smaller
        # than k stays well-defined)
        lst = F.slice(
            F.sort_array(F.collect_list(F.struct(F.col("cos").alias("c"),
                                                 F.col(other).alias("i"))),
                         asc=False), 1, k)
        return frame.groupBy(key).agg(
            (F.aggregate(lst, F.lit(0.0), lambda acc, x: acc + x["c"])
             / F.size(lst)).alias(out))

    dx = _topk_mean(pairs, "src_id", "tgt_id", "dsx")
    dy = _topk_mean(pairs, "tgt_id", "src_id", "dsy")
    # both k-mean tables are side-dimension-sized (one row per src/tgt
    # vector) — broadcast explicitly: Catalyst cannot size an aggregate
    # above the checkpointed pair frame and falls back to SMJ (the q246
    # convention)
    scored = (pairs.join(F.broadcast(dx), "src_id")
              .join(F.broadcast(dy), "tgt_id")
              .withColumn("margin",
                          F.col("cos")
                          / ((F.col("dsx") + F.col("dsy")) / 2.0)))
    w = Window.partitionBy("src_id").orderBy(F.col("margin").desc(),
                                             F.col("tgt_id").asc())
    return (scored.withColumn("rn", F.row_number().over(w))
            .where((F.col("rn") == 1)
                   & (F.col("margin") > margin_threshold))
            .select("src_id", "tgt_id",
                    F.round("cos", 6).cast("double").alias("cosine"),
                    F.round("margin", 6).cast("double").alias("margin")))
