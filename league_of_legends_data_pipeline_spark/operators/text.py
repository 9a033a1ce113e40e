"""Text-analysis operators for training-data pipelines: tokenization stats,
quality scoring, heuristic language ID, and document fingerprinting.

All pure Column expressions (JVM-side); the only state is small literal
stopword arrays baked into the plan. Engine-portable hashes (md5 / rolling
polynomial) so every operator is DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the heuristic language scorer
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "fr": ["le", "la", "de", "et", "un", "en", "est"],
    "es": ["el", "la", "de", "y", "un", "en", "es"],
    "de": ["der", "die", "das", "und", "ein", "in", "ist"],
    "zh": ["de", "shi", "he", "zai", "le", "you"],
}

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 31


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization (empty strings dropped)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def normalize_text(col: str | Column,
                   drop_pattern: str = "[^a-z0-9 ]") -> Column:
    """Dedup-grade text normalization (the CCNet/ExactSubstr practice of
    normalizing BEFORE exact dedup, so near-identical docs differing only
    in case/punctuation/whitespace collapse to one digest): lowercase →
    drop chars matching ``drop_pattern`` → collapse whitespace runs →
    trim. Pure Column pipeline (codegen, map-only); the default pattern
    is deliberately ASCII-explicit so any engine's regex dialect agrees
    character-for-character (``\\p{L}`` classes differ across engines).
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    # whitespace first so tabs/newlines become the spaces the drop
    # pattern keeps; the class is explicit (not \s) because Java and RE2
    # disagree on \s membership (\x0B)
    c = F.regexp_replace(c, "[ \t\n\r]", " ")
    c = F.regexp_replace(c, drop_pattern, "")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def stopword_ratio(toks: Column, stopwords: list[str]) -> Column:
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t)))) / \
        F.greatest(F.size(toks), F.lit(1))


def quality_score(col: str | Column) -> Column:
    """Heuristic quality in [0,1]: average of
    - length score: min(1, n_tokens / 50)
    - alpha ratio: fraction of alphanumeric+space characters
    - mean token length score: min(1, avg_len / 8)
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n = F.size(toks)
    length_score = F.least(F.lit(1.0), n / F.lit(50.0))
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z0-9 ]", ""))
    alpha_ratio = alpha / F.greatest(F.length(c), F.lit(1))
    avg_tok = F.length(F.concat_ws("", toks)) / F.greatest(n, F.lit(1))
    tok_score = F.least(F.lit(1.0), avg_tok / F.lit(8.0))
    return F.round((length_score + alpha_ratio + tok_score) / 3, 6)


def language_scores(col: str | Column) -> list[tuple[str, Column]]:
    """Per-language stopword-hit ratio columns (heuristic language ID)."""
    toks = tokens(col)
    return [(lang, F.round(stopword_ratio(toks, sw), 6)) for lang, sw in sorted(STOPWORDS.items())]


def predicted_language(col: str | Column) -> Column:
    """argmax language by stopword ratio; ties broken by language name
    (alphabetical, first wins) — deterministic.

    Implemented as array_max over (score, -index) structs: each score
    expression appears exactly once in the plan. (A nested when/otherwise
    fold duplicates every prior subtree twice per level — 2^n expression
    blow-up that Catalyst does not dedupe.)
    """
    scores = language_scores(col)
    langs = [lang for lang, _ in scores]
    best = F.array_max(F.array(*[
        F.struct(s.alias("score"), F.lit(-i).alias("neg_idx"))
        for i, (_, s) in enumerate(scores)
    ]))
    # highest score wins; on ties the larger neg_idx = smaller index =
    # alphabetically-first language (matches a strict-> first-wins fold)
    return F.element_at(F.array(*[F.lit(l) for l in langs]), -best["neg_idx"] + 1)


# BPE-ish pre-tokenizer (GPT-2-style, ASCII-simplified so the pattern
# behaves identically under Java regex and RE2): contractions, optional-
# space letter runs, digit runs, punctuation runs.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def bpe_pieces(col: str | Column) -> Column:
    """Array of BPE-style pre-token pieces (the unit a byte-pair encoder
    would merge within). Token-count estimates over this beat whitespace
    counts for LLM budget accounting."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0)


def bpe_piece_count(col: str | Column) -> Column:
    return F.size(bpe_pieces(col))


def ngrams_of(toks: Column, n: int = 2) -> Column:
    """Space-joined word n-grams of a token-array column, built as
    ``zip_with`` over ``n`` shifted ``slice``s — O(tokens) per row.

    NOT ``transform(sequence(...), i -> element_at(toks, i+j))``: every
    ``element_at`` inside a lambda is an independent occurrence of the
    token expression, so that shape re-evaluates the upstream split once
    per position — O(tokens²) per document (measured 30x slower on sf0.1).
    Empty array when the document has fewer than ``n`` words
    (``greatest(len, 0)`` guards the slice length).
    """
    cnt = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    out = F.slice(toks, F.lit(1), cnt)
    for j in range(1, n):
        out = F.zip_with(out, F.slice(toks, F.lit(1 + j), cnt),
                         lambda a, b: F.concat_ws(" ", a, b))
    return out


def word_ngrams(col: str | Column, n: int = 2) -> Column:
    """Array of space-joined word n-grams — a pure per-row projection (no
    explode, no shuffle, no UDF)."""
    return ngrams_of(tokens(col), n)


def word_ngram_table(df: DataFrame, id_col: str, text_col: str, n: int,
                     distinct: bool = True) -> DataFrame:
    """(id, gs: array<string>) word n-grams in one Arrow stage —
    semantics of ``array_distinct(word_ngrams(text, n))`` exactly
    (whitespace tokens via the explicit ASCII class, space-joined
    n-grams, first-seen-order dedup, null text → null array, fewer than
    ``n`` tokens → empty array).

    The Column rendering (zip_with over shifted slices) is interpreted —
    higher-order functions are CodegenFallback — and its ~n passes per
    document dominated q69's contamination scan; here it is one C-backed
    slicing pass per document with Arrow list output built from flat
    buffers.
    """
    import re

    import pyarrow as pa

    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    id_type = df.schema[id_col].dataType.simpleString()
    pa_id = {"bigint": pa.int64(), "int": pa.int32(),
             "string": pa.string()}.get(id_type, pa.int64())

    def gen(batches):
        for batch in batches:
            tbl = batch.to_pydict()
            ids, offs, flat, valid = [], [0], [], []
            for did, t in zip(tbl[id_col], tbl[text_col]):
                ids.append(did)
                if t is None:
                    valid.append(False)
                    offs.append(len(flat))
                    continue
                valid.append(True)
                toks = [x for x in ws.split(t) if x]
                grams = (" ".join(toks[i:i + n])
                         for i in range(len(toks) - n + 1))
                if distinct:
                    flat.extend(dict.fromkeys(grams))
                else:
                    flat.extend(grams)
                offs.append(len(flat))
            off_arr = pa.array(
                [None if not v else o
                 for v, o in zip(valid + [True], offs)]
                if not all(valid) else offs, pa.int32())
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa_id),
                 pa.ListArray.from_arrays(off_arr,
                                          pa.array(flat, pa.string()))],
                names=[id_col, "gs"])

    return df.select(id_col, text_col).mapInArrow(
        gen, f"{id_col} {id_type}, gs array<string>")


def ngram_repetition(col: str | Column, n: int = 2) -> tuple[Column, Column, Column]:
    """Gopher-style repetition stats over word n-grams:
    (total_ngrams, distinct_ngrams, dup_fraction). dup_fraction =
    1 - distinct/total (0.0 for empty docs). Everything is per-row Column
    arithmetic — the repetition filter over 100 TB is a map-only scan.

    Callers projecting several of these should materialize the gram array
    once (see ``repetition_stats``) — Catalyst's CollapseProject declines
    to inline non-cheap expressions referenced more than once, so a
    separate projection genuinely shares the work.
    """
    grams = word_ngrams(col, n)
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    frac = F.when(total > 0, F.round(1 - distinct / total, 6)).otherwise(F.lit(0.0))
    return total, distinct, frac


def repetition_stats(df: DataFrame, id_col: str, text_col: str, n: int = 2,
                     keep_below: float = 0.05) -> DataFrame:
    """Per-document repetition filter table: (id, total, distinct,
    dup_fraction, keep). The gram array is materialized in its own
    projection so the four downstream stats share ONE construction of it.
    """
    grams = df.select(F.col(id_col), ngrams_of(tokens(text_col), n).alias("__grams"))
    total = F.size("__grams")
    distinct = F.size(F.array_distinct("__grams"))
    stats = grams.select(
        F.col(id_col),
        total.alias("total_ngrams"),
        distinct.alias("distinct_ngrams"),
        F.when(total > 0, F.round(1 - distinct / total, 6))
         .otherwise(F.lit(0.0)).alias("dup_fraction"),
    )
    return stats.withColumn("keep", F.col("dup_fraction") <= keep_below)


def top_word_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document most-common-word stats (the other classic Gopher
    quality rule): (id, top_word, top_count, total_words, top_fraction),
    ties broken by word ascending.

    Shape: explode to (doc, word) once; per-(doc, word) counts and the
    per-doc total both come from that one exchange (the window total rides
    the same doc-keyed partitioning the row_number needs), so the full scan
    shuffles token counts, never text.
    """
    words = df.select(F.col(id_col).alias("__doc"),
                      F.explode(tokens(text_col)).alias("word"))
    wc = words.groupBy("__doc", "word").agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql import Window
    rank_w = Window.partitionBy("__doc").orderBy(F.col("cnt").desc(), F.col("word").asc())
    total_w = Window.partitionBy("__doc")
    return (
        wc.withColumn("total_words", F.sum("cnt").over(total_w))
        .withColumn("__rn", F.row_number().over(rank_w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("__doc").alias(id_col),
            F.col("word").alias("top_word"),
            F.col("cnt").alias("top_count"),
            F.col("total_words"),
            F.round(F.col("cnt") / F.col("total_words"), 6).alias("top_fraction"),
        )
    )


def fingerprint(col: str | Column) -> Column:
    """Polynomial rolling hash over the characters:
    h = fold(h*31 + ascii(ch)) mod 1e9+7. Portable (same in DuckDB).
    """
    c = F.col(col) if isinstance(col, str) else col
    chars = F.split(c, "")
    return F.aggregate(
        F.filter(chars, lambda ch: ch != ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * FINGERPRINT_BASE + F.ascii(ch)) % FINGERPRINT_MOD,
    )


def tfidf_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
) -> DataFrame:
    """Per-(group, term) TF-IDF: sum over the group's documents of
    tf(term, doc) * idf(term), idf = ln((N+1)/(df+1)) + 1 (smoothed).

    Shape chosen for corpus scale: the explode emits (doc_id, group, term)
    rows once; term frequencies and document frequencies are both grouped
    aggregations over those rows (map-side partial agg), and the idf join
    keys on the term — the shuffles move tokens and counts, never document
    text. N (corpus size) rides in via a 1-row cross join, not a driver
    collect, so the plan stays lazy end-to-end.
    """
    toks = df.select(
        F.col(id_col).alias("__doc"),
        F.col(group_col).alias("__grp"),
        F.explode(F.transform(tokens(text_col), F.lower)).alias("term"),
    )
    tf = toks.groupBy("__doc", "__grp", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    n_docs = df.select(F.count(F.lit(1)).alias("__n"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("__idf", F.log((F.col("__n") + F.lit(1.0)) / (F.col("dfreq") + F.lit(1.0))) + 1)
        .groupBy(F.col("__grp").alias(group_col), "term")
        .agg(F.round(F.sum(F.col("tf") * F.col("__idf")), 6).alias("tfidf"))
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 retrieval scores for a constant query against the corpus:
    (id, score) for every document matching >= 1 query term.

    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)); per-term contribution
    idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).

    Scale shape: the token explode is filtered to the query terms BEFORE
    any shuffle (an `isin` over a literal array, evaluated map-side), so
    the exchanges move only (doc, query-term, count) rows — for a 5-term
    query over 100 TB that is a few rows per matching document, never
    text. Document length is a map-only projection; N and avgdl ride in
    as a 1-row broadcast; the per-term document frequencies are a
    query-term-sized broadcast. The per-document sum adds 6dp-rounded
    integer micro-units so the score is summation-order-independent
    (engine-portable — see q86's rationale).
    """
    terms = [t.lower() for t in query_terms]
    toks = df.select(
        F.col(id_col).alias("__doc"),
        token_count(text_col).alias("__dl"),
        F.explode(F.transform(tokens(text_col), F.lower)).alias("term"),
    ).filter(F.col("term").isin(terms))
    tf = toks.groupBy("__doc", "__dl", "term").agg(
        F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    stats = df.select(F.count(F.lit(1)).alias("__n"),
                      F.sum(token_count(text_col)).alias("__toks"))
    contrib = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("__avgdl", F.col("__toks") / F.col("__n"))
        .withColumn("__idf", F.log(
            1.0 + (F.col("__n") - F.col("dfreq") + 0.5)
            / (F.col("dfreq") + 0.5)))
        .withColumn("__c", F.col("__idf") * F.col("tf") * (k1 + 1.0)
                    / (F.col("tf") + k1 * (1.0 - b + b * F.col("__dl")
                                           / F.col("__avgdl"))))
    )
    micro = F.round(F.col("__c") * 1_000_000).cast("long")
    return (contrib.groupBy(F.col("__doc").alias(id_col))
            .agg(F.round(F.sum(micro) / 1_000_000.0, 6).alias("score")))


def vocab_coverage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab_size: int = 64,
) -> DataFrame:
    """Per-document out-of-vocabulary stats against a corpus-derived
    vocabulary: (id, n_tokens, oov_tokens, oov_rate). The vocabulary is
    the top-``vocab_size`` lowercased words by total occurrences (ties to
    the lexicographically smaller word) — the tokenizer-coverage audit a
    training pipeline runs before committing to a vocab/tokenizer.

    Scale shape: one token explode feeds both the vocabulary aggregation
    and the per-document counts (counts shuffle, text does not). The
    vocabulary itself is vocab_size rows — a TakeOrdered on the term
    counts — and joins back as a broadcast left-semi, so the second pass
    over the corpus tokens never shuffles on the term. oov_rate 0.0 for
    empty documents.
    """
    toks = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(F.transform(tokens(text_col), F.lower)).alias("term"),
    )
    vocab = (toks.groupBy("term").agg(F.count(F.lit(1)).alias("__cnt"))
             .orderBy(F.col("__cnt").desc(), F.col("term").asc())
             .limit(vocab_size).select("term"))
    in_vocab = (toks.join(F.broadcast(vocab), "term")
                .groupBy("__doc").agg(F.count(F.lit(1)).alias("__iv")))
    totals = df.select(F.col(id_col),
                       token_count(text_col).alias("n_tokens"))
    return (
        totals.join(in_vocab, totals[id_col] == in_vocab["__doc"], "left")
        .withColumn("oov_tokens",
                    F.col("n_tokens") - F.coalesce(F.col("__iv"), F.lit(0)))
        .withColumn("oov_rate",
                    F.when(F.col("n_tokens") > 0,
                           F.round(F.col("oov_tokens")
                                   / F.col("n_tokens"), 6))
                    .otherwise(F.lit(0.0)))
        .select(id_col, "n_tokens", "oov_tokens", "oov_rate")
    )


def document_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document stat projection: token count, char count, quality,
    predicted language, fingerprint."""
    return df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        F.length(text_col).alias("n_chars_actual"),
        quality_score(text_col).alias("quality"),
        predicted_language(text_col).alias("pred_lang"),
        fingerprint(text_col).alias("fp"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window document chunking: split each document's token stream
    into ``chunk_size``-token windows every ``stride`` tokens (overlap =
    chunk_size - stride), the standard pre-training context construction.

    Output: (id, chunk_idx, chunk_len, chunk_digest) — one row per window,
    trailing short window kept, empty document yields one empty chunk.

    Scale shape: map-only. The window starts come from ``sequence()`` +
    ``posexplode`` (a generator, not a join), the slice is an array op on
    the already-tokenized row, and nothing shuffles — at 100 TB the chunker
    runs at scan speed and parallelism is the file-split count. Fan-out is
    bounded by len/stride (~2x rows at the default 25% overlap).
    """
    if chunk_size <= 0 or stride <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toks = tokens(text_col)
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(stride))
    exploded = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.posexplode(starts).alias("chunk_idx", "__start"),
    )
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, chunk_size)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("chunk_len"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_digest"),
    )


def unigram_logprob_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Cheap corpus-LM quality score (the CCNet/Gopher-style filter rung
    below a real LM): fit an add-``alpha`` smoothed unigram model on the
    corpus ITSELF, then score each document by the mean negative log2
    probability of its tokens. Typical prose scores near the corpus
    average; gibberish, boilerplate floods, and wrong-language documents
    land in the tails, which is exactly what the filter thresholds on.

    Returns (``id_col``, n_tokens, mean_neg_logprob).

    Scale shape: one token explode (map-side), one groupBy(token) with
    partial aggregation for the model counts (shuffle rows are (token,
    long)), one equi-join of tokens to their counts, one per-document
    aggregate. The two model scalars (total token count, vocabulary size)
    are bounded driver metadata — the model itself never leaves the
    cluster, unlike a broadcast-vocabulary design that would cap V by
    driver memory.
    """
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("__tok"))
    counts = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__c"))
    stats = counts.agg(F.sum("__c").alias("t"),
                       F.count(F.lit(1)).alias("v")).first()
    total, vocab = int(stats["t"] or 0), int(stats["v"] or 0)
    denom = float(total) + alpha * vocab
    logp = F.log2((F.col("__c") + F.lit(alpha)) / F.lit(denom))
    return (toks.join(counts, "__tok")
            .groupBy("__id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(F.avg(-logp), 6).alias("mean_neg_logprob"))
            .select(F.col("__id").alias(id_col), "n_tokens",
                    "mean_neg_logprob"))


def canary_scan(
    df: DataFrame,
    id_col: str,
    text_col: str,
    canaries: DataFrame,
    canary_col: str = "canary",
) -> DataFrame:
    """Planted-canary leak detection: count corpus documents containing
    each canary string verbatim (the BIG-bench canary-GUID practice —
    planted markers whose presence in training data proves benchmark
    leakage). Returns (canary, n_docs, first_doc_id).

    Scale shape: the canary list is small by nature and BROADCAST; the
    corpus is scanned once and each row evaluates `contains` per canary
    inside codegen — no shuffle of text, only (canary, id) hits reach the
    count. For canary sets too large for per-row contains (thousands+),
    use ``canary_scan_ac`` — a single Aho-Corasick pass per document in
    an Arrow-batched stage; the plan around it is unchanged
    (pytest-pinned to produce identical output to this form).
    """
    c = df.select(F.col(id_col).alias("__cid"),
                  F.col(text_col).alias("__ctext"))
    # distinct: a duplicated canary value must not double-count its
    # documents — n_docs counts documents, not canary-row multiplicity
    hits = c.join(F.broadcast(canaries.select(canary_col).distinct()),
                  F.expr(f"contains(__ctext, {canary_col})"))
    return (hits.groupBy(canary_col)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("__cid").alias("first_doc_id")))


def _ac_automaton(patterns: list) -> tuple[list, list, list]:
    """Aho-Corasick automaton as flat tables: (goto: list[dict],
    fail: list[int], out: list[list[int]]) over pattern indexes."""
    goto: list = [{}]
    out: list = [[]]
    for idx, p in enumerate(patterns):
        s = 0
        for ch in p:
            if ch not in goto[s]:
                goto.append({})
                out.append([])
                goto[s][ch] = len(goto) - 1
            s = goto[s][ch]
        out[s].append(idx)
    fail = [0] * len(goto)
    from collections import deque

    queue = deque(goto[0].values())
    while queue:
        s = queue.popleft()
        for ch, t in goto[s].items():
            queue.append(t)
            f = fail[s]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[t] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != t else 0
            out[t].extend(out[fail[t]])
    return goto, fail, out


def canary_scan_ac(
    df: DataFrame,
    id_col: str,
    text_col: str,
    canaries: DataFrame,
    canary_col: str = "canary",
) -> DataFrame:
    """``canary_scan`` for LARGE canary sets: one Aho-Corasick automaton
    pass per document instead of C per-row ``contains`` evaluations —
    O(len(text) + hits) per doc regardless of canary count.

    The canary list is collected to the driver (bounded by nature — the
    same size class every broadcast join already assumes) and shipped in
    the closure; each Python worker builds the automaton once per task
    batch iterator. The corpus-side plan is identical to ``canary_scan``:
    an Arrow-batched stage emits distinct (canary, id) hit pairs, one
    partial-aggregated groupBy counts them — text never shuffles.
    Output is pytest-pinned identical to ``canary_scan``.
    """
    pats = sorted({r[0] for r in
                   canaries.select(canary_col).distinct().collect()
                   if r[0] is not None})
    id_type = df.schema[id_col].dataType.simpleString()

    def gen(batches):
        goto, fail, out = _ac_automaton(pats)
        import pandas as pd

        for pdf in batches:
            ids, hits = [], []
            for did, t in zip(pdf[id_col], pdf[text_col]):
                if t is None:
                    continue
                s = 0
                found: set = set()
                for ch in t:
                    while s and ch not in goto[s]:
                        s = fail[s]
                    s = goto[s].get(ch, 0)
                    if out[s]:
                        found.update(out[s])
                for idx in found:
                    ids.append(did)
                    hits.append(pats[idx])
            yield pd.DataFrame({"__cid": pd.Series(ids, dtype="object"),
                                canary_col: pd.Series(hits, dtype="object")})

    pairs = df.select(id_col, text_col).mapInPandas(
        gen, f"__cid {id_type}, {canary_col} string")
    return (pairs.groupBy(canary_col)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("__cid").alias("first_doc_id")))


def calibrated_quality_filter(
    df: DataFrame,
    text_col: str,
    keep_fraction: float,
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Quality filtering calibrated to a KEEP RATE instead of a magic
    threshold: compute the quality-score cutoff at the (1 - keep_fraction)
    quantile of the corpus and keep rows at or above it — "keep the best
    60%" stays meaningful as the corpus distribution drifts, where a
    fixed threshold silently changes the kept volume.

    The cutoff is ONE scalar: a global aggregate broadcast back onto the
    scan (crossJoin of a 1-row frame), so the filter itself is map-side.
    ``exact=True`` uses the exact interpolated percentile (value buffer
    on one reducer — the oracle-checkable form, fine to ~10^8 rows);
    the default is ``approx_percentile`` (t-digest, mergeable map-side,
    bounded state) — the 100 TB path, at the cost of a rank error
    ~1/accuracy. Adds (quality, cutoff) columns.
    """
    if not 0.0 < keep_fraction <= 1.0:
        raise ValueError("keep_fraction must be in (0, 1]")
    p = 1.0 - keep_fraction
    scored = df.withColumn("quality", quality_score(text_col))
    if exact:
        agg = F.expr(f"percentile(quality, {p!r}D)")
    else:
        agg = F.expr(f"approx_percentile(quality, {p!r}D, {accuracy})")
    cut = scored.agg(agg.cast("double").alias("cutoff"))
    return (scored.crossJoin(F.broadcast(cut))
            .filter(F.col("quality") >= F.col("cutoff")))


def bpe_train(df: DataFrame, text_col: str, num_merges: int = 5,
              min_freq: int = 1) -> DataFrame:
    """Distributed BPE tokenizer TRAINING (Sennrich et al.; the dual of
    the q137 encode path): learn the first ``num_merges`` byte-pair
    merges from the corpus, returning one row per merge:
    (step, pair, new_symbol, pair_count, avg_tokens) where avg_tokens is
    the frequency-weighted mean symbols-per-word AFTER applying the
    merge (the compression trajectory).

    The standard scalable formulation: the corpus-sized work is ONE
    word-frequency aggregate (explode + groupBy, map-side combined);
    the merge loop then runs on the (word, freq) vocabulary table —
    bounded by distinct-word count, further cut by ``min_freq`` (the
    production lever at web scale, where hapax legomena dominate the
    vocab but cannot win a merge).

    Engine-portable merge application: a word is held as a
    delimiter-wrapped symbol string (``banana`` -> ``<b><a><n><a><n><a>``)
    so applying merge (a,n) is a PLAIN global string replace of
    ``<a><n>`` with ``<an>`` — non-overlapping leftmost-first in both
    Spark and DuckDB, which is exactly BPE's greedy semantics
    (``aaa`` + (a,a) -> ``aa a``, never ``a aa``). No sequential fold,
    no UDF; the winning pair each round is a 1-row broadcast
    (crossJoin) onto the vocab, never a driver collect.

    Tiebreak: (count DESC, pair ASC) — total order, both engines.
    """
    words = (df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
             .filter(F.col("w") != "")
             .groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
             .filter(F.col("freq") >= min_freq))
    # localCheckpoint per round (the pagerank/CC convention,
    # operators/graph.py): each round's vocab is vocabulary-sized, and
    # without truncation round k's pair aggregate replays rounds 1..k-1
    # (and the corpus word count) once per downstream branch.
    vocab = words.select(
        "freq", F.regexp_replace(F.col("w"), "(.)", "<$1>").alias("enc"))
    vocab = vocab.localCheckpoint(eager=True)

    def syms(enc: Column) -> Column:
        return F.split(F.btrim(enc, F.lit("<>")), "><")

    total = vocab.agg(F.sum("freq").alias("tw"))

    steps = []
    for step in range(1, num_merges + 1):
        s = syms(F.col("enc"))
        pairs = vocab.select(
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(s) - 1),
                    lambda i: F.concat(
                        F.lit("<"), F.element_at(s, i), F.lit("><"),
                        F.element_at(s, i + 1), F.lit(">")),
                )
            ).alias("pair"),
        ).filter(F.size(s) > 1)
        winner = (pairs.groupBy("pair")
                  .agg(F.sum("freq").alias("pair_count"))
                  .orderBy(F.col("pair_count").desc(), F.col("pair"))
                  .limit(1)
                  .select(F.lit(step).alias("step"), "pair", "pair_count"))
        vocab = (vocab.crossJoin(F.broadcast(winner))
                 .select(
                     "freq",
                     F.replace(
                         F.col("enc"), F.col("pair"),
                         F.replace(F.col("pair"), F.lit("><"), F.lit("")))
                     .alias("enc"),
                     "step", "pair", "pair_count"))
        after = (vocab.groupBy("step", "pair", "pair_count")
                 .agg(F.sum(F.col("freq") * F.size(syms(F.col("enc"))))
                      .alias("tok")))
        steps.append(after)
        vocab = vocab.select("freq", "enc").localCheckpoint(eager=True)

    merges = steps[0]
    for s_df in steps[1:]:
        merges = merges.unionByName(s_df)
    return (merges.crossJoin(F.broadcast(total))
            .select(
                "step", "pair",
                F.btrim(F.replace(F.col("pair"), F.lit("><"), F.lit("")),
                        F.lit("<>")).alias("new_symbol"),
                "pair_count",
                F.round(F.col("tok").cast("double") / F.col("tw"), 6)
                .alias("avg_tokens"))
            .orderBy("step"))


def _bigram_pairs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) adjacent-token pairs, empty tokens dropped.

    Built as ``arrays_zip`` of two 1-off array slices rather than a
    ``transform(sequence(...), element_at)`` HOF: element_at re-walks
    the array per index in the interpreted expression path, making the
    HOF form O(n^2)-ish per row and ~10x slower end to end (measured
    r13, sf0.1: 4.0s -> 0.37s for the pair build alone). Equivalence:
    for i in 1..size-1 both emit (arr[i], arr[i+1]); single-token and
    empty docs emit nothing (HOF form emitted a (w1, null) struct that
    its filter dropped; the zip slices are simply empty); split() never
    yields nulls, so the null guard is vacuous. Filter identical
    (w1 != '' AND w2 != '').
    """
    arr = F.split(F.lower(F.col(text_col)), " ")
    n1 = F.greatest(F.size(arr) - 1, F.lit(0))
    return (df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.arrays_zip(F.slice(arr, 1, n1),
                               F.slice(arr, 2, n1))).alias("bg"))
        .select("__id", F.col("bg.0").alias("w1"), F.col("bg.1").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != "")))


def bigram_logprob_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.75,
) -> DataFrame:
    """Interpolated bigram LM quality score — the KenLM-style rung one
    step above :func:`unigram_logprob_scores`: fit corpus bigram +
    unigram counts, score each document by the mean negative log2 of
    P(w2 | w1) = lam * C(w1 w2)/C(w1) + (1-lam) * C(w2)/N
    (Jelinek-Mercer interpolation; ``lam`` is a shared decimal literal,
    never derived at runtime, per the engine-portability conventions).
    Documents whose word transitions are unlike the corpus (shuffled
    text, boilerplate floods, wrong-language) score in the tail.

    Returns (``id_col``, n_bigrams, mean_neg_logprob) with the mean
    accumulated in integer micro-units (6dp) so summation order cannot
    produce last-ulp drift between engines.

    Scale shape: bigram pairs are built by a map-only array transform
    (no window, no self-join); model tables are (token, long) and
    (token-pair, long) partial aggregates; scoring joins the bigram
    stream to the three count tables on their natural keys. N is the
    single scalar that reaches the driver. Linear in corpus tokens at
    any scale; the count-table joins shuffle (pair, long) rows, never
    documents.
    """
    pairs = _bigram_pairs(df, id_col, text_col)

    toks = df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cu"))
    total = toks.agg(F.count(F.lit(1)).alias("n"))

    # Score each DISTINCT bigram once on the vocab-sized model table,
    # then make ONE join back to the per-doc bigram counts — the
    # corpus-sized stream is shuffled once (plus its two groupBys)
    # instead of through three model joins. Σ_occurrences micro ==
    # Σ_pairs cnt*micro exactly (integer arithmetic), so the rewrite is
    # value-identical. N stays in-plan as a 1-row broadcast, never a
    # driver count().
    doc_bi = pairs.groupBy("__id", "w1", "w2") \
                  .agg(F.count(F.lit(1)).alias("cnt"))
    bi = doc_bi.groupBy("w1", "w2").agg(F.sum("cnt").alias("cb"))
    p = (F.lit(lam) * F.col("cb") / F.col("c1")
         + F.lit(1.0 - lam) * F.col("c2") / F.col("n"))
    scored = (bi
              .join(uni.select(F.col("w").alias("w1"),
                               F.col("cu").alias("c1")), "w1")
              .join(uni.select(F.col("w").alias("w2"),
                               F.col("cu").alias("c2")), "w2")
              .crossJoin(F.broadcast(total))
              .select("w1", "w2",
                      F.round(-F.log2(p) * 1_000_000).cast("long")
                      .alias("micro")))
    return (doc_bi.join(scored, ["w1", "w2"])
            .groupBy("__id")
            .agg(F.sum("cnt").alias("n_bigrams"),
                 F.round(F.sum(F.col("cnt") * F.col("micro"))
                         / F.sum("cnt") / 1_000_000.0, 6)
                 .alias("mean_neg_logprob"))
            .select(F.col("__id").alias(id_col), "n_bigrams",
                    "mean_neg_logprob"))


def phrase_occurrences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    phrases: list[str],
) -> DataFrame:
    """Positional-index phrase search: count token-exact occurrences of
    each multi-word phrase per document via positional postings
    intersection — term k of the phrase must appear at position
    (start + k). This is the inverted-positional-index operation of a
    retrieval stack (and counts OVERLAPPING occurrences, which a
    regex/substring scan cannot): ``a a a`` contains ``a a`` twice.

    Implementation: one positional token explode FILTERED to the terms
    any phrase uses (an `isin` against a small literal set — predicate
    prunes the posting stream before any shuffle), then for each phrase
    k-1 equi-joins on (doc, position+offset, term). Phrase list is
    query-side metadata (small); the posting stream is corpus-sized but
    term-filtered. Output: (id, phrase, n_occurrences) for every
    (document, phrase) with at least one hit.

    100 TB shape: the join keys are (doc, position) — co-partitioned
    after the first shuffle, so the k-1 position joins are narrow;
    posting volume is bounded by the query terms' document frequency,
    exactly an inverted index's posting-list cost.
    """
    all_terms = sorted({t for p in phrases for t in p.split()})
    pos = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("p", "tok"),
    ).filter(F.col("tok").isin(all_terms))

    outs = []
    for phrase in phrases:
        terms = phrase.split()
        cur = (pos.filter(F.col("tok") == terms[0])
               .select("__id", F.col("p").alias("p0")))
        for k, t in enumerate(terms[1:], start=1):
            nxt = (pos.filter(F.col("tok") == t)
                   .select(F.col("__id").alias("__id2"),
                           (F.col("p") - k).alias("p0k")))
            cur = cur.join(
                nxt,
                (cur["__id"] == nxt["__id2"]) & (cur["p0"] == nxt["p0k"]),
            ).select("__id", "p0")
        outs.append(
            cur.groupBy("__id")
            .agg(F.count(F.lit(1)).alias("n_occurrences"))
            .select("__id", F.lit(phrase).alias("phrase"), "n_occurrences"))

    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.select(F.col("__id").alias(id_col), "phrase", "n_occurrences")


def entropy_scores(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   low_char_entropy: float = 3.5) -> DataFrame:
    """Shannon-entropy quality signals per document: character-level and
    word-level entropy in bits — the standard cheap detectors for
    degenerate text (repeated-character floods and template spam sit at
    low char entropy; natural prose sits near 4–4.5 bits/char, random
    base64-ish noise near 6). Complements the ratio-based filters
    (repetition_filter, top_word_fraction) with a distribution-shape
    signal neither captures.

    Engine-exactness: H = log2(N) - (1/N) * sum(n_i * log2(n_i)) where
    the per-symbol terms are rounded to integer micro-units (6 dp)
    BEFORE the cross-symbol sum — integer summation is order-free, and
    micro-rounding absorbs 1-ulp libm log differences between engines.
    The final H is rounded to 6 dp.

    Scale shape: two explode+groupBy passes whose shuffle rows are
    (doc, symbol, count) — linear in corpus bytes; no windows, no joins
    beyond a per-doc count merge; the classifier threshold is a shared
    decimal literal.
    """
    def sym_entropy(sym_df: DataFrame, n_col: str) -> DataFrame:
        counts = (sym_df.groupBy("__id", "s")
                  .agg(F.count(F.lit(1)).alias("c")))
        micro = F.round(F.col("c") * F.log2("c") * 1_000_000).cast("long")
        return (counts.groupBy("__id")
                .agg(F.sum("c").alias("__n"), F.sum(micro).alias("__t"))
                .select("__id", F.col("__n").alias(n_col),
                        F.round(F.log2("__n")
                                - (F.col("__t") / 1_000_000.0) / F.col("__n"),
                                6).alias(n_col.replace("n_", "h_"))))

    chars = df.select(F.col(id_col).alias("__id"),
                      F.explode(F.split(F.col(text_col), "")).alias("s")) \
              .filter(F.col("s") != "")
    words = df.select(F.col(id_col).alias("__id"),
                      F.explode(tokens(F.col(text_col))).alias("s"))
    ce = sym_entropy(chars, "n_chars")
    we = sym_entropy(words, "n_words")
    return (ce.join(we, "__id")
            .select(F.col("__id").alias(id_col),
                    "n_chars", F.col("h_chars").alias("char_entropy"),
                    "n_words", F.col("h_words").alias("word_entropy"),
                    F.when(F.col("h_chars") < low_char_entropy, F.lit("low"))
                    .otherwise(F.lit("ok")).alias("entropy_flag")))


def winnow_fingerprints(df: DataFrame, id_col: str, text_col: str,
                        k: int = 16, w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS local fingerprinting algorithm): hash every character k-gram,
    slide a window of ``w`` consecutive hashes over the sequence, and in
    each window select the minimum hash — rightmost occurrence on ties.
    Guarantees every shared substring of length >= k + w - 1 contributes
    at least one shared fingerprint, at ~2/(w+1) storage density.

    Returns (id, pos, fp) — pos is the 1-based k-gram position of each
    selected fingerprint, fp the 32-bit k-gram hash.

    Engine-exactness: the hash is the first 8 md5 hex chars (32 bits,
    portable); the rightmost-min tie rule is encoded arithmetically as
    ``key = fp * 2^20 + (2^20 - 1 - pos)`` so a single integer
    ``array_min`` per window picks (min hash, max pos). The 2^20 pos
    field bounds documents to ~1M characters — longer inputs must be
    chunked first (chunk_documents), which a 100 TB corpus does anyway.

    Scale shape: map-only per-row Column pipeline (k-gram keys array +
    O(n*w) window mins) — no shuffle, no UDF, no window-function
    sort; the distinct over selected positions happens inside the row
    (array_distinct). Docs shorter than w k-grams still emit their
    global-min fingerprint (the window at p = n covers all n); docs
    shorter than k emit nothing.
    """
    if w < 1 or k < 1:
        raise ValueError("winnow_fingerprints: k and w must be >= 1")
    POS = 1 << 20
    c = F.col(text_col)
    n = F.length(c) - F.lit(k - 1)  # number of k-grams
    fp32 = lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
    keys = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: fp32(c.substr(i, F.lit(k))) * POS + (F.lit(POS - 1) - i),
    )
    from league_of_legends_data_pipeline_spark.operators._util import (
        default_parallelism,
    )

    # single-file parquet arrives as one split; spread the O(n*w)
    # interpreted key computation across cores before it runs
    rows = (df.filter(F.length(c) >= k)
            .repartition(default_parallelism(df), F.col(id_col))
            .select(F.col(id_col).alias("__id"), keys.alias("__keys")))
    # window ending at p covers [max(p-w+1, 1), p]; valid ends start at
    # min(w, n) so short docs keep their single all-covering window
    sel = F.array_distinct(F.transform(
        F.sequence(F.least(F.lit(w), F.size("__keys")), F.size("__keys")),
        lambda p: F.array_min(F.slice(
            "__keys", F.greatest(p - F.lit(w - 1), F.lit(1)),
            p - F.greatest(p - F.lit(w - 1), F.lit(1)) + 1)),
    ))
    return (rows.select("__id", F.explode(sel).alias("__key"))
            .select(F.col("__id").alias(id_col),
                    (F.lit(POS - 1) - F.col("__key") % POS).alias("pos"),
                    (F.col("__key") / POS).cast("long").alias("fp")))


def winnow_similarity_pairs(df: DataFrame, id_col: str, text_col: str,
                            k: int = 16, w: int = 4,
                            max_doc_freq: int = 50,
                            min_shared: int = 2) -> DataFrame:
    """Document-pair similarity from shared winnowing fingerprints — the
    MOSS plagiarism/near-dup report: (id_a, id_b, shared, coverage_a,
    coverage_b) for pairs sharing >= ``min_shared`` distinct selected
    fingerprints, coverage_* = shared / |fingerprint set|.

    ``max_doc_freq`` is the boilerplate filter (and the scale guard):
    a fingerprint selected by more than that many documents is corpus
    boilerplate (license headers, templates) and is dropped BEFORE the
    pair join — exactly MOSS's "ignore matches in too many documents"
    rule, and what bounds the self-join fan-out: every surviving bucket
    yields <= C(max_doc_freq, 2) pairs, so the join is linear in
    (#fingerprints * max_doc_freq^2), never quadratic in corpus size.
    """
    # checkpoint the slim (id, fp) set once: four consumers (sizes,
    # df_counts, both join sides) would otherwise re-run the O(n*w)
    # per-character md5 fingerprint scan — the dominant cost — up to
    # 4x (r13; the exact_ntile/global_rank convention)
    fps = (winnow_fingerprints(df, id_col, text_col, k=k, w=w)
           .select(F.col(id_col).alias("__id"), "fp").distinct()
           .localCheckpoint(eager=True))
    sizes = fps.groupBy("__id").agg(F.count(F.lit(1)).alias("__sz"))
    df_counts = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("__df"))
    kept = (fps.join(df_counts.filter(F.col("__df") <= max_doc_freq)
                     .select("fp"), "fp"))
    a = kept.select(F.col("__id").alias("id_a"), "fp")
    b = kept.select(F.col("__id").alias("id_b"), "fp")
    pairs = (a.join(b, "fp")
             .filter(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count(F.lit(1)).alias("shared"))
             .filter(F.col("shared") >= min_shared))
    sa = sizes.select(F.col("__id").alias("id_a"), F.col("__sz").alias("__sa"))
    sb = sizes.select(F.col("__id").alias("id_b"), F.col("__sz").alias("__sb"))
    return (pairs.join(sa, "id_a").join(sb, "id_b")
            .select("id_a", "id_b", "shared",
                    F.round(F.col("shared") / F.col("__sa"), 6)
                    .alias("coverage_a"),
                    F.round(F.col("shared") / F.col("__sb"), 6)
                    .alias("coverage_b")))


def perplexity_buckets(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n_buckets: int = 3,
                       lam: float = 0.75) -> DataFrame:
    """CCNet-style perplexity bucketing: score every document with the
    interpolated bigram LM, rank the corpus by (score, id), cut it into
    ``n_buckets`` exact NTILE buckets, and report each bucket — for 3,
    the classic head / middle / tail split CCNet feeds to its mixture
    (head = lowest perplexity = cleanest text).

    Returns (bucket, label, n_docs, min_score, max_score, mean_score).

    Scale shape: scoring is q167's linear pipeline; ranking uses
    ``exact_ntile`` (range partition + per-partition offsets — only
    partition counts touch the driver, no single-partition window);
    mean_score accumulates integer micro-units (scores are 6 dp-rounded,
    so micro recovery is exact) for order-free cross-row summation.
    """
    from league_of_legends_data_pipeline_spark.operators.sampling import (
        exact_ntile,
    )

    # Checkpoint the scored frame (slim: id + score) before ranking:
    # exact_ntile drives two driver actions (boundary sketch, bucket
    # counts) plus the final plan, and each would re-run the whole LM
    # scoring chain otherwise — measured 3x the query cost at sf0.1.
    scored = (bigram_logprob_scores(df, id_col, text_col, lam=lam)
              .select(id_col, "mean_neg_logprob")
              .localCheckpoint(eager=True))
    b = exact_ntile(scored, ["mean_neg_logprob", id_col], n_buckets)
    labels = {1: "head", 2: "middle", 3: "tail"} if n_buckets == 3 else {}
    label = F.col("bucket").cast("string")
    for k, v in labels.items():
        label = F.when(F.col("bucket") == k, F.lit(v)).otherwise(label)
    micro = F.round(F.col("mean_neg_logprob") * 1_000_000).cast("long")
    return (b.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("mean_neg_logprob").alias("min_score"),
                 F.max("mean_neg_logprob").alias("max_score"),
                 F.sum(micro).alias("__t"))
            .withColumn("label", label)
            .select("bucket", "label", "n_docs", "min_score", "max_score",
                    F.round(F.col("__t") / F.col("n_docs") / 1_000_000.0, 6)
                    .alias("mean_score")))


def pmi_collocations(df: DataFrame, text_col: str,
                     min_count: int = 5, top_k: int = 50) -> DataFrame:
    """Pointwise-mutual-information collocation mining — the classic
    vocabulary/phrase-induction signal (Mikolov et al.'s word2vec
    phrase pass scores exactly this): PMI(w1, w2) =
    log2(C(w1 w2) * N / (C(w1) * C(w2))), over adjacent token pairs,
    kept when the pair count clears ``min_count`` (rare-pair PMI is
    noise), top ``top_k`` by (pmi desc, w1, w2).

    Returns (w1, w2, pair_count, pmi) with pmi rounded to 6 dp BEFORE
    the ordering, so the cutoff ranks identically in any engine.

    Scale shape: identical to the bigram-LM pipeline — map-only array
    self-zip for pairs, two token-count aggregates, two natural-key
    joins to put marginals on the pair table; N is a 1-row broadcast.
    The integer product C12*N stays < 2^63 up to ~3e9-token corpora per
    count cell; beyond that, swap the ratio to double before the
    multiply (documented lever, same signs).
    """
    toks = F.split(F.lower(F.col(text_col)), " ")
    pairs = (df.select(
        F.explode(F.arrays_zip(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))))
        .alias("p"))
        .select(F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != "")))
    uni = (df.select(F.explode(toks).alias("w")).filter(F.col("w") != "")
           .groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    n = uni.agg(F.sum("c").alias("__N"))
    bi = (pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count"))
          .filter(F.col("pair_count") >= min_count))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("__c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("__c2"))
    return (bi.join(u1, "w1").join(u2, "w2")
            .join(F.broadcast(n))
            .select("w1", "w2", "pair_count",
                    F.round(F.log2(F.col("pair_count") * F.col("__N")
                                   / (F.col("__c1") * F.col("__c2"))), 6)
                    .alias("pmi"))
            .orderBy(F.col("pmi").desc(), "w1", "w2")
            .limit(top_k))


def token_group_chi2(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    *,
    min_df: int = 10,
    max_df_frac: float = 0.95,
    top_k: int = 5,
) -> DataFrame:
    """Chi-square keyword extraction: the ``top_k`` tokens most
    associated with each group (source/domain/language) by the 2x2
    presence/absence chi-square statistic — the classic supervised
    feature-selection signal, and the fast way to see WHAT makes one
    corpus slice different from the rest before mixing.

    Doc-level presence (distinct tokens per doc), global df floor
    ``min_df`` to keep the contingency stable (and ceiling
    ``max_df_frac`` — a token in EVERY doc zeroes the (c+d) margin and
    the statistic degenerates to 0/0), then for each
    (token, group): a = docs in group containing token, and the 2x2
    completion b/c/d from the token's global df, the group's size and
    N. chi2 = N(ad-bc)²/((a+b)(c+d)(a+c)(b+d)), computed in DOUBLE
    from the first multiply (the cross term overflows int64 on
    trillion-doc corpora). Rounded 6dp; ties broken by token string.

    Shape: explode-distinct + three aggregates (token df, group sizes,
    (token, group) counts) + one broadcast of the tiny group-size
    frame. The (token, group) frame is vocab x groups — linear in
    corpus, never quadratic.
    """
    pres = df.select(F.col(id_col).alias("doc_id"),
                     F.col(group_col).alias("grp"),
                     F.explode(F.array_distinct(tokens(text_col)))
                     .alias("tok"))
    n_total = df.select(F.count(F.lit(1)).alias("__N"))
    tok_df = (pres.groupBy("tok").agg(F.count(F.lit(1)).alias("t_df"))
              .filter(F.col("t_df") >= min_df)
              .crossJoin(F.broadcast(n_total))
              .filter(F.col("t_df") <= max_df_frac * F.col("__N"))
              .select("tok", "t_df"))
    grp_sz = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("g_n"))
    tg = (pres.join(F.broadcast(tok_df), "tok")
          .groupBy("tok", "grp").agg(F.count(F.lit(1)).alias("a"),
                                     F.first("t_df").alias("t_df")))
    x = (tg.join(F.broadcast(grp_sz), "grp")
         .crossJoin(F.broadcast(n_total)))
    a = F.col("a").cast("double")
    b = (F.col("t_df") - F.col("a")).cast("double")
    c = (F.col("g_n") - F.col("a")).cast("double")
    d = (F.col("__N") - F.col("t_df") - F.col("g_n")
         + F.col("a")).cast("double")
    n = F.col("__N").cast("double")
    chi2 = (n * (a * d - b * c) * (a * d - b * c)
            / ((a + b) * (c + d) * (a + c) * (b + d)))
    scored = x.select("grp", "tok", "a", "t_df",
                      F.round(chi2, 6).alias("chi2"))
    from pyspark.sql import Window
    w = Window.partitionBy("grp").orderBy(F.col("chi2").desc(), "tok")
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= top_k))


def ngram_novelty(df: DataFrame, id_col: str, text_col: str,
                  n: int = 3) -> DataFrame:
    """Per-document n-gram novelty against the ids-before-it corpus:
    the fraction of a doc's distinct word n-grams whose FIRST corpus
    occurrence (minimum doc id) is this doc — the diversity/memorization
    signal curation uses to find docs that only restate earlier content
    (novelty ~ 0: boilerplate/mirror; ~ 1: genuinely new text).
    Returns (id, n_grams, n_novel, novelty); docs with fewer than ``n``
    words have no n-grams and are excluded.

    One explode + one (gram -> min id) aggregate + one join back on the
    gram: linear in total gram count, and the gram table is the same
    frame an inverted index or winnowing pass would build anyway.
    """
    grams = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(word_ngrams(text_col, n))).alias("g"))
    firsts = grams.groupBy("g").agg(F.min("doc_id").alias("first_id"))
    return (grams.join(firsts, "g")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 F.sum(F.when(F.col("first_id") == F.col("doc_id"), 1)
                       .otherwise(0)).alias("n_novel"))
            .withColumn("novelty",
                        F.round(F.col("n_novel") / F.col("n_grams"), 6)))


def threshold_sweep(df: DataFrame, score_col: str | Column,
                    group_col: str,
                    thresholds: list[float]) -> DataFrame:
    """Keep-rate sensitivity curve for a quality threshold: for every
    candidate cutoff, how many docs (and what fraction) each group
    keeps — the report read BEFORE freezing a filter threshold, so the
    cliff (a cutoff that silently deletes a language) is visible ahead
    of time. Returns (group, threshold, n_kept, keep_rate).

    ONE conditional-sum aggregate computes every threshold at once
    (len(thresholds) sums riding the same grouped scan), then a
    struct-explode unpivots — no per-threshold scans, no joins.
    """
    s = F.col(score_col) if isinstance(score_col, str) else score_col
    agg = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(F.when(s >= t, 1).otherwise(0)).alias(f"__k{i}")
          for i, t in enumerate(thresholds)])
    return (agg.select("grp", F.explode(F.array(*[
        F.struct(F.lit(t).alias("threshold"),
                 F.col(f"__k{i}").cast("long").alias("n_kept"),
                 F.round(F.col(f"__k{i}") / F.col("__n"), 6)
                 .alias("keep_rate"))
        for i, t in enumerate(thresholds)])).alias("r"))
        .select("grp", "r.*"))


def structure_fingerprint(col: str | Column) -> Column:
    """Template fingerprint: collapse letter runs to ``w``, digit runs
    to ``#``, lowercase first — so 'Order #1234 shipped' and
    'Order #98 shipped' collapse to the same shape. The
    template/boilerplate detector exact dedup misses (every instance
    differs) and near-dup over-triggers on (shared vocabulary, not
    shared structure). Pure Column regex pipeline, explicit ASCII
    classes (engine-portable).
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, "[0-9]+", "#")
    c = F.regexp_replace(c, "[a-z]+", "w")
    c = F.regexp_replace(c, "[ \t\n\r]+", " ")
    return F.trim(c)


def template_report(df: DataFrame, id_col: str, text_col: str,
                    min_count: int = 3) -> DataFrame:
    """Top templates by instance count: structure fingerprints with
    >= ``min_count`` instances, their coverage of the corpus, and a
    sample doc id per template (min id — deterministic). One digest
    groupBy; the fingerprint column is map-only.
    """
    fp = structure_fingerprint(text_col)
    n_total = df.select(F.count(F.lit(1)).alias("__N"))
    return (df.select(F.col(id_col).alias("doc_id"),
                      F.md5(fp).alias("template_digest"))
            .groupBy("template_digest")
            .agg(F.count(F.lit(1)).alias("n_instances"),
                 F.min("doc_id").alias("sample_doc_id"))
            .filter(F.col("n_instances") >= min_count)
            .crossJoin(F.broadcast(n_total))
            .withColumn("corpus_share",
                        F.round(F.col("n_instances") / F.col("__N"), 6))
            .drop("__N"))


def kneser_ney_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM score — the smoothing that
    actually ships in n-gram LMs (KenLM's default), one rung above
    :func:`bigram_logprob_scores`'s Jelinek-Mercer mixture:

        P_KN(w2 | w1) = max(C(w1 w2) - D, 0) / C(w1 ·)
                        + D * N1+(w1 ·) / C(w1 ·) * P_cont(w2)
        P_cont(w2)    = N1+(· w2) / N1+(· ·)

    The continuation probability asks "in how many CONTEXTS does w2
    appear", not "how often" — the famous 'San Francisco' correction:
    'Francisco' is frequent but follows almost nothing, so its unigram
    backoff weight should be tiny. ``discount`` (D) is a shared decimal
    literal, never derived at runtime, per the engine-portability
    conventions. Scoring evaluates the corpus's own bigrams, where
    C(w1 w2) >= 1 > D keeps every probability positive.

    Returns (``id_col``, n_bigrams, mean_neg_logprob) with the mean
    accumulated in integer micro-units (6dp) so summation order cannot
    produce last-ulp drift between engines.

    Scale shape: identical to :func:`bigram_logprob_scores` — map-only
    pair construction, (pair, long) / (token, long) model aggregates,
    each DISTINCT bigram scored once on the vocab-sized table, ONE join
    back to per-doc bigram counts. N1+(··) is a 1-row broadcast. Linear
    in corpus tokens; model-table shuffles move (pair, long) rows,
    never documents.
    """
    pairs = _bigram_pairs(df, id_col, text_col)

    doc_bi = pairs.groupBy("__id", "w1", "w2") \
                  .agg(F.count(F.lit(1)).alias("cnt"))
    bi = doc_bi.groupBy("w1", "w2").agg(F.sum("cnt").alias("cb"))
    ctx = bi.groupBy("w1").agg(F.sum("cb").alias("c1"),
                               F.count(F.lit(1)).alias("nf"))
    prec = bi.groupBy("w2").agg(F.count(F.lit(1)).alias("np_"))
    types = bi.agg(F.count(F.lit(1)).alias("t"))

    p = ((F.col("cb") - F.lit(discount)) / F.col("c1")
         + F.lit(discount) * F.col("nf") / F.col("c1")
         * (F.col("np_") / F.col("t")))
    scored = (bi.join(ctx, "w1")
              .join(prec, "w2")
              .crossJoin(F.broadcast(types))
              .select("w1", "w2",
                      F.round(-F.log2(p) * 1_000_000).cast("long")
                      .alias("micro")))
    return (doc_bi.join(scored, ["w1", "w2"])
            .groupBy("__id")
            .agg(F.sum("cnt").alias("n_bigrams"),
                 F.round(F.sum(F.col("cnt") * F.col("micro"))
                         / F.sum("cnt") / 1_000_000.0, 6)
                 .alias("mean_neg_logprob"))
            .select(F.col("__id").alias(id_col), "n_bigrams",
                    "mean_neg_logprob"))
