"""Web-corpus cleaning tier: HTML text extraction, URL canonicalization,
PII detection/redaction, and paragraph-level first-occurrence dedup.

These are the C4/CCNet-style preprocessing stages that sit UPSTREAM of the
dedup/quality operators (operators/dedup.py, operators/text.py) in a
large-scale training-data pipeline: raw crawl bytes -> extracted text ->
canonical URLs for source-level dedup -> PII scrubbing -> paragraph dedup.
Reference parity: the reference repo (S3 JSON -> flatten -> MySQL) has no
web-cleaning surface; this tier is part of the repo's LLM-pipeline mandate
(brief: "the operations a large-scale training-data pipeline would need").

Engine-portability rules (see plans/queries.py conventions):

- Every regex used here is RE2-compatible (no lookaround, no backrefs) so
  the same pattern string behaves identically under Java regex (Spark) and
  RE2 (DuckDB). Inline flags like ``(?s)`` are used instead of API flags;
  DuckDB oracles additionally pass ``'g'`` since its ``regexp_replace``
  is first-match-only by default while Spark's is global.
- No Python UDFs: everything below is a pure Column projection (JVM-side,
  whole-stage codegen) or a declarative DataFrame transform. Per-row work
  is O(len) regexp/array ops — linear scans at any corpus size.

100 TB shape: every function here is map-only except
``paragraph_dedup`` (one explode + one window over the span-hash key + one
re-aggregation — shuffle volume is the token stream, partitioned by hash,
no joins) and the dedup's stats row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = [
    "strip_html",
    "canonical_url",
    "registered_domain",
    "pii_counts",
    "redact_pii",
    "luhn_valid",
    "paragraph_dedup",
]


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------------------
# HTML text extraction
# ---------------------------------------------------------------------------

# Order matters: containers with content first (script/style/comments), then
# remaining tags, then entities, then whitespace normalization.
_HTML_CONTAINER_RE = r"(?s)<(script|style)[^>]*>.*?</(script|style)>"
_HTML_COMMENT_RE = r"(?s)<!--.*?-->"
_HTML_TAG_RE = r"(?s)<[^>]*>"
_HTML_ENTITIES = [
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
]


def strip_html(col: str | Column) -> Column:
    """Extract readable text from an HTML payload (trafilatura-lite):

    1. drop ``<script>``/``<style>`` elements INCLUDING their content
       (code/CSS is not training text),
    2. drop comments,
    3. replace every remaining tag with a space (block boundaries must not
       glue words together),
    4. decode the six entities that dominate real crawl text,
    5. collapse whitespace runs and trim.

    Pure Column projection; the DuckDB dual is the same pattern strings with
    the ``g`` flag (see q161's oracle).
    """
    c = _c(col)
    c = F.regexp_replace(c, _HTML_CONTAINER_RE, " ")
    c = F.regexp_replace(c, _HTML_COMMENT_RE, " ")
    c = F.regexp_replace(c, _HTML_TAG_RE, " ")
    for ent, rep in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------

# scheme :// host [:port] [path] [?query] [#fragment]
_URL_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_URL_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)"
_URL_PORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]*:([0-9]+)"
_URL_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_URL_QUERY_RE = r"\?([^#]*)"

# Tracking parameters stripped during canonicalization (the CommonCrawl /
# C4 practice: utm_* plus the big click-id params).
_TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)="


def canonical_url(col: str | Column) -> Column:
    """Canonical form of an absolute http(s) URL for URL-level dedup:

    - scheme and host lowercased (RFC 3986 §6.2.2.1),
    - default ports dropped (``:80`` for http, ``:443`` for https),
    - tracking query params (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``,
      ``ref``) removed, remaining params sorted for order-insensitivity,
    - fragment dropped,
    - trailing ``/`` stripped from non-root paths; empty path -> ``/``.

    Built from regexp_extract / array ops only — each step has an exact
    DuckDB dual (q162). Malformed URLs (no ``scheme://``) pass through
    lowercased-scheme-less as-is semantics: scheme extract yields '' and
    the result is NULL-safe empty.
    """
    u = _c(col)
    scheme = F.lower(F.regexp_extract(u, _URL_SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(u, _URL_HOST_RE, 1))
    port = F.regexp_extract(u, _URL_PORT_RE, 1)
    path = F.regexp_extract(u, _URL_PATH_RE, 1)
    query = F.regexp_extract(u, _URL_QUERY_RE, 1)

    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    port_part = F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit(""))

    # normalize path: strip trailing slash unless root; empty -> "/"
    norm_path = F.when(path == "", F.lit("/")).otherwise(
        F.when(
            (F.length(path) > 1) & path.endswith("/"),
            path.substr(F.lit(1), F.length(path) - 1),
        ).otherwise(path)
    )

    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & (F.regexp_extract(p, _TRACKING_PARAM_RE, 0) == ""),
    )
    qpart = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&")),
    ).otherwise(F.lit(""))

    return F.concat(scheme, F.lit("://"), host, port_part, norm_path, qpart)


def registered_domain(host_or_url: str | Column, from_url: bool = True) -> Column:
    """Heuristic registered domain: the last two dot-labels of the host
    (``www.a.example.com`` -> ``example.com``). A public-suffix list is the
    production refinement (broadcast it as a dim table); the two-label
    heuristic is the engine-portable floor used by the oracle dual.
    """
    h = _c(host_or_url)
    if from_url:
        h = F.lower(F.regexp_extract(h, _URL_HOST_RE, 1))
    parts = F.split(h, r"\.")
    n = F.size(parts)
    return F.when(
        n >= 2,
        F.concat(F.element_at(parts, n - 1), F.lit("."), F.element_at(parts, n)),
    ).otherwise(h)


# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
_IPV4_RE = (
    r"\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
    r"(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b"
)
_PHONE_RE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"
_SSN_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
_CC16_RE = r"\b[0-9]{16}\b"

# An SSN-shaped token also matches nothing else here, but a phone-shaped one
# (3-3-4) is disjoint from SSN's 3-2-4 grouping, so counts don't overlap.


def luhn_valid(digits: str | Column) -> Column:
    """Luhn checksum validity of a decimal-digit string (the gate that
    separates a real card number from 16 arbitrary digits — halves PII
    false positives on numeric-heavy corpora).

    Implemented as a position-parity weighted digit sum: from the RIGHT,
    every second digit doubles (with 9-subtraction above 4). Position
    parity is known per index, so this is an index-based ``transform`` +
    ``aggregate`` — no sequential fold, exact integer arithmetic, and the
    DuckDB dual is ``list_sum(list_transform(range ...))`` (q163 oracle).
    """
    d = _c(digits)
    n = F.length(d)
    # i runs 1..n left-to-right; digit doubles when (n - i) is odd
    summed = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.when(((n - i) % 2) == 1, _luhn_doubled(d, i))
            .otherwise(d.substr(i, F.lit(1)).cast("int")),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (summed % 10) == 0


def _luhn_doubled(d: Column, i: Column) -> Column:
    v = d.substr(i, F.lit(1)).cast("int")
    return F.when(v > 4, v * 2 - 9).otherwise(v * 2)


def pii_counts(col: str | Column) -> dict[str, Column]:
    """Per-row PII hit counts by category. Credit-card counts only
    Luhn-valid 16-digit runs; the other categories are pure regex.
    Returns a dict of named Columns so callers pick their severity set.
    """
    c = _c(col)
    cc_candidates = F.regexp_extract_all(c, F.lit(_CC16_RE), 0)
    return {
        "n_email": F.size(F.regexp_extract_all(c, F.lit(_EMAIL_RE), 0)),
        "n_ipv4": F.size(F.regexp_extract_all(c, F.lit(_IPV4_RE), 0)),
        "n_phone": F.size(F.regexp_extract_all(c, F.lit(_PHONE_RE), 0)),
        "n_ssn": F.size(F.regexp_extract_all(c, F.lit(_SSN_RE), 0)),
        "n_cc_valid": F.size(F.filter(cc_candidates, luhn_valid)),
        "n_cc_seen": F.size(cc_candidates),
    }


def redact_pii(col: str | Column) -> Column:
    """Replace PII spans with typed placeholder tokens (the scrubbing
    pass a training corpus gets before tokenization). Email first — an
    email's local part can contain digit runs the later patterns would
    half-eat. SSN (3-2-4) before phone (3-3-4): disjoint shapes, order
    kept deterministic anyway. 16-digit runs redact WITHOUT the Luhn
    gate here — redaction is recall-first (scrub anything card-shaped),
    detection (pii_counts) is precision-first. Both choices mirror into
    the oracle dual.
    """
    c = _c(col)
    c = F.regexp_replace(c, _EMAIL_RE, "[EMAIL]")
    c = F.regexp_replace(c, _IPV4_RE, "[IP]")
    c = F.regexp_replace(c, _SSN_RE, "[SSN]")
    c = F.regexp_replace(c, _PHONE_RE, "[PHONE]")
    c = F.regexp_replace(c, _CC16_RE, "[CARD]")
    return c


# ---------------------------------------------------------------------------
# Paragraph-level first-occurrence dedup (the C4 line-dedup pass)
# ---------------------------------------------------------------------------


def paragraph_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_tokens: int = 15,
) -> DataFrame:
    """C4-style global paragraph dedup: split each document's token stream
    into fixed ``span_tokens`` windows ("paragraphs" — the corpus has no
    newline structure, so spans are the deterministic unit), keep each
    distinct span's FIRST occurrence corpus-wide (ordered by
    (doc id, position) — a total order, so the survivor is unique), drop
    repeats, and reassemble the surviving text per document.

    Output: (id, kept_text, n_spans, n_kept, n_dropped) — one row per
    input document (documents whose every span is a repeat keep an empty
    string, mirroring C4's empty-doc follow-up filter).

    Scale shape: explode -> ONE window over the span-hash key (shuffle
    partitioned by span hash, each group tiny) -> re-aggregate by doc id.
    No joins, no driver state; the window's per-key group is the number of
    occurrences of one span, never the corpus. At 100 TB the only hot spot
    is a mega-duplicated span (boilerplate); its group is a single key's
    occurrence list, handled by the same skew story as any groupBy (AQE
    skew split does not apply inside a window, but rank-over-hash only
    needs a sort WITHIN the key — Spark spills window groups to disk).
    """
    spans = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        (F.size(F.split(F.col(text_col), " ")) - 1)
                        / F.lit(span_tokens),
                        F.lit(0),
                    ).cast("int"),
                ),
                lambda b: F.array_join(
                    F.slice(
                        F.split(F.col(text_col), " "),
                        b * span_tokens + 1,
                        span_tokens,
                    ),
                    " ",
                ),
            )
        ).alias("pos", "span"),
    ).filter(F.col("span") != "")

    w = W.partitionBy("span").orderBy("_id", "pos")
    kept = spans.withColumn("rk", F.row_number().over(w))

    return (
        kept.groupBy(F.col("_id").alias(id_col))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rk") == 1,
                                F.struct(F.col("pos"), F.col("span")),
                            )
                        )
                    ),
                    lambda s: s["span"],
                ),
                " ",
            ).alias("kept_text"),
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("rk") == 1).cast("long")).alias("n_kept"),
            F.sum((F.col("rk") != 1).cast("long")).alias("n_dropped"),
        )
    )


# code-detection keyword list: language-agnostic tokens that are rare in
# prose; matched as substrings with their trailing delimiter so 'variable'
# does not hit 'var '
CODE_KEYWORDS = ["def ", "return ", "import ", "function ", "var ",
                 "const ", "class ", "void ", "#include", "public ",
                 "});", "=>", "()"]
CODE_SYMBOLS = "[^{}()\\[\\];=<>|&]"  # regexp_replace keep-class


def code_signals(col: str | Column) -> dict[str, Column]:
    """Per-document code-vs-prose signals (the corpus-cleaning heuristic
    for routing source code out of a prose training mix — FastText-style
    classifiers start from exactly these features):

    - ``n_symbols``: count of code-y punctuation ``{}()[];=<>|&``
    - ``keyword_hits``: total occurrences of :data:`CODE_KEYWORDS`
      (delimiter-suffixed substring counts via replace-length arithmetic
      — portable, no regex dialect)
    - ``indent_lines``: lines starting with two spaces or a tab
    - ``is_code``: integer cross-multiplied classification — symbols
      exceed 3% of characters OR >= 2 keyword hits OR any indented line.
      Pure integer predicates: no float threshold can straddle an engine
      rounding boundary.

    All pure Column expressions — the 100 TB shape is a map-only scan.
    """
    c = _c(col)
    n_chars = F.greatest(F.length(c), F.lit(1))
    n_symbols = F.length(F.regexp_replace(c, CODE_SYMBOLS, ""))
    hits = None
    for kw in CODE_KEYWORDS:
        h = ((F.length(c) - F.length(F.replace(c, F.lit(kw), F.lit(""))))
             / F.lit(len(kw))).cast("long")
        hits = h if hits is None else hits + h
    lines = F.split(c, "\n")
    indent = F.size(F.filter(
        lines, lambda ln: ln.startswith("  ") | ln.startswith("\t")))
    is_code = ((n_symbols * 100 > n_chars * 3) | (hits >= 2)
               | (indent >= 1))
    return {
        "n_symbols": n_symbols.cast("long"),
        "keyword_hits": hits,
        "indent_lines": indent.cast("long"),
        "is_code": is_code,
    }


def code_detection_report(df: DataFrame, id_col: str, text_col: str,
                          group_col: str) -> DataFrame:
    """Corpus code-contamination report grouped by ``group_col``:
    (group, n_docs, n_code, n_symbols, keyword_hits) — the routing table
    a mixture pipeline uses to decide which sources need a code split.
    Map-only signals + one partial-aggregating groupBy."""
    s = code_signals(text_col)
    return (df.select(F.col(group_col).alias("grp"),
                      s["n_symbols"].alias("ns"),
                      s["keyword_hits"].alias("kh"),
                      s["is_code"].cast("long").alias("ic"))
            .groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("ic").alias("n_code"),
                 F.sum("ns").alias("n_symbols"),
                 F.sum("kh").alias("keyword_hits")))


def encoding_signals(col: str | Column) -> dict[str, Column]:
    """Mojibake / encoding-damage signals — the cheap first gate of a
    web-corpus cleaning pass (docs that went through a wrong-charset
    decode carry U+FFFD replacement chars; binary-contaminated docs
    carry C0 control bytes): per-doc ratios, each a pure Column
    (codegen, map-only, no UDF).

    Character classes are spelled as explicit code-point ranges so the
    Java-regex Spark side and any RE2-style oracle agree character for
    character (``\\p{Cc}``-class shorthands differ across engines);
    tab/newline/CR are deliberately EXCLUDED from the control class —
    they are structure, not damage.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.greatest(F.length(c), F.lit(1))

    def _ratio(pattern: str) -> Column:
        return F.round(
            (F.length(c) - F.length(F.regexp_replace(c, pattern, ""))) / n, 6)

    return {
        "n_chars": F.length(c),
        "replacement_ratio": _ratio("�"),
        "control_ratio": _ratio("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"),
        "non_ascii_ratio": _ratio("[^\\x00-\\x7F]"),
        "letter_ratio": _ratio("[A-Za-z]"),
    }


def encoding_verdict(signals: dict[str, Column],
                     max_replacement: float = 0.0,
                     max_control: float = 0.001) -> Column:
    """Classify a doc from its :func:`encoding_signals`: ``bad`` when
    replacement chars are present beyond tolerance (the doc's original
    bytes are unrecoverable), ``suspect`` when raw control bytes leak
    through, else ``ok``."""
    return (F.when(signals["replacement_ratio"] > max_replacement, "bad")
            .when(signals["control_ratio"] > max_control, "suspect")
            .otherwise("ok"))
