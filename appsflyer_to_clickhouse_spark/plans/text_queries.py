"""SURVEY.md §2 Part C — text analysis + JSON extraction, oracle-checked.

The training-data side of the engine: per-document token statistics,
quality scoring, language-ID heuristic, min-k fingerprinting, and typed
JSON field extraction. Every query is a map-only Project over the scan
(zero shuffles) built from JVM built-ins — the 100 TB cost is exactly
one codegen'd pass per query — and every query has an exact DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import TOKEN_SPLIT_RE, tokens, word_shingles
from .registry import load, load_fanout, register

# DuckDB twin of functions/text.py:tokens
_TOK_SQL = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x != '')"
)

# BPE-ish tokenizer: word chunks OR single non-space-non-word chars —
# the standard pre-tokenization shape (identical in Java regex / RE2).
_BPE_RE = "[a-z0-9]+|[^a-z0-9\\s]"


# ---------------------------------------------------------------------------
# text_analysis — per-doc token statistics
# ---------------------------------------------------------------------------


@register(
    "text_analysis",
    f"""
    SELECT doc_id, lang, n_chars,
           len(t) AS n_tokens,
           len(list_distinct(t)) AS n_distinct_tokens,
           round(CASE WHEN len(t) > 0
                      THEN list_sum(list_transform(t, x -> length(x)))::DOUBLE
                           / len(t)
                      ELSE 0 END, 6) AS avg_token_len,
           round(CASE WHEN len(t) > 0
                      THEN len(list_distinct(t))::DOUBLE / len(t)
                      ELSE 0 END, 6) AS ttr
    FROM (SELECT doc_id, lang, n_chars, {_TOK_SQL} AS t FROM documents)
    """,
)
def q_text_analysis(spark, sf_dir):
    """Per-document token stats: counts, distinct counts, mean token
    length, type-token ratio. One Project — tokenization and all stats
    in a single codegen'd pass, no explode, no shuffle."""
    docs = load(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    d = docs.withColumn("t", t)
    tok_len_sum = F.aggregate(
        F.transform("t", lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    nt = F.size("t")
    return d.select(
        "doc_id",
        "lang",
        "n_chars",
        nt.alias("n_tokens"),
        F.size(F.array_distinct("t")).alias("n_distinct_tokens"),
        F.round(
            F.when(nt > 0, tok_len_sum.cast("double") / nt).otherwise(0.0), 6
        ).alias("avg_token_len"),
        F.round(
            F.when(nt > 0, F.size(F.array_distinct("t")).cast("double") / nt).otherwise(
                0.0
            ),
            6,
        ).alias("ttr"),
    )


# ---------------------------------------------------------------------------
# text_token_count — whitespace + BPE-ish regex counting
# ---------------------------------------------------------------------------


@register(
    "text_token_count",
    f"""
    SELECT doc_id,
           len({_TOK_SQL}) AS ws_tokens,
           len(regexp_extract_all(lower(text), '{_BPE_RE}')) AS bpe_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS byte_len_est
    FROM documents
    """,
)
def q_text_token_count(spark, sf_dir):
    """Token counting three ways (whitespace split, BPE-ish regex
    pre-tokenization, bytes/4 heuristic) — the standard LLM-pipeline
    size estimators."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(_BPE_RE), 0)).alias(
            "bpe_tokens"
        ),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("byte_len_est"),
    )


# ---------------------------------------------------------------------------
# text_quality_score — length/punct/stopword heuristics
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")
_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS) + "]"


def quality_flags(docs):
    """Quality features + keep flag appended as columns (shared by the
    standalone query and the composite training-data pipeline)."""
    d = docs.withColumn("t", tokens(F.col("text")))
    nt = F.size("t")
    text_len = F.length("text")
    punct = F.round(
        F.when(
            text_len > 0,
            (
                text_len - F.length(F.regexp_replace("text", "[^a-z0-9 ]", ""))
            ).cast("double")
            / text_len,
        ).otherwise(0.0),
        6,
    )
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    stops = F.size(F.filter("t", lambda x: F.array_contains(stop_arr, x)))
    stop_ratio = F.round(
        F.when(nt > 0, stops.cast("double") / nt).otherwise(0.0), 6
    )
    return d.select(
        *docs.columns,
        nt.alias("n_tokens"),
        punct.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        ((nt >= 10) & (punct <= 0.1) & (stop_ratio >= 0.01)).alias("keep"),
    )


@register(
    "text_quality_score",
    f"""
    WITH base AS (
      SELECT doc_id, text, {_TOK_SQL} AS t FROM documents
    ), feat AS (
      SELECT doc_id,
             len(t) AS n_tokens,
             round(CASE WHEN length(text) > 0
                   THEN (length(text) - length(regexp_replace(text,
                        '[^a-z0-9 ]', '', 'g')))::DOUBLE / length(text)
                   ELSE 0 END, 6) AS punct_ratio,
             round(CASE WHEN len(t) > 0
                   THEN len(list_filter(t, x -> list_contains({_STOP_SQL}, x)))::DOUBLE
                        / len(t)
                   ELSE 0 END, 6) AS stopword_ratio
      FROM base
    )
    SELECT doc_id, n_tokens, punct_ratio, stopword_ratio,
           (n_tokens >= 10 AND punct_ratio <= 0.1
            AND stopword_ratio >= 0.01) AS keep
    FROM feat
    """,
)
def q_text_quality_score(spark, sf_dir):
    """Document quality gate: token count, punctuation ratio, stopword
    ratio, and the keep/drop decision — the classic pre-training
    filter. Map-only."""
    docs = load(spark, sf_dir, "documents")
    return quality_flags(docs).select(
        "doc_id", "n_tokens", "punct_ratio", "stopword_ratio", "keep"
    )


# ---------------------------------------------------------------------------
# text_lang_id — marker-stopword n-gram heuristic
# ---------------------------------------------------------------------------

_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "es"),
}


def _lang_sql() -> str:
    scores = []
    for lang, words in _LANG_MARKERS.items():
        lst = "[" + ", ".join(f"'{w}'" for w in words) + "]"
        scores.append(
            f"len(list_filter(t, x -> list_contains({lst}, x))) AS s_{lang}"
        )
    score_sel = ", ".join(scores)
    best = "greatest(s_en, s_de, s_fr, s_es)"
    pred = f"""CASE WHEN {best} = 0 THEN 'unknown'
         WHEN s_en = {best} THEN 'en'
         WHEN s_de = {best} THEN 'de'
         WHEN s_fr = {best} THEN 'fr'
         ELSE 'es' END"""
    return f"""
    WITH base AS (SELECT doc_id, {_TOK_SQL} AS t FROM documents),
    sc AS (SELECT doc_id, {score_sel} FROM base)
    SELECT doc_id, s_en, s_de, s_fr, s_es, {pred} AS predicted_lang
    FROM sc
    """


@register("text_lang_id", _lang_sql())
def q_text_lang_id(spark, sf_dir):
    """Language-ID by marker-stopword voting (deterministic argmax with
    fixed priority en>de>fr>es on ties; zero markers -> 'unknown').
    Map-only expression — the heuristic the quality pipeline runs
    before expensive model-based lang-ID."""
    docs = load(spark, sf_dir, "documents")
    d = docs.withColumn("t", tokens(F.col("text")))
    def marker_filter(words: tuple[str, ...]):
        arr = F.array(*[F.lit(w) for w in words])
        # factory keeps the lambda unary (a 2-param lambda would be
        # read by PySpark as (element, index))
        return lambda x: F.array_contains(arr, x)

    score_cols = {
        lang: F.size(F.filter("t", marker_filter(words)))
        for lang, words in _LANG_MARKERS.items()
    }
    d = d.select(
        "doc_id", *[c.alias(f"s_{lang}") for lang, c in score_cols.items()]
    )
    best = F.greatest("s_en", "s_de", "s_fr", "s_es")
    pred = (
        F.when(best == 0, "unknown")
        .when(F.col("s_en") == best, "en")
        .when(F.col("s_de") == best, "de")
        .when(F.col("s_fr") == best, "fr")
        .otherwise("es")
    )
    return d.select(
        "doc_id", "s_en", "s_de", "s_fr", "s_es", pred.alias("predicted_lang")
    )


# ---------------------------------------------------------------------------
# text_fingerprint — min-k document fingerprint
# ---------------------------------------------------------------------------


@register(
    "text_fingerprint",
    f"""
    WITH tk AS (
      SELECT doc_id, {_TOK_SQL} AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 3
                  THEN list_distinct(list_transform(range(len(t) - 2),
                       i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))
                  ELSE []::VARCHAR[] END AS ss
      FROM tk
    )
    SELECT doc_id,
           array_to_string(list_sort(list_transform(ss, s -> md5(s)))[1:4],
                           '') AS fingerprint
    FROM sh
    """,
)
def q_text_fingerprint(spark, sf_dir):
    """Document fingerprint: concatenation of the 4 smallest shingle
    hashes (min-k sketch — winnowing's order-free cousin). Two docs
    share a fingerprint iff their smallest shingle hashes agree, a
    cheap near-dup prefilter. Map-only."""
    docs = load(spark, sf_dir, "documents")
    sh = word_shingles(tokens(F.col("text")), 3)
    fp = F.concat_ws(
        "", F.slice(F.array_sort(F.transform(sh, lambda s: F.md5(s))), 1, 4)
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


# ---------------------------------------------------------------------------
# text_repetition — Gopher-style repetition quality signals
# ---------------------------------------------------------------------------

# raw (NON-distinct) word n-grams as a DuckDB list expression
def _raw_grams_sql(n: int) -> str:
    parts = " || ' ' || ".join(f"t[i+{j}]" for j in range(1, n + 1))
    return (
        f"CASE WHEN len(t) >= {n} THEN "
        f"list_transform(range(len(t) - {n - 1}), i -> {parts}) "
        "ELSE []::VARCHAR[] END"
    )


def _raw_grams(toks, n: int):
    """Raw word n-grams (duplicates KEPT — repetition is the signal).
    Exactly functions/text.py:word_shingles_ordered — imported, not
    re-implemented, so the ordered-gram kernel has ONE definition."""
    from ..functions.text import word_shingles_ordered

    return word_shingles_ordered(toks, n)


@register(
    "text_repetition",
    f"""
    WITH tk AS (SELECT doc_id, {_TOK_SQL} AS t FROM documents),
    gr AS (
      SELECT doc_id,
             {_raw_grams_sql(2)} AS bg,
             {_raw_grams_sql(3)} AS tg
      FROM tk
    )
    SELECT doc_id,
           CAST(len(bg) AS INTEGER) AS n_bigrams,
           round(CASE WHEN len(bg) > 0
                 THEN 1.0 - len(list_distinct(bg))::DOUBLE / len(bg)
                 ELSE 0 END, 6) AS dup_bigram_frac,
           round(CASE WHEN len(tg) > 0
                 THEN 1.0 - len(list_distinct(tg))::DOUBLE / len(tg)
                 ELSE 0 END, 6) AS dup_trigram_frac,
           round(CASE WHEN len(bg) > 0
                 THEN list_max(list_transform(list_distinct(bg),
                      d -> len(list_filter(bg, x -> x = d))))::DOUBLE / len(bg)
                 ELSE 0 END, 6) AS top_bigram_frac
    FROM gr
    """,
)
def q_text_repetition(spark, sf_dir):
    """Gopher-style repetition signals: duplicate-bigram fraction,
    duplicate-trigram fraction, and the share of the single most
    frequent bigram — the classic filters for boilerplate/spam docs.
    Map-only over the scan. The top-bigram count folds ONCE over the
    sorted gram array (longest equal-adjacent run): O(n log n) per doc
    vs the naive per-distinct-gram recount's O(distinct x n) — HOF
    lambdas are interpreted, so the constant matters (measured ~3x on
    this query). The DuckDB twin keeps the per-distinct form; both are
    exact integer counts, so the results cannot diverge. Cost is
    per-doc, never cross-doc — embarrassingly parallel at 100 TB."""
    docs = load(spark, sf_dir, "documents")
    d = docs.withColumn("t", tokens(F.col("text")))
    bg, tg = _raw_grams(F.col("t"), 2), _raw_grams(F.col("t"), 3)
    d = d.select("doc_id", bg.alias("bg"), tg.alias("tg"))
    # stage the sorted copy in its own Project so the fold's input is
    # computed once, not re-derived per element
    d = d.withColumn("bgs", F.array_sort("bg"))
    nbg, ntg = F.size("bg"), F.size("tg")

    def dup_frac(arr, n):
        return F.round(
            F.when(
                n > 0, 1.0 - F.size(F.array_distinct(arr)).cast("double") / n
            ).otherwise(0.0),
            6,
        )

    top_cnt = F.aggregate(
        "bgs",
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    return d.select(
        "doc_id",
        nbg.cast("int").alias("n_bigrams"),
        dup_frac(F.col("bg"), nbg).alias("dup_bigram_frac"),
        dup_frac(F.col("tg"), ntg).alias("dup_trigram_frac"),
        F.round(
            F.when(nbg > 0, top_cnt.cast("double") / nbg).otherwise(0.0), 6
        ).alias("top_bigram_frac"),
    )


# ---------------------------------------------------------------------------
# json_props_extract — typed extraction with from_json
# ---------------------------------------------------------------------------

_PROPS_SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType()),
        T.StructField("tag", T.StringType()),
        T.StructField("nested", T.StructType([T.StructField("v", T.DoubleType())])),
    ]
)


@register(
    "json_props_extract",
    """
    WITH enriched AS (
      SELECT event_id,
             '{"k": ' || CAST(props::JSON->>'k' AS VARCHAR)
             || ', "tag": "t' || CAST(event_id % 7 AS VARCHAR)
             || '", "nested": {"v": ' || CAST(event_id % 13 AS VARCHAR)
             || '.5}}' AS j
      FROM events
    )
    SELECT event_id,
           CAST(j::JSON->>'k' AS INTEGER) AS k,
           j::JSON->>'tag' AS tag,
           CAST(j::JSON->'nested'->>'v' AS DOUBLE) AS nested_v,
           CAST(json_extract_string(j, '$.k') AS INTEGER) AS k_path
    FROM enriched
    """,
)
def q_json_props_extract(spark, sf_dir):
    """Typed field extraction from a JSON string column: ``from_json``
    with an explicit schema (never schema inference — nondeterministic
    at scale) plus a ``get_json_object`` path extract. The JSON is
    enriched from events.props deterministically in both engines so the
    test exercises nested objects, not just flat ints. Parsing is the
    per-row cost here, so the single-split testdata scan fans out
    first (load_fanout; a no-op on real multi-split inputs)."""
    from .registry import load_fanout

    ev = load_fanout(spark, sf_dir, "events")
    j = F.concat(
        F.lit('{"k": '),
        F.get_json_object("props", "$.k"),
        F.lit(', "tag": "t'),
        (F.col("event_id") % 7).cast("string"),
        F.lit('", "nested": {"v": '),
        (F.col("event_id") % 13).cast("string"),
        F.lit(".5}}"),
    )
    d = ev.select("event_id", j.alias("j"))
    parsed = F.from_json("j", _PROPS_SCHEMA)
    return d.select(
        "event_id",
        parsed["k"].alias("k"),
        parsed["tag"].alias("tag"),
        parsed["nested"]["v"].alias("nested_v"),
        F.get_json_object("j", "$.k").cast("int").alias("k_path"),
    )


# ---------------------------------------------------------------------------
# text_vocab_encode — corpus vocab build + token-id encoding
# ---------------------------------------------------------------------------

_VOCAB_SIZE = 256
_ENCODE_FIRST = 16  # encode the first N tokens of each doc


@register(
    "text_vocab_encode",
    f"""
    WITH tk AS (SELECT doc_id, {_TOK_SQL} AS t FROM documents),
    cnt AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c
      FROM tk, unnest(t) AS u(tok)
      GROUP BY tok
    ),
    vocab AS (
      SELECT tok, row_number() OVER (ORDER BY c DESC, tok) - 1 AS tid
      FROM cnt
      ORDER BY c DESC, tok
      LIMIT {_VOCAB_SIZE}
    ),
    pos AS (
      SELECT doc_id, h[u.i + 1] AS tok, u.i + 1 AS p
      FROM (SELECT doc_id, t[1:{_ENCODE_FIRST}] AS h FROM tk),
           (SELECT unnest(range(len(h))) AS i) u
    )
    SELECT p.doc_id,
           string_agg(CAST(coalesce(v.tid, -1) AS VARCHAR), ','
                      ORDER BY p.p) AS token_ids
    FROM pos p
    LEFT JOIN vocab v ON v.tok = p.tok
    GROUP BY p.doc_id
    """,
)
def q_text_vocab_encode(spark, sf_dir):
    """Vocabulary build + encode — the tokens-to-ids bridge every
    training pipeline runs: (1) count tokens corpus-wide, (2) rank the
    top-256 into (token, id) with a deterministic (count desc, token)
    order, (3) re-encode each document's first 16 tokens as ids
    (-1 = OOV), emitted as a CSV string.

    Scale shape: the count is explode -> partial/final agg (shuffle
    bounded by distinct tokens, not corpus tokens); the rank is a
    single-partition window over the VOCAB TABLE ONLY — bounded by
    vocab size (a design constant), never by the corpus; the encode
    side broadcast-joins the tiny vocab and re-assembles per-doc order
    with sort_array over (pos, id) structs — one groupBy shuffle keyed
    by doc_id."""
    from pyspark.sql import Window as W2

    docs = load(spark, sf_dir, "documents")
    tk = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    cnt = (
        tk.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    w = W2.orderBy(F.desc("c"), F.asc("tok"))
    vocab = (
        cnt.orderBy(F.desc("c"), F.asc("tok"))
        .limit(_VOCAB_SIZE)
        .select("tok", (F.row_number().over(w) - 1).alias("tid"))
    )
    pos = tk.select(
        "doc_id",
        F.posexplode(F.slice("t", 1, _ENCODE_FIRST)).alias("p", "tok"),
    )
    joined = pos.join(F.broadcast(vocab), "tok", "left").select(
        "doc_id",
        F.struct(
            F.col("p"), F.coalesce("tid", F.lit(-1)).alias("tid")
        ).alias("pt"),
    )
    return (
        joined.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pt")).alias("pts"))
        .select(
            "doc_id",
            F.concat_ws(
                ",",
                F.transform("pts", lambda s: s.tid.cast("string")),
            ).alias("token_ids"),
        )
    )


# ---------------------------------------------------------------------------
# text_tfidf_topk — corpus-wide TF-IDF scoring
# ---------------------------------------------------------------------------

_TFIDF_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                            x -> x != '')) AS tok
  FROM documents
), tf AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, tok
), df AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok
), n AS (
  SELECT count(*) AS n_docs FROM documents
)
SELECT tf.doc_id, tf.tok, tf.tf, df.df,
       round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
FROM tf JOIN df USING (tok) CROSS JOIN n
ORDER BY tfidf DESC, doc_id ASC, tok ASC
LIMIT 20
"""


@register("text_tfidf_topk", _TFIDF_ORACLE)
def q_text_tfidf_topk(spark, sf_dir):
    """Corpus-wide TF-IDF (smoothed: tf * ln((N+1)/(df+1))), global
    top-20 most distinctive (doc, term) pairs. Shuffle budget: one
    exchange keyed (doc_id, token) for TF, one keyed token for DF —
    both bounded by distinct pairs / vocabulary, never raw token
    occurrences (partial aggregation collapses those map-side). DF is
    a window count over the token partitioning of TF itself — one
    evaluation, one exchange (a groupBy+broadcast-back would re-run
    the explode+TF subplan on the broadcast side); the corpus size N
    is a 1-row broadcast cross join. Final top-k plans as
    TakeOrderedAndProject under a total order (score, doc, term) so
    rank-20 boundary ties are engine-deterministic."""
    from ..functions.text import tokens
    from .registry import load_fanout

    from pyspark.sql import Window as W

    docs = load_fanout(spark, sf_dir, "documents")
    tk = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    tf = tk.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    # DF = rows per token IN tf (tf rows are distinct (doc, token)),
    # so a window count over the token partitioning reads tf ONCE —
    # the groupBy+broadcast-back form re-evaluates the whole
    # explode+TF subplan on the broadcast side
    df_w = F.count("*").over(W.partitionBy("tok"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.withColumn("df", df_w)
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                6,
            ).alias("tfidf"),
        )
    )
    return scored.orderBy(
        F.desc("tfidf"), F.asc("doc_id"), F.asc("tok")
    ).limit(20)


# ---------------------------------------------------------------------------
# text_unigram_logprob — corpus-LM document scoring (perplexity filter)
# ---------------------------------------------------------------------------

# Per-token ln p is cast to DECIMAL(20,12) BEFORE the per-doc sum:
# decimal addition is order-independent (float sums are not), and the
# 12-digit rounding absorbs any last-ulp ln() difference between the
# engines' libm implementations.
_LP_DEC = "CAST(ln((c + 1.0) / (tot + v)) AS DECIMAL(20,12))"

_UNIGRAM_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                            x -> x != '')) AS tok
  FROM documents
), cnt AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY tok
), corpus AS (
  SELECT CAST(sum(c) AS DOUBLE) AS tot, CAST(count(*) AS DOUBLE) AS v
  FROM cnt
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(round(CAST(sum({_LP_DEC}) AS DOUBLE) / count(*), 6) AS DOUBLE)
         AS avg_logprob
FROM tok t
JOIN cnt ON cnt.tok = t.tok
CROSS JOIN corpus
GROUP BY t.doc_id
"""


@register("text_unigram_logprob", _UNIGRAM_ORACLE)
def q_text_unigram_logprob(spark, sf_dir):
    """Unigram-LM document scoring — the statistical form of the
    quality filter (a document whose tokens are improbable under the
    corpus distribution is noise; avg_logprob is -perplexity in log
    space). Laplace-smoothed p(tok) = (c+1)/(total+V) comes from the
    vocabulary-bounded count table, which BROADCASTS back onto the
    token stream (vocabularies are MBs at any corpus size); the scalar
    (total, V) row is a second broadcast. One vocabulary shuffle + one
    per-doc aggregate — the token stream itself never shuffles twice.
    Per-token log-probs sum in DECIMAL so the per-doc reduction is
    order-independent cross-engine."""
    from ..functions.text import tokens
    from .registry import load_fanout

    docs = load_fanout(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    cnt = tok.groupBy("tok").agg(F.count("*").alias("c"))
    corpus = cnt.agg(
        F.sum("c").cast("double").alias("tot"),
        F.count("*").cast("double").alias("v"),
    )
    scored = (
        tok.join(F.broadcast(cnt), "tok")
        .crossJoin(F.broadcast(corpus))
        .select("doc_id", F.expr(_LP_DEC).alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.sum("lp").cast("double") / F.count("*"), 6)
        .cast("double")
        .alias("avg_logprob"),
    )


# ---------------------------------------------------------------------------
# unnest_outer_preserve — outer explode (empty arrays keep their row)
# ---------------------------------------------------------------------------

_OUTER_ORACLE = """
WITH src AS (
  SELECT doc_id,
         CASE WHEN doc_id % 97 = 0 THEN ''
              ELSE text END AS text2
  FROM documents
), tk AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text2), '[^a-z0-9]+'),
                     x -> x != '') AS t
  FROM src
), exploded AS (
  SELECT doc_id, unnest(t) AS tok FROM tk WHERE len(t) > 0
  UNION ALL
  SELECT doc_id, NULL AS tok FROM tk WHERE len(t) = 0
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(tok) AS BIGINT) AS n_tokens,
       CAST(count(*) FILTER (WHERE tok IS NULL) AS BIGINT) AS n_null_marker
FROM exploded
GROUP BY doc_id
"""


@register("unnest_outer_preserve", _OUTER_ORACLE)
def q_unnest_outer_preserve(spark, sf_dir):
    """OUTER explode semantics: a document whose token array is empty
    must SURVIVE the lateral unnest as one NULL-token row — plain
    explode silently drops it, and any per-doc aggregate built
    downstream then undercounts the corpus (the classic silent-loss
    bug in tokenize-then-regroup pipelines). Empty arrays are
    synthesized (doc_id % 97) so the preserved path is exercised on
    every run; the oracle models the outer join as the union of the
    non-empty explode and the empty-marker rows."""
    from ..functions.text import tokens

    docs = load(spark, sf_dir, "documents")
    text2 = F.when(F.col("doc_id") % 97 == 0, F.lit("")).otherwise(
        F.col("text")
    )
    tk = docs.select("doc_id", tokens(text2).alias("t"))
    exploded = tk.select("doc_id", F.explode_outer("t").alias("tok"))
    return exploded.groupBy("doc_id").agg(
        F.count("*").alias("n_rows"),
        F.count("tok").alias("n_tokens"),
        F.count(F.when(F.col("tok").isNull(), 1)).alias("n_null_marker"),
    )


# ---------------------------------------------------------------------------
# text_line_dedup — C4-style repeated-line removal across the corpus
# ---------------------------------------------------------------------------

_LINE_WORDS = 10  # fixed word-block "lines" (the corpus has no newlines)
_LINE_DF = 2  # a line appearing in >= 2 distinct docs is boilerplate


@register(
    "text_line_dedup",
    f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), chunks AS (
      SELECT doc_id, CAST(g.i AS BIGINT) AS pos,
             array_to_string(
               list_slice(ws, g.i * {_LINE_WORDS} + 1,
                          g.i * {_LINE_WORDS} + {_LINE_WORDS}), ' ') AS line
      FROM w, UNNEST(range(CAST(ceil(len(ws) / {_LINE_WORDS}.0) AS BIGINT)))
               AS g(i)
    ), boiler AS (
      SELECT line FROM chunks
      GROUP BY line HAVING count(DISTINCT doc_id) >= {_LINE_DF}
    ), kept AS (
      SELECT c.doc_id, c.pos, c.line FROM chunks c
      WHERE c.line NOT IN (SELECT line FROM boiler)
    )
    SELECT k.doc_id,
           CAST(ceil(len(w.ws) / {_LINE_WORDS}.0) AS BIGINT) AS n_lines,
           CAST(count(*) AS BIGINT) AS kept_lines,
           md5(string_agg(k.line, ' ' ORDER BY k.pos)) AS cleaned_md5
    FROM kept k JOIN w ON w.doc_id = k.doc_id
    GROUP BY k.doc_id, w.ws
    """,
)
def q_text_line_dedup(spark, sf_dir):
    """C4-style boilerplate removal: the corpus is cut into
    {_LINE_WORDS}-word lines, any line occurring in >= {_LINE_DF}
    distinct documents is removed everywhere, and each document is
    reassembled from its surviving lines in order (cleaned text leaves
    the plan as an md5). Scale shape: the line-frequency shuffle is
    bounded by DISTINCT lines (not corpus size); the boilerplate set —
    small by definition — comes back as a broadcast anti-join so the
    corpus-sized chunk stream never shuffles for the filter; the only
    doc-sized exchange is the ordered reassembly. Docs whose every
    line is boilerplate drop out (both engines). The word array is
    staged in its own Project before the chunk transform so the
    interpreted lambda slices a column, never re-splits the text."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    n_lines = F.ceil(F.size("ws") / F.lit(_LINE_WORDS)).cast("bigint")
    chunked = docs.select(
        "doc_id",
        n_lines.alias("n_lines"),
        F.when(
            F.size("ws") > 0,
            F.transform(
                F.sequence(F.lit(0), (n_lines - 1).cast("int")),
                lambda i: F.array_join(
                    F.slice("ws", i * _LINE_WORDS + 1, _LINE_WORDS), " "
                ),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("lines"),
    )
    chunks = chunked.select(
        "doc_id",
        "n_lines",
        F.posexplode("lines").alias("pos", "line"),
    )
    boiler = (
        chunks.groupBy("line")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= _LINE_DF)
        .select("line")
    )
    kept = chunks.join(F.broadcast(boiler), "line", "left_anti")
    return kept.groupBy("doc_id", "n_lines").agg(
        F.count("*").alias("kept_lines"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s.line,
                ),
                " ",
            )
        ).alias("cleaned_md5"),
    ).select("doc_id", "n_lines", "kept_lines", "cleaned_md5")


# ---------------------------------------------------------------------------
# text_bm25_topk — sparse retrieval scoring (the BM25 side of hybrid search)
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "join", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75

# per-term scores are cast to DECIMAL(20,10) before the (fixed-width)
# sum — same ULP-absorbing pattern as text_unigram_logprob, so the two
# engines' ln() implementations cannot produce a hash mismatch
_BM25_ORACLE_TERMS = " + ".join(
    f"""CAST((ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5))
         * (CAST(len(list_filter(t, x -> x = '{w}')) AS DOUBLE) * 2.2))
        / (CAST(len(list_filter(t, x -> x = '{w}')) AS DOUBLE)
           + 1.2 * (0.25 + 0.75 * (CAST(len(t) AS DOUBLE) / avgdl)))
        AS DECIMAL(20,10))"""
    for i, w in enumerate(_BM25_TERMS)
)

_BM25_DFS = ", ".join(
    f"""CAST(sum(CASE WHEN list_contains(t, '{w}') THEN 1 ELSE 0 END)
        AS DOUBLE) AS df{i}"""
    for i, w in enumerate(_BM25_TERMS)
)


@register(
    "text_bm25_topk",
    f"""
    WITH tk AS (
      SELECT doc_id, {_TOK_SQL.replace("text", "text")} AS t FROM documents
    ), st AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(len(t)) AS DOUBLE) / count(*) AS avgdl,
             {_BM25_DFS}
      FROM tk
    )
    SELECT doc_id,
           round(CAST({_BM25_ORACLE_TERMS} AS DOUBLE), 6) AS bm25
    FROM tk CROSS JOIN st
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
)
def q_text_bm25_topk(spark, sf_dir):
    """BM25 top-20 for a fixed 3-term query (k1={_BM25_K1},
    b={_BM25_B}) — the sparse-retrieval scorer that pairs with the
    dense ANN family for hybrid search. One tiny corpus-stats
    aggregate (N, avgdl, per-term document frequencies) broadcasts
    onto a map-side score pass: scoring at 100 TB is scan-shaped, and
    the top-k is TakeOrderedAndProject, never a global sort. Per-term
    scores are cast to decimal before the fixed-order sum (the
    unigram-logprob ULP pattern); ties at the rounded score break on
    doc_id, so the cut is deterministic cross-engine. At serving
    scale the same formula runs over an inverted index instead of a
    scan; this is the index-build-time scorer."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("t")
    )
    stats = docs.agg(
        F.count("*").cast("double").alias("n"),
        (F.sum(F.size("t")).cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.sum(F.array_contains("t", w).cast("int"))
            .cast("double")
            .alias(f"df{i}")
            for i, w in enumerate(_BM25_TERMS)
        ],
    )
    d = docs.crossJoin(F.broadcast(stats))
    dl = F.size("t").cast("double")
    score = None
    for i, w in enumerate(_BM25_TERMS):
        tf = F.size(F.filter("t", lambda x: x == F.lit(w))).cast("double")
        idf = F.log(
            1.0 + (F.col("n") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5)
        )
        term = (
            (idf * (tf * F.lit(2.2)))
            / (
                tf
                + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * (dl / F.col("avgdl")))
            )
        ).cast("decimal(20,10)")
        score = term if score is None else score + term
    out = d.select(
        "doc_id", F.round(score.cast("double"), 6).alias("bm25")
    )
    return out.orderBy(F.desc("bm25"), "doc_id").limit(20)


# ---------------------------------------------------------------------------
# text_inverted_index — posting-list build (the retrieval index itself)
# ---------------------------------------------------------------------------


@register(
    "text_inverted_index",
    f"""
    WITH tk AS (
      SELECT doc_id, {_TOK_SQL} AS t FROM documents
    ), tok AS (
      SELECT doc_id, unnest(t) AS tok FROM tk
    ), tf AS (
      SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY 1, 2
    )
    SELECT tok,
           CAST(count(*) AS BIGINT) AS df,
           CAST(sum(tf) AS BIGINT) AS total_tf,
           md5(string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id))
             AS postings_md5
    FROM tf GROUP BY tok
    """,
)
def q_text_inverted_index(spark, sf_dir):
    """Inverted-index build: token -> (document frequency, total term
    frequency, doc_id-ordered posting list of (doc_id, tf), pinned as
    an md5). Two shuffles, both key-bounded: (token, doc) partial
    counts combine map-side, then postings assemble per token. The
    posting list itself leaves the plan as a digest so the result
    stays vocabulary-sized. At 100 TB the high-df tokens (stopwords)
    are the skew: production shards each posting list by (token,
    doc-range) so no single task assembles a billion-entry list —
    the same salt-the-hot-key answer as the LSH bucket skew note."""
    docs = load_fanout(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("t")
    )
    tf = (
        docs.select("doc_id", F.explode("t").alias("tok"))
        .groupBy("tok", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    return tf.groupBy("tok").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("total_tf"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "tf"))),
                    lambda s: F.concat_ws(":", s.doc_id, s.tf),
                ),
                ",",
            )
        ).alias("postings_md5"),
    )


# ---------------------------------------------------------------------------
# text_bpe_merge_count — greedy merge-rule tokenization (BPE encode shape)
# ---------------------------------------------------------------------------

# Ordered merge rules (the learned half of a BPE tokenizer, here a
# design constant like the PQ codebooks): applied highest-priority
# first, each as ONE non-overlapping left-to-right replace() pass —
# the contract Spark and DuckDB share, so the encoding is identical
# cross-engine. (A faithful BPE encoder loops each rule to fixation;
# the single-pass form can skip an occurrence whose leading separator
# was consumed by the previous match — deterministic, documented, and
# the token-count statistics it feeds are insensitive to it.)
_BPE_MERGES = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"), ("o", "r"),
    ("e", "s"), ("s", "t"), ("an", "d"), ("in", "g"), ("t", "o"),
    ("o", "u"), ("e", "d"), ("i", "s"), ("a", "l"), ("a", "r"),
]


def _bpe_chain(dialect: str) -> str:
    """Expression text encoding one word: char-split into '|'-separated
    pieces, then the merge rules in priority order. Identical text in
    both dialects except the regexp_replace global-flag syntax."""
    if dialect == "spark":
        s = "'|' || regexp_replace(w, '(.)', '$1|')"
    else:
        s = "'|' || regexp_replace(w, '(.)', '\\1|', 'g')"
    for a, b in _BPE_MERGES:
        s = f"replace({s}, '|{a}|{b}|', '|{a}{b}|')"
    return s


@register(
    "text_bpe_merge_count",
    f"""
    WITH tk AS (
      SELECT doc_id, {_TOK_SQL} AS t FROM documents
    ),
    w AS (
      SELECT doc_id, unnest(t) AS w FROM tk
    ),
    c AS (
      SELECT doc_id,
             CAST(len(string_split({_bpe_chain("duckdb")}, '|')) - 2
                  AS BIGINT) AS np
      FROM w
    ),
    agg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(np) AS BIGINT) AS n_bpe_tokens
      FROM c GROUP BY doc_id
    )
    SELECT tk.doc_id,
           coalesce(agg.n_words, 0) AS n_words,
           coalesce(agg.n_bpe_tokens, 0) AS n_bpe_tokens,
           round(CAST(agg.n_bpe_tokens AS DOUBLE) / agg.n_words, 6)
             AS bpe_per_word
    FROM tk LEFT JOIN agg ON tk.doc_id = agg.doc_id
    """,
)
def q_text_bpe_merge_count(spark, sf_dir):
    """Subword (BPE-style) encoding cost per document: each word is
    char-split and run through the ordered merge-rule table, and the
    doc's subword token count is what a trainer's budget accounting
    uses (tokens-per-word also flags unmergeable/noisy text). The
    merge chain is a stack of plain replace() calls — fully inside
    whole-stage codegen, no HOF interpretation, no Python — over
    exploded words; the one shuffle re-groups per-word counts by
    doc_id (key-bounded). The merge table is a literal shared with the
    oracle; see _BPE_MERGES for the single-pass-per-rule contract."""
    docs = load_fanout(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("t")
    )
    words = docs.select("doc_id", F.explode("t").alias("w"))
    counted = words.selectExpr(
        "doc_id",
        f"cast(size(split({_bpe_chain('spark')}, '\\\\|')) - 2 as bigint) AS np",
    )
    agg = counted.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.sum("np").alias("n_bpe_tokens"),
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.coalesce("n_bpe_tokens", F.lit(0)).alias("n_bpe_tokens"),
            F.round(
                F.try_divide(
                    F.col("n_bpe_tokens").cast("double"), F.col("n_words")
                ),
                6,
            ).alias("bpe_per_word"),
        )
    )


# ---------------------------------------------------------------------------
# text_gopher_rules — named quality-rule flags (Rae et al. 2021 style)
# ---------------------------------------------------------------------------

_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with", "a")
_G_MIN_WORDS, _G_MAX_WORDS = 20, 100_000
_G_MIN_MWL, _G_MAX_MWL = 2.0, 10.0
_G_MAX_WL = 15
_G_MIN_ALPHA = 0.8
_G_MIN_STOPS = 2


def _gopher_stop_hits_sql(arr: str) -> str:
    return " + ".join(
        f"CASE WHEN list_contains({arr}, '{w}') THEN 1 ELSE 0 END"
        for w in _GOPHER_STOPS
    )


@register(
    "text_gopher_rules",
    f"""
    WITH tk AS (
      SELECT doc_id, {_TOK_SQL} AS t FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(t) AS n_words,
             round(CASE WHEN len(t) > 0 THEN
               list_sum(list_transform(t, x -> length(x)))::DOUBLE / len(t)
               END, 6) AS mean_word_len,
             coalesce(list_max(list_transform(t, x -> length(x))), 0)
               AS max_word_len,
             round(CASE WHEN len(t) > 0 THEN
               len(list_filter(t, x -> regexp_matches(x, '[a-z]')))::DOUBLE
               / len(t) END, 6) AS alpha_frac,
             {_gopher_stop_hits_sql('t')} AS stop_hits
      FROM tk
    )
    SELECT doc_id, n_words, mean_word_len, max_word_len, alpha_frac,
           CAST(stop_hits AS BIGINT) AS stop_hits,
           (n_words BETWEEN {_G_MIN_WORDS} AND {_G_MAX_WORDS}) AS ok_n_words,
           coalesce(mean_word_len BETWEEN {_G_MIN_MWL} AND {_G_MAX_MWL},
                    FALSE) AS ok_mean_wl,
           (max_word_len <= {_G_MAX_WL}) AS ok_max_wl,
           coalesce(alpha_frac >= {_G_MIN_ALPHA}, FALSE) AS ok_alpha,
           (stop_hits >= {_G_MIN_STOPS}) AS ok_stops,
           ((n_words BETWEEN {_G_MIN_WORDS} AND {_G_MAX_WORDS})
            AND coalesce(mean_word_len BETWEEN {_G_MIN_MWL} AND {_G_MAX_MWL},
                         FALSE)
            AND max_word_len <= {_G_MAX_WL}
            AND coalesce(alpha_frac >= {_G_MIN_ALPHA}, FALSE)
            AND stop_hits >= {_G_MIN_STOPS}) AS keep
    FROM m
    """,
)
def q_text_gopher_rules(spark, sf_dir):
    """Gopher-style NAMED rule flags (Rae et al. 2021 §A1.1, the rules
    expressible on this corpus): word-count bounds, mean/max word
    length, alphabetic-word fraction, and stopword presence — each
    surfaced as its own boolean so a curation run can report WHICH
    rule rejected a document, not just that one did (the audit trail
    text_quality_score's single keep bit can't give). One map-only
    Project over the scan; degenerate docs (zero words) fail closed
    via coalesce(FALSE) rather than dropping to NULL."""
    docs = load_fanout(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    lens = F.transform(t, lambda x: F.length(x))
    n = F.size(t)
    mean_wl = F.round(
        F.try_divide(
            F.aggregate(lens, F.lit(0), lambda a, x: a + x).cast("double"), n
        ),
        6,
    )
    max_wl = F.coalesce(F.array_max(lens), F.lit(0))
    alpha = F.round(
        F.try_divide(
            F.size(F.filter(t, lambda x: x.rlike("[a-z]"))).cast("double"), n
        ),
        6,
    )
    stops = sum(
        F.when(F.array_contains(t, w), 1).otherwise(0) for w in _GOPHER_STOPS
    )
    m = docs.select(
        "doc_id",
        n.cast("bigint").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        max_wl.cast("bigint").alias("max_word_len"),
        alpha.alias("alpha_frac"),
        stops.cast("bigint").alias("stop_hits"),
    )
    ok_n = F.col("n_words").between(_G_MIN_WORDS, _G_MAX_WORDS)
    ok_mwl = F.coalesce(
        F.col("mean_word_len").between(_G_MIN_MWL, _G_MAX_MWL), F.lit(False)
    )
    ok_maxwl = F.col("max_word_len") <= _G_MAX_WL
    ok_alpha = F.coalesce(F.col("alpha_frac") >= _G_MIN_ALPHA, F.lit(False))
    ok_stops = F.col("stop_hits") >= _G_MIN_STOPS
    return m.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "max_word_len",
        "alpha_frac",
        "stop_hits",
        ok_n.alias("ok_n_words"),
        ok_mwl.alias("ok_mean_wl"),
        ok_maxwl.alias("ok_max_wl"),
        ok_alpha.alias("ok_alpha"),
        ok_stops.alias("ok_stops"),
        (ok_n & ok_mwl & ok_maxwl & ok_alpha & ok_stops).alias("keep"),
    )


# ---------------------------------------------------------------------------
# text_bigram_logprob — conditional-LM document scoring
# ---------------------------------------------------------------------------

_BLP_DEC = "CAST(ln((cb + 1.0) / (ch + v)) AS DECIMAL(20,12))"

_BIGRAM_ORACLE = f"""
WITH tk AS (
  SELECT doc_id, {_TOK_SQL} AS t FROM documents
), bg AS (
  SELECT doc_id, t[i+1] AS head, t[i+1] || ' ' || t[i+2] AS b
  FROM tk, (SELECT unnest(range(len(t) - 1)) AS i)
  WHERE len(t) >= 2
), bcnt AS (
  SELECT b, CAST(count(*) AS BIGINT) AS cb FROM bg GROUP BY b
), hcnt AS (
  SELECT head, CAST(count(*) AS BIGINT) AS ch FROM bg GROUP BY head
), vocab AS (
  SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v FROM (
    SELECT unnest(t) AS tok FROM tk
  )
)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(round(CAST(sum({_BLP_DEC}) AS DOUBLE) / count(*), 6) AS DOUBLE)
         AS avg_logprob
FROM bg g
JOIN bcnt ON bcnt.b = g.b
JOIN hcnt ON hcnt.head = g.head
CROSS JOIN vocab
GROUP BY g.doc_id
"""


@register("text_bigram_logprob", _BIGRAM_ORACLE)
def q_text_bigram_logprob(spark, sf_dir):
    """Bigram-LM document scoring — the CONDITIONAL upgrade of
    text_unigram_logprob: P(w2|w1) = (c(w1 w2)+1)/(c_head(w1)+V)
    catches documents whose words are individually common but
    sequenced like noise (shuffled/templated spam scores near the
    unigram model yet far under the bigram one). Head counts derive
    from the same bigram table (no second token pass); count tables
    join back on their own keys — shuffles bounded by DISTINCT bigrams
    (at 100 TB these joins run bucketed on the gram key rather than
    broadcast). Per-bigram log-probs sum in DECIMAL so the per-doc
    reduction is order-independent cross-engine."""
    from ..functions.text import tokens, word_shingles_ordered
    from .registry import load_fanout

    docs = load_fanout(spark, sf_dir, "documents")
    tk = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    bg = (
        tk.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(word_shingles_ordered(F.col("t"), 2)).alias("b"),
        )
        .withColumn("head", F.substring_index("b", " ", 1))
    )
    bcnt = bg.groupBy("b").agg(F.count("*").alias("cb"))
    hcnt = bg.groupBy("head").agg(F.count("*").alias("ch"))
    vocab = (
        tk.select(F.explode("t").alias("tok"))
        .agg(F.count_distinct("tok").cast("double").alias("v"))
    )
    scored = (
        bg.join(bcnt, "b")
        .join(hcnt, "head")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", F.expr(_BLP_DEC).alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.sum("lp").cast("double") / F.count("*"), 6)
        .cast("double")
        .alias("avg_logprob"),
    )


# ---------------------------------------------------------------------------
# events_variant_extract — Spark 4 VARIANT semi-structured analytics
# ---------------------------------------------------------------------------


@register(
    "events_variant_extract",
    """
    WITH enriched AS (
      SELECT event_id, event_type,
             '{"k": ' || CAST(props::JSON->>'k' AS VARCHAR)
             || ', "tags": ["t' || CAST(event_id % 7 AS VARCHAR)
             || '", "u"], "meta": {"score": '
             || CAST(event_id % 13 AS VARCHAR) || '.25}}' AS j
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(j::JSON->>'k' AS INTEGER)) AS BIGINT) AS k_sum,
           round(avg(CAST(j::JSON->'meta'->>'score' AS DOUBLE)), 6)
             AS score_avg,
           CAST(count(DISTINCT j::JSON->'tags'->>0) AS BIGINT) AS n_tag0
    FROM enriched
    GROUP BY event_type
    """,
)
def q_events_variant_extract(spark, sf_dir):
    """Semi-structured analytics over Spark 4's VARIANT type: the JSON
    props are parsed ONCE into a variant column (parse_json), then
    every access is a typed path get (try_variant_get — '$.k',
    '$.meta.score', '$.tags[0]') with no per-access re-parse. That is
    the ingest contract at 100 TB: store VARIANT (binary, shreddable),
    never raw JSON strings — a re-parse per extraction multiplies scan
    CPU by the number of paths touched. try_* gets make malformed rows
    NULL instead of failing the job. The oracle runs the same paths
    through DuckDB's JSON operators; floats are .25-grid exact so avg
    hashes identically."""
    ev = load(spark, sf_dir, "events")
    j = F.concat(
        F.lit('{"k": '),
        F.get_json_object("props", "$.k"),
        F.lit(', "tags": ["t'),
        (F.col("event_id") % 7).cast("string"),
        F.lit('", "u"], "meta": {"score": '),
        (F.col("event_id") % 13).cast("string"),
        F.lit('.25}}'),
    )
    v = ev.select("event_type", F.parse_json(j).alias("v"))
    return v.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.try_variant_get("v", "$.k", "int"))
        .cast("bigint")
        .alias("k_sum"),
        F.round(
            F.avg(F.try_variant_get("v", "$.meta.score", "double")), 6
        ).alias("score_avg"),
        F.count_distinct(F.try_variant_get("v", "$.tags[0]", "string"))
        .cast("bigint")
        .alias("n_tag0"),
    )


# ---------------------------------------------------------------------------
# udtf_tokenize_lateral — Python UDTF surface (lateral table function)
# ---------------------------------------------------------------------------


@register(
    "udtf_tokenize_lateral",
    """
    WITH tk AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x != '') AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
           t[1] AS first_token,
           t[len(t)] AS last_token
    FROM tk WHERE len(t) > 0
    """,
)
def q_udtf_tokenize_lateral(spark, sf_dir):
    """The Python UDTF surface (PySpark 4): a table function applied
    per outer row via SQL LATERAL, emitting one row per token, then
    aggregated back per doc. Exists to cover the API — a UDTF is
    Python per input row — kept on the sanctioned Arrow path
    (useArrow=True -> ArrowEvalPythonUDTF, batched transfer; the
    pickled BatchEvalPythonUDTF variant is banned by the plan sweep).
    The JVM twin of this exact computation is ``unnest_tokens_topk``'s
    split/posexplode, and the oracle proves the Python tokenizer
    matches the JVM regex semantics token-for-token (first/last token
    + counts). Use a UDTF only for logic no JVM expression can state
    (external library calls)."""
    import re as _re

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string", useArrow=True)
    class _Tokenize:
        def eval(self, text: str):
            if text:
                for i, tok in enumerate(
                    t for t in _re.split("[^a-z0-9]+", text.lower()) if t
                ):
                    yield i, tok

    spark.udtf.register("_tok_udtf", _Tokenize)
    load(spark, sf_dir, "documents").createOrReplaceTempView(
        "_udtf_documents"
    )
    return spark.sql(
        """
        SELECT d.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(count(DISTINCT s.token) AS BIGINT) AS n_distinct,
               max(CASE WHEN s.pos = 0 THEN s.token END) AS first_token,
               max_by(s.token, s.pos) AS last_token
        FROM _udtf_documents d, LATERAL _tok_udtf(d.text) s
        GROUP BY d.doc_id
        """
    )


# ---------------------------------------------------------------------------
# events_xml_extract — native XML parsing (Spark 4 from_xml)
# ---------------------------------------------------------------------------


@register(
    "events_xml_extract",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(props::JSON->>'k' AS INTEGER)) AS BIGINT) AS k_sum,
           round(avg(event_id % 13 + 0.25), 6) AS score_avg,
           CAST(count(DISTINCT 't' || CAST(event_id % 7 AS VARCHAR))
                AS BIGINT) AS n_tags
    FROM events
    GROUP BY event_type
    """,
)
def q_events_xml_extract(spark, sf_dir):
    """Native XML ingestion (Spark 4 from_xml) — the third
    semi-structured codec next to JSON (json_props_extract) and
    VARIANT (events_variant_extract): each event is serialized to an
    XML fragment, parsed back through from_xml with an explicit
    schema in ONE pass (schema-on-read, no per-path re-parse), and
    the typed struct fields aggregate. The oracle computes the same
    values straight from the base columns, so a hash match proves the
    XML round-trip is lossless — exactly the from_xml contract a feed
    of XML payloads (sitemaps, RSS, legacy enterprise exports) relies
    on at scale, where the parse is map-side and malformed fragments
    become NULL structs instead of failing the scan."""
    ev = load(spark, sf_dir, "events")
    x = F.concat(
        F.lit("<e><k>"),
        F.get_json_object("props", "$.k"),
        F.lit("</k><score>"),
        (F.col("event_id") % 13).cast("string"),
        F.lit(".25</score><tag>t"),
        (F.col("event_id") % 7).cast("string"),
        F.lit("</tag></e>"),
    )
    v = ev.select(
        "event_type",
        F.from_xml(x, "k INT, score DOUBLE, tag STRING").alias("v"),
    )
    return v.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v.k").cast("bigint").alias("k_sum"),
        F.round(F.avg("v.score"), 6).alias("score_avg"),
        F.count_distinct(F.col("v.tag")).cast("bigint").alias("n_tags"),
    )
