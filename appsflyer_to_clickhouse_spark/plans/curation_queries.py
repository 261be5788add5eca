"""Corpus-curation operators a large-scale training-data build needs
beyond dedup/similarity: deterministic stratified sampling, per-source
quotas, GPT-style sequence packing, sliding-window chunking, and PII
scrubbing. All JVM-side (no Python UDFs) with exact DuckDB oracles.

Scale notes (the design constraint for each op):

- ``sample_stratified`` / ``text_pii_scrub``: map-only Projects — one
  codegen'd pass over the scan, zero shuffles at any corpus size.
- ``quota_per_source`` / ``text_pack_sequences``: ONE shuffle on the
  stratum key (source); within-stratum window functions never need a
  global sort. Packing is per-stratum by design — that's also how real
  pipelines shard the work (pack each input shard independently) so no
  single task ever sees the whole corpus's token stream.
- ``text_chunk_overlap``: map-side 1->N explode; output cardinality is
  sum(ceil(n_chars/stride)), bounded linearly by corpus size.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.text import hash60
from .curation_params import RATE_SQL as _RATE_SQL
from .curation_params import rate_column
from .curation_params import TWO60 as _TWO60
from .registry import load, load_fanout, register

# ---------------------------------------------------------------------------
# sample_stratified — deterministic per-stratum downsampling
# ---------------------------------------------------------------------------


@register(
    "sample_stratified",
    f"""
    SELECT doc_id, lang,
           round(('0x' || substr(md5('sample|' || doc_id), 1, 15))::UBIGINT
                 / {_TWO60!r}, 6) AS u
    FROM documents
    WHERE ('0x' || substr(md5('sample|' || doc_id), 1, 15))::UBIGINT
          / {_TWO60!r} < ({_RATE_SQL})
    """,
)
def q_sample_stratified(spark, sf_dir):
    """Deterministic stratified sampling: keep a doc iff a uniform
    variate derived from md5('sample|'||doc_id) falls under its
    stratum's rate. Unlike ``df.sample`` this is reproducible across
    runs/engines AND stable under repartition — the keep decision is a
    pure function of the row, so the sampled corpus is re-derivable
    (the property an audit of a 100 TB training set actually needs).
    Map-only: zero shuffles."""
    docs = load(spark, sf_dir, "documents")
    u = hash60(F.concat(F.lit("sample|"), F.col("doc_id").cast("string"))) / F.lit(
        _TWO60
    )
    rate = rate_column()
    return (
        docs.filter(u < rate)
        .select("doc_id", "lang", F.round(u, 6).alias("u"))
    )


# ---------------------------------------------------------------------------
# quota_per_source — per-stratum curation quota
# ---------------------------------------------------------------------------

_QUOTA = 10


@register(
    "quota_per_source",
    f"""
    SELECT doc_id, source, n_chars, rank_in_source
    FROM (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rank_in_source
      FROM documents
    )
    WHERE rank_in_source <= {_QUOTA}
    """,
)
def q_quota_per_source(spark, sf_dir):
    """Per-source quota: keep the top-N docs per source by length
    (doc_id tiebreak makes the survivor set deterministic). The
    anti-domain-domination knob of corpus curation — caps any one
    source's contribution no matter how big it is. One shuffle on
    source; rank is computed within partitions, no global sort."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        docs.withColumn("rank_in_source", F.row_number().over(w))
        .filter(F.col("rank_in_source") <= _QUOTA)
        .select("doc_id", "source", "n_chars", "rank_in_source")
    )


# ---------------------------------------------------------------------------
# text_pack_sequences — GPT-style token-stream packing
# ---------------------------------------------------------------------------

_SEQ_LEN = 128
# BPE-ish pre-tokenization (same expression as text_token_count)
_BPE_RE = "[a-z0-9]+|[^a-z0-9\\s]"


@register(
    "text_pack_sequences",
    f"""
    WITH toks AS (
      SELECT doc_id, source,
             len(regexp_extract_all(lower(text), '{_BPE_RE}')) AS n_tok
      FROM documents
    ), offs AS (
      SELECT doc_id, source, n_tok,
             coalesce(CAST(SUM(n_tok) OVER (PARTITION BY source
                        ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS BIGINT),
                      0) AS start_off
      FROM toks
    )
    SELECT doc_id, source, n_tok,
           start_off // {_SEQ_LEN} AS first_seq,
           (start_off + n_tok - 1) // {_SEQ_LEN} AS last_seq,
           (start_off + n_tok - 1) // {_SEQ_LEN}
             - start_off // {_SEQ_LEN} + 1 AS n_seqs,
           start_off % {_SEQ_LEN} AS offset_in_first
    FROM offs
    WHERE n_tok > 0
    """,
)
def q_text_pack_sequences(spark, sf_dir):
    """Sequence packing for LLM pretraining: conceptually concatenate
    each source's docs in doc_id order into one token stream and chop
    it into fixed ``_SEQ_LEN`` sequences; emit each doc's span (first/
    last sequence index, offset) — the index a packed-dataset writer
    needs. Packing per source is deliberate: each shard's running
    offset is an independent window, so the cumsum shuffles on source
    instead of funneling the whole corpus through one global-order
    task (the scale trap of Window.orderBy without partitionBy)."""
    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit(_BPE_RE), 0)
    ).alias("n_tok")
    toks = docs.select("doc_id", "source", n_tok)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    offs = toks.withColumn("start_off", start).filter(F.col("n_tok") > 0)
    first_seq = F.expr(f"start_off DIV {_SEQ_LEN}")
    last_seq = F.expr(f"(start_off + n_tok - 1) DIV {_SEQ_LEN}")
    return offs.select(
        "doc_id",
        "source",
        "n_tok",
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
        (last_seq - first_seq + 1).alias("n_seqs"),
        (F.col("start_off") % _SEQ_LEN).alias("offset_in_first"),
    )


# ---------------------------------------------------------------------------
# text_chunk_overlap — sliding-window chunking
# ---------------------------------------------------------------------------

_CHUNK = 240
_STRIDE = 180


@register(
    "text_chunk_overlap",
    f"""
    SELECT doc_id,
           (pos - 1) // {_STRIDE} AS chunk_idx,
           length(substr(text, pos, {_CHUNK})) AS chunk_len,
           md5(substr(text, pos, {_CHUNK})) AS chunk_md5
    FROM documents,
         unnest(generate_series(1, greatest(n_chars, 1), {_STRIDE})) AS t(pos)
    """,
)
def q_text_chunk_overlap(spark, sf_dir):
    """Overlapping character chunks (window {_CHUNK}, stride {_STRIDE})
    — the RAG/embedding-prep shape. A map-side 1->N explode: chunk
    positions come from ``sequence()`` so the fan-out happens where the
    row already is (no shuffle); chunks are emitted as md5+length so
    the result stays narrow even though the intermediate is text."""
    docs = load(spark, sf_dir, "documents")
    pos = F.explode(
        F.sequence(
            F.lit(1), F.greatest(F.col("n_chars"), F.lit(1)), F.lit(_STRIDE)
        )
    ).alias("pos")
    chunk = F.substring(F.col("text"), F.col("pos"), _CHUNK)
    return docs.select("doc_id", "text", pos).select(
        "doc_id",
        ((F.col("pos") - 1) / _STRIDE).cast("long").alias("chunk_idx"),
        F.length(chunk).alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
    )


# ---------------------------------------------------------------------------
# text_pii_scrub — regex PII redaction
# ---------------------------------------------------------------------------

# Patterns restricted to the Java-regex/RE2 common subset (no lookaround)
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_IP_RE = "([0-9]{1,3}\\.){3}[0-9]{1,3}"


@register(
    "text_pii_scrub",
    f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || doc_id
                  || '@example.com from 10.0.0.' || (doc_id % 256) AS t
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(t, '{_IP_RE}')) AS n_ips,
           length(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                                 '{_IP_RE}', '<IP>', 'g')) AS scrubbed_len,
           md5(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_IP_RE}', '<IP>', 'g')) AS scrubbed_md5
    FROM aug
    """,
)
def q_text_pii_scrub(spark, sf_dir):
    """PII scrubbing: redact emails and IPv4s with typed placeholders,
    report per-doc match counts plus the scrubbed text's length/md5.
    Deterministic PII is appended to every doc first so the op is
    exercised on every row regardless of the synthetic corpus content.
    Patterns stay in the Java-regex/RE2 common subset so the DuckDB
    twin matches byte-for-byte. Map-only: one codegen'd pass."""
    docs = load(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0.0."),
        (F.col("doc_id") % 256).cast("string"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(aug, _EMAIL_RE, "<EMAIL>"), _IP_RE, "<IP>"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(aug, F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(aug, F.lit(_IP_RE)).alias("n_ips"),
        F.length(scrubbed).alias("scrubbed_len"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


# ---------------------------------------------------------------------------
# text_decontaminate — benchmark decontamination via n-gram overlap
# ---------------------------------------------------------------------------

_DECON_N = 8  # word n-gram size (production uses 8-13-grams)


@register(
    "text_decontaminate",
    f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x != '') AS t
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id,
             array_to_string(t[i:i+{_DECON_N - 1}], ' ') AS gram
      FROM toks, unnest(range(1, len(t) - {_DECON_N - 2})) AS u(i)
    ),
    evalg AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 11 = 0)
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_shared,
           max(g.gram) AS sample_gram
    FROM grams g JOIN evalg e USING (gram)
    WHERE g.doc_id % 11 != 0
    GROUP BY g.doc_id
    """,
)
def q_text_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag training docs that share any
    word-{_DECON_N}-gram with the held-out eval slice (doc_id % 11 = 0
    stands in for the benchmark suite). The canonical pre-training
    hygiene op — eval answers leaking into training data inflate
    scores, so contaminated docs are dropped or masked.

    Scale shape: n-gram sets are built map-side (word_shingles — zip-
    with over slices, no explode until needed); the EVAL side is tiny
    (benchmarks are MBs, corpora are TBs), so its distinct grams
    broadcast and the train side's exploded grams never shuffle — the
    only shuffle is the final per-doc count over matched grams, whose
    cardinality is bounded by contamination, not corpus size."""
    from ..functions.text import tokens, word_shingles
    from .stage_cache import shared_stage

    # the gram frame feeds BOTH the eval (broadcast build) and train
    # (probe) subplans; without materialization each side re-runs the
    # 8-gram zip_with chain over the corpus. Session-scoped shared
    # stage = compute the shingles once (the production analogue is a
    # stored gram/signature column written at ingest).
    g = shared_stage(
        spark,
        ("decon_grams", _DECON_N, sf_dir),
        lambda: load_fanout(spark, sf_dir, "documents").select(
            "doc_id",
            word_shingles(tokens(F.col("text")), _DECON_N).alias("grams"),
        ),
    )
    evalg = (
        g.filter(F.col("doc_id") % 11 == 0)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    train = g.filter(F.col("doc_id") % 11 != 0).select(
        "doc_id", F.explode("grams").alias("gram")
    )
    return (
        train.join(F.broadcast(evalg), "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shared"),
            F.max("gram").alias("sample_gram"),
        )
    )


# ---------------------------------------------------------------------------
# corpus_shuffle_shards — deterministic global training-order shuffle
# ---------------------------------------------------------------------------

_SHARD_HEX = 2  # first 2 md5 hex chars -> 256 shards


@register(
    "corpus_shuffle_shards",
    f"""
    WITH keyed AS (
      SELECT doc_id,
             md5('shuffle|' || doc_id) AS k,
             ('0x' || substr(md5('shuffle|' || doc_id), 1, {_SHARD_HEX}))::INT
               AS shard
      FROM documents
    )
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
                AS BIGINT) AS pos_in_shard
    FROM keyed
    """,
)
def q_corpus_shuffle_shards(spark, sf_dir):
    """Deterministic global shuffle for training-data ordering: each
    doc gets an md5-derived shuffle key; the first {_SHARD_HEX} hex
    chars pick one of 256 output shards and the position within the
    shard is the rank of the full key. Reading shards in (shard,
    pos_in_shard) order IS the uniform random permutation — and it is
    reproducible across runs, engines, and repartitioning, which
    df.orderBy(rand()) is not.

    Scale shape: this is how a distributed shuffle-writer actually
    lays out a 100 TB corpus — no global-order window (the single-task
    funnel), just one hash shuffle on shard with independent
    per-shard sorts; shard count scales with the cluster."""
    docs = load(spark, sf_dir, "documents")
    k = F.md5(F.concat(F.lit("shuffle|"), F.col("doc_id").cast("string")))
    keyed = docs.select(
        "doc_id",
        k.alias("k"),
        F.conv(F.substring(k, 1, _SHARD_HEX), 16, 10).cast("int").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("k", "doc_id")
    return keyed.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("pos_in_shard"),
    )


# ---------------------------------------------------------------------------
# mix_sources_weighted — stride-scheduled source mixing
# ---------------------------------------------------------------------------

# per-source mixing weight: sources are consumed at these relative
# rates (2x = upweighted, 0.5x = downweighted) — the data-mixture knob
_MIX_W_SQL = (
    "CASE WHEN CAST(substr(source, 4) AS INTEGER) < 5 THEN 2.0 "
    "WHEN CAST(substr(source, 4) AS INTEGER) >= 15 THEN 0.5 "
    "ELSE 1.0 END"
)


@register(
    "mix_sources_weighted",
    f"""
    WITH ranked AS (
      SELECT doc_id, source,
             CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
                  AS BIGINT) AS rank_in_source,
             {_MIX_W_SQL} AS w
      FROM documents
    )
    SELECT doc_id, source, rank_in_source,
           round(rank_in_source / w, 6) AS mix_key
    FROM ranked
    """,
)
def q_mix_sources_weighted(spark, sf_dir):
    """Weighted source mixing via stride scheduling: the r-th document
    of source s gets interleave key r / w_s, so consuming docs in
    mix_key order feeds sources at their weight ratios (w=2 appears
    twice as often early; w=0.5 half as often) — the standard
    data-mixture scheduling primitive. ONE window shuffle keyed on
    source (per-stratum ranks, never a global order); the key is pure
    arithmetic after that, and the actual training order is realized
    downstream by corpus_shuffle_shards-style sharding, never a global
    sort."""
    from pyspark.sql import Window as W2

    docs = load(spark, sf_dir, "documents")
    w = W2.partitionBy("source").orderBy("doc_id")
    ranked = docs.select(
        "doc_id",
        "source",
        F.row_number().over(w).cast("bigint").alias("rank_in_source"),
        F.expr(_MIX_W_SQL).alias("w"),
    )
    return ranked.select(
        "doc_id",
        "source",
        "rank_in_source",
        F.round(F.col("rank_in_source") / F.col("w"), 6).alias("mix_key"),
    )


# ---------------------------------------------------------------------------
# sample_weighted_reservoir — Efraimidis-Spirakis weighted k-sample
# ---------------------------------------------------------------------------

_WR_K = 5  # docs kept per language

# E-S key: u^(1/w) maximized <=> -ln(u)/w minimized; the log form keeps
# the arithmetic in a well-conditioned range. u is the md5-derived
# 60-bit uniform both engines compute identically; ln/division are the
# only non-exactly-specified steps and a selection flip would need two
# keys within ~1 ulp of each other.
_WR_KEY_DUCK = (
    f"-ln((('0x' || substr(md5('wres|' || doc_id), 1, 15))::UBIGINT + 1)"
    f" / {float(2**60 + 2)!r}) / n_chars"
)


@register(
    "sample_weighted_reservoir",
    f"""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             {_WR_KEY_DUCK} AS k,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY {_WR_KEY_DUCK} ASC, doc_id ASC
             ) AS rn
      FROM documents
      WHERE n_chars > 0
    )
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight,
           round(k, 6) AS es_key
    FROM keyed WHERE rn <= {_WR_K}
    """,
)
def q_sample_weighted_reservoir(spark, sf_dir):
    """Distributed weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis 2006): per language, keep the 5 docs with the
    smallest -ln(u)/weight keys — exactly equivalent to drawing
    5 docs sequentially with probability proportional to
    n_chars, but embarrassingly parallel: the key is a map-side
    expression over the md5-derived uniform, and the per-stratum top-k
    is a WindowGroupLimit that caps each task's contribution at K rows
    BEFORE the stratum exchange — the same partial-top-k shape as
    quota_per_source, so no task ever holds a stratum's full
    population. The uniform is (h+1)/(2^60+2), strictly inside (0,1),
    so ln never sees 0 or 1."""
    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        (hash60(F.concat(F.lit("wres|"), F.col("doc_id").cast("string"))) + 1)
        / F.lit(float(2**60 + 2))
    )
    key = -F.log(u) / F.col("n_chars")
    w = Window.partitionBy("lang").orderBy(F.asc("k"), F.asc("doc_id"))
    keyed = docs.select(
        "doc_id", "lang", "n_chars", key.alias("k")
    ).withColumn("rn", F.row_number().over(w))
    return keyed.filter(F.col("rn") <= _WR_K).select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("bigint").alias("weight"),
        F.round("k", 6).alias("es_key"),
    )


# ---------------------------------------------------------------------------
# split_train_test_hash — deterministic hash-bucketed corpus split
# ---------------------------------------------------------------------------


@register(
    "split_train_test_hash",
    """
    SELECT doc_id,
           CAST(('0x' || substr(md5('split|' || doc_id), 1, 15))::UBIGINT
                % 100 AS BIGINT) AS bucket,
           CASE WHEN ('0x' || substr(md5('split|' || doc_id), 1, 15))::UBIGINT
                     % 100 < 90 THEN 'train'
                WHEN ('0x' || substr(md5('split|' || doc_id), 1, 15))::UBIGINT
                     % 100 < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def q_split_train_test_hash(spark, sf_dir):
    """Deterministic train/val/test assignment: bucket =
    md5('split|'||doc_id) % 100, train <90 / val <95 / test otherwise.
    Like ``sample_stratified`` this is a pure function of the row —
    reproducible across runs, engines and repartitions, and a doc's
    split never changes as the corpus grows (the property randomSplit
    lacks: it reassigns everything whenever partitioning shifts).
    Map-only, zero shuffles. Leakage-safe variant at scale: key the
    hash on the near-dup CLUSTER id (``dedup_clusters``) instead of
    doc_id so near-duplicates land in the same split."""
    docs = load(spark, sf_dir, "documents")
    bucket = F.pmod(
        hash60(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))),
        F.lit(100),
    ).cast("bigint")
    return docs.withColumn("bucket", bucket).select(
        "doc_id",
        "bucket",
        F.when(F.col("bucket") < 90, "train")
        .when(F.col("bucket") < 95, "val")
        .otherwise("test")
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# ids_global_contiguous — two-phase contiguous global id assignment
# ---------------------------------------------------------------------------

_ID_BUCKET_W = 256  # order-prefix bucket width (see docstring)


@register(
    "ids_global_contiguous",
    """
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT)
             AS global_id
    FROM documents
    """,
)
def q_ids_global_contiguous(spark, sf_dir):
    """Contiguous 0..n-1 global ids in doc_id order WITHOUT the naive
    plan's single-partition total sort — THE way to assign stable dense
    ids to a 100 TB corpus. Two phases: (1) a window partitioned by an
    order-prefix bucket (doc_id DIV 256 — monotone in the sort key, so
    buckets tile the global order) gives local ranks with one ordinary
    hash exchange; (2) per-bucket counts (a #buckets-row table) get
    cumulative offsets via a window over THAT tiny table only — bounded
    by bucket count, never corpus size — and broadcast-join back:
    global_id = bucket_offset + local_rank - 1. The oracle's
    row_number() OVER (ORDER BY doc_id) proves the composition equals
    the total-order rank. For arbitrary sort keys swap the arithmetic
    bucket for repartitionByRange boundaries (sampled quantiles) — the
    offset/broadcast mechanics are identical."""
    docs = load(spark, sf_dir, "documents")
    bucketed = docs.select(
        "doc_id", (F.col("doc_id") / _ID_BUCKET_W).cast("bigint").alias("b")
    )
    local_w = Window.partitionBy("b").orderBy("doc_id")
    local = bucketed.withColumn("rn", F.row_number().over(local_w))
    counts = bucketed.groupBy("b").agg(F.count("*").alias("cnt"))
    off_w = (
        Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "off", F.coalesce(F.sum("cnt").over(off_w), F.lit(0))
    ).select("b", "off")
    return (
        local.join(F.broadcast(offsets), "b")
        .select(
            "doc_id",
            (F.col("off") + F.col("rn") - 1).cast("bigint").alias("global_id"),
        )
    )


# ---------------------------------------------------------------------------
# split_leakage_safe — cluster-keyed split (near-dups never straddle)
# ---------------------------------------------------------------------------


def _split_case(expr: str) -> str:
    h = f"('0x' || substr(md5('split|' || CAST({expr} AS VARCHAR)), 1, 15))::UBIGINT % 100"
    return (
        f"CASE WHEN {h} < 90 THEN 'train' "
        f"WHEN {h} < 95 THEN 'val' ELSE 'test' END"
    )


def _leakage_safe_oracle() -> str:
    from .dedup_queries import candidates_cte, components_cte

    return f"""
    WITH RECURSIVE
    {candidates_cte('documents')},
    {components_cte()}
    SELECT d.doc_id,
           CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS component,
           {_split_case('COALESCE(c.component, d.doc_id)')} AS split
    FROM documents d LEFT JOIN comp c USING (doc_id)
    """


@register("split_leakage_safe", _leakage_safe_oracle())
def q_split_leakage_safe(spark, sf_dir):
    """Leakage-safe train/val/test split: the hash bucket is keyed on
    the NEAR-DUP CLUSTER id (MinHash-LSH candidates -> connected
    components; singletons are their own cluster), not the doc id — so
    two near-duplicate documents can never land on opposite sides of
    the train/test boundary, the contamination mode a doc-keyed split
    (``split_train_test_hash``) cannot prevent and the first thing an
    eval-integrity audit checks. Cost over the plain split is exactly
    the dedup pipeline (signatures map-only, candidate graph
    LSH-bounded, fixpoint shuffles sized to the EDGE LIST); the split
    itself stays a map-side hash of the component id. Oracle recomputes
    identical components via a recursive transitive-closure CTE."""
    from .dedup_queries import cc_star_frame

    docs = load_fanout(spark, sf_dir, "documents")
    comp = cc_star_frame(spark, sf_dir).withColumnRenamed("id", "doc_id")
    full = (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id"))
            .cast("bigint")
            .alias("component"),
        )
    )
    bucket = F.pmod(
        hash60(F.concat(F.lit("split|"), F.col("component").cast("string"))),
        F.lit(100),
    )
    return full.withColumn(
        "split",
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test"),
    )


# ---------------------------------------------------------------------------
# sample_importance_dsir — hashed-n-gram importance sampling toward a
# target distribution (DSIR, Xie et al. 2023, arXiv:2302.03169)
# ---------------------------------------------------------------------------

# hashed-unigram feature space. 8192 buckets keeps both distribution
# tables broadcast-sized (KBs) at ANY corpus size — the whole point of
# DSIR's hashing trick: the importance model's footprint is fixed
# while the corpus scales.
_DSIR_BUCKETS = 8192

_DSIR_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang,
         unnest(list_filter(regexp_split_to_array(lower(text),
                '[^a-z0-9]+'), x -> x != '')) AS tok
  FROM documents
), bk AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(tok), 1, 15))::UBIGINT % {_DSIR_BUCKETS} AS b
  FROM tok
), c_doc AS (
  SELECT doc_id, b, count(*) AS c FROM bk GROUP BY 1, 2
), n_raw AS (
  SELECT b, count(*) AS n_raw FROM bk GROUP BY 1
), n_tgt AS (
  SELECT b, count(*) AS n_tgt FROM bk WHERE lang = 'en' GROUP BY 1
), lut AS (
  SELECT n_raw.b,
         ((coalesce(n_tgt, 0) + 1) * 1000000) // (n_raw + 1) AS r_ppm
  FROM n_raw LEFT JOIN n_tgt USING (b)
), score AS (
  SELECT doc_id, CAST(SUM(c * r_ppm) AS BIGINT) AS affinity
  FROM c_doc JOIN lut USING (b) GROUP BY 1
), ranked AS (
  SELECT doc_id, affinity,
         row_number() OVER (ORDER BY affinity DESC, doc_id) AS rn
  FROM score
)
SELECT doc_id, affinity FROM ranked
WHERE rn <= (SELECT count(*) // 10 FROM documents)
"""


@register("sample_importance_dsir", _DSIR_ORACLE)
def q_sample_importance_dsir(spark, sf_dir):
    """Data Selection with Importance Resampling (DSIR): score every
    document by how much its hashed-unigram bag looks like a TARGET
    distribution (here lang='en' as the quality proxy) relative to the
    raw corpus, keep the top 10%. The published form weights by
    sum c_b * log(p_tgt(b)/p_raw(b)); this implementation uses the
    integer LUT variant — per-bucket ratio in parts-per-million with
    Laplace smoothing, integer DIV — so the per-doc reduction is a
    BIGINT sum and the cross-engine differential is exact (the same
    staged-LUT determinism technique as the PQ/ADC tier; a production
    deployment swaps the ppm ratio for the log ratio, changing only
    the LUT expression).

    Scale shape: ONE tokenize pass feeds three aggregates; both
    distribution tables are bucket-sized (8192 rows — broadcast KBs
    forever, the hashing trick's purpose), so scoring is a broadcast
    join onto the per-doc bucket counts: no shuffle ever carries the
    token stream twice, and the only global sort is over doc-level
    scores (metadata, not corpus). The top-k is a rank over that
    doc-score table."""
    from ..functions.text import hash60, tokens

    docs = load_fanout(spark, sf_dir, "documents")
    n_docs = docs.count()  # scalar control state, KB-bounded
    bk = docs.select(
        "doc_id",
        "lang",
        F.explode(tokens(F.col("text"))).alias("tok"),
    ).select(
        "doc_id",
        "lang",
        F.pmod(hash60(F.col("tok")), F.lit(_DSIR_BUCKETS)).alias("b"),
    )
    c_doc = bk.groupBy("doc_id", "b").agg(F.count("*").alias("c"))
    n_raw = bk.groupBy("b").agg(F.count("*").alias("n_raw"))
    n_tgt = (
        bk.filter(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count("*").alias("n_tgt"))
    )
    lut = n_raw.join(n_tgt, "b", "left").select(
        "b",
        F.expr(
            "((coalesce(n_tgt, 0) + 1) * 1000000) DIV (n_raw + 1)"
        ).alias("r_ppm"),
    )
    score = (
        c_doc.join(F.broadcast(lut), "b")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("r_ppm")).cast("bigint").alias("affinity"))
    )
    # top-10% as sort+limit, NOT a global row_number window: limit
    # pushes a LocalLimit into every partition before the single-point
    # exchange, where an unpartitioned window would drag the whole
    # doc-score table through one task. Deterministic under the
    # (affinity, doc_id) total order.
    return (
        score.orderBy(F.col("affinity").desc(), F.col("doc_id"))
        .limit(n_docs // 10)
        .select("doc_id", "affinity")
    )


# ---------------------------------------------------------------------------
# quota_temperature_mix — alpha=0.5 temperature sampling across strata
# (the multilingual/data-mixing reweighting of mT5/XLM-R: p_i^alpha)
# ---------------------------------------------------------------------------

_TEMP_MIX_ORACLE = """
WITH n_lang AS (
  SELECT lang, count(*) AS n FROM documents GROUP BY 1
), w AS (
  SELECT lang, n, CAST(FLOOR(SQRT(n)) AS BIGINT) AS w FROM n_lang
), tot AS (
  SELECT SUM(w) AS tot_w, (SELECT count(*) // 4 FROM documents) AS budget
  FROM w
), quota AS (
  SELECT lang, CAST((budget * w) // tot_w AS BIGINT) AS quota
  FROM w, tot
), picked AS (
  SELECT d.doc_id, d.lang, q.quota,
         row_number() OVER (
           PARTITION BY d.lang
           ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
         ) AS rn
  FROM documents d JOIN quota q USING (lang)
)
SELECT doc_id, lang, quota FROM picked WHERE rn <= quota
"""


@register("quota_temperature_mix", _TEMP_MIX_ORACLE)
def q_quota_temperature_mix(spark, sf_dir):
    """Temperature-based mixture reweighting (alpha = 0.5): sampling
    proportional to n_i^alpha UP-weights low-resource strata relative
    to their raw share — the mT5/XLM-R data-mixing rule, here over the
    skewed lang distribution with a total budget of 25% of the corpus.
    Every step is integer-exact cross-engine: IEEE sqrt is correctly
    rounded so FLOOR(SQRT(n)) is deterministic, quotas are BIGINT
    multiply-then-DIV, and the per-stratum pick is a deterministic
    md5-ordered prefix (same selection on both engines, no RNG).

    Scale shape: stratum weights/quotas are a lang-sized table (a
    broadcast scalar row each); the pick is ONE window per stratum
    keyed by lang — the same single-shuffle shape as quota_per_source,
    with the quota now derived from the temperature formula instead of
    a constant."""
    docs = load_fanout(spark, sf_dir, "documents")
    budget = docs.count() // 4  # scalar control state
    n_lang = docs.groupBy("lang").agg(F.count("*").alias("n"))
    w = n_lang.select(
        "lang",
        F.floor(F.sqrt(F.col("n"))).cast("bigint").alias("w"),
    )
    tot_w = w.agg(F.sum("w").alias("tot_w"))
    quota = (
        w.crossJoin(F.broadcast(tot_w))
        .select(
            "lang",
            F.expr(f"({budget} * w) DIV tot_w").cast("bigint").alias("quota"),
        )
    )
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("lang").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
    )
    return (
        docs.join(F.broadcast(quota), "lang")
        .withColumn("rn", rn)
        .filter(F.col("rn") <= F.col("quota"))
        .select("doc_id", "lang", "quota")
    )
