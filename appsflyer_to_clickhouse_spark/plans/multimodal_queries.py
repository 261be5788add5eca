"""SURVEY.md §2 Part C row 5 — multimodal binary columns,
oracle-checked at the byte level.

The decode stage is a deterministic byte-feature extractor (this
container has no image/audio codecs — multimodal/columns.py documents
the gate), so the whole mapInPandas path — Arrow batching, binary
payloads, typed metadata — is exercised and hash-checked against
DuckDB's octet_length/ascii/md5 on the same bytes.
"""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import Window, functions as F

from ..multimodal.columns import (
    attach_binary_payload,
    extract_binary_features,
    group_binary_fingerprint,
    read_binary_dir,
)
from .registry import load, register


@register(
    "multimodal_columns",
    """
    SELECT doc_id,
           octet_length(text::BLOB) AS byte_len,
           ascii(substr(text, 1, 1)) AS first_byte,
           md5(text) AS content_md5,
           'text/plain' AS mime,
           octet_length(text::BLOB) AS size_bytes
    FROM documents
    """,
)
def q_multimodal_columns(spark, sf_dir):
    """Binary payload + metadata struct -> Arrow-batched mapInPandas
    feature extraction (byte length, first byte, md5) with the typed
    metadata flattened into the same Arrow pass (one scan, zero
    joins). The md5 computed in Python per batch must equal DuckDB's
    md5 of the same bytes — a byte-exact check of the whole binary
    path. (Documents are ASCII, so first_byte == codepoint.)"""
    docs = load(spark, sf_dir, "documents")
    bin_df = attach_binary_payload(docs, "text", "doc_id").select(
        "doc_id",
        "payload",
        F.col("meta.mime").alias("mime"),
        F.col("meta.size_bytes").alias("size_bytes"),
    )
    return extract_binary_features(
        bin_df, "doc_id", passthrough=("mime", "size_bytes")
    )


@register(
    "multimodal_frame_sample",
    """
    SELECT doc_id, i AS frame_idx,
           least(i * greatest(octet_length(text::BLOB) // 4, 1),
                 octet_length(text::BLOB) - 1) AS byte_offset
    FROM documents, (SELECT unnest(range(4)) AS i) u
    WHERE octet_length(text::BLOB) > 0
    """,
)
def q_multimodal_frame_sample(spark, sf_dir):
    """Frame-sampling plan for video-like payloads: a 1->N fan-out
    mapInPandas stage emitting (doc_id, frame_idx, byte_offset) rows
    from each payload via the deterministic sampler (a real sampler
    would seek keyframes at those offsets). Exercises the expanding
    batch shape the feature extractor (1->1) doesn't."""
    from ..multimodal.columns import attach_binary_payload, sample_frame_offsets

    docs = load(spark, sf_dir, "documents")
    bin_df = attach_binary_payload(docs, "text", "doc_id")

    def sample(batches):
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "byte_offset": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for idx, off in enumerate(sample_frame_offsets(len(payload), 4)):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["byte_offset"].append(off)
            yield pd.DataFrame(out)

    return bin_df.mapInPandas(
        sample, "doc_id long, frame_idx int, byte_offset long"
    )


_BIN_FILES = {
    "a.bin": b"\x89PNG-ish deterministic payload",
    "b.bin": b"RIFF-ish deterministic payload!!",
    "c.txt": b"plain text payload",
}


def _bin_oracle() -> str:
    import hashlib

    rows = ",\n      ".join(
        f"('{name}', {len(data)}, '{hashlib.md5(data).hexdigest()}')"
        for name, data in sorted(_BIN_FILES.items())
        if name.endswith(".bin")
    )
    return (
        "SELECT * FROM (VALUES\n      "
        + rows
        + ") AS t(file_name, byte_len, content_md5)"
    )


@register("multimodal_binary_files", _bin_oracle())
def q_multimodal_binary_files(spark, sf_dir):
    """binaryFile ingest edge: a directory of opaque files read with a
    pushed-down glob (*.bin — the .txt must not appear), returning
    per-file name/length/md5. Path prefix is stripped so the result is
    location-independent."""
    d = tempfile.mkdtemp(prefix="spark_graft_bin_")
    for name, data in _BIN_FILES.items():
        Path(d, name).write_bytes(data)
    df = read_binary_dir(spark, d, glob="*.bin")
    return df.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length").alias("byte_len"),
        F.md5("content").alias("content_md5"),
    )


@register(
    "multimodal_group_fingerprint",
    """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(octet_length(text::BLOB)) AS BIGINT) AS total_bytes,
           md5(string_agg(md5(text), '' ORDER BY doc_id)) AS group_md5
    FROM documents
    GROUP BY source
    """,
)
def q_multimodal_group_fingerprint(spark, sf_dir):
    """Per-source shard manifest over binary payloads via grouped-map
    applyInPandas (the whole group as one pandas frame — the API shape
    for group-holistic Python logic): doc count, byte total, and an
    order-insensitive group digest (md5 of doc_id-sorted per-doc md5s),
    byte-exact against DuckDB's ordered string_agg. One shuffle on the
    group key."""
    docs = load(spark, sf_dir, "documents")
    # payload + group key in ONE projection (attach_binary_payload's
    # encode, with `source` threaded through — never join a stage back
    # to its own input)
    bin_df = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"), "source"
    )
    return group_binary_fingerprint(bin_df, "source")


# ---------------------------------------------------------------------------
# multimodal_audio_windows — metadata-driven analysis-window planning
# ---------------------------------------------------------------------------

_SR = 16_000          # samples/sec
_WIN = 4_000          # 250 ms analysis window
_HOP = 2_000          # 125 ms hop (50% overlap)

_AUDIO_ORACLE = f"""
WITH meta AS (
  SELECT doc_id,
         {_SR} AS sample_rate,
         n_chars * 40 AS n_samples
  FROM documents WHERE n_chars * 40 >= {_WIN}
)
SELECT doc_id,
       CAST(u.w AS INTEGER) AS window_idx,
       CAST(u.w * {_HOP} AS BIGINT) AS start_sample,
       CAST(u.w * {_HOP} + {_WIN} AS BIGINT) AS end_sample,
       CAST(round(u.w * {_HOP} * 1000.0 / sample_rate, 3) AS DOUBLE)
         AS start_ms
FROM meta,
     (SELECT unnest(range(0, ((n_samples - {_WIN}) // {_HOP}) + 1)) AS w) u
"""


@register("multimodal_audio_windows", _AUDIO_ORACLE)
def q_multimodal_audio_windows(spark, sf_dir):
    """Audio analysis-window planning from TYPED METADATA ALONE —
    the scheduling half of feature extraction (the DSP half is the
    codec-gated mapInPandas of multimodal_columns). Each clip's
    (sample_rate, n_samples) yields its overlapping 250ms/125ms-hop
    window plan as a map-side sequence() explode: 1 -> n_windows rows,
    no shuffle, output linear in total audio duration. At 100 TB this
    is how per-window work (VAD, fbank, embedding) is fanned out to
    executors WITHOUT moving payload bytes — windows join back to the
    binary column by doc_id only where a batch actually decodes.
    Synthetic metadata derives deterministically from n_chars (the
    container ships no audio codecs; the planning math is the real
    surface)."""
    docs = load(spark, sf_dir, "documents")
    meta = docs.select(
        "doc_id",
        F.lit(_SR).alias("sample_rate"),
        (F.col("n_chars") * 40).alias("n_samples"),
    ).filter(F.col("n_samples") >= _WIN)
    n_win = ((F.col("n_samples") - _WIN) / _HOP).cast("long")
    return meta.select(
        "doc_id",
        "sample_rate",
        F.explode(F.sequence(F.lit(0).cast("long"), n_win)).alias("w"),
    ).select(
        "doc_id",
        F.col("w").cast("int").alias("window_idx"),
        (F.col("w") * _HOP).cast("bigint").alias("start_sample"),
        (F.col("w") * _HOP + _WIN).cast("bigint").alias("end_sample"),
        F.round(F.col("w") * _HOP * 1000.0 / F.col("sample_rate"), 3)
        .cast("double")
        .alias("start_ms"),
    )


# ---------------------------------------------------------------------------
# multimodal_near_dup — byte-level SimHash near-dup over binary payloads
# ---------------------------------------------------------------------------

from ..functions.text import simhash60  # noqa: E402
from ..operators.dedup import (  # noqa: E402
    SIMHASH_BAND_BITS as _MM_BAND_BITS,
)
from ..operators.dedup import (  # noqa: E402
    SIMHASH_BANDS as _MM_BANDS,
)
from ..operators.dedup import simhash_near_pairs  # noqa: E402
from .dedup_queries import MAX_HAMMING as _MM_HAMMING  # noqa: E402
from .dedup_queries import _simhash_oracle_expr  # noqa: E402

_BYTE_GRAM = 4


@register(
    "multimodal_near_dup",
    f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_filter(
               string_split(
                 regexp_replace(hex(text::BLOB),
                                '(.{{{_BYTE_GRAM * 2}}})', '\\1 ', 'g'), ' '),
               x -> x != '')) AS ss
      FROM documents
    ),
    hv AS (
      SELECT doc_id,
             list_transform(ss, s -> ('0x' || substr(md5(s), 1, 15))::UBIGINT)
               AS hs
      FROM sh
    ),
    sim AS (
      SELECT doc_id,
             CASE WHEN len(hs) > 0 THEN {_simhash_oracle_expr()}
                  ELSE NULL END AS simhash
      FROM hv
    ),
    banded AS (
      SELECT doc_id, simhash, u.band_idx,
             (simhash >> ({_MM_BAND_BITS} * u.band_idx))
               & {2**_MM_BAND_BITS - 1} AS band_val
      FROM sim, (SELECT unnest(range({_MM_BANDS})) AS band_idx) u
      WHERE simhash IS NOT NULL
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM banded a
    JOIN banded b
      ON a.band_idx = b.band_idx AND a.band_val = b.band_val
     AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {_MM_HAMMING}
    """,
)
def q_multimodal_near_dup(spark, sf_dir):
    """Near-duplicate BINARY payloads: 60-bit SimHash over the
    payload's distinct NON-overlapping {_BYTE_GRAM}-byte chunks (hex
    split into {_BYTE_GRAM * 2}-char pieces — no codec, no text
    assumption; non-overlapping keeps the per-payload item count at
    bytes/{_BYTE_GRAM}, a 4x fold-cost cut vs sliding grams, at the
    price of alignment sensitivity — an acceptable trade for the
    padding/header/tail perturbations this tier exists to catch),
    then the same 4 x 15-bit banded pair generation the text family
    uses. This is the modality-agnostic
    dedup tier: it catches bit-identical and lightly-perturbed
    payloads (padding, header tweaks, truncated tails) for image/
    audio blobs where content-aware perceptual hashing needs a decode
    stage (multimodal/columns.py documents that gate); at 100 TB the
    signature is a map-only pass over the payload bytes and candidate
    generation never leaves the 131k-bucket banded join. Payloads here
    are the documents' UTF-8 bytes (the container's stand-in), so the
    oracle reproduces signatures from hex(text::BLOB) byte-for-byte."""
    from .registry import load_fanout

    docs = load_fanout(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    chunks = F.array_distinct(
        F.filter(
            F.split(
                F.regexp_replace(
                    F.hex(payload), f"(.{{{_BYTE_GRAM * 2}}})", "$1 "
                ),
                " ",
            ),
            lambda x: x != F.lit(""),
        )
    )
    sim_df = docs.select("doc_id", simhash60(chunks).alias("simhash"))
    return simhash_near_pairs(sim_df, "doc_id", _MM_HAMMING)


# ---------------------------------------------------------------------------
# multimodal_features_arrow — the mapInArrow interop tier
# ---------------------------------------------------------------------------

from ..multimodal.columns import extract_binary_features_arrow  # noqa: E402


@register(
    "multimodal_features_arrow",
    """
    SELECT doc_id,
           octet_length(text::BLOB) AS byte_len,
           ascii(substr(text, 1, 1)) AS first_byte,
           md5(text) AS content_md5
    FROM documents
    """,
)
def q_multimodal_features_arrow(spark, sf_dir):
    """Byte-feature extraction via ``mapInArrow`` — RecordBatches
    straight from the scan, no pandas materialization; vectorized
    Arrow kernels for lengths, Python only for md5. Same features and
    oracle as the mapInPandas path (multimodal_columns), so the two
    interop tiers are held to byte-identical results."""
    docs = load(spark, sf_dir, "documents")
    bin_df = attach_binary_payload(docs, "text", "doc_id").select(
        "doc_id", "payload"
    )
    return extract_binary_features_arrow(bin_df, "doc_id")


# ---------------------------------------------------------------------------
# multimodal_cdc_chunks — content-defined chunking for blob dedup
# ---------------------------------------------------------------------------

from ..multimodal.cdc import _CDC_MULT, cdc_chunk_digests  # noqa: E402

# Cut-point list over hex(payload): 0, every interior position whose
# windowed multiplicative hash hits the mask (i in [4, nb-4] INCLUSIVE
# in both dialects — Spark sequence() includes its endpoint, so the
# DuckDB range() adds +1), and nb. The boundary function reads the
# 3-byte window at offset i as a 24-bit integer w and tests the TOP
# 5 bits of (w * 2654435761) mod 2^24 — top bits depend on every
# input bit (low-bit masks would degenerate to last-byte tests), and
# the whole thing is integer arithmetic identical on both engines,
# ~50x cheaper than an md5 per position. Shared structure,
# dialect-local idioms.
_CDC_CUTS_DUCK = (
    "CASE WHEN nb >= 8 THEN [0::BIGINT] || "
    "list_filter(list_transform(range(4, greatest(nb - 4, 4) + 1), "
    "i -> CASE WHEN (('0x' || substr(hx, (i*2+1)::INT, 6))::UBIGINT "
    f"* {_CDC_MULT}) % 16777216 // 524288 = 0 THEN i::BIGINT END), "
    "x -> x IS NOT NULL) || [nb] ELSE [0::BIGINT] || [nb] END"
)

def _cdc_digests_duck() -> str:
    c = f"({_CDC_CUTS_DUCK})"
    return (
        f"list_transform(list_zip({c}[1:-2], {c}[2:-1]), "
        "p -> md5(substr(hx, (p[1]*2+1)::INT, ((p[2]-p[1])*2)::INT)))"
    )


@register(
    "multimodal_cdc_chunks",
    f"""
    WITH hxs AS (
      SELECT doc_id, hex(text::BLOB) AS hx,
             octet_length(text::BLOB)::BIGINT AS nb
      FROM documents WHERE text IS NOT NULL
    ),
    cut AS (
      SELECT doc_id, hx, nb, {_cdc_digests_duck()} AS digests
      FROM hxs
    ),
    ch AS (
      SELECT doc_id, unnest(digests) AS digest FROM cut
    ),
    freq AS (
      SELECT digest, count(*) AS f FROM ch GROUP BY digest
    )
    SELECT ch.doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN freq.f >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_chunks,
           round(sum(CASE WHEN freq.f >= 2 THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS shared_ratio
    FROM ch JOIN freq ON freq.digest = ch.digest
    GROUP BY ch.doc_id
    """,
)
def q_multimodal_cdc_chunks(spark, sf_dir):
    """Content-defined chunking (Rabin-style CDC — the dedup primitive
    of blob/backup storage): cut points fall where a windowed hash of
    the bytes at each position hits a mask, so chunk boundaries move
    WITH the content — insert one byte near the front of a payload and
    only the chunks around the edit change, where fixed-size chunking
    re-digests the entire tail. Per payload: chunk count, chunks whose
    digest occurs anywhere else in the corpus, and the shared ratio —
    the storage-dedup win CDC would realize. The chunking kernel is
    the vectorized Arrow UDF in multimodal/cdc.py (numpy evaluates
    every position of a payload in one shift/multiply/compare pass;
    measured at sf0.1: 56 s md5-rolling -> 9.4 s interpreted HOF ->
    3.4 s Arrow UDF, identical digests — the DuckDB oracle keeps the
    independent HOF formulation as the per-digest pin). Map-only
    per-payload chunking; the only shuffle is the digest-frequency
    aggregate, bounded by distinct chunks."""
    docs = load(spark, sf_dir, "documents")
    # explode_outer, NOT explode: InferFiltersFromGenerate turns a
    # plain explode into a pushed `size(digests) > 0` filter whose
    # predicate re-evaluates the generator input a second time below
    # the projection — explode_outer (identical here: digests always
    # has >= 1 element) is exempt and keeps the UDF single-evaluation.
    # NULL texts are excluded on BOTH sides (filter here, WHERE in the
    # oracle): the Spark window would group a NULL digest into a row
    # while the oracle's equality join drops it — a silent row-count
    # divergence on any corpus with a NULL document.
    ch = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.explode_outer(cdc_chunk_digests(F.col("text"))).alias("digest"),
    )
    # Corpus-wide digest frequency via a WINDOW over the exploded
    # chunks, not groupBy+join-back: the join shape evaluates the
    # chunking UDF twice (build and probe side each re-run it) — the
    # window shape runs it ONCE and shuffles once on digest.
    ch2 = ch.select(
        "doc_id",
        F.count("*").over(Window.partitionBy("digest")).alias("f"),
    )
    return ch2.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.when(F.col("f") >= 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_shared_chunks"),
        F.round(
            F.sum(F.when(F.col("f") >= 2, 1).otherwise(0)) / F.count("*"),
            6,
        ).alias("shared_ratio"),
    )
