"""Multimodal columns: opaque ``binary`` payloads + typed metadata
structs, with Arrow-batched (mapInPandas) feature extraction.

Design for 100 TB of mixed media:
- payloads live in a ``BinaryType`` column (or object-store URIs when
  blobs exceed row-group budgets); metadata is a typed struct column so
  predicates on mime/size/dims stay JVM-side and push into the scan.
- decode / resize / frame-sample run as ``mapInPandas`` stages: Arrow
  moves the bytes to Python in columnar batches (no per-row pickling),
  each task decodes its own partition, and batch size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory
  is payload-size-aware.
- the actual image/audio codecs are NOT in this container, so decode is
  stubbed behind a gated import (PIL) with a NotImplementedError fall-
  through — the Spark-side plumbing (schemas, batching, signatures) is
  real and tested with deterministic byte-level features instead.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

METADATA_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("source_id", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Turn a string column into an opaque binary payload + metadata
    struct — the storage shape image/audio columns use (payload is
    whatever bytes arrived; metadata is typed and predicate-friendly).
    JVM-side ``encode``; no Python in the loop."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("text/plain").alias("mime"),
        F.octet_length(payload).cast("long").alias("size_bytes"),
        F.col(id_col).cast("long").alias("source_id"),
    )
    return df.select(
        F.col(id_col), payload.alias("payload"), meta.alias("meta")
    )


def extract_binary_features(
    df: DataFrame,
    id_col: str = "doc_id",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Arrow-batched byte-level feature extraction over the payload
    column: length, first byte, md5. This is the mapInPandas stage a
    real decoder plugs into — same signature, same batch shape; the
    features here are deterministic so the whole path is oracle-
    checkable (DuckDB: octet_length / ascii / md5).

    ``passthrough`` columns are copied from the input batch to the
    output, so metadata rides along in the SAME Arrow pass — never
    join a Python stage's output back to its own input (that costs a
    second scan plus a shuffle join on 100 TB; copying a column
    through the batch costs nothing)."""
    out_schema = T.StructType(
        list(FEATURE_SCHEMA.fields) + [df.schema[c] for c in passthrough]
    )

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            # NULL payloads (a NULL source document) must yield NULL
            # features, not a TypeError that kills the task — same
            # None contract as the CDC kernel (multimodal/cdc.py)
            data = {
                "doc_id": pdf[id_col],
                "byte_len": payloads.map(
                    lambda b: len(b) if b is not None else None
                ).astype("Int64"),
                "first_byte": payloads.map(
                    lambda b: b[0] if b else None
                ).astype("Int32"),
                "content_md5": payloads.map(
                    lambda b: hashlib.md5(b).hexdigest()
                    if b is not None
                    else None
                ),
            }
            for c in passthrough:
                data[c] = pdf[c]
            yield pd.DataFrame(data)

    return df.mapInPandas(extract, out_schema)


def decode_image(payload: bytes) -> "tuple[int, int]":
    """Decode an image payload to (width, height). Gated on PIL, which
    this container does not ship — the function exists so the pipeline
    shape is complete; tests use extract_binary_features instead."""
    try:
        from PIL import Image  # type: ignore[import-not-found]
        import io
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "image decoding requires Pillow, which is not installed in "
            "this environment; the Spark-side plumbing (binary columns, "
            "mapInPandas batching) is real — plug a decoder in here"
        ) from exc
    img = Image.open(io.BytesIO(payload))  # pragma: no cover
    return img.size  # pragma: no cover


def sample_frame_offsets(
    size_bytes: int, n_frames: int = 4, frame_stride: int | None = None
) -> list[int]:
    """Deterministic frame-sample plan for a video payload: byte
    offsets of n evenly-spaced frames (a real sampler would seek
    keyframes; the planning arithmetic and distribution shape are what
    the pipeline tests)."""
    if size_bytes <= 0 or n_frames <= 0:
        return []
    stride = frame_stride or max(size_bytes // n_frames, 1)
    return [min(i * stride, size_bytes - 1) for i in range(n_frames)]


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Directory of opaque files -> (path, modificationTime, length,
    content) via Spark's binaryFile source — the ingest edge for
    image/audio drops. Pushes pathGlobFilter down so only matching
    files are opened."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


GROUP_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("total_bytes", T.LongType()),
        T.StructField("group_md5", T.StringType()),
    ]
)


def group_binary_fingerprint(df: DataFrame, group_col: str = "source") -> DataFrame:
    """Per-group binary fingerprint via ``applyInPandas`` (grouped-map:
    the whole group arrives as ONE pandas frame — the API for
    group-holistic Python logic that mapInPandas batches can't
    express). Features: doc count, total payload bytes, and an
    order-insensitive group digest (md5 of the doc_id-sorted per-doc
    md5s) — the manifest a multimodal ingest writes per shard to detect
    upstream content drift.

    Scale: one shuffle on the group key; each group must fit a worker's
    memory (true for manifest-sized groups; a corpus-scale variant
    pre-aggregates per-partition digests first). Determinism: the
    in-group sort happens INSIDE the UDF, so output is partitioning-
    independent."""
    import hashlib as _hl

    def fingerprint(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        # NULL payloads: skipped from the digest and the byte sum —
        # SQL aggregate NULL semantics (a mixed group sums/concats the
        # non-NULL payloads; an ALL-NULL group yields NULL for both,
        # matching the oracle's sum(octet_length)/string_agg)
        md5s = pdf["payload"].map(
            lambda b: _hl.md5(b).hexdigest() if b is not None else ""
        )
        all_null = bool(pdf["payload"].isna().all())
        return pd.DataFrame(
            {
                "source": [pdf[group_col].iloc[0]],
                "n_docs": [len(pdf)],
                "total_bytes": pd.array(
                    [
                        None
                        if all_null
                        else int(
                            pdf["payload"]
                            .map(lambda b: len(b) if b is not None else 0)
                            .sum()
                        )
                    ],
                    dtype="Int64",
                ),
                "group_md5": [
                    None
                    if all_null
                    else _hl.md5("".join(md5s).encode()).hexdigest()
                ],
            }
        )

    return df.groupBy(group_col).applyInPandas(fingerprint, GROUP_FEATURE_SCHEMA)


def extract_binary_features_arrow(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """``extract_binary_features``'s lower-overhead twin on
    ``mapInArrow``: batches arrive as pyarrow RecordBatches and never
    round-trip through pandas, so columnar kernels (binary_length)
    run vectorized in Arrow C++ and only the md5 loop touches Python
    objects. At 100 TB of payload bytes the pandas materialization
    the other path pays (object-dtype Series of bytes) is pure
    overhead — this is the interop tier a production decoder should
    target; features are identical, so both paths share one oracle."""

    def extract(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            payloads = batch.column("payload")
            raw = payloads.to_pylist()
            # None payloads -> None features (pc.binary_length already
            # propagates nulls; the Python md5/first-byte loops must too)
            yield pa.RecordBatch.from_arrays(
                [
                    pc.cast(batch.column(id_col), pa.int64()),
                    pc.cast(pc.binary_length(payloads), pa.int64()),
                    pa.array(
                        [b[0] if b else None for b in raw], pa.int32()
                    ),
                    pa.array(
                        [
                            hashlib.md5(b).hexdigest()
                            if b is not None
                            else None
                            for b in raw
                        ],
                        pa.string(),
                    ),
                ],
                names=["doc_id", "byte_len", "first_byte", "content_md5"],
            )

    return df.mapInArrow(extract, FEATURE_SCHEMA)
