"""RESTORE on the manifest sink (datasource_sink.restore_sink): the
roll-back publishes as a new commit — current reads serve the target
snapshot, the restore itself is time-travelable and reversible, the
rolled-away parts stay vacuum-protected while retained entries
reference them, the rows counter is repaired from the log's
rows_total, and the streaming tail never re-emits a restore's
re-added files.
"""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
    MANIFEST,
    ClickHouseArrowDataSource,
    optimize_sink,
    read_committed_parquet,
    restore_sink,
    sink_versions,
    vacuum_sink,
)

_SCHEMA = T.StructType(
    [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
)


def _append(spark, path, lo, hi):
    spark.dataSource.register(ClickHouseArrowDataSource)
    (
        spark.range(lo, hi)
        .coalesce(1)
        .select(F.col("id").cast("string").alias("k"), F.col("id").alias("v"))
        .write.format("chbatch_arrow")
        .option("path", path)
        .option("batchsize", "1000000")
        .mode("append")
        .save()
    )


def _manifest(path):
    with open(os.path.join(path, MANIFEST)) as fh:
        return json.load(fh)


def _content(spark, path, version=None):
    df = read_committed_parquet(spark, path, _SCHEMA, version=version)
    r = df.agg(F.count("*").alias("n"), F.sum("v").alias("s")).first()
    return r["n"], r["s"]


def test_restore_rolls_back_and_is_itself_versioned(spark):
    path = tempfile.mkdtemp(prefix="rst_") + "/sink"
    _append(spark, path, 0, 100)    # v0
    _append(spark, path, 100, 300)  # v1
    _append(spark, path, 300, 350)  # v2
    out = restore_sink(path, 0)
    assert out["changed"] and out["rows_repaired"]
    assert out["removed"] == 2 and out["re_added"] == 0
    m = _manifest(path)
    # current snapshot == v0; counter repaired from the log
    assert _content(spark, path) == (100, 99 * 100 // 2)
    assert m["rows"] == 100
    # audit trail: the restore is a first-class commit
    vs = sink_versions(path)
    assert [e["op"] for e in vs] == ["append"] * 3 + ["restore"]
    assert vs[-1]["rows_total"] == 100
    # the restore version itself time-travels to the target set,
    # while pre-restore versions still resolve their own snapshots
    assert _content(spark, path, version=3) == (100, 99 * 100 // 2)
    assert _content(spark, path, version=2) == (350, 349 * 350 // 2)
    # reversible: restore forward to v2 re-adds the rolled-away parts
    out2 = restore_sink(path, 2)
    assert out2["changed"] and out2["re_added"] == 2
    assert _content(spark, path) == (350, 349 * 350 // 2)
    assert _manifest(path)["rows"] == 350


def test_restore_noop_and_vacuum_protection(spark):
    path = tempfile.mkdtemp(prefix="rstv_") + "/sink"
    _append(spark, path, 0, 100)
    _append(spark, path, 100, 200)
    assert restore_sink(path, 1) == {"restored_to": 1, "changed": False}
    rolled = restore_sink(path, 0)
    assert rolled["changed"]
    # the rolled-away v1 part is still referenced by the v1 append
    # entry -> vacuum must spare it (time travel forward depends on it)
    assert vacuum_sink(path) == []
    assert _content(spark, path, version=1) == (200, 199 * 200 // 2)


def test_restore_across_compaction(spark):
    """Restoring to a pre-compaction version serves the ORIGINAL
    parts; restoring back to the compaction serves the rewrite."""
    path = tempfile.mkdtemp(prefix="rstc_") + "/sink"
    _append(spark, path, 0, 400)
    _append(spark, path, 400, 500)
    optimize_sink(spark, path, _SCHEMA, target_rows_per_file=1000)  # v2
    restore_sink(path, 0)  # v3: only append 0, via original parts
    assert _content(spark, path) == (400, 399 * 400 // 2)
    restore_sink(path, 2)  # v4: the compacted layout again
    m = _manifest(path)
    assert _content(spark, path) == (500, 499 * 500 // 2)
    assert len(m["files"]) == 1  # the compacted part, not the originals


def test_tail_skips_restore_commits(spark):
    """A restore re-adds files whose rows the tail already emitted —
    forwarding them would duplicate downstream."""
    path = tempfile.mkdtemp(prefix="rstt_") + "/sink"
    ckpt = tempfile.mkdtemp(prefix="rstt_ckpt_")
    out_dir = tempfile.mkdtemp(prefix="rstt_out_") + "/out"
    _append(spark, path, 0, 100)   # v0
    _append(spark, path, 100, 150)  # v1
    restore_sink(path, 0)           # v2: drop v1
    restore_sink(path, 1)           # v3: re-add v1 (re-adds files)
    q = (
        spark.readStream.format("chbatch_arrow")
        .schema(_SCHEMA)
        .option("path", path)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.schema(_SCHEMA).parquet(out_dir)
    # each appended row exactly once despite the restore round trip
    assert out.count() == 150
    assert out.select("v").distinct().count() == 150


def test_restore_unknown_version_raises(spark):
    path = tempfile.mkdtemp(prefix="rstu_") + "/sink"
    _append(spark, path, 0, 10)
    with pytest.raises(ValueError, match="no snapshot v7"):
        restore_sink(path, 7)


def test_vacuum_dry_run_reports_without_deleting(spark):
    """VACUUM DRY RUN: same candidate list, nothing deleted, manifest
    untouched — the pre-flight an operator runs before the real sweep."""
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        truncate_history,
    )

    path = tempfile.mkdtemp(prefix="rstdry_") + "/sink"
    _append(spark, path, 0, 100)
    _append(spark, path, 100, 200)
    pre = set(_manifest(path)["files"])
    optimize_sink(spark, path, _SCHEMA, target_rows_per_file=1000)
    _append(spark, path, 200, 210)
    truncate_history(path, retain_last=1)
    before_manifest = _manifest(path)
    candidates = vacuum_sink(path, dry_run=True)
    assert set(candidates) == pre
    for f in pre:  # nothing deleted
        assert os.path.exists(os.path.join(path, f))
    assert _manifest(path) == before_manifest  # stats map untouched too
    # the real sweep removes exactly what the dry run promised
    assert set(vacuum_sink(path)) == set(candidates)
    for f in pre:
        assert not os.path.exists(os.path.join(path, f))


def test_timestamp_as_of_resolution(spark):
    """TIMESTAMP AS OF: commits record wall-clock, reads resolve the
    newest commit at or before the instant. Clocks are audit metadata
    only — versions order the log — so pre-timestamp history is
    reachable by version alone and a too-early timestamp is loud."""
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        _version_for_timestamp,
    )

    path = tempfile.mkdtemp(prefix="tsof_") + "/sink"
    _append(spark, path, 0, 100)    # v0
    _append(spark, path, 100, 300)  # v1
    m = _manifest(path)
    assert all("ts" in e for e in m["history"])
    # pin deterministic clocks, preserving order
    m["history"][0]["ts"] = 1000.0
    m["history"][1]["ts"] = 2000.0
    with open(os.path.join(path, MANIFEST), "w") as fh:
        json.dump(m, fh)
    assert _version_for_timestamp(path, 1500.0) == 0
    assert _version_for_timestamp(path, 2000.0) == 1
    assert _version_for_timestamp(path, 10**9) == 1
    with pytest.raises(ValueError, match="no commit at or before"):
        _version_for_timestamp(path, 999.0)
    # reader plumbing: epoch, ISO string, and exclusivity
    assert _content(spark, path)[0] == 300
    got = read_committed_parquet(spark, path, _SCHEMA, timestamp=1500.0)
    assert got.count() == 100
    got2 = read_committed_parquet(
        spark, path, _SCHEMA, timestamp="1970-01-01 00:33:20"  # = 2000s
    )
    assert got2.count() == 300
    with pytest.raises(ValueError, match="not both"):
        read_committed_parquet(
            spark, path, _SCHEMA, version=1, timestamp=1500.0
        )
