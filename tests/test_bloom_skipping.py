"""Per-part BLOOM-FILTER skipping indexes (VERDICT r9 task 1 —
Delta's bloom-filter index / ClickHouse skip-index parity on the
chbatch protocol; sinks/bloom_index.py).

Pins:
- the headline scale pin: on a HIGH-CARDINALITY uuid-ish string key
  — where every part's min/max spans the full lexicographic range so
  stats pruning keeps everything — a point lookup through the bloom
  tier reads ~1 part, not all of them (the reference's own dedup
  probe shape, main.py:172-180);
- a bloom MISS is exact (no false negatives, property-tested over
  the kernel), so pruning on it can never drop a matching row;
- both writer tiers + the streaming tier write filters; the batch
  reader's pushed EqualTo/In filters and ``prune_files`` consult
  them; untracked parts/columns are kept conservatively;
- floats and un-encodable types refuse per-part (no bloom beats a
  wrong bloom); probe values normalize exactly like stored stats so
  date/timestamp/decimal round-trips agree bit-for-bit;
- lifecycle: commit-log fold (blooms_add/blooms_drop), parquet
  checkpoint round-trip, clone carry with sidecar absolutization,
  mutation hygiene (rewritten parts lose refs), vacuum
  reference-protection and orphan reaping, abort/replay cleanup.
"""

from __future__ import annotations

import os
import tempfile
import uuid as _uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from appsflyer_to_clickhouse_spark.sinks import bloom_index, commit_log
from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
    ClickHouseArrowDataSource,
    ClickHouseBatchDataSource,
    _manifest_read,
    clone_sink,
    optimize_sink,
    prune_files,
    vacuum_sink,
)
from appsflyer_to_clickhouse_spark.sinks.mutations import delete_where

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("k", T.StringType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def _key(i: int) -> str:
    # deterministic uuid-ish high-cardinality key: every part's
    # min/max spans the full lexicographic range
    return _uuid.uuid5(_uuid.NAMESPACE_DNS, str(i)).hex


def _df(spark, n=8000):
    return spark.createDataFrame(
        [(i, _key(i), float(i % 7)) for i in range(n)],
        SCHEMA,
    )


def _staged(spark, tmp, n_appends=4, fmt="chbatch_arrow", **opts):
    spark.dataSource.register(ClickHouseArrowDataSource)
    spark.dataSource.register(ClickHouseBatchDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    path = os.path.join(tmp, "s")
    df = _df(spark)
    for r in range(n_appends):
        w = (
            df.filter(F.col("id") % n_appends == r)
            .coalesce(1)
            .write.format(fmt)
            .option("path", path)
            .option("bloomfilter", "k")
            .option("bloomfpp", "0.001")
            .option("batchsize", "100000000")
        )
        for k, v in opts.items():
            w = w.option(k, v)
        w.mode("append").save()
    return path


# ---------------------------------------------------------------- kernel


def test_kernel_no_false_negatives_and_low_fpp():
    values = [_key(i) for i in range(5000)]
    bits, m, k, n = bloom_index.build_bitmap(values, 0.01)
    assert n == 5000

    ref = {"sidecar": "x", "m": m, "k": k, "n": n}

    def probe(v):
        key = bloom_index._key_bytes(v)
        h1, h2 = bloom_index._lanes(key)
        return all(
            (bits[p >> 3] >> (p & 7)) & 1
            for p in ((h1 + i * h2) % m for i in range(k))
        )

    # no false negatives, ever
    assert all(probe(v) for v in values)
    # FPP in the advertised ballpark (deterministic given the data)
    fp = sum(probe(f"absent-{i}") for i in range(5000))
    assert fp < 5000 * 0.05, fp


def test_kernel_refuses_floats_and_mixed():
    assert bloom_index.build_bitmap([1.5, "a"], 0.01) is None
    assert bloom_index.build_bitmap([b"raw"], 0.01) is None
    # NULLs are skipped, not fatal
    bits, m, k, n = bloom_index.build_bitmap(["a", None, "b"], 0.01)
    assert n == 2


def test_kernel_normalizes_like_stats():
    import datetime as dt
    import decimal

    ts = dt.datetime(2024, 3, 1, 12, 30, 5)
    d = dt.date(2024, 3, 1)
    dec = decimal.Decimal("12.50")
    bits, m, k, n = bloom_index.build_bitmap([ts, d, dec, 7], 0.01)
    ref_bits = bytes(bits)

    def probe(v):
        key = bloom_index._key_bytes(v)
        h1, h2 = bloom_index._lanes(key)
        return all(
            (ref_bits[p >> 3] >> (p & 7)) & 1
            for p in ((h1 + i * h2) % m for i in range(k))
        )

    assert probe(ts) and probe(d) and probe(dec) and probe(7)
    assert not probe(dt.datetime(2024, 3, 1, 12, 30, 6))


def test_option_validation():
    with pytest.raises(ValueError, match="no column names"):
        bloom_index.parse_bloom_options({"bloomfilter": " , "})
    with pytest.raises(ValueError, match="duplicate"):
        bloom_index.parse_bloom_options({"bloomfilter": "k,k"})
    with pytest.raises(ValueError, match="bloomfpp"):
        bloom_index.parse_bloom_options(
            {"bloomfilter": "k", "bloomfpp": "1.5"}
        )
    with pytest.raises(ValueError, match="bloomfilter"):
        bloom_index.parse_bloom_options({"bloomfpp": "0.01"})
    assert bloom_index.parse_bloom_options({}) is None
    assert bloom_index.parse_bloom_options({"bloomfilter": "a, b"}) == (
        ["a", "b"],
        bloom_index.BLOOM_DEFAULT_FPP,
    )


# ----------------------------------------------------- write + prune path


def test_point_lookup_prunes_where_stats_keep_all(spark):
    """THE scale pin: stats keep all 4 parts (full-range uuid key),
    bloom prunes the point lookup to the one part holding the key."""
    with tempfile.TemporaryDirectory() as tmp:
        path = _staged(spark, tmp)
        m = _manifest_read(path)
        assert len(m["files"]) == 4
        assert set(m["blooms"]) == set(m["files"])
        probe = _key(1234)
        # stats alone keep everything for this key shape
        stats_kept = [
            f
            for f in m["files"]
            if (st := m["stats"][f].get("k"))
            and st["min"] <= probe <= st["max"]
        ]
        assert len(stats_kept) == 4
        kept = prune_files(path, "k", probe, probe)
        assert len(kept) == 1
        # the kept part really holds the row (id 1234 % 4 == 2 slice)
        got = (
            spark.read.format("chbatch_arrow")
            .schema(SCHEMA)
            .option("path", path)
            .load()
            .filter(F.col("k") == probe)
            .collect()
        )
        assert [r.id for r in got] == [1234]


def test_absent_key_prunes_everything(spark):
    with tempfile.TemporaryDirectory() as tmp:
        path = _staged(spark, tmp)
        assert prune_files(path, "k", "absent", "absent") == []
        got = (
            spark.read.format("chbatch_arrow")
            .schema(SCHEMA)
            .option("path", path)
            .load()
            .filter(F.col("k") == "absent")
        )
        assert got.count() == 0


def test_range_reads_unaffected(spark):
    """Bloom only gates POINT lookups — range predicates keep the
    stats decision untouched."""
    with tempfile.TemporaryDirectory() as tmp:
        path = _staged(spark, tmp)
        lo, hi = _key(10)[:8], _key(10)[:8] + "￿"
        kept = prune_files(path, "k", lo, hi)
        assert len(kept) == 4  # stats keep all; bloom must not run
        total = (
            spark.read.format("chbatch_arrow")
            .schema(SCHEMA)
            .option("path", path)
            .load()
            .count()
        )
        assert total == 8000


def test_reader_pushed_in_list(spark):
    with tempfile.TemporaryDirectory() as tmp:
        path = _staged(spark, tmp)
        keys = [_key(3), _key(6)]
        got = (
            spark.read.format("chbatch_arrow")
            .schema(SCHEMA)
            .option("path", path)
            .load()
            .filter(F.col("k").isin(keys))
            .collect()
        )
        assert sorted(r.id for r in got) == [3, 6]


def test_jsonl_tier_writes_blooms(spark):
    with tempfile.TemporaryDirectory() as tmp:
        path = _staged(spark, tmp, fmt="chbatch")
        m = _manifest_read(path)
        assert set(m["blooms"]) == set(m["files"])
        probe = _key(77)
        assert len(prune_files(path, "k", probe, probe)) == 1


def test_float_column_skipped_not_fatal(spark):
    """Indexing a float column yields NO bloom for it (refused
    per-part), and probes stay conservative."""
    with tempfile.TemporaryDirectory() as tmp:
        spark.dataSource.register(ClickHouseArrowDataSource)
        path = os.path.join(tmp, "s")
        (
            _df(spark, 100)
            .coalesce(1)
            .write.format("chbatch_arrow")
            .option("path", path)
            .option("bloomfilter", "val,k")
            .mode("append")
            .save()
        )
        m = _manifest_read(path)
        refs = next(iter(m["blooms"].values()))
        assert "k" in refs and "val" not in refs


def test_unknown_column_refused_at_flush(spark):
    with tempfile.TemporaryDirectory() as tmp:
        spark.dataSource.register(ClickHouseArrowDataSource)
        path = os.path.join(tmp, "s")
        with pytest.raises(Exception, match="not in the written"):
            (
                _df(spark, 10)
                .coalesce(1)
                .write.format("chbatch_arrow")
                .option("path", path)
                .option("bloomfilter", "nope")
                .mode("append")
                .save()
            )


# ------------------------------------------------------------- lifecycle


def test_commit_log_fold_and_parquet_checkpoint(spark):
    with tempfile.TemporaryDirectory() as tmp:
        path = _staged(
            spark, tmp, commitlog="2", commitlogformat="parquet"
        )
        # the interval-2 checkpoint has folded at least once
        m = _manifest_read(path)
        assert set(m["blooms"]) == set(m["files"])
        # force a full fold and re-read through the parquet checkpoint
        from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
            _manifest_lock,
        )

        with _manifest_lock(path):
            commit_log.fold_pending_locked(path)
        m2 = _manifest_read(path)
        assert m2.get("blooms") == m["blooms"]
        probe = _key(42)
        assert len(prune_files(path, "k", probe, probe)) == 1


def test_mutation_drops_rewritten_parts_refs(spark):
    with tempfile.TemporaryDirectory() as tmp:
        path = _staged(spark, tmp)
        before = set(_manifest_read(path)["blooms"])
        r = delete_where(
            spark,
            path,
            SCHEMA,
            "id < 2000",
            mode="rewrite",
            write_cdf=False,
        )
        assert r["n_rewritten"] > 0
        m = _manifest_read(path)
        live = set(m["files"])
        # every surviving ref names a live part; rewritten inputs lost
        # theirs; rewrite outputs have none (writer tiers own filters)
        assert set(m.get("blooms") or {}) == before & live
        # pruning still exact: a deleted key's part set may be stale-
        # free but the read must return nothing
        probe = _key(10)  # id 10 deleted
        got = (
            spark.read.format("chbatch_arrow")
            .schema(SCHEMA)
            .option("path", path)
            .load()
            .filter(F.col("k") == probe)
        )
        assert got.count() == 0


def test_optimize_keeps_old_refs_new_parts_unindexed(spark):
    with tempfile.TemporaryDirectory() as tmp:
        path = _staged(spark, tmp)
        optimize_sink(spark, path, SCHEMA, target_rows_per_file=10**6)
        m = _manifest_read(path)
        # compacted output is NOT bloom-indexed (no recompute) — the
        # probe keeps it conservatively and the lookup stays exact
        probe = _key(500)
        kept = prune_files(path, "k", probe, probe)
        assert kept == m["files"]
        got = (
            spark.read.format("chbatch_arrow")
            .schema(SCHEMA)
            .option("path", path)
            .load()
            .filter(F.col("k") == probe)
            .collect()
        )
        assert [r.id for r in got] == [500]


def test_clone_carries_and_absolutizes(spark):
    with tempfile.TemporaryDirectory() as tmp:
        src = _staged(spark, tmp)
        dst = os.path.join(tmp, "clone")
        clone_sink(src, dst)
        m = _manifest_read(dst)
        refs = [
            r for refs in m["blooms"].values() for r in refs.values()
        ]
        assert refs and all(os.path.isabs(r["sidecar"]) for r in refs)
        probe = _key(999)
        assert len(prune_files(dst, "k", probe, probe)) == 1


def test_vacuum_protects_live_and_reaps_orphans(spark):
    with tempfile.TemporaryDirectory() as tmp:
        path = _staged(spark, tmp)
        # plant an orphan sidecar; live sidecars must survive
        orphan = os.path.join(path, "bloom-deadbeef.bin")
        with open(orphan, "wb") as fh:
            fh.write(b"\x00" * 16)
        removed = vacuum_sink(path)
        assert "bloom-deadbeef.bin" in removed
        m = _manifest_read(path)
        for refs in m["blooms"].values():
            for r in refs.values():
                assert os.path.exists(os.path.join(path, r["sidecar"]))
        probe = _key(321)
        assert len(prune_files(path, "k", probe, probe)) == 1


def test_streaming_tier_writes_blooms(spark):
    with tempfile.TemporaryDirectory() as tmp:
        spark.dataSource.register(ClickHouseArrowDataSource)
        src = os.path.join(tmp, "in")
        _df(spark, 500).coalesce(1).write.parquet(src)
        path = os.path.join(tmp, "s")
        q = (
            spark.readStream.schema(SCHEMA)
            .parquet(src)
            .writeStream.format("chbatch_arrow")
            .option("path", path)
            .option("checkpointLocation", os.path.join(tmp, "ck"))
            .option("bloomfilter", "k")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        m = _manifest_read(path)
        assert m.get("blooms") and set(m["blooms"]) <= set(m["files"])
        probe = _key(17)
        kept = prune_files(path, "k", probe, probe)
        assert len(kept) < len(m["files"]) or len(m["files"]) == 1
