"""Sink maintenance: partition-scoped MERGE upsert and small-file
compaction over the install_date-partitioned parquet sink — the two
table-management operations an append-only warehouse needs once data
arrives continuously (the lakehouse MERGE INTO / OPTIMIZE pair,
re-expressed on plain partitioned parquet).

Both operations touch ONLY the partitions they must: dynamic partition
overwrite (``spark.sql.sources.partitionOverwriteMode=dynamic``)
replaces exactly the directories the written frame contains, so at
100 TB a merge of one day's batch rewrites one day's partitions, never
the table. Partition transparency is the contract that makes this
safe: install_date is derived from install_time, so a row's partition
is a pure function of its content and an upsert can never strand a
stale copy in another directory.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..schemas import sink_columns
from .parquet_sink import PARTITION_COL


@contextmanager
def _dynamic_overwrite(spark: SparkSession):
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


@contextmanager
def _max_records_per_file(spark: SparkSession, n: int):
    key = "spark.sql.files.maxRecordsPerFile"
    prev = spark.conf.get(key, "0")
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def merge_upsert(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    key: str = "appsflyer_id",
    order_col: str = "event_time",
) -> None:
    """Latest-wins MERGE of ``batch`` into the partitioned sink.

    Scale shape: (1) the batch's distinct install_dates — bounded by
    the batch's time span, a handful of values — select which sink
    partitions participate; (2) only those partitions are read back
    (directory-level pruning, no full-table scan); (3) one window keyed
    (install_date, key) picks the winner — highest ``order_col``, batch
    beating sink on ties; (4) dynamic partition overwrite rewrites
    exactly the participating directories. Untouched partitions are
    never read, never written.

    Identity is (install_date, key): install_date derives from
    install_time, so a "moved" row is a different record by definition
    — the invariant that keeps the merge partition-local at any scale.

    Implemented as the CDC merge with a constant op='u' column (an
    upsert IS a delete-free change feed) — ONE definition of the
    partition-scoping/read-back/window/overwrite machinery; the
    emptied-dir sweep is skipped because a delete-free merge can
    never empty a partition.
    """
    merge_cdc(
        spark,
        batch.withColumn("_op_const", F.lit("u")),
        path,
        key=key,
        order_col=order_col,
        op_col="_op_const",
        check_emptied=False,
    )


def compact_partitions(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 1_000_000,
    partitions: list | None = None,
    one_pass: bool = False,
    sort_by: list[str] | None = None,
) -> None:
    """Bin-pack each partition's small files into
    ceil(rows / target_rows_per_file) outputs (OPTIMIZE/rewrite).

    Continuous micro-batch appends leave partitions with one file per
    trigger; scans then pay per-file open/footer costs and lose
    row-group locality. ``partitions`` limits the pass to named
    install_dates (the incremental form — compact yesterday, not the
    table); None compacts everything. At production scale the target is
    bytes-based (~1 GB files); rows are the stand-in here because the
    testdata rowsize is uniform.

    Two rewrite strategies, picked by the partition-count/size regime:

    * ``one_pass=False`` (default): count rows per partition, then
      rewrite each named partition with an explicit
      ``repartition(n_files)`` — intra-partition parallel (a huge
      day's rewrite fans across the cluster), at the cost of one Spark
      job per date. The right shape for the incremental
      compact-yesterday cadence where the date list is a handful.
    * ``one_pass=True``: a single shuffle-by-partition-column write
      with ``spark.sql.files.maxRecordsPerFile`` rolling files at the
      target — ONE job and NO counting pass regardless of how many
      partitions are touched, because every date's rows land in
      exactly one task which rolls ceil(rows/target) files
      deterministically. The right shape for the many-small-partitions
      regime (the actual small-file pathology: thousands of dates ×
      dozens of trigger-sized files), where the per-date loop would
      schedule thousands of jobs. Trade-off: one task per date, so a
      single pathologically-large date does not fan out — use the
      default strategy for those.

    ``sort_by`` additionally clusters rows within each rewritten
    partition (OPTIMIZE ... ZORDER's 1-D little sibling on plain
    parquet): files are written key-ordered, so parquet footer
    min/max ranges for the sort key are pairwise DISJOINT across a
    partition's files and a key-predicate scan prunes whole files /
    row groups instead of reading everything
    (tests/test_sink_maintenance.py pins footer disjointness). In
    one-pass mode the sort rides the same single shuffle
    (sortWithinPartitions after the date repartition); in per-date
    mode each date is range-repartitioned by the sort key, so files
    are disjoint AND the rewrite stays intra-date parallel."""
    df = spark.read.parquet(path)
    if partitions is not None:
        df = df.filter(F.col(PARTITION_COL).isin(partitions))
    if one_pass:
        # PIN the shuffle partition count (r11, guide §2.2/§2.4): an
        # unpinned repartition(col) lets AQE coalesce the post-shuffle
        # partitions by byte size — on a small-file rewrite that folds
        # EVERY date into one task, which then creates all output
        # files serially (measured 5.2s -> 1.2s at sf0.1, 512 files).
        # A compaction rewrite wants its write parallelism to be the
        # session's configured width: at production scale each date is
        # large enough that coalescing would never fold dates anyway,
        # so the pin is a no-op there; rolls stay deterministic under
        # any N because hashing keeps each date whole in one task.
        n_write = int(spark.conf.get("spark.sql.shuffle.partitions"))
        shuffled = df.repartition(n_write, F.col(PARTITION_COL))
        if sort_by:
            shuffled = shuffled.sortWithinPartitions(
                PARTITION_COL, *sort_by
            )
        with (
            _dynamic_overwrite(spark),
            _max_records_per_file(spark, target_rows_per_file),
        ):
            (
                shuffled.write.mode("overwrite")
                .partitionBy(PARTITION_COL)
                .parquet(path)
            )
        return
    counts = {
        r[0]: r[1]
        for r in df.groupBy(PARTITION_COL).count().collect()
    }
    if not counts:
        return

    def _rewrite_one(item) -> None:
        pdate, n = item
        n_files = max(1, -(-n // target_rows_per_file))
        part = df.filter(F.col(PARTITION_COL) == pdate)
        if sort_by:
            part = part.repartitionByRange(
                n_files, *sort_by
            ).sortWithinPartitions(*sort_by)
        else:
            part = part.repartition(n_files)
        (
            part.write.mode("overwrite")
            .partitionBy(PARTITION_COL)
            .parquet(path)
        )

    with _dynamic_overwrite(spark):
        # per-date rewrites touch DISJOINT directories, so overlap a
        # few of them (opt guide §2.6): one date's commit/rename tail
        # no longer leaves the cluster idle while the next date waits.
        # 3 in flight fills the tail without fighting for executors.
        # NOTE the two scoping caveats (ADVICE r10): the
        # dynamic-overwrite conf is session-wide while the pool runs —
        # do not share the session with unrelated writers during a
        # compaction pass — and on failure the completed dates stay
        # rewritten (the same partial-completion contract as the old
        # serial loop; which dates completed is simply unordered). All
        # submitted rewrites are awaited and every failure is
        # surfaced, not just the first.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            futures = [
                pool.submit(_rewrite_one, item)
                for item in counts.items()
            ]
            errs = [
                e
                for f in futures
                if (e := f.exception()) is not None
            ]
        if errs:
            if len(errs) == 1:
                raise errs[0]
            raise RuntimeError(
                f"{len(errs)} of {len(futures)} per-date rewrites "
                f"failed; first: {errs[0]!r}"
            ) from errs[0]


def refresh_rollup_incremental(
    spark: SparkSession,
    sink_path: str,
    rollup_path: str,
    dates: list | None = None,
) -> None:
    """Incrementally maintain a per-install_date rollup of the sink —
    the continuous-aggregate / materialized-view refresh pattern.

    The rollup (rows, distinct keys, first/last install_time per date)
    is itself partitioned by install_date, so a refresh recomputes
    ONLY the named dates: read those sink partitions (directory
    pruning), re-aggregate, dynamically overwrite those rollup
    directories. ``dates=None`` bootstraps/refreshes everything.
    Because each date's aggregate depends on nothing outside its own
    partition, incremental refresh is EXACTLY equal to a full
    recompute restricted to those dates — the invariant that makes
    day-scoped refresh safe after any append/merge/compaction that
    touched those days. At 100 TB the daily cadence is: ingest a day,
    merge it, refresh that day's rollup — the full-table recompute
    never runs."""
    df = spark.read.parquet(sink_path)
    if dates is not None:
        df = df.filter(F.col(PARTITION_COL).isin(dates))
    rollup = df.groupBy(PARTITION_COL).agg(
        F.count("*").alias("n_rows"),
        F.count_distinct(F.col("appsflyer_id")).alias("n_keys"),
        F.min("install_time").alias("first_install"),
        F.max("install_time").alias("last_install"),
    )
    with _dynamic_overwrite(spark):
        (
            rollup.write.mode("overwrite")
            .partitionBy(PARTITION_COL)
            .parquet(rollup_path)
        )


def merge_cdc(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    key: str = "appsflyer_id",
    order_col: str = "event_time",
    op_col: str = "op",
    check_emptied: bool = True,
) -> None:
    """CDC MERGE with deletes: ``batch`` carries an ``op_col`` of
    ``'u'`` (upsert) or ``'d'`` (delete). Per (install_date, key) the
    highest-``order_col`` change wins (batch beats sink on ties); a
    winning delete removes the row. Same partition-scoped shape as
    ``merge_upsert`` — only the batch's install_dates are read back and
    rewritten.

    The one extra obligation deletes create: a partition whose LAST
    rows are deleted produces zero output rows, and dynamic partition
    overwrite only replaces directories the written frame contains —
    writing nothing would leave the stale directory in place. Those
    fully-emptied partitions are removed explicitly (pinned in
    tests/test_sink_maintenance.py). At 100 TB this stays metadata
    work: the emptied-date list is bounded by the batch's time span."""
    dated = batch.select(*sink_columns(), op_col).withColumn(
        PARTITION_COL, F.to_date("install_time")
    )
    dates = [r[0] for r in dated.select(PARTITION_COL).distinct().collect()]
    if not dates:
        return
    try:
        existing = (
            spark.read.parquet(path)
            .filter(F.col(PARTITION_COL).isin(dates))
            .select(*sink_columns(), PARTITION_COL)
        )
    except AnalysisException:  # first merge: sink does not exist yet
        existing = None

    tagged_new = dated.withColumn("_src", F.lit(1))
    merged_src = (
        tagged_new
        if existing is None
        else existing.withColumn(op_col, F.lit("u"))
        .withColumn("_src", F.lit(0))
        .unionByName(tagged_new)
    )
    w = Window.partitionBy(PARTITION_COL, key).orderBy(
        F.col(order_col).desc_nulls_last(), F.col("_src").desc()
    )
    winners = (
        merged_src.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        # null-safe: a NULL op (out-of-contract upstream data) must be
        # treated as an upsert, not silently deleted — `op != 'd'` is
        # NULL for NULL ops and the filter would drop the winning row,
        # vanishing the key from the sink with no error
        .filter(~F.col(op_col).eqNullSafe("d"))
        .select(*sink_columns(), PARTITION_COL)
    )
    # the survived-partitions collect is NOT the double-compute it
    # looks like: Catalyst column-prunes its plan to the 5 columns the
    # window actually needs (key, order, op, _src, partition), so it
    # is far cheaper than the full-width write pass. Persisting
    # winners to "share" the work was measured 2-4x SLOWER at sf0.1
    # (9.8-22 s vs ~5 s): the cache forces full-49-column
    # materialization into block storage plus a cache read, where the
    # pruned re-compute is nearly free.
    survived = (
        {r[0] for r in winners.select(PARTITION_COL).distinct().collect()}
        if check_emptied
        else set(dates)
    )
    with _dynamic_overwrite(spark):
        winners.write.mode("overwrite").partitionBy(PARTITION_COL).parquet(
            path
        )
    # remove directories the delete-only winners emptied entirely
    emptied = [d for d in dates if d not in survived]
    if emptied:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        for d in emptied:
            p = jvm.org.apache.hadoop.fs.Path(f"{path}/{PARTITION_COL}={d}")
            fs = p.getFileSystem(conf)
            if fs.exists(p):
                fs.delete(p, True)


def expire_partitions(
    spark: SparkSession, path: str, before_date: str
) -> list[str]:
    """Retention/TTL: physically remove every partition directory whose
    install_date is strictly BEFORE ``before_date``; returns the expired
    dates. Partition-dir deletion is the only retention affordable at
    100 TB — row-level deletes rewrite data, directory drops are
    metadata-speed and leave every surviving partition byte-identical
    (the same property merge_cdc relies on for emptied partitions).
    Listing comes from the filesystem, not a scan: expiry must not cost
    a table read. Hadoop FileSystem API, not pathlib/shutil — the same
    machinery merge_cdc's emptied-partition removal uses — so retention
    works on s3a://, hdfs://, and every other store the sink can live
    on (a local-only glob would silently no-op on exactly the
    deployments the 100 TB framing targets)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(conf)
    expired: list[str] = []
    if not fs.exists(root):
        return expired
    prefix = f"{PARTITION_COL}="
    for status in fs.listStatus(root):
        if not status.isDirectory():
            continue
        name = status.getPath().getName()
        if not name.startswith(prefix):
            continue
        pdate = name.split("=", 1)[1]
        if pdate < before_date:
            fs.delete(status.getPath(), True)
            expired.append(pdate)
    return sorted(expired)
