"""READ side of the manifest sink ("chbatch"/"chbatch_arrow") as a
PySpark 4 Python Data Source — batch reader with Catalyst filter
pushdown feeding manifest-stats file skipping, and a STREAMING TAIL
reader over the snapshot log (the Delta/Iceberg "table as a stream
source" affordance on the single-manifest protocol).

Batch: ``spark.read.format("chbatch").schema(s).option("path", p)`` —
``partitions()`` is one InputPartition per committed part, and
``pushFilters`` captures the range/equality/null predicates Catalyst
offers so the part list is PRUNED against the manifest's per-file
stats before Spark plans a single task. All filters are returned to
Spark for re-evaluation: stats pruning is advisory (IO avoidance),
row-level exactness stays the engine's job — the same split
``read_committed_pruned`` makes explicit.

Streaming: ``spark.readStream.format("chbatch")`` tails the commit
log. Offsets are manifest versions ({"version": N}); each micro-batch
reads exactly the files the APPEND commits in (start, end] named —
REPLACE (compact) commits are skipped because their files are layout
rewrites of rows already emitted (Delta's streaming source likewise
refuses/ignores non-append commits). A fold (truncate_history) that
swallowed versions past the stream's offset, or a manifest reset
beneath the stream, fails loudly instead of double-emitting.

Scale: the driver touches only manifest metadata (filenames, versions,
stats); every part is read executor-side — parquet parts as Arrow
RecordBatches (zero-copy into Spark), JSONL parts line-parsed with
schema-driven converters (the exact inverse of the writer's
``_json_cell`` encoding, so a sink round-trip is byte-faithful).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
)


def _part_converters(schema) -> list[tuple[str, str]]:
    """(name, typeName) per top-level field — the picklable spec the
    executor-side JSONL parser uses to undo ``_json_cell``."""
    return [(f.name, f.dataType.typeName()) for f in schema.fields]


def _from_json_cell(kind: str, v):
    if v is None:
        return None
    if kind in ("timestamp", "timestamp_ntz"):
        import datetime

        return datetime.datetime.fromisoformat(v)
    if kind == "date":
        import datetime

        return datetime.date.fromisoformat(v)
    if kind == "decimal":
        import decimal

        return decimal.Decimal(v)
    if kind == "binary":
        return bytes.fromhex(v)
    if kind in ("double", "float"):
        return float(v)
    return v


def _resolve_physical(
    avail: set, convs: list[tuple[str, str]], aliases, dead=()
) -> list[tuple[str, str | None, str]]:
    """(logical, physical-or-None, typeName) per wanted column: the
    physical name is the logical name when the part carries it, else
    the newest alias present (a part written before a RENAME carries
    an older name), else None (a part written before the column
    existed — NULL-fill). ``dead`` lists physical names a DROP COLUMN
    tombstoned for this part (column mapping): they are removed from
    the available set BEFORE resolution, so a re-added same-named
    column NULL-fills here instead of leaking the dead bytes."""
    if dead:
        avail = avail - set(dead)
    amap = dict(aliases or ())
    out = []
    for c, kind in convs:
        phys = c if c in avail else next(
            (a for a in amap.get(c, ()) if a in avail), None
        )
        out.append((c, phys, kind))
    return out


def _dv_spec(path: str, val) -> tuple:
    """Picklable per-part deletion spec for an InputPartition: inline
    positions travel as a tuple; a SIDECAR vector travels as its
    ('sidecar', fullpath, n) reference and is read executor-side
    (the sidecar lives in the table directory = shared storage), so
    a million-position vector never rides the task closure."""
    if isinstance(val, list) or isinstance(val, tuple):
        return tuple(int(i) for i in val)
    return ("sidecar", os.path.join(path, val["sidecar"]), int(val["n"]))


# Spark typeName -> pyarrow type's str() name (note arrow prints
# float32/float64 as "float"/"double")
_ARROW_OF = {
    "byte": "int8",
    "short": "int16",
    "integer": "int32",
    "long": "int64",
    "float": "float",
    "double": "double",
}
_INT_ORDER = ["int8", "int16", "int32", "int64"]
_FLOAT_ORDER = ["float", "double"]
_ARROW_CTOR = {
    "int8": "int8",
    "int16": "int16",
    "int32": "int32",
    "int64": "int64",
    "float": "float32",
    "double": "float64",
}


def _null_array(kind: str, n: int):
    """A typed all-null Arrow array for one MISSING column of a
    pre-ADD part (VERDICT r9 task 5) — the NULL backfill stays on
    the vectorized batch path instead of dropping the whole part to
    the per-row Python path (after an ADD COLUMN, every historical
    part takes this branch until OPTIMIZE rewrites it: at 100 TB
    that IS the hot path, not a rare case). Returns None for a type
    this mapping can't express — the caller then falls back to the
    row path, which handles anything."""
    import pyarrow as pa

    simple = {
        "byte": pa.int8(),
        "short": pa.int16(),
        "integer": pa.int32(),
        "long": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
        "string": pa.string(),
        "boolean": pa.bool_(),
        "binary": pa.binary(),
        "date": pa.date32(),
        "timestamp": pa.timestamp("us", tz="UTC"),
        "timestamp_ntz": pa.timestamp("us"),
    }
    t = simple.get(kind)
    if t is None and kind.startswith("decimal("):
        try:
            p, s = kind[8:-1].split(",")
            t = pa.decimal128(int(p), int(s))
        except (ValueError, pa.ArrowInvalid):
            return None
    if t is None:
        return None
    return pa.nulls(n, t)


def _widen_table(table, convs, fullpath: str):
    """TYPE-WIDENING schema evolution at read time (the only
    affordable evolution at 100 TB, like the additive NULL-fill
    above): a part written before a column was widened carries the
    narrower physical type — int8/16/32 under a long column,
    float32 under a double — and is CAST per part on the Arrow path
    (zero-copy for clean parts is unaffected; only mismatched columns
    pay). NARROWING is refused loudly: silently truncating an int64
    part under an int32 reader is data corruption, not evolution."""
    import pyarrow as pa

    target_fields = []
    changed = False
    for i, (name, kind) in enumerate(convs):
        cur = table.schema.field(i).type
        want_name = _ARROW_OF.get(kind)
        if want_name is None or str(cur) == want_name:
            target_fields.append(table.schema.field(i))
            continue
        cur_name = str(cur)
        fam = (
            _INT_ORDER
            if want_name in _INT_ORDER
            else _FLOAT_ORDER
            if want_name in _FLOAT_ORDER
            else None
        )
        if fam and cur_name in fam:
            if fam.index(cur_name) < fam.index(want_name):
                target_fields.append(
                    pa.field(name, getattr(pa, _ARROW_CTOR[want_name])())
                )
                changed = True
                continue
            raise ValueError(
                f"sink part {os.path.basename(fullpath)}: column "
                f"{name!r} is physically {cur_name} but the reader "
                f"asks for {want_name} — NARROWING is refused (it "
                "would silently truncate); widen the reader schema "
                "or rewrite the part"
            )
        raise ValueError(
            f"sink part {os.path.basename(fullpath)}: column "
            f"{name!r} is physically {cur_name}, incompatible with "
            f"the reader's {kind} — only int->wider-int and "
            "float->double widen at read time"
        )
    if not changed:
        return table
    return table.cast(pa.schema(target_fields))


def _resolve_dv_spec(deleted):
    """Executor-side: concrete positions from a deletion spec."""
    if len(deleted) == 3 and deleted[0] == "sidecar":
        import numpy as np

        _, full, n = deleted
        arr = np.fromfile(full, dtype="<i8")
        if len(arr) != n:
            raise ValueError(
                f"dv sidecar {full}: expected {n} positions, found "
                f"{len(arr)} — truncated or clobbered"
            )
        return arr
    return deleted


def _read_part(
    fullpath: str,
    convs: list[tuple[str, str]],
    deleted: tuple = (),
    aliases: tuple = (),
    dead: tuple = (),
) -> Iterator:
    """Executor-side read of ONE committed part. Parts are
    self-describing (parquet footer / JSONL keys), so ADDITIVE schema
    evolution reconciles at read time: a part written before a column
    existed surfaces NULL for it — same contract as the parquet sink's
    mergeSchema read, no rewrite of history (the only affordable
    evolution at 100 TB). ``aliases`` extends the same resolution to
    RENAMED columns: a pre-rename part's physical name translates to
    the logical name at read time (column mapping — zero rewrite).

    ``deleted`` is the part's deletion vector (sorted row positions a
    merge-on-read DELETE removed): parquet batches are masked
    positionally with one vectorized boolean filter per RecordBatch —
    the Arrow zero-copy path is kept for clean parts and the masked
    path touches only the files a DV names."""
    deleted = _resolve_dv_spec(deleted)
    if fullpath.endswith(".parquet"):
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(fullpath)
        avail = set(pf.schema_arrow.names)
        resolved = _resolve_physical(avail, convs, aliases, dead)
        want = [c for c, _ in convs]
        missing = [(c, k) for c, phys, k in resolved if phys is None]
        table = None
        if not missing:
            table = _widen_table(
                pq.read_table(
                    fullpath, columns=[p for _, p, _ in resolved]
                ).rename_columns(want),
                convs,
                fullpath,
            )
        elif all(
            _null_array(k, 0) is not None for _, k in missing
        ):
            # ADDITIVE evolution, vectorized (VERDICT r9 task 5): a
            # part written before a column existed backfills typed
            # NULL arrays Arrow-side and stays on the batch path —
            # after ADD COLUMN this is every historical part, so the
            # per-row fallback below would be the table's hot path
            import pyarrow as pa

            present = [
                (c, phys, k) for c, phys, k in resolved if phys is not None
            ]
            t = pq.read_table(
                fullpath, columns=[p for _, p, _ in present]
            ).rename_columns([c for c, _, _ in present])
            t = _widen_table(
                t, [(c, k) for c, _, k in present], fullpath
            )
            table = pa.table(
                {
                    c: (
                        t.column(c)
                        if phys is not None
                        else _null_array(k, t.num_rows)
                    )
                    for c, phys, k in resolved
                }
            )
        if table is not None:
            batches = table.to_batches()
            if not len(deleted):
                yield from batches
                return
            import numpy as np
            import pyarrow as pa

            dv = np.asarray(deleted, dtype=np.int64)
            offset = 0
            for b in batches:
                n = b.num_rows
                local = dv[(dv >= offset) & (dv < offset + n)] - offset
                if len(local):
                    mask = np.ones(n, dtype=bool)
                    mask[local] = False
                    b = b.filter(pa.array(mask))
                if b.num_rows:
                    yield b
                offset += n
            return
        # pre-evolution part with a missing column whose type the
        # Arrow backfill can't express (nested/exotic) — the per-row
        # fallback; everything expressible stays vectorized above.
        # The same widen/refuse rules apply to the columns present
        # (python scalars widen naturally once the check passes)
        present = [
            (c, phys) for c, phys, _ in resolved if phys is not None
        ]
        table = pq.read_table(
            fullpath, columns=[p for _, p in present]
        ).rename_columns([c for c, _ in present])
        table = _widen_table(
            table,
            [(c, k) for c, phys, k in resolved if phys is not None],
            fullpath,
        )
        cols = {
            c: table.column(c).to_pylist() for c, _ in present
        }
        dead = set(deleted)
        for i in range(table.num_rows):
            if i in dead:
                continue
            yield tuple(
                cols[c][i] if c in cols else None for c in want
            )
        return
    import json as _json

    amap = dict(aliases or ())
    deadset = set(dead or ())

    def _cell(rec, c, k):
        v = rec.get(c) if c not in deadset else None
        if v is None and (c not in rec or c in deadset):
            for a in amap.get(c, ()):
                if a in rec and a not in deadset:
                    v = rec[a]
                    break
        return _from_json_cell(k, v)

    with open(fullpath) as fh:
        for line in fh:
            if not line.strip():
                continue
            rec = _json.loads(line)
            yield tuple(_cell(rec, c, k) for c, k in convs)


def _read_part_changes(
    fullpath: str,
    convs: list[tuple[str, str]],
    positions: tuple[int, ...],
    kind: str,
    version: int,
    aliases: tuple = (),
    dead: tuple = (),
) -> Iterator:
    """Change-feed read of one part: 'insert' emits every row
    (an append commit's own file), 'delete' emits ONLY the rows at
    ``positions`` (a merge-on-read delete's recorded row indexes) —
    commit-bounded IO either way. Each row/batch is tagged with
    (_change_type, _commit_version)."""
    if kind == "cdf":
        # a materialized sidecar: data columns + its own _change_type
        import pyarrow as pa
        import pyarrow.parquet as pq

        avail = set(pq.ParquetFile(fullpath).schema_arrow.names)
        resolved = _resolve_physical(avail, convs, aliases, dead)
        gone = [c for c, p, _ in resolved if p is None]
        if gone:
            raise ValueError(
                f"change feed: sidecar {os.path.basename(fullpath)} "
                f"carries no physical column for {gone} under any "
                "alias — read this commit via the batch table_changes "
                "API"
            )
        table = _widen_table(
            pq.read_table(
                fullpath,
                columns=[*[p for _, p, _ in resolved], "_change_type"],
            ).rename_columns(
                [*[c for c, _, _ in resolved], "_change_type"]
            ),
            [*convs, ("_change_type", "string")],
            fullpath,
        )
        n = table.num_rows
        table = table.append_column(
            "_commit_version", pa.array([version] * n, pa.int64())
        )
        yield from table.to_batches()
        return
    if kind == "insert":
        import pyarrow as pa

        for item in _read_part(
            fullpath, convs, aliases=aliases, dead=dead
        ):
            if isinstance(item, pa.RecordBatch):
                n = item.num_rows
                item = item.append_column(
                    "_change_type", pa.array(["insert"] * n, pa.string())
                ).append_column(
                    "_commit_version",
                    pa.array([version] * n, pa.int64()),
                )
                yield item
            else:
                yield (*item, "insert", version)
        return
    # delete: select exactly the recorded positions (a sidecar spec
    # resolves here, executor-side)
    import pyarrow as pa
    import pyarrow.parquet as pq

    positions = _resolve_dv_spec(positions)
    want = [c for c, _ in convs]
    avail = set(pq.ParquetFile(fullpath).schema_arrow.names)
    resolved = _resolve_physical(avail, convs, aliases, dead)
    gone = [c for c, p, _ in resolved if p is None]
    if gone:
        raise ValueError(
            f"change feed: part {os.path.basename(fullpath)} carries "
            f"no physical column for {gone} under any alias — emit "
            "this commit via the batch table_changes API"
        )
    table = _widen_table(
        pq.read_table(
            fullpath, columns=[p for _, p, _ in resolved]
        ).rename_columns(want),
        convs,
        fullpath,
    )
    idx = pa.array(sorted(int(i) for i in positions), pa.int64())
    hit = table.take(idx)
    n = hit.num_rows
    hit = hit.append_column(
        "_change_type", pa.array(["delete"] * n, pa.string())
    ).append_column(
        "_commit_version", pa.array([version] * n, pa.int64())
    )
    yield from hit.to_batches()


def _file_survives(st: dict | None, flt) -> bool:
    """Can a file with stats ``st`` contain a row matching ``flt``?
    Unknown stats => True (skipping is advisory, never a filter)."""
    if st is None:
        return True
    mn, mx, nulls = st["min"], st["max"], st.get("nulls", 0)
    if isinstance(flt, IsNull):
        return nulls > 0
    if isinstance(flt, IsNotNull):
        return mn is not None
    # range/equality predicates never match NULL; an all-null file
    # (min is None with stats present) cannot satisfy them
    if mn is None:
        return False
    from ..sinks.datasource_sink import _STAT_UNSAFE, _stat_cell

    if isinstance(flt, In):
        vs = [_stat_cell(v) for v in flt.value]
        if any(v is _STAT_UNSAFE for v in vs):
            return True  # NaN literal: leave it to Spark
        # the file survives iff ANY listed value could be inside
        return any(
            v is not None and mn <= v <= mx for v in vs
        ) or all(v is None for v in vs)
    v = _stat_cell(flt.value)
    if v is None or v is _STAT_UNSAFE:
        return True  # NULL/NaN literal: leave it to Spark
    if isinstance(flt, EqualTo):
        return mn <= v <= mx
    if isinstance(flt, GreaterThan):
        return mx > v
    if isinstance(flt, GreaterThanOrEqual):
        return mx >= v
    if isinstance(flt, LessThan):
        return mn < v
    if isinstance(flt, LessThanOrEqual):
        return mn <= v
    return True


def _tuple_survives(v, flt) -> bool:
    """Exact filter evaluation against a stored partition VALUE — the
    by-value tier that runs ahead of min/max stats (VERDICT r8 task
    1). Unlike stats this is not conservative: the part holds exactly
    one value for the column, so equality/range decide outright."""
    if isinstance(flt, IsNull):
        return v is None
    if isinstance(flt, IsNotNull):
        return v is not None
    if v is None:
        return False  # range/equality never match NULL
    from ..sinks.datasource_sink import _STAT_UNSAFE, _stat_cell

    if isinstance(flt, In):
        vs = [_stat_cell(b) for b in flt.value]
        if any(b is _STAT_UNSAFE for b in vs):
            return True  # NaN literal: leave it to Spark
        return v in vs
    b = _stat_cell(flt.value)
    if b is None or b is _STAT_UNSAFE:
        return True  # NULL/NaN literal: leave it to Spark
    if isinstance(flt, EqualTo):
        return v == b
    if isinstance(flt, GreaterThan):
        return v > b
    if isinstance(flt, GreaterThanOrEqual):
        return v >= b
    if isinstance(flt, LessThan):
        return v < b
    if isinstance(flt, LessThanOrEqual):
        return v <= b
    return True


def _prune_names(
    names: list[str],
    stats: dict,
    filters: list,
    aliases: tuple = (),
    pcols: tuple = (),
    partitions: dict | None = None,
    blooms: dict | None = None,
    path: str | None = None,
) -> list[str]:
    amap = dict(aliases or ())
    partitions = partitions or {}
    blooms = blooms or {}
    keep = []
    for name in names:
        fstats = stats.get(name) or {}
        tup = partitions.get(name)
        brefs = blooms.get(name) or {}
        ok = True
        for flt in filters:
            col = flt.attribute[0]
            # partition tuple first: exact by-value decision,
            # independent of stats degeneration under interleaved
            # appends. Tuples resolve BY NAME (current-spec lists and
            # any-generation dicts alike — spec evolution); a tuple
            # lacking the column falls through to stats.
            if tup is not None:
                from ..sinks.datasource_sink import (
                    _NO_VALUE,
                    _part_value,
                )

                v = next(
                    (
                        pv
                        for c in (col, *amap.get(col, ()))
                        if (pv := _part_value(tup, pcols, c))
                        is not _NO_VALUE
                    ),
                    _NO_VALUE,
                )
                if v is not _NO_VALUE:
                    if not _tuple_survives(v, flt):
                        ok = False
                        break
                    continue
            # a pre-rename part's stats live under its physical name
            st = fstats.get(col)
            if st is None:
                st = next(
                    (
                        fstats[a]
                        for a in amap.get(col, ())
                        if a in fstats
                    ),
                    None,
                )
            if not _file_survives(st, flt):
                ok = False
                break
            # bloom tier (VERDICT r9 task 1): equality/IN probes
            # against the part's stored bitmap prune exactly where
            # min/max keep everything (high-cardinality point
            # lookups). Runs AFTER the free checks so sidecar IO is
            # paid only for parts the range layers kept.
            if brefs and path is not None and isinstance(
                flt, (EqualTo, In)
            ):
                ref = brefs.get(col) or next(
                    (
                        brefs[a]
                        for a in amap.get(col, ())
                        if a in brefs
                    ),
                    None,
                )
                if ref is not None:
                    from ..sinks.bloom_index import (
                        might_contain,
                        might_contain_any,
                    )

                    hit = (
                        might_contain_any(path, ref, flt.value)
                        if isinstance(flt, In)
                        else might_contain(path, ref, flt.value)
                    )
                    if not hit:
                        ok = False
                        break
        if ok:
            keep.append(name)
    return keep


_PUSHABLE = (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    LessThan,
    LessThanOrEqual,
    In,
    IsNull,
    IsNotNull,
)


# -- multi-part reader tasks (opt guide §2.2/§6) ----------------------------
# One InputPartition per committed part plans one Spark task — and one
# Python-worker round trip (~10-30 ms) — per part. On small-part sinks
# (a stream of trigger-sized commits, a batch writer flushing every
# ``batchsize`` rows) the per-task overhead dwarfs the read itself. Pack
# parts into read splits exactly the way Spark's native FilePartition
# packing does: sort by size descending, greedy-fill against a
# maxPartitionBytes-style target with an openCostInBytes charge per
# file. Tiny parts share one task; a production-sized part still gets
# its own task, so scan parallelism at scale is unchanged.
#
# JSONL and parquet parts never share a split: a parquet part yields
# Arrow RecordBatches while a JSONL part yields tuples, and the Python
# DS worker commits to one framing per task from the first yielded
# element.
_PACK_TARGET_BYTES = 128 * 1024 * 1024  # spark.sql.files.maxPartitionBytes
_PACK_OPEN_COST = 4 * 1024 * 1024  # spark.sql.files.openCostInBytes


def _normalize_batches(items: Iterator, spark_schema) -> Iterator:
    """Cast Arrow RecordBatches to ONE canonical schema (the reader
    schema's Arrow form). A packed task reads several parts, and
    Spark's Arrow output writer requires every batch in a task to
    carry an identical schema — but parts of different generations
    legitimately differ (typed-NULL backfill vs physical column,
    nullability flags, timestamp tz spelling). Matching batches pass
    through untouched; tz-only and nullability-only casts are
    metadata-speed. Tuple-yield (JSONL) items pass through unchanged —
    a packed task never mixes framings."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    target = None
    for item in items:
        if not isinstance(item, pa.RecordBatch):
            yield item
            continue
        if target is None:
            target = to_arrow_schema(spark_schema)
        yield item if item.schema.equals(target) else item.cast(target)


def _pack_specs(
    specs: Sequence[tuple],
    target: int = _PACK_TARGET_BYTES,
    open_cost: int = _PACK_OPEN_COST,
) -> list[tuple]:
    """Pack per-part read specs (element 0 = full file path) into task
    groups; returns a list of spec-tuples, each one InputPartition
    value. A part whose size cannot be stat-ed is charged a full
    target so it is isolated rather than mis-packed."""
    groups: list[tuple] = []
    by_kind: dict[str, list] = {}
    for s in specs:
        kind = "pq" if s[0].endswith(".parquet") else "row"
        by_kind.setdefault(kind, []).append(s)
    for kind_specs in by_kind.values():
        sized = []
        for s in kind_specs:
            try:
                sz = os.path.getsize(s[0])
            except OSError:
                sz = target
            sized.append((sz, s))
        sized.sort(key=lambda t: -t[0])
        cur: list = []
        cur_bytes = 0
        for sz, s in sized:
            charged = sz + open_cost
            if cur and cur_bytes + charged > target:
                groups.append(tuple(cur))
                cur, cur_bytes = [], 0
            cur.append(s)
            cur_bytes += charged
        if cur:
            groups.append(tuple(cur))
    return groups


class ManifestBatchReader(DataSourceReader):
    """Batch reader over the manifest's CURRENT (or as-of) snapshot,
    with stats-based file skipping driven by Catalyst's own pushed
    filters."""

    def __init__(self, options, schema):
        self._path = options["path"]
        v = options.get("version")
        ts = options.get("timestamp")
        if v is not None and ts is not None:
            raise ValueError(
                "chbatch read: pass version OR timestamp, not both"
            )
        if ts is not None:
            # Delta's timestampAsOf on the reader: resolve the newest
            # commit at or before the instant (epoch seconds or ISO)
            from ..sinks.datasource_sink import (
                _as_epoch,
                _version_for_timestamp,
            )

            try:
                ts_val = float(ts)
            except ValueError:
                ts_val = _as_epoch(ts)
            self._version = _version_for_timestamp(self._path, ts_val)
        else:
            self._version = int(v) if v is not None else None
        self._schema = schema
        self._convs = _part_converters(schema)
        self._filters: list = []
        # explicit by-value partition subscription:
        # .option("partitionfilter", '{"col": value}') — complements
        # pushFilters (exact, works for IN-lists via a JSON array,
        # and is the only pruning channel the STREAM tail has, since
        # Python streaming readers get no pushed filters)
        pf = options.get("partitionfilter")
        self._partition_filter = json.loads(pf) if pf else None

    def pushFilters(self, filters):
        for flt in filters:
            # only simple top-level-column predicates inform pruning;
            # everything is handed back to Spark either way, so a
            # filter we keep is an IO hint, never a correctness gate
            if isinstance(flt, _PUSHABLE) and len(flt.attribute) == 1:
                self._filters.append(flt)
        return filters

    def partitions(self) -> Sequence[InputPartition]:
        from ..sinks.datasource_sink import (
            _manifest_files,
            _manifest_read,
            dv_for_version,
        )

        # full resolved paths (foreign shallow-clone references come
        # back absolute); stats/dv stay keyed by part BASENAME
        fulls = list(_manifest_files(self._path, self._version))
        manifest = _manifest_read(self._path)
        aliases = tuple(
            (k, tuple(v))
            for k, v in sorted(
                (manifest.get("column_aliases") or {}).items()
            )
        )
        pcols = tuple(manifest.get("partition_cols") or ())
        partitions = manifest.get("partitions") or {}
        if self._partition_filter:
            # by-value subscription: only a provable NON-match drops
            # a part; untupled parts and old-spec tuples that cannot
            # decide (tri-state None) are kept conservatively (the
            # residual row filter is still the caller's job, as with
            # stats)
            from ..sinks.datasource_sink import _tuple_matches

            fulls = [
                p
                for p in fulls
                if (tup := partitions.get(os.path.basename(p))) is None
                or _tuple_matches(
                    tup, list(pcols), self._partition_filter
                )
                is not False
            ]
        if self._filters:
            stats = manifest.get("stats") or {}
            keep = set(
                _prune_names(
                    [os.path.basename(p) for p in fulls],
                    stats,
                    self._filters,
                    aliases,
                    pcols,
                    partitions,
                    manifest.get("blooms"),
                    self._path,
                )
            )
            fulls = [p for p in fulls if os.path.basename(p) in keep]
        # merge-on-read deletion vectors, the column-alias map, and
        # any DROP COLUMN tombstones ride INSIDE each part's
        # InputPartition (bounded metadata), so executors mask and
        # name-resolve their own file with no extra coordination
        dv = dv_for_version(manifest, self._version, self._path)
        dsets = [
            (set(d["parts"]), tuple(d["physical"]))
            for d in (manifest.get("column_drops") or ())
            if self._version is None or d["v"] <= self._version
        ]

        def dead_for(b: str) -> tuple:
            if not dsets:
                return ()
            return tuple(
                n for s, ph in dsets if b in s for n in ph
            )

        specs = [
            (
                p,
                _dv_spec(
                    self._path, dv.get(os.path.basename(p), ())
                ),
                aliases,
                dead_for(os.path.basename(p)),
            )
            for p in fulls
        ]
        return [InputPartition(g) for g in _pack_specs(specs)]

    def read(self, partition: InputPartition) -> Iterator:
        if partition is None:  # Spark's stand-in when partitions()==[]
            return

        def _gen():
            for fullpath, deleted, aliases, dead in partition.value:
                yield from _read_part(
                    fullpath, self._convs, deleted, aliases, dead
                )

        if len(partition.value) == 1:  # one part: schema self-consistent
            yield from _gen()
            return
        yield from _normalize_batches(_gen(), self._schema)


class ManifestTailReader(DataSourceStreamReader):
    """Streaming tail over the snapshot log: each micro-batch is the
    files the APPEND commits in (start, end] added.

    Known bound: ``latestOffset`` always returns the newest manifest
    version, so one micro-batch consumes ALL pending commits — there
    is no maxOffsetsPerTrigger-style rate limit. The Python stream
    reader protocol gives ``latestOffset()`` no view of the
    checkpointed start offset, so any reader-side limit would either
    leave the first batch of a restart unbounded or mis-signal an
    offset regression; Spark's AvailableNow fallback for Python
    sources ("single batch execution") has the same
    consume-everything shape. Backfilling a sink with a very deep
    commit log is therefore one large batch today — bound it
    upstream with truncate_history, or tail from a fresh checkpoint
    after a batch backfill read."""

    def __init__(self, options, schema):
        self._path = options["path"]
        # Delta's startingVersion: where a FRESH stream (no checkpoint)
        # begins. Default -1 = full backfill (every retained commit);
        # "latest" = only commits made after the stream starts; an
        # integer v = emit from commit v onward. Ignored on restart —
        # the checkpointed offset wins, as it must.
        sv = options.get("startingversion", "-1")
        self._starting = sv.strip().lower()
        # CHANGE FEED mode (Delta's readChangeFeed): micro-batches are
        # per-commit CHANGE rows — appends as inserts, merge-on-read
        # deletes as delete rows read from exactly the recorded
        # positions, compaction skipped without IO. The reader schema
        # must end with (_change_type string, _commit_version bigint).
        # Rewrite-style commits (CoW delete/update, merge, restore)
        # FAIL the stream loudly: reconstructing their change rows
        # takes a snapshot diff, which a stream partition cannot run —
        # production materializes CDF sidecar files at commit time
        # instead (same protocol, earlier materialization); offline,
        # feed those commits from the batch table_changes API.
        self._cdf = options.get("changefeed", "false").lower() == "true"
        # Delta's ignoreChanges: opt-in for the PLAIN tail to skip
        # data-changing commits (merge/update/delete) instead of
        # failing. Default false — see partitions() for the contract.
        self._ignore_changes = (
            options.get("ignorechanges", "false").lower() == "true"
        )
        # by-value PARTITION subscription for the tail (VERDICT r8
        # task 1): .option("partitionfilter", '{"col": value}') keeps
        # only appended parts whose recorded tuple matches — the
        # streaming twin of batch partition pruning (Python stream
        # readers get no pushed filters, so this option is the tail's
        # only pruning channel). Untupled parts are kept
        # conservatively; cdf/dv change rows always pass through.
        pf = options.get("partitionfilter")
        self._partition_filter = json.loads(pf) if pf else None
        self._schema = schema
        if self._cdf:
            names = [f.name for f in schema.fields]
            if names[-2:] != ["_change_type", "_commit_version"]:
                raise ValueError(
                    "chbatch tail changefeed=true: the schema must end "
                    "with (_change_type string, _commit_version bigint)"
                    f", got {names}"
                )
            self._convs = _part_converters(schema)[:-2]
        else:
            self._convs = _part_converters(schema)

    # -- offset protocol ---------------------------------------------------
    def initialOffset(self) -> dict:
        if self._starting == "latest":
            history = self._history()
            return {"version": history[-1]["v"] if history else -1}
        try:
            v = int(self._starting)
        except ValueError as exc:
            raise ValueError(
                f"chbatch tail: startingVersion must be an integer or "
                f"'latest', got {self._starting!r}"
            ) from exc
        # offsets are exclusive lower bounds: start AT commit v means
        # the initial offset is v-1
        return {"version": max(v - 1, -1)}

    def _history(self) -> list[dict]:
        from ..sinks.datasource_sink import MANIFEST, _manifest_read

        if not os.path.exists(os.path.join(self._path, MANIFEST)):
            return []
        manifest = _manifest_read(self._path)
        history = manifest.get("history")
        if history:
            return sorted(history, key=lambda e: e["v"])
        if manifest.get("files"):
            # pre-snapshot-log manifest: everything is one base commit
            return [
                {"v": 0, "files": sorted(manifest["files"]), "folded": True}
            ]
        return []

    def latestOffset(self) -> dict:
        history = self._history()
        return {"version": history[-1]["v"] if history else -1}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = start["version"], end["version"]
        if hi < lo:
            raise ValueError(
                f"chbatch tail at {self._path}: manifest version went "
                f"backwards ({lo} -> {hi}); the sink was overwritten or "
                "reset beneath a running stream — restart the stream "
                "with a fresh checkpoint against the new sink state"
            )
        out: list[tuple] = []  # raw per-part specs; packed at return
        from ..sinks.datasource_sink import MANIFEST as _M
        from ..sinks.datasource_sink import _manifest_read as _mr

        aliases: tuple = ()
        pcols: list = []
        pmap: dict = {}
        dsets: list = []
        if os.path.exists(os.path.join(self._path, _M)):
            m = _mr(self._path)
            aliases = tuple(
                (k, tuple(v))
                for k, v in sorted(
                    (m.get("column_aliases") or {}).items()
                )
            )
            if self._partition_filter:
                pcols = m.get("partition_cols") or []
                pmap = m.get("partitions") or {}
            # DROP COLUMN tombstones, applied as-of each served
            # commit's version: a part that predates a drop must not
            # leak the dead physical bytes into a re-added column
            dsets = [
                (d["v"], set(d["parts"]), tuple(d["physical"]))
                for d in (m.get("column_drops") or ())
            ]

        def _dead_for(f: str, v: int) -> tuple:
            if not dsets:
                return ()
            b = os.path.basename(f)
            return tuple(
                n
                for dv_, s, ph in dsets
                if dv_ <= v and b in s
                for n in ph
            )

        def _pfiles(files):
            """Appended part names surviving the tail's by-value
            partition subscription (no filter / untupled: keep)."""
            if not self._partition_filter:
                return files
            from ..sinks.datasource_sink import _tuple_matches

            return [
                f
                for f in files
                if (tup := pmap.get(os.path.basename(f))) is None
                or _tuple_matches(
                    tup, pcols, self._partition_filter
                )
                is not False
            ]

        for e in self._history():
            if not (lo < e["v"] <= hi):
                continue
            if e.get("folded") and lo > -1 and lo < e["v"]:
                raise ValueError(
                    f"chbatch tail at {self._path}: truncate_history "
                    f"folded the log past this stream's offset v{lo} "
                    f"(fold base is v{e['v']}) — the already-consumed "
                    "prefix of the fold is indistinguishable from new "
                    "data. Re-read from scratch with a fresh checkpoint, "
                    "or retain at least the tail's lag when truncating."
                )
            op = e.get("op")
            if self._cdf:
                v = e["v"]
                if e.get("cdf_files"):
                    # the commit materialized its change rows — serve
                    # the sidecars directly, rewrite-style or not
                    out.extend(
                        (
                            os.path.join(self._path, f),
                            (),
                            "cdf",
                            v,
                            aliases,
                            (),  # sidecars are commit-fresh
                        )
                        for f in e["cdf_files"]
                    )
                elif op in (None, "append"):
                    out.extend(
                        (
                            os.path.join(self._path, f),
                            (),
                            "insert",
                            v,
                            aliases,
                            _dead_for(f, v),
                        )
                        for f in _pfiles(e["files"])
                    )
                elif op == "delete" and e.get("dv_add"):
                    out.extend(
                        (
                            os.path.join(self._path, f),
                            _dv_spec(self._path, idxs),
                            "delete",
                            v,
                            aliases,
                            _dead_for(f, v),
                        )
                        for f, idxs in sorted(e["dv_add"].items())
                    )
                elif op in ("compact", "rename"):
                    pass  # layout/metadata-only: no logical change
                else:
                    raise ValueError(
                        f"chbatch tail changefeed at {self._path}: "
                        f"commit v{v} is a rewrite-style {op!r} "
                        "WITHOUT materialized change rows — re-run "
                        "the verb with write_cdf=True (commit-time "
                        "sidecars), or read it via the batch "
                        "table_changes API"
                    )
                continue
            if op in ("merge", "update", "delete"):
                # DATA-CHANGING commit on the plain tail: a merge's
                # adds include genuinely NEW inserted rows and an
                # update's files carry changed values — silently
                # skipping them would lose data downstream (ADVICE
                # r7), and forwarding them would re-emit the
                # rewritten old rows. Fail loudly (Delta's readStream
                # contract) unless the caller opted into
                # ignoreChanges semantics.
                if self._ignore_changes:
                    continue
                raise ValueError(
                    f"chbatch tail at {self._path}: commit "
                    f"v{e['v']} is a data-changing {op!r} — a plain "
                    "tail cannot represent it (merge-inserted / "
                    "updated rows would be lost or duplicated). Use "
                    '.option("changefeed", "true") to consume change '
                    'rows, or .option("ignorechanges", "true") to '
                    "skip such commits knowingly."
                )
            if op not in (None, "append"):
                # layout/metadata-only commit (compact rewrite,
                # restore re-add, rename): its files carry only rows
                # the tail already emitted — forwarding them would
                # duplicate downstream
                continue
            out.extend(
                (
                    os.path.join(self._path, f),
                    aliases,
                    _dead_for(f, e["v"]),
                )
                for f in _pfiles(e["files"])
            )
        return [InputPartition(g) for g in _pack_specs(out)]

    def read(self, partition: InputPartition) -> Iterator:
        if partition is None:  # Spark's stand-in when partitions()==[]
            return

        def _gen():
            if self._cdf:
                for spec in partition.value:
                    fullpath, positions, kind, v, aliases, dead = spec
                    yield from _read_part_changes(
                        fullpath,
                        self._convs,
                        positions,
                        kind,
                        v,
                        aliases,
                        dead,
                    )
                return
            for fullpath, aliases, dead in partition.value:
                yield from _read_part(
                    fullpath, self._convs, aliases=aliases, dead=dead
                )

        if len(partition.value) == 1:  # one part: schema self-consistent
            yield from _gen()
            return
        yield from _normalize_batches(_gen(), self._schema)

    def commit(self, end: dict) -> None:
        pass  # the manifest is the source of truth; nothing to ack

    def stop(self) -> None:
        pass
