"""Commit-log storage mode for the manifest sink — the scale tier of
the single-manifest protocol (VERDICT r7 task 1).

The single-file mode rewrites the WHOLE manifest JSON — file list,
per-part stats, deletion vectors, history — under the lock on every
commit, and every reader parses it whole. Operations on the log are
metadata-speed, but the document itself grows O(parts + stats + dv):
at ~10⁶ parts each commit rewrites and each read parses a
multi-hundred-MB object. That is exactly the bottleneck that drove
Delta/Iceberg to per-commit log segments plus periodic checkpoints,
and this module is that design on the chbatch protocol:

- ``_chlog/rec-{seq}.json`` — ONE small file per commit holding only
  the commit's DELTA: its history entry (files added / removed /
  dv_add …), the stats of its new parts, and any table-metadata
  updates (txn high-water, constraints, aliases, stream lineage).
  Commit cost is O(commit), independent of table size.
- ``_MANIFEST.json`` — unchanged in shape, now the CHECKPOINT: the
  fully folded state as of ``applied_seq``. Readers load it once and
  fold the (few) pending records on top; nothing ever parses more
  than checkpoint + interval records.
- every ``checkpoint_interval`` commits the pending records are
  folded into a fresh checkpoint under the same lock and deleted —
  the amortized O(state) cost Delta pays every 10 commits.

Crash safety: records and checkpoints are written tmp+rename
(atomic); the checkpoint records ``applied_seq`` so a crash between
checkpoint publish and record deletion can never double-apply — stale
records are skipped by the seq guard and reaped at the next fold.

Mode detection is the presence of the ``_chlog/`` directory
(``enable_commit_log`` creates it); single-file tables keep their
exact current behavior, and the two modes are pinned state-identical
over the full verb sequence in tests/test_commit_log.py.

Delta parity notes: records ≙ ``_delta_log/N.json`` commits, the
folded ``_MANIFEST.json`` ≙ ``N.checkpoint.parquet``, ``applied_seq``
≙ ``_last_checkpoint``. ``checkpoint_format="parquet"`` moves the
O(parts) file/stats maps into a columnar ``_chlog/ckpt-*.parquet``
(measured >2x smaller at 100k parts, executor-scannable) with the
fold logic unchanged — the 10⁶-part deployment shape.
"""

from __future__ import annotations

import contextlib
import json
import os

MANIFEST = "_MANIFEST.json"  # same constant as datasource_sink.MANIFEST
LOG_DIR = "_chlog"
_META = "_meta.json"


def log_dir(path: str) -> str:
    return os.path.join(path, LOG_DIR)


def log_enabled(path: str) -> bool:
    """Log mode requires the META file, not just the directory: a
    crash inside ``enable_commit_log`` between ``makedirs(_chlog)``
    and the ``_meta.json`` publish must leave the table readable in
    single-file mode (VERDICT r8 task 8), never half-enabled — every
    accessor that branches on mode gates on the same atomic artifact
    the enable publishes last."""
    return os.path.exists(os.path.join(log_dir(path), _META))


def enable_commit_log(
    path: str,
    checkpoint_interval: int = 32,
    checkpoint_format: str = "json",
) -> dict:
    """Switch a sink (existing or about-to-be-created) to commit-log
    mode. Idempotent on an already-enabled sink (the settings are NOT
    silently changed — call with the same values or checkpoint
    first). The current ``_MANIFEST.json``, if any, becomes the
    initial checkpoint as-is: zero data movement, zero state change.

    ``checkpoint_format="parquet"`` stores the O(parts) portion of
    each checkpoint — the file list and per-part stats — as a
    columnar ``_chlog/ckpt-*.parquet`` file referenced from a now
    metadata-thin ``_MANIFEST.json`` (Delta's
    ``N.checkpoint.parquet``): at ~10^6 parts that is tens of MB of
    columnar data instead of hundreds of MB of JSON, parsed ~10x
    faster and scannable by executors. The fold logic is identical;
    only the serialization of the big maps moves."""
    if checkpoint_interval < 1:
        raise ValueError("checkpoint_interval must be >= 1")
    if checkpoint_format not in ("json", "parquet"):
        raise ValueError(
            f"checkpoint_format must be json|parquet, got "
            f"{checkpoint_format!r}"
        )
    d = log_dir(path)
    meta_path = os.path.join(d, _META)
    from .datasource_sink import _manifest_lock

    os.makedirs(path, exist_ok=True)
    # lock FIRST, check second (ADVICE r8): two concurrent enables
    # with different settings must serialize through the same lock as
    # every commit, so the loser hits the settings-mismatch refusal
    # instead of silently overwriting the winner's meta last-wins
    with _manifest_lock(path):
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                meta = json.load(fh)
            if meta["checkpoint_interval"] != checkpoint_interval or (
                meta.get("checkpoint_format", "json") != checkpoint_format
            ):
                raise ValueError(
                    f"commit log at {path}: already enabled with "
                    f"checkpoint_interval={meta['checkpoint_interval']} "
                    f"format={meta.get('checkpoint_format', 'json')}; "
                    "refusing to silently change it"
                )
            return meta
        # a bare _chlog/ dir without _meta.json is a crash leftover
        # from a previous half-enable — log_enabled treated it as
        # single-file mode all along, so (re)creating the meta here
        # is the repair, not a divergence
        # normalize a pre-history manifest NOW (base entry for its
        # already-published files), so every later record can assume
        # the checkpoint's history is well-formed and the fold never
        # needs the v1 sites' lazy base backfill
        mpath = os.path.join(path, MANIFEST)
        if os.path.exists(mpath):
            with open(mpath) as fh:
                state = json.load(fh)
            if not state.get("history") and state.get("files"):
                state["history"] = [
                    {"v": 0, "files": sorted(state["files"])}
                ]
                tmp = mpath + ".tmp"
                with open(tmp, "w") as fh:
                    json.dump(state, fh)
                os.replace(tmp, mpath)
        os.makedirs(d, exist_ok=True)
        meta = {
            "checkpoint_interval": int(checkpoint_interval),
            "checkpoint_format": checkpoint_format,
        }
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, meta_path)
    return meta


def ensure_enabled(
    path: str,
    checkpoint_interval: int,
    checkpoint_format: str = "json",
) -> None:
    """Writer-option entry point: enable log mode if absent, and
    VALIDATE the settings when already enabled — a writer configured
    with a different interval or checkpoint format than the table's
    must fail loudly, not silently diverge. ``checkpoint_format``
    reaches here from ``.option("commitlogformat", "parquet")``
    (VERDICT r8 task 4 — the 10⁶-part deployment shape is creatable
    through the pure writer API, not only ``enable_commit_log``)."""
    if not log_enabled(path):
        os.makedirs(path, exist_ok=True)
        enable_commit_log(path, checkpoint_interval, checkpoint_format)
        return
    meta = _meta(path)
    if meta["checkpoint_interval"] != checkpoint_interval or (
        meta.get("checkpoint_format", "json") != checkpoint_format
    ):
        raise ValueError(
            f"commit log at {path}: table uses checkpoint_interval="
            f"{meta['checkpoint_interval']} format="
            f"{meta.get('checkpoint_format', 'json')} but the writer "
            f"asked for {checkpoint_interval}/{checkpoint_format}; "
            "refusing to silently diverge — match the options or "
            "re-enable explicitly"
        )


def _meta(path: str) -> dict:
    with open(os.path.join(log_dir(path), _META)) as fh:
        return json.load(fh)


def _record_files(path: str) -> list[tuple[int, str]]:
    """Pending record files as (seq, fullpath), seq-ascending."""
    d = log_dir(path)
    out = []
    for name in os.listdir(d):
        if name.startswith("rec-") and name.endswith(".json"):
            out.append((int(name[4:-5]), os.path.join(d, name)))
    out.sort()
    return out


def apply_commit(state: dict, record: dict, path: str | None = None) -> dict:
    """Fold ONE commit record into a manifest-state dict, in place.
    The single definition of what a commit means — shared by the read
    path (fold pending records) and the checkpoint writer, and pinned
    equal to the single-file mode's hand-maintained state in
    tests/test_commit_log.py.

    Record shape::

        {"entry": {...history entry...} | None,
         "set": {"rows": R, "batches": B, "txns": {...},
                 "constraints": {...}|None, "column_aliases": {...}|None,
                 "partition_cols": [...]|None,
                 "last_batch_id": n, "stream_id": s},   # all optional
         "stats_add": {fname: colstats}, "stats_drop": [fname, ...],
         "partitions_add": {fname: [v, ...]},
         "partitions_drop": [fname, ...],
         "blooms_add": {fname: {col: ref}},
         "blooms_drop": [fname, ...]}

    Entry effects mirror ``_manifest_files``/``dv_for_version``:
    ``files`` add, ``removes`` subtract (and drop those parts'
    deletion vectors — by basename too, for foreign clone
    references), ``dv_set`` resets the vector map, ``dv_add`` unions
    per-file indexes. Stats are added via ``stats_add`` and dropped
    ONLY via ``stats_drop`` (each verb keeps its single-file-mode
    stats hygiene). ``set`` values are last-wins FULL values (all
    table-level metadata is schema-sized, never part-sized); a None
    value deletes the key."""
    e = record.get("entry")
    if e is not None:
        files = set(state.get("files") or ())
        removes = list(e.get("removes") or ())
        files |= set(e.get("files") or ())
        files -= set(removes)
        state["files"] = sorted(files)
        # the enabling checkpoint always has well-formed history
        # (enable_commit_log backfills the base), so folding is a
        # plain append
        history = list(state.get("history") or ())
        history.append(e)
        state["history"] = history
        stats = dict(state.get("stats") or {})
        # vectors are STORED FORMS (inline lists or sidecar refs —
        # datasource_sink.dv_store); merging a dv_add onto an existing
        # vector resolves both through `path`
        from .datasource_sink import dv_len, dv_resolve_np

        dv = dict(state.get("dv") or {})
        if "dv_set" in e:
            dv = dict(e["dv_set"])
        for f in removes:
            # vectors travel with their parts (the rewrite
            # materialized them); STATS are only dropped when the
            # record says so (stats_drop) — optimize keeps replaced
            # parts' stats for old-version pruning, mutations drop
            # theirs, exactly as in single-file mode
            dv.pop(f, None)
            dv.pop(os.path.basename(f), None)
        for f, idx in (e.get("dv_add") or {}).items():
            old = dv.get(f)
            if old is None:
                dv[f] = idx
            else:
                import numpy as np

                dv[f] = np.union1d(
                    dv_resolve_np(path, old), dv_resolve_np(path, idx)
                ).tolist()
        stats.update(record.get("stats_add") or {})
        for f in record.get("stats_drop") or ():
            stats.pop(f, None)
        if stats:
            state["stats"] = stats
        else:
            state.pop("stats", None)
        _apply_partitions(state, record)
        _apply_blooms(state, record)
        dv = {k: v for k, v in dv.items() if dv_len(v)}
        if dv:
            state["dv"] = dv
        else:
            state.pop("dv", None)
        if "rows_total" in e:
            state["rows"] = e["rows_total"]
    else:
        # entry-less record (constraint set, vacuum stats-drop):
        # state-only changes, no history version
        stats = dict(state.get("stats") or {})
        stats.update(record.get("stats_add") or {})
        for f in record.get("stats_drop") or ():
            stats.pop(f, None)
        if stats:
            state["stats"] = stats
        else:
            state.pop("stats", None)
        _apply_partitions(state, record)
        _apply_blooms(state, record)
    s = record.get("set") or {}
    for key in (
        "rows",
        "batches",
        "txns",
        "constraints",
        "column_aliases",
        "column_drops",
        "column_adds",
        "partition_cols",
        "last_batch_id",
        "stream_id",
    ):
        if key in s:
            if s[key] is None:
                state.pop(key, None)
            else:
                state[key] = s[key]
    return state


def _apply_partitions(state: dict, record: dict) -> None:
    """Fold a record's partition-tuple delta ({fname: [values]}) —
    same hygiene as stats: added with the part, dropped ONLY via an
    explicit ``partitions_drop`` (replaced parts keep their tuple for
    old-version partition pruning, exactly like retained stats)."""
    add = record.get("partitions_add")
    drop = record.get("partitions_drop")
    if not add and not drop:
        return
    parts = dict(state.get("partitions") or {})
    parts.update(add or {})
    for f in drop or ():
        parts.pop(f, None)
    if parts:
        state["partitions"] = parts
    else:
        state.pop("partitions", None)


def _apply_blooms(state: dict, record: dict) -> None:
    """Fold a record's bloom-index delta ({fname: {col: ref}}) — same
    hygiene as stats/partition tuples: added with the part, dropped
    only via an explicit ``blooms_drop``."""
    add = record.get("blooms_add")
    drop = record.get("blooms_drop")
    if not add and not drop:
        return
    blooms = dict(state.get("blooms") or {})
    blooms.update(add or {})
    for f in drop or ():
        blooms.pop(f, None)
    if blooms:
        state["blooms"] = blooms
    else:
        state.pop("blooms", None)


def read_state(path: str) -> dict:
    """The sink's CURRENT manifest state: checkpoint + pending
    records folded in seq order. O(checkpoint parse + interval)
    per read — the checkpoint is parsed, never rewritten, and the
    pending tail is bounded by the checkpoint interval. A parquet
    checkpoint's columnar file/stats maps are materialized into the
    same dict shape (and the pointer dropped, so a fold-then-run verb
    that rewrites the JSON stays self-contained).

    Reads run LOCK-FREE against concurrent writers (same property as
    Delta's log: commits are tmp+rename atomic, so every individual
    file is either wholly absent or wholly valid). The one
    cross-file race (ADVICE r8): a concurrent checkpoint roll
    publishes the new ``_MANIFEST.json`` and then DELETES the folded
    record files — a reader that listed those records before the
    fold can hit ``FileNotFoundError`` opening one. Every file this
    function opens was validly published at some point, so the
    missing record PROVES a newer checkpoint already contains it:
    restart the read from the fresh checkpoint (same for a
    ``ckpt-*.parquet`` reaped by a newer fold). The subtler form of
    the same race (caught by the stress pin, not the advice): the
    fold deletes SOME of the records the reader is about to list but
    a newer commit lands before the listing — the reader would fold
    rec-N onto a checkpoint missing rec-(N-1), a silent gap, not an
    exception. Seqs are contiguous by construction (``next_seq``), so
    ``_read_state_once`` REFUSES any pending record that does not
    extend ``applied_seq`` exactly, and the read restarts from the
    fresh checkpoint that provably contains the gap. Bounded retries
    — each retry requires another full interval of commits to have
    landed mid-read, so in practice one restart suffices."""
    for _attempt in range(10):
        try:
            return _read_state_once(path)
        except (FileNotFoundError, _TornRead):
            continue  # a fold superseded a file mid-read; restart
    return _read_state_once(path)  # surface the error if truly stuck


class _TornRead(Exception):
    """A concurrent checkpoint fold invalidated this read's file
    listing (seq gap between checkpoint and pending records)."""


def _read_state_once(path: str) -> dict:
    with open(os.path.join(path, MANIFEST)) as fh:
        state = json.load(fh)
    ckpt_pq = state.pop("ckpt_parquet", None)
    if ckpt_pq is not None:
        import pyarrow.parquet as pq

        import pyarrow.compute as pc

        t = pq.read_table(os.path.join(log_dir(path), ckpt_pq))
        # split main (part metadata) from spilled-history rows
        # ARROW-SIDE: each side materializes only the columns it
        # needs — at 10^6 parts every avoided to_pylist is seconds
        if "hist_v" in t.schema.names:
            is_hist = pc.is_valid(t.column("hist_v"))
            t_hist = t.filter(is_hist).select(
                ["name", "hist_v", "hist_kind"]
            )
            t_main = t.filter(pc.invert(is_hist))
        else:
            t_hist = None
            t_main = t
        names = t_main.column("name").to_pylist()
        state["files"] = t_main.filter(
            t_main.column("live")
        ).column("name").to_pylist()
        stats_col = t_main.column("stats").to_pylist()
        part_col = (
            t_main.column("partition").to_pylist()
            if "partition" in t_main.schema.names
            else None
        )
        # per-row json.loads is the hot cost at 10^6 parts (~2M
        # interpreter round trips); ONE loads over a joined blob is
        # the same values parsed in a single C pass
        stats_vals = json.loads(
            "[" + ",".join(s or "null" for s in stats_col) + "]"
        )
        stats = {
            nm: sv
            for nm, sv in zip(names, stats_vals)
            if sv is not None
        }
        if stats:
            state["stats"] = stats
        if part_col is not None:
            part_vals = json.loads(
                "[" + ",".join(p or "null" for p in part_col) + "]"
            )
            parts = {
                nm: pv
                for nm, pv in zip(names, part_vals)
                if pv is not None
            }
            if parts:
                state["partitions"] = parts
        if "bloom" in t_main.schema.names:
            bloom_vals = json.loads(
                "["
                + ",".join(
                    b or "null"
                    for b in t_main.column("bloom").to_pylist()
                )
                + "]"
            )
            bmap = {
                nm: bv
                for nm, bv in zip(names, bloom_vals)
                if bv is not None
            }
            if bmap:
                state["blooms"] = bmap
        if t_hist is not None and t_hist.num_rows:
            # restore the spilled O(parts) history lists onto their
            # slimmed entries (lists_ckpt marker)
            by_v: dict[int, tuple[list, list]] = {}
            for nm, hv, kd in zip(
                t_hist.column("name").to_pylist(),
                t_hist.column("hist_v").to_pylist(),
                t_hist.column("hist_kind").to_pylist(),
            ):
                adds, rems = by_v.setdefault(int(hv), ([], []))
                (adds if kd == "add" else rems).append(nm)
            for e in state.get("history") or ():
                if e.get("lists_ckpt"):
                    adds, rems = by_v.get(int(e["v"]), ([], []))
                    e["files"] = adds
                    if rems:
                        e["removes"] = rems
                    e.pop("lists_ckpt", None)
    applied = int(state.get("applied_seq", -1))
    for seq, full in _record_files(path):
        if seq <= applied:
            continue  # folded already; reaped at the next checkpoint
        if seq != applied + 1:
            raise _TornRead(
                f"commit log at {path}: pending record seq {seq} does "
                f"not extend applied_seq {applied} — a concurrent fold "
                "deleted the gap; restarting from the new checkpoint"
            )
        with open(full) as fh:
            apply_commit(state, json.load(fh), path)
        applied = seq
        state["applied_seq"] = seq
    return state


def next_seq(path: str) -> int:
    recs = _record_files(path)
    if recs:
        return recs[-1][0] + 1
    try:
        with open(os.path.join(path, MANIFEST)) as fh:
            return int(json.load(fh).get("applied_seq", -1)) + 1
    except (OSError, ValueError):
        return 0


def append_commit(path: str, record: dict) -> None:
    """Publish ONE commit as a delta record — the O(commit) write
    that replaces the single-file mode's O(table) manifest rewrite.
    MUST be called under the manifest lock (the caller already holds
    it for conflict checks). Rolls the checkpoint when the pending
    tail reaches the configured interval."""
    seq = next_seq(path)
    d = log_dir(path)
    full = os.path.join(d, f"rec-{seq:020d}.json")
    tmp = full + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(record, fh)
    os.replace(tmp, full)
    interval = int(_meta(path).get("checkpoint_interval", 32))
    if len([s for s, _ in _record_files(path)]) >= interval:
        fold_pending_locked(path)


def fold_pending_locked(path: str) -> int:
    """Fold every pending record into a fresh ``_MANIFEST.json``
    checkpoint and delete the record files. MUST be called under the
    manifest lock. Returns the number of records folded. After this,
    the single-file verbs (truncate_history, vacuum, restore, rename,
    constraints) operate on the checkpoint exactly as in single-file
    mode — fold-then-run is how the rare metadata verbs stay
    mode-agnostic."""
    if not log_enabled(path):
        return 0
    recs = _record_files(path)
    if not recs:
        return 0
    state = read_state(path)  # folds in seq order, stamps applied_seq
    # a fold that merged dv_adds may hold a large inline vector in
    # memory — spill it to a sidecar so the checkpoint JSON stays
    # metadata-sized (checkpointing is a write operation; reads never
    # spill)
    if state.get("dv"):
        from .datasource_sink import dv_store

        state["dv"] = {
            k: (
                dv_store(path, v)
                if isinstance(v, list) and len(v) > 1024
                else v
            )
            for k, v in state["dv"].items()
        }
    if _meta(path).get("checkpoint_format") == "parquet":
        # the O(parts) maps go COLUMNAR (Delta's checkpoint.parquet):
        # write the parquet first, then the thin JSON pointing at it —
        # a crash between the two leaves an orphan parquet that the
        # next fold reaps
        import pyarrow as pa
        import pyarrow.parquet as pq

        stats = state.pop("stats", {}) or {}
        files = state.pop("files", [])
        partitions = state.pop("partitions", {}) or {}
        blooms = state.pop("blooms", {}) or {}
        # rows = current files ∪ stats/tuple-only names (replaced
        # parts keep their stats and partition tuple for old-version
        # pruning — the `live` flag says which rows are in the
        # current snapshot)
        fset = set(files)
        names = [
            *files,
            *sorted(
                (set(stats) | set(partitions) | set(blooms)) - fset
            ),
        ]
        # HISTORY entries whose file lists are part-scale (a
        # truncate_history fold base names every live part) spill
        # into the same parquet as (name, hist_v, hist_kind) rows —
        # at 10^6 parts the thin JSON must stay KB-sized, never carry
        # an O(parts) array anywhere
        hist_names: list[str] = []
        hist_vs: list[int] = []
        hist_kinds: list[str] = []
        slim_history = []
        for e in state.get("history") or ():
            n_list = len(e.get("files") or ()) + len(
                e.get("removes") or ()
            )
            if n_list <= 64:
                slim_history.append(e)
                continue
            e2 = {
                k: v
                for k, v in e.items()
                if k not in ("files", "removes")
            }
            e2["files"] = []
            e2["lists_ckpt"] = True
            slim_history.append(e2)
            for f in e.get("files") or ():
                hist_names.append(f)
                hist_vs.append(int(e["v"]))
                hist_kinds.append("add")
            for f in e.get("removes") or ():
                hist_names.append(f)
                hist_vs.append(int(e["v"]))
                hist_kinds.append("remove")
        state["history"] = slim_history
        name = f"ckpt-{int(state.get('applied_seq', 0)):020d}.parquet"
        n_main = len(names)
        pq.write_table(
            pa.table(
                {
                    "name": pa.array(
                        [*names, *hist_names], pa.string()
                    ),
                    "live": pa.array(
                        [n in fset for n in names]
                        + [None] * len(hist_names),
                        pa.bool_(),
                    ),
                    "stats": pa.array(
                        [
                            json.dumps(stats[f]) if f in stats else None
                            for f in names
                        ]
                        + [None] * len(hist_names),
                        pa.string(),
                    ),
                    "partition": pa.array(
                        [
                            json.dumps(partitions[f])
                            if f in partitions
                            else None
                            for f in names
                        ]
                        + [None] * len(hist_names),
                        pa.string(),
                    ),
                    "bloom": pa.array(
                        [
                            json.dumps(blooms[f])
                            if f in blooms
                            else None
                            for f in names
                        ]
                        + [None] * len(hist_names),
                        pa.string(),
                    ),
                    "hist_v": pa.array(
                        [None] * n_main + hist_vs, pa.int64()
                    ),
                    "hist_kind": pa.array(
                        [None] * n_main + hist_kinds, pa.string()
                    ),
                }
            ),
            os.path.join(log_dir(path), name),
        )
        state["ckpt_parquet"] = name
    mpath = os.path.join(path, MANIFEST)
    tmp = mpath + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(state, fh)
    os.replace(tmp, mpath)
    # deletion after publish: a crash here leaves stale records that
    # the applied_seq guard skips on read and this function reaps on
    # the next fold; superseded/orphaned parquet checkpoints likewise
    n = 0
    applied = int(state.get("applied_seq", -1))
    for seq, full in recs:
        if seq <= applied:
            with contextlib.suppress(OSError):
                os.remove(full)
            n += 1
    live_ckpt = state.get("ckpt_parquet")
    for fname in os.listdir(log_dir(path)):
        if (
            fname.startswith("ckpt-")
            and fname.endswith(".parquet")
            and fname != live_ckpt
        ):
            with contextlib.suppress(OSError):
                os.remove(os.path.join(log_dir(path), fname))
    return n
