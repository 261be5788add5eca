"""Per-part BLOOM-FILTER skipping indexes for the manifest sink
(VERDICT r9 task 1 — Delta's bloom-filter index / ClickHouse's
``tokenbf``/``bloom_filter`` skip index, on the chbatch protocol).

Why this exists: the reference's core access shape is a POINT LOOKUP
on a high-cardinality string — its dedup probe reads the sink's
recent ``appsflyer_id`` keys and anti-joins the incoming batch
(reference main.py:172-180). Min/max footer stats degenerate to
keep-everything for that shape (uuid-ish keys span the full
lexicographic range in every part); a per-part bloom filter answers
"can this part contain key K?" in O(k) bit probes, so a point lookup
reads ~FPP of the parts range stats keep in full.

Storage contract (mirrors the dv sidecar machinery,
sinks/datasource_sink.py): the bitmap lives in a ``bloom-<uuid>.bin``
sidecar next to the data parts — written atomically (tmp + rename),
never mutated in place (a rewrite always lands a NEW name, so probe
caches can key by filename). The manifest records one ref per
(part, column)::

    "blooms": {part_basename: {col: {"sidecar": name,
                                     "m": bits, "k": hashes,
                                     "n": n_values}}}

folded through the commit log via ``blooms_add``/``blooms_drop``
(sinks/commit_log.py), columnar in parquet checkpoints, carried (and
sidecar-absolutized) by shallow clones, reference-protected and
reaped by vacuum.

Soundness rules, same posture as stats skipping:
- a bloom HIT keeps the file (maybe-present); only a MISS prunes —
  a bloom miss is a proof of absence, so pruning on it is exact;
- a part with NO bloom for the probed column is KEPT;
- values are hashed over the SAME canonical encoding on both sides
  (``_key_bytes`` — the writer's insert and the reader's probe must
  agree bit-for-bit or pruning silently breaks);
- a column whose part holds any un-encodable value (float/NaN,
  binary, nested) gets NO bloom for that part — a partial bloom
  would prune files that contain the key (wrong answers), so the
  builder refuses the column per-part instead.

Scale: filters are built at flush time from data already in hand
(one distinct-set pass per column per part, executor-side); probing
is driver-side planning over KB-to-~100KB sidecars, read once per
(sidecar, process) through a bounded LRU — the same metadata-only
planning budget as stats pruning.
"""

from __future__ import annotations

import functools
import math
import os
import uuid

# xxhash-free double hashing: two independent 64-bit lanes from
# hashlib (C-speed, stdlib); position_i = (h1 + i*h2) mod m — the
# standard Kirsch-Mitzenmacher construction.
import hashlib

BLOOM_DEFAULT_FPP = 0.01
# refuse absurd bitmap sizes (a 10M-distinct-key flush at 0.1% FPP is
# ~18 MB of bitmap per part — the flush is mis-batched, not the cap)
BLOOM_MAX_BYTES = 32 * 1024 * 1024


def parse_bloom_options(options) -> tuple[list[str], float] | None:
    """``.option("bloomfilter", "col[,col...]")`` (+ optional
    ``.option("bloomfpp", p)``) on any writer tier — validated at
    writer CONSTRUCTION so a malformed value never surfaces at commit
    time, after executor writes (the ADVICE-r8 rule)."""
    v = options.get("bloomfilter")
    fpp_raw = options.get("bloomfpp")
    if v is None:
        if fpp_raw is not None:
            raise ValueError(
                '.option("bloomfpp") without .option("bloomfilter", '
                '"col[,col]") — name the indexed column(s)'
            )
        return None
    cols = [c.strip() for c in str(v).split(",") if c.strip()]
    if not cols:
        raise ValueError(
            '.option("bloomfilter", ...): no column names given'
        )
    if len(set(cols)) != len(cols):
        raise ValueError(
            f'.option("bloomfilter", {v!r}): duplicate column'
        )
    fpp = float(fpp_raw) if fpp_raw is not None else BLOOM_DEFAULT_FPP
    if not (0.0 < fpp < 0.5):
        raise ValueError(
            f'.option("bloomfpp", {fpp_raw!r}): must be in (0, 0.5)'
        )
    return cols, fpp


class _Unsupported(TypeError):
    """A value no bloom can soundly index (float/NaN, binary, nested):
    the BUILDER catches this and skips the column for the part; the
    PROBE catches it and keeps the file."""


def _key_bytes(v) -> bytes | None:
    """Canonical hash input for one value — None for NULL (nulls are
    never inserted; equality with NULL never matches rows, the stats
    layer owns null reasoning). Must be the single definition used by
    BOTH the flush-time insert and the planning-time probe: values are
    first normalized exactly like stored stats (``_stat_cell``: ISO
    strings for date/timestamp, str for Decimal), so a probe bound
    normalizes to the same bytes the writer hashed."""
    from .datasource_sink import _STAT_UNSAFE, _stat_cell

    if isinstance(v, float):
        # floats are refused even when finite: 1.0 vs 1 vs round-trip
        # formatting make byte-stable equality a trap (same reasoning
        # as _part_cell's float refusal)
        raise _Unsupported(f"bloom index: float value {v!r}")
    cell = _stat_cell(v)
    if cell is None:
        return None
    if cell is _STAT_UNSAFE:
        raise _Unsupported(f"bloom index: unsupported value {v!r}")
    if isinstance(cell, bool):
        return b"i1" if cell else b"i0"
    if isinstance(cell, int):
        return b"i" + str(cell).encode("ascii")
    if isinstance(cell, str):
        return b"s" + cell.encode("utf-8")
    raise _Unsupported(
        f"bloom index: {type(v).__name__} value is not indexable"
    )


def _lanes(key: bytes) -> tuple[int, int]:
    d = hashlib.md5(key).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1  # odd: full-period stride
    return h1, h2


def _size_for(n: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k) for ``n`` keys at target FPP — the textbook
    optimum m = -n ln p / (ln 2)^2, k = (m/n) ln 2, floored to sane
    bounds."""
    n = max(1, n)
    m = math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))
    m = max(64, (m + 7) // 8 * 8)  # whole bytes
    if m > BLOOM_MAX_BYTES * 8:
        raise ValueError(
            f"bloom index: {n} distinct keys at fpp={fpp} needs a "
            f"{m // 8} byte bitmap (cap {BLOOM_MAX_BYTES}) — batch "
            "smaller flushes or raise the FPP"
        )
    k = max(1, min(16, round(m / n * math.log(2))))
    return m, k


def build_bitmap(values, fpp: float) -> tuple[bytearray, int, int, int] | None:
    """Build one bitmap over an iterable of raw (un-normalized) cell
    values. Returns (bits, m, k, n_keys) — or None when the column is
    un-indexable for this part (any unsupported value: a partial
    bloom would prune files that contain the key)."""
    keys = set()
    try:
        for v in values:
            b = _key_bytes(v)
            if b is not None:
                keys.add(b)
    except _Unsupported:
        return None
    m, k = _size_for(len(keys), fpp)
    bits = bytearray(m // 8)
    for key in keys:
        h1, h2 = _lanes(key)
        for i in range(k):
            pos = (h1 + i * h2) % m
            bits[pos >> 3] |= 1 << (pos & 7)
    return bits, m, k, len(keys)


def write_sidecar(path: str, bits, m: int, k: int, n: int) -> dict:
    """Persist one bitmap as an immutable sidecar; returns the
    manifest ref. Atomic publish (tmp + os.replace), exactly like
    ``dv_store``."""
    name = f"bloom-{uuid.uuid4().hex}.bin"
    tmp = os.path.join(path, name + ".tmp")
    with open(tmp, "wb") as fh:
        fh.write(bytes(bits))
    os.replace(tmp, os.path.join(path, name))
    return {"sidecar": name, "m": int(m), "k": int(k), "n": int(n)}


def blooms_for_rows(
    path: str, rows: list[dict], cols: list[str], fpp: float
) -> dict:
    """Flush-time builder, JSONL tier: one ref per indexable column
    over the buffered row dicts (the rows are already in Python hands
    — same loop tax as ``_rows_stats``)."""
    out: dict = {}
    for c in cols:
        try:
            values = [r[c] for r in rows]
        except KeyError:
            raise ValueError(
                f"bloomfilter column {c!r} is not in the written "
                "schema"
            ) from None
        built = build_bitmap(values, fpp)
        if built is not None:
            out[c] = write_sidecar(path, *built)
    return out


def blooms_for_table(path: str, table, cols: list[str], fpp: float) -> dict:
    """Flush-time builder, Arrow tier: vectorized distinct per column
    (``pc.unique`` — one C pass), Python hashing only over the
    distinct set. Un-indexable Arrow types (float, binary, nested)
    skip the column for this part, mirroring ``_arrow_table_stats``'
    type gate."""
    import pyarrow as pa
    import pyarrow.compute as pc

    out: dict = {}
    for c in cols:
        if c not in table.schema.names:
            raise ValueError(
                f"bloomfilter column {c!r} is not in the written "
                "schema"
            )
        t = table.schema.field(c).type
        if not (
            pa.types.is_integer(t)
            or pa.types.is_string(t)
            or pa.types.is_large_string(t)
            or pa.types.is_boolean(t)
            or pa.types.is_timestamp(t)
            or pa.types.is_date(t)
            or pa.types.is_decimal(t)
        ):
            continue  # un-indexable type: no bloom beats a wrong bloom
        distinct = pc.unique(table.column(c)).to_pylist()
        built = build_bitmap(distinct, fpp)
        if built is not None:
            out[c] = write_sidecar(path, *built)
    return out


@functools.lru_cache(maxsize=256)
def _load_bitmap(fullpath: str) -> bytes:
    """Sidecars are immutable by construction (a rewrite lands a new
    uuid name), so caching by path is safe — a planning pass probing
    the same part for many keys reads the file once."""
    with open(fullpath, "rb") as fh:
        return fh.read()


def might_contain(path: str, ref: dict, value) -> bool:
    """Planning-time membership probe against one stored ref. KEEPS
    the file (returns True) on any uncertainty: NULL/un-encodable
    probe value, missing/short sidecar — pruning must never be a
    correctness filter."""
    try:
        key = _key_bytes(value)
    except _Unsupported:
        return True
    if key is None:
        return True  # NULL literal: leave it to Spark
    m, k = int(ref["m"]), int(ref["k"])
    side = ref["sidecar"]
    full = side if os.path.isabs(side) else os.path.join(path, side)
    try:
        bits = _load_bitmap(full)
    except OSError:
        return True  # sidecar gone (raced vacuum): conservative keep
    if len(bits) * 8 < m:
        return True  # truncated/clobbered: never prune on bad bytes
    h1, h2 = _lanes(key)
    for i in range(k):
        pos = (h1 + i * h2) % m
        if not (bits[pos >> 3] >> (pos & 7)) & 1:
            return False
    return True


def might_contain_any(path: str, ref: dict, values) -> bool:
    """IN-list probe: the file survives iff ANY listed value might be
    present."""
    return any(might_contain(path, ref, v) for v in values)
