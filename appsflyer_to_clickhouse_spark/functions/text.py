"""Text/hashing column kernels for the training-data pipeline ops.

Everything here is a ``Column -> Column`` composition of JVM built-ins —
no Python UDFs — so tokenization, shingling, MinHash and SimHash all run
inside whole-stage codegen, map-side, with ZERO shuffle: the per-doc
signatures fall out of a single Project over the scan. At 100 TB that is
the difference between a pass over the data and a pass plus an
explode+groupBy shuffle of every shingle (~50x the input volume).

Cross-engine determinism: the only hash primitive used is ``md5`` (hex
string), which DuckDB computes identically — so every op here has an
exact DuckDB oracle twin. A 60-bit integer hash is derived from the
first 15 md5 hex chars (fits bigint; DuckDB: ``('0x'||substr)::UBIGINT``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokenization used by every text op: lowercase, split on non-alnum
# runs, drop empties. Mirror in DuckDB:
#   list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x != '')
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens(text: Column) -> Column:
    """array<string> of lowercase alnum tokens."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE), lambda x: x != F.lit("")
    )


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-grams (space-joined) from a token array; fewer
    than ``n`` tokens -> empty array. Pure expression — no explode.

    Built with zip_with over shifted slices, NOT an index lambda with
    ``element_at(toks, i+j)``: a lambda body re-evaluates its captured
    array expression per ELEMENT (HOFs are interpreted, no CSE), so the
    element_at form re-tokenizes the whole document once per shingle
    position — measured ~10x slower at sf0.1. zip_with evaluates each
    slice once per row; the shorter side pads with NULL, null-
    propagating concat marks the tail, filter drops it."""
    out = toks
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, F.greatest(F.size(toks) - j, F.lit(0)))
        out = F.zip_with(out, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_distinct(F.filter(out, lambda x: x.isNotNull()))


def word_shingles_ordered(toks: Column, n: int = 3) -> Column:
    """``word_shingles`` WITHOUT the distinct: every n-gram in document
    order, so ``posexplode`` yields (token position, gram) — the input
    for position-aware ops (repeated-span detection). Null-propagating
    concat marks only the tail slots, so the filter preserves order and
    element i IS the gram starting at token i."""
    out = toks
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, F.greatest(F.size(toks) - j, F.lit(0)))
        out = F.zip_with(out, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.filter(out, lambda x: x.isNotNull())


def hash60(col: Column) -> Column:
    """Deterministic 60-bit integer hash shared with DuckDB:
    first 15 hex chars of md5, base-16 -> bigint (< 2^60, no overflow)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def minhash_signature(digests: Column, num_hashes: int = 8) -> Column:
    """MinHash signature (array of ``num_hashes`` hex strings) from a
    pre-staged ``shingle_digests`` column.

    Hash family: md5 keyed by salt ``'{i}|'`` supplies TWO independent
    64-bit "permutations" per digest (hex halves [1,16] and [17,32]),
    so ``num_hashes`` signatures cost ``num_hashes/2`` md5 calls per
    shingle — md5 dominates this operator's cost at scale. Min is over
    the *string* ordering of the halves — a valid min-wise family,
    exactly reproducible in DuckDB as
    ``list_aggregate(list_transform(ss, s -> substr(md5('i|'||s), 1, 16)), 'min')``.
    Empty shingle set -> NULL entries (propagates to no LSH bucket).
    """
    assert num_hashes % 2 == 0, "num_hashes must be even (two per digest)"
    return F.array(
        *[
            F.array_min(F.transform(digests, _half_picker(i, lo)))
            for i in range(num_hashes // 2)
            for lo in (1, 17)
        ]
    )


def shingle_digests(shingles: Column, num_digests: int) -> Column:
    """One md5 per (salt, shingle), materialized as array<array<string>>.

    Split out from ``minhash_signature`` so callers can stage it in its
    own Project: the digest array is referenced once per signature
    entry, and higher-order functions are interpreted (no codegen CSE),
    so inlining it would re-run every md5 per reference. A separate
    column boundary makes Catalyst evaluate the md5s exactly once per
    row (CollapseProject keeps non-cheap multi-referenced aliases)."""

    def salted(i: int):
        # factory keeps the lambda unary (2-param = (element, index))
        return lambda s: F.md5(F.concat(F.lit(f"{i}|"), s))

    return F.transform(
        shingles, lambda s: F.array(*[salted(i)(s) for i in range(num_digests)])
    )


def _half_picker(i: int, lo: int):
    return lambda d: F.substring(F.element_at(d, i + 1), lo, 16)


def lsh_band_keys(signature: Column, bands: int, rows: int) -> Column:
    """Collapse a MinHash signature into ``bands`` bucket keys:
    band b = md5(concat of its ``rows`` signature entries). Returns
    array<string> of length ``bands``; NULL signature entries yield NULL
    band keys (which never join-match, i.e. no bucket)."""
    return F.array(
        *[
            F.md5(
                _concat_strict(
                    [F.element_at(signature, b * rows + r + 1) for r in range(rows)]
                )
            )
            for b in range(bands)
        ]
    )


def _concat_strict(cols: list[Column]) -> Column:
    """NULL-propagating concat with '|' separators (concat_ws skips
    NULLs, which would let an empty doc alias into a real bucket)."""
    out = cols[0]
    for c in cols[1:]:
        out = F.concat(out, F.lit("|"), c)
    return out


SIMHASH_BITS = 60


def simhash60(items: Column) -> Column:
    """60-bit SimHash over an array of strings (tokens or shingles).

    For each bit i, vote = sum over items of (+1 if bit i of the item's
    60-bit hash is set else -1); bit i of the result is 1 iff vote > 0.
    Entire computation is one expression tree per row — map-only.

    60 bits (every bit of ``hash60``, all < 2^63 so signed-bigint-safe
    in both engines) instead of 32 so the banded candidate stage can
    use 15-bit bands: 4 x 2^15 = 131,072 buckets rather than the 4 x
    256 a byte-banded 32-bit signature allows — the difference between
    in-bucket pair counts growing ~n^2/1k (a wall at 100x data) and
    ~n^2/131k, while the pigeonhole bound (hamming <= 3 => one of 4
    bands identical) is unchanged.

    Single-pass design: ONE fold over the items carries all 60 bit
    votes in an array accumulator, so each item is hashed exactly once
    (higher-order functions are interpreted — no codegen CSE — so the
    naive per-bit-aggregate form re-hashes every item 60 times and is
    two orders of magnitude slower; measured at sf0.1).
    """
    hashes = F.transform(items, hash60)
    # votes[i] += getbit(h, i) * 2 - 1  — branch-free bit vote
    # (getbit accepts a Column position; shiftright's numBits doesn't)
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), SIMHASH_BITS),
        lambda acc, h: F.transform(
            acc,
            lambda a, i: a + F.getbit(h, i) * F.lit(2) - F.lit(1),
        ),
    )
    bits = F.transform(
        votes,
        lambda v, i: F.when(
            v > 0, F.call_function("shiftleft", F.lit(1).cast("bigint"), i)
        ).otherwise(F.lit(0).cast("bigint")),
    )
    out = F.aggregate(bits, F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    return F.when(F.size(items) > 0, out).otherwise(F.lit(None).cast("bigint"))
