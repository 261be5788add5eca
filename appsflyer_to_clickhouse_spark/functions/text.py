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
    than ``n`` tokens -> empty array. Pure expression — no explode."""
    gram = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(gram)).otherwise(
        F.array().cast("array<string>")
    )


def hash60(col: Column) -> Column:
    """Deterministic 60-bit integer hash shared with DuckDB:
    first 15 hex chars of md5, base-16 -> bigint (< 2^60, no overflow)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def minhash_signature(shingles: Column, num_hashes: int = 8) -> Column:
    """MinHash signature as an array of ``num_hashes`` hex strings.

    Each "permutation" i is the md5 keyed by salt ``'{i}|'``; the min is
    taken over the *string* ordering of the hex digests — a valid
    min-wise hash family, and exactly reproducible in DuckDB as
    ``list_aggregate(list_transform(ss, s -> md5('i|' || s)), 'min')``.
    Empty shingle set -> NULL entries (propagates to no LSH bucket).
    """
    def salted(i: int):
        # NB: a plain `lambda s, i=i:` would be seen by PySpark as a
        # 2-arg (element, index) lambda — the salt must be closed over
        # via a factory so the lambda stays unary.
        return lambda s: F.md5(F.concat(F.lit(f"{i}|"), s))

    return F.array(
        *[F.array_min(F.transform(shingles, salted(i))) for i in range(num_hashes)]
    )


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


def simhash32(items: Column) -> Column:
    """32-bit SimHash over an array of strings (tokens or shingles).

    For each bit i, vote = sum over items of (+1 if bit i of the item's
    60-bit hash is set else -1); bit i of the result is 1 iff vote > 0.
    Entire computation is one expression tree per row — map-only.
    """
    hashes = F.transform(items, hash60)

    def bit_vote(i: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("bigint")
    for i in range(32):
        vote = F.aggregate(hashes, F.lit(0), bit_vote(i))
        out = out + F.when(vote > 0, F.lit(2**i).cast("bigint")).otherwise(F.lit(0))
    return F.when(F.size(items) > 0, out).otherwise(F.lit(None).cast("bigint"))
