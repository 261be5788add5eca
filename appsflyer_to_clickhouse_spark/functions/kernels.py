"""The two scalar kernels of the reference, as Column->Column functions.

Both compose JVM-side built-ins only — no Python UDFs — so they stay
inside whole-stage codegen and cost the same as any other expression at
100 TB scale (SURVEY.md §2 Part A rows ``parse_datetime_lenient`` and
``null_sentinel_normalize``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Sentinels treated as NULL for datetime inputs: case-insensitive after
# strip (reference main.py:90-91).
DATETIME_SENTINELS = ("", "null", "none", "n/a")

# Sentinels treated as NULL for plain string columns: exact-case, no
# strip, and note the asymmetry — no "n/a", "None" but not "none"
# (reference main.py:165). Keep the two sets distinct (SURVEY.md §7).
STRING_SENTINELS = ("", "null", "None")

# Pad group matches exactly ONE digit: the reference zfills to width 2,
# so 2-digit hours pass through and 3+-digit hours fail the strict gate.
_PAD_RE = r"^(\d{4}-\d{2}-\d{2}) (\d):(\d{2}):(\d{2})$"
_STRICT_RE = r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}$"


def parse_datetime_lenient(col: Column) -> Column:
    """Lenient string -> timestamp (reference main.py:87-105).

    Stages, in reference order:
      1. strip; case-insensitive sentinel ('', 'null', 'none', 'n/a') -> NULL
      2. truncate at the first '.' — fractional seconds are DROPPED, not
         rounded ('…22.999' -> '…22'), as is anything after them
      3. zero-pad a single-digit hour ('4:03:22' -> '04:03:22')
      4. strict 'YYYY-MM-DD HH:MM:SS' regex gate; non-matching -> NULL
      5. parse

    Documented divergence: the reference crashes on regex-valid but
    calendar-invalid values ('2025-13-45 99:99:99' reaches strptime and
    raises, main.py:101-103). Here ``try_to_timestamp`` returns NULL
    instead — strictly more robust; pinned in tests.
    """
    s = F.trim(col.cast("string"))
    s = F.when(F.lower(s).isin(*DATETIME_SENTINELS), F.lit(None)).otherwise(s)
    s = F.substring_index(s, ".", 1)
    s = F.regexp_replace(s, _PAD_RE, r"$1 0$2:$3:$4")
    return F.when(
        s.rlike(_STRICT_RE), F.try_to_timestamp(s, F.lit("yyyy-MM-dd HH:mm:ss"))
    ).otherwise(F.lit(None).cast("timestamp"))


def null_sentinel_normalize(col: Column) -> Column:
    """Exact-case sentinel normalization for non-datetime columns
    (reference main.py:165): '', 'null', 'None' -> NULL; everything else
    (including ' null ', 'NULL', 'N/A') passes through unchanged."""
    return F.when(col.isin(*STRING_SENTINELS), F.lit(None).cast("string")).otherwise(
        col
    )
