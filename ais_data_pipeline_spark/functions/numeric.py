"""Smallest-integer-type chooser (reference T6).

The reference picks the narrowest dtype that holds an observed
[min, max] range, with unsigned and Boolean special cases (reference
notebooks/0_preprocessing.ipynb:3338-3374). Spark has no unsigned ints
(SURVEY §1.2), so the unsigned rungs map to the next-wider signed type
— ``UInt8→Short, UInt16→Int, UInt32→Long, UInt64→Decimal(20,0)`` — and
the chooser returns Spark types directly. Pure function: ideal for
property-based tests.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Signed ladder: (lo, hi, SparkType), narrowest first.
_SIGNED = [
    (-(2**7), 2**7 - 1, T.ByteType()),
    (-(2**15), 2**15 - 1, T.ShortType()),
    (-(2**31), 2**31 - 1, T.IntegerType()),
    (-(2**63), 2**63 - 1, T.LongType()),
]

#: Unsigned ladder mapped to Spark's signed types (widened).
_UNSIGNED = [
    (0, 2**8 - 1, T.ShortType()),
    (0, 2**16 - 1, T.IntegerType()),
    (0, 2**32 - 1, T.LongType()),
    (0, 2**64 - 1, T.DecimalType(20, 0)),
]


def smallest_int_type(
    min_val: int | None,
    max_val: int | None,
    has_nulls: bool = False,
    allow_boolean: bool = True,
) -> T.DataType:
    """Narrowest Spark type that holds [min_val, max_val].

    - all-null column → ByteType (narrowest; everything is null anyway);
    - {0,1} range → BooleanType when ``allow_boolean`` (reference's
      Boolean special case, notebooks/0_preprocessing.ipynb:3360-3362);
    - non-negative ranges walk the unsigned ladder first (mapped to the
      next-wider signed Spark type), matching the reference's preference
      for unsigned rungs; the signed ladder wins ties when it is
      narrower or equal.
    """
    if min_val is None or max_val is None:
        return T.ByteType()
    if allow_boolean and min_val >= 0 and max_val <= 1:
        return T.BooleanType()

    candidates = []
    for lo, hi, t in _SIGNED:
        if min_val >= lo and max_val <= hi:
            candidates.append(t)
            break
    if min_val >= 0:
        for lo, hi, t in _UNSIGNED:
            if max_val <= hi:
                candidates.append(t)
                break
    if not candidates:
        return T.DecimalType(38, 0)

    def width(t: T.DataType) -> int:
        order = {
            T.BooleanType: 1,
            T.ByteType: 1,
            T.ShortType: 2,
            T.IntegerType: 4,
            T.LongType: 8,
        }
        return order.get(type(t), 16)

    return min(candidates, key=width)


def index_sequence(n_col):
    """``[1..n]`` as ``array<int>``, EMPTY when ``n < 1``.

    ``F.sequence(lit(1), lit(0))`` yields the DESCENDING ``[1, 0]``
    (sequence auto-negates its step when start > stop), NOT the empty
    array a clamped ``greatest(size - k, 0)`` length intends — so any
    ``transform`` that indexes with the value dies on ``element_at(0)``
    (round-10 review: one sub-``n``-token document was a permanent
    poison pill for every shingling entry point, incl. the streaming
    dedup sink where the crashed batch replays forever) or goes
    silently wrong (``substr(0, n)``). Every index-sequence over a
    clamped length must come through here.
    """
    from pyspark.sql import functions as F

    return F.when(n_col >= 1, F.sequence(F.lit(1), n_col)).otherwise(
        F.array().cast("array<int>")
    )
