"""Streaming attribution: the stream-stream interval join.

The batch twin is ``operators.temporal.range_join`` (bucketed
equi-join).  In-stream, Spark's OWN stream-stream join is the right
physical plan: an equality key plus a time-range condition is exactly
the shape Structured Streaming supports natively, and the watermarks
bound join state — each side buffers only rows whose event time can
still match the other side's future rows, so state is
O(window · arrival rate) regardless of stream length.  This is the
one temporal operator where no custom encoding beats the built-in.

Scale contract: both sides MUST carry watermarks (state would
otherwise grow without bound); the join emits a match as soon as both
rows have arrived, and a left row is dropped from state once the
right watermark passes ``left.ts + upper_seconds``.  Late rows beyond
the watermark are dropped — the same trade every watermarked operator
in this package makes (`streaming/stateful.py`).

Reference analogue: anndb has no temporal joins at all (SURVEY §2.2 —
joins: none); this extends the engine the same way the batch
range_join does, re-expressed on Spark's streaming state machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_attribution(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    lower_seconds: float = 0.0,
    upper_seconds: float = 600.0,
    watermark_seconds: float = 3600.0,
    prefix: str = "right_",
) -> DataFrame:
    """Streaming (left, right) pairs with ``right.on`` in
    [left.on + lower_seconds, left.on + upper_seconds] per ``by`` key
    — returns the joined streaming DataFrame (caller attaches the
    sink).  Right columns arrive as ``prefix + name``; ``delta_us``
    carries the exact microsecond gap (micros-cast is NTZ-safe).
    """
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds must be >= lower_seconds")
    wm = f"{watermark_seconds} seconds"
    # watermarks accept TIMESTAMP only; the NTZ->LTZ cast shifts both
    # sides by the same session-zone offset, so window membership and
    # deltas are unchanged (same argument as the batch range_join)
    l2 = left.withColumn(on, F.col(on).cast("timestamp")).withWatermark(
        on, wm
    )
    r2 = (
        right.select(
            F.col(by),
            *[
                F.col(c).alias(prefix + c)
                for c in right.columns
                if c != by
            ],
        )
        .withColumn(prefix + on, F.col(prefix + on).cast("timestamp"))
        .withWatermark(prefix + on, wm)
    )
    lo = F.make_dt_interval(secs=F.lit(float(lower_seconds)))
    hi = F.make_dt_interval(secs=F.lit(float(upper_seconds)))
    cond = (
        (l2[by] == r2[by])
        & (r2[prefix + on] >= l2[on] + lo)
        & (r2[prefix + on] <= l2[on] + hi)
    )
    joined = l2.join(r2, cond).drop(r2[by])
    return joined.withColumn(
        "delta_us",
        F.unix_micros(F.col(prefix + on).cast("timestamp"))
        - F.unix_micros(F.col(on).cast("timestamp")),
    )
