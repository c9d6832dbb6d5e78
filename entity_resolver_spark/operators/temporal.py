"""Temporal joins: as-of join and range join, the analytics-engine staples.

The reference has no temporal operators (its data is a static catalog dump),
but an engine serving transcript/event workloads needs them: "state of X as
of event time" (as-of) and "events inside a validity window" (range). Both
are implemented shuffle-lean:

* ``asof_join`` — the union-tag trick: tag both sides, union, sort within
  key by (time, tag) and carry the most recent right row forward with
  ``last(..., ignorenulls=True)`` over an unbounded-preceding window. ONE
  shuffle on the key, no join blow-up, no per-key driver loops — this is the
  100-TB shape (a join + filter + row_number needs the same shuffle but
  materializes |L|x|matching R| intermediates first).
* ``range_join`` — equi-join on key plus interval containment. Spark turns
  the containment predicate into a post-join filter; for skewed keys the
  caller buckets time (``bucket_minutes``) so the equi-join key is
  (key, time_bucket) and each right row is replicated only into the buckets
  its interval covers — bounded fan-out instead of per-key cross products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach ``value_cols`` of the most recent right row
    of the same ``on`` key with right_ts <= left_ts (direction='backward';
    'forward' takes the earliest right row with right_ts >= left_ts).
    Left rows with no match keep NULLs. Ties on timestamp: the right row
    sorts before the left row, so an exactly-equal timestamp DOES match.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    lcols = left.columns
    clash = set(value_cols) & set(lcols)
    if clash:
        raise ValueError(
            f"value_cols {sorted(clash)} collide with left columns; "
            "rename them on the right side before joining"
        )
    # Tag: right rows carry the payload as ONE struct, left rows carry a NULL
    # struct. After the union, within each key ordered by (ts, tag),
    # last(struct, ignorenulls) over unbounded-preceding is exactly "the most
    # recent right ROW at or before me" (right tag 0 sorts before left tag 1
    # at equal ts). A single struct — not one last() per column — so a NULL
    # field inside the matched right row stays NULL instead of being
    # back-filled from an older row (ASOF returns the matched row verbatim).
    payload = F.struct(*[F.col(c).alias(c) for c in value_cols])
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__tag"),
        payload.alias("__p"),
    )
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    u = r.select(
        *[
            F.lit(None).cast(l.schema[f"__l_{c}"].dataType).alias(f"__l_{c}")
            for c in lcols
        ],
        *r.columns,
    ).unionByName(
        l.select(*[F.col(f"__l_{c}") for c in lcols], "__k", "__t", "__tag", "__p")
    )
    order = F.asc("__t") if direction == "backward" else F.desc("__t")
    w = (
        Window.partitionBy("__k")
        .orderBy(order, F.asc("__tag"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *u.columns, F.last("__p", ignorenulls=True).over(w).alias("__f")
    )
    out = filled.where(F.col("__tag") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *[F.col("__f")[c].alias(c) for c in value_cols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    start: str,
    end: str,
    bucket_minutes: int | None = None,
) -> DataFrame:
    """Rows of ``left`` joined to every ``right`` row of the same key whose
    [start, end] interval contains left.ts (inclusive both ends).

    With ``bucket_minutes`` set, both sides get a time-bucket equi-key:
    the right side explodes its interval into the buckets it covers, so the
    join is (key, bucket)-equi and containment is a cheap post-filter —
    the skew-safe form when single keys have huge row counts.
    """
    if bucket_minutes is None:
        cond = (
            (left[on] == right[on])
            & (left[ts] >= right[start])
            & (left[ts] <= right[end])
        )
        return left.join(right, cond).drop(right[on])
    step = bucket_minutes * 60
    lb = left.withColumn("__bkt", (F.unix_timestamp(F.col(ts)) / step).cast("long"))
    rb = right.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start)) / step).cast("long"),
                (F.unix_timestamp(F.col(end)) / step).cast("long"),
            )
        ),
    )
    joined = lb.join(rb, (lb[on] == rb[on]) & (lb["__bkt"] == rb["__bkt"]))
    return (
        joined.where((lb[ts] >= rb[start]) & (lb[ts] <= rb[end]))
        .drop(rb[on])
        .drop(lb["__bkt"])
        .drop(rb["__bkt"])
    )
