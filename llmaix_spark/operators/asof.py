"""Time-ordered join operators Spark's DataFrame API lacks natively:
as-of join (nearest-earlier/later match per key) and interval range
join (point-in-window match) — the two shapes an event-log analytics
layer needs constantly (trade↔quote, error↔preceding-state,
event↔incident-window).

Both are built so the plan NEVER degenerates into a
BroadcastNestedLoopJoin / cartesian theta-join (what a naive
``l.ts >= r.ts`` join condition gives you in Spark):

* ``asof_join`` is ONE union + ONE window pass: tag the two inputs,
  sort each key's timeline once, and carry the latest right-side
  payload forward with ``last(..., ignorenulls=True)``. Cost is a
  single shuffle on the ``by`` key — the merge-join formulation of
  as-of, O(|L|+|R|) per key instead of O(|L|·|R|).
* ``range_join`` buckets time into fixed-width cells: an interval
  lands in ``(len/width)+1`` cells, a point in exactly ONE, so each
  qualifying (interval, point) pair meets in exactly one equi-join
  group and needs no post-join dedup. The join is a plain hash
  equi-join on (by, bucket) that Catalyst/AQE can shuffle or
  broadcast like any other; duplication factor is bounded by the
  interval length the CALLER chose, never by data volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_tag"
_T = "__asof_t"
_PAY = "__asof_pay"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: for every ``left`` row, attach the ``right``
    row with the nearest ``on`` timestamp at-or-before it
    (``direction='backward'``) or at-or-after it (``'forward'``),
    matching on the ``by`` key columns. Unmatched left rows keep NULL
    right fields (left-outer semantics). Right columns are renamed
    with ``suffix`` on collision (the ``on`` column always becomes
    ``on + suffix``).

    Equal timestamps match (``>=`` / ``<=``), like DuckDB/pandas
    ``merge_asof``. The right side must be unique per (by, on) —
    pre-aggregate it otherwise, or ties make the match
    engine-dependent.

    ``tolerance_us``: maximum |left.on − right.on| in microseconds;
    matches farther than that are nulled out (pandas ``tolerance``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: bad direction {direction!r}")
    by = list(by or [])
    lcols = left.columns
    rpay = [c for c in right.columns if c not in by]
    out_names = {
        c: (c + suffix) if (c in lcols or c == on) else c for c in rpay
    }

    r2 = right.select(
        *by,
        F.col(on).alias(_T),
        F.struct(*[F.col(c) for c in rpay]).alias(_PAY),
        F.lit(0).alias(_TAG),
    )
    l2 = left.select(
        *lcols,
        F.col(on).alias(_T),
        F.lit(None).cast(r2.schema[_PAY].dataType).alias(_PAY),
        F.lit(1).alias(_TAG),
    )
    # right rows sort before left rows at an equal timestamp in BOTH
    # directions, so ties are visible to the carry-forward:
    #   backward: (t ASC, tag ASC)   forward: (t DESC, tag ASC)
    order = [
        F.col(_T).asc() if direction == "backward" else F.col(_T).desc(),
        F.col(_TAG).asc(),
    ]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    carried = F.last(_PAY, ignorenulls=True).over(w)
    matched = u.withColumn(_PAY, carried).where(F.col(_TAG) == 1)
    if tolerance_us is not None:
        lag = F.abs(F.col(_T) - F.col(f"{_PAY}.{on}"))
        matched = matched.withColumn(
            _PAY, F.when(lag <= F.lit(tolerance_us), F.col(_PAY))
        )
    return matched.select(
        *lcols,
        *[
            F.col(f"{_PAY}.{c}").alias(out_names[c])
            for c in rpay
        ],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: list[str] | None = None,
    bucket_width: int = 300_000_000,
) -> DataFrame:
    """Inner join of ``points`` rows into ``intervals`` rows with
    ``start <= point < end`` (half-open) and equal ``by`` keys. All
    three bound columns must be integer-comparable (e.g. epoch
    microseconds); ``bucket_width`` is in the same unit and should be
    on the order of the typical interval length — each interval is
    replicated into ``(end-start)/width + 1`` buckets, each point
    into exactly one, so a qualifying pair meets exactly once (no
    dedup) and the whole thing is one hash equi-join."""
    by = list(by or [])
    overlap = set(points.columns) & set(intervals.columns) - set(by)
    if overlap:
        raise ValueError(
            f"range_join: rename overlapping non-key columns {sorted(overlap)}"
        )
    w = F.lit(int(bucket_width))
    # last bucket: end is exclusive, so (end-1)//w — but greatest()
    # pins it at the start bucket for empty intervals (end <= start),
    # or Spark's sequence() would DESCEND and fabricate buckets.
    iv = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w),
                F.greatest(
                    F.floor(F.col(start_col) / w),
                    F.floor((F.col(end_col) - 1) / w),
                ),
            )
        ),
    ).alias("__iv")
    pt = points.withColumn(
        "__bkt", F.floor(F.col(point_col) / w)
    ).alias("__pt")
    cond = (
        [F.col("__pt.__bkt") == F.col("__iv.__bkt")]
        + [F.col(f"__pt.{c}") == F.col(f"__iv.{c}") for c in by]
        + [
            F.col(f"__pt.{point_col}") >= F.col(f"__iv.{start_col}"),
            F.col(f"__pt.{point_col}") < F.col(f"__iv.{end_col}"),
        ]
    )
    joined = iv.join(pt, cond, "inner")
    keep_iv = [F.col(f"__iv.{c}") for c in intervals.columns]
    keep_pt = [
        F.col(f"__pt.{c}") for c in points.columns if c not in by
    ]
    return joined.select(*keep_iv, *keep_pt)
