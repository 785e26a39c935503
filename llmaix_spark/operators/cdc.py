"""Change-data-capture apply: merge an upsert/delete feed into a snapshot.

The batch twin of Delta/Iceberg MERGE and of streaming CDC apply-changes:
given a base snapshot and a change feed (key, seq, op, payload...), emit
the post-merge snapshot — last change per key wins, ``delete`` removes
the row, ``upsert`` replaces the WHOLE payload (CDC row-image semantics,
not per-column coalesce), unseen keys insert, untouched base rows pass
through.

Scale notes (100 TB):
- One row_number window per key over the change feed (the feed is
  orders of magnitude smaller than the snapshot; partitioned by key so
  no global sort), then ONE full-outer equi-join on the key — the same
  shape Delta's MERGE plans. With a bucketed base table the join is
  shuffle-free on the snapshot side.
- No driver-side state; the op never materializes keys outside the
  join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Merge ``changes`` into ``base``; returns the new snapshot.

    ``changes`` must carry ``key_cols``, ``seq_col`` (monotone per key;
    ties broken by op then payload — supply unique seqs for
    deterministic results), ``op_col`` in {'upsert', 'delete'}, and the
    same payload columns as ``base``.
    """
    keys = list(key_cols)
    payload = [c for c in base.columns if c not in keys]
    missing = [c for c in payload if c not in changes.columns]
    if missing:
        raise ValueError(f"changes feed lacks payload columns {missing}")

    # last change per key; the extra orderBy terms make ties total
    w = Window.partitionBy(*keys).orderBy(
        F.desc(seq_col), F.desc(op_col), *[F.desc(c) for c in payload]
    )
    latest = (
        changes.select(*keys, seq_col, op_col, *payload)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", seq_col)
    )
    b = base.alias("b")
    c = latest.alias("c")
    # name-list join: Spark emits ONE coalesced key column per key
    merged = b.join(c, keys, "full_outer")
    has_change = F.col(f"c.{op_col}").isNotNull()
    out_cols = [F.col(k) for k in keys] + [
        F.when(has_change, F.col(f"c.{p}"))
        .otherwise(F.col(f"b.{p}"))
        .alias(p)
        for p in payload
    ]
    return merged.filter(
        ~has_change | (F.col(f"c.{op_col}") != F.lit("delete"))
    ).select(*out_cols)


def scd2_history(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Slowly-changing-dimension type-2 historization of a CDC feed.

    Emits one row per key VERSION: the payload plus ``valid_from``
    (the seq that opened it), ``valid_to`` (the seq of the next change
    — NULL while open) and ``is_current``. Base-snapshot rows enter as
    version seq 0; an upsert closes the previous version and opens a
    new one; a delete closes the previous version without opening
    another (a key whose last change is a delete has NO current row).

    Plan shape: union(base-as-seq-0, feed) → ONE lead() window per key
    ordered by seq → drop the delete markers. No joins at all — the
    history is derived entirely from the per-key ordering, so the op
    scales as one exchange on the key hash.
    """
    keys = list(key_cols)
    payload = [c for c in base.columns if c not in keys]
    missing = [c for c in payload if c not in changes.columns]
    if missing:
        raise ValueError(f"changes feed lacks payload columns {missing}")
    versions = base.select(
        *keys,
        F.lit(0).cast("bigint").alias("_seq"),
        F.lit("upsert").alias("_op"),
        *payload,
    ).unionByName(
        changes.select(
            *keys,
            F.col(seq_col).cast("bigint").alias("_seq"),
            F.col(op_col).alias("_op"),
            *payload,
        )
    )
    w = Window.partitionBy(*keys).orderBy("_seq")
    out = versions.select(
        *keys,
        *payload,
        F.col("_seq").alias("valid_from"),
        F.lead("_seq").over(w).alias("valid_to"),
        F.col("_op").alias("_op"),
    )
    return out.filter(F.col("_op") != "delete").select(
        *keys,
        *payload,
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Change-data-feed generation — the inverse of ``apply_changes``:
    given two snapshots of a keyed table, emit per key what happened
    (insert / delete / update, optionally unchanged) with both sides'
    values as ``<col>_old`` / ``<col>_new``. Comparison is null-safe
    (NULL → NULL is unchanged, NULL → value is an update) — the
    semantics Delta's CDF and every audit diff needs.

    Plan: ONE full outer join hash-partitioned on the key columns —
    both snapshots shuffle once on the same key, no window, no
    collect; the change classification is a pure projection.
    At rest both snapshots of a 100 TB table would be bucketed on the
    key, making the join exchange-free.
    """
    compare_cols = compare_cols or [
        c for c in old.columns if c not in keys
    ]
    o = old.select(
        *keys, *[F.col(c).alias(f"{c}_old") for c in compare_cols]
    ).withColumn("_in_old", F.lit(True))
    n = new.select(
        *keys, *[F.col(c).alias(f"{c}_new") for c in compare_cols]
    ).withColumn("_in_new", F.lit(True))
    j = o.join(n, keys, "full_outer")
    differs = None
    for c in compare_cols:
        d = ~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
        differs = d if differs is None else (differs | d)
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(differs, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.withColumn("change", change).drop("_in_old", "_in_new")
    if not include_unchanged:
        out = out.where(F.col("change") != "unchanged")
    pairs = [x for c in compare_cols for x in (f"{c}_old", f"{c}_new")]
    return out.select(*keys, "change", *pairs)
