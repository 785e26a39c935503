"""Evaluation operators — the correctness oracle (SURVEY §2.10).

M8 (triple-level P/R vs reference) is the north-rule gate; M3/M4/M5
(boolean/multiclass/stringmatch label metrics) are the reference's label
evaluation recast as pure groupBy aggregations — no sklearn, no per-row
Python (reference webapp/labelannotation/routes.py:146-375 rebuilt from
summed counts, closed-form)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from llmaix_spark.functions.text import boolean_coerce_expr, norm_surface_expr


def triple_precision_recall(
    ours: DataFrame, reference: DataFrame, normalize: bool = True
) -> dict[str, float]:
    """M8: P = |∩| / |ours|, R = |∩| / |ref| over distinct
    (subj, pred, obj). Two distincts + one join — all on the same key."""
    cols = ["subj", "pred", "obj"]

    def prep(df: DataFrame) -> DataFrame:
        if normalize:
            df = df.select(
                norm_surface_expr(F.col("subj")).alias("subj"),
                F.col("pred"),
                norm_surface_expr(F.col("obj")).alias("obj"),
            )
        return df.select(cols).distinct()

    a = prep(ours).cache()
    b = prep(reference).cache()
    try:
        n_ours = a.count()
        n_ref = b.count()
        n_common = a.join(b, cols).count()
    finally:
        # landmine #1: release once the three counts materialized —
        # repeated evaluations otherwise accrete cached blocks
        a.unpersist()
        b.unpersist()
    p = n_common / n_ours if n_ours else 0.0
    r = n_common / n_ref if n_ref else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {
        "precision": p,
        "recall": r,
        "f1": f1,
        "ours": n_ours,
        "ref": n_ref,
        "common": n_common,
    }


# --- label metrics (M3/M5/M6) -------------------------------------------------


def boolean_label_metrics(
    joined: DataFrame, gt_col: str, pred_col: str, label_col: str = "label"
) -> DataFrame:
    """Per-label boolean confusion counts + derived metrics, closed-form
    from sums (reference calculate_metrics_boolean + final-from-counts,
    webapp/labelannotation/routes.py:176-232, :310-330)."""
    g = boolean_coerce_expr(F.col(gt_col))
    p = boolean_coerce_expr(F.col(pred_col))
    counted = joined.groupBy(label_col).agg(
        F.sum((g & p).cast("long")).alias("tp"),
        F.sum(((~g) & (~p)).cast("long")).alias("tn"),
        F.sum(((~g) & p).cast("long")).alias("fp"),
        F.sum((g & (~p)).cast("long")).alias("fn"),
    )
    tp, tn, fp, fn = (F.col(c) for c in ("tp", "tn", "fp", "fn"))
    total = tp + tn + fp + fn
    precision = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(F.lit(0.0))
    recall = F.when(tp + fn > 0, tp / (tp + fn)).otherwise(F.lit(0.0))
    return counted.select(
        label_col,
        "tp",
        "tn",
        "fp",
        "fn",
        F.when(total > 0, (tp + tn) / total).otherwise(F.lit(0.0)).alias("accuracy"),
        precision.alias("precision"),
        recall.alias("recall"),
        F.when(
            precision + recall > 0,
            2 * precision * recall / (precision + recall),
        )
        .otherwise(F.lit(0.0))
        .alias("f1"),
        F.when(tn + fp > 0, tn / (tn + fp)).otherwise(F.lit(0.0)).alias("specificity"),
        F.when(tn + fp > 0, fp / (tn + fp)).otherwise(F.lit(0.0)).alias("false_positive_rate"),
        F.when(tp + fn > 0, fn / (tp + fn)).otherwise(F.lit(0.0)).alias("false_negative_rate"),
    )


def stringmatch_label_metrics(
    joined: DataFrame, gt_col: str, pred_col: str, label_col: str = "label"
) -> DataFrame:
    """M5: case-insensitive equality → match/no_match + accuracy
    (reference webapp/labelannotation/routes.py:234-260, :363-375)."""
    eq = F.lower(F.trim(F.col(gt_col))) == F.lower(F.trim(F.col(pred_col)))
    return joined.groupBy(label_col).agg(
        F.sum(eq.cast("long")).alias("match"),
        F.sum((~eq).cast("long")).alias("no_match"),
        F.avg(eq.cast("double")).alias("accuracy"),
    )


def multiclass_confusion(
    joined: DataFrame, gt_col: str, pred_col: str, label_col: str = "label"
) -> DataFrame:
    """M4 in long format: (label, gt, pred, count) — the scalable
    representation of the reference's list-of-lists confusion matrices
    (webapp/labelannotation/routes.py:289-308 sums them element-wise;
    summing long-format rows is the same monoid)."""
    return joined.groupBy(
        label_col, F.col(gt_col).alias("gt"), F.col(pred_col).alias("pred")
    ).agg(F.count(F.lit(1)).alias("n"))


def macro_scores(per_label: DataFrame, metric_cols: list[str]) -> DataFrame:
    """A3/A4 macro row: mean of per-label metrics (reference
    accumulate_metrics, webapp/labelannotation/routes.py:378-491)."""
    return per_label.agg(
        *[F.avg(c).alias(f"macro_{c}") for c in metric_cols]
    )
