"""Redaction evaluation — char-level confusion metrics (M1/M2/A3).

The reference compares three equal-length strings per report — ground
truth dollartext, automatic dollartext, original — counting tp/fp/tn/fn
over positions whose original char is not in a special set
(webapp/report_redaction/utils.py:347-380, pinned by
webapp/report_redaction/tests/test_metrics.py:23-63). Accumulation
(webapp/report_redaction/routes.py:545-655): macro = mean of per-report
metrics, micro = recompute from summed counts.

Spark shape: the char kernel is a scalar pandas UDF emitting a count
struct (one narrow pass); macro and micro are two small aggregations of
the counts — no sklearn, no driver loops.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# positions whose ORIGINAL char is in this set are skipped by the
# char-level confusion counts (reference calculate_metrics,
# report_redaction/utils.py:352-355)
SKIP_CHARS = set(" ,.!?:;-()\"'\n")

_COUNTS_SCHEMA = T.StructType(
    [
        T.StructField("tp", T.LongType()),
        T.StructField("fp", T.LongType()),
        T.StructField("tn", T.LongType()),
        T.StructField("fn", T.LongType()),
    ]
)


def redaction_counts(
    ground_truth: str, automatic: str, original: str, redacted_char: str = "■"
) -> tuple[int, int, int, int]:
    """Python kernel — exact port of the reference counting rules,
    including the length-equality assertion (utils.py:348-350)."""
    assert len(ground_truth) == len(automatic) == len(original), (
        "All texts must have the same length"
    )
    tp = fp = tn = fn = 0
    for g, a, o in zip(ground_truth, automatic, original):
        if o in SKIP_CHARS:
            continue
        if g == redacted_char and a == redacted_char:
            tp += 1
        elif g != redacted_char and a == redacted_char:
            fp += 1
        elif g != redacted_char and a != redacted_char:
            tn += 1
        else:
            fn += 1
    return tp, fp, tn, fn


def redaction_counts_udf(redacted_char: str = "■"):
    def _counts(gt: pd.Series, auto: pd.Series, orig: pd.Series) -> pd.DataFrame:
        # null guard (convention of every masking UDF): a row with a NULL
        # text contributes zero counts instead of a TypeError that kills
        # the stage
        s = lambda v: v if isinstance(v, str) else ""  # noqa: E731 (None/NaN)
        rows = [
            redaction_counts(s(g), s(a), s(o), redacted_char)
            for g, a, o in zip(gt, auto, orig)
        ]
        return pd.DataFrame(rows, columns=["tp", "fp", "tn", "fn"])

    return F.pandas_udf(_counts, _COUNTS_SCHEMA)


def _derived(tp, fp, tn, fn):
    precision = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(F.lit(0.0))
    recall = F.when(tp + fn > 0, tp / (tp + fn)).otherwise(F.lit(0.0))
    total = tp + tn + fp + fn
    return {
        "precision": precision,
        "recall": recall,
        "accuracy": F.when(total > 0, (tp + tn) / total).otherwise(F.lit(0.0)),
        "f1_score": F.when(
            precision + recall > 0, 2 * precision * recall / (precision + recall)
        ).otherwise(F.lit(0.0)),
        "specificity": F.when(tn + fp > 0, tn / (tn + fp)).otherwise(F.lit(0.0)),
        "false_positive_rate": F.when(tn + fp > 0, fp / (tn + fp)).otherwise(F.lit(0.0)),
        "false_negative_rate": F.when(tp + fn > 0, fn / (tp + fn)).otherwise(F.lit(0.0)),
    }


def score_redactions(
    df: DataFrame,
    gt_col: str = "gt_text",
    auto_col: str = "auto_text",
    orig_col: str = "orig_text",
    redacted_char: str = "■",
) -> DataFrame:
    """Per-row counts + derived metrics (M1+M2). Input rows carry the
    three aligned strings (and any id/label columns, passed through)."""
    counts = redaction_counts_udf(redacted_char)(
        F.col(gt_col), F.col(auto_col), F.col(orig_col)
    )
    out = df.withColumn("_c", counts)
    tp, fp, tn, fn = (F.col(f"_c.{c}").cast("double") for c in ("tp", "fp", "tn", "fn"))
    derived = _derived(tp, fp, tn, fn)
    return out.select(
        *[c for c in df.columns if c not in (gt_col, auto_col, orig_col)],
        F.col("_c.tp").alias("tp"),
        F.col("_c.fp").alias("fp"),
        F.col("_c.tn").alias("tn"),
        F.col("_c.fn").alias("fn"),
        *[F.round(v, 4).alias(k) for k, v in derived.items()],
    )


def classwise_dollartext(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    replacement_char: str = "■",
) -> DataFrame:
    """F5 classwise variant, distributed: docs(id, text) +
    spans(id, label, begin, end) → (id, label, dollartext) with only that
    label's spans masked (reference generate_classwise_dollartext,
    webapp/report_redaction/utils.py:186-217 — a driver-side dict of one
    masked text per label; here one ROW per (doc, label), which is the
    shape `accumulate_redaction_metrics(label_col=...)` consumes).

    One map-side-combinable groupBy((id, label)) collects the span list,
    one join attaches the text (AQE broadcasts whichever side is small),
    and the masking itself is a row-local Arrow UDF — no further shuffle.
    """
    from llmaix_spark.functions.masking import dollartext_udf

    agg = spans.groupBy(id_col, "label").agg(
        F.collect_list(
            F.array(F.col("begin").cast("int"), F.col("end").cast("int"))
        ).alias("_spans")
    )
    joined = agg.join(docs.select(id_col, text_col), id_col)
    return joined.select(
        id_col,
        "label",
        dollartext_udf(replacement_char)(
            F.col(text_col), F.col("_spans")
        ).alias("dollartext"),
    )


def accumulate_redaction_metrics(
    scored: DataFrame, label_col: str | None = None
) -> DataFrame:
    """A3: per-label (or overall) accumulation. macro_* = mean of
    per-report metrics; micro_* = recomputed from summed counts
    (reference accumulate_metrics, webapp/report_redaction/routes.py:545-655).

    Faithful-port note: macro averages the per-report values AFTER their
    4dp rounding, because the reference accumulates generate_score_dict
    outputs, which are already rounded — averaging unrounded values
    would diverge from it by up to 1 ulp at 4dp."""
    keys = [label_col] if label_col else []
    g = scored.groupBy(*keys) if keys else scored.groupBy()
    sums = g.agg(
        F.sum("tp").alias("tp"),
        F.sum("fp").alias("fp"),
        F.sum("tn").alias("tn"),
        F.sum("fn").alias("fn"),
        *[
            F.avg(c).alias(f"macro_{c}")
            for c in (
                "precision",
                "recall",
                "accuracy",
                "f1_score",
                "specificity",
            )
        ],
    )
    tp, fp, tn, fn = (F.col(c).cast("double") for c in ("tp", "fp", "tn", "fn"))
    derived = _derived(tp, fp, tn, fn)
    return sums.select(
        *keys,
        "tp",
        "fp",
        "tn",
        "fn",
        *[F.round(F.col(f"macro_{c}"), 4).alias(f"macro_{c}") for c in (
            "precision", "recall", "accuracy", "f1_score", "specificity")],
        *[F.round(v, 4).alias(f"micro_{k}") for k, v in derived.items()],
    )
