"""F11 prometheus parse + M7 confusion-matrix SVG rendering (stdlib twins
of reference parse_metrics @ llm_processing/routes.py:165-177 and the
seaborn renderers @ report_redaction/utils.py:271-345)."""

from __future__ import annotations

import math

from llmaix_spark.functions.render import (
    confusion_matrix_svg_from_counts,
    confusion_matrix_svg_from_long,
    render_confusion_matrix_svg,
)
from llmaix_spark.functions.telemetry import parse_prometheus_text

LLAMA_METRICS = """\
# HELP llamacpp:prompt_tokens_total Number of prompt tokens processed.
# TYPE llamacpp:prompt_tokens_total counter
llamacpp:prompt_tokens_total 1024
# HELP llamacpp:tokens_predicted_total Number of generation tokens processed.
# TYPE llamacpp:tokens_predicted_total counter
llamacpp:tokens_predicted_total 2.5e3
# TYPE llamacpp:kv_cache_usage_ratio gauge
llamacpp:kv_cache_usage_ratio 0.25
with_labels{slot="0",model="m"} 7
nan_metric NaN

# malformed lines are skipped, never fatal
garbage line without a number here
"""


def test_parse_prometheus_text():
    got = parse_prometheus_text(LLAMA_METRICS)
    assert got["llamacpp:prompt_tokens_total"] == 1024.0
    assert got["llamacpp:tokens_predicted_total"] == 2500.0
    assert got["llamacpp:kv_cache_usage_ratio"] == 0.25
    assert got["with_labels"] == 7.0
    assert math.isnan(got["nan_metric"])
    assert "garbage" not in got


def test_parse_prometheus_empty_and_none():
    assert parse_prometheus_text("") == {}
    assert parse_prometheus_text(None) == {}


def test_confusion_matrix_svg_from_counts():
    svg = confusion_matrix_svg_from_counts(
        8, 5, 2, 1, title="CM for high_value", xlabel="LLM", ylabel="GT"
    )
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    # counts annotated; row-normalized fractions like the reference
    assert ">8<" in svg and ">(0.89)<" in svg  # tp / (tp+fn) = 8/9
    assert ">2<" in svg and ">(0.29)<" in svg  # fp / (fp+tn) = 2/7
    assert "CM for high_value" in svg
    assert "true" in svg and "false" in svg


def test_render_zero_row_guard():
    svg = render_confusion_matrix_svg([[0, 0], [1, 3]], ["a", "b"])
    assert "(0.00)" in svg  # zero row renders, no division error


def test_render_escapes_labels():
    svg = render_confusion_matrix_svg([[1]], ["<evil>"], title="a<b")
    assert "<evil>" not in svg and "&lt;evil&gt;" in svg


def test_confusion_matrix_from_long_format(spark):
    """The distributed M4 long-format CM renders directly."""
    from pyspark.sql import functions as F

    from llmaix_spark.evaluation import multiclass_confusion

    df = spark.createDataFrame(
        [("l", "a", "a"), ("l", "a", "b"), ("l", "b", "b"), ("l", "b", "b")],
        ["label", "gt_v", "pred_v"],
    )
    cm = multiclass_confusion(df, "gt_v", "pred_v")
    svg = confusion_matrix_svg_from_long(cm, title="demo")
    assert svg.startswith("<svg")
    assert ">(0.50)<" in svg  # a-row split 1/1
    assert ">2<" in svg  # b→b count


def test_confusion_matrix_from_long_with_nulls(spark):
    """NULL gt/pred (failed extraction, outer join) renders as a '(null)'
    class instead of crashing sorted() on None."""
    from llmaix_spark.functions.render import confusion_matrix_svg_from_long

    cm = spark.createDataFrame(
        [("a", "a", 3), ("a", None, 2), (None, "a", 1)],
        "gt string, pred string, n bigint",
    )
    svg = confusion_matrix_svg_from_long(cm)
    assert "(null)" in svg and "<svg" in svg
