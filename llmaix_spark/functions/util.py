"""Small driver-side utilities (reference F8, J6, A8)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def format_time(seconds: float) -> str:
    """Seconds → human string (reference `format_time`,
    webapp/llm_processing/routes.py:79-87: s / min / h / d)."""
    if seconds < 60:
        return f"{seconds:.2f} s"
    if seconds < 3600:
        return f"{seconds / 60:.2f} min"
    if seconds < 86400:
        return f"{seconds / 3600:.2f} h"
    return f"{seconds / 86400:.2f} d"


def merge_metadata_expr(metadata_json: Column, run_metadata: dict) -> Column:
    """J6: tolerant metadata merge. The stored metadata JSON is parsed as
    a string map (unparseable / null → empty map — the reference's
    ast.literal_eval-with-fallback, webapp/llm_processing/routes.py:1019-1027),
    then the run's metadata is attached under fixed keys via map_concat
    (later key wins is NOT needed: run keys are namespaced)."""
    parsed = F.coalesce(
        F.from_json(metadata_json, "map<string,string>"),
        F.from_json(F.lit("{}"), "map<string,string>"),
    )
    # drop the run's keys from the STORED map first: map_concat throws
    # DUPLICATED_MAP_KEY (default dedup policy) when re-processing rows
    # whose metadata already carries a previous run's entry — run keys
    # win, matching the reference's dict assignment semantics
    run_keys = F.array(*[F.lit(k) for k in run_metadata])
    parsed = F.map_filter(
        parsed, lambda k, _v: ~F.array_contains(run_keys, k)
    )
    run_map = F.create_map(
        *[x for k, v in run_metadata.items() for x in (F.lit(k), F.lit(str(v)))]
    )
    return F.to_json(F.map_concat(parsed, run_map))


def leaderboard_mean(macro_row: DataFrame, metric_cols: list[str]) -> DataFrame:
    """A8: mean of the selected metric columns of the macro-score row
    (reference utils/leaderboard_conversion.py:117-129)."""
    n = len(metric_cols)
    total = None
    for c in metric_cols:
        col = F.col(c).cast("double")
        total = col if total is None else total + col
    return macro_row.select(
        *(F.col(c) for c in macro_row.columns),
        F.round(total / n, 6).alias("leaderboard_mean"),
    )
