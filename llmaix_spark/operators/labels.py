"""Label-annotation evaluation dataflow (JN1/JN2, A6, A7).

Reference: webapp/labelannotation/routes.py — LLM-output rows joined to a
ground-truth annotation table on the shortened report id (:796-809, left
join with an existence indicator; unmatched rows are a hard error), label
types inferred from the value sets (:685-691), per-report metrics
pivoted into a wide export table with macro/micro rows appended
(:852-906).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from llmaix_spark.functions.text import report_id_short_expr


def join_annotations(
    llm_output: DataFrame,
    annotations: DataFrame,
    llm_id_col: str = "id",
    ann_id_col: str = "id",
) -> tuple[DataFrame, DataFrame]:
    """JN1: left join LLM output to annotations on report_id_short with
    an existence indicator. Returns (joined, unmatched) — the reference
    fails the job if unmatched is non-empty (routes.py:803-809); here
    the caller decides. Annotation tables are small → broadcast."""
    left = llm_output.withColumn(
        "report_id_short", report_id_short_expr(F.col(llm_id_col))
    )
    right = annotations.withColumnRenamed(ann_id_col, "_ann_id")
    joined = left.join(
        F.broadcast(right),
        left.report_id_short == F.col("_ann_id"),
        "left",
    ).withColumn("matched", F.col("_ann_id").isNotNull())
    unmatched = joined.filter(~F.col("matched")).select(
        llm_id_col, "report_id_short"
    )
    return joined, unmatched


def expect_exactly_one(
    annotations: DataFrame, key_col: str = "id"
) -> DataFrame:
    """JN2: keys violating the expect-exactly-1 contract
    (reference generate_report_dict raise, routes.py:500-507) —
    empty result ⇔ contract holds."""
    return (
        annotations.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") != 1)
    )


_BOOLISH = {"true", "false", "1", "0", "yes", "no", "y", "n", "ja", "nein"}


def infer_label_types(
    joined: DataFrame, label_cols: list[str]
) -> dict[str, str]:
    """A6: boolean if the value set is bool-ish; multiclass if the value
    set is small relative to rows (enumerable classes); else stringmatch
    (reference labelannotation/routes.py:685-691). One collect_set pass
    per label, single aggregation."""
    # collect_set dedupes incrementally (buffer bounded by distinct-value
    # cardinality — collect_list would buffer one element per ROW); the
    # duplicate test compares against the NON-NULL count per column, or a
    # unique-valued column with some nulls would read as "has duplicates"
    agg = joined.agg(
        *[
            F.collect_set(
                F.lower(F.trim(F.col(c).cast("string")))
            ).alias(c)
            for c in label_cols
        ],
        *[F.count(F.col(c)).alias(f"_n_{c}") for c in label_cols],
    ).collect()[0]
    out = {}
    for c in label_cols:
        values = set(agg[c] or [])
        if values and values <= _BOOLISH:
            out[c] = "boolean"
        elif 0 < len(values) < agg[f"_n_{c}"]:
            # repeated values ⇒ enumerable classes (reference
            # labelannotation/routes.py:685-691: duplicates ⇒ multiclass)
            out[c] = "multiclass"
        else:
            out[c] = "stringmatch"
    return out


def export_pivot(
    per_report_metrics: DataFrame,
    id_col: str = "id",
    label_col: str = "label",
    metric_cols: tuple[str, ...] = ("accuracy",),
) -> DataFrame:
    """A7: report × (label$metric) wide export table
    (reference generate_export_df, webapp/report_redaction/routes.py:683-753).
    One pivot; macro rows are a separate small aggregate the caller can
    union (kept separate here — appending summary rows to a data table
    is a presentation concern)."""
    aggs = [F.first(m).alias(m) for m in metric_cols]
    return per_report_metrics.groupBy(id_col).pivot(label_col).agg(*aggs)


def join_file_manifest(
    records: DataFrame,
    manifest: DataFrame,
    id_col: str = "id",
    path_col: str = "path",
) -> DataFrame:
    """JN3: records ⋈ file manifest by id. The reference constructs the
    path per row from a directory listing
    (webapp/report_redaction/routes.py:420 — os.path.join(zip_dir,
    f"{id}.pdf")); distributed, the listing is a table (e.g. binaryFile
    source + input_file_name) joined once — AQE broadcasts the manifest
    when it fits. Duplicate manifest rows per id are collapsed first
    (the reference's filesystem guarantees one file per id; a duplicate
    would otherwise fan out the records), and `file_found` marks records
    whose file is missing instead of erroring row-by-row."""
    m = manifest.select(F.col(id_col), F.col(path_col)).dropDuplicates(
        [id_col]
    )
    return records.join(m, id_col, "left").withColumn(
        "file_found", F.col(path_col).isNotNull()
    )
