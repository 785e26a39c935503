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
    broadcast: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """JN1: left join LLM output to annotations on report_id_short with
    an existence indicator. Returns (joined, unmatched) — the reference
    fails the job if unmatched is non-empty (routes.py:803-809); here
    the caller decides. broadcast=True fits the reference's shape (a
    hand-curated annotation CSV, small by construction); pass False for
    a machine-generated ground-truth table that scales with the corpus
    and AQE will pick the strategy by measured size."""
    left = llm_output.withColumn(
        "report_id_short", report_id_short_expr(F.col(llm_id_col))
    )
    right = annotations.withColumnRenamed(ann_id_col, "_ann_id")
    joined = left.join(
        F.broadcast(right) if broadcast else right,
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


# The reference's boolean test (labelannotation/routes.py:685) requires
# the annotation value set to be EXACTLY one of these case-sensitive
# pairs. (Its `1 in annotation_values and 0 in annotation_values` int
# clause can never fire — annotation_values is pre-filtered to str.)
_BOOL_PAIRS = (
    frozenset({"True", "False"}),
    frozenset({"true", "false"}),
    frozenset({"1", "0"}),
    frozenset({"yes", "no"}),
)
# check_labels' valid-boolean token list (routes.py:722,726), str forms.
_VALID_BOOL = {"True", "False", "true", "false", "1", "0", "yes", "no"}


def _extract_first_non_empty(values: set[str]) -> set[str]:
    """Driver-side twin of the reference's `extract_first_non_empty_string`
    (labelannotation/routes.py:581-594), applied to a DISTINCT value set
    (the transform is per-value, so set-of-transformed == transform-of-set;
    the reference also DROPS empty strings before parsing). A value that
    fails to parse aborts — exactly the reference's raise."""
    import ast

    out = set()
    for v in values:
        if v == "":
            continue
        try:
            lst = ast.literal_eval(v)
        except Exception as e:  # noqa: BLE001 — mirror the reference abort
            raise ValueError(
                f"malformed list-valued label cell {v!r} "
                "(reference labelannotation/routes.py:589 raises here)"
            ) from e
        out.add(next((x for x in lst if x != ""), ""))
    return out


def _bounded_distinct_sets(
    df: DataFrame, cols: list[str], max_classes: int
) -> dict[str, dict]:
    """Per-column distinct string values with a HARD driver bound.

    Two passes, both single map-side-combinable aggregates:
      1. approx_count_distinct + null count + starts-with-'[' flag for
         every column (constant-size HLL sketches — never OOMs).
      2. for columns whose sketch reads ≤ 1.5×max_classes, collect
         `slice(sort_array(collect_set), 1, max_classes+1)` — at most
         max_classes+1 strings cross to the driver.
    The final over/under decision is EXACT: a column is "over" iff the
    sliced set still holds max_classes+1 values (the 1.5× sketch margin
    only decides who skips pass 2 — HLL's ~2% rsd cannot miss a true
    ≤max_classes column at a 50% margin). Returns per column:
      values: set[str] | None   (None ⇔ > max_classes distinct values)
      n_null: int, any_bracket: bool
    """
    if not cols:
        return {}
    strcols = {c: F.col(c).cast("string") for c in cols}
    probe = df.agg(
        *[F.approx_count_distinct(strcols[c]).alias(f"_d_{c}") for c in cols],
        *[
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"_n_{c}")
            for c in cols
        ],
        *[
            F.max(F.startswith(strcols[c], F.lit("["))).alias(f"_b_{c}")
            for c in cols
        ],
    ).collect()[0]
    small = [c for c in cols if probe[f"_d_{c}"] <= 1.5 * max_classes]
    sets_row = (
        df.agg(
            *[
                F.slice(
                    F.sort_array(F.collect_set(strcols[c])),
                    1,
                    max_classes + 1,
                ).alias(c)
                for c in small
            ]
        ).collect()[0]
        if small
        else None
    )
    out = {}
    for c in cols:
        vals = None
        if c in small:
            got = list(sets_row[c] or [])
            if len(got) <= max_classes:
                vals = set(got)
        out[c] = {
            "values": vals,
            "n_null": int(probe[f"_n_{c}"]),
            "any_bracket": bool(probe[f"_b_{c}"]),
        }
    return out


def infer_label_types(
    llm_output: DataFrame,
    annotations: DataFrame,
    label_cols: list[str],
    max_classes: int = 200,
    preset: dict[str, str] | None = None,
) -> dict[str, dict]:
    """A6: reference-faithful label-type inference
    (labelannotation/routes.py:679-693), driver-bounded.

    Per label:
      ignore      — label column absent from the annotation table (:679-683)
      boolean     — annotation value set is EXACTLY a 2-value T/F pair
                    (one of True/False, true/false, 1/0, yes/no — :685)
      multiclass  — set(llm values) == set(annotation values) (:687);
                    llm values first pass the bracketed-list extraction
                    when any value starts with '[' (:670-671)
      preset[c]   — a caller-preselected type survives when neither rule
                    fires (:689 `elif not label['label_type']`)
      stringmatch — otherwise
    Annotation values are the column's non-NULL strings (:684 isinstance
    filter); NULLs on the LLM side block multiclass (a NaN in the
    reference's set never equals any annotation string).

    Scale: value sets cross the driver only when the column has ≤
    max_classes distinct values (see _bounded_distinct_sets); a column
    over the bound can be neither boolean (needs exactly 2) nor a
    verified multiclass, so it resolves to preset/stringmatch with
    label_classes=[] — the one documented divergence from the reference,
    which materializes every distinct value in driver memory.

    Returns {label: {"label_type": str, "label_classes": [sorted str]}}
    (label_classes ⇔ the reference's ",".join(set(annotation_values)),
    sorted here for determinism).
    """
    preset = preset or {}
    present = [c for c in label_cols if c in annotations.columns]
    ann_info = _bounded_distinct_sets(annotations, present, max_classes)
    llm_info = _bounded_distinct_sets(
        llm_output, [c for c in present if c in llm_output.columns], max_classes
    )
    out: dict[str, dict] = {}
    for c in label_cols:
        if c not in annotations.columns:
            # reference flashes a warning and marks the label ignored
            out[c] = {"label_type": "ignore", "label_classes": []}
            continue
        ann_vals = ann_info[c]["values"]
        li = llm_info.get(c)
        llm_vals = li["values"] if li else None
        if li and li["any_bracket"] and llm_vals is not None:
            if li["n_null"] > 0:
                # reference: literal_eval(nan) raises → request aborts
                raise ValueError(
                    f"label {c!r}: NULLs in a list-valued LLM column"
                )
            llm_vals = _extract_first_non_empty(llm_vals)
        llm_comparable = (
            llm_vals if (li and li["n_null"] == 0) else None
        )  # a NULL on the llm side ⇒ set equality can never hold
        if ann_vals is not None and frozenset(ann_vals) in _BOOL_PAIRS:
            t = "boolean"
        elif (
            ann_vals is not None
            and llm_comparable is not None
            and llm_comparable == ann_vals
        ):
            t = "multiclass"
        else:
            t = preset.get(c) or "stringmatch"
        out[c] = {
            "label_type": t,
            "label_classes": sorted(ann_vals) if ann_vals is not None else [],
        }
    return out


def check_labels(
    llm_output: DataFrame,
    annotations: DataFrame,
    label_type_mapping: dict[str, dict],
    max_classes: int = 200,
) -> list[dict]:
    """Port of the reference's `check_labels` sanity pass
    (labelannotation/routes.py:699-736): validates each label's value
    sets against its selected type BEFORE evaluation, returning one dict
    per violation ({"label", "issue", "detail"}) instead of UI flashes.
    Empty list ⇔ all checks pass. Driver transfer bounded exactly as in
    infer_label_types; an over-bound column reports "too_many_values"
    for boolean/multiclass (it cannot satisfy either) and skips the
    set-level checks."""
    cols = [c for c in label_type_mapping if c in annotations.columns]
    ann_info = _bounded_distinct_sets(annotations, cols, max_classes)
    llm_info = _bounded_distinct_sets(
        llm_output,
        [c for c in label_type_mapping if c in llm_output.columns],
        max_classes,
    )
    issues: list[dict] = []

    def _issue(label: str, issue: str, detail) -> None:
        issues.append({"label": label, "issue": issue, "detail": detail})

    for c, spec in label_type_mapping.items():
        ltype = spec["label_type"]
        if ltype == "ignore" or c not in annotations.columns:
            continue
        ann_vals = ann_info[c]["values"]
        li = llm_info.get(c)
        llm_vals = li["values"] if li else None
        if li and li["any_bracket"] and li["n_null"] > 0:
            # the exact state infer_label_types hard-aborts on
            # (literal_eval over a NaN) — the sanity pass must SURFACE
            # it, not sail past what inference then crashes on
            _issue(c, "null_in_list_valued_column", None)
        if li and li["any_bracket"] and llm_vals is not None:
            llm_vals = _extract_first_non_empty(llm_vals)
        if li and li["n_null"] > 0 and llm_vals is not None:
            llm_vals = llm_vals | {None}  # reference sets carry NaN
        if ltype == "multiclass":
            # routes.py:703-710
            if llm_vals is None or ann_vals is None or llm_vals != ann_vals:
                _issue(c, "classes_differ_llm_vs_annotation", None)
            if ann_vals is None or ann_vals != set(spec["label_classes"]):
                _issue(c, "classes_differ_annotation_vs_selected", None)
        elif ltype == "boolean":
            # routes.py:712-728
            if (
                llm_vals is None
                or ann_vals is None
                or len(llm_vals) > 2
                or len(ann_vals) > 2
            ):
                _issue(c, "too_many_values", None)
            bad_llm = sorted(
                (v for v in (llm_vals or ()) if v not in _VALID_BOOL),
                key=lambda x: (x is None, x),
            )
            if bad_llm:
                _issue(c, "invalid_llm_values", bad_llm)
            bad_ann = sorted(
                v for v in (ann_vals or ()) if v not in _VALID_BOOL
            )
            if bad_ann:
                _issue(c, "invalid_annotation_values", bad_ann)
        elif ltype == "stringmatch":
            # routes.py:730-736
            if llm_vals is not None and "" in llm_vals:
                _issue(c, "llm_empty_values", None)
            if ann_vals is not None and "" in ann_vals:
                _issue(c, "annotation_empty_values", None)
    return issues


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


# get_reannotated_df's boolean equivalence classes — CASE-SENSITIVE
# membership (annotationhelper/routes.py:137-138): "Ja" coerces, "JA"
# warns-and-keeps. Distinct from boolean_coerce_wide_expr (functions/
# text.py), which case-folds for the three-valued predicate use.
_REANN_TRUE = ["True", "true", "Ja", "ja", "Yes", "yes", "correct",
               "wahr", "1", "TRUE"]
_REANN_FALSE = ["False", "false", "Nein", "nein", "No", "no", "falsch",
                "0", "FALSE"]

# columns the reference never treats as labels (routes.py:59,81)
_NON_LABEL_COLS = ("id", "report", "metadata", "masked_report",
                   "personal_info_list")


def _first_list_element_expr(v):
    """value_annotator initialization for bracketed cells:
    `literal_eval(v)[0] if str(v).startswith('[') else v`
    (annotationhelper/routes.py:62-64 — plain [0], NOT the
    first-non-empty rule labelannotation uses). Python-literal lists
    are normalized to JSON (single→double quotes) for from_json;
    a cell that still fails to parse falls back to the raw value where
    the reference's literal_eval would abort the job (documented
    divergence — a distributed op must not crash the stage on one
    malformed cell; the twin test pins the parseable domain)."""
    # F.get, not element_at(…, 1): an EMPTY list cell ('[]', where the
    # reference's [0] raises IndexError) makes element_at throw
    # INVALID_ARRAY_INDEX_IN_ELEMENT_AT under ANSI mode and kill the
    # stage — the same bug class fixed in first_non_empty_expr this
    # round; get() returns NULL and the coalesce falls back to the raw
    # cell (review finding)
    parsed = F.from_json(F.regexp_replace(v, "'", '"'), "array<string>")
    return F.when(
        v.startswith("["), F.coalesce(F.get(parsed, F.lit(0)), v)
    ).otherwise(v)


def reannotated_id_expr(col):
    """get_reannotated_df's id edit (annotationhelper/routes.py:160-161):
    `'.'.join('$'.join(x.split('$')[:-1]).split('.')[:-1])` — drop the
    last '$'-suffix, then the last '.'-suffix. Faithful on the edges:
    an id with no '$' (or then no '.') collapses to ''."""
    a = F.when(
        col.contains("$"), F.regexp_replace(col, r"\$[^$]*$", "")
    ).otherwise(F.lit(""))
    return F.when(
        a.contains("."), F.regexp_replace(a, r"\.[^.]*$", "")
    ).otherwise(F.lit(""))


def reannotate(
    llm_output: DataFrame,
    corrections: DataFrame,
    label_types: dict[str, str],
    id_col: str = "id",
    report_col: str = "report",
    seq_col: str | None = None,
) -> DataFrame:
    """Annotation-correction merge — the human-in-the-loop flow's one
    real dataflow op (reference `get_reannotated_df` +
    `update_record_labels_by_id`, webapp/annotationhelper/routes.py:
    114-122, 131-163): fold corrected label values back over the
    LLM-output table by id × label, preserving uncorrected cells.

    `corrections` is the long-format correction log (record_id, label,
    value) — exactly update_record_labels_by_id's write path; rows
    whose record_id/label match nothing are ignored (the reference
    returns False). When `seq_col` names an ordering column the LAST
    correction per (record_id, label) wins (the reference applies
    updates sequentially in request order); without it corrections are
    assumed unique per cell.

    Output = id (edited via reannotated_id_expr), report, one column
    per label where
      cell = correction if present else the INITIAL value_annotator
             (the LLM value; bracketed list cells take element [0]),
      boolean-typed labels then coerce through the case-sensitive
      equivalence classes ('1'/'0'; unrecognized values are kept as-is
      — the reference's warn path).

    Scale shape: ONE pivot of the correction log (keyed on record_id,
    values bounded by the declared label set) and ONE join against the
    LLM table — AQE broadcasts the correction side when it fits (human
    corrections are tiny by construction); everything else is narrow
    column expressions. Re-running metrics on the merged table is just
    evaluation.py over the result."""
    label_cols = [
        c for c in llm_output.columns if c not in _NON_LABEL_COLS
    ]
    val = F.col("value")
    if seq_col is not None:
        agg = F.max_by(val, F.col(seq_col))
    else:
        agg = F.first(val)
    wide = (
        corrections.groupBy(F.col("record_id"))
        .pivot("label", label_cols)
        .agg(agg)
    )
    cor_cols = {c: f"_cor_{c}" for c in label_cols}
    wide = wide.select(
        "record_id", *[F.col(c).alias(cor_cols[c]) for c in label_cols]
    )
    merged = llm_output.join(
        wide, llm_output[id_col] == wide["record_id"], "left"
    )
    out_cols = [
        reannotated_id_expr(F.col(id_col)).alias(id_col),
        F.col(report_col),
    ]
    for c in label_cols:
        cell = F.coalesce(
            F.col(cor_cols[c]), _first_list_element_expr(F.col(c))
        )
        if label_types.get(c) == "boolean":
            cell = (
                F.when(cell.isin(_REANN_TRUE), F.lit("1"))
                .when(cell.isin(_REANN_FALSE), F.lit("0"))
                .otherwise(cell)  # warn-and-keep
            )
        out_cols.append(cell.alias(c))
    return merged.select(*out_cols)


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


def calibration_bins(
    scored: DataFrame,
    score_col: str,
    positive_col: str,
    n_bins: int = 10,
    score_scale: float = 500.0,
    out_dp: int = 6,
) -> DataFrame:
    """Reliability-diagram bins for a probabilistic scorer: bucket the
    normalized score into ``n_bins`` equal-width bins and report, per
    bin, the mean predicted probability vs the observed positive rate
    — the calibration table an evaluation pipeline reads before
    trusting model confidences (ECE is its weighted column gap).

    Determinism: the bin index is integer arithmetic on exact bigint
    cents (score*100), so no float boundary can flip a row; both means
    are exact integer sums followed by ONE IEEE division each, rounded
    once. One map-side-combinable hash aggregate; output rows =
    n_bins at any SF.
    """
    cents = F.round(F.col(score_col) * 100, 0).cast("bigint")
    cents_per_bin = int(round(score_scale * 100)) // n_bins
    bin_id = F.least(
        F.lit(n_bins - 1),
        F.floor(cents / F.lit(cents_per_bin)).cast("int"),
    ).cast("bigint")
    pos = F.col(positive_col).cast("bigint")
    scale_cents = F.lit(float(score_scale) * 100.0)
    return (
        scored.select(bin_id.alias("bin_id"), cents.alias("_c"), pos.alias("_y"))
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(
                F.sum("_c").cast("double")
                / F.count(F.lit(1)).cast("double")
                / scale_cents,
                out_dp,
            ).alias("mean_pred"),
            F.round(
                F.sum("_y").cast("double")
                / F.count(F.lit(1)).cast("double"),
                out_dp,
            ).alias("frac_positive"),
        )
    )
