"""Privacy-risk audit: k-anonymity / l-diversity over quasi-identifiers.

The reference is an anonymization tool (LLMAIx's redaction side); the
table-level counterpart of masking is the re-identification audit a
release pipeline runs AFTER redaction: does any combination of
quasi-identifier values isolate fewer than k rows (k-anonymity), and
does any group carry fewer than l distinct sensitive values
(l-diversity)? Reference semantics context:
/root/reference/webapp/report_redaction — the per-document redaction
metrics; this operator is the dataset-level gate.

Plan shape: ONE hash aggregate over the quasi-identifier tuple (count +
count DISTINCT sensitive compile to a single Expand + partial agg), so
the audit costs one shuffle at any SF; the output is bounded by the
QID-combination cardinality, not the row count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str | Column],
    sensitive_col: str,
    k: int = 5,
    l_div: int = 3,
) -> DataFrame:
    """Group by the quasi-identifier columns; emit per group the row
    count (its k), the number of distinct sensitive values (its l),
    and the two violation flags. Callers release only groups with
    both flags false (suppress or generalize the rest)."""
    qcols = [F.col(c) if isinstance(c, str) else c for c in quasi_cols]
    return (
        df.groupBy(*qcols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("group_k"),
            F.countDistinct(F.col(sensitive_col))
            .cast("bigint")
            .alias("group_l"),
        )
        .select(
            "*",
            (F.col("group_k") < k).alias("k_violation"),
            (F.col("group_l") < l_div).alias("l_violation"),
        )
    )
