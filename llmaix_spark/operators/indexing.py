"""Inverted-index construction: delta-encoded posting lists.

The search-engine build step a corpus pipeline runs after curation:
per term, its document frequency, total term frequency, and a
truncated posting list of ascending doc_ids stored as deltas (gap
encoding — the form posting lists are varint-compressed in; the gaps
ARE the payload an index writer serializes). search_rank /
search_phrase are the read side of this index.

Plan shape (100 TB): tokenize is a narrow projection + explode; the
(term, doc) grain collapses through a map-side-combinable count; the
per-term rollup sorts only each term's own (bounded, truncated)
posting array JVM-side — no global sort, no window over the corpus,
no UDF. Zipf skew lands on the (term, doc) aggregate where partial
aggregation absorbs it (the hot term's pairs are exactly the keys
map-side combine collapses first).

Determinism: doc_ids are exact integers; array_sort makes the
collect_list order canonical; the delta transform binds the posting
array once (bind_array — the computed-array-in-lambda landmine) and
is pure integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from llmaix_spark.functions.arrays import bind_array


def inverted_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 16,
) -> DataFrame:
    """Build the per-term posting table: (term, df, total_tf,
    postings[<=max_postings ascending doc_ids], gaps[delta-encoded]).
    """
    tok = docs.select(
        F.col(id_col).cast("bigint").alias("doc"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).where(F.col("term") != "")
    td = tok.groupBy("term", "doc").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    rolled = td.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("total_tf"),
        F.slice(
            F.array_sort(F.collect_list("doc")), 1, max_postings
        ).alias("postings"),
    )
    gaps = bind_array(
        F.col("postings"),
        lambda p: F.transform(
            p,
            lambda x, i: x
            - F.when(i == 0, F.lit(0).cast("bigint")).otherwise(p[i - 1]),
        ),
    )
    return rolled.select(
        "term", "df", "total_tf", "postings", gaps.alias("gaps")
    )
