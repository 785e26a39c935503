"""Named query library — the operator coverage surface.

Every entry pairs a Spark implementation (built from llmaix_spark
operators) with a DuckDB-runnable ANSI-SQL oracle over the same parquet
tables (driver contract: row-count + schema + order-insensitive
value-hash at sf=0.01). Non-SQL-expressible ops (iterative CC, LSH-probed
ANN, pandas-UDF pipelines) carry a None oracle → rows-only check.

Alignment rules (hard-won; see tests/test_oracle_parity.py):
  * every computed column aliased identically on both sides
  * integer outputs cast to BIGINT on both sides
  * float outputs rounded explicitly; thresholds applied to the rounded
    value so boundary rows agree across engines
  * shared content hash = first 15 hex chars of md5 → bigint
    (Spark conv(...,16,10) ≡ DuckDB ('0x'||...)::BIGINT)
"""

from __future__ import annotations

import math

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from llmaix_spark.functions.text import (
    base_id_expr,
    boolean_coerce_expr,
    is_empty_expr,
    replace_umlauts_expr,
)
from llmaix_spark.operators import dedup as dd
from llmaix_spark.operators import similarity as sim
from llmaix_spark.operators import textstats as ts
from llmaix_spark.operators.chunking import chunk_by_words, reassemble
from llmaix_spark.operators.linking import _MINHASH_AB, _P

# ---------------------------------------------------------------------------
# helpers


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


KG_PREDS = ["join", "merge", "scan", "sort", "filter", "group"]

_HASH60_SQL = "(('0x' || substring(md5({v}), 1, 15))::BIGINT)"


def _turns(spark, sf_dir) -> DataFrame:
    """Derived transcripts: documents word-chunked into 8-word turns
    (the testdata has no transcripts table; the derivation is part of the
    query on both sides)."""
    return chunk_by_words(_t(spark, sf_dir, "documents"), 8)


_TURNS_SQL = """
d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
tok AS (SELECT doc_id, generate_subscripts(w, 1) i, unnest(w) t FROM d),
turns AS (
  SELECT CAST(doc_id AS VARCHAR) AS conv_id,
         CAST((i - 1) // 8 AS INTEGER) AS turn_idx,
         string_agg(t, ' ' ORDER BY i) AS text
  FROM tok GROUP BY 1, 2
)
"""

# ---------------------------------------------------------------------------
# KG-path queries (P9 chunking, A1 assembly, mention/triple extraction)


def q_kg_turns(spark, sf_dir):
    return _turns(spark, sf_dir)


SQL_KG_TURNS = f"WITH {_TURNS_SQL} SELECT conv_id, turn_idx, text FROM turns"


def q_kg_assembly(spark, sf_dir):
    out = reassemble(_turns(spark, sf_dir))
    return out.select(
        "conv_id", F.col("n_turns").cast("bigint").alias("n_turns"), "conv_text"
    )


SQL_KG_ASSEMBLY = f"""WITH {_TURNS_SQL}
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
       string_agg(text, ' ' ORDER BY turn_idx) AS conv_text
FROM turns GROUP BY conv_id"""


def q_kg_mentions(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("doc_id").cast("string").alias("conv_id"),
            F.explode(F.split("text", " ")).alias("surface"),
        )
        .filter(F.length("surface") >= 6)
        .distinct()
    )


SQL_KG_MENTIONS = """
WITH d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
tok AS (SELECT doc_id, unnest(w) t FROM d)
SELECT DISTINCT CAST(doc_id AS VARCHAR) AS conv_id, t AS surface
FROM tok WHERE length(t) >= 6"""


def q_kg_triples(spark, sf_dir):
    """Rule-based triple extraction: (prev, pred, next) token windows
    where pred ∈ vocabulary and neighbors are not — the SQL-expressible
    twin of the stub extraction grammar (stateless neighbor rule)."""
    from llmaix_spark.functions.arrays import bind_array

    docs = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    def build(t):
        # landmine #3: sequence(1, 0) DESCENDS to [1, 0] and element_at(t, 0)
        # throws — greatest() alone does NOT protect docs under 3 tokens;
        # gate the whole window array on size
        w = F.when(
            F.size(t) >= 3,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 2),
                lambda j: F.struct(
                    F.element_at(t, j).alias("subj"),
                    F.element_at(t, j + 1).alias("pred"),
                    F.element_at(t, j + 2).alias("obj"),
                ),
            ),
        ).otherwise(
            F.array().cast(
                "array<struct<subj:string,pred:string,obj:string>>"
            )
        )
        # predicate gate INSIDE the array expr: the generator then emits
        # only matching windows (~5× fewer exploded rows than
        # explode-then-filter — the generate itself was the cost)
        return F.filter(
            w,
            lambda x: x["pred"].isin(KG_PREDS)
            & ~x["subj"].isin(KG_PREDS)
            & ~x["obj"].isin(KG_PREDS),
        )

    windows = bind_array(toks, build)
    exploded = docs.filter(F.size(toks) >= 3).select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.explode(windows).alias("w"),
    )
    return exploded.groupBy(
        "conv_id",
        F.col("w.subj").alias("subj"),
        F.col("w.pred").alias("pred"),
        F.col("w.obj").alias("obj"),
    ).agg(F.count(F.lit(1)).alias("n"))


_PREDS_IN = ", ".join(f"'{p}'" for p in KG_PREDS)
SQL_KG_TRIPLES = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
tok AS (SELECT doc_id, generate_subscripts(w, 1) i, unnest(w) t FROM d),
tri AS (
  SELECT doc_id,
         lag(t) OVER win AS subj, t AS pred, lead(t) OVER win AS obj
  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)
)
SELECT CAST(doc_id AS VARCHAR) AS conv_id, subj, pred, obj,
       CAST(count(*) AS BIGINT) AS n
FROM tri
WHERE pred IN ({_PREDS_IN}) AND subj IS NOT NULL AND obj IS NOT NULL
  AND subj NOT IN ({_PREDS_IN}) AND obj NOT IN ({_PREDS_IN})
GROUP BY 1, 2, 3, 4"""


def q_kg_entity_counts(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.explode(F.split("text", " ")).alias("surface"),
    ).filter(F.length("surface") >= 6)
    return toks.groupBy("surface").agg(
        F.countDistinct("conv_id").alias("n_convs"),
        F.count(F.lit(1)).alias("n_total"),
    )


SQL_KG_ENTITY_COUNTS = """
WITH d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
tok AS (SELECT doc_id, unnest(w) t FROM d)
SELECT t AS surface,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_convs,
       CAST(count(*) AS BIGINT) AS n_total
FROM tok WHERE length(t) >= 6 GROUP BY 1"""


# ---------------------------------------------------------------------------
# relational core (scan/filter/agg/join/window — Catalyst surface)


def q_agg_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_AGG_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus"""


def q_agg_rollup(spark, sf_dir):
    """ROLLUP aggregation — per-(flag, status), per-flag subtotal and
    grand total in ONE pass (Catalyst expands the grouping sets into a
    single Expand + hash-aggregate, map-side combinable; never three
    scans). Money sums go through bigint cents so every rollup level
    is integer-exact cross-engine (the events_rolling cents contract —
    super-aggregate double sums would drift in the last ulp); the
    grouping level is exposed as the engine-agnostic
    grouping(a)*2+grouping(b) bitmask."""
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
            .cast("bigint")
            .alias("grp_id"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.sum(cents).alias("price_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "grp_id",
            F.col("sum_qty").cast("bigint").alias("sum_qty"),
            F.round(F.col("price_cents") / 100.0, 2).alias("sum_base_price"),
            "n_rows",
        )
    )


SQL_AGG_ROLLUP = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
         AS grp_id,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                  AS DOUBLE) / 100.0, 2) AS sum_base_price,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""


def q_join_top_orders(spark, sf_dir):
    # no broadcast hint: a forced broadcast of the segment slice is fine
    # at sf0.1 but overrides AQE's size check — at 100x the slice is GBs
    # and the hint turns a safe SMJ into an executor OOM. AQE broadcasts
    # it when (and only when) it fits (round-2 verdict, scale hazard #2).
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


SQL_JOIN_TOP_ORDERS = """
SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey LIMIT 10"""


def q_window_customer_top3(spark, sf_dir):
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter("rn <= 3")
        .select("o_custkey", "o_orderkey", "rn")
    )


SQL_WINDOW_TOP3 = """
SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rn FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 3"""


def q_window_deciles(spark, sf_dir):
    """Customer spend deciles WITHIN market segment: spend is the
    bigint-cents sum of the customer's orders (integer-exact), the
    decile is ntile(10) over the total order (spend, custkey) so ties
    are deterministic cross-engine. Partitioned by segment — the
    window never sees the whole corpus in one task (a GLOBAL ntile
    would; partition or pre-bucket for global quantiles at scale —
    profile_quantiles is that path)."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    spend = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            ).alias("cents")
        )
    )
    j = spend.join(
        c.select(
            F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
        ),
        "o_custkey",
    )
    w = Window.partitionBy("c_mktsegment").orderBy("cents", "o_custkey")
    return j.select(
        F.col("o_custkey").cast("bigint").alias("custkey"),
        "c_mktsegment",
        F.round(F.col("cents") / 100.0, 2).alias("spend"),
        F.ntile(10).over(w).cast("bigint").alias("decile"),
    )


SQL_WINDOW_DECILES = """
WITH spend AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1)
SELECT CAST(o_custkey AS BIGINT) AS custkey, c_mktsegment,
       round(cents / 100.0, 2) AS spend,
       CAST(ntile(10) OVER (PARTITION BY c_mktsegment
                            ORDER BY cents, o_custkey) AS BIGINT)
         AS decile
FROM spend JOIN customer ON c_custkey = o_custkey"""


def q_window_prev_next(spark, sf_dir):
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


SQL_WINDOW_PREV_NEXT = """
SELECT o_custkey, o_orderkey,
       lag(o_orderkey) OVER win AS prev_orderkey,
       lead(o_orderkey) OVER win AS next_orderkey
FROM orders WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""


def q_events_json_k(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
    )


SQL_EVENTS_JSON = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
FROM events"""


def q_events_sessionize(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_s = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        e.withColumn("new_s", new_s)
        .groupBy("user_id")
        .agg(F.sum("new_s").cast("bigint").alias("n_sessions"))
    )


SQL_EVENTS_SESSIONIZE = """
WITH x AS (
  SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) prev
  FROM events)
SELECT user_id,
       CAST(sum(CASE WHEN prev IS NULL
                     OR date_diff('second', prev, ts) > 1800
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM x GROUP BY user_id"""


def q_events_rolling(spark, sf_dir):
    """Per-user rolling statistics over the event timeline: 4-row
    trailing mean of value (exact cents arithmetic: sum of bigint
    cents divided once) and the 600-second trailing event count via a
    RANGE window on epoch seconds — both single-pass window
    aggregates partitioned on user_id."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        F.col("event_id").cast("bigint").alias("event_id"),
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    wrows = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-3, 0)
    )
    wrange = (
        Window.partitionBy("user_id")
        .orderBy(F.col("us"))
        .rangeBetween(-600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(
            F.sum("cents").over(wrows).cast("double")
            / F.count(F.lit(1)).over(wrows)
            / 100.0,
            6,
        ).alias("trail4_mean"),
        F.count(F.lit(1)).over(wrange).cast("bigint").alias("n_10min"),
    )


SQL_EVENTS_ROLLING = """
WITH e AS (
  SELECT CAST(event_id AS BIGINT) AS event_id, user_id,
         epoch_us(ts) AS us,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events)
SELECT event_id, user_id,
       round(CAST(sum(cents) OVER wrows AS DOUBLE)
             / count(*) OVER wrows / 100.0, 6) AS trail4_mean,
       CAST(count(*) OVER wrange AS BIGINT) AS n_10min
FROM e
WINDOW wrows AS (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
       wrange AS (PARTITION BY user_id ORDER BY us
                  RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)"""


def q_events_funnel(spark, sf_dir):
    """Conversion funnel view → click → purchase with a 1-day
    conversion window: deepest stage per user with min-anchored
    strictly-after semantics, counted per stage (90/35/25 users at
    sf0.01 — every stage populated). Each step is one filtered scan +
    a user_id equi-join + a map-side min — the chain reuses one hash
    partitioning, no windows, no driver counts."""
    from llmaix_spark.operators.events import funnel_stages

    return funnel_stages(
        _t(spark, sf_dir, "events"),
        ["view", "click", "purchase"],
        max_gap_us=86_400_000_000,
    )


SQL_EVENTS_FUNNEL = """
WITH e AS (SELECT user_id u, epoch_us(ts) us, event_type et FROM events),
s1 AS (SELECT u, min(us) t FROM e WHERE et = 'view' GROUP BY 1),
s2 AS (SELECT e.u, min(us) t FROM e JOIN s1 ON e.u = s1.u AND e.us > s1.t
       AND e.us <= s1.t + 86400000000
       WHERE et = 'click' GROUP BY 1),
s3 AS (SELECT e.u, min(us) t FROM e JOIN s2 ON e.u = s2.u AND e.us > s2.t
       AND e.us <= s2.t + 86400000000
       WHERE et = 'purchase' GROUP BY 1),
stage AS (
  SELECT u, CASE WHEN u IN (SELECT u FROM s3) THEN 3
                 WHEN u IN (SELECT u FROM s2) THEN 2
                 WHEN u IN (SELECT u FROM s1) THEN 1 ELSE 0 END st
  FROM (SELECT DISTINCT u FROM e))
SELECT CAST(st AS BIGINT) AS stage, CAST(count(*) AS BIGINT) AS n_users
FROM stage GROUP BY 1"""


def q_events_bursts(spark, sf_dir):
    """Per-type hourly burst buckets at z > 2 — the anomaly surface of
    the event stream. The burst gate is pure integer arithmetic
    ((n·k−S)² > 4·(Q·k−S²), decimal(38,0) vs HUGEINT) so no stddev
    float drift can flip a boundary bucket; the reported z comes from
    one bigint→double division + IEEE sqrt, identical both engines."""
    from llmaix_spark.operators.events import burst_buckets

    return burst_buckets(_t(spark, sf_dir, "events"))


SQL_EVENTS_BURSTS = """
WITH e AS (SELECT event_type et, epoch_us(ts) // 3600000000 AS bucket
           FROM events),
counts AS (SELECT et, bucket, CAST(count(*) AS HUGEINT) n
           FROM e GROUP BY 1, 2),
m AS (SELECT et, CAST(count(*) AS HUGEINT) k, sum(n) s, sum(n * n) q
      FROM counts GROUP BY 1)
SELECT et AS event_type, CAST(bucket AS BIGINT) AS bucket,
       CAST(n AS BIGINT) AS n_events,
       round(sqrt(CAST((n * k - s) * (n * k - s) AS DOUBLE)
                  / CAST(q * k - s * s AS DOUBLE)), 4) AS z
FROM counts JOIN m USING (et)
WHERE n * k - s > 0
  AND (n * k - s) * (n * k - s) > 4 * (q * k - s * s)"""


def q_events_transitions(spark, sf_dir):
    """First-order Markov transition matrix between event types per
    user timeline — one lead() window on (ts, event_id), map-side
    pair counts, per-source totals broadcast back."""
    from llmaix_spark.operators.events import transition_matrix

    return transition_matrix(_t(spark, sf_dir, "events"))


SQL_EVENTS_TRANSITIONS = """
WITH e AS (SELECT user_id u, epoch_us(ts) us, event_id eid,
                  event_type src FROM events),
seq AS (SELECT u, src,
               lead(src) OVER (PARTITION BY u ORDER BY us, eid) dst
        FROM e),
pairs AS (SELECT src, dst, count(*) n FROM seq
          WHERE dst IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT src, sum(n) t FROM pairs GROUP BY 1)
SELECT pairs.src, dst, CAST(n AS BIGINT) AS n,
       round(n * 1.0 / t, 6) AS p
FROM pairs JOIN tot USING (src)"""


def q_events_retention(spark, sf_dir):
    """Weekly cohort retention: users bucketed by first-activity week,
    per-offset active fraction — two map-side aggregations over the
    distinct (user, week) table plus a broadcast of cohort sizes."""
    from llmaix_spark.operators.events import cohort_retention

    return cohort_retention(_t(spark, sf_dir, "events"))


SQL_EVENTS_RETENTION = """
WITH a AS (SELECT DISTINCT user_id u,
                  epoch_us(ts) // 604800000000 AS p FROM events),
c AS (SELECT u, min(p) p0 FROM a GROUP BY 1),
sz AS (SELECT p0, count(*) n_cohort FROM c GROUP BY 1),
act AS (SELECT c.p0, a.p - c.p0 AS offs, count(*) n_active
        FROM a JOIN c USING (u) GROUP BY 1, 2)
SELECT CAST(act.p0 AS BIGINT) AS cohort_period,
       CAST(offs AS BIGINT) AS "offset",
       CAST(n_active AS BIGINT) AS n_active,
       CAST(n_cohort AS BIGINT) AS n_cohort,
       round(n_active * 1.0 / n_cohort, 6) AS retention
FROM act JOIN sz USING (p0)"""


def q_events_ohlc(spark, sf_dir):
    """Daily OHLC downsampling per event type: open/close via min/max
    over a (us, event_id, value) struct (deterministic under ts ties,
    no window), high/low/volume plain aggregates, totals in bigint
    cents — ONE map-side-combinable pass."""
    from llmaix_spark.operators.events import ohlc_buckets

    return ohlc_buckets(_t(spark, sf_dir, "events"))


SQL_EVENTS_OHLC = """
WITH e AS (SELECT event_type et, value v, epoch_us(ts) us, event_id eid,
                  epoch_us(ts) // 86400000000 AS bucket FROM events)
SELECT et AS event_type, CAST(bucket AS BIGINT) AS bucket,
       round((min({'us': us, 'eid': eid, 'v': v})).v, 2) AS open,
       round(max(v), 2) AS high,
       round(min(v), 2) AS low,
       round((max({'us': us, 'eid': eid, 'v': v})).v, 2) AS close,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(CAST(round(v * 100, 0) AS BIGINT)) / 100.0, 2)
         AS total_value
FROM e GROUP BY 1, 2"""


def q_events_cumulative(spark, sf_dir):
    """Per-user running value total + step delta — one window pass;
    the cumulative sum rides bigint cents so every prefix is
    integer-exact (a double running sum drifts order-dependently)."""
    from llmaix_spark.operators.events import running_totals

    return running_totals(_t(spark, sf_dir, "events"))


SQL_EVENTS_CUMULATIVE = """
WITH e AS (SELECT user_id u, epoch_us(ts) us,
                  CAST(event_id AS BIGINT) eid,
                  CAST(round(value * 100, 0) AS BIGINT) cents
           FROM events)
SELECT eid AS event_id, u AS user_id,
       round(sum(cents) OVER w / 100.0, 2) AS running_total,
       round((cents - lag(cents) OVER w) / 100.0, 2) AS delta
FROM e
WINDOW w AS (PARTITION BY u ORDER BY us, eid
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""


def q_integrity_orphans(spark, sf_dir):
    """Referential-integrity audit: orders whose o_custkey has no
    customer row (left anti join — at scale a broadcast of the
    key-projected dimension or an AQE shuffle join, never a full
    dimension materialization driver-side). The fixture has no
    natural orphans, so every 7th customer is deterministically
    knocked out on BOTH sides to give the audit something to find."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").where(F.col("c_custkey") % 7 != 0)
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
    )


SQL_INTEGRITY_ORPHANS = """
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orphans
FROM orders
WHERE o_custkey NOT IN
      (SELECT c_custkey FROM customer WHERE c_custkey % 7 <> 0)
GROUP BY 1"""


def _cdc_fixture(spark, sf_dir):
    """Deterministic (base, changes) pair synthesized from customer —
    shared by cdc_apply and scd2_history: %10==0 deletes, %10==1
    upserts (seq 1), %20==1 a SECOND upsert (seq 2 — exercises
    last-wins), %50==3 inserts under new keys."""
    c = _t(spark, sf_dir, "customer")
    base = c.select(
        F.col("c_custkey").cast("bigint").alias("custkey"),
        "c_name",
        F.col("c_acctbal").alias("bal"),
    )
    k = F.col("c_custkey").cast("bigint")
    dels = c.where(k % 10 == 0).select(
        k.alias("custkey"),
        F.lit(1).alias("seq"),
        F.lit("delete").alias("op"),
        F.lit(None).cast("string").alias("c_name"),
        F.lit(None).cast("double").alias("bal"),
    )
    up1 = c.where(k % 10 == 1).select(
        k.alias("custkey"),
        F.lit(1).alias("seq"),
        F.lit("upsert").alias("op"),
        F.concat(F.col("c_name"), F.lit("#u1")).alias("c_name"),
        (F.col("c_acctbal") + 100).alias("bal"),
    )
    up2 = c.where(k % 20 == 1).select(
        k.alias("custkey"),
        F.lit(2).alias("seq"),
        F.lit("upsert").alias("op"),
        F.concat(F.col("c_name"), F.lit("#u2")).alias("c_name"),
        (F.col("c_acctbal") + 200).alias("bal"),
    )
    ins = c.where(k % 50 == 3).select(
        (k + 1_000_000).alias("custkey"),
        F.lit(1).alias("seq"),
        F.lit("upsert").alias("op"),
        F.concat(F.lit("new_"), k.cast("string")).alias("c_name"),
        F.lit(1.5).alias("bal"),
    )
    changes = dels.unionAll(up1).unionAll(up2).unionAll(ins)
    return base, changes


def q_cdc_apply(spark, sf_dir):
    """CDC merge: apply a deterministic upsert/delete feed to the
    customer snapshot (last seq wins, delete removes, unseen keys
    insert, full-row upsert semantics — the batch twin of Delta
    MERGE / apply-changes)."""
    from llmaix_spark.operators.cdc import apply_changes

    base, changes = _cdc_fixture(spark, sf_dir)
    out = apply_changes(base, changes, ["custkey"])
    return out.select(
        "custkey", "c_name", F.round("bal", 2).alias("acctbal")
    )


def q_scd2_history(spark, sf_dir):
    """SCD type-2 historization of the same CDC feed: one row per key
    version with (valid_from, valid_to, is_current) derived from a
    single per-key lead() window — no joins; deletes close intervals
    without opening new ones."""
    from llmaix_spark.operators.cdc import scd2_history

    base, changes = _cdc_fixture(spark, sf_dir)
    out = scd2_history(base, changes, ["custkey"])
    return out.select(
        "custkey",
        "c_name",
        F.round("bal", 2).alias("acctbal"),
        "valid_from",
        "valid_to",
        "is_current",
    )


_CDC_CHANGES_SQL = """
base AS (SELECT CAST(c_custkey AS BIGINT) k, c_name, c_acctbal bal
              FROM customer),
changes AS (
  SELECT k AS custkey, 1 AS seq, 'delete' AS op,
         CAST(NULL AS VARCHAR) AS c_name, CAST(NULL AS DOUBLE) AS bal
  FROM base WHERE k % 10 = 0
  UNION ALL
  SELECT k, 1, 'upsert', c_name || '#u1', bal + 100
  FROM base WHERE k % 10 = 1
  UNION ALL
  SELECT k, 2, 'upsert', c_name || '#u2', bal + 200
  FROM base WHERE k % 20 = 1
  UNION ALL
  SELECT k + 1000000, 1, 'upsert', 'new_' || CAST(k AS VARCHAR), 1.5
  FROM base WHERE k % 50 = 3)"""

SQL_CDC_APPLY = f"""
WITH {_CDC_CHANGES_SQL},
latest AS (
  SELECT custkey, op, c_name, bal FROM (
    SELECT *, row_number() OVER (PARTITION BY custkey
                                 ORDER BY seq DESC) rn
    FROM changes) WHERE rn = 1)
SELECT k AS custkey, c_name, round(bal, 2) AS acctbal
FROM base WHERE k NOT IN (SELECT custkey FROM latest)
UNION ALL
SELECT custkey, c_name, round(bal, 2) AS acctbal
FROM latest WHERE op <> 'delete'"""

SQL_SCD2_HISTORY = f"""
WITH {_CDC_CHANGES_SQL},
versions AS (
  SELECT k AS custkey, CAST(0 AS BIGINT) AS seq, 'upsert' AS op,
         c_name, bal FROM base
  UNION ALL
  SELECT custkey, CAST(seq AS BIGINT), op, c_name, bal FROM changes),
hist AS (
  SELECT custkey, c_name, bal, seq AS valid_from,
         lead(seq) OVER (PARTITION BY custkey ORDER BY seq) AS valid_to,
         op
  FROM versions)
SELECT custkey, c_name, round(bal, 2) AS acctbal,
       valid_from, valid_to, valid_to IS NULL AS is_current
FROM hist WHERE op <> 'delete'"""


def q_events_asof(spark, sf_dir):
    """As-of join: every click gets the nearest at-or-before view of
    the same user (merge-join formulation — one union + one window
    pass per user timeline, never a pairwise theta join). The view
    side is pre-deduped per (user, ts) by max event_id so ties are
    well-defined; the oracle is DuckDB's NATIVE ASOF LEFT JOIN — an
    independent implementation of the same semantics."""
    from llmaix_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    views = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").cast("bigint").alias("view_event_id"))
    )
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("event_id").cast("bigint"), "user_id", "ts"
    )
    out = asof_join(clicks, views, on="ts", by=["user_id"])
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("click_us"),
        "view_event_id",
        F.unix_micros(F.col("ts_r").cast("timestamp")).alias("view_us"),
        (F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(F.col("ts_r").cast("timestamp"))).alias("lag_us"),
    )


SQL_EVENTS_ASOF = """
WITH v AS (
  SELECT user_id, ts, CAST(max(event_id) AS BIGINT) AS view_event_id
  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
c AS (
  SELECT CAST(event_id AS BIGINT) AS event_id, user_id, ts
  FROM events WHERE event_type = 'click')
SELECT c.event_id, c.user_id, epoch_us(c.ts) AS click_us,
       v.view_event_id, epoch_us(v.ts) AS view_us,
       epoch_us(c.ts) - epoch_us(v.ts) AS lag_us
FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts"""


def q_events_range_join(spark, sf_dir):
    """Range join: every error event opens a half-open 5-minute
    incident window; count the same user's non-error events (and
    their value total, in exact cents) inside it. Bucketized
    equi-join — an interval hits ≤ 2 width-300s buckets, a point
    exactly one, so each qualifying pair meets once and the plan is a
    plain hash join, not a BroadcastNestedLoop theta join."""
    from llmaix_spark.operators.asof import range_join

    e = _t(spark, sf_dir, "events")
    errs = e.where(F.col("event_type") == "error").select(
        F.col("event_id").cast("bigint").alias("err_id"),
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("win_start"),
        (F.unix_micros(F.col("ts").cast("timestamp")) + F.lit(300_000_000)).alias("win_end"),
    )
    pts = e.where(F.col("event_type") != "error").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("p_us"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    hits = range_join(
        pts, errs, "p_us", "win_start", "win_end", by=["user_id"]
    )
    agg = hits.groupBy("err_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_in_window"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
    )
    return errs.select("err_id", "user_id").join(agg, "err_id", "left").select(
        "err_id",
        "user_id",
        F.coalesce("n_in_window", F.lit(0)).cast("bigint").alias("n_in_window"),
        F.coalesce("sum_cents", F.lit(0)).cast("bigint").alias("sum_cents"),
    )


SQL_EVENTS_RANGE_JOIN = """
WITH err AS (
  SELECT CAST(event_id AS BIGINT) AS err_id, user_id,
         epoch_us(ts) AS s FROM events WHERE event_type = 'error'),
pts AS (
  SELECT user_id, epoch_us(ts) AS p,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type <> 'error')
SELECT err.err_id, err.user_id,
       CAST(count(pts.p) AS BIGINT) AS n_in_window,
       CAST(coalesce(sum(pts.cents), 0) AS BIGINT) AS sum_cents
FROM err LEFT JOIN pts
  ON err.user_id = pts.user_id
 AND pts.p >= err.s AND pts.p < err.s + 300000000
GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# reference scalar kernels (P1/P5/P11/F1/F10, M3/M5, JN4)


def q_empty_predicate(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    probe = F.when(F.col("doc_id") % 7 == 0, F.lit("?")).when(
        F.col("doc_id") % 11 == 0, F.lit("   ")
    ).otherwise(F.col("text"))
    return d.select("doc_id", is_empty_expr(probe).alias("is_empty"))


SQL_EMPTY_PREDICATE = """
SELECT doc_id,
       (v IS NULL OR trim(v) = '' OR trim(v) = '?') AS is_empty
FROM (SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN '?'
                  WHEN doc_id % 11 = 0 THEN '   '
                  ELSE text END AS v
      FROM documents)"""


def q_id_gen(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    base = F.col("doc_id").cast("string")
    return d.select(
        "doc_id",
        F.concat(base, F.lit("$"), F.substring(F.sha2(base, 256), 1, 8)).alias(
            "gen_id"
        ),
    )


SQL_ID_GEN = """
SELECT doc_id,
       CAST(doc_id AS VARCHAR) || '$' ||
       substring(sha256(CAST(doc_id AS VARCHAR)), 1, 8) AS gen_id
FROM documents"""


def q_base_id_roundtrip(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    base = F.col("doc_id").cast("string")
    chunk_id = F.concat(
        base,
        F.lit("$"),
        F.substring(F.md5(base), 1, 8),
        F.lit("_"),
        (F.col("doc_id") % 5).cast("string"),
    )
    return d.select(
        "doc_id", chunk_id.alias("id"), base_id_expr(chunk_id).alias("base_id")
    )


SQL_BASE_ID = r"""
SELECT doc_id, id, regexp_replace(id, '^(.*\$.*)_\d+$', '\1') AS base_id
FROM (SELECT doc_id,
             CAST(doc_id AS VARCHAR) || '$' ||
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) || '_' ||
             CAST(doc_id % 5 AS VARCHAR) AS id
      FROM documents)"""


def q_umlaut_translit(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    probe = F.concat(F.col("c_name"), F.lit(" Größe Müß Ärger"))
    return c.select("c_custkey", replace_umlauts_expr(probe).alias("translit"))


SQL_UMLAUT = """
SELECT c_custkey,
       replace(replace(replace(replace(replace(replace(replace(
         c_name || ' Größe Müß Ärger',
         'ä', 'ae'), 'ö', 'oe'), 'ü', 'ue'),
         'Ä', 'Ae'), 'Ö', 'Oe'), 'Ü', 'Ue'), 'ß', 'ss') AS translit
FROM customer"""


def q_boolean_coercion(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    raw = (
        F.when(F.col("value") > 66, F.lit("Yes"))
        .when(F.col("value") > 33, F.lit("1"))
        .when(F.col("value") > 20, F.lit("ja"))
        .otherwise(F.lit("no"))
    )
    return e.select("event_id", boolean_coerce_expr(raw).alias("truthy"))


SQL_BOOLEAN_COERCION = """
SELECT event_id,
       lower(trim(CASE WHEN value > 66 THEN 'Yes'
                       WHEN value > 33 THEN '1'
                       WHEN value > 20 THEN 'ja'
                       ELSE 'no' END)) IN ('true', '1', 'yes', 'y', 'ja') AS truthy
FROM events"""


def q_metrics_boolean(spark, sf_dir):
    from llmaix_spark.evaluation import boolean_label_metrics

    o = _t(spark, sf_dir, "orders")
    j = o.select(
        F.lit("high_value").alias("label"),
        F.when(F.col("o_totalprice") > 250000, F.lit("yes"))
        .otherwise(F.lit("no"))
        .alias("gt"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit("true")
        )
        .otherwise(F.lit("?"))
        .alias("pred"),
    )
    m = boolean_label_metrics(j, "gt", "pred")
    return m.select(
        "label",
        *[F.col(c).cast("bigint").alias(c) for c in ("tp", "tn", "fp", "fn")],
        *[
            F.round(F.col(c), 6).alias(c)
            for c in (
                "accuracy",
                "precision",
                "recall",
                "f1",
                "specificity",
                "false_positive_rate",
                "false_negative_rate",
            )
        ],
    )


SQL_METRICS_BOOLEAN = """
WITH j AS (
  SELECT (o_totalprice > 250000) AS g,
         (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS p
  FROM orders),
c AS (
  SELECT CAST(sum(CASE WHEN g AND p THEN 1 ELSE 0 END) AS BIGINT) tp,
         CAST(sum(CASE WHEN NOT g AND NOT p THEN 1 ELSE 0 END) AS BIGINT) tn,
         CAST(sum(CASE WHEN NOT g AND p THEN 1 ELSE 0 END) AS BIGINT) fp,
         CAST(sum(CASE WHEN g AND NOT p THEN 1 ELSE 0 END) AS BIGINT) fn
  FROM j)
SELECT 'high_value' AS label, tp, tn, fp, fn,
       round((tp + tn) * 1.0 / nullif(tp + tn + fp + fn, 0), 6) AS accuracy,
       round(CASE WHEN tp + fp > 0 THEN tp * 1.0 / (tp + fp) ELSE 0 END, 6) AS precision,
       round(CASE WHEN tp + fn > 0 THEN tp * 1.0 / (tp + fn) ELSE 0 END, 6) AS recall,
       round(CASE WHEN (CASE WHEN tp + fp > 0 THEN tp * 1.0 / (tp + fp) ELSE 0 END)
                     + (CASE WHEN tp + fn > 0 THEN tp * 1.0 / (tp + fn) ELSE 0 END) > 0
             THEN 2 * (CASE WHEN tp + fp > 0 THEN tp * 1.0 / (tp + fp) ELSE 0 END)
                    * (CASE WHEN tp + fn > 0 THEN tp * 1.0 / (tp + fn) ELSE 0 END)
                  / ((CASE WHEN tp + fp > 0 THEN tp * 1.0 / (tp + fp) ELSE 0 END)
                     + (CASE WHEN tp + fn > 0 THEN tp * 1.0 / (tp + fn) ELSE 0 END))
             ELSE 0 END, 6) AS f1,
       round(CASE WHEN tn + fp > 0 THEN tn * 1.0 / (tn + fp) ELSE 0 END, 6) AS specificity,
       round(CASE WHEN tn + fp > 0 THEN fp * 1.0 / (tn + fp) ELSE 0 END, 6) AS false_positive_rate,
       round(CASE WHEN tp + fn > 0 THEN fn * 1.0 / (tp + fn) ELSE 0 END, 6) AS false_negative_rate
FROM c"""


def q_metrics_stringmatch(spark, sf_dir):
    from llmaix_spark.evaluation import stringmatch_label_metrics

    d = _t(spark, sf_dir, "documents")
    j = d.select(
        F.col("lang").alias("label"),
        F.col("lang").alias("gt"),
        ts.lang_id_expr(F.col("text")).alias("pred"),
    )
    m = stringmatch_label_metrics(j, "gt", "pred")
    return m.select(
        "label",
        F.col("match").cast("bigint").alias("match"),
        F.col("no_match").cast("bigint").alias("no_match"),
        F.round("accuracy", 6).alias("accuracy"),
    )


def _lang_id_sql(text: str = "text") -> str:
    hit = {
        lang: (
            f"len(list_filter(string_split(lower(trim({text})), ' '), "
            f"x -> x IN ({', '.join(repr(m) for m in ms)})))"
        )
        for lang, ms in ts.LANG_MARKERS.items()
    }
    best = f"greatest({hit['en']}, {hit['de']}, {hit['es']}, {hit['fr']})"
    return (
        f"CASE WHEN {best} = 0 THEN 'und' "
        f"WHEN {hit['en']} = {best} THEN 'en' "
        f"WHEN {hit['de']} = {best} THEN 'de' "
        f"WHEN {hit['es']} = {best} THEN 'es' "
        f"ELSE 'fr' END"
    )


SQL_METRICS_STRINGMATCH = f"""
WITH j AS (
  SELECT lang AS label, lang AS gt, {_lang_id_sql()} AS pred FROM documents)
SELECT label,
       CAST(sum(CASE WHEN lower(trim(gt)) = lower(trim(pred)) THEN 1 ELSE 0 END) AS BIGINT) AS match,
       CAST(sum(CASE WHEN lower(trim(gt)) = lower(trim(pred)) THEN 0 ELSE 1 END) AS BIGINT) AS no_match,
       round(avg(CASE WHEN lower(trim(gt)) = lower(trim(pred)) THEN 1.0 ELSE 0.0 END), 6) AS accuracy
FROM j GROUP BY label"""


def q_fuzzy_part_pairs(spark, sf_dir):
    """JN4 recast: fuzzy θ-join with explicit blocking — candidate pairs
    share the first name token (the blocking key), scored with built-in
    levenshtein, kept at distance ≤ 4.

    EXACT-BY-SPEC ORACLE PATH (like dedup's ngram_jaccard_pairs): the
    oracle pins the FULL within-block pair set, so no bucket cap can
    apply here — on this corpus the 8 coarse blocks make the query
    output-bound by construction (11.7 M matching pairs at sf0.1,
    measured). It is deliberately NOT on the bench headline list; the
    production linking path (operators/linking.py) carries the bucket
    cap + length gate, and `fuzzy_part_pairs_capped` below oracles the
    member-cap variant that IS the 100 TB shape."""
    p = _t(spark, sf_dir, "part")
    key = F.split("p_name", " ").getItem(0)
    a = p.select(F.col("p_partkey").alias("part_a"), F.col("p_name").alias("name_a"), key.alias("k"))
    b = p.select(F.col("p_partkey").alias("part_b"), F.col("p_name").alias("name_b"), key.alias("k"))
    # measured at sf0.1: a |len diff| pre-gate and the threshold-banded
    # levenshtein BOTH pessimize here (42.8 s plain vs 65 s gated vs
    # 93 s banded) — the palette-generated names make the blocked join
    # OUTPUT-bound (11.7 M matching pairs), so per-pair pre-filters are
    # pure overhead. Keep the minimal plan.
    return (
        a.join(b, ["k"])
        .filter(F.col("part_a") < F.col("part_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("bigint"))
        .filter(F.col("dist") <= 4)
        .select("part_a", "part_b", "dist")
        .distinct()
    )


SQL_FUZZY_PART_PAIRS = """
SELECT DISTINCT a.p_partkey AS part_a, b.p_partkey AS part_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM part a JOIN part b
  ON string_split(a.p_name, ' ')[1] = string_split(b.p_name, ' ')[1]
 AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 4"""


FUZZY_BLOCK_CAP = 100


def q_fuzzy_part_pairs_capped(spark, sf_dir):
    """The 100×-scale variant of fuzzy_part_pairs: each block keeps only
    its first FUZZY_BLOCK_CAP members in deterministic p_partkey order
    (row_number ≤ K — the `least(|block|, K)` member cap mirroring
    linking.py's bucket guard), so the self-join cost is
    O(Σ min(|block|, K)²) instead of O(Σ |block|²) — a hot block at
    100× the data costs the same, not 10,000×. The cap is mirrored
    exactly in the DuckDB oracle (same window, same order), so the row
    set stays value-checked.

    Cap-recall trade-off (measured at sf0.1, K=100): the uncapped query
    emits ~11.7 M pairs in ~43 s; the capped one emits 18,610 in
    2.1 s. On THIS corpus blocking is coarse (8 first-token blocks of
    ~2,500 members), so the cap drops ~99.8% of pairs — which is the
    point: a pair set quadratic in block size is not a scale-safe
    deliverable, and the production linking path additionally verifies
    only LSH-banded candidates. Real matches inside a capped block are
    found when any selective key (LSH band) pairs them."""
    from pyspark.sql import Window

    p = _t(spark, sf_dir, "part")
    key = F.split("p_name", " ").getItem(0)
    capped = (
        p.select(
            F.col("p_partkey").alias("pid"),
            F.col("p_name").alias("name"),
            key.alias("k"),
        )
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("k").orderBy("pid")),
        )
        .filter(F.col("rn") <= FUZZY_BLOCK_CAP)
        .drop("rn")
    )
    a = capped.select(
        F.col("pid").alias("part_a"), F.col("name").alias("name_a"), "k"
    )
    b = capped.select(
        F.col("pid").alias("part_b"), F.col("name").alias("name_b"), "k"
    )
    # no distinct(): each part row owns exactly one block (its own
    # first token) and appears at most once per side after the
    # row_number cap, so every pair is emitted exactly once — a
    # distinct here was a pure extra exchange on a headline-timed
    # query (the SQL twin drops its DISTINCT for the same reason)
    return (
        a.join(b, ["k"])
        .filter(F.col("part_a") < F.col("part_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("bigint"))
        .filter(F.col("dist") <= 4)
        .select("part_a", "part_b", "dist")
    )


SQL_FUZZY_PART_PAIRS_CAPPED = f"""
WITH c AS (
  SELECT p_partkey, p_name,
         string_split(p_name, ' ')[1] AS k,
         row_number() OVER (
           PARTITION BY string_split(p_name, ' ')[1]
           ORDER BY p_partkey) AS rn
  FROM part)
SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM c a JOIN c b ON a.k = b.k AND a.p_partkey < b.p_partkey
WHERE a.rn <= {FUZZY_BLOCK_CAP} AND b.rn <= {FUZZY_BLOCK_CAP}
  AND levenshtein(a.p_name, b.p_name) <= 4"""


def q_fuzzy_token_sort(spark, sf_dir):
    """F6: token-sort composite closing the WRatio reorder gap — same
    blocking join as fuzzy_part_pairs (and the same EXACT-BY-SPEC
    ORACLE PATH status: full within-block pair set pinned by the
    oracle, output-bound, off the headline list; the capped shape is
    oracled by fuzzy_part_pairs_capped), but the right surface is
    word-REVERSED and scored with greatest(plain, token_sort): reordered
    names pass the 90 gate that plain normalized Levenshtein fails
    (reference scorer: thefuzz WRatio, report_redaction/utils.py:431).
    `plain` is kept in the output so the rescue is visible."""
    from llmaix_spark.functions.fuzzy import ratio_expr

    p = _t(spark, sf_dir, "part")
    key = F.split("p_name", " ").getItem(0)
    # precompute the token-sorted surface PER ROW, not per pair: sorting
    # inside the pair scorer re-sorted both names for every one of the
    # O(block²) pairs (the sorted form of the reversed surface equals
    # the sorted form of the original — sorting is order-invariant)
    srt = F.concat_ws(" ", F.array_sort(F.split("p_name", " ")))
    a = p.select(
        F.col("p_partkey").alias("part_a"),
        F.col("p_name").alias("name_a"),
        srt.alias("sort_a"),
        key.alias("k"),
    )
    b = p.select(
        F.col("p_partkey").alias("part_b"),
        F.concat_ws(" ", F.reverse(F.split("p_name", " "))).alias("name_b"),
        srt.alias("sort_b"),
        key.alias("k"),
    )
    plain = F.round(ratio_expr(F.col("name_a"), F.col("name_b")), 4)
    tsort = F.round(ratio_expr(F.col("sort_a"), F.col("sort_b")), 4)
    # no length pre-gate: measured at sf0.1 it SLOWS the query (122 s
    # gated vs 65 s without — most pairs pass it on this corpus, so it
    # is per-pair overhead, not pruning). The presorted surfaces are
    # the real win: 166 s → 65 s vs sorting inside the pair scorer.
    return (
        a.join(b, ["k"])
        .filter(F.col("part_a") < F.col("part_b"))
        .select(
            "part_a",
            "part_b",
            plain.alias("plain"),
            tsort.alias("tsort"),
        )
        .filter(F.greatest(F.col("plain"), F.col("tsort")) >= 90)
        .distinct()
    )


SQL_FUZZY_TOKEN_SORT = """
WITH b AS (
  SELECT p_partkey AS part_b,
         array_to_string(list_reverse(string_split(p_name, ' ')), ' ') AS name_b,
         string_split(p_name, ' ')[1] AS k
  FROM part),
scored AS (
  SELECT DISTINCT a.p_partkey AS part_a, b.part_b,
    round(100.0 * (1.0 - levenshtein(a.p_name, b.name_b)
                   / greatest(length(a.p_name), length(b.name_b), 1)), 4) AS plain,
    round(100.0 * (1.0 - levenshtein(
            array_to_string(list_sort(string_split(a.p_name, ' ')), ' '),
            array_to_string(list_sort(string_split(b.name_b, ' ')), ' '))
          / greatest(length(array_to_string(list_sort(string_split(a.p_name, ' ')), ' ')),
                     length(array_to_string(list_sort(string_split(b.name_b, ' ')), ' ')),
                     1)), 4) AS tsort
  FROM part a JOIN b ON string_split(a.p_name, ' ')[1] = b.k
   AND a.p_partkey < b.part_b)
SELECT part_a, part_b, plain, tsort
FROM scored WHERE greatest(plain, tsort) >= 90"""


def q_masking(spark, sf_dir):
    """F3 length-preserving masking, oracled via fixed-word replace (the
    general UDF handles arbitrary case-insensitive PII lists — pytest
    covers that; here the fixed lowercase token keeps it SQL-checkable)."""
    from llmaix_spark.functions.masking import masked_col

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        masked_col(F.col("text"), F.array(F.lit("spark")), "■").alias("masked"),
    )


SQL_MASKING = """
SELECT doc_id, replace(text, 'spark', '■■■■■') AS masked FROM documents"""


# ---------------------------------------------------------------------------
# dedup / similarity / textstats


def q_dedup_exact(spark, sf_dir):
    out = dd.exact_dedup(_t(spark, sf_dir, "documents"))
    return out.select("keep_id", F.col("n_dups").cast("bigint").alias("n_dups"))


SQL_DEDUP_EXACT = r"""
SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups
FROM documents
GROUP BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"""


_TRIGRAM_SQL = """
d AS (SELECT doc_id, string_split(trim(text), ' ') w FROM documents),
tok AS (SELECT doc_id, generate_subscripts(w, 1) i, unnest(w) t FROM d),
tri AS (SELECT doc_id,
               t || ' ' || lead(t, 1) OVER win || ' ' || lead(t, 2) OVER win AS s,
               lead(t, 2) OVER win AS l2
        FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
sh AS (SELECT DISTINCT doc_id, s FROM tri WHERE l2 IS NOT NULL),
cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1)
"""


def q_dedup_ngram_jaccard(spark, sf_dir):
    out = dd.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), 0.5)
    return out


SQL_DEDUP_NGRAM = f"""
WITH {_TRIGRAM_SQL},
common AS (SELECT a.doc_id da, b.doc_id db, count(*) c FROM sh a
           JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT da AS doc_a, db AS doc_b,
       round(c * 1.0 / (na.n + nb.n - c), 6) AS jaccard
FROM common JOIN cnt na ON da = na.doc_id JOIN cnt nb ON db = nb.doc_id
WHERE c * 1.0 / (na.n + nb.n - c) >= 0.5"""


def q_dedup_jaccard_prefix(spark, sf_dir):
    """Prefix-filtered exact Jaccard self-join (PPJoin-family): the
    candidate join touches only each record's rarest
    ``|x| - ceil(t*|x|) + 1`` shingles in the global (df, shingle)
    order, then exact-verifies. The prefix-filtering principle makes
    the output BIT-IDENTICAL to the all-pairs join, so the oracle is
    deliberately the brute-force SQL twin (SQL_DEDUP_NGRAM) — two
    independent algorithms must agree — while the Spark plan never
    builds the quadratic join."""
    return dd.jaccard_prefix_pairs(_t(spark, sf_dir, "documents"), 0.5)


# identical-by-theorem to the brute-force result (see q docstring)
SQL_DEDUP_JACCARD_PREFIX = SQL_DEDUP_NGRAM


def q_dedup_minhash(spark, sf_dir):
    return dd.minhash_dedup_pairs(_t(spark, sf_dir, "documents"), 0.5)


def _minhash_pairs_ctes() -> str:
    """CTE chain ending in mh_pairs(da, db, jaccard): the full MinHash →
    banded-LSH → exact-verify pair generator, shared by the pair query
    and the LSH clustering oracle."""
    h = f"({_HASH60_SQL.format(v='s')} % {_P})"
    mins = ",\n       ".join(
        f"min(({a} * {h} + {b}) % {_P}) AS h{i}"
        for i, (a, b) in enumerate(_MINHASH_AB)
    )
    bands = ", ".join(
        "CAST(h{} AS VARCHAR) || ':' || CAST(h{} AS VARCHAR)".format(
            b * 2, b * 2 + 1
        )
        for b in range(8)
    )
    return f"""{_TRIGRAM_SQL},
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
banded AS (
  SELECT doc_id, generate_subscripts(bv, 1) - 1 AS band_idx, unnest(bv) AS band_val
  FROM (SELECT doc_id, [{bands}] AS bv FROM sig)),
cand AS (SELECT DISTINCT a.doc_id da, b.doc_id db FROM banded a
         JOIN banded b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
                      AND a.doc_id < b.doc_id),
common AS (SELECT da, db, count(*) c
           FROM cand JOIN sh sa ON sa.doc_id = da
                     JOIN sh sb ON sb.doc_id = db AND sb.s = sa.s
           GROUP BY 1, 2),
mh_pairs AS (
  SELECT da, db, round(c * 1.0 / (na.n + nb.n - c), 6) AS jaccard
  FROM common JOIN cnt na ON da = na.doc_id JOIN cnt nb ON db = nb.doc_id
  WHERE c * 1.0 / (na.n + nb.n - c) >= 0.5)"""


SQL_DEDUP_MINHASH = f"""
WITH {_minhash_pairs_ctes()}
SELECT da AS doc_a, db AS doc_b, jaccard FROM mh_pairs"""


def q_dedup_simhash(spark, sf_dir):
    return dd.simhash(_t(spark, sf_dir, "documents"))


def _simhash_sql() -> str:
    h = _HASH60_SQL.format(v="t")
    sums = ", ".join(
        f"sum(((({h} >> {b}) & 1) * 2 - 1)) AS s{b}" for b in range(dd.SIMHASH_BITS)
    )
    bits = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {2**b} ELSE 0 END)"
        for b in range(dd.SIMHASH_BITS)
    )
    return f"""
WITH d AS (SELECT doc_id, string_split(trim(text), ' ') w FROM documents),
tok AS (SELECT DISTINCT doc_id, unnest(w) t FROM d),
tok2 AS (SELECT doc_id, t FROM tok WHERE length(t) > 0),
sums AS (SELECT doc_id, {sums} FROM tok2 GROUP BY doc_id)
SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM sums"""


SQL_DEDUP_SIMHASH = _simhash_sql()


def q_dedup_embedding(spark, sf_dir):
    out = dd.embedding_dup_pairs(_t(spark, sf_dir, "embeddings"), 0.4, round_dp=4)
    return out


SQL_DEDUP_EMBEDDING = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cosine
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND round(list_cosine_similarity(a.embedding, b.embedding), 4) >= 0.4"""


def q_dedup_embedding_ivf(spark, sf_dir):
    """Bucketed embedding near-dup pairs (pairwise cosine within IVF
    buckets) — the scale path twin of dedup_embedding. The oracle
    replicates bucket assignment, so the approximation is value-checked;
    recall vs brute force is measured in tests/test_dedup_similarity."""
    return dd.embedding_dup_pairs_ivf(
        _t(spark, sf_dir, "embeddings"), 0.4, n_centroids=16, round_dp=4
    )


SQL_DEDUP_EMBEDDING_IVF = """
WITH
cent AS (
  SELECT vec_id AS centroid_id, embedding AS centv
  FROM embeddings ORDER BY vec_id LIMIT 16),
assigned AS (
  SELECT vec_id, v, bucket FROM (
    SELECT e.vec_id, e.embedding AS v, c.centroid_id AS bucket,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(c.centv, e.embedding), 4)
                        DESC,
                      c.centroid_id) AS rnk
    FROM embeddings e CROSS JOIN cent c)
  WHERE rnk = 1)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.v, b.v), 4) AS cosine
FROM assigned a JOIN assigned b
  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.4"""


def q_similarity_topk(spark, sf_dir):
    out = sim.cosine_topk(
        _t(spark, sf_dir, "embeddings"), [0, 1, 2, 3, 4], k=10, round_dp=4
    )
    return out.select(
        "query_id", "vec_id", F.col("rank").cast("bigint").alias("rank"), "cosine"
    )


SQL_SIMILARITY_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id IN (0,1,2,3,4)),
scored AS (
  SELECT q.query_id, c.vec_id,
         round(list_cosine_similarity(q.qv, c.embedding), 4) AS cosine
  FROM q JOIN embeddings c ON c.vec_id != q.query_id),
ranked AS (
  SELECT query_id, vec_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
  FROM scored)
SELECT query_id, vec_id, rank, cosine FROM ranked WHERE rank <= 10"""


def q_textstats_tokens(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    c = F.col("text")
    return d.select(
        "doc_id",
        ts.token_count_ws(c).cast("bigint").alias("n_tokens_ws"),
        ts.token_count_bpe(c).cast("bigint").alias("n_tokens_bpe"),
    )


SQL_TEXTSTATS_TOKENS = r"""
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                            x -> length(x) > 0)) AS BIGINT) AS n_tokens_ws,
       CAST(len(regexp_extract_all(text, '[A-Za-zÀ-ÖØ-öø-ÿ]+|[0-9]+|[^\sA-Za-zÀ-ÖØ-öø-ÿ0-9]')) AS BIGINT) AS n_tokens_bpe
FROM documents"""


def q_textstats_quality(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    c = F.col("text")
    return d.select(
        "doc_id",
        F.round(ts.punct_ratio(c), 6).alias("punct_ratio"),
        F.round(ts.stopword_ratio(c), 6).alias("stopword_ratio"),
        F.round(ts.mean_word_len(c), 6).alias("mean_word_len"),
        ts.quality_score_expr(c).alias("quality"),
    )


_SW_IN = ", ".join(repr(s) for s in ts.STOPWORDS)
SQL_TEXTSTATS_QUALITY = rf"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(trim(text)), '\s+'),
                     x -> length(x) > 0) AS toks
  FROM documents),
m AS (
  SELECT doc_id, text, toks,
         length(regexp_replace(text, '[^.,!?;:]', '', 'g')) * 1.0
           / greatest(length(text), 1) AS punct_ratio,
         len(list_filter(toks, x -> x IN ({_SW_IN}))) * 1.0
           / greatest(len(toks), 1) AS stopword_ratio,
         list_sum(list_transform(toks, x -> length(x))) * 1.0
           / greatest(len(toks), 1) AS mean_word_len
  FROM t)
SELECT doc_id,
       round(punct_ratio, 6) AS punct_ratio,
       round(stopword_ratio, 6) AS stopword_ratio,
       round(mean_word_len, 6) AS mean_word_len,
       round(((CASE WHEN length(text) < 20 THEN length(text) / 20.0
                    WHEN length(text) > 2000 THEN 0.5 ELSE 1.0 END)
            + (CASE WHEN mean_word_len >= 2.5 AND mean_word_len <= 12.0
                    THEN 1.0 ELSE 0.5 END)
            + (CASE WHEN stopword_ratio > 0.0 THEN 1.0 ELSE 0.6 END)) / 3.0,
             6) AS quality
FROM m"""


def q_quality_repetition(spark, sf_dir):
    """Gopher-style repetition filters: duplicate-word fraction and
    most-frequent-bigram occupancy per document — the published
    pretraining quality family (drop repetition-dominated docs)."""
    return ts.repetition_stats(_t(spark, sf_dir, "documents"))


# NB oracle precondition (shared with SQL_DECONTAMINATE, _TRIGRAM_SQL
# and the simhash oracle): the SQL tokenizes with string_split(' ')
# while the operators split on \s+ — parity holds because the testdata
# corpus is strictly single-spaced (round-2 memory: documents.text is
# ^[a-z ]+$). A corpus with tabs/doubled spaces would need
# regexp-splitting on both sides.
SQL_QUALITY_REPETITION = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                            x -> length(x) > 0)) AS tok
  FROM documents),
wa AS (SELECT doc_id, count(*) AS n_words,
              count(DISTINCT tok) AS n_distinct
       FROM toks GROUP BY 1),
d AS (SELECT doc_id, string_split(trim(text), ' ') w FROM documents),
tk AS (SELECT doc_id, generate_subscripts(w, 1) i, unnest(w) t FROM d),
bg AS (SELECT doc_id, t || ' ' || lead(t, 1) OVER win AS s,
              lead(t, 1) OVER win AS l1
       FROM tk WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
bc AS (SELECT doc_id, s, count(*) AS c FROM bg WHERE l1 IS NOT NULL
       GROUP BY 1, 2),
tb AS (SELECT doc_id, max(c) AS top_bigram_n FROM bc GROUP BY 1)
SELECT d2.doc_id,
       CAST(COALESCE(wa.n_words, 0) AS BIGINT) AS n_words,
       CAST(COALESCE(wa.n_distinct, 0) AS BIGINT) AS n_distinct_words,
       round(COALESCE(1.0 - (wa.n_distinct * 1.0 / wa.n_words), 0.0), 6)
         AS dup_word_frac,
       CASE WHEN tb.top_bigram_n IS NULL THEN 0.0
            ELSE round(tb.top_bigram_n * 1.0 / (wa.n_words - 1), 6)
       END AS top_bigram_frac
FROM documents d2
LEFT JOIN wa ON d2.doc_id = wa.doc_id
LEFT JOIN tb ON d2.doc_id = tb.doc_id"""


def q_quality_entropy(spark, sf_dir):
    """Per-document token-histogram Shannon entropy — the third
    standard repetition signal next to dup_word_frac/top_bigram_frac
    (near-zero = token spam, log2(n_words) = all-distinct)."""
    return ts.token_entropy(_t(spark, sf_dir, "documents"))


SQL_QUALITY_ENTROPY = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                            x -> length(x) > 0)) AS tok
  FROM documents),
tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
nw AS (SELECT doc_id, sum(c) AS n_words FROM tc GROUP BY 1),
terms AS (
  SELECT tc.doc_id, nw.n_words,
         round(-(tc.c * 1.0 / nw.n_words)
               * log2(tc.c * 1.0 / nw.n_words), 8) AS term
  FROM tc JOIN nw ON tc.doc_id = nw.doc_id),
ent AS (SELECT doc_id, n_words, round(sum(term), 4) AS entropy
        FROM terms GROUP BY 1, 2)
SELECT d.doc_id, CAST(COALESCE(ent.n_words, 0) AS BIGINT) AS n_words,
       ent.entropy
FROM documents d LEFT JOIN ent ON d.doc_id = ent.doc_id"""


def q_lang_id(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", ts.lang_id_expr(F.col("text")).alias("lang_pred"))


SQL_LANG_ID = f"SELECT doc_id, {_lang_id_sql()} AS lang_pred FROM documents"


def q_fingerprint(spark, sf_dir):
    out = ts.doc_fingerprint(_t(spark, sf_dir, "documents"), n=5)
    return out.select(
        "doc_id", "fp_min", "fp_max", F.col("fp_n").cast("bigint").alias("fp_n")
    )


def _gram_expr_sql(n: int) -> str:
    """The rotate-XOR n-gram hash over a doc-ordered token-hash window
    (SQL twin of textstats.ngram_hash_array's per-position gram)."""
    terms = []
    for j in range(n):
        lead = "th" if j == 0 else f"lead(th, {j}) OVER win"
        k = 7 * j
        if k == 0:
            terms.append(f"({lead})")
        else:
            low_mask = (1 << (60 - k)) - 1
            terms.append(
                f"(((({lead}) & {low_mask}) << {k}) | (({lead}) >> {60 - k}))"
            )
    g = terms[0]
    for t in terms[1:]:
        g = f"xor({g}, {t})"
    return g


def _fingerprint_sql(n: int = 5) -> str:
    h = _HASH60_SQL.format(v="t")
    g = _gram_expr_sql(n)
    return f"""
WITH d AS (SELECT doc_id, string_split(trim(text), ' ') w FROM documents),
tok AS (SELECT doc_id, generate_subscripts(w, 1) i, unnest(w) t FROM d),
th0 AS (SELECT doc_id, i, {h} AS th FROM tok WHERE length(t) > 0),
gram AS (SELECT doc_id, {g} AS g,
                lead(th, {n - 1}) OVER win AS l_last
         FROM th0 WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
hs AS (SELECT doc_id, g AS h FROM gram WHERE l_last IS NOT NULL)
SELECT doc_id, min(h) AS fp_min, max(h) AS fp_max,
       CAST(count(DISTINCT h) AS BIGINT) AS fp_n
FROM hs GROUP BY doc_id"""


SQL_FINGERPRINT = _fingerprint_sql()


def q_dup_ngram_spans(spark, sf_dir):
    """Cross-document repeated n-gram mass (trigrams, ≥2 distinct
    docs): the bounded n-gram variant of suffix-array substring dedup.
    Trigrams (not the fingerprint's 5-grams) so the synthetic corpus's
    small vocabulary actually produces cross-doc repeats to count."""
    from llmaix_spark.operators.dedup import dup_ngram_spans

    return dup_ngram_spans(_t(spark, sf_dir, "documents"), n=3)


def _dup_ngram_sql(n: int = 3, min_docs: int = 2) -> str:
    h = _HASH60_SQL.format(v="t")
    g = _gram_expr_sql(n)
    return f"""
WITH d AS (SELECT doc_id, string_split(trim(text), ' ') w FROM documents),
tok AS (SELECT doc_id, generate_subscripts(w, 1) i, unnest(w) t FROM d),
th0 AS (SELECT doc_id, i, {h} AS th FROM tok WHERE length(t) > 0),
gram AS (SELECT doc_id, {g} AS g,
                lead(th, {n - 1}) OVER win AS l_last
         FROM th0 WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
hs AS (SELECT doc_id, g AS h FROM gram WHERE l_last IS NOT NULL),
stats AS (SELECT h, count(DISTINCT doc_id) AS nd FROM hs GROUP BY 1),
per_doc AS (
  SELECT hs.doc_id,
         CAST(count(*) AS BIGINT) AS n_ngrams,
         CAST(sum(CASE WHEN s.nd >= {min_docs} THEN 1 ELSE 0 END)
              AS BIGINT) AS dup_ngrams
  FROM hs JOIN stats s ON hs.h = s.h
  GROUP BY 1)
SELECT doc.doc_id,
       COALESCE(p.n_ngrams, 0) AS n_ngrams,
       COALESCE(p.dup_ngrams, 0) AS dup_ngrams,
       CASE WHEN p.n_ngrams IS NULL THEN 0.0
            ELSE round(CAST(p.dup_ngrams AS DOUBLE)
                       / CAST(p.n_ngrams AS DOUBLE), 4) END AS dup_frac
FROM documents doc LEFT JOIN per_doc p ON doc.doc_id = p.doc_id"""


SQL_DUP_NGRAM_SPANS = _dup_ngram_sql()


def q_dataset_split(spark, sf_dir):
    """Deterministic hash-based train/val/test split (90/5/5): pure
    projection over the shared cross-engine hash — stable across runs,
    engines and corpus growth (an id never changes split)."""
    from llmaix_spark.operators.curation import dataset_split

    return dataset_split(_t(spark, sf_dir, "documents"))


SQL_DATASET_SPLIT = f"""
SELECT doc_id,
       CASE WHEN {_HASH60_SQL.format(v="CAST(doc_id AS VARCHAR) || ':split'")} % 10000 < 9000 THEN 'train'
            WHEN {_HASH60_SQL.format(v="CAST(doc_id AS VARCHAR) || ':split'")} % 10000 < 9500 THEN 'val'
            ELSE 'test' END AS split
FROM documents"""


def q_pack_sequences(spark, sf_dir):
    """Shard-local context-window packing: documents cut into packs
    every 256 cumulative whitespace tokens within their id-shard —
    the batch-construction step of a training pipeline. The window
    partitions by shard, so packing parallelizes."""
    from llmaix_spark.operators.curation import pack_sequences

    return pack_sequences(_t(spark, sf_dir, "documents"), budget=256,
                          n_shards=32)


SQL_PACK_SEQUENCES = r"""
WITH base AS (
  SELECT doc_id, CAST(doc_id % 32 AS BIGINT) AS shard,
         CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> length(x) > 0)) AS BIGINT) AS n_tokens
  FROM documents)
SELECT doc_id, shard, n_tokens,
       CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                   - n_tokens) * 1.0 / 256) AS BIGINT) AS pack_id
FROM base"""


def q_pack_shards(spark, sf_dir):
    """materialize_packs — the physical shard-writing step: one row
    per (shard, pack_id) with the EOS-joined text in doc order and the
    char-offset span string a loader needs to recover document
    boundaries. The oracle rebuilds the same packs, string_agg's the
    text, and derives spans from the windowed cumulative length."""
    from llmaix_spark.operators.curation import materialize_packs

    return materialize_packs(
        _t(spark, sf_dir, "documents"), budget=256, n_shards=32
    )


SQL_PACK_SHARDS = r"""
WITH base AS (
  SELECT doc_id, CAST(doc_id % 32 AS BIGINT) AS shard,
         CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> length(x) > 0)) AS BIGINT) AS n_tokens,
         text
  FROM documents),
packs AS (
  SELECT doc_id, shard, text,
         CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                     - n_tokens) * 1.0 / 256) AS BIGINT) AS pack_id
  FROM base),
off AS (
  SELECT shard, pack_id, doc_id, text,
         COALESCE(sum(length(text) + 4) OVER (
           PARTITION BY shard, pack_id ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS begin
  FROM packs)
SELECT shard, pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) + 4 * (count(*) - 1) AS BIGINT) AS pack_len,
       string_agg(text, '</s>' ORDER BY doc_id) AS text,
       string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(begin AS VARCHAR)
                  || ':' || CAST(begin + length(text) AS VARCHAR),
                  ';' ORDER BY doc_id) AS spans
FROM off GROUP BY shard, pack_id"""


def q_pack_sequences_bpe(spark, sf_dir):
    """pack_sequences on a REAL tokenizer budget: same shard-local
    packing, but the cumulative count is the BPE-ish pre-tokenizer
    token count (word pieces + digit runs + standalone punctuation —
    textstats.token_count_bpe) instead of whitespace words. This is the
    budget a training pipeline actually packs on; the arithmetic and
    the plan (one exchange on shard) are identical.

    Packs the EVENTS props column, not documents.text: the documents
    fixture is strictly ^[a-z ]+$ (single-spaced letters), on which the
    BPE regex degenerates to the whitespace count and the oracle would
    be vacuous (review finding). events.props is JSON — braces, quotes,
    colons, digit runs — so every BPE-distinguishing class (standalone
    punctuation, digit runs, punctuation-adjacent words) is exercised
    by the value hash."""
    from llmaix_spark.operators.curation import pack_sequences
    from llmaix_spark.operators.textstats import token_count_bpe

    return pack_sequences(
        _t(spark, sf_dir, "events"),
        budget=256,
        n_shards=32,
        id_col="event_id",
        text_col="props",
        token_counter=token_count_bpe,
    )


SQL_PACK_SEQUENCES_BPE = r"""
WITH base AS (
  SELECT event_id AS doc_id, CAST(event_id % 32 AS BIGINT) AS shard,
         CAST(len(regexp_extract_all(props,
              '[A-Za-zÀ-ÖØ-öø-ÿ]+|[0-9]+|[^\sA-Za-zÀ-ÖØ-öø-ÿ0-9]'))
              AS BIGINT) AS n_tokens
  FROM events)
SELECT doc_id, shard, n_tokens,
       CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                   - n_tokens) * 1.0 / 256) AS BIGINT) AS pack_id
FROM base"""


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination sweep: flag documents sharing any word
    8-gram with the held-out set (doc_id % 97 == 0 as the derived
    benchmark slice). Both sides reduce to 8-byte hashes before the
    join."""
    from llmaix_spark.operators.curation import decontaminate

    d = _t(spark, sf_dir, "documents")
    return decontaminate(d, d.filter(F.col("doc_id") % 97 == 0), n=8)


# single-spaced-corpus precondition — see SQL_QUALITY_REPETITION note
SQL_DECONTAMINATE = f"""
WITH d AS (SELECT doc_id, string_split(trim(text), ' ') w FROM documents),
tok AS (SELECT doc_id, generate_subscripts(w, 1) i, unnest(w) t FROM d),
gr AS (SELECT doc_id,
              t || ' ' || lead(t, 1) OVER win || ' ' || lead(t, 2) OVER win
                || ' ' || lead(t, 3) OVER win || ' ' || lead(t, 4) OVER win
                || ' ' || lead(t, 5) OVER win || ' ' || lead(t, 6) OVER win
                || ' ' || lead(t, 7) OVER win AS s,
              lead(t, 7) OVER win AS l7
       FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
sh AS (SELECT DISTINCT doc_id, {_HASH60_SQL.format(v="s")} AS sh_h
       FROM gr WHERE l7 IS NOT NULL),
bench AS (SELECT DISTINCT sh_h FROM sh WHERE doc_id % 97 = 0),
shared AS (SELECT s.doc_id, count(*) AS n
           FROM sh s JOIN bench b ON s.sh_h = b.sh_h GROUP BY 1)
SELECT d2.doc_id, CAST(COALESCE(n, 0) AS BIGINT) AS n_shared,
       COALESCE(n, 0) > 0 AS contaminated
FROM documents d2 LEFT JOIN shared ON d2.doc_id = shared.doc_id"""


def q_unigram_logprob(spark, sf_dir):
    """CCNet-family LM quality proxy: corpus unigram model fitted in
    the same job, per-doc mean log10 token probability. Per-token log10
    rounded to 6dp before averaging (libm 1-ulp differences), mean to
    4dp — the cross-engine contract."""
    from llmaix_spark.operators.curation import unigram_logprob

    return unigram_logprob(_t(spark, sf_dir, "documents"))


SQL_UNIGRAM_LOGPROB = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                            x -> length(x) > 0)) AS tok
  FROM documents),
freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1),
tot AS (SELECT sum(c) AS n_total FROM freq),
scored AS (
  SELECT t.doc_id, round(log10(f.c * 1.0 / (SELECT n_total FROM tot)), 6)
           AS lp
  FROM toks t JOIN freq f ON t.tok = f.tok),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         round(avg(lp), 4) AS mean_logprob
  FROM scored GROUP BY 1)
SELECT d.doc_id, CAST(COALESCE(p.n_words, 0) AS BIGINT) AS n_words,
       p.mean_logprob
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id"""


def q_dedup_lines(spark, sf_dir):
    """C4/CCNet-style cross-document line dedup: each document becomes
    three lines — a header that is shared boilerplate on every 3rd doc,
    a body line (first 6 words of text), and a footer that is shared
    boilerplate on every 4th doc. min_repeat=2 ⇒ each boilerplate line
    survives ONLY at its first (doc_id, line_idx) occurrence; unique
    lines always survive; docs are rebuilt in line order (the oracle
    replicates the hash → stats → verdict → string_agg chain, so
    accidental natural-line collisions stay engine-consistent)."""
    from llmaix_spark.operators.dedup import dedup_lines

    d = _t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    lines = d.select(
        "doc_id",
        F.posexplode(
            F.array(
                F.when(
                    F.col("doc_id") % 3 == 0,
                    F.lit("standard disclaimer applies to this document"),
                ).otherwise(
                    F.concat(F.lit("intro "), F.col("doc_id").cast("string"))
                ),
                F.array_join(F.slice(words, 1, 6), " "),
                F.when(
                    F.col("doc_id") % 4 == 0,
                    F.lit("copyright footer all rights reserved"),
                ).otherwise(F.array_join(F.slice(words, 7, 6), " ")),
            )
        ).alias("line_idx", "line"),
    )
    return dedup_lines(lines, min_repeat=2)


SQL_DEDUP_LINES = r"""
WITH lines AS (
  SELECT doc_id, i - 1 AS line_idx,
         CASE i
           WHEN 1 THEN CASE WHEN doc_id % 3 = 0
             THEN 'standard disclaimer applies to this document'
             ELSE 'intro ' || CAST(doc_id AS VARCHAR) END
           WHEN 2 THEN array_to_string(string_split(text, ' ')[1:6], ' ')
           ELSE CASE WHEN doc_id % 4 = 0
             THEN 'copyright footer all rights reserved'
             ELSE array_to_string(string_split(text, ' ')[7:12], ' ') END
         END AS line
  FROM documents, (SELECT unnest([1, 2, 3]) AS i)),
keyed AS (
  SELECT doc_id, line_idx, line,
         ('0x' || substr(md5(line), 1, 15))::BIGINT AS h
  FROM lines),
stats AS (
  SELECT h, count(DISTINCT doc_id) AS nd,
         min(doc_id * 1000 + line_idx) AS first_key
  FROM keyed GROUP BY 1),
kept AS (
  SELECT k.doc_id, k.line_idx, k.line
  FROM keyed k JOIN stats s ON k.h = s.h
  WHERE s.nd < 2 OR k.doc_id * 1000 + k.line_idx = s.first_key),
rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY line_idx) AS text
  FROM kept GROUP BY 1)
SELECT d.doc_id, COALESCE(r.text, '') AS text
FROM (SELECT DISTINCT doc_id FROM lines) d
LEFT JOIN rebuilt r ON d.doc_id = r.doc_id"""


def q_dsir_importance(spark, sf_dir):
    """DSIR-style hashed importance weights: every 9th document is the
    target distribution, the whole table is the raw corpus; per-doc
    log10 importance = Σ over tokens of the bucket log-ratio
    (Laplace-1 smoothing, 4096 hashed features via the shared md5
    hash). Each log10 term is rounded 6dp BEFORE the subtraction so
    both engines subtract bit-identical doubles; the per-doc sum
    rounds at 4dp."""
    from llmaix_spark.operators.curation import dsir_importance

    d = _t(spark, sf_dir, "documents")
    return dsir_importance(d, d.filter(F.col("doc_id") % 9 == 0))


SQL_DSIR_IMPORTANCE = r"""
WITH toks AS (
  SELECT doc_id,
         ('0x' || substr(md5(unnest(list_filter(
             string_split_regex(lower(trim(text)), '\s+'),
             x -> length(x) > 0))), 1, 15))::BIGINT % 4096 AS b
  FROM documents),
tgt AS (SELECT b, count(*) AS ct FROM toks WHERE doc_id % 9 = 0 GROUP BY 1),
raw AS (SELECT b, count(*) AS cr FROM toks GROUP BY 1),
tt AS (SELECT sum(ct) AS tt FROM tgt),
tr AS (SELECT sum(cr) AS tr FROM raw),
ratio AS (
  SELECT r.b,
         round(log10((COALESCE(t.ct, 0) + 1.0)
                     / ((SELECT tt FROM tt) + 4096.0)), 6)
         - round(log10((r.cr + 1.0)
                       / ((SELECT tr FROM tr) + 4096.0)), 6) AS lr
  FROM raw r LEFT JOIN tgt t ON r.b = t.b),
per_doc AS (
  SELECT k.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         round(sum(ratio.lr), 4) AS log_weight
  FROM toks k JOIN ratio ON k.b = ratio.b
  GROUP BY 1)
SELECT d.doc_id, CAST(COALESCE(p.n_feats, 0) AS BIGINT) AS n_feats,
       p.log_weight
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id"""


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-language downsampling (data mixing): keep 30%
    of 'de', 60% of 'fr', everything else — hash-gated like
    dataset_split, so re-runs and corpus growth never change a
    surviving id's fate."""
    from llmaix_spark.operators.curation import stratified_sample

    return stratified_sample(
        _t(spark, sf_dir, "documents"), {"de": 0.3, "fr": 0.6}
    )


SQL_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang AS stratum
FROM documents
WHERE {_HASH60_SQL.format(v="CAST(doc_id AS VARCHAR) || ':sample'")} % 10000
      < CASE WHEN lang = 'de' THEN 3000
             WHEN lang = 'fr' THEN 6000
             ELSE 10000 END"""


def q_domain_mixture(spark, sf_dir):
    """Temperature-T=2 domain re-mixing over the language column (en
    is ~3.4× over-represented at sf0.01): rates computed from corpus
    statistics, applied through the deterministic hash gate. The
    rarest domain keeps rate 1; en downsamples to sqrt(s_fr/s_en)."""
    from llmaix_spark.operators.curation import domain_mixture

    return domain_mixture(_t(spark, sf_dir, "documents"))


SQL_DOMAIN_MIXTURE = f"""
WITH c AS (
  SELECT lang AS domain, CAST(count(*) AS DOUBLE) AS n_d
  FROM documents GROUP BY 1),
t AS (SELECT sum(n_d) AS n_tot FROM c),
w AS (SELECT domain, n_d,
             sqrt(n_d / (SELECT n_tot FROM t)) AS w_raw FROM c),
ws AS (SELECT sum(w_raw) AS w_sum FROM w),
r AS (SELECT domain, n_d,
             (w_raw / (SELECT w_sum FROM ws))
             / (n_d / (SELECT n_tot FROM t)) AS ratio FROM w),
m AS (SELECT max(ratio) AS mr FROM r),
rates AS (
  SELECT domain,
         CAST(round(ratio / (SELECT mr FROM m) * 1000000) AS BIGINT)
           AS thresh,
         round(ratio / (SELECT mr FROM m), 6) AS keep_rate
  FROM r)
SELECT d.doc_id, rates.domain, rates.keep_rate
FROM documents d JOIN rates ON d.lang = rates.domain
WHERE {_HASH60_SQL.format(v="CAST(d.doc_id AS VARCHAR) || ':mix'")}
      % 1000000 < rates.thresh"""


def q_bpe_pair_counts(spark, sf_dir):
    """Top-20 corpus-weighted adjacent character pairs — the BPE
    trainer's next-merge statistic. The heavy pass is one word-count
    groupBy; pair expansion runs over the distinct vocabulary only."""
    from llmaix_spark.operators.curation import bpe_pair_counts

    return bpe_pair_counts(_t(spark, sf_dir, "documents"))


SQL_BPE_PAIR_COUNTS = r"""
WITH wds AS (
  SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                            x -> length(x) > 0)) AS word
  FROM documents),
wf AS (SELECT word, count(*) AS freq FROM wds GROUP BY 1),
pos AS (
  SELECT word, freq, unnest(range(1, length(word))) AS i
  FROM wf WHERE length(word) >= 2),
agg AS (
  SELECT substr(word, CAST(i AS INTEGER), 2) AS pair,
         CAST(sum(freq) AS BIGINT) AS pair_count
  FROM pos GROUP BY 1)
SELECT pair, pair_count FROM agg
ORDER BY pair_count DESC, pair LIMIT 20"""


def q_profile_quantiles(spark, sf_dir):
    """Per-language distribution profile of n_chars: count, explicit
    sum/count mean, exact interpolated quantiles (percentile_cont
    semantics both engines, 6dp)."""
    from llmaix_spark.operators.profile import profile_quantiles

    return profile_quantiles(
        _t(spark, sf_dir, "documents"), "n_chars", by=["lang"]
    )


SQL_PROFILE_QUANTILES = """
SELECT lang, CAST(count(n_chars) AS BIGINT) AS n,
       round(CAST(sum(n_chars) AS DOUBLE) / count(n_chars), 6) AS mean,
       round(quantile_cont(n_chars, 0.25), 6) AS q25,
       round(quantile_cont(n_chars, 0.5), 6) AS q50,
       round(quantile_cont(n_chars, 0.75), 6) AS q75,
       round(quantile_cont(n_chars, 0.95), 6) AS q95
FROM documents GROUP BY lang"""


def q_profile_histogram(spark, sf_dir):
    """Fixed-width histogram of n_chars (width 100, 20 bins, outliers
    clamped into the edge bins)."""
    from llmaix_spark.operators.profile import profile_histogram

    return profile_histogram(_t(spark, sf_dir, "documents"), "n_chars")


SQL_PROFILE_HISTOGRAM = """
WITH b AS (
  SELECT greatest(0, least(CAST(floor(n_chars / 100) AS BIGINT), 19))
           AS bin,
         n_chars
  FROM documents WHERE n_chars IS NOT NULL)
SELECT bin, CAST(bin * 100 AS BIGINT) AS lo,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(n_chars) AS BIGINT) AS v_min,
       CAST(max(n_chars) AS BIGINT) AS v_max
FROM b GROUP BY bin"""


def q_sample_k_per_group(spark, sf_dir):
    """Exact-k eval-carving sample: the 40 docs per language whose
    salted hash ranks smallest — size-exact (unlike the rate-based
    stratified_sample) and rerun-stable."""
    from llmaix_spark.operators.curation import sample_k_per_group

    return sample_k_per_group(_t(spark, sf_dir, "documents"), k=40)


SQL_SAMPLE_K_PER_GROUP = f"""
WITH h AS (
  SELECT doc_id, lang AS grp,
         {_HASH60_SQL.format(v="CAST(doc_id AS VARCHAR) || ':topk'")} AS hh
  FROM documents),
r AS (
  SELECT doc_id, grp,
         CAST(row_number() OVER (PARTITION BY grp ORDER BY hh) AS BIGINT)
           AS rk
  FROM h)
SELECT doc_id, grp, rk FROM r WHERE rk <= 40"""


def q_tfidf_top_terms(spark, sf_dir):
    """Per-doc top-3 TF-IDF keywords (tf·ln(N/df), 6dp-rounded before
    ranking, ties broken lexicographically)."""
    return ts.tfidf_top_terms(_t(spark, sf_dir, "documents"))


SQL_TFIDF_TOP_TERMS = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                            x -> length(x) > 0)) AS term
  FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM tok GROUP BY 1, 2),
dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(tf.tf * ln((SELECT n_docs FROM n) / dfq.df), 6) AS score
  FROM tf JOIN dfq USING (term)),
r AS (
  SELECT doc_id, term, tf, score,
         CAST(row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, term) AS BIGINT)
           AS rank
  FROM scored)
SELECT doc_id, rank, term, tf, score FROM r WHERE rank <= 3"""


def q_search_rank(spark, sf_dir):
    """Keyword AND-search ('spark' AND 'merge') ranked by summed
    TF-IDF, top-20 — the IR consumer of the shared tfidf_scores
    table. Global top-k is orderBy+limit (TakeOrderedAndProject,
    never a global sort); the rank window sees only the k rows."""
    from llmaix_spark.operators.textstats import search_rank

    return search_rank(
        _t(spark, sf_dir, "documents"), ["spark", "merge"], top_k=20
    )


SQL_SEARCH_RANK = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                            x -> length(x) > 0)) AS term
  FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM tok GROUP BY 1, 2),
dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln((SELECT n_docs FROM n) / dfq.df), 6) AS score
  FROM tf JOIN dfq USING (term)
  WHERE tf.term IN ('merge', 'spark')),
hits AS (
  SELECT doc_id, round(sum(score), 6) AS score
  FROM scored GROUP BY 1 HAVING count(*) = 2),
top AS (SELECT doc_id, score FROM hits
        ORDER BY score DESC, doc_id LIMIT 20)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
         AS rank,
       doc_id, score
FROM top"""


def q_pareto_orders(spark, sf_dir):
    """Pareto frontier of orders under (maximize price, minimize
    orderdate): the early-high-value order set. Two-phase frontier
    (per-partition local frontier → exact global pass on the few
    survivors — no global sort of the corpus); price compares in
    bigint cents. The oracle brute-forces dominance with NOT EXISTS —
    an independent algorithm."""
    from llmaix_spark.operators.profile import pareto_frontier

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("bigint").alias("orderkey"),
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
        F.col("o_orderdate").cast("date").alias("orderdate"),
    )
    out = pareto_frontier(o, "cents", "orderdate", id_cols=["orderkey"])
    return out.select(
        "orderkey",
        F.round(F.col("cents") / 100.0, 2).alias("price"),
        F.col("orderdate").cast("string").alias("orderdate"),
    )


SQL_PARETO_ORDERS = """
WITH o AS (
  SELECT CAST(o_orderkey AS BIGINT) orderkey,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) cents,
         CAST(o_orderdate AS DATE) d
  FROM orders)
SELECT orderkey, round(cents / 100.0, 2) AS price,
       CAST(d AS VARCHAR) AS orderdate
FROM o r
WHERE NOT EXISTS (
  SELECT 1 FROM o s
  WHERE (s.cents > r.cents AND s.d <= r.d)
     OR (s.cents >= r.cents AND s.d < r.d))"""


def q_quantize_embeddings(spark, sf_dir):
    """Symmetric int8 quantization of every embedding, exploded to
    (vec_id, pos, q, scale) long form so the integer codes compare
    exactly across engines."""
    from llmaix_spark.operators.similarity import quantize_embeddings

    q = quantize_embeddings(_t(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id",
        F.posexplode("qvec").alias("pos", "q"),
        F.round("scale", 9).alias("scale"),
    ).select(
        "vec_id", F.col("pos").cast("bigint").alias("pos"), "q", "scale"
    )


SQL_QUANTIZE_EMBEDDINGS = """
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
s AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
  FROM e),
u AS (
  SELECT vec_id, scale,
         generate_subscripts(v, 1) AS pos1, unnest(v) AS x
  FROM s)
SELECT vec_id, CAST(pos1 - 1 AS BIGINT) AS pos,
       CAST(CASE WHEN scale = 0 THEN 0
                 ELSE round(x / scale, 0) END AS BIGINT) AS q,
       round(scale, 9) AS scale
FROM u"""


def q_profile_columns(spark, sf_dir):
    """One-pass table profile of ``documents``: per column — nulls,
    exact distinct, typed min/max. ONE aggregate over the table (the
    countDistincts compile to a single Expand + partial agg, so the
    parquet is scanned exactly once), then a driver-free stack()
    unpivot of the one wide row."""
    from llmaix_spark.operators.profile import profile_columns

    return profile_columns(_t(spark, sf_dir, "documents"))


SQL_PROFILE_COLUMNS = """
WITH d AS (SELECT * FROM documents)
SELECT 'doc_id' AS column_name, count(*) AS n_rows,
       count(*) - count(doc_id) AS n_nulls,
       count(DISTINCT doc_id) AS n_distinct,
       CAST(min(doc_id) AS DOUBLE) AS min_num,
       CAST(max(doc_id) AS DOUBLE) AS max_num,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM d
UNION ALL
SELECT 'n_chars', count(*), count(*) - count(n_chars),
       count(DISTINCT n_chars), CAST(min(n_chars) AS DOUBLE),
       CAST(max(n_chars) AS DOUBLE), NULL, NULL FROM d
UNION ALL
SELECT 'text', count(*), count(*) - count(text), count(DISTINCT text),
       NULL, NULL, min(text), max(text) FROM d
UNION ALL
SELECT 'lang', count(*), count(*) - count(lang), count(DISTINCT lang),
       NULL, NULL, min(lang), max(lang) FROM d
UNION ALL
SELECT 'source', count(*), count(*) - count(source),
       count(DISTINCT source), NULL, NULL, min(source), max(source)
FROM d"""


def q_curation_pipeline(spark, sf_dir):
    """End-to-end curation composition (repetition gates → LM-quality
    percentile band → hash split) — oracles the chain the way
    kg_pipeline_edges oracles the KG chain. Gates chosen against the
    measured sf0.01 distributions so each stage actually drops rows
    (dup_word_frac median 0.54, top_bigram_frac p90 0.07, mean_logprob
    range −1.61..−1.47)."""
    from llmaix_spark.operators.curation import curate_corpus

    return curate_corpus(_t(spark, sf_dir, "documents"))


SQL_CURATION_PIPELINE = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                            x -> length(x) > 0)) AS tok
  FROM documents),
wa AS (SELECT doc_id, count(*) AS n_words,
              count(DISTINCT tok) AS n_distinct
       FROM toks GROUP BY 1),
d AS (SELECT doc_id, string_split(trim(text), ' ') w FROM documents),
tk AS (SELECT doc_id, generate_subscripts(w, 1) i, unnest(w) t FROM d),
bg AS (SELECT doc_id, t || ' ' || lead(t, 1) OVER win AS s,
              lead(t, 1) OVER win AS l1
       FROM tk WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
bc AS (SELECT doc_id, s, count(*) AS c FROM bg WHERE l1 IS NOT NULL
       GROUP BY 1, 2),
tb AS (SELECT doc_id, max(c) AS top_bigram_n FROM bc GROUP BY 1),
freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1),
tot AS (SELECT sum(c) AS n_total FROM freq),
scored AS (
  SELECT t.doc_id, round(log10(f.c * 1.0 / (SELECT n_total FROM tot)), 6)
           AS lp
  FROM toks t JOIN freq f ON t.tok = f.tok),
pd AS (SELECT doc_id, round(avg(lp), 4) AS mean_logprob
       FROM scored GROUP BY 1),
stats AS (
  SELECT wa.doc_id, wa.n_words,
         round(1.0 - (wa.n_distinct * 1.0 / wa.n_words), 6)
           AS dup_word_frac,
         CASE WHEN tb.top_bigram_n IS NULL THEN 0.0
              ELSE round(tb.top_bigram_n * 1.0 / (wa.n_words - 1), 6)
         END AS top_bigram_frac,
         pd.mean_logprob
  FROM wa LEFT JOIN tb ON wa.doc_id = tb.doc_id
          JOIN pd ON wa.doc_id = pd.doc_id),
gated AS (
  SELECT * FROM stats
  WHERE n_words >= 20 AND dup_word_frac <= 0.6
    AND top_bigram_frac <= 0.1 AND mean_logprob IS NOT NULL),
band AS (
  SELECT round(quantile_cont(mean_logprob, 0.05), 6) AS lo,
         round(quantile_cont(mean_logprob, 0.95), 6) AS hi
  FROM gated)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, dup_word_frac,
       top_bigram_frac, mean_logprob,
       CASE WHEN {_HASH60_SQL.format(v="CAST(doc_id AS VARCHAR) || ':split'")} % 10000 < 9000 THEN 'train'
            WHEN {_HASH60_SQL.format(v="CAST(doc_id AS VARCHAR) || ':split'")} % 10000 < 9500 THEN 'val'
            ELSE 'test' END AS split
FROM gated, band
WHERE mean_logprob >= lo AND mean_logprob <= hi"""


def q_dedup_groups(spark, sf_dir):
    """Near-dup clustering over the EXACT pair generator (the oracle
    path — dedup_groups defaults to LSH pairs; the exact variant is
    passed explicitly here so the recursive-CTE oracle stays exact)."""
    return dd.dedup_groups(
        _t(spark, sf_dir, "documents"), 0.5, pairs_fn=dd.ngram_jaccard_pairs
    )


def q_dedup_groups_lsh(spark, sf_dir):
    """Near-dup clustering over the DEFAULT (banded-LSH) pair generator —
    the 100 TB path. The DuckDB oracle replicates the LSH banding itself,
    so candidate recall is compared exactly, not statistically."""
    return dd.dedup_groups(_t(spark, sf_dir, "documents"), 0.5)


SQL_DEDUP_GROUPS_LSH = f"""
WITH RECURSIVE {_minhash_pairs_ctes()},
sym AS (SELECT da a, db b FROM mh_pairs UNION SELECT db, da FROM mh_pairs),
reach(node, comp) AS (
  SELECT a, a FROM sym
  UNION
  SELECT s.b, r.comp FROM reach r JOIN sym s ON s.a = r.node),
cc AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node)
SELECT d.doc_id,
       coalesce(cc.comp, d.doc_id) AS group_id,
       (d.doc_id = coalesce(cc.comp, d.doc_id)) AS keep
FROM documents d LEFT JOIN cc ON d.doc_id = cc.node"""


SQL_DEDUP_GROUPS = f"""
WITH RECURSIVE
{_TRIGRAM_SQL},
common AS (SELECT a.doc_id da, b.doc_id db, count(*) c FROM sh a
           JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
pairs AS (
  SELECT da, db
  FROM common JOIN cnt na ON da = na.doc_id JOIN cnt nb ON db = nb.doc_id
  WHERE c * 1.0 / (na.n + nb.n - c) >= 0.5),
sym AS (SELECT da a, db b FROM pairs UNION SELECT db, da FROM pairs),
reach(node, comp) AS (
  SELECT a, a FROM sym
  UNION
  SELECT s.b, r.comp FROM reach r JOIN sym s ON s.a = r.node),
cc AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node)
SELECT d.doc_id,
       coalesce(cc.comp, d.doc_id) AS group_id,
       (d.doc_id = coalesce(cc.comp, d.doc_id)) AS keep
FROM documents d LEFT JOIN cc ON d.doc_id = cc.node"""


def q_training_corpus(spark, sf_dir):
    """The flagship training-data composition: near-dup dedup (keep one
    per CC group, exact-pair generator for the oracle) → 8-gram
    benchmark decontamination (doc_id % 97 slice as the held-out set)
    → repetition gates → LM band → split. One DuckDB twin value-checks
    the whole chain — the training-data analog of kg_pipeline_edges.
    The unigram model and percentile band are fitted on the CLEANED
    population (dedup first, decontaminate before fitting)."""
    from llmaix_spark.operators.curation import build_training_corpus

    d = _t(spark, sf_dir, "documents")
    return build_training_corpus(
        d,
        d.filter(F.col("doc_id") % 97 == 0),
        dedup_pairs_fn=dd.ngram_jaccard_pairs,
    )


def _lead_chain(col: str, n: int, win: str = "win", sep: str = " ") -> str:
    """t || ' ' || lead(t,1) OVER <win> || ... — the n-gram surface
    used by the 8-gram SQL twins. The window NAME must match the CTE's
    own WINDOW clause: DuckDB scopes window names per WITH statement
    under RECURSIVE (a bare 'win' here resolved, incorrectly by luck,
    against _TRIGRAM_SQL's unrelated window — review finding)."""
    parts = [col] + [f"lead({col}, {i}) OVER {win}" for i in range(1, n)]
    return f" || '{sep}' || ".join(parts)


SQL_TRAINING_CORPUS = f"""
WITH RECURSIVE
{_TRIGRAM_SQL},
common AS (SELECT a.doc_id da, b.doc_id db, count(*) c FROM sh a
           JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
pairs AS (
  SELECT da, db
  FROM common JOIN cnt na ON da = na.doc_id JOIN cnt nb ON db = nb.doc_id
  WHERE c * 1.0 / (na.n + nb.n - c) >= 0.5),
sym AS (SELECT da a, db b FROM pairs UNION SELECT db, da FROM pairs),
reach(node, comp) AS (
  SELECT a, a FROM sym
  UNION
  SELECT s.b, r.comp FROM reach r JOIN sym s ON s.a = r.node),
cc AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node),
surv AS (
  SELECT ds.doc_id, ds.text
  FROM documents ds LEFT JOIN cc ON ds.doc_id = cc.node
  WHERE ds.doc_id = coalesce(cc.comp, ds.doc_id)),
sg AS (SELECT doc_id, {_lead_chain("t", 8, win="win_sg")} AS s8,
           lead(t, 7) OVER win_sg AS l7
       FROM (SELECT doc_id, generate_subscripts(w, 1) i, unnest(w) t
             FROM (SELECT doc_id, string_split(trim(text), ' ') w
                   FROM surv))
       WINDOW win_sg AS (PARTITION BY doc_id ORDER BY i)),
s8h AS (SELECT DISTINCT doc_id, {_HASH60_SQL.format(v="s8")} AS h
        FROM sg WHERE l7 IS NOT NULL),
bg AS (SELECT doc_id, {_lead_chain("t", 8, win="win_bg")} AS s8,
           lead(t, 7) OVER win_bg AS l7
       FROM (SELECT doc_id, generate_subscripts(w, 1) i, unnest(w) t
             FROM (SELECT doc_id, string_split(trim(text), ' ') w
                   FROM documents WHERE doc_id % 97 = 0))
       WINDOW win_bg AS (PARTITION BY doc_id ORDER BY i)),
b8h AS (SELECT DISTINCT {_HASH60_SQL.format(v="s8")} AS h
        FROM bg WHERE l7 IS NOT NULL),
contam AS (SELECT DISTINCT s.doc_id FROM s8h s JOIN b8h b ON s.h = b.h),
clean AS (SELECT * FROM surv
          WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
toks2 AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                            x -> length(x) > 0)) AS tok2
  FROM clean),
wa2 AS (SELECT doc_id, count(*) AS n_words,
               count(DISTINCT tok2) AS n_distinct
        FROM toks2 GROUP BY 1),
bt AS (SELECT doc_id, {_lead_chain("t", 2, win="win_bt")} AS s2,
           lead(t, 1) OVER win_bt AS l1
       FROM (SELECT doc_id, generate_subscripts(w, 1) i, unnest(w) t
             FROM (SELECT doc_id, string_split(trim(text), ' ') w
                   FROM clean))
       WINDOW win_bt AS (PARTITION BY doc_id ORDER BY i)),
bc2 AS (SELECT doc_id, s2, count(*) AS c FROM bt WHERE l1 IS NOT NULL
        GROUP BY 1, 2),
tb2 AS (SELECT doc_id, max(c) AS top_bigram_n FROM bc2 GROUP BY 1),
freq2 AS (SELECT tok2, count(*) AS c FROM toks2 GROUP BY 1),
tot2 AS (SELECT sum(c) AS n_total FROM freq2),
scored2 AS (
  SELECT t.doc_id, round(log10(f.c * 1.0 / (SELECT n_total FROM tot2)), 6)
           AS lp
  FROM toks2 t JOIN freq2 f ON t.tok2 = f.tok2),
pd2 AS (SELECT doc_id, round(avg(lp), 4) AS mean_logprob
        FROM scored2 GROUP BY 1),
stats AS (
  SELECT wa2.doc_id, wa2.n_words,
         round(1.0 - (wa2.n_distinct * 1.0 / wa2.n_words), 6)
           AS dup_word_frac,
         CASE WHEN tb2.top_bigram_n IS NULL THEN 0.0
              ELSE round(tb2.top_bigram_n * 1.0 / (wa2.n_words - 1), 6)
         END AS top_bigram_frac,
         pd2.mean_logprob
  FROM wa2 LEFT JOIN tb2 ON wa2.doc_id = tb2.doc_id
           JOIN pd2 ON wa2.doc_id = pd2.doc_id),
gated AS (
  SELECT * FROM stats
  WHERE n_words >= 20 AND dup_word_frac <= 0.6
    AND top_bigram_frac <= 0.1 AND mean_logprob IS NOT NULL),
band AS (
  SELECT round(quantile_cont(mean_logprob, 0.05), 6) AS lo,
         round(quantile_cont(mean_logprob, 0.95), 6) AS hi
  FROM gated)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, dup_word_frac,
       top_bigram_frac, mean_logprob,
       CASE WHEN {_HASH60_SQL.format(v="CAST(doc_id AS VARCHAR) || ':split'")} % 10000 < 9000 THEN 'train'
            WHEN {_HASH60_SQL.format(v="CAST(doc_id AS VARCHAR) || ':split'")} % 10000 < 9500 THEN 'val'
            ELSE 'test' END AS split
FROM gated, band
WHERE mean_logprob >= lo AND mean_logprob <= hi"""


def q_metrics_multiclass(spark, sf_dir):
    """M4 in long format: (label, gt, pred, n) — the scalable confusion
    matrix (summing long rows ≡ the reference's element-wise list-of-list
    sum, webapp/labelannotation/routes.py:289-308)."""
    from llmaix_spark.evaluation import multiclass_confusion

    o = _t(spark, sf_dir, "orders")
    pred = (
        F.when(F.col("o_totalprice") > 300000, "1-URGENT")
        .when(F.col("o_totalprice") > 200000, "2-HIGH")
        .when(F.col("o_totalprice") > 120000, "3-MEDIUM")
        .when(F.col("o_totalprice") > 60000, "4-NOT SPECIFIED")
        .otherwise("5-LOW")
    )
    j = o.select(
        F.lit("priority").alias("label"),
        F.col("o_orderpriority").alias("gt_v"),
        pred.alias("pred_v"),
    )
    return multiclass_confusion(j, "gt_v", "pred_v")


SQL_METRICS_MULTICLASS = """
SELECT 'priority' AS label, o_orderpriority AS gt,
       CASE WHEN o_totalprice > 300000 THEN '1-URGENT'
            WHEN o_totalprice > 200000 THEN '2-HIGH'
            WHEN o_totalprice > 120000 THEN '3-MEDIUM'
            WHEN o_totalprice > 60000 THEN '4-NOT SPECIFIED'
            ELSE '5-LOW' END AS pred,
       CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY 1, 2, 3"""


def q_invariant_per_turn(spark, sf_dir):
    """North-rule invariant as a query: chunk → reassemble → re-chunk
    must reproduce every turn exactly. Returns one row with the
    violation count (must be 0)."""
    from llmaix_spark.operators.assembly import per_turn_equality_violations

    t = _turns(spark, sf_dir)
    n = per_turn_equality_violations(t).count()
    return spark.createDataFrame([(n,)], "violations bigint")


SQL_INVARIANT_PER_TURN = f"""
WITH {_TURNS_SQL},
back AS (
  SELECT conv_id,
         CAST(generate_subscripts(string_split(conv_text, ' '), 1) - 1 AS INTEGER) AS wi,
         unnest(string_split(conv_text, ' ')) AS w
  FROM (SELECT conv_id, string_agg(text, ' ' ORDER BY turn_idx) AS conv_text
        FROM turns GROUP BY conv_id)),
rechunk AS (
  SELECT conv_id, CAST(wi // 8 AS INTEGER) AS turn_idx,
         string_agg(w, ' ' ORDER BY wi) AS text
  FROM back GROUP BY 1, 2)
SELECT CAST(count(*) AS BIGINT) AS violations
FROM turns t FULL OUTER JOIN rechunk r USING (conv_id, turn_idx)
WHERE t.text IS DISTINCT FROM r.text"""


def _norm_sql(v: str) -> str:
    """SQL twin of functions.text.norm_surface_expr: trim → umlaut fold →
    lower → whitespace squeeze (keeps the oracle honest if the corpus
    ever grows umlauts or multi-spaces — see tests/test_oracle_parity)."""
    folded = f"trim({v})"
    for uml, rep in (
        ("ä", "ae"), ("ö", "oe"), ("ü", "ue"),
        ("Ä", "Ae"), ("Ö", "Oe"), ("Ü", "Ue"), ("ß", "ss"),
    ):
        folded = f"replace({folded}, '{uml}', '{rep}')"
    return rf"regexp_replace(lower({folded}), '\s+', ' ', 'g')"


def _kg_canonical_body() -> str:
    """Shared SQL twin of the ENTIRE linking+canonicalization path:
    mention normalization → char-3-gram MinHash (16 fns) → banded LSH
    (b=8, r=2, length gate) → normalized-Levenshtein ≥ 90 verify →
    connected components (recursive CTE) → min-norm canonical.

    Identical algorithm on both engines (same hash constants, same bands,
    same threshold) — so the approximate LSH blocking is compared
    exactly, not statistically. The Spark side's bucket-size cap (5000)
    is omitted here: on this corpus no bucket comes near it.
    """
    h = f"({_HASH60_SQL.format(v='shingle')} % {_P})"
    mins = ",\n         ".join(
        f"min(({a} * {h} + {b}) % {_P}) AS h{i}"
        for i, (a, b) in enumerate(_MINHASH_AB)
    )
    bands = ", ".join(
        f"CAST(h{b * 2} AS VARCHAR) || ':' || CAST(h{b * 2 + 1} AS VARCHAR)"
        for b in range(8)
    )
    return f"""
WITH RECURSIVE
d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
tok AS (SELECT doc_id, generate_subscripts(w, 1) i, unnest(w) t FROM d),
tri AS (
  SELECT doc_id, lag(t) OVER win AS subj, t AS pred, lead(t) OVER win AS obj
  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
triples AS (
  SELECT CAST(doc_id AS VARCHAR) AS conv_id, subj, pred, obj FROM tri
  WHERE pred IN ({_PREDS_IN}) AND subj IS NOT NULL AND obj IS NOT NULL
    AND subj NOT IN ({_PREDS_IN}) AND obj NOT IN ({_PREDS_IN})
  GROUP BY 1, 2, 3, 4),
mentions AS (
  SELECT DISTINCT {_norm_sql('s')} AS norm FROM (
    SELECT subj AS s FROM triples UNION ALL SELECT obj FROM triples)
  WHERE length(s) > 0),
nums AS (SELECT unnest(range(1, 100)) AS i),
sh AS (
  SELECT norm, substring(norm, i, 3) AS shingle
  FROM mentions JOIN nums ON i <= length(norm) - 2
  UNION ALL
  SELECT norm, norm FROM mentions WHERE length(norm) < 3),
sig AS (SELECT norm, {mins} FROM sh GROUP BY norm),
banded AS (
  SELECT norm, length(norm) AS len,
         generate_subscripts(bv, 1) AS band_idx, unnest(bv) AS band_val
  FROM (SELECT norm, [{bands}] AS bv FROM sig)),
cand AS (
  SELECT DISTINCT a.norm AS na, b.norm AS nb
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.norm < b.norm
   AND abs(a.len - b.len) <= 0.1 * greatest(a.len, b.len)),
e AS (
  SELECT na, nb FROM cand
  WHERE 100.0 * (1.0 - levenshtein(na, nb) * 1.0
                 / greatest(length(na), length(nb), 1)) >= 90.0),
sym AS (SELECT na AS a, nb AS b FROM e UNION SELECT nb, na FROM e),
reach(node, comp) AS (
  SELECT a, a FROM sym
  UNION
  SELECT s.b, r.comp FROM reach r JOIN sym s ON s.a = r.node),
cc AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node),
canon AS (
  SELECT m.norm, coalesce(cc.comp, m.norm) AS canonical
  FROM mentions m LEFT JOIN cc ON m.norm = cc.node)"""


SQL_KG_CANONICAL_TRIPLES = (
    _kg_canonical_body()
    + f"""
SELECT DISTINCT cs.canonical AS subj, t.pred, co.canonical AS obj
FROM triples t
JOIN canon cs ON {_norm_sql('t.subj')} = cs.norm
JOIN canon co ON {_norm_sql('t.obj')} = co.norm"""
)

# Full value oracle for the end-to-end pipeline output (one edge per
# distinct (conv, subj, pred, obj) extraction; entity_id = content hash of
# the canonical name — Spark side: pipeline.py `_edges`,
# canonicalize.canonical_assignments).
SQL_KG_PIPELINE_EDGES = (
    _kg_canonical_body()
    + f"""
SELECT substring(sha256(cs.canonical), 1, 16) AS subj_id,
       t.pred,
       substring(sha256(co.canonical), 1, 16) AS obj_id,
       t.conv_id,
       t.subj || ' ' || t.pred || ' ' || t.obj AS evidence,
       cs.canonical AS subj_canonical,
       co.canonical AS obj_canonical
FROM triples t
JOIN canon cs ON {_norm_sql('t.subj')} = cs.norm
JOIN canon co ON {_norm_sql('t.obj')} = co.norm"""
)


def _pagerank_iter_sql(i: int) -> str:
    """One unrolled PageRank iteration (contribution sum + dangling
    mass + damped update), mirroring operators/graph.py::pagerank —
    ranks rounded 10dp per iteration in BOTH engines so the
    order-dependent double sums can never drift past the grid."""
    p = f"pr_r{i - 1}"
    return f""",
pr_c{i} AS MATERIALIZED (
  SELECT e.dst, sum(r.rank / o.od) AS contrib
  FROM pr_edges e
  JOIN {p} r ON e.src = r.node
  JOIN pr_outdeg o ON e.src = o.src
  GROUP BY 1),
pr_d{i} AS MATERIALIZED (
  SELECT COALESCE(sum(r.rank), 0.0::DOUBLE) AS dm
  FROM {p} r LEFT JOIN pr_outdeg o ON r.node = o.src
  WHERE o.src IS NULL),
pr_r{i} AS MATERIALIZED (
  SELECT n.node,
         round((1.0::DOUBLE - 0.85::DOUBLE) / (SELECT n FROM pr_n)
               + 0.85::DOUBLE * (COALESCE(c.contrib, 0.0::DOUBLE)
                                 + (SELECT dm FROM pr_d{i})
                                   / (SELECT n FROM pr_n)),
               10) AS rank
  FROM pr_nodes n LEFT JOIN pr_c{i} c ON n.node = c.dst)"""


# Fixed-iteration PageRank over the pipeline's edge graph (3 iterations,
# damping 0.85, dangling mass redistributed uniformly). Built on the same
# canonicalization body as SQL_KG_PIPELINE_EDGES; the Spark twin is
# operators/graph.py::pagerank over q_kg_pipeline_edges.
SQL_KG_PAGERANK = (
    _kg_canonical_body()
    + f""",
pr_edges AS MATERIALIZED (
  SELECT DISTINCT substring(sha256(cs.canonical), 1, 16) AS src,
                  substring(sha256(co.canonical), 1, 16) AS dst
  FROM triples t
  JOIN canon cs ON {_norm_sql('t.subj')} = cs.norm
  JOIN canon co ON {_norm_sql('t.obj')} = co.norm),
pr_nodes AS MATERIALIZED (
  -- explicit DISTINCT, not bare UNION: under this statement's WITH
  -- RECURSIVE prefix DuckDB 1.0 compiles a materialized CTE's UNION
  -- as UNION ALL (observed: 1158 rows / 25 distinct), silently
  -- duplicating every node
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM pr_edges
    UNION ALL
    SELECT dst FROM pr_edges)),
pr_n AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM pr_nodes),
pr_outdeg AS MATERIALIZED (
  SELECT src, CAST(count(*) AS DOUBLE) AS od FROM pr_edges GROUP BY 1),
pr_r0 AS MATERIALIZED (
  SELECT node, 1.0::DOUBLE / (SELECT n FROM pr_n) AS rank
  FROM pr_nodes)"""
    + "".join(_pagerank_iter_sql(i) for i in (1, 2, 3))
    + """
SELECT node AS entity_id, round(rank, 6) AS pagerank FROM pr_r3"""
)


# ---------------------------------------------------------------------------
# redaction metrics (M1/A3) + annotation join (JN1)


def q_redaction_metrics(spark, sf_dir):
    """Char-level redaction confusion (M1) accumulated per corpus (A3):
    gt masks the token 'spark', auto masks 'spark' and 'window' — so the
    extra 'window' chars are exactly the false positives. The pandas-UDF
    kernel's counts are checked against a closed-form SQL oracle."""
    from llmaix_spark.operators.redaction import (
        accumulate_redaction_metrics,
        score_redactions,
    )

    d = _t(spark, sf_dir, "documents")
    gt = F.replace(F.col("text"), F.lit("spark"), F.lit("■■■■■"))
    auto = F.replace(gt, F.lit("window"), F.lit("■■■■■■"))
    rows = d.select(
        F.lit("pii").alias("label"),
        gt.alias("gt_text"),
        auto.alias("auto_text"),
        F.col("text").alias("orig_text"),
    )
    scored = score_redactions(rows)
    acc = accumulate_redaction_metrics(scored, "label")
    return acc.select(
        "label",
        *[F.col(c).cast("bigint").alias(c) for c in ("tp", "fp", "tn", "fn")],
        "micro_precision",
        "micro_recall",
        "micro_f1_score",
    )


SQL_REDACTION_METRICS = r"""
WITH per AS (
  SELECT (length(text) - length(replace(text, 'spark', ''))) / 5 AS n_spark,
         (length(text) - length(replace(text, 'window', ''))) / 6 AS n_window,
         length(regexp_replace(text, '[ ,.!?:;\-()"''
]', '', 'g')) AS nonspecial
  FROM documents),
c AS (
  SELECT CAST(sum(5 * n_spark) AS BIGINT) tp,
         CAST(sum(6 * n_window) AS BIGINT) fp,
         CAST(sum(nonspecial - 5 * n_spark - 6 * n_window) AS BIGINT) tn,
         CAST(0 AS BIGINT) fn
  FROM per)
SELECT 'pii' AS label, tp, fp, tn, fn,
       round(tp * 1.0 / (tp + fp), 4) AS micro_precision,
       round(CASE WHEN tp + fn > 0 THEN tp * 1.0 / (tp + fn) ELSE 0 END, 4) AS micro_recall,
       round(2.0 * (tp * 1.0 / (tp + fp)) * (tp * 1.0 / (tp + fn))
             / ((tp * 1.0 / (tp + fp)) + (tp * 1.0 / (tp + fn))), 4) AS micro_f1_score
FROM c"""


def q_file_manifest_join(spark, sf_dir):
    """JN3: records joined to a file manifest by id with a found-flag
    (manifest derived from even doc_ids; duplicate manifest rows injected
    to exercise the collapse)."""
    from llmaix_spark.operators.labels import join_file_manifest

    d = _t(spark, sf_dir, "documents")
    records = d.select(F.col("doc_id").cast("string").alias("id"))
    files = d.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").cast("string").alias("id"),
        F.concat(F.lit("pdfs/"), F.col("doc_id").cast("string"), F.lit(".pdf")).alias("path"),
    )
    manifest = files.unionByName(files)  # duplicates must collapse
    return join_file_manifest(records, manifest)


SQL_FILE_MANIFEST_JOIN = """
WITH r AS (SELECT CAST(doc_id AS VARCHAR) AS id FROM documents),
m AS (SELECT CAST(doc_id AS VARCHAR) AS id,
             'pdfs/' || CAST(doc_id AS VARCHAR) || '.pdf' AS path
      FROM documents WHERE doc_id % 2 = 0)
SELECT r.id, m.path, (m.id IS NOT NULL) AS file_found
FROM r LEFT JOIN m ON r.id = m.id"""


def q_redaction_classwise(spark, sf_dir):
    """F5 classwise → A3 per-label scores, end-to-end: span tables are
    derived from the first occurrence of a per-label token ('spark' /
    'window'), ground truth masks exactly that span via
    classwise_dollartext, the automatic variant additionally masks the
    first char (one FP per doc unless the token IS the prefix), and the
    per-label confusion is accumulated. The SQL twin computes the same
    counts in closed form (corpus chars are [a-z ] — space is the only
    'special' char)."""
    from llmaix_spark.operators.redaction import (
        accumulate_redaction_metrics,
        classwise_dollartext,
        score_redactions,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    span_parts = []
    for tok in ("spark", "window"):
        pos = F.instr("text", tok)
        span_parts.append(
            d.filter(pos > 0).select(
                "doc_id",
                F.lit(tok).alias("label"),
                (pos - 1).alias("begin"),
                (pos - 1 + len(tok)).alias("end"),
            )
        )
    gt_spans = span_parts[0].unionByName(span_parts[1])
    auto_spans = gt_spans.unionByName(
        gt_spans.select(
            "doc_id", "label", F.lit(0).alias("begin"), F.lit(1).alias("end")
        )
    )
    gt = classwise_dollartext(d, gt_spans).withColumnRenamed(
        "dollartext", "gt_text"
    )
    auto = classwise_dollartext(d, auto_spans).withColumnRenamed(
        "dollartext", "auto_text"
    )
    rows = (
        gt.join(auto, ["doc_id", "label"])
        .join(d, "doc_id")
        .select("label", "gt_text", "auto_text", F.col("text").alias("orig_text"))
    )
    acc = accumulate_redaction_metrics(score_redactions(rows), "label")
    return acc.select(
        "label",
        *[F.col(c).cast("bigint").alias(c) for c in ("tp", "fp", "tn", "fn")],
        "micro_precision",
        "micro_recall",
        "micro_f1_score",
    )


SQL_REDACTION_CLASSWISE = """
WITH hits AS (
  SELECT doc_id, 'spark' AS label, 5 AS m, strpos(text, 'spark') AS p, text
  FROM documents WHERE strpos(text, 'spark') > 0
  UNION ALL
  SELECT doc_id, 'window', 6, strpos(text, 'window'), text
  FROM documents WHERE strpos(text, 'window') > 0),
per AS (
  SELECT label, m AS tp,
         CASE WHEN p = 1 THEN 0 ELSE 1 END AS fp,
         length(replace(text, ' ', '')) - m
           - CASE WHEN p = 1 THEN 0 ELSE 1 END AS tn
  FROM hits),
c AS (
  SELECT label,
         CAST(sum(tp) AS BIGINT) tp, CAST(sum(fp) AS BIGINT) fp,
         CAST(sum(tn) AS BIGINT) tn, CAST(0 AS BIGINT) fn
  FROM per GROUP BY label)
SELECT label, tp, fp, tn, fn,
       round(tp * 1.0 / (tp + fp), 4) AS micro_precision,
       round(tp * 1.0 / (tp + fn), 4) AS micro_recall,
       round(2.0 * (tp * 1.0 / (tp + fp)) * (tp * 1.0 / (tp + fn))
             / ((tp * 1.0 / (tp + fp)) + (tp * 1.0 / (tp + fn))), 4)
         AS micro_f1_score
FROM c"""


def q_labels_join(spark, sf_dir):
    """JN1: LLM-output ids joined to an annotation table on
    report_id_short, with the existence indicator."""
    from llmaix_spark.operators.labels import join_annotations

    d = _t(spark, sf_dir, "documents")
    llm = d.select(
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit(".pdf$"),
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
            F.lit("_0"),
        ).alias("id")
    )
    ann = d.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").cast("string").alias("id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("yes")).otherwise(F.lit("no")).alias("lbl"),
    )
    joined, _un = join_annotations(llm, ann)
    return joined.select("report_id_short", "matched", "lbl")


SQL_LABELS_JOIN = """
WITH llm AS (
  SELECT CAST(doc_id AS VARCHAR) AS report_id_short FROM documents),
ann AS (
  SELECT CAST(doc_id AS VARCHAR) AS id,
         CASE WHEN doc_id % 2 = 0 THEN 'yes' ELSE 'no' END AS lbl
  FROM documents WHERE doc_id % 3 = 0)
SELECT report_id_short, (ann.id IS NOT NULL) AS matched, lbl
FROM llm LEFT JOIN ann ON llm.report_id_short = ann.id"""


def _label_fixture(spark, sf_dir):
    """Derived (llm, annotation) tables exercising every inference rule:
    a boolean pair, a true multiclass (equal sets), the judge-flagged
    single-'yes' column (boolean under the old subset rule, stringmatch
    under the reference's), and a high-cardinality free-text column that
    must cross the driver-transfer gate."""
    d = _t(spark, sf_dir, "documents")
    ann = d.select(
        F.when(d.doc_id % 2 == 0, "True").otherwise("False").alias("flag"),
        F.concat(F.lit("c"), (d.doc_id % 5).cast("string")).alias("color"),
        F.lit("yes").alias("only_yes"),
        F.col("text").alias("note"),
    )
    llm = d.select(
        F.when(d.doc_id % 3 == 0, "True").otherwise("False").alias("flag"),
        F.concat(F.lit("c"), ((d.doc_id * 3) % 5).cast("string")).alias("color"),
        F.when(d.doc_id % 7 == 0, "no").otherwise("yes").alias("only_yes"),
        F.upper("text").alias("note"),
    )
    return llm, ann


def q_label_type_inference(spark, sf_dir):
    """A6: reference-faithful label-type inference
    (labelannotation/routes.py:679-693) over a derived llm/annotation
    pair — boolean iff the annotation set is a 2-value T/F pair,
    multiclass iff set(llm)==set(annotation), ignore for absent labels,
    else stringmatch. The distributed value-set collection is bounded at
    max_classes=64, so the free-text column resolves without shipping
    its values to the driver (label_classes='')."""
    from llmaix_spark.operators.labels import infer_label_types

    llm, ann = _label_fixture(spark, sf_dir)
    spec = infer_label_types(
        llm, ann, ["flag", "color", "only_yes", "note", "missing"],
        max_classes=64,
    )
    rows = [
        (k, v["label_type"], ",".join(v["label_classes"]))
        for k, v in sorted(spec.items())
    ]
    return spark.createDataFrame(
        rows, "label string, label_type string, label_classes string"
    )


_LABEL_FIXTURE_SQL = """
ann AS (SELECT CASE WHEN doc_id % 2 = 0 THEN 'True' ELSE 'False' END AS flag,
               'c' || CAST(doc_id % 5 AS VARCHAR) AS color,
               'yes' AS only_yes, text AS note FROM documents),
llm AS (SELECT CASE WHEN doc_id % 3 = 0 THEN 'True' ELSE 'False' END AS flag,
               'c' || CAST((doc_id * 3) % 5 AS VARCHAR) AS color,
               CASE WHEN doc_id % 7 = 0 THEN 'no' ELSE 'yes' END AS only_yes,
               upper(text) AS note FROM documents)
"""


def _label_infer_sql(label: str) -> str:
    """One UNION-ALL arm replicating the inference rule for one label.
    The driver gate (max_classes=64) is mirrored with exact distinct
    counts — exactness holds on the Spark side too (the HLL sketch only
    pre-filters at a 1.5x margin; the over/under decision is a sliced
    exact set)."""
    return f"""
SELECT '{label}' AS label,
  CASE
    WHEN s.n_ann <= 64 AND (s.ann_set = ['False','True'] OR s.ann_set = ['false','true']
         OR s.ann_set = ['0','1'] OR s.ann_set = ['no','yes']) THEN 'boolean'
    WHEN s.n_ann <= 64 AND s.n_llm <= 64 AND s.n_llm_null = 0
         AND s.ann_set = s.llm_set THEN 'multiclass'
    ELSE 'stringmatch'
  END AS label_type,
  CASE WHEN s.n_ann <= 64 THEN array_to_string(s.ann_set, ',') ELSE '' END
    AS label_classes
FROM (SELECT
  (SELECT count(DISTINCT {label}) FROM ann) AS n_ann,
  (SELECT count(DISTINCT {label}) FROM llm) AS n_llm,
  (SELECT count(*) FROM llm WHERE {label} IS NULL) AS n_llm_null,
  (SELECT list_sort(list(DISTINCT {label})) FROM ann WHERE {label} IS NOT NULL) AS ann_set,
  (SELECT list_sort(list(DISTINCT {label})) FROM llm WHERE {label} IS NOT NULL) AS llm_set
) s"""


SQL_LABEL_TYPE_INFERENCE = (
    "WITH " + _LABEL_FIXTURE_SQL + "\n"
    + "\nUNION ALL\n".join(
        _label_infer_sql(c) for c in ["flag", "color", "only_yes", "note"]
    )
    + "\nUNION ALL\nSELECT 'missing' AS label, 'ignore' AS label_type, '' AS label_classes"
)


def q_label_check(spark, sf_dir):
    """check_labels (labelannotation/routes.py:699-736) as a driver
    query: the sanity pass over the same derived llm/annotation pair,
    with a selected-classes mapping chosen to trigger exactly the
    violations the reference would flash — color's selected classes
    disagree with the annotation set, and only_yes marked multiclass
    while its llm/annotation sets differ."""
    from llmaix_spark.operators.labels import check_labels

    llm, ann = _label_fixture(spark, sf_dir)
    mapping = {
        "flag": {"label_type": "boolean", "label_classes": ["False", "True"]},
        "color": {"label_type": "multiclass", "label_classes": ["c0", "c1"]},
        "only_yes": {"label_type": "multiclass", "label_classes": ["yes"]},
        "note": {"label_type": "stringmatch", "label_classes": []},
    }
    issues = check_labels(llm, ann, mapping, max_classes=64)
    rows = [
        # str(): boolean-invalid details may carry a None (a NULL llm
        # value set entry) — join must report it, not TypeError
        (i["label"], i["issue"], ",".join(str(v) for v in (i["detail"] or [])))
        for i in sorted(issues, key=lambda x: (x["label"], x["issue"]))
    ]
    return spark.createDataFrame(
        rows or [("", "", "")], "label string, issue string, detail string"
    ).filter(F.col("label") != "")


SQL_LABEL_CHECK = (
    "WITH " + _LABEL_FIXTURE_SQL + """
,sets AS (SELECT
  (SELECT list_sort(list(DISTINCT color)) FROM ann) AS color_ann,
  (SELECT list_sort(list(DISTINCT color)) FROM llm) AS color_llm,
  (SELECT list_sort(list(DISTINCT only_yes)) FROM ann) AS oy_ann,
  (SELECT list_sort(list(DISTINCT only_yes)) FROM llm) AS oy_llm,
  (SELECT list_sort(list(DISTINCT flag)) FROM ann) AS flag_ann,
  (SELECT list_sort(list(DISTINCT flag)) FROM llm) AS flag_llm,
  (SELECT count(DISTINCT note) FROM llm) AS note_llm_n,
  (SELECT count(DISTINCT note) FROM ann) AS note_ann_n)
SELECT label, issue, detail FROM (
  SELECT 'color' AS label, 'classes_differ_llm_vs_annotation' AS issue,
         '' AS detail FROM sets WHERE color_llm != color_ann
  UNION ALL
  SELECT 'color', 'classes_differ_annotation_vs_selected', ''
  FROM sets WHERE color_ann != ['c0', 'c1']
  UNION ALL
  SELECT 'only_yes', 'classes_differ_llm_vs_annotation', ''
  FROM sets WHERE oy_llm != oy_ann
  UNION ALL
  SELECT 'only_yes', 'classes_differ_annotation_vs_selected', ''
  FROM sets WHERE oy_ann != ['yes']
  UNION ALL
  SELECT 'flag', 'too_many_values', ''
  FROM sets WHERE len(flag_llm) > 2 OR len(flag_ann) > 2
  UNION ALL
  SELECT 'flag', 'invalid_llm_values',
         array_to_string(list_sort(list_filter(flag_llm,
           x -> x NOT IN ('True','False','true','false','1','0','yes','no'))), ',')
  FROM sets WHERE len(list_filter(flag_llm,
    x -> x NOT IN ('True','False','true','false','1','0','yes','no'))) > 0
  UNION ALL
  SELECT 'flag', 'invalid_annotation_values',
         array_to_string(list_sort(list_filter(flag_ann,
           x -> x NOT IN ('True','False','true','false','1','0','yes','no'))), ',')
  FROM sets WHERE len(list_filter(flag_ann,
    x -> x NOT IN ('True','False','true','false','1','0','yes','no'))) > 0
  UNION ALL
  SELECT 'note', 'llm_empty_values', ''
  FROM sets WHERE note_llm_n <= 64
    AND EXISTS (SELECT 1 FROM llm WHERE note = '')
  UNION ALL
  SELECT 'note', 'annotation_empty_values', ''
  FROM sets WHERE note_ann_n <= 64
    AND EXISTS (SELECT 1 FROM ann WHERE note = '')
)"""
)


def q_labels_reannotate(spark, sf_dir):
    """Annotation-correction merge (reference get_reannotated_df +
    update_record_labels_by_id, annotationhelper/routes.py:114-163):
    human corrections upserted over the LLM-output table by id × label
    with last-correction-wins, bracketed-cell [0] initialization,
    case-sensitive boolean coercion (warn-and-keep for unrecognized),
    and the reference's id double-strip. The fixture exercises every
    arm: flag cycles True/False/Ja/maybe (coerce/coerce/coerce/keep),
    status is a bracketed list on even ids, every %5 id gets TWO flag
    corrections (seq 1 'yes', seq 2 'Nein' — first-wins would flip the
    value to '1'), every %7 id a status correction. The oracle
    computes the expected cells directly from the same arithmetic."""
    from llmaix_spark.operators.labels import reannotate

    d = _t(spark, sf_dir, "documents")
    full_id = F.concat(
        F.col("doc_id").cast("string"),
        F.lit(".pdf$"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
        F.lit("_0"),
    )
    llm = d.select(
        full_id.alias("id"),
        F.col("text").alias("report"),
        F.lit("{}").alias("metadata"),
        F.element_at(
            F.array(F.lit("True"), F.lit("False"), F.lit("Ja"), F.lit("maybe")),
            (F.col("doc_id") % 4 + 1).cast("int"),
        ).alias("flag"),
        F.when(
            F.col("doc_id") % 2 == 0, F.lit("['good', 'x']")
        ).otherwise(F.lit("plain")).alias("status"),
    )
    cor_base = d.select(full_id.alias("record_id"), "doc_id")
    cor = (
        cor_base.filter(F.col("doc_id") % 5 == 0)
        .select("record_id", F.lit("flag").alias("label"),
                F.lit("yes").alias("value"), F.lit(1).alias("seq"))
        .unionByName(
            cor_base.filter(F.col("doc_id") % 5 == 0).select(
                "record_id", F.lit("flag").alias("label"),
                F.lit("Nein").alias("value"), F.lit(2).alias("seq"))
        )
        .unionByName(
            cor_base.filter(F.col("doc_id") % 7 == 0).select(
                "record_id", F.lit("status").alias("label"),
                F.lit("fixed").alias("value"), F.lit(1).alias("seq"))
        )
    )
    return reannotate(
        llm, cor,
        {"flag": "boolean", "status": "stringmatch"},
        seq_col="seq",
    )


SQL_LABELS_REANNOTATE = """
SELECT CAST(doc_id AS VARCHAR) AS id,
       text AS report,
       CASE
         WHEN doc_id % 5 = 0 THEN '0'                 -- last correction: Nein
         WHEN doc_id % 4 IN (0, 1, 2) THEN
           CASE WHEN doc_id % 4 = 1 THEN '0' ELSE '1' END  -- True/Ja→1, False→0
         ELSE 'maybe'                                 -- warn-and-keep
       END AS flag,
       CASE
         WHEN doc_id % 7 = 0 THEN 'fixed'
         WHEN doc_id % 2 = 0 THEN 'good'              -- literal_eval[0]
         ELSE 'plain'
       END AS status
FROM documents"""


def q_export_pivot(spark, sf_dir):
    """A7: report × label wide export pivot (reference
    generate_export_df, report_redaction/routes.py:683-753) over a
    derived per-report metric table — one row per (id, label), one
    pivot, no window."""
    from llmaix_spark.operators.labels import export_pivot

    d = _t(spark, sf_dir, "documents")
    per = d.select(
        F.col("doc_id").cast("string").alias("id"),
        F.explode(F.array(F.lit("name"), F.lit("date"))).alias("label"),
    )
    per = per.withColumn(
        "accuracy",
        F.round(
            (
                (F.col("id").cast("bigint") * 7
                 + F.when(F.col("label") == "name", 1).otherwise(2))
                % 100
            )
            / 100.0,
            2,
        ),
    )
    return export_pivot(per, metric_cols=("accuracy",))


SQL_EXPORT_PIVOT = """
WITH per AS (
  SELECT CAST(doc_id AS VARCHAR) AS id, label,
         round(((doc_id * 7 + CASE WHEN label = 'name' THEN 1 ELSE 2 END)
                % 100) / 100.0, 2) AS accuracy
  FROM documents, (SELECT unnest(['name', 'date']) AS label))
SELECT id,
       max(CASE WHEN label = 'name' THEN accuracy END) AS name,
       max(CASE WHEN label = 'date' THEN accuracy END) AS date
FROM per GROUP BY id"""


def q_leaderboard_mean(spark, sf_dir):
    """A8: leaderboard mean of the macro-score row (reference
    utils/leaderboard_conversion.py:117-129) — metric inputs rounded to
    6dp first so both engines average the identical doubles."""
    from llmaix_spark.functions.util import leaderboard_mean

    d = _t(spark, sf_dir, "documents")
    macro = d.agg(
        F.round(F.avg((F.col("doc_id") % 7).cast("double")), 6).alias("m_f1"),
        F.round(F.avg((F.col("doc_id") % 5).cast("double")), 6).alias("m_acc"),
        F.round(F.avg(F.length("text").cast("double") / 1000.0), 6).alias(
            "m_len"
        ),
    )
    return leaderboard_mean(macro, ["m_f1", "m_acc", "m_len"])


SQL_LEADERBOARD_MEAN = """
WITH macro AS (
  SELECT round(avg(CAST(doc_id % 7 AS DOUBLE)), 6) AS m_f1,
         round(avg(CAST(doc_id % 5 AS DOUBLE)), 6) AS m_acc,
         round(avg(CAST(len(text) AS DOUBLE) / 1000.0), 6) AS m_len
  FROM documents)
SELECT m_f1, m_acc, m_len,
       round((m_f1 + m_acc + m_len) / 3, 6) AS leaderboard_mean
FROM macro"""


def q_first_non_empty(spark, sf_dir):
    """P12: first non-empty-ish element of a list (reference
    extract_first_non_empty_string, labelannotation/routes.py:581-594
    with the next(...,'') default) — arm 1 is always empty-ish
    (''/NULL), arm 2 is '?' on every 4th id, 'fallback' closes. The
    exhausted-array arm is exercised: getItem(0) used to raise
    INVALID_ARRAY_INDEX under ANSI mode here (round-5 fix)."""
    from llmaix_spark.functions.text import first_non_empty_expr

    d = _t(spark, sf_dir, "documents")
    arr = F.array(
        F.when(d.doc_id % 3 == 0, F.lit("")).otherwise(
            F.lit(None).cast("string")
        ),
        F.when(d.doc_id % 4 == 0, F.lit("?")).otherwise(
            F.substring("text", 1, 3)
        ),
        F.lit("fallback"),
    )
    return d.select("doc_id", first_non_empty_expr(arr).alias("first_val"))


SQL_FIRST_NON_EMPTY = """
SELECT doc_id,
       CASE WHEN doc_id % 4 != 0 AND substr(text, 1, 3) IS NOT NULL
                 AND trim(substr(text, 1, 3)) NOT IN ('', '?')
            THEN substr(text, 1, 3) ELSE 'fallback' END AS first_val
FROM documents"""


def q_expect_exactly_one(spark, sf_dir):
    """JN2: keys violating the expect-exactly-1 contract (reference
    generate_report_dict raise, labelannotation/routes.py:500-507) —
    every 25th id is duplicated, so exactly those come back with n=2."""
    from llmaix_spark.operators.labels import expect_exactly_one

    d = _t(spark, sf_dir, "documents")
    ann = d.select(F.col("doc_id").cast("string").alias("id")).unionByName(
        d.filter(F.col("doc_id") % 25 == 0).select(
            F.col("doc_id").cast("string").alias("id")
        )
    )
    return expect_exactly_one(ann)


SQL_EXPECT_EXACTLY_ONE = """
WITH ann AS (
  SELECT CAST(doc_id AS VARCHAR) AS id FROM documents
  UNION ALL
  SELECT CAST(doc_id AS VARCHAR) FROM documents WHERE doc_id % 25 = 0)
SELECT id, CAST(count(*) AS BIGINT) AS n
FROM ann GROUP BY id HAVING count(*) != 1"""


def q_merge_metadata(spark, sf_dir):
    """J6: tolerant metadata merge (reference ast.literal_eval-with-
    fallback + dict assignment, llm_processing/routes.py:1019-1027) —
    the five arms: NULL, unparseable, plain stored map, a stored map
    already carrying the run key (run wins), empty map. The oracle
    states the expected JSON literally per arm (to_json emits stored
    keys first in insertion order, then the run keys — probed, and any
    drift fails the hash)."""
    from llmaix_spark.functions.util import merge_metadata_expr

    d = _t(spark, sf_dir, "documents")
    meta = (
        F.when(d.doc_id % 5 == 0, F.lit(None).cast("string"))
        .when(d.doc_id % 5 == 1, F.lit("not json"))
        .when(d.doc_id % 5 == 2, F.lit('{"a": "1"}'))
        .when(d.doc_id % 5 == 3, F.lit('{"run_id": "old", "b": "2"}'))
        .otherwise(F.lit("{}"))
    )
    return d.select(
        "doc_id",
        merge_metadata_expr(
            meta, {"run_id": "r5", "model": "stub"}
        ).alias("metadata"),
    )


SQL_MERGE_METADATA = """
SELECT doc_id,
       CASE doc_id % 5
         WHEN 2 THEN '{"a":"1","run_id":"r5","model":"stub"}'
         WHEN 3 THEN '{"b":"2","run_id":"r5","model":"stub"}'
         ELSE '{"run_id":"r5","model":"stub"}'
       END AS metadata
FROM documents"""


# ---------------------------------------------------------------------------
# rows-only queries (not SQL-expressible: iterative / UDF / approximate)


def q_anonymizer(spark, sf_dir):
    """Anonymizer mode (A1+A2+F4) over derived transcripts: per-turn PII
    surfaces injected into the lowercase word soup (even turns get one
    name, odd turns another), detected by the capitalized-entity regex,
    flattened order-preserving per conversation, masked with the conv's
    OWN list via the Arrow UDF.

    Value-oracled: the injected surfaces are the only capitalized runs in
    the corpus (documents are lowercase [a-z ] soup), so detection,
    flatten-dedup count and length-preserving case-insensitive masking
    are all exactly replicable in SQL. The general path (arbitrary PII,
    umlaut variants, isolation regression) stays pinned by
    tests/test_masking.py and test_anonymizer_redaction_labels.py."""
    from llmaix_spark.operators.anonymizer import anonymize_conversations

    t = _turns(spark, sf_dir).withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("turn_idx") % 2 == 0, F.lit(" Kpqz Vwrtx")
            ).otherwise(F.lit(" Mblgh Qdfjk")),
        ),
    )
    out = anonymize_conversations(t)
    return out.select(
        "conv_id",
        F.size("personal_info_list").cast("bigint").alias("n_pii"),
        "masked_report",
    )


SQL_ANONYMIZER = f"""
WITH {_TURNS_SQL},
inj AS (
  SELECT conv_id, turn_idx,
         text || CASE WHEN turn_idx % 2 = 0
                      THEN ' Kpqz Vwrtx' ELSE ' Mblgh Qdfjk' END AS text
  FROM turns),
conv AS (
  SELECT conv_id,
         string_agg(text, ' ' ORDER BY turn_idx) AS conv_text,
         CAST(CASE WHEN max(turn_idx) >= 1 THEN 2 ELSE 1 END AS BIGINT)
           AS n_pii
  FROM inj GROUP BY conv_id)
SELECT conv_id, n_pii,
       replace(replace(conv_text, 'Kpqz Vwrtx', '■■■■■■■■■■'),
               'Mblgh Qdfjk', '■■■■■■■■■■■') AS masked_report
FROM conv"""


_KG_SCRATCH: dict[str, str] = {}


def _kg_scratch_dir(tag: str) -> str:
    """One session-scoped scratch dir per sf_dir, removed at exit —
    repeated bench/preflight invocations reuse it instead of accreting
    kg_query_* temp dirs (write_stage overwrites stage subdirs)."""
    import atexit
    import os
    import shutil
    import tempfile

    d = _KG_SCRATCH.get(tag)
    if d is None or not os.path.isdir(d):
        d = tempfile.mkdtemp(prefix=f"kg_query_{tag}_")
        _KG_SCRATCH[tag] = d
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def q_kg_pipeline_edges(spark, sf_dir):
    """Full KG pipeline (extract→link→canonicalize) over transcripts
    derived from documents, with the token-rule extraction grammar
    (kg_triples). Value-checked end-to-end: SQL_KG_PIPELINE_EDGES twins
    the whole path (LSH blocking included) in DuckDB."""
    from llmaix_spark.pipeline import PipelineConfig, run_pipeline_from_triples

    def _triples():
        return q_kg_triples(spark, sf_dir).select(
            "conv_id",
            F.col("subj").alias("subj_surface"),
            "pred",
            F.col("obj").alias("obj_surface"),
        )

    # throughput mode: intermediates persisted, final graph materialized —
    # 2× faster than fully-lazy (the triples explode would re-execute for
    # every downstream consumer). The returned DF reads the materialized
    # parquet; the scratch dir is session-scoped and cleaned at exit.
    # resume=True: the edges/nodes/canonical_triples queries share one
    # scratch dir per (process, sf_dir) and the pipeline is deterministic,
    # so invocations after the first read the complete final-stage
    # manifests instead of recomputing the whole DAG (manifest-gated —
    # a partially-written stage is never reused).
    out_dir = _kg_scratch_dir(str(abs(hash(sf_dir)) % 10**8))
    res = run_pipeline_from_triples(
        spark,
        _triples,
        PipelineConfig(
            out_dir=out_dir, checkpoint_stages="final", resume=True
        ),
    )
    return res["edges"]


def q_kg_canonical_triples(spark, sf_dir):
    from llmaix_spark.pipeline import canonical_triples

    return canonical_triples(q_kg_pipeline_edges(spark, sf_dir))


def q_kg_pipeline_nodes(spark, sf_dir):
    """The pipeline's nodes table (S9's second output): one row per
    canonical entity with sorted alias set and total reference count.
    The alias array is projected to a '|'-joined string for the driver's
    hash compare; the oracle rebuilds the same aggregation on top of the
    shared canonicalization body."""
    from llmaix_spark.pipeline import PipelineConfig, run_pipeline_from_triples

    def _triples():
        return q_kg_triples(spark, sf_dir).select(
            "conv_id",
            F.col("subj").alias("subj_surface"),
            "pred",
            F.col("obj").alias("obj_surface"),
        )

    out_dir = _kg_scratch_dir(str(abs(hash(sf_dir)) % 10**8))
    res = run_pipeline_from_triples(
        spark,
        _triples,
        PipelineConfig(
            out_dir=out_dir, checkpoint_stages="final", resume=True
        ),
    )
    return res["nodes"].select(
        "entity_id",
        "canonical_name",
        F.concat_ws("|", "aliases").alias("aliases"),
        "kind",
        F.col("n_refs").cast("bigint").alias("n_refs"),
    )


def q_kg_triangles(spark, sf_dir):
    """Per-node triangle counts over the undirected surface-pair
    graph of the extracted triples (degree-oriented compact-forward
    enumeration; the oracle brute-forces the 3-way join — two
    independent algorithms must agree)."""
    from llmaix_spark.operators.graph import triangle_counts

    return triangle_counts(
        q_kg_triples(spark, sf_dir), src="subj", dst="obj"
    )


SQL_KG_TRIANGLES = f"""
WITH t AS ({SQL_KG_TRIPLES}),
e AS (SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
      FROM t WHERE subj <> obj),
nodes AS (SELECT a AS node FROM e UNION SELECT b FROM e),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri),
c AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
      FROM corners GROUP BY 1)
SELECT nodes.node,
       CAST(coalesce(c.n_triangles, 0) AS BIGINT) AS n_triangles
FROM nodes LEFT JOIN c USING (node)"""


def q_kg_two_hop(spark, sf_dir):
    """Distinct-neighborhood size within ≤2 undirected hops per
    surface node — hub-vs-leaf separation on the triple graph."""
    from llmaix_spark.operators.graph import two_hop_counts

    return two_hop_counts(
        q_kg_triples(spark, sf_dir), src="subj", dst="obj"
    )


SQL_KG_TWO_HOP = f"""
WITH t AS ({SQL_KG_TRIPLES}),
e AS (SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
      FROM t WHERE subj <> obj),
adj AS (
  SELECT a, b FROM e UNION SELECT b, a FROM e),
two AS (
  SELECT l.a AS a, r.b AS b
  FROM adj l JOIN adj r ON l.b = r.a WHERE l.a <> r.b),
reach AS (SELECT a, b FROM adj UNION SELECT a, b FROM two)
SELECT a AS node, CAST(count(*) AS BIGINT) AS n_within_2hops
FROM reach GROUP BY 1"""


def q_kg_link_prediction(spark, sf_dir):
    """Common-neighbor link prediction on the triple graph: every
    non-adjacent surface pair with a shared neighbor, scored by
    neighborhood Jaccard — the KG-completion ranking. Oracle
    brute-forces the wedge + exclusion independently."""
    from llmaix_spark.operators.graph import common_neighbor_scores

    return common_neighbor_scores(
        q_kg_triples(spark, sf_dir), src="subj", dst="obj"
    )


SQL_KG_LINK_PREDICTION = f"""
WITH t AS ({SQL_KG_TRIPLES}),
e AS (SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
      FROM t WHERE subj <> obj),
adj AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT a AS node, count(*) AS deg FROM adj GROUP BY 1),
wedge AS (
  SELECT l.a AS node_a, r.b AS node_b, count(*) AS n_common
  FROM adj l JOIN adj r ON l.b = r.a AND l.a < r.b
  GROUP BY 1, 2),
nonadj AS (
  SELECT w.* FROM wedge w
  WHERE NOT EXISTS (SELECT 1 FROM e
                    WHERE e.a = w.node_a AND e.b = w.node_b))
SELECT node_a, node_b, CAST(n_common AS BIGINT) AS n_common,
       round(n_common * 1.0 / (da.deg + db.deg - n_common), 6) AS score
FROM nonadj
JOIN deg da ON da.node = node_a
JOIN deg db ON db.node = node_b"""


def q_kg_cooccurrence(spark, sf_dir):
    """PMI over token co-occurrence in documents — the KG-linking
    "appears together more than chance" signal. Items are tokens of
    length ≥ 4 (a 24-item universe at sf0.01, dense enough that the
    marginals and pair counts are all non-trivial); df ≥ 5 and
    pair-count ≥ 2 gates mirror the operator defaults. Each log10
    rounds at 6dp BEFORE combining (bit-identical doubles across
    engines — the dsir_importance contract), output 4dp."""
    from llmaix_spark.operators.graph import cooccurrence_pmi

    docs = _t(spark, sf_dir, "documents")
    m = docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.explode(F.split("text", " ")).alias("surface"),
    ).filter(F.length("surface") >= 4)
    return cooccurrence_pmi(m, "conv_id", "surface", min_df=5, min_pair=2)


SQL_KG_COOCCURRENCE = """
WITH d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
tok AS (SELECT doc_id, unnest(w) t FROM d),
m AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) g, t AS item
      FROM tok WHERE length(t) >= 4),
dfc AS (SELECT item, count(*) AS df FROM m GROUP BY 1
        HAVING count(*) >= 5),
mf AS (SELECT g, m.item, df FROM m JOIN dfc USING (item)),
n AS (SELECT count(DISTINCT g) AS n_groups FROM m),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b,
         a.df AS df_a, b.df AS df_b, count(*) AS n_ab
  FROM mf a JOIN mf b ON a.g = b.g AND a.item < b.item
  GROUP BY 1, 2, 3, 4 HAVING count(*) >= 2)
SELECT item_a, item_b, CAST(n_ab AS BIGINT) AS n_ab,
       round(round(log10(CAST(n_ab AS DOUBLE)), 6)
             + round(log10(CAST(n_groups AS DOUBLE)), 6)
             - round(log10(CAST(df_a AS DOUBLE)), 6)
             - round(log10(CAST(df_b AS DOUBLE)), 6), 4) AS pmi
FROM pairs CROSS JOIN n"""


def q_chi2_crosstab(spark, sf_dir):
    """lang × source contingency table with chi-square decomposition:
    observed, expected = row·col/N, and the per-cell contribution
    (obs−exp)²/exp. The corpus pass is ONE map-side-combinable cell
    count; margins derive from the (tiny) cell table and join back
    broadcast — the classic two-level aggregation, no second scan."""
    d = _t(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs")
    )
    rows_m = cells.groupBy("lang").agg(F.sum("n_obs").alias("r_tot"))
    cols_m = cells.groupBy("source").agg(F.sum("n_obs").alias("c_tot"))
    n = cells.agg(F.sum("n_obs").alias("n_tot"))
    exp = (
        F.col("r_tot").cast("double") * F.col("c_tot") / F.col("n_tot")
    )
    return (
        cells.join(F.broadcast(rows_m), "lang")
        .join(F.broadcast(cols_m), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "source",
            "n_obs",
            F.round(exp, 6).alias("expected"),
            F.round(
                (F.col("n_obs") - exp) * (F.col("n_obs") - exp) / exp, 6
            ).alias("chi2_contrib"),
        )
    )


SQL_CHI2_CROSSTAB = """
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_obs
  FROM documents GROUP BY 1, 2),
r AS (SELECT lang, sum(n_obs) AS r_tot FROM cells GROUP BY 1),
c AS (SELECT source, sum(n_obs) AS c_tot FROM cells GROUP BY 1),
n AS (SELECT sum(n_obs) AS n_tot FROM cells)
SELECT cells.lang, cells.source, cells.n_obs,
       round(CAST(r_tot AS DOUBLE) * c_tot / n_tot, 6) AS expected,
       round((cells.n_obs - CAST(r_tot AS DOUBLE) * c_tot / n_tot)
             * (cells.n_obs - CAST(r_tot AS DOUBLE) * c_tot / n_tot)
             / (CAST(r_tot AS DOUBLE) * c_tot / n_tot), 6)
         AS chi2_contrib
FROM cells
JOIN r USING (lang) JOIN c USING (source) CROSS JOIN n"""


def q_kg_pagerank(spark, sf_dir):
    """Fixed-iteration PageRank (3 iters, d=0.85) over the pipeline's
    materialized edge graph — the first downstream KG-consumer query
    ("which entities matter"). Pure DataFrame joins/aggs with the
    edge list repartitioned by src once and reused every iteration;
    per-iteration state rounded 10dp in both engines, output 6dp.
    Value-oracled end-to-end: SQL_KG_PAGERANK unrolls the same three
    iterations on top of the shared canonicalization body."""
    from llmaix_spark.operators.graph import pagerank

    return pagerank(q_kg_pipeline_edges(spark, sf_dir))


SQL_KG_PIPELINE_NODES = (
    _kg_canonical_body()
    + f""",
surf AS (
  SELECT s AS surface, CAST(count(*) AS BIGINT) AS n_refs FROM (
    SELECT subj AS s FROM triples
    UNION ALL SELECT obj FROM triples)
  WHERE length(s) > 0 GROUP BY s),
smap AS (
  SELECT surface, n_refs, {_norm_sql('surface')} AS norm FROM surf),
assigned AS (
  SELECT m.surface, m.n_refs, c.canonical
  FROM smap m JOIN canon c ON m.norm = c.norm)
SELECT substring(sha256(canonical), 1, 16) AS entity_id,
       canonical AS canonical_name,
       array_to_string(list_sort(list(DISTINCT surface)), '|') AS aliases,
       'entity' AS kind,
       CAST(sum(n_refs) AS BIGINT) AS n_refs
FROM assigned GROUP BY canonical"""
)


def q_ann_ivf_topk(spark, sf_dir):
    """Approximate ANN (IVF probing). Recall < 1 vs brute force BY
    DESIGN, but the IVF path itself is fully deterministic (first-N
    centroids, rounded-cosine orderings, id tiebreaks) — so the oracle
    replicates the whole index: assignment, probing, in-bucket ranking.
    The approximation is thus value-checked, not just row-counted;
    recall vs the exact path is asserted in tests/test_dedup_similarity."""
    out = sim.ivf_topk(
        _t(spark, sf_dir, "embeddings"), [0, 1, 2, 3, 4], k=10,
        n_centroids=16, nprobe=4, round_dp=4,
    )
    return out.select(
        "query_id", "vec_id", F.col("rank").cast("bigint").alias("rank"), "cosine"
    )


def q_knn_join(spark, sf_dir):
    """Exact self-kNN join (every vector's top-5 cosine neighbors) —
    the kNN graph embedding-clustering pipelines consume. O(N²)
    EXACT-BY-SPEC ORACLE PATH like dedup's exact pair generators;
    knn_join_bucketed is the scale shape and the headline entry.

    Oracle contract (found here, applies to every cosine oracle): with
    FLOAT[] inputs DuckDB's list_cosine_similarity computes in float32
    while Spark's cosine_expr folds in double — at 250k pairs several
    land on opposite sides of a 4dp rounding boundary (0.3257 vs
    0.3258). The SQL casts ::DOUBLE[] so both engines round the same
    double. The IVF ASSIGNMENT oracle deliberately keeps float32
    (assign_buckets' rounded-assignment contract, r3).

    Oracle PRECONDITION (like the single-spaced-corpus one): no
    zero-magnitude vectors in the fixture — DuckDB's
    list_cosine_similarity returns -1.0 for a zero vector where the
    Spark scorers return NULL (ranked last), so a zero embedding would
    rank differently across engines. Verified absent in the testdata;
    a corpus with padding rows needs a norm>0 filter on both sides."""
    out = sim.knn_join_exact(_t(spark, sf_dir, "embeddings"), k=5)
    return out.select(
        "query_id", "vec_id", F.col("rank").cast("bigint").alias("rank"),
        "cosine",
    )


SQL_KNN_JOIN = """
WITH scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
         round(list_cosine_similarity(a.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]), 4)
           AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id),
ranked AS (
  SELECT query_id, vec_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id) AS BIGINT)
           AS rank
  FROM scored)
SELECT query_id, vec_id, rank, cosine FROM ranked WHERE rank <= 5"""


def q_knn_join_bucketed(spark, sf_dir):
    """Bucketed (IVF) self-kNN join with multi-probe — nprobe·Σ|bucket|²
    cost, shuffle keyed on the bucket id, probe selection a narrow
    per-row expression. The oracle replicates the whole index
    (deterministic first-16 centroids, rounded-cosine assignment AND
    probe ranking, in-bucket scoring), so the approximation is
    value-checked, not recall-sampled."""
    out = sim.knn_join_bucketed(
        _t(spark, sf_dir, "embeddings"), k=5, n_centroids=16, nprobe=4
    )
    return out.select(
        "query_id", "vec_id", F.col("rank").cast("bigint").alias("rank"),
        "cosine",
    )


def _ivf_assign_sql(cast: str = "") -> str:
    """The shared centroid/assignment CTE pair. `cast` is '::DOUBLE[]'
    for oracles whose Spark twin computes assignment in float64 (the
    multi-probe kNN join: assignment IS probes[0] from
    _nearest_probes_col, double arithmetic on both paths) and '' for the
    r3 float32 rounded-assignment contract (assign_buckets/ivf_topk)."""
    return f"""
cent AS (
  SELECT vec_id AS centroid_id, embedding AS centv
  FROM embeddings ORDER BY vec_id LIMIT 16),
assigned AS (
  SELECT vec_id, v, bucket FROM (
    SELECT e.vec_id, e.embedding AS v, c.centroid_id AS bucket,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(c.centv{cast},
                                                   e.embedding{cast}), 4)
                        DESC,
                      c.centroid_id) AS rnk
    FROM embeddings e CROSS JOIN cent c)
  WHERE rnk = 1)"""


def q_knn_join_bucketed_capped(spark, sf_dir):
    """The bucketed kNN join under a DELIBERATELY degenerate centroid
    set with the Arrow-group cap engaged (round-4 verdict item 1): the
    two centroids are the SAME vector (v0 duplicated), so every vector
    ties and the id tiebreak sends 100% of the corpus into bucket 0 —
    the worst-case skew that used to materialize the whole corpus as
    one applyInPandas group. max_bucket_members=256 hash-splits the
    degenerate bucket into multi-block groups of ≤256 rows per side
    (the hard per-side sizes are pinned at cap 64 in
    tests/test_skew.py; 256 here keeps the sf0.1 headline from being
    dominated by per-group Arrow overhead — ~256 blocks instead of
    ~4000 — while still exercising a 16×16-block split at sf0.1);
    because every vector probes the one populated bucket, the blocked
    result must equal the EXACT kNN graph — the oracle is the
    brute-force SQL, so the cap's top-k-of-block-top-ks identity is
    value-checked end to end and is cap-invariant by construction."""
    emb = _t(spark, sf_dir, "embeddings")
    v0 = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("centv")
    )
    cents = v0.select(F.lit(0).alias("centroid_id"), "centv").unionByName(
        v0.select(F.lit(1).alias("centroid_id"), "centv")
    )
    out = sim.knn_join_bucketed(
        emb, k=5, nprobe=2, centroids=cents, max_bucket_members=256
    )
    return out.select(
        "query_id", "vec_id", F.col("rank").cast("bigint").alias("rank"),
        "cosine",
    )


# every vector lands in the duplicated centroid's bucket and probes it,
# so the capped/blocked path must reproduce the exact kNN graph
SQL_KNN_JOIN_BUCKETED_CAPPED = SQL_KNN_JOIN


def q_decontaminate_semantic(spark, sf_dir):
    """Semantic (embedding-space) decontamination — the complement of
    the 8-gram `decontaminate`: every 20th vector is the held-out
    benchmark, the rest are the corpus; a corpus vector is contaminated
    when its max rounded cosine to ANY benchmark vector ≥ 0.33. The
    benchmark side broadcasts (caller-bounded), the corpus pass is one
    narrow zero-shuffle projection; the oracle replicates the rounded
    gate with the same ::DOUBLE[] cosine contract as the kNN oracles."""
    emb = _t(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % 20 == 0)
    docs = emb.filter(F.col("vec_id") % 20 != 0)
    return sim.semantic_decontaminate(docs, bench, threshold=0.33)


SQL_DECONTAMINATE_SEMANTIC = """
WITH bench AS (
  SELECT embedding FROM embeddings WHERE vec_id % 20 = 0),
scored AS (
  SELECT d.vec_id,
         max(round(list_cosine_similarity(d.embedding::DOUBLE[],
                                          b.embedding::DOUBLE[]), 6))
           AS max_cos
  FROM embeddings d CROSS JOIN bench b
  WHERE d.vec_id % 20 != 0
  GROUP BY d.vec_id)
SELECT vec_id, max_cos, (max_cos >= 0.33) AS contaminated FROM scored"""


_IVF_ASSIGN_SQL = _ivf_assign_sql()

# probes + assignment both ::DOUBLE[]: Spark's _nearest_probes_col
# computes EVERY centroid cosine in float64 (JVM double fold on the
# literal path, numpy float64 on the broadcast path), and the rank<=4
# probe cut has 4x the 4dp-boundary exposure of the rank-1 assignment —
# a float32 oracle here was fixture-dependent (r4 advice). The float32
# contract stays ONLY on SQL_ANN_IVF_TOPK's assignment (r3).
SQL_KNN_JOIN_BUCKETED = f"""
WITH {_ivf_assign_sql("::DOUBLE[]")},
probes AS (
  SELECT query_id, qv, bucket FROM (
    SELECT e.vec_id AS query_id, e.embedding AS qv,
           c.centroid_id AS bucket,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(c.centv::DOUBLE[],
                                                   e.embedding::DOUBLE[]), 4)
                        DESC,
                      c.centroid_id) AS rnk
    FROM embeddings e CROSS JOIN cent c)
  WHERE rnk <= 4),
scored AS (
  SELECT p.query_id, a.vec_id,
         round(list_cosine_similarity(p.qv::DOUBLE[], a.v::DOUBLE[]), 4)
           AS cosine
  FROM probes p JOIN assigned a ON a.bucket = p.bucket
  WHERE a.vec_id != p.query_id),
ranked AS (
  SELECT query_id, vec_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id) AS BIGINT)
           AS rank
  FROM scored)
SELECT query_id, vec_id, rank, cosine FROM ranked WHERE rank <= 5"""


SQL_ANN_IVF_TOPK = f"""
WITH {_IVF_ASSIGN_SQL},
q AS (SELECT vec_id AS query_id, embedding AS qv
      FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)),
probes AS (
  SELECT query_id, qv, bucket FROM (
    SELECT q.query_id, q.qv, c.centroid_id AS bucket,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(q.qv, c.centv), 4) DESC,
                      c.centroid_id) AS rnk
    FROM q CROSS JOIN cent c)
  WHERE rnk <= 4),
scored AS (
  SELECT p.query_id, a.vec_id,
         round(list_cosine_similarity(p.qv, a.v), 4) AS cosine
  FROM probes p JOIN assigned a ON a.bucket = p.bucket
  WHERE a.vec_id != p.query_id),
ranked AS (
  SELECT query_id, vec_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id) AS BIGINT)
           AS rank
  FROM scored)
SELECT query_id, vec_id, rank, cosine FROM ranked WHERE rank <= 10"""


def q_ann_recall(spark, sf_dir):
    """Recall gate for the FITTED IVF path (round-2 verdict item 4):
    recall@10 of ivf_topk with kmeans_centroids(k=16, 2 Lloyd
    iterations, nprobe=4) against the exact brute-force top-10, as a
    1-row value-oracled result. The whole chain — deterministic k-means
    init (lowest-id vectors), per-iteration rounded-cosine assignment
    (6dp, lowest-centroid tiebreak), spherical re-normalization, float32
    truncation of the final centroids, 4dp probing/ranking — is
    replicated in the DuckDB oracle, so the measured recall is
    cross-engine checked, not just asserted in pytest."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = sim.kmeans_centroids(emb, k=16, iterations=2)
    ivf = sim.ivf_topk(
        emb, [0, 1, 2, 3, 4], k=10, n_centroids=16, nprobe=4,
        round_dp=4, centroids=cents,
    )
    exact = sim.cosine_topk(emb, [0, 1, 2, 3, 4], k=10, round_dp=4)
    joined = exact.select("query_id", "vec_id").join(
        ivf.select("query_id", "vec_id").withColumn("_hit", F.lit(1)),
        ["query_id", "vec_id"],
        "left",
    )
    agg = joined.agg(
        F.count(F.lit(1)).alias("n_exact"), F.count("_hit").alias("n_hit")
    )
    recall = F.round(F.col("n_hit") / F.col("n_exact"), 4)
    return agg.select(
        "n_exact",
        "n_hit",
        recall.alias("recall"),
        (recall >= 0.8).alias("recall_ok"),
    )


def _kmeans_sql(k: int = 16, iters: int = 2) -> str:
    """Unrolled Lloyd iterations replicating kmeans_centroids exactly:
    init = k lowest-id vectors (cid = rank order); assignment = argmax
    of round(cosine, 6) with first-max (lowest-cid) tiebreak, zero
    vectors (NULL cosine) unassigned; new centroid = L2-normalized
    per-dimension mean, empty clusters keep the previous centroid;
    doubles throughout the iterations (Spark truncates to float32 only
    in the final createDataFrame — mirrored by the consumer)."""
    parts = [
        f"""c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
         CAST(embedding AS DOUBLE[]) AS centv
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {k}))"""
    ]
    for t in range(iters):
        prev, cur = f"c{t}", f"c{t + 1}"
        parts.append(f"""a{t} AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, c.cid,
           round(list_cosine_similarity(c.centv, e.embedding), 6) AS cos,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(c.centv, e.embedding), 6)
                        DESC NULLS LAST,
                      c.cid) AS rnk
    FROM embeddings e CROSS JOIN {prev} c)
  WHERE rnk = 1 AND cos IS NOT NULL),
m{t} AS (
  SELECT cid, list(av ORDER BY d) AS mv FROM (
    SELECT cid, d, avg(val) AS av FROM (
      SELECT cid, generate_subscripts(v, 1) AS d, unnest(v) AS val FROM a{t})
    GROUP BY cid, d)
  GROUP BY cid),
n{t} AS (
  SELECT cid, list_transform(
           mv, x -> CASE WHEN nrm = 0 THEN x ELSE x / nrm END) AS centv
  FROM (SELECT cid, mv,
               sqrt(list_sum(list_transform(mv, x -> x * x))) AS nrm
        FROM m{t})),
{cur} AS (
  SELECT p.cid, COALESCE(n.centv, p.centv) AS centv
  FROM {prev} p LEFT JOIN n{t} n ON p.cid = n.cid)""")
    return ",\n".join(parts)


SQL_ANN_RECALL = f"""
WITH {_kmeans_sql(16, 2)},
centf AS (
  SELECT cid AS centroid_id,
         list_transform(centv, x -> CAST(CAST(x AS REAL) AS DOUBLE)) AS centv
  FROM c2),
assigned AS (
  SELECT vec_id, v, bucket FROM (
    SELECT e.vec_id, e.embedding AS v, c.centroid_id AS bucket,
           round(list_cosine_similarity(c.centv, e.embedding), 4) AS cos,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(c.centv, e.embedding), 4)
                        DESC NULLS LAST,
                      c.centroid_id) AS rnk
    FROM embeddings e CROSS JOIN centf c)
  WHERE rnk = 1 AND cos IS NOT NULL),
q AS (SELECT vec_id AS query_id, embedding AS qv
      FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)),
probes AS (
  SELECT query_id, qv, bucket FROM (
    SELECT q.query_id, q.qv, c.centroid_id AS bucket,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(q.qv, c.centv), 4) DESC
                        NULLS LAST,
                      c.centroid_id) AS rnk
    FROM q CROSS JOIN centf c)
  WHERE rnk <= 4),
ivf AS (
  SELECT query_id, vec_id FROM (
    SELECT p.query_id, a.vec_id,
           row_number() OVER (PARTITION BY p.query_id
             ORDER BY round(list_cosine_similarity(p.qv, a.v), 4) DESC,
                      a.vec_id) AS rank
    FROM probes p JOIN assigned a ON a.bucket = p.bucket
    WHERE a.vec_id != p.query_id)
  WHERE rank <= 10),
exact AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(q.qv, e.embedding), 4)
                        DESC,
                      e.vec_id) AS rank
    FROM q CROSS JOIN embeddings e WHERE e.vec_id != q.query_id)
  WHERE rank <= 10),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_exact,
         CAST(count(i.vec_id) AS BIGINT) AS n_hit
  FROM exact e LEFT JOIN ivf i
    ON e.query_id = i.query_id AND e.vec_id = i.vec_id)
SELECT n_exact, n_hit,
       round(n_hit * 1.0 / n_exact, 4) AS recall,
       (round(n_hit * 1.0 / n_exact, 4) >= 0.8) AS recall_ok
FROM agg"""


def _media_table(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def q_multimodal_decode(spark, sf_dir):
    """Binary media plumbing: docs → fake binary payloads → mapInPandas
    feature extraction. The array<float> feature column is projected to
    driver-hashable scalars (dim + elementwise-rounded sum) — the stub
    codec is sha256-based, so DuckDB replicates the whole path
    bit-for-bit, error-isolation branch included.

    Rounding rule: each feature element is k/255 in float32; rounding
    elements to 4dp is exact (grid ≥2e-7 from every half-boundary), and
    the sum of 8 exact 4dp values re-rounded to 4dp is engine-stable."""
    from llmaix_spark.operators.multimodal import decode_media

    out = decode_media(_media_table(spark, sf_dir))
    rounded = F.transform("feature", lambda x: F.round(x.cast("double"), 4))
    return out.select(
        "media_id",
        "kind",
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        "content_hash",
        F.when(F.col("feature").isNull(), F.lit(None).cast("bigint"))
        .otherwise(F.size("feature").cast("bigint"))
        .alias("feature_dim"),
        F.round(
            F.aggregate(rounded, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("feature_sum"),
        "decode_error",
    )


_FEATURE_SUM_SQL = " + ".join(
    f"round((('0x' || substring(sha256(text), {2 * j + 1}, 2))::INT) / 255.0, 4)"
    for j in range(8)
)

SQL_MULTIMODAL_DECODE = f"""
WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents)
SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
       'image' AS kind,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       substring(sha256(text), 1, 16) AS content_hash,
       CASE WHEN length(text) = 0 THEN NULL
            ELSE CAST(8 AS BIGINT) END AS feature_dim,
       CASE WHEN length(text) = 0 THEN NULL
            ELSE round({_FEATURE_SUM_SQL}, 4) END AS feature_sum,
       CASE WHEN length(text) = 0 THEN 'empty image payload'
            ELSE NULL END AS decode_error
FROM d"""


def q_multimodal_features(spark, sf_dir):
    """Scalar projection of the multimodal decode output (media_id,
    n_bytes, content_hash, f0..f7) — makes the pandas-UDF byte plumbing
    itself value-checkable against SQL (the stub codec is sha256-based,
    which DuckDB can replicate bit-for-bit)."""
    from llmaix_spark.operators.multimodal import decode_media

    out = decode_media(_media_table(spark, sf_dir))
    return out.select(
        "media_id",
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        "content_hash",
        *[
            # cast float32 → double BEFORE rounding; 4dp (the k/255 grid
            # is provably ≥2e-7 from every 4-decimal half-boundary, while
            # float32 error at 6dp straddles round-half points)
            F.round(F.element_at("feature", j + 1).cast("double"), 4).alias(f"f{j}")
            for j in range(8)
        ],
    )


SQL_MULTIMODAL_FEATURES = """
SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       substring(sha256(text), 1, 16) AS content_hash,
       round((('0x' || substring(sha256(text), 1, 2))::INT) / 255.0, 4) AS f0,
       round((('0x' || substring(sha256(text), 3, 2))::INT) / 255.0, 4) AS f1,
       round((('0x' || substring(sha256(text), 5, 2))::INT) / 255.0, 4) AS f2,
       round((('0x' || substring(sha256(text), 7, 2))::INT) / 255.0, 4) AS f3,
       round((('0x' || substring(sha256(text), 9, 2))::INT) / 255.0, 4) AS f4,
       round((('0x' || substring(sha256(text), 11, 2))::INT) / 255.0, 4) AS f5,
       round((('0x' || substring(sha256(text), 13, 2))::INT) / 255.0, 4) AS f6,
       round((('0x' || substring(sha256(text), 15, 2))::INT) / 255.0, 4) AS f7
FROM documents"""


def q_extraction_stub(spark, sf_dir):
    """The flagship extraction harness (mapInPandas + stub LLM + JSON
    repair + from_json explode) over derived transcripts. Turn text is
    initcap'd and pred phrases injected so the capitalized-entity grammar
    has surfaces to extract (raw documents are lowercase word soup).

    Value-oracled: the stub grammar is deterministic string processing,
    so DuckDB re-runs the SAME regex over the identically-assembled
    conversations (SQL_EXTRACTION_STUB). malformed_rate=0 here so every
    row survives the JSON round-trip — the malformed/error path is pinned
    by tests/test_json_repair.py and the pipeline P/R gate instead. The
    formatting quirks (end markers, trailing prose/comma, nulls) stay ON:
    the oracle checks that repair reconstructs identical triples."""
    from llmaix_spark.operators.extraction import ExtractionConfig, extract_triples

    t = _turns(spark, sf_dir).withColumn(
        "text",
        F.concat(
            F.initcap(F.col("text")),
            F.lit(" works at "),
            F.initcap(F.reverse(F.col("text"))),
            F.lit("."),
        ),
    )
    # one task per core: the UDF stage is the cost — 8 fixed partitions
    # left 3/4 of a local[32] box idle (measured 4.6 s → 1.4 s at sf0.1)
    triples, _raw = extract_triples(
        t,
        ExtractionConfig(malformed_rate=0.0),
        num_partitions=spark.sparkContext.defaultParallelism,
    )
    return triples


def _initcap_sql(v: str) -> str:
    """DuckDB twin of Spark initcap (first letter of each space-separated
    word uppercased, rest lowercased)."""
    return (
        f"array_to_string(list_transform(string_split({v}, ' '), "
        "w -> CASE WHEN length(w) = 0 THEN w "
        "ELSE upper(w[1]) || lower(w[2:]) END), ' ')"
    )


def _extraction_stub_sql() -> str:
    # same grammar as operators/extraction.STUB_PATTERN, with Python's
    # unicode \w spelled out as an explicit class for RE2
    ent = "[A-ZÄÖÜ][A-Za-z0-9_äöüßÄÖÜ-]*(?: [A-ZÄÖÜ][A-Za-z0-9_äöüßÄÖÜ-]*)*"
    phrases = "works at|lives in|manages|visited|uses"
    pat = f"({ent}) ({phrases}) ({ent})"
    pred_case = (
        "CASE p WHEN 'works at' THEN 'works_at' WHEN 'lives in' THEN "
        "'lives_in' ELSE p END"
    )
    return f"""
WITH {_TURNS_SQL},
mod AS (
  SELECT conv_id, turn_idx,
         {_initcap_sql('text')} || ' works at ' ||
         {_initcap_sql('reverse(text)')} || '.' AS mtext
  FROM turns),
conv AS (
  SELECT conv_id, string_agg(mtext, ' ' ORDER BY turn_idx) AS conv_text
  FROM mod GROUP BY conv_id),
m AS (
  SELECT conv_id,
         regexp_extract_all(conv_text, '{pat}', 1) AS subs,
         regexp_extract_all(conv_text, '{pat}', 2) AS preds,
         regexp_extract_all(conv_text, '{pat}', 3) AS objs
  FROM conv),
x AS (
  SELECT conv_id, unnest(subs) AS subj_surface, unnest(preds) AS p,
         unnest(objs) AS obj_surface
  FROM m)
SELECT conv_id, subj_surface, {pred_case} AS pred, obj_surface FROM x"""


SQL_EXTRACTION_STUB = _extraction_stub_sql()


def q_extraction_variables(spark, sf_dir):
    """L7 fan-out as a driver-checked query: every document × every
    variable prompted once; the `{symptom}` value is injected into the
    prompt as the only capitalized surface, so the stub grammar extracts
    exactly (variable, works_at, MegaCorp) per pair — closed-form in SQL
    over the lowercase corpus. Exercises the broadcast crossJoin, the
    per-variable prompt formatting, the JSON round-trip and the variable
    passthrough column."""
    from llmaix_spark.operators.extraction import (
        TRIPLE_ARRAY_SCHEMA,
        ExtractionConfig,
        extract_with_variables,
    )

    d = _t(spark, sf_dir, "documents")
    transcripts = d.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.col("text"),
    )
    cfg = ExtractionConfig(
        prompt_template="{symptom} works at MegaCorp. {report}",
        malformed_rate=0.0,
    )
    raw = extract_with_variables(
        transcripts,
        ["Alice Smith", "Bob Jones"],
        cfg,
        num_partitions=spark.sparkContext.defaultParallelism,
    )
    j = F.from_json("parsed", TRIPLE_ARRAY_SCHEMA)
    return (
        raw.withColumn("j", j)
        .select("conv_id", "variable", F.explode("j.triples").alias("t"))
        .select(
            "conv_id",
            "variable",
            F.col("t.subj").alias("subj_surface"),
            F.col("t.pred").alias("pred"),
            F.col("t.obj").alias("obj_surface"),
        )
    )


SQL_EXTRACTION_VARIABLES = """
SELECT CAST(doc_id AS VARCHAR) AS conv_id, v AS variable,
       v AS subj_surface, 'works_at' AS pred, 'MegaCorp' AS obj_surface
FROM documents CROSS JOIN (VALUES ('Alice Smith'), ('Bob Jones')) AS t(v)"""


def q_pdf_roundtrip(spark, sf_dir):
    """S3/F12 PDF text ops, value-checked end to end through the actual
    binary format: documents.text → render_simple_pdf (stdlib twin of the
    reference's create_pdf, webapp/input_processing/routes.py:73-130;
    Flate-compressed content stream, wrap-after-space) → extract_pdf_text
    (twin of get_pymupdf_text_wordwise, report_redaction/utils.py:383-411;
    zlib inflate + Tj/TJ tokenizer). Wrap keeps the break space on the
    line and extraction concatenates shown runs, so the roundtrip is the
    identity — the oracle is the documents table itself. One Arrow-batched
    mapInPandas pass, embarrassingly parallel (no shuffle)."""
    import pandas as pd

    from llmaix_spark.sources.pdf import extract_pdf_text, render_simple_pdf

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "text": [
                        extract_pdf_text(render_simple_pdf(t or ""))
                        for t in pdf["text"]
                    ],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        run, "doc_id bigint, text string"
    )


SQL_PDF_ROUNDTRIP = """
SELECT doc_id, coalesce(text, '') AS text FROM documents"""


def q_pdf_redaction(spark, sf_dir):
    """anonymize_pdf twin through the binary format: render each document
    to a PDF, redact two corpus terms (black boxes + dollartext removal
    of the underlying text — reference llm_processing/utils.py:76-146),
    extract the text back. The terms share no prefix/suffix overlap and
    '$' never occurs in the corpus (text is ^[a-z ]+$), so simultaneous
    span masking equals DuckDB's sequential replace() — the oracle is a
    two-level replace with length-matched '$' runs."""
    import pandas as pd

    from llmaix_spark.sources.pdf import (
        extract_pdf_text,
        redact_pdf,
        render_simple_pdf,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    terms = ["table", "window"]

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "text": [
                        extract_pdf_text(
                            redact_pdf(render_simple_pdf(t or ""), terms)
                        )
                        for t in pdf["text"]
                    ],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        run, "doc_id bigint, text string"
    )


SQL_PDF_REDACTION = """
SELECT doc_id,
       replace(replace(coalesce(text, ''), 'table', '$$$$$'),
               'window', '$$$$$$') AS text
FROM documents"""


def q_distinct_kmv(spark, sf_dir):
    """KMV distinct-count sketch (k=64 minimum hashes) per order
    priority next to the exact count — the oracle proves the sketch
    estimate bit-for-bit, not just approximately (every step is exact
    integer math plus one IEEE division; see operators/sketches.py)."""
    from llmaix_spark.operators.sketches import kmv_distinct

    return kmv_distinct(
        _t(spark, sf_dir, "orders"), ["o_orderpriority"], "o_custkey", k=64
    )


# (k-1)·2^60 as the shortest round-trip double literal — both engines
# parse it to the identical IEEE value (63·2^60 has 6 significant bits)
_KMV_NUM = repr(float(63 * 2**60))

SQL_DISTINCT_KMV = f"""
WITH d AS (
  SELECT DISTINCT o_orderpriority,
         ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT
           AS h
  FROM orders WHERE o_custkey IS NOT NULL),
ex AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_exact
       FROM d GROUP BY 1),
r AS (SELECT o_orderpriority, h,
             row_number() OVER (PARTITION BY o_orderpriority ORDER BY h)
               AS rn
      FROM d),
sk AS (SELECT o_orderpriority, count(*) AS n_sk, max(h) AS hk
       FROM r WHERE rn <= 64 GROUP BY 1),
j AS (SELECT ex.o_orderpriority, n_exact,
             round(CASE WHEN n_sk < 64 THEN CAST(n_sk AS DOUBLE)
                        ELSE {_KMV_NUM} / CAST(hk AS DOUBLE) END,
                   4) AS kmv_estimate
      FROM ex JOIN sk USING (o_orderpriority))
SELECT o_orderpriority, n_exact, kmv_estimate,
       round(abs(kmv_estimate - n_exact) / n_exact, 6) AS rel_err
FROM j"""


def q_priority_sample(spark, sf_dir):
    """Weight-proportional 64-row sample of orders by total price
    (Duffield-Lund-Thorup priority sampling) with the unbiased
    subset-sum weight estimate — deterministic (hash-uniform u, no
    RNG), so the exact sample is oracle-checkable."""
    from llmaix_spark.operators.sketches import priority_sample

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("bigint").alias("orderkey"),
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
    )
    return priority_sample(o, "cents", ["orderkey"], k=64)


_HASH_SPACE_LIT = repr(float(2**60))

SQL_PRIORITY_SAMPLE = f"""
WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS orderkey,
                  CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
           FROM orders),
s AS (SELECT orderkey, cents,
             CAST(cents AS DOUBLE) * {_HASH_SPACE_LIT}
               / CAST((('0x' || substr(md5(CAST(orderkey AS VARCHAR)),
                                       1, 15))::BIGINT + 1) AS DOUBLE)
               AS q
      FROM o),
top AS (SELECT * FROM s ORDER BY q DESC, orderkey LIMIT 65),
tau AS (SELECT CASE WHEN count(*) > 64 THEN min(q) ELSE 0.0 END AS tau
        FROM top),
r AS (SELECT orderkey, cents,
             CAST(row_number() OVER (ORDER BY q DESC, orderkey) AS BIGINT)
               AS rank
      FROM top)
SELECT rank, orderkey, round(cents / 100.0, 2) AS weight,
       round(greatest(CAST(cents AS DOUBLE), (SELECT tau FROM tau))
               / 100.0, 2) AS weight_est
FROM r WHERE rank <= 64"""


def q_events_trend(spark, sf_dir):
    """Per-event-type OLS trend of value over time (slope, intercept,
    r²) from DECIMAL(38,0)-exact sufficient statistics — order-
    invariant cross-engine regression, unlike the double-summing
    regr_slope built-ins (see operators/profile.py::group_ols)."""
    from llmaix_spark.operators.profile import group_ols

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000").alias("xs"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    return group_ols(e, ["event_type"], "xs", "cents")


SQL_EVENTS_TREND = """
WITH e AS (SELECT event_type, epoch_us(ts) // 1000000 AS xs,
                  CAST(round(value * 100, 0) AS BIGINT) AS cents
           FROM events),
a AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
             sum(CAST(xs AS HUGEINT)) AS sx,
             sum(CAST(cents AS HUGEINT)) AS sy,
             sum(CAST(xs AS HUGEINT) * cents) AS sxy,
             sum(CAST(xs AS HUGEINT) * xs) AS sxx,
             sum(CAST(cents AS HUGEINT) * cents) AS syy
      FROM e GROUP BY 1),
f AS (SELECT event_type,
             CAST(n AS BIGINT) AS n,
             CAST(n * sxy - sx * sy AS DOUBLE) AS num,
             CAST(n * sxx - sx * sx AS DOUBLE) AS denx,
             CAST(n * syy - sy * sy AS DOUBLE) AS deny,
             CAST(sx AS DOUBLE) AS dx, CAST(sy AS DOUBLE) AS dy,
             CAST(n AS DOUBLE) AS dn
      FROM a),
g AS (SELECT *, num / denx AS slope_raw FROM f)
SELECT event_type, n,
       CASE WHEN denx = 0 THEN NULL ELSE round(slope_raw, 6) END AS slope,
       CASE WHEN denx = 0 THEN NULL
            ELSE round((dy - slope_raw * dx) / dn, 6) END AS intercept,
       CASE WHEN denx = 0 OR deny = 0 THEN NULL
            ELSE round(num * num / (denx * deny), 6) END AS r2
FROM g"""


def q_kg_shortest_paths(spark, sf_dir):
    """BFS hop distances (≤4) from the lexicographically smallest
    entity over the undirected triple graph — iterative frontier
    expansion as DataFrame joins; the oracle is DuckDB's recursive
    CTE, a genuinely independent fixpoint algorithm."""
    from llmaix_spark.operators.graph import bfs_distances

    return bfs_distances(
        q_kg_triples(spark, sf_dir), src="subj", dst="obj", max_hops=4
    )


SQL_KG_SHORTEST_PATHS = f"""
WITH RECURSIVE tt AS ({SQL_KG_TRIPLES}),
e0 AS (SELECT DISTINCT subj AS a, obj AS b FROM tt
       WHERE subj IS NOT NULL AND obj IS NOT NULL AND subj <> obj),
e AS (SELECT a, b FROM e0 UNION SELECT b AS a, a AS b FROM e0),
bfs AS (
  SELECT (SELECT min(a) FROM e) AS node, 0 AS dist
  UNION
  SELECT e.b AS node, bfs.dist + 1 AS dist
  FROM bfs JOIN e ON e.a = bfs.node
  WHERE bfs.dist < 4)
SELECT node, CAST(min(dist) AS BIGINT) AS dist
FROM bfs GROUP BY 1"""


def q_skew_histogram(spark, sf_dir):
    """Power-of-two key-frequency histogram of lineitem.l_partkey —
    the pre-shuffle skew diagnostic (fat top bucket ⇒ salt or rely on
    AQE skew-split before keying a 100 TB join on the column)."""
    from llmaix_spark.operators.profile import skew_histogram

    return skew_histogram(_t(spark, sf_dir, "lineitem"), "l_partkey")


SQL_SKEW_HISTOGRAM = """
WITH f AS (SELECT l_partkey AS k, count(*) AS f FROM lineitem GROUP BY 1),
t AS (SELECT sum(f) AS total FROM f),
b AS (SELECT length(bin(f)) - 1 AS bucket,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(f) AS BIGINT) AS n_rows
      FROM f GROUP BY 1)
SELECT CAST(bucket AS BIGINT) AS bucket,
       (1::BIGINT << bucket) AS freq_lo,
       n_keys, n_rows,
       round(CAST(n_rows AS DOUBLE)
               / CAST((SELECT total FROM t) AS DOUBLE), 6) AS row_share
FROM b"""


def q_zorder_key(spark, sf_dir):
    """62-bit Morton key of (custkey, orderdate-day) per order — the
    data-clustering key OPTIMIZE-ZORDER-style layout sorts by before
    writing, so parquet min/max stats prune on BOTH columns (see
    functions/zorder.py; pure bigint mask/shift/or, no UDF)."""
    from llmaix_spark.functions.zorder import zorder2_expr

    o = _t(spark, sf_dir, "orders")
    day = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("bigint")
    return o.select(
        F.col("o_orderkey").cast("bigint").alias("orderkey"),
        F.col("o_custkey").cast("bigint").alias("custkey"),
        day.alias("day"),
        zorder2_expr(F.col("o_custkey"), day).alias("zkey"),
    )


def _zorder_oracle_sql() -> str:
    from llmaix_spark.functions.zorder import _MASK31, _SPREAD_STEPS

    steps = ""
    for i, (sh, mask) in enumerate(_SPREAD_STEPS, 1):
        steps += f""",
z{i} AS (SELECT orderkey, custkey, day,
                (ax | (ax << {sh})) & {mask} AS ax,
                (ay | (ay << {sh})) & {mask} AS ay
         FROM z{i - 1})"""
    return f"""
WITH z0 AS (SELECT CAST(o_orderkey AS BIGINT) AS orderkey,
                   CAST(o_custkey AS BIGINT) AS custkey,
                   CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                        AS BIGINT) AS day,
                   CAST(o_custkey AS BIGINT) & {_MASK31} AS ax,
                   CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                        AS BIGINT) & {_MASK31} AS ay
            FROM orders){steps}
SELECT orderkey, custkey, day, ax | (ay << 1) AS zkey
FROM z{len(_SPREAD_STEPS)}"""


SQL_ZORDER_KEY = _zorder_oracle_sql()


def q_events_twap(spark, sf_dir):
    """Per-user time-weighted average event value — holding-duration
    weights in exact integer micros·cents (DECIMAL(38,0) sums; one
    final double division). The irregular-sampling mean a plain avg()
    gets wrong."""
    from llmaix_spark.operators.events import time_weighted_avg

    return time_weighted_avg(_t(spark, sf_dir, "events"))


SQL_EVENTS_TWAP = """
WITH e AS (SELECT user_id u, epoch_us(ts) us,
                  CAST(event_id AS BIGINT) eid,
                  CAST(round(value * 100, 0) AS BIGINT) cents
           FROM events),
s AS (SELECT u, cents,
             lead(us) OVER (PARTITION BY u ORDER BY us, eid) - us AS dt
      FROM e),
a AS (SELECT u, CAST(count(*) AS BIGINT) AS n_intervals,
             sum(CAST(dt AS HUGEINT) * cents) AS wsum,
             sum(CAST(dt AS HUGEINT)) AS tsum
      FROM s WHERE dt IS NOT NULL GROUP BY 1)
SELECT u AS user_id, n_intervals,
       round(CAST(wsum AS DOUBLE) / CAST(tsum AS DOUBLE) / 100.0, 6)
         AS twap
FROM a WHERE tsum > 0"""


def q_integrity_gaps(spark, sf_dir):
    """Missing runs in the F-status orderkey sequence (the surrogate-
    key audit; the filter makes the synthetic dense sequence sparse).
    Two-level bucketed plan — no unpartitioned window over the
    corpus; oracle is the naive global lead()."""
    from llmaix_spark.operators.profile import sequence_gaps

    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return sequence_gaps(o, "o_orderkey", bucket_size=1024)


SQL_INTEGRITY_GAPS = """
WITH k AS (SELECT DISTINCT CAST(o_orderkey AS BIGINT) AS k
           FROM orders WHERE o_orderstatus = 'F'),
g AS (SELECT k, lead(k) OVER (ORDER BY k) AS nk FROM k)
SELECT k + 1 AS gap_start, nk - 1 AS gap_end,
       nk - k - 1 AS gap_len
FROM g WHERE nk > k + 1"""


def q_kg_components(spark, sf_dir):
    """Connected components of the triple surface graph (node →
    min-reachable-surface component) — the size-adaptive CC the
    canonicalization pipeline uses (driver union-find under 200k
    edges, distributed min-label propagation above), value-oracled
    against DuckDB's recursive-CTE min-label fixpoint."""
    from llmaix_spark.operators.canonicalize import connected_components

    t = q_kg_triples(spark, sf_dir)
    edges = (
        t.where(
            F.col("subj").isNotNull()
            & F.col("obj").isNotNull()
            & (F.col("subj") != F.col("obj"))
        )
        .select(
            F.col("subj").alias("norm_a"), F.col("obj").alias("norm_b")
        )
        .distinct()
    )
    return connected_components(edges).select(
        F.col("norm").alias("node"), "component"
    )


SQL_KG_COMPONENTS = f"""
WITH RECURSIVE tt AS ({SQL_KG_TRIPLES}),
e0 AS (SELECT DISTINCT subj AS a, obj AS b FROM tt
       WHERE subj IS NOT NULL AND obj IS NOT NULL AND subj <> obj),
e AS (SELECT a, b FROM e0 UNION SELECT b AS a, a AS b FROM e0),
r AS (
  SELECT a AS node, a AS lbl FROM (SELECT a FROM e) n
  UNION
  SELECT e.b AS node, r.lbl AS lbl
  FROM r JOIN e ON e.a = r.node
  WHERE r.lbl < e.b)
SELECT node, min(lbl) AS component
FROM r GROUP BY 1"""


def q_snapshot_diff(spark, sf_dir):
    """Change-data-feed generation: diff the CDC base snapshot
    against its post-merge state and recover what the feed did —
    insert / delete / update per key with both row images (the
    inverse of cdc_apply; one full-outer join on the key)."""
    from llmaix_spark.operators.cdc import apply_changes, snapshot_diff

    base, changes = _cdc_fixture(spark, sf_dir)
    rounded = lambda d: d.select(  # noqa: E731
        "custkey", "c_name", F.round("bal", 2).alias("acctbal")
    )
    return snapshot_diff(
        rounded(base),
        rounded(apply_changes(base, changes, ["custkey"])),
        ["custkey"],
    )


SQL_SNAPSHOT_DIFF = f"""
WITH {_CDC_CHANGES_SQL},
latest AS (
  SELECT custkey, op, c_name, bal FROM (
    SELECT *, row_number() OVER (PARTITION BY custkey
                                 ORDER BY seq DESC) rn
    FROM changes) WHERE rn = 1),
new_snap AS (
  SELECT k AS custkey, c_name, round(bal, 2) AS acctbal
  FROM base WHERE k NOT IN (SELECT custkey FROM latest)
  UNION ALL
  SELECT custkey, c_name, round(bal, 2) AS acctbal
  FROM latest WHERE op <> 'delete'),
old_snap AS (SELECT k AS custkey, c_name, round(bal, 2) AS acctbal
             FROM base),
d AS (
  SELECT coalesce(o.custkey, n.custkey) AS custkey,
         CASE WHEN o.custkey IS NULL THEN 'insert'
              WHEN n.custkey IS NULL THEN 'delete'
              WHEN (o.c_name IS DISTINCT FROM n.c_name)
                OR (o.acctbal IS DISTINCT FROM n.acctbal) THEN 'update'
              ELSE 'unchanged' END AS change,
         o.c_name AS c_name_old, n.c_name AS c_name_new,
         o.acctbal AS acctbal_old, n.acctbal AS acctbal_new
  FROM old_snap o FULL JOIN new_snap n ON o.custkey = n.custkey)
SELECT custkey, change, c_name_old, c_name_new,
       acctbal_old, acctbal_new
FROM d WHERE change <> 'unchanged'"""


def q_weighted_median(spark, sf_dir):
    """Quantity-weighted median extended price per return flag —
    exact integer threshold test (2·cumw ≥ W) over the distinct-value
    cumulative window; no interpolation, no float accumulation."""
    from llmaix_spark.operators.profile import weighted_median

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
        F.round(F.col("l_quantity"), 0).cast("bigint").alias("qty"),
    )
    return weighted_median(li, ["l_returnflag"], "cents", "qty")


SQL_WEIGHTED_MEDIAN = """
WITH li AS (SELECT l_returnflag,
                   CAST(round(l_extendedprice * 100, 0) AS BIGINT) cents,
                   CAST(round(l_quantity, 0) AS BIGINT) qty
            FROM lineitem),
v AS (SELECT l_returnflag, cents, sum(qty) AS w
      FROM li GROUP BY 1, 2),
c AS (SELECT l_returnflag, cents,
             sum(w) OVER (PARTITION BY l_returnflag ORDER BY cents
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum,
             sum(w) OVER (PARTITION BY l_returnflag) AS tot
      FROM v),
m AS (SELECT l_returnflag, min(cents) AS med,
             CAST(min(tot) AS BIGINT) AS total_w
      FROM c WHERE 2 * cum >= tot GROUP BY 1),
n AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows
      FROM li GROUP BY 1)
SELECT m.l_returnflag, n.n_rows, m.total_w,
       round(med / 100.0, 2) AS median
FROM m JOIN n USING (l_returnflag)"""


def q_search_phrase(spark, sf_dir):
    """Exact phrase search ('value table' consecutively) over the
    positional token index with per-doc occurrence counts — the
    adjacency join AND-of-terms search cannot express."""
    from llmaix_spark.operators.textstats import search_phrase

    return search_phrase(
        _t(spark, sf_dir, "documents"), ["value", "table"]
    )


SQL_SEARCH_PHRASE = r"""
WITH d AS (SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)),
                                                 '\s+'),
                              x -> length(x) > 0) AS l
           FROM documents),
tok AS (SELECT doc_id, generate_subscripts(l, 1) AS pos,
               unnest(l) AS term
        FROM d)
SELECT t1.doc_id, CAST(count(*) AS BIGINT) AS n_occ
FROM tok t1
JOIN tok t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
WHERE t1.term = 'value' AND t2.term = 'table'
GROUP BY 1"""


def q_outliers_mad(spark, sf_dir):
    """Hampel-filter outlier profile of extended price per return
    flag: |v − median| > 3·1.4826·MAD — the robust gate (50%
    breakdown) an untrusted data drop needs where mean/stddev rules
    break on the outliers themselves."""
    from llmaix_spark.operators.profile import outliers_mad

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
    )
    return outliers_mad(li, ["l_returnflag"], "cents", k=3.0)


SQL_OUTLIERS_MAD = """
WITH li AS (SELECT l_returnflag,
                   CAST(round(l_extendedprice * 100, 0) AS BIGINT) cents
            FROM lineitem),
m AS (SELECT l_returnflag, quantile_cont(cents, 0.5) AS med,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM li GROUP BY 1),
d AS (SELECT li.l_returnflag, abs(li.cents - m.med) AS dev, m.med
      FROM li JOIN m USING (l_returnflag)),
md AS (SELECT l_returnflag, quantile_cont(dev, 0.5) AS mad
       FROM d GROUP BY 1),
f AS (SELECT d.l_returnflag,
             CAST(sum(CASE WHEN d.dev > 4.4478 * md.mad
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM d JOIN md USING (l_returnflag) GROUP BY 1)
SELECT m.l_returnflag, m.n_rows,
       round(m.med / 100.0, 4) AS median,
       round(md.mad / 100.0, 4) AS mad,
       f.n_outliers
FROM m JOIN md USING (l_returnflag) JOIN f USING (l_returnflag)"""


def q_events_ewma(spark, sf_dir):
    """Exact dyadic EWMA (alpha=1/2, depth-16 window) of event value
    per user — the streaming smoother made integer-exact: BIGINT
    Horner numerator, (2^m−1)·100 denominator, one IEEE division.
    The oracle is an independent formulation (bounded self-join with
    explicit 2^(rn−lo) weights) of the same closed form."""
    from llmaix_spark.operators.events import ewma_exact

    return ewma_exact(_t(spark, sf_dir, "events"), depth=16)


SQL_EVENTS_EWMA = """
WITH e AS (
  SELECT user_id, CAST(event_id AS BIGINT) AS event_id,
         CAST(round(value * 100, 0) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
w AS (
  SELECT a.user_id, a.event_id, a.rn,
         greatest(a.rn - 15, 1) AS lo, b.rn AS brn, b.cents
  FROM e a JOIN e b
    ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 15 AND a.rn)
SELECT event_id, user_id,
       CAST(count(*) AS BIGINT) AS window_n,
       round(CAST(sum(cents * ((CAST(1 AS BIGINT) << (brn - lo)))) AS DOUBLE)
             / CAST(((CAST(1 AS BIGINT) << count(*)) - 1) * 100 AS DOUBLE),
             6) AS ewma
FROM w GROUP BY event_id, user_id, rn"""


def q_fd_violations(spark, sf_dir):
    """Functional-dependency audit over part: every p_name carrying
    more than one brand and every p_type carrying more than one size —
    the violations of the two FDs a curation pipeline would assert
    before keying on the column. Two hash aggregates (count DISTINCT
    compiles to one Expand each), unioned with the FD tag."""
    from llmaix_spark.operators.profile import fd_check

    p = _t(spark, sf_dir, "part")
    a = fd_check(p, "p_name", "p_brand").select(
        F.lit("p_name->p_brand").alias("fd"), "*"
    )
    b = fd_check(p, "p_type", "p_size").select(
        F.lit("p_type->p_size").alias("fd"), "*"
    )
    return a.unionByName(b)


SQL_FD_VIOLATIONS = """
SELECT 'p_name->p_brand' AS fd, CAST(p_name AS VARCHAR) AS lhs_value,
       CAST(count(DISTINCT p_brand) AS BIGINT) AS n_distinct_rhs,
       CAST(count(*) AS BIGINT) AS n_rows
FROM part GROUP BY 2 HAVING count(DISTINCT p_brand) > 1
UNION ALL
SELECT 'p_type->p_size', CAST(p_type AS VARCHAR),
       CAST(count(DISTINCT p_size) AS BIGINT),
       CAST(count(*) AS BIGINT)
FROM part GROUP BY 2 HAVING count(DISTINCT p_size) > 1"""


_EVENT_TYPE_BITS = [
    ("click", 1),
    ("error", 2),
    ("purchase", 4),
    ("signup", 8),
    ("view", 16),
]


def q_bitmap_segments(spark, sf_dir):
    """Behavioural segmentation by bitwise aggregate: OR together one
    power-of-two bit per event type a user has ever emitted, then count
    users per exact bitmap — the roaring-bitmap-style segment cube
    (2^5 possible segments) computed as two map-side-combinable hash
    aggregates, no distinct explosion. The grain is user-day (a whole
    user's history saturates every bit at any SF); the decoded label is
    rebuilt from the mask on BOTH sides so it certifies the bit
    arithmetic."""
    e = _t(spark, sf_dir, "events")
    bit = F.lit(0)
    for name, b in _EVENT_TYPE_BITS:
        bit = F.when(F.col("event_type") == name, F.lit(b)).otherwise(bit)
    masks = (
        e.select(
            "user_id",
            F.to_date(F.col("ts").cast("timestamp")).alias("day"),
            bit.alias("bit"),
        )
        .groupBy("user_id", "day")
        .agg(F.bit_or("bit").cast("bigint").alias("mask"))
    )
    label = F.concat_ws(
        "+",
        *[
            F.when(F.col("mask").bitwiseAND(b) > 0, F.lit(name))
            for name, b in _EVENT_TYPE_BITS
        ],
    )
    return masks.groupBy("mask").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_user_days")
    ).select("mask", label.alias("types"), "n_user_days")


SQL_BITMAP_SEGMENTS = """
WITH m AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(bit_or(CASE event_type WHEN 'click' THEN 1
                     WHEN 'error' THEN 2 WHEN 'purchase' THEN 4
                     WHEN 'signup' THEN 8 WHEN 'view' THEN 16
                     ELSE 0 END) AS BIGINT) AS mask
  FROM events GROUP BY 1, 2)
SELECT mask,
       concat_ws('+',
         CASE WHEN mask & 1 > 0 THEN 'click' END,
         CASE WHEN mask & 2 > 0 THEN 'error' END,
         CASE WHEN mask & 4 > 0 THEN 'purchase' END,
         CASE WHEN mask & 8 > 0 THEN 'signup' END,
         CASE WHEN mask & 16 > 0 THEN 'view' END) AS types,
       CAST(count(*) AS BIGINT) AS n_user_days
FROM m GROUP BY 1"""


def q_unpivot_metrics(spark, sf_dir):
    """Wide-to-long reshape: one-pass per-orderstatus metric row
    (count, exact-cents total, max price, distinct customers) melted
    into (status, metric, value) with the built-in unpivot — the
    export shape a metrics store ingests. All measures ride integers
    until a final exact-or-rounded cast into the shared DOUBLE value
    column."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    wide = o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.round(F.sum(cents.cast("decimal(38,0)")).cast("double") / 100.0, 2)
        .alias("total_price"),
        (F.max(cents).cast("double") / 100.0).alias("max_price"),
        F.countDistinct("o_custkey").cast("double").alias("n_customers"),
    )
    return wide.unpivot(
        ["status"],
        ["n_orders", "total_price", "max_price", "n_customers"],
        "metric",
        "value",
    )


SQL_UNPIVOT_METRICS = """
WITH wide AS (
  SELECT o_orderstatus AS status,
         CAST(count(*) AS DOUBLE) AS n_orders,
         round(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS DOUBLE) / 100.0, 2) AS total_price,
         CAST(max(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS DOUBLE) / 100.0 AS max_price,
         CAST(count(DISTINCT o_custkey) AS DOUBLE) AS n_customers
  FROM orders GROUP BY 1)
SELECT status, metric, value
FROM (UNPIVOT wide ON n_orders, total_price, max_price, n_customers
      INTO NAME metric VALUE value)"""


def q_kmv_union(spark, sf_dir):
    """KMV sketch MERGE — per-shard (orderkey parity) distinct-custkey
    sketches whose union estimate is computed from the sketch contents
    alone, never rescanning the base: the mergeability that lets a
    1000-executor job combine per-partition sketches at the driver.
    The oracle replays the identical merge in SQL, so the merged
    estimate is proven bit-for-bit, not approximately."""
    from llmaix_spark.operators.sketches import kmv_merge

    o = _t(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 2).cast("string").alias("shard"),
        "o_custkey",
    )
    return kmv_merge(o, "shard", "o_custkey", k=64)


SQL_KMV_UNION = f"""
WITH d AS (
  SELECT DISTINCT CAST(o_orderkey % 2 AS VARCHAR) AS part,
         ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT
           AS h
  FROM orders WHERE o_custkey IS NOT NULL),
r AS (SELECT part, h,
             row_number() OVER (PARTITION BY part ORDER BY h) AS rn
      FROM d),
kept AS (SELECT part, h FROM r WHERE rn <= 64),
ppex AS (SELECT part, CAST(count(*) AS BIGINT) AS n_exact
         FROM d GROUP BY 1),
ppsk AS (SELECT part, count(*) AS n_sk, max(h) AS hk
         FROM kept GROUP BY 1),
mex AS (SELECT CAST(count(DISTINCT h) AS BIGINT) AS n_exact FROM d),
msk AS (SELECT count(*) AS n_sk, max(h) AS hk
        FROM (SELECT DISTINCT h FROM kept ORDER BY h LIMIT 64))
SELECT part, n_exact,
       round(CASE WHEN n_sk < 64 THEN CAST(n_sk AS DOUBLE)
                  ELSE {_KMV_NUM} / CAST(hk AS DOUBLE) END, 4)
         AS kmv_estimate
FROM ppex JOIN ppsk USING (part)
UNION ALL
SELECT 'ALL', mex.n_exact,
       round(CASE WHEN msk.n_sk < 64 THEN CAST(msk.n_sk AS DOUBLE)
                  ELSE {_KMV_NUM} / CAST(msk.hk AS DOUBLE) END, 4)
FROM mex, msk"""


def q_kg_degree_hist(spark, sf_dir):
    """Degree distribution of the undirected triple surface graph —
    the power-law profile a KG pipeline checks before choosing join
    strategies (hot entities = skewed keys). Two map-side-combinable
    aggregates over the symmetric distinct edge set; output is
    (degree, n_nodes), a handful of rows at any scale."""
    t = q_kg_triples(spark, sf_dir)
    e0 = (
        t.where(
            F.col("subj").isNotNull()
            & F.col("obj").isNotNull()
            & (F.col("subj") != F.col("obj"))
        )
        .select(F.col("subj").alias("a"), F.col("obj").alias("b"))
        .distinct()
    )
    sym = e0.union(e0.select(F.col("b"), F.col("a"))).distinct()
    deg = sym.groupBy("a").agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )


SQL_KG_DEGREE_HIST = f"""
WITH tt AS ({SQL_KG_TRIPLES}),
e0 AS (SELECT DISTINCT subj AS a, obj AS b FROM tt
       WHERE subj IS NOT NULL AND obj IS NOT NULL AND subj <> obj),
e AS (SELECT a, b FROM e0 UNION SELECT b AS a, a AS b FROM e0),
deg AS (SELECT a, CAST(count(*) AS BIGINT) AS degree FROM e GROUP BY 1)
SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY 1"""


def q_scd2_pit_join(spark, sf_dir):
    """Point-in-time dimension lookup: each order probes the customer
    SCD2 history at as-of seq (orderkey % 4) and gets the version
    valid then — NULL after a delete or before any version. Composed
    as scd2_history -> asof_join on the version-open seq (merge
    formulation, one window pass — never an interval theta join), then
    a valid_to gate; the oracle is the direct interval LEFT JOIN, an
    independent formulation of interval membership."""
    from llmaix_spark.operators.asof import asof_join
    from llmaix_spark.operators.cdc import scd2_history

    base, changes = _cdc_fixture(spark, sf_dir)
    hist = scd2_history(base, changes, ["custkey"]).select(
        "custkey",
        F.col("valid_from").alias("asof"),
        "c_name",
        "bal",
        "valid_to",
    )
    probes = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("bigint").alias("orderkey"),
        F.col("o_custkey").cast("bigint").alias("custkey"),
        (F.col("o_orderkey") % 4).cast("bigint").alias("asof"),
    )
    j = asof_join(probes, hist, on="asof", by=["custkey"])
    open_ = F.col("asof_r").isNotNull() & (
        F.col("valid_to").isNull() | (F.col("asof") < F.col("valid_to"))
    )
    return j.select(
        "orderkey",
        "custkey",
        "asof",
        F.when(open_, F.col("c_name")).alias("c_name"),
        F.when(open_, F.round("bal", 2)).alias("acctbal"),
        F.when(open_, F.col("asof_r")).cast("bigint").alias("version_from"),
    )


SQL_SCD2_PIT_JOIN = f"""
WITH {_CDC_CHANGES_SQL},
versions AS (
  SELECT k AS custkey, CAST(0 AS BIGINT) AS seq, 'upsert' AS op,
         c_name, bal FROM base
  UNION ALL
  SELECT custkey, CAST(seq AS BIGINT), op, c_name, bal FROM changes),
hist AS (
  SELECT custkey, c_name, bal, seq AS valid_from,
         lead(seq) OVER (PARTITION BY custkey ORDER BY seq) AS valid_to,
         op
  FROM versions),
h AS (SELECT custkey, c_name, bal, valid_from, valid_to
      FROM hist WHERE op <> 'delete'),
p AS (SELECT CAST(o_orderkey AS BIGINT) AS orderkey,
             CAST(o_custkey AS BIGINT) AS custkey,
             CAST(o_orderkey % 4 AS BIGINT) AS asof
      FROM orders)
SELECT p.orderkey, p.custkey, p.asof, h.c_name,
       round(h.bal, 2) AS acctbal,
       CAST(h.valid_from AS BIGINT) AS version_from
FROM p LEFT JOIN h
  ON p.custkey = h.custkey AND h.valid_from <= p.asof
 AND (h.valid_to IS NULL OR p.asof < h.valid_to)"""


def q_active_users_7d(spark, sf_dir):
    """DAU + trailing-7-day distinct actives per day. Distinct counts
    don't add, and the naive trailing-window plan is a GLOBAL range
    window (one task); the operator explodes each (day, user) into the
    7 report days it feeds, keeping everything hash-partitioned by
    day. The oracle is the independent interval self-join
    formulation."""
    from llmaix_spark.operators.events import rolling_active_users

    return rolling_active_users(_t(spark, sf_dir, "events"), window_days=7)


SQL_ACTIVE_USERS_7D = """
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
            FROM events),
dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY 1),
act AS (SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT)
               AS active_w
        FROM (SELECT DISTINCT day FROM du) d
        JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
        GROUP BY 1)
SELECT day, dau, active_w FROM dau JOIN act USING (day)"""


def q_session_paths(spark, sf_dir):
    """Top-20 three-step behavioural paths: sessionize each user
    timeline (30-min inactivity gap), slide a trigram window over the
    in-session event-type sequence, count paths corpus-wide. BOTH
    window passes (session numbering, trigram leads) partition by
    user_id with the same ordering — one exchange, one sort (plan-
    pinned); session boundaries are enforced by lead(sid,2)==sid
    instead of a second shuffle on (user, session). Then a map-side-
    combinable count and a TakeOrderedAndProject top-k on the unique
    (n DESC, path) key."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_s = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = e.withColumn("sid", F.sum(new_s).over(w))
    tri = sess.select(
        F.col("event_type").alias("a"),
        F.lead("event_type", 1).over(w).alias("b"),
        F.lead("event_type", 2).over(w).alias("c"),
        F.col("sid").alias("s0"),
        F.lead("sid", 2).over(w).alias("s2"),
    ).where(F.col("c").isNotNull() & (F.col("s2") == F.col("s0")))
    counts = tri.groupBy(
        F.concat_ws(">", "a", "b", "c").alias("path")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return counts.orderBy(F.col("n").desc(), "path").limit(20)


SQL_SESSION_PATHS = """
WITH x AS (
  SELECT user_id, ts, event_id, event_type,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events),
s AS (
  SELECT user_id, ts, event_id, event_type,
         sum(CASE WHEN prev IS NULL
                  OR date_diff('second', prev, ts) > 1800
             THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
  FROM x),
tri AS (
  SELECT event_type AS a,
         lead(event_type, 1) OVER w AS b,
         lead(event_type, 2) OVER w AS c
  FROM s
  WINDOW w AS (PARTITION BY user_id, sid ORDER BY ts, event_id)),
c AS (SELECT a || '>' || b || '>' || c AS path,
             CAST(count(*) AS BIGINT) AS n
      FROM tri WHERE c IS NOT NULL GROUP BY 1)
SELECT path, n FROM c ORDER BY n DESC, path LIMIT 20"""


def q_fingerprint_winnow(spark, sf_dir):
    """Winnowing (MOSS) fingerprint selection over documents: 3-gram
    hashes, window-4 rightmost-minimum rule — the position-robust
    near-dup index. The oracle is the independent anchor-self-join
    formulation of the same rule (row_number over (h ASC, pos DESC)
    per window), so the selection logic is value-proven, not just the
    hashes."""
    from llmaix_spark.operators.dedup import winnow_fingerprints

    return winnow_fingerprints(
        _t(spark, sf_dir, "documents"), k=3, window=4
    )


SQL_FINGERPRINT_WINNOW = r"""
WITH d AS (SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)),
                                                 '\s+'),
                              x -> length(x) > 0) AS l
           FROM documents),
tok AS (SELECT doc_id, generate_subscripts(l, 1) AS pos,
               unnest(l) AS term
        FROM d),
g AS (SELECT t1.doc_id, t1.pos,
             ('0x' || substr(md5(t1.term || ' ' || t2.term || ' '
                                 || t3.term), 1, 15))::BIGINT AS h
      FROM tok t1
      JOIN tok t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
      JOIN tok t3 ON t3.doc_id = t1.doc_id AND t3.pos = t1.pos + 2),
j AS (SELECT a.doc_id, a.pos AS e, g.pos, g.h,
             row_number() OVER (PARTITION BY a.doc_id, a.pos
                                ORDER BY g.h ASC, g.pos DESC) AS rn
      FROM g a JOIN g ON g.doc_id = a.doc_id
                     AND g.pos BETWEEN a.pos - 3 AND a.pos
      WHERE a.pos >= 4)
SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos, h AS fp
FROM j WHERE rn = 1"""


def q_copurchase_cosine(spark, sf_dir):
    """Item-item recommendation scores: parts co-occurring in order
    baskets, cosine = n_ab / sqrt(n_a·n_b) from exact integer counts
    (one IEEE sqrt + one division — bit-identical cross-engine), top-5
    recommendations per part ranked on the raw cosine with a
    deterministic (cos DESC, rec ASC) tie-break. The basket self-join
    is bounded per order; the item-frequency table joins back
    broadcast."""
    b = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .localCheckpoint(eager=False)  # consumers: pair join ×2, counts
    )
    n_item = b.groupBy("p").agg(F.count(F.lit(1)).alias("n"))
    a, c = b.alias("a"), b.alias("c")
    pairs = (
        a.join(c, "o")
        .where(F.col("a.p") < F.col("c.p"))
        .groupBy(F.col("a.p").alias("pa"), F.col("c.p").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 2)
    )
    sym = pairs.unionByName(
        pairs.select(
            F.col("pb").alias("pa"), F.col("pa").alias("pb"), "n_ab"
        )
    )
    j = (
        sym.join(
            F.broadcast(n_item.select(F.col("p").alias("pa"),
                                      F.col("n").alias("na"))), "pa"
        )
        .join(
            F.broadcast(n_item.select(F.col("p").alias("pb"),
                                      F.col("n").alias("nb"))), "pb"
        )
    )
    cos = F.col("n_ab").cast("double") / F.sqrt(
        (F.col("na") * F.col("nb")).cast("double")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("pa").orderBy(F.desc("_cos"), F.asc("pb"))
    return (
        j.withColumn("_cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select(
            F.col("pa").cast("bigint").alias("part"),
            F.col("pb").cast("bigint").alias("rec"),
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.round(F.col("_cos"), 6).alias("cosine"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


SQL_COPURCHASE_COSINE = """
WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
           FROM lineitem),
ni AS (SELECT p, count(*) AS n FROM b GROUP BY 1),
pc AS (SELECT a.p AS pa, c.p AS pb, count(*) AS n_ab
       FROM b a JOIN b c ON a.o = c.o AND a.p < c.p
       GROUP BY 1, 2 HAVING count(*) >= 2),
sym AS (SELECT pa, pb, n_ab FROM pc
        UNION ALL SELECT pb, pa, n_ab FROM pc),
sc AS (SELECT s.pa, s.pb, s.n_ab,
              CAST(s.n_ab AS DOUBLE)
                / sqrt(CAST(na.n * nb.n AS DOUBLE)) AS c,
              row_number() OVER (PARTITION BY s.pa
                                 ORDER BY CAST(s.n_ab AS DOUBLE)
                                   / sqrt(CAST(na.n * nb.n AS DOUBLE))
                                   DESC, s.pb ASC) AS rank
       FROM sym s JOIN ni na ON na.p = s.pa JOIN ni nb ON nb.p = s.pb)
SELECT CAST(pa AS BIGINT) AS part, CAST(pb AS BIGINT) AS rec,
       CAST(n_ab AS BIGINT) AS n_ab, round(c, 6) AS cosine,
       CAST(rank AS BIGINT) AS rank
FROM sc WHERE rank <= 5"""


def q_activity_streaks(spark, sf_dir):
    """Gaps-and-islands: per-user consecutive-active-day streaks —
    island id = day − row_number() over the distinct active days (two
    consecutive days share it), then one aggregate per island and one
    per user. Longest-streak ties resolve to the earliest start via
    min(struct(−len, start)). All integer/date arithmetic."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    du = (
        e.select(
            "user_id",
            F.datediff(
                F.to_date(F.col("ts").cast("timestamp")),
                F.lit("1970-01-01").cast("date"),
            ).alias("dayn"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("dayn")
    isl = du.select(
        "user_id",
        "dayn",
        (F.col("dayn") - F.row_number().over(w)).alias("isl"),
    )
    streaks = isl.groupBy("user_id", "isl").agg(
        F.count(F.lit(1)).cast("bigint").alias("len"),
        F.min("dayn").alias("start"),
    )
    best = streaks.groupBy("user_id").agg(
        F.sum("len").cast("bigint").alias("active_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.max("len").cast("bigint").alias("longest"),
        F.min(F.struct(F.negate(F.col("len")), F.col("start")))
        .getField("start")
        .alias("_bs"),
    )
    return best.select(
        "user_id",
        "active_days",
        "n_streaks",
        "longest",
        F.date_add(F.lit("1970-01-01").cast("date"), F.col("_bs"))
        .alias("longest_start"),
    )


SQL_ACTIVITY_STREAKS = """
WITH du AS (SELECT DISTINCT user_id,
                   date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                     AS dayn
            FROM events),
isl AS (SELECT user_id, dayn,
               dayn - row_number() OVER (PARTITION BY user_id
                                         ORDER BY dayn) AS isl
        FROM du),
s AS (SELECT user_id, isl, CAST(count(*) AS BIGINT) AS len,
             min(dayn) AS start
      FROM isl GROUP BY 1, 2)
SELECT user_id,
       CAST(sum(len) AS BIGINT) AS active_days,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(max(len) AS BIGINT) AS longest,
       DATE '1970-01-01'
         + CAST((min({'nl': -len, 's': start})).s AS INTEGER)
         AS longest_start
FROM s GROUP BY 1"""


def q_drift_psi(spark, sf_dir):
    """Distribution-drift audit: base-10 population stability index of
    the event value distribution, first half (even event_id) vs second
    half, per event type over 10 equal-width buckets. Bucketing is
    pure integer math ((cents·10) div (max+1) — no float boundary),
    counts densify over the full type×bucket×half cube so silent
    buckets enter with Laplace-1 mass, and each log10 rounds at 6dp
    BEFORE combining (the dsir_importance recipe); the 10-term sum
    rounds at 4dp."""
    e = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("et"),
        (F.col("event_id") % 2).cast("bigint").alias("half"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    e = e.localCheckpoint(eager=False)  # consumers: max, counts, cube
    mx = e.agg(F.max("cents").alias("mx"))
    eb = e.crossJoin(F.broadcast(mx)).select(
        "et",
        "half",
        ((F.col("cents") * 10) / (F.col("mx") + 1))
        .cast("bigint")
        .alias("b"),
    )
    counts = eb.groupBy("et", "half", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    cube = (
        e.select("et").distinct()
        .crossJoin(spark.range(10).select(F.col("id").alias("b")))
        .crossJoin(spark.range(2).select(F.col("id").alias("half")))
    )
    dense = cube.join(counts, ["et", "half", "b"], "left").select(
        "et", "half", "b", F.coalesce("n", F.lit(0)).alias("n")
    )
    tot = dense.groupBy("et", "half").agg(F.sum("n").alias("tot"))
    pq = dense.join(tot, ["et", "half"]).select(
        "et",
        "b",
        "half",
        (
            (F.col("n") + 1).cast("double")
            / (F.col("tot") + 10).cast("double")
        ).alias("p"),
    )
    wide = pq.groupBy("et", "b").agg(
        F.max(F.when(F.col("half") == 0, F.col("p"))).alias("p0"),
        F.max(F.when(F.col("half") == 1, F.col("p"))).alias("p1"),
    )
    term = (F.col("p0") - F.col("p1")) * (
        F.round(F.log10("p0"), 6) - F.round(F.log10("p1"), 6)
    )
    return (
        wide.groupBy(F.col("et").alias("event_type"))
        .agg(F.round(F.sum(term), 4).alias("psi10"))
    )


SQL_DRIFT_PSI = """
WITH e AS (SELECT event_type AS et,
                  CAST(event_id % 2 AS BIGINT) AS half,
                  CAST(round(value * 100, 0) AS BIGINT) AS cents
           FROM events),
mx AS (SELECT max(cents) AS mx FROM e),
eb AS (SELECT et, half, (cents * 10) // ((SELECT mx FROM mx) + 1) AS b
       FROM e),
counts AS (SELECT et, half, b, CAST(count(*) AS BIGINT) AS n
           FROM eb GROUP BY 1, 2, 3),
cube AS (SELECT t.et, bb.b, hh.half
         FROM (SELECT DISTINCT et FROM e) t,
              (SELECT unnest(range(10)) AS b) bb,
              (SELECT unnest(range(2)) AS half) hh),
dense AS (SELECT c.et, c.half, c.b, COALESCE(counts.n, 0) AS n
          FROM cube c LEFT JOIN counts
            ON counts.et = c.et AND counts.half = c.half
           AND counts.b = c.b),
tot AS (SELECT et, half, sum(n) AS tot FROM dense GROUP BY 1, 2),
pq AS (SELECT d.et, d.b, d.half,
              CAST(d.n + 1 AS DOUBLE) / CAST(t.tot + 10 AS DOUBLE) AS p
       FROM dense d JOIN tot t ON t.et = d.et AND t.half = d.half),
wide AS (SELECT et, b,
                max(CASE WHEN half = 0 THEN p END) AS p0,
                max(CASE WHEN half = 1 THEN p END) AS p1
         FROM pq GROUP BY 1, 2)
SELECT et AS event_type,
       round(sum((p0 - p1) * (round(log10(p0), 6)
                              - round(log10(p1), 6))), 4) AS psi10
FROM wide GROUP BY 1"""


def q_ivm_refresh(spark, sf_dir):
    """Incremental view maintenance: refresh a per-bucket (custkey%50)
    count/sum aggregate from the CDC feed WITHOUT rescanning the base
    — resolve the latest change per key, join it to the base row
    (delta = new−old / −old / +new for update/delete/insert), aggregate
    the deltas, and merge them into the stored aggregate with one full
    outer join. The oracle recomputes the aggregate FROM the fully
    applied table — so the incremental path is proven equal to the
    full refresh, the defining IVM property."""
    from pyspark.sql import Window

    base, changes = _cdc_fixture(spark, sf_dir)
    cents = lambda c: F.round(F.col(c) * 100, 0).cast("bigint")  # noqa: E731
    b = base.select(
        "custkey", (F.col("custkey") % 50).alias("bucket"), cents("bal").alias("c")
    ).localCheckpoint(eager=False)  # consumers: stored agg, delta join
    stored = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n0"), F.sum("c").alias("s0")
    )
    w = Window.partitionBy("custkey").orderBy(F.desc("seq"))
    latest = (
        changes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("custkey", "op", cents("bal").alias("new_c"))
    )
    eff = latest.join(
        b.select("custkey", F.col("c").alias("old_c")), "custkey", "left"
    ).select(
        (F.col("custkey") % 50).alias("bucket"),
        F.when(F.col("op") == "delete",
               F.when(F.col("old_c").isNotNull(), -1).otherwise(0))
        .otherwise(F.when(F.col("old_c").isNotNull(), 0).otherwise(1))
        .alias("dn"),
        F.when(F.col("op") == "delete", -F.coalesce("old_c", F.lit(0)))
        .otherwise(F.col("new_c") - F.coalesce("old_c", F.lit(0)))
        .alias("dc"),
    )
    deltas = eff.groupBy("bucket").agg(
        F.sum("dn").alias("dn"), F.sum("dc").alias("dc")
    )
    merged = stored.join(deltas, "bucket", "full").select(
        F.col("bucket").cast("bigint").alias("bucket"),
        (F.coalesce("n0", F.lit(0)) + F.coalesce("dn", F.lit(0)))
        .cast("bigint")
        .alias("n"),
        (F.coalesce("s0", F.lit(0)) + F.coalesce("dc", F.lit(0)))
        .cast("bigint")
        .alias("sum_cents"),
    )
    return merged.where(F.col("n") > 0)


SQL_IVM_REFRESH = f"""
WITH {_CDC_CHANGES_SQL},
latest AS (
  SELECT custkey, op, c_name, bal FROM (
    SELECT *, row_number() OVER (PARTITION BY custkey
                                 ORDER BY seq DESC) rn
    FROM changes) WHERE rn = 1),
applied AS (
  SELECT k AS custkey, bal FROM base
  WHERE k NOT IN (SELECT custkey FROM latest)
  UNION ALL
  SELECT custkey, bal FROM latest WHERE op <> 'delete')
SELECT CAST(custkey % 50 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(bal * 100, 0) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM applied GROUP BY 1"""


def q_dow_hour_matrix(spark, sf_dir):
    """Calendar activity matrix: event counts per (day-of-week, hour).
    Both coordinates derive from epoch integers ((dayn+4)%7 — Monday=0
    — and hour = µs÷3600e6 mod 24) instead of each engine's dayofweek
    builtin, whose numbering conventions disagree; one hash aggregate,
    168 output rows at any scale."""
    e = _t(spark, sf_dir, "events").select(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    dayn = F.floor(F.col("us") / F.lit(86_400_000_000))
    return (
        e.select(
            ((dayn + 4) % 7).cast("bigint").alias("dow"),
            (F.floor(F.col("us") / F.lit(3_600_000_000)) % 24)
            .cast("bigint")
            .alias("hour"),
        )
        .groupBy("dow", "hour")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )


SQL_DOW_HOUR_MATRIX = """
WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events)
SELECT CAST(((us // 86400000000) + 4) % 7 AS BIGINT) AS dow,
       CAST((us // 3600000000) % 24 AS BIGINT) AS hour,
       CAST(count(*) AS BIGINT) AS n_events
FROM e GROUP BY 1, 2"""


def q_kaplan_meier(spark, sf_dir):
    """Kaplan-Meier survival curve: hours from first signup to first
    high-value purchase (2dp value >= 120), right-censored at the
    corpus's last timestamp. Exact integer at-risk table; each step
    factor is one IEEE division; the curve is a left fold of factors
    in duration order (Spark aggregate() seeded 1.0 == DuckDB
    list_reduce — 1.0*x is exact), rounded once at 6dp. The only
    unpartitioned window runs over the bounded-cardinality curve
    (<= observation window in hours), never the corpus."""
    from llmaix_spark.operators.survival import kaplan_meier

    return kaplan_meier(_t(spark, sf_dir, "events"))


SQL_KAPLAN_MEIER = """
WITH e AS (
  SELECT user_id u, epoch_us(CAST(ts AS TIMESTAMP)) us, event_type ty,
         round(value, 2) v2 FROM events),
mx AS (SELECT max(us) tmax FROM e),
su AS (SELECT u, min(us) t0 FROM e WHERE ty = 'signup' GROUP BY u),
dp AS (
  SELECT e.u, min(e.us) tp
  FROM e JOIN su ON e.u = su.u AND e.us >= su.t0
  WHERE e.ty = 'purchase' AND e.v2 >= 120.0 GROUP BY e.u),
subj AS (
  SELECT su.u,
         CAST((coalesce(dp.tp, mx.tmax) - su.t0) // 3600000000 AS BIGINT)
           AS dur_h,
         CASE WHEN dp.tp IS NULL THEN 0 ELSE 1 END AS obs
  FROM su LEFT JOIN dp ON su.u = dp.u CROSS JOIN mx),
tot AS (SELECT count(*) n FROM subj),
base AS (
  SELECT dur_h, sum(obs) d, count(*) - sum(obs) c
  FROM subj GROUP BY 1),
w AS (
  SELECT dur_h, d, c,
         sum(d + c) OVER (ORDER BY dur_h) - (d + c) AS prior
  FROM base),
f AS (
  SELECT dur_h, d, c, tot.n - prior AS nr,
         CAST(1 AS DOUBLE)
           - CAST(d AS DOUBLE) / CAST(tot.n - prior AS DOUBLE) AS factor,
         row_number() OVER (ORDER BY dur_h) rn
  FROM w CROSS JOIN tot),
lst AS (SELECT list(factor ORDER BY dur_h) L FROM f)
SELECT CAST(dur_h AS BIGINT) AS duration_h, CAST(nr AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS n_death, CAST(c AS BIGINT) AS n_censored,
       round(list_reduce(L[1:rn], (a, b) -> a * b), 6) AS survival
FROM f CROSS JOIN lst"""


def q_events_cusum(spark, sf_dir):
    """Per-user one-sided CUSUM changepoint monitor (drift = global
    floor-mean cents, alarm at S > 50000): a true sequential
    recursion S_i = max(0, S_{i-1} + x_i - k) that no window prefix
    sum expresses — run as a JVM-side aggregate() left fold over the
    per-user frame-ordered array, all-BIGINT so it is bit-identical
    to the DuckDB recursive-CTE oracle (recursion depth = max events
    per user)."""
    from llmaix_spark.operators.events import cusum_alarms

    return cusum_alarms(_t(spark, sf_dir, "events"))


SQL_EVENTS_CUSUM = """
WITH RECURSIVE
e AS (
  SELECT user_id u, CAST(round(value * 100, 0) AS BIGINT) cents,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) rn
  FROM events),
kk AS (SELECT CAST(sum(cents) // count(*) AS BIGINT) k FROM e),
n AS (SELECT u, max(rn) nev FROM e GROUP BY u),
c AS (
  SELECT u, CAST(0 AS BIGINT) AS rn, CAST(0 AS BIGINT) s,
         CAST(0 AS BIGINT) mx, CAST(0 AS BIGINT) al
  FROM n
  UNION ALL
  SELECT e.u, e.rn,
         greatest(CAST(0 AS BIGINT), c.s + e.cents - kk.k),
         greatest(c.mx, greatest(CAST(0 AS BIGINT), c.s + e.cents - kk.k)),
         c.al + CASE WHEN greatest(CAST(0 AS BIGINT),
                                   c.s + e.cents - kk.k) > 50000
                     THEN 1 ELSE 0 END
  FROM c JOIN e ON e.u = c.u AND e.rn = c.rn + 1 CROSS JOIN kk)
SELECT c.u AS user_id, CAST(n.nev AS BIGINT) AS n_events, kk.k AS drift_k,
       c.mx AS max_s, CAST(c.al AS BIGINT) AS n_alarms, c.s AS final_s
FROM c JOIN n ON c.u = n.u AND c.rn = n.nev CROSS JOIN kk"""


def q_rfm_segments(spark, sf_dir):
    """RFM quintile segmentation within market segment: exact
    integer-day recency from the corpus max order date, BIGINT-cents
    monetary sums (order-invariant), every ntile tie-broken by
    custkey, integer floor-mean cents for the cell (a first cut hit
    the cross-engine half-cent round boundary — no float survives in
    this query). Windows partition by segment (window_deciles rule:
    no global ntile)."""
    from llmaix_spark.operators.profile import rfm_segments

    return rfm_segments(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    )


SQL_RFM_SEGMENTS = """
WITH mx AS (
  SELECT max(epoch_us(CAST(o_orderdate AS TIMESTAMP))) tmax FROM orders),
pc AS (
  SELECT o_custkey,
         CAST((mx.tmax - max(epoch_us(CAST(o_orderdate AS TIMESTAMP))))
              // 86400000000 AS BIGINT) AS r_days,
         CAST(count(*) AS BIGINT) AS n_orders,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS monetary
  FROM orders CROSS JOIN mx GROUP BY o_custkey, mx.tmax),
j AS (
  SELECT c.c_mktsegment AS segment, pc.*
  FROM pc JOIN customer c ON pc.o_custkey = c.c_custkey),
scored AS (
  SELECT segment, monetary,
         ntile(5) OVER (PARTITION BY segment
                        ORDER BY r_days, o_custkey) AS r_score,
         ntile(5) OVER (PARTITION BY segment
                        ORDER BY n_orders DESC, o_custkey) AS f_score,
         ntile(5) OVER (PARTITION BY segment
                        ORDER BY monetary DESC, o_custkey) AS m_score
  FROM j)
SELECT segment,
       r_score || '-' || f_score || '-' || m_score AS rfm_cell,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(monetary) // count(*) AS BIGINT) AS avg_monetary_cents
FROM scored GROUP BY 1, 2"""


def q_attribution_last_touch(spark, sf_dir):
    """Last-touch conversion attribution: each purchase credits the
    user's most recent prior non-purchase event within 7 days
    ('direct' when none) — one IGNORE-NULLS last() window pass on the
    unique (ts, event_id) order, exact microsecond lookback gate,
    exact bigint-cents revenue."""
    from llmaix_spark.operators.events import attribute_last_touch

    return attribute_last_touch(_t(spark, sf_dir, "events"))


SQL_ATTRIBUTION_LAST_TOUCH = """
WITH e AS (
  SELECT user_id u, epoch_us(CAST(ts AS TIMESTAMP)) us, event_id eid,
         event_type ty, CAST(round(value * 100, 0) AS BIGINT) cents
  FROM events),
t AS (
  SELECT *,
         last_value(CASE WHEN ty <> 'purchase'
                         THEN {'tus': us, 'tty': ty} END IGNORE NULLS)
           OVER (PARTITION BY u ORDER BY us, eid
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) tch
  FROM e)
SELECT CASE WHEN tch IS NULL OR us - tch.tus > 604800000000
            THEN 'direct' ELSE tch.tty END AS channel,
       CAST(count(*) AS BIGINT) AS n_conversions,
       CAST(sum(cents) AS BIGINT) AS attributed_cents
FROM t WHERE ty = 'purchase' GROUP BY 1"""


def q_k_anonymity(spark, sf_dir):
    """k-anonymity / l-diversity audit (k=5, l=3): quasi-identifiers
    (nation, $1000 balance bucket), sensitive attribute mktsegment.
    One hash aggregate (count + countDistinct = one Expand); output
    bounded by QID-combination cardinality. The balance bucket is
    floor on an exact cents/1e5 quotient (only exact multiples land
    on integer boundaries — representable, so no flip)."""
    from llmaix_spark.operators.privacy import k_anonymity_audit

    c = _t(spark, sf_dir, "customer")
    bucket = F.floor(
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
        / F.lit(100000.0)
    ).cast("bigint")
    return k_anonymity_audit(
        c.select(
            F.col("c_nationkey").cast("bigint").alias("nation"),
            bucket.alias("bal_bucket"),
            "c_mktsegment",
        ),
        ["nation", "bal_bucket"],
        "c_mktsegment",
        k=5,
        l_div=3,
    )


SQL_K_ANONYMITY = """
WITH q AS (
  SELECT CAST(c_nationkey AS BIGINT) nation,
         CAST(floor(CAST(round(c_acctbal * 100, 0) AS BIGINT)
                    / 100000.0) AS BIGINT) bal_bucket,
         c_mktsegment
  FROM customer)
SELECT nation, bal_bucket,
       CAST(count(*) AS BIGINT) AS group_k,
       CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS group_l,
       count(*) < 5 AS k_violation,
       count(DISTINCT c_mktsegment) < 3 AS l_violation
FROM q GROUP BY 1, 2"""


def q_winsorized_mean(spark, sf_dir):
    """Outlier-robust per-segment account-balance mean, winsorized at
    the nearest-rank [p10, p90] order statistics — pure integer
    selection (the r-th smallest cents value is well-defined under
    ties), integer clip, exact BIGINT sums, one mirrored IEEE
    division chain per mean. Partitioned rank window, broadcast
    bounds join."""
    from llmaix_spark.operators.profile import winsorized_mean

    return winsorized_mean(
        _t(spark, sf_dir, "customer"),
        "c_acctbal",
        by=["c_mktsegment"],
    )


SQL_WINSORIZED_MEAN = """
WITH base AS (
  SELECT c_mktsegment, CAST(round(c_acctbal * 100, 0) AS BIGINT) cents
  FROM customer),
ranked AS (
  SELECT c_mktsegment, cents,
         row_number() OVER (PARTITION BY c_mktsegment ORDER BY cents) rn,
         count(*) OVER (PARTITION BY c_mktsegment) n
  FROM base),
bounds AS (
  SELECT c_mktsegment,
         max(CASE WHEN rn = greatest(1, CAST(ceil(CAST(0.1 AS DOUBLE) * n)
                                             AS BIGINT))
                  THEN cents END) lo,
         max(CASE WHEN rn = CAST(ceil(CAST(0.9 AS DOUBLE) * n) AS BIGINT)
                  THEN cents END) hi
  FROM ranked GROUP BY 1)
SELECT b.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(b.cents) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) / 100.0, 2) AS raw_mean,
       round(CAST(sum(least(greatest(b.cents, bo.lo), bo.hi)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) / 100.0, 2) AS winsorized_mean
FROM base b JOIN bounds bo ON b.c_mktsegment = bo.c_mktsegment
GROUP BY 1"""


def q_calibration_bins(spark, sf_dir):
    """Reliability diagram of 'value predicts purchase': 10 equal-
    width score bins (integer arithmetic on exact cents — no float
    boundary), per bin the mean normalized score vs the observed
    purchase rate. One hash aggregate, 10 output rows at any SF."""
    from llmaix_spark.operators.labels import calibration_bins

    e = _t(spark, sf_dir, "events").select(
        "value",
        (F.col("event_type") == "purchase").cast("int").alias("is_purchase"),
    )
    return calibration_bins(
        e, "value", "is_purchase", n_bins=10, score_scale=500.0
    )


SQL_CALIBRATION_BINS = """
WITH e AS (
  SELECT CAST(round(value * 100, 0) AS BIGINT) c,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END y
  FROM events)
SELECT CAST(least(9, c // 5000) AS BIGINT) AS bin_id,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             / 50000.0, 6) AS mean_pred,
       round(CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS frac_positive
FROM e GROUP BY 1"""


def q_balance_classes(spark, sf_dir):
    """Deterministic class rebalancing of documents by language:
    every language undersampled to the smallest class size, survivors
    chosen by the shared 60-bit salted content hash (reproducible on
    any engine/partitioning, no RNG state). Per-class rank window +
    broadcast scalar min — the balanced-sampling analogue of
    sample_k_per_group."""
    from llmaix_spark.operators.curation import balance_classes

    return balance_classes(
        _t(spark, sf_dir, "documents"), "lang", "doc_id"
    )


SQL_BALANCE_CLASSES = """
WITH h AS (
  SELECT doc_id, lang,
         ('0x' || substring(md5('balance|' || CAST(doc_id AS VARCHAR)),
                            1, 15))::BIGINT hh
  FROM documents),
r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id) rk
  FROM h),
m AS (
  SELECT CAST(min(n) AS BIGINT) mn
  FROM (SELECT count(*) n FROM documents GROUP BY lang))
SELECT doc_id, lang, CAST(rk AS BIGINT) AS sample_rank
FROM r CROSS JOIN m WHERE rk <= mn"""


def q_kmv_intersect(spark, sf_dir):
    """KMV sketch algebra beyond union: |A|, |B|, |A∪B|, Jaccard and
    |A∩B| of the distinct click-amount vs purchase-amount sets (exact
    cents — sets that genuinely differ, unlike the saturated user
    sets), all from the two k=64 sketches' contents (≤ 2k rows after
    the distinct). Exact integer hashes; each estimate is one IEEE
    division by the exact k-th minimum; J is an integer ratio; the
    intersection estimate multiplies two identically-computed
    doubles."""
    from llmaix_spark.operators.sketches import kmv_jaccard

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    return kmv_jaccard(
        e, "event_type", "cents", "click", "purchase", k=64
    )


SQL_KMV_INTERSECT = """
WITH d AS (
  SELECT DISTINCT event_type tag,
         ('0x' || substring(md5(CAST(CAST(round(value * 100, 0) AS BIGINT)
                                     AS VARCHAR)), 1, 15))::BIGINT h
  FROM events WHERE event_type IN ('click', 'purchase')),
sk AS (
  SELECT tag, h FROM (
    SELECT tag, h, row_number() OVER (PARTITION BY tag ORDER BY h) rn
    FROM d) WHERE rn <= 64),
pt AS (
  SELECT tag, count(*) n, max(h) hk FROM sk GROUP BY 1),
est AS (
  SELECT max(CASE WHEN tag = 'click' THEN
               CASE WHEN n < 64 THEN CAST(n AS DOUBLE)
                    ELSE 7.263405479023136e+19 / CAST(hk AS DOUBLE) END
             END) ea,
         max(CASE WHEN tag = 'purchase' THEN
               CASE WHEN n < 64 THEN CAST(n AS DOUBLE)
                    ELSE 7.263405479023136e+19 / CAST(hk AS DOUBLE) END
             END) eb
  FROM pt),
u AS (SELECT DISTINCT h FROM sk ORDER BY h LIMIT 64),
ua AS (SELECT count(*) n, max(h) hk FROM u),
iv AS (
  SELECT count(*) ni
  FROM u
  JOIN (SELECT h FROM sk WHERE tag = 'click') a USING (h)
  JOIN (SELECT h FROM sk WHERE tag = 'purchase') b USING (h))
SELECT CAST(64 AS BIGINT) AS k,
       round(est.ea, 4) AS est_a,
       round(est.eb, 4) AS est_b,
       round(CASE WHEN ua.n < 64 THEN CAST(ua.n AS DOUBLE)
                  ELSE 7.263405479023136e+19 / CAST(ua.hk AS DOUBLE) END,
             4) AS est_union,
       round(CAST(iv.ni AS DOUBLE) / CAST(ua.n AS DOUBLE), 6)
         AS jaccard_est,
       round((CAST(iv.ni AS DOUBLE) / CAST(ua.n AS DOUBLE))
             * (CASE WHEN ua.n < 64 THEN CAST(ua.n AS DOUBLE)
                     ELSE 7.263405479023136e+19 / CAST(ua.hk AS DOUBLE)
                END), 4) AS est_intersection
FROM ua CROSS JOIN iv CROSS JOIN est"""


def q_index_postings(spark, sf_dir):
    """Inverted-index build: per term its document frequency, total
    term frequency, the first 16 ascending doc_ids, and the
    delta-encoded gap list (the payload an index writer
    varint-compresses; search_rank/search_phrase are the read side).
    Zipf skew collapses in the map-side-combinable (term, doc)
    aggregate; the only arrays sorted are per-term and truncated."""
    from llmaix_spark.operators.indexing import inverted_postings

    return inverted_postings(_t(spark, sf_dir, "documents"))


SQL_INDEX_POSTINGS = """
WITH tok AS (
  SELECT CAST(doc_id AS BIGINT) doc, unnest(string_split(text, ' ')) term
  FROM documents),
td AS (
  SELECT term, doc, CAST(count(*) AS BIGINT) tf
  FROM tok WHERE term <> '' GROUP BY 1, 2),
rolled AS (
  SELECT term, CAST(count(*) AS BIGINT) df,
         CAST(sum(tf) AS BIGINT) total_tf,
         (list(doc ORDER BY doc))[1:16] postings
  FROM td GROUP BY 1)
SELECT term, df, total_tf, postings,
       list_transform(postings,
                      (x, i) -> x - coalesce(postings[i - 1],
                                             CAST(0 AS BIGINT))) AS gaps
FROM rolled"""


def q_events_trigrams(spark, sf_dir):
    """Top-20 consecutive event-type trigrams (sequential pattern
    mining seed): two lead() on one per-user sort, map-side count,
    TakeOrderedAndProject with a total (n DESC, t1, t2, t3)
    tie-break."""
    from llmaix_spark.operators.events import event_trigrams

    return event_trigrams(_t(spark, sf_dir, "events"))


SQL_EVENTS_TRIGRAMS = """
WITH e AS (
  SELECT user_id u, event_type t1,
         lead(event_type, 1) OVER w t2,
         lead(event_type, 2) OVER w t3
  FROM events
  WINDOW w AS (PARTITION BY user_id
               ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id))
SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
FROM e WHERE t2 IS NOT NULL AND t3 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n DESC, t1, t2, t3 LIMIT 20"""


def q_events_debounce(spark, sf_dir):
    """Per-user 12 h last-KEPT-event throttle — a true sequential
    recursion (a burst compares against one surviving anchor, not
    pairwise lags), folded JVM-side in BIGINT over the per-user
    frame-ordered array; oracle = DuckDB recursive CTE carrying the
    last-kept epoch. Sentinel -2^62, not Long.MIN (the first
    comparison would overflow under ANSI)."""
    from llmaix_spark.operators.events import debounce_events

    return debounce_events(_t(spark, sf_dir, "events"), gap_hours=12)


SQL_EVENTS_DEBOUNCE = """
WITH RECURSIVE
e AS (
  SELECT user_id u, epoch_us(CAST(ts AS TIMESTAMP)) us,
         CAST(event_id AS BIGINT) eid,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(CAST(ts AS TIMESTAMP)),
                                     event_id) rn
  FROM events),
n AS (SELECT u, max(rn) nev FROM e GROUP BY u),
c AS (
  SELECT u, CAST(0 AS BIGINT) rn,
         CAST(-4611686018427387904 AS BIGINT) last_kept,
         CAST(0 AS BIGINT) kept, CAST(NULL AS BIGINT) eid
  FROM n
  UNION ALL
  SELECT e.u, e.rn,
         CASE WHEN e.us - c.last_kept >= 43200000000
              THEN e.us ELSE c.last_kept END,
         CASE WHEN e.us - c.last_kept >= 43200000000
              THEN c.kept + 1 ELSE c.kept END,
         CASE WHEN e.us - c.last_kept >= 43200000000
              THEN e.eid ELSE CAST(NULL AS BIGINT) END
  FROM c JOIN e ON e.u = c.u AND e.rn = c.rn + 1)
SELECT u AS user_id, eid AS event_id, kept AS kept_rank
FROM c WHERE eid IS NOT NULL"""


def q_assoc_rules(spark, sf_dir):
    """Market-basket association rules at brand grain (support ≥ 1%,
    confidence ≥ 10%, both thresholds on the ROUNDED value):
    directional (antecedent → consequent) with support, confidence
    and lift — lift computed as ONE division of exact integer
    products (n_ab·N)/(n_x·n_y), never a quotient of quotients. The
    distinct basket-brand table localCheckpoints (4 consumers:
    basket count, item counts, both sides of the pair self-join);
    the item-frequency joins broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    bi = (
        li.join(
            F.broadcast(pt.select("p_partkey", "p_brand")),
            li.l_partkey == F.col("p_partkey"),
        )
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("br"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nb = bi.agg(F.countDistinct("o").cast("bigint").alias("n_baskets"))
    ni = bi.groupBy("br").agg(F.count(F.lit(1)).cast("bigint").alias("n_i"))
    a, c = bi.alias("a"), bi.alias("c")
    pairs = (
        a.join(c, "o")
        .where(F.col("a.br") != F.col("c.br"))
        .groupBy(
            F.col("a.br").alias("antecedent"),
            F.col("c.br").alias("consequent"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
    )
    j = (
        pairs.join(
            F.broadcast(ni.select(F.col("br"), F.col("n_i").alias("n_x"))),
            pairs.antecedent == F.col("br"),
        )
        .drop("br")
        .join(
            F.broadcast(ni.select(F.col("br"), F.col("n_i").alias("n_y"))),
            pairs.consequent == F.col("br"),
        )
        .drop("br")
        .crossJoin(F.broadcast(nb))
    )
    support = F.round(
        F.col("n_ab").cast("double") / F.col("n_baskets").cast("double"), 6
    )
    confidence = F.round(
        F.col("n_ab").cast("double") / F.col("n_x").cast("double"), 6
    )
    lift = F.round(
        (F.col("n_ab") * F.col("n_baskets")).cast("double")
        / (F.col("n_x") * F.col("n_y")).cast("double"),
        6,
    )
    return (
        j.select(
            "antecedent",
            "consequent",
            "n_ab",
            support.alias("support"),
            confidence.alias("confidence"),
            lift.alias("lift"),
        )
        .where(
            (F.col("support") >= 0.01) & (F.col("confidence") >= 0.1)
        )
    )


SQL_ASSOC_RULES = """
WITH bi AS (
  SELECT DISTINCT l.l_orderkey o, p.p_brand br
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
nb AS (SELECT CAST(count(DISTINCT o) AS BIGINT) n_baskets FROM bi),
ni AS (SELECT br, CAST(count(*) AS BIGINT) n_i FROM bi GROUP BY 1),
pr AS (
  SELECT a.br antecedent, c.br consequent, CAST(count(*) AS BIGINT) n_ab
  FROM bi a JOIN bi c ON a.o = c.o AND a.br <> c.br
  GROUP BY 1, 2),
j AS (
  SELECT pr.antecedent, pr.consequent, pr.n_ab,
         x.n_i n_x, y.n_i n_y, nb.n_baskets
  FROM pr
  JOIN ni x ON pr.antecedent = x.br
  JOIN ni y ON pr.consequent = y.br
  CROSS JOIN nb)
SELECT antecedent, consequent, n_ab,
       round(CAST(n_ab AS DOUBLE) / CAST(n_baskets AS DOUBLE), 6)
         AS support,
       round(CAST(n_ab AS DOUBLE) / CAST(n_x AS DOUBLE), 6)
         AS confidence,
       round(CAST(n_ab * n_baskets AS DOUBLE)
             / CAST(n_x * n_y AS DOUBLE), 6) AS lift
FROM j
WHERE round(CAST(n_ab AS DOUBLE) / CAST(n_baskets AS DOUBLE), 6) >= 0.01
  AND round(CAST(n_ab AS DOUBLE) / CAST(n_x AS DOUBLE), 6) >= 0.1"""


def q_distinct_hll(spark, sf_dir):
    """HyperLogLog distinct-amount estimate per event type with the
    register sum exact: Σ 2^(-M_j) scaled by 2^53 into a pure BIGINT
    sum (order-invariant — the classic float register accumulation is
    not), ONE IEEE division by the α·m²·2^53 round-trip literal.
    No distinct() pre-pass (max is duplicate-insensitive) — compare
    distinct_kmv. Raw estimator only: the linear-counting small-range
    correction needs ln() and is documented out."""
    from llmaix_spark.operators.sketches import hll_distinct

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    return hll_distinct(e, ["event_type"], "cents")


SQL_DISTINCT_HLL = """
WITH b AS (
  SELECT event_type,
         ('0x' || substring(md5(CAST(CAST(round(value * 100, 0) AS BIGINT)
                                     AS VARCHAR)), 1, 15))::BIGINT h
  FROM events),
r AS (
  SELECT event_type, h >> 52 AS bucket,
         CASE WHEN (h & 4503599627370495) = 0 THEN 53
              ELSE 53 - length(bin(h & 4503599627370495)) END AS rnk
  FROM b),
m AS (SELECT event_type, bucket, max(rnk) mr FROM r GROUP BY 1, 2),
s AS (
  SELECT event_type,
         sum(CAST(1 AS BIGINT) << (53 - mr))
           + (256 - count(*)) * (CAST(1 AS BIGINT) << 53) AS srs
  FROM m GROUP BY 1),
x AS (
  SELECT event_type, CAST(count(DISTINCT h) AS BIGINT) n_exact
  FROM b GROUP BY 1),
est AS (
  SELECT x.event_type, x.n_exact,
         round(4.2399330249068963e+20 / CAST(s.srs AS DOUBLE), 4)
           AS hll_estimate
  FROM x JOIN s ON x.event_type = s.event_type)
SELECT event_type, n_exact, hll_estimate,
       round(abs(hll_estimate - n_exact) / n_exact, 6) AS rel_err
FROM est"""


def q_bm25_rank(spark, sf_dir):
    """BM25 keyword AND-search ('join' AND 'sort'), top-20: the
    length-normalized successor of search_rank's TF-IDF ranking.
    idf log10 pre-rounded at 6dp
    (the only transcendental), the length-normalization chain mirrored
    +,*,/-exact, per-term scores folded IN TERM ORDER (float addition
    only commutes pairwise), TakeOrderedAndProject cut."""
    from llmaix_spark.operators.textstats import bm25_rank

    return bm25_rank(
        _t(spark, sf_dir, "documents"), ["join", "sort"], top_k=20
    )


SQL_BM25_RANK = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                            x -> length(x) > 0)) AS term
  FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
st AS (SELECT CAST(count(*) AS BIGINT) n_docs,
              CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) avgdl
       FROM dl),
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        FROM tf WHERE term IN ('join', 'sort') GROUP BY 1),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(round(log10(CAST(1.0 AS DOUBLE)
                           + (CAST(st.n_docs AS DOUBLE)
                              - CAST(dfq.df AS DOUBLE) + 0.5)
                             / (CAST(dfq.df AS DOUBLE) + 0.5)), 6)
               * ((CAST(tf.tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
                  / (CAST(tf.tf AS DOUBLE)
                     + CAST(1.2 AS DOUBLE)
                       * (CAST(0.25 AS DOUBLE)
                          + CAST(0.75 AS DOUBLE)
                            * CAST(dl.dl AS DOUBLE) / st.avgdl))),
               6) AS tscore
  FROM tf
  JOIN dfq USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN st
  WHERE tf.term IN ('join', 'sort')),
hits AS (
  SELECT doc_id,
         round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                        list(tscore ORDER BY term)),
                           (a, x) -> a + x), 6) AS score
  FROM scored GROUP BY 1 HAVING count(*) = 2),
top AS (SELECT doc_id, score FROM hits
        ORDER BY score DESC, doc_id LIMIT 20)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
         AS rank,
       doc_id, score
FROM top"""


def q_seasonal_baseline(spark, sf_dir):
    """Seasonal-naive forecast backtest: per (event_type, hour-of-day)
    the first-3-weeks mean spend is the baseline; the remaining days
    are the holdout; emit baseline vs actual and the absolute error —
    the drift check a monitoring pipeline runs before trusting a
    seasonal profile. ALL integer: epoch-derived day/hour, floor-mean
    cents both sides, BIGINT error; the train/test split day rides a
    1-row broadcast. Output ≤ types×24 rows at any SF."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    e = e.select(
        "event_type",
        "cents",
        F.expr("us div 86400000000").alias("dayn"),
        F.expr("(us div 3600000000) % 24").cast("bigint").alias("hour"),
    )
    split = e.agg((F.min("dayn") + F.lit(21)).alias("split_day"))
    j = e.crossJoin(F.broadcast(split))
    train = (
        j.where(F.col("dayn") < F.col("split_day"))
        .groupBy("event_type", "hour")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_train"),
            F.expr("sum(cents) div count(*)")
            .cast("bigint")
            .alias("baseline_cents"),
        )
    )
    test = (
        j.where(F.col("dayn") >= F.col("split_day"))
        .groupBy("event_type", "hour")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.expr("sum(cents) div count(*)")
            .cast("bigint")
            .alias("actual_cents"),
        )
    )
    return train.join(test, ["event_type", "hour"]).select(
        "event_type",
        "hour",
        "n_train",
        "n_test",
        "baseline_cents",
        "actual_cents",
        F.abs(F.col("actual_cents") - F.col("baseline_cents"))
        .cast("bigint")
        .alias("abs_err_cents"),
    )


SQL_SEASONAL_BASELINE = """
WITH e AS (
  SELECT event_type,
         CAST(round(value * 100, 0) AS BIGINT) cents,
         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 dayn,
         CAST((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24
              AS BIGINT) hr
  FROM events),
sp AS (SELECT min(dayn) + 21 split_day FROM e),
tr AS (
  SELECT event_type, hr, CAST(count(*) AS BIGINT) n_train,
         CAST(sum(cents) // count(*) AS BIGINT) baseline_cents
  FROM e CROSS JOIN sp WHERE dayn < split_day GROUP BY 1, 2),
te AS (
  SELECT event_type, hr, CAST(count(*) AS BIGINT) n_test,
         CAST(sum(cents) // count(*) AS BIGINT) actual_cents
  FROM e CROSS JOIN sp WHERE dayn >= split_day GROUP BY 1, 2)
SELECT tr.event_type, tr.hr AS "hour", n_train, n_test,
       baseline_cents, actual_cents,
       CAST(abs(actual_cents - baseline_cents) AS BIGINT) AS abs_err_cents
FROM tr JOIN te ON tr.event_type = te.event_type AND tr.hr = te.hr"""


def q_conversion_wilson(spark, sf_dir):
    """Signup-cohort 7-day conversion rates with Wilson 95% score
    intervals — the small-sample-safe CI (not Wald). The entire
    interval formula is +,*,/ and ONE sqrt: all correctly-rounded
    IEEE ops on exact integer-derived doubles (z, z² as round-trip
    literals), mirrored parenthesization — bit-identical without any
    pre-rounding trick. Cohorting and the conversion gate are pure
    integer epoch arithmetic."""
    from llmaix_spark.operators.profile import wilson_bounds

    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    s0 = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("s0"))
    )
    w0 = s0.agg(
        F.expr("min(s0 div 86400000000)").alias("day0")
    )
    conv = (
        e.where(F.col("event_type") == "purchase")
        .join(s0, "user_id")
        .where(
            (F.col("us") >= F.col("s0"))
            & (F.col("us") - F.col("s0") <= F.lit(7 * 86_400_000_000))
        )
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1).cast("bigint"))
    )
    cohorts = (
        s0.join(conv, "user_id", "left")
        .crossJoin(F.broadcast(w0))
        .select(
            F.expr("((s0 div 86400000000) - day0) div 7")
            .cast("bigint")
            .alias("cohort_week"),
            F.coalesce(F.col("converted"), F.lit(0)).alias("c"),
        )
        .groupBy("cohort_week")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("c").cast("bigint").alias("n_converted"),
        )
    )
    wb = wilson_bounds("n_converted", "n_users")
    return cohorts.select(
        "cohort_week",
        "n_users",
        "n_converted",
        wb["p_hat"].alias("p_hat"),
        wb["wilson_low"].alias("wilson_low"),
        wb["wilson_high"].alias("wilson_high"),
    )


SQL_CONVERSION_WILSON = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) us
  FROM events),
s0 AS (
  SELECT user_id, min(us) s0 FROM e
  WHERE event_type = 'signup' GROUP BY 1),
w0 AS (SELECT min(s0 // 86400000000) day0 FROM s0),
conv AS (
  SELECT DISTINCT e.user_id
  FROM e JOIN s0 ON e.user_id = s0.user_id
  WHERE e.event_type = 'purchase' AND e.us >= s0.s0
    AND e.us - s0.s0 <= 604800000000),
coh AS (
  SELECT CAST(((s0.s0 // 86400000000) - w0.day0) // 7 AS BIGINT)
           AS cohort_week,
         CAST(count(*) AS BIGINT) n_users,
         CAST(count(conv.user_id) AS BIGINT) n_converted
  FROM s0 LEFT JOIN conv ON s0.user_id = conv.user_id CROSS JOIN w0
  GROUP BY 1)
SELECT cohort_week, n_users, n_converted,
       round(CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE), 6)
         AS p_hat,
       round(((CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE)
               + CAST(3.8415999999999997 AS DOUBLE)
                 / (CAST(2.0 AS DOUBLE) * CAST(n_users AS DOUBLE)))
              - CAST(1.96 AS DOUBLE)
                * sqrt((CAST(n_converted AS DOUBLE)
                        / CAST(n_users AS DOUBLE))
                       * (CAST(1.0 AS DOUBLE)
                          - CAST(n_converted AS DOUBLE)
                            / CAST(n_users AS DOUBLE))
                       / CAST(n_users AS DOUBLE)
                       + CAST(3.8415999999999997 AS DOUBLE)
                         / (CAST(4.0 AS DOUBLE)
                            * CAST(n_users AS DOUBLE)
                            * CAST(n_users AS DOUBLE))))
             / (CAST(1.0 AS DOUBLE)
                + CAST(3.8415999999999997 AS DOUBLE)
                  / CAST(n_users AS DOUBLE)), 6) AS wilson_low,
       round(((CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE)
               + CAST(3.8415999999999997 AS DOUBLE)
                 / (CAST(2.0 AS DOUBLE) * CAST(n_users AS DOUBLE)))
              + CAST(1.96 AS DOUBLE)
                * sqrt((CAST(n_converted AS DOUBLE)
                        / CAST(n_users AS DOUBLE))
                       * (CAST(1.0 AS DOUBLE)
                          - CAST(n_converted AS DOUBLE)
                            / CAST(n_users AS DOUBLE))
                       / CAST(n_users AS DOUBLE)
                       + CAST(3.8415999999999997 AS DOUBLE)
                         / (CAST(4.0 AS DOUBLE)
                            * CAST(n_users AS DOUBLE)
                            * CAST(n_users AS DOUBLE))))
             / (CAST(1.0 AS DOUBLE)
                + CAST(3.8415999999999997 AS DOUBLE)
                  / CAST(n_users AS DOUBLE)), 6) AS wilson_high
FROM coh"""


def q_trending_decay(spark, sf_dir):
    """Time-decayed brand popularity (half-life 1 day): each shipped
    lineitem contributes 2^(-age_days), summed EXACTLY as BIGINT
    2^(40-min(age,40)) — the dyadic-decay trick that turns the classic
    float decay accumulation into an order-invariant integer sum
    (same family as events_ewma). Rank over the exact integer score
    (no float enters the ordering); the display score is one IEEE
    division by 2^40. The rank window sees |brands| rows."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey"),
        F.expr(
            "unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000"
        ).alias("dayn"),
    )
    pt = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    mx = li.agg(F.max("dayn").alias("maxday"))
    scored = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .crossJoin(F.broadcast(mx))
        .select(
            F.col("p_brand").alias("brand"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), "
                "40 - CAST(least(maxday - dayn, 40) AS INT))"
            ).alias("w"),
        )
        .groupBy("brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum("w").cast("bigint").alias("s"),
        )
    )
    w = Window.orderBy(F.desc("s"), "brand")
    # single-partition window is fine HERE: |brands| rows
    return scored.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        "brand",
        "n_items",
        F.round(F.col("s").cast("double") / F.lit(float(1 << 40)), 6)
        .alias("decayed_score"),
    )


SQL_TRENDING_DECAY = """
WITH li AS (
  SELECT l_partkey,
         epoch_us(CAST(l_shipdate AS TIMESTAMP)) // 86400000000 dayn
  FROM lineitem),
mx AS (SELECT max(dayn) maxday FROM li),
sc AS (
  SELECT p.p_brand brand, CAST(count(*) AS BIGINT) n_items,
         CAST(sum(CAST(1 AS BIGINT)
                  << (40 - CAST(least(mx.maxday - li.dayn, 40) AS INT)))
              AS BIGINT) s
  FROM li JOIN part p ON li.l_partkey = p.p_partkey CROSS JOIN mx
  GROUP BY 1)
SELECT CAST(row_number() OVER (ORDER BY s DESC, brand) AS BIGINT) AS rank,
       brand, n_items,
       round(CAST(s AS DOUBLE) / 1099511627776.0, 6) AS decayed_score
FROM sc"""


def q_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value triangle: per (first-event-week cohort,
    week offset) the purchase revenue, active users, and the running
    LTV — the money twin of events_retention's count triangle. Pure
    integer epoch cohorting and exact BIGINT cents; the cumulative
    window is partitioned per cohort and ordered over the bounded
    week-offset axis (weeks in the observation window, not data
    size)."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000"
        ).alias("dayn"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    d0 = e.agg(F.min("dayn").alias("day0"))
    weeks = e.crossJoin(F.broadcast(d0)).select(
        "user_id",
        "event_type",
        "cents",
        F.expr("(dayn - day0) div 7").cast("bigint").alias("week"),
    )
    first = weeks.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    j = weeks.join(first, "user_id").select(
        "cohort_week",
        (F.col("week") - F.col("cohort_week")).alias("offset"),
        "user_id",
        F.when(F.col("event_type") == "purchase", F.col("cents"))
        .otherwise(F.lit(0))
        .alias("rev"),
    )
    cell = j.groupBy("cohort_week", "offset").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_active"),
        F.sum("rev").cast("bigint").alias("revenue_cents"),
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cell.select(
        "cohort_week",
        "offset",
        "n_active",
        "revenue_cents",
        F.sum("revenue_cents").over(w).cast("bigint").alias("ltv_cents"),
    )


SQL_COHORT_LTV = """
WITH e AS (
  SELECT user_id, event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 dayn,
         CAST(round(value * 100, 0) AS BIGINT) cents
  FROM events),
d0 AS (SELECT min(dayn) day0 FROM e),
wk AS (
  SELECT user_id, event_type, cents,
         CAST((dayn - day0) // 7 AS BIGINT) wnum
  FROM e CROSS JOIN d0),
fi AS (SELECT user_id, min(wnum) cohort_week FROM wk GROUP BY 1),
cell AS (
  SELECT fi.cohort_week, wk.wnum - fi.cohort_week AS "offset",
         CAST(count(DISTINCT wk.user_id) AS BIGINT) n_active,
         CAST(sum(CASE WHEN wk.event_type = 'purchase'
                       THEN wk.cents ELSE 0 END) AS BIGINT) revenue_cents
  FROM wk JOIN fi ON wk.user_id = fi.user_id
  GROUP BY 1, 2)
SELECT cohort_week, "offset", n_active, revenue_cents,
       CAST(sum(revenue_cents)
              OVER (PARTITION BY cohort_week ORDER BY "offset"
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS ltv_cents
FROM cell"""


# ---------------------------------------------------------------------------
# wave 7: interval algebra, FIFO allocation, concentration, spatial grid
# join, KG negative sampling, Benford audit


def q_interval_coverage(spark, sf_dir):
    """Per-user merged-interval coverage (the classic overlapping-
    interval union): each event spawns [us, us + dur) with a
    deterministic integer duration; overlapping intervals merge into
    islands via the running-max-of-end sweep, then per user we report
    island count, total covered time and overall span. All BIGINT.

    Plan shape: ONE Exchange on user_id + ONE Sort serves both windows
    (prev-running-max and island cumsum share the sort), and both
    downstream aggregates — groupBy(user, island) then groupBy(user) —
    are satisfied by the existing HashPartitioning(user), so no further
    shuffle. Island identity is order-invariant under start ties: a
    tied row can never open a new island (any prior tied interval's end
    >= its start), so the merged set is unique."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    e = e.select(
        "event_id",
        "user_id",
        "s",
        (
            F.col("s")
            + (F.abs(F.col("cents")) % 3600 + 1) * F.lit(1_000_000)
        ).alias("e"),
    )
    order = [F.col("s").asc(), F.col("e").asc(), F.col("event_id").asc()]
    wprev = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wcum = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = e.select(
        "user_id",
        "event_id",
        "s",
        "e",
        F.when(
            F.max("e").over(wprev).isNull()
            | (F.col("s") > F.max("e").over(wprev)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("newi"),
    ).select(
        "user_id", "s", "e", F.sum("newi").over(wcum).alias("island")
    )
    islands = flagged.groupBy("user_id", "island").agg(
        F.min("s").alias("ist"), F.max("e").alias("ien")
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum(F.col("ien") - F.col("ist")).cast("bigint").alias("covered_us"),
        (F.max("ien") - F.min("ist")).cast("bigint").alias("span_us"),
    )


SQL_INTERVAL_COVERAGE = """
WITH ev AS (
  SELECT event_id, user_id,
         epoch_us(CAST(ts AS TIMESTAMP)) s,
         CAST(round(value * 100, 0) AS BIGINT) cents
  FROM events),
iv AS (
  SELECT event_id, user_id, s,
         s + (abs(cents) % 3600 + 1) * 1000000 e
  FROM ev),
fl AS (
  SELECT user_id, s, e,
         CASE WHEN max(e) OVER (PARTITION BY user_id
                                ORDER BY s, e, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) IS NULL
                OR s > max(e) OVER (PARTITION BY user_id
                                    ORDER BY s, e, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING)
              THEN 1 ELSE 0 END newi
  FROM iv),
isl AS (
  SELECT user_id, s, e,
         sum(newi) OVER (PARTITION BY user_id ORDER BY s, e
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) island
  FROM fl),
grp AS (
  SELECT user_id, island, min(s) ist, max(e) ien
  FROM isl GROUP BY 1, 2)
SELECT user_id,
       CAST(count(*) AS BIGINT) n_intervals,
       CAST(sum(ien - ist) AS BIGINT) covered_us,
       CAST(max(ien) - min(ist) AS BIGINT) span_us
FROM grp GROUP BY 1"""


def q_fifo_allocation(spark, sf_dir):
    """FIFO lot allocation per part: the part's lineitems (ordered by
    ship date) are purchase lots; a demand of half the total quantity
    is consumed oldest-first; report lots touched, the boundary lot's
    ordinal and the exact allocated cost. The cumulative-before sum +
    clamp is the standard distributed FIFO matcher — no iteration.

    ALL integer: cents via the round(*100) recipe, per-lot allocated
    cost = (lot_cents * consumed) div qty (floor division on BIGINT is
    identical across engines for non-negative operands). One Exchange
    on l_partkey; row_number / cumulative-before / partition-total all
    ride the same Sort; the final groupBy(l_partkey) reuses the window
    partitioning so it adds no shuffle."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
    )
    order = [
        F.col("l_shipdate").asc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    ]
    word = Window.partitionBy("l_partkey").orderBy(*order)
    wbefore = word.rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.partitionBy("l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    lots = li.select(
        "l_partkey",
        "qty",
        "cents",
        F.row_number().over(word).alias("rn"),
        F.coalesce(F.sum("qty").over(wbefore), F.lit(0)).alias("cumb"),
        F.expr("sum(qty) OVER (PARTITION BY l_partkey) div 2").alias(
            "demand"
        ),
    ).select(
        "l_partkey",
        "qty",
        "cents",
        "rn",
        "demand",
        F.greatest(
            F.lit(0),
            F.least(F.col("qty"), F.col("demand") - F.col("cumb")),
        ).alias("consumed"),
    )
    return (
        lots.where(F.col("demand") > 0)
        .groupBy("l_partkey")
        .agg(
            F.max("demand").cast("bigint").alias("demand_qty"),
            F.sum(F.when(F.col("consumed") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("lots_used"),
            F.max(F.when(F.col("consumed") > 0, F.col("rn")))
            .cast("bigint")
            .alias("last_lot_rn"),
            F.sum(
                F.expr("(cents * consumed) div qty")
            )
            .cast("bigint")
            .alias("alloc_cost_cents"),
        )
    )


SQL_FIFO_ALLOCATION = """
WITH li AS (
  SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
         CAST(l_quantity AS BIGINT) qty,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) cents
  FROM lineitem),
lots AS (
  SELECT l_partkey, qty, cents,
         row_number() OVER w rn,
         COALESCE(sum(qty) OVER (PARTITION BY l_partkey
                                 ORDER BY l_shipdate, l_orderkey,
                                          l_linenumber
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING), 0) cumb,
         sum(qty) OVER (PARTITION BY l_partkey) // 2 demand
  FROM li
  WINDOW w AS (PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber)),
al AS (
  SELECT l_partkey, qty, cents, rn, demand,
         greatest(0, least(qty, demand - cumb)) consumed
  FROM lots)
SELECT l_partkey,
       CAST(max(demand) AS BIGINT) demand_qty,
       CAST(sum(CASE WHEN consumed > 0 THEN 1 ELSE 0 END)
            AS BIGINT) lots_used,
       CAST(max(CASE WHEN consumed > 0 THEN rn END)
            AS BIGINT) last_lot_rn,
       CAST(sum((cents * consumed) // qty) AS BIGINT) alloc_cost_cents
FROM al WHERE demand > 0 GROUP BY 1"""


def q_revenue_gini(spark, sf_dir):
    """Revenue concentration per nation: exact Gini coefficient over
    customer order revenue via the rank formula
    G = sum((2i - n - 1) * x_i) / (n * sum(x)) on cents sorted
    ascending. The numerator is summed as DECIMAL(38,0) (⇔ DuckDB
    HUGEINT — exact and order-invariant), the single division is one
    IEEE op on correctly-rounded decimal→double casts, rounded 6dp.
    Tie-safe: a block of equal x contributes x * sum(ranks) whichever
    order the tied rows take.

    Scale note: rank statistics need a per-nation sort; with few huge
    groups this is the one operator where a two-level histogram
    approximation (docs/SCALING.md) replaces the exact sort at 100 TB.
    """
    from pyspark.sql import Window

    rev = (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("o_custkey")
        .agg(F.sum("cents").cast("bigint").alias("cents"))
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per = (
        rev.join(
            F.broadcast(cust), rev.o_custkey == cust.c_custkey
        )
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .select("n_name", "o_custkey", "cents")
    )
    wrank = Window.partitionBy("n_name").orderBy(
        F.col("cents").asc(), F.col("o_custkey").asc()
    )
    wn = Window.partitionBy("n_name")
    ranked = per.select(
        "n_name",
        "cents",
        F.row_number().over(wrank).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    agg = ranked.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_custs"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.sum(
            (2 * F.col("rn") - F.col("n") - 1).cast("decimal(38,0)")
            * F.col("cents").cast("decimal(38,0)")
        ).alias("gnum"),
    )
    return agg.select(
        "n_name",
        "n_custs",
        "total_cents",
        F.round(
            F.col("gnum").cast("double")
            / (
                F.col("n_custs").cast("decimal(38,0)")
                * F.col("total_cents").cast("decimal(38,0)")
            ).cast("double"),
            6,
        ).alias("gini"),
    )


SQL_REVENUE_GINI = """
WITH rev AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) cents
  FROM orders GROUP BY 1),
per AS (
  SELECT n.n_name, r.o_custkey, r.cents
  FROM rev r
  JOIN customer c ON r.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey),
rk AS (
  SELECT n_name, cents,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY cents, o_custkey) rn,
         count(*) OVER (PARTITION BY n_name) n
  FROM per),
ag AS (
  SELECT n_name,
         CAST(count(*) AS BIGINT) n_custs,
         CAST(sum(cents) AS BIGINT) total_cents,
         sum(CAST(2 * rn - n - 1 AS HUGEINT) * CAST(cents AS HUGEINT))
           gnum
  FROM rk GROUP BY 1)
SELECT n_name, n_custs, total_cents,
       round(CAST(gnum AS DOUBLE)
             / CAST(CAST(n_custs AS HUGEINT)
                    * CAST(total_cents AS HUGEINT) AS DOUBLE), 6) gini
FROM ag"""


def q_geo_grid_join(spark, sf_dir):
    """Grid-bucketed spatial self-join: customers get deterministic
    fixed-point coordinates in a 1M×1M space (shared 60-bit hash), the
    space is cut into 50k×50k cells, and close pairs (squared Euclidean
    distance ≤ 30k², exact BIGINT) are found by replicating each LEFT
    point into its 3×3 neighbor cells and joining on the RIGHT point's
    single home cell — each pair matches at most once (one home cell),
    so no post-join dedup. This is the canonical scale recipe for a
    distance self-join: shuffle on the cell key with a bounded 9×
    replication of one side instead of an O(n²) cross join."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    from llmaix_spark.operators.linking import stable_hash60_expr

    pts = c.select(
        F.col("c_custkey").alias("k"),
        (
            stable_hash60_expr(
                F.concat(F.col("c_custkey").cast("string"), F.lit(":gx"))
            )
            % 1_000_000
        ).alias("x"),
        (
            stable_hash60_expr(
                F.concat(F.col("c_custkey").cast("string"), F.lit(":gy"))
            )
            % 1_000_000
        ).alias("y"),
    ).select(
        "k",
        "x",
        "y",
        F.expr("x div 50000").alias("cx"),
        F.expr("y div 50000").alias("cy"),
    )
    probes = (
        pts.select(
            "k",
            "x",
            "y",
            "cx",
            "cy",
            F.explode(
                F.array(F.lit(-1), F.lit(0), F.lit(1))
            ).alias("dx"),
        )
        .select(
            "k",
            "x",
            "y",
            "cx",
            "cy",
            "dx",
            F.explode(
                F.array(F.lit(-1), F.lit(0), F.lit(1))
            ).alias("dy"),
        )
        .select(
            F.col("k").alias("ak"),
            F.col("x").alias("ax"),
            F.col("y").alias("ay"),
            F.col("cx").alias("acx"),
            F.col("cy").alias("acy"),
            (F.col("cx") + F.col("dx")).alias("px"),
            (F.col("cy") + F.col("dy")).alias("py"),
        )
    )
    b = pts.select(
        F.col("k").alias("bk"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("cx").alias("pcx"),
        F.col("cy").alias("pcy"),
    )
    pairs = probes.join(
        b,
        (F.col("px") == F.col("pcx"))
        & (F.col("py") == F.col("pcy"))
        & (F.col("ak") < F.col("bk")),
    ).select(
        "acx",
        "acy",
        (
            (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
            + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
        ).alias("d2"),
    )
    return (
        pairs.where(F.col("d2") <= F.lit(900_000_000))
        .groupBy(F.col("acx").alias("cell_x"), F.col("acy").alias("cell_y"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.min("d2").cast("bigint").alias("min_dist2"),
            F.sum("d2").cast("bigint").alias("sum_dist2"),
        )
    )


SQL_GEO_GRID_JOIN = f"""
WITH pts AS (
  SELECT c_custkey k,
         {_HASH60_SQL.format(v="CAST(c_custkey AS VARCHAR) || ':gx'")}
           % 1000000 x,
         {_HASH60_SQL.format(v="CAST(c_custkey AS VARCHAR) || ':gy'")}
           % 1000000 y
  FROM customer),
cells AS (
  SELECT k, x, y, x // 50000 cx, y // 50000 cy FROM pts),
probes AS (
  SELECT k ak, x ax, y ay, cx acx, cy acy,
         cx + dx.d px, cy + dy.d py
  FROM cells,
       (SELECT unnest([-1, 0, 1]) d) dx,
       (SELECT unnest([-1, 0, 1]) d) dy),
pairs AS (
  SELECT p.acx, p.acy,
         (p.ax - b.x) * (p.ax - b.x)
           + (p.ay - b.y) * (p.ay - b.y) d2
  FROM probes p
  JOIN cells b ON p.px = b.cx AND p.py = b.cy AND p.ak < b.k)
SELECT acx AS cell_x, acy AS cell_y,
       CAST(count(*) AS BIGINT) n_pairs,
       CAST(min(d2) AS BIGINT) min_dist2,
       CAST(sum(d2) AS BIGINT) sum_dist2
FROM pairs WHERE d2 <= 900000000 GROUP BY 1, 2"""


def q_kg_negative_samples(spark, sf_dir):
    """Deterministic negative sampling for KG link-prediction training:
    positives are the distinct (customer, part) purchase edges; each
    positive spawns 2 corrupted-tail candidates via the shared 60-bit
    hash mapped onto the dense 1..max(p_partkey) id range (1-row
    broadcast for the max), and candidates that collide with ANY true
    edge of the same head are dropped by a left-anti join — the
    standard filtered-corruption sampler, with zero RNG state so the
    sample is reproducible across runs, engines and cluster layouts.
    Per head: positive degree, kept negatives and their checksum."""
    from llmaix_spark.operators.linking import stable_hash60_expr

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pos = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .distinct()
    )
    maxp = _t(spark, sf_dir, "part").agg(
        F.max("p_partkey").alias("maxp")
    )
    cand = (
        pos.select(
            "c",
            "p",
            F.explode(F.array(F.lit("1"), F.lit("2"))).alias("i"),
        )
        .crossJoin(F.broadcast(maxp))
        .select(
            "c",
            (
                1
                + stable_hash60_expr(
                    F.concat(
                        F.col("c").cast("string"),
                        F.lit(":"),
                        F.col("p").cast("string"),
                        F.lit(":"),
                        F.col("i"),
                        F.lit(":neg"),
                    )
                )
                % F.col("maxp")
            ).alias("cand"),
        )
    )
    pos2 = pos.select(F.col("c").alias("c2"), F.col("p").alias("p2"))
    kept = cand.join(
        pos2,
        (cand.c == pos2.c2) & (cand.cand == pos2.p2),
        "left_anti",
    )
    negs = kept.groupBy("c").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_neg"),
        F.sum("cand").cast("bigint").alias("neg_checksum"),
    )
    deg = pos.groupBy("c").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pos")
    )
    return (
        deg.join(negs, "c", "left")
        .select(
            F.col("c").alias("custkey"),
            "n_pos",
            F.coalesce(F.col("n_neg"), F.lit(0))
            .cast("bigint")
            .alias("n_neg"),
            F.coalesce(F.col("neg_checksum"), F.lit(0))
            .cast("bigint")
            .alias("neg_checksum"),
        )
    )


SQL_KG_NEGATIVE_SAMPLES = f"""
WITH pos AS (
  SELECT DISTINCT o.o_custkey c, l.l_partkey p
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
mx AS (SELECT max(p_partkey) maxp FROM part),
cand AS (
  SELECT pos.c,
         1 + {_HASH60_SQL.format(
             v="CAST(pos.c AS VARCHAR) || ':' || CAST(pos.p AS VARCHAR)"
               " || ':' || i.i || ':neg'"
         )} % mx.maxp cand
  FROM pos, (SELECT unnest(['1', '2']) i) i, mx),
kept AS (
  SELECT cand.c, cand.cand
  FROM cand ANTI JOIN pos ON cand.c = pos.c AND cand.cand = pos.p),
negs AS (
  SELECT c, CAST(count(*) AS BIGINT) n_neg,
         CAST(sum(cand) AS BIGINT) neg_checksum
  FROM kept GROUP BY 1),
deg AS (
  SELECT c, CAST(count(*) AS BIGINT) n_pos FROM pos GROUP BY 1)
SELECT deg.c AS custkey, deg.n_pos,
       CAST(COALESCE(negs.n_neg, 0) AS BIGINT) n_neg,
       CAST(COALESCE(negs.neg_checksum, 0) AS BIGINT) neg_checksum
FROM deg LEFT JOIN negs ON deg.c = negs.c"""


def _benford_case(col: str) -> str:
    """CASE mapping digit→log10(1+1/d) with round-trip literals shared
    verbatim by both engines (repr() of the exact double)."""
    import math

    arms = " ".join(
        f"WHEN {d} THEN CAST({math.log10(1.0 + 1.0 / d)!r} AS DOUBLE)"
        for d in range(1, 10)
    )
    return f"CASE {col} {arms} END"


def q_benford_digits(spark, sf_dir):
    """Benford first-digit audit over order totals: observed counts per
    leading digit vs the Benford expectation log10(1+1/d), with the
    per-digit chi-square contribution. Counts are exact integers; the
    9 expected proportions ride round-trip literals; exp_n / obs_p /
    chi2 are mirrored-parenthesization IEEE chains rounded 6dp. The
    digit extraction is string-based (first char of the cents integer)
    — identical across engines, no log/pow. 9 output rows; the total
    rides a 1-row broadcast."""
    o = _t(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("bigint")
        .alias("cents")
    )
    o = o.where(F.col("cents") > 0).select(
        F.substring(F.col("cents").cast("string"), 1, 1)
        .cast("bigint")
        .alias("digit")
    )
    byd = o.groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs")
    )
    tot = o.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    j = byd.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n_obs",
        F.expr(_benford_case("digit")).alias("p"),
        F.col("n_obs").cast("double").alias("od"),
        F.col("n").cast("double").alias("nd"),
    )
    return j.select(
        "digit",
        "n_obs",
        F.round(F.col("od") / F.col("nd"), 6).alias("obs_p"),
        F.round("p", 6).alias("exp_p"),
        F.round(
            (
                (F.col("od") - F.col("nd") * F.col("p"))
                * (F.col("od") - F.col("nd") * F.col("p"))
            )
            / (F.col("nd") * F.col("p")),
            6,
        ).alias("chi2_term"),
    )


SQL_BENFORD_DIGITS = f"""
WITH c AS (
  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) cents FROM orders),
d AS (
  SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) digit
  FROM c WHERE cents > 0),
byd AS (
  SELECT digit, CAST(count(*) AS BIGINT) n_obs FROM d GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) n FROM d),
j AS (
  SELECT digit, n_obs,
         {_benford_case("digit")} p,
         CAST(n_obs AS DOUBLE) od, CAST(n AS DOUBLE) nd
  FROM byd CROSS JOIN tot)
SELECT digit, n_obs,
       round(od / nd, 6) obs_p,
       round(p, 6) exp_p,
       round(((od - nd * p) * (od - nd * p)) / (nd * p), 6) chi2_term
FROM j"""


# ---------------------------------------------------------------------------
# wave 8: apportionment, densification, rank migration, skyline,
# quantile normalization, cumulative novelty


def q_apportionment_seats(spark, sf_dir):
    """Largest-remainder (Hamilton) apportionment: 100 seats split
    across nations proportionally to customer count — floor quotas
    first, then one extra seat to the largest remainders (ties broken
    by name). ALL integer: quota = cnt*S div tot, remainder = the exact
    modulo, so there is no float quota to diverge. The two global
    scalars (total, leftover seats) ride 1-row broadcasts; the
    remainder rank is a window over #nations rows — tiny by
    construction (one row per group key), never per-fact-row."""
    from pyspark.sql import Window

    S = 100
    cust = _t(spark, sf_dir, "customer").select("c_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cnt = (
        cust.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_custs"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "n_custs")
    )
    tot = cnt.agg(F.sum("n_custs").alias("tot"))
    q = cnt.crossJoin(F.broadcast(tot)).select(
        "n_name",
        "n_custs",
        F.expr(f"(n_custs * {S}) div tot").alias("base_seats"),
        F.expr(f"(n_custs * {S}) % tot").alias("rem"),
    )
    leftover = q.agg((F.lit(S) - F.sum("base_seats")).alias("r"))
    wrank = Window.orderBy(F.col("rem").desc(), F.col("n_name").asc())
    return (
        q.crossJoin(F.broadcast(leftover))
        .select(
            "n_name",
            "n_custs",
            F.col("base_seats").cast("bigint").alias("base_seats"),
            F.when(F.row_number().over(wrank) <= F.col("r"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("extra"),
        )
        .select(
            "n_name",
            "n_custs",
            "base_seats",
            "extra",
            (F.col("base_seats") + F.col("extra"))
            .cast("bigint")
            .alias("seats"),
        )
    )


SQL_APPORTIONMENT_SEATS = """
WITH cnt AS (
  SELECT n.n_name, CAST(count(*) AS BIGINT) n_custs
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1),
tot AS (SELECT sum(n_custs) tot FROM cnt),
q AS (
  SELECT n_name, n_custs,
         (n_custs * 100) // tot base_seats,
         (n_custs * 100) % tot rem
  FROM cnt CROSS JOIN tot),
lv AS (SELECT 100 - sum(base_seats) r FROM q),
rk AS (
  SELECT n_name, n_custs, base_seats, rem,
         row_number() OVER (ORDER BY rem DESC, n_name) rn
  FROM q)
SELECT n_name, n_custs,
       CAST(base_seats AS BIGINT) base_seats,
       CAST(CASE WHEN rn <= lv.r THEN 1 ELSE 0 END AS BIGINT) extra,
       CAST(base_seats + CASE WHEN rn <= lv.r THEN 1 ELSE 0 END
            AS BIGINT) seats
FROM rk CROSS JOIN lv"""


def q_gap_fill_daily(spark, sf_dir):
    """Time-series densification: build the full day spine
    (sequence(min_day, max_day) exploded × distinct event types), left
    join the actual daily rollups, and report per type the calendar
    length, missing-day count and the LONGEST consecutive missing run
    (day − row_number islands over the missing spine rows) — the
    gap-filling operator every downstream forecasting job needs. All
    BIGINT. The spine bounds ride a 1-row broadcast; spine size is
    #days × #types regardless of fact-row count, so densification cost
    is independent of data scale."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "unix_micros(cast(ts as timestamp)) div 86400000000"
        ).alias("dayn"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    daily = e.groupBy("event_type", "dayn").agg(
        F.sum("cents").alias("day_cents")
    )
    mm = e.agg(
        F.min("dayn").alias("mind"), F.max("dayn").alias("maxd")
    )
    types = e.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(mm)).select(
        "event_type",
        F.explode(F.sequence(F.col("mind"), F.col("maxd"))).alias("dayn"),
    )
    full = spine.join(daily, ["event_type", "dayn"], "left").select(
        "event_type",
        "dayn",
        F.coalesce(F.col("day_cents"), F.lit(0)).alias("day_cents"),
        F.when(F.col("day_cents").isNull(), 1).otherwise(0).alias("miss"),
    )
    wrun = Window.partitionBy("event_type").orderBy("dayn")
    runs = (
        full.where(F.col("miss") == 1)
        .select(
            "event_type",
            (F.col("dayn") - F.row_number().over(wrun)).alias("island"),
        )
        .groupBy("event_type", "island")
        .agg(F.count(F.lit(1)).alias("run"))
        .groupBy("event_type")
        .agg(F.max("run").cast("bigint").alias("max_missing_run"))
    )
    base = full.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("miss").cast("bigint").alias("missing_days"),
        F.sum("day_cents").cast("bigint").alias("total_cents"),
    )
    return base.join(runs, "event_type", "left").select(
        "event_type",
        "n_days",
        "missing_days",
        F.coalesce(F.col("max_missing_run"), F.lit(0))
        .cast("bigint")
        .alias("max_missing_run"),
        "total_cents",
    )


SQL_GAP_FILL_DAILY = """
WITH e AS (
  SELECT event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 dayn,
         CAST(round(value * 100, 0) AS BIGINT) cents
  FROM events),
daily AS (
  SELECT event_type, dayn, sum(cents) day_cents FROM e GROUP BY 1, 2),
mm AS (SELECT min(dayn) mind, max(dayn) maxd FROM e),
ty AS (SELECT DISTINCT event_type FROM e),
spine AS (
  SELECT ty.event_type, gs.d dayn
  FROM ty CROSS JOIN mm
  CROSS JOIN LATERAL (SELECT unnest(generate_series(mm.mind, mm.maxd)) d) gs),
full_g AS (
  SELECT s.event_type, s.dayn,
         COALESCE(d.day_cents, 0) day_cents,
         CASE WHEN d.day_cents IS NULL THEN 1 ELSE 0 END miss
  FROM spine s LEFT JOIN daily d
    ON s.event_type = d.event_type AND s.dayn = d.dayn),
runs AS (
  SELECT event_type, max(run) max_missing_run FROM (
    SELECT event_type, island, count(*) run FROM (
      SELECT event_type,
             dayn - row_number() OVER (PARTITION BY event_type
                                       ORDER BY dayn) island
      FROM full_g WHERE miss = 1) i
    GROUP BY 1, 2) r
  GROUP BY 1),
base AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) n_days,
         CAST(sum(miss) AS BIGINT) missing_days,
         CAST(sum(day_cents) AS BIGINT) total_cents
  FROM full_g GROUP BY 1)
SELECT b.event_type, b.n_days, b.missing_days,
       CAST(COALESCE(r.max_missing_run, 0) AS BIGINT) max_missing_run,
       b.total_cents
FROM base b LEFT JOIN runs r ON b.event_type = r.event_type"""


def q_rank_migration(spark, sf_dir):
    """Decile rank-migration matrix: customers are decile-ranked by
    order revenue in the first and second half of the calendar
    (midpoint from a 1-row broadcast), and the matrix counts customers
    per (decile_h1, decile_h2) — the churn/upsell mobility table.
    ntile(10) over the total (cents, custkey) order is identical in
    both engines (first n%10 buckets take the extra row). ≤100 output
    rows.

    Scale note: ntile needs a global sort per half; at 100 TB the
    decile BOUNDARIES would come from an equi-depth histogram broadcast
    instead (docs/SCALING.md) — the matrix itself is unchanged."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
        ).alias("dayn"),
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
    )
    mm = o.agg(
        (
            F.min("dayn")
            + F.expr("(max(dayn) - min(dayn)) div 2")
        ).alias("mid")
    )
    halves = o.crossJoin(F.broadcast(mm)).select(
        "o_custkey",
        "cents",
        F.when(F.col("dayn") <= F.col("mid"), F.lit(1))
        .otherwise(F.lit(2))
        .alias("half"),
    )
    rev = halves.groupBy("half", "o_custkey").agg(
        F.sum("cents").alias("cents")
    )
    wd = Window.partitionBy("half").orderBy(
        F.col("cents").asc(), F.col("o_custkey").asc()
    )
    dec = rev.select(
        "half", "o_custkey", F.ntile(10).over(wd).alias("decile")
    )
    h1 = dec.where(F.col("half") == 1).select(
        "o_custkey", F.col("decile").alias("decile_h1")
    )
    h2 = dec.where(F.col("half") == 2).select(
        "o_custkey", F.col("decile").alias("decile_h2")
    )
    return (
        h1.join(h2, "o_custkey")
        .groupBy("decile_h1", "decile_h2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
        .select(
            F.col("decile_h1").cast("bigint").alias("decile_h1"),
            F.col("decile_h2").cast("bigint").alias("decile_h2"),
            "n_customers",
        )
    )


SQL_RANK_MIGRATION = """
WITH o AS (
  SELECT o_custkey,
         epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 dayn,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) cents
  FROM orders),
mm AS (SELECT min(dayn) + (max(dayn) - min(dayn)) // 2 mid FROM o),
hv AS (
  SELECT o_custkey, cents,
         CASE WHEN dayn <= mid THEN 1 ELSE 2 END half
  FROM o CROSS JOIN mm),
rev AS (
  SELECT half, o_custkey, sum(cents) cents FROM hv GROUP BY 1, 2),
dec AS (
  SELECT half, o_custkey,
         ntile(10) OVER (PARTITION BY half
                         ORDER BY cents, o_custkey) decile
  FROM rev)
SELECT CAST(h1.decile AS BIGINT) decile_h1,
       CAST(h2.decile AS BIGINT) decile_h2,
       CAST(count(*) AS BIGINT) n_customers
FROM dec h1 JOIN dec h2
  ON h1.o_custkey = h2.o_custkey AND h1.half = 1 AND h2.half = 2
GROUP BY 1, 2"""


def q_skyline_parts(spark, sf_dir):
    """2-D Pareto frontier (skyline) of parts on (price ↓ better,
    size ↑ better) under strict-strict dominance: a part is dominated
    iff some part is BOTH strictly cheaper AND strictly larger. Scale
    shape: never a global window — parts are bucketed into price slabs;
    the intra-slab strictly-cheaper running max uses a RANGE frame
    (identical semantics both engines), the cross-slab prefix max runs
    over the tiny slab-summary table only. All integer comparisons."""
    from pyspark.sql import Window

    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100, 0)
        .cast("bigint")
        .alias("price_cents"),
        F.col("p_size").cast("bigint").alias("size"),
    )
    p = p.withColumn("slab", F.expr("price_cents div 10000"))
    win = (
        Window.partitionBy("slab")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    intra = p.select(
        "p_partkey",
        "price_cents",
        "size",
        "slab",
        F.coalesce(F.max("size").over(win), F.lit(-1)).alias("m_in"),
    )
    slabs = p.groupBy("slab").agg(F.max("size").alias("smax"))
    wprev = Window.orderBy("slab").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev = slabs.select(
        "slab",
        F.coalesce(F.max("smax").over(wprev), F.lit(-1)).alias("m_prev"),
    )
    return (
        intra.join(F.broadcast(prev), "slab")
        .where(
            (F.col("m_in") <= F.col("size"))
            & (F.col("m_prev") <= F.col("size"))
        )
        .select(
            "p_partkey",
            "price_cents",
            F.col("size").alias("p_size"),
        )
    )


SQL_SKYLINE_PARTS = """
WITH p AS (
  SELECT p_partkey,
         CAST(round(p_retailprice * 100, 0) AS BIGINT) price_cents,
         CAST(p_size AS BIGINT) sz
  FROM part)
SELECT a.p_partkey, a.price_cents, a.sz AS p_size
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.price_cents < a.price_cents AND b.sz > a.sz)"""


def q_quantile_normalize(spark, sf_dir):
    """Quantile normalization of account balances across market
    segments: each balance is replaced by the GLOBAL distribution's
    value at the proportional rank (target = ceil(rank·N/n_g), pure
    integer), making every segment's distribution identical — the
    microarray-style feature-normalization preprocessing step. Exact
    integer ranks and cents; per-segment checksums out.

    Scale note: the reference ranking is a global sort; at 100 TB the
    mapping table would be an equi-depth quantile sketch broadcast
    (docs/SCALING.md); the per-segment rank stays a partitioned
    window."""
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("cents"),
    )
    wg = Window.orderBy(F.col("cents").asc(), F.col("c_custkey").asc())
    glob = c.select(
        F.row_number().over(wg).alias("gr"),
        F.col("cents").alias("norm_cents"),
    )
    n_tot = c.agg(F.count(F.lit(1)).alias("n"))
    ws = Window.partitionBy("c_mktsegment").orderBy(
        F.col("cents").asc(), F.col("c_custkey").asc()
    )
    wsn = Window.partitionBy("c_mktsegment")
    ranked = c.select(
        "c_mktsegment",
        F.row_number().over(ws).alias("rn"),
        F.count(F.lit(1)).over(wsn).alias("ng"),
    ).crossJoin(F.broadcast(n_tot)).select(
        "c_mktsegment",
        F.expr("(rn * n + ng - 1) div ng").alias("target"),
    )
    return (
        ranked.join(glob, ranked.target == glob.gr)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("norm_cents").cast("bigint").alias("sum_norm_cents"),
            F.min("norm_cents").cast("bigint").alias("min_norm_cents"),
            F.max("norm_cents").cast("bigint").alias("max_norm_cents"),
        )
    )


SQL_QUANTILE_NORMALIZE = """
WITH c AS (
  SELECT c_custkey, c_mktsegment,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) cents
  FROM customer),
gall AS (
  SELECT row_number() OVER (ORDER BY cents, c_custkey) gr,
         cents norm_cents
  FROM c),
nt AS (SELECT count(*) n FROM c),
rk AS (
  SELECT c_mktsegment,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY cents, c_custkey) rn,
         count(*) OVER (PARTITION BY c_mktsegment) ng
  FROM c),
tg AS (
  SELECT c_mktsegment, (rn * n + ng - 1) // ng target
  FROM rk CROSS JOIN nt)
SELECT t.c_mktsegment,
       CAST(count(*) AS BIGINT) n_rows,
       CAST(sum(g.norm_cents) AS BIGINT) sum_norm_cents,
       CAST(min(g.norm_cents) AS BIGINT) min_norm_cents,
       CAST(max(g.norm_cents) AS BIGINT) max_norm_cents
FROM tg t JOIN gall g ON t.target = g.gr
GROUP BY 1"""


def q_events_novelty(spark, sf_dir):
    """Cumulative-novelty profile per user: when did the user's
    repertoire stop growing? Per (user, event_type) take the first-seen
    day, then per user report the distinct-type count and the day the
    repertoire reached half its final size (the half-th smallest
    first-seen day, ties broken by type name). Two exchanges by
    construction — (user,type) first-seen rollup, then the per-user
    rank — both map-side combinable / single-pass."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr(
            "unix_micros(cast(ts as timestamp)) div 86400000000"
        ).alias("dayn"),
    )
    fs = e.groupBy("user_id", "event_type").agg(
        F.min("dayn").alias("first_day")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("first_day").asc(), F.col("event_type").asc()
    )
    wn = Window.partitionBy("user_id")
    ranked = fs.select(
        "user_id",
        "first_day",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("nt"),
    )
    return ranked.where(
        F.col("rn") == F.expr("(nt + 1) div 2")
    ).select(
        "user_id",
        F.col("nt").cast("bigint").alias("distinct_types"),
        F.col("rn").cast("bigint").alias("half_rank"),
        F.col("first_day").cast("bigint").alias("half_day"),
    )


SQL_EVENTS_NOVELTY = """
WITH e AS (
  SELECT user_id, event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 dayn
  FROM events),
fs AS (
  SELECT user_id, event_type, min(dayn) first_day
  FROM e GROUP BY 1, 2),
rk AS (
  SELECT user_id, first_day,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY first_day, event_type) rn,
         count(*) OVER (PARTITION BY user_id) nt
  FROM fs)
SELECT user_id,
       CAST(nt AS BIGINT) distinct_types,
       CAST(rn AS BIGINT) half_rank,
       CAST(first_day AS BIGINT) half_day
FROM rk WHERE rn = (nt + 1) // 2"""


# ---------------------------------------------------------------------------
# wave 9: blocking quality, annotator agreement, encoding planner,
# spatial density clusters, readability, conversion latency


def q_blocking_metrics(spark, sf_dir):
    """Blocking-quality evaluation of the MinHash-LSH dedup blocker:
    reduction ratio (how many of the n·(n-1)/2 possible pairs the
    blocker avoids scoring) and pair completeness (what fraction of
    the TRUE ≥0.5-jaccard pairs survive blocking + verification) —
    the two standard entity-resolution blocking metrics. Truth is the
    exhaustive shingle-share jaccard join (complete: disjoint-shingle
    pairs have J=0); candidates/found reuse the production b=8/r=2
    LSH. One output row; the four counters are 1-row aggregates
    combined by broadcast cross joins."""
    docs = _t(spark, sf_dir, "documents")
    truth = dd.ngram_jaccard_pairs(docs, 0.5)
    found = dd.minhash_dedup_pairs(docs, 0.5)
    cand = dd.lsh_candidate_pairs(docs)
    nd = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    tp = truth.agg(
        F.count(F.lit(1)).cast("bigint").alias("truth_pairs")
    )
    cp = cand.agg(F.count(F.lit(1)).cast("bigint").alias("cand_pairs"))
    fp = found.agg(
        F.count(F.lit(1)).cast("bigint").alias("found_pairs")
    )
    one = (
        nd.crossJoin(F.broadcast(tp))
        .crossJoin(F.broadcast(cp))
        .crossJoin(F.broadcast(fp))
        .withColumn(
            "total_pairs",
            F.expr("(n_docs * (n_docs - 1)) div 2").cast("bigint"),
        )
    )
    return one.select(
        "n_docs",
        "total_pairs",
        "truth_pairs",
        "cand_pairs",
        "found_pairs",
        F.round(
            F.lit(1.0)
            - F.col("cand_pairs").cast("double")
            / F.col("total_pairs").cast("double"),
            6,
        ).alias("reduction_ratio"),
        F.when(F.col("truth_pairs") == 0, F.lit(1.0))
        .otherwise(
            F.round(
                F.col("found_pairs").cast("double")
                / F.col("truth_pairs").cast("double"),
                6,
            )
        )
        .alias("pair_completeness"),
    )


SQL_BLOCKING_METRICS = f"""
WITH {_minhash_pairs_ctes()},
tcommon AS (
  SELECT a.doc_id da, b.doc_id db, count(*) c FROM sh a
  JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
truth AS (
  SELECT da, db
  FROM tcommon JOIN cnt na ON da = na.doc_id
               JOIN cnt nb ON db = nb.doc_id
  WHERE c * 1.0 / (na.n + nb.n - c) >= 0.5),
nd AS (SELECT CAST(count(*) AS BIGINT) n_docs FROM documents),
tc AS (SELECT CAST(count(*) AS BIGINT) truth_pairs FROM truth),
cc AS (SELECT CAST(count(*) AS BIGINT) cand_pairs FROM cand),
fc AS (SELECT CAST(count(*) AS BIGINT) found_pairs FROM mh_pairs),
j AS (
  SELECT n_docs, truth_pairs, cand_pairs, found_pairs,
         CAST((n_docs * (n_docs - 1)) // 2 AS BIGINT) total_pairs
  FROM nd, tc, cc, fc)
SELECT n_docs, total_pairs, truth_pairs, cand_pairs, found_pairs,
       round(1.0 - CAST(cand_pairs AS DOUBLE)
                   / CAST(total_pairs AS DOUBLE), 6) reduction_ratio,
       CASE WHEN truth_pairs = 0 THEN 1.0
            ELSE round(CAST(found_pairs AS DOUBLE)
                       / CAST(truth_pairs AS DOUBLE), 6)
       END pair_completeness
FROM j"""


def q_annotator_kappa(spark, sf_dir):
    """Cohen's kappa between the stored language label and the n-gram
    language-ID heuristic — chance-corrected inter-annotator agreement,
    the metric an annotation-QA pipeline gates on. Observed agreement
    and the marginal-product sum are EXACT integers (the class-marginal
    table is a full outer join on class, group-count sized); po, pe and
    kappa are mirrored IEEE chains on the raw (unrounded) quotients —
    the rounded-intermediate landmine from group_ols applies here too.
    One output row."""
    d = _t(spark, sf_dir, "documents").select(
        F.col("lang").alias("gt"),
        ts.lang_id_expr(F.col("text")).alias("pred"),
    )
    base = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("gt") == F.col("pred"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_agree"),
    )
    gtc = d.groupBy("gt").agg(F.count(F.lit(1)).alias("n_gt"))
    prc = d.groupBy("pred").agg(F.count(F.lit(1)).alias("n_pred"))
    marg = (
        gtc.join(prc, gtc.gt == prc.pred, "full")
        .select(
            (
                F.coalesce(F.col("n_gt"), F.lit(0))
                * F.coalesce(F.col("n_pred"), F.lit(0))
            ).alias("prod")
        )
        .agg(F.sum("prod").cast("bigint").alias("marg_sum"))
    )
    j = base.crossJoin(F.broadcast(marg)).select(
        "n_docs",
        "n_agree",
        "marg_sum",
        F.col("n_agree").cast("double").alias("ad"),
        F.col("n_docs").cast("double").alias("nd"),
        F.col("marg_sum").cast("double").alias("sd"),
    )
    po = F.col("ad") / F.col("nd")
    pe = F.col("sd") / (F.col("nd") * F.col("nd"))
    return j.select(
        "n_docs",
        "n_agree",
        "marg_sum",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / (F.lit(1.0) - pe), 6).alias("kappa"),
    )


SQL_ANNOTATOR_KAPPA = f"""
WITH d AS (
  SELECT lang gt, {_lang_id_sql()} pred FROM documents),
base AS (
  SELECT CAST(count(*) AS BIGINT) n_docs,
         CAST(sum(CASE WHEN gt = pred THEN 1 ELSE 0 END)
              AS BIGINT) n_agree
  FROM d),
gtc AS (SELECT gt, count(*) n_gt FROM d GROUP BY 1),
prc AS (SELECT pred, count(*) n_pred FROM d GROUP BY 1),
marg AS (
  SELECT CAST(sum(COALESCE(n_gt, 0) * COALESCE(n_pred, 0))
              AS BIGINT) marg_sum
  FROM gtc FULL JOIN prc ON gtc.gt = prc.pred),
j AS (
  SELECT n_docs, n_agree, marg_sum,
         CAST(n_agree AS DOUBLE) ad,
         CAST(n_docs AS DOUBLE) nd,
         CAST(marg_sum AS DOUBLE) sd
  FROM base CROSS JOIN marg)
SELECT n_docs, n_agree, marg_sum,
       round(ad / nd, 6) po,
       round(sd / (nd * nd), 6) pe,
       round(((ad / nd) - (sd / (nd * nd)))
             / (1.0 - (sd / (nd * nd))), 6) kappa
FROM j"""


def q_encoding_planner(spark, sf_dir):
    """Column-encoding advisor (the lakehouse write-path planner): per
    column, estimate plain-encoding bytes (sum of value lengths) vs
    dictionary-encoding bytes (distinct-value lengths + n·index_width,
    width = 1/2/4 by dictionary size) and pick the cheaper encoding.
    ALL integer; one stacked scan (UNION of per-column projections)
    then a two-level aggregate — value-grain first (so distinct sums
    are map-side combinable), column-grain second."""
    e = _t(spark, sf_dir, "events")
    parts = [
        e.select(
            F.lit(c).alias("column_name"),
            F.coalesce(F.col(c).cast("string"), F.lit("")).alias("v"),
        )
        for c in ("event_type", "props", "user_id")
    ]
    stacked = parts[0].unionAll(parts[1]).unionAll(parts[2])
    per_val = stacked.groupBy("column_name", "v").agg(
        F.count(F.lit(1)).alias("c")
    )
    agg = per_val.groupBy("column_name").agg(
        F.sum("c").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(F.length("v") * F.col("c")).cast("bigint").alias("plain_bytes"),
        F.sum(F.length("v")).cast("bigint").alias("dict_data_bytes"),
    )
    idx_w = (
        F.when(F.col("n_distinct") <= 256, 1)
        .when(F.col("n_distinct") <= 65536, 2)
        .otherwise(4)
    )
    return agg.select(
        "column_name",
        "n_rows",
        "n_distinct",
        "plain_bytes",
        (F.col("dict_data_bytes") + F.col("n_rows") * idx_w)
        .cast("bigint")
        .alias("dict_bytes"),
        F.when(
            F.col("dict_data_bytes") + F.col("n_rows") * idx_w
            < F.col("plain_bytes"),
            F.lit("dict"),
        )
        .otherwise(F.lit("plain"))
        .alias("encoding"),
    )


SQL_ENCODING_PLANNER = """
WITH stacked AS (
  SELECT 'event_type' column_name,
         COALESCE(CAST(event_type AS VARCHAR), '') v FROM events
  UNION ALL
  SELECT 'props', COALESCE(CAST(props AS VARCHAR), '') FROM events
  UNION ALL
  SELECT 'user_id', COALESCE(CAST(user_id AS VARCHAR), '') FROM events),
per_val AS (
  SELECT column_name, v, count(*) c FROM stacked GROUP BY 1, 2),
ag AS (
  SELECT column_name,
         CAST(sum(c) AS BIGINT) n_rows,
         CAST(count(*) AS BIGINT) n_distinct,
         CAST(sum(length(v) * c) AS BIGINT) plain_bytes,
         CAST(sum(length(v)) AS BIGINT) dict_data_bytes
  FROM per_val GROUP BY 1),
w AS (
  SELECT *,
         CASE WHEN n_distinct <= 256 THEN 1
              WHEN n_distinct <= 65536 THEN 2 ELSE 4 END idx_w
  FROM ag)
SELECT column_name, n_rows, n_distinct, plain_bytes,
       CAST(dict_data_bytes + n_rows * idx_w AS BIGINT) dict_bytes,
       CASE WHEN dict_data_bytes + n_rows * idx_w < plain_bytes
            THEN 'dict' ELSE 'plain' END AS "encoding"
FROM w"""


def q_spatial_clusters(spark, sf_dir):
    """Grid-density clustering (DBSCAN-lite): customers' deterministic
    fixed-point coordinates are bucketed into 50k-cells; cells with ≥6
    points are dense; clusters are connected components of the dense
    cells under 8-adjacency. Reuses the size-adaptive CC operator (the
    canonicalization machinery) on cell-id nodes; isolated dense cells
    keep themselves as cluster. Oracle: DuckDB recursive-CTE min-label
    fixpoint seeded from ALL dense cells. Cluster id = lexicographic
    min cell id."""
    from llmaix_spark.operators.canonicalize import connected_components
    from llmaix_spark.operators.linking import stable_hash60_expr

    c = _t(spark, sf_dir, "customer").select("c_custkey")
    pts = c.select(
        (
            stable_hash60_expr(
                F.concat(F.col("c_custkey").cast("string"), F.lit(":gx"))
            )
            % 1_000_000
        ).alias("x"),
        (
            stable_hash60_expr(
                F.concat(F.col("c_custkey").cast("string"), F.lit(":gy"))
            )
            % 1_000_000
        ).alias("y"),
    )
    cells = (
        pts.select(
            F.expr("x div 50000").alias("cx"),
            F.expr("y div 50000").alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("np"))
        .where(F.col("np") >= 6)
        .withColumn(
            "node",
            F.concat(
                F.col("cx").cast("string"),
                F.lit(":"),
                F.col("cy").cast("string"),
            ),
        )
    )
    a = cells.select(
        F.col("node").alias("na"), F.col("cx").alias("ax"),
        F.col("cy").alias("ay"),
    )
    b = cells.select(
        F.col("node").alias("nb"), F.col("cx").alias("bx"),
        F.col("cy").alias("by"),
    )
    edges = a.join(
        b,
        (F.abs(F.col("ax") - F.col("bx")) <= 1)
        & (F.abs(F.col("ay") - F.col("by")) <= 1)
        & (F.col("na") < F.col("nb")),
    ).select(F.col("na").alias("norm_a"), F.col("nb").alias("norm_b"))
    cc = connected_components(edges)
    assigned = cells.join(
        cc, cells.node == cc.norm, "left"
    ).select(
        F.coalesce(F.col("component"), F.col("node")).alias("cluster_id"),
        "np",
    )
    return assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("np").cast("bigint").alias("n_points"),
    )


SQL_SPATIAL_CLUSTERS = f"""
WITH RECURSIVE pts AS (
  SELECT {_HASH60_SQL.format(v="CAST(c_custkey AS VARCHAR) || ':gx'")}
           % 1000000 x,
         {_HASH60_SQL.format(v="CAST(c_custkey AS VARCHAR) || ':gy'")}
           % 1000000 y
  FROM customer),
cells AS (
  SELECT cx, cy,
         CAST(cx AS VARCHAR) || ':' || CAST(cy AS VARCHAR) node,
         count(*) np
  FROM (SELECT x // 50000 cx, y // 50000 cy FROM pts) g
  GROUP BY 1, 2, 3 HAVING count(*) >= 6),
e0 AS (
  SELECT a.node na, b.node nb
  FROM cells a JOIN cells b
    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
   AND a.node < b.node),
e AS (SELECT na a, nb b FROM e0 UNION SELECT nb, na FROM e0),
r AS (
  SELECT node, node lbl FROM cells
  UNION
  SELECT e.b, r.lbl FROM r JOIN e ON e.a = r.node WHERE r.lbl < e.b),
comp AS (SELECT node, min(lbl) component FROM r GROUP BY 1)
SELECT comp.component cluster_id,
       CAST(count(*) AS BIGINT) n_cells,
       CAST(sum(cells.np) AS BIGINT) n_points
FROM comp JOIN cells ON comp.node = cells.node
GROUP BY 1"""


def q_quality_readability(spark, sf_dir):
    """Flesch-style readability per document with a vowel-count
    syllable proxy — all three counters are pure character arithmetic
    (translate + length, no regex engine in the hot path, so no
    Java-vs-RE2 divergence) and the score is a mirrored IEEE chain on
    round-trip literals, rounded 6dp."""
    t = F.col("text")
    lower = F.lower(t)
    words = F.size(F.split(F.trim(t), " "))
    sentences = F.greatest(
        F.lit(1),
        F.length(t) - F.length(F.translate(t, ".!?", "")),
    )
    vowels = F.length(lower) - F.length(F.translate(lower, "aeiou", ""))
    wd = words.cast("double")
    sd = sentences.cast("double")
    vd = vowels.cast("double")
    flesch = (
        F.lit(206.835)
        - (F.lit(1.015) * (wd / sd))
        - (F.lit(84.6) * (vd / wd))
    )
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        words.cast("bigint").alias("n_words"),
        sentences.cast("bigint").alias("n_sentences"),
        vowels.cast("bigint").alias("n_vowels"),
        F.round(flesch, 6).alias("flesch"),
    )


SQL_QUALITY_READABILITY = """
WITH d AS (
  SELECT doc_id,
         len(string_split(trim(text), ' ')) w,
         greatest(1, length(text)
                     - length(translate(text, '.!?', ''))) s,
         length(lower(text))
           - length(translate(lower(text), 'aeiou', '')) v
  FROM documents)
SELECT doc_id,
       CAST(w AS BIGINT) n_words,
       CAST(s AS BIGINT) n_sentences,
       CAST(v AS BIGINT) n_vowels,
       round(CAST(206.835 AS DOUBLE)
             - (CAST(1.015 AS DOUBLE)
                * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE)))
             - (CAST(84.6 AS DOUBLE)
                * (CAST(v AS DOUBLE) / CAST(w AS DOUBLE))), 6) flesch
FROM d"""


def q_conversion_latency(spark, sf_dir):
    """Signup→first-purchase latency distribution per signup cohort:
    exact nearest-rank p50/p90 of the microsecond latency (integer
    order statistics — no interpolation formula to diverge). The rank
    cut is k50 = (n+1) div 2, k90 = ceil(0.9·n) = (9n+9) div 10; both
    picked with one conditional aggregate over the ranked window."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    s0 = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("s0"))
    )
    w0 = s0.agg(F.expr("min(s0 div 86400000000)").alias("day0"))
    p0 = (
        e.where(F.col("event_type") == "purchase")
        .join(s0, "user_id")
        .where(F.col("us") >= F.col("s0"))
        .groupBy("user_id")
        .agg(F.min("us").alias("p0"), F.min("s0").alias("s0"))
    )
    conv = p0.crossJoin(F.broadcast(w0)).select(
        "user_id",
        F.expr("((s0 div 86400000000) - day0) div 7")
        .cast("bigint")
        .alias("cohort_week"),
        (F.col("p0") - F.col("s0")).alias("lat"),
    )
    wrank = Window.partitionBy("cohort_week").orderBy(
        F.col("lat").asc(), F.col("user_id").asc()
    )
    wn = Window.partitionBy("cohort_week")
    ranked = conv.select(
        "cohort_week",
        "lat",
        F.row_number().over(wrank).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.groupBy("cohort_week").agg(
        F.max("n").cast("bigint").alias("n_conv"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("lat"))
        )
        .cast("bigint")
        .alias("p50_latency_us"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(9 * n + 9) div 10"), F.col("lat")
            )
        )
        .cast("bigint")
        .alias("p90_latency_us"),
    )


SQL_CONVERSION_LATENCY = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) us
  FROM events),
s0 AS (
  SELECT user_id, min(us) s0 FROM e
  WHERE event_type = 'signup' GROUP BY 1),
w0 AS (SELECT min(s0 // 86400000000) day0 FROM s0),
p0 AS (
  SELECT e.user_id, min(e.us) p0, min(s0.s0) s0
  FROM e JOIN s0 ON e.user_id = s0.user_id
  WHERE e.event_type = 'purchase' AND e.us >= s0.s0
  GROUP BY 1),
conv AS (
  SELECT user_id,
         CAST(((s0 // 86400000000) - day0) // 7 AS BIGINT) cohort_week,
         p0 - s0 lat
  FROM p0 CROSS JOIN w0),
rk AS (
  SELECT cohort_week, lat,
         row_number() OVER (PARTITION BY cohort_week
                            ORDER BY lat, user_id) rn,
         count(*) OVER (PARTITION BY cohort_week) n
  FROM conv)
SELECT cohort_week,
       CAST(max(n) AS BIGINT) n_conv,
       CAST(max(CASE WHEN rn = (n + 1) // 2 THEN lat END)
            AS BIGINT) p50_latency_us,
       CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN lat END)
            AS BIGINT) p90_latency_us
FROM rk GROUP BY 1"""


# ---------------------------------------------------------------------------
# wave 10: linear attribution, clustering coefficient, Theil–Sen,
# Apdex, two-phase heavy hitters, box-plot stats


def q_attribution_linear(spark, sf_dir):
    """Linear multi-touch attribution with EXACT integer credit: each
    purchase distributes 720720 credit units (lcm(1..16)) equally over
    its prior-7-day non-purchase touches — base = U div n per touch,
    the remainder U % n goes to the EARLIEST touch (documented
    tie-rule), so credit is exact for ANY touch count and
    order-invariant. Touchless purchases credit 'direct'. The float
    'conversions' figure is ONE division of exact integers at the very
    end. Contrast with attribution_last_touch (single-touch winner)."""
    e = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("u"),
        F.col("event_type").alias("ty"),
        F.col("event_id").alias("eid"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    U = 720720
    p = e.where(F.col("ty") == "purchase").select(
        "u", F.col("us").alias("pus"), F.col("eid").alias("pid")
    )
    t = e.where(F.col("ty") != "purchase").select(
        "u", F.col("us").alias("tus"), F.col("ty").alias("channel"),
        F.col("eid").alias("teid"),
    )
    pairs = p.join(t, "u").where(
        (F.col("tus") < F.col("pus"))
        & (F.col("pus") - F.col("tus") <= F.lit(7 * 86_400_000_000))
    )
    per_conv = pairs.groupBy("pid").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.struct("tus", "teid", "channel")).alias("first_t"),
    )
    base = (
        pairs.join(per_conv, "pid")
        .groupBy(F.col("channel"))
        .agg(
            F.sum(F.expr(f"{U} div n")).alias("base_units"),
        )
    )
    rem = per_conv.select(
        F.col("first_t.channel").alias("channel"),
        F.expr(f"{U} % n").alias("r"),
    ).groupBy("channel").agg(F.sum("r").alias("rem_units"))
    direct = (
        p.join(pairs.select("pid").distinct(), "pid", "left_anti")
        .agg(F.count(F.lit(1)).alias("n_direct"))
        .select(
            F.lit("direct").alias("channel"),
            (F.col("n_direct") * U).alias("base_units"),
        )
    )
    allb = base.unionByName(direct).join(rem, "channel", "full")
    return allb.select(
        "channel",
        (
            F.coalesce(F.col("base_units"), F.lit(0))
            + F.coalesce(F.col("rem_units"), F.lit(0))
        )
        .cast("bigint")
        .alias("credit_units"),
    ).select(
        "channel",
        "credit_units",
        F.round(
            F.col("credit_units").cast("double") / F.lit(float(U)), 6
        ).alias("conversions"),
    )


SQL_ATTRIBUTION_LINEAR = """
WITH e AS (
  SELECT user_id u, event_type ty, event_id eid,
         epoch_us(CAST(ts AS TIMESTAMP)) us
  FROM events),
p AS (SELECT u, us pus, eid pid FROM e WHERE ty = 'purchase'),
t AS (SELECT u, us tus, ty channel, eid teid FROM e
      WHERE ty <> 'purchase'),
pairs AS (
  SELECT p.pid, t.channel, t.tus, t.teid
  FROM p JOIN t ON p.u = t.u
  WHERE t.tus < p.pus AND p.pus - t.tus <= 604800000000),
per_conv AS (
  SELECT pid, count(*) n,
         arg_min(channel,
                 CAST(tus AS HUGEINT) * 10000000000 + teid)
           first_channel
  FROM pairs GROUP BY 1),
base AS (
  SELECT pairs.channel, sum(720720 // per_conv.n) base_units
  FROM pairs JOIN per_conv ON pairs.pid = per_conv.pid
  GROUP BY 1),
rem AS (
  SELECT first_channel channel, sum(720720 % n) rem_units
  FROM per_conv GROUP BY 1),
direct AS (
  SELECT 'direct' channel, count(*) * 720720 base_units
  FROM p ANTI JOIN pairs ON p.pid = pairs.pid),
allb AS (
  SELECT channel, base_units FROM base
  UNION ALL SELECT channel, base_units FROM direct),
j AS (
  SELECT COALESCE(allb.channel, rem.channel) channel,
         COALESCE(base_units, 0) + COALESCE(rem_units, 0) units
  FROM allb FULL JOIN rem ON allb.channel = rem.channel)
SELECT channel,
       CAST(units AS BIGINT) credit_units,
       round(CAST(units AS DOUBLE) / CAST(720720.0 AS DOUBLE), 6)
         AS conversions
FROM j"""


def q_kg_clustering_coeff(spark, sf_dir):
    """Local clustering coefficient per node of the triple surface
    graph: cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) for deg ≥ 2 —
    triangles from the degree-oriented compact-forward enumerator,
    degrees from the distinct undirected edge set, ONE division of
    exact integers per node (rounded 6dp)."""
    from llmaix_spark.operators.graph import triangle_counts

    tri = triangle_counts(
        q_kg_triples(spark, sf_dir), src="subj", dst="obj"
    )
    t = q_kg_triples(spark, sf_dir)
    e = (
        t.where(
            F.col("subj").isNotNull()
            & F.col("obj").isNotNull()
            & (F.col("subj") != F.col("obj"))
        )
        .select(
            F.least("subj", "obj").alias("a"),
            F.greatest("subj", "obj").alias("b"),
        )
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    return (
        deg.join(tri, "node")
        .where(F.col("degree") >= 2)
        .select(
            "node",
            "degree",
            F.col("n_triangles").cast("bigint").alias("n_triangles"),
            F.round(
                (F.lit(2) * F.col("n_triangles")).cast("double")
                / (
                    F.col("degree") * (F.col("degree") - 1)
                ).cast("double"),
                6,
            ).alias("clustering_coeff"),
        )
    )


SQL_KG_CLUSTERING_COEFF = f"""
WITH t AS ({SQL_KG_TRIPLES}),
e AS (SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
      FROM t WHERE subj IS NOT NULL AND obj IS NOT NULL
        AND subj <> obj),
nodes AS (SELECT a AS node FROM e UNION ALL SELECT b FROM e),
deg AS (SELECT node, CAST(count(*) AS BIGINT) degree
        FROM nodes GROUP BY 1),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri),
c AS (SELECT node, CAST(count(*) AS BIGINT) n_triangles
      FROM corners GROUP BY 1)
SELECT deg.node, deg.degree,
       CAST(COALESCE(c.n_triangles, 0) AS BIGINT) n_triangles,
       round(CAST(2 * COALESCE(c.n_triangles, 0) AS DOUBLE)
             / CAST(deg.degree * (deg.degree - 1) AS DOUBLE), 6)
         AS clustering_coeff
FROM deg LEFT JOIN c ON deg.node = c.node
WHERE deg.degree >= 2"""


def q_theil_sen_trend(spark, sf_dir):
    """Theil–Sen robust trend per event type: the MEDIAN pairwise
    slope of the daily spend series. Slopes order by their IEEE
    quotient (identical doubles both engines — division of exact
    integers) with (dy, dx) integer tie-breaks; the median is the
    nearest-rank-lower element, reported as its exact (dy, dx) pair
    plus the rounded quotient. Pair generation is a per-type self-join
    on the TINY daily rollup (days², not rows²)."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "unix_micros(cast(ts as timestamp)) div 86400000000"
        ).alias("dayn"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    daily = e.groupBy("event_type", "dayn").agg(
        F.sum("cents").alias("c")
    )
    a = daily.select(
        "event_type",
        F.col("dayn").alias("d1"),
        F.col("c").alias("c1"),
    )
    b = daily.select(
        F.col("event_type").alias("ty2"),
        F.col("dayn").alias("d2"),
        F.col("c").alias("c2"),
    )
    pairs = a.join(
        b,
        (F.col("event_type") == F.col("ty2"))
        & (F.col("d1") < F.col("d2")),
    ).select(
        "event_type",
        (F.col("c2") - F.col("c1")).alias("dy"),
        (F.col("d2") - F.col("d1")).alias("dx"),
        (
            (F.col("c2") - F.col("c1")).cast("double")
            / (F.col("d2") - F.col("d1")).cast("double")
        ).alias("slope"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("slope").asc(), F.col("dy").asc(), F.col("dx").asc()
    )
    wn = Window.partitionBy("event_type")
    ranked = pairs.select(
        "event_type",
        "dy",
        "dx",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.where(
        F.col("rn") == F.expr("(n + 1) div 2")
    ).select(
        "event_type",
        F.col("n").cast("bigint").alias("n_pairs"),
        F.col("dy").cast("bigint").alias("med_dy"),
        F.col("dx").cast("bigint").alias("med_dx"),
        F.round("slope", 6).alias("slope_cents_per_day"),
    )


SQL_THEIL_SEN_TREND = """
WITH e AS (
  SELECT event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 dayn,
         CAST(round(value * 100, 0) AS BIGINT) cents
  FROM events),
daily AS (
  SELECT event_type, dayn, sum(cents) c FROM e GROUP BY 1, 2),
pairs AS (
  SELECT a.event_type,
         b.c - a.c dy, b.dayn - a.dayn dx,
         CAST(b.c - a.c AS DOUBLE) / CAST(b.dayn - a.dayn AS DOUBLE)
           slope
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.dayn < b.dayn),
rk AS (
  SELECT event_type, dy, dx, slope,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY slope, dy, dx) rn,
         count(*) OVER (PARTITION BY event_type) n
  FROM pairs)
SELECT event_type,
       CAST(n AS BIGINT) n_pairs,
       CAST(dy AS BIGINT) med_dy,
       CAST(dx AS BIGINT) med_dx,
       round(slope, 6) slope_cents_per_day
FROM rk WHERE rn = (n + 1) // 2"""


def q_events_apdex(spark, sf_dir):
    """Apdex score per event type (T = 50.00 in cents, tolerating up
    to 4T): apdex = (satisfied + tolerating/2) / n computed as the
    EXACT integer (2·sat + tol) over 2n with one final division —
    the SLA roll-up, fully map-side combinable (one hash aggregate)."""
    T = 5000
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("cents") <= T, 1).otherwise(0))
        .cast("bigint")
        .alias("n_satisfied"),
        F.sum(
            F.when(
                (F.col("cents") > T) & (F.col("cents") <= 4 * T), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_tolerating"),
    )
    return agg.select(
        "event_type",
        "n",
        "n_satisfied",
        "n_tolerating",
        (F.col("n") - F.col("n_satisfied") - F.col("n_tolerating"))
        .cast("bigint")
        .alias("n_frustrated"),
        F.round(
            (2 * F.col("n_satisfied") + F.col("n_tolerating")).cast(
                "double"
            )
            / (2 * F.col("n")).cast("double"),
            6,
        ).alias("apdex"),
    )


SQL_EVENTS_APDEX = """
WITH e AS (
  SELECT event_type,
         CAST(round(value * 100, 0) AS BIGINT) cents
  FROM events),
ag AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) n,
         CAST(sum(CASE WHEN cents <= 5000 THEN 1 ELSE 0 END)
              AS BIGINT) n_satisfied,
         CAST(sum(CASE WHEN cents > 5000 AND cents <= 20000
                       THEN 1 ELSE 0 END) AS BIGINT) n_tolerating
  FROM e GROUP BY 1)
SELECT event_type, n, n_satisfied, n_tolerating,
       CAST(n - n_satisfied - n_tolerating AS BIGINT) n_frustrated,
       round(CAST(2 * n_satisfied + n_tolerating AS DOUBLE)
             / CAST(2 * n AS DOUBLE), 6) apdex
FROM ag"""


def q_heavy_hitters(spark, sf_dir):
    """Two-phase exact heavy hitters over the Zipf-skewed token stream
    (words appearing in ≥ 1/s of all token positions, s=1000): phase 1
    finds per-shard local candidates (cnt_shard·s ≥ n_shard — by
    pigeonhole every global heavy hitter is locally heavy in ≥1
    shard, so the candidate set is a PROVABLE superset); phase 2
    re-counts only the candidates exactly and applies the global gate
    cnt·s ≥ n. This is the scale recipe: the full token multiset is
    never globally aggregated per distinct word beyond phase 1's
    combinable (shard, word) grain. All-integer gates (no division)."""
    from llmaix_spark.operators.linking import stable_hash60_expr

    s = 1000
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        (stable_hash60_expr(F.col("doc_id").cast("string")) % 32).alias(
            "shard"
        ),
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok"),
    )
    local = toks.groupBy("shard", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    shard_tot = toks.groupBy("shard").agg(
        F.count(F.lit(1)).alias("ns")
    )
    cand = (
        local.join(F.broadcast(shard_tot), "shard")
        .where(F.col("c") * s >= F.col("ns"))
        .select("tok")
        .distinct()
    )
    n_tot = toks.agg(F.count(F.lit(1)).alias("n"))
    exact = (
        toks.join(F.broadcast(cand), "tok")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_count"))
    )
    return (
        exact.crossJoin(F.broadcast(n_tot))
        .where(F.col("n_count") * s >= F.col("n"))
        .select(
            "tok",
            "n_count",
            F.col("n").cast("bigint").alias("n_total"),
        )
    )


SQL_HEAVY_HITTERS = """
WITH d AS (SELECT doc_id, string_split(trim(text), ' ') w
           FROM documents),
toks AS (SELECT unnest(w) tok FROM d),
nt AS (SELECT count(*) n FROM toks),
cnt AS (SELECT tok, CAST(count(*) AS BIGINT) n_count
        FROM toks GROUP BY 1)
SELECT tok, n_count, CAST(nt.n AS BIGINT) n_total
FROM cnt CROSS JOIN nt
WHERE n_count * 1000 >= nt.n"""


def q_boxplot_stats(spark, sf_dir):
    """Box-plot statistics per event type on exact cents: nearest-rank
    q1/median/q3 (clamped integer rank formulas), IQR fences at
    q ∓ (3·iqr) div 2 (exact integers — the 1.5×IQR whisker without a
    float), and the outlier count outside the fences. One ranked
    window pass picks the quartiles; the 5-row fence table broadcasts
    back onto the stream for the outlier count."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("cents").asc(), F.col("event_id").asc()
    )
    wn = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    q = ranked.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        F.max(
            F.when(
                F.col("rn")
                == F.expr("greatest(1, (n + 1) div 4)"),
                F.col("cents"),
            )
        )
        .cast("bigint")
        .alias("q1"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("cents"))
        )
        .cast("bigint")
        .alias("median"),
        F.max(
            F.when(
                F.col("rn") == F.expr("least(n, (3 * (n + 1)) div 4)"),
                F.col("cents"),
            )
        )
        .cast("bigint")
        .alias("q3"),
    )
    fences = q.select(
        "event_type",
        "n",
        "q1",
        "median",
        "q3",
        (F.col("q1") - F.expr("(3 * (q3 - q1)) div 2")).alias("lo"),
        (F.col("q3") + F.expr("(3 * (q3 - q1)) div 2")).alias("hi"),
    )
    out = (
        e.join(F.broadcast(fences), "event_type")
        .where((F.col("cents") < F.col("lo")) | (F.col("cents") > F.col("hi")))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_outliers"))
    )
    return fences.join(out, "event_type", "left").select(
        "event_type",
        "n",
        "q1",
        "median",
        "q3",
        F.coalesce(F.col("n_outliers"), F.lit(0))
        .cast("bigint")
        .alias("n_outliers"),
    )


SQL_BOXPLOT_STATS = """
WITH e AS (
  SELECT event_type, event_id,
         CAST(round(value * 100, 0) AS BIGINT) cents
  FROM events),
rk AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY cents, event_id) rn,
         count(*) OVER (PARTITION BY event_type) n
  FROM e),
q AS (
  SELECT event_type,
         CAST(max(n) AS BIGINT) n,
         CAST(max(CASE WHEN rn = greatest(1, (n + 1) // 4)
                       THEN cents END) AS BIGINT) q1,
         CAST(max(CASE WHEN rn = (n + 1) // 2
                       THEN cents END) AS BIGINT) median,
         CAST(max(CASE WHEN rn = least(n, (3 * (n + 1)) // 4)
                       THEN cents END) AS BIGINT) q3
  FROM rk GROUP BY 1),
f AS (
  SELECT *, q1 - (3 * (q3 - q1)) // 2 lo, q3 + (3 * (q3 - q1)) // 2 hi
  FROM q),
o AS (
  SELECT e.event_type, CAST(count(*) AS BIGINT) n_outliers
  FROM e JOIN f ON e.event_type = f.event_type
  WHERE e.cents < f.lo OR e.cents > f.hi
  GROUP BY 1)
SELECT f.event_type, f.n, f.q1, f.median, f.q3,
       CAST(COALESCE(o.n_outliers, 0) AS BIGINT) n_outliers
FROM f LEFT JOIN o ON f.event_type = o.event_type"""


def q_spearman_corr(spark, sf_dir):
    """Per-event-type Spearman rank correlation between value and event
    time. Average ranks ride as exact integers (2·avg_rank =
    2·rank + ties − 1), the Pearson closed form over those ranks sums
    in DECIMAL(38,0) (order-invariant, map-side combinable), and
    floating point appears only in the last four IEEE ops
    (two casts→two sqrt→mul→div — sqrt is IEEE-correctly-rounded in
    both engines, so the quotient is bit-identical). Rank windows are
    PARTITIONED by event_type — per-group sorts, never a global sort."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    wv = Window.partitionBy("event_type").orderBy("cents")
    wu = Window.partitionBy("event_type").orderBy("us")
    ranked = e.select(
        "event_type",
        (
            2 * F.rank().over(wv)
            + F.count(F.lit(1)).over(
                Window.partitionBy("event_type", "cents")
            )
            - 1
        ).alias("rx"),
        (
            2 * F.rank().over(wu)
            + F.count(F.lit(1)).over(Window.partitionBy("event_type", "us"))
            - 1
        ).alias("ry"),
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    a = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        F.sum(d("rx")).alias("_sx"),
        F.sum(d("ry")).alias("_sy"),
        F.sum(d("rx") * d("ry")).alias("_sxy"),
        F.sum(d("rx") * d("rx")).alias("_sxx"),
        F.sum(d("ry") * d("ry")).alias("_syy"),
    )
    num = (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast(
        "double"
    )
    dx = (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast(
        "double"
    )
    dy = (F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")).cast(
        "double"
    )
    return a.select(
        "event_type",
        F.col("_n").cast("bigint").alias("n"),
        F.when(
            (dx > 0) & (dy > 0),
            F.round(num / (F.sqrt(dx) * F.sqrt(dy)), 6),
        ).alias("rho"),
    )


SQL_SPEARMAN_CORR = """
WITH e AS (
  SELECT event_type,
         CAST(round(value * 100, 0) AS BIGINT) cents,
         epoch_us(ts) us
  FROM events),
rk AS (
  SELECT event_type,
         2 * rank() OVER (PARTITION BY event_type ORDER BY cents)
           + count(*) OVER (PARTITION BY event_type, cents) - 1 AS rx,
         2 * rank() OVER (PARTITION BY event_type ORDER BY us)
           + count(*) OVER (PARTITION BY event_type, us) - 1 AS ry
  FROM e),
a AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT) n,
         sum(CAST(rx AS HUGEINT)) sx, sum(CAST(ry AS HUGEINT)) sy,
         sum(CAST(rx AS HUGEINT) * ry) sxy,
         sum(CAST(rx AS HUGEINT) * rx) sxx,
         sum(CAST(ry AS HUGEINT) * ry) syy
  FROM rk GROUP BY 1),
f AS (
  SELECT event_type, CAST(n AS BIGINT) n,
         CAST(n * sxy - sx * sy AS DOUBLE) num,
         CAST(n * sxx - sx * sx AS DOUBLE) dx,
         CAST(n * syy - sy * sy AS DOUBLE) dy
  FROM a)
SELECT event_type, n,
       CASE WHEN dx > 0 AND dy > 0
            THEN round(num / (sqrt(dx) * sqrt(dy)), 6) END AS rho
FROM f"""


def q_mann_kendall(spark, sf_dir):
    """Mann–Kendall trend statistic per order month: S = Σ sign(r_j −
    r_i) over ordered day pairs of the daily-revenue series, plus the
    tie-corrected variance NUMERATOR n(n−1)(2n+5) − Σ t(t−1)(2t+5) —
    every output an exact BIGINT (the z-score's sqrt/18 is one client
    op away). Pair enumeration runs on the calendar-bounded daily
    rollup (≤31 days/month → ≤465 pairs, broadcast self-join), never
    on raw rows — the rollup size is CONSTANT in SF, so the quadratic
    stage costs the same at 100 TB as at sf0.01."""
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            (
                F.year("o_orderdate") * 12 + F.month("o_orderdate")
            ).cast("bigint").alias("month_key"),
            F.dayofmonth("o_orderdate").cast("bigint").alias("day"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .alias("rev")
        )
    )
    a = daily.alias("a")
    b = daily.alias("b")
    s = (
        a.join(
            F.broadcast(b),
            (F.col("a.month_key") == F.col("b.month_key"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.month_key").alias("month_key"))
        .agg(
            F.sum(F.signum(F.col("b.rev") - F.col("a.rev")).cast("bigint"))
            .cast("bigint")
            .alias("s")
        )
    )
    base = daily.groupBy("month_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    ties = (
        daily.groupBy("month_key", "rev")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("month_key")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    return (
        base.join(F.broadcast(s), "month_key", "left")
        .join(F.broadcast(ties), "month_key", "left")
        .select(
            "month_key",
            "n_days",
            F.coalesce(F.col("s"), F.lit(0)).cast("bigint").alias("s"),
            (
                F.col("n_days")
                * (F.col("n_days") - 1)
                * (2 * F.col("n_days") + 5)
                - F.coalesce(F.col("tie_term"), F.lit(0))
            )
            .cast("bigint")
            .alias("var_num"),
        )
    )


SQL_MANN_KENDALL = """
WITH daily AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
           month_key,
         CAST(day(o_orderdate) AS BIGINT) dom,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) rev
  FROM orders GROUP BY 1, 2),
s AS (
  SELECT a.month_key,
         CAST(sum(CAST(sign(b.rev - a.rev) AS BIGINT)) AS BIGINT) s
  FROM daily a JOIN daily b
    ON a.month_key = b.month_key AND a.dom < b.dom
  GROUP BY 1),
base AS (
  SELECT month_key, CAST(count(*) AS BIGINT) n_days
  FROM daily GROUP BY 1),
ties AS (
  SELECT month_key,
         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) tie_term
  FROM (SELECT month_key, rev, count(*) t FROM daily GROUP BY 1, 2)
  GROUP BY 1)
SELECT base.month_key, base.n_days,
       CAST(COALESCE(s.s, 0) AS BIGINT) s,
       CAST(base.n_days * (base.n_days - 1) * (2 * base.n_days + 5)
            - COALESCE(ties.tie_term, 0) AS BIGINT) var_num
FROM base
LEFT JOIN s ON base.month_key = s.month_key
LEFT JOIN ties ON base.month_key = ties.month_key"""


def q_mann_whitney_u(spark, sf_dir):
    """One-vs-rest Mann–Whitney U per event type on value cents,
    returned as the exact integer 2U = Σ_v c_t(v)·(2·other_less(v) +
    other_eq(v)) — no rank halves, no floats anywhere. The only
    unpartitioned window runs over the DISTINCT-CENTS rollup, whose
    domain is bounded by the value range (≤49 002 rows at ANY scale
    factor), so the 'global' cumulative sum is a constant-size summary
    stage, not a data-volume sort; the raw stream contributes one
    map-side-combinable groupBy."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    per_type = e.groupBy("event_type", "cents").agg(
        F.count(F.lit(1)).alias("ct")
    )
    totals = (
        e.groupBy("cents")
        .agg(F.count(F.lit(1)).alias("total"))
        .select(
            "cents",
            "total",
            F.coalesce(
                F.sum("total").over(
                    Window.orderBy("cents").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("tot_less"),
        )
    )
    grand = e.groupBy().agg(F.count(F.lit(1)).alias("n_all"))
    wt = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    j = (
        per_type.join(F.broadcast(totals), "cents")
        .select(
            "event_type",
            "cents",
            "ct",
            "total",
            "tot_less",
            F.coalesce(F.sum("ct").over(wt), F.lit(0)).alias("t_less"),
        )
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = j.groupBy("event_type").agg(
        F.sum("ct").cast("bigint").alias("n1"),
        F.sum(
            d("ct")
            * (
                2 * (d("tot_less") - d("t_less"))
                + (d("total") - d("ct"))
            )
        )
        .cast("bigint")
        .alias("u2"),
    )
    return agg.crossJoin(F.broadcast(grand)).select(
        "event_type",
        "n1",
        (F.col("n_all") - F.col("n1")).cast("bigint").alias("n2"),
        "u2",
    )


SQL_MANN_WHITNEY_U = """
WITH e AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) cents
  FROM events),
pt AS (
  SELECT event_type, cents, count(*) ct FROM e GROUP BY 1, 2),
tot AS (
  SELECT cents, count(*) total,
         COALESCE(sum(count(*)) OVER (
           ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) tot_less
  FROM e GROUP BY cents),
j AS (
  SELECT pt.event_type, pt.cents, pt.ct, tot.total, tot.tot_less,
         COALESCE(sum(pt.ct) OVER (
           PARTITION BY pt.event_type ORDER BY pt.cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) t_less
  FROM pt JOIN tot ON pt.cents = tot.cents),
a AS (
  SELECT event_type,
         CAST(sum(ct) AS BIGINT) n1,
         CAST(sum(CAST(ct AS HUGEINT)
                  * (2 * (tot_less - t_less) + (total - ct)))
              AS BIGINT) u2
  FROM j GROUP BY 1)
SELECT event_type, n1,
       CAST((SELECT count(*) FROM e) - n1 AS BIGINT) n2, u2
FROM a"""


def q_hhi_concentration(spark, sf_dir):
    """Herfindahl–Hirschman revenue-concentration index per order
    month: HHI = Σ_c share_c² = Σ rev_c² / (Σ rev_c)² on exact integer
    cents — DECIMAL(38,0) sums of per-customer squares (one
    map-side-combinable aggregate after the (month, customer) rollup),
    then a single cast→mul→div IEEE tail. Both aggregation grains key
    on (month, customer) ⊂ (month) so the second groupBy reuses the
    first shuffle's clustering."""
    mc = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            (
                F.year("o_orderdate") * 12 + F.month("o_orderdate")
            ).cast("bigint").alias("month_key"),
            F.col("o_custkey"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .alias("rev")
        )
    )
    d = F.col("rev").cast("decimal(38,0)")
    a = mc.groupBy("month_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_custs"),
        F.sum(d * d).alias("_ss"),
        F.sum(d).alias("_tot"),
    )
    tot = F.col("_tot").cast("double")
    return a.select(
        "month_key",
        "n_custs",
        F.when(
            F.col("_tot") != 0,
            F.round(F.col("_ss").cast("double") / (tot * tot), 6),
        ).alias("hhi"),
    )


SQL_HHI_CONCENTRATION = """
WITH mc AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
           month_key,
         o_custkey,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) rev
  FROM orders GROUP BY 1, 2),
a AS (
  SELECT month_key,
         CAST(count(*) AS BIGINT) n_custs,
         sum(CAST(rev AS HUGEINT) * rev) ss,
         sum(CAST(rev AS HUGEINT)) tot
  FROM mc GROUP BY 1)
SELECT month_key, n_custs,
       CASE WHEN tot <> 0
            THEN round(CAST(ss AS DOUBLE)
                       / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)), 6)
       END AS hhi
FROM a"""


def q_max_concurrency(spark, sf_dir):
    """Peak concurrency per event type via the classic sweep line:
    each event occupies [ts, ts + cents·10ms) in microseconds; +1/−1
    deltas sort by (t, delta) so half-open ends close BEFORE same-
    instant starts, and the running sum's row-wise prefixes are then a
    deterministic multiset (within a tie block deltas are identical,
    so prefix values don't depend on tie order). One window pass
    partitioned BY TYPE (never a global sort); max_by(struct(run,−t))
    picks the peak and its earliest instant in the same aggregate —
    ties (run,t) are impossible because prefixes move ±1 per row. At
    cluster scale the per-type timeline would range-partition into
    epochs with per-epoch offsets (two-level scan), same algebra."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("start_us"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    deltas = (
        e.select(
            "event_type",
            F.col("start_us").alias("t"),
            F.lit(1).alias("delta"),
        )
        .unionAll(
            e.select(
                "event_type",
                (F.col("start_us") + F.col("cents") * 10000).alias("t"),
                F.lit(-1).alias("delta"),
            )
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = deltas.select(
        "event_type", "t", F.sum("delta").over(w).alias("run")
    )
    return run.groupBy("event_type").agg(
        F.max_by(
            F.struct(F.col("run"), F.col("t")),
            F.struct(F.col("run"), (-F.col("t")).alias("nt")),
        ).alias("_s")
    ).select(
        "event_type",
        F.col("_s.run").cast("bigint").alias("peak"),
        F.col("_s.t").cast("bigint").alias("peak_at_us"),
    )


SQL_MAX_CONCURRENCY = """
WITH e AS (
  SELECT event_type, epoch_us(ts) start_us,
         CAST(round(value * 100, 0) AS BIGINT) cents
  FROM events),
deltas AS (
  SELECT event_type, start_us t, 1 delta FROM e
  UNION ALL
  SELECT event_type, start_us + cents * 10000 t, -1 delta FROM e),
run AS (
  SELECT event_type, t,
         sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) run
  FROM deltas),
enc AS (
  SELECT event_type,
         max(CAST(run AS HUGEINT) * 1000000000000000000::HUGEINT
             + (1000000000000000000::HUGEINT - t)) m
  FROM run GROUP BY 1)
SELECT event_type,
       CAST(m // 1000000000000000000::HUGEINT AS BIGINT) peak,
       CAST(1000000000000000000::HUGEINT
            - (m % 1000000000000000000::HUGEINT) AS BIGINT) peak_at_us
FROM enc"""


def q_growth_accounting(spark, sf_dir):
    """Weekly growth accounting over event users: each active
    (user, week) classifies as new (first ever), retained (active the
    immediately previous week) or resurrected (gap ≥ 2 weeks); churned
    for week w = actives(w−1) − retained(w) via a self-join of the
    weekly summary on w−1. Weeks are epoch-day div 7 — pure integer
    arithmetic, no engine week-of-year semantics. The heavy stage is
    one (user, week) distinct + one per-user lag window; the weekly
    summary is calendar-bounded, so the churn self-join broadcasts."""
    from pyspark.sql import Window

    uw = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr(
                "(unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000)"
                " div 7"
            ).alias("week"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("week")
    st = uw.select(
        "week",
        F.lag("week").over(w).alias("prev_week"),
    )
    weekly = st.groupBy("week").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active"),
        F.sum(
            F.when(F.col("prev_week").isNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_new"),
        F.sum(
            F.when(F.col("prev_week") == F.col("week") - 1, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_retained"),
        F.sum(
            F.when(
                F.col("prev_week").isNotNull()
                & (F.col("prev_week") < F.col("week") - 1),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_resurrected"),
    )
    prev = weekly.select(
        (F.col("week") + 1).alias("week"),
        F.col("n_active").alias("prev_active"),
    )
    return weekly.join(F.broadcast(prev), "week", "left").select(
        "week",
        "n_active",
        "n_new",
        "n_retained",
        "n_resurrected",
        (
            F.coalesce(F.col("prev_active"), F.lit(0))
            - F.col("n_retained")
        )
        .cast("bigint")
        .alias("n_churned"),
    )


SQL_GROWTH_ACCOUNTING = """
WITH uw AS (
  SELECT DISTINCT user_id,
         (epoch_us(ts) // 86400000000) // 7 wk
  FROM events),
st AS (
  SELECT wk,
         lag(wk) OVER (PARTITION BY user_id ORDER BY wk) prev_wk
  FROM uw),
weekly AS (
  SELECT wk,
         CAST(count(*) AS BIGINT) n_active,
         CAST(sum(CASE WHEN prev_wk IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) n_new,
         CAST(sum(CASE WHEN prev_wk = wk - 1 THEN 1 ELSE 0 END)
              AS BIGINT) n_retained,
         CAST(sum(CASE WHEN prev_wk IS NOT NULL
                        AND prev_wk < wk - 1 THEN 1 ELSE 0 END)
              AS BIGINT) n_resurrected
  FROM st GROUP BY 1)
SELECT w.wk AS "week", w.n_active, w.n_new, w.n_retained,
       w.n_resurrected,
       CAST(COALESCE(p.n_active, 0) - w.n_retained AS BIGINT) n_churned
FROM weekly w
LEFT JOIN weekly p ON p.wk = w.wk - 1"""


def q_bigram_pmi(spark, sf_dir):
    """Top-25 corpus bigrams by PMI expressed as the exact probability
    RATIO (N₁²·c_ab)/(N_b·c_a·c_b) — monotone in PMI, so the log is one
    client-side op away and never enters the engine (ln diverges
    cross-engine; a ratio of DECIMAL(38,0) integers with a single
    cast→div tail does not). Adjacent pairs come from one zip_with over
    two slices of the token array (no positional self-join Spark-side);
    unigram/bigram counts are map-side-combinable groupBys, the two
    grand totals broadcast, and the top-k is a TakeOrderedAndProject on
    the deterministic (ratio DESC, a, b) key. Floor support c_ab ≥ 5."""
    toks = _t(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("t")
    )
    uni = (
        toks.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n1 = uni.groupBy().agg(F.sum("c").alias("n_tok"))
    bi = (
        toks.where(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "zip_with(slice(t, 1, size(t) - 1),"
                    " slice(t, 2, size(t) - 1),"
                    " (x, y) -> struct(x AS a, y AS b))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 5)
    )
    nb = bi.groupBy().agg(F.sum("n_ab").alias("n_bi"))
    ua = uni.select(F.col("tok").alias("a"), F.col("c").alias("ca"))
    ub = uni.select(F.col("tok").alias("b"), F.col("c").alias("cb"))
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    scored = (
        bi.join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(nb))
        .select(
            "a",
            "b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.round(
                (d("n_tok") * d("n_tok") * d("n_ab")).cast("double")
                / (d("n_bi") * d("ca") * d("cb")).cast("double"),
                6,
            ).alias("pmi_ratio"),
        )
    )
    return scored.orderBy(
        F.col("pmi_ratio").desc(), "a", "b"
    ).limit(25)


SQL_BIGRAM_PMI = """
WITH d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
tok AS (SELECT doc_id, generate_subscripts(w, 1) i, unnest(w) t FROM d),
uni AS (SELECT t tok, count(*) c FROM tok GROUP BY 1),
n1 AS (SELECT sum(c) n_tok FROM uni),
bi AS (
  SELECT x.t a, y.t b, count(*) n_ab
  FROM tok x JOIN tok y ON x.doc_id = y.doc_id AND y.i = x.i + 1
  GROUP BY 1, 2 HAVING count(*) >= 5),
nb AS (SELECT sum(n_ab) n_bi FROM bi)
SELECT bi.a, bi.b, CAST(bi.n_ab AS BIGINT) n_ab,
       round(CAST(CAST(n_tok AS HUGEINT) * n_tok * bi.n_ab AS DOUBLE)
             / CAST(CAST(n_bi AS HUGEINT) * ua.c * ub.c AS DOUBLE),
             6) pmi_ratio
FROM bi
JOIN uni ua ON ua.tok = bi.a
JOIN uni ub ON ub.tok = bi.b, n1, nb
ORDER BY pmi_ratio DESC, a, b LIMIT 25"""


def q_interpolate_linear(spark, sf_dir):
    """Linear interpolation of per-supplier daily shipped quantity at
    the missing calendar days between consecutive observed days:
    v(d) = (v₁·(d₂−d) + v₂·(d−d₁)) / (d₂−d₁) — integer numerator, ONE
    IEEE division, bit-identical cross-engine. One shuffle total: the
    daily rollup, the lead() window and the gap explode all key on
    l_suppkey; sequence(d₁+1, d₂−1) only fires where d₂ > d₁+1, so the
    ascending-guard landmine (Spark sequence descends when b < a) never
    arms. Returns ONLY the synthesized rows."""
    from pyspark.sql import Window

    daily = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(
            "l_suppkey",
            F.expr(
                "unix_micros(CAST(l_shipdate AS TIMESTAMP))"
                " div 86400000000"
            ).alias("day"),
        )
        .agg(
            F.sum(F.round("l_quantity", 0).cast("bigint")).alias("qty")
        )
    )
    w = Window.partitionBy("l_suppkey").orderBy("day")
    gaps = daily.select(
        "l_suppkey",
        F.col("day").alias("d1"),
        F.col("qty").alias("v1"),
        F.lead("day").over(w).alias("d2"),
        F.lead("qty").over(w).alias("v2"),
    ).where(F.col("d2") > F.col("d1") + 1)
    pts = gaps.select(
        "l_suppkey",
        "d1",
        "v1",
        "d2",
        "v2",
        F.explode(F.expr("sequence(d1 + 1, d2 - 1)")).alias("day"),
    )
    return pts.select(
        "l_suppkey",
        F.col("day").cast("bigint").alias("day"),
        F.round(
            (
                F.col("v1") * (F.col("d2") - F.col("day"))
                + F.col("v2") * (F.col("day") - F.col("d1"))
            ).cast("double")
            / (F.col("d2") - F.col("d1")).cast("double"),
            6,
        ).alias("qty_interp"),
    )


SQL_INTERPOLATE_LINEAR = """
WITH daily AS (
  SELECT l_suppkey, epoch_us(l_shipdate) // 86400000000 d,
         sum(CAST(round(l_quantity, 0) AS BIGINT)) qty
  FROM lineitem GROUP BY 1, 2),
gaps AS (
  SELECT l_suppkey, d d1, qty v1,
         lead(d) OVER (PARTITION BY l_suppkey ORDER BY d) d2,
         lead(qty) OVER (PARTITION BY l_suppkey ORDER BY d) v2
  FROM daily),
pts AS (
  SELECT l_suppkey, d1, v1, d2, v2,
         unnest(generate_series(d1 + 1, d2 - 1)) dd
  FROM gaps WHERE d2 > d1 + 1)
SELECT l_suppkey, CAST(dd AS BIGINT) "day",
       round(CAST(v1 * (d2 - dd) + v2 * (dd - d1) AS DOUBLE)
             / CAST(d2 - d1 AS DOUBLE), 6) qty_interp
FROM pts"""


def q_pages_bounce_exit(spark, sf_dir):
    """Bounce and exit rates per event type over 30-minute-gap
    sessions (the same sessionization contract as session_paths).
    Entry/exit/length reduce per session with ONE min/max over
    struct(ts, event_id, event_type) — the (user, session) aggregate
    reuses the window's user_id clustering, so the whole query is one
    exchange + one sort; per-type counts and the session grand total
    then broadcast. Rates are exact-integer quotients rounded at 6dp."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_s = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = (
        e.withColumn("sid", F.sum(new_s).over(w))
        .groupBy("user_id", "sid")
        .agg(
            F.min(F.struct("ts", "event_id", "event_type"))[
                "event_type"
            ].alias("first_type"),
            F.max(F.struct("ts", "event_id", "event_type"))[
                "event_type"
            ].alias("last_type"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    total = sess.groupBy().agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    entered = sess.groupBy(
        F.col("first_type").alias("event_type")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("entered"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("bounces"),
    )
    exits = sess.groupBy(F.col("last_type").alias("event_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("exits")
    )
    return (
        # no broadcast hint: Spark can't build-side a FULL outer join;
        # both inputs are per-type summaries (≤ #event_types rows)
        entered.join(exits, "event_type", "full")
        .crossJoin(F.broadcast(total))
        .select(
            "event_type",
            F.coalesce("entered", F.lit(0))
            .cast("bigint")
            .alias("entered"),
            F.coalesce("bounces", F.lit(0))
            .cast("bigint")
            .alias("bounces"),
            F.coalesce("exits", F.lit(0)).cast("bigint").alias("exits"),
            F.when(
                F.coalesce("entered", F.lit(0)) > 0,
                F.round(
                    F.coalesce("bounces", F.lit(0)).cast("double")
                    / F.col("entered").cast("double"),
                    6,
                ),
            ).alias("bounce_rate"),
            F.round(
                F.coalesce("exits", F.lit(0)).cast("double")
                / F.col("n_sessions").cast("double"),
                6,
            ).alias("exit_share"),
        )
    )


SQL_PAGES_BOUNCE_EXIT = """
WITH s AS (
  SELECT user_id, event_id, event_type, ts,
         sum(CASE WHEN prev_ts IS NULL
                   OR date_diff('second', prev_ts, ts) > 1800
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) sid
  FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) prev_ts
        FROM events)),
agg AS (
  SELECT user_id, sid,
         arg_min(event_type,
                 epoch_us(ts)::HUGEINT * 10000000000 + event_id)
           first_type,
         arg_max(event_type,
                 epoch_us(ts)::HUGEINT * 10000000000 + event_id)
           last_type,
         count(*) n_events
  FROM s GROUP BY 1, 2),
total AS (SELECT count(*) n_sessions FROM agg),
ent AS (
  SELECT first_type event_type,
         CAST(count(*) AS BIGINT) entered,
         CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
           bounces
  FROM agg GROUP BY 1),
ex AS (
  SELECT last_type event_type, CAST(count(*) AS BIGINT) exits
  FROM agg GROUP BY 1)
SELECT COALESCE(ent.event_type, ex.event_type) event_type,
       CAST(COALESCE(entered, 0) AS BIGINT) entered,
       CAST(COALESCE(bounces, 0) AS BIGINT) bounces,
       CAST(COALESCE(exits, 0) AS BIGINT) exits,
       CASE WHEN COALESCE(entered, 0) > 0
            THEN round(CAST(COALESCE(bounces, 0) AS DOUBLE)
                       / CAST(entered AS DOUBLE), 6) END bounce_rate,
       round(CAST(COALESCE(exits, 0) AS DOUBLE)
             / CAST(n_sessions AS DOUBLE), 6) exit_share
FROM ent FULL JOIN ex ON ent.event_type = ex.event_type, total"""


def q_inventory_reorder(spark, sf_dir):
    """First reorder-point crossing per part: cumulative shipped
    quantity in (shipdate, orderkey, linenumber) order; the crossing
    row is picked ALGEBRAICALLY — cum ≥ T ∧ cum − qty < T — which is
    unique because the running sum strictly increases, so no second
    min()-pass re-derives the window branch (the multi-consumer
    re-derivation landmine). One shuffle on l_partkey; T = 100."""
    from pyspark.sql import Window

    t = 100
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000"
        ).alias("day"),
        F.round("l_quantity", 0).cast("bigint").alias("qty"),
    )
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("day", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = li.select(
        "l_partkey", "day", "qty", F.sum("qty").over(w).alias("cum")
    )
    return run.where(
        (F.col("cum") >= t) & (F.col("cum") - F.col("qty") < t)
    ).select(
        "l_partkey",
        F.col("day").cast("bigint").alias("cross_day"),
        F.col("cum").cast("bigint").alias("cum_qty"),
    )


SQL_INVENTORY_REORDER = """
WITH li AS (
  SELECT l_partkey, l_orderkey, l_linenumber,
         epoch_us(l_shipdate) // 86400000000 d,
         CAST(round(l_quantity, 0) AS BIGINT) qty
  FROM lineitem),
run AS (
  SELECT l_partkey, d, qty,
         sum(qty) OVER (PARTITION BY l_partkey
                        ORDER BY d, l_orderkey, l_linenumber
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) cum
  FROM li)
SELECT l_partkey, CAST(d AS BIGINT) cross_day,
       CAST(cum AS BIGINT) cum_qty
FROM run WHERE cum >= 100 AND cum - qty < 100"""


def q_vocab_coverage(spark, sf_dir):
    """Token-coverage curve for tokenizer-vocabulary sizing: rank
    corpus tokens by (count DESC, token), and at every power-of-two
    rank report the cumulative share of corpus tokens a top-v
    vocabulary covers. The raw stream contributes one map-side-
    combinable count; the ranked window runs over the DISTINCT-TOKEN
    rollup only (vocabulary-sized, orders of magnitude below corpus
    size — at web scale this stage would two-level into per-range
    offsets, same algebra). Power-of-two picks via rank & (rank−1)."""
    from pyspark.sql import Window

    uni = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.orderBy(F.col("c").desc(), "tok").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = uni.select(
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), "tok"))
        .alias("vocab_size"),
        F.sum("c").over(w).alias("covered"),
    )
    total = uni.groupBy().agg(F.sum("c").alias("n_tok"))
    return (
        ranked.where(
            F.expr("(vocab_size & (vocab_size - 1)) = 0")
        )
        .crossJoin(F.broadcast(total))
        .select(
            F.col("vocab_size").cast("bigint").alias("vocab_size"),
            F.col("covered").cast("bigint").alias("covered"),
            F.round(
                F.col("covered").cast("double")
                / F.col("n_tok").cast("double"),
                6,
            ).alias("coverage"),
        )
    )


SQL_VOCAB_COVERAGE = """
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) t FROM documents),
uni AS (SELECT t, count(*) c FROM tok GROUP BY 1),
ranked AS (
  SELECT row_number() OVER (ORDER BY c DESC, t) vocab_size,
         sum(c) OVER (ORDER BY c DESC, t
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) covered
  FROM uni),
total AS (SELECT sum(c) n_tok FROM uni)
SELECT CAST(vocab_size AS BIGINT) vocab_size,
       CAST(covered AS BIGINT) covered,
       round(CAST(covered AS DOUBLE) / CAST(n_tok AS DOUBLE), 6)
         coverage
FROM ranked, total
WHERE (vocab_size & (vocab_size - 1)) = 0"""


def q_padding_waste(spark, sf_dir):
    """Padding waste of power-of-two length bucketing (the training
    batcher's bucket audit): each document pads to the smallest power
    of two ≥ its token length (floor-log2 via length(bin(x))−1 — the
    cross-engine-identical recipe, exact-length docs stay put); per
    bucket report docs, real tokens, padded tokens and the waste share
    pad/(pad+tokens) at 6dp. One map-side-combinable groupBy."""
    docs = _t(spark, sf_dir, "documents").select(
        F.size(F.split("text", " ")).cast("bigint").alias("len")
    )
    pad_to = F.expr(
        "CASE WHEN len <= 1 THEN 1"
        " WHEN len = (CAST(1 AS BIGINT) << (length(bin(len)) - 1))"
        " THEN len"
        " ELSE (CAST(1 AS BIGINT) << length(bin(len))) END"
    )
    b = docs.select(
        pad_to.alias("bucket"), "len"
    ).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("len").cast("bigint").alias("n_tokens"),
        F.sum(F.col("bucket") - F.col("len"))
        .cast("bigint")
        .alias("n_pad"),
    )
    return b.select(
        F.col("bucket").cast("bigint").alias("bucket"),
        "n_docs",
        "n_tokens",
        "n_pad",
        F.round(
            F.col("n_pad").cast("double")
            / (F.col("n_pad") + F.col("n_tokens")).cast("double"),
            6,
        ).alias("waste_share"),
    )


SQL_PADDING_WASTE = """
WITH d AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) l
  FROM documents),
b AS (
  SELECT CASE WHEN l <= 1 THEN 1
              WHEN l = (1::BIGINT << (length(bin(l)) - 1)) THEN l
              ELSE (1::BIGINT << length(bin(l))) END bucket,
         l
  FROM d),
a AS (
  SELECT bucket,
         CAST(count(*) AS BIGINT) n_docs,
         CAST(sum(l) AS BIGINT) n_tokens,
         CAST(sum(bucket - l) AS BIGINT) n_pad
  FROM b GROUP BY 1)
SELECT CAST(bucket AS BIGINT) bucket, n_docs, n_tokens, n_pad,
       round(CAST(n_pad AS DOUBLE)
             / CAST(n_pad + n_tokens AS DOUBLE), 6) waste_share
FROM a"""


def q_target_encoding(spark, sf_dir):
    """Smoothed mean-target encoding of customer market segment against
    P(order status = 'F') — the leakage-safe categorical feature for
    tabular ML. enc = (pos·G_n + m·G_pos) / ((n+m)·G_n) with m = 10
    keeps EVERYTHING integer until one final division: the smoothing
    blend of per-segment and global rates is a single rational, summed
    in DECIMAL(38,0) headroom. One broadcast dim join + one map-side-
    combinable aggregate; the global prior broadcasts back."""
    m = 10
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.when(F.col("o_orderstatus") == "F", 1)
        .otherwise(0)
        .alias("pos"),
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    seg = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("pos").cast("bigint").alias("n_pos"),
        )
    )
    g = seg.groupBy().agg(
        F.sum("n").alias("g_n"), F.sum("n_pos").alias("g_pos")
    )
    d = lambda c_: F.col(c_).cast("decimal(38,0)")  # noqa: E731
    return seg.crossJoin(F.broadcast(g)).select(
        "segment",
        "n",
        "n_pos",
        F.round(
            (d("n_pos") * d("g_n") + m * d("g_pos")).cast("double")
            / ((d("n") + m) * d("g_n")).cast("double"),
            6,
        ).alias("enc"),
    )


SQL_TARGET_ENCODING = """
WITH o AS (
  SELECT o_custkey,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END pos
  FROM orders),
seg AS (
  SELECT c_mktsegment segment,
         CAST(count(*) AS BIGINT) n,
         CAST(sum(pos) AS BIGINT) n_pos
  FROM o JOIN customer ON o_custkey = c_custkey
  GROUP BY 1),
g AS (SELECT sum(n) g_n, sum(n_pos) g_pos FROM seg)
SELECT segment, n, n_pos,
       round(CAST(CAST(n_pos AS HUGEINT) * g_n + 10 * g_pos AS DOUBLE)
             / CAST((CAST(n AS HUGEINT) + 10) * g_n AS DOUBLE), 6) enc
FROM seg, g"""


def q_cuped_adjust(spark, sf_dir):
    """CUPED variance-reduced A/B readout: users split by user_id
    parity; pre-period covariate x = first-7-days spend, outcome y =
    remaining spend. θ = cov(x,y)/var(x) pools ALL users from
    DECIMAL(38,0)-exact sufficient statistics (one IEEE division — the
    group_ols discipline, and like the intercept there the RAW θ feeds
    the adjustment; rounding it first would amplify through mean(x)),
    then adj_mean = ȳ_v − θ·(x̄_v − x̄). Three broadcast scalars onto a
    two-row variant table; the only data-volume stage is the per-user
    rollup."""
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        F.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000"
        ).alias("day"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    d0 = e.groupBy().agg(F.min("day").alias("d0"))
    per_user = (
        e.crossJoin(F.broadcast(d0))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("day") < F.col("d0") + 7, F.col("cents"))
                .otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(F.col("day") >= F.col("d0") + 7, F.col("cents"))
                .otherwise(0)
            ).alias("y"),
        )
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    stats = per_user.groupBy().agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        F.sum(d("x")).alias("_sx"),
        F.sum(d("y")).alias("_sy"),
        F.sum(d("x") * d("y")).alias("_sxy"),
        F.sum(d("x") * d("x")).alias("_sxx"),
    )
    theta = stats.select(
        (
            (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
            .cast("double")
            / (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
            .cast("double")
        ).alias("theta_raw"),
        (F.col("_sx").cast("double") / F.col("_n").cast("double")).alias(
            "gmean_x"
        ),
    )
    var = per_user.groupBy(
        (F.col("user_id") % 2).cast("bigint").alias("variant")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(d("x")).alias("_vx"),
        F.sum(d("y")).alias("_vy"),
    )
    return var.crossJoin(F.broadcast(theta)).select(
        "variant",
        "n_users",
        F.round(
            F.col("_vy").cast("double") / F.col("n_users").cast("double"),
            6,
        ).alias("mean_post"),
        F.round(
            F.col("_vy").cast("double") / F.col("n_users").cast("double")
            - F.col("theta_raw")
            * (
                F.col("_vx").cast("double")
                / F.col("n_users").cast("double")
                - F.col("gmean_x")
            ),
            6,
        ).alias("adj_mean"),
        F.round(F.col("theta_raw"), 6).alias("theta"),
    )


SQL_CUPED_ADJUST = """
WITH e AS (
  SELECT user_id, epoch_us(ts) // 86400000000 d,
         CAST(round(value * 100, 0) AS BIGINT) cents
  FROM events),
d0 AS (SELECT min(d) d0 FROM e),
pu AS (
  SELECT user_id,
         sum(CASE WHEN d < d0 + 7 THEN cents ELSE 0 END) x,
         sum(CASE WHEN d >= d0 + 7 THEN cents ELSE 0 END) y
  FROM e, d0 GROUP BY 1),
st AS (
  SELECT CAST(count(*) AS HUGEINT) n,
         sum(CAST(x AS HUGEINT)) sx, sum(CAST(y AS HUGEINT)) sy,
         sum(CAST(x AS HUGEINT) * y) sxy,
         sum(CAST(x AS HUGEINT) * x) sxx
  FROM pu),
th AS (
  SELECT CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) theta_raw,
         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) gmean_x
  FROM st),
v AS (
  SELECT CAST(user_id % 2 AS BIGINT) variant,
         CAST(count(*) AS BIGINT) n_users,
         sum(CAST(x AS HUGEINT)) vx, sum(CAST(y AS HUGEINT)) vy
  FROM pu GROUP BY 1)
SELECT variant, n_users,
       round(CAST(vy AS DOUBLE) / CAST(n_users AS DOUBLE), 6) mean_post,
       round(CAST(vy AS DOUBLE) / CAST(n_users AS DOUBLE)
             - theta_raw * (CAST(vx AS DOUBLE) / CAST(n_users AS DOUBLE)
                            - gmean_x), 6) adj_mean,
       round(theta_raw, 6) theta
FROM v, th"""


def q_ks_statistic(spark, sf_dir):
    """One-vs-rest two-sample Kolmogorov–Smirnov D per event type on
    value cents — entirely exact until one division: D·n₁·n₂ =
    max_v |cum₁(≤v)·n₂ − cum₂(≤v)·n₁| is an integer, maximized over the
    DENSE type × distinct-cents frame (the sup over a CDF difference
    lands on a jump of EITHER side, so the per-type cumulative must be
    evaluated at every pooled value, not just the type's own). Both
    the frame and its windows are bounded by #types × value domain
    (≤ 5·49 002 rows at ANY SF); the raw stream contributes one
    map-side-combinable rollup."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    per_type = e.groupBy("event_type", "cents").agg(
        F.count(F.lit(1)).alias("ct")
    )
    totals = e.groupBy("cents").agg(F.count(F.lit(1)).alias("total"))
    types = e.select("event_type").distinct()
    dense = (
        types.crossJoin(F.broadcast(totals))
        .join(per_type, ["event_type", "cents"], "left")
        .select(
            "event_type",
            "cents",
            "total",
            F.coalesce("ct", F.lit(0)).alias("ct"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = dense.select(
        "event_type",
        F.sum("ct").over(w).alias("c1"),
        F.sum("total").over(w).alias("call"),
    ).localCheckpoint(eager=False)  # consumers: n, scored
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    # the max |c1·n2 − c2·n1| needs n1/n2 first: two stages over the
    # bounded cum frame (n = final cumulative per type)
    n = cum.groupBy("event_type").agg(
        F.max("c1").alias("n1"), F.max("call").alias("nn")
    )
    scored = cum.join(F.broadcast(n), "event_type").select(
        "event_type",
        "n1",
        "nn",
        F.abs(
            d("c1") * (d("nn") - d("n1"))
            - (d("call") - d("c1")) * d("n1")
        ).alias("dnum"),
    )
    return scored.groupBy("event_type").agg(
        F.max("n1").cast("bigint").alias("n1"),
        (F.max("nn") - F.max("n1")).cast("bigint").alias("n2"),
        F.round(
            F.max("dnum").cast("double")
            / (F.max(d("n1")) * (F.max(d("nn")) - F.max(d("n1"))))
            .cast("double"),
            6,
        ).alias("ks"),
    )


SQL_KS_STATISTIC = """
WITH e AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) cents
  FROM events),
pt AS (SELECT event_type, cents, count(*) ct FROM e GROUP BY 1, 2),
tot AS (SELECT cents, count(*) total FROM e GROUP BY 1),
ty AS (SELECT DISTINCT event_type FROM e),
dense AS (
  SELECT ty.event_type, tot.cents, tot.total,
         COALESCE(pt.ct, 0) ct
  FROM ty CROSS JOIN tot
  LEFT JOIN pt ON pt.event_type = ty.event_type
              AND pt.cents = tot.cents),
cum AS (
  SELECT event_type,
         sum(ct) OVER (PARTITION BY event_type ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) c1,
         sum(total) OVER (PARTITION BY event_type ORDER BY cents
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) cal
  FROM dense),
n AS (
  SELECT event_type, max(c1) n1, max(cal) nn
  FROM cum GROUP BY 1),
sc AS (
  SELECT cum.event_type, n.n1, n.nn,
         abs(CAST(cum.c1 AS HUGEINT) * (n.nn - n.n1)
             - CAST(cum.cal - cum.c1 AS HUGEINT) * n.n1) dnum
  FROM cum JOIN n ON cum.event_type = n.event_type)
SELECT event_type,
       CAST(max(n1) AS BIGINT) n1,
       CAST(max(nn) - max(n1) AS BIGINT) n2,
       round(CAST(max(dnum) AS DOUBLE)
             / CAST(CAST(max(n1) AS HUGEINT)
                    * (max(nn) - max(n1)) AS DOUBLE), 6) ks
FROM sc GROUP BY 1"""


def q_lorenz_curve(spark, sf_dir):
    """Customer-revenue Lorenz curve at decile grain: ntile(10) over
    the deterministic (cents ASC, custkey ASC) total order, then per
    decile the exact revenue sum and the cumulative share — cumulative
    arithmetic happens on the 10-row decile summary, and the one
    division per row is IEEE on decimal→double casts. Companion to
    revenue_gini (same ordering contract); the global ntile sort is a
    per-customer-rollup sort, and at 100 TB would two-level through a
    range-partitioned histogram (docs/SCALING.md) like the gini rank."""
    from pyspark.sql import Window

    rev = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            ).alias("cents")
        )
    )
    nt = rev.select(
        F.ntile(10)
        .over(Window.orderBy(F.col("cents").asc(), F.col("o_custkey").asc()))
        .cast("bigint")
        .alias("decile"),
        "cents",
    )
    per = nt.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_custs"),
        F.sum("cents").cast("bigint").alias("rev_cents"),
    )
    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = per.groupBy().agg(F.sum("rev_cents").alias("t"))
    return (
        per.select(
            "decile",
            "n_custs",
            "rev_cents",
            F.sum("rev_cents").over(w).alias("cum"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_custs",
            "rev_cents",
            F.round(
                F.col("rev_cents").cast("double") / F.col("t").cast("double"),
                6,
            ).alias("rev_share"),
            F.round(
                F.col("cum").cast("double") / F.col("t").cast("double"), 6
            ).alias("cum_share"),
        )
    )


SQL_LORENZ_CURVE = """
WITH rev AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) cents
  FROM orders GROUP BY 1),
nt AS (
  SELECT CAST(ntile(10) OVER (ORDER BY cents, o_custkey) AS BIGINT)
           decile,
         cents
  FROM rev),
per AS (
  SELECT decile, CAST(count(*) AS BIGINT) n_custs,
         CAST(sum(cents) AS BIGINT) rev_cents
  FROM nt GROUP BY 1),
t AS (SELECT sum(rev_cents) t FROM per)
SELECT decile, n_custs, rev_cents,
       round(CAST(rev_cents AS DOUBLE) / CAST(t AS DOUBLE), 6) rev_share,
       round(CAST(sum(rev_cents) OVER (ORDER BY decile
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) / CAST(t AS DOUBLE), 6) cum_share
FROM per, t"""


def q_conditional_entropy(spark, sf_dir):
    """Per-token successor entropy H(next|tok) over corpus bigrams, in
    exact micro-log10 units: each log10 rounds at 6dp BEFORE the
    difference (the dsir_importance / drift_psi recipe), the per-
    successor terms c_ab·⌊10⁶·(lg c_a − lg c_ab)⌉ sum as exact BIGINTs
    (order-invariant), and ONE division lands in float at the end.
    Everything after the bigram rollup is vocabulary-bounded."""
    toks = _t(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("t")
    )
    bi = (
        toks.where(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "zip_with(slice(t, 1, size(t) - 1),"
                    " slice(t, 2, size(t) - 1),"
                    " (x, y) -> struct(x AS a, y AS b))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    ca = bi.groupBy("a").agg(
        F.sum("c_ab").alias("c_a"),
        F.count(F.lit(1)).cast("bigint").alias("n_succ"),
    )
    term = (
        bi.join(F.broadcast(ca), "a")
        .select(
            "a",
            (
                F.col("c_ab")
                * F.round(
                    (
                        F.round(F.log10("c_a"), 6)
                        - F.round(F.log10("c_ab"), 6)
                    )
                    * 1_000_000,
                    0,
                ).cast("bigint")
            ).alias("mu"),
        )
        .groupBy("a")
        .agg(F.sum("mu").cast("bigint").alias("mu_sum"))
    )
    return ca.join(F.broadcast(term), "a").select(
        F.col("a").alias("tok"),
        "n_succ",
        F.col("c_a").cast("bigint").alias("c_a"),
        F.round(
            F.col("mu_sum").cast("double")
            / (F.col("c_a") * 1_000_000).cast("double"),
            6,
        ).alias("h_log10"),
    )


SQL_CONDITIONAL_ENTROPY = """
WITH d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
tok AS (SELECT doc_id, generate_subscripts(w, 1) i, unnest(w) t FROM d),
bi AS (
  SELECT x.t a, y.t b, count(*) c_ab
  FROM tok x JOIN tok y ON x.doc_id = y.doc_id AND y.i = x.i + 1
  GROUP BY 1, 2),
ca AS (
  SELECT a, sum(c_ab) c_a, CAST(count(*) AS BIGINT) n_succ
  FROM bi GROUP BY 1),
term AS (
  SELECT bi.a,
         CAST(sum(bi.c_ab
                  * CAST(round((round(log10(ca.c_a), 6)
                                - round(log10(bi.c_ab), 6))
                               * 1000000, 0) AS BIGINT))
              AS BIGINT) mu_sum
  FROM bi JOIN ca ON bi.a = ca.a GROUP BY 1)
SELECT ca.a tok, ca.n_succ, CAST(ca.c_a AS BIGINT) c_a,
       round(CAST(term.mu_sum AS DOUBLE)
             / CAST(ca.c_a * 1000000 AS DOUBLE), 6) h_log10
FROM ca JOIN term ON ca.a = term.a"""


def q_runs_test(spark, sf_dir):
    """Wald–Wolfowitz runs statistics per event type: values above vs
    below the nearest-rank median (median ties dropped, the standard
    convention), runs counted as 1 + sign changes along (ts, event_id)
    time order — n_plus, n_minus and runs all exact BIGINTs; the
    z-score is one client-side formula away. Two per-type window
    passes (value rank for the median, time lag for changes); the
    5-row median table broadcasts back onto the stream."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "ts",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.col("cents").asc(), F.col("event_id").asc()
    )
    wn = Window.partitionBy("event_type")
    med = (
        e.select(
            "event_type",
            "cents",
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .where(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("cents").alias("med"))
    )
    signed = (
        e.join(F.broadcast(med), "event_type")
        .where(F.col("cents") != F.col("med"))
        .select(
            "event_type",
            "ts",
            "event_id",
            (F.col("cents") > F.col("med")).cast("int").alias("sgn"),
        )
    )
    wt = Window.partitionBy("event_type").orderBy("ts", "event_id")
    ch = signed.select(
        "event_type",
        "sgn",
        F.when(
            F.lag("sgn").over(wt).isNull()
            | (F.lag("sgn").over(wt) == F.col("sgn")),
            0,
        )
        .otherwise(1)
        .alias("chg"),
    )
    return ch.groupBy("event_type").agg(
        F.sum("sgn").cast("bigint").alias("n_plus"),
        F.sum(1 - F.col("sgn")).cast("bigint").alias("n_minus"),
        (F.sum("chg") + 1).cast("bigint").alias("runs"),
    )


SQL_RUNS_TEST = """
WITH e AS (
  SELECT event_type, event_id, ts,
         CAST(round(value * 100, 0) AS BIGINT) cents
  FROM events),
rk AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY cents, event_id) rn,
         count(*) OVER (PARTITION BY event_type) n
  FROM e),
med AS (
  SELECT event_type, cents med FROM rk WHERE rn = (n + 1) // 2),
sg AS (
  SELECT e.event_type, e.ts, e.event_id,
         CASE WHEN e.cents > med.med THEN 1 ELSE 0 END sgn
  FROM e JOIN med ON e.event_type = med.event_type
  WHERE e.cents <> med.med),
ch AS (
  SELECT event_type, sgn,
         CASE WHEN lag(sgn) OVER w IS NULL
                OR lag(sgn) OVER w = sgn THEN 0 ELSE 1 END chg
  FROM sg
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id))
SELECT event_type,
       CAST(sum(sgn) AS BIGINT) n_plus,
       CAST(sum(1 - sgn) AS BIGINT) n_minus,
       CAST(sum(chg) + 1 AS BIGINT) runs
FROM ch GROUP BY 1"""


def q_acf_daily(spark, sf_dir):
    """Autocorrelation of global daily order revenue at lags 1..7 —
    the seasonality diagnostic. Each lag's Pearson runs over exact
    DECIMAL(38,0) sufficient statistics of the (x_t, x_{t+k}) pairs
    (present-day pairs only), so ACF is order-invariant with the usual
    one-cast-two-sqrt-mul-div IEEE tail. The raw stream contributes one
    map-side-combinable daily rollup (calendar-bounded ≤ ~2 500 rows at
    ANY SF); lags explode on that rollup and the self-join broadcasts."""
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.expr(
                "unix_micros(CAST(o_orderdate AS TIMESTAMP))"
                " div 86400000000"
            ).alias("day")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .alias("rev")
        )
    )
    a = daily.select(
        F.explode(F.expr("sequence(1, 7)")).alias("lag"),
        F.col("day"),
        F.col("rev").alias("x"),
    )
    b = daily.select(
        F.col("day").alias("bday"), F.col("rev").alias("y")
    )
    pairs = a.join(
        F.broadcast(b), F.col("bday") == F.col("day") + F.col("lag")
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    st = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        F.sum(d("x")).alias("_sx"),
        F.sum(d("y")).alias("_sy"),
        F.sum(d("x") * d("y")).alias("_sxy"),
        F.sum(d("x") * d("x")).alias("_sxx"),
        F.sum(d("y") * d("y")).alias("_syy"),
    )
    num = (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast(
        "double"
    )
    dx = (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast(
        "double"
    )
    dy = (F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")).cast(
        "double"
    )
    return st.select(
        F.col("lag").cast("bigint").alias("lag"),
        F.col("_n").cast("bigint").alias("n_pairs"),
        F.when(
            (dx > 0) & (dy > 0), F.round(num / (F.sqrt(dx) * F.sqrt(dy)), 6)
        ).alias("acf"),
    )


SQL_ACF_DAILY = """
WITH daily AS (
  SELECT epoch_us(o_orderdate) // 86400000000 d,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) rev
  FROM orders GROUP BY 1),
lags AS (SELECT unnest(generate_series(1, 7)) k),
pairs AS (
  SELECT k, a.rev x, b.rev y
  FROM lags, daily a, daily b WHERE b.d = a.d + k),
st AS (
  SELECT k, CAST(count(*) AS HUGEINT) n,
         sum(CAST(x AS HUGEINT)) sx, sum(CAST(y AS HUGEINT)) sy,
         sum(CAST(x AS HUGEINT) * y) sxy,
         sum(CAST(x AS HUGEINT) * x) sxx,
         sum(CAST(y AS HUGEINT) * y) syy
  FROM pairs GROUP BY 1),
f AS (
  SELECT k, CAST(n AS BIGINT) n_pairs,
         CAST(n * sxy - sx * sy AS DOUBLE) num,
         CAST(n * sxx - sx * sx AS DOUBLE) dx,
         CAST(n * syy - sy * sy AS DOUBLE) dy
  FROM st)
SELECT CAST(k AS BIGINT) lag, n_pairs,
       CASE WHEN dx > 0 AND dy > 0
            THEN round(num / (sqrt(dx) * sqrt(dy)), 6) END acf
FROM f"""


def q_label_centroid_cosine(spark, sf_dir):
    """Inter-class centroid cosine confusion over the embeddings table
    — which labels' mean vectors point the same way. Embeddings
    quantize to micro-unit integers FIRST (round(x·10⁶) as BIGINT), so
    per-label per-dimension sums are exact and order-invariant (float
    accumulation would drift per partitioning); cosine is scale-
    invariant, so cos(centroid_a, centroid_b) = cos(sum_a, sum_b) and
    the division by n never happens. One posexplode + one (label, dim)
    aggregate; the 10×64 centroid table self-joins broadcast."""
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("label").cast("bigint").alias("label"),
        F.posexplode("embedding").alias("d", "v"),
    )
    s = emb.groupBy("label", "d").agg(
        F.sum(
            F.round(F.col("v").cast("double") * 1_000_000, 0).cast(
                "bigint"
            )
        ).alias("s")
    )
    dd = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    a = s.select(
        F.col("label").alias("la"), "d", F.col("s").alias("sa")
    )
    b = s.select(
        F.col("label").alias("lb"), "d", F.col("s").alias("sb")
    )
    pr = (
        a.join(F.broadcast(b), "d")
        .where(F.col("la") < F.col("lb"))
        .groupBy("la", "lb")
        .agg(
            F.sum(dd("sa") * dd("sb")).alias("_dot"),
            F.sum(dd("sa") * dd("sa")).alias("_na"),
            F.sum(dd("sb") * dd("sb")).alias("_nb"),
        )
    )
    return pr.select(
        "la",
        "lb",
        F.round(
            F.col("_dot").cast("double")
            / (
                F.sqrt(F.col("_na").cast("double"))
                * F.sqrt(F.col("_nb").cast("double"))
            ),
            6,
        ).alias("cos"),
    )


SQL_LABEL_CENTROID_COSINE = """
WITH e AS (
  SELECT CAST(label AS BIGINT) lbl,
         generate_subscripts(embedding, 1) d, unnest(embedding) v
  FROM embeddings),
s AS (
  SELECT lbl, d,
         sum(CAST(round(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT)) s
  FROM e GROUP BY 1, 2),
pr AS (
  SELECT a.lbl la, b.lbl lb,
         sum(CAST(a.s AS HUGEINT) * b.s) dot,
         sum(CAST(a.s AS HUGEINT) * a.s) na,
         sum(CAST(b.s AS HUGEINT) * b.s) nb
  FROM s a JOIN s b ON a.d = b.d AND a.lbl < b.lbl
  GROUP BY 1, 2)
SELECT la, lb,
       round(CAST(dot AS DOUBLE)
             / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))),
             6) cos
FROM pr"""


def q_duplicate_shipments(spark, sf_dir):
    """Duplicate-shipment audit: pairs of line items for the SAME
    (part, quantity) shipping within one day of each other on
    different lines — the double-billing sweep. The pair join is
    EQUI on (l_partkey, qty) with the ±1-day band and the
    (orderkey, linenumber) dedup ordering as residual filters, so it
    co-partitions on the part key and never degenerates into a range
    or cartesian join; at 100 TB the hot (part, qty) groups are
    exactly the AQE skew-split shape."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round("l_quantity", 0).cast("bigint").alias("qty"),
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000"
        ).alias("day"),
    )
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_partkey") == F.col("b.l_partkey"))
            & (F.col("a.qty") == F.col("b.qty"))
            & (
                F.abs(F.col("a.day") - F.col("b.day")) <= 1
            )
            & (
                (F.col("a.l_orderkey") < F.col("b.l_orderkey"))
                | (
                    (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                    & (F.col("a.l_linenumber") < F.col("b.l_linenumber"))
                )
            ),
        )
        .select(
            F.col("a.l_partkey").alias("l_partkey"),
            F.col("a.qty").alias("qty"),
            F.col("a.l_orderkey").alias("o1"),
            F.col("a.l_linenumber").cast("bigint").alias("ln1"),
            F.col("b.l_orderkey").alias("o2"),
            F.col("b.l_linenumber").cast("bigint").alias("ln2"),
            (F.col("b.day") - F.col("a.day"))
            .cast("bigint")
            .alias("day_diff"),
        )
    )


SQL_DUPLICATE_SHIPMENTS = """
WITH li AS (
  SELECT l_partkey, CAST(round(l_quantity, 0) AS BIGINT) qty,
         l_orderkey, l_linenumber,
         epoch_us(l_shipdate) // 86400000000 d
  FROM lineitem)
SELECT a.l_partkey, a.qty,
       a.l_orderkey o1, CAST(a.l_linenumber AS BIGINT) ln1,
       b.l_orderkey o2, CAST(b.l_linenumber AS BIGINT) ln2,
       CAST(b.d - a.d AS BIGINT) day_diff
FROM li a JOIN li b
  ON a.l_partkey = b.l_partkey AND a.qty = b.qty
 AND abs(a.d - b.d) <= 1
 AND (a.l_orderkey < b.l_orderkey
      OR (a.l_orderkey = b.l_orderkey
          AND a.l_linenumber < b.l_linenumber))"""


def q_zipf_fit(spark, sf_dir):
    """Zipf exponent of the corpus token distribution: OLS slope of
    log10(freq) on log10(rank) — but both logs quantize to exact
    micro-unit BIGINTs first (6dp round, the dsir recipe), so the
    sufficient statistics sum EXACTLY in DECIMAL(38,0): a 31-point
    double sum would already be partition-order-dependent. The µ
    scale factors cancel in the slope; r² is scale-free too. Rank
    window runs on the vocabulary-sized rollup."""
    from pyspark.sql import Window

    uni = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pts = uni.select(
        F.round(
            F.round(
                F.log10(
                    F.row_number().over(
                        Window.orderBy(F.col("c").desc(), "tok")
                    )
                ),
                6,
            )
            * 1_000_000,
            0,
        )
        .cast("bigint")
        .alias("mx"),
        F.round(F.round(F.log10("c"), 6) * 1_000_000, 0)
        .cast("bigint")
        .alias("my"),
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    st = pts.groupBy().agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        F.sum(d("mx")).alias("_sx"),
        F.sum(d("my")).alias("_sy"),
        F.sum(d("mx") * d("my")).alias("_sxy"),
        F.sum(d("mx") * d("mx")).alias("_sxx"),
        F.sum(d("my") * d("my")).alias("_syy"),
    )
    num = (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast(
        "double"
    )
    dx = (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast(
        "double"
    )
    dy = (F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")).cast(
        "double"
    )
    return st.select(
        F.col("_n").cast("bigint").alias("n_types"),
        F.round(num / dx, 6).alias("zipf_slope"),
        F.round((num / dx) * (num / dy), 6).alias("r2"),
    )


SQL_ZIPF_FIT = """
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) t FROM documents),
uni AS (SELECT t, count(*) c FROM tok GROUP BY 1),
pts AS (
  SELECT CAST(round(round(log10(row_number()
                    OVER (ORDER BY c DESC, t)), 6) * 1000000, 0)
              AS BIGINT) mx,
         CAST(round(round(log10(c), 6) * 1000000, 0) AS BIGINT) my
  FROM uni),
st AS (
  SELECT CAST(count(*) AS HUGEINT) n,
         sum(CAST(mx AS HUGEINT)) sx, sum(CAST(my AS HUGEINT)) sy,
         sum(CAST(mx AS HUGEINT) * my) sxy,
         sum(CAST(mx AS HUGEINT) * mx) sxx,
         sum(CAST(my AS HUGEINT) * my) syy
  FROM pts),
f AS (
  SELECT CAST(n AS BIGINT) n_types,
         CAST(n * sxy - sx * sy AS DOUBLE) num,
         CAST(n * sxx - sx * sx AS DOUBLE) dx,
         CAST(n * syy - sy * sy AS DOUBLE) dy
  FROM st)
SELECT n_types, round(num / dx, 6) zipf_slope,
       round((num / dx) * (num / dy), 6) r2
FROM f"""


def q_lexical_richness(spark, sf_dir):
    """Per-source lexical profile: token count, type count, hapax
    count (types seen once within the source) and the type-token
    ratio — the corpus-diversity audit a mixture policy reads before
    weighting sources. One (source, token) rollup (map-side
    combinable) then a source aggregate; all integers, one division."""
    st = (
        _t(spark, sf_dir, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return st.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hapax"),
        F.round(
            F.count(F.lit(1)).cast("double")
            / F.sum("c").cast("double"),
            6,
        ).alias("ttr"),
    )


SQL_LEXICAL_RICHNESS = """
WITH t AS (
  SELECT source, unnest(string_split(text, ' ')) tok FROM documents),
st AS (SELECT source, tok, count(*) c FROM t GROUP BY 1, 2)
SELECT source,
       CAST(sum(c) AS BIGINT) n_tokens,
       CAST(count(*) AS BIGINT) n_types,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) n_hapax,
       round(CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) ttr
FROM st GROUP BY 1"""


def q_class_weights(spark, sf_dir):
    """Inverse-frequency class weights over the embeddings labels,
    normalized so Σ w_c·n_c = N (the loss-balancing convention):
    w_c = N / (K·n_c) — one exact integer ratio per class, one IEEE
    division. Single aggregate + two broadcast scalars."""
    n = _t(spark, sf_dir, "embeddings").groupBy(
        F.col("label").cast("bigint").alias("label")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = n.groupBy().agg(
        F.sum("n").alias("total"),
        F.count(F.lit(1)).alias("k"),
    )
    return n.crossJoin(F.broadcast(tot)).select(
        "label",
        "n",
        F.round(
            F.col("total").cast("double")
            / (F.col("k") * F.col("n")).cast("double"),
            6,
        ).alias("weight"),
    )


SQL_CLASS_WEIGHTS = """
WITH n AS (
  SELECT CAST(label AS BIGINT) lbl, CAST(count(*) AS BIGINT) n
  FROM embeddings GROUP BY 1),
t AS (SELECT sum(n) total, count(*) k FROM n)
SELECT lbl AS "label", n,
       round(CAST(total AS DOUBLE) / CAST(k * n AS DOUBLE), 6) weight
FROM n, t"""


def q_adamic_adar(spark, sf_dir):
    """Adamic–Adar link prediction over the triple graph: non-adjacent
    pairs scored by Σ_m 1/log10(deg m) over common neighbors — rare
    hubs vouch harder than celebrities. Each hub's reciprocal log
    quantizes to nano-unit BIGINTs (round(10⁹/round(log10 d, 6)) — a
    double SUM of reciprocals would be partition-order-dependent; the
    quantized sum is exact), so scores are order-invariant with one
    final division. deg ≥ 2 for any common neighbor, so log10 never
    hits zero. Same wedge + anti-join shape as common_neighbor_scores
    (operators/graph.py) with its O(Σ deg²) celebrity caveat."""
    tri = q_kg_triples(spark, sf_dir)
    e0 = (
        tri.select(
            F.least("subj", "obj").alias("a"),
            F.greatest("subj", "obj").alias("b"),
        )
        .where(
            F.col("subj").isNotNull()
            & F.col("obj").isNotNull()
            & (F.col("subj") != F.col("obj"))
        )
        .distinct()
        .localCheckpoint(eager=False)  # consumers: adjacency, anti-join
    )
    adj = (
        e0.unionAll(
            e0.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .localCheckpoint(eager=False)  # consumers: wedge l/r, degrees
    )
    wmu = adj.groupBy(F.col("a").alias("m")).agg(
        F.round(
            F.lit(1_000_000_000)
            / F.round(F.log10(F.count(F.lit(1))), 6),
            0,
        )
        .cast("bigint")
        .alias("w")
    )
    wedge = (
        adj.select(F.col("b").alias("m"), F.col("a").alias("x"))
        .join(
            adj.select(F.col("a").alias("m"), F.col("b").alias("y")), "m"
        )
        .where(F.col("x") < F.col("y"))
        .join(F.broadcast(wmu), "m")
        .groupBy(F.col("x").alias("node_a"), F.col("y").alias("node_b"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
            F.sum("w").alias("mu"),
        )
    )
    nonadj = wedge.join(
        e0.select(F.col("a").alias("node_a"), F.col("b").alias("node_b")),
        ["node_a", "node_b"],
        "left_anti",
    )
    return nonadj.select(
        "node_a",
        "node_b",
        "n_common",
        F.round(F.col("mu").cast("double") / 1e9, 6).alias("aa_score"),
    )


SQL_ADAMIC_ADAR = f"""
WITH t AS ({SQL_KG_TRIPLES}),
e AS (SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
      FROM t WHERE subj IS NOT NULL AND obj IS NOT NULL
        AND subj <> obj),
adj AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
wmu AS (SELECT a AS m,
               CAST(round(1000000000 / round(log10(count(*)), 6), 0)
                    AS BIGINT) w
        FROM adj GROUP BY 1),
wedge AS (
  SELECT l.a AS node_a, r.b AS node_b,
         CAST(count(*) AS BIGINT) n_common,
         sum(wmu.w) mu
  FROM adj l JOIN adj r ON l.b = r.a AND l.a < r.b
  JOIN wmu ON wmu.m = l.b
  GROUP BY 1, 2),
nonadj AS (
  SELECT w.* FROM wedge w
  WHERE NOT EXISTS (SELECT 1 FROM e
                    WHERE e.a = w.node_a AND e.b = w.node_b))
SELECT node_a, node_b, n_common,
       round(CAST(mu AS DOUBLE) / 1e9, 6) aa_score
FROM nonadj"""


def q_revenue_bridge(spark, sf_dir):
    """Month-over-month revenue bridge (the SaaS waterfall): per
    customer-month cents, one per-customer window pass (lag AND lead
    on the same sort) classifies new / resurrected / expansion /
    contraction and charges churn to the month AFTER the last active
    one. All amounts exact BIGINTs, and the bridge identity
    Δtotal = new + resurrected + expansion − contraction − churned
    holds exactly month over month. The monthly summaries are
    calendar-bounded, so the class/churn recombination broadcasts."""
    from pyspark.sql import Window

    cm = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            "o_custkey",
            (
                F.year("o_orderdate") * 12 + F.month("o_orderdate")
            ).cast("bigint").alias("mk"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .alias("cents")
        )
    )
    w = Window.partitionBy("o_custkey").orderBy("mk")
    st = cm.select(
        "mk",
        "cents",
        F.lag("mk").over(w).alias("pmk"),
        F.lag("cents").over(w).alias("pcents"),
        F.lead("mk").over(w).alias("nmk"),
    ).localCheckpoint(eager=False)  # consumers: classes, churn
    classes = st.groupBy("mk").agg(
        F.sum(
            F.when(F.col("pmk").isNull(), F.col("cents")).otherwise(0)
        )
        .cast("bigint")
        .alias("new_cents"),
        F.sum(
            F.when(
                F.col("pmk").isNotNull() & (F.col("pmk") < F.col("mk") - 1),
                F.col("cents"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("resurrected_cents"),
        F.sum(
            F.when(
                (F.col("pmk") == F.col("mk") - 1)
                & (F.col("cents") > F.col("pcents")),
                F.col("cents") - F.col("pcents"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("expansion_cents"),
        F.sum(
            F.when(
                (F.col("pmk") == F.col("mk") - 1)
                & (F.col("cents") < F.col("pcents")),
                F.col("pcents") - F.col("cents"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("contraction_cents"),
    )
    churn = (
        st.where(F.col("nmk").isNull() | (F.col("nmk") > F.col("mk") + 1))
        .groupBy((F.col("mk") + 1).alias("mk"))
        .agg(F.sum("cents").cast("bigint").alias("churned_cents"))
    )
    months = classes.select("mk").distinct()
    return (
        months.join(F.broadcast(classes), "mk", "left")
        .join(F.broadcast(churn), "mk", "left")
        .select(
            F.col("mk").alias("month_key"),
            *[
                F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c)
                for c in (
                    "new_cents",
                    "resurrected_cents",
                    "expansion_cents",
                    "contraction_cents",
                    "churned_cents",
                )
            ],
        )
    )


SQL_REVENUE_BRIDGE = """
WITH cm AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) mk,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) cents
  FROM orders GROUP BY 1, 2),
st AS (
  SELECT mk, cents,
         lag(mk) OVER w pmk, lag(cents) OVER w pcents,
         lead(mk) OVER w nmk
  FROM cm WINDOW w AS (PARTITION BY o_custkey ORDER BY mk)),
cl AS (
  SELECT mk,
         CAST(sum(CASE WHEN pmk IS NULL THEN cents ELSE 0 END)
              AS BIGINT) new_cents,
         CAST(sum(CASE WHEN pmk IS NOT NULL AND pmk < mk - 1
                       THEN cents ELSE 0 END) AS BIGINT)
           resurrected_cents,
         CAST(sum(CASE WHEN pmk = mk - 1 AND cents > pcents
                       THEN cents - pcents ELSE 0 END) AS BIGINT)
           expansion_cents,
         CAST(sum(CASE WHEN pmk = mk - 1 AND cents < pcents
                       THEN pcents - cents ELSE 0 END) AS BIGINT)
           contraction_cents
  FROM st GROUP BY 1),
ch AS (
  SELECT mk + 1 mk, CAST(sum(cents) AS BIGINT) churned_cents
  FROM st WHERE nmk IS NULL OR nmk > mk + 1
  GROUP BY 1)
SELECT cl.mk month_key,
       CAST(COALESCE(cl.new_cents, 0) AS BIGINT) new_cents,
       CAST(COALESCE(cl.resurrected_cents, 0) AS BIGINT)
         resurrected_cents,
       CAST(COALESCE(cl.expansion_cents, 0) AS BIGINT) expansion_cents,
       CAST(COALESCE(cl.contraction_cents, 0) AS BIGINT)
         contraction_cents,
       CAST(COALESCE(ch.churned_cents, 0) AS BIGINT) churned_cents
FROM cl LEFT JOIN ch ON cl.mk = ch.mk"""


def q_engagement_ccdf(spark, sf_dir):
    """Engagement CCDF at power-of-two thresholds: for k = 1, 2, 4, …
    the user count (and share) with ≥ k events. The k-spine derives
    from floor-log2(max count) (length(bin(x))−1, the cross-engine
    recipe), so each per-user rollup row joins ≤ log₂(max) spine rows —
    a bounded broadcast fan-out, no window, no sort anywhere."""
    uc = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spine = (
        uc.groupBy()
        .agg(F.max("cnt").alias("mx"), F.count(F.lit(1)).alias("n_users"))
        .select(
            "n_users",
            F.explode(
                F.expr("sequence(0, length(bin(mx)) - 1)")
            ).alias("i"),
        )
        .select(
            "n_users", F.expr("CAST(1 AS BIGINT) << i").alias("k")
        )
    )
    return (
        uc.join(F.broadcast(spine), F.col("cnt") >= F.col("k"))
        .groupBy("k", "n_users")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users_ge"))
        .select(
            "k",
            "n_users_ge",
            F.round(
                F.col("n_users_ge").cast("double")
                / F.col("n_users").cast("double"),
                6,
            ).alias("share"),
        )
    )


SQL_ENGAGEMENT_CCDF = """
WITH uc AS (
  SELECT user_id, count(*) cnt FROM events GROUP BY 1),
mx AS (SELECT max(cnt) mx, count(*) n_users FROM uc),
spine AS (
  SELECT n_users,
         (1::BIGINT << unnest(generate_series(0, length(bin(mx)) - 1)))
           k
  FROM mx)
SELECT k, CAST(count(*) AS BIGINT) n_users_ge,
       round(CAST(count(*) AS DOUBLE) / CAST(max(n_users) AS DOUBLE), 6)
         AS "share"
FROM uc JOIN spine ON uc.cnt >= spine.k
GROUP BY k"""


def q_token_source_mi(spark, sf_dir):
    """Per-source mutual-information contribution between tokens and
    sources — how source-specific a corpus slice's vocabulary is (the
    mixture-weighting diagnostic). MI_s = Σ_t (c_ts/N)·log10(N·c_ts /
    (c_t·c_s)): all four log10s round at 6dp BEFORE combining (the
    dsir recipe), each term quantizes to micro-units scaled by the
    integer c_ts, the per-source sum is an exact BIGINT, and N divides
    once at the end. Rollups are vocabulary × source bounded."""
    st = (
        _t(spark, sf_dir, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c_ts"))
        .localCheckpoint(eager=False)  # consumers: marginals, terms
    )
    ct = st.groupBy("tok").agg(F.sum("c_ts").alias("c_t"))
    cs = st.groupBy("source").agg(F.sum("c_ts").alias("c_s"))
    n = st.groupBy().agg(F.sum("c_ts").alias("n_all"))
    lg = lambda c: F.round(F.log10(c), 6)  # noqa: E731
    terms = (
        st.join(F.broadcast(ct), "tok")
        .join(F.broadcast(cs), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "c_s",
            "n_all",
            (
                F.col("c_ts")
                * F.round(
                    (
                        lg("c_ts")
                        + lg("n_all")
                        - lg("c_t")
                        - lg("c_s")
                    )
                    * 1_000_000,
                    0,
                ).cast("bigint")
            ).alias("mu"),
        )
    )
    return terms.groupBy("source").agg(
        F.max("c_s").cast("bigint").alias("n_tokens"),
        F.round(
            F.sum("mu").cast("double")
            / (F.max("n_all") * 1_000_000).cast("double"),
            6,
        ).alias("mi"),
    )


SQL_TOKEN_SOURCE_MI = """
WITH t AS (
  SELECT source, unnest(string_split(text, ' ')) tok FROM documents),
st AS (SELECT source, tok, count(*) c_ts FROM t GROUP BY 1, 2),
ct AS (SELECT tok, sum(c_ts) c_t FROM st GROUP BY 1),
cs AS (SELECT source, sum(c_ts) c_s FROM st GROUP BY 1),
n AS (SELECT sum(c_ts) n_all FROM st),
terms AS (
  SELECT st.source, cs.c_s, n.n_all,
         st.c_ts * CAST(round((round(log10(st.c_ts), 6)
                               + round(log10(n.n_all), 6)
                               - round(log10(ct.c_t), 6)
                               - round(log10(cs.c_s), 6))
                              * 1000000, 0) AS BIGINT) mu
  FROM st JOIN ct ON st.tok = ct.tok
  JOIN cs ON st.source = cs.source, n)
SELECT source, CAST(max(c_s) AS BIGINT) n_tokens,
       round(CAST(sum(mu) AS DOUBLE)
             / CAST(max(n_all) * 1000000 AS DOUBLE), 6) mi
FROM terms GROUP BY 1"""


def q_interarrival_hist(spark, sf_dir):
    """Inter-arrival-time histogram per event type at power-of-two
    second buckets (bucket −1 holds sub-second gaps): one per-type lag
    window, then a map-side-combinable bucket count via the
    cross-engine floor-log2. The Poisson-or-bursty shape diagnostic a
    capacity planner reads before sizing stream partitions."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("event_type").orderBy("us", "event_id")
    gaps = e.select(
        "event_type",
        (
            (F.col("us") - F.lag("us").over(w)) / F.lit(1_000_000)
        )
        .cast("bigint")
        .alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    b = gaps.select(
        "event_type",
        F.when(F.col("gap_s") <= 0, F.lit(-1))
        .otherwise(F.expr("length(bin(gap_s)) - 1"))
        .cast("bigint")
        .alias("bucket"),
    )
    return b.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).select(
        "event_type",
        "bucket",
        F.when(F.col("bucket") < 0, F.lit(0))
        .otherwise(F.expr("CAST(1 AS BIGINT) << bucket"))
        .cast("bigint")
        .alias("gap_lo_s"),
        "n",
    )


SQL_INTERARRIVAL_HIST = """
WITH e AS (
  SELECT event_type, event_id, epoch_us(ts) us FROM events),
g AS (
  SELECT event_type,
         (us - lag(us) OVER (PARTITION BY event_type
                             ORDER BY us, event_id)) // 1000000 gap_s
  FROM e),
b AS (
  SELECT event_type,
         CASE WHEN gap_s <= 0 THEN -1
              ELSE length(bin(gap_s)) - 1 END bucket
  FROM g WHERE gap_s IS NOT NULL)
SELECT event_type, CAST(bucket AS BIGINT) bucket,
       CAST(CASE WHEN bucket < 0 THEN 0
                 ELSE (1::BIGINT << bucket) END AS BIGINT) gap_lo_s,
       CAST(count(*) AS BIGINT) n
FROM b GROUP BY event_type, bucket"""


def q_month_seasonal_index(spark, sf_dir):
    """Calendar-month multiplicative seasonal index of order revenue,
    normalized by OBSERVED order-days so unequal month coverage across
    years doesn't bias the index: idx_m = (rev_m·days_all) /
    (days_m·rev_all) — exact integer cross-products, one IEEE
    division. Month extraction via the engines' identical month();
    both aggregates are calendar-bounded."""
    o = _t(spark, sf_dir, "orders").select(
        F.month("o_orderdate").cast("bigint").alias("m"),
        F.expr(
            "unix_micros(CAST(o_orderdate AS TIMESTAMP))"
            " div 86400000000"
        ).alias("day"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias(
            "cents"
        ),
    )
    per = o.groupBy("m").agg(
        F.countDistinct("day").cast("bigint").alias("n_days"),
        F.sum("cents").cast("bigint").alias("rev_cents"),
    )
    tot = per.groupBy().agg(
        F.sum("n_days").alias("d_all"), F.sum("rev_cents").alias("r_all")
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    return per.crossJoin(F.broadcast(tot)).select(
        F.col("m").alias("month"),
        "n_days",
        "rev_cents",
        F.round(
            (d("rev_cents") * d("d_all")).cast("double")
            / (d("n_days") * d("r_all")).cast("double"),
            6,
        ).alias("seasonal_index"),
    )


SQL_MONTH_SEASONAL_INDEX = """
WITH o AS (
  SELECT CAST(month(o_orderdate) AS BIGINT) m,
         epoch_us(o_orderdate) // 86400000000 d,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) cents
  FROM orders),
per AS (
  SELECT m, CAST(count(DISTINCT d) AS BIGINT) n_days,
         CAST(sum(cents) AS BIGINT) rev_cents
  FROM o GROUP BY 1),
t AS (SELECT sum(n_days) d_all, sum(rev_cents) r_all FROM per)
SELECT m "month", n_days, rev_cents,
       round(CAST(CAST(rev_cents AS HUGEINT) * d_all AS DOUBLE)
             / CAST(CAST(n_days AS HUGEINT) * r_all AS DOUBLE), 6)
         seasonal_index
FROM per, t"""


def q_zonemap_prune_sim(spark, sf_dir):
    """Zone-map pruning simulation — the evidence query behind a
    layout decision: block orders by orderkey (ingest order) vs by
    day-range (partition-on-date), keep per-block min/max day, and
    count blocks a one-year predicate can skip. Both layouts derive
    block ids by pure integer division (NO global sort — the simulation
    keys blocks off the layout column directly, which is exactly what
    a writer's range partitioning produces at scale), so the whole
    query is two map-side-combinable aggregates unioned."""
    lo, hi = 9497, 9862  # calendar year 1996 in epoch days
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(
            "unix_micros(CAST(o_orderdate AS TIMESTAMP))"
            " div 86400000000"
        ).alias("day"),
    )

    def _blocks(block_col, name):
        b = o.groupBy(block_col.alias("blk")).agg(
            F.min("day").alias("mn"), F.max("day").alias("mx")
        )
        return b.groupBy().agg(
            F.lit(name).alias("layout"),
            F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
            F.sum(
                F.when(
                    (F.col("mx") < lo) | (F.col("mn") > hi), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_pruned"),
        )

    res = _blocks(F.expr("o_orderkey div 256"), "by_orderkey").unionAll(
        _blocks(F.expr("day div 8"), "by_day")
    )
    return res.select(
        "layout",
        "n_blocks",
        "n_pruned",
        F.round(
            F.col("n_pruned").cast("double")
            / F.col("n_blocks").cast("double"),
            6,
        ).alias("prune_rate"),
    )


SQL_ZONEMAP_PRUNE_SIM = """
WITH o AS (
  SELECT o_orderkey, epoch_us(o_orderdate) // 86400000000 d
  FROM orders),
bk AS (
  SELECT o_orderkey // 256 blk, min(d) mn, max(d) mx
  FROM o GROUP BY 1),
bd AS (
  SELECT d // 8 blk, min(d) mn, max(d) mx
  FROM o GROUP BY 1),
s AS (
  SELECT 'by_orderkey' layout, CAST(count(*) AS BIGINT) n_blocks,
         CAST(sum(CASE WHEN mx < 9497 OR mn > 9862
                       THEN 1 ELSE 0 END) AS BIGINT) n_pruned
  FROM bk
  UNION ALL
  SELECT 'by_day', CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN mx < 9497 OR mn > 9862
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM bd)
SELECT layout, n_blocks, n_pruned,
       round(CAST(n_pruned AS DOUBLE) / CAST(n_blocks AS DOUBLE), 6)
         prune_rate
FROM s"""


def q_late_arrival_audit(spark, sf_dir):
    """Late-data audit for watermark sizing: replay events in ingest
    order (event_id) per type, track the running max event time, and
    count rows arriving more than 30 minutes behind it — the batch
    measurement that justifies a streaming watermark before deploying
    dropDuplicatesWithinWatermark. One per-type window pass; lateness
    and its maximum are exact integer microseconds."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lat = e.select(
        "event_type",
        (F.max("us").over(w) - F.col("us")).alias("late_us"),
    )
    return lat.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("late_us") > 1_800_000_000, 1).otherwise(0))
        .cast("bigint")
        .alias("n_late"),
        F.max("late_us").cast("bigint").alias("max_late_us"),
        F.round(
            F.sum(
                F.when(F.col("late_us") > 1_800_000_000, 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("late_share"),
    )


SQL_LATE_ARRIVAL_AUDIT = """
WITH e AS (
  SELECT event_type, event_id, epoch_us(ts) us FROM events),
l AS (
  SELECT event_type,
         max(us) OVER (PARTITION BY event_type ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) - us late_us
  FROM e)
SELECT event_type,
       CAST(count(*) AS BIGINT) n_events,
       CAST(sum(CASE WHEN late_us > 1800000000 THEN 1 ELSE 0 END)
            AS BIGINT) n_late,
       CAST(max(late_us) AS BIGINT) max_late_us,
       round(CAST(sum(CASE WHEN late_us > 1800000000
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) late_share
FROM l GROUP BY 1"""


def q_daily_cooccurrence_lift(spark, sf_dir):
    """Event-type co-occurrence lift at user-day grain: for each
    unordered type pair, lift = P(both in a user-day) / (P(a)·P(b)) =
    (n_ab·N)/(n_a·n_b) — exact integer cross-products, one division.
    The distinct (user, day, type) rollup feeds a per-(user, day)
    self-join whose groups are bounded by the type universe (≤ 5
    rows), so the pair stage can never blow up on a hot key."""
    ud = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000"
            ).alias("day"),
            "event_type",
        )
        .distinct()
        .localCheckpoint(eager=False)  # consumers: pairs, marginals, N
    )
    pairs = (
        ud.alias("a")
        .join(
            ud.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
    )
    marg = ud.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_t")
    )
    n = ud.select("user_id", "day").distinct().groupBy().agg(
        F.count(F.lit(1)).alias("n_ud")
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    return (
        pairs.join(
            F.broadcast(marg.select(F.col("event_type").alias("type_a"),
                                    F.col("n_t").alias("n_a"))),
            "type_a",
        )
        .join(
            F.broadcast(marg.select(F.col("event_type").alias("type_b"),
                                    F.col("n_t").alias("n_b"))),
            "type_b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            F.round(
                (d("n_ab") * d("n_ud")).cast("double")
                / (d("n_a") * d("n_b")).cast("double"),
                6,
            ).alias("lift"),
        )
    )


SQL_DAILY_COOCCURRENCE_LIFT = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 d, event_type
  FROM events),
pairs AS (
  SELECT a.event_type type_a, b.event_type type_b,
         CAST(count(*) AS BIGINT) n_ab
  FROM ud a JOIN ud b
    ON a.user_id = b.user_id AND a.d = b.d
   AND a.event_type < b.event_type
  GROUP BY 1, 2),
marg AS (SELECT event_type, count(*) n_t FROM ud GROUP BY 1),
n AS (SELECT count(*) n_ud FROM (SELECT DISTINCT user_id, d FROM ud))
SELECT type_a, type_b, n_ab,
       round(CAST(CAST(n_ab AS HUGEINT) * n_ud AS DOUBLE)
             / CAST(CAST(ma.n_t AS HUGEINT) * mb.n_t AS DOUBLE), 6)
         lift
FROM pairs
JOIN marg ma ON ma.event_type = type_a
JOIN marg mb ON mb.event_type = type_b, n"""


def q_cohort_by_channel(spark, sf_dir):
    """Acquisition-cohort retention by first-touch channel: each user's
    first event (min struct(ts, event_id) — one aggregate, no window)
    sets channel and day 0; report day-1 and day-7 exact-day retention
    per channel. The probe join keys on (user, day0+k) against the
    distinct user-day activity set — equi keys only, broadcast cohort
    side, integer rates."""
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000"
        ).alias("day"),
    ).localCheckpoint(eager=False)  # consumers: firsts, activity
    # (us, event_id) is a total order — same tie-break as the oracle's
    # HUGEINT-encoded arg_min key
    firsts = e.groupBy("user_id").agg(
        F.min(F.struct("us", "event_id", "event_type", "day")).alias("_f")
    ).select(
        "user_id",
        F.col("_f.event_type").alias("channel"),
        F.col("_f.day").alias("day0"),
    )
    probes = firsts.select(
        "user_id",
        "channel",
        F.explode(F.array(F.lit(1), F.lit(7))).alias("k"),
        F.col("day0"),
    ).select(
        "user_id", "channel", "k", (F.col("day0") + F.col("k")).alias("d")
    )
    act = e.select("user_id", "day").distinct()
    hit = probes.join(
        act,
        (probes.user_id == act.user_id) & (probes.d == act.day),
        "left_semi",
    ).groupBy("channel", "k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active")
    )
    cohort = firsts.groupBy("channel").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cohort")
    )
    spine = cohort.crossJoin(
        F.broadcast(
            spark.range(1).select(
                F.explode(F.array(F.lit(1), F.lit(7))).alias("k")
            )
        )
    )
    return spine.join(F.broadcast(hit), ["channel", "k"], "left").select(
        "channel",
        F.col("k").cast("bigint").alias("day_k"),
        "n_cohort",
        F.coalesce("n_active", F.lit(0)).cast("bigint").alias("n_active"),
        F.round(
            F.coalesce("n_active", F.lit(0)).cast("double")
            / F.col("n_cohort").cast("double"),
            6,
        ).alias("retention"),
    )


SQL_COHORT_BY_CHANNEL = """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) us,
         epoch_us(ts) // 86400000000 d
  FROM events),
f AS (
  SELECT user_id,
         arg_min(event_type,
                 us::HUGEINT * 10000000000 + event_id) channel,
         arg_min(d, us::HUGEINT * 10000000000 + event_id) day0
  FROM e GROUP BY 1),
ks AS (SELECT unnest([1, 7]) k),
probes AS (
  SELECT f.user_id, f.channel, ks.k, f.day0 + ks.k d
  FROM f, ks),
act AS (SELECT DISTINCT user_id, d FROM e),
hit AS (
  SELECT channel, k, CAST(count(*) AS BIGINT) n_active
  FROM probes WHERE EXISTS (SELECT 1 FROM act
                            WHERE act.user_id = probes.user_id
                              AND act.d = probes.d)
  GROUP BY 1, 2),
cohort AS (SELECT channel, CAST(count(*) AS BIGINT) n_cohort
           FROM f GROUP BY 1)
SELECT cohort.channel, CAST(ks.k AS BIGINT) day_k, cohort.n_cohort,
       CAST(COALESCE(hit.n_active, 0) AS BIGINT) n_active,
       round(CAST(COALESCE(hit.n_active, 0) AS DOUBLE)
             / CAST(cohort.n_cohort AS DOUBLE), 6) retention
FROM cohort CROSS JOIN ks
LEFT JOIN hit ON hit.channel = cohort.channel AND hit.k = ks.k"""


def q_stickiness_weekly(spark, sf_dir):
    """Weekly DAU/WAU stickiness: per epoch-week, the mean daily
    distinct users over observed days divided by weekly distinct users
    — stickiness = Σ dau / (n_days·wau), one exact integer ratio per
    week. Both distinct counts reduce from the same (user, day, week)
    rollup; epoch-day div 7 weeks avoid engine week-of-year
    semantics."""
    ud = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000"
            ).alias("day"),
        )
        .distinct()
        .select("user_id", "day", F.expr("day div 7").alias("week"))
        .localCheckpoint(eager=False)  # consumers: dau, wau
    )
    dau = ud.groupBy("week", "day").agg(
        F.count(F.lit(1)).alias("dau")
    ).groupBy("week").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("dau").cast("bigint").alias("dau_sum"),
    )
    wau = ud.groupBy("week").agg(
        F.countDistinct("user_id").cast("bigint").alias("wau")
    )
    return dau.join(F.broadcast(wau), "week").select(
        "week",
        "n_days",
        "wau",
        F.round(
            F.col("dau_sum").cast("double")
            / (F.col("n_days") * F.col("wau")).cast("double"),
            6,
        ).alias("stickiness"),
    )


SQL_STICKINESS_WEEKLY = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 d
  FROM events),
udw AS (SELECT user_id, d, d // 7 wk FROM ud),
dau AS (
  SELECT wk, CAST(count(*) AS BIGINT) n_days,
         CAST(sum(dau) AS BIGINT) dau_sum
  FROM (SELECT wk, d, count(*) dau FROM udw GROUP BY 1, 2)
  GROUP BY 1),
wau AS (SELECT wk, CAST(count(DISTINCT user_id) AS BIGINT) wau
        FROM udw GROUP BY 1)
SELECT dau.wk AS "week", dau.n_days, wau.wau,
       round(CAST(dau.dau_sum AS DOUBLE)
             / CAST(dau.n_days * wau.wau AS DOUBLE), 6) stickiness
FROM dau JOIN wau ON dau.wk = wau.wk"""


def q_basket_size_hist(spark, sf_dir):
    """Order-size histogram: orders by line count, with the share of
    orders and of lines each size carries — the denormalization-sizing
    profile. Two map-side-combinable aggregates; grand totals
    broadcast."""
    per = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )
    tot = per.groupBy().agg(
        F.sum("n_orders").alias("t_orders"),
        F.sum(F.col("k") * F.col("n_orders")).alias("t_lines"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        F.col("k").cast("bigint").alias("basket_size"),
        "n_orders",
        F.round(
            F.col("n_orders").cast("double")
            / F.col("t_orders").cast("double"),
            6,
        ).alias("order_share"),
        F.round(
            (F.col("k") * F.col("n_orders")).cast("double")
            / F.col("t_lines").cast("double"),
            6,
        ).alias("line_share"),
    )


SQL_BASKET_SIZE_HIST = """
WITH per AS (
  SELECT k, CAST(count(*) AS BIGINT) n_orders
  FROM (SELECT l_orderkey, count(*) k FROM lineitem GROUP BY 1)
  GROUP BY 1),
t AS (SELECT sum(n_orders) t_orders, sum(k * n_orders) t_lines
      FROM per)
SELECT CAST(k AS BIGINT) basket_size, n_orders,
       round(CAST(n_orders AS DOUBLE) / CAST(t_orders AS DOUBLE), 6)
         order_share,
       round(CAST(k * n_orders AS DOUBLE) / CAST(t_lines AS DOUBLE), 6)
         line_share
FROM per, t"""


def q_dod_change_alerts(spark, sf_dir):
    """Day-over-day revenue-change alerts per event type: flag days
    where |Δ| ≥ 50% of the previous day. The threshold is an INTEGER
    cross-multiplication (2·|cur−prev| ≥ prev) — no float ever decides
    membership, so the flagged set is exact cross-engine; the reported
    ratio rounds only for display. One lag window on the calendar-
    bounded daily rollup."""
    from pyspark.sql import Window

    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000"
            ).alias("day"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .alias("cents")
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    ch = daily.select(
        "event_type",
        "day",
        F.lag("cents").over(w).alias("prev_cents"),
        F.col("cents").alias("cur_cents"),
    ).where(
        F.col("prev_cents").isNotNull()
        & (F.col("prev_cents") > 0)
        & (
            2 * F.abs(F.col("cur_cents") - F.col("prev_cents"))
            >= F.col("prev_cents")
        )
    )
    return ch.select(
        "event_type",
        F.col("day").cast("bigint").alias("day"),
        F.col("prev_cents").cast("bigint").alias("prev_cents"),
        F.col("cur_cents").cast("bigint").alias("cur_cents"),
        F.round(
            F.abs(F.col("cur_cents") - F.col("prev_cents")).cast("double")
            / F.col("prev_cents").cast("double"),
            6,
        ).alias("change_ratio"),
    )


SQL_DOD_CHANGE_ALERTS = """
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 d,
         sum(CAST(round(value * 100, 0) AS BIGINT)) cents
  FROM events GROUP BY 1, 2),
ch AS (
  SELECT event_type, d,
         lag(cents) OVER (PARTITION BY event_type ORDER BY d)
           prev_cents,
         cents cur_cents
  FROM daily)
SELECT event_type, CAST(d AS BIGINT) "day",
       CAST(prev_cents AS BIGINT) prev_cents,
       CAST(cur_cents AS BIGINT) cur_cents,
       round(CAST(abs(cur_cents - prev_cents) AS DOUBLE)
             / CAST(prev_cents AS DOUBLE), 6) change_ratio
FROM ch
WHERE prev_cents IS NOT NULL AND prev_cents > 0
  AND 2 * abs(cur_cents - prev_cents) >= prev_cents"""


def q_load_factor(spark, sf_dir):
    """Peak-to-mean hourly load factor per event type — the capacity-
    sizing number: load = peak_hour_count·n_hours / total_events, an
    exact integer ratio over the hourly rollup (observed hours only).
    One map-side-combinable rollup + one aggregate."""
    hourly = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000"
            ).alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    a = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.max("n").cast("bigint").alias("peak"),
        F.sum("n").cast("bigint").alias("total"),
    )
    return a.select(
        "event_type",
        "n_hours",
        "peak",
        "total",
        F.round(
            (d("peak") * d("n_hours")).cast("double")
            / d("total").cast("double"),
            6,
        ).alias("load_factor"),
    )


SQL_LOAD_FACTOR = """
WITH h AS (
  SELECT event_type, epoch_us(ts) // 3600000000 hr, count(*) n
  FROM events GROUP BY 1, 2)
SELECT event_type,
       CAST(count(*) AS BIGINT) n_hours,
       CAST(max(n) AS BIGINT) peak,
       CAST(sum(n) AS BIGINT) total,
       round(CAST(CAST(max(n) AS HUGEINT) * count(*) AS DOUBLE)
             / CAST(sum(n) AS DOUBLE), 6) load_factor
FROM h GROUP BY 1"""


def q_degree_assortativity(spark, sf_dir):
    """Degree assortativity of the triple graph: Pearson correlation
    between endpoint degrees over the DIRECTED edge list (both
    orientations — the standard symmetric estimator). Degrees join
    back by broadcast; the sufficient statistics sum in DECIMAL(38,0)
    (exact, order-invariant) with the usual IEEE tail. Hub-loving
    graphs score positive, hub-and-spoke graphs negative."""
    tri = q_kg_triples(spark, sf_dir)
    e0 = (
        tri.select(
            F.least("subj", "obj").alias("a"),
            F.greatest("subj", "obj").alias("b"),
        )
        .where(
            F.col("subj").isNotNull()
            & F.col("obj").isNotNull()
            & (F.col("subj") != F.col("obj"))
        )
        .distinct()
        .localCheckpoint(eager=False)  # consumers: adjacency ×2
    )
    adj = e0.unionAll(
        e0.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=False)  # consumers: degrees, edge join
    deg = adj.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    pairs = (
        adj.join(
            F.broadcast(deg.select(F.col("node").alias("a"),
                                   F.col("deg").alias("dx"))),
            "a",
        )
        .join(
            F.broadcast(deg.select(F.col("node").alias("b"),
                                   F.col("deg").alias("dy"))),
            "b",
        )
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    st = pairs.groupBy().agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        F.sum(d("dx")).alias("_sx"),
        F.sum(d("dy")).alias("_sy"),
        F.sum(d("dx") * d("dy")).alias("_sxy"),
        F.sum(d("dx") * d("dx")).alias("_sxx"),
        F.sum(d("dy") * d("dy")).alias("_syy"),
    )
    num = (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast(
        "double"
    )
    dx = (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast(
        "double"
    )
    dy = (F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")).cast(
        "double"
    )
    return st.select(
        (F.col("_n") / 2).cast("bigint").alias("n_edges"),
        F.when(
            (dx > 0) & (dy > 0),
            F.round(num / (F.sqrt(dx) * F.sqrt(dy)), 6),
        ).alias("assortativity"),
    )


SQL_DEGREE_ASSORTATIVITY = f"""
WITH t AS ({SQL_KG_TRIPLES}),
e AS (SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
      FROM t WHERE subj IS NOT NULL AND obj IS NOT NULL
        AND subj <> obj),
adj AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT a AS node, count(*) AS deg FROM adj GROUP BY 1),
pairs AS (
  SELECT da.deg dx, db.deg dy
  FROM adj JOIN deg da ON da.node = adj.a
  JOIN deg db ON db.node = adj.b),
st AS (
  SELECT CAST(count(*) AS HUGEINT) n,
         sum(CAST(dx AS HUGEINT)) sx, sum(CAST(dy AS HUGEINT)) sy,
         sum(CAST(dx AS HUGEINT) * dy) sxy,
         sum(CAST(dx AS HUGEINT) * dx) sxx,
         sum(CAST(dy AS HUGEINT) * dy) syy
  FROM pairs),
f AS (
  SELECT CAST(n / 2 AS BIGINT) n_edges,
         CAST(n * sxy - sx * sy AS DOUBLE) num,
         CAST(n * sxx - sx * sx AS DOUBLE) dx,
         CAST(n * syy - sy * sy AS DOUBLE) dy
  FROM st)
SELECT n_edges,
       CASE WHEN dx > 0 AND dy > 0
            THEN round(num / (sqrt(dx) * sqrt(dy)), 6) END
         assortativity
FROM f"""


def q_purchase_cadence(spark, sf_dir):
    """Purchase cadence by market segment: the nearest-rank median of
    day gaps between a customer's consecutive orders. One per-customer
    lag window produces the gaps; the median ranks within segment over
    the deterministic (gap, custkey, day) order — rank statistics on
    the gap table (one row per repeat order), never the raw stream
    twice. All integers."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.expr(
            "unix_micros(CAST(o_orderdate AS TIMESTAMP))"
            " div 86400000000"
        ).alias("day"),
    )
    w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        "o_orderkey",
        "day",
        (F.col("day") - F.lag("day").over(w)).alias("gap"),
    ).where(F.col("gap").isNotNull())
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    g = gaps.join(
        F.broadcast(cust), gaps.o_custkey == cust.c_custkey
    ).select(F.col("c_mktsegment").alias("segment"), "gap", "o_custkey",
             "day")
    wr = Window.partitionBy("segment").orderBy(
        "gap", "o_custkey", "day"
    )
    wn = Window.partitionBy("segment")
    ranked = g.select(
        "segment",
        "gap",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.where(
        F.col("rn") == F.expr("(n + 1) div 2")
    ).select(
        "segment",
        F.col("n").cast("bigint").alias("n_gaps"),
        F.col("gap").cast("bigint").alias("median_gap_days"),
    )


SQL_PURCHASE_CADENCE = """
WITH o AS (
  SELECT o_custkey, o_orderkey,
         epoch_us(o_orderdate) // 86400000000 d
  FROM orders),
g AS (
  SELECT o_custkey, o_orderkey, d,
         d - lag(d) OVER (PARTITION BY o_custkey
                          ORDER BY d, o_orderkey) gap
  FROM o),
j AS (
  SELECT c_mktsegment segment, gap, o_custkey, d
  FROM g JOIN customer ON o_custkey = c_custkey
  WHERE gap IS NOT NULL),
rk AS (
  SELECT segment, gap,
         row_number() OVER (PARTITION BY segment
                            ORDER BY gap, o_custkey, d) rn,
         count(*) OVER (PARTITION BY segment) n
  FROM j)
SELECT segment, CAST(n AS BIGINT) n_gaps,
       CAST(gap AS BIGINT) median_gap_days
FROM rk WHERE rn = (n + 1) // 2"""


def q_embedding_norm_hist(spark, sf_dir):
    """Per-label histogram of squared embedding norms at power-of-two
    buckets, in exact micro-unit² integers: components quantize to
    round(x·10⁶) BIGINTs, the squared norm sums exactly per vector,
    and the bucket is the cross-engine floor-log2. The norm-collapse
    detector an embedding pipeline runs before trusting cosine
    scores."""
    q = (
        _t(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.col("label").cast("bigint").alias("label"),
            F.explode("embedding").alias("v"),
        )
        .select(
            "vec_id",
            "label",
            F.round(F.col("v").cast("double") * 1_000_000, 0)
            .cast("bigint")
            .alias("qv"),
        )
        .groupBy("vec_id", "label")
        .agg(
            # explicit qv*qv, never pow(): Math.pow is not guaranteed
            # correctly rounded; integer multiply is exact
            F.sum(F.col("qv") * F.col("qv")).alias("q2")
        )
    )
    b = q.select(
        "label",
        F.when(F.col("q2") <= 0, F.lit(-1))
        .otherwise(F.expr("length(bin(q2)) - 1"))
        .cast("bigint")
        .alias("bucket"),
    )
    return b.groupBy("label", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


SQL_EMBEDDING_NORM_HIST = """
WITH e AS (
  SELECT vec_id, CAST(label AS BIGINT) lbl, unnest(embedding) v
  FROM embeddings),
q AS (
  SELECT vec_id, lbl, sum(qv * qv) q2
  FROM (SELECT vec_id, lbl,
               CAST(round(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT) qv
        FROM e)
  GROUP BY 1, 2),
b AS (
  SELECT lbl,
         CASE WHEN q2 <= 0 THEN -1
              ELSE length(bin(q2)) - 1 END bucket
  FROM q)
SELECT lbl AS "label", CAST(bucket AS BIGINT) bucket,
       CAST(count(*) AS BIGINT) n
FROM b GROUP BY lbl, bucket"""


def q_weekend_effect(spark, sf_dir):
    """Weekend revenue effect per event type: mean daily weekend
    revenue over mean daily weekday revenue — exact integer cross-
    products (we_cents·wd_days)/(wd_cents·we_days), one division.
    Day-of-week is pure integer arithmetic ((epoch_day + 4) mod 7,
    0 = Sunday) — never the engines' dayofweek functions, whose
    numbering conventions differ."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000"
            ).alias("day"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .alias("cents")
        )
    )
    flagged = daily.select(
        "event_type",
        "cents",
        F.expr("(day + 4) % 7").isin(0, 6).alias("is_we"),
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    a = flagged.groupBy("event_type").agg(
        F.sum(F.when(~F.col("is_we"), 1).otherwise(0))
        .cast("bigint")
        .alias("wd_days"),
        F.sum(F.when(~F.col("is_we"), F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("wd_cents"),
        F.sum(F.when(F.col("is_we"), 1).otherwise(0))
        .cast("bigint")
        .alias("we_days"),
        F.sum(F.when(F.col("is_we"), F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("we_cents"),
    )
    return a.select(
        "event_type",
        "wd_days",
        "wd_cents",
        "we_days",
        "we_cents",
        F.when(
            (F.col("wd_cents") > 0) & (F.col("we_days") > 0),
            F.round(
                (d("we_cents") * d("wd_days")).cast("double")
                / (d("wd_cents") * d("we_days")).cast("double"),
                6,
            ),
        ).alias("weekend_ratio"),
    )


SQL_WEEKEND_EFFECT = """
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 d,
         sum(CAST(round(value * 100, 0) AS BIGINT)) cents
  FROM events GROUP BY 1, 2),
f AS (
  SELECT event_type, cents,
         ((d + 4) % 7) IN (0, 6) is_we
  FROM daily),
a AS (
  SELECT event_type,
         CAST(sum(CASE WHEN NOT is_we THEN 1 ELSE 0 END) AS BIGINT)
           wd_days,
         CAST(sum(CASE WHEN NOT is_we THEN cents ELSE 0 END) AS BIGINT)
           wd_cents,
         CAST(sum(CASE WHEN is_we THEN 1 ELSE 0 END) AS BIGINT)
           we_days,
         CAST(sum(CASE WHEN is_we THEN cents ELSE 0 END) AS BIGINT)
           we_cents
  FROM f GROUP BY 1)
SELECT event_type, wd_days, wd_cents, we_days, we_cents,
       CASE WHEN wd_cents > 0 AND we_days > 0
            THEN round(CAST(CAST(we_cents AS HUGEINT) * wd_days
                            AS DOUBLE)
                       / CAST(CAST(wd_cents AS HUGEINT) * we_days
                              AS DOUBLE), 6) END weekend_ratio
FROM a"""


def q_shipping_sla(spark, sf_dir):
    """Shipping-latency SLA per order priority: nearest-rank p50/p90
    and max of (shipdate − orderdate) days. One equi join on the order
    key (co-partitioned fact-to-fact — broadcastable at small SF,
    shuffle-hash at 100 TB with AQE), one ranked window per priority
    with the clamped integer rank formulas p50 = (n+1) div 2 and
    p90 = ⌈9n/10⌉ = (9n+9) div 10. All integer days."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000"
        ).alias("sday"),
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.expr(
            "unix_micros(CAST(o_orderdate AS TIMESTAMP))"
            " div 86400000000"
        ).alias("oday"),
    )
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        (F.col("sday") - F.col("oday")).alias("days"),
        "l_orderkey",
        "l_linenumber",
    )
    wr = Window.partitionBy("priority").orderBy(
        "days", "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("priority")
    ranked = lat.select(
        "priority",
        "days",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.groupBy("priority").agg(
        F.max("n").cast("bigint").alias("n_lines"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("days"))
        )
        .cast("bigint")
        .alias("p50_days"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(9 * n + 9) div 10"),
                F.col("days"),
            )
        )
        .cast("bigint")
        .alias("p90_days"),
        F.max("days").cast("bigint").alias("max_days"),
    )


SQL_SHIPPING_SLA = """
WITH lat AS (
  SELECT o_orderpriority priority,
         epoch_us(l_shipdate) // 86400000000
           - epoch_us(o_orderdate) // 86400000000 dy,
         l_orderkey, l_linenumber
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
rk AS (
  SELECT priority, dy,
         row_number() OVER (PARTITION BY priority
                            ORDER BY dy, l_orderkey, l_linenumber)
           rn,
         count(*) OVER (PARTITION BY priority) n
  FROM lat)
SELECT priority,
       CAST(max(n) AS BIGINT) n_lines,
       CAST(max(CASE WHEN rn = (n + 1) // 2 THEN dy END) AS BIGINT)
         p50_days,
       CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN dy END)
            AS BIGINT) p90_days,
       CAST(max(dy) AS BIGINT) max_days
FROM rk GROUP BY 1"""


def q_fano_factor(spark, sf_dir):
    """Burstiness of hourly event arrivals per type via the Fano
    factor (sample variance over mean): F = (n·Σx² − (Σx)²) /
    ((n−1)·Σx) — one exact-integer closed form per type over the
    hourly rollup, one IEEE division. Poisson arrivals score ≈ 1,
    bursty streams > 1 (the partition-count sizing diagnostic)."""
    hourly = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000"
            ).alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    a = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        F.sum(d("x")).alias("_sx"),
        F.sum(d("x") * d("x")).alias("_sxx"),
    )
    return a.select(
        "event_type",
        F.col("_n").cast("bigint").alias("n_hours"),
        F.when(
            (F.col("_n") > 1) & (F.col("_sx") > 0),
            F.round(
                (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
                .cast("double")
                / ((F.col("_n") - 1) * F.col("_sx")).cast("double"),
                6,
            ),
        ).alias("fano"),
    )


SQL_FANO_FACTOR = """
WITH h AS (
  SELECT event_type, epoch_us(ts) // 3600000000 hr, count(*) x
  FROM events GROUP BY 1, 2),
a AS (
  SELECT event_type, CAST(count(*) AS HUGEINT) n,
         sum(CAST(x AS HUGEINT)) sx,
         sum(CAST(x AS HUGEINT) * x) sxx
  FROM h GROUP BY 1)
SELECT event_type, CAST(n AS BIGINT) n_hours,
       CASE WHEN n > 1 AND sx > 0
            THEN round(CAST(n * sxx - sx * sx AS DOUBLE)
                       / CAST((n - 1) * sx AS DOUBLE), 6) END fano
FROM a"""


def q_sequence_violations(spark, sf_dir):
    """Funnel-order integrity: users whose first purchase precedes
    their first signup (or who purchase without ever signing up) — the
    instrumentation-bug detector. Conditional min aggregates per user
    (one map-side-combinable pass, no window), then one global
    summary row with exact counts and the violation share."""
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    per = e.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.col("us"))
        ).alias("first_signup"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("us"))
        ).alias("first_purchase"),
    )
    return per.groupBy().agg(
        F.sum(
            F.when(F.col("first_purchase").isNotNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_purchasers"),
        F.sum(
            F.when(
                F.col("first_purchase").isNotNull()
                & (
                    F.col("first_signup").isNull()
                    | (F.col("first_purchase") < F.col("first_signup"))
                ),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_violating"),
    ).select(
        "n_purchasers",
        "n_violating",
        F.round(
            F.col("n_violating").cast("double")
            / F.col("n_purchasers").cast("double"),
            6,
        ).alias("violation_share"),
    )


SQL_SEQUENCE_VIOLATIONS = """
WITH per AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
           first_signup,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           first_purchase
  FROM events GROUP BY 1),
a AS (
  SELECT CAST(sum(CASE WHEN first_purchase IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) n_purchasers,
         CAST(sum(CASE WHEN first_purchase IS NOT NULL
                        AND (first_signup IS NULL
                             OR first_purchase < first_signup)
                       THEN 1 ELSE 0 END) AS BIGINT) n_violating
  FROM per)
SELECT n_purchasers, n_violating,
       round(CAST(n_violating AS DOUBLE)
             / CAST(n_purchasers AS DOUBLE), 6) violation_share
FROM a"""


def q_reactivation_latency(spark, sf_dir):
    """Reactivation-latency histogram: day gaps ≥ 2 between a user's
    consecutive active days — how long lapsed users stay away before
    returning. One per-user lag window over the distinct (user, day)
    rollup, then a map-side-combinable histogram with the distinct
    returning-user count per gap."""
    from pyspark.sql import Window

    ud = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000"
            ).alias("day"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    gaps = ud.select(
        "user_id",
        (F.col("day") - F.lag("day").over(w)).alias("gap"),
    ).where(F.col("gap") >= 2)
    return gaps.groupBy(F.col("gap").cast("bigint").alias("gap_days")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


SQL_REACTIVATION_LATENCY = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 d
  FROM events),
g AS (
  SELECT user_id,
         d - lag(d) OVER (PARTITION BY user_id ORDER BY d) gap
  FROM ud)
SELECT CAST(gap AS BIGINT) gap_days,
       CAST(count(*) AS BIGINT) n_gaps,
       CAST(count(DISTINCT user_id) AS BIGINT) n_users
FROM g WHERE gap >= 2 GROUP BY 1"""


def q_hourly_envelope(spark, sf_dir):
    """Hour-of-day traffic envelope: nearest-rank p10/p50/p90 of the
    per-day event count at each of the 24 hours — the seasonality band
    an anomaly detector alarms against. The (hour, day) rollup is
    calendar-bounded; ranking windows partition by hour-of-day. Rank
    formulas: p10 = max(1, (n+9) div 10 with clamp via greatest),
    p50 = (n+1) div 2, p90 = (9n+9) div 10 — all integer."""
    from pyspark.sql import Window

    hd = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.expr(
                "(unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000)"
                " % 24"
            ).cast("bigint").alias("hod"),
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000"
            ).alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    wr = Window.partitionBy("hod").orderBy("x", "day")
    wn = Window.partitionBy("hod")
    ranked = hd.select(
        "hod",
        "x",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.groupBy("hod").agg(
        F.max("n").cast("bigint").alias("n_days"),
        F.max(
            F.when(
                F.col("rn") == F.expr("greatest(1, (n + 9) div 10)"),
                F.col("x"),
            )
        )
        .cast("bigint")
        .alias("p10"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("x"))
        )
        .cast("bigint")
        .alias("p50"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(9 * n + 9) div 10"), F.col("x")
            )
        )
        .cast("bigint")
        .alias("p90"),
    )


SQL_HOURLY_ENVELOPE = """
WITH hd AS (
  SELECT CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) hod,
         epoch_us(ts) // 86400000000 d, count(*) x
  FROM events GROUP BY 1, 2),
rk AS (
  SELECT hod, x,
         row_number() OVER (PARTITION BY hod ORDER BY x, d) rn,
         count(*) OVER (PARTITION BY hod) n
  FROM hd)
SELECT hod,
       CAST(max(n) AS BIGINT) n_days,
       CAST(max(CASE WHEN rn = greatest(1, (n + 9) // 10)
                     THEN x END) AS BIGINT) p10,
       CAST(max(CASE WHEN rn = (n + 1) // 2 THEN x END) AS BIGINT) p50,
       CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN x END)
            AS BIGINT) p90
FROM rk GROUP BY 1"""


def q_discount_elasticity(spark, sf_dir):
    """Quantity response to discount level: per integer discount
    percent, mean line quantity relative to the zero-discount baseline
    — ratio = (Σqty_d·n₀)/(n_d·Σqty₀), exact integer cross-products,
    one division. One rollup; the baseline row broadcasts back."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_discount") * 100, 0)
        .cast("bigint")
        .alias("disc_pct"),
        F.round("l_quantity", 0).cast("bigint").alias("qty"),
    )
    per = li.groupBy("disc_pct").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum("qty").cast("bigint").alias("sum_qty"),
    )
    base = per.where(F.col("disc_pct") == 0).select(
        F.col("n_lines").alias("n0"), F.col("sum_qty").alias("q0")
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    return per.crossJoin(F.broadcast(base)).select(
        "disc_pct",
        "n_lines",
        "sum_qty",
        F.round(
            (d("sum_qty") * d("n0")).cast("double")
            / (d("n_lines") * d("q0")).cast("double"),
            6,
        ).alias("qty_ratio_vs_zero"),
    )


SQL_DISCOUNT_ELASTICITY = """
WITH li AS (
  SELECT CAST(round(l_discount * 100, 0) AS BIGINT) disc_pct,
         CAST(round(l_quantity, 0) AS BIGINT) qty
  FROM lineitem),
per AS (
  SELECT disc_pct, CAST(count(*) AS BIGINT) n_lines,
         CAST(sum(qty) AS BIGINT) sum_qty
  FROM li GROUP BY 1),
b AS (SELECT n_lines n0, sum_qty q0 FROM per WHERE disc_pct = 0)
SELECT disc_pct, n_lines, sum_qty,
       round(CAST(CAST(sum_qty AS HUGEINT) * n0 AS DOUBLE)
             / CAST(CAST(n_lines AS HUGEINT) * q0 AS DOUBLE), 6)
         qty_ratio_vs_zero
FROM per, b"""


def q_abc_classification(spark, sf_dir):
    """ABC inventory classification: parts ranked by exact integer-cent
    revenue, cumulatively bucketed A (≤80% of revenue), B (≤95%), C.
    Revenue is summed in integer cents so the cumulative shares are
    exact cross-engine; the class boundary thresholds the ROUNDED
    share. One map-side-combinable groupBy over the fact table; the
    window runs over the *part* grain (dimension-sized — bounded at any
    fact scale) and the 1-row total broadcasts back."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("pk"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
        .cast("bigint")
        .alias("line_cents"),
    )
    rev = li.groupBy("pk").agg(
        F.sum("line_cents").cast("bigint").alias("cents")
    )
    tot = rev.agg(F.sum("cents").cast("bigint").alias("t"))
    w = Window.orderBy(F.desc("cents"), F.asc("pk")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        rev.crossJoin(F.broadcast(tot))
        .withColumn(
            "cum_share", F.round(F.sum("cents").over(w) / F.col("t"), 6)
        )
        .withColumn(
            "abc",
            F.when(F.col("cum_share") <= 0.8, "A")
            .when(F.col("cum_share") <= 0.95, "B")
            .otherwise("C"),
        )
    )
    return (
        cum.groupBy("abc")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
            F.round(F.sum("cents") / F.first("t"), 6).alias("rev_share"),
        )
        .select("abc", "n_parts", "revenue_cents", "rev_share")
    )


SQL_ABC_CLASSIFICATION = """
WITH rev AS (
  SELECT l_partkey pk,
         CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100,0) AS BIGINT))
              AS BIGINT) cents
  FROM lineitem GROUP BY 1),
tot AS (SELECT CAST(sum(cents) AS BIGINT) t FROM rev),
cum AS (SELECT pk, cents,
          round(sum(cents) OVER (ORDER BY cents DESC, pk) * 1.0
                / (SELECT t FROM tot), 6) cum_share
        FROM rev),
cls AS (SELECT pk, cents,
          CASE WHEN cum_share <= 0.8 THEN 'A'
               WHEN cum_share <= 0.95 THEN 'B' ELSE 'C' END abc
        FROM cum)
SELECT abc, CAST(count(*) AS BIGINT) n_parts,
       CAST(sum(cents) AS BIGINT) revenue_cents,
       round(sum(cents)*1.0/(SELECT t FROM tot),6) rev_share
FROM cls GROUP BY 1"""


def q_ndcg_at_k(spark, sf_dir):
    """Ranking-quality evaluation (NDCG@10 per query group): sources
    act as query groups, the system ranking orders docs by n_chars
    (desc, doc_id tiebreak), graded relevance is a deterministic
    per-doc hash grade 0-3 (independent of the ranking feature, so
    NDCG < 1), and the ideal ranking re-sorts by grade.
    DCG = Σ (2^rel − 1)/log2(rank+1) over the top 10. The standard
    offline search-eval metric a retrieval pipeline needs next to
    bm25_rank/search_rank. Two per-source windows — partitioned, never
    a global sort."""
    from pyspark.sql import Window

    from llmaix_spark.operators.linking import stable_hash60_expr

    g = _t(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        "n_chars",
        (
            stable_hash60_expr(
                F.concat(F.col("doc_id").cast("string"), F.lit(":rel"))
            )
            % 4
        )
        .cast("bigint")
        .alias("rel"),
    )
    sys_w = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    ideal_w = Window.partitionBy("source").orderBy(
        F.desc("rel"), F.asc("doc_id")
    )
    gain = lambda rk: (  # noqa: E731
        (F.pow(F.lit(2.0), F.col("rel")) - 1) / F.log2(rk + 1)
    )
    ranked = g.select(
        "source",
        "rel",
        F.row_number().over(sys_w).alias("sys_rk"),
        F.row_number().over(ideal_w).alias("ideal_rk"),
    )
    dcg = (
        ranked.where(F.col("sys_rk") <= 10)
        .groupBy("source")
        .agg(F.round(F.sum(gain(F.col("sys_rk"))), 6).alias("dcg"))
    )
    idcg = (
        ranked.where(F.col("ideal_rk") <= 10)
        .groupBy("source")
        .agg(F.round(F.sum(gain(F.col("ideal_rk"))), 6).alias("idcg"))
    )
    return dcg.join(idcg, "source").select(
        "source",
        "dcg",
        "idcg",
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
    )


SQL_NDCG_AT_K = f"""
WITH g AS (
  SELECT source, doc_id, n_chars,
         CAST({_HASH60_SQL.format(v="CAST(doc_id AS VARCHAR) || ':rel'")} % 4
              AS BIGINT) rel
  FROM documents),
r AS (SELECT source, rel,
        row_number() OVER (PARTITION BY source
                           ORDER BY n_chars DESC, doc_id) sys_rk,
        row_number() OVER (PARTITION BY source
                           ORDER BY rel DESC, doc_id) ideal_rk
      FROM g),
dcg  AS (SELECT source, round(sum((power(2, rel)-1)/log2(sys_rk+1)),6) dcg
         FROM r WHERE sys_rk <= 10 GROUP BY 1),
idcg AS (SELECT source, round(sum((power(2, rel)-1)/log2(ideal_rk+1)),6) idcg
         FROM r WHERE ideal_rk <= 10 GROUP BY 1)
SELECT d.source, dcg, idcg, round(dcg/idcg,6) ndcg
FROM dcg d JOIN idcg USING(source)"""


def q_srm_check(spark, sf_dir):
    """Sample-ratio-mismatch audit of the deterministic hash split: the
    experiment-integrity gate run before trusting any A/B or train/val
    comparison. Per split: observed count, expected count under the
    declared 90/5/5 weights, and the χ² goodness-of-fit contribution
    (obs−exp)²/exp. Counts are exact integers; expectations are the
    same double on both engines. One groupBy over a pure projection —
    no shuffle beyond the 3-group agg; the 1-row total broadcasts."""
    from llmaix_spark.operators.curation import dataset_split

    obs = (
        dataset_split(_t(spark, sf_dir, "documents"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    )
    tot = obs.agg(F.sum("n_obs").cast("bigint").alias("n"))
    ratio = (
        F.when(F.col("split") == "train", F.lit(0.9))
        .when(F.col("split") == "val", F.lit(0.05))
        .otherwise(F.lit(0.05))
    )
    exp = F.col("n").cast("double") * ratio
    return obs.crossJoin(F.broadcast(tot)).select(
        "split",
        "n_obs",
        F.round(exp, 6).alias("expected"),
        F.round(F.pow(F.col("n_obs") - exp, 2) / exp, 6).alias("chi2_part"),
    )


_SRM_RATIO = ("CASE split WHEN 'train' THEN 0.9 WHEN 'val' THEN 0.05 "
              "ELSE 0.05 END")
SQL_SRM_CHECK = f"""
WITH s AS (
  SELECT CASE WHEN {_HASH60_SQL.format(v="CAST(doc_id AS VARCHAR) || ':split'")} % 10000 < 9000 THEN 'train'
              WHEN {_HASH60_SQL.format(v="CAST(doc_id AS VARCHAR) || ':split'")} % 10000 < 9500 THEN 'val'
              ELSE 'test' END split
  FROM documents),
obs AS (SELECT split, CAST(count(*) AS BIGINT) n_obs FROM s GROUP BY 1),
tot AS (SELECT CAST(sum(n_obs) AS BIGINT) n FROM obs)
SELECT split, n_obs,
       round(CAST(n AS DOUBLE) * {_SRM_RATIO}, 6) expected,
       round(power(n_obs - CAST(n AS DOUBLE) * {_SRM_RATIO}, 2)
             / (CAST(n AS DOUBLE) * {_SRM_RATIO}), 6) chi2_part
FROM obs, tot"""


def q_peak_detection(spark, sf_dir):
    """Local-maximum peaks in the daily revenue series: a day is a peak
    when its exact integer-cent revenue strictly exceeds the three
    present days on each side (lag/lead over day order; edges with
    fewer than 3 neighbors are excluded). The change-point companion to
    events_cusum/dod_change_alerts. The window runs over the *daily*
    grain — already aggregated, bounded by calendar length (thousands
    of rows at any fact scale), so the single ordered window is safe."""
    from pyspark.sql import Window

    daily = (
        _t(spark, sf_dir, "orders")
        .select(
            (
                F.unix_micros(F.col("o_orderdate").cast("timestamp"))
                / F.lit(86400000000)
            )
            .cast("bigint")
            .alias("day_idx"),
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("bigint")
            .alias("order_cents"),
        )
        .groupBy("day_idx")
        .agg(F.sum("order_cents").cast("bigint").alias("revenue_cents"))
    )
    w = Window.orderBy("day_idx")
    lagged = daily.select(
        "day_idx",
        "revenue_cents",
        *[
            F.lag("revenue_cents", i).over(w).alias(f"l{i}")
            for i in (1, 2, 3)
        ],
        *[
            F.lead("revenue_cents", i).over(w).alias(f"r{i}")
            for i in (1, 2, 3)
        ],
    )
    c = F.col("revenue_cents")
    return lagged.where(
        F.col("l3").isNotNull()
        & F.col("r3").isNotNull()
        & (c > F.greatest("l1", "l2", "l3"))
        & (c > F.greatest("r1", "r2", "r3"))
    ).select("day_idx", "revenue_cents")


SQL_PEAK_DETECTION = """
WITH daily AS (
  SELECT epoch_us(o_orderdate)//86400000000 d,
         CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) cents
  FROM orders GROUP BY 1),
w AS (SELECT d, cents,
        lag(cents,1) OVER o l1, lag(cents,2) OVER o l2,
        lag(cents,3) OVER o l3,
        lead(cents,1) OVER o r1, lead(cents,2) OVER o r2,
        lead(cents,3) OVER o r3
      FROM daily WINDOW o AS (ORDER BY d))
SELECT CAST(d AS BIGINT) AS day_idx, cents AS revenue_cents FROM w
WHERE l3 IS NOT NULL AND r3 IS NOT NULL
  AND cents > greatest(l1,l2,l3) AND cents > greatest(r1,r2,r3)"""


def q_price_dispersion(spark, sf_dir):
    """Per-part unit-price dispersion profile: realized unit price per
    line rounded to integer cents, then per part the line count, exact
    min/max cents, and relative spread (max−min)/min — the
    price-consistency audit a catalog pipeline runs to flag mispriced
    or heterogeneous SKUs. One map-side-combinable groupBy; the filter
    thresholds the ROUNDED spread so engines agree at the boundary."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 0)
    u = li.select(
        F.col("l_partkey").alias("part_key"),
        F.round(F.col("l_extendedprice") * 100 / F.col("l_quantity"), 0)
        .cast("bigint")
        .alias("unit_cents"),
    )
    agg = u.groupBy("part_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.min("unit_cents").cast("bigint").alias("min_cents"),
        F.max("unit_cents").cast("bigint").alias("max_cents"),
    )
    spread = F.round(
        (F.col("max_cents") - F.col("min_cents")) / F.col("min_cents"), 6
    )
    return agg.withColumn("spread", spread).where(
        (F.col("n_lines") >= 5) & (F.col("spread") >= 0.05)
    )


SQL_PRICE_DISPERSION = """
WITH u AS (
  SELECT l_partkey pk,
         CAST(round(l_extendedprice*100/l_quantity,0) AS BIGINT) unit_cents
  FROM lineitem WHERE l_quantity > 0),
agg AS (SELECT pk, CAST(count(*) AS BIGINT) n_lines,
          CAST(min(unit_cents) AS BIGINT) min_cents,
          CAST(max(unit_cents) AS BIGINT) max_cents
        FROM u GROUP BY 1)
SELECT pk AS part_key, n_lines, min_cents, max_cents,
       round((max_cents-min_cents)*1.0/min_cents,6) spread
FROM agg
WHERE n_lines >= 5 AND round((max_cents-min_cents)*1.0/min_cents,6) >= 0.05"""


def q_containment_dedup(spark, sf_dir):
    """Asymmetric shingle-containment dedup (superstring duplicates):
    see operators/dedup.py containment_pairs — catches a short doc
    fully embedded in a longer one, which Jaccard structurally misses
    (J ≈ |A|/|B| → 0 while C(A→B) = 1)."""
    return dd.containment_pairs(_t(spark, sf_dir, "documents"), 0.8)


SQL_CONTAINMENT_DEDUP = f"""
WITH {_TRIGRAM_SQL},
common AS (SELECT a.doc_id da, b.doc_id db, CAST(count(*) AS BIGINT) c
           FROM sh a
           JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
j AS (SELECT da, db, c,
        round(c * 1.0 / na.n, 6) containment_a,
        round(c * 1.0 / nb.n, 6) containment_b
      FROM common JOIN cnt na ON da = na.doc_id
                  JOIN cnt nb ON db = nb.doc_id)
SELECT da AS doc_a, db AS doc_b, c AS n_common, containment_a, containment_b
FROM j WHERE greatest(containment_a, containment_b) >= 0.8"""


def q_kendall_tau(spark, sf_dir):
    """Exact Kendall τ-b between daily order count and daily revenue
    (the rank-correlation complement of spearman_corr; τ-b applies the
    standard tie correction). Concordant/discordant/tie counts come
    from an all-pairs self-join over the DAILY grain — already
    aggregated, calendar-bounded (thousands of rows at any fact scale),
    so the quadratic join is safe and every count is an exact integer;
    the only floating step is the final sqrt."""
    daily = (
        _t(spark, sf_dir, "orders")
        .select(
            (
                F.unix_micros(F.col("o_orderdate").cast("timestamp"))
                / F.lit(86400000000)
            )
            .cast("bigint")
            .alias("d"),
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("x"),
            F.sum("cents").cast("bigint").alias("y"),
        )
    )
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = a.join(b, F.col("a.d") < F.col("b.d")).select(
        (F.col("a.x") - F.col("b.x")).alias("dx"),
        (F.col("a.y") - F.col("b.y")).alias("dy"),
    )
    cnt = lambda c: F.sum(c.cast("bigint")).cast("bigint")  # noqa: E731
    agg = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        cnt(F.col("dx") * F.col("dy") > 0).alias("concordant"),
        cnt(F.col("dx") * F.col("dy") < 0).alias("discordant"),
        cnt((F.col("dx") == 0) & (F.col("dy") != 0)).alias("ties_x"),
        cnt((F.col("dy") == 0) & (F.col("dx") != 0)).alias("ties_y"),
        cnt((F.col("dx") == 0) & (F.col("dy") == 0)).alias("ties_xy"),
    )
    nx = F.col("n_pairs") - F.col("ties_x") - F.col("ties_xy")
    ny = F.col("n_pairs") - F.col("ties_y") - F.col("ties_xy")
    return agg.select(
        "n_pairs",
        "concordant",
        "discordant",
        "ties_x",
        "ties_y",
        "ties_xy",
        F.round(
            (F.col("concordant") - F.col("discordant"))
            / F.sqrt(nx.cast("double") * ny),
            6,
        ).alias("tau_b"),
    )


SQL_KENDALL_TAU = """
WITH daily AS (
  SELECT epoch_us(o_orderdate)//86400000000 d,
         CAST(count(*) AS BIGINT) x,
         CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) y
  FROM orders GROUP BY 1),
p AS (SELECT a.x xa, a.y ya, b.x xb, b.y yb
      FROM daily a JOIN daily b ON a.d < b.d),
c AS (SELECT
  CAST(count(*) AS BIGINT) n_pairs,
  CAST(count(*) FILTER ((xa-xb)*(ya-yb) > 0) AS BIGINT) concordant,
  CAST(count(*) FILTER ((xa-xb)*(ya-yb) < 0) AS BIGINT) discordant,
  CAST(count(*) FILTER (xa = xb AND ya <> yb) AS BIGINT) ties_x,
  CAST(count(*) FILTER (ya = yb AND xa <> xb) AS BIGINT) ties_y,
  CAST(count(*) FILTER (xa = xb AND ya = yb) AS BIGINT) ties_xy
  FROM p)
SELECT n_pairs, concordant, discordant, ties_x, ties_y, ties_xy,
  round((concordant - discordant) /
        sqrt(CAST((n_pairs - ties_x - ties_xy) AS DOUBLE)
             * (n_pairs - ties_y - ties_xy)), 6) tau_b
FROM c"""


def q_new_vs_returning(spark, sf_dir):
    """Monthly revenue split into new vs returning customers — a
    customer is 'new' in their first-ever order month ('yyyy-MM'
    strings order lexicographically = chronologically, so min() works
    identically cross-engine). One map-side-combinable groupBy for the
    first-month table, one fact-side equi-join on custkey."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.date_format(
            F.date_trunc("month", F.col("o_orderdate").cast("timestamp")),
            "yyyy-MM",
        ).alias("ym"),
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
    )
    first = o.groupBy("ck").agg(F.min("ym").alias("first_ym"))
    return (
        o.join(first, "ck")
        .select(
            "ym",
            F.when(F.col("ym") == F.col("first_ym"), "new")
            .otherwise("returning")
            .alias("seg"),
            "cents",
        )
        .groupBy("ym", "seg")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
    )


SQL_NEW_VS_RETURNING = """
WITH o AS (SELECT o_custkey ck,
             strftime(date_trunc('month', o_orderdate), '%Y-%m') ym,
             CAST(round(o_totalprice*100,0) AS BIGINT) cents
           FROM orders),
f AS (SELECT ck, min(ym) first_ym FROM o GROUP BY 1)
SELECT o.ym,
       CASE WHEN o.ym = f.first_ym THEN 'new' ELSE 'returning' END seg,
       CAST(count(*) AS BIGINT) n_orders,
       CAST(sum(cents) AS BIGINT) revenue_cents
FROM o JOIN f USING (ck) GROUP BY 1,2"""


def q_simpson_reversal(spark, sf_dir):
    """Aggregation-bias (Simpson's paradox) audit: the sign of the
    quantity-vs-discount OLS slope within each returnflag group vs the
    pooled sign. Slope sign = sign(n·Σxy − Σx·Σy) — pure integers (the
    denominator is positive, so it never flips the sign); products go
    through decimal(38,0) so no scale overflows. Reversal on the
    fixture is REAL: groups A and N slope positive while the pool
    slopes negative. One groupBy; the pooled row re-aggregates the
    3-row group table and broadcasts back."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rf"),
        F.round(F.col("l_discount") * 100, 0).cast("bigint").alias("x"),
        F.round("l_quantity", 0).cast("bigint").alias("y"),
    )
    g = li.groupBy("rf").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    pool = g.agg(
        F.sum("n").cast("bigint").alias("pn"),
        F.sum("sx").cast("bigint").alias("psx"),
        F.sum("sy").cast("bigint").alias("psy"),
        F.sum("sxy").cast("bigint").alias("psxy"),
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    sign = lambda num: (  # noqa: E731
        F.when(num > 0, 1).when(num < 0, -1).otherwise(0).cast("bigint")
    )
    gnum = d("n") * d("sxy") - d("sx") * d("sy")
    pnum = d("pn") * d("psxy") - d("psx") * d("psy")
    return g.crossJoin(F.broadcast(pool)).select(
        "rf",
        "n",
        sign(gnum).alias("group_sign"),
        sign(pnum).alias("pooled_sign"),
        (
            (sign(gnum) != 0)
            & (sign(pnum) != 0)
            & (sign(gnum) != sign(pnum))
        ).alias("reversed"),
    )


SQL_SIMPSON_REVERSAL = """
WITH li AS (SELECT l_returnflag rf,
              CAST(round(l_discount*100,0) AS BIGINT) x,
              CAST(round(l_quantity,0) AS BIGINT) y
            FROM lineitem),
g AS (SELECT rf, CAST(count(*) AS BIGINT) n,
        CAST(sum(x) AS BIGINT) sx, CAST(sum(y) AS BIGINT) sy,
        CAST(sum(x*y) AS BIGINT) sxy
      FROM li GROUP BY 1),
pool AS (SELECT CAST(sum(n) AS BIGINT) n, CAST(sum(sx) AS BIGINT) sx,
           CAST(sum(sy) AS BIGINT) sy, CAST(sum(sxy) AS BIGINT) sxy
         FROM g)
SELECT g.rf,
       g.n,
       CAST(sign(CAST(g.n AS HUGEINT)*g.sxy - CAST(g.sx AS HUGEINT)*g.sy)
            AS BIGINT) group_sign,
       CAST(sign(CAST(p.n AS HUGEINT)*p.sxy - CAST(p.sx AS HUGEINT)*p.sy)
            AS BIGINT) pooled_sign,
       (sign(CAST(g.n AS HUGEINT)*g.sxy - CAST(g.sx AS HUGEINT)*g.sy) <> 0
        AND sign(CAST(p.n AS HUGEINT)*p.sxy - CAST(p.sx AS HUGEINT)*p.sy) <> 0
        AND sign(CAST(g.n AS HUGEINT)*g.sxy - CAST(g.sx AS HUGEINT)*g.sy)
            <> sign(CAST(p.n AS HUGEINT)*p.sxy - CAST(p.sx AS HUGEINT)*p.sy))
         reversed
FROM g, pool p"""


def q_aging_buckets(spark, sf_dir):
    """Receivables-style aging report: orders bucketed by age in days
    relative to the corpus max order date (the watermark), per status ×
    bucket with exact integer-cent totals. The 1-row max broadcasts
    back; one map-side-combinable groupBy — no window, no sort."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"),
        (
            F.unix_micros(F.col("o_orderdate").cast("timestamp"))
            / F.lit(86400000000)
        )
        .cast("bigint")
        .alias("d"),
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("bigint")
        .alias("order_cents"),
    )
    mx = o.agg(F.max("d").alias("ref_day"))
    age = F.col("ref_day") - F.col("d")
    return (
        o.crossJoin(F.broadcast(mx))
        .select(
            "status",
            F.when(age <= 30, "00-30")
            .when(age <= 90, "31-90")
            .when(age <= 365, "91-365")
            .otherwise("365+")
            .alias("bucket"),
            "order_cents",
        )
        .groupBy("status", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("order_cents").cast("bigint").alias("cents"),
        )
    )


SQL_AGING_BUCKETS = """
WITH mx AS (SELECT max(epoch_us(o_orderdate)//86400000000) ref_day
            FROM orders),
o AS (SELECT o_orderstatus st,
        (SELECT ref_day FROM mx) - epoch_us(o_orderdate)//86400000000
          age_days,
        CAST(round(o_totalprice*100,0) AS BIGINT) cents
      FROM orders)
SELECT st AS status,
       CASE WHEN age_days <= 30 THEN '00-30' WHEN age_days <= 90 THEN '31-90'
            WHEN age_days <= 365 THEN '91-365' ELSE '365+' END bucket,
       CAST(count(*) AS BIGINT) n_orders, CAST(sum(cents) AS BIGINT) cents
FROM o GROUP BY 1,2"""


def q_subword_fertility(spark, sf_dir):
    """Tokenizer fertility per language under a fixed 4-char-piece
    subword model: pieces(word) = ceil(len/4), fertility = Σpieces/Σwords
    — the tokenizer-efficiency readout a multilingual training pipeline
    uses to budget compute per language (byte-fallback BPEs segment
    long words into more pieces; char-4 is the deterministic stand-in —
    no vocab file in the sandbox). Explode + one map-side-combinable
    groupBy on a 5-value key; integer piece counts, one division."""
    from llmaix_spark.operators.textstats import _tokens

    w = _t(spark, sf_dir, "documents").select(
        "lang", F.explode(_tokens(F.col("text"))).alias("wd")
    )
    pieces = F.floor((F.length("wd") + 3) / 4).cast("bigint")
    return (
        w.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(pieces).cast("bigint").alias("n_pieces"),
        )
        .select(
            "lang",
            "n_words",
            "n_pieces",
            F.round(F.col("n_pieces") / F.col("n_words"), 6).alias(
                "fertility"
            ),
        )
    )


SQL_SUBWORD_FERTILITY = r"""
WITH w AS (
  SELECT lang,
         unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                            x -> length(x) > 0)) wd
  FROM documents)
SELECT lang, CAST(count(*) AS BIGINT) n_words,
       CAST(sum((length(wd)+3)//4) AS BIGINT) n_pieces,
       round(sum((length(wd)+3)//4)*1.0/count(*),6) fertility
FROM w GROUP BY 1"""


def q_gini_features(spark, sf_dir):
    """Feature ranking by weighted Gini impurity of a binary label
    (order priority ∈ {URGENT, HIGH}) across three categorical
    features (mktsegment / nation / orderstatus) — the split-quality
    scan a tree trainer or feature-selection pass runs first. Unpivot
    via explode(array(structs)) keeps it one scan; per-(feature,value)
    counts are exact integers, the impurity mix is the only float. The
    fact-dim joins broadcast the dimension side."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    base = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("o_orderpriority")
            .isin("1-URGENT", "2-HIGH")
            .alias("pos"),
            F.col("c_mktsegment").alias("seg"),
            F.col("n_name").alias("nat"),
            F.col("o_orderstatus").alias("st"),
        )
    )
    fv = base.select(
        "pos",
        F.explode(
            F.array(
                F.struct(
                    F.lit("mktsegment").alias("feature"),
                    F.col("seg").alias("val"),
                ),
                F.struct(
                    F.lit("nation").alias("feature"),
                    F.col("nat").alias("val"),
                ),
                F.struct(
                    F.lit("orderstatus").alias("feature"),
                    F.col("st").alias("val"),
                ),
            )
        ).alias("f"),
    ).select("pos", "f.feature", "f.val")
    lf = fv.groupBy("feature", "val").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("pos").cast("bigint")).cast("bigint").alias("np"),
    )
    tot = (
        lf.where(F.col("feature") == "mktsegment")
        .agg(F.sum("n").cast("bigint").alias("nt"))
    )
    p = F.col("np").cast("double") / F.col("n")
    impurity = 1 - F.pow(p, 2) - F.pow(1 - p, 2)
    return (
        lf.crossJoin(F.broadcast(tot))
        .groupBy("feature")
        .agg(
            F.round(
                F.sum(
                    (F.col("n").cast("double") / F.col("nt")) * impurity
                ),
                6,
            ).alias("weighted_gini"),
            F.count(F.lit(1)).cast("bigint").alias("n_values"),
        )
    )


SQL_GINI_FEATURES = """
WITH base AS (
  SELECT (o.o_orderpriority IN ('1-URGENT','2-HIGH')) pos,
         c.c_mktsegment seg, n.n_name nat, o.o_orderstatus st
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey),
lf AS (
  SELECT f.feature, f.val, CAST(count(*) AS BIGINT) n,
         CAST(count(*) FILTER (pos) AS BIGINT) np
  FROM (SELECT pos,
               unnest(['mktsegment','nation','orderstatus']) feature,
               unnest([seg, nat, st]) val
        FROM base) f
  GROUP BY 1,2),
tot AS (SELECT CAST(sum(n) AS BIGINT) nt FROM lf WHERE feature='mktsegment')
SELECT feature,
  round(sum( (CAST(n AS DOUBLE)/ (SELECT nt FROM tot))
            * (1 - power(CAST(np AS DOUBLE)/n,2)
                 - power(1 - CAST(np AS DOUBLE)/n,2))),6) weighted_gini,
  CAST(count(*) AS BIGINT) n_values
FROM lf GROUP BY 1"""


def q_containment_dedup_lsh(spark, sf_dir):
    """Containment over MinHash-LSH candidates — the bounded scale path
    of containment_dedup (see operators/dedup.py containment_pairs_lsh
    for the recall caveat: MinHash bands estimate Jaccard, so the
    band-blocked containment is exact on every candidate it scores but
    can miss short-in-long pairs with tiny Jaccard; LSH Ensemble is the
    production index for those)."""
    return dd.containment_pairs_lsh(_t(spark, sf_dir, "documents"), 0.8)


SQL_CONTAINMENT_DEDUP_LSH = f"""
WITH {_minhash_pairs_ctes()}
SELECT da AS doc_a, db AS doc_b, CAST(c AS BIGINT) n_common,
       round(c * 1.0 / na.n, 6) containment_a,
       round(c * 1.0 / nb.n, 6) containment_b
FROM common JOIN cnt na ON da = na.doc_id JOIN cnt nb ON db = nb.doc_id
WHERE greatest(round(c * 1.0 / na.n, 6), round(c * 1.0 / nb.n, 6)) >= 0.8"""


def q_retrieval_mrr(spark, sf_dir):
    """Offline retrieval evaluation, binary-relevance half: MRR and
    hit@10 per query group (sources as query groups, ranking by
    n_chars, relevance = hash grade ≥ 2 — the binarization of
    ndcg_at_k's graded relevance, so the two metrics read off the SAME
    derived judgments). MRR = 1/rank of the first relevant doc = the
    max of 1/rank over relevant rows — an agg, no second window. One
    per-source window, map-side combinable aggregates."""
    from pyspark.sql import Window

    from llmaix_spark.operators.linking import stable_hash60_expr

    g = _t(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        "n_chars",
        (
            stable_hash60_expr(
                F.concat(F.col("doc_id").cast("string"), F.lit(":rel"))
            )
            % 4
            >= 2
        ).alias("relevant"),
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    r = g.select("source", "relevant", F.row_number().over(w).alias("rk"))
    return r.groupBy("source").agg(
        F.sum(F.col("relevant").cast("bigint")).cast("bigint").alias(
            "n_rel"
        ),
        F.round(
            F.coalesce(
                F.max(F.when(F.col("relevant"), 1.0 / F.col("rk"))),
                F.lit(0.0),
            ),
            6,
        ).alias("mrr"),
        F.coalesce(
            F.max(F.when(F.col("relevant") & (F.col("rk") <= 10), True)),
            F.lit(False),
        ).alias("hit_at_10"),
    )


SQL_RETRIEVAL_MRR = f"""
WITH g AS (SELECT source, doc_id, n_chars,
             ({_HASH60_SQL.format(v="CAST(doc_id AS VARCHAR) || ':rel'")} % 4
              >= 2) relevant
           FROM documents),
r AS (SELECT source, relevant,
        row_number() OVER (PARTITION BY source
                           ORDER BY n_chars DESC, doc_id) rk
      FROM g)
SELECT source,
       CAST(count(*) FILTER (relevant) AS BIGINT) n_rel,
       round(coalesce(max(1.0/rk) FILTER (relevant), 0), 6) mrr,
       coalesce(bool_or(relevant AND rk <= 10), FALSE) hit_at_10
FROM r GROUP BY 1"""


def q_vocab_growth(spark, sf_dir):
    """Heaps-law vocabulary growth curve: distinct trigram-shingle
    TYPES attributed to the first document (min doc_id) that coins
    them, bucketed into corpus deciles (ntile over doc_id order), with
    the cumulative type count — the sublinearity readout that tells a
    corpus-curation pass how much new vocabulary additional data still
    buys. The type attribution is one map-side-combinable min-groupBy;
    the decile window runs over the DOCUMENT grain (exact ntile needs a
    global order — at 10¹² docs swap in approx-quantile doc_id cut
    points; the attribution stays identical)."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    b = docs.select(
        "doc_id",
        F.ntile(10)
        .over(Window.orderBy("doc_id"))
        .cast("bigint")
        .alias("bucket"),
    )
    sh = dd.word_shingles(docs, 3)
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    nb = (
        first.join(b, first.first_doc == b.doc_id)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_types"))
    )
    cum_w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return nb.select(
        "bucket",
        "new_types",
        F.sum("new_types").over(cum_w).cast("bigint").alias("cum_types"),
    )


SQL_VOCAB_GROWTH = f"""
WITH b AS (SELECT doc_id,
             CAST(ntile(10) OVER (ORDER BY doc_id) AS BIGINT) bucket
           FROM documents),
{_TRIGRAM_SQL.strip().rstrip()},
first AS (SELECT s, min(doc_id) first_doc FROM sh GROUP BY 1),
nb AS (SELECT b.bucket, CAST(count(*) AS BIGINT) new_types
       FROM first f JOIN b ON f.first_doc = b.doc_id GROUP BY 1)
SELECT bucket, new_types,
       CAST(sum(new_types) OVER (ORDER BY bucket) AS BIGINT) cum_types
FROM nb"""


def q_transition_reciprocity(spark, sf_dir):
    """Directed-graph reciprocity of the user event-transition graph
    (the graph-level statistic on top of events_transitions' Markov
    matrix): share of directed type-pairs whose reverse edge exists,
    plus the count-weighted version Σ min(c_ab, c_ba) / Σ c — how
    bidirectional user flows are. One sessionless lead() per user, one
    groupBy on the (tiny) type-pair key, one self-join at the
    type-pair grain (≤ |types|², dimension-bounded)."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("u"),
        F.col("event_type").alias("a"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    w = Window.partitionBy("u").orderBy("us", "event_id")
    seq = e.select("a", F.lead("a").over(w).alias("b"))
    edges = (
        seq.where(F.col("b").isNotNull() & (F.col("a") != F.col("b")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        # two consumers (both join sides) — materialize once or the
        # lead()+groupBy pipeline executes twice (landmine #1); lazy
        # localCheckpoint is GC-released with the returned DataFrame
        .localCheckpoint(eager=False)
    )
    rev = edges.select(
        F.col("b").alias("a"), F.col("a").alias("b"), F.col("c").alias(
            "c_rev"
        )
    )
    m = edges.join(rev, ["a", "b"], "left")
    matched = F.least(F.col("c"), F.coalesce(F.col("c_rev"), F.lit(0)))
    return m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_directed_pairs"),
        F.sum(F.col("c_rev").isNotNull().cast("bigint"))
        .cast("bigint")
        .alias("n_reciprocated"),
        F.round(
            F.sum(F.col("c_rev").isNotNull().cast("bigint"))
            / F.count(F.lit(1)),
            6,
        ).alias("pair_reciprocity"),
        F.sum("c").cast("bigint").alias("n_transitions"),
        F.sum(matched).cast("bigint").alias("n_matched"),
        F.round(F.sum(matched) / F.sum("c"), 6).alias(
            "weighted_reciprocity"
        ),
    )


SQL_TRANSITION_RECIPROCITY = """
WITH e AS (SELECT user_id u, event_type et, epoch_us(ts) us, event_id eid
           FROM events),
seq AS (SELECT u, et a,
          lead(et) OVER (PARTITION BY u ORDER BY us, eid) b
        FROM e),
edges AS (SELECT a, b, CAST(count(*) AS BIGINT) c
          FROM seq WHERE b IS NOT NULL AND a <> b GROUP BY 1,2),
m AS (SELECT e1.a, e1.b, e1.c, e2.c c_rev
      FROM edges e1 LEFT JOIN edges e2 ON e1.a = e2.b AND e1.b = e2.a)
SELECT CAST(count(*) AS BIGINT) n_directed_pairs,
       CAST(count(*) FILTER (c_rev IS NOT NULL) AS BIGINT) n_reciprocated,
       round(count(*) FILTER (c_rev IS NOT NULL) * 1.0 / count(*), 6)
         pair_reciprocity,
       CAST(sum(c) AS BIGINT) n_transitions,
       CAST(sum(least(c, coalesce(c_rev, 0))) AS BIGINT) n_matched,
       round(sum(least(c, coalesce(c_rev,0))) * 1.0 / sum(c), 6)
         weighted_reciprocity
FROM m"""


def q_forecast_accuracy(spark, sf_dir):
    """Seasonal-naive forecast backtest: forecast(month) = actual 12
    months earlier (joined on (year−1, month) — no contiguity
    assumption, unlike a lag-12 window), with per-month absolute error
    and sMAPE on exact integer cents. The evaluation half of
    seasonal_baseline: how good the naive seasonal forecast actually
    is. Two map-side-combinable aggs + one equi-join at the MONTH
    grain (calendar-bounded)."""
    m = (
        _t(spark, sf_dir, "orders")
        .select(
            F.year(F.col("o_orderdate").cast("timestamp"))
            .cast("bigint")
            .alias("yr"),
            F.month(F.col("o_orderdate").cast("timestamp"))
            .cast("bigint")
            .alias("mo"),
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("bigint")
            .alias("order_cents"),
        )
        .groupBy("yr", "mo")
        .agg(F.sum("order_cents").cast("bigint").alias("cents"))
    )
    a = m.alias("a")
    f_ = m.alias("f")
    return a.join(
        f_,
        (F.col("a.yr") == F.col("f.yr") + 1)
        & (F.col("a.mo") == F.col("f.mo")),
    ).select(
        F.col("a.yr").alias("yr"),
        F.col("a.mo").alias("mo"),
        F.col("a.cents").alias("actual_cents"),
        F.col("f.cents").alias("forecast_cents"),
        F.abs(F.col("a.cents") - F.col("f.cents"))
        .cast("bigint")
        .alias("abs_err_cents"),
        F.round(
            2.0
            * F.abs(F.col("a.cents") - F.col("f.cents"))
            / (F.col("a.cents") + F.col("f.cents")),
            6,
        ).alias("smape"),
    )


SQL_FORECAST_ACCURACY = """
WITH m AS (SELECT CAST(year(o_orderdate) AS BIGINT) yr,
             CAST(month(o_orderdate) AS BIGINT) mo,
             CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT)
               cents
           FROM orders GROUP BY 1,2)
SELECT a.yr, a.mo, a.cents actual_cents, f.cents forecast_cents,
       CAST(abs(a.cents - f.cents) AS BIGINT) abs_err_cents,
       round(2.0*abs(a.cents - f.cents)/(a.cents + f.cents), 6) smape
FROM m a JOIN m f ON a.yr = f.yr + 1 AND a.mo = f.mo"""


def q_stratified_kfold(spark, sf_dir):
    """Stratified k-fold assignment audit: every document hashed into
    one of 5 folds (independent salt from the train/val/test split so
    folds cut ACROSS splits), stratified readout per (lang, fold) with
    the fold's within-stratum share — the balance check a CV harness
    runs before training. Pure projection + one groupBy; the
    per-stratum total joins back at the 5-row stratum grain."""
    from llmaix_spark.operators.linking import stable_hash60_expr

    s = _t(spark, sf_dir, "documents").select(
        "lang",
        (
            stable_hash60_expr(
                F.concat(F.col("doc_id").cast("string"), F.lit(":fold"))
            )
            % 5
        )
        .cast("bigint")
        .alias("fold"),
    )
    per = s.groupBy("lang", "fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    tot = per.groupBy("lang").agg(
        F.sum("n_docs").cast("bigint").alias("n_lang")
    )
    return per.join(F.broadcast(tot), "lang").select(
        "lang",
        "fold",
        "n_docs",
        F.round(F.col("n_docs") / F.col("n_lang"), 6).alias("fold_share"),
    )


SQL_STRATIFIED_KFOLD = f"""
WITH s AS (SELECT lang,
             {_HASH60_SQL.format(v="CAST(doc_id AS VARCHAR) || ':fold'")} % 5
               fold
           FROM documents),
per AS (SELECT lang, CAST(fold AS BIGINT) fold,
          CAST(count(*) AS BIGINT) n_docs
        FROM s GROUP BY 1,2),
tot AS (SELECT lang, CAST(sum(n_docs) AS BIGINT) n_lang FROM per GROUP BY 1)
SELECT per.lang, per.fold, per.n_docs,
       round(per.n_docs * 1.0 / tot.n_lang, 6) fold_share
FROM per JOIN tot USING (lang)"""


def q_dedup_savings(spark, sf_dir):
    """Dedup ROI report over the exact pair generator (oracle path —
    see operators/dedup.py dedup_savings; production defaults to LSH
    pairs through the same pairs_fn contract). Survivor = largest
    member (CCNet keep-the-longest), the OTHER canonicalization policy
    from dedup_groups' min-id keep."""
    return dd.dedup_savings(
        _t(spark, sf_dir, "documents"),
        0.5,
        pairs_fn=dd.ngram_jaccard_pairs,
    )


SQL_DEDUP_SAVINGS = f"""
WITH RECURSIVE
{_TRIGRAM_SQL},
common AS (SELECT a.doc_id da, b.doc_id db, count(*) c FROM sh a
           JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
pairs AS (
  SELECT da, db
  FROM common JOIN cnt na ON da = na.doc_id JOIN cnt nb ON db = nb.doc_id
  WHERE c * 1.0 / (na.n + nb.n - c) >= 0.5),
sym AS (SELECT da a, db b FROM pairs UNION SELECT db, da FROM pairs),
reach(node, comp) AS (
  SELECT a, a FROM sym
  UNION
  SELECT s.b, r.comp FROM reach r JOIN sym s ON s.a = r.node),
cc AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node),
members AS (SELECT cc.comp group_id, d2.doc_id, d2.n_chars
            FROM cc JOIN documents d2 ON cc.node = d2.doc_id),
surv AS (SELECT group_id,
           first(doc_id ORDER BY n_chars DESC, doc_id) survivor_doc
         FROM members GROUP BY 1)
SELECT m.group_id, CAST(count(*) AS BIGINT) n_docs,
       CAST(max(s.survivor_doc) AS BIGINT) survivor_doc,
       CAST(sum(m.n_chars) AS BIGINT) chars_total,
       CAST(sum(m.n_chars)
            - max(CASE WHEN m.doc_id = s.survivor_doc
                       THEN m.n_chars END) AS BIGINT) chars_dropped
FROM members m JOIN surv s USING (group_id)
GROUP BY 1"""


def q_contamination_report(spark, sf_dir):
    """Benchmark-owner contamination evidence: per benchmark doc
    (doc_id % 8 slice — denser than decontaminate's % 97 so the report
    exercises nonzero overlap at test scales), the count of leaking
    training docs and of distinct leaked 8-grams."""
    from llmaix_spark.operators.curation import contamination_report

    docs = _t(spark, sf_dir, "documents")
    return contamination_report(
        docs.where(F.col("doc_id") % 8 != 0),
        docs.where(F.col("doc_id") % 8 == 0),
    )


SQL_CONTAMINATION_REPORT = f"""
WITH d AS (SELECT doc_id, string_split(trim(text), ' ') w FROM documents),
tok AS (SELECT doc_id, generate_subscripts(w, 1) i, unnest(w) t FROM d),
gr AS (SELECT doc_id,
              t || ' ' || lead(t, 1) OVER win || ' ' || lead(t, 2) OVER win
                || ' ' || lead(t, 3) OVER win || ' ' || lead(t, 4) OVER win
                || ' ' || lead(t, 5) OVER win || ' ' || lead(t, 6) OVER win
                || ' ' || lead(t, 7) OVER win AS s,
              lead(t, 7) OVER win AS l7
       FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
sh AS (SELECT DISTINCT doc_id, {_HASH60_SQL.format(v="s")} AS sh_h
       FROM gr WHERE l7 IS NOT NULL),
hits AS (SELECT b.doc_id bench_doc, t.doc_id train_doc, b.sh_h
         FROM sh b JOIN sh t ON b.sh_h = t.sh_h
         WHERE b.doc_id % 8 = 0 AND t.doc_id % 8 <> 0),
agg AS (SELECT bench_doc,
          CAST(count(DISTINCT train_doc) AS BIGINT) n_train_docs,
          CAST(count(DISTINCT sh_h) AS BIGINT) n_shared_grams
        FROM hits GROUP BY 1)
SELECT d2.doc_id bench_doc,
       CAST(coalesce(a.n_train_docs,0) AS BIGINT) n_train_docs,
       CAST(coalesce(a.n_shared_grams,0) AS BIGINT) n_shared_grams
FROM documents d2 LEFT JOIN agg a ON d2.doc_id = a.bench_doc
WHERE d2.doc_id % 8 = 0"""


def q_embedding_dim_stats(spark, sf_dir):
    """Per-dimension whitening statistics of the embeddings table —
    see operators/similarity.py embedding_dim_stats (micro-quantized
    exact sums, long format, O(1) plan width in dim)."""
    return sim.embedding_dim_stats(_t(spark, sf_dir, "embeddings"))


SQL_EMBEDDING_DIM_STATS = """
WITH x AS (SELECT vec_id, generate_subscripts(embedding,1) dim,
             CAST(round(CAST(unnest(embedding) AS DOUBLE)*1000000,0)
                  AS BIGINT) q
           FROM embeddings),
a AS (SELECT CAST(dim AS BIGINT) dim, CAST(count(*) AS BIGINT) n,
        CAST(sum(q) AS BIGINT) sq, CAST(sum(q*q) AS HUGEINT) sqq,
        CAST(min(q) AS BIGINT) min_micro, CAST(max(q) AS BIGINT) max_micro
      FROM x GROUP BY 1)
SELECT dim, n, round(sq*1.0/n, 6) mean_micro,
       round(sqrt((n*CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE)*sq)
                  /(CAST(n AS DOUBLE)*(n-1))), 6) std_micro,
       min_micro, max_micro
FROM a"""


def q_edge_support(spark, sf_dir):
    """Per-edge triangle support of the triple graph (the k-truss
    peel quantity; see operators/graph.py edge_support). The oracle
    brute-forces common neighbors over the symmetric adjacency — two
    independent formulations must agree."""
    from llmaix_spark.operators.graph import edge_support

    return edge_support(q_kg_triples(spark, sf_dir), src="subj", dst="obj")


SQL_EDGE_SUPPORT = f"""
WITH t AS ({SQL_KG_TRIPLES}),
e AS (SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
      FROM t WHERE subj <> obj),
sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
supp AS (SELECT e.a, e.b, CAST(count(*) AS BIGINT) support
         FROM e JOIN sym s1 ON s1.a = e.a
                JOIN sym s2 ON s2.a = e.b AND s2.b = s1.b
         GROUP BY 1,2)
SELECT e.a, e.b, CAST(coalesce(supp.support, 0) AS BIGINT) support
FROM e LEFT JOIN supp ON e.a = supp.a AND e.b = supp.b"""


def q_compaction_plan(spark, sf_dir):
    """Lakehouse small-file compaction plan: per partition key (lang),
    the file count a target-size writer needs (ceil of total bytes /
    8 KiB budget — char count as the stand-in byte size) and the mean
    fill factor — the input to a `repartitionByRange`/OPTIMIZE sizing
    decision. One map-side-combinable groupBy over a pure scan."""
    d = _t(spark, sf_dir, "documents")
    budget = F.lit(8192)
    total = F.sum("n_chars")
    n_files = F.ceil(total * 1.0 / budget).cast("bigint")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        total.cast("bigint").alias("total_chars"),
        n_files.alias("n_files"),
        F.round(total * 1.0 / (n_files * budget), 6).alias("avg_fill"),
    )


SQL_COMPACTION_PLAN = """
SELECT lang, CAST(count(*) AS BIGINT) n_docs,
       CAST(sum(n_chars) AS BIGINT) total_chars,
       CAST(ceil(sum(n_chars)*1.0/8192) AS BIGINT) n_files,
       round(sum(n_chars)*1.0
             /(CAST(ceil(sum(n_chars)*1.0/8192) AS BIGINT)*8192),6) avg_fill
FROM documents GROUP BY 1"""


def q_price_volume_mix(spark, sf_dir):
    """Year-over-year revenue decomposition into price, volume and
    cross effects (Laspeyres PVM — the finance complement of
    revenue_bridge's customer-lifecycle waterfall) plus new/exited
    part revenue. Per-part effects are computed from exact integer
    (cents, qty) pairs — identical doubles cross-engine — and
    quantized to MILLI-CENTS per part before summing, so the roll-up
    is an order-independent integer sum; the identity
    Δcommon = price + volume + cross holds to the quantization grid.
    Shape: one fact groupBy to the (year, part) grain, then joins at
    that bounded grain only."""
    py = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(
            F.year(F.col("l_shipdate").cast("timestamp"))
            .cast("bigint")
            .alias("yr"),
            F.col("l_partkey").alias("pk"),
        )
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * 100,
                    0,
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("r"),
            F.sum(F.round("l_quantity", 0).cast("bigint"))
            .cast("bigint")
            .alias("q"),
        )
        # four consumers (both join sides, new, exited) — materialize
        .localCheckpoint(eager=False)
    )
    a = py.alias("a")
    b = py.alias("b")
    j = a.join(
        b,
        (F.col("a.yr") == F.col("b.yr") + 1) & (F.col("a.pk") == F.col("b.pk")),
    ).where((F.col("a.q") > 0) & (F.col("b.q") > 0)).select(
        F.col("a.yr").alias("yr"),
        F.col("a.r").alias("r1"),
        F.col("a.q").alias("q1"),
        F.col("b.r").alias("r0"),
        F.col("b.q").alias("q0"),
    )
    p1 = F.col("r1") * 1.0 / F.col("q1")
    p0 = F.col("r0") * 1.0 / F.col("q0")
    eff = j.select(
        "yr",
        "r1",
        "r0",
        F.round((p1 - p0) * F.col("q0") * 1000, 0)
        .cast("bigint")
        .alias("pe"),
        F.round(p0 * (F.col("q1") - F.col("q0")) * 1000, 0)
        .cast("bigint")
        .alias("ve"),
        F.round((p1 - p0) * (F.col("q1") - F.col("q0")) * 1000, 0)
        .cast("bigint")
        .alias("ce"),
    )
    yr_bounds = py.agg(
        F.min("yr").alias("min_yr"), F.max("yr").alias("max_yr")
    )
    newp = (
        a.join(
            b,
            (F.col("a.yr") == F.col("b.yr") + 1)
            & (F.col("a.pk") == F.col("b.pk")),
            "left_anti",
        )
        .crossJoin(F.broadcast(yr_bounds))
        .where(F.col("yr") > F.col("min_yr"))
        .groupBy("yr")
        .agg(F.sum("r").cast("bigint").alias("new_cents"))
    )
    exitp = (
        b.join(
            a,
            (F.col("a.yr") == F.col("b.yr") + 1)
            & (F.col("a.pk") == F.col("b.pk")),
            "left_anti",
        )
        .crossJoin(F.broadcast(yr_bounds))
        .where(F.col("yr") + 1 <= F.col("max_yr"))
        .select((F.col("yr") + 1).alias("yr"), "r")
        .groupBy("yr")
        .agg(F.sum("r").cast("bigint").alias("exited_cents"))
    )
    agg = eff.groupBy("yr").agg(
        (F.sum("r1") - F.sum("r0"))
        .cast("bigint")
        .alias("delta_common_cents"),
        F.sum("pe").cast("bigint").alias("price_eff_milli"),
        F.sum("ve").cast("bigint").alias("volume_eff_milli"),
        F.sum("ce").cast("bigint").alias("cross_eff_milli"),
    )
    return (
        agg.join(newp, "yr", "left")
        .join(exitp, "yr", "left")
        .select(
            "yr",
            "delta_common_cents",
            "price_eff_milli",
            "volume_eff_milli",
            "cross_eff_milli",
            F.coalesce("new_cents", F.lit(0))
            .cast("bigint")
            .alias("new_cents"),
            F.coalesce("exited_cents", F.lit(0))
            .cast("bigint")
            .alias("exited_cents"),
        )
    )


SQL_PRICE_VOLUME_MIX = """
WITH py AS (SELECT CAST(year(l_shipdate) AS BIGINT) yr, l_partkey pk,
              CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100,0)
                            AS BIGINT)) AS BIGINT) r,
              CAST(sum(CAST(round(l_quantity,0) AS BIGINT)) AS BIGINT) q
            FROM lineitem GROUP BY 1,2),
j AS (SELECT a.yr, a.pk, a.r r1, a.q q1, b.r r0, b.q q0
      FROM py a JOIN py b ON a.yr = b.yr + 1 AND a.pk = b.pk
      WHERE a.q > 0 AND b.q > 0),
eff AS (SELECT yr,
          CAST(round((r1*1.0/q1 - r0*1.0/q0) * q0 * 1000, 0) AS BIGINT) pe,
          CAST(round((r0*1.0/q0) * (q1 - q0) * 1000, 0) AS BIGINT) ve,
          CAST(round((r1*1.0/q1 - r0*1.0/q0) * (q1 - q0) * 1000, 0)
               AS BIGINT) ce,
          r1, r0 FROM j),
newp AS (SELECT a.yr, CAST(sum(a.r) AS BIGINT) new_cents
         FROM py a LEFT JOIN py b ON a.yr = b.yr + 1 AND a.pk = b.pk
         WHERE b.pk IS NULL AND a.yr > (SELECT min(yr) FROM py)
         GROUP BY 1),
exitp AS (SELECT b.yr + 1 yr, CAST(sum(b.r) AS BIGINT) exited_cents
          FROM py b LEFT JOIN py a ON a.yr = b.yr + 1 AND a.pk = b.pk
          WHERE a.pk IS NULL AND b.yr + 1 <= (SELECT max(yr) FROM py)
          GROUP BY 1)
SELECT e.yr, CAST(sum(r1) - sum(r0) AS BIGINT) delta_common_cents,
       CAST(sum(pe) AS BIGINT) price_eff_milli,
       CAST(sum(ve) AS BIGINT) volume_eff_milli,
       CAST(sum(ce) AS BIGINT) cross_eff_milli,
       CAST(coalesce(max(n.new_cents),0) AS BIGINT) new_cents,
       CAST(coalesce(max(x.exited_cents),0) AS BIGINT) exited_cents
FROM eff e LEFT JOIN newp n ON e.yr = n.yr LEFT JOIN exitp x ON e.yr = x.yr
GROUP BY 1"""


def q_dedup_incremental(spark, sf_dir):
    """Incremental-ingestion dedup — the production mode every
    whole-corpus dedup here so far skips: an incoming batch
    (doc_id % 5 == 0 slice) is checked against the EXISTING corpus and
    against itself, each batch doc getting a verdict
    'dup_of_corpus' > 'dup_in_batch' (earlier-id batch twin wins) >
    'unique'. Exact pair generator (the oracle path — at scale the
    batch side's shingles join the corpus's pre-built shingle index,
    same geometry as decontaminate). The asymmetric join only carries
    batch docs on the probe side."""
    docs = _t(spark, sf_dir, "documents")
    sh = dd.word_shingles(docs, 3).localCheckpoint(eager=False)
    a = sh.where(F.col("doc_id") % 5 == 0).alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    j = (
        pairs.join(
            cnt.select(F.col("doc_id").alias("da"), F.col("n_sh").alias("na")),
            "da",
        )
        .join(
            cnt.select(F.col("doc_id").alias("db"), F.col("n_sh").alias("nb")),
            "db",
        )
        .where(
            F.col("c") / (F.col("na") + F.col("nb") - F.col("c")) >= 0.5
        )
    )
    verdict = j.groupBy(F.col("da").alias("doc_id")).agg(
        F.max((F.col("db") % 5 != 0).cast("boolean")).alias("dup_corpus"),
        F.max(
            ((F.col("db") % 5 == 0) & (F.col("db") < F.col("da"))).cast(
                "boolean"
            )
        ).alias("dup_batch_earlier"),
    )
    batch = docs.where(F.col("doc_id") % 5 == 0).select("doc_id")
    return batch.join(verdict, "doc_id", "left").select(
        "doc_id",
        F.when(F.coalesce("dup_corpus", F.lit(False)), "dup_of_corpus")
        .when(F.coalesce("dup_batch_earlier", F.lit(False)), "dup_in_batch")
        .otherwise("unique")
        .alias("verdict"),
    )


SQL_DEDUP_INCREMENTAL = f"""
WITH {_TRIGRAM_SQL},
pairs AS (SELECT a.doc_id da, b.doc_id db, count(*) c FROM sh a
          JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
          WHERE a.doc_id % 5 = 0
          GROUP BY 1,2),
j AS (SELECT da, db
      FROM pairs JOIN cnt na ON da=na.doc_id JOIN cnt nb ON db=nb.doc_id
      WHERE c*1.0/(na.n + nb.n - c) >= 0.5),
verdict AS (SELECT da doc_id,
    bool_or(db % 5 <> 0) dup_corpus,
    bool_or(db % 5 = 0 AND db < da) dup_batch_earlier
  FROM j GROUP BY 1)
SELECT d2.doc_id,
  CASE WHEN coalesce(v.dup_corpus, FALSE) THEN 'dup_of_corpus'
       WHEN coalesce(v.dup_batch_earlier, FALSE) THEN 'dup_in_batch'
       ELSE 'unique' END verdict
FROM documents d2 LEFT JOIN verdict v USING (doc_id)
WHERE d2.doc_id % 5 = 0"""


def q_lang_divergence_js(spark, sf_dir):
    """Pairwise Jensen-Shannon divergence (bits) between per-language
    token distributions — the corpus-drift / domain-distance readout a
    multilingual mixture pass reads before re-weighting. Per-token
    terms: the log2 ratio is rounded to 9dp FIRST (libm 1-ulp
    divergence between engines), the 0.5·p·log term is quantized to
    nano-bits per token, and the roll-up is an order-independent
    integer sum (the conditional_entropy convention). Shape: counts at
    the (lang, token) grain, a full-outer token join per language pair
    — never a token cross-product."""
    from llmaix_spark.operators.textstats import _tokens

    w = _t(spark, sf_dir, "documents").select(
        "lang", F.explode(_tokens(F.col("text"))).alias("t")
    )
    c = w.groupBy("lang", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).localCheckpoint(eager=False)
    n = c.groupBy("lang").agg(F.sum("c").cast("bigint").alias("n"))
    langs = c.select("lang").distinct()
    pr = (
        langs.alias("x")
        .join(langs.alias("y"), F.col("x.lang") < F.col("y.lang"))
        .select(F.col("x.lang").alias("la"), F.col("y.lang").alias("lb"))
    )
    a_side = pr.join(
        c.select(F.col("lang").alias("la"), "t", F.col("c").alias("cca")),
        "la",
    )
    b_side = pr.join(
        c.select(F.col("lang").alias("lb"), "t", F.col("c").alias("ccb")),
        "lb",
    )
    tt = a_side.join(b_side, ["la", "lb", "t"], "full_outer").select(
        "la",
        "lb",
        F.coalesce("cca", F.lit(0)).alias("cca"),
        F.coalesce("ccb", F.lit(0)).alias("ccb"),
    )
    na = n.select(F.col("lang").alias("la"), F.col("n").alias("n_a"))
    nb = n.select(F.col("lang").alias("lb"), F.col("n").alias("n_b"))
    t2 = tt.join(F.broadcast(na), "la").join(F.broadcast(nb), "lb")
    pa = F.col("cca") * 1.0 / F.col("n_a")
    pb = F.col("ccb") * 1.0 / F.col("n_b")
    m = (pa + pb) / 2
    term = F.when(F.col("cca") > 0, 0.5 * pa * F.round(F.log2(pa / m), 9)).otherwise(0.0) + F.when(
        F.col("ccb") > 0, 0.5 * pb * F.round(F.log2(pb / m), 9)
    ).otherwise(0.0)
    nano = F.round(term * 1e9, 0).cast("bigint")
    return (
        t2.select(
            F.col("la").alias("lang_a"),
            F.col("lb").alias("lang_b"),
            nano.alias("nano"),
        )
        .groupBy("lang_a", "lang_b")
        .agg(F.sum("nano").cast("bigint").alias("js_nano"))
    )


SQL_LANG_DIVERGENCE_JS = r"""
WITH w AS (SELECT lang, unnest(list_filter(
             string_split_regex(lower(trim(text)),'\s+'),
             x -> length(x) > 0)) t
           FROM documents),
c AS (SELECT lang, t, CAST(count(*) AS BIGINT) c FROM w GROUP BY 1,2),
n AS (SELECT lang, CAST(sum(c) AS BIGINT) n FROM c GROUP BY 1),
langs AS (SELECT DISTINCT lang FROM c),
pr AS (SELECT a.lang la, b.lang lb FROM langs a JOIN langs b
       ON a.lang < b.lang),
a_side AS (SELECT pr.la, pr.lb, c.t, c.c cca
           FROM pr JOIN c ON c.lang = pr.la),
b_side AS (SELECT pr.la, pr.lb, c.t, c.c ccb
           FROM pr JOIN c ON c.lang = pr.lb),
tt AS (SELECT coalesce(a.la, b.la) la, coalesce(a.lb, b.lb) lb,
         coalesce(a.cca, 0) cca, coalesce(b.ccb, 0) ccb
       FROM a_side a FULL OUTER JOIN b_side b
         ON a.la = b.la AND a.lb = b.lb AND a.t = b.t),
t2 AS (SELECT tt.la, tt.lb, cca, ccb, na.n n_a, nb.n n_b
       FROM tt JOIN n na ON na.lang = tt.la JOIN n nb ON nb.lang = tt.lb),
terms AS (SELECT la, lb,
    CAST(round((
      CASE WHEN cca > 0 THEN 0.5 * (cca*1.0/n_a)
        * round(log2((cca*1.0/n_a) / ((cca*1.0/n_a + ccb*1.0/n_b)/2)), 9)
        ELSE 0 END
      + CASE WHEN ccb > 0 THEN 0.5 * (ccb*1.0/n_b)
        * round(log2((ccb*1.0/n_b) / ((cca*1.0/n_a + ccb*1.0/n_b)/2)), 9)
        ELSE 0 END) * 1000000000, 0) AS BIGINT) nano
  FROM t2)
SELECT la AS lang_a, lb AS lang_b, CAST(sum(nano) AS BIGINT) js_nano
FROM terms GROUP BY 1,2"""


def q_pr_gains_curve(spark, sf_dir):
    """Cumulative precision/recall gains table for the lang-ID
    classifier scored by doc length: docs ranked by n_chars (desc,
    doc_id tiebreak) into deciles; per decile-prefix the cumulative
    precision and recall of `pred == truth` — the threshold-sweep
    readout (gains chart) next to calibration_bins' per-bin view. Two
    bounded windows (ranking + 10-row cumsum); counts exact."""
    from pyspark.sql import Window

    from llmaix_spark.operators.textstats import lang_id_expr

    lab = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        (lang_id_expr(F.col("text")) == F.col("lang")).alias("pos"),
    )
    w = Window.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    r = lab.select("pos", F.ntile(10).over(w).cast("bigint").alias("dcl"))
    per = (
        r.groupBy("dcl")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("pos").cast("bigint")).cast("bigint").alias("tp"),
        )
        # two consumers (cumsum + total) — materialize or the ranking
        # window executes twice (landmine #1)
        .localCheckpoint(eager=False)
    )
    tot = per.agg(F.sum("tp").cast("bigint").alias("all_tp"))
    cw = Window.orderBy("dcl").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("dcl").alias("decile"),
            F.sum("n").over(cw).cast("bigint").alias("cum_n"),
            F.sum("tp").over(cw).cast("bigint").alias("cum_tp"),
            F.round(
                F.sum("tp").over(cw) * 1.0 / F.sum("n").over(cw), 6
            ).alias("precision_at"),
            F.round(F.sum("tp").over(cw) * 1.0 / F.col("all_tp"), 6).alias(
                "recall_at"
            ),
        )
    )


def _langid_hits_sql() -> str:
    hits = ", ".join(
        "len(list_filter(string_split(lower(trim(text)), ' '), "
        f"x -> x IN ({', '.join(repr(m) for m in ts.LANG_MARKERS[lang])})))"
        f" hit_{lang}"
        for lang in ts.LANG_MARKERS
    )
    return hits


SQL_PR_GAINS_CURVE = f"""
WITH h AS (SELECT doc_id, lang, n_chars, {_langid_hits_sql()}
           FROM documents),
lab AS (SELECT doc_id, n_chars,
          (CASE WHEN greatest(hit_en,hit_de,hit_es,hit_fr) = 0 THEN 'und'
                WHEN hit_en = greatest(hit_en,hit_de,hit_es,hit_fr) THEN 'en'
                WHEN hit_de = greatest(hit_en,hit_de,hit_es,hit_fr) THEN 'de'
                WHEN hit_es = greatest(hit_en,hit_de,hit_es,hit_fr) THEN 'es'
                ELSE 'fr' END = lang) pos
        FROM h),
r AS (SELECT pos, ntile(10) OVER (ORDER BY n_chars DESC, doc_id) dcl
      FROM lab),
per AS (SELECT CAST(dcl AS BIGINT) dcl, CAST(count(*) AS BIGINT) n,
          CAST(count(*) FILTER (pos) AS BIGINT) tp FROM r GROUP BY 1),
tot AS (SELECT CAST(sum(tp) AS BIGINT) all_tp FROM per)
SELECT dcl AS decile,
       CAST(sum(n) OVER w AS BIGINT) cum_n,
       CAST(sum(tp) OVER w AS BIGINT) cum_tp,
       round(sum(tp) OVER w * 1.0 / sum(n) OVER w, 6) precision_at,
       round(sum(tp) OVER w * 1.0 / (SELECT all_tp FROM tot), 6) recall_at
FROM per WINDOW w AS (ORDER BY dcl)"""


def q_rle_lengths(spark, sf_dir):
    """Run-length histogram of consecutive same-type events per user
    (the RLE complement of runs_test's global sign runs): lag marks
    run breaks, a running sum numbers the runs, two groupBys produce
    the (event_type, run_len, n_runs) distribution — the bot/replay
    detector's signature table. Both windows partition by user."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("u"),
        F.col("event_type").alias("et"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    w = Window.partitionBy("u").orderBy("us", "event_id")
    s = e.select(
        "u",
        "et",
        "us",
        "event_id",
        F.when(F.lag("et").over(w) == F.col("et"), 0)
        .otherwise(1)
        .alias("brk"),
    )
    r = s.select(
        "u", "et", F.sum("brk").over(w).alias("run_id")
    )
    runs = r.groupBy("u", "et", "run_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("run_len")
    )
    return runs.groupBy(
        F.col("et").alias("event_type"), "run_len"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_runs"))


SQL_RLE_LENGTHS = """
WITH e AS (SELECT user_id u, event_type et, epoch_us(ts) us, event_id eid
           FROM events),
s AS (SELECT u, et, us, eid,
        CASE WHEN lag(et) OVER w = et THEN 0 ELSE 1 END brk
      FROM e WINDOW w AS (PARTITION BY u ORDER BY us, eid)),
r AS (SELECT u, et,
        sum(brk) OVER (PARTITION BY u ORDER BY us, eid) run_id FROM s),
runs AS (SELECT u, et, run_id, CAST(count(*) AS BIGINT) run_len
         FROM r GROUP BY 1,2,3)
SELECT et AS event_type, run_len, CAST(count(*) AS BIGINT) n_runs
FROM runs GROUP BY 1,2"""


def q_hour_uniformity(spark, sf_dir):
    """χ² goodness-of-fit of each event type's hour-of-day histogram
    against uniform (df = 23) — 'does this event type have a diurnal
    cycle at all', the hypothesis-test companion of hourly_envelope's
    percentile bands and fano_factor's dispersion. Missing hours
    contribute their full expected mass. Two map-side-combinable
    groupBys; the only floats are the final (o−e)²/e terms from exact
    integer counts."""
    e = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("et"),
        (
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                / F.lit(3600000000)
            ).cast("bigint")
            % 24
        ).alias("hod"),
    )
    per = e.groupBy("et", "hod").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = per.groupBy("et").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
    )
    exp = F.col("n") / 24.0
    return (
        per.join(tot, "et")
        .groupBy(F.col("et").alias("event_type"))
        .agg(
            F.max("n").cast("bigint").alias("n_events"),
            F.lit(23).cast("bigint").alias("df"),
            F.round(
                F.sum(F.pow(F.col("c") - exp, 2) / exp)
                + (24 - F.max("n_hours")) * (F.max("n") / 24.0),
                6,
            ).alias("chi2"),
        )
    )


SQL_HOUR_UNIFORMITY = """
WITH e AS (SELECT event_type et,
             CAST(epoch_us(ts)//3600000000 % 24 AS BIGINT) hod
           FROM events),
per AS (SELECT et, hod, CAST(count(*) AS BIGINT) c FROM e GROUP BY 1,2),
tot AS (SELECT et, CAST(sum(c) AS BIGINT) n,
          CAST(count(*) AS BIGINT) n_hours FROM per GROUP BY 1)
SELECT per.et AS event_type, CAST(max(tot.n) AS BIGINT) n_events,
       CAST(23 AS BIGINT) df,
       round(sum(power(per.c - tot.n/24.0, 2) / (tot.n/24.0))
             + (24 - max(tot.n_hours)) * (max(tot.n)/24.0), 6) chi2
FROM per JOIN tot USING (et) GROUP BY 1"""


def q_corpus_datasheet(spark, sf_dir):
    """The one-row 'Datasheets for Datasets' composition block: doc /
    lang / char / token / vocab totals, exact lower-median doc length
    (n_chars, doc_id order — at corpus scale swap the rank window for
    approx_percentile) and mean tokens per doc. Everything else is
    1-row aggregates crossJoin-broadcast together."""
    from pyspark.sql import Window

    from llmaix_spark.operators.textstats import _tokens

    d = _t(spark, sf_dir, "documents")
    w = d.select(F.explode(_tokens(F.col("text"))).alias("t"))
    tk = w.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.countDistinct("t").cast("bigint").alias("vocab"),
    )
    dc = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )
    rw = Window.orderBy("n_chars", "doc_id")
    med = (
        d.select(
            F.col("n_chars").cast("bigint").alias("p50_chars"),
            F.row_number().over(rw).alias("rk"),
        )
        .crossJoin(F.broadcast(dc.select("n_docs")))
        .where(F.col("rk") == F.floor((F.col("n_docs") + 1) / 2))
        .select("p50_chars")
    )
    return (
        dc.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(tk))
        .select(
            "n_docs",
            "n_langs",
            "total_chars",
            "min_chars",
            "max_chars",
            "p50_chars",
            "n_tokens",
            "vocab",
            F.round(F.col("n_tokens") * 1.0 / F.col("n_docs"), 6).alias(
                "mean_tokens_per_doc"
            ),
        )
    )


SQL_CORPUS_DATASHEET = r"""
WITH w AS (SELECT doc_id, unnest(list_filter(
             string_split_regex(lower(trim(text)),'\s+'),
             x -> length(x) > 0)) t
           FROM documents),
tk AS (SELECT CAST(count(*) AS BIGINT) n_tokens,
         CAST(count(DISTINCT t) AS BIGINT) vocab FROM w),
dc AS (SELECT CAST(count(*) AS BIGINT) n_docs,
         CAST(count(DISTINCT lang) AS BIGINT) n_langs,
         CAST(sum(n_chars) AS BIGINT) total_chars,
         CAST(min(n_chars) AS BIGINT) min_chars,
         CAST(max(n_chars) AS BIGINT) max_chars FROM documents),
med AS (SELECT CAST(n_chars AS BIGINT) p50_chars FROM documents
        ORDER BY n_chars, doc_id
        LIMIT 1 OFFSET (SELECT (n_docs+1)//2 - 1 FROM dc))
SELECT dc.n_docs, dc.n_langs, dc.total_chars, dc.min_chars, dc.max_chars,
       med.p50_chars, tk.n_tokens, tk.vocab,
       round(tk.n_tokens * 1.0 / dc.n_docs, 6) mean_tokens_per_doc
FROM dc, med, tk"""


def q_chunk_sliding(spark, sf_dir):
    """RAG-prep sliding-window chunking: 64-token chunks at stride 32
    (50% overlap — the retrieval-recall standard the non-overlapping
    chunk_by_words can't give). Emits (doc_id, chunk_idx, start_tok,
    end_tok, n_tokens, chunk_hash) — the hash stands in for the chunk
    text so the oracle value-checks CONTENT, not just spans. One
    narrow explode of per-doc start offsets; bind_array keeps the
    token slice O(|doc|) per row (landmine #2)."""
    from llmaix_spark.functions.arrays import bind_array
    from llmaix_spark.operators.linking import stable_hash60_expr

    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    rows = d.select(
        "doc_id",
        bind_array(
            toks,
            lambda w: F.struct(
                w.alias("w"), F.size(w).cast("bigint").alias("nt")
            ),
        ).alias("b"),
    ).select("doc_id", F.col("b.w").alias("w"), F.col("b.nt").alias("nt"))
    starts = rows.where(F.col("nt") >= 1).select(
        "doc_id",
        "w",
        "nt",
        F.explode(
            F.sequence(F.lit(1).cast("bigint"), F.col("nt"), F.lit(32))
        ).alias("st"),
    )
    end = F.least(F.col("st") + 63, F.col("nt"))
    chunk = F.concat_ws(" ", F.slice(F.col("w"), F.col("st"), end - F.col("st") + 1))
    return starts.select(
        "doc_id",
        ((F.col("st") - 1) / 32).cast("bigint").alias("chunk_idx"),
        F.col("st").cast("bigint").alias("start_tok"),
        end.cast("bigint").alias("end_tok"),
        (end - F.col("st") + 1).cast("bigint").alias("n_tokens"),
        stable_hash60_expr(chunk).alias("chunk_hash"),
    )


SQL_CHUNK_SLIDING = r"""
WITH d AS (SELECT doc_id, list_filter(
             string_split_regex(lower(trim(text)),'\s+'),
             x->length(x)>0) w FROM documents),
n AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) nt FROM d),
starts AS (SELECT doc_id, w, nt,
             unnest(range(1, CAST(nt AS BIGINT)+1, 32)) st
           FROM n WHERE nt >= 1),
ch AS (SELECT doc_id, CAST((st-1)//32 AS BIGINT) chunk_idx,
         CAST(st AS BIGINT) start_tok,
         CAST(least(st+63, nt) AS BIGINT) end_tok,
         array_to_string(list_slice(w, st, least(st+63, nt)), ' ') chunk
       FROM starts)
SELECT doc_id, chunk_idx, start_tok, end_tok,
       CAST(end_tok - start_tok + 1 AS BIGINT) n_tokens,
       (('0x' || substring(md5(chunk), 1, 15))::BIGINT) chunk_hash
FROM ch"""


def q_prefix_collision(spark, sf_dir):
    """Boilerplate-prefix detection: documents sharing an identical
    first-16-token prefix grouped by the prefix hash — catches
    templated/boilerplate families whose bodies diverge too much for
    Jaccard (the prefix complement of containment_dedup). Output per
    colliding prefix: member count and id span."""
    from llmaix_spark.functions.arrays import bind_array
    from llmaix_spark.operators.linking import stable_hash60_expr

    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    pre = d.select(
        "doc_id",
        stable_hash60_expr(
            bind_array(
                toks, lambda w: F.concat_ws(" ", F.slice(w, 1, 16))
            )
        ).alias("prefix_hash"),
    )
    return (
        pre.groupBy("prefix_hash")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
        )
        .where(F.col("n_docs") >= 2)
    )


SQL_PREFIX_COLLISION = r"""
WITH p AS (SELECT doc_id,
             (('0x' || substring(md5(array_to_string(list_slice(
                list_filter(string_split_regex(lower(trim(text)),'\s+'),
                            x->length(x)>0), 1, 16), ' ')), 1, 15))::BIGINT)
               prefix_hash
           FROM documents)
SELECT prefix_hash, CAST(count(*) AS BIGINT) n_docs,
       CAST(min(doc_id) AS BIGINT) min_doc,
       CAST(max(doc_id) AS BIGINT) max_doc
FROM p GROUP BY 1 HAVING count(*) >= 2"""


def q_erasure_audit(spark, sf_dir):
    """GDPR/right-to-be-forgotten propagation audit: given an erasure
    list (user/customer key % 37 == 0 as the derived deletion set),
    count the rows each table STILL holds for erased subjects — events
    directly, orders by custkey, lineitem transitively through its
    order. The compliance sweep a deletion pipeline must end with;
    at scale the erasure list broadcasts into every probe."""
    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("user_id") % 37 == 0)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(F.lit("events").alias("tbl"), "n")
    )
    orders = _t(spark, sf_dir, "orders")
    od = (
        orders.where(F.col("o_custkey") % 37 == 0)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(F.lit("orders").alias("tbl"), "n")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(
                orders.where(F.col("o_custkey") % 37 == 0).select(
                    F.col("o_orderkey").alias("l_orderkey")
                )
            ),
            "l_orderkey",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(F.lit("lineitem").alias("tbl"), "n")
    )
    return ev.unionAll(od).unionAll(li)


SQL_ERASURE_AUDIT = """
WITH e AS (SELECT CAST(count(*) AS BIGINT) n FROM events
           WHERE user_id % 37 = 0),
o AS (SELECT CAST(count(*) AS BIGINT) n FROM orders
      WHERE o_custkey % 37 = 0),
l AS (SELECT CAST(count(*) AS BIGINT) n FROM lineitem li
      JOIN orders oo ON li.l_orderkey = oo.o_orderkey
      WHERE oo.o_custkey % 37 = 0)
SELECT 'events' tbl, n FROM e UNION ALL SELECT 'orders', n FROM o
UNION ALL SELECT 'lineitem', n FROM l"""


def q_ab_count_ztest(spark, sf_dir):
    """Two-sample Welch z-test on a count metric (purchases per user)
    between hash-assigned A/B arms — the experiment readout layer on
    top of srm_check's integrity gate. All moments from exact integer
    sums; the z denominator is the only float chain. One groupBy to
    the user grain, one 2-row pivot."""
    from llmaix_spark.operators.linking import stable_hash60_expr

    u = (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("u"))
        .agg(
            F.sum((F.col("event_type") == "purchase").cast("bigint"))
            .cast("bigint")
            .alias("x")
        )
    )
    g = u.select(
        F.when(
            stable_hash60_expr(
                F.concat(F.col("u").cast("string"), F.lit(":ab"))
            )
            % 2
            == 0,
            "A",
        )
        .otherwise("B")
        .alias("grp"),
        "x",
    )
    agg = g.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("ss"),
    )
    pick = lambda grp, c: F.max(  # noqa: E731
        F.when(F.col("grp") == grp, F.col(c))
    )
    w = agg.agg(
        pick("A", "n").alias("na"),
        pick("A", "s").alias("sa"),
        pick("A", "ss").alias("ssa"),
        pick("B", "n").alias("nb"),
        pick("B", "s").alias("sb"),
        pick("B", "ss").alias("ssb"),
    )
    var_a = (
        F.col("ssa") - F.col("sa").cast("double") * F.col("sa") / F.col("na")
    ) / (F.col("na") - 1.0)
    var_b = (
        F.col("ssb") - F.col("sb").cast("double") * F.col("sb") / F.col("nb")
    ) / (F.col("nb") - 1.0)
    return w.select(
        "na",
        "nb",
        F.round(F.col("sa") * 1.0 / F.col("na"), 6).alias("mean_a"),
        F.round(F.col("sb") * 1.0 / F.col("nb"), 6).alias("mean_b"),
        F.round(
            (F.col("sa") * 1.0 / F.col("na") - F.col("sb") * 1.0 / F.col("nb"))
            / F.sqrt(var_a / F.col("na") + var_b / F.col("nb")),
            6,
        ).alias("z_stat"),
    )


SQL_AB_COUNT_ZTEST = f"""
WITH u AS (SELECT user_id u,
             CAST(count(*) FILTER (event_type='purchase') AS BIGINT) x
           FROM events GROUP BY 1),
g AS (SELECT CASE WHEN {_HASH60_SQL.format(v="CAST(u AS VARCHAR) || ':ab'")} % 2 = 0
                  THEN 'A' ELSE 'B' END grp, x FROM u),
agg AS (SELECT grp, CAST(count(*) AS BIGINT) n, CAST(sum(x) AS BIGINT) s,
          CAST(sum(x*x) AS BIGINT) ss FROM g GROUP BY 1),
w AS (SELECT
  max(CASE WHEN grp='A' THEN n END) na, max(CASE WHEN grp='A' THEN s END) sa,
  max(CASE WHEN grp='A' THEN ss END) ssa,
  max(CASE WHEN grp='B' THEN n END) nb, max(CASE WHEN grp='B' THEN s END) sb,
  max(CASE WHEN grp='B' THEN ss END) ssb
  FROM agg)
SELECT na, nb, round(sa*1.0/na,6) mean_a, round(sb*1.0/nb,6) mean_b,
  round( (sa*1.0/na - sb*1.0/nb) /
    sqrt( ((ssa - CAST(sa AS DOUBLE)*sa/na)/(na-1.0))/na
        + ((ssb - CAST(sb AS DOUBLE)*sb/nb)/(nb-1.0))/nb ), 6) z_stat
FROM w"""


def q_nation_outlier_loo(spark, sf_dir):
    """Leave-one-out z-score per nation revenue: each nation scored
    against the mean/std of the OTHER nations (LOO removes the
    self-masking that deflates a plain z-score when the outlier
    inflates the pooled std). Closed form from the global (k, Σx, Σx²)
    — decimal(38,0) squares, one broadcast of the 1-row totals."""
    r = (
        _t(spark, sf_dir, "orders")
        .join(
            F.broadcast(_t(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            )
            .cast("bigint")
            .alias("cents")
        )
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    tot = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("cents").cast("bigint").alias("s"),
        F.sum(d38("cents") * d38("cents")).cast("decimal(38,0)").alias("ss"),
    )
    others_mean = (F.col("s") - F.col("cents")) * 1.0 / (F.col("k") - 1)
    # ((Σx² − x²) − (Σx − x)²/(k−1)) / (k−2): the LOO sample variance,
    # mirrors the oracle's HUGEINT/double operand order exactly
    s_minus = F.col("s").cast("double") - F.col("cents")
    others_var = (
        (
            F.col("ss").cast("double")
            - F.col("cents").cast("double") * F.col("cents")
        )
        - s_minus * (F.col("s") - F.col("cents")) / (F.col("k") - 1.0)
    ) / (F.col("k") - 2.0)
    return r.crossJoin(F.broadcast(tot)).select(
        "nation",
        "cents",
        F.round(
            (F.col("cents") - others_mean) / F.sqrt(others_var), 6
        ).alias("loo_z"),
    )


SQL_NATION_OUTLIER_LOO = """
WITH r AS (SELECT n.n_name nation,
             CAST(sum(CAST(round(o.o_totalprice*100,0) AS BIGINT))
                  AS BIGINT) cents
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN nation n ON c.c_nationkey = n.n_nationkey
           GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) k, CAST(sum(cents) AS BIGINT) s,
          CAST(sum(CAST(cents AS HUGEINT)*cents) AS HUGEINT) ss FROM r)
SELECT nation, cents,
  round((cents - (s - cents)*1.0/(k-1)) /
        sqrt( ((ss - CAST(cents AS HUGEINT)*cents)
               - CAST((s-cents) AS HUGEINT)*(s-cents)/(k-1.0)) / (k-2.0) ),
        6) loo_z
FROM r, tot"""


def q_epoch_plan(spark, sf_dir):
    """Multilingual upsampling-epoch plan (the dual of domain_mixture's
    downsample gate): per language, the T=2 target share, the epoch
    multiplier target/natural capped at 4 (the standard repeat budget
    before memorization risk), and the effective token count the
    schedule yields. All shares from exact token counts; the Σ√ scalar
    follows domain_mixture's sqrt convention."""
    from llmaix_spark.operators.textstats import _tokens

    c = (
        _t(spark, sf_dir, "documents")
        .select("lang", F.explode(_tokens(F.col("text"))).alias("t"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"))
        # two consumers (share rows + the Σ√ scalar)
        .localCheckpoint(eager=False)
    )
    nt = c.agg(F.sum("n_tokens").cast("bigint").alias("nt"))
    withtot = c.crossJoin(F.broadcast(nt))
    z = withtot.agg(
        F.sum(F.sqrt(F.col("n_tokens") * 1.0 / F.col("nt"))).alias("z")
    )
    s = F.col("n_tokens") * 1.0 / F.col("nt")
    target = F.sqrt(s) / F.col("z")
    epochs = F.least(F.lit(4.0), target * F.col("nt") / F.col("n_tokens"))
    return withtot.crossJoin(F.broadcast(z)).select(
        "lang",
        "n_tokens",
        F.round(s, 6).alias("natural_share"),
        F.round(target, 6).alias("target_share"),
        F.round(epochs, 6).alias("epochs"),
        F.round(F.col("n_tokens") * epochs, 0)
        .cast("bigint")
        .alias("effective_tokens"),
    )


SQL_EPOCH_PLAN = r"""
WITH w AS (SELECT lang, unnest(list_filter(
             string_split_regex(lower(trim(text)),'\s+'),
             x->length(x)>0)) t FROM documents),
c AS (SELECT lang, CAST(count(*) AS BIGINT) n_tokens FROM w GROUP BY 1),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) nt,
          sum(sqrt(n_tokens*1.0/(SELECT sum(n_tokens) FROM c))) z FROM c)
SELECT lang, n_tokens,
  round(n_tokens*1.0/nt, 6) natural_share,
  round(sqrt(n_tokens*1.0/nt)/z, 6) target_share,
  round(least(4.0, (sqrt(n_tokens*1.0/nt)/z) * nt / n_tokens), 6) epochs,
  CAST(round(n_tokens * least(4.0, (sqrt(n_tokens*1.0/nt)/z) * nt
                                   / n_tokens), 0) AS BIGINT)
    effective_tokens
FROM c, tot"""


def q_dedup_triangle_audit(spark, sf_dir):
    """Transitivity audit of the threshold dedup graph: count 2-paths
    (A~B~C wedges) and how many close (A~C also ≥ threshold). A low
    closure rate means single-link CC clustering is chaining unrelated
    docs through bridges — the canary a dedup pass checks before
    trusting group survivors. One row: pairs, wedges, closed,
    transitivity. Wedge join runs at the PAIR grain (near-dup pairs,
    tiny relative to the corpus)."""
    pairs = dd.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), 0.5
    ).select("doc_a", "doc_b").localCheckpoint(eager=False)
    sym = pairs.select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    ).unionAll(
        pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b"))
    )
    s1 = sym.select(F.col("a").alias("x"), F.col("b").alias("m"))
    s2 = sym.select(F.col("a").alias("m"), F.col("b").alias("y"))
    wedge = s1.join(s2, "m").where(F.col("x") < F.col("y"))
    closing = pairs.select(
        F.col("doc_a").alias("x"), F.col("doc_b").alias("y"), F.lit(1).alias("hit")
    )
    closed = wedge.join(closing, ["x", "y"], "left")
    n_pairs = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    agg = closed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_wedges"),
        F.sum(F.col("hit").isNotNull().cast("bigint"))
        .cast("bigint")
        .alias("n_closed"),
    )
    return agg.crossJoin(F.broadcast(n_pairs)).select(
        "n_pairs",
        "n_wedges",
        "n_closed",
        F.round(F.col("n_closed") * 1.0 / F.col("n_wedges"), 6).alias(
            "transitivity"
        ),
    )


SQL_DEDUP_TRIANGLE_AUDIT = f"""
WITH {_TRIGRAM_SQL},
common AS (SELECT a.doc_id da, b.doc_id db, count(*) c FROM sh a
           JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
p AS (SELECT da, db
      FROM common JOIN cnt na ON da = na.doc_id JOIN cnt nb ON db = nb.doc_id
      WHERE c * 1.0 / (na.n + nb.n - c) >= 0.5),
sym AS (SELECT da a, db b FROM p UNION ALL SELECT db, da FROM p),
wedge AS (SELECT s1.a x, s1.b m, s2.b y FROM sym s1 JOIN sym s2
          ON s1.b = s2.a AND s1.a < s2.b),
closed AS (SELECT w.x, w.y, (p2.da IS NOT NULL) is_closed
           FROM wedge w LEFT JOIN p p2 ON p2.da = w.x AND p2.db = w.y)
SELECT CAST((SELECT count(*) FROM p) AS BIGINT) n_pairs,
       CAST(count(*) AS BIGINT) n_wedges,
       CAST(count(*) FILTER (is_closed) AS BIGINT) n_closed,
       round(count(*) FILTER (is_closed) * 1.0 / count(*), 6) transitivity
FROM closed"""


def q_share_of_parent(spark, sf_dir):
    """Two-level share-of-parent rollup (the BI drilldown contract):
    nation revenue, its share within the region, and the region's
    share of the grand total — three grains stitched by broadcast
    joins, exact integer cents at every level."""
    j = (
        _t(spark, sf_dir, "orders")
        .join(
            F.broadcast(_t(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("bigint")
            .alias("cents"),
        )
    )
    nat = j.groupBy("nation", "region").agg(
        F.sum("cents").cast("bigint").alias("nation_cents")
    ).localCheckpoint(eager=False)
    reg = nat.groupBy("region").agg(
        F.sum("nation_cents").cast("bigint").alias("region_cents")
    ).localCheckpoint(eager=False)
    tot = reg.agg(F.sum("region_cents").cast("bigint").alias("t"))
    return (
        nat.join(F.broadcast(reg), "region")
        .crossJoin(F.broadcast(tot))
        .select(
            "nation",
            "region",
            "nation_cents",
            "region_cents",
            F.round(
                F.col("nation_cents") * 1.0 / F.col("region_cents"), 6
            ).alias("share_in_region"),
            F.round(F.col("region_cents") * 1.0 / F.col("t"), 6).alias(
                "region_share"
            ),
        )
    )


SQL_SHARE_OF_PARENT = """
WITH j AS (SELECT n.n_name nation, r.r_name region,
             CAST(round(o.o_totalprice*100,0) AS BIGINT) cents
           FROM orders o JOIN customer c ON o.o_custkey=c.c_custkey
                JOIN nation n ON c.c_nationkey=n.n_nationkey
                JOIN region r ON n.n_regionkey=r.r_regionkey),
nat AS (SELECT nation, region, CAST(sum(cents) AS BIGINT) nation_cents
        FROM j GROUP BY 1,2),
reg AS (SELECT region, CAST(sum(nation_cents) AS BIGINT) region_cents
        FROM nat GROUP BY 1),
tot AS (SELECT CAST(sum(region_cents) AS BIGINT) t FROM reg)
SELECT nat.nation, nat.region, nat.nation_cents, reg.region_cents,
       round(nat.nation_cents*1.0/reg.region_cents, 6) share_in_region,
       round(reg.region_cents*1.0/(SELECT t FROM tot), 6) region_share
FROM nat JOIN reg USING (region)"""


def q_realized_vs_list(spark, sf_dir):
    """Realized-vs-list price audit per brand: the gap between summed
    realized unit prices and summed list (retail) prices — the
    catalog-pricing health check that finally exercises
    part.p_retailprice. Integer-cent sums; one broadcast dim join."""
    u = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 0)
        .join(
            F.broadcast(_t(spark, sf_dir, "part")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            F.col("p_brand").alias("brand"),
            F.round(F.col("l_extendedprice") * 100 / F.col("l_quantity"), 0)
            .cast("bigint")
            .alias("unit_cents"),
            F.round(F.col("p_retailprice") * 100, 0)
            .cast("bigint")
            .alias("list_cents"),
        )
    )
    return u.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum("unit_cents").cast("bigint").alias("realized_cents"),
        F.sum("list_cents").cast("bigint").alias("list_cents"),
        F.round(
            1.0 - F.sum("unit_cents") * 1.0 / F.sum("list_cents"), 6
        ).alias("mean_gap"),
    )


SQL_REALIZED_VS_LIST = """
WITH u AS (SELECT p.p_brand brand,
             CAST(round(li.l_extendedprice*100/li.l_quantity,0) AS BIGINT)
               unit_cents,
             CAST(round(p.p_retailprice*100,0) AS BIGINT) list_cents
           FROM lineitem li JOIN part p ON li.l_partkey = p.p_partkey
           WHERE li.l_quantity > 0)
SELECT brand, CAST(count(*) AS BIGINT) n_lines,
       CAST(sum(unit_cents) AS BIGINT) realized_cents,
       CAST(sum(list_cents) AS BIGINT) list_cents,
       round(1.0 - sum(unit_cents)*1.0/sum(list_cents), 6) mean_gap
FROM u GROUP BY 1"""


def q_supplier_concentration(spark, sf_dir):
    """Supply-chain concentration per part: supplier count, the top
    supplier's quantity share, and the supplier HHI (Σ share² from
    exact integer quantities — decimal squares, one division). The
    single-source-risk scan over the rarely-touched l_suppkey axis."""
    s = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("part_key"),
            F.col("l_suppkey").alias("sk"),
        )
        .agg(
            F.sum(F.round("l_quantity", 0).cast("bigint"))
            .cast("bigint")
            .alias("q")
        )
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    a = s.groupBy("part_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum("q").cast("bigint").alias("total_q"),
        F.max("q").cast("bigint").alias("top_q"),
        F.sum(d38("q") * d38("q")).cast("decimal(38,0)").alias("sq2"),
    )
    return a.select(
        "part_key",
        "n_suppliers",
        "total_q",
        F.round(F.col("top_q") * 1.0 / F.col("total_q"), 6).alias(
            "top_share"
        ),
        F.round(
            F.col("sq2").cast("double")
            / (F.col("total_q").cast("double") * F.col("total_q")),
            6,
        ).alias("hhi"),
    )


SQL_SUPPLIER_CONCENTRATION = """
WITH s AS (SELECT l_partkey pk, l_suppkey sk,
             CAST(sum(CAST(round(l_quantity,0) AS BIGINT)) AS BIGINT) q
           FROM lineitem GROUP BY 1,2),
a AS (SELECT pk, CAST(count(*) AS BIGINT) n_suppliers,
        CAST(sum(q) AS BIGINT) total_q, CAST(max(q) AS BIGINT) top_q,
        CAST(sum(CAST(q AS HUGEINT)*q) AS HUGEINT) sq2
      FROM s GROUP BY 1)
SELECT pk AS part_key, n_suppliers, total_q,
       round(top_q*1.0/total_q, 6) top_share,
       round(CAST(sq2 AS DOUBLE)/(CAST(total_q AS DOUBLE)*total_q), 6) hhi
FROM a"""


def q_quant_error(spark, sf_dir):
    """Reconstruction-error audit of the int8 symmetric quantization
    (the quality gate on quantize_embeddings): per class label, the
    summed squared error of x − round(x/scale)·scale in exact
    pico-units (per-element quantization BEFORE the sum, so the
    roll-up is order-independent) and the RMSE. Long-format explode +
    one groupBy."""
    e = _t(spark, sf_dir, "embeddings").select(
        "label",
        F.transform(
            F.col("embedding"), lambda x: x.cast("double")
        ).alias("v"),
    )
    s = e.select(
        "label",
        "v",
        (
            F.array_max(F.transform(F.col("v"), lambda x: F.abs(x)))
            / 127.0
        ).alias("scale"),
    )
    u = s.select("label", "scale", F.explode("v").alias("x"))
    err = F.col("x") - F.when(F.col("scale") == 0, 0.0).otherwise(
        F.round(F.col("x") / F.col("scale"), 0) * F.col("scale")
    )
    pico = F.round(F.pow(err, 2) * 1e12, 0).cast("bigint")
    return (
        u.select(F.col("label").cast("bigint").alias("label_id"), pico.alias("pico"))
        .groupBy("label_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_elems"),
            F.sum("pico").cast("bigint").alias("sse_pico"),
        )
        .select(
            "label_id",
            "n_elems",
            "sse_pico",
            F.round(
                F.sqrt(F.col("sse_pico") * 1.0 / F.col("n_elems") / 1e12),
                9,
            ).alias("rmse"),
        )
    )


SQL_QUANT_ERROR = """
WITH e AS (SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) v
           FROM embeddings),
s AS (SELECT vec_id, label, v,
        list_max(list_transform(v, x -> abs(x))) / 127.0 scale FROM e),
u AS (SELECT label, scale, unnest(v) x FROM s),
t AS (SELECT label,
        CAST(round(power(x - CASE WHEN scale = 0 THEN 0
                                  ELSE round(x/scale,0)*scale END, 2)
                   * 1e12, 0) AS BIGINT) pico
      FROM u)
SELECT CAST(label AS BIGINT) label_id, CAST(count(*) AS BIGINT) n_elems,
       CAST(sum(pico) AS BIGINT) sse_pico,
       round(sqrt(sum(pico)*1.0/count(*)/1e12), 9) rmse
FROM t GROUP BY 1"""


def q_repeat_bestsellers(spark, sf_dir):
    """Recurring bestsellers: parts landing in the monthly top-20
    revenue chart at least twice, with their hit rate over all months
    — separates durable winners from one-month spikes. The ranking
    window partitions by month; everything downstream is
    map-side-combinable."""
    from pyspark.sql import Window

    m = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(
            (
                F.year(F.col("l_shipdate").cast("timestamp")) * 12
                + F.month(F.col("l_shipdate").cast("timestamp"))
            )
            .cast("bigint")
            .alias("mk"),
            F.col("l_partkey").alias("part_key"),
        )
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * 100,
                    0,
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("cents")
        )
        # two consumers (ranking + month count)
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("mk").orderBy(F.desc("cents"), F.asc("part_key"))
    hits = (
        m.select("mk", "part_key", F.row_number().over(w).alias("r"))
        .where(F.col("r") <= 20)
        .groupBy("part_key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_top"))
        .where(F.col("n_top") >= 2)
    )
    months = m.agg(
        F.countDistinct("mk").cast("bigint").alias("n_months")
    )
    return hits.crossJoin(F.broadcast(months)).select(
        "part_key",
        "n_top",
        "n_months",
        F.round(F.col("n_top") * 1.0 / F.col("n_months"), 6).alias(
            "top_rate"
        ),
    )


SQL_REPEAT_BESTSELLERS = """
WITH m AS (SELECT CAST(year(l_shipdate)*12 + month(l_shipdate) AS BIGINT) mk,
             l_partkey pk,
             CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100,0)
                           AS BIGINT)) AS BIGINT) cents
           FROM lineitem GROUP BY 1,2),
rk AS (SELECT mk, pk,
         row_number() OVER (PARTITION BY mk ORDER BY cents DESC, pk) r
       FROM m),
months AS (SELECT CAST(count(DISTINCT mk) AS BIGINT) nm FROM m),
hits AS (SELECT pk, CAST(count(*) AS BIGINT) n_top FROM rk
         WHERE r <= 20 GROUP BY 1 HAVING count(*) >= 2)
SELECT pk AS part_key, n_top, (SELECT nm FROM months) n_months,
       round(n_top*1.0/(SELECT nm FROM months), 6) top_rate
FROM hits"""


def q_fk_cardinality(spark, sf_dir):
    """Referential-cardinality profile of the star schema: per FK edge
    the child row count, distinct parents referenced, parent coverage
    (are there cold parents?) and the max fan-in (is any parent hot?) —
    the join-planning statistics a warehouse collects before choosing
    broadcast vs shuffle strategies. Each leg is a pair of map-side
    combinable aggregates; no joins at all."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cu = _t(spark, sf_dir, "customer")
    pa = _t(spark, sf_dir, "part")
    na = _t(spark, sf_dir, "nation")

    def leg(name, child, key, parent):
        fan = (
            child.groupBy(key)
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.max("c").cast("bigint").alias("max_fan_in"))
        )
        stats = child.agg(
            F.count(F.lit(1)).cast("bigint").alias("child_rows"),
            F.countDistinct(key).cast("bigint").alias("parents_referenced"),
        )
        ptot = parent.agg(
            F.count(F.lit(1)).cast("bigint").alias("parents_total")
        )
        return (
            stats.crossJoin(F.broadcast(ptot))
            .crossJoin(F.broadcast(fan))
            .select(
                F.lit(name).alias("fk"),
                "child_rows",
                "parents_referenced",
                "parents_total",
                F.round(
                    F.col("parents_referenced") * 1.0
                    / F.col("parents_total"),
                    6,
                ).alias("parent_coverage"),
                "max_fan_in",
            )
        )

    return (
        leg("orders->customer", o, "o_custkey", cu)
        .unionAll(leg("lineitem->orders", li, "l_orderkey", o))
        .unionAll(leg("lineitem->part", li, "l_partkey", pa))
        .unionAll(leg("customer->nation", cu, "c_nationkey", na))
    )


SQL_FK_CARDINALITY = """
WITH f AS (
  SELECT 'orders->customer' fk, CAST(count(*) AS BIGINT) child_rows,
         CAST(count(DISTINCT o_custkey) AS BIGINT) parents_referenced,
         (SELECT CAST(count(*) AS BIGINT) FROM customer) parents_total,
         (SELECT CAST(max(c) AS BIGINT)
          FROM (SELECT count(*) c FROM orders GROUP BY o_custkey))
           max_fan_in
  FROM orders
  UNION ALL
  SELECT 'lineitem->orders', count(*), count(DISTINCT l_orderkey),
         (SELECT count(*) FROM orders),
         (SELECT max(c)
          FROM (SELECT count(*) c FROM lineitem GROUP BY l_orderkey))
  FROM lineitem
  UNION ALL
  SELECT 'lineitem->part', count(*), count(DISTINCT l_partkey),
         (SELECT count(*) FROM part),
         (SELECT max(c)
          FROM (SELECT count(*) c FROM lineitem GROUP BY l_partkey))
  FROM lineitem
  UNION ALL
  SELECT 'customer->nation', count(*), count(DISTINCT c_nationkey),
         (SELECT count(*) FROM nation),
         (SELECT max(c)
          FROM (SELECT count(*) c FROM customer GROUP BY c_nationkey))
  FROM customer)
SELECT fk, child_rows, parents_referenced, parents_total,
       round(parents_referenced*1.0/parents_total, 6) parent_coverage,
       max_fan_in
FROM f"""


def q_topk_overlap(spark, sf_dir):
    """Rank-stability at the set level: Jaccard overlap between the
    top-k customers by REVENUE and by ORDER COUNT at k ∈ {10, 25, 50,
    100} — whether 'best customers' means the same thing under two
    metrics (spearman_corr answers this for the full ranking; @k
    set-overlap answers it where decisions are made). Two windows over
    the customer grain, then a 4-row k sweep."""
    from pyspark.sql import Window

    per = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("cents"),
        )
    )
    r = per.select(
        "ck",
        F.row_number()
        .over(Window.orderBy(F.desc("cents"), F.asc("ck")))
        .alias("rk_rev"),
        F.row_number()
        .over(Window.orderBy(F.desc("n_orders"), F.asc("ck")))
        .alias("rk_freq"),
    )
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in (10, 25, 50, 100)])).alias(
            "k"
        )
    )
    both = F.sum(
        ((F.col("rk_rev") <= F.col("k")) & (F.col("rk_freq") <= F.col("k")))
        .cast("bigint")
    ).cast("bigint")
    return (
        r.crossJoin(F.broadcast(ks))
        .groupBy(F.col("k").cast("bigint").alias("k"))
        .agg(both.alias("n_both"))
        .select(
            "k",
            "n_both",
            F.round(
                F.col("n_both") * 1.0 / (2 * F.col("k") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
    )


SQL_TOPK_OVERLAP = """
WITH per AS (SELECT o_custkey ck, CAST(count(*) AS BIGINT) n_orders,
               CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT))
                    AS BIGINT) cents
             FROM orders GROUP BY 1),
r AS (SELECT ck,
        row_number() OVER (ORDER BY cents DESC, ck) rk_rev,
        row_number() OVER (ORDER BY n_orders DESC, ck) rk_freq
      FROM per),
ks AS (SELECT unnest([10,25,50,100]) k)
SELECT CAST(k AS BIGINT) k,
  CAST(count(*) FILTER (rk_rev <= k AND rk_freq <= k) AS BIGINT) n_both,
  round(count(*) FILTER (rk_rev <= k AND rk_freq <= k) * 1.0 /
        (2*k - count(*) FILTER (rk_rev <= k AND rk_freq <= k)), 6) jaccard
FROM r, ks GROUP BY k"""


def q_dedup_rate_by_source(spark, sf_dir):
    """Dedup composition readout: per language, the share of documents
    that belong to any ≥-threshold near-dup pair — which slices of the
    corpus are redundant (feeds the epoch/mixture planners). Exact
    pair generator (oracle path); the member set is a distinct over
    the (tiny) pair list."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(docs, 0.5)
    dup = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionAll(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    return (
        docs.select("doc_id", "lang")
        .join(F.broadcast(dup), "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col("is_dup").isNotNull().cast("bigint"))
            .cast("bigint")
            .alias("n_dup_members"),
            F.round(
                F.sum(F.col("is_dup").isNotNull().cast("bigint"))
                / F.count(F.lit(1)),
                6,
            ).alias("dup_rate"),
        )
    )


SQL_DEDUP_RATE_BY_SOURCE = f"""
WITH {_TRIGRAM_SQL},
common AS (SELECT a.doc_id da, b.doc_id db, count(*) c FROM sh a
           JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
p AS (SELECT da, db
      FROM common JOIN cnt na ON da = na.doc_id JOIN cnt nb ON db = nb.doc_id
      WHERE c * 1.0 / (na.n + nb.n - c) >= 0.5),
dup AS (SELECT da doc_id FROM p UNION SELECT db FROM p)
SELECT d2.lang, CAST(count(*) AS BIGINT) n_docs,
       CAST(count(dup.doc_id) AS BIGINT) n_dup_members,
       round(count(dup.doc_id)*1.0/count(*), 6) dup_rate
FROM documents d2 LEFT JOIN dup ON d2.doc_id = dup.doc_id
GROUP BY 1"""


def q_emd_segments(spark, sf_dir):
    """Exact 1-D earth mover's distance between the BUILDING segment's
    order-value distribution and everyone else's — the integral
    companion of ks_statistic's max-gap. The trapezoid sum
    Σ |cumA·nb − cumB·na| · gap accumulates in decimal(38,0) — EXACT
    integers, order-independent — and divides by na·nb·100 once at
    the end. One value-grain window (bounded by distinct cent values);
    the 1-row counts broadcast."""
    from pyspark.sql import Window

    x = (
        _t(spark, sf_dir, "orders")
        .join(
            F.broadcast(_t(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("bigint")
            .alias("v"),
            (F.col("c_mktsegment") == "BUILDING").alias("is_a"),
        )
    )
    n = x.agg(
        F.sum(F.col("is_a").cast("bigint")).cast("bigint").alias("na"),
        F.sum((~F.col("is_a")).cast("bigint")).cast("bigint").alias("nb"),
    )
    g = x.groupBy("v").agg(
        F.sum(F.col("is_a").cast("bigint")).cast("bigint").alias("ca"),
        F.sum((~F.col("is_a")).cast("bigint")).cast("bigint").alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = g.select(
        "v",
        F.sum("ca").over(w).cast("bigint").alias("cum_a"),
        F.sum("cb").over(w).cast("bigint").alias("cum_b"),
        F.lead("v").over(Window.orderBy("v")).alias("next_v"),
    )
    d38 = lambda c_: F.col(c_).cast("decimal(38,0)")  # noqa: E731
    term = F.abs(
        d38("cum_a") * d38("nb") - d38("cum_b") * d38("na")
    ) * (d38("next_v") - d38("v"))
    agg = (
        c.where(F.col("next_v").isNotNull())
        .crossJoin(F.broadcast(n))
        .agg(
            F.max("na").cast("bigint").alias("na"),
            F.max("nb").cast("bigint").alias("nb"),
            F.sum(term).cast("decimal(38,0)").alias("s"),
        )
    )
    return agg.select(
        "na",
        "nb",
        F.round(
            F.col("s").cast("double")
            / (F.col("na").cast("double") * F.col("nb"))
            / 100.0,
            6,
        ).alias("emd_dollars"),
    )


SQL_EMD_SEGMENTS = """
WITH x AS (SELECT CAST(round(o.o_totalprice*100,0) AS BIGINT) v,
             (c.c_mktsegment = 'BUILDING') is_a
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
n AS (SELECT CAST(count(*) FILTER (is_a) AS BIGINT) na,
        CAST(count(*) FILTER (NOT is_a) AS BIGINT) nb FROM x),
g AS (SELECT v, CAST(count(*) FILTER (is_a) AS BIGINT) ca,
        CAST(count(*) FILTER (NOT is_a) AS BIGINT) cb
      FROM x GROUP BY 1),
c AS (SELECT v,
        sum(ca) OVER (ORDER BY v) cum_a, sum(cb) OVER (ORDER BY v) cum_b,
        lead(v) OVER (ORDER BY v) next_v
      FROM g),
s AS (SELECT CAST(sum(abs(CAST(cum_a AS HUGEINT)*(SELECT nb FROM n)
                          - CAST(cum_b AS HUGEINT)*(SELECT na FROM n))
                      * (next_v - v)) AS HUGEINT) s
      FROM c WHERE next_v IS NOT NULL)
SELECT (SELECT na FROM n) na, (SELECT nb FROM n) nb,
  round(CAST(s AS DOUBLE)
        / (CAST((SELECT na FROM n) AS DOUBLE) * (SELECT nb FROM n))
        / 100.0, 6) emd_dollars
FROM s"""


def q_hill_tail(spark, sf_dir):
    """Hill tail-index estimate on the top-250 order values:
    α̂ = 1 / mean(ln(x_i / x_k)) — the heavy-tail exponent a capacity
    planner needs (zipf_fit answers it for token ranks; Hill answers
    it for value tails). Per-term ln rounded to 9dp (libm ulp). The
    global rank window is the small-SF oracle shape — at scale take
    the top k+1 with a TakeOrdered/limit instead."""
    from pyspark.sql import Window

    x = _t(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("v")
    )
    r = x.select(
        "v", F.row_number().over(Window.orderBy(F.desc("v"))).alias("rk")
    ).localCheckpoint(eager=False)
    thr = r.where(F.col("rk") == 251).select(F.col("v").alias("xk"))
    logs = (
        r.where(F.col("rk") <= 250)
        .crossJoin(F.broadcast(thr))
        .select(
            F.round(F.log(F.col("v") * 1.0 / F.col("xk")), 9).alias("lg"),
            "xk",
        )
    )
    return logs.agg(
        F.lit(250).cast("bigint").alias("k"),
        F.max("xk").cast("bigint").alias("x_k"),
        F.round(1.0 / F.avg("lg"), 6).alias("hill_alpha"),
    )


SQL_HILL_TAIL = """
WITH x AS (SELECT CAST(round(o_totalprice*100,0) AS BIGINT) v FROM orders),
r AS (SELECT v, row_number() OVER (ORDER BY v DESC) rk FROM x),
thr AS (SELECT v xk FROM r WHERE rk = 251),
logs AS (SELECT round(ln(r.v*1.0/(SELECT xk FROM thr)), 9) lg,
                (SELECT xk FROM thr) xk
         FROM r WHERE rk <= 250)
SELECT CAST(250 AS BIGINT) k, CAST(max(xk) AS BIGINT) x_k,
       round(1.0/avg(lg), 6) hill_alpha
FROM logs"""


def q_promo_share_trend(spark, sf_dir):
    """Monthly share of revenue sold under ANY discount — the
    promotion-dependence trend a pricing team watches. One map-side
    combinable groupBy on exact integer cents."""
    li = _t(spark, sf_dir, "lineitem").select(
        (
            F.year(F.col("l_shipdate").cast("timestamp")) * 12
            + F.month(F.col("l_shipdate").cast("timestamp"))
        )
        .cast("bigint")
        .alias("mk"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
        .cast("bigint")
        .alias("cents"),
        (F.col("l_discount") > 0).alias("promo"),
    )
    return li.groupBy("mk").agg(
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.sum(F.when(F.col("promo"), F.col("cents")))
        .cast("bigint")
        .alias("promo_cents"),
        F.round(
            F.sum(F.when(F.col("promo"), F.col("cents"))) * 1.0
            / F.sum("cents"),
            6,
        ).alias("promo_share"),
    )


SQL_PROMO_SHARE_TREND = """
WITH li AS (SELECT CAST(year(l_shipdate)*12 + month(l_shipdate) AS BIGINT)
              mk,
              CAST(round(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)
                cents,
              (l_discount > 0) promo
            FROM lineitem)
SELECT mk, CAST(sum(cents) AS BIGINT) total_cents,
       CAST(sum(cents) FILTER (promo) AS BIGINT) promo_cents,
       round(sum(cents) FILTER (promo) * 1.0 / sum(cents), 6) promo_share
FROM li GROUP BY 1"""


def q_minhash_calibration(spark, sf_dir):
    """Calibration audit of the MinHash estimator itself: on every
    exact-verified pair (J ≥ 0.5), compare the 16-function signature
    agreement rate ĵ = matches/16 against the exact Jaccard — the
    bias/MAE readout that justifies the banding thresholds the LSH
    operators run with. One row. Signatures and exact pairs share the
    shingle machinery; the pair table is tiny, signatures broadcast."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(docs, 0.5)
    sigs = dd.doc_minhash_signatures(docs)
    k = len(_MINHASH_AB)
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(k)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(k)],
    )
    agree = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(k)
    )
    est = (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select("jaccard", (agree / float(k)).alias("jhat"))
    )
    diff = F.col("jhat") - F.col("jaccard")
    return est.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.avg(diff), 6).alias("mean_bias"),
        F.round(F.avg(F.abs(diff)), 6).alias("mae"),
        F.round(F.max(F.abs(diff)), 6).alias("max_abs_err"),
    )


def _minhash_calibration_sql() -> str:
    h = f"({_HASH60_SQL.format(v='s')} % {_P})"
    mins = ", ".join(
        f"min(({a} * {h} + {b}) % {_P}) AS h{i}"
        for i, (a, b) in enumerate(_MINHASH_AB)
    )
    agree = " + ".join(
        f"CAST(sa.h{i} = sb.h{i} AS INT)" for i in range(len(_MINHASH_AB))
    )
    return f"""
WITH {_TRIGRAM_SQL},
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
common AS (SELECT a.doc_id da, b.doc_id db, count(*) c FROM sh a
           JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
p AS (SELECT da, db, round(c*1.0/(na.n + nb.n - c), 6) j
      FROM common JOIN cnt na ON da=na.doc_id JOIN cnt nb ON db=nb.doc_id
      WHERE c*1.0/(na.n + nb.n - c) >= 0.5),
est AS (SELECT p.j, ({agree})/16.0 jhat
        FROM p JOIN sig sa ON sa.doc_id = p.da
               JOIN sig sb ON sb.doc_id = p.db)
SELECT CAST(count(*) AS BIGINT) n_pairs,
       round(avg(jhat - j), 6) mean_bias,
       round(avg(abs(jhat - j)), 6) mae,
       round(max(abs(jhat - j)), 6) max_abs_err
FROM est"""


SQL_MINHASH_CALIBRATION = _minhash_calibration_sql()


def q_dq_rules(spark, sf_dir):
    """Declarative data-quality rule engine (the deequ-shaped surface):
    a fixed rule table evaluated in one pass per target —
    positivity, range, uniqueness, null-rate, FK coverage — each row
    reporting the observed metric (6dp rate) and the verdict. Every
    rule is a map-side-combinable aggregate; no joins except the FK
    probe, which broadcasts the parent keys."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cu = _t(spark, sf_dir, "customer")
    docs = _t(spark, sf_dir, "documents")
    ev = _t(spark, sf_dir, "events")

    def rule(name, df, metric, passed):
        return df.agg(
            F.lit(name).alias("rule_name"),
            F.round(metric, 6).alias("observed"),
            passed.alias("passed"),
        )

    share = lambda cond: F.sum(cond.cast("bigint")) / F.count(F.lit(1))  # noqa: E731
    r1 = rule(
        "orders.totalprice > 0",
        o,
        share(F.col("o_totalprice") > 0),
        (F.sum((F.col("o_totalprice") <= 0).cast("bigint")) == 0),
    )
    r2 = rule(
        "lineitem.quantity in [0,100]",
        li,
        share(F.col("l_quantity").between(0, 100)),
        (
            F.sum((~F.col("l_quantity").between(0, 100)).cast("bigint"))
            == 0
        ),
    )
    r3 = rule(
        "customer.custkey unique",
        cu,
        F.countDistinct("c_custkey") / F.count(F.lit(1)),
        (F.countDistinct("c_custkey") == F.count(F.lit(1))),
    )
    r4 = rule(
        "events.event_id unique",
        ev,
        F.countDistinct("event_id") / F.count(F.lit(1)),
        (F.countDistinct("event_id") == F.count(F.lit(1))),
    )
    r5 = rule(
        "documents.text not null",
        docs,
        share(F.col("text").isNotNull()),
        (F.sum(F.col("text").isNull().cast("bigint")) == 0),
    )
    fk = o.join(
        F.broadcast(
            cu.select(
                F.col("c_custkey").alias("o_custkey"),
                F.lit(1).alias("_pk"),
            )
        ),
        "o_custkey",
        "left",
    ).select(F.col("_pk").isNotNull().alias("_hit"))
    r6 = rule(
        "orders.custkey fk-covered",
        fk,
        share(F.col("_hit")),
        (F.sum((~F.col("_hit")).cast("bigint")) == 0),
    )
    return r1.unionAll(r2).unionAll(r3).unionAll(r4).unionAll(r5).unionAll(r6)


SQL_DQ_RULES = """
SELECT 'orders.totalprice > 0' rule_name,
       round(count(*) FILTER (o_totalprice > 0) * 1.0 / count(*), 6)
         observed,
       count(*) FILTER (o_totalprice <= 0) = 0 passed
FROM orders
UNION ALL
SELECT 'lineitem.quantity in [0,100]',
       round(count(*) FILTER (l_quantity BETWEEN 0 AND 100) * 1.0
             / count(*), 6),
       count(*) FILTER (l_quantity NOT BETWEEN 0 AND 100) = 0
FROM lineitem
UNION ALL
SELECT 'customer.custkey unique',
       round(count(DISTINCT c_custkey) * 1.0 / count(*), 6),
       count(DISTINCT c_custkey) = count(*)
FROM customer
UNION ALL
SELECT 'events.event_id unique',
       round(count(DISTINCT event_id) * 1.0 / count(*), 6),
       count(DISTINCT event_id) = count(*)
FROM events
UNION ALL
SELECT 'documents.text not null',
       round(count(*) FILTER (text IS NOT NULL) * 1.0 / count(*), 6),
       count(*) FILTER (text IS NULL) = 0
FROM documents
UNION ALL
SELECT 'orders.custkey fk-covered',
       round(count(c.c_custkey) * 1.0 / count(*), 6),
       count(*) - count(c.c_custkey) = 0
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey"""


def q_embedding_drift(spark, sf_dir):
    """Embedding drift audit: per label, the cosine between the
    centroid of the EARLY half (even vec_id, standing in for the old
    snapshot) and the LATE half — 'did the class mean move between
    refreshes'. Same micro-quantized exact-sum convention as
    label_centroid_cosine; here the halves of one class compare
    instead of two classes."""
    emb = _t(spark, sf_dir, "embeddings")
    x = emb.select(
        (F.col("vec_id") % 2 == 0).alias("early"),
        F.col("label").cast("bigint").alias("label_id"),
        F.posexplode("embedding").alias("d", "v"),
    )
    qv = F.round(F.col("v").cast("double") * 1_000_000, 0).cast("bigint")
    s = x.groupBy("label_id", "d").agg(
        F.sum(F.when(F.col("early"), qv)).cast("bigint").alias("se"),
        F.sum(F.when(~F.col("early"), qv)).cast("bigint").alias("sl"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    cos = s.groupBy("label_id").agg(
        F.sum(d38("se") * d38("sl")).alias("_dot"),
        F.sum(d38("se") * d38("se")).alias("_ne"),
        F.sum(d38("sl") * d38("sl")).alias("_nl"),
    )
    n = emb.groupBy(F.col("label").cast("bigint").alias("label_id")).agg(
        F.sum((F.col("vec_id") % 2 == 0).cast("bigint"))
        .cast("bigint")
        .alias("n_early"),
        F.sum((F.col("vec_id") % 2 != 0).cast("bigint"))
        .cast("bigint")
        .alias("n_late"),
    )
    return cos.join(F.broadcast(n), "label_id").select(
        "label_id",
        "n_early",
        "n_late",
        F.round(
            F.col("_dot").cast("double")
            / (
                F.sqrt(F.col("_ne").cast("double"))
                * F.sqrt(F.col("_nl").cast("double"))
            ),
            6,
        ).alias("half_cosine"),
    )


SQL_EMBEDDING_DRIFT = """
WITH x AS (SELECT vec_id % 2 = 0 early, label,
             generate_subscripts(embedding,1) d,
             CAST(round(CAST(unnest(embedding) AS DOUBLE)*1000000,0)
                  AS BIGINT) q
           FROM embeddings),
s AS (SELECT CAST(label AS BIGINT) label_id, d,
        CAST(sum(q) FILTER (early) AS BIGINT) se,
        CAST(sum(q) FILTER (NOT early) AS BIGINT) sl
      FROM x GROUP BY 1,2),
n AS (SELECT CAST(label AS BIGINT) label_id,
        CAST(count(*) FILTER (vec_id % 2 = 0) AS BIGINT) n_early,
        CAST(count(*) FILTER (vec_id % 2 <> 0) AS BIGINT) n_late
      FROM embeddings GROUP BY 1)
SELECT s.label_id, max(n.n_early) n_early, max(n.n_late) n_late,
  round(sum(CAST(se AS HUGEINT)*sl) /
        (sqrt(CAST(sum(CAST(se AS HUGEINT)*se) AS DOUBLE))
         * sqrt(CAST(sum(CAST(sl AS HUGEINT)*sl) AS DOUBLE))), 6)
    half_cosine
FROM s JOIN n USING (label_id) GROUP BY 1"""


def q_conformal_bound(spark, sf_dir):
    """Split-conformal prediction bound per segment: calibration half
    (hash-split on order key) fits the segment-mean predictor and the
    90% residual quantile q̂ (the ceil((n+1)·0.9)-th order statistic);
    the held-out half reports empirical coverage of |y − ŷ| ≤ q̂ —
    the distribution-free uncertainty readout. Rank windows partition
    by segment; everything upstream is exact integers."""
    from pyspark.sql import Window

    from llmaix_spark.operators.linking import stable_hash60_expr

    j = (
        _t(spark, sf_dir, "orders")
        .join(
            F.broadcast(_t(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("bigint")
            .alias("v"),
            (
                stable_hash60_expr(
                    F.concat(
                        F.col("o_orderkey").cast("string"), F.lit(":conf")
                    )
                )
                % 2
                == 0
            ).alias("is_cal"),
        )
    )
    mu = (
        j.where("is_cal")
        .groupBy("seg")
        .agg(
            F.sum("v").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    resid = j.join(F.broadcast(mu), "seg").select(
        "seg",
        "is_cal",
        F.abs(F.col("v") - F.col("s") * 1.0 / F.col("n")).alias("r"),
    ).localCheckpoint(eager=False)
    w = Window.partitionBy("seg").orderBy("r")
    qh = (
        resid.where("is_cal")
        .select(
            "seg",
            "r",
            F.row_number().over(w).alias("rk"),
            F.count(F.lit(1))
            .over(Window.partitionBy("seg"))
            .alias("n"),
        )
        .where(F.col("rk") == F.ceil(0.9 * (F.col("n") + 1)))
        .select("seg", F.col("r").alias("qhat"))
    )
    test = (
        resid.where(~F.col("is_cal"))
        .join(F.broadcast(qh), "seg")
        .groupBy("seg")
        .agg(
            F.max("qhat").alias("qhat"),
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum((F.col("r") <= F.col("qhat")).cast("bigint"))
            .cast("bigint")
            .alias("n_covered"),
        )
    )
    return test.select(
        "seg",
        F.round(F.col("qhat") / 100.0, 6).alias("qhat_dollars"),
        "n_test",
        F.round(F.col("n_covered") * 1.0 / F.col("n_test"), 6).alias(
            "coverage"
        ),
    )


SQL_CONFORMAL_BOUND = f"""
WITH j AS (SELECT c.c_mktsegment seg,
             CAST(round(o.o_totalprice*100,0) AS BIGINT) v,
             ({_HASH60_SQL.format(v="CAST(o.o_orderkey AS VARCHAR) || ':conf'")} % 2 = 0)
               is_cal
           FROM orders o JOIN customer c ON o.o_custkey=c.c_custkey),
mu AS (SELECT seg, CAST(sum(v) AS BIGINT) s, CAST(count(*) AS BIGINT) n
       FROM j WHERE is_cal GROUP BY 1),
resid AS (SELECT j.seg, j.is_cal, abs(j.v - mu.s*1.0/mu.n) r
          FROM j JOIN mu USING (seg)),
qh AS (SELECT seg, r qhat FROM (
         SELECT seg, r,
                row_number() OVER (PARTITION BY seg ORDER BY r) rk,
                count(*) OVER (PARTITION BY seg) n
         FROM resid WHERE is_cal)
       WHERE rk = CAST(ceil(0.9*(n+1)) AS BIGINT))
SELECT t.seg, round(max(q.qhat)/100.0, 6) qhat_dollars,
       CAST(count(*) AS BIGINT) n_test,
       round(count(*) FILTER (t.r <= q.qhat) * 1.0 / count(*), 6) coverage
FROM resid t JOIN qh q USING (seg)
WHERE NOT t.is_cal GROUP BY 1"""


def q_boilerplate_score(spark, sf_dir):
    """Per-document boilerplate mass: the share of a doc's distinct
    trigrams that occur in ≥ 5 documents corpus-wide (document
    frequency of the shingle) — high-share docs are template/listing
    pages a quality filter should drop even when no single near-dup
    twin exists. Shingle DF is one map-side-combinable groupBy; the
    threshold applies to the ROUNDED share."""
    sh = dd.word_shingles(
        _t(spark, sf_dir, "documents"), 3
    ).localCheckpoint(eager=False)
    df_ = sh.groupBy("shingle").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    per = (
        sh.join(df_, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sh"),
            F.sum((F.col("df") >= 5).cast("bigint"))
            .cast("bigint")
            .alias("n_common"),
        )
    )
    share = F.round(F.col("n_common") * 1.0 / F.col("n_sh"), 6)
    return per.withColumn("boilerplate_share", share).where(
        F.col("boilerplate_share") >= 0.05
    )


SQL_BOILERPLATE_SCORE = f"""
WITH {_TRIGRAM_SQL},
df AS (SELECT s, count(*) df FROM sh GROUP BY 1),
per AS (SELECT sh.doc_id, CAST(count(*) AS BIGINT) n_sh,
          CAST(count(*) FILTER (df.df >= 5) AS BIGINT) n_common
        FROM sh JOIN df USING (s) GROUP BY 1)
SELECT doc_id, n_sh, n_common,
       round(n_common*1.0/n_sh, 6) boilerplate_share
FROM per WHERE round(n_common*1.0/n_sh, 6) >= 0.05"""


def q_shingle_size_sensitivity(spark, sf_dir):
    """Parameter-sensitivity audit of the dedup threshold: exact
    Jaccard pairs at trigram vs 5-gram shingles, full-outer joined —
    which near-dup pairs survive a stricter shingle size (5-grams
    demand longer verbatim runs). Both generators share
    word_shingles; missing side reported as −1 so the row stays
    value-checkable."""
    docs = _t(spark, sf_dir, "documents")
    p3 = dd.ngram_jaccard_pairs(docs, 0.5, n=3).select(
        "doc_a", "doc_b", F.col("jaccard").alias("j3")
    )
    p5 = dd.ngram_jaccard_pairs(docs, 0.5, n=5).select(
        "doc_a", "doc_b", F.col("jaccard").alias("j5")
    )
    return p3.join(p5, ["doc_a", "doc_b"], "full_outer").select(
        "doc_a",
        "doc_b",
        F.coalesce("j3", F.lit(-1.0)).alias("j3"),
        F.coalesce("j5", F.lit(-1.0)).alias("j5"),
        (F.col("j3").isNotNull() & F.col("j5").isNotNull()).alias(
            "in_both"
        ),
    )


def _ngram_sql(n: int) -> str:
    """_TRIGRAM_SQL generalized to word n-grams: CTEs d2/tok2/g{n}/shN/
    cntN with suffixed names so two sizes can coexist in one WITH."""
    leads = " || ' ' || ".join(
        ["t"] + [f"lead(t, {j}) OVER win" for j in range(1, n)]
    )
    return f"""
g{n} AS (SELECT doc_id, {leads} AS s, lead(t, {n - 1}) OVER win AS lN
        FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
sh{n} AS (SELECT DISTINCT doc_id, s FROM g{n} WHERE lN IS NOT NULL),
cnt{n} AS (SELECT doc_id, count(*) n FROM sh{n} GROUP BY 1)"""


SQL_SHINGLE_SIZE_SENSITIVITY = f"""
WITH d AS (SELECT doc_id, string_split(trim(text), ' ') w FROM documents),
tok AS (SELECT doc_id, generate_subscripts(w, 1) i, unnest(w) t FROM d),
{_ngram_sql(3).strip()},
{_ngram_sql(5).strip()},
c3 AS (SELECT a.doc_id da, b.doc_id db, count(*) c FROM sh3 a
       JOIN sh3 b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
p3 AS (SELECT da, db, round(c*1.0/(na.n + nb.n - c), 6) j3
       FROM c3 JOIN cnt3 na ON da=na.doc_id JOIN cnt3 nb ON db=nb.doc_id
       WHERE c*1.0/(na.n + nb.n - c) >= 0.5),
c5 AS (SELECT a.doc_id da, b.doc_id db, count(*) c FROM sh5 a
       JOIN sh5 b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
p5 AS (SELECT da, db, round(c*1.0/(na.n + nb.n - c), 6) j5
       FROM c5 JOIN cnt5 na ON da=na.doc_id JOIN cnt5 nb ON db=nb.doc_id
       WHERE c*1.0/(na.n + nb.n - c) >= 0.5)
SELECT coalesce(p3.da, p5.da) doc_a, coalesce(p3.db, p5.db) doc_b,
       coalesce(j3, -1.0) j3, coalesce(j5, -1.0) j5,
       (j3 IS NOT NULL AND j5 IS NOT NULL) in_both
FROM p3 FULL OUTER JOIN p5 ON p3.da = p5.da AND p3.db = p5.db"""


def q_segment_trend_ols(spark, sf_dir):
    """Grouped exact OLS: per market segment, the revenue-per-month
    slope in dollars from the closed form (nΣxy − ΣxΣy)/(nΣx² − (Σx)²)
    — every moment an exact integer (x is the month index offset to
    the corpus min, y integer cents; decimal products), one float
    division at the end. The grouped counterpart of the global exact
    OLS/Theil-Sen trends."""
    m = (
        _t(spark, sf_dir, "orders")
        .join(
            F.broadcast(_t(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            (
                F.year(F.col("o_orderdate").cast("timestamp")) * 12
                + F.month(F.col("o_orderdate").cast("timestamp"))
            )
            .cast("bigint")
            .alias("mk"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("y")
        )
        # two consumers: min(mk) scalar + the regression rows
        .localCheckpoint(eager=False)
    )
    mn = m.agg(F.min("mk").alias("mk0"))
    z = m.crossJoin(F.broadcast(mn)).select(
        "seg", (F.col("mk") - F.col("mk0")).alias("x"), "y"
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = z.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(d38("x") * d38("y")).cast("decimal(38,0)").alias("sxy"),
    )
    num = (
        F.col("n").cast("decimal(38,0)") * F.col("sxy")
        - d38("sx") * d38("sy")
    ).cast("double")
    den = (
        F.col("n").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    )
    return agg.select(
        "seg",
        "n",
        F.round(num / den / 100.0, 6).alias("slope_dollars_per_month"),
    )


SQL_SEGMENT_TREND_OLS = """
WITH m AS (SELECT c.c_mktsegment seg,
             CAST(year(o.o_orderdate)*12 + month(o.o_orderdate) AS BIGINT)
               mk,
             CAST(round(o.o_totalprice*100,0) AS BIGINT) cents
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
g AS (SELECT seg, mk, CAST(sum(cents) AS BIGINT) y FROM m GROUP BY 1,2),
z AS (SELECT seg, mk - (SELECT min(mk) FROM g) x, y FROM g),
agg AS (SELECT seg, CAST(count(*) AS BIGINT) n,
          CAST(sum(x) AS BIGINT) sx, CAST(sum(y) AS BIGINT) sy,
          CAST(sum(x*x) AS BIGINT) sxx,
          CAST(sum(CAST(x AS HUGEINT)*y) AS HUGEINT) sxy
        FROM z GROUP BY 1)
SELECT seg, n,
  round(CAST(n*sxy - CAST(sx AS HUGEINT)*sy AS DOUBLE)
        / (CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx) / 100.0, 6)
    slope_dollars_per_month
FROM agg"""


def q_split_parity_psi(spark, sf_dir):
    """Split-parity audit: PSI of the doc-length histogram between the
    TRAIN slice of the deterministic hash split and the rest — 'is my
    held-out set distributionally like training'. Fixed 64-char bins
    capped at 8, Laplace-smoothed shares, per-bin ln rounded to 9dp
    (libm ulp). One groupBy + a 9-row aggregate."""
    from llmaix_spark.operators.curation import dataset_split

    docs = _t(spark, sf_dir, "documents")
    s = docs.join(dataset_split(docs), "doc_id").select(
        "n_chars", (F.col("split") == "train").alias("is_train")
    )
    b = s.select(
        F.least(
            (F.col("n_chars") / 64).cast("bigint"), F.lit(8).cast("bigint")
        ).alias("bin"),
        "is_train",
    )
    c = b.groupBy("bin").agg(
        F.sum(F.col("is_train").cast("bigint")).cast("bigint").alias("ct"),
        F.sum((~F.col("is_train")).cast("bigint"))
        .cast("bigint")
        .alias("ch"),
    )
    n = c.agg(
        F.sum("ct").cast("bigint").alias("nt"),
        F.sum("ch").cast("bigint").alias("nh"),
    )
    pt = (F.col("ct") + 0.5) / (F.col("nt").cast("double") + 0.5 * 9)
    ph = (F.col("ch") + 0.5) / (F.col("nh").cast("double") + 0.5 * 9)
    return (
        c.crossJoin(F.broadcast(n))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bins"),
            F.round(
                F.sum((pt - ph) * F.round(F.log(pt / ph), 9)), 6
            ).alias("psi"),
        )
    )


SQL_SPLIT_PARITY_PSI = f"""
WITH s AS (SELECT n_chars,
    CASE WHEN {_HASH60_SQL.format(v="CAST(doc_id AS VARCHAR) || ':split'")} % 10000 < 9000 THEN 'train'
         WHEN {_HASH60_SQL.format(v="CAST(doc_id AS VARCHAR) || ':split'")} % 10000 < 9500 THEN 'val'
         ELSE 'test' END split
  FROM documents),
b AS (SELECT split, least(CAST(n_chars // 64 AS BIGINT), 8) bin FROM s),
c AS (SELECT bin,
        CAST(count(*) FILTER (split = 'train') AS BIGINT) ct,
        CAST(count(*) FILTER (split <> 'train') AS BIGINT) ch
      FROM b GROUP BY 1),
n AS (SELECT CAST(sum(ct) AS BIGINT) nt, CAST(sum(ch) AS BIGINT) nh FROM c),
t AS (SELECT bin,
        (ct + 0.5) / (CAST((SELECT nt FROM n) AS DOUBLE) + 0.5*9) pt,
        (ch + 0.5) / (CAST((SELECT nh FROM n) AS DOUBLE) + 0.5*9) ph
      FROM c)
SELECT CAST(count(*) AS BIGINT) n_bins,
  round(sum((pt - ph) * round(ln(pt/ph), 9)), 6) psi
FROM t"""


def q_transition_dwell(spark, sf_dir):
    """Per-transition dwell time: the exact lower-median gap (seconds)
    between consecutive DIFFERENT event types per user, at the
    (from, to) pair grain — the timing layer events_transitions'
    probability matrix lacks. Rank window partitions by the pair."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("u"),
        F.col("event_type").alias("a"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    w = Window.partitionBy("u").orderBy("us", "event_id")
    s = e.select(
        "a",
        F.lead("a").over(w).alias("b"),
        (F.lead("us").over(w) - F.col("us")).alias("gap_us"),
    )
    p = s.where(F.col("b").isNotNull() & (F.col("a") != F.col("b")))
    pw = Window.partitionBy("a", "b").orderBy("gap_us")
    r = p.select(
        "a",
        "b",
        "gap_us",
        F.row_number().over(pw).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("a", "b")).alias("n"),
    )
    return (
        r.groupBy(F.col("a").alias("from_type"), F.col("b").alias("to_type"))
        .agg(
            F.max("n").cast("bigint").alias("n_transitions"),
            (
                F.max(
                    F.when(
                        F.col("rk") == F.floor((F.col("n") + 1) / 2),
                        F.col("gap_us"),
                    )
                )
                / 1000000
            )
            .cast("bigint")
            .alias("p50_gap_sec"),
        )
    )


SQL_TRANSITION_DWELL = """
WITH e AS (SELECT user_id u, event_type et, epoch_us(ts) us, event_id eid
           FROM events),
s AS (SELECT u, et a, lead(et) OVER w b, lead(us) OVER w - us gap_us
      FROM e WINDOW w AS (PARTITION BY u ORDER BY us, eid)),
p AS (SELECT a, b, gap_us FROM s WHERE b IS NOT NULL AND a <> b),
r AS (SELECT a, b, gap_us,
        row_number() OVER (PARTITION BY a, b ORDER BY gap_us) rk,
        count(*) OVER (PARTITION BY a, b) n
      FROM p)
SELECT a AS from_type, b AS to_type, CAST(max(n) AS BIGINT) n_transitions,
       CAST(max(CASE WHEN rk = (n+1)//2 THEN gap_us END)//1000000
            AS BIGINT) p50_gap_sec
FROM r GROUP BY 1,2"""


def q_embedding_coverage(spark, sf_dir):
    """Embedding-table conformance audit: vector count, key
    distinctness, dimension consistency, and coverage of the documents
    table by vec_id ↔ doc_id — the join-health gate a retrieval
    pipeline runs before trusting ANN answers. All 1-row aggregates
    crossJoin-broadcast; the coverage probe broadcasts the doc keys."""
    emb = _t(spark, sf_dir, "embeddings")
    docs = _t(spark, sf_dir, "documents")
    e = emb.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.countDistinct("vec_id").cast("bigint").alias("n_distinct"),
        F.min(F.size("embedding")).cast("bigint").alias("min_dim"),
        F.max(F.size("embedding")).cast("bigint").alias("max_dim"),
    )
    d = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    m = emb.join(
        F.broadcast(docs.select(F.col("doc_id").alias("vec_id"))),
        "vec_id",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_matched"))
    return (
        e.crossJoin(F.broadcast(d))
        .crossJoin(F.broadcast(m))
        .select(
            "n_vecs",
            "n_distinct",
            "min_dim",
            "max_dim",
            "n_docs",
            "n_matched",
            F.round(F.col("n_matched") * 1.0 / F.col("n_docs"), 6).alias(
                "doc_coverage"
            ),
            (F.col("min_dim") == F.col("max_dim")).alias(
                "dims_consistent"
            ),
        )
    )


SQL_EMBEDDING_COVERAGE = """
WITH e AS (SELECT CAST(count(*) AS BIGINT) n_vecs,
             CAST(count(DISTINCT vec_id) AS BIGINT) n_distinct,
             CAST(min(len(embedding)) AS BIGINT) min_dim,
             CAST(max(len(embedding)) AS BIGINT) max_dim FROM embeddings),
d AS (SELECT CAST(count(*) AS BIGINT) n_docs FROM documents),
m AS (SELECT CAST(count(*) AS BIGINT) n_matched
      FROM embeddings em JOIN documents dd ON em.vec_id = dd.doc_id)
SELECT e.n_vecs, e.n_distinct, e.min_dim, e.max_dim, d.n_docs, m.n_matched,
       round(m.n_matched*1.0/d.n_docs, 6) doc_coverage,
       (e.min_dim = e.max_dim) dims_consistent
FROM e, d, m"""


def q_late_by_priority_trend(spark, sf_dir):
    """Cochran-Armitage trend test: does the late-shipping rate (> 60
    days order→ship) fall monotonically with order priority? Scores
    w = the priority's leading digit (1-URGENT … 5-LOW); the trend z
    comes entirely from exact integer count moments — the ordered
    alternative chi2_crosstab's omnibus independence test can't see."""
    j = (
        _t(spark, sf_dir, "lineitem")
        .join(
            _t(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.substring("o_orderpriority", 1, 1)
            .cast("bigint")
            .alias("w"),
            (
                (
                    F.unix_micros(F.col("l_shipdate").cast("timestamp"))
                    / F.lit(86400000000)
                ).cast("bigint")
                - (
                    F.unix_micros(F.col("o_orderdate").cast("timestamp"))
                    / F.lit(86400000000)
                ).cast("bigint")
                > 60
            ).alias("late"),
        )
    )
    g = j.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("late").cast("bigint")).cast("bigint").alias("r"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    t = g.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("r").cast("bigint").alias("rr"),
        F.sum(d38("w") * d38("n")).cast("decimal(38,0)").alias("swn"),
        F.sum(d38("w") * d38("r")).cast("decimal(38,0)").alias("swr"),
        F.sum(d38("w") * d38("w") * d38("n"))
        .cast("decimal(38,0)")
        .alias("swwn"),
    )
    p = F.col("rr").cast("double") / F.col("nn")
    num = F.col("swr").cast("double") - F.col("rr").cast("double") * F.col(
        "swn"
    ).cast("double") / F.col("nn")
    den = F.sqrt(
        p
        * (1 - p)
        * (
            F.col("swwn").cast("double")
            - F.col("swn").cast("double")
            * F.col("swn").cast("double")
            / F.col("nn")
        )
    )
    return t.select(
        F.col("nn").alias("n_lines"),
        F.col("rr").alias("n_late"),
        F.round(num / den, 6).alias("ca_trend_z"),
    )


SQL_LATE_BY_PRIORITY_TREND = """
WITH j AS (SELECT CAST(substring(o.o_orderpriority,1,1) AS BIGINT) w,
             (epoch_us(li.l_shipdate)//86400000000
              - epoch_us(o.o_orderdate)//86400000000 > 60) late
           FROM lineitem li JOIN orders o ON li.l_orderkey = o.o_orderkey),
g AS (SELECT w, CAST(count(*) AS BIGINT) n,
        CAST(count(*) FILTER (late) AS BIGINT) r
      FROM j GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) nn, CAST(sum(r) AS BIGINT) rr,
        CAST(sum(CAST(w AS HUGEINT)*n) AS HUGEINT) swn,
        CAST(sum(CAST(w AS HUGEINT)*r) AS HUGEINT) swr,
        CAST(sum(CAST(w AS HUGEINT)*w*n) AS HUGEINT) swwn
      FROM g)
SELECT nn n_lines, rr n_late,
  round( (CAST(swr AS DOUBLE) - CAST(rr AS DOUBLE)*swn/nn) /
         sqrt( (CAST(rr AS DOUBLE)/nn) * (1 - CAST(rr AS DOUBLE)/nn)
               * (CAST(swwn AS DOUBLE) - CAST(swn AS DOUBLE)*swn/nn) ), 6)
    ca_trend_z
FROM t"""


def q_ab_qte(spark, sf_dir):
    """Quantile treatment effect table: per within-arm decile of
    purchases-per-user, the A−B mean difference — the distributional
    readout behind ab_count_ztest's single mean (an experiment can
    move the tail without moving the mean). Deciles rank within each
    arm; exact integer sums per cell."""
    from pyspark.sql import Window

    from llmaix_spark.operators.linking import stable_hash60_expr

    u = (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("u"))
        .agg(
            F.sum((F.col("event_type") == "purchase").cast("bigint"))
            .cast("bigint")
            .alias("x")
        )
    )
    g = u.select(
        F.when(
            stable_hash60_expr(
                F.concat(F.col("u").cast("string"), F.lit(":ab"))
            )
            % 2
            == 0,
            "A",
        )
        .otherwise("B")
        .alias("grp"),
        "u",
        "x",
    )
    w = Window.partitionBy("grp").orderBy("x", "u")
    r = g.select("grp", "x", F.ntile(10).over(w).alias("dcl"))
    m = r.groupBy("dcl", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    a = m.where(F.col("grp") == "A").select(
        "dcl", F.col("n").alias("n_a"), F.col("s").alias("sa")
    )
    b = m.where(F.col("grp") == "B").select(
        "dcl", F.col("n").alias("n_b"), F.col("s").alias("sb")
    )
    mean_a = F.col("sa") * 1.0 / F.col("n_a")
    mean_b = F.col("sb") * 1.0 / F.col("n_b")
    return a.join(b, "dcl").select(
        F.col("dcl").cast("bigint").alias("decile"),
        "n_a",
        "n_b",
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.round(mean_a - mean_b, 6).alias("qte"),
    )


SQL_AB_QTE = f"""
WITH u AS (SELECT user_id u,
             CAST(count(*) FILTER (event_type='purchase') AS BIGINT) x
           FROM events GROUP BY 1),
g AS (SELECT CASE WHEN {_HASH60_SQL.format(v="CAST(u AS VARCHAR) || ':ab'")} % 2 = 0
                  THEN 'A' ELSE 'B' END grp, u, x FROM u),
r AS (SELECT grp, x, ntile(10) OVER (PARTITION BY grp ORDER BY x, u) dcl
      FROM g),
m AS (SELECT dcl, grp, CAST(count(*) AS BIGINT) n, CAST(sum(x) AS BIGINT) s
      FROM r GROUP BY 1,2)
SELECT CAST(a.dcl AS BIGINT) decile, a.n n_a, b.n n_b,
  round(a.s*1.0/a.n, 6) mean_a, round(b.s*1.0/b.n, 6) mean_b,
  round(a.s*1.0/a.n - b.s*1.0/b.n, 6) qte
FROM m a JOIN m b ON a.dcl = b.dcl AND a.grp='A' AND b.grp='B'"""


def q_rbo_rankings(spark, sf_dir):
    """Rank-biased overlap (Webber et al. 2010) between the
    revenue and order-count customer rankings, p = 0.9, truncated at
    depth 100 — the top-weighted rank agreement measure (topk_overlap
    gives flat set Jaccard at 4 depths; RBO weights depth 1 most).
    overlap_d = |{items with max(rank_a, rank_b) ≤ d}| comes from the
    per-item max-rank, each depth term is nano-quantized before the
    integer sum. Windows run at the customer grain."""
    from pyspark.sql import Window

    per = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("cents"),
        )
    )
    r = per.select(
        F.row_number()
        .over(Window.orderBy(F.desc("cents"), F.asc("ck")))
        .alias("ra"),
        F.row_number()
        .over(Window.orderBy(F.desc("n_orders"), F.asc("ck")))
        .alias("rb"),
    )
    m = r.where((F.col("ra") <= 100) | (F.col("rb") <= 100)).select(
        F.greatest("ra", "rb").alias("mx")
    )
    depth = spark.range(1, 101).select(F.col("id").alias("d"))
    ov = (
        depth.join(F.broadcast(m), F.col("mx") <= F.col("d"), "left")
        .groupBy("d")
        .agg(F.count("mx").cast("bigint").alias("overlap_d"))
    )
    nano = F.round(
        (1 - 0.9)
        * F.pow(F.lit(0.9), F.col("d") - 1)
        * F.col("overlap_d")
        * 1.0
        / F.col("d")
        * 1e9,
        0,
    ).cast("bigint")
    return ov.agg(
        F.lit(100).cast("bigint").alias("depth"),
        F.round(F.sum(nano) / 1e9, 6).alias("rbo"),
    )


SQL_RBO_RANKINGS = """
WITH per AS (SELECT o_custkey ck, CAST(count(*) AS BIGINT) n_orders,
               CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT))
                    AS BIGINT) cents
             FROM orders GROUP BY 1),
r AS (SELECT ck,
        row_number() OVER (ORDER BY cents DESC, ck) ra,
        row_number() OVER (ORDER BY n_orders DESC, ck) rb
      FROM per),
m AS (SELECT greatest(ra, rb) mx FROM r WHERE ra <= 100 OR rb <= 100),
depth AS (SELECT unnest(range(1, 101)) d),
ov AS (SELECT d, CAST(count(*) FILTER (m.mx <= d) AS BIGINT) overlap_d
       FROM depth LEFT JOIN m ON TRUE GROUP BY d),
terms AS (SELECT d, CAST(round((1-0.9) * power(0.9, d-1) * overlap_d
                               * 1.0 / d * 1e9, 0) AS BIGINT) nano
          FROM ov)
SELECT CAST(100 AS BIGINT) depth, round(sum(nano)/1e9, 6) rbo
FROM terms"""


def q_dup_pair_edit_distance(spark, sf_dir):
    """Character-level closeness of every shingle-Jaccard near-dup
    pair: Levenshtein distance and normalized edit similarity next to
    the Jaccard score — the second, independent lens on the same
    candidates (built-in levenshtein on both engines; bounded by the
    near-dup pair count, so the quadratic string cost stays off the
    corpus)."""
    docs = _t(spark, sf_dir, "documents")
    p = dd.ngram_jaccard_pairs(docs, 0.5)
    ta = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a")
    )
    tb = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b")
    )
    j = p.join(ta, "doc_a").join(tb, "doc_b")
    dist = F.levenshtein("text_a", "text_b").cast("bigint")
    max_len = F.greatest(F.length("text_a"), F.length("text_b")).cast(
        "bigint"
    )
    return j.select(
        "doc_a",
        "doc_b",
        "jaccard",
        dist.alias("edit_dist"),
        max_len.alias("max_len"),
        F.round(1.0 - dist * 1.0 / max_len, 6).alias("edit_sim"),
    )


SQL_DUP_PAIR_EDIT_DISTANCE = f"""
WITH {_TRIGRAM_SQL},
common AS (SELECT a.doc_id da, b.doc_id db, count(*) c FROM sh a
           JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
p AS (SELECT da, db, round(c*1.0/(na.n + nb.n - c), 6) j
      FROM common JOIN cnt na ON da=na.doc_id JOIN cnt nb ON db=nb.doc_id
      WHERE c*1.0/(na.n + nb.n - c) >= 0.5)
SELECT p.da doc_a, p.db doc_b, p.j jaccard,
       CAST(levenshtein(ta.text, tb.text) AS BIGINT) edit_dist,
       CAST(greatest(length(ta.text), length(tb.text)) AS BIGINT) max_len,
       round(1.0 - levenshtein(ta.text, tb.text)*1.0
             / greatest(length(ta.text), length(tb.text)), 6) edit_sim
FROM p JOIN documents ta ON p.da = ta.doc_id
       JOIN documents tb ON p.db = tb.doc_id"""


def q_eb_smoothed_rates(spark, sf_dir):
    """Empirical-Bayes smoothed return rate per brand (prior strength
    50 pulled toward the global rate) with raw-vs-smoothed rank — the
    cold-start-safe ranking a recommender publishes instead of raw
    rates (small-n brands shrink hardest). Exact counts; the 1-row
    global rate broadcasts."""
    from pyspark.sql import Window

    g = (
        _t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(_t(spark, sf_dir, "part")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum((F.col("l_returnflag") == "R").cast("bigint"))
            .cast("bigint")
            .alias("r"),
        )
    )
    gl = g.agg(
        F.sum("r").cast("bigint").alias("rr"),
        F.sum("n").cast("bigint").alias("nn"),
    )
    s = g.crossJoin(F.broadcast(gl)).select(
        "brand",
        "n",
        "r",
        F.round(F.col("r") * 1.0 / F.col("n"), 6).alias("raw_rate"),
        F.round(
            (F.col("r") + 50.0 * F.col("rr") / F.col("nn"))
            / (F.col("n") + 50),
            6,
        ).alias("eb_rate"),
    )
    return s.select(
        "brand",
        "n",
        "r",
        "raw_rate",
        "eb_rate",
        F.row_number()
        .over(Window.orderBy(F.desc("raw_rate"), F.asc("brand")))
        .cast("bigint")
        .alias("rank_raw"),
        F.row_number()
        .over(Window.orderBy(F.desc("eb_rate"), F.asc("brand")))
        .cast("bigint")
        .alias("rank_eb"),
    )


SQL_EB_SMOOTHED_RATES = """
WITH j AS (SELECT p.p_brand brand, (li.l_returnflag = 'R') ret
           FROM lineitem li JOIN part p ON li.l_partkey = p.p_partkey),
g AS (SELECT brand, CAST(count(*) AS BIGINT) n,
        CAST(count(*) FILTER (ret) AS BIGINT) r
      FROM j GROUP BY 1),
gl AS (SELECT CAST(sum(r) AS BIGINT) rr, CAST(sum(n) AS BIGINT) nn FROM g),
s AS (SELECT brand, n, r,
        round(r*1.0/n, 6) raw_rate,
        round((r + 50.0 * (SELECT rr FROM gl) / (SELECT nn FROM gl))
              / (n + 50), 6) eb_rate
      FROM g)
SELECT brand, n, r, raw_rate, eb_rate,
  CAST(row_number() OVER (ORDER BY raw_rate DESC, brand) AS BIGINT)
    rank_raw,
  CAST(row_number() OVER (ORDER BY eb_rate DESC, brand) AS BIGINT) rank_eb
FROM s"""


def q_fd_binwidth(spark, sf_dir):
    """Freedman-Diaconis histogram sizing advisor per metric:
    width = 2·IQR·n^(−1/3) and the implied bin count from exact
    rank-based quartiles — what profile_histogram should be configured
    with instead of a guessed bin count. Quartile windows partition by
    metric."""
    from pyspark.sql import Window

    v = (
        _t(spark, sf_dir, "orders")
        .select(
            F.lit("o_totalprice").alias("metric"),
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("bigint")
            .alias("x"),
        )
        .unionAll(
            _t(spark, sf_dir, "lineitem").select(
                F.lit("l_quantity").alias("metric"),
                F.round("l_quantity", 0).cast("bigint").alias("x"),
            )
        )
        .unionAll(
            _t(spark, sf_dir, "documents").select(
                F.lit("n_chars").alias("metric"),
                F.col("n_chars").cast("bigint").alias("x"),
            )
        )
        .localCheckpoint(eager=False)  # consumers: quartiles + extents
    )
    w = Window.partitionBy("metric").orderBy("x")
    r = v.select(
        "metric",
        "x",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("metric")).alias("n"),
    )
    q = r.groupBy("metric").agg(
        F.max("n").cast("bigint").alias("n"),
        F.max(
            F.when(F.col("rk") == F.floor((F.col("n") + 3) / 4), F.col("x"))
        )
        .cast("bigint")
        .alias("q1"),
        F.max(
            F.when(
                F.col("rk") == F.floor((3 * F.col("n") + 3) / 4), F.col("x")
            )
        )
        .cast("bigint")
        .alias("q3"),
    )
    ext = v.groupBy("metric").agg(
        F.min("x").cast("bigint").alias("mn"),
        F.max("x").cast("bigint").alias("mx"),
    )
    width = 2.0 * (F.col("q3") - F.col("q1")) / F.pow(F.col("n"), 1.0 / 3)
    return q.join(F.broadcast(ext), "metric").select(
        "metric",
        "n",
        "q1",
        "q3",
        F.round(width, 6).alias("fd_width"),
        F.ceil((F.col("mx") - F.col("mn")) / width)
        .cast("bigint")
        .alias("n_bins"),
    )


SQL_FD_BINWIDTH = """
WITH v AS (SELECT 'o_totalprice' metric,
             CAST(round(o_totalprice*100,0) AS BIGINT) x FROM orders
           UNION ALL
           SELECT 'l_quantity', CAST(round(l_quantity,0) AS BIGINT)
           FROM lineitem
           UNION ALL SELECT 'n_chars', n_chars FROM documents),
r AS (SELECT metric, x, row_number() OVER (PARTITION BY metric ORDER BY x)
        rk,
        count(*) OVER (PARTITION BY metric) n FROM v),
q AS (SELECT metric, max(n) n,
        max(CASE WHEN rk = (n+3)//4 THEN x END) q1,
        max(CASE WHEN rk = (3*n+3)//4 THEN x END) q3
      FROM r GROUP BY 1),
ext AS (SELECT metric, CAST(min(x) AS BIGINT) mn,
          CAST(max(x) AS BIGINT) mx FROM v GROUP BY 1)
SELECT q.metric, CAST(q.n AS BIGINT) n, CAST(q1 AS BIGINT) q1,
       CAST(q3 AS BIGINT) q3,
       round(2.0 * (q3 - q1) / power(q.n, 1.0/3), 6) fd_width,
       CAST(ceil((ext.mx - ext.mn)
                 / (2.0 * (q3 - q1) / power(q.n, 1.0/3))) AS BIGINT) n_bins
FROM q JOIN ext USING (metric)"""


def q_rich_club(spark, sf_dir):
    """Rich-club coefficient of the triple graph at degree thresholds
    k ∈ {2, 4, 8}: edge density among nodes with degree > k — do hubs
    preferentially interlink (the elite-core structure degree
    assortativity summarizes as one number). Degrees and hub-edge
    counts from plain groupBys; the k sweep joins a 3-row literal."""
    tri = q_kg_triples(spark, sf_dir).select("subj", "obj")
    und = (
        tri.where(F.col("subj") != F.col("obj"))
        .select(
            F.least("subj", "obj").alias("x"),
            F.greatest("subj", "obj").alias("y"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # consumers: degrees + hub filter
    )
    deg = (
        und.select(F.col("x").alias("n"))
        .unionAll(und.select(F.col("y").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        .localCheckpoint(eager=False)  # consumers: hubs + 2 edge joins
    )
    ks = spark.range(1).select(
        F.explode(F.array(F.lit(2), F.lit(4), F.lit(8))).alias("k")
    )
    hn = (
        ks.join(F.broadcast(deg), F.col("d") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hubs"))
    )
    da = deg.select(F.col("n").alias("x"), F.col("d").alias("dx"))
    db = deg.select(F.col("n").alias("y"), F.col("d").alias("dy"))
    he = (
        und.join(F.broadcast(da), "x")
        .join(F.broadcast(db), "y")
        .crossJoin(F.broadcast(ks))
        .where((F.col("dx") > F.col("k")) & (F.col("dy") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    )
    return (
        hn.join(he, "k", "left")
        .where(F.col("n_hubs") >= 2)
        .select(
            F.col("k").cast("bigint").alias("k"),
            "n_hubs",
            F.coalesce("n_edges", F.lit(0)).cast("bigint").alias("n_edges"),
            F.round(
                F.coalesce("n_edges", F.lit(0))
                * 2.0
                / (F.col("n_hubs") * (F.col("n_hubs") - 1)),
                6,
            ).alias("phi"),
        )
    )


SQL_RICH_CLUB = f"""
WITH t AS ({SQL_KG_TRIPLES}),
ed AS (SELECT DISTINCT least(subj, obj) x, greatest(subj, obj) y
       FROM t WHERE subj <> obj),
deg AS (SELECT n, CAST(count(*) AS BIGINT) d FROM (
          SELECT x n FROM ed UNION ALL SELECT y FROM ed) GROUP BY 1),
ks AS (SELECT unnest([2,4,8]) k),
hn AS (SELECT k, CAST(count(*) AS BIGINT) n_hubs
       FROM ks JOIN deg ON deg.d > ks.k GROUP BY 1),
he AS (SELECT ks.k, CAST(count(*) AS BIGINT) n_edges
       FROM ks JOIN ed ON TRUE
       JOIN deg da ON da.n = ed.x JOIN deg db ON db.n = ed.y
       WHERE da.d > ks.k AND db.d > ks.k GROUP BY 1)
SELECT CAST(hn.k AS BIGINT) k, hn.n_hubs,
       CAST(coalesce(he.n_edges, 0) AS BIGINT) n_edges,
       round(coalesce(he.n_edges,0) * 2.0
             / (hn.n_hubs * (hn.n_hubs - 1)), 6) phi
FROM hn LEFT JOIN he ON hn.k = he.k WHERE hn.n_hubs >= 2"""


def q_nb_dispersion(spark, sf_dir):
    """Negative-binomial dispersion fit (method of moments) on
    orders-per-customer: mean, sample variance, r̂ = m²/(v−m) and the
    overdispersion verdict — whether a Poisson rate model is even
    admissible for demand. All moments exact integers; two floats at
    the end."""
    c = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    m = c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("ss"),
    )
    mean = F.col("s") * 1.0 / F.col("n")
    var = (
        F.col("ss") - F.col("s").cast("double") * F.col("s") / F.col("n")
    ) / (F.col("n") - 1.0)
    return m.select(
        "n",
        F.round(mean, 6).alias("mean_x"),
        F.round(var, 6).alias("var_x"),
        F.round(F.pow(mean, 2) / (var - mean), 6).alias("nb_r"),
        (var > mean).alias("overdispersed"),
    )


SQL_NB_DISPERSION = """
WITH c AS (SELECT o_custkey, CAST(count(*) AS BIGINT) x
           FROM orders GROUP BY 1),
m AS (SELECT CAST(count(*) AS BIGINT) n, CAST(sum(x) AS BIGINT) s,
        CAST(sum(x*x) AS BIGINT) ss FROM c)
SELECT n, round(s*1.0/n, 6) mean_x,
  round((ss - CAST(s AS DOUBLE)*s/n)/(n-1.0), 6) var_x,
  round( power(s*1.0/n, 2)
         / ((ss - CAST(s AS DOUBLE)*s/n)/(n-1.0) - s*1.0/n), 6) nb_r,
  ((ss - CAST(s AS DOUBLE)*s/n)/(n-1.0) > s*1.0/n) overdispersed
FROM m"""


def q_diurnal_phase(spark, sf_dir):
    """Circular statistics of each event type's diurnal cycle: the
    argmax peak hour, the mean-resultant length R̄ (0 = flat, 1 = all
    mass at one hour) and the circular mean hour from atan2 of the
    exact count-weighted cos/sin sums (per-bin trig rounded to 9dp,
    micro-quantized, integer-summed — the full order-invariance
    treatment). The phase readout hour_uniformity's χ² can't give."""
    e = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("et"),
        (
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                / F.lit(3600000000)
            ).cast("bigint")
            % 24
        ).alias("hod"),
    )
    c = e.groupBy("et", "hod").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    two_pi = 2 * math.pi
    cosr = F.round(F.cos(two_pi * F.col("hod") / 24), 9)
    sinr = F.round(F.sin(two_pi * F.col("hod") / 24), 9)
    v = c.select(
        "et",
        "n",
        "hod",
        F.round(F.col("n") * cosr * 1e6, 0).cast("bigint").alias("cx"),
        F.round(F.col("n") * sinr * 1e6, 0).cast("bigint").alias("sx"),
    )
    agg = v.groupBy("et").agg(
        F.sum("n").cast("bigint").alias("n_events"),
        F.sum("cx").cast("bigint").alias("scx"),
        F.sum("sx").cast("bigint").alias("ssx"),
        F.max_by("hod", F.col("n") * 100 - F.col("hod"))
        .cast("bigint")
        .alias("peak_hour"),
    )
    return agg.select(
        F.col("et").alias("event_type"),
        "n_events",
        "peak_hour",
        F.round(
            F.sqrt(
                F.col("scx").cast("double") * F.col("scx")
                + F.col("ssx").cast("double") * F.col("ssx")
            )
            / (F.col("n_events") * 1e6),
            6,
        ).alias("resultant"),
        F.round(
            (24.0 / two_pi)
            * F.atan2(F.col("ssx") * 1.0, F.col("scx") * 1.0),
            6,
        ).alias("circ_mean_hour"),
    )


SQL_DIURNAL_PHASE = """
WITH e AS (SELECT event_type et,
             CAST(epoch_us(ts)//3600000000 % 24 AS BIGINT) hod
           FROM events),
c AS (SELECT et, hod, CAST(count(*) AS BIGINT) n FROM e GROUP BY 1,2),
v AS (SELECT et, n, hod,
        CAST(round(n * round(cos(2*pi()*hod/24), 9) * 1e6, 0) AS BIGINT) cx,
        CAST(round(n * round(sin(2*pi()*hod/24), 9) * 1e6, 0) AS BIGINT) sx
      FROM c),
agg AS (SELECT et, CAST(sum(n) AS BIGINT) n_events,
          CAST(sum(cx) AS BIGINT) scx, CAST(sum(sx) AS BIGINT) ssx,
          max_by(hod, n * 100 - hod) peak_hour
        FROM v GROUP BY 1)
SELECT et AS event_type, n_events, CAST(peak_hour AS BIGINT) peak_hour,
  round(sqrt(CAST(scx AS DOUBLE)*scx + CAST(ssx AS DOUBLE)*ssx)
        / (n_events*1e6), 6) resultant,
  round( (24.0/(2*pi())) * atan2(ssx*1.0, scx*1.0), 6) circ_mean_hour
FROM agg"""


def q_standardized_repeat(spark, sf_dir):
    """Indirect standardization (SMR) of repeat-purchase behaviour:
    per segment, observed repeat orders vs the count EXPECTED from the
    segment's cohort-month mix at global per-cohort rates — the
    confounder-adjusted comparison a raw repeat-rate ranking gets
    wrong when segments skew old (epidemiology's standardized
    mortality ratio applied to retention)."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        (
            F.year(F.col("o_orderdate").cast("timestamp")) * 12
            + F.month(F.col("o_orderdate").cast("timestamp"))
        )
        .cast("bigint")
        .alias("mk"),
    )
    f = o.groupBy("ck").agg(
        F.min("mk").alias("cohort"),
        (F.count(F.lit(1)) - 1).cast("bigint").alias("repeats"),
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .select(
            F.col("c_custkey").alias("ck"),
            F.col("c_mktsegment").alias("seg"),
        )
        .join(f, "ck")
        # two consumers: per-cohort rates + the segment rows
        .localCheckpoint(eager=False)
    )
    coh = cust.groupBy("cohort").agg(
        F.round(F.avg("repeats"), 9).alias("rate")
    )
    j = cust.join(F.broadcast(coh), "cohort")
    return j.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("repeats").cast("bigint").alias("observed_repeats"),
        F.round(F.sum("rate"), 6).alias("expected_repeats"),
        F.round(F.sum("repeats") / F.sum("rate"), 6).alias("smr"),
    )


SQL_STANDARDIZED_REPEAT = """
WITH o AS (SELECT o_custkey ck,
             CAST(year(o_orderdate)*12 + month(o_orderdate) AS BIGINT) mk
           FROM orders),
f AS (SELECT ck, min(mk) cohort, CAST(count(*) AS BIGINT) - 1 repeats
      FROM o GROUP BY 1),
cust AS (SELECT c.c_custkey ck, c.c_mktsegment seg, f.cohort, f.repeats
         FROM customer c JOIN f ON c.c_custkey = f.ck),
coh AS (SELECT cohort, round(avg(repeats), 9) rate FROM cust GROUP BY 1),
j AS (SELECT cust.seg, cust.repeats, coh.rate
      FROM cust JOIN coh USING (cohort))
SELECT seg, CAST(count(*) AS BIGINT) n_customers,
  CAST(sum(repeats) AS BIGINT) observed_repeats,
  round(sum(rate), 6) expected_repeats,
  round(sum(repeats)/sum(rate), 6) smr
FROM j GROUP BY 1"""


def q_weekday_priority_residuals(spark, sf_dir):
    """Adjusted standardized residuals of the weekday × priority
    contingency table — the CELL-level diagnostic behind
    chi2_crosstab's omnibus statistic (which cells actually deviate).
    Haberman residual: (o − e)/√(e·(1−rowshare)·(1−colshare)). All
    margins exact; three broadcast joins at the margin grains."""
    o = _t(spark, sf_dir, "orders").select(
        # DuckDB dayofweek is 0=Sunday..6; Spark's is 1=Sunday..7
        (F.dayofweek(F.col("o_orderdate").cast("timestamp")) - 1)
        .cast("bigint")
        .alias("dow"),
        F.col("o_orderpriority").alias("priority"),
    )
    cell = o.groupBy("dow", "priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).localCheckpoint(eager=False)
    rowm = cell.groupBy("dow").agg(F.sum("n").cast("bigint").alias("nr"))
    colm = cell.groupBy("priority").agg(
        F.sum("n").cast("bigint").alias("nc")
    )
    tot = cell.agg(F.sum("n").cast("bigint").alias("nt"))
    exp = F.col("nr").cast("double") * F.col("nc") / F.col("nt")
    denom = F.sqrt(
        exp
        * (1 - F.col("nr").cast("double") / F.col("nt"))
        * (1 - F.col("nc").cast("double") / F.col("nt"))
    )
    return (
        cell.join(F.broadcast(rowm), "dow")
        .join(F.broadcast(colm), "priority")
        .crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "priority",
            "n",
            F.round(exp, 6).alias("expected"),
            F.round((F.col("n") - exp) / denom, 6).alias("adj_residual"),
        )
    )


SQL_WEEKDAY_PRIORITY_RESIDUALS = """
WITH o AS (SELECT CAST(dayofweek(o_orderdate) AS BIGINT) dow,
             o_orderpriority pr FROM orders),
cell AS (SELECT dow, pr, CAST(count(*) AS BIGINT) n FROM o GROUP BY 1,2),
rowm AS (SELECT dow, CAST(sum(n) AS BIGINT) nr FROM cell GROUP BY 1),
colm AS (SELECT pr, CAST(sum(n) AS BIGINT) nc FROM cell GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) nt FROM cell)
SELECT c.dow, c.pr AS priority, c.n,
  round(CAST(r.nr AS DOUBLE)*cm.nc/t.nt, 6) expected,
  round( (c.n - CAST(r.nr AS DOUBLE)*cm.nc/t.nt) /
         sqrt( CAST(r.nr AS DOUBLE)*cm.nc/t.nt
               * (1 - CAST(r.nr AS DOUBLE)/t.nt)
               * (1 - CAST(cm.nc AS DOUBLE)/t.nt) ), 6) adj_residual
FROM cell c JOIN rowm r USING (dow) JOIN colm cm USING (pr), tot t"""


def q_funnel_wilson(spark, sf_dir):
    """Per-step funnel conversion with 95% Wilson intervals: the
    min-anchored signup→click→purchase user funnel, each step's rate
    wrapped in the CI a product readout needs before calling a drop
    significant (events_funnel gives the counts; this is the
    uncertainty layer). One user-grain groupBy, a 2-row step table."""
    e = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("u"),
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    first = lambda t: F.min(  # noqa: E731
        F.when(F.col("event_type") == t, F.col("us"))
    )
    f = e.groupBy("u").agg(
        first("signup").alias("t0"),
        first("click").alias("t1"),
        first("purchase").alias("t2"),
    )
    s = f.agg(
        F.sum(F.col("t0").isNotNull().cast("bigint"))
        .cast("bigint")
        .alias("s0"),
        F.sum(
            (F.col("t0").isNotNull() & (F.col("t1") > F.col("t0"))).cast(
                "bigint"
            )
        )
        .cast("bigint")
        .alias("s1"),
        F.sum(
            (
                F.col("t0").isNotNull()
                & (F.col("t1") > F.col("t0"))
                & (F.col("t2") > F.col("t1"))
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("s2"),
    )
    steps = s.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("signup->click").alias("step"),
                    F.col("s1").alias("x"),
                    F.col("s0").alias("n"),
                ),
                F.struct(
                    F.lit("click->purchase").alias("step"),
                    F.col("s2").alias("x"),
                    F.col("s1").alias("n"),
                ),
            )
        ).alias("r")
    ).select("r.step", "r.n", "r.x")
    center = (F.col("x") + 1.92) / (F.col("n") + 3.84)
    half = (
        1.96
        / (F.col("n") + 3.84)
        * F.sqrt(
            F.col("x") * 1.0 * (F.col("n") - F.col("x")) / F.col("n")
            + 0.96
        )
    )
    return steps.select(
        "step",
        "n",
        "x",
        F.round(F.col("x") * 1.0 / F.col("n"), 6).alias("rate"),
        F.round(center - half, 6).alias("wilson_lo"),
        F.round(center + half, 6).alias("wilson_hi"),
    )


SQL_FUNNEL_WILSON = """
WITH f AS (SELECT user_id u,
             min(epoch_us(ts)) FILTER (event_type='signup') t0,
             min(epoch_us(ts)) FILTER (event_type='click') t1,
             min(epoch_us(ts)) FILTER (event_type='purchase') t2
           FROM events GROUP BY 1),
s AS (SELECT CAST(count(*) FILTER (t0 IS NOT NULL) AS BIGINT) s0,
        CAST(count(*) FILTER (t0 IS NOT NULL AND t1 > t0) AS BIGINT) s1,
        CAST(count(*) FILTER (t0 IS NOT NULL AND t1 > t0 AND t2 > t1)
             AS BIGINT) s2
      FROM f)
SELECT step, n, x, round(x*1.0/n, 6) rate,
  round( (x + 1.92) / (n + 3.84)
         - 1.96/(n + 3.84) * sqrt(x*1.0*(n-x)/n + 0.96), 6) wilson_lo,
  round( (x + 1.92) / (n + 3.84)
         + 1.96/(n + 3.84) * sqrt(x*1.0*(n-x)/n + 0.96), 6) wilson_hi
FROM (SELECT 'signup->click' step, s1 x, s0 n FROM s
      UNION ALL SELECT 'click->purchase', s2, s1 FROM s) steps"""


def q_price_endings(spark, sf_dir):
    """Psychological-pricing audit: the top-10 cent endings
    (total cents mod 100) by frequency — charm-pricing mass (.99/.95)
    vs the uniform endings synthetic or mechanically-priced data
    shows. One map-side-combinable groupBy + a bounded top-10."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "orders").select(
        (
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint") % 100
        ).alias("ending")
    )
    c = e.groupBy("ending").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).localCheckpoint(eager=False)
    t = c.agg(F.sum("n").cast("bigint").alias("nt"))
    ranked = c.crossJoin(F.broadcast(t)).select(
        "ending",
        "n",
        F.round(F.col("n") * 1.0 / F.col("nt"), 6).alias("ending_share"),
        F.row_number()
        .over(Window.orderBy(F.desc("n"), F.asc("ending")))
        .alias("rk"),
    )
    return ranked.where(F.col("rk") <= 10).select(
        "ending", "n", "ending_share"
    )


SQL_PRICE_ENDINGS = """
WITH e AS (SELECT CAST(round(o_totalprice*100,0) AS BIGINT) % 100 ending
           FROM orders),
c AS (SELECT ending, CAST(count(*) AS BIGINT) n FROM e GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) nt FROM c),
r AS (SELECT CAST(ending AS BIGINT) ending, n,
        round(n*1.0/(SELECT nt FROM t), 6) ending_share,
        row_number() OVER (ORDER BY n DESC, ending) rk
      FROM c)
SELECT ending, n, ending_share FROM r WHERE rk <= 10"""


def q_type_cofrequency(spark, sf_dir):
    """Event-type co-engagement matrix: Jaccard of the USER sets of
    every type pair — which behaviours share an audience (the
    user-grain analogue of daily_cooccurrence_lift's day grain). The
    distinct (user, type) table self-joins at the type-pair grain."""
    ut = (
        _t(spark, sf_dir, "events")
        .select(
            F.col("user_id").alias("u"), F.col("event_type").alias("et")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = ut.groupBy("et").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = ut.alias("a")
    b = ut.alias("b")
    both = (
        a.join(
            b,
            (F.col("a.u") == F.col("b.u"))
            & (F.col("a.et") < F.col("b.et")),
        )
        .groupBy(
            F.col("a.et").alias("type_a"), F.col("b.et").alias("type_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    na = n.select(F.col("et").alias("type_a"), F.col("n").alias("n_a"))
    nb = n.select(F.col("et").alias("type_b"), F.col("n").alias("n_b"))
    return (
        both.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            F.round(
                F.col("n_both")
                * 1.0
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                6,
            ).alias("user_jaccard"),
        )
    )


SQL_TYPE_COFREQUENCY = """
WITH ut AS (SELECT DISTINCT user_id u, event_type et FROM events),
n AS (SELECT et, CAST(count(*) AS BIGINT) n FROM ut GROUP BY 1),
bo AS (SELECT a.et type_a, b.et type_b, CAST(count(*) AS BIGINT) n_both
       FROM ut a JOIN ut b ON a.u = b.u AND a.et < b.et
       GROUP BY 1,2)
SELECT bo.type_a, bo.type_b, na.n n_a, nb.n n_b, bo.n_both,
       round(bo.n_both*1.0/(na.n + nb.n - bo.n_both), 6) user_jaccard
FROM bo JOIN n na ON bo.type_a = na.et
        JOIN n nb ON bo.type_b = nb.et"""


def q_session_bookends(spark, sf_dir):
    """Session entry/exit matrix: per 30-minute-gap session, the first
    and last event type, aggregated to the (first, last) grain — how
    journeys open and close (the bookend layer on events_sessionize's
    counts). Session ids from the same gap rule; first/last via
    rank-in-session, never a per-session sort of the whole table."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    s = e.withColumn(
        "new_s", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).withColumn("sid", F.sum("new_s").over(w))
    sw = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    r = s.select(
        "user_id",
        "sid",
        "event_type",
        F.row_number().over(sw).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("user_id", "sid"))
        .alias("nr"),
    )
    bk = r.groupBy("user_id", "sid").agg(
        F.max(F.when(F.col("rk") == 1, F.col("event_type"))).alias(
            "first_type"
        ),
        F.max(
            F.when(F.col("rk") == F.col("nr"), F.col("event_type"))
        ).alias("last_type"),
    )
    return bk.groupBy("first_type", "last_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )


SQL_SESSION_BOOKENDS = """
WITH x AS (SELECT user_id u, ts, event_id eid, event_type et,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR date_diff('second', lag(ts) OVER w, ts) > 1800
             THEN 1 ELSE 0 END new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT u, ts, eid, et,
        sum(new_s) OVER (PARTITION BY u ORDER BY ts, eid) sid
      FROM x),
r AS (SELECT u, sid, et,
        row_number() OVER (PARTITION BY u, sid ORDER BY ts, eid) rk,
        count(*) OVER (PARTITION BY u, sid) nr
      FROM s),
bk AS (SELECT u, sid,
         max(CASE WHEN rk = 1 THEN et END) first_type,
         max(CASE WHEN rk = nr THEN et END) last_type
       FROM r GROUP BY 1,2)
SELECT first_type, last_type, CAST(count(*) AS BIGINT) n_sessions
FROM bk GROUP BY 1,2"""


def q_crosslang_dups(spark, sf_dir):
    """Cross-language leakage in the near-dup pairs: every exact
    Jaccard pair annotated with both documents' languages and the
    cross-language flag — translated/copied content that a per-language
    dedup pass would MISS entirely (the fixture's near-dups are mostly
    cross-lingual, which is exactly the finding)."""
    docs = _t(spark, sf_dir, "documents")
    p = dd.ngram_jaccard_pairs(docs, 0.5)
    la = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("lang").alias("lang_a")
    )
    lb = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("lang").alias("lang_b")
    )
    return (
        p.join(F.broadcast(la), "doc_a")
        .join(F.broadcast(lb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "lang_a",
            "lang_b",
            "jaccard",
            (F.col("lang_a") != F.col("lang_b")).alias("cross_lang"),
        )
    )


SQL_CROSSLANG_DUPS = f"""
WITH {_TRIGRAM_SQL},
common AS (SELECT a.doc_id da, b.doc_id db, count(*) c FROM sh a
           JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
p AS (SELECT da, db, round(c*1.0/(na.n + nb.n - c), 6) j
      FROM common JOIN cnt na ON da=na.doc_id JOIN cnt nb ON db=nb.doc_id
      WHERE c*1.0/(na.n + nb.n - c) >= 0.5)
SELECT p.da doc_a, p.db doc_b, la.lang lang_a, lb.lang lang_b,
       p.j jaccard, (la.lang <> lb.lang) cross_lang
FROM p JOIN documents la ON p.da = la.doc_id
       JOIN documents lb ON p.db = lb.doc_id"""


def q_velocity_by_size(spark, sf_dir):
    """Quantity velocity per part-size band (p_size // 10): line count,
    total and mean quantity — the size-vs-demand profile warehouse slot
    planning reads. One broadcast dim join + map-side groupBy."""
    j = (
        _t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(_t(spark, sf_dir, "part")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            (((F.col("p_size") - 1) / 10).cast("bigint")).alias(
                "size_band"
            ),
            F.round("l_quantity", 0).cast("bigint").alias("q"),
        )
    )
    return j.groupBy("size_band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum("q").cast("bigint").alias("total_qty"),
        F.round(F.sum("q") * 1.0 / F.count(F.lit(1)), 6).alias("mean_qty"),
    )


SQL_VELOCITY_BY_SIZE = """
WITH j AS (SELECT p.p_size sz, CAST(round(li.l_quantity,0) AS BIGINT) q
           FROM lineitem li JOIN part p ON li.l_partkey = p.p_partkey),
b AS (SELECT CAST((sz-1)//10 AS BIGINT) size_band, q FROM j)
SELECT size_band, CAST(count(*) AS BIGINT) n_lines,
       CAST(sum(q) AS BIGINT) total_qty,
       round(sum(q)*1.0/count(*), 6) mean_qty
FROM b GROUP BY 1"""


def q_langid_confusion(spark, sf_dir):
    """Language-ID confusion matrix: truth × predicted counts with the
    within-truth row share — the standard eval artifact behind
    metrics_stringmatch's per-class accuracy (which says HOW MUCH is
    wrong; this says WHERE it goes — e.g. low-marker de docs fall to
    'en' or 'und')."""
    from llmaix_spark.operators.textstats import lang_id_expr

    p = _t(spark, sf_dir, "documents").select(
        F.col("lang").alias("truth"),
        lang_id_expr(F.col("text")).alias("pred"),
    )
    cm = p.groupBy("truth", "pred").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    n = cm.groupBy("truth").agg(
        F.sum("n").cast("bigint").alias("n_truth")
    )
    return cm.join(F.broadcast(n), "truth").select(
        "truth",
        "pred",
        "n",
        F.round(F.col("n") * 1.0 / F.col("n_truth"), 6).alias("row_share"),
    )


SQL_LANGID_CONFUSION = f"""
WITH h AS (SELECT lang, {_langid_hits_sql()} FROM documents),
p AS (SELECT lang truth,
        CASE WHEN greatest(hit_en,hit_de,hit_es,hit_fr) = 0 THEN 'und'
             WHEN hit_en = greatest(hit_en,hit_de,hit_es,hit_fr) THEN 'en'
             WHEN hit_de = greatest(hit_en,hit_de,hit_es,hit_fr) THEN 'de'
             WHEN hit_es = greatest(hit_en,hit_de,hit_es,hit_fr) THEN 'es'
             ELSE 'fr' END pred
      FROM h),
n AS (SELECT truth, CAST(count(*) AS BIGINT) n_truth FROM p GROUP BY 1)
SELECT p.truth, p.pred, CAST(count(*) AS BIGINT) n,
       round(count(*)*1.0/max(n.n_truth), 6) row_share
FROM p JOIN n USING (truth) GROUP BY 1,2"""


def q_gap_skewness(spark, sf_dir):
    """Third-moment analysis of inter-order gaps per segment: exact
    integer Σd, Σd², Σd³ (decimal cubes) feed the population skewness
    g₁ = (m₃ − 3m₁m₂ + 2m₁³)/m₂′^1.5 — whether reorder cadence is
    right-tailed (a mean±std view would miss it). One lag window per
    customer, then map-side moments."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        (
            F.unix_micros(F.col("o_orderdate").cast("timestamp"))
            / F.lit(86400000000)
        )
        .cast("bigint")
        .alias("d"),
    )
    w = Window.partitionBy("ck").orderBy("d", "ck")
    g = o.select(
        "ck", (F.col("d") - F.lag("d").over(w)).alias("gap")
    ).where(F.col("gap").isNotNull() & (F.col("gap") > 0))
    j = g.join(
        F.broadcast(
            _t(spark, sf_dir, "customer").select(
                F.col("c_custkey").alias("ck"),
                F.col("c_mktsegment").alias("seg"),
            )
        ),
        "ck",
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = j.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("gap").cast("bigint").alias("s1"),
        F.sum(F.col("gap") * F.col("gap")).cast("bigint").alias("s2"),
        F.sum(d38("gap") * d38("gap") * d38("gap"))
        .cast("decimal(38,0)")
        .alias("s3"),
    )
    m1 = F.col("s1") * 1.0 / F.col("n")
    m2 = F.col("s2").cast("double") / F.col("n")
    m3 = F.col("s3").cast("double") / F.col("n")
    return m.select(
        "seg",
        "n",
        F.round(m1, 6).alias("mean_gap"),
        F.round(
            (m3 - 3 * m1 * m2 + 2 * F.pow(m1, 3))
            / F.pow(m2 - F.pow(m1, 2), 1.5),
            6,
        ).alias("skewness"),
    )


SQL_GAP_SKEWNESS = """
WITH o AS (SELECT o_custkey ck, epoch_us(o_orderdate)//86400000000 d
           FROM orders),
g AS (SELECT ck, d - lag(d) OVER (PARTITION BY ck ORDER BY d, ck) gap
      FROM o QUALIFY gap IS NOT NULL AND gap > 0),
j AS (SELECT c.c_mktsegment seg, g.gap
      FROM g JOIN customer c ON g.ck = c.c_custkey),
m AS (SELECT seg, CAST(count(*) AS BIGINT) n, CAST(sum(gap) AS BIGINT) s1,
        CAST(sum(gap*gap) AS BIGINT) s2,
        CAST(sum(CAST(gap AS HUGEINT)*gap*gap) AS HUGEINT) s3
      FROM j GROUP BY 1)
SELECT seg, n,
  round(s1*1.0/n, 6) mean_gap,
  round( (CAST(s3 AS DOUBLE)/n - 3*(s1*1.0/n)*(CAST(s2 AS DOUBLE)/n)
          + 2*power(s1*1.0/n,3))
         / power( CAST(s2 AS DOUBLE)/n - power(s1*1.0/n,2), 1.5), 6)
    skewness
FROM m"""


def q_return_by_latency(spark, sf_dir):
    """Return rate by ship-latency band (30-day bands capped at 120+;
    negative latencies — ship before order date — isolated in a −1
    data-quality band rather than silently merged): does late
    fulfilment correlate with returns. One fact join + map-side
    groupBy on exact day arithmetic."""
    day = lambda c: (  # noqa: E731
        F.unix_micros(F.col(c).cast("timestamp")) / F.lit(86400000000)
    ).cast("bigint")
    j = (
        _t(spark, sf_dir, "lineitem")
        .join(
            _t(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            (day("l_shipdate") - day("o_orderdate")).alias("lat"),
            (F.col("l_returnflag") == "R").alias("ret"),
        )
    )
    band = F.when(F.col("lat") < 0, F.lit(-1).cast("bigint")).otherwise(
        F.least((F.col("lat") / 30).cast("bigint"), F.lit(4).cast("bigint"))
    )
    return (
        j.select(band.alias("band"), "ret")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(F.col("ret").cast("bigint"))
            .cast("bigint")
            .alias("n_returned"),
            F.round(
                F.sum(F.col("ret").cast("bigint")) / F.count(F.lit(1)), 6
            ).alias("return_rate"),
        )
    )


SQL_RETURN_BY_LATENCY = """
WITH j AS (SELECT (epoch_us(li.l_shipdate)//86400000000
                   - epoch_us(o.o_orderdate)//86400000000) lat,
             (li.l_returnflag = 'R') ret
           FROM lineitem li JOIN orders o ON li.l_orderkey = o.o_orderkey),
b AS (SELECT CASE WHEN lat < 0 THEN CAST(-1 AS BIGINT)
                  ELSE least(CAST(lat//30 AS BIGINT), 4) END band, ret
      FROM j)
SELECT band, CAST(count(*) AS BIGINT) n_lines,
       CAST(count(*) FILTER (ret) AS BIGINT) n_returned,
       round(count(*) FILTER (ret) * 1.0 / count(*), 6) return_rate
FROM b GROUP BY 1"""


def q_lsh_s_curve(spark, sf_dir):
    """The LSH S-curve, theory vs practice: ALL shared-shingle pairs
    (threshold 0 — the unthresholded truth) bucketed by Jaccard decile,
    each bucket's empirical band-candidate capture rate next to the
    analytic 1−(1−J^r)^b at the bucket midpoint (b=8, r=2 — the
    production banding). The evidence plot behind every LSH threshold
    choice in this repo, as a value-checked table."""
    docs = _t(spark, sf_dir, "documents")
    allp = dd.ngram_jaccard_pairs(docs, 0.0).select(
        "doc_a", "doc_b", "jaccard"
    )
    cand = dd.lsh_candidate_pairs(docs).withColumn("is_cand", F.lit(1))
    lab = allp.join(cand, ["doc_a", "doc_b"], "left").select(
        F.least(
            F.floor(F.col("jaccard") * 10).cast("bigint"),
            F.lit(9).cast("bigint"),
        ).alias("j_bucket"),
        F.col("is_cand").isNotNull().alias("hit"),
    )
    mid = (F.col("j_bucket") + 0.5) / 10
    return (
        lab.groupBy("j_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.col("hit").cast("bigint"))
            .cast("bigint")
            .alias("n_candidates"),
        )
        .select(
            "j_bucket",
            "n_pairs",
            "n_candidates",
            F.round(F.col("n_candidates") * 1.0 / F.col("n_pairs"), 6).alias(
                "empirical_rate"
            ),
            F.round(1 - F.pow(1 - F.pow(mid, 2), 8), 6).alias(
                "theory_rate"
            ),
        )
    )


def _lsh_s_curve_sql() -> str:
    h = f"({_HASH60_SQL.format(v='s')} % {_P})"
    mins = ", ".join(
        f"min(({a} * {h} + {b}) % {_P}) AS h{i}"
        for i, (a, b) in enumerate(_MINHASH_AB)
    )
    bands = ", ".join(
        "CAST(h{} AS VARCHAR) || ':' || CAST(h{} AS VARCHAR)".format(
            b * 2, b * 2 + 1
        )
        for b in range(8)
    )
    return f"""
WITH {_TRIGRAM_SQL},
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
banded AS (SELECT doc_id, generate_subscripts(bv,1)-1 band_idx,
             unnest(bv) band_val
           FROM (SELECT doc_id, [{bands}] bv FROM sig)),
cand AS (SELECT DISTINCT a.doc_id da, b.doc_id db FROM banded a
         JOIN banded b ON a.band_idx=b.band_idx
                      AND a.band_val=b.band_val AND a.doc_id<b.doc_id),
common AS (SELECT a.doc_id da, b.doc_id db, count(*) c FROM sh a
           JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1,2),
allp AS (SELECT common.da, common.db, c*1.0/(na.n + nb.n - c) j
         FROM common JOIN cnt na ON common.da=na.doc_id
                     JOIN cnt nb ON common.db=nb.doc_id),
lab AS (SELECT least(CAST(floor(allp.j*10) AS BIGINT), 9) jb,
          (cand.da IS NOT NULL) hit
        FROM allp LEFT JOIN cand ON allp.da=cand.da AND allp.db=cand.db)
SELECT jb AS j_bucket, CAST(count(*) AS BIGINT) n_pairs,
       CAST(count(*) FILTER (hit) AS BIGINT) n_candidates,
       round(count(*) FILTER (hit)*1.0/count(*), 6) empirical_rate,
       round(1 - power(1 - power((jb+0.5)/10, 2), 8), 6) theory_rate
FROM lab GROUP BY 1"""


SQL_LSH_S_CURVE = _lsh_s_curve_sql()


def q_dedup_scaling_curve(spark, sf_dir):
    """Redundancy scaling curve: near-dup pair counts restricted to
    the first 25/50/75/100% of the doc-id range — whether duplication
    grows superlinearly with corpus size (it does: pairs arrive faster
    than docs), the capacity-planning input for a growing crawl."""
    docs = _t(spark, sf_dir, "documents")
    p = dd.ngram_jaccard_pairs(docs, 0.5).localCheckpoint(eager=False)
    mx = docs.agg(F.max("doc_id").alias("m"))
    fr = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(x) for x in (25, 50, 75, 100)])
        ).alias("pct")
    ).crossJoin(F.broadcast(mx))
    nd = (
        fr.join(
            docs.select("doc_id"),
            F.col("doc_id") <= F.col("m") * F.col("pct") / 100.0,
            "left",
        )
        .groupBy("pct", "m")
        .agg(F.count("doc_id").cast("bigint").alias("n_docs"))
    )
    np_ = (
        fr.join(
            p,
            (F.col("doc_a") <= F.col("m") * F.col("pct") / 100.0)
            & (F.col("doc_b") <= F.col("m") * F.col("pct") / 100.0),
            "left",
        )
        .groupBy("pct")
        .agg(F.count("doc_a").cast("bigint").alias("n_pairs"))
    )
    return (
        nd.join(np_, "pct")
        .select(
            F.col("pct").cast("bigint").alias("pct"), "n_docs", "n_pairs"
        )
    )


SQL_DEDUP_SCALING_CURVE = f"""
WITH {_TRIGRAM_SQL},
common AS (SELECT a.doc_id da, b.doc_id db, count(*) c FROM sh a
           JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1,2),
p AS (SELECT da, db
      FROM common JOIN cnt na ON da=na.doc_id JOIN cnt nb ON db=nb.doc_id
      WHERE c*1.0/(na.n+nb.n-c) >= 0.5),
mx AS (SELECT max(doc_id) m FROM documents),
fr AS (SELECT unnest([25,50,75,100]) pct)
SELECT CAST(pct AS BIGINT) pct,
  (SELECT CAST(count(*) AS BIGINT) FROM documents, mx
   WHERE doc_id <= m*pct/100.0) n_docs,
  CAST(count(*) FILTER (p.da <= (SELECT m FROM mx)*pct/100.0
                        AND p.db <= (SELECT m FROM mx)*pct/100.0)
       AS BIGINT) n_pairs
FROM fr LEFT JOIN p ON TRUE GROUP BY pct"""


def q_heldout_perplexity(spark, sf_dir):
    """TRUE held-out LM evaluation (unigram_logprob scores in-sample):
    the unigram model fits on the TRAIN split only (Laplace +1 over
    train vocab, one shared OOV slot), then scores val and test docs —
    per split: docs, tokens, mean log10 probability (per-token log
    rounded to 6dp, mean to 4dp — the repo's cross-engine log
    contract). The train-side freq table is the only join input."""
    from llmaix_spark.operators.curation import dataset_split
    from llmaix_spark.operators.textstats import _tokens

    docs = _t(spark, sf_dir, "documents")
    toks = docs.join(dataset_split(docs), "doc_id").select(
        "doc_id", "split", F.explode(_tokens(F.col("text"))).alias("tok")
    ).localCheckpoint(eager=False)
    freq = (
        toks.where(F.col("split") == "train")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)
    )
    v = freq.agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum("c").cast("bigint").alias("n"),
    )
    scored = (
        toks.where(F.col("split") != "train")
        .join(F.broadcast(freq), "tok", "left")
        .crossJoin(F.broadcast(v))
        .select(
            "split",
            "doc_id",
            F.round(
                F.log10(
                    (F.coalesce("c", F.lit(0)) + 1.0)
                    / (F.col("n") + F.col("vocab") + 1)
                ),
                6,
            ).alias("lp"),
        )
    )
    return scored.groupBy("split").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.round(F.avg("lp"), 4).alias("mean_logprob"),
    )


SQL_HELDOUT_PERPLEXITY = rf"""
WITH toks AS (SELECT doc_id,
        CASE WHEN {_HASH60_SQL.format(v="CAST(doc_id AS VARCHAR) || ':split'")} % 10000 < 9000 THEN 'train'
             WHEN {_HASH60_SQL.format(v="CAST(doc_id AS VARCHAR) || ':split'")} % 10000 < 9500 THEN 'val'
             ELSE 'test' END split,
        unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> length(x) > 0)) tok
      FROM documents),
freq AS (SELECT tok, CAST(count(*) AS BIGINT) c FROM toks
         WHERE split = 'train' GROUP BY 1),
v AS (SELECT CAST(count(*) AS BIGINT) vocab, CAST(sum(c) AS BIGINT) n
      FROM freq),
scored AS (SELECT t.split, t.doc_id,
             round(log10((coalesce(f.c, 0) + 1.0)
                   / ((SELECT n FROM v) + (SELECT vocab FROM v) + 1)), 6)
               lp
           FROM toks t LEFT JOIN freq f ON t.tok = f.tok
           WHERE t.split <> 'train')
SELECT split, CAST(count(DISTINCT doc_id) AS BIGINT) n_docs,
       CAST(count(*) AS BIGINT) n_tokens,
       round(avg(lp), 4) mean_logprob
FROM scored GROUP BY 1"""


def q_hard_negatives(spark, sf_dir):
    """Contrastive hard-negative mining: sign-hash the first 4
    embedding dimensions into 16 coarse buckets, then count
    same-bucket DIFFERENT-label pairs per label pair — geometrically
    close cross-class examples, the pairs a contrastive fine-tune
    should sample hardest. Pair join runs within buckets only (the
    SimHash-lite stand-in for the IVF assignment at test dims)."""
    b = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("label").cast("bigint").alias("label"),
        (
            F.when(F.element_at("embedding", 1) > 0, 1).otherwise(0)
            + F.when(F.element_at("embedding", 2) > 0, 2).otherwise(0)
            + F.when(F.element_at("embedding", 3) > 0, 4).otherwise(0)
            + F.when(F.element_at("embedding", 4) > 0, 8).otherwise(0)
        )
        .cast("bigint")
        .alias("bucket"),
    )
    a = b.alias("a")
    c = b.alias("b")
    p = a.join(
        c,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id"))
        & (F.col("a.label") != F.col("b.label")),
    ).select(
        F.least(F.col("a.label"), F.col("b.label")).alias("label_a"),
        F.greatest(F.col("a.label"), F.col("b.label")).alias("label_b"),
    )
    return p.groupBy("label_a", "label_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hard_pairs")
    )


SQL_HARD_NEGATIVES = """
WITH b AS (SELECT vec_id, label,
    CAST((CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
       + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
       + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
       + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS BIGINT) bucket
  FROM embeddings),
p AS (SELECT least(a.label, b.label) la, greatest(a.label, b.label) lb
      FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE a.label <> b.label)
SELECT CAST(la AS BIGINT) label_a, CAST(lb AS BIGINT) label_b,
       CAST(count(*) AS BIGINT) n_hard_pairs
FROM p GROUP BY 1,2"""


def q_quality_fusion(spark, sf_dir):
    """Reciprocal-rank fusion of three quality signals (length,
    type-token ratio, 1−repetition) into one curation ranking:
    RRF = Σ 1/(60+rank_i), nano-quantized so the fused score is an
    exact integer; top-50 manifest. The rank-fusion combinator a
    multi-signal curation pass needs when signal scales don't
    commensurate."""
    from pyspark.sql import Window

    from llmaix_spark.functions.arrays import bind_array
    from llmaix_spark.operators.textstats import _tokens

    base = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("len_sig"),
        bind_array(
            _tokens(F.col("text")),
            lambda w: F.round(
                F.size(F.array_distinct(w)) * 1.0 / F.size(w), 9
            ),
        ).alias("ttr"),
    ).withColumn("rep", F.round(1.0 - F.col("ttr"), 9))
    r = base.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("len_sig"), F.asc("doc_id")))
        .alias("r1"),
        F.row_number()
        .over(Window.orderBy(F.desc("ttr"), F.asc("doc_id")))
        .alias("r2"),
        F.row_number()
        .over(Window.orderBy(F.asc("rep"), F.asc("doc_id")))
        .alias("r3"),
    )
    rrf = F.round(
        (
            1.0 / (60 + F.col("r1"))
            + 1.0 / (60 + F.col("r2"))
            + 1.0 / (60 + F.col("r3"))
        )
        * 1e9,
        0,
    ).cast("bigint")
    f = r.select("doc_id", rrf.alias("rrf_nano"))
    return (
        f.withColumn(
            "fused_rank",
            F.row_number()
            .over(Window.orderBy(F.desc("rrf_nano"), F.asc("doc_id")))
            .cast("bigint"),
        )
        .where(F.col("fused_rank") <= 50)
    )


SQL_QUALITY_FUSION = r"""
WITH base AS (SELECT doc_id, n_chars,
    list_filter(string_split_regex(lower(trim(text)),'\s+'),
                x->length(x)>0) w
  FROM documents),
sig AS (SELECT doc_id, CAST(n_chars AS BIGINT) len_sig,
    round(len(list_distinct(w))*1.0/len(w), 9) ttr,
    round(1.0 - len(list_distinct(w))*1.0/len(w), 9) rep
  FROM base),
r AS (SELECT doc_id,
    row_number() OVER (ORDER BY len_sig DESC, doc_id) r1,
    row_number() OVER (ORDER BY ttr DESC, doc_id) r2,
    row_number() OVER (ORDER BY rep ASC, doc_id) r3
  FROM sig),
f AS (SELECT doc_id,
    CAST(round((1.0/(60+r1) + 1.0/(60+r2) + 1.0/(60+r3))*1e9, 0)
         AS BIGINT) rrf_nano
  FROM r)
SELECT doc_id, rrf_nano,
  CAST(row_number() OVER (ORDER BY rrf_nano DESC, doc_id) AS BIGINT)
    fused_rank
FROM f QUALIFY fused_rank <= 50"""


def q_split_token_chi2(spark, sf_dir):
    """Token-level split homogeneity: χ² between the train slice and
    the held-out rest over the top-10 train tokens (+ an OTHER
    bucket) — the content-level companion of split_parity_psi's
    length histogram. df = categories − 1."""
    from pyspark.sql import Window

    from llmaix_spark.operators.curation import dataset_split
    from llmaix_spark.operators.textstats import _tokens

    docs = _t(spark, sf_dir, "documents")
    toks = docs.join(dataset_split(docs), "doc_id").select(
        F.when(F.col("split") == "train", "train")
        .otherwise("heldout")
        .alias("grp"),
        F.explode(_tokens(F.col("text"))).alias("tok"),
    ).localCheckpoint(eager=False)
    top = (
        toks.where(F.col("grp") == "train")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.desc("c"), F.asc("tok"))
            ),
        )
        .where(F.col("rk") <= 10)
        .select("tok", F.lit(1).alias("_top"))
    )
    m = toks.join(F.broadcast(top), "tok", "left").select(
        F.when(F.col("_top").isNotNull(), F.col("tok"))
        .otherwise("__other__")
        .alias("cat"),
        "grp",
    )
    cell = m.groupBy("cat").agg(
        F.sum((F.col("grp") == "train").cast("bigint"))
        .cast("bigint")
        .alias("ct"),
        F.sum((F.col("grp") == "heldout").cast("bigint"))
        .cast("bigint")
        .alias("ch"),
    )
    tot = cell.agg(
        F.sum("ct").cast("bigint").alias("nt"),
        F.sum("ch").cast("bigint").alias("nh"),
    )
    et = (
        (F.col("ct") + F.col("ch"))
        * 1.0
        * F.col("nt")
        / (F.col("nt") + F.col("nh"))
    )
    eh = (
        (F.col("ct") + F.col("ch"))
        * 1.0
        * F.col("nh")
        / (F.col("nt") + F.col("nh"))
    )
    return cell.crossJoin(F.broadcast(tot)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cats"),
        (F.count(F.lit(1)) - 1).cast("bigint").alias("df"),
        F.round(
            F.sum(
                F.pow(F.col("ct") - et, 2) / et
                + F.pow(F.col("ch") - eh, 2) / eh
            ),
            6,
        ).alias("chi2"),
    )


SQL_SPLIT_TOKEN_CHI2 = rf"""
WITH toks AS (SELECT
        CASE WHEN {_HASH60_SQL.format(v="CAST(doc_id AS VARCHAR) || ':split'")} % 10000 < 9000 THEN 'train' ELSE 'heldout' END grp,
        unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> length(x) > 0)) tok
      FROM documents),
top AS (SELECT tok FROM (SELECT tok, count(*) c FROM toks
        WHERE grp='train' GROUP BY 1
        QUALIFY row_number() OVER (ORDER BY c DESC, tok) <= 10) q0),
m AS (SELECT CASE WHEN top.tok IS NOT NULL THEN toks.tok
                  ELSE '__other__' END cat, grp
      FROM toks LEFT JOIN top ON toks.tok = top.tok),
cell AS (SELECT cat, CAST(count(*) FILTER (grp='train') AS BIGINT) ct,
           CAST(count(*) FILTER (grp='heldout') AS BIGINT) ch
         FROM m GROUP BY 1),
tot AS (SELECT CAST(sum(ct) AS BIGINT) nt, CAST(sum(ch) AS BIGINT) nh
        FROM cell),
ex AS (SELECT cat, ct, ch,
         (ct+ch)*1.0*(SELECT nt FROM tot)
           /((SELECT nt FROM tot)+(SELECT nh FROM tot)) et,
         (ct+ch)*1.0*(SELECT nh FROM tot)
           /((SELECT nt FROM tot)+(SELECT nh FROM tot)) eh
       FROM cell)
SELECT CAST(count(*) AS BIGINT) n_cats, CAST(count(*) - 1 AS BIGINT) df,
  round(sum(power(ct-et,2)/et + power(ch-eh,2)/eh), 6) chi2
FROM ex"""


def q_anova_two_way(spark, sf_dir):
    """Two-way ANOVA of line quantity on discount band × return flag:
    SS decomposition (factor A, factor B, interaction, error) and the
    three F statistics — the factorial-design readout beyond the
    one-factor tests in the library. Every sum of squares comes from
    exact integer (n, Σy, Σy²) cell moments; the handful of group-mean
    divisions are the only floats."""
    x = _t(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_discount") == 0, "none")
        .when(F.col("l_discount") < 0.05, "low")
        .otherwise("high")
        .alias("a"),
        F.col("l_returnflag").alias("b"),
        F.round("l_quantity", 0).cast("bigint").alias("y"),
    )
    cell = x.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("ss"),
    ).localCheckpoint(eager=False)  # 4 consumers: tot/am/bm/cells
    mean_sq = F.sum(F.col("s").cast("double") * F.col("s") / F.col("n"))
    tot = cell.agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("s").cast("bigint").alias("s"),
        F.sum("ss").cast("bigint").alias("ss"),
    )
    am = cell.groupBy("a").agg(
        F.sum("n").alias("n"), F.sum("s").alias("s")
    ).agg(mean_sq.alias("ma"), F.count(F.lit(1)).cast("bigint").alias("ka"))
    bm = cell.groupBy("b").agg(
        F.sum("n").alias("n"), F.sum("s").alias("s")
    ).agg(mean_sq.alias("mb"), F.count(F.lit(1)).cast("bigint").alias("kb"))
    cm = cell.agg(
        mean_sq.alias("mc"), F.count(F.lit(1)).cast("bigint").alias("kc")
    )
    j = (
        tot.crossJoin(F.broadcast(am))
        .crossJoin(F.broadcast(bm))
        .crossJoin(F.broadcast(cm))
    )
    grand = F.col("s").cast("double") * F.col("s") / F.col("n")
    ssa = F.col("ma") - grand
    ssb = F.col("mb") - grand
    ssab = F.col("mc") - F.col("ma") - F.col("mb") + grand
    sse = F.col("ss").cast("double") - F.col("mc")
    dfe = F.col("n") - F.col("kc")
    return j.select(
        "n",
        "ka",
        "kb",
        F.round(ssa, 6).alias("ss_a"),
        F.round(ssb, 6).alias("ss_b"),
        F.round(ssab, 6).alias("ss_interaction"),
        F.round(sse, 6).alias("ss_error"),
        F.round((ssa / (F.col("ka") - 1)) / (sse / dfe), 6).alias("f_a"),
        F.round((ssb / (F.col("kb") - 1)) / (sse / dfe), 6).alias("f_b"),
        F.round(
            (ssab / ((F.col("ka") - 1) * (F.col("kb") - 1)))
            / (sse / dfe),
            6,
        ).alias("f_ab"),
    )


SQL_ANOVA_TWO_WAY = """
WITH x AS (SELECT CASE WHEN l_discount = 0 THEN 'none'
                       WHEN l_discount < 0.05 THEN 'low'
                       ELSE 'high' END a,
             l_returnflag b, CAST(round(l_quantity,0) AS BIGINT) y
           FROM lineitem),
cell AS (SELECT a, b, CAST(count(*) AS BIGINT) n, CAST(sum(y) AS BIGINT) s,
           CAST(sum(y*y) AS BIGINT) ss FROM x GROUP BY 1,2),
tot AS (SELECT CAST(sum(n) AS BIGINT) n, CAST(sum(s) AS BIGINT) s,
          CAST(sum(ss) AS BIGINT) ss FROM cell),
am AS (SELECT sum(CAST(s2.s AS DOUBLE)*s2.s/s2.n) ma,
         CAST(count(*) AS BIGINT) ka
       FROM (SELECT a, CAST(sum(n) AS BIGINT) n, CAST(sum(s) AS BIGINT) s
             FROM cell GROUP BY 1) s2),
bm AS (SELECT sum(CAST(s2.s AS DOUBLE)*s2.s/s2.n) mb,
         CAST(count(*) AS BIGINT) kb
       FROM (SELECT b, CAST(sum(n) AS BIGINT) n, CAST(sum(s) AS BIGINT) s
             FROM cell GROUP BY 1) s2),
cm AS (SELECT sum(CAST(s AS DOUBLE)*s/n) mc,
         CAST(count(*) AS BIGINT) kc FROM cell)
SELECT tot.n, am.ka, bm.kb,
  round(am.ma - CAST(tot.s AS DOUBLE)*tot.s/tot.n, 6) ss_a,
  round(bm.mb - CAST(tot.s AS DOUBLE)*tot.s/tot.n, 6) ss_b,
  round(cm.mc - am.ma - bm.mb + CAST(tot.s AS DOUBLE)*tot.s/tot.n, 6)
    ss_interaction,
  round(CAST(tot.ss AS DOUBLE) - cm.mc, 6) ss_error,
  round( ((am.ma - CAST(tot.s AS DOUBLE)*tot.s/tot.n)/(am.ka-1))
         / ((CAST(tot.ss AS DOUBLE) - cm.mc)/(tot.n - cm.kc)), 6) f_a,
  round( ((bm.mb - CAST(tot.s AS DOUBLE)*tot.s/tot.n)/(bm.kb-1))
         / ((CAST(tot.ss AS DOUBLE) - cm.mc)/(tot.n - cm.kc)), 6) f_b,
  round( ((cm.mc - am.ma - bm.mb + CAST(tot.s AS DOUBLE)*tot.s/tot.n)
          /((am.ka-1)*(bm.kb-1)))
         / ((CAST(tot.ss AS DOUBLE) - cm.mc)/(tot.n - cm.kc)), 6) f_ab
FROM tot, am, bm, cm"""


def q_feature_hash_collisions(spark, sf_dir):
    """Hashing-trick capacity audit: distinct trigram features hashed
    into 256 buckets — buckets used, max load, colliding-bucket count
    and the share of feature mass living in collided buckets (1.0 here:
    16k features cannot fit 256 buckets, which is the point a feature-
    hashing dimension choice must confront). One groupBy on the
    distinct-feature table."""
    from llmaix_spark.operators.linking import stable_hash60_expr

    feat = dd.word_shingles(_t(spark, sf_dir, "documents"), 3).select(
        "shingle"
    ).distinct()
    b = feat.select(
        (
            stable_hash60_expr(F.concat(F.col("shingle"), F.lit(":feat")))
            % 256
        ).alias("bucket")
    ).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_feats")
    )
    return b.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets_used"),
        F.sum("n_feats").cast("bigint").alias("n_features"),
        F.max("n_feats").cast("bigint").alias("max_bucket"),
        F.sum((F.col("n_feats") >= 2).cast("bigint"))
        .cast("bigint")
        .alias("n_colliding_buckets"),
        F.round(
            F.sum(F.when(F.col("n_feats") >= 2, F.col("n_feats")).otherwise(0))
            * 1.0
            / F.sum("n_feats"),
            6,
        ).alias("collision_mass"),
    )


SQL_FEATURE_HASH_COLLISIONS = rf"""
WITH {_TRIGRAM_SQL},
feat AS (SELECT DISTINCT s FROM sh),
h AS (SELECT s, {_HASH60_SQL.format(v="s || ':feat'")} % 256 bucket
      FROM feat),
b AS (SELECT CAST(bucket AS BIGINT) bucket,
        CAST(count(*) AS BIGINT) n_feats FROM h GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) n_buckets_used,
  CAST(sum(n_feats) AS BIGINT) n_features,
  CAST(max(n_feats) AS BIGINT) max_bucket,
  CAST(count(*) FILTER (n_feats >= 2) AS BIGINT) n_colliding_buckets,
  round(sum(CASE WHEN n_feats >= 2 THEN n_feats ELSE 0 END)*1.0
        /sum(n_feats), 6) collision_mass
FROM b"""


def q_cdf_linearity(spark, sf_dir):
    """Learned-index feasibility audit: R² of rank-vs-key for three
    key distributions — the dense surrogate key (perfectly linear), raw
    cents (near-uniform) and squared cents (convex CDF, visibly
    sub-linear) — how well a single linear model would locate records,
    the decision input for learned-vs-btree indexing. Exact integer
    moment sums in decimal(38,0)."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    v = (
        o.select(
            F.lit("orderkey").alias("metric"),
            F.col("o_orderkey").cast("bigint").alias("k"),
        )
        .unionAll(
            o.select(
                F.lit("totalprice_cents").alias("metric"),
                cents.alias("k"),
            )
        )
        .unionAll(
            o.select(
                F.lit("price_squared").alias("metric"),
                ((cents % 100000) * (cents % 100000)).alias("k"),
            )
        )
    )
    r = v.select(
        "metric",
        "k",
        F.row_number()
        .over(Window.partitionBy("metric").orderBy("k"))
        .alias("rk"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = r.groupBy("metric").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("k").cast("decimal(38,0)").alias("sx"),
        F.sum("rk").cast("bigint").alias("sy"),
        F.sum(d38("k") * d38("k")).cast("decimal(38,0)").alias("sxx"),
        F.sum(d38("rk") * d38("rk")).cast("decimal(38,0)").alias("syy"),
        F.sum(d38("k") * d38("rk")).cast("decimal(38,0)").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy")
    den = (
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    ) * (
        nd * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy")
    )
    return m.select(
        "metric", "n", F.round(F.pow(num, 2) / den, 9).alias("r2")
    )


SQL_CDF_LINEARITY = """
WITH v AS (
  SELECT 'orderkey' metric, CAST(o_orderkey AS BIGINT) k FROM orders
  UNION ALL SELECT 'totalprice_cents',
    CAST(round(o_totalprice*100,0) AS BIGINT) FROM orders
  UNION ALL SELECT 'price_squared',
    (CAST(round(o_totalprice*100,0) AS BIGINT) % 100000)
    * (CAST(round(o_totalprice*100,0) AS BIGINT) % 100000) FROM orders),
r AS (SELECT metric, k,
        row_number() OVER (PARTITION BY metric ORDER BY k) rk FROM v),
m AS (SELECT metric, CAST(count(*) AS BIGINT) n,
        CAST(sum(k) AS HUGEINT) sx, CAST(sum(rk) AS BIGINT) sy,
        CAST(sum(CAST(k AS HUGEINT)*k) AS HUGEINT) sxx,
        CAST(sum(CAST(rk AS HUGEINT)*rk) AS HUGEINT) syy,
        CAST(sum(CAST(k AS HUGEINT)*rk) AS HUGEINT) sxy
      FROM r GROUP BY 1)
SELECT metric, n,
  round( power(CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE)*sy, 2) /
         ((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
          * (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
             - CAST(sy AS DOUBLE)*sy)), 9) r2
FROM m"""


def q_dedup_group_sizes(spark, sf_dir):
    """Near-dup cluster-size histogram: how many CC groups of each
    size the threshold graph produces (exact pair generator — the
    oracle path) — the shape that decides whether keep-one dedup or
    cluster-level re-weighting is the right policy."""
    groups = dd.dedup_groups(
        _t(spark, sf_dir, "documents"),
        0.5,
        pairs_fn=dd.ngram_jaccard_pairs,
    )
    sizes = groups.groupBy("group_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("group_size")
    )
    return sizes.groupBy("group_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups")
    )


SQL_DEDUP_GROUP_SIZES = f"""
WITH RECURSIVE
{_TRIGRAM_SQL},
common AS (SELECT a.doc_id da, b.doc_id db, count(*) c FROM sh a
           JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
pairs AS (SELECT da, db
          FROM common JOIN cnt na ON da=na.doc_id
                      JOIN cnt nb ON db=nb.doc_id
          WHERE c*1.0/(na.n + nb.n - c) >= 0.5),
sym AS (SELECT da a, db b FROM pairs UNION SELECT db, da FROM pairs),
reach(node, comp) AS (SELECT a, a FROM sym UNION
  SELECT s2.b, r.comp FROM reach r JOIN sym s2 ON s2.a = r.node),
cc AS (SELECT node, min(comp) comp FROM reach GROUP BY node),
assigned AS (SELECT d2.doc_id,
               coalesce(cc.comp, d2.doc_id) group_id
             FROM documents d2 LEFT JOIN cc ON d2.doc_id = cc.node),
sizes AS (SELECT group_id, CAST(count(*) AS BIGINT) group_size
          FROM assigned GROUP BY 1)
SELECT group_size, CAST(count(*) AS BIGINT) n_groups
FROM sizes GROUP BY 1"""


def q_logrank_test(spark, sf_dir):
    """Log-rank test between two hash arms on time-to-first-purchase
    (days since the user's first event; censored at their last event)
    — the survival-curve comparison kaplan_meier's single curve can't
    test. Per-event-time O/E/V terms are nano-quantized before the
    integer sum (order-invariant); the at-risk table joins the event
    times against the (user-grain) survival rows."""
    from llmaix_spark.operators.linking import stable_hash60_expr

    e = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("u"),
        "event_type",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            / F.lit(86400000000)
        )
        .cast("bigint")
        .alias("d"),
    )
    u = e.groupBy("u").agg(
        F.min("d").alias("t0"),
        F.max("d").alias("t_last"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("d"))
        ).alias("t_p"),
    )
    surv = u.select(
        F.when(
            stable_hash60_expr(
                F.concat(F.col("u").cast("string"), F.lit(":arm"))
            )
            % 2
            == 0,
            1,
        )
        .otherwise(0)
        .alias("g"),
        F.when(
            F.col("t_p").isNotNull(), F.col("t_p") - F.col("t0")
        )
        .otherwise(F.col("t_last") - F.col("t0"))
        .alias("t"),
        F.col("t_p").isNotNull().alias("ev"),
    ).localCheckpoint(eager=False)  # consumers: times + at-risk join
    times = surv.where("ev").select("t").distinct().withColumnRenamed(
        "t", "tt"
    )
    # event-time grid × user-grain survival rows: the grid is bounded
    # by distinct event DAYS, so the crossJoin is calendar-sized
    atrisk = (
        times.crossJoin(surv)
        .groupBy("tt")
        .agg(
            F.sum((F.col("t") >= F.col("tt")).cast("bigint"))
            .cast("bigint")
            .alias("nt"),
            F.sum(
                ((F.col("t") >= F.col("tt")) & (F.col("g") == 1)).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("n1"),
            F.sum(
                ((F.col("t") == F.col("tt")) & F.col("ev")).cast("bigint")
            )
            .cast("bigint")
            .alias("dt"),
            F.sum(
                (
                    (F.col("t") == F.col("tt"))
                    & F.col("ev")
                    & (F.col("g") == 1)
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("d1"),
        )
    )
    e1_nano = F.round(
        F.col("dt").cast("double") * F.col("n1") / F.col("nt") * 1e9, 0
    ).cast("bigint")
    v_nano = F.round(
        F.when(
            F.col("nt") > 1,
            F.col("dt").cast("double")
            * (F.col("n1").cast("double") / F.col("nt"))
            * (1 - F.col("n1").cast("double") / F.col("nt"))
            * (F.col("nt") - F.col("dt"))
            / (F.col("nt") - 1.0),
        ).otherwise(0.0)
        * 1e9,
        0,
    ).cast("bigint")
    s = atrisk.agg(
        F.sum("d1").cast("bigint").alias("o1"),
        F.sum(e1_nano).cast("bigint").alias("e1n"),
        F.sum(v_nano).cast("bigint").alias("vn"),
    )
    return s.select(
        F.col("o1").alias("observed_g1"),
        F.round(F.col("e1n") / 1e9, 6).alias("expected_g1"),
        F.round(
            (F.col("o1") - F.col("e1n") / 1e9)
            / F.sqrt(F.col("vn") / 1e9),
            6,
        ).alias("logrank_z"),
    )


SQL_LOGRANK_TEST = f"""
WITH e AS (SELECT user_id u, event_type et,
             epoch_us(ts)//86400000000 d FROM events),
u AS (SELECT u, min(d) t0, max(d) t_last,
        min(CASE WHEN et = 'purchase' THEN d END) t_p
      FROM e GROUP BY 1),
surv AS (SELECT
    CASE WHEN {_HASH60_SQL.format(v="CAST(u AS VARCHAR) || ':arm'")} % 2 = 0
         THEN 1 ELSE 0 END g,
    CASE WHEN t_p IS NOT NULL THEN t_p - t0 ELSE t_last - t0 END t,
    (t_p IS NOT NULL) ev
  FROM u),
times AS (SELECT DISTINCT t tt FROM surv WHERE ev),
atrisk AS (SELECT times.tt,
    CAST(count(*) FILTER (surv.t >= times.tt) AS BIGINT) nt,
    CAST(count(*) FILTER (surv.t >= times.tt AND g = 1) AS BIGINT) n1,
    CAST(count(*) FILTER (surv.t = times.tt AND ev) AS BIGINT) dt,
    CAST(count(*) FILTER (surv.t = times.tt AND ev AND g = 1)
         AS BIGINT) d1
  FROM times JOIN surv ON TRUE GROUP BY 1),
terms AS (SELECT d1,
    CAST(round(CAST(dt AS DOUBLE)*n1/nt * 1e9, 0) AS BIGINT) e1n,
    CAST(round(CASE WHEN nt > 1
       THEN CAST(dt AS DOUBLE)*(CAST(n1 AS DOUBLE)/nt)
            *(1-CAST(n1 AS DOUBLE)/nt)*(nt-dt)/(nt-1.0)
       ELSE 0 END * 1e9, 0) AS BIGINT) vn
  FROM atrisk),
s AS (SELECT CAST(sum(d1) AS BIGINT) o1, CAST(sum(e1n) AS BIGINT) e1n,
        CAST(sum(vn) AS BIGINT) vn FROM terms)
SELECT o1 observed_g1, round(e1n/1e9, 6) expected_g1,
  round((o1 - e1n/1e9)/sqrt(vn/1e9), 6) logrank_z
FROM s"""


def q_ratio_ci_delta(spark, sf_dir):
    """Delta-method standard error for the ratio metric
    revenue-per-order at the CUSTOMER randomization grain (the metric
    engineering trap: naive per-order variance understates the SE when
    customers are the unit): per segment, the ratio in dollars and its
    delta-method SE from exact (Σr, Σr², Σk, Σk², Σrk) customer
    moments."""
    per = (
        _t(spark, sf_dir, "orders")
        .join(
            F.broadcast(_t(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("seg"), "o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("r"),
            F.count(F.lit(1)).cast("bigint").alias("k"),
        )
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = per.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r").cast("bigint").alias("sr"),
        F.sum(d38("r") * d38("r")).cast("decimal(38,0)").alias("srr"),
        F.sum("k").cast("bigint").alias("sk"),
        F.sum(F.col("k") * F.col("k")).cast("bigint").alias("skk"),
        F.sum(d38("r") * d38("k")).cast("decimal(38,0)").alias("srk"),
    )
    ratio = F.col("sr").cast("double") / F.col("sk")
    var_num = (
        F.col("srr").cast("double")
        - F.col("sr").cast("double") * F.col("sr") / F.col("n")
        - 2.0
        * ratio
        * (
            F.col("srk").cast("double")
            - F.col("sr").cast("double") * F.col("sk") / F.col("n")
        )
        + F.pow(ratio, 2)
        * (
            F.col("skk").cast("double")
            - F.col("sk").cast("double") * F.col("sk") / F.col("n")
        )
    ) / (F.col("n") - 1.0)
    se = (
        F.sqrt(F.greatest(var_num, F.lit(0.0)) / F.col("n"))
        / (F.col("sk").cast("double") / F.col("n"))
        / 100.0
    )
    return m.select(
        "seg",
        "n",
        F.round(ratio / 100.0, 6).alias("ratio_dollars"),
        F.round(se, 6).alias("se_dollars"),
    )


SQL_RATIO_CI_DELTA = """
WITH per AS (SELECT c.c_mktsegment seg,
               CAST(sum(CAST(round(o.o_totalprice*100,0) AS BIGINT))
                    AS BIGINT) r,
               CAST(count(*) AS BIGINT) k
             FROM orders o JOIN customer c ON o.o_custkey=c.c_custkey
             GROUP BY c.c_mktsegment, o.o_custkey),
m AS (SELECT seg, CAST(count(*) AS BIGINT) n,
        CAST(sum(r) AS BIGINT) sr,
        CAST(sum(CAST(r AS HUGEINT)*r) AS HUGEINT) srr,
        CAST(sum(k) AS BIGINT) sk, CAST(sum(k*k) AS BIGINT) skk,
        CAST(sum(CAST(r AS HUGEINT)*k) AS HUGEINT) srk
      FROM per GROUP BY 1)
SELECT seg, n,
  round(CAST(sr AS DOUBLE)/sk/100.0, 6) ratio_dollars,
  round( sqrt( greatest(
      ( CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE)*sr/n
        - 2.0*(CAST(sr AS DOUBLE)/sk)
          *(CAST(srk AS DOUBLE) - CAST(sr AS DOUBLE)*sk/n)
        + power(CAST(sr AS DOUBLE)/sk, 2)
          *(CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE)*sk/n)
      ) / (n - 1.0), 0) / n ) / (CAST(sk AS DOUBLE)/n) / 100.0, 6)
    se_dollars
FROM m"""


def q_order_batching(spark, sf_dir):
    """Purchase-batching histogram: per customer, consecutive orders
    within 7 days collapse into one batch (the RLE/sessionize gap rule
    applied to ORDERS); output the batch-size distribution — how much
    demand arrives in bursts vs singletons. Two per-customer windows
    then map-side counts."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        (
            F.unix_micros(F.col("o_orderdate").cast("timestamp"))
            / F.lit(86400000000)
        )
        .cast("bigint")
        .alias("d"),
    )
    w = Window.partitionBy("ck").orderBy("d")
    s = o.select(
        "ck",
        "d",
        F.when(F.col("d") - F.lag("d").over(w) <= 7, 0)
        .otherwise(1)
        .alias("brk"),
    )
    r = s.select("ck", F.sum("brk").over(w).alias("bid"))
    b = r.groupBy("ck", "bid").agg(
        F.count(F.lit(1)).cast("bigint").alias("batch_size")
    )
    return b.groupBy("batch_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_batches")
    )


SQL_ORDER_BATCHING = """
WITH o AS (SELECT o_custkey ck, epoch_us(o_orderdate)//86400000000 d
           FROM orders),
s AS (SELECT ck, d,
        CASE WHEN d - lag(d) OVER w <= 7 THEN 0 ELSE 1 END brk
      FROM o WINDOW w AS (PARTITION BY ck ORDER BY d)),
r AS (SELECT ck, sum(brk) OVER (PARTITION BY ck ORDER BY d) bid FROM s),
b AS (SELECT ck, bid, CAST(count(*) AS BIGINT) batch_size
      FROM r GROUP BY 1,2)
SELECT batch_size, CAST(count(*) AS BIGINT) n_batches
FROM b GROUP BY 1"""


def q_token_burstiness(spark, sf_dir):
    """Church-Gale burstiness: collection frequency over document
    frequency per token (cf/df ≫ 1 = a token that clumps inside few
    docs), top-10 burstiest at df ≥ 3 — the term-weighting signal
    plain TF-IDF misses. Two counts in one groupBy."""
    from pyspark.sql import Window

    from llmaix_spark.operators.textstats import _tokens

    w = _t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("t")
    )
    st = w.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("cf"),
        F.countDistinct("doc_id").cast("bigint").alias("df"),
    )
    r = st.where(F.col("df") >= 3).select(
        "t",
        "cf",
        "df",
        F.round(F.col("cf") * 1.0 / F.col("df"), 6).alias("burstiness"),
        F.row_number()
        .over(
            Window.orderBy(
                F.desc(F.col("cf") * 1.0 / F.col("df")), F.asc("t")
            )
        )
        .alias("rk"),
    )
    return r.where(F.col("rk") <= 10).select(
        F.col("t").alias("token"), "cf", "df", "burstiness"
    )


SQL_TOKEN_BURSTINESS = r"""
WITH w AS (SELECT doc_id, unnest(list_filter(
             string_split_regex(lower(trim(text)),'\s+'),
             x->length(x)>0)) t FROM documents),
st AS (SELECT t, CAST(count(*) AS BIGINT) cf,
         CAST(count(DISTINCT doc_id) AS BIGINT) df
       FROM w GROUP BY 1),
r AS (SELECT t, cf, df, round(cf*1.0/df, 6) burstiness,
        row_number() OVER (ORDER BY cf*1.0/df DESC, t) rk
      FROM st WHERE df >= 3)
SELECT t AS token, cf, df, burstiness FROM r WHERE rk <= 10"""


def q_chunk_dedup(spark, sf_dir):
    """Sub-document dedup at the RAG-chunk grain: sliding 64/32 chunk
    hashes (chunk_sliding's contract) appearing in ≥ 2 documents — the
    index-level dedup step that stops a retrieval index serving the
    same passage twice even when the parent docs aren't near-dups."""
    from llmaix_spark.functions.arrays import bind_array
    from llmaix_spark.operators.linking import stable_hash60_expr

    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    rows = d.select(
        "doc_id",
        bind_array(
            toks,
            lambda w: F.struct(
                w.alias("w"), F.size(w).cast("bigint").alias("nt")
            ),
        ).alias("b"),
    ).select("doc_id", F.col("b.w").alias("w"), F.col("b.nt").alias("nt"))
    starts = rows.where(F.col("nt") >= 1).select(
        "doc_id",
        "w",
        "nt",
        F.explode(
            F.sequence(F.lit(1).cast("bigint"), F.col("nt"), F.lit(32))
        ).alias("st"),
    )
    end = F.least(F.col("st") + 63, F.col("nt"))
    chunk = F.concat_ws(
        " ", F.slice(F.col("w"), F.col("st"), end - F.col("st") + 1)
    )
    ch = starts.select(
        "doc_id", stable_hash60_expr(chunk).alias("chunk_hash")
    )
    g = ch.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
    )
    return g.where(F.col("n_docs") >= 2)


SQL_CHUNK_DEDUP = rf"""
WITH d AS (SELECT doc_id, list_filter(
             string_split_regex(lower(trim(text)),'\s+'),
             x->length(x)>0) w FROM documents),
n AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) nt FROM d),
starts AS (SELECT doc_id, w, nt,
             unnest(range(1, CAST(nt AS BIGINT)+1, 32)) st
           FROM n WHERE nt >= 1),
ch AS (SELECT doc_id,
         {_HASH60_SQL.format(v="array_to_string(list_slice(w, st, least(st+63, nt)), ' ')")}
           chunk_hash
       FROM starts),
g AS (SELECT chunk_hash, CAST(count(*) AS BIGINT) n_occurrences,
        CAST(count(DISTINCT doc_id) AS BIGINT) n_docs
      FROM ch GROUP BY 1)
SELECT chunk_hash, n_occurrences, n_docs FROM g WHERE n_docs >= 2"""


def q_abc_xyz_matrix(spark, sf_dir):
    """The ABC×XYZ inventory matrix: revenue class (cumulative-share
    A/B/C, abc_classification's rule) crossed with demand-variability
    class (monthly-quantity CV ≤0.5 X, ≤1.0 Y, else Z) — the 9-cell
    planning grid that decides stocking policy per part. Exact cents
    and quantity moments; the CV thresholds apply to the computed
    double identically cross-engine."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100,
                0,
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("cents")
    )
    tot = rev.agg(F.sum("cents").cast("bigint").alias("t"))
    w = Window.orderBy(F.desc("cents"), F.asc("pk")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    abc = rev.crossJoin(F.broadcast(tot)).select(
        "pk",
        F.when(
            F.round(F.sum("cents").over(w) / F.col("t"), 6) <= 0.8, "A"
        )
        .when(F.round(F.sum("cents").over(w) / F.col("t"), 6) <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    mdem = li.groupBy(
        F.col("l_partkey").alias("pk"),
        (
            F.year(F.col("l_shipdate").cast("timestamp")) * 12
            + F.month(F.col("l_shipdate").cast("timestamp"))
        )
        .cast("bigint")
        .alias("mk"),
    ).agg(
        F.sum(F.round("l_quantity", 0).cast("bigint"))
        .cast("bigint")
        .alias("q")
    )
    cv = mdem.groupBy("pk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").cast("bigint").alias("s"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("ss"),
    )
    cv_val = F.sqrt(
        F.greatest(
            (
                F.col("ss")
                - F.col("s").cast("double") * F.col("s") / F.col("n")
            )
            / (F.col("n") - 1.0),
            F.lit(0.0),
        )
    ) / (F.col("s") * 1.0 / F.col("n"))
    xyz = cv.where(F.col("n") >= 2).select(
        "pk",
        F.when(cv_val <= 0.5, "X")
        .when(cv_val <= 1.0, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )
    return abc.join(xyz, "pk").groupBy("abc_class", "xyz_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts")
    )


SQL_ABC_XYZ_MATRIX = """
WITH rev AS (SELECT l_partkey pk,
         CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100,0)
                       AS BIGINT)) AS BIGINT) cents
       FROM lineitem GROUP BY 1),
tot AS (SELECT CAST(sum(cents) AS BIGINT) t FROM rev),
abc AS (SELECT pk,
          CASE WHEN round(sum(cents) OVER (ORDER BY cents DESC, pk)*1.0
                          /(SELECT t FROM tot), 6) <= 0.8 THEN 'A'
               WHEN round(sum(cents) OVER (ORDER BY cents DESC, pk)*1.0
                          /(SELECT t FROM tot), 6) <= 0.95 THEN 'B'
               ELSE 'C' END abc_class
        FROM rev),
mdem AS (SELECT l_partkey pk,
           CAST(year(l_shipdate)*12 + month(l_shipdate) AS BIGINT) mk,
           CAST(sum(CAST(round(l_quantity,0) AS BIGINT)) AS BIGINT) q
         FROM lineitem GROUP BY 1,2),
cv AS (SELECT pk, CAST(count(*) AS BIGINT) n, CAST(sum(q) AS BIGINT) s,
         CAST(sum(q*q) AS BIGINT) ss FROM mdem GROUP BY 1),
xyz AS (SELECT pk,
          CASE WHEN sqrt(greatest((ss - CAST(s AS DOUBLE)*s/n)/(n-1.0),0))
                    /(s*1.0/n) <= 0.5 THEN 'X'
               WHEN sqrt(greatest((ss - CAST(s AS DOUBLE)*s/n)/(n-1.0),0))
                    /(s*1.0/n) <= 1.0 THEN 'Y'
               ELSE 'Z' END xyz_class
        FROM cv WHERE n >= 2)
SELECT abc.abc_class, xyz.xyz_class, CAST(count(*) AS BIGINT) n_parts
FROM abc JOIN xyz USING (pk) GROUP BY 1,2"""


def q_dup_id_distance(spark, sf_dir):
    """Id-distance spectrum of the near-dup pairs: ⌊log₂|Δid|⌋ bands —
    adjacent ids mean crawl-order duplicates (a locality-window dedup
    would catch them cheaply), scattered ids mean true re-posts that
    force the full LSH pass. The sharding-strategy signal."""
    p = dd.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), 0.5)
    return (
        p.select(
            F.floor(F.log2(F.col("doc_b") - F.col("doc_a")))
            .cast("bigint")
            .alias("log2_distance_band")
        )
        .groupBy("log2_distance_band")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


SQL_DUP_ID_DISTANCE = f"""
WITH {_TRIGRAM_SQL},
common AS (SELECT a.doc_id da, b.doc_id db, count(*) c FROM sh a
           JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
p AS (SELECT da, db
      FROM common JOIN cnt na ON da=na.doc_id JOIN cnt nb ON db=nb.doc_id
      WHERE c*1.0/(na.n + nb.n - c) >= 0.5)
SELECT CAST(floor(log2(db - da)) AS BIGINT) log2_distance_band,
       CAST(count(*) AS BIGINT) n_pairs
FROM p GROUP BY 1"""


def q_arc_elasticity(spark, sf_dir):
    """Arc price elasticity per year: the midpoint-formula elasticity
    (%Δq midpoint / %Δp midpoint) per part between consecutive years,
    summarized as the exact lower-median across parts — the temporal
    complement of discount_elasticity's cross-sectional ratio.
    Realized unit prices from exact integer (cents, qty) pairs."""
    from pyspark.sql import Window

    py = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(
            F.year(F.col("l_shipdate").cast("timestamp"))
            .cast("bigint")
            .alias("yr"),
            F.col("l_partkey").alias("pk"),
        )
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * 100,
                    0,
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("r"),
            F.sum(F.round("l_quantity", 0).cast("bigint"))
            .cast("bigint")
            .alias("q"),
        )
        .localCheckpoint(eager=False)
    )
    a = py.alias("a")
    b = py.alias("b")
    j = a.join(
        b,
        (F.col("a.yr") == F.col("b.yr") + 1)
        & (F.col("a.pk") == F.col("b.pk")),
    ).where((F.col("a.q") > 0) & (F.col("b.q") > 0)).select(
        F.col("a.yr").alias("yr"),
        F.col("a.pk").alias("pk"),
        F.col("a.r").alias("r1"),
        F.col("a.q").alias("q1"),
        F.col("b.r").alias("r0"),
        F.col("b.q").alias("q0"),
    )
    p1 = F.col("r1") * 1.0 / F.col("q1")
    p0 = F.col("r0") * 1.0 / F.col("q0")
    pdiff = p1 - p0
    e = j.where(pdiff != 0).select(
        "yr",
        "pk",
        F.round(
            ((F.col("q1") - F.col("q0")) * 1.0 / (F.col("q1") + F.col("q0")))
            / (pdiff / (p1 + p0)),
            6,
        ).alias("arc"),
    )
    w = Window.partitionBy("yr").orderBy("arc", "pk")
    r = e.select(
        "yr",
        "arc",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("yr")).alias("n"),
    )
    return r.groupBy("yr").agg(
        F.max("n").cast("bigint").alias("n_parts"),
        F.max(
            F.when(
                F.col("rk") == F.floor((F.col("n") + 1) / 2), F.col("arc")
            )
        ).alias("median_arc"),
    )


SQL_ARC_ELASTICITY = """
WITH py AS (SELECT CAST(year(l_shipdate) AS BIGINT) yr, l_partkey pk,
              CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100,0)
                            AS BIGINT)) AS BIGINT) r,
              CAST(sum(CAST(round(l_quantity,0) AS BIGINT)) AS BIGINT) q
            FROM lineitem GROUP BY 1,2),
j AS (SELECT a.yr, a.pk, a.r r1, a.q q1, b.r r0, b.q q0
      FROM py a JOIN py b ON a.yr = b.yr + 1 AND a.pk = b.pk
      WHERE a.q > 0 AND b.q > 0),
e AS (SELECT yr, pk,
        round( ((q1-q0)*1.0/(q1+q0))
               / ((r1*1.0/q1 - r0*1.0/q0)/(r1*1.0/q1 + r0*1.0/q0)), 6)
          arc
      FROM j WHERE (r1*1.0/q1 - r0*1.0/q0) <> 0),
r AS (SELECT yr, arc,
        row_number() OVER (PARTITION BY yr ORDER BY arc, pk) rk,
        count(*) OVER (PARTITION BY yr) n FROM e)
SELECT yr, CAST(max(n) AS BIGINT) n_parts,
  max(CASE WHEN rk = (n+1)//2 THEN arc END) median_arc
FROM r GROUP BY 1"""


def q_neyman_allocation(spark, sf_dir):
    """Neyman-optimal sample allocation: a 100-doc review budget split
    across languages ∝ N_h·S_h (stratum size × within-stratum std of
    doc length), integerized by largest remainder so the allocations
    sum EXACTLY to budget — the survey-sampling answer to 'where do
    audit samples buy the most variance reduction' (apportionment
    allocates by size alone; Neyman by size×spread)."""
    from pyspark.sql import Window

    m = _t(spark, sf_dir, "documents").groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("nh"),
        F.sum("n_chars").cast("bigint").alias("s1"),
        F.sum(F.col("n_chars") * F.col("n_chars"))
        .cast("bigint")
        .alias("s2"),
    )
    sh = F.round(
        F.sqrt(
            F.greatest(
                (
                    F.col("s2")
                    - F.col("s1").cast("double") * F.col("s1") / F.col("nh")
                )
                / (F.col("nh") - 1.0),
                F.lit(0.0),
            )
        ),
        9,
    )
    w = m.select("lang", "nh", sh.alias("sh")).withColumn(
        "wgt", F.col("nh") * F.col("sh")
    )
    tw = w.agg(F.sum("wgt").alias("tw"))
    q = w.crossJoin(F.broadcast(tw)).select(
        "lang",
        "nh",
        "sh",
        (100.0 * F.col("wgt") / F.col("tw")).alias("quota"),
    ).withColumn("base", F.floor("quota").cast("bigint")).withColumn(
        "rem", F.col("quota") - F.floor("quota")
    ).localCheckpoint(eager=False)
    leftover = q.agg(
        (F.lit(100) - F.sum("base")).cast("bigint").alias("leftover")
    )
    r = q.crossJoin(F.broadcast(leftover)).withColumn(
        "rk",
        F.row_number().over(Window.orderBy(F.desc("rem"), F.asc("lang"))),
    )
    return r.select(
        "lang",
        F.col("nh").alias("n_docs"),
        F.round("sh", 6).alias("stddev_chars"),
        F.round("quota", 6).alias("quota"),
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("allocation"),
    )


SQL_NEYMAN_ALLOCATION = """
WITH m AS (SELECT lang, CAST(count(*) AS BIGINT) nh,
             CAST(sum(n_chars) AS BIGINT) s1,
             CAST(sum(n_chars*n_chars) AS BIGINT) s2
           FROM documents GROUP BY 1),
sd AS (SELECT lang, nh,
         round(sqrt(greatest((s2 - CAST(s1 AS DOUBLE)*s1/nh)/(nh-1.0), 0)),
               9) sh
       FROM m),
w AS (SELECT lang, nh, sh, nh*sh wgt, sum(nh*sh) OVER () tw FROM sd),
q AS (SELECT lang, nh, sh, 100.0*wgt/tw quota,
        CAST(floor(100.0*wgt/tw) AS BIGINT) base,
        100.0*wgt/tw - floor(100.0*wgt/tw) rem FROM w),
tot AS (SELECT CAST(100 - sum(base) AS BIGINT) leftover FROM q),
r AS (SELECT lang, nh, round(sh,6) stddev_chars, quota, base, rem,
        row_number() OVER (ORDER BY rem DESC, lang) rk FROM q)
SELECT lang, nh AS n_docs, stddev_chars, round(quota, 6) quota,
  CAST(base + CASE WHEN rk <= (SELECT leftover FROM tot) THEN 1 ELSE 0 END
       AS BIGINT) allocation
FROM r"""


def q_poststrat_mean(spark, sf_dir):
    """Post-stratified mean order value: segment means re-weighted to
    the CUSTOMER-population segment shares instead of the realized
    order mix — the survey-adjustment estimate of 'what would the mean
    be if every segment ordered at its population weight'. One-row
    comparison against the raw mean."""
    per = (
        _t(spark, sf_dir, "orders")
        .join(
            F.broadcast(_t(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("s"),
        )
    )
    pop = _t(spark, sf_dir, "customer").groupBy(
        F.col("c_mktsegment").alias("seg")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("npop"))
    t = pop.agg(F.sum("npop").cast("bigint").alias("tp"))
    raw = per.agg(
        F.sum("n").cast("bigint").alias("rn"),
        F.sum("s").cast("bigint").alias("rs"),
    )
    return (
        per.join(F.broadcast(pop), "seg")
        .crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(raw))
        .agg(
            F.max("rn").cast("bigint").alias("n_orders"),
            F.round(
                F.max(F.col("rs").cast("double") / F.col("rn")) / 100.0, 6
            ).alias("raw_mean_dollars"),
            F.round(
                F.sum(
                    (F.col("npop").cast("double") / F.col("tp"))
                    * (F.col("s").cast("double") / F.col("n"))
                )
                / 100.0,
                6,
            ).alias("poststrat_mean_dollars"),
        )
    )


SQL_POSTSTRAT_MEAN = """
WITH j AS (SELECT c.c_mktsegment seg,
             CAST(round(o.o_totalprice*100,0) AS BIGINT) v
           FROM orders o JOIN customer c ON o.o_custkey=c.c_custkey),
per AS (SELECT seg, CAST(count(*) AS BIGINT) n, CAST(sum(v) AS BIGINT) s
        FROM j GROUP BY 1),
pop AS (SELECT c_mktsegment seg, CAST(count(*) AS BIGINT) npop
        FROM customer GROUP BY 1),
t AS (SELECT CAST(sum(npop) AS BIGINT) tp FROM pop),
raw AS (SELECT CAST(sum(n) AS BIGINT) n, CAST(sum(s) AS BIGINT) s FROM per)
SELECT (SELECT n FROM raw) n_orders,
  round((SELECT CAST(s AS DOUBLE)/n FROM raw)/100.0, 6) raw_mean_dollars,
  round(sum( (CAST(pop.npop AS DOUBLE)/(SELECT tp FROM t))
             * (CAST(per.s AS DOUBLE)/per.n) )/100.0, 6)
    poststrat_mean_dollars
FROM per JOIN pop USING (seg)"""


def q_avg_neighbor_degree(spark, sf_dir):
    """The knn(k) curve: average neighbor degree grouped by node
    degree on the triple graph — the decomposition behind
    degree_assortativity's single correlation (a falling curve =
    hubs attach to leaves). Degrees from one groupBy; each edge
    contributes both endpoints' degrees via broadcast joins."""
    tri = q_kg_triples(spark, sf_dir).select("subj", "obj")
    und = (
        tri.where(F.col("subj") != F.col("obj"))
        .select(
            F.least("subj", "obj").alias("a"),
            F.greatest("subj", "obj").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        .localCheckpoint(eager=False)
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("dx"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("dy"))
    ed = und.join(F.broadcast(da), "a").join(F.broadcast(db), "b")
    contrib = ed.select(
        F.col("a").alias("node"), F.col("dx").alias("d"), F.col("dy").alias("nd")
    ).unionAll(
        ed.select(
            F.col("b").alias("node"),
            F.col("dy").alias("d"),
            F.col("dx").alias("nd"),
        )
    )
    per_node = contrib.groupBy("node", "d").agg(
        F.sum("nd").cast("bigint").alias("snd"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    return per_node.groupBy(F.col("d").alias("degree")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.round(
            F.avg(F.col("snd").cast("double") / F.col("k")), 6
        ).alias("avg_neighbor_degree"),
    )


SQL_AVG_NEIGHBOR_DEGREE = f"""
WITH t AS ({SQL_KG_TRIPLES}),
ed0 AS (SELECT DISTINCT least(subj, obj) a, greatest(subj, obj) b
        FROM t WHERE subj <> obj),
deg AS (SELECT n, CAST(count(*) AS BIGINT) d FROM (
          SELECT a n FROM ed0 UNION ALL SELECT b FROM ed0) GROUP BY 1),
ed AS (SELECT ed0.a, ed0.b, da.d dx, db.d dy
       FROM ed0 JOIN deg da ON da.n = ed0.a JOIN deg db ON db.n = ed0.b),
contrib AS (SELECT a node, dx d, dy nd FROM ed
            UNION ALL SELECT b, dy, dx FROM ed),
per_node AS (SELECT node, d, CAST(sum(nd) AS BIGINT) snd,
               CAST(count(*) AS BIGINT) k
             FROM contrib GROUP BY 1,2)
SELECT d AS degree, CAST(count(*) AS BIGINT) n_nodes,
       round(avg(CAST(snd AS DOUBLE)/k), 6) avg_neighbor_degree
FROM per_node GROUP BY 1"""


def q_retention_halflife(spark, sf_dir):
    """Exponential retention fit: pooled cohort activity rates at ages
    1-6 months (cohorts with a full horizon only) regressed ln-linear;
    half-life = −ln2/slope. On a non-decaying fixture the slope comes
    out ≥ 0 and the 'half-life' flips negative — exactly the verdict
    ('no decay') the readout is for. Ages table is a 6-row literal."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        (
            F.year(F.col("o_orderdate").cast("timestamp")) * 12
            + F.month(F.col("o_orderdate").cast("timestamp"))
        )
        .cast("bigint")
        .alias("mk"),
    ).localCheckpoint(eager=False)
    f = o.groupBy("ck").agg(F.min("mk").alias("cohort"))
    mx = o.agg(F.max("mk").alias("mmax"))
    ages = spark.range(1, 7).select(F.col("id").alias("a"))
    el = (
        f.crossJoin(F.broadcast(mx))
        .where(F.col("cohort") + 6 <= F.col("mmax"))
        .crossJoin(F.broadcast(ages))
    )
    act2 = o.distinct().select(
        F.col("ck").alias("ack"), F.col("mk").alias("amk")
    )
    r = el.join(
        act2,
        (F.col("ack") == F.col("ck"))
        & (F.col("amk") == F.col("cohort") + F.col("a")),
        "left",
    ).groupBy("a").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eligible"),
        F.count("ack").cast("bigint").alias("n_active"),
    )
    rr = r.where(F.col("n_active") > 0).select(
        "a",
        F.round(
            F.log(F.col("n_active") * 1.0 / F.col("n_eligible")), 9
        ).alias("lnrate"),
    )
    ols = rr.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("a").alias("sx"),
        F.sum("lnrate").alias("sy"),
        F.sum(F.col("a") * F.col("a")).alias("sxx"),
        F.sum(F.col("a") * F.col("lnrate")).alias("sxy"),
    )
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return ols.select(
        "k",
        F.round(slope, 6).alias("slope"),
        F.round(-F.log(F.lit(2.0)) / slope, 6).alias("halflife_months"),
    )


SQL_RETENTION_HALFLIFE = """
WITH o AS (SELECT o_custkey ck,
             CAST(year(o_orderdate)*12 + month(o_orderdate) AS BIGINT) mk
           FROM orders),
f AS (SELECT ck, min(mk) cohort FROM o GROUP BY 1),
mx AS (SELECT max(mk) mmax FROM o),
el AS (SELECT f.ck, f.cohort, a.a
       FROM f, (SELECT unnest(range(1,7)) a) a, mx
       WHERE f.cohort + 6 <= mx.mmax),
act AS (SELECT DISTINCT o.ck, o.mk FROM o),
r AS (SELECT el.a, CAST(count(*) AS BIGINT) n_eligible,
        CAST(count(act.ck) AS BIGINT) n_active
      FROM el LEFT JOIN act ON act.ck = el.ck
                           AND act.mk = el.cohort + el.a
      GROUP BY 1),
rr AS (SELECT a, round(ln(n_active*1.0/n_eligible), 9) lnrate
       FROM r WHERE n_active > 0),
ols AS (SELECT CAST(count(*) AS BIGINT) k, sum(a) sx, sum(lnrate) sy,
          sum(a*a) sxx, sum(a*lnrate) sxy FROM rr)
SELECT k,
  round( (k*sxy - sx*sy)/(k*sxx - sx*sx), 6) slope,
  round( -ln(2) / ((k*sxy - sx*sy)/(k*sxx - sx*sx)), 6) halflife_months
FROM ols"""


def q_segment_comovement(spark, sf_dir):
    """Daily-revenue co-movement matrix: pairwise Pearson between
    segments over each pair's COMMON trading days (pairwise-complete
    observations — a balanced all-five panel would be empty at small
    SF) — near-zero off-diagonals mean independent demand streams,
    the portfolio-risk readout. Exact integer moment sums at the
    (day, segment) grain."""
    j = (
        _t(spark, sf_dir, "orders")
        .join(
            F.broadcast(_t(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("seg"),
            (
                F.unix_micros(F.col("o_orderdate").cast("timestamp"))
                / F.lit(86400000000)
            )
            .cast("bigint")
            .alias("d"),
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("bigint")
            .alias("v"),
        )
    )
    x = j.groupBy("seg", "d").agg(
        F.sum("v").cast("bigint").alias("cents")
    ).localCheckpoint(eager=False)
    a = x.select(
        F.col("seg").alias("sa"), "d", F.col("cents").alias("ca")
    )
    b = x.select(
        F.col("seg").alias("sb"), "d", F.col("cents").alias("cb")
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    pr = (
        a.join(b, "d")
        .where(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("ca").cast("bigint").alias("sx"),
            F.sum("cb").cast("bigint").alias("sy"),
            F.sum(d38("ca") * d38("ca")).cast("decimal(38,0)").alias("sxx"),
            F.sum(d38("cb") * d38("cb")).cast("decimal(38,0)").alias("syy"),
            F.sum(d38("ca") * d38("cb")).cast("decimal(38,0)").alias("sxy"),
        )
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy")
    den = F.sqrt(
        (
            nd * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")
        )
        * (
            nd * F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy")
        )
    )
    return pr.select(
        F.col("sa").alias("seg_a"),
        F.col("sb").alias("seg_b"),
        F.col("n").alias("n_days"),
        F.round(num / den, 6).alias("pearson"),
    )


SQL_SEGMENT_COMOVEMENT = """
WITH j AS (SELECT c.c_mktsegment seg,
             epoch_us(o.o_orderdate)//86400000000 d,
             CAST(round(o.o_totalprice*100,0) AS BIGINT) v
           FROM orders o JOIN customer c ON o.o_custkey=c.c_custkey),
x AS (SELECT seg, d, CAST(sum(v) AS BIGINT) cents FROM j GROUP BY 1,2),
pr AS (SELECT a.seg sa, b.seg sb, CAST(count(*) AS BIGINT) n,
         CAST(sum(a.cents) AS BIGINT) sx, CAST(sum(b.cents) AS BIGINT) sy,
         CAST(sum(CAST(a.cents AS HUGEINT)*a.cents) AS HUGEINT) sxx,
         CAST(sum(CAST(b.cents AS HUGEINT)*b.cents) AS HUGEINT) syy,
         CAST(sum(CAST(a.cents AS HUGEINT)*b.cents) AS HUGEINT) sxy
       FROM x a JOIN x b ON a.d = b.d AND a.seg < b.seg
       GROUP BY 1,2)
SELECT sa AS seg_a, sb AS seg_b, n AS n_days,
  round( (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE)*sy) /
         sqrt( (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
             * (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
                - CAST(sy AS DOUBLE)*sy) ), 6) pearson
FROM pr"""


def q_supplier_scorecard(spark, sf_dir):
    """Per-supplier operations scorecard: lines, exact revenue cents,
    mean order→ship latency, return rate — the multi-metric vendor
    review table (the supplier dimension's first full readout beyond
    concentration). One fact join + broadcast dim name join."""
    j = (
        _t(spark, sf_dir, "lineitem")
        .join(
            _t(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("l_suppkey").alias("sk"),
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100,
                0,
            )
            .cast("bigint")
            .alias("cents"),
            (F.col("l_returnflag") == "R").alias("ret"),
            (
                (
                    F.unix_micros(F.col("l_shipdate").cast("timestamp"))
                    / F.lit(86400000000)
                ).cast("bigint")
                - (
                    F.unix_micros(F.col("o_orderdate").cast("timestamp"))
                    / F.lit(86400000000)
                ).cast("bigint")
            ).alias("lat"),
        )
    )
    return (
        j.join(
            F.broadcast(
                _t(spark, sf_dir, "supplier").select(
                    F.col("s_suppkey").alias("sk"),
                    F.col("s_name").alias("supplier"),
                )
            ),
            "sk",
        )
        .groupBy("supplier")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
            F.round(F.avg("lat"), 6).alias("mean_latency_days"),
            F.round(
                F.sum(F.col("ret").cast("bigint")) / F.count(F.lit(1)), 6
            ).alias("return_rate"),
        )
    )


SQL_SUPPLIER_SCORECARD = """
WITH j AS (SELECT li.l_suppkey sk,
             CAST(round(li.l_extendedprice*(1-li.l_discount)*100,0)
                  AS BIGINT) cents,
             (li.l_returnflag='R') ret,
             (epoch_us(li.l_shipdate)//86400000000
              - epoch_us(o.o_orderdate)//86400000000) lat
           FROM lineitem li JOIN orders o ON li.l_orderkey = o.o_orderkey)
SELECT s.s_name supplier, CAST(count(*) AS BIGINT) n_lines,
  CAST(sum(j.cents) AS BIGINT) revenue_cents,
  round(avg(j.lat), 6) mean_latency_days,
  round(count(*) FILTER (j.ret)*1.0/count(*), 6) return_rate
FROM j JOIN supplier s ON j.sk = s.s_suppkey
GROUP BY 1"""


def q_kfold_lm_scores(spark, sf_dir):
    """K-fold cross-validated LM evaluation in ONE pass: per-fold
    held-out unigram logprob where each fold's excluded-count table is
    total − fold counts (never K separate LM fits) — the CV-stability
    readout on top of heldout_perplexity's single split. Vocab and
    token totals per exclusion come from a 5×vocab broadcast join."""
    from llmaix_spark.operators.linking import stable_hash60_expr
    from llmaix_spark.operators.textstats import _tokens

    toks = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (
            stable_hash60_expr(
                F.concat(F.col("doc_id").cast("string"), F.lit(":fold"))
            )
            % 5
        )
        .cast("bigint")
        .alias("fold"),
        F.explode(_tokens(F.col("text"))).alias("tok"),
    ).localCheckpoint(eager=False)
    tc = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_total")
    ).localCheckpoint(eager=False)
    fc = toks.groupBy("fold", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_fold")
    ).localCheckpoint(eager=False)
    folds = toks.select("fold").distinct()
    grid = folds.crossJoin(F.broadcast(tc)).join(
        F.broadcast(fc), ["fold", "tok"], "left"
    )
    excl = F.col("c_total") - F.coalesce("c_fold", F.lit(0))
    vstats = grid.groupBy("fold").agg(
        F.sum((excl > 0).cast("bigint")).cast("bigint").alias("vocab"),
        F.sum(excl).cast("bigint").alias("n"),
    )
    scored = (
        toks.join(F.broadcast(tc), "tok")
        .join(F.broadcast(fc), ["fold", "tok"], "left")
        .join(F.broadcast(vstats), "fold")
        .select(
            "fold",
            "doc_id",
            F.round(
                F.log10(
                    (excl + 1.0) / (F.col("n") + F.col("vocab") + 1)
                ),
                6,
            ).alias("lp"),
        )
    )
    return scored.groupBy("fold").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.round(F.avg("lp"), 4).alias("mean_logprob"),
    )


SQL_KFOLD_LM_SCORES = rf"""
WITH toks AS (SELECT doc_id,
        {_HASH60_SQL.format(v="CAST(doc_id AS VARCHAR) || ':fold'")} % 5
          fold,
        unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> length(x) > 0)) tok
      FROM documents),
tc AS (SELECT tok, CAST(count(*) AS BIGINT) c_total FROM toks GROUP BY 1),
fc AS (SELECT fold, tok, CAST(count(*) AS BIGINT) c_fold
       FROM toks GROUP BY 1,2),
folds AS (SELECT DISTINCT fold FROM toks),
grid AS (SELECT folds.fold, tc.tok, tc.c_total,
           coalesce(fc.c_fold, 0) c_fold
         FROM folds CROSS JOIN tc
         LEFT JOIN fc ON fc.fold = folds.fold AND fc.tok = tc.tok),
vstats AS (SELECT fold,
             CAST(count(*) FILTER (c_total - c_fold > 0) AS BIGINT) vocab,
             CAST(sum(c_total - c_fold) AS BIGINT) n
           FROM grid GROUP BY 1),
scored AS (SELECT t.fold, t.doc_id,
    round(log10((tc.c_total - coalesce(fc.c_fold, 0) + 1.0)
          / (v.n + v.vocab + 1)), 6) lp
  FROM toks t
  JOIN tc ON t.tok = tc.tok
  LEFT JOIN fc ON fc.fold = t.fold AND fc.tok = t.tok
  JOIN vstats v ON v.fold = t.fold)
SELECT CAST(fold AS BIGINT) fold,
  CAST(count(DISTINCT doc_id) AS BIGINT) n_docs,
  round(avg(lp), 4) mean_logprob
FROM scored GROUP BY 1"""


def q_hybrid_dedup(spark, sf_dir):
    """Hybrid lexical/semantic dedup: MinHash-band candidates verified
    by EMBEDDING cosine (micro-quantized exact dot products) — the
    modern two-modality pipeline (cheap lexical blocking, semantic
    confirm). On this fixture embeddings are text-independent, so
    every lexical candidate is semantically REJECTED — the operator's
    discriminating power, value-checked."""
    cand = dd.lsh_candidate_pairs(_t(spark, sf_dir, "documents"))
    qv = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * 1_000_000, 0).cast(
                "bigint"
            ),
        ).alias("qv"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    a = qv.select(F.col("vec_id").alias("doc_a"), F.col("qv").alias("qa"))
    b = qv.select(F.col("vec_id").alias("doc_b"), F.col("qv").alias("qb"))
    sc = (
        cand.join(F.broadcast(a), "doc_a")
        .join(F.broadcast(b), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.aggregate(
                F.zip_with(
                    "qa", "qb", lambda x, y: x.cast("decimal(38,0)") * y
                ),
                F.lit(0).cast("decimal(38,0)"),
                lambda acc, v: acc + v,
            ).alias("dot"),
            F.aggregate(
                F.col("qa"),
                F.lit(0).cast("decimal(38,0)"),
                lambda acc, v: acc + v.cast("decimal(38,0)") * v,
            ).alias("na"),
            F.aggregate(
                F.col("qb"),
                F.lit(0).cast("decimal(38,0)"),
                lambda acc, v: acc + v.cast("decimal(38,0)") * v,
            ).alias("nb"),
        )
    )
    cos = F.round(
        F.col("dot").cast("double")
        / (
            F.sqrt(F.col("na").cast("double"))
            * F.sqrt(F.col("nb").cast("double"))
        ),
        6,
    )
    return sc.select(
        "doc_a",
        "doc_b",
        cos.alias("emb_cosine"),
        (cos >= 0.2).alias("semantic_confirmed"),
    )


def _hybrid_dedup_sql() -> str:
    h = f"({_HASH60_SQL.format(v='s')} % {_P})"
    mins = ", ".join(
        f"min(({a} * {h} + {b}) % {_P}) AS h{i}"
        for i, (a, b) in enumerate(_MINHASH_AB)
    )
    bands = ", ".join(
        "CAST(h{} AS VARCHAR) || ':' || CAST(h{} AS VARCHAR)".format(
            b * 2, b * 2 + 1
        )
        for b in range(8)
    )
    return f"""
WITH {_TRIGRAM_SQL},
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
banded AS (SELECT doc_id, generate_subscripts(bv,1)-1 band_idx,
             unnest(bv) band_val
           FROM (SELECT doc_id, [{bands}] bv FROM sig)),
cand AS (SELECT DISTINCT a.doc_id da, b.doc_id db FROM banded a
         JOIN banded b ON a.band_idx=b.band_idx
                      AND a.band_val=b.band_val AND a.doc_id<b.doc_id),
q AS (SELECT vec_id, list_transform(embedding,
        x -> CAST(round(CAST(x AS DOUBLE)*1000000,0) AS BIGINT)) qv
      FROM embeddings),
sc AS (SELECT cand.da, cand.db,
         list_sum(list_transform(range(1, len(a.qv)+1),
           i -> CAST(a.qv[i] AS HUGEINT)*b.qv[i])) dot,
         list_sum(list_transform(a.qv, x -> CAST(x AS HUGEINT)*x)) na,
         list_sum(list_transform(b.qv, x -> CAST(x AS HUGEINT)*x)) nb
       FROM cand JOIN q a ON cand.da = a.vec_id
                 JOIN q b ON cand.db = b.vec_id)
SELECT da doc_a, db doc_b,
  round(CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))
        *sqrt(CAST(nb AS DOUBLE))), 6) emb_cosine,
  (round(CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))
         *sqrt(CAST(nb AS DOUBLE))), 6) >= 0.2) semantic_confirmed
FROM sc"""


SQL_HYBRID_DEDUP = _hybrid_dedup_sql()


def q_partial_correlation(spark, sf_dir):
    """Partial correlation r(x,y|z) for the classic corpus confound:
    chars (x) vs distinct tokens (y) controlling for token count (z) —
    raw r ≈ 0.91 collapses to ≈ 0.04 once length is partialed out, the
    textbook 'your quality signal is just length' diagnosis. Three
    Pearsons from one exact-integer moment pass."""
    from llmaix_spark.functions.arrays import bind_array
    from llmaix_spark.operators.textstats import _tokens

    b = _t(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("bigint").alias("x"),
        bind_array(
            _tokens(F.col("text")),
            lambda w: F.struct(
                F.size(F.array_distinct(w)).cast("bigint").alias("y"),
                F.size(w).cast("bigint").alias("z"),
            ),
        ).alias("s"),
    ).select("x", F.col("s.y").alias("y"), F.col("s.z").alias("z"))
    m = b.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            F.sum(expr).cast("bigint").alias(name)
            for name, expr in [
                ("sx", F.col("x")),
                ("sy", F.col("y")),
                ("sz", F.col("z")),
                ("sxx", F.col("x") * F.col("x")),
                ("syy", F.col("y") * F.col("y")),
                ("szz", F.col("z") * F.col("z")),
                ("sxy", F.col("x") * F.col("y")),
                ("sxz", F.col("x") * F.col("z")),
                ("syz", F.col("y") * F.col("z")),
            ]
        ],
    )

    def corr(sab, sa, sb, saa, sbb):
        n = F.col("n").cast("double")
        return (n * F.col(sab) - F.col(sa).cast("double") * F.col(sb)) / (
            F.sqrt(
                (n * F.col(saa) - F.col(sa).cast("double") * F.col(sa))
                * (n * F.col(sbb) - F.col(sb).cast("double") * F.col(sb))
            )
        )

    rxy = corr("sxy", "sx", "sy", "sxx", "syy")
    rxz = corr("sxz", "sx", "sz", "sxx", "szz")
    rzy = corr("syz", "sy", "sz", "syy", "szz")
    return m.select(
        "n",
        F.round(rxy, 6).alias("r_xy"),
        F.round(rxz, 6).alias("r_xz"),
        F.round(rzy, 6).alias("r_zy"),
        F.round(
            (rxy - rxz * rzy)
            / F.sqrt((1 - rxz * rxz) * (1 - rzy * rzy)),
            6,
        ).alias("r_xy_given_z"),
    )


SQL_PARTIAL_CORRELATION = r"""
WITH b AS (SELECT doc_id, CAST(n_chars AS BIGINT) x,
    CAST(len(list_distinct(list_filter(
      string_split_regex(lower(trim(text)),'\s+'),
      t->length(t)>0))) AS BIGINT) y,
    CAST(len(list_filter(string_split_regex(lower(trim(text)),'\s+'),
      t->length(t)>0)) AS BIGINT) z
  FROM documents),
m AS (SELECT CAST(count(*) AS BIGINT) n,
    CAST(sum(x) AS BIGINT) sx, CAST(sum(y) AS BIGINT) sy,
    CAST(sum(z) AS BIGINT) sz,
    CAST(sum(x*x) AS BIGINT) sxx, CAST(sum(y*y) AS BIGINT) syy,
    CAST(sum(z*z) AS BIGINT) szz,
    CAST(sum(x*y) AS BIGINT) sxy, CAST(sum(x*z) AS BIGINT) sxz,
    CAST(sum(y*z) AS BIGINT) syz
  FROM b),
r AS (SELECT n,
  (n*sxy - CAST(sx AS DOUBLE)*sy)
    /sqrt((n*sxx - CAST(sx AS DOUBLE)*sx)*(n*syy - CAST(sy AS DOUBLE)*sy))
    rxy,
  (n*sxz - CAST(sx AS DOUBLE)*sz)
    /sqrt((n*sxx - CAST(sx AS DOUBLE)*sx)*(n*szz - CAST(sz AS DOUBLE)*sz))
    rxz,
  (n*syz - CAST(sy AS DOUBLE)*sz)
    /sqrt((n*syy - CAST(sy AS DOUBLE)*sy)*(n*szz - CAST(sz AS DOUBLE)*sz))
    rzy
  FROM m)
SELECT n, round(rxy,6) r_xy, round(rxz,6) r_xz, round(rzy,6) r_zy,
  round((rxy - rxz*rzy)/sqrt((1-rxz*rxz)*(1-rzy*rzy)), 6) r_xy_given_z
FROM r"""


def q_topk_stability(spark, sf_dir):
    """Leaderboard robustness under data halving: split lineitems into
    two hash halves, rank parts by revenue in each, report top-k set
    overlap at k ∈ {20, 100, 500} — a leaderboard whose halves
    disagree is sampling noise, not signal (this fixture's uniform
    demand makes top-20 pure noise: overlap 0)."""
    from pyspark.sql import Window

    from llmaix_spark.operators.linking import stable_hash60_expr

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("pk"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
        .cast("bigint")
        .alias("cents"),
        (
            stable_hash60_expr(
                F.concat_ws(
                    ":",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                    F.lit("half"),
                )
            )
            % 2
        ).alias("half"),
    )
    rev = li.groupBy("half", "pk").agg(
        F.sum("cents").cast("bigint").alias("cents")
    )
    r = rev.select(
        "half",
        "pk",
        F.row_number()
        .over(
            Window.partitionBy("half").orderBy(
                F.desc("cents"), F.asc("pk")
            )
        )
        .alias("rk"),
    ).localCheckpoint(eager=False)
    ks = spark.range(1).select(
        F.explode(
            F.array(F.lit(20), F.lit(100), F.lit(500))
        ).alias("k")
    )
    ta = r.where(F.col("half") == 0).select("pk", F.col("rk").alias("ra"))
    tb = r.where(F.col("half") == 1).select("pk", F.col("rk").alias("rb"))
    both = ta.join(tb, "pk")
    return (
        both.crossJoin(F.broadcast(ks))
        .groupBy(F.col("k").cast("bigint").alias("k"))
        .agg(
            F.sum(
                ((F.col("ra") <= F.col("k")) & (F.col("rb") <= F.col("k")))
                .cast("bigint")
            )
            .cast("bigint")
            .alias("n_common")
        )
        .select(
            "k",
            "n_common",
            F.round(F.col("n_common") * 1.0 / F.col("k"), 6).alias(
                "stability"
            ),
        )
    )


SQL_TOPK_STABILITY = f"""
WITH li AS (SELECT l_partkey pk,
              CAST(round(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)
                cents,
              {_HASH60_SQL.format(v="CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR) || ':half'")} % 2
                half
            FROM lineitem),
rev AS (SELECT half, pk, CAST(sum(cents) AS BIGINT) cents
        FROM li GROUP BY 1,2),
r AS (SELECT half, pk,
        row_number() OVER (PARTITION BY half
                           ORDER BY cents DESC, pk) rk FROM rev),
bo AS (SELECT a.pk, a.rk ra, b.rk rb
       FROM r a JOIN r b ON a.pk = b.pk AND a.half = 0 AND b.half = 1),
ks AS (SELECT unnest([20, 100, 500]) k)
SELECT CAST(k AS BIGINT) k,
  CAST(count(*) FILTER (ra <= k AND rb <= k) AS BIGINT) n_common,
  round(count(*) FILTER (ra <= k AND rb <= k) * 1.0 / k, 6) stability
FROM ks LEFT JOIN bo ON TRUE GROUP BY k"""


def q_session_length_geom(spark, sf_dir):
    """Geometric fit of session lengths (30-min gap sessions): MLE
    p̂ = 1/mean — the one-parameter model a capacity simulation
    samples from, with the observed mean as the sanity anchor."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    s = e.withColumn(
        "new_s", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).withColumn("sid", F.sum("new_s").over(w))
    sz = s.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).cast("bigint").alias("len")
    )
    return sz.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.round(F.sum("len") * 1.0 / F.count(F.lit(1)), 6).alias(
            "mean_len"
        ),
        F.round(F.count(F.lit(1)) * 1.0 / F.sum("len"), 6).alias(
            "geom_p_hat"
        ),
    )


SQL_SESSION_LENGTH_GEOM = """
WITH x AS (SELECT user_id u, ts, event_id eid,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR date_diff('second', lag(ts) OVER w, ts) > 1800
             THEN 1 ELSE 0 END new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT u, sum(new_s) OVER (PARTITION BY u ORDER BY ts, eid) sid
      FROM x),
sz AS (SELECT u, sid, CAST(count(*) AS BIGINT) len FROM s GROUP BY 1,2),
m AS (SELECT CAST(count(*) AS BIGINT) n, CAST(sum(len) AS BIGINT) s
      FROM sz)
SELECT n n_sessions, round(s*1.0/n, 6) mean_len,
  round(n*1.0/s, 6) geom_p_hat
FROM m"""


def q_revenue_var_es(spark, sf_dir):
    """Historical 5% value-at-risk and expected shortfall of daily
    revenue: the exact ⌈0.05n⌉-th order statistic and the mean of the
    tail at or below it — the finance-risk readout on exact integer
    cents (rank window at the calendar-bounded daily grain)."""
    from pyspark.sql import Window

    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            (
                F.unix_micros(F.col("o_orderdate").cast("timestamp"))
                / F.lit(86400000000)
            )
            .cast("bigint")
            .alias("d")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    r = daily.select(
        "cents",
        F.row_number().over(Window.orderBy("cents", "d")).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    ).localCheckpoint(eager=False)
    k = F.greatest(F.ceil(0.05 * F.col("n")).cast("bigint"), F.lit(1))
    v = r.agg(
        F.max(F.when(F.col("rk") == k, F.col("cents"))).alias("var5"),
        F.max(k).cast("bigint").alias("k"),
        F.max("n").cast("bigint").alias("n"),
    )
    es = (
        r.crossJoin(F.broadcast(v.select("k")))
        .where(F.col("rk") <= F.col("k"))
        .agg(F.sum("cents").cast("bigint").alias("tail_sum"))
    )
    return v.crossJoin(F.broadcast(es)).select(
        F.col("n").alias("n_days"),
        F.col("k").alias("tail_days"),
        F.round(F.col("var5") / 100.0, 6).alias("var5_dollars"),
        F.round(F.col("tail_sum") * 1.0 / F.col("k") / 100.0, 6).alias(
            "es5_dollars"
        ),
    )


SQL_REVENUE_VAR_ES = """
WITH daily AS (SELECT epoch_us(o_orderdate)//86400000000 d,
                 CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT))
                      AS BIGINT) cents
               FROM orders GROUP BY 1),
r AS (SELECT cents, row_number() OVER (ORDER BY cents, d) rk,
        count(*) OVER () n FROM daily),
v AS (SELECT max(CASE WHEN rk = greatest(CAST(ceil(0.05*n) AS BIGINT), 1)
                 THEN cents END) var5,
        CAST(max(greatest(CAST(ceil(0.05*n) AS BIGINT), 1)) AS BIGINT) k,
        CAST(max(n) AS BIGINT) n FROM r),
es AS (SELECT CAST(sum(cents) AS BIGINT) tail_sum
       FROM r, v WHERE r.rk <= v.k)
SELECT v.n n_days, v.k tail_days,
  round(v.var5/100.0, 6) var5_dollars,
  round(es.tail_sum*1.0/v.k/100.0, 6) es5_dollars
FROM v, es"""


def q_pack_budget_sweep(spark, sf_dir):
    """Context-window budget tuning: pack counts and padding-waste
    share at budgets 128/256/512 tokens under the shard-local packing
    rule (pack_sequences' contract swept across budgets) — the table
    that picks the training sequence length. The 3-row budget grid
    crosses the (tiny) per-doc token counts; windows partition by
    (budget, shard)."""
    from pyspark.sql import Window

    from llmaix_spark.operators.textstats import _tokens

    base = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 32).cast("bigint").alias("shard"),
        F.size(_tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    bs = spark.range(1).select(
        F.explode(
            F.array(F.lit(128), F.lit(256), F.lit(512))
        ).alias("budget")
    )
    w = Window.partitionBy("budget", "shard").orderBy("doc_id")
    packed = base.crossJoin(F.broadcast(bs)).select(
        "budget",
        "shard",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens"))
            * 1.0
            / F.col("budget")
        )
        .cast("bigint")
        .alias("pack_id"),
        "n_tokens",
    )
    per = packed.groupBy("budget", "shard", "pack_id").agg(
        F.sum("n_tokens").cast("bigint").alias("fill")
    )
    return per.groupBy(F.col("budget").cast("bigint").alias("budget")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_packs"),
        F.sum("fill").cast("bigint").alias("total_tokens"),
        F.round(
            1.0
            - F.sum("fill") * 1.0 / (F.count(F.lit(1)) * F.col("budget")),
            6,
        ).alias("waste_share"),
    )


SQL_PACK_BUDGET_SWEEP = r"""
WITH base AS (SELECT doc_id, CAST(doc_id % 32 AS BIGINT) shard,
         CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> length(x) > 0)) AS BIGINT) n_tokens
       FROM documents),
bs AS (SELECT unnest([128, 256, 512]) budget),
packed AS (SELECT bs.budget, base.shard,
    CAST(floor((sum(n_tokens) OVER (PARTITION BY bs.budget, shard
                                    ORDER BY doc_id)
                - n_tokens) * 1.0 / bs.budget) AS BIGINT) pack_id,
    n_tokens
  FROM base, bs),
per AS (SELECT budget, shard, pack_id, CAST(sum(n_tokens) AS BIGINT) fill
        FROM packed GROUP BY 1,2,3)
SELECT CAST(budget AS BIGINT) budget,
  CAST(count(*) AS BIGINT) n_packs,
  CAST(sum(fill) AS BIGINT) total_tokens,
  round(1.0 - sum(fill)*1.0/(count(*)*CAST(budget AS BIGINT)), 6)
    waste_share
FROM per GROUP BY budget"""


def q_lsh_band_sweep(spark, sf_dir):
    """LSH banding tuning table from ONE signature set: the 16 shared
    MinHash functions re-banded as (b=4,r=4), (8,2) and (16,1), each
    banding's candidate count and recall of the exact J ≥ 0.5 truth —
    the precision/recall tradeoff (16 bands of 1 row floods 60× more
    candidates for the same recall here) that justifies the production
    (8,2) choice."""
    docs = _t(spark, sf_dir, "documents")
    sigs = dd.doc_minhash_signatures(docs).localCheckpoint(eager=False)
    truth = dd.ngram_jaccard_pairs(docs, 0.5).select(
        "doc_a", "doc_b"
    ).localCheckpoint(eager=False)
    n_truth = truth.agg(F.count(F.lit(1)).cast("bigint").alias("nt"))

    def cands(bands):
        r = 16 // bands
        banded = sigs.select(
            "doc_id",
            F.posexplode(
                F.array(
                    *[
                        F.concat_ws(
                            ":",
                            *[
                                F.col(f"h{i * r + j}").cast("string")
                                for j in range(r)
                            ],
                        )
                        for i in range(bands)
                    ]
                )
            ).alias("bi", "bv"),
        )
        a = banded.alias("a")
        b = banded.alias("b")
        c = (
            a.join(
                b,
                (F.col("a.bi") == F.col("b.bi"))
                & (F.col("a.bv") == F.col("b.bv"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
            .localCheckpoint(eager=False)
        )
        stats = c.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_candidates")
        )
        cap = c.join(truth, ["doc_a", "doc_b"]).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_true_captured")
        )
        return stats.crossJoin(F.broadcast(cap)).select(
            F.lit(bands).cast("bigint").alias("bands"),
            F.lit(r).cast("bigint").alias("rows_per_band"),
            "n_candidates",
            "n_true_captured",
        )

    out = cands(4).unionAll(cands(8)).unionAll(cands(16))
    return out.crossJoin(F.broadcast(n_truth)).select(
        "bands",
        "rows_per_band",
        "n_candidates",
        "n_true_captured",
        F.round(F.col("n_true_captured") * 1.0 / F.col("nt"), 6).alias(
            "recall"
        ),
    )


def _lsh_band_sweep_sql() -> str:
    h = f"({_HASH60_SQL.format(v='s')} % {_P})"
    mins = ", ".join(
        f"min(({a} * {h} + {b}) % {_P}) AS h{i}"
        for i, (a, b) in enumerate(_MINHASH_AB)
    )

    def bandsql(b):
        r = 16 // b
        vals = ", ".join(
            "||':'||".join(
                f"CAST(h{i * r + j} AS VARCHAR)" for j in range(r)
            )
            for i in range(b)
        )
        return (
            f"SELECT doc_id, generate_subscripts(bv,1)-1 bi, "
            f"unnest(bv) bv2 FROM (SELECT doc_id, [{vals}] bv FROM sig)"
        )

    return f"""
WITH {_TRIGRAM_SQL},
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
common AS (SELECT a.doc_id da, b.doc_id db, count(*) c FROM sh a
           JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1,2),
truth AS (SELECT da, db
          FROM common JOIN cnt na ON da=na.doc_id
                      JOIN cnt nb ON db=nb.doc_id
          WHERE c*1.0/(na.n+nb.n-c) >= 0.5),
b4 AS ({bandsql(4)}), b8 AS ({bandsql(8)}), b16 AS ({bandsql(16)}),
c4 AS (SELECT DISTINCT a.doc_id da, b.doc_id db FROM b4 a JOIN b4 b
       ON a.bi=b.bi AND a.bv2=b.bv2 AND a.doc_id<b.doc_id),
c8 AS (SELECT DISTINCT a.doc_id da, b.doc_id db FROM b8 a JOIN b8 b
       ON a.bi=b.bi AND a.bv2=b.bv2 AND a.doc_id<b.doc_id),
c16 AS (SELECT DISTINCT a.doc_id da, b.doc_id db FROM b16 a JOIN b16 b
        ON a.bi=b.bi AND a.bv2=b.bv2 AND a.doc_id<b.doc_id),
rows_ AS (
  SELECT 4 bands, 4 rows_per_band,
    (SELECT CAST(count(*) AS BIGINT) FROM c4) n_candidates,
    (SELECT CAST(count(*) AS BIGINT) FROM c4 JOIN truth USING (da, db))
      n_true_captured
  UNION ALL SELECT 8, 2, (SELECT count(*) FROM c8),
    (SELECT count(*) FROM c8 JOIN truth USING (da, db))
  UNION ALL SELECT 16, 1, (SELECT count(*) FROM c16),
    (SELECT count(*) FROM c16 JOIN truth USING (da, db)))
SELECT CAST(bands AS BIGINT) bands,
  CAST(rows_per_band AS BIGINT) rows_per_band,
  CAST(n_candidates AS BIGINT) n_candidates,
  CAST(n_true_captured AS BIGINT) n_true_captured,
  round(n_true_captured*1.0/(SELECT count(*) FROM truth), 6) recall
FROM rows_"""


SQL_LSH_BAND_SWEEP = _lsh_band_sweep_sql()


def q_decontam_ngram_sweep(spark, sf_dir):
    """Decontamination n-gram sensitivity: contaminated-training-doc
    counts at n ∈ {4, 8, 13} against the doc_id % 8 benchmark slice —
    published pipelines run 8-13; the sweep shows how fast the flag
    count decays with n (4-grams over-flag, long grams under-flag)."""
    from llmaix_spark.operators.curation import decontaminate

    docs = _t(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 8 != 0)
    bench = docs.where(F.col("doc_id") % 8 == 0)
    outs = []
    for n in (4, 8, 13):
        c = (
            decontaminate(train, bench, n=n)
            .agg(
                F.sum(F.col("contaminated").cast("bigint"))
                .cast("bigint")
                .alias("n_contaminated")
            )
            .select(
                F.lit(n).cast("bigint").alias("ngram_size"),
                "n_contaminated",
            )
        )
        outs.append(c)
    return outs[0].unionAll(outs[1]).unionAll(outs[2])


def _decontam_sweep_sql() -> str:
    def gramsql(n, alias):
        leads = " || ' ' || ".join(
            ["t"] + [f"lead(t, {j}) OVER win" for j in range(1, n)]
        )
        return f"""{alias}g AS (SELECT doc_id, {leads} s,
      lead(t,{n - 1}) OVER win lN
      FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
{alias} AS (SELECT DISTINCT doc_id, {_HASH60_SQL.format(v='s')} sh_h
            FROM {alias}g WHERE lN IS NOT NULL)"""

    def leg(n, alias):
        return f"""(SELECT CAST(count(DISTINCT t.doc_id) AS BIGINT)
     FROM {alias} t
     JOIN (SELECT DISTINCT sh_h FROM {alias} WHERE doc_id % 8 = 0) b
       USING (sh_h)
     WHERE t.doc_id % 8 <> 0)"""

    return f"""
WITH d AS (SELECT doc_id, string_split(trim(text), ' ') w FROM documents),
tok AS (SELECT doc_id, generate_subscripts(w, 1) i, unnest(w) t FROM d),
{gramsql(4, 'g4')},
{gramsql(8, 'g8')},
{gramsql(13, 'g13')},
r AS (
  SELECT 4 n, {leg(4, 'g4')} n_contaminated
  UNION ALL SELECT 8, {leg(8, 'g8')}
  UNION ALL SELECT 13, {leg(13, 'g13')})
SELECT CAST(n AS BIGINT) ngram_size,
  CAST(n_contaminated AS BIGINT) n_contaminated
FROM r"""


SQL_DECONTAM_NGRAM_SWEEP = _decontam_sweep_sql()


def q_dup_length_bias(spark, sf_dir):
    """Selection-bias audit of dedup: Welch z between the lengths of
    near-dup members and everyone else — a significant gap means
    dropping dups RESHAPES the length distribution (and every
    length-correlated signal) rather than thinning it uniformly."""
    docs = _t(spark, sf_dir, "documents")
    p = dd.ngram_jaccard_pairs(docs, 0.5)
    dup = (
        p.select(F.col("doc_a").alias("doc_id"))
        .unionAll(p.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("_d", F.lit(1))
    )
    lab = docs.join(F.broadcast(dup), "doc_id", "left").select(
        F.col("_d").isNotNull().alias("is_dup"),
        F.col("n_chars").cast("bigint").alias("x"),
    )
    m = lab.groupBy("is_dup").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("ss"),
    )
    pick = lambda d, c: F.max(  # noqa: E731
        F.when(F.col("is_dup") == d, F.col(c))
    )
    w = m.agg(
        pick(True, "n").alias("nd"),
        pick(True, "s").alias("sd"),
        pick(True, "ss").alias("ssd"),
        pick(False, "n").alias("nn"),
        pick(False, "s").alias("sn"),
        pick(False, "ss").alias("ssn"),
    )
    var_d = (
        F.col("ssd") - F.col("sd").cast("double") * F.col("sd") / F.col("nd")
    ) / (F.col("nd") - 1.0)
    var_n = (
        F.col("ssn") - F.col("sn").cast("double") * F.col("sn") / F.col("nn")
    ) / (F.col("nn") - 1.0)
    return w.select(
        F.col("nd").alias("n_dup"),
        F.col("nn").alias("n_nondup"),
        F.round(F.col("sd") * 1.0 / F.col("nd"), 6).alias(
            "mean_chars_dup"
        ),
        F.round(F.col("sn") * 1.0 / F.col("nn"), 6).alias(
            "mean_chars_nondup"
        ),
        F.round(
            (F.col("sd") * 1.0 / F.col("nd") - F.col("sn") * 1.0 / F.col("nn"))
            / F.sqrt(var_d / F.col("nd") + var_n / F.col("nn")),
            6,
        ).alias("welch_z"),
    )


SQL_DUP_LENGTH_BIAS = f"""
WITH {_TRIGRAM_SQL},
common AS (SELECT a.doc_id da, b.doc_id db, count(*) c FROM sh a
           JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1,2),
p AS (SELECT da, db
      FROM common JOIN cnt na ON da=na.doc_id JOIN cnt nb ON db=nb.doc_id
      WHERE c*1.0/(na.n+nb.n-c) >= 0.5),
dup AS (SELECT da doc_id FROM p UNION SELECT db FROM p),
lab AS (SELECT d2.doc_id, d2.n_chars, (dup.doc_id IS NOT NULL) is_dup
        FROM documents d2 LEFT JOIN dup USING (doc_id)),
m AS (SELECT is_dup, CAST(count(*) AS BIGINT) n,
        CAST(sum(n_chars) AS BIGINT) s,
        CAST(sum(n_chars*n_chars) AS BIGINT) ss FROM lab GROUP BY 1),
w AS (SELECT
  max(CASE WHEN is_dup THEN n END) nd,
  max(CASE WHEN is_dup THEN s END) sd,
  max(CASE WHEN is_dup THEN ss END) ssd,
  max(CASE WHEN NOT is_dup THEN n END) nn,
  max(CASE WHEN NOT is_dup THEN s END) sn,
  max(CASE WHEN NOT is_dup THEN ss END) ssn FROM m)
SELECT nd n_dup, nn n_nondup,
  round(sd*1.0/nd, 6) mean_chars_dup,
  round(sn*1.0/nn, 6) mean_chars_nondup,
  round( (sd*1.0/nd - sn*1.0/nn) /
    sqrt( ((ssd - CAST(sd AS DOUBLE)*sd/nd)/(nd-1.0))/nd
        + ((ssn - CAST(sn AS DOUBLE)*sn/nn)/(nn-1.0))/nn ), 6) welch_z
FROM w"""


def q_kfold_label_balance(spark, sf_dir):
    """CV stratification audit: per hash fold of the embeddings table,
    the min/max class share and the imbalance ratio — an unstratified
    hash fold can hand one fold 3× the share of a class (this fixture
    does), the case FOR stratified_kfold's per-stratum gating."""
    from llmaix_spark.operators.linking import stable_hash60_expr

    f = _t(spark, sf_dir, "embeddings").select(
        F.col("label").cast("bigint").alias("label_id"),
        (
            stable_hash60_expr(
                F.concat(F.col("vec_id").cast("string"), F.lit(":fold"))
            )
            % 5
        )
        .cast("bigint")
        .alias("fold"),
    )
    c = f.groupBy("fold", "label_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    t = c.groupBy("fold").agg(F.sum("n").cast("bigint").alias("nf"))
    sh = c.join(F.broadcast(t), "fold").select(
        "fold", F.round(F.col("n") * 1.0 / F.col("nf"), 6).alias("cls_share")
    )
    return sh.groupBy("fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.round(F.min("cls_share"), 6).alias("min_share"),
        F.round(F.max("cls_share"), 6).alias("max_share"),
        F.round(F.max("cls_share") / F.min("cls_share"), 6).alias(
            "imbalance_ratio"
        ),
    )


SQL_KFOLD_LABEL_BALANCE = f"""
WITH f AS (SELECT label,
             {_HASH60_SQL.format(v="CAST(vec_id AS VARCHAR) || ':fold'")} % 5
               fold
           FROM embeddings),
c AS (SELECT CAST(fold AS BIGINT) fold, CAST(label AS BIGINT) label_id,
        CAST(count(*) AS BIGINT) n FROM f GROUP BY 1,2),
t AS (SELECT fold, CAST(sum(n) AS BIGINT) nf FROM c GROUP BY 1),
sh AS (SELECT c.fold, round(c.n*1.0/t.nf, 6) cls_share
       FROM c JOIN t USING (fold))
SELECT fold, CAST(count(*) AS BIGINT) n_classes,
  round(min(cls_share), 6) min_share, round(max(cls_share), 6) max_share,
  round(max(cls_share)/min(cls_share), 6) imbalance_ratio
FROM sh GROUP BY 1"""


def q_gate_waterfall(spark, sf_dir):
    """Curation-funnel waterfall: survivors after each successive gate
    (length ≥ 100 chars → repetition ≤ 0.9 → ≥ 20 tokens) and the
    final survival rate — the stage-attribution view curation_pipeline
    composes but never reports (which gate actually bites). One scan,
    one row."""
    from llmaix_spark.functions.arrays import bind_array
    from llmaix_spark.operators.textstats import _tokens

    sig = _t(spark, sf_dir, "documents").select(
        "n_chars",
        bind_array(
            _tokens(F.col("text")),
            lambda w: F.struct(
                F.size(w).cast("bigint").alias("nt"),
                F.round(
                    1.0 - F.size(F.array_distinct(w)) * 1.0 / F.size(w), 6
                ).alias("rep"),
            ),
        ).alias("s"),
    ).select("n_chars", F.col("s.nt").alias("nt"), F.col("s.rep").alias("rep"))
    g1 = F.col("n_chars") >= 100
    g2 = g1 & (F.col("rep") <= 0.9)
    g3 = g2 & (F.col("nt") >= 20)
    return sig.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_input"),
        F.sum(g1.cast("bigint")).cast("bigint").alias("pass_length"),
        F.sum(g2.cast("bigint")).cast("bigint").alias("pass_repetition"),
        F.sum(g3.cast("bigint")).cast("bigint").alias("pass_min_tokens"),
        F.round(
            F.sum(g3.cast("bigint")) * 1.0 / F.count(F.lit(1)), 6
        ).alias("survival_rate"),
    )


SQL_GATE_WATERFALL = r"""
WITH base AS (SELECT doc_id, n_chars,
    list_filter(string_split_regex(lower(trim(text)),'\s+'),
                x->length(x)>0) w
  FROM documents),
sig AS (SELECT doc_id, n_chars, CAST(len(w) AS BIGINT) nt,
    round(1.0 - len(list_distinct(w))*1.0/len(w), 6) rep FROM base),
g AS (SELECT doc_id,
    (n_chars >= 100) g1,
    (n_chars >= 100 AND rep <= 0.9) g2,
    (n_chars >= 100 AND rep <= 0.9 AND nt >= 20) g3
  FROM sig)
SELECT CAST(count(*) AS BIGINT) n_input,
  CAST(count(*) FILTER (g1) AS BIGINT) pass_length,
  CAST(count(*) FILTER (g2) AS BIGINT) pass_repetition,
  CAST(count(*) FILTER (g3) AS BIGINT) pass_min_tokens,
  round(count(*) FILTER (g3) * 1.0 / count(*), 6) survival_rate
FROM g"""


def q_transition_stationary(spark, sf_dir):
    """Stationary distribution of the event-type Markov chain
    (5 unrolled power iterations over the dimension-bounded
    transition matrix) — "where does a user timeline spend its time
    in the long run", the summary events_transitions' per-edge view
    can't answer. BIGINT nano-probability state with per-term
    rounding and per-iteration renormalization, so the value is
    bit-identical at any partitioning and the DuckDB oracle unrolls
    the same five iterations term for term."""
    from llmaix_spark.operators.events import stationary_distribution

    return stationary_distribution(_t(spark, sf_dir, "events"), iterations=5)


def _stationary_iter_sql(i: int) -> str:
    return f""",
r{i} AS (SELECT dst,
           CAST(sum(CAST(round(nano * p, 0) AS BIGINT)) AS BIGINT) raw
         FROM tp JOIN v{i - 1} ON tp.src = v{i - 1}.state GROUP BY dst),
m{i} AS (SELECT sum(raw) m FROM r{i}),
v{i} AS (SELECT state,
           CAST(round(coalesce(raw, 0) * (1e9 / (SELECT m FROM m{i})), 0)
                AS BIGINT) nano
         FROM states LEFT JOIN r{i} ON states.state = r{i}.dst)"""


SQL_TRANSITION_STATIONARY = (
    """
WITH e AS (SELECT user_id u, epoch_us(ts) us, event_id eid,
                  event_type src FROM events),
seq AS (SELECT u, src,
               lead(src) OVER (PARTITION BY u ORDER BY us, eid) dst
        FROM e),
pairs AS (SELECT src, dst, CAST(count(*) AS BIGINT) n FROM seq
          WHERE dst IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT src, sum(n) t FROM pairs GROUP BY 1),
tp AS (SELECT pairs.src, dst, n * 1.0 / t AS p
       FROM pairs JOIN tot USING (src)),
states AS (SELECT DISTINCT event_type AS state FROM events),
v0 AS (SELECT state,
         CAST(floor(1e9 / (SELECT count(*) FROM states) + 0.5) AS BIGINT)
           nano
       FROM states)"""
    + "".join(_stationary_iter_sql(i) for i in (1, 2, 3, 4, 5))
    + """
SELECT state, ((nano + 500) // 1000) / 1e6 AS stationary_p FROM v5"""
)


def q_hits_bipartite(spark, sf_dir):
    """HITS authority scores for parts over the customer→part
    purchase bipartite graph (2 unrolled iterations, L1-normalized)
    — hub/authority duality PageRank's single-score view collapses.
    Same BIGINT nano-unit discipline as transition_stationary: exact
    bigint contribution sums, 1-row mass broadcast per
    half-iteration, bit-identical at any partitioning."""
    from llmaix_spark.operators.graph import hits

    e = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("hub"),
            F.col("l_partkey").cast("bigint").alias("auth"),
        )
    )
    return hits(e, iterations=2)


def _hits_iter_sql(i: int) -> str:
    return f""",
h{i}r AS (SELECT h, CAST(sum(nano) AS BIGINT) raw
          FROM e JOIN a{i - 1} USING (a) GROUP BY h),
h{i}m AS (SELECT sum(raw) m FROM h{i}r),
h{i} AS (SELECT h,
           CAST(round(raw * (1e9 / (SELECT m FROM h{i}m)), 0) AS BIGINT)
             nano
         FROM h{i}r),
a{i}r AS (SELECT a, CAST(sum(nano) AS BIGINT) raw
          FROM e JOIN h{i} USING (h) GROUP BY a),
a{i}m AS (SELECT sum(raw) m FROM a{i}r),
a{i} AS (SELECT a,
           CAST(round(raw * (1e9 / (SELECT m FROM a{i}m)), 0) AS BIGINT)
             nano
         FROM a{i}r)"""


SQL_HITS_BIPARTITE = (
    """
WITH e AS (SELECT DISTINCT o_custkey h, CAST(l_partkey AS BIGINT) a
           FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
a0 AS (SELECT DISTINCT a, CAST(1000000000 AS BIGINT) nano FROM e)"""
    + "".join(_hits_iter_sql(i) for i in (1, 2))
    + """
SELECT a AS auth_id, ((nano + 500) // 1000) / 1e6 AS authority FROM a2"""
)


def q_dedup_keep_policy(spark, sf_dir):
    """Representative-selection policy sweep over the near-dup
    clusters (LSH default path): for keep-min-id / keep-max-id /
    keep-longest, how many chars the retained corpus keeps vs drops.
    The cluster table is computed ONCE; the three policies are three
    aggregates over the same per-group rollup (min_by/max_by/max on
    a scalar key — DuckDB's min_by rejects struct keys), and the
    1-row totals are localCheckpointed so the LSH+CC body never
    re-executes per policy row."""
    docs = _t(spark, sf_dir, "documents")
    g = (
        dd.dedup_groups(docs, 0.5)
        .select("doc_id", "group_id")
        .join(docs.select("doc_id", "n_chars"), "doc_id")
    )
    pg = g.groupBy("group_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min_by("n_chars", "doc_id").cast("bigint").alias("chars_min_id"),
        F.max_by("n_chars", "doc_id").cast("bigint").alias("chars_max_id"),
        F.max("n_chars").cast("bigint").alias("chars_longest"),
    )
    t = pg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("total_chars").cast("bigint").alias("total_chars"),
        F.sum("chars_min_id").cast("bigint").alias("k_min"),
        F.sum("chars_max_id").cast("bigint").alias("k_max"),
        F.sum("chars_longest").cast("bigint").alias("k_long"),
    ).localCheckpoint(eager=True)
    rows = []
    for policy, kept in (
        ("min_id", "k_min"),
        ("max_id", "k_max"),
        ("longest", "k_long"),
    ):
        rows.append(
            t.select(
                F.lit(policy).alias("policy"),
                "n_groups",
                "n_docs",
                F.col(kept).alias("kept_chars"),
                (F.col("total_chars") - F.col(kept))
                .cast("bigint")
                .alias("removed_chars"),
                F.round(F.col(kept) * 1.0 / F.col("total_chars"), 6).alias(
                    "kept_share"
                ),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


SQL_DEDUP_KEEP_POLICY = f"""
WITH RECURSIVE {_minhash_pairs_ctes()},
sym AS (SELECT da a, db b FROM mh_pairs UNION SELECT db, da FROM mh_pairs),
reach(node, comp) AS (
  SELECT a, a FROM sym
  UNION
  SELECT s.b, r.comp FROM reach r JOIN sym s ON s.a = r.node),
cc AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node),
g AS (SELECT d.doc_id, coalesce(cc.comp, d.doc_id) gid, d.n_chars
      FROM documents d LEFT JOIN cc ON d.doc_id = cc.node),
pg AS (SELECT gid, CAST(count(*) AS BIGINT) n_docs,
         CAST(sum(n_chars) AS BIGINT) total_chars,
         CAST(min_by(n_chars, doc_id) AS BIGINT) chars_min_id,
         CAST(max_by(n_chars, doc_id) AS BIGINT) chars_max_id,
         CAST(max(n_chars) AS BIGINT) chars_longest
       FROM g GROUP BY gid),
t AS (SELECT CAST(count(*) AS BIGINT) n_groups,
        CAST(sum(n_docs) AS BIGINT) n_docs,
        CAST(sum(total_chars) AS BIGINT) total_chars,
        CAST(sum(chars_min_id) AS BIGINT) k_min,
        CAST(sum(chars_max_id) AS BIGINT) k_max,
        CAST(sum(chars_longest) AS BIGINT) k_long
      FROM pg)
SELECT 'min_id' AS policy, n_groups, n_docs, k_min kept_chars,
       CAST(total_chars - k_min AS BIGINT) removed_chars,
       round(k_min * 1.0 / total_chars, 6) kept_share FROM t
UNION ALL
SELECT 'max_id', n_groups, n_docs, k_max,
       CAST(total_chars - k_max AS BIGINT),
       round(k_max * 1.0 / total_chars, 6) FROM t
UNION ALL
SELECT 'longest', n_groups, n_docs, k_long,
       CAST(total_chars - k_long AS BIGINT),
       round(k_long * 1.0 / total_chars, 6) FROM t"""


def q_split_dup_leakage(spark, sf_dir):
    """Near-dup pairs straddling the train/val/test hash split — the
    leakage decontaminate can't see (dup-vs-benchmark) but a model
    eval bleeds on (train-vs-heldout near-dups). Exact Jaccard pair
    generator (oracle path) joined twice against the broadcast split
    projection; pair class normalized with least/greatest so
    (train,test) and (test,train) collapse."""
    from llmaix_spark.operators.curation import dataset_split

    docs = _t(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(docs, 0.5)
    sp = dataset_split(docs)
    sa = sp.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    sb = sp.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    return (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            F.least("sa", "sb").alias("split_lo"),
            F.greatest("sa", "sb").alias("split_hi"),
        )
        .groupBy("split_lo", "split_hi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .select(
            "split_lo",
            "split_hi",
            "n_pairs",
            (F.col("split_lo") != F.col("split_hi")).alias("is_leak"),
        )
    )


_SPLIT_CASE_SQL = (
    "CASE WHEN "
    + _HASH60_SQL.format(v="CAST(doc_id AS VARCHAR) || ':split'")
    + " % 10000 < 9000 THEN 'train' WHEN "
    + _HASH60_SQL.format(v="CAST(doc_id AS VARCHAR) || ':split'")
    + " % 10000 < 9500 THEN 'val' ELSE 'test' END"
)

SQL_SPLIT_DUP_LEAKAGE = f"""
WITH {_TRIGRAM_SQL},
common AS (SELECT a.doc_id da, b.doc_id db, count(*) c FROM sh a
           JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
p AS (SELECT da, db
      FROM common JOIN cnt na ON da = na.doc_id JOIN cnt nb ON db = nb.doc_id
      WHERE c * 1.0 / (na.n + nb.n - c) >= 0.5),
sp AS (SELECT doc_id, {_SPLIT_CASE_SQL} s FROM documents),
cls AS (SELECT least(sa.s, sb.s) split_lo, greatest(sa.s, sb.s) split_hi
        FROM p JOIN sp sa ON p.da = sa.doc_id JOIN sp sb ON p.db = sb.doc_id)
SELECT split_lo, split_hi, CAST(count(*) AS BIGINT) n_pairs,
       (split_lo <> split_hi) is_leak
FROM cls GROUP BY 1, 2"""


def q_multiple_testing_fdr(spark, sf_dir):
    """Benjamini-Hochberg step-up over 25 per-nation two-proportion
    z-tests (URGENT-order share vs rest-of-world) — the
    multiple-testing correction the per-segment z-tests
    (ab_count_ztest family) need before anyone reads 25 p-values.
    Φ via the Abramowitz-Stegun 7.1.26 erf polynomial written with
    IDENTICAL operation order in both engines; p rounded 8dp before
    ranking; BH rejection = cummax of the per-rank indicator over
    the exact reverse ordering. Scale: all windows at the bounded
    25-nation grain; dims broadcast."""
    from pyspark.sql import Window

    r = (
        _t(spark, sf_dir, "orders")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "customer").select(
                    "c_custkey", "c_nationkey"
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum((F.col("o_orderpriority") == "1-URGENT").cast("bigint"))
            .cast("bigint")
            .alias("u"),
        )
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = r.select(
        "nation",
        "n",
        "u",
        F.sum("n").over(wall).alias("tn"),
        F.sum("u").over(wall).alias("tu"),
    )
    p1 = F.col("u") * 1.0 / F.col("n")
    p2 = (F.col("tu") - F.col("u")) * 1.0 / (F.col("tn") - F.col("n"))
    pp = F.col("tu") * 1.0 / F.col("tn")
    z = (p1 - p2) / F.sqrt(
        pp * (1.0 - pp)
        * (1.0 / F.col("n") + 1.0 / (F.col("tn") - F.col("n")))
    )
    x = F.abs(z) / math.sqrt(2.0)
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = (
        (((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
         - 0.284496736) * t + 0.254829592
    ) * t
    pval = F.round(poly * F.exp(-x * x), 8)  # = 2*(1-Φ(|z|)) = 1-erf(x)
    s = r.select(
        "nation",
        F.col("n").alias("n_orders"),
        F.col("u").alias("n_urgent"),
        F.round(z, 6).alias("z_stat"),
        pval.alias("p_value"),
    )
    wrank = Window.orderBy("p_value", "nation")
    wrev = Window.orderBy(
        F.col("p_value").desc(), F.col("nation").desc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = s.select(
        "*",
        F.row_number().over(wrank).cast("bigint").alias("p_rank"),
        F.count(F.lit(1)).over(wall).alias("m"),
    )
    ind = (
        F.col("p_value") <= F.col("p_rank") * 0.05 / F.col("m")
    ).cast("int")
    return s.select(
        "nation",
        "n_orders",
        "n_urgent",
        "z_stat",
        "p_value",
        "p_rank",
        (F.max(ind).over(wrev) == 1).alias("rejected"),
    )


SQL_MULTIPLE_TESTING_FDR = """
WITH r AS (
  SELECT n_name nation, CAST(count(*) AS BIGINT) n,
         CAST(count(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT) u
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1),
w AS (SELECT nation, n, u, sum(n) OVER () tn, sum(u) OVER () tu FROM r),
z AS (SELECT nation, n n_orders, u n_urgent,
        (u*1.0/n - (tu-u)*1.0/(tn-n)) /
          sqrt( (tu*1.0/tn) * (1.0 - tu*1.0/tn)
                * (1.0/n + 1.0/(tn-n)) ) zv
      FROM w),
e AS (SELECT nation, n_orders, n_urgent, zv, abs(zv)/sqrt(2.0) x FROM z),
t AS (SELECT *, 1.0/(1.0 + 0.3275911*x) tt FROM e),
pv AS (SELECT nation, n_orders, n_urgent, round(zv, 6) z_stat,
         round(((((1.061405429*tt - 1.453152027)*tt + 1.421413741)*tt
                 - 0.284496736)*tt + 0.254829592)*tt * exp(-x*x), 8)
           p_value
       FROM t),
rk AS (SELECT *,
         CAST(row_number() OVER (ORDER BY p_value, nation) AS BIGINT) p_rank,
         count(*) OVER () m
       FROM pv)
SELECT nation, n_orders, n_urgent, z_stat, p_value, p_rank,
       (max(CASE WHEN p_value <= p_rank * 0.05 / m THEN 1 ELSE 0 END)
          OVER (ORDER BY p_value DESC, nation DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1)
         rejected
FROM rk"""


def q_pii_scan(spark, sf_dir):
    """Corpus PII density scan per language: email / phone / long-id
    regex hits over the documents (with a deterministic synthetic
    PII footer injected for doc_id % 7 / % 11 so the fixture
    actually exercises the patterns — same injection on both sides,
    like redaction_metrics' mask injection). One scan, no joins; the
    patterns avoid constructs where Java (leftmost-first) and RE2
    (leftmost-longest) could disagree on match COUNT."""
    d = _t(spark, sf_dir, "documents")
    email_footer = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.lit(" reach me at user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com"),
        ),
    ).otherwise("")
    phone_footer = F.when(
        F.col("doc_id") % 11 == 0,
        F.concat(
            F.lit(" call +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise("")
    full = F.lower(F.concat(F.col("text"), email_footer, phone_footer))
    emails = F.regexp_count(
        full, F.lit(r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}")
    )
    phones = F.regexp_count(full, F.lit(r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"))
    longids = F.regexp_count(full, F.lit(r"[0-9]{9,}"))
    s = d.select(
        "lang",
        emails.cast("bigint").alias("e"),
        phones.cast("bigint").alias("p"),
        longids.cast("bigint").alias("l"),
    )
    return s.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(((F.col("e") + F.col("p")) > 0).cast("bigint"))
        .cast("bigint")
        .alias("docs_with_pii"),
        F.sum("e").cast("bigint").alias("n_emails"),
        F.sum("p").cast("bigint").alias("n_phones"),
        F.sum("l").cast("bigint").alias("n_long_ids"),
        F.round(
            (F.sum("e") + F.sum("p")) * 1.0 / F.count(F.lit(1)), 6
        ).alias("pii_per_doc"),
    )


SQL_PII_SCAN = r"""
WITH f AS (
  SELECT lang,
    lower(text ||
      CASE WHEN doc_id % 7 = 0
           THEN ' reach me at user' || CAST(doc_id AS VARCHAR)
                || '@mail.example.com' ELSE '' END ||
      CASE WHEN doc_id % 11 = 0
           THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR),
                                        4, '0') ELSE '' END) full_text
  FROM documents),
s AS (
  SELECT lang,
    CAST(len(regexp_extract_all(full_text,
      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) e,
    CAST(len(regexp_extract_all(full_text,
      '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) p,
    CAST(len(regexp_extract_all(full_text, '[0-9]{9,}')) AS BIGINT) l
  FROM f)
SELECT lang, CAST(count(*) AS BIGINT) n_docs,
  CAST(count(*) FILTER (e + p > 0) AS BIGINT) docs_with_pii,
  CAST(sum(e) AS BIGINT) n_emails,
  CAST(sum(p) AS BIGINT) n_phones,
  CAST(sum(l) AS BIGINT) n_long_ids,
  round((sum(e) + sum(p)) * 1.0 / count(*), 6) pii_per_doc
FROM s GROUP BY lang"""


def q_bloom_filter_fpr(spark, sf_dir):
    """Bloom-filter join-pruning simulation: build an m=16384-bit,
    k=3 bloom over the urgent orderkeys, probe with every other
    orderkey, and report the OBSERVED false-positive rate next to the
    (1 - e^(-kn/m))^k textbook estimate — the measurement that sizes
    a bloom-pruned shuffle join (runtime row-level filtering) at
    100 TB. Hash = the shared cross-engine md5-60bit, salted per hash
    function, so both engines build the identical bitmap. The bit set
    is bounded by m regardless of data size → always broadcastable;
    the probe side needs one narrow projection + one broadcast join."""
    from llmaix_spark.operators.linking import stable_hash60_expr

    m, k = 16384, 3
    orders = _t(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    hashes = F.explode(
        F.array(*[F.lit(i) for i in range(1, k + 1)])
    ).alias("i")
    pos = F.pmod(
        stable_hash60_expr(
            F.concat(
                F.col("k").cast("string"),
                F.lit(":bloom"),
                F.col("i").cast("string"),
            )
        ),
        F.lit(m),
    ).alias("pos")
    build = orders.where(urgent).select(F.col("o_orderkey").alias("k"))
    probe = orders.where(~urgent).select(F.col("o_orderkey").alias("k"))
    bits = (
        build.select("k", hashes).select(pos).distinct()
        .localCheckpoint(eager=True)
    )
    probe_hits = (
        probe.select("k", hashes)
        .select("k", pos)
        .join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("k")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("hits"))
    )
    counts = probe_hits.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probe"),
        F.sum((F.col("hits") == k).cast("bigint"))
        .cast("bigint")
        .alias("n_fp"),
    )
    nb = build.agg(F.count(F.lit(1)).cast("bigint").alias("n_build"))
    bs = bits.agg(F.count(F.lit(1)).cast("bigint").alias("bits_set"))
    return (
        counts.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(bs))
        .select(
            "n_build",
            "n_probe",
            "bits_set",
            "n_fp",
            F.round(F.col("n_fp") * 1.0 / F.col("n_probe"), 6).alias("fpr"),
            F.round(
                F.pow(
                    1.0 - F.exp(-(F.lit(float(k)) * F.col("n_build")) / m),
                    F.lit(float(k)),
                ),
                6,
            ).alias("theo_fpr"),
        )
    )


_BLOOM_POS_SQL = (
    "("
    + _HASH60_SQL.format(
        v="CAST(k AS VARCHAR) || ':bloom' || CAST(i AS VARCHAR)"
    )
    + " % 16384)"
)

SQL_BLOOM_FILTER_FPR = f"""
WITH b AS (SELECT o_orderkey k FROM orders
           WHERE o_orderpriority = '1-URGENT'),
p AS (SELECT o_orderkey k FROM orders
      WHERE o_orderpriority <> '1-URGENT'),
bits AS (SELECT DISTINCT {_BLOOM_POS_SQL} pos
         FROM b CROSS JOIN (SELECT unnest([1, 2, 3]) i)),
pp AS (SELECT k, {_BLOOM_POS_SQL} pos
       FROM p CROSS JOIN (SELECT unnest([1, 2, 3]) i)),
ph AS (SELECT pp.k,
              sum(CASE WHEN bits.pos IS NULL THEN 0 ELSE 1 END) hits
       FROM pp LEFT JOIN bits ON pp.pos = bits.pos GROUP BY pp.k),
c AS (SELECT CAST(count(*) AS BIGINT) n_probe,
             CAST(sum(CASE WHEN hits = 3 THEN 1 ELSE 0 END) AS BIGINT) n_fp
      FROM ph)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM b) n_build,
       n_probe,
       (SELECT CAST(count(*) AS BIGINT) FROM bits) bits_set,
       n_fp,
       round(n_fp * 1.0 / n_probe, 6) fpr,
       round(power(1.0 - exp(-(3.0 * (SELECT count(*) FROM b)) / 16384),
                   3.0), 6) theo_fpr
FROM c"""


_SHAPLEY_PLAYERS = ["click", "error", "signup", "view"]


def q_shapley_attribution(spark, sf_dir):
    """Exact Shapley-value channel attribution for purchase
    conversion over the 4 non-purchase event types. Coalition value
    v(S) = conversion rate among users whose observed channel set is
    COVERED by S (v = 0 when S covers nobody) — the standard
    cooperative-game reading of "what S alone supports". With 4
    players the 16 coalitions are enumerable exactly (no sampling):
    user masks fold to a ≤16-row table, every later stage is
    dimension-bounded and broadcast. Value discipline: v in BIGINT
    nano-units, the 8 weighted marginals per player summed as exact
    integers (weights ×24 are integers: 6,2,2,6), one final division
    — partition-proof and oracle-identical."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv"),
        *[
            F.max((F.col("event_type") == t).cast("int")).alias(f"b{i}")
            for i, t in enumerate(_SHAPLEY_PLAYERS)
        ],
    )
    mask = sum(
        F.col(f"b{i}") * (2**i) for i in range(len(_SHAPLEY_PLAYERS))
    )
    ms = (
        per_user.select(mask.alias("mask"), "conv")
        .groupBy("mask")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("conv").cast("bigint").alias("c"),
        )
        .localCheckpoint(eager=True)
    )
    coal = spark.range(16).select(F.col("id").cast("int").alias("S"))
    v = (
        ms.crossJoin(F.broadcast(coal))
        .where(F.expr("(mask & (15 - S)) = 0"))
        .groupBy("S")
        .agg(
            F.sum("n").alias("cn"),
            F.sum("c").alias("cc"),
        )
    )
    v = (
        coal.join(F.broadcast(v), "S", "left")
        .select(
            "S",
            F.when(
                F.coalesce(F.col("cn"), F.lit(0)) > 0,
                F.round(F.col("cc") * 1e9 / F.col("cn"), 0),
            )
            .otherwise(0)
            .cast("bigint")
            .alias("v_nano"),
        )
        .localCheckpoint(eager=True)
    )
    players = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_SHAPLEY_PLAYERS)],
        "bit int, channel string",
    )
    base = players.join(
        F.broadcast(v), F.expr("(S & cast(pow(2, bit) as int)) = 0")
    )
    with_i = v.select(
        F.col("S").alias("S2"), F.col("v_nano").alias("v2_nano")
    )
    # weight(|S|) * 4! for p=4: |S|! * (3-|S|)! = 6, 2, 2, 6
    w24 = (
        F.when(F.expr("bit_count(S)") == 0, 6)
        .when(F.expr("bit_count(S)") == 1, 2)
        .when(F.expr("bit_count(S)") == 2, 2)
        .otherwise(6)
        .cast("bigint")
    )
    phi = (
        base.join(
            F.broadcast(with_i),
            F.expr("S2 = S + cast(pow(2, bit) as int)"),
        )
        .select(
            "channel",
            (w24 * (F.col("v2_nano") - F.col("v_nano"))).alias("term"),
        )
        .groupBy("channel")
        .agg(F.sum("term").alias("t24"))
    )
    nu = (
        ms.crossJoin(F.broadcast(players))
        .where(F.expr("(mask & cast(pow(2, bit) as int)) <> 0"))
        .groupBy("channel")
        .agg(F.sum("n").cast("bigint").alias("n_users"))
    )
    return (
        phi.join(F.broadcast(nu), "channel")
        .select(
            "channel",
            "n_users",
            F.round(F.col("t24") / (24.0 * 1e9), 6).alias("phi_shapley"),
        )
    )


SQL_SHAPLEY_ATTRIBUTION = """
WITH pu AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) conv,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) b0,
         max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) b1,
         max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) b2,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) b3
  FROM events GROUP BY user_id),
ms AS (SELECT b0 + b1*2 + b2*4 + b3*8 AS mask,
              CAST(count(*) AS BIGINT) n, CAST(sum(conv) AS BIGINT) c
       FROM pu GROUP BY 1),
coal AS (SELECT CAST(range AS INTEGER) S FROM range(16)),
cov AS (SELECT S, sum(n) cn, sum(c) cc
        FROM coal JOIN ms ON (mask & (15 - S)) = 0 GROUP BY S),
v AS (SELECT coal.S,
        CAST(CASE WHEN coalesce(cn, 0) > 0
                  THEN round(cc * 1e9 / cn, 0) ELSE 0 END AS BIGINT) v_nano
      FROM coal LEFT JOIN cov ON coal.S = cov.S),
players AS (SELECT * FROM (VALUES (0, 'click'), (1, 'error'),
                                  (2, 'signup'), (3, 'view')) p(bit, channel)),
terms AS (
  SELECT channel,
         (CASE bit_count(a.S) WHEN 0 THEN 6 WHEN 1 THEN 2
                              WHEN 2 THEN 2 ELSE 6 END)
           * (b.v_nano - a.v_nano) term
  FROM players
  JOIN v a ON (a.S & CAST(power(2, bit) AS INTEGER)) = 0
  JOIN v b ON b.S = a.S + CAST(power(2, bit) AS INTEGER)),
phi AS (SELECT channel, sum(term) t24 FROM terms GROUP BY 1),
nu AS (SELECT channel, CAST(sum(n) AS BIGINT) n_users
       FROM ms JOIN players ON (mask & CAST(power(2, bit) AS INTEGER)) <> 0
       GROUP BY 1)
SELECT phi.channel, n_users, round(t24 / (24.0 * 1e9), 6) phi_shapley
FROM phi JOIN nu ON phi.channel = nu.channel"""


def q_changepoint_detection(spark, sf_dir):
    """Best single changepoint in the daily order-count series by
    exact SSE minimization (binary-segmentation step 1): for every
    split point, SSE_left + SSE_right from integer prefix sums —
    O(n) over the calendar-bounded daily grain, not O(n²). Argmin on
    the 6dp-ROUNDED SSE with the earlier day winning ties, so both
    engines pick the same split. The daily rollup is one
    map-side-combinable aggregate; everything after runs at ~10³
    rows (a calendar dimension, same exemption as acf_daily)."""
    from pyspark.sql import Window

    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    wcum = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = daily.select(
        "d",
        F.row_number().over(Window.orderBy("d")).cast("bigint").alias("i"),
        F.sum("y").over(wcum).alias("cs"),
        F.sum(F.col("y") * F.col("y")).over(wcum).alias("css"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("nn"),
        F.sum("y").over(wall).alias("ts"),
        F.sum(F.col("y") * F.col("y")).over(wall).alias("tss"),
    )
    sse = (
        F.col("css") - F.col("cs") * F.col("cs") / F.col("i")
    ) + (
        (F.col("tss") - F.col("css"))
        - (F.col("ts") - F.col("cs"))
        * (F.col("ts") - F.col("cs"))
        / (F.col("nn") - F.col("i"))
    )
    cand = cum.where(F.col("i") < F.col("nn")).select(
        "d", "i", "cs", "nn", "ts", "tss",
        F.round(sse, 6).alias("sse_split"),
    )
    return (
        cand.orderBy("sse_split", "d")
        .limit(1)
        .select(
            F.col("d").alias("split_day"),
            F.col("nn").alias("n_days"),
            F.col("i").alias("n_left"),
            F.round(F.col("cs") * 1.0 / F.col("i"), 6).alias("mean_left"),
            F.round(
                (F.col("ts") - F.col("cs")) * 1.0 / (F.col("nn") - F.col("i")),
                6,
            ).alias("mean_right"),
            F.round(
                F.col("tss") - F.col("ts") * F.col("ts") / F.col("nn"), 6
            ).alias("sse_total"),
            F.col("sse_split").alias("sse_best"),
            F.round(
                1.0
                - F.col("sse_split")
                / (F.col("tss") - F.col("ts") * F.col("ts") / F.col("nn")),
                6,
            ).alias("reduction"),
        )
    )


SQL_CHANGEPOINT_DETECTION = """
WITH daily AS (SELECT CAST(o_orderdate AS DATE) d,
                      CAST(count(*) AS BIGINT) y
               FROM orders GROUP BY 1),
cum AS (SELECT d,
          CAST(row_number() OVER (ORDER BY d) AS BIGINT) i,
          sum(y) OVER (ORDER BY d) cs,
          sum(y * y) OVER (ORDER BY d) css,
          CAST(count(*) OVER () AS BIGINT) nn,
          sum(y) OVER () ts,
          sum(y * y) OVER () tss
        FROM daily),
cand AS (SELECT d, i, cs, nn, ts, tss,
           round((css - cs * cs / i)
                 + ((tss - css) - (ts - cs) * (ts - cs) / (nn - i)),
                 6) sse_split
         FROM cum WHERE i < nn)
SELECT d split_day, nn n_days, i n_left,
       round(cs * 1.0 / i, 6) mean_left,
       round((ts - cs) * 1.0 / (nn - i), 6) mean_right,
       round(tss - ts * ts / nn, 6) sse_total,
       sse_split sse_best,
       round(1.0 - sse_split / (tss - ts * ts / nn), 6) reduction
FROM cand ORDER BY sse_split, d LIMIT 1"""


def q_stylometry_delta(spark, sf_dir):
    """Burrows' Delta between document sources: z-score the top-30
    corpus words' relative frequencies across sources, Delta(s1,s2)
    = mean |z1 - z2| — the stylometric distance used for authorship
    and for spotting machine-generated / boilerplate sources in a
    training corpus. Exact-integer discipline end-to-end: relative
    frequencies quantized to BIGINT nanos; the z-score is written as
    dev * sqrt((S-1)/var_sum) where dev = S*f - Σf (exact int) and
    var_sum = Σ dev² in DECIMAL(38) (HUGEINT on the oracle side) —
    no floating accumulation anywhere, so the 6dp Delta is
    partition-proof. Zero-variance words are excluded on both sides.
    Scale: one token explode + two grouped counts; everything after
    runs at the sources×30 grid and broadcasts."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), " ")
        ).alias("w"),
    ).where(F.col("w") != "")
    top = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "w")
        .limit(30)
        .select("w")
        .localCheckpoint(eager=True)
    )
    per_sw = (
        tok.join(F.broadcast(top), "w")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    tot = tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("tot")
    )
    srcs = tot.select("source").localCheckpoint(eager=True)
    n_src = srcs.count()
    grid = (
        srcs.crossJoin(F.broadcast(top))
        .join(F.broadcast(per_sw), ["source", "w"], "left")
        .join(F.broadcast(tot), "source")
        .select(
            "source",
            "w",
            F.round(F.coalesce(F.col("cnt"), F.lit(0)) * 1e9 / F.col("tot"), 0)
            .cast("bigint")
            .alias("f_nano"),
        )
    )
    stats = grid.groupBy("w").agg(
        F.sum("f_nano").alias("musum"),
        F.count(F.lit(1)).alias("s_chk"),
    )
    dev = (F.lit(n_src) * F.col("f_nano") - F.col("musum")).alias("dev")
    devs = grid.join(F.broadcast(stats), "w").select("source", "w", dev)
    var = devs.groupBy("w").agg(
        F.sum(
            F.col("dev").cast("decimal(19,0)")
            * F.col("dev").cast("decimal(19,0)")
        ).alias("var_sum")
    )
    z = (
        devs.join(F.broadcast(var.where(F.col("var_sum") > 0)), "w")
        .select(
            "source",
            "w",
            (
                F.col("dev")
                * F.sqrt(
                    F.lit(float(n_src - 1)) / F.col("var_sum").cast("double")
                )
            ).alias("z"),
        )
    )
    z2 = z.select(
        F.col("source").alias("source_b"),
        F.col("w").alias("wb"),
        F.col("z").alias("zb"),
    )
    return (
        z.join(
            F.broadcast(z2),
            (F.col("w") == F.col("wb")) & (F.col("source") < F.col("source_b")),
        )
        .select(
            F.col("source").alias("source_a"),
            "source_b",
            F.round(F.abs(F.col("z") - F.col("zb")) * 1e9, 0)
            .cast("bigint")
            .alias("term"),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.round(
                F.sum("term") / (F.count(F.lit(1)) * 1e9), 6
            ).alias("delta"),
        )
    )


SQL_STYLOMETRY_DELTA = """
WITH tok AS (
  SELECT source, t w
  FROM (SELECT source, unnest(string_split(lower(trim(text)), ' ')) t
        FROM documents)
  WHERE t <> ''),
top AS (SELECT w FROM (SELECT w, count(*) cnt FROM tok GROUP BY 1)
        ORDER BY cnt DESC, w LIMIT 30),
per_sw AS (SELECT source, tok.w, CAST(count(*) AS BIGINT) cnt
           FROM tok JOIN top ON tok.w = top.w GROUP BY 1, 2),
tot AS (SELECT source, CAST(count(*) AS BIGINT) tot FROM tok GROUP BY 1),
srcs AS (SELECT source FROM tot),
ns AS (SELECT count(*) s FROM srcs),
grid AS (SELECT srcs.source, top.w,
           CAST(round(coalesce(cnt, 0) * 1e9 / tot, 0) AS BIGINT) f_nano
         FROM srcs CROSS JOIN top
         LEFT JOIN per_sw ON per_sw.source = srcs.source
                         AND per_sw.w = top.w
         JOIN tot ON tot.source = srcs.source),
st AS (SELECT w, sum(f_nano) musum FROM grid GROUP BY 1),
devs AS (SELECT source, grid.w,
           (SELECT s FROM ns) * f_nano - musum AS dev
         FROM grid JOIN st ON grid.w = st.w),
var AS (SELECT w, sum(dev::HUGEINT * dev::HUGEINT) var_sum
        FROM devs GROUP BY 1),
z AS (SELECT source, devs.w,
        dev * sqrt(((SELECT s FROM ns) - 1) * 1.0 / var_sum::DOUBLE) z
      FROM devs JOIN var ON devs.w = var.w WHERE var_sum > 0)
SELECT a.source source_a, b.source source_b,
       CAST(count(*) AS BIGINT) n_words,
       round(sum(CAST(round(abs(a.z - b.z) * 1e9, 0) AS BIGINT))
             / (count(*) * 1e9), 6) delta
FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
GROUP BY 1, 2"""


def q_eventually_follows(spark, sf_dir):
    """Process-mining eventually-follows matrix over user event
    streams (some-b-strictly-after-first-a, per user) — reachability,
    where events_transitions is adjacency. One (user,type) window +
    a bounded self-join; see operators/events.eventually_follows."""
    from llmaix_spark.operators.events import eventually_follows

    return eventually_follows(_t(spark, sf_dir, "events"))


SQL_EVENTUALLY_FOLLOWS = """
WITH base AS (SELECT user_id u, event_type t, epoch_us(ts) us,
                     event_id eid FROM events),
rk AS (SELECT *, row_number() OVER (PARTITION BY u, t ORDER BY us, eid) rn,
              count(*) OVER (PARTITION BY u, t) n
       FROM base),
st AS (SELECT u, t,
         max(CASE WHEN rn = 1 THEN us END) f_us,
         max(CASE WHEN rn = 1 THEN eid END) f_eid,
         max(CASE WHEN rn = n THEN us END) l_us,
         max(CASE WHEN rn = n THEN eid END) l_eid
       FROM rk GROUP BY 1, 2),
na AS (SELECT t, CAST(count(*) AS BIGINT) n_a FROM st GROUP BY 1),
pairs AS (SELECT a.t ta, b.t tb,
            CAST(count(*) AS BIGINT) n_users_both,
            CAST(sum(CASE WHEN b.l_us > a.f_us
                          OR (b.l_us = a.f_us AND b.l_eid > a.f_eid)
                     THEN 1 ELSE 0 END) AS BIGINT) n_ef
          FROM st a JOIN st b ON a.u = b.u AND a.t <> b.t
          GROUP BY 1, 2)
SELECT ta type_a, tb type_b, n_a n_users_a, n_users_both, n_ef,
       round(n_ef * 1.0 / n_a, 6) ef_share
FROM pairs JOIN na ON pairs.ta = na.t"""


def q_kcore_decomposition(spark, sf_dir):
    """4-round 2-core peeling of the part co-purchase graph (parts
    sharing an order): per-round survivor/edge counts — the
    degeneracy audit that separates the dense co-purchase core from
    pendant parts. Fixed-round contract (the distributed depth
    budget); the wave test pins that the fixture converges within 4.
    See operators/graph.kcore_peel_rounds."""
    from llmaix_spark.operators.graph import kcore_peel_rounds

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    lb = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb")
    )
    edges = (
        li.join(lb, (F.col("l_orderkey") == F.col("ok"))
                & (F.col("l_partkey") < F.col("pb")))
        .select(F.col("l_partkey").alias("src"), F.col("pb").alias("dst"))
    )
    return kcore_peel_rounds(edges, k=2, rounds=4)


def _kcore_round_sql(i: int) -> str:
    return f""",
deg{i} AS (SELECT node, count(*) c FROM (
             SELECT s node FROM e{i - 1}
             UNION ALL SELECT d FROM e{i - 1}) GROUP BY 1),
keep{i} AS (SELECT node FROM deg{i} WHERE c >= 2),
e{i} AS (SELECT s, d FROM e{i - 1}
         WHERE s IN (SELECT node FROM keep{i})
           AND d IN (SELECT node FROM keep{i}))"""


SQL_KCORE_DECOMPOSITION = (
    """
WITH e0 AS (SELECT DISTINCT a.l_partkey s, b.l_partkey d
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey)"""
    + "".join(_kcore_round_sql(i) for i in (1, 2, 3, 4))
    + """
SELECT CAST(1 AS BIGINT) round,
       (SELECT CAST(count(*) AS BIGINT) FROM keep1) n_nodes,
       (SELECT CAST(count(*) AS BIGINT) FROM e1) n_edges
UNION ALL SELECT 2, (SELECT count(*) FROM keep2), (SELECT count(*) FROM e2)
UNION ALL SELECT 3, (SELECT count(*) FROM keep3), (SELECT count(*) FROM e3)
UNION ALL SELECT 4, (SELECT count(*) FROM keep4), (SELECT count(*) FROM e4)"""
)


def q_textrank_keywords(spark, sf_dir):
    """TextRank keyword extraction: weighted PageRank (d=0.85, 3
    iterations) over the word co-occurrence graph of the corpus —
    nodes = the top-150 frequent words of length ≥ 4 (crude stopword
    gate), edges = adjacency in the original token stream, weight =
    co-occurrence count, symmetric. Mihalcea & Tarau 2004 semantics;
    dangling vocabulary words keep only the teleport term (documented
    TextRank convention — scores are relative, not a distribution).
    Rank state in BIGINT nano-units with per-contribution rounding —
    partition-proof, oracled by 3 unrolled SQL iterations. Scale: one
    posexplode + one adjacency self-join on (doc, pos); everything
    after runs at the ≤150-node grain and broadcasts."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.posexplode(
            F.split(F.lower(F.trim(F.col("text"))), " ")
        ).alias("pos", "w"),
    ).where((F.col("w") != "") & (F.length("w") >= 4))
    vocab = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "w")
        .limit(150)
        .select("w")
        .localCheckpoint(eager=True)
    )
    tv = tok.join(F.broadcast(vocab), "w").select("doc_id", "pos", "w")
    nxt = tv.select(
        F.col("doc_id").alias("db"),
        (F.col("pos") - 1).alias("pb"),
        F.col("w").alias("wb"),
    )
    co = (
        tv.join(
            nxt,
            (F.col("doc_id") == F.col("db")) & (F.col("pos") == F.col("pb")),
        )
        .where(F.col("w") != F.col("wb"))
        .groupBy("w", "wb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    edges = (
        co.select("w", "wb", "c")
        .unionAll(
            co.select(
                F.col("wb").alias("w"), F.col("w").alias("wb"), "c"
            )
        )
        .groupBy("w", "wb")
        .agg(F.sum("c").alias("c"))
        .localCheckpoint(eager=True)
    )
    strength = edges.groupBy("w").agg(F.sum("c").alias("tw"))
    n = vocab.count()
    teleport = int(math.floor(0.15 * 1e9 / n + 0.5))
    pr = vocab.select("w", F.lit(10**9 // n).cast("bigint").alias("nano"))
    for _ in range(3):
        contrib = (
            edges.join(F.broadcast(strength), "w")
            .join(F.broadcast(pr), "w")
            .select(
                F.col("wb"),
                F.round(
                    F.col("nano") * 0.85 * F.col("c") / F.col("tw"), 0
                )
                .cast("bigint")
                .alias("t"),
            )
            .groupBy("wb")
            .agg(F.sum("t").alias("s"))
        )
        pr = (
            vocab.join(
                F.broadcast(contrib), vocab["w"] == contrib["wb"], "left"
            )
            .select(
                "w",
                (F.lit(teleport) + F.coalesce(F.col("s"), F.lit(0)))
                .cast("bigint")
                .alias("nano"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        pr.orderBy(F.col("nano").desc(), "w")
        .limit(20)
        .select("w", (F.col("nano") / 1e9).alias("score"))
        .withColumnRenamed("w", "keyword")
    )


def _textrank_iter_sql(i: int) -> str:
    return f""",
c{i} AS (SELECT wb, CAST(sum(CAST(round(nano * 0.85 * c / tw, 0) AS BIGINT))
                    AS BIGINT) s
         FROM edges JOIN strength USING (w) JOIN pr{i - 1} USING (w)
         GROUP BY wb),
pr{i} AS (SELECT vocab.w,
            CAST((SELECT tp FROM tele) + coalesce(s, 0) AS BIGINT) nano
          FROM vocab LEFT JOIN c{i} ON vocab.w = c{i}.wb)"""


SQL_TEXTRANK_KEYWORDS = (
    """
WITH tok AS (
  SELECT doc_id, i - 1 AS pos, t w
  FROM (SELECT doc_id, generate_subscripts(ws, 1) i, unnest(ws) t
        FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') ws
              FROM documents))
  WHERE t <> '' AND length(t) >= 4),
vocab AS (SELECT w FROM (SELECT w, count(*) cnt FROM tok GROUP BY 1)
          ORDER BY cnt DESC, w LIMIT 150),
tv AS (SELECT doc_id, pos, tok.w FROM tok JOIN vocab ON tok.w = vocab.w),
co AS (SELECT a.w, b.w wb, CAST(count(*) AS BIGINT) c
       FROM tv a JOIN tv b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       WHERE a.w <> b.w GROUP BY 1, 2),
edges AS (SELECT w, wb, CAST(sum(c) AS BIGINT) c FROM (
            SELECT w, wb, c FROM co
            UNION ALL SELECT wb, w, c FROM co) GROUP BY 1, 2),
strength AS (SELECT w, sum(c) tw FROM edges GROUP BY 1),
nv AS (SELECT count(*) n FROM vocab),
tele AS (SELECT CAST(floor(0.15 * 1e9 / n + 0.5) AS BIGINT) tp FROM nv),
pr0 AS (SELECT w, CAST(1000000000 // (SELECT n FROM nv) AS BIGINT) nano
        FROM vocab)"""
    + "".join(_textrank_iter_sql(i) for i in (1, 2, 3))
    + """
SELECT w keyword, nano / 1e9 score FROM pr3
ORDER BY nano DESC, w LIMIT 20"""
)


def q_ipf_raking(spark, sf_dir):
    """Iterative proportional fitting (raking) of the nation ×
    order-priority contingency table: 3 full row+column passes that
    reweight cells so every nation contributes equally (uniform row
    targets) while the observed priority mix is preserved (column
    targets = data margins) — the survey-weighting primitive behind
    post-stratification at corpus scale. Weights in BIGINT
    nano-units, the scale factor per pass is one double ratio applied
    per bounded row — bit-identical at any partitioning. Scale: one
    grouped count; the IPF loop runs at the 125-cell grain."""
    cells = (
        _t(spark, sf_dir, "orders")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    w = cells.select(
        "nation", "priority", "n", (F.col("n") * F.lit(10**9)).alias("wn")
    )
    n_nations = cells.select("nation").distinct().count()
    total = w.select(
        F.sum("n").cast("bigint").alias("t")
    ).localCheckpoint(eager=True)
    tr = total.select(
        F.round(F.col("t") * 1e9 / n_nations, 0).cast("bigint").alias("tr")
    )
    tc = cells.groupBy("priority").agg(
        (F.sum("n") * F.lit(10**9)).cast("bigint").alias("tc")
    )
    for _ in range(3):
        rows = w.groupBy("nation").agg(F.sum("wn").alias("rs"))
        w = (
            w.join(F.broadcast(rows), "nation")
            .crossJoin(F.broadcast(tr))
            .select(
                "nation", "priority", "n",
                F.round(F.col("wn") * (F.col("tr") / F.col("rs")), 0)
                .cast("bigint")
                .alias("wn"),
            )
        )
        colsum = w.groupBy("priority").agg(F.sum("wn").alias("cs"))
        w = (
            w.join(F.broadcast(colsum), "priority")
            .join(F.broadcast(tc), "priority")
            .select(
                "nation", "priority", "n",
                F.round(F.col("wn") * (F.col("tc") / F.col("cs")), 0)
                .cast("bigint")
                .alias("wn"),
            )
            .localCheckpoint(eager=True)
        )
    return w.select(
        "nation",
        "priority",
        "n",
        F.round(F.col("wn") / 1e9, 6).alias("raked_weight"),
        F.round(F.col("wn") / (F.col("n") * 1e9), 6).alias("rake_factor"),
    )


def _ipf_pass_sql(i: int) -> str:
    return f""",
r{i} AS (SELECT nation, sum(wn) rs FROM w{i - 1} GROUP BY 1),
wr{i} AS (SELECT nation, priority, n,
            CAST(round(wn * ((SELECT tr FROM tr) / rs), 0) AS BIGINT) wn
          FROM w{i - 1} JOIN r{i} USING (nation)),
cs{i} AS (SELECT priority, sum(wn) cs FROM wr{i} GROUP BY 1),
w{i} AS (SELECT nation, priority, n,
           CAST(round(wn * (tc / cs), 0) AS BIGINT) wn
         FROM wr{i} JOIN cs{i} USING (priority) JOIN tc USING (priority))"""


SQL_IPF_RAKING = (
    """
WITH cells AS (
  SELECT n_name nation, o_orderpriority priority,
         CAST(count(*) AS BIGINT) n
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2),
tot AS (SELECT sum(n) t FROM cells),
nn AS (SELECT count(DISTINCT nation) k FROM cells),
tr AS (SELECT CAST(round((SELECT t FROM tot) * 1e9 / (SELECT k FROM nn), 0)
              AS BIGINT) tr),
tc AS (SELECT priority, CAST(sum(n) * 1000000000 AS BIGINT) tc
       FROM cells GROUP BY 1),
w0 AS (SELECT nation, priority, n,
              CAST(n * 1000000000 AS BIGINT) wn FROM cells)"""
    + "".join(_ipf_pass_sql(i) for i in (1, 2, 3))
    + """
SELECT nation, priority, n, round(wn / 1e9, 6) raked_weight,
       round(wn / (n * 1e9), 6) rake_factor
FROM w3"""
)


def q_queue_wait_lindley(spark, sf_dir):
    """Lindley waiting-time recursion W_{n+1} = max(0, W_n + S - A_n)
    replayed EXACTLY with parallel prefix sums — no sequential scan:
    W_n = P_n - min(0, min_{k≤n} P_k) where P = cumsum(S - gap). Each
    user's event stream feeds one virtual single server whose
    deterministic service time is that user's mean interarrival
    (floor((span)/(n-1)) µs) — load ρ ≈ 1, the critical regime where
    the backlog profile is pure burstiness signal at ANY event
    density/SF. Users with one event are excluded (no interarrival).
    All math in exact integer microseconds; two stacked windows over
    the same (user) partitioning, no joins — the classic sequential
    simulation made shuffle-parallel."""
    from pyspark.sql import Window as _W

    w = _W.partitionBy("u").orderBy("us", "eid")
    wall = _W.partitionBy("u").rowsBetween(
        _W.unboundedPreceding, _W.unboundedFollowing
    )
    wcum = w.rowsBetween(_W.unboundedPreceding, _W.currentRow)
    base = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("u"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.col("event_id").alias("eid"),
    )
    svc = base.select(
        "u", "us", "eid",
        F.count(F.lit(1)).over(wall).alias("n"),
        F.expr(
            "(max(us) over (partition by u) - min(us) over (partition by u))"
        ).alias("span"),
    ).where(F.col("n") >= 2)
    svc = svc.select(
        "u", "us", "eid", "n",
        F.expr("span div (n - 1)").alias("s_us"),
    )
    x = svc.select(
        "u", "us", "eid", "s_us",
        F.coalesce(
            F.col("s_us") - (F.col("us") - F.lag("us").over(w)), F.lit(0)
        ).alias("x"),
    )
    p = x.select(
        "u", "us", "eid", "s_us", F.sum("x").over(wcum).alias("pp")
    )
    waits = p.select(
        "u",
        "s_us",
        (
            F.col("pp")
            - F.least(F.lit(0), F.min("pp").over(wcum))
        ).alias("wait_us"),
    )
    return (
        waits.groupBy("u")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.max("s_us") / 1e6, 6).alias("service_s"),
            F.round(F.max("wait_us") / 1e6, 6).alias("max_wait_s"),
            F.round(F.sum("wait_us") / (F.count(F.lit(1)) * 1e6), 6).alias(
                "mean_wait_s"
            ),
        )
        .select(
            F.col("u").alias("user_id"),
            "n_events", "service_s", "max_wait_s", "mean_wait_s",
        )
    )


SQL_QUEUE_WAIT_LINDLEY = """
WITH base AS (SELECT user_id u, epoch_us(ts) us, event_id eid FROM events),
svc AS (SELECT u, us, eid,
          count(*) OVER (PARTITION BY u) n,
          (max(us) OVER (PARTITION BY u) - min(us) OVER (PARTITION BY u))
            span
        FROM base),
s2 AS (SELECT u, us, eid, n, span // (n - 1) s_us FROM svc WHERE n >= 2),
x AS (SELECT u, us, eid, s_us,
        coalesce(s_us - (us - lag(us) OVER
          (PARTITION BY u ORDER BY us, eid)), 0) x
      FROM s2),
p AS (SELECT u, us, eid, s_us,
        sum(x) OVER (PARTITION BY u ORDER BY us, eid) pp
      FROM x),
waits AS (SELECT u, s_us,
            pp - least(0, min(pp) OVER
              (PARTITION BY u ORDER BY us, eid
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) wait_us
          FROM p)
SELECT u user_id, CAST(count(*) AS BIGINT) n_events,
       round(max(s_us) / 1e6, 6) service_s,
       round(max(wait_us) / 1e6, 6) max_wait_s,
       round(sum(wait_us) / (count(*) * 1e6), 6) mean_wait_s
FROM waits GROUP BY u"""


def q_brier_decomposition(spark, sf_dir):
    """Murphy decomposition of the Brier score for 'normalized value
    predicts purchase' (same score convention as calibration_bins:
    exact cents capped at 500.00, 10 equal-width bins): BS, bin-wise
    reliability and resolution, base-rate uncertainty, and the
    within-bin forecast variance (the exact remainder BS - REL + RES
    - UNC, ≥ 0). Everything reduces to ONE grouped integer aggregate
    at the 10-bin grain: squared errors are exact cent² integers;
    the 10 per-bin REL/RES terms quantize to nanos before summing."""
    e = _t(spark, sf_dir, "events").select(
        F.least(
            F.round(F.col("value") * 100, 0).cast("bigint"), F.lit(50000)
        ).alias("c"),
        (F.col("event_type") == "purchase").cast("bigint").alias("y"),
    )
    bins = (
        e.groupBy(
            F.least(F.lit(9), (F.col("c") / 5000).cast("bigint")).alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nk"),
            F.sum("c").cast("bigint").alias("sc"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(
                (F.col("c") - 50000 * F.col("y"))
                * (F.col("c") - 50000 * F.col("y"))
            )
            .cast("bigint")
            .alias("bsum"),
        )
        .localCheckpoint(eager=True)
    )
    tot = bins.agg(
        F.sum("nk").cast("bigint").alias("n"),
        F.sum("sy").cast("bigint").alias("ty"),
        F.sum("bsum").cast("bigint").alias("tb"),
    )
    d_rel = (F.col("sc") - 50000.0 * F.col("sy")) / (F.col("nk") * 50000.0)
    d_res = F.col("sy") * 1.0 / F.col("nk") - F.col("ty") * 1.0 / F.col("n")
    terms = (
        bins.crossJoin(F.broadcast(tot))
        .select(
            "n", "ty", "tb",
            F.round(F.col("nk") * (d_rel * d_rel) * 1e9, 0)
            .cast("bigint")
            .alias("rel_t"),
            F.round(F.col("nk") * (d_res * d_res) * 1e9, 0)
            .cast("bigint")
            .alias("res_t"),
        )
        .groupBy("n", "ty", "tb")
        .agg(
            F.sum("rel_t").alias("rel_n"),
            F.sum("res_t").alias("res_n"),
        )
    )
    brier = F.col("tb") / (F.col("n") * 2.5e9)
    rel = F.col("rel_n") / (F.col("n") * 1e9)
    res = F.col("res_n") / (F.col("n") * 1e9)
    unc = (F.col("ty") * 1.0 / F.col("n")) * (
        1.0 - F.col("ty") * 1.0 / F.col("n")
    )
    return terms.select(
        F.col("n").alias("n_events"),
        F.round(brier, 6).alias("brier"),
        F.round(rel, 6).alias("reliability"),
        F.round(res, 6).alias("resolution"),
        F.round(unc, 6).alias("uncertainty"),
        F.round(brier - rel + res - unc, 6).alias("within_bin_var"),
    )


SQL_BRIER_DECOMPOSITION = """
WITH e AS (SELECT least(CAST(round(value * 100, 0) AS BIGINT), 50000) c,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END y
           FROM events),
bins AS (SELECT least(9, c // 5000) bin,
           CAST(count(*) AS BIGINT) nk, CAST(sum(c) AS BIGINT) sc,
           CAST(sum(y) AS BIGINT) sy,
           CAST(sum((c - 50000 * y) * (c - 50000 * y)) AS BIGINT) bsum
         FROM e GROUP BY 1),
tot AS (SELECT CAST(sum(nk) AS BIGINT) n, CAST(sum(sy) AS BIGINT) ty,
               CAST(sum(bsum) AS BIGINT) tb FROM bins),
terms AS (SELECT n, ty, tb,
            sum(CAST(round(nk * (((sc - 50000.0 * sy) / (nk * 50000.0))
                                 * ((sc - 50000.0 * sy) / (nk * 50000.0)))
                           * 1e9, 0) AS BIGINT)) rel_n,
            sum(CAST(round(nk * ((sy * 1.0 / nk - ty * 1.0 / n)
                                 * (sy * 1.0 / nk - ty * 1.0 / n))
                           * 1e9, 0) AS BIGINT)) res_n
          FROM bins CROSS JOIN tot GROUP BY 1, 2, 3)
SELECT n n_events,
       round(tb / (n * 2.5e9), 6) brier,
       round(rel_n / (n * 1e9), 6) reliability,
       round(res_n / (n * 1e9), 6) resolution,
       round((ty * 1.0 / n) * (1.0 - ty * 1.0 / n), 6) uncertainty,
       round(tb / (n * 2.5e9) - rel_n / (n * 1e9) + res_n / (n * 1e9)
             - (ty * 1.0 / n) * (1.0 - ty * 1.0 / n), 6) within_bin_var
FROM terms"""


def q_markov_entropy_rate(spark, sf_dir):
    """Entropy rate of the event-type Markov chain: H = Σ_i π_i ·
    H(next|state=i), π from the same 5-iteration nano-unit power
    method as transition_stationary — how predictable a user timeline
    is, in bits/event, against the log2(K) ceiling. Per-state
    conditional entropies quantize each -p·log2(p) term to nanos
    (log2 written as ln/ln2 with identical operation order in both
    engines); the final Σ π·h is an exact integer dot product at the
    K-state grain."""
    from pyspark.sql import Window

    from llmaix_spark.operators.events import stationary_distribution

    ev = _t(spark, sf_dir, "events")
    pi = stationary_distribution(ev, iterations=5).select(
        "state",
        F.round(F.col("stationary_p") * 1e6, 0).cast("bigint").alias("pi_u"),
    )
    w = Window.partitionBy("u").orderBy("us", "eid")
    pairs = (
        ev.select(
            F.col("user_id").alias("u"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            F.col("event_id").alias("eid"),
            F.col("event_type").alias("src"),
        )
        .select("u", "src", F.lead("src").over(w).alias("dst"))
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = pairs.groupBy("src").agg(F.sum("n").alias("t"))
    ln2 = math.log(2.0)
    h = (
        pairs.join(F.broadcast(tot), "src")
        .select(
            "src",
            F.round(
                -(F.col("n") / F.col("t"))
                * (F.log(F.col("n") / F.col("t")) / ln2)
                * 1e9,
                0,
            )
            .cast("bigint")
            .alias("ht"),
        )
        .groupBy("src")
        .agg(F.sum("ht").alias("h_nano"))
    )
    joined = pi.join(F.broadcast(h), pi["state"] == h["src"], "left").select(
        "pi_u", F.coalesce(F.col("h_nano"), F.lit(0)).alias("h_nano")
    )
    agg = joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_states"),
        F.sum(F.col("pi_u") * F.col("h_nano")).alias("dot"),
    )
    return agg.select(
        "n_states",
        F.round(F.col("dot") / 1e15, 6).alias("entropy_rate_bits"),
        F.round(F.log(F.col("n_states").cast("double")) / ln2, 6).alias(
            "max_entropy_bits"
        ),
        F.round(
            (F.col("dot") / 1e15)
            / (F.log(F.col("n_states").cast("double")) / ln2),
            6,
        ).alias("efficiency"),
    )


SQL_MARKOV_ENTROPY_RATE = (
    """
WITH e AS (SELECT user_id u, epoch_us(ts) us, event_id eid,
                  event_type src FROM events),
seq AS (SELECT u, src,
               lead(src) OVER (PARTITION BY u ORDER BY us, eid) dst
        FROM e),
pairs AS (SELECT src, dst, CAST(count(*) AS BIGINT) n FROM seq
          WHERE dst IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT src, sum(n) t FROM pairs GROUP BY 1),
tp AS (SELECT pairs.src, dst, n * 1.0 / t AS p
       FROM pairs JOIN tot USING (src)),
states AS (SELECT DISTINCT event_type AS state FROM events),
v0 AS (SELECT state,
         CAST(floor(1e9 / (SELECT count(*) FROM states) + 0.5) AS BIGINT)
           nano
       FROM states)"""
    + "".join(_stationary_iter_sql(i) for i in (1, 2, 3, 4, 5))
    + """,
pi AS (SELECT state,
         CAST(round(((nano + 500) // 1000) / 1e6 * 1e6, 0) AS BIGINT) pi_u
       FROM v5),
h AS (SELECT src,
        CAST(sum(CAST(round(-(n * 1.0 / t) * (ln(n * 1.0 / t)
                            / 0.6931471805599453) * 1e9, 0) AS BIGINT))
        AS BIGINT) h_nano
      FROM pairs JOIN tot USING (src) GROUP BY 1),
j AS (SELECT pi_u, coalesce(h_nano, 0) h_nano
      FROM pi LEFT JOIN h ON pi.state = h.src),
agg AS (SELECT CAST(count(*) AS BIGINT) n_states, sum(pi_u * h_nano) dot
        FROM j)
SELECT n_states, round(dot / 1e15, 6) entropy_rate_bits,
       round(ln(n_states) / 0.6931471805599453, 6) max_entropy_bits,
       round((dot / 1e15) / (ln(n_states) / 0.6931471805599453), 6)
         efficiency
FROM agg"""
)


def q_session_gap_sweep(spark, sf_dir):
    """Sessionization-threshold sweep: session counts, events per
    session, and total active time at inactivity gaps of 15/30/60
    minutes — the tuning evidence behind events_sessionize's
    production gap, from ONE lag pass (the three thresholds are
    three conditional sums over the same gap column; no re-scan).
    Exact integer microseconds throughout."""
    from pyspark.sql import Window as _W

    w = _W.partitionBy("u").orderBy("us", "eid")
    gaps = (
        _t(spark, sf_dir, "events")
        .select(
            F.col("user_id").alias("u"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            F.col("event_id").alias("eid"),
        )
        .select("u", (F.col("us") - F.lag("us").over(w)).alias("g"))
    )
    one = gaps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.count_distinct(F.col("u")).cast("bigint").alias("n_users"),
        *[
            F.sum(
                (F.col("g") > gap_s * 1_000_000).cast("bigint")
            )
            .cast("bigint")
            .alias(f"brk_{gap_s}")
            for gap_s in (900, 1800, 3600)
        ],
        *[
            F.sum(
                F.when(F.col("g") <= gap_s * 1_000_000, F.col("g")).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias(f"act_{gap_s}")
            for gap_s in (900, 1800, 3600)
        ],
    ).localCheckpoint(eager=True)
    rows = []
    for gap_s in (900, 1800, 3600):
        ns = F.col("n_users") + F.col(f"brk_{gap_s}")
        rows.append(
            one.select(
                F.lit(gap_s).cast("bigint").alias("gap_s"),
                ns.cast("bigint").alias("n_sessions"),
                "n_events",
                F.round(F.col("n_events") * 1.0 / ns, 6).alias(
                    "events_per_session"
                ),
                F.round(F.col(f"act_{gap_s}") / 3.6e9, 6).alias(
                    "active_hours"
                ),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


SQL_SESSION_GAP_SWEEP = """
WITH base AS (SELECT user_id u, epoch_us(ts) us, event_id eid FROM events),
g AS (SELECT u, us - lag(us) OVER (PARTITION BY u ORDER BY us, eid) g
      FROM base),
one AS (SELECT CAST(count(*) AS BIGINT) n_events,
          CAST(count(DISTINCT u) AS BIGINT) n_users,
          CAST(sum(CASE WHEN g > 900000000 THEN 1 ELSE 0 END) AS BIGINT)
            brk_900,
          CAST(sum(CASE WHEN g > 1800000000 THEN 1 ELSE 0 END) AS BIGINT)
            brk_1800,
          CAST(sum(CASE WHEN g > 3600000000 THEN 1 ELSE 0 END) AS BIGINT)
            brk_3600,
          CAST(sum(CASE WHEN g <= 900000000 THEN g ELSE 0 END) AS BIGINT)
            act_900,
          CAST(sum(CASE WHEN g <= 1800000000 THEN g ELSE 0 END) AS BIGINT)
            act_1800,
          CAST(sum(CASE WHEN g <= 3600000000 THEN g ELSE 0 END) AS BIGINT)
            act_3600
        FROM g)
SELECT CAST(900 AS BIGINT) gap_s,
       CAST(n_users + brk_900 AS BIGINT) n_sessions, n_events,
       round(n_events * 1.0 / (n_users + brk_900), 6) events_per_session,
       round(act_900 / 3.6e9, 6) active_hours FROM one
UNION ALL
SELECT 1800, CAST(n_users + brk_1800 AS BIGINT), n_events,
       round(n_events * 1.0 / (n_users + brk_1800), 6),
       round(act_1800 / 3.6e9, 6) FROM one
UNION ALL
SELECT 3600, CAST(n_users + brk_3600 AS BIGINT), n_events,
       round(n_events * 1.0 / (n_users + brk_3600), 6),
       round(act_3600 / 3.6e9, 6) FROM one"""


def q_tfidf_cosine_pairs(spark, sf_dir):
    """Sparse TF-IDF cosine similarity join with rare-token blocking:
    candidate pairs are documents sharing at least one RARE token
    (df ≤ 20 — the blocking key a sparse-vector join can afford at
    100 TB: common tokens never fan out), then the EXACT cosine over
    the full vocabulary is computed for candidates only and gated at
    ≥ 0.3 on the rounded value. Weights quantized to micro-int
    (round(tf·idf·1e6)) so dot products and norms are exact integer
    sums — partition-proof. idf = ln(N/df) with identical operation
    order in both engines. Features are word TRIGRAM shingles (the
    fixture's word vocabulary is a closed 31-word set — every word is
    a stop word; shingles carry the document identity, same reasoning
    as the dedup family)."""
    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.count()
    tf = (
        dd.word_shingles(docs, 3, distinct=False)
        .withColumnRenamed("shingle", "w")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df_ = tf.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    wt = (
        tf.join(df_, "w")
        .select(
            "doc_id",
            "w",
            "df",
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")) * 1e6,
                0,
            )
            .cast("bigint")
            .alias("wu"),
        )
        .localCheckpoint(eager=True)
    )
    norm2 = wt.groupBy("doc_id").agg(
        F.sum(F.col("wu") * F.col("wu")).alias("n2")
    )
    rare = wt.where(F.col("df") <= 20).select("doc_id", "w")
    cand = (
        rare.join(
            rare.select(F.col("doc_id").alias("doc_b"), "w"), "w"
        )
        .where(F.col("doc_id") < F.col("doc_b"))
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )
    dots = (
        cand.join(wt.select(F.col("doc_id").alias("doc_a"), "w", F.col("wu").alias("wa")), "doc_a")
        .join(
            wt.select(F.col("doc_id").alias("doc_b"), "w", F.col("wu").alias("wb")),
            ["doc_b", "w"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    out = (
        dots.join(norm2.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("na")), "doc_a")
        .join(norm2.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("nb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("dot")
                / (F.sqrt(F.col("na").cast("double"))
                   * F.sqrt(F.col("nb").cast("double"))),
                6,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= 0.3)
    )
    return out


SQL_TFIDF_COSINE_PAIRS = """
WITH d AS (SELECT doc_id, string_split(trim(text), ' ') ws FROM documents),
tokp AS (SELECT doc_id, generate_subscripts(ws, 1) i, unnest(ws) t FROM d),
tri AS (SELECT doc_id,
               t || ' ' || lead(t, 1) OVER win || ' ' || lead(t, 2) OVER win
                 AS w,
               lead(t, 2) OVER win l2
        FROM tokp WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
tok AS (SELECT doc_id, w FROM tri WHERE l2 IS NOT NULL),
tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) tf FROM tok GROUP BY 1, 2),
dfq AS (SELECT w, CAST(count(*) AS BIGINT) df FROM tf GROUP BY 1),
nd AS (SELECT count(*) n FROM documents),
wt AS (SELECT doc_id, tf.w, df,
         CAST(round(tf * ln((SELECT n FROM nd) * 1.0 / df) * 1e6, 0)
              AS BIGINT) wu
       FROM tf JOIN dfq ON tf.w = dfq.w),
norm2 AS (SELECT doc_id, sum(wu * wu) n2 FROM wt GROUP BY 1),
rare AS (SELECT doc_id, w FROM wt WHERE df <= 20),
cand AS (SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b
         FROM rare a JOIN rare b ON a.w = b.w AND a.doc_id < b.doc_id),
dots AS (SELECT doc_a, doc_b, sum(wa.wu * wb.wu) dot
         FROM cand
         JOIN wt wa ON wa.doc_id = cand.doc_a
         JOIN wt wb ON wb.doc_id = cand.doc_b AND wb.w = wa.w
         GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(dot / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE)), 6) cosine
FROM dots JOIN norm2 na ON na.doc_id = doc_a
          JOIN norm2 nb ON nb.doc_id = doc_b
WHERE round(dot / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE)), 6) >= 0.3"""


def q_sequential_obf(spark, sf_dir):
    """Group-sequential A/B monitoring with O'Brien-Fleming
    boundaries at 3 equally spaced calendar looks: treatment = odd
    orderkey (an SRM-free hash split), metric = urgent-order rate,
    z from cumulative counts at each look, compared to the classic
    OBF |z| bounds 3.471 / 2.454 / 2.004. The look assignment is
    pure integer arithmetic on microseconds (no percentile); all
    counts are exact; one grouped aggregate + a 3-row rollup."""
    o = _t(spark, sf_dir, "orders").select(
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("us"),
        (F.col("o_orderkey") % 2 == 1).cast("int").alias("trt"),
        (F.col("o_orderpriority") == "1-URGENT").cast("bigint").alias("y"),
    )
    span = o.agg(
        F.min("us").alias("lo"), F.max("us").alias("hi")
    ).localCheckpoint(eager=True)
    looks = (
        o.crossJoin(F.broadcast(span))
        .select(
            "trt",
            "y",
            # integer floor division on BOTH sides: DuckDB's
            # CAST(double AS BIGINT) rounds while Spark's truncates
            F.least(
                F.lit(3),
                F.expr("((us - lo) * 3) div (hi - lo + 1)") + 1,
            ).alias("lk"),
        )
        .groupBy("lk")
        .agg(
            F.sum(F.col("trt").cast("bigint")).alias("nt_i"),
            F.sum((1 - F.col("trt")).cast("bigint")).alias("nc_i"),
            F.sum(F.col("y") * F.col("trt")).alias("yt_i"),
            F.sum(F.col("y") * (1 - F.col("trt"))).alias("yc_i"),
        )
    )
    wcum = Window.orderBy("lk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = looks.select(
        "lk",
        F.sum("nt_i").over(wcum).alias("nt"),
        F.sum("nc_i").over(wcum).alias("nc"),
        F.sum("yt_i").over(wcum).alias("yt"),
        F.sum("yc_i").over(wcum).alias("yc"),
    )
    pt = F.col("yt") * 1.0 / F.col("nt")
    pc = F.col("yc") * 1.0 / F.col("nc")
    pp = (F.col("yt") + F.col("yc")) * 1.0 / (F.col("nt") + F.col("nc"))
    z = (pt - pc) / F.sqrt(
        pp * (1.0 - pp) * (1.0 / F.col("nt") + 1.0 / F.col("nc"))
    )
    bound = (
        F.when(F.col("lk") == 1, 3.471)
        .when(F.col("lk") == 2, 2.454)
        .otherwise(2.004)
    )
    base = cum.select(
        F.col("lk").cast("bigint").alias("look"),
        (F.col("nt") + F.col("nc")).cast("bigint").alias("n_cum"),
        F.round(z, 6).alias("z_stat"),
        bound.alias("obf_bound"),
        (F.abs(F.round(z, 6)) > bound).alias("crossed"),
    )
    wrun = Window.orderBy("look").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return base.select(
        "look", "n_cum", "z_stat", "obf_bound", "crossed",
        (F.max(F.col("crossed").cast("int")).over(wrun) == 1).alias(
            "stopped_by_now"
        ),
    )


SQL_SEQUENTIAL_OBF = """
WITH o AS (SELECT epoch_us(o_orderdate::TIMESTAMP) us,
                  CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END trt,
                  CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END y
           FROM orders),
span AS (SELECT min(us) lo, max(us) hi FROM o),
looks AS (SELECT least(3, ((us - lo) * 3) // (hi - lo + 1) + 1)
            lk,
            sum(trt) nt_i, sum(1 - trt) nc_i,
            sum(y * trt) yt_i, sum(y * (1 - trt)) yc_i
          FROM o CROSS JOIN span GROUP BY 1),
cum AS (SELECT lk,
          sum(nt_i) OVER w nt, sum(nc_i) OVER w nc,
          sum(yt_i) OVER w yt, sum(yc_i) OVER w yc
        FROM looks
        WINDOW w AS (ORDER BY lk ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)),
z AS (SELECT lk, nt + nc n_cum,
        round((yt * 1.0 / nt - yc * 1.0 / nc) /
              sqrt(((yt + yc) * 1.0 / (nt + nc))
                   * (1.0 - (yt + yc) * 1.0 / (nt + nc))
                   * (1.0 / nt + 1.0 / nc)), 6) z_stat,
        (CASE lk WHEN 1 THEN 3.471 WHEN 2 THEN 2.454 ELSE 2.004 END)::DOUBLE
          obf_bound
      FROM cum)
SELECT CAST(lk AS BIGINT) look, CAST(n_cum AS BIGINT) n_cum, z_stat,
       obf_bound, (abs(z_stat) > obf_bound) crossed,
       (max(CASE WHEN abs(z_stat) > obf_bound THEN 1 ELSE 0 END)
          OVER (ORDER BY lk ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) = 1) stopped_by_now
FROM z"""


def q_did_estimator(spark, sf_dir):
    """Difference-in-differences on the 2×2 (treated nation ×
    before/after) grid: treated = odd nationkey, the period break is
    the exact midpoint of the order timeline (integer µs — no
    percentile), outcome = order price in exact cents. DiD =
    (ȳ_t,post − ȳ_t,pre) − (ȳ_c,post − ȳ_c,pre) with the classic
    4-cell SE = sqrt(Σ s²_g/n_g); cell variances use Σy² in
    DECIMAL(38)/HUGEINT so every accumulation is exact. One grouped
    aggregate; the 4-cell grid is driver-free."""
    o = (
        _t(spark, sf_dir, "orders")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            (F.col("c_nationkey") % 2 == 1).cast("int").alias("trt"),
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("us"),
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("c"),
        )
    )
    span = o.agg(
        ((F.min("us") + F.max("us")) / 2).cast("bigint").alias("mid")
    ).localCheckpoint(eager=True)
    cells = (
        o.crossJoin(F.broadcast(span))
        .select(
            "trt",
            (F.col("us") >= F.col("mid")).cast("int").alias("post"),
            "c",
        )
        .groupBy("trt", "post")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("c").cast("bigint").alias("s"),
            F.sum(
                F.col("c").cast("decimal(19,0)") * F.col("c").cast("decimal(19,0)")
            ).alias("ss"),
        )
    )
    m = F.col("s") * 1.0 / F.col("n")
    var_over_n = (
        (F.col("ss").cast("double") - F.col("s") * m)
        / (F.col("n") - 1)
        / F.col("n")
    )
    g = cells.select(
        "trt", "post",
        m.alias("mean_c"),
        var_over_n.alias("von"),
        F.col("n"),
    )
    agg = g.groupBy().pivot("trt", [0, 1]).agg(
        F.max(F.when(F.col("post") == 0, F.col("mean_c"))).alias("pre"),
        F.max(F.when(F.col("post") == 1, F.col("mean_c"))).alias("post"),
        F.sum("von").alias("von"),
        F.sum("n").alias("n"),
    )
    did = (
        (F.col("1_post") - F.col("1_pre"))
        - (F.col("0_post") - F.col("0_pre"))
    ) / 100.0
    se = F.sqrt(F.col("0_von") + F.col("1_von")) / 100.0
    return agg.select(
        (F.col("0_n") + F.col("1_n")).cast("bigint").alias("n_orders"),
        F.round(F.col("0_pre") / 100.0, 6).alias("control_pre"),
        F.round(F.col("0_post") / 100.0, 6).alias("control_post"),
        F.round(F.col("1_pre") / 100.0, 6).alias("treated_pre"),
        F.round(F.col("1_post") / 100.0, 6).alias("treated_post"),
        F.round(did, 6).alias("did"),
        F.round(se, 6).alias("se"),
        F.round(did / se, 6).alias("t_stat"),
    )


SQL_DID_ESTIMATOR = """
WITH o AS (SELECT CASE WHEN c_nationkey % 2 = 1 THEN 1 ELSE 0 END trt,
                  epoch_us(o_orderdate::TIMESTAMP) us,
                  CAST(round(o_totalprice * 100, 0) AS BIGINT) c
           FROM orders JOIN customer ON o_custkey = c_custkey),
span AS (SELECT CAST((min(us) + max(us)) / 2 AS BIGINT) mid FROM o),
cells AS (SELECT trt,
            CASE WHEN us >= (SELECT mid FROM span) THEN 1 ELSE 0 END post,
            CAST(count(*) AS BIGINT) n, CAST(sum(c) AS BIGINT) s,
            sum(c::HUGEINT * c::HUGEINT) ss
          FROM o GROUP BY 1, 2),
g AS (SELECT trt, post, s * 1.0 / n mean_c,
        (ss::DOUBLE - s * (s * 1.0 / n)) / (n - 1) / n von, n
      FROM cells),
p AS (SELECT
        max(CASE WHEN trt = 0 AND post = 0 THEN mean_c END) c_pre,
        max(CASE WHEN trt = 0 AND post = 1 THEN mean_c END) c_post,
        max(CASE WHEN trt = 1 AND post = 0 THEN mean_c END) t_pre,
        max(CASE WHEN trt = 1 AND post = 1 THEN mean_c END) t_post,
        sum(von) von, CAST(sum(n) AS BIGINT) n
      FROM g)
SELECT n n_orders,
       round(c_pre / 100.0, 6) control_pre,
       round(c_post / 100.0, 6) control_post,
       round(t_pre / 100.0, 6) treated_pre,
       round(t_post / 100.0, 6) treated_post,
       round(((t_post - t_pre) - (c_post - c_pre)) / 100.0, 6) did,
       round(sqrt(von) / 100.0, 6) se,
       round((((t_post - t_pre) - (c_post - c_pre)) / 100.0)
             / (sqrt(von) / 100.0), 6) t_stat
FROM p"""


def q_rake_keyphrases(spark, sf_dir):
    """RAKE keyphrase extraction (Rose et al. 2010): candidate
    phrases are maximal runs of content words (length ≥ 4 — same
    stopword proxy as textrank_keywords) found with the classic
    gaps-and-islands trick (pos − row_number is constant within a
    run); word score = degree/frequency where degree counts phrase
    lengths per occurrence; phrase score = Σ word scores, quantized
    to micro-int per term so the sum is exact. Top 15 distinct
    phrases. Scale: one posexplode, two bounded-key aggregates, one
    broadcast join of word scores back onto phrase members."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.posexplode(
            F.split(F.lower(F.trim(F.col("text"))), " ")
        ).alias("pos", "w"),
    ).where((F.col("w") != "") & (F.length("w") >= 4))
    wisl = Window.partitionBy("doc_id").orderBy("pos")
    runs = tok.select(
        "doc_id", "pos", "w",
        (F.col("pos") - F.row_number().over(wisl)).alias("grp"),
    ).localCheckpoint(eager=True)
    plen = runs.groupBy("doc_id", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("len")
    )
    members = runs.join(plen, ["doc_id", "grp"])
    wscore = (
        members.groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum("len").cast("bigint").alias("deg"),
        )
        .select(
            "w",
            F.round(F.col("deg") * 1e6 / F.col("freq"), 0)
            .cast("bigint")
            .alias("su"),
        )
    )
    phrases = (
        members.join(F.broadcast(wscore), "w")
        .groupBy("doc_id", "grp")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda x: x["w"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("su").alias("su"),
        )
    )
    return (
        phrases.groupBy("phrase")
        .agg(
            F.max("n_words").alias("n_words"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.round(F.max("su") / 1e6, 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), "phrase")
        .limit(15)
    )


SQL_RAKE_KEYPHRASES = """
WITH tok AS (
  SELECT doc_id, i - 1 AS pos, t w
  FROM (SELECT doc_id, generate_subscripts(ws, 1) i, unnest(ws) t
        FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') ws
              FROM documents))
  WHERE t <> '' AND length(t) >= 4),
runs AS (SELECT doc_id, pos, w,
           pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) grp
         FROM tok),
plen AS (SELECT doc_id, grp, CAST(count(*) AS BIGINT) len
         FROM runs GROUP BY 1, 2),
members AS (SELECT runs.doc_id, runs.grp, pos, w, len
            FROM runs JOIN plen ON runs.doc_id = plen.doc_id
                              AND runs.grp = plen.grp),
wscore AS (SELECT w,
             CAST(round(sum(len) * 1e6 / count(*), 0) AS BIGINT) su
           FROM members GROUP BY 1),
phrases AS (SELECT members.doc_id, members.grp,
              string_agg(members.w, ' ' ORDER BY pos) phrase,
              CAST(count(*) AS BIGINT) n_words,
              sum(su) su
            FROM members JOIN wscore ON members.w = wscore.w
            GROUP BY 1, 2)
SELECT phrase, CAST(max(n_words) AS BIGINT) n_words,
       CAST(count(*) AS BIGINT) n_occurrences,
       round(max(su) / 1e6, 6) score
FROM phrases GROUP BY phrase
ORDER BY score DESC, phrase LIMIT 15"""


def q_decision_stump_gain(spark, sf_dir):
    """Best single decision stump 'n_chars ≤ θ' predicting
    lang = 'en' by exact Gini information gain: candidate thresholds
    are the distinct n_chars values, gain computed from integer
    prefix sums over the (bounded, value-distinct) candidate grain —
    the split-finding kernel of every distributed tree learner,
    O(distinct values), not O(n²). Argmax on the 6dp-rounded gain,
    smaller threshold wins ties."""
    d = _t(spark, sf_dir, "documents").select(
        "n_chars", (F.col("lang") == "en").cast("bigint").alias("y")
    )
    vals = d.groupBy("n_chars").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("p"),
    )
    wcum = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = vals.select(
        "n_chars",
        F.sum("n").over(wcum).alias("nl"),
        F.sum("p").over(wcum).alias("pl"),
        F.sum("n").over(wall).alias("nn"),
        F.sum("p").over(wall).alias("pp"),
    )
    pl_rate = F.col("pl") * 1.0 / F.col("nl")
    pr_rate = (F.col("pp") - F.col("pl")) * 1.0 / (F.col("nn") - F.col("nl"))
    pa_rate = F.col("pp") * 1.0 / F.col("nn")
    g_parent = 2.0 * pa_rate * (1.0 - pa_rate)
    g_left = 2.0 * pl_rate * (1.0 - pl_rate)
    g_right = 2.0 * pr_rate * (1.0 - pr_rate)
    gain = g_parent - (
        F.col("nl") * 1.0 / F.col("nn") * g_left
        + (F.col("nn") - F.col("nl")) * 1.0 / F.col("nn") * g_right
    )
    cand = cum.where(F.col("nl") < F.col("nn")).select(
        "n_chars", "nl", "nn", "pl", "pp",
        F.round(gain, 6).alias("gain"),
        F.round(g_parent, 6).alias("gini_parent"),
    )
    return (
        cand.orderBy(F.col("gain").desc(), "n_chars")
        .limit(1)
        .select(
            F.col("n_chars").alias("threshold"),
            F.col("nl").cast("bigint").alias("n_left"),
            (F.col("nn") - F.col("nl")).cast("bigint").alias("n_right"),
            "gini_parent",
            F.col("gain").alias("best_gain"),
            F.round(F.col("pl") * 1.0 / F.col("nl"), 6).alias("left_pos_rate"),
            F.round(
                (F.col("pp") - F.col("pl")) * 1.0
                / (F.col("nn") - F.col("nl")),
                6,
            ).alias("right_pos_rate"),
        )
    )


SQL_DECISION_STUMP_GAIN = """
WITH d AS (SELECT n_chars,
                  CASE WHEN lang = 'en' THEN 1 ELSE 0 END y
           FROM documents),
vals AS (SELECT n_chars, CAST(count(*) AS BIGINT) n,
                CAST(sum(y) AS BIGINT) p
         FROM d GROUP BY 1),
cum AS (SELECT n_chars,
          sum(n) OVER (ORDER BY n_chars) nl,
          sum(p) OVER (ORDER BY n_chars) pl,
          sum(n) OVER () nn, sum(p) OVER () pp
        FROM vals),
cand AS (SELECT n_chars, nl, nn, pl, pp,
           round(2.0 * (pp * 1.0 / nn) * (1.0 - pp * 1.0 / nn)
                 - (nl * 1.0 / nn * (2.0 * (pl * 1.0 / nl)
                                     * (1.0 - pl * 1.0 / nl))
                    + (nn - nl) * 1.0 / nn
                      * (2.0 * ((pp - pl) * 1.0 / (nn - nl))
                         * (1.0 - (pp - pl) * 1.0 / (nn - nl)))), 6) gain,
           round(2.0 * (pp * 1.0 / nn) * (1.0 - pp * 1.0 / nn), 6)
             gini_parent
         FROM cum WHERE nl < nn)
SELECT n_chars threshold, CAST(nl AS BIGINT) n_left,
       CAST(nn - nl AS BIGINT) n_right, gini_parent, gain best_gain,
       round(pl * 1.0 / nl, 6) left_pos_rate,
       round((pp - pl) * 1.0 / (nn - nl), 6) right_pos_rate
FROM cand ORDER BY gain DESC, n_chars LIMIT 1"""


def q_greedy_set_cover(spark, sf_dir):
    """Greedy max-coverage data selection: 5 greedy rounds, each
    picking the document covering the most still-uncovered words of
    the top-500 content vocabulary (ties → min doc_id) — the
    facility-location/coreset heuristic behind 'which docs to keep
    for vocabulary coverage', with its (1-1/e) guarantee. The
    universe is the top-500 word-trigram shingles (the fixture's
    word vocabulary is a closed 31-word set; shingles carry
    identity); a document holds ≤ ~100 shingles, so 5 rounds can
    never exhaust the universe at any SF. Per round: one anti-join
    gain count + a map-side top-1; the covered set (≤500 shingles)
    broadcasts. Returns the coverage curve."""
    docs = _t(spark, sf_dir, "documents")
    tok = dd.word_shingles(docs, 3, distinct=False).withColumnRenamed(
        "shingle", "w"
    )
    top = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "w")
        .limit(500)
        .select("w")
        .localCheckpoint(eager=True)
    )
    n_univ = top.count()
    dw = (
        tok.join(F.broadcast(top), "w")
        .select("doc_id", "w")
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark_ = docs.sparkSession
    covered = spark_.createDataFrame([], "w string").localCheckpoint(
        eager=True
    )
    out = []
    cum = 0
    for r in range(1, 6):
        gain = (
            dw.join(F.broadcast(covered), "w", "left_anti")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("g"))
            .orderBy(F.col("g").desc(), "doc_id")
            .limit(1)
            .collect()
        )
        pick, g = int(gain[0]["doc_id"]), int(gain[0]["g"])
        cum += g
        out.append((r, pick, g, cum, round(cum / n_univ, 6)))
        covered = (
            covered.unionAll(
                dw.where(F.col("doc_id") == pick).select("w")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
    return spark_.createDataFrame(
        out,
        "round bigint, doc_id bigint, gain bigint, covered bigint, "
        "coverage_share double",
    )


def _cover_round_sql(i: int) -> str:
    prev_cov = (
        "SELECT w FROM dw WHERE FALSE"
        if i == 1
        else f"SELECT w FROM cov{i - 1}"
    )
    prev_cum = "0" if i == 1 else f"(SELECT cum FROM cum{i - 1})"
    return f""",
gain{i} AS (SELECT doc_id, CAST(count(*) AS BIGINT) g FROM dw
            WHERE w NOT IN ({prev_cov}) GROUP BY 1),
pick{i} AS (SELECT doc_id, g FROM gain{i} ORDER BY g DESC, doc_id LIMIT 1),
cov{i} AS MATERIALIZED (SELECT w FROM ({prev_cov})
           UNION SELECT w FROM dw
           WHERE doc_id = (SELECT doc_id FROM pick{i})),
cum{i} AS (SELECT {prev_cum} + (SELECT g FROM pick{i}) cum)"""


SQL_GREEDY_SET_COVER = (
    """
WITH d AS (SELECT doc_id, string_split(trim(text), ' ') ws FROM documents),
tokp AS (SELECT doc_id, generate_subscripts(ws, 1) i, unnest(ws) t FROM d),
tri AS (SELECT doc_id,
               t || ' ' || lead(t, 1) OVER win || ' ' || lead(t, 2) OVER win
                 AS w,
               lead(t, 2) OVER win l2
        FROM tokp WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
tok AS (SELECT doc_id, w FROM tri WHERE l2 IS NOT NULL),
top AS (SELECT w FROM (SELECT w, count(*) cnt FROM tok GROUP BY 1)
        ORDER BY cnt DESC, w LIMIT 500),
dw AS MATERIALIZED (SELECT DISTINCT doc_id, tok.w FROM tok JOIN top ON tok.w = top.w),
nu AS (SELECT count(*) n FROM top)"""
    + "".join(_cover_round_sql(i) for i in (1, 2, 3, 4, 5))
    + """
SELECT CAST(1 AS BIGINT) round,
       (SELECT doc_id FROM pick1) doc_id, (SELECT g FROM pick1) gain,
       (SELECT CAST(cum AS BIGINT) FROM cum1) covered,
       round((SELECT cum FROM cum1) * 1.0 / (SELECT n FROM nu), 6)
         coverage_share
UNION ALL SELECT 2, (SELECT doc_id FROM pick2), (SELECT g FROM pick2),
       (SELECT cum FROM cum2),
       round((SELECT cum FROM cum2) * 1.0 / (SELECT n FROM nu), 6)
UNION ALL SELECT 3, (SELECT doc_id FROM pick3), (SELECT g FROM pick3),
       (SELECT cum FROM cum3),
       round((SELECT cum FROM cum3) * 1.0 / (SELECT n FROM nu), 6)
UNION ALL SELECT 4, (SELECT doc_id FROM pick4), (SELECT g FROM pick4),
       (SELECT cum FROM cum4),
       round((SELECT cum FROM cum4) * 1.0 / (SELECT n FROM nu), 6)
UNION ALL SELECT 5, (SELECT doc_id FROM pick5), (SELECT g FROM pick5),
       (SELECT cum FROM cum5),
       round((SELECT cum FROM cum5) * 1.0 / (SELECT n FROM nu), 6)"""
)


def q_mmr_diversified_topk(spark, sf_dir):
    """Maximal-Marginal-Relevance diversified retrieval: query = the
    label-0 centroid, candidates = top-20 by relevance cosine, then 5
    greedy MMR picks with score = 0.7·rel − 0.3·max-sim-to-selected
    (Carbonell & Goldstein 1998). Same integer discipline as
    label_centroid_cosine: embeddings quantize to micro-ints, dots in
    DECIMAL(38), cosines re-quantized to micro BEFORE any ordering or
    max — every tie-break is integer-exact in both engines. The
    greedy loop runs at the 20-candidate grain (pair-sim table 20×20,
    broadcast); relevance is one (dim)-join aggregate over the corpus
    — the part that scales."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("d", "v"),
    ).select(
        "vec_id", "label", "d",
        F.round(F.col("v").cast("double") * 1_000_000, 0)
        .cast("bigint")
        .alias("q"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    cen = emb.where(F.col("label") == 0).groupBy("d").agg(
        F.sum("q").alias("c")
    )
    vec = emb.select("vec_id", "d", "q")
    rel = (
        vec.join(F.broadcast(cen), "d")
        .groupBy("vec_id")
        .agg(
            F.sum(dec("q") * dec("c")).alias("_dot"),
            F.sum(dec("q") * dec("q")).alias("_nq"),
            F.max(dec("c") * dec("c")).alias("_one"),
        )
    )
    cn2 = cen.agg(F.sum(dec("c") * dec("c")).alias("_nc"))
    rel = (
        rel.crossJoin(F.broadcast(cn2))
        .select(
            "vec_id",
            F.round(
                F.col("_dot").cast("double")
                / (
                    F.sqrt(F.col("_nq").cast("double"))
                    * F.sqrt(F.col("_nc").cast("double"))
                )
                * 1e6,
                0,
            )
            .cast("bigint")
            .alias("rel_u"),
        )
    )
    cands = (
        rel.orderBy(F.col("rel_u").desc(), "vec_id")
        .limit(20)
        .localCheckpoint(eager=True)
    )
    cvec = vec.join(
        F.broadcast(cands.select("vec_id")), "vec_id"
    ).localCheckpoint(eager=True)
    a = cvec.select(F.col("vec_id").alias("va"), "d", F.col("q").alias("qa"))
    b = cvec.select(F.col("vec_id").alias("vb"), "d", F.col("q").alias("qb"))
    sims = (
        a.join(F.broadcast(b), "d")
        .where(F.col("va") != F.col("vb"))
        .groupBy("va", "vb")
        .agg(
            F.sum(dec("qa") * dec("qb")).alias("_dot"),
            F.sum(dec("qa") * dec("qa")).alias("_na"),
            F.sum(dec("qb") * dec("qb")).alias("_nb"),
        )
        .select(
            "va", "vb",
            F.round(
                F.col("_dot").cast("double")
                / (
                    F.sqrt(F.col("_na").cast("double"))
                    * F.sqrt(F.col("_nb").cast("double"))
                )
                * 1e6,
                0,
            )
            .cast("bigint")
            .alias("su"),
        )
        .localCheckpoint(eager=True)
    )
    picked: list[int] = []
    out = []
    for r in range(1, 6):
        if picked:
            ms = (
                sims.where(F.col("vb").isin(picked))
                .groupBy("va")
                .agg(F.max("su").alias("ms"))
            )
            scored = (
                cands.join(ms, cands["vec_id"] == ms["va"], "left")
                .select(
                    "vec_id", "rel_u",
                    F.coalesce(F.col("ms"), F.lit(0)).alias("ms"),
                )
            )
        else:
            scored = cands.select(
                "vec_id", "rel_u", F.lit(0).cast("bigint").alias("ms")
            )
        scored = scored.where(~F.col("vec_id").isin(picked)) if picked else scored
        scored = scored.select(
            "vec_id", "rel_u", "ms",
            F.round(0.7 * F.col("rel_u") - 0.3 * F.col("ms"), 0)
            .cast("bigint")
            .alias("sc"),
        )
        top = scored.orderBy(F.col("sc").desc(), "vec_id").limit(1).collect()[0]
        picked.append(int(top["vec_id"]))
        out.append(
            (
                r,
                int(top["vec_id"]),
                round(int(top["rel_u"]) / 1e6, 6),
                round(int(top["ms"]) / 1e6, 6),
                round(int(top["sc"]) / 1e6, 6),
            )
        )
    return spark.createDataFrame(
        out,
        "round bigint, vec_id bigint, relevance double, "
        "max_sim_selected double, mmr_score double",
    )


def _mmr_round_sql(i: int) -> str:
    if i == 1:
        scored = """
sc1 AS (SELECT vec_id, rel_u, CAST(0 AS BIGINT) ms,
          CAST(round(0.7 * rel_u - 0.3 * 0, 0) AS BIGINT) sc
        FROM cands),
pick1 AS (SELECT * FROM sc1 ORDER BY sc DESC, vec_id LIMIT 1),
sel1 AS MATERIALIZED (SELECT vec_id FROM pick1)"""
        return scored
    return f""",
ms{i} AS (SELECT va, max(su) ms FROM sims
          WHERE vb IN (SELECT vec_id FROM sel{i - 1}) GROUP BY va),
sc{i} AS (SELECT c.vec_id, c.rel_u, coalesce(ms, 0) ms,
            CAST(round(0.7 * c.rel_u - 0.3 * coalesce(ms, 0), 0) AS BIGINT)
              sc
          FROM cands c LEFT JOIN ms{i} ON c.vec_id = ms{i}.va
          WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})),
pick{i} AS (SELECT * FROM sc{i} ORDER BY sc DESC, vec_id LIMIT 1),
sel{i} AS MATERIALIZED (SELECT vec_id FROM sel{i - 1}
           UNION ALL SELECT vec_id FROM pick{i})"""


SQL_MMR_DIVERSIFIED_TOPK = (
    """
WITH e AS (SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 d,
                  CAST(round(unnest(embedding)::DOUBLE * 1000000, 0)
                       AS BIGINT) q
           FROM embeddings),
cen AS (SELECT d, sum(q) c FROM e WHERE label = 0 GROUP BY 1),
cn2 AS (SELECT sum(c::HUGEINT * c::HUGEINT) nc FROM cen),
rel AS (SELECT vec_id,
          CAST(round(sum(q::HUGEINT * c::HUGEINT)::DOUBLE
                     / (sqrt(sum(q::HUGEINT * q::HUGEINT)::DOUBLE)
                        * sqrt((SELECT nc FROM cn2)::DOUBLE)) * 1e6, 0)
               AS BIGINT) rel_u
        FROM e JOIN cen USING (d) GROUP BY vec_id),
cands AS MATERIALIZED (SELECT vec_id, rel_u FROM rel
          ORDER BY rel_u DESC, vec_id LIMIT 20),
cv AS (SELECT e.vec_id, d, q FROM e
       JOIN cands ON e.vec_id = cands.vec_id),
sims AS MATERIALIZED (SELECT a.vec_id va, b.vec_id vb,
           CAST(round(sum(a.q::HUGEINT * b.q::HUGEINT)::DOUBLE
                      / (sqrt(sum(a.q::HUGEINT * a.q::HUGEINT)::DOUBLE)
                         * sqrt(sum(b.q::HUGEINT * b.q::HUGEINT)::DOUBLE))
                      * 1e6, 0) AS BIGINT) su
         FROM cv a JOIN cv b ON a.d = b.d AND a.vec_id <> b.vec_id
         GROUP BY 1, 2),
"""
    + "".join(_mmr_round_sql(i) for i in (1, 2, 3, 4, 5))
    + """
SELECT CAST(1 AS BIGINT) round, vec_id, round(rel_u / 1e6, 6) relevance,
       round(ms / 1e6, 6) max_sim_selected, round(sc / 1e6, 6) mmr_score
FROM pick1
UNION ALL SELECT 2, vec_id, round(rel_u / 1e6, 6), round(ms / 1e6, 6),
       round(sc / 1e6, 6) FROM pick2
UNION ALL SELECT 3, vec_id, round(rel_u / 1e6, 6), round(ms / 1e6, 6),
       round(sc / 1e6, 6) FROM pick3
UNION ALL SELECT 4, vec_id, round(rel_u / 1e6, 6), round(ms / 1e6, 6),
       round(sc / 1e6, 6) FROM pick4
UNION ALL SELECT 5, vec_id, round(rel_u / 1e6, 6), round(ms / 1e6, 6),
       round(sc / 1e6, 6) FROM pick5"""
)


def q_greedy_matching(spark, sf_dir):
    """Greedy maximum-weight matching on the part co-purchase graph
    (weight = number of co-occurring orders): 5 rounds, each taking
    the heaviest edge whose endpoints are both still free (ties →
    (src, dst) asc) — the ½-approximation that pairs up correlated
    items for bundling. Per round one anti-filter + map-side top-1;
    the matched set (≤10 ids) broadcasts as an isin literal."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    lb = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb")
    )
    edges = (
        li.join(
            lb,
            (F.col("l_orderkey") == F.col("ok"))
            & (F.col("l_partkey") < F.col("pb")),
        )
        .groupBy(
            F.col("l_partkey").alias("s"), F.col("pb").alias("d")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .localCheckpoint(eager=True)
    )
    matched: list[int] = []
    out = []
    cum = 0
    for r in range(1, 6):
        free = edges
        if matched:
            free = edges.where(
                ~F.col("s").isin(matched) & ~F.col("d").isin(matched)
            )
        top = free.orderBy(F.col("w").desc(), "s", "d").limit(1).collect()[0]
        s_, d_, w_ = int(top["s"]), int(top["d"]), int(top["w"])
        matched.extend([s_, d_])
        cum += w_
        out.append((r, s_, d_, w_, cum))
    return spark.createDataFrame(
        out,
        "round bigint, src bigint, dst bigint, weight bigint, "
        "cum_weight bigint",
    )


def _match_round_sql(i: int) -> str:
    if i == 1:
        return """
pick1 AS (SELECT s, d, w FROM edges ORDER BY w DESC, s, d LIMIT 1),
m1 AS MATERIALIZED (SELECT s x FROM pick1 UNION ALL SELECT d FROM pick1)"""
    return f""",
pick{i} AS (SELECT s, d, w FROM edges
            WHERE s NOT IN (SELECT x FROM m{i - 1})
              AND d NOT IN (SELECT x FROM m{i - 1})
            ORDER BY w DESC, s, d LIMIT 1),
m{i} AS MATERIALIZED (SELECT x FROM m{i - 1}
         UNION ALL SELECT s FROM pick{i} UNION ALL SELECT d FROM pick{i})"""


SQL_GREEDY_MATCHING = (
    """
WITH edges AS MATERIALIZED (SELECT a.l_partkey s, b.l_partkey d,
                      CAST(count(*) AS BIGINT) w
               FROM lineitem a JOIN lineitem b
                 ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey
               GROUP BY 1, 2),
"""
    + "".join(_match_round_sql(i) for i in (1, 2, 3, 4, 5))
    + """
SELECT CAST(1 AS BIGINT) round, s src, d dst, w weight,
       (SELECT w FROM pick1) cum_weight FROM pick1
UNION ALL SELECT 2, s, d, w,
       (SELECT w FROM pick1) + (SELECT w FROM pick2) FROM pick2
UNION ALL SELECT 3, s, d, w,
       (SELECT w FROM pick1) + (SELECT w FROM pick2)
       + (SELECT w FROM pick3) FROM pick3
UNION ALL SELECT 4, s, d, w,
       (SELECT w FROM pick1) + (SELECT w FROM pick2)
       + (SELECT w FROM pick3) + (SELECT w FROM pick4) FROM pick4
UNION ALL SELECT 5, s, d, w,
       (SELECT w FROM pick1) + (SELECT w FROM pick2)
       + (SELECT w FROM pick3) + (SELECT w FROM pick4)
       + (SELECT w FROM pick5) FROM pick5"""
)


def q_ips_offpolicy(spark, sf_dir):
    """Off-policy evaluation by inverse propensity scoring: the
    target policy recommends, per user segment (user_id % 4), the
    event type with the highest mean reward (exact cents) on the
    FIRST calendar half; it is evaluated on the SECOND half with IPS
    and self-normalized IPS against empirical propensities — the
    counterfactual 'what would this policy have earned' a logged
    interaction corpus answers without an experiment. Per-event IPS
    terms quantize to micro-cents before the sum (discipline b); all
    counts/propensities are exact integers."""
    e = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 4).alias("seg"),
        F.col("event_type").alias("a"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    span = e.agg(
        ((F.min("us") + F.max("us")) / 2).cast("bigint").alias("mid")
    ).localCheckpoint(eager=True)
    e = e.crossJoin(F.broadcast(span)).select(
        "seg", "a", "cents", (F.col("us") >= F.col("mid")).alias("test")
    )
    train = (
        e.where(~F.col("test"))
        .groupBy("seg", "a")
        .agg(
            F.sum("cents").alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    wseg = Window.partitionBy("seg").orderBy(
        (F.col("s") * 1.0 / F.col("n")).desc(), "a"
    )
    target = (
        train.select(
            "seg", "a", F.row_number().over(wseg).alias("rk")
        )
        .where(F.col("rk") == 1)
        .select("seg", F.col("a").alias("tgt"))
        .localCheckpoint(eager=True)
    )
    ev = e.where(F.col("test"))
    prop = ev.groupBy("seg", "a").agg(
        F.count(F.lit(1)).cast("bigint").alias("na")
    )
    nseg = ev.groupBy("seg").agg(F.count(F.lit(1)).cast("bigint").alias("ns"))
    scored = (
        ev.join(F.broadcast(target), "seg")
        .join(F.broadcast(prop), ["seg", "a"])
        .join(F.broadcast(nseg), "seg")
        .select(
            "cents",
            (F.col("a") == F.col("tgt")).cast("bigint").alias("match"),
            (F.col("na") * 1.0 / F.col("ns")).alias("p"),
        )
    )
    terms = scored.select(
        "match",
        "cents",
        F.round(F.col("match") / F.col("p") * 1e6, 0)
        .cast("bigint")
        .alias("w_u"),
        F.round(F.col("match") * F.col("cents") / F.col("p") * 1e6, 0)
        .cast("bigint")
        .alias("wr_u"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        F.sum("cents").alias("sum_cents"),
        F.sum("match").cast("bigint").alias("n_match"),
        F.sum("w_u").alias("sw"),
        F.sum("wr_u").alias("swr"),
    )
    return agg.select(
        "n_eval",
        F.round(F.col("sum_cents") / (F.col("n_eval") * 100.0), 6).alias(
            "behavior_value"
        ),
        F.round(F.col("swr") / (F.col("n_eval") * 1e8), 6).alias("ips_value"),
        F.round(F.col("swr") / (F.col("sw") * 100.0), 6).alias("snips_value"),
        F.round(F.col("n_match") * 1.0 / F.col("n_eval"), 6).alias(
            "match_rate"
        ),
    )


SQL_IPS_OFFPOLICY = """
WITH e0 AS (SELECT user_id % 4 seg, event_type a,
                   epoch_us(ts) us,
                   CAST(round(value * 100, 0) AS BIGINT) cents
            FROM events),
span AS (SELECT CAST((min(us) + max(us)) / 2 AS BIGINT) mid FROM e0),
e AS (SELECT seg, a, cents, us >= (SELECT mid FROM span) test FROM e0),
train AS (SELECT seg, a, sum(cents) s, count(*) n
          FROM e WHERE NOT test GROUP BY 1, 2),
target AS (SELECT seg, a tgt FROM (
             SELECT seg, a, row_number() OVER
               (PARTITION BY seg ORDER BY s * 1.0 / n DESC, a) rk
             FROM train) WHERE rk = 1),
ev AS (SELECT * FROM e WHERE test),
prop AS (SELECT seg, a, CAST(count(*) AS BIGINT) na FROM ev GROUP BY 1, 2),
nseg AS (SELECT seg, CAST(count(*) AS BIGINT) ns FROM ev GROUP BY 1),
terms AS (SELECT cents,
            CASE WHEN ev.a = tgt THEN 1 ELSE 0 END mt,
            CAST(round(CASE WHEN ev.a = tgt THEN 1 ELSE 0 END
                       / (na * 1.0 / ns) * 1e6, 0) AS BIGINT) w_u,
            CAST(round(CASE WHEN ev.a = tgt THEN 1 ELSE 0 END * cents
                       / (na * 1.0 / ns) * 1e6, 0) AS BIGINT) wr_u
          FROM ev JOIN target USING (seg)
                  JOIN prop ON prop.seg = ev.seg AND prop.a = ev.a
                  JOIN nseg ON nseg.seg = ev.seg)
SELECT CAST(count(*) AS BIGINT) n_eval,
       round(sum(cents) / (count(*) * 100.0), 6) behavior_value,
       round(sum(wr_u) / (count(*) * 1e8), 6) ips_value,
       round(sum(wr_u) / (sum(w_u) * 100.0), 6) snips_value,
       round(sum(mt) * 1.0 / count(*), 6) match_rate
FROM terms"""


def q_fellegi_sunter(spark, sf_dir):
    """Fellegi-Sunter record-linkage weights: m = P(feature agrees |
    match) from the exact near-dup pairs (J ≥ 0.5), u = P(agrees |
    non-match) from a deterministic rank-offset pairing (doc r with
    doc r + n/2 in id order, known-match pairs anti-joined out),
    Laplace-smoothed, weight = log2(m/u) — the agreement weights a
    probabilistic linker scores candidate pairs with. Features: same
    lang, same source, |Δ n_chars| ≤ 50, shares a trigram shingle.
    All counts exact; one row per feature."""
    docs = _t(spark, sf_dir, "documents")
    meta = docs.select("doc_id", "lang", "source", "n_chars")
    matches = dd.ngram_jaccard_pairs(docs, 0.5).select("doc_a", "doc_b")
    wrk = Window.orderBy("doc_id")
    ranked = meta.select(
        "doc_id", (F.row_number().over(wrk) - 1).alias("r")
    )
    n_docs = docs.count()
    half = n_docs // 2
    non = (
        ranked.alias("x")
        .join(
            ranked.alias("y"),
            F.col("y.r") == F.col("x.r") + half,
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
        )
        .join(matches, ["doc_a", "doc_b"], "left_anti")
    )
    sh = dd.word_shingles(docs, 3)

    def feats(pairs):
        p = (
            pairs.join(
                meta.select(
                    F.col("doc_id").alias("doc_a"),
                    F.col("lang").alias("la"),
                    F.col("source").alias("sa"),
                    F.col("n_chars").alias("ca"),
                ),
                "doc_a",
            )
            .join(
                meta.select(
                    F.col("doc_id").alias("doc_b"),
                    F.col("lang").alias("lb"),
                    F.col("source").alias("sb"),
                    F.col("n_chars").alias("cb"),
                ),
                "doc_b",
            )
        )
        shared = (
            pairs.join(
                sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a"
            )
            .join(
                sh.select(F.col("doc_id").alias("doc_b"), "shingle"),
                ["doc_b", "shingle"],
            )
            .select("doc_a", "doc_b")
            .distinct()
            .withColumn("sh1", F.lit(1))
        )
        return (
            p.join(shared, ["doc_a", "doc_b"], "left")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum((F.col("la") == F.col("lb")).cast("bigint")).alias(
                    "f_lang"
                ),
                F.sum((F.col("sa") == F.col("sb")).cast("bigint")).alias(
                    "f_source"
                ),
                F.sum(
                    (F.abs(F.col("ca") - F.col("cb")) <= 50).cast("bigint")
                ).alias("f_len"),
                F.sum(F.coalesce(F.col("sh1"), F.lit(0)).cast("bigint")).alias(
                    "f_shingle"
                ),
            )
        )

    mrow = feats(matches).localCheckpoint(eager=True)
    urow = feats(non).localCheckpoint(eager=True)
    ln2 = math.log(2.0)
    rows = []
    for feat in ("lang", "source", "len", "shingle"):
        m = mrow.select(
            F.lit(feat).alias("feature"),
            F.col("n").alias("n_match"),
            ((F.col(f"f_{feat}") + 1) * 1.0 / (F.col("n") + 2)).alias("m"),
        )
        u = urow.select(
            F.col("n").alias("n_nonmatch"),
            ((F.col(f"f_{feat}") + 1) * 1.0 / (F.col("n") + 2)).alias("u"),
        )
        rows.append(
            m.crossJoin(F.broadcast(u)).select(
                "feature",
                "n_match",
                "n_nonmatch",
                F.round("m", 6).alias("m_prob"),
                F.round("u", 6).alias("u_prob"),
                F.round(
                    (F.log(F.col("m") / F.col("u")) / ln2), 6
                ).alias("weight"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


SQL_FELLEGI_SUNTER = f"""
WITH {_TRIGRAM_SQL},
common AS (SELECT a.doc_id da, b.doc_id db, count(*) c FROM sh a
           JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
matches AS (SELECT da doc_a, db doc_b
            FROM common JOIN cnt na ON da = na.doc_id
                        JOIN cnt nb ON db = nb.doc_id
            WHERE c * 1.0 / (na.n + nb.n - c) >= 0.5),
ranked AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 r
           FROM documents),
nd AS (SELECT count(*) n FROM documents),
non AS (SELECT x.doc_id doc_a, y.doc_id doc_b
        FROM ranked x JOIN ranked y
          ON y.r = x.r + (SELECT n // 2 FROM nd)
        WHERE NOT EXISTS (SELECT 1 FROM matches m
                          WHERE m.doc_a = x.doc_id
                            AND m.doc_b = y.doc_id)),
meta AS (SELECT doc_id, lang, source, n_chars FROM documents),
shp AS (SELECT DISTINCT p.doc_a, p.doc_b FROM
          (SELECT doc_a, doc_b FROM matches
           UNION ALL SELECT doc_a, doc_b FROM non) p
        JOIN sh a ON a.doc_id = p.doc_a
        JOIN sh b ON b.doc_id = p.doc_b AND b.s = a.s),
stats AS (
  SELECT is_match, CAST(count(*) AS BIGINT) n,
    CAST(sum(CASE WHEN ma.lang = mb.lang THEN 1 ELSE 0 END) AS BIGINT)
      f_lang,
    CAST(sum(CASE WHEN ma.source = mb.source THEN 1 ELSE 0 END) AS BIGINT)
      f_source,
    CAST(sum(CASE WHEN abs(ma.n_chars - mb.n_chars) <= 50 THEN 1 ELSE 0 END)
         AS BIGINT) f_len,
    CAST(sum(CASE WHEN shp.doc_a IS NULL THEN 0 ELSE 1 END) AS BIGINT)
      f_shingle
  FROM (SELECT doc_a, doc_b, 1 is_match FROM matches
        UNION ALL SELECT doc_a, doc_b, 0 FROM non) p
  JOIN meta ma ON ma.doc_id = p.doc_a
  JOIN meta mb ON mb.doc_id = p.doc_b
  LEFT JOIN shp ON shp.doc_a = p.doc_a AND shp.doc_b = p.doc_b
  GROUP BY 1),
feats(feature) AS (VALUES ('lang'), ('source'), ('len'), ('shingle')),
mu AS (
  SELECT feature,
    (SELECT n FROM stats WHERE is_match = 1) n_match,
    (SELECT n FROM stats WHERE is_match = 0) n_nonmatch,
    (SELECT (CASE feature WHEN 'lang' THEN f_lang WHEN 'source' THEN f_source
             WHEN 'len' THEN f_len ELSE f_shingle END + 1) * 1.0 / (n + 2)
     FROM stats WHERE is_match = 1) m,
    (SELECT (CASE feature WHEN 'lang' THEN f_lang WHEN 'source' THEN f_source
             WHEN 'len' THEN f_len ELSE f_shingle END + 1) * 1.0 / (n + 2)
     FROM stats WHERE is_match = 0) u
  FROM feats)
SELECT feature, n_match, n_nonmatch, round(m, 6) m_prob, round(u, 6) u_prob,
       round(ln(m / u) / 0.6931471805599453, 6) weight
FROM mu"""


def q_pagerank_personalized(spark, sf_dir):
    """Personalized PageRank on the part co-purchase graph, teleport
    restricted to the 10 best-selling parts (seed mass uniform over
    seeds; dangling mass also returns to the seeds) — 'what else
    belongs to the bestseller neighborhood', the recommendation
    variant plain kg_pagerank's global teleport can't express.
    3 iterations in BIGINT nano-units (per-contribution rounding,
    exact seed/dangling redistribution); top-20 by (rank, part)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    lb = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb")
    )
    co = (
        li.join(
            lb,
            (F.col("l_orderkey") == F.col("ok"))
            & (F.col("l_partkey") != F.col("pb")),
        )
        .select(F.col("l_partkey").alias("s"), F.col("pb").alias("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    seeds = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "l_partkey")
        .limit(10)
        .select(F.col("l_partkey").alias("node"))
        .localCheckpoint(eager=True)
    )
    nodes = co.select(F.col("s").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    outdeg = co.groupBy("s").agg(F.count(F.lit(1)).alias("od"))
    seed_mark = seeds.withColumn("is_seed", F.lit(1))
    base = nodes.join(F.broadcast(seed_mark), "node", "left").select(
        "node", F.coalesce(F.col("is_seed"), F.lit(0)).alias("is_seed")
    ).localCheckpoint(eager=True)
    pr = base.select(
        "node",
        (F.col("is_seed") * F.lit(10**9 // 10)).cast("bigint").alias("nano"),
    )
    for _ in range(3):
        contrib = (
            co.join(outdeg, "s")
            .join(pr, co["s"] == pr["node"])
            .select(
                F.col("d"),
                F.round(F.col("nano") * 0.85 / F.col("od"), 0)
                .cast("bigint")
                .alias("t"),
            )
            .groupBy("d")
            .agg(F.sum("t").alias("c"))
        )
        mass = contrib.agg(F.sum("c").alias("mc")).localCheckpoint(eager=True)
        pr = (
            base.join(contrib, base["node"] == contrib["d"], "left")
            .crossJoin(F.broadcast(mass))
            .select(
                "node",
                "is_seed",
                (
                    F.coalesce(F.col("c"), F.lit(0))
                    + F.col("is_seed")
                    * F.expr("((1000000000 - mc) div 10)")
                )
                .cast("bigint")
                .alias("nano"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        pr.orderBy(F.col("nano").desc(), "node")
        .limit(20)
        .select(
            F.col("node").alias("part_id"),
            F.round(F.col("nano") / 1e9, 6).alias("ppr"),
        )
    )


def _ppr_iter_sql(i: int) -> str:
    return f""",
c{i} AS (SELECT d, CAST(sum(CAST(round(nano * 0.85 / od, 0) AS BIGINT))
                  AS BIGINT) c
         FROM co JOIN outdeg USING (s) JOIN pr{i - 1} ON co.s = pr{i - 1}.node
         GROUP BY d),
mc{i} AS (SELECT sum(c) mc FROM c{i}),
pr{i} AS (SELECT base.node, is_seed,
            CAST(coalesce(c, 0)
                 + is_seed * ((1000000000 - (SELECT mc FROM mc{i})) // 10)
                 AS BIGINT) nano
          FROM base LEFT JOIN c{i} ON base.node = c{i}.d)"""


SQL_PAGERANK_PERSONALIZED = (
    """
WITH co AS (SELECT DISTINCT a.l_partkey s, b.l_partkey d
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey <> b.l_partkey),
seeds AS (SELECT l_partkey node FROM (
            SELECT l_partkey, count(*) cnt FROM lineitem GROUP BY 1)
          ORDER BY cnt DESC, l_partkey LIMIT 10),
nodes AS (SELECT DISTINCT s node FROM co),
outdeg AS (SELECT s, count(*) od FROM co GROUP BY 1),
base AS (SELECT nodes.node,
           CASE WHEN seeds.node IS NULL THEN 0 ELSE 1 END is_seed
         FROM nodes LEFT JOIN seeds ON nodes.node = seeds.node),
pr0 AS (SELECT node, is_seed,
          CAST(is_seed * (1000000000 // 10) AS BIGINT) nano FROM base)"""
    + "".join(_ppr_iter_sql(i) for i in (1, 2, 3))
    + """
SELECT node part_id, round(nano / 1e9, 6) ppr FROM pr3
ORDER BY nano DESC, node LIMIT 20"""
)


def q_markov_absorption(spark, sf_dir):
    """Absorption probability into 'purchase' within 3 steps from
    every other event-type state (truncated Chapman-Kolmogorov on the
    absorbing chain): f_{k+1}(i) = p(i→P) + Σ_{j≠P} p(i→j)·f_k(j) —
    'how close is each behavior to a purchase', the directional
    question the stationary/entropy views can't answer. Same BIGINT
    nano discipline as transition_stationary; the recursion runs at
    the K-state grain, 3 unrolled iterations in the oracle."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("u").orderBy("us", "eid")
    pairs = (
        ev.select(
            F.col("user_id").alias("u"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            F.col("event_id").alias("eid"),
            F.col("event_type").alias("src"),
        )
        .select("u", "src", F.lead("src").over(w).alias("dst"))
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = pairs.groupBy("src").agg(F.sum("n").alias("t"))
    tp = (
        pairs.join(F.broadcast(tot), "src")
        .select("src", "dst", (F.col("n") / F.col("t")).alias("p"))
        .where(F.col("src") != "purchase")
        .localCheckpoint(eager=True)
    )
    states = (
        ev.select(F.col("event_type").alias("state"))
        .distinct()
        .where(F.col("state") != "purchase")
        .localCheckpoint(eager=True)
    )
    direct = tp.where(F.col("dst") == "purchase").select(
        F.col("src").alias("state"),
        F.round(F.col("p") * 1e9, 0).cast("bigint").alias("d_nano"),
    )
    base = states.join(F.broadcast(direct), "state", "left").select(
        "state", F.coalesce(F.col("d_nano"), F.lit(0)).alias("d_nano")
    ).localCheckpoint(eager=True)
    f = base.select("state", F.lit(0).cast("bigint").alias("f_nano"))
    for _ in range(3):
        spread = (
            tp.where(F.col("dst") != "purchase")
            .join(f, tp["dst"] == f["state"])
            .select(
                F.col("src"),
                F.round(F.col("p") * F.col("f_nano"), 0)
                .cast("bigint")
                .alias("t"),
            )
            .groupBy("src")
            .agg(F.sum("t").alias("s"))
        )
        f = (
            base.join(F.broadcast(spread), base["state"] == spread["src"], "left")
            .select(
                "state",
                (F.col("d_nano") + F.coalesce(F.col("s"), F.lit(0)))
                .cast("bigint")
                .alias("f_nano"),
            )
            .localCheckpoint(eager=True)
        )
    return f.select(
        "state",
        (F.expr("(f_nano + 500) div 1000") / 1e6).alias("p_absorb_3step"),
    )


def _absorb_iter_sql(i: int) -> str:
    return f""",
sp{i} AS (SELECT src, CAST(sum(CAST(round(p * f_nano, 0) AS BIGINT))
                     AS BIGINT) s
          FROM tp JOIN f{i - 1} ON tp.dst = f{i - 1}.state
          WHERE tp.dst <> 'purchase' GROUP BY src),
f{i} AS (SELECT base.state,
           CAST(d_nano + coalesce(s, 0) AS BIGINT) f_nano
         FROM base LEFT JOIN sp{i} ON base.state = sp{i}.src)"""


SQL_MARKOV_ABSORPTION = (
    """
WITH e AS (SELECT user_id u, epoch_us(ts) us, event_id eid,
                  event_type src FROM events),
seq AS (SELECT u, src,
               lead(src) OVER (PARTITION BY u ORDER BY us, eid) dst
        FROM e),
pairs AS (SELECT src, dst, CAST(count(*) AS BIGINT) n FROM seq
          WHERE dst IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT src, sum(n) t FROM pairs GROUP BY 1),
tp AS (SELECT pairs.src, dst, n * 1.0 / t AS p
       FROM pairs JOIN tot USING (src) WHERE pairs.src <> 'purchase'),
states AS (SELECT DISTINCT event_type state FROM events
           WHERE event_type <> 'purchase'),
direct AS (SELECT src state, CAST(round(p * 1e9, 0) AS BIGINT) d_nano
           FROM tp WHERE dst = 'purchase'),
base AS (SELECT states.state, coalesce(d_nano, 0) d_nano
         FROM states LEFT JOIN direct ON states.state = direct.state),
f0 AS (SELECT state, CAST(0 AS BIGINT) f_nano FROM base)"""
    + "".join(_absorb_iter_sql(i) for i in (1, 2, 3))
    + """
SELECT state, ((f_nano + 500) // 1000) / 1e6 p_absorb_3step FROM f3"""
)


def q_pca_power_iteration(spark, sf_dir):
    """First principal component of the embedding table by 3 power
    iterations on the exact integer covariance — PCA without MLlib,
    and without a single floating accumulation: embeddings quantize
    to micro-ints, the covariance numerator n·Σxy − Σx·Σy runs in
    DECIMAL(38)/HUGEINT, each cell then quantizes once to a shared
    grid (÷n² ÷1e6, round) small enough that every matrix-vector
    product term c·v stays below 2^53 — EXACT bigint sums, no
    per-term rounding at all inside the loop. The iteration runs at
    the dim² (64-cell) grain; sign fixed by making the
    largest-|loading| coordinate positive. Output: per-dim loading +
    the Rayleigh explained-variance share."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.posexplode("embedding").alias("d", "v")
    ).select(
        "vec_id", "d",
        F.round(F.col("v").cast("double") * 1_000_000, 0)
        .cast("bigint")
        .alias("q"),
    )
    n = _t(spark, sf_dir, "embeddings").count()
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    sums = emb.groupBy("d").agg(F.sum("q").alias("s"))
    a = emb.select("vec_id", F.col("d").alias("d1"), F.col("q").alias("q1"))
    b = emb.select(
        F.col("vec_id").alias("v2"), F.col("d").alias("d2"),
        F.col("q").alias("q2"),
    )
    cross = (
        a.join(b, F.col("vec_id") == F.col("v2"))
        .groupBy("d1", "d2")
        .agg(F.sum(dec("q1") * dec("q2")).alias("sxy"))
    )
    s1 = sums.select(F.col("d").alias("d1"), F.col("s").alias("sa"))
    s2 = sums.select(F.col("d").alias("d2"), F.col("s").alias("sb"))
    cov = (
        cross.join(F.broadcast(s1), "d1")
        .join(F.broadcast(s2), "d2")
        .select(
            "d1", "d2",
            F.round(
                (
                    F.lit(float(n)) * F.col("sxy").cast("double")
                    - F.col("sa").cast("double") * F.col("sb")
                )
                / (float(n) * float(n))
                / 1e6,
                0,
            )
            .cast("bigint")
            .alias("c"),
        )
        .localCheckpoint(eager=True)
    )
    dims = cov.select(F.col("d1").alias("d")).distinct().localCheckpoint(
        eager=True
    )
    v = dims.select("d", F.lit(10**9).cast("bigint").alias("nano"))
    for _ in range(3):
        w = (
            cov.join(F.broadcast(v), cov["d2"] == v["d"])
            .select("d1", (F.col("c") * F.col("nano")).alias("t"))
            .groupBy("d1")
            .agg(F.sum(dec("t")).alias("w"))
        )
        mx = w.agg(
            F.max(F.abs(F.col("w").cast("double"))).alias("m")
        )
        v = (
            w.crossJoin(F.broadcast(mx))
            .select(
                F.col("d1").alias("d"),
                F.round(F.col("w").cast("double") * (1e9 / F.col("m")), 0)
                .cast("bigint")
                .alias("nano"),
            )
            .localCheckpoint(eager=True)
        )
    # sign convention: the largest-|loading| coordinate is positive
    sgn = (
        v.orderBy(F.abs(F.col("nano")).desc(), "d")
        .limit(1)
        .select(F.signum(F.col("nano").cast("double")).alias("sg"))
    )
    vn = v.agg(
        F.sum(dec("nano") * dec("nano")).alias("vv")
    )
    ray_num = (
        cov.join(F.broadcast(v.select(F.col("d").alias("dd1"), F.col("nano").alias("n1"))), cov["d1"] == F.col("dd1"))
        .join(F.broadcast(v.select(F.col("d").alias("dd2"), F.col("nano").alias("n2"))), cov["d2"] == F.col("dd2"))
        .agg(F.sum(dec("c") * dec("n1") * dec("n2")).alias("vcv"))
    )
    trace = cov.where(F.col("d1") == F.col("d2")).agg(
        F.sum("c").alias("tr")
    )
    norm = v.agg(
        F.sqrt(F.sum(dec("nano") * dec("nano")).cast("double")).alias("nn")
    )
    evr = (
        ray_num.crossJoin(F.broadcast(vn))
        .crossJoin(F.broadcast(trace))
        .select(
            (
                F.col("vcv").cast("double")
                / F.col("vv").cast("double")
                / F.col("tr")
            ).alias("evr")
        )
    )
    return (
        v.crossJoin(F.broadcast(sgn))
        .crossJoin(F.broadcast(norm))
        .crossJoin(F.broadcast(evr))
        .select(
            F.col("d").cast("bigint").alias("dim"),
            F.round(
                F.col("sg") * F.col("nano") / F.col("nn"), 6
            ).alias("loading"),
            F.round(F.col("evr"), 6).alias("explained_var_share"),
        )
    )


def _pca_iter_sql(i: int) -> str:
    return f""",
w{i} AS (SELECT d1, sum(c::HUGEINT * nano::HUGEINT) w
         FROM cov JOIN v{i - 1} ON cov.d2 = v{i - 1}.d GROUP BY 1),
mx{i} AS (SELECT max(abs(w::DOUBLE)) m FROM w{i}),
v{i} AS (SELECT d1 d,
           CAST(round(w::DOUBLE * (1e9 / (SELECT m FROM mx{i})), 0)
                AS BIGINT) nano
         FROM w{i})"""


SQL_PCA_POWER_ITERATION = (
    """
WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 d,
                  CAST(round(unnest(embedding)::DOUBLE * 1000000, 0)
                       AS BIGINT) q
           FROM embeddings),
nn AS (SELECT count(*) n FROM embeddings),
sums AS (SELECT d, sum(q) s FROM e GROUP BY 1),
cross_ AS (SELECT a.d d1, b.d d2, sum(a.q::HUGEINT * b.q::HUGEINT) sxy
           FROM e a JOIN e b ON a.vec_id = b.vec_id GROUP BY 1, 2),
cov AS MATERIALIZED (
  SELECT d1, d2,
    CAST(round(((SELECT n FROM nn)::DOUBLE * sxy::DOUBLE
                - sa.s::DOUBLE * sb.s::DOUBLE)
               / ((SELECT n FROM nn)::DOUBLE * (SELECT n FROM nn)::DOUBLE)
               / 1e6, 0) AS BIGINT) c
  FROM cross_ JOIN sums sa ON sa.d = d1 JOIN sums sb ON sb.d = d2),
dims AS (SELECT DISTINCT d1 d FROM cov),
v0 AS (SELECT d, CAST(1000000000 AS BIGINT) nano FROM dims)"""
    + "".join(_pca_iter_sql(i) for i in (1, 2, 3))
    + """,
sgn AS (SELECT CASE WHEN nano >= 0 THEN 1.0 ELSE -1.0 END sg FROM v3
        ORDER BY abs(nano) DESC, d LIMIT 1),
vn AS (SELECT sum(nano::HUGEINT * nano::HUGEINT) vv,
              sqrt(sum(nano::HUGEINT * nano::HUGEINT)::DOUBLE) nrm FROM v3),
ray AS (SELECT sum(c::HUGEINT * a.nano::HUGEINT * b.nano::HUGEINT) vcv
        FROM cov JOIN v3 a ON cov.d1 = a.d JOIN v3 b ON cov.d2 = b.d),
tr AS (SELECT sum(c) t FROM cov WHERE d1 = d2),
evr AS (SELECT (SELECT vcv FROM ray)::DOUBLE / (SELECT vv FROM vn)::DOUBLE
               / (SELECT t FROM tr) e)
SELECT CAST(d AS BIGINT) dim,
       round((SELECT sg FROM sgn) * nano / (SELECT nrm FROM vn), 6) loading,
       round((SELECT e FROM evr), 6) explained_var_share
FROM v3"""
)


def q_naive_bayes_langid(spark, sf_dir):
    """Multinomial naive-Bayes language ID, trained on the 90%% hash
    split and evaluated on the rest: add-one-smoothed token
    likelihoods, per-document log-posterior = log prior + Σ log
    p(token|lang) with every term quantized to nano BEFORE the sum
    (exact bigint — partition-proof), argmax with lang-asc
    tie-break. Output = the test confusion matrix. OOV test tokens
    fall back to the smoothing floor ln(1/(tot+V)). Scale: the
    (lang × vocab) likelihood table is dimension-bounded and
    broadcasts onto one token scan."""
    from llmaix_spark.operators.curation import dataset_split

    docs = _t(spark, sf_dir, "documents")
    sp = dataset_split(docs).select(
        "doc_id", (F.col("split") == "train").alias("is_train")
    )
    d = docs.join(sp, "doc_id")
    tok = d.select(
        "doc_id", "lang", "is_train",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), " ")).alias("w"),
    ).where(F.col("w") != "")
    train = tok.where(F.col("is_train"))
    cw = train.groupBy("lang", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    cl = train.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("tot")
    )
    vocab_n = cw.select("w").distinct().count()
    priors = (
        d.where(F.col("is_train"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    )
    ntr = d.where(F.col("is_train")).count()
    langs = cl.select("lang").localCheckpoint(eager=True)
    # full (lang × vocab) grid with add-one smoothing, quantized to nano
    grid = (
        langs.crossJoin(cw.select("w").distinct())
        .join(cw, ["lang", "w"], "left")
        .join(F.broadcast(cl), "lang")
        .select(
            "lang", "w",
            F.round(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1)
                    / (F.col("tot") + F.lit(vocab_n)).cast("double")
                )
                * 1e9,
                0,
            )
            .cast("bigint")
            .alias("lp"),
        )
        .localCheckpoint(eager=True)
    )
    floor = cl.select(
        "lang",
        F.round(
            F.log(1.0 / (F.col("tot") + F.lit(vocab_n)).cast("double")) * 1e9,
            0,
        )
        .cast("bigint")
        .alias("fl"),
    )
    prior_t = priors.select(
        "lang",
        F.round(
            F.log(F.col("nd") / F.lit(float(ntr))) * 1e9, 0
        )
        .cast("bigint")
        .alias("lprior"),
    )
    test_tok = tok.where(~F.col("is_train")).select(
        "doc_id", F.col("lang").alias("true_lang"), "w"
    )
    grid_r = grid.select(
        F.col("lang").alias("gl"), F.col("w").alias("gw"), "lp"
    )
    scored = (
        test_tok.crossJoin(F.broadcast(langs.withColumnRenamed("lang", "hl")))
        .join(
            F.broadcast(grid_r),
            (F.col("hl") == F.col("gl")) & (F.col("w") == F.col("gw")),
            "left",
        )
        .join(F.broadcast(floor), F.col("hl") == floor["lang"])
        .select(
            "doc_id", "true_lang", "hl",
            F.coalesce(F.col("lp"), F.col("fl")).alias("t"),
        )
        .groupBy("doc_id", "true_lang", "hl")
        .agg(F.sum("t").alias("s"))
        .join(F.broadcast(prior_t), F.col("hl") == prior_t["lang"])
        .select(
            "doc_id", "true_lang", "hl",
            (F.col("s") + F.col("lprior")).alias("score"),
        )
    )
    wdoc = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), "hl"
    )
    pred = scored.select(
        "doc_id", "true_lang", "hl",
        F.row_number().over(wdoc).alias("rk"),
    ).where(F.col("rk") == 1)
    return (
        pred.groupBy(
            "true_lang", F.col("hl").alias("pred_lang")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .select(
            "true_lang", "pred_lang", "n_docs",
            (F.col("true_lang") == F.col("pred_lang")).alias("correct"),
        )
    )


SQL_NAIVE_BAYES_LANGID = """
WITH sp AS (SELECT doc_id,
              ({h} % 10000 < 9000) is_train
            FROM documents),
d AS (SELECT documents.doc_id, lang, text, is_train
      FROM documents JOIN sp ON documents.doc_id = sp.doc_id),
tok AS (SELECT doc_id, lang, is_train, t w
        FROM (SELECT doc_id, lang, is_train,
                     unnest(string_split(lower(trim(text)), ' ')) t
              FROM d)
        WHERE t <> ''),
train AS (SELECT * FROM tok WHERE is_train),
cw AS (SELECT lang, w, CAST(count(*) AS BIGINT) c FROM train GROUP BY 1, 2),
cl AS (SELECT lang, CAST(count(*) AS BIGINT) tot FROM train GROUP BY 1),
vn AS (SELECT count(DISTINCT w) v FROM cw),
priors AS (SELECT lang, CAST(count(*) AS BIGINT) nd FROM d
           WHERE is_train GROUP BY 1),
ntr AS (SELECT count(*) n FROM d WHERE is_train),
langs AS (SELECT lang FROM cl),
grid AS MATERIALIZED (
  SELECT langs.lang, vw.w,
    CAST(round(ln((coalesce(c, 0) + 1)
                  / (tot + (SELECT v FROM vn))::DOUBLE) * 1e9, 0)
         AS BIGINT) lp
  FROM langs CROSS JOIN (SELECT DISTINCT w FROM cw) vw
  LEFT JOIN cw ON cw.lang = langs.lang AND cw.w = vw.w
  JOIN cl ON cl.lang = langs.lang),
floor_ AS (SELECT lang,
             CAST(round(ln(1.0 / (tot + (SELECT v FROM vn))::DOUBLE) * 1e9,
                        0) AS BIGINT) fl
           FROM cl),
prior_t AS (SELECT lang,
              CAST(round(ln(nd / (SELECT n FROM ntr)::DOUBLE) * 1e9, 0)
                   AS BIGINT) lprior
            FROM priors),
tt AS (SELECT doc_id, lang true_lang, w FROM tok WHERE NOT is_train),
scored AS (
  SELECT doc_id, true_lang, langs.lang hl,
         sum(coalesce(lp, fl)) + any_value(lprior) score
  FROM tt CROSS JOIN langs
  LEFT JOIN grid ON grid.lang = langs.lang AND grid.w = tt.w
  JOIN floor_ ON floor_.lang = langs.lang
  JOIN prior_t ON prior_t.lang = langs.lang
  GROUP BY 1, 2, 3),
pred AS (SELECT doc_id, true_lang, hl FROM (
           SELECT *, row_number() OVER
             (PARTITION BY doc_id ORDER BY score DESC, hl) rk
           FROM scored) WHERE rk = 1)
SELECT true_lang, hl pred_lang, CAST(count(*) AS BIGINT) n_docs,
       (true_lang = hl) correct
FROM pred GROUP BY 1, 2""".format(
    h=_HASH60_SQL.format(v="CAST(doc_id AS VARCHAR) || ':split'")
)


def q_consistent_hash_ring(spark, sf_dir):
    """Consistent-hash ring balance sweep: 16 workers × r virtual
    nodes (r ∈ {1, 4, 16}), ring positions and document positions
    from the shared md5-60bit hash mod 2³², each document owned by
    the next ring point clockwise — the sharding design measurement
    (virtual nodes shrink imbalance ~1/√r). The ring is bounded
    (≤256 points) and broadcasts; assignment is one non-equi
    broadcast join + min per doc, the correct 100 TB shape. Loads
    are exact integer counts; imbalance and CV from Σload² ints."""
    from llmaix_spark.operators.linking import stable_hash60_expr

    docs = _t(spark, sf_dir, "documents").select(
        F.pmod(
            stable_hash60_expr(
                F.concat(F.col("doc_id").cast("string"), F.lit(":ring"))
            ),
            F.lit(2**32),
        ).alias("pos")
    )
    rows = []
    for r in (1, 4, 16):
        ring = (
            spark.range(16)
            .crossJoin(spark.range(r).withColumnRenamed("id", "rep"))
            .select(
                F.col("id").alias("worker"),
                F.pmod(
                    stable_hash60_expr(
                        F.concat(
                            F.lit("w"),
                            F.col("id").cast("string"),
                            F.lit(":r"),
                            F.col("rep").cast("string"),
                        )
                    ),
                    F.lit(2**32),
                ).alias("rp"),
            )
            .localCheckpoint(eager=True)
        )
        ring_min = ring.orderBy("rp", "worker").limit(1).select(
            F.col("worker").alias("w0")
        )
        nxt = (
            docs.join(F.broadcast(ring), F.col("rp") >= F.col("pos"), "left")
            .groupBy("pos")
            .agg(
                F.min_by("worker", F.struct("rp", "worker")).alias("w_nxt")
            )
        )
        owner = nxt.crossJoin(F.broadcast(ring_min)).select(
            F.coalesce(F.col("w_nxt"), F.col("w0")).alias("worker")
        )
        loads = owner.groupBy("worker").agg(
            F.count(F.lit(1)).cast("bigint").alias("ld")
        )
        # workers owning no arc get load 0
        full = (
            spark.range(16)
            .select(F.col("id").alias("worker"))
            .join(F.broadcast(loads), "worker", "left")
            .select(F.coalesce(F.col("ld"), F.lit(0)).alias("ld"))
        )
        agg = full.agg(
            F.sum("ld").cast("bigint").alias("n"),
            F.max("ld").cast("bigint").alias("mx"),
            F.sum(F.col("ld") * F.col("ld")).cast("bigint").alias("ss"),
        )
        rows.append(
            agg.select(
                F.lit(r).cast("bigint").alias("replicas"),
                F.col("n").alias("n_docs"),
                F.col("mx").alias("max_load"),
                F.round(F.col("mx") * 16.0 / F.col("n"), 6).alias(
                    "imbalance"
                ),
                F.round(
                    F.sqrt(
                        F.col("ss") * 16.0 / (F.col("n") * F.col("n")) - 1.0
                    ),
                    6,
                ).alias("load_cv"),
            )
        )
    out = rows[0]
    for x in rows[1:]:
        out = out.unionAll(x)
    return out


def _ring_sql(r: int) -> str:
    h_ring = _HASH60_SQL.format(
        v="'w' || CAST(w.range AS VARCHAR) || ':r' || CAST(rp.range AS VARCHAR)"
    )
    return f"""
ring{r} AS MATERIALIZED (
  SELECT w.range worker, {h_ring} % 4294967296 rp
  FROM range(16) w CROSS JOIN range({r}) rp),
own{r} AS (SELECT pos,
             coalesce(
               (SELECT worker FROM ring{r}
                WHERE rp >= pos ORDER BY rp, worker LIMIT 1),
               (SELECT worker FROM ring{r} ORDER BY rp, worker LIMIT 1))
               worker
           FROM docs),
full{r} AS (SELECT w.range worker, count(own{r}.worker) ld
            FROM range(16) w LEFT JOIN own{r} ON own{r}.worker = w.range
            GROUP BY 1),
agg{r} AS (SELECT CAST(sum(ld) AS BIGINT) n, CAST(max(ld) AS BIGINT) mx,
                  CAST(sum(ld * ld) AS BIGINT) ss FROM full{r})"""


SQL_CONSISTENT_HASH_RING = (
    """
WITH docs AS MATERIALIZED (
  SELECT """
    + _HASH60_SQL.format(v="CAST(doc_id AS VARCHAR) || ':ring'")
    + """ % 4294967296 pos
  FROM documents),"""
    + ",".join(_ring_sql(r) for r in (1, 4, 16))
    + """
SELECT CAST(1 AS BIGINT) replicas, n n_docs, mx max_load,
       round(mx * 16.0 / n, 6) imbalance,
       round(sqrt(ss * 16.0 / (n * n) - 1.0), 6) load_cv FROM agg1
UNION ALL SELECT 4, n, mx, round(mx * 16.0 / n, 6),
       round(sqrt(ss * 16.0 / (n * n) - 1.0), 6) FROM agg4
UNION ALL SELECT 16, n, mx, round(mx * 16.0 / n, 6),
       round(sqrt(ss * 16.0 / (n * n) - 1.0), 6) FROM agg16"""
)


def q_merkle_root(spark, sf_dir):
    """Merkle fingerprint of the document corpus: leaf = md5 of
    (doc_id:md5(text)), an 8-ary tree built over the doc_id rank
    order (node = md5 of its children's hashes concatenated in rank
    order), 3 internal levels then a single root digest — the
    content-addressed dataset version a training run pins and a
    resume verifies. Each level is one grouped ordered-concat hash;
    at 100 TB the same shape runs per partition then combines (the
    grouping key IS the partition prefix). Output: level sizes +
    the root hash."""
    docs = _t(spark, sf_dir, "documents")
    wrk = Window.orderBy("doc_id")
    leaf = docs.select(
        (F.row_number().over(wrk) - 1).alias("r"),
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.md5(F.col("text")),
            )
        ).alias("h"),
    )

    def level(df):
        return df.groupBy((F.col("r") / 8).cast("bigint").alias("g")).agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("r", "h"))),
                        lambda x: x["h"],
                    ),
                    "",
                )
            ).alias("h")
        ).select(F.col("g").alias("r"), "h")

    l1 = level(leaf).localCheckpoint(eager=True)
    l2 = level(l1).localCheckpoint(eager=True)
    l3 = level(l2).localCheckpoint(eager=True)
    root = l3.agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("r", "h"))),
                    lambda x: x["h"],
                ),
                "",
            )
        ).alias("root_hash")
    )
    counts = (
        leaf.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .crossJoin(l1.agg(F.count(F.lit(1)).cast("bigint").alias("n_l1")))
        .crossJoin(l2.agg(F.count(F.lit(1)).cast("bigint").alias("n_l2")))
        .crossJoin(l3.agg(F.count(F.lit(1)).cast("bigint").alias("n_l3")))
    )
    return counts.crossJoin(F.broadcast(root))


SQL_MERKLE_ROOT = """
WITH leaf AS (SELECT row_number() OVER (ORDER BY doc_id) - 1 r,
                     md5(CAST(doc_id AS VARCHAR) || ':' || md5(text)) h
              FROM documents),
l1 AS (SELECT r // 8 r, md5(string_agg(h, '' ORDER BY r)) h
       FROM leaf GROUP BY r // 8),
l2 AS (SELECT r // 8 r, md5(string_agg(h, '' ORDER BY r)) h
       FROM l1 GROUP BY r // 8),
l3 AS (SELECT r // 8 r, md5(string_agg(h, '' ORDER BY r)) h
       FROM l2 GROUP BY r // 8)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM leaf) n_docs,
       (SELECT CAST(count(*) AS BIGINT) FROM l1) n_l1,
       (SELECT CAST(count(*) AS BIGINT) FROM l2) n_l2,
       (SELECT CAST(count(*) AS BIGINT) FROM l3) n_l3,
       (SELECT md5(string_agg(h, '' ORDER BY r)) FROM l3) root_hash"""


def q_v_optimal_histogram(spark, sf_dir):
    """V-optimal 3-bucket histogram of the daily order-count series:
    enumerate both cut points over the calendar-bounded grain
    (O(days²) candidate pairs from O(days) prefix sums — the DP
    cell evaluation, exhaustive because the grain is a dimension),
    pick the (cut1, cut2) minimizing total SSE on the 6dp-rounded
    value with earliest-days tie-break — changepoint_detection's
    K=3 generalization and the piecewise-constant synopsis a
    zone-map planner stores."""
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    wcum = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = daily.select(
        "d",
        F.row_number().over(Window.orderBy("d")).cast("bigint").alias("i"),
        F.sum("y").over(wcum).alias("cs"),
        F.sum(F.col("y") * F.col("y")).over(wcum).alias("css"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("nn"),
        F.sum("y").over(wall).alias("ts"),
        F.sum(F.col("y") * F.col("y")).over(wall).alias("tss"),
    ).localCheckpoint(eager=True)
    a = cum.select(
        F.col("d").alias("d1"), F.col("i").alias("i1"),
        F.col("cs").alias("cs1"), F.col("css").alias("css1"),
        "nn", "ts", "tss",
    )
    b = cum.select(
        F.col("d").alias("d2"), F.col("i").alias("i2"),
        F.col("cs").alias("cs2"), F.col("css").alias("css2"),
    )
    pairs = a.join(b, F.col("i2") > F.col("i1")).where(
        F.col("i2") < F.col("nn")
    )
    sse = (
        (F.col("css1") - F.col("cs1") * F.col("cs1") / F.col("i1"))
        + (
            (F.col("css2") - F.col("css1"))
            - (F.col("cs2") - F.col("cs1"))
            * (F.col("cs2") - F.col("cs1"))
            / (F.col("i2") - F.col("i1"))
        )
        + (
            (F.col("tss") - F.col("css2"))
            - (F.col("ts") - F.col("cs2"))
            * (F.col("ts") - F.col("cs2"))
            / (F.col("nn") - F.col("i2"))
        )
    )
    cand = pairs.select(
        "d1", "d2", "i1", "i2", "cs1", "cs2", "nn", "ts", "tss",
        F.round(sse, 6).alias("sse3"),
    )
    return (
        cand.orderBy("sse3", "d1", "d2")
        .limit(1)
        .select(
            F.col("d1").alias("cut1_day"),
            F.col("d2").alias("cut2_day"),
            F.col("i1").alias("n_seg1"),
            (F.col("i2") - F.col("i1")).cast("bigint").alias("n_seg2"),
            (F.col("nn") - F.col("i2")).cast("bigint").alias("n_seg3"),
            F.round(F.col("cs1") * 1.0 / F.col("i1"), 6).alias("mean1"),
            F.round(
                (F.col("cs2") - F.col("cs1"))
                * 1.0
                / (F.col("i2") - F.col("i1")),
                6,
            ).alias("mean2"),
            F.round(
                (F.col("ts") - F.col("cs2"))
                * 1.0
                / (F.col("nn") - F.col("i2")),
                6,
            ).alias("mean3"),
            F.col("sse3").alias("sse_best"),
            F.round(
                1.0
                - F.col("sse3")
                / (F.col("tss") - F.col("ts") * F.col("ts") / F.col("nn")),
                6,
            ).alias("reduction"),
        )
    )


SQL_V_OPTIMAL_HISTOGRAM = """
WITH daily AS (SELECT CAST(o_orderdate AS DATE) d,
                      CAST(count(*) AS BIGINT) y
               FROM orders GROUP BY 1),
cum AS MATERIALIZED (
  SELECT d,
    CAST(row_number() OVER (ORDER BY d) AS BIGINT) i,
    sum(y) OVER (ORDER BY d) cs,
    sum(y * y) OVER (ORDER BY d) css,
    CAST(count(*) OVER () AS BIGINT) nn,
    sum(y) OVER () ts, sum(y * y) OVER () tss
  FROM daily),
cand AS (
  SELECT a.d d1, b.d d2, a.i i1, b.i i2, a.cs cs1, b.cs cs2,
         a.nn nn, a.ts ts, a.tss tss,
         round((a.css - a.cs * a.cs / a.i)
               + ((b.css - a.css) - (b.cs - a.cs) * (b.cs - a.cs)
                  / (b.i - a.i))
               + ((a.tss - b.css) - (a.ts - b.cs) * (a.ts - b.cs)
                  / (a.nn - b.i)), 6) sse3
  FROM cum a JOIN cum b ON b.i > a.i AND b.i < a.nn)
SELECT d1 cut1_day, d2 cut2_day, i1 n_seg1,
       CAST(i2 - i1 AS BIGINT) n_seg2, CAST(nn - i2 AS BIGINT) n_seg3,
       round(cs1 * 1.0 / i1, 6) mean1,
       round((cs2 - cs1) * 1.0 / (i2 - i1), 6) mean2,
       round((ts - cs2) * 1.0 / (nn - i2), 6) mean3,
       sse3 sse_best,
       round(1.0 - sse3 / (tss - ts * ts / nn), 6) reduction
FROM cand ORDER BY sse3, d1, d2 LIMIT 1"""


def q_aa_test_calibration(spark, sf_dir):
    """A/A calibration of the two-proportion z-test harness: 16
    independent null splits from the 16 low bits of the shared
    orderkey hash (each bit a deterministic 50/50 'treatment'), the
    urgent-rate z computed per split, and the empirical
    false-positive count at |z| > 1.96 — the meta-test that a
    testing pipeline isn't systematically miscalibrated before
    anyone reads a real experiment. Bits extracted with div/mod by
    literal powers (never <<, the checked-shift landmine); one
    explode + one grouped aggregate."""
    from llmaix_spark.operators.linking import stable_hash60_expr

    o = _t(spark, sf_dir, "orders").select(
        stable_hash60_expr(
            F.concat(F.col("o_orderkey").cast("string"), F.lit(":aa"))
        ).alias("h"),
        (F.col("o_orderpriority") == "1-URGENT").cast("bigint").alias("y"),
    )
    bits = o.select(
        "y",
        F.explode(F.array(*[F.lit(b) for b in range(16)])).alias("b"),
        "h",
    ).select(
        "y", "b",
        F.expr("(h div cast(pow(2, b) as bigint)) % 2").alias("trt"),
    )
    g = bits.groupBy("b").agg(
        F.sum(F.col("trt")).cast("bigint").alias("nt"),
        F.sum(1 - F.col("trt")).cast("bigint").alias("nc"),
        F.sum(F.col("y") * F.col("trt")).cast("bigint").alias("yt"),
        F.sum(F.col("y") * (1 - F.col("trt"))).cast("bigint").alias("yc"),
    )
    pt = F.col("yt") * 1.0 / F.col("nt")
    pc = F.col("yc") * 1.0 / F.col("nc")
    pp = (F.col("yt") + F.col("yc")) * 1.0 / (F.col("nt") + F.col("nc"))
    z = (pt - pc) / F.sqrt(
        pp * (1.0 - pp) * (1.0 / F.col("nt") + 1.0 / F.col("nc"))
    )
    return g.select(
        F.col("b").cast("bigint").alias("split_bit"),
        F.col("nt").alias("n_treat"),
        F.col("nc").alias("n_control"),
        F.round(z, 6).alias("z_stat"),
        (F.abs(F.round(z, 6)) > 1.96).alias("false_positive"),
    )


SQL_AA_TEST_CALIBRATION = """
WITH o AS (SELECT {h} h,
                  CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END y
           FROM orders),
bits AS (SELECT y, b.range b,
                (h // CAST(power(2, b.range) AS BIGINT)) % 2 trt
         FROM o CROSS JOIN range(16) b),
g AS (SELECT b, CAST(sum(trt) AS BIGINT) nt,
             CAST(sum(1 - trt) AS BIGINT) nc,
             CAST(sum(y * trt) AS BIGINT) yt,
             CAST(sum(y * (1 - trt)) AS BIGINT) yc
      FROM bits GROUP BY 1)
SELECT CAST(b AS BIGINT) split_bit, nt n_treat, nc n_control,
       round((yt * 1.0 / nt - yc * 1.0 / nc) /
             sqrt(((yt + yc) * 1.0 / (nt + nc))
                  * (1.0 - (yt + yc) * 1.0 / (nt + nc))
                  * (1.0 / nt + 1.0 / nc)), 6) z_stat,
       (abs(round((yt * 1.0 / nt - yc * 1.0 / nc) /
             sqrt(((yt + yc) * 1.0 / (nt + nc))
                  * (1.0 - (yt + yc) * 1.0 / (nt + nc))
                  * (1.0 / nt + 1.0 / nc)), 6)) > 1.96) false_positive
FROM g""".format(
    h=_HASH60_SQL.format(v="CAST(o_orderkey AS VARCHAR) || ':aa'")
)


def q_good_turing(spark, sf_dir):
    """Good-Turing frequency smoothing over the corpus trigram
    shingles: the frequency-of-frequencies table n_r, the adjusted
    count r* = (r+1)·n_{r+1}/n_r for r ≤ 10, and the unseen-mass
    estimate P₀ = n₁/N — the smoothing view behind every n-gram LM's
    'how much probability belongs to what we never saw'. Two grouped
    integer counts (shingle → r → n_r); the n_{r+1} lookup is a
    1-offset self-join at the bounded counts-of-counts grain."""
    docs = _t(spark, sf_dir, "documents")
    occ = (
        dd.word_shingles(docs, 3, distinct=False)
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    )
    nr = occ.groupBy("r").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_r")
    ).localCheckpoint(eager=True)
    tot = occ.agg(F.sum("r").cast("bigint").alias("nn"))
    nxt = nr.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1"))
    return (
        nr.where(F.col("r") <= 10)
        .join(F.broadcast(nxt), "r", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "r",
            "n_r",
            F.coalesce(F.col("n_r1"), F.lit(0)).cast("bigint").alias("n_r1"),
            F.round(
                (F.col("r") + 1)
                * F.coalesce(F.col("n_r1"), F.lit(0))
                * 1.0
                / F.col("n_r"),
                6,
            ).alias("r_star"),
            F.round(
                F.when(F.col("r") == 1, F.col("n_r")).otherwise(None)
                * 1.0
                / F.col("nn"),
                6,
            ).alias("unseen_mass"),
        )
    )


SQL_GOOD_TURING = """
WITH d AS (SELECT doc_id, string_split(trim(text), ' ') ws FROM documents),
tokp AS (SELECT doc_id, generate_subscripts(ws, 1) i, unnest(ws) t FROM d),
tri AS (SELECT doc_id,
               t || ' ' || lead(t, 1) OVER win || ' ' || lead(t, 2) OVER win
                 AS s,
               lead(t, 2) OVER win l2
        FROM tokp WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
occ AS (SELECT s, CAST(count(*) AS BIGINT) r FROM tri
        WHERE l2 IS NOT NULL GROUP BY 1),
nr AS (SELECT r, CAST(count(*) AS BIGINT) n_r FROM occ GROUP BY 1),
tot AS (SELECT CAST(sum(r) AS BIGINT) nn FROM occ)
SELECT nr.r, nr.n_r,
       CAST(coalesce(nx.n_r, 0) AS BIGINT) n_r1,
       round((nr.r + 1) * coalesce(nx.n_r, 0) * 1.0 / nr.n_r, 6) r_star,
       round(CASE WHEN nr.r = 1 THEN nr.n_r END * 1.0
             / (SELECT nn FROM tot), 6) unseen_mass
FROM nr LEFT JOIN nr nx ON nx.r = nr.r + 1
WHERE nr.r <= 10"""


def q_count_min_sketch(spark, sf_dir):
    """Count-Min sketch accuracy audit: a depth-4 × width-1024 CMS
    over the lineitem part keys (row hashes = the shared md5-60bit,
    salted per row), point-queried for the 20 most frequent keys —
    observed overestimate vs the ε·N = N/1024 expectation. The
    sketch IS the distributed shape: 4096 bounded cells built by one
    map-side-combinable aggregate, broadcast back for the probe.
    Overestimate ≥ 0 is the CMS guarantee the test pins."""
    from llmaix_spark.operators.linking import stable_hash60_expr

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("k")
    )
    rows_ = F.explode(F.array(*[F.lit(j) for j in range(4)])).alias("j")
    cell = F.pmod(
        stable_hash60_expr(
            F.concat(
                F.col("k").cast("string"), F.lit(":cms"),
                F.col("j").cast("string"),
            )
        ),
        F.lit(1024),
    ).alias("cell")
    sketch = (
        li.select("k", rows_)
        .select("j", cell)
        .groupBy("j", "cell")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    true_top = (
        li.groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), "k")
        .limit(20)
        .localCheckpoint(eager=True)
    )
    probes = true_top.select("k", "true_cnt", rows_).select(
        "k", "true_cnt", "j", cell
    )
    est = (
        probes.join(F.broadcast(sketch), ["j", "cell"])
        .groupBy("k", "true_cnt")
        .agg(F.min("c").cast("bigint").alias("est_cnt"))
    )
    n_total = li.count()
    return est.select(
        F.col("k").alias("part_id"),
        "true_cnt",
        "est_cnt",
        (F.col("est_cnt") - F.col("true_cnt"))
        .cast("bigint")
        .alias("overestimate"),
        F.round(
            (F.col("est_cnt") - F.col("true_cnt"))
            / F.lit(n_total / 1024.0),
            6,
        ).alias("err_vs_epsilon_n"),
    )


_CMS_CELL_SQL = (
    "("
    + _HASH60_SQL.format(
        v="CAST(k AS VARCHAR) || ':cms' || CAST(j AS VARCHAR)"
    )
    + " % 1024)"
)

SQL_COUNT_MIN_SKETCH = f"""
WITH li AS (SELECT l_partkey k FROM lineitem),
rows_ AS (SELECT k, j.range j FROM li CROSS JOIN range(4) j),
sketch AS MATERIALIZED (
  SELECT j, {_CMS_CELL_SQL} cell, CAST(count(*) AS BIGINT) c
  FROM rows_ GROUP BY 1, 2),
true_top AS (SELECT k, CAST(count(*) AS BIGINT) true_cnt FROM li
             GROUP BY 1 ORDER BY true_cnt DESC, k LIMIT 20),
probes AS (SELECT k, true_cnt, j.range j FROM true_top
           CROSS JOIN range(4) j),
est AS (SELECT k, true_cnt, CAST(min(c) AS BIGINT) est_cnt
        FROM (SELECT k, true_cnt, j, {_CMS_CELL_SQL} cell FROM probes) p
        JOIN sketch ON sketch.j = p.j AND sketch.cell = p.cell
        GROUP BY 1, 2)
SELECT k part_id, true_cnt, est_cnt,
       CAST(est_cnt - true_cnt AS BIGINT) overestimate,
       round((est_cnt - true_cnt)
             / ((SELECT count(*) FROM li) / 1024.0), 6) err_vs_epsilon_n
FROM est"""


def q_matching_att(spark, sf_dir):
    """Stratified-matching ATT: treated = odd-nation customers,
    strata = 10 equal-width price buckets from the broadcast exact
    max (deterministic integer bounds — never rank-based ntile), ATT
    = Σ_s (n_{t,s}/N_t)·(ȳ_{t,s} − ȳ_{c,s}) over strata where both
    arms exist — the covariate-adjusted effect next to the naive
    difference did_estimator doesn't adjust for. Exact cents
    everywhere; one grouped aggregate at the 2×10 cell grain."""
    o = (
        _t(spark, sf_dir, "orders")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            (F.col("c_nationkey") % 2 == 1).cast("int").alias("trt"),
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("c"),
        )
    )
    mx = o.agg(F.max("c").alias("mc")).localCheckpoint(eager=True)
    cells = (
        o.crossJoin(F.broadcast(mx))
        .select(
            "trt",
            F.least(
                F.lit(9), F.expr("(c * 10) div (mc + 1)")
            ).alias("stratum"),
            "c",
        )
        .groupBy("trt", "stratum")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("c").cast("bigint").alias("s"),
        )
        .localCheckpoint(eager=True)
    )
    t = cells.where(F.col("trt") == 1).select(
        "stratum", F.col("n").alias("nt"), F.col("s").alias("st")
    )
    c_ = cells.where(F.col("trt") == 0).select(
        "stratum", F.col("n").alias("nc"), F.col("s").alias("sc")
    )
    both = t.join(F.broadcast(c_), "stratum")
    ntot = both.agg(F.sum("nt").alias("ntt")).localCheckpoint(eager=True)
    terms = both.crossJoin(F.broadcast(ntot)).select(
        "stratum", "nt", "ntt",
        F.round(
            F.col("nt")
            * (
                F.col("st") * 1.0 / F.col("nt")
                - F.col("sc") * 1.0 / F.col("nc")
            )
            * 1e4
            / F.col("ntt"),
            0,
        )
        .cast("bigint")
        .alias("term_cmicro"),
    )
    att = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.max("ntt").cast("bigint").alias("n_treated"),
        F.sum("term_cmicro").alias("att_cm"),
    )
    naive = o.groupBy("trt").agg(
        (F.sum("c") * 1.0 / F.count(F.lit(1))).alias("m")
    )
    nv = (
        naive.groupBy()
        .pivot("trt", [0, 1])
        .agg(F.max("m"))
        .select(((F.col("1") - F.col("0")) / 100.0).alias("naive_diff"))
    )
    return att.crossJoin(F.broadcast(nv)).select(
        "n_treated",
        "n_strata",
        F.round(F.col("att_cm") / 1e6, 6).alias("att"),
        F.round(F.col("naive_diff"), 6).alias("naive_diff"),
    )


SQL_MATCHING_ATT = """
WITH o AS (SELECT CASE WHEN c_nationkey % 2 = 1 THEN 1 ELSE 0 END trt,
                  CAST(round(o_totalprice * 100, 0) AS BIGINT) c
           FROM orders JOIN customer ON o_custkey = c_custkey),
mx AS (SELECT max(c) mc FROM o),
cells AS (SELECT trt,
            least(9, (c * 10) // ((SELECT mc FROM mx) + 1)) stratum,
            CAST(count(*) AS BIGINT) n, CAST(sum(c) AS BIGINT) s
          FROM o GROUP BY 1, 2),
both_ AS (SELECT t.stratum, t.n nt, t.s st, c.n nc, c.s sc
          FROM (SELECT * FROM cells WHERE trt = 1) t
          JOIN (SELECT * FROM cells WHERE trt = 0) c USING (stratum)),
ntot AS (SELECT sum(nt) ntt FROM both_),
terms AS (SELECT stratum,
            CAST(round(nt * (st * 1.0 / nt - sc * 1.0 / nc) * 1e4
                       / (SELECT ntt FROM ntot), 0) AS BIGINT) term_cmicro
          FROM both_),
naive AS (SELECT
    (SELECT sum(c) * 1.0 / count(*) FROM o WHERE trt = 1)
    - (SELECT sum(c) * 1.0 / count(*) FROM o WHERE trt = 0) d)
SELECT (SELECT CAST(ntt AS BIGINT) FROM ntot) n_treated,
       CAST(count(*) AS BIGINT) n_strata,
       round(sum(term_cmicro) / 1e6, 6) att,
       round((SELECT d FROM naive) / 100.0, 6) naive_diff
FROM terms"""


def q_join_size_estimate(spark, sf_dir):
    """Join-cardinality estimation audit for the skewed self-join
    lineitem ⋈ lineitem ON partkey (true size = Σ c_k²): correlated
    KEY sampling (keep every key with hash%16 = 0, scale ×16) vs
    independent ROW sampling (Bernoulli 1/16 per side via two salts,
    scale ×256) — the optimizer-statistics lesson that key-correlated
    samples see the skew that row samples miss. Everything is exact
    integer counting over hash predicates; one grouped aggregate."""
    from llmaix_spark.operators.linking import stable_hash60_expr

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("k"),
        F.col("l_orderkey").alias("ok"),
    )
    per_key = li.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum(
            (
                F.pmod(
                    stable_hash60_expr(
                        F.concat(
                            F.col("ok").cast("string"), F.lit(":"),
                            F.col("k").cast("string"), F.lit(":ra"),
                        )
                    ),
                    F.lit(16),
                )
                == 0
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("ca"),
        F.sum(
            (
                F.pmod(
                    stable_hash60_expr(
                        F.concat(
                            F.col("ok").cast("string"), F.lit(":"),
                            F.col("k").cast("string"), F.lit(":rb"),
                        )
                    ),
                    F.lit(16),
                )
                == 0
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("cb"),
        F.max(
            (
                F.pmod(
                    stable_hash60_expr(
                        F.concat(F.col("k").cast("string"), F.lit(":js"))
                    ),
                    F.lit(16),
                )
                == 0
            ).cast("bigint")
        ).alias("keysamp"),
    )
    agg = per_key.agg(
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("true_size"),
        F.sum(
            F.col("keysamp") * F.col("cnt") * F.col("cnt")
        )
        .cast("bigint")
        .alias("key_sum"),
        F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("row_sum"),
    )
    return agg.select(
        "true_size",
        (F.col("key_sum") * 16).cast("bigint").alias("key_sample_est"),
        F.round(
            F.abs(F.col("key_sum") * 16.0 - F.col("true_size"))
            / F.col("true_size"),
            6,
        ).alias("key_sample_err"),
        (F.col("row_sum") * 256).cast("bigint").alias("row_sample_est"),
        F.round(
            F.abs(F.col("row_sum") * 256.0 - F.col("true_size"))
            / F.col("true_size"),
            6,
        ).alias("row_sample_err"),
    )


def _js_hash(salt: str) -> str:
    return _HASH60_SQL.format(
        v=f"CAST(ok AS VARCHAR) || ':' || CAST(k AS VARCHAR) || ':{salt}'"
    )


SQL_JOIN_SIZE_ESTIMATE = f"""
WITH li AS (SELECT l_partkey k, l_orderkey ok FROM lineitem),
per_key AS (
  SELECT k, CAST(count(*) AS BIGINT) cnt,
    CAST(sum(CASE WHEN {_js_hash("ra")} % 16 = 0 THEN 1 ELSE 0 END)
         AS BIGINT) ca,
    CAST(sum(CASE WHEN {_js_hash("rb")} % 16 = 0 THEN 1 ELSE 0 END)
         AS BIGINT) cb,
    max(CASE WHEN {_HASH60_SQL.format(v="CAST(k AS VARCHAR) || ':js'")}
             % 16 = 0 THEN 1 ELSE 0 END) keysamp
  FROM li GROUP BY 1),
agg AS (SELECT CAST(sum(cnt * cnt) AS BIGINT) true_size,
               CAST(sum(keysamp * cnt * cnt) AS BIGINT) key_sum,
               CAST(sum(ca * cb) AS BIGINT) row_sum
        FROM per_key)
SELECT true_size,
       CAST(key_sum * 16 AS BIGINT) key_sample_est,
       round(abs(key_sum * 16.0 - true_size) / true_size, 6)
         key_sample_err,
       CAST(row_sum * 256 AS BIGINT) row_sample_est,
       round(abs(row_sum * 256.0 - true_size) / true_size, 6)
         row_sample_err
FROM agg"""


def q_median_ci_order_stats(spark, sf_dir):
    """Distribution-free 95% CI for the median order price by exact
    order statistics: ranks k_lo = floor((n − 1.96√n)/2) and
    k_hi = ceil((n + 1.96√n)/2) + 1 pick the bounding values — no
    bootstrap, no resampling, one global sort rank on exact cents
    (the classic binomial-rank interval, normal-approximated). The
    rank lookup is three filtered rows from one row_number pass."""
    o = _t(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("c")
    )
    n = o.count()
    k_med = (n + 1) // 2
    k_med2 = n // 2 + 1
    k_lo = int(math.floor((n - 1.96 * math.sqrt(n)) / 2))
    k_hi = int(math.ceil((n + 1.96 * math.sqrt(n)) / 2)) + 1
    w = Window.orderBy("c")
    ranked = o.select(
        "c", F.row_number().over(w).alias("rk")
    ).where(F.col("rk").isin([k_med, k_med2, k_lo, k_hi]))
    agg = ranked.agg(
        F.sum(
            F.when(F.col("rk").isin([k_med, k_med2]), F.col("c"))
        ).alias("med2"),
        F.max(F.when(F.col("rk") == k_lo, F.col("c"))).alias("lo"),
        F.max(F.when(F.col("rk") == k_hi, F.col("c"))).alias("hi"),
    )
    return agg.select(
        F.lit(n).cast("bigint").alias("n_orders"),
        F.round(
            F.col("med2")
            / F.lit(float(100 * (2 if k_med != k_med2 else 1))),
            6,
        ).alias("median"),
        F.round(F.col("lo") / 100.0, 6).alias("ci_lo"),
        F.round(F.col("hi") / 100.0, 6).alias("ci_hi"),
        F.lit(0.95).alias("nominal_coverage"),
    )


SQL_MEDIAN_CI_ORDER_STATS = """
WITH o AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) c
           FROM orders),
nn AS (SELECT count(*) n FROM o),
ks AS (SELECT n, (n + 1) // 2 k1, n // 2 + 1 k2,
              CAST(floor((n - 1.96 * sqrt(n)) / 2) AS BIGINT) klo,
              CAST(ceil((n + 1.96 * sqrt(n)) / 2) AS BIGINT) + 1 khi
       FROM nn),
ranked AS (SELECT c, row_number() OVER (ORDER BY c) rk FROM o)
SELECT CAST((SELECT n FROM ks) AS BIGINT) n_orders,
       round(sum(CASE WHEN rk IN ((SELECT k1 FROM ks), (SELECT k2 FROM ks))
                      THEN c END)
             / (100.0 * (CASE WHEN (SELECT k1 FROM ks) <> (SELECT k2 FROM ks)
                              THEN 2 ELSE 1 END)), 6) median,
       round(max(CASE WHEN rk = (SELECT klo FROM ks) THEN c END) / 100.0, 6)
         ci_lo,
       round(max(CASE WHEN rk = (SELECT khi FROM ks) THEN c END) / 100.0, 6)
         ci_hi,
       0.95::DOUBLE nominal_coverage
FROM ranked
WHERE rk IN ((SELECT k1 FROM ks), (SELECT k2 FROM ks),
             (SELECT klo FROM ks), (SELECT khi FROM ks))"""


_REMOVAL_CHANNELS = ["click", "error", "view"]


def q_markov_removal_attribution(spark, sf_dir):
    """Markov removal-effect attribution: P(reach 'purchase' within
    4 steps from 'signup') under the full chain vs the chain with
    one channel knocked out (its incoming transition mass lost, not
    renormalized — the standard removal-effect convention), effect =
    1 − f_removed/f_full — the data-driven attribution that
    completes the family (last-touch, linear, Shapley). Same BIGINT
    nano recursion as markov_absorption at the K-state grain; the
    oracle unrolls all four chains."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("u").orderBy("us", "eid")
    pairs = (
        ev.select(
            F.col("user_id").alias("u"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            F.col("event_id").alias("eid"),
            F.col("event_type").alias("src"),
        )
        .select("u", "src", F.lead("src").over(w).alias("dst"))
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = pairs.groupBy("src").agg(F.sum("n").alias("t"))
    tp = (
        pairs.join(F.broadcast(tot), "src")
        .select("src", "dst", (F.col("n") / F.col("t")).alias("p"))
        .where(F.col("src") != "purchase")
        .localCheckpoint(eager=True)
    )
    states = (
        ev.select(F.col("event_type").alias("state"))
        .distinct()
        .where(F.col("state") != "purchase")
        .localCheckpoint(eager=True)
    )

    def absorb(tp_f, iters=4):
        direct = tp_f.where(F.col("dst") == "purchase").select(
            F.col("src").alias("state"),
            F.round(F.col("p") * 1e9, 0).cast("bigint").alias("d_nano"),
        )
        base = states.join(F.broadcast(direct), "state", "left").select(
            "state", F.coalesce(F.col("d_nano"), F.lit(0)).alias("d_nano")
        ).localCheckpoint(eager=True)
        f = base.select("state", F.lit(0).cast("bigint").alias("f_nano"))
        for _ in range(iters):
            spread = (
                tp_f.where(F.col("dst") != "purchase")
                .join(f, tp_f["dst"] == f["state"])
                .select(
                    F.col("src"),
                    F.round(F.col("p") * F.col("f_nano"), 0)
                    .cast("bigint")
                    .alias("t"),
                )
                .groupBy("src")
                .agg(F.sum("t").alias("s"))
            )
            f = (
                base.join(
                    F.broadcast(spread), base["state"] == spread["src"], "left"
                )
                .select(
                    "state",
                    (F.col("d_nano") + F.coalesce(F.col("s"), F.lit(0)))
                    .cast("bigint")
                    .alias("f_nano"),
                )
                .localCheckpoint(eager=True)
            )
        return f

    f_full = (
        absorb(tp)
        .where(F.col("state") == "signup")
        .select(F.col("f_nano").alias("full_nano"))
        .localCheckpoint(eager=True)
    )
    rows = []
    for ch in _REMOVAL_CHANNELS:
        f_rem = (
            absorb(tp.where(F.col("dst") != ch))
            .where(F.col("state") == "signup")
            .select(F.col("f_nano").alias("rem_nano"))
        )
        rows.append(
            f_rem.crossJoin(F.broadcast(f_full)).select(
                F.lit(ch).alias("channel"),
                (F.expr("(full_nano + 500) div 1000") / 1e6).alias("f_full"),
                (F.expr("(rem_nano + 500) div 1000") / 1e6).alias(
                    "f_removed"
                ),
                F.round(
                    1.0 - F.col("rem_nano") * 1.0 / F.col("full_nano"), 6
                ).alias("removal_effect"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


def _removal_chain_sql(tag: str, filt: str) -> str:
    body = f"""
d{tag} AS (SELECT src state, CAST(round(p * 1e9, 0) AS BIGINT) d_nano
           FROM tp WHERE dst = 'purchase'{filt}),
b{tag} AS (SELECT states.state, coalesce(d_nano, 0) d_nano
           FROM states LEFT JOIN d{tag} ON states.state = d{tag}.state),
f{tag}0 AS (SELECT state, CAST(0 AS BIGINT) f_nano FROM b{tag})"""
    for i in (1, 2, 3, 4):
        body += f""",
s{tag}{i} AS (SELECT src, CAST(sum(CAST(round(p * f_nano, 0) AS BIGINT))
                        AS BIGINT) s
              FROM tp JOIN f{tag}{i - 1} ON tp.dst = f{tag}{i - 1}.state
              WHERE tp.dst <> 'purchase'{filt} GROUP BY src),
f{tag}{i} AS (SELECT b{tag}.state,
                CAST(d_nano + coalesce(s, 0) AS BIGINT) f_nano
              FROM b{tag} LEFT JOIN s{tag}{i}
                ON b{tag}.state = s{tag}{i}.src)"""
    return body


SQL_MARKOV_REMOVAL_ATTRIBUTION = (
    """
WITH e AS (SELECT user_id u, epoch_us(ts) us, event_id eid,
                  event_type src FROM events),
seq AS (SELECT u, src,
               lead(src) OVER (PARTITION BY u ORDER BY us, eid) dst
        FROM e),
pairs AS (SELECT src, dst, CAST(count(*) AS BIGINT) n FROM seq
          WHERE dst IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT src, sum(n) t FROM pairs GROUP BY 1),
tp AS MATERIALIZED (SELECT pairs.src, dst, n * 1.0 / t AS p
       FROM pairs JOIN tot USING (src) WHERE pairs.src <> 'purchase'),
states AS (SELECT DISTINCT event_type state FROM events
           WHERE event_type <> 'purchase'),"""
    + _removal_chain_sql("f", "")[1:]
    + ","
    + ",".join(
        _removal_chain_sql(f"r{i}", f" AND dst <> '{ch}'")[1:]
        for i, ch in enumerate(_REMOVAL_CHANNELS)
    )
    + """,
base_full AS (SELECT f_nano full_nano FROM ff4 WHERE state = 'signup')
"""
    + "\nUNION ALL\n".join(
        f"""SELECT '{ch}' channel,
       ((SELECT full_nano FROM base_full) + 500) // 1000 / 1e6 f_full,
       (f_nano + 500) // 1000 / 1e6 f_removed,
       round(1.0 - f_nano * 1.0 / (SELECT full_nano FROM base_full), 6)
         removal_effect
FROM fr{i}4 WHERE state = 'signup'"""
        for i, ch in enumerate(_REMOVAL_CHANNELS)
    )
)


def q_bradley_terry(spark, sf_dir):
    """Bradley-Terry strength ranking from pairwise daily-volume
    comparisons between nations (i beats j in a month its order count
    is strictly larger; ties drop out) — the
    preference-model-from-comparisons primitive behind reward-model
    training. 3 minorization-maximization iterations π'_i = W_i /
    Σ_j n_ij/(π_i+π_j) in BIGINT nano-units: each denominator term
    quantizes to an exact integer (·1e18 head-room), the update
    re-normalizes to 1e9 — bit-identical at any partitioning and
    unrolled term-for-term in the oracle. The comparison matrix is
    dimension-bounded (25²); only the daily rollup touches data."""
    dn = (
        _t(spark, sf_dir, "orders")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("mo"),
            F.col("n_name").alias("nation"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    b = dn.select(
        F.col("mo").alias("db"), F.col("nation").alias("nb"),
        F.col("cnt").alias("cb"),
    )
    wins = (
        dn.join(b, (F.col("mo") == F.col("db")) & (F.col("nation") != F.col("nb")))
        .where(F.col("cnt") > F.col("cb"))
        .groupBy(F.col("nation").alias("i"), F.col("nb").alias("j"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .localCheckpoint(eager=True)
    )
    nij = (
        wins.select("i", "j", "w")
        .unionAll(
            wins.select(
                F.col("j").alias("i"), F.col("i").alias("j"), "w"
            )
        )
        .groupBy("i", "j")
        .agg(F.sum("w").cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    wtot = wins.groupBy("i").agg(F.sum("w").cast("bigint").alias("wi"))
    nations = nij.select(F.col("i").alias("nation")).distinct().localCheckpoint(
        eager=True
    )
    k = nations.count()
    pi = nations.select(
        "nation", F.lit(10**9 // k).cast("bigint").alias("nano")
    )
    for _ in range(3):
        pj = pi.select(F.col("nation").alias("j"), F.col("nano").alias("pj"))
        den = (
            nij.join(F.broadcast(pi), nij["i"] == pi["nation"])
            .join(F.broadcast(pj), "j")
            .select(
                "i",
                F.round(
                    F.col("n") * 1e18 / (F.col("nano") + F.col("pj")), 0
                )
                .cast("bigint")
                .alias("t"),
            )
            .groupBy("i")
            .agg(F.sum("t").alias("d"))
        )
        raw = (
            den.join(F.broadcast(wtot), "i")
            .select(
                F.col("i").alias("nation"),
                F.round(F.col("wi") * 1e18 / F.col("d"), 0)
                .cast("bigint")
                .alias("r"),
            )
        )
        mass = raw.agg(F.sum("r").alias("m"))
        pi = (
            raw.crossJoin(F.broadcast(mass))
            .select(
                "nation",
                F.round(F.col("r") * (1e9 / F.col("m")), 0)
                .cast("bigint")
                .alias("nano"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        pi.join(F.broadcast(wtot), pi["nation"] == wtot["i"])
        .select(
            "nation",
            F.col("wi").alias("wins"),
            (F.expr("(nano + 500) div 1000") / 1e6).alias("bt_strength"),
        )
    )


def _bt_iter_sql(i: int) -> str:
    return f""",
den{i} AS (SELECT i, CAST(sum(CAST(round(n * 1e18 / (pa.nano + pb.nano), 0)
                       AS BIGINT)) AS BIGINT) d
           FROM nij JOIN pi{i - 1} pa ON nij.i = pa.nation
                    JOIN pi{i - 1} pb ON nij.j = pb.nation
           GROUP BY i),
raw{i} AS (SELECT i nation,
             CAST(round(wi * 1e18 / d, 0) AS BIGINT) r
           FROM den{i} JOIN wtot USING (i)),
m{i} AS (SELECT sum(r) m FROM raw{i}),
pi{i} AS (SELECT nation,
            CAST(round(r * (1e9 / (SELECT m FROM m{i})), 0) AS BIGINT) nano
          FROM raw{i})"""


SQL_BRADLEY_TERRY = (
    """
WITH dn AS (SELECT date_trunc('month', o_orderdate) mo, n_name nation,
                   CAST(count(*) AS BIGINT) cnt
            FROM orders JOIN customer ON o_custkey = c_custkey
                        JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1, 2),
wins AS MATERIALIZED (
  SELECT a.nation i, b.nation j, CAST(count(*) AS BIGINT) w
  FROM dn a JOIN dn b ON a.mo = b.mo AND a.nation <> b.nation
  WHERE a.cnt > b.cnt GROUP BY 1, 2),
nij AS MATERIALIZED (
  SELECT i, j, CAST(sum(w) AS BIGINT) n FROM (
    SELECT i, j, w FROM wins UNION ALL SELECT j, i, w FROM wins)
  GROUP BY 1, 2),
wtot AS (SELECT i, CAST(sum(w) AS BIGINT) wi FROM wins GROUP BY 1),
nats AS (SELECT DISTINCT i nation FROM nij),
nk AS (SELECT count(*) k FROM nats),
pi0 AS (SELECT nation,
          CAST(1000000000 // (SELECT k FROM nk) AS BIGINT) nano FROM nats)"""
    + "".join(_bt_iter_sql(i) for i in (1, 2, 3))
    + """
SELECT nation, wi wins, ((nano + 500) // 1000) / 1e6 bt_strength
FROM pi3 JOIN wtot ON pi3.nation = wtot.i"""
)


def q_logistic_newton(spark, sf_dir):
    """Logistic regression 'purchase ~ normalized value' fit with 2
    exact Newton-Raphson steps from β = 0 — the iterative GLM kernel
    on Spark without MLlib. Step 1 is closed-form (at β=0, p=½ and
    w=¼ are constants); step 2 evaluates the sigmoid per row at the
    9dp-ROUNDED β₁ (the cross-engine state grid, same discipline as
    pagerank's state_dp) and every gradient/Hessian term quantizes
    to nano before the bigint sum. The 2×2 Newton solve is closed
    form. Output: β, the final quantized log-likelihood, and the
    mean fitted probability."""
    e = _t(spark, sf_dir, "events").select(
        (
            F.least(
                F.round(F.col("value") * 100, 0).cast("bigint"), F.lit(50000)
            )
            / 50000.0
        ).alias("x"),
        (F.col("event_type") == "purchase").cast("bigint").alias("y"),
    ).localCheckpoint(eager=True)

    def step(b0, b1):
        eta = F.lit(b0) + F.lit(b1) * F.col("x")
        p = 1.0 / (1.0 + F.exp(-eta))
        w = p * (1.0 - p)
        agg = e.agg(
            F.sum(F.round((F.col("y") - p) * 1e9, 0).cast("bigint")).alias("g0"),
            F.sum(
                F.round((F.col("y") - p) * F.col("x") * 1e9, 0).cast("bigint")
            ).alias("g1"),
            F.sum(F.round(w * 1e9, 0).cast("bigint")).alias("h00"),
            F.sum(F.round(w * F.col("x") * 1e9, 0).cast("bigint")).alias("h01"),
            F.sum(
                F.round(w * F.col("x") * F.col("x") * 1e9, 0).cast("bigint")
            ).alias("h11"),
        ).collect()[0]
        g0, g1 = agg["g0"] / 1e9, agg["g1"] / 1e9
        h00, h01, h11 = agg["h00"] / 1e9, agg["h01"] / 1e9, agg["h11"] / 1e9
        det = h00 * h11 - h01 * h01
        nb0 = b0 + (h11 * g0 - h01 * g1) / det
        nb1 = b1 + (h00 * g1 - h01 * g0) / det
        return round(nb0, 9), round(nb1, 9)

    b0, b1 = step(0.0, 0.0)
    b0, b1 = step(b0, b1)
    eta = F.lit(b0) + F.lit(b1) * F.col("x")
    p = 1.0 / (1.0 + F.exp(-eta))
    ll_t = F.round(
        (F.col("y") * F.log(p) + (1 - F.col("y")) * F.log(1.0 - p)) * 1e9, 0
    ).cast("bigint")
    out = e.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(ll_t).alias("ll_n"),
        F.sum(F.round(p * 1e9, 0).cast("bigint")).alias("p_n"),
    )
    return out.select(
        "n_events",
        F.round(F.lit(b0), 6).alias("beta0"),
        F.round(F.lit(b1), 6).alias("beta1"),
        F.round(F.col("ll_n") / 1e9, 6).alias("log_lik"),
        F.round(F.col("p_n") / (F.col("n_events") * 1e9), 6).alias("mean_p"),
    )


SQL_LOGISTIC_NEWTON = """
WITH e AS MATERIALIZED (
  SELECT least(CAST(round(value * 100, 0) AS BIGINT), 50000) / 50000.0 x,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END y
  FROM events),
s1 AS (SELECT sum(CAST(round((y - 0.5) * 1e9, 0) AS BIGINT)) / 1e9 g0,
              sum(CAST(round((y - 0.5) * x * 1e9, 0) AS BIGINT)) / 1e9 g1,
              sum(CAST(round(0.25 * 1e9, 0) AS BIGINT)) / 1e9 h00,
              sum(CAST(round(0.25 * x * 1e9, 0) AS BIGINT)) / 1e9 h01,
              sum(CAST(round(0.25 * x * x * 1e9, 0) AS BIGINT)) / 1e9 h11
       FROM e),
b1 AS (SELECT
         round(0.0 + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01), 9) b0,
         round(0.0 + (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01), 9) b1
       FROM s1),
s2 AS (SELECT
         sum(CAST(round((y - 1.0/(1.0 + exp(-((SELECT b0 FROM b1)
               + (SELECT b1 FROM b1) * x)))) * 1e9, 0) AS BIGINT)) / 1e9 g0,
         sum(CAST(round((y - 1.0/(1.0 + exp(-((SELECT b0 FROM b1)
               + (SELECT b1 FROM b1) * x)))) * x * 1e9, 0) AS BIGINT))
           / 1e9 g1,
         sum(CAST(round((1.0/(1.0 + exp(-((SELECT b0 FROM b1)
               + (SELECT b1 FROM b1) * x))))
             * (1.0 - 1.0/(1.0 + exp(-((SELECT b0 FROM b1)
               + (SELECT b1 FROM b1) * x)))) * 1e9, 0) AS BIGINT)) / 1e9 h00,
         sum(CAST(round((1.0/(1.0 + exp(-((SELECT b0 FROM b1)
               + (SELECT b1 FROM b1) * x))))
             * (1.0 - 1.0/(1.0 + exp(-((SELECT b0 FROM b1)
               + (SELECT b1 FROM b1) * x)))) * x * 1e9, 0) AS BIGINT))
           / 1e9 h01,
         sum(CAST(round((1.0/(1.0 + exp(-((SELECT b0 FROM b1)
               + (SELECT b1 FROM b1) * x))))
             * (1.0 - 1.0/(1.0 + exp(-((SELECT b0 FROM b1)
               + (SELECT b1 FROM b1) * x)))) * x * x * 1e9, 0) AS BIGINT))
           / 1e9 h11
       FROM e),
b2 AS (SELECT
         round((SELECT b0 FROM b1)
               + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01), 9) b0,
         round((SELECT b1 FROM b1)
               + (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01), 9) b1
       FROM s2),
fin AS (SELECT CAST(count(*) AS BIGINT) n_events,
          sum(CAST(round((y * ln(1.0/(1.0 + exp(-((SELECT b0 FROM b2)
                + (SELECT b1 FROM b2) * x))))
              + (1 - y) * ln(1.0 - 1.0/(1.0 + exp(-((SELECT b0 FROM b2)
                + (SELECT b1 FROM b2) * x))))) * 1e9, 0) AS BIGINT)) ll_n,
          sum(CAST(round(1.0/(1.0 + exp(-((SELECT b0 FROM b2)
                + (SELECT b1 FROM b2) * x))) * 1e9, 0) AS BIGINT)) p_n
        FROM e)
SELECT n_events, round((SELECT b0 FROM b2), 6) beta0,
       round((SELECT b1 FROM b2), 6) beta1,
       round(ll_n / 1e9, 6) log_lik,
       round(p_n / (n_events * 1e9), 6) mean_p
FROM fin"""


def q_partition_modularity(spark, sf_dir):
    """Newman modularity of the brand partition on the weighted part
    co-purchase graph: Q_c = m_c/m − (d_c/2m)² per brand — does the
    catalog taxonomy match the purchase graph's community structure.
    All three quantities (within-brand weight, brand degree, total
    weight) are exact integer sums; the brand map broadcasts."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    lb = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb")
    )
    edges = (
        li.join(
            lb,
            (F.col("l_orderkey") == F.col("ok"))
            & (F.col("l_partkey") < F.col("pb")),
        )
        .groupBy(F.col("l_partkey").alias("s"), F.col("pb").alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    brand = F.broadcast(
        _t(spark, sf_dir, "part").select(
            F.col("p_partkey").alias("pk"), F.col("p_brand").alias("b")
        )
    )
    eb = (
        edges.join(brand, edges["s"] == F.col("pk"))
        .withColumnRenamed("b", "bs")
        .drop("pk")
        .join(brand, edges["d"] == F.col("pk"))
        .withColumnRenamed("b", "bd")
        .localCheckpoint(eager=True)
    )
    m = eb.agg(F.sum("w").cast("bigint").alias("m")).localCheckpoint(
        eager=True
    )
    within = (
        eb.where(F.col("bs") == F.col("bd"))
        .groupBy(F.col("bs").alias("brand"))
        .agg(F.sum("w").cast("bigint").alias("mc"))
    )
    deg = (
        eb.select(F.col("bs").alias("brand"), "w")
        .unionAll(eb.select(F.col("bd").alias("brand"), "w"))
        .groupBy("brand")
        .agg(F.sum("w").cast("bigint").alias("dc"))
    )
    return (
        deg.join(F.broadcast(within), "brand", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "brand",
            F.coalesce(F.col("mc"), F.lit(0)).cast("bigint").alias("within_w"),
            F.col("dc").alias("degree_w"),
            F.round(
                F.coalesce(F.col("mc"), F.lit(0)) * 1.0 / F.col("m")
                - (F.col("dc") * 1.0 / (2 * F.col("m")))
                * (F.col("dc") * 1.0 / (2 * F.col("m"))),
                6,
            ).alias("q_contribution"),
        )
    )


SQL_PARTITION_MODULARITY = """
WITH edges AS (SELECT a.l_partkey s, b.l_partkey d,
                      CAST(count(*) AS BIGINT) w
               FROM lineitem a JOIN lineitem b
                 ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey
               GROUP BY 1, 2),
eb AS MATERIALIZED (
  SELECT w, pa.p_brand bs, pb.p_brand bd
  FROM edges JOIN part pa ON pa.p_partkey = s
             JOIN part pb ON pb.p_partkey = d),
m AS (SELECT sum(w) m FROM eb),
within AS (SELECT bs brand, CAST(sum(w) AS BIGINT) mc FROM eb
           WHERE bs = bd GROUP BY 1),
deg AS (SELECT brand, CAST(sum(w) AS BIGINT) dc FROM (
          SELECT bs brand, w FROM eb UNION ALL SELECT bd, w FROM eb)
        GROUP BY 1)
SELECT deg.brand, CAST(coalesce(mc, 0) AS BIGINT) within_w,
       dc degree_w,
       round(coalesce(mc, 0) * 1.0 / (SELECT m FROM m)
             - (dc * 1.0 / (2 * (SELECT m FROM m)))
             * (dc * 1.0 / (2 * (SELECT m FROM m))), 6) q_contribution
FROM deg LEFT JOIN within ON deg.brand = within.brand"""


def q_hill_numbers(spark, sf_dir):
    """Hill diversity profile of each nation's purchased parts:
    q=0 richness (distinct parts), q=1 exp(Shannon) with each
    −p·ln p term quantized to nano before the exact sum, q=2
    inverse Simpson computed EXACTLY as n²/Σc² in integers — the
    'effective catalog size' triple, with the textbook ordering
    q0 ≥ q1 ≥ q2 pinned by the wave test. One grouped count; the
    25-nation rollup broadcasts nothing bigger than itself."""
    cnt = (
        _t(spark, sf_dir, "orders")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            _t(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy(F.col("n_name").alias("nation"), "l_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = cnt.groupBy("nation").agg(F.sum("c").alias("n"))
    terms = cnt.join(F.broadcast(tot), "nation").select(
        "nation", "c", "n",
        F.round(
            -(F.col("c") / F.col("n")) * F.log(F.col("c") / F.col("n")) * 1e9,
            0,
        )
        .cast("bigint")
        .alias("sh"),
    )
    agg = terms.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("richness"),
        F.max("n").alias("n"),
        F.sum("sh").alias("sh_n"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("c2"),
    )
    return agg.select(
        "nation",
        "richness",
        F.round(F.exp(F.col("sh_n") / 1e9), 6).alias("exp_shannon"),
        F.round(F.col("n") * F.col("n") * 1.0 / F.col("c2"), 6).alias(
            "inv_simpson"
        ),
    )


SQL_HILL_NUMBERS = """
WITH cnt AS (SELECT n_name nation, l_partkey,
                    CAST(count(*) AS BIGINT) c
             FROM orders JOIN customer ON o_custkey = c_custkey
                         JOIN nation ON c_nationkey = n_nationkey
                         JOIN lineitem ON o_orderkey = l_orderkey
             GROUP BY 1, 2),
tot AS (SELECT nation, sum(c) n FROM cnt GROUP BY 1),
terms AS (SELECT cnt.nation, c, n,
            CAST(round(-(c * 1.0 / n) * ln(c * 1.0 / n) * 1e9, 0)
                 AS BIGINT) sh
          FROM cnt JOIN tot USING (nation))
SELECT nation, CAST(count(*) AS BIGINT) richness,
       round(exp(sum(sh) / 1e9), 6) exp_shannon,
       round(max(n) * max(n) * 1.0 / sum(c * c), 6) inv_simpson
FROM terms GROUP BY nation"""


def q_sax_motifs(spark, sf_dir):
    """SAX motif mining on the daily order-count series: z-normalize
    (population σ from exact integer Σy/Σy²), discretize to the
    4-symbol alphabet at the standard gaussian breakpoints
    (−0.6745, 0, 0.6745), slide a 3-symbol window (two lead()s over
    the calendar-bounded grain), and count motifs — top 10 by
    support. The time-series indexing primitive behind motif/anomaly
    search at scale; symbols are decided on the 6dp-rounded z so
    both engines cut identically."""
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    stats = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("ss"),
    ).localCheckpoint(eager=True)
    z = F.round(
        (F.col("y") - F.col("s") * 1.0 / F.col("n"))
        / F.sqrt(
            F.col("ss") * 1.0 / F.col("n")
            - (F.col("s") * 1.0 / F.col("n")) * (F.col("s") * 1.0 / F.col("n"))
        ),
        6,
    )
    sym = (
        F.when(z < -0.6745, "a")
        .when(z < 0.0, "b")
        .when(z < 0.6745, "c")
        .otherwise("d")
    )
    w = Window.orderBy("d")
    s = daily.crossJoin(F.broadcast(stats)).select("d", sym.alias("sym"))
    motifs = s.select(
        F.concat(
            F.col("sym"),
            F.lead("sym", 1).over(w),
            F.lead("sym", 2).over(w),
        ).alias("motif")
    ).where(F.col("motif").isNotNull() & (F.length("motif") == 3))
    return (
        motifs.groupBy("motif")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
        .orderBy(F.col("n_days").desc(), "motif")
        .limit(10)
    )


SQL_SAX_MOTIFS = """
WITH daily AS (SELECT CAST(o_orderdate AS DATE) d,
                      CAST(count(*) AS BIGINT) y
               FROM orders GROUP BY 1),
st AS (SELECT CAST(count(*) AS BIGINT) n, CAST(sum(y) AS BIGINT) s,
              CAST(sum(y * y) AS BIGINT) ss FROM daily),
sym AS (SELECT d,
          CASE WHEN z < -0.6745 THEN 'a' WHEN z < 0.0 THEN 'b'
               WHEN z < 0.6745 THEN 'c' ELSE 'd' END sym
        FROM (SELECT d,
                round((y - s * 1.0 / n)
                      / sqrt(ss * 1.0 / n
                             - (s * 1.0 / n) * (s * 1.0 / n)), 6) z
              FROM daily CROSS JOIN st)),
motifs AS (SELECT sym || lead(sym, 1) OVER w || lead(sym, 2) OVER w motif
           FROM sym WINDOW w AS (ORDER BY d))
SELECT motif, CAST(count(*) AS BIGINT) n_days
FROM motifs WHERE motif IS NOT NULL AND length(motif) = 3
GROUP BY motif ORDER BY n_days DESC, motif LIMIT 10"""


def q_type_graph_reachability(spark, sf_dir):
    """Reachability closure of the directed event-type transition
    graph within 4 steps: min path length per ordered (src, dst)
    pair and the mutual flag (both directions reachable = same
    strongly connected component) — the bow-tie view of how user
    behaviors can flow. The graph is dimension-bounded (K² ≤ 25
    pairs); levels unroll as distinct-join rounds in both engines."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("u").orderBy("us", "eid")
    e1 = (
        ev.select(
            F.col("user_id").alias("u"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            F.col("event_id").alias("eid"),
            F.col("event_type").alias("src"),
        )
        .select("u", "src", F.lead("src").over(w).alias("dst"))
        .where(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    dist = e1.select("src", "dst", F.lit(1).cast("bigint").alias("steps"))
    frontier = e1
    for step_n in (2, 3, 4):
        nxt = (
            frontier.join(
                e1.select(
                    F.col("src").alias("mid"), F.col("dst").alias("nd")
                ),
                frontier["dst"] == F.col("mid"),
            )
            .select("src", F.col("nd").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .join(dist.select("src", "dst"), ["src", "dst"], "left_anti")
            .localCheckpoint(eager=True)
        )
        dist = dist.unionAll(
            nxt.select("src", "dst", F.lit(step_n).cast("bigint").alias("steps"))
        ).localCheckpoint(eager=True)
        frontier = nxt
    back = dist.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"),
        F.lit(1).alias("rev"),
    ).distinct()
    return (
        dist.join(F.broadcast(back), ["src", "dst"], "left")
        .select(
            "src",
            "dst",
            F.col("steps").alias("min_steps"),
            F.coalesce(F.col("rev"), F.lit(0)).cast("boolean").alias("mutual"),
        )
    )


SQL_TYPE_GRAPH_REACHABILITY = """
WITH e AS (SELECT user_id u, epoch_us(ts) us, event_id eid,
                  event_type src FROM events),
seq AS (SELECT u, src,
               lead(src) OVER (PARTITION BY u ORDER BY us, eid) dst
        FROM e),
e1 AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM seq
  WHERE dst IS NOT NULL AND src <> dst),
d1 AS (SELECT src, dst, CAST(1 AS BIGINT) steps FROM e1),
n2 AS (SELECT DISTINCT a.src, b.dst FROM d1 a JOIN e1 b ON a.dst = b.src
       WHERE a.src <> b.dst),
d2 AS (SELECT src, dst, CAST(2 AS BIGINT) steps FROM n2 n2
       WHERE NOT EXISTS (SELECT 1 FROM d1 p
                         WHERE p.src = n2.src AND p.dst = n2.dst)),
r2 AS (SELECT src, dst, steps FROM d1 UNION ALL SELECT * FROM d2),
n3 AS (SELECT DISTINCT a.src, b.dst FROM d2 a JOIN e1 b ON a.dst = b.src
       WHERE a.src <> b.dst),
d3 AS (SELECT src, dst, CAST(3 AS BIGINT) steps FROM n3 n3
       WHERE NOT EXISTS (SELECT 1 FROM r2 p
                         WHERE p.src = n3.src AND p.dst = n3.dst)),
r3 AS (SELECT * FROM r2 UNION ALL SELECT * FROM d3),
n4 AS (SELECT DISTINCT a.src, b.dst FROM d3 a JOIN e1 b ON a.dst = b.src
       WHERE a.src <> b.dst),
d4 AS (SELECT src, dst, CAST(4 AS BIGINT) steps FROM n4 n4
       WHERE NOT EXISTS (SELECT 1 FROM r3 p
                         WHERE p.src = n4.src AND p.dst = n4.dst)),
r4 AS MATERIALIZED (SELECT * FROM r3 UNION ALL SELECT * FROM d4)
SELECT a.src, a.dst, a.steps min_steps,
       (EXISTS (SELECT 1 FROM r4 b
                WHERE b.src = a.dst AND b.dst = a.src)) mutual
FROM r4 a"""


def q_simhash_angle_estimate(spark, sf_dir):
    """Random-hyperplane (SimHash) angle estimation audit: 64
    md5-derived ±1 hyperplanes (the 64×dim plane table is bounded and
    broadcasts), signature bit = sign of an EXACT integer dot with
    the micro-quantized embedding, estimated cosine = cos(π·hamming/64)
    vs the exact integer-dot true cosine — per deterministic
    rank-offset pair (vec r with r + n/2). The estimator audit behind
    every bit-signature embedding dedup: how many planes buy how much
    angular resolution."""
    from llmaix_spark.operators.linking import stable_hash60_expr

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.posexplode("embedding").alias("d", "v")
    ).select(
        "vec_id", "d",
        F.round(F.col("v").cast("double") * 1_000_000, 0)
        .cast("bigint")
        .alias("q"),
    ).localCheckpoint(eager=True)
    dims = emb.select("d").distinct()
    planes = (
        spark.range(64)
        .withColumnRenamed("id", "k")
        .crossJoin(F.broadcast(dims))
        .select(
            "k", "d",
            F.when(
                F.pmod(
                    stable_hash60_expr(
                        F.concat(
                            F.lit("sh"), F.col("k").cast("string"),
                            F.lit(":d"), F.col("d").cast("string"),
                        )
                    ),
                    F.lit(2),
                )
                == 0,
                1,
            )
            .otherwise(-1)
            .cast("bigint")
            .alias("sgn"),
        )
        .localCheckpoint(eager=True)
    )
    bits = (
        emb.join(F.broadcast(planes), "d")
        .groupBy("vec_id", "k")
        .agg(
            (F.sum(F.col("sgn") * F.col("q")) >= 0)
            .cast("int")
            .alias("bit"),
        )
        .localCheckpoint(eager=True)
    )
    wrk = Window.orderBy("vec_id")
    ranked = (
        _t(spark, sf_dir, "embeddings")
        .select("vec_id")
        .select("vec_id", (F.row_number().over(wrk) - 1).alias("r"))
        .localCheckpoint(eager=True)
    )
    n = ranked.count()
    half = n // 2
    pairs = (
        ranked.alias("x")
        .join(ranked.alias("y"), F.col("y.r") == F.col("x.r") + half)
        .select(
            F.col("x.vec_id").alias("va"), F.col("y.vec_id").alias("vb")
        )
    )
    ham = (
        pairs.join(
            bits.select(F.col("vec_id").alias("va"), "k", F.col("bit").alias("ba")),
            "va",
        )
        .join(
            bits.select(
                F.col("vec_id").alias("vb"), "k", F.col("bit").alias("bb")
            ),
            ["vb", "k"],
        )
        .groupBy("va", "vb")
        .agg(
            F.sum((F.col("ba") != F.col("bb")).cast("bigint"))
            .cast("bigint")
            .alias("hamming")
        )
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    a = emb.select(F.col("vec_id").alias("va"), "d", F.col("q").alias("qa"))
    b = emb.select(F.col("vec_id").alias("vb"), "d", F.col("q").alias("qb"))
    true = (
        pairs.join(a, "va")
        .join(b, ["vb", "d"])
        .groupBy("va", "vb")
        .agg(
            F.sum(dec("qa") * dec("qb")).alias("_dot"),
            F.sum(dec("qa") * dec("qa")).alias("_na"),
            F.sum(dec("qb") * dec("qb")).alias("_nb"),
        )
        .select(
            "va", "vb",
            F.round(
                F.col("_dot").cast("double")
                / (
                    F.sqrt(F.col("_na").cast("double"))
                    * F.sqrt(F.col("_nb").cast("double"))
                ),
                6,
            ).alias("true_cos"),
        )
    )
    return (
        ham.join(true, ["va", "vb"])
        .select(
            F.col("va").alias("vec_a"),
            F.col("vb").alias("vec_b"),
            "hamming",
            "true_cos",
            F.round(
                F.cos(math.pi * F.col("hamming") / 64.0), 6
            ).alias("est_cos"),
            F.round(
                F.abs(
                    F.round(F.cos(math.pi * F.col("hamming") / 64.0), 6)
                    - F.col("true_cos")
                ),
                6,
            ).alias("abs_err"),
        )
    )


_SH_PLANE_SQL = _HASH60_SQL.format(
    v="'sh' || CAST(k.range AS VARCHAR) || ':d' || CAST(d AS VARCHAR)"
)

SQL_SIMHASH_ANGLE_ESTIMATE = f"""
WITH e AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 d,
         CAST(round(unnest(embedding)::DOUBLE * 1000000, 0) AS BIGINT) q
  FROM embeddings),
dims AS (SELECT DISTINCT d FROM e),
planes AS MATERIALIZED (
  SELECT k.range k, d,
         CASE WHEN {_SH_PLANE_SQL} % 2 = 0 THEN 1 ELSE -1 END sgn
  FROM range(64) k CROSS JOIN dims),
bits AS MATERIALIZED (
  SELECT vec_id, k,
         CASE WHEN sum(sgn * q) >= 0 THEN 1 ELSE 0 END bt
  FROM e JOIN planes USING (d) GROUP BY 1, 2),
ranked AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 r
           FROM embeddings),
nn AS (SELECT count(*) n FROM embeddings),
pairs AS (SELECT x.vec_id va, y.vec_id vb
          FROM ranked x JOIN ranked y
            ON y.r = x.r + (SELECT n // 2 FROM nn)),
ham AS (SELECT va, vb,
          CAST(sum(CASE WHEN a.bt <> b.bt THEN 1 ELSE 0 END) AS BIGINT)
            hamming
        FROM pairs JOIN bits a ON a.vec_id = va
                   JOIN bits b ON b.vec_id = vb AND b.k = a.k
        GROUP BY 1, 2),
tru AS (SELECT va, vb,
          round(sum(a.q::HUGEINT * b.q::HUGEINT)::DOUBLE
                / (sqrt(sum(a.q::HUGEINT * a.q::HUGEINT)::DOUBLE)
                   * sqrt(sum(b.q::HUGEINT * b.q::HUGEINT)::DOUBLE)), 6)
            true_cos
        FROM pairs JOIN e a ON a.vec_id = va
                   JOIN e b ON b.vec_id = vb AND b.d = a.d
        GROUP BY 1, 2)
SELECT va vec_a, vb vec_b, hamming, true_cos,
       round(cos(pi() * hamming / 64.0), 6) est_cos,
       round(abs(round(cos(pi() * hamming / 64.0), 6) - true_cos), 6)
         abs_err
FROM ham JOIN tru USING (va, vb)"""


def q_haar_wavelet(spark, sf_dir):
    """3-level unnormalized Haar decomposition of the daily
    order-count series: per level, detail = pairwise difference,
    approx = pairwise sum (exact integers — the 2^level scaling is
    applied only in the final energy division), unpaired tail
    elements pass through as approx and contribute no detail. Output
    = detail energy per level (Σd²/2^level) and its share — the
    multiresolution 'where does the variance live' synopsis a
    time-series store keeps. Calendar-bounded grain; three grouped
    integer aggregates."""
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    cur = daily.select(
        (F.row_number().over(Window.orderBy("d")) - 1)
        .cast("bigint")
        .alias("r"),
        "y",
    ).localCheckpoint(eager=True)
    energies = []
    for lvl in (1, 2, 3):
        grp = cur.groupBy(F.expr("r div 2").alias("g")).agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("y").cast("bigint").alias("a"),
            F.sum(
                F.when(F.col("r") % 2 == 0, F.col("y")).otherwise(-F.col("y"))
            )
            .cast("bigint")
            .alias("dd"),
        ).localCheckpoint(eager=True)
        energies.append(
            grp.where(F.col("cnt") == 2).agg(
                F.lit(lvl).cast("bigint").alias("level"),
                F.count(F.lit(1)).cast("bigint").alias("n_detail"),
                F.sum(F.col("dd") * F.col("dd")).cast("bigint").alias("e_raw"),
            )
        )
        cur = grp.select(F.col("g").alias("r"), F.col("a").alias("y"))
    out = energies[0]
    for e_ in energies[1:]:
        out = out.unionAll(e_)
    out = out.select(
        "level", "n_detail",
        (F.col("e_raw") / F.pow(F.lit(2.0), F.col("level").cast("double"))).alias(
            "energy"
        ),
    ).localCheckpoint(eager=True)
    tot = out.agg(F.sum("energy").alias("te"))
    return out.crossJoin(F.broadcast(tot)).select(
        "level", "n_detail",
        F.round(F.col("energy"), 6).alias("detail_energy"),
        F.round(F.col("energy") / F.col("te"), 6).alias("energy_share"),
    )


SQL_HAAR_WAVELET = """
WITH daily AS (SELECT CAST(o_orderdate AS DATE) d,
                      CAST(count(*) AS BIGINT) y
               FROM orders GROUP BY 1),
l0 AS (SELECT row_number() OVER (ORDER BY d) - 1 r, y FROM daily),
g1 AS MATERIALIZED (
  SELECT r // 2 g, count(*) cnt, CAST(sum(y) AS BIGINT) a,
         CAST(sum(CASE WHEN r % 2 = 0 THEN y ELSE -y END) AS BIGINT) dd
  FROM l0 GROUP BY 1),
l1 AS (SELECT g r, a y FROM g1),
g2 AS MATERIALIZED (
  SELECT r // 2 g, count(*) cnt, CAST(sum(y) AS BIGINT) a,
         CAST(sum(CASE WHEN r % 2 = 0 THEN y ELSE -y END) AS BIGINT) dd
  FROM l1 GROUP BY 1),
l2 AS (SELECT g r, a y FROM g2),
g3 AS MATERIALIZED (
  SELECT r // 2 g, count(*) cnt, CAST(sum(y) AS BIGINT) a,
         CAST(sum(CASE WHEN r % 2 = 0 THEN y ELSE -y END) AS BIGINT) dd
  FROM l2 GROUP BY 1),
e AS (
  SELECT CAST(1 AS BIGINT) lvl, CAST(count(*) AS BIGINT) n_detail,
         sum(dd * dd) / power(2.0, 1) energy FROM g1 WHERE cnt = 2
  UNION ALL
  SELECT 2, count(*), sum(dd * dd) / power(2.0, 2) FROM g2 WHERE cnt = 2
  UNION ALL
  SELECT 3, count(*), sum(dd * dd) / power(2.0, 3) FROM g3 WHERE cnt = 2),
tot AS (SELECT sum(energy) te FROM e)
SELECT lvl AS level, n_detail, round(energy, 6) detail_energy,
       round(energy / (SELECT te FROM tot), 6) energy_share
FROM e"""


def q_texttiling_segments(spark, sf_dir):
    """TextTiling topical segmentation of the corpus's longest
    document: 10-token blocks, adjacent-block cosine over exact
    integer token-count vectors, boundary where the 6dp-rounded
    similarity drops below mean − stddev (both computed with the
    exact dev-sum scheme — stylometry_delta's integer variance in
    DECIMAL/HUGEINT, so the threshold is bit-identical). Hearst 1997
    semantics on the deterministic gap grain."""
    docs = _t(spark, sf_dir, "documents")
    target = (
        docs.orderBy(F.col("n_chars").desc(), "doc_id")
        .limit(1)
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    tok = target.select(
        F.posexplode(F.split(F.lower(F.trim(F.col("text"))), " ")).alias(
            "pos", "w"
        )
    ).where(F.col("w") != "")
    blocks = tok.select(
        F.expr("pos div 10").alias("blk"), "w"
    ).groupBy("blk", "w").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    nxt = blocks.select(
        (F.col("blk") - 1).alias("blk"),
        F.col("w"),
        F.col("c").alias("cn"),
    )
    dots = (
        blocks.join(nxt, ["blk", "w"])
        .groupBy("blk")
        .agg(F.sum(F.col("c") * F.col("cn")).cast("bigint").alias("dot"))
    )
    norms = blocks.groupBy("blk").agg(
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("n2")
    )
    nn = norms.select(
        (F.col("blk") - 1).alias("blk"), F.col("n2").alias("n2n")
    )
    maxb = blocks.agg(F.max("blk").alias("mb"))
    gaps = (
        norms.join(nn, "blk")
        .join(dots, "blk", "left")
        .crossJoin(F.broadcast(maxb))
        .where(F.col("blk") < F.col("mb"))
        .select(
            F.col("blk").alias("gap_id"),
            F.round(
                F.coalesce(F.col("dot"), F.lit(0))
                / (
                    F.sqrt(F.col("n2").cast("double"))
                    * F.sqrt(F.col("n2n").cast("double"))
                )
                * 1e6,
                0,
            )
            .cast("bigint")
            .alias("sim_u"),
        )
        .localCheckpoint(eager=True)
    )
    ng = gaps.count()
    musum = gaps.agg(F.sum("sim_u").alias("ms")).localCheckpoint(eager=True)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    devs = gaps.crossJoin(F.broadcast(musum)).select(
        "gap_id", "sim_u",
        (F.lit(ng) * F.col("sim_u") - F.col("ms")).alias("dev"),
    )
    var = devs.agg(F.sum(dec("dev") * dec("dev")).alias("vs"))
    return (
        devs.crossJoin(F.broadcast(var))
        .crossJoin(F.broadcast(musum))
        .select(
            "gap_id",
            F.round(F.col("sim_u") / 1e6, 6).alias("similarity"),
            F.round(
                (
                    F.col("ms") / F.lit(float(ng))
                    - F.sqrt(
                        F.col("vs").cast("double")
                        / (float(ng) * float(ng) * float(ng - 1))
                    )
                )
                / 1e6,
                6,
            ).alias("threshold"),
            (
                F.col("sim_u") * F.lit(float(ng))
                < F.col("ms")
                - F.lit(float(ng))
                * F.sqrt(
                    F.col("vs").cast("double")
                    / (float(ng) * float(ng) * float(ng - 1))
                )
            ).alias("is_boundary"),
        )
    )


SQL_TEXTTILING_SEGMENTS = """
WITH target AS (SELECT doc_id, text FROM documents
                ORDER BY n_chars DESC, doc_id LIMIT 1),
tok AS (SELECT i - 1 pos, t w
        FROM (SELECT generate_subscripts(ws, 1) i, unnest(ws) t
              FROM (SELECT string_split(lower(trim(text)), ' ') ws
                    FROM target))
        WHERE t <> ''),
blocks AS MATERIALIZED (
  SELECT pos // 10 blk, w, CAST(count(*) AS BIGINT) c
  FROM tok GROUP BY 1, 2),
dots AS (SELECT a.blk, CAST(sum(a.c * b.c) AS BIGINT) dot
         FROM blocks a JOIN blocks b ON b.blk = a.blk + 1 AND b.w = a.w
         GROUP BY 1),
norms AS (SELECT blk, CAST(sum(c * c) AS BIGINT) n2 FROM blocks GROUP BY 1),
mb AS (SELECT max(blk) m FROM blocks),
gaps AS MATERIALIZED (
  SELECT a.blk gap_id,
    CAST(round(coalesce(dot, 0)
               / (sqrt(a.n2::DOUBLE) * sqrt(b.n2::DOUBLE)) * 1e6, 0)
         AS BIGINT) sim_u
  FROM norms a JOIN norms b ON b.blk = a.blk + 1
  LEFT JOIN dots ON dots.blk = a.blk
  WHERE a.blk < (SELECT m FROM mb)),
ng AS (SELECT count(*) n, sum(sim_u) ms FROM gaps),
var AS (SELECT sum(((SELECT n FROM ng) * sim_u
                    - (SELECT ms FROM ng))::HUGEINT
                   * ((SELECT n FROM ng) * sim_u
                      - (SELECT ms FROM ng))::HUGEINT) vs
        FROM gaps)
SELECT gap_id, round(sim_u / 1e6, 6) similarity,
       round(((SELECT ms FROM ng) * 1.0 / (SELECT n FROM ng)
              - sqrt((SELECT vs FROM var)::DOUBLE
                     / ((SELECT n FROM ng)::DOUBLE * (SELECT n FROM ng)
                        * ((SELECT n FROM ng) - 1)))) / 1e6, 6) threshold,
       (sim_u * (SELECT n FROM ng)::DOUBLE
        < (SELECT ms FROM ng)
          - (SELECT n FROM ng)::DOUBLE
            * sqrt((SELECT vs FROM var)::DOUBLE
                   / ((SELECT n FROM ng)::DOUBLE * (SELECT n FROM ng)
                      * ((SELECT n FROM ng) - 1)))) is_boundary
FROM gaps"""


def q_selectivity_estimate(spark, sf_dir):
    """Conjunctive-predicate selectivity audit: true row counts of
    urgent ∧ high-price ∧ recent (all pairs + the triple) vs the
    attribute-independence products every textbook optimizer assumes
    — the correlation lift an optimizer mis-estimates by. One scan,
    exact counts, four output rows."""
    o = _t(spark, sf_dir, "orders").select(
        (F.col("o_orderpriority") == "1-URGENT").cast("bigint").alias("p1"),
        (
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            >= 15_000_000
        )
        .cast("bigint")
        .alias("p2"),
        (F.year("o_orderdate") >= 1998).cast("bigint").alias("p3"),
    )
    agg = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("p1").cast("bigint").alias("s1"),
        F.sum("p2").cast("bigint").alias("s2"),
        F.sum("p3").cast("bigint").alias("s3"),
        F.sum(F.col("p1") * F.col("p2")).cast("bigint").alias("s12"),
        F.sum(F.col("p1") * F.col("p3")).cast("bigint").alias("s13"),
        F.sum(F.col("p2") * F.col("p3")).cast("bigint").alias("s23"),
        F.sum(F.col("p1") * F.col("p2") * F.col("p3"))
        .cast("bigint")
        .alias("s123"),
    ).localCheckpoint(eager=True)
    combos = [
        ("urgent&highprice", "s12", ["s1", "s2"]),
        ("urgent&recent", "s13", ["s1", "s3"]),
        ("highprice&recent", "s23", ["s2", "s3"]),
        ("urgent&highprice&recent", "s123", ["s1", "s2", "s3"]),
    ]
    rows = []
    for name, true_c, margs in combos:
        est = F.col(margs[0]) * 1.0 / F.col("n")
        for m_ in margs[1:]:
            est = est * (F.col(m_) / F.col("n"))
        est_rows = est * F.col("n")
        rows.append(
            agg.select(
                F.lit(name).alias("combo"),
                F.col(true_c).alias("true_rows"),
                F.round(est_rows, 6).alias("est_rows"),
                F.round(F.col(true_c) / est_rows, 6).alias("lift"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


SQL_SELECTIVITY_ESTIMATE = """
WITH o AS (SELECT
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END p1,
             CASE WHEN CAST(round(o_totalprice * 100, 0) AS BIGINT)
                  >= 15000000 THEN 1 ELSE 0 END p2,
             CASE WHEN year(o_orderdate) >= 1998 THEN 1 ELSE 0 END p3
           FROM orders),
a AS (SELECT CAST(count(*) AS BIGINT) n,
             CAST(sum(p1) AS BIGINT) s1, CAST(sum(p2) AS BIGINT) s2,
             CAST(sum(p3) AS BIGINT) s3,
             CAST(sum(p1 * p2) AS BIGINT) s12,
             CAST(sum(p1 * p3) AS BIGINT) s13,
             CAST(sum(p2 * p3) AS BIGINT) s23,
             CAST(sum(p1 * p2 * p3) AS BIGINT) s123
      FROM o)
SELECT 'urgent&highprice' combo, s12 true_rows,
       round(s1 * 1.0 / n * (s2 * 1.0 / n) * n, 6) est_rows,
       round(s12 / (s1 * 1.0 / n * (s2 * 1.0 / n) * n), 6) lift FROM a
UNION ALL
SELECT 'urgent&recent', s13,
       round(s1 * 1.0 / n * (s3 * 1.0 / n) * n, 6),
       round(s13 / (s1 * 1.0 / n * (s3 * 1.0 / n) * n), 6) FROM a
UNION ALL
SELECT 'highprice&recent', s23,
       round(s2 * 1.0 / n * (s3 * 1.0 / n) * n, 6),
       round(s23 / (s2 * 1.0 / n * (s3 * 1.0 / n) * n), 6) FROM a
UNION ALL
SELECT 'urgent&highprice&recent', s123,
       round(s1 * 1.0 / n * (s2 * 1.0 / n) * (s3 * 1.0 / n) * n, 6),
       round(s123 / (s1 * 1.0 / n * (s2 * 1.0 / n) * (s3 * 1.0 / n) * n), 6)
FROM a"""


def q_chao1_richness(spark, sf_dir):
    """Chao1 species-richness extrapolation per source: observed
    distinct trigram shingles, singleton/doubleton counts, the
    bias-corrected Chao1 estimate S + f₁(f₁−1)/(2(f₂+1)), and the
    Good coverage 1 − f₁/N — 'how much vocabulary this source has
    that we haven't seen yet', the corpus-growth planning companion
    to good_turing. Two grouped integer counts per source."""
    docs = _t(spark, sf_dir, "documents")
    occ = (
        dd.word_shingles(docs, 3, distinct=False)
        .join(
            F.broadcast(docs.select("doc_id", "source")), "doc_id"
        )
        .groupBy("source", "shingle")
        .agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    )
    return (
        occ.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("s_obs"),
            F.sum((F.col("r") == 1).cast("bigint")).cast("bigint").alias("f1"),
            F.sum((F.col("r") == 2).cast("bigint")).cast("bigint").alias("f2"),
            F.sum("r").cast("bigint").alias("n_tokens"),
        )
        .select(
            "source", "s_obs", "f1", "f2",
            F.round(
                F.col("s_obs")
                + F.col("f1") * (F.col("f1") - 1) * 1.0
                / (2 * (F.col("f2") + 1)),
                6,
            ).alias("chao1"),
            F.round(1.0 - F.col("f1") * 1.0 / F.col("n_tokens"), 6).alias(
                "coverage"
            ),
        )
    )


SQL_CHAO1_RICHNESS = """
WITH d AS (SELECT doc_id, source, string_split(trim(text), ' ') ws
           FROM documents),
tokp AS (SELECT doc_id, source, generate_subscripts(ws, 1) i, unnest(ws) t
         FROM d),
tri AS (SELECT source,
               t || ' ' || lead(t, 1) OVER win || ' ' || lead(t, 2) OVER win
                 AS s,
               lead(t, 2) OVER win l2
        FROM tokp WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
occ AS (SELECT source, s, CAST(count(*) AS BIGINT) r FROM tri
        WHERE l2 IS NOT NULL GROUP BY 1, 2)
SELECT source, CAST(count(*) AS BIGINT) s_obs,
       CAST(sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) f1,
       CAST(sum(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS BIGINT) f2,
       round(count(*)
             + sum(CASE WHEN r = 1 THEN 1 ELSE 0 END)
               * (sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) - 1) * 1.0
               / (2 * (sum(CASE WHEN r = 2 THEN 1 ELSE 0 END) + 1)), 6)
         chao1,
       round(1.0 - sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) * 1.0 / sum(r), 6)
         coverage
FROM occ GROUP BY source"""


def q_salting_skew_audit(spark, sf_dir):
    """Shuffle-salting audit: rows per 32-way hash bucket when events
    shuffle on the raw 5-value event_type key (catastrophic skew) vs
    the type⊕(user%8) salted composite vs a row-level hash (the
    ideal) — the measured case for the salting strategy every skewed
    groupBy here uses. One scan, three grouped counts on shared-hash
    buckets; skew = max/mean over the 32 buckets."""
    from llmaix_spark.operators.linking import stable_hash60_expr

    e = _t(spark, sf_dir, "events").select(
        "event_type", "user_id", "event_id"
    ).localCheckpoint(eager=True)
    strategies = {
        "raw_key": stable_hash60_expr(F.col("event_type")),
        "salted_key": stable_hash60_expr(
            F.concat(
                F.col("event_type"), F.lit(":"),
                (F.col("user_id") % 8).cast("string"),
            )
        ),
        "row_hash": stable_hash60_expr(F.col("event_id").cast("string")),
    }
    n_total = e.count()
    rows = []
    for name, h in strategies.items():
        loads = e.select(F.pmod(h, F.lit(32)).alias("b")).groupBy("b").agg(
            F.count(F.lit(1)).cast("bigint").alias("ld")
        )
        rows.append(
            loads.agg(
                F.lit(name).alias("strategy"),
                F.count(F.lit(1)).cast("bigint").alias("buckets_used"),
                F.max("ld").cast("bigint").alias("max_rows"),
                F.round(
                    F.max("ld") * 32.0 / F.lit(float(n_total)), 6
                ).alias("skew_ratio"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


def _salt_strategy_sql(name: str, key: str) -> str:
    h = _HASH60_SQL.format(v=key)
    return f"""
SELECT '{name}' strategy,
       CAST(count(*) AS BIGINT) buckets_used,
       CAST(max(ld) AS BIGINT) max_rows,
       round(max(ld) * 32.0 / (SELECT count(*) FROM events), 6) skew_ratio
FROM (SELECT {h} % 32 b, count(*) ld FROM events GROUP BY 1)"""


SQL_SALTING_SKEW_AUDIT = (
    _salt_strategy_sql("raw_key", "event_type")
    + "\nUNION ALL"
    + _salt_strategy_sql(
        "salted_key", "event_type || ':' || CAST(user_id % 8 AS VARCHAR)"
    )
    + "\nUNION ALL"
    + _salt_strategy_sql("row_hash", "CAST(event_id AS VARCHAR)")
)


# ---------------------------------------------------------------------------
# registry


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "kg_turns": q_kg_turns,
    "kg_assembly": q_kg_assembly,
    "kg_mentions": q_kg_mentions,
    "kg_triples": q_kg_triples,
    "kg_entity_counts": q_kg_entity_counts,
    "agg_pricing_summary": q_agg_pricing_summary,
    "agg_rollup": q_agg_rollup,
    "pareto_orders": q_pareto_orders,
    "join_top_orders": q_join_top_orders,
    "window_customer_top3": q_window_customer_top3,
    "window_prev_next": q_window_prev_next,
    "window_deciles": q_window_deciles,
    "events_json_k": q_events_json_k,
    "events_sessionize": q_events_sessionize,
    "events_asof": q_events_asof,
    "cdc_apply": q_cdc_apply,
    "snapshot_diff": q_snapshot_diff,
    "scd2_history": q_scd2_history,
    "events_rolling": q_events_rolling,
    "events_funnel": q_events_funnel,
    "events_bursts": q_events_bursts,
    "events_transitions": q_events_transitions,
    "events_retention": q_events_retention,
    "events_ohlc": q_events_ohlc,
    "events_cumulative": q_events_cumulative,
    "events_trend": q_events_trend,
    "events_twap": q_events_twap,
    "events_ewma": q_events_ewma,
    "fd_violations": q_fd_violations,
    "bitmap_segments": q_bitmap_segments,
    "unpivot_metrics": q_unpivot_metrics,
    "kmv_union": q_kmv_union,
    "kg_degree_hist": q_kg_degree_hist,
    "scd2_pit_join": q_scd2_pit_join,
    "active_users_7d": q_active_users_7d,
    "session_paths": q_session_paths,
    "fingerprint_winnow": q_fingerprint_winnow,
    "copurchase_cosine": q_copurchase_cosine,
    "activity_streaks": q_activity_streaks,
    "drift_psi": q_drift_psi,
    "ivm_refresh": q_ivm_refresh,
    "dow_hour_matrix": q_dow_hour_matrix,
    "kaplan_meier": q_kaplan_meier,
    "events_cusum": q_events_cusum,
    "rfm_segments": q_rfm_segments,
    "attribution_last_touch": q_attribution_last_touch,
    "k_anonymity": q_k_anonymity,
    "winsorized_mean": q_winsorized_mean,
    "calibration_bins": q_calibration_bins,
    "balance_classes": q_balance_classes,
    "kmv_intersect": q_kmv_intersect,
    "index_postings": q_index_postings,
    "events_trigrams": q_events_trigrams,
    "events_debounce": q_events_debounce,
    "assoc_rules": q_assoc_rules,
    "distinct_hll": q_distinct_hll,
    "bm25_rank": q_bm25_rank,
    "seasonal_baseline": q_seasonal_baseline,
    "conversion_wilson": q_conversion_wilson,
    "trending_decay": q_trending_decay,
    "cohort_ltv": q_cohort_ltv,
    "interval_coverage": q_interval_coverage,
    "fifo_allocation": q_fifo_allocation,
    "revenue_gini": q_revenue_gini,
    "geo_grid_join": q_geo_grid_join,
    "kg_negative_samples": q_kg_negative_samples,
    "benford_digits": q_benford_digits,
    "apportionment_seats": q_apportionment_seats,
    "gap_fill_daily": q_gap_fill_daily,
    "rank_migration": q_rank_migration,
    "skyline_parts": q_skyline_parts,
    "quantile_normalize": q_quantile_normalize,
    "events_novelty": q_events_novelty,
    "blocking_metrics": q_blocking_metrics,
    "annotator_kappa": q_annotator_kappa,
    "encoding_planner": q_encoding_planner,
    "spatial_clusters": q_spatial_clusters,
    "quality_readability": q_quality_readability,
    "conversion_latency": q_conversion_latency,
    "attribution_linear": q_attribution_linear,
    "kg_clustering_coeff": q_kg_clustering_coeff,
    "theil_sen_trend": q_theil_sen_trend,
    "events_apdex": q_events_apdex,
    "heavy_hitters": q_heavy_hitters,
    "boxplot_stats": q_boxplot_stats,
    "spearman_corr": q_spearman_corr,
    "mann_kendall": q_mann_kendall,
    "mann_whitney_u": q_mann_whitney_u,
    "hhi_concentration": q_hhi_concentration,
    "max_concurrency": q_max_concurrency,
    "growth_accounting": q_growth_accounting,
    "bigram_pmi": q_bigram_pmi,
    "interpolate_linear": q_interpolate_linear,
    "pages_bounce_exit": q_pages_bounce_exit,
    "inventory_reorder": q_inventory_reorder,
    "vocab_coverage": q_vocab_coverage,
    "padding_waste": q_padding_waste,
    "target_encoding": q_target_encoding,
    "cuped_adjust": q_cuped_adjust,
    "ks_statistic": q_ks_statistic,
    "lorenz_curve": q_lorenz_curve,
    "conditional_entropy": q_conditional_entropy,
    "runs_test": q_runs_test,
    "acf_daily": q_acf_daily,
    "label_centroid_cosine": q_label_centroid_cosine,
    "duplicate_shipments": q_duplicate_shipments,
    "zipf_fit": q_zipf_fit,
    "lexical_richness": q_lexical_richness,
    "class_weights": q_class_weights,
    "adamic_adar": q_adamic_adar,
    "revenue_bridge": q_revenue_bridge,
    "engagement_ccdf": q_engagement_ccdf,
    "token_source_mi": q_token_source_mi,
    "interarrival_hist": q_interarrival_hist,
    "month_seasonal_index": q_month_seasonal_index,
    "zonemap_prune_sim": q_zonemap_prune_sim,
    "late_arrival_audit": q_late_arrival_audit,
    "daily_cooccurrence_lift": q_daily_cooccurrence_lift,
    "cohort_by_channel": q_cohort_by_channel,
    "stickiness_weekly": q_stickiness_weekly,
    "basket_size_hist": q_basket_size_hist,
    "dod_change_alerts": q_dod_change_alerts,
    "load_factor": q_load_factor,
    "degree_assortativity": q_degree_assortativity,
    "purchase_cadence": q_purchase_cadence,
    "embedding_norm_hist": q_embedding_norm_hist,
    "weekend_effect": q_weekend_effect,
    "shipping_sla": q_shipping_sla,
    "fano_factor": q_fano_factor,
    "sequence_violations": q_sequence_violations,
    "reactivation_latency": q_reactivation_latency,
    "hourly_envelope": q_hourly_envelope,
    "discount_elasticity": q_discount_elasticity,
    "abc_classification": q_abc_classification,
    "ndcg_at_k": q_ndcg_at_k,
    "srm_check": q_srm_check,
    "peak_detection": q_peak_detection,
    "price_dispersion": q_price_dispersion,
    "containment_dedup": q_containment_dedup,
    "kendall_tau": q_kendall_tau,
    "new_vs_returning": q_new_vs_returning,
    "simpson_reversal": q_simpson_reversal,
    "aging_buckets": q_aging_buckets,
    "subword_fertility": q_subword_fertility,
    "gini_features": q_gini_features,
    "containment_dedup_lsh": q_containment_dedup_lsh,
    "retrieval_mrr": q_retrieval_mrr,
    "vocab_growth": q_vocab_growth,
    "transition_reciprocity": q_transition_reciprocity,
    "forecast_accuracy": q_forecast_accuracy,
    "stratified_kfold": q_stratified_kfold,
    "dedup_savings": q_dedup_savings,
    "contamination_report": q_contamination_report,
    "embedding_dim_stats": q_embedding_dim_stats,
    "edge_support": q_edge_support,
    "compaction_plan": q_compaction_plan,
    "price_volume_mix": q_price_volume_mix,
    "dedup_incremental": q_dedup_incremental,
    "lang_divergence_js": q_lang_divergence_js,
    "pr_gains_curve": q_pr_gains_curve,
    "rle_lengths": q_rle_lengths,
    "hour_uniformity": q_hour_uniformity,
    "corpus_datasheet": q_corpus_datasheet,
    "chunk_sliding": q_chunk_sliding,
    "prefix_collision": q_prefix_collision,
    "erasure_audit": q_erasure_audit,
    "ab_count_ztest": q_ab_count_ztest,
    "nation_outlier_loo": q_nation_outlier_loo,
    "epoch_plan": q_epoch_plan,
    "dedup_triangle_audit": q_dedup_triangle_audit,
    "share_of_parent": q_share_of_parent,
    "realized_vs_list": q_realized_vs_list,
    "supplier_concentration": q_supplier_concentration,
    "quant_error": q_quant_error,
    "repeat_bestsellers": q_repeat_bestsellers,
    "fk_cardinality": q_fk_cardinality,
    "topk_overlap": q_topk_overlap,
    "dedup_rate_by_source": q_dedup_rate_by_source,
    "emd_segments": q_emd_segments,
    "hill_tail": q_hill_tail,
    "promo_share_trend": q_promo_share_trend,
    "minhash_calibration": q_minhash_calibration,
    "dq_rules": q_dq_rules,
    "embedding_drift": q_embedding_drift,
    "conformal_bound": q_conformal_bound,
    "boilerplate_score": q_boilerplate_score,
    "shingle_size_sensitivity": q_shingle_size_sensitivity,
    "segment_trend_ols": q_segment_trend_ols,
    "split_parity_psi": q_split_parity_psi,
    "transition_dwell": q_transition_dwell,
    "embedding_coverage": q_embedding_coverage,
    "late_by_priority_trend": q_late_by_priority_trend,
    "ab_qte": q_ab_qte,
    "rbo_rankings": q_rbo_rankings,
    "dup_pair_edit_distance": q_dup_pair_edit_distance,
    "eb_smoothed_rates": q_eb_smoothed_rates,
    "fd_binwidth": q_fd_binwidth,
    "rich_club": q_rich_club,
    "nb_dispersion": q_nb_dispersion,
    "diurnal_phase": q_diurnal_phase,
    "standardized_repeat": q_standardized_repeat,
    "weekday_priority_residuals": q_weekday_priority_residuals,
    "funnel_wilson": q_funnel_wilson,
    "price_endings": q_price_endings,
    "type_cofrequency": q_type_cofrequency,
    "session_bookends": q_session_bookends,
    "crosslang_dups": q_crosslang_dups,
    "velocity_by_size": q_velocity_by_size,
    "langid_confusion": q_langid_confusion,
    "gap_skewness": q_gap_skewness,
    "return_by_latency": q_return_by_latency,
    "lsh_s_curve": q_lsh_s_curve,
    "dedup_scaling_curve": q_dedup_scaling_curve,
    "heldout_perplexity": q_heldout_perplexity,
    "hard_negatives": q_hard_negatives,
    "quality_fusion": q_quality_fusion,
    "split_token_chi2": q_split_token_chi2,
    "anova_two_way": q_anova_two_way,
    "feature_hash_collisions": q_feature_hash_collisions,
    "cdf_linearity": q_cdf_linearity,
    "dedup_group_sizes": q_dedup_group_sizes,
    "logrank_test": q_logrank_test,
    "ratio_ci_delta": q_ratio_ci_delta,
    "order_batching": q_order_batching,
    "token_burstiness": q_token_burstiness,
    "chunk_dedup": q_chunk_dedup,
    "abc_xyz_matrix": q_abc_xyz_matrix,
    "dup_id_distance": q_dup_id_distance,
    "arc_elasticity": q_arc_elasticity,
    "neyman_allocation": q_neyman_allocation,
    "poststrat_mean": q_poststrat_mean,
    "avg_neighbor_degree": q_avg_neighbor_degree,
    "retention_halflife": q_retention_halflife,
    "segment_comovement": q_segment_comovement,
    "supplier_scorecard": q_supplier_scorecard,
    "kfold_lm_scores": q_kfold_lm_scores,
    "hybrid_dedup": q_hybrid_dedup,
    "partial_correlation": q_partial_correlation,
    "topk_stability": q_topk_stability,
    "session_length_geom": q_session_length_geom,
    "revenue_var_es": q_revenue_var_es,
    "pack_budget_sweep": q_pack_budget_sweep,
    "lsh_band_sweep": q_lsh_band_sweep,
    "decontam_ngram_sweep": q_decontam_ngram_sweep,
    "dup_length_bias": q_dup_length_bias,
    "kfold_label_balance": q_kfold_label_balance,
    "gate_waterfall": q_gate_waterfall,
    "transition_stationary": q_transition_stationary,
    "hits_bipartite": q_hits_bipartite,
    "dedup_keep_policy": q_dedup_keep_policy,
    "split_dup_leakage": q_split_dup_leakage,
    "multiple_testing_fdr": q_multiple_testing_fdr,
    "pii_scan": q_pii_scan,
    "bloom_filter_fpr": q_bloom_filter_fpr,
    "shapley_attribution": q_shapley_attribution,
    "changepoint_detection": q_changepoint_detection,
    "stylometry_delta": q_stylometry_delta,
    "eventually_follows": q_eventually_follows,
    "kcore_decomposition": q_kcore_decomposition,
    "textrank_keywords": q_textrank_keywords,
    "ipf_raking": q_ipf_raking,
    "queue_wait_lindley": q_queue_wait_lindley,
    "brier_decomposition": q_brier_decomposition,
    "markov_entropy_rate": q_markov_entropy_rate,
    "session_gap_sweep": q_session_gap_sweep,
    "tfidf_cosine_pairs": q_tfidf_cosine_pairs,
    "sequential_obf": q_sequential_obf,
    "did_estimator": q_did_estimator,
    "rake_keyphrases": q_rake_keyphrases,
    "decision_stump_gain": q_decision_stump_gain,
    "greedy_set_cover": q_greedy_set_cover,
    "mmr_diversified_topk": q_mmr_diversified_topk,
    "greedy_matching": q_greedy_matching,
    "ips_offpolicy": q_ips_offpolicy,
    "fellegi_sunter": q_fellegi_sunter,
    "pagerank_personalized": q_pagerank_personalized,
    "markov_absorption": q_markov_absorption,
    "pca_power_iteration": q_pca_power_iteration,
    "naive_bayes_langid": q_naive_bayes_langid,
    "consistent_hash_ring": q_consistent_hash_ring,
    "merkle_root": q_merkle_root,
    "v_optimal_histogram": q_v_optimal_histogram,
    "aa_test_calibration": q_aa_test_calibration,
    "good_turing": q_good_turing,
    "count_min_sketch": q_count_min_sketch,
    "matching_att": q_matching_att,
    "join_size_estimate": q_join_size_estimate,
    "median_ci_order_stats": q_median_ci_order_stats,
    "markov_removal_attribution": q_markov_removal_attribution,
    "bradley_terry": q_bradley_terry,
    "logistic_newton": q_logistic_newton,
    "partition_modularity": q_partition_modularity,
    "hill_numbers": q_hill_numbers,
    "sax_motifs": q_sax_motifs,
    "type_graph_reachability": q_type_graph_reachability,
    "simhash_angle_estimate": q_simhash_angle_estimate,
    "haar_wavelet": q_haar_wavelet,
    "texttiling_segments": q_texttiling_segments,
    "selectivity_estimate": q_selectivity_estimate,
    "chao1_richness": q_chao1_richness,
    "salting_skew_audit": q_salting_skew_audit,
    "integrity_orphans": q_integrity_orphans,
    "integrity_gaps": q_integrity_gaps,
    "events_range_join": q_events_range_join,
    "empty_predicate": q_empty_predicate,
    "id_gen": q_id_gen,
    "base_id_roundtrip": q_base_id_roundtrip,
    "umlaut_translit": q_umlaut_translit,
    "boolean_coercion": q_boolean_coercion,
    "metrics_boolean": q_metrics_boolean,
    "metrics_stringmatch": q_metrics_stringmatch,
    "fuzzy_part_pairs": q_fuzzy_part_pairs,
    "fuzzy_part_pairs_capped": q_fuzzy_part_pairs_capped,
    "fuzzy_token_sort": q_fuzzy_token_sort,
    "masking": q_masking,
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_jaccard_prefix": q_dedup_jaccard_prefix,
    "dedup_minhash": q_dedup_minhash,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding": q_dedup_embedding,
    "dedup_embedding_ivf": q_dedup_embedding_ivf,
    "similarity_topk": q_similarity_topk,
    "knn_join": q_knn_join,
    "knn_join_bucketed": q_knn_join_bucketed,
    "knn_join_bucketed_capped": q_knn_join_bucketed_capped,
    "decontaminate_semantic": q_decontaminate_semantic,
    "textstats_tokens": q_textstats_tokens,
    "textstats_quality": q_textstats_quality,
    "quality_repetition": q_quality_repetition,
    "quality_entropy": q_quality_entropy,
    "unigram_logprob": q_unigram_logprob,
    "lang_id": q_lang_id,
    "fingerprint": q_fingerprint,
    "redaction_metrics": q_redaction_metrics,
    "redaction_classwise": q_redaction_classwise,
    "labels_join": q_labels_join,
    "labels_reannotate": q_labels_reannotate,
    "export_pivot": q_export_pivot,
    "leaderboard_mean": q_leaderboard_mean,
    "first_non_empty": q_first_non_empty,
    "expect_exactly_one": q_expect_exactly_one,
    "merge_metadata": q_merge_metadata,
    "label_type_inference": q_label_type_inference,
    "label_check": q_label_check,
    "file_manifest_join": q_file_manifest_join,
    "metrics_multiclass": q_metrics_multiclass,
    "invariant_per_turn": q_invariant_per_turn,
    "dedup_groups": q_dedup_groups,
    "dedup_groups_lsh": q_dedup_groups_lsh,
    "dataset_split": q_dataset_split,
    "stratified_sample": q_stratified_sample,
    "curation_pipeline": q_curation_pipeline,
    "training_corpus": q_training_corpus,
    "pack_sequences": q_pack_sequences,
    "pack_shards": q_pack_shards,
    "pack_sequences_bpe": q_pack_sequences_bpe,
    "decontaminate": q_decontaminate,
    "dsir_importance": q_dsir_importance,
    "dedup_lines": q_dedup_lines,
    "dup_ngram_spans": q_dup_ngram_spans,
    "domain_mixture": q_domain_mixture,
    "bpe_pair_counts": q_bpe_pair_counts,
    "profile_columns": q_profile_columns,
    "tfidf_top_terms": q_tfidf_top_terms,
    "search_rank": q_search_rank,
    "search_phrase": q_search_phrase,
    "profile_quantiles": q_profile_quantiles,
    "weighted_median": q_weighted_median,
    "outliers_mad": q_outliers_mad,
    "profile_histogram": q_profile_histogram,
    "skew_histogram": q_skew_histogram,
    "zorder_key": q_zorder_key,
    "distinct_kmv": q_distinct_kmv,
    "priority_sample": q_priority_sample,
    "sample_k_per_group": q_sample_k_per_group,
    "quantize_embeddings": q_quantize_embeddings,
    "multimodal_features": q_multimodal_features,
    # rows-only
    "anonymizer_conversations": q_anonymizer,
    "kg_pagerank": q_kg_pagerank,
    "kg_triangles": q_kg_triangles,
    "kg_two_hop": q_kg_two_hop,
    "kg_cooccurrence": q_kg_cooccurrence,
    "kg_shortest_paths": q_kg_shortest_paths,
    "kg_components": q_kg_components,
    "kg_link_prediction": q_kg_link_prediction,
    "chi2_crosstab": q_chi2_crosstab,
    "kg_pipeline_edges": q_kg_pipeline_edges,
    "kg_canonical_triples": q_kg_canonical_triples,
    "kg_pipeline_nodes": q_kg_pipeline_nodes,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_recall": q_ann_recall,
    "multimodal_decode": q_multimodal_decode,
    "extraction_stub": q_extraction_stub,
    "extraction_variables": q_extraction_variables,
    "pdf_roundtrip": q_pdf_roundtrip,
    "pdf_redaction": q_pdf_redaction,
}

ORACLES: dict[str, str] = {
    "kg_turns": SQL_KG_TURNS,
    "kg_assembly": SQL_KG_ASSEMBLY,
    "kg_mentions": SQL_KG_MENTIONS,
    "kg_triples": SQL_KG_TRIPLES,
    "kg_entity_counts": SQL_KG_ENTITY_COUNTS,
    "agg_pricing_summary": SQL_AGG_PRICING,
    "agg_rollup": SQL_AGG_ROLLUP,
    "pareto_orders": SQL_PARETO_ORDERS,
    "join_top_orders": SQL_JOIN_TOP_ORDERS,
    "window_customer_top3": SQL_WINDOW_TOP3,
    "window_prev_next": SQL_WINDOW_PREV_NEXT,
    "window_deciles": SQL_WINDOW_DECILES,
    "events_json_k": SQL_EVENTS_JSON,
    "events_sessionize": SQL_EVENTS_SESSIONIZE,
    "events_asof": SQL_EVENTS_ASOF,
    "cdc_apply": SQL_CDC_APPLY,
    "snapshot_diff": SQL_SNAPSHOT_DIFF,
    "scd2_history": SQL_SCD2_HISTORY,
    "events_rolling": SQL_EVENTS_ROLLING,
    "events_funnel": SQL_EVENTS_FUNNEL,
    "events_bursts": SQL_EVENTS_BURSTS,
    "events_transitions": SQL_EVENTS_TRANSITIONS,
    "events_retention": SQL_EVENTS_RETENTION,
    "events_ohlc": SQL_EVENTS_OHLC,
    "events_cumulative": SQL_EVENTS_CUMULATIVE,
    "events_trend": SQL_EVENTS_TREND,
    "events_twap": SQL_EVENTS_TWAP,
    "events_ewma": SQL_EVENTS_EWMA,
    "fd_violations": SQL_FD_VIOLATIONS,
    "bitmap_segments": SQL_BITMAP_SEGMENTS,
    "unpivot_metrics": SQL_UNPIVOT_METRICS,
    "kmv_union": SQL_KMV_UNION,
    "kg_degree_hist": SQL_KG_DEGREE_HIST,
    "scd2_pit_join": SQL_SCD2_PIT_JOIN,
    "active_users_7d": SQL_ACTIVE_USERS_7D,
    "session_paths": SQL_SESSION_PATHS,
    "fingerprint_winnow": SQL_FINGERPRINT_WINNOW,
    "copurchase_cosine": SQL_COPURCHASE_COSINE,
    "activity_streaks": SQL_ACTIVITY_STREAKS,
    "drift_psi": SQL_DRIFT_PSI,
    "ivm_refresh": SQL_IVM_REFRESH,
    "dow_hour_matrix": SQL_DOW_HOUR_MATRIX,
    "kaplan_meier": SQL_KAPLAN_MEIER,
    "events_cusum": SQL_EVENTS_CUSUM,
    "rfm_segments": SQL_RFM_SEGMENTS,
    "attribution_last_touch": SQL_ATTRIBUTION_LAST_TOUCH,
    "k_anonymity": SQL_K_ANONYMITY,
    "winsorized_mean": SQL_WINSORIZED_MEAN,
    "calibration_bins": SQL_CALIBRATION_BINS,
    "balance_classes": SQL_BALANCE_CLASSES,
    "kmv_intersect": SQL_KMV_INTERSECT,
    "index_postings": SQL_INDEX_POSTINGS,
    "events_trigrams": SQL_EVENTS_TRIGRAMS,
    "events_debounce": SQL_EVENTS_DEBOUNCE,
    "assoc_rules": SQL_ASSOC_RULES,
    "distinct_hll": SQL_DISTINCT_HLL,
    "bm25_rank": SQL_BM25_RANK,
    "seasonal_baseline": SQL_SEASONAL_BASELINE,
    "conversion_wilson": SQL_CONVERSION_WILSON,
    "trending_decay": SQL_TRENDING_DECAY,
    "cohort_ltv": SQL_COHORT_LTV,
    "interval_coverage": SQL_INTERVAL_COVERAGE,
    "fifo_allocation": SQL_FIFO_ALLOCATION,
    "revenue_gini": SQL_REVENUE_GINI,
    "geo_grid_join": SQL_GEO_GRID_JOIN,
    "kg_negative_samples": SQL_KG_NEGATIVE_SAMPLES,
    "benford_digits": SQL_BENFORD_DIGITS,
    "apportionment_seats": SQL_APPORTIONMENT_SEATS,
    "gap_fill_daily": SQL_GAP_FILL_DAILY,
    "rank_migration": SQL_RANK_MIGRATION,
    "skyline_parts": SQL_SKYLINE_PARTS,
    "quantile_normalize": SQL_QUANTILE_NORMALIZE,
    "events_novelty": SQL_EVENTS_NOVELTY,
    "blocking_metrics": SQL_BLOCKING_METRICS,
    "annotator_kappa": SQL_ANNOTATOR_KAPPA,
    "encoding_planner": SQL_ENCODING_PLANNER,
    "spatial_clusters": SQL_SPATIAL_CLUSTERS,
    "quality_readability": SQL_QUALITY_READABILITY,
    "conversion_latency": SQL_CONVERSION_LATENCY,
    "attribution_linear": SQL_ATTRIBUTION_LINEAR,
    "kg_clustering_coeff": SQL_KG_CLUSTERING_COEFF,
    "theil_sen_trend": SQL_THEIL_SEN_TREND,
    "events_apdex": SQL_EVENTS_APDEX,
    "heavy_hitters": SQL_HEAVY_HITTERS,
    "boxplot_stats": SQL_BOXPLOT_STATS,
    "spearman_corr": SQL_SPEARMAN_CORR,
    "mann_kendall": SQL_MANN_KENDALL,
    "mann_whitney_u": SQL_MANN_WHITNEY_U,
    "hhi_concentration": SQL_HHI_CONCENTRATION,
    "max_concurrency": SQL_MAX_CONCURRENCY,
    "growth_accounting": SQL_GROWTH_ACCOUNTING,
    "bigram_pmi": SQL_BIGRAM_PMI,
    "interpolate_linear": SQL_INTERPOLATE_LINEAR,
    "pages_bounce_exit": SQL_PAGES_BOUNCE_EXIT,
    "inventory_reorder": SQL_INVENTORY_REORDER,
    "vocab_coverage": SQL_VOCAB_COVERAGE,
    "padding_waste": SQL_PADDING_WASTE,
    "target_encoding": SQL_TARGET_ENCODING,
    "cuped_adjust": SQL_CUPED_ADJUST,
    "ks_statistic": SQL_KS_STATISTIC,
    "lorenz_curve": SQL_LORENZ_CURVE,
    "conditional_entropy": SQL_CONDITIONAL_ENTROPY,
    "runs_test": SQL_RUNS_TEST,
    "acf_daily": SQL_ACF_DAILY,
    "label_centroid_cosine": SQL_LABEL_CENTROID_COSINE,
    "duplicate_shipments": SQL_DUPLICATE_SHIPMENTS,
    "zipf_fit": SQL_ZIPF_FIT,
    "lexical_richness": SQL_LEXICAL_RICHNESS,
    "class_weights": SQL_CLASS_WEIGHTS,
    "adamic_adar": SQL_ADAMIC_ADAR,
    "revenue_bridge": SQL_REVENUE_BRIDGE,
    "engagement_ccdf": SQL_ENGAGEMENT_CCDF,
    "token_source_mi": SQL_TOKEN_SOURCE_MI,
    "interarrival_hist": SQL_INTERARRIVAL_HIST,
    "month_seasonal_index": SQL_MONTH_SEASONAL_INDEX,
    "zonemap_prune_sim": SQL_ZONEMAP_PRUNE_SIM,
    "late_arrival_audit": SQL_LATE_ARRIVAL_AUDIT,
    "daily_cooccurrence_lift": SQL_DAILY_COOCCURRENCE_LIFT,
    "cohort_by_channel": SQL_COHORT_BY_CHANNEL,
    "stickiness_weekly": SQL_STICKINESS_WEEKLY,
    "basket_size_hist": SQL_BASKET_SIZE_HIST,
    "dod_change_alerts": SQL_DOD_CHANGE_ALERTS,
    "load_factor": SQL_LOAD_FACTOR,
    "degree_assortativity": SQL_DEGREE_ASSORTATIVITY,
    "purchase_cadence": SQL_PURCHASE_CADENCE,
    "embedding_norm_hist": SQL_EMBEDDING_NORM_HIST,
    "weekend_effect": SQL_WEEKEND_EFFECT,
    "shipping_sla": SQL_SHIPPING_SLA,
    "fano_factor": SQL_FANO_FACTOR,
    "sequence_violations": SQL_SEQUENCE_VIOLATIONS,
    "reactivation_latency": SQL_REACTIVATION_LATENCY,
    "hourly_envelope": SQL_HOURLY_ENVELOPE,
    "discount_elasticity": SQL_DISCOUNT_ELASTICITY,
    "abc_classification": SQL_ABC_CLASSIFICATION,
    "ndcg_at_k": SQL_NDCG_AT_K,
    "srm_check": SQL_SRM_CHECK,
    "peak_detection": SQL_PEAK_DETECTION,
    "price_dispersion": SQL_PRICE_DISPERSION,
    "containment_dedup": SQL_CONTAINMENT_DEDUP,
    "kendall_tau": SQL_KENDALL_TAU,
    "new_vs_returning": SQL_NEW_VS_RETURNING,
    "simpson_reversal": SQL_SIMPSON_REVERSAL,
    "aging_buckets": SQL_AGING_BUCKETS,
    "subword_fertility": SQL_SUBWORD_FERTILITY,
    "gini_features": SQL_GINI_FEATURES,
    "containment_dedup_lsh": SQL_CONTAINMENT_DEDUP_LSH,
    "retrieval_mrr": SQL_RETRIEVAL_MRR,
    "vocab_growth": SQL_VOCAB_GROWTH,
    "transition_reciprocity": SQL_TRANSITION_RECIPROCITY,
    "forecast_accuracy": SQL_FORECAST_ACCURACY,
    "stratified_kfold": SQL_STRATIFIED_KFOLD,
    "dedup_savings": SQL_DEDUP_SAVINGS,
    "contamination_report": SQL_CONTAMINATION_REPORT,
    "embedding_dim_stats": SQL_EMBEDDING_DIM_STATS,
    "edge_support": SQL_EDGE_SUPPORT,
    "compaction_plan": SQL_COMPACTION_PLAN,
    "price_volume_mix": SQL_PRICE_VOLUME_MIX,
    "dedup_incremental": SQL_DEDUP_INCREMENTAL,
    "lang_divergence_js": SQL_LANG_DIVERGENCE_JS,
    "pr_gains_curve": SQL_PR_GAINS_CURVE,
    "rle_lengths": SQL_RLE_LENGTHS,
    "hour_uniformity": SQL_HOUR_UNIFORMITY,
    "corpus_datasheet": SQL_CORPUS_DATASHEET,
    "chunk_sliding": SQL_CHUNK_SLIDING,
    "prefix_collision": SQL_PREFIX_COLLISION,
    "erasure_audit": SQL_ERASURE_AUDIT,
    "ab_count_ztest": SQL_AB_COUNT_ZTEST,
    "nation_outlier_loo": SQL_NATION_OUTLIER_LOO,
    "epoch_plan": SQL_EPOCH_PLAN,
    "dedup_triangle_audit": SQL_DEDUP_TRIANGLE_AUDIT,
    "share_of_parent": SQL_SHARE_OF_PARENT,
    "realized_vs_list": SQL_REALIZED_VS_LIST,
    "supplier_concentration": SQL_SUPPLIER_CONCENTRATION,
    "quant_error": SQL_QUANT_ERROR,
    "repeat_bestsellers": SQL_REPEAT_BESTSELLERS,
    "fk_cardinality": SQL_FK_CARDINALITY,
    "topk_overlap": SQL_TOPK_OVERLAP,
    "dedup_rate_by_source": SQL_DEDUP_RATE_BY_SOURCE,
    "emd_segments": SQL_EMD_SEGMENTS,
    "hill_tail": SQL_HILL_TAIL,
    "promo_share_trend": SQL_PROMO_SHARE_TREND,
    "minhash_calibration": SQL_MINHASH_CALIBRATION,
    "dq_rules": SQL_DQ_RULES,
    "embedding_drift": SQL_EMBEDDING_DRIFT,
    "conformal_bound": SQL_CONFORMAL_BOUND,
    "boilerplate_score": SQL_BOILERPLATE_SCORE,
    "shingle_size_sensitivity": SQL_SHINGLE_SIZE_SENSITIVITY,
    "segment_trend_ols": SQL_SEGMENT_TREND_OLS,
    "split_parity_psi": SQL_SPLIT_PARITY_PSI,
    "transition_dwell": SQL_TRANSITION_DWELL,
    "embedding_coverage": SQL_EMBEDDING_COVERAGE,
    "late_by_priority_trend": SQL_LATE_BY_PRIORITY_TREND,
    "ab_qte": SQL_AB_QTE,
    "rbo_rankings": SQL_RBO_RANKINGS,
    "dup_pair_edit_distance": SQL_DUP_PAIR_EDIT_DISTANCE,
    "eb_smoothed_rates": SQL_EB_SMOOTHED_RATES,
    "fd_binwidth": SQL_FD_BINWIDTH,
    "rich_club": SQL_RICH_CLUB,
    "nb_dispersion": SQL_NB_DISPERSION,
    "diurnal_phase": SQL_DIURNAL_PHASE,
    "standardized_repeat": SQL_STANDARDIZED_REPEAT,
    "weekday_priority_residuals": SQL_WEEKDAY_PRIORITY_RESIDUALS,
    "funnel_wilson": SQL_FUNNEL_WILSON,
    "price_endings": SQL_PRICE_ENDINGS,
    "type_cofrequency": SQL_TYPE_COFREQUENCY,
    "session_bookends": SQL_SESSION_BOOKENDS,
    "crosslang_dups": SQL_CROSSLANG_DUPS,
    "velocity_by_size": SQL_VELOCITY_BY_SIZE,
    "langid_confusion": SQL_LANGID_CONFUSION,
    "gap_skewness": SQL_GAP_SKEWNESS,
    "return_by_latency": SQL_RETURN_BY_LATENCY,
    "lsh_s_curve": SQL_LSH_S_CURVE,
    "dedup_scaling_curve": SQL_DEDUP_SCALING_CURVE,
    "heldout_perplexity": SQL_HELDOUT_PERPLEXITY,
    "hard_negatives": SQL_HARD_NEGATIVES,
    "quality_fusion": SQL_QUALITY_FUSION,
    "split_token_chi2": SQL_SPLIT_TOKEN_CHI2,
    "anova_two_way": SQL_ANOVA_TWO_WAY,
    "feature_hash_collisions": SQL_FEATURE_HASH_COLLISIONS,
    "cdf_linearity": SQL_CDF_LINEARITY,
    "dedup_group_sizes": SQL_DEDUP_GROUP_SIZES,
    "logrank_test": SQL_LOGRANK_TEST,
    "ratio_ci_delta": SQL_RATIO_CI_DELTA,
    "order_batching": SQL_ORDER_BATCHING,
    "token_burstiness": SQL_TOKEN_BURSTINESS,
    "chunk_dedup": SQL_CHUNK_DEDUP,
    "abc_xyz_matrix": SQL_ABC_XYZ_MATRIX,
    "dup_id_distance": SQL_DUP_ID_DISTANCE,
    "arc_elasticity": SQL_ARC_ELASTICITY,
    "neyman_allocation": SQL_NEYMAN_ALLOCATION,
    "poststrat_mean": SQL_POSTSTRAT_MEAN,
    "avg_neighbor_degree": SQL_AVG_NEIGHBOR_DEGREE,
    "retention_halflife": SQL_RETENTION_HALFLIFE,
    "segment_comovement": SQL_SEGMENT_COMOVEMENT,
    "supplier_scorecard": SQL_SUPPLIER_SCORECARD,
    "kfold_lm_scores": SQL_KFOLD_LM_SCORES,
    "hybrid_dedup": SQL_HYBRID_DEDUP,
    "partial_correlation": SQL_PARTIAL_CORRELATION,
    "topk_stability": SQL_TOPK_STABILITY,
    "session_length_geom": SQL_SESSION_LENGTH_GEOM,
    "revenue_var_es": SQL_REVENUE_VAR_ES,
    "pack_budget_sweep": SQL_PACK_BUDGET_SWEEP,
    "lsh_band_sweep": SQL_LSH_BAND_SWEEP,
    "decontam_ngram_sweep": SQL_DECONTAM_NGRAM_SWEEP,
    "dup_length_bias": SQL_DUP_LENGTH_BIAS,
    "kfold_label_balance": SQL_KFOLD_LABEL_BALANCE,
    "gate_waterfall": SQL_GATE_WATERFALL,
    "transition_stationary": SQL_TRANSITION_STATIONARY,
    "hits_bipartite": SQL_HITS_BIPARTITE,
    "dedup_keep_policy": SQL_DEDUP_KEEP_POLICY,
    "split_dup_leakage": SQL_SPLIT_DUP_LEAKAGE,
    "multiple_testing_fdr": SQL_MULTIPLE_TESTING_FDR,
    "pii_scan": SQL_PII_SCAN,
    "bloom_filter_fpr": SQL_BLOOM_FILTER_FPR,
    "shapley_attribution": SQL_SHAPLEY_ATTRIBUTION,
    "changepoint_detection": SQL_CHANGEPOINT_DETECTION,
    "stylometry_delta": SQL_STYLOMETRY_DELTA,
    "eventually_follows": SQL_EVENTUALLY_FOLLOWS,
    "kcore_decomposition": SQL_KCORE_DECOMPOSITION,
    "textrank_keywords": SQL_TEXTRANK_KEYWORDS,
    "ipf_raking": SQL_IPF_RAKING,
    "queue_wait_lindley": SQL_QUEUE_WAIT_LINDLEY,
    "brier_decomposition": SQL_BRIER_DECOMPOSITION,
    "markov_entropy_rate": SQL_MARKOV_ENTROPY_RATE,
    "session_gap_sweep": SQL_SESSION_GAP_SWEEP,
    "tfidf_cosine_pairs": SQL_TFIDF_COSINE_PAIRS,
    "sequential_obf": SQL_SEQUENTIAL_OBF,
    "did_estimator": SQL_DID_ESTIMATOR,
    "rake_keyphrases": SQL_RAKE_KEYPHRASES,
    "decision_stump_gain": SQL_DECISION_STUMP_GAIN,
    "greedy_set_cover": SQL_GREEDY_SET_COVER,
    "mmr_diversified_topk": SQL_MMR_DIVERSIFIED_TOPK,
    "greedy_matching": SQL_GREEDY_MATCHING,
    "ips_offpolicy": SQL_IPS_OFFPOLICY,
    "fellegi_sunter": SQL_FELLEGI_SUNTER,
    "pagerank_personalized": SQL_PAGERANK_PERSONALIZED,
    "markov_absorption": SQL_MARKOV_ABSORPTION,
    "pca_power_iteration": SQL_PCA_POWER_ITERATION,
    "naive_bayes_langid": SQL_NAIVE_BAYES_LANGID,
    "consistent_hash_ring": SQL_CONSISTENT_HASH_RING,
    "merkle_root": SQL_MERKLE_ROOT,
    "v_optimal_histogram": SQL_V_OPTIMAL_HISTOGRAM,
    "aa_test_calibration": SQL_AA_TEST_CALIBRATION,
    "good_turing": SQL_GOOD_TURING,
    "count_min_sketch": SQL_COUNT_MIN_SKETCH,
    "matching_att": SQL_MATCHING_ATT,
    "join_size_estimate": SQL_JOIN_SIZE_ESTIMATE,
    "median_ci_order_stats": SQL_MEDIAN_CI_ORDER_STATS,
    "markov_removal_attribution": SQL_MARKOV_REMOVAL_ATTRIBUTION,
    "bradley_terry": SQL_BRADLEY_TERRY,
    "logistic_newton": SQL_LOGISTIC_NEWTON,
    "partition_modularity": SQL_PARTITION_MODULARITY,
    "hill_numbers": SQL_HILL_NUMBERS,
    "sax_motifs": SQL_SAX_MOTIFS,
    "type_graph_reachability": SQL_TYPE_GRAPH_REACHABILITY,
    "simhash_angle_estimate": SQL_SIMHASH_ANGLE_ESTIMATE,
    "haar_wavelet": SQL_HAAR_WAVELET,
    "texttiling_segments": SQL_TEXTTILING_SEGMENTS,
    "selectivity_estimate": SQL_SELECTIVITY_ESTIMATE,
    "chao1_richness": SQL_CHAO1_RICHNESS,
    "salting_skew_audit": SQL_SALTING_SKEW_AUDIT,
    "integrity_orphans": SQL_INTEGRITY_ORPHANS,
    "integrity_gaps": SQL_INTEGRITY_GAPS,
    "events_range_join": SQL_EVENTS_RANGE_JOIN,
    "empty_predicate": SQL_EMPTY_PREDICATE,
    "id_gen": SQL_ID_GEN,
    "base_id_roundtrip": SQL_BASE_ID,
    "umlaut_translit": SQL_UMLAUT,
    "boolean_coercion": SQL_BOOLEAN_COERCION,
    "metrics_boolean": SQL_METRICS_BOOLEAN,
    "metrics_stringmatch": SQL_METRICS_STRINGMATCH,
    "fuzzy_part_pairs": SQL_FUZZY_PART_PAIRS,
    "fuzzy_part_pairs_capped": SQL_FUZZY_PART_PAIRS_CAPPED,
    "fuzzy_token_sort": SQL_FUZZY_TOKEN_SORT,
    "masking": SQL_MASKING,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_ngram_jaccard": SQL_DEDUP_NGRAM,
    "dedup_jaccard_prefix": SQL_DEDUP_JACCARD_PREFIX,
    "dedup_minhash": SQL_DEDUP_MINHASH,
    "dedup_simhash": SQL_DEDUP_SIMHASH,
    "dedup_embedding": SQL_DEDUP_EMBEDDING,
    "dedup_embedding_ivf": SQL_DEDUP_EMBEDDING_IVF,
    "similarity_topk": SQL_SIMILARITY_TOPK,
    "knn_join": SQL_KNN_JOIN,
    "knn_join_bucketed": SQL_KNN_JOIN_BUCKETED,
    "knn_join_bucketed_capped": SQL_KNN_JOIN_BUCKETED_CAPPED,
    "decontaminate_semantic": SQL_DECONTAMINATE_SEMANTIC,
    "textstats_tokens": SQL_TEXTSTATS_TOKENS,
    "textstats_quality": SQL_TEXTSTATS_QUALITY,
    "quality_repetition": SQL_QUALITY_REPETITION,
    "quality_entropy": SQL_QUALITY_ENTROPY,
    "unigram_logprob": SQL_UNIGRAM_LOGPROB,
    "lang_id": SQL_LANG_ID,
    "fingerprint": SQL_FINGERPRINT,
    "redaction_metrics": SQL_REDACTION_METRICS,
    "redaction_classwise": SQL_REDACTION_CLASSWISE,
    "labels_join": SQL_LABELS_JOIN,
    "labels_reannotate": SQL_LABELS_REANNOTATE,
    "export_pivot": SQL_EXPORT_PIVOT,
    "leaderboard_mean": SQL_LEADERBOARD_MEAN,
    "first_non_empty": SQL_FIRST_NON_EMPTY,
    "expect_exactly_one": SQL_EXPECT_EXACTLY_ONE,
    "merge_metadata": SQL_MERGE_METADATA,
    "label_type_inference": SQL_LABEL_TYPE_INFERENCE,
    "label_check": SQL_LABEL_CHECK,
    "file_manifest_join": SQL_FILE_MANIFEST_JOIN,
    "metrics_multiclass": SQL_METRICS_MULTICLASS,
    "invariant_per_turn": SQL_INVARIANT_PER_TURN,
    "dedup_groups": SQL_DEDUP_GROUPS,
    "dedup_groups_lsh": SQL_DEDUP_GROUPS_LSH,
    "dataset_split": SQL_DATASET_SPLIT,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "curation_pipeline": SQL_CURATION_PIPELINE,
    "training_corpus": SQL_TRAINING_CORPUS,
    "pack_sequences": SQL_PACK_SEQUENCES,
    "pack_shards": SQL_PACK_SHARDS,
    "pack_sequences_bpe": SQL_PACK_SEQUENCES_BPE,
    "decontaminate": SQL_DECONTAMINATE,
    "dsir_importance": SQL_DSIR_IMPORTANCE,
    "dedup_lines": SQL_DEDUP_LINES,
    "dup_ngram_spans": SQL_DUP_NGRAM_SPANS,
    "domain_mixture": SQL_DOMAIN_MIXTURE,
    "bpe_pair_counts": SQL_BPE_PAIR_COUNTS,
    "profile_columns": SQL_PROFILE_COLUMNS,
    "tfidf_top_terms": SQL_TFIDF_TOP_TERMS,
    "search_rank": SQL_SEARCH_RANK,
    "search_phrase": SQL_SEARCH_PHRASE,
    "profile_quantiles": SQL_PROFILE_QUANTILES,
    "weighted_median": SQL_WEIGHTED_MEDIAN,
    "outliers_mad": SQL_OUTLIERS_MAD,
    "profile_histogram": SQL_PROFILE_HISTOGRAM,
    "skew_histogram": SQL_SKEW_HISTOGRAM,
    "zorder_key": SQL_ZORDER_KEY,
    "distinct_kmv": SQL_DISTINCT_KMV,
    "priority_sample": SQL_PRIORITY_SAMPLE,
    "sample_k_per_group": SQL_SAMPLE_K_PER_GROUP,
    "quantize_embeddings": SQL_QUANTIZE_EMBEDDINGS,
    "multimodal_features": SQL_MULTIMODAL_FEATURES,
    "multimodal_decode": SQL_MULTIMODAL_DECODE,
    "kg_canonical_triples": SQL_KG_CANONICAL_TRIPLES,
    "kg_pagerank": SQL_KG_PAGERANK,
    "kg_triangles": SQL_KG_TRIANGLES,
    "kg_two_hop": SQL_KG_TWO_HOP,
    "kg_cooccurrence": SQL_KG_COOCCURRENCE,
    "kg_shortest_paths": SQL_KG_SHORTEST_PATHS,
    "kg_components": SQL_KG_COMPONENTS,
    "kg_link_prediction": SQL_KG_LINK_PREDICTION,
    "chi2_crosstab": SQL_CHI2_CROSSTAB,
    "kg_pipeline_edges": SQL_KG_PIPELINE_EDGES,
    "kg_pipeline_nodes": SQL_KG_PIPELINE_NODES,
    "extraction_stub": SQL_EXTRACTION_STUB,
    "extraction_variables": SQL_EXTRACTION_VARIABLES,
    "anonymizer_conversations": SQL_ANONYMIZER,
    "ann_ivf_topk": SQL_ANN_IVF_TOPK,
    "ann_recall": SQL_ANN_RECALL,
    "pdf_roundtrip": SQL_PDF_ROUNDTRIP,
    "pdf_redaction": SQL_PDF_REDACTION,
}
