"""Z-order clustering + runtime bloom-filter join pruning — the two
scan-reduction mechanisms a 100 TB deployment leans on (layout-time
data skipping; run-time probe-side filtering)."""

from pyspark.sql import functions as F

from llmaix_spark.functions.zorder import cluster_by_zorder, zorder2_expr


def _morton_twin(x: int, y: int) -> int:
    x &= 0x7FFFFFFF
    y &= 0x7FFFFFFF
    z = 0
    for i in range(31):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_matches_bitwise_twin(spark):
    pts = [
        (0, 0), (1, 0), (0, 1), (1, 1), (2, 3), (123, 456),
        (0x7FFFFFFF, 0x7FFFFFFF), (0x7FFFFFFF, 0), (65535, 32768),
        (2**31 + 5, 7),  # 32nd bit truncates
    ]
    df = spark.createDataFrame(pts, "x bigint, y bigint")
    got = [
        r["z"]
        for r in df.select(zorder2_expr(F.col("x"), F.col("y")).alias("z"))
        .collect()
    ]
    assert got == [_morton_twin(x, y) for x, y in pts]


def test_zorder_locality_of_clustered_layout(spark):
    """After cluster_by_zorder, each partition's (x, y) bounding box
    covers a small fraction of the plane — the property that makes
    per-file min/max stats selective for BOTH columns. A row-order
    layout of the same grid gives every partition a full-width x OR y
    span; the z-layout must beat it by a large factor."""
    n = 32
    grid = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(grid, "x bigint, y bigint").repartition(8)
    parts = 16
    clustered = cluster_by_zorder(df, "x", "y", parts)
    boxes = (
        clustered.groupBy(F.spark_partition_id().alias("pid"))
        .agg(
            (F.max("x") - F.min("x") + 1).alias("wx"),
            (F.max("y") - F.min("y") + 1).alias("wy"),
        )
        .collect()
    )
    assert len(boxes) == parts
    total_area = sum(r["wx"] * r["wy"] for r in boxes)
    # perfect tiling would be n*n; z-order guarantees a small constant
    # factor — row-order striping would give ~parts * n * (n/parts) * n
    # worth of overlap (each stripe full-width in x)
    assert total_area <= 4 * n * n


def test_runtime_bloom_filter_injected_on_shuffle_join(spark):
    """At bench scale the dim side broadcasts (better than any bloom);
    in the 100 TB fact-to-fact shape broadcast is off the table — pin
    that Spark then injects a bloom might_contain filter on the probe
    side, so the selective dimension predicate prunes the big scan at
    run time rather than after the shuffle."""
    li = spark.range(0, 50_000).select(
        (F.col("id") % 1000).alias("l_orderkey"), F.col("id").alias("v")
    )
    o = (
        spark.range(0, 1000)
        .select(
            F.col("id").alias("o_orderkey"),
            (F.col("id") % 7).alias("o_flag"),
        )
        .where(F.col("o_flag") == 3)
    )
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_flag").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
        assert j.collect()[0]["n"] == 143 * 50  # 143 keys ≡ 3 (mod 7)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
