"""Catalog stage-and-swap semantics for write_graph_tables (S9).

The V2 session catalog (spark_catalog) supports CTAS + partitionedBy +
RENAME, so the real catalog path — not just the parquet fallback — is
exercised here: both tables land under *_stg names and swap in only
after BOTH writes succeed, so a failed refresh preserves the previous
consistent snapshot (round-2 advice: createOrReplace on the final names
destroyed it before the failure surfaced).
"""

import pytest
from pyspark.sql import functions as F

from llmaix_spark.operators.materialize import write_graph_tables

PREFIX = "spark_catalog.default"


@pytest.fixture()
def clean_tables(spark):
    names = [f"{PREFIX}.{t}{s}" for t in ("nodes", "edges")
             for s in ("", "_stg", "_old")]
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")
    yield
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def _graph(spark, n, tag):
    nodes = spark.range(n).select(
        F.col("id").alias("node_id"), F.lit(tag).alias("canonical")
    )
    edges = spark.range(n * 2).select(
        F.col("id").alias("subj_id"),
        (F.col("id") + 1).alias("obj_id"),
        F.when(F.col("id") % 2 == 0, "joins").otherwise("merges").alias("pred"),
    )
    return nodes, edges


def test_catalog_write_and_swap(spark, clean_tables):
    nodes, edges = _graph(spark, 5, "v1")
    targets = write_graph_tables(nodes, edges, table_prefix=PREFIX)
    assert targets == {"nodes": f"{PREFIX}.nodes", "edges": f"{PREFIX}.edges"}
    assert spark.table(f"{PREFIX}.nodes").count() == 5
    assert spark.table(f"{PREFIX}.edges").count() == 10
    # no staging leftovers after a successful swap
    stg = {t.name for t in spark.catalog.listTables("default")}
    assert "nodes_stg" not in stg and "edges_stg" not in stg
    # a second refresh replaces the snapshot atomically — check the
    # PARTITIONED table's rows too: dropping *_old through stale
    # partition locations used to delete the fresh edges data (the
    # round-4 MSCK SYNC finding), which a nodes-only assert missed
    nodes2, edges2 = _graph(spark, 7, "v2")
    write_graph_tables(nodes2, edges2, table_prefix=PREFIX)
    assert spark.table(f"{PREFIX}.nodes").count() == 7
    assert spark.table(f"{PREFIX}.nodes").first()["canonical"] == "v2"
    assert spark.table(f"{PREFIX}.edges").count() == 14
    preds = {r["pred"] for r in spark.table(f"{PREFIX}.edges")
             .select("pred").distinct().collect()}
    assert preds == {"joins", "merges"}


def test_failed_refresh_preserves_last_snapshot(spark, clean_tables):
    nodes, edges = _graph(spark, 5, "v1")
    write_graph_tables(nodes, edges, table_prefix=PREFIX)
    # a refresh whose EDGES write fails mid-flight (after nodes_stg
    # succeeded) must leave the v1 snapshot fully readable
    nodes2, _ = _graph(spark, 9, "v2")
    bad_edges = spark.range(4).select(
        F.col("id").alias("subj_id"),
        F.col("id").alias("obj_id"),
        F.raise_error(F.lit("simulated write failure")).cast("string").alias("pred"),
    )
    with pytest.raises(Exception, match="simulated write failure"):
        write_graph_tables(nodes2, bad_edges, table_prefix=PREFIX)
    assert spark.table(f"{PREFIX}.nodes").count() == 5
    assert spark.table(f"{PREFIX}.nodes").first()["canonical"] == "v1"
    assert spark.table(f"{PREFIX}.edges").count() == 10
    # staging leftovers from the failed run are gone
    stg = {t.name for t in spark.catalog.listTables("default")}
    assert "nodes_stg" not in stg and "edges_stg" not in stg
    # and a subsequent good refresh still swaps in cleanly
    nodes3, edges3 = _graph(spark, 3, "v3")
    write_graph_tables(nodes3, edges3, table_prefix=PREFIX)
    assert spark.table(f"{PREFIX}.nodes").count() == 3


def test_first_write_mid_swap_failure_leaves_catalog_empty(
    spark, clean_tables, monkeypatch
):
    """On a FIRST-EVER write (no previous snapshot) a mid-swap failure
    must leave both finals absent — not an orphaned fresh nodes table
    next to a missing edges table (review finding)."""
    real_sql = spark.sql

    def failing_sql(query, *a, **kw):
        if "edges_stg RENAME" in query:
            raise RuntimeError("injected rename failure")
        return real_sql(query, *a, **kw)

    monkeypatch.setattr(spark, "sql", failing_sql, raising=False)
    nodes, edges = _graph(spark, 5, "v1")
    with pytest.raises(Exception, match="injected rename failure"):
        write_graph_tables(nodes, edges, table_prefix=PREFIX)
    monkeypatch.undo()
    names = {t.name for t in spark.catalog.listTables("default")}
    assert not names & {"nodes", "edges", "nodes_stg", "edges_stg",
                        "nodes_old", "edges_old"}


def test_prior_crash_old_only_state_is_recovered(spark, clean_tables):
    """A prior process crash between rename-aside and swap leaves the
    snapshot ONLY under *_old: the next run must restore it, not drop
    it as garbage (review finding) — and then refresh normally."""
    nodes, edges = _graph(spark, 5, "v1")
    write_graph_tables(nodes, edges, table_prefix=PREFIX)
    # simulate the crash state: final renamed aside, swap never happened
    spark.sql(f"ALTER TABLE {PREFIX}.nodes RENAME TO default.nodes_old")
    nodes2, edges2 = _graph(spark, 7, "v2")
    write_graph_tables(nodes2, edges2, table_prefix=PREFIX)
    assert spark.table(f"{PREFIX}.nodes").count() == 7
    assert spark.table(f"{PREFIX}.nodes").first()["canonical"] == "v2"
    names = {t.name for t in spark.catalog.listTables("default")}
    assert not names & {"nodes_old", "edges_old", "nodes_stg", "edges_stg"}


def test_prior_half_swapped_crash_recovery_is_pair_atomic(
    spark, clean_tables, monkeypatch
):
    """Prior process hard-killed AFTER swapping nodes in but BEFORE
    edges: (nodes=fresh-partial, nodes_old=v1, edges absent,
    edges_old=v1). Recovery must treat the *_old PAIR as the last
    complete snapshot and restore BOTH — classifying each *_old
    independently dropped nodes_old (the last v1-nodes copy) and left a
    fresh-nodes/stale-edges catalog that a later failed refresh rolled
    back TO (advice r3 finding)."""
    nodes, edges = _graph(spark, 5, "v1")
    write_graph_tables(nodes, edges, table_prefix=PREFIX)
    # fabricate the half-swapped crash state
    spark.sql(f"ALTER TABLE {PREFIX}.edges RENAME TO default.edges_old")
    spark.sql(f"ALTER TABLE {PREFIX}.nodes RENAME TO default.nodes_old")
    n2, _ = _graph(spark, 9, "v2-partial")
    n2.writeTo(f"{PREFIX}.nodes").create()

    # the next refresh itself fails mid-swap: the rollback target must
    # be the RECOVERED v1 pair, not the mixed crash state
    real_sql = spark.sql

    def failing_sql(query, *a, **kw):
        if "edges_stg RENAME" in query:
            raise RuntimeError("injected rename failure")
        return real_sql(query, *a, **kw)

    monkeypatch.setattr(spark, "sql", failing_sql, raising=False)
    n3, e3 = _graph(spark, 7, "v3")
    with pytest.raises(Exception, match="injected rename failure"):
        write_graph_tables(n3, e3, table_prefix=PREFIX)
    monkeypatch.undo()
    assert spark.table(f"{PREFIX}.nodes").count() == 5
    assert spark.table(f"{PREFIX}.nodes").first()["canonical"] == "v1"
    assert spark.table(f"{PREFIX}.edges").count() == 10
    names = {t.name for t in spark.catalog.listTables("default")}
    assert not names & {"nodes_stg", "edges_stg", "nodes_old", "edges_old"}
    # and a subsequent good refresh completes
    n4, e4 = _graph(spark, 3, "v4")
    write_graph_tables(n4, e4, table_prefix=PREFIX)
    assert spark.table(f"{PREFIX}.nodes").first()["canonical"] == "v4"


def test_prior_crash_recovery_across_tables_is_decoupled(
    spark, clean_tables, monkeypatch
):
    """Asymmetric pre-state (r4 advice): only NODES pre-existed. A hard
    kill between the two stg→final renames leaves {nodes=fresh-partial,
    nodes_old=v1, edges ABSENT, no edges_old}. The same-table pairing
    (old present AND own final missing) read this as post-swap garbage
    and dropped nodes_old — the last v1-nodes copy. The classifier must
    decouple: ANY final missing + ANY *_old present ⇒ mid-swap crash,
    restore every aside."""
    n1, _ = _graph(spark, 5, "v1")
    n1.writeTo(f"{PREFIX}.nodes").create()  # nodes-only pre-state
    # fabricate the kill window: v1 renamed aside, fresh partial swapped
    # in, the edges rename never ran
    spark.sql(f"ALTER TABLE {PREFIX}.nodes RENAME TO default.nodes_old")
    n2, _ = _graph(spark, 9, "v2-partial")
    n2.writeTo(f"{PREFIX}.nodes").create()

    # the next refresh fails mid-swap: its rollback target must be the
    # RECOVERED v1-nodes/no-edges state, not the partial
    real_sql = spark.sql

    def failing_sql(query, *a, **kw):
        if "edges_stg RENAME" in query:
            raise RuntimeError("injected rename failure")
        return real_sql(query, *a, **kw)

    monkeypatch.setattr(spark, "sql", failing_sql, raising=False)
    n3, e3 = _graph(spark, 7, "v3")
    with pytest.raises(Exception, match="injected rename failure"):
        write_graph_tables(n3, e3, table_prefix=PREFIX)
    monkeypatch.undo()
    assert spark.table(f"{PREFIX}.nodes").count() == 5
    assert spark.table(f"{PREFIX}.nodes").first()["canonical"] == "v1"
    names = {t.name for t in spark.catalog.listTables("default")}
    assert "edges" not in names
    assert not names & {"nodes_stg", "edges_stg", "nodes_old", "edges_old"}
    # and a clean refresh completes from the recovered state
    n4, e4 = _graph(spark, 3, "v4")
    write_graph_tables(n4, e4, table_prefix=PREFIX)
    assert spark.table(f"{PREFIX}.nodes").first()["canonical"] == "v4"
    assert spark.table(f"{PREFIX}.edges").count() == 6


def test_swap_renames_all_asides_before_any_final(spark, clean_tables,
                                                  monkeypatch):
    """ALL rename-asides must precede ANY stg→final rename. With the
    interleaved per-table order, a hard-kill after the nodes swap but
    before the edges aside produced {nodes=fresh, nodes_old=v1,
    edges=v1-final, edges_old absent} — indistinguishable from a
    post-swap cleanup crash, so recovery dropped nodes_old (the last
    v1-nodes copy) and settled on fresh-nodes/stale-edges (review
    finding). Asides-first makes that state unreachable; this pins the
    statement order so it stays unreachable."""
    nodes, edges = _graph(spark, 5, "v1")
    write_graph_tables(nodes, edges, table_prefix=PREFIX)
    stmts = []
    real_sql = spark.sql

    def recording_sql(query, *a, **kw):
        stmts.append(query)
        return real_sql(query, *a, **kw)

    monkeypatch.setattr(spark, "sql", recording_sql, raising=False)
    nodes2, edges2 = _graph(spark, 7, "v2")
    write_graph_tables(nodes2, edges2, table_prefix=PREFIX)
    monkeypatch.undo()
    aside_idx = [i for i, q in enumerate(stmts)
                 if "RENAME TO" in q and q.rstrip().endswith("_old")]
    final_idx = [i for i, q in enumerate(stmts)
                 if "_stg RENAME TO" in q]
    assert len(aside_idx) == 2 and len(final_idx) == 2
    assert max(aside_idx) < min(final_idx)


def test_prior_crash_mid_aside_restores_full_snapshot(spark, clean_tables):
    """Kill window between the two asides: {nodes absent, nodes_old=v1,
    edges=v1 final, edges_old absent}. Recovery must restore nodes_old
    and leave the (still-old) edges final untouched — full v1, then the
    refresh completes normally."""
    nodes, edges = _graph(spark, 5, "v1")
    write_graph_tables(nodes, edges, table_prefix=PREFIX)
    spark.sql(f"ALTER TABLE {PREFIX}.nodes RENAME TO default.nodes_old")
    nodes2, edges2 = _graph(spark, 7, "v2")
    write_graph_tables(nodes2, edges2, table_prefix=PREFIX)
    assert spark.table(f"{PREFIX}.nodes").count() == 7
    assert spark.table(f"{PREFIX}.nodes").first()["canonical"] == "v2"
    assert spark.table(f"{PREFIX}.edges").count() == 14
    names = {t.name for t in spark.catalog.listTables("default")}
    assert not names & {"nodes_old", "edges_old", "nodes_stg", "edges_stg"}


def test_cleanup_failure_after_complete_swap_keeps_new_snapshot(
    spark, clean_tables, monkeypatch
):
    """A transient failure dropping *_old AFTER both tables swapped must
    NOT roll the complete swap back (review finding: cleanup inside the
    try destroyed the fresh data and mixed snapshot versions)."""
    nodes, edges = _graph(spark, 5, "v1")
    write_graph_tables(nodes, edges, table_prefix=PREFIX)
    real_sql = spark.sql

    def failing_sql(query, *a, **kw):
        if query.strip().startswith("DROP TABLE") and "_old" in query:
            raise RuntimeError("transient metastore error")
        return real_sql(query, *a, **kw)

    monkeypatch.setattr(spark, "sql", failing_sql, raising=False)
    nodes2, edges2 = _graph(spark, 7, "v2")
    targets = write_graph_tables(nodes2, edges2, table_prefix=PREFIX)
    monkeypatch.undo()
    assert targets["nodes"] == f"{PREFIX}.nodes"
    assert spark.table(f"{PREFIX}.nodes").count() == 7
    assert spark.table(f"{PREFIX}.nodes").first()["canonical"] == "v2"
    assert spark.table(f"{PREFIX}.edges").count() == 14
    # the leftover *_old garbage is tolerated and cleared by the NEXT run
    nodes3, edges3 = _graph(spark, 3, "v3")
    write_graph_tables(nodes3, edges3, table_prefix=PREFIX)
    assert spark.table(f"{PREFIX}.nodes").count() == 3
    names = {t.name for t in spark.catalog.listTables("default")}
    assert not names & {"nodes_old", "edges_old"}


def test_mid_swap_failure_restores_whole_snapshot(spark, clean_tables,
                                                 monkeypatch):
    """A failure DURING the swap phase (after nodes already swapped to
    the new version, before edges did) must roll the whole previous
    snapshot back — never fresh nodes next to stale edges, and never a
    dropped table (review finding: the old drop-then-rename sequence
    plus staging cleanup could delete the only remaining edges copy)."""
    nodes, edges = _graph(spark, 5, "v1")
    write_graph_tables(nodes, edges, table_prefix=PREFIX)

    real_sql = spark.sql

    def failing_sql(query, *a, **kw):
        if "edges_stg RENAME" in query:
            raise RuntimeError("injected rename failure")
        return real_sql(query, *a, **kw)

    monkeypatch.setattr(spark, "sql", failing_sql, raising=False)
    nodes2, edges2 = _graph(spark, 9, "v2")
    with pytest.raises(Exception, match="injected rename failure"):
        write_graph_tables(nodes2, edges2, table_prefix=PREFIX)
    monkeypatch.undo()
    # the ENTIRE v1 snapshot is back — nodes too, though its swap had
    # already completed when the edges rename failed
    assert spark.table(f"{PREFIX}.nodes").count() == 5
    assert spark.table(f"{PREFIX}.nodes").first()["canonical"] == "v1"
    assert spark.table(f"{PREFIX}.edges").count() == 10
    names = {t.name for t in spark.catalog.listTables("default")}
    assert not names & {"nodes_stg", "edges_stg", "nodes_old", "edges_old"}


def _find_iceberg_jar():
    """An iceberg-spark-runtime jar, if one is available: the
    SPARK_GRAFT_ICEBERG_JAR env var, or any iceberg jar next to the
    pyspark jars. Vendoring was attempted in round 4: no jar ships in
    the sandbox image and the sandbox has no network to fetch one from
    Maven — so this returns None here, and the test below documents
    exactly what it would pin."""
    import glob as _glob
    import os

    p = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")
    if p and os.path.exists(p):
        return p
    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    hits = _glob.glob(os.path.join(jars, "*iceberg-spark-runtime*.jar"))
    return hits[0] if hits else None


def test_iceberg_runtime_snapshot_semantics():
    """With an Iceberg runtime on the classpath: write_graph_tables
    against a local hadoop catalog, pinning (1) snapshot isolation —
    a failed refresh leaves the previous snapshot readable, (2)
    overwrite-by-partition via the partitionedBy(pred) write, (3)
    rename-based swap as pure metadata. Without one, skip loudly: the
    V2-session-catalog twin of the same contract is exercised by every
    other test in this file (the documented substitute,
    docs/SCALING.md), and this test self-activates the moment an
    iceberg-spark-runtime jar lands via SPARK_GRAFT_ICEBERG_JAR."""
    jar = _find_iceberg_jar()
    if jar is None:
        pytest.skip(
            "no iceberg-spark-runtime jar: none ships in the sandbox "
            "image and there is no network to vendor one from Maven "
            "(verified round 4); catalog semantics are pinned against "
            "the real V2 session catalog instead (tests above)"
        )
    # isolated subprocess, NOT getOrCreate(): the suite's session-scoped
    # SparkSession already exists, so getOrCreate() would return it and
    # silently ignore the create-time-only spark.jars / extensions /
    # catalog configs — and stopping it here would kill the shared
    # context for the rest of the suite
    import os
    import subprocess
    import sys
    import tempfile
    import textwrap

    wh = tempfile.mkdtemp(prefix="iceberg_wh_")
    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
        from pyspark.sql import SparkSession, functions as F
        from llmaix_spark.operators.materialize import write_graph_tables

        s = (
            SparkSession.builder.master("local[2]")
            .appName("iceberg-catalog-test")
            .config("spark.jars", {jar!r})
            .config("spark.sql.extensions",
                    "org.apache.iceberg.spark.extensions"
                    ".IcebergSparkSessionExtensions")
            .config("spark.sql.catalog.ice",
                    "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.ice.type", "hadoop")
            .config("spark.sql.catalog.ice.warehouse", {wh!r})
            .getOrCreate()
        )

        def graph(n, tag):
            nodes = s.range(n).select(
                F.col("id").alias("node_id"), F.lit(tag).alias("canonical"))
            edges = s.range(n * 2).select(
                F.col("id").alias("subj_id"),
                (F.col("id") + 1).alias("obj_id"),
                F.when(F.col("id") % 2 == 0, "joins")
                 .otherwise("merges").alias("pred"))
            return nodes, edges

        s.sql("CREATE NAMESPACE IF NOT EXISTS ice.kg")
        nodes, edges = graph(5, "v1")
        write_graph_tables(nodes, edges, table_prefix="ice.kg")
        assert s.table("ice.kg.nodes").count() == 5
        # failed refresh -> previous snapshot intact (snapshot isolation)
        nodes2, _ = graph(9, "v2")
        bad_edges = s.range(4).select(
            F.col("id").alias("subj_id"),
            F.col("id").alias("obj_id"),
            F.raise_error(F.lit("simulated write failure"))
            .cast("string").alias("pred"))
        try:
            write_graph_tables(nodes2, bad_edges, table_prefix="ice.kg")
            raise SystemExit("expected the edges write to fail")
        except Exception as e:
            assert "simulated write failure" in str(e), e
        assert s.table("ice.kg.nodes").first()["canonical"] == "v1"
        assert s.table("ice.kg.edges").count() == 10
        preds = {{r["pred"] for r in s.table("ice.kg.edges")
                 .select("pred").distinct().collect()}}
        assert preds == {{"joins", "merges"}}
        s.stop()
        print("ICEBERG-OK")
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=600,
    )
    assert out.returncode == 0 and "ICEBERG-OK" in out.stdout, (
        out.stdout[-2000:], out.stderr[-2000:]
    )
