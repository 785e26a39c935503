"""Materialization with per-partition lineage and exact resume.

The reference has no fault tolerance — a died job is rerun from zero;
progress is socketio telemetry (webapp/llm_processing/routes.py:90-147).
The rebuild replaces that with per-stage checkpoint manifests: every
stage writes parquet + a _MANIFEST.json (row count, schema, per-partition
lineage) atomically-enough (manifest last); `load_if_complete` lets the
pipeline resume from the last finished stage with bit-identical results
(the whole pipeline is deterministic: stable stub, content-hash ids,
order-insensitive aggregations).

On a real cluster these writes are `df.writeTo(...).createOrReplace()`
against Iceberg, which makes the manifest transactional for free; plain
parquet + JSON manifest reproduces the contract in this sandbox.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_MANIFEST.json"


def _stage_dir(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, f"stage={stage}")


def lineage_for(df: DataFrame, stage: str) -> DataFrame:
    """Per-partition lineage rows: (partition_id, stage, output_rows)."""
    return (
        df.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("output_rows"))
        .withColumn("stage", F.lit(stage))
        .select("partition_id", "stage", "output_rows")
    )


def write_stage(
    df: DataFrame,
    out_dir: str,
    stage: str,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Write a stage's output + lineage + manifest; return the re-read
    DataFrame (so downstream stages consume the materialized copy and a
    restart never recomputes upstream)."""
    spark = df.sparkSession
    d = _stage_dir(out_dir, stage)
    if os.path.exists(d):
        shutil.rmtree(d)
    data_dir = os.path.join(d, "data")
    # REBALANCE before the write (guide §6 small-files): without it every
    # upstream task emits one file per partition value (tasks × values
    # fragments — ~190 tiny files for the sf0.1 edges stage, and the
    # read-back + lineage + resume count paid ~3 s of listing/open cost
    # per consumer). The AQE rebalance coalesces to advisory-size output
    # partitions AND splits skewed partition values, so file count tracks
    # data volume at any scale instead of task count.
    w = df.hint("rebalance", *partition_by) if partition_by else df.hint("rebalance")
    w = w.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(data_dir)

    # explicit schema on the read-back: an EMPTY partitioned write emits
    # only _SUCCESS, and schema inference on it throws
    # UNABLE_TO_INFER_SCHEMA — a stage that legitimately produces zero
    # rows must still materialize
    back = spark.read.schema(df.schema).parquet(data_dir)
    # one cached pass feeds both the lineage write and the manifest count
    lineage = lineage_for(back, stage).persist()
    lineage_dir = os.path.join(d, "lineage")
    lineage.write.mode("overwrite").parquet(lineage_dir)
    n = lineage.agg(F.sum("output_rows")).collect()[0][0] or 0
    lineage.unpersist()
    manifest = {
        "stage": stage,
        "rows": n,
        "schema": back.schema.jsonValue(),
        "partition_by": partition_by or [],
        "complete": True,
    }
    with open(os.path.join(d, MANIFEST), "w") as f:
        json.dump(manifest, f)
    return back


def load_if_complete(
    spark: SparkSession, out_dir: str, stage: str
) -> DataFrame | None:
    """Return the stage's materialized DataFrame iff its manifest says
    complete and the row count still matches (cheap integrity check)."""
    d = _stage_dir(out_dir, stage)
    mpath = os.path.join(d, MANIFEST)
    if not os.path.exists(mpath):
        return None
    try:
        with open(mpath) as f:
            manifest = json.load(f)
        if not manifest.get("complete"):
            return None
        # schema from the manifest: a ZERO-row partitioned stage has no
        # part files to infer from, but is still a valid complete stage
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(manifest["schema"])
        df = spark.read.schema(schema).parquet(os.path.join(d, "data"))
        if df.count() != manifest["rows"]:
            return None
        return df
    except Exception:
        return None


def write_graph_tables(
    nodes: DataFrame,
    edges: DataFrame,
    out_dir: str | None = None,
    table_prefix: str | None = None,
) -> dict[str, str]:
    """Materialize the final graph as partitioned tables.

    With `table_prefix` (e.g. "catalog.kg") and an Iceberg catalog on the
    classpath, uses the transactional DataFrame-v2 write —
    `writeTo(...).partitionedBy(...).createOrReplace()` — which is the
    production path the north rule names (atomic manifest commit, exact
    resume for free). This sandbox has no Iceberg runtime jar, so the
    fallback is partitioned parquet under `out_dir` with the JSON
    manifests `write_stage` maintains; the calling code is identical.
    """
    targets = {}
    if table_prefix:
        # stage-and-swap: both tables are written under *_stg names
        # first, then swapped in only after BOTH writes succeed. A
        # failed refresh therefore leaves the PREVIOUS consistent
        # nodes/edges snapshot untouched (writing createOrReplace on the
        # final names destroyed it before the failure could surface),
        # and readers never see fresh nodes next to stale edges.
        spark = nodes.sparkSession
        stg = {t: f"{table_prefix}.{t}_stg" for t in ("nodes", "edges")}
        # RENAME targets must not repeat the catalog part
        # (IDENTIFIER_TOO_MANY_NAME_PARTS) — strip it when the prefix is
        # catalog-qualified (e.g. "spark_catalog.default" → "default")
        prefix_nocat = (
            table_prefix.split(".", 1)[1]
            if table_prefix.count(".") >= 1
            else table_prefix
        )
        def _exists(name: str) -> bool:
            try:
                return spark.catalog.tableExists(name)
            except Exception:
                return False

        def _msck(name: str) -> None:
            # the session catalog moves a managed table's DATA on
            # rename but leaves its PARTITION metadata pointing at the
            # OLD location. That is not just a read problem: DROP TABLE
            # on a managed table deletes each partition's registered
            # location, so dropping a renamed-aside *_old whose
            # partitions still point under the final table's directory
            # deletes the FRESH data that was just swapped in (found by
            # the round-4 mid-aside recovery test — edges read 0 rows
            # with only _SUCCESS left on disk). SYNC PARTITIONS both
            # drops the stale entries and registers the moved ones;
            # plain MSCK only ADDs, which leaves the data-eating stale
            # entries in place. Iceberg's rename is pure metadata and
            # rejects MSCK entirely, hence best-effort with fallback.
            try:
                spark.sql(f"MSCK REPAIR TABLE {name} SYNC PARTITIONS")
            except Exception:
                try:
                    spark.sql(f"MSCK REPAIR TABLE {name}")
                except Exception:
                    pass

        pre_existing: dict[str, bool] = {}
        swapped: list[str] = []
        try:
            # recover from a PRIOR process crash mid-swap first. The
            # decision is PAIR-atomic, not per-table: if ANY final table
            # is missing while ANY *_old survives, the crash happened
            # mid-swap and the *_old copies are the last complete
            # snapshot — restore EVERY existing *_old over its final
            # (a fresh final next to it is a half-swapped partial and is
            # dropped), so the catalog never settles on fresh-nodes/
            # stale-edges. Only when every final is present are the
            # *_old tables post-swap garbage safe to drop. (Classifying
            # each *_old independently destroyed the last old-nodes copy
            # in the nodes-swapped/edges-not state.) The missing-final
            # and surviving-aside need NOT be the same table: when only
            # nodes pre-existed, a kill between the two stg→final
            # renames leaves {nodes=fresh, nodes_old, edges ABSENT, no
            # edges_old} — the same-table pairing read that as post-swap
            # garbage and dropped the last v1-nodes copy (r4 advice). A
            # successful swap always creates EVERY final, so any missing
            # final means the swap never completed and the asides are
            # authoritative.
            mid_swap_crash = any(
                not _exists(f"{table_prefix}.{t}") for t in ("nodes", "edges")
            ) and any(
                _exists(f"{table_prefix}.{t}_old") for t in ("nodes", "edges")
            )
            for t in ("nodes", "edges"):
                old = f"{table_prefix}.{t}_old"
                if not _exists(old):
                    continue
                if mid_swap_crash:
                    spark.sql(f"DROP TABLE IF EXISTS {table_prefix}.{t}")
                    spark.sql(
                        f"ALTER TABLE {old} RENAME TO {prefix_nocat}.{t}"
                    )
                    _msck(f"{table_prefix}.{t}")
                else:
                    # SYNC the old's partition metadata to its own
                    # directory BEFORE dropping, or the drop deletes
                    # the stale locations — which sit under the live
                    # final table (see _msck)
                    _msck(old)
                    spark.sql(f"DROP TABLE IF EXISTS {old}")
            # drop-then-create instead of createOrReplace: staging names
            # are ephemeral (no history to preserve) and plain CTAS is
            # supported by BOTH Iceberg and the V2 session catalog
            # (which rejects REPLACE TABLE AS SELECT)
            for t in stg.values():
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            nodes.writeTo(stg["nodes"]).create()
            (
                edges.writeTo(stg["edges"])
                .partitionedBy(F.col("pred"))
                .create()
            )
            # swap by rename-ASIDE, never drop-then-rename: if a rename
            # fails mid-swap, the previous snapshot still exists under
            # *_old and is restored below — a DROP here would make the
            # staged copy the only one, and the error path used to
            # delete that too. ALL asides happen before ANY stg→final
            # rename (two loops, not one): with the interleaved
            # per-table order, a hard-kill after nodes fully swapped
            # but before the edges aside left {nodes=fresh, nodes_old,
            # edges=old-final, no edges_old} — a state
            # INDISTINGUISHABLE from a post-swap-cleanup crash, so
            # recovery misclassified nodes_old as garbage and settled
            # on fresh-nodes/stale-edges. Asides-first makes every
            # kill window unambiguous: some final missing with an
            # *_old present ⇔ the *_old set is the last complete
            # snapshot; all finals present ⇔ they are all fresh.
            for t in ("nodes", "edges"):
                pre_existing[t] = _exists(f"{table_prefix}.{t}")
                if pre_existing[t]:
                    spark.sql(
                        f"ALTER TABLE {table_prefix}.{t} "
                        f"RENAME TO {prefix_nocat}.{t}_old"
                    )
                    # repoint the aside's partition metadata at its new
                    # directory IMMEDIATELY: every later path that
                    # drops it (success cleanup, next-run garbage
                    # collection) would otherwise delete the final
                    # table's fresh data through the stale locations
                    _msck(f"{table_prefix}.{t}_old")
            for t in ("nodes", "edges"):
                spark.sql(
                    f"ALTER TABLE {stg[t]} RENAME TO {prefix_nocat}.{t}"
                )
                swapped.append(t)
                _msck(f"{table_prefix}.{t}")
        except Exception:  # noqa: E722 — rollback below, fallback after
            # roll back to the EXACT pre-call state: every table this
            # run swapped in is removed, every table it renamed aside is
            # restored, and a table that had no previous snapshot ends
            # up absent again — never fresh nodes next to stale edges,
            # never a half-created first snapshot. Then drop this
            # invocation's staging leftovers.
            for t in ("nodes", "edges"):
                try:
                    if t in swapped:
                        spark.sql(
                            f"DROP TABLE IF EXISTS {table_prefix}.{t}"
                        )
                    if pre_existing.get(t) and _exists(
                        f"{table_prefix}.{t}_old"
                    ):
                        spark.sql(
                            f"ALTER TABLE {table_prefix}.{t}_old "
                            f"RENAME TO {prefix_nocat}.{t}"
                        )
                        _msck(f"{table_prefix}.{t}")
                except Exception:
                    pass
            for t in stg.values():
                try:
                    spark.sql(f"DROP TABLE IF EXISTS {t}")
                except Exception:
                    pass
            if out_dir is None:
                raise
            import warnings

            warnings.warn(
                f"catalog write to {table_prefix} failed; staging tables "
                "dropped, last good snapshot preserved, falling back to "
                "parquet",
                RuntimeWarning,
                stacklevel=2,
            )
        else:
            # success: the *_old cleanup is best-effort and OUTSIDE the
            # swap try — a transient DROP failure here must not trigger
            # a rollback of an already-complete swap (that destroyed
            # the fresh data and mixed snapshot versions); a leftover
            # *_old is recognized as post-swap garbage on the next run
            for t in ("nodes", "edges"):
                try:
                    # idempotent re-SYNC before the drop: belt and
                    # braces against a transiently-failed aside-time
                    # msck (a drop through stale partition locations
                    # deletes the live final's data)
                    _msck(f"{table_prefix}.{t}_old")
                    spark.sql(
                        f"DROP TABLE IF EXISTS {table_prefix}.{t}_old"
                    )
                except Exception:
                    pass
            return {
                "nodes": f"{table_prefix}.nodes",
                "edges": f"{table_prefix}.edges",
            }
    assert out_dir is not None, "need out_dir without a table catalog"
    write_stage(nodes, out_dir, "nodes")
    write_stage(edges, out_dir, "edges", partition_by=["pred"])
    targets["nodes"] = _stage_dir(out_dir, "nodes")
    targets["edges"] = _stage_dir(out_dir, "edges")
    return targets


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    """Union of all stages' per-partition lineage rows."""
    import glob

    dirs = glob.glob(os.path.join(out_dir, "stage=*", "lineage"))
    if not dirs:
        # fresh/empty out_dir: empty lineage, not an IndexError
        return spark.createDataFrame(
            [], "partition_id int, stage string, output_rows bigint"
        )
    dfs = [spark.read.parquet(d) for d in dirs]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.union(d)
    return out
