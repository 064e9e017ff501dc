"""Sinks: Iceberg MERGE INTO with a parquet-upsert fallback.

Production target (north_rule): ``MERGE INTO`` an Iceberg triples table.
The sandbox has no Iceberg runtime jar, so :func:`merge_into` detects the
catalog and otherwise performs the same upsert semantics against a parquet
directory (full-outer combine + atomic directory swap). The SQL we'd run on
a real cluster is generated either way so the semantics stay reviewable.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark.sql("SELECT 1").collect()
        jvm_class = "org.apache.iceberg.spark.SparkCatalog"
        spark._jvm.java.lang.Class.forName(jvm_class)  # noqa: SLF001
        return True
    except Exception:
        return False


def merge_sql(target_table: str, source_view: str) -> str:
    """The production MERGE for the triples table (north_rule Stage D)."""
    return f"""
        MERGE INTO {target_table} t
        USING {source_view} s
        ON t.subj = s.subj AND t.pred = s.pred AND t.obj = s.obj
        WHEN MATCHED THEN UPDATE SET
            t.weight = t.weight + s.weight,
            t.subj_rank = LEAST(t.subj_rank, s.subj_rank),
            t.obj_rank = LEAST(t.obj_rank, s.obj_rank)
        WHEN NOT MATCHED THEN INSERT *
    """


def merge_into_iceberg(spark: SparkSession, target_table: str, updates: DataFrame) -> None:
    updates.createOrReplaceTempView("_triples_updates")
    spark.sql(merge_sql(target_table, "_triples_updates"))


def committed_tokens(target_path: str) -> set[str]:
    """Commit tokens already merged into ``target_path`` (see
    :func:`merge_into_parquet`'s ``commit_token``)."""
    if not os.path.isdir(target_path):
        return set()
    prefix = "_commit_"
    return {f[len(prefix):] for f in os.listdir(target_path) if f.startswith(prefix)}


def merge_into_parquet(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    commit_token: str | None = None,
) -> bool:
    """Same upsert semantics as :func:`merge_sql` against a parquet dir.
    Write-to-temp + atomic rename keeps the target readable during the merge
    and makes a failed merge replayable (lineage/idempotence contract).

    ``commit_token`` makes the merge IDEMPOTENT for at-least-once callers
    (foreachBatch retries a batch after a driver failure): a ``_commit_<tok>``
    marker rides inside the directory that is atomically renamed into place,
    so the token is durable iff that merge's result is, with no window where
    one exists without the other. A re-invocation with an already-committed
    token is a no-op. Returns True if the merge ran, False if skipped.
    (Parquet readers ignore ``_``-prefixed files.)"""
    if commit_token is not None and str(commit_token) in committed_tokens(target_path):
        return False
    if os.path.exists(target_path):
        current = spark.read.parquet(target_path)
        merged = (
            current.unionByName(updates)
            .groupBy("subj", "pred", "obj")
            .agg(
                F.sum("weight").alias("weight"),
                F.min("subj_rank").alias("subj_rank"),
                F.min("obj_rank").alias("obj_rank"),
            )
        )
    else:
        merged = updates
    tmp = f"{target_path}.tmp-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    # carry forward prior commit markers, then add this merge's token —
    # markers become durable atomically with the rename below
    for tok in committed_tokens(target_path):
        open(os.path.join(tmp, f"_commit_{tok}"), "w").close()
    if commit_token is not None:
        open(os.path.join(tmp, f"_commit_{commit_token}"), "w").close()
    old = f"{target_path}.old-{uuid.uuid4().hex[:8]}"
    if os.path.exists(target_path):
        os.rename(target_path, old)
    os.rename(tmp, target_path)
    if os.path.exists(old):
        shutil.rmtree(old)
    return True


def merge_into(
    spark: SparkSession, target: str, updates: DataFrame, prefer_iceberg: bool = True
) -> str:
    """Dispatch: Iceberg table name when the runtime is present, else parquet
    path. Returns which path was taken ('iceberg' | 'parquet')."""
    if prefer_iceberg and not target.startswith("/") and iceberg_available(spark):
        merge_into_iceberg(spark, target, updates)
        return "iceberg"
    merge_into_parquet(spark, target, updates)
    return "parquet"


def write_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) on its join key so
    later equi-joins between tables bucketed the same way are CO-LOCATED —
    no Exchange on either side (verified by plan assertion in
    tests/test_bucketing.py). This is the steady-state layout for the hot
    join keys at corpus scale: mentions and triples bucketed by entity so
    repeated enrichment/rollup joins never reshuffle the big table.

    Spark bucketing requires a managed/external table (saveAsTable), not a
    bare parquet path — bucket metadata lives in the catalog."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def bucketed_join_plan_has_no_exchange(spark: SparkSession, left: str, right: str, on: list[str]) -> bool:
    """True iff joining the two bucketed tables on their bucket key produces
    a shuffle-free plan (the co-location check, usable as a runtime guard)."""
    joined = spark.table(left).join(spark.table(right), on)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
