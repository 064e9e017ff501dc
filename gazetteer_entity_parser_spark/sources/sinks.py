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
    _recover_symlink(target_path)
    if not os.path.isdir(target_path):
        return set()
    prefix = "_commit_"
    return {f[len(prefix):] for f in os.listdir(target_path) if f.startswith(prefix)}


# ---- symlink-versioned store layout -----------------------------------------
#
#   <target>                 -> symlink to the CURRENT version dir (atomic swap)
#   <target>.v-000007-<uuid> -> version dir: bucket=K/ parquet partitions,
#                               _commit_<tok> markers, _nbuckets_<N> marker
#
# The store is hash-partitioned by pmod(xxhash64(subj), N) so a merge rewrites
# ONLY the partitions its updates touch; untouched partitions are HARD-LINKED
# from the previous version (no data copy, byte-identical files). Publishing
# is a single os.rename of a symlink — one atomic step, no window where the
# target is absent (ADVICE r2: the old two-rename swap could strand the store
# mid-crash). On a real cluster Iceberg MERGE INTO supersedes all of this.

_VERSION_RE = ".v-"


def _version_dirs(target_path: str, complete_only: bool = False) -> list[str]:
    """Existing version dirs for this store, oldest-to-newest (the version
    counter in the name is zero-padded, so lexicographic sort = creation
    order). ``complete_only`` keeps only versions carrying the
    ``_nbuckets_`` marker — the LAST file written before a version is
    eligible for publishing, so its presence certifies a complete version
    (parquet data, hard-links, and commit tokens all precede it)."""
    parent = os.path.dirname(os.path.abspath(target_path)) or "."
    base = os.path.basename(target_path) + _VERSION_RE
    if not os.path.isdir(parent):
        return []
    out = sorted(
        os.path.join(parent, d) for d in os.listdir(parent) if d.startswith(base)
    )
    if complete_only:
        out = [v for v in out if os.path.isdir(v) and _store_n_buckets(v) is not None]
    return out


def _recover_symlink(target_path: str) -> None:
    """Crash recovery: if the target symlink is missing or broken but
    COMPLETE version dirs exist, repoint it at the newest complete one.
    Covers a crash between version-dir creation and the symlink swap
    (nothing is lost: the old version stays current). A torn half-written
    version (crash mid-write, before its ``_nbuckets_`` completeness marker)
    is never promoted — on a first-ever merge that crashed mid-write the
    store correctly stays absent and the retry re-merges from scratch."""
    exists = os.path.exists(target_path)  # follows symlinks; False if broken
    if exists:
        return
    if os.path.islink(target_path):  # broken link
        os.unlink(target_path)
    versions = _version_dirs(target_path, complete_only=True)
    if versions:
        _swap_symlink(target_path, versions[-1])


def _swap_symlink(target_path: str, version_dir: str) -> None:
    """Atomically (re)point ``target_path`` at ``version_dir`` — one
    os.rename of a fresh symlink; readers see the old or the new version,
    never an absent store."""
    tmp_link = f"{target_path}.lnk-{uuid.uuid4().hex[:8]}"
    os.symlink(os.path.basename(version_dir), tmp_link)
    os.rename(tmp_link, target_path)


def _next_version_path(target_path: str) -> str:
    versions = _version_dirs(target_path)
    if versions:
        last = os.path.basename(versions[-1]).rsplit("-", 2)[-2]
        n = int(last) + 1
    else:
        n = 0
    return f"{target_path}{_VERSION_RE}{n:06d}-{uuid.uuid4().hex[:8]}"


def _store_n_buckets(version_dir: str) -> int | None:
    for f in os.listdir(version_dir):
        if f.startswith("_nbuckets_"):
            return int(f[len("_nbuckets_"):])
    return None


def merge_into_parquet(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    commit_token: str | None = None,
    n_buckets: int = 32,
) -> bool:
    """Same upsert semantics as :func:`merge_sql` against a parquet store.

    Scale shape: the store is partitioned by ``bucket = pmod(xxhash64(subj),
    n_buckets)`` and a merge REWRITES ONLY TOUCHED PARTITIONS — the read side
    partition-prunes to the touched buckets, the write produces just those
    ``bucket=K`` dirs, and every untouched partition is hard-linked from the
    previous version (zero copy, byte-identical — pinned in
    tests/test_streaming.py). A micro-batch touching B of N buckets costs
    O(B/N of the table), not O(table). ``n_buckets`` is fixed at store
    creation (an ``_nbuckets_<N>`` marker wins over the parameter afterwards).

    Publishing is ONE atomic ``os.rename`` of a symlink onto the target
    (see the layout note above) — the target is never absent, a torn merge
    leaves the previous version current, and :func:`_recover_symlink` repoints
    a missing/broken link at the newest version on the next call.

    ``commit_token`` makes the merge IDEMPOTENT for at-least-once callers
    (foreachBatch retries a batch after a driver failure): ``_commit_<tok>``
    markers ride inside the version dir that the symlink swap publishes, so a
    token is durable iff that merge's result is. A re-invocation with an
    already-committed token is a no-op. Returns True if the merge ran, False
    if skipped. (Parquet readers ignore ``_``-prefixed files.)"""
    _recover_symlink(target_path)
    if commit_token is not None and str(commit_token) in committed_tokens(target_path):
        return False

    current_version = os.path.realpath(target_path) if os.path.exists(target_path) else None
    legacy_dir = current_version is not None and not os.path.islink(target_path)

    if current_version is not None:
        stored_n = _store_n_buckets(current_version)
        if stored_n is not None:
            n_buckets = stored_n  # marker wins: bucketing is fixed at creation
    # persist: the updates lineage (often a whole extraction pipeline in
    # foreachBatch) is referenced by BOTH the touched-buckets collect and the
    # merged write — without the boundary it would execute end-to-end twice
    upd = updates.withColumn(
        "bucket", F.pmod(F.xxhash64("subj"), F.lit(n_buckets)).cast("int")
    ).persist()
    touched = sorted(
        r["bucket"] for r in upd.select("bucket").distinct().collect()
    )  # bounded by n_buckets rows
    if not touched and current_version is None:
        # empty batch onto a non-existent store: publishing would create a
        # version dir with ZERO parquet files, which every later read fails
        # to infer a schema from — the store would be permanently poisoned
        # (and the commit token would mark the batch done). Nothing to merge
        # and nothing worth recording: a replay of an empty batch is a no-op.
        upd.unpersist()
        return True

    if current_version is not None and not legacy_dir:
        current = spark.read.parquet(current_version)
        merged = (
            # partition pruning: only the touched buckets' files are read
            # (an empty batch touches nothing: every partition hard-links)
            current.where(F.col("bucket").isin(touched) if touched else F.lit(False))
            .unionByName(upd)
            .groupBy("subj", "pred", "obj", "bucket")
            .agg(
                F.sum("weight").alias("weight"),
                F.min("subj_rank").alias("subj_rank"),
                F.min("obj_rank").alias("obj_rank"),
            )
        )
    elif legacy_dir:  # pre-versioning store: one full rewrite migrates it
        current = spark.read.parquet(current_version).withColumn(
            "bucket", F.pmod(F.xxhash64("subj"), F.lit(n_buckets)).cast("int")
        )
        merged = (
            current.unionByName(upd)
            .groupBy("subj", "pred", "obj", "bucket")
            .agg(
                F.sum("weight").alias("weight"),
                F.min("subj_rank").alias("subj_rank"),
                F.min("obj_rank").alias("obj_rank"),
            )
        )
        touched = list(range(n_buckets))
    else:
        merged = upd

    new_version = _next_version_path(target_path)
    merged.write.mode("overwrite").partitionBy("bucket").parquet(new_version)
    upd.unpersist()

    # hard-link untouched partitions from the current version (same inode ->
    # byte-identical, no data copy)
    if current_version is not None and not legacy_dir:
        touched_dirs = {f"bucket={b}" for b in touched}
        for entry in os.listdir(current_version):
            if entry.startswith("bucket=") and entry not in touched_dirs:
                src = os.path.join(current_version, entry)
                dst = os.path.join(new_version, entry)
                os.makedirs(dst, exist_ok=True)
                for f in os.listdir(src):
                    os.link(os.path.join(src, f), os.path.join(dst, f))

    # markers become durable atomically with the symlink swap below
    for tok in committed_tokens(target_path):
        open(os.path.join(new_version, f"_commit_{tok}"), "w").close()
    if commit_token is not None:
        open(os.path.join(new_version, f"_commit_{commit_token}"), "w").close()
    open(os.path.join(new_version, f"_nbuckets_{n_buckets}"), "w").close()

    if legacy_dir:
        # migrate: the legacy dir's rows are already folded into new_version;
        # move it aside so the symlink can take its path (recovery covers a
        # crash inside this one-time window)
        os.rename(target_path, f"{target_path}.old-{uuid.uuid4().hex[:8]}")
    _swap_symlink(target_path, new_version)

    # prune superseded versions and old-scheme leftovers — but RETAIN the
    # generation the symlink pointed at before this swap: a concurrent
    # reader that resolved the symlink just before the swap may still be
    # scanning those files. One retained generation gives readers a full
    # merge-cycle grace window (it is pruned by the NEXT merge); anything
    # older is unreachable by any reader newer than two merges ago.
    # Single-writer contract unchanged (concurrent MERGES still race).
    keep = {os.path.abspath(new_version)}
    if current_version is not None:
        keep.add(os.path.abspath(current_version))
    for v in _version_dirs(target_path):
        if os.path.abspath(v) not in keep:
            shutil.rmtree(v, ignore_errors=True)
    parent = os.path.dirname(os.path.abspath(target_path)) or "."
    base = os.path.basename(target_path)
    for d in os.listdir(parent):
        if d.startswith(f"{base}.old-") or d.startswith(f"{base}.tmp-"):
            shutil.rmtree(os.path.join(parent, d), ignore_errors=True)
    return True


def is_table_identifier(target: str) -> bool:
    """True iff ``target`` is a DOTTED SQL identifier (db.table /
    catalog.db.table) — the only shape eligible for the Iceberg MERGE route.
    Deliberately a pure shape test: routing must be deterministic, never a
    filesystem probe (the same target string flipping sinks depending on
    the driver's cwd contents would split a triples store in two). A bare
    single word ('triples') is ambiguous and treated as a parquet path —
    force the SQL route with an explicit ``table:`` prefix in
    :func:`merge_into`."""
    import re

    return re.fullmatch(r"[A-Za-z_][\w]*(\.[A-Za-z_][\w]*)+", target) is not None


def merge_into(
    spark: SparkSession,
    target: str,
    updates: DataFrame,
    prefer_iceberg: bool = True,
    commit_token: str | None = None,
    n_buckets: int = 32,
) -> str:
    """Dispatch: Iceberg table name when the runtime is present, else parquet
    path. Returns which path was taken ('iceberg' | 'parquet').

    ``commit_token`` is only implemented for the parquet fallback; Iceberg
    MERGE is transactional but NOT idempotent for the additive weight update
    (a replayed batch would double-count), so rather than silently dropping
    the token this dispatcher refuses it — an Iceberg caller needing
    at-least-once replay safety must carry a batch-id column and dedup in
    the MERGE source (or consult its own commit log) instead.

    Routing: an explicit ``table:`` / ``path:`` prefix forces the route
    (stripped before use); otherwise only a DOTTED SQL identifier
    (:func:`is_table_identifier`) is table-shaped — the decision is a pure
    function of the string, never of what happens to exist on the driver's
    filesystem, so the same target can't silently switch sinks between
    runs."""
    force_table = target.startswith("table:")
    force_path = target.startswith("path:")
    if force_table or force_path:
        target = target.split(":", 1)[1]
    route_iceberg = force_table or (not force_path and is_table_identifier(target))
    if prefer_iceberg and route_iceberg and iceberg_available(spark):
        if commit_token is not None:
            raise NotImplementedError(
                "commit_token idempotence is implemented for the parquet store "
                "only; for Iceberg, dedup replayed batches in the MERGE source "
                "(e.g. a batch_id column) — a silent drop would double-count "
                "additive weights on retry"
            )
        merge_into_iceberg(spark, target, updates)
        return "iceberg"
    merge_into_parquet(spark, target, updates, commit_token=commit_token, n_buckets=n_buckets)
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
