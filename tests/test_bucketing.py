"""Bucketed co-located joins: mentions/triples bucketed on the entity key
must join without an Exchange on either side — the steady-state layout for
hot join keys at corpus scale."""

from pyspark.sql import functions as F

from gazetteer_entity_parser_spark.sources.sinks import (
    bucketed_join_plan_has_no_exchange,
    write_bucketed,
)


def test_bucketed_join_is_colocated(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        mentions = spark.range(0, 2000).select(
            F.col("id").alias("entity_id"),
            (F.col("id") % 97).alias("doc"),
        )
        weights = spark.range(0, 2000).select(
            F.col("id").alias("entity_id"),
            (F.col("id") * 3).alias("weight"),
        )
        write_bucketed(spark, mentions, "b_mentions", ["entity_id"], n_buckets=8)
        write_bucketed(spark, weights, "b_weights", ["entity_id"], n_buckets=8)

        assert bucketed_join_plan_has_no_exchange(
            spark, "b_mentions", "b_weights", ["entity_id"]
        )
        joined = spark.table("b_mentions").join(spark.table("b_weights"), "entity_id")
        assert joined.count() == 2000
        row = joined.where(F.col("entity_id") == 7).collect()[0]
        assert row["weight"] == 21

        # control: the same join on NON-bucketed inputs does shuffle
        plain = mentions.join(weights, "entity_id")
        plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_mentions")
        spark.sql("DROP TABLE IF EXISTS b_weights")
