package graft.plans

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned physical layout: directory-level partition pruning.
  *
  * At 100 TB the cheapest byte is the one never read: partitioning the
  * events table by `event_type` turns a type-filtered query into a scan of
  * 1/5 of the directories (STATIC pruning — the filter never touches a
  * row), and a join against a filtered dimension prunes partitions at
  * RUNTIME from the dimension's build side (DYNAMIC partition pruning).
  * Complementary to bucketing: partitions prune IO by predicate, buckets
  * co-locate joins by key.
  */
object PartitionedLayout {

  /** One-time layout build: events re-written partitioned by event_type. */
  def build(spark: SparkSession, dir: String, path: String): Unit =
    Tables.load(spark, dir, "events")
      .write.mode("overwrite")
      .partitionBy("event_type")
      .parquet(path)

  /** Filter on the partition column — must scan only matching directories. */
  def purchasesPerUser(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .orderBy(col("user_id"))

  /** True when the scan carries a partition filter (pruning active). */
  def partitionPruned(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("PartitionFilters: [isnotnull(event_type") ||
      plan.contains("PartitionFilters: [") && plan.contains("event_type")
  }
}
