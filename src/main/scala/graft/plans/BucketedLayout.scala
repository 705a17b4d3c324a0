package graft.plans

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed physical layout for co-located joins.
  *
  * At 100 TB the dominant cost of the lineitem⋈orders join is the shuffle
  * of both fact tables. Persisting them bucketed AND sorted on the join
  * key makes every future join on that key shuffle-free AND sort-free:
  * Spark plans a SortMergeJoin that reads matching buckets pairwise with
  * no Exchange and no Sort (output already sorted per bucket file). The
  * one-time bucketing shuffle is amortized over every downstream join —
  * the same trade the reference's primary-index layout makes for point
  * scans (reference: src/sql/plan/table.rs:160-266), applied to Spark's
  * scan-oriented world.
  */
object BucketedLayout {

  /** One-time layout build: writes bucketed+sorted copies of the two fact
    * tables into `database` (bucket count sized so a bucket of the target
    * corpus fits an executor's memory — 8 here for the test scale). */
  def build(spark: SparkSession, dir: String, database: String, buckets: Int = 8): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $database")
    Tables.load(spark, dir, "lineitem").write.mode("overwrite")
      .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable(s"$database.lineitem_bkt")
    Tables.load(spark, dir, "orders").write.mode("overwrite")
      .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(s"$database.orders_bkt")
  }

  /** Revenue per order priority over the bucketed layout — joins the two
    * fact tables WITHOUT any shuffle of either side. The MERGE hint pins
    * the at-scale strategy: with two 100 TB fact tables neither side is
    * broadcastable, and the bucketed sort-merge join is the plan a real
    * cluster must get. */
  def revenueByPriority(spark: SparkSession, database: String): DataFrame =
    spark.table(s"$database.lineitem_bkt").hint("merge")
      .join(spark.table(s"$database.orders_bkt"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .orderBy(col("priority"))

  /** True when the executed plan shuffles the JOIN inputs (the aggregation
    * after the join still exchanges its small grouped output — that one is
    * unavoidable and cheap). */
  def joinInputsShuffled(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    // SparkPlan.collect stops at AQE query-stage boundaries; walk through
    // them explicitly
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val next = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: next.flatMap(allNodes)
    }
    allNodes(df.queryExecution.executedPlan)
      .collectFirst { case j: BaseJoinExec => j } match {
      case Some(join) =>
        allNodes(join).drop(1).exists(_.isInstanceOf[ShuffleExchangeLike])
      case None => true // no join found — treat as failure
    }
  }
}
