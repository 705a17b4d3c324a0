package graft.plans

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed layout must answer the join without shuffling either fact
  * table, and produce the same result as the plain (shuffled) join. */
class BucketedLayoutSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bucketed join is shuffle-free for the join inputs and matches the plain join") {
    val wh = java.nio.file.Files.createTempDirectory("graft-bkt-").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '$wh'")
    BucketedLayout.build(spark, dir, "bktdb")

    val bucketed = BucketedLayout.revenueByPriority(spark, "bktdb")
    val rows = bucketed.collect() // materialize so AQE finalizes the plan
    assert(rows.nonEmpty)
    assert(!BucketedLayout.joinInputsShuffled(bucketed),
      "bucketed join still shuffles its inputs:\n" + bucketed.queryExecution.executedPlan)

    val plain = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .orderBy(col("priority"))
    assert(rows.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      plain.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq)
  }
}
