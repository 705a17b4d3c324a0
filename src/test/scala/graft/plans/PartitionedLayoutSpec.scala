package graft.plans

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PartitionedLayoutSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("partition-column filter prunes directories and matches the unpartitioned result") {
    val path = java.nio.file.Files.createTempDirectory("graft-part-").toString + "/events_part"
    PartitionedLayout.build(spark, dir, path)
    // layout check: one directory per event_type
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.count(_.startsWith("event_type=")) == 5, dirs.mkString(","))

    val pruned = PartitionedLayout.purchasesPerUser(spark, path)
    val rows = pruned.collect()
    assert(PartitionedLayout.partitionPruned(pruned),
      "expected PartitionFilters on the scan:\n" + pruned.queryExecution.executedPlan)

    val expected = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .orderBy(col("user_id"))
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      expected.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)
  }
}
