package graft.plans

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZorderLayoutSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("z-order skipping index prunes file partitions and matches the unpartitioned result") {
    val path = java.nio.file.Files.createTempDirectory("graft-zorder-").toString + "/orders_z"
    ZorderLayout.build(spark, dir, path, rowsPerFile = 128L)

    // layout check: one directory per z-run
    val dirs = new java.io.File(s"$path/data").listFiles()
      .filter(_.isDirectory).map(_.getName).count(_.startsWith("file_id="))
    assert(dirs >= 8, s"expected many z-run directories, got $dirs")

    // a BOTH-dim range touching a corner of the z-space: the envelope
    // index must qualify a strict subset of files (the skip is real)
    val (hit, total) = ZorderLayout.qualifyingFiles(spark, path, 0L, 20L, 9000L, 9400L)
    assert(hit < total, s"index must cut the file set, got $hit of $total")

    val pruned = ZorderLayout.readRange(spark, path, 0L, 20L, 9000L, 9400L)
    val rows = pruned.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted

    // PLAN LOCK: the data scan carries a dynamic-pruning partition filter
    // on file_id — the semi-join became a directory skip, not a full read
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") && plan.contains("file_id"),
      "expected dynamic partition pruning on file_id:\n" + plan)

    // correctness: identical to the same predicate over the raw table
    val expected = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").as("id"), col("o_custkey").as("a"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long").as("b"))
      .filter(col("a").between(0L, 20L) && col("b").between(9000L, 9400L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(rows.toSeq == expected.toSeq && rows.nonEmpty)
  }
}
