package graft.plans

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The z-order layout made PHYSICAL — the consumer `Packing.zorderFiles`
  * computes a layout for: the assigned rows are written `partitionBy
  * (file_id)` (each z-run is one directory, the "file" of the design) and
  * the per-file (min, max) BOTH-DIM envelopes land alongside as the
  * SKIPPING INDEX. A range predicate on EITHER dimension consults the
  * index first; only intersecting files' directories are opened —
  * unqualified bytes are never read, which is the whole point of
  * multi-dim clustering (a single-dim sort gives this only for its
  * leading column).
  *
  * Pruning is DYNAMIC (the IvfCellLayout discipline): the qualifying
  * file list is a runtime relation (index rows whose envelope intersects
  * the literal range), broadcast into a semi-join on the partition
  * column, which Spark's dynamic partition pruning turns into a
  * directory filter on the scan. The index relation is
  * corpus_rows/rowsPerFile rows — metadata-sized, never collected to the
  * driver, so the plan shape survives a 10⁸-file corpus. */
object ZorderLayout {

  private def dataPath(path: String) = s"$path/data"
  private def statsPath(path: String) = s"$path/stats"

  /** One-time layout build over the orders table: Morton-rank on
    * (custkey, order day), cut into `rowsPerFile` z-runs, write the rows
    * by file and the envelope index alongside. */
  def build(spark: SparkSession, dir: String, path: String,
      rowsPerFile: Long = 1024L): Unit = {
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long").as("o_day"))
    val assigned = graft.operators.Packing
      .zorderFiles(orders, "o_orderkey", "o_custkey", "o_day", rowsPerFile)
      .localCheckpoint() // one rank pass feeds both the rows and the index
    assigned.write.mode("overwrite").partitionBy("file_id").parquet(dataPath(path))
    graft.operators.Packing.zorderFileStats(assigned)
      .write.mode("overwrite").parquet(statsPath(path))
  }

  /** Both-dim range read THROUGH the skipping index: envelope-intersect
    * the index, semi-join the broadcast survivors on the partition
    * column (→ dynamic partition pruning on the data scan), exact filter
    * on the surviving rows. */
  def readRange(spark: SparkSession, path: String,
      aLo: Long, aHi: Long, bLo: Long, bHi: Long): DataFrame = {
    val data = spark.read.parquet(dataPath(path))
    val hit = spark.read.parquet(statsPath(path))
      .filter(col("max_a") >= aLo && col("min_a") <= aHi &&
        col("max_b") >= bLo && col("min_b") <= bHi)
      .select(col("file_id"))
    data.join(broadcast(hit), Seq("file_id"), "left_semi")
      .filter(col("a").between(aLo, aHi) && col("b").between(bLo, bHi))
      .select(col("id"), col("a"), col("b"))
  }

  /** Files the index qualifies for a range — the skip arithmetic alone,
    * for asserting the index actually cuts the file set. */
  def qualifyingFiles(spark: SparkSession, path: String,
      aLo: Long, aHi: Long, bLo: Long, bHi: Long): (Long, Long) = {
    val stats = spark.read.parquet(statsPath(path))
    val hit = stats.filter(col("max_a") >= aLo && col("min_a") <= aHi &&
      col("max_b") >= bLo && col("min_b") <= bHi)
    (hit.count(), stats.count())
  }
}
