package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver-generated parquet tables (TESTDATA.md) and registers
  * them as temp views for SQL-path queries.
  *
  * Scale notes: each table is a plain parquet path read via the DataSource
  * V2 parquet reader, so Catalyst column pruning + predicate pushdown reach
  * the scan, and file splitting gives multi-partition parallelism for free
  * (on a real cluster each 128MB split is a task; locally each row-group).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Plans are immutable; cache them per (session, dir, table) so repeated
  // queries don't re-list files / re-read parquet footers.
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    SessionCache.getOrBuild(spark, ("table-plan", dir, name))(load0(spark, dir, name))

  private def load0(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark rejects by default;
    // read it as long nanos and convert to micros TIMESTAMP_NTZ — the same
    // truncation DuckDB applies, so oracle comparisons agree.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    raw.schema.fields.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr(
          "cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case None => raw
    }
  }

  /** Registers every table as a temp view named after the table. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
