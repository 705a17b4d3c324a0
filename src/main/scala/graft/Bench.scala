package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Each query executes its FULL plan through the noop sink (count() would
  * let Catalyst prune projections and skip work a consumer would pay for).
  * A warmup query first absorbs session/JIT/codegen startup so per-query
  * numbers measure the plan, not the JVM.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // min over iterations: single-run numbers on a shared box carry
    // 40%+ interference noise; the min is the plan's actual cost
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    def run(name: String): Double = {
      val times = (1 to iters).map(_ => runOnce(name))
      if (times.contains(-1.0)) -1.0 else times.min
    }

    // warmup: touch every table + exercise codegen/shuffle machinery once
    try {
      Tables.registerAll(spark, sfDir)
      spark.sql("SELECT count(*) FROM lineitem").collect()
      SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    } catch { case _: Throwable => }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map(n => n -> run(n))
    // The harness keeps only the tail of this process's output, so the JSON
    // line must stay well under 2000 chars: short keys (the unique prefix
    // before the first '_': q01, d02, s04, ...) and 3-decimal seconds.
    def fmt(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    val qs = results
      .map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
