package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Increment-scaling measurement for the index APPEND paths (r14
  * VERDICT task 6): the s20/s21 100× points scaled the BASE corpus and
  * left the append increments small, so the claim "append is linear in
  * |increment| and never re-touches the base codes" had no empirical
  * point. Three experiments per path over the sf embeddings relation:
  *
  *   A  base 1×, increment 1×      — the reference wall
  *   B  base 1×, increment `f`×    — slope vs A proves |increment|
  *                                   scaling (linear at worst;
  *                                   sublinear while parallel headroom
  *                                   absorbs the factor)
  *   C  base `f`×, increment 1×    — wall vs A proves the append never
  *                                   rescans the base (only parquet
  *                                   FOOTER metadata grows: the
  *                                   n_total report count)
  *
  * appendIvfPqIndex increments are key-shifted clones (encode is a
  * per-row projection — content-blind). embedAdmitAppend increments
  * are dimension-ROTATED per copy (a cloned increment would collapse at
  * the operator's content-address step and measure dedup, not append;
  * rotations give genuinely distinct directions). Copies of the same
  * rotation class are identical vectors — they exercise the clone-
  * collapse path at scale, which is the honest production mix.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.AppendScale [f]
  * (default f = 100). Prints one markdown table; temp dirs reclaimed.
  */
object AppendScale {

  private def deleteRec(p: String): Unit = {
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
    val all = try walk.iterator().asScala.toSeq.reverse finally walk.close()
    all.foreach(java.nio.file.Files.deleteIfExists(_))
  }

  def main(args: Array[String]): Unit = {
    val f = if (args.nonEmpty) args(0).toInt else 100
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint()
    val n = base.count()

    // key-shifted clones (for the PQ encode path, which is content-blind)
    def cloned(copies: Int, keyBase: Long): DataFrame =
      (0 until copies).map { c =>
        base.select((col("vec_id") + keyBase + c * 10000000L).as("vec_id"),
          col("embedding"))
      }.reduce(_.unionByName(_)).localCheckpoint()

    // dimension-rotated copies (for the admit path: distinct directions)
    def rotated(copies: Int, keyBase: Long): DataFrame =
      (0 until copies).map { c =>
        val r = c % 64
        val emb =
          if (r == 0) col("embedding")
          else expr(s"concat(slice(embedding, ${r + 1}, ${64 - r}), slice(embedding, 1, $r))")
        base.select((col("vec_id") + keyBase + c * 10000000L).as("vec_id"),
          emb.as("embedding"))
      }.reduce(_.unionByName(_)).localCheckpoint()

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // ---- appendIvfPqIndex (the s20 maintenance path) ----
    def pqLeg(baseRel: DataFrame, inc: DataFrame): Double = {
      val path = java.nio.file.Files.createTempDirectory("graft-appscale-pq-").toString
      try {
        Similarity.writeIvfPqIndex(baseRel, path, cells = 16, m = 16, kps = 64)
        timed { Similarity.appendIvfPqIndex(inc, path).collect() }
      } finally deleteRec(path)
    }
    val pqA = pqLeg(base, cloned(1, 100000000L))
    val pqB = pqLeg(base, cloned(f, 100000000L))
    val bigBase = cloned(f, 0L)
    val pqC = pqLeg(bigBase, cloned(1, 2000000000L))

    // ---- embedAdmitAppend (the s21 ingest-loop path) ----
    // cells sized to the LARGE increment (the √n discipline): a fixed
    // tiny k would make the in-cell pair stage quadratic in |increment|
    // per cell — that is quantizer sizing, not append cost
    val k = math.max(8, math.sqrt((n * f).toDouble).toInt.min(1024))
    def admitLeg(inc: DataFrame): Double = {
      val path = java.nio.file.Files.createTempDirectory("graft-appscale-adm-").toString
      try {
        Similarity.writeEmbedIndex(base, path, k = k)
        timed { Similarity.embedAdmitAppend(inc, path, tau = 0.9).count() }
      } finally deleteRec(path)
    }
    val admA = admitLeg(rotated(1, 100000000L))
    val admB = admitLeg(rotated(f, 100000000L))

    println(s"| path | A: base 1x, inc 1x | B: base 1x, inc ${f}x | C: base ${f}x, inc 1x | inc slope (B/A vs ${f}x) | base slope (C/A vs 1x) |")
    println("|---|---|---|---|---|---|")
    println(f"| appendIvfPqIndex | $pqA%.2f s | $pqB%.2f s | $pqC%.2f s | ${pqB / pqA}%.2fx | ${pqC / pqA}%.2fx |")
    println(f"| embedAdmitAppend (k=$k) | $admA%.2f s | $admB%.2f s | — | ${admB / admA}%.2fx | — |")
    spark.stop()
  }
}
