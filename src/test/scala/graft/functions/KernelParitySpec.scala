package graft.functions

import org.apache.spark.sql.{GraftColumnBridge => B, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r17 codegen kernels to the CodegenFallback SQL spellings
  * they replaced (guide §4: no higher-order functions in hot Generate
  * paths — the interpreted ExplodeBase.eval path measured 3-20x slower
  * with 45-100 s JIT stalls on the full board; OPTIMIZATION_r17.md
  * "t20 stall"). Each case evaluates BOTH spellings on adversarial
  * inputs (emoji = supplementary code points, combining marks,
  * shorter-than-k texts, tie-heavy hash runs) and requires equality —
  * so the kernels can never drift from what the DuckDB oracles replay. */
class KernelParitySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("code_points equals the transform(sequence, substring) spelling") {
    // every BPE call site filters word <> '' first, so parity is pinned
    // on non-empty words; the kernel's [] on "" is strictly saner than
    // the old spelling's sequence(1,0) descent and is asserted below
    val words = Seq(
      "hello", "a", "naïve", "emoji😀mid", "😀",
      "x" * 40, "ünïcode", "é́combining")
    val rows = words.toDF("word").select(
      B.column(CodePoints(B.expression(col("word")))).as("k"),
      expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))").as("s"),
      col("word")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"code_points mismatch on '${r.getString(2)}'")
    }
    val empty = Seq("").toDF("word")
      .select(B.column(CodePoints(B.expression(col("word")))).as("k")).head()
    assert(empty.getSeq[String](0).isEmpty, "code_points('') must be empty")
  }

  test("gram_hashes/window_mins equal the CASE/transform SQL spellings for both hash variants") {
    val texts = Seq(
      "one two three four five six seven",
      "a b", "single", "dup dup dup dup dup dup",
      "t1 t2 t3 t4", "x y z w v u t s r q p o n m")
    val df = texts.toDF("text")
      .select(split(lower(col("text")), "\\s+").as("tk"))
    for ((useSha, h) <- Seq(
        (true, (g: String) => s"CAST(conv(substring(sha2($g, 256), 1, 8), 16, 10) AS BIGINT)"),
        (false, (g: String) => s"xxhash64($g)"));
        k <- Seq(2, 4); w <- Seq(2, 4)) {
      val rows = df
        .withColumn("hs", expr(
          s"CASE WHEN size(tk) < $k THEN array(${h(s"concat_ws(char(31), tk)")}) " +
            s"ELSE transform(sequence(1, size(tk) - ${k - 1}), i -> " +
            s"${h(s"concat_ws(char(31), slice(tk, i, $k))")}) END"))
        .select(
          B.column(WindowMins(GramHashes(B.expression(col("tk")), k, useSha), w)).as("kk"),
          expr(
            s"CASE WHEN size(hs) <= $w THEN array(array_min(hs)) " +
              s"ELSE transform(sequence(1, size(hs) - ${w - 1}), j -> array_min(slice(hs, j, $w))) END")
            .as("ss"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"kernel/SQL winnow mismatch (useSha=$useSha k=$k w=$w): " +
            s"${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}")
      }
    }
  }
}
