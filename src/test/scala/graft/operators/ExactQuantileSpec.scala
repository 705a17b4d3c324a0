package graft.operators

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ExactQuantile must reproduce Spark's exact `percentile` aggregate —
  * same interpolation, same null handling — while never holding more
  * than one range partition per task. */
class ExactQuantileSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "7") // odd: exercises empty/uneven range partitions
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def viaAggregate(df: org.apache.spark.sql.DataFrame, c: String, qs: Seq[Double]): Seq[Double] = {
    val arr = qs.map(q => s"${q}D").mkString("array(", ", ", ")")
    df.agg(expr(s"percentile($c, $arr)")).head().getSeq[Double](0)
  }

  test("deep recursion and multi-state refinement match the aggregate") {
    // tiny buckets + tiny collect limit force the refinement machinery
    // through several levels, with p10/p50/p99 refining SIMULTANEOUS
    // disjoint ranges (the multi-state-per-group case), on a skewed
    // distribution with heavy duplicates
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val vals = (0 until 4000).map { i =>
      if (i % 5 == 0) 42.0 // heavy repeated value
      else math.pow(rnd.nextDouble(), 6) * 1e9 // strong skew
    }
    val df = vals.zipWithIndex.map { case (v, i) => (i % 4, v) }.toDF("g", "v")
    val qs = Seq(0.1, 0.5, 0.99)
    val got = ExactQuantile.quantiles(df, "v", qs, buckets = 4, collectLimit = 16)
    val want = viaAggregate(df, "v", qs)
    got.zip(want).zip(qs).foreach { case ((g, w), q) =>
      assert(g == w || math.abs(g - w) <= math.abs(w) * 1e-12, s"deep q=$q: got $g, want $w")
    }
    val gotG = ExactQuantile
      .groupedQuantiles(df, "g", "v", qs, buckets = 4, collectLimit = 16)
      .toMap
    (0 until 4).foreach { g =>
      val sub = df.filter(col("g") === g)
      val wantG = viaAggregate(sub, "v", qs)
      gotG(g.toString).zip(wantG).zip(qs).foreach { case ((a, w), q) =>
        assert(a == w || math.abs(a - w) <= math.abs(w) * 1e-12,
          s"deep grouped g=$g q=$q: got $a, want $w")
      }
    }
  }

  private def check(df: org.apache.spark.sql.DataFrame, c: String, qs: Seq[Double]): Unit = {
    val got = ExactQuantile.quantiles(df, c, qs)
    val want = viaAggregate(df, c, qs)
    got.zip(want).zip(qs).foreach { case ((g, w), q) =>
      assert(g == w || math.abs(g - w) <= math.abs(w) * 1e-12, s"q=$q: got $g, want $w")
    }
  }

  test("matches the percentile aggregate on lineitem prices (odd partition count)") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    check(li, "l_extendedprice", Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0))
  }

  test("matches on seeded duplicate-heavy and skewed data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // heavy ties (values 0..9) plus a long tail, shuffled partition layout
    val vals = Seq.fill(5000)(rnd.nextInt(10).toDouble) ++
      Seq.fill(500)(rnd.nextDouble() * 1e9)
    val df = rnd.shuffle(vals).toDF("v").repartition(13)
    check(df, "v", Seq(0.1, 0.5, 0.75, 0.999))
  }

  test("tiny inputs: 1, 2, and 3 rows hit every interpolation branch") {
    import spark.implicits._
    check(Seq(7.0).toDF("v"), "v", Seq(0.0, 0.5, 1.0))
    check(Seq(1.0, 2.0).toDF("v"), "v", Seq(0.0, 0.25, 0.5, 1.0))
    check(Seq(3.0, 1.0, 2.0).toDF("v"), "v", Seq(0.5))
  }

  test("ignores nulls like the aggregate; empty input yields NaN") {
    import spark.implicits._
    val df = Seq[Option[Double]](Some(1.0), None, Some(3.0), None).toDF("v")
    check(df, "v", Seq(0.5))
    val empty = Seq.empty[Double].toDF("v")
    assert(ExactQuantile.quantiles(empty, "v", Seq(0.5)).head.isNaN)
  }

  test("grouped variant matches the per-group percentile aggregate, incl. cross-partition key runs") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .join(Tables.load(spark, "/root/testdata/sf0.001", "customer"),
        col("o_custkey") === col("c_custkey"))
    val got = ExactQuantile
      .groupedQuantiles(orders, "c_mktsegment", "o_totalprice", Seq(0.5, 0.9))
      .toMap
    val want = orders.groupBy("c_mktsegment")
      .agg(expr("percentile(o_totalprice, array(0.5D, 0.9D))").as("ps"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1))
      .toMap
    assert(got.keySet == want.keySet && want.size == 5)
    for (k <- want.keys; i <- 0 to 1)
      assert(math.abs(got(k)(i) - want(k)(i)) <= math.abs(want(k)(i)) * 1e-12,
        s"$k q$i: got ${got(k)(i)}, want ${want(k)(i)}")
  }

  test("grouped variant handles null keys and single-row groups") {
    import spark.implicits._
    val df = Seq(
      (Some("a"), 1.0), (Some("a"), 2.0), (Some("a"), 4.0),
      (Some("b"), 10.0),
      (None, 5.0), (None, 7.0))
      .toDF("k", "v")
      .select(col("k"), col("v"))
    val got = ExactQuantile.groupedQuantiles(df, "k", "v", Seq(0.5)).toMap
    assert(got(null) == Seq(6.0))
    assert(got("a") == Seq(2.0))
    assert(got("b") == Seq(10.0))
  }

  test("selection pass leaves no pinned blocks behind (ContextCleaner-reclaimable)") {
    import spark.implicits._
    val df = (1 to 1000).map(_.toDouble).toDF("v")
    val r = ExactQuantile.quantiles(df, "v", Seq(0.5))
    assert(r.head == 500.5)
    // the checkpoint RDD is only session-reachable until GC; nothing in
    // ExactQuantile retains it — a second call must not accumulate state
    val before = spark.sparkContext.getPersistentRDDs.size
    ExactQuantile.quantiles(df, "v", Seq(0.5))
    System.gc()
    Thread.sleep(200)
    assert(spark.sparkContext.getPersistentRDDs.size <= before + 1)
  }
}
