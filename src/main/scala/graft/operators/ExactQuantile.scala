package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed EXACT interpolated quantiles (SQL `quantile_cont` /
  * Spark `percentile` semantics) by HISTOGRAM-REFINEMENT SELECTION.
  *
  * Spark's exact `percentile` aggregate buffers every value of a group in
  * one task; over an ungrouped 100 TB column that single buffer is the
  * whole column — a guaranteed executor OOM. The textbook distributed
  * alternative (range-shuffle + sort + per-partition selection) avoids
  * the buffer but still SHUFFLES the whole column and materializes a
  * sorted copy — at 100 TB that is hundreds of GB of exchange and
  * executor storage for a handful of scalars (and measured 12 s for one
  * median over 18M local rows, shuffle- and checkpoint-bound).
  *
  * Selection needs neither. Each requested quantile is two order
  * statistics; this resolves them by value-range refinement:
  *
  *   1. one aggregate pass: count / min / max (no data movement — only
  *      partial aggregates merge);
  *   2. histogram pass over the active value range, B buckets: each
  *      wanted ordinal lands in one bucket, whose exact row-count prefix
  *      is now known. The pass moves B counted rows per partition, never
  *      values;
  *   3. if the target bucket holds few rows, collect exactly that
  *      bucket's values (a pushed-down range filter on the scan) and
  *      read the order statistic off the sorted handful; otherwise
  *      recurse into the bucket (new min/max from the same histogram
  *      pass cost). Repeated-value buckets terminate at lo == hi.
  *
  * Real distributions resolve at depth 1 (18M rows / 8192 buckets ≈ 2k
  * rows per bucket); the adversarial bound is log_B(range/ulp) passes.
  * Every pass is a column-pruned parquet scan with the range predicate
  * pushed down — the column is SCANNED (2-3x), never shuffled, never
  * copied to executor storage; driver state is B counts per level plus
  * one small collected bucket. Scales by adding partitions to the scan.
  *
  * Interpolation matches Spark's `Percentile` bit-for-bit: the WEIGHTED
  * form (⌈p⌉ − p)·v_lo + (p − ⌊p⌋)·v_hi at p = q·(n−1) — not the
  * algebraically-equal delta form v_lo + (v_hi − v_lo)·frac, which
  * rounds differently at denormal/ulp ties (e.g. the midpoint of
  * −MIN_VALUE and −0.0: delta form yields −MIN_VALUE, Spark −0.0 —
  * found by the adversarial property sweep). DuckDB's `quantile_cont`
  * uses the delta form; the driver oracle rounds at the measure grid, so
  * the ulp-level difference is invisible there.
  */
object ExactQuantile {

  /** Histogram width and collect threshold: the defaults suit any real
    * column (8192 buckets resolve most distributions at depth 1; 131072
    * doubles ≈ 1 MB per collected bucket). Exposed as parameters so
    * tests can force deep recursion and multi-state refinement. */
  val defaultBuckets = 8192
  val defaultCollectLimit = 131072

  /** Bucket index of `v` within [lo, hi]: shared by the histogram and
    * the refinement filters, so boundary float arithmetic is consistent
    * by construction. */
  private def bucketOf(v: Column, lo: Double, hi: Double, buckets: Int): Column =
    least(lit(buckets - 1),
      greatest(lit(0), floor((v - lo) / (hi - lo) * buckets))).cast("int")

  /** Column-range variant for the grouped path — the arithmetic shape is
    * identical to [[bucketOf]] so histogram and refinement filters agree
    * on every float boundary. */
  private def bucketOfC(v: Column, lo: Column, hi: Column, buckets: Int): Column =
    least(lit(buckets - 1),
      greatest(lit(0), floor((v - lo) / (hi - lo) * buckets))).cast("int")

  /** Resolves `ords` (global ordinals, ascending) to their values within
    * the rows of `v` (a 1-column "v" DataFrame) restricted to
    * [lo, hi], where `offset` rows precede lo. */
  private def resolve(
      vDf: DataFrame, lo: Double, hi: Double, offset: Long,
      ords: Seq[Long], buckets: Int, collectLimit: Int): Map[Long, Double] = {
    if (ords.isEmpty) return Map.empty
    if (lo == hi) return ords.map(_ -> lo).toMap
    val ranged = vDf.where(col("v") >= lo && col("v") <= hi)
    val hist: Map[Int, Long] = ranged
      .groupBy(bucketOf(col("v"), lo, hi, buckets).as("b"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val prefix = new Array[Long](buckets + 1)
    var i = 0
    while (i < buckets) { prefix(i + 1) = prefix(i) + hist.getOrElse(i, 0L); i += 1 }
    val byBucket = ords.groupBy { ord =>
      // the bucket whose [prefix, prefix+count) window holds ord-offset
      val local = ord - offset
      val b = java.util.Arrays.binarySearch(prefix, local)
      val ins = if (b >= 0) b else -b - 1
      // binarySearch found either an exact prefix boundary (bucket starts
      // at ord) or the insertion point one past the containing bucket
      val cand = if (b >= 0) b else ins - 1
      // skip empty buckets sharing the boundary
      var c = cand
      while (hist.getOrElse(c, 0L) == 0L && c < buckets - 1) c += 1
      c
    }
    byBucket.iterator.flatMap { case (b, bucketOrds) =>
      val cnt = hist(b)
      val before = offset + prefix(b)
      val inBucket = ranged.where(bucketOf(col("v"), lo, hi, buckets) === b)
      lazy val mm = inBucket.agg(min(col("v")), max(col("v"))).head()
      // the can't-shrink guard is unreachable for doubles (two distinct
      // values always split across buckets) but caps the recursion
      // unconditionally: an un-shrunk range collects, whatever its size
      if (cnt <= collectLimit || (mm.getDouble(0) == lo && mm.getDouble(1) == hi)) {
        val values = inBucket.orderBy(col("v")).collect().map(_.getDouble(0))
        bucketOrds.map(ord => ord -> values((ord - before).toInt))
      } else {
        resolve(vDf, mm.getDouble(0), mm.getDouble(1), before, bucketOrds,
          buckets, collectLimit)
      }
    }.toMap
  }

  /** Exact interpolated quantiles of `df(valueCol)` at probabilities
    * `qs` (each in [0,1]). Nulls and NaNs are ignored (as `percentile`
    * ignores nulls); returns NaN per quantile when no rows remain. */
  def quantiles(df: DataFrame, valueCol: String, qs: Seq[Double],
      buckets: Int = defaultBuckets, collectLimit: Int = defaultCollectLimit): Seq[Double] = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantile probabilities must be in [0,1], got $qs")
    val v = df
      .select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull && !isnan(col("v")))
    val base = v.agg(count(lit(1)), min(col("v")), max(col("v"))).head()
    val n = base.getLong(0)
    if (n == 0L) return qs.map(_ => Double.NaN)
    val (mn, mx) = (base.getDouble(1), base.getDouble(2))
    val positions = qs.map(q => q * (n - 1).toDouble)
    val wanted = positions
      .flatMap(p => Seq(math.floor(p).toLong, math.ceil(p).toLong))
      .distinct.sorted
    val found = resolve(v, mn, mx, 0L, wanted, buckets, collectLimit)
    positions.map { p =>
      val lo = math.floor(p).toLong
      val hi = math.ceil(p).toLong
      val vLo = found(lo)
      val vHi = if (lo == hi) vLo else found(hi)
      // Spark Percentile's exact branch structure: equal boundary values
      // short-circuit (0.5·d + 0.5·d of a denormal would round to 0),
      // else the weighted form in Spark's operand order — see scaladoc
      if (lo == hi || vLo == vHi) vLo else (hi - p) * vLo + (p - lo) * vHi
    }
  }

  /** One refinement state: resolve `ords` within value range [lo, hi]
    * of a group, `offset` rows preceding lo. */
  private final case class GState(lo: Double, hi: Double, offset: Long, ords: Seq[Long])

  /** Per-group exact interpolated quantiles for LOW-cardinality group
    * keys — the dangerous case for the `percentile` aggregate, where a
    * handful of groups each buffer |table|/|groups| values in one task.
    *
    * Same histogram-refinement selection as [[quantiles]], but LEVEL-
    * SYNCHRONIZED across groups: each refinement level is ONE histogram
    * pass (kv ⋈ broadcast per-group ranges, grouped by (key, bucket),
    * with per-bucket min/max riding along for free) plus ONE batched
    * collect pass — 3-4 jobs total regardless of group count, instead of
    * 2·|groups| serialized ones. The compact (key, value) projection is
    * materialized once: the input is typically a join, and re-executing
    * it per pass benched 3x the whole operator; the checkpoint holds
    * ~24 bytes/row, never the source tables' width. (The ungrouped
    * [[quantiles]] deliberately does NOT materialize — its 2-3 passes
    * re-scan a column-pruned source with the range predicate pushed
    * down, cheaper than writing a column copy.)
    *
    * The key is compared as a string (cast on input); null keys form
    * their own group, as SQL GROUP BY does. Returns (key, quantiles)
    * pairs in no particular order. */
  def groupedQuantiles(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      qs: Seq[Double],
      buckets: Int = defaultBuckets,
      collectLimit: Int = defaultCollectLimit): Seq[(String, Seq[Double])] = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantile probabilities must be in [0,1], got $qs")
    val spark = df.sparkSession
    import spark.implicits._
    // null keys ride as a sentinel: broadcast-join range states by key
    // without null-key join semantics getting in the way
    val NULLK = "\u0000graft_null_key"
    val kv = df
      .select(coalesce(col(keyCol).cast("string"), lit(NULLK)).as("k"),
        col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull && !isnan(col("v")))
      .localCheckpoint()
    val base = kv.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("mn"), max(col("v")).as("mx"))
      .collect()
    val nByKey: Map[String, Long] = base.map(r => r.getString(0) -> r.getLong(1)).toMap
    val wantedByKey: Map[String, Seq[Long]] = nByKey.map { case (k, n) =>
      k -> qs.map(q => q * (n - 1).toDouble)
        .flatMap(p => Seq(math.floor(p).toLong, math.ceil(p).toLong)).distinct.sorted
    }
    // states are identified by `sid`, not key: one key can hold several
    // simultaneously-refining states (p50's and p90's buckets can both
    // exceed the collect limit). Sibling states of a key cover DISJOINT
    // value ranges (distinct parent buckets), so a row joins at most one
    // state row of its key and attribution is unambiguous.
    var nextSid = 0
    def sid(): Int = { nextSid += 1; nextSid }
    var active: Seq[(Int, String, GState)] = base.map { r =>
      (sid(), r.getString(0),
        GState(r.getDouble(2), r.getDouble(3), 0L, wantedByKey(r.getString(0))))
    }.toSeq
    val found = scala.collection.mutable.Map.empty[(String, Long), Double]

    while (active.nonEmpty) {
      // resolved ranges (lo == hi) need no pass
      val (degenerate, open) = active.partition { case (_, _, s) => s.lo == s.hi }
      degenerate.foreach { case (_, k, s) => s.ords.foreach(o => found((k, o)) = s.lo) }
      if (open.isEmpty) { active = Seq.empty }
      else {
        val states = open.map { case (id, k, s) => (id, k, s.lo, s.hi) }
          .toDF("sid", "k", "slo", "shi")
        val ranged = kv.join(broadcast(states), "k")
          .where(col("v") >= col("slo") && col("v") <= col("shi"))
          .withColumn("b", bucketOfC(col("v"), col("slo"), col("shi"), buckets))
        val hist: Map[Int, Map[Int, (Long, Double, Double)]] = ranged
          .groupBy(col("sid"), col("b"))
          .agg(count(lit(1)).as("c"), min(col("v")).as("bmn"), max(col("v")).as("bmx"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (id, rows) =>
            id -> rows.map(r => r.getInt(1) -> ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
          }
        // sid, key, state, bucket, rows-before-bucket, the bucket's ords
        val collects = Seq.newBuilder[(Int, String, GState, Int, Long, Seq[Long])]
        val next = Seq.newBuilder[(Int, String, GState)]
        open.foreach { case (id, k, s) =>
          val h = hist(id)
          val prefix = new Array[Long](buckets + 1)
          var i = 0
          while (i < buckets) { prefix(i + 1) = prefix(i) + h.get(i).map(_._1).getOrElse(0L); i += 1 }
          s.ords.groupBy { ord =>
            val local = ord - s.offset
            val bs = java.util.Arrays.binarySearch(prefix, local)
            var c = if (bs >= 0) bs else -bs - 2
            while (h.get(c).map(_._1).getOrElse(0L) == 0L && c < buckets - 1) c += 1
            c
          }.foreach { case (b, bucketOrds) =>
            val (cnt, bmn, bmx) = h(b)
            val before = s.offset + prefix(b)
            if (cnt <= collectLimit || (bmn == s.lo && bmx == s.hi))
              collects += ((id, k, s, b, before, bucketOrds))
            else next += ((sid(), k, GState(bmn, bmx, before, bucketOrds)))
          }
        }
        // batched collect: every (state, bucket) target in one pass, rows
        // attributed to their target via (sid, bucket); each bucket's
        // rows sort driver-side (≤ collectLimit per bucket)
        val cts = collects.result()
        if (cts.nonEmpty) {
          val ctDf = cts.map { case (id, k, s, b, _, _) => (id, k, s.lo, s.hi, b) }
            .toDF("sid", "k", "slo", "shi", "tb")
          val got: Map[(Int, Int), Array[Double]] = kv.join(broadcast(ctDf), "k")
            .where(col("v") >= col("slo") && col("v") <= col("shi") &&
              bucketOfC(col("v"), col("slo"), col("shi"), buckets) === col("tb"))
            .select(col("sid"), col("tb"), col("v"))
            .collect()
            .groupBy(r => (r.getInt(0), r.getInt(1)))
            .map { case (kb, rows) => kb -> rows.map(_.getDouble(2)).sorted }
          cts.foreach { case (id, k, _, b, before, bucketOrds) =>
            val values = got((id, b))
            bucketOrds.foreach(o => found((k, o)) = values((o - before).toInt))
          }
        }
        active = next.result()
      }
    }

    base.map { r =>
      val k = r.getString(0)
      val n = nByKey(k)
      val positions = qs.map(q => q * (n - 1).toDouble)
      val outKey = if (k == NULLK) null else k
      outKey -> positions.map { p =>
        val lo = math.floor(p).toLong
        val hi = math.ceil(p).toLong
        val vLo = found((k, lo))
        val vHi = if (lo == hi) vLo else found((k, hi))
        // same branch structure as the ungrouped path (Spark parity)
        if (lo == hi || vLo == vHi) vLo else (hi - p) * vLo + (p - lo) * vHi
      }
    }.toSeq
  }
}
