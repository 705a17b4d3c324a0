package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed EXACT interpolated quantiles (SQL `quantile_cont` /
  * Spark `percentile` semantics) by range-partitioned selection.
  *
  * Spark's exact `percentile` aggregate buffers every value of a group in
  * one task; over an ungrouped 100 TB column that single buffer is the
  * whole column — a guaranteed executor OOM. This computes the same
  * numbers with nothing larger than one range partition per task:
  *
  *   1. range-shuffle the column and sort within partitions (a global
  *      sort, each task holding only its slice), materialized once via
  *      `localCheckpoint` (ContextCleaner reclaims the blocks, same
  *      pattern as the dedup pair graph);
  *   2. count per partition (a P-element driver array — bounded metadata,
  *      like the insert path's per-partition count array);
  *   3. turn each quantile into the two global ordinal positions that
  *      bracket it, locate their partitions via the prefix sums, and
  *      select them with one more pass that scans ONLY the partitions
  *      holding a wanted ordinal;
  *   4. interpolate on the driver: v_lo + (v_hi − v_lo) · (p − ⌊p⌋) at
  *      position p = q·(n−1) — bit-identical to the formula inside
  *      Spark's `Percentile` and DuckDB's `quantile_cont`.
  *
  * Cost: one shuffle of the bare column + two cheap passes over the
  * checkpointed slices. Scales by adding partitions; no task ever holds
  * more than `|column| / partitions` values.
  */
object ExactQuantile {

  /** Exact interpolated quantiles of `df(valueCol)` at probabilities
    * `qs` (each in [0,1]). Nulls and NaNs are ignored (as `percentile`
    * ignores nulls); returns NaN per quantile when no rows remain. */
  def quantiles(df: DataFrame, valueCol: String, qs: Seq[Double]): Seq[Double] = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantile probabilities must be in [0,1], got $qs")
    val sorted = df
      .select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull && !isnan(col("v")))
      .repartitionByRange(col("v"))
      .sortWithinPartitions("v")
      .localCheckpoint()

    // pass 1: per-partition counts -> prefix offsets (P longs on the
    // driver; the values themselves never leave the executors)
    val rdd = sorted.queryExecution.toRdd
    val counts = rdd
      .mapPartitions { it =>
        var c = 0L
        while (it.hasNext) { it.next(); c += 1L }
        Iterator.single(c)
      }
      .collect()
    val n = counts.sum
    if (n == 0L) return qs.map(_ => Double.NaN)
    val offsets = counts.scanLeft(0L)(_ + _) // offsets(i) = rows before partition i

    // the bracketing global ordinals every requested quantile needs
    val positions: Seq[Double] = qs.map(q => q * (n - 1).toDouble)
    val wanted: Array[Long] = positions
      .flatMap(p => Seq(math.floor(p).toLong, math.ceil(p).toLong))
      .distinct.sorted.toArray
    val byPartition: Map[Int, Array[(Long, Long)]] = wanted
      .map { k =>
        val pi = offsets.lastIndexWhere(_ <= k, offsets.length - 2)
        (pi, k - offsets(pi), k) // (partition, local index, global ordinal)
      }
      .groupBy(_._1)
      .map { case (pi, ts) => pi -> ts.map(t => (t._2, t._3)).sortBy(_._1) }

    // pass 2: selection — only partitions holding a wanted ordinal are
    // consumed, and each stops at its last target
    val found: Map[Long, Double] = rdd
      .mapPartitionsWithIndex { (pi, it) =>
        byPartition.get(pi) match {
          case None => Iterator.empty
          case Some(targets) =>
            val out = Array.newBuilder[(Long, Double)]
            var i = 0L
            var t = 0
            while (it.hasNext && t < targets.length) {
              val v = it.next().getDouble(0)
              if (i == targets(t)._1) {
                out += ((targets(t)._2, v))
                t += 1
              }
              i += 1L
            }
            out.result().iterator
        }
      }
      .collect()
      .toMap

    positions.map { p =>
      val lo = math.floor(p).toLong
      val hi = math.ceil(p).toLong
      val vLo = found(lo)
      if (lo == hi) vLo else vLo + (found(hi) - vLo) * (p - lo)
    }
  }

  /** Per-group exact interpolated quantiles for LOW-cardinality group
    * keys — the dangerous case for the `percentile` aggregate, where a
    * handful of groups each buffer |table|/|groups| values in one task.
    * Same selection scheme as [[quantiles]], range-partitioned on
    * (key, value) so a single group's values still spread over many
    * partitions; driver metadata is O(partitions × groups) counts, which
    * is exactly the regime (few groups) this path exists for. Groups with
    * high cardinality have small per-group buffers and should use the
    * plain aggregate instead.
    *
    * The key is compared as a string (cast on input); null keys form
    * their own group, as SQL GROUP BY does. Returns (key, quantiles)
    * pairs in no particular order. */
  def groupedQuantiles(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      qs: Seq[Double]): Seq[(String, Seq[Double])] = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantile probabilities must be in [0,1], got $qs")
    val sorted = df
      .select(col(keyCol).cast("string").as("k"), col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull && !isnan(col("v")))
      .repartitionByRange(col("k"), col("v"))
      .sortWithinPartitions("k", "v")
      .localCheckpoint()
    val rdd = sorted.queryExecution.toRdd

    // pass 1: one (key, count) per contiguous key run per partition
    def keyOf(row: org.apache.spark.sql.catalyst.InternalRow): String =
      if (row.isNullAt(0)) null else row.getUTF8String(0).toString
    val runs: Array[(Int, String, Long)] = rdd
      .mapPartitionsWithIndex { (pi, it) =>
        val out = Array.newBuilder[(Int, String, Long)]
        var cur: String = null
        var started = false
        var c = 0L
        while (it.hasNext) {
          val k = keyOf(it.next())
          if (!started || k != cur) {
            if (started) out += ((pi, cur, c))
            cur = k; c = 0L; started = true
          }
          c += 1L
        }
        if (started) out += ((pi, cur, c))
        out.result().iterator
      }
      .collect()

    // per key: partition-ordered counts -> prefix offsets -> the
    // (partition, index-within-key-run) address of each wanted ordinal
    val byKey = runs.groupBy(_._2)
    // per partition, per key: (index within this partition's key run,
    // global ordinal) picks — the global ordinal rides along so results
    // address back uniquely even when a key's run spans partitions
    val picks = scala.collection.mutable.Map
      .empty[Int, scala.collection.mutable.Map[String, Array[(Long, Long)]]]
    val interp = byKey.map { case (key, rs) =>
      val ordered = rs.sortBy(_._1) // (pi, key, cnt) in partition order
      val n = ordered.map(_._3).sum
      val positions = qs.map(q => q * (n - 1).toDouble)
      val wanted = positions
        .flatMap(p => Seq(math.floor(p).toLong, math.ceil(p).toLong))
        .distinct.sorted
      val offsets = ordered.map(_._3).scanLeft(0L)(_ + _)
      wanted.foreach { ord =>
        val ri = offsets.lastIndexWhere(_ <= ord, offsets.length - 2)
        val pi = ordered(ri)._1
        val perKey = picks.getOrElseUpdate(pi, scala.collection.mutable.Map.empty)
        perKey(key) =
          perKey.getOrElse(key, Array.empty[(Long, Long)]) :+ ((ord - offsets(ri), ord))
      }
      key -> positions
    }
    val targets: Map[Int, Map[String, Array[(Long, Long)]]] =
      picks.map { case (pi, m) => pi -> m.map { case (k, a) => k -> a.sortBy(_._1) }.toMap }.toMap

    // pass 2: selection — per-key run counters, early exit per partition
    val found: Map[(String, Long), Double] = rdd
      .mapPartitionsWithIndex { (pi, it) =>
        targets.get(pi) match {
          case None => Iterator.empty
          case Some(perKey) =>
            val out = Array.newBuilder[((String, Long), Double)]
            var remaining = perKey.values.map(_.length).sum
            var cur: String = null
            var started = false
            var idx = 0L
            var queue: Array[(Long, Long)] = Array.empty
            var qi = 0
            while (it.hasNext && remaining > 0) {
              val row = it.next()
              val k = keyOf(row)
              if (!started || k != cur) {
                cur = k; idx = 0L; started = true
                queue = perKey.getOrElse(k, Array.empty); qi = 0
              }
              if (qi < queue.length && idx == queue(qi)._1) {
                out += (((k, queue(qi)._2), row.getDouble(1)))
                qi += 1; remaining -= 1
              }
              idx += 1L
            }
            out.result().iterator
        }
      }
      .collect()
      .toMap

    interp.map { case (key, positions) =>
      key -> positions.map { p =>
        val lo = math.floor(p).toLong
        val hi = math.ceil(p).toLong
        val vLo = found((key, lo))
        if (lo == hi) vLo else vLo + (found((key, hi)) - vLo) * (p - lo)
      }
    }.toSeq
  }
}
