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
}
