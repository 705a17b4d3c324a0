package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus duplication statistics driving ADAPTIVE plan-shape selection.
  *
  * The dedup/text operators each have two correct plan shapes whose costs
  * cross over on the corpus's duplication factor:
  *   - per-doc shapes (band/tokenize every row) win on mostly-unique
  *     corpora — no distinct pass, no fan-back join;
  *   - sketch-level / content-addressed shapes (collapse to distinct
  *     signatures or texts first) win on clone-heavy corpora — hot LSH
  *     buckets and per-text work stop scaling with the clone factor
  *     (measured: doc-level simhash banding produced 3.2e8 candidates for
  *     1.5e5 docs / 5e3 distinct sketches, 6x the wall clock).
  * Both produce identical results; only the plan differs. Callers that
  * know their corpus pass `distinctRatio` explicitly; otherwise operators
  * estimate it here.
  *
  * The estimate reads only the corpus HEAD (`limit(sample)` short-
  * circuits the scan after enough partitions), so it is O(sample) at any
  * corpus size — no full pass at 100 TB. Head bias is documented: a
  * corpus whose clones live exclusively beyond the sampled head is
  * mis-classified to the (always correct, merely slower) per-doc shape.
  */
object CorpusStats {

  /** Ratio below which clone-collapsing shapes pay for their extra
    * distinct pass: collapsing must remove ≥~40% of rows to beat the
    * shuffle/join it adds (measured crossover is broad — 0.3..0.8 —
    * because both shapes are within noise near ratio 1:2). */
  val cloneHeavyBelow: Double = 0.6

  /** Estimated distinct ratio (distinct values / rows) of `column` over
    * the corpus head. approx_count_distinct (HLL, ~2% error) keeps the
    * sampled pass shuffle-free: partial sketches merge to one row. */
  def headDistinctRatio(corpus: DataFrame, column: String = "text",
      sample: Int = 100000): Double = {
    val r = corpus.select(xxhash64(col(column)).as("k")).limit(sample)
      .agg(approx_count_distinct(col("k")).as("d"), count(lit(1)).as("n"))
      .head()
    if (r.getLong(1) == 0L) 1.0 else r.getLong(0).toDouble / r.getLong(1)
  }

  /** Session-memoized ratio per (corpus dir, table, column) — the
    * testdata bindings share one estimate across operators and bench
    * iterations instead of re-sampling per query. */
  def cachedHeadDistinctRatio(s: SparkSession, dir: String, table: String,
      column: String): Double =
    graft.SessionCache.getOrBuild(
      s, ("head-distinct-ratio", dir, table, column))(
      java.lang.Double.valueOf(
        headDistinctRatio(graft.Tables.load(s, dir, table), column)))
      .doubleValue()
}
