package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.round
import org.apache.spark.sql.types.DecimalType

/** Cross-engine stable rounding for non-terminating values (avg, ratios,
  * cosines).
  *
  * `round(double, n)` diverges between Spark and DuckDB when the true
  * value is an exact decimal tie (e.g. avg = 38.37875: Spark rounds the
  * shortest decimal repr HALF_UP → 38.3788, DuckDB rounds the binary
  * double → 38.3787). Casting to DECIMAL(28,8) first makes both engines
  * round the same exact decimal, then HALF_UP at the target scale agrees.
  * Sums of fixed-decimal measures don't need this — rounding AT the
  * measure's decimal resolution is convergent (both engines collapse ulp
  * noise to the same value); see the q01/q39 oracle comments.
  */
object OracleRound {
  def stableRound(c: Column, scale: Int): Column =
    round(c.cast(DecimalType(28, 8)), scale).cast("double")

  /** The same computation spelled in SQL for the DuckDB oracle. */
  def stableRoundSql(exprSql: String, scale: Int): String =
    s"CAST(round(CAST($exprSql AS DECIMAL(28,8)), $scale) AS DOUBLE)"
}
