package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one join key carries a disproportionate share of rows (hot user,
  * null-ish default key, celebrity entity), the hash shuffle sends that
  * whole key to ONE reducer — at 100 TB that single task runs for hours
  * while the cluster idles. Salting splits the hot key's rows across
  * `salts` reducers: the skewed side gets a random salt in [0, salts), the
  * other side is replicated once per salt value, and the join key becomes
  * (key, salt). AQE's skew-join handles many cases at runtime; explicit
  * salting remains the tool when a single key exceeds what one task can
  * hold even after AQE splitting (AQE splits by partition, not by key).
  */
object SkewSalting {

  /** Inner equi-join of `skewed` and `other` on `key`, distributing each
    * key of the skewed side over `salts` reducers. `other` is replicated
    * `salts` times — use for moderate-size right sides or pre-filtered
    * hot-key subsets. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String, salts: Int): DataFrame = {
    // salt = hash(all columns + a row-unique id): fully-duplicate rows
    // (common under hot default keys) still spread across reducers; the
    // join stays correct for ANY per-row salt because the other side is
    // replicated over every salt value
    val salted = skewed.withColumn(
      "_salt", pmod(
        xxhash64((skewed.columns.map(col) :+ monotonically_increasing_id()).toIndexedSeq: _*),
        lit(salts)).cast("int"))
    val replicated = other.withColumn(
      "_salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
        salted(key) === replicated(key) && salted("_salt") === replicated("_salt"))
      .drop(replicated(key))
      .drop(salted("_salt"))
      .drop(replicated("_salt"))
  }
}
