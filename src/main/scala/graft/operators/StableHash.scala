package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The operator family's stable 32-bit hash — the FIRST 8 hex chars of
  * md5, read as a bigint. ONE definition: selection order, shard/bucket
  * layout, sampling gates and classifier feature bucketing all agree on
  * it by construction, and every DuckDB oracle replays the one spelling
  * (`('0x' || substr(md5(x), 1, 8))::BIGINT`). Deterministic (never
  * rand()): a resumed 100 TB job reproduces identical decisions. */
object StableHash {
  /** Hash of an id column (cast to its canonical string form first). */
  def id32(id: Column): Column = str32(id.cast("string"))

  /** Hash of a string column. */
  def str32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("bigint")
}
