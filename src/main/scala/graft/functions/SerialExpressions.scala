package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Contiguous-in-input-order id assignment without leaving Tungsten: the
  * counter starts at `offsets(partitionIndex)` (the global row offset of
  * the partition, precomputed from one counting pass) and increments per
  * row — the codegen'd analogue of `zipWithIndex + map`, minus the
  * external-Row round-trip. Same mechanism as Spark's
  * `MonotonicallyIncreasingID`, but yielding exactly `offset + localRow`
  * so serial columns are gap-free in input order (the reference's
  * observable INSERT semantics).
  *
  * Stateful/nondeterministic: evaluate exactly once per row in a single
  * projection (the insert path's final select before write).
  */
case class PartitionOffsetId(offsets: Array[Long]) extends LeafExpression with Nondeterministic {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def stateful: Boolean = true

  @transient private[this] var count: Long = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    count = offsets(partitionIndex)

  override protected def evalInternal(input: InternalRow): Long = {
    val v = count
    count += 1
    v
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val countTerm = ctx.addMutableState(CodeGenerator.JAVA_LONG, "serialCount")
    val offsetsTerm = ctx.addReferenceObj("serialOffsets", offsets, "long[]")
    ctx.addPartitionInitializationStatement(s"$countTerm = $offsetsTerm[partitionIndex];")
    ev.copy(
      code = code"""
        final long ${ev.value} = $countTerm;
        $countTerm++;""",
      isNull = FalseLiteral)
  }

  override def prettyName: String = "partition_offset_id"
}

/** range_bucket(v) → count of `bounds` ≤ v: the bucket index of `v`
  * against sorted distinct range boundaries, by binary search — O(log B)
  * per row where the lambda spelling (`size(filter(bounds, b -> b <= v))`)
  * is O(B). Monotone in `v` and deterministic per distinct value (equal
  * keys always share a bucket), which is exactly the contract the
  * two-level prefix-sum global rank needs from its bucketing column.
  * Used by `Packing.zorderFiles` with quantile-derived boundaries. */
case class RangeBucket(child: org.apache.spark.sql.catalyst.expressions.Expression,
    bounds: Array[Long])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(bounds.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
    "range_bucket bounds must be sorted and distinct")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val i = java.util.Arrays.binarySearch(bounds, input.asInstanceOf[Long])
    if (i >= 0) (i + 1).toLong else (-i - 1).toLong
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("rangeBounds", bounds, "long[]")
    val idx = ctx.freshName("idx")
    nullSafeCodeGen(ctx, ev, c => s"""
      int $idx = java.util.Arrays.binarySearch($b, $c);
      ${ev.value} = $idx >= 0 ? ($idx + 1L) : (-$idx - 1L);""")
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): RangeBucket = copy(child = c)
  override def prettyName: String = "range_bucket"
}
