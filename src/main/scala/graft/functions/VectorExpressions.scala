package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static vector kernels. Accumulation is SEQUENTIAL in double, index
  * order — bit-for-bit the same result as the SQL
  * `aggregate(zip_with(...))` pipeline it replaces AND DuckDB's
  * `list_cosine_similarity`, so oracle hashes are unchanged; only the
  * per-element lambda interpretation cost is gone. */
object VectorOps {
  /** Argmin of euclidean distance from `v` to each row of the `cents`
    * matrix (array<array<double>>); ties take the SMALLEST index. The
    * comparison value is sqrt(sequential squared sum) — bit-identical to
    * DuckDB's `list_distance`, NOT the raw squared sum: sqrt is monotone
    * but not injective after double rounding, so comparing pre-sqrt values
    * could break a near-tie differently than the oracle. */
  def nearestCentroid(v: ArrayData, cents: ArrayData, floats: Boolean): Int = {
    val k = cents.numElements()
    var best = -1
    var bestD = Double.PositiveInfinity
    var j = 0
    while (j < k) {
      val c = cents.getArray(j)
      val n = math.min(v.numElements(), c.numElements())
      var d = 0.0
      var i = 0
      while (i < n) {
        val x = if (floats) v.getFloat(i).toDouble else v.getDouble(i)
        val diff = x - c.getDouble(i)
        d += diff * diff
        i += 1
      }
      val dist = math.sqrt(d)
      if (dist < bestD) { bestD = dist; best = j }
      j += 1
    }
    best
  }

  /** Euclidean norm, sequential double accumulation in index order —
    * bit-identical to DuckDB's sqrt(list_sum(list_transform(v, x->x*x))). */
  def l2norm(a: ArrayData, floats: Boolean): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (floats) a.getFloat(i).toDouble else a.getDouble(i)
      s += x * x
      i += 1
    }
    math.sqrt(s)
  }

  def cosine(a: ArrayData, b: ArrayData, floatsA: Boolean, floatsB: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (floatsA) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (floatsB) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** cosine_sim(a array<float|double>, b array<float|double>) → double.
  * The higher-order-function spelling (`aggregate(zip_with(..))`) is
  * interpreted per element — three lambda invocations per dimension; this
  * expression is one static call inside whole-stage codegen. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val fa = isFloat(left)
  private lazy val fb = isFloat(right)
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], fa, fb)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.cosine($a, $b, $fa, $fb)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** nearest_centroid(v array<float|double>, cents array<array<double>>) →
  * int: argmin of euclidean distance, ties to the smallest index.
  * One static call inside whole-stage codegen — the k-means assignment
  * step runs as a pure projection over the scan, no join, no shuffle. */
case class NearestCentroid(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  private lazy val floats =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(v: Any, c: Any): Any =
    VectorOps.nearestCentroid(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], floats)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c) => s"graft.functions.VectorOps.nearestCentroid($v, $c, $floats)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestCentroid =
    copy(left = l, right = r)
  override def prettyName: String = "nearest_centroid"
}

/** l2_norm(v array<float|double>) → double: codegen'd euclidean norm. */
case class L2Norm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  private lazy val floats =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(v: Any): Any =
    VectorOps.l2norm(v.asInstanceOf[ArrayData], floats)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.VectorOps.l2norm($v, $floats)")
  override protected def withNewChildInternal(c: Expression): L2Norm = copy(child = c)
  override def prettyName: String = "l2_norm"
}

object VectorFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // idempotent — see GraftFunctions.register
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim")))
      reg.createOrReplaceTempFunction(
        "cosine_sim", exprs => CosineSim(exprs.head, exprs(1)), "built-in")
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("nearest_centroid")))
      reg.createOrReplaceTempFunction(
        "nearest_centroid", exprs => NearestCentroid(exprs.head, exprs(1)), "built-in")
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("l2_norm")))
      reg.createOrReplaceTempFunction(
        "l2_norm", exprs => L2Norm(exprs.head), "built-in")
  }
}
