package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011 — the standard
  * public method): a D-dim vector splits into `m` contiguous `sub`-dim
  * subvectors, each quantized to one of `k` per-subspace centroids, so a
  * 64-dim float vector (256 B) stores as m small codes (m bytes at
  * k ≤ 256) — the memory lever that makes exhaustive candidate scans
  * affordable at 10⁹+ vectors. Query-side ADC (asymmetric distance
  * computation) precomputes an m×k table of exact subspace distances
  * once per query; a candidate's approximate distance is then m table
  * lookups, no float vector ever touched.
  *
  * Centroids ride as CONSTRUCTOR data flattened to one double[]
  * (layout: [(s·k + c)·sub + i]) — bound by builder closures, never SQL
  * text. All loops are sequential in index order, so results are
  * deterministic and partition-layout-independent. */
object PqOps {

  /** Codes of `v`: per subspace the argmin-distance centroid index,
    * ties to the smallest index. */
  def encode(v: ArrayData, cents: Array[Double], m: Int, k: Int, sub: Int,
      floats: Boolean): ArrayData = {
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = -1
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        val base = (s * k + c) * sub
        var d = 0.0
        var i = 0
        while (i < sub) {
          val x =
            if (floats) v.getFloat(s * sub + i).toDouble else v.getDouble(s * sub + i)
          val diff = x - cents(base + i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  /** The query's m×k ADC table, flattened [s·k + c]: exact squared
    * euclidean distance from the query's subvector s to centroid c. */
  def distTable(q: ArrayData, cents: Array[Double], m: Int, k: Int, sub: Int,
      floats: Boolean): ArrayData = {
    val out = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < k) {
        val base = (s * k + c) * sub
        var d = 0.0
        var i = 0
        while (i < sub) {
          val x =
            if (floats) q.getFloat(s * sub + i).toDouble else q.getDouble(s * sub + i)
          val diff = x - cents(base + i)
          d += diff * diff
          i += 1
        }
        out(s * k + c) = d
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Approximate squared distance: m table lookups, summed in subspace
    * order (deterministic double accumulation). */
  def adc(codes: ArrayData, table: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    var s = 0
    var d = 0.0
    while (s < m) {
      d += table.getDouble(s * k + codes.getInt(s))
      s += 1
    }
    d
  }
}

/** pq_encode(embedding array<float|double>) → array<int>: the m
  * subspace codes of a vector under the trained product quantizer
  * (constructor data). A pure narrow projection — after it runs, the
  * embedding is projected away and only m ints travel. */
case class PqEncode(child: Expression, cents: Array[Double], m: Int, k: Int, sub: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  private lazy val floats =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(v: Any): Any =
    PqOps.encode(v.asInstanceOf[ArrayData], cents, m, k, sub, floats)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rc = ctx.addReferenceObj("pqCents", cents, "double[]")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.PqOps.encode($v, $rc, $m, $k, $sub, $floats)")
  }
  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
  override def prettyName: String = "pq_encode"
}

/** pq_dist_table(q_emb array<float|double>) → array<double>: the
  * query's flattened m×k ADC table under the trained quantizer. Runs
  * once per query row BEFORE the broadcast, so the broadcast side
  * carries (query_id, table) and the raw query vector never reaches the
  * candidate join. */
case class PqDistTable(child: Expression, cents: Array[Double], m: Int, k: Int, sub: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  private lazy val floats =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(v: Any): Any =
    PqOps.distTable(v.asInstanceOf[ArrayData], cents, m, k, sub, floats)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rc = ctx.addReferenceObj("pqCents", cents, "double[]")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.PqOps.distTable($v, $rc, $m, $k, $sub, $floats)")
  }
  override protected def withNewChildInternal(c: Expression): PqDistTable = copy(child = c)
  override def prettyName: String = "pq_dist_table"
}

/** pq_adc(codes array<int>, table array<double>) → double: the
  * approximate squared distance — m lookups into the query's table. */
case class PqAdc(left: Expression, right: Expression, k: Int) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(codes: Any, table: Any): Any =
    PqOps.adc(codes.asInstanceOf[ArrayData], table.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, t) => s"graft.functions.PqOps.adc($c, $t, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
  override def prettyName: String = "pq_adc"
}
