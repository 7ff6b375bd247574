package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ExprBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** All `nTables` random-hyperplane signatures of one vector in a single
  * compiled pass — the corpus-side hot loop of
  * [[graft.operators.Ann.lshCosineTopK]].
  *
  * The compositional form (per-table `aggregate(zip_with(...))`) walks the
  * interpreter tree per element: corpus × tables × planes × dim nodes. This
  * expression does the same arithmetic as straight JVM loops (~1000× less
  * overhead) with BIT-IDENTICAL results: the plane weights come from the
  * same SplitMix64 derivation as [[graft.operators.Ann.hyperplaneProj]] and
  * the dot product folds left-to-right in the same IEEE order, so corpus
  * signatures computed here agree exactly with query signatures computed by
  * the interpreted projection path (LshRecallSpec pins the (q,q) self-hit).
  */
case class HyperplaneSigsAll(child: Expression, dim: Int, nPlanes: Int,
    nTables: Int) extends UnaryExpression with CodegenFallback {
  require(nPlanes <= 63, "pack into one long")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_sigs"

  private lazy val childIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // [table][plane][dim] ±1 weights — derived once per executor from the
  // same splitmix64 stream as Ann.planeMatrix (no stored model)
  private lazy val planes: Array[Array[Array[Double]]] =
    Array.tabulate(nTables, nPlanes, dim) { (t, p, d) =>
      if ((MinHashSignature.splitmix64(
        t.toLong * 7368787L + p.toLong * 1048573 + d) & 1L) == 0L) 1.0
      else -1.0
    }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val x = new Array[Double](n)
    var d = 0
    while (d < n) {
      x(d) = if (childIsFloat) v.getFloat(d).toDouble else v.getDouble(d)
      d += 1
    }
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var sig = 0L
      var p = 0
      while (p < nPlanes) {
        val w = planes(t)(p)
        var s = 0.0
        var i = 0
        while (i < n) { s += x(i) * w(i); i += 1 }
        if (s > 0) sig |= (1L << p)
        p += 1
      }
      out(t) = sig
      t += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HyperplaneSigsAll {
  def sigs(vec: Column, dim: Int, nPlanes: Int, nTables: Int): Column =
    ExpressionUtils.column(HyperplaneSigsAll(
      ExpressionUtils.expression(vec), dim, nPlanes, nTables))
}
