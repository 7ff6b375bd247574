package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ExprBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** The `nProbe` centroid indices nearest to a vector by cosine, in one
  * compiled pass — the assignment/probing kernel of
  * [[graft.operators.Ann.ivfCosineTopK]]. Centroids ship as a plan-time
  * literal (they come from a bounded driver-side training sample, the
  * standard IVF shape); per row this is k×dim fused multiply-adds plus a
  * partial selection — no interpreter nodes, no per-row allocation beyond
  * the output.
  */
case class NearestCentroids(child: Expression,
    centroids: Seq[Seq[Double]], nProbe: Int)
    extends UnaryExpression with CodegenFallback {
  require(nProbe >= 1 && nProbe <= centroids.size)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  private lazy val childIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // unit-normalized centroid matrix: cosine argmax = dot argmax
  private lazy val cent: Array[Array[Double]] = centroids.map { c =>
    val n = math.sqrt(c.map(x => x * x).sum)
    (if (n > 0) c.map(_ / n) else c).toArray
  }.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val x = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      x(d) = if (childIsFloat) v.getFloat(d).toDouble else v.getDouble(d)
      d += 1
    }
    val k = cent.length
    val dots = new Array[Double](k)
    var c = 0
    while (c < k) {
      val w = cent(c)
      val n = math.min(dim, w.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += x(i) * w(i); i += 1 }
      dots(c) = s
      c += 1
    }
    // selection of the nProbe largest dots (k is small — tens to thousands)
    val out = new Array[Int](nProbe)
    val taken = new Array[Boolean](k)
    var p = 0
    while (p < nProbe) {
      var best = -1
      var bestDot = Double.NegativeInfinity
      var j = 0
      while (j < k) {
        if (!taken(j) && (dots(j) > bestDot ||
            (dots(j) == bestDot && (best == -1 || j < best)))) {
          best = j; bestDot = dots(j)
        }
        j += 1
      }
      taken(best) = true
      out(p) = best
      p += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NearestCentroids {
  def nearest(vec: Column, centroids: Seq[Seq[Double]], nProbe: Int): Column =
    ExpressionUtils.column(NearestCentroids(
      ExpressionUtils.expression(vec), centroids, nProbe))
}
