package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{ExprBridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, LongType}

/** `lg64(n)` ≈ 64·log₂(n) in integer fixed point — the engine's shared
  * cross-engine logarithm ([[graft.operators.NaiveBayes.lg64]] documents the
  * mantissa-quartic algorithm and its DuckDB CTE twin).
  *
  * This Expression exists for CODE SIZE, not semantics: the original
  * composition of built-ins (`bin`/`shiftright`/`*`) duplicates every
  * sub-tree at each of the 3 mantissa steps (Catalyst has no let-binding),
  * so ONE lg64 inlines to ~1500 leaf copies and two of them inside a fused
  * stage pushed the generated method past Janino's 64 KB limit — the whole
  * stage silently fell back to interpreted eval (observed on
  * q_sparse_cosine's idf stage). Here the generated code is a single static
  * call, so the stage stays inside whole-stage codegen at ~30 bytes.
  *
  * [[Lg64Expr.compute]] is bit-identical to the unrolled chain for every
  * input the chain itself could evaluate (NaiveBayesSpec pins the
  * equivalence and the DuckDB parity): bit-length via the same
  * `length(bin(x))` semantics (x=0 → 1, x<0 → 64), Java shift-count mod-64
  * semantics exactly as Spark's `shiftright`, left-associated quartic
  * multiplies with ANSI overflow checks.
  */
case class Lg64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "lg64"

  override protected def nullSafeEval(n: Any): Any =
    Lg64Expr.compute(n.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Lg64Expr.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Lg64Expr {
  // length(Long.toBinaryString(x)) without building the string
  private def blen(x: Long): Int =
    if (x == 0L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(x)

  /** The 3-step mantissa-quartic fixed-point log; see class doc. */
  def compute(n: Long): Long = {
    val e0 = blen(n) - 1
    var m = Math.multiplyExact(n, 8192L) >> e0
    var acc = e0.toLong * 64L
    var w = 16L
    var i = 0
    while (i < 3) {
      val raw = Math.multiplyExact(Math.multiplyExact(Math.multiplyExact(m, m), m), m)
      val f = blen(raw) - 53
      acc += f.toLong * w
      w /= 4L
      m = raw >> (f + 39) // Java mod-64 shift == Spark shiftright
      i += 1
    }
    acc
  }

  /** lg64 over a numeric column (cast to long first, as the chain did). */
  def lg64(c: Column): Column =
    ExpressionUtils.column(Lg64Expr(
      ExpressionUtils.expression(c.cast("long"))))
}
