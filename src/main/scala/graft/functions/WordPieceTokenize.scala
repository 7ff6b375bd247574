package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{ExprBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match-first (max-munch) WordPiece tokenization of one
  * word against a trained vocabulary — the inference half of
  * [[graft.operators.WordPiece]], as a fused JVM pass (the
  * [[UnigramViterbi]] selection argument: variable-length prefix
  * matching is imperative; a HOF formulation would materialize every
  * prefix candidate per position through interpreted lambdas).
  *
  * The vocabulary arrives as a PLAN LITERAL (bounded model artifact:
  * alphabet ∪ learned merges, corpus-size-independent).
  *
  * Determinism contract (mirrored exactly by
  * tools/gen_wordpiece_golden.py): positions scanned left to right; at
  * each position the LONGEST vocab piece matching the remainder wins
  * (`##`-prefixed lookup after the first position); if no piece matches
  * at any position the ENTIRE word tokenizes to the single `[UNK]`
  * piece — the standard whole-word-UNK inference contract. */
case class WordPieceTokenize(child: Expression, vocab: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_tokenize"

  @transient private lazy val table: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }
  @transient private lazy val maxPiece: Int =
    if (vocab.isEmpty) 0
    else vocab.iterator.map(p => p.length).max

  override protected def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[UTF8String].toString
    val m = w.length
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < m) {
      val prefix = if (i == 0) "" else "##"
      // longest candidate first; piece length ≤ maxPiece − prefix len
      var end = math.min(m, i + math.max(0, maxPiece - prefix.length))
      var hit: String = null
      while (hit == null && end > i) {
        val cand = prefix + w.substring(i, end)
        if (table.contains(cand)) hit = cand else end -= 1
      }
      if (hit == null) {
        return new GenericArrayData(
          Array[Any](UTF8String.fromString("[UNK]")))
      }
      out += UTF8String.fromString(hit)
      i = end
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WordPieceTokenize {
  def tokenize(word: Column, vocab: Seq[String]): Column =
    ExpressionUtils.column(WordPieceTokenize(
      ExpressionUtils.expression(word), vocab))
}
