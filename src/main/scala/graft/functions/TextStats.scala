package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.{ExprBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text statistics: chars, whitespace tokens, punctuation chars,
  * and stopword hits for {en, de, fr, es} — one expression, one scan of the
  * string, zero intermediate arrays.
  *
  * The compositional form (4 × stopwordRatio, each a split+filter+isin over
  * higher-order builtins) evaluates interpreted per language and re-tokenizes
  * the document 5 times; this fuses all counters into one loop. Used by the
  * fast language-ID path; the pure-Catalyst formulations in [[TextFeatures]]
  * remain the oracle-verifiable reference semantics.
  */
case class TextStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("stop_en", LongType, nullable = false),
    StructField("stop_de", LongType, nullable = false),
    StructField("stop_fr", LongType, nullable = false),
    StructField("stop_es", LongType, nullable = false)))

  override def prettyName: String = "text_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    var nTokens = 0L; var nPunct = 0L
    var en = 0L; var de = 0L; var fr = 0L; var es = 0L
    val tok = new java.lang.StringBuilder(24)
    def flush(): Unit = if (tok.length() > 0) {
      nTokens += 1
      val w = tok.toString.toLowerCase(java.util.Locale.ROOT)
      if (TextStatsExpr.en.contains(w)) en += 1
      if (TextStatsExpr.de.contains(w)) de += 1
      if (TextStatsExpr.fr.contains(w)) fr += 1
      if (TextStatsExpr.es.contains(w)) es += 1
      tok.setLength(0)
    }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      // \s semantics (Java regex): space, \t, \n, \x0B, \f, \r
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
      if (isWs) flush() else tok.append(c)
      // \p{Punct} = ASCII punctuation
      if ((c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
          (c >= '[' && c <= '`') || (c >= '{' && c <= '~')) nPunct += 1
      i += 1
    }
    flush()
    InternalRow(n.toLong, nTokens, nPunct, en, de, fr, es)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStatsExpr {
  private def set(ws: Seq[String]) = {
    val s = new java.util.HashSet[String](ws.size * 2)
    ws.foreach(s.add); s
  }
  val en = set(TextFeatures.enStopwords)
  val de = set(TextFeatures.deStopwords)
  val fr = set(TextFeatures.frStopwords)
  val es = set(TextFeatures.esStopwords)

  def textStats(c: Column): Column =
    ExpressionUtils.column(TextStatsExpr(ExpressionUtils.expression(c)))
}
