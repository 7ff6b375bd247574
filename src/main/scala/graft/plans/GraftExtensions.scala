package graft.plans

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions wiring: graft's custom Catalyst expressions become
  * SQL-callable functions, so `spark.sql("... ro_similarity(a,b) ...")` is
  * exactly as expressive as the Column API. Register with
  * `.withExtensions(new GraftExtensions)` (GraftSession does).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => SimilarityPrefilterRule)

    ext.injectFunction((
      new FunctionIdentifier("ro_similarity"),
      new ExpressionInfo(classOf[RatcliffObershelpSimilarity].getName,
        "ro_similarity"),
      (args: Seq[Expression]) =>
        RatcliffObershelpSimilarity(args(0), args(1))))

    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args.head)))

    ext.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName,
        "minhash_signature"),
      (args: Seq[Expression]) =>
        MinHashSignature(args(0), intLit(args(1), "numHashes"))))

    ext.injectFunction((
      new FunctionIdentifier("minhash_text_signature"),
      new ExpressionInfo(classOf[MinHashTextSignature].getName,
        "minhash_text_signature"),
      (args: Seq[Expression]) => MinHashTextSignature(args(0),
        intLit(args(1), "shingleSize"), intLit(args(2), "numHashes"))))

    ext.injectFunction((
      new FunctionIdentifier("signature_agreement"),
      new ExpressionInfo(classOf[SignatureAgreement].getName,
        "signature_agreement"),
      (args: Seq[Expression]) => SignatureAgreement(args(0), args(1))))

    ext.injectFunction((
      new FunctionIdentifier("jaccard_sorted"),
      new ExpressionInfo(classOf[JaccardSortedArrays].getName,
        "jaccard_sorted"),
      (args: Seq[Expression]) => JaccardSortedArrays(args(0), args(1))))

    ext.injectFunction((
      new FunctionIdentifier("text_stats"),
      new ExpressionInfo(classOf[TextStatsExpr].getName, "text_stats"),
      (args: Seq[Expression]) => TextStatsExpr(args.head)))

    ext.injectFunction((
      new FunctionIdentifier("dot_float"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "dot_float"),
      (args: Seq[Expression]) => DotProductFloat(args(0), args(1))))

    ext.injectFunction((
      new FunctionIdentifier("hyperplane_sigs"),
      new ExpressionInfo(classOf[HyperplaneSigsAll].getName,
        "hyperplane_sigs"),
      (args: Seq[Expression]) => HyperplaneSigsAll(args(0),
        intLit(args(1), "dim"), intLit(args(2), "nPlanes"),
        intLit(args(3), "nTables"))))
  }
}
