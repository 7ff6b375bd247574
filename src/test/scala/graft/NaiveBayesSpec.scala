package graft

import graft.operators.NaiveBayes
import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** In-JVM re-derivations for the integer Naive-Bayes family: the
  * fixed-point log primitive against a BigInt reference, and the full
  * classifier against a direct Scala NB over the collected corpus. */
class NaiveBayesSpec extends SparkSpec {

  /** Reference lg64: same algorithm, arbitrary-precision. */
  private def lg64Ref(n: Long): Long = {
    require(n >= 1)
    val e0 = 63 - java.lang.Long.numberOfLeadingZeros(n)
    var m = BigInt(n) * 8192 >> e0
    var acc = e0.toLong * 64
    var unit = 16L
    (1 to 3).foreach { _ =>
      val raw = m.pow(4)
      val f = raw.bitLength - 53
      m = raw >> (f + 39)
      acc += unit * f
      unit /= 4
    }
    acc
  }

  test("lg64 matches the BigInt reference and brackets 64*log2") {
    val ns = (1L to 4096L) ++ Seq(8191L, 8192L, 1000000L, 123456789L,
      (1L << 49) - 1)
    import spark.implicits._
    val got = ns.toDF("n")
      .select(col("n"), NaiveBayes.lg64(col("n")).as("lg"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ns.foreach { n =>
      assert(got(n) === lg64Ref(n), s"n=$n")
      val err = math.abs(got(n) / 64.0 - math.log(n.toDouble) / math.log(2))
      assert(err < 0.02, s"n=$n err=$err")
    }
    assert(got(1L) === 0L && got(8192L) === 13 * 64L)
  }

  test("q_nb_classify equals a direct Scala NB over the collected corpus") {
    val out = TextQueries.qNbClassify.run(spark, sfDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("pred"), r.getAs[String]("actual"),
          r.getAs[Int]("correct"), r.getAs[Long]("score")))).toMap

    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val toks = docs.map { case (id, _, t) =>
      id -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }.toMap
    val byLang = docs.groupBy(_._2)
    val langs = byLang.keys.toSeq.sorted
    val cnt = byLang.map { case (l, ds) =>
      l -> ds.flatMap(d => toks(d._1)).groupBy(identity)
        .map { case (t, xs) => t -> xs.size.toLong }
    }
    val v = docs.flatMap(d => toks(d._1)).distinct.size.toLong
    val tot = cnt.map { case (l, m) => l -> m.values.sum }
    docs.foreach { case (id, lang, _) =>
      val scores = langs.map { c =>
        val s = lg64Ref(byLang(c).size.toLong) + toks(id).map { t =>
          lg64Ref(cnt(c).getOrElse(t, 0L) + 1) - lg64Ref(tot(c) + v)
        }.sum
        (c, s)
      }
      val (pred, score) = scores.sortBy { case (c, s) => (-s, c) }.head
      val (gotPred, gotActual, gotCorrect, gotScore) = out(id)
      assert(gotPred === pred && gotScore === score, s"doc $id")
      assert(gotActual === lang)
      assert(gotCorrect === (if (pred == lang) 1 else 0))
    }
    assert(out.size === docs.length)
  }

  test("q_nb_model summary matches a direct re-derivation") {
    val out = TextQueries.qNbModel.run(spark, sfDir)
      .collect().map(r => r.getAs[String]("cls") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("tot_tokens"),
          r.getAs[Long]("vocab_c"), r.getAs[String]("top_token")))).toMap

    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    docs.groupBy(_._2).foreach { case (lang, ds) =>
      val all = ds.flatMap(_._3.trim.toLowerCase.split("\\s+")
        .filter(_.nonEmpty))
      val freq = all.groupBy(identity).map { case (t, xs) => (t, xs.size) }
      val top = freq.toSeq.minBy { case (t, c) => (-c, t) }._1
      assert(out(lang) === ((ds.size.toLong, all.size.toLong,
        freq.size.toLong, top)), s"lang $lang")
    }
  }

  test("lg64Long matches the Column lg64 over the literal-table domain") {
    import spark.implicits._
    val ns = ((1L to 64L) ++ Seq(100L, 1000L, 123456L, 1L << 40)).toSeq
    val fromCol = ns.toDF("n")
      .select(org.apache.spark.sql.functions.col("n"),
        graft.operators.NaiveBayes.lg64(
          org.apache.spark.sql.functions.col("n")).as("lg"))
      .as[(Long, Long)].collect().toMap
    ns.foreach { n =>
      assert(graft.operators.NaiveBayes.lg64Long(n) === fromCol(n),
        s"mismatch at n=$n")
    }
  }

  test("Lg64Expr (codegen) is bit-identical to the unrolled chain") {
    import spark.implicits._
    // dense small domain + every power of two + scattered large values:
    // covers each e0 band and the mantissa-step branch structure
    val ns = ((1L to 4096L) ++ (0 to 49).map(1L << _) ++
      (1 to 500).map(i => i * 997003L) ++
      Seq(3L, 999999937L, (1L << 49) - 1)).distinct
    val rows = ns.toDF("n")
      .select(col("n"),
        graft.operators.NaiveBayes.lg64(col("n")).as("fast"),
        graft.operators.NaiveBayes.lg64Chain(col("n")).as("chain"))
      .as[(Long, Long, Long)].collect()
    rows.foreach { case (n, fast, chain) =>
      assert(fast === chain, s"Lg64Expr != chain at n=$n")
    }
    assert(rows.length === ns.length)
  }

  test("lg64Long: monotone and within ~1 unit of 64*log2 across magnitudes") {
    val ns = (1L to 2048L) ++ (0 to 48).map(1L << _) ++
      (1 to 200).map(i => i * 997003L)
    var prev = -1L
    ns.sorted.foreach { n =>
      val v = graft.operators.NaiveBayes.lg64Long(n)
      assert(v >= prev, s"not monotone at n=$n")
      val exact = 64.0 * math.log(n.toDouble) / math.log(2.0)
      assert(math.abs(v - exact) <= 1.5, s"off at n=$n: $v vs $exact")
      prev = v
    }
  }

  test("sqlLg64Chain: internal aliases cannot be shadowed by keep columns") {
    // regression for the q_kl_source incident: a keep column named `n`
    // silently shadowed the chain's internal alias and collapsed every
    // chained lg64 to the same value in DuckDB. All internal columns
    // are now outCte-prefixed, so hostile keep names are inert.
    val hostile = Seq("n", "e0", "m0", "f1", "m1", "f2", "m2", "key")
    val sql = NaiveBayes.sqlLg64Chain("src", "key", hostile, "lgx", "lgv")
    // every alias the chain introduces must carry the lgx_ prefix
    val aliases = "AS\\s+([A-Za-z0-9_]+)".r.findAllMatchIn(sql)
      .map(_.group(1)).toSeq
    val introduced = aliases
      .filterNot(Set("lgv", "BIGINT")) // BIGINT = the CAST target type
    assert(introduced.nonEmpty)
    introduced.foreach { a =>
      assert(a.startsWith("lgx_"), s"unprefixed internal alias: $a")
    }
    // keep columns ride through every stage untouched
    hostile.foreach { k =>
      assert(!sql.matches(s"(?s).*AS\\s+$k\\b.*"),
        s"chain re-aliases keep column $k")
    }
  }
}
