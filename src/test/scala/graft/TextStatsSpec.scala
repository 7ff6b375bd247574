package graft

import graft.functions.{TextFeatures, TextStatsExpr}
import org.apache.spark.sql.functions._

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("lmSurprisal: hand-computed integer log2 scores; dominant walk scores zero") {
    // corpus bigram counts: (a,b)=5, (b,a)=4, (a,c)=1; contexts a=6, b=4.
    // ilog2: 6→2, 5→2, 4→2, 1→0. surp(a,b)=0, surp(b,a)=0, surp(a,c)=2.
    val docs = Seq(
      (1L, "a b a b a c"),   // one rare transition → total 2, milli 400
      (2L, "a b a b a b"))   // only dominant transitions → 0
      .toDF("doc_id", "text")
    val out = graft.operators.Salience.lmSurprisal(docs, "doc_id", "text", 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 5L, 2L, 400L), (2L, 5L, 0L, 0L)))
  }

  test("UnigramViterbi: deterministic DP — tie-breaks, coverage, fallback") {
    import graft.functions.UnigramViterbi
    def seg(w: String, costs: Map[String, Int], L: Int = 6): Seq[String] =
      Seq(Tuple1(w)).toDF("w")
        .select(UnigramViterbi.segment($"w", costs, L)).head().getSeq[String](0)
    // equal cost, fewer pieces wins: "ab"(1) vs "a"(1)+"b"(0)
    assert(seg("ab", Map("ab" -> 1, "a" -> 1, "b" -> 0)) === Seq("ab"))
    // cheaper multi-piece path beats the single expensive piece
    assert(seg("ab", Map("ab" -> 5, "a" -> 1, "b" -> 1)) === Seq("a", "b"))
    // segmentation always concatenates back to the word
    val costs = Map("a" -> 3, "b" -> 3, "ab" -> 2, "ba" -> 1, "aba" -> 4)
    assert(seg("ababab", costs).mkString === "ababab")
    // per-char fallback when a char is uncovered
    assert(seg("axb", Map("a" -> 1, "b" -> 1)) === Seq("a", "x", "b"))
    // maxLen bounds candidate pieces
    assert(seg("aaaa", Map("aaaa" -> 0, "a" -> 1), L = 2) ===
      Seq("a", "a", "a", "a"))
  }

  test("fused stats match the compositional Catalyst formulations") {
    val docs = Tables.documents(spark, sfDir)
    val both = docs.select(
      TextStatsExpr.textStats(col("text")).as("st"),
      TextFeatures.tokenCount(col("text")).cast("long").as("n_tokens_ref"),
      length(col("text")).cast("long").as("n_chars_ref"),
      TextFeatures.punctRatio(col("text")).as("punct_ref"),
      TextFeatures.stopwordRatio(col("text"), TextFeatures.enStopwords)
        .as("stop_en_ref"))
    val bad = both.filter(
      col("st.n_tokens") =!= col("n_tokens_ref") ||
      col("st.n_chars") =!= col("n_chars_ref") ||
      (when(col("st.n_chars") > 0,
        col("st.n_punct").cast("double") / col("st.n_chars").cast("double"))
        .otherwise(0.0) =!= col("punct_ref")) ||
      (when(col("st.n_tokens") > 0,
        col("st.stop_en").cast("double") / col("st.n_tokens").cast("double"))
        .otherwise(0.0) =!= col("stop_en_ref")))
    assert(bad.count() === 0)
  }

  test("langIdFast agrees with langId on the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val disagree = docs.select(
      TextFeatures.langId(col("text")).as("slow"),
      TextFeatures.langIdFast(col("text")).as("fast"))
      .filter(col("slow") =!= col("fast")).count()
    assert(disagree === 0)
  }

  test("edge cases: empty, whitespace-only, punctuation-only") {
    val rows = Seq("", "   ", "!!! ??? ...", "the la der el", "the der")
      .toDF("t")
      .select(TextStatsExpr.textStats(col("t")).as("st"),
        TextFeatures.langIdFast(col("t")).as("lang"))
      .select("st.n_tokens", "st.n_punct", "lang")
      .collect()
    assert(rows(0).getLong(0) === 0 && rows(0).getString(2) === "und")
    assert(rows(1).getLong(0) === 0)
    assert(rows(2).getLong(1) === 9)
    assert(rows(3).getString(2) === "es") // la+el both score Spanish (2 hits)
    assert(rows(4).getString(2) === "en") // en/de tie broken by priority
  }

  test("bpeishTokenCount splits letter/digit runs and counts punctuation") {
    val counts = Seq(
      "hello world",      // 2
      "don't stop me",    // don + ' + t + stop + me = 5
      "abc123 def",       // abc + 123 + def = 3
      "")                 // 0
      .toDF("t")
      .select(TextFeatures.bpeishTokenCount(col("t"))).as[Int].collect().toSeq
    assert(counts === Seq(2, 5, 3, 0))
  }

  test("rest-fixtures short name resolves via DataSourceRegister") {
    val df = spark.read.format("rest-fixtures")
      .option("leagues", "39").option("days", "2").load()
    assert(df.count() === 20)
  }

  test("readability: hand-computed Flesch on a toy doc; empty doc dropped") {
    val docs = Seq(
      (1L, "The cat sat. The dog ran!"),  // 6 words, 2 sentences
      (2L, "   "))                        // no words → dropped
      .toDF("doc_id", "text")
    val out = graft.operators.Salience.readability(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out.map(_._1) === Seq(1L))
    val (_, words, sentences, syllables, flesch) = out.head
    assert(words === 6L)
    assert(sentences === 2L)
    // vowel groups: e,a,a,e,o,a = 6 ("The"→e, "cat"→a, "sat"→a,
    // "The"→e, "dog"→o, "ran"→a)
    assert(syllables === 6L)
    assert(flesch === 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (6.0 / 6.0))
  }

  test("rakePhrases: hand-worked degree/freq scoring") {
    import spark.implicits._
    // doc: "deep learning of deep models" (stopword "of" splits runs)
    // phrases: "deep learning" (len 2), "deep models" (len 2)
    // freq(deep)=2 deg(deep)=4 score=2000; learning/models: freq 1,
    // deg 2, score 2000 — both phrases score 4000; ties alphabetical
    val docs = Seq((1L, "Deep learning of deep models."))
      .toDF("doc_id", "text")
    val out = graft.operators.Salience.rakePhrases(docs, "doc_id", "text",
      graft.functions.TextFeatures.enStopwords, maxPhraseLen = 4, k = 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("deep learning", 2L, 1L, 4000L),
      ("deep models", 2L, 1L, 4000L)))
  }

  test("rakePhrases: the length cap drops runaway runs, repeats merge") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"), // 5-word run: dropped
      (2L, "fast cars and fast cars")).toDF("doc_id", "text")
    val out = graft.operators.Salience.rakePhrases(docs, "doc_id", "text",
      graft.functions.TextFeatures.enStopwords, maxPhraseLen = 4, k = 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    // only "fast cars" survives, twice, merged to one row with n=2
    assert(out === Seq(("fast cars", 2L, 2L, 4000L)))
  }
}
