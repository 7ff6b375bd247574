package graft

import graft.operators.{Funnel, Index}
import org.apache.spark.sql.functions._

class IndexFunnelSpec extends SparkSpec {
  import spark.implicits._

  // --- inverted index -----------------------------------------------------

  test("invertedIndex: df/cf/postings on a known corpus") {
    val docs = Seq(
      (1L, "a b a c"),
      (2L, "a b"),
      (3L, "c c c"),
      (4L, "a")).toDF("doc_id", "text")
    val idx = Index.invertedIndex(docs, "doc_id", "text",
      minDf = 2L, maxPostings = 20)
      .orderBy("term").as[(String, Long, Long, String)].collect()
    assert(idx === Seq(
      ("a", 3L, 4L, "1:2,2:1,4:1"),
      ("b", 2L, 2L, "1:1,2:1"),
      ("c", 2L, 4L, "1:1,3:3")))
  }

  test("invertedIndex: posting cap keeps the smallest doc ids") {
    val docs = (1L to 50L).map(i => (i, "x")).toDF("doc_id", "text")
    val idx = Index.invertedIndex(docs, "doc_id", "text",
      minDf = 2L, maxPostings = 5)
      .as[(String, Long, Long, String)].collect()
    assert(idx.length === 1)
    val (_, df, cf, postings) = idx.head
    assert(df === 50L && cf === 50L)
    assert(postings === "1:1,2:1,3:1,4:1,5:1") // capped, doc-id order
  }

  test("invertedIndex: minDf prunes hapax terms") {
    val docs = Seq((1L, "common rare1"), (2L, "common rare2"))
      .toDF("doc_id", "text")
    val terms = Index.invertedIndex(docs, "doc_id", "text",
      minDf = 2L, maxPostings = 20)
      .select("term").as[String].collect()
    assert(terms === Array("common"))
  }

  test("keywordSearch: exact integer scores, multi-term sum, rank order") {
    // N=4 docs; df(join)=2 -> w=2_000_000; df(scan)=1 -> w=4_000_000
    val docs = Seq(
      (1L, "join join scan"), (2L, "join"), (3L, "other"), (4L, "x y"))
      .toDF("doc_id", "text")
    val out = Index.keywordSearch(docs, "doc_id", "text",
      Seq("join", "scan"), k = 10)
      .select(col("rank"), col("doc_id"), col("score").cast("long"))
      .as[(Long, Long, Long)].collect()
    // doc 1: 2*2M + 1*4M = 8M; doc 2: 1*2M = 2M; docs 3,4 unmatched
    assert(out === Seq((1L, 1L, 8000000L), (2L, 2L, 2000000L)))
  }

  test("bm25Search: tf saturates and length normalization demotes long docs") {
    // doc 1 and doc 2 both contain "join" once, but doc 2 is 10x longer:
    // length normalization must rank doc 1 first. Doc 3 has tf=8 on the
    // same length as doc 1: saturation keeps its score below 8x doc 1's.
    val docs = Seq(
      (1L, "join a b c d e f g"),
      (2L, ("join " + Seq.fill(79)("z").mkString(" "))),
      (3L, "join join join join join join join join"))
      .toDF("doc_id", "text")
    val out = Index.bm25Search(docs, "doc_id", "text", Seq("join"), k = 10)
      .as[(Long, Long, Long)].collect()
    assert(out.map(_._2).toSeq === Seq(3L, 1L, 2L)) // tf wins, then length
    val score = out.map(r => r._2 -> r._3).toMap
    assert(score(1L) > score(2L))          // same tf, shorter doc scores higher
    assert(score(3L) < 8L * score(1L))     // saturation: sublinear in tf
    assert(score(3L) > score(1L))
    // exact integer replay of the cleared-fraction form for doc 1:
    // N=3, T=8+80+8=96, df=3 -> idf=1_000_000; tf=1, dl=8
    // D = 20*1*96 + 6*96 + 18*8*3 = 1920+576+432 = 2928
    // contrib = 1_000_000 * ((44*1*96*1000) div 2928) = 1_000_000 * 1442
    assert(score(1L) === 1000000L * ((44L * 96L * 1000L) / 2928L))
  }

  // --- collocations -------------------------------------------------------

  test("collocations: lift ranks the exclusive pair first") {
    // "x y" always adjacent and exclusive; "a b" adjacent but a,b frequent
    val docs = Seq.tabulate(6)(i =>
      (i.toLong, "x y a b a c b c a b")).toDF("doc_id", "text")
    val out = Index.collocations(docs, "text", minCount = 5L, k = 10)
      .as[(Long, String, String, Long, Long, Long, Double)].collect()
    assert(out.head._2 === "x" && out.head._3 === "y")
    // exact lift: c_ab=6, c_a=6, c_b=6 -> 6/36
    assert(out.head._7 === 6.0 / 36.0)
    // ranks dense 1..n, lifts non-increasing
    assert(out.map(_._1).toSeq === (1L to out.length))
    assert(out.sliding(2).forall(p =>
      p.length < 2 || p(0)._7 >= p(1)._7))
  }

  test("collocations: minCount drops rare pairs") {
    val docs = Seq((1L, "p q"), (2L, "p q"), (3L, "r s"))
      .toDF("doc_id", "text")
    val pairs = Index.collocations(docs, "text", minCount = 2L, k = 10)
      .select("t1", "t2").as[(String, String)].collect()
    assert(pairs === Array(("p", "q")))
  }

  // --- funnel -------------------------------------------------------------

  private def ev(rows: (Long, Long, String, Long)*) =
    rows.toDF("user_id", "tsec", "event_type", "event_id")
      .select(col("user_id"), timestamp_seconds(col("tsec")).as("ts"),
        col("event_type"), col("event_id"))

  test("funnelSteps: order matters — step events before step-1 don't count") {
    val events = ev(
      // user 1: full in-order funnel
      (1L, 10L, "signup", 1L), (1L, 20L, "view", 2L),
      (1L, 30L, "purchase", 3L),
      // user 2: purchase BEFORE view -> reaches step 2 only
      (2L, 10L, "signup", 4L), (2L, 15L, "purchase", 5L),
      (2L, 20L, "view", 6L),
      // user 3: no signup -> reaches nothing
      (3L, 10L, "view", 7L), (3L, 20L, "purchase", 8L))
    val out = Funnel.funnelSteps(events, "user_id", "ts", "event_type",
      "event_id", Seq("signup", "view", "purchase"))
      .as[(Long, String, Long)].collect()
    assert(out === Seq(
      (1L, "signup", 2L), (2L, "view", 2L), (3L, "purchase", 1L)))
  }

  test("funnelSteps: equal timestamps resolve by event id") {
    // signup and view at the SAME ts: view's event_id is higher, so the
    // running min at the view row already sees the signup -> counts
    val ordered = ev((1L, 10L, "signup", 1L), (1L, 10L, "view", 2L))
    val o = Funnel.funnelSteps(ordered, "user_id", "ts", "event_type",
      "event_id", Seq("signup", "view")).as[(Long, String, Long)].collect()
    assert(o === Seq((1L, "signup", 1L), (2L, "view", 1L)))
    // reversed ids: view sorts BEFORE the signup -> step 2 not reached
    val reversed = ev((1L, 10L, "signup", 2L), (1L, 10L, "view", 1L))
    val r = Funnel.funnelSteps(reversed, "user_id", "ts", "event_type",
      "event_id", Seq("signup", "view")).as[(Long, String, Long)].collect()
    assert(r === Seq((1L, "signup", 1L), (2L, "view", 0L)))
  }

  test("funnelSteps: maxGapUs bounds the step window") {
    // view 2h after signup: inside a 3h gap, outside a 1h gap
    val events = ev(
      (1L, 0L, "signup", 1L), (1L, 7200L, "view", 2L),
      (2L, 0L, "signup", 3L), (2L, 1800L, "view", 4L))
    def counts(gap: Option[Long]) =
      Funnel.funnelSteps(events, "user_id", "ts", "event_type", "event_id",
        Seq("signup", "view"), gap)
        .as[(Long, String, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(counts(None) === Map(1L -> 2L, 2L -> 2L))
    assert(counts(Some(3L * 3600 * 1000000L)) === Map(1L -> 2L, 2L -> 2L))
    assert(counts(Some(1L * 3600 * 1000000L)) === Map(1L -> 2L, 2L -> 1L))
  }

  test("transitionMatrix: counts and conditional probabilities on a toy stream") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    // user 1: a→b→a ; user 2: a→b  ⇒ from a: b×2 (p=1.0); from b: a×1 (p=1.0)
    val df = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "a"),
      (1L, t("2024-01-01 10:01:00"), 2L, "b"),
      (1L, t("2024-01-01 10:02:00"), 3L, "a"),
      (2L, t("2024-01-01 10:00:00"), 4L, "a"),
      (2L, t("2024-01-01 10:01:00"), 5L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Funnel.transitionMatrix(df, "user_id", "ts", "event_id",
        "event_type")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out === Seq(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("transitionMatrix: no cross-user transitions; ties break on event id") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "x"),
      (2L, t("2024-01-01 10:00:01"), 2L, "y"), // different user — no x→y
      (3L, t("2024-01-01 10:00:00"), 3L, "p"), // same ts as next row:
      (3L, t("2024-01-01 10:00:00"), 4L, "q")) // id order ⇒ p→q, never q→p
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Funnel.transitionMatrix(df, "user_id", "ts", "event_id",
        "event_type")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out === Seq(("p", "q", 1L, 1.0)))
  }

  test("frequentSequences: trigram counts respect user boundaries and rank order") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    // user 1: a b c a b c  → trigrams abc, bca, cab, abc
    // user 2: a b c        → abc
    val rows = Seq("a", "b", "c", "a", "b", "c").zipWithIndex.map {
      case (e, i) => (1L, t(f"2024-01-01 10:0$i%d:00"), i.toLong, e)
    } ++ Seq("a", "b", "c").zipWithIndex.map {
      case (e, i) => (2L, t(f"2024-01-01 10:0$i%d:00"), (10 + i).toLong, e)
    }
    val out = graft.operators.Funnel.frequentSequences(
        rows.toDF("user_id", "ts", "event_id", "event_type"),
        "user_id", "ts", "event_id", "event_type", k = 10)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(out.head === ((1L, "a", "b", "c", 3L)))
    assert(out.map(_._5) === out.map(_._5).sorted.reverse) // n descending
    assert(out.map(_._1) === (1L to out.length.toLong))    // dense ranks
    assert(out.map(r => (r._2, r._3, r._4)).toSet ===
      Set(("a", "b", "c"), ("b", "c", "a"), ("c", "a", "b")))
  }

  test("funnelSteps: counts are non-increasing on real data") {
    val out = Funnel.funnelSteps(Tables.events(spark, sfDir), "user_id",
      "ts", "event_type", "event_id", Seq("signup", "view", "purchase"))
      .as[(Long, String, Long)].collect()
    assert(out.length === 3)
    assert(out.sliding(2).forall(p => p.length < 2 || p(0)._3 >= p(1)._3))
    assert(out.head._3 > 0)
  }

  test("typoPairs: distance-1 recall across sub/ins/del, distance-2 out") {
    import graft.operators.Index
    val docs = Seq(
      "table table", "tab1e tab1e",  // substitution pair
      "chair chair", "chairs chairs", // insertion pair
      "couch couch", "cauch cooch")   // distance-1 each to couch; but
      // cauch↔cooch is distance 2 — must NOT pair with each other
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = Index.typoPairs(docs, "text", minCount = 1L, minLen = 4)
      .select("term_a", "term_b").as[(String, String)].collect().toSet
    assert(out === Set(
      ("tab1e", "table"), ("chair", "chairs"),
      ("cauch", "couch"), ("cooch", "couch")))
  }

  test("sparseCosineTopK: identical docs score cos 1.0, disjoint absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta"), (4L, "unrelated words here")
    ).toDF("doc_id", "text")
    val out = graft.operators.Index.sparseCosineTopK(
      docs, "doc_id", "text", maxDf = 10L, k = 10)
      .select("id_a", "id_b", "cos")
      .as[(Long, Long, Double)].collect().toSeq
    // only 1-2 share any token (all tokens are rare enough to keep)
    assert(out.map(p => (p._1, p._2)) === Seq((1L, 2L)))
    assert(out.head._3 === 1.0) // identical weight vectors
  }

  test("sparseCosineTopK: df cap drops the ubiquitous token") {
    import spark.implicits._
    // "the" appears in all 3 docs; with maxDf=2 it cannot pair anyone
    val docs = Seq((1L, "the cat"), (2L, "the dog"), (3L, "the bird"))
      .toDF("doc_id", "text")
    val out = graft.operators.Index.sparseCosineTopK(
      docs, "doc_id", "text", maxDf = 2L, k = 10).collect()
    assert(out.isEmpty)
  }
}
