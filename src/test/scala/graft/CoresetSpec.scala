package graft

import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** In-JVM re-derivation of the greedy k-center traversal. */
class CoresetSpec extends SparkSpec {

  test("q_coreset replays a direct Scala farthest-point traversal") {
    val out = TextQueries.qCoreset.run(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("dist")))

    val pts = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect().map { r =>
        r.getLong(0) -> r.getSeq[Float](1)
          .map(x => math.floor(x.toDouble * 1000000).toLong).toArray
      }.sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

    var sel = Vector((pts.head._1, 0L))
    var md = pts.map { case (id, v) => id -> d2(v, pts.head._2) }.toMap
    while (sel.size < 8) {
      val cand = pts.filterNot(p => sel.exists(_._1 == p._1))
        .map { case (id, _) => (id, md(id)) }
      val (nid, nd) = cand.minBy { case (id, dist) => (-dist, id) }
      sel = sel :+ ((nid, nd))
      val nv = pts.find(_._1 == nid).get._2
      md = pts.map { case (id, v) =>
        id -> math.min(md(id), d2(v, nv))
      }.toMap
    }
    val expected = sel.zipWithIndex.map { case ((id, dist), i) =>
      (i + 1L, id, dist)
    }
    assert(out.toSeq === expected)
    // farthest-point property: selection distances are non-increasing
    expected.map(_._3).drop(1).sliding(2).foreach {
      case Seq(a, b) => assert(a >= b)
      case _ => ()
    }
  }

  test("kCenterBatched: bit-identical trajectory to kCenter in strictly " +
      "fewer barriers") {
    val emb = Tables.embeddings(spark, sfDir)
    val seq = graft.operators.Coreset.kCenter(emb, "vec_id", "embedding",
      k = 8).collect().map(_.toString).toSeq
    for (m <- Seq(1, 2, 4, 8)) {
      val (df, rounds) = graft.operators.Coreset.kCenterBatchedTrajectory(
        emb, "vec_id", "embedding", k = 8, m = m)
      assert(df.collect().map(_.toString).toSeq === seq,
        s"batched m=$m diverged from the sequential trajectory")
      // the lazy guard must actually save barriers once m > 1 (m=1 is
      // the sequential algorithm and serves as the degenerate check)
      if (m == 1) assert(rounds == 7)
      else assert(rounds < 7, s"m=$m used $rounds rounds — no batching")
    }
  }

  test("q_mmr replays a direct Scala greedy MMR over the rerank pool") {
    val out = TextQueries.qMmr.run(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("rel"), r.getAs[Long]("score")))

    val pts = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect().map { r =>
        r.getLong(0) -> r.getSeq[Float](1)
          .map(x => math.floor(x.toDouble * 1000000).toLong).toArray
      }.sortBy(_._1)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val qv = pts.find(_._1 == 0L).get._2
    val pool = pts.map { case (id, v) => (id, v, dot(v, qv)) }
      .sortBy { case (id, _, rel) => (-rel, id) }.take(100)

    var sel = Vector((pool.head._1, pool.head._2, pool.head._3,
      7L * pool.head._3))
    while (sel.size < 8) {
      val next = pool.filterNot(p => sel.exists(_._1 == p._1))
        .map { case (id, v, rel) =>
          val ms = sel.map(s => dot(v, s._2)).max
          (id, v, rel, 7L * rel - 3L * ms)
        }.minBy { case (id, _, _, s) => (-s, id) }
      sel = sel :+ next
    }
    val expected = sel.zipWithIndex.map { case ((id, _, rel, s), i) =>
      (i + 1L, id, rel, s)
    }
    assert(out.toSeq === expected)
    // diversity: MMR must not simply return the top-8 by relevance
    val top8 = pool.take(8).map(_._1).toSet
    assert(out.map(_._2).toSet !== top8,
      "MMR selection should diverge from pure relevance ranking")
  }

  test("q_contrastive_pairs: negative is the true integer-dot argmax") {
    val out = TextQueries.qContrastivePairs.run(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("anchor"),
        r.getAs[Long]("positive"), r.getAs[Long]("negative"),
        r.getAs[Long]("neg_dot")))
    assert(out.nonEmpty, "expected at least one near-dup training pair")

    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect().map { r =>
        r.getLong(0) -> r.getSeq[Float](1)
          .map(x => math.floor(x.toDouble * 1000000).toLong).toArray
      }.toMap
    out.foreach { case (a, p, n, d) =>
      assert(n != a && n != p)
      val av = vecs(a)
      val best = vecs.view.filterKeys(id => id != a && id != p)
        .map { case (id, v) =>
          (id, v.zip(av).map { case (x, y) => x * y }.sum)
        }.toSeq.sortBy { case (id, dot) => (-dot, id) }.head
      assert((n, d) === best, s"pair ($a, $p)")
    }
  }

  test("negativeSamples: draws follow unigram^0.75, layout-stable, " +
      "k per instance") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // skewed corpus: 'the' dominates; negatives must see it most, but
    // sub-proportionally (3/4 power), and rare words must still appear
    val docs = (0L until 60L).map { i =>
      (i, ("the the the the common word" +
        (if (i % 3 == 0) s" rare$i" else "")))
    }.toDF("doc_id", "text")
    val out = graft.operators.Contrastive
      .negativeSamples(docs, "doc_id", "text", k = 4)
      .as[(Long, Long, String, Long, String)].collect()
    val nInst = docs.select(explode(split(trim(col("text")), "\\s+")))
      .count()
    assert(out.length === nInst * 4) // k draws per token instance
    val freq = out.groupBy(_._5).view.mapValues(_.size).toMap
    // weights: the c=240 ⇒ w=61; common/word c=60 ⇒ w=21; rare c=1 ⇒ 1
    assert(freq("the") > freq("common"))
    // 3/4-power compression: the/common draw ratio ≈ 61/21 ≈ 2.9, far
    // below the raw count ratio 4.0 with margin at these sample sizes
    val ratio = freq("the").toDouble / freq("common")
    assert(ratio > 1.8 && ratio < 3.9, s"ratio $ratio")
    // md5 determinism: identical table on a different partitioning
    val out7 = graft.operators.Contrastive
      .negativeSamples(docs.repartition(7), "doc_id", "text", k = 4)
      .as[(Long, Long, String, Long, String)].collect()
    assert(out7.sortBy(r => (r._1, r._2, r._4)).toSeq ===
      out.sortBy(r => (r._1, r._2, r._4)).toSeq)
  }
}
