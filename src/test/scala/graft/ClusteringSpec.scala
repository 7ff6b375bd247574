package graft

import graft.operators.Clustering
import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** In-JVM re-derivation of the exact Lloyd trajectory. */
class ClusteringSpec extends SparkSpec {

  private def qpts: Array[(Long, Array[Long])] =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect().map { r =>
        r.getLong(0) -> r.getSeq[Float](1)
          .map(x => math.floor(x.toDouble * 1000000).toLong).toArray
      }.sortBy(_._1)

  private def d2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  /** Direct Scala Lloyd replay: argmin with smallest-label ties,
    * integer floor-mean updates, empty clusters dropped. */
  private def replay(pts: Array[(Long, Array[Long])], k: Int, iters: Int)
      : Seq[(Int, Array[Long])] = {
    var centers: Seq[(Int, Array[Long])] =
      pts.take(k).zipWithIndex.map { case ((_, v), i) => (i, v) }.toSeq
    for (_ <- 1 to iters) {
      val byCluster = pts.groupBy { case (_, v) =>
        centers.minBy { case (lbl, c) => (d2(v, c), lbl) }._1
      }
      centers = byCluster.toSeq.sortBy(_._1).map { case (lbl, members) =>
        val dim = members.head._2.length
        val c = Array.tabulate(dim) { j =>
          Math.floorDiv(members.map(_._2(j)).sum, members.length.toLong)
        }
        (lbl, c)
      }
    }
    centers
  }

  test("train replays a direct Scala Lloyd trajectory") {
    val pts = qpts
    val got = Clustering.train(Tables.embeddings(spark, sfDir),
      "vec_id", "embedding", k = 8, iters = 3)
    val want = replay(pts, k = 8, iters = 3)
    assert(got.map(_._1) === want.map(_._1))
    got.zip(want).foreach { case ((gl, gv), (wl, wv)) =>
      assert(gl === wl)
      assert(gv.toArray === wv)
    }
  }

  test("q_kmeans summary is consistent with the replayed assignment") {
    val pts = qpts
    val centers = replay(pts, k = 8, iters = 3)
    val assign = pts.map { case (id, v) =>
      val (lbl, c) = centers.minBy { case (lbl, c) => (d2(v, c), lbl) }
      (id, lbl, d2(v, c))
    }
    val want = assign.groupBy(_._2).toSeq.sortBy(_._1).map {
      case (lbl, rows) =>
        (lbl.toLong, rows.length.toLong, rows.map(_._3).sum,
          centers.find(_._1 == lbl).get._2.sum)
    }
    val got = TextQueries.qKmeans.run(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === want)
    assert(got.map(_._2).sum === pts.length.toLong)
  }

  test("semDedup finds every planted duplicate pair with |q|^2 dot") {
    val out = TextQueries.qSemDedup.run(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val plantedIds = qpts.map(_._1).filter(_ % 20 == 0)
    val qv = qpts.toMap
    plantedIds.foreach { id =>
      val hit = out.find(p => p._1 == id && p._2 == id + 100000L)
      assert(hit.isDefined, s"planted pair for $id missing")
      val n2 = qv(id).map(x => x * x).sum
      assert(hit.get._3 === n2)
    }
  }

  test("clusterTerms labels each cluster with its own vocabulary") {
    import spark.implicits._
    // two tight clusters in 2-D; cluster vocabularies are disjoint
    // except the shared word "the" (cdf discount must push it down)
    val emb = (Seq((0L, Seq(0.0f, 0.0f)), (1L, Seq(0.0f, 0.1f)),
      (2L, Seq(1.0f, 1.0f)), (3L, Seq(1.0f, 0.9f))))
      .toDF("vec_id", "embedding")
    val docs = Seq(
      (0L, "the cat cat sat"), (1L, "the cat purred"),
      (2L, "the dog dog ran"), (3L, "the dog barked"))
      .toDF("doc_id", "text")
    val out = graft.operators.Clustering.clusterTerms(
      emb, "vec_id", "embedding", docs, "doc_id", "text",
      k = 2, iters = 2, topN = 1)
      .select("cluster", "term").as[(Long, String)].collect().toMap
    assert(out.values.toSet === Set("cat", "dog"))
  }

  test("silhouetteSummary replays the per-point (a, b) distances") {
    val pts = qpts
    val centers = replay(pts, k = 8, iters = 3)
    val want = pts.map { case (_, v) =>
      val ds = centers.map { case (lbl, c) => (d2(v, c), lbl) }.sorted
      val (da, own) = ds.head
      val db = ds(1)._1
      val s = if (math.max(da, db) == 0L) 0L
      else ((db - da) * 1000L) / math.max(da, db) // non-negative: floor=trunc
      (own, s)
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (lbl, rows) =>
      val ss = rows.map(_._2)
      (lbl.toLong, rows.length.toLong, ss.sum / ss.length,
        ss.min, ss.max)
    }
    val got = TextQueries.qSilhouette.run(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === want)
    // simplified silhouette is in [0, 1000] by construction (b >= a)
    assert(got.forall(r => r._4 >= 0L && r._5 <= 1000L))
  }

  test("silhouette separates tight clusters from a straddler") {
    import spark.implicits._
    // two tight 1-D clusters plus one point midway: the straddler's
    // (b-a)/max(a,b) is small, the tight members' is ~1000
    val df = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(0.01f, 0.0f)),
      (2L, Seq(1.0f, 0.0f)), (3L, Seq(0.99f, 0.0f)),
      (4L, Seq(0.52f, 0.0f))).toDF("vec_id", "embedding")
    val out = Clustering.silhouetteSummary(df, "vec_id", "embedding",
      k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // straddler 4 joins cluster 1 (closer to 0.52: the {1.0,0.99,...}
    // centroid after updates) and drags its mean below cluster 0's
    assert(out(0L) > 900L)
    assert(out(1L) < out(0L))
  }

  test("floor-mean centroid update is exact on negative sums") {
    // power-of-two coordinates quantize exactly; cluster 0's x sum is
    // -1250000 over 3 members — floor gives -416667, truncation -416666
    import spark.implicits._
    val df = Seq(
      (0L, Seq(-0.25f, 0.0f)),
      (1L, Seq(1.0f, 1.0f)),
      (2L, Seq(-0.5f, 0.0f)),
      (3L, Seq(-0.5f, 0.0f))
    ).toDF("vec_id", "embedding")
    val centers = Clustering.train(df, "vec_id", "embedding",
      k = 2, iters = 1)
    // seeds: c0 = vec 0 (-250000,0), c1 = vec 1 (1e6,1e6); vecs 2,3
    // join c0, so cluster 0 = {0,2,3}, cluster 1 = {1}
    assert(centers.find(_._1 == 0).get._2 === Seq(-416667L, 0L))
    assert(centers.find(_._1 == 1).get._2 === Seq(1000000L, 1000000L))
  }

  test("gridDbscan matches a union-find oracle over cells") {
    val out = TextQueries.qDbscanGrid.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val raw = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect().map { r =>
        val v = r.getSeq[Float](1)
        (math.floor(v(0).toDouble * 32).toLong,
          math.floor(v(1).toDouble * 32).toLong)
      }
    val cellN = raw.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def pack(c: (Long, Long)) =
      (c._1 + 1048576L) * 2097152L + (c._2 + 1048576L)
    val core = cellN.filter(_._2 >= 3L).keys.toSeq
    // union-find over 8-adjacency
    val parent = scala.collection.mutable.Map(
      core.map(c => c -> c): _*)
    def find(c: (Long, Long)): (Long, Long) =
      if (parent(c) == c) c
      else { val r = find(parent(c)); parent(c) = r; r }
    for (a <- core; dx <- -1L to 1L; dy <- -1L to 1L) {
      val b = (a._1 + dx, a._2 + dy)
      if (parent.contains(b)) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(if (pack(ra) < pack(rb)) rb else ra) =
          if (pack(ra) < pack(rb)) ra else rb
      }
    }
    val expClusters = core.groupBy(c => pack(find(c))).map {
      case (lbl, cs) => (lbl, cs.size.toLong, cs.map(cellN).sum) }.toSeq
    val noiseCells = cellN.filter(_._2 < 3L)
    val expected = (expClusters :+
      ((-1L, noiseCells.size.toLong, noiseCells.values.sum)))
      .sortBy(t => (-t._3, t._1))
    assert(out.toSeq === expected)
    // non-vacuity: at least 2 clusters and a non-empty noise class
    assert(expClusters.size >= 2 && noiseCells.nonEmpty)
  }

  test("gridDbscan: a coordinate outside the 2^20 cell range fails " +
      "loudly instead of silently colliding packed cell ids") {
    import spark.implicits._
    val bad = Seq(
      (1L, Seq(0.5f, 0.5f)),
      (2L, Seq(40000.0f, 0.1f))) // 40000*32 > 2^20
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Clustering.gridDbscan(bad, "vec_id", "embedding",
        scale = 32, minPts = 1).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).toSeq.flatMap(chain)
    assert(chain(ex).exists(t =>
      Option(t.getMessage).exists(_.contains("cell-id packing"))), ex)
    // in-range data still clusters (the guard keeps every valid row)
    val ok = Clustering.gridDbscan(
      Seq((1L, Seq(0.5f, 0.5f)), (2L, Seq(0.51f, 0.5f)))
        .toDF("vec_id", "embedding"), "vec_id", "embedding",
      scale = 32, minPts = 1).collect()
    assert(ok.nonEmpty)
  }
}
