package graft

import graft.operators.{Ann, IvfModel}
import org.apache.spark.sql.functions._

/** The exact-arithmetic candidate-set generators behind q_ann_lsh_cand /
  * q_ann_ivf_cand (set membership is oracle-gated; these pin the structural
  * invariants the oracle can't see). */
class AnnCandidatesSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.embeddings(spark, sfDir)
  private def queries = emb.filter(col("vec_id") < 5)

  test("LSH exact candidates: every query finds itself (identical sig in every table)") {
    val cands = Ann.lshCandidatesExact(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding",
        dim = 64, nPlanes = 8, multiProbeBits = 4, nTables = 4)
      .as[(Long, Long)].collect().toSet
    (0L until 5L).foreach { q =>
      assert(cands.contains((q, q)), s"query $q missing its own id")
    }
    info(s"candidate pairs: ${cands.size}")
  }

  test("LSH exact candidates agree with the fast-double path away from rounding boundaries") {
    // The two variants differ only in summation arithmetic; a membership
    // difference requires a projection within double-rounding distance of a
    // hyperplane. Pin substantial overlap, not equality.
    val exact = Ann.lshCandidatesExact(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", 64, 8, 4, 4)
      .as[(Long, Long)].collect().toSet
    val fast = Ann.lshCandidates(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", 64, 8, 4, 4)
      .select(col("query_id"), col("id")).as[(Long, Long)].collect().toSet
    val overlap = exact.intersect(fast).size.toDouble /
      math.max(1, math.max(exact.size, fast.size))
    info(s"exact ${exact.size}, fast ${fast.size}, overlap $overlap")
    assert(overlap >= 0.9, s"overlap $overlap: paths diverged beyond rounding")
  }

  test("fused decimal expressions are bit-identical to the compositional Catalyst chain") {
    import graft.functions.DecimalDotsExact
    val planes = Ann.hyperplanes(64, 8, tableSeed = 3L)
    // dots: fused vs per-plane aggregate(zip_with(...)) decimal chain
    val mismatchDots = emb.select(
        DecimalDotsExact.dots(col("embedding"), planes).as("fused"),
        array(planes.map(p => Ann.dotExactDec(col("embedding"),
          typedLit(p))): _*).as("comp"))
      .filter(col("fused") =!= col("comp")).count()
    assert(mismatchDots === 0)
    // sigs: fused vs compositional sign-bit OR chain
    val compSig = planes.zipWithIndex.map { case (p, i) =>
      when(Ann.dotExactDec(col("embedding"), typedLit(p)) > 0, lit(1L << i))
        .otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    val mismatchSigs = emb.select(
        Ann.hyperplaneSigExact(col("embedding"), 64, 8, 3L).as("fused"),
        compSig.as("comp"))
      .filter(col("fused") =!= col("comp")).count()
    assert(mismatchSigs === 0)
    // argTopK: fused vs descending struct-sort of (dot, -index)
    val k = IvfModel.centroids.size
    val ranked = sort_array(array((0 until k).map(c =>
      struct(Ann.dotExactDec(col("embedding"),
          typedLit(IvfModel.centroids(c))).as("d"),
        lit(-c).as("nc"))): _*), asc = false)
    val mismatchTop = emb.select(
        DecimalDotsExact.argTopK(col("embedding"), IvfModel.centroids, 3).as("fused"),
        array((1 to 3).map(i =>
          -element_at(ranked, i).getField("nc")): _*).as("comp"))
      .filter(col("fused") =!= col("comp")).count()
    assert(mismatchTop === 0)
  }

  test("IVF exact candidates: total single assignment, self-hit, probe superset ordering") {
    val n = emb.count()
    val bucketed = emb.select(col("vec_id"),
      (-element_at(sort_array(array(IvfModel.centroids.indices.map(c =>
        struct(Ann.dotExactDec(col("embedding"),
            typedLit(IvfModel.centroids(c))).as("d"),
          lit(-c).as("nc"))): _*), asc = false), 1).getField("nc")).as("bucket"))
    // every vector lands in exactly one bucket, all buckets in range
    assert(bucketed.count() === n)
    val range = bucketed.agg(min("bucket"), max("bucket")).head()
    assert(range.getInt(0) >= 0 && range.getInt(1) < IvfModel.centroids.size)
    val cands1 = Ann.ivfCandidatesExact(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", IvfModel.centroids, nProbe = 1)
      .as[(Long, Long)].collect().toSet
    (0L until 5L).foreach { q =>
      assert(cands1.contains((q, q)), s"query $q not in its own bucket")
    }
    // more probes only ever widen the candidate set
    val cands4 = Ann.ivfCandidatesExact(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", IvfModel.centroids, nProbe = 4)
      .as[(Long, Long)].collect().toSet
    assert(cands1.subsetOf(cands4), "nProbe=1 set must be inside nProbe=4 set")
    info(s"nProbe=1: ${cands1.size}, nProbe=4: ${cands4.size}")
  }

  test("groupCentroids: partition-order independent, exact against driver-side fold") {
    val base = Ann.groupCentroids(emb, "label", "embedding")
      .orderBy("grp", "dim").collect()
    val shuffled = Ann.groupCentroids(emb.repartition(7, col("vec_id")), "label", "embedding")
      .orderBy("grp", "dim").collect()
    assert(base.sameElements(shuffled),
      "centroid bits changed under repartition — accumulation is order-dependent")
    // exact reference: fold the same dyadic integers on the driver
    val rows = emb.select(col("label"), col("embedding")).collect()
    val byLabel = rows.groupBy(_.getInt(0))
    val twoTo49 = 562949953421312.0
    val ref = byLabel.map { case (lbl, rs) =>
      val vecs = rs.map(_.getSeq[Float](1))
      val sums = Array.fill(vecs.head.size)(BigInt(0))
      vecs.foreach { v =>
        v.indices.foreach { i =>
          val scaled = v(i).toDouble * twoTo49
          assert(scaled == math.rint(scaled), "component below 2^-26: scaling not exact")
          sums(i) += BigInt(scaled.toLong)
        }
      }
      lbl -> sums.map(s => s.toDouble / (vecs.size.toDouble * twoTo49))
    }
    base.foreach { r =>
      val (lbl, dim, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      assert(ref(lbl)(dim) == c, s"label=$lbl dim=$dim: $c vs ${ref(lbl)(dim)}")
    }
  }

  test("l2NormalizeLong: unit norms, quantizeInt8: code range and dequant error bound") {
    val units = Ann.l2NormalizeLong(emb, "vec_id", "embedding")
      .groupBy("id").agg(sum(col("u") * col("u")).as("sq"))
      .select("sq").as[Double].collect()
    units.foreach(sq => assert(math.abs(sq - 1.0) < 1e-9,
      s"normalized vector has |u|^2 = $sq"))

    val q = Ann.quantizeInt8(emb, "vec_id", "embedding")
    val rng = q.agg(min(col("q")), max(col("q"))).head()
    assert(rng.getInt(0) >= -127 && rng.getInt(1) <= 127,
      s"codes out of range: ${rng.getInt(0)}..${rng.getInt(1)}")
    // dequantized value is within one bucket (scale/127) of the source
    val maxErr = q
      .join(emb.select(col("vec_id").as("id"),
        posexplode(col("embedding")).as(Seq("dim", "v"))), Seq("id", "dim"))
      .select(max(abs(col("q") * col("qscale") / 127.0 - col("v"))))
      .head().getDouble(0)
    val maxScale = q.agg(max(col("qscale"))).head().getDouble(0)
    assert(maxErr <= maxScale / 127.0 + 1e-12,
      s"dequant error $maxErr exceeds bucket width ${maxScale / 127.0}")
  }

  test("centroidOutliers and clusterVariance: bit-stable under repartition") {
    val o1 = Ann.centroidOutliers(emb, "vec_id", "label", "embedding", k = 3)
      .orderBy("grp", "rank").collect()
    val o2 = Ann.centroidOutliers(emb.repartition(11, col("vec_id")),
        "vec_id", "label", "embedding", k = 3)
      .orderBy("grp", "rank").collect()
    assert(o1.sameElements(o2), "outlier ranking changed under repartition")
    val v1 = Ann.clusterVariance(emb, "label", "embedding")
      .orderBy("grp", "dim").collect()
    val v2 = Ann.clusterVariance(emb.repartition(11, col("vec_id")),
        "label", "embedding")
      .orderBy("grp", "dim").collect()
    assert(v1.sameElements(v2), "variance bits changed under repartition")
    // variance is nonnegative and zero only for constant dims
    v1.foreach(r => assert(r.getDouble(3) >= 0.0))
  }

  test("pqEncode covers all subspaces; pqTopK recall vs exact cosine reported") {
    import graft.operators.PqModel
    val codes = Ann.pqEncode(emb, "vec_id", "embedding", PqModel.codebooks)
    val n = emb.count()
    assert(codes.count() === n * PqModel.numSub, "one code per (vector, subspace)")
    val rng = codes.agg(min(col("code")), max(col("code"))).head()
    assert(rng.getLong(0) >= 0 && rng.getLong(1) < PqModel.k, "codes in [0, k)")
    // ADC recall vs exact cosine: PQ at 8x16 is deliberately lossy — pin a
    // floor, report the measured value
    val exact = Ann.cosineTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 10)
      .select("query_id", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pq = Ann.pqTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", PqModel.codebooks, k = 10)
      .select("query_id", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.keys.toSeq.map { q =>
      exact(q).intersect(pq(q)).size.toDouble / exact(q).size
    }
    val mean = recalls.sum / recalls.size
    info(f"mean top-10 recall of PQ ADC (8 subspaces x 16 codes): $mean%.2f")
    assert(mean >= 0.2,
      f"PQ recall $mean%.2f collapsed — codebooks or ADC path broken")
  }

  test("quantizedTopK: int8 retrieval recalls the exact cosine top-k") {
    val exact = Ann.cosineTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 10)
      .select("query_id", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val quant = Ann.quantizedTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 10)
      .select("query_id", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.keys.toSeq.map { q =>
      exact(q).intersect(quant(q)).size.toDouble / exact(q).size
    }
    val mean = recalls.sum / recalls.size
    info(f"mean top-10 recall of int8 retrieval: $mean%.2f")
    // int8 keeps ~2 decimal digits per component; on this corpus the
    // top-10 neighborhood survives quantization almost entirely
    assert(mean >= 0.8, f"int8 recall $mean%.2f below contract 0.8")
  }

  test("hardNegatives: no same-label result, subset of filtered brute force") {
    val hn = Ann.hardNegatives(emb, "vec_id", "embedding", "label",
        queries, "vec_id", "embedding", "label", k = 10)
      .select("query_id", "rank", "id", "neg_label")
      .as[(Long, Int, Long, Int)].collect().toSeq
    val qLabels = queries.select("vec_id", "label")
      .as[(Long, Int)].collect().toMap
    assert(hn.nonEmpty)
    assert(hn.forall { case (q, _, _, nl) => nl != qLabels(q) })
    // ranks are dense 1..10 per query
    hn.groupBy(_._1).values.foreach { rs =>
      assert(rs.map(_._2).sorted === (1 to 10))
    }
    // a hard negative can never beat the full top-k's same-id entry: the
    // negatives are the top of the label-filtered score order, so each is
    // also present in a large-enough unfiltered top-k
    val full = Ann.cosineTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 120)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    assert(hn.forall { case (q, _, id, _) => full.contains((q, id)) })
  }

  test("matryoshka: deterministic across repartitioning, recall measured") {
    val m1 = Ann.matryoshkaTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", prefixDim = 16, kCand = 50, k = 10)
      .select("query_id", "rank", "id").as[(Long, Int, Long)]
      .collect().toSeq
    val m2 = Ann.matryoshkaTopK(emb.repartition(13), "vec_id", "embedding",
        queries, "vec_id", "embedding", prefixDim = 16, kCand = 50, k = 10)
      .select("query_id", "rank", "id").as[(Long, Int, Long)]
      .collect().toSeq
    assert(m1 === m2)
    val full = Ann.cosineTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 10)
      .select("query_id", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val mine = m1.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val recalls = full.keys.toSeq.map(q =>
      (mine(q) & full(q)).size.toDouble / full(q).size)
    val mean = recalls.sum / recalls.size
    info(f"mean top-10 recall of 16/64-dim matryoshka (kCand=50): $mean%.2f")
    assert(mean >= 0.5, f"matryoshka recall $mean%.2f below contract 0.5")
  }
}
