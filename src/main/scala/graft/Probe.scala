package graft

import org.apache.spark.sql.functions._

/** Scratch probe main for local iteration (not part of the driver contract).
  * Edit freely: time a pipeline stage, print a plan, inspect a table.
  *
  * Round-12 use: per-stage breakdown of the minhash/LSH candidate
  * pipelines (guide §1 "measure first") — each stage timed with the noop
  * sink so the computation is paid, not the collect. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.fromEnv()
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sparkContext.setJobDescription(null)
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.operators.Dedup
    val docs = Tables.documents(spark, d)
    val numHashes = 64; val bands = 64; val shingleSize = 5
    val minJaccard = 0.3

    // ---- linkage pipeline stages (mirrors minhashPipeline keyed=true) ----
    val norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
    val sigExpr = graft.functions.MinHashTextSignature.minhashText(
      norm, shingleSize, numHashes)
    val base = docs.select(col("doc_id").as("id"), sigExpr.as("sig")).cache()
    t("A.sig+cache")(base.count())

    val bandRows = base
      .select(col("id"), explode(Dedup.lshBands(col("sig"), bands, numHashes))
        .as("bandrow"))
      .select(col("id"), col("bandrow.band").as("band"),
        col("bandrow.bucket").as("bucket"))
    t("B.bandjoin-count") {
      System.err.println("  band join rows: " + bandRows.join(
        bandRows.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
        .filter(col("id") < col("id_b")).count())
    }
    val candsOld = bandRows.join(
        bandRows.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id") < col("id_b"))
      .select(col("id").as("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    t("C.dedup-noop")(noop(candsOld))

    val sigs = broadcast(base.select(col("id"), col("sig")))
    val estScore = graft.functions.SignatureAgreement.agreement(
      col("sig_a"), col("sig_b")).cast("double") / lit(numHashes.toDouble)
    val strongOld = candsOld
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .filter(estScore >= lit(minJaccard) - 0.2)
      .select("id_a", "id_b")
    t("D.strong-old-noop")(noop(strongOld))

    // new shape: first-agreeing-band, no dedup exchange
    val pairBands = bandRows.join(
        bandRows.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id") < col("id_b"))
      .select(col("id").as("id_a"), col("id_b"), col("band"))
    val strongNew = pairBands
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .filter(graft.functions.FirstAgreeingBand.firstBand(
          col("sig_a"), col("sig_b"), numHashes / bands) === col("band")
        && estScore >= lit(minJaccard) - 0.2)
      .select("id_a", "id_b")
    t("E.strong-new-noop")(noop(strongNew))
    t("E2.strong-new-count") {
      System.err.println("  strong rows: " + strongNew.count())
    }

    // verify stage cost on the strong set (cache strong like the pipeline)
    val strong = strongNew.cache()
    t("F.strong-cache")(strong.count())
    val candIds = strong.select(col("id_a").as("id"))
      .union(strong.select(col("id_b").as("id"))).distinct()
    val gramsPlain = docs.select(col("doc_id").as("id"), col("text"))
      .join(candIds, Seq("id"), "left_semi")
      .select(col("id"), graft.functions.HashedShingleSet.hashedShingles(
        lower(trim(regexp_replace(col("text"), "\\s+", " "))),
        shingleSize).as("grams"))
      .cache()
    t("G.grams-cache")(gramsPlain.count())
    val verified = strong
      .join(broadcast(gramsPlain.select(col("id").as("id_a"), col("grams").as("g_a"))), Seq("id_a"))
      .join(broadcast(gramsPlain.select(col("id").as("id_b"), col("grams").as("g_b"))), Seq("id_b"))
      .withColumn("jaccard", graft.functions.JaccardSortedLongArrays
        .jaccardSortedLong(col("g_a"), col("g_b")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
    t("H.verify-noop")(noop(verified))
    t("H2.verify-count") {
      System.err.println("  verified pairs: " + verified.count())
    }
    spark.stop()
  }
}
