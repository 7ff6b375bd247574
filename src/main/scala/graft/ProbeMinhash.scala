package graft
import org.apache.spark.sql.functions._
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", "32")
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-20s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
    }
    val docs = Tables.documents(spark, d)
    val base = docs.select(col("doc_id").as("id"), col("text"))
      .withColumn("grams", functions.TextFeatures.shingles(col("text"), 5))
      .withColumn("sig", functions.MinHashSignature.minhash(col("grams"), 64))
    time("shingle+sig")(base.select(sum(size(col("sig")))).head)
    val cached = base.cache()
    time("cache materialize")(cached.count())
    val bandRows = cached.select(col("id"),
      explode(operators.Dedup.lshBands(col("sig"), 16, 64)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bucket").as("bucket"))
    time("bands")(bandRows.count())
    val cands = bandRows.join(bandRows.select(col("band"), col("bucket"), col("id").as("id_b")), Seq("band","bucket"))
      .filter(col("id") < col("id_b")).select(col("id").as("id_a"), col("id_b")).dropDuplicates("id_a","id_b")
    println("cands = " + time("cand join")(cands.count()))
    val full = time("full op")(operators.Dedup.minhashNearDupPairs(docs, "doc_id", "text", 64, 16, 5, 0.5).count())
    println("pairs = " + full)
    spark.stop()
  }
}
