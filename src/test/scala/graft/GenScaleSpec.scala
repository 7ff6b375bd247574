package graft

import graft.tools.GenScale

/** The SCALE-experiment generator ([[graft.tools.GenScale]]) must emit
  * trees that are drop-in substitutes for the driver's read-only
  * `/root/testdata/sf*` layout: schema-exact per table, events confined
  * to Jan 2024 (Tables.load asserts the month at verify time), lineitem
  * parent-consistent with orders, and the planted document dup/near-dup
  * structure present at the documented rates. A broken generator would
  * silently invalidate every SCALE.md ratio, so the invariants are
  * pinned here. */
class GenScaleSpec extends SparkSpec {

  private lazy val outDir = {
    val d = java.nio.file.Files.createTempDirectory("genscale").toString
    // m=0.2: docs=1000 (covers the %640/%641 planted-dup ids), lineitem
    // ~120k — big enough to exercise every branch, small enough for CI
    GenScale.run(spark, d, 0.2)
    d
  }

  private val tables = Seq("region", "nation", "supplier", "customer",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  test("every table is schema-exact to the driver tree") {
    for (t <- tables) {
      val gen = spark.read.parquet(s"$outDir/$t.parquet").schema
        .map(f => (f.name, f.dataType))
      val ref = spark.read.parquet(s"$sfDir/$t.parquet").schema
        .map(f => (f.name, f.dataType))
      assert(gen == ref, s"$t schema drift:\ngen=$gen\nref=$ref")
    }
  }

  test("events: Jan 2024 micros, bounded values, Tables.load accepts it") {
    val ev = Tables.load(spark, outDir, "events")
    import org.apache.spark.sql.functions._
    val r = ev.agg(min(col("ts")), max(col("ts")), min(col("value")),
      max(col("value")), countDistinct(col("event_type"))).head
    assert(r.getTimestamp(0).toInstant.toString.startsWith("2024-01-"))
    assert(r.getTimestamp(1).toInstant.toString.startsWith("2024-01-"))
    assert(r.getDouble(2) >= 0.0 && r.getDouble(3) <= 560.21)
    assert(r.getLong(4) == 5L)
  }

  test("lineitem: fan-out 1..7, parent-consistent dates, keys in range") {
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$outDir/lineitem.parquet")
    val ord = spark.read.parquet(s"$outDir/orders.parquet")
    val fan = li.groupBy("l_orderkey").count()
      .agg(min("count"), max("count")).head
    assert(fan.getLong(0) >= 1L && fan.getLong(1) <= 7L)
    // every line ships strictly AFTER its order's date (the generator
    // re-derives o_orderdate from the shared splitmix stream — this is
    // the draw-alignment check)
    val bad = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .filter(col("l_shipdate") <= col("o_orderdate")).count()
    assert(bad == 0L, s"$bad lines ship on/before their order date")
    val keys = li.agg(max("l_partkey"), max("l_suppkey")).head
    assert(keys.getLong(0) < 4000L && keys.getLong(1) < 200L)
  }

  test("documents: planted exact dups and near-dups at the documented ids") {
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(docs(639L) == docs(638L), "exact dup %640 not planted")
    assert(docs(640L) == docs(639L) + " extra", "near-dup %641 not planted")
    // n_chars really is the text length
    val nc = spark.read.parquet(s"$outDir/documents.parquet")
      .filter("length(text) <> n_chars").count()
    assert(nc == 0L)
  }

  test("embeddings: 64-dim unit vectors clustered by label") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$outDir/embeddings.parquet")
    val r = emb.select(
      min(size(col("embedding"))), max(size(col("embedding"))),
      min(col("label")), max(col("label")),
      min(aggregate(col("embedding"), lit(0.0d),
        (a, x) => a + x * x))).head
    assert(r.getInt(0) == 64 && r.getInt(1) == 64)
    assert(r.getInt(2) >= 0 && r.getInt(3) <= 9)
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-3, "vectors not unit-norm")
    // cluster structure: same-label pairs must be far more similar than
    // cross-label pairs on average (the IVF/dbscan workload shape)
    val a = emb.limit(200).select(col("vec_id"), col("embedding"),
      col("label")).collect()
    def dot(x: Seq[Float], y: Seq[Float]) =
      x.zip(y).map { case (p, q) => p.toDouble * q }.sum
    val pairs = for {
      i <- a.indices; j <- (i + 1) until a.length
    } yield (a(i).getInt(2) == a(j).getInt(2),
      dot(a(i).getSeq[Float](1), a(j).getSeq[Float](1)))
    val same = pairs.filter(_._1).map(_._2)
    val diff = pairs.filterNot(_._1).map(_._2)
    assert(same.sum / same.size > diff.sum / diff.size + 0.2,
      "labels do not form cosine clusters")
  }
}
