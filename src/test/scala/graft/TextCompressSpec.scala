package graft

import graft.operators.TextCompress
import org.apache.spark.sql.functions._

class TextCompressSpec extends SparkSpec {
  import spark.implicits._

  test("docCompression: deflate sizes match zlib reference values") {
    // reference lengths from CPython zlib.compress(s, 6) — pinned here so
    // a JVM Deflater drift would fail loudly, not just against the golden
    val docs = Seq(
      (1L, "g", "hello hello hello hello"),
      (2L, "g", "abcabcabcabc xyz"),
      (3L, "g", "the quick brown fox jumps over the lazy dog the quick brown fox"))
      .toDF("id", "grp", "text")
    val out = TextCompress.docCompression(docs, "id", "grp", "text")
      .orderBy(col("id"))
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, "g", 23L, 16L),
      (2L, "g", 16L, 17L),
      (3L, "g", 63L, 53L)))
  }

  test("docCompression: deterministic across partitionings, shuffle-free") {
    val docs = (0 until 300)
      .map(i => (i.toLong, s"s${i % 5}", s"doc $i " * (i % 17 + 1)))
      .toDF("id", "grp", "text")
    val a = TextCompress.docCompression(docs, "id", "grp", "text")
      .orderBy(col("id")).collect().toSeq
    val b = TextCompress.docCompression(docs.repartition(7), "id", "grp", "text")
      .orderBy(col("id")).collect().toSeq
    assert(a === b)
    val plan = TextCompress.docCompression(docs, "id", "grp", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
