package graft

import org.apache.spark.sql.functions._
import graft.functions.ModPMinHash

/** Cross-engine exactness of the mod-p MinHash family: the GOLDEN
  * signatures below were computed in DuckDB 1.0 with the q_linkage_scalable
  * twin's nested-lambda SQL (same P/Base, same A/B literals via
  * ModPMinHash.sqlParamList) — the Scala expression must reproduce them
  * bit-for-bit, which is the property the scalable-linkage oracle gate
  * rests on. Regenerate: the python snippet in the round-12 COVERAGE.md
  * entry (splitmix64 params + the `win`/`sigs` CTEs over the sample
  * strings). */
class ModPMinHashSpec extends SparkSpec {
  import spark.implicits._

  private def sig(text: String): Seq[Long] =
    Seq(text).toDF("t")
      .select(ModPMinHash.signature(col("t"), 5, 24).as("s"))
      .as[Seq[Long]].head()

  private def hset(text: String): Seq[Long] =
    Seq(text).toDF("t")
      .select(ModPMinHash.shingleSet(col("t"), 5).as("s"))
      .as[Seq[Long]].head()

  test("signature matches the DuckDB twin's goldens (full text)") {
    assert(sig("hello world this is a longer text") === Seq(
      39045298L, 36280604L, 22843928L, 61596231L, 107918805L, 90882750L,
      13012702L, 230773682L, 109086710L, 8059851L, 42078647L, 253680344L,
      15276576L, 5437110L, 65706182L, 169405014L, 16718595L, 73187278L,
      28241542L, 18799753L, 78248692L, 36669674L, 102825271L, 77457662L))
    assert(sig("key agg row scan slow") === Seq(
      81503166L, 122855564L, 141499282L, 186670316L, 139297462L,
      23810293L, 99116121L, 40462302L, 85387754L, 309584678L, 35829533L,
      100882683L, 143636608L, 126930957L, 56123157L, 32631007L, 2016948L,
      18673351L, 101238640L, 77820834L, 224343532L, 2265596L, 87225129L,
      50501031L))
  }

  test("short-text single-window semantics match the twin (len < shingle)") {
    // DuckDB: range(0, greatest(len-5,0)+1) = [0]; window = whole string
    assert(sig("hi").take(4) ===
      Seq(799073048L, 1205657923L, 1685531066L, 486776991L))
    assert(hset("hi") === Seq(13729L))
    assert(hset("abcd") === Seq(219759674L))
  }

  test("shingle set is sorted distinct window hashes, golden prefix") {
    val h = hset("hello world this is a longer text")
    assert(h.size === 29)
    assert(h === h.sorted && h.distinct === h)
    assert(h.take(8) === Seq(37871238L, 416038475L, 497738910L,
      551232522L, 723012111L, 726307734L, 735385690L, 792145816L))
  }

  test("all family values stay inside the prime field") {
    val all = sig("hello world this is a longer text") ++
      hset("key agg row scan slow")
    assert(all.forall(v => v >= 0L && v < ModPMinHash.P))
  }

  test("modpBlockedPairs: planted near-dup found, far pair excluded, " +
      "exact jaccard symmetric contract") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog in the park"),
      (2L, "the quick brown fox jumps over the lazy dog in the yard"),
      (3L, "completely unrelated text about database query planning"),
      (4L, "")).toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.modpBlockedPairs(
        docs, "doc_id", "text", minJaccard = 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "near-dup pair must collide and verify")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated doc must not pair")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "empty doc is excluded by contract")
  }
}
