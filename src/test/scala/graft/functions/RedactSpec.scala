package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pseudonymization contract: the surrogate must be (a) byte-exact the
  * documented salted SHA-256 prefix — an engine disagreeing on case,
  * length, or salt framing breaks every cross-system join on the token —
  * (b) stable across calls and partitionings, and (c) injective on
  * realistic id populations (64 bits ⇒ collisions at n²/2⁶⁵). */
class RedactSpec extends SparkSpec {
  import spark.implicits._

  test("pseudonymize: byte-exact salted sha-256 prefix") {
    val got = Seq(42L).toDF("id")
      .select(Redact.pseudonymize(col("id")).as("t"))
      .as[String].head()
    // independent JVM witness for the exact framing "graft:42"
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest("graft:42".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
    assert(got === hex)
    assert(got.length === 16 && got.forall(c => c.isDigit || c >= 'a'))
  }

  test("pseudonymize: stable, salt-sensitive, injective on 10k ids") {
    val ids = (0L until 10000L).toDF("id")
    val tok = ids.select(col("id"), Redact.pseudonymize(col("id")).as("t"))
    val a = tok.as[(Long, String)].collect().toMap
    val b = ids.repartition(7)
      .select(col("id"), Redact.pseudonymize(col("id")).as("t"))
      .as[(Long, String)].collect().toMap
    assert(a === b)                          // partition-independent
    assert(a.values.toSet.size === 10000)    // injective here
    val salted = ids
      .select(Redact.pseudonymize(col("id"), salt = "other").as("t"))
      .as[String].collect().toSet
    assert(salted.intersect(a.values.toSet).isEmpty) // salt really binds
  }
}
