package graft

/** The custom expressions are SQL-callable through GraftExtensions. */
class GraftExtensionsSpec extends SparkSpec {

  test("ro_similarity is callable from SQL") {
    val r = spark.sql(
      "SELECT ro_similarity('manchester utd', 'manchester city') AS s")
      .head.getDouble(0)
    assert(r === 0.8275862068965517)
  }

  test("simhash64 and jaccard_sorted callable from SQL") {
    val sh = spark.sql(
      "SELECT simhash64(array('a', 'b', 'c')) AS h").head.getLong(0)
    val sh2 = spark.sql(
      "SELECT simhash64(array('a', 'b', 'c')) AS h").head.getLong(0)
    assert(sh === sh2)
    val j = spark.sql(
      "SELECT jaccard_sorted(array('a','b','c'), array('b','c','d')) AS j")
      .head.getDouble(0)
    assert(j === 0.5)
  }

  test("minhash_text_signature callable from SQL with literal params") {
    val sig = spark.sql(
      "SELECT minhash_text_signature('hello world', 5, 16) AS s")
      .head.getSeq[Long](0)
    assert(sig.length === 16)
  }
}
