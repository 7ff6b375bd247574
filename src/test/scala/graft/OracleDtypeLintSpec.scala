package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide dtype lint (round-9 verdict ask #3): enforces by machine the
  * commit-137fe6f convention that no final-select column of any DuckDB oracle
  * is an uncast integer SUM (window or plain). DuckDB's SUM over integers
  * returns HUGEINT while Spark writes BIGINT — value-identical results then
  * hash-mismatch in the driver's dtype-sensitive compare (the q_kaplan_meier
  * r8 red row shipped through exactly this gap).
  *
  * Rule: every `SUM(` token lexically inside the FINAL top-level select list
  * of an oracle must be enclosed by some `CAST( ... )` region. Sums inside
  * CTEs are exempt (their type never reaches the result schema directly; the
  * dynamic gate — tools/compare.py's DuckDB-native type FAIL — covers any
  * leak path this static rule can't see).
  */
class OracleDtypeLintSpec extends AnyFunSuite {

  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** Text of the last depth-0 SELECT list (between SELECT and its FROM). */
  private def finalSelectList(sql: String): Option[String] = {
    val u = sql.toUpperCase
    var depth = 0
    var last = -1
    var i = 0
    while (i < sql.length) {
      val ch = sql(i)
      if (ch == '(') depth += 1
      else if (ch == ')') depth -= 1
      else if (depth == 0 && u.startsWith("SELECT", i) &&
        (i == 0 || !isWordChar(sql(i - 1)))) last = i
      i += 1
    }
    if (last < 0) return None
    depth = 0
    i = last
    while (i < sql.length) {
      val ch = sql(i)
      if (ch == '(') depth += 1
      else if (ch == ')') depth -= 1
      else if (depth == 0 && u.startsWith("FROM", i) && i > 0 &&
        !isWordChar(sql(i - 1))) return Some(sql.substring(last + 6, i))
      i += 1
    }
    Some(sql.substring(last + 6))
  }

  /** Offsets of SUM( tokens in `sel` not enclosed by any CAST( paren. */
  private def uncastSums(sel: String): Seq[String] = {
    val u = sel.toUpperCase
    val stack = scala.collection.mutable.Stack[Boolean]() // true = CAST paren
    val bad = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < sel.length) {
      val ch = sel(i)
      if (ch == '(') {
        stack.push(sel.substring(0, i).reverse.dropWhile(_.isWhitespace)
          .reverse.toUpperCase.endsWith("CAST"))
        i += 1
      } else if (ch == ')') {
        if (stack.nonEmpty) stack.pop()
        i += 1
      } else if (u.startsWith("SUM", i) &&
        (i == 0 || !isWordChar(sel(i - 1))) &&
        u.drop(i + 3).dropWhile(_.isWhitespace).startsWith("(")) {
        if (!stack.exists(identity))
          bad += sel.substring(math.max(0, i - 40),
            math.min(sel.length, i + 50)).replace('\n', ' ')
        i += 3
      } else i += 1
    }
    bad.toSeq
  }

  test("no oracle final-select column is an uncast SUM (window or plain)") {
    val oracles = SparkEntry.oracleSql
    assert(oracles.nonEmpty)
    val violations = oracles.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      finalSelectList(sql).toSeq.flatMap(sel =>
        uncastSums(sel).map(ctx => s"$name: ...$ctx..."))
    }
    assert(violations.isEmpty,
      s"\nuncast final-select SUMs (DuckDB would return HUGEINT, Spark " +
        s"BIGINT — driver hash mismatch):\n${violations.mkString("\n")}")
  }

  test("lint self-check: catches a deliberately uncast window SUM") {
    val badSql =
      """WITH b AS (SELECT 1 AS x)
        |SELECT x, SUM(x) OVER (ORDER BY x) AS s FROM b""".stripMargin
    val sel = finalSelectList(badSql).get
    assert(uncastSums(sel).nonEmpty)
    val goodSql =
      """WITH b AS (SELECT 1 AS x)
        |SELECT x, CAST(SUM(x) OVER (ORDER BY x) AS BIGINT) AS s FROM b"""
        .stripMargin
    assert(uncastSums(finalSelectList(goodSql).get).isEmpty)
  }
}
