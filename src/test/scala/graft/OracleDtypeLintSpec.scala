package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide static dtype lint over the DuckDB oracle SQL. Two rules,
  * both enforcing the convention that no final-select column of any oracle
  * may carry an engine-divergent result type:
  *
  *  1. (round 8, q_kaplan_meier) no final-select `SUM(` may sit outside a
  *     CAST region — DuckDB SUM over integers returns HUGEINT, Spark BIGINT,
  *     and the driver's hash is dtype-sensitive even where values agree.
  *  2. (round 9, q_fuzz_2001 class) no final-select column may be DECIMAL of
  *     any precision — the driver reads Spark parquet via pyarrow (Decimal,
  *     trailing zeros preserved) but the oracle via pandas (float64), so
  *     value-identical DECIMAL columns hash-mismatch on representation.
  *     Round 9's `CAST(SUM(…) AS DECIMAL(38,2))` satisfied rule 1 and was
  *     precisely the broken form; rule 2 rejects it.
  *
  * Round-10 hardening (r9 advisor): CAST-region detection requires a word
  * boundary (`BROADCAST(` no longer masks an inner SUM), TRY_CAST counts as
  * a cast, and EVERY depth-0 SELECT list is linted — set-op branches at the
  * top level (`SELECT … UNION SELECT …`) no longer skip the first branch.
  *
  * Static limits (by design): a `SELECT *` or bare-alias projection over a
  * subquery can propagate an inner DECIMAL invisibly to this lexer — the
  * dynamic gates close that hole (PlanRegressionSpec bans DecimalType in
  * every query's ANALYZED Spark schema; tools/compare.py hard-fails
  * DuckDB-native result-type drift and driver-canonical cell strings).
  */
class OracleDtypeLintSpec extends AnyFunSuite {

  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** Texts of ALL depth-0 SELECT lists (between each SELECT and its own
    * depth-0 FROM / ORDER BY / set-op boundary / end). */
  private def topSelectLists(sql: String): Seq[String] = {
    val u = sql.toUpperCase
    val starts = scala.collection.mutable.ArrayBuffer[Int]()
    var depth = 0
    var i = 0
    while (i < sql.length) {
      val ch = sql(i)
      if (ch == '(') depth += 1
      else if (ch == ')') depth -= 1
      else if (depth == 0 && u.startsWith("SELECT", i) &&
        (i == 0 || !isWordChar(sql(i - 1))) &&
        (i + 6 >= sql.length || !isWordChar(sql(i + 6)))) starts += i
      i += 1
    }
    val boundaryKws = Seq("FROM", "ORDER", "UNION", "INTERSECT", "EXCEPT")
    starts.toSeq.map { s =>
      var d = 0
      var j = s + 6
      var end = sql.length
      var found = false
      while (j < sql.length && !found) {
        val ch = sql(j)
        if (ch == '(') d += 1
        else if (ch == ')') { d -= 1; if (d < 0) { end = j; found = true } }
        else if (d == 0 && j > 0 && !isWordChar(sql(j - 1)) &&
          boundaryKws.exists(kw => u.startsWith(kw, j) &&
            (j + kw.length >= sql.length ||
              !isWordChar(sql(j + kw.length))))) {
          end = j; found = true
        }
        if (!found) j += 1
      }
      sql.substring(s + 6, end)
    }
  }

  /** True when the text immediately before an open paren (ignoring
    * whitespace) is the word CAST or TRY_CAST with a word boundary —
    * `BROADCAST(` is NOT a cast region. */
  private def isCastParen(sel: String, parenIdx: Int): Boolean = {
    var j = parenIdx - 1
    while (j >= 0 && sel(j).isWhitespace) j -= 1
    val end = j
    while (j >= 0 && isWordChar(sel(j))) j -= 1
    val word = sel.substring(j + 1, end + 1).toUpperCase
    word == "CAST" || word == "TRY_CAST"
  }

  /** Context snippets of SUM( tokens in `sel` not enclosed by any true
    * CAST( / TRY_CAST( paren. */
  private def uncastSums(sel: String): Seq[String] = {
    val u = sel.toUpperCase
    val stack = scala.collection.mutable.Stack[Boolean]() // true = CAST paren
    val bad = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < sel.length) {
      val ch = sel(i)
      if (ch == '(') {
        stack.push(isCastParen(sel, i))
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

  /** Top-level comma split of a select list. */
  private def splitItems(sel: String): Seq[String] = {
    val items = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0
    var start = 0
    var i = 0
    while (i < sel.length) {
      val ch = sel(i)
      if (ch == '(') depth += 1
      else if (ch == ')') depth -= 1
      else if (ch == ',' && depth == 0) {
        items += sel.substring(start, i); start = i + 1
      }
      i += 1
    }
    items += sel.substring(start)
    items.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** All `CAST( … AS TYPE )` regions in `item`: (openParen, closeParen,
    * TYPE) — the AS separating expr from TYPE is the LAST one at the cast
    * paren's own depth. */
  private def castRegions(item: String): Seq[(Int, Int, String)] = {
    val regions = scala.collection.mutable.ArrayBuffer[(Int, Int, String)]()
    var i = 0
    while (i < item.length) {
      if (item(i) == '(' && isCastParen(item, i)) {
        var depth = 0
        var j = i
        var close = -1
        var lastAs = -1
        while (j < item.length && close < 0) {
          val ch = item(j)
          if (ch == '(') depth += 1
          else if (ch == ')') { depth -= 1; if (depth == 0) close = j }
          else if (depth == 1 && (ch == 'A' || ch == 'a') &&
            item.regionMatches(true, j, "AS", 0, 2) &&
            j > 0 && !isWordChar(item(j - 1)) &&
            j + 2 < item.length && !isWordChar(item(j + 2))) lastAs = j
          j += 1
        }
        if (close >= 0 && lastAs >= 0)
          regions += ((i, close,
            item.substring(lastAs + 2, close).trim.toUpperCase))
      }
      i += 1
    }
    regions.toSeq
  }

  /** Rule-2 violations: items that may propagate a DECIMAL result type.
    * Every lexical DECIMAL occurrence must be NEUTRALIZED by an enclosing
    * cast region whose own target is non-DECIMAL (`CAST(SUM(CAST(x AS
    * DECIMAL)) AS BIGINT)` is fine; a bare `MIN(CAST(x AS DECIMAL))`, or a
    * cast whose target IS DECIMAL at the top, is not). */
  private def decimalFinals(sel: String): Seq[String] =
    splitItems(sel).flatMap { item =>
      val occ = "(?i)\\bDECIMAL\\b".r.findAllMatchIn(item).map(_.start).toSeq
      if (occ.isEmpty) None
      else {
        val safe = castRegions(item)
          .filter { case (_, _, t) => !t.startsWith("DECIMAL") }
        val bad = occ.exists(p =>
          !safe.exists { case (o, c, _) => o < p && p < c })
        if (bad) Some(item.replace('\n', ' ').take(90)) else None
      }
    }

  test("no oracle final-select column is an uncast SUM (window or plain)") {
    val oracles = SparkEntry.oracleSql
    assert(oracles.nonEmpty)
    val violations = oracles.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      topSelectLists(sql).flatMap(sel =>
        uncastSums(sel).map(ctx => s"$name: ...$ctx..."))
    }
    assert(violations.isEmpty,
      s"\nuncast final-select SUMs (DuckDB would return HUGEINT, Spark " +
        s"BIGINT — driver hash mismatch):\n${violations.mkString("\n")}")
  }

  test("no oracle final-select column is DECIMAL of any precision") {
    val oracles = SparkEntry.oracleSql
    val violations = oracles.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      topSelectLists(sql).flatMap(sel =>
        decimalFinals(sel).map(ctx => s"$name: $ctx"))
    }
    assert(violations.isEmpty,
      s"\nDECIMAL-typed final-select columns (pyarrow Decimal vs " +
        s"DuckDB-pandas float64 — driver hash mismatch on trailing " +
        s"zeros):\n${violations.mkString("\n")}")
  }

  test("lint self-check: catches a deliberately uncast window SUM") {
    val badSql =
      """WITH b AS (SELECT 1 AS x)
        |SELECT x, SUM(x) OVER (ORDER BY x) AS s FROM b""".stripMargin
    val sel = topSelectLists(badSql).last
    assert(uncastSums(sel).nonEmpty)
    val goodSql =
      """WITH b AS (SELECT 1 AS x)
        |SELECT x, CAST(SUM(x) OVER (ORDER BY x) AS BIGINT) AS s FROM b"""
        .stripMargin
    assert(uncastSums(topSelectLists(goodSql).last).isEmpty)
  }

  test("lint self-check: BROADCAST( is not a CAST region; TRY_CAST is") {
    assert(uncastSums("BROADCAST(SUM(x)) AS s").nonEmpty)
    assert(uncastSums("TRY_CAST(SUM(x) AS BIGINT) AS s").isEmpty)
  }

  test("lint self-check: set-op branches are all linted") {
    val sql =
      """SELECT SUM(x) AS s FROM a
        |UNION ALL
        |SELECT CAST(SUM(y) AS BIGINT) AS s FROM b""".stripMargin
    val lists = topSelectLists(sql)
    assert(lists.size == 2)
    assert(lists.flatMap(uncastSums).nonEmpty) // first branch caught
  }

  test("lint self-check: catches q_fuzz_2001's round-9 DECIMAL form") {
    // the exact shape that shipped 14 red driver rows: SUM-inside-CAST
    // satisfies rule 1, but the cast target itself is DECIMAL
    val r9Form =
      """SELECT k0, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |  AS DECIMAL(38,2)) AS a0,
        |  MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS a1,
        |  COUNT(*) AS a3
        |FROM lineitem GROUP BY 1 ORDER BY k0 ASC NULLS FIRST""".stripMargin
    val sels = topSelectLists(r9Form)
    val v = sels.flatMap(decimalFinals)
    assert(v.size == 2, s"expected the DECIMAL cast AND the bare MIN " +
      s"over DECIMAL to be flagged, got: $v")
    // the round-10 re-pinned form: decimal arithmetic inside, BIGINT out
    val r10Form =
      """SELECT k0, CAST(SUM(CAST(CAST(FLOOR(l_extendedprice * 100 + 0.5)
        |  AS BIGINT) AS DECIMAL(18,2))) AS BIGINT) AS a0,
        |  CAST(MIN(CAST(CAST(FLOOR(l_extendedprice * 100 + 0.5)
        |  AS BIGINT) AS DECIMAL(18,2))) AS BIGINT) AS a1,
        |  COUNT(*) AS a3
        |FROM lineitem GROUP BY 1 ORDER BY k0 ASC NULLS FIRST""".stripMargin
    assert(topSelectLists(r10Form).flatMap(decimalFinals).isEmpty)
    assert(topSelectLists(r10Form).flatMap(uncastSums).isEmpty)
  }
}
