package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DIFFERENTIAL PLAN FUZZER — the round-8 verdict's "cheapest way left to
  * find semantic divergences the curated suite can't reach".
  *
  * A seeded generator composes random small plans from a RESTRICTED
  * grammar of operators the registry already gates individually
  * (filter / groupBy-agg / equi-join / window top-m / reaggregation /
  * set ops over the TPC-H tables), and renders each plan TWICE from the
  * same AST:
  *
  *  - one shared ANSI SQL string, written in the Spark∩DuckDB dialect
  *    intersection (positional GROUP BY, explicit NULLS FIRST/LAST,
  *    CAST(... AS BIGINT) around SUM/ROW_NUMBER/int32, year() for dates);
  *  - one INDEPENDENT DataFrame-API build of the same semantics.
  *
  * Three engines then check each other: [[pinned]] registers 24
  * seed-pinned cases in the Registry, so the driver's DuckDB gate runs
  * the SQL in DuckDB against the DataFrame build's output (true
  * cross-ENGINE differential); FuzzParitySpec sweeps 200 seeds per test
  * run comparing the DataFrame build against `spark.sql` of the same
  * text (cross-RENDERER differential, catching generator bugs and
  * analyzer/dialect drift cheaply in-JVM).
  *
  * Grammar restrictions = the determinism conventions the registry
  * already lives by: long/string outputs only (no IEEE doubles), ASCII
  * binary-collation strings, every output totally ordered on its keys
  * with explicit null placement (Spark ASC default NULLS FIRST vs DuckDB
  * NULLS LAST), window orders tie-broken by a unique key.
  */
object Fuzz {

  /** One grammar column: shared ANSI rendering + independent DF build. */
  final case class FExpr(sql: String, col: Column, isStr: Boolean)

  private def L(n: String) = FExpr(n, col(n), isStr = false)
  private def LI(n: String) = // int32 on disk → BIGINT in both engines
    FExpr(s"CAST($n AS BIGINT)", col(n).cast("long"), isStr = false)
  private def Y(n: String) = // year() of a timestamp col, widened
    FExpr(s"CAST(year($n) AS BIGINT)", year(col(n)).cast("long"),
      isStr = false)
  private def S(n: String) = FExpr(n, col(n), isStr = true)

  /** Catalog row: loaders + which exprs may group / range / enumerate /
    * LIKE, and the table's non-null unique total-order key. */
  final case class FTab(
      name: String,
      load: (SparkSession, String) => DataFrame,
      groupables: Seq[FExpr],
      longs: Seq[(FExpr, Long, Long)],
      strings: Seq[(FExpr, Seq[String])],
      likes: Seq[(FExpr, Seq[String])],
      uniq: Seq[FExpr])

  private val lineitem = FTab("lineitem", Tables.lineitem,
    groupables = Seq(S("l_returnflag"), S("l_linestatus"),
      LI("l_linenumber"), Y("l_shipdate")),
    longs = Seq((L("l_orderkey"), 0L, 15000L), (L("l_partkey"), 0L, 2000L),
      (L("l_suppkey"), 0L, 100L), (LI("l_linenumber"), 1L, 7L),
      (Y("l_shipdate"), 1992L, 1999L)),
    strings = Seq((S("l_returnflag"), Seq("A", "N", "R")),
      (S("l_linestatus"), Seq("F", "O"))),
    likes = Seq.empty,
    uniq = Seq(L("l_orderkey"), LI("l_linenumber")))

  private val orders = FTab("orders", Tables.orders,
    groupables = Seq(S("o_orderstatus"), S("o_orderpriority"),
      Y("o_orderdate")),
    longs = Seq((L("o_orderkey"), 0L, 15000L), (L("o_custkey"), 0L, 1500L),
      (Y("o_orderdate"), 1992L, 1999L)),
    strings = Seq((S("o_orderstatus"), Seq("F", "O", "P")),
      (S("o_orderpriority"), Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW"))),
    likes = Seq.empty,
    uniq = Seq(L("o_orderkey")))

  private val customer = FTab("customer", Tables.customer,
    groupables = Seq(S("c_mktsegment"), LI("c_nationkey")),
    longs = Seq((L("c_custkey"), 0L, 1500L), (LI("c_nationkey"), 0L, 25L)),
    strings = Seq((S("c_mktsegment"), Seq("AUTOMOBILE", "BUILDING",
      "FURNITURE", "HOUSEHOLD", "MACHINERY"))),
    likes = Seq((S("c_name"), Seq("%1%", "%9%", "%00%", "Customer%"))),
    uniq = Seq(L("c_custkey")))

  private val part = FTab("part", Tables.part,
    groupables = Seq(S("p_brand"), S("p_type"), LI("p_size")),
    longs = Seq((L("p_partkey"), 0L, 2000L), (LI("p_size"), 1L, 51L)),
    strings = Seq(
      (S("p_brand"), (1 to 25).map(i => s"Brand#$i")),
      (S("p_type"), Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL",
        "STANDARD"))),
    likes = Seq.empty,
    uniq = Seq(L("p_partkey")))

  private val supplier = FTab("supplier", Tables.supplier,
    groupables = Seq(LI("s_nationkey")),
    longs = Seq((L("s_suppkey"), 0L, 100L), (LI("s_nationkey"), 0L, 25L)),
    strings = Seq.empty,
    likes = Seq((S("s_name"), Seq("%1%", "Supplier%", "%5%"))),
    uniq = Seq(L("s_suppkey")))

  private val nation = FTab("nation", Tables.nation,
    groupables = Seq(S("n_name"), LI("n_regionkey")),
    longs = Seq((LI("n_nationkey"), 0L, 25L), (LI("n_regionkey"), 0L, 5L)),
    strings = Seq.empty,
    likes = Seq((S("n_name"), Seq("NATION%", "%1%"))),
    uniq = Seq(LI("n_nationkey")))

  private val tables = Seq(lineitem, orders, customer, part, supplier,
    nation)

  /** Equi-join edges of the schema (key exprs render on both sides). */
  final case class FJoin(left: FTab, right: FTab, lk: FExpr, rk: FExpr)
  private val joins = Seq(
    FJoin(orders, customer, L("o_custkey"), L("c_custkey")),
    FJoin(lineitem, orders, L("l_orderkey"), L("o_orderkey")),
    FJoin(lineitem, part, L("l_partkey"), L("p_partkey")),
    FJoin(lineitem, supplier, L("l_suppkey"), L("s_suppkey")),
    FJoin(customer, nation, LI("c_nationkey"), LI("n_nationkey")))

  /** A generated case: shared SQL text + independent DataFrame build. */
  final case class FuzzCase(seed: Long, shape: String, sql: String,
      build: (SparkSession, String) => DataFrame)

  private final class Rng(seed: Long) {
    private val r = new java.util.Random(seed)
    def int(n: Int): Int = r.nextInt(n)
    def pick[A](xs: Seq[A]): A = xs(r.nextInt(xs.size))
    def bool(p: Double): Boolean = r.nextDouble() < p
    def range(lo: Long, hi: Long): Long = lo + r.nextInt((hi - lo).toInt)
  }

  // ---- predicates -------------------------------------------------------

  private def sq(s: String) = "'" + s + "'" // values are quote-free ASCII

  private def atom(r: Rng, t: FTab): (String, Column) = {
    val kinds = Seq.newBuilder[Int]
    kinds += 0 += 1 // numeric cmp / between always available
    if (t.strings.nonEmpty) { kinds += 2; kinds += 3 }
    if (t.likes.nonEmpty) kinds += 4
    r.pick(kinds.result()) match {
      case 0 =>
        val (e, lo, hi) = r.pick(t.longs)
        val (opS, opC) = r.pick(Seq[(String, (Column, Long) => Column)](
          ("<", _ < _), ("<=", _ <= _), (">", _ > _), (">=", _ >= _),
          ("=", _ === _), ("<>", _ =!= _)))
        val lit = r.range(lo, hi)
        (s"${e.sql} $opS $lit", opC(e.col, lit))
      case 1 =>
        val (e, lo, hi) = r.pick(t.longs)
        val a = r.range(lo, hi); val b = r.range(lo, hi)
        val (x, y) = (math.min(a, b), math.max(a, b))
        (s"${e.sql} BETWEEN $x AND $y", e.col.between(x, y))
      case 2 =>
        val (e, vals) = r.pick(t.strings)
        val v = r.pick(vals :+ "ZZZ") // rare nonexistent → empty branch
        (s"${e.sql} = ${sq(v)}", e.col === v)
      case 3 =>
        val (e, vals) = r.pick(t.strings)
        val n = 1 + r.int(math.min(3, vals.size))
        val vs = scala.util.Random.javaRandomToRandom(
          new java.util.Random(r.range(0, 1 << 30))).shuffle(vals).take(n)
        (s"${e.sql} IN (${vs.map(sq).mkString(", ")})",
          e.col.isin(vs: _*))
      case 4 =>
        val (e, pats) = r.pick(t.likes)
        val p = r.pick(pats)
        (s"${e.sql} LIKE ${sq(p)}", e.col.like(p))
    }
  }

  private def pred(r: Rng, ts: Seq[FTab]): (String, Column) = {
    val n = 1 + r.int(3)
    val atoms = (0 until n).map { _ =>
      val (s, c) = atom(r, r.pick(ts))
      if (r.bool(0.15)) (s"NOT ($s)", !c) else (s, c)
    }
    atoms.reduceLeft { (a, b) =>
      if (r.bool(0.5)) (s"(${a._1} AND ${b._1})", a._2 && b._2)
      else (s"(${a._1} OR ${b._1})", a._2 || b._2)
    }
  }

  // ---- aggregates -------------------------------------------------------

  /** (select-item SQL, agg Column) — SUM/ROW_NUMBER widened to BIGINT in
    * BOTH renderings (DuckDB SUM is HUGEINT, Spark's is LONG). */
  private def agg(r: Rng, longs: Seq[FExpr], strs: Seq[FExpr],
      alias: String): (String, Column) =
    r.int(if (strs.nonEmpty) 5 else 4) match {
      case 0 => (s"COUNT(*) AS $alias", count(lit(1)).as(alias))
      case 1 =>
        val e = r.pick(longs)
        (s"CAST(SUM(${e.sql}) AS BIGINT) AS $alias",
          sum(e.col).cast("long").as(alias))
      case 2 =>
        val e = r.pick(longs ++ strs)
        if (r.bool(0.5)) (s"MIN(${e.sql}) AS $alias", min(e.col).as(alias))
        else (s"MAX(${e.sql}) AS $alias", max(e.col).as(alias))
      case 3 =>
        val e = r.pick(longs ++ strs)
        (s"COUNT(DISTINCT ${e.sql}) AS $alias",
          countDistinct(e.col).as(alias))
      case 4 =>
        val e = r.pick(strs)
        (s"COUNT(${e.sql}) AS $alias", count(e.col).as(alias))
    }

  private def orderByAll(names: Seq[String]): String =
    "ORDER BY " + names.map(n => s"$n ASC NULLS FIRST").mkString(", ")

  private def sortAll(df: DataFrame, names: Seq[String]): DataFrame =
    df.orderBy(names.map(n => col(n).asc_nulls_first): _*)

  // ---- shapes -----------------------------------------------------------

  /** Single-table (or join) filter → groupBy → agg [→ HAVING]. */
  private def genAgg(r: Rng, seed: Long): FuzzCase = {
    val joined = r.bool(0.45)
    val (ts, fromSql, src): (Seq[FTab], String,
        (SparkSession, String) => DataFrame) =
      if (joined) {
        val j = r.pick(joins)
        val leftJoin = r.bool(0.3)
        val jt = if (leftJoin) "LEFT JOIN" else "JOIN"
        (Seq(j.left, j.right),
          s"${j.left.name} $jt ${j.right.name} ON ${j.lk.sql} = ${j.rk.sql}",
          (s, d) => j.left.load(s, d).join(j.right.load(s, d),
            j.lk.col === j.rk.col, if (leftJoin) "left_outer" else "inner"))
      } else {
        val t = r.pick(tables)
        (Seq(t), t.name, t.load)
      }
    val allGroup = ts.flatMap(_.groupables)
    val allLongs = ts.flatMap(_.longs.map(_._1))
    val allStrs = ts.flatMap(_.strings.map(_._1)) ++
      ts.flatMap(_.likes.map(_._1))
    val nk = 1 + r.int(2)
    var keys = scala.util.Random.javaRandomToRandom(
      new java.util.Random(seed * 31 + 7)).shuffle(allGroup).take(nk)
    // occasionally derive a key through a CASE expression — CASE-in-key
    // is a classic short-circuit/branch-typing divergence spot
    if (r.bool(0.25)) {
      val (pS, pC) = atom(r, r.pick(ts))
      keys = keys.updated(0, FExpr(
        s"CASE WHEN $pS THEN 'hi' ELSE 'lo' END",
        when(pC, "hi").otherwise("lo"), isStr = true))
    }
    val kAliases = keys.indices.map(i => s"k$i")
    val na = 1 + r.int(3)
    val aggs = (0 until na).map(i => agg(r, allLongs, allStrs, s"a$i"))
    val where = if (r.bool(0.8)) Some(pred(r, ts)) else None
    val having = if (r.bool(0.3)) Some(1 + r.int(20)) else None
    val kSql = keys.zip(kAliases).map { case (e, a) => s"${e.sql} AS $a" }
    val sql =
      s"""SELECT ${(kSql ++ aggs.map(_._1)).mkString(", ")}
         |FROM $fromSql
         |${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |GROUP BY ${kAliases.indices.map(_ + 1).mkString(", ")}
         |${having.map(h => s"HAVING COUNT(*) > $h").getOrElse("")}
         |${orderByAll(kAliases)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = src(s, d)
      where.foreach { w => df = df.filter(w._2) }
      val kCols = keys.zip(kAliases).map { case (e, a) => e.col.as(a) }
      var g = df.groupBy(kCols: _*)
        .agg(aggs.head._2,
          (aggs.tail.map(_._2) ++
            having.map(_ => count(lit(1)).as("__cnt")).toSeq): _*)
      having.foreach { h => g = g.filter(col("__cnt") > h).drop("__cnt") }
      sortAll(g, kAliases)
    }
    FuzzCase(seed, if (joined) "join_agg" else "agg", sql, build)
  }

  /** Window top-m per group with unique-key tie-break. */
  private def genWindow(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables)
    val k = r.pick(t.groupables)
    val v = r.pick(t.longs)._1
    val desc = r.bool(0.5)
    val m = 1 + r.int(3)
    val where = if (r.bool(0.7)) Some(pred(r, Seq(t))) else None
    val uAliases = t.uniq.indices.map(i => s"u$i")
    val dir = if (desc) "DESC NULLS LAST" else "ASC NULLS FIRST"
    val winOrd = (s"${v.sql} $dir" +:
      t.uniq.map(u => s"${u.sql} ASC NULLS FIRST")).mkString(", ")
    val uSql = t.uniq.zip(uAliases).map { case (e, a) => s"${e.sql} AS $a" }
    val sql =
      s"""SELECT k0, ${uAliases.mkString(", ")}, rn FROM (
         |  SELECT ${k.sql} AS k0, ${uSql.mkString(", ")},
         |    CAST(ROW_NUMBER() OVER (PARTITION BY ${k.sql}
         |      ORDER BY $winOrd) AS BIGINT) AS rn
         |  FROM ${t.name}
         |  ${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |) WHERE rn <= $m
         |${orderByAll(Seq("k0", "rn"))}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach { w => df = df.filter(w._2) }
      val ord = (if (desc) v.col.desc_nulls_last
        else v.col.asc_nulls_first) +: t.uniq.map(_.col.asc_nulls_first)
      val w = Window.partitionBy(k.col).orderBy(ord: _*)
      val out = df
        .withColumn("rn", row_number().over(w).cast("long"))
        .select((k.col.as("k0") +:
          t.uniq.zip(uAliases).map { case (e, a) => e.col.as(a) }) :+
          col("rn"): _*)
        .filter(col("rn") <= m)
      sortAll(out, Seq("k0", "rn"))
    }
    FuzzCase(seed, "window", sql, build)
  }

  /** Two-level reaggregation: inner 2-key count, outer rollup over k1. */
  private def genReagg(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables)
    if (t.groupables.size < 2) return genAgg(r, seed) // nation-sized
    val ks = scala.util.Random.javaRandomToRandom(
      new java.util.Random(seed * 17 + 3)).shuffle(t.groupables).take(2)
    val where = if (r.bool(0.7)) Some(pred(r, Seq(t))) else None
    val sql =
      s"""SELECT k1 AS g, COUNT(*) AS n_groups,
         |  CAST(SUM(c) AS BIGINT) AS total, MAX(c) AS max_c
         |FROM (
         |  SELECT ${ks(0).sql} AS k0, ${ks(1).sql} AS k1, COUNT(*) AS c
         |  FROM ${t.name}
         |  ${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |  GROUP BY 1, 2
         |) GROUP BY 1
         |${orderByAll(Seq("g"))}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach { w => df = df.filter(w._2) }
      val inner = df.groupBy(ks(0).col.as("k0"), ks(1).col.as("k1"))
        .agg(count(lit(1)).as("c"))
      val outer = inner.groupBy(col("k1").as("g"))
        .agg(count(lit(1)).as("n_groups"),
          sum(col("c")).cast("long").as("total"),
          max(col("c")).as("max_c"))
      sortAll(outer, Seq("g"))
    }
    FuzzCase(seed, "reagg", sql, build)
  }

  /** UNION / INTERSECT / EXCEPT of two filtered projections (distinct
    * set semantics in both engines). */
  private def genSetOp(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables)
    val nk = 1 + r.int(math.min(2, t.groupables.size))
    val keys = scala.util.Random.javaRandomToRandom(
      new java.util.Random(seed * 13 + 11)).shuffle(t.groupables).take(nk)
    val kAliases = keys.indices.map(i => s"k$i")
    val p1 = pred(r, Seq(t)); val p2 = pred(r, Seq(t))
    val op = r.pick(Seq("UNION", "INTERSECT", "EXCEPT"))
    val kSql = keys.zip(kAliases).map { case (e, a) => s"${e.sql} AS $a" }
      .mkString(", ")
    val sql =
      s"""SELECT $kSql FROM ${t.name} WHERE ${p1._1}
         |$op
         |SELECT $kSql FROM ${t.name} WHERE ${p2._1}
         |${orderByAll(kAliases)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      def side(p: Column) = t.load(s, d).filter(p)
        .select(keys.zip(kAliases).map { case (e, a) => e.col.as(a) }: _*)
      val combined = op match {
        case "UNION" => side(p1._2).union(side(p2._2)).distinct()
        case "INTERSECT" => side(p1._2).intersect(side(p2._2))
        case "EXCEPT" => side(p1._2).except(side(p2._2))
      }
      sortAll(combined, kAliases)
    }
    FuzzCase(seed, "setop_" + op.toLowerCase, sql, build)
  }

  /** Semi/anti IN-subquery + agg: `FROM left WHERE lk [NOT] IN (SELECT
    * rk FROM right WHERE p)` vs a DataFrame left_semi/left_anti join.
    * Keys are non-null, so NOT IN ≡ anti-join in both engines (the
    * null-poisoned NOT IN is deliberately out of grammar — the registry's
    * q_anti_join family pins that semantics separately). */
  private def genSemi(r: Rng, seed: Long): FuzzCase = {
    val j = r.pick(joins)
    val t = j.left
    val anti = r.bool(0.4)
    val subPred = pred(r, Seq(j.right))
    val where = if (r.bool(0.6)) Some(pred(r, Seq(t))) else None
    val keys = scala.util.Random.javaRandomToRandom(
      new java.util.Random(seed * 23 + 5)).shuffle(t.groupables)
      .take(1 + r.int(2))
    val kAliases = keys.indices.map(i => s"k$i")
    val aggs = (0 until 1 + r.int(2)).map(i =>
      agg(r, t.longs.map(_._1),
        t.strings.map(_._1) ++ t.likes.map(_._1), s"a$i"))
    val kSql = keys.zip(kAliases).map { case (e, a) => s"${e.sql} AS $a" }
    val inOp = if (anti) "NOT IN" else "IN"
    val sql =
      s"""SELECT ${(kSql ++ aggs.map(_._1)).mkString(", ")}
         |FROM ${t.name}
         |WHERE ${j.lk.sql} $inOp
         |  (SELECT ${j.rk.sql} FROM ${j.right.name} WHERE ${subPred._1})
         |${where.map(w => s"AND (${w._1})").getOrElse("")}
         |GROUP BY ${kAliases.indices.map(_ + 1).mkString(", ")}
         |${orderByAll(kAliases)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      val sub = j.right.load(s, d).filter(subPred._2)
        .select(j.rk.col.as("__sk"))
      var df = t.load(s, d).join(sub, j.lk.col === col("__sk"),
        if (anti) "left_anti" else "left_semi")
      where.foreach { w => df = df.filter(w._2) }
      val g = df.groupBy(keys.zip(kAliases)
          .map { case (e, a) => e.col.as(a) }: _*)
        .agg(aggs.head._2, aggs.tail.map(_._2): _*)
      sortAll(g, kAliases)
    }
    FuzzCase(seed, if (anti) "anti_sub" else "semi_sub", sql, build)
  }

  /** Scalar-subquery predicate: `WHERE x >/<= (SELECT MIN|MAX(y) FROM t2
    * WHERE p)` vs a broadcast 1-row cross join — empty subqueries yield
    * NULL scalars (all rows filtered) in both engines. */
  private def genScalar(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables)
    val t2 = r.pick(tables)
    val (x, _, _) = r.pick(t.longs)
    val (y, _, _) = r.pick(t2.longs)
    val subPred = pred(r, Seq(t2))
    val useMin = r.bool(0.5)
    val fn = if (useMin) "MIN" else "MAX"
    val opIdx = r.int(2) // > or <=
    val keys = scala.util.Random.javaRandomToRandom(
      new java.util.Random(seed * 29 + 1)).shuffle(t.groupables)
      .take(1 + r.int(2))
    val kAliases = keys.indices.map(i => s"k$i")
    val aggs = (0 until 1 + r.int(2)).map(i =>
      agg(r, t.longs.map(_._1),
        t.strings.map(_._1) ++ t.likes.map(_._1), s"a$i"))
    val kSql = keys.zip(kAliases).map { case (e, a) => s"${e.sql} AS $a" }
    val opS = if (opIdx == 0) ">" else "<="
    val sql =
      s"""SELECT ${(kSql ++ aggs.map(_._1)).mkString(", ")}
         |FROM ${t.name}
         |WHERE ${x.sql} $opS
         |  (SELECT $fn(${y.sql}) FROM ${t2.name} WHERE ${subPred._1})
         |GROUP BY ${kAliases.indices.map(_ + 1).mkString(", ")}
         |${orderByAll(kAliases)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      val scalar = t2.load(s, d).filter(subPred._2)
        .agg((if (useMin) min(y.col) else max(y.col)).as("__scalar"))
      val df = t.load(s, d).crossJoin(broadcast(scalar))
        .filter(if (opIdx == 0) x.col > col("__scalar")
          else x.col <= col("__scalar"))
      val g = df.groupBy(keys.zip(kAliases)
          .map { case (e, a) => e.col.as(a) }: _*)
        .agg(aggs.head._2, aggs.tail.map(_._2): _*)
      sortAll(g, kAliases)
    }
    FuzzCase(seed, "scalar_sub", sql, build)
  }

  /** Windowed AGGREGATE functions (vs genWindow's ranking-only): a
    * running SUM under an explicit frame, in two deterministic
    * flavors — ROWS with a full unique tie-break (plus LAG, which is
    * only well-defined under a total order), or RANGE over the value
    * alone (peer-inclusive sums are order-independent under ties; LAG
    * is NOT, so it is excluded there). Frames are written explicitly
    * in both renderings — default-frame semantics (RANGE vs ROWS) is a
    * classic cross-engine divergence spot, which is exactly what this
    * shape probes. Output bounded at any SF by a deterministic keyed
    * modulo sample applied AFTER the windows. */
  private def genWinAgg(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables)
    val k = r.pick(t.groupables)
    val v = r.pick(t.longs)._1
    val desc = r.bool(0.5)
    val rangeFrame = r.bool(0.4)
    val where = if (r.bool(0.7)) Some(pred(r, Seq(t))) else None
    val uAliases = t.uniq.indices.map(i => s"u$i")
    val mod = 101L + r.int(200)
    val dir = if (desc) "DESC NULLS LAST" else "ASC NULLS FIRST"
    val uSql = t.uniq.zip(uAliases).map { case (e, a) => s"${e.sql} AS $a" }
    val tieOrd = (s"${v.sql} $dir" +:
      t.uniq.map(u => s"${u.sql} ASC NULLS FIRST")).mkString(", ")
    val winSql =
      if (rangeFrame)
        s"""CAST(SUM(${v.sql}) OVER (PARTITION BY ${k.sql}
           |      ORDER BY ${v.sql} $dir
           |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS BIGINT) AS running""".stripMargin
      else
        s"""CAST(SUM(${v.sql}) OVER (PARTITION BY ${k.sql}
           |      ORDER BY $tieOrd
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS BIGINT) AS running,
           |    LAG(${v.sql}) OVER (PARTITION BY ${k.sql}
           |      ORDER BY $tieOrd) AS lagv""".stripMargin
    val outCols = Seq("k0") ++ uAliases ++ Seq("vv", "running") ++
      (if (rangeFrame) Seq.empty else Seq("lagv"))
    // final sort over EVERY output column: the catalog's `uniq` is a
    // DECLARED key, but the synthetic lineitem actually carries ~2%
    // duplicate (l_orderkey, l_linenumber) pairs — seed 1300 (now a
    // pinned gate) produced two rows tied on (k0, u0, u1) whose
    // engine-dependent tie order hash-diverged. Ordering on all columns
    // is total up to fully-identical rows, which are hash-equivalent.
    val sql =
      s"""SELECT ${outCols.mkString(", ")} FROM (
         |  SELECT ${k.sql} AS k0, ${uSql.mkString(", ")},
         |    ${v.sql} AS vv,
         |    $winSql
         |  FROM ${t.name}
         |  ${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |) WHERE (u0 % $mod) = 0
         |${orderByAll(outCols)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach { w => df = df.filter(w._2) }
      val vOrd = if (desc) v.col.desc_nulls_last else v.col.asc_nulls_first
      val base = df.select((k.col.as("k0") +:
        t.uniq.zip(uAliases).map { case (e, a) => e.col.as(a) }) :+
        v.col.as("vv"): _*)
      val withWins =
        if (rangeFrame) {
          val w = Window.partitionBy(col("k0"))
            .orderBy(if (desc) col("vv").desc_nulls_last
              else col("vv").asc_nulls_first)
            .rangeBetween(Window.unboundedPreceding, Window.currentRow)
          base.withColumn("running", sum(col("vv")).over(w).cast("long"))
        } else {
          val ord = (if (desc) col("vv").desc_nulls_last
            else col("vv").asc_nulls_first) +:
            uAliases.map(a => col(a).asc_nulls_first)
          val wf = Window.partitionBy(col("k0")).orderBy(ord: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val wl = Window.partitionBy(col("k0")).orderBy(ord: _*)
          base.withColumn("running", sum(col("vv")).over(wf).cast("long"))
            .withColumn("lagv", lag(col("vv"), 1).over(wl))
        }
      sortAll(withWins.filter(col("u0") % mod === 0)
        .select(outCols.map(col): _*), outCols)
    }
    FuzzCase(seed,
      if (rangeFrame) "winagg_range" else "winagg_rows", sql, build)
  }

  /** 3-table join chain (the schema's two length-2 paths), each edge
    * independently inner or LEFT — probes join associativity with
    * null-producing outer edges, grouped over keys drawn from all
    * three tables. */
  private def genChain(r: Rng, seed: Long): FuzzCase = {
    // (lineitem→orders→customer) or (orders→customer→nation)
    val (e1, e2) = r.pick(Seq((joins(1), joins(0)), (joins(0), joins(4))))
    val ts = Seq(e1.left, e1.right, e2.right)
    val lj1 = r.bool(0.25); val lj2 = r.bool(0.25)
    def jt(b: Boolean) = if (b) "LEFT JOIN" else "JOIN"
    val fromSql =
      s"""${e1.left.name} ${jt(lj1)} ${e1.right.name}
         |  ON ${e1.lk.sql} = ${e1.rk.sql}
         |${jt(lj2)} ${e2.right.name} ON ${e2.lk.sql} = ${e2.rk.sql}"""
        .stripMargin
    val allGroup = ts.flatMap(_.groupables)
    val allLongs = ts.flatMap(_.longs.map(_._1))
    val allStrs = ts.flatMap(_.strings.map(_._1)) ++
      ts.flatMap(_.likes.map(_._1))
    val nk = 1 + r.int(2)
    val keys = scala.util.Random.javaRandomToRandom(
      new java.util.Random(seed * 37 + 13)).shuffle(allGroup).take(nk)
    val kAliases = keys.indices.map(i => s"k$i")
    val na = 1 + r.int(3)
    val aggs = (0 until na).map(i => agg(r, allLongs, allStrs, s"a$i"))
    val where = if (r.bool(0.7)) Some(pred(r, ts)) else None
    val kSql = keys.zip(kAliases).map { case (e, a) => s"${e.sql} AS $a" }
    val sql =
      s"""SELECT ${(kSql ++ aggs.map(_._1)).mkString(", ")}
         |FROM $fromSql
         |${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |GROUP BY ${kAliases.indices.map(_ + 1).mkString(", ")}
         |${orderByAll(kAliases)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = e1.left.load(s, d)
        .join(e1.right.load(s, d), e1.lk.col === e1.rk.col,
          if (lj1) "left_outer" else "inner")
        .join(e2.right.load(s, d), e2.lk.col === e2.rk.col,
          if (lj2) "left_outer" else "inner")
      where.foreach { w => df = df.filter(w._2) }
      val g = df.groupBy(keys.zip(kAliases)
          .map { case (e, a) => e.col.as(a) }: _*)
        .agg(aggs.head._2, aggs.tail.map(_._2): _*)
      sortAll(g, kAliases)
    }
    FuzzCase(seed, "chain_agg", sql, build)
  }

  /** Aggregate top-k: GROUP BY → ORDER BY the first aggregate DESC
    * (keys as tie-break) → LIMIT — the TakeOrderedAndProject path under
    * differential test. Ties are broken by the full key list, so the
    * k-prefix is total-order deterministic in both engines. */
  private def genTopAgg(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables)
    val nk = 1 + r.int(2)
    val keys = scala.util.Random.javaRandomToRandom(
      new java.util.Random(seed * 41 + 17)).shuffle(t.groupables).take(nk)
    val kAliases = keys.indices.map(i => s"k$i")
    val aggs = Seq(agg(r, t.longs.map(_._1),
      t.strings.map(_._1) ++ t.likes.map(_._1), "a0"))
    val where = if (r.bool(0.6)) Some(pred(r, Seq(t))) else None
    val m = 3 + r.int(8)
    val kSql = keys.zip(kAliases).map { case (e, a) => s"${e.sql} AS $a" }
    val tieSql = kAliases.map(a => s"$a ASC NULLS FIRST").mkString(", ")
    val sql =
      s"""SELECT ${(kSql ++ aggs.map(_._1)).mkString(", ")}
         |FROM ${t.name}
         |${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |GROUP BY ${kAliases.indices.map(_ + 1).mkString(", ")}
         |ORDER BY a0 DESC NULLS LAST, $tieSql LIMIT $m""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach { w => df = df.filter(w._2) }
      df.groupBy(keys.zip(kAliases)
          .map { case (e, a) => e.col.as(a) }: _*)
        .agg(aggs.head._2)
        .orderBy(col("a0").desc_nulls_last +:
          kAliases.map(a => col(a).asc_nulls_first): _*)
        .limit(m)
    }
    FuzzCase(seed, "top_agg", sql, build)
  }

  // ---- grammar v2 (seeds >= 2000) --------------------------------------
  // The round-9 verdict asked the grammar to cover the shapes that bit
  // rounds 7/8: window SUMs under the BIGINT-cast convention (already in
  // genWinAgg; widened to COUNT/MIN/MAX/LEAD here), OUTER joins with NULL
  // join keys, and DECIMAL-producing aggregates. New shapes live behind a
  // seed-range version gate so every pre-existing pinned seed keeps its
  // exact definition (changing the dispatch draw would silently redefine
  // q_fuzz_1001..1300 and invalidate their bench baselines).

  /** Per-table money column for DECIMAL shapes (doubles on disk, derived
    * to a DECIMAL(18,2) of integer cents via the exact
    * FLOOR(m*100+0.5) route in both renderings — see genDecimalAgg). */
  private val moneyCols: Map[String, String] = Map(
    "lineitem" -> "l_extendedprice", "orders" -> "o_totalprice",
    "customer" -> "c_acctbal", "part" -> "p_retailprice",
    "supplier" -> "s_acctbal")

  /** LEFT JOIN whose left key is CASE-mangled to NULL on a seeded modulo
    * class: NULL keys never match in either engine, so the right side is
    * null-extended for that stripe. Groups over a RIGHT-side (nullable)
    * key probe the engines' one-NULL-group GROUP BY semantics; aggregates
    * mix COUNT(*) (counts null-extended rows) with COUNT(col) /
    * COUNT(DISTINCT col) / SUM(col) over nullable right columns
    * (null-skipping). Final ORDER BY keeps the explicit NULLS FIRST the
    * grammar always uses — null group keys must land identically. */
  private def genOuterNull(r: Rng, seed: Long): FuzzCase = {
    val j = r.pick(joins)
    val mod = 2L + r.int(5) // null stripe density 1/2 .. 1/6
    val onSql = s"(CASE WHEN (${j.lk.sql} % $mod) = 0 THEN NULL " +
      s"ELSE ${j.lk.sql} END) = ${j.rk.sql}"
    val onCol = when(j.lk.col % mod === 0, lit(null))
      .otherwise(j.lk.col) === j.rk.col
    val where = if (r.bool(0.5)) Some(pred(r, Seq(j.left))) else None
    // one left groupable + one right groupable (the nullable one)
    val lk = r.pick(j.left.groupables)
    val rk = r.pick(j.right.groupables)
    val keys = if (r.bool(0.3)) Seq(rk) else Seq(lk, rk)
    val kAliases = keys.indices.map(i => s"k$i")
    val rLongs = j.right.longs.map(_._1)
    val rStrs = j.right.strings.map(_._1) ++ j.right.likes.map(_._1)
    val aggSqlCols = scala.collection.mutable.ArrayBuffer[(String, Column)]()
    aggSqlCols += (("COUNT(*) AS a0", count(lit(1)).as("a0")))
    val rv = r.pick(rLongs)
    aggSqlCols += ((s"CAST(COALESCE(SUM(${rv.sql}), 0) AS BIGINT) AS a1",
      coalesce(sum(rv.col), lit(0L)).cast("long").as("a1")))
    aggSqlCols += ((s"COUNT(${rv.sql}) AS a2", count(rv.col).as("a2")))
    if (rStrs.nonEmpty && r.bool(0.6)) {
      val rs = r.pick(rStrs)
      aggSqlCols += ((s"COUNT(DISTINCT ${rs.sql}) AS a3",
        countDistinct(rs.col).as("a3")))
    }
    val kSql = keys.zip(kAliases).map { case (e, a) => s"${e.sql} AS $a" }
    val sql =
      s"""SELECT ${(kSql ++ aggSqlCols.map(_._1)).mkString(", ")}
         |FROM ${j.left.name} LEFT JOIN ${j.right.name} ON $onSql
         |${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |GROUP BY ${kAliases.indices.map(_ + 1).mkString(", ")}
         |${orderByAll(kAliases)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = j.left.load(s, d)
        .join(j.right.load(s, d), onCol, "left_outer")
      where.foreach { w => df = df.filter(w._2) }
      val g = df.groupBy(keys.zip(kAliases)
          .map { case (e, a) => e.col.as(a) }: _*)
        .agg(aggSqlCols.head._2, aggSqlCols.tail.map(_._2).toSeq: _*)
      sortAll(g, kAliases)
    }
    FuzzCase(seed, "outer_null", sql, build)
  }

  /** DECIMAL-exercising aggregates: SUM/MIN/MAX over a DECIMAL(18,2)
    * money column, with every FINAL output cast to BIGINT in both
    * renderings. Round 9 emitted DECIMAL(38,2) finals — value-identical
    * across engines, but the driver reads Spark parquet via pyarrow
    * (Decimal('…0') keeps trailing zeros) and the oracle via pandas
    * (float64 drops them), so the hash failed on representation alone.
    * The decimal arithmetic stays fully under test (cast, SUM widening,
    * MIN/MAX over DECIMAL); only the output representation is integer
    * cents now — the registry's all-BIGINT convention.
    *
    * The decimal INPUT is derived by an exact integer route,
    * `CAST(FLOOR(m*100 + 0.5) AS BIGINT)` → DECIMAL(18,2), instead of a
    * raw double→DECIMAL cast: Spark rounds HALF_UP on the double's
    * shortest decimal string while DuckDB rounds the raw binary value,
    * so a stored double just below an .xx5 tie would round differently
    * (a latent divergence class the round-9 advisor flagged). The
    * FLOOR form is the same IEEE multiply/add/floor in both engines —
    * tie-free because money doubles sit within 1e-6·cent of integers. */
  private def genDecimalAgg(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables.filter(t => moneyCols.contains(t.name)))
    val m = moneyCols(t.name)
    val dec = FExpr(
      s"CAST(CAST(FLOOR($m * 100 + 0.5) AS BIGINT) AS DECIMAL(18,2))",
      floor(col(m) * lit(100) + lit(0.5)).cast("long")
        .cast("decimal(18,2)"), isStr = false)
    val nk = 1 + r.int(math.min(2, t.groupables.size))
    val keys = scala.util.Random.javaRandomToRandom(
      new java.util.Random(seed * 43 + 19)).shuffle(t.groupables).take(nk)
    val kAliases = keys.indices.map(i => s"k$i")
    val where = if (r.bool(0.7)) Some(pred(r, Seq(t))) else None
    val aggs = scala.collection.mutable.ArrayBuffer[(String, Column)]()
    aggs += ((s"CAST(SUM(${dec.sql}) AS BIGINT) AS a0",
      sum(dec.col).cast("long").as("a0")))
    if (r.bool(0.6))
      aggs += ((s"CAST(MIN(${dec.sql}) AS BIGINT) AS a1",
        min(dec.col).cast("long").as("a1")))
    if (r.bool(0.6))
      aggs += ((s"CAST(MAX(${dec.sql}) AS BIGINT) AS a2",
        max(dec.col).cast("long").as("a2")))
    aggs += (("COUNT(*) AS a3", count(lit(1)).as("a3")))
    val kSql = keys.zip(kAliases).map { case (e, a) => s"${e.sql} AS $a" }
    val sql =
      s"""SELECT ${(kSql ++ aggs.map(_._1)).mkString(", ")}
         |FROM ${t.name}
         |${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |GROUP BY ${kAliases.indices.map(_ + 1).mkString(", ")}
         |${orderByAll(kAliases)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach { w => df = df.filter(w._2) }
      val g = df.groupBy(keys.zip(kAliases)
          .map { case (e, a) => e.col.as(a) }: _*)
        .agg(aggs.head._2, aggs.tail.map(_._2).toSeq: _*)
      sortAll(g, kAliases)
    }
    FuzzCase(seed, "decimal_agg", sql, build)
  }

  /** Widened window-aggregate family over genWinAgg's SUM-only ROWS
    * frame: COUNT(*) / MIN / MAX / SUM under an explicit ROWS frame with
    * the full unique tie-break, plus LEAD alongside LAG. Sorted on every
    * output column (the seed-1300 duplicate-declared-key lesson). */
  private def genWinAgg2(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables)
    val k = r.pick(t.groupables)
    val v = r.pick(t.longs)._1
    val desc = r.bool(0.5)
    val where = if (r.bool(0.7)) Some(pred(r, Seq(t))) else None
    val uAliases = t.uniq.indices.map(i => s"u$i")
    val mod = 101L + r.int(200)
    val dir = if (desc) "DESC NULLS LAST" else "ASC NULLS FIRST"
    val uSql = t.uniq.zip(uAliases).map { case (e, a) => s"${e.sql} AS $a" }
    val tieOrd = (s"${v.sql} $dir" +:
      t.uniq.map(u => s"${u.sql} ASC NULLS FIRST")).mkString(", ")
    val frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    val ordCols = (if (desc) v.col.desc_nulls_last
      else v.col.asc_nulls_first) +: t.uniq.map(_.col.asc_nulls_first)
    def wf = Window.partitionBy(k.col).orderBy(ordCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def wo = Window.partitionBy(k.col).orderBy(ordCols: _*)
    val kind = r.int(4)
    val (winSql, winCol) = kind match {
      case 0 => (s"CAST(SUM(${v.sql}) OVER (PARTITION BY ${k.sql} " +
        s"ORDER BY $tieOrd $frame) AS BIGINT) AS w0",
        sum(v.col).over(wf).cast("long").as("w0"))
      case 1 => (s"CAST(COUNT(*) OVER (PARTITION BY ${k.sql} " +
        s"ORDER BY $tieOrd $frame) AS BIGINT) AS w0",
        count(lit(1)).over(wf).cast("long").as("w0"))
      case 2 => (s"MIN(${v.sql}) OVER (PARTITION BY ${k.sql} " +
        s"ORDER BY $tieOrd $frame) AS w0",
        min(v.col).over(wf).as("w0"))
      case _ => (s"MAX(${v.sql}) OVER (PARTITION BY ${k.sql} " +
        s"ORDER BY $tieOrd $frame) AS w0",
        max(v.col).over(wf).as("w0"))
    }
    val useLead = r.bool(0.5)
    val (shiftSql, shiftCol) =
      if (useLead)
        (s"LEAD(${v.sql}) OVER (PARTITION BY ${k.sql} " +
          s"ORDER BY $tieOrd) AS w1", lead(v.col, 1).over(wo).as("w1"))
      else
        (s"LAG(${v.sql}) OVER (PARTITION BY ${k.sql} " +
          s"ORDER BY $tieOrd) AS w1", lag(v.col, 1).over(wo).as("w1"))
    val outCols = Seq("k0") ++ uAliases ++ Seq("vv", "w0", "w1")
    val sql =
      s"""SELECT ${outCols.mkString(", ")} FROM (
         |  SELECT ${k.sql} AS k0, ${uSql.mkString(", ")},
         |    ${v.sql} AS vv,
         |    $winSql,
         |    $shiftSql
         |  FROM ${t.name}
         |  ${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |) WHERE (u0 % $mod) = 0
         |${orderByAll(outCols)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach { w => df = df.filter(w._2) }
      val out = df
        .withColumn("w0", winCol)
        .withColumn("w1", shiftCol)
        .select((k.col.as("k0") +:
          t.uniq.zip(uAliases).map { case (e, a) => e.col.as(a) }) ++
          Seq(v.col.as("vv"), col("w0"), col("w1")): _*)
        .filter(col("u0") % mod === 0)
      sortAll(out, outCols)
    }
    FuzzCase(seed, s"winagg2_$kind", sql, build)
  }

  // ---- grammar v3 (seeds >= 3000) --------------------------------------
  // Bag-semantics set ops (UNION/INTERSECT/EXCEPT ALL — multiplicity
  // arithmetic, not the v1 distinct semantics), single-table NULL-key
  // grouping (CASE-mangled key → the one-NULL-group rule without a join
  // in the way), and DECIMAL window sums (running DECIMAL(18,2) under an
  // explicit ROWS frame, widened to DECIMAL(38,2) — the window
  // counterpart of v2's decimal aggregates).

  /** UNION ALL / INTERSECT ALL / EXCEPT ALL of two filtered projections:
    * multiset semantics — INTERSECT ALL keeps min(multiplicity), EXCEPT
    * ALL subtracts multiplicities — in both engines. Output rows contain
    * duplicates, so presentation order sorts on EVERY column (identical
    * rows are interchangeable — hash-equivalent). */
  private def genSetOpAll(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables)
    val nk = 1 + r.int(math.min(2, t.groupables.size))
    val keys = scala.util.Random.javaRandomToRandom(
      new java.util.Random(seed * 47 + 29)).shuffle(t.groupables).take(nk)
    val kAliases = keys.indices.map(i => s"k$i")
    val p1 = pred(r, Seq(t)); val p2 = pred(r, Seq(t))
    val op = r.pick(Seq("UNION ALL", "INTERSECT ALL", "EXCEPT ALL"))
    // deterministic keyed modulo pre-filter on BOTH sides: bag semantics
    // are preserved on the sampled subset while output stays bounded at
    // any SF (a weak predicate would otherwise emit the whole table
    // twice under UNION ALL)
    val u = t.uniq.head
    val mod = 23L + r.int(40)
    val kSql = keys.zip(kAliases).map { case (e, a) => s"${e.sql} AS $a" }
      .mkString(", ")
    val sql =
      s"""SELECT * FROM (
         |SELECT $kSql FROM ${t.name}
         |  WHERE (${p1._1}) AND (${u.sql} % $mod) = 0
         |$op
         |SELECT $kSql FROM ${t.name}
         |  WHERE (${p2._1}) AND (${u.sql} % $mod) = 0
         |) ${orderByAll(kAliases)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      def side(p: Column) = t.load(s, d)
        .filter(p && u.col % mod === 0)
        .select(keys.zip(kAliases).map { case (e, a) => e.col.as(a) }: _*)
      val combined = op match {
        case "UNION ALL"     => side(p1._2).union(side(p2._2))
        case "INTERSECT ALL" => side(p1._2).intersectAll(side(p2._2))
        case "EXCEPT ALL"    => side(p1._2).exceptAll(side(p2._2))
      }
      sortAll(combined, kAliases)
    }
    FuzzCase(seed,
      "setopall_" + op.split(" ")(0).toLowerCase, sql, build)
  }

  /** Single-table NULL-key grouping: the group key is CASE-mangled to
    * NULL on a seeded predicate, so the one-NULL-group GROUP BY rule is
    * probed with no join in the plan; COUNT(key) vs COUNT(*) split the
    * null rows, and the explicit NULLS FIRST presentation places the
    * NULL group identically in both engines. */
  private def genNullKeyAgg(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables)
    val k = r.pick(t.groupables)
    val (mangleS, mangleC) = atom(r, t)
    val keySql = s"CASE WHEN $mangleS THEN NULL ELSE ${k.sql} END"
    val keyCol = when(mangleC, lit(null)).otherwise(k.col)
    val where = if (r.bool(0.5)) Some(pred(r, Seq(t))) else None
    val v = r.pick(t.longs)._1
    val sql =
      s"""SELECT $keySql AS k0, COUNT(*) AS a0,
         |  COUNT($keySql) AS a1,
         |  CAST(SUM(${v.sql}) AS BIGINT) AS a2,
         |  COUNT(DISTINCT $keySql) AS a3
         |FROM ${t.name}
         |${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |GROUP BY 1
         |${orderByAll(Seq("k0"))}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach { w => df = df.filter(w._2) }
      val g = df.groupBy(keyCol.as("k0"))
        .agg(count(lit(1)).as("a0"), count(keyCol).as("a1"),
          sum(v.col).cast("long").as("a2"),
          countDistinct(keyCol).as("a3"))
      sortAll(g, Seq("k0"))
    }
    FuzzCase(seed, "nullkey_agg", sql, build)
  }

  /** DECIMAL window sums: a running SUM over a DECIMAL(18,2) money
    * column under an explicit ROWS frame with the full unique tie-break.
    * The window ORDER BY ranks the DECIMAL itself (decimal comparison
    * stays under test), but every FINAL output — the value column and
    * the running sum — is cast to BIGINT cents in both renderings: the
    * round-9 DECIMAL(38,2) finals were value-identical yet driver-hash-
    * unstable (pyarrow Decimal trailing zeros vs DuckDB-pandas float64),
    * and seed 3007 passed only because no cell happened to end in zero.
    * Input derived via the exact FLOOR(m*100+0.5) integer route — see
    * genDecimalAgg for the tie-class rationale. Output bounded by the
    * keyed modulo sample, sorted on every column. */
  private def genWinDecimal(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables.filter(t => moneyCols.contains(t.name)))
    val m = moneyCols(t.name)
    val k = r.pick(t.groupables)
    val desc = r.bool(0.5)
    val where = if (r.bool(0.6)) Some(pred(r, Seq(t))) else None
    val uAliases = t.uniq.indices.map(i => s"u$i")
    val mod = 101L + r.int(200)
    val dir = if (desc) "DESC NULLS LAST" else "ASC NULLS FIRST"
    val uSql = t.uniq.zip(uAliases).map { case (e, a) => s"${e.sql} AS $a" }
    val decSql =
      s"CAST(CAST(FLOOR($m * 100 + 0.5) AS BIGINT) AS DECIMAL(18,2))"
    val tieOrd = (s"$decSql $dir" +:
      t.uniq.map(u => s"${u.sql} ASC NULLS FIRST")).mkString(", ")
    val outCols = Seq("k0") ++ uAliases ++ Seq("dv", "running")
    val sql =
      s"""SELECT ${outCols.mkString(", ")} FROM (
         |  SELECT ${k.sql} AS k0, ${uSql.mkString(", ")},
         |    CAST($decSql AS BIGINT) AS dv,
         |    CAST(SUM($decSql) OVER (PARTITION BY ${k.sql}
         |      ORDER BY $tieOrd
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS running
         |  FROM ${t.name}
         |  ${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |) WHERE (u0 % $mod) = 0
         |${orderByAll(outCols)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach { w => df = df.filter(w._2) }
      val dec = floor(col(m) * lit(100) + lit(0.5)).cast("long")
        .cast("decimal(18,2)")
      val ord = (if (desc) dec.desc_nulls_last else dec.asc_nulls_first) +:
        t.uniq.map(_.col.asc_nulls_first)
      val wf = Window.partitionBy(k.col).orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val out = df
        .withColumn("running",
          sum(dec).over(wf).cast("long"))
        .select((k.col.as("k0") +:
          t.uniq.zip(uAliases).map { case (e, a) => e.col.as(a) }) ++
          Seq(dec.cast("long").as("dv"), col("running")): _*)
        .filter(col("u0") % mod === 0)
      sortAll(out, outCols)
    }
    FuzzCase(seed, "win_decimal", sql, build)
  }

  // ---- grammar v4 (seeds >= 4000) --------------------------------------
  // The cross-engine classes earlier grammars never draw (round-9 verdict
  // ask #5): calendar date/interval arithmetic (month-end clamping,
  // last_day, month truncation — F-d1/d2 territory), RANGE frames with a
  // numeric offset over a TIED order key (peers-inclusive frame-end
  // semantics), and string ordering under binary collation (case/length
  // ties through RANK / DENSE_RANK vs ROW_NUMBER). All date arithmetic is
  // written in the Spark∩DuckDB intersection: `d + INTERVAL k DAY/MONTH`
  // (never `date + int`, which Spark's ANSI mode rejects), function names
  // both engines share (last_day, date_trunc, year/month/day), and every
  // final column is DATE / BIGINT / STRING per the registry conventions.

  /** Per-table raw date column (TIMESTAMP-at-midnight on disk → CAST to
    * DATE in both renderings). */
  private val dateCols: Map[String, String] = Map(
    "lineitem" -> "l_shipdate", "orders" -> "o_orderdate")

  /** Date/interval arithmetic GROUP BY: the group key is a seeded
    * calendar derivation — month addition (end-of-month CLAMPING: both
    * engines map Jan-31 +1mo to Feb-29), day-interval addition, last_day,
    * month truncation, or the year*100+month integer encoding — with an
    * optional date-literal range predicate. Aggregates follow the BIGINT
    * convention; MIN over the raw date probes date ordering. */
  private def genDateArith(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables.filter(t => dateCols.contains(t.name)))
    val d = dateCols(t.name)
    val dd = s"CAST($d AS DATE)"
    val ddCol = col(d).cast("date")
    val (keySql, keyCol): (String, Column) = r.int(5) match {
      case 0 =>
        val m = 1 + r.int(11)
        (s"CAST($dd + INTERVAL $m MONTH AS DATE)", add_months(ddCol, m))
      case 1 =>
        val k = 1 + r.int(400)
        (s"CAST($dd + INTERVAL $k DAY AS DATE)", date_add(ddCol, k))
      case 2 => (s"last_day($dd)", last_day(ddCol))
      case 3 => (s"CAST(date_trunc('month', $dd) AS DATE)",
        date_trunc("month", ddCol).cast("date"))
      case _ => (s"CAST(year($dd) * 100 + month($dd) AS BIGINT)",
        (year(ddCol) * 100 + month(ddCol)).cast("long"))
    }
    val v = r.pick(t.longs)._1
    // optional seeded date-literal window + optional generic predicate
    val datePred: Option[(String, Column)] = if (r.bool(0.6)) {
      val y1 = 1992 + r.int(6)
      val y2 = y1 + 1 + r.int(3)
      val m1 = 1 + r.int(12)
      val lo = f"$y1%04d-$m1%02d-01"
      val hi = f"$y2%04d-${1 + r.int(12)}%02d-28"
      Some((s"$dd >= DATE '$lo' AND $dd <= DATE '$hi'",
        ddCol >= lit(lo).cast("date") && ddCol <= lit(hi).cast("date")))
    } else None
    val where = if (r.bool(0.5)) Some(pred(r, Seq(t))) else None
    val withMin = r.bool(0.5)
    val aggSql = Seq(
      "COUNT(*) AS a0",
      s"CAST(SUM(${v.sql}) AS BIGINT) AS a1") ++
      (if (withMin) Seq(s"MIN($dd) AS a2") else Seq.empty)
    val aggCols = Seq(count(lit(1)).as("a0"),
      sum(v.col).cast("long").as("a1")) ++
      (if (withMin) Seq(min(ddCol).as("a2")) else Seq.empty)
    val whereSql = (datePred.map(_._1).toSeq ++
      where.map(w => s"(${w._1})").toSeq) match {
      case Nil => ""
      case ps  => "WHERE " + ps.mkString(" AND ")
    }
    val sql =
      s"""SELECT $keySql AS k0, ${aggSql.mkString(", ")}
         |FROM ${t.name}
         |$whereSql
         |GROUP BY 1
         |${orderByAll(Seq("k0"))}""".stripMargin
    val build = (s: SparkSession, dir: String) => {
      var df = t.load(s, dir)
      datePred.foreach { p => df = df.filter(p._2) }
      where.foreach { w => df = df.filter(w._2) }
      val g = df.groupBy(keyCol.as("k0"))
        .agg(aggCols.head, aggCols.tail: _*)
      sortAll(g, Seq("k0"))
    }
    FuzzCase(seed, "date_arith", sql, build)
  }

  /** RANGE frame with a NUMERIC OFFSET over a tied integer order key:
    * `RANGE BETWEEN w PRECEDING AND CURRENT ROW` where the order key is
    * a (deliberately non-unique) long column, so the frame end includes
    * ALL PEERS of the current row — the tie semantics ROWS frames never
    * exercise and a classic cross-engine divergence spot. SUM/COUNT/
    * MIN/MAX flavors; output bounded by the keyed modulo sample and
    * sorted on every column (peers share w0, so identical rows are
    * hash-equivalent). */
  private def genRangeWin(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables)
    val k = r.pick(t.groupables)
    val v = r.pick(t.longs)._1
    val ok = r.pick(t.longs)._1
    val w = 1 + r.int(50)
    val where = if (r.bool(0.6)) Some(pred(r, Seq(t))) else None
    val uAliases = t.uniq.indices.map(i => s"u$i")
    val mod = 101L + r.int(200)
    val uSql = t.uniq.zip(uAliases).map { case (e, a) => s"${e.sql} AS $a" }
    val frame = s"RANGE BETWEEN $w PRECEDING AND CURRENT ROW"
    val kind = r.int(4)
    val (winSql, winCol) = kind match {
      case 0 => (s"CAST(SUM(${v.sql}) OVER (PARTITION BY ${k.sql} " +
        s"ORDER BY ${ok.sql} ASC $frame) AS BIGINT) AS w0",
        sum(v.col).cast("long").as("w0"))
      case 1 => (s"CAST(COUNT(*) OVER (PARTITION BY ${k.sql} " +
        s"ORDER BY ${ok.sql} ASC $frame) AS BIGINT) AS w0",
        count(lit(1)).cast("long").as("w0"))
      case 2 => (s"MIN(${v.sql}) OVER (PARTITION BY ${k.sql} " +
        s"ORDER BY ${ok.sql} ASC $frame) AS w0",
        min(v.col).as("w0"))
      case _ => (s"MAX(${v.sql}) OVER (PARTITION BY ${k.sql} " +
        s"ORDER BY ${ok.sql} ASC $frame) AS w0",
        max(v.col).as("w0"))
    }
    val outCols = Seq("k0") ++ uAliases ++ Seq("ok", "w0")
    val sql =
      s"""SELECT ${outCols.mkString(", ")} FROM (
         |  SELECT ${k.sql} AS k0, ${uSql.mkString(", ")},
         |    ${ok.sql} AS ok,
         |    $winSql
         |  FROM ${t.name}
         |  ${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |) WHERE (u0 % $mod) = 0
         |${orderByAll(outCols)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach { w => df = df.filter(w._2) }
      val wf = Window.partitionBy(k.col).orderBy(ok.col.asc)
        .rangeBetween(-w.toLong, 0L)
      val agg = kind match {
        case 0 => sum(v.col).over(wf).cast("long")
        case 1 => count(lit(1)).over(wf).cast("long")
        case 2 => min(v.col).over(wf)
        case _ => max(v.col).over(wf)
      }
      val out = df
        .withColumn("w0", agg)
        .select((k.col.as("k0") +:
          t.uniq.zip(uAliases).map { case (e, a) => e.col.as(a) }) ++
          Seq(ok.col.as("ok"), col("w0")): _*)
        .filter(col("u0") % mod === 0)
      sortAll(out, outCols)
    }
    FuzzCase(seed, s"range_win_$kind", sql, build)
  }

  /** String ordering under binary collation: a seeded string derivation
    * (raw / lower / substr prefix / reverse / concat) ranked per group by
    * ROW_NUMBER (full unique tie-break) or RANK / DENSE_RANK over a
    * deliberately TIE-HEAVY order (optionally length-first) — rank values
    * under ties are order-independent, which is exactly the cross-engine
    * property under test. Output bounded by the keyed modulo sample,
    * sorted on every column. */
  private def genStrOrder(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables.filter(t =>
      t.strings.nonEmpty || t.likes.nonEmpty))
    val sc = r.pick(t.strings.map(_._1) ++ t.likes.map(_._1))
    val k = r.pick(t.groupables)
    val (svSql, svCol): (String, Column) = r.int(5) match {
      case 0 => (sc.sql, sc.col)
      case 1 => (s"lower(${sc.sql})", lower(sc.col))
      case 2 =>
        val j = 1 + r.int(4)
        (s"substr(${sc.sql}, 1, $j)", substring(sc.col, 1, j))
      case 3 => (s"reverse(${sc.sql})", reverse(sc.col))
      case _ => (s"${sc.sql} || '_x'", concat(sc.col, lit("_x")))
    }
    val desc = r.bool(0.5)
    val byLen = r.bool(0.5)
    val rankKind = r.int(3) // 0 row_number / 1 rank / 2 dense_rank
    val where = if (r.bool(0.6)) Some(pred(r, Seq(t))) else None
    val uAliases = t.uniq.indices.map(i => s"u$i")
    val mod = 101L + r.int(200)
    val dir = if (desc) "DESC NULLS LAST" else "ASC NULLS FIRST"
    val uSql = t.uniq.zip(uAliases).map { case (e, a) => s"${e.sql} AS $a" }
    val lenSql = s"CAST(length($svSql) AS BIGINT)"
    // ROW_NUMBER needs a total order (unique tie-break); RANK/DENSE_RANK
    // deliberately keep the ties
    val ordTerms =
      (if (byLen) Seq(s"$lenSql $dir", s"$svSql ASC NULLS FIRST")
       else Seq(s"$svSql $dir")) ++
      (if (rankKind == 0) t.uniq.map(u => s"${u.sql} ASC NULLS FIRST")
       else Seq.empty)
    val fnSql = rankKind match {
      case 0 => "ROW_NUMBER()"
      case 1 => "RANK()"
      case _ => "DENSE_RANK()"
    }
    val outCols = Seq("k0") ++ uAliases ++ Seq("sv", "rn")
    val sql =
      s"""SELECT ${outCols.mkString(", ")} FROM (
         |  SELECT ${k.sql} AS k0, ${uSql.mkString(", ")},
         |    $svSql AS sv,
         |    CAST($fnSql OVER (PARTITION BY ${k.sql}
         |      ORDER BY ${ordTerms.mkString(", ")}) AS BIGINT) AS rn
         |  FROM ${t.name}
         |  ${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |) WHERE (u0 % $mod) = 0
         |${orderByAll(outCols)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach { w => df = df.filter(w._2) }
      val lenCol = length(svCol).cast("long")
      val ordCols =
        (if (byLen)
           Seq(if (desc) lenCol.desc_nulls_last else lenCol.asc_nulls_first,
             svCol.asc_nulls_first)
         else
           Seq(if (desc) svCol.desc_nulls_last
             else svCol.asc_nulls_first)) ++
        (if (rankKind == 0) t.uniq.map(_.col.asc_nulls_first)
         else Seq.empty)
      val wf = Window.partitionBy(k.col).orderBy(ordCols: _*)
      val fn = rankKind match {
        case 0 => row_number()
        case 1 => rank()
        case _ => dense_rank()
      }
      val out = df
        .withColumn("rn", fn.over(wf).cast("long"))
        .select((k.col.as("k0") +:
          t.uniq.zip(uAliases).map { case (e, a) => e.col.as(a) }) ++
          Seq(svCol.as("sv"), col("rn")): _*)
        .filter(col("u0") % mod === 0)
      sortAll(out, outCols)
    }
    FuzzCase(seed, s"str_order_$rankKind", sql, build)
  }

  // ---- grammar v5 (seeds >= 5000) --------------------------------------
  // Multi-level grouping and scalar-typing classes (round-10 widening):
  // ROLLUP / CUBE with GROUPING() disambiguation (subtotal NULL keys vs
  // genuine NULLs — a classic cross-engine result-shape divergence),
  // NULLIF / COALESCE / multi-branch CASE derivations (branch typing and
  // null propagation), and signed modulo arithmetic ((x−c) % m with
  // negative dividends — both engines keep the dividend's sign, unlike
  // their integer-DIVISION semantics, which are deliberately NOT fuzzed:
  // Spark div truncates while DuckDB // floors, the engine's documented
  // sign-safe-floor convention territory).

  /** ROLLUP / CUBE over two keys with GROUPING() flags: subtotal rows
    * carry NULL keys, so the flags are part of the output identity (a
    * (k0,k1,g0,g1) tuple is unique per grouping-set cell). Both engines
    * order the NULL subtotal keys by the explicit NULLS FIRST. Keys are
    * pre-projected in a subquery so GROUPING() references plain column
    * names in both renderings.
    *
    * FOUND DIVERGENCE (v5's first sweep, seed 5085): over EMPTY input,
    * DuckDB follows the SQL standard and still emits the grand-total
    * `()` grouping-set row (COUNT 0, NULL sums) while Spark's
    * rollup/cube emit zero rows. `HAVING COUNT(*) > 0` pins the shared
    * semantics: a no-op on non-empty input (every present cell counts
    * ≥ 1, so the grand-total row stays covered), and on empty input it
    * removes the one row only DuckDB produces. */
  private def genRollup(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables.filter(_.groupables.size >= 2))
    val ks = scala.util.Random.javaRandomToRandom(
      new java.util.Random(seed * 53 + 23)).shuffle(t.groupables).take(2)
    val v = r.pick(t.longs)._1
    val useCube = r.bool(0.4)
    val op = if (useCube) "CUBE" else "ROLLUP"
    val where = if (r.bool(0.6)) Some(pred(r, Seq(t))) else None
    val ordCols = Seq("k0", "k1", "g0", "g1")
    val sql =
      s"""SELECT k0, k1,
         |  CAST(GROUPING(k0) AS BIGINT) AS g0,
         |  CAST(GROUPING(k1) AS BIGINT) AS g1,
         |  COUNT(*) AS a0, CAST(SUM(vv) AS BIGINT) AS a1
         |FROM (
         |  SELECT ${ks(0).sql} AS k0, ${ks(1).sql} AS k1, ${v.sql} AS vv
         |  FROM ${t.name}
         |  ${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |)
         |GROUP BY $op(k0, k1)
         |HAVING COUNT(*) > 0
         |${orderByAll(ordCols)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach { w => df = df.filter(w._2) }
      val base = df.select(ks(0).col.as("k0"), ks(1).col.as("k1"),
        v.col.as("vv"))
      val grouped =
        if (useCube) base.cube(col("k0"), col("k1"))
        else base.rollup(col("k0"), col("k1"))
      val g = grouped.agg(
        grouping(col("k0")).cast("long").as("g0"),
        grouping(col("k1")).cast("long").as("g1"),
        count(lit(1)).as("a0"),
        sum(col("vv")).cast("long").as("a1"))
        .filter(col("a0") > 0)
      sortAll(g, ordCols)
    }
    FuzzCase(seed, if (useCube) "cube_agg" else "rollup_agg", sql, build)
  }

  /** NULLIF / COALESCE / multi-branch CASE group-key derivations: null
    * propagation through scalar functions lands genuine NULL group keys
    * (the one-NULL-group rule again, now scalar-made), and branch typing
    * must agree across engines. The DataFrame build renders NULLIF via
    * its CASE definition — an independent derivation of the same
    * semantics. */
  private def genScalarTyping(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables)
    val (keySql, keyCol): (String, Column) = r.int(4) match {
      case 0 if t.strings.nonEmpty =>
        val (e, vals) = r.pick(t.strings)
        val pick = r.pick(vals)
        (s"COALESCE(NULLIF(${e.sql}, ${sq(pick)}), 'none')",
          coalesce(when(e.col === pick, lit(null)).otherwise(e.col),
            lit("none")))
      case 1 =>
        val (e, _, _) = r.pick(t.longs)
        val m = 2L + r.int(9)
        val wrap = r.bool(0.5) // unwrapped → a GENUINE NULL group key
        val nf = when((e.col % m) === 0, lit(null)).otherwise(e.col % m)
        if (wrap)
          (s"COALESCE(NULLIF(${e.sql} % $m, 0), -1)",
            coalesce(nf, lit(-1L)))
        else (s"NULLIF(${e.sql} % $m, 0)", nf)
      case 2 =>
        val (e, lo, hi) = r.pick(t.longs)
        val c1 = lo + (hi - lo) * 2 / 3
        val c2 = lo + (hi - lo) / 3
        (s"CASE WHEN ${e.sql} > $c1 THEN 'hi' " +
          s"WHEN ${e.sql} > $c2 THEN 'mid' ELSE 'lo' END",
          when(e.col > c1, "hi").when(e.col > c2, "mid").otherwise("lo"))
      case _ =>
        val (x, _, _) = r.pick(t.longs)
        val (y, _, _) = r.pick(t.longs)
        val a = 3L + r.int(20); val b = 3L + r.int(20)
        val fn = if (r.bool(0.5)) "GREATEST" else "LEAST"
        val cc = if (fn == "GREATEST") greatest(x.col % a, y.col % b)
          else least(x.col % a, y.col % b)
        (s"CAST($fn(${x.sql} % $a, ${y.sql} % $b) AS BIGINT)",
          cc.cast("long"))
    }
    val v = r.pick(t.longs)._1
    val where = if (r.bool(0.6)) Some(pred(r, Seq(t))) else None
    val sql =
      s"""SELECT $keySql AS k0, COUNT(*) AS a0,
         |  CAST(SUM(${v.sql}) AS BIGINT) AS a1,
         |  COUNT($keySql) AS a2
         |FROM ${t.name}
         |${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |GROUP BY 1
         |${orderByAll(Seq("k0"))}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach { w => df = df.filter(w._2) }
      val g = df.groupBy(keyCol.as("k0"))
        .agg(count(lit(1)).as("a0"), sum(v.col).cast("long").as("a1"),
          count(keyCol).as("a2"))
      sortAll(g, Seq("k0"))
    }
    FuzzCase(seed, "scalar_typing", sql, build)
  }

  /** Signed modulo arithmetic: the group key is (x − c) % m with c inside
    * x's range, so NEGATIVE dividends occur and the remainder's sign
    * (dividend's, in both engines) is on the hash path; an ABS variant
    * folds the sign back. Integer division is deliberately excluded —
    * Spark `div` truncates, DuckDB `//` floors (the engine's sign-safe
    * floor-form convention exists precisely because of it). */
  private def genModArith(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables)
    val (x, lo, hi) = r.pick(t.longs)
    val c = lo + 1 + r.int(math.max(1, (hi - lo).toInt - 1))
    val m = 3L + r.int(30)
    val useAbs = r.bool(0.4)
    val (keySql, keyCol) =
      if (useAbs)
        (s"CAST(abs((${x.sql} - $c) % $m) AS BIGINT)",
          abs((x.col - c) % m).cast("long"))
      else
        (s"CAST((${x.sql} - $c) % $m AS BIGINT)",
          ((x.col - c) % m).cast("long"))
    val v = r.pick(t.longs)._1
    val where = if (r.bool(0.6)) Some(pred(r, Seq(t))) else None
    val aggs = scala.collection.mutable.ArrayBuffer[(String, Column)]()
    aggs += (("COUNT(*) AS a0", count(lit(1)).as("a0")))
    aggs += ((s"CAST(SUM(${v.sql}) AS BIGINT) AS a1",
      sum(v.col).cast("long").as("a1")))
    if (r.bool(0.5))
      aggs += ((s"CAST(MIN((${x.sql} - $c) % $m) AS BIGINT) AS a2",
        min((x.col - c) % m).cast("long").as("a2")))
    val sql =
      s"""SELECT $keySql AS k0, ${aggs.map(_._1).mkString(", ")}
         |FROM ${t.name}
         |${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |GROUP BY 1
         |${orderByAll(Seq("k0"))}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach { w => df = df.filter(w._2) }
      val g = df.groupBy(keyCol.as("k0"))
        .agg(aggs.head._2, aggs.tail.map(_._2).toSeq: _*)
      sortAll(g, Seq("k0"))
    }
    FuzzCase(seed, if (useAbs) "mod_abs" else "mod_signed", sql, build)
  }

  // ---- grammar v6 (seeds >= 6000) --------------------------------------
  // Join-shape widening (round-10): every earlier fuzz family joins at
  // most two tables with a plain inner/left equi-ON. v6 adds the
  // remaining join classes: FULL OUTER (unmatched rows from BOTH sides
  // land NULL keys in one output), LEFT JOIN with residual ON-clause
  // predicates (ON-vs-WHERE placement is the classic outer-join semantic
  // trap — a right-side predicate in ON keeps the left row with a NULL
  // right side, the same predicate in WHERE drops it), three-table join
  // chains with mixed INNER/LEFT steps, and aggregate FILTER clauses
  // (`agg(x) FILTER (WHERE p)` vs the independent `agg(CASE WHEN p THEN
  // x END)` derivation).

  /** FULL OUTER join + aggregation. Each side is pre-filtered in an
    * aliased subquery so BOTH unmatched classes are populated (FK
    * integrity would otherwise leave the left side fully matched):
    * removing right rows orphans their left partners, and right keys
    * with no left partner in the filtered slice orphan the other way.
    * Group keys draw one groupable from EACH side (NULL on whichever
    * side is unmatched); SUMs are COALESCE'd and CAST to BIGINT in both
    * renderings (DuckDB SUM→HUGEINT). */
  private def genFullJoin(r: Rng, seed: Long): FuzzCase = {
    val j = r.pick(joins)
    val lp = if (r.bool(0.5)) Some(pred(r, Seq(j.left))) else None
    val rp = if (r.bool(0.7)) Some(pred(r, Seq(j.right))) else None
    val lk = r.pick(j.left.groupables)
    val rk = r.pick(j.right.groupables)
    val kAliases = Seq("k0", "k1")
    val lv = r.pick(j.left.longs)._1
    val rv = r.pick(j.right.longs)._1
    val aggs = scala.collection.mutable.ArrayBuffer[(String, Column)]()
    aggs += (("COUNT(*) AS a0", count(lit(1)).as("a0")))
    aggs += ((s"CAST(COALESCE(SUM(${rv.sql}), 0) AS BIGINT) AS a1",
      coalesce(sum(rv.col), lit(0L)).cast("long").as("a1")))
    aggs += ((s"COUNT(${rv.sql}) AS a2", count(rv.col).as("a2")))
    if (r.bool(0.6))
      aggs += ((s"CAST(COALESCE(SUM(${lv.sql}), 0) AS BIGINT) AS a3",
        coalesce(sum(lv.col), lit(0L)).cast("long").as("a3")))
    def side(name: String, p: Option[(String, Column)], alias: String) =
      p.map(w => s"(SELECT * FROM $name WHERE ${w._1}) $alias")
        .getOrElse(name)
    val sql =
      s"""SELECT ${lk.sql} AS k0, ${rk.sql} AS k1,
         |  ${aggs.map(_._1).mkString(", ")}
         |FROM ${side(j.left.name, lp, "ls")}
         |FULL JOIN ${side(j.right.name, rp, "rs")}
         |  ON ${j.lk.sql} = ${j.rk.sql}
         |GROUP BY 1, 2
         |${orderByAll(kAliases)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var l = j.left.load(s, d); lp.foreach(w => l = l.filter(w._2))
      var rt = j.right.load(s, d); rp.foreach(w => rt = rt.filter(w._2))
      val df = l.join(rt, j.lk.col === j.rk.col, "full_outer")
      val g = df.groupBy(lk.col.as("k0"), rk.col.as("k1"))
        .agg(aggs.head._2, aggs.tail.map(_._2).toSeq: _*)
      sortAll(g, kAliases)
    }
    FuzzCase(seed, "full_join", sql, build)
  }

  /** LEFT JOIN with a RESIDUAL ON-clause predicate — the right-side (and
    * occasionally left-side) predicate lives in ON, not WHERE, so a left
    * row whose partner fails it still appears with a NULL right side.
    * This placement semantics is exactly what a WHERE rewrite would get
    * wrong, and each engine must implement it identically. */
  private def genLeftResidual(r: Rng, seed: Long): FuzzCase = {
    val j = r.pick(joins)
    val rp = pred(r, Seq(j.right))
    val lAtom = if (r.bool(0.35)) Some(atom(r, j.left)) else None
    val where = if (r.bool(0.5)) Some(pred(r, Seq(j.left))) else None
    val lk = r.pick(j.left.groupables)
    val keys = if (r.bool(0.5)) Seq(lk, r.pick(j.right.groupables))
      else Seq(lk)
    val kAliases = keys.indices.map(i => s"k$i")
    val rv = r.pick(j.right.longs)._1
    val rStrs = j.right.strings.map(_._1) ++ j.right.likes.map(_._1)
    val aggs = scala.collection.mutable.ArrayBuffer[(String, Column)]()
    aggs += (("COUNT(*) AS a0", count(lit(1)).as("a0")))
    aggs += ((s"COUNT(${rv.sql}) AS a1", count(rv.col).as("a1")))
    aggs += ((s"CAST(COALESCE(SUM(${rv.sql}), 0) AS BIGINT) AS a2",
      coalesce(sum(rv.col), lit(0L)).cast("long").as("a2")))
    if (rStrs.nonEmpty && r.bool(0.5)) {
      val rs = r.pick(rStrs)
      aggs += ((s"COUNT(DISTINCT ${rs.sql}) AS a3",
        countDistinct(rs.col).as("a3")))
    }
    val onSql = (s"${j.lk.sql} = ${j.rk.sql} AND (${rp._1})" +:
      lAtom.map(a => s"(${a._1})").toSeq).mkString(" AND ")
    val onCol = lAtom.foldLeft(j.lk.col === j.rk.col && rp._2)(
      (c, a) => c && a._2)
    val kSql = keys.zip(kAliases).map { case (e, a) => s"${e.sql} AS $a" }
    val sql =
      s"""SELECT ${(kSql ++ aggs.map(_._1)).mkString(", ")}
         |FROM ${j.left.name} LEFT JOIN ${j.right.name} ON $onSql
         |${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |GROUP BY ${kAliases.indices.map(_ + 1).mkString(", ")}
         |${orderByAll(kAliases)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = j.left.load(s, d)
        .join(j.right.load(s, d), onCol, "left_outer")
      where.foreach(w => df = df.filter(w._2))
      val g = df.groupBy(keys.zip(kAliases)
          .map { case (e, a) => e.col.as(a) }: _*)
        .agg(aggs.head._2, aggs.tail.map(_._2).toSeq: _*)
      sortAll(g, kAliases)
    }
    FuzzCase(seed, "left_residual", sql, build)
  }

  /** Three-table join chains with mixed INNER/LEFT steps. The middle
    * (and last) table is occasionally pre-filtered in an aliased
    * subquery so a LEFT step actually produces unmatched rows (TPC-H FK
    * integrity would otherwise make LEFT ≡ INNER). Chains cover both the
    * path shape (l⋈o⋈c, o⋈c⋈n — the second key comes from the MIDDLE
    * table, so a LEFT first step feeds NULL keys into the second join)
    * and the star shape (l⋈p, l⋈s — both keys from the base table). */
  private def genJoin3(r: Rng, seed: Long): FuzzCase = {
    val chains = Seq(
      (lineitem, orders, L("l_orderkey"), L("o_orderkey"),
        customer, L("o_custkey"), L("c_custkey")),
      (orders, customer, L("o_custkey"), L("c_custkey"),
        nation, LI("c_nationkey"), LI("n_nationkey")),
      (lineitem, part, L("l_partkey"), L("p_partkey"),
        supplier, L("l_suppkey"), L("s_suppkey")))
    val (t0, t1, k1l, k1r, t2, k2l, k2r) = r.pick(chains)
    val jt1 = if (r.bool(0.35)) "LEFT JOIN" else "JOIN"
    val jt2 = if (r.bool(0.35)) "LEFT JOIN" else "JOIN"
    val p1 = if (r.bool(0.4)) Some(pred(r, Seq(t1))) else None
    val p2 = if (r.bool(0.4)) Some(pred(r, Seq(t2))) else None
    val where = if (r.bool(0.5)) Some(pred(r, Seq(t0))) else None
    val allGroup = Seq(t0, t1, t2).flatMap(_.groupables)
    val keys = scala.util.Random.javaRandomToRandom(
      new java.util.Random(seed * 61 + 29)).shuffle(allGroup)
      .take(1 + r.int(2))
    val kAliases = keys.indices.map(i => s"k$i")
    val v1 = r.pick(t1.longs)._1
    val v2 = r.pick(t2.longs)._1
    val aggs = scala.collection.mutable.ArrayBuffer[(String, Column)]()
    aggs += (("COUNT(*) AS a0", count(lit(1)).as("a0")))
    aggs += ((s"CAST(COALESCE(SUM(${v2.sql}), 0) AS BIGINT) AS a1",
      coalesce(sum(v2.col), lit(0L)).cast("long").as("a1")))
    aggs += ((s"COUNT(${v1.sql}) AS a2", count(v1.col).as("a2")))
    if (r.bool(0.5))
      aggs += ((s"COUNT(${v2.sql}) AS a3", count(v2.col).as("a3")))
    def side(t: FTab, p: Option[(String, Column)], alias: String) =
      p.map(w => s"(SELECT * FROM ${t.name} WHERE ${w._1}) $alias")
        .getOrElse(t.name)
    val kSql = keys.zip(kAliases).map { case (e, a) => s"${e.sql} AS $a" }
    val sql =
      s"""SELECT ${(kSql ++ aggs.map(_._1)).mkString(", ")}
         |FROM ${t0.name}
         |$jt1 ${side(t1, p1, "j1")} ON ${k1l.sql} = ${k1r.sql}
         |$jt2 ${side(t2, p2, "j2")} ON ${k2l.sql} = ${k2r.sql}
         |${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |GROUP BY ${kAliases.indices.map(_ + 1).mkString(", ")}
         |${orderByAll(kAliases)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var d1 = t1.load(s, d); p1.foreach(w => d1 = d1.filter(w._2))
      var d2 = t2.load(s, d); p2.foreach(w => d2 = d2.filter(w._2))
      var df = t0.load(s, d)
        .join(d1, k1l.col === k1r.col,
          if (jt1 == "LEFT JOIN") "left_outer" else "inner")
        .join(d2, k2l.col === k2r.col,
          if (jt2 == "LEFT JOIN") "left_outer" else "inner")
      where.foreach(w => df = df.filter(w._2))
      val g = df.groupBy(keys.zip(kAliases)
          .map { case (e, a) => e.col.as(a) }: _*)
        .agg(aggs.head._2, aggs.tail.map(_._2).toSeq: _*)
      sortAll(g, kAliases)
    }
    FuzzCase(seed, "join3", sql, build)
  }

  /** Aggregate FILTER clauses: `agg(x) FILTER (WHERE p)` in the shared
    * SQL vs the independent `agg(CASE WHEN p THEN x END)` DataFrame
    * derivation (count/sum/min skip NULLs, so the CASE form is the
    * FILTER form's definition). Empty-filter groups exercise the
    * identity cells: COUNT→0, SUM/MIN→NULL (COALESCE'd to a sentinel in
    * both renderings, CAST to BIGINT against DuckDB's HUGEINT SUM). */
  private def genAggFilter(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables)
    val nk = 1 + r.int(math.min(2, t.groupables.size))
    val keys = scala.util.Random.javaRandomToRandom(
      new java.util.Random(seed * 67 + 31)).shuffle(t.groupables).take(nk)
    val kAliases = keys.indices.map(i => s"k$i")
    val where = if (r.bool(0.5)) Some(pred(r, Seq(t))) else None
    val aggs = scala.collection.mutable.ArrayBuffer[(String, Column)]()
    aggs += (("COUNT(*) AS a0", count(lit(1)).as("a0")))
    val (fp1S, fp1C) = atom(r, t)
    aggs += ((s"COUNT(*) FILTER (WHERE $fp1S) AS a1",
      count(when(fp1C, lit(1))).as("a1")))
    val x = r.pick(t.longs)._1
    val (fp2S, fp2C) = atom(r, t)
    aggs += ((s"CAST(COALESCE(SUM(${x.sql}) FILTER (WHERE $fp2S), 0) " +
      s"AS BIGINT) AS a2",
      coalesce(sum(when(fp2C, x.col)), lit(0L)).cast("long").as("a2")))
    if (r.bool(0.6)) {
      val y = r.pick(t.longs)._1
      val (fp3S, fp3C) = atom(r, t)
      val fn = if (r.bool(0.5)) "MIN" else "MAX"
      val c = if (fn == "MIN") min(when(fp3C, y.col))
        else max(when(fp3C, y.col))
      aggs += ((s"CAST(COALESCE($fn(${y.sql}) FILTER (WHERE $fp3S), -1) " +
        s"AS BIGINT) AS a3",
        coalesce(c, lit(-1L)).cast("long").as("a3")))
    }
    val kSql = keys.zip(kAliases).map { case (e, a) => s"${e.sql} AS $a" }
    val sql =
      s"""SELECT ${(kSql ++ aggs.map(_._1)).mkString(", ")}
         |FROM ${t.name}
         |${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |GROUP BY ${kAliases.indices.map(_ + 1).mkString(", ")}
         |${orderByAll(kAliases)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach(w => df = df.filter(w._2))
      val g = df.groupBy(keys.zip(kAliases)
          .map { case (e, a) => e.col.as(a) }: _*)
        .agg(aggs.head._2, aggs.tail.map(_._2).toSeq: _*)
      sortAll(g, kAliases)
    }
    FuzzCase(seed, "agg_filter", sql, build)
  }

  // ---- grammar v7 (seeds >= 7000) --------------------------------------
  // Subquery and window-bucket classes: correlated EXISTS / NOT EXISTS
  // (each engine decorrelates into a semi/anti join — with an optional
  // NON-EQUI correlated predicate, which Spark plans as a mixed-condition
  // semi join), self-joins of two aggregated subqueries (groups present
  // on only one side under FULL exercise COALESCE'd keys and sentinel
  // aggregates), and NTILE bucket assignment next to RANK-with-real-ties
  // under one partitioned window.

  /** Correlated [NOT] EXISTS subquery + aggregation. The SQL rendering
    * leaves decorrelation to the engine; the DataFrame build IS the
    * decorrelated plan (left_semi / left_anti with the same compound
    * condition) — two independent derivations of the same semantics.
    * With probability 0.35 the correlation carries an extra non-equi
    * atom (`right.v > left.v`), the mixed-condition semi-join class no
    * other family reaches.
    *
    * FOUND DIVERGENCE (v7's first sweep, seed 7435): when the non-equi
    * atom lands on the SAME column pair as the equality
    * (`p_partkey = l_partkey AND p_partkey > l_partkey` — unsatisfiable,
    * so the correct answer is zero rows), DuckDB 1.0.0 answers zero ONLY
    * while those are the sole conjuncts; add any third subquery
    * predicate (minimal trigger: `AND p_partkey >= 190`) and its
    * decorrelation DROPS the contradictory conjunct and returns the
    * equality-only semi-join result (54 258 rows at sf0.01; Spark and
    * this DataFrame build both correctly return 0). Since the
    * same-column draw is degenerate anyway (an always-false EXISTS
    * exercises nothing but the empty result), the grammar EXCLUDES the
    * join-edge columns from the non-equi draw — every generated case
    * stays inside the oracle's correct range. */
  private def genExistsSub(r: Rng, seed: Long): FuzzCase = {
    val j = r.pick(joins)
    val t = j.left
    val anti = r.bool(0.4)
    val rp = pred(r, Seq(j.right))
    val ineq = if (r.bool(0.35)) {
      val rvs = j.right.longs.map(_._1).filterNot(_.sql == j.rk.sql)
      val lvs = t.longs.map(_._1).filterNot(_.sql == j.lk.sql)
      if (rvs.nonEmpty && lvs.nonEmpty) Some((r.pick(rvs), r.pick(lvs)))
      else None
    } else None
    val where = if (r.bool(0.5)) Some(pred(r, Seq(t))) else None
    val keys = scala.util.Random.javaRandomToRandom(
      new java.util.Random(seed * 71 + 37)).shuffle(t.groupables)
      .take(1 + r.int(2))
    val kAliases = keys.indices.map(i => s"k$i")
    val aggs = (0 until 1 + r.int(2)).map(i =>
      agg(r, t.longs.map(_._1),
        t.strings.map(_._1) ++ t.likes.map(_._1), s"a$i"))
    val kSql = keys.zip(kAliases).map { case (e, a) => s"${e.sql} AS $a" }
    val exOp = if (anti) "NOT EXISTS" else "EXISTS"
    val corr = (s"${j.rk.sql} = ${j.lk.sql} AND (${rp._1})" +:
      ineq.map { case (rv, lv) => s"${rv.sql} > ${lv.sql}" }.toSeq)
      .mkString(" AND ")
    val sql =
      s"""SELECT ${(kSql ++ aggs.map(_._1)).mkString(", ")}
         |FROM ${t.name}
         |WHERE $exOp
         |  (SELECT 1 FROM ${j.right.name} WHERE $corr)
         |${where.map(w => s"AND (${w._1})").getOrElse("")}
         |GROUP BY ${kAliases.indices.map(_ + 1).mkString(", ")}
         |${orderByAll(kAliases)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      val sub = j.right.load(s, d).filter(rp._2)
      val cond = ineq.foldLeft(j.lk.col === j.rk.col)(
        (c, p) => c && (p._1.col > p._2.col))
      var df = t.load(s, d).join(sub, cond,
        if (anti) "left_anti" else "left_semi")
      where.foreach(w => df = df.filter(w._2))
      val g = df.groupBy(keys.zip(kAliases)
          .map { case (e, a) => e.col.as(a) }: _*)
        .agg(aggs.head._2, aggs.tail.map(_._2).toSeq: _*)
      sortAll(g, kAliases)
    }
    FuzzCase(seed, if (anti) "not_exists" else "exists_sub", sql, build)
  }

  /** Self-join of two aggregated subqueries on the shared group key —
    * the same table grouped under two different predicates, joined
    * INNER or FULL. Under FULL, groups present on only one side carry a
    * NULL key on the other: the output key is COALESCE'd and every
    * aggregate gets a -1 sentinel, in both renderings. Group keys are
    * non-null source columns, so no NULL=NULL join-miss ambiguity. */
  private def genAggJoin(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables)
    val k = r.pick(t.groupables)
    val p1 = pred(r, Seq(t)); val p2 = pred(r, Seq(t))
    val full = r.bool(0.45)
    val x = r.pick(t.longs)._1
    val jt = if (full) "FULL JOIN" else "JOIN"
    val sql =
      s"""SELECT COALESCE(a.k0, b.k0) AS k0,
         |  COALESCE(a.c1, -1) AS c1, COALESCE(a.s1, -1) AS s1,
         |  COALESCE(b.c2, -1) AS c2
         |FROM (SELECT ${k.sql} AS k0, COUNT(*) AS c1,
         |        CAST(SUM(${x.sql}) AS BIGINT) AS s1
         |      FROM ${t.name} WHERE ${p1._1} GROUP BY 1) a
         |$jt (SELECT ${k.sql} AS k0, COUNT(*) AS c2
         |      FROM ${t.name} WHERE ${p2._1} GROUP BY 1) b
         |  ON a.k0 = b.k0
         |${orderByAll(Seq("k0"))}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      val a = t.load(s, d).filter(p1._2).groupBy(k.col.as("ak"))
        .agg(count(lit(1)).as("c1"), sum(x.col).cast("long").as("s1"))
      val b = t.load(s, d).filter(p2._2).groupBy(k.col.as("bk"))
        .agg(count(lit(1)).as("c2"))
      val joined = a.join(b, col("ak") === col("bk"),
        if (full) "full_outer" else "inner")
        .select(coalesce(col("ak"), col("bk")).as("k0"),
          coalesce(col("c1"), lit(-1L)).as("c1"),
          coalesce(col("s1"), lit(-1L)).as("s1"),
          coalesce(col("c2"), lit(-1L)).as("c2"))
      sortAll(joined, Seq("k0"))
    }
    FuzzCase(seed, if (full) "aggjoin_full" else "aggjoin_inner", sql, build)
  }

  /** NTILE bucket assignment next to RANK over REAL ties, both under one
    * partitioned window pass; rows are identified by a fully tie-broken
    * ROW_NUMBER and the output is the top-m per partition. NTILE's
    * uneven-bucket rule (first `count % n` buckets get the extra row)
    * must agree across engines; RANK orders by the value ALONE so tied
    * rows share a rank while the rn tie-break keeps the result set
    * deterministic. */
  private def genNtile(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables)
    val k = r.pick(t.groupables)
    val v = r.pick(t.longs)._1
    val nt = 2 + r.int(6)
    val m = 2 + r.int(3)
    val desc = r.bool(0.5)
    val where = if (r.bool(0.6)) Some(pred(r, Seq(t))) else None
    val uAliases = t.uniq.indices.map(i => s"u$i")
    val dir = if (desc) "DESC NULLS LAST" else "ASC NULLS FIRST"
    val ordFull = (s"${v.sql} $dir" +:
      t.uniq.map(u => s"${u.sql} ASC NULLS FIRST")).mkString(", ")
    val uSql = t.uniq.zip(uAliases).map { case (e, a) => s"${e.sql} AS $a" }
    val sql =
      s"""SELECT k0, ${uAliases.mkString(", ")}, b, rk, rn FROM (
         |  SELECT ${k.sql} AS k0, ${uSql.mkString(", ")},
         |    CAST(NTILE($nt) OVER (PARTITION BY ${k.sql}
         |      ORDER BY $ordFull) AS BIGINT) AS b,
         |    CAST(RANK() OVER (PARTITION BY ${k.sql}
         |      ORDER BY ${v.sql} $dir) AS BIGINT) AS rk,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY ${k.sql}
         |      ORDER BY $ordFull) AS BIGINT) AS rn
         |  FROM ${t.name}
         |  ${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |) WHERE rn <= $m
         |${orderByAll(Seq("k0", "rn"))}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach(w => df = df.filter(w._2))
      val vOrd = if (desc) v.col.desc_nulls_last else v.col.asc_nulls_first
      val full = Window.partitionBy(k.col)
        .orderBy(vOrd +: t.uniq.map(_.col.asc_nulls_first): _*)
      val tiesW = Window.partitionBy(k.col).orderBy(vOrd)
      val out = df
        .withColumn("b", ntile(nt).over(full).cast("long"))
        .withColumn("rk", rank().over(tiesW).cast("long"))
        .withColumn("rn", row_number().over(full).cast("long"))
        .select((k.col.as("k0") +:
          t.uniq.zip(uAliases).map { case (e, a) => e.col.as(a) }) ++
          Seq(col("b"), col("rk"), col("rn")): _*)
        .filter(col("rn") <= m)
      sortAll(out, Seq("k0", "rn"))
    }
    FuzzCase(seed, "ntile_rank", sql, build)
  }

  // ---- grammar v8 (seeds >= 8000) --------------------------------------
  // Correlated SCALAR subqueries in the select list (each left row gets
  // `(SELECT COUNT(*) FROM right WHERE rk = lk AND p)` — the engine must
  // decorrelate AND apply the COUNT-over-no-rows = 0 null-correction; the
  // DataFrame build is the decorrelated plan itself, a pre-aggregated
  // LEFT join with COALESCE 0), explicit GROUPING SETS (arbitrary subset
  // lattices beyond ROLLUP/CUBE's fixed ones, GROUPING() flags
  // disambiguating subtotal NULLs, the empty-input grand-total divergence
  // pinned out the genRollup way), and string-function-derived group keys
  // (UPPER / SUBSTR / LENGTH / CONCAT — the dialect-intersection string
  // surface).

  /** Correlated scalar COUNT subquery per left row, then aggregated.
    * The scalar count is 0 (not NULL) for unmatched rows in BOTH
    * engines — the classic COUNT-decorrelation null-correction — and the
    * DataFrame derivation makes that explicit: pre-aggregate the right
    * side, LEFT join, COALESCE(cnt, 0). */
  private def genScalarSub(r: Rng, seed: Long): FuzzCase = {
    val j = r.pick(joins)
    val t = j.left
    val rp = if (r.bool(0.7)) Some(pred(r, Seq(j.right))) else None
    val where = if (r.bool(0.6)) Some(pred(r, Seq(t))) else None
    val keys = scala.util.Random.javaRandomToRandom(
      new java.util.Random(seed * 73 + 41)).shuffle(t.groupables)
      .take(1 + r.int(2))
    val kAliases = keys.indices.map(i => s"k$i")
    val corr = (s"${j.rk.sql} = ${j.lk.sql}" +:
      rp.map(p => s"(${p._1})").toSeq).mkString(" AND ")
    val kSql = keys.zip(kAliases).map { case (e, a) => s"${e.sql} AS $a" }
    val sql =
      s"""SELECT ${kAliases.mkString(", ")},
         |  CAST(SUM(sc) AS BIGINT) AS a0, MAX(sc) AS a1, COUNT(*) AS a2
         |FROM (
         |  SELECT ${kSql.mkString(", ")},
         |    (SELECT COUNT(*) FROM ${j.right.name} WHERE $corr) AS sc
         |  FROM ${t.name}
         |  ${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |)
         |GROUP BY ${kAliases.indices.map(_ + 1).mkString(", ")}
         |${orderByAll(kAliases)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var rt = j.right.load(s, d)
      rp.foreach(p => rt = rt.filter(p._2))
      val cnts = rt.groupBy(j.rk.col.as("__rk"))
        .agg(count(lit(1)).as("__cnt"))
      var df = t.load(s, d)
      where.foreach(w => df = df.filter(w._2))
      val enriched = df.join(cnts, j.lk.col === col("__rk"), "left_outer")
        .withColumn("sc", coalesce(col("__cnt"), lit(0L)))
      val g = enriched.groupBy(keys.zip(kAliases)
          .map { case (e, a) => e.col.as(a) }: _*)
        .agg(sum(col("sc")).cast("long").as("a0"),
          max(col("sc")).as("a1"), count(lit(1)).as("a2"))
      sortAll(g, kAliases)
    }
    FuzzCase(seed, "scalar_sub", sql, build)
  }

  /** Explicit GROUPING SETS over two keys: a random non-empty subset of
    * the lattice {(k0,k1), (k0), (k1), ()}, always including at least
    * one proper subtotal so GROUPING() flags matter. Same empty-input
    * grand-total pin-out as genRollup (HAVING COUNT(*) > 0), same
    * pre-projected-key subquery so GROUPING() references plain names. */
  private def genGroupingSets(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables.filter(_.groupables.size >= 2))
    val ks = scala.util.Random.javaRandomToRandom(
      new java.util.Random(seed * 79 + 43)).shuffle(t.groupables).take(2)
    val v = r.pick(t.longs)._1
    // the full pair set is always present: Spark requires every
    // GROUPING()-referenced and projected key to appear in the UNION of
    // the chosen sets (GROUPING_COLUMN_MISMATCH otherwise), and (k0,k1)
    // covers both keys whatever the extra subtotal draw picks
    val extras = scala.util.Random.javaRandomToRandom(
      new java.util.Random(seed * 83 + 47))
      .shuffle(Seq("(k0)", "(k1)", "()")).take(1 + r.int(3))
    val sets = "(k0, k1)" +: extras
    val where = if (r.bool(0.6)) Some(pred(r, Seq(t))) else None
    val ordCols = Seq("k0", "k1", "g0", "g1")
    val sql =
      s"""SELECT k0, k1,
         |  CAST(GROUPING(k0) AS BIGINT) AS g0,
         |  CAST(GROUPING(k1) AS BIGINT) AS g1,
         |  COUNT(*) AS a0, CAST(SUM(vv) AS BIGINT) AS a1
         |FROM (
         |  SELECT ${ks(0).sql} AS k0, ${ks(1).sql} AS k1, ${v.sql} AS vv
         |  FROM ${t.name}
         |  ${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |)
         |GROUP BY GROUPING SETS (${sets.mkString(", ")})
         |HAVING COUNT(*) > 0
         |${orderByAll(ordCols)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach(w => df = df.filter(w._2))
      val base = df.select(ks(0).col.as("k0"), ks(1).col.as("k1"),
        v.col.as("vv"))
      val setCols: Seq[Seq[Column]] = sets.map {
        case "(k0, k1)" => Seq(col("k0"), col("k1"))
        case "(k0)"     => Seq(col("k0"))
        case "(k1)"     => Seq(col("k1"))
        case _          => Seq.empty[Column]
      }
      val g = base
        .groupingSets(setCols, col("k0"), col("k1"))
        .agg(grouping(col("k0")).cast("long").as("g0"),
          grouping(col("k1")).cast("long").as("g1"),
          count(lit(1)).as("a0"),
          sum(col("vv")).cast("long").as("a1"))
        .filter(col("a0") > 0)
      sortAll(g, ordCols)
    }
    FuzzCase(seed, "grouping_sets", sql, build)
  }

  /** String-function-derived group keys: UPPER, SUBSTR (1-based in both
    * dialects), LENGTH (widened — DuckDB emits int64, Spark INT), and
    * CONCAT of two string columns with a literal separator. */
  private def genStrFunc(r: Rng, seed: Long): FuzzCase = {
    val withStr = tables.filter(t => (t.strings ++ t.likes).nonEmpty)
    val t = r.pick(withStr)
    val strs = (t.strings.map(_._1) ++ t.likes.map(_._1)).distinct
    def key(): (String, Column) = r.int(4) match {
      case 0 =>
        val e = r.pick(strs)
        (s"UPPER(${e.sql})", upper(e.col))
      case 1 =>
        val e = r.pick(strs)
        val n = 1 + r.int(8)
        (s"SUBSTR(${e.sql}, 1, $n)", substring(e.col, 1, n))
      case 2 =>
        val e = r.pick(strs)
        (s"CAST(LENGTH(${e.sql}) AS BIGINT)", length(e.col).cast("long"))
      case _ =>
        val a = r.pick(strs); val b = r.pick(strs)
        (s"CONCAT(${a.sql}, '_', ${b.sql})",
          concat(a.col, lit("_"), b.col))
    }
    val nk = 1 + r.int(2)
    val keys = (0 until nk).map(_ => key())
    val kAliases = keys.indices.map(i => s"k$i")
    val v = r.pick(t.longs)._1
    val where = if (r.bool(0.6)) Some(pred(r, Seq(t))) else None
    val aggs = scala.collection.mutable.ArrayBuffer[(String, Column)]()
    aggs += (("COUNT(*) AS a0", count(lit(1)).as("a0")))
    aggs += ((s"CAST(SUM(${v.sql}) AS BIGINT) AS a1",
      sum(v.col).cast("long").as("a1")))
    if (r.bool(0.5)) {
      val e = r.pick(strs)
      aggs += ((s"COUNT(DISTINCT SUBSTR(${e.sql}, 1, 4)) AS a2",
        countDistinct(substring(e.col, 1, 4)).as("a2")))
    }
    val kSql = keys.zip(kAliases).map { case ((s0, _), a) => s"$s0 AS $a" }
    val sql =
      s"""SELECT ${(kSql ++ aggs.map(_._1)).mkString(", ")}
         |FROM ${t.name}
         |${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |GROUP BY ${kAliases.indices.map(_ + 1).mkString(", ")}
         |${orderByAll(kAliases)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach(w => df = df.filter(w._2))
      val g = df.groupBy(keys.zip(kAliases)
          .map { case ((_, c), a) => c.as(a) }: _*)
        .agg(aggs.head._2, aggs.tail.map(_._2).toSeq: _*)
      sortAll(g, kAliases)
    }
    FuzzCase(seed, "str_func", sql, build)
  }

  /** GRAMMAR v9 (seeds >= 9000): Spark's relational PIVOT operator vs a
    * conditional-aggregate SQL twin — the first fuzz family to exercise
    * `RelationalGroupedDataset.pivot` itself. The twin is the textbook
    * rewrite (`agg(CASE WHEN p = 'v' THEN x END) AS p_i`), which both
    * engines run identically; the DataFrame side runs the real pivot
    * operator, so any drift in Spark's pivot lowering (PivotFirst vs the
    * expanded-aggregate path) against the rewrite semantics diverges.
    * The one KNOWN semantic seam is pinned by construction: a COUNT
    * pivot cell with no matching rows is NULL from Spark's pivot
    * (the (group, pivotval) combo never formed) but 0 from
    * `COUNT(CASE …)` — the build COALESCEs count cells to 0, and the
    * generator occasionally includes a nonexistent pivot value so the
    * all-empty column exercises exactly that seam. SUM cells keep NULL
    * (SUM over empty is NULL in both). */
  private def genPivot(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables.filter(_.strings.nonEmpty))
    val (pe, pvalsAll) = r.pick(t.strings)
    val shuffled = scala.util.Random.javaRandomToRandom(
      new java.util.Random(r.range(0, 1 << 30))).shuffle(pvalsAll)
    val base = shuffled.take(math.min(2 + r.int(3), pvalsAll.size))
    val pvals = if (r.bool(0.3)) base :+ "ZZZ" else base // empty column
    val gks = {
      val cands = t.groupables.filterNot(_.sql == pe.sql)
      val nk = 1 + r.int(math.min(2, cands.size))
      scala.util.Random.javaRandomToRandom(
        new java.util.Random(r.range(0, 1 << 30))).shuffle(cands).take(nk)
    }
    val kAliases = gks.indices.map(i => s"k$i")
    val v = r.pick(t.longs)._1
    val useCount = r.bool(0.4)
    val where = if (r.bool(0.6)) Some(pred(r, Seq(t))) else None
    val cellSql = pvals.zipWithIndex.map { case (pv, i) =>
      if (useCount)
        s"COUNT(CASE WHEN ${pe.sql} = ${sq(pv)} THEN 1 END) AS p$i"
      else
        s"CAST(SUM(CASE WHEN ${pe.sql} = ${sq(pv)} THEN ${v.sql} END)" +
          s" AS BIGINT) AS p$i"
    }
    val kSql = gks.zip(kAliases).map { case (e, a) => s"${e.sql} AS $a" }
    val sql =
      s"""SELECT ${(kSql ++ cellSql).mkString(", ")}
         |FROM ${t.name}
         |${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |GROUP BY ${kAliases.indices.map(_ + 1).mkString(", ")}
         |${orderByAll(kAliases)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach(w => df = df.filter(w._2))
      val piv = df.groupBy(gks.zip(kAliases)
          .map { case (e, a) => e.col.as(a) }: _*)
        .pivot(pe.col, pvals)
        .agg(if (useCount) count(lit(1)) else sum(v.col))
      val cells = pvals.zipWithIndex.map { case (pv, i) =>
        val c = piv.col(pv)
        if (useCount) coalesce(c, lit(0L)).as(s"p$i")
        else c.cast("long").as(s"p$i")
      }
      sortAll(piv.select(kAliases.map(col) ++ cells: _*), kAliases)
    }
    FuzzCase(seed, "pivot_condagg", sql, build)
  }

  /** GRAMMAR v9: explode / posexplode generators vs a UNION-ALL-branches
    * CTE twin. The DataFrame side runs Spark's real Generate operator
    * over `array(e0, …, em)`; the shared SQL expresses the identical
    * multiset as one UNION ALL branch per element (with the row filter
    * repeated per branch and the branch index as the `pos` column) —
    * the only cross-engine-parseable rendering of an unnest, and an
    * independently-derived one. Optional post-explode HAVING-style
    * filter on the exploded value lands as WHERE on the CTE. */
  private def genExplode(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables)
    val m = 2 + r.int(2) // 2..3 array elements (repeats allowed)
    val elems = (0 until m).map(_ => r.pick(t.longs))
    val gk = r.pick(t.groupables)
    val usePos = r.bool(0.4)
    val where = if (r.bool(0.6)) Some(pred(r, Seq(t))) else None
    val vFilter = if (r.bool(0.4)) {
      val (_, lo, hi) = r.pick(elems)
      Some(r.range(lo, hi))
    } else None
    val whereSql = where.map(w => s" WHERE ${w._1}").getOrElse("")
    val branches = elems.zipWithIndex.map { case ((e, _, _), i) =>
      s"SELECT ${gk.sql} AS k0, CAST($i AS BIGINT) AS pos, " +
        s"${e.sql} AS v FROM ${t.name}$whereSql"
    }
    val kAliases = if (usePos) Seq("k0", "pos") else Seq("k0")
    val aggSql = Seq("CAST(SUM(v) AS BIGINT) AS a0", "COUNT(*) AS a1",
      "MIN(v) AS a2")
    val sql =
      s"""WITH u AS (
         |${branches.mkString("\nUNION ALL\n")}
         |)
         |SELECT ${kAliases.mkString(", ")}, ${aggSql.mkString(", ")}
         |FROM u
         |${vFilter.map(x => s"WHERE v > $x").getOrElse("")}
         |GROUP BY ${kAliases.indices.map(_ + 1).mkString(", ")}
         |${orderByAll(kAliases)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach(w => df = df.filter(w._2))
      val arr = array(elems.map(_._1.col.cast("long")): _*)
      var ex =
        if (usePos) df.select(gk.col.as("k0"), posexplode(arr))
          .select(col("k0"), col("pos").cast("long").as("pos"),
            col("col").as("v"))
        else df.select(gk.col.as("k0"), explode(arr).as("v"))
      vFilter.foreach(x => ex = ex.filter(col("v") > x))
      val g = ex.groupBy(kAliases.map(col): _*)
        .agg(sum(col("v")).cast("long").as("a0"),
          count(lit(1)).as("a1"), min(col("v")).as("a2"))
      sortAll(g, kAliases)
    }
    FuzzCase(seed, "explode_union", sql, build)
  }

  /** GRAMMAR v9: set-op PRECEDENCE chains. `A op1 B op2 C` with NO
    * parentheses in the shared text — SQL-standard grouping (INTERSECT
    * binds tighter than UNION/EXCEPT, equal precedence associates left)
    * is encoded EXPLICITLY on the DataFrame side, so a parser that
    * groups differently (either engine, or Spark's legacy
    * setopsPrecedence mode leaking in) diverges immediately. Branches
    * draw single columns from overlapping-value domains so INTERSECT /
    * EXCEPT results are non-trivial. */
  private def genSetOpPrec(r: Rng, seed: Long): FuzzCase = {
    val dom = r.pick(valueDomains) // overlapping-value domains (shared)
    val ops = Seq("UNION", "UNION ALL", "INTERSECT", "EXCEPT")
    val op1 = r.pick(ops); val op2 = r.pick(ops)
    final case class Branch(sql: String, df: (SparkSession, String) => DataFrame)
    def branch(): Branch = {
      val (bt, be) = r.pick(dom)
      val p = if (r.bool(0.6)) Some(pred(r, Seq(bt))) else None
      Branch(
        s"SELECT ${be.sql} AS v FROM ${bt.name}" +
          p.map(w => s" WHERE ${w._1}").getOrElse(""),
        (s, d) => {
          var df = bt.load(s, d)
          p.foreach(w => df = df.filter(w._2))
          df.select(be.col.as("v"))
        })
    }
    val bs = Seq(branch(), branch(), branch())
    val sql =
      s"""SELECT v FROM (
         |${bs(0).sql}
         |$op1
         |${bs(1).sql}
         |$op2
         |${bs(2).sql}
         |) u
         |ORDER BY v ASC NULLS FIRST""".stripMargin
    val build = (s: SparkSession, d: String) => {
      def app(op: String, a: DataFrame, b: DataFrame) = op match {
        case "UNION ALL" => a.union(b)
        case "UNION"     => a.union(b).distinct()
        case "INTERSECT" => a.intersect(b)
        case "EXCEPT"    => a.except(b)
      }
      val d0 = bs(0).df(s, d); val d1 = bs(1).df(s, d)
      val d2 = bs(2).df(s, d)
      val res =
        if (op2 == "INTERSECT" && op1 != "INTERSECT")
          app(op1, d0, app("INTERSECT", d1, d2))
        else app(op2, app(op1, d0, d1), d2)
      res.orderBy(col("v").asc_nulls_first)
    }
    FuzzCase(seed, "setop_prec", sql, build)
  }

  /** GRAMMAR v10 (seeds >= 10000): MAX_BY / MIN_BY ("argmax") — both
    * engines implement the same two-argument ordered-selection
    * aggregate, but it is only deterministic when the ordering argument
    * is unique within each group, so the generator orders by the
    * table's unique key — and EXCLUDES lineitem entirely: its declared
    * (l_orderkey, l_linenumber) composite is ~24% duplicated in the
    * synthetic testdata (the seed-1300 lesson), so no packed surrogate
    * over it can be a total order; the first 500-seed sweep caught
    * exactly that as 8 cross-engine MAX_BY tie-breaks. Values may be
    * strings (binary-collation ASCII) or longs. */
  private def genArgMax(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables.filter(_.uniq.size == 1))
    val u = t.uniq.head
    val gks = {
      val nk = 1 + r.int(math.min(2, t.groupables.size))
      scala.util.Random.javaRandomToRandom(
        new java.util.Random(r.range(0, 1 << 30)))
        .shuffle(t.groupables).take(nk)
    }
    val kAliases = gks.indices.map(i => s"k$i")
    val where = if (r.bool(0.6)) Some(pred(r, Seq(t))) else None
    val strs = t.strings.map(_._1) ++ t.likes.map(_._1)
    def valExpr(): FExpr =
      if (strs.nonEmpty && r.bool(0.4)) r.pick(strs)
      else r.pick(t.longs)._1
    val v1 = valExpr(); val v2 = valExpr()
    val aggs = scala.collection.mutable.ArrayBuffer[(String, Column)]()
    aggs += ((s"MAX_BY(${v1.sql}, ${u.sql}) AS a0",
      max_by(v1.col, u.col).as("a0")))
    aggs += ((s"MIN_BY(${v2.sql}, ${u.sql}) AS a1",
      min_by(v2.col, u.col).as("a1")))
    aggs += (("COUNT(*) AS a2", count(lit(1)).as("a2")))
    if (r.bool(0.5)) {
      val e = r.pick(t.longs)._1
      aggs += ((s"MAX(${e.sql}) AS a3", max(e.col).as("a3")))
    }
    val kSql = gks.zip(kAliases).map { case (e, a) => s"${e.sql} AS $a" }
    val sql =
      s"""SELECT ${(kSql ++ aggs.map(_._1)).mkString(", ")}
         |FROM ${t.name}
         |${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |GROUP BY ${kAliases.indices.map(_ + 1).mkString(", ")}
         |${orderByAll(kAliases)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach(w => df = df.filter(w._2))
      val g = df.groupBy(gks.zip(kAliases)
          .map { case (e, a) => e.col.as(a) }: _*)
        .agg(aggs.head._2, aggs.tail.map(_._2).toSeq: _*)
      sortAll(g, kAliases)
    }
    FuzzCase(seed, "argmax", sql, build)
  }

  /** GRAMMAR v10: exact MEDIAN, kept integer-exact cross-engine by the
    * doubling trick — for BIGINT inputs both engines define median as
    * the interpolated 0.5-quantile, so 2·median is always an exact
    * integer (the middle element doubled, or the sum of the two middle
    * elements) representable losslessly in the IEEE double both return;
    * `CAST(2*MEDIAN(x) AS BIGINT)` is therefore hash-stable where a raw
    * DOUBLE median final would be banned by the dtype convention. */
  private def genMedian(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables)
    val gk = r.pick(t.groupables)
    val v = r.pick(t.longs)._1
    val where = if (r.bool(0.6)) Some(pred(r, Seq(t))) else None
    val having = if (r.bool(0.4)) Some(2L + r.int(4)) else None
    val aggs = Seq(
      (s"CAST(2 * MEDIAN(${v.sql}) AS BIGINT) AS a0",
        (median(v.col) * 2).cast("long").as("a0")),
      (s"MIN(${v.sql}) AS a1", min(v.col).as("a1")),
      (s"MAX(${v.sql}) AS a2", max(v.col).as("a2")),
      ("COUNT(*) AS a3", count(lit(1)).as("a3")))
    val sql =
      s"""SELECT ${gk.sql} AS k0, ${aggs.map(_._1).mkString(", ")}
         |FROM ${t.name}
         |${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |GROUP BY 1
         |${having.map(h => s"HAVING COUNT(*) >= $h").getOrElse("")}
         |${orderByAll(Seq("k0"))}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach(w => df = df.filter(w._2))
      var g = df.groupBy(gk.col.as("k0"))
        .agg(aggs.head._2, aggs.tail.map(_._2): _*)
      having.foreach(h => g = g.filter(col("a3") >= h))
      sortAll(g, Seq("k0"))
    }
    FuzzCase(seed, "median2x", sql, build)
  }

  /** GRAMMAR v10: bitwise expressions and aggregates — `x & mask` group
    * keys, BIT_COUNT keys, and BIT_AND / BIT_OR reductions, everything
    * CAST to BIGINT in the shared text (DuckDB's bit_count is TINYINT,
    * Spark's is INT; DuckDB's bit_and of INTEGER stays INTEGER). All
    * catalog values are non-negative, so two's-complement sign
    * differences never arise. */
  private def genBitOps(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables)
    val (ke, _, _) = r.pick(t.longs)
    val mask = r.pick(Seq(3L, 7L, 15L, 31L, 63L))
    val useBitCount = r.bool(0.35)
    val (keySql, keyCol) =
      if (useBitCount)
        (s"CAST(BIT_COUNT(${ke.sql}) AS BIGINT)",
          bit_count(ke.col).cast("long"))
      else (s"(${ke.sql} & $mask)", ke.col.bitwiseAND(mask))
    val v = r.pick(t.longs)._1
    val where = if (r.bool(0.6)) Some(pred(r, Seq(t))) else None
    val aggs = Seq(
      (s"CAST(BIT_AND(${v.sql}) AS BIGINT) AS a0",
        bit_and(v.col).cast("long").as("a0")),
      (s"CAST(BIT_OR(${v.sql}) AS BIGINT) AS a1",
        bit_or(v.col).cast("long").as("a1")),
      ("COUNT(*) AS a2", count(lit(1)).as("a2")))
    val sql =
      s"""SELECT $keySql AS k0, ${aggs.map(_._1).mkString(", ")}
         |FROM ${t.name}
         |${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |GROUP BY 1
         |${orderByAll(Seq("k0"))}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach(w => df = df.filter(w._2))
      val g = df.groupBy(keyCol.as("k0"))
        .agg(aggs.head._2, aggs.tail.map(_._2): _*)
      sortAll(g, Seq("k0"))
    }
    FuzzCase(seed, "bitops", sql, build)
  }

  /** Overlapping-value (table, expr) domains shared by the set-op
    * precedence and NOT-IN families, so membership tests are
    * non-trivial. Each domain is rendering-homogeneous (all raw BIGINT
    * or all CAST-to-BIGINT), keeping both sides of a set op / IN list
    * the same declared type in both engines. */
  private val valueDomains: Seq[Seq[(FTab, FExpr)]] = Seq(
    Seq((customer, LI("c_nationkey")), (supplier, LI("s_nationkey")),
      (nation, LI("n_nationkey"))),
    Seq((lineitem, L("l_suppkey")), (supplier, L("s_suppkey"))),
    Seq((orders, L("o_custkey")), (customer, L("c_custkey"))),
    Seq((lineitem, L("l_partkey")), (part, L("p_partkey"))),
    Seq((lineitem, LI("l_linenumber")), (part, LI("p_size")),
      (nation, LI("n_regionkey"))))

  /** GRAMMAR v11 (seeds >= 11000): NOT IN with NULLs — the classic
    * three-valued-logic trap. The subquery column is NULLIF-mangled
    * (sometimes to a value inside its range, so real NULLs appear;
    * sometimes outside, so none do), and occasionally the OUTER probe
    * is NULLIF-mangled too. The shared text is the plain
    * `x NOT IN (SELECT NULLIF(y, v) …)`; the DataFrame build is the
    * INDEPENDENT standard decorrelation: left-anti join on the non-null
    * subquery values, plus a broadcast 1-row (n, nn) stats frame
    * encoding the 3VL cases — subquery empty → every row passes (even
    * a NULL probe); any subquery NULL → no row passes; otherwise a
    * NULL probe fails and non-null probes pass iff anti-joined. An
    * engine (or the rewrite) getting any leg wrong diverges. */
  private def genNotIn(r: Rng, seed: Long): FuzzCase = {
    val dom = r.pick(valueDomains)
    val (t, x) = r.pick(dom)
    val (t2, y) = r.pick(dom)
    val (_, yLo, yHi) = t2.longs.find(_._1.sql == y.sql)
      .getOrElse((y, 0L, 25L))
    val nullV =
      if (r.bool(0.5)) r.range(yLo, yHi) // real NULLs in the IN-list
      else yHi + 1000L                   // NULLIF never fires
    val probeNullV = if (r.bool(0.35)) {
      val (_, xLo, xHi) = t.longs.find(_._1.sql == x.sql)
        .getOrElse((x, 0L, 25L))
      Some(if (r.bool(0.6)) r.range(xLo, xHi) else xHi + 1000L)
    } else None
    val p = if (r.bool(0.6)) Some(pred(r, Seq(t))) else None
    val p2 = if (r.bool(0.7)) Some(pred(r, Seq(t2))) else None
    val gk = r.pick(t.groupables)
    val probeSql = probeNullV
      .map(v => s"NULLIF(${x.sql}, $v)").getOrElse(x.sql)
    val probeCol = probeNullV
      .map(v => when(x.col === v, lit(null)).otherwise(x.col))
      .getOrElse(x.col)
    val sql =
      s"""SELECT ${gk.sql} AS k0, COUNT(*) AS a0,
         |  CAST(SUM(${x.sql}) AS BIGINT) AS a1
         |FROM ${t.name}
         |WHERE ${p.map(w => s"(${w._1}) AND ").getOrElse("")}$probeSql
         |  NOT IN (SELECT NULLIF(${y.sql}, $nullV) FROM ${t2.name}
         |          ${p2.map(w => s"WHERE ${w._1}").getOrElse("")})
         |GROUP BY 1
         |${orderByAll(Seq("k0"))}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var sub = t2.load(s, d)
      p2.foreach(w => sub = sub.filter(w._2))
      val ys = sub.select(
        when(y.col === nullV, lit(null)).otherwise(y.col).as("__y"))
      val stats = ys.agg(count(lit(1)).as("__n"),
        count(col("__y")).as("__nn"))
      var outer = t.load(s, d)
      p.foreach(w => outer = outer.filter(w._2))
      outer = outer.withColumn("__x", probeCol)
      val anti = outer.join(ys.filter(col("__y").isNotNull),
        col("__x") === col("__y"), "left_anti")
      val kept = anti.crossJoin(broadcast(stats))
        .filter(col("__n") === 0L ||
          (col("__n") === col("__nn") && col("__x").isNotNull))
      val g = kept.groupBy(gk.col.as("k0"))
        .agg(count(lit(1)).as("a0"), sum(x.col).cast("long").as("a1"))
      sortAll(g, Seq("k0"))
    }
    FuzzCase(seed, "notin_null", sql, build)
  }

  /** GRAMMAR v11: GREATEST / LEAST null-skipping — both engines follow
    * the Postgres rule (NULL operands are IGNORED; the result is NULL
    * only when every operand is NULL), which differs from the
    * CASE-expression rewrite most people would hand-write. Operands are
    * independently NULLIF-mangled so single-NULL, mixed, and
    * (occasionally) all-NULL rows all occur; COUNT over the result
    * pins the all-NULL leg. */
  private def genGreatestLeast(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables)
    val m = 2 + r.int(2) // 2..3 operands
    val ops = (0 until m).map { _ =>
      val (e, lo, hi) = r.pick(t.longs)
      if (r.bool(0.35)) {
        val v = r.range(lo, hi)
        (s"NULLIF(${e.sql}, $v)",
          when(e.col === v, lit(null)).otherwise(e.col))
      } else (e.sql, e.col)
    }
    val gk = r.pick(t.groupables)
    val where = if (r.bool(0.6)) Some(pred(r, Seq(t))) else None
    val gSql = s"GREATEST(${ops.map(_._1).mkString(", ")})"
    val lSql = s"LEAST(${ops.map(_._1).mkString(", ")})"
    val gCol = greatest(ops.map(_._2): _*)
    val lCol = least(ops.map(_._2): _*)
    val sql =
      s"""SELECT ${gk.sql} AS k0,
         |  CAST(SUM($gSql) AS BIGINT) AS a0, MIN($lSql) AS a1,
         |  COUNT($gSql) AS a2, COUNT(*) AS a3
         |FROM ${t.name}
         |${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |GROUP BY 1
         |${orderByAll(Seq("k0"))}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach(w => df = df.filter(w._2))
      val g = df.groupBy(gk.col.as("k0"))
        .agg(sum(gCol).cast("long").as("a0"), min(lCol).as("a1"),
          count(gCol).as("a2"), count(lit(1)).as("a3"))
      sortAll(g, Seq("k0"))
    }
    FuzzCase(seed, "greatest_least", sql, build)
  }

  /** GRAMMAR v11: MULTIPLE DISTINCT aggregates in one SELECT —
    * COUNT(DISTINCT a) + SUM(DISTINCT b) + COUNT(DISTINCT c) over
    * different columns forces Spark's Expand-based multi-distinct
    * rewrite (one input replica per distinct group), a planning path
    * no single-distinct query exercises; DuckDB runs its own native
    * multi-distinct hash aggregation. Both must land on identical
    * values. */
  private def genMultiDistinct(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables)
    val strs = t.strings.map(_._1) ++ t.likes.map(_._1)
    val gk = r.pick(t.groupables)
    val where = if (r.bool(0.6)) Some(pred(r, Seq(t))) else None
    val a = r.pick(t.longs)._1
    val b = r.pick(t.longs)._1
    val cOpt = if (strs.nonEmpty) Some(r.pick(strs)) else None
    val aggs = scala.collection.mutable.ArrayBuffer[(String, Column)]()
    aggs += ((s"COUNT(DISTINCT ${a.sql}) AS a0",
      countDistinct(a.col).as("a0")))
    aggs += ((s"CAST(SUM(DISTINCT ${b.sql}) AS BIGINT) AS a1",
      sum_distinct(b.col).cast("long").as("a1")))
    cOpt.foreach { c =>
      aggs += ((s"COUNT(DISTINCT ${c.sql}) AS a2",
        countDistinct(c.col).as("a2")))
    }
    aggs += (("COUNT(*) AS a3", count(lit(1)).as("a3")))
    val sql =
      s"""SELECT ${gk.sql} AS k0, ${aggs.map(_._1).mkString(", ")}
         |FROM ${t.name}
         |${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |GROUP BY 1
         |${orderByAll(Seq("k0"))}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach(w => df = df.filter(w._2))
      val g = df.groupBy(gk.col.as("k0"))
        .agg(aggs.head._2, aggs.tail.map(_._2).toSeq: _*)
      sortAll(g, Seq("k0"))
    }
    FuzzCase(seed, "multi_distinct", sql, build)
  }

  /** GRAMMAR v12 (seeds >= 12000): window VALUE functions —
    * FIRST_VALUE over the full frame, LAST_VALUE over a sliding ROWS
    * frame, NTH_VALUE over the running frame (NULL before the nth row
    * in both engines). Frames make the result depend on the ACTUAL
    * row order, so the window orders by a verified-unique key and the
    * generator draws only from tables whose keys really are unique in
    * the testdata (the argmax rule — lineitem excluded). */
  private def genWinValue(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables.filter(_.uniq.size == 1))
    val u = t.uniq.head
    val pk = r.pick(t.groupables)
    val desc0 = r.bool(0.4)
    val ordSql = s"${u.sql} ${if (desc0) "DESC" else "ASC"}"
    val ordCol = if (desc0) u.col.desc else u.col.asc
    val strs = t.strings.map(_._1) ++ t.likes.map(_._1)
    def valExpr(): FExpr =
      if (strs.nonEmpty && r.bool(0.35)) r.pick(strs)
      else r.pick(t.longs)._1
    val v1 = valExpr(); val v2 = valExpr(); val v3 = valExpr()
    val lo = 1 + r.int(3); val hi = 1 + r.int(3) // sliding frame bounds
    val nth = 2 + r.int(3)
    val where = if (r.bool(0.5)) Some(pred(r, Seq(t))) else None
    import org.apache.spark.sql.expressions.Window
    val base = Window.partitionBy(pk.col).orderBy(ordCol)
    val over = s"PARTITION BY ${pk.sql} ORDER BY $ordSql"
    val items = Seq(
      (s"FIRST_VALUE(${v1.sql}) OVER ($over ROWS BETWEEN UNBOUNDED " +
        s"PRECEDING AND UNBOUNDED FOLLOWING) AS a0",
        first(v1.col).over(base.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)).as("a0")),
      (s"LAST_VALUE(${v2.sql}) OVER ($over ROWS BETWEEN $lo PRECEDING " +
        s"AND $hi FOLLOWING) AS a1",
        last(v2.col).over(base.rowsBetween(-lo, hi)).as("a1")),
      (s"NTH_VALUE(${v3.sql}, $nth) OVER ($over ROWS BETWEEN UNBOUNDED " +
        s"PRECEDING AND CURRENT ROW) AS a2",
        nth_value(v3.col, nth).over(base.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)).as("a2")))
    val sql =
      s"""SELECT ${pk.sql} AS k0, ${u.sql} AS k1,
         |  ${items.map(_._1).mkString(", ")}
         |FROM ${t.name}
         |${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |${orderByAll(Seq("k0", "k1"))}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach(w => df = df.filter(w._2))
      val out = df.select(Seq(pk.col.as("k0"), u.col.as("k1")) ++
        items.map(_._2): _*)
      sortAll(out, Seq("k0", "k1"))
    }
    FuzzCase(seed, "win_value", sql, build)
  }

  /** GRAMMAR v12: EXTRACT date parts as group keys — YEAR / QUARTER /
    * MONTH / DAY render via the standard `EXTRACT(f FROM ts)` both
    * engines parse (day-of-week and week-of-year are deliberately
    * EXCLUDED: DuckDB numbers dow Sunday=0 vs Spark Sunday=1, and the
    * engines disagree on week-1 rules — known cross-engine seams the
    * shared text cannot paper over). */
  private def genExtract(r: Rng, seed: Long): FuzzCase = {
    val (t, dCol) =
      if (r.bool(0.5)) (lineitem, "l_shipdate") else (orders, "o_orderdate")
    val fields = Seq("YEAR", "QUARTER", "MONTH", "DAY")
    val nk = 1 + r.int(2)
    val picked = scala.util.Random.javaRandomToRandom(
      new java.util.Random(r.range(0, 1 << 30))).shuffle(fields).take(nk)
    def fCol(f: String) = (f match {
      case "YEAR"    => year(col(dCol))
      case "QUARTER" => quarter(col(dCol))
      case "MONTH"   => month(col(dCol))
      case "DAY"     => dayofmonth(col(dCol))
    }).cast("long")
    val kAliases = picked.indices.map(i => s"k$i")
    val v = r.pick(t.longs)._1
    val where = if (r.bool(0.6)) Some(pred(r, Seq(t))) else None
    val kSql = picked.zip(kAliases).map { case (f, a) =>
      s"CAST(EXTRACT($f FROM $dCol) AS BIGINT) AS $a" }
    val sql =
      s"""SELECT ${kSql.mkString(", ")}, COUNT(*) AS a0,
         |  CAST(SUM(${v.sql}) AS BIGINT) AS a1
         |FROM ${t.name}
         |${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |GROUP BY ${kAliases.indices.map(_ + 1).mkString(", ")}
         |${orderByAll(kAliases)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach(w => df = df.filter(w._2))
      val g = df.groupBy(picked.zip(kAliases)
          .map { case (f, a) => fCol(f).as(a) }: _*)
        .agg(count(lit(1)).as("a0"), sum(v.col).cast("long").as("a1"))
      sortAll(g, kAliases)
    }
    FuzzCase(seed, "extract_date", sql, build)
  }

  /** GRAMMAR v12: string shaping keys — LPAD / RPAD (including the
    * truncating n < length(s) case), REVERSE, REPEAT, and SUBSTR over
    * a padded result. ASCII binary-collation values only, so ordering
    * and grouping agree across engines. */
  private def genStrPad(r: Rng, seed: Long): FuzzCase = {
    val withStr = tables.filter(t => (t.strings ++ t.likes).nonEmpty)
    val t = r.pick(withStr)
    val strs = (t.strings.map(_._1) ++ t.likes.map(_._1)).distinct
    def key(): (String, Column) = r.int(5) match {
      case 0 =>
        val e = r.pick(strs); val n = 1 + r.int(10)
        (s"LPAD(${e.sql}, $n, '#')", lpad(e.col, n, "#"))
      case 1 =>
        val e = r.pick(strs); val n = 1 + r.int(10)
        (s"RPAD(${e.sql}, $n, '*')", rpad(e.col, n, "*"))
      case 2 =>
        val e = r.pick(strs)
        (s"REVERSE(${e.sql})", reverse(e.col))
      case 3 =>
        val e = r.pick(strs); val k = 1 + r.int(3)
        (s"REPEAT(${e.sql}, $k)", repeat(e.col, k))
      case _ =>
        val e = r.pick(strs); val n = 2 + r.int(8)
        (s"SUBSTR(LPAD(${e.sql}, $n, '.'), 1, 3)",
          substring(lpad(e.col, n, "."), 1, 3))
    }
    val nk = 1 + r.int(2)
    val keys = (0 until nk).map(_ => key())
    val kAliases = keys.indices.map(i => s"k$i")
    val v = r.pick(t.longs)._1
    val where = if (r.bool(0.6)) Some(pred(r, Seq(t))) else None
    val kSql = keys.zip(kAliases).map { case ((s0, _), a) => s"$s0 AS $a" }
    val sql =
      s"""SELECT ${kSql.mkString(", ")}, COUNT(*) AS a0,
         |  CAST(SUM(${v.sql}) AS BIGINT) AS a1,
         |  MIN(${v.sql}) AS a2
         |FROM ${t.name}
         |${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |GROUP BY ${kAliases.indices.map(_ + 1).mkString(", ")}
         |${orderByAll(kAliases)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach(w => df = df.filter(w._2))
      val g = df.groupBy(keys.zip(kAliases)
          .map { case ((_, c), a) => c.as(a) }: _*)
        .agg(count(lit(1)).as("a0"), sum(v.col).cast("long").as("a1"),
          min(v.col).as("a2"))
      sortAll(g, kAliases)
    }
    FuzzCase(seed, "str_pad", sql, build)
  }

  // ---- grammar v13: the events table (time-series shapes) --------------
  // The fuzzer's first non-TPC-H table: timestamps at micros resolution
  // and a DOUBLE value column. Double-safety discipline: only order-free
  // exact aggregates touch `value` (MIN/MAX/COUNT — never SUM/AVG, whose
  // IEEE accumulation order differs by engine/partitioning); event_id is
  // verified unique at every SF, so it is the window tie-break.

  private val eventTypes = Seq("click", "error", "purchase", "signup",
    "view")

  private def eventPred(r: Rng): (String, Column) = {
    val atoms = scala.collection.mutable.ArrayBuffer[(String, Column)]()
    if (r.bool(0.6)) {
      val n = 1 + r.int(3)
      val ts0 = scala.util.Random.javaRandomToRandom(
        new java.util.Random(r.range(0, 1 << 30))).shuffle(eventTypes)
        .take(n)
      atoms += ((s"event_type IN (${ts0.map(sq).mkString(", ")})",
        col("event_type").isin(ts0: _*)))
    }
    if (r.bool(0.5)) {
      val a = r.range(0L, 150L); val b = r.range(0L, 150L)
      val (x, y) = (math.min(a, b), math.max(a, b))
      atoms += ((s"user_id BETWEEN $x AND $y",
        col("user_id").between(x, y)))
    }
    if (r.bool(0.5)) {
      val d = 2 + r.int(26)
      val lit0 = f"2024-01-$d%02d 00:00:00"
      if (r.bool(0.5))
        atoms += ((s"ts >= TIMESTAMP '$lit0'",
          col("ts") >= to_timestamp(lit(lit0))))
      else
        atoms += ((s"ts < TIMESTAMP '$lit0'",
          col("ts") < to_timestamp(lit(lit0))))
    }
    if (r.bool(0.35)) {
      val v = r.range(0L, 500L).toDouble // whole-double literal: "237.0"
      atoms += ((s"value >= $v", col("value") >= v))
    }
    if (atoms.isEmpty)
      atoms += (("user_id >= 0", col("user_id") >= 0L))
    atoms.reduceLeft { (a, b) =>
      (s"(${a._1} AND ${b._1})", a._2 && b._2)
    }
  }

  /** GRAMMAR v13: calendar-bucket aggregation over events —
    * date_trunc group keys with the cross-engine dtype seam pinned by
    * construction: DuckDB's date_trunc('day'|'week'|'month') returns
    * DATE while Spark's returns TIMESTAMP, so the shared text CASTs to
    * DATE (and the build applies to_date); 'hour' stays TIMESTAMP in
    * both. Aggregates on the DOUBLE column are MIN/MAX only. */
  private def genEventDay(r: Rng, seed: Long): FuzzCase = {
    val unit = r.pick(Seq("day", "week", "month", "hour"))
    val asDate = unit != "hour"
    val keySql =
      if (asDate) s"CAST(date_trunc('$unit', ts) AS DATE)"
      else s"date_trunc('$unit', ts)"
    val keyCol =
      if (asDate) to_date(date_trunc(unit, col("ts")))
      else date_trunc(unit, col("ts"))
    val useType = r.bool(0.6)
    val kAliases = if (useType) Seq("k0", "k1") else Seq("k0")
    val where = if (r.bool(0.7)) Some(eventPred(r)) else None
    val aggs = scala.collection.mutable.ArrayBuffer[(String, Column)]()
    aggs += (("COUNT(*) AS a0", count(lit(1)).as("a0")))
    aggs += (("COUNT(DISTINCT user_id) AS a1",
      countDistinct(col("user_id")).as("a1")))
    if (r.bool(0.6))
      aggs += (("MIN(value) AS a2", min(col("value")).as("a2")))
    if (r.bool(0.6))
      aggs += (("MAX(value) AS a3", max(col("value")).as("a3")))
    aggs += (("MIN(event_id) AS a4", min(col("event_id")).as("a4")))
    val kSql = (Seq(s"$keySql AS k0") ++
      (if (useType) Seq("event_type AS k1") else Nil)).mkString(", ")
    val sql =
      s"""SELECT $kSql, ${aggs.map(_._1).mkString(", ")}
         |FROM events
         |${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |GROUP BY ${kAliases.indices.map(_ + 1).mkString(", ")}
         |${orderByAll(kAliases)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = Tables.events(s, d)
      where.foreach(w => df = df.filter(w._2))
      val keys = Seq(keyCol.as("k0")) ++
        (if (useType) Seq(col("event_type").as("k1")) else Nil)
      val g = df.groupBy(keys: _*)
        .agg(aggs.head._2, aggs.tail.map(_._2).toSeq: _*)
      sortAll(g, kAliases)
    }
    FuzzCase(seed, "event_day", sql, build)
  }

  /** GRAMMAR v13: behavioral semi/anti join — users who did ONE thing
    * in one time window filtered against users who did ANOTHER in a
    * second window (the retention/funnel membership shape), rendered
    * as IN / NOT IN subqueries (user_id is non-null, so NOT IN is
    * 2VL-safe here — the NULL legs live in grammar v11). */
  private def genEventSemi(r: Rng, seed: Long): FuzzCase = {
    val anti = r.bool(0.4)
    val outerP = eventPred(r)
    val subP = eventPred(r)
    val op = if (anti) "NOT IN" else "IN"
    val useDay = r.bool(0.4)
    val keySql = if (useDay) "CAST(date_trunc('day', ts) AS DATE)"
      else "event_type"
    val keyCol = if (useDay) to_date(date_trunc("day", col("ts")))
      else col("event_type")
    val sql =
      s"""SELECT $keySql AS k0, COUNT(*) AS a0,
         |  COUNT(DISTINCT user_id) AS a1, MIN(event_id) AS a2
         |FROM events
         |WHERE (${outerP._1}) AND user_id $op
         |  (SELECT user_id FROM events WHERE ${subP._1})
         |GROUP BY 1
         |${orderByAll(Seq("k0"))}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      val ev = Tables.events(s, d)
      val sub = ev.filter(subP._2).select(col("user_id").as("__u"))
      val outer = ev.filter(outerP._2)
      val joined = outer.join(sub, col("user_id") === col("__u"),
        if (anti) "left_anti" else "left_semi")
      val g = joined.groupBy(keyCol.as("k0"))
        .agg(count(lit(1)).as("a0"),
          countDistinct(col("user_id")).as("a1"),
          min(col("event_id")).as("a2"))
      sortAll(g, Seq("k0"))
    }
    FuzzCase(seed, "event_semi", sql, build)
  }

  /** GRAMMAR v13: per-key top-k events by value — ROW_NUMBER over
    * (value DESC, event_id ASC): the value column carries heavy ties
    * (~18% distinct at sf0.1), so the unique event_id tie-break is
    * load-bearing, exactly the q_rank_in_group discipline. */
  private def genEventTop(r: Rng, seed: Long): FuzzCase = {
    val k = 2 + r.int(5)
    val byUserMod = r.bool(0.35)
    val m = 4 + r.int(8)
    val pSql = if (byUserMod) s"(user_id % $m)" else "event_type"
    val pCol = if (byUserMod) col("user_id") % m else col("event_type")
    val where = if (r.bool(0.6)) Some(eventPred(r)) else None
    import org.apache.spark.sql.expressions.Window
    val sql =
      s"""WITH ranked AS (
         |  SELECT $pSql AS k0, event_id, value,
         |    ROW_NUMBER() OVER (PARTITION BY $pSql
         |      ORDER BY value DESC, event_id ASC) AS rn
         |  FROM events
         |  ${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |)
         |SELECT k0, CAST(rn AS BIGINT) AS k1, event_id AS a0, value AS a1
         |FROM ranked WHERE rn <= $k
         |${orderByAll(Seq("k0", "k1"))}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = Tables.events(s, d)
      where.foreach(w => df = df.filter(w._2))
      val out = df.select(pCol.as("k0"), col("event_id"), col("value"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("k0"))
            .orderBy(col("value").desc, col("event_id").asc))
          .cast("long"))
        .filter(col("rn") <= k)
        .select(col("k0"), col("rn").as("k1"),
          col("event_id").as("a0"), col("value").as("a1"))
      sortAll(out, Seq("k0", "k1"))
    }
    FuzzCase(seed, "event_topk", sql, build)
  }

  // ---- grammar v14: coercion lattice / null placement / CTE reuse /
  //      correlated scalar subqueries ----------------------------------

  /** GRAMMAR v14: type-coercion lattice under UNION [ALL] — the two
    * branches emit the SAME column at DIFFERENT numeric types
    * (INT vs BIGINT vs DOUBLE) and the shared text leaves the unified
    * key UNCAST, so the gate pins that both engines place the result at
    * the same lattice point (schema_match) AND agree on the unified
    * values (hash_match). Doubles stay exact by construction:
    * l_quantity is whole-valued 1..50, and only order-free aggregates
    * (COUNT / MIN / MAX) ever touch the unified key. The DataFrame
    * build CASTs each branch to the lattice result itself — the build
    * states the expectation, the SQL exercises each engine's lattice. */
  private def genCoerceUnion(r: Rng, seed: Long): FuzzCase = {
    // (sqlExpr, dfCol, lattice result sparkType) per branch kind
    val intK = ("l_linenumber", col("l_linenumber"), "int")
    val bigM = 2 + r.int(6)
    val bigK = (s"(l_orderkey % $bigM)", col("l_orderkey") % bigM, "bigint")
    val dblK = ("l_quantity", col("l_quantity"), "double")
    val (a, b, resT) = r.int(3) match {
      case 0 => (intK, bigK, "bigint")
      case 1 => (intK, dblK, "double")
      case _ => (bigK, dblK, "double")
    }
    val (ka, kb) = if (r.bool(0.5)) (a, b) else (b, a)
    val all = r.bool(0.6)
    val op = if (all) "UNION ALL" else "UNION"
    val pa = pred(r, Seq(lineitem)); val pb = pred(r, Seq(lineitem))
    val sql =
      s"""SELECT k0, COUNT(*) AS a0, CAST(SUM(v) AS BIGINT) AS a1
         |FROM (
         |  SELECT ${ka._1} AS k0, l_suppkey AS v FROM lineitem
         |  WHERE ${pa._1}
         |  $op
         |  SELECT ${kb._1} AS k0, l_partkey AS v FROM lineitem
         |  WHERE ${pb._1}
         |) u
         |GROUP BY 1
         |${orderByAll(Seq("k0"))}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      val li = Tables.lineitem(s, d)
      val ba = li.filter(pa._2)
        .select(ka._2.cast(resT).as("k0"), col("l_suppkey").as("v"))
      val bb = li.filter(pb._2)
        .select(kb._2.cast(resT).as("k0"), col("l_partkey").as("v"))
      val u0 = ba.union(bb)
      val u = if (all) u0 else u0.distinct()
      sortAll(u.groupBy(col("k0"))
        .agg(count(lit(1)).as("a0"), sum(col("v")).cast("long").as("a1")),
        Seq("k0"))
    }
    FuzzCase(seed, "coerce_union", sql, build)
  }

  /** GRAMMAR v14: EXPLICIT NULLS FIRST/LAST placement — a NULLIF-mangled
    * key ordered with every (ASC|DESC) x (NULLS FIRST|NULLS LAST)
    * combination, in BOTH the window ORDER BY (ROW_NUMBER, unique-key
    * tie-broken) and the presentation sort. This is the one seam where
    * the engines' DEFAULTS genuinely differ (Spark ASC = NULLS FIRST,
    * DuckDB ASC = NULLS LAST), so the grammar always spells placement
    * out — here the spelled-out placement itself is the shape under
    * test, including the final row ORDER (unique tie-break makes it
    * total, so hash_match pins the order cross-engine). */
  private def genNullsOrder(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(Seq(orders, customer, part, supplier))
    val u = t.uniq.head
    val (e, lo, hi) = r.pick(t.longs)
    val v = r.range(lo, hi)
    val desc = r.bool(0.5); val nullsLast = r.bool(0.5)
    val dir = if (desc) "DESC" else "ASC"
    val place = if (nullsLast) "NULLS LAST" else "NULLS FIRST"
    val where = if (r.bool(0.6)) Some(pred(r, Seq(t))) else None
    def winCol = {
      val base = col("k")
      val o1 = (desc, nullsLast) match {
        case (false, false) => base.asc_nulls_first
        case (false, true)  => base.asc_nulls_last
        case (true, false)  => base.desc_nulls_first
        case (true, true)   => base.desc_nulls_last
      }
      Window.orderBy(o1, col("k1").asc)
    }
    val sql =
      s"""WITH t AS (
         |  SELECT NULLIF(${e.sql}, $v) AS k, ${u.sql} AS u
         |  FROM ${t.name}
         |  ${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |)
         |SELECT k AS k0, u AS k1,
         |  CAST(ROW_NUMBER() OVER (ORDER BY k $dir $place, u ASC)
         |    AS BIGINT) AS a0
         |FROM t
         |ORDER BY k0 $dir $place, k1 ASC""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach(w => df = df.filter(w._2))
      val base = df.select(
        when(e.col === v, lit(null)).otherwise(e.col).as("k"),
        u.col.as("k1"))
      val sortK = (desc, nullsLast) match {
        case (false, false) => col("k0").asc_nulls_first
        case (false, true)  => col("k0").asc_nulls_last
        case (true, false)  => col("k0").desc_nulls_first
        case (true, true)   => col("k0").desc_nulls_last
      }
      base.withColumn("a0", row_number().over(winCol).cast("long"))
        .select(col("k").as("k0"), col("k1"), col("a0"))
        .orderBy(sortK, col("k1").asc)
    }
    FuzzCase(seed, "nulls_order", sql, build)
  }

  /** GRAMMAR v14: CTE referenced TWICE — one grouped base CTE consumed
    * by two readers in the same query (self-join on a shifted key, or a
    * global-max scalar-subquery filter). Exercises plan-level reuse vs
    * inline expansion: both engines may choose either, but the RESULT
    * must be identical; the DataFrame build constructs the base frame
    * once and genuinely reuses the object. */
  private def genCteReuse(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(Seq(lineitem, orders, customer, part))
    val g = r.pick(t.groupables.filterNot(_.isStr) match {
      case Seq() => t.longs.map(_._1); case gs => gs
    })
    val where = if (r.bool(0.6)) Some(pred(r, Seq(t))) else None
    val baseSql =
      s"""base AS (
         |  SELECT ${g.sql} AS k, COUNT(*) AS c
         |  FROM ${t.name}
         |  ${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |  GROUP BY 1
         |)""".stripMargin
    def baseDf(s: SparkSession, d: String): DataFrame = {
      var df = t.load(s, d)
      where.foreach(w => df = df.filter(w._2))
      df.groupBy(g.col.as("k")).agg(count(lit(1)).as("c"))
    }
    if (r.bool(0.5)) {
      // reader pair A: self-join on k = k + shift
      val shift = 1 + r.int(3)
      val sql =
        s"""WITH $baseSql
           |SELECT a.k AS k0, a.c AS a0, b.c AS a1
           |FROM base a JOIN base b ON a.k = b.k + $shift
           |${orderByAll(Seq("k0"))}""".stripMargin
      val build = (s: SparkSession, d: String) => {
        val base = baseDf(s, d)
        sortAll(base.as("a")
          .join(base.as("b"), col("a.k") === col("b.k") + shift)
          .select(col("a.k").as("k0"), col("a.c").as("a0"),
            col("b.c").as("a1")), Seq("k0"))
      }
      FuzzCase(seed, "cte_reuse", sql, build)
    } else {
      // reader pair B: rows holding the CTE's own global max count
      val sql =
        s"""WITH $baseSql
           |SELECT k AS k0, c AS a0
           |FROM base
           |WHERE c = (SELECT MAX(c) FROM base)
           |${orderByAll(Seq("k0"))}""".stripMargin
      val build = (s: SparkSession, d: String) => {
        val base = baseDf(s, d)
        val m = base.agg(max(col("c")).as("__scalar_m"))
        sortAll(base.join(broadcast(m), col("c") === col("__scalar_m"))
          .select(col("k").as("k0"), col("c").as("a0")), Seq("k0"))
      }
      FuzzCase(seed, "cte_reuse", sql, build)
    }
  }

  /** GRAMMAR v14: CORRELATED scalar subquery in WHERE under an outer
    * aggregate — `WHERE (SELECT COUNT(*)|MAX(..) FROM child WHERE
    * child.fk = outer.pk) <op> N`, then the surviving outer rows group
    * and aggregate. The COUNT leg deliberately includes `<=` / `=`
    * comparisons where childless outer rows (correlated COUNT over an
    * empty set = 0) must PASS — the decorrelation coalesce seam; the
    * MAX leg's empty-set NULL must FAIL every comparison (3VL). The
    * DataFrame build decorrelates by hand: child groupBy + left join +
    * coalesce (COUNT) / plain null-dropping compare (MAX). */
  private def genCorrScalar(r: Rng, seed: Long): FuzzCase = {
    // (outer, child, childFkSql, childFkCol, outerPkSql) pairs
    val onOrders = r.bool(0.5)
    val (outer, child, fk, pk) =
      if (onOrders) (orders, lineitem, L("l_orderkey"), L("o_orderkey"))
      else (customer, orders, L("o_custkey"), L("c_custkey"))
    val useCount = r.bool(0.6)
    val (subSql, subAggCol) =
      if (useCount) ("COUNT(*)", count(lit(1)).cast("long"))
      else if (onOrders)
        ("CAST(MAX(c.l_linenumber) AS BIGINT)",
          max(col("l_linenumber").cast("long")))
      else ("CAST(MAX(year(c.o_orderdate)) AS BIGINT)",
        max(year(col("o_orderdate")).cast("long")))
    val (opS, opC) = r.pick(Seq[(String, (Column, Long) => Column)](
      (">=", _ >= _), ("<=", _ <= _), ("=", _ === _), (">", _ > _)))
    val n: Long =
      if (useCount) r.range(0L, 6L)
      else if (onOrders) r.range(1L, 7L) else r.range(1992L, 1999L)
    val g = r.pick(outer.groupables)
    val where = if (r.bool(0.5)) Some(pred(r, Seq(outer))) else None
    val whereSql = where.map(w => s"AND (${w._1})").getOrElse("")
    val sql =
      s"""SELECT ${g.sql} AS k0, COUNT(*) AS a0, MIN(${pk.sql}) AS a1
         |FROM ${outer.name}
         |WHERE (SELECT $subSql FROM ${child.name} c
         |       WHERE c.${fk.sql} = ${outer.name}.${pk.sql}) $opS $n
         |  $whereSql
         |GROUP BY 1
         |${orderByAll(Seq("k0"))}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var o = outer.load(s, d)
      where.foreach(w => o = o.filter(w._2))
      val sub = child.load(s, d).groupBy(fk.col.as("__fk"))
        .agg(subAggCol.as("__sub"))
      val joined = o.join(sub, pk.col === col("__fk"), "left")
      val scored =
        if (useCount) joined.withColumn("__v",
          coalesce(col("__sub"), lit(0L)))
        else joined.withColumn("__v", col("__sub"))
      val kept = scored.filter(opC(col("__v"), n))
      sortAll(kept.groupBy(g.col.as("k0"))
        .agg(count(lit(1)).as("a0"), min(pk.col).as("a1")), Seq("k0"))
    }
    FuzzCase(seed, "corr_scalar", sql, build)
  }

  // ---- grammar v15: LIMIT subqueries / hidden HAVING aggregates /
  //      CASE-chain group keys --------------------------------------

  /** GRAMMAR v15: deterministic LIMIT in a subquery — the sorted prefix
    * (ORDER BY the table's unique key, so the prefix SET is engine-
    * independent) re-aggregated outside. Pins the TakeOrdered-inside-
    * a-FROM path: an engine that applies LIMIT before the sort, or
    * re-orders the prefix before grouping, diverges immediately. */
  private def genLimitSub(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(Seq(orders, customer, part, supplier))
    val u = t.uniq.head
    val g = r.pick(t.groupables)
    val (v, _, _) = r.pick(t.longs)
    val n = 10 + r.int(490)
    val desc = r.bool(0.3)
    val dir = if (desc) "DESC" else "ASC"
    val where = if (r.bool(0.6)) Some(pred(r, Seq(t))) else None
    val sql =
      s"""SELECT k0, COUNT(*) AS a0, CAST(SUM(v) AS BIGINT) AS a1,
         |  MIN(u) AS a2
         |FROM (
         |  SELECT ${g.sql} AS k0, ${v.sql} AS v, ${u.sql} AS u
         |  FROM ${t.name}
         |  ${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |  ORDER BY u $dir LIMIT $n
         |) s
         |GROUP BY 1
         |${orderByAll(Seq("k0"))}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach(w => df = df.filter(w._2))
      val pre = df.select(g.col.as("k0"), v.col.as("v"), u.col.as("u"))
        .orderBy(if (desc) col("u").desc else col("u").asc)
        .limit(n)
      sortAll(pre.groupBy(col("k0"))
        .agg(count(lit(1)).as("a0"), sum(col("v")).cast("long").as("a1"),
          min(col("u")).as("a2")), Seq("k0"))
    }
    FuzzCase(seed, "limit_sub", sql, build)
  }

  /** GRAMMAR v15: HAVING on aggregates that are NOT in the SELECT list
    * (COUNT(*) and MIN bounds filtering groups whose only projected
    * aggregate is an unrelated SUM) — the hidden-aggregate resolution
    * path where an engine could prune the "unused" aggregate before
    * HAVING sees it. The DataFrame build computes them as __-prefixed
    * columns and drops them after the filter — an independently
    * derived rendering of the same semantics. */
  private def genHavingAgg(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(Seq(lineitem, orders, customer, part))
    val g = r.pick(t.groupables)
    val (x, _, _) = r.pick(t.longs)
    val (y, lo, hi) = r.pick(t.longs)
    val nMin = 1 + r.int(8)
    val yBound = r.range(lo, hi)
    val where = if (r.bool(0.5)) Some(pred(r, Seq(t))) else None
    val both = r.bool(0.6)
    val havingSql =
      if (both) s"HAVING COUNT(*) >= $nMin AND MIN(${y.sql}) <= $yBound"
      else s"HAVING COUNT(*) >= $nMin"
    val sql =
      s"""SELECT ${g.sql} AS k0, CAST(SUM(${x.sql}) AS BIGINT) AS a0
         |FROM ${t.name}
         |${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |GROUP BY 1
         |$havingSql
         |${orderByAll(Seq("k0"))}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach(w => df = df.filter(w._2))
      var grp = df.groupBy(g.col.as("k0"))
        .agg(sum(x.col).cast("long").as("a0"),
          count(lit(1)).as("__c"), min(y.col).as("__m"))
        .filter(col("__c") >= nMin)
      if (both) grp = grp.filter(col("__m") <= yBound)
      sortAll(grp.select(col("k0"), col("a0")), Seq("k0"))
    }
    FuzzCase(seed, "having_agg", sql, build)
  }

  /** GRAMMAR v15: CASE-chain group keys with OVERLAPPING predicates —
    * first-match-wins is the semantics under test (a row satisfying
    * both branches must land in branch 1), plus the omitted-ELSE NULL
    * group with explicit NULLS FIRST placement. */
  private def genCaseChain(r: Rng, seed: Long): FuzzCase = {
    val t = r.pick(tables)
    val p1 = atom(r, t); val p2 = atom(r, t)
    val hasElse = r.bool(0.5)
    val (x, _, _) = r.pick(t.longs)
    val where = if (r.bool(0.5)) Some(pred(r, Seq(t))) else None
    val caseSql = s"CASE WHEN ${p1._1} THEN 'w1' WHEN ${p2._1} THEN 'w2'" +
      (if (hasElse) " ELSE 'w3' END" else " END")
    val caseCol = {
      val c = when(p1._2, lit("w1")).when(p2._2, lit("w2"))
      if (hasElse) c.otherwise(lit("w3")) else c
    }
    val sql =
      s"""SELECT $caseSql AS k0, COUNT(*) AS a0,
         |  CAST(SUM(${x.sql}) AS BIGINT) AS a1
         |FROM ${t.name}
         |${where.map(w => s"WHERE ${w._1}").getOrElse("")}
         |GROUP BY 1
         |${orderByAll(Seq("k0"))}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var df = t.load(s, d)
      where.foreach(w => df = df.filter(w._2))
      sortAll(df.groupBy(caseCol.as("k0"))
        .agg(count(lit(1)).as("a0"), sum(x.col).cast("long").as("a1")),
        Seq("k0"))
    }
    FuzzCase(seed, "case_chain", sql, build)
  }

  // ---- grammar v16: outer-join NULL group keys / correlated
  //      two-table NOT EXISTS / RANGE-frame date windows /
  //      events⋈TPC-H cross-schema joins ------------------------------

  /** GRAMMAR v16: an OUTER join whose unmatched side feeds GROUP BY —
    * the NULL-group seam at the join/agg boundary. The right side is
    * restricted IN THE ON CLAUSE (not WHERE — that would turn the outer
    * join back into an inner one), so unmatched left rows survive with
    * an all-NULL right side and land in the NULL group; COUNT(rk) vs
    * COUNT(*) pins the null-skipping count semantics on the same rows.
    * FULL variant adds right-only rows whose left aggregates are
    * empty-set NULLs. */
  private def genJoinNullGroup(r: Rng, seed: Long): FuzzCase = {
    val j = r.pick(joins)
    val full = r.bool(0.35)
    val jt = if (full) "FULL JOIN" else "LEFT JOIN"
    val onPred = pred(r, Seq(j.right))
    val g = r.pick(j.right.groupables)
    val useLeftKey = r.bool(0.4)
    val lg = r.pick(j.left.groupables)
    val kAliases = if (useLeftKey) Seq("k0", "k1") else Seq("k0")
    val (x, _, _) = r.pick(j.left.longs)
    val u = j.left.uniq.head
    val kSql = (Seq(s"${g.sql} AS k0") ++
      (if (useLeftKey) Seq(s"${lg.sql} AS k1") else Nil)).mkString(", ")
    val sql =
      s"""SELECT $kSql, COUNT(*) AS a0, COUNT(${j.rk.sql}) AS a1,
         |  CAST(SUM(${x.sql}) AS BIGINT) AS a2, MIN(${u.sql}) AS a3
         |FROM ${j.left.name} $jt ${j.right.name}
         |  ON ${j.lk.sql} = ${j.rk.sql} AND (${onPred._1})
         |GROUP BY ${kAliases.indices.map(_ + 1).mkString(", ")}
         |${orderByAll(kAliases)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      val joined = j.left.load(s, d).join(j.right.load(s, d),
        j.lk.col === j.rk.col && onPred._2,
        if (full) "full_outer" else "left_outer")
      val keys = Seq(g.col.as("k0")) ++
        (if (useLeftKey) Seq(lg.col.as("k1")) else Nil)
      sortAll(joined.groupBy(keys: _*)
        .agg(count(lit(1)).as("a0"), count(j.rk.col).as("a1"),
          sum(x.col).cast("long").as("a2"), min(u.col).as("a3")),
        kAliases)
    }
    FuzzCase(seed, "join_nullgroup", sql, build)
  }

  /** GRAMMAR v16: [NOT] EXISTS whose correlated subquery carries a
    * TWO-TABLE predicate — the equi-key correlation plus a cross-table
    * INEQUALITY referencing the outer row (`c.fk = o.pk AND c.x * m <=
    * o.y`), the shape that stresses decorrelation beyond the equi-only
    * rewrite (v7's genExistsSub). The DataFrame build renders it as a
    * semi/anti join with the compound condition directly — no
    * decorrelation machinery to share bugs with. */
  private def genNotExists2(r: Rng, seed: Long): FuzzCase = {
    val onOrders = r.bool(0.5)
    // (outer, child, equi fk=pk, cross-table inequality)
    val (outer, child, fk, pk) =
      if (onOrders) (orders, lineitem, L("l_orderkey"), L("o_orderkey"))
      else (customer, orders, L("o_custkey"), L("c_custkey"))
    val anti = r.bool(0.6)
    val op = if (anti) "NOT EXISTS" else "EXISTS"
    // child columns render UNQUALIFIED inside the subquery (TPC-H
    // prefixes make every name unique, and atom()'s CAST-wrapped exprs
    // can't take a correlation alias); outer references are qualified
    // by table name
    val (crossSql, crossCol) =
      if (onOrders) {
        val m = 5 + r.int(20)
        (s"l_suppkey * $m <= ${outer.name}.o_custkey",
          col("l_suppkey") * m.toLong <= col("o_custkey"))
      } else {
        val m = 1990 + r.int(4)
        (s"CAST(year(o_orderdate) AS BIGINT) - $m <= ${outer.name}.c_nationkey",
          year(col("o_orderdate")).cast("long") - m.toLong <=
            col("c_nationkey").cast("long"))
      }
    val childAtom = if (r.bool(0.6)) Some(atom(r, child)) else None
    val childSql = childAtom.map(a => s" AND ${a._1}").getOrElse("")
    val g = r.pick(outer.groupables)
    val u = outer.uniq.head
    val where = if (r.bool(0.5)) Some(pred(r, Seq(outer))) else None
    val whereSql = where.map(w => s"AND (${w._1})").getOrElse("")
    val sql =
      s"""SELECT ${g.sql} AS k0, COUNT(*) AS a0, MIN(${u.sql}) AS a1
         |FROM ${outer.name}
         |WHERE $op (SELECT 1 FROM ${child.name}
         |  WHERE ${fk.sql} = ${outer.name}.${pk.sql}
         |    AND $crossSql$childSql)
         |  $whereSql
         |GROUP BY 1
         |${orderByAll(Seq("k0"))}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var o = outer.load(s, d)
      where.foreach(w => o = o.filter(w._2))
      var cond = pk.col === fk.col && crossCol
      childAtom.foreach(a => cond = cond && a._2)
      val kept = o.join(child.load(s, d), cond,
        if (anti) "left_anti" else "left_semi")
      sortAll(kept.groupBy(g.col.as("k0"))
        .agg(count(lit(1)).as("a0"), min(u.col).as("a1")), Seq("k0"))
    }
    FuzzCase(seed, "not_exists2", sql, build)
  }

  /** GRAMMAR v16: RANGE-frame window ordered by a DATE-derived index —
    * `year*366 + dayofyear` (monotone in the date, identical integer in
    * both engines), frame `RANGE BETWEEN n PRECEDING AND CURRENT ROW`
    * in DAYS-ish units. RANGE is VALUE-based: rows sharing a date share
    * a frame regardless of physical order, which is exactly the
    * determinism ROWS frames lack on tied orders — and the seam where
    * an engine that quietly treats RANGE as ROWS diverges on the first
    * duplicate date. A mandatory key-range WHERE keeps the per-row
    * output bounded. */
  private def genRangeDate(r: Rng, seed: Long): FuzzCase = {
    val onOrders = r.bool(0.5)
    val (t, dSql, dCol, part, v) =
      if (onOrders)
        (orders, "o_orderdate", col("o_orderdate"),
          r.pick(Seq(S("o_orderstatus"), S("o_orderpriority"))),
          L("o_custkey"))
      else
        (lineitem, "l_shipdate", col("l_shipdate"),
          r.pick(Seq(S("l_returnflag"), S("l_linestatus"))),
          L("l_partkey"))
    val keyCut = 1000L + r.range(500L, 2500L)
    val cutSql = if (onOrders) s"o_orderkey < $keyCut"
      else s"l_orderkey < $keyCut"
    val cutCol = if (onOrders) col("o_orderkey") < keyCut
      else col("l_orderkey") < keyCut
    val n = 7L + r.int(54).toLong
    val diSql = s"(CAST(year($dSql) AS BIGINT) * 366 + " +
      s"CAST(dayofyear($dSql) AS BIGINT))"
    val diCol = (year(dCol).cast("long") * 366L +
      dayofyear(dCol).cast("long"))
    val u = t.uniq
    val uSql = u.map(_.sql).mkString(", ")
    val uAliases = u.indices.map(i => s"u$i")
    val sql =
      s"""SELECT ${part.sql} AS k0, $diSql AS di,
         |  ${u.zip(uAliases).map { case (e, a) => s"${e.sql} AS $a" }
              .mkString(", ")},
         |  CAST(SUM(${v.sql}) OVER (PARTITION BY ${part.sql}
         |    ORDER BY $diSql
         |    RANGE BETWEEN $n PRECEDING AND CURRENT ROW) AS BIGINT) AS a0,
         |  COUNT(*) OVER (PARTITION BY ${part.sql}
         |    ORDER BY $diSql
         |    RANGE BETWEEN $n PRECEDING AND CURRENT ROW) AS a1
         |FROM ${t.name}
         |WHERE $cutSql
         |${orderByAll(Seq("k0", "di") ++ uAliases)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      val w = Window.partitionBy(part.col).orderBy(diCol.asc)
        .rangeBetween(-n, 0)
      val df = t.load(s, d).filter(cutCol)
        .select((Seq(part.col.as("k0"), diCol.as("di")) ++
          u.zip(uAliases).map { case (e, a) => e.col.as(a) } ++
          Seq(sum(v.col).over(w).cast("long").as("a0"),
            count(lit(1)).over(w).as("a1"))): _*)
      sortAll(df, Seq("k0", "di") ++ uAliases)
    }
    FuzzCase(seed, "range_date", sql, build)
  }

  /** GRAMMAR v16: the fuzzer's two schemas finally meet — events
    * (2024 timestamps, user_id) joined to a TPC-H dimension on
    * user_id = key, grouped by a dimension attribute and/or the event
    * day. The supplier edge (s_suppkey ≤ 100 < max user_id) leaves
    * unmatched users; LEFT variant routes them to the NULL group,
    * INNER drops them — both against the same oracle text. */
  private def genCrossTime(r: Rng, seed: Long): FuzzCase = {
    val onCust = r.bool(0.5)
    val (dim, dimKeySql, dimKeyCol, dimAttr) =
      if (onCust) (customer, "c_custkey", col("c_custkey"),
        r.pick(Seq(S("c_mktsegment"), LI("c_nationkey"))))
      else (supplier, "CAST(s_suppkey AS BIGINT)",
        col("s_suppkey").cast("long"), LI("s_nationkey"))
    val left = r.bool(0.4)
    val jt = if (left) "LEFT JOIN" else "JOIN"
    val ePred = eventPred(r)
    val dPred = if (r.bool(0.4)) Some(pred(r, Seq(dim))) else None
    val useDay = r.bool(0.5)
    val kAliases = if (useDay) Seq("k0", "k1") else Seq("k0")
    val kSql = (Seq(s"${dimAttr.sql} AS k0") ++
      (if (useDay) Seq("CAST(date_trunc('day', ts) AS DATE) AS k1")
       else Nil)).mkString(", ")
    val whereSql = (Seq(s"(${ePred._1})") ++
      dPred.map(p => s"(${p._1})")).mkString(" AND ")
    val sql =
      s"""SELECT $kSql, COUNT(*) AS a0, COUNT(DISTINCT user_id) AS a1,
         |  MIN(event_id) AS a2, COUNT($dimKeySql) AS a3
         |FROM events $jt ${dim.name} ON user_id = $dimKeySql
         |WHERE $whereSql
         |GROUP BY ${kAliases.indices.map(_ + 1).mkString(", ")}
         |${orderByAll(kAliases)}""".stripMargin
    val build = (s: SparkSession, d: String) => {
      var ev = Tables.events(s, d).filter(ePred._2)
      var dm = dim.load(s, d)
      val joined = ev.join(dm, col("user_id") === dimKeyCol,
        if (left) "left_outer" else "inner")
      val filtered = dPred.map(p => joined.filter(p._2)).getOrElse(joined)
      val keys = Seq(dimAttr.col.as("k0")) ++
        (if (useDay) Seq(to_date(date_trunc("day", col("ts"))).as("k1"))
         else Nil)
      sortAll(filtered.groupBy(keys: _*)
        .agg(count(lit(1)).as("a0"), countDistinct(col("user_id")).as("a1"),
          min(col("event_id")).as("a2"), count(dimKeyCol).as("a3")),
        kAliases)
    }
    FuzzCase(seed, "xjoin_time", sql, build)
  }

  /** Generate the case for a seed (shape chosen by the seed too).
    * Seeds >= 2000 draw from grammar v2, >= 3000 from v3, >= 4000 from
    * v4, >= 5000 from v5, >= 6000 from v6, >= 7000 from v7, >= 8000
    * from v8, >= 9000 from v9, >= 10000 from v10, >= 11000 from v11,
    * >= 12000 from v12, >= 13000 from v13, >= 14000 from v14, >= 15000
    * from v15, >= 16000 from v16; earlier dispatches are FROZEN —
    * changing one would redefine every pinned seed in its range. */
  def gen(seed: Long): FuzzCase = {
    val r = new Rng(seed)
    if (seed >= 16000L) {
      r.int(12) match {
        case 0 | 1 | 2 => genJoinNullGroup(r, seed)
        case 3 | 4 | 5 => genNotExists2(r, seed)
        case 6 | 7 | 8 => genRangeDate(r, seed)
        case _         => genCrossTime(r, seed)
      }
    } else if (seed >= 15000L) {
      r.int(6) match {
        case 0 | 1 => genLimitSub(r, seed)
        case 2 | 3 => genHavingAgg(r, seed)
        case _     => genCaseChain(r, seed)
      }
    } else if (seed >= 14000L) {
      // NON-power-of-2 bound: java.util.Random's first nextInt(2^k) is
      // computed from the top bits of one LCG step, which are strongly
      // correlated across sequential seeds — an int(8) dispatch here
      // made ALL of 14001..14059 draw the same shape. int(12) takes the
      // modulo path (low bits), which the v1..v13 int(6)/int(20)
      // dispatches already rely on.
      r.int(12) match {
        case 0 | 1 | 2  => genCoerceUnion(r, seed)
        case 3 | 4 | 5  => genNullsOrder(r, seed)
        case 6 | 7 | 8  => genCteReuse(r, seed)
        case _          => genCorrScalar(r, seed)
      }
    } else if (seed >= 13000L) {
      r.int(6) match {
        case 0 | 1 => genEventDay(r, seed)
        case 2 | 3 => genEventSemi(r, seed)
        case _     => genEventTop(r, seed)
      }
    } else if (seed >= 12000L) {
      r.int(6) match {
        case 0 | 1 => genWinValue(r, seed)
        case 2 | 3 => genExtract(r, seed)
        case _     => genStrPad(r, seed)
      }
    } else if (seed >= 11000L) {
      r.int(6) match {
        case 0 | 1 => genNotIn(r, seed)
        case 2 | 3 => genGreatestLeast(r, seed)
        case _     => genMultiDistinct(r, seed)
      }
    } else if (seed >= 10000L) {
      r.int(6) match {
        case 0 | 1 => genArgMax(r, seed)
        case 2 | 3 => genMedian(r, seed)
        case _     => genBitOps(r, seed)
      }
    } else if (seed >= 9000L) {
      r.int(6) match {
        case 0 | 1 => genPivot(r, seed)
        case 2 | 3 => genExplode(r, seed)
        case _     => genSetOpPrec(r, seed)
      }
    } else if (seed >= 8000L) {
      r.int(6) match {
        case 0 | 1 => genScalarSub(r, seed)
        case 2 | 3 => genGroupingSets(r, seed)
        case _     => genStrFunc(r, seed)
      }
    } else if (seed >= 7000L) {
      r.int(6) match {
        case 0 | 1 => genExistsSub(r, seed)
        case 2 | 3 => genAggJoin(r, seed)
        case _     => genNtile(r, seed)
      }
    } else if (seed >= 6000L) {
      r.int(6) match {
        case 0     => genFullJoin(r, seed)
        case 1     => genLeftResidual(r, seed)
        case 2 | 3 => genJoin3(r, seed)
        case _     => genAggFilter(r, seed)
      }
    } else if (seed >= 5000L) {
      r.int(6) match {
        case 0 | 1 => genRollup(r, seed)
        case 2 | 3 => genScalarTyping(r, seed)
        case _     => genModArith(r, seed)
      }
    } else if (seed >= 4000L) {
      r.int(6) match {
        case 0 | 1 => genDateArith(r, seed)
        case 2 | 3 => genRangeWin(r, seed)
        case _     => genStrOrder(r, seed)
      }
    } else if (seed >= 3000L) {
      r.int(6) match {
        case 0 | 1 => genSetOpAll(r, seed)
        case 2 | 3 => genNullKeyAgg(r, seed)
        case _     => genWinDecimal(r, seed)
      }
    } else if (seed >= 2000L) {
      r.int(6) match {
        case 0 | 1 => genOuterNull(r, seed)
        case 2 | 3 => genDecimalAgg(r, seed)
        case _     => genWinAgg2(r, seed)
      }
    } else r.int(20) match {
      case 0 | 1 | 2 | 3 => genAgg(r, seed)
      case 4 | 5 => genWindow(r, seed)
      case 6 | 7 => genReagg(r, seed)
      case 8 | 9 | 10 => genSetOp(r, seed)
      case 11 | 12 => genSemi(r, seed)
      case 13 => genScalar(r, seed)
      case 14 | 15 => genWinAgg(r, seed)
      case 16 | 17 => genChain(r, seed)
      case _ => genTopAgg(r, seed)
    }
  }

  /** Seed-pinned registry gates: the driver's DuckDB oracle runs the
    * shared SQL; the Spark side runs the independent DataFrame build.
    * Seeds are stable constants — a divergence found by the 200-seed
    * sweep gets PROMOTED into this list as a named regression.
    *
    * 1300: the FuzzSweep cross-ENGINE sweep's first real catch (range
    * [1200,1700), round 8) — a winagg_rows case over lineitem whose
    * final ORDER BY relied on the catalog's declared (l_orderkey,
    * l_linenumber) key; the synthetic data carries ~2% duplicate pairs,
    * the presentation sort tied, and Spark/DuckDB emitted different
    * tie orders. Fixed by sorting on every output column; pinned so
    * the class never regresses. */
  val pinnedSeeds: Seq[Long] = ((1001L to 1024L) :+ 1300L) ++
    (2001L to 2028L) ++ // grammar v2: outer_null / decimal_agg / winagg2
    (3001L to 3016L) ++ // grammar v3: setop-ALL / nullkey_agg / win_decimal
    // grammar v4: date_arith / range_win / str_order. 4010 and 4012 are
    // skipped (their seeded predicates intersect to ZERO rows at every
    // SF — a 0-row gate exercises nothing); 4017/4018 take their slots.
    ((4001L to 4018L) diff Seq(4010L, 4012L)) ++
    // grammar v5: rollup/cube+GROUPING / scalar typing / signed modulo.
    // 5006 skipped (zero-row predicate intersection); 5017 takes its slot.
    ((5001L to 5017L) diff Seq(5006L)) ++
    // grammar v6: full_join / left_residual / join3 / agg_filter. All of
    // 6001..6016 are non-empty (min 1 row) and the four shapes are all
    // represented (5/4/5/2).
    (6001L to 6016L) ++
    // grammar v7: exists_sub/not_exists / aggjoin / ntile_rank. All of
    // 7001..7016 non-empty (min 1 row), shapes 4/6/6. Seed 7435 of the
    // exploration sweep caught the DuckDB 1.0.0 decorrelation bug
    // documented in genExistsSub — pinned OUT by grammar (the triggering
    // draw is degenerate), not pinned in (the oracle is the wrong side).
    (7001L to 7016L) ++
    // grammar v8: scalar_sub / grouping_sets / str_func. All of
    // 8001..8016 non-empty (min 1 row), shapes 7/5/4.
    (8001L to 8016L) ++
    // grammar v9: pivot_condagg / explode_union / setop_prec. 9009 and
    // 9018 skipped (zero-row predicate intersections); 9017 takes a
    // slot. Shapes 6/4/6; 500-seed sweep clean on both differentials.
    ((9001L to 9018L) diff Seq(9009L, 9018L)) ++
    // grammar v10: argmax (MAX_BY/MIN_BY) / median2x / bitops. All of
    // 10001..10016 non-empty (min 1 row), shapes 4/7/5; 500-seed sweep
    // clean on both differentials after the lineitem argmax exclusion.
    (10001L to 10016L) ++
    // grammar v11: notin_null / greatest_least / multi_distinct. Five
    // zero-row seeds skipped (11001/11007/11009/11011 drew an in-range
    // NULLIF so the subquery NULL correctly empties NOT IN; 11010 is a
    // zero-row predicate); 11017..11021 fill the slots. Shapes 3/6/7;
    // 500-seed sweep clean on both differentials.
    ((11001L to 11021L) diff Seq(11001L, 11007L, 11009L, 11010L, 11011L)) ++
    // grammar v12: win_value / extract_date / str_pad. All of
    // 12001..12016 non-empty (min 2 rows), shapes 4/6/6; 500-seed
    // sweep clean on both differentials.
    (12001L to 12016L) ++
    // grammar v13: event_day / event_semi / event_topk over the events
    // time-series table. 13006/13012/13021 skipped (zero-row predicate
    // intersections); shapes 7/6/5; 500-seed sweep clean on both
    // differentials (cross-renderer + DuckDB cross-engine).
    ((13001L to 13021L) diff Seq(13006L, 13012L, 13021L)) ++
    // grammar v14: coerce_union / nulls_order / cte_reuse / corr_scalar.
    // 14008/14014 skipped (zero-row predicate intersections); shapes
    // 4/3/5/4; 500-seed sweep clean on both differentials.
    ((14001L to 14018L) diff Seq(14008L, 14014L)) ++
    // grammar v15: limit_sub / having_agg / case_chain. All of
    // 15001..15016 non-empty (min 1 row); shapes 4/7/5; 500-seed sweep
    // clean on both differentials.
    (15001L to 15016L) ++
    // grammar v16: join_nullgroup (outer joins feeding GROUP BY with
    // NULL keys) / not_exists2 (correlated two-table [NOT] EXISTS) /
    // range_date (RANGE frames over a date index) / xjoin_time
    // (events⋈TPC-H cross-schema joins). 16007 skipped (zero-row
    // predicate intersection); shapes 3/3/5/5; 500-seed sweep clean on
    // both differentials (cross-renderer + DuckDB cross-engine at
    // sf0.01, 21/21).
    ((16001L to 16017L) diff Seq(16007L)) ++
    // 11001: the one DELIBERATE zero-row pin — its in-range NULLIF makes
    // the NOT IN subquery emit a NULL, so 3VL correctly empties the
    // result. Every other zero-row draw is skipped as exercising
    // nothing; this one's emptiness IS the assertion (the any-NULL NOT
    // IN leg stays regression-guarded cross-engine — advisor r10 ask).
    Seq(11001L)

  val all: Seq[GQuery] = pinnedSeeds.map { seed =>
    val fc = gen(seed)
    GQuery(f"q_fuzz_$seed%04d", fc.build, Some(fc.sql),
      notes = s"differential fuzz case (shape=${fc.shape}, seed=$seed)")
  }
}
