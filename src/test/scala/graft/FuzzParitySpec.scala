package graft

import graft.queries.Fuzz

/** The in-JVM half of the differential fuzzer (see [[graft.queries.Fuzz]]):
  * for N random seeds per run, the DataFrame-API build and `spark.sql` of
  * the shared ANSI text must return IDENTICAL ordered results — the two
  * renderings are produced independently from the same AST, so a mismatch
  * is either a generator bug or Spark analyzer/dialect drift. The
  * cross-ENGINE half (the same SQL in DuckDB vs the DataFrame build) runs
  * through the 24 seed-pinned q_fuzz_* registry gates at verify time.
  *
  * Seeds are deterministic (0 until N) so a failure names a reproducible
  * case: `Fuzz.gen(seed)` prints the SQL, and the fix is either a grammar
  * repair or a PROMOTION of the seed into [[Fuzz.pinnedSeeds]] as a named
  * regression gate.
  */
class FuzzParitySpec extends SparkSpec {

  private val N = 200

  test(s"$N random grammar plans: DataFrame build == spark.sql(shared text)") {
    // the shared text references the tables by bare name
    for (t <- Seq("lineitem", "orders", "customer", "part", "supplier",
        "nation"))
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    var checked = 0
    val shapes = scala.collection.mutable.Map[String, Int]()
    for (seed <- 0L until N.toLong) {
      val fc = Fuzz.gen(seed)
      shapes(fc.shape) = shapes.getOrElse(fc.shape, 0) + 1
      val viaDf = fc.build(spark, sfDir).collect().map(_.toString).toSeq
      val viaSql = spark.sql(fc.sql).collect().map(_.toString).toSeq
      assert(viaDf == viaSql,
        s"seed=$seed shape=${fc.shape} diverged:\nSQL:\n${fc.sql}\n" +
          s"df rows=${viaDf.size} sql rows=${viaSql.size}\n" +
          s"first diff: ${viaDf.zipAll(viaSql, "<missing>", "<missing>")
            .find(p => p._1 != p._2)}")
      checked += 1
    }
    assert(checked == N)
    // every shape of the grammar must actually be exercised by the sweep
    for (shape <- Seq("agg", "join_agg", "window", "reagg", "semi_sub",
        "anti_sub", "scalar_sub"))
      assert(shapes.keys.exists(_.startsWith(shape)),
        s"shape $shape never generated in $N seeds: $shapes")
    assert(shapes.keys.exists(_.startsWith("setop_")),
      s"set-op shapes never generated in $N seeds: $shapes")
  }

  private val N2 = 100

  test(s"$N2 grammar-v2 plans (seeds 2000+): DataFrame build == spark.sql") {
    // v2 shapes (round-9): outer joins with NULL-mangled keys,
    // DECIMAL-producing aggregates, widened window-aggregate family
    for (t <- Seq("lineitem", "orders", "customer", "part", "supplier",
        "nation"))
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    val shapes = scala.collection.mutable.Map[String, Int]()
    for (seed <- 2000L until (2000L + N2)) {
      val fc = Fuzz.gen(seed)
      shapes(fc.shape) = shapes.getOrElse(fc.shape, 0) + 1
      val viaDf = fc.build(spark, sfDir).collect().map(_.toString).toSeq
      val viaSql = spark.sql(fc.sql).collect().map(_.toString).toSeq
      assert(viaDf == viaSql,
        s"seed=$seed shape=${fc.shape} diverged:\nSQL:\n${fc.sql}\n" +
          s"df rows=${viaDf.size} sql rows=${viaSql.size}\n" +
          s"first diff: ${viaDf.zipAll(viaSql, "<missing>", "<missing>")
            .find(p => p._1 != p._2)}")
    }
    for (shape <- Seq("outer_null", "decimal_agg", "winagg2"))
      assert(shapes.keys.exists(_.startsWith(shape)),
        s"v2 shape $shape never generated in $N2 seeds: $shapes")
  }

  test(s"$N2 grammar-v3 plans (seeds 3000+): DataFrame build == spark.sql") {
    // v3 shapes (round-9): bag-semantics set ops (UNION/INTERSECT/EXCEPT
    // ALL), single-table NULL-key grouping, DECIMAL window sums
    for (t <- Seq("lineitem", "orders", "customer", "part", "supplier",
        "nation"))
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    val shapes = scala.collection.mutable.Map[String, Int]()
    for (seed <- 3000L until (3000L + N2)) {
      val fc = Fuzz.gen(seed)
      shapes(fc.shape) = shapes.getOrElse(fc.shape, 0) + 1
      val viaDf = fc.build(spark, sfDir).collect().map(_.toString).toSeq
      val viaSql = spark.sql(fc.sql).collect().map(_.toString).toSeq
      assert(viaDf == viaSql,
        s"seed=$seed shape=${fc.shape} diverged:\nSQL:\n${fc.sql}\n" +
          s"df rows=${viaDf.size} sql rows=${viaSql.size}\n" +
          s"first diff: ${viaDf.zipAll(viaSql, "<missing>", "<missing>")
            .find(p => p._1 != p._2)}")
    }
    for (shape <- Seq("setopall_", "nullkey_agg", "win_decimal"))
      assert(shapes.keys.exists(_.startsWith(shape)),
        s"v3 shape $shape never generated in $N2 seeds: $shapes")
  }

  test(s"$N2 grammar-v4 plans (seeds 4000+): DataFrame build == spark.sql") {
    // v4 shapes (round-10): calendar date/interval arithmetic (month-end
    // clamping), RANGE frames with numeric offsets over tied order keys
    // (peers-inclusive frame end), binary-collation string ordering
    // (RANK/DENSE_RANK tie semantics)
    for (t <- Seq("lineitem", "orders", "customer", "part", "supplier",
        "nation"))
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    val shapes = scala.collection.mutable.Map[String, Int]()
    for (seed <- 4000L until (4000L + N2)) {
      val fc = Fuzz.gen(seed)
      shapes(fc.shape) = shapes.getOrElse(fc.shape, 0) + 1
      val viaDf = fc.build(spark, sfDir).collect().map(_.toString).toSeq
      val viaSql = spark.sql(fc.sql).collect().map(_.toString).toSeq
      assert(viaDf == viaSql,
        s"seed=$seed shape=${fc.shape} diverged:\nSQL:\n${fc.sql}\n" +
          s"df rows=${viaDf.size} sql rows=${viaSql.size}\n" +
          s"first diff: ${viaDf.zipAll(viaSql, "<missing>", "<missing>")
            .find(p => p._1 != p._2)}")
    }
    for (shape <- Seq("date_arith", "range_win", "str_order"))
      assert(shapes.keys.exists(_.startsWith(shape)),
        s"v4 shape $shape never generated in $N2 seeds: $shapes")
  }

  test(s"$N2 grammar-v5 plans (seeds 5000+): DataFrame build == spark.sql") {
    // v5 shapes (round-10): ROLLUP/CUBE with GROUPING() flags (the
    // empty-input grand-total divergence is pinned out via HAVING — see
    // genRollup's scaladoc), NULLIF/COALESCE/CASE typing, signed modulo
    for (t <- Seq("lineitem", "orders", "customer", "part", "supplier",
        "nation"))
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    val shapes = scala.collection.mutable.Map[String, Int]()
    for (seed <- 5000L until (5000L + N2)) {
      val fc = Fuzz.gen(seed)
      shapes(fc.shape) = shapes.getOrElse(fc.shape, 0) + 1
      val viaDf = fc.build(spark, sfDir).collect().map(_.toString).toSeq
      val viaSql = spark.sql(fc.sql).collect().map(_.toString).toSeq
      assert(viaDf == viaSql,
        s"seed=$seed shape=${fc.shape} diverged:\nSQL:\n${fc.sql}\n" +
          s"df rows=${viaDf.size} sql rows=${viaSql.size}\n" +
          s"first diff: ${viaDf.zipAll(viaSql, "<missing>", "<missing>")
            .find(p => p._1 != p._2)}")
    }
    for (shape <- Seq("rollup_agg", "cube_agg", "scalar_typing", "mod_"))
      assert(shapes.keys.exists(_.startsWith(shape)),
        s"v5 shape $shape never generated in $N2 seeds: $shapes")
  }

  test(s"$N2 grammar-v6 plans (seeds 6000+): DataFrame build == spark.sql") {
    // v6 shapes (round-10): FULL OUTER join (both-side NULL keys),
    // LEFT JOIN with residual ON-clause predicates (ON-vs-WHERE
    // placement), three-table chains with mixed INNER/LEFT steps,
    // aggregate FILTER clauses vs their CASE-form definition
    for (t <- Seq("lineitem", "orders", "customer", "part", "supplier",
        "nation"))
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    val shapes = scala.collection.mutable.Map[String, Int]()
    for (seed <- 6000L until (6000L + N2)) {
      val fc = Fuzz.gen(seed)
      shapes(fc.shape) = shapes.getOrElse(fc.shape, 0) + 1
      val viaDf = fc.build(spark, sfDir).collect().map(_.toString).toSeq
      val viaSql = spark.sql(fc.sql).collect().map(_.toString).toSeq
      assert(viaDf == viaSql,
        s"seed=$seed shape=${fc.shape} diverged:\nSQL:\n${fc.sql}\n" +
          s"df rows=${viaDf.size} sql rows=${viaSql.size}\n" +
          s"first diff: ${viaDf.zipAll(viaSql, "<missing>", "<missing>")
            .find(p => p._1 != p._2)}")
    }
    for (shape <- Seq("full_join", "left_residual", "join3", "agg_filter"))
      assert(shapes.keys.exists(_.startsWith(shape)),
        s"v6 shape $shape never generated in $N2 seeds: $shapes")
  }

  test(s"$N2 grammar-v7 plans (seeds 7000+): DataFrame build == spark.sql") {
    // v7 shapes (round-10): correlated EXISTS/NOT EXISTS (the SQL path
    // decorrelates, the DataFrame build IS the decorrelated semi/anti
    // join — optionally with a non-equi correlated atom), self-joins of
    // two aggregated subqueries (FULL variant: COALESCE'd keys +
    // sentinel aggregates), NTILE buckets next to RANK-with-real-ties
    for (t <- Seq("lineitem", "orders", "customer", "part", "supplier",
        "nation"))
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    val shapes = scala.collection.mutable.Map[String, Int]()
    for (seed <- 7000L until (7000L + N2)) {
      val fc = Fuzz.gen(seed)
      shapes(fc.shape) = shapes.getOrElse(fc.shape, 0) + 1
      val viaDf = fc.build(spark, sfDir).collect().map(_.toString).toSeq
      val viaSql = spark.sql(fc.sql).collect().map(_.toString).toSeq
      assert(viaDf == viaSql,
        s"seed=$seed shape=${fc.shape} diverged:\nSQL:\n${fc.sql}\n" +
          s"df rows=${viaDf.size} sql rows=${viaSql.size}\n" +
          s"first diff: ${viaDf.zipAll(viaSql, "<missing>", "<missing>")
            .find(p => p._1 != p._2)}")
    }
    for (shape <- Seq("exists_sub", "not_exists", "aggjoin_", "ntile_rank"))
      assert(shapes.keys.exists(_.startsWith(shape)),
        s"v7 shape $shape never generated in $N2 seeds: $shapes")
  }

  test(s"$N2 grammar-v8 plans (seeds 8000+): DataFrame build == spark.sql") {
    // v8 shapes (round-10): correlated scalar COUNT subqueries in the
    // select list (COUNT-over-no-rows = 0 null-correction; the DataFrame
    // build is the decorrelated pre-agg LEFT join + COALESCE 0),
    // explicit GROUPING SETS lattices with GROUPING() flags, and
    // string-function group keys (UPPER/SUBSTR/LENGTH/CONCAT)
    for (t <- Seq("lineitem", "orders", "customer", "part", "supplier",
        "nation"))
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    val shapes = scala.collection.mutable.Map[String, Int]()
    for (seed <- 8000L until (8000L + N2)) {
      val fc = Fuzz.gen(seed)
      shapes(fc.shape) = shapes.getOrElse(fc.shape, 0) + 1
      val viaDf = fc.build(spark, sfDir).collect().map(_.toString).toSeq
      val viaSql = spark.sql(fc.sql).collect().map(_.toString).toSeq
      assert(viaDf == viaSql,
        s"seed=$seed shape=${fc.shape} diverged:\nSQL:\n${fc.sql}\n" +
          s"df rows=${viaDf.size} sql rows=${viaSql.size}\n" +
          s"first diff: ${viaDf.zipAll(viaSql, "<missing>", "<missing>")
            .find(p => p._1 != p._2)}")
    }
    for (shape <- Seq("scalar_sub", "grouping_sets", "str_func"))
      assert(shapes.keys.exists(_.startsWith(shape)),
        s"v8 shape $shape never generated in $N2 seeds: $shapes")
  }

  test(s"$N2 grammar-v9 plans (seeds 9000+): DataFrame build == spark.sql") {
    // v9 shapes (round-10): Spark's relational PIVOT operator vs the
    // conditional-aggregate rewrite (COUNT cells COALESCEd to 0 — the
    // pivot NULL-cell seam), explode/posexplode generators vs a
    // UNION-ALL-branches CTE, and unparenthesized set-op precedence
    // chains (INTERSECT binds tighter; DataFrame groups explicitly)
    for (t <- Seq("lineitem", "orders", "customer", "part", "supplier",
        "nation"))
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    val shapes = scala.collection.mutable.Map[String, Int]()
    for (seed <- 9000L until (9000L + N2)) {
      val fc = Fuzz.gen(seed)
      shapes(fc.shape) = shapes.getOrElse(fc.shape, 0) + 1
      val viaDf = fc.build(spark, sfDir).collect().map(_.toString).toSeq
      val viaSql = spark.sql(fc.sql).collect().map(_.toString).toSeq
      assert(viaDf == viaSql,
        s"seed=$seed shape=${fc.shape} diverged:\nSQL:\n${fc.sql}\n" +
          s"df rows=${viaDf.size} sql rows=${viaSql.size}\n" +
          s"first diff: ${viaDf.zipAll(viaSql, "<missing>", "<missing>")
            .find(p => p._1 != p._2)}")
    }
    for (shape <- Seq("pivot_condagg", "explode_union", "setop_prec"))
      assert(shapes.keys.exists(_.startsWith(shape)),
        s"v9 shape $shape never generated in $N2 seeds: $shapes")
  }

  test(s"$N2 grammar-v10 plans (seeds 10000+): DataFrame build == spark.sql") {
    // v10 shapes (round-10): MAX_BY/MIN_BY ordered-selection aggregates
    // (always ordered by a per-group-unique key for determinism), exact
    // MEDIAN kept integer-exact via CAST(2*MEDIAN(x) AS BIGINT), and
    // bitwise expressions/aggregates (&-mask keys, BIT_COUNT keys,
    // BIT_AND/BIT_OR reductions, all CAST to BIGINT)
    for (t <- Seq("lineitem", "orders", "customer", "part", "supplier",
        "nation"))
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    val shapes = scala.collection.mutable.Map[String, Int]()
    for (seed <- 10000L until (10000L + N2)) {
      val fc = Fuzz.gen(seed)
      shapes(fc.shape) = shapes.getOrElse(fc.shape, 0) + 1
      val viaDf = fc.build(spark, sfDir).collect().map(_.toString).toSeq
      val viaSql = spark.sql(fc.sql).collect().map(_.toString).toSeq
      assert(viaDf == viaSql,
        s"seed=$seed shape=${fc.shape} diverged:\nSQL:\n${fc.sql}\n" +
          s"df rows=${viaDf.size} sql rows=${viaSql.size}\n" +
          s"first diff: ${viaDf.zipAll(viaSql, "<missing>", "<missing>")
            .find(p => p._1 != p._2)}")
    }
    for (shape <- Seq("argmax", "median2x", "bitops"))
      assert(shapes.keys.exists(_.startsWith(shape)),
        s"v10 shape $shape never generated in $N2 seeds: $shapes")
  }

  test(s"$N2 grammar-v11 plans (seeds 11000+): DataFrame build == spark.sql") {
    // v11 shapes (round-10): NOT IN with NULLIF-mangled subquery and
    // probe sides (the DataFrame build is the independent 3VL
    // decorrelation: anti-join + broadcast (n, nn) stats), GREATEST /
    // LEAST null-skipping over NULLIF-mangled operands, and multiple
    // DISTINCT aggregates in one SELECT (Spark's Expand rewrite vs
    // DuckDB's native multi-distinct)
    for (t <- Seq("lineitem", "orders", "customer", "part", "supplier",
        "nation"))
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    val shapes = scala.collection.mutable.Map[String, Int]()
    for (seed <- 11000L until (11000L + N2)) {
      val fc = Fuzz.gen(seed)
      shapes(fc.shape) = shapes.getOrElse(fc.shape, 0) + 1
      val viaDf = fc.build(spark, sfDir).collect().map(_.toString).toSeq
      val viaSql = spark.sql(fc.sql).collect().map(_.toString).toSeq
      assert(viaDf == viaSql,
        s"seed=$seed shape=${fc.shape} diverged:\nSQL:\n${fc.sql}\n" +
          s"df rows=${viaDf.size} sql rows=${viaSql.size}\n" +
          s"first diff: ${viaDf.zipAll(viaSql, "<missing>", "<missing>")
            .find(p => p._1 != p._2)}")
    }
    for (shape <- Seq("notin_null", "greatest_least", "multi_distinct"))
      assert(shapes.keys.exists(_.startsWith(shape)),
        s"v11 shape $shape never generated in $N2 seeds: $shapes")
  }

  test(s"$N2 grammar-v12 plans (seeds 12000+): DataFrame build == spark.sql") {
    // v12 shapes (round-10): window value functions (FIRST_VALUE full
    // frame / LAST_VALUE sliding ROWS frame / NTH_VALUE running frame,
    // ordered by a verified-unique key), EXTRACT date-part group keys
    // (dow/week excluded — known cross-engine numbering seams), and
    // LPAD/RPAD/REVERSE/REPEAT string-shaping keys
    for (t <- Seq("lineitem", "orders", "customer", "part", "supplier",
        "nation"))
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    val shapes = scala.collection.mutable.Map[String, Int]()
    for (seed <- 12000L until (12000L + N2)) {
      val fc = Fuzz.gen(seed)
      shapes(fc.shape) = shapes.getOrElse(fc.shape, 0) + 1
      val viaDf = fc.build(spark, sfDir).collect().map(_.toString).toSeq
      val viaSql = spark.sql(fc.sql).collect().map(_.toString).toSeq
      assert(viaDf == viaSql,
        s"seed=$seed shape=${fc.shape} diverged:\nSQL:\n${fc.sql}\n" +
          s"df rows=${viaDf.size} sql rows=${viaSql.size}\n" +
          s"first diff: ${viaDf.zipAll(viaSql, "<missing>", "<missing>")
            .find(p => p._1 != p._2)}")
    }
    for (shape <- Seq("win_value", "extract_date", "str_pad"))
      assert(shapes.keys.exists(_.startsWith(shape)),
        s"v12 shape $shape never generated in $N2 seeds: $shapes")
  }

  test(s"$N2 grammar-v13 plans (seeds 13000+): DataFrame build == spark.sql") {
    // v13 shapes (round-10): the EVENTS table — calendar-bucket aggs
    // (date_trunc keys CAST to DATE across the DuckDB-DATE vs
    // Spark-TIMESTAMP seam; MIN/MAX only on the DOUBLE column),
    // behavioral IN / NOT IN membership between two time windows, and
    // per-key top-k by value with the unique event_id tie-break
    for (t <- Seq("lineitem", "orders", "customer", "part", "supplier",
        "nation", "events"))
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    val shapes = scala.collection.mutable.Map[String, Int]()
    for (seed <- 13000L until (13000L + N2)) {
      val fc = Fuzz.gen(seed)
      shapes(fc.shape) = shapes.getOrElse(fc.shape, 0) + 1
      val viaDf = fc.build(spark, sfDir).collect().map(_.toString).toSeq
      val viaSql = spark.sql(fc.sql).collect().map(_.toString).toSeq
      assert(viaDf == viaSql,
        s"seed=$seed shape=${fc.shape} diverged:\nSQL:\n${fc.sql}\n" +
          s"df rows=${viaDf.size} sql rows=${viaSql.size}\n" +
          s"first diff: ${viaDf.zipAll(viaSql, "<missing>", "<missing>")
            .find(p => p._1 != p._2)}")
    }
    for (shape <- Seq("event_day", "event_semi", "event_topk"))
      assert(shapes.keys.exists(_.startsWith(shape)),
        s"v13 shape $shape never generated in $N2 seeds: $shapes")
  }

  test(s"$N2 grammar-v14 plans (seeds 14000+): DataFrame build == spark.sql") {
    // v14 shapes (round-11): UNION type-coercion lattice (INT/BIGINT/
    // DOUBLE branches, key left uncast in the shared text), explicit
    // NULLS FIRST/LAST in window + presentation order (the one seam
    // where engine DEFAULTS differ), CTE referenced twice (plan reuse
    // vs inline), correlated scalar subqueries in WHERE (COUNT's
    // empty-group-is-0 coalesce seam + MAX's empty-group-is-NULL 3VL)
    for (t <- Seq("lineitem", "orders", "customer", "part", "supplier",
        "nation"))
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    val shapes = scala.collection.mutable.Map[String, Int]()
    for (seed <- 14000L until (14000L + N2)) {
      val fc = Fuzz.gen(seed)
      shapes(fc.shape) = shapes.getOrElse(fc.shape, 0) + 1
      val viaDf = fc.build(spark, sfDir).collect().map(_.toString).toSeq
      val viaSql = spark.sql(fc.sql).collect().map(_.toString).toSeq
      assert(viaDf == viaSql,
        s"seed=$seed shape=${fc.shape} diverged:\nSQL:\n${fc.sql}\n" +
          s"df rows=${viaDf.size} sql rows=${viaSql.size}\n" +
          s"first diff: ${viaDf.zipAll(viaSql, "<missing>", "<missing>")
            .find(p => p._1 != p._2)}")
    }
    for (shape <- Seq("coerce_union", "nulls_order", "cte_reuse",
        "corr_scalar"))
      assert(shapes.keys.exists(_.startsWith(shape)),
        s"v14 shape $shape never generated in $N2 seeds: $shapes")
  }

  test(s"$N2 grammar-v15 plans (seeds 15000+): DataFrame build == spark.sql") {
    // v15 shapes (round-11): deterministic LIMIT subqueries (sorted
    // prefix on the unique key, re-aggregated outside), HAVING on
    // aggregates absent from the SELECT list, and CASE-chain group keys
    // with overlapping predicates (first-match-wins) incl. the
    // omitted-ELSE NULL group
    for (t <- Seq("lineitem", "orders", "customer", "part", "supplier",
        "nation"))
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    val shapes = scala.collection.mutable.Map[String, Int]()
    for (seed <- 15000L until (15000L + N2)) {
      val fc = Fuzz.gen(seed)
      shapes(fc.shape) = shapes.getOrElse(fc.shape, 0) + 1
      val viaDf = fc.build(spark, sfDir).collect().map(_.toString).toSeq
      val viaSql = spark.sql(fc.sql).collect().map(_.toString).toSeq
      assert(viaDf == viaSql,
        s"seed=$seed shape=${fc.shape} diverged:\nSQL:\n${fc.sql}\n" +
          s"df rows=${viaDf.size} sql rows=${viaSql.size}\n" +
          s"first diff: ${viaDf.zipAll(viaSql, "<missing>", "<missing>")
            .find(p => p._1 != p._2)}")
    }
    for (shape <- Seq("limit_sub", "having_agg", "case_chain"))
      assert(shapes.keys.exists(_.startsWith(shape)),
        s"v15 shape $shape never generated in $N2 seeds: $shapes")
  }

  test("seed 11001: any-NULL NOT IN correctly empties the result (3VL)") {
    // the one deliberately zero-row pin: its in-range NULLIF puts a NULL
    // in the NOT IN subquery, so three-valued logic must empty the
    // result. Both renderings must agree on EMPTY — a nonzero count in
    // either means the 3VL leg broke (the driver's DuckDB gate pins the
    // cross-engine side of the same assertion).
    for (t <- Seq("lineitem", "orders", "customer", "part", "supplier",
        "nation"))
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    val fc = Fuzz.gen(11001L)
    assert(fc.shape == "notin_null", s"seed 11001 drifted to ${fc.shape}")
    assert(fc.build(spark, sfDir).count() == 0L,
      s"11001 DataFrame build must be empty (any-NULL NOT IN):\n${fc.sql}")
    assert(spark.sql(fc.sql).count() == 0L,
      s"11001 spark.sql must be empty (any-NULL NOT IN):\n${fc.sql}")
  }

  test("pinned registry seeds generate stably (names and SQL are fixed)") {
    // the q_fuzz_* gates are only regression gates if regeneration is
    // bit-stable: same seed → same SQL text, run to run
    for (seed <- Fuzz.pinnedSeeds) {
      assert(Fuzz.gen(seed).sql == Fuzz.gen(seed).sql)
    }
    assert(Fuzz.all.map(_.name).distinct.size == Fuzz.pinnedSeeds.size)
  }
}
