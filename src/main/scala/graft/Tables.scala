package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Explicit-schema loaders for the driver testdata tables (TESTDATA.md).
  *
  * Production paths never `inferSchema` (SURVEY.md §1.3): every source has a
  * declared `StructType` so analysis errors surface at plan time, a requirement
  * for the 100 TB posture where a bad inference silently rescans data.
  *
  * At cluster scale these would be date-partitioned tables (see SURVEY.md §4 —
  * the reference's secondary indexes at database_schema.sql:172-179 map to
  * partition + sort-within-partition physical design); the loaders keep that
  * concern out of query code so only this layer changes.
  */
object Tables {

  val regionSchema: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nationSchema: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customerSchema: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplierSchema: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val partSchema: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val ordersSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitemSchema: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** Time-series fact table; stands in for the reference's `odds_history`
    * (database_schema.sql:46-61): append-only, event-time `ts`.
    *
    * The on-disk `ts` unit is NOT assumed: [[load]] probes the parquet
    * footer's logical type on each load. TIMESTAMP(MICROS)/(MILLIS) data
    * (the current testdata) is read directly as `TimestampType`;
    * TIMESTAMP(NANOS) data — which Spark's vectorized reader only surfaces
    * as INT64 under `spark.sql.legacy.parquet.nanosAsLong=true`, set by
    * [[GraftSession]] — goes through [[eventsRawSchema]] and an explicit
    * ns→µs integer division (floor — matching DuckDB's ns→µs truncation).
    * Guessing the unit and guessing wrong silently collapses every event
    * near the 1970 epoch; [[assertEventsSane]] is the loud backstop. */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  val schemas: Map[String, StructType] = Map(
    "region" -> regionSchema,
    "nation" -> nationSchema,
    "customer" -> customerSchema,
    "supplier" -> supplierSchema,
    "part" -> partSchema,
    "orders" -> ordersSchema,
    "lineitem" -> lineitemSchema,
    "events" -> eventsSchema,
    "documents" -> documentsSchema,
    "embeddings" -> embeddingsSchema)

  /** Footer-probed physical type of `events.ts` per path — LongType means
    * parquet TIMESTAMP(NANOS) (only visible as INT64 under nanosAsLong),
    * TimestampType means MICROS/MILLIS. Footer-only read, cached per path. */
  private val tsUnitCache = new java.util.concurrent.ConcurrentHashMap[String, DataType]()

  private def eventsTsType(spark: SparkSession, path: String): DataType =
    tsUnitCache.computeIfAbsent(path, p =>
      spark.read.parquet(p).schema("ts").dataType)

  /** Load one table from a scale-factor directory with its declared schema. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      val path = s"$sfDir/events.parquet"
      eventsTsType(spark, path) match {
        // NTZ = footer isAdjustedToUTC=false (the generator's unit); with the
        // session TZ pinned UTC the naive wall-clock micros ARE the UTC
        // instants, so reading through the TimestampType schema is exact.
        case TimestampType | TimestampNTZType =>
          spark.read.schema(eventsSchema).parquet(path)
        case LongType =>
          import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
          spark.read.schema(eventsRawSchema).parquet(path)
            // `div` (integer division) — a double division would lose
            // precision above 2^53 ns and shift timestamps by whole µs.
            .withColumn("ts", timestamp_micros(expr("ts div 1000")))
            .select(eventsSchema.fieldNames.map(col).toSeq: _*)
        case other =>
          throw new IllegalStateException(
            s"events.ts at $path has unsupported physical type $other — " +
            "expected TimestampType (parquet MICROS/MILLIS) or LongType " +
            "(parquet NANOS under spark.sql.legacy.parquet.nanosAsLong)")
      }
    } else {
      spark.read.schema(schemas(name)).parquet(s"$sfDir/$name.parquet")
    }

  /** TESTDATA DRIFT GUARD (the round-6 incident, generalized): one
    * human-readable violation per problem; empty = healthy.
    *
    * Three layers, cheapest first:
    *  1. INFERRED footer schema vs the declared schemas — the explicit-
    *     schema loads would silently COERCE a physical-type drift (reading
    *     TIMESTAMP(MICROS) through a LongType field is exactly how round 6
    *     corrupted 24 queries), so the guard must look at what's actually
    *     on disk. Timestamp columns accept {LTZ, NTZ, INT64} because
    *     [[load]] handles all three — for those, layer 3 is the guard.
    *  2. row counts > 0 per table.
    *  3. loaded-VALUE range probes on every time column: events.ts inside
    *     the generator's Jan-2024 window, orders/lineitem dates inside the
    *     TPC-H-ish 1990-2010 band. A wrong unit interpretation lands ÷1000
    *     near the 1970 epoch or ×1000 in year ~56k — far outside either
    *     band — so a future regeneration produces ONE clear message here
    *     instead of a sea of oracle hash mismatches. */
  def testdataDrift(spark: SparkSession, sfDir: String): Seq[String] = {
    import org.apache.spark.sql.functions.{count => fcount, lit, max, min}
    val issues = scala.collection.mutable.Buffer[String]()
    for ((name, declared) <- schemas.toSeq.sortBy(_._1)) {
      val path = s"$sfDir/$name.parquet"
      val inferred =
        try spark.read.parquet(path).schema
        catch { case e: Exception =>
          issues += s"$name: unreadable at $path (${e.getMessage})"
          StructType(Nil)
        }
      if (inferred.nonEmpty) {
        for (f <- declared.fields)
          inferred.find(_.name == f.name) match {
            case None =>
              issues += s"$name.${f.name}: column missing on disk"
            case Some(g) =>
              val ok = (f.dataType, g.dataType) match {
                case (TimestampType,
                  TimestampType | TimestampNTZType | LongType) => true
                case (a, b) => a == b
              }
              if (!ok) issues += s"$name.${f.name}: declared " +
                s"${f.dataType.simpleString} vs on-disk " +
                s"${g.dataType.simpleString} — schema coercion would " +
                "corrupt values"
          }
      }
    }
    // value-range probes on loaded (post-coercion) time columns
    val probes = Seq(
      ("events", "ts", "2023-12-31", "2024-02-02"),
      ("orders", "o_orderdate", "1990-01-01", "2010-01-01"),
      ("lineitem", "l_shipdate", "1990-01-01", "2010-01-01"))
    for ((table, tsCol, loOk, hiOk) <- probes) {
      try {
        val row = load(spark, sfDir, table)
          .agg(fcount(lit(1)), min(tsCol), max(tsCol)).head()
        if (row.getLong(0) == 0L) issues += s"$table: zero rows"
        else {
          val (lo, hi) = (row.getTimestamp(1), row.getTimestamp(2))
          val (floor, ceil) = (java.sql.Timestamp.valueOf(s"$loOk 00:00:00"),
            java.sql.Timestamp.valueOf(s"$hiOk 00:00:00"))
          if (!(lo.after(floor) && hi.before(ceil)))
            issues += s"testdata drift: $table.$tsCol range [$lo, $hi] " +
              s"outside the generator's [$loOk, $hiOk) window — check the " +
              s"parquet timestamp unit at $sfDir (micros vs nanos) before " +
              "trusting any event-time query result"
        }
      } catch { case e: Exception =>
        issues += s"$table.$tsCol: probe failed (${e.getMessage})"
      }
    }
    issues.toSeq
  }

  /** Loud wrapper: fail with every violation in one message. */
  def assertTestdataSane(spark: SparkSession, sfDir: String): Unit = {
    val issues = testdataDrift(spark, sfDir)
    require(issues.isEmpty,
      s"testdata drift detected at $sfDir:\n  ${issues.mkString("\n  ")}")
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
