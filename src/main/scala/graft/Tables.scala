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

  /** Loud drift guard: the driver testdata generator emits event times inside
    * Jan 2024 (TESTDATA.md, seed=42). A wrong unit assumption lands them near
    * the 1970 epoch (÷1000) or year ~56k (×1000) — either way outside this
    * window — so Verify/Bench fail with ONE clear message instead of a sea
    * of silent hash mismatches. */
  def assertEventsSane(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions.{max, min}
    val Array(lo, hi) = events(spark, sfDir)
      .agg(min("ts"), max("ts")).head().toSeq
      .map(_.asInstanceOf[java.sql.Timestamp]).toArray
    val floor = java.sql.Timestamp.valueOf("2023-12-31 00:00:00")
    val ceil  = java.sql.Timestamp.valueOf("2024-02-02 00:00:00")
    require(lo.after(floor) && hi.before(ceil),
      s"testdata drift: events.ts range [$lo, $hi] outside the generator's " +
      s"Jan-2024 window — check the parquet timestamp unit at $sfDir " +
      "(micros vs nanos) before trusting any event-time query result")
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
