package graft.sources

import java.util
import graft.functions.MinHashSignature.splitmix64
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.metric
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 source modeling the reference's REST fixture scan (S1,
  * .github/workflows/football-data-pipeline.yml:130-181) the way it must
  * look on a cluster: one `InputPartition` per (league, date) — the API's
  * natural request granularity — so 1000 executors fetch 1000 pages
  * concurrently, with the league/date listing pruned driver-side (the
  * reference's hour-of-day league pruning, yml:104-110, becomes an options
  * filter here).
  *
  * Zero-egress environment ⇒ the partition reader SYNTHESIZES its page
  * deterministically (seeded by league × date) instead of calling HTTP; the
  * fetch call is the single clearly-marked seam. Everything around it —
  * provider, table, scan builder, partition planning, per-partition reader —
  * is the real plumbing a production REST source uses.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.RestFixtureSource")
  *   .option("leagues", "39,140,78").option("days", "3")
  *   .option("startDate", "2024-08-01").load()
  * }}}
  */
class RestFixtureSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  /** short name: `spark.read.format("rest-fixtures")` */
  override def shortName(): String = "rest-fixtures"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestFixtureSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RestFixtureTable(new CaseInsensitiveStringMap(properties))
}

object RestFixtureSource {
  val schema: StructType = StructType(Seq(
    StructField("fixture_id", LongType, nullable = false),
    StructField("league_id", IntegerType, nullable = false),
    StructField("fixture_date", StringType, nullable = false),
    StructField("kickoff_utc", TimestampType, nullable = false),
    StructField("home_team_id", LongType, nullable = false),
    StructField("away_team_id", LongType, nullable = false),
    StructField("status", StringType, nullable = false)))

  val fixturesPerPage = 10

  /** HTTP 429 from the fixtures API (yml:140-145 — the workflow retries
    * the page, then SKIPS it so one throttled league never fails the whole
    * collection run). */
  final case class RateLimitedException(leagueId: Int, epochDay: Long)
      extends RuntimeException(
        s"429 Too Many Requests: league=$leagueId epochDay=$epochDay")

  /** Executor-side counters backing the DSv2 custom metrics; a spec on
    * local mode reads them directly (same JVM). */
  object Metrics {
    val retries = new java.util.concurrent.atomic.AtomicLong
    val skippedPages = new java.util.concurrent.atomic.AtomicLong
    def reset(): Unit = { retries.set(0); skippedPages.set(0) }
  }

  /** ==== the REST seam ====
    * Deterministic synthetic page for (league, date); a production build
    * replaces the body with the HTTP GET + JSON decode of
    * `/fixtures?league=...&date=...`. Signature and row shape unchanged.
    * `remaining429` simulates the API's throttling for fault-injection
    * tests: attempts numbered below it observe HTTP 429. */
  def fetchPage(leagueId: Int, epochDay: Long,
      attempt: Int = 0, remaining429: Int = 0): Seq[InternalRow] = {
    if (attempt < remaining429)
      throw RateLimitedException(leagueId, epochDay)
    (0 until fixturesPerPage).map { i =>
      val seed = splitmix64(leagueId.toLong * 1000003 + epochDay * 17 + i)
      val fixtureId = math.abs(seed) % 10_000_000L
      val kickoffMicros =
        (epochDay * 86400L + 43200L + (math.abs(seed) % 28800L)) * 1_000_000L
      InternalRow(
        fixtureId,
        leagueId,
        UTF8String.fromString(java.time.LocalDate.ofEpochDay(epochDay).toString),
        kickoffMicros,
        math.abs(splitmix64(seed)) % 1000L,
        math.abs(splitmix64(seed + 1)) % 1000L,
        UTF8String.fromString(if (math.abs(seed) % 5 == 0) "FT" else "NS"))
    }
  }
}

class RestFixtureTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "rest_fixtures"
  override def schema(): StructType = RestFixtureSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options)
    merged.putAll(o)
    new RestFixtureScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

class RestFixtureScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan with Batch {
  private val leagues: Array[Int] = options
    .getOrDefault("leagues", "39").split(",").map(_.trim.toInt)
  private val days: Int = options.getOrDefault("days", "1").toInt
  private val startDay: Long = java.time.LocalDate
    .parse(options.getOrDefault("startDate", "2024-08-01")).toEpochDay
  // Retry policy (yml:140-145): up to maxRetries re-fetches of a 429'd
  // page with exponential backoff, then SKIP the page and finish the scan
  // — one throttled league must not fail a 1000-partition collection job.
  private val maxRetries: Int = options.getOrDefault("maxRetries", "3").toInt
  private val backoffMs: Long = options.getOrDefault("backoffMs", "0").toLong
  // fault injection for tests: "39@2024-08-01:2" = first 2 attempts for
  // league 39 on that date observe HTTP 429
  private val inject429: Map[(Int, Long), Int] = options
    .getOrDefault("inject429", "").split(",").filter(_.nonEmpty).map { s =>
      val Array(key, n) = s.split(":")
      val Array(league, date) = key.split("@")
      (league.trim.toInt,
        java.time.LocalDate.parse(date.trim).toEpochDay) -> n.trim.toInt
    }.toMap

  override def build(): Scan = this
  override def readSchema(): StructType = RestFixtureSource.schema
  override def toBatch: Batch = this

  override def supportedCustomMetrics(): Array[metric.CustomMetric] =
    Array(new PageRetriesMetric, new SkippedPagesMetric)

  /** Partition planning = the API request list: |leagues| × |dates|. */
  override def planInputPartitions(): Array[InputPartition] =
    (for {
      league <- leagues
      d <- 0 until days
    } yield RestFixturePartition(league, startDay + d): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new RestFixtureReaderFactory(maxRetries, backoffMs, inject429)
}

case class RestFixturePartition(leagueId: Int, epochDay: Long)
    extends InputPartition

/** DSv2 custom metrics: per-task retry/skip counts surface in the SQL UI
  * like any built-in metric (sum across tasks). */
class PageRetriesMetric extends metric.CustomSumMetric {
  override def name(): String = "pageRetries"
  override def description(): String = "REST page fetches retried after 429"
}
class SkippedPagesMetric extends metric.CustomSumMetric {
  override def name(): String = "skippedPages"
  override def description(): String = "REST pages skipped after retry budget"
}

class RestFixtureReaderFactory(maxRetries: Int, backoffMs: Long,
    inject429: Map[(Int, Long), Int]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[RestFixturePartition]
    new PartitionReader[InternalRow] {
      private var taskRetries = 0L
      private var taskSkipped = 0L
      // Retry-then-skip: the page either arrives within the budget or the
      // partition yields ZERO rows and the job proceeds — availability
      // over completeness, exactly the workflow's 429 handling.
      private val rows: Iterator[InternalRow] = {
        val n429 = inject429.getOrElse((part.leagueId, part.epochDay), 0)
        var attempt = 0
        var page: Option[Seq[InternalRow]] = None
        while (page.isEmpty && attempt <= maxRetries) {
          try page = Some(RestFixtureSource.fetchPage(
            part.leagueId, part.epochDay, attempt, n429))
          catch {
            case _: RestFixtureSource.RateLimitedException =>
              attempt += 1
              if (attempt <= maxRetries) {
                taskRetries += 1
                RestFixtureSource.Metrics.retries.incrementAndGet()
                if (backoffMs > 0)
                  Thread.sleep(backoffMs << math.min(attempt - 1, 6))
              }
          }
        }
        if (page.isEmpty) {
          taskSkipped += 1
          RestFixtureSource.Metrics.skippedPages.incrementAndGet()
        }
        page.getOrElse(Seq.empty).iterator
      }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
      override def currentMetricsValues(): Array[metric.CustomTaskMetric] =
        Array(
          new metric.CustomTaskMetric {
            override def name(): String = "pageRetries"
            override def value(): Long = taskRetries
          },
          new metric.CustomTaskMetric {
            override def name(): String = "skippedPages"
            override def value(): Long = taskSkipped
          })
    }
  }
}
