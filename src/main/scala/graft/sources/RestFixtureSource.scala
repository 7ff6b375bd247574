package graft.sources

import java.util
import graft.functions.MinHashSignature.splitmix64
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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

  /** ==== the REST seam ====
    * Deterministic synthetic page for (league, date); a production build
    * replaces the body with the HTTP GET + JSON decode of
    * `/fixtures?league=...&date=...`. Signature and row shape unchanged. */
  def fetchPage(leagueId: Int, epochDay: Long): Seq[InternalRow] = {
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

  override def build(): Scan = this
  override def readSchema(): StructType = RestFixtureSource.schema
  override def toBatch: Batch = this

  /** Partition planning = the API request list: |leagues| × |dates|. */
  override def planInputPartitions(): Array[InputPartition] =
    (for {
      league <- leagues
      d <- 0 until days
    } yield RestFixturePartition(league, startDay + d): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new RestFixtureReaderFactory
}

case class RestFixturePartition(leagueId: Int, epochDay: Long)
    extends InputPartition

class RestFixtureReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[RestFixturePartition]
    new PartitionReader[InternalRow] {
      private val rows =
        RestFixtureSource.fetchPage(part.leagueId, part.epochDay).iterator
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
