package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** N1 — `store_fixture_data` orchestrator (database_integration.py:75-119):
  * one collected payload fans out into the warehouse tables. The reference
  * loops table-by-table over a dict; here the parsed payload frame is
  * cache()d once and each table is an independent derived write — on a
  * cluster the 4 writes share the single parsed/cached scan instead of
  * re-reading (and re-parsing JSON) 4 times.
  */
object FixtureStore {

  /** Derived table frames from one payload frame (columns: fixture_id,
    * collected_at ts, collection_phase, event = odds event struct,
    * lineup rows / stats / h2h optional by caller). Returns the map of
    * table name → frame; caller writes via [[graft.sources.Sources]]. */
  def derive(payloads: DataFrame): Map[String, DataFrame] = {
    val cached = payloads.cache()
    val odds = OddsPipeline.flattenOdds(cached)
    val games = cached.select(
      col("fixture_id"),
      col("event.home_team").as("home_team"),
      col("event.away_team").as("away_team"),
      col("collected_at"))
      .dropDuplicates("fixture_id")
    Map(
      "odds_history" -> odds,
      "fixtures" -> games,
      // per-fixture latest snapshot (the upsert view of the fact)
      "odds_latest" -> Windows.latestPerGroup(odds,
        Seq("fixture_id", "bookmaker", "market_type"),
        "collected_at", "collection_phase"))
  }

  /** ST8 — partitions strictly OLDER than the cutoff (the expired set a
    * retention sweep should delete). Date-partitioned warehouse retention
    * is O(partitions), not O(rows) — no row-level deletes at 100 TB. */
  def expiredPartitions(warehousePath: String,
      cutoff: java.time.LocalDate): Seq[String] = {
    val dir = new java.io.File(warehousePath)
    val parts = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("__p_date="))
    parts.map(_.getName.stripPrefix("__p_date="))
      .filter(d => java.time.LocalDate.parse(d).isBefore(cutoff))
      .toSeq
  }

  /** Drop expired date partitions (directory-level delete — the VACUUM
    * analogue, football-data-pipeline.yml:661-680). */
  def dropExpiredPartitions(warehousePath: String,
      cutoff: java.time.LocalDate): Seq[String] = {
    val expired = expiredPartitions(warehousePath, cutoff)
    expired.foreach { d =>
      val dir = new java.io.File(s"$warehousePath/__p_date=$d")
      dir.listFiles().foreach(_.delete())
      dir.delete()
    }
    expired
  }
}
