package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory — every entry point (Verify, Bench, tests)
  * goes through here so engine-critical configs can't drift.
  *
  * Config rationale (SURVEY.md §4):
  *  - session TZ pinned UTC: reference stores/parses all times UTC
  *    (.github/workflows/football-data-pipeline.yml:154).
  *  - shuffle.partitions = core count locally; on a real cluster this is
  *    sized to data volume and AQE coalesces.
  *  - AQE on: runtime skew-join splitting + shuffle coalescing are part of
  *    the 100 TB design, not an afterthought.
  *  - nanosAsLong: lets [[Tables.load]] read TIMESTAMP(NANOS) events data
  *    as raw INT64 when the footer says so. The CURRENT testdata is
  *    TIMESTAMP(MICROS) and takes the direct TimestampType path; this
  *    config is harmless for micros data and keeps the nanos branch
  *    reachable ([[Tables.eventsRawSchema]]).
  */
object GraftSession {
  def build(master: String, shufflePartitions: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Python-dict semantics for map_from_entries with duplicate keys
      // (reference pivots outcomes via dict comprehension — last wins,
      // database_integration.py:194)
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Build from the driver's env contract (SPARK_GRAFT_CPUS). */
  def fromEnv(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    build(s"local[$cpus]", cpus)
  }
}
