package graft.sources

import graft.operators.OddsPipeline
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sources & sinks (SURVEY.md §2.1).
  *
  * Never `inferSchema`: every reader takes the declared StructType, so a
  * malformed feed surfaces as `_corrupt_record` rows (PERMISSIVE mode — the
  * reference accesses raw JSON optimistically with `.get()` defaults, which
  * is exactly PERMISSIVE semantics) instead of a wrong inferred schema that
  * rescans 100 TB.
  */
object Sources {

  /** Job-queue document schema (`jobs.json`, FIXTURES.md §3). */
  val jobSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("fixture_id", LongType),
    StructField("scheduled_for", StringType),
    StructField("status", StringType),
    StructField("type", StringType),
    StructField("priority", StringType),
    StructField("created_at", StringType),
    StructField("processed_at", StringType),
    StructField("error_reason", StringType)))

  /** S3 — read a `jobs.json`-style array document (multiLine) or JSONL dir.
    * ISO-8601 strings parsed to timestamps here, once, at the edge. */
  def readJobs(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(jobSchema)
      .option("multiLine", true)
      .option("mode", "PERMISSIVE")
      .json(path)
      .withColumn("scheduled_for", to_timestamp(col("scheduled_for")))
      .withColumn("created_at", to_timestamp(col("created_at")))

  /** S3-ext — CSV table source with a DECLARED schema (the engine never
    * inferSchema's: inference costs an extra full scan and silently
    * drifts types — the SURVEY §1.3 rule the parquet loaders follow).
    * PERMISSIVE mode nulls malformed fields instead of failing the job;
    * a `_corrupt` column captures the raw line for quarantine when the
    * caller includes it in the schema. */
  def readCsv(spark: SparkSession, path: String,
      schema: StructType, header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)

  /** CSV export twin of [[readCsv]] — interop sink for downstream
    * non-columnar consumers (the reference emits CSV report tables);
    * columnar analytics stay on [[writeWarehouse]]. */
  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", header.toString)
      .csv(path)

  /** Raw collection-payload envelope (FIXTURES.md §2 top level), with the
    * odds event under `data`. */
  val payloadSchema: StructType = StructType(Seq(
    StructField("fixture_id", LongType),
    StructField("collection_type", StringType),
    StructField("collected_at", StringType),
    StructField("game_info", StructType(Seq(
      StructField("fixture_id", LongType),
      StructField("kickoff_utc", StringType),
      StructField("home_team", StringType),
      StructField("away_team", StringType),
      StructField("home_team_id", LongType),
      StructField("away_team_id", LongType),
      StructField("league", StringType),
      StructField("league_id", LongType),
      StructField("country", StringType),
      StructField("venue", StringType),
      StructField("priority", StringType)))),
    StructField("data", StructType(Seq(
      StructField("odds_early", OddsPipeline.oddsEventSchema),
      StructField("odds_team_news", OddsPipeline.oddsEventSchema),
      StructField("odds_final", OddsPipeline.oddsEventSchema))))))

  /** S1/S4 — read raw payload JSON files (one document per file, as the
    * workflow writes them). */
  def readPayloads(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(payloadSchema)
      .option("multiLine", true)
      .option("mode", "PERMISSIVE")
      .json(path)

  /** S4 — JSONL sink for derived datasets (scalable path: one file per
    * partition, no driver collect). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** S4 — single-document report sink (dashboard_data.json shape): the
    * reference's reports are small driver-side JSON documents; `limit`
    * guards against misuse on a big frame. */
  def writeReportDoc(df: DataFrame, path: String, maxRows: Int = 10000): Unit = {
    val rows = df.limit(maxRows).toJSON.collect()
    val json = rows.mkString("[", ",", "]")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
  }

  /** S5/S8 — warehouse table sink: date-partitioned columnar files (the
    * engine's answer to the reference's SQLite tables + indexes —
    * partition pruning replaces the time index, sort-within-partitions
    * the key index). `format` selects the columnar container: parquet
    * (default) or orc — both carry column stats + predicate pushdown,
    * so the physical-design story is identical; orc is the
    * Hive-ecosystem interop path. */
  def writeWarehouse(df: DataFrame, path: String, dateCol: String,
      sortCols: Seq[String], format: String = "parquet"): Unit = {
    require(Set("parquet", "orc")(format), s"unsupported format $format")
    df.withColumn("__p_date", to_date(col(dateCol)))
      .repartition(col("__p_date"))
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Append)
      .partitionBy("__p_date")
      .format(format)
      .save(path)
  }

  /** S5-ext — warehouse COMPACTION: rewrite a date-partitioned warehouse so
    * every partition holds `filesPerPartition` files (default 1). Streaming
    * ingest appends a file per micro-batch per partition — the classic
    * small-files accumulation that kills scan throughput and driver
    * file-listing at 100 TB; periodic compaction is the standard remedy.
    * One distributed job: repartition on (partition date, bounded salt) so
    * each output partition dir is written by exactly `filesPerPartition`
    * tasks, sorted within files; the rewrite lands in a temp dir first and
    * swaps in per partition with a RENAME-ASIDE protocol: live dir →
    * `<tmp>/<partition>.bak`, tmp dir → live, then the .bak is dropped
    * with the tmp root at the end. The old data is never deleted before
    * the new dir is live, so a crash loses nothing: either the old dir is
    * still live, or the new dir is live, or (inside the two-rename window
    * of one partition) the old dir sits intact at the well-known .bak path
    * and a re-run restores it FIRST — orphaned .baks are renamed back to
    * the live table before the Overwrite write can touch the tmp root.
    * The .bak lives OUTSIDE the table path so a concurrent reader can
    * never partition-parse it. */
  def compactWarehouse(spark: SparkSession, path: String,
      sortCols: Seq[String], filesPerPartition: Int = 1): Unit = {
    require(filesPerPartition >= 1)
    val tmp = path.stripSuffix("/") + ".compact.tmp"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val tmpRoot = new org.apache.hadoop.fs.Path(tmp)
    // CRASH RECOVERY — must run BEFORE the Overwrite write below: a crash
    // inside a prior run's two-rename window leaves the ONLY copy of a
    // partition at <tmp>/<partition>.bak, and Overwrite deletes the tmp
    // root. Restore any orphaned .bak whose live dir is absent; a .bak
    // whose live dir exists is from after the second rename (the new data
    // is already live) and is dropped with the tmp root as usual.
    if (fs.exists(tmpRoot)) {
      fs.listStatus(tmpRoot)
        .filter(s => s.isDirectory && s.getPath.getName.endsWith(".bak"))
        .foreach { s =>
          val live = new org.apache.hadoop.fs.Path(
            dst, s.getPath.getName.stripSuffix(".bak"))
          if (!fs.exists(live))
            require(fs.rename(s.getPath, live),
              s"compactWarehouse recovery: rename ${s.getPath} -> $live failed")
        }
    }
    // read AFTER recovery so restored partitions are part of the rewrite
    val df = spark.read.parquet(path)
    val salt = if (sortCols.nonEmpty)
      pmod(xxhash64(sortCols.map(col): _*), lit(filesPerPartition))
    else lit(0)
    df.repartition(col("__p_date"), salt)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("__p_date")
      .parquet(tmp)
    // per-partition rename-aside swap (see scaladoc): old → .bak (under
    // tmp, outside the table path), new → live; .baks die with the tmp
    // root. HDFS/posix rename reports failure by returning false, not by
    // throwing — every rename is checked, and a failed live-install is
    // rolled back (.bak → live) so the partition is never left absent.
    fs.listStatus(tmpRoot)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("__p_date="))
      .foreach { s =>
        val target = new org.apache.hadoop.fs.Path(dst, s.getPath.getName)
        val bak = new org.apache.hadoop.fs.Path(
          tmpRoot, s.getPath.getName + ".bak")
        if (fs.exists(target))
          require(fs.rename(target, bak),
            s"compactWarehouse: rename-aside $target -> $bak failed")
        if (!fs.rename(s.getPath, target)) {
          val rolledBack = !fs.exists(bak) || fs.rename(bak, target)
          throw new java.io.IOException(
            s"compactWarehouse: install ${s.getPath} -> $target failed" +
              (if (rolledBack) " (old data rolled back to live)"
               else s" AND rollback failed — old data is at $bak"))
        }
      }
    fs.delete(tmpRoot, true)
  }

  /** S5 — relational warehouse sink over JDBC: the reference's
    * dual-backend table write (SQLite or Postgres behind one code path —
    * database_integration.py:35-73) expressed as Spark's JDBC writer.
    * Executors write partitions concurrently with batched inserts
    * (`batchsize`); there is no driver collect, so the path scales with
    * the cluster, bounded only by what the target DB can absorb —
    * `numPartitions` caps the connection count so a 1000-task stage
    * cannot open 1000 connections against one database (coalesce happens
    * inside the writer, not a full shuffle). Tested against embedded
    * Derby (SourcesSpec round-trip; same class of in-process engine as
    * the reference's SQLite default). */
  def writeJdbc(df: DataFrame, url: String, table: String,
      driver: String, mode: SaveMode = SaveMode.Append,
      batchSize: Int = 1000, numPartitions: Int = 8): Unit =
    df.write.mode(mode)
      .option("driver", driver)
      .option("batchsize", batchSize)
      .option("numPartitions", numPartitions)
      .jdbc(url, table, new java.util.Properties())

  /** S6-ext — JDBC table scan (the read half of the dual-backend path).
    * Single-partition by default — correct for the reference's small
    * operational tables; pass `partitionCol`+bounds to fan a big table
    * out over `numPartitions` parallel range scans (the standard Spark
    * JDBC parallel-read contract). */
  def readJdbc(spark: SparkSession, url: String, table: String,
      driver: String, partitionCol: Option[String] = None,
      lower: Long = 0L, upper: Long = 0L, numPartitions: Int = 8): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("driver", driver)
      .option("url", url)
      .option("dbtable", table)
    partitionCol.fold(base) { c =>
      base.option("partitionColumn", c)
        .option("lowerBound", lower)
        .option("upperBound", upper)
        .option("numPartitions", numPartitions)
    }.load()
  }

  /** S7 — webhook-style side-output sink: per-partition delivery through a
    * caller-supplied sender (Discord POST in the reference; a buffering
    * sender in tests — no network in the engine itself). Executor-side,
    * no driver collect. */
  def foreachWebhook(df: DataFrame, sender: String => Unit): Unit =
    df.toJSON.foreachPartition { it: Iterator[String] => it.foreach(sender) }

  /** S5-ext — BUCKETED table sink: hash-bucketed, bucket-sorted parquet
    * registered in the session catalog. Pay the shuffle ONCE at write;
    * every later equi-join or aggregation on `keyCols` between tables
    * bucketed the same way plans with ZERO Exchange (the bucketed scan
    * already satisfies the required hash distribution — spec-pinned,
    * BucketedTableSpec). At 100 TB this is the difference between
    * re-shuffling the fact table on every join of a recurring pipeline
    * and never shuffling it again; `numBuckets` is sized so a bucket
    * (table size / buckets) fits an executor's task comfortably.
    * `path` makes it an external table — data outlives the catalog and
    * is re-registered cheaply. */
  def writeBucketedTable(df: DataFrame, table: String, path: String,
      numBuckets: Int, keyCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty, "bucketing needs at least one key column")
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(numBuckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }
}
