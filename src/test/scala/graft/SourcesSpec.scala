package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._

/** S7 (webhook side-output) and S8 (DDL/catalog bootstrap) coverage. */
object RecordingSender {
  // executor-side sender: local-mode executors share the JVM, so a static
  // concurrent buffer observes the per-partition delivery
  val sent = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("S7: foreachWebhook delivers every row executor-side, no collect") {
    RecordingSender.sent.clear()
    val df = Seq((1L, "odds moved 12%"), (2L, "odds moved -8%"), (3L, "kickoff"))
      .toDF("fixture_id", "message").repartition(3)
    Sources.foreachWebhook(df, s => RecordingSender.sent.add(s))
    val got = RecordingSender.sent.toArray(Array.empty[String]).toSeq
    assert(got.size === 3)
    // payloads are the rows' JSON docs (order is partition-dependent)
    val fixtures = got.map(j =>
      "\"fixture_id\":(\\d+)".r.findFirstMatchIn(j).get.group(1).toLong).sorted
    assert(fixtures === Seq(1L, 2L, 3L))
    assert(got.forall(_.contains("\"message\"")))
  }

  test("S5: JDBC sink/scan round-trip against embedded Derby") {
    // Derby ships with the Spark distribution (Hive metastore dependency)
    // — an in-process engine standing in for the reference's SQLite
    // default (database_integration.py:35-73). No network, real JDBC.
    val dbDir = java.nio.file.Files.createTempDirectory("graft_derby")
    val url = s"jdbc:derby:$dbDir/wh;create=true"
    val driver = "org.apache.derby.jdbc.EmbeddedDriver"
    val mappings = Seq(
      (1L, "Man United", "Manchester United", 0.95),
      (2L, "Spurs", "Tottenham Hotspur", 0.90),
      (3L, "Wolves", "Wolverhampton Wanderers", 0.88))
      .toDF("id", "raw_name", "resolved_name", "confidence")
    Sources.writeJdbc(mappings, url, "team_mappings", driver,
      mode = org.apache.spark.sql.SaveMode.Overwrite)
    // append path: second write lands alongside the first
    Sources.writeJdbc(mappings.filter($"id" === 1L), url,
      "team_mappings", driver)
    val back = Sources.readJdbc(spark, url, "team_mappings", driver)
    assert(back.count() === 4)
    assert(back.schema.fieldNames.sorted ===
      Array("confidence", "id", "raw_name", "resolved_name"))
    val byId = back.as[(Long, String, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.length).toMap
    assert(byId === Map(1L -> 2, 2L -> 1, 3L -> 1))
    // parallel range-scan contract plans one partition per id range
    val ranged = Sources.readJdbc(spark, url, "team_mappings", driver,
      partitionCol = Some("id"), lower = 1L, upper = 4L, numPartitions = 2)
    assert(ranged.rdd.getNumPartitions === 2)
    assert(ranged.count() === 4)
  }

  test("S8: every declared table schema round-trips through catalog DDL") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ddl").toString
    Tables.schemas.foreach { case (name, schema) =>
      // DDL text round trip (what a CREATE TABLE statement carries)
      val fromDdl = org.apache.spark.sql.types.StructType.fromDDL(schema.toDDL)
      assert(fromDdl === schema, s"DDL round trip drifted for $name")
      // catalog round trip: create an external parquet table from the DDL,
      // read the schema back from the catalog
      val tbl = s"graft_ddl_$name"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(
        s"CREATE TABLE $tbl (${schema.toDDL}) USING parquet LOCATION '$wh/$name'")
      val back = spark.table(tbl).schema
      assert(back.fields.map(f => (f.name, f.dataType)).toSeq ===
        schema.fields.map(f => (f.name, f.dataType)).toSeq,
        s"catalog schema drifted for $name")
      spark.sql(s"DROP TABLE $tbl")
    }
  }

  test("S8: catalog table created from declared schema reads testdata") {
    val tbl = "graft_ddl_read_check"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (${Tables.regionSchema.toDDL}) " +
      s"USING parquet LOCATION '$sfDir/region.parquet'")
    assert(spark.table(tbl).count() === 5)
    assert(spark.table(tbl).select("r_name").as[String].collect().nonEmpty)
    spark.sql(s"DROP TABLE $tbl")
  }

  test("S3-ext: CSV round-trip with declared schema; corrupt line quarantined") {
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("csv").toString
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", 3.5))
      .toDF("id", "name", "v")
    Sources.writeCsv(df, tmp)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("v", DoubleType)))
    val back = Sources.readCsv(spark, tmp, schema)
    assert(back.schema === schema) // declared, never inferred
    assert(back.as[(Long, String, Double)].collect().toSet ===
      Set((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", 3.5)))
    // corrupt line: PERMISSIVE nulls the bad field and captures the raw
    val dirty = java.nio.file.Files.createTempDirectory("csvd").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dirty, "part.csv"),
      "id,name,v\n7,ok,1.0\n8,bad,NOT_A_NUMBER\n")
    val qSchema = schema.add(StructField("_corrupt", StringType))
    val rows = Sources.readCsv(spark, dirty, qSchema)
      .select(col("id"), col("v"), col("_corrupt").isNotNull.as("bad"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getBoolean(2))))
      .toMap
    assert(rows(7L) === ((Some(1.0), false)))
    assert(rows(8L) === ((None, true))) // quarantined, job completed
  }
}
