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
}
