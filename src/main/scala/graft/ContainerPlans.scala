package graft

import org.apache.spark.sql.functions._

/** Container plan matrix (PLANS.md addendum generator): writes the events
  * warehouse (date-partitioned, sortWithinPartitions on user_id) in each
  * supported container and dumps the scan-node signature of the
  * q_time_range-shaped read — whether partition pruning fired
  * (PartitionFilters), whether the value predicate reached the container
  * (PushedFilters), and the pruned read schema. A container regression
  * (e.g. ORC losing stats pushdown after a version bump) shows up as a
  * diff against the committed PLANS.md section.
  *
  * Usage: runMain graft.ContainerPlans <sfDir>
  */
object ContainerPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.fromEnv()
    val ev = Tables.events(spark, sfDir)
    for (fmt <- Seq("parquet", "orc", "csv")) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_cp_$fmt").toString
      if (fmt == "csv") {
        // CSV is the interchange sink (S5), not a warehouse container —
        // same partitioned layout, written directly (writeWarehouse
        // restricts itself to the columnar formats on purpose)
        ev.withColumn("__p_date", to_date(col("ts")))
          .repartition(col("__p_date"))
          .sortWithinPartitions(col("user_id"))
          .write.mode("overwrite").partitionBy("__p_date")
          .option("header", "true").csv(dir)
      } else {
        graft.sources.Sources.writeWarehouse(
          ev, dir, "ts", Seq("user_id"), fmt)
      }
      val reader = spark.read.format(fmt)
      val df = (if (fmt == "csv")
          reader.option("header", "true").option("inferSchema", "true")
        else reader).load(dir)
      val q = df.filter(col("__p_date") ===
          lit(java.sql.Date.valueOf("2024-01-10")) &&
          col("user_id") === 42L)
        .select("event_id", "user_id")
      val plan = q.queryExecution.executedPlan.toString
      val scan = plan.linesIterator
        .find(_.contains("PartitionFilters")).getOrElse("<no scan node>")
      def field(name: String): String = {
        val i = scan.indexOf(name + ": [")
        if (i < 0) "<absent>"
        else scan.substring(i + name.length + 2,
          scan.indexOf("]", i) + 1)
      }
      def has(name: String): String =
        if (field(name) == "<absent>") "absent"
        else if (field(name) == "[]") "EMPTY" else "yes"
      val readSchema = {
        val i = scan.indexOf("ReadSchema: ")
        if (i < 0) "<absent>" else scan.substring(i + 12).trim
      }
      println(s"CONTAINER $fmt: partition_pruning=${has("PartitionFilters")} " +
        s"pushed=${field("PushedFilters")} read=$readSchema")
    }
    spark.stop()
  }
}
