package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** STREAMING differential fuzzer — the stream≡batch counterpart of
  * FuzzParitySpec's Spark≡DuckDB sweep.
  *
  * A seeded generator composes random event-time windowed aggregations
  * (tumbling/sliding window × optional keys × 1-3 aggregates × optional
  * pre-filter) and runs each TWICE over the same seeded synthetic event
  * set: once as a batch `groupBy(window(...))`, once through a
  * MemoryStream in chronological micro-batches with a 1-hour watermark
  * and append output, flushed by a far-future sentinel row. Append mode
  * must emit exactly the closed windows with exactly the batch values —
  * any watermark/state/accumulation divergence breaks set equality.
  *
  * Generation discipline (what keeps equality EXPECTED):
  *  - batches are chronological CHUNKS (rows shuffle only within a
  *    chunk, and jitter ≪ watermark), so no row arrives older than the
  *    watermark and nothing is legitimately droppable;
  *  - value aggregates use exact cents (long), never double sums;
  *  - the flush sentinel is a day late and excluded from the batch twin
  *    (its own window never closes, so it never appears on the stream
  *    side either).
  */
class FuzzStreamSpec extends SparkSpec {
  import spark.implicits._

  private val Types = Seq("click", "view", "buy", "share")

  private def genRows(r: java.util.Random, n: Int)
      : Seq[(Long, Timestamp, Long, String, Long)] = {
    val base = Timestamp.valueOf("2024-01-01 08:00:00").getTime
    (1 to n).map { i =>
      val jitter = r.nextInt(120000) // ≤2 min — keeps chunks chronological
      (i.toLong,
        new Timestamp(base + i.toLong * 45000 + jitter),
        1L + r.nextInt(20),
        Types(r.nextInt(Types.size)),
        (1 + r.nextInt(49999)).toLong) // value in cents
    }.sortBy(_._2.getTime)
  }

  test("50-seed stream-vs-batch parity on random windowed aggregations") {
    implicit val sqlCtx = spark.sqlContext
    var checked = 0
    (1L to 50L).foreach { seed =>
      val r = new java.util.Random(seed)
      val rows = genRows(r, 240)
      val durMin = Seq(10, 30, 60)(r.nextInt(3))
      val sliding = r.nextBoolean() && durMin >= 30
      val win =
        if (sliding) window(col("ts"), s"$durMin minutes",
          s"${durMin / 2} minutes")
        else window(col("ts"), s"$durMin minutes")
      val withType = r.nextBoolean()
      val withUserBand = r.nextBoolean()
      val aggChoices = Seq(
        count(lit(1)).as("n"),
        sum(col("value")).as("total"),
        min(col("user_id")).as("min_u"),
        max(col("value")).as("max_v"))
      val nAggs = 1 + r.nextInt(3)
      val picked = r.ints(0, aggChoices.size).distinct().limit(nAggs)
        .toArray.toSeq.map(aggChoices)
      val filtOn = r.nextBoolean()
      val (ft, flo) = (Types(r.nextInt(Types.size)), r.nextInt(20000))
      val desc = s"dur=${durMin}m sliding=$sliding type=$withType " +
        s"band=$withUserBand aggs=${picked.size} filt=$filtOn"
      def shape(df0: DataFrame): DataFrame = {
        val df = if (filtOn)
          df0.filter(col("event_type") =!= ft && col("value") > flo)
        else df0
        val keys = Seq(win.as("w")) ++
          (if (withType) Seq(col("event_type")) else Nil) ++
          (if (withUserBand) Seq((col("user_id") % 5).as("band")) else Nil)
        df.groupBy(keys: _*).agg(picked.head, picked.tail: _*)
          .withColumn("ws", col("w.start").cast("long"))
          .withColumn("we", col("w.end").cast("long"))
          .drop("w")
      }
      // batch side
      val batchDf = rows.toDF("event_id", "ts", "user_id", "event_type",
        "value")
      val expected = shape(batchDf).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
      // stream side: 4 chronological chunks + flush sentinel
      val mem = MemoryStream[(Long, Timestamp, Long, String, Long)]
      val sdf = mem.toDF()
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .withWatermark("ts", "1 hour")
      val qn = s"fuzz_stream_$seed"
      val q = shape(sdf)
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        val chunks = rows.grouped((rows.size + 3) / 4).toSeq
        chunks.zipWithIndex.foreach { case (c, ci) =>
          // shuffle WITHIN the chunk — disorder the watermark tolerates
          val r3 = new java.util.Random(seed * 7 + ci)
          mem.addData(scala.util.Random
            .javaRandomToRandom(r3).shuffle(c): _*)
          q.processAllAvailable()
        }
        // two flush batches: the watermark computed FROM sentinel 1 is
        // applied (and state emitted) while PROCESSING sentinel 2 — a
        // single far-future batch only schedules the advance. Sentinels
        // must SURVIVE any generated filter (the filter is pushed below
        // the watermark node, so a filtered-out sentinel advances
        // nothing): out-of-grammar event_type + above-any-band value.
        mem.addData((9999L, Timestamp.valueOf("2024-01-03 00:00:00"),
          1L, "zz_flush", 999999L))
        q.processAllAvailable()
        mem.addData((10000L, Timestamp.valueOf("2024-01-04 00:00:00"),
          1L, "zz_flush", 999999L))
        q.processAllAvailable()
        // drop the flush sentinels' own (far-future) windows — the real
        // data ends Jan 1; anything past Jan 2 is flush plumbing
        val got = spark.table(qn)
          .filter(col("we") < 1704150000L).collect()
          .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
        assert(got === expected,
          s"seed=$seed shape($desc): stream != batch")
        checked += 1
      } finally q.stop()
    }
    assert(checked === 50)
  }
}
