package graft

import graft.queries.Fuzz

/** Extended differential-fuzz sweep — the exploration companion to
  * FuzzParitySpec's deterministic 0..199 window: run the cross-renderer
  * check (DataFrame build vs `spark.sql` of the shared text) over an
  * ARBITRARY seed range, printing any divergence with its SQL so the
  * seed can be promoted into [[Fuzz.pinnedSeeds]] as a named regression
  * gate. Keeping exploration out of `sbt test` keeps the committed
  * suite deterministic while letting a session burn idle cycles
  * widening coverage.
  *
  * Usage: runMain graft.FuzzSweep <sfDir> <fromSeed> <toSeedExcl> [dumpDir]
  *
  * With `dumpDir`, each seed's DataFrame-build result is ALSO written in
  * the Verify layout (dumpDir/fz<seed>/ parquet + oracle_sql.json of the
  * shared SQL), so `tools/compare.py dumpDir sfDir` runs the full
  * cross-ENGINE (DuckDB) differential over the swept range — the same
  * gate the driver applies to the pinned seeds, at exploration scale.
  */
object FuzzSweep {
  def main(args: Array[String]): Unit = {
    val (sfDir, from, to) = (args(0), args(1).toLong, args(2).toLong)
    val dumpDir = args.lift(3)
    val spark = GraftSession.fromEnv()
    for (t <- Seq("lineitem", "orders", "customer", "part", "supplier",
        "nation", "events")) // events: grammar v13's time-series table
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    dumpDir.foreach(d => new java.io.File(d).mkdirs())
    val oracle = scala.collection.mutable.LinkedHashMap[String, String]()
    var bad = 0
    for (seed <- from until to) {
      val fc = Fuzz.gen(seed)
      val df = fc.build(spark, sfDir)
      val viaDf = df.collect().map(_.toString).toSeq
      val viaSql = spark.sql(fc.sql).collect().map(_.toString).toSeq
      if (viaDf != viaSql) {
        bad += 1
        println(s"FUZZ_DIVERGED seed=$seed shape=${fc.shape}")
        println(fc.sql)
        println(s"df=${viaDf.size} sql=${viaSql.size} first diff: " +
          viaDf.zipAll(viaSql, "<missing>", "<missing>")
            .find(p => p._1 != p._2))
      }
      dumpDir.foreach { d =>
        df.coalesce(1).write.mode("overwrite").parquet(s"$d/fz$seed")
        oracle(s"fz$seed") = fc.sql
      }
      if ((seed - from) % 100 == 99)
        println(s"FUZZ_PROGRESS ${seed + 1 - from}/${to - from} " +
          s"diverged=$bad")
    }
    dumpDir.foreach { d =>
      def q(s: String): String = "\"" + s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c    => c.toString
      } + "\""
      val json = oracle.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ", ", "}")
      java.nio.file.Files.write(java.nio.file.Paths.get(d, "oracle_sql.json"),
        json.getBytes("UTF-8"))
    }
    println(s"FUZZ_SWEEP_DONE range=[$from,$to) diverged=$bad")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
