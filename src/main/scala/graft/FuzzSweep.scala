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
  * Usage: runMain graft.FuzzSweep <sfDir> <fromSeed> <toSeedExcl>
  */
object FuzzSweep {
  def main(args: Array[String]): Unit = {
    val (sfDir, from, to) = (args(0), args(1).toLong, args(2).toLong)
    val spark = GraftSession.fromEnv()
    for (t <- Seq("lineitem", "orders", "customer", "part", "supplier",
        "nation"))
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    var bad = 0
    for (seed <- from until to) {
      val fc = Fuzz.gen(seed)
      val viaDf = fc.build(spark, sfDir).collect().map(_.toString).toSeq
      val viaSql = spark.sql(fc.sql).collect().map(_.toString).toSeq
      if (viaDf != viaSql) {
        bad += 1
        println(s"FUZZ_DIVERGED seed=$seed shape=${fc.shape}")
        println(fc.sql)
        println(s"df=${viaDf.size} sql=${viaSql.size} first diff: " +
          viaDf.zipAll(viaSql, "<missing>", "<missing>")
            .find(p => p._1 != p._2))
      }
      if ((seed - from) % 100 == 99)
        println(s"FUZZ_PROGRESS ${seed + 1 - from}/${to - from} " +
          s"diverged=$bad")
    }
    println(s"FUZZ_SWEEP_DONE range=[$from,$to) diverged=$bad")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
