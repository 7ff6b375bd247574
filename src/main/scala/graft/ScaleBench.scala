package graft

import graft.plans.PlanSig

/** SCALE experiment runner (round-11 verdict ask #1): time a named set
  * of queries at one sf dir and print per-query seconds PLUS the plan
  * signature, so sf0.1-vs-sf1 runs can be diffed on both wall-clock
  * ratio and plan-shape equality (a query whose plan flips to a corpus
  * SMJ/BNLJ/Cartesian at 10x failed the scale test even if it finishes).
  *
  * Usage: runMain graft.ScaleBench <sfDir> <queriesCsv|ALL> [reps]
  *
  * Prints one JSON line per query:
  *   {"query":"q_x","sec":N,"rows":N,"sig":"sh=.. bc=.. ..."}
  * and a final {"metric":"scale_total",...} line. Methodology matches
  * graft.Bench: best-of-reps (default 2) within one warmed JVM,
  * clearCache between queries. */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names: Set[String] =
      if (args(1) == "ALL") queries.Registry.all.map(_.name).toSet
      else args(1).split(",").toSet
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = GraftSession.fromEnv()
    val qs = queries.Registry.all.filter(q => names(q.name)).sortBy(_.name)
    val missing = names -- qs.map(_.name)
    require(missing.isEmpty, s"unknown queries: $missing")
    // warm-up: one flagship pass pays the whole-JVM JIT/codegen tax
    try queries.WindowQueries.qFlagship.run(spark, sfDir).count()
    catch { case _: Throwable => () }
    var total = 0.0
    val lines = qs.map { q =>
      val sig =
        try PlanSig.of(
          q.run(spark, sfDir).queryExecution.executedPlan.toString).fmt
        catch { case e: Throwable =>
          // the signature is interpolated into a JSON string literal below;
          // exception messages carry quotes/backslashes/newlines that would
          // corrupt the line and crash tools/scale_report.py — keep only
          // JSON-inert characters
          val msg = String.valueOf(e.getMessage)
            .replaceAll("""[\\"\r\n\t]""", " ").take(200)
          s"PLAN_ERROR: $msg"
        }
      var rows = -1L
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { rows = q.run(spark, sfDir).count() }
        catch { case _: Throwable => rows = -1L }
        (System.nanoTime() - t0) / 1e9
      }
      spark.catalog.clearCache()
      val t = times.min
      total += t
      val line = s"""{"query":"${q.name}","sec":$t,"rows":$rows,"sig":"$sig"}"""
      println(line)
      line
    }
    println(s"""{"metric":"scale_total","value":$total,"unit":"sec","n":${qs.size},"sf":"$sfDir"}""")
    sys.env.get("SPARK_GRAFT_SCALE_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
