package graft

/** Scratch probe main for local iteration (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[8]", "8")
    val d = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, d)
    ev.printSchema()
    ev.show(3, false)
    val li = Tables.lineitem(spark, d)
    li.show(2, false)
    spark.stop()
  }
}
