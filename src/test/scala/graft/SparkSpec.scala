package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one per suite JVM fork). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSession.build("local[4]", "4")
  val sfDir = "/root/testdata/sf0.001"
  override def afterAll(): Unit = { spark.stop(); super.afterAll() }
}
