package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide session; suites run in
  * one forked JVM under sbt).
  */
object SparkSpec {
  lazy val spark: SparkSession = GraftSession.builder("4").getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  def resource(name: String): String =
    getClass.getResource("/" + name).getPath
  val sfTiny = "/root/testdata/sf0.001"
}
