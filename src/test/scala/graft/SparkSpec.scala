package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base: one classic local session for the whole JVM. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("graft-test", "4")
  val sf: String = "/root/testdata/sf0.001"
}
