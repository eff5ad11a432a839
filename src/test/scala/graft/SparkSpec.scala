package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession fixture. One session per suite (getOrCreate
  * reuses the JVM-wide session, so the whole `sbt test` run pays one
  * startup); small core/partition counts keep tiny-frame tests fast.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("graft-test", cpus = "4").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(s)
    s
  }

  /** sf0.001 testdata — tiny, used for end-to-end operator checks. */
  val sfDir = "/root/testdata/sf0.001"
}
