package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for Spark-level specs (small worker count:
  * these test semantics, not throughput). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSession.local("2")
  override def afterAll(): Unit = { /* shared across suites; leave running */ }
}
