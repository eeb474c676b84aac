package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (getOrCreate → one session per forked
  * test JVM, mirroring how the reference's pytest suite shares nothing but
  * pure functions — our pure functions just happen to need a SparkSession).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local("4")
}
