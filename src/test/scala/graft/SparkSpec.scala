package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession fixture for all suites.
  *
  * One session per JVM (sbt forks a single test JVM): `Engine.session`
  * is `getOrCreate`, so suites share the session and never pay repeated
  * startup. Small core count keeps tiny-DataFrame tests fast (32 shuffle
  * partitions over 10-row inputs would be all overhead).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = Engine.session(cores = 4)

  /** sf0.001 testdata dir for specs that want real harness tables. */
  val sfDir = "/root/testdata/sf0.001"
}
