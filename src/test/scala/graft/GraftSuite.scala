package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM per `sbt test` run;
  * getOrCreate dedups across suites). */
trait GraftSuite extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("4")

  val SfDir = "/root/testdata/sf0.001"

  override protected def afterAll(): Unit = {
    // Session is shared across suites — do not stop it here.
    super.afterAll()
  }
}
