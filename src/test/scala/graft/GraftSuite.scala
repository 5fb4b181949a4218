package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM per `sbt test` run;
  * getOrCreate dedups across suites). */
trait GraftSuite extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.codegen.maxFields", "256")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val SfDir = "/root/testdata/sf0.001"

  override protected def afterAll(): Unit = {
    // Session is shared across suites — do not stop it here.
    super.afterAll()
  }
}
