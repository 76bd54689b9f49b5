package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs. One session per test JVM
  * (`Test / fork := true`), built with the same configuration as
  * Bench/Verify ([[Tables.sessionBuilder]]) so test behavior matches the
  * driver's runs (UTC, NTZ parquet timestamps, nanosAsLong, AQE).
  */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpecBase.session
  /** Smallest driver-generated scale factor — fast enough for unit tests. */
  val Sf = "/root/testdata/sf0.001"

  /** Absolute path of a test fixture under src/test/resources. */
  def fixture(path: String): String = {
    val url = getClass.getResource(path)
    require(url != null, s"missing test fixture $path")
    url.getPath
  }
}

object SparkSpecBase {
  lazy val session: SparkSession = {
    val s = Tables.sessionBuilder("local[4]", "4")
      // managed-table tests (bucketing) need a throwaway warehouse;
      // static conf, so it must be set at build time
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
