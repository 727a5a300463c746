package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for the suite (one JVM per `sbt test` run;
  * session config mirrors Verify/Bench bootstrap).
  */
object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session

  /** Smallest driver-generated fixture — fast enough for unit tests. */
  val sfDir = "/root/testdata/sf0.001"

  /** Write a table into a temp dir laid out like a scale-factor dir, so
    * `(spark, dir)` operators run on injected fixtures.
    */
  def tempTableDir(name: String, df: DataFrame): String = {
    val dir = Files.createTempDirectory("graft-spec").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    dir
  }

  def checkScalaCheck(prop: org.scalacheck.Prop, minTests: Int = 20): Unit = {
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(minTests)
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }
}
