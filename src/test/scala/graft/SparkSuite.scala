package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one per JVM, reused via
  * getOrCreate). */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      // local[4,2] = task-failure tolerance 2, so RetryDeterminismSpec can
      // inject a REAL task failure and assert the retried output is
      // byte-identical (the plain local master fails the whole job on the
      // first task failure — production clusters never do). Suites that
      // assert exceptions still see them: the job still fails after the
      // retries, it just takes one extra attempt.
      .master("local[4,2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark

  def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString
  }

  def sf(path: String = "sf0.001"): String = s"/root/testdata/$path"

  def table(name: String, dir: String = sf()): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
