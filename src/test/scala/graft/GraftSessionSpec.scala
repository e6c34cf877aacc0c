package graft

import org.scalatest.funsuite.AnyFunSuite

/** Conf-policy unit tests (no SparkSession creation: getOrCreate on a JVM
  * with a live session would silently ignore new conf, so the policy is
  * asserted on the map/builder level). */
class GraftSessionSpec extends AnyFunSuite {

  test("scaleConf encodes the AQE + partition-sizing policy") {
    val c = GraftSession.scaleConf(800)  // e.g. 100 executors x 8 cores
    assert(c("spark.sql.adaptive.enabled") === "true")
    assert(c("spark.sql.adaptive.coalescePartitions.enabled") === "true")
    assert(c("spark.sql.adaptive.skewJoin.enabled") === "true")
    assert(c("spark.sql.shuffle.partitions") === "1600", "2x total cores pre-AQE")
    assert(c("spark.sql.files.maxPartitionBytes").toLong === 128L * 1024 * 1024)
    assert(c("spark.sql.autoBroadcastJoinThreshold").toLong === 32L * 1024 * 1024)
  }

  test("explicit shufflePartitions overrides the 2x default (local pinning)") {
    val c = GraftSession.scaleConf(32, shufflePartitions = 32)
    assert(c("spark.sql.shuffle.partitions") === "32")
    assert(GraftSession.scaleConf(0)("spark.sql.shuffle.partitions") === "1",
      "degenerate core counts clamp to 1, never 0")
  }
}
