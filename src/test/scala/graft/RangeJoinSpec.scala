package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Bucketized point-in-interval join: exact equivalence with the naive
  * cross-join formulation (any bucket width), boundary inclusivity,
  * negative-domain floor division, overlap multi-match, the degenerate-
  * interval fail-fast, and the no-cartesian plan shape. */
class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  private def naive(points: org.apache.spark.sql.DataFrame,
                    intervals: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    points.crossJoin(intervals)
      .where($"p" >= $"lo" && $"p" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet

  test("equals the cross-join reference for every bucket width, signs included") {
    val rnd = new scala.util.Random(7)
    val points = (0L until 300L).map(i => (i, rnd.nextInt(2000) - 1000L))
      .toDF("pid", "p")
    val intervals = (0L until 40L).map { i =>
      val lo = rnd.nextInt(2000) - 1000L
      (i, lo, lo + rnd.nextInt(300))
    }.toDF("iid", "lo", "hi")
    val want = naive(points, intervals)
    assert(want.nonEmpty)
    Seq(1L, 7L, 64L, 1000L, 100000L).foreach { w =>
      val got = RangeJoin.pointInterval(points, intervals, "p", "lo", "hi", w)
        .select($"pid", $"iid").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size,
        s"w=$w: a pair must meet in exactly one bucket (no dup rows)")
      assert(got.toSet === want, s"bucket width $w changed the result")
    }
  }

  test("bounds are inclusive on both ends; overlapping intervals multi-match") {
    val points = Seq((1L, 10L), (2L, 20L), (3L, 15L)).toDF("pid", "p")
    val intervals = Seq((10L, 10L, 20L), (11L, 15L, 25L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInterval(points, intervals, "p", "lo", "hi", 4L)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 10L), (3L, 11L)))
  }

  test("degenerate whole-axis interval fails fast instead of exploding") {
    val points = Seq((1L, 0L)).toDF("pid", "p")
    val intervals = Seq((1L, Long.MinValue / 4, Long.MaxValue / 4))
      .toDF("iid", "lo", "hi")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInterval(points, intervals, "p", "lo", "hi", 1024L)
    }
    assert(e.getMessage.contains("buckets of width"))
  }

  test("reversed interval (lo > hi) matches nothing and bypasses no guard") {
    // a WIDE reversed interval has negative span: pre-fix it slipped past
    // the max() guard and sequence(loB, hiB) exploded DESCENDING into
    // millions of rows — now it is dropped before the explode entirely
    val points = Seq((1L, 0L), (2L, 500L)).toDF("pid", "p")
    val intervals = Seq(
      (1L, Long.MaxValue / 4, Long.MinValue / 4),  // wide + reversed
      (2L, 400L, 600L)                             // sane
    ).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInterval(points, intervals, "p", "lo", "hi", 64L)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(got === Set((2L, 2L)))
  }

  private def naiveOverlap(a: org.apache.spark.sql.DataFrame,
                           b: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    a.crossJoin(b)
      .where($"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
      .select($"aid", $"bid").as[(Long, Long)].collect().toSet

  test("intervalOverlap equals the cross-join reference for every width") {
    val rnd = new scala.util.Random(13)
    val left = (0L until 200L).map { i =>
      val lo = rnd.nextInt(2000) - 1000L
      (i, lo, lo + rnd.nextInt(250))
    }.toDF("aid", "a_lo", "a_hi")
    val right = (0L until 60L).map { i =>
      val lo = rnd.nextInt(2000) - 1000L
      (i, lo, lo + rnd.nextInt(400))
    }.toDF("bid", "b_lo", "b_hi")
    val want = naiveOverlap(left, right)
    assert(want.nonEmpty)
    Seq(1L, 7L, 64L, 1000L, 100000L).foreach { w =>
      val got = RangeJoin
        .intervalOverlap(left, right, "a_lo", "a_hi", "b_lo", "b_hi", w)
        .select($"aid", $"bid").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size,
        s"w=$w: meet-bucket dedup must emit each overlapping pair once")
      assert(got.toSet === want, s"bucket width $w changed the overlap result")
    }
  }

  test("intervalOverlap: touching endpoints count; reversed intervals drop") {
    val left = Seq(
      (1L, 0L, 10L),
      (2L, 50L, 40L)    // reversed: matches nothing, must not explode
    ).toDF("aid", "a_lo", "a_hi")
    val right = Seq(
      (1L, 10L, 20L),   // touches aid=1 at exactly one point
      (2L, 11L, 20L)    // disjoint from aid=1
    ).toDF("bid", "b_lo", "b_hi")
    val got = RangeJoin
      .intervalOverlap(left, right, "a_lo", "a_hi", "b_lo", "b_hi", 4L)
      .select($"aid", $"bid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L)))
  }

  test("intervalOverlap rejects shared column names and degenerate spans") {
    val a = Seq((1L, 0L, 10L)).toDF("id", "lo", "hi")
    val b = Seq((1L, 5L, 15L)).toDF("id", "b_lo", "b_hi")
    val e1 = intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(a, b, "lo", "hi", "b_lo", "b_hi", 4L)
    }
    assert(e1.getMessage.contains("disjoint"))
    val wide = Seq((1L, Long.MinValue / 4, Long.MaxValue / 4))
      .toDF("bid", "b_lo", "b_hi")
    val e2 = intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(
        a.toDF("aid", "a_lo", "a_hi"), wide, "a_lo", "a_hi", "b_lo", "b_hi", 1024L)
    }
    assert(e2.getMessage.contains("buckets of width"))
  }

  test("intervalOverlap plan is a bucket equi-join, not a cartesian") {
    val a = spark.range(0, 500)
      .select($"id".as("aid"), ($"id" * 40).as("a_lo"), ($"id" * 40 + 60).as("a_hi"))
    val b = spark.range(0, 50)
      .select($"id".as("bid"), ($"id" * 400).as("b_lo"), ($"id" * 400 + 500).as("b_hi"))
    val df = RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 64L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"overlap join must stay an equi-join:\n$plan")
    assert(df.count() > 0)
  }

  test("plan is a bucket equi-join, not a cartesian / nested loop") {
    val points = spark.range(0, 1000).select($"id".as("pid"), ($"id" * 3).as("p"))
    val intervals = spark.range(0, 50)
      .select($"id".as("iid"), ($"id" * 60).as("lo"), ($"id" * 60 + 90).as("hi"))
    val df = RangeJoin.pointInterval(points, intervals, "p", "lo", "hi", 64L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"range join must stay an equi-join:\n$plan")
    assert(df.count() > 0)
  }
}
