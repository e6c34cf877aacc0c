package graft

import org.apache.spark.sql.functions._

import graft.functions.exprs

/** Misra–Gries heavy hitters: exact regime, the MG error guarantee in the
  * overflow regime, partial-merge/serde via repartition, null skip. */
class MgSpec extends SparkSuite {
  import spark.implicits._

  private def summary(df: org.apache.spark.sql.DataFrame, k: Int)
      : Seq[(String, Long)] =
    df.agg(exprs.heavyHitters(col("t"), k).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.term", $"e.count").as[(String, Long)].collect().toSeq

  test("exact regime (distinct <= k): equals plain counts, any layout") {
    val df = spark.range(0, 9000L)
      .select(concat(lit("t"), col("id") % 23).as("t"))
    val truth = df.groupBy($"t").count().as[(String, Long)].collect()
      .sortBy { case (t, c) => (-c, t) }.toSeq
    assert(summary(df.repartition(1), 64) === truth)
    assert(summary(df.repartition(32), 64) === truth,
      "exact regime must be layout-independent")
  }

  test("overflow regime: MG guarantee — underestimates within n/(k+1), no false dismissals") {
    // 3 heavy terms (3000 each) in a sea of 5000 singletons: n = 14000,
    // k = 63 → deficit bound n/(k+1) = 218.75; every heavy term MUST
    // survive with count within [true - 218, true]
    val heavy = spark.range(0, 9000L)
      .select(concat(lit("H"), col("id") % 3).as("t"))
    val noise = spark.range(0, 5000L)
      .select(concat(lit("n"), col("id")).as("t"))
    val got = summary(heavy.union(noise), 63).toMap
    val bound = 14000.0 / 64
    (0 until 3).foreach { i =>
      val c = got.getOrElse(s"H$i",
        fail(s"heavy term H$i dismissed — frequency 3000 > $bound"))
      assert(c <= 3000L && c >= 3000L - bound.toLong,
        s"H$i count $c outside [${3000 - bound.toLong}, 3000]")
    }
    // every reported count is an underestimate of the true frequency
    got.foreach { case (t, c) =>
      val truth = if (t.startsWith("H")) 3000L else 1L
      assert(c <= truth, s"$t overestimated: $c > $truth")
    }
  }

  test("nulls are ignored") {
    val df = Seq(Some("a"), None, Some("a"), Some("b"), None).toDF("t")
    assert(summary(df, 8) === Seq(("a", 2L), ("b", 1L)))
  }

  // ---- BitMajorityAgg (the simhash reduction as one bounded aggregate) ----

  test("bitMajority equals the per-bit counting reference, any layout") {
    val rnd = new scala.util.Random(31)
    val rows = (0L until 5000L).map(i => (i % 7, rnd.nextLong() & ((1L << 60) - 1)))
    def reference(hs: Seq[Long]): Long =
      (0 until 60).foldLeft(0L) { (acc, p) =>
        val set = hs.count(h => ((h >>> p) & 1L) == 1L)
        if (2 * set > hs.size) acc | (1L << p) else acc
      }
    val truth = rows.groupBy(_._1).map { case (g, xs) => g -> reference(xs.map(_._2)) }
    Seq(1, 32).foreach { parts =>
      val got = rows.toDF("g", "h").repartition(parts)
        .groupBy($"g").agg(exprs.bitMajority($"h", 60).as("m"))
        .as[(Long, Long)].collect().toMap
      assert(got === truth, s"parts=$parts: partial merges changed a majority bit")
    }
  }

  test("bitMajority: ties -> 0 and nulls are skipped") {
    // two inputs with complementary low bits: every bit position ties -> 0
    val df = Seq(Option(0x5555555555555L), Option(0xAAAAAAAAAAAAAL), None)
      .toDF("h")
    val got = df.agg(exprs.bitMajority($"h", 60)).first().getLong(0)
    assert(got === 0L)
  }
}
