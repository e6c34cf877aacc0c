package graft

import org.apache.spark.sql.functions._

import graft.functions.exprs

/** KLL quantile sketch: exact regime ≡ discrete-quantile reference (any
  * layout), quantile_disc index semantics on known sets, the error-regime
  * rank guarantee under partial merges, null skip. */
class KllSpec extends SparkSuite {
  import spark.implicits._

  private def sketchQs(df: org.apache.spark.sql.DataFrame, k: Int,
                       ps: Seq[Double]): Seq[Double] =
    df.agg(exprs.kllQuantiles(col("x"), k, ps))
      .first().getSeq[Double](0).toSeq

  /** SQL quantile_disc reference: element at index ceil(p·n)−1 (clamped)
    * of the sorted values — pinned against DuckDB's semantics. */
  private def disc(sorted: Seq[Double], p: Double): Double =
    sorted(math.max(0, math.ceil(p * sorted.size).toInt - 1))

  test("exact regime (n <= k): equals quantile_disc on every prob, any layout") {
    val rnd = new scala.util.Random(17)
    val xs = Seq.fill(3000)(rnd.nextDouble() * 1000).map(v => math.round(v) / 2.0)
    val sorted = xs.sorted
    val ps = Seq(0.0, 0.25, 1.0 / 3, 0.5, 0.75, 0.9, 1.0)
    val want = ps.map(disc(sorted, _))
    Seq(1, 32).foreach { parts =>
      val got = sketchQs(xs.toDF("x").repartition(parts), k = 4096, ps)
      assert(got === want, s"parts=$parts: exact regime must match quantile_disc")
    }
  }

  test("quantile_disc edge semantics on a tiny known set") {
    // pinned against DuckDB: n=4 [10,20,30,40] -> p=.25 -> 10, p=.26 -> 20,
    // p=.49 -> 20, p=.5 -> 20, p=.51 -> 30, p=.9 -> 40
    val df = Seq(10.0, 20.0, 30.0, 40.0).toDF("x")
    val got = sketchQs(df, k = 64, Seq(0.25, 0.26, 0.49, 0.5, 0.51, 0.9))
    assert(got === Seq(10.0, 20.0, 20.0, 20.0, 30.0, 40.0))
  }

  test("error regime (n >> k): rank error bounded under partial merges") {
    // 200k uniform values, k=200: the deterministic-compaction KLL keeps
    // every reported quantile within ~1% true rank (measured; assert 2.5%
    // to absorb layout-dependent merge orders)
    val n = 200000
    val df = spark.range(0, n).select(
      (pmod(xxhash64(col("id")), lit(1000000L))).cast("double").as("x"))
      .repartition(32)
    val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    val got = sketchQs(df, k = 200, ps)
    val cnts = got.map(q => df.where(col("x") <= q).count())
    ps.zip(cnts).foreach { case (p, rank) =>
      val err = math.abs(rank.toDouble / n - p)
      assert(err <= 0.025, s"p=$p: rank ${rank.toDouble / n} off by $err")
    }
  }

  test("state stays O(k) in the error regime") {
    // direct driver-side exercise of the structure at 1M inserts
    val st = new graft.functions.KllState(200)
    val rnd = new scala.util.Random(5)
    (1 to 1000000).foreach(_ => st.add(rnd.nextDouble()))
    assert(st.n === 1000000L)
    assert(st.totalSize < 1200,
      s"KLL state must stay ~O(k), got ${st.totalSize} stored items")
    val Array(q50) = st.quantiles(Array(0.5))
    assert(math.abs(q50 - 0.5) < 0.02, s"median of U(0,1) drifted: $q50")
  }

  test("budget bound is enforced after large fan-in merges") {
    // 64 part-sketches of 20k values each merged into one accumulator: the
    // unbounded compress loop must land every intermediate state at or
    // under its capacity budget (the previous 64-compaction bail made this
    // best-effort), while the merged sketch stays rank-accurate
    val rnd = new scala.util.Random(11)
    val acc = new graft.functions.KllState(200)
    (1 to 64).foreach { _ =>
      val part = new graft.functions.KllState(200)
      (1 to 20000).foreach(_ => part.add(rnd.nextDouble()))
      acc.mergeIn(part)
      assert(acc.totalSize <= acc.budget,
        s"state ${acc.totalSize} exceeds budget ${acc.budget} after merge")
    }
    assert(acc.n === 64L * 20000L)
    val Array(q50) = acc.quantiles(Array(0.5))
    assert(math.abs(q50 - 0.5) < 0.02, s"median of U(0,1) drifted: $q50")
  }

  test("nulls are ignored; empty group yields null") {
    val df = Seq(Some(1.0), None, Some(3.0), None).toDF("x")
    assert(sketchQs(df, 64, Seq(0.5)) === Seq(1.0))
    val empty = df.where(col("x") > 100)
    val row = empty.agg(exprs.kllQuantiles(col("x"), 64, Seq(0.5))).first()
    assert(row.isNullAt(0))
  }
}
