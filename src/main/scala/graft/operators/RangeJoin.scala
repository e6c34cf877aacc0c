package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join without an equi key — the classic operator Spark
  * lacks: `points JOIN intervals ON lo <= p AND p <= hi` plans as a
  * broadcast-nested-loop / cartesian and dies at scale.
  *
  * The scale shape here is BUCKETIZATION: pick a bucket width w, map each
  * point to its one bucket `floor(p / w)`, explode each interval to every
  * bucket it overlaps, and equi-join on the bucket key — the shuffle is
  * |points| + Σ ceil(span/w) interval replicas, never |points|·|intervals|.
  * Each matching (point, interval) pair meets in EXACTLY one bucket (the
  * point's), so the result needs no dedup. The exact predicate still runs
  * after the join, so bucketing is purely a candidate generator — same
  * discipline as the LSH/simhash dedup paths.
  *
  * Typical pipeline uses: attributing events to ad-hoc campaign/maintenance
  * windows, mapping documents to length-band quality rules, joining
  * timestamps to time ranges — interval sides are usually small enough
  * that AQE broadcasts the exploded frame outright; the bucketing keeps
  * the plan shuffle-bounded when they are not.
  */
object RangeJoin {

  /** Exact floor division for longs via pmod (always-non-negative
    * remainder), so negative points and bounds bucket correctly —
    * `p div w` truncates toward zero and would off-by-one every negative
    * bucket. The double division is exact because the numerator is an
    * exact multiple of w (quotients must stay under 2^53 — epochs, sizes
    * and ids all do). */
  private def floorDiv(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))) / lit(w)).cast("long")

  /** Inclusive point-in-interval join: one output row per (point row,
    * interval row) with `loCol <= pCol <= hiCol`. All three columns must
    * be integral (cast epochs/sizes to long upstream).
    *
    * @param bucketWidth same unit as the columns; ~the typical interval
    *        span is a good width (1 bucket ≈ 1 interval replica)
    * @param maxBucketsPerInterval fail-fast guard: one degenerate
    *        whole-axis interval would otherwise replicate into millions of
    *        buckets and recreate the cross join this operator exists to
    *        avoid (one aggregate over the interval side — the small side —
    *        checks it) */
  def pointInterval(points: DataFrame, intervals: DataFrame,
                    pCol: String, loCol: String, hiCol: String,
                    bucketWidth: Long,
                    maxBucketsPerInterval: Long = 1 << 16): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // Drop reversed intervals (lo > hi) BEFORE the span guard and explode:
    // they match nothing under the inclusive predicate (semantics
    // preserved), but a wide reversed interval has a NEGATIVE span that
    // slips past the max() guard while sequence(loB, hiB) with start > stop
    // generates a DESCENDING sequence — millions of bucket rows, exactly
    // the blowup the guard exists to stop.
    val wellFormed = intervals.where(col(loCol) <= col(hiCol))
    val loB = floorDiv(col(loCol), bucketWidth)
    val hiB = floorDiv(col(hiCol), bucketWidth)
    val widest = wellFormed
      .agg(coalesce(max(hiB - loB + 1L), lit(0L)))
      .collect().head.getLong(0)
    require(widest <= maxBucketsPerInterval,
      s"an interval spans $widest buckets of width $bucketWidth (cap " +
        s"$maxBucketsPerInterval): widen bucketWidth or split the interval " +
        "— exploding it would recreate the cross join this operator avoids")
    val iv = wellFormed.withColumn("__b", explode(sequence(loB, hiB)))
    points.withColumn("__b", floorDiv(col(pCol), bucketWidth))
      .join(iv, Seq("__b"))
      .where(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("__b")
  }

  /** Inclusive interval-overlap join: one output row per (left row, right
    * row) whose intervals intersect — `lLo <= rHi AND rLo <= lHi` (the
    * campaign-overlap / session-intersection shape). Same bucketization as
    * [[pointInterval]] on BOTH sides, with one extra wrinkle: an
    * overlapping pair shares EVERY bucket their intersection touches, so
    * exactly-once output keeps only the pair's MEET bucket — the bucket of
    * `greatest(lLo, rLo)`, the intersection's left edge, which both
    * replicas provably cover. Shuffle is Σ ceil(span/w) replicas per side,
    * never |left|·|right|; reversed intervals are dropped on both sides
    * (match nothing; see [[pointInterval]]).
    *
    * The two frames' column sets must be disjoint (alias upstream) — the
    * join would otherwise leave ambiguous references. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lLo: String, lHi: String, rLo: String, rHi: String,
                      bucketWidth: Long,
                      maxBucketsPerInterval: Long = 1 << 16): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty,
      s"left/right column names must be disjoint, shared: ${dup.mkString(", ")}")

    def exploded(df: DataFrame, lo: String, hi: String): DataFrame = {
      val wellFormed = df.where(col(lo) <= col(hi))
      val loB = floorDiv(col(lo), bucketWidth)
      val hiB = floorDiv(col(hi), bucketWidth)
      val widest = wellFormed
        .agg(coalesce(max(hiB - loB + 1L), lit(0L)))
        .collect().head.getLong(0)
      require(widest <= maxBucketsPerInterval,
        s"an interval spans $widest buckets of width $bucketWidth (cap " +
          s"$maxBucketsPerInterval): widen bucketWidth or split the interval")
      wellFormed.withColumn("__b", explode(sequence(loB, hiB)))
    }

    exploded(left, lLo, lHi)
      .join(exploded(right, rLo, rHi), Seq("__b"))
      .where(col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
        col("__b") === floorDiv(greatest(col(lLo), col(rLo)), bucketWidth))
      .drop("__b")
  }
}
