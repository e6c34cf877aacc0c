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
    val loB = floorDiv(col(loCol), bucketWidth)
    val hiB = floorDiv(col(hiCol), bucketWidth)
    val widest = intervals
      .agg(coalesce(max(hiB - loB + 1L), lit(0L)))
      .collect().head.getLong(0)
    require(widest <= maxBucketsPerInterval,
      s"an interval spans $widest buckets of width $bucketWidth (cap " +
        s"$maxBucketsPerInterval): widen bucketWidth or split the interval " +
        "— exploding it would recreate the cross join this operator avoids")
    val iv = intervals.withColumn("__b", explode(sequence(loB, hiB)))
    points.withColumn("__b", floorDiv(col(pCol), bucketWidth))
      .join(iv, Seq("__b"))
      .where(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("__b")
  }
}
