package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dashboard-shaping aggregates (skew_analysis.py:48-93,
  * file_distribution.py:33-75): top-N with an "Others" rollup, fixed-width
  * histograms. Emitted as data frames — rendering stays out of engine scope. */
object RollupOps {

  /** A15: top-N rows by `countCol` desc (ties broken by the STRING form of
    * `keyCol` asc — output keys are stringified anyway, and both callers
    * pass string keys) plus one "Others" row carrying the tail sum
    * (skew_analysis.py:85-93).
    *
    * Shape: ONE [[graft.functions.BoundedTopK]] scalar aggregate — O(n)
    * state, map-side partial merge — plus a tail-sum derived as
    * total − topSum, all on the single aggregate row. No window: the
    * previous `row_number().over(Window.orderBy(...))` formulation moved
    * the whole counts frame to one task (the "No Partition Defined"
    * warning) and would single-task a high-cardinality vocab frame;
    * this version never materializes more than n entries anywhere.
    * Counts ride through BoundedTopK's double score — exact below 2^53,
    * far above any per-group count this shapes. */
  def topNWithOthers(counts: DataFrame, keyCol: String, countCol: String,
                     n: Int, othersLabel: String = "Others"): DataFrame = {
    val ct = counts.schema(countCol).dataType
    val agg = counts.agg(
      graft.functions.exprs.boundedTopK(
        col(countCol).cast("double"), col(keyCol).cast("string"), n).as("top"),
      sum(col(countCol)).as("__total"), count(lit(1)).as("__groups"))
    val topStructs = transform(col("top"),
      t => struct(t.getField("id").as("k"), t.getField("score").as("c")))
    val topSum = aggregate(col("top"), lit(0.0), (a, t) => a + t.getField("score"))
    val othersArr = when(col("__groups") > n,
        array(struct(lit(othersLabel).as("k"),
          (col("__total").cast("double") - topSum).as("c"))))
      .otherwise(array().cast("array<struct<k:string,c:double>>"))
    agg.select(posexplode(concat(topStructs, othersArr)).as(Seq("__pos", "__r")))
      .select(col("__r.k").as(keyCol), col("__r.c").cast(ct).as(countCol),
        col("__pos"))
      .orderBy(col("__pos"))
      .drop("__pos")
  }

  /** Fixed-width value histogram (generic form of A14). */
  def histogram(df: DataFrame, valueCol: String, binWidth: Double): DataFrame =
    df.select(floor(col(valueCol) / binWidth).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("count"))
      .orderBy("bin")
}
