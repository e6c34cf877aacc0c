package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dashboard-shaping aggregates (skew_analysis.py:48-93,
  * file_distribution.py:33-75): top-N with an "Others" rollup, fixed-width
  * histograms. Emitted as data frames — rendering stays out of engine scope. */
object RollupOps {

  /** A15: top-N rows by `countCol` desc (ties broken by `keyCol` asc for
    * determinism) plus one "Others" row carrying the tail sum
    * (skew_analysis.py:85-93).
    *
    * Single-plan: rank with a window over the (already aggregated, low
    * cardinality) counts frame, then conditional re-aggregation — no
    * `collect`, no `except`, one shuffle. The window's single-partition sort
    * is fine because its input is post-aggregation (cardinality = number of
    * groups, not rows).
    */
  def topNWithOthers(counts: DataFrame, keyCol: String, countCol: String,
                     n: Int, othersLabel: String = "Others"): DataFrame = {
    val w = Window.orderBy(col(countCol).desc, col(keyCol).asc)
    counts
      .withColumn("__rn", row_number().over(w))
      .withColumn("__key",
        when(col("__rn") <= n, col(keyCol).cast("string")).otherwise(lit(othersLabel)))
      .withColumn("__ord",
        when(col("__rn") <= n, col("__rn")).otherwise(lit(n + 1L)))
      .groupBy(col("__key").as(keyCol))
      .agg(sum(col(countCol)).as(countCol), min(col("__ord")).as("__ord"))
      .orderBy(col("__ord"))
      .drop("__ord")
  }

  /** Fixed-width value histogram (generic form of A14). */
  def histogram(df: DataFrame, valueCol: String, binWidth: Double): DataFrame =
    df.select(floor(col(valueCol) / binWidth).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("count"))
      .orderBy("bin")
}
