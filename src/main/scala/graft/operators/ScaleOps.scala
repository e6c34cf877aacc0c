package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-hygiene building blocks: skew-salted aggregation and partition
  * sizing helpers. These exist for the 1000-executor deployment story — a
  * hot grouping key (one giant partition value) would otherwise funnel into
  * a single reducer. */
object ScaleOps {

  /** Two-phase salted count: groupBy(keys + salt) partial counts (spreads a
    * hot key over `saltBuckets` reducers), then groupBy(keys) sum. With AQE
    * skew handling this is often unnecessary; it is the explicit form for
    * deterministic layouts. Result ≡ plain groupBy(keys).count(). */
  def saltedCounts(df: DataFrame, keys: Seq[String], saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("count"))
  }

  /** Generic salted sum of `valueCol` by `keys` — same two-phase shape. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Top-frequency keys — the skew diagnosis query feeding a salting or
    * broadcast decision. */
  def hotKeys(df: DataFrame, keys: Seq[String], topN: Int = 10): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc).limit(topN)
}
