package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.health.SkewMetrics

/** Partition-skew analytics (delta_python_analyzer.py:33-88,
  * delta_spark_analyzer.py:38-81) re-expressed as declarative Spark plans.
  *
  * Works over ANY DataFrame + grouping columns (plain parquet or a replayed
  * Delta snapshot): the per-partition counts are one hash aggregation whose
  * input scan Catalyst prunes to the grouping columns only; the skewness
  * reductions run over the (low-cardinality) counts frame. Unlike the
  * reference — which materializes the whole table into pandas twice, once per
  * skew method (delta_python_analyzer.py:47,192-193) — the counts are
  * computed once and both metrics are derived from the same frame in a
  * single plan with no driver-side loops.
  */
object SkewAnalyzer {

  /** A1: per-partition record counts — `GROUP BY <cols> COUNT(*)`. */
  def partitionCounts(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("count"))

  /** A4: counts keyed by stringified partition tuple. The reference's key
    * format is Python `str(v)` for one column and `str(tuple)` for several
    * (delta_python_analyzer.py:51-57); we keep a clean `/`-joined key and
    * provide [[pythonTupleKey]] only for parity tests. */
  def recordsPerPartition(df: DataFrame, cols: Seq[String]): DataFrame =
    partitionCounts(df, cols)
      .select(concat_ws("/", cols.map(col): _*).as("partition"), col("count"))

  /** Python `str(('Mon', 'Dinner'))`-style key, for 1:1 parity with
    * test_delta_analyzer_metrics.py:146-148. */
  def pythonTupleKey(cols: Seq[String]): Column =
    if (cols.size == 1) col(cols.head).cast("string")
    else concat(lit("("),
      concat_ws(", ", cols.map(c => concat(lit("'"), col(c), lit("'"))): _*),
      lit(")"))

  /** A2+A3 in one pure plan: returns a one-row frame
    * (partition_cnt, skewness_max, skewness_average).
    *
    * skewness_max     = (max(c) - min(c)) / max(c)     [0 if <=1 part or max=0]
    * skewness_average = avg(|c - mean|) / mean          [0 if mean = 0]
    *
    * The mean is attached via a broadcast cross-join of a one-row aggregate
    * rather than an empty-frame window (`Window.partitionBy()` would funnel
    * everything through a single task) — the whole thing stays distributed
    * and collect-free regardless of partition-count cardinality.
    */
  def skewnessStats(counts: DataFrame): DataFrame = {
    val mean = counts.agg(avg(col("count")).as("mean_count"))
    counts.crossJoin(broadcast(mean))
      .agg(
        count(lit(1)).as("partition_cnt"),
        max(col("count")).as("max_count"),
        min(col("count")).as("min_count"),
        avg(abs(col("count") - col("mean_count"))).as("avg_abs_dev"),
        first(col("mean_count")).as("mean_count"))
      .select(
        col("partition_cnt"),
        when(col("partition_cnt") <= 1 || col("max_count") === 0, lit(0.0))
          .otherwise((col("max_count") - col("min_count")) / col("max_count"))
          .as("skewness_max"),
        when(col("partition_cnt") <= 1 || col("mean_count") === 0, lit(0.0))
          .otherwise(col("avg_abs_dev") / col("mean_count"))
          .as("skewness_average"))
  }

  /** A16: distribution stats feeding the skew gauge
    * (skew_analysis.py:139-149). */
  def distributionStats(counts: DataFrame): DataFrame =
    counts.agg(
      max(col("count")).as("max_count"),
      min(col("count")).as("min_count"),
      avg(col("count")).as("mean_count"),
      coalesce(stddev_pop(col("count")), lit(0.0)).as("stddev_count"))

  /** Full skew bundle for a table, collected to the typed record the health
    * calculus consumes. Only the (small) counts/stats rows ever reach the
    * driver, and the per-partition dict is BOUNDED: the reference
    * materializes every partition key (delta_python_analyzer.py:51-57),
    * which a high-cardinality partition column (timestamps, ids) turns into
    * a driver OOM at 100× — here the map keeps only the `topN` heaviest
    * partitions, while the true cardinality and both exact extremes are
    * computed distributively and carried separately. */
  def analyze(df: DataFrame, partitionCols: Seq[String], threshold: Double,
              topN: Int = 1000): SkewMetrics = {
    if (partitionCols.isEmpty) return SkewMetrics()
    val counts = partitionCounts(df, partitionCols).cache()
    try {
      val stats = skewnessStats(counts).first()
      val skewMax = stats.getAs[Double]("skewness_max")
      val skewAvg = stats.getAs[Double]("skewness_average")
      val strCounts = counts.select(
        concat_ws("/", partitionCols.map(col): _*).as("partition"), col("count"))
      val records = strCounts
        .orderBy(col("count").desc, col("partition").asc).limit(topN)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val mm = strCounts.agg(
        min_by(struct(col("partition"), col("count")),
          struct(col("count"), col("partition"))).as("mn"),
        max_by(struct(col("partition"), col("count")),
          struct(col("count"), col("partition"))).as("mx")).first()
      def kv(i: Int): Option[(String, Long)] =
        if (mm.isNullAt(i)) None
        else {
          val r = mm.getStruct(i)
          Some(r.getString(0) -> r.getLong(1))
        }
      SkewMetrics(
        partitionColumns = partitionCols,
        skewnessMax = skewMax,
        skewnessAverage = skewAvg,
        isSkewed = skewMax > threshold,
        partitionCount = stats.getAs[Long]("partition_cnt"),
        recordsPerPartition = records,
        minPartition = kv(0),
        maxPartition = kv(1))
    } finally { counts.unpersist(); () }
  }
}
