package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.health.DeltaAnalyzerMetrics

/** Dashboard/report shaping: the metrics-history trend frame (A18) and the
  * display scalar functions (F5-F7) from the reference's
  * visualization/notebook modules — engine emits tidy frames; rendering
  * stays out of scope. */
object Reporting {

  /** One metrics record → one-row DataFrame (typed product encoder). */
  def metricsToDF(spark: SparkSession, ms: Seq[DeltaAnalyzerMetrics]): DataFrame = {
    import spark.implicits._
    ms.toDS().toDF()
  }

  /** A18: historical trend frame — union of per-analysis metric rows tagged
    * with their analysis date, ordered by date
    * (detailed_history_metrics.py:5-152 consumes exactly this shape). */
  def trend(runs: Seq[(java.sql.Timestamp, DeltaAnalyzerMetrics)],
            spark: SparkSession): DataFrame = {
    import spark.implicits._
    runs.map { case (d, m) =>
      (d, m.tableSizeBytes, m.folderSizeBytes, m.recordCount,
        m.totalFileCount, m.dataFileCount, m.smallFilesCount,
        m.orphanFilesCount, m.fileSizeEfficiency.getOrElse(0.0),
        m.storageEfficiency.getOrElse(0.0), m.skewnessMax,
        m.numberOfWrites, m.numberOfDeletes, m.numberOfOptimizes)
    }.toDF("date", "table_size_bytes", "folder_size_bytes", "record_count",
        "total_file_count", "data_file_count", "small_files_count",
        "orphan_files_count", "file_size_efficiency", "storage_efficiency",
        "partition_skewness", "writes", "deletes", "optimizes")
      .orderBy(col("date"))
  }

  /** O4: argmax partition — the (key, count) row with the maximum count
    * (ties broken by key desc, matching Python max() first-max semantics on
    * insertion order is unspecified; we pin a deterministic order). */
  def argmaxPartition(counts: DataFrame, keyCol: String, countCol: String): DataFrame =
    counts.orderBy(col(countCol).desc, col(keyCol).asc).limit(1)

  /** F5: snake_case → Title Case label. */
  def titleLabel(c: Column): Column = initcap(regexp_replace(c, "_", " "))

  /** F6: truncate with ellipsis past `max` chars (delta_operations.py:48-49). */
  def truncated(c: Column, max: Int = 47): Column =
    when(length(c) > max, concat(substring(c, 1, max), lit("..."))).otherwise(c)

  /** F7: human-readable byte size (B/KB/MB/GB ladder). */
  def humanBytes(c: Column): Column = {
    val b = c.cast("double")
    when(b >= 1024d * 1024 * 1024,
        concat(format_number(b / (1024d * 1024 * 1024), 2), lit(" GB")))
      .when(b >= 1024d * 1024,
        concat(format_number(b / (1024d * 1024), 2), lit(" MB")))
      .when(b >= 1024d, concat(format_number(b / 1024d, 2), lit(" KB")))
      .otherwise(concat(b.cast("long").cast("string"), lit(" B")))
  }

  /** F7: milliseconds → seconds display (delta_operations.py:36-39). */
  def humanMillis(c: Column): Column =
    when(c >= 1000, concat(format_number(c / 1000.0, 1), lit(" s")))
      .otherwise(concat(c.cast("string"), lit(" ms")))
}
