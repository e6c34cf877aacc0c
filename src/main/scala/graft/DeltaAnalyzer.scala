package graft

import org.apache.spark.sql.SparkSession

import graft.health.{DeltaAnalyzerMetrics, HealthResult, Thresholds}
import graft.operators.HealthAnalyzer

/** Top-level facade mirroring the reference's `DeltaAnalyzer`
  * (delta_analyzer.py:8-92): one call from table path to scored metrics.
  * The reference's python/databricks environment split collapses here —
  * Spark IS the engine; the Spark-backend guess-heuristics remain available
  * via `sparkHeuristics = true` (delta_spark_analyzer.py:161-187 semantics).
  */
object DeltaAnalyzer {

  /** `data` is a table path OR a catalog table name — sniffed exactly like
    * the reference's `_load_data` (delta_spark_analyzer.py:26-35). */
  def analyze(spark: SparkSession, data: String,
              thresholds: Thresholds = Thresholds(),
              sparkHeuristics: Boolean = false): DeltaAnalyzerMetrics = {
    val measured = HealthAnalyzer.analyzeTarget(spark, data, thresholds)
    if (sparkHeuristics)
      HealthAnalyzer.sparkHeuristics(measured).withHealthScore
    else measured
  }

  /** `create_health_result` analog (delta_analyzer.py:40-49). */
  def healthResult(spark: SparkSession, tablePath: String,
                   thresholds: Thresholds = Thresholds()): HealthResult =
    HealthAnalyzer.healthResult(analyze(spark, tablePath, thresholds))

  /** `print_results` analog (base_analyzer.py:103-142): formatted summary. */
  def summary(m: DeltaAnalyzerMetrics): String = {
    val scored = if (m.healthScore.isDefined) m else m.withHealthScore
    val sb = new StringBuilder
    sb ++= "\nDelta Table Analysis Results:\n"
    sb ++= "----------------------------\n"
    sb ++= f"Health Score: ${scored.healthScore.get}%.1f/100 (${scored.healthStatus.get})%n"
    sb ++= s"Version Count: ${scored.versionCount}\n"
    sb ++= f"Record Count: ${scored.recordCount}%,d%n"
    sb ++= s"Operations: ${scored.numberOfWrites} writes, ${scored.numberOfDeletes} deletes, ${scored.numberOfOptimizes} optimizes\n"
    sb ++= f"Skewness: ${scored.skewnessMax}%.2f (Max), ${scored.skewnessAverage}%.2f (Avg)%n"
    scored.skewMetrics.foreach { sk =>
      sb ++= "\nPartition Skew Metrics:\n"
      sb ++= s"Partition Columns: ${sk.partitionColumns.mkString(", ")}\n"
      sb ++= s"Partition Count: ${sk.partitionCount}\n"
      // exact extremes survive the top-N cap on recordsPerPartition
      sk.maxPartition.foreach { case (k, v) =>
        sb ++= s"Max Records: $v (Partition: $k)\n"
      }
      sk.minPartition.foreach { case (k, v) =>
        sb ++= s"Min Records: $v (Partition: $k)\n"
      }
    }
    sb ++= f"Table Size: ${scored.tableSizeBytes / (1024.0 * 1024)}%.2f MB%n"
    sb ++= f"Folder Size: ${scored.folderSizeBytes / (1024.0 * 1024)}%.2f MB%n"
    sb ++= s"Total Files: ${scored.totalFileCount} files\n"
    sb ++= s"Data Files: ${scored.dataFileCount} files\n"
    sb ++= s"Small Files: ${scored.smallFilesCount} files\n"
    sb ++= s"Orphan Files: ${scored.orphanFilesCount} files\n"
    sb ++= s"Needs Vacuum: ${scored.needsVacuum}\n"
    sb ++= s"Has Orphan Files: ${scored.hasOrphanFiles}\n"
    sb ++= s"Needs Optimize: ${scored.needsOptimize}\n"
    sb.result()
  }
}
