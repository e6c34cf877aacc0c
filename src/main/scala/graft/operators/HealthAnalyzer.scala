package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.deltalog.DeltaLog
import graft.health._

/** End-to-end table health analysis — the re-architected E1 entry point
  * (SURVEY.md §3): one cached log snapshot, then independent DataFrame jobs
  * (history aggregate, partition counts/skew, manifest aggregate, folder
  * listing aggregate) that each cross the driver boundary exactly once at
  * their terminal action, feeding the pure-Scala health calculus.
  *
  * Implements the *Python* backend's measured semantics (the honest fork of
  * H6-H10 — delta_python_analyzer.py:224-275) since our log layer has full
  * per-file data; the Spark backend's guess-heuristics
  * (delta_spark_analyzer.py:161-187) are available via `sparkHeuristics`.
  */
object HealthAnalyzer {

  def analyzeTable(spark: SparkSession, tablePath: String,
                   thresholds: Thresholds = Thresholds()): DeltaAnalyzerMetrics = {
    val snap = DeltaLog.snapshot(spark, tablePath)
    try analyzeSnapshot(snap, thresholds) finally snap.unpersist()
  }

  /** S1 with catalog dispatch: accepts EITHER a filesystem path or a
    * catalog table name, mirroring the reference's sniff
    * (delta_spark_analyzer.py:26-35 treats a leading "/" or URI scheme as a
    * path, anything else as a `DeltaTable.forName` name; delta_analyzer.py:
    * 64-90 threads both through). A name is resolved to its registered
    * storage location and analyzed by path. */
  def analyzeTarget(spark: SparkSession, tableNameOrPath: String,
                    thresholds: Thresholds = Thresholds()): DeltaAnalyzerMetrics =
    analyzeTable(spark, resolveTarget(spark, tableNameOrPath), thresholds)

  /** Path-vs-name sniff + catalog resolution. Paths pass through verbatim;
    * names are looked up in the session catalog via `DESCRIBE FORMATTED`
    * (public SQL — works against any catalog implementation, unlike the
    * private CatalogTable API). */
  def resolveTarget(spark: SparkSession, tableNameOrPath: String): String =
    if (looksLikePath(tableNameOrPath)) tableNameOrPath
    else tableLocation(spark, tableNameOrPath)

  /** The reference's path heuristic generalized: anything containing a
    * slash (a catalog identifier never can), or absolute/relative-dotted/
    * scheme-qualified strings, are paths; bare identifiers (incl.
    * `db.table`) are catalog names. */
  private[graft] def looksLikePath(s: String): Boolean =
    s.contains("/") || s.startsWith(".") ||
      s.matches("^[a-zA-Z][a-zA-Z0-9+.\\-]*:/.*")

  private def tableLocation(spark: SparkSession, name: String): String = {
    // backtick-quote each dot-separated part so a non-identifier string
    // surfaces as "table not found" instead of a SQL parse error (or worse,
    // smuggled SQL through the analyzer entry point)
    val quoted = name.split('.').toSeq.map { part =>
      require(part.nonEmpty,
        s"'$name' is not a valid table identifier (empty name part)")
      "`" + part.replace("`", "``") + "`"
    }.mkString(".")
    val rows = spark.sql(s"DESCRIBE FORMATTED $quoted").collect()
    rows.find(r => Option(r.getString(0)).exists(_.trim.equalsIgnoreCase("Location")))
      .map(_.getString(1).trim)
      .filter(_.nonEmpty)
      .getOrElse(throw new IllegalArgumentException(
        s"catalog table '$name' reports no storage location — only " +
          "path-backed (external) tables can be health-analyzed"))
  }

  /** Analysis over an already-open snapshot — callers that need the
    * snapshot for other frames (e.g. Dashboard) share one log replay. */
  def analyzeSnapshot(snap: graft.deltalog.DeltaSnapshot,
                      thresholds: Thresholds = Thresholds()): DeltaAnalyzerMetrics = {
    val spark = snap.spark
    val tablePath = snap.tablePath
    locally {
      // history pass (A5/A6)
      val ops = HistoryAnalyzer.opCounts(snap.history).first()
      // skew pass (A1-A4) — once, both methods, unlike the reference's
      // double materialization (delta_python_analyzer.py:192-193).
      // Guard the fully-deleted table: data is schemaless when no file is
      // active, so grouping by partition columns would not resolve.
      val hasData = snap.dataWithFile.isDefined
      val skew =
        if (hasData)
          SkewAnalyzer.analyze(snap.data, snap.partitionColumns,
            thresholds.skewThreshold)
        else graft.health.SkewMetrics(partitionColumns = snap.partitionColumns)
      // storage pass (A8-A13, J1)
      val folder = StorageAnalyzer.folderFiles(spark, tablePath)
      val storage = StorageAnalyzer.storageStats(folder, snap.activeFilePaths,
        thresholds.smallFileSizeMb.map(_ * 1024 * 1024)).first()
      // record count (A7) — full-scan count, the parity-true form
      val recordCount = if (hasData) snap.data.count() else 0L

      val tableSize = storage.getAs[Long]("table_size_bytes")
      val folderSize = storage.getAs[Long]("folder_size_bytes")
      val dataFiles = storage.getAs[Long]("data_file_count")
      val totalFiles = storage.getAs[Long]("total_file_count")
      val orphans = storage.getAs[Long]("orphan_files_count")
      val avgFileSize = storage.getAs[Long]("avg_file_size_bytes")
      val smallFiles = storage.getAs[Long]("small_files_count")

      // H6/H7/H8: measured ratio semantics (delta_python_analyzer.py:231-243)
      val sizeRatio = if (folderSize > 0) tableSize.toDouble / folderSize else 1.0
      val needsVacuum = sizeRatio < thresholds.vacuumSizeRatioThreshold
      val fileRatio = if (totalFiles > 0) dataFiles.toDouble / totalFiles else 1.0
      val hasOrphans = fileRatio < thresholds.orphanFileRatioThreshold
      val needsOptimize =
        dataFiles > 0 && smallFiles > dataFiles * thresholds.smallFileRatioThreshold

      val m = DeltaAnalyzerMetrics(
        versionCount = snap.version,
        partitionCount = skew.partitionCount,
        recordCount = recordCount,
        isSkewed = skew.isSkewed,
        skewnessMax = skew.skewnessMax,
        skewnessAverage = skew.skewnessAverage,
        numberOfWrites = ops.getAs[Long]("number_of_writes"),
        numberOfDeletes = ops.getAs[Long]("number_of_deletes"),
        numberOfOptimizes = ops.getAs[Long]("number_of_optimizes"),
        isCompacted = ops.getAs[Long]("number_of_optimizes") > 0,
        tableSizeBytes = tableSize,
        folderSizeBytes = folderSize,
        needsVacuum = needsVacuum,
        hasOrphanFiles = hasOrphans,
        needsOptimize = needsOptimize,
        smallFilesCount = if (dataFiles > 0) smallFiles else 0L,
        avgFileSizeBytes = if (dataFiles > 0) avgFileSize else 0L,
        partitionSkewness =
          if (snap.partitionColumns.nonEmpty) Some(skew.skewnessMax) else None,
        dataFileCount = dataFiles,
        orphanFilesCount = orphans,
        // H9 preserved as-written (delta_python_analyzer.py:268)
        filesNeedingVacuum = if (needsVacuum) orphans else 0L,
        fileSizeEfficiency =
          if (dataFiles > 0 && avgFileSize > 0)
            Some(math.min(1.0, avgFileSize.toDouble / (128.0 * 1024 * 1024)))
          else None,
        storageEfficiency =
          if (folderSize > 0) Some(tableSize.toDouble / folderSize) else None,
        tablePath = tablePath,
        totalFileCount = totalFiles,
        skewMetrics =
          if (snap.partitionColumns.nonEmpty) Some(skew) else None)
      m.withHealthScore
    }
  }

  /** The Spark backend's heuristic fork (delta_spark_analyzer.py:161-187),
    * exposed for drop-in parity with `environment="databricks"` behavior. */
  def sparkHeuristics(m: DeltaAnalyzerMetrics): DeltaAnalyzerMetrics = {
    val needsVacuum =
      m.numberOfWrites > 10 * m.numberOfOptimizes && m.numberOfWrites > 0
    val avgMb = m.avgFileSizeBytes / (1024.0 * 1024.0)
    val smallFrac =
      if (avgMb < 1) 0.8 else if (avgMb < 10) 0.3 else 0.1
    m.copy(
      needsVacuum = needsVacuum,
      hasOrphanFiles = needsVacuum,
      filesNeedingVacuum = (0.1 * m.dataFileCount).toLong,
      smallFilesCount = (smallFrac * m.dataFileCount).toLong,
      needsOptimize = smallFrac >= 0.3,
      storageEfficiency = Some(0.95),
      fileSizeEfficiency =
        Some(math.min(1.0, m.avgFileSizeBytes / (128.0 * 1024 * 1024.0))))
  }

  def healthResult(m: DeltaAnalyzerMetrics): HealthResult = {
    val scored = if (m.healthScore.isDefined) m else m.withHealthScore
    HealthResult(scored.healthScore.get.toInt,
      scored.healthStatus.get, scored)
  }

  /** H12: maintenance recommendations (health_dashboard.py:81-93) as a
    * DataFrame. */
  def recommendations(spark: SparkSession, m: DeltaAnalyzerMetrics): DataFrame = {
    import spark.implicits._
    val recs = Seq.newBuilder[(String, String)]
    if (m.needsVacuum)
      recs += (("RUN VACUUM", "Table has files eligible for cleanup"))
    if (m.needsOptimize || m.smallFilesCount > 10)
      recs += (("RUN OPTIMIZE", s"${m.smallFilesCount} small files detected"))
    if (m.isSkewed)
      recs += (("REBALANCE PARTITIONS", f"Partition skew ${m.skewnessMax}%.2f exceeds threshold"))
    if (m.hasOrphanFiles)
      recs += (("CLEAN ORPHAN FILES", s"${m.orphanFilesCount} orphan files found"))
    recs.result().toDF("action", "reason")
  }
}
