package graft.health

/** Health status bands (base_analyzer.py:7-14,92-97). */
sealed abstract class HealthStatus(val value: String)
object HealthStatus {
  case object Healthy extends HealthStatus("healthy")
  case object Unhealthy extends HealthStatus("unhealthy")
  case object VeryUnhealthy extends HealthStatus("very_unhealthy")
  case object Unknown extends HealthStatus("unknown")

  def ofScore(score: Double): HealthStatus =
    if (score >= 80) Healthy else if (score >= 50) Unhealthy else VeryUnhealthy

  def fromString(s: String): HealthStatus = s match {
    case "healthy" => Healthy
    case "unhealthy" => Unhealthy
    case "very_unhealthy" => VeryUnhealthy
    case _ => Unknown
  }
}

/** Skew metrics bundle (delta_python_analyzer.py:80-86), flattened from the
  * reference's heterogeneous dict into a typed record.
  *
  * `recordsPerPartition` is the reference's per-partition dict CAPPED to the
  * top-N heaviest partitions (see SkewAnalyzer.analyze): a high-cardinality
  * partition column must not materialize millions of map entries on the
  * driver. The true cardinality is `partitionCount`, and the exact extremes
  * survive the cap in `minPartition`/`maxPartition` (key, count). */
final case class SkewMetrics(
    partitionColumns: Seq[String] = Seq.empty,
    skewnessMax: Double = 0.0,
    skewnessAverage: Double = 0.0,
    isSkewed: Boolean = false,
    partitionCount: Long = 0L,
    recordsPerPartition: Map[String, Long] = Map.empty,
    minPartition: Option[(String, Long)] = None,
    maxPartition: Option[(String, Long)] = None)

/** Typed metrics record — field-for-field the reference's pydantic
  * `DeltaAnalyzerMetrics` (base_analyzer.py:17-50). Counters are Long
  * (sizes/record counts overflow Int at the 100 TB design point). The
  * reference's dead duplicate field `has_orfan_files` (base_analyzer.py:29,
  * a typo superseded by `has_orphan_files`) is intentionally not carried. */
final case class DeltaAnalyzerMetrics(
    versionCount: Long = 0L,
    partitionCount: Long = 0L,
    recordCount: Long = 0L,
    isSkewed: Boolean = false,
    skewnessMax: Double = 0.0,
    skewnessAverage: Double = 0.0,
    isCompacted: Boolean = false,
    numberOfWrites: Long = 0L,
    numberOfDeletes: Long = 0L,
    numberOfOptimizes: Long = 0L,
    tableSizeBytes: Long = 0L,
    folderSizeBytes: Long = 0L,
    needsVacuum: Boolean = false,
    hasOrphanFiles: Boolean = false,
    needsOptimize: Boolean = false,
    smallFilesCount: Long = 0L,
    avgFileSizeBytes: Long = 0L,
    partitionSkewness: Option[Double] = None,
    dataFileCount: Long = 0L,
    orphanFilesCount: Long = 0L,
    filesNeedingVacuum: Long = 0L,
    fileSizeEfficiency: Option[Double] = None,
    storageEfficiency: Option[Double] = None,
    tablePath: String = "",
    totalFileCount: Long = 0L,
    skewMetrics: Option[SkewMetrics] = None,
    healthScore: Option[Double] = None,
    healthStatus: Option[String] = None) {

  /** Score + status, exact port of base_analyzer.py:52-101. */
  def withHealthScore: DeltaAnalyzerMetrics = {
    val (score, status) = HealthScore.compute(this)
    copy(healthScore = Some(score), healthStatus = Some(status.value))
  }
}

/** The four-component health calculus (base_analyzer.py:52-101). Pure Scala
  * on the one-row metrics record — bit-exact with the reference and trivially
  * unit-testable; a Column/SQL form lives in SparkEntry's oracle queries. */
object HealthScore {

  final case class Components(
      dataFreshness: Double, maintenance: Double,
      dataBalance: Double, storageEfficiency: Double) {
    def total: Double = dataFreshness + maintenance + dataBalance + storageEfficiency
  }

  def components(m: DeltaAnalyzerMetrics): Components = {
    // data_freshness: min(writes/10 * 25, 25)      (base_analyzer.py:61-64)
    val freshness = math.min(m.numberOfWrites / 10.0 * 25.0, 25.0)
    // maintenance: min(optimizes/max(writes,1) * 10 * 12.5, 12.5)
    //              + (needs_vacuum ? 0 : 12.5)     (base_analyzer.py:66-73)
    val optimizeRatio = m.numberOfOptimizes.toDouble / math.max(m.numberOfWrites, 1L)
    val optimizeScore = math.min(optimizeRatio * 10.0 * 12.5, 12.5)
    val vacuumScore = if (m.needsVacuum) 0.0 else 12.5
    val maintenance = optimizeScore + vacuumScore
    // data_balance: 25 - min(skew*100, 25); skew prefers skew_metrics value
    //                                                (base_analyzer.py:75-79)
    val skewness = m.skewMetrics.map(_.skewnessMax).getOrElse(m.skewnessMax)
    val balance = 25.0 - math.min(skewness * 100.0, 25.0)
    // storage: 25 - min(small/max(writes*2,1)*12.5, 12.5)
    //             - (has_orphan ? 12.5 : 0)         (base_analyzer.py:81-88)
    val smallRatio = m.smallFilesCount.toDouble / math.max(m.numberOfWrites * 2L, 1L)
    val smallPenalty = math.min(smallRatio * 12.5, 12.5)
    val orphanPenalty = if (m.hasOrphanFiles) 12.5 else 0.0
    val storage = 25.0 - smallPenalty - orphanPenalty
    Components(freshness, maintenance, balance, storage)
  }

  def compute(m: DeltaAnalyzerMetrics): (Double, HealthStatus) = {
    val score = components(m).total
    (score, HealthStatus.ofScore(score))
  }
}

/** HealthResult (base_analyzer.py:151-154): int score + status + metrics. */
final case class HealthResult(
    healthMetric: Int,
    healthStatus: String,
    metrics: DeltaAnalyzerMetrics)

/** Analysis thresholds with reference defaults (delta_analyzer.py:55-59).
  * `smallFileSizeMb = None` means "use avg file size as the threshold"
  * (delta_python_analyzer.py:238-241). */
final case class Thresholds(
    skewThreshold: Double = 0.1,
    vacuumSizeRatioThreshold: Double = 0.7,
    orphanFileRatioThreshold: Double = 0.8,
    smallFileSizeMb: Option[Double] = Some(10.0),
    smallFileRatioThreshold: Double = 0.3)
