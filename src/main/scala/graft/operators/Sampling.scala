package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting/sampling for training pipelines.
  *
  * The split assignment must be a pure function of the RECORD ID — never of
  * partition layout, row order, or an RNG stream — so that (a) re-running
  * the pipeline on a re-partitioned/grown corpus keeps every existing row's
  * split stable (no train/test leakage across runs), and (b) any engine can
  * recompute the assignment for audit. `randomSplit` fails both: it samples
  * per-partition and reshuffles assignments whenever the layout changes.
  */
object Sampling {

  private val HexChars: Array[String] = "0123456789abcdef".split("").filter(_.nonEmpty)

  /** Engine-portable deterministic bucket in [0, 256): the first two hex
    * chars of md5(id) — md5 of the decimal string is identical in every SQL
    * engine (unlike xxhash64/crc32 which are Spark-specific), so the
    * assignment is reproducible for audits in DuckDB/Trino/anything. */
  def hashBucket(id: Column): Column = {
    val m = md5(id.cast("string"))
    val hexArr = lit(HexChars)
    ((array_position(hexArr, substring(m, 1, 1)) - 1) * 16 +
      (array_position(hexArr, substring(m, 2, 1)) - 1)).cast("int")
  }

  /** Assign train/val/test by hash bucket: bucket < 256·trainPct → train,
    * < 256·(trainPct+valPct) → val, else test. Adds `bucket` and `split`
    * columns; one narrow projection, no shuffle, no RNG. */
  def hashSplit(df: DataFrame, idCol: String,
                trainPct: Double = 0.8, valPct: Double = 0.1): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 1.0,
      s"bad split fractions: train=$trainPct val=$valPct")
    val trainCut = (256 * trainPct).toInt
    val valCut = (256 * (trainPct + valPct)).toInt
    val b = hashBucket(col(idCol))
    df.withColumn("bucket", b)
      .withColumn("split",
        when(col("bucket") < trainCut, "train")
          .when(col("bucket") < valCut, "val")
          .otherwise("test"))
  }

  /** Deterministic ~fraction sample: keep rows whose bucket falls under
    * 256·fraction. Same id ⇒ same decision on every run and engine. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1.0, s"bad fraction $fraction")
    df.where(hashBucket(col(idCol)) < (256 * fraction).toInt)
  }

  /** STRATIFIED deterministic sample: per-stratum keep fractions (e.g. a
    * language-balance recipe downsampling the dominant language), keyed by
    * the same engine-portable md5 bucket as [[hashSample]] so every
    * stratum's decision is a pure function of the record id. Strata absent
    * from `rates` keep `defaultRate`. This is the data-mixing primitive of
    * an LLM pretraining pipeline ("keep 30% of en, all of the rest"): one
    * narrow filter, no shuffle, no RNG, stable under corpus growth. */
  def stratifiedHashSample(df: DataFrame, idCol: String, strataCol: String,
                           rates: Map[String, Double],
                           defaultRate: Double = 1.0): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0 && r <= 1.0, s"bad fraction $r"))
    val cut = rates.foldLeft(lit((256 * defaultRate).toInt)) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit((256 * rate).toInt)).otherwise(acc)
    }
    df.where(hashBucket(col(idCol)) < cut)
  }

  /** Per-group quota cap ("at most n docs per source/domain") with a
    * deterministic, id-hash-ordered priority — the standard anti-domination
    * guard of web-corpus curation (an over-crawled domain must not flood
    * the mix). Hash priority, not first-n-ids: the kept subset is an
    * unbiased sample of each group, stable under reruns and corpus
    * repartitioning. Ties (identical bucket) break on the id itself.
    *
    * Scale shape: TWO-STAGE top-quota. A window partition cannot be split
    * by AQE — every row of a group key must reach one task — so a single
    * global window over an over-crawled domain would sort-and-buffer the
    * whole group on one executor. Stage 1 therefore pre-reduces per
    * (group, arrival-partition): a salted window keeps at most `quota` rows
    * of each group per input partition (any row beaten by `quota` rows of
    * its own partition slice cannot be in the global top-quota), shrinking
    * the hot group to ≤ quota × numInputPartitions rows before stage 2's
    * global window ranks the survivors. The final ranks 1..quota are
    * IDENTICAL to the single-window formulation — every globally-kept row
    * survives stage 1, and all rows ordered before it do too — and the
    * output stays layout-independent even though the salt is the physical
    * partition id. Adds `priority` (1-based rank within the group). */
  def quotaPerGroup(df: DataFrame, idCol: String, groupCol: String,
                    quota: Int): DataFrame = {
    require(quota > 0, s"bad quota $quota")
    val ord = Seq(hashBucket(col(idCol)).asc, col(idCol).asc)
    val partial = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol), col("_graft_salt"))
      .orderBy(ord: _*)
    val global = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(ord: _*)
    df.withColumn("_graft_salt", spark_partition_id())
      .withColumn("_graft_partial", row_number().over(partial))
      .where(col("_graft_partial") <= quota)
      .drop("_graft_salt", "_graft_partial")
      .withColumn("priority", row_number().over(global).cast("long"))
      .where(col("priority") <= quota)
  }
}
