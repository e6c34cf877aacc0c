package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.deltalog.{DeltaFixtureWriter, DeltaLog}

/** Maintenance operations the health analysis recommends (H12) — the engine
  * can EXECUTE them, not just suggest:
  *  - OPTIMIZE: bin-pack small files (delegates to the commit-writing
  *    compactor)
  *  - VACUUM: physically delete files no longer referenced by the log,
  *    honoring a retention window
  *  - CHECKPOINT: write a parquet checkpoint so expired JSON commits can be
  *    dropped (and replay cost stays bounded as the log grows)
  */
object Maintenance {

  /** OPTIMIZE compact (S10 as an engine capability). */
  def optimize(spark: SparkSession, tablePath: String): Unit =
    DeltaFixtureWriter.compact(spark, tablePath)

  /** VACUUM: delete on-disk data files that are not in the active manifest
    * and are older than `retainMs` (by filesystem modification time).
    * Returns the deleted-file frame (path, size). `dryRun` lists without
    * deleting. Logs a VACUUM commit like deltalake does. */
  def vacuum(spark: SparkSession, tablePath: String,
             retainMs: Long = 7L * 24 * 3600 * 1000,
             dryRun: Boolean = false): DataFrame = {
    val snap = DeltaLog.snapshot(spark, tablePath)
    val folder = StorageAnalyzer.folderFiles(spark, tablePath)
    val orphans = StorageAnalyzer.orphanFiles(folder, snap.activeFilePaths)
    val cutoff = System.currentTimeMillis() - retainMs
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val candidates = orphans.select(col("file_key"), col("size")).collect()
      .filter { r =>
        val p = new Path(r.getString(0))
        fs.exists(p) && fs.getFileStatus(p).getModificationTime < cutoff
      }
    if (!dryRun) {
      candidates.foreach(r => fs.delete(new Path(r.getString(0)), false))
      DeltaFixtureWriter.logCommit(tablePath, snap.version + 1, "VACUUM",
        Seq("retentionCheck" -> "false",
            "numFilesDeleted" -> candidates.length.toString))
    }
    snap.unpersist()
    import spark.implicits._
    candidates.map(r => (r.getString(0), r.getLong(1))).toSeq
      .toDF("path", "size")
  }

  /** Write a parquet checkpoint of the current snapshot state (active adds
    * + latest metaData + protocol) and update `_last_checkpoint`. After
    * this, JSON commits <= the checkpoint version are no longer needed for
    * replay. */
  def checkpoint(spark: SparkSession, tablePath: String): Long = {
    val snap = DeltaLog.snapshot(spark, tablePath)
    val v = snap.version
    import spark.implicits._
    val adds = snap.activeFiles.select(
      struct(
        col("path"), col("size"), col("partitionValues"),
        col("modificationTime"), lit(true).as("dataChange"),
        lit(null).cast("string").as("stats")).as("add"))
    val meta = snap.actions.where(col("metaData").isNotNull)
      .orderBy(col("version").desc).limit(1).select(col("metaData"))
      .withColumn("add", lit(null).cast(adds.schema("add").dataType))
      .select(col("add"), col("metaData"))
    val ckpt = adds
      .withColumn("metaData", lit(null).cast(meta.schema("metaData").dataType))
      .unionByName(meta)
    val dir = DeltaLog.logDir(tablePath)
    ckpt.coalesce(1).write.mode("overwrite")
      .parquet(f"$dir/$v%020d.checkpoint.parquet")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_last_checkpoint"),
      s"""{"version":$v,"size":${snap.activeFiles.count() + 1}}""")
    snap.unpersist()
    v
  }
}
