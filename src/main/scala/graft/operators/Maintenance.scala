package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

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

  /** OPTIMIZE (S10 as an engine capability) — DISTRIBUTED small-file
    * compaction, the scale-path replacement for the fixture compactor
    * ([[graft.deltalog.DeltaFixtureWriter.compact]], which stays
    * fixture/test-scope: it collects paths and java.io-walks the table dir).
    *
    * Semantics: per Hive partition, active files smaller than
    * `smallFileBytes` (default targetFileBytes/2) are bin-packed into
    * ~targetFileBytes outputs; partitions with fewer than two small files
    * are left untouched (nothing to gain), as are files already at target
    * size — real OPTIMIZE never rewrites the whole table.
    *
    * Scale shape — no driver file enumeration anywhere:
    *  - selection: a filter + aggregation over the DISTRIBUTED active-file
    *    manifest (never collected; the partition key is the sorted-entry
    *    JSON of `partitionValues`, so map internal order can't split a
    *    partition);
    *  - bin assignment: ceil(partitionSmallBytes / target) bins per
    *    partition, files hashed to bins — a join of the manifest against
    *    per-partition bin counts, all distributed. Bins are size CEILINGS,
    *    approximately honored: two bins that hash-collide into one shuffle
    *    task (or get AQE-coalesced) merge into one larger output — benign
    *    over-packing, never a correctness issue;
    *  - rewrite: ONE scan of the selected files' rows (the snapshot's
    *    manifest-joined read), shuffled by (partition cols, bin) so each
    *    task writes whole output files, appended with partitionBy;
    *  - discovery: distributed before/after listings
    *    ([[StorageAnalyzer.folderFilesDistributed]]) anti-joined — only the
    *    NEW file entries (one per output bin) reach the driver;
    *  - commit: removes stream through `toLocalIterator` into the
    *    line-streaming commit writer — a million-file remove list never
    *    exists as a driver collection.
    *
    * Single-writer assumption, like every commit writer here (no
    * concurrent-commit arbitration — that is a transaction-protocol
    * concern, not a compaction one). */
  def optimize(spark: SparkSession, tablePath: String,
               targetFileBytes: Long = 128L * 1024 * 1024,
               smallFileBytes: Long = 0L): Unit = {
    import spark.implicits._
    val smallThr = if (smallFileBytes > 0L) smallFileBytes else targetFileBytes / 2
    val snap = DeltaLog.snapshot(spark, tablePath)
    val logTable = DeltaLog.stripSchemeStr(tablePath)
    val partCols = snap.partitionColumns
    def noop(): Unit =
      DeltaFixtureWriter.logCommit(logTable, snap.version + 1, "OPTIMIZE",
        Seq("predicate" -> "[]", "targetFileBytes" -> targetFileBytes.toString))
    try {
      snap.dataWithFile match {
        case None => noop()
        case Some(rows) =>
          val chosen = optimizeSelection(snap, targetFileBytes, smallThr).cache()
          try {
            if (chosen.isEmpty) noop()
            else {
              val qualified = snap.qualifiedTablePath
              val before = StorageAnalyzer
                .folderFilesDistributed(spark, qualified).cache()
              before.count() // pin the pre-write listing before writing
              val toRewrite = rows
                .join(chosen.select(col("path").as("__file"), col("bin")), "__file")
              val shuffleKeys = partCols.map(col) :+ col("bin")
              val w = toRewrite.repartition(shuffleKeys: _*)
                .drop("__file", "bin")
                .write.mode("append")
              (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w)
                .parquet(qualified)
              val added = StorageAnalyzer.folderFilesDistributed(spark, qualified)
                .join(before.select(col("path")), Seq("path"), "left_anti")
                .select(DeltaLog.relativize(col("path"), qualified).as("path"),
                  col("size"))
                .as[(String, Long)]
                .collect() // one entry per output bin — small by construction
              before.unpersist()
              DeltaFixtureWriter.writeCommitStream(logTable, snap.version + 1,
                "OPTIMIZE",
                Seq("predicate" -> "[]",
                    "targetFileBytes" -> targetFileBytes.toString),
                adds = added.sortBy(_._1).iterator,
                removes = chosen.select(col("path")).orderBy(col("path"))
                  .as[String].toLocalIterator().asScala,
                partitionBy = partCols)
            }
          } finally { chosen.unpersist(); () }
      }
    } finally snap.unpersist()
  }

  /** OPTIMIZE ZORDER BY — multi-dimensional clustering rewrite (the Delta
    * paper's Z-order compaction, Armbrust et al. VLDB'20 §4.3; the
    * reference's health report recommends OPTIMIZE, this executes the
    * clustered flavor). All active rows are rewritten ordered by a Z-value
    * interleaving the bits of up to three cluster columns, so a file's
    * min/max range is narrow in EVERY clustered dimension and a predicate
    * on ANY of them prunes ~N^((d−1)/d) of the files — a linear sort gives
    * that for the leading column only.
    *
    * Mapping to bits: each column is scaled to a 16-bit cell index by
    * equal-width `width_bucket` over its global min/max (one aggregate job;
    * the same fixed-width-representation approach Iceberg's z-order
    * transform takes). Equal-width is skew-sensitive — a column with a few
    * giant outliers collapses most rows into few cells; pass
    * `rankBased = true` to switch to equi-depth cells (256 approx-quantile
    * buckets per column via [[rankCell]]'s codegen comparison tree), which
    * spread rows evenly whatever the value distribution at the cost of one
    * extra sketch pass. Numeric/date/timestamp cluster columns only.
    *
    * Scale shape: one aggregate for min/max, one scan of the active rows,
    * `repartitionByRange` on (hive partition cols, z) — distributed
    * boundary sampling, no global sort on a single reducer — with
    * `sortWithinPartitions` so every output file covers a contiguous
    * Z-range. Bit interleave is a constant-shift expression tree inside
    * whole-stage codegen. Commit flow mirrors [[optimize]]: distributed
    * before/after listings diffed for the adds, removes streamed, never a
    * driver file enumeration. Single-writer assumption as everywhere. */
  def zorder(spark: SparkSession, tablePath: String, zorderCols: Seq[String],
             targetFileBytes: Long = 128L * 1024 * 1024,
             rankBased: Boolean = false): Unit = {
    import spark.implicits._
    require(zorderCols.nonEmpty && zorderCols.size <= 3,
      s"zorder takes 1-3 columns, got $zorderCols")
    val snap = DeltaLog.snapshot(spark, tablePath)
    val logTable = DeltaLog.stripSchemeStr(tablePath)
    val partCols = snap.partitionColumns
    require(zorderCols.forall(c => !partCols.contains(c)),
      s"zorder columns must be data columns, not hive partition columns")
    val zParams = Seq(
      "zOrderBy" -> zorderCols.mkString("[\"", "\",\"", "\"]"),
      "targetFileBytes" -> targetFileBytes.toString)
    try {
      snap.dataWithFile match {
        case None =>
          DeltaFixtureWriter.logCommit(logTable, snap.version + 1, "OPTIMIZE",
            zParams)
        case Some(rows) =>
          val qualified = snap.qualifiedTablePath
          // one job: global min/max per cluster column + total active bytes
          val nOut = math.max(1L, math.ceil(
            snap.activeFiles.agg(coalesce(sum($"size"), lit(0L)))
              .as[Long].first().toDouble / targetFileBytes).toLong).toInt
          val z =
            if (rankBased) {
              // equi-depth cells: 255 approx-quantile boundaries per column
              // (one GK-sketch pass over the active rows, driver payload =
              // 255 doubles/col) — immune to outlier-stretched ranges
              val probs = (1 until 256).map(_ / 256.0).toArray
              val doubled = rows.select(zorderCols.map(c =>
                col(c).cast("double").as(c)): _*)
              val bounds = doubled.stat.approxQuantile(
                zorderCols.toArray, probs, 0.001)
              zValue(zorderCols.zipWithIndex.map { case (c, i) =>
                rankCell(col(c).cast("double"), bounds(i))
              }, bits = 8)
            } else {
              val mmCols = zorderCols.flatMap(c => Seq(
                min(col(c).cast("double")).as(s"mn_$c"),
                max(col(c).cast("double")).as(s"mx_$c")))
              val mm = rows.agg(mmCols.head, mmCols.tail: _*).first()
              zValue(zorderCols.zipWithIndex.map { case (c, i) =>
                // an all-null cluster column aggregates to NULL min/max —
                // Row.getDouble would NPE, so land the column in cell 0
                // directly (same cell bucket16 gives constant columns)
                if (mm.isNullAt(2 * i) || mm.isNullAt(2 * i + 1)) lit(0L)
                else bucket16(col(c), mm.getDouble(2 * i), mm.getDouble(2 * i + 1))
              })
            }
          val before = StorageAnalyzer
            .folderFilesDistributed(spark, qualified).cache()
          before.count() // pin the pre-write listing before writing
          val shuffleKeys = partCols.map(col) :+ col("__z")
          val w = rows.drop("__file").withColumn("__z", z)
            .repartitionByRange(nOut, shuffleKeys: _*)
            .sortWithinPartitions(shuffleKeys: _*)
            .drop("__z")
            .write.mode("append")
          (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w)
            .parquet(qualified)
          val added = StorageAnalyzer.folderFilesDistributed(spark, qualified)
            .join(before.select(col("path")), Seq("path"), "left_anti")
            .select(DeltaLog.relativize(col("path"), qualified).as("path"),
              col("size"))
            .as[(String, Long)]
            .collect() // one entry per output file — nOut, small
          before.unpersist()
          DeltaFixtureWriter.writeCommitStream(logTable, snap.version + 1,
            "OPTIMIZE", zParams,
            adds = added.sortBy(_._1).iterator,
            removes = snap.activeFiles.select(col("path"))
              .orderBy(col("path")).as[String].toLocalIterator().asScala,
            partitionBy = partCols)
      }
    } finally snap.unpersist()
  }

  /** Equal-width 16-bit cell index of `c` over [mn, mx]; constant columns
    * (or all-null) land in cell 0. width_bucket maps v<mn→0, v≥mx→n+1, so
    * the result is clamped back into [0, 65535]. */
  private[graft] def bucket16(c: Column, mn: Double, mx: Double): Column =
    if (!(mx > mn)) lit(0L)  // also covers NaN min/max (NaN-valued column;
                             // all-null min/max is NULL, guarded by caller)
    else least(greatest(
      width_bucket(c.cast("double"), lit(mn), lit(mx), lit(65536)) - 1,
      lit(0L)), lit(65535L))

  /** Equi-depth cell of `c` given ASCENDING quantile boundaries: the cell
    * is the count of boundaries strictly below c (a value equal to a
    * boundary belongs to the cell on its LEFT), computed by a BALANCED
    * comparison tree
    * (depth ⌈log₂ cells⌉ — 8 comparisons for 256 cells) generated as nested
    * `when`s, so the mapping stays inside whole-stage codegen instead of an
    * interpreted 255-element higher-order-function scan. Nulls land in the
    * top cell (they sort last in the rewrite either way). */
  private[graft] def rankCell(c: Column, bounds: Array[Double]): Column = {
    def tree(lo: Int, hi: Int): Column =
      if (lo == hi) lit(lo.toLong)
      else {
        val mid = (lo + hi) / 2
        when(c <= bounds(mid), tree(lo, mid)).otherwise(tree(mid + 1, hi))
      }
    tree(0, bounds.length)
  }

  /** Interleave the low 16 bits of up to four cell indices: bit j of
    * column i lands at position j·k + i — the Morton / Z-order curve.
    * Constant shifts only, so the whole tree stays codegen-friendly. */
  private[graft] def zValue(cells: Seq[Column], bits: Int = 16): Column = {
    val k = cells.size
    val terms = for (j <- 0 until bits; i <- 0 until k) yield
      shiftleft(shiftright(cells(i), j).bitwiseAND(lit(1L)), j * k + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** The DISTRIBUTED file-selection + bin-assignment frame of [[optimize]]:
    * (path, bin) for every small file in a ≥2-small-file partition. Exposed
    * separately so PlanAudit can verify the plan contains no driver file
    * enumeration (it is manifest aggregations + a join, end to end). */
  private[graft] def optimizeSelection(snap: graft.deltalog.DeltaSnapshot,
                                       targetFileBytes: Long,
                                       smallThr: Long): DataFrame = {
    val pkey = to_json(array_sort(map_entries(col("partitionValues"))))
    val small = snap.activeFiles
      .where(col("size") < smallThr)
      .select(col("path"), col("size"), pkey.as("pkey"))
    val bins = small.groupBy(col("pkey"))
      .agg(count(lit(1)).as("n"), sum(col("size")).as("bytes"))
      .where(col("n") >= 2)
      .select(col("pkey"),
        greatest(lit(1L), ceil(col("bytes").cast("double") / targetFileBytes))
          .cast("int").as("n_bins"))
    small.join(bins, "pkey")
      .select(col("path"),
        pmod(xxhash64(col("path")), col("n_bins")).cast("int").as("bin"))
  }

  /** VACUUM: delete on-disk data files that are not in the active manifest
    * and are older than `retainMs` (by filesystem modification time).
    * Returns the deleted-file frame (path, size). `dryRun` lists without
    * deleting. Logs a VACUUM commit like deltalake does.
    *
    * Scale shape: the folder listing is the distributed per-subtree walk
    * and the per-file stat + delete run inside `mapPartitions` on the
    * executors — at object-store scale both the LIST and the DELETE calls
    * are the bottleneck and must parallelize; only the (path, size) result
    * rows reach the driver. */
  def vacuum(spark: SparkSession, tablePath: String,
             retainMs: Long = 7L * 24 * 3600 * 1000,
             dryRun: Boolean = false): DataFrame = {
    import spark.implicits._
    val snap = DeltaLog.snapshot(spark, tablePath)
    val folder = StorageAnalyzer.folderFilesDistributed(spark, tablePath)
    val orphans = StorageAnalyzer.orphanFiles(folder, snap.activeFilePaths)
    val cutoff = System.currentTimeMillis() - retainMs
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // one row PER candidate with an outcome flag — never a filter on the
    // delete result: a task re-attempt (retry/speculation) re-runs the
    // lambda, sees exists()=false for files its first attempt already
    // removed, and a filter would silently drop those rows, undercounting
    // numFilesDeleted in the VACUUM commit
    val processed: Array[(String, Long, String)] = orphans
      .select(col("file_key"), col("size")).as[(String, Long)]
      .mapPartitions { it =>
        it.map { case (p, sz) =>
          val path = new Path(p)
          val pfs = path.getFileSystem(conf.value)
          val status =
            if (!pfs.exists(path)) "missing" // gone already — a prior attempt of this run (or an external actor) removed it
            else if (pfs.getFileStatus(path).getModificationTime >= cutoff) "retained"
            else if (dryRun) "deleted"
            // a false delete() that leaves the file in place is a real
            // failure (permissions, lease); a false delete() on a vanished
            // file is just a lost race with a concurrent attempt
            else if (pfs.delete(path, false) || !pfs.exists(path)) "deleted"
            else "failed"
          (p, sz, status)
        }
      }
      .collect()   // materializes (and on !dryRun, performs) the deletes
    // "missing" counts as removed-by-this-run: the only way a listed orphan
    // is already gone mid-job is an earlier attempt's delete
    val gone = processed.filter(t => t._3 == "deleted" || t._3 == "missing")
    if (!dryRun) {
      // logCommit is java.nio-based (fixture scope): give it a plain local
      // path even when the caller addressed the table by file: URI
      DeltaFixtureWriter.logCommit(DeltaLog.stripSchemeStr(tablePath),
        snap.version + 1, "VACUUM",
        Seq("retentionCheck" -> "false",
            "numFilesDeleted" -> gone.length.toString))
    }
    snap.unpersist()
    gone.toSeq.map { case (p, s, _) => (p, s) }.toDF("path", "size")
  }

  /** RESTORE TABLE TO VERSION — Delta's `RESTORE` as a METADATA-ONLY
    * commit: the new version's active file set becomes exactly the target
    * snapshot's (remove every currently-active file absent at the target,
    * re-add every target file not currently active). No data files are
    * rewritten or copied — like OPTIMIZE's commit, only the log moves —
    * so restoring a 100-TB table costs two manifest anti-joins plus one
    * streamed commit. Fails fast (before writing anything) if a file to
    * re-add has been physically removed by [[vacuum]] — Delta's own
    * restore-after-vacuum failure contract. Restoring to the current
    * version records a no-op RESTORE commit. A restore across a SCHEMA
    * change additionally rolls the metaData authority back to the target
    * snapshot's schema — that path delegates to the fixture-scope
    * [[DeltaFixtureWriter.restore]] (which writes the metaData action),
    * while the common same-schema case streams the commit with no driver
    * file enumeration — the [[optimize]]-vs-`compact` split applied to
    * restore.
    *
    * Cites delta-io/delta RESTORE semantics (PROTOCOL.md; the reference
    * delta-lake-health engine itself has no restore, so this extends the
    * maintenance family alongside MERGE/VACUUM/ZORDER/CDF). */
  def restore(spark: SparkSession, tablePath: String, toVersion: Long): Unit = {
    import spark.implicits._
    val cur = DeltaLog.snapshot(spark, tablePath)
    try {
      require(toVersion >= 0 && toVersion <= cur.version,
        s"restore target $toVersion outside [0, ${cur.version}]")
      val logTable = DeltaLog.stripSchemeStr(tablePath)
      if (toVersion == cur.version) {
        DeltaFixtureWriter.logCommit(logTable, cur.version + 1, "RESTORE",
          Seq("version" -> toVersion.toString, "numRestoredFiles" -> "0",
            "numRemovedFiles" -> "0"))
        return
      }
      val tgt = DeltaLog.snapshotAt(spark, tablePath, toVersion)
      if (cur.tableSchema != tgt.tableSchema) {
        // schema rollback: the metaData-writing fixture path
        tgt.unpersist(); cur.unpersist()
        DeltaFixtureWriter.restore(spark, logTable, toVersion)
        return
      }
      try {
        val curPaths = cur.activeFiles.select(col("path"))
        val tgtFiles = tgt.activeFiles.select(col("path"), col("size"))
        val adds = tgtFiles.join(curPaths, Seq("path"), "left_anti").cache()
        val removes = curPaths
          .join(tgtFiles.select(col("path")), Seq("path"), "left_anti").cache()
        try {
          val nAdds = adds.count()
          val nRemoves = removes.count()
          // vacuum check: every file to re-add must still exist on disk
          val qualified = cur.qualifiedTablePath
          val onDisk = StorageAnalyzer.folderFilesDistributed(spark, qualified)
            .select(DeltaLog.relativize(col("path"), qualified).as("path"))
          val missing = adds.select(col("path"))
            .join(onDisk, Seq("path"), "left_anti")
            .limit(5).as[String].collect()
          require(missing.isEmpty,
            s"restore to $toVersion impossible: ${missing.length}+ target " +
              s"files no longer on disk (vacuumed?), e.g. ${missing.headOption.getOrElse("")}")
          DeltaFixtureWriter.writeCommitStream(logTable, cur.version + 1,
            "RESTORE",
            Seq("version" -> toVersion.toString,
              "numRestoredFiles" -> nAdds.toString,
              "numRemovedFiles" -> nRemoves.toString),
            adds = adds.orderBy(col("path")).as[(String, Long)]
              .toLocalIterator().asScala,
            removes = removes.orderBy(col("path")).as[String]
              .toLocalIterator().asScala,
            partitionBy = cur.partitionColumns)
        } finally { adds.unpersist(); removes.unpersist(); () }
      } finally tgt.unpersist()
    } finally cur.unpersist()
  }

  /** Write a parquet checkpoint of the current snapshot state — active adds
    * + latest metaData + latest protocol, as the SINGLE file
    * `NNN.checkpoint.parquet` the classic Delta checkpoint layout requires
    * (external readers like delta-rs/delta-spark expect one file, not a
    * Spark part-file directory) — and update `_last_checkpoint`. After this,
    * JSON commits <= the checkpoint version are no longer needed for replay,
    * and protocol/metaData survive their cleanup. */
  def checkpoint(spark: SparkSession, tablePath: String): Long = {
    val snap = DeltaLog.snapshot(spark, tablePath)
    val v = snap.version
    val addType = DeltaLog.actionSchema("add").dataType
    val metaType = DeltaLog.actionSchema("metaData").dataType
    val protoType = DeltaLog.actionSchema("protocol").dataType
    def widen(df: DataFrame): DataFrame = {
      val withAdd = if (df.columns.contains("add")) df
        else df.withColumn("add", lit(null).cast(addType))
      val withMeta = if (withAdd.columns.contains("metaData")) withAdd
        else withAdd.withColumn("metaData", lit(null).cast(metaType))
      val full = if (withMeta.columns.contains("protocol")) withMeta
        else withMeta.withColumn("protocol", lit(null).cast(protoType))
      full.select(col("add"), col("metaData"), col("protocol"))
    }
    val adds = widen(snap.activeFiles.select(
      struct(
        col("path"), col("size"), col("partitionValues"),
        col("modificationTime"), lit(true).as("dataChange"),
        lit(null).cast("string").as("stats")).as("add")))
    val meta = widen(snap.actions.where(col("metaData").isNotNull)
      .orderBy(col("version").desc).limit(1).select(col("metaData")))
    val loggedProto = snap.actions.where(col("protocol").isNotNull)
      .orderBy(col("version").desc).limit(1).select(col("protocol"))
    // tables whose log predates protocol emission still get a valid
    // checkpoint: default to the minimal classic protocol (1, 2)
    val proto = widen(
      if (loggedProto.isEmpty)
        spark.range(1).select(
          struct(lit(1).as("minReaderVersion"), lit(2).as("minWriterVersion"))
            .cast(protoType).as("protocol"))
      else loggedProto)
    val ckpt = adds.unionByName(meta).unionByName(proto)
    val dir = DeltaLog.logDir(tablePath)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir, f".$v%020d.checkpoint.tmp")
    ckpt.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = fs.listStatus(tmp).map(_.getPath)
      .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"checkpoint write produced no part file under $tmp"))
    // count the actual checkpoint rows BEFORE any destructive move: a table
    // whose log never emitted metaData would otherwise overstate `size`
    val ckptRows = snap.activeFiles.count() + meta.count() + 1 // adds + metaData(0|1) + protocol
    val dest = new Path(dir, f"$v%020d.checkpoint.parquet")
    if (fs.exists(dest)) fs.delete(dest, true)
    require(fs.rename(part, dest), s"checkpoint rename failed: $part -> $dest")
    fs.delete(tmp, true)
    // _last_checkpoint only after the checkpoint file verifiably exists, and
    // through the Hadoop fs handle so schemed/remote table paths resolve
    // (java.nio on an unstripped "file:..." dir string would throw)
    val lcOut = fs.create(new Path(dir, "_last_checkpoint"), true)
    try lcOut.write(
      s"""{"version":$v,"size":$ckptRows}""".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally lcOut.close()
    snap.unpersist()
    v
  }
}
