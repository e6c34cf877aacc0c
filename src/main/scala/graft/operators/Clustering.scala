package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

import graft.functions.exprs

/** Deterministic relational k-means and SemDeDup-style semantic
  * deduplication over an embedding column.
  *
  * [[Similarity]] already fits a KMeans coarse quantizer for IVF, but that
  * model lives inside Spark ML — fine for candidate routing, opaque to a
  * value-level oracle. This implementation is Lloyd's algorithm as plain
  * relational algebra: assignment is a broadcast-centroid scan + argmin
  * (one `min(struct)` aggregation), the update step is a per-(cell,
  * dimension) mean, and the only driver-side state is the k×dim centroid
  * table itself — the natural broadcast model at any corpus scale. Every
  * arithmetic step is portable (strict left-to-right kernel sums, means and
  * distances rounded to 9 decimals), so a SQL engine replays the whole fit
  * bit-for-bit: clustering becomes value-checkable, not just
  * behavior-checkable.
  *
  * Determinism: initial centroids are the id-ordered corpus prefix (the
  * same trick as [[Similarity]]'s coarse trainer — a bare limit(k) would
  * depend on partition layout), argmin ties break on the lower cell id,
  * and an empty cell keeps its previous centroid.
  */
object Clustering {

  /** Fit k centroids with `iters` Lloyd iterations. Returns (cell,
    * centroid) with centroid components as exact-integer-sum means over
    * 1e-6-quantized inputs, rounded to 9 decimals — bit-reproducible
    * across engines, runs, and partition layouts. Driver state is k×dim
    * doubles, nothing else leaves the cluster. */
  def kmeansFit(df: DataFrame, idCol: String, vecCol: String,
                k: Int, iters: Int): Seq[(Int, Seq[Double])] = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val v = vecs(df, idCol, vecCol)
    var cents: Seq[(Int, Seq[Double])] = v.orderBy(col("__id")).limit(k)
      .collect().map(_.getSeq[Float](1)).zipWithIndex
      .map { case (x, i) => (i, x.map(_.toDouble).toSeq) }.toSeq
    require(cents.size == k, s"corpus has ${cents.size} rows, fewer than k=$k")
    var it = 0
    while (it < iters) {
      val assigned = assignTo(v, cents)
      // update: mean per (cell, dimension) over 1e-6-QUANTIZED components
      // with exact integer sums — a plain double avg() is summation-order
      // dependent, and a cross-engine (or cross-run) last-ulp difference
      // occasionally crosses a round-9 boundary and flips a downstream
      // assignment. Integer sums commute exactly; the single division and
      // round-9 are then identical everywhere. Quantization error (≤5e-7
      // per component) is far below any cluster geometry this serves.
      val means = v.join(assigned.select(col("__id"), col("cell")), "__id")
        .select(col("cell"), posexplode(col("__v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(floor(col("x").cast("double") * 1e6 + 0.5).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val byCell = means.groupBy(_.getInt(0))
      def mean(r: org.apache.spark.sql.Row): Double = BigDecimal(
        r.getLong(2).toDouble / (r.getLong(3) * 1e6))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      cents = cents.map { case (cell, old) =>
        byCell.get(cell) match {
          case Some(rows) =>
            (cell, rows.sortBy(_.getInt(1)).map(mean).toSeq)
          case None => (cell, old) // empty cell keeps its centroid
        }
      }
      it += 1
    }
    cents
  }

  /** Cluster assignment after `iters` Lloyd iterations:
    * (idCol, cell, dist2) — dist2 the squared L2 to the winning centroid,
    * rounded to 6. One broadcast join + one argmin aggregation per
    * assignment pass; never shuffles the corpus. */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int = 1): DataFrame = {
    val cents = kmeansFit(df, idCol, vecCol, k, iters)
    assignTo(vecs(df, idCol, vecCol), cents)
      .select(col("__id").as(idCol), col("cell"),
        round(col("dist2"), 6).as("dist2"))
  }

  /** Cluster-diversified sampling: cap every k-means cell at `quota` rows,
    * selected in the deterministic md5-priority order — the diversity-
    * balancing selection step of embedding-space curation (cap the dominant
    * modes so the kept set spans semantic space instead of collapsing onto
    * the head clusters; the cluster-balanced counterpart of
    * [[graft.operators.Sampling.quotaPerGroup]]'s per-source cap, and the
    * budget-shaped relative of SemDeDup's within-cell pruning).
    *
    * Output: (idCol, cell, dist2, priority ≤ quota) — dist2 kept so a
    * caller can audit how central the survivors are.
    *
    * Scale shape (100 TB): the assignment is one broadcast-centroid argmin
    * map ([[kmeansAssign]]); the cap is the salted two-phase row_number of
    * quotaPerGroup (per-cell windows over pre-filtered ≤ quota·partitions
    * rows, never a global window). Size k to the corpus like
    * [[semanticDedupAuto]] does when cells must stay bounded. */
  def diverseSample(df: DataFrame, idCol: String, vecCol: String,
                    k: Int, quota: Int, iters: Int = 1): DataFrame =
    Sampling.quotaPerGroup(
      kmeansAssign(df, idCol, vecCol, k, iters), idCol, "cell", quota)

  /** SemDeDup (Abbas et al. '23): cluster the embeddings, then mark
    * near-duplicate pairs WITHIN each cluster — cosine ≥ `tau` — keeping
    * the lower id. Output (cell, kept_id, dropped_id, cosine).
    *
    * The cluster pass is what makes the quadratic tractable: pairwise
    * comparison never crosses cells, so with k sized to the corpus
    * (k ≈ n / target-cell-size) the candidate volume is n × cell-size, the
    * same bound the LSH band-bucket paths rely on — and skew-capping a hot
    * cell composes via [[ScaleOps.truncateBuckets]] upstream if a corpus
    * needs it. */
  /** [[semanticDedupPairs]] with k SIZED TO THE MEASURED CORPUS —
    * k = clamp(ceil(n / cellTarget), 1, kMax) — the deployment form that
    * keeps the within-cell pairwise bound LINEAR (n × cellTarget) as the
    * corpus grows. The round-10 sf1 bench made the need concrete: the
    * oracle-pinned fixed-k=8 contract entry went 15× on 10× the vectors
    * (cell size ∝ n ⇒ quadratic cells), exactly what this facade
    * prevents. One count() over the input buys the measurement — the
    * decontaminate-facade discipline of routing by measured size, not by
    * caller guesswork. */
  def semanticDedupAuto(df: DataFrame, idCol: String, vecCol: String,
                        tau: Double = 0.95, cellTarget: Int = 1000,
                        iters: Int = 1, kMax: Int = 65536): DataFrame = {
    val n = df.count()
    require(n > 0, "semanticDedupAuto needs a non-empty corpus")
    semanticDedupPairs(df, idCol, vecCol,
      k = autoK(n, cellTarget, kMax), iters = iters, tau = tau)
  }

  /** The measured-k policy of [[semanticDedupAuto]], exposed so deployment
    * callers (e.g. a fit-memoizing pipeline layer) can reproduce the k a
    * facade call would pick for a counted corpus. */
  def autoK(n: Long, cellTarget: Int, kMax: Int = 65536): Int = {
    require(cellTarget >= 1, s"cellTarget must be >= 1, got $cellTarget")
    require(kMax >= 1, s"kMax must be >= 1, got $kMax")
    math.max(1L, math.min(kMax.toLong,
      (n + cellTarget - 1) / cellTarget)).toInt
  }

  def semanticDedupPairs(df: DataFrame, idCol: String, vecCol: String,
                         k: Int, iters: Int = 1,
                         tau: Double = 0.95): DataFrame =
    semanticDedupPairsWith(df, idCol, vecCol,
      kmeansFit(df, idCol, vecCol, k, iters), tau)

  /** [[semanticDedupPairs]] against a PRE-FITTED centroid table — the
    * fit-sharing entrypoint (r16 verdict #5): a pipeline that already
    * trained k-means over the same corpus (or memoizes the fit under the
    * train-once convention the ANN indexes use) passes its centroids here
    * and pays only the assignment + within-cell pairing per call.
    * Assignment is the fused [[exprs.argminCell]] projection with the
    * vector column KEPT IN PLACE — the former corpus self-join of the
    * assignment frame back onto the vectors by id is gone. */
  def semanticDedupPairsWith(df: DataFrame, idCol: String, vecCol: String,
                             cents: Seq[(Int, Seq[Double])],
                             tau: Double = 0.95): DataFrame = {
    require(tau >= -1.0 && tau <= 1.0, s"tau must be a cosine, got $tau")
    require(cents.nonEmpty, "semanticDedupPairsWith needs centroids")
    val v = vecs(df, idCol, vecCol)
    val withCell = v
      .select(col("__id"), col("__v"),
        exprs.argminCell(col("__v"), cents).as("m"))
      .select(col("__id"), col("__v"), col("m.cell").as("cell"))
    val l = withCell.select(col("cell"), col("__id").as("kept_id"),
      col("__v").as("va"))
    val r = withCell.select(col("cell"), col("__id").as("dropped_id"),
      col("__v").as("vb"))
    l.join(r, Seq("cell"))
      .where(col("kept_id") < col("dropped_id"))
      .withColumn("cosine",
        round(exprs.cosineSimilarity(col("va"), col("vb")), 6))
      .where(col("cosine") >= tau)
      .select(col("cell"), col("kept_id"), col("dropped_id"), col("cosine"))
  }

  /** Embedding quality control: flag vectors that are anomalous under the
    * trained clustering — corrupt embeddings, encoder failures, and
    * out-of-distribution rows all surface this way. Two complementary
    * rules, because a single distance cutoff has a hole:
    *
    *  - `far`: squared distance to the OWN cell's centroid beyond the
    *    cell's robust cutoff (median + `spread` × (p90 − median)), so a
    *    naturally wide cluster does not flag its healthy tail;
    *  - `tiny_cell`: EVERY member of a cell with fewer than `minCell`
    *    vectors. An extreme outlier captures a centroid for itself during
    *    Lloyd updates, making its own distance ~0 — the far rule alone
    *    can never see it. At k ≪ n a cell that small is an isolated
    *    micro-cluster, which is exactly the anomaly.
    *
    * Returns only the outliers: (idCol, cell, dist2, cutoff, reason).
    * Thresholds are DISCRETE per-cell quantiles through the KLL aggregate
    * — exact (≡ quantile_disc) while a cell fits the sketch, mergeable
    * O(k)-state approximate beyond, so the same plan serves both the
    * oracle and a 100-TB corpus. Discrete selection also removes the
    * cross-engine interpolation hazard: an interpolated percentile is
    * arithmetic whose last ulp differs between engines and can cross the
    * round-6 boundary; picking an actual element of the (round-6) dist2
    * multiset cannot. */
  def embeddingOutliers(df: DataFrame, idCol: String, vecCol: String,
                        k: Int, iters: Int = 1, spread: Double = 3.0,
                        minCell: Long = 4L): DataFrame = {
    require(spread > 0, s"spread must be > 0, got $spread")
    require(minCell >= 1, s"minCell must be >= 1, got $minCell")
    val a = kmeansAssign(df, idCol, vecCol, k, iters)
    val th = a.groupBy(col("cell")).agg(
        graft.functions.exprs.kllQuantiles(col("dist2"), 1 << 13,
          Seq(0.5, 0.9)).as("qs"),
        count(lit(1)).as("n_cell"))
      .select(col("cell"), element_at(col("qs"), 1).as("p50"),
        element_at(col("qs"), 2).as("p90"), col("n_cell"))
    a.join(F.broadcast(th), "cell")
      .withColumn("cutoff",
        round(col("p50") + lit(spread) * (col("p90") - col("p50")), 6))
      .withColumn("reason",
        when(col("n_cell") < minCell, "tiny_cell")
          .when(col("dist2") > col("cutoff"), "far"))
      .where(col("reason").isNotNull)
      .select(col(idCol), col("cell"), col("dist2"), col("cutoff"),
        col("reason"))
  }

  private def vecs(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("__id"), col(vecCol).as("__v"))

  /** Centroid-table argmin: distances rounded to 9 BEFORE comparison so
    * the (d, cell) struct-min tie-break is reproducible cross-engine.
    * One fused codegen pass per row ([[exprs.argminCell]]) — the former
    * crossJoin(broadcast) + min(struct) form materialized n·k wide rows
    * through a hash aggregate, which is the quadratic assign term the
    * sf10 leg measured on semantic_dedup_auto (k grows with n under the
    * auto policy, so n·k row expansion is n²/cellTarget). Value-identical
    * (same round-9 arithmetic, same lower-cell tie-break), spec-pinned
    * against the relational form in ClusteringSpec. */
  private def assignTo(v: DataFrame,
                       cents: Seq[(Int, Seq[Double])]): DataFrame =
    v.select(col("__id"), exprs.argminCell(col("__v"), cents).as("m"))
      .select(col("__id"), col("m.cell").as("cell"), col("m.d").as("dist2"))
}
