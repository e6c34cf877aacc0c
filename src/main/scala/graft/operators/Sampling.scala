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
    // withColumn REPLACES an existing column of the same name — a caller
    // frame that already carries bucket/split would be silently clobbered
    // and the old assignment lost (r12 ADVICE); fail loudly instead
    Seq("bucket", "split").foreach(c =>
      require(!df.columns.contains(c),
        s"hashSplit adds a '$c' column but the input already has one — " +
          "rename or drop it first"))
    val trainCut = (256 * trainPct).toInt
    val valCut = (256 * (trainPct + valPct)).toInt
    val b = hashBucket(col(idCol))
    df.withColumn("bucket", b)
      .withColumn("split",
        when(col("bucket") < trainCut, "train")
          .when(col("bucket") < valCut, "val")
          .otherwise("test"))
  }

  /** Leakage-safe [[hashSplit]]: rows are split by their DUPLICATE-CLUSTER
    * key rather than their own id, so exact copies of a document can never
    * straddle the train/eval boundary (the eval-contamination hole in a
    * plain per-id split: a memorized train duplicate inflates eval). The
    * cluster key here is the normalized-text md5 fingerprint (the
    * dedup_exact identity); callers with NEAR-dup clusters pass their
    * keep-list keeper id straight to [[hashSplit]] — the split column only
    * ever sees the cluster key, so any clustering slots in. Adds
    * `cluster`, `bucket`, `split`; one narrow projection, no shuffle, no
    * RNG — and the whole cluster moves atomically between splits if the
    * fractions change, never one member at a time. */
  def leakSafeSplit(df: DataFrame, idCol: String, textCol: String,
                    trainPct: Double = 0.8, valPct: Double = 0.1): DataFrame = {
    require(!df.columns.contains("cluster"),
      "leakSafeSplit adds a 'cluster' column but the input already has " +
        "one — rename or drop it first (or pass your cluster key straight " +
        "to hashSplit)")
    hashSplit(
      df.withColumn("cluster",
        graft.functions.TextFunctions.fingerprintMd5(col(textCol))),
      "cluster", trainPct, valPct)
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
    // compare on the STRING form of the stratum (rates keys are strings):
    // a non-string strata column matches its `String.valueOf` spelling
    // instead of being implicitly cast, and a NULL stratum matches no key
    // at all — null-stratum rows always keep `defaultRate` (element_at on
    // a NULL key is NULL → coalesce). The lookup is a FLAT map literal,
    // not a nested when-chain: Column→Expression conversion recurses on
    // tree DEPTH, and a fold of N when().otherwise() nodes built an
    // N-deep tree that overflowed the stack near N≈500 (map children are
    // siblings — depth stays O(1) at any stratum count)
    val cut =
      if (rates.isEmpty) lit((256 * defaultRate).toInt)
      else coalesce(
        try_element_at(
          map(rates.toSeq.flatMap { case (stratum, rate) =>
            Seq(lit(stratum), lit((256 * rate).toInt))
          }: _*),
          col(strataCol).cast("string")),
        lit((256 * defaultRate).toInt))
    df.where(hashBucket(col(idCol)) < cut)
  }

  /** Temperature-scaled mixture sampling (the multilingual-pretraining
    * recipe of Conneau & Lample's XLM / mT5: resample strata toward
    * p_s^α so dominant languages stop drowning rare ones). Downsampling
    * only — the rarest stratum keeps rate 1 and every other stratum keeps
    * rate `(c_min / c_s)^(1-α)` (α = 1 reproduces the corpus as-is; α = 0
    * equalizes expected stratum sizes). Rates derive from one per-stratum
    * count aggregate (a #strata-row collect), then the id-pure
    * [[stratifiedHashSample]] applies them — so the kept set stays a pure
    * function of (ids, stratum counts), reproducible and auditable in plain
    * SQL. α = 0.5 routes through `sqrt`, which IEEE 754 rounds exactly —
    * the derived rates are bit-identical in every engine (`pow` carries no
    * such guarantee for other exponents). */
  def temperatureMix(df: DataFrame, idCol: String, strataCol: String,
                     alpha: Double = 0.5,
                     maxStrata: Int = 100000): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"bad temperature alpha $alpha")
    require(maxStrata >= 1, s"bad maxStrata $maxStrata")
    // NULL strata are excluded from the rate derivation: they cannot be
    // keyed in `rates` (and must not set c_min, deflating every real
    // stratum); null-stratum rows keep stratifiedHashSample's defaultRate 1.
    // Stratum-cardinality guard (the fitsExactNgram measured-size
    // discipline): the per-stratum rate table is DRIVER state, so a caller
    // passing a high-cardinality column (doc ids, URLs) must fail loudly,
    // not OOM the driver — take(maxStrata + 1) bounds the fetch itself, so
    // even the probe never materializes an unbounded collect.
    val rows = df.where(col(strataCol).isNotNull)
      .groupBy(col(strataCol)).count()
      .take(maxStrata + 1)
    require(rows.length <= maxStrata,
      s"temperatureMix: > $maxStrata distinct values in '$strataCol' — " +
        "temperature mixing is for bounded strata (languages, sources); " +
        "raise maxStrata only if the rate table genuinely fits the driver")
    val counts = rows.map(r => String.valueOf(r.get(0)) -> r.getLong(1))
    if (counts.isEmpty) return df
    val cMin = counts.map(_._2).min.toDouble
    val rates = counts.map { case (s, c) =>
      val ratio = cMin / c
      s -> (if (alpha == 0.5) math.sqrt(ratio) else math.pow(ratio, 1 - alpha))
    }.toMap
    stratifiedHashSample(df, idCol, strataCol, rates)
  }

  /** Deterministic token-budget sample: keep documents in md5(id) hash
    * order until the cumulative token count reaches `budget` — "give me
    * exactly ~1B tokens of this source, reproducibly" — the token-weighted
    * sibling of [[hashSample]]. The kept set is a pure function of the ids
    * and token counts (never layout or RNG), grows monotonically with the
    * budget, and any engine can audit it: the order is the md5 hex string
    * (tie-broken on id), so the same window sum is recomputable in plain
    * SQL. The first document that would cross the budget is dropped whole —
    * documents are never split.
    *
    * Scale shape: a naive `sum() OVER (ORDER BY priority)` is a GLOBAL
    * window — every row through ONE task. This is TWO-PHASE instead:
    * per-bucket token totals (the 256 md5 buckets of [[hashBucket]], one
    * hash aggregate, 256-row collect) become broadcast running offsets, and
    * the in-bucket window partitions by bucket — no task sees more than
    * ~1/256 of the corpus. The bucket is the priority's own 2-hex-char
    * prefix, so (bucket, priority) order IS priority order and the result
    * equals the single-window formulation exactly. Adds `cum_tokens`. */
  def tokenBudgetSample(df: DataFrame, idCol: String, tokensCol: String,
                        budget: Long, cache: Boolean = true): DataFrame = {
    require(budget >= 0, s"bad budget $budget")
    val spark = df.sparkSession
    import spark.implicits._
    val toks = coalesce(col(tokensCol).cast("long"), lit(0L))
    // tracked persist: consumed by the totals collect AND the returned
    // plan — uncached, the caller's upstream chain executes twice. The
    // pin lives until Dedup.unpersistAll() (the pipeline-cache
    // convention the bench loop drives); library callers outside that
    // loop who would rather recompute than hold a pinned cache pass
    // cache=false (the lshIndex convention — r12 ADVICE).
    val marked = df
      .withColumn("__pr", md5(col(idCol).cast("string")))
      .withColumn("__b", hashBucket(col(idCol)))
    val bucketed = if (cache) Dedup.track(marked.persist()) else marked
    val totals = bucketed.groupBy(col("__b")).agg(sum(toks).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until 256)
      .scanLeft(0L)((acc, b) => acc + totals.getOrElse(b, 0L))
    val offDf = broadcast(
      (0 until 256).map(b => (b, offsets(b))).toDF("__b", "__off"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b"))
      .orderBy(col("__pr").asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    bucketed.join(offDf, "__b")
      .withColumn("cum_tokens", sum(toks).over(win) + col("__off"))
      .where(col("cum_tokens") <= budget)
      .drop("__b", "__pr", "__off")
  }

  /** Quality-ranked token-budget fill: keep the BEST documents — ordered
    * (score desc, md5(id) asc, id asc) — until their token running sum
    * reaches `budget`. The budget-fill stage a real corpus build runs
    * after scoring ("take the top-quality N-token corpus"), the quality-
    * keyed sibling of [[tokenBudgetSample]]'s unbiased md5-ordered prefix.
    *
    * Scale shape (100 TB): the running sum never runs as one global
    * window. Per-(score, hash-bucket) token totals aggregate relationally;
    * a window over the DISTINCT-SCORE frame (bounded — see guard) turns
    * them into higher-score offsets, a window over the (score, bucket)
    * frame adds within-score bucket offsets, and the per-row window
    * partitions by (score, bucket) — the md5 bucket IS the 2-hex prefix of
    * the md5 priority, so (bucket, priority) order within a score class IS
    * priority order and the result equals the single-window formulation
    * exactly (the tokenBudgetSample trick applied within each score
    * class; no task sees more than ~1/256 of one score class, even on a
    * constant-score corpus). NO driver collect anywhere.
    *
    * Guard: the distinct-score frame must stay bounded for the offset
    * window — a measured limit-probe (the fitsExactNgram discipline)
    * rejects score columns with more than `maxDistinctScores` values
    * (pass a ROUNDED score, e.g. the engine's round-6 qualityScore). The
    * same probe rejects NULL scores (fail fast, not silent drop — see
    * inline note).
    *
    * Adds `cum_tokens`; keeps rows with cum_tokens ≤ budget. */
  def qualityBudgetFill(df: DataFrame, idCol: String, tokensCol: String,
                        scoreCol: String, budget: Long,
                        maxDistinctScores: Long = 1L << 20,
                        cache: Boolean = true): DataFrame = {
    require(budget >= 0, s"bad budget $budget")
    require(maxDistinctScores >= 1, s"bad maxDistinctScores")
    val toks = coalesce(col(tokensCol).cast("long"), lit(0L))
    val score = col(scoreCol)
    // tracked persist (released by Dedup.unpersistAll, the pipeline-cache
    // convention): the input is consumed three times — the guard probe
    // below, the per-(score,bucket) totals, and the final join — and an
    // uncached caller chain (c4 clean, dedup, scoring) would re-execute
    // for each. The probe action doubles as the cache materializer.
    // Library callers outside the unpersistAll loop who would rather
    // recompute than hold a pinned cache pass cache=false (r12 ADVICE).
    val marked = df
      .withColumn("__pr", md5(col(idCol).cast("string")))
      .withColumn("__hb", hashBucket(col(idCol)))
    val base = if (cache) Dedup.track(marked.persist()) else marked
    // one probe action checks BOTH guards: count(1) vs count(score) over
    // the limited distinct frame detects a NULL score (NULL is one
    // distinct value, so whenever the cardinality check passes the frame
    // holds ALL distinct values incl. NULL). NULL scores are rejected
    // rather than silently dropped: the offset frames join back on
    // scoreCol equi-keys, and a NULL join key would never match — callers
    // must coalesce scores upstream to choose where nulls rank.
    val probe = base.select(score).distinct()
      .limit((maxDistinctScores + 1).min(Int.MaxValue.toLong).toInt)
      .agg(count(lit(1)).as("n"), count(score).as("nn")).head()
    val nScores = probe.getLong(0)
    require(nScores <= maxDistinctScores,
      s"qualityBudgetFill: > $maxDistinctScores distinct values in " +
        s"'$scoreCol' — pass a rounded score so the offset frame stays " +
        s"bounded")
    require(probe.getLong(1) == nScores,
      s"qualityBudgetFill: '$scoreCol' contains NULLs, which cannot be " +
        s"ranked — coalesce the score to a sentinel upstream")
    // per-(score, bucket) totals → within-score offsets (window over the
    // (score, bucket) frame, ≤ 256 rows per score class)
    val shTot = base.groupBy(score, col("__hb")).agg(sum(toks).as("__t"))
    val wInScore = org.apache.spark.sql.expressions.Window
      .partitionBy(score).orderBy(col("__hb").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val shOff = shTot
      .withColumn("__offh", coalesce(sum(col("__t")).over(wInScore), lit(0L)))
      .select(score, col("__hb"), col("__offh"))
    // per-score totals → strictly-higher-score offsets (single-partition
    // window, but over the DISTINCT-SCORE frame only — guarded above)
    val sTot = shTot.groupBy(score).agg(sum(col("__t")).as("__st"))
    val wAbove = org.apache.spark.sql.expressions.Window
      .orderBy(score.desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val sOff = sTot
      .withColumn("__offs", coalesce(sum(col("__st")).over(wAbove), lit(0L)))
      .select(score, col("__offs"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(score, col("__hb"))
      .orderBy(col("__pr").asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    base.join(shOff, Seq(scoreCol, "__hb"))
      .join(sOff, Seq(scoreCol))
      .withColumn("cum_tokens",
        sum(toks).over(wIn) + col("__offh") + col("__offs"))
      .where(col("cum_tokens") <= budget)
      .drop("__pr", "__hb", "__offh", "__offs")
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
  /** Per-group quality-percentile FLOOR: keep rows whose score meets
    * their OWN group's p-quantile — "drop each source's worst quartile"
    * (the per-domain percentile filtering convention of quality-driven
    * curation, where a global threshold would gut low-scoring-but-
    * valuable domains and leave high-scoring domains unpruned).
    *
    * The cutoff is the DISCRETE per-group quantile through the KLL
    * aggregate over round-6 scores — exact (≡ quantile_disc) while a
    * group fits the sketch, mergeable O(k)-state approximate beyond, so
    * one plan serves the oracle and a 100-TB corpus; discrete selection
    * also removes the cross-engine interpolation hazard (the
    * embeddingOutliers convention). Scale shape: ONE hash aggregation to
    * a G-row cutoff frame, broadcast back — no windows, no shuffles of
    * the data beyond the aggregation's partial merge.
    *
    * Keeps ties at the cutoff (>= — the quantile element itself
    * survives, so the kept fraction is ≥ 1−p, never below it). Output:
    * (idCol, groupCol, scoreCol rounded to 6, cutoff). */
  def qualityFloor(df: DataFrame, idCol: String, groupCol: String,
                   scoreCol: String, p: Double = 0.25,
                   sketchK: Int = 1 << 13): DataFrame = {
    require(p > 0.0 && p < 1.0, s"p must be in (0,1), got $p")
    require(scoreCol != "cutoff" && idCol != "cutoff" && groupCol != "cutoff",
      "'cutoff' is the output column qualityFloor adds — rename the input")
    require(!Seq(idCol, groupCol, scoreCol).exists(_.startsWith("__")),
      "input columns must not use the reserved __ namespace")
    val scored = df.select(col(idCol), col(groupCol),
      round(col(scoreCol).cast("double"), 6).as("__q"))
    val cuts = scored.groupBy(col(groupCol))
      .agg(graft.functions.exprs.kllQuantiles(col("__q"), sketchK, Seq(p))
        .as("__c"))
      .select(col(groupCol), element_at(col("__c"), 1).as("cutoff"))
    // Probe side: __q is forced NON-NULLABLE (null → -Infinity) so the
    // optimizer cannot infer an isnotnull(__q) constraint from the
    // `__q >= cutoff` predicate and push it below the defining Project —
    // that pushdown SUBSTITUTES the alias, duplicating the caller's whole
    // score expression into a per-row Filter. With a composite text-
    // quality score (HOF lambdas, interpreted) the duplicate was ~1/3 of
    // quality_floor's wall (plan read + measured, r17). Semantics are
    // unchanged: a NULL score can never satisfy `>= cutoff`, and -Infinity
    // is explicitly excluded below — necessary because when >= p of a
    // group's scores are literal -Inf the cutoff is ITSELF -Inf, and
    // -Inf >= -Inf holds, which would let null-score rows (coalesced to
    // -Inf here) pass the floor that the old null-propagating predicate
    // dropped them from. The explicit =!= keeps literal--Inf and NULL
    // scores null-equivalent in every regime, including that degenerate
    // one (r17 ADVICE).
    val probe = df.select(col(idCol), col(groupCol),
      coalesce(round(col(scoreCol).cast("double"), 6),
        lit(Double.NegativeInfinity)).as("__q"))
    probe.join(broadcast(cuts), Seq(groupCol))
      .where(col("__q") >= col("cutoff") &&
        col("__q") =!= lit(Double.NegativeInfinity))
      .select(col(idCol), col(groupCol), col("__q").as(scoreCol),
        col("cutoff"))
  }

  /** [[quotaPerGroup]] with PER-GROUP quotas (a `quotas` relation of
    * (groupCol, quota)) — the primitive under budget-allocating mixers
    * like [[unimaxSample]]. Same two-stage salted-window shape and the
    * same md5-priority order; groups absent from `quotas` are dropped
    * (no quota = no budget). `quotas` is group-cardinality-bounded and
    * broadcast. */
  def quotaPerGroups(df: DataFrame, idCol: String, groupCol: String,
                     quotas: DataFrame): DataFrame = {
    val ord = Seq(hashBucket(col(idCol)).asc, col(idCol).asc)
    val partial = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol), col("_graft_salt"))
      .orderBy(ord: _*)
    val global = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(ord: _*)
    df.join(broadcast(quotas.select(col(groupCol), col("quota"))), Seq(groupCol))
      .withColumn("_graft_salt", spark_partition_id())
      .withColumn("_graft_partial", row_number().over(partial))
      .where(col("_graft_partial") <= col("quota"))
      .drop("_graft_salt", "_graft_partial")
      .withColumn("priority", row_number().over(global).cast("long"))
      .where(col("priority") <= col("quota"))
      .drop("quota")
  }

  /** UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and More
    * Effective Language Sampling for Large-Scale Multilingual Pretraining"):
    * distribute a total `budget` across groups (languages) as uniformly as
    * possible, capping each group at `maxEpochs` passes over its `n`
    * available items — the water-filling allocation that gives every
    * low-resource language its full (epoch-capped) corpus and splits the
    * remaining budget evenly among the rest.
    *
    * Closed form over groups sorted by cap = maxEpochs·n ascending: with
    * prefix sums cum_i and r_i = (budget − cum_{i−1}) / (L − i + 1), the
    * capped groups are exactly the prefix where cap_i ≤ r_i, the water
    * level t is r at the FIRST uncapped row (equivalently max(r) over
    * uncapped rows — r is non-decreasing along the capped prefix and
    * decreasing after it), and alloc_i = least(cap_i, t); if every group
    * is capped (budget ≥ Σcap) alloc = cap and the budget is deliberately
    * underused — the epoch cap binds, which is UniMax's whole point.
    * Cross-engine determinism: prefix sums accumulate the INTEGER counts
    * and multiply by maxEpochs once (cum_i ≡ (Σ_{j≤i} n_j)·E — the k-means
    * quantized-integer-sum lesson: float accumulation order never enters),
    * and the rest is IEEE-correctly-rounded mul/div, so the allocation
    * replays bit-for-bit in any engine; only the derived epochs rate is
    * rounded (6).
    *
    * Output: (groupCol, n, alloc, quota = floor(alloc), epochs =
    * round(alloc/n, 6)). The rank/prefix-sum step is a WINDOWLESS
    * L×L self-join — L is group cardinality (languages), bounded by
    * construction, and a global window (even one keyed by a constant,
    * which constant-folding empties back out) would drag the
    * single-partition WindowExec warning into every consumer's logs.
    *
    * Cost shape: ONE bounded action materializes the counts frame — the
    * limit(+1) collect IS the cardinality guard (it never pulls past the
    * cap), and the allocation then runs over the collected LocalRelation,
    * so the upstream counts aggregation is computed exactly once instead
    * of once per probe plus once per plan-subtree (`a`, `b`, `tot` each
    * re-derived it before; at unimax_sample's sf0.1 shape that was 4
    * scans of `documents` where 2 suffice). The collect is the audited
    * bounded-driver-scalar class (a quota map, ≤ maxGroups rows). */
  def unimaxAllocation(counts: DataFrame, groupCol: String,
                       budget: Long, maxEpochs: Double,
                       maxGroups: Int = 10000): DataFrame = {
    require(budget > 0, s"bad budget $budget")
    require(maxEpochs > 0, s"bad maxEpochs $maxEpochs")
    require(maxGroups >= 1, s"bad maxGroups $maxGroups")
    val sel = counts.select(col(groupCol), col("n"))
    // group-cardinality guard: the rank step below is a deliberate L×L
    // broadcast self-join (windowless — see the docblock), which is only
    // the right trade while L is group-bounded (languages). A caller
    // feeding a high-cardinality key must fail loudly before the broadcast
    // — the limit(+1) collect never pulls past the cap.
    val head = sel.limit(maxGroups + 1).collect()
    require(head.length <= maxGroups,
      s"unimaxAllocation: > $maxGroups groups in '$groupCol' — UniMax " +
        "allocation is for bounded group sets (languages); raise " +
        "maxGroups only if the L x L rank join genuinely stays tractable")
    val local = counts.sparkSession.createDataFrame(
      java.util.Arrays.asList(head: _*), sel.schema)
    val a = local
    val b = local.select(col(groupCol).as("__g2"), col("n").as("__n2"))
    val ranked = a.join(broadcast(b),
        col("__n2") < col("n") ||
          (col("__n2") === col("n") && col("__g2") <= col(groupCol)))
      .groupBy(col(groupCol), col("n"))
      .agg(sum(col("__n2")).as("__cumn"), count(lit(1)).as("__i"))
      .withColumn("__L", lit(head.length.toLong))
      .withColumn("__cap", col("n").cast("double") * maxEpochs)
      .withColumn("__r",
        (lit(budget.toDouble)
          - (col("__cumn") - col("n")).cast("double") * maxEpochs)
          / (col("__L") - col("__i") + 1))
      .withColumn("__capped", col("__cap") <= col("__r"))
    val level = ranked.agg(
      max(when(!col("__capped"), col("__r"))).as("__t"))
    ranked.crossJoin(broadcast(level))
      .select(col(groupCol), col("n"),
        least(col("__cap"), coalesce(col("__t"), col("__cap"))).as("alloc"))
      .withColumn("quota", floor(col("alloc")).cast("long"))
      .withColumn("epochs", round(col("alloc") / col("n"), 6))
  }

  /** Training-epoch manifest: a [[unimaxAllocation]] with maxEpochs > 1
    * MATERIALIZED into actual repetition rows — the (doc, epoch) manifest
    * a repetition-tolerant trainer consumes, where [[unimaxSample]] only
    * records the allocation. Group g's quota q expands to fullE = q / n
    * complete epochs of EVERY doc plus one fractional epoch of the q % n
    * top-md5-priority docs (the same deterministic order
    * [[quotaPerGroups]] selects by, so the fractional epoch is an
    * unbiased, rerun-stable subset).
    *
    * Scale shape: the allocation is the bounded-group driver table; the
    * full-epoch expansion is a broadcast join + explode(sequence) whose
    * output volume IS the training volume (you cannot emit less than the
    * manifest); the fractional winners reuse the two-stage salted-window
    * quota machinery. Output: (idCol, groupCol, epoch), epoch 0-based. */
  def epochManifest(df: DataFrame, idCol: String, groupCol: String,
                    budget: Long, maxEpochs: Double): DataFrame = {
    // eager checkpoint: the group-bounded allocation is consumed three
    // times below (full-epoch join, fractional quotas, epoch join-back) —
    // one materialization instead of three replays of the alloc plan
    val alloc = unimaxAllocation(
        df.groupBy(col(groupCol)).agg(count(lit(1)).as("n")),
        groupCol, budget, maxEpochs)
      .select(col(groupCol), col("n"), col("quota"))
      .withColumn("__fullE", floor(col("quota") / col("n")).cast("long"))
      .withColumn("__rem", col("quota") % col("n"))
      .localCheckpoint(true)
    val base = df.select(col(idCol), col(groupCol))
    val full = base
      .join(broadcast(alloc.where(col("__fullE") > 0)
        .select(col(groupCol), col("__fullE"))), Seq(groupCol))
      .select(col(idCol), col(groupCol),
        explode(sequence(lit(0L), col("__fullE") - 1)).as("epoch"))
    val frac = quotaPerGroups(base,
        idCol, groupCol,
        alloc.where(col("__rem") > 0)
          .select(col(groupCol), col("__rem").as("quota")))
      .join(broadcast(alloc.select(col(groupCol), col("__fullE"))),
        Seq(groupCol))
      .select(col(idCol), col(groupCol), col("__fullE").as("epoch"))
    full.union(frac)
  }

  /** UniMax sampling: [[unimaxAllocation]] over the per-group counts, then
    * the top-quota rows of each group in md5-priority order
    * ([[quotaPerGroups]]). With maxEpochs ≤ 1 this is a subset sample;
    * above 1 the allocation records how many epochs of each group a
    * repetition-tolerant consumer should take (quota caps at the group's
    * row count — the relational output never duplicates rows). */
  def unimaxSample(df: DataFrame, idCol: String, groupCol: String,
                   budget: Long, maxEpochs: Double = 1.0): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
    val alloc = unimaxAllocation(counts, groupCol, budget, maxEpochs)
      .select(col(groupCol),
        least(col("quota"), col("n")).as("quota"))
    quotaPerGroups(df, idCol, groupCol, alloc)
  }

  /** Deterministic weighted sampling without replacement (Efraimidis &
    * Spirakis '06, algorithm A-ES): each row draws key = u^(1/w) — here in
    * log space, skey = ln(u)/w — and the n LARGEST keys win, which selects
    * each row with probability proportional to its weight for a sample
    * drawn without replacement. The "sample documents proportional to
    * quality score" stage of corpus curation, with the uniform u a PURE
    * md5 FUNCTION of (seed, id) (the [[hashSample]] discipline): no RNG
    * stream, any engine replays the draw, and re-running on a grown corpus
    * never re-rolls existing rows' keys.
    *
    *   u    = (int(md5(seed:id)[0:8], 16) + 0.5) / 2^32   ∈ (0, 1)
    *   skey = round(ln(u) / w, 9)   (ties broken by id ascending)
    *
    * Monotonicity contract (spec-pinned): raising one row's weight while
    * others hold never evicts it from the sample — ln(u) < 0, so a larger
    * w moves skey toward 0, strictly upward.
    *
    * Scale shape (100 TB): skey is a row-local map; the selection is
    * orderBy(skey).limit(n) — Spark's TakeOrderedAndProject, a per-
    * partition O(n) bounded heap + driver merge of partition heads, NO
    * global sort and no window. Weights must be strictly positive — a
    * non-positive weight raises at runtime rather than silently inverting
    * the draw. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     n: Int, seed: Long = 42L): DataFrame = {
    require(n >= 1, s"sample size must be >= 1, got $n")
    val w = col(weightCol).cast("double")
    val h = conv(substring(md5(concat(lit(s"$seed:"),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("double")
    val u = (h + lit(0.5)) / lit(4294967296.0)
    df.withColumn("skey",
        when(w > 0, round(log(u) / w, 9))
          .otherwise(raise_error(concat(
            lit("weightedSample: weight must be > 0, got "),
            w.cast("string")))))
      .orderBy(col("skey").desc, col(idCol).asc)
      .limit(n)
  }

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

  /** Deterministic global training-order shuffle: assign every record a
    * (shard, pos) so that reading shards in pos order is a seeded
    * pseudo-random permutation of the corpus — the "shuffle the dataset
    * before training" stage, made a pure function of (seed, id) like every
    * other assignment in this object (re-running on a re-partitioned or
    * grown corpus never reorders existing epochs' prefixes arbitrarily;
    * any engine can recompute the order for audit; no RNG stream, no
    * `orderBy(rand())`).
    *
    *   hex   = md5(seed || ':' || id)
    *   shard = int(hex[0:4]) mod shards          (first 4 hex digits)
    *   pos   = row_number within shard, ordered by (hex, id) — 1-based
    *
    * Because the md5 ordering is independent of every data attribute, each
    * shard is an unbiased sample of the corpus and any prefix of a shard's
    * order is an unbiased sample of the shard — sources/languages arrive
    * interleaved, which is what training ingestion wants.
    *
    * Scale shape (100 TB): the only non-map operation is the PER-SHARD
    * row_number window — shards is chosen ≈ cluster write parallelism
    * (hundreds to thousands), so each window partition is corpus/shards
    * rows, the same bound as the output file a writer would produce for
    * that shard; there is no global window and no driver state. A writer
    * follows with repartition(col("shard")) + sortWithinPartitions(pos),
    * giving one ready-to-stream file per shard. */
  def trainOrder(df: DataFrame, idCol: String, shards: Int,
                 seed: Long): DataFrame = {
    require(shards >= 1 && shards <= 65536,
      s"shards must be in [1, 65536] (4 hex digits of spread), got $shards")
    val hex = md5(concat(lit(s"$seed:"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__hex").asc, col(idCol).asc)
    df.select(col(idCol), hex.as("__hex"))
      .withColumn("shard",
        (conv(substring(col("__hex"), 1, 4), 16, 10).cast("long") % shards))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__hex")
  }
}
