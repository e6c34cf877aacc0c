package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{minhashExprs, TextFunctions}

/** Statistical language-model scoring for corpus quality filtering — the
  * CCNet/Wenzek-et-al. recipe (perplexity of each document under a model
  * trained on the corpus itself) re-expressed as pure relational algebra:
  * train = two hash aggregations, score = one keyed join back. No MLlib, no
  * UDFs, no driver-side model object — the "model" is a DataFrame of counts,
  * so it scales, persists, and broadcasts like any other relation.
  *
  * Reference pipelines score documents with a KenLM n-gram model; the
  * n-gram-counts-with-add-alpha-smoothing core is the same mathematics
  * (minus backoff), and a bigram order keeps the count table near
  * vocabulary-sized. Scoring the training corpus with its own model is the
  * standard self-scoring setup for quality signals: boilerplate and fluent
  * text land at low perplexity, gibberish and OCR noise at high.
  */
object LanguageModel {

  /** Per-document add-α-smoothed bigram log-likelihood + perplexity.
    *
    * Model (trained on `df` itself):
    *   P(w₂|w₁) = (c(w₁w₂) + α) / (c(w₁·) + α·V)
    * where c(w₁w₂) is the corpus bigram count, c(w₁·) the count of w₁ as a
    * context (sum of its bigram counts), and V the successor vocabulary
    * size (distinct w₂). Per document: `n_bigrams`, `avg_logprob` =
    * mean ln P over its bigram occurrences, `ppl` = exp(−avg_logprob).
    * Documents with < 2 tokens keep a row: (0, 0.0, 1.0).
    *
    * Determinism across engines: each bigram's ln P is rounded to 9
    * decimals BEFORE the per-doc weighted sum (ln is not required to be
    * correctly rounded by IEEE 754 — same rationale as tf-idf), outputs to
    * 6; tokenization is `TextFunctions.normalized` whitespace tokens, and
    * gram formation is the fused [[minhashExprs.wordGrams]] kernel (one
    * codegen pass per row — not a nested HOF, not a per-doc window).
    *
    * Scale shape (100 TB): explode is the only corpus-volume stage; both
    * count tables come off ONE per-(doc, bigram) pre-aggregation (map-side
    * combining, keyed by data), so model size is DISTINCT-bigram bounded —
    * sublinear in corpus bytes, usually broadcastable after AQE sizes it;
    * otherwise the score join shuffles on the bigram key, which the
    * pre-aggregation already partitioned by. The one-row V aggregate is an
    * explicit broadcast. No global windows, no driver-side state. */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String,
                    alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"smoothing alpha must be > 0, got $alpha")
    requireNoReserved(idCol)
    val id = col(idCol)
    val grams = df.select(id,
      explode(minhashExprs.wordGrams(
        TextFunctions.normalized(col(textCol)), 2)).as("__bigram"))
    // one corpus-volume aggregation; everything model-side derives from it
    val docBg = grams.groupBy(id, col("__bigram")).agg(count(lit(1)).as("__n"))
    val modelBig = docBg.groupBy(col("__bigram")).agg(sum(col("__n")).as("__c12"))
    val modelUni = modelBig
      .groupBy(w1(col("__bigram")).as("__w1")).agg(sum(col("__c12")).as("__c1"))
    val vocab = modelBig.agg(
      count_distinct(substring_index(col("__bigram"), " ", -1)).as("__v"))
    val scored = docBg
      .join(modelBig, "__bigram")
      .withColumn("__w1", w1(col("__bigram")))
      .join(modelUni, "__w1")
      .crossJoin(broadcast(vocab))
      .withColumn("__lp", round(
        log((col("__c12") + alpha) / (col("__c1") + lit(alpha) * col("__v"))), 9))
      // 1e-9-quantized EXACT integer sum: order-free across partitions
      // and engines, and immune to the oracle-side double-evaluation
      // hazard the round-10 full gate caught in nb_classify (ppl_buckets
      // compares ppl against percentiles of a re-evaluated CTE)
      .withColumn("__lpq", round(col("__lp") * 1e9, 0).cast("long"))
      .groupBy(id)
      .agg(sum(col("__n")).as("__nb"), sum(col("__n") * col("__lpq")).as("__slq"))
      .withColumn("__slp", col("__slq").cast("double") / 1e9)
    val nb = coalesce(col("__nb"), lit(0L))
    df.select(id).join(scored, Seq(idCol), "left")
      .select(id,
        nb.as("n_bigrams"),
        when(nb === 0, 0.0)
          .otherwise(round(col("__slp") / col("__nb"), 6)).as("avg_logprob"),
        when(nb === 0, 1.0)
          .otherwise(round(exp(-col("__slp") / col("__nb")), 6)).as("ppl"))
  }

  private def w1(bigram: Column): Column = substring_index(bigram, " ", 1)

  /** Internal LM columns are `__`-prefixed (same convention as
    * `Clustering.vecs`' __id/__v) so a user idCol like `n` or `v` can't
    * silently collide with the model's working columns; a user column
    * already in the reserved namespace is rejected outright. */
  private def requireNoReserved(idCol: String): Unit =
    require(!idCol.startsWith("__"),
      s"idCol '$idCol' collides with the reserved __ internal-column namespace")

  /** Held-out scoring: the model trains on `train` ONLY; `score` documents
    * are scored under it — the train/validation composition of a real
    * pipeline, where a val doc's perplexity under the train-corpus model
    * is the filtering signal (scoring the training set with itself
    * flatters memorized text). Unseen bigrams and contexts flow through
    * the same add-α smoothing with zero counts — a fully-unseen bigram
    * scores ln(1/V). With `train eq score` this reduces exactly to
    * [[bigramLmScore]] (spec-pinned). Same scale shape; the model joins
    * become LEFT joins. */
  def bigramLmScoreHeldout(train: DataFrame, score: DataFrame,
                           idCol: String, textCol: String,
                           alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"smoothing alpha must be > 0, got $alpha")
    requireNoReserved(idCol)
    val id = col(idCol)
    def grams(df: DataFrame) = df.select(id,
      explode(minhashExprs.wordGrams(
        TextFunctions.normalized(col(textCol)), 2)).as("__bigram"))
    val modelBig = grams(train)
      .groupBy(col("__bigram")).agg(count(lit(1)).as("__c12"))
    val modelUni = modelBig
      .groupBy(w1(col("__bigram")).as("__w1")).agg(sum(col("__c12")).as("__c1"))
    val vocab = modelBig.agg(
      count_distinct(substring_index(col("__bigram"), " ", -1)).as("__v"))
    val docBg = grams(score).groupBy(id, col("__bigram")).agg(count(lit(1)).as("__n"))
    val scored = docBg
      .join(modelBig, Seq("__bigram"), "left")
      .withColumn("__w1", w1(col("__bigram")))
      .join(modelUni, Seq("__w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("__lp", round(log(
        (coalesce(col("__c12"), lit(0L)) + alpha) /
          (coalesce(col("__c1"), lit(0L)) + lit(alpha) * col("__v"))), 9))
      // quantized exact sum — see bigramLmScore
      .withColumn("__lpq", round(col("__lp") * 1e9, 0).cast("long"))
      .groupBy(id)
      .agg(sum(col("__n")).as("__nb"), sum(col("__n") * col("__lpq")).as("__slq"))
      .withColumn("__slp", col("__slq").cast("double") / 1e9)
    val nb = coalesce(col("__nb"), lit(0L))
    score.select(id).join(scored, Seq(idCol), "left")
      .select(id,
        nb.as("n_bigrams"),
        when(nb === 0, 0.0)
          .otherwise(round(col("__slp") / col("__nb"), 6)).as("avg_logprob"),
        when(nb === 0, 1.0)
          .otherwise(round(exp(-col("__slp") / col("__nb")), 6)).as("ppl"))
  }

  /** DoReMi-style domain reweighting (Xie et al. '23) — the "lite" closed
    * form: domains whose held-out text the reference LM finds HARD get
    * upweighted, the worst-case-domain intuition of DoReMi's exponentiated-
    * gradient loop. Full DoReMi interleaves proxy-model training with the
    * weight updates; with a FIXED reference model (the relational bigram
    * LM of [[bigramLmScoreHeldout]]), T exponentiated-gradient steps at
    * rate η collapse exactly to one softmax at temperature T·η — so this
    * implements that closed form plus DoReMi's uniform smoothing mix:
    *
    *   excess_d = avg val NLL of domain d − MAX over domains   (round-6,
    *              ≤ 0 so the quantized softmax sum cannot overflow)
    *   w_d      = (1−s)·softmax(temperature·excess)_d + s/|D|  (round-9)
    *
    * Determinism: per-domain NLL recombines the round-6 per-doc
    * avg_logprob as exact 1e-6-grid integers weighted by bigram counts;
    * exp rounds to 9 (the LM family's round-after-transcendental rule);
    * the softmax denominator sums 1e-9-quantized longs; the weight
    * expression tree is mirrored verbatim in the oracle.
    *
    * Scale shape (100 TB): everything after the held-out scoring pass is
    * |D|-row arithmetic (domain-cardinality frames, one-row aggregates
    * entering via broadcast cross joins — the bounded-scalar class).
    * Output: (domainCol, n_docs, avg_nll, weight), Σ w = 1 up to the
    * quantization grid. */
  def domainWeights(train: DataFrame, valDf: DataFrame, idCol: String,
                    domainCol: String, textCol: String, alpha: Double = 0.5,
                    temperature: Double = 1.0,
                    smoothing: Double = 0.1): DataFrame = {
    require(temperature > 0, s"temperature must be > 0, got $temperature")
    require(smoothing >= 0 && smoothing <= 1,
      s"smoothing must be in [0,1], got $smoothing")
    requireNoReserved(idCol)
    require(!domainCol.startsWith("__"),
      s"domain column must not use the reserved __ namespace")
    val id = col(idCol)
    val scored = bigramLmScoreHeldout(train, valDf, idCol, textCol, alpha)
    val per = valDf.select(id, col(domainCol)).join(scored, Seq(idCol))
      .groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bigrams")).as("__nb"),
        sum(col("n_bigrams") *
          round(col("avg_logprob") * 1e6, 0).cast("long")).as("__sq"))
      .withColumn("avg_nll", when(col("__nb") === 0, 0.0)
        .otherwise(round(-(col("__sq").cast("double") / 1e6) / col("__nb"), 6)))
    // subtract the MAX, not the min: excess ≤ 0 so exp ≤ 1 and the
    // 1e-9-quantized softmax denominator can never overflow Long (with
    // min-subtraction, temperature·excess > ~22.9 — only ~2.3 nats of NLL
    // gap at temperature 10 — would overflow and silently saturate under
    // Spark's non-ANSI cast while the oracle's CAST errors). The softmax
    // value is shift-invariant, so weights are unchanged up to rounding.
    val mn = per.agg(max(col("avg_nll")).as("__mn"))
    val nd = per.agg(count(lit(1)).cast("double").as("__ndom"))
    val withE = per.crossJoin(broadcast(mn))
      .withColumn("__ex", round(col("avg_nll") - col("__mn"), 6))
      .withColumn("__e", round(exp(lit(temperature) * col("__ex")), 9))
    val se = withE.agg(
      sum(round(col("__e") * 1e9, 0).cast("long")).as("__se"))
    withE.crossJoin(broadcast(se)).crossJoin(broadcast(nd))
      .withColumn("weight", round(
        (lit(1.0) - lit(smoothing)) *
          (col("__e") / (col("__se").cast("double") / 1e9))
          + lit(smoothing) / col("__ndom"), 9))
      .select(col(domainCol), col("n_docs"), col("avg_nll"), col("weight"))
  }

  /** CCNet's head/middle/tail corpus split by LM perplexity: thresholds are
    * the 1/3 and 2/3 EXACT interpolated percentiles of ppl over documents
    * that have bigrams (degenerate docs still get bucketed — their ppl of
    * 1.0 lands in head). Output (idCol, ppl, bucket).
    *
    * The threshold aggregate sorts every per-doc ppl — fine up to billions
    * of docs, but at full 100 TB corpus scale swap it for the KLL sketch
    * ([[graft.functions.exprs.kllQuantiles]], the engine's mergeable
    * O(k)-state quantile path, 0.44% measured rank error at k=200): the
    * split needs two cut points, not an exact sort. Exact percentiles are
    * used HERE because they are engine-replayable value-for-value. */
  def pplBuckets(df: DataFrame, idCol: String, textCol: String,
                 alpha: Double = 0.5): DataFrame = {
    val scored = bigramLmScore(df, idCol, textCol, alpha)
    val th = scored.where(col("n_bigrams") > 0).agg(
      round(expr("percentile(ppl, 0.3333333333)"), 6).as("__p33"),
      round(expr("percentile(ppl, 0.6666666667)"), 6).as("__p66"))
    // An all-degenerate corpus (no document has bigrams) leaves both
    // thresholds NULL; null-safe comparisons would send every doc to
    // 'tail'. Coalescing NULL thresholds to +inf keeps the docblock's
    // contract: with no trained thresholds everything (ppl 1.0) is 'head'.
    val p33 = coalesce(col("__p33"), lit(Double.PositiveInfinity))
    val p66 = coalesce(col("__p66"), lit(Double.PositiveInfinity))
    scored.crossJoin(broadcast(th))
      .select(col(idCol), col("ppl"),
        when(col("ppl") <= p33, "head")
          .when(col("ppl") <= p66, "middle")
          .otherwise("tail").as("bucket"))
  }

  /** Per-document average unigram log-likelihood under an add-α-smoothed
    * model trained on `train`:
    *   P(w) = (c(w) + α) / (N + α·V)
    * with N = total train tokens, V = distinct train vocabulary. Output
    * (idCol, n_tokens, avg_ll); OOV tokens of scored docs take the
    * smoothed zero count (they stay in the denominator token count, unlike
    * the NB classifier's drop-OOV convention — a likelihood RATIO consumer
    * needs both models to score the same token multiset). Token-free docs
    * keep a row: (0, 0.0). Per-token ln rounds to 9 before the weighted
    * sum, outputs to 6 — the [[bigramLmScore]] determinism discipline.
    * The model corpora must be non-empty (an empty model has V = 0 and
    * every likelihood degenerates). */
  def unigramAvgLl(train: DataFrame, score: DataFrame,
                   idCol: String, textCol: String,
                   alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"smoothing alpha must be > 0, got $alpha")
    requireNoReserved(idCol)
    val id = col(idCol)
    def toks(df: DataFrame) = df.select(id,
      explode(minhashExprs.wordGrams(
        TextFunctions.normalized(col(textCol)), 1)).as("__tok"))
    val model = train
      .select(explode(minhashExprs.wordGrams(
        TextFunctions.normalized(col(textCol)), 1)).as("__tok"))
      .groupBy(col("__tok")).agg(count(lit(1)).as("__c"))
    val totals = model.agg(sum(col("__c")).as("__tot"),
      count(lit(1)).as("__v"))
    val docTok = toks(score).groupBy(id, col("__tok"))
      .agg(count(lit(1)).as("__n"))
    val scored = docTok
      .join(model, Seq("__tok"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("__lp", round(log(
        (coalesce(col("__c"), lit(0L)) + alpha) /
          (col("__tot") + lit(alpha) * col("__v"))), 9))
      // 1e-9-quantized EXACT integer sum (order-free across partitions
      // and engines — the round-10 nb_classify lesson: the dsir oracle
      // compares weights against a percentile computed from a second
      // evaluation of the same CTE, so the sum must be bit-stable)
      .withColumn("__lpq", round(col("__lp") * 1e9, 0).cast("long"))
      .groupBy(id)
      .agg(sum(col("__n")).as("__nt"), sum(col("__n") * col("__lpq")).as("__slq"))
      .withColumn("__sl", col("__slq").cast("double") / 1e9)
    val nt = coalesce(col("__nt"), lit(0L))
    score.select(id).join(scored, Seq(idCol), "left")
      .select(id, nt.as("n_tokens"),
        when(nt === 0, 0.0)
          .otherwise(round(col("__sl") / col("__nt"), 6)).as("avg_ll"))
  }

  /** DSIR-style importance weighting for data selection (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"): each
    * candidate document is scored under a TARGET-domain model and a
    * SOURCE (raw-corpus) model, and the per-token log-likelihood ratio
    *   weight = avg_ll_target − avg_ll_source
    * ranks how target-like the document is; the top `selectFraction` of
    * candidates (weight ≥ the exact interpolated (1−f) percentile over ALL
    * scored docs, round-6 both sides so the cut is boundary-stable) is
    * marked selected. DSIR proper resamples with hashed-n-gram features;
    * unigram models keep the mathematics engine-replayable value-for-value
    * while preserving the estimator's shape — swap [[unigramAvgLl]] for a
    * bigram scorer for more context sensitivity.
    *
    * Output: (idCol, n_tokens, ll_target, ll_source, weight, selected
    * 0/1). Token-free docs carry weight 0 and rank with everything else.
    *
    * Scale shape (100 TB): both models are distinct-vocabulary-bounded
    * count tables off one explode each over their (typically small) train
    * corpora; candidate scoring is the same per-(doc,token) aggregation +
    * model join as [[bigramLmScore]]. The selection threshold is ONE
    * interpolated percentile over per-doc weights — exact here for oracle
    * replay, the KLL sketch ([[graft.functions.exprs.kllQuantiles]]) at
    * full corpus scale, same note as [[pplBuckets]]. */
  def dsirWeights(target: DataFrame, source: DataFrame, score: DataFrame,
                  idCol: String, textCol: String, alpha: Double = 0.5,
                  selectFraction: Double = 0.25): DataFrame = {
    require(selectFraction > 0 && selectFraction <= 1.0,
      s"selectFraction must be in (0,1], got $selectFraction")
    val tgt = unigramAvgLl(target, score, idCol, textCol, alpha)
      .withColumnRenamed("avg_ll", "ll_target")
    val src = unigramAvgLl(source, score, idCol, textCol, alpha)
      .withColumnRenamed("avg_ll", "ll_source")
      .withColumnRenamed("n_tokens", "__nt2")
    val weighted = tgt.join(src, Seq(idCol))
      .select(col(idCol), col("n_tokens"), col("ll_target"), col("ll_source"),
        round(col("ll_target") - col("ll_source"), 6).as("weight"))
    // the percentile fraction is formatted as an exact DECIMAL literal:
    // interpolating the double `1.0 - selectFraction` prints artifacts
    // like 0.09999999999999998 (selectFraction = 0.9), a subtly different
    // fraction from the oracle's hand-written decimal. BigDecimal.valueOf
    // uses the double's shortest decimal form and the subtraction is exact
    // in decimal, so any selectFraction replays digit-for-digit.
    val frac = java.math.BigDecimal.valueOf(1.0)
      .subtract(java.math.BigDecimal.valueOf(selectFraction)).toPlainString
    val th = weighted.agg(round(
      expr(s"percentile(weight, $frac)"), 6).as("__th"))
    weighted.crossJoin(broadcast(th))
      .select(col(idCol), col("n_tokens"), col("ll_target"), col("ll_source"),
        col("weight"),
        (col("weight") >= col("__th")).cast("long").as("selected"))
  }

  /** Stupid-backoff trigram scoring (Brants et al. 2007, "Large Language
    * Models in Machine Translation") — the n-gram smoothing scheme DESIGNED
    * for distributed corpora: scores are relative frequencies with a fixed
    * backoff factor λ, never normalized, so the "model" stays three count
    * DataFrames built by plain hash aggregation — no held-out discounting
    * pass, no global normalization, which is exactly why Google used it at
    * trillion-token scale. Per trigram occurrence w₁w₂w₃ of a scored doc:
    *
    *   S(w₃|w₁w₂) = c(w₁w₂w₃)/c(w₁w₂)                 if c(w₁w₂w₃) > 0
    *              = λ · c(w₂w₃)/c(w₂)                 else if c(w₂w₃) > 0
    *              = λ² · (c(w₃)+α)/(N+α·V)            otherwise
    *
    * The unigram base is add-α smoothed (Brants' bare f(w)/N is 0 for OOV
    * words and ln would diverge; α keeps every path finite — deviation
    * documented here, spec-pinned). When a trigram is seen its context
    * bigram necessarily is too (c(w₁w₂) ≥ c(w₁w₂w₃)), and likewise
    * c(w₂) ≥ c(w₂w₃), so no branch divides by zero. Output per scored doc:
    * (idCol, n_trigrams, avg_logscore = mean ln S over trigram occurrences,
    * score_ppl = exp(−avg_logscore) — a PSEUDO-perplexity, since backoff
    * scores are unnormalized). Docs with < 3 tokens keep a row (0, 0.0,
    * 1.0), the [[bigramLmScore]] convention.
    *
    * Determinism across engines: λ and λ² enter as the DECIMAL literals of
    * `BigDecimal.valueOf(λ)` (λ² computed in decimal — the double product
    * 0.4*0.4 = 0.16000000000000003 would NOT equal the oracle's 0.16);
    * each ln rounds to 9 before the 1e-9-quantized exact integer sum, the
    * whole-family discipline.
    *
    * Scale shape (100 TB): three model tables off one tokenize+gram pass
    * each over `train`, all DISTINCT-n-gram bounded (the trigram table is
    * the big one — Brants' sharding answer is the same hash partitioning
    * every join here already keys by); scoring is one per-(doc,trigram)
    * aggregation joined against the model tables on gram keys. The one-row
    * totals aggregate is an explicit broadcast. No windows, no driver
    * state. */
  def stupidBackoffScore(train: DataFrame, score: DataFrame,
                         idCol: String, textCol: String,
                         lambda: Double = 0.4,
                         alpha: Double = 0.5): DataFrame = {
    require(lambda > 0 && lambda < 1, s"backoff lambda must be in (0,1), got $lambda")
    require(alpha > 0, s"smoothing alpha must be > 0, got $alpha")
    requireNoReserved(idCol)
    val id = col(idCol)
    val lamD = java.math.BigDecimal.valueOf(lambda)
    val lam = lamD.doubleValue
    val lam2 = lamD.pow(2).doubleValue
    def grams(df: DataFrame, n: Int, as: String) = df.select(id,
      explode(minhashExprs.wordGrams(
        TextFunctions.normalized(col(textCol)), n)).as(as))

    // ---- model: three count tables, one grams pass each over train ----
    val modelTri = grams(train, 3, "__tri")
      .groupBy(col("__tri")).agg(count(lit(1)).as("__c123"))
    val modelBig = grams(train, 2, "__big")
      .groupBy(col("__big")).agg(count(lit(1)).as("__c12"))
    val modelUni = grams(train, 1, "__tok")
      .groupBy(col("__tok")).agg(count(lit(1)).as("__c1"))
    val totals = modelUni.agg(sum(col("__c1")).as("__ntot"),
      count(lit(1)).as("__v"))

    // ---- score: per-(doc, trigram) counts joined on derived gram keys ----
    val docTg = grams(score, 3, "__tri")
      .groupBy(id, col("__tri")).agg(count(lit(1)).as("__n"))
    val keyed = docTg
      .withColumn("__ctx", substring_index(col("__tri"), " ", 2))
      .withColumn("__suf", substring_index(col("__tri"), " ", -2))
      .withColumn("__w2", substring_index(col("__suf"), " ", 1))
      .withColumn("__w3", substring_index(col("__tri"), " ", -1))
    val scored = keyed
      .join(modelTri, Seq("__tri"), "left")
      .join(modelBig.select(col("__big").as("__ctx"),
        col("__c12").as("__cctx")), Seq("__ctx"), "left")
      .join(modelBig.select(col("__big").as("__suf"),
        col("__c12").as("__csuf")), Seq("__suf"), "left")
      .join(modelUni.select(col("__tok").as("__w2"),
        col("__c1").as("__cw2")), Seq("__w2"), "left")
      .join(modelUni.select(col("__tok").as("__w3"),
        col("__c1").as("__cw3")), Seq("__w3"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("__lp", round(
        when(col("__c123").isNotNull,
          log(col("__c123").cast("double") / col("__cctx")))
        .when(col("__csuf").isNotNull,
          log(lit(lam) * col("__csuf").cast("double") / col("__cw2")))
        .otherwise(log(lit(lam2) * (coalesce(col("__cw3"), lit(0L)) + alpha) /
          (col("__ntot") + lit(alpha) * col("__v")))), 9))
      // 1e-9-quantized EXACT integer sum — see bigramLmScore
      .withColumn("__lpq", round(col("__lp") * 1e9, 0).cast("long"))
      .groupBy(id)
      .agg(sum(col("__n")).as("__ng"), sum(col("__n") * col("__lpq")).as("__slq"))
      .withColumn("__slp", col("__slq").cast("double") / 1e9)
    val ng = coalesce(col("__ng"), lit(0L))
    score.select(id).join(scored, Seq(idCol), "left")
      .select(id,
        ng.as("n_trigrams"),
        when(ng === 0, 0.0)
          .otherwise(round(col("__slp") / col("__ng"), 6)).as("avg_logscore"),
        when(ng === 0, 1.0)
          .otherwise(round(exp(-col("__slp") / col("__ng")), 6)).as("score_ppl"))
  }
}
