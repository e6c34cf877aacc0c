package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{exprs, TextFunctions}

/** STREAMING distribution-drift monitor — the incremental form of
  * [[graft.operators.CorpusOps.distributionDrift]]: per group, the JS
  * divergence (nats) and L1 distance between a FIXED reference snapshot's
  * unigram distribution and the distribution of everything streamed so
  * far. The drift alarm of a recurring-crawl ingest pipeline ("source X's
  * incoming content no longer looks like the corpus we curated against"),
  * running next to [[NearDupIngest]] and [[SketchStreams]].
  *
  * Streaming shape: Structured Streaming (complete mode) allows ONE
  * stateful aggregation and no post-aggregation joins — so the streamed
  * side aggregates to a Misra–Gries term summary per group (EXACT while
  * the group's streamed vocabulary stays ≤ k — the corpusMonitor budget
  * discipline), and the reference distribution rides into the FINISHER as
  * a nested map literal captured at monitor construction (one bounded
  * driver collect, guarded). All drift arithmetic happens in plain column
  * expressions over the G-row aggregate — the same cleared-denominator ln
  * ratios, 1e-9 rounding, and per-term integer quantization as the batch
  * operator, so stream ≡ batch is spec-pinned, not hoped
  * (DriftStreamsSpec).
  *
  * Output rows cover the groups SEEN IN THE STREAM (complete-mode
  * aggregation emits observed keys); a reference group that never streams
  * a row simply has no row yet — the "source went silent" signal is the
  * row's absence, while "source content shifted" is its js_div.
  *
  * SIZE k TO THE CORPUS VOCABULARY (the corpusMonitor budget
  * discipline): past the exact regime a uniform vocabulary is MG's worst
  * case — the summary keeps ~k tokens, the dropped mass reads as
  * "missing", and a zero-drift stream reports near-max spurious drift
  * (measured js 0.525 at vocab 2000 / k 256; spec-pinned as the
  * documented failure mode, DriftStreamsSpec).
  * Output: (group, n_before, n_after, js_div, l1_dist) — the batch
  * operator's schema. */
object DriftStreams {

  /** @param docs      streaming (or batch — same plan works for the
    *                  parity oracle) frame with (groupCol, textCol)
    * @param reference BATCH snapshot frame with (groupCol, textCol);
    *                  collected once here — bounded by the guards
    * @param k         MG summary size per group; the monitor is exact
    *                  while each group's streamed vocabulary ≤ k
    * @param maxRefEntries guard on the collected reference size
    *                  (groups × vocabulary entries) */
  def driftMonitor(docs: DataFrame, reference: DataFrame,
                   groupCol: String, textCol: String, k: Int = 4096,
                   maxRefEntries: Long = 4L << 20): DataFrame = {
    require(k > 1, s"bad k $k")
    // reference counts, one bounded collect at construction: the monitor
    // is built ONCE per stream, and the reference side of a drift check
    // is by definition a curated snapshot with a bounded (group, token)
    // profile — the same budget discipline as the sketch monitor's k.
    val refRows = reference
      .select(col(groupCol).cast("string").as("g"),
        explode(graft.functions.minhashExprs.wordGrams(
          TextFunctions.normalized(col(textCol)), 1)).as("tok"))
      .groupBy(col("g"), col("tok")).agg(count(lit(1)).as("c"))
      .limit((maxRefEntries + 1).min(Int.MaxValue.toLong).toInt)
      .collect()
    require(refRows.length <= maxRefEntries,
      s"driftMonitor: reference profile exceeds $maxRefEntries (group, " +
        "token) entries — aggregate or sample the reference snapshot")
    val refMap: Map[String, Map[String, Long]] = refRows
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (g, xs) => g -> xs.map(x => x._2 -> x._3).toMap }
    val refTot: Map[String, Long] =
      refMap.map { case (g, m) => g -> m.values.sum }
    val refLit = typedLit(refMap)
    val refTotLit = typedLit(refTot)

    val toks = docs.select(col(groupCol).cast("string").as("__g"),
      explode(graft.functions.minhashExprs.wordGrams(
        TextFunctions.normalized(col(textCol)), 1)).as("__tok"))
    val agged = toks.groupBy(col("__g"))
      .agg(exprs.heavyHitters(col("__tok"), k).as("__hh"))

    // finisher stage 1 — HOIST every HOF-derived value (the streamed
    // count map, the streamed total) into plain columns of an
    // intermediate projection: Catalyst HOFs are interpreted with no CSE
    // across lambda scopes, so a sum lambda that references a transform/
    // aggregate EXPRESSION re-evaluates it per key — the O(vocab²) shape
    // ContractSpec's quadratic-HOF lint exists to catch (and did, r13).
    // After hoisting, the sum lambdas below reference only bound columns.
    val prepared = agged.select(col("__g"),
      map_from_entries(transform(col("__hh"),
        e => struct(e.getField("term"), e.getField("count")))).as("__m"),
      coalesce(element_at(refLit, col("__g")),
        typedLit(Map.empty[String, Long])).as("__r"),
      coalesce(element_at(refTotLit, col("__g")), lit(0L)).as("__tb"),
      aggregate(col("__hh"), lit(0L),
        (acc, e) => acc + e.getField("count")).as("__ta"))
    // finisher stage 2: the batch operator's term arithmetic over the
    // key union — reference is "before" (p), the stream is "after" (q)
    val mm = col("__m"); val rr = col("__r")
    val tb = col("__tb"); val ta = col("__ta")
    def d(c: Column) = c.cast("double")
    val keys = array_union(map_keys(mm), map_keys(rr))
    def per(key: Column): (Column, Column, Column) = {
      val cb = coalesce(element_at(rr, key), lit(0L))
      val ca = coalesce(element_at(mm, key), lit(0L))
      val p = when(tb === 0L, 0.0).otherwise(d(cb) / d(tb))
      val q = when(ta === 0L, 0.0).otherwise(d(ca) / d(ta))
      val den = d(cb) * d(ta) + d(ca) * d(tb)
      val lnP = when(cb === 0L, 0.0)
        .when(ta === 0L, round(log(lit(2.0)), 9))
        .otherwise(round(log(lit(2.0) * d(cb) * d(ta) / den), 9))
      val lnQ = when(ca === 0L, 0.0)
        .when(tb === 0L, round(log(lit(2.0)), 9))
        .otherwise(round(log(lit(2.0) * d(ca) * d(tb) / den), 9))
      (round(p * lnP * 1e9, 0).cast("long"),
        round(q * lnQ * 1e9, 0).cast("long"),
        round(abs(p - q) * 1e9, 0).cast("long"))
    }
    val jp = aggregate(keys, lit(0L), (acc, key) => acc + per(key)._1)
    val jq = aggregate(keys, lit(0L), (acc, key) => acc + per(key)._2)
    val l1 = aggregate(keys, lit(0L), (acc, key) => acc + per(key)._3)
    prepared.select(col("__g").as(groupCol),
      tb.as("n_before"), ta.as("n_after"),
      round((jp + jq).cast("double") / 2e9, 6).as("js_div"),
      round(l1.cast("double") / 1e9, 6).as("l1_dist"))
  }
}
