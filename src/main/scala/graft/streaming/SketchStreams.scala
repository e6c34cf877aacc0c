package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.exprs

/** The mergeable-sketch trio (KMV distinct / Misra–Gries heavy hitters /
  * KLL quantiles) as STREAMING aggregations — the incremental corpus
  * monitor of a 100-TB ingest pipeline: vocabulary growth, hot terms, and
  * doc-length quantiles tracked with O(k) state per sketch while documents
  * arrive in micro-batches.
  *
  * Each transform is a plain DataFrame aggregation, so the same function
  * runs in batch (for the parity oracle) and behind `readStream` in
  * complete output mode. Correctness rests on exactly the property the
  * batch sketches already spec-pin: the aggregation states MERGE
  * losslessly (Agarwal et al. 2012, "Mergeable Summaries") — Structured
  * Streaming's incremental execution combines each micro-batch's partial
  * state into the store state with the same merge the shuffle uses, so
  * stream result ≡ batch result over the same rows, regardless of how the
  * rows were sliced into batches (spec-pinned in SketchStreamsSpec).
  *
  * The reference has no streaming surface; this extends §2.10 to the
  * sketch family.
  */
object SketchStreams {

  /** One-row corpus monitor: distinct-token estimate (KMV), top heavy
    * hitters (Misra–Gries), token-count quantiles (KLL), and a Count-Min
    * term-frequency grid over a documents frame — batch or streaming
    * alike. The CM grid (r11) makes the monitor answer "how often has
    * term X arrived so far?" for ANY term with O(d·w) state — the
    * point-query complement of MG's top-k list (query it with
    * [[graft.functions.exprs.cmQuery]]).
    *
    * @param docs   (textCol) document frame (batch or streaming)
    * @param kKmv   KMV heap size (exact while distinct < k)
    * @param kHh    Misra–Gries summary size
    * @param kKll   KLL budget (exact while rows ≤ k)
    * @param dCm    Count-Min hash rows
    * @param wCm    Count-Min slots per row
    * @return one row: (distinct_tokens, heavy_hitters, len_quantiles,
    *         term_grid) */
  def corpusMonitor(docs: DataFrame, textCol: String, kKmv: Int = 4096,
                    kHh: Int = 64, kKll: Int = 400,
                    dCm: Int = 4, wCm: Int = 1024): DataFrame = {
    // one exploded frame feeds all three sketches, but the doc-length
    // column survives only on each doc's FIRST token row (pos 0, or the
    // explode_outer null row of an empty doc) — KLL's null-skip then sees
    // exactly one length per document while KMV/MG see every token
    val toks = docs
      .select(graft.functions.TextFunctions.tokenCount(col(textCol))
          .as("__nall"),
        posexplode_outer(graft.functions.TextFunctions.tokens(
          graft.functions.TextFunctions.normalized(col(textCol))))
          .as(Seq("__p", "__t")))
      .select(when(col("__p").isNull || col("__p") === 0, col("__nall"))
        .as("__n"), col("__t"))
    toks.agg(
      round(exprs.kmvEstimate(exprs.kmvSketch(col("__t"), kKmv), kKmv), 4)
        .as("distinct_tokens"),
      exprs.heavyHitters(col("__t"), kHh).as("heavy_hitters"),
      exprs.kllQuantiles(col("__n"), kKll, Seq(0.25, 0.5, 0.75))
        .as("len_quantiles"),
      exprs.cmSketchAgg(col("__t"), dCm, wCm, 42L).as("term_grid"))
  }
}
