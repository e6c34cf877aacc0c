package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFunctions

/** Corpus-level text operators for training-data preparation: context-window
  * chunking and TF-IDF term profiling. Both are pure DataFrame plans —
  * shuffle-keyed aggregations and a per-row explode, nothing driver-side —
  * so they scale with executor count, not corpus size.
  */
object CorpusOps {

  /** Split every document into consecutive ≤`window`-token chunks — the
    * context-window packing plan of an LM data pipeline (each chunk becomes
    * one training sequence; the final short chunk is kept, not padded or
    * dropped, so downstream packing can decide). Tokens are the engine's
    * whitespace tokens ([[TextFunctions.tokens]]); `chunk_text` re-joins the
    * token slice with single spaces, i.e. intra-token whitespace is
    * normalized — by design, chunk boundaries cannot preserve the original
    * inter-token runs.
    *
    * Shape: narrow projection + per-row explode of a `sequence()` of chunk
    * indices — no shuffle at all; output size ≈ corpus size. Token-empty
    * documents produce zero chunks. */
  def chunkPlan(df: DataFrame, idCol: String, textCol: String,
                window: Int): DataFrame = {
    require(window > 0, s"bad window $window")
    val sized = df
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .where(col("n_tokens") > 0)
    sized
      .select(col(idCol), col("toks"), col("n_tokens"),
        // Spark's `/` is true division even on longs — the floor-cast is the
        // integer chunk-count arithmetic (n_tokens ≥ 1 here, so truncation
        // toward zero IS floor, and doubles are exact to 2^53)
        explode(sequence(lit(0L),
          ((col("n_tokens") - 1) / window).cast("long"))).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        least(lit(window.toLong), col("n_tokens") - col("chunk_idx") * window)
          .as("chunk_tokens"),
        array_join(
          slice(col("toks"), (col("chunk_idx") * window + 1).cast("int"),
            lit(window)),
          " ").as("chunk_text"))
  }

  /** Sequence PACKING: assign documents to fixed-token-budget packs (the
    * step that turns chunked documents into training sequences without
    * padding waste). Next-fit per hash group: documents land in
    * `numGroups` groups by the engine-portable md5 bucket of their id,
    * are ordered by id within the group, and a sequential next-fit scan
    * opens a new pack whenever the running token total would exceed
    * `budget` (an oversize document gets a pack of its own). Output:
    * (id, n_tokens, grp, pack_id) with pack_id dense per group.
    *
    * Determinism and scale: group assignment and in-group order are pure
    * functions of the id — NOT of partition layout — so the packing is
    * bit-identical across cluster layouts and reruns (tested under
    * different shuffle-partition settings). The sequential scan is the
    * textbook mapPartitions case (genuinely stateful per-row logic Spark's
    * declarative ops cannot express): each group's rows are co-located by a
    * repartition on grp and scanned once, so parallelism = `numGroups` —
    * size it to O(cluster cores) at scale (each group's scan is O(group)
    * time and O(1) memory). */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    budget: Long, numGroups: Int = 16): DataFrame = {
    require(budget > 0, s"bad budget $budget")
    require(numGroups > 0 && numGroups <= 256,
      s"numGroups must be in [1,256] (md5-bucket granularity), got $numGroups")
    // the id is cast to long for grouping and in-group ordering — an
    // integral type is REQUIRED, not coerced: a string id would silently
    // null out non-numeric values and collapse distinct spellings ("007",
    // "7") onto one long, breaking the layout-determinism guarantee
    df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.LongType
         | org.apache.spark.sql.types.IntegerType
         | org.apache.spark.sql.types.ShortType
         | org.apache.spark.sql.types.ByteType => ()
      case other => throw new IllegalArgumentException(
        s"packSequences requires an integral id column; '$idCol' is $other " +
          "— map ids to a stable long (e.g. a dense id or xxhash64) first")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("id").asc)
    val prepared = df
      .select(col(idCol).cast("long").as("id"),
        col(tokenCol).cast("long").as("n_tokens"))
      .withColumn("grp", (Sampling.hashBucket(col("id")) % numGroups).cast("int"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .repartition(numGroups, col("grp"))
      .sortWithinPartitions(col("grp"), col("rn"))
      .as[(Long, Long, Int, Long)]
    prepared.mapPartitions { it =>
      // rows arrive (grp, rn)-sorted with every grp complete in this
      // partition; next-fit state resets at each group boundary
      var curGrp = Int.MinValue
      var acc = 0L
      var pack = -1L
      it.map { case (id, nTok, grp, _) =>
        if (grp != curGrp) { curGrp = grp; acc = 0L; pack = -1L }
        if (pack < 0 || acc + nTok > budget) { pack += 1; acc = nTok }
        else acc += nTok
        (id, nTok, grp, pack)
      }
    }.toDF("id", "n_tokens", "grp", "pack_id")
  }

  /** Per-document top-`k` TF-IDF terms over the corpus's own vocabulary —
    * the classic keyword/topic profile used for corpus exploration and
    * near-dup triage. Terms are normalized words ([[TextFunctions
    * .normalized]] — lowercase, non-alphanumeric runs collapsed); term
    * frequency is the raw in-document count; idf = ln((N+1)/(df+1)) + 1
    * (the smoothed scikit-learn convention — never divides by zero, and a
    * term in every document still gets positive weight). Ranking orders on
    * the score ROUNDED to 6 decimals, term-ascending on ties: `ln` is not
    * required to be correctly rounded by IEEE 754, so two engines can
    * disagree in the last ulp — ranking on the rounded score keeps the
    * top-k reproducible everywhere while staying semantically faithful.
    *
    * Shape: explode → two hash aggregations (tf keyed on (doc, term), df
    * keyed on term) → broadcast-friendly join on term → per-doc top-k via
    * window. The df side aggregates to vocabulary cardinality — small — so
    * the planner broadcasts it; the top-k window shuffles on doc_id, the
    * same key the tf aggregation already partitioned by. */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    require(k > 0, s"bad k $k")
    val terms = df.select(col(idCol),
      explode(TextFunctions.tokens(TextFunctions.normalized(col(textCol))))
        .as("term"))
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // document frequency falls out of tf for free: tf is already one row
    // per (doc, term), so counting rows per term IS the distinct-doc count —
    // no second corpus explode + distinct shuffle
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // corpus size N = row count of the input (ids are expected unique — the
    // idf convention counts documents, and duplicated ids would also skew
    // tf). A one-row aggregate cross-joined in keeps the whole computation
    // ONE lazy plan: the previous eager `distinct().count()` at
    // plan-construction time re-scanned an unmaterialized input pipeline
    // per call (and diverged from the oracle's count(*) on duplicate ids).
    val nDocs = df.select(count(lit(1)).cast("double").as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * (log((col("n_docs") + 1) / (col("df") + 1)) + 1),
          6))
      .drop("n_docs")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tfidf"))
  }

  /** Per-language dataset card — the one-frame corpus summary a curation
    * run publishes: document/token volumes, exact-duplicate rate (distinct
    * normalized-text fingerprints vs docs), mean composite quality, and
    * the DISCRETE median document length.
    *
    * Engine discipline: the quality mean sums 1e-6-quantized scores as
    * EXACT longs (order-free — [[TextFunctions.qualityScore]] is already
    * round-6, so quantization is lossless); the median is
    * [[graft.functions.exprs.kllQuantiles]] with its budget SIZED TO THE
    * MEASURED corpus (the [[graft.operators.Clustering.semanticDedupAuto]]
    * discipline): a cheap `limit(budget+1).count()` probe keeps the
    * default 8192 when the whole corpus fits it; otherwise one lang-only
    * count aggregate measures the largest language and the budget grows to
    * cover it up to `exactMedianCap`, so the sketch stays in its exact
    * regime (≡ SQL `quantile_disc`) — and therefore oracle-replayable — at
    * ANY sf below the cap instead of silently leaving it past 8192 rows
    * per language. Beyond the cap (the true 100-TB regime, where exactness
    * would mean an O(n)-state sketch) it degrades gracefully to the
    * mergeable approximate sketch — the documented scale path, no longer a
    * silent one. One hash aggregation keyed by language (plus at most the
    * one measurement aggregate); `count_distinct` of fingerprints shuffles
    * per-lang text fingerprints — swap for the KMV sketch when exactness
    * can yield. */
  def corpusCard(df: DataFrame, textCol: String, langCol: String,
                 kllBudget: Int = 8192,
                 exactMedianCap: Int = 1 << 20): DataFrame = {
    require(kllBudget >= 8, s"bad kllBudget $kllBudget")
    require(exactMedianCap >= kllBudget,
      s"exactMedianCap ($exactMedianCap) must be >= kllBudget ($kllBudget)")
    val base = df.select(col(langCol).as("lang"),
      TextFunctions.tokenCount(col(textCol)).as("__nt"),
      TextFunctions.fingerprintMd5(col(textCol)).as("__fp"),
      TextFunctions.qualityScore(col(textCol)).as("__q"))
    // measured exact-regime budget (probe first: limit() short-circuits the
    // scan, so small corpora never pay the per-language count aggregate)
    val budget =
      if (df.limit(kllBudget + 1).count() <= kllBudget) kllBudget
      else {
        val maxLang = base.groupBy(col("lang")).count()
          .agg(max(col("count"))).collect()(0).getLong(0)
        math.min(math.max(kllBudget.toLong, maxLang), exactMedianCap.toLong)
          .toInt
      }
    base.groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("n_tokens"),
        count_distinct(col("__fp")).as("distinct_texts"),
        sum(round(col("__q") * 1e6, 0).cast("long")).as("__qsum"),
        graft.functions.exprs.kllQuantiles(col("__nt"), budget, Seq(0.5))
          .as("__med"))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        col("distinct_texts"),
        round(lit(1.0)
          - col("distinct_texts").cast("double") / col("n_docs"), 6)
          .as("dup_rate"),
        round(col("__qsum").cast("double") / 1e6 / col("n_docs"), 6)
          .as("avg_quality"),
        element_at(col("__med"), 1).cast("long").as("p50_tokens"))
  }

  /** BPE vocabulary induction (Sennrich, Haddow & Birch, ACL 2016,
    * "Neural Machine Translation of Rare Words with Subword Units"): the
    * ranked merge list that IS a byte-pair-encoding tokenizer's training
    * artifact. Words are [[TextFunctions.normalized]] whitespace tokens
    * with corpus frequencies; each word starts as its character sequence
    * plus an end-of-word marker, and every iteration merges the globally
    * most frequent adjacent symbol pair (count desc, pair-string asc on
    * ties — a total order, so the merge sequence is deterministic).
    *
    * Merging applies the literal " l r "→" lr " replace TWICE per merge:
    * a single left-to-right pass skips every second occurrence in a run
    * (the trailing space of one match is the leading space of the next, so
    * " a b a b " yields " ab a b ", not BPE's " ab ab "), but the pass-1
    * survivors are then isolated between already-merged symbols — never
    * adjacent to another occurrence — so one more identical pass merges
    * them all, and replacing (l,r) with the space-free symbol `lr` can
    * never create a new " l r " occurrence. Two passes IS the fixpoint,
    * which matches Sennrich's merge-everywhere semantics exactly, and the
    * same double replace replays in DuckDB's `replace`, so the whole
    * induction replays in the oracle. Symbols stay space-free by
    * construction (normalized words are [a-z0-9]+; the end marker is
    * charset-checked).
    *
    * Scale shape (100 TB): ONE corpus-volume aggregation builds the
    * (word, freq) vocabulary; all `numMerges` iterations run on that
    * vocabulary-sized frame — per iteration one map-side-combined pair
    * count plus a single-row argmax collect (driver state = the merge
    * list, k rows). Lineage is cut with localCheckpoint every 16 merges
    * so the plan doesn't accrete one replace per iteration. Real
    * pipelines induce vocab on a corpus SAMPLE ([[Sampling.hashSample]])
    * — merge quality converges long before corpus-scale counts matter.
    *
    * @return (rank, left_sym, right_sym, pair_count), rank 1..numMerges
    *         (fewer if the vocabulary runs out of adjacent pairs) */
  def bpeMerges(df: DataFrame, textCol: String, numMerges: Int,
                endMarker: String = "</w>"): DataFrame = {
    require(numMerges > 0 && numMerges <= 4096, s"bad numMerges $numMerges")
    require(endMarker.nonEmpty && endMarker.matches("[A-Za-z0-9_</>]+"),
      s"end marker must be space/quote-free, got '$endMarker'")
    val spark = df.sparkSession
    // Scoped persist (r18): WITHOUT it every round's argmax collect
    // re-executed the whole lineage from the parquet scan — the corpus
    // explode + word-count aggregation ran once PER MERGE (numMerges
    // corpus passes; measured 8 passes behind bpe_merges' 3.0 s sf0.1
    // median), which contradicted the documented one-corpus-pass shape.
    // The cache is vocabulary-sized, owned by this call, and released in
    // the finally below (the hashedLogReg trainFeat convention) — the
    // returned frame is a driver-built LocalRelation, so nothing escapes.
    val words = df.select(explode(TextFunctions.tokens(
        TextFunctions.normalized(col(textCol)))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
      .persist()
    // " c h a r s </w> " — leading/trailing spaces so every symbol is
    // space-delimited on BOTH sides and literal " a b "→" ab " replace
    // can never match across symbol boundaries
    var syms = words.select(col("__f"),
      concat(lit(" "),
        array_join(filter(split(col("__w"), ""), s => length(s) > 0), " "),
        lit(" " + endMarker + " ")).as("__s"))
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    try {
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val toks = split(trim(col("__s")), " ")
      val top = syms.select(col("__f"),
          explode(zip_with(
            slice(toks, lit(1), size(toks) - 1),
            slice(toks, lit(2), size(toks) - 1),
            (a, b) => concat(a, lit(" "), b))).as("__p"))
        .groupBy(col("__p")).agg(sum(col("__f")).as("__c"))
        .orderBy(col("__c").desc, col("__p").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val Array(l, r) = top.head.getString(0).split(" ", 2)
        merges += ((i + 1L, l, r, top.head.getLong(1)))
        // symbols are [a-z0-9] + the charset-checked marker: safe to
        // inline in the literal (non-regex) replace; applied twice —
        // pass 2 reaches the fixpoint (see the docblock)
        syms = syms.withColumn("__s",
          expr(s"replace(replace(__s, ' $l $r ', ' $l$r '), ' $l $r ', ' $l$r ')"))
        if ((i + 1) % 16 == 0) syms = syms.localCheckpoint(true)
        i += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "left_sym", "right_sym", "pair_count")
    } finally { words.unpersist(); () }
  }

  /** Apply a learned BPE merge list ([[bpeMerges]] output, rank order) to
    * tokenize the corpus — the "real tokenizer" token count that
    * [[graft.functions.TextFunctions.subwordCount]] approximates. Each
    * merge is the same DOUBLE literal replace as training (two passes = the
    * merge-everywhere fixpoint — see [[bpeMerges]]), so train-then-encode
    * of a training word reproduces its final training segmentation
    * exactly.
    *
    * Scale shape: the replace chain runs once per DISTINCT word (the
    * vocabulary frame), not per occurrence — documents join their
    * per-word counts to the encoded vocabulary on the word key and sum
    * `occurrences × symbols`. The merge list is driver-held and bounded
    * (≤4096 by [[bpeMerges]]); it compiles into a chain of codegen'd
    * literal replaces.
    *
    * @param merges (left, right) pairs in rank order
    * @return (idCol, bpe_tokens) — total BPE token count per document
    *         (0 for token-empty docs) */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
                merges: Seq[(String, String)],
                endMarker: String = "</w>"): DataFrame = {
    require(merges.size <= 4096, s"merge list too long: ${merges.size}")
    require(endMarker.nonEmpty && endMarker.matches("[A-Za-z0-9_</>]+"),
      s"end marker must be space/quote-free, got '$endMarker'")
    merges.foreach { case (l, r) =>
      require((l + r).matches("[A-Za-z0-9_</>]+"),
        s"merge symbols must be space/quote-free, got ('$l', '$r')") }
    val docWords = df.select(col(idCol),
      explode(TextFunctions.tokens(
        TextFunctions.normalized(col(textCol)))).as("__w"))
      .groupBy(col(idCol), col("__w")).agg(count(lit(1)).as("__n"))
    val initSym = concat(lit(" "),
      array_join(filter(split(col("__w"), ""), s => length(s) > 0), " "),
      lit(" " + endMarker + " "))
    val encoded = merges.foldLeft(initSym) { case (sym, (l, r)) =>
      call_function("replace",
        call_function("replace", sym, lit(s" $l $r "), lit(s" $l$r ")),
        lit(s" $l $r "), lit(s" $l$r "))
    }
    val vocab = docWords.select(col("__w")).distinct()
      .withColumn("__syms",
        size(filter(split(trim(encoded), " "), s => length(s) > 0)).cast("long"))
      .select(col("__w"), col("__syms"))
    df.select(col(idCol))
      .join(docWords.join(vocab, "__w")
        .groupBy(col(idCol))
        .agg(sum(col("__n") * col("__syms")).as("__t")), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__t"), lit(0L)).as("bpe_tokens"))
  }

  /** Per-language tokenizer fertility under a learned BPE merge list — the
    * tokenizer-efficiency audit a multilingual pipeline publishes next to
    * its dataset card: `tokens_per_word` (fertility; ~1 means whole words
    * survive as single tokens, high values mean the language is being
    * shredded into characters and will pay more sequence length per
    * sentence) and `chars_per_token` (compression). Volumes are exact
    * integer sums; the two ratios round to 6.
    *
    * Output: (langCol, n_docs, words, chars, bpe_tokens, tokens_per_word,
    * chars_per_token), one row per language; a language whose docs are all
    * token-free keeps a row with zero volumes and 0.0 ratios.
    *
    * Scale shape (100 TB): per-doc token counts come from [[bpeEncode]]
    * (cost on the VOCABULARY, one corpus pass); word/char volumes are one
    * array-kernel projection (no explode) + a languages-sized hash
    * aggregation. Nothing here is corpus-held: the output is |languages|
    * rows. */
  def tokenFertility(df: DataFrame, idCol: String, textCol: String,
                     langCol: String,
                     merges: Seq[(String, String)]): DataFrame = {
    val id = col(idCol)
    val arr = graft.functions.minhashExprs.wordGrams(
      TextFunctions.normalized(col(textCol)), 1)
    val stats = df.select(col(langCol), id,
      size(arr).cast("long").as("__w"),
      aggregate(arr, lit(0L), (a, x) => a + length(x)).as("__ch"))
    val enc = bpeEncode(df, idCol, textCol, merges)
    val words = col("words")
    val toks = col("bpe_tokens")
    stats.join(enc, Seq(idCol))
      .groupBy(col(langCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__w")).as("words"),
        sum(col("__ch")).as("chars"),
        sum(col("bpe_tokens")).as("bpe_tokens"))
      .select(col(langCol), col("n_docs"), words, col("chars"), toks,
        when(words === 0, 0.0)
          .otherwise(round(toks.cast("double") / words, 6))
          .as("tokens_per_word"),
        when(toks === 0, 0.0)
          .otherwise(round(col("chars").cast("double") / toks, 6))
          .as("chars_per_token"))
  }

  /** Corpus Zipf-law fit: weighted log-log OLS of token frequency against
    * frequency rank — the power-law audit of a corpus's token
    * distribution. Natural-language corpora fit ln f ≈ intercept +
    * slope·ln rank with slope ≈ −1 (Zipf); heavily templated, synthetic,
    * or machine-generated text bends the curve, so the slope is a cheap
    * whole-corpus quality signal to publish next to [[corpusCard]].
    *
    * Ranks are tie-grouped: all tokens sharing a frequency take that
    * group's MIDPOINT rank (offset + (count+1)/2 — the standard
    * average-rank treatment), which makes the fit a pure function of the
    * frequency HISTOGRAM — no per-token rank window over the vocabulary.
    * The OLS runs weighted by group size over (x = ln midrank,
    * y = ln freq), both rounded to 9; per-group x·y and x² quantize to the
    * 1e-6 grid and all five sums accumulate as EXACT decimals (38,0) —
    * order-free across partitions and engines; the closed-form slope/
    * intercept then evaluate in one fixed-order double expression,
    * rounded to 6. Output: one row (n_terms, total_tokens, slope,
    * intercept). Degenerate corpora (a single distinct frequency) have no
    * defined slope — both emit 0.0.
    *
    * Scale shape (100 TB): one corpus-volume token count (map-side
    * combined), then everything operates on the DISTINCT-FREQUENCY frame —
    * O(√total-tokens) rows by Zipf itself (frequency values thin out
    * quadratically), so the offsets self-join is a few-thousand-row
    * triangle even at web scale; the final aggregate is one row. No
    * windows, no driver state. */
  /** Packing-efficiency audit over a [[packSequences]] plan: per (grp,
    * pack_id) the document count, token total, and fill fraction against
    * the budget — the waste metric a training-ingest pipeline watches
    * (next-fit leaves tail gaps; fill > 1 flags an oversize single-doc
    * pack, which packSequences isolates by contract). One bounded hash
    * aggregation over the plan frame; output is pack-cardinality-sized. */
  def packStats(packed: DataFrame, budget: Int): DataFrame = {
    require(budget > 0, s"bad budget $budget")
    packed.groupBy(col("grp"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"))
      .withColumn("fill",
        round(col("pack_tokens") / lit(budget.toDouble), 6))
  }

  /** Count-Min sketch of the corpus token frequencies (Cormode &
    * Muthukrishnan '05) in relational form: the sketch IS a (row, slot,
    * cnt) frame of AT MOST depth×width rows. Each token occurrence maps to
    * one slot per hash row (slot = md5(seed:row:token)[0:8] mod width —
    * the engine-replayable md5 idiom, a pure function any engine
    * recomputes); counts are a plain hash aggregation, so map-side combine
    * caps what each partition ships at depth×width counters REGARDLESS of
    * vocabulary — the whole point at 100 TB, where exact per-token counts
    * shuffle billions of distinct keys but the CM summary ships a fixed
    * grid. Merging shards/streams is elementwise addition, which the
    * aggregation already is.
    *
    * Output: (row, slot, cnt) — sparse (absent slots are zero). */
  def cmSketch(df: DataFrame, textCol: String, depth: Int = 3,
               width: Int = 64, seed: Long = 42L): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2 && width <= (1 << 20),
      s"width must be in [2, 2^20], got $width")
    val toks = df.select(explode(graft.functions.minhashExprs.wordGrams(
      TextFunctions.normalized(col(textCol)), 1)).as("__t"))
    val cells = toks.select(explode(array((0 until depth).map { r =>
      struct(lit(r).as("row"),
        (conv(substring(md5(concat(lit(s"$seed:$r:"), col("__t"))), 1, 8),
          16, 10).cast("long") % width).as("slot"))
    }: _*)).as("__cell"))
    cells.groupBy(col("__cell.row").as("row"), col("__cell.slot").as("slot"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates from a [[cmSketch]] frame: for each query
    * token, est = min over hash rows of the count in that row's slot
    * (absent slot = 0) — the CM guarantee est ≥ true count, with
    * overestimate bounded by the collision mass of the LIGHTEST row. The
    * sketch side of the join is ≤ depth×width rows by construction, but
    * that can reach 16M at the parameter bounds, so the hint is left to
    * AQE (broadcast-when-fits — the bm25TopK r11 lesson) rather than
    * forced.
    *
    * Output: (token, est). */
  def cmEstimate(sketch: DataFrame, tokens: DataFrame, tokenCol: String,
                 depth: Int = 3, width: Int = 64,
                 seed: Long = 42L): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2 && width <= (1 << 20),
      s"width must be in [2, 2^20], got $width")
    val probes = tokens.select(col(tokenCol).as("token"))
      .select(col("token"), explode(array((0 until depth).map { r =>
        struct(lit(r).as("row"),
          (conv(substring(md5(concat(lit(s"$seed:$r:"), col("token"))), 1, 8),
            16, 10).cast("long") % width).as("slot"))
      }: _*)).as("__cell"))
      .select(col("token"), col("__cell.row").as("row"),
        col("__cell.slot").as("slot"))
    probes.join(sketch, Seq("row", "slot"), "left")
      .groupBy(col("token"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  def zipfFit(df: DataFrame, textCol: String): DataFrame = {
    val freq = df.select(explode(graft.functions.minhashExprs.wordGrams(
        TextFunctions.normalized(col(textCol)), 1)).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__c"))
    val fd = freq.groupBy(col("__c")).agg(count(lit(1)).as("__cnt"))
    val off = fd.as("a").join(fd.as("b"), col("b.__c") > col("a.__c"), "left")
      .groupBy(col("a.__c").as("__c"), col("a.__cnt").as("__cnt"))
      .agg(coalesce(sum(col("b.__cnt")), lit(0L)).as("__off"))
    val dec = DecimalType(38, 0)
    val terms = off
      .withColumn("__x", round(log(col("__off") +
        (col("__cnt") + lit(1L)) / lit(2.0)), 9))
      .withColumn("__y", round(log(col("__c").cast("double")), 9))
      .withColumn("__xq", round(col("__x") * 1e6, 0).cast("long"))
      .withColumn("__yq", round(col("__y") * 1e6, 0).cast("long"))
      .withColumn("__xyq", round(col("__x") * col("__y") * 1e6, 0).cast("long"))
      .withColumn("__xxq", round(col("__x") * col("__x") * 1e6, 0).cast("long"))
    val sums = terms.agg(
      sum(col("__cnt")).as("__n"),
      sum(col("__cnt") * col("__c")).as("__tot"),
      sum(col("__cnt").cast(dec) * col("__xq")).as("__sx"),
      sum(col("__cnt").cast(dec) * col("__yq")).as("__sy"),
      sum(col("__cnt").cast(dec) * col("__xyq")).as("__sxy"),
      sum(col("__cnt").cast(dec) * col("__xxq")).as("__sxx"),
      count(lit(1)).as("__ngroups"))
    val w = col("__n").cast("double")
    val sx = col("__sx").cast("double") / 1e6
    val sy = col("__sy").cast("double") / 1e6
    val sxy = col("__sxy").cast("double") / 1e6
    val sxx = col("__sxx").cast("double") / 1e6
    val den = w * sxx - sx * sx
    val slope = (w * sxy - sx * sy) / den
    sums.select(
      coalesce(col("__n"), lit(0L)).as("n_terms"),
      coalesce(col("__tot"), lit(0L)).as("total_tokens"),
      when(col("__ngroups") <= 1, 0.0)
        .otherwise(round(slope, 6)).as("slope"),
      when(col("__ngroups") <= 1, 0.0)
        .otherwise(round((sy - slope * sx) / w, 6)).as("intercept"))
  }

  /** Per-document n-gram novelty: the fraction of a document's DISTINCT
    * word n-grams whose corpus-wide first owner (minimum id) is this
    * document. The corpus-redundancy curve of a crawl: plot novelty over
    * ingestion order and you see the "new data is running out" signal the
    * data-constrained-scaling literature measures (late documents
    * contribute ever fewer first-seen n-grams); a near-duplicate scores
    * ~0 against the copy that beat it in id order. Output: (idCol,
    * n_grams, n_novel, novelty round-6); docs with < n tokens keep a row
    * (0, 0, 0.0).
    *
    * Attribution is by MIN ID, not arrival time — deterministic under any
    * layout and engine-replayable, matching the keep-min convention of
    * every dedup keeper choice in [[Dedup]].
    *
    * Scale shape (100 TB): one corpus-volume distinct over (doc, gram)
    * (map-side combined), one gram-keyed min aggregation over it — the
    * gram join back reuses the partitioning the distinct already
    * established, so AQE plans a single shuffle family; the per-doc
    * rollup shuffles on the id key. No windows, no broadcasts needed, no
    * driver state. */
  def gramNovelty(df: DataFrame, idCol: String, textCol: String,
                  n: Int = 3): DataFrame = {
    require(n >= 1 && n <= 8, s"gram order must be in [1,8], got $n")
    val id = col(idCol)
    val tg = df.select(id,
        explode(graft.functions.minhashExprs.wordGrams(
          TextFunctions.normalized(col(textCol)), n)).as("__g"))
      .distinct()
    val first = tg.groupBy(col("__g")).agg(min(id).as("__fd"))
    val per = tg.join(first, "__g")
      .groupBy(id)
      .agg(count(lit(1)).as("__ng"),
        sum(when(col("__fd") === id, 1L).otherwise(0L)).as("__nn"))
    val ng = coalesce(col("__ng"), lit(0L))
    df.select(id).join(per, Seq(idCol), "left")
      .select(id, ng.as("n_grams"),
        coalesce(col("__nn"), lit(0L)).as("n_novel"),
        when(ng === 0, 0.0)
          .otherwise(round(col("__nn").cast("double") / col("__ng"), 6))
          .as("novelty"))
  }

  /** Pairwise source-overlap matrix: EXACT token-set Jaccard between every
    * pair of groups (sources/domains/shards) — the cross-contamination /
    * redundancy view a mixing recipe is tuned against ("how much of
    * source B is already in source A's vocabulary"). Token identity is
    * the corpus convention (whitespace tokens of normalized text, the
    * cm_freq/vocab identity).
    *
    * Scale shape: one distinct (group, token) hash aggregation, a
    * token-keyed self-join whose output is bounded by G² per SHARED token
    * (G = group cardinality, guarded — sources, not ids), and G²-sized
    * aggregations after. The guard bounds the JOIN, not just the output:
    * at the default maxGroups=64 a token shared by every group emits at
    * most 64²/2 ≈ 2k pair rows, so the shuffle is ≤ vocab × 2k regardless
    * of corpus size. For more groups, either raise the guard consciously
    * (vocab × G²/2 shuffle), set `tokenDfCap` (below), or use the KMV
    * min-wise Jaccard sketch family — this is the exact matrix for the
    * bounded-G case every corpus report actually has.
    *
    * `tokenDfCap` (0 = off, the exact default): when > 0, tokens present
    * in MORE than `tokenDfCap` groups are dropped from the vocabulary —
    * from both the shared counts AND the per-group sizes, so the Jaccard
    * stays internally consistent. This is the distinctive-vocabulary
    * Jaccard (the winnowSimilarity boilerplate-cap convention): ubiquitous
    * tokens carry no discrimination and dominate the join volume, so
    * capping them bounds the self-join at vocab × cap²/2 while barely
    * moving the matrix. It is a documented APPROXIMATION of the exact
    * token-set Jaccard, not a fence.
    *
    * Groups whose docs all normalize to zero tokens still appear in every
    * pair row, with n = 0 and jaccard 0.0 (empty union defined as 0).
    * Output: (group_a < group_b, n_a, n_b, n_shared, jaccard). */
  def sourceOverlap(df: DataFrame, groupCol: String, textCol: String,
                    maxGroups: Int = 64, tokenDfCap: Int = 0): DataFrame = {
    require(maxGroups >= 2, s"bad maxGroups $maxGroups")
    val gt0 = df.select(col(groupCol).as("__g"),
        explode(graft.functions.minhashExprs.wordGrams(
          TextFunctions.normalized(col(textCol)), 1)).as("__tok"))
      .distinct()
    val gt = if (tokenDfCap > 0) {
      // per-token group-df, then keep only distinctive tokens; the df
      // frame is vocab-sized (one row per token) and the filter join is
      // the same token-keyed shuffle the intersection pays anyway
      val keep = gt0.groupBy(col("__tok")).agg(count(lit(1)).as("__df"))
        .where(col("__df") <= tokenDfCap).select(col("__tok"))
      gt0.join(keep, "__tok")
    } else gt0
    val groups = df.select(col(groupCol)).distinct()
    require(groups.limit(maxGroups + 1).count() <= maxGroups,
      s"sourceOverlap: > $maxGroups groups in '$groupCol' — the overlap " +
        "matrix is G² and the token self-join emits up to G² rows per " +
        "shared token; use the KMV Jaccard sketches for unbounded keys")
    // sizes come from the GROUP set, not the token frame: a token-empty
    // group has no gt row, and an inner join on its size would silently
    // drop every pair involving it from the matrix (r12 ADVICE)
    val sizes = groups.select(col(groupCol).as("__g"))
      .join(gt.groupBy(col("__g")).agg(count(lit(1)).as("__cnt")),
        Seq("__g"), "left")
      .select(col("__g"), coalesce(col("__cnt"), lit(0L)).as("__n"))
    val inter = gt.as("a").join(gt.as("b"),
        col("a.__tok") === col("b.__tok") && col("a.__g") < col("b.__g"))
      .groupBy(col("a.__g").as("group_a"), col("b.__g").as("group_b"))
      .agg(count(lit(1)).as("n_shared"))
    // EVERY unordered pair appears, including fully disjoint ones at
    // Jaccard 0 — a report row that is absent reads as "not measured",
    // not "no overlap". The pair frame is G² over the guarded group set.
    val pairs = groups.select(col(groupCol).as("group_a"))
      .join(groups.select(col(groupCol).as("group_b")),
        col("group_a") < col("group_b"))
    val union = col("n_a") + col("n_b") - col("n_shared")
    pairs
      .join(inter, Seq("group_a", "group_b"), "left")
      .join(broadcast(sizes.select(col("__g").as("group_a"),
        col("__n").as("n_a"))), "group_a")
      .join(broadcast(sizes.select(col("__g").as("group_b"),
        col("__n").as("n_b"))), "group_b")
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("jaccard",
        when(union === 0L, 0.0)
          .otherwise(round(col("n_shared").cast("double") / union, 6)))
  }

  /** Cross-snapshot n-gram novelty, per group: of each group's distinct
    * word n-grams in the AFTER snapshot, the fraction absent from the
    * entire BEFORE snapshot — "how much of the new crawl is genuinely new
    * text" (the cross-corpus sibling of [[gramNovelty]]'s within-corpus
    * first-occurrence measure; n > 1 sees phrase-level novelty that the
    * unigram [[distributionDrift]] cannot). Novelty is measured against
    * the WHOLE before corpus, not per-group: a group plagiarizing another
    * group's old text is not novel.
    *
    * Scale shape (100 TB): distinct-gram aggregation on each side
    * (hash-shuffled on the gram), one LEFT ANTI equi-join on the gram —
    * grams travel as strings once, counts thereafter — and a per-group
    * count aggregation. No windows, no self-joins.
    * Output: (group, n_grams, n_novel, novelty ∈ [0,1], round 6);
    * gram-empty groups report 0/0/0.0. */
  def snapshotNovelty(before: DataFrame, after: DataFrame,
                      groupCol: String, textCol: String,
                      n: Int = 3): DataFrame = {
    require(n >= 1 && n <= 8, s"gram order must be in [1,8], got $n")
    def grams(df: DataFrame, cols: Seq[Column]) = df.select(cols :+
      explode(graft.functions.minhashExprs.wordGrams(
        TextFunctions.normalized(col(textCol)), n)).as("__gram"): _*)
    val beforeGrams = grams(before, Seq.empty).select(col("__gram")).distinct()
    val afterGrams = grams(after, Seq(col(groupCol).as("__g")))
      .select(col("__g"), col("__gram")).distinct()
    val novel = afterGrams.join(beforeGrams, Seq("__gram"), "left_anti")
      .groupBy(col("__g")).agg(count(lit(1)).as("__nn"))
    val per = afterGrams.groupBy(col("__g")).agg(count(lit(1)).as("__ng"))
      .join(novel, Seq("__g"), "left")
      .select(col("__g"), col("__ng"),
        coalesce(col("__nn"), lit(0L)).as("__nn"))
    // every group of the after snapshot appears, even gram-empty ones
    after.select(col(groupCol).as("__g")).distinct()
      .join(per, Seq("__g"), "left")
      .select(col("__g").as(groupCol),
        coalesce(col("__ng"), lit(0L)).as("n_grams"),
        coalesce(col("__nn"), lit(0L)).as("n_novel"),
        when(coalesce(col("__ng"), lit(0L)) === 0L, 0.0)
          .otherwise(round(col("__nn").cast("double") / col("__ng"), 6))
          .as("novelty"))
  }

  /** KMV-sketch path of [[sourceOverlap]] — the unbounded-vocabulary form
    * its docblock routes to: one distinct (group, token) aggregation
    * collapses each group's vocabulary to a k-minimum-values sketch
    * (Beyer et al., SIGMOD 2007 — [[graft.functions.exprs.kmvSketch]]),
    * and the G² pair frame then compares SKETCHES (k longs each), never
    * tokens: per-group distinct-size estimates via kmvEstimate and
    * min-wise Jaccard via kmvJaccard. EXACT whenever |A ∪ B| ≤ k (both
    * finishers collapse to true counts/Jaccard — the value-oracle-able
    * regime); past k the error is the sketch family's measured ~1/√k.
    *
    * Scale shape (100 TB): vocabulary never reaches the pair join — the
    * token-keyed work is ONE hash aggregation into G sketch rows of k
    * longs, so the pair frame costs G²·k array arithmetic regardless of
    * corpus or vocabulary size (vs the exact matrix's vocab × G² shuffle).
    * `maxGroups` guards the G² output like the exact form. Token-empty
    * groups keep their pairs (empty sketch → estimate 0, jaccard 0).
    * Output: (group_a < group_b, est_a, est_b, jaccard_est). */
  def sourceOverlapSketch(df: DataFrame, groupCol: String, textCol: String,
                          k: Int = 1 << 12,
                          maxGroups: Int = 1024): DataFrame = {
    import graft.functions.exprs
    require(k > 1, s"bad k $k")
    require(maxGroups >= 2, s"bad maxGroups $maxGroups")
    val gt = df.select(col(groupCol).as("__g"),
        explode(graft.functions.minhashExprs.wordGrams(
          TextFunctions.normalized(col(textCol)), 1)).as("__tok"))
      .distinct()
    val groups = df.select(col(groupCol)).distinct()
    require(groups.limit(maxGroups + 1).count() <= maxGroups,
      s"sourceOverlapSketch: > $maxGroups groups in '$groupCol' — the " +
        "pair matrix is G²·k; raise the guard consciously")
    val emptySk = array().cast("array<long>")
    val sk = groups.select(col(groupCol).as("__g"))
      .join(gt.groupBy(col("__g"))
          .agg(exprs.kmvSketch(col("__tok"), k).as("__sk0")),
        Seq("__g"), "left")
      .select(col("__g"), coalesce(col("__sk0"), emptySk).as("__sk"))
    // spread the probe side: the sketch frame is G rows and often lands
    // in 1-2 partitions, which would serialize the G²·k pair arithmetic
    // (the expensive part — interpreted array ops on k-long sketches)
    // onto a couple of cores; G-way repartitioning caps at the pair
    // frame's own parallelism (measured 4.4× on the 128-group probe)
    val a = sk.select(col("__g").as("group_a"), col("__sk").as("__ska"))
      .repartition(math.min(maxGroups,
        df.sparkSession.sparkContext.defaultParallelism))
    val b = sk.select(col("__g").as("group_b"), col("__sk").as("__skb"))
    a.join(broadcast(b), col("group_a") < col("group_b"))
      .select(col("group_a"), col("group_b"),
        round(exprs.kmvEstimate(col("__ska"), k), 6).as("est_a"),
        round(exprs.kmvEstimate(col("__skb"), k), 6).as("est_b"),
        round(exprs.kmvJaccard(col("__ska"), col("__skb"), k), 6)
          .as("jaccard_est"))
  }

  /** Corpus version diff — what changed between two crawls/snapshots of
    * the same id space: per-id status ∈ added / removed / modified /
    * unchanged, with content identity by normalized-text md5 fingerprint
    * (the dedup_exact identity, so whitespace/punctuation-only churn
    * counts as unchanged — the behavior a re-crawl audit wants).
    *
    * Scale shape: two map-only fingerprint projections and ONE full-outer
    * equi-join on the id — fingerprints travel as 32-char strings instead
    * of document bodies, so the shuffle is id+hash wide regardless of
    * text size. The summary a curation run reports is one groupBy over
    * the output. */
  def corpusDiff(before: DataFrame, after: DataFrame,
                 idCol: String, textCol: String): DataFrame = {
    val b = before.select(col(idCol),
      TextFunctions.fingerprintMd5(col(textCol)).as("__fb"))
    val a = after.select(col(idCol),
      TextFunctions.fingerprintMd5(col(textCol)).as("__fa"))
    b.join(a, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__fb").isNull, "added")
          .when(col("__fa").isNull, "removed")
          .when(col("__fa") === col("__fb"), "unchanged")
          .otherwise("modified").as("status"))
  }

  /** Token-DISTRIBUTION drift between two corpus snapshots, per group
    * (source/domain/shard): Jensen-Shannon divergence (nats) and L1
    * distance between each group's unigram occurrence distributions —
    * the distribution-level companion of [[corpusDiff]]'s id-level view,
    * and the drift monitor a recurring crawl runs ("did source X's
    * content shift, not just its doc set"). Token identity is the corpus
    * convention (whitespace tokens of normalized text, occurrence-
    * weighted — the cm_freq identity, NOT the distinct-set identity of
    * [[sourceOverlap]]).
    *
    *   p_t = c_before(t)/T_before,  q_t = c_after(t)/T_after
    *   JS  = ½ Σ p·ln(2p/(p+q)) + ½ Σ q·ln(2q/(p+q))   ∈ [0, ln 2]
    *   L1  = Σ |p − q|                                  ∈ [0, 2]
    *
    * A group absent from one snapshot has q ≡ 0 (or p ≡ 0) as the ZERO
    * MEASURE — its KL and L1 legs contribute nothing — so JS = ln2/2, L1 = 1:
    * the JS ceiling under this convention, which is what "the source
    * vanished" reads as (two PROPER distributions never exceed ln 2
    * overall and hit it only when disjoint).
    * Cross-engine determinism: each ln rounds to the 1e-9 grid and each
    * term quantizes to a 1e-9-grid long before the sum (order-free
    * integer addition, the lm_score convention); count products go
    * through doubles BEFORE multiplying so 100-TB token totals cannot
    * overflow long.
    *
    * Scale shape (100 TB): two (group, token) hash aggregations (map-side
    * combined), ONE full-outer equi-join on (group, token) — counts
    * travel, never text — two map-only per-group total scans joined back
    * broadcast (group-cardinality-sized), and one final per-group
    * aggregation. No windows, no self-joins, no G² anything: cost is
    * linear in vocabulary × groups.
    * Output: (group, n_before, n_after, js_div, l1_dist). */
  def distributionDrift(before: DataFrame, after: DataFrame,
                        groupCol: String, textCol: String): DataFrame = {
    def toks(df: DataFrame) = df.select(col(groupCol).as("__g"),
      explode(graft.functions.minhashExprs.wordGrams(
        TextFunctions.normalized(col(textCol)), 1)).as("__tok"))
    def totals(df: DataFrame, as: String) = df
      .select(col(groupCol).as("__g"),
        size(graft.functions.minhashExprs.wordGrams(
          TextFunctions.normalized(col(textCol)), 1)).cast("long").as("__n"))
      .groupBy(col("__g")).agg(sum(col("__n")).as(as))
    val cb = toks(before).groupBy(col("__g"), col("__tok"))
      .agg(count(lit(1)).as("__cb"))
    val ca = toks(after).groupBy(col("__g"), col("__tok"))
      .agg(count(lit(1)).as("__ca"))
    val joined = cb.join(ca, Seq("__g", "__tok"), "full_outer")
      .select(col("__g"), col("__tok"),
        coalesce(col("__cb"), lit(0L)).as("__cb"),
        coalesce(col("__ca"), lit(0L)).as("__ca"))
      .join(broadcast(totals(before, "__tb")), Seq("__g"), "left")
      .join(broadcast(totals(after, "__ta")), Seq("__g"), "left")
      .select(col("__g"), col("__cb"), col("__ca"),
        coalesce(col("__tb"), lit(0L)).as("__tb"),
        coalesce(col("__ta"), lit(0L)).as("__ta"))
    val d = (c: Column) => c.cast("double")
    val p = when(col("__tb") === 0L, 0.0).otherwise(d(col("__cb")) / d(col("__tb")))
    val q = when(col("__ta") === 0L, 0.0).otherwise(d(col("__ca")) / d(col("__ta")))
    // ln(2p/(p+q)) with the denominators cleared: 2·cb·ta/(cb·ta + ca·tb)
    // — all-double products (overflow-safe), one deterministic division.
    // cb = 0 ⇒ term 0 (0·ln 0 = 0); ta = 0 ⇒ q ≡ 0 ⇒ ratio exactly 2.
    val lnP = when(col("__cb") === 0L, 0.0)
      .when(col("__ta") === 0L, round(log(lit(2.0)), 9))
      .otherwise(round(log(lit(2.0) * d(col("__cb")) * d(col("__ta"))
        / (d(col("__cb")) * d(col("__ta")) + d(col("__ca")) * d(col("__tb")))), 9))
    val lnQ = when(col("__ca") === 0L, 0.0)
      .when(col("__tb") === 0L, round(log(lit(2.0)), 9))
      .otherwise(round(log(lit(2.0) * d(col("__ca")) * d(col("__tb"))
        / (d(col("__cb")) * d(col("__ta")) + d(col("__ca")) * d(col("__tb")))), 9))
    joined
      .select(col("__g"), col("__cb"), col("__ca"),
        round(p * lnP * 1e9, 0).cast("long").as("__jp"),
        round(q * lnQ * 1e9, 0).cast("long").as("__jq"),
        round(abs(p - q) * 1e9, 0).cast("long").as("__l1"))
      .groupBy(col("__g"))
      .agg(sum(col("__cb")).as("n_before"), sum(col("__ca")).as("n_after"),
        round((sum(col("__jp")) + sum(col("__jq"))).cast("double") / 2e9, 6)
          .as("js_div"),
        round(sum(col("__l1")).cast("double") / 1e9, 6).as("l1_dist"))
      .withColumnRenamed("__g", groupCol)
  }
}
