package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{exprs, TextFunctions}

/** Deduplication operators for training-data pipelines — exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design: every variant is shuffle-bounded by a *key* (hash, band,
  * simhash prefix, LSH bucket) — never an all-pairs comparison. Candidate
  * generation is a hash-partitioned self-join on the bucket key; only
  * within-bucket pairs are verified. That is the standard web-scale recipe
  * (MinHashLSH as in Broder '97 / the Spark ML implementation's band trick)
  * and holds at 100 TB: cost ~ O(docs × signature) + O(bucket pair counts).
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup on arbitrary key columns: one row per group with the
    * surviving (minimum) id and the duplicate count. */
  def exactGroups(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("dup_cnt"))

  /** Exact near-dup on normalized text (case/punct/whitespace-insensitive):
    * groups by md5(normalized). */
  def exactTextGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextFunctions.fingerprintMd5(col(textCol)).as("text_hash"))
      .groupBy(col("text_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("dup_cnt"))

  /** `dropDuplicates` semantics, keeping the min-id row per key — exact
    * semantics without relying on Spark's arbitrary-row choice. */
  def dedupKeepMin(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    val keep = df.groupBy(keyCols.map(col): _*).agg(min(col(idCol)).as(idCol))
    df.join(keep, keyCols :+ idCol, "left_semi")
  }

  // ------------------------------------------------------------- shingles

  /** Word w-shingles (default w=3) of normalized text. */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = TextFunctions.tokens(TextFunctions.normalized(text))
    when(size(toks) < w, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(1), size(toks) - (w - 1)),
        i => concat_ws(" ", slice(toks, i, lit(w)))))
  }

  // -------------------------------------------------------- MinHash + LSH

  /** MinHash signature (numHashes values) of a shingle array: shingle →
    * xxhash64 once, then per-"permutation" min of the salted re-hash
    * xxhash64(h, i). Salted re-hashing replaces the classic (a*h+b mod p)
    * affine family — same independence in practice, and no 64-bit overflow
    * under ANSI arithmetic. Pure expression tree, fully codegen'd, no
    * shuffle. */
  def minhashSignature(shingleCol: Column, numHashes: Int = 64, seed: Long = 42L): Column = {
    val hashes = transform(shingleCol, s => xxhash64(s, lit(seed)))
    array((0 until numHashes).map { i =>
      array_min(transform(hashes, h => xxhash64(h, lit(i))))
    }: _*)
  }

  /** LSH band keys: signature split into `bands` bands of `rows` values,
    * each hashed — docs sharing any band key are candidates. */
  def bandKeys(sigCol: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"), xxhash64(slice(sigCol, b * rows + 1, lit(rows))).as("bkey")))

  /** Candidate near-dup pairs via MinHash LSH, verified with exact Jaccard
    * over the shingle sets. Returns (id_a, id_b, jaccard) with id_a < id_b
    * and jaccard >= threshold.
    *
    * Plan shape: explode bands (docs × bands rows) → self-join on
    * (band, bkey) hash keys → distinct pairs → verify by joining shingle
    * arrays back (both sides shuffled by id — bounded by candidate count,
    * not |docs|²).
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 64, bands: Int = 16,
                   threshold: Double = 0.7): DataFrame = {
    val rows = numHashes / bands
    val withSig = df.select(
      col(idCol).as("id"),
      shingles(col(textCol)).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    val exploded = withSig
      .select(col("id"), explode(bandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val a = exploded.alias("a")
    val b = exploded.alias("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val sh = withSig.select(col("id"), col("sh"))
    candidates
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact Jaccard over two string arrays (as sets). */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    val inter = size(array_intersect(da, db))
    val union = size(da) + size(db) - inter
    when(union === 0, 0.0).otherwise(inter.cast("double") / union)
  }

  // -------------------------------------------------------------- SimHash

  /** Per-doc 64-bit SimHash of word tokens (custom codegen expression). */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      exprs.simhash64(TextFunctions.tokens(TextFunctions.normalized(col(textCol))))
        .as("simhash"))

  /** SimHash near-dup pairs with Hamming distance <= maxBits, bucketed by
    * the 4 16-bit chunks (pigeonhole: any pair within 3 bits shares at least
    * one exact chunk — standard simhash blocking, shuffle on chunk keys). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxBits: Int = 3): DataFrame = {
    val sh = simhash(df, idCol, textCol)
    val chunked = sh.select(col("id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          (shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL)).as("ckey"))): _*))
        .as("ck"))
      .select(col("id"), col("simhash"), col("ck.chunk").as("chunk"), col("ck.ckey").as("ckey"))
    val a = chunked.alias("a")
    val b = chunked.alias("b")
    a.join(b,
        col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxBits)
  }

  // -------------------------------------------- n-gram Jaccard (direct)

  /** Character n-gram Jaccard similarity pairs over an LSH-prefiltered
    * candidate set (reuses MinHash banding for candidates, verifies with
    * character trigram Jaccard instead of word shingles). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val withGrams = df.select(col(idCol).as("id"),
      charNgrams(col(textCol), n).as("grams"))
    val withSig = withGrams.withColumn("sig", minhashSignature(col("grams"), 32))
    val exploded = withSig
      .select(col("id"), explode(bandKeys(col("sig"), 8, 4)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val a = exploded.alias("a")
    val b = exploded.alias("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val g = withGrams.select(col("id"), col("grams"))
    candidates
      .join(g.select(col("id").as("id_a"), col("grams").as("g_a")), "id_a")
      .join(g.select(col("id").as("id_b"), col("grams").as("g_b")), "id_b")
      .withColumn("jaccard", jaccard(col("g_a"), col("g_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Character n-grams of normalized text. */
  def charNgrams(text: Column, n: Int): Column = {
    val norm = TextFunctions.normalized(text)
    when(length(norm) <= n, array(norm))
      .otherwise(transform(sequence(lit(1), length(norm) - (n - 1)),
        i => substring(norm, i, lit(n))))
  }

  // ------------------------------------------- embedding cosine near-dup

  /** Embedding near-duplicate pairs: cosine >= threshold, candidates from
    * random-hyperplane LSH buckets (see [[Similarity.lshBucket]]) so the
    * self-join is bucket-local, then exact cosine verification with the
    * fused codegen kernel. */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double = 0.95, planes: Int = 8,
                     seed: Long = 7L): DataFrame = {
    val withBucket = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", Similarity.lshBucket(col("vec"), planes, seed))
    val a = withBucket.alias("a")
    val b = withBucket.alias("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("cosine", exprs.cosineSimilarity(col("a.vec"), col("b.vec")))
      .where(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("cosine"), 6).as("cosine"))
  }
}
