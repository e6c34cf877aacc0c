package graft

import org.apache.spark.sql.functions._

import graft.queries.PipelineQueries

/** Content-stamped memos (r14 verdict item 8 / watch item 2): the per-dir
  * trained-state memos (BPE merge table, ANN index handles) used to key on
  * the dir PATH alone, so a long-lived JVM that rewrote a dir in place was
  * silently served the prior corpus's trained state unless it remembered to
  * call clearIndexCaches(). Each memo entry now carries a [[FixtureStamp]]
  * of its source table and rebuilds on mismatch — pinned here end-to-end:
  * rewrite the dir in place, observe the NEW corpus's answers with no
  * manual cache reset. */
class FixtureStampSpec extends SparkSuite {
  import spark.implicits._

  test("stamp: stable across re-reads, changes on rewrite, absent sentinel") {
    val dir = tmpDir("stamp")
    assert(FixtureStamp.stamp(s"$dir/nope.parquet") == "absent")
    Seq((1L, "alpha"), (2L, "beta")).toDF("id", "t")
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val s1 = FixtureStamp.stamp(s"$dir/t.parquet")
    val s2 = FixtureStamp.stamp(s"$dir/t.parquet")
    assert(s1 == s2, "unchanged bytes must keep their stamp")
    assert(s1 != "absent" && s1.length == 16)
    Seq((1L, "alpha"), (2L, "GAMMA")).toDF("id", "t")
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val s3 = FixtureStamp.stamp(s"$dir/t.parquet")
    assert(s3 != s1, "rewritten data must change the stamp")
  }

  test("bpeTable memo rebuilds when documents.parquet is rewritten in " +
      "place — stale merge tables cannot survive a corpus swap") {
    val dir = tmpDir("bpestamp")
    // corpus A: 'aa' is overwhelmingly the top adjacent pair
    def corpus(word: String) = (0L until 8L)
      .map(i => (i, Seq.fill(6)(word).mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    corpus("aaaa").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val a = PipelineQueries.bpeEncodeQ(spark, dir).collect()
    // in-place rewrite with a corpus whose induced merges differ entirely
    // corpus B: 13 distinct adjacent pairs — 8 merges cannot collapse the
    // word to one token, so A and B necessarily encode to different counts
    corpus("abcdefghijklmn").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val b = PipelineQueries.bpeEncodeQ(spark, dir).collect()
    // ground truth: the same query against a NEVER-memoized copy of corpus B
    val fresh = tmpDir("bpefresh")
    corpus("abcdefghijklmn").write.mode("overwrite")
      .parquet(s"$fresh/documents.parquet")
    val want = PipelineQueries.bpeEncodeQ(spark, fresh).collect()
    assert(b.map(_.toString).sorted.sameElements(want.map(_.toString).sorted),
      "post-rewrite answer must match a fresh (un-memoized) induction")
    assert(!a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted),
      "fixture error: the two corpora were meant to encode differently")
  }

  test("ANN index memo (liveMemo) rebuilds when embeddings.parquet is " +
      "rewritten in place") {
    val dir = tmpDir("ivfstamp")
    def embeddings(flip: Boolean) = (0L until 64L).map { i =>
      // queries are vec_id < 10; place vec 40+q nearest to query q in one
      // corpus and vec 50+q nearest in the other, far apart in angle
      val base = (i % 16).toDouble
      val x = if (flip) math.cos(base) else math.sin(base + 1.5)
      (i, Array((x + i * 0.01).toFloat, (1.0 - x + (i % 7) * 0.02).toFloat,
        ((i % 5) * 0.1).toFloat, 1.0f))
    }.toDF("vec_id", "embedding")
    embeddings(flip = false)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    PipelineQueries.knnIvf(spark, dir).collect() // trains + memoizes index A
    embeddings(flip = true)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val b = PipelineQueries.knnIvf(spark, dir).collect()
    val fresh = tmpDir("ivffresh")
    embeddings(flip = true)
      .write.mode("overwrite").parquet(s"$fresh/embeddings.parquet")
    val want = PipelineQueries.knnIvf(spark, fresh).collect()
    assert(b.map(_.toString).sorted.sameElements(want.map(_.toString).sorted),
      "post-rewrite knn must match a fresh (un-memoized) index on corpus B")
  }
}
