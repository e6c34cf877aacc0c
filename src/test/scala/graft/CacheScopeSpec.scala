package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.{Dedup, Sampling}

/** Scoped cache ownership (r13 verdict item 8): a library caller outside
  * the bench loop must get deterministic release of the pipelines'
  * tracked persists — without reaching for the session-global
  * unpersistAll(). Assertions check the storage level of the SPECIFIC
  * frames the scope owned, never the session-global persistent-RDD set
  * (concurrent suites on the shared session legitimately mutate that —
  * the first version of this spec failed exactly that way in the full
  * parallel-suite run). The registry itself is single-threaded by
  * contract; where a concurrent suite's unpersistAll() could interleave,
  * the affected positive assertions cancel() rather than fail — the
  * release assertions (storageLevel == NONE after the scope) are
  * race-immune in the failing direction, since no other suite can
  * RE-persist this spec's frames. */
class CacheScopeSpec extends SparkSuite {
  import spark.implicits._

  test("withCaches releases every tracked persist created inside the " +
      "scope — zero leaked frames for a library caller") {
    val docs = table("documents").select(col("doc_id"), col("text"))
    var scoped: List[org.apache.spark.sql.DataFrame] = Nil
    val (nPairs, nKept) = Dedup.withCaches {
      val mark = Dedup.trackedSnapshot
      // two pipelines that track persists internally: the LSH signature
      // caches (minhashPairs) and the token-budget sampler's bucket pin
      val pairs = Dedup.minhashPairs(docs, "doc_id", "text").count()
      val kept = Sampling.tokenBudgetSample(
        docs.select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", budget = 500L).count()
      val snap = Dedup.trackedSnapshot
      scoped = snap.filterNot(f => mark.exists(_ eq f))
      (pairs, kept)
    }
    assert(nKept > 0)
    assert(nPairs >= 0)
    if (scoped.isEmpty)
      cancel("registry concurrently cleared mid-scope by another suite")
    val leaked = scoped.filter(_.storageLevel != StorageLevel.NONE)
    assert(leaked.isEmpty,
      s"withCaches leaked ${leaked.size} persisted frames")
  }

  test("withCaches releases ONLY its own scope: outer tracked frames " +
      "survive, nested scopes release LIFO, exceptions still release") {
    val outer = Dedup.track(
      Seq((1L, "a"), (2L, "b")).toDF("id", "t").cache())
    outer.count()
    try {
      // nested scope: inner tracks + releases, outer cache untouched
      var inner: org.apache.spark.sql.DataFrame = null
      Dedup.withCaches {
        inner = Dedup.track(Seq((3L, "c")).toDF("id", "t").cache())
        inner.count()
      }
      assert(inner.storageLevel == StorageLevel.NONE,
        "inner scope must release exactly its own additions")
      // exception path: the scope still releases
      var boom: org.apache.spark.sql.DataFrame = null
      intercept[RuntimeException] {
        Dedup.withCaches {
          boom = Dedup.track(Seq((4L, "d")).toDF("id", "t").cache())
          boom.count()
          throw new RuntimeException("boom")
        }
      }
      assert(boom.storageLevel == StorageLevel.NONE,
        "exception path must still release")
      // outer survival: only assertable if no concurrent suite cleared
      // the registry out from under this test (outer would then be
      // legitimately unpersisted by THAT unpersistAll, not by the scopes)
      if (Dedup.trackedSnapshot.exists(_ eq outer))
        assert(outer.storageLevel != StorageLevel.NONE,
          "outer frame must survive both inner scopes")
      else cancel("registry concurrently cleared by another suite")
    } finally outer.unpersist()
  }
}
