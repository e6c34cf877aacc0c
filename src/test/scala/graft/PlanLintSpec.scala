package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Plan lint over the ENTIRE contract: every query's static physical plan
  * must be free of the scale anti-patterns the per-round audits check by
  * hand — so a future edit that sneaks in an accidental cross join or an
  * unpartitioned window fails CI instead of surfacing as a 100-TB
  * incident. Static plans (pre-AQE) at sf0.001: construction-time driver
  * probes (guards, totals, index training) run at the smallest fixture.
  *
  * Allow-lists are NAMED and justified inline — additions require the
  * same justification, which is the point. */
class PlanLintSpec extends SparkSuite {

  // BroadcastNestedLoopJoin is legitimate ONLY where a deliberately
  // broadcast-small side meets a non-equi condition:
  //  - brute-force / filtered / graph ANN: the query side is
  //    broadcast-small by contract (bruteForceTopK's documented shape)
  //  - the G²-guarded pair frames of the overlap matrices
  //  - one-row scalar attach (corpus stats cross-joined as literals)
  private val bnljAllowed: Set[String] = Set(
    // broadcast-small query side, non-equi scoring condition
    "knn_bruteforce", "knn_graph", "knn_ivf", "knn_ivfpq", "knn_rp",
    "hybrid_search", "hybrid_search_ann", "hybrid_search_ann_full",
    "semantic_dedup", "kmeans_assign", "diverse_sample",
    "embedding_outliers",
    // G²-guarded pair frames of the overlap matrices
    "source_overlap", "source_overlap_kmv",
    // one-row scalar attach (corpus size / vocab size / thresholds /
    // water-fill level / priors cross-joined as a broadcast literal row —
    // the r12-audited class)
    "tfidf_topterms", "bm25_search", "zipf_fit", "dsir_select",
    "domain_weights", "lm_heldout", "ppl_buckets", "health_score_sql",
    "lm_backoff", "lm_score", "nb_classify", "ngram_exact",
    "skewness_metrics", "unimax_sample")

  // unpartitioned windows are allowed ONLY over provably bounded frames:
  // quality_budget's offset window runs over the guarded DISTINCT-SCORE
  // frame (maxDistinctScores require). It is the ONLY such window in the
  // whole contract — keep it that way.
  private val globalWindowAllowed: Set[String] = Set("quality_budget")

  private def nodes(p: SparkPlan): Seq[SparkPlan] =
    (p +: p.children.flatMap(nodes)) ++ p.subqueries.flatMap(nodes)

  test("no contract plan contains a CartesianProduct; BNLJ and global " +
      "windows only where allow-listed; no stale allowances") {
    val dir = "/root/testdata/sf0.001"
    val all = SparkEntry.queries ++ SparkEntry.benchQueries
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    val bnljSeen = scala.collection.mutable.Set.empty[String]
    val gwSeen = scala.collection.mutable.Set.empty[String]
    all.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.sparkPlan
        val ns = nodes(plan)
        if (ns.exists(_.isInstanceOf[CartesianProductExec]))
          failures += s"$name: CartesianProduct"
        if (ns.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec])) {
          bnljSeen += name
          if (!bnljAllowed(name))
            failures += s"$name: BroadcastNestedLoopJoin (not allow-listed)"
        }
        if (ns.exists {
              case w: WindowExec => w.partitionSpec.isEmpty
              case _ => false
            }) {
          gwSeen += name
          if (!globalWindowAllowed(name))
            failures += s"$name: unpartitioned Window (not allow-listed)"
        }
      } catch {
        case e: Throwable =>
          failures += s"$name: plan construction failed: ${e.getMessage}"
      } finally {
        graft.operators.Dedup.unpersistAll()
      }
    }
    // allowances must stay EARNED: an allow-listed entry whose plan no
    // longer exercises the exemption is a stale hole in the fence
    (bnljAllowed -- bnljSeen).toSeq.sorted.foreach(n =>
      failures += s"$n: stale BNLJ allowance (plan has none — remove it)")
    (globalWindowAllowed -- gwSeen).toSeq.sorted.foreach(n =>
      failures += s"$n: stale global-window allowance (remove it)")
    assert(failures.isEmpty,
      s"\nplan lint violations:\n  ${failures.mkString("\n  ")}")
  }
}
