package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph operators for crawl curation: host-authority PageRank.
  * Low-authority spam hosts are a standard DROP signal in web-corpus
  * pipelines (alongside per-host quality, [[WebText.hostStats]]).
  *
  * Scale design: one iteration = one equi-join of the edge list with the
  * current rank vector plus one groupBy(dst) — both shuffle on the host
  * key only (ranks and degrees are per-HOST relations, orders of
  * magnitude smaller than the corpus). Iterations are FIXED-COUNT (the
  * deterministic form an oracle can replay; convergence-threshold loops
  * need a driver-side reduction per round anyway), and each round's rank
  * vector is localCheckpointed so the plan does not grow linearly with
  * iterations — the classic iterative-lineage blowup.
  */
object WebGraph {

  /** Fixed-iteration PageRank over a (src, dst) edge list.
    *
    * Semantics (the textbook damped form, replayable in plain SQL):
    *   - nodes = distinct endpoints; init rank = 1/N;
    *   - r'(v) = (1−d)/N + d · Σ_{(u,v)∈E} r(u)/outdeg(u);
    *   - dangling-node mass is NOT redistributed (leaks, as in the
    *     original formulation) — deterministic and oracle-friendly;
    *   - parallel edges are deliberate weight (each contributes).
    *
    * @return (node, rank round 6) */
  def pageRank(edges: DataFrame, iters: Int = 5, damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val spark = edges.sparkSession
    val nodes = edges.select(col(srcCol).as("node"))
      .unionByName(edges.select(col(dstCol).as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRank: empty edge list")
    val outdeg = edges.groupBy(col(srcCol).as("node"))
      .agg(count(lit(1)).as("outdeg"))
    // per-edge contribution denominator attached once, outside the loop
    val contribEdges = edges
      .join(outdeg, edges(srcCol) === outdeg("node"))
      .select(edges(srcCol).as("src"), edges(dstCol).as("dst"),
        col("outdeg"))
      .localCheckpoint()
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 0 until iters) {
      val contrib = contribEdges
        .join(ranks, contribEdges("src") === ranks("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("outdeg")).as("c"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("c"), lit(0.0))).as("rank"))
        .localCheckpoint()
    }
    ranks.select(col("node"), round(col("rank"), 6).as("rank"))
  }
}
