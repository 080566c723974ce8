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

  /** Fixed-iteration HITS: hubs (pages that link to good authorities)
    * and authorities (pages good hubs link to) — the complementary pair
    * to [[pageRank]]'s single score: a link-farm host can buy in-links
    * (authority) but a curated directory is a hub, and spam filtering
    * uses both. L1 normalization each half-step keeps values bounded and
    * deterministic (the max-norm variant is equivalent up to scale).
    *
    * Same shape per round as pageRank: two host-keyed joins + groupBys
    * over per-host relations, 1-row L1 sums broadcast, localCheckpoint
    * lineage cuts.
    *
    * @return (node, hub round 6, authority round 6) */
  def hits(edges: DataFrame, iters: Int = 5,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val nodes = edges.select(col(srcCol).as("node"))
      .unionByName(edges.select(col(dstCol).as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "hits: empty edge list")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    def l1Normalize(df: DataFrame, c: String): DataFrame = {
      val s = df.agg(sum(col(c)).as("__s"))
      df.crossJoin(broadcast(s))
        .select(col("node"),
          when(col("__s") > 0, col(c) / col("__s")).otherwise(lit(0.0))
            .as(c))
    }
    var hub = nodes.withColumn("hub", lit(1.0 / n))
    var auth = nodes.withColumn("authority", lit(0.0))
    for (_ <- 0 until iters) {
      val aRaw = e.join(hub, e("src") === hub("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum("hub").as("authority"))
      auth = l1Normalize(
        nodes.join(aRaw, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("authority"), lit(0.0)).as("authority")),
        "authority").localCheckpoint()
      val hRaw = e.join(auth, e("dst") === auth("node"))
        .groupBy(col("src").as("node"))
        .agg(sum("authority").as("hub"))
      hub = l1Normalize(
        nodes.join(hRaw, Seq("node"), "left")
          .select(col("node"), coalesce(col("hub"), lit(0.0)).as("hub")),
        "hub").localCheckpoint()
    }
    hub.join(auth, "node")
      .select(col("node"), round(col("hub"), 6).as("hub"),
        round(col("authority"), 6).as("authority"))
  }
}
