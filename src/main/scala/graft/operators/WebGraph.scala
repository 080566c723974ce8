package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** Output rounding for the iterative scores: `Some(d)` → round to d
    * decimals (the default 6 — layout-stable, oracle-replayable);
    * `None` → raw doubles. The raw form exists for scale gates: at
    * N > 2e6 ring nodes, 1/N itself rounds to 0 at 6 decimals, so a
    * rounded output cannot distinguish uniform-and-correct from
    * small-bias-broken — ScaleStressGraph gates on the unrounded
    * spread instead (r15 ADVICE #2). */
  private def maybeRound(c: org.apache.spark.sql.Column,
      roundTo: Option[Int]): org.apache.spark.sql.Column =
    roundTo.map(d => round(c, d)).getOrElse(c)

  /** Fixed-iteration PageRank over a (src, dst) edge list.
    *
    * Semantics (the textbook damped form, replayable in plain SQL):
    *   - nodes = distinct endpoints; init rank = 1/N;
    *   - r'(v) = (1−d)/N + d · Σ_{(u,v)∈E} r(u)/outdeg(u);
    *   - dangling-node mass is NOT redistributed (leaks, as in the
    *     original formulation) — deterministic and oracle-friendly;
    *   - parallel edges are deliberate weight (each contributes).
    *
    * @return (node, rank round 6 — or raw when roundTo = None) */
  def pageRank(edges: DataFrame, iters: Int = 5, damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst",
      roundTo: Option[Int] = Some(6)): DataFrame = {
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
    ranks.select(col("node"), maybeRound(col("rank"), roundTo).as("rank"))
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
    * @return (node, hub round 6, authority round 6 — raw when
    *         roundTo = None) */
  def hits(edges: DataFrame, iters: Int = 5,
      srcCol: String = "src", dstCol: String = "dst",
      roundTo: Option[Int] = Some(6)): DataFrame = {
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
      .select(col("node"), maybeRound(col("hub"), roundTo).as("hub"),
        maybeRound(col("authority"), roundTo).as("authority"))
  }

  /** Personalized PageRank: random-walk-with-restart where the restart
    * mass lands ONLY on the seed set — "importance relative to these
    * hosts", the crawl-frontier prioritizer (expand from trusted seeds)
    * and topical-authority score that global [[pageRank]] can't express.
    *
    * Same per-round shape as pageRank (one host-keyed join + groupBy,
    * lineage cut); the seed vector is a broadcast-scale relation. Seeds
    * absent from the edge list still receive restart mass (they are part
    * of the node set by definition).
    *
    * @return (node, rank round 6 — or raw when roundTo = None) */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iters: Int = 5, damping: Double = 0.85, srcCol: String = "src",
      dstCol: String = "dst", roundTo: Option[Int] = Some(6)): DataFrame = {
    // the init divides the restart column back out by (1 − d): at
    // d = 1.0 that is 0.0/0.0 → NULL in non-ANSI Spark, which coalesces
    // to ALL-ZERO ranks with no error (r14 review) — PPR without
    // restart mass is meaningless anyway, so reject it at plan time
    require(damping >= 0.0 && damping < 1.0,
      s"personalizedPageRank: damping must be in [0, 1), got $damping")
    val sd = seeds.select(col("node")).distinct().localCheckpoint()
    val nSeeds = sd.count()
    require(nSeeds > 0, "personalizedPageRank: empty seed set")
    val nodes = edges.select(col(srcCol).as("node"))
      .unionByName(edges.select(col(dstCol).as("node")))
      .unionByName(sd)
      .distinct()
      .localCheckpoint()
    val outdeg = edges.groupBy(col(srcCol).as("node"))
      .agg(count(lit(1)).as("outdeg"))
    val contribEdges = edges
      .join(outdeg, edges(srcCol) === outdeg("node"))
      .select(edges(srcCol).as("src"), edges(dstCol).as("dst"),
        col("outdeg"))
      .localCheckpoint()
    val restart = nodes.join(sd.withColumn("__s", lit(1)), Seq("node"),
        "left")
      .select(col("node"),
        when(col("__s").isNotNull, lit((1.0 - damping) / nSeeds))
          .otherwise(lit(0.0)).as("restart"))
      .localCheckpoint()
    var ranks = restart.select(col("node"),
      (col("restart") / (1.0 - damping)).as("rank")) // init: seed mass
    for (_ <- 0 until iters) {
      val contrib = contribEdges
        .join(ranks, contribEdges("src") === ranks("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("outdeg")).as("c"))
      ranks = restart.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (col("restart") +
            lit(damping) * coalesce(col("c"), lit(0.0))).as("rank"))
        .localCheckpoint()
    }
    ranks.select(col("node"), maybeRound(col("rank"), roundTo).as("rank"))
  }

  /** Distinct undirected neighbor pairs (a, b) from a directed edge list —
    * both orientations, self-loops dropped, parallel edges collapsed. */
  private def undirected(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** Synchronous label-propagation community detection — the cheap
    * host-clustering signal (mirror farms / boilerplate networks share a
    * community; per-community caps then bound near-duplicate sources the
    * pairwise dedup never compares).
    *
    * Deterministic form (plain LPA is order-dependent): SYNCHRONOUS
    * rounds, every node updates from the previous round's labels; new
    * label = most frequent neighbor label, ties broken by SMALLEST label.
    * Fixed iteration count so an oracle can replay the rounds unrolled.
    *
    * Scale: one round = two host-keyed aggregations over the (host-scale)
    * neighbor list, lineage cut per round. Tie-break needs no window —
    * `min_by(label, struct(-cnt, label))` is a plain aggregate.
    *
    * @return (node, label) */
  def labelPropagation(edges: DataFrame, iters: Int = 3,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val und = undirected(edges, srcCol, dstCol).localCheckpoint()
    var labels = und.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    for (_ <- 0 until iters) {
      val counts = und
        .join(labels, und("b") === labels("node"))
        .groupBy(col("a"), col("label")).agg(count(lit(1)).as("cnt"))
      labels = counts
        .groupBy(col("a").as("node"))
        .agg(min_by(col("label"), struct((-col("cnt")).as("nc"),
          col("label"))).as("label"))
        .localCheckpoint()
    }
    labels
  }

  /** Per-node triangle count + local clustering coefficient — the
    * link-farm shape signal (spam rings are near-cliques: high clustering
    * at high degree; legitimate hub hosts have low clustering).
    *
    * Canonical-edge enumeration (a < b < c): each triangle is built
    * exactly once from two canonical edges sharing the middle node plus a
    * closing-edge semi-join — never the 6× wedge blowup. All joins are
    * host-keyed equi-joins; degrees come from the same undirected list.
    *
    * @return (node, degree, triangles, clustering round 4) */
  def triangleStats(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val und = undirected(edges, srcCol, dstCol).localCheckpoint()
    val canon = und.filter(col("a") < col("b"))
    val tri = canon.as("e1")
      .join(canon.as("e2"), col("e1.b") === col("e2.a"))
      .join(canon.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"),
        "left_semi")
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val perNode = tri.select(col("x").as("node"))
      .unionByName(tri.select(col("y").as("node")))
      .unionByName(tri.select(col("z").as("node")))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    val deg = und.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("degree"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        round(when(col("degree") >= 2,
          lit(2.0) * coalesce(col("triangles"), lit(0L)) /
            (col("degree") * (col("degree") - 1)))
          .otherwise(lit(0.0)), 4).as("clustering"))
  }

  /** Bounded-hop BFS from a seed set: minimum hop distance along DIRECTED
    * edges — "everything within k clicks of a known-spam host" is a drop
    * list no pairwise similarity computes. Fixed hop bound (the scale
    * contract: k keyed join+min rounds, frontier never materialized
    * beyond the node table), min-distance semantics.
    *
    * @return (node, dist) for reached nodes only */
  def khopDistances(edges: DataFrame, seeds: DataFrame, maxHops: Int = 3,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint()
    var dist = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0))
    for (h <- 1 to maxHops) {
      val step = e.join(dist.filter(col("dist") === h - 1),
          e("src") === col("node"))
        .select(col("dst").as("node"), lit(h).as("dist"))
      dist = dist.unionByName(step)
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint()
    }
    dist
  }

  /** Item co-visitation similarity over a (user, item) interaction log —
    * the collaborative near-duplicate signal for sources: two hosts whose
    * audiences coincide almost surely mirror each other.
    *
    * Scale contract: the self-join on user is bounded by capping each
    * user at `maxItemsPerUser` items (most-frequent first, item-id
    * tie-break) BEFORE pairing — per-user work is ≤ M², so a power user
    * with 10⁶ interactions cannot detonate the pair count. Cosine =
    * co / √(n_a·n_b) over the capped sets; pairs below `minCo` co-users
    * are noise and dropped pre-shuffle.
    *
    * @return (item_a, item_b, co, cosine round 4) with item_a < item_b */
  def covisitation(interactions: DataFrame, maxItemsPerUser: Int = 20,
      minCo: Int = 2, userCol: String = "user_id",
      itemCol: String = "item"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = interactions
      .groupBy(col(userCol).as("u"), col(itemCol).as("item"))
      .agg(count(lit(1)).as("f"))
    val capped = freq
      .withColumn("rn", row_number().over(
        Window.partitionBy("u").orderBy(col("f").desc, col("item"))))
      .filter(col("rn") <= maxItemsPerUser)
      .select("u", "item")
      .localCheckpoint()
    val itemUsers = capped.groupBy("item").agg(count(lit(1)).as("n"))
    val pairs = capped.as("l")
      .join(capped.as("r"), col("l.u") === col("r.u") &&
        col("l.item") < col("r.item"))
      .groupBy(col("l.item").as("item_a"), col("r.item").as("item_b"))
      .agg(count(lit(1)).as("co"))
      .filter(col("co") >= minCo)
    pairs
      .join(itemUsers.select(col("item").as("item_a"), col("n").as("na")),
        "item_a")
      .join(itemUsers.select(col("item").as("item_b"), col("n").as("nb")),
        "item_b")
      .select(col("item_a"), col("item_b"), col("co"),
        round(col("co") / sqrt(col("na") * col("nb")), 4).as("cosine"))
  }
}
