package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional at-rest clustering: Z-order (Morton) layout over two
  * numeric columns, so range predicates on EITHER column prune most files
  * — the lakehouse locality technique (Delta/Iceberg OPTIMIZE ZORDER) as
  * plain Column algebra + `repartitionByRange`.
  *
  * Shape at 100 TB: discretization uses a broadcast 1-row min/max
  * aggregate (never a rank window — a global window would single-task
  * the corpus); the z-value is 2·bits bit operations per row inside
  * whole-stage codegen; the write is one range repartition by z (the
  * same shuffle an ORDER BY would pay) with files sorted within
  * partitions, so every file covers a small z-range ⇒ a small rectangle
  * in (a, b) space ⇒ parquet min/max stats prune on both columns.
  */
object Layout {

  /** Interleave the low `bits` of `a` (even positions) and `b` (odd
    * positions) into a Morton code. Inputs must already be in
    * [0, 2^bits). */
  def mortonInterleave(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      val abit = shiftleft(shiftright(a.cast("long"), i).bitwiseAND(1),
        2 * i)
      val bbit = shiftleft(shiftright(b.cast("long"), i).bitwiseAND(1),
        2 * i + 1)
      abit.bitwiseOR(bbit)
    }.reduce((x, y) => x.bitwiseOR(y))
  }

  /** Min/max scale `x` into [0, 2^bits − 1] given the corpus bounds. */
  def scaleToBits(x: Column, minV: Column, maxV: Column,
      bits: Int): Column = {
    val span = (maxV - minV).cast("double")
    val scaled = when(span <= 0.0, lit(0L))
      .otherwise(floor((x - minV).cast("double") / span *
        ((1L << bits) - 1)).cast("long"))
    least(greatest(scaled, lit(0L)), lit((1L << bits) - 1))
  }

  /** (row ++ z) with z = Morton code of the min/max-discretized pair.
    * The bounds come from one broadcast 1-row aggregate. Working columns
    * carry a `__graft_` prefix so an input that happens to contain
    * `min_a`/`max_b`/… can't make the bounds join ambiguous; a
    * pre-existing `z` column is rejected loudly rather than silently
    * overwritten (and later dropped by [[writeZOrdered]]). */
  def withZValue(df: DataFrame, colA: String, colB: String,
      bits: Int = 16): DataFrame = {
    require(!df.columns.contains("z"),
      "input already has a 'z' column; withZValue would overwrite it — " +
        "rename it first")
    val bounds = df.agg(
      min(colA).as("__graft_min_a"), max(colA).as("__graft_max_a"),
      min(colB).as("__graft_min_b"), max(colB).as("__graft_max_b"))
    df.crossJoin(broadcast(bounds))
      .withColumn("z",
        mortonInterleave(
          scaleToBits(col(colA),
            col("__graft_min_a"), col("__graft_max_a"), bits),
          scaleToBits(col(colB),
            col("__graft_min_b"), col("__graft_max_b"), bits),
          bits))
      .drop("__graft_min_a", "__graft_max_a", "__graft_min_b",
        "__graft_max_b")
  }

  /** Equal-width bucket id of `x` over `[lo, hi]` in `n` buckets: the
    * shared discretization behind [[histogram]], [[zoneMapSkipStats]],
    * and `Evaluation.bucketedAuc` — one definition so the bucket
    * boundary semantics can never drift between them. Degenerate span
    * (lo = hi) puts everything in bucket 0; x = hi lands in the last
    * bucket, not a phantom bucket n. A NULL `x` has NO bucket (NULL
    * out) — r14 review: Spark's `least()` SKIPS null arguments, so the
    * raw fold silently sent every NULL value to the TOP bucket,
    * inflating histogram / PSI / zone-map mass at the max end. */
  def equalWidthBucket(x: Column, lo: Column, hi: Column,
      n: Int): Column = {
    val span = (hi - lo).cast("double")
    when(x.isNull, lit(null).cast("long"))
      .otherwise(when(span <= 0.0, lit(0L))
        .otherwise(least(floor((x - lo).cast("double") / span * n)
          .cast("long"), lit(n - 1L))))
  }

  /** Equal-width histogram of a numeric column — the dataset-profiling
    * primitive (length/score/price distributions on a dataset card).
    * Bucket bounds come from the same broadcast 1-row min/max aggregate
    * as the Z-order discretization; counting is one partial-aggregated
    * groupBy over `nBuckets` keys. The max value lands in the LAST
    * bucket (half-open buckets, closed at the top end). NULL values
    * have no bucket and are EXCLUDED (they previously counted as
    * phantom top-bucket mass); [[profileColumns]] is the surface that
    * reports null counts.
    *
    * @return (bucket, lo, hi, n) for non-empty buckets
    */
  def histogram(df: DataFrame, valueCol: String, nBuckets: Int)
      : DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    // `__graft_`-prefixed working names: same collision hazard as
    // withZValue — an input column named `min_v`/`max_v` would make the
    // broadcast bounds join ambiguous.
    val bounds = df.agg(min(valueCol).as("__graft_min_v"),
      max(valueCol).as("__graft_max_v"))
    val span = (col("__graft_max_v") - col("__graft_min_v")).cast("double")
    val bucket = equalWidthBucket(col(valueCol), col("__graft_min_v"),
      col("__graft_max_v"), nBuckets)
    val width = span / nBuckets
    df.filter(col(valueCol).isNotNull)
      .crossJoin(broadcast(bounds))
      .select(bucket.as("bucket"), col("__graft_min_v"),
        width.as("__graft_w"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        round(first(col("__graft_min_v") +
          col("bucket") * col("__graft_w")), 4).as("lo"),
        round(first(col("__graft_min_v") +
          (col("bucket") + 1) * col("__graft_w")), 4).as("hi"))
      .select("bucket", "lo", "hi", "n")
  }

  /** One-pass column profiler — the dataset-card summary (null counts,
    * distinct cardinality, value range per column): ONE aggregate row
    * computes every column's stats in a single scan, then unpivots to a
    * row per column. min/max are rendered as strings so heterogeneous
    * column types stack in one relation.
    *
    * `approximate = true` swaps exact `count(DISTINCT)` (whose multi-
    * column form costs an Expand ∝ #columns) for HLL++ sketches — the
    * 100 TB configuration: the whole profile is then one narrow
    * partial-aggregated pass. Exact mode is the value-checkable contract
    * (q95).
    *
    * @return (column, n_nulls, n_distinct, min_value, max_value) */
  def profile(df: DataFrame, cols: Seq[String],
      approximate: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    if (approximate) {
      // HLL sketches are plain (non-distinct) aggregates, so every
      // column profiles in ONE narrow partial-aggregated pass.
      val aggs = cols.flatMap { c =>
        Seq(count(col(c)).as(s"__cnt_$c"),
          approx_count_distinct(col(c)).as(s"__nd_$c"),
          min(col(c)).cast("string").as(s"__min_$c"),
          max(col(c)).cast("string").as(s"__max_$c"))
      }
      val row = df.agg(count(lit(1)).as("__total"), aggs: _*)
      row.select(explode(array(cols.map { c =>
          struct(lit(c).as("column"),
            (col("__total") - col(s"__cnt_$c")).as("n_nulls"),
            col(s"__nd_$c").as("n_distinct"),
            col(s"__min_$c").as("min_value"),
            col(s"__max_$c").as("max_value"))
        }: _*)).as("p"))
        .select("p.*")
    } else {
      // Exact mode runs one aggregation PER COLUMN, unioned. The
      // obvious one-pass form (all count(DISTINCT c_i) in one agg) is
      // a nondeterministic PLAN: RewriteDistinctAggregates expands one
      // projection per distinct group, and its grouping-key order and
      // gid numbering iterate a hash structure keyed by exprIds — the
      // physical plan (Expand layout, sort keys, gid↔column binding)
      // PERMUTES from run to run with the session's expression counter
      // (r13 BENCH_NOTES; it made q95 fingerprint differently every
      // full-catalog run). Per-column aggregations have a single
      // distinct group each, so the rewrite is deterministic; each
      // scan prunes to its one column, so total bytes read match the
      // wide single scan, without the #cols-way Expand row blowup.
      cols.map { c =>
        df.agg(count(lit(1)).as("__total"),
            count(col(c)).as("__cnt"),
            count_distinct(col(c)).as("__nd"),
            min(col(c)).cast("string").as("__min"),
            max(col(c)).cast("string").as("__max"))
          .select(lit(c).as("column"),
            (col("__total") - col("__cnt")).as("n_nulls"),
            col("__nd").as("n_distinct"),
            col("__min").as("min_value"),
            col("__max").as("max_value"))
      }.reduce(_.unionByName(_))
    }
  }

  /** Distribution drift between a CURRENT corpus slice and a REFERENCE
    * corpus over a categorical column (the language/source-mix monitor a
    * production ingestion pipeline alarms on): per-group counts on both
    * sides, additive-smoothed shares over the UNION of groups (a group
    * present on one side only stays finite), and the per-group
    * contribution `p·ln(p/q)` to KL(current ‖ reference) in nats — sum
    * the column for the total divergence.
    *
    * Shape at 100 TB: one tiny groupBy per side, a full-outer join over
    * #groups rows, a 1-row totals broadcast — nothing corpus-sized
    * survives the first aggregates (q97).
    *
    * @return (groupCol, n_cur, n_ref, p_cur, p_ref, kl_term) */
  def driftScore(current: DataFrame, reference: DataFrame,
      groupCol: String, smoothing: Double = 0.5): DataFrame = {
    require(smoothing > 0.0, "smoothing must be positive")
    // null-safe (<=>) group join (r14 review): a NULL group present on
    // BOTH sides (missing language tags are routine) never matches an
    // equi-key, so the full outer split it into TWO unmatched rows —
    // a spurious current-only p·ln(p/q) penalty plus an inflated group
    // count in the smoothing denominator. Same discipline as
    // Warehouse/Evaluation's <=> joins.
    val c = current.groupBy(col(groupCol).as("__gc"))
      .agg(count(lit(1)).as("n_cur"))
    val r = reference.groupBy(col(groupCol).as("__gr"))
      .agg(count(lit(1)).as("n_ref"))
    val joined = c.join(r, col("__gc") <=> col("__gr"), "full_outer")
      .select(coalesce(col("__gc"), col("__gr")).as(groupCol),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"))
    val tot = joined.agg(sum("n_cur").as("__tc"), sum("n_ref").as("__tr"),
      count(lit(1)).as("__g"))
    val p = (col("n_cur") + lit(smoothing)) /
      (col("__tc") + col("__g") * lit(smoothing))
    val q = (col("n_ref") + lit(smoothing)) /
      (col("__tr") + col("__g") * lit(smoothing))
    joined.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_cur"), col("n_ref"),
        round(p, 6).as("p_cur"), round(q, 6).as("p_ref"),
        round(p * log(p / q), 6).as("kl_term"))
  }

  /** Population stability index between a current and a reference
    * sample of a SCORE column — the bucketed industry drift metric that
    * complements [[driftScore]]'s categorical KL: PSI = Σ (p_c − p_r) ·
    * ln(p_c / p_r) over equal-width score buckets CUT FROM THE
    * REFERENCE's bounds (drift must be measured against the reference's
    * frame; re-cutting from current bounds would hide a shift).
    * Additive smoothing keeps one-sided buckets finite. Rule of thumb:
    * < 0.1 stable, 0.1–0.25 watch, > 0.25 act.
    *
    * Two combinable bucket counts + bucket-table arithmetic; values
    * outside the reference range clamp into the edge buckets (that mass
    * movement is exactly what PSI should see).
    *
    * @return 1 row: (n_cur, n_ref, psi round 6) */
  def psiScore(current: DataFrame, reference: DataFrame,
      scoreCol: String, nBuckets: Int = 10,
      smoothing: Double = 0.5): DataFrame = {
    val bounds = reference.agg(
      min(col(scoreCol)).cast("double").as("__graft_min_s"),
      max(col(scoreCol)).cast("double").as("__graft_max_s"))
    def cells(df: DataFrame, name: String) =
      // NULL scores are excluded from BOTH distributions (the
      // Evaluation exclusion contract) — before the r14 NULL-bucket
      // fix they counted as maximum-score mass, and greatest() would
      // now clamp a NULL bucket to 0 (greatest also skips nulls)
      df.filter(col(scoreCol).isNotNull)
        .crossJoin(broadcast(bounds))
        // greatest(0): CURRENT scores below the reference min clamp into
        // the bottom edge bucket (the reference's own cuts can't go
        // negative, but drifted current values can)
        .select(greatest(equalWidthBucket(col(scoreCol),
            col("__graft_min_s"), col("__graft_max_s"), nBuckets),
          lit(0L)).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as(name))
    val joined = cells(current, "nc")
      .join(cells(reference, "nr"), Seq("bucket"), "full_outer")
      .select(col("bucket"), coalesce(col("nc"), lit(0L)).as("nc"),
        coalesce(col("nr"), lit(0L)).as("nr"))
    val tot = joined.agg(sum("nc").as("tc"), sum("nr").as("tr"))
    joined.crossJoin(broadcast(tot))
      .select(
        ((col("nc") + smoothing) /
          (col("tc") + smoothing * nBuckets)).as("pc"),
        ((col("nr") + smoothing) /
          (col("tr") + smoothing * nBuckets)).as("pr"),
        col("tc"), col("tr"))
      .agg(max("tc").as("n_cur"), max("tr").as("n_ref"),
        round(sum((col("pc") - col("pr")) * log(col("pc") / col("pr"))),
          6).as("psi"))
  }

  /** Gini coefficient of a grouped count distribution — corpus
    * concentration in one number (0 = every source contributes equally,
    * →1 = one source dominates), the diversity gate next to the q77
    * composition report. Exact, via the sorted-share formula over the
    * (group-cardinality-scale) count table; the rank window is bounded
    * by the number of groups.
    *
    * @return 1 row: (n_groups, n_rows, gini round 6) */
  def giniConcentration(df: DataFrame, groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("c"))
    // bounded window: one row per group
    val ranked = counts.withColumn("i",
      row_number().over(Window.orderBy(col("c"), col(groupCol))))
    val tot = ranked.agg(sum("c").as("t"), count(lit(1)).as("k"))
    ranked.crossJoin(broadcast(tot))
      .agg(max("k").as("n_groups"), max("t").as("n_rows"),
        round(
          sum((lit(2) * col("i") - col("k") - 1) * col("c")) /
            (max("k") * max("t")), 6).as("gini"))
  }

  /** Resharding migration cost, mod-hash vs consistent-ring: when the
    * shard count grows `nOld` → `nNew`, what fraction of documents
    * MOVE? Mod-hashing reassigns almost everything (h%16 vs h%20 agree
    * only when both mods coincide); a consistent ring moves only the
    * docs falling in segments the new nodes claim (≈ (nNew−nOld)/nNew).
    * This table is the before-you-reshard answer to "can we afford to
    * grow the index" — for the at-rest dedup index, packed shards, and
    * bucketed layouts alike.
    *
    * Doc position and ring node points are md5-derived 60-bit ints
    * (portable). The ≤ nNew node points are COLLECTED (they are a
    * literal handful) and the successor search is a folded
    * when-chain — a narrow codegen'd per-row expression, so the whole
    * table reduces in ONE aggregate pass with zero shuffles of the doc
    * set. (r14 review: the previous shape expanded every doc by its
    * matching node points through a nested-loop join, shuffled the
    * expansion in a per-uid groupBy TWICE, then joined the two
    * corpus-scale assignments — three corpus shuffles and ~n/2×
    * intermediate blowup for the same two output rows.)
    *
    * @return 2 rows: (scheme ∈ mod|ring, n_docs, n_moved,
    *          frac_moved round 4) */
  def reshardCost(df: DataFrame, idCol: String, nOld: Int,
      nNew: Int): DataFrame = {
    require(0 < nOld && nOld < nNew, "reshardCost: need 0 < nOld < nNew")
    val spark = df.sparkSession
    import spark.implicits._
    def h60(c: Column): Column =
      conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")
    // ring node points, computed by the SAME Spark md5 expression the
    // docs use (portability contract) — tiny, driver-collected
    val points: Array[(Int, Long)] = (0 until nNew)
      .map(i => (i, s"node$i")).toDF("node", "name")
      .select(col("node"), h60(col("name")).as("point"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    // successor on the ring: smallest point >= h, wrapping to the
    // ring's first node — an ascending when-chain over the sorted
    // literal points (node i owns [prev point, point_i))
    def assignExpr(n: Int): Column = {
      val ps = points.filter(_._1 < n).sortBy(_._2)
      ps.foldRight(lit(ps.head._1): Column) { case ((node, point), acc) =>
        when(col("h") <= lit(point), lit(node)).otherwise(acc)
      }
    }
    val pos = df.select(h60(col(idCol)).as("h"))
    val schemes = Seq(
      ("mod",
        pmod(col("h"), lit(nOld.toLong)) =!=
          pmod(col("h"), lit(nNew.toLong))),
      ("ring", assignExpr(nOld) =!= assignExpr(nNew)))
    schemes.map { case (name, moved) =>
      pos.agg(count(lit(1)).as("n_docs"),
          sum(when(moved, 1L).otherwise(0L)).as("n_moved"))
        .select(lit(name).as("scheme"), col("n_docs"), col("n_moved"))
    }.reduce(_ unionByName _)
      .withColumn("frac_moved",
        round(col("n_moved") / col("n_docs"), 4))
  }

  /** Write `df` Z-ordered on (colA, colB): range-repartitioned and
    * sorted by z, so each output file covers a compact rectangle of the
    * (a, b) space and parquet min/max stats prune range queries on
    * either column. */
  def writeZOrdered(df: DataFrame, path: String, colA: String,
      colB: String, numFiles: Int, bits: Int = 16): Unit =
    withZValue(df, colA, colB, bits)
      .repartitionByRange(numFiles, col("z"))
      .sortWithinPartitions("z")
      .drop("z")
      .write.mode("overwrite").parquet(path)

  /** Zone-map pruning effectiveness: how many shards a range predicate
    * on `valueCol` could SKIP under a given at-rest layout, from
    * per-shard min/max — exactly the parquet/Iceberg file-stats pruning
    * decision, computed as a relation so layouts are comparable BEFORE
    * paying a rewrite. Layouts:
    *   - `natural`: shards = equal-width cuts of `orderCol` (insertion
    *     order — what the table looks like today);
    *   - `clustered`: shards = equal-width cuts of `valueCol` (what a
    *     sort-on-write would produce).
    * A shard is skippable for [lo, hi] when zmax < lo OR zmin > hi.
    *
    * No window anywhere: shard ids come from broadcast 1-row min/max
    * bounds ([[scaleToBits]]-style equal-width discretization), so the
    * whole computation is one codegen'd projection + a shard-scale
    * aggregate; predicates are a broadcast literal list.
    *
    * @return (layout, pred_id, lo, hi, n_shards, n_skipped,
    *          skip_frac round 4) */
  def zoneMapSkipStats(df: DataFrame, valueCol: String, orderCol: String,
      nShards: Int,
      preds: Seq[(Double, Double)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bounds = df.agg(
      min(col(orderCol)).cast("double").as("__graft_min_o"),
      max(col(orderCol)).cast("double").as("__graft_max_o"),
      min(col(valueCol)).cast("double").as("__graft_min_v"),
      max(col(valueCol)).cast("double").as("__graft_max_v"))
    def shardId(x: Column, lo: Column, hi: Column): Column =
      equalWidthBucket(x, lo, hi, nShards)
    def zones(layout: String, cut: Column) =
      df.crossJoin(broadcast(bounds))
        .withColumn("shard", cut)
        // a NULL cut column has no shard (r14 NULL-bucket fix) — such
        // rows would otherwise form a phantom extra zone
        .filter(col("shard").isNotNull)
        .groupBy("shard")
        .agg(min(col(valueCol)).cast("double").as("zmin"),
          max(col(valueCol)).cast("double").as("zmax"))
        .withColumn("layout", lit(layout))
    val z = zones("natural",
        shardId(col(orderCol), col("__graft_min_o"), col("__graft_max_o")))
      .unionByName(zones("clustered",
        shardId(col(valueCol), col("__graft_min_v"), col("__graft_max_v"))))
    val predDf = preds.zipWithIndex
      .map { case ((lo, hi), i) => (i, lo, hi) }
      .toDF("pred_id", "lo", "hi")
    z.crossJoin(broadcast(predDf))
      .groupBy("layout", "pred_id", "lo", "hi")
      .agg(count(lit(1)).as("n_shards"),
        sum(when(col("zmax") < col("lo") || col("zmin") > col("hi"), 1L)
          .otherwise(0L)).as("n_skipped"))
      .withColumn("skip_frac",
        round(col("n_skipped") / col("n_shards"), 4))
  }
}
