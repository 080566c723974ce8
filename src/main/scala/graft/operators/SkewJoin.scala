package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join by key salting.
  *
  * When both sides are too big to broadcast and the join key is skewed,
  * a plain shuffle join sends every row of a hot key to ONE reducer.
  * Salting splits each hot key into `salts` sub-keys: the big side gets a
  * deterministic per-row salt, the other side replicates each row across
  * all salt values, and the join runs on (key, salt) — hot-key rows now
  * spread over `salts` reducers.
  *
  * AQE's skew-join handling covers the common case at runtime (split
  * oversized shuffle partitions); explicit salting remains the tool when
  * AQE can't see the skew — under aggregations that share the join
  * shuffle, stream-stream joins, or fixed-partitioning contracts. Results
  * are exactly a plain inner join's (oracle-checked by q23b).
  *
  * The salt is `pmod(xxhash64(saltSource), salts)` — deterministic (no
  * rand(), which breaks retries/replays) and uniform when `saltSource`
  * is high-cardinality (e.g. the big side's row key).
  */
object SkewJoin {

  def saltedInnerJoin(big: DataFrame, other: DataFrame, key: String,
      salts: Int, saltSource: Column): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(saltSource), lit(salts.toLong)).cast("int"))
    val replicated = other.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Bloom-pruned semi-join for a huge fact against a dim that is too
    * big to broadcast as a hash table but fits an 8 MB sketch: build a
    * Bloom filter over the right side's keys (one aggregate, collected as
    * bytes), bake it into the left scan as a map-side `might_contain`
    * filter, then verify the survivors with the real semi-join. Bloom
    * filters have no false negatives and the verify join removes the
    * false positives, so the result EQUALS a plain semi-join (q91's
    * oracle states exactly that) — the sketch only changes how many left
    * rows reach the exchange: with a 1%-selective dim and fpp=0.01, ~2%
    * of the fact shuffles instead of 100%. This is the manual form of
    * Spark's runtime bloom-join rewrite, for when the optimizer can't
    * inject it (non-equi pre-filters, reused subplans, streaming sides).
    *
    * Keys are hashed with xxhash64 before the sketch on BOTH sides, so
    * any key type works; a 64-bit hash collision can only admit an extra
    * row into the verify join, never drop one — exactness is unaffected.
    */
  def bloomSemiJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.GraftSqlShims
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    require(fpp > 0.0 && fpp < 1.0, "fpp must be in (0, 1)")

    // localCheckpoint: feeds the count probe, the sketch build, and the
    // verify join; materialized once, lineage cut, blocks GC-released.
    val rightKeys = right.select(col(rightKey).as("__rk")).distinct()
      .transform(Materialize.cut)
    val nItems = math.max(1L, rightKeys.count())
    val numBits = math.min(67108864L, math.max(64L,
      math.ceil(-nItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong))
    val bloomAgg = GraftSqlShims.columnOf(
      new BloomFilterAggregate(
        GraftSqlShims.expressionOf(xxhash64(col("__rk"))),
        Literal(nItems), Literal(numBits)).toAggregateExpression())
    val bloomBytes =
      rightKeys.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]]("bf")
    val mightContain = GraftSqlShims.columnOf(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      GraftSqlShims.expressionOf(xxhash64(col(leftKey)))))
    left.filter(mightContain)
      .join(rightKeys, col(leftKey) === col("__rk"), "left_semi")
  }

  /** Exact join-output-size prediction WITHOUT running the join: for an
    * inner equi-join, |result| = Σ_k c_left(k)·c_right(k) over shared
    * keys — two per-key counts and one key-cardinality-scale join of the
    * histograms. This is the cost-based pre-check for "can this join's
    * output even fit": the q144 oracle computes the ACTUAL join count,
    * so a pass proves the predictor exact.
    *
    * @return 1 row: (n_shared_keys, predicted_rows, max_key_rows —
    *          the largest single key's contribution, the skew hazard) */
  def joinCardinalityReport(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val lc = left.groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("cl"))
    val rc = right.groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("cr"))
    lc.join(rc, "k")
      .agg(count(lit(1)).as("n_shared_keys"),
        sum(col("cl") * col("cr")).as("predicted_rows"),
        max(col("cl") * col("cr")).as("max_key_rows"))
  }

  /** Join-key skew diagnosis: the before-you-shuffle report that decides
    * whether a key needs [[saltedInnerJoin]] and with how many salts.
    * One map-side-combinable count per key, then exact percentiles over
    * the (key-cardinality-scale) count table — the report is one row.
    *
    * `suggested_salts` = ceil(max/avg): enough replicas that the hottest
    * key's share drops to roughly the average partition load.
    *
    * @return 1 row: (key_col, n_keys, n_rows, avg_rows round 4, p50,
    *          p90, max_rows, skew_ratio round 4, suggested_salts) */
  def skewReport(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_keys"), sum("c").as("n_rows"),
        round(avg("c"), 4).as("avg_rows"),
        percentile(col("c"), lit(0.5)).as("p50"),
        percentile(col("c"), lit(0.9)).as("p90"),
        max("c").as("max_rows"))
      .select(lit(keyCol).as("key_col"), col("n_keys"), col("n_rows"),
        col("avg_rows"), round(col("p50"), 4).as("p50"),
        round(col("p90"), 4).as("p90"), col("max_rows"),
        round(col("max_rows") / (col("n_rows") / col("n_keys")), 4)
          .as("skew_ratio"),
        // round before ceil: an exactly-integer ratio must not flip on
        // engine-specific last-bit fp noise
        ceil(round(col("max_rows") / (col("n_rows") / col("n_keys")), 6))
          .cast("long").as("suggested_salts"))
}
