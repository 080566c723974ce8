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
}
