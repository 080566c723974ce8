package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assigning documents to fixed-capacity token bins
  * ("training sequences") — the step between a cleaned corpus and a
  * training dataloader.
  *
  * Scale design (100 TB corpus): packing is inherently order-dependent, so
  * a single global order would serialize the whole corpus. Both operators
  * therefore shard the corpus by a deterministic hash of the id and pack
  * independently *within* shards; sequence identity is the composite
  * (shard, seq). Pick `numShards ≈ corpusTokens / shardTokenBudget` so one
  * shard's docs stay bounded per task — shards grow in *number*, never in
  * size, as the corpus grows. The shard hash is a pure function of the id
  * (md5, same trick as [[TextAnalysis.hashSplit]]): reshuffle-proof,
  * replay-stable, and portable to external engines for verification.
  */
object Packing {

  /** Deterministic shard of an id: first 15 md5 hex digits (60 bits — the
    * object doc sizes numShards ≈ corpusTokens/shardTokenBudget, which
    * passes 65,536 long before 100 TB, so a 4-digit/16-bit hash would
    * leave shards permanently empty) mod `numShards`. Stays portable:
    * DuckDB reproduces it as
    * `('0x' || substring(md5(id::VARCHAR), 1, 15))::BIGINT % numShards`. */
  def hashShard(id: Column, numShards: Int): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(numShards.toLong)).cast("int")

  /** Concat-and-chunk packing (GPT-style): within each shard, the token
    * stream of docs in id order is cut into `capacity`-sized sequences and
    * a doc is assigned to the sequence where it STARTS (docs may span
    * sequence boundaries at training time; the loader only needs start
    * offsets). Output: (id, shard, seq_id, tok_start).
    *
    * Plan shape: one narrow token-count projection, then a running sum in
    * a window partitioned BY SHARD — never a global window, so the sort is
    * a per-shard task and the whole operator is one shuffle.
    */
  def packChunked(docs: DataFrame, capacity: Int, numShards: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(capacity > 0 && numShards > 0)
    val w = Window.partitionBy("shard").orderBy(idCol)
    docs.select(col(idCol),
        hashShard(col(idCol), numShards).as("shard"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("tok_start", sum("n_tokens").over(w) - col("n_tokens"))
      .select(col(idCol), col("shard"),
        (col("tok_start") / lit(capacity)).cast("int").as("seq_id"),
        col("tok_start"))
  }

  /** Materialize the packed corpus at rest, one directory per shard
    * (`shard=N/`): the training dataloader reads shards independently and
    * a shard's sequences are wholly contained in its directory — the
    * at-rest twin of [[packChunked]], same story as
    * `Similarity.writeBucketed` / `IvfIndex.writeClustered`. Documents
    * are written with their (shard, seq_id, tok_start) assignment so the
    * loader needs no recompute. */
  def writeShards(docs: DataFrame, path: String, capacity: Int,
      numShards: Int, textCol: String = "text",
      idCol: String = "doc_id"): Unit = {
    val assign = packChunked(docs, capacity, numShards, textCol, idCol)
    docs.join(assign, Seq(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }

  /** Greedy next-fit packing (no document spans a sequence): docs in id
    * order fill the current bin while they fit; a doc that would overflow
    * `capacity` closes the bin and opens the next; an oversize doc
    * (> capacity tokens — truncate upstream) occupies a bin alone. Output:
    * (id, shard, bin).
    *
    * The fold is sequential by construction, so it runs per shard
    * (`groupByKey(shard).flatMapGroups` with an in-group sort) — the one
    * place in the engine where imperative per-group logic is genuinely
    * required. Memory is bounded by the shard budget (see the object doc);
    * the group sort materializes one shard, never the corpus.
    */
  def packGreedy(docs: DataFrame, capacity: Int, numShards: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(capacity > 0 && numShards > 0)
    // The per-shard fold keys and orders by a LONG id; a non-integral id
    // column would cast to null and surface as an obscure encoder NPE deep
    // in the job, so reject it at plan time instead.
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val idType = docs.schema(idCol).dataType
    require(idType == LongType || idType == IntegerType ||
        idType == ShortType || idType == ByteType,
      s"packGreedy requires an integral id column; '$idCol' is " +
        s"${idType.simpleString} — map ids to long first")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"),
        hashShard(col(idCol), numShards),
        TextAnalysis.tokenCount(col(textCol)))
      .as[(Long, Int, Int)]
      .groupByKey(_._2)
      .flatMapGroups { (shard: Int, it: Iterator[(Long, Int, Int)]) =>
        var bin = 0
        var fill = 0
        var first = true
        it.toSeq.sortBy(_._1).iterator.map { case (id, _, n) =>
          if (first) { fill = n; first = false }
          else if (fill + n <= capacity) fill += n
          else { bin += 1; fill = n }
          (id, shard, bin)
        }
      }
      .toDF(idCol, "shard", "bin")
  }
}
