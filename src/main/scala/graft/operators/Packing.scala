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

  /** The per-shard folds key and order by a LONG id; a non-integral id
    * column would cast to null and surface as an obscure encoder NPE
    * deep in the job, so every packer rejects it at plan time (one
    * definition — the check was copy-pasted per packer before r14). */
  private def requireIntegralId(docs: DataFrame, idCol: String,
      op: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val idType = docs.schema(idCol).dataType
    require(idType == LongType || idType == IntegerType ||
        idType == ShortType || idType == ByteType,
      s"$op requires an integral id column; '$idCol' is " +
        s"${idType.simpleString} — map ids to long first")
  }

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
    * (id, shard, bin, n_tokens) — the token count rides along like
    * [[packBestFit]]'s so consumers never re-tokenize.
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
    requireIntegralId(docs, idCol, "packGreedy")
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
          // n_tokens rides along (r14 review): packingStats previously
          // re-tokenized the whole corpus and paid a corpus-scale join
          // to recover a value this fold already held
          (id, shard, bin, n)
        }
      }
      .toDF(idCol, "shard", "bin", "n_tokens")
  }

  /** Best-fit-decreasing packing ("Fewer Truncations Improve Language
    * Modeling", Ding et al. 2024, arXiv:2404.10830): documents longer than
    * `capacity` split into capacity-sized pieces (nothing is truncated);
    * within each shard, pieces place LONGEST-FIRST, each into the fullest
    * bin it still fits (ties → lowest bin id), opening a new bin only when
    * none fits. Never more bins than [[packGreedy]] at the same capacity,
    * and materially less padding on heavy-tailed length mixes — the
    * padding win is what [[packingStats]] measures.
    *
    * Per-shard fold, same genuinely-sequential shape as [[packGreedy]]
    * (groupByKey(shard).flatMapGroups, memory bounded by the shard token
    * budget — shards grow in number, never size). The bin search is a
    * TreeMap keyed by remaining capacity: `ceilingEntry(len)` IS best-fit
    * (smallest remaining that still fits = fullest bin), O(log bins) per
    * piece instead of the naive O(bins) scan.
    *
    * Deterministic: piece order is (len desc, id, piece); bin ids are
    * creation-ordered; remaining-capacity ties break to the lowest bin id.
    * The whole decision sequence is therefore replayable — the catalog
    * oracle re-runs it in DuckDB as a recursive CTE whose state carries
    * the bin-fill LIST (`list_max(list_filter(fills, …))` is the best-fit
    * choice), the same discipline as the q47 next-fit replay.
    *
    * Output: (id, piece, shard, bin, n_tokens); piece > 0 only for split
    * oversize docs.
    */
  def packBestFit(docs: DataFrame, capacity: Int, numShards: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(capacity > 0 && numShards > 0)
    requireIntegralId(docs, idCol, "packBestFit")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"),
        hashShard(col(idCol), numShards),
        TextAnalysis.tokenCount(col(textCol)))
      .as[(Long, Int, Int)]
      .flatMap { case (id, shard, n) =>
        val pieces = (n + capacity - 1) / capacity
        (0 until pieces).iterator.map(p =>
          (id, p, shard, math.min(capacity, n - p * capacity)))
      }
      .groupByKey(_._3)
      .flatMapGroups { (shard: Int, it: Iterator[(Long, Int, Int, Int)]) =>
        val pieces = it.toIndexedSeq
          .sortBy { case (id, p, _, len) => (-len, id, p) }
        // remaining capacity -> creation-ordered bin ids at that remaining
        val byRemaining =
          new java.util.TreeMap[Integer, java.util.TreeSet[Integer]]()
        val fills = scala.collection.mutable.ArrayBuffer.empty[Int]
        pieces.iterator.map { case (id, p, _, len) =>
          val e = byRemaining.ceilingEntry(len)
          val bin =
            if (e == null) { fills += 0; fills.size - 1 }
            else {
              val b = e.getValue.first().intValue()
              e.getValue.remove(Integer.valueOf(b))
              if (e.getValue.isEmpty) byRemaining.remove(e.getKey)
              b
            }
          fills(bin) += len
          byRemaining
            .computeIfAbsent(capacity - fills(bin),
              _ => new java.util.TreeSet[Integer]())
            .add(bin)
          (id, p, shard, bin, len)
        }
      }
      .toDF(idCol, "piece", "shard", "bin", "n_tokens")
  }

  /** Materialize the BFD-packed corpus at rest, one directory per shard —
    * the at-rest twin of [[packBestFit]], same loader contract as
    * [[writeShards]]: a shard's bins are wholly contained in its
    * directory, so a training dataloader reads shards independently and
    * reassembles bins with no cross-directory joins. Each ROW is a
    * PIECE carrying its own token slice (`piece_text` — the normalized
    * token stream sliced at the capacity boundaries), so oversize
    * documents are stored split exactly as they pack, and a bin's
    * content is `piece_text` concatenation in (id, piece) order.
    * Nothing is lost: concatenating a doc's pieces in order reproduces
    * its full normalized token stream (spec-pinned). */
  def writePackedShards(docs: DataFrame, path: String, capacity: Int,
      numShards: Int, textCol: String = "text",
      idCol: String = "doc_id"): Unit = {
    val assign = packBestFit(docs, capacity, numShards, textCol, idCol)
    val toks = TextAnalysis.tokens(col(textCol))
    val sliced = docs
      .join(assign, Seq(idCol))
      .select(col(idCol), col("piece"), col("shard"), col("bin"),
        col("n_tokens"),
        array_join(slice(toks, col("piece") * capacity + 1,
          col("n_tokens")), " ").as("piece_text"))
    sliced.write.mode("overwrite").partitionBy("shard").parquet(path)
  }

  /** Padding-efficiency comparison of the two no-span strategies at the
    * same capacity and sharding: one row per strategy with its bin count,
    * packed token total, padding tokens (capacity − fill per bin, floored
    * at 0 — a solo oversize next-fit bin overfills, it doesn't pad) and
    * the padding fraction. The BFD row should never pad more than the
    * next-fit row — the measured form of the Ding et al. 2024 claim.
    * `padding_frac` is an unrounded IEEE division of two exact integers,
    * so both engines agree bit-for-bit (the q163 lesson). */
  def packingStats(docs: DataFrame, capacity: Int, numShards: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val greedy = packGreedy(docs, capacity, numShards, textCol, idCol)
      .select(lit("next_fit").as("strategy"), col("shard"), col("bin"),
        col("n_tokens").cast("long").as("len"))
    val bfd = packBestFit(docs, capacity, numShards, textCol, idCol)
      .select(lit("best_fit_decreasing").as("strategy"), col("shard"),
        col("bin"), col("n_tokens").cast("long").as("len"))
    greedy.unionByName(bfd)
      .groupBy("strategy", "shard", "bin").agg(sum("len").as("fill"))
      .groupBy("strategy")
      .agg(count(lit(1)).as("n_bins"),
        sum("fill").as("n_tokens"),
        sum(greatest(lit(0L), lit(capacity.toLong) - col("fill")))
          .as("padding"))
      .withColumn("padding_frac",
        col("padding").cast("double") /
          (col("n_bins") * lit(capacity.toLong)).cast("double"))
  }
}
