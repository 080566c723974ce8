package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer training and
  * application — tokenizer fitting is a first-class stage of an LLM data
  * pipeline (the vocabulary is learned FROM the training corpus), and
  * its classic algorithm (Sennrich et al. 2016, arXiv:1508.07909)
  * distributes cleanly if the corpus is touched exactly once:
  *
  *   1. ONE corpus pass builds the (word, freq) table — whitespace
  *      words, each split into single-character symbol arrays. The
  *      corpus never participates again.
  *   2. Each merge round runs entirely on the word table (bounded by
  *      DISTINCT-word count, not corpus size): count adjacent symbol
  *      pairs weighted by word freq (map-side combinable groupBy), pick
  *      the argmax pair (1-row driver action; ties broken
  *      lexicographically so training is deterministic), and rewrite
  *      the symbol arrays with a greedy left-to-right fold.
  *   3. `localCheckpoint` cuts lineage each round — the plan stays
  *      round-count-independent, same discipline as
  *      [[WebGraph.pageRank]] (PlanPinsSpec model).
  *
  * At 100 TB the word table is the tokenizer-training working set
  * (millions of distinct words, not billions of tokens) — the shape
  * every production BPE/WordPiece trainer exploits.
  *
  * Determinism: argmax tie-break is (count desc, pair asc); the merge
  * fold is greedy-left (an "aaa" word under merge (a,a) becomes
  * ["aa","a"]), matching the reference algorithm. `TokenizerSpec` pins
  * equality against an independent in-memory reference implementation
  * on randomized corpora.
  */
object Tokenizer {

  /** Greedy-left application of ONE merge (a,b)→ab to a symbol array,
    * as a column fold. */
  private def mergeOnce(sym: Column, a: String, b: String): Column =
    aggregate(sym,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** The one corpus pass: (word, freq, sym) with single-char symbols. */
  private def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("sym",
        filter(split(col("w"), ""), s => length(s) > 0))

  /** Learn `numMerges` merges. @return the ordered merge list. */
  def bpeTrain(docs: DataFrame, numMerges: Int,
      textCol: String = "text"): Seq[(String, String)] = {
    var words = wordTable(docs, textCol).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      // adjacent pairs weighted by word freq; argmax with a total order
      val top = words
        .select(col("freq"),
          explode(zip_with(
            slice(col("sym"), lit(1), size(col("sym")) - 1),
            slice(col("sym"), lit(2), size(col("sym")) - 1),
            (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val next = words
          .withColumn("sym", mergeOnce(col("sym"), a, b))
          .localCheckpoint()
        words.unpersist()
        words = next
        round += 1
      }
    }
    words.unpersist()
    merges.toSeq
  }

  /** Tokenize with a learned merge list: one narrow projection over the
    * corpus applying the merges in training order (broadcast-sized rule
    * list folded into the expression — no shuffle, no UDF). */
  def bpeApply(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val words = split(trim(lower(col(textCol))), "\\s+")
    val tokensPerWord = transform(words, w => {
      val sym0 = filter(split(w, ""), s => length(s) > 0)
      merges.foldLeft(sym0) { case (s, (a, b)) => mergeOnce(s, a, b) }
    })
    docs.select(col(idCol),
      flatten(filter(tokensPerWord, a => size(a) > 0)).as("tokens"))
  }

  /** [[bpeApply]] for REAL vocabularies: the expression fold nests one
    * `aggregate` per merge, which is fine for a handful of rules and
    * unusable at a production 30k-merge table. This twin runs the SAME
    * sequential greedy-left semantics (spec-pinned equal to
    * [[bpeApply]]) as a per-partition Scala tokenizer over a BROADCAST
    * merge array, with two standard production tricks:
    * a substring prefilter (merge (a,b) can only apply to a word whose
    * raw text contains `a+b` contiguously) and a per-partition
    * distinct-word memo (a corpus tokenizes its VOCABULARY, not its
    * token stream). mapPartitions is the honest tool here — per-word
    * imperative iteration over 30k rules is exactly the "genuine
    * per-partition imperative logic" case. */
  def bpeApplyLarge(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toArray)
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val rules = bc.value
        val memo = new java.util.HashMap[String, Array[String]]()
        def tokenizeWord(w: String): Array[String] = {
          val cached = memo.get(w)
          if (cached != null) return cached
          var sym: Array[String] = w.split("").filter(_.nonEmpty)
          rules.foreach { case (a, b) =>
            if (w.contains(a + b) && sym.length > 1) {
              val out = new scala.collection.mutable.ArrayBuffer[String](
                sym.length)
              sym.foreach { x =>
                if (out.nonEmpty && out.last == a && x == b) {
                  out.remove(out.length - 1); out += (a + b)
                } else out += x
              }
              sym = out.toArray
            }
          }
          memo.put(w, sym)
          sym
        }
        it.map { case (id, text) =>
          val toks = Option(text).getOrElse("").trim.toLowerCase
            .split("\\s+").filter(_.nonEmpty)
            .flatMap(tokenizeWord)
          (id, toks.toSeq)
        }
      }
      .toDF(idCol, "tokens")
  }

  /** Training summary as a relation (for the catalog): one row per
    * learned merge, in training order. */
  def bpeMergeTable(docs: DataFrame, numMerges: Int,
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeTrain(docs, numMerges, textCol).zipWithIndex
      .map { case ((a, b), i) => (i, a, b, a + b) }
      .toDF("step", "left", "right", "merged")
  }
}
