package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text relevance search over a document corpus: TF-IDF statistics,
  * vocabulary building, and BM25 ranking — the retrieval ops a training-data
  * pipeline needs for corpus exploration, quality-by-query auditing, and
  * dataset curation ("find the docs most like this prompt").
  *
  * Scale design (100 TB corpus):
  *   - term stats are one explode + one groupBy((id, token)) — map-side
  *     combined, shuffle keyed on (id, token);
  *   - corpus constants (N, avgdl) are a 1-row aggregate broadcast into the
  *     scoring join, never a driver collect;
  *   - the query is tokens-of-a-string — a literal array, so scoring is a
  *     broadcast semi-join of the posting rows that match query terms; cost
  *     is the matching postings, not the corpus;
  *   - top-k is TakeOrdered (no global sort).
  * No UDFs: everything is codegen'd Column algebra.
  */
object TextSearch {

  /** (id, token, tf): term frequencies per document. Tokenization matches
    * [[TextAnalysis.tokens]] so search statistics agree with the analysis
    * operators. */
  def termFreqs(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(idCol, "token")
      .agg(count(lit(1)).as("tf"))

  /** (token, doc_freq, total_count): corpus vocabulary statistics. One
    * groupBy(token) over the term-frequency relation; since (id, token) is
    * unique there, doc_freq is a plain count. */
  def vocab(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    termFreqs(docs, textCol, idCol)
      .groupBy("token")
      .agg(count(lit(1)).as("doc_freq"), sum("tf").as("total_count"))

  /** Top-`n` vocabulary by total count (ties broken by token) — the
    * tokenizer-training view of the corpus. TakeOrdered, no global sort. */
  def topVocab(docs: DataFrame, n: Int, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    vocab(docs, textCol, idCol)
      .orderBy(col("total_count").desc, col("token"))
      .limit(n)

  /** BM25 scores of every document matching `query`, highest first.
    *
    * Standard Robertson/Lucene BM25:
    *   idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * summed over DISTINCT query terms.
    *
    * The query tokenizes driver-side (it is a string, not data); matching
    * posting rows are selected with an `isin` pushdown, so the scoring
    * subtree touches only postings of query terms. `N`/`avgdl` and the
    * per-term `df` are broadcast 1-row/tiny aggregates.
    */
  /** Driver-side query tokenization, shared by every scorer.
    * Locale.ROOT: the corpus is tokenized with Spark's
    * locale-independent `lower()`, so a locale-sensitive driver-side
    * toLowerCase would silently match nothing under e.g. a Turkish
    * default JVM locale ("INDEX" → "ındex" vs postings "index"). */
  private[operators] def rootLower(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT)
  private def queryTerms(query: String, caller: String): Seq[String] = {
    val qTerms = rootLower(query).trim.split("\\s+")
      .filter(_.nonEmpty).distinct.toSeq
    require(qTerms.nonEmpty, s"$caller query must contain a token")
    qTerms
  }

  /** The ONE definition of the BM25 per-term score — [[bm25]] and
    * [[searchIndex]] both compose it over (token, tf, df, dl, n_docs,
    * avgdl) columns, so the documented identical-scores contract
    * between the two paths cannot drift. */
  private def bm25TermScore(k1: Double, b: Double): Column = {
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * (lit(k1) + 1.0)) /
      (col("tf") + lit(k1) *
        (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    idf * tfNorm
  }

  def bm25(docs: DataFrame, query: String, k1: Double = 1.2,
      b: Double = 0.75, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val qTerms = queryTerms(query, "bm25")
    val tf = termFreqs(docs, textCol, idCol)
    // Document length in tokens (sum of tfs) — derived from the same
    // relation so no second corpus pass.
    val docLen = tf.groupBy(idCol).agg(sum("tf").as("dl"))
    val corpus = docLen.agg(count(lit(1)).as("n_docs"),
      avg("dl").as("avgdl")) // 1 row
    val qtf = tf.filter(col("token").isin(qTerms: _*))
    val dfs = qtf.groupBy("token").agg(count(lit(1)).as("df"))
    qtf
      .join(broadcast(dfs), Seq("token"))
      .join(docLen, Seq(idCol))
      .crossJoin(broadcast(corpus))
      .select(col(idCol), bm25TermScore(k1, b).as("term_score"))
      .groupBy(idCol)
      .agg(sum("term_score").as("score"))
  }

  /** Top-`k` BM25 hits for `query` (TakeOrdered; ties broken by id for
    * deterministic output). */
  def bm25TopK(docs: DataFrame, query: String, k: Int, k1: Double = 1.2,
      b: Double = 0.75, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    bm25(docs, query, k1, b, textCol, idCol)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  // --- at-rest inverted index ---------------------------------------------

  /** Write the at-rest inverted index for indexed BM25: postings
    * `(token, id, tf)` PARTITIONED by a hash bucket of the token, plus the
    * doc-length table and the 1-row corpus stats. Built once per corpus;
    * every later query reads only its terms' buckets (≤ one directory per
    * query term out of `nBuckets`), so query cost is postings-of-terms,
    * not corpus. Bucketing by hash (not raw token) bounds the directory
    * count at `nBuckets` regardless of vocabulary size. */
  def writeIndex(docs: DataFrame, path: String, nBuckets: Int = 64,
      textCol: String = "text", idCol: String = "doc_id"): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    // One corpus pass: the three writes (postings, doclen, stats) all
    // derive from termFreqs — without the cut each action replayed the
    // full tokenize+explode+groupBy, 3x the required I/O for a routine
    // that is "built once per corpus".
    //
    // The cut is Materialize.cut (localCheckpoint), NOT a lazy persist.
    // The r15 review briefly switched this to persist()/unpersist() to
    // release blocks deterministically, and the r16 bench caught the
    // cost: a cached plan keeps the PRE-AQE shuffle layout (32
    // partitions for a few-MB table — Spark leaves cached output
    // partitioning alone unless canChangeCachedPlanOutputPartitioning),
    // so the dynamic-partition postings write ran partitions×nBuckets
    // parquet writers (32×64 ≈ 2k writer inits, ~60x the executor time)
    // AND left one tiny file per (partition, bucket) — 2,048 files
    // instead of 64 — taxing every later searchIndex read.
    // localCheckpoint materializes the AQE-FINAL coalesced layout, so
    // file count tracks data volume at every scale; its blocks release
    // on driver GC of the frame, the same bounded retention every
    // Materialize.cut site accepts (see Materialize's class doc for the
    // executor-loss trade-off and the reliable-checkpoint knob).
    val tf = Materialize.cut(termFreqs(docs, textCol, idCol))
    tf.withColumn("bucket", pmod(xxhash64(col("token")), lit(nBuckets)))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/postings")
    val dl = tf.groupBy(idCol).agg(sum("tf").as("dl"))
    dl.write.mode("overwrite").parquet(s"$path/doclen")
    // n_buckets travels with the layout so a query cannot silently
    // prune against the wrong bucket modulus (r15 review)
    dl.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"),
        lit(nBuckets).as("n_buckets"))
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Top-`k` BM25 over a [[writeIndex]] layout — identical scores to
    * [[bm25TopK]] on the indexed corpus, but reading ONLY the query
    * terms' partitions: the bucket list is a literal IN filter Catalyst
    * turns into PartitionFilters before any I/O. The query's buckets are
    * computed with the same `xxhash64` expression via a one-row local
    * relation (no reimplementation of Spark's hash on the driver). */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      query: String, k: Int, nBuckets: Int = 64, k1: Double = 1.2,
      b: Double = 0.75, idCol: String = "doc_id"): DataFrame = {
    val qTerms = queryTerms(query, "searchIndex")
    import spark.implicits._
    val corpus = spark.read.parquet(s"$path/stats") // 1 row
    // The layout's own bucket modulus wins: pruning with a different
    // nBuckets than writeIndex used selects the WRONG directories and
    // silently drops postings (r15 review). The parameter is the
    // fallback for layouts written before n_buckets was recorded.
    val layoutBuckets =
      if (corpus.columns.contains("n_buckets"))
        corpus.select("n_buckets").head().getInt(0)
      else nBuckets
    val buckets = qTerms.toDF("token")
      .select(pmod(xxhash64(col("token")), lit(layoutBuckets)).as("bucket"))
      .collect().map(_.getLong(0)).distinct.toSeq
    val postings = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(buckets: _*) &&
        col("token").isin(qTerms: _*))
    val dfs = postings.groupBy("token").agg(count(lit(1)).as("df"))
    val docLen = spark.read.parquet(s"$path/doclen")
    postings
      .join(broadcast(dfs), Seq("token"))
      .join(docLen, Seq(idCol))
      .crossJoin(broadcast(corpus))
      .select(col(idCol), bm25TermScore(k1, b).as("term_score"))
      .groupBy(idCol)
      .agg(sum("term_score").as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  // --- tf-idf cosine near-duplicates ---------------------------------------

  /** Text near-duplicate pairs by TF-IDF COSINE — the embedding-free
    * complement to MinHash-Jaccard: Jaccard sees shared shingles, tf-idf
    * cosine sees shared RARE vocabulary, catching paraphrased or
    * reordered near-dups whose shingle sets diverge. Weight
    * w(d, t) = tf · ln(N/df); cosine over the sparse vectors via the
    * inverted index: pairs meet only through shared tokens.
    *
    * `maxDf` is the scale lever: tokens appearing in more than `maxDf`
    * documents (stopwords and template glue — precisely the tokens whose
    * idf ≈ 0 contributes nothing) are dropped BEFORE the pair join, so
    * posting-list lengths — and the per-token pair fan-out, the quadratic
    * hazard — are bounded by maxDf, never by corpus frequency. Weights
    * and norms use the post-cut vocabulary on both sides, so the measure
    * stays a true cosine.
    *
    * @return (id_a, id_b, cos round 6) for pairs with cosine ≥ threshold
    *   (gated on the unrounded value) */
  def tfidfNearDupPairs(docs: DataFrame, threshold: Double,
      maxDf: Long = 1000, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val tf = termFreqs(docs, textCol, idCol)
    val dfs = tf.groupBy("token").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val weighted = tf.join(dfs, "token")
      .crossJoin(broadcast(n))
      .select(col(idCol), col("token"),
        (col("tf") * log(col("n_docs") / col("df"))).as("w"))
    val norms = weighted.groupBy(idCol)
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val a = weighted.select(col("token"), col(idCol).as("id_a"),
      col("w").as("wa"))
    val b = weighted.select(col("token"), col(idCol).as("id_b"),
      col("w").as("wb"))
    a.join(b, Seq("token"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(sum(col("wa") * col("wb")).as("dot"))
      .join(norms.select(col(idCol).as("id_a"), col("nrm").as("na")), "id_a")
      .join(norms.select(col(idCol).as("id_b"), col("nrm").as("nb")), "id_b")
      // zero-norm documents (every surviving token weighted 0 — e.g. a
      // doc made entirely of maxDf-boundary boilerplate whose idf is
      // exactly 0) would make cos_raw = 0/0 = NaN, and Spark orders NaN
      // ABOVE every number, so `NaN >= threshold` is TRUE — spurious
      // NaN-scored pairs flowed into dedup drop lists. A zero-norm doc
      // has no similarity to anything; gate the norms.
      .filter(col("na") > 0 && col("nb") > 0)
      .withColumn("cos_raw", col("dot") / (col("na") * col("nb")))
      .filter(col("cos_raw") >= threshold)
      // cos_raw stays exposed so consumers choosing a coarser precision
      // round the RAW value once — re-rounding the 6-decimal `cos` to
      // fewer digits can flip at a rounding boundary vs a single round.
      .select(col("id_a"), col("id_b"), round(col("cos_raw"), 6).as("cos"),
        col("cos_raw"))
  }

  /** Percolation — [[phraseSearch]] reversed: a TABLE of stored two-term
    * phrase queries matched against incoming documents in one pass, the
    * alerting/routing primitive ("which subscriptions does this doc
    * satisfy"). The query table rides a broadcast; per-document work is
    * bounded by its own posting list, so a million stored queries cost
    * the same scan as one.
    *
    * @param queries (query_id, t1, t2) — lowercase phrase terms
    * @return (query_id, idCol, n_matches) */
  def percolate(docs: DataFrame, queries: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val post = positionalPostings(docs, textCol, idCol)
    val first = post.join(broadcast(queries), col("token") === col("t1"))
      .select(col("query_id"), col(idCol), col("pos"), col("t2"))
    val second = post.select(col(idCol), (col("pos") - 1).as("pos"),
      col("token").as("__tok2"))
    first.join(second, Seq(idCol, "pos"))
      .filter(col("__tok2") === col("t2"))
      .groupBy("query_id", idCol)
      .agg(count(lit(1)).as("n_matches"))
  }

  /** Reciprocal-rank fusion of several (id, score) rankings:
    * rrf(d) = Σ_lists 1/(K + rank_list(d)) — the standard way to merge
    * heterogeneous retrievers (BM25, dense ANN, tf) without calibrating
    * their score scales against each other. Ranks are (score desc, id)
    * row numbers per list; a document missing from a list simply
    * contributes nothing.
    *
    * The rank windows are global BY CONTRACT over top-k HIT LISTS
    * (bounded relations — never a corpus; fuse after each retriever's
    * own TakeOrdered cut).
    *
    * @return (idCol, rrf round 6, n_lists) */
  def rrfFuse(rankings: Seq[DataFrame], kConst: Int = 60,
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rankings.nonEmpty, "rrfFuse: no rankings")
    val contribs = rankings.map { r =>
      r.select(col(idCol),
          row_number().over(
            Window.orderBy(col("score").desc, col(idCol))).as("rnk"))
        .select(col(idCol),
          (lit(1.0) / (lit(kConst) + col("rnk"))).as("contrib"))
    }
    contribs.reduce(_ unionByName _)
      .groupBy(idCol)
      .agg(round(sum("contrib"), 6).as("rrf"),
        count(lit(1)).as("n_lists"))
  }

  /** Result snippets: a ±`radius`-char window around the FIRST
    * occurrence of the query term in each matching document — the
    * search-UX step after [[bm25]] ranks. Case-insensitive locate, word
    * and window boundaries clamped to the text; one scalar pass over the
    * (already-ranked, small) hit set.
    *
    * @return (idCol, pos — 1-based char offset, snippet) for docs
    *         containing the term */
  def snippets(hits: DataFrame, term: String, radius: Int = 30,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // instr(text, '') returns 1 — an empty term would mark EVERY doc a
    // hit at pos 1 instead of failing fast like the other entry points
    require(term.trim.nonEmpty, "snippets: empty term")
    val pos = instr(lower(col(textCol)), rootLower(term))
    val start = greatest(pos - radius, lit(1))
    hits.withColumn("pos", pos)
      .filter(col("pos") > 0)
      .select(col(idCol), col("pos"),
        col(textCol).substr(start, lit(2 * radius + term.length))
          .as("snippet"))
  }

  /** Positional postings: one row per (doc, position, token) — the index
    * relation phrase search needs on top of [[termFreqs]]'s bag-of-words
    * counts. */
  def positionalPostings(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
        posexplode(split(lower(col(textCol)), "\\s+"))
          .as(Seq("pos", "token")))
      .filter(length(col("token")) > 0)

  /** Exact phrase search over positional postings: a phrase of k words
    * matches where k postings line up at consecutive positions in one
    * document — (k−1) equi-joins on (doc, pos), each side pre-filtered
    * to ONE term's postings (so join input is the phrase terms' posting
    * lists, never the corpus). The positional analog of [[bm25]]'s
    * bag-of-words scoring; BM25 ranks "has these words", this answers
    * "says exactly this".
    *
    * @return (idCol, n_matches) for documents containing the phrase */
  def phraseSearch(docs: DataFrame, phrase: Seq[String],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch: empty phrase")
    val terms = phrase.map(rootLower)
    val post = positionalPostings(docs, textCol, idCol)
    val first = post.filter(col("token") === terms.head)
      .select(col(idCol), col("pos"))
    val matches = terms.zipWithIndex.tail.foldLeft(first) {
      case (acc, (t, i)) =>
        val next = post.filter(col("token") === t)
          .select(col(idCol), (col("pos") - i).as("pos"))
        acc.join(next, Seq(idCol, "pos"))
    }
    matches.groupBy(idCol).agg(count(lit(1)).as("n_matches"))
  }
}
