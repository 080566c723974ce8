package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, language ID, quality scoring, fingerprinting.
  *
  * Everything here is pure `Column` algebra over `functions._` — no UDFs —
  * so the whole pipeline stays inside whole-stage codegen and scales
  * linearly with one narrow map stage (no shuffles until an explicit
  * aggregation). At 100 TB these run as a single pass over the corpus.
  */
object TextAnalysis {

  /** Whitespace tokenization of normalized text → array<string>.
    * Empty tokens are removed: `split` yields `[""]` on empty input and
    * a trailing `""` after non-space trailing whitespace (`trim` strips
    * only ' '), so without the remove an empty/whitespace-only document
    * counted 1 token and scalar-vs-exploded accounting disagreed (r14
    * review, deferred). `array_remove` stays codegen'd — no lambda. */
  def tokens(text: Column): Column =
    graft.functions.TextShingleFunctions.wsTokens(lower(text))

  /** The regex form [[tokens]] is pinned against (ShinglesParitySpec). */
  private[graft] def tokensRegex(text: Column): Column =
    array_remove(split(lower(trim(text)), "\\s+"), "")

  /** BPE-ish token stream: runs of letters, runs of digits, single
    * punctuation — the standard pre-tokenizer shape. */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Token count as a codegen'd one-pass byte scan (r19) — the value of
    * `size(tokens(text))` without the split/array materialization (case
    * never changes token boundaries, so the raw text scan is exact; the
    * parity spec pins it). */
  def tokenCount(text: Column): Column =
    graft.functions.TextShingleFunctions.wsTokenCount(text)

  /** The array form [[tokenCount]] is pinned against. */
  private[graft] def tokenCountHof(text: Column): Column =
    size(tokensRegex(text))

  /** Word n-gram shingles ("a b c" for n=3) — the unit for MinHash: the
    * shingle space is |vocab|^n, so shingle sets discriminate documents
    * even over a tiny vocabulary where raw token sets collide.
    *
    * Implementation (r19): a codegen'd single-pass byte scan
    * ([[graft.functions.WordShingles]]) — the HOF form it replaces
    * ([[shinglesHof]], kept for the parity spec) is a Catalyst
    * higher-order function, which runs INTERPRETED with per-shingle
    * lambda dispatch; it headed every MinHash/SimHash/dedup path.
    * Value-identical (ShinglesParitySpec property-pins the two); the
    * DuckDB oracles replay the split/array algebra and must keep
    * matching. */
  def shingles(text: Column, n: Int = 3): Column =
    org.apache.spark.sql.GraftSqlShims.columnOf(
      graft.functions.WordShingles(
        org.apache.spark.sql.GraftSqlShims.expressionOf(lower(text)), n))

  /** The HOF Column-algebra form [[shingles]] is pinned against — the
    * token array is bound ONCE as a lambda variable (the outer
    * single-element `transform`): higher-order-function lambdas get no
    * common-subexpression elimination, so referencing `tokens(text)`
    * directly inside the per-shingle lambda would re-run the split regex
    * for every `element_at` — O(tokens²) per document (measured 45× slower
    * at sf0.1). With the binding, each shingle is n O(1) array reads. */
  private[graft] def shinglesHof(text: Column, n: Int = 3): Column =
    element_at(
      transform(array(tokensRegex(text)), t =>
        when(size(t) < n, array(array_join(t, " ")))
          .otherwise(transform(
            sequence(lit(1), size(t) - (n - 1)),
            i => concat_ws(" ",
              (0 until n).map(k => element_at(t, i + k)): _*)))),
      1)

  /** Normalize for fingerprinting: lowercase, strip non [a-z0-9 ],
    * collapse runs of whitespace.
    *
    * Implementation: a codegen'd single-pass char loop
    * ([[graft.functions.NormalizeCollapse]]) — value-identical to the
    * regex composition (property-pinned in NormalizeSpec against
    * [[normalizeRegex]]) but ~10× cheaper: the round-10 streaming sweep
    * measured the two NFA regex passes as the entire throughput wall of
    * the windowed-dedup pipeline (167k vs 1.5M+ events/s). The DuckDB
    * oracles replay the regex form; identical values keep them green. */
  def normalize(text: Column): Column =
    org.apache.spark.sql.GraftSqlShims.columnOf(
      graft.functions.NormalizeCollapse(
        org.apache.spark.sql.GraftSqlShims.expressionOf(lower(text))))

  /** The portable two-regex form [[normalize]] is pinned against —
    * exactly what the DuckDB oracles compute. */
  private[graft] def normalizeRegex(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** Content-defined document fingerprint (md5 of normalized text).
    * md5 is used (not xxhash64) so the fingerprint is portable across
    * engines — the DuckDB oracle computes the identical value. */
  def fingerprint(text: Column): Column =
    graft.functions.DigestFunctions.md5Hex(normalize(text))

  // --- language identification -------------------------------------------

  /** Tiny per-language stopword lists for the n-gram/stopword heuristic.
    * Deliberately small and deterministic; real pipelines would broadcast a
    * larger model, but the *shape* (per-language score → argmax) is the same.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en"),
    "fr" -> Seq("le", "la", "les", "et", "des", "un", "est"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "wo3", "you3", "he2"))

  /** Number of occurrences of any of `words` as whole tokens.
    * `regexp_count` counts matches without materializing a match array
    * (the `regexp_extract_all` + `size` form allocates every match). */
  def stopwordHits(text: Column, words: Seq[String]): Column = {
    // quote each word: raw interpolation made "c++" an invalid pattern
    // and let "." match any char, inflating counts (r14 review).
    // Edge anchors are per-word: \b only works when the word's first AND
    // last chars are regex word chars — '\bc\+\+\b' can never match
    // "c++ rocks" because there is no word boundary between '+' and ' ',
    // so such words silently counted 0 (r14 ADVICE). Words with any
    // non-word edge get whole-whitespace-token lookarounds instead
    // (both sides — mixing \b with a lookaround would count the embedded
    // hit in "c++c++", which is one token, not two).
    def isWordChar(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_'
    // an empty list would mkString to "(?:)", which matches the empty
    // string at every position (length+1 hits) instead of 0
    require(words.nonEmpty, "stopwordHits: empty word list")
    words.foreach(w => require(w.nonEmpty, "stopwordHits: empty stopword"))
    // Factor the \b out of CONSECUTIVE word-char-edged words: one
    // \b(?:w1|w2|…)\b cluster per run instead of per-word anchored
    // branches — the boundary distributes over single-word
    // alternatives, and run-coalescing (vs a global partition) keeps
    // the alternation's first-match order exactly as given, so
    // overlapping mixed-class lists ("c", "c++") behave identically.
    // The engine then checks \b once per position instead of once per
    // branch: measured 2.5x on the langId hot loop, which runs this
    // count once per language per document (r15 review).
    def plainWord(w: String) = isWordChar(w.head) && isWordChar(w.last)
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    var run = List.empty[String]
    def flush(): Unit = if (run.nonEmpty) {
      parts += run.reverse.map(java.util.regex.Pattern.quote)
        .mkString("\\b(?:", "|", ")\\b")
      run = Nil
    }
    words.foreach { w =>
      if (plainWord(w)) run ::= w
      else {
        flush()
        parts += s"(?<!\\S)${java.util.regex.Pattern.quote(w)}(?!\\S)"
      }
    }
    flush()
    regexp_count(lower(text), lit(parts.mkString("|")))
  }

  /** Argmax-of-scores language ID. Ties resolve to the lexicographically
    * first language code (deterministic). Returns (score, lang) struct.
    *
    * The fold runs as `aggregate` over an array of scored structs, NOT a
    * `when(...).otherwise(acc)` expression chain: in the chain form `acc`
    * appears in condition and else-branch at every level, duplicating the
    * regex subtrees combinatorially; as a lambda-bound fold each score is
    * computed exactly once (measured ~2× on the bench). */
  def langId(text: Column): Column = {
    val scored = stopwords.sortBy(_._1).map { case (lang, words) =>
      struct(stopwordHits(text, words).as("score"), lit(lang).as("lang"))
    }
    // max score; on ties the earlier (lexicographically smaller) language
    // wins — the fold keeps `acc` unless strictly greater.
    aggregate(
      array(scored: _*),
      struct(lit(-1).as("score"), lit("").as("lang")),
      (acc, x) =>
        when(x.getField("score") > acc.getField("score"), x).otherwise(acc))
  }

  // --- quality scoring ----------------------------------------------------

  /** r19: the `size(regexp_extract_all(...))` forms materialized one
    * single-char UTF8String PER MATCHING CHARACTER before size() threw
    * the array away — replaced by a codegen'd one-pass byte count
    * ([[graft.functions.CountCharRange]]), value-identical (ASCII-range
    * matches are exactly the matching chars; parity-spec-pinned). The
    * regex forms stay below for the spec. */
  def alphaRatio(text: Column): Column =
    graft.functions.TextShingleFunctions
      .countCharRange(lower(text), 'a', 'z') /
      greatest(length(text), lit(1))

  def digitRatio(text: Column): Column =
    graft.functions.TextShingleFunctions
      .countCharRange(text, '0', '9') /
      greatest(length(text), lit(1))

  private[graft] def alphaRatioRegex(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]"), lit(0))) /
      greatest(length(text), lit(1))

  private[graft] def digitRatioRegex(text: Column): Column =
    size(regexp_extract_all(text, lit("[0-9]"), lit(0))) /
      greatest(length(text), lit(1))

  def avgTokenLen(text: Column): Column = {
    val t = tokens(text)
    length(array_join(t, "")).cast("double") / greatest(size(t), lit(1))
  }

  /** Composite quality score in [0,1]-ish: rewards alphabetic text with
    * mid-length tokens, penalizes digits. Deterministic formula shared with
    * the oracle. */
  def qualityScore(text: Column): Column = {
    val alpha = alphaRatio(text)
    val digit = digitRatio(text)
    val ntok = tokenCount(text).cast("double")
    val lenOk = when(ntok >= 5 && ntok <= 5000, lit(1.0)).otherwise(lit(0.5))
    alpha * lenOk - digit
  }

  /** PII scrubbing — the redaction stage every training-text pipeline
    * runs before anything else sees the bytes: emails, then bare long
    * digit runs (SSN/account-shaped), then separator-formatted phone
    * numbers, each to a typed placeholder. Order matters twice: emails
    * contain digits, and an unbroken 9+-digit run is an <ID> — the
    * <PHONE> pattern only claims separator-formatted numbers. One
    * codegen'd regexp_replace chain, single pass over the corpus. */
  def scrubPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ids = regexp_replace(email, "\\d{9,}", "<ID>")
    regexp_replace(ids,
      "(\\+?\\d{1,3}[-. ()]{0,2})?\\d{3}[-. ()]{0,2}\\d{3}[-. ]?\\d{4}",
      "<PHONE>")
  }

  /** Deterministic train/validation split by id hash — the standard
    * reshuffle-proof way to split a training corpus: the assignment is a
    * pure function of the id (never `rand()`, which changes across
    * retries/replays and leaks validation docs into training). The first
    * 4 md5 hex digits give 65536 buckets; `trainFrac` of them are
    * "train". md5 keeps it portable (oracle-checkable) and stable across
    * engines and runs. */
  def hashSplit(id: Column, trainFrac: Double): Column = {
    val cut = (trainFrac * 65536).toInt
    when(conv(substring(md5(id.cast("string")), 1, 4), 16, 10)
      .cast("int") < cut, "train").otherwise("valid")
  }

  // --- repetition (Gopher-style quality signals) -------------------------

  /** Duplicate fraction of an array: 1 - distinct/total (0 for empty). */
  private def dupFrac(arr: Column): Column = {
    val n = size(arr)
    when(n === 0, lit(0.0))
      .otherwise(round(
        lit(1.0) - size(array_distinct(arr)).cast("double") / n, 4))
  }

  /** Sentence-ish segments: split on '.', trimmed, empties dropped. */
  private def sentences(text: Column): Column =
    filter(transform(split(text, "\\."), s => trim(s)), s => length(s) > 0)

  /** Gopher-style repetition signals per doc: duplicate-sentence fraction
    * and duplicate 2-/3-gram fractions. Boilerplate and degenerately
    * repetitive pages score high and get filtered before training. Pure
    * array algebra — one narrow codegen'd pass, no shuffle, no explode
    * (the n-gram lists stay inside the row). */
  def repetitionStats(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol),
      dupFrac(sentences(t)).as("dup_sent_frac"),
      dupFrac(shingles(t, 2)).as("dup_2gram_frac"),
      dupFrac(shingles(t, 3)).as("dup_3gram_frac"))
  }

  // --- DataFrame-level operators -----------------------------------------

  /** Split documents into `maxTokens`-token chunks starting every
    * `stride` tokens (overlapping context windows when stride <
    * maxTokens) — the standard long-document preprocessing step before
    * packing/tokenization. One narrow codegen'd pass, no shuffle: the
    * token array is bound ONCE as a lambda variable (HOF no-CSE — see
    * [[shingles]]), chunk starts are a per-row `sequence`, and
    * `posexplode` emits one row per chunk. */
  def chunkDocs(docs: DataFrame, maxTokens: Int, stride: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(maxTokens > 0 && stride > 0 && stride <= maxTokens,
      "need 0 < stride <= maxTokens")
    val chunksCol = element_at(
      transform(array(tokens(col(textCol))), t =>
        transform(filter(
            sequence(lit(0), size(t) - 1, lit(stride)),
            // a start whose PREVIOUS window already reached the end
            // would emit a strict suffix of it — with stride <
            // maxTokens that duplicated (maxTokens-stride)/stride tail
            // chunks per long document into the training set (r14
            // review); the first window always stays
            st => st === 0 || st - lit(stride) + lit(maxTokens) < size(t)),
          st =>
          struct(st.as("chunk_start"),
            array_join(slice(t, st + 1, lit(maxTokens)), " ").as("chunk"),
            least(lit(maxTokens), size(t) - st).as("n_tokens")))),
      1)
    docs.select(col(idCol), posexplode(chunksCol).as(Seq("chunk_id", "c")))
      .select(col(idCol), col("chunk_id"),
        col("c.chunk_start").as("chunk_start"),
        col("c.chunk").as("chunk"),
        col("c.n_tokens").as("n_tokens"))
  }

  /** Deterministic weighted corpus mixing: keep each doc of group g with
    * probability `weights(g)` (groups absent from the map keep
    * `defaultWeight`). The keep decision is a pure function of the id —
    * first 4 hex digits of a salted md5 against a 16-bit threshold, the
    * [[hashSplit]] technique with a "mix|" salt so mixing and splitting
    * decisions stay independent — making the sampled mix reshuffle-proof,
    * replay-stable, and portable to external engines for verification.
    * The standard re-weighting step for combining sources/languages into
    * a training mix at a target token budget. */
  def sampleByWeights(docs: DataFrame, groupCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      idCol: String = "doc_id"): DataFrame = {
    require((weights.values ++ Seq(defaultWeight))
        .forall(w => w >= 0.0 && w <= 1.0),
      "weights must be fractions in [0, 1]")
    val bucket = conv(
      substring(md5(concat_ws("|", lit("mix"), col(idCol).cast("string"))),
        1, 4), 16, 10).cast("int")
    val thr = weights.foldLeft(lit((defaultWeight * 65536).toInt)) {
      case (acc, (g, w)) =>
        when(col(groupCol) === g, lit((w * 65536).toInt)).otherwise(acc)
    }
    docs.filter(bucket < thr)
  }

  /** Per-group quota sampling: keep (up to) `perGroup` docs per group,
    * chosen by md5(id) order — deterministic, reshuffle-proof (the kept
    * set is a pure function of the ids, like [[hashSplit]]), and
    * group-balanced (the standard rebalancing step for over-represented
    * languages/sources in a training mix).
    *
    * Scale: the rank filter is pushed down as a window GROUP LIMIT
    * (Spark's `WindowGroupLimit` rewrite): each map task keeps only
    * `perGroup` rows per group *before* the shuffle, so a skewed group
    * costs map-side heap of O(perGroup), not a full-group sort. */
  def stratifiedSample(docs: DataFrame, groupCol: String, perGroup: Int,
      idCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    docs.withColumn("__graft_rk", row_number().over(w))
      .filter(col("__graft_rk") <= perGroup)
      .drop("__graft_rk")
  }

  /** Quality-ranked per-group document cap — "domain caps": bound any one
    * source/domain's contribution to the mix by keeping only its `k`
    * BEST documents (vs [[stratifiedSample]]'s hash-random quota). Rank
    * order is (quality desc, id) — a total order, so the kept set is
    * deterministic and portable.
    *
    * Scale: same `WindowGroupLimit` shape as [[stratifiedSample]] — each
    * map task keeps `k` rows per group before the shuffle, so one
    * overrepresented domain costs O(k) map-side heap, never a full-group
    * sort. */
  def capPerGroup(docs: DataFrame, groupCol: String, k: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(round(qualityScore(col(textCol)), 3).desc, col(idCol))
    docs.withColumn("__graft_rk", row_number().over(w))
      .filter(col("__graft_rk") <= k)
      .drop("__graft_rk")
  }

  /** Token-budget corpus selection: the highest-quality subset whose
    * total token count fits `tokenBudget` — "give me the best N-token
    * training mix" — equivalent to walking docs in (quality desc, id)
    * order and keeping while the running token sum stays within budget.
    *
    * The NAIVE plan is a global window (cumulative sum over a corpus-wide
    * order) — one task holds the corpus. This runs it in two phases with
    * no global window:
    *   1. aggregate total tokens PER QUALITY LEVEL (quality rounds to 3
    *      decimals in [-1, 1], so ≤ ~2001 levels — a bounded driver-side
    *      side-structure, same contract as a broadcast dim); the driver
    *      walks the descending levels to find the BOUNDARY level where
    *      the budget crosses;
    *   2. rows above the boundary pass with a plain filter (no shuffle
    *      beyond the one aggregate); the boundary LEVEL is then cut the
    *      same way AGAIN along the id axis — per-id-range-bucket token
    *      sums (≤ ~2001 buckets, second bounded driver walk), so the only
    *      running-sum window in the plan partitions by ONE id bucket of
    *      the boundary level (~|level|/2000 rows), never a whole level.
    *      This keeps the degenerate corpus — every document at the same
    *      quality, where the boundary level IS the corpus — off the
    *      single-task window path.
    *
    * @return (idCol, q, n_tokens) of the kept documents */
  def tokenBudgetSelect(docs: DataFrame, tokenBudget: Long,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // NULL-text docs have NULL quality: they lose the budget race by
    // definition instead of crashing the driver's level walk on
    // getDouble(NULL) (r14 review)
    val scored = docs.select(col(idCol),
      round(qualityScore(col(textCol)), 3).as("q"),
      tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .filter(col("q").isNotNull)
    val levels = scored.groupBy("q").agg(sum("n_tokens").as("toks"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy(-_._1)
    var cum = 0L
    var boundary: Option[(Double, Long)] = None // (level, tokens before it)
    for ((q, t) <- levels if boundary.isEmpty) {
      if (cum + t <= tokenBudget) cum += t
      else boundary = Some((q, cum))
    }
    boundary match {
      case None => scored // the whole corpus fits the budget
      case Some((bq, before)) =>
        resolveBoundaryLevel(scored, bq, tokenBudget - before, idCol)
    }
  }

  /** Resolve the budget cut INSIDE the boundary quality level: walk its
    * documents in id order, keep while the running token sum stays within
    * `remaining`. Distributed shape: bucket the level by id range into
    * ≤ ~2001 monotone buckets, aggregate per-bucket token sums (bounded
    * driver walk, the same contract as the quality-level walk), keep
    * whole buckets before the boundary bucket with a filter, and run the
    * running-sum window over the boundary BUCKET only. */
  private def resolveBoundaryLevel(scored: DataFrame, bq: Double,
      remaining: Long, idCol: String): DataFrame = {
    val level = scored.filter(col("q") === bq)
    // try_cast, not cast: under ANSI mode a plain cast THROWS on the
    // first non-numeric id instead of signalling the fallback path.
    val idNum = expr(s"try_cast(`$idCol` as bigint)")
    val bounds = level.agg(min(idNum).as("lo"), max(idNum).as("hi"),
      count(lit(1)).as("n"),
      count(idNum).as("n_numeric")).head()
    if (bounds.isNullAt(0) || bounds.getLong(3) != bounds.getLong(2)) {
      // Non-numeric ids (the long cast nulled some out): range-bucketing
      // has no numeric axis, so cut the level with ONE running-sum window
      // over its id order. Any orderable id type works; the cost is a
      // single-task window over one quality LEVEL (not the corpus), the
      // pre-bucketing shape.
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(idCol)
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)
      val kept = level.withColumn("__cum_in", sum("n_tokens").over(w))
        .filter(col("__cum_in") <= remaining)
        .select(scored.columns.map(col).toIndexedSeq: _*)
      return scored.filter(col("q") > bq).union(kept)
    }
    val lo = bounds.getLong(0)
    val width = math.max(1L, (bounds.getLong(1) - lo) / 2000L + 1L)
    // floor((id - lo) div width) is monotone in id, so walking buckets in
    // order then ids within a bucket IS the id-order walk. `div` keeps the
    // arithmetic integral end-to-end — Column `/` is DOUBLE division,
    // whose 53-bit mantissa would misassign buckets for id spreads beyond
    // 2^53.
    val bucketed = level.withColumn("__b",
      expr(s"(try_cast(`$idCol` as bigint) - ${lo}L) div ${width}L"))
    val bucketSums = bucketed.groupBy("__b").agg(sum("n_tokens").as("toks"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    var cum = 0L
    var bBucket: Option[(Long, Long)] = None // (bucket, tokens before it)
    for ((b, t) <- bucketSums if bBucket.isEmpty) {
      if (cum + t <= remaining) cum += t
      else bBucket = Some((b, cum))
    }
    val outCols = scored.columns.map(col).toIndexedSeq
    bBucket match {
      case None => // the whole level fits (callers exclude this, but safe)
        scored.filter(col("q") > bq).union(level.select(outCols: _*))
      case Some((bb, beforeBucket)) =>
        // order by the NUMERIC id, not the raw column: this branch runs
        // only when every id casts (all-numeric), and the buckets walk
        // in numeric order — a string idCol sorted raw would walk
        // "10" < "2" inside the bucket and contradict the bucket walk
        // (r14 review, deferred)
        // raw idCol tiebreak after the numeric key: distinct string ids
        // with equal numeric value ("1" vs "01") would otherwise tie,
        // making the running-sum cut nondeterministic across runs
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("__b")
          .orderBy(expr(s"try_cast(`$idCol` as bigint)"), col(idCol))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, org.apache.spark.sql.expressions.Window
            .currentRow)
        val atBucket = bucketed.filter(col("__b") === bb)
          .withColumn("__cum_in", sum("n_tokens").over(w))
          .filter((lit(beforeBucket) + col("__cum_in")) <= remaining)
          .select(outCols: _*)
        scored.filter(col("q") > bq)
          .union(bucketed.filter(col("__b") < bb).select(outCols: _*))
          .union(atBucket)
    }
  }

  /** Per-group top-`k` token frequencies — the vocabulary slice of a
    * dataset card (most frequent tokens per language/source), and the
    * standard first look at a new corpus slice.
    *
    * Shape at 100 TB: one explode → groupBy(group, token) count with
    * map-side partial aggregation (the token shuffle carries one row per
    * DISTINCT (group, token) per map task, not per occurrence), then the
    * rank filter is pushed down as a window GROUP LIMIT
    * (`WindowGroupLimit`): each task keeps only `k` rows per group before
    * the final shuffle, so no full-group sort ever materializes. Ties
    * break on token order — a total order, so the result is deterministic
    * and portable.
    *
    * @return (group, token, n, rk) with rk in [1, k]
    */
  def topTokensByGroup(docs: DataFrame, groupCol: String, k: Int,
      textCol: String = "text"): DataFrame = {
    require(k > 0, "k must be positive")
    val counts = docs
      .select(col(groupCol), explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(groupCol, "token")
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(col("n").desc, col("token"))
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Keep the top `frac` of each group by [[qualityScore]] — per-language
    * (or per-source) quality filtering against a *relative* bar, the
    * standard way to apply one quality model across slices with different
    * score distributions (an absolute threshold keeps everything from a
    * clean slice and nothing from a noisy one).
    *
    * Two paths, the established portable/scale twin split:
    *   - `approximate = false` (verification twin): rank-based — keep the
    *     `ceil(frac · |group|)` best rows by (score desc, id). Pure
    *     integer decisions over a total order, so an external engine
    *     reproduces the exact kept set. Costs one per-group window sort.
    *   - `approximate = true` (100 TB path): value-based — per-group
    *     `approx_percentile` threshold (constant-size mergeable sketch,
    *     map-side combined; one tiny row per group) broadcast back as a
    *     join, then a stateless filter. No per-group sort, no skew
    *     hazard; the kept fraction is approximate within the sketch
    *     accuracy (spec-asserted against the exact twin).
    */
  def qualityTopFraction(docs: DataFrame, groupCol: String, frac: Double,
      approximate: Boolean = false, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, "frac must be in (0, 1]")
    // NULL-quality docs (NULL text) are excluded from selection AND from
    // the per-group size basis on BOTH paths. Before r15 the twins
    // diverged on them: the approx threshold filter dropped NULLs (NULL
    // >= thr is NULL) while the exact rank counted them into n_g and
    // could even keep them at frac near 1 — same call, different kept
    // sets (r14 review, deferred).
    val scored = docs.withColumn("q_score",
        round(qualityScore(col(textCol)), 3))
      .filter(col("q_score").isNotNull)
    if (approximate) {
      val thr = scored.groupBy(groupCol)
        .agg(percentile_approx(col("q_score"), lit(1.0 - frac), lit(10000))
          .as("__graft_q_thr"))
      scored.join(broadcast(thr), Seq(groupCol))
        .filter(col("q_score") >= col("__graft_q_thr"))
        .drop("__graft_q_thr")
    } else {
      val byScore = org.apache.spark.sql.expressions.Window
        .partitionBy(groupCol)
        .orderBy(col("q_score").desc, col(idCol))
      val whole = org.apache.spark.sql.expressions.Window
        .partitionBy(groupCol)
      scored.withColumn("__graft_rk", row_number().over(byScore))
        .withColumn("__graft_n_g", count(lit(1)).over(whole))
        .filter(col("__graft_rk") <=
          ceil(col("__graft_n_g") * lit(frac)))
        .drop("__graft_rk", "__graft_n_g")
    }
  }

  /** Vocabulary-coded documents — the tokenize-to-ids step between a
    * cleaned corpus and a trainer: build the top-`vocabSize` vocabulary
    * (by count desc, token asc — a total order), assign ids in rank
    * order (0-based), and re-emit each document as its token-id sequence
    * with out-of-vocabulary tokens coded `-1`.
    *
    * Shape at 100 TB: vocab construction is one partial-aggregated
    * count + TakeOrdered (the [[TextSearch.topVocab]] shape) and the
    * id-rank window runs over the already-limited `vocabSize` rows, not
    * the corpus; coding is explode → broadcast-join vocab → one
    * groupBy(id) whose per-doc list is re-ordered in-row by position.
    *
    * @return (id, token_ids array<int>, n_tokens, n_oov)
    */
  def tokensToIds(docs: DataFrame, vocabSize: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    val toks = docs.select(col(idCol),
        posexplode(tokens(col(textCol))).as(Seq("pos", "token")))
      .filter(length(col("token")) > 0)
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(vocabSize)
      .withColumn("vid", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("token"))) - 1)
      .select("token", "vid")
    val coded = toks.join(broadcast(vocab), Seq("token"), "left")
      .select(col(idCol), col("pos"),
        coalesce(col("vid"), lit(-1)).as("vid"))
    val assembled = coded.groupBy(idCol)
      .agg(
        transform(
          array_sort(collect_list(struct(col("pos"), col("vid")))),
          s => s.getField("vid")).as("token_ids"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("vid") === -1, 1L).otherwise(0L)).as("n_oov"))
    // Anchor on the input docs: a token-less (empty/whitespace) doc
    // comes back with an empty ids array and zero counts instead of
    // dropping out of the row set (r14 review, deferred).
    docs.select(col(idCol)).join(assembled, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("token_ids"), array().cast("array<int>"))
          .as("token_ids"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
  }

  /** Unigram language-model document scoring (the CCNet-style perplexity
    * proxy): p(token) = corpus count / corpus total, and a document's
    * score is the mean log-probability of its tokens — repetitive
    * common-token documents score high, rare-gibberish documents score
    * low; pipelines threshold or bucket on this before training.
    *
    * Shape at 100 TB: one token count (partial-aggregated), the 1-row
    * total broadcast, one keyed join back to the token stream, one
    * groupBy(doc). The model table stays a relation (joined, never
    * collected) so vocabulary size is unbounded.
    *
    * @return (id, n_tokens, avg_logprob)
    */
  def unigramLogprob(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol),
        explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    val counts = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("total"))
    toks.join(counts, Seq("token"))
      .crossJoin(broadcast(total))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(log(col("cnt").cast("double") / col("total"))), 4)
          .as("avg_logprob"))
  }

  /** DSIR-style data selection with importance resampling (Xie et al.
    * 2023, arXiv:2302.03169): score every pool document by how much more
    * likely its tokens are under a TARGET-domain unigram LM than under
    * the pool's own — `avg_w [ln p_tgt(w) − ln p_src(w)]` — and keep the
    * `k` best. Laplace smoothing over the UNION vocabulary keeps both
    * models finite on tokens the other side never saw, so the ratio is
    * total on the pool. Selection order (weight desc, id) is total —
    * deterministic and portable (q87); pass `temperature > 0` for the
    * paper's Gumbel-top-k RESAMPLING instead of hard top-k — the Gumbel
    * noise is md5-derived from (salt, id), so even the sampled variant
    * replays value-for-value in an external engine (q87b).
    *
    * Shape at 100 TB: two token counts (partial-aggregated), one
    * full-outer vocab join keyed by token, a 1-row constants broadcast,
    * one keyed join back to the pool token stream, one groupBy(doc), and
    * a TakeOrdered top-k — no global window, no driver-side corpus. The
    * target corpus is typically tiny (a quality slice) but is never
    * collected, so it may be arbitrarily large.
    *
    * @return (idCol, n_tokens, weight) of the `k` selected documents */
  def importanceSelect(pool: DataFrame, target: DataFrame, k: Int,
      temperature: Double = 0.0, salt: String = "dsir",
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k > 0, "k must be positive")
    require(temperature >= 0.0, "temperature must be >= 0")
    def toks(df: DataFrame) = df
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    val ptoks = toks(pool)
    val cs = ptoks.groupBy("token").agg(count(lit(1)).as("cs"))
    val ct = toks(target).groupBy("token").agg(count(lit(1)).as("ct"))
    val vocab = cs.join(ct, Seq("token"), "full_outer")
      .select(col("token"), coalesce(col("cs"), lit(0L)).as("cs"),
        coalesce(col("ct"), lit(0L)).as("ct"))
    // |V|, Σcs, Σct: one 1-row aggregate, broadcast like any tiny dim.
    val consts = vocab.agg(count(lit(1)).as("v"), sum("cs").as("ts"),
      sum("ct").as("tt"))
    val weights = ptoks.join(vocab, Seq("token"))
      .crossJoin(broadcast(consts))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(
          log((col("ct") + 1).cast("double") / (col("tt") + col("v"))) -
          log((col("cs") + 1).cast("double") / (col("ts") + col("v")))), 6)
          .as("weight"))
    val key =
      if (temperature == 0.0) col("weight")
      else {
        // Portable Gumbel(0,1): u = (first-8-hex of md5 + 0.5) / 2^32 is
        // uniform in (0,1) and bit-identical across engines; g = −ln(−ln u).
        val u = (conv(substring(md5(concat(lit(salt + "|"),
          col(idCol).cast("string"))), 1, 8), 16, 10).cast("double") +
          lit(0.5)) / lit(4294967296.0)
        round(col("weight") / lit(temperature) - log(-log(u)), 6)
      }
    weights.withColumn("__key", key)
      .orderBy(col("__key").desc, col(idCol)).limit(k)
      .drop("__key")
  }

  /** mC4/XLM-R-style language-temperature resampling (arXiv:1910.10683
    * §3.4.3, arXiv:1911.02116 §3): downsample over-represented groups so
    * the kept corpus's group shares follow `p_g^alpha` instead of the raw
    * `p_g`. Per-group keep rate `r_g = (n_g / n_min)^(alpha-1)` — the
    * no-upsampling normalization: the SMALLEST group keeps everything,
    * every larger group is thinned toward the tempered share. Keep
    * decisions are a pure function of (salt, id) — md5-uniform < r_g —
    * so the sample is reshuffle-proof, reproducible, and replayable
    * value-for-value in an external engine (q88).
    *
    * Shape at 100 TB: one tiny groupBy(group) count, a 1-row min
    * broadcast over it, one broadcast join of the per-group rate back to
    * the corpus, and a map-side filter — the corpus itself never
    * shuffles.
    *
    * @return the kept docs + their group's `keep_rate` */
  def temperatureSample(docs: DataFrame, groupCol: String, alpha: Double,
      salt: String = "temp", idCol: String = "doc_id"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    // NULL-group docs can never survive the equi-join below, but their
    // count previously formed a real group that could become __nmin and
    // gut every real group's keep_rate (r14 review) — exclude them from
    // the rate computation outright
    val grouped = docs.filter(col(groupCol).isNotNull)
    val counts = grouped.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min("__n").as("__nmin"))))
      .select(col(groupCol),
        round(pow(col("__n").cast("double") / col("__nmin"),
          lit(alpha - 1.0)), 6).as("keep_rate"))
    // Portable uniform in (0,1): first-8-hex of md5, bit-identical across
    // engines (same trick as importanceSelect's Gumbel noise).
    val u = (conv(substring(md5(concat(lit(salt + "|"),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("double") +
      lit(0.5)) / lit(4294967296.0)
    grouped.join(broadcast(rates), Seq(groupCol))
      .filter(u < col("keep_rate"))
  }

  /** CCNet-style perplexity bucketing (arXiv:1911.00359 §4.3): score each
    * document under ITS OWN language's unigram LM (MLE — every token is in
    * its own model, so no smoothing is needed) and split each language
    * into `nBuckets` equal tiers by `ntile` — bucket 1 = "head" (lowest
    * perplexity, i.e. highest avg token log-prob), bucket `nBuckets` =
    * "tail". The (avg_logprob desc, id) ordering is total, so tier
    * assignment is deterministic and portable (q89).
    *
    * Shape at 100 TB: per-(lang, token) counts are partial-aggregated;
    * the per-lang totals broadcast; the only sort is the per-language
    * ntile window — partitioned by language, never global. For a corpus
    * where one language dominates, replace the window with broadcast
    * thresholds from `approx_percentile` over avg_logprob (same joins, no
    * sort) — the window form is the exact, value-checkable contract.
    *
    * @return (idCol, langCol, n_tokens, avg_logprob, bucket) */
  def perplexityBuckets(docs: DataFrame, nBuckets: Int = 3,
      textCol: String = "text", idCol: String = "doc_id",
      langCol: String = "lang"): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val w = org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol), col(langCol),
        explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    val counts = toks.groupBy(langCol, "token")
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy(langCol).agg(sum("cnt").as("total"))
    toks.join(counts, Seq(langCol, "token"))
      .join(broadcast(totals), Seq(langCol))
      .groupBy(col(idCol), col(langCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(log(col("cnt").cast("double") / col("total"))), 6)
          .as("avg_logprob"))
      .withColumn("bucket", ntile(nBuckets).over(
        w.partitionBy(langCol)
          .orderBy(col("avg_logprob").desc, col(idCol))))
  }

  /** CORPUS-level duplicated-span statistics per document: the fraction of
    * each doc's word `n`-gram positions whose n-gram also appears in at
    * least one OTHER document (the signal behind exact-substring dedup à la
    * "Deduplicating Training Data Makes Language Models Better" — docs
    * dominated by spans that exist elsewhere are copies, templates, or
    * boilerplate). Unlike [[repetitionStats]] (within-doc), this is a
    * cross-doc measure.
    *
    * Shape at 100 TB: one posexplode to (id, pos, gram), one distinct
    * (id, gram) projection, one groupBy(gram) doc-frequency, one semi-join
    * back on gram, one groupBy(id). With `portable = false` grams are
    * hashed to 8-byte xxhash64 keys BEFORE any shuffle (collisions can only
    * nudge a fraction); `portable = true` keeps raw gram strings so an
    * external engine reproduces exact values.
    *
    * @return (id, n_spans, dup_spans, dup_span_frac)
    */
  def dupSpanStats(docs: DataFrame, n: Int = 5,
      textCol: String = "text", idCol: String = "doc_id",
      portable: Boolean = false): DataFrame = {
    val raw = docs.select(col(idCol),
        posexplode(shingles(col(textCol), n)).as(Seq("pos", "gram")))
      .filter(length(col("gram")) > 0)
    val grams =
      if (portable) raw
      else raw.select(col(idCol), col("pos"),
        xxhash64(col("gram")).as("gram"))
    // Doc frequency per gram over DISTINCT (id, gram) — a gram repeated
    // within one doc is not corpus duplication.
    val docFreq = grams.select(col(idCol), col("gram")).distinct()
      .groupBy("gram").agg(count(lit(1)).as("df"))
    val dupGrams = docFreq.filter(col("df") >= 2).select("gram")
    val marked = grams.join(dupGrams, Seq("gram"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("dup_spans"))
    grams.groupBy(idCol).agg(count(lit(1)).as("n_spans"))
      .join(marked, Seq(idCol), "left")
      .select(col(idCol), col("n_spans"),
        coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
        round(coalesce(col("dup_spans"), lit(0L)) / col("n_spans"), 4)
          .as("dup_span_frac"))
  }

  /** Remove boilerplate LINES: any line (after trimming) occurring in at
    * least `minDocs` distinct documents is dropped from every document —
    * the C4-style cross-document line dedup that strips headers, footers,
    * cookie banners, and license blocks. Docs whose every line is
    * boilerplate survive with empty text (dropping rows is a separate
    * quality-filter decision).
    *
    * Shape at 100 TB: lines are md5-fingerprinted BEFORE the doc-frequency
    * shuffle (32-byte keys, not line bytes); reassembly is one
    * groupBy(id) whose per-doc line list is array_sort'ed by position —
    * bounded by document size, no window, no driver state.
    *
    * @return (id, text) with boilerplate lines removed, line order kept.
    */
  def removeBoilerplateLines(docs: DataFrame, minDocs: Int = 2,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(minDocs >= 2, "a line must recur across >= 2 docs to be boilerplate")
    // Blank lines are NOT candidates for boilerplate (every doc shares
    // them) but they ARE document structure: the reassembly must keep
    // them or paragraph boundaries collapse corpus-wide even when
    // nothing is boilerplate (r14 review, deferred). So fingerprint and
    // df-count only non-blank lines; reassemble from ALL lines minus
    // the boilerplate hits.
    val allLines = docs.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val lines = allLines
      .filter(length(trim(col("line"))) > 0)
      .withColumn("lfp", md5(trim(col("line"))))
    val boiler = lines.select(col(idCol), col("lfp")).distinct()
      .groupBy("lfp").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
      .select("lfp")
    val kept = allLines.withColumn("lfp", md5(trim(col("line"))))
      .join(boiler, Seq("lfp"), "left_anti")
      .groupBy(idCol)
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line")), "\n").as("clean_text"))
    // Preserve every input doc: all-boilerplate docs keep an empty text
    // (all-blank docs keep their blank lines — structure, not boiler).
    docs.select(col(idCol))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("clean_text"), lit("")).as(textCol))
  }

  /** Per-split corpus summary: doc counts, token totals, distinct-token
    * cardinality, and token-count percentiles — the dataset card a
    * pipeline publishes per corpus slice.
    *
    * `approximate = true` is the 100 TB path: `approx_count_distinct`
    * (HyperLogLog++, relative error ~`hllRsd`) replaces the exact
    * distinct — whose shuffle carries every distinct token — with a
    * constant-size mergeable sketch per partition, and
    * `approx_percentile` replaces the exact sort-based percentile the
    * same way. The exact form (`approximate = false`) is the portable
    * correctness twin; the sketch path's error is asserted in-engine
    * against it (see spec / q63b).
    */
  def corpusStats(docs: DataFrame, approximate: Boolean = false,
      hllRsd: Double = 0.02, textCol: String = "text",
      idCol: String = "doc_id", trainFrac: Double = 0.9): DataFrame = {
    // trainFrac was hardcoded 0.9 through r14 — a caller publishing a
    // card for a differently-split corpus silently reported the wrong
    // split boundary (r14 review, deferred)
    require(trainFrac > 0.0 && trainFrac < 1.0,
      "trainFrac must be in (0, 1)")
    val split = hashSplit(col(idCol), trainFrac).as("split")
    val perDoc = docs.select(split, tokenCount(col(textCol)).as("n_tok"))
    val tokenRel = docs.select(split,
        explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    val distinctToks =
      if (approximate)
        tokenRel.groupBy("split")
          .agg(approx_count_distinct(col("token"), hllRsd)
            .as("distinct_tokens"))
      else
        tokenRel.select(col("split"), col("token")).distinct()
          .groupBy("split")
          .agg(count(lit(1)).as("distinct_tokens"))
    val pcts =
      if (approximate)
        percentile_approx(col("n_tok"),
          array(lit(0.5), lit(0.9)), lit(10000))
      else expr("percentile(n_tok, array(0.5D, 0.9D))")
    val base = perDoc.groupBy("split").agg(
      count(lit(1)).as("n_docs"),
      sum("n_tok").as("total_tokens"),
      pcts.as("tok_pcts"))
    base.join(distinctToks, Seq("split"))
      .select(col("split"), col("n_docs"), col("total_tokens"),
        col("distinct_tokens"),
        col("tok_pcts").getItem(0).cast("double").as("p50_tokens"),
        col("tok_pcts").getItem(1).cast("double").as("p90_tokens"))
  }

  /** Per-document token entropy (nats): −Σ p ln p over the document's own
    * token distribution — the standard degenerate-text signal (near-zero
    * entropy = one token repeated; quality pipelines band on it beside
    * [[repetitionStats]]). One explode and two keyed aggregations, both
    * partial-aggregated map-side.
    *
    * @return (id, n_tokens, entropy)
    */
  def tokenEntropy(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol),
        explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    toks.groupBy(idCol, "token").agg(count(lit(1)).as("c"))
      .groupBy(idCol)
      .agg(sum("c").as("n_tokens"),
        round(
          log(sum("c")) -
            sum(col("c") * log(col("c"))) / sum("c"),
          4).as("entropy"))
  }

  /** Corpus snapshot diff — the dataset-versioning primitive an
    * incremental pipeline runs between two corpus versions: classify
    * every id as `added` (new only), `removed` (old only), `changed`
    * (both, content fingerprint differs), or `unchanged`. Content
    * equality is the portable md5 [[fingerprint]], so the decision is
    * engine-portable and replay-stable.
    *
    * Shape at 100 TB: both sides project to (id, 32-byte fp) BEFORE the
    * full-outer join, so the one keyed shuffle carries fingerprints,
    * never document bytes.
    *
    * @return (id, status) for every id in either snapshot
    */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // explicit presence markers (r14 review): inferring presence from
    // fingerprint nullity misclassified NULL-text docs — a removed doc
    // whose OLD text was NULL reported "added", and a doc whose new
    // text is NULL reported "removed"
    val o = oldDocs.select(col(idCol),
      fingerprint(col(textCol)).as("fp_old"), lit(true).as("__in_old"))
    val n = newDocs.select(col(idCol),
      fingerprint(col(textCol)).as("fp_new"), lit(true).as("__in_new"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(!(col("fp_old") <=> col("fp_new")), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Corpus contract validation — the expectations report a pipeline
    * checks before accepting a snapshot: row/distinct-id counts (id
    * uniqueness), null/empty text counts, token-count bounds. One
    * aggregation pass; count(distinct) plans as Spark's two-stage
    * partial-distinct, so no single reducer sees all ids.
    *
    * @return one row: (n_rows, n_distinct_ids, n_dup_ids, n_null_text,
    *         n_empty_text, min_tokens, max_tokens)
    */
  def validateCorpus(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    docs.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col(idCol)).as("n_distinct_ids"),
      (count(lit(1)) - countDistinct(col(idCol))).as("n_dup_ids"),
      sum(when(t.isNull, 1L).otherwise(0L)).as("n_null_text"),
      sum(when(t.isNotNull && length(trim(t)) === 0, 1L).otherwise(0L))
        .as("n_empty_text"),
      min(when(t.isNotNull, tokenCount(t).cast("long"))).as("min_tokens"),
      max(when(t.isNotNull, tokenCount(t).cast("long"))).as("max_tokens"))
  }

  /** Corpus composition report — the dataset-card table per (source,
    * language) slice: document count, token total, and each slice's
    * share of corpus documents and tokens. One grouped aggregation; the
    * corpus totals come from a broadcast 1-row aggregate, not a window
    * (a global window would single-task the report at 100 TB).
    *
    * @return (source, lang, n_docs, total_tokens, doc_share, tok_share)
    */
  def corpusComposition(docs: DataFrame, textCol: String = "text")
      : DataFrame = {
    val bySlice = docs
      .select(col("source"), col("lang"),
        tokenCount(col(textCol)).cast("long").as("n_tok"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("total_tokens"))
    val totals = bySlice.agg(
      sum("n_docs").as("all_docs"), sum("total_tokens").as("all_tokens"))
    bySlice.crossJoin(broadcast(totals))
      .select(col("source"), col("lang"), col("n_docs"), col("total_tokens"),
        round(col("n_docs") / col("all_docs"), 4).as("doc_share"),
        round(col("total_tokens") / col("all_tokens"), 4).as("tok_share"))
  }

  /** The one-pass quality sweep: every per-document scalar signal a
    * filtering pipeline thresholds on — quality score, alpha/digit
    * ratios, mean token length, language, within-doc repetition — in ONE
    * narrow codegen'd projection. At 100 TB this is the single read the
    * corpus gets before filtering decisions; signals that would need a
    * shuffle (cross-doc span stats, token entropy) stay separate
    * operators by design.
    */
  def qualitySignals(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      round(qualityScore(t), 3).as("quality"),
      round(alphaRatio(t), 3).as("alpha_ratio"),
      round(digitRatio(t), 3).as("digit_ratio"),
      round(avgTokenLen(t), 3).as("avg_tok_len"),
      tokenCount(t).cast("long").as("n_tokens"),
      langId(t).getField("lang").as("lang"),
      dupFrac(sentences(t)).as("dup_sent_frac"),
      dupFrac(shingles(t, 2)).as("dup_2gram_frac"))
  }

  /** Per-document stats table: one narrow projection pass. */
  def docStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col("doc_id"),
      tokenCount(t).as("n_tokens"),
      size(bpeishTokens(t)).as("n_bpeish"),
      length(t).as("len"),
      round(avgTokenLen(t), 3).as("avg_tok_len"),
      round(alphaRatio(t), 3).as("alpha_ratio"))
  }

  // --- count-min sketch ----------------------------------------------------

  /** PORTABLE count-min hash: row `j`'s bucket for a token is the first
    * 8 md5 hex chars of `"cms<j>|<token>"` mod `width` — reproducible in
    * any engine with md5 (the q35/q36 discipline applied to sketching). */
  private def cmsBucket(j: Int, token: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"cms$j|"), token)), 1, 8), 16, 10)
      .cast("long"), lit(width.toLong))

  /** Count-min sketch of the corpus token stream: `depth × width` counter
    * cells, `(j, bucket, c)` rows. The sketch is the AT-REST artifact —
    * built once per corpus (or merged per shard: cells are additive), it
    * answers frequency queries for ARBITRARY tokens later without
    * re-scanning text; estimates only ever overcount (by ≤ εN with
    * ε = e/width at confidence 1 − e^−depth).
    *
    * Shape at 100 TB: one explode → one groupBy over (depth × width)
    * keys, map-side combined — shuffle volume is the CELL count
    * (constant), not the token count. Merging shard sketches is a
    * second tiny groupBy over the same keys. */
  def cmsSketch(docs: DataFrame, width: Int = 1024, depth: Int = 4,
      textCol: String = "text"): DataFrame = {
    require(width > 0 && depth > 0, "width and depth must be positive")
    val toks = docs
      .select(explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    val cells = (0 until depth).map { j =>
      struct(lit(j).as("j"), cmsBucket(j, col("token"), width).as("bucket"))
    }
    toks.select(explode(array(cells: _*)).as("jb"))
      .select(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .groupBy("j", "bucket")
      .agg(count(lit(1)).as("c"))
  }

  /** Count-min frequency estimates for a panel of query tokens against a
    * [[cmsSketch]]: est(token) = min over rows j of cell(j, bucket_j).
    * The panel is tiny next to the sketch, so both sides of the probe
    * join broadcast; missing cells read 0. `width`/`depth` must match
    * the sketch's build parameters. */
  def cmsEstimate(sketch: DataFrame, queryTokens: DataFrame,
      width: Int = 1024, depth: Int = 4,
      tokenCol: String = "token"): DataFrame = {
    val cells = (0 until depth).map { j =>
      struct(lit(j).as("j"),
        cmsBucket(j, col(tokenCol), width).as("bucket"))
    }
    queryTokens.select(col(tokenCol), explode(array(cells: _*)).as("jb"))
      .select(col(tokenCol), col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .na.fill(0L, Seq("c"))
      .groupBy(tokenCol)
      .agg(min("c").as("est"))
  }

  // --- collocations (PMI) --------------------------------------------------

  /** Bigram collocations by pointwise mutual information:
    * pmi(a,b) = ln( (c_ab / T) / ((c_a / U) · (c_b / U)) ) with c_ab the
    * adjacent-bigram count (T bigrams total) and c_a the unigram count
    * (U tokens total) — the standard corpus-exploration view of which
    * token pairs co-occur far above chance (dataset-card material, and a
    * boilerplate detector: contract/template phrases light up).
    *
    * Shape at 100 TB: bigrams come from a per-DOCUMENT window (key =
    * doc id, never global); counts are two map-side-combined groupBys;
    * the unigram table joins in twice by token. Only bigrams with
    * `c_ab ≥ minCount` survive to the join, bounding the output.
    *
    * @return (tok_a, tok_b, n_ab, pmi round 6) */
  def pmiBigrams(docs: DataFrame, minCount: Long = 2,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val pos = docs.select(col(idCol),
        posexplode(tokens(col(textCol))).as(Seq("pos", "token")))
      .filter(length(col("token")) > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("pos")
    val bi = pos
      .withColumn("next", lead(col("token"), 1).over(w))
      .filter(col("next").isNotNull)
      .groupBy(col("token").as("tok_a"), col("next").as("tok_b"))
      .agg(count(lit(1)).as("n_ab"))
    val uni = pos.groupBy("token").agg(count(lit(1)).as("n"))
    val totals = bi.agg(sum("n_ab").cast("double").as("t_bi"))
      .crossJoin(uni.agg(sum("n").cast("double").as("u_uni")))
    bi.filter(col("n_ab") >= minCount)
      .join(uni.select(col("token").as("tok_a"), col("n").as("n_a")), "tok_a")
      .join(uni.select(col("token").as("tok_b"), col("n").as("n_b")), "tok_b")
      .crossJoin(broadcast(totals))
      .select(col("tok_a"), col("tok_b"), col("n_ab"),
        round(log((col("n_ab") / col("t_bi")) /
          ((col("n_a") / col("u_uni")) * (col("n_b") / col("u_uni")))), 6)
          .as("pmi"))
  }

  // --- content-defined chunking --------------------------------------------

  /** Content-defined chunking over the token stream: a token is a chunk
    * BOUNDARY when its portable hash (first 8 md5 hex chars) ≡ 0 mod
    * `modulus` — boundaries move with content, not offsets, so an
    * insertion near a document's head shifts ONE chunk, not every chunk
    * after it (the rsync/CDC property fixed-size chunking lacks).
    * A boundary token starts a new chunk; expected chunk length is
    * `modulus` tokens.
    *
    * Shape at 100 TB: one posexplode, one per-DOCUMENT window (key = doc
    * id — document-bounded, never global), one groupBy (doc, chunk).
    *
    * @return (idCol, chunk_id, n_tokens, chunk_fp) — chunk_fp = md5 of
    *   the space-joined chunk tokens */
  def cdcChunks(docs: DataFrame, modulus: Int = 8,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(modulus > 0, "modulus must be positive")
    val pos = docs.select(col(idCol),
        posexplode(tokens(col(textCol))).as(Seq("pos", "token")))
      .filter(length(col("token")) > 0)
    val boundary = (pmod(conv(substring(md5(concat(lit("cdc|"),
      col("token"))), 1, 8), 16, 10).cast("long"),
      lit(modulus.toLong)) === 0).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    pos.withColumn("chunk_id", sum(boundary).over(w))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(count(lit(1)).as("n_tokens"),
        md5(concat_ws(" ", sort_array(collect_list(struct(col("pos"),
          col("token")))).getField("token"))).as("chunk_fp"))
  }

  /** Per-document n-gram NOVELTY against a reference corpus: the
    * fraction of a document's distinct word n-grams NOT present in the
    * reference — the continuous form of decontamination (novelty 0 = the
    * doc is entirely built from reference n-grams; 1 = entirely new).
    * Used to score incoming crawls against the at-rest corpus, to rank
    * "how much new text does this source actually add".
    *
    * Shape at 100 TB: the reference gram set is distinct-hashed and the
    * probe is one gram-keyed semi-join-style LEFT join; per-doc counts
    * partial-aggregate. `portable` md5 vs xxhash64 — same discipline as
    * [[graft.operators.Dedup.decontaminate]] (a hash collision can only
    * under-count novelty by one gram).
    *
    * @return (idCol, n_grams, n_seen, novelty round 6) */
  def noveltyScore(docs: DataFrame, ref: DataFrame, n: Int = 3,
      textCol: String = "text", idCol: String = "doc_id",
      portable: Boolean = false): DataFrame = {
    def grams(df: DataFrame, cols: Column*): DataFrame = {
      val g = df.select(cols :+
          explode(shingles(col(textCol), n)).as("token"): _*)
        .filter(length(col("token")) > 0)
      val hashed =
        if (portable) g.withColumn("gh", md5(col("token")))
        else g.withColumn("gh", xxhash64(col("token")))
      hashed.drop("token").distinct()
    }
    val refGrams = grams(ref).withColumn("__seen", lit(1))
    grams(docs, col(idCol))
      .join(refGrams, Seq("gh"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__seen"), lit(0))).as("n_seen"))
      .select(col(idCol), col("n_grams"), col("n_seen"),
        round(lit(1.0) - col("n_seen") / col("n_grams"), 6).as("novelty"))
  }

  /** Per-group QUANTILE-NORMALIZED quality: each document's quality
    * mapped to its percent rank WITHIN its group (source/language) — the
    * source-fair form of quality filtering: a global threshold on raw
    * quality lets a clean source crowd out a noisy one entirely; a
    * threshold on the normalized rank keeps the best X% of EACH source.
    * Total order (quality, id) inside each group makes ranks
    * deterministic.
    *
    * Shape at 100 TB: one window keyed by the group column — the
    * partition is a source, never the corpus.
    *
    * @return (idCol, group, q, q_rank round 6) */
  def qualityQuantileNormalize(docs: DataFrame, groupCol: String = "source",
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("q"), col(idCol))
    docs.select(col(idCol), col(groupCol),
        round(qualityScore(col(textCol)), 3).as("q"))
      .withColumn("q_rank", round(percent_rank().over(w), 6))
  }

  /** Cross-document SHARED chunks over [[cdcChunks]]: chunk fingerprints
    * appearing in ≥ `minDocs` distinct documents — the partial-duplicate
    * report exact whole-doc dedup cannot see (license headers, navigation
    * boilerplate, templated passages shared across otherwise-distinct
    * pages). One groupBy over the chunk relation.
    *
    * @return (chunk_fp, n_docs, n_occurrences) */
  def sharedChunks(chunks: DataFrame, minDocs: Int = 2,
      idCol: String = "doc_id"): DataFrame =
    chunks.groupBy("chunk_fp")
      .agg(countDistinct(idCol).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)

  /** Iterative-proportional-fitting (raking) mixture weights over the
    * (source × lang) contingency table: per-cell sampling weights such
    * that the weighted corpus marginals approach UNIFORM source shares
    * and UNIFORM lang shares simultaneously — the two-constraint form of
    * corpus mixing ([[sampleByWeights]] fits one marginal; real mixes
    * must hit language AND source targets at once). Fixed `iters`
    * alternating fits (source then lang), the deterministic form an
    * oracle replays unrolled.
    *
    * Shape at 100 TB: ONE corpus aggregation builds the cell table
    * (|sources|·|langs| rows); every iteration then runs on cells only —
    * broadcast-scale relations, zero further corpus passes. Apply the
    * result by joining `weight` back on (source, lang).
    *
    * @return (source, lang, n_docs, weight round 6, eff_docs round 4) */
  def ipfMixWeights(docs: DataFrame, sourceCol: String = "source",
      langCol: String = "lang", iters: Int = 3): DataFrame = {
    val cells = docs.groupBy(sourceCol, langCol)
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val nS = cells.select(sourceCol).distinct().count().toDouble
    val nL = cells.select(langCol).distinct().count().toDouble
    val total = cells.agg(sum("n")).head().getLong(0).toDouble
    var w = cells.withColumn("w", lit(1.0))
    for (_ <- 0 until iters) {
      val bySrc = w.groupBy(sourceCol)
        .agg(sum(col("w") * col("n")).as("ms"))
      w = w.join(bySrc, sourceCol)
        .withColumn("w", col("w") * lit(total / nS) / col("ms"))
        .drop("ms")
      val byLang = w.groupBy(langCol)
        .agg(sum(col("w") * col("n")).as("ml"))
      // lineage cut per round: the cell table is tiny, but without it the
      // alternating join/agg plan doubles every iteration and analysis
      // time explodes (same hazard pageRank cuts)
      w = w.join(byLang, langCol)
        .withColumn("w", col("w") * lit(total / nL) / col("ml"))
        .drop("ml")
        .localCheckpoint()
    }
    w.select(col(sourceCol), col(langCol), col("n").as("n_docs"),
      round(col("w"), 6).as("weight"),
      round(col("w") * col("n"), 4).as("eff_docs"))
  }

  /** Robust per-group document-length outlier gate (median/MAD): each
    * document's token count gets a modified z-score 0.6745·(n−med)/MAD
    * against ITS group's median and median-absolute-deviation, and docs
    * beyond `zMax` are flagged for dropping — the robust form of length
    * filtering (mean/stddev thresholds are themselves dragged by the very
    * outliers they should catch; median/MAD are not). A degenerate group
    * (MAD = 0, i.e. over half the group at the median) keeps everything
    * rather than keeping only the exact-median docs.
    *
    * Shape at 100 TB: two grouped EXACT percentile aggregations (group
    * cardinality = sources, small) broadcast back into the corpus scan —
    * the corpus itself shuffles only on the group key for the two
    * aggregations; no window, no global sort.
    *
    * @return (idCol, group, n_tokens, z round 4, keep) */
  def lengthOutlierTrim(docs: DataFrame, groupCol: String = "source",
      textCol: String = "text", idCol: String = "doc_id",
      zMax: Double = 3.5): DataFrame = {
    val n = docs.select(col(idCol), col(groupCol),
      tokenCount(col(textCol)).cast("long").as("n_tokens"))
    val med = n.groupBy(groupCol)
      .agg(expr("percentile(n_tokens, 0.5D)").as("med"))
    val withMed = n.join(broadcast(med), groupCol)
    val mad = withMed.groupBy(groupCol)
      .agg(expr("percentile(abs(n_tokens - med), 0.5D)").as("mad"))
    val z = when(col("mad") > 0,
      lit(0.6745) * (col("n_tokens") - col("med")) / col("mad"))
      .otherwise(lit(0.0))
    // z is emitted UNROUNDED: med/mad are exact half-integers (medians
    // of integer token counts), so both engines compute the identical
    // IEEE double — a round(z, 4) here lands on decimal .5 boundaries
    // where Spark's BigDecimal HALF_UP and DuckDB's scaled-double
    // rounding disagree by 1 ulp of the last kept digit.
    withMed.join(broadcast(mad), groupCol)
      .select(col(idCol), col(groupCol), col("n_tokens"),
        z.as("z"), (abs(z) <= zMax).as("keep"))
  }

  /** Cross-document paragraph dedup with KEEP-FIRST semantics (the
    * CCNet/RefinedWeb paragraph stage): every paragraph keeps only its
    * FIRST occurrence corpus-wide — first by (doc_id, position) — and all
    * later occurrences are removed; each doc is rebuilt from its surviving
    * paragraphs in original order. Differs from [[removeBoilerplateLines]]
    * (which deletes EVERY occurrence of a frequent line): keep-first
    * preserves exactly one copy of shared content, so corpus-wide
    * information is kept while duplication is eliminated.
    *
    * Shape at 100 TB: paragraphs shuffle ONCE on an 8-byte/32-byte
    * fingerprint to elect the (min doc_id, min pos) winner, then an
    * equi-join back and one groupBy(doc) rebuild. Text itself never
    * shuffles in the election — only fingerprints and positions.
    *
    * @param portable md5 fingerprints (DuckDB-replayable) vs xxhash64
    *                 (8-byte keys, the production path)
    * @return (idCol, text_kept, n_paras, n_removed) */
  def paragraphDedupKeepFirst(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", portable: Boolean = false): DataFrame = {
    val paras = docs
      .select(col(idCol), posexplode(split(col(textCol), "\n"))
        .as(Seq("pos", "para")))
      .filter(length(trim(col("para"))) > 0)
      // production key = TWO independently-salted xxhash64 values (128
      // effective bits): a single 64-bit key crosses its birthday bound
      // near 5e9 paragraphs — inside the 100 TB regime — and a collision
      // DELETED every occurrence of the losing paragraph corpus-wide
      // (r14 review). The portable md5 path is already 128-bit.
      .withColumn("pkey",
        if (portable) md5(trim(col("para")))
        else concat_ws(":", xxhash64(trim(col("para"))),
          xxhash64(trim(col("para")), lit("pdup2"))))
    // winner election: one aggregation on the fingerprint; min(struct)
    // gives the lexicographically-first (doc_id, pos) holder.
    val winners = paras
      .groupBy("pkey")
      .agg(min(struct(col(idCol), col("pos"))).as("w"))
      .select(col("pkey"), col("w")(idCol).as("w_id"), col("w.pos").as("w_pos"))
    val kept = paras.join(winners, "pkey")
      .filter(col(idCol) === col("w_id") && col("pos") === col("w_pos"))
    docs.select(col(idCol), col(textCol)).join(
        kept.groupBy(idCol)
          .agg(
            array_join(array_sort(collect_list(struct(col("pos"), col("para"))))
              .getField("para"), "\n").as("text_kept"),
            count(lit(1)).as("n_kept")),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_kept"), lit("")).as("text_kept"),
        size(filter(split(col(textCol), "\n"), p => length(trim(p)) > 0))
          .cast("long").as("n_paras"),
        (size(filter(split(col(textCol), "\n"), p => length(trim(p)) > 0)) -
          coalesce(col("n_kept"), lit(0L))).cast("long").as("n_removed"))
  }

  /** Bigram language-model document scoring with add-k smoothing: mean
    * ln P(w_i | w_{i-1}) over each document's bigram positions, where
    * P(b|a) = (c(a,b) + k) / (c(a) + k·V) against corpus-wide counts —
    * the next step up from [[unigramLogprob]]'s context-free score and a
    * cheap stand-in for neural-perplexity filtering: template/spam text
    * scores high (predictable bigrams), natural prose scores mid, shuffled
    * or corrupted text scores low.
    *
    * Shape at 100 TB: bigram occurrences join the bigram-count and
    * unigram-count relations on their keys (two shuffled equi-joins whose
    * build sides are count tables ≪ corpus); V and the corpus totals are
    * 1-row broadcasts. No driver state, no windows.
    *
    * @return (idCol, n_bigrams, avg_logprob round 4) */
  def bigramLogprob(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", k: Double = 0.5): DataFrame = {
    val toks = docs
      .select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("pos", "w")))
      .filter(length(col("w")) > 0)
    val bigrams = toks
      .withColumn("nxt", lead(col("w"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(idCol).orderBy("pos")))
      .filter(col("nxt").isNotNull)
      .select(col(idCol), col("w").as("w1"), col("nxt").as("w2"))
    val uniCnt = toks.groupBy(col("w").as("w1")).agg(count(lit(1)).as("c1"))
    val biCnt = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val vocab = broadcast(uniCnt.agg(count(lit(1)).as("v")))
    val scored = bigrams
      .join(biCnt, Seq("w1", "w2"))
      .join(uniCnt, Seq("w1"))
      .crossJoin(vocab)
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(log((col("c12") + k) / (col("c1") + col("v") * k))), 4)
          .as("avg_logprob"))
    // Anchor on the input docs: a doc with < 2 tokens has no bigrams but
    // must still appear — 0 bigrams, NULL score — instead of dropping
    // out of the row set (r14 review, deferred).
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_logprob"))
  }

  /** Unicode-script composition per document: the fraction of non-space
    * characters in Latin, Han, Cyrillic, digits, and other — the script
    * gate that catches wrong-script contamination (e.g. CJK spam inside an
    * `en` shard) that stopword-based [[langId]] cannot see. Pure scalar
    * regex — one codegen'd map pass, no shuffle.
    *
    * Spark spells script classes `\p{IsHan}`; RE2 (DuckDB) spells them
    * `\p{Han}` — the oracle uses its own spelling of the same class.
    *
    * @return (idCol, n_chars, latin_frac, han_frac, cyrillic_frac,
    *         digit_frac, other_frac — all round 4) */
  def scriptMix(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val t = regexp_replace(col(textCol), "\\s+", "")
    def frac(pattern: String): Column =
      round(size(regexp_extract_all(t, lit(pattern), lit(0))).cast("double") /
        greatest(length(t), lit(1)).cast("double"), 4)
    docs.select(
      col(idCol),
      length(t).cast("long").as("n_chars"),
      frac("\\p{IsLatin}").as("latin_frac"),
      frac("\\p{IsHan}").as("han_frac"),
      frac("\\p{IsCyrillic}").as("cyrillic_frac"),
      frac("[0-9]").as("digit_frac"),
      round(lit(1) -
        (size(regexp_extract_all(t, lit("\\p{IsLatin}|\\p{IsHan}|\\p{IsCyrillic}|[0-9]"), lit(0)))
          .cast("double") / greatest(length(t), lit(1)).cast("double")), 4)
        .as("other_frac"))
  }

  /** Flesch-style readability signals: words, sentence-ish segments,
    * vowel-group syllable estimate, and the reading-ease score
    * 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words). The
    * heuristic syllable counter (consecutive-vowel groups per word) is
    * the standard cheap proxy, and — unlike a dictionary lookup — it is
    * pure column algebra both engines compute identically. Pure scalar
    * pass, no shuffle.
    *
    * The score is emitted UNROUNDED: the formula's 3-decimal constants
    * land exact round-half values (85.165, 9.205, …) whenever the
    * divisions cancel, and no two engines agree on double round-half
    * semantics (Spark BigDecimal-HALF_UP on the shortest decimal repr
    * vs DuckDB's scaled-double round). The raw IEEE double, by
    * contrast, is bit-identical on any engine evaluating the same
    * left-associated expression — rounding is presentation, so it
    * belongs to the caller.
    *
    * @return (idCol, n_words, n_sentences, n_syllables, flesch) —
    *         empty/degenerate docs yield NULL flesch */
  def readability(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val words = filter(split(trim(lower(col(textCol))), "\\s+"),
      wrd => length(wrd) > 0)
    val nWords = size(words).cast("long")
    // sentence segments: split on ./!/? runs; harness text has none, so
    // the whole doc counts as one sentence — still a valid signal
    val nSent = greatest(
      size(filter(split(col(textCol), "[.!?]+"),
        sg => length(trim(sg)) > 0)).cast("long"), lit(1L))
    val nSyl = size(regexp_extract_all(lower(col(textCol)),
      lit("[aeiouy]+"), lit(0))).cast("long")
    docs.select(col(idCol), nWords.as("n_words"), nSent.as("n_sentences"),
      nSyl.as("n_syllables"),
      when(nWords > 0,
        lit(206.835) - lit(1.015) * (nWords / nSent.cast("double")) -
          lit(84.6) * (nSyl / nWords.cast("double"))).as("flesch"))
  }

  /** Otsu auto-thresholding over a score column: pick the histogram cut
    * that maximizes between-class variance — the parameter-free way to
    * choose a quality cutoff when the distribution is bimodal (clean vs
    * junk), instead of hand-tuning a magic number per corpus.
    *
    * Discrete Otsu over BUCKET INDICES (integer-weighted sums, so both
    * engines compute identical rationals): one [[Layout.histogram]] pass
    * absorbs the corpus; everything after runs on the ≤ nBuckets-row
    * bucket table (the window below is bounded by nBuckets — the q83
    * bounded-relation precedent, not a corpus-sized window).
    *
    * @return 1 row: (threshold_bucket, threshold_value, n_below,
    *          n_above, var_between round 4); threshold = highest value
    *          still in the LOW class */
  def otsuThreshold(df: DataFrame, valueCol: String,
      nBuckets: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = Layout.histogram(df.select(valueCol), valueCol, nBuckets)
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.agg(sum("n").as("__graft_tn"),
      sum(col("n") * col("bucket")).as("__graft_ti"))
    val cum = hist
      .withColumn("w0", sum("n").over(w))
      .withColumn("i0", sum(col("n") * col("bucket")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("w1", col("__graft_tn") - col("w0"))
      .withColumn("varb",
        when(col("w0") > 0 && col("w1") > 0,
          col("w0").cast("double") * col("w1").cast("double") *
            pow(col("i0") / col("w0") -
              (col("__graft_ti") - col("i0")) / col("w1"), 2)))
      .filter(col("varb").isNotNull)
    cum
      .agg(max_by(
        struct(col("bucket"), col("hi"), col("w0"), col("w1"),
          round(col("varb"), 4).as("v4")),
        // argmax by 6-decimal-rounded variance, tie → smaller bucket
        struct(round(col("varb"), 6).as("v"), (-col("bucket")).as("nb")))
        .as("b"))
      .select(col("b.bucket").as("threshold_bucket"),
        col("b.hi").as("threshold_value"),
        col("b.w0").as("n_below"), col("b.w1").as("n_above"),
        col("b.v4").as("var_between"))
      // degenerate input (all mass in one bucket): no valid split exists
      // — emit ZERO rows, matching the oracle's WHERE/LIMIT shape, not
      // one all-NULL row
      .filter(col("threshold_bucket").isNotNull)
  }

  /** C4-style GLOBAL sentence-level dedup, keep-first: every sentence
    * that appears anywhere else in the corpus keeps only its first
    * occurrence (smallest (doc_id, position)), and documents are
    * reassembled from their surviving sentences. This removes the
    * boilerplate that document-level dedup can't touch (cookie banners,
    * license footers) — [[boilerplateLines]] only FLAGS such lines
    * within a source; this rewrites the corpus.
    *
    * Shape at 100 TB: one posexplode, then ONE map-side-combinable
    * groupBy(sentence) → min(struct(doc_id, pos)). Deliberately not a
    * window over sentence partitions — a boilerplate sentence repeated
    * 10⁸ times would single-task a window's sort, while min() partials
    * absorb it. The group result IS the kept set (no join-back), and
    * reassembly is a per-doc sort_array over surviving positions.
    *
    * Sentence split = `\.\s+` (shared RE2/Java subset, oracle-portable);
    * empty/whitespace segments dropped.
    *
    * @return (doc_id, text_dedup, n_kept, n_total) — docs whose every
    *         sentence was claimed elsewhere keep an empty text_dedup */
  def sentenceDedup(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val sents = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), "\\.\\s+")).as(Seq("pos", "sent")))
      .withColumn("sent", trim(col("sent")))
      .filter(length(col("sent")) > 0)
    // Totals anchor on the INPUT docs, not the exploded sentences: a doc
    // with no non-empty sentence (empty/whitespace text) must still come
    // back — with 0 counts and empty text — instead of vanishing from
    // the output row set (r14 review, deferred).
    val totals = docs.select(col(idCol).as("doc_id"))
      .join(sents.groupBy("doc_id").agg(count(lit(1)).as("__nt")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("__nt"), lit(0L)).as("n_total"))
    val kept = sents
      .groupBy("sent")
      .agg(min(struct(col("doc_id"), col("pos"))).as("m"))
      .select(col("m.doc_id").as("doc_id"), col("m.pos").as("pos"),
        col("sent"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(". ",
          transform(sort_array(collect_list(struct(col("pos"),
            col("sent")))), x => x("sent"))).as("text_dedup"))
    totals.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"), col("n_total"))
  }
}
