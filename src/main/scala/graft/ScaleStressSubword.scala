package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Tokenizer

/** The subword cap-regime leg of [[ScaleStress]] (r14 verdict #1,
  * word-table realism per r15 verdict #5): drive the batched
  * distributed subword trainer ([[graft.operators.SubwordBatch]])
  * through its cap-bound degradation path against a REALISTIC word
  * table and assert the trajectory never moves.
  *
  * The r15 run proved the three regimes (unbound / soft-capped /
  * hard-capped) trajectory-identical, but against a 122-distinct-word
  * table — the factor-100 corpus at wordsPerUnit = 1 has a tiny
  * vocabulary, so the active-word pull the caps exist to bound was
  * never itself expensive. A 100 TB crawl word table is 10⁷⁺ words.
  * This leg diversifies the corpus vocabulary before the word-table
  * pass — every token gets a deterministic hash suffix
  * `t → t + "q" + (xxhash64(t, doc_id, i) mod [[SuffixMod]])` — so the same
  * base corpus yields ≥ 10⁵ distinct words (gated as a fact): every
  * round's stats aggregation runs over the fat table and the active
  * sets for top pairs genuinely span tens of thousands of words, so
  * `activeWordCap` binds against a pull that costs something.
  *
  * Regimes (same table, same 80 merges, same trainer):
  *   - unbound: driver defaults — topPairs covers every pair
  *     (exhaustive bound) and the cap admits the whole active table,
  *     so one round simulates the full merge budget;
  *   - soft (topPairs 128, maxActivePairs 64, activeWordCap 40000):
  *     the top-M union overflows the cap, M halves until the pull
  *     fits — more rounds than unbound, simulation still engaged;
  *   - hard (activeWordCap 600): even the single top pair spans more
  *     words than the cap, forcing the no-simulation single-merge
  *     fallback (exact argmax from round stats) — the true per-merge
  *     worst case, rounds strictly above the soft regime.
  *
  * Gates: trajectory identity (capped/hard selections exactly equal
  * the unbound run's, merge by merge), binding evidence (soft rounds >
  * unbound rounds, hard rounds > soft rounds), the rounds ≤ merges
  * ceiling (every round must select ≥ 1 merge), and
  * `subword_distinct_words ≥ 100000` (the realism gate — a future
  * corpus change that collapses the vocabulary back to toy size fails
  * loudly instead of silently weakening the evidence).
  */
object ScaleStressSubword {

  /** Merge budget shared by all three regimes. */
  val Merges = 80

  /** Suffix modulus for the vocabulary diversifier. Calibrated on the
    * factor-100 corpus: only the ~30 frequent base words saturate their
    * suffix space (rare marker tokens contribute min(occurrences, mod)),
    * so mod 1499 measured 46k distinct words — 4999 lands ~150k+,
    * comfortably above the 1e5 realism gate. */
  val SuffixMod = 4999

  /** Isolated run for calibration: `runMain graft.ScaleStressSubword
    * [sfDir] [factor]` — derives the plain replicated corpus and
    * prints the same steps/facts/violations JSON fragment the full
    * [[ScaleStress]] embeds. */
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_MASTER: the multi-JVM invariance axis (see Sessions).
    val spark = Sessions.withMaster(SparkSession.builder(), cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = base
      .withColumn("k", explode(sequence(lit(0), lit(factor - 1))))
      .select((col("doc_id") * factor + col("k")).as("doc_id"),
        col("text"))
      .repartition(64)
      .localCheckpoint()
    val steps = ArrayBuffer[(String, Double)]()
    val facts = ArrayBuffer[(String, Long)]()
    val violations = ArrayBuffer[String]()
    run(spark, corpus, factor, steps, facts, violations)
    println("{" + StressJson.fragment(steps, facts, violations) + "}")
    spark.stop()
    if (violations.nonEmpty) sys.exit(1)
  }

  def run(spark: SparkSession, corpus: DataFrame, factor: Int,
      steps: ArrayBuffer[(String, Double)],
      facts: ArrayBuffer[(String, Long)],
      violations: ArrayBuffer[String]): Unit = {
    // The fixed 1e5 realism gate is calibrated on the factor-100 corpus
    // (532k distinct words; SuffixMod saturation measured there). A
    // smaller factor shrinks rare-word suffix contributions roughly
    // linearly and would fail the gate with no engine defect. Throwing
    // here aborted the WHOLE ScaleStress run for factors 90-99 that
    // ScaleStressAnn's own guard (factor % 10 == 0 && factor >= 90)
    // accepts, losing every other plane's SCALESTRESS.json results
    // (r16 ADVICE #3) — skip the leg with a recorded fact instead.
    if (factor < 100) {
      facts += "subword_skipped_factor" -> factor.toLong
      System.err.println("[scale] subword leg SKIPPED: realism gate is " +
        s"calibrated for factor >= 100, got $factor (recorded as a " +
        "configuration fact, not a violation)")
      return
    }
    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      steps += name -> (System.nanoTime() - t0) / 1e9
      System.err.println(f"[scale] $name%-28s ${steps.last._2}%7.2f s")
      r
    }

    // ---- diversified word table (the realism fix) ---------------------
    val words = timed("subword_word_table") {
      val diversified = corpus.select(
        col("doc_id"),
        expr("array_join(transform(split(text, '\\\\s+'), (t, i) -> " +
          s"concat(t, 'q', pmod(xxhash64(t, doc_id, i), $SuffixMod))), " +
          "' ')").as("text"))
      val t = Tokenizer.wordTable(diversified, "text", wordsPerUnit = 1)
        .localCheckpoint()
      facts += "subword_distinct_words" -> t.count()
      t
    }

    // ---- three regimes over the SAME table ----------------------------
    val unbound = timed("subword_unbound") {
      Tokenizer.bpeTrainDistributedDetail(words, Merges)
    }
    val capped = timed("subword_capped") {
      Tokenizer.bpeTrainDistributedDetail(words, Merges,
        topPairs = 128, maxActivePairs = 64, activeWordCap = 40000)
    }
    val hard = timed("subword_capped_hard") {
      Tokenizer.bpeTrainDistributedDetail(words, Merges,
        topPairs = 128, maxActivePairs = 64, activeWordCap = 600)
    }
    facts += "subword_merges" -> Merges.toLong
    facts += "subword_unbound_rounds" -> unbound.rounds.toLong
    facts += "subword_unbound_actions" -> unbound.sparkActions.toLong
    facts += "subword_capped_rounds" -> capped.rounds.toLong
    facts += "subword_capped_actions" -> capped.sparkActions.toLong
    facts += "subword_hard_rounds" -> hard.rounds.toLong
    facts += "subword_hard_actions" -> hard.sparkActions.toLong

    // ---- gates --------------------------------------------------------
    val fm = facts.toMap
    if (fm("subword_distinct_words") < 100000L)
      violations += s"subword_distinct_words=" +
        s"${fm("subword_distinct_words")} < 100000 — the cap regimes" +
        " are binding against a toy vocabulary again"
    val traj = unbound.sels.map(s => (s.a, s.b))
    val divergeSoft = traj.zip(capped.sels.map(s => (s.a, s.b)))
      .indexWhere { case (u, c) => u != c }
    val divergeHard = traj.zip(hard.sels.map(s => (s.a, s.b)))
      .indexWhere { case (u, c) => u != c }
    if (divergeSoft >= 0)
      violations += s"subword capped trajectory diverges from unbound" +
        s" at merge $divergeSoft"
    if (divergeHard >= 0)
      violations += s"subword hard-capped trajectory diverges from" +
        s" unbound at merge $divergeHard"
    if (unbound.sels.length != Merges || capped.sels.length != Merges ||
        hard.sels.length != Merges)
      violations += s"subword merge counts ${unbound.sels.length}/" +
        s"${capped.sels.length}/${hard.sels.length} != $Merges"
    if (fm("subword_capped_rounds") <= fm("subword_unbound_rounds"))
      violations += s"subword caps did not bind:" +
        s" capped rounds ${fm("subword_capped_rounds")} <=" +
        s" unbound ${fm("subword_unbound_rounds")}"
    if (fm("subword_hard_rounds") <= fm("subword_capped_rounds"))
      violations += s"subword hard cap did not bind past the soft run:" +
        s" hard rounds ${fm("subword_hard_rounds")} <=" +
        s" soft ${fm("subword_capped_rounds")}"
    // every round selects >= 1 merge, so rounds can never exceed
    // merges — a breach means the round loop spun without progress
    for (reg <- Seq("capped", "hard"))
      if (fm(s"subword_${reg}_rounds") > Merges.toLong)
        violations += s"subword_${reg}_rounds=" +
          s"${fm(s"subword_${reg}_rounds")} > merges $Merges" +
          " (round loop spun without progress)"
  }
}
