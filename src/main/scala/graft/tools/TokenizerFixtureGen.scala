package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.{BpeModel, Tokenizer, TokenizerStore, Unigram, UnigramModel,
  WordPiece, WordPieceModel}

/** Writes the committed tokenizer-vocabulary fixtures
  * (`fixtures/tokenizer/`): a TRAINED unigram vocabulary and a literal
  * BPE merge list, each in both persistence formats
  * ([[TokenizerStore]] parquet + HF-shape JSON). The q194/q195 catalog
  * entries apply the LOADED parquet artifacts — the production
  * train-once / apply-many split — and their DuckDB oracles replay from
  * the SAME parquet files, so the artifact itself is what both engines
  * agree on.
  *
  * Determinism: the unigram vocabulary is trained from a LITERAL
  * (word, freq) table (unigramTrainLocal is deterministic), and the
  * pangram rows guarantee every letter a-z survives as a single-char
  * piece (chars are never pruned), so the q194 viterbi scoring of
  * `[a-z]+` corpus words never routes through the unk fallback — the
  * recursive-CTE oracle needs no fallback constant. */
object TokenizerFixtureGen {

  /** Literal training table; the two pangrams cover all 26 letters. */
  val wordFreqs: Seq[(String, Long)] = Seq(
    "the" -> 120L, "quick" -> 30L, "brown" -> 25L, "fox" -> 20L,
    "jumps" -> 18L, "over" -> 40L, "lazy" -> 15L, "dog" -> 22L,
    "pack" -> 12L, "my" -> 28L, "box" -> 14L, "with" -> 45L,
    "five" -> 16L, "dozen" -> 9L, "liquor" -> 7L, "jugs" -> 8L,
    "vexing" -> 5L, "wizards" -> 6L, "quartz" -> 4L, "sphinx" -> 3L,
    "of" -> 90L, "black" -> 11L, "judge" -> 10L, "vow" -> 5L,
    "stream" -> 13L, "scan" -> 17L, "filter" -> 14L, "join" -> 19L)

  /** Trained once at generation time; committed as the artifact. */
  def unigramVocab: Seq[(String, Double)] =
    Unigram.unigramTrainLocal(wordFreqs, vocabSize = 60, maxPieceLen = 5)

  /** The proven q183b merge chain — the second merge consumes the
    * first's output symbol, so the loaded-artifact apply exercises
    * order-dependence. */
  val bpeMerges: Seq[(String, String)] = Seq(("e", "s"), ("es", "t"))

  /** Literal PRETOKEN frequency table (case preserved, leading spaces
    * bound — the GPT-2 unit shape) for the committed pretoken-BPE
    * artifact: mixed casing ("The"/" the"), shared stems
    * (" stream"/" streams", " join"/" joins", " batch"/" batches"),
    * contraction ("'s"), digits and punctuation — so the trained
    * merges include space-bound pieces (the leading-space convention
    * in action) and the apply path exercises multi-piece splits. */
  val pretokenFreqs: Seq[(String, Long)] = Seq(
    "The" -> 40L, " the" -> 150L, " of" -> 90L, " stream" -> 35L,
    " streams" -> 12L, " quick" -> 30L, " join" -> 28L, " joins" -> 9L,
    "'s" -> 25L, " over" -> 40L, "," -> 60L, "." -> 70L,
    " filter" -> 22L, " window" -> 18L, " 42" -> 8L, " 1024" -> 5L,
    " (" -> 7L, ")" -> 7L, " batch" -> 26L, " batches" -> 11L)

  /** 24 pretoken-BPE merges trained once at generation time from the
    * literal table (bpeTrainLocal is deterministic) — committed as the
    * pretoken_bpe_merges artifact; q206/q207 apply the LOADED parquet
    * and their oracles replay the chain from the SAME file. */
  def pretokenBpeMerges: Seq[(String, String)] =
    Tokenizer.bpeTrainLocal(pretokenFreqs, numMerges = 24)

  /** WordPiece vocabulary trained from the same literal table
    * (likelihood-gain merges; deterministic). 80 pieces past the
    * ~50-symbol alphabet leaves corpus words that need multi-piece
    * segmentation AND words that fail entirely ([UNK]) — both branches
    * of the greedy walk stay covered in q197. */
  def wordPieceVocab: Seq[String] =
    WordPiece.wordPieceTrainLocal(wordFreqs, vocabSize = 80)

  def write(spark: SparkSession, dir: String): Unit = {
    val vocab = unigramVocab
    require(('a' to 'z').forall(c => vocab.exists(_._1 == c.toString)),
      "fixture vocabulary must keep every single letter")
    TokenizerStore.saveUnigram(spark, vocab, s"$dir/unigram_vocab.parquet")
    TokenizerStore.saveJson(spark, UnigramModel(vocab),
      s"$dir/unigram_vocab.json")
    TokenizerStore.saveBpe(spark, bpeMerges, s"$dir/bpe_merges.parquet")
    TokenizerStore.saveJson(spark, BpeModel(bpeMerges),
      s"$dir/bpe_merges.json")
    val pbm = pretokenBpeMerges
    TokenizerStore.saveBpe(spark, pbm, s"$dir/pretoken_bpe_merges.parquet")
    TokenizerStore.saveJson(spark, BpeModel(pbm),
      s"$dir/pretoken_bpe_merges.json")
    val wp = wordPieceVocab
    TokenizerStore.saveWordPiece(spark, wp, s"$dir/wordpiece_vocab.parquet")
    TokenizerStore.saveJson(spark, WordPieceModel(wp),
      s"$dir/wordpiece_vocab.json")
  }

  def main(args: Array[String]): Unit = {
    val dir =
      if (args.nonEmpty) args(0) else "fixtures/tokenizer"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("tokenizer-fixture-gen")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    write(spark, dir)
    spark.stop()
  }
}
