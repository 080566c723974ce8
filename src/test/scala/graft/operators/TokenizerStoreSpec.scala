package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Vocabulary persistence contract: every model round-trips BIT-EXACTLY
  * through both formats (parquet rank tables and HF-shape JSON), order
  * preserved — BPE merge order IS the algorithm — and a loaded unigram
  * vocabulary tokenizes identically to the in-memory one it was saved
  * from (the production train-once / apply-many split, VERDICT r11 #4).
  */
class TokenizerStoreSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_tokstore_$name").toString

  private val merges = Seq(("e", "s"), ("es", "t"), ("t", "h"), ("a", "n"))
  // deliberately awkward doubles (non-terminating binary fractions) and
  // JSON-hostile pieces (quote, backslash, non-ASCII)
  private val uniVocab = Seq(
    "the" -> -1.1, "a" -> -0.30000000000000004, "b" -> -2.7182818284590455,
    "\"q\"" -> -3.3, "\\x" -> -4.4, "é" -> -5.5)
  private val wpVocab = Seq("the", "##s", "un", "##affable", "a", "z")

  test("BPE merges round-trip through parquet in order") {
    val d = tmp("bpe_pq") + "/m.parquet"
    TokenizerStore.saveBpe(spark, merges, d)
    assert(TokenizerStore.loadBpe(spark, d) === merges)
  }

  test("unigram vocab round-trips through parquet bit-exactly") {
    val d = tmp("uni_pq") + "/v.parquet"
    TokenizerStore.saveUnigram(spark, uniVocab, d)
    assert(TokenizerStore.loadUnigram(spark, d) === uniVocab)
  }

  test("WordPiece vocab round-trips through parquet in rank order") {
    val d = tmp("wp_pq") + "/v.parquet"
    TokenizerStore.saveWordPiece(spark, wpVocab, d)
    assert(TokenizerStore.loadWordPiece(spark, d) === wpVocab)
  }

  test("all three models round-trip through HF-shape JSON, doubles " +
    "and hostile pieces included") {
    val dir = tmp("json")
    TokenizerStore.saveJson(spark, BpeModel(merges), s"$dir/bpe.json")
    TokenizerStore.saveJson(spark, UnigramModel(uniVocab), s"$dir/uni.json")
    TokenizerStore.saveJson(spark, WordPieceModel(wpVocab), s"$dir/wp.json")
    assert(TokenizerStore.loadJson(spark, s"$dir/bpe.json") ===
      BpeModel(merges))
    assert(TokenizerStore.loadJson(spark, s"$dir/uni.json") ===
      UnigramModel(uniVocab))
    assert(TokenizerStore.loadJson(spark, s"$dir/wp.json") ===
      WordPieceModel(wpVocab))
  }

  test("a malformed model JSON throws, never loads an empty vocabulary") {
    val dir = tmp("bad")
    Files.write(java.nio.file.Paths.get(dir, "bad.json"),
      """{"version":"1.0","model":{"type":"Mystery","vocab":[]}}"""
        .getBytes("UTF-8"))
    intercept[IllegalArgumentException] {
      TokenizerStore.loadJson(spark, s"$dir/bad.json")
    }
  }

  test("a TRAINED unigram vocabulary applied after save/load tokenizes " +
    "identically to the in-memory original") {
    import spark.implicits._
    val wf = graft.tools.TokenizerFixtureGen.wordFreqs
    val trained = Unigram.unigramTrainLocal(wf, vocabSize = 40,
      maxPieceLen = 5)
    val d = tmp("apply") + "/v.parquet"
    TokenizerStore.saveUnigram(spark, trained, d)
    val loaded = TokenizerStore.loadUnigram(spark, d)
    assert(loaded === trained)
    val docs = Seq((1L, "the quick brown fox"), (2L, "lazy dozen wizards"))
      .toDF("doc_id", "text")
    val a = Unigram.unigramApplyLarge(docs, trained)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val b = Unigram.unigramApplyLarge(docs, loaded)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("the committed fixture artifacts match their generator (drift " +
    "guard: regenerating TokenizerFixtureGen is a no-op until the " +
    "trainer or literals change)") {
    val vocab = TokenizerStore.loadUnigram(spark,
      "/root/repo/fixtures/tokenizer/unigram_vocab.parquet")
    assert(vocab === graft.tools.TokenizerFixtureGen.unigramVocab)
    val m = TokenizerStore.loadBpe(spark,
      "/root/repo/fixtures/tokenizer/bpe_merges.parquet")
    assert(m === graft.tools.TokenizerFixtureGen.bpeMerges)
    assert(TokenizerStore.loadJson(spark,
      "/root/repo/fixtures/tokenizer/unigram_vocab.json") ===
      UnigramModel(graft.tools.TokenizerFixtureGen.unigramVocab))
    assert(TokenizerStore.loadJson(spark,
      "/root/repo/fixtures/tokenizer/bpe_merges.json") ===
      BpeModel(graft.tools.TokenizerFixtureGen.bpeMerges))
  }
}
