package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** WordPiece pinned against hand-computed references: the likelihood-
  * gain merge trajectory (worked by hand below), the BERT-canonical
  * greedy longest-match segmentation, the no-backtracking [UNK]
  * contract, and DataFrame-route ≡ local-trainer parity. */
class WordPieceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("greedy longest-match-first reproduces the BERT-canonical " +
    "segmentation and prefers the LONGEST piece, not the first found") {
    val vocab = Seq("un", "##aff", "##able", "##a", "a", "u", "##n",
      "##affab", "hug", "##s", "h")
    def tok(w: String): Option[Seq[String]] =
      WordPiece.tokenizeGreedy(w, vocab.toSet, 6, 200).map(_.toSeq)
    // un|##affab fails midway? No: greedy takes ##affab (6 > 4), then
    // ##le is absent… no backtracking would [UNK. Check: "unaffable"
    // pos0 takes "un"; pos2 longest is "##affab"; pos8 remaining "le"
    // has no piece → whole word [UNK] — the no-backtracking trap, even
    // though un|##aff|##able exists.
    assert(tok("unaffable") === None)
    assert(tok("hugs") === Some(Seq("hug", "##s")))
    assert(tok("ua") === Some(Seq("u", "##a")))
    assert(tok("zq") === None)
    assert(tok("") === Some(Seq.empty))
  }

  test("a word longer than maxWordLen is [UNK] without scanning") {
    val vocab = Set("a", "##a")
    assert(WordPiece.tokenizeGreedy("a" * 201, vocab, 1, 200) === None)
    assert(WordPiece.tokenizeGreedy("a" * 200, vocab, 1, 200)
      .map(_.length) === Some(200))
  }

  test("training follows the hand-computed likelihood-gain trajectory " +
    "(rare-but-exclusive pair beats the frequent one)") {
    // corpus: "ab" x 10, "cd" x 2 — symbol counts: a=10,##b=10,c=2,##d=2
    // pair scores: (a,##b) = 10/(10*10) = 0.1; (c,##d) = 2/(2*2) = 0.5
    // WordPiece merges (c,##d) FIRST (likelihood gain), where BPE's
    // frequency rule would merge (a,##b).
    val wf = Seq(("ab", 10L), ("cd", 2L))
    val vocab = WordPiece.wordPieceTrainLocal(wf, vocabSize = 6)
    assert(vocab.take(4) === Seq("##b", "##d", "a", "c"), "alphabet lex")
    assert(vocab(4) === "cd", "first merge is the exclusive pair")
    assert(vocab(5) === "ab")
    // BPE on the same table merges the frequent pair first — the two
    // objectives genuinely diverge on this input
    val bpe = Tokenizer.bpeTrainLocal(wf, numMerges = 1)
    assert(bpe === Seq(("a", "b")))
  }

  test("equal scores tie-break to the lexicographically smallest pair " +
    "and training is deterministic") {
    // "xy" and "xz" with equal freq: scores equal; (x,##y) < (x,##z)
    val wf = Seq(("xy", 3L), ("xz", 3L))
    val a = WordPiece.wordPieceTrainLocal(wf, vocabSize = 4)
    val b = WordPiece.wordPieceTrainLocal(wf, vocabSize = 4)
    assert(a === b)
    assert(a(3) === "xy", s"lexicographic tie-break: $a")
  }

  test("merged symbols inherit the left side's continuation status") {
    // "abc" x 5: first merge argmax: pairs (a,##b) and (##b,##c) both
    // 5/(5*5) — tie-break picks (##b,##c)? No: pair ordering compares
    // ("a","##b") vs ("##b","##c"); '#' < 'a' so ("##b",…) is smaller…
    // merged "##bc" keeps the ## prefix (word-internal), then (a,##bc)
    // merges to bare "abc".
    val wf = Seq(("abc", 5L))
    val vocab = WordPiece.wordPieceTrainLocal(wf, vocabSize = 5)
    assert(vocab.contains("##bc"))
    assert(vocab.contains("abc"))
    assert(!vocab.contains("bc"), "internal merge must stay ##-prefixed")
  }

  test("empty and degenerate inputs: empty table, empty words, " +
    "vocabSize below alphabet") {
    assert(WordPiece.wordPieceTrainLocal(Seq.empty, 10) === Seq.empty)
    assert(WordPiece.wordPieceTrainLocal(Seq(("", 5L)), 10) === Seq.empty)
    // vocabSize below the alphabet: alphabet is never truncated
    val v = WordPiece.wordPieceTrainLocal(Seq(("ab", 1L)), vocabSize = 1)
    assert(v === Seq("##b", "a"))
  }

  test("DataFrame train route equals the local trainer; apply equals " +
    "per-word greedy with [UNK] fill") {
    val corpus = Seq((1L, "the quick fox"), (2L, "the lazy dog dog"),
      (3L, "quick quick the"))
    val docs = corpus.toDF("doc_id", "text")
    val wf = corpus.flatMap(_._2.split(" ")).groupBy(identity)
      .view.mapValues(_.size.toLong).toSeq
    val fromDf = WordPiece.wordPieceTrain(docs, vocabSize = 30)
    val local = WordPiece.wordPieceTrainLocal(wf, vocabSize = 30)
    assert(fromDf === local)
    val applied = WordPiece.wordPieceApply(docs, local)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    val maxLen = local.map(_.stripPrefix("##").length).max
    def ref(text: String): Seq[String] =
      text.split(" ").toSeq.flatMap(w =>
        WordPiece.tokenizeGreedy(w, local.toSet, maxLen, 200)
          .getOrElse(Array(WordPiece.UnkToken)).toSeq)
    corpus.foreach { case (id, text) =>
      assert(applied(id) === ref(text), s"doc $id")
    }
  }

  test("forced-distributed training is trajectory-identical to the " +
    "local trainer (the Unigram distributed≡local discipline)") {
    // maxLocalWords = 1 forces every round through the Spark path:
    // the one-aggregation symbol+pair counts, the broadcast self-join
    // gains, the TakeOrdered argmax with the (gain desc, pair asc)
    // tie-break, and the column-fold greedy-left merge must reproduce
    // the local trainer's vocabulary EXACTLY — same pieces, same
    // creation order. The corpus exercises re-derived merges and the
    // rare-beats-frequent likelihood-gain divergence from BPE.
    val docs = Seq((1L, "the quick fox"), (2L, "the lazy dog dog"),
      (3L, "quick quick the zq zq zq"), (4L, "fox box lox"))
      .toDF("doc_id", "text")
    val wf = Seq("the", "quick", "fox", "the", "lazy", "dog", "dog",
      "quick", "quick", "the", "zq", "zq", "zq", "fox", "box", "lox")
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val local = WordPiece.wordPieceTrainLocal(wf, vocabSize = 40)
    val dist = WordPiece.wordPieceTrain(docs, vocabSize = 40,
      maxLocalWords = 1L)
    assert(dist === local)
    // exhaustion: a vocabSize beyond every derivable piece stops at
    // the same fixed point on both routes
    val localAll = WordPiece.wordPieceTrainLocal(wf, vocabSize = 1000)
    val distAll = WordPiece.wordPieceTrain(docs, vocabSize = 1000,
      maxLocalWords = 1L)
    assert(distAll === localAll)

    // unicode ordering parity: Spark's string sort compares UTF-8
    // BYTES, Ordering.String compares UTF-16 code units — they
    // disagree exactly between supplementary-plane chars (🙂, whose
    // surrogates start 0xD83D) and BMP chars >= U+E000 (ﬁ = U+FB01:
    // Java puts 🙂 first, UTF-8 bytes put it last). The distributed
    // route must seed its alphabet and break gain ties with the LOCAL
    // comparator or vocabularies diverge on exactly such corpora.
    val uniDocs = Seq((1L, "a🙂ﬁ a🙂ﬁ ﬁ🙂a"), (2L, "🙂ﬁ ﬁ🙂 🙂ﬁ"))
      .toDF("doc_id", "text")
    val uniWf = Seq("a🙂ﬁ" -> 2L, "ﬁ🙂a" -> 1L, "🙂ﬁ" -> 2L, "ﬁ🙂" -> 1L)
    val uniLocal = WordPiece.wordPieceTrainLocal(uniWf, vocabSize = 50)
    val uniDist = WordPiece.wordPieceTrain(uniDocs, vocabSize = 50,
      maxLocalWords = 1L)
    assert(uniDist === uniLocal)
  }

  test("wordPieceMergeTable at EXACTLY maxLocalWords distinct words " +
    "passes (nothing truncated); one word over the cap refuses") {
    val docs = Seq((1L, "aa bb cc dd")).toDF("doc_id", "text")
    val ok = WordPiece.wordPieceMergeTable(docs, numMerges = 2,
      maxLocalWords = 4)
    assert(ok.count() === 2L)
    val ex = intercept[IllegalArgumentException] {
      WordPiece.wordPieceMergeTable(docs, numMerges = 2,
        maxLocalWords = 3).collect()
    }
    assert(ex.getMessage.contains("maxLocalWords"))
  }

  test("the committed WordPiece fixture matches its generator and " +
    "covers both greedy-walk branches on the fixture words") {
    val vocab = TokenizerStore.loadWordPiece(spark,
      "/root/repo/fixtures/tokenizer/wordpiece_vocab.parquet")
    assert(vocab === graft.tools.TokenizerFixtureGen.wordPieceVocab)
    val maxLen = vocab.map(_.stripPrefix("##").length).max
    // training words all tokenize without [UNK]; an out-of-alphabet
    // word hits the [UNK] branch
    graft.tools.TokenizerFixtureGen.wordFreqs.foreach { case (w, _) =>
      assert(WordPiece.tokenizeGreedy(w, vocab.toSet, maxLen, 200)
        .isDefined, s"trained word $w must segment")
    }
    assert(WordPiece.tokenizeGreedy("née", vocab.toSet, maxLen, 200)
      .isEmpty)
  }

  test("wordPieceMergeSteps: selections carry exact argmax counts and " +
    "stay consistent with the trained vocabulary") {
    // hand-checkable corpus exercising the likelihood-gain objective:
    // (a,##b) is 14× more frequent, but (x,##y) is EXCLUSIVE —
    // score 1/(1·1) = 1.0 beats 14/(14·14) = 1/14 — the
    // rare-beats-frequent divergence from BPE. Rounds 2 and 3 then tie
    // at exactly 1/14 and resolve lexicographically (##b < a,
    // ##b < ##bc).
    val wf = Seq(("ab", 10L), ("abc", 4L), ("xy", 1L))
    val steps = WordPiece.wordPieceMergeSteps(wf, numMerges = 3)
    assert(steps.map(s => (s.left, s.right, s.piece)) === Seq(
      ("x", "##y", "xy"), ("##b", "##c", "##bc"), ("a", "##b", "ab")))
    val s1 = steps.head
    assert(s1.cPair === 1L && s1.cLeft === 1L && s1.cRight === 1L)
    assert(steps(1).cPair === 4L && steps(1).cLeft === 14L &&
      steps(1).cRight === 4L)
    assert(steps(2).cPair === 10L && steps(2).cLeft === 14L &&
      steps(2).cRight === 10L)
    // every selection sequence is a superset walk of the vocab list:
    // the vocab is alphabet ++ (distinct pieces in selection order)
    val alpha = WordPiece.wordPieceTrainLocal(wf, vocabSize = 0)
    val vocab = WordPiece.wordPieceTrainLocal(wf,
      vocabSize = alpha.size + steps.map(_.piece).distinct.size)
    assert(vocab.drop(alpha.size) === steps.map(_.piece).distinct)
    // step numbering is dense from 1
    assert(steps.map(_.step) === (1 to steps.size))
  }

  test("wordPieceFertility: hand-computed occurrence-weighted pieces per " +
    "word, UNK excluded from fertility but counted in the fractions") {
    // vocab: ab, ##c, ##cd, d  → "abc"=[ab,##c] (2), "abcd"=[ab,##cd] (2),
    // "d"=[d] (1), "zz" strands → UNK
    val vocab = Seq("ab", "##c", "##cd", "d")
    val words = Seq(("abc", 10L), ("abcd", 5L), ("d", 3L), ("zz", 2L))
      .toDF("w", "freq")
    val r = WordPiece.wordPieceFertility(words, vocab).head()
    assert(r.getLong(0) === 4L) // n_words
    assert(r.getLong(1) === 20L) // n_occurrences
    // fertility = (10*2 + 5*2 + 3*1) / (10 + 5 + 3) = 33/18
    assert(math.abs(r.getDouble(2) - 33.0 / 18.0) < 1e-12)
    assert(math.abs(r.getDouble(3) - 1.0 / 4.0) < 1e-12) // unk_word_frac
    assert(math.abs(r.getDouble(4) - 2.0 / 20.0) < 1e-12) // unk_occ_frac
  }
}
