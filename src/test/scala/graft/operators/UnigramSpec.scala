package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Unigram-LM tokenizer pinned against brute-force enumeration of every
  * segmentation — the same verification idea as the DuckDB oracles, for
  * lattice statistics (partition function, posterior expected counts,
  * Viterbi max) that SQL cannot replay tractably at training scale. The
  * one SQL-replayable surface (per-word Viterbi score under a fixed
  * vocabulary) is oracle-checked in the catalog (q190).
  */
class UnigramSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // --- brute-force reference: enumerate EVERY segmentation ----------------

  /** All (pieces, score) segmentations of `w` under `vocab` — exponential,
    * for short words only. Scores accumulate right-to-left, deliberately a
    * DIFFERENT association than the engine's left-to-right DP, so equality
    * checks are tolerance-based and genuinely independent. */
  private def allSegs(w: String,
      vocab: Map[String, Double]): List[(List[String], Double)] =
    if (w.isEmpty) List((Nil, 0.0))
    else {
      val maxLen = vocab.keysIterator.map(_.length).max
      (1 to math.min(w.length, maxLen)).toList.flatMap { l =>
        val p = w.take(l)
        vocab.get(p) match {
          case Some(lp) =>
            allSegs(w.drop(l), vocab).map { case (seg, s) =>
              (p :: seg, lp + s)
            }
          case None => Nil
        }
      }
    }

  private def refLogZ(segs: List[(List[String], Double)]): Double = {
    val m = segs.map(_._2).max
    m + math.log(segs.map(s => math.exp(s._2 - m)).sum)
  }

  private def refExpectedCounts(w: String, vocab: Map[String, Double])
      : Map[String, Double] = {
    val segs = allSegs(w, vocab)
    val logZ = refLogZ(segs)
    segs.flatMap { case (pieces, score) =>
      val p = math.exp(score - logZ)
      pieces.groupBy(identity).map { case (pc, xs) => pc -> p * xs.size }
    }.groupMapReduce(_._1)(_._2)(_ + _)
  }

  private val vocabA = Map(
    "a" -> -2.0, "b" -> -2.5, "c" -> -3.0,
    "ab" -> -1.5, "bc" -> -1.75, "abc" -> -1.25, "ca" -> -2.25)

  // --- lattice statistics vs brute force ----------------------------------

  test("forward-backward expected counts equal brute-force enumeration " +
    "over all segmentations (randomized words and vocabularies)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    for (trial <- 1 to 60) {
      val w = Seq.fill(2 + rnd.nextInt(7))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      // random vocab: all single chars + random multi-char substrings
      val multis = (for {
        i <- 0 until w.length; l <- 2 to math.min(4, w.length - i)
      } yield w.substring(i, i + l)).distinct
        .filter(_ => rnd.nextBoolean())
      val vocab: Map[String, Double] =
        (alphabet.map(c => c.toString -> (-2.0 - rnd.nextInt(8) * 0.25)) ++
          multis.map(m => m -> (-1.0 - rnd.nextInt(8) * 0.25))).toMap
      val maxLen = vocab.keysIterator.map(_.length).max

      val acc = collection.mutable.HashMap.empty[String, Double]
      val logZ = Unigram.accumulateExpectedCounts(w, 1.0, vocab, maxLen, acc)
      val segs = allSegs(w, vocab)
      assert(math.abs(logZ - refLogZ(segs)) < 1e-9,
        s"trial $trial word $w logZ")
      val ref = refExpectedCounts(w, vocab)
      assert(acc.keySet === ref.keySet, s"trial $trial word $w pieces")
      acc.foreach { case (p, c) =>
        assert(math.abs(c - ref(p)) < 1e-9, s"trial $trial word $w piece $p")
      }
    }
  }

  test("viterbi score equals the brute-force max; tokens form a valid " +
    "segmentation scoring that max") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 60) {
      val w = Seq.fill(2 + rnd.nextInt(7))("abc"(rnd.nextInt(3))).mkString
      val multis = (for {
        i <- 0 until w.length; l <- 2 to math.min(4, w.length - i)
      } yield w.substring(i, i + l)).distinct.filter(_ => rnd.nextBoolean())
      val vocab: Map[String, Double] =
        ("abc".map(c => c.toString -> (-2.0 - rnd.nextInt(8) * 0.25)) ++
          multis.map(m => m -> (-1.0 - rnd.nextInt(8) * 0.25))).toMap
      val maxLen = vocab.keysIterator.map(_.length).max
      val (toks, score) = Unigram.viterbiWord(w, vocab, maxLen, -100.0)
      val best = allSegs(w, vocab).map(_._2).max
      assert(math.abs(score - best) < 1e-9, s"trial $trial word $w")
      assert(toks.mkString === w, s"trial $trial word $w concat")
      val pathScore = toks.map(vocab).sum
      assert(math.abs(pathScore - best) < 1e-9, s"trial $trial word $w path")
    }
  }

  test("viterbi tie-break prefers the longer final piece; unknown single " +
    "chars fall back without poisoning known spans") {
    // exact tie: "ab"(-2.0) vs "a"(-1.0)+"b"(-1.0) — longer piece wins
    val tie = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -2.0)
    assert(Unigram.viterbiWord("ab", tie, 2, -100.0)._1.toList ===
      List("ab"))
    // unknown char: 'x' absent — per-char fallback, neighbors unaffected
    val v = Map("a" -> -1.0, "b" -> -1.5, "ab" -> -2.0)
    val (toks, score) = Unigram.viterbiWord("axb", v, 2, -50.0)
    assert(toks.toList === List("a", "x", "b"))
    assert(math.abs(score - (-1.0 - 50.0 - 1.5)) < 1e-12)
  }

  // --- training ------------------------------------------------------------

  test("training keeps every corpus character, reaches the target size, " +
    "and retains the dominant substring with high probability") {
    val corpus = Seq.fill(40)("abab") ++ Seq.fill(5)("cab") ++
      Seq.fill(3)("bc")
    val wf = corpus.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq
    val vocab = Unigram.unigramTrainLocal(wf, vocabSize = 5,
      maxPieceLen = 4)
    val pieces = vocab.map(_._1).toSet
    assert(Set("a", "b", "c").subsetOf(pieces), "char coverage")
    assert(vocab.size <= 5)
    // EM concentrates mass on the dominant WHOLE word (40/48 of
    // occurrences) — sub-pieces of it are redundant and get pruned;
    // this is the unigram model's signature behavior vs BPE's
    // bottom-up pair growth
    assert(pieces.contains("abab"), s"dominant piece retained: $pieces")
    val pm = vocab.toMap
    assert(pm("abab") > pm("c"), "dominant piece outweighs rare char")
    // probabilities normalized: sum(exp(lp)) == 1
    assert(math.abs(vocab.map(v => math.exp(v._2)).sum - 1.0) < 1e-9)
  }

  test("degenerate trainer inputs terminate: tiny vocab above target " +
    "prunes to the target (no infinite shrink loop) and an empty word " +
    "table yields an empty vocabulary") {
    // ceil(3 * 0.75) == 3: without the size-1 clamp the prune loop
    // drops nothing and spins forever on this input
    val tiny = Unigram.unigramTrainLocal(Seq(("ab", 5L)), vocabSize = 2,
      maxPieceLen = 2)
    assert(tiny.map(_._1).toSet === Set("a", "b"),
      s"chars survive, 'ab' pruned: $tiny")
    assert(Unigram.unigramTrainLocal(Seq.empty, vocabSize = 8) ===
      Seq.empty)
    assert(Unigram.unigramTrainLocal(Seq(("", 3L)), vocabSize = 8) ===
      Seq.empty, "empty-string words carry no pieces")
  }

  test("training is deterministic and the DataFrame route equals the " +
    "local trainer on the same word-frequency table") {
    val corpus = Seq("spark spark scan", "sort merge join join",
      "spark scan scan filter", "merge sort spark")
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val wf = corpus.flatMap(_.split("\\s+")).groupBy(identity).view
      .mapValues(_.size.toLong).toSeq
    val a = Unigram.unigramTrain(docs, vocabSize = 12, maxPieceLen = 4)
    val b = Unigram.unigramTrainLocal(wf, vocabSize = 12, maxPieceLen = 4)
    val c = Unigram.unigramTrainLocal(wf, vocabSize = 12, maxPieceLen = 4)
    assert(a === b, "DataFrame route == local trainer")
    assert(b === c, "deterministic")
  }

  test("a word table beyond maxLocalWords routes to the DISTRIBUTED " +
    "E-step trainer over the FULL table (no tail truncation) — " +
    "parity-pinned against the local trainer") {
    val corpus = Seq.fill(9)("aaa") ++ Seq.fill(9)("bbb") ++
      Seq.fill(4)("ccc") ++ Seq.fill(2)("ddd") ++ Seq("eee")
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Unigram.unigramTrain(docs, vocabSize = 6, maxPieceLen = 3,
      maxLocalWords = 3L) // 5 distinct words > 3 → forced distributed
    val full = Seq(("aaa", 9L), ("bbb", 9L), ("ccc", 4L), ("ddd", 2L),
      ("eee", 1L))
    val local = Unigram.unigramTrainLocal(full, vocabSize = 6,
      maxPieceLen = 3)
    // full-table parity: identical piece set and ordering; logps equal
    // to 1e-9 (the two routes sum float expectations in different but
    // each-deterministic orders)
    assert(got.map(_._1) === local.map(_._1))
    got.zip(local).foreach { case ((p, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-9, s"logp parity for $p")
    }
    // the truncated-table result would DIFFER (ddd/eee mass missing) —
    // the r11 truncation behavior is genuinely gone
    val truncated = Unigram.unigramTrainLocal(full.take(3), vocabSize = 6,
      maxPieceLen = 3)
    val differs = truncated.map(_._1).toSet != got.map(_._1).toSet ||
      truncated.exists { case (p, lp) =>
        math.abs(got.toMap.getOrElse(p, Double.NaN) - lp) > 1e-9 }
    assert(differs, "truncated-table result must differ from full-table")
  }

  test("the distributed trainer is run-to-run deterministic and " +
    "matches the local route on a multi-partition corpus") {
    val rnd = new scala.util.Random(7)
    val base = Seq("spark", "scan", "filter", "join", "merge", "sort",
      "shuffle", "window", "stream", "batch")
    val corpus = Seq.tabulate(300)(i =>
      Seq.fill(3)(base(rnd.nextInt(base.size))).mkString(" "))
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").repartition(8)
    val wf = corpus.flatMap(_.split(" ")).groupBy(identity).view
      .mapValues(_.size.toLong).toSeq
    val d1 = Unigram.unigramTrain(docs, vocabSize = 20, maxPieceLen = 4,
      maxLocalWords = 1L) // forced distributed
    val d2 = Unigram.unigramTrain(docs, vocabSize = 20, maxPieceLen = 4,
      maxLocalWords = 1L)
    assert(d1 === d2, "distributed run-to-run determinism")
    val local = Unigram.unigramTrainLocal(wf, vocabSize = 20,
      maxPieceLen = 4)
    assert(d1.map(_._1) === local.map(_._1), "piece set + order parity")
    d1.zip(local).foreach { case ((p, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-9, s"logp parity for $p")
    }
  }

  // --- application ---------------------------------------------------------

  test("unigramApplyLarge equals per-word driver-local viterbi " +
    "(lowercasing, whitespace split, memo path) on random documents") {
    val rnd = new scala.util.Random(99)
    val vocab = Seq("a" -> -2.5, "b" -> -2.75, "c" -> -3.0, "d" -> -3.25,
      "ab" -> -1.5, "cd" -> -1.75, "abc" -> -1.25, "bcd" -> -2.0)
    val vm = vocab.toMap
    val docs = (0 until 30).map { i =>
      val words = Seq.fill(1 + rnd.nextInt(6))(
        Seq.fill(1 + rnd.nextInt(8))("abcdX"(rnd.nextInt(5))).mkString)
      (i.toLong, words.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val got = Unigram.unigramApplyLarge(df, vocab)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    val unk = vocab.map(_._2).min - 10.0
    docs.foreach { case (id, text) =>
      val want = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .flatMap(w => Unigram.viterbiWord(w, vm, 3, unk)._1).toList
      assert(got(id) === want, s"doc $id")
    }
  }

  test("viterbiTable emits the same scores as viterbiWord") {
    val vocab = Seq("a" -> -2.0, "b" -> -2.5, "ab" -> -1.5, "ba" -> -1.75)
    val vm = vocab.toMap
    val words = Seq("ab", "ba", "abab", "bab", "aabb")
    val got = Unigram.viterbiTable(words.toDF("w"), vocab)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
      .toSeq.sortBy(_._1)
    val unk = vocab.map(_._2).min - 10.0
    val want = words.map { w =>
      val (toks, s) = Unigram.viterbiWord(w, vm, 2, unk)
      (w, toks.length, s)
    }.sortBy(_._1)
    got.zip(want).foreach { case ((gw, gn, gs), (ww, wn, ws)) =>
      assert(gw === ww); assert(gn === wn)
      assert(math.abs(gs - ws) < 1e-12, s"word $gw")
    }
  }

  test("end-to-end: trained vocabulary tokenizes the training corpus " +
    "into fewer tokens than characters (compression sanity)") {
    val corpus = Seq.fill(20)("sparksql sparksql streaming") ++
      Seq.fill(10)("streaming sql")
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val vocab = Unigram.unigramTrain(docs, vocabSize = 20, maxPieceLen = 6)
    val toks = Unigram.unigramApplyLarge(docs, vocab)
    val totalToks = toks.select(org.apache.spark.sql.functions
      .sum(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col("tokens"))))
      .head().getLong(0)
    val totalChars = corpus.map(_.count(_ != ' ')).sum
    assert(totalToks < totalChars,
      s"multi-char pieces in use: $totalToks tokens vs $totalChars chars")
  }

  test("vocabFingerprint is a CONTENT digest: piece-boundary, logprob, " +
    "order and length changes all produce distinct keys (r14 ADVICE — " +
    "the 32-bit Seq.hashCode key could collide across SparkContexts)") {
    val fp = Unigram.vocabFingerprint _
    val base = Seq(("ab", -1.0), ("c", -2.0))
    assert(fp(base) === fp(Seq(("ab", -1.0), ("c", -2.0))))
    // piece-boundary shift: same concatenated bytes, different pieces
    assert(fp(base) !== fp(Seq(("a", -1.0), ("bc", -2.0))))
    // logprob change only
    assert(fp(base) !== fp(Seq(("ab", -1.0), ("c", -2.5))))
    // order change (vocab rank is meaningful)
    assert(fp(base) !== fp(Seq(("c", -2.0), ("ab", -1.0))))
    // length prefix guards truncation
    assert(fp(base) !== fp(base :+ ("d", -3.0)))
    assert(fp(Seq.empty) !== fp(base))
  }
}
