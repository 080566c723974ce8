package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Batched distributed subword training — the shared engine behind
  * [[Tokenizer.bpeTrainDistributed]] (raw-count objective) and
  * [[WordPiece.wordPieceTrainDistributed]] (likelihood-gain
  * objective), replacing r13's one-Spark-job-per-merge loops.
  *
  * The r13 loops were trajectory-exact but driver-sequential: one full
  * word-table aggregation plus a `localCheckpoint` PER MERGE, i.e.
  * O(vocab) sequentially-scheduled jobs in exactly the
  * beyond-`maxLocalWords` regime the route exists for (a production
  * 30k-merge vocabulary ≈ 10⁵ jobs). This engine runs the SAME greedy
  * trajectory in O(vocab / batch) Spark rounds:
  *
  *   1. ONE aggregation produces current symbol counts (vocabulary-
  *      bounded — collected whole) and adjacent-pair counts, of which
  *      the driver takes the top-P prefix UNDER THE TRAINER'S TOTAL
  *      ORDER (objective desc, then pair asc by UTF-16 code units —
  *      `encode(col,'UTF-16BE')` makes Spark's binary sort equal to
  *      `Ordering.String`, closing the UTF-8-bytes-vs-UTF-16 ordering
  *      divergence the r13 tie-collection worked around).
  *   2. The words containing any of the top-M pairs (the "active set"
  *      S) are pulled to the driver, capped; merging a pair of S can
  *      only change active words, so the driver can simulate the
  *      EXACT greedy loop locally: global pair counts evolve as
  *      base + observed-active-delta, symbol counts exactly.
  *   3. Simulation continues while the argmax is PROVABLY the true
  *      global argmax. It stops when (a) the winner could be hiding
  *      below the top-P boundary — for counts, unknown pairs can
  *      never grow past the boundary value (+ any collision-born
  *      occurrences, tracked); for gains, a consumed denominator can
  *      inflate an unknown pair's gain by at most the max
  *      original/current symbol-count ratio squared, so the bound is
  *      τ·r²_max + maxCollisionDelta — or (b) the winner is a known
  *      pair whose OCCURRENCES are not provably all active (∉ S and
  *      not made of a brand-new symbol): it is left for the next
  *      round, where it is the argmax by construction.
  *   4. The whole batch of merges is applied to the distributed table
  *      in ONE `mapPartitions` pass (sequential greedy-left fold, the
  *      trainers' semantics — NOT the rank-based tokenizer apply,
  *      which diverges when a merged string collides with a
  *      pre-existing symbol) and the loop repeats.
  *
  * Soundness note: the obvious cheaper rule — "apply the top-k
  * pairwise-non-interacting merges per round" — is NOT trajectory-
  * exact. Counterexample (counts): c(a,b)=100, c(x,a)=90 with every
  * (x,a) followed by b, best disjoint pair 50; after merging (a,b)
  * the NEW pair (x,ab) has count 90 and true greedy picks it, not the
  * 50. Skip-and-continue also fails: a skipped (x,a)=90 with no x,a,b
  * contexts keeps count 90 and outranks every later batch member. The
  * active-set simulation sidesteps both: new pairs born from pulled
  * words are counted exactly, and the stop bounds are proved, not
  * assumed.
  *
  * Determinism: the argmax tie-break is (objective desc, pair asc by
  * UTF-16 code units) in both engines; all gain divisions are the
  * same single IEEE `c/(c_a·c_b)` the local trainers compute, so the
  * batched route is trajectory-identical to [[Tokenizer
  * .bpeTrainLocal]] / [[WordPiece.wordPieceTrainLocal]] — property-
  * pinned in TokenizerSpec/WordPieceSpec with caps forced tiny so
  * every stop path is exercised. Raw-count objectives additionally
  * require counts < 2^53 (doubles index them exactly; a 100 TB corpus
  * is ~10^13 tokens, 600× under), enforced with a `require`.
  */
private[operators] object SubwordBatch {

  /** One training selection: the chosen pair, its merged form, and
    * the exact integer counts behind the decision (pair count and the
    * two symbol counts BEFORE the merge — the [[WordPiece.MergeStep]]
    * evidence). */
  final case class Sel(a: String, b: String, merged: String,
      cPair: Long, cLeft: Long, cRight: Long)

  /** Training result: the initial alphabet (driver-sorted, UTF-16),
    * selections in order, and the Spark-round / action accounting the
    * batching claim is graded on. */
  final case class Result(alphabet: Seq[String], sels: Seq[Sel],
      rounds: Int, sparkActions: Int)

  private val MaxExactLong = 1L << 53

  /** Greedy-left application of one merge to a symbol array — the
    * local twin of [[Tokenizer.mergeOnce]]'s column fold and of the
    * local trainers' in-place pass. */
  private[operators] def mergeOnceArr(sym: Array[String], a: String,
      b: String, merged: String): Array[String] = {
    if (sym.length < 2) return sym
    val out = new mutable.ArrayBuffer[String](sym.length)
    sym.foreach { x =>
      if (out.nonEmpty && out.last == a && x == b) {
        out.remove(out.length - 1); out += merged
      } else out += x
    }
    out.toArray
  }

  /** Exact (after-count, delta) accounting cell for one pair or symbol
    * in one word — see [[mergeOnceDeltas]]. */
  private[operators] final class Acc {
    var after: Int = 0
    var delta: Int = 0
  }

  /** [[mergeOnceArr]] fused with exact per-word pair/symbol delta
    * accounting — the r19 driver-loop optimization (guide §1.2 "per-task
    * work", applied to the DRIVER's merge loops): the trainers'
    * per-affected-word cost was four full multiset builds (pair/symbol
    * bags BEFORE and AFTER) plus two key-set unions and per-key lookups;
    * TrainerProbe measured the loops at ~4 s (bpeTrainLocal, 1,200
    * merges over 26.7k units) and ~11.7 s (the batched-distributed
    * simulate) per entry. This single pass builds the merged array and
    * accumulates, per touched pair `q`, its exact AFTER adjacency count
    * (`after`) and the after−before delta (`delta`), and the same for
    * symbols when `symAcc` is non-null.
    *
    * Parity contract (pinned by the existing trajectory specs, which
    * replay full trainings against an independent reference):
    *   - the merged array is element-identical to [[mergeOnceArr]];
    *   - `delta` equals `afterBag(q) − beforeBag(q)` for every key in
    *     either bag (keys touched only transiently net to delta 0 /
    *     after 0, which callers treat exactly like the old union loop:
    *     no count bump, membership-remove no-op);
    *   - `after` equals the true multiset count of `q` in the merged
    *     array (0 for vanished pairs), so membership maintenance
    *     (`after > 0` ⇒ word still contains the pair) is exact. */
  private[operators] def mergeOnceDeltas(sym: Array[String], a: String,
      b: String, merged: String,
      pairAcc: mutable.HashMap[(String, String), Acc],
      symAcc: mutable.HashMap[String, Acc]): Array[String] = {
    if (sym.length < 2) return sym
    val out = new Array[String](sym.length)
    var n = 0
    var i = 0
    while (i < sym.length) {
      val x = sym(i)
      if (n > 0 && out(n - 1) == a && x == b) {
        // replace the just-pushed `a` with `merged`; retract the
        // tentative adjacency it formed with its left neighbor
        if (n > 1) {
          val h = pairAcc.getOrElseUpdate((out(n - 2), a), new Acc)
          h.after -= 1; h.delta -= 1
        }
        if (symAcc ne null) {
          val ha = symAcc.getOrElseUpdate(a, new Acc)
          ha.after -= 1; ha.delta -= 1
        }
        out(n - 1) = merged
        if (n > 1) {
          val h = pairAcc.getOrElseUpdate((out(n - 2), merged), new Acc)
          h.after += 1; h.delta += 1
        }
        if (symAcc ne null) {
          val hm = symAcc.getOrElseUpdate(merged, new Acc)
          hm.after += 1; hm.delta += 1
        }
      } else {
        if (n > 0) {
          val h = pairAcc.getOrElseUpdate((out(n - 1), x), new Acc)
          h.after += 1; h.delta += 1
        }
        out(n) = x
        n += 1
        if (symAcc ne null) {
          val hx = symAcc.getOrElseUpdate(x, new Acc)
          hx.after += 1; hx.delta += 1
        }
      }
      i += 1
    }
    // subtract the BEFORE multisets (delta only — `after` already exact)
    i = 0
    while (i < sym.length) {
      if (symAcc ne null) symAcc.getOrElseUpdate(sym(i), new Acc).delta -= 1
      if (i + 1 < sym.length)
        pairAcc.getOrElseUpdate((sym(i), sym(i + 1)), new Acc).delta -= 1
      i += 1
    }
    if (n == sym.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** Run the batched greedy loop over `words` — a (freq: bigint,
    * sym: array&lt;string&gt;) table (extra columns ignored).
    *
    * @param useGain   false → argmax raw pair count (BPE); true →
    *                  argmax c(ab)/(c(a)·c(b)) (WordPiece)
    * @param mergedOf  merged-symbol constructor ((a,b) → a+b for BPE,
    *                  a + b.stripPrefix("##") for WordPiece)
    * @param continue  (selectionsSoFar, vocabSoFar) → keep training?
    *                  vocab counts alphabet + DISTINCT merged pieces
    *                  (the WordPiece stop); selections count every
    *                  merge (the BPE stop)
    * @param topPairs  exact-count pair prefix collected per round
    * @param maxActivePairs upper bound on |S| per round (halved until
    *                  the pull fits `activeWordCap`)
    * @param activeWordCap max active (word, freq, sym) rows pulled to
    *                  the driver per round */
  def train(words0: DataFrame, useGain: Boolean,
      mergedOf: (String, String) => String,
      continue: (Int, Int) => Boolean,
      topPairs: Int = 200000, maxActivePairs: Int = 8192,
      activeWordCap: Int = 1000000): Result = {
    require(topPairs >= 1 && maxActivePairs >= 1 && activeWordCap >= 1)
    val spark = words0.sparkSession
    import spark.implicits._
    val pairOrd = Ordering.Tuple2(Ordering.String, Ordering.String)

    var words = words0.select(col("freq").cast("long").as("freq"),
      col("sym")).localCheckpoint()
    var actions = 1 // the checkpoint above
    var rounds = 0
    val sels = mutable.ArrayBuffer.empty[Sel]
    val vocab = mutable.LinkedHashSet.empty[String]
    var alphabet: Seq[String] = null
    var exhausted = false
    def finish(): Result =
      Result(if (alphabet == null) Seq.empty else alphabet,
        sels.toSeq, rounds, actions)

    try {
      while (!exhausted && continue(sels.size, vocab.size)) {
        rounds += 1
        // ---- 1. one aggregation: symbol counts beside pair counts
        // (singles discriminated by a NULL right side)
        val stats = words
          .select(col("freq"), explode(concat(
            transform(col("sym"), s =>
              struct(s.as("a"), lit(null).cast("string").as("b"))),
            zip_with(
              slice(col("sym"), lit(1), size(col("sym")) - 1),
              slice(col("sym"), lit(2), size(col("sym")) - 1),
              (x, y) => struct(x.as("a"), y.as("b"))))).as("e"))
          .groupBy(col("e.a").as("a"), col("e.b").as("b"))
          .agg(sum("freq").as("n"))
          .localCheckpoint()
        actions += 1
        try {
          val symArr = stats.filter(col("b").isNull)
            .select("a", "n").collect()
            .map(r => (r.getString(0), r.getLong(1)))
          actions += 1
          if (alphabet == null) {
            // round-1 symbol table IS the initial alphabet — seeded
            // with the LOCAL trainers' UTF-16 comparator
            alphabet = symArr.map(_._1).sorted.toSeq
            vocab ++= alphabet
            if (!continue(sels.size, vocab.size)) return finish()
          }
          // ---- top-(P+1) pairs under the trainer's TOTAL order;
          // the (P+1)-th, if present, is the first UNKNOWN and its
          // value the bound τ
          val pairs = stats.filter(col("b").isNotNull)
          val ranked =
            if (useGain) {
              val sc = stats.filter(col("b").isNull)
                .select(col("a").as("s"), col("n").as("c"))
              pairs
                .join(sc.select(col("s").as("a"), col("c").as("ca")),
                  Seq("a"))
                .join(sc.select(col("s").as("b"), col("c").as("cb")),
                  Seq("b"))
                .select(col("a"), col("b"), col("n"),
                  (col("n").cast("double") /
                    (col("ca").cast("double") * col("cb").cast("double")))
                    .as("v"))
            } else {
              pairs.select(col("a"), col("b"), col("n"),
                col("n").cast("double").as("v"))
            }
          val top = ranked
            .orderBy(col("v").desc, encode(col("a"), "UTF-16BE"),
              encode(col("b"), "UTF-16BE"))
            .limit(topPairs + 1)
            .collect()
            .map(r => (r.getString(0), r.getString(1), r.getLong(2),
              r.getDouble(3)))
          actions += 1
          if (top.isEmpty) { exhausted = true; return finish() }
          if (!useGain)
            require(top.head._3 < MaxExactLong,
              "pair counts exceed 2^53 — the double-indexed argmax " +
                "would lose exactness")
          val knowns =
            if (top.length <= topPairs) top
            else top.dropRight(1)
          val boundary: Option[(Double, String, String)] =
            if (top.length <= topPairs) None
            else Some((top.last._4, top.last._1, top.last._2))

          // ---- 2. pull the active set: words containing any top-M
          // pair (halve M until it fits the cap; NUL-joined pair keys
          // can only FALSE-POSITIVE, which is harmless — extra active
          // words are simulated exactly too)
          var m = math.min(maxActivePairs, knowns.length)
          var pulled: Array[(Long, Array[String])] = null
          var sSet: Set[(String, String)] = null
          var singleFallback = false
          while (pulled == null && !singleFallback) {
            sSet = knowns.take(m).map(t => (t._1, t._2)).toSet
            val sKeys = sSet.toSeq.map { case (a, b) => a + "\u0000" + b }
            val hit = arrays_overlap(
              zip_with(
                slice(col("sym"), lit(1), size(col("sym")) - 1),
                slice(col("sym"), lit(2), size(col("sym")) - 1),
                (x, y) => concat(x, lit("\u0000"), y)),
              lit(sKeys.toArray))
            val got = words.filter(hit).select("freq", "sym")
              .limit(activeWordCap + 1).collect()
              .map(r => (r.getLong(0), r.getSeq[String](1).toArray))
            actions += 1
            if (got.length <= activeWordCap) pulled = got
            else if (m == 1) singleFallback = true
            else m = math.max(1, m / 2)
          }

          val batch: Seq[Sel] =
            if (singleFallback) {
              // even the single most frequent pair spans more words
              // than the cap: select it WITHOUT simulation (it is the
              // exact global argmax; counts from this round's stats)
              // and let the distributed fold apply it
              val (a, b, n, _) = knowns.head
              val scm = symArr.toMap
              Seq(Sel(a, b, mergedOf(a, b), n, scm(a), scm(b)))
            } else {
              // the vocab-growth estimate (+n) is conservative: a
              // selection that RE-DERIVES an existing piece does not
              // grow the vocab, so a batch may end early — the outer
              // loop re-checks with the real vocab and continues
              simulate(useGain, mergedOf, pulled, knowns, symArr, sSet,
                boundary,
                n => continue(sels.size + n, vocab.size + n), pairOrd)
            }
          // vocab bookkeeping (LinkedHashSet dedups re-derived pieces
          // exactly as the local trainers do)
          batch.foreach { s => sels += s; vocab += s.merged }
          if (batch.isEmpty) { exhausted = true; return finish() }

          // ---- 4. apply the whole batch in ONE distributed pass:
          // sequential greedy-left fold per word (inactive words
          // contain no applicable pair — proven by the S/brand-new
          // applicability gate — so they pass through on an O(len)
          // check)
          val bc = spark.sparkContext.broadcast(
            batch.map(s => (s.a, s.b, s.merged)).toArray)
          val sBc = spark.sparkContext.broadcast(sSet)
          val next = words.select(col("freq"), col("sym"))
            .as[(Long, Seq[String])]
            .mapPartitions { it =>
              val ms = bc.value
              val sset = sBc.value
              it.map { case (f, symSeq) =>
                var cur = symSeq.toArray
                if (cur.length >= 2 && {
                  var i = 0; var active = false
                  while (!active && i < cur.length - 1) {
                    active = sset.contains((cur(i), cur(i + 1))); i += 1
                  }
                  active
                }) {
                  var j = 0
                  while (j < ms.length) {
                    val (a, b, mg) = ms(j)
                    cur = mergeOnceArr(cur, a, b, mg)
                    j += 1
                  }
                }
                (f, cur.toSeq)
              }
            }
            .toDF("freq", "sym")
            .localCheckpoint()
          actions += 1
          // the eager checkpoint above has materialized every partition,
          // so the per-round broadcasts can be released immediately —
          // without this a long tight-cap training accumulates two
          // broadcast blocks per round
          bc.destroy()
          sBc.destroy()
          words.unpersist()
          words = next
        } finally stats.unpersist()
      }
      finish()
    } finally words.unpersist()
  }

  // --------------------------------------------------------------
  // Exact driver-side simulation over the active set
  // --------------------------------------------------------------

  private def pairBag(sym: Array[String])
      : mutable.HashMap[(String, String), Int] = {
    val m = mutable.HashMap.empty[(String, String), Int]
    var i = 0
    while (i < sym.length - 1) {
      val p = (sym(i), sym(i + 1))
      m.update(p, m.getOrElse(p, 0) + 1)
      i += 1
    }
    m
  }

  /** Simulate the exact greedy loop over the pulled active words until
    * a stop bound fires. `wantMore(k)` asks whether a (k+1)-th
    * selection is still wanted. */
  private def simulate(useGain: Boolean,
      mergedOf: (String, String) => String,
      active: Array[(Long, Array[String])],
      knowns: Array[(String, String, Long, Double)],
      symArr: Array[(String, Long)],
      sSet: Set[(String, String)],
      boundary: Option[(Double, String, String)],
      wantMore: Int => Boolean,
      pairOrd: Ordering[(String, String)]): Seq[Sel] = {

    val symCount = mutable.HashMap.empty[String, Long]
    symArr.foreach { case (s, c) => symCount(s) = c }
    val origSym: Set[String] = symArr.map(_._1).toSet
    val origSymCount: Map[String, Long] = symCount.toMap

    val known = mutable.HashMap.empty[(String, String), Long]
    knowns.foreach { case (a, b, n, _) => known((a, b)) = n }

    // ordered argmax index over known pairs: (value desc, pair asc by
    // UTF-16). Entries tracked in pairEntry for exact TreeSet removal.
    val idxOrd = Ordering.Tuple3(Ordering[Double].reverse,
      Ordering.String, Ordering.String)
    val index = mutable.TreeSet.empty[(Double, String, String)](idxOrd)
    val pairEntry =
      mutable.HashMap.empty[(String, String), (Double, String, String)]
    val symToKnown =
      mutable.HashMap.empty[String, mutable.HashSet[(String, String)]]

    def valueOf(p: (String, String), c: Long): Double =
      if (useGain)
        c.toDouble / (symCount(p._1).toDouble * symCount(p._2).toDouble)
      else c.toDouble

    def refresh(p: (String, String)): Unit = {
      pairEntry.remove(p).foreach(index.remove)
      val c = known.getOrElse(p, 0L)
      if (c > 0L) {
        val e = (valueOf(p, c), p._1, p._2)
        index.add(e)
        pairEntry(p) = e
      }
    }

    knowns.foreach { case (a, b, _, _) =>
      val p = (a, b)
      refresh(p)
      symToKnown.getOrElseUpdate(a, mutable.HashSet.empty) += p
      symToKnown.getOrElseUpdate(b, mutable.HashSet.empty) += p
    }

    // per-pair occurrence index over active words (the bpeTrainLocal
    // shape) — finds a merge's affected words in O(affected)
    val pairWords = mutable.HashMap.empty[(String, String), mutable.BitSet]
    active.indices.foreach { w =>
      pairBag(active(w)._2).keysIterator.foreach { p =>
        pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += w
      }
    }

    // bound state: unknown pairs (below the top-P boundary) can gain
    // occurrences ONLY via collision-born creations inside active
    // words (a merged string equal to a pre-existing symbol); track
    // their net deltas and a conservative running max
    val unknownDelta = mutable.HashMap.empty[(String, String), Long]
    var maxUnknownPos = 0L
    // gain bound: max_{s in origSym, c_now>0} c_orig(s)/c_now(s),
    // conservative running max (never shrinks)
    var rMax = 1.0

    def candidateSafe(v: Double, a: String, b: String): Boolean =
      boundary match {
        case None => true // exhaustive: every pair is known exactly
        case Some((bv, ba, bb)) =>
          val inflated = maxUnknownPos > 0L || (useGain && rMax > 1.0)
          if (!inflated) {
            // uninflated unknowns sit at-or-after (bv, ba, bb) in the
            // trainer's total order and can only have moved later
            v > bv || (v == bv && pairOrd.lt((a, b), (ba, bb)))
          } else {
            val ceil =
              if (useGain) bv * rMax * rMax + maxUnknownPos.toDouble
              else bv + maxUnknownPos.toDouble
            v > ceil // strict: an unknown at the ceiling could tie
          }
      }

    def applicable(a: String, b: String): Boolean =
      sSet.contains((a, b)) || !origSym.contains(a) ||
        !origSym.contains(b)

    val out = mutable.ArrayBuffer.empty[Sel]
    var stop = false
    while (!stop && wantMore(out.size) && index.nonEmpty) {
      val (v, a, b) = index.head
      if (!candidateSafe(v, a, b) || !applicable(a, b)) stop = true
      else {
        val p = (a, b)
        val merged = mergedOf(a, b)
        out += Sel(a, b, merged, known(p), symCount(a), symCount(b))
        val affected = pairWords.get(p)
          .map(_.toArray).getOrElse(Array.emptyIntArray)
        val dirtyPairs = mutable.HashSet.empty[(String, String)]
        val touchedSyms = mutable.HashSet.empty[String]
        affected.foreach { w =>
          val (f, symsBefore) = active(w)
          // r19: one fused pass (mergeOnceDeltas) replaces the four
          // before/after multiset builds + two key-set unions per word;
          // the (delta, after) cells drive the identical count/bound/
          // membership updates the union loop performed (transient
          // net-0 keys behave exactly like the old not-in-union case).
          val pAccM = mutable.HashMap.empty[(String, String), Acc]
          val sAccM = mutable.HashMap.empty[String, Acc]
          val symsAfter = mergeOnceDeltas(symsBefore, a, b, merged,
            pAccM, sAccM)
          active(w) = (f, symsAfter)
          pAccM.foreach { case (q, h) =>
            if (h.delta != 0) {
              val delta = h.delta.toLong * f
              if (known.contains(q)) {
                known(q) = known(q) + delta
                dirtyPairs += q
              } else if (boundary.isEmpty ||
                  !origSym.contains(q._1) || !origSym.contains(q._2)) {
                // provably base-0 everywhere: promote to known-exact
                known(q) = delta
                symToKnown.getOrElseUpdate(q._1,
                  mutable.HashSet.empty) += q
                symToKnown.getOrElseUpdate(q._2,
                  mutable.HashSet.empty) += q
                dirtyPairs += q
              } else {
                val net = unknownDelta.getOrElse(q, 0L) + delta
                unknownDelta(q) = net
                if (net > maxUnknownPos) maxUnknownPos = net
              }
            }
            if (h.after > 0)
              pairWords.getOrElseUpdate(q, mutable.BitSet.empty) += w
            else pairWords.get(q).foreach(_ -= w)
          }
          sAccM.foreach { case (s, h) =>
            if (h.delta != 0) {
              symCount(s) = symCount.getOrElse(s, 0L) + h.delta.toLong * f
              touchedSyms += s
            }
          }
        }
        if (useGain) {
          touchedSyms.foreach { s =>
            origSymCount.get(s).foreach { c0 =>
              val cNow = symCount.getOrElse(s, 0L)
              if (cNow > 0L) {
                val r = c0.toDouble / cNow.toDouble
                if (r > rMax) rMax = r
              }
            }
            symToKnown.get(s).foreach(_.foreach(dirtyPairs += _))
          }
        }
        dirtyPairs.foreach(refresh)
      }
    }
    out.toSeq
  }
}
