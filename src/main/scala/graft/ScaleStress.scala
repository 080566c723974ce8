package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis, Tokenizer, Unigram}

/** Scale-stress harness: derive a `factor`× corpus (default 100× → 500k
  * docs at sf0.1) from the shipped documents table and drive the heavy
  * pipeline paths through it — the empirical "would this hold at the
  * next order of magnitude" check that the per-entry bench (5k docs)
  * cannot give.
  *
  * The derived corpus has a KNOWN duplication structure, so the run
  * doubles as a correctness check at scale:
  *   - copy k of base doc d gets id d·factor+k, a decade tag token
  *     (`d<k/10>`) inserted every 8th token, and a copy tag every 25th
  *     token (`c<k>`, but the SAME `cx` for the first two copies of each
  *     decade);
  *   - ⇒ copies 0,1 of each decade are byte-identical (exact-dup rate =
  *     factor/10 per base, 10% of the corpus);
  *   - ⇒ copies within one decade differ only in sparse copy tags
  *     (Jaccard ≈ 0.8 — above the 0.7 verify gate: one near-dup clique
  *     per decade);
  *   - ⇒ copies across decades differ in every 8th token (Jaccard ≈ 0.5
  *     — band collisions happen, but the exact-Jaccard verify gate must
  *     reject them, keeping components decade-sized).
  * Expected: exactDups = n_base·factor/10, components of size ≈ 10, and
  * an e2e survivor count near n_base·factor/10 (one keeper per clique).
  *
  * Emits ONE JSON line: per-step wall seconds + observed vs expected
  * counts. Run:
  * {{{
  * SPARK_GRAFT_CPUS=32 sbt -batch 'runMain graft.ScaleStress \
  *   /root/testdata/sf0.1 100 /tmp/graft_scale'
  * }}}
  */
object ScaleStress {

  private def f3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 100
    val workDir = if (args.length > 2) args(2)
      else java.nio.file.Files.createTempDirectory("graft_scale").toString
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val steps = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    val facts = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      steps += name -> (System.nanoTime() - t0) / 1e9
      System.err.println(f"[scale] $name%-28s ${steps.last._2}%7.2f s")
      r
    }

    // ---- derive the corpus (deterministic; no RNG) ----------------------
    val corpusPath = s"$workDir/documents_x$factor.parquet"
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val nBase = base.count()
    timed("build_corpus") {
      base
        .withColumn("k", explode(sequence(lit(0), lit(factor - 1))))
        .withColumn("ctag",
          when(col("k") % 10 < 2, lit("x"))
            .otherwise(col("k").cast("string")))
        .withColumn("text", expr(
          "array_join(transform(split(text, '\\\\s+'), (t, i) -> " +
            "CASE WHEN i % 8 = 7 " +
            "  THEN concat(t, ' d', CAST(k DIV 10 AS STRING)) " +
            "WHEN i % 25 = 24 THEN concat(t, ' c', ctag) " +
            "ELSE t END), ' ')"))
        .select((col("doc_id") * factor + col("k")).as("doc_id"),
          col("text"), col("lang"), col("source"),
          length(col("text")).as("n_chars"))
        .repartition(64) // give downstream scans real splits
        .write.mode("overwrite").parquet(corpusPath)
    }
    val corpus = spark.read.parquet(corpusPath)
    facts += "n_docs" -> nBase * factor
    facts += "expect_exact_dups" -> nBase * (factor / 10)

    // ---- exact dedup ----------------------------------------------------
    facts += "exact_dups" -> timed("exact_dedup") {
      Dedup.exactDuplicates(corpus).count()
    }

    // ---- LSH candidates → Jaccard verify → components -------------------
    val pairs = timed("lsh_candidate_pairs") {
      val p = Dedup.lshCandidatePairs(corpus, numHashes = 128, bands = 16)
        .transform(graft.operators.Materialize.cut)
      facts += "candidate_pairs" -> p.count()
      p
    }
    val verified = timed("pair_jaccard_verify") {
      val v = Dedup.pairJaccard(pairs, corpus)
        .filter(col("jaccard") >= 0.7)
        .select("id_a", "id_b")
        .transform(graft.operators.Materialize.cut)
      facts += "verified_pairs" -> v.count()
      v
    }
    timed("neardup_components") {
      val comp = Dedup.nearDupComponents(verified)
      val sizes = comp.groupBy("component").count()
      val agg = sizes.agg(count(lit(1)).as("n_components"),
        max("count").as("max_size"),
        sum(when(col("count") >= 8, 1).otherwise(0)).as("n_decade_sized"))
        .collect()(0)
      facts += "n_components" -> agg.getLong(0)
      facts += "max_component_size" -> agg.getLong(1)
      facts += "n_components_ge8" -> agg.getLong(2)
    }
    facts += "expect_components" -> nBase * (factor / 10)

    // ---- e2e corpus dedup (quality gate + exact + LSH + verify + CC) ----
    facts += "e2e_survivors" -> timed("dedup_corpus_e2e") {
      Dedup.dedupCorpus(corpus, minQuality = 0.0, numHashes = 128,
        bands = 16, jaccardThreshold = Some(0.7)).count()
    }
    facts += "expect_survivors_approx" -> nBase * (factor / 10)

    // ---- BPE training (one corpus pass + driver-local merges) -----------
    facts += "bpe_merges" -> timed("bpe_train_4k") {
      Tokenizer.bpeMergeTable(corpus, numMerges = 4000, wordsPerUnit = 3)
        .count()
    }

    // ---- unigram-LM training (one corpus pass + driver-local EM) --------
    facts += "unigram_pieces" -> timed("unigram_train_4k") {
      Unigram.unigramTrain(corpus, vocabSize = 4000,
        wordsPerUnit = 3, maxPieceLen = 8, seedSize = 16000).size.toLong
    }

    // ---- corpus-wide stats (sketched) -----------------------------------
    timed("corpus_stats_sketch") {
      TextAnalysis.corpusStats(corpus, approximate = true).collect()
    }

    val total = steps.map(_._2).sum
    val json = "{" +
      s""""metric":"scale_stress","factor":$factor,""" +
      s""""sf":"$sfDir","total_sec":${f3(total)},""" +
      s""""steps":${steps.map { case (k, v) => s""""$k":${f3(v)}""" }
        .mkString("{", ",", "}")},""" +
      s""""facts":${facts.map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}")}}"""
    println(json)
    spark.stop()
  }
}
