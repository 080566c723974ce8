package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.{Dedup, Warehouse, WebGraph}

/** Plan-shape pins for the round-8 catalog additions (graph, warehouse,
  * dedup-survivorship) — the load-bearing physical shapes the 100 TB
  * story rests on, asserted via [[PlanAudit]] so a refactor that
  * reintroduces a global window, an unbounded iterative plan, or a
  * shuffle on a bucketed join fails CI instead of the next bench.
  *
  * (PlanShapeSpec pins the assembly/dedup spines; BucketingSpec pins the
  * cojoin exchange count at write time — this suite covers the newer
  * operator families.)
  */
class PlanPinsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val edges =
    Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L), (2L, 4L))
      .toDF("src", "dst")

  test("pageRank: per-round localCheckpoint cuts lineage — the returned " +
    "plan is iteration-count-independent (no shuffle accumulation)") {
    val r2 = PlanAudit.summary(WebGraph.pageRank(edges, iters = 2))
    val r6 = PlanAudit.summary(WebGraph.pageRank(edges, iters = 6))
    // The rank vector is checkpointed each round: the final plan reads a
    // LogicalRDD + one finishing projection/join, so its shuffle count
    // must NOT grow with the iteration count.
    assert(r6.shuffles === r2.shuffles,
      s"pageRank plan grows with iterations: 2 rounds → ${r2.shuffles} " +
        s"shuffles, 6 rounds → ${r6.shuffles}")
    assert(r6.cartesianProducts === 0 && r6.globalWindows === 0)
  }

  test("hits: same lineage-cut contract as pageRank") {
    val r2 = PlanAudit.summary(WebGraph.hits(edges, iters = 2))
    val r5 = PlanAudit.summary(WebGraph.hits(edges, iters = 5))
    assert(r5.shuffles === r2.shuffles,
      s"hits plan grows with iterations: ${r2.shuffles} vs ${r5.shuffles}")
  }

  test("nearDupComponents: iterative label propagation returns a " +
    "lineage-cut plan (no per-round shuffle accumulation)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val s = PlanAudit.summary(Dedup.nearDupComponents(pairs))
    // The component table is localCheckpointed per round; the returned
    // frame must read the final checkpoint, not replay the loop.
    assert(s.shuffles === 0, s"components plan replays the loop: $s")
    assert(s.cartesianProducts === 0)
  }

  test("scd2Intervals: keyed windows only — no global window, no join, " +
    "no cartesian") {
    val log = Seq((1L, "A", "2024-01-01", 10L), (1L, "B", "2024-01-02", 11L),
        (2L, "A", "2024-01-01", 12L))
      .toDF("k", "v", "ts", "tie")
    val s = PlanAudit.summary(
      Warehouse.scd2Intervals(log, "k", "v", "ts", "tie"))
    assert(s.windows >= 1 && s.globalWindows === 0,
      s"SCD2 must window per key only: $s")
    assert(s.cartesianProducts === 0)
    // Gaps-and-islands is window + groupBy + window over the SAME key:
    // one key-partitioned exchange, reused — not one per stage.
    assert(s.shuffles <= 2, s"SCD2 shuffle count regressed: $s")
  }

  test("cdcMerge: one full-outer key join, no window, no cartesian") {
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "x", "y")
    val changes = Seq((2L, "U", "b2", 2.5), (3L, "I", "c", 3.0))
      .toDF("k", "op", "x", "y")
    val s = PlanAudit.summary(
      Warehouse.cdcMerge(base, changes, "k", Seq("x", "y")))
    assert(s.windows === 0 && s.cartesianProducts === 0)
    // full-outer on the key: at most the two input exchanges (AQE may
    // plan fewer for broadcastable sides) — never more.
    assert(s.shuffles <= 2, s"cdcMerge shuffle count regressed: $s")
  }

  test("canonicalKeepers: survivorship is groupBy-min_by — zero windows") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val quality = Seq((1L, 0.5), (2L, 0.9), (3L, 0.7)).toDF("id", "q")
    val s = PlanAudit.summary(Dedup.canonicalKeepers(pairs, quality))
    assert(s.windows === 0,
      s"canonicalKeepers must not use a window (min_by groupBy): $s")
    assert(s.globalWindows === 0 && s.cartesianProducts === 0)
  }

  test("goldenRecords: one left join + one groupBy over the corpus — " +
    "no window, no cartesian") {
    val docs = Seq((1L, "en", "web", 100L), (2L, "en", "web", 200L),
        (3L, "de", "book", 300L))
      .toDF("doc_id", "lang", "source", "n_chars")
    val comps = Seq((2L, 1L)).toDF("id", "component")
    val s = PlanAudit.summary(Dedup.goldenRecords(docs, comps))
    assert(s.windows === 0 && s.cartesianProducts === 0)
  }

  test("semanticDecontaminate: eval side broadcasts — linear in the " +
    "corpus, no cartesian shuffle") {
    val corpus = (1 to 20)
      .map(i => (i.toLong, Array(i.toFloat, 1f))).toDF("vec_id", "embedding")
    val ev = Seq((100L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val s = PlanAudit.summary(
      graft.operators.Similarity.semanticDecontaminate(corpus, ev, 0.5))
    assert(s.broadcasts >= 1, s"eval side must broadcast: $s")
    assert(s.cartesianProducts === 0, s"corpus-side cartesian: $s")
  }

  test("bucketed cojoin reads plan with zero shuffle exchanges " +
    "(the at-rest layout IS the exchange)") {
    val dir = Files.createTempDirectory("graft_pins_bkt").toString
    val left = (1 to 50).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 50).map(i => (i.toLong, s"r$i")).toDF("j", "rv")
    val joined = graft.sources.Bucketing.cojoin(left, "k", right, "j",
      nBuckets = 4, dir = dir)
    val s = PlanAudit.summary(joined)
    assert(s.shuffles === 0, s"bucketed cojoin shuffled: $s")
  }

  test("WARC read: ONE Hadoop RDD regardless of file count — no " +
    "per-file driver work in the scan (r10 pin)") {
    val dir = Files.createTempDirectory("graft_pins_warc")
    val recs = graft.tools.WarcFixtureGen.records.filterNot(_.corrupt)
    (0 until 3).foreach { i =>
      java.nio.file.Files.write(dir.resolve(s"f$i.warc"),
        graft.tools.WarcFixtureGen.serialize(recs.take(2 + i)))
    }
    val df = graft.sources.DocSource.warc(spark, dir.toString)
    def hadoopRdds(r: org.apache.spark.rdd.RDD[_]): Int = {
      val self = if (r.isInstanceOf[org.apache.spark.rdd.NewHadoopRDD[_, _]]) 1 else 0
      self + r.dependencies.map(d => hadoopRdds(d.rdd)).sum
    }
    val n = hadoopRdds(df.queryExecution.toRdd)
    assert(n === 1, s"WARC scan lineage holds $n Hadoop RDDs (expected " +
      "one for the whole directory — per-file RDDs mean driver-side " +
      "file iteration)")
    // and the one RDD really covers all three files
    assert(df.filter(col("_corrupt").isNull).count() === (2 + 3 + 4).toLong)
  }

  test("q184 bpeApplyLarge: zero Exchange — tokenization is one narrow " +
    "projection over the corpus (r10 pin; mapPartitions until r19, now " +
    "the BpeTokenizeWords expression — same zero-shuffle contract)") {
    val docs = (1 to 50).map(i => (i.toLong, s"newest west $i"))
      .toDF("doc_id", "text")
    val merges = Seq(("e", "s"), ("es", "t"), ("w", "e"))
    val s = PlanAudit.summary(
      graft.operators.Tokenizer.bpeApplyLarge(docs, merges))
    assert(s.shuffles === 0, s"bpeApplyLarge shuffled: $s")
    assert(s.cartesianProducts === 0 && s.globalWindows === 0)
  }
}
