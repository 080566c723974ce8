package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drives the full [[ScaleStressGraph]] plane at the minimum plant size
  * (5,000 docs) so the planted-gate algebra — ring uniformity, chord
  * triangles, clique LPA labels, spaced k-hop reach sets, needle BM25
  * ordering, index roundtrip, phrase decoy exclusion — is proven in
  * `sbt test` before the factor-100 run spends minutes on it. The spec
  * asserts violations == empty AND the exact planted facts, so a gate
  * that silently stopped checking (e.g. a facts key renamed away from
  * its violation guard) fails here too.
  */
class ScaleStressGraphSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("graph+search scale plane: all planted gates hold at n=5000") {
    val corpus = spark.range(5000)
      .select(col("id").as("doc_id"),
        concat(lit("alpha beta gamma delta doc"),
          col("id").cast("string")).as("text"))
      .localCheckpoint()
    val steps = ArrayBuffer[(String, Double)]()
    val facts = ArrayBuffer[(String, Long)]()
    val violations = ArrayBuffer[String]()
    ScaleStressGraph.run(spark, corpus, steps, facts, violations)
    assert(violations.isEmpty, violations.mkString("; "))
    val fm = facts.toMap
    assert(fm("graph_nodes") == 5000L)
    assert(fm("pr_distinct_ranks") == 1L)
    assert(fm("hits_distinct_hub") == 1L && fm("hits_distinct_auth") == 1L)
    assert(fm("tri_sum") == 30L && fm("tri_nodes") == 30L) // 10 chords
    assert(fm("lpa_labels") == 100L && fm("lpa_bad_labels") == 0L)
    assert(fm("khop_rows") == 40L && fm("khop_dist_sum") == 60L)
    assert(fm("ppr_nonzero") == 60L)            // (5+1) x 10 seeds
    // unit restart mass split across seeds telescopes to 1 total
    // (round-6 dust over 60 nonzero nodes)
    assert(math.abs(fm("ppr_mass_1e6") - 1000000L) <= 40L)
    assert(fm("covisit_pairs") == 1000L && fm("covisit_bad_cosine") == 0L)
    assert(fm("bm25_hits") == 50L && fm("index_hits") == 50L)
    assert(fm("phrase_rows") == 80L && fm("phrase_match_sum") == 85L)
    assert(fm("phrase_decoy_hits") == 0L)
    // every timed step actually ran
    val names = steps.map(_._1).toSet
    for (s <- Seq("graph_build", "graph_pagerank", "graph_hits",
        "graph_triangles", "graph_lpa", "graph_ppr", "graph_covisit",
        "graph_khop", "search_bm25_topk", "search_index_roundtrip",
        "search_phrase"))
      assert(names.contains(s), s"step $s missing")
  }
}
