package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Attribution probe for the last interpreted fold on a measured path
  * (r18 verdict #6): [[TextAnalysis.langId]] folds 21 scored structs
  * per row through one `aggregate` HOF (bounded — 21 elements — but
  * interpreted), while each score is a `regexp_count` over the full
  * document. Before giving the fold the expression treatment, this
  * probe answers whether it is worth one: it times
  *
  *   - `full`   — the real langId projection (21 regex scores + the
  *     interpreted 21-way argmax fold);
  *   - `scores` — the SAME 21 `regexp_count` scores, combined by a
  *     codegen'd arithmetic sum instead of the fold (identical regex
  *     work, zero HOF);
  *
  * over 250k ~40-word docs (a third of each doc real stopword text so
  * the regexes do realistic match work), three passes each so warm JIT
  * separates from steady cost. `full − scores` is the fold's share.
  *
  *   sbt 'runMain graft.tools.LangIdProbe'
  *
  * Measured (this host, local[32], r19): full 1.23/0.77 s warm vs
  * scores-only 1.07/0.66 s — the fold is ~0.10-0.16 s of a ~0.8-1.2 s
  * pass per 250k docs (**~10-14%**, under the 20% action bar; the 21
  * per-language regex passes are ~86-90% of the wall). Cold pass 1:
  * full 5.52 s vs scores 1.66 s — the fold's interpreter does add
  * ~3.9 s of one-time per-JVM C2 work, but langId entries run once per
  * catalog sweep against sub-second walls, two orders below the
  * q183b chain this cost retired elsewhere. A native MaxScoreLang
  * expression would recover at most ~0.15 s of the q31/q153-q155
  * walls — documented NO-ACTION; the regex side already runs the r15
  * run-coalesced `\b` clusters and `regexp_count` (no match-array
  * allocation), so the remaining cost is irreducible pattern scanning.
  */
object LangIdProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions
      .withMaster(SparkSession.builder(), cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~40 words/doc, one third drawn from real stopword lists (match
    // work), the rest synthetic (scan work) — deterministic from id
    val pool = TextAnalysis.stopwords.flatMap(_._2.take(8))
    val poolArr = pool.map(w => s"'$w'").mkString("array(", ",", ")")
    val df = spark.range(0, 250000, 1, 32)
      .select(col("id").as("doc_id"),
        expr("array_join(transform(sequence(0, 39), j -> " +
          s"IF(j % 3 = 0, element_at($poolArr, " +
          s"cast(pmod(id * 31 + j * 7, ${pool.length}) as int) + 1), " +
          "concat('w', pmod(id * 31 + j * 7, 997)))), ' ')").as("text"))

    val full = df.select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("lid"))
    // identical regex work, no HOF: sum of all 21 scores
    val scoresOnly = df.select(col("doc_id"),
      TextAnalysis.stopwords.sortBy(_._1)
        .map { case (_, words) =>
          TextAnalysis.stopwordHits(col("text"), words)
        }.reduce(_ + _).as("s"))

    for ((name, d) <- Seq("full" -> full, "scores" -> scoresOnly);
        i <- 1 to 3) {
      val t0 = System.nanoTime()
      d.queryExecution.toRdd.count()
      println(f"langid $name%-6s pass $i: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
