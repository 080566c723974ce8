package graft.tools

import java.nio.file.Files

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** Synthetic-history coverage of `tools/diff_history.py`'s
  * lockstep-degradation discriminator (r16 verdict #5): ALL streaming
  * rate legs moving together — including the stateless tokenize leg,
  * which has no state to accrete — is host-window noise and must
  * classify `environment_lockstep` without failing the gate; one leg
  * moving alone is `engine_suspect` and must flag. The r16 adjudication
  * derived this by hand from BENCH_NOTES; this pins the tool doing it.
  * Also pins the r16 ADVICE #4 argument-parsing fixes (numeric first
  * arg = idxA with a defaulted path; out-of-range = usage, not a bare
  * IndexError).
  */
class DiffHistorySpec extends AnyFunSuite {

  private def entry(rates: Map[String, Double], load: Double,
      queries: Map[String, Double] = Map.empty,
      quality: String = ""): String = {
    val s = rates.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    val qs = queries.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    val wq = if (quality.isEmpty) "" else s""""window_quality":"$quality","""
    s"""{"wall_start":"t",$wq"total_sec":100,"load_avg_start":$load,""" +
      s""""load_avg_end":$load,"queries":{$qs},"streaming":{$s}}"""
  }

  private val quiet = Map(
    "sessionize_events_per_sec" -> 1500000.0,
    "windowed_dedup_events_per_sec" -> 1600000.0,
    "tokenize_wordpiece_events_per_sec" -> 5000000.0,
    "ivf_assign_events_per_sec" -> 44000.0)

  private def run(lines: Seq[String], args: String*): (Int, String) = {
    val f = Files.createTempFile("graft-hist", ".jsonl")
    Files.writeString(f, lines.mkString("", "\n", "\n"))
    val out = new StringBuilder
    val logger = ProcessLogger(l => out.append(l).append('\n'),
      l => out.append(l).append('\n'))
    val cmd = Seq("python3", "tools/diff_history.py", f.toString) ++ args
    val rc = Process(cmd, new java.io.File(".")).!(logger)
    Files.deleteIfExists(f)
    (rc, out.toString)
  }

  test("all four legs degrading together (incl. the stateless tokenize " +
      "leg) classifies environment_lockstep and does NOT flag") {
    val noisy = quiet.map { case (k, v) => k -> v / 3.2 }
    val (rc, out) = run(Seq(entry(quiet, 1.0), entry(noisy, 7.1)))
    assert(out.contains("environment_lockstep"), out)
    assert(out.contains("0 flagged"), out)
    assert(rc === 0, out)
  }

  test("one leg collapsing while the others hold classifies " +
      "engine_suspect and flags (exit 1)") {
    val regressed = quiet.updated("windowed_dedup_events_per_sec", 300000.0)
    val (rc, out) = run(Seq(entry(quiet, 1.0), entry(regressed, 1.0)))
    assert(out.contains("engine_suspect"), out)
    assert(out.contains("windowed_dedup_events_per_sec"), out)
    assert(out.contains("1 flagged"), out)
    assert(rc === 1, out)
  }

  test("steady rates emit no classification line") {
    val (rc, out) = run(Seq(entry(quiet, 1.0),
      entry(quiet.map { case (k, v) => k -> v * 1.05 }, 1.0)))
    assert(!out.contains("CLASS"), out)
    assert(rc === 0, out)
  }

  test("a wall move against a DEGRADED window prints as a note, not a " +
      "flag; the same move between quiet windows flags (r16 verdict #3)") {
    val qs0 = Map("q83_token_budget" -> 3.1)
    val qs1 = Map("q83_token_budget" -> 7.9)
    val (rcDeg, outDeg) = run(Seq(entry(quiet, 1.0, qs0, "quiet"),
      entry(quiet, 7.0, qs1, "degraded")))
    assert(outDeg.contains("degraded window"), outDeg)
    assert(rcDeg === 0, outDeg)
    val (rcQ, outQ) = run(Seq(entry(quiet, 1.0, qs0, "quiet"),
      entry(quiet, 1.0, qs1, "quiet")))
    assert(outQ.contains("WALL"), outQ)
    assert(rcQ === 1, outQ)
  }

  test("explicit in-range indices work; out-of-range and a lone index " +
      "exit with a usage message instead of a stack trace") {
    val lines = Seq(entry(quiet, 1.0), entry(quiet, 1.0),
      entry(quiet.map { case (k, v) => k -> v / 3 }, 7.0))
    val (rc01, out01) = run(lines, "0", "1")
    assert(rc01 === 0 && out01.contains("0 flagged"), out01)
    val (rcOor, outOor) = run(lines, "0", "7")
    assert(rcOor === 1 && outOor.contains("out of range"), outOor)
    assert(!outOor.contains("Traceback"), outOor)
    val (rcOne, outOne) = run(lines, "2")
    assert(rcOne === 1 && outOne.contains("usage"), outOne)
  }
}
