package graft.render

import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{AttOut, RelOut, UmlsConceptRow}

/** Property-based determinism contract for the renderer (SURVEY §5.2 #3):
  * the reference pins order-invariance with two hand-picked permutations
  * (`tests/test_umls2rdf.py:209-268`); scalacheck pins it for ARBITRARY
  * permutations, plus dedup idempotence and counter consistency.
  */
class RendererPropertySpec extends AnyFunSuite {

  /** Deterministic sampling loop (the scalatest-scalacheck bridge isn't a
    * dependency; seeded pureApply keeps runs reproducible). */
  private def forAllSeeded[A](gen: Gen[A], n: Int = 100)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val cfg = RenderConfig(ns = "http://x.org/T/", lang = "en")

  private val genStr = Gen.alphaNumStr.map(_.take(12)).suchThat(_.nonEmpty)
  private val genRel = for {
    rel <- Gen.oneOf("RO", "RB", "RQ", "CHD", "PAR")
    rela <- Gen.oneOf("", "part_of", "mapped_to")
    tgt <- genStr
  } yield RelOut(rel, rela, "C" + tgt, tgt, "SELF")
  private val genAtt = for {
    atn <- Gen.oneOf("SOS", "MN", "AQ", "TH")
    atv <- genStr
  } yield AttOut(atn, atv)

  private val genConcept: Gen[UmlsConceptRow] = for {
    pref <- genStr
    alts <- Gen.listOfN(3, genStr)
    defs <- Gen.listOfN(2, genStr)
    cuis <- Gen.listOfN(2, genStr.map("C" + _))
    tuis <- Gen.listOfN(2, genStr.map("T" + _))
    atts <- Gen.listOfN(4, genAtt)
    rels <- Gen.listOfN(4, genRel)
    root <- Arbitrary.arbBool.arbitrary
  } yield UmlsConceptRow("SELF", pref,
    alts.distinct.filter(_ != pref).sorted,
    defs.distinct.sorted, cuis.distinct.sorted, tuis.distinct.sorted,
    atts, rels, root, Nil)

  test("rendered bytes are invariant under rel/att permutation") {
    forAllSeeded(Gen.zip(genConcept, Gen.long)) { case (c, seed) =>
      val rnd = new scala.util.Random(seed)
      val shuffled = c.copy(
        rels = rnd.shuffle(c.rels), atts = rnd.shuffle(c.atts))
      assert(ConceptRenderer.render(shuffled, cfg).text ===
        ConceptRenderer.render(c, cfg).text)
    }
  }

  test("dedup is idempotent: rendering deduped output reports zero dups") {
    forAllSeeded(genConcept) { c =>
      // duplicate every rel and att, render with dedup on
      val doubled = c.copy(rels = c.rels ++ c.rels, atts = c.atts ++ c.atts)
      val once = ConceptRenderer.render(doubled, cfg)
      // the deduped text must equal the single-copy render
      assert(once.text === ConceptRenderer.render(c, cfg).text)
      // and the single-copy render of distinct inputs reports no duplicates
      val clean = ConceptRenderer.render(
        c.copy(rels = c.rels.distinct, atts = c.atts.distinct), cfg)
      assert(clean.dupLiteral === 0L)
    }
  }

  test("dedup-off renders a superset: line count >= dedup-on") {
    forAllSeeded(genConcept) { c =>
      val doubled = c.copy(rels = c.rels ++ c.rels, atts = c.atts ++ c.atts)
      val on = ConceptRenderer.render(doubled, cfg)
      val off = ConceptRenderer.render(doubled, cfg.copy(dedupe = false))
      assert(off.text.linesIterator.size >= on.text.linesIterator.size)
      assert(off.dupLiteral === 0L && off.dupObject === 0L &&
        off.dupSubclass === 0L) // counters only tick when dedup is ON
    }
  }
}
