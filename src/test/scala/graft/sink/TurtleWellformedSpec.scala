package graft.sink

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.OntologyJob
import graft.render.SemanticTypes

/** General Turtle well-formedness over arbitrary exports — the S8 spirit
  * (`checkOutputSyntax.sh:27-33` runs `rapper -i turtle -c` on every
  * produced file). The golden specs pin exact bytes for fixed fixtures;
  * this spec drives the writer with RANDOMIZED hostile content (quotes,
  * backslashes, newlines, unicode, Turtle metacharacters in labels,
  * definitions, attributes, and codes) and requires the output to parse
  * under the strict [[TurtleValidator]]. Also proves the validator has
  * teeth: corrupted documents must be rejected.
  */
class TurtleWellformedSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def export(seed: Int): String = {
    val dir = Files.createTempDirectory(s"graft-ttl-rnd$seed").toString
    // Shared hostile generator (graft.HostileUmls) — the SAME fixtures
    // are byte-diffed against the reference renderer in
    // ReferenceDifferentialSpec.
    val fixture = graft.HostileUmls.randomFixture(seed)
    val docs = graft.assemble.PropertyDocs.collectMap(fixture("MRDOC"))
    val semTypes = SemanticTypes.generate(fixture("MRSTY"),
      "http://purl.bioontology.org/ontology/STY/", withRoots = false)
    OntologyWriter.write(spark, TestSpark.fixedSource(fixture),
      OntologyJob("RND", None, "RND.ttl", loadOnCuis = false),
      UmlsExportConfig(umlsVersion = "2025AB"),
      s"$dir/RND.ttl", docs, semTypes)
    new String(Files.readAllBytes(Paths.get(s"$dir/RND.ttl")),
      StandardCharsets.UTF_8)
  }

  test("randomized hostile-content exports are well-formed Turtle") {
    for (seed <- 1 to 3) {
      val ttl = export(seed)
      assert(ttl.nonEmpty)
      val errs = TurtleValidator.validate(ttl)
      val context = errs.take(3).map { v =>
        val lines = ttl.split("\n", -1)
        val from = math.max(0, v.line - 3)
        s"$v\n  | " + lines.slice(from, v.line + 2).mkString("\n  | ")
      }.mkString("\n")
      assert(errs.isEmpty, s"seed $seed:\n$context")
    }
  }

  test("the golden exports are well-formed Turtle") {
    for (name <- Seq("fix.ttl", "cfx.ttl", "msh.ttl",
        "umls_semantictypes.ttl")) {
      val ttl = new String(Files.readAllBytes(
        Paths.get(s"src/test/resources/golden/$name")),
        StandardCharsets.UTF_8)
      val errs = TurtleValidator.validate(ttl)
      assert(errs.isEmpty, s"$name: ${errs.take(5).mkString("; ")}")
    }
  }

  test("the validator rejects malformed documents") {
    val good = "@prefix skos: <http://x/> .\n" +
      "<http://x/a> a skos:Concept ;\n" +
      "\tskos:prefLabel \"\"\"ok\"\"\"@en ;\n .\n"
    assert(TurtleValidator.validate(good).isEmpty)
    val broken = Seq(
      good.replace(" .\n", " \n"),                    // missing terminator
      good.replace("\"\"\"ok\"\"\"", "\"\"\"ok\"\""), // unterminated literal
      good.replace("skos:prefLabel", "skoz:prefLabel"), // undeclared prefix
      good.replace("<http://x/a>", "<http://x /a>"),  // space inside IRI
      good.replace("@prefix skos: <http://x/> .\n", ""), // all prefixes undecl.
      good + "<http://x/b> ;\n .\n",                  // verb missing
      good.replace("\"\"\"ok\"\"\"", "\"o\\qk\""))    // illegal escape
    for ((doc, k) <- broken.zipWithIndex)
      assert(TurtleValidator.validate(doc).nonEmpty, s"case $k accepted:\n$doc")
  }
}
