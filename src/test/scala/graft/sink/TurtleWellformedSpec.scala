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

  // Deterministic "random" content: seeded generator, hostile alphabet.
  private val Hostile: IndexedSeq[String] = IndexedSeq(
    "\"", "\\", "\n", "'", "<", ">", "{", "}", "|", "^", "`", "é", "≈",
    "\t", "@", ";", ",", ".", "#", "\"\"\"", "a b", "100%", "x\\ny")

  private def randString(rnd: scala.util.Random, n: Int): String =
    (0 until n).map { _ =>
      if (rnd.nextInt(3) == 0) Hostile(rnd.nextInt(Hostile.length))
      else ('a' + rnd.nextInt(26)).toChar.toString
    }.mkString

  private def conso(cui: String, aui: String, code: String, str: String,
      tty: String): Map[String, String] =
    Map("CUI" -> cui, "LAT" -> "ENG", "AUI" -> aui, "SAB" -> "RND",
      "TTY" -> tty, "CODE" -> code, "STR" -> str, "SUPPRESS" -> "N")

  private def randomFixture(seed: Int): Map[String,
      org.apache.spark.sql.DataFrame] = {
    val rnd = new scala.util.Random(seed)
    // codes stay IRI-safe-ish but include chars the percent-encoder must
    // handle (space, unicode, slash)
    def code(i: Int) = s"K$i" + Seq("", " x", "é", "/sub", "%7e")(
      rnd.nextInt(5))
    val codes = (1 to 6).map(code)
    val atoms = codes.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        conso(s"C$i", s"A${i}p", c, randString(rnd, 8 + rnd.nextInt(10)),
          "PT"),
        conso(s"C$i", s"A${i}s", c, randString(rnd, 5 + rnd.nextInt(12)),
          "SY"))
    }
    val relas = (1 until codes.length).map { i =>
      if (i % 3 == 0) ""
      else "rel" + ('a' + rnd.nextInt(26)).toChar + ('a' + rnd.nextInt(26)).toChar
    }
    val rels = (1 until codes.length).map { i =>
      Map("CUI1" -> s"C$i", "AUI1" -> s"A${i}p",
        "CUI2" -> s"C${i - 1}", "AUI2" -> s"A${i - 1}p",
        "REL" -> (if (i % 2 == 0) "CHD" else "RO"),
        "RELA" -> relas(i - 1),
        "SAB" -> "RND", "SUPPRESS" -> "N")
    }
    val defs = codes.indices.filter(_ % 2 == 0).map { i =>
      Map("CUI" -> s"C$i", "AUI" -> s"A${i}p", "SAB" -> "RND",
        "DEF" -> randString(rnd, 20 + rnd.nextInt(30)))
    }
    val atts = codes.zipWithIndex.flatMap { case (c, i) =>
      if (i % 2 == 1)
        Seq(Map("CUI" -> s"C$i", "CODE" -> c,
          "ATN" -> s"AT${i % 3}", "ATV" -> randString(rnd, 6 + rnd.nextInt(20)),
          "SAB" -> "RND"))
      else Nil
    }
    val stys = codes.indices.map { i =>
      Map("CUI" -> s"C$i", "TUI" -> f"T${i + 1}%03d", "STN" -> s"A1.$i",
        "STY" -> randString(rnd, 10))
    }
    Map(
      "MRCONSO" -> TestSpark.mkTable("MRCONSO", atoms),
      "MRREL" -> TestSpark.mkTable("MRREL", rels),
      "MRDEF" -> TestSpark.mkTable("MRDEF", defs),
      "MRSAT" -> TestSpark.mkTable("MRSAT", atts),
      "MRSTY" -> TestSpark.mkTable("MRSTY", stys),
      "MRSAB" -> TestSpark.mkTable("MRSAB", Seq(
        Map("RSAB" -> "RND", "VSAB" -> "RND2025", "CURVER" -> "Y",
          "SVER" -> "v1", "IMETA" -> "2025AB",
          "SSN" -> randString(rnd, 16), "LAT" -> "ENG"))),
      "MRDOC" -> TestSpark.mkTable("MRDOC",
        // every rendered property needs MRDOC documentation (the writer
        // raises otherwise — reference parity): all ATN values used above
        // plus every generated non-empty RELA, with hostile EXPL text
        (0 until 3).map(k =>
          Map("DOCKEY" -> "ATN", "VALUE" -> s"AT$k",
            "TYPE" -> "expanded_form", "EXPL" -> randString(rnd, 12))) ++
        // empty-RELA rels fall back to the REL value as the property
        Seq(Map("DOCKEY" -> "REL", "VALUE" -> "RO",
          "TYPE" -> "expanded_form", "EXPL" -> randString(rnd, 8))) ++
        relas.filter(_.nonEmpty).distinct.flatMap(r => Seq(
          Map("DOCKEY" -> "RELA", "VALUE" -> r,
            "TYPE" -> "expanded_form", "EXPL" -> randString(rnd, 10)),
          Map("DOCKEY" -> "RELA", "VALUE" -> r,
            "TYPE" -> "rela_inverse", "EXPL" -> s"inv_$r")))))
  }

  private def export(seed: Int): String = {
    val dir = Files.createTempDirectory(s"graft-ttl-rnd$seed").toString
    val fixture = randomFixture(seed)
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
