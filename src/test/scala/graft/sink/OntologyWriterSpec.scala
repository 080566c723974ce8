package graft.sink

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.OntologyJob
import graft.render.SemanticTypes

/** End-to-end file export over an in-memory fixture: header metadata (port
  * of `tests/test_umls2rdf.py:352-376`), term rendering, property block
  * (J10/C8-C10), semantic-types append, per-term error tolerance (S6).
  */
class OntologyWriterSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def conso(cui: String, aui: String, code: String, str: String,
      tty: String, sab: String = "TEST"): Map[String, String] =
    Map("CUI" -> cui, "LAT" -> "ENG", "AUI" -> aui, "SAB" -> sab,
      "TTY" -> tty, "CODE" -> code, "STR" -> str, "SUPPRESS" -> "N")

  private val fixture = Map(
    "MRCONSO" -> TestSpark.mkTable("MRCONSO", Seq(
      conso("CUI_SOURCE", "AUI_SOURCE", "CODE1", "Source preferred", "PT"),
      conso("CUI_TARGET", "AUI_TARGET", "CODE2", "Target preferred", "PT"),
      conso("CUI_SELF", "AUI_SELF", "CODE1", "Source synonym", "SY"),
      // Single atom with no 'P' TTY and empty MRRANK -> prefLabel raises;
      // exercises the S6 per-term catch-and-continue path.
      conso("CUI_BAD", "AUI_BAD", "CODE3", "Unlabelable", "SY"))),
    "MRREL" -> TestSpark.mkTable("MRREL", Seq(
      Map("CUI1" -> "CUI_TARGET", "AUI1" -> "AUI_TARGET",
        "CUI2" -> "CUI_SOURCE", "AUI2" -> "AUI_SOURCE",
        "REL" -> "RO", "RELA" -> "mappedTo", "SAB" -> "TEST",
        "SUPPRESS" -> "N"))),
    "MRDEF" -> TestSpark.mkTable("MRDEF", Seq(
      Map("CUI" -> "CUI_SOURCE", "AUI" -> "AUI_SOURCE", "SAB" -> "TEST",
        "DEF" -> "A definition"))),
    "MRSAT" -> TestSpark.mkTable("MRSAT", Seq(
      Map("CUI" -> "CUI_SOURCE", "CODE" -> "CODE1", "ATN" -> "TH",
        "ATV" -> "NLM (1994)", "SAB" -> "TEST"),
      Map("CUI" -> "CUI_SOURCE", "CODE" -> "CODE1", "ATN" -> "AQ",
        "ATV" -> "skipme", "SAB" -> "TEST"))),
    "MRSTY" -> TestSpark.mkTable("MRSTY", Seq(
      Map("CUI" -> "CUI_SOURCE", "TUI" -> "T001", "STN" -> "A1",
        "STY" -> "Entity"),
      Map("CUI" -> "CUI_TARGET", "TUI" -> "T002", "STN" -> "A1.1",
        "STY" -> "Physical Object"))),
    "MRSAB" -> TestSpark.mkTable("MRSAB", Seq(
      Map("RSAB" -> "TEST", "VSAB" -> "TEST2025", "CURVER" -> "Y",
        "SVER" -> "2025-test-version", "IMETA" -> "2025AB",
        "SSN" -> "Test Ontology Title", "LAT" -> "ENG"),
      // Non-current older row: F9 must prefer CURVER='Y'.
      Map("RSAB" -> "TEST", "VSAB" -> "TEST2024", "CURVER" -> "N",
        "SVER" -> "2024-old", "IMETA" -> "2024AB",
        "SSN" -> "Old Title", "LAT" -> "ENG"))),
    "MRDOC" -> TestSpark.mkTable("MRDOC", Seq(
      Map("DOCKEY" -> "RELA", "VALUE" -> "mappedTo",
        "TYPE" -> "expanded_form", "EXPL" -> "Mapped to"),
      Map("DOCKEY" -> "RELA", "VALUE" -> "mappedTo",
        "TYPE" -> "rela_inverse", "EXPL" -> "mapped_from"),
      Map("DOCKEY" -> "ATN", "VALUE" -> "TH",
        "TYPE" -> "expanded_form", "EXPL" -> "Thesaurus ID"))))

  private def export(dir: String): (WriteReport, String) = {
    val source = TestSpark.fixedSource(fixture)
    val docs = graft.assemble.PropertyDocs.collectMap(fixture("MRDOC"))
    val semTypes = SemanticTypes.generate(fixture("MRSTY"),
      "http://purl.bioontology.org/ontology/STY/", withRoots = false)
    val report = OntologyWriter.write(spark, source,
      OntologyJob("TEST", None, "TEST.ttl", loadOnCuis = false),
      UmlsExportConfig(umlsVersion = "2025AB"),
      s"$dir/TEST.ttl", docs, semTypes)
    val text = new String(
      Files.readAllBytes(Paths.get(s"$dir/TEST.ttl")), StandardCharsets.UTF_8)
    (report, text)
  }

  private lazy val (report, ttl) = {
    val dir = Files.createTempDirectory("graft-ttl").toString
    export(dir)
  }

  test("writes ontology header metadata from the preferred MRSAB record") {
    assert(ttl.contains("<http://purl.bioontology.org/ontology/TEST/>"))
    assert(ttl.contains("rdfs:label \"Test Ontology Title\" ;"))
    assert(ttl.contains("owl:versionInfo \"2025-test-version\" ;"))
    assert(ttl.contains("dcterms:source \"UMLS 2025AB\""))
    assert(ttl.contains("skos:altLabel \"TEST\" ."))
    assert(ttl.startsWith("\n@prefix skos:"))
    assert(!ttl.contains("2024-old")) // F9: CURVER='Y' row wins
  }

  test("renders terms with labels, definitions, rels, atts, cui/tui lines") {
    assert(ttl.contains(
      "<http://purl.bioontology.org/ontology/TEST/CODE1> a owl:Class ;"))
    assert(ttl.contains("skos:prefLabel \"\"\"Source preferred\"\"\"@en ;"))
    assert(ttl.contains("skos:altLabel \"\"\"Source synonym\"\"\"@en ;"))
    assert(ttl.contains("skos:definition \"\"\"A definition\"\"\"@en ;"))
    assert(ttl.contains(
      "<http://purl.bioontology.org/ontology/TEST/mappedTo> " +
        "<http://purl.bioontology.org/ontology/TEST/CODE2> ;"))
    assert(ttl.contains(
      "<http://purl.bioontology.org/ontology/TEST/TH> " +
        "\"\"\"NLM (1994)\"\"\"^^xsd:string ;"))
    assert(!ttl.contains("skipme")) // F13: AQ attribute skipped
    assert(ttl.contains("umls:cui \"\"\"CUI_SOURCE\"\"\"^^xsd:string ;"))
    assert(ttl.contains("umls:tui \"\"\"T001\"\"\"^^xsd:string ;"))
    // Terms come out in code order.
    assert(ttl.indexOf("/TEST/CODE1> a owl:Class") <
      ttl.indexOf("/TEST/CODE2> a owl:Class"))
  }

  test("one unrenderable term is counted, not fatal (S6)") {
    assert(report.terms == 2)
    assert(report.errors == 1)
    assert(!ttl.contains("CODE3"))
  }

  test("property block renders accumulated predicates with MRDOC docs") {
    assert(ttl.contains("umls:hasSTY a owl:ObjectProperty ;"))
    // C10: inverse type overrides the description.
    assert(ttl.contains(
      "<http://purl.bioontology.org/ontology/TEST/mappedTo> a owl:ObjectProperty ;"))
    assert(ttl.contains("rdfs:comment \"\"\"Inverse of mapped_from\"\"\""))
    // C8: short description becomes the label.
    assert(ttl.contains(
      "<http://purl.bioontology.org/ontology/TEST/TH> a owl:DatatypeProperty ;"))
    assert(ttl.contains("rdfs:label \"\"\"Thesaurus ID\"\"\";"))
  }

  test("appends the rootless semantic-types block") {
    assert(ttl.contains(
      "<http://purl.bioontology.org/ontology/STY/T001> a owl:Class ;"))
    assert(ttl.contains(
      "<http://purl.bioontology.org/ontology/STY/T002> rdfs:subClassOf " +
        "<http://purl.bioontology.org/ontology/STY/T001> ."))
    // withRoots=false: no owl:Thing root for T001 in the appended block.
    assert(!ttl.contains(
      "<http://purl.bioontology.org/ontology/STY/T001> rdfs:subClassOf owl:Thing ."))
  }

  test("version gate skips a non-current ontology (F18)") {
    val dir = Files.createTempDirectory("graft-ttl2").toString
    val source = TestSpark.fixedSource(fixture)
    val r = OntologyWriter.write(spark, source,
      OntologyJob("TEST", None, "TEST.ttl", loadOnCuis = false),
      UmlsExportConfig(umlsVersion = "2026AA",
        processOnlyCurrentVersion = true),
      s"$dir/TEST.ttl", Map.empty, "")
    assert(r.skipped)
    assert(!Files.exists(Paths.get(s"$dir/TEST.ttl")))
  }

  test("an MSH export with a ZERO-EDGE tree renders tree-less " +
    "(truthiness parity with the reference's `if tree:`)") {
    // The reference's tree checks are truthiness tests
    // (`umls2rdf.py:411,422,437`): an MSH export whose D-tree query
    // returns no edges must not apply the tree rules — in particular the
    // F14 MN-root rule (MN att without '.' -> owl:Thing subclass) must NOT
    // fire. hasTree is therefore derived from tree non-emptiness, not from
    // sab == "MSH".
    def mshFixture(rel: Map[String, String]) = Map(
      "MRCONSO" -> TestSpark.mkTable("MRCONSO", Seq(
        conso("CM1", "AM1", "D000001", "MeSH Parent", "MH", "MSH"),
        conso("CM2", "AM2", "D000002", "MeSH Child", "MH", "MSH"))),
      "MRREL" -> TestSpark.mkTable("MRREL", Seq(rel)),
      "MRRANK" -> TestSpark.mkTable("MRRANK", Seq(
        Map("RANK" -> "0500", "SAB" -> "MSH", "TTY" -> "MH",
          "SUPPRESS" -> "N"))),
      "MRSAT" -> TestSpark.mkTable("MRSAT", Seq(
        // MN without '.' on a D-code: fires the F14 owl:Thing rule IFF the
        // export has a tree.
        Map("CUI" -> "CM2", "CODE" -> "D000002", "ATN" -> "MN",
          "ATV" -> "D1", "SAB" -> "MSH"))),
      "MRSAB" -> TestSpark.mkTable("MRSAB", Seq(
        Map("RSAB" -> "MSH", "VSAB" -> "MSH2025", "CURVER" -> "Y",
          "LAT" -> "ENG"))),
      "MRDOC" -> TestSpark.mkTable("MRDOC", Seq(
        Map("DOCKEY" -> "ATN", "VALUE" -> "MN", "TYPE" -> "expanded_form",
          "EXPL" -> "MeSH tree number"),
        Map("DOCKEY" -> "REL", "VALUE" -> "CHD", "TYPE" -> "expanded_form",
          "EXPL" -> "has child"),
        Map("DOCKEY" -> "REL", "VALUE" -> "RO", "TYPE" -> "expanded_form",
          "EXPL" -> "related to"))))
    def exportMsh(rel: Map[String, String]): String = {
      val dir = Files.createTempDirectory("graft-msh-tree").toString
      val fx = mshFixture(rel)
      OntologyWriter.write(spark, TestSpark.fixedSource(fx),
        OntologyJob("MSH", None, "MSH.ttl", loadOnCuis = false),
        UmlsExportConfig(umlsVersion = "2025AB"), s"$dir/MSH.ttl",
        graft.assemble.PropertyDocs.collectMap(fx("MRDOC")), "")
      new String(Files.readAllBytes(Paths.get(s"$dir/MSH.ttl")),
        StandardCharsets.UTF_8)
    }
    val chd = Map("CUI1" -> "CM1", "AUI1" -> "AM1", "CUI2" -> "CM2",
      "AUI2" -> "AM2", "REL" -> "CHD", "SAB" -> "MSH", "SUPPRESS" -> "N")
    val ro = chd + ("REL" -> "RO")

    // CHD edge -> non-empty D-tree: MN rule fires, tree parent emitted.
    val withTree = exportMsh(chd)
    assert(withTree.contains("rdfs:subClassOf owl:Thing"))
    assert(withTree.contains(
      "rdfs:subClassOf <http://purl.bioontology.org/ontology/MSH/D000001>"))

    // RO edge only -> the D-tree query returns zero edges: the export
    // behaves tree-less exactly like the reference — no MN owl:Thing, no
    // tree subclass; the MN literal itself still renders.
    val noTree = exportMsh(ro)
    assert(!noTree.contains("owl:Thing"))
    assert(!noTree.contains("rdfs:subClassOf"))
    assert(noTree.contains("MN> \"\"\"D1\"\"\""))
  }

  test("balanced turtle blocks: terms and STY classes are all present") {
    def countOf(needle: String): Int =
      ttl.sliding(needle.length).count(_ == needle)
    // CODE1 + CODE2 terms plus the two appended STY classes.
    assert(countOf("a owl:Class ;") == 4)
    assert(countOf(" .\n\n") >= 2) // each concept term closes the block
  }

  test("single-render distributed export: the render map materializes " +
    "in ONE execution and the write pass re-reads the checkpoint " +
    "(metadata collects aside) — r10 pin, updated r20") {
    // The r9 single-pass rewrite's claim, now CI-asserted: counters /
    // errors / properties ride accumulators on the write job — no
    // extra aggregation actions over the rendered terms. Since r20 the
    // export issues exactly FIVE SQL executions: three bounded
    // metadata collects (MRSAB record, SRC cui_roots, MRRANK map), the
    // ONE materialization of the rendered terms (Materialize.cut —
    // before r20 the write's range-sort sampled its LIVE child, so the
    // assemble+finish+render subtree executed TWICE inside the write
    // execution; ProfileExport counted 40k render calls for 20k terms),
    // and the write action over the checkpointed flat rows (AQE may
    // split an execution into several jobs; they share an execution
    // id). A regression that re-renders per action would count 6+.
    // Jobs are filtered by a dedicated job group so concurrently-
    // running suites can't pollute the count.
    val group = "graft-export-pin"
    val execIds = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val props = js.properties
        if (props != null &&
            group == props.getProperty("spark.jobGroup.id")) {
          val id = props.getProperty("spark.sql.execution.id")
          execIds.add(if (id == null) s"no-exec-${js.jobId}" else id)
          ()
        }
      }
    }
    val docs = graft.assemble.PropertyDocs.collectMap(fixture("MRDOC"))
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup(group, "export single-pass pin")
      val dir = Files.createTempDirectory("graft-ttl-pin").toString
      val rep = OntologyWriter.write(spark, TestSpark.fixedSource(fixture),
        OntologyJob("TEST", None, "TEST.ttl", loadOnCuis = false),
        UmlsExportConfig(umlsVersion = "2025AB", distributedWrite = true),
        s"$dir/TEST.ttl", docs, "")
      assert(rep.terms === 2L)
      // listener events are posted asynchronously; give them a beat
      Thread.sleep(1500)
      assert(execIds.size === 5,
        s"distributed export issued ${execIds.size} SQL executions " +
          s"(expected 5: MRSAB + cui_roots + MRRANK metadata collects " +
          s"+ the one render materialization + the write pass): $execIds")
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("CappedErrorAccumulator: bounded kept set, exact total, across " +
    "add / merge / copy / a real distributed job") {
    val acc = new CappedErrorAccumulator(10)
    (1 to 2500).foreach(i => acc.add((s"C$i", "boom")))
    val (kept, total) = acc.value
    assert(kept.size === 10)
    assert(total === 2500L)
    // merge past the cap keeps the bound and sums the counts
    val other = new CappedErrorAccumulator(10)
    (1 to 7).foreach(i => other.add((s"D$i", "bang")))
    acc.merge(other)
    assert(acc.value._1.size === 10)
    assert(acc.value._2 === 2507L)
    val copied = acc.copy()
    assert(copied.value._1.size === 10 && copied.value._2 === 2507L)
    copied.reset()
    assert(copied.isZero && copied.value._1.isEmpty)
    // through real tasks: every row adds, driver sees bounded kept +
    // exact count after the executor-side merges
    val jobAcc = new CappedErrorAccumulator(25)
    spark.sparkContext.register(jobAcc, "test.errCap")
    spark.range(0, 5000, 1, 8).toDF("id").foreach(
      r => jobAcc.add((s"R${r.getLong(0)}", "err")))
    assert(jobAcc.value._1.size === 25)
    assert(jobAcc.value._2 === 5000L)
  }

  test("mass render failure: errors past the log cap stay exactly " +
    "counted and the export still writes (distributed S6)") {
    // 1200 single-atom SY-only codes -> every one raises in prefLabel
    // (no 'P' TTY, empty MRRANK) -> 1200 error rows, 200 past the
    // ErrorLogCap of 1000; plus one good PT term.
    val bad = (1 to 1200).map(i =>
      conso(s"CUI_B$i", s"AUI_B$i", f"BAD$i%04d", s"Unlabelable $i", "SY"))
    val good = conso("CUI_G", "AUI_G", "GOOD1", "Good label", "PT")
    val massFixture = Map(
      "MRCONSO" -> TestSpark.mkTable("MRCONSO", bad :+ good),
      "MRSAB" -> fixture("MRSAB"))
    val dir = Files.createTempDirectory("graft-ttl-mass").toString
    val rep = OntologyWriter.write(spark,
      TestSpark.fixedSource(massFixture),
      OntologyJob("TEST", None, "TEST.ttl", loadOnCuis = false),
      UmlsExportConfig(umlsVersion = "2025AB", distributedWrite = true),
      s"$dir/TEST.ttl", Map.empty, "")
    assert(rep.errors === 1200L)
    assert(rep.terms === 1L)
    val text = new String(Files.readAllBytes(Paths.get(s"$dir/TEST.ttl")),
      StandardCharsets.UTF_8)
    assert(text.contains("/TEST/GOOD1> a owl:Class"))
    assert(!text.contains("BAD0001"))
  }
}
