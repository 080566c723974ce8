package graft.render

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `generate_semantic_types` golden output (`umls2rdf.py:153-189`): STY
  * class terms, STN-derived subclass edges (C11/J13), owl:Thing roots.
  */
class SemanticTypesSpec extends AnyFunSuite {

  private val U = "http://purl.bioontology.org/ontology/STY/"

  private lazy val mrsty = TestSpark.mkTable("MRSTY", Seq(
    Map("CUI" -> "C1", "TUI" -> "T001", "STN" -> "A1", "STY" -> "Entity"),
    Map("CUI" -> "C2", "TUI" -> "T002", "STN" -> "A1.1",
      "STY" -> "Physical Object"),
    // Duplicate CUI row — P1 DISTINCT must collapse it.
    Map("CUI" -> "C9", "TUI" -> "T002", "STN" -> "A1.1",
      "STY" -> "Physical Object"),
    Map("CUI" -> "C3", "TUI" -> "T003", "STN" -> "B1", "STY" -> "Event")))

  test("edges derive parents from the STN tree number") {
    val es = SemanticTypes.edges(mrsty).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(es == Set(("T002", "T001")))
  }

  test("golden TTL with roots") {
    val expected =
      s"""<${U}T001> a owl:Class ;
	skos:notation "T001"^^xsd:string ;
	skos:prefLabel "Entity"@en .

<${U}T002> a owl:Class ;
	skos:notation "T002"^^xsd:string ;
	skos:prefLabel "Physical Object"@en .

<${U}T003> a owl:Class ;
	skos:notation "T003"^^xsd:string ;
	skos:prefLabel "Event"@en .

<${U}T001> rdfs:subClassOf owl:Thing .
<${U}T002> rdfs:subClassOf <${U}T001> .
<${U}T003> rdfs:subClassOf owl:Thing ."""
    assert(SemanticTypes.generate(mrsty, U, withRoots = true) == expected)
  }

  test("rootless variant omits owl:Thing lines only") {
    val ttl = SemanticTypes.generate(mrsty, U, withRoots = false)
    assert(!ttl.contains("owl:Thing"))
    assert(ttl.contains(s"<${U}T002> rdfs:subClassOf <${U}T001> ."))
  }
}
