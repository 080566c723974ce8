package graft.render

import graft.assemble.{MrsabRecord, PropertyDoc}
import graft.functions.TurtleFunctions.{escape, prettyLabel, turtleString}
import graft.model.TermProperty

/** File-level render pieces: prefix block, ontology header (C13/C14) and
  * the property block (C8-C10/J10/A15) — `umls2rdf.py:21-39,492-532,
  * 745-762,801-820`.
  */
object OntologyRender {

  /** `PREFIXES` (`umls2rdf.py:21-28`) — byte-identical. */
  val Prefixes: String = """
@prefix skos: <http://www.w3.org/2004/02/skos/core#> .
@prefix owl:  <http://www.w3.org/2002/07/owl#> .
@prefix rdfs:  <http://www.w3.org/2000/01/rdf-schema#> .
@prefix dcterms: <http://purl.org/dc/terms/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix umls: <http://bioportal.bioontology.org/ontologies/umls/> .
"""

  /** `ONTOLOGY_HEADER` template (C13, `umls2rdf.py:30-39`) filled with the
    * MRSAB coalescers (C14, `umls2rdf.py:563-584,751-762`). */
  def header(uri: String, ontCode: String, rec: MrsabRecord,
      confVersion: String): String = {
    val comment = "RDF Version of the UMLS ontology " + ontCode +
      "; converted with the UMLS2RDF tool " +
      "(https://github.com/ncbo/umls2rdf), developed by the NCBO project."
    val altLabelLine = rec.altLabel match {
      case Some(alt) => " ;\n    skos:altLabel " + turtleString(alt)
      case None => ""
    }
    s"""
<$uri>
    a owl:Ontology ;
    rdfs:comment ${turtleString(comment)} ;
    rdfs:label ${turtleString(rec.label(ontCode))} ;
    owl:imports <http://www.w3.org/2004/02/skos/core> ;
    owl:versionInfo ${turtleString(rec.version(confVersion))} ;
    dcterms:source ${turtleString(rec.source(confVersion))}$altLabelLine .

"""
  }

  /** `UmlsAttribute.toRDF` (`umls2rdf.py:511-532`): property-type
    * classification (C9 — raises on unknown dockey) + label prettify (C8).
    * DELIBERATE deviation: the reference emits the label UNESCAPED
    * (`umls2rdf.py:528` interpolates it raw) and relies on the
    * downstream `rapper -c` pass to reject the corrupted file when an
    * MRDOC EXPL contains a quote — so on such input the reference
    * produces NO valid output at all. We escape the label like the
    * comment (caught by the randomized TurtleWellformedSpec): byte-equal
    * on every input the reference can actually export (real MRDOC labels
    * contain no quotes/backslashes — the goldens are unchanged), valid
    * Turtle on the inputs where the reference corrupts its file. */
  def property(uri: String, att: String, dockey: String, desc: String)
      : String = {
    val typ =
      if (dockey.contains("REL")) "ObjectProperty"
      else if (dockey == "ATN") "DatatypeProperty"
      else throw new IllegalStateException("Unknown DOCKEY" + dockey)
    val label = prettyLabel(att, desc)
    s"""<$uri> a owl:$typ ;
	rdfs:label \"\"\"${escape(label)}\"\"\";
	rdfs:comment \"\"\"${escape(desc)}\"\"\" .

"""
  }

  /** `UmlsAttribute.toRDFWithDesc` (`umls2rdf.py:502-509`): used for the
    * qname-subject hasSTY property; preserves the reference's odd
    * space+tab indentation — INCLUDING the trailing four-space line
    * (`    \n`) its template ends with instead of a blank line. r14:
    * the whole-file differential caught the engine normalizing that
    * tail to a plain blank line; byte parity restored (the reference
    * emits it in every exported file). */
  def propertyWithDesc(uri: String, label: String, desc: String,
      typ: String): String = {
    val subject = if (uri.startsWith("http")) s"<$uri>" else uri
    // built with explicit escapes: the tail is "    \n", which any
    // trailing-whitespace-stripping editor would silently corrupt in a
    // triple-quoted literal
    s"$subject a owl:$typ ;\n" +
      "    \trdfs:label \"\"\"" + escape(label) + "\"\"\";\n" +
      "    \trdfs:comment \"\"\"" + escape(desc) + "\"\"\" .\n" +
      "    \n"
  }

  /** `write_properties` (`umls2rdf.py:801-820`): the accumulated
    * predicates joined to their MRDOC docs (J10), with the C10 inverse
    * description rule. Properties are emitted sorted by URI (the
    * reference's dict order follows term emission order — unreproducible
    * distributed; intra-entry bytes are reference-equal). */
  def propertyBlock(props: Seq[TermProperty],
      docs: Map[String, PropertyDoc]): String = {
    val sb = new StringBuilder
    sb.append(propertyWithDesc("umls:hasSTY",
      "Semantic type UMLS property", "Semantic type UMLS property",
      "ObjectProperty"))
    props.sortBy(_.uri).foreach { p =>
      val doc = docs.getOrElse(p.att, throw new IllegalStateException(
        s"no MRDOC documentation for property ${p.att}"))
      // expanded_form is mandatory even when inverse overrides it
      // (`umls2rdf.py:813-817`).
      val expanded = doc.expandedForm.getOrElse(
        throw new IllegalStateException("expanded form not found in " + p.att))
      val desc = doc.inverse.map("Inverse of " + _).getOrElse(expanded)
      sb.append(property(p.uri, p.att, doc.dockey, desc))
    }
    sb.toString
  }
}
