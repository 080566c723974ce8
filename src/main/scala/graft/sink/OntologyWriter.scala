package graft.sink

import java.io.{BufferedWriter, File, FileOutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets

import scala.collection.mutable
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{Encoders, SparkSession}

import graft.assemble.{ConceptAssembler, Mrsab, PropertyDoc}
import graft.functions.TurtleFunctions.mapLang
import graft.model.{OntologyJob, TermProperty}
import graft.render.{ConceptRenderer, OntologyRender, RenderConfig}
import graft.sources.UmlsSource

/** Export configuration mirroring `conf_sample.py:1-43`. */
final case class UmlsExportConfig(
    umlsVersion: String,
    baseUri: String = "http://purl.bioontology.org/ontology/",
    dedupeTriples: Boolean = true,
    includeSemanticTypes: Boolean = true,
    processOnlyCurrentVersion: Boolean = false,
    strict: Boolean = false)

/** Per-ontology write outcome: term/error counts (S6) and the duplicate-
  * triple counters (A11, `umls2rdf.py:763-787`). */
final case class WriteReport(
    sab: String, path: String, terms: Long, errors: Long,
    dupLiteral: Long, dupObject: Long, dupSubclass: Long,
    skipped: Boolean = false)

/** One rendered-or-failed term (S6, `umls2rdf.py:764-771`): exactly one of
  * `text`/`error` is set. */
private[sink] final case class RenderResult(
    code: String, text: String, dupLiteral: Long, dupObject: Long,
    dupSubclass: Long, properties: Seq[TermProperty], error: String)

/** The Turtle file sink (S5, `umls2rdf.py:745-789,888-893`): one ordered
  * UTF-8 file per ontology — prefixes, MRSAB-fed header, class terms,
  * property block, semantic types.
  *
  * Spark-first shape: assembly+render run distributed (narrow map over the
  * assembled concepts); the driver streams the ordered result through
  * `toLocalIterator` into a single file, which is the output contract (one
  * `.ttl` per SAB). Term order is `orderBy(code)` — the reference emits
  * dict-insertion order, unreproducible distributed (SURVEY.md §7.1.6);
  * intra-term bytes are reference-equal.
  */
object OntologyWriter {

  def write(
      spark: SparkSession,
      source: UmlsSource,
      job: OntologyJob,
      conf: UmlsExportConfig,
      outFile: String,
      propertyDocs: Map[String, PropertyDoc],
      semanticTypes: String): WriteReport = {

    val ns = conf.baseUri + job.altUri.getOrElse(job.sab) + "/"
    val rec = Mrsab.orEmpty(Mrsab.record(source, job.sab))

    // F18 version gate (`umls2rdf.py:881-887`).
    if (conf.processOnlyCurrentVersion && !rec.isCurrentVersion(conf.umlsVersion))
      return WriteReport(job.sab, outFile, 0, 0, 0, 0, 0, skipped = true)

    // MRSAB.LAT is mandatory (`umls2rdf.py:594-597`).
    val lat = rec.lat.getOrElse(throw new IllegalStateException(
      s"No LAT found in MRSAB for ontology ${job.sab}")).toLowerCase

    val assembler = new ConceptAssembler(spark, source, job.sab,
      loadOnCuis = job.loadOnCuis, lang = lat)
    val cfg = RenderConfig(
      ns = ns,
      lang = mapLang(lat),
      hierarchy = job.sab != "MSH", // `umls2rdf.py:889`
      hasTree = job.sab == "MSH",
      dedupe = conf.dedupeTriples,
      styUrl = conf.baseUri + "STY/")

    val rankMap = assembler.rankByTty
    val onCuis = job.loadOnCuis
    // S6 per-term error tolerance: finish+render under Try so one bad term
    // cannot sink the file; failures surface as counted error rows.
    val rendered = assembler.assembled(conf.strict).map { raw =>
      Try(ConceptRenderer.render(
          ConceptAssembler.finish(raw, rankMap, onCuis), cfg)) match {
        case Success(t) =>
          RenderResult(t.code, t.text, t.dupLiteral, t.dupObject,
            t.dupSubclass, t.properties, null)
        case Failure(e) =>
          RenderResult(raw.code, null, 0, 0, 0, Nil,
            s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }(Encoders.product[RenderResult])

    val parent = new File(outFile).getParentFile
    if (parent != null) parent.mkdirs()
    val out = new BufferedWriter(new OutputStreamWriter(
      new FileOutputStream(outFile), StandardCharsets.UTF_8), 1 << 20)
    var terms = 0L; var errors = 0L
    var dupL = 0L; var dupO = 0L; var dupS = 0L
    val props = mutable.LinkedHashMap.empty[String, String]
    try {
      out.write(OntologyRender.Prefixes)
      out.write(OntologyRender.header(ns, job.sab, rec, conf.umlsVersion))
      val it = rendered.orderBy("code").toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        if (r.error != null) {
          errors += 1
          System.err.println(s"ERROR dumping term ${r.code}: ${r.error}")
        } else {
          out.write(r.text)
          terms += 1
          dupL += r.dupLiteral; dupO += r.dupObject; dupS += r.dupSubclass
          r.properties.foreach(p =>
            if (!props.contains(p.uri)) props(p.uri) = p.att)
        }
      }
      out.write(OntologyRender.propertyBlock(
        props.iterator.map { case (u, a) => TermProperty(u, a) }.toSeq,
        propertyDocs))
      if (conf.includeSemanticTypes) {
        out.write(semanticTypes)
        out.write("\n")
      }
    } finally out.close()
    WriteReport(job.sab, outFile, terms, errors, dupL, dupO, dupS)
  }
}
