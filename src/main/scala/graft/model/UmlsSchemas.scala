package graft.model

import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Named schemas for the UMLS RRF tables.
  *
  * The reference addresses columns by hard-coded positional offsets
  * (`umls2rdf.py:47-90`); we name every column per the public NLM RRF
  * column order (the comment at `umls2rdf.py:57` links the NLM docs) so
  * Catalyst column pruning replaces manual narrow projections. All columns
  * are strings — the reference's data plane has no other types (§1.1 of
  * SURVEY.md; the only numeric coercion is `int(RANK)`).
  */
object UmlsSchemas {

  private def schema(cols: String*): StructType =
    StructType(cols.map(StructField(_, StringType, nullable = true)))

  /** MRCONSO — atoms. Offsets CUI=0,TS=2,STT=4,ISPREF=6,AUI=7,SCUI=9,
    * TTY=12,CODE=13,STR=14 (`umls2rdf.py:47-55`). */
  val mrconso: StructType = schema(
    "CUI", "LAT", "TS", "LUI", "STT", "SUI", "ISPREF", "AUI", "SAUI",
    "SCUI", "SDUI", "SAB", "TTY", "CODE", "STR", "SRL", "SUPPRESS", "CVF")

  /** MRREL — relations. Offsets CUI1=0,AUI1=1,REL=3,CUI2=4,AUI2=5,RELA=7
    * (`umls2rdf.py:58-63`). */
  val mrrel: StructType = schema(
    "CUI1", "AUI1", "STYPE1", "REL", "CUI2", "AUI2", "STYPE2", "RELA",
    "RUI", "SRUI", "SAB", "SL", "RG", "DIR", "SUPPRESS", "CVF")

  /** MRDEF — definitions (`umls2rdf.py:65-67`). */
  val mrdef: StructType = schema(
    "CUI", "AUI", "ATUI", "SATUI", "SAB", "DEF", "SUPPRESS", "CVF")

  /** MRSAT — attributes. Offsets CUI=0,CODE=5,ATN=8,ATV=10
    * (`umls2rdf.py:69-72`). */
  val mrsat: StructType = schema(
    "CUI", "LUI", "SUI", "METAUI", "STYPE", "CODE", "ATUI", "SATUI",
    "ATN", "SAB", "ATV", "SUPPRESS", "CVF")

  /** MRDOC — property documentation (`umls2rdf.py:74-77`). */
  val mrdoc: StructType = schema("DOCKEY", "VALUE", "TYPE", "EXPL")

  /** MRRANK — term-type precedence (`umls2rdf.py:79-80`). */
  val mrrank: StructType = schema("RANK", "SAB", "TTY", "SUPPRESS")

  /** MRSTY — semantic types (`umls2rdf.py:82-83`). */
  val mrsty: StructType = schema("CUI", "TUI", "STN", "STY", "ATUI", "CVF")

  /** MRSAB — source metadata. Offsets RSAB=3,SVER=6,IMETA=9,LAT=19,
    * CURVER=21,SSN=23 (`umls2rdf.py:85-90`). */
  val mrsab: StructType = schema(
    "VCUI", "RCUI", "VSAB", "RSAB", "SON", "SF", "SVER", "VSTART", "VEND",
    "IMETA", "RMETA", "SLC", "SCC", "SRL", "TFR", "CFR", "CXTY", "TTYL",
    "ATNL", "LAT", "CENC", "CURVER", "SABIN", "SSN", "SCIT")

  val all: Map[String, StructType] = Map(
    "MRCONSO" -> mrconso, "MRREL" -> mrrel, "MRDEF" -> mrdef,
    "MRSAT" -> mrsat, "MRDOC" -> mrdoc, "MRRANK" -> mrrank,
    "MRSTY" -> mrsty, "MRSAB" -> mrsab)
}
