package graft.tools

import org.apache.spark.sql.{Row, SparkSession}

import graft.sources.UmlsSource

/** Writes the committed UMLS-shaped fixture parquet under
  * `fixtures/umls/` — the tables behind the `q25+` fixture-oracle catalog
  * entries (schemas per FIXTURES.md §A, i.e. the public NLM RRF column
  * order pinned by `umls2rdf.py:47-90`).
  *
  * Deliberately covers every edge the reference's semantics hinge on:
  * empty CODE (dropped, C5), SUPPRESS/LAT/SAB filtering (F1), F16 altLabel
  * = prefLabel, SRC `V-<sab>` root detection (F2/F17), unresolved rel
  * targets and self-maps (J3/F15), suppressed MSH tree edges kept (the
  * reference's tree SQL has no SUPPRESS filter), shared-STN semantic types
  * (J13), CURVER preference (F9), and MRDOC inverse rows (A14).
  *
  * Run once: `sbt "runMain graft.tools.UmlsFixtureGen"`; output is
  * committed so the DuckDB oracle can read the same bytes.
  */
object UmlsFixtureGen {

  // Every value is a String or null, per RRF/VARCHAR semantics.
  val mrconso: Seq[Row] = Seq(
    // CUI, LAT, TS, LUI, STT, SUI, ISPREF, AUI, SAUI, SCUI, SDUI, SAB,
    // TTY, CODE, STR, SRL, SUPPRESS, CVF
    Row("C0001", "ENG", "P", "L0001", "PF", "S0001", "Y", "A0001", "", "SC1", "", "FIX", "PT", "X1", "Alpha", "0", "N", ""),
    Row("C0001", "ENG", "S", "L0002", "VO", "S0002", "N", "A0002", "", "SC1", "", "FIX", "SY", "X1", "Alpha synonym", "0", "N", ""),
    Row("C0011", "ENG", "S", "L0003", "VO", "S0003", "N", "A0003", "", "SC1", "", "FIX", "SY", "X1", "Alpha", "0", "N", ""),
    Row("C0002", "ENG", "P", "L0004", "PF", "S0004", "Y", "A0004", "", "SC2", "", "FIX", "PT", "X2", "Beta", "0", "N", ""),
    Row("C0002", "ENG", "S", "L0005", "VO", "S0005", "N", "A0005", "", "SC2", "", "FIX", "SY", "X2", "Beta variant", "0", "N", ""),
    Row("C0003", "ENG", "P", "L0006", "PF", "S0006", "Y", "A0006", "", "SC3", "", "FIX", "PT", "X3", "Gamma", "0", "N", ""),
    Row("C0004", "ENG", "P", "L0007", "PF", "S0007", "Y", "A0007", "", "SC4", "", "FIX", "PT", "X4", "Delta", "0", "N", ""),
    // empty CODE -> dropped by get_code (C5)
    Row("C0005", "ENG", "P", "L0008", "PF", "S0008", "Y", "A0008", "", "", "", "FIX", "PT", "", "NoCode", "0", "N", ""),
    // filtered: SUPPRESS, LAT, other SAB
    Row("C0006", "ENG", "P", "L0009", "PF", "S0009", "Y", "A0009", "", "", "", "FIX", "PT", "X9", "Suppressed", "0", "O", ""),
    Row("C0007", "SPA", "P", "L0010", "PF", "S0010", "Y", "A0010", "", "", "", "FIX", "PT", "X10", "Spanish", "0", "N", ""),
    Row("C0008", "ENG", "P", "L0011", "PF", "S0011", "Y", "A0011", "", "", "", "OTH", "PT", "Y1", "OtherSab", "0", "N", ""),
    // SRC root atom (F2): cui_roots = {C0100}
    Row("C0100", "ENG", "P", "L0100", "PF", "S0100", "Y", "A0100", "", "", "", "SRC", "RPT", "V-FIX", "Fixture Root", "0", "N", ""),
    // CFX atoms (cuis mode, q25b): one CUI per prefLabel-cascade branch of
    // A8 (`umls2rdf.py:295-319`) — single atom; unique STR; no ISPREF=Y
    // (first atom); single ISPREF=Y; single (ISPREF=Y, STT=PF); TTY-P
    // disambiguation; TTY-P tie -> first atom; ISPREF=Y ties w/o PF.
    Row("CU01", "ENG", "S", "L1", "VO", "S1", "N", "B0011", "", "", "", "CFX", "SY", "K1", "Solo", "0", "N", ""),
    Row("CU02", "ENG", "S", "L2", "VO", "S2", "N", "B0021", "", "", "", "CFX", "SY", "K2", "Same", "0", "N", ""),
    Row("CU02", "ENG", "S", "L2", "VO", "S3", "N", "B0022", "", "", "", "CFX", "AB", "K2", "Same", "0", "N", ""),
    Row("CU03", "ENG", "S", "L3", "VO", "S4", "N", "B0031", "", "", "", "CFX", "SY", "K3", "First3", "0", "N", ""),
    Row("CU03", "ENG", "S", "L3", "VO", "S5", "N", "B0032", "", "", "", "CFX", "AB", "K3", "Zed3", "0", "N", ""),
    Row("CU04", "ENG", "S", "L4", "VO", "S6", "N", "B0041", "", "", "", "CFX", "SY", "K4", "NotPref4", "0", "N", ""),
    Row("CU04", "ENG", "P", "L4", "VO", "S7", "Y", "B0042", "", "", "", "CFX", "SY", "K4", "Pref4", "0", "N", ""),
    Row("CU05", "ENG", "P", "L5", "PF", "S8", "Y", "B0051", "", "", "", "CFX", "SY", "K5", "PF5", "0", "N", ""),
    Row("CU05", "ENG", "P", "L5", "VO", "S9", "Y", "B0052", "", "", "", "CFX", "SY", "K5", "VO5", "0", "N", ""),
    Row("CU06", "ENG", "P", "L6", "PF", "S10", "Y", "B0061", "", "", "", "CFX", "PT", "K6", "TtyP6", "0", "N", ""),
    Row("CU06", "ENG", "P", "L6", "PF", "S11", "Y", "B0062", "", "", "", "CFX", "SY", "K6", "Other6", "0", "N", ""),
    Row("CU07", "ENG", "P", "L7", "PF", "S12", "Y", "B0071", "", "", "", "CFX", "PT", "K7", "A7", "0", "N", ""),
    Row("CU07", "ENG", "P", "L7", "PF", "S13", "Y", "B0072", "", "", "", "CFX", "PN", "K7", "B7", "0", "N", ""),
    Row("CU08", "ENG", "P", "L8", "VO", "S14", "Y", "B0081", "", "", "", "CFX", "SY", "K8", "A8", "0", "N", ""),
    Row("CU08", "ENG", "P", "L8", "VO", "S15", "Y", "B0082", "", "", "", "CFX", "AB", "K8", "B8", "0", "N", ""),
    // MSH atoms for the tree fixture (J2); Q-code excluded by the D% filter
    Row("C0301", "ENG", "P", "L0301", "PF", "S0301", "Y", "A0301", "", "", "", "MSH", "MH", "D000001", "MeSH One", "0", "N", ""),
    Row("C0302", "ENG", "P", "L0302", "PF", "S0302", "Y", "A0302", "", "", "", "MSH", "MH", "D000002", "MeSH Two", "0", "N", ""),
    Row("C0303", "ENG", "P", "L0303", "PF", "S0303", "Y", "A0303", "", "", "", "MSH", "MH", "D000003", "MeSH Three", "0", "N", ""),
    Row("C0304", "ENG", "P", "L0304", "PF", "S0304", "Y", "A0304", "", "", "", "MSH", "MH", "Q000001", "Qualifier", "0", "N", ""))

  val mrrel: Seq[Row] = Seq(
    // CUI1, AUI1, STYPE1, REL, CUI2, AUI2, STYPE2, RELA, RUI, SRUI, SAB,
    // SL, RG, DIR, SUPPRESS, CVF   (CUI2/AUI2 = source, CUI1/AUI1 = target)
    Row("C0001", "A0001", "AUI", "CHD", "C0002", "A0004", "AUI", "", "R1", "", "FIX", "FIX", "", "", "N", ""),
    Row("C0002", "A0004", "AUI", "RO", "C0003", "A0006", "AUI", "part_of", "R2", "", "FIX", "FIX", "", "", "N", ""),
    // root rel: target AUI is the SRC atom -> unresolved (dropped from
    // resolved rels) but CUI1 hits cui_roots with REL=CHD -> X1 isRoot (F17)
    Row("C0100", "A0100", "AUI", "CHD", "C0001", "A0001", "AUI", "", "R3", "", "FIX", "FIX", "", "", "N", ""),
    // self-map: both endpoints resolve to X1 -> dropped (F15)
    Row("C0011", "A0003", "AUI", "RQ", "C0001", "A0001", "AUI", "mapped_to", "R4", "", "FIX", "FIX", "", "", "N", ""),
    // PAR rel: kept in assembly, skipped by the renderer (F10)
    Row("C0003", "A0006", "AUI", "PAR", "C0004", "A0007", "AUI", "inverse_isa", "R5", "", "FIX", "FIX", "", "", "N", ""),
    // filtered: suppressed / other SAB
    Row("C0001", "A0001", "AUI", "RO", "C0003", "A0006", "AUI", "", "R6", "", "FIX", "FIX", "", "", "Y", ""),
    Row("C0001", "A0001", "AUI", "RO", "C0002", "A0004", "AUI", "", "R7", "", "OTH", "OTH", "", "", "N", ""),
    // MSH tree edges: D1 <- D2 (kept), D2 <- D3 SUPPRESSED but still a tree
    // edge (reference tree SQL has no SUPPRESS filter), D1 <- Q1 (D% drop)
    Row("C0301", "A0301", "AUI", "CHD", "C0302", "A0302", "AUI", "", "R8", "", "MSH", "MSH", "", "", "N", ""),
    Row("C0302", "A0302", "AUI", "CHD", "C0303", "A0303", "AUI", "", "R9", "", "MSH", "MSH", "", "", "Y", ""),
    Row("C0301", "A0301", "AUI", "CHD", "C0304", "A0304", "AUI", "", "R10", "", "MSH", "MSH", "", "", "N", ""))

  val mrdef: Seq[Row] = Seq(
    // CUI, AUI, ATUI, SATUI, SAB, DEF, SUPPRESS, CVF
    Row("C0001", "A0001", "AT1", "", "FIX", "First definition", "N", ""),
    Row("C0001", "A0002", "AT2", "", "FIX", "Another definition", "N", ""),
    Row("C0001", "A0001", "AT3", "", "FIX", "First definition", "N", ""), // dup
    Row("C0002", "A0004", "AT4", "", "OTH", "Filtered def", "N", ""))

  val mrsat: Seq[Row] = Seq(
    // CUI, LUI, SUI, METAUI, STYPE, CODE, ATUI, SATUI, ATN, SAB, ATV,
    // SUPPRESS, CVF
    Row("C0001", "", "", "", "AUI", "X1", "AT5", "", "SOS", "FIX", "scope note", "N", ""),
    Row("C0001", "", "", "", "AUI", "X1", "AT6", "", "AQ", "FIX", "qualifier", "N", ""),
    Row("C0002", "", "", "", "AUI", "X2", "AT7", "", "MN", "FIX", "D1", "N", ""),
    Row("C0003", "", "", "", "AUI", null, "AT8", "", "SOS", "FIX", "null code", "N", ""),
    Row("C0002", "", "", "", "AUI", "X2", "AT9", "", "SOS", "OTH", "other sab", "N", ""))

  val mrsty: Seq[Row] = Seq(
    // CUI, TUI, STN, STY, ATUI, CVF
    Row("C0001", "T001", "A1", "Entity", "", ""),
    Row("C0001", "T002", "A1.2", "Physical Object", "", ""),
    Row("C0002", "T003", "A1.2.1", "Organism", "", ""),
    Row("C0003", "T004", "B1", "Event", "", ""),
    Row("C0004", "T005", "B1.1", "Activity", "", ""),
    Row("C0011", "T001", "A1", "Entity", "", ""), // dup TUI via 2nd CUI of X1
    Row("C0099", "T006", "A1.2", "Physical Object Twin", "", ""))

  val mrrank: Seq[Row] = Seq(
    // RANK, SAB, TTY, SUPPRESS
    Row("0400", "FIX", "PT", "N"),
    Row("0300", "FIX", "SY", "N"),
    Row("0500", "MSH", "MH", "N"),
    Row("0200", "OTH", "PT", "N"))

  val mrsab: Seq[Row] = {
    // VCUI, RCUI, VSAB, RSAB, SON, SF, SVER, VSTART, VEND, IMETA, RMETA,
    // SLC, SCC, SRL, TFR, CFR, CXTY, TTYL, ATNL, LAT, CENC, CURVER, SABIN,
    // SSN, SCIT
    def row(vsab: String, sver: String, imeta: String, curver: String,
        ssn: String, rsab: String = "FIX") = Row(
      "C1", "C2", vsab, rsab, "Fixture Source Name", "FIX", sver, "", "",
      imeta, "", "", "", "0", "", "", "", "", "", "ENG", "UTF-8", curver,
      "Y", ssn, "cite")
    Seq(
      row("FIX2024", "2024AA", "2024AB", "N", "Fixture Source (old)"),
      row("FIX2025", "2025AA", "2025AA", "Y", "Fixture Source"),
      row("CFX2025", "5.1", "2025AA", "Y", "Cuis Fixture Source", rsab = "CFX"),
      row("MSH2025", "2025", "2025AA", "Y", "Medical Subject Headings (fixture)", rsab = "MSH"),
      row("OTH2025", "1.0", "2025AA", "Y", "Other Source", rsab = "OTH"))
  }

  val mrdoc: Seq[Row] = Seq(
    // DOCKEY, VALUE, TYPE, EXPL
    Row("ATN", "SOS", "expanded_form", "Scope Statement"),
    Row("ATN", "AQ", "expanded_form", "Allowed qualifier"),
    Row("ATN", "MN", "expanded_form", "MeSH tree number"),
    Row("REL", "RO", "expanded_form", "has Relationship Other than synonymous, narrower, or broader"),
    Row("REL", "RO", "rel_inverse", "RO"),
    Row("REL", "CHD", "expanded_form", "has child relationship"),
    Row("RELA", "part_of", "expanded_form", "Part of"),
    Row("RELA", "part_of", "rela_inverse", "has_part"))

  val tables: Map[String, Seq[Row]] = Map(
    "MRCONSO" -> mrconso, "MRREL" -> mrrel, "MRDEF" -> mrdef,
    "MRSAT" -> mrsat, "MRSTY" -> mrsty, "MRRANK" -> mrrank,
    "MRSAB" -> mrsab, "MRDOC" -> mrdoc)

  def write(spark: SparkSession, dir: String): Unit =
    tables.foreach { case (name, rows) =>
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), UmlsSource.schemaOf(name))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "fixtures/umls"
    val spark = SparkSession.builder()
      .appName("umls-fixture-gen").master("local[2]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    write(spark, dir)
    spark.stop()
  }
}
