package graft

import org.apache.spark.sql.DataFrame

/** Deterministic hostile UMLS fixture generator, shared by
  * [[graft.sink.TurtleWellformedSpec]] (well-formedness under arbitrary
  * content) and [[graft.render.ReferenceDifferentialSpec]] (byte parity
  * with the reference renderer under the SAME content): quotes,
  * backslashes, newlines, unicode, and Turtle metacharacters in labels,
  * definitions, attributes, and codes, from a seeded generator.
  *
  * Constraints that keep a fixture loadable by the REFERENCE
  * implementation (its `load_tables` crashes on code-less atoms,
  * `umls2rdf.py:147,602`): every atom carries a non-empty CODE, every
  * rel endpoint AUI exists, and each code has exactly one 'P'-TTY atom
  * so the empty-MRRANK pref-label fallback selects deterministically in
  * both engines (`umls2rdf.py:321-332`).
  */
object HostileUmls {

  val Hostile: IndexedSeq[String] = IndexedSeq(
    "\"", "\\", "\n", "'", "<", ">", "{", "}", "|", "^", "`", "é", "≈",
    "\t", "@", ";", ",", ".", "#", "\"\"\"", "a b", "100%", "x\\ny")

  def randString(rnd: scala.util.Random, n: Int): String =
    (0 until n).map { _ =>
      if (rnd.nextInt(3) == 0) Hostile(rnd.nextInt(Hostile.length))
      else ('a' + rnd.nextInt(26)).toChar.toString
    }.mkString

  private def conso(cui: String, aui: String, code: String, str: String,
      tty: String): Map[String, String] =
    Map("CUI" -> cui, "LAT" -> "ENG", "AUI" -> aui, "SAB" -> "RND",
      "TTY" -> tty, "CODE" -> code, "STR" -> str, "SUPPRESS" -> "N")

  def randomFixture(seed: Int): Map[String, DataFrame] = {
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
}
