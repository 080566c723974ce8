package graft.assemble

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model._
import graft.sources.UmlsSource

/** Intermediate grouped shape before prefLabel selection. */
final case class AssembledRaw(
    code: String,
    atoms: Seq[AtomRow],
    rels: Seq[RelOut],
    defs: Seq[String],
    atts: Seq[AttOut],
    tuis: Seq[String],
    isRoot: Boolean,
    treeParents: Seq[String])

/** Assembles per-code concept rows from the UMLS tables for one SAB —
  * the Spark-first re-expression of `UmlsOntology.load_tables` + `terms()`
  * (`umls2rdf.py:586-743`).
  *
  * Where the reference builds in-RAM hash indexes (`*_by_*` defaultdicts,
  * `umls2rdf.py:545-557`) and loops row-at-a-time, this declares the same
  * dataflow as joins + groupBys and lets Catalyst plan it:
  *   - every child table is filtered by SAB first (parquet/JDBC pushdown —
  *     the reference's F1-F6 WHERE clauses);
  *   - AUI→code resolution (J3) is a join against the atom (AUI, code)
  *     projection;
  *   - per-class grouping (A1) is `groupBy(code)` with `collect_list` —
  *     one shuffle keyed by code; per-code fan-in is bounded (a code has
  *     bounded atoms/rels), so collected arrays are safe at full-UMLS
  *     scale and AQE handles the SNOMEDCT/LNC skew;
  *   - tiny tables (MRRANK per SAB ≈ hundreds of rows; cui_roots ≈ 1) are
  *     broadcast.
  *
  * Whole-export shape: one assembler instance per SAB, mirroring the
  * reference's per-ontology loop. At lake scale the tables are stored
  * `partitionBy("SAB")`, so each instance's scans are partition-pruned
  * reads, and [[graft.pipeline.PipelineConfig.parallelism]] runs the
  * per-SAB jobs concurrently — a cluster stays saturated without a
  * multi-SAB composite-key dataflow (which would complicate every join
  * key for a re-scan cost pruning already removes).
  *
  * Determinism (SURVEY.md §7.1.6): the reference's "first atom" /
  * stable-sort tie-breaks follow MySQL scan order, which no distributed
  * engine can reproduce; we canonicalize by sorting each class's atoms by
  * AUI (codes mode) / (CUI, AUI) and breaking rank ties on that order.
  * Intra-class output bytes are otherwise reference-equal.
  */
class ConceptAssembler(
    spark: SparkSession,
    source: UmlsSource,
    sab: String,
    loadOnCuis: Boolean = false,
    lang: String = "ENG",
    limit: Option[Int] = None,
    saltBuckets: Int = 1) {

  import spark.implicits._

  private val langUpper = lang.toUpperCase

  /** O5 row limit: the reference wires an optional LIMIT into the MRCONSO
    * and MRREL scans (`umls2rdf.py:586,600,613,623`) for sampled runs. */
  private def limited(df: DataFrame): DataFrame =
    limit.fold(df)(df.limit)

  /** F1: SAB + LAT + SUPPRESS='N' filter, pushed to the scan. MySQL's ci
    * collation made `lat = 'eng'` match 'ENG' (`umls2rdf.py:598-600`);
    * we compare case-insensitively to preserve that. */
  def atoms: DataFrame =
    limited(source.table("MRCONSO")
      .filter(col("SAB") === sab && upper(col("LAT")) === langUpper &&
        col("SUPPRESS") === "N"))
      .withColumn("code", codeExpr)
      .filter(col("code").isNotNull)

  /** The F1-filtered atoms, persisted once per assembler. Assembly derives
    * the per-code grouping, the AUI→code map (joined 2-3× in
    * [[relsResolved]]/[[defsByCode]]) and the TUI attachment all from this
    * one projection, so MRCONSO is scanned ONCE per SAB instead of 4-5×
    * (the round-2 q25s hotspot: the plan re-derived `atoms` in four
    * subplans whose shuffle keys differ, so ReusedExchange never fired).
    * MEMORY_AND_DISK: a SAB-pruned narrow projection is a few M rows for
    * the largest SAB at full-UMLS scale; disk spill keeps it safe
    * regardless. Call [[unpersistShared]] when the export is done. */
  private var sharedInitialized = false
  private lazy val atomsShared: DataFrame = {
    sharedInitialized = true
    // Only the 10 columns assembly reads — caching the full 19-column RRF
    // row would double the cache bytes (and the row-encode cost) for
    // columns nothing downstream touches.
    atoms.select(col("code"), col("CUI"), col("TS"), col("STT"),
        col("ISPREF"), col("AUI"), col("SCUI"), col("TTY"), col("CODE"),
        col("STR"))
      .persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Release the shared atom cache (no-op if assembly never ran). */
  def unpersistShared(): Unit =
    if (sharedInitialized) { atomsShared.unpersist(); () }

  /** `get_code` (`umls2rdf.py:142-147`): CUI in cuis mode; else CODE,
    * which must be non-empty (Python falsiness — '' raises too; the
    * reference raises AttributeError). Such atoms become NULL here and are
    * dropped by the filter in [[atoms]]; strict mode surfaces them via
    * [[invalidCodeAtoms]] (see [[concepts]]). */
  private def codeExpr =
    if (loadOnCuis) col("CUI")
    else when(length(col("CODE")) > 0, col("CODE"))

  def invalidCodeAtoms: DataFrame =
    source.table("MRCONSO")
      .filter(col("SAB") === sab && upper(col("LAT")) === langUpper &&
        col("SUPPRESS") === "N")
      .filter(col("CODE").isNull || length(col("CODE")) === 0)

  /** F2 root CUIs: the SRC `V-<sab>` atoms (`umls2rdf.py:612-614`);
    * tiny — broadcast as a literal set via collect. */
  def cuiRoots: Set[String] =
    source.table("MRCONSO")
      .filter(col("SAB") === "SRC" && col("CODE") === s"V-$sab")
      .select("CUI").distinct().as[String].collect().toSet

  /** F3-filtered relations (`umls2rdf.py:621-623`). */
  def rels: DataFrame =
    limited(source.table("MRREL")
      .filter(col("SAB") === sab && col("SUPPRESS") === "N"))

  /** MeSH `D*` CHD tree: child code → parent codes (J2,
    * `umls2rdf.py:201-217`). Only consulted when `sab == "MSH"`. The
    * reference's tree SQL has NO SUPPRESS predicate (unlike F3), so the
    * edges are read from MRREL filtered on SAB/REL only — not from
    * [[rels]]. */
  def meshTree: DataFrame = {
    val conso = source.table("MRCONSO")
    val msh = conso.filter(col("SAB") === "MSH" &&
        col("CODE").startsWith("D"))
      .select(col("CUI").as("m_cui"), col("CODE").as("m_code"))
      .distinct()
    val chd = source.table("MRREL")
      .filter(col("SAB") === "MSH" && col("REL") === "CHD")
      .select(col("CUI1"), col("CUI2"))
    chd.join(msh.as("c1"), col("CUI1") === col("c1.m_cui"))
      .join(msh.as("c2"), col("CUI2") === col("c2.m_cui"))
      .select(col("c1.m_code").as("parent"), col("c2.m_code").as("child"))
      .distinct()
      .groupBy("child")
      .agg(collect_set("parent").as("parents"))
  }

  private def atomIdCode: DataFrame =
    if (loadOnCuis)
      atomsShared.select(col("CUI").as("atom_id"), col("code").as("atom_code"))
        .distinct()
    else
      // AUI is MRCONSO's primary key (one row per atom), so the (AUI, code)
      // projection is already row-unique — a distinct here would be a
      // full-width shuffle of every atom for nothing. (Code-ambiguity per
      // atom id is separately policed by [[auiCardinalityViolations]].)
      atomsShared.select(col("AUI").as("atom_id"), col("code").as("atom_code"))

  /** J3+J4: relations attached to their source class, with AUI→code
    * endpoint resolution in codes mode (`umls2rdf.py:685-727`).
    *
    * Codes mode: attach by AUI2 (inner — a rel not anchored at a class
    * atom is invisible, as in the reference), resolve target by AUI1
    * (unresolved targets dropped, `:717`), drop self-maps (`:715-718`).
    * Cuis mode: attach by CUI2; endpoints are the CUIs, no filtering.
    * `is_root` (F17) is computed over ALL attached rels — before the
    * target-resolution filters — exactly like the reference.
    */
  def relsResolved: (DataFrame, DataFrame) = {
    val grouped = relsGroupedWithRoots
    val out = grouped
      .select(col("rcode"), explode(col("rels")).as("r"))
      .select(col("rcode"), col("r.rel").as("rel"), col("r.rela").as("rela"),
        col("r.cui1").as("cui1"), col("r.codeTarget"), col("r.codeSource"))
    val rootFlags = grouped
      .select(col("rcode").as("root_code"), col("is_root"))
    (out, rootFlags)
  }

  /** The rels side of the assembly in ONE pass: per-source-code grouped
    * relation structs plus the F17 root flag — `(rcode, rels, is_root)`.
    *
    * The root flag is detected over the SAME attached-rels relation the
    * grouped structs come from, so fusing both into one `groupBy` halves
    * the rels⋈atoms join work (round 2 computed `attached` twice — once
    * for rootFlags, once for the resolved rels — and the differing
    * downstream shuffle keys kept ReusedExchange from sharing them) and
    * drops one join from [[assembled]]. Target resolution is a LEFT join
    * + in-aggregate filter: `collect_list` skips NULL `when()` branches,
    * so unresolved/self-map rels vanish from the struct list (reference
    * drops them, `umls2rdf.py:715-718`) while still voting for `is_root`
    * exactly as the reference computes it over ALL attached rels. */
  def relsGroupedWithRoots: DataFrame = {
    val roots = cuiRoots
    val rootsCol = if (roots.isEmpty) lit(false)
      else col("CUI1").isin(roots.toSeq: _*)
    if (loadOnCuis) {
      val attached = rels
        .join(atomIdCode, col("CUI2") === col("atom_id"), "left_semi")
      attached
        .groupBy(col("CUI2").as("rcode"))
        .agg(
          collect_list(struct(
            col("REL").as("rel"), col("RELA").as("rela"),
            col("CUI1").as("cui1"),
            col("CUI1").as("codeTarget"), col("CUI2").as("codeSource")))
            .as("rels"),
          max(rootsCol).as("is_root"))
    } else {
      val attached = rels.join(
        atomIdCode.select(col("atom_id").as("src_aui"),
          col("atom_code").as("codeSource")),
        col("AUI2") === col("src_aui"))
      val icdPatch =
        if (sab == "ICD10CM")
          col("CUI1") === "C3264380" && col("REL") === "CHD"
        else lit(false)
      val resolved = attached.join(
        atomIdCode.select(col("atom_id").as("tgt_aui"),
          col("atom_code").as("codeTarget")),
        col("AUI1") === col("tgt_aui"), "left")
      resolved
        .groupBy(col("codeSource").as("rcode"))
        .agg(
          collect_list(when(
            col("codeTarget").isNotNull &&
              col("codeTarget") =!= col("codeSource"),
            struct(col("REL").as("rel"), col("RELA").as("rela"),
              col("CUI1").as("cui1"),
              col("codeTarget"), col("codeSource")))).as("rels"),
          max((rootsCol && col("REL") === "CHD") || icdPatch).as("is_root"))
    }
  }

  /** J5: definitions keyed by AUI (codes) / CUI (cuis)
    * (`umls2rdf.py:632-637,728-730`). Sorted distinct at assembly — the
    * reference renders `sorted(set(defs))` (`umls2rdf.py:417-419`). */
  def defsByCode: DataFrame = {
    val d = source.table("MRDEF").filter(col("SAB") === sab)
    if (loadOnCuis)
      d.select(col("CUI").as("dcode"), col("DEF"))
        .groupBy("dcode").agg(array_sort(collect_set("DEF")).as("defs"))
    else
      d.join(atomIdCode, col("AUI") === col("atom_id"))
        .groupBy(col("atom_code").as("dcode"))
        .agg(array_sort(collect_set("DEF")).as("defs"))
  }

  /** J6/F5: attributes keyed by CODE (codes) / CUI (cuis)
    * (`umls2rdf.py:643-648,731`). */
  def attsByCode: DataFrame = {
    val a = source.table("MRSAT")
      .filter(col("SAB") === sab && col("CODE").isNotNull)
    val key = if (loadOnCuis) col("CUI") else col("CODE")
    a.groupBy(key.as("acode"))
      .agg(collect_list(struct(col("ATN").as("atn"), col("ATV").as("atv")))
        .as("atts"))
  }

  /** J1+J7: semantic-type TUIs per class, via the class's CUIs
    * (`umls2rdf.py:663-670,477-479`). */
  def tuisByCode: DataFrame =
    atomsShared.select(col("code").as("tcode"), col("CUI")).distinct()
      .join(source.table("MRSTY").select(col("CUI"), col("TUI")), "CUI")
      .groupBy("tcode")
      .agg(collect_set("TUI").as("tuis"))

  /** MRRANK rank-by-TTY for this SAB (tiny; collected + broadcast into the
    * prefLabel map). Reference: `umls2rdf.py:654-658,320-326`. */
  def rankByTty: Map[String, Int] =
    source.table("MRRANK").filter(col("SAB") === sab)
      .select(col("TTY"), col("RANK").cast("int").as("rank"))
      .as[(String, Int)].collect().toMap

  /** J3 cardinality violations: atom ids (AUIs in codes mode) that resolve
    * to more than one distinct code. The reference raises
    * "more than one or none codes" (`umls2rdf.py:715-716`) when a rel
    * endpoint resolves ambiguously; here the same condition is a queryable
    * validation relation, enforced by `concepts(strict = true)`. */
  def auiCardinalityViolations: DataFrame =
    atomIdCode.groupBy("atom_id")
      .agg(countDistinct("atom_code").as("n_codes"))
      .filter(col("n_codes") > 1)

  /** The assembled concepts: one row per code (A1), all child collections
    * joined in.
    *
    * @param strict reproduce the reference's hard asserts: fail if any atom
    *   has an empty CODE (`umls2rdf.py:142-147`) or any AUI resolves to >1
    *   code (`umls2rdf.py:715-716`) instead of silently dropping.
    */
  def concepts(strict: Boolean = false): Dataset[UmlsConceptRow] = {
    val rankMap = rankByTty
    val onCuis = loadOnCuis
    import org.apache.spark.sql.Encoders
    assembled(strict).map(raw => ConceptAssembler.finish(raw, rankMap, onCuis))(
      Encoders.product[UmlsConceptRow])
  }

  /** Column-algebra finishing — the codegen twin of
    * [[ConceptAssembler.finish]]: canonical atom order, prefLabel
    * selection (A7/A8/A9 branch-for-branch), distinct sorted
    * altLabels/CUIs/TUIs — as array expressions over the grouped shape,
    * so the scale path (q25s, any whole-corpus pre-pass) stays inside
    * whole-stage codegen instead of round-tripping every class through
    * the product encoder (the encoder map measured ~2× the whole
    * assembly's cost at 600k atoms). The typed [[concepts]] remains the
    * per-term unit the sink's `Try` wraps (S6); equality of the two
    * paths is spec-pinned (`ConceptAssemblerSpec`).
    *
    * Output columns match [[UmlsConceptRow]] field-for-field. */
  def conceptsColumns(strict: Boolean = false): DataFrame = {
    // The raising twin of [[conceptsColumnsTry]]: any per-term finishing
    // failure (err non-null) raises with the SAME message the typed
    // path's IllegalStateException carries.
    conceptsColumnsTry(strict)
      .withColumn("prefLabel",
        when(col("__finish_err").isNotNull,
          raise_error(col("__finish_err")).cast("string"))
          .otherwise(col("prefLabel")))
      .drop("__finish_err")
  }

  /** [[conceptsColumns]] with per-term error TOLERANCE (r20): instead
    * of raising, finishing failures surface as a `__finish_err` string
    * column (NULL on success; `prefLabel` NULL on failure) carrying
    * exactly the typed path's exception message. This is what lets the
    * SINK consume the whole-stage-codegen finishing plan while keeping
    * the S6 per-term error contract (`umls2rdf.py:764-771`) — the
    * typed route decoded ~30 atom structs per class through the
    * product encoder just so a Scala `Try` could wrap `finish`
    * (ProfileExport measured the decode+finish map at ~2× the assembly
    * cost at 600k atoms). Equality with the typed path — values AND
    * error messages — is spec-pinned (`ConceptAssemblerSpec`). */
  def conceptsColumnsTry(strict: Boolean = false): DataFrame = {
    val rankMap = rankByTty
    val raw = assembled(strict).toDF()
    val schema = raw.schema
    def emptyLike(c: String) =
      array().cast(schema(schema.fieldIndex(c)).dataType)
    // Canonical (aui, cui) order: the atom struct leads with those keys
    // by construction (AtomRow field-order note), so the sort runs on the
    // raw structs — no per-atom key rebuild, no unwrap transform.
    val sortedAtoms = array_sort(col("atoms"))
    val withSorted = raw.withColumn("atoms_sorted", sortedAtoms)
    val atomsS = col("atoms_sorted")
    val strs = transform(atomsS, a => a.getField("str"))
    val first = element_at(atomsS, 1).getField("str")
    val (prefCol, errCol) =
      if (loadOnCuis) {
        // A8 cascade (umls2rdf.py:296-319), branch-for-branch; the
        // cascade cannot fail.
        val labels = array_distinct(strs)
        val isPref = filter(atomsS, a => a.getField("ispref") === "Y")
        val prefPf = filter(isPref, a => a.getField("stt") === "PF")
        val ttyP = filter(atomsS, a => a.getField("tty").startsWith("P"))
        (when(size(atomsS) === 1, first)
          .when(size(labels) === 1, element_at(labels, 1))
          .when(size(isPref) === 0, first)
          .when(size(isPref) === 1, element_at(isPref, 1).getField("str"))
          .when(size(prefPf) === 0, first)
          .when(size(prefPf) === 1, element_at(prefPf, 1).getField("str"))
          .when(size(ttyP) === 1, element_at(ttyP, 1).getField("str"))
          .otherwise(first),
          lit(null).cast("string"))
      } else if (rankMap.nonEmpty) {
        // A7 argmax; FIRST max in canonical order (the typed path's maxBy
        // tie-break) = array_position's first-occurrence pick. One rank
        // lookup per atom (the old struct-accumulator aggregate evaluated
        // it twice), no per-step struct rebuilds. A missing TTY fails the
        // term like the reference's KeyError — message identical to the
        // typed path's throw, keyed on the FIRST missing atom in
        // canonical order (= the typed map's first-thrown atom).
        val rankLit = typedLit(rankMap)
        val missing = filter(atomsS,
          a => element_at(rankLit, a.getField("tty")).isNull)
        val err = when(size(missing) > 0,
          concat(lit("TTY "), element_at(missing, 1).getField("tty"),
            lit(" not in MRRANK")))
        val ranks = transform(atomsS,
          a => element_at(rankLit, a.getField("tty")))
        val pref = element_at(atomsS,
          array_position(ranks, array_max(ranks)).cast("int"))
          .getField("str")
        (when(err.isNull, pref), err)
      } else {
        // A9: empty MRRANK requires exactly one 'P'-TTY atom.
        val prefAtoms = filter(atomsS, a => a.getField("tty").contains("P"))
        val err = when(size(prefAtoms) =!= 1,
          lit("Unable to select pref label"))
        (when(err.isNull, element_at(prefAtoms, 1).getField("str")), err)
      }
    withSorted
      .withColumn("prefLabel", prefCol)
      .select(
        col("code"),
        col("prefLabel"),
        array_sort(array_remove(array_distinct(strs), col("prefLabel")))
          .as("altLabels"),
        coalesce(col("defs"), emptyLike("defs")).as("defs"),
        array_sort(array_distinct(
          transform(atomsS, a => a.getField("cui")))).as("cuis"),
        array_sort(coalesce(col("tuis"), emptyLike("tuis"))).as("tuis"),
        coalesce(col("atts"), emptyLike("atts")).as("atts"),
        coalesce(col("rels"), emptyLike("rels")).as("rels"),
        col("isRoot"),
        array_sort(coalesce(col("treeParents"), emptyLike("treeParents")))
          .as("treeParents"),
        errCol.as("__finish_err"))
  }

  /** A1 per-code atom collection, optionally salted for skewed SABs.
    *
    * AQE splits skewed JOIN partitions but not skewed AGGREGATES, so a
    * code holding a large share of a SAB's atoms (SURVEY §4 names the
    * SNOMEDCT/LNC shape) funnels its whole `collect_list` fan-in through
    * one reduce task. With `saltBuckets > 1` the collection runs in two
    * stages: stage one groups by `(code, hash(AUI) % saltBuckets)` so the
    * hot code's atoms build partial arrays on `saltBuckets` parallel
    * tasks; stage two concatenates those pre-built arrays — the hot
    * reducer now receives `saltBuckets` rows instead of one row per atom.
    * Value-identical to the unsalted path because every consumer
    * canonically re-sorts the atom array ([[conceptsColumns]] /
    * [[ConceptAssembler.finish]]); equality is spec-pinned. */
  private def groupCollectAtoms(a: DataFrame): DataFrame = {
    // (aui, cui) lead the struct so array_sort over the raw structs IS the
    // canonical order — see the AtomRow field-order note.
    val atomStruct = struct(
      col("AUI").as("aui"), col("CUI").as("cui"),
      col("STT").as("stt"), col("ISPREF").as("ispref"),
      col("TTY").as("tty"), col("STR").as("str"))
    if (saltBuckets <= 1)
      a.groupBy(col("code")).agg(collect_list(atomStruct).as("atoms"))
    else
      a.withColumn("__graft_salt",
          pmod(xxhash64(col("AUI")), lit(saltBuckets)))
        .groupBy(col("code"), col("__graft_salt"))
        .agg(collect_list(atomStruct).as("partial"))
        .groupBy(col("code"))
        .agg(flatten(collect_list(col("partial"))).as("atoms"))
  }

  /** The grouped-and-joined shape BEFORE per-class finishing — exposed so
    * the sink can wrap finish+render in a per-term Try (S6 error
    * tolerance, `umls2rdf.py:764-771`). */
  def assembled(strict: Boolean = false): Dataset[AssembledRaw] = {
    if (strict && !loadOnCuis) {
      val badCodes = invalidCodeAtoms.count()
      if (badCodes > 0) throw new IllegalStateException(
        s"$badCodes atoms with empty CODE in SAB $sab (reference raises)")
      val badAuis = auiCardinalityViolations.count()
      if (badAuis > 0) throw new IllegalStateException(
        s"$badAuis atom ids resolve to more than one code in SAB $sab")
    }
    val relsGrouped = relsGroupedWithRoots
    // Only the finishing-step fields enter the collected struct (see
    // [[AtomRow]]); the grouping code rides the group key, not each atom.
    val atomsGrouped = groupCollectAtoms(atomsShared)
    val tree =
      if (sab == "MSH") meshTree
      else spark.emptyDataFrame
        .withColumn("child", lit(null).cast("string"))
        .withColumn("parents", lit(null).cast("array<string>"))
        .select("child", "parents")

    val joined = atomsGrouped
      .join(relsGrouped, col("code") === col("rcode"), "left")
      .join(defsByCode, col("code") === col("dcode"), "left")
      .join(attsByCode, col("code") === col("acode"), "left")
      .join(tuisByCode, col("code") === col("tcode"), "left")
      .join(tree, col("code") === col("child"), "left")

    // Left joins leave absent child collections NULL; finish() treats NULL
    // arrays as empty (cheaper than type-spelled coalesce literals).
    joined.select(
      col("code"),
      col("atoms"),
      col("rels"),
      col("defs"),
      col("atts"),
      col("tuis"),
      coalesce(col("is_root"), lit(false)).as("isRoot"),
      col("parents").as("treeParents"))
      .as[AssembledRaw]
  }
}

object ConceptAssembler {

  /** Per-class finishing step: canonical atom order, prefLabel selection
    * (A7/A8), distinct sorted altLabels (A3/F16), sorted distinct CUIs/TUIs
    * (A5/A6). Pure function so the reference's class-level behavior tests
    * can exercise it without a cluster.
    */
  def finish(raw: AssembledRaw, rankByTty: Map[String, Int],
      loadOnCuis: Boolean): UmlsConceptRow = {
    def orEmpty[T](xs: Seq[T]): Seq[T] = if (xs == null) Nil else xs
    // Canonical intra-class order (determinism note in class doc).
    // sortWith: same total order as sortBy((aui, cui)) without one key
    // tuple per atom and boxed tuple compares (r20, guide §1.2; both
    // sorts are stable TimSort, so ties — impossible anyway, AUI is the
    // primary key — would order identically).
    val atomsSorted = raw.atoms.sortWith { (x, y) =>
      val c = x.aui.compareTo(y.aui)
      (if (c != 0) c else x.cui.compareTo(y.cui)) < 0
    }
    val pref = PrefLabel.select(atomsSorted, rankByTty, loadOnCuis)
    val alt = atomsSorted.map(_.str).distinct.filter(_ != pref).sorted
    val cuis = atomsSorted.map(_.cui).distinct.sorted
    UmlsConceptRow(
      code = raw.code,
      prefLabel = pref,
      altLabels = alt,
      defs = orEmpty(raw.defs),
      cuis = cuis,
      tuis = orEmpty(raw.tuis).sorted,
      atts = orEmpty(raw.atts),
      rels = orEmpty(raw.rels),
      isRoot = raw.isRoot,
      treeParents = orEmpty(raw.treeParents).sorted)
  }
}

/** `UmlsClass.getPrefLabel` (`umls2rdf.py:295-332`), ported branch-for-
  * branch. "First atom" means first in the canonical (AUI-sorted) order.
  */
object PrefLabel {

  def select(atoms: Seq[AtomRow], rankByTty: Map[String, Int],
      loadOnCuis: Boolean): String =
    if (loadOnCuis) cuisCascade(atoms) else codesRank(atoms, rankByTty)

  /** Codes mode: MRRANK argmax (A7); stable on canonical order for rank
    * ties. Empty MRRANK → require exactly one atom with 'P' in TTY (A9);
    * otherwise fail like the reference ("Unable to select pref label"). */
  private def codesRank(atoms: Seq[AtomRow],
      rankByTty: Map[String, Int]): String = {
    if (rankByTty.nonEmpty) {
      // Missing TTY in MRRANK raised KeyError in the reference; surface
      // the same condition as an explicit error.
      val ranked = atoms.map { a =>
        val r = rankByTty.getOrElse(a.tty,
          throw new IllegalStateException(s"TTY ${a.tty} not in MRRANK"))
        (r, a)
      }
      ranked.maxBy(_._1)(Ordering.Int)._2.str match { case s => s }
    } else {
      val prefAtoms = atoms.filter(_.tty.contains("P"))
      if (prefAtoms.size == 1) prefAtoms.head.str
      else throw new IllegalStateException("Unable to select pref label")
    }
  }

  /** Cuis mode cascade (A8, `umls2rdf.py:296-319`). */
  private def cuisCascade(atoms: Seq[AtomRow]): String = {
    if (atoms.size == 1) return atoms.head.str
    val labels = atoms.map(_.str).distinct
    if (labels.size == 1) return labels.head
    val isPref = atoms.filter(_.ispref == "Y")
    if (isPref.isEmpty) return atoms.head.str
    if (isPref.size == 1) return isPref.head.str
    val prefPf = isPref.filter(_.stt == "PF")
    if (prefPf.isEmpty) return atoms.head.str
    if (prefPf.size == 1) return prefPf.head.str
    val ttyP = atoms.filter(a => a.tty.nonEmpty && a.tty.head == 'P')
    if (ttyP.size == 1) ttyP.head.str
    else atoms.head.str
  }
}
