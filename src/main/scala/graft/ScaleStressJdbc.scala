package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.RowDataSourceScanExec
import org.apache.spark.sql.functions._

import graft.sources.UmlsSource

/** The partitioned-JDBC scan stress plane (r18 verdict #1) — S1's
  * production claim is that partitioned `spark.read.jdbc` replaces the
  * reference's O(n²) LIMIT/OFFSET pagination (`umls2rdf.py:228-259,198`:
  * every page re-scans the table server-side), and until r19 that claim
  * rested on q189's 74-row in-memory Derby fixture. This plane plants a
  * factor-scaled MRCONSO-shaped table (3,000·factor rows, exact modular
  * row mix) in a FILE-BACKED Derby, then proves the three things the
  * fixture could not:
  *
  *   - **stride partitioning is exact**: a `partitionColumn`/
  *     `numPartitions` read yields exactly `numPartitions` non-empty
  *     slices whose per-partition row counts match the planted
  *     arithmetic (recorded as facts), and their union is the table —
  *     no row lost to a boundary, none duplicated;
  *   - **the F1 predicate executes IN THE DATABASE**: the
  *     SAB+LAT+SUPPRESS filter (`umls2rdf.py:206` ≙
  *     `ConceptAssembler` F1) must appear in the scan's PushedFilters
  *     AND the scan's `numOutputRows` metric must equal the planted
  *     filtered count — far below the table size — proving rows were
  *     dropped server-side, not shipped-then-filtered (the difference
  *     between a 100 TB source shipping 8/30ths of a table and all of
  *     it);
  *   - **the production predicate-split path scales**: [[UmlsSource.jdbc]]
  *     with [[UmlsSource.rangeSplit]] (the q189 entry point) reads the
  *     same table complete-and-disjoint, gated by
  *     `count == countDistinct(ROW_ID) == planted`.
  *
  * Linearity between the factor/10 and factor rounds (≤ [[LinearityCeiling]]
  * for 10× the data) guards against the quadratic shape the reference
  * exhibits.
  *
  * **Multi-JVM twin** (`SPARK_GRAFT_MASTER=local-cluster[2,8,4096]`):
  * executor-side JDBC connection fan-out is exactly what `local[32]`
  * hides — every thread shares the driver's embedded engine. Embedded
  * Derby refuses dual boot of a file database across JVMs (XSDB6), so
  * the plane serves the built database through Derby's **jar
  * subprotocol** (`jdbc:derby:jar:(file)db`), the documented
  * read-only-media mode where any number of JVMs boot their own
  * instance — verified empirically before this plane was built. Each
  * executor then opens real connections and runs its partition queries
  * in its own engine, which is the production S1 topology (a network
  * database reachable from every executor, `umls2rdf.py:64-70`) modulo
  * the transport. The database is built once per run, cleanly shut
  * down (a jar database cannot replay a recovery log), and zipped.
  */
object ScaleStressJdbc {

  /** Max wall ratio between the factor and factor/10 scan rounds (10×
    * the data; same rationale as [[ScaleStressAssembly.LinearityCeiling]]). */
  val LinearityCeiling = 15.0

  val Sab = "STRESS"
  val NumStridePartitions = 16

  /** Rows per 30-id block matching the F1 predicate — see [[plantRow]]:
    * SAB cycles %3 (STRESS at 0), LAT %10 (FRE at 9), SUPPRESS %5
    * ('Y' at 4). STRESS ids per 30: {0,3,..,27}; minus FRE {9}; minus
    * suppressed {9,24} → 8 of 30. */
  val F1PerBlock = 8L

  def main(args: Array[String]): Unit = {
    val factor = if (args.length > 0) args(0).toInt else 100
    val workDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft_jdbc").toString
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.withMaster(SparkSession.builder(), cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val steps = ArrayBuffer[(String, Double)]()
    val facts = ArrayBuffer[(String, Long)]()
    val violations = ArrayBuffer[String]()
    run(spark, factor, workDir, steps, facts, violations)
    println("{" + StressJson.fragment(steps, facts, violations) + "}")
    spark.stop()
    if (violations.nonEmpty) sys.exit(1)
  }

  /** Derby engine-wide properties, set before ANY boot in this JVM (the
    * [[graft.catalog.UmlsQueries]] DerbyFixtureLoader discipline):
    * derby.log out of the CWD, and a page cache sized for a multi-
    * hundred-MB read-only database (default 1000×4k pages would thrash
    * every scan). Harmless if the engine already booted — Derby reads
    * them once. */
  private def derbyJvmProps(): Unit = {
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home",
        java.nio.file.Files.createTempDirectory("graft-derby-stress")
          .toString)
    if (System.getProperty("derby.storage.pageCacheSize") == null)
      System.setProperty("derby.storage.pageCacheSize", "20000")
  }

  /** Build the planted MRCONSO-shaped table in a fresh file-backed
    * Derby under `dir`, shut it down cleanly, and zip it for the jar
    * subprotocol. Returns the jar path. Row mix (id in 0 until nRows):
    * SAB = STRESS/OTHER1/OTHER2 by id%3; LAT = FRE at id%10==9 else
    * ENG; SUPPRESS = 'Y' at id%5==4 else 'N'; CUI = C(id/5);
    * CODE = X(id/10). Every planted count below is pure arithmetic on
    * this mix. */
  private def buildDb(dir: String, nRows: Long): String = {
    derbyJvmProps()
    val dbDir = s"$dir/stressdb"
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val conn = java.sql.DriverManager
      .getConnection(s"jdbc:derby:$dbDir;create=true")
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      st.execute("CREATE TABLE MRCONSO (" +
        "ROW_ID INT NOT NULL PRIMARY KEY, CUI VARCHAR(16), " +
        "AUI VARCHAR(16), SAB VARCHAR(16), LAT VARCHAR(8), " +
        "SUPPRESS VARCHAR(2), CODE VARCHAR(16), STR VARCHAR(64))")
      st.close()
      val ps = conn.prepareStatement(
        "INSERT INTO MRCONSO VALUES (?,?,?,?,?,?,?,?)")
      var i = 0L
      while (i < nRows) {
        ps.setInt(1, i.toInt)
        ps.setString(2, "C" + (i / 5))
        ps.setString(3, "A" + i)
        ps.setString(4, (i % 3) match {
          case 0 => Sab; case 1 => "OTHER1"; case _ => "OTHER2"
        })
        ps.setString(5, if (i % 10 == 9) "FRE" else "ENG")
        ps.setString(6, if (i % 5 == 4) "Y" else "N")
        ps.setString(7, "X" + (i / 10))
        ps.setString(8, "atom " + i + " of code X" + (i / 10))
        ps.addBatch()
        i += 1
        if (i % 20000 == 0) ps.executeBatch()
        if (i % 200000 == 0) conn.commit()
      }
      ps.executeBatch()
      conn.commit()
      ps.close()
    } finally conn.close()
    // clean db-level shutdown: a jar database cannot replay recovery
    try java.sql.DriverManager
      .getConnection(s"jdbc:derby:$dbDir;shutdown=true")
    catch { case e: java.sql.SQLException
        if e.getSQLState == "08006" => () }
    val jar = s"$dir/stressdb.jar"
    zipDir(new java.io.File(dbDir), "stressdb", jar)
    jar
  }

  /** Zip `base` under entry prefix `prefix` into `outPath` (a jar is a
    * zip; Derby's jar subprotocol reads entries by path). Entries are
    * STORED, not deflated: Derby's page reads inside a jar database are
    * random-access (open the entry's stream, skip to the page offset),
    * and skipping into a DEFLATED entry inflates everything before the
    * offset — O(file size) per 4k page, which turned the filtered scan
    * measurably super-linear before this was caught. Stored entries
    * skip by seeking. Lock files are excluded — live-engine state,
    * meaningless read-only. */
  private def zipDir(base: java.io.File, prefix: String,
      outPath: String): Unit = {
    val out = new java.util.zip.ZipOutputStream(
      new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(outPath), 1 << 20))
    def walk(f: java.io.File, entry: String): Unit = {
      if (f.isDirectory) {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(k => walk(k, s"$entry/${k.getName}"))
      } else if (!f.getName.endsWith(".lck")) {
        val ze = new java.util.zip.ZipEntry(entry)
        ze.setMethod(java.util.zip.ZipEntry.STORED)
        ze.setSize(f.length())
        val crc = new java.util.zip.CRC32()
        val buf = new Array[Byte](1 << 16)
        val in1 = new java.io.FileInputStream(f)
        try {
          var n = in1.read(buf)
          while (n >= 0) { crc.update(buf, 0, n); n = in1.read(buf) }
        } finally in1.close()
        ze.setCrc(crc.getValue)
        out.putNextEntry(ze)
        java.nio.file.Files.copy(f.toPath, out)
        out.closeEntry()
      }
    }
    try walk(base, prefix) finally out.close()
  }

  /** Ensure every JVM that will open a JDBC partition has the Derby
    * engine properties set BEFORE its first boot: driver-side directly;
    * executor-side via one barrier task per slot (the
    * `graft.catalog.UmlsQueries` DerbyUmls.ensure shape — covers the
    * fixed local-cluster topology this plane runs on). */
  private def prewarm(spark: SparkSession): Unit = {
    derbyJvmProps()
    if (!spark.sparkContext.isLocal) {
      val slots = math.max(spark.sparkContext.defaultParallelism, 1)
      spark.sparkContext.range(0L, slots.toLong, 1L, slots)
        .barrier()
        .mapPartitions { _ =>
          derbyJvmProps()
          Iterator.single(1)
        }.count()
    }
  }

  private def props(): java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p.setProperty("fetchsize", "10000")
    p
  }

  /** Count via an explicit aggregate DataFrame so the executed scan's
    * metrics stay reachable (df.count() builds a throwaway execution;
    * and under AQE the outer plan is an AdaptiveSparkPlanExec whose
    * direct children are the UNEXECUTED initial copy — the live metrics
    * hang off its resolved executedPlan). */
  private def countWithScan(df: DataFrame): (Long, Long, String) = {
    val agg = df.groupBy().count()
    val n = agg.collect()(0).getLong(0)
    // AQE hides the live tree twice over: the outer plan is an
    // AdaptiveSparkPlanExec whose direct children are the UNEXECUTED
    // initial copy, and materialized stages are QueryStageExec LEAVES
    // (their `plan` is a member, not a child), so a plain collect()
    // reads metrics that are all zero. Recurse through both.
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[RowDataSourceScanExec] = p match {
      case s: RowDataSourceScanExec => Seq(s)
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive
          .QueryStageExec => scans(q.plan)
      case other => other.children.flatMap(scans)
    }
    val found = scans(agg.queryExecution.executedPlan)
    val scanRows = found.map(_.metrics("numOutputRows").value).sum
    (n, scanRows, found.map(_.toString).mkString("\n"))
  }

  def run(spark: SparkSession, factor: Int, workDir: String,
      steps: ArrayBuffer[(String, Double)],
      facts: ArrayBuffer[(String, Long)],
      violations: ArrayBuffer[String]): Unit = {
    require(factor % 10 == 0 && factor >= 100,
      s"jdbc plant needs factor % 10 == 0 and factor >= 100, got $factor")
    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      steps += name -> (System.nanoTime() - t0) / 1e9
      System.err.println(f"[scale] $name%-28s ${steps.last._2}%7.2f s")
      r
    }
    prewarm(spark)
    // PushedFilters renders through the plan's metadata string, which
    // truncates at 100 chars by default — long enough to hide the third
    // pushed predicate and fail the assertion spuriously
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")

    for (f <- Seq(factor / 10, factor)) {
      val nRows = 3000L * f
      val dir = s"$workDir/jdbc_x$f"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      def fail(msg: String): Unit = violations += s"jdbc x$f: $msg"
      def expectEq(what: String, got: Any, want: Any): Unit =
        if (got != want) fail(s"$what = $got, planted $want")

      val jar = timed(s"jdbc_build_x$f") { buildDb(dir, nRows) }
      facts += s"jdbc_db_jar_kb_x$f" ->
        (new java.io.File(jar).length() / 1024)
      val url = s"jdbc:derby:jar:($jar)stressdb"

      // ---- stride partitioning: exact slices, union == table --------
      val stride = spark.read.jdbc(url, "MRCONSO", "ROW_ID",
        0L, nRows, NumStridePartitions, props())
      val perPid = timed(s"jdbc_stride_scan_x$f") {
        stride.groupBy(spark_partition_id().as("pid"))
          .agg(count(lit(1)).as("n"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      }
      expectEq("stride partition count", perPid.length.toLong,
        NumStridePartitions.toLong)
      val strideRows = nRows / NumStridePartitions
      for ((pid, n) <- perPid)
        expectEq(s"stride partition $pid rows", n, strideRows)
      facts += s"jdbc_stride_partitions_x$f" -> perPid.length.toLong
      facts += s"jdbc_stride_rows_per_partition_x$f" -> strideRows
      facts += s"jdbc_rows_x$f" ->
        perPid.map(_._2).sum

      // ---- F1 pushdown: the predicate runs in the database ----------
      val f1 = stride.filter(col("SAB") === Sab &&
        col("LAT") === "ENG" && col("SUPPRESS") === "N")
      val plantedF1 = nRows / 30 * F1PerBlock
      val (nF1, scanRowsF1, planF1) = timed(s"jdbc_f1_filtered_x$f") {
        countWithScan(f1)
      }
      expectEq("F1 filtered count", nF1, plantedF1)
      for (want <- Seq(s"EqualTo(SAB,$Sab)", "EqualTo(LAT,ENG)",
          "EqualTo(SUPPRESS,N)"))
        if (!planF1.contains(want))
          fail(s"F1 predicate $want missing from PushedFilters — " +
            "the filter would run in Spark, shipping the whole table")
      expectEq("F1 scan numOutputRows (DB-side filtering)",
        scanRowsF1, plantedF1)
      if (scanRowsF1 >= nRows)
        fail(s"scan returned $scanRowsF1 rows >= table $nRows — " +
          "pushdown did not reduce shipped rows")
      facts += s"jdbc_f1_rows_x$f" -> nF1
      facts += s"jdbc_f1_scan_rows_x$f" -> scanRowsF1

      // ---- the production predicate-split path (q189's entry point) --
      // rangeSplit cuts on the string CUI: complete + disjoint is the
      // contract, proven by count == countDistinct(ROW_ID) == planted
      val src = UmlsSource.jdbc(spark, url, props(), numPartitions = 4,
        split = UmlsSource.rangeSplit(Seq("C2", "C4", "C6")))
      val (nSplit, dSplit) = timed(s"jdbc_rangesplit_scan_x$f") {
        val r = src.table("MRCONSO")
          .agg(count(lit(1)).as("n"),
            count_distinct(col("ROW_ID")).as("d")).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      expectEq("rangeSplit union count", nSplit, nRows)
      expectEq("rangeSplit distinct ROW_ID (disjointness)", dSplit, nRows)

      // ---- a typical scan+agg: per-SAB counts are planted exactly ----
      val bySab = timed(s"jdbc_agg_by_sab_x$f") {
        stride.groupBy("SAB").agg(count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      expectEq("SAB=STRESS rows", bySab.getOrElse(Sab, -1L), nRows / 3)
      expectEq("SAB=OTHER1 rows", bySab.getOrElse("OTHER1", -1L),
        nRows / 3)
      expectEq("SAB=OTHER2 rows", bySab.getOrElse("OTHER2", -1L),
        nRows / 3)
    }

    // ---- linearity: factor vs factor/10 per scan leg ------------------
    val t = steps.toMap
    for (leg <- Seq("stride_scan", "f1_filtered", "rangesplit_scan")) {
      val small = math.max(t(s"jdbc_${leg}_x${factor / 10}"), 2.0)
      val big = t(s"jdbc_${leg}_x$factor")
      facts += s"jdbc_${leg}_scale_ratio_x$factor" ->
        math.round(big / small * 10)
      if (big > small * LinearityCeiling)
        violations += s"jdbc_$leg x$factor took " +
          s"${StressJson.f3(big)}s vs ${StressJson.f3(small)}s at " +
          s"x${factor / 10} — ratio ${StressJson.f3(big / small)} > " +
          s"$LinearityCeiling for 10x the data (the LIMIT/OFFSET " +
          "quadratic shape this plane exists to rule out)"
    }
  }
}
