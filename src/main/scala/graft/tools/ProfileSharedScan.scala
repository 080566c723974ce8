package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.assemble.ConceptAssembler
import graft.sources.UmlsSource

/** One-off profile for the shared-scan decision (VERDICT r4 stretch #8):
  * materializes a 12-SAB UMLS-shaped lake at sf0.1 volume (~600k atoms),
  * then times the 12-SAB assembly sweep reading the parquet directly
  * (12× scans per table) vs through [[UmlsSource.sharedScan]] (1× scan,
  * cached). Run:
  * {{{ sbt 'runMain graft.tools.ProfileSharedScan /root/testdata/sf0.1' }}}
  */
object ProfileSharedScan {
  private val NSabs = 12

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/profile_umls"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    writeLake(spark, sfDir, out)
    val src = UmlsSource.parquet(spark, out)
    val sabs = (0 until NSabs).map(i => s"S$i")

    def sweep(s: UmlsSource): Long =
      sabs.map { sab =>
        new ConceptAssembler(spark, s, sab).conceptsColumns()
          .agg(count(lit(1))).head().getLong(0)
      }.sum

    // warm up parquet reader + codegen once, then time each mode twice
    sweep(src)
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$label%-8s ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        s"($n concepts)")
    }
    time("direct")(sweep(src))
    time("direct")(sweep(src))
    val shared = UmlsSource.sharedScan(src, sabs)
    try { time("shared")(sweep(shared)); time("shared")(sweep(shared)) }
    finally shared.release()
    spark.stop()
  }

  /** The q25s scaleSource projections, split over NSabs SABs by orderkey,
    * written as at-rest parquet so the scan being saved is a real one. */
  private def writeLake(spark: SparkSession, sfDir: String,
      out: String): Unit = {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    val part = spark.read.parquet(s"$sfDir/part.parquet")
    val e = lit("")
    def sabOf(key: org.apache.spark.sql.Column) =
      concat(lit("S"), pmod(key, lit(NSabs)))
    val atoms = li.select(
      concat(lit("C"), col("l_orderkey")).as("CUI"), lit("ENG").as("LAT"),
      lit("P").as("TS"), e.as("LUI"), lit("PF").as("STT"), e.as("SUI"),
      when(col("l_linenumber") === 1, "Y").otherwise("N").as("ISPREF"),
      concat(lit("A"), col("l_orderkey") * 100 + col("l_linenumber"))
        .as("AUI"),
      e.as("SAUI"), e.as("SCUI"), e.as("SDUI"),
      sabOf(col("l_orderkey")).as("SAB"),
      when(col("l_linenumber") === 1, "PT").otherwise("SY").as("TTY"),
      concat(lit("X"), col("l_partkey")).as("CODE"),
      concat(lit("part "), col("l_partkey"), lit(" order "),
        col("l_orderkey"), lit(" line "), col("l_linenumber")).as("STR"),
      lit("0").as("SRL"), lit("N").as("SUPPRESS"), e.as("CVF"))
    val defs = ord.select(
      concat(lit("C"), col("o_orderkey")).as("CUI"),
      concat(lit("A"), col("o_orderkey") * 100 + 1).as("AUI"),
      e.as("ATUI"), e.as("SATUI"), sabOf(col("o_orderkey")).as("SAB"),
      col("o_orderpriority").as("DEF"), lit("N").as("SUPPRESS"), e.as("CVF"))
    val atts = part.select(
      concat(lit("C"), col("p_partkey")).as("CUI"), e.as("LUI"), e.as("SUI"),
      e.as("METAUI"), lit("AUI").as("STYPE"),
      concat(lit("X"), col("p_partkey")).as("CODE"), e.as("ATUI"),
      e.as("SATUI"), lit("SIZE").as("ATN"),
      sabOf(col("p_partkey")).as("SAB"),
      col("p_size").cast("string").as("ATV"), lit("N").as("SUPPRESS"),
      e.as("CVF"))
    val sty = ord.select(
      concat(lit("C"), col("o_orderkey")).as("CUI"),
      concat(lit("T"), col("o_custkey") % 50).as("TUI"),
      e.as("STN"), e.as("STY"), e.as("ATUI"), e.as("CVF"))
    val rank = spark.createDataFrame(
      java.util.Arrays.asList((0 until NSabs).flatMap(i => Seq(
        org.apache.spark.sql.Row("0400", s"S$i", "PT", "N"),
        org.apache.spark.sql.Row("0300", s"S$i", "SY", "N"))): _*),
      UmlsSource.schemaOf("MRRANK"))
    val empty = (n: String) => UmlsSource.empty(spark, n)
    Seq("MRCONSO" -> atoms, "MRDEF" -> defs, "MRSAT" -> atts,
      "MRSTY" -> sty, "MRRANK" -> rank,
      "MRREL" -> empty("MRREL"), "MRSAB" -> empty("MRSAB"),
      "MRDOC" -> empty("MRDOC")).foreach { case (n, df) =>
      df.write.mode("overwrite").parquet(s"$out/$n.parquet")
    }
  }
}
