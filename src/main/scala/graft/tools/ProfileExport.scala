package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Throwaway: stage timing of the q25e full-export dataflow. */
object ProfileExport {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    spark.read.parquet(s"$d/lineitem.parquet").count()
    val osb = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time[T](name: String)(f: => T): T = {
      val c0 = osb.getProcessCpuTime; val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[exp] $name%-30s ${(System.nanoTime()-t0)/1e9}%7.2f s wall ${(osb.getProcessCpuTime-c0)/1e9}%7.1f s cpu")
      r
    }
    // Run the whole entry twice: first = cold, second = steady.
    for (tag <- Seq("cold", "warm")) {
      time(s"q25e full ($tag)") {
        graft.catalog.Queries.byName("q25e_export_e2e")(spark, d)
          .queryExecution.toRdd.count()
      }
    }
    // Stage decomposition (fresh assembler; warm JVM)
    val src = graft.catalog.UmlsQueries.scaleAssembler(spark, d)()
    time("assembled only") { src.assembled().queryExecution.toRdd.count() }
    time("typed finish (concepts)") { src.concepts().queryExecution.toRdd.count() }
    import graft.model.UmlsConceptRow
    import graft.render.{ConceptRenderer, RenderConfig}
    val cfg = RenderConfig(ns = "http://x/", lang = "en", hierarchy = true,
      hasTree = false, dedupe = true, styUrl = "http://x/STY/")
    time("finish+render (no write)") {
      val rankMap = src.rankByTty
      src.assembled().map { raw =>
        val t = ConceptRenderer.render(
          graft.assemble.ConceptAssembler.finish(raw, rankMap, false), cfg)
        t.text.length.toLong
      }(org.apache.spark.sql.Encoders.scalaLong)
        .queryExecution.toRdd.count()
    }
    src.unpersistShared()
    spark.stop()
  }
}
