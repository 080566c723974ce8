package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.catalog.Queries

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").count()
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[scratch] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s ($n rows)")
    }
    val m = Queries.byName
    // full q25s (assembled + finish map + shape)
    for (i <- 1 to 2)
      time(s"q25s_full_$i") { m("q25s_assembly_scale")(spark, "/root/testdata/sf0.1").queryExecution.toRdd.count() }
    // assembled() only, via reflection-free copy: run the same scaleSource through ConceptAssembler.assembled
    val src = {
      val meth = graft.catalog.UmlsQueries.getClass.getDeclaredMethod("scaleSource", classOf[SparkSession], classOf[String])
      meth.setAccessible(true)
      meth.invoke(graft.catalog.UmlsQueries, spark, "/root/testdata/sf0.1").asInstanceOf[graft.sources.UmlsSource]
    }
    val asm = new graft.assemble.ConceptAssembler(spark, src, "BIG")
    time("assembled_only") { asm.assembled().queryExecution.toRdd.count() }
    time("concepts_typed") { asm.concepts().queryExecution.toRdd.count() }
    time("q37_components") { m("q37_neardup_components")(spark, "/root/testdata/sf0.1").queryExecution.toRdd.count() }
    spark.stop()
  }
}
