package graft.tools
import org.apache.spark.sql.SparkSession
object ProfileJit {
  def main(args: Array[String]): Unit = {
    val wsc = sys.env.getOrElse("WSC", "true")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.wholeStage", wsc)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$d/lineitem.parquet").count()
    if (sys.env.getOrElse("WARM", "0") == "1") {
      import org.apache.spark.sql.functions._
      val osb = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.asInstanceOf[com.sun.management.OperatingSystemMXBean]
      val cw = osb.getProcessCpuTime; val tw = System.nanoTime()
      val syn = spark.range(200000L)
        .select(col("id"), (col("id") % 5000).as("k"),
          concat(lit("v"), col("id")).as("s"))
      val grouped = syn.groupBy("k")
        .agg(collect_list(struct(col("s").as("a"), col("s").as("b"))).as("xs"))
        .select(col("k"), array_sort(col("xs")).as("xs"))
        .select(col("k"),
          size(filter(col("xs"), x => x.getField("a").startsWith("v1"))).as("n1"),
          size(array_distinct(transform(col("xs"), x => x.getField("a")))).as("n2"))
      val dim = spark.range(5000L).select(col("id").as("k"), (col("id")*2).as("w"))
      grouped.join(dim, "k").join(syn.groupBy("k").count(), "k")
        .queryExecution.toRdd.count()
      println(f"[jit] warmup ${(System.nanoTime()-tw)/1e9}%.2f s wall ${(osb.getProcessCpuTime-cw)/1e9}%.1f s cpu")
    }
    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.asInstanceOf[com.sun.management.OperatingSystemMXBean]
    import org.apache.spark.metrics.source.CodegenMetrics
    val jitBean = java.lang.management.ManagementFactory.getCompilationMXBean
    def janinoMs = CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
    def janinoN = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    val j0 = jitBean.getTotalCompilationTime; val ja0 = janinoMs; val jn0 = janinoN
    val c0 = osBean.getProcessCpuTime; val t0 = System.nanoTime()
    val asm = graft.catalog.UmlsQueries.scaleAssembler(spark, d)()
    asm.conceptsColumns().queryExecution.toRdd.count()
    println(f"[jit] wsc=$wsc first-run ${(System.nanoTime()-t0)/1e9}%.2f s wall ${(osBean.getProcessCpuTime-c0)/1e9}%.1f s cpu  jit ${(jitBean.getTotalCompilationTime-j0)/1e3}%.1f s  janino ${(janinoMs-ja0)/1e3}%.1f s over ${janinoN-jn0} classes")
    val c1 = osBean.getProcessCpuTime; val t1 = System.nanoTime(); val j1 = jitBean.getTotalCompilationTime
    val asm2 = graft.catalog.UmlsQueries.scaleAssembler(spark, d)()
    asm2.conceptsColumns().queryExecution.toRdd.count()
    println(f"[jit] second-run ${(System.nanoTime()-t1)/1e9}%.2f s wall ${(osBean.getProcessCpuTime-c1)/1e9}%.1f s cpu  jit ${(jitBean.getTotalCompilationTime-j1)/1e3}%.1f s")
    spark.stop()
  }
}
