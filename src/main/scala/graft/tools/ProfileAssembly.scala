package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness for the q25s assembly spine: times each
  * stage of the dataflow separately so optimization targets the real
  * cost, not a guess. Not part of the catalog. */
object ProfileAssembly {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$d/lineitem.parquet").count()

    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time[T](name: String)(f: => T): T = {
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      val r = f
      val w = (System.nanoTime() - t0) / 1e9
      val c = (osBean.getProcessCpuTime - c0) / 1e9
      System.err.println(f"[asm] $name%-34s $w%8.2f s wall  $c%8.1f s cpu")
      r
    }

    val mk = graft.catalog.UmlsQueries.scaleAssembler(spark, d)

    // Full pipeline (what q25s pays), then a fresh assembler per stage so
    // the shared cache doesn't credit later stages. Columnar timed FIRST
    // so JIT warmup biases against it.
    time("full columnar (1st)") {
      val asm = mk()
      asm.conceptsColumns().queryExecution.toRdd.count()
      asm.unpersistShared()
    }
    time("full typed (2nd)") {
      val asm = mk()
      asm.concepts().toDF().queryExecution.toRdd.count()
      asm.unpersistShared()
    }
    time("full columnar (3rd)") {
      val asm = mk()
      asm.conceptsColumns().queryExecution.toRdd.count()
      asm.unpersistShared()
    }
    time("full typed (4th)") {
      val asm = mk()
      asm.concepts().toDF().queryExecution.toRdd.count()
      asm.unpersistShared()
    }
    time("atomsShared materialize") {
      val asm = mk()
      asm.atoms.queryExecution.toRdd.count()
      asm.unpersistShared()
    }
    val asm2 = mk()
    time("relsGroupedWithRoots") {
      asm2.relsGroupedWithRoots.queryExecution.toRdd.count()
    }
    time("assembled (joins only)") {
      asm2.assembled().queryExecution.toRdd.count()
    }
    time("concepts (typed finish)") {
      asm2.concepts().queryExecution.toRdd.count()
    }
    time("columnar finish (cached base)") {
      asm2.conceptsColumns().queryExecution.toRdd.count()
    }
    // Columnar finish sub-stages over the SAME assembled base (cache warm):
    val raw = asm2.assembled().toDF()
    val sortedAtoms = transform(
      array_sort(transform(col("atoms"), a =>
        struct(a.getField("aui").as("k1"), a.getField("cui").as("k2"),
          a.as("v")))),
      x => x.getField("v"))
    time("sub: keyed-struct sort only") {
      raw.select(size(sortedAtoms).as("n")).queryExecution.toRdd.count()
    }
    time("sub: sort + strs transform") {
      raw.select(size(array_distinct(
        transform(sortedAtoms, a => a.getField("str")))).as("n"))
        .queryExecution.toRdd.count()
    }
    time("sub: sort via sort_array raw") {
      raw.select(size(sort_array(col("atoms"))).as("n"))
        .queryExecution.toRdd.count()
    }
    time("q25s projection on top") {
      asm2.concepts().toDF()
        .select(col("code"), col("prefLabel"),
          size(col("altLabels")).as("n_alt"))
        .queryExecution.toRdd.count()
    }
    asm2.unpersistShared()
    spark.stop()
  }
}
