package graft

import org.apache.spark.sql.SparkSession

/** Master override for the multi-JVM execution-invariance axis (r16
  * verdict #1). Every proof through r16 ran on `local[n]` — one JVM, so
  * custom Expression serialization, broadcast lifecycle, executor-side
  * memo caches (`TokenizerStore`, the WordPiece/Unigram apply caches),
  * and task-retry semantics were structurally unexercised while the
  * 100-TB target runs on real executors. `SPARK_GRAFT_MASTER=
  * local-cluster[2,8,4096]` reruns any main with REAL worker/executor
  * JVMs (still one host, but a true process + serialization boundary);
  * `tools/diff_runs.py` then diffs the catalog against the default run.
  *
  * A `local-cluster` master spawns executors via the Spark standalone
  * Worker path, which builds a bare `java` command: the executor JVM
  * does NOT inherit this JVM's classpath or its `--add-opens` flags
  * (sbt's `run / fork` provides both driver-side only), so the builder
  * ships them explicitly. Requires `SPARK_HOME` (=/opt/spark here) in
  * the environment for the worker's executor-launch machinery. The
  * driver never sets SPARK_GRAFT_MASTER; default runs are byte-identical
  * to before.
  */
object Sessions {
  /** The JDK-17 module opens Spark 4 needs when a JVM is launched
    * outside spark-submit — same list as build.sbt's fork options,
    * duplicated here because executor JVMs are launched by the Worker,
    * not by sbt. */
  private val jdk17AddOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).map(p => s"--add-opens=$p=ALL-UNNAMED")

  /** Apply `SPARK_GRAFT_MASTER` (default `local[cpus]`) plus, for
    * `local-cluster` masters, the executor classpath/module-opens/memory
    * plumbing described above. */
  def withMaster(builder: SparkSession.Builder,
      cpus: String): SparkSession.Builder = {
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val b = builder.master(master)
    if (!master.startsWith("local-cluster")) b
    else {
      // No -Dspark.* here: Spark rejects executor extraJavaOptions that
      // set Spark configs (session timeZone etc. travel with the session
      // conf anyway).
      val execOpts = (jdk17AddOpens :+ "-Dlog4j2.level=warn").mkString(" ")
      b.config("spark.executor.extraClassPath",
          System.getProperty("java.class.path"))
        .config("spark.executor.extraJavaOptions", execOpts)
        .config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXECUTOR_MEM", "3g"))
    }
  }
}
