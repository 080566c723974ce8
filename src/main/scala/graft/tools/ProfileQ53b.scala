package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
/** Throwaway: xxhash64 vs portable-md5 incremental dedup at FULL corpus
  * volume, same composition — the fair comparison r8's bench lacked. */
object ProfileQ53b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(s"$d/documents.parquet").count()
    def run(portable: Boolean): Long = {
      val corpus = graft.catalog.Tables.documents(spark, d)
      val maxId = corpus.agg(max("doc_id")).head().getLong(0)
      val off = math.pow(10, maxId.toString.length.toDouble).toLong
      def entering(mod: Int, offset: Long) =
        corpus.filter(col("doc_id") % mod === 0)
          .select((col("doc_id") + offset).as("doc_id"),
            when(col("doc_id") % 2 === 0, col("text"))
              .otherwise(concat(col("text"), lit(" zq"),
                col("doc_id") % 10)).as("text"))
      val batch = entering(3, off).unionByName(entering(15, 2 * off))
      val index = Dedup.dedupIndex(corpus, portable = portable)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = Dedup.dedupIncremental(batch, index, portable = portable)
        .queryExecution.toRdd.count()
      index.unpersist(); n
    }
    for (p <- Seq(false, true, false, true)) {
      val t0 = System.nanoTime()
      val n = run(p)
      println(f"[q53] portable=$p ${(System.nanoTime()-t0)/1e9}%.2f s ($n kept)")
    }
    spark.stop()
  }
}
