package graft.tools
import org.apache.spark.sql.SparkSession
object StreamBenchMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.streaming.StreamBench.run(spark, seconds = 10)
    spark.stop()
  }
}
