package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{LogPipeline, TokenSequences}
object HotLoop {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 128)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-bench")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val seqs = TokenSequences.synthetic(spark, 2000000L, 256)
    while (true) {
      val t0 = System.nanoTime()
      val routed = LogPipeline.parseEnrichRoute(spark, seqs, 128, packTransport = true)
      routed.write.format("noop").mode("overwrite").save()
      println(f"full+payload: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
  }
}
