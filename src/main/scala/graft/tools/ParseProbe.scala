package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic: plan + timing of the parse stage with/without
  * the token carry, to localize the parse-full+tok anomaly. */
object ParseProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 128)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-bench").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline.{LogPipeline, TokenSequences}
    def build(carry: Boolean) = {
      val seqs = TokenSequences.synthetic(spark, rows, 16)
      val rendered =
        if (carry) LogPipeline.renderLines(seqs).select(col("line"), col("tokens").as("tokens_in"))
        else LogPipeline.renderLines(seqs).select(col("line"))
      graft.parse.Extractor.parse(rendered, LogPipeline.tableDef,
        lineCol = "line", carry = if (carry) Seq("tokens_in") else Nil)
    }
    Seq(false, true).foreach { carry =>
      val df = build(carry)
      val plan = df.queryExecution.optimizedPlan.toString
      println(s"== carry=$carry regex_captures=${"regex_captures".r.findAllIn(plan).length} " +
        s"token_gen=${"token_gen".r.findAllIn(plan).length} " +
        s"render_line=${"render_line".r.findAllIn(plan).length}")
      if (args.contains("plan"))
        println(df.queryExecution.executedPlan.toString.take(8000))
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"  t=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
