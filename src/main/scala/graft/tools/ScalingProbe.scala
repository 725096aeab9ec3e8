package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{LogPipeline, TokenSequences}

/** Diagnostic: per-stage timings at two parallelism levels to locate
  * what prevents N->4N scaling. Not part of the driver contract. */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(400000L)
    args.drop(1).map(_.toInt).toSeq.foreach { cores =>
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .appName(s"probe-$cores")
        .config("spark.sql.shuffle.partitions", 128)
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir", "/dev/shm/graft-bench")
        .config("spark.shuffle.compress", sys.env.getOrElse("PROBE_COMPRESS", "true"))
        .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROBE_AQE", "true"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      def time(label: String)(f: => Unit): Unit = {
        f // warm
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          f
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[$cores cores] $label: ${ts.map(t => f"$t%.2f").mkString(" ")} s")
      }
      val seqs = TokenSequences.synthetic(spark, rows, 256)
      time("gen-only (sum n_tok)") {
        seqs.agg(sum(col("n_tok"))).collect()
      }
      time("gen+render+parse (count by sink)") {
        LogPipeline.parse(LogPipeline.renderLines(seqs).select(col("line")))
          .groupBy(col("sink")).count().collect()
      }
      time("gen+tokens+render+parse+carry (no shuffle)") {
        LogPipeline.parse(
          LogPipeline.renderLines(seqs).select(col("line"), col("tokens").as("tokens_in")),
          carry = Seq("tokens_in"))
          .agg(sum(size(col("tokens_in")))).collect()
      }
      time("full: +enrich +salted-repartition +sink aggregates") {
        val routed = LogPipeline.parseEnrichRoute(spark, seqs, 128, packTransport = true)
        LogPipeline.sinkAggregates(routed).collect()
      }
      time("payload no-shuffle: parse+enrich (incl tokens) to noop sink") {
        val rendered = LogPipeline.renderLines(seqs)
          .select(col("line"), col("tokens").as("tokens_in"))
        val parsed = LogPipeline.parse(rendered, carry = Seq("tokens_in"))
        LogPipeline.enrich(parsed, LogPipeline.sourceDim(spark))
          .write.format("noop").mode("overwrite").save()
      }
      time("full+payload: routed rows (incl tokens) to noop sink") {
        val routed = LogPipeline.parseEnrichRoute(spark, seqs, 128, packTransport = true)
        routed.write.format("noop").mode("overwrite").save()
      }
      spark.stop()
    }
  }
}
