package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-decomposition probe for the scaling pipeline: times individual
  * sub-stages of render→parse in isolation (`args = cores rows
  * stage...`), printing `PROBE <stage> <sec>` per stage. Used to
  * attribute N→4N efficiency loss to a specific sub-stage (regex,
  * format_string render, timestamp compose, token-payload carry) rather
  * than guessing from end-to-end walls. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val rows = args(1).toLong
    val stages = if (args.length > 2) args.drop(2).toSeq
      else Seq("gen", "render-notok", "render+tok", "parse-nots-notok",
        "parse-full-notok", "parse-full+tok")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-stageprobe-$cores")
      .config("spark.sql.shuffle.partitions", 128)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-bench")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.pipeline.{LogPipeline, TokenSequences}
    def seqs = TokenSequences.synthetic(spark, rows, 256)
    def renderedNoTok = LogPipeline.renderLines(seqs).select("line")
    def rendered = LogPipeline.renderLines(seqs)
      .select(col("line"), col("tokens").as("tokens_in"))
    val td = LogPipeline.tableDef
    val tdNoTs = td.copy(columns =
      td.columns.filterNot(c => Set("ts", "bulk_ts")(c.name)))

    // ts columns split into their two ingredients: typed extraction of
    // the 12 underlying groups (casts, no compose) vs compose on top
    import graft.core.{ColumnDef, ColumnSource, ValueType}
    def g(p: String, i: Int) = ColumnSource.Group(p, i)
    val partCols = Seq("p_ingest" -> "i", "p_bulk" -> "b").flatMap { case (p, px) =>
      Seq(
        ColumnDef(s"${px}_y", ValueType.IntT, g(p, 6)),
        ColumnDef(s"${px}_mon", ValueType.TextT, g(p, 1)),
        ColumnDef(s"${px}_d", ValueType.IntT, g(p, 2)),
        ColumnDef(s"${px}_h", ValueType.IntT, g(p, 3)),
        ColumnDef(s"${px}_mi", ValueType.IntT, g(p, 4)),
        ColumnDef(s"${px}_s", ValueType.IntT, g(p, 5)))
    }
    val tdParts = tdNoTs.copy(columns = tdNoTs.columns ++ partCols)

    def df(stage: String): DataFrame = stage match {
      case "gen" => seqs
      case "render-notok" => renderedNoTok
      case "render+tok" => rendered
      case "parse-parts" =>
        graft.parse.Extractor.parse(renderedNoTok, tdParts, lineCol = "line")
      case "parse-parts-compose" =>
        val base = graft.parse.Extractor.parse(renderedNoTok, tdParts, lineCol = "line")
        Seq("i", "b").foldLeft(base) { (d, px) =>
          d.withColumn(s"${px}_ts", graft.functions.ComposeTimestamp(
            col(s"${px}_y"), graft.parse.Extractor.monthNum(col(s"${px}_mon")),
            col(s"${px}_d"), col(s"${px}_h"), col(s"${px}_mi"),
            col(s"${px}_s").cast("long") * 1000000L))
        }
      case "parse-1ts" =>
        graft.parse.Extractor.parse(renderedNoTok,
          td.copy(columns = td.columns.filterNot(_.name == "bulk_ts")),
          lineCol = "line")
      case "parts-compose-filter" =>
        val d = df("parse-parts-compose")
        d.filter(d.columns.map(col(_).isNotNull).reduce(_ || _))
      case "parse-nots-notok" =>
        graft.parse.Extractor.parse(renderedNoTok, tdNoTs, lineCol = "line")
      case "parse-full-notok" =>
        graft.parse.Extractor.parse(renderedNoTok, td, lineCol = "line")
      case "parse-full+tok" =>
        graft.parse.Extractor.parse(rendered, td, lineCol = "line",
          carry = Seq("tokens_in"))
      case other => sys.error(s"unknown stage: $other")
    }

    stages.foreach {
      case s if s.startsWith("plantime:") =>
        val name = s.stripPrefix("plantime:")
        (1 to 2).foreach { i =>
          val t0 = System.nanoTime()
          df(name).queryExecution.executedPlan // fresh DataFrame each call
          println(f"PROBE plantime-$name-$i ${(System.nanoTime() - t0) / 1e9}%.2f")
        }
      case s if s.startsWith("codegen:") =>
        import org.apache.spark.sql.execution.debug._
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"/tmp/graft_codegen_${s.stripPrefix("codegen:")}.txt"),
          df(s.stripPrefix("codegen:")).queryExecution.debug.codegenToSeq()
            .map { case (subtree, code, _) => s"== $subtree\n$code" }
            .mkString("\n\n").getBytes("UTF-8"))
      case s if s.startsWith("explain:") =>
        val plan = df(s.stripPrefix("explain:")).queryExecution.executedPlan.toString()
        Seq("regex_captures", "compose_timestamp", "element_at", "lower(substring")
          .foreach(tok => println(
            s"PLANCOUNT $tok ${plan.sliding(tok.length).count(_ == tok)}"))
        java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/graft_plan.txt"),
          plan.getBytes("UTF-8"))
      case s =>
        val d = df(s)
        d.write.format("noop").mode("overwrite").save() // warm
        val t0 = System.nanoTime()
        d.write.format("noop").mode("overwrite").save()
        println(f"PROBE $s%s ${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
