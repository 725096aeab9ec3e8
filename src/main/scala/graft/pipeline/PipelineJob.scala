package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

import graft.table.{Manifest, ManifestTable, SinkLineage}

/** Resumable end-to-end run of [[LogPipeline]] into a [[ManifestTable]]:
  * ONE pass over the input (the fan-out is a `partitionBy("sink")` write,
  * not N filtered re-reads — at 10^12 sequences re-scanning per sink is
  * the difference between 1x and sink-count x IO), followed by per-sink
  * lineage/metrics fragments and an atomic snapshot commit.
  *
  * Resume semantics (north rule: "resumable from checkpoint with
  * per-partition lineage + metrics"):
  *  - committed snapshot        → no-op, returns the manifest;
  *  - crash mid-data-write      → data rewritten (idempotent overwrite);
  *  - crash after data, before commit → data reused, only the cheap
  *    per-sink counting/lineage step re-runs (per-sink fragments are
  *    themselves idempotent);
  *  - crash between fragments and commit → fragments reused, pointer flip
  *    re-runs.
  */
object PipelineJob {

  final case class RunMetrics(rowsIn: Long, rowsRouted: Long, tokensRouted: Long)

  def run(spark: SparkSession, seqs: DataFrame, tableRoot: String,
      snapshotId: Long, partitions: Int): Manifest = {
    val table = new ManifestTable(tableRoot)
    // already committed? -> resume is a no-op
    if (Files.exists(Paths.get(tableRoot, "_manifests", s"$snapshotId.json")))
      return table.manifest(snapshotId)

    val dataDir = Paths.get(tableRoot, "data", s"snap=$snapshotId")
    val doneMarker = Paths.get(tableRoot, "_pending", s"$snapshotId", "_data_done")

    if (!Files.exists(doneMarker)) {
      val obsIn = Observation(s"pipeline-in-$snapshotId")
      val seqsObs = seqs.observe(obsIn, count(lit(1)).as("rows_in"))
      // packTransport stated explicitly (round-5 advice): the snapshot
      // job's inputs are NOT contractually vocab-bounded — arbitrary
      // int32 token ids must route — so it takes the general unpacked
      // transport deliberately rather than inheriting a default.
      // Callers whose corpus pins the vocab below 2^16 (the TESTDATA
      // tables, the bench generator) should run the packed variant.
      val routed = LogPipeline.parseEnrichRoute(spark, seqsObs, partitions,
        packTransport = false)
      val obs = Observation(s"pipeline-$snapshotId")
      val observed = routed.observe(obs,
        count(lit(1)).as("rows_routed"),
        sum(col("n_tok")).as("tokens_routed"))
      observed.write.mode("overwrite")
        .partitionBy("sink")
        .parquet(dataDir.toString)
      val m = obs.get
      val mIn = obsIn.get
      writeAtomic(doneMarker,
        s"""{"rows_in":${mIn("rows_in")},"rows_routed":${m("rows_routed")},""" +
          s""""tokens_routed":${m("tokens_routed")}}""")
    }

    // per-sink lineage fragments (idempotent; parquet-footer counts only)
    val sinkDirs = Files.list(dataDir).iterator()
    val sinks = scala.collection.mutable.ListBuffer[String]()
    while (sinkDirs.hasNext) {
      val d = sinkDirs.next()
      val name = d.getFileName.toString
      if (name.startsWith("sink=")) sinks += name.stripPrefix("sink=")
    }
    sinks.sorted.foreach { sink =>
      val fragPath = Paths.get(tableRoot, "_pending", s"$snapshotId", s"$sink.json")
      if (!Files.exists(fragPath)) {
        val path = s"$dataDir/sink=$sink"
        val rows = spark.read.parquet(path).count()
        writeAtomic(fragPath,
          Manifest(snapshotId, None, Seq(SinkLineage(sink, rows, path))).toJson)
      }
    }
    table.commit(snapshotId)
  }

  def metrics(tableRoot: String, snapshotId: Long): Option[RunMetrics] = {
    val marker = Paths.get(tableRoot, "_pending", s"$snapshotId", "_data_done")
    if (!Files.exists(marker)) None
    else {
      val s = new String(Files.readAllBytes(marker), StandardCharsets.UTF_8)
      def f(n: String) = ("\"" + n + "\":(\\d+)").r.findFirstMatchIn(s).map(_.group(1).toLong)
      for (r <- f("rows_routed"); t <- f("tokens_routed"))
        yield RunMetrics(f("rows_in").getOrElse(r), r, t)
    }
  }

  private def writeAtomic(path: java.nio.file.Path, content: String): Unit = {
    Files.createDirectories(path.getParent)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
