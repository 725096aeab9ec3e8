package graft.table

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Iceberg-shaped table contract: snapshot ids, a manifest of data files
  * with per-partition lineage, atomic commit, and time-travel-by-snapshot
  * reads — implemented over Parquet + JSON manifests because no
  * `iceberg-spark-runtime` jar exists in this sandbox (SURVEY.md §7.0).
  * Call sites are Iceberg-shaped so the real runtime can slot in via
  * config outside the sandbox.
  *
  * Layout:
  * {{{
  *   <root>/data/snap=<id>/<sink>/part-*.parquet   — immutable data files
  *   <root>/_manifests/<id>.json                   — snapshot manifest
  *   <root>/_current                               — pointer (atomic rename)
  * }}}
  *
  * Commit protocol (crash-safe): data files are fully written under a
  * snapshot-scoped directory first; the manifest is written next; the
  * `_current` pointer is the last, atomic step. A crash before the
  * pointer flip leaves the previous snapshot intact and readable.
  */
final case class SinkLineage(sink: String, rows: Long, path: String)

final case class Manifest(
    snapshotId: Long,
    parentId: Option[Long],
    sinks: Seq[SinkLineage]) {
  def toJson: String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString
    }
    val sinksJson = sinks.map(l =>
      s"""{"sink":"${esc(l.sink)}","rows":${l.rows},"path":"${esc(l.path)}"}""")
      .mkString("[", ",", "]")
    s"""{"snapshotId":$snapshotId,"parentId":${parentId.getOrElse("null")},"sinks":$sinksJson}"""
  }
}

object Manifest {
  /** Minimal JSON reader for manifests we wrote ourselves. */
  def fromJson(s: String): Manifest = {
    def longField(name: String): Option[Long] =
      ("\"" + name + "\":(\\d+)").r.findFirstMatchIn(s).map(_.group(1).toLong)
    val sinkRe = """\{"sink":"([^"]*)","rows":(\d+),"path":"([^"]*)"\}""".r
    Manifest(
      snapshotId = longField("snapshotId").getOrElse(
        throw new IllegalArgumentException(s"bad manifest: $s")),
      parentId = longField("parentId"),
      sinks = sinkRe.findAllMatchIn(s).map(m =>
        SinkLineage(m.group(1), m.group(2).toLong, m.group(3))).toSeq)
  }
}

class ManifestTable(root: String) {
  private def p(parts: String*): Path = Paths.get(root, parts: _*)

  def currentSnapshotId: Option[Long] = {
    val cur = p("_current")
    if (Files.exists(cur)) Some(new String(Files.readAllBytes(cur), StandardCharsets.UTF_8).trim.toLong)
    else None
  }

  def manifest(snapshotId: Long): Manifest =
    Manifest.fromJson(new String(
      Files.readAllBytes(p("_manifests", s"$snapshotId.json")), StandardCharsets.UTF_8))

  def currentManifest: Option[Manifest] = currentSnapshotId.map(manifest)

  /** Sinks already committed in an *in-progress* snapshot (manifest
    * fragments under `_pending/<id>/`) — the resume unit. */
  def completedSinks(snapshotId: Long): Map[String, SinkLineage] = {
    val dir = p("_pending", s"$snapshotId")
    if (!Files.exists(dir)) Map.empty
    else Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".json"))
      .map(f => Manifest.fromJson(new String(Files.readAllBytes(f), StandardCharsets.UTF_8)))
      .flatMap(_.sinks).map(l => l.sink -> l).toMap
  }

  /** Write one sink's data files + its lineage fragment. Idempotent per
    * (snapshotId, sink): a completed fragment short-circuits the write —
    * this is what makes a re-run resume instead of recompute. */
  def writeSink(df: => DataFrame, snapshotId: Long, sink: String): SinkLineage = {
    completedSinks(snapshotId).get(sink) match {
      case Some(done) => done
      case None =>
        val dataPath = p("data", s"snap=$snapshotId", s"sink=$sink").toString
        val out = df
        out.write.mode("overwrite").parquet(dataPath)
        val rows = out.sparkSession.read.parquet(dataPath).count()
        val lineage = SinkLineage(sink, rows, dataPath)
        Files.createDirectories(p("_pending", s"$snapshotId"))
        atomicWrite(p("_pending", s"$snapshotId", s"$sink.json"),
          Manifest(snapshotId, None, Seq(lineage)).toJson)
        lineage
    }
  }

  /** Seal a snapshot: collect fragments into one manifest, flip the
    * `_current` pointer atomically. */
  def commit(snapshotId: Long): Manifest = {
    val parent = currentSnapshotId
    val m = Manifest(snapshotId, parent, completedSinks(snapshotId).values.toSeq.sortBy(_.sink))
    Files.createDirectories(p("_manifests"))
    atomicWrite(p("_manifests", s"$snapshotId.json"), m.toJson)
    atomicWrite(p("_current"), snapshotId.toString)
    m
  }

  /** Time-travel read: a sink's rows at a given (default: current) snapshot. */
  def read(spark: SparkSession, sink: String, snapshotId: Option[Long] = None): DataFrame = {
    val id = snapshotId.orElse(currentSnapshotId).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $root"))
    val lineage = manifest(id).sinks.find(_.sink == sink).getOrElse(
      throw new IllegalArgumentException(s"sink $sink not in snapshot $id"))
    spark.read.parquet(lineage.path)
  }

  private def atomicWrite(path: Path, content: String): Unit = {
    Files.createDirectories(path.getParent)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
