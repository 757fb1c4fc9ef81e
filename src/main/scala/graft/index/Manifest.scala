package graft.index

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Snapshot/checkpoint emulation.
  *
  * The north rule asks for Iceberg snapshot checkpoints with per-partition
  * lineage and row-count/bytes metrics; no Iceberg jars exist in
  * `/opt/spark/jars` (SURVEY.md §7.1), so the same observable semantics are
  * provided honestly with plain parquet + JSON manifests:
  *   - a stage is "committed" by atomically renaming
  *     `_manifest_<stage>.json.tmp` → `_manifest_<stage>.json` after its
  *     parquet is fully written (rename is the atomic commit point);
  *   - the manifest records per-file row counts and bytes (the lineage /
  *     metrics payload);
  *   - resume = re-running the build skips any stage whose manifest exists.
  */
object Manifest {

  def manifestPath(indexDir: String, stage: String) =
    Paths.get(indexDir, s"_manifest_$stage.json")

  def isCommitted(indexDir: String, stage: String): Boolean =
    Files.exists(manifestPath(indexDir, stage))

  /** Record per-parquet-file rows+bytes for the stage dir and commit. */
  def commit(spark: SparkSession, indexDir: String, stage: String): Unit = {
    val dir = Paths.get(indexDir, stage)
    import scala.jdk.CollectionConverters._
    val files = if (Files.exists(dir)) {
      val s = Files.list(dir)
      try s.iterator().asScala.filter(_.toString.endsWith(".parquet")).toList
      finally s.close()
    } else Nil
    // per-file row counts straight from parquet footers on the driver —
    // zero Spark jobs, and footers are read CONCURRENTLY: a serial loop
    // over a few hundred postings files costs ~2.8 s of per-build fixed
    // time (measured; identical at 2 and 8 cores), which is pure Amdahl
    // serial fraction against the N→4N scaling criterion
    import scala.collection.parallel.CollectionConverters._
    val conf = new org.apache.hadoop.conf.Configuration()
    val entries = files.par.map { f =>
      val rows = parquetRowCount(f, conf)
      f.getFileName.toString -> s"""{"file":"${f.getFileName}","rows":$rows,"bytes":${Files.size(f)}}"""
    }.toList.sortBy(_._1).map(_._2)
    val json =
      s"""{"stage":"$stage","ts":${System.currentTimeMillis()},"files":[${entries.mkString(",")}]}"""
    val tmp = Paths.get(indexDir, s"_manifest_$stage.json.tmp")
    Files.createDirectories(Paths.get(indexDir))
    Files.writeString(tmp, json)
    Files.move(tmp, manifestPath(indexDir, stage), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Row count from the parquet footer (driver-side, no job). */
  def parquetRowCount(
      f: java.nio.file.Path,
      conf: org.apache.hadoop.conf.Configuration = new org.apache.hadoop.conf.Configuration()): Long = {
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.hadoop.fs.{Path => HPath}
    import scala.jdk.CollectionConverters._
    try {
      val in = HadoopInputFile.fromPath(new HPath(f.toString), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getBlocks.asScala.map(_.getRowCount).sum
      finally r.close()
    } catch { case _: Throwable => -1L }
  }

  /** Total committed rows of a stage, from its manifest (no job). */
  def stageRows(indexDir: String, stage: String): Option[Long] = {
    if (!isCommitted(indexDir, stage)) None
    else {
      val json = Files.readString(manifestPath(indexDir, stage))
      val rows = """"rows":(-?\d+)""".r.findAllMatchIn(json).map(_.group(1).toLong).toSeq
      if (rows.isEmpty || rows.contains(-1L)) None else Some(rows.sum)
    }
  }

  /** Ids of committed streaming segments (ascending) — the LIVE segment
    * set. Readers must restrict partition discovery to these: an
    * in-flight append or a compaction between publish and cleanup leaves
    * uncommitted/retired `seg=` directories on disk that would otherwise
    * double-count.
    *
    * Recovery-safe compaction: a compacted segment's manifest lists its
    * sources in `compactedFrom`. Any segment named there is EXCLUDED from
    * the live set even if its own manifest file still exists — a crash (or
    * a concurrent reader) between the compacted manifest's atomic publish
    * and the source-manifest deletion must see the new segment only, never
    * both, or every merged posting double-counts. The union is taken over
    * ALL manifest files present (a source that was itself a compaction
    * keeps its own sources retired transitively). */
  def committedSegments(indexDir: String): Seq[Long] = {
    val dir = Paths.get(indexDir)
    if (!Files.exists(dir)) return Nil
    import scala.jdk.CollectionConverters._
    val s = Files.list(dir)
    val names = try {
      s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("_manifest_segment_") && n.endsWith(".json"))
        .toSeq
    } finally s.close()
    val entries = names.map { n =>
      val seg = n.stripPrefix("_manifest_segment_").stripSuffix(".json").toLong
      val json = try Files.readString(dir.resolve(n)) catch { case _: Throwable => "" }
      val sources = """"compactedFrom":\[([0-9,\s]*)\]""".r.findFirstMatchIn(json)
        .map(_.group(1).split(",").iterator.map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq)
        .getOrElse(Nil)
      (seg, sources)
    }
    val retired = entries.iterator.flatMap(_._2).toSet
    entries.iterator.map(_._1).filterNot(retired).toSeq.sorted
  }

  /** Top-level snapshot manifest once all stages are committed. */
  def commitSnapshot(spark: SparkSession, indexDir: String, nDocs: Long): Unit = {
    val stages = List("docstore", "postings", "termstats")
      .filter(isCommitted(indexDir, _))
    val json =
      s"""{"snapshot":1,"nDocs":$nDocs,"stages":[${stages.map("\"" + _ + "\"").mkString(",")}],"ts":${System.currentTimeMillis()}}"""
    val tmp = Paths.get(indexDir, "_snapshot.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, Paths.get(indexDir, "_snapshot.json"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
