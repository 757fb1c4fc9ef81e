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
    val entries = files.map { f =>
      val rows = try spark.read.parquet(f.toString).count() catch { case _: Throwable => -1L }
      s"""{"file":"${f.getFileName}","rows":$rows,"bytes":${Files.size(f)}}"""
    }
    val json =
      s"""{"stage":"$stage","ts":${System.currentTimeMillis()},"files":[${entries.mkString(",")}]}"""
    val tmp = Paths.get(indexDir, s"_manifest_$stage.json.tmp")
    Files.createDirectories(Paths.get(indexDir))
    Files.writeString(tmp, json)
    Files.move(tmp, manifestPath(indexDir, stage), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Top-level snapshot manifest once all stages are committed. */
  def commitSnapshot(spark: SparkSession, indexDir: String, nDocs: Long): Unit = {
    val stages = List("docstore", "doclen", "termstats", "postings")
      .filter(isCommitted(indexDir, _))
    val json =
      s"""{"snapshot":1,"nDocs":$nDocs,"stages":[${stages.map("\"" + _ + "\"").mkString(",")}],"ts":${System.currentTimeMillis()}}"""
    val tmp = Paths.get(indexDir, "_snapshot.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, Paths.get(indexDir, "_snapshot.json"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
