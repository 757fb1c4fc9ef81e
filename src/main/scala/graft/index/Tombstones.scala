package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Document deletes over an immutable index — the Lucene live-docs analog.
  *
  * The reference engine is append-only (its doc store and posting files are
  * written once and mmap'd, `doc_store.h` / `flash_containers.h`); deletion
  * is the capability a long-lived corpus actually needs, so it is provided
  * the way every segment-file engine does it: TOMBSTONES. A delete never
  * rewrites a posting block — it publishes a generation of deleted docIds
  * under `tombstones/gen=<g>/` (parquet) with an atomically-renamed
  * manifest as the commit point, the same publish discipline as segment
  * manifests ([[Manifest]]).
  *
  * Search semantics (Lucene's): deleted docs are EXCLUDED from results but
  * corpus statistics (N, avgdl, df) are unchanged until a merge physically
  * reclaims them — scores of surviving docs are identical before and after
  * a delete, and only compaction ([[graft.streaming.StreamingIndexer
  * .compact]]) re-baselines the stats. Readers union all committed
  * generations; a docId listed twice is harmless (it is a set).
  *
  * Scale: a generation is a parquet file of ints, distributed everywhere it
  * is used (anti-joins that Catalyst broadcasts when small and shuffles
  * when not) — never a driver-side materialization on the query path. The
  * serving path ([[graft.query.LocalService]]) keeps a resident bitset only
  * under its own bounded budget.
  */
object Tombstones {

  private def genManifest(indexDir: String, gen: Long) =
    Paths.get(indexDir, s"_manifest_tombstone_$gen.json")

  /** Committed tombstone generations, ascending. */
  def committedGens(indexDir: String): Seq[Long] = {
    val dir = Paths.get(indexDir)
    if (!Files.exists(dir)) return Nil
    import scala.jdk.CollectionConverters._
    val s = Files.list(dir)
    try {
      s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("_manifest_tombstone_") && n.endsWith(".json"))
        .map(n => n.stripPrefix("_manifest_tombstone_").stripSuffix(".json").toLong)
        .toSeq.sorted
    } finally s.close()
  }

  /** Total deleted-id rows across committed generations (manifest sums —
    * duplicates across generations possible, so this is an upper bound;
    * exact enough for the serving path's residency budget). */
  def countUpperBound(indexDir: String): Long =
    committedGens(indexDir).map { g =>
      val json = Files.readString(genManifest(indexDir, g))
      """"docs":(\d+)""".r.findFirstMatchIn(json).map(_.group(1).toLong).getOrElse(0L)
    }.sum

  /** Union of all committed generations as a distinct (docId) DataFrame;
    * None when no tombstones exist (the common case — zero cost on the
    * query path). */
  def read(spark: SparkSession, indexDir: String): Option[DataFrame] = {
    val gens = committedGens(indexDir)
    if (gens.isEmpty) None
    else Some(spark.read
      .option("basePath", s"$indexDir/tombstones")
      .parquet(gens.map(g => s"$indexDir/tombstones/gen=$g"): _*)
      .select(col("docId").cast("int").as("docId"))
      .distinct())
  }

  /** Publish one generation from a (docId) DataFrame. Returns the new gen
    * id. Write-then-rename: the parquet is fully written before the
    * manifest rename makes it visible (a crash in between leaves an
    * uncommitted directory that readers never touch). */
  def commitGen(spark: SparkSession, indexDir: String, ids: DataFrame): Long = {
    import spark.implicits._
    val gen = committedGens(indexDir).foldLeft(0L)(math.max) + 1
    val rows = ids.select(col("docId").cast("int").as("docId")).distinct()
    val n = rows.count()
    rows.coalesce(1).write.mode("overwrite")
      .option("compression", "zstd").parquet(s"$indexDir/tombstones/gen=$gen")
    val json = s"""{"gen":$gen,"docs":$n}"""
    val tmp = Paths.get(indexDir, s"_manifest_tombstone_$gen.json.tmp")
    Files.createDirectories(Paths.get(indexDir))
    Files.writeString(tmp, json)
    Files.move(tmp, genManifest(indexDir, gen), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    gen
  }

  /** Delete explicit docIds. */
  def delete(spark: SparkSession, indexDir: String, docIds: Seq[Int]): Long = {
    import spark.implicits._
    commitGen(spark, indexDir, docIds.toDF("docId"))
  }

  /** Delete every doc whose DOCSTORE row satisfies `pred` (e.g.
    * `col("repo") === "retired/corp"` or `col("lang") === "php"`) — the
    * delete-by-query analog. One distributed docstore scan resolves the
    * ids; nothing is collected to the driver. The scan goes through the
    * manifest-visibility reader ([[graft.query.Searcher.load]]), so ids
    * resolve only from LIVE segments — never from an in-flight append or a
    * retired compaction source. */
  def deleteWhere(spark: SparkSession, indexDir: String, pred: Column): Long = {
    val store = graft.query.Searcher.load(spark, indexDir).docstore
    commitGen(spark, indexDir, store.filter(pred).select("docId"))
  }

  /** Retire generations that a compaction has physically applied: keep only
    * ids NOT covered by `purgedIds` (the merged segments' pre-delete doc
    * set), republished as a fresh generation before the old ones are
    * removed — a reader at any point sees a SUPERSET of the live tombstone
    * set, never a subset (a stale extra id is a no-op filter; a missing one
    * would resurrect a deleted doc). */
  def retireCovered(spark: SparkSession, indexDir: String,
                    purgedIds: DataFrame): Unit = {
    val gens = committedGens(indexDir)
    if (gens.isEmpty) return
    val remaining = read(spark, indexDir).get
      .join(purgedIds.select(col("docId").cast("int").as("docId")),
        Seq("docId"), "left_anti")
      .cache()
    val keep = remaining.count() > 0
    if (keep) commitGen(spark, indexDir, remaining)
    remaining.unpersist(false)
    gens.foreach { g =>
      Files.deleteIfExists(genManifest(indexDir, g))
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$indexDir/tombstones/gen=$g"))
    }
  }
}
