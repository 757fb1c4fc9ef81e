package graft.streaming

import graft.index.{IndexBuilder, Manifest, PostingCodec}
import graft.core.{LenByte, Tokenizer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental indexing with Structured Streaming — segments, Lucene-style.
  *
  * The reference is batch-build + online queries (SURVEY.md §2.9: no
  * streaming in wiser); this module is the Spark-native extension for a
  * continuously-growing corpus: `readStream` over the input table's
  * directory; each micro-batch becomes an immutable index SEGMENT (its own
  * posting blocks, doclen rows, termstats rows) appended under the same
  * index dir. [[graft.query.Searcher]] is segment-agnostic: blocks carry
  * absolute docIds, per-term stats are summed across segments at load, and
  * exactly-once segment commit: each segment writes into its own
  * `seg=<batchId>` partition dir with overwrite, so a re-run batch replaces
  * its own output instead of duplicating it (idempotent), and partition
  * discovery makes the union visible to one `spark.read.parquet`.
  *
  * DocIds: each segment gets a contiguous id range starting after the last
  * committed segment (dense, no holes — `doc_store.h:295-297`), assigned by
  * (repo, path) rank within the segment.
  */
object StreamingIndexer {

  /** Append one micro-batch as segment `segId`. Idempotent per segment. */
  def appendSegment(spark: SparkSession, batch: DataFrame, indexDir: String,
                    segId: Long, partitions: Int = 8): Unit = {
    import spark.implicits._
    if (Manifest.isCommitted(indexDir, s"segment_$segId")) return
    if (batch.isEmpty) return

    val base = committedDocs(indexDir)
    val withSha =
      if (batch.columns.contains("sha256")) batch
      else batch.withColumn("sha256", sha2(col("content"), 256))
    // deterministic ids within the segment: rank over (repo, path)
    val (docs0, release) = IndexBuilder.assignDocIdsPersisted(spark, withSha, partitions)
    val docs = docs0.map(d => d.copy(docId = (base + d.docId).toInt))
    val segDocs = docs0.count()

    docs.write.mode("overwrite").option("compression", "zstd").parquet(s"$indexDir/docstore/seg=$segId")
    val flat = IndexBuilder.flatPostings(docs)

    // doclen from the docstore map (IndexBuilder.docLengths), NOT from an
    // aggregation over flat postings: a doc that tokenizes to zero terms
    // still gets its len=0 row, so nDocs/avgLen at Searcher.load stay exact
    // (an empty doc must count toward N like the batch path and the
    // docsAfter watermark)
    IndexBuilder.docLengths(docs)
      .write.mode("overwrite").option("compression", "zstd").parquet(s"$indexDir/doclen/seg=$segId")

    flat.groupBy("term")
      .agg(count(lit(1)).as("df"), sum($"tf").cast("long").as("cf"))
      .write.mode("overwrite").option("compression", "zstd").parquet(s"$indexDir/termstats/seg=$segId")

    IndexBuilder.buildBlocks(spark, flat, segDocs, partitions)
      .write.mode("overwrite").option("compression", "zstd").parquet(s"$indexDir/postings/seg=$segId")

    release() // the sorted micro-batch cache — without this every batch leaks one copy
    // segment manifest: carries the doc-count watermark (atomic rename)
    val json = s"""{"segment":$segId,"docs":$segDocs,"docsAfter":${base + segDocs}}"""
    val tmp = java.nio.file.Paths.get(indexDir, s"_manifest_segment_$segId.json.tmp")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(indexDir))
    java.nio.file.Files.writeString(tmp, json)
    java.nio.file.Files.move(tmp, Manifest.manifestPath(indexDir, s"segment_$segId"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Doc-count watermark across committed segments (next segment's base). */
  def committedDocs(indexDir: String): Long = {
    val dir = java.nio.file.Paths.get(indexDir)
    if (!java.nio.file.Files.exists(dir)) return 0L
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.list(dir)
    try {
      s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("_manifest_segment_") && n.endsWith(".json"))
        .map { n =>
          val json = java.nio.file.Files.readString(dir.resolve(n))
          """"docsAfter":(\d+)""".r.findFirstMatchIn(json).map(_.group(1).toLong).getOrElse(0L)
        }
        .foldLeft(0L)(math.max)
    } finally s.close()
  }

  /** Start the stream: every new parquet file under `inputDir` is indexed
    * into a new segment. `trigger` defaults to availableNow semantics in
    * tests via `processAllAvailable()`. */
  def start(spark: SparkSession, inputDir: String, indexDir: String,
            checkpointDir: String, partitions: Int = 8): StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "repo STRING, path STRING, commit STRING, lang STRING, content STRING, sha256 STRING")
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendSegment(batch.sparkSession, batch, indexDir, batchId, partitions)
      }
      .start()
  }
}
