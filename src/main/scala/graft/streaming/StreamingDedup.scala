package graft.streaming

import graft.ops.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the `dedup_exact` batch operator
  * ([[graft.ops.Dedup.exactGroups]]) as a Structured Streaming stage: keep
  * the FIRST arrival of each normalized-content digest and drop every later
  * duplicate, across micro-batch boundaries. The dedup key is the same
  * normalization + fingerprint column as the batch path
  * ([[TextOps.contentFingerprint]]), so a stream deduped online keeps the
  * same representative set as the batch keep rule (min id per digest)
  * whenever arrival order follows id order — StreamingSpec asserts the
  * equivalence and the cross-batch drop.
  *
  * Scale: state is one row per DISTINCT digest.
  *  - [[dedupStream]] holds that state forever (global exactness) — at
  *    corpus scale back the state store with RocksDB
  *    (`spark.sql.streaming.stateStore.providerClass`), the same sizing
  *    call Lucene-style dedup services make.
  *  - [[dedupStreamWithinWatermark]] bounds state by an event-time
  *    watermark: duplicates are only suppressed within the lateness
  *    horizon, after which state is reclaimed — the bounded-disorder
  *    contract for unbounded retention-limited streams.
  */
object StreamingDedup {

  /** Globally exact streaming dedup (state never expires). Adds the
    * `digest` column to the output. */
  def dedupStream(stream: DataFrame, textCol: String): DataFrame =
    stream
      .withColumn("digest", TextOps.contentFingerprint(col(textCol)))
      .dropDuplicates("digest")

  /** Watermark-bounded streaming dedup: suppresses duplicates arriving
    * within `lateness` of each other (event time `tsCol`); state for a
    * digest is reclaimed once the watermark passes. */
  def dedupStreamWithinWatermark(stream: DataFrame, textCol: String,
                                 tsCol: String, lateness: String): DataFrame =
    stream
      .withColumn("digest", TextOps.contentFingerprint(col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("digest")
}
