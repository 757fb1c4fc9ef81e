package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * batch-wise in `mapPartitions` (the Scala analog of `mapInPandas` batch
  * UDFs — one buffer per batch, vectorizable library calls inside).
  *
  * The actual media decode is STUBBED (no image/audio libs in this
  * container): `decodeStub` produces a deterministic fake
  * (width/height/frames derived from payload bytes), clearly marked. The
  * Spark-side plumbing — schema, batching, partition sizing, output shape —
  * is real and tested; swapping the stub for a real JNI/FFI decoder is a
  * one-function change.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaMeta(media_id: Long, kind: String, n_bytes: Int,
                             sha256: String, width: Int, height: Int,
                             n_frames: Int, feature: Array[Float])

  /** STUB decode: deterministic fake dims/features from payload bytes.
    * Replace with a real decoder (libjpeg/ffmpeg FFI) in production. */
  def decodeStub(kind: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val h = java.util.Arrays.hashCode(payload)
    val w = 16 + math.abs(h % 1024)
    val ht = 16 + math.abs((h / 1024) % 1024)
    val frames = kind match {
      case "video" => 1 + math.abs(h % 300)
      case "audio" => 1 + math.abs(h % 48000)
      case _ => 1
    }
    // fake 8-dim feature: byte histogram buckets, L1-normalized
    val hist = new Array[Float](8)
    payload.foreach(b => hist((b & 0xff) / 32) += 1f)
    val total = math.max(1f, payload.length.toFloat)
    (w, ht, frames, hist.map(_ / total))
  }

  /** Batch decode: mapPartitions so any native decoder amortizes per-batch
    * setup; payload column read once, never collected to the driver. */
  def extract(ds: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        md.reset()
        val sha = md.digest(r.payload).map("%02x".format(_)).mkString
        val (w, h, f, feat) = decodeStub(r.kind, r.payload)
        MediaMeta(r.media_id, r.kind, r.payload.length, sha, w, h, f, feat)
      }
    }
  }

  final case class ByteStats(media_id: Long, n_bytes: Long, mean_byte_micro: Long,
                             entropy_nats_micro: Long, hist: Array[Long])

  /** REAL (non-stub) feature extraction over the opaque binary payloads:
    * byte histogram (8 buckets of 32 values), mean byte value, and Shannon
    * entropy in nats — the content-type / compressibility signals a
    * training-data pipeline filters on before any codec-specific decode.
    * Batched mapPartitions over the binary column; exact cross-engine
    * numerics (integer sums; entropy folded in ascending-byte order so the
    * FP sequence is identical in the DuckDB oracle). */
  def byteStats(ds: Dataset[MediaRow]): Dataset[ByteStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        val n = r.payload.length
        if (n == 0) None
        else {
          val counts = new Array[Long](256)
          r.payload.foreach(b => counts(b & 0xff) += 1)
          var sum = 0L
          var ent = 0.0
          var i = 0
          while (i < 256) {
            sum += counts(i) * i
            if (counts(i) > 0) {
              val p = counts(i).toDouble / n
              ent = ent + (-p * math.log(p))
            }
            i += 1
          }
          val hist = Array.tabulate(8) { k =>
            var s = 0L; var b = k * 32
            while (b < (k + 1) * 32) { s += counts(b); b += 1 }
            s
          }
          Some(ByteStats(r.media_id, n.toLong,
            math.round(sum.toDouble / n * 1e6), math.round(ent * 1e6), hist))
        }
      }
    }
  }

  /** Demo source: wraps the documents table's text bytes as opaque payloads
    * (schema-compatible stand-in for real media blobs). */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }
}
