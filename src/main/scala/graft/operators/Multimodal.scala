package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride through
  * the engine as opaque `BinaryType` columns with typed metadata, and
  * decode / feature-extraction runs as a partition-mapped stage over the
  * binary batches (SURVEY.md §2C; the binary-blob analog in the
  * reference is Redis binary mode, `/root/reference/src/processor.ts:69`).
  *
  * The actual media codecs are NOT part of this engine (and the image /
  * audio libraries are not in this container), so [[decodeStub]] is a
  * clearly-marked deterministic fake; everything around it — the schema
  * contract, the per-partition batch shape, the narrow (shuffle-free)
  * execution, the typed output — is the real plumbing a production
  * decode UDF would drop into.
  *
  * Scale notes: `mapPartitions` keeps the decode narrow — one pass per
  * input split, no shuffle, codegen stages on either side. Payload
  * columns should be pruned early (`select` before decode) so the scan
  * only materializes the binary column when the decode stage actually
  * runs.
  */
object Multimodal {

  /** Typed metadata extracted per payload — the production schema would
    * carry width/height/duration etc. from the real codec.
    */
  final case class MediaMeta(
      docId: Long,
      nBytes: Int,
      // Fake "decoded" fields, deterministic in the payload bytes:
      fakeWidth: Int,
      fakeHeight: Int,
      checksum: Long)

  /** Deterministic stand-in for a media decoder: derives pseudo
    * dimensions and a checksum from the bytes alone. A real deployment
    * replaces ONLY this function (same signature) with e.g. a JNI/FFI
    * image decode.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Long) = {
    var h = 1125899906842597L // FNV-ish rolling checksum
    var i = 0
    while (i < payload.length) { h = 31 * h + (payload(i) & 0xff); i += 1 }
    val w = 64 + math.floorMod(h, 1024).toInt
    val ht = 64 + math.floorMod(h >> 10, 1024).toInt
    (w, ht, h)
  }

  /** Decode/featurize a DataFrame bearing (`doc_id`, `payload: binary`)
    * into typed [[MediaMeta]] — partition-mapped, no shuffle.
    */
  def decodeAll(df: DataFrame): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h, c) = decodeStub(bytes)
          MediaMeta(id, bytes.length, w, h, c)
        }
      }
  }

  /** Attach a binary payload column derived from text (the fixture has
    * no real media bytes; production reads them from Parquet directly).
    */
  def withPayload(documents: DataFrame): DataFrame =
    documents.withColumn("payload", encode(col("text"), "UTF-8"))

  /** "Resize" stub: deterministic fixed-length feature vector from the
    * payload (byte-bucket histogram, L1-normalized) — stands in for an
    * image thumbnail / mel spectrogram. Shape contract: every row yields
    * exactly `dim` floats, the invariant a downstream embedding model
    * needs. Narrow stage, same batch plumbing as [[decodeAll]].
    */
  final case class MediaFeature(docId: Long, feature: Array[Float])

  def featurizeAll(df: DataFrame, dim: Int = 16): Dataset[MediaFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val hist = new Array[Float](dim)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xff) % dim) += 1f; i += 1 }
          val total = math.max(bytes.length, 1).toFloat
          var j = 0
          while (j < dim) { hist(j) /= total; j += 1 }
          MediaFeature(id, hist)
        }
      }
  }

  /** "Frame sample" stub: split the payload into `frames` contiguous
    * chunks and keep the first `bytesPerFrame` bytes of each — the
    * video-keyframe-sampling shape (one row in, `frames` rows out, a
    * generator/UDTF-style expansion done partition-locally).
    */
  final case class MediaFrame(docId: Long, frameIdx: Int, frame: Array[Byte])

  def sampleFrames(df: DataFrame, frames: Int = 4, bytesPerFrame: Int = 8): Dataset[MediaFrame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val chunk = math.max(bytes.length / frames, 1)
        (0 until frames).iterator
          .map(f => (f, f * chunk))
          .takeWhile { case (_, off) => off < bytes.length }
          .map { case (f, off) =>
            MediaFrame(id, f, bytes.slice(off, math.min(off + bytesPerFrame, bytes.length)))
          }
      }
  }
}
