package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with typed metadata,
  * decoded per-partition into feature rows.
  *
  * The decode step is a STUB by design — this container ships no
  * image/audio codecs — but everything around it is the real Spark shape a
  * media pipeline needs at 100 TB:
  *  - payloads travel as BinaryType columns (columnar, never stringified);
  *  - decode runs via `mapPartitions` over a typed Dataset, i.e. one
  *    iterator pass per partition with zero driver involvement — swap
  *    `stubDecode` for a JNI/codec call and nothing else changes;
  *  - output is a typed feature row (Dataset[MediaFeatures]) that drops
  *    straight back into declarative SQL.
  *
  * The stub is DETERMINISTIC arithmetic over the payload bytes, so the
  * DuckDB oracle can verify the whole pipeline end-to-end (a real decoder
  * is exactly as testable against golden outputs).
  */
object Multimodal {

  final case class BlobRow(doc_id: Long, payload: Array[Byte])

  /** Typed metadata a decoder would emit per media object. */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, width: Long, height: Long, sum_bytes: Long)

  /** STUB decode: deterministic pseudo-dimensions + an exact byte checksum.
    * A real build replaces the body with the codec call; the signature —
    * bytes in, typed features out, pure per-element — is the contract. */
  def stubDecode(b: BlobRow): MediaFeatures = {
    val n = b.payload.length.toLong
    val first = if (n > 0) b.payload(0) & 0xff else 0
    val last = if (n > 0) b.payload(n.toInt - 1) & 0xff else 0
    var sum = 0L
    var i = 0
    while (i < b.payload.length) { sum += (b.payload(i) & 0xff); i += 1 }
    MediaFeatures(b.doc_id, n, 1L + first % 64, 1L + last % 64, sum)
  }

  /** Wrap the documents corpus as a binary-payload table (the fixture has
    * no real media column; text bytes stand in as the opaque payload). */
  def asBlobs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast(BinaryType).as("payload"))

  /** The decode pipeline: binary column → per-partition batch decode →
    * typed feature rows. */
  def decodeFeatures(spark: SparkSession, blobs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    blobs.as[BlobRow].mapPartitions(_.map(stubDecode))
  }

  /** Typed per-payload FEATURE vector a media featurizer would emit —
    * byte-level summary statistics standing in for a real embedding
    * extractor (same contract: payload in, fixed-width numeric features
    * out, pure per-element). mean_byte is exact-sum / one division, so it
    * is aggregation-order independent and SQL-replayable. */
  final case class ByteFeatures(
      doc_id: Long, n_bytes: Long, byte_sum: Long, byte_min: Long,
      byte_max: Long, n_distinct: Long, mean_byte: Double)

  /** FEATURE-EXTRACT stage: binary column → per-partition featurize →
    * typed feature rows (the image/audio-embedding analog of stubDecode;
    * swap the byte statistics for a model/codec call and the plumbing —
    * mapPartitions, schema, zero driver involvement — is unchanged). */
  def featureExtract(spark: SparkSession, blobs: DataFrame): Dataset[ByteFeatures] = {
    import spark.implicits._
    blobs.as[BlobRow].mapPartitions(_.map { b =>
      val n = b.payload.length
      if (n == 0) ByteFeatures(b.doc_id, 0L, 0L, 0L, 0L, 0L, 0.0)
      else {
        var sum = 0L
        var mn = 255L
        var mx = 0L
        val seen = new Array[Boolean](256)
        var distinct = 0L
        var i = 0
        while (i < n) {
          val v = (b.payload(i) & 0xff).toLong
          sum += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          if (!seen(v.toInt)) { seen(v.toInt) = true; distinct += 1 }
          i += 1
        }
        ByteFeatures(b.doc_id, n.toLong, sum, mn, mx, distinct,
          sum.toDouble / n)
      }
    })
  }

  /** RESIZE stage: payload in, smaller payload out — every `stride`-th
    * byte kept (the nearest-neighbor-downsample analog; a real resizer
    * swaps the slice loop for a codec call, same payload→payload
    * contract). Output stays a binary column so downstream stages
    * (decode, feature-extract, frame-sample) compose on it unchanged. */
  def resize(spark: SparkSession, blobs: DataFrame, stride: Int = 4): Dataset[BlobRow] = {
    import spark.implicits._
    require(stride >= 1, s"stride must be >= 1: $stride")
    blobs.as[BlobRow].mapPartitions(_.map { b =>
      val out = new Array[Byte]((b.payload.length + stride - 1) / stride)
      var i = 0
      var j = 0
      while (j < out.length) { out(j) = b.payload(i); i += stride; j += 1 }
      BlobRow(b.doc_id, out)
    })
  }

  /** One sampled "frame" of a media payload (the video analog: one row in,
    * N frame rows out). */
  final case class FrameRow(doc_id: Long, frame_idx: Long, frame_sum: Long)

  /** Frame sampling: split each payload into fixed-size frames (trailing
    * partial frame dropped) and emit one checksum row per frame — the
    * table-generating (1→N) shape of video frame extraction, as a typed
    * flatMap. A real extractor swaps the slice-checksum for a codec call;
    * the fan-out, schema, and partition behavior are exactly this. */
  def frameSample(spark: SparkSession, blobs: DataFrame,
                  frameBytes: Int = 32): Dataset[FrameRow] = {
    require(frameBytes >= 1, s"frameSample: frameBytes ($frameBytes) must be >= 1")
    import spark.implicits._
    blobs.as[BlobRow].flatMap { b =>
      val n = b.payload.length / frameBytes
      (0 until n).iterator.map { i =>
        var sum = 0L
        var j = i * frameBytes
        val end = j + frameBytes
        while (j < end) { sum += (b.payload(j) & 0xff); j += 1 }
        FrameRow(b.doc_id, i.toLong, sum)
      }
    }
  }
}
