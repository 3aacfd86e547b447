package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata extracted per-partition.
  *
  * The real pipeline would decode image/audio/video bytes with a
  * native codec inside `mapPartitions` (per-partition so codec init
  * is amortized across a batch, exactly like a Pandas-UDF batch).
  * This container has no media libs, so the *decode kernel* is a
  * clearly-marked deterministic stub — but the Spark plumbing
  * (binary column, typed output schema, partition-batched imperative
  * decode, no driver collection) is the real production shape.
  */
object Multimodal {

  /** Typed metadata a decoder would produce. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int,
                       format: String, n_frames: Int)

  /** STUB decode kernel: deterministic fake metadata from the bytes.
    * Replace with a real codec (e.g. libjpeg/ffmpeg JNI) in prod. */
  private[operators] def decodeKernel(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val b0 = if (bytes.length > 0) bytes(0) & 0xff else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
    val width = (b0 * 256 + b1) % 1920 + 1
    val height = (b1 * 256 + b0) % 1080 + 1
    val format = (bytes.length % 3) match {
      case 0 => "png"; case 1 => "jpeg"; case _ => "webp"
    }
    MediaMeta(docId, bytes.length.toLong, width, height, format, bytes.length % 64 + 1)
  }

  /** Binary payload + per-partition decode. One scan, one narrow
    * mapPartitions — scales linearly; decoder state would be opened
    * once per partition (iterator-to-iterator, nothing materialized). */
  def decode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl: open codec here, close at iterator exhaustion
        it.map { case (id, bytes) => decodeKernel(id, bytes) }
      }
      .toDF()
      .orderBy($"doc_id")
  }

  /** Full media-prep record: decode → resize → frame-sample →
    * feature-extract. */
  case class MediaPrep(doc_id: Long, n_bytes: Long, fit_w: Int, fit_h: Int,
                       frame_offsets: String, mean_byte_milli: Long, max_byte: Int)

  /** The downstream media-prep steps a training pipeline runs after
    * decode — all REAL logic in exact integer arithmetic (only the
    * codec itself is stubbed, via [[decodeKernel]]'s dimensions):
    *
    *  - resize: aspect-preserving fit into 224×224 (integer
    *    cross-multiplication, no floats);
    *  - frame sampling: k = min(4, n_frames) evenly-spaced offsets
    *    `(i·n_frames) div k` (emitted comma-joined for a stable
    *    cross-engine representation);
    *  - feature extraction: byte-stream statistics (exact per-mille
    *    mean + max) standing in for an embedding kernel.
    *
    * Same per-partition imperative shape as [[decode]]: one scan, one
    * mapPartitions, nothing on the driver. */
  def prepKernel(docId: Long, bytes: Array[Byte]): MediaPrep = {
    val m = decodeKernel(docId, bytes)
    val (fw, fh) =
      if (m.width >= m.height) (224, math.max(1, m.height * 224 / m.width))
      else (math.max(1, m.width * 224 / m.height), 224)
    val k = math.min(4, m.n_frames)
    val offsets = (0 until k).map(i => i.toLong * m.n_frames / k).mkString(",")
    var sum = 0L
    var max = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sum += b
      if (b > max) max = b
      i += 1
    }
    val meanMilli = if (bytes.length == 0) 0L else sum * 1000L / bytes.length
    MediaPrep(docId, m.n_bytes, fw, fh, offsets, meanMilli, max)
  }

  def pipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => prepKernel(id, bytes) })
      .toDF()
      .orderBy($"doc_id")
  }
}
