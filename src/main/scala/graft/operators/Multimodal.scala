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
}
