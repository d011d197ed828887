package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column handling: image/audio/video payloads as opaque `binary`
 * columns with typed metadata, plus decode / feature-extract / frame-sample
 * stages.
 *
 * The Spark-side plumbing here is real and tested: schema, partition-sized
 * batching via mapPartitions over a typed Dataset (the Scala analogue of
 * mapInPandas batches), and columnar metadata extraction. The codec itself is
 * a clearly-marked DETERMINISTIC STUB (`FakeCodec`) because no image/audio
 * libraries exist in this container — swap `FakeCodec.decode` for a real
 * decoder (e.g. javax.imageio / ffmpeg bindings) in production; every
 * signature and batch shape stays the same.
 */
object Multimodal {

  /** Typed media row: payload + metadata travel together. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                            width: Int, height: Int, sample_rate: Int)
  /** Decoded features: fixed-width vector per item (e.g. pooled embedding). */
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                                 features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false)))

  /** ======== STUB ======== deterministic fake codec: derives a feature vector
    * from payload bytes. Replace with a real decoder in production. */
  object FakeCodec {
    def decode(payload: Array[Byte], dims: Int): Array[Float] = {
      val out = new Array[Float](dims)
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = h * 31 + (payload(i) & 0xff); i += 1 }
      var d = 0
      while (d < dims) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17 // xorshift
        out(d) = ((h % 1000L) / 1000.0f)
        d += 1
      }
      out
    }
  }

  /** Synthesize a deterministic media table (payload = bytes of a seeded hash
    * stream) — the fixture generator for the multimodal plumbing tests. */
  def syntheticMedia(spark: SparkSession, rows: Long, partitions: Int = 8): DataFrame = {
    val kinds = array(lit("image"), lit("audio"), lit("video"))
    spark.range(0, rows, 1, partitions).select(
      col("id").as("media_id"),
      element_at(kinds, (pmod(xxhash64(col("id")), lit(3)) + 1).cast(IntegerType)).as("kind"),
      // payload: deterministic pseudo-bytes via hex of chained hashes
      unhex(concat((0 until 8).map(s => lpad(hex(abs(xxhash64(col("id"), lit(s)))), 16, "0")): _*)).as("payload"),
      (pmod(xxhash64(col("id"), lit("w")), lit(1920)) + 1).cast(IntegerType).as("width"),
      (pmod(xxhash64(col("id"), lit("h")), lit(1080)) + 1).cast(IntegerType).as("height"),
      lit(16000).as("sample_rate"))
  }

  /** Decode + feature-extract: per-partition batches through the (stub) codec.
    * mapPartitions keeps decoder init per-partition (not per-row) — the same
    * batching contract a Pandas-UDF/mapInPandas pipeline uses. */
  def extractFeatures(media: Dataset[MediaRow], dims: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real pipeline: initialize decoder/model ONCE per partition here
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind, r.payload.length,
          FakeCodec.decode(r.payload, dims))
      }
    }
  }

  /** Columnar metadata pass (no decode): aspect ratio, byte size, validity —
    * pure built-ins, pushdown-friendly (payload column pruned when unused). */
  def metadata(df: DataFrame): DataFrame =
    df.select(col("media_id"), col("kind"),
      octet_length(col("payload")).as("n_bytes"),
      (col("width").cast(DoubleType) / col("height")).as("aspect"),
      (col("width") > 0 && col("height") > 0).as("geometry_ok"))

  /** Frame sampling plan for video rows: every k-th frame index as an array —
    * the index math is columnar; actual frame extraction happens in the codec. */
  def frameSampleIndices(df: DataFrame, fps: Int, everySec: Int): DataFrame =
    df.where(col("kind") === "video")
      .withColumn("frame_indices",
        sequence(lit(0), lit(fps * 10), lit(fps * everySec)))
}
