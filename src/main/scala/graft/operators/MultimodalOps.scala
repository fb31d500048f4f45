package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (north-star EXT): image/audio/video
  * payloads ride through the engine as opaque `binary` columns with
  * typed metadata; decode / feature-extract / frame-sample are
  * per-partition batch operations over those bytes.
  *
  * The container ships no image/audio codecs, so the DECODE STEP IS A
  * STUB — `MediaDecoder.decodeStub` derives deterministic fake
  * dimensions from the raw bytes (clearly marked below; swap its body
  * for a real codec call). Everything around it is real Spark plumbing:
  * the binary projection, the typed `Dataset.mapPartitions` batch shape
  * (one decoder instance per partition, streaming iterator — the Scala
  * analogue of a Pandas-UDF `mapInPandas` batch), the schema of the
  * result, and the frame-sampling generator.
  *
  * Payloads are synthesized from `documents.text` bytes (UTF-8) so the
  * DuckDB oracle can reproduce byte lengths, slices, and md5s exactly.
  */
object MultimodalOps {

  /** Decoded-media feature record (the schema a real decoder would fill). */
  final case class MediaFeature(
    doc_id: Long, width: Long, height: Long, channels: Long)

  /** The decode seam. STUB: derives dimensions from byte stats instead
    * of decoding a codec — deterministic, so the plumbing stays
    * oracle-checkable. A real implementation would parse the container
    * format here (one decoder instance per partition, reused across the
    * iterator — that is the point of the mapPartitions shape). */
  object MediaDecoder {
    def decodeStub(docId: Long, bytes: Array[Byte]): MediaFeature = {
      val n = bytes.length.toLong
      val first = if (bytes.nonEmpty) bytes(0).toLong & 0xff else 0L
      MediaFeature(docId, 32 + n % 256, 32 + (first * 7) % 256,
        1 + (n * 31 + first) % 3)
    }
  }

  /** media_type assignment for the synthesized corpus. */
  private def mediaType = when(col("doc_id") % 3 === 0, "image")
    .when(col("doc_id") % 3 === 1, "audio").otherwise("video")

  /** Binary payloads + typed metadata: the storage schema for a
    * multimodal table (payload stays opaque; metadata is columnar and
    * prunable — at 100 TB the scan reads metadata only unless the
    * payload column is projected). */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      mediaType.as("media_type"),
      col("text").cast("binary").as("payload"),
      struct(
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        col("source").as("origin")).as("meta"))

  /** Per-type byte statistics — the metadata-only aggregation (payload
    * column pruned from the scan). */
  def binaryStats(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir)
      .groupBy("media_type")
      .agg(count(lit(1)).as("n"),
        sum(col("meta.n_bytes")).as("total_bytes"),
        (sum(col("meta.n_bytes")).cast("double") / count(lit(1)))
          .as("avg_bytes"))
      .orderBy("media_type")

  /** Batch decode: binary payloads → typed features via
    * `mapPartitions` (partition-batched, decoder amortized across the
    * iterator; the whole stage is narrow — no shuffle). */
  def decodeFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        MediaDecoder.decodeStub(id, bytes) })
      .toDF()
      .orderBy("doc_id")
  }

  /** Frame sampling: treat the payload as n/16-byte "frames", emit every
    * ceil(n_frames/4)-th frame with its offset and content hash — the
    * generator shape of video keyframe extraction (1 row → ~4 rows,
    * bounded fan-out, map-side). */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir)
      .filter(col("media_type") === "video")
      .withColumn("n_frames", (col("meta.n_bytes") / 16).cast("long"))
      .withColumn("step", greatest(lit(1L), (col("n_frames") / 4).cast("long")))
      // guard: sequence(0, -1) throws on sub-16-byte payloads; the empty
      // array explodes to zero rows, matching the oracle's range(0, 0)
      .withColumn("frame_idx",
        explode(when(col("n_frames") > 0,
          sequence(lit(0L), col("n_frames") - 1, col("step")))
          .otherwise(array().cast("array<bigint>"))))
      .select(
        col("doc_id"),
        col("frame_idx"),
        (col("frame_idx") * 16 + 1).as("frame_off"),
        // slice by frame offset (substring with a column offset needs the
        // SQL form), hash the 16 payload bytes — ASCII corpus, so the
        // string slice is byte-identical to a binary slice
        md5(expr("CAST(substring(CAST(payload AS STRING), CAST(frame_idx * 16 + 1 AS INT), 16) AS BINARY)"))
          .as("frame_md5"))
      .orderBy("doc_id", "frame_idx")
}
