package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing, SURVEY §2.3 row 49: media (image/audio/
  * video) travels as an opaque `binary` column plus typed metadata, and
  * decode/feature-extraction runs as batched per-partition functions.
  *
  * The decode step is a STUB: real codecs (libjpeg/ffmpeg) are not in this
  * container, so media is a deterministic synthetic container format
  * ("GM" magic + width/height/format header + payload) and "decoding"
  * parses that header. Everything around the stub is the real design:
  * binary columns through the scan/shuffle, partition-batched iteration
  * (amortizes per-batch decoder setup), and a typed output schema.
  */
object Multimodal {

  /** Output schema of the metadata decode. */
  val metaSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("payload_bytes", LongType)))

  /** Attach a synthetic media container to each row: 5-byte header
    * ("GM", width, height, format — all ASCII-range so chr() is one byte)
    * + the payload column's UTF-8 bytes. Deterministic in `idCol`, so an
    * oracle can recompute every decoded field.
    */
  def attachBinary(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.withColumn("media", concat(
      expr(s"cast(concat(chr(71), chr(77), chr(32 + $idCol % 64), " +
        s"chr(32 + ($idCol * 7) % 64), chr(48 + $idCol % 3)) as binary)"),
      col(payloadCol).cast("binary")))

  /** The generic extension point: stream each partition's (id, bytes) pairs
    * through `f` — where a real decoder/feature-extractor would batch its
    * work (model session per partition, vectorized decode, etc.).
    */
  def mapBinaryBatches(df: DataFrame, idCol: String, binCol: String, outSchema: StructType)(
      f: Iterator[(Long, Array[Byte])] => Iterator[Row]): DataFrame =
    Relational.transform(
      df.select(col(idCol).cast("long").as("id"), col(binCol)), outSchema) { it =>
      f(it.map(r => (r.getLong(0), r.getAs[Array[Byte]](1))))
    }

  /** Resize planning: target dimensions preserving aspect ratio (fit inside
    * maxW × maxH). The dimension arithmetic is the real operator — the
    * byte-level resample would run inside mapBinaryBatches next to the
    * decoder (STUB here, codecs absent).
    */
  def resizeMeta(df: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / col("width"),
      lit(maxH.toDouble) / col("height"),
      lit(1.0))
    df.withColumn("target_width", floor(col("width") * scale).cast("long"))
      .withColumn("target_height", floor(col("height") * scale).cast("long"))
  }

  /** Frame-sampling plan for video-like media: k evenly-spaced frame
    * indices over `nFramesCol` (first frame always included). Selection is
    * the real operator; frame extraction itself would live in
    * mapBinaryBatches (STUB, codecs absent).
    */
  def sampleFramesMeta(df: DataFrame, nFramesCol: String, k: Int): DataFrame =
    df.withColumn("frame_indices",
      when(col(nFramesCol) <= 0, array().cast("array<bigint>"))
        .when(col(nFramesCol) <= k,
          sequence(lit(0L), col(nFramesCol).cast("long") - 1))
        .otherwise(transform(sequence(lit(0), lit(k - 1)),
          // integer division — Column./ is double division, which would
          // produce fractional frame indices and coerce to array<double>
          i => floor((i.cast("long") * col(nFramesCol).cast("long")) / k).cast("long"))))

  /** Metadata decode (STUB decoder, see object doc): parses the synthetic
    * header; unknown containers degrade to size-only metadata instead of
    * failing the partition.
    */
  def decodeMeta(df: DataFrame, idCol: String, mediaCol: String): DataFrame =
    mapBinaryBatches(df, idCol, mediaCol, metaSchema) { batch =>
      batch.map { case (id, b) =>
        if (b.length >= 5 && b(0) == 0x47 && b(1) == 0x4d)
          Row(id, b(2) & 0xffL, b(3) & 0xffL, String.valueOf((b(4) & 0xff).toChar),
            b.length.toLong, (b.length - 5).toLong)
        else Row(id, null, null, null, b.length.toLong, null)
      }
    }
}
