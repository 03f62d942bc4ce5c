package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("attach + decode roundtrip recovers every metadata field") {
    val docs = wh.loadTable("documents")
    val decoded = Multimodal.decodeMeta(
      Multimodal.attachBinary(docs, "doc_id", "text"), "doc_id", "media")
    val bad = decoded
      .filter(col("width") =!= (lit(32) + col("id") % 64) ||
        col("height") =!= (lit(32) + (col("id") * 7) % 64) ||
        col("payload_bytes") =!= col("n_bytes") - 5)
      .count()
    assert(bad === 0)
    assert(decoded.count() === docs.count())
  }

  test("unknown container degrades to size-only metadata, not a failure") {
    val df = Seq((1L, "not a media container")).toDF("id", "s")
      .withColumn("media", col("s").cast("binary"))
    val r = Multimodal.decodeMeta(df, "id", "media").collect()(0)
    assert(r.isNullAt(r.fieldIndex("width")))
    assert(r.getLong(r.fieldIndex("n_bytes")) === 21L)
  }

  test("resizeMeta preserves aspect ratio and never upscales") {
    val docs = wh.loadTable("documents").limit(30)
    val out = Multimodal.resizeMeta(
      Multimodal.decodeMeta(
        Multimodal.attachBinary(docs, "doc_id", "text"), "doc_id", "media"),
      maxW = 48, maxH = 48)
    out.collect().foreach { r =>
      val (w, h) = (r.getAs[Long]("width"), r.getAs[Long]("height"))
      val (tw, th) = (r.getAs[Long]("target_width"), r.getAs[Long]("target_height"))
      assert(tw <= 48 && th <= 48)
      assert(tw <= w && th <= h, "upscaled")
      // floor() can land the binding dimension one below the box edge
      if (w > 48 || h > 48) assert(tw >= 47 || th >= 47, "did not fill the box")
    }
  }

  test("sampleFramesMeta picks k evenly spaced frames, all frames when short") {
    val df = Seq((1L, 100L), (2L, 3L), (3L, 0L)).toDF("id", "n_frames")
    val out = Multimodal.sampleFramesMeta(df, "n_frames", 5)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](r.fieldIndex("frame_indices"))).toMap
    assert(out(1L) === Seq(0L, 20L, 40L, 60L, 80L))
    assert(out(2L) === Seq(0L, 1L, 2L))
    assert(out(3L).isEmpty)
  }

  test("mapBinaryBatches streams partition batches through the decoder fn") {
    val docs = wh.loadTable("documents").limit(10)
    val out = Multimodal.mapBinaryBatches(
      Multimodal.attachBinary(docs, "doc_id", "text"), "doc_id", "media",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType)))) {
      batch => batch.map { case (id, bytes) => org.apache.spark.sql.Row(id, bytes.length.toLong) }
    }
    assert(out.count() === 10)
    assert(out.filter(col("n") <= 5).count() === 0)
  }
}
