package graft

import org.apache.spark.sql.Row

import graft.mm.Multimodal

class MultimodalSpec extends SparkSpec {

  private lazy val media = {
    val rows = Seq(
      Row(1L, "image", "img-one-payload".getBytes("UTF-8"), Row(64, 48, null, null)),
      Row(2L, "image", "img-two-different".getBytes("UTF-8"), Row(32, 32, null, null)),
      Row(3L, "audio", "pcm-audio-bytes".getBytes("UTF-8"), Row(null, null, 16000, null)),
      Row(4L, "video", "vid-bytes".getBytes("UTF-8"), Row(640, 480, null, 10)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
  }

  test("extractFeatures emits fixed-dim float vectors, drops bytes") {
    val out = Multimodal.extractFeatures(media, batchSize = 2, dim = 16)
    assert(out.schema.fieldNames.toSeq == Seq("media_id", "kind", "features"))
    val rows = out.collect()
    assert(rows.length == 4)
    rows.foreach(r => assert(r.getSeq[Float](2).length == 16))
    // deterministic + content-sensitive
    val again = Multimodal.extractFeatures(media, batchSize = 3, dim = 16).collect()
    assert(rows.sortBy(_.getLong(0)).map(_.getSeq[Float](2)).toSeq ==
      again.sortBy(_.getLong(0)).map(_.getSeq[Float](2)).toSeq)
    val f = rows.sortBy(_.getLong(0))
    assert(f(0).getSeq[Float](2) != f(1).getSeq[Float](2))
  }

  test("resizeImages touches only image rows and preserves schema") {
    val out = Multimodal.resizeImages(media, 8, 8).collect().sortBy(_.getLong(0))
    assert(new String(out(0).getAs[Array[Byte]]("bytes"), "UTF-8").startsWith("resized:8x8:"))
    assert(new String(out(2).getAs[Array[Byte]]("bytes"), "UTF-8") == "pcm-audio-bytes")
    assert(Multimodal.resizeImages(media, 8, 8).schema == media.schema)
  }

  test("sampleFrames is metadata-only and strides correctly") {
    val out = Multimodal.sampleFrames(media, stride = 3).collect()
    assert(out.length == 1)
    assert(out.head.getSeq[Long](1) == Seq(0L, 3L, 6L, 9L))
    // plan never reads the bytes column
    val plan = Multimodal.sampleFrames(media, 3).queryExecution.optimizedPlan.toString
    assert(!plan.contains("bytes,") || !plan.contains("#bytes"), plan)
  }
}
