package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.mediaFromDocuments(spark,
    Tables.documents(spark, sfDir))

  test("media table has the canonical multimodal schema") {
    // names + types (nullability differs: lit() columns are non-nullable)
    assert(media.schema.map(f => (f.name, f.dataType.simpleString)) ===
      Multimodal.mediaSchema.map(f => (f.name, f.dataType.simpleString)))
    assert(media.count() === 500)
  }

  test("extractFeatures is deterministic and preserves rows") {
    val f1 = Multimodal.extractFeatures(spark, media)
    assert(f1.count() === 500)
    val v1 = f1.filter(col("media_id") === 7).head.feature.toSeq
    val v2 = Multimodal.extractFeatures(spark, media)
      .filter(col("media_id") === 7).head.feature.toSeq
    assert(v1 === v2)
    assert(v1.length === Multimodal.FakeCodec.featureDim)
    assert(v1.exists(_ != 0.0f))
  }

  test("sampleFrames explodes videos by stride, slices payload bytes") {
    val frames = Multimodal.sampleFrames(spark, media, stride = 2)
    val perVideo = frames.groupByKey(_.media_id).count().collect().toMap
    assert(perVideo.nonEmpty)
    val one = frames.filter(col("media_id") === perVideo.keys.head).collect()
    assert(one.map(_.frame_index).distinct.length === one.length)
    assert(one.forall(f => f.frame_ms == f.frame_index * 1000L))
  }

  test("resize caps dimensions preserving aspect ratio") {
    val resized = Multimodal.resize(media, 100, 100)
    val over = resized.filter(col("meta.width") > 100 ||
      col("meta.height") > 100).count()
    assert(over === 0)
    // a row already under the cap is untouched
    val small = media.filter(col("meta.width") <= 100 &&
      col("meta.height") <= 100).select("media_id").limit(1)
    if (small.count() > 0) {
      val id = small.head.getLong(0)
      val before = media.filter(col("media_id") === id)
        .select("meta.width").head.getInt(0)
      val after = resized.filter(col("media_id") === id)
        .select("meta.width").head.getInt(0)
      assert(before === after)
    }
  }
}
