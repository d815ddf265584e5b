package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")

  test("binary payload plumbing: schema and byte stats") {
    val df = Multimodal.payloadStats(Multimodal.asBinaryPayload(docs, "text"))
    assert(df.schema("payload").dataType.typeName == "binary")
    assert(df.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Multimodal.MediaMetaType.fieldNames.toSeq)
    val stats = df.select("doc_id", "n_bytes").as[(Long, Long)].collect().toMap
    assert(stats == Map(1L -> 11L, 2L -> 0L))
  }

  test("frame sampling slices the payload into n windows") {
    val df = Multimodal.frameSample(
      Multimodal.asBinaryPayload(Seq((1L, "abcdefghij")).toDF("doc_id", "text"), "text"),
      "payload", n = 5)
    val frames = df.select("frames").head().getAs[scala.collection.Seq[Array[Byte]]](0)
    assert(frames.size == 5)
    assert(frames.map(new String(_, "UTF-8")).mkString == "abcdefghij")
  }

  test("resize stub truncates to the byte budget") {
    val df = Multimodal.resizeStub(
      Multimodal.asBinaryPayload(Seq((1L, "abcdefghij")).toDF("doc_id", "text"), "text"),
      "payload", targetBytes = 4)
    assert(new String(df.select("payload").head().getAs[Array[Byte]](0), "UTF-8") == "abcd")
  }

  test("stubbed decode runs batched per partition with a stable feature") {
    val df = Multimodal.decodeFeatures(
      Multimodal.asBinaryPayload(docs, "text"), "payload", dim = 4)
    val row = df.where(col("doc_id") === 1).select("decoded.*").head()
    assert(row.getAs[Long]("n_bytes") == 11L)
    assert(row.getAs[String]("digest") == "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
    val feature = row.getAs[scala.collection.Seq[Float]]("feature").toSeq
    assert(feature.size == 4)
    // determinism across runs
    val again = Multimodal.decodeFeatures(
      Multimodal.asBinaryPayload(docs, "text"), "payload", dim = 4)
      .where(col("doc_id") === 1).select("decoded.feature").head()
      .getAs[scala.collection.Seq[Float]](0).toSeq
    assert(again == feature)
  }
}
