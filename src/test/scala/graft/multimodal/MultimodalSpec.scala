package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: binary payload + metadata struct schema,
  * and the partition-batched (stub) decode stage.
  */
class MultimodalSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType, false), StructField("text", StringType, true)))

  test("attachBinary: BinaryType payload + typed prunable metadata struct") {
    val df = mkDf(schema, Row(1L, "hello"), Row(2L, "wörld"))
    val out = Multimodal.attachBinary(df, "doc_id", "text")
    assert(out.schema("payload").dataType === BinaryType)
    val meta = out.schema("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSeq === Seq("byte_len", "mime", "sig"))
    val rows = out.orderBy("doc_id").collect()
    assert(rows(0).getAs[Array[Byte]]("payload").toSeq === "hello".getBytes("UTF-8").toSeq)
    assert(rows(0).getAs[Row]("meta").getAs[Long]("byte_len") === 5L)
    assert(rows(1).getAs[Row]("meta").getAs[Long]("byte_len") === 6L) // ö is 2 bytes
  }

  test("decodeFeatures: deterministic fake features, batch-shaped iteration") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      MediaRow(1L, "text/plain", "abc".getBytes),
      MediaRow(2L, "text/plain", "abc".getBytes),
      MediaRow(3L, "text/plain", "xyz".getBytes)))
    val out = Multimodal.decodeFeatures(ds, batchSize = 2).collect().sortBy(_.id)
    assert(out.map(_.byteLen).toSeq === Seq(3, 3, 3))
    assert(out(0).checksum === out(1).checksum) // deterministic
    assert(out(0).checksum !== out(2).checksum)
    assert(out.forall(_.featureDim === 16))
  }
}
