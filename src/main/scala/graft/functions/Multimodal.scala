package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata alongside.
  *
  * The heavy decode step (JPEG decode, audio resample, frame sampling)
  * needs native libraries that are NOT in this container, so decoders
  * are STUBBED with a clearly-marked deterministic fake — but the
  * Spark-side plumbing (schema, batched per-partition processing shape,
  * metadata extraction as codegen'd expressions) is real and tested.
  */
object Multimodal {

  /** Canonical schema for a multimodal asset table. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta_width", IntegerType, nullable = true),
    StructField("meta_height", IntegerType, nullable = true),
    StructField("meta_duration_ms", LongType, nullable = true)
  ))

  /** Pure-expression metadata over a binary payload: byte length, magic
    * bytes (first 4, lowercase hex), sha256 content address.
    */
  def byteLen(bin: Column): Column = octet_length(bin)
  def magicHex(bin: Column): Column = lower(substring(hex(bin), 1, 8))
  def contentHash(bin: Column): Column = sha2(bin, 256)

  /** Deterministic fake "decoded" dimensions derived from the content
    * hash — stands in for a real image decode.
    */
  def fakeWidth(bin: Column): Column =
    (conv(substring(md5(bin), 1, 4), 16, 10).cast("long") % 1024 + 1).cast("int")
  def fakeHeight(bin: Column): Column =
    (conv(substring(md5(bin), 5, 4), 16, 10).cast("long") % 1024 + 1).cast("int")

  /** STUB decode: where a real implementation would run a native
    * decoder per batch inside mapPartitions (keeping the payload off
    * the driver and amortizing decoder init per partition), we emit a
    * deterministic fake feature vector from the content hash. The
    * partitioning/batching shape is the real, scale-correct one.
    */
  def decodeFeatures(df: DataFrame, payloadCol: String, dims: Int = 8): DataFrame = {
    val out = df.withColumn(
      "features",
      transform(
        sequence(lit(1), lit(dims)),
        i => (conv(md5(col(payloadCol)).substr(i * 2, lit(4)), 16, 10).cast("long") % 1000).cast("double") / 1000.0
      )
    )
    out
  }
}
