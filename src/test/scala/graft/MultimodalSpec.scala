package graft

import org.apache.spark.sql.functions._
import graft.functions.Multimodal

/** The decode plumbing's contract: distributed per-partition execution,
  * deterministic output, and agreement with the pure-expression
  * metadata path (both derive from the payload md5).
  */
class MultimodalSpec extends SparkSpecBase {

  private lazy val assets = spark.read.parquet(s"$sfDir/documents.parquet")
    .select(col("doc_id"), col("text").cast("binary").as("payload"))
    .repartition(4) // force multiple partitions: decoder must init per partition

  test("decodePartitioned matches the expression-based fake decode") {
    val viaExpr = assets.select(col("doc_id"),
      Multimodal.fakeWidth(col("payload")).as("width"),
      Multimodal.fakeHeight(col("payload")).as("height"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val viaPartitions = Multimodal.decodePartitioned(assets, "doc_id", "payload")
      .collect().map(d => d.asset_id -> (d.width, d.height)).toMap
    assert(viaPartitions == viaExpr)
    assert(viaPartitions.size == 500)
  }

  test("decodePartitioned features match the decodeFeatures expression") {
    val viaExpr = Multimodal.decodeFeatures(assets.limit(50), "payload")
      .select(col("doc_id"), col("features"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).map(_.toFloat)).toMap
    val viaPartitions = Multimodal.decodePartitioned(assets.limit(50), "doc_id", "payload")
      .collect().map(d => d.asset_id -> d.features.toSeq).toMap
    assert(viaPartitions.keySet == viaExpr.keySet)
    viaPartitions.foreach { case (id, f) =>
      assert(f.zip(viaExpr(id)).forall { case (a, b) => math.abs(a - b) < 1e-6 }, s"doc $id")
    }
  }

  test("resizePlan preserves aspect ratio and caps the long edge") {
    val decoded = Multimodal.decodePartitioned(assets, "doc_id", "payload")
    val plan = Multimodal.resizePlan(decoded, 256).collect()
    plan.foreach { r =>
      val (w, h, ow, oh) = (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert(math.max(ow, oh) <= 256, s"long edge not capped: $ow x $oh")
      if (math.max(w, h) <= 256) assert(ow == w && oh == h)
      else assert(math.max(ow, oh) == 256)
    }
  }

  test("frameSample emits k deterministic frames per asset") {
    val frames = Multimodal.frameSample(assets.limit(10), "doc_id", "payload", 4)
    val rows = frames.collect()
    assert(rows.length == 40)
    assert(rows.groupBy(_.asset_id).forall(_._2.map(_.frame_no).sorted.toSeq == Seq(0, 1, 2, 3)))
    val again = Multimodal.frameSample(assets.limit(10), "doc_id", "payload", 4).collect()
    assert(rows.map(f => (f.asset_id, f.frame_no, f.frame_sha)).toSet ==
      again.map(f => (f.asset_id, f.frame_no, f.frame_sha)).toSet)
  }

  test("decode output schema is stable and features are bounded") {
    val ds = Multimodal.decodePartitioned(assets, "doc_id", "payload")
    assert(ds.schema.fieldNames.toSeq == Seq("asset_id", "width", "height", "features"))
    val sample = ds.take(20)
    assert(sample.forall(d => d.width >= 1 && d.width <= 1024 && d.height >= 1 && d.height <= 1024))
    assert(sample.forall(d => d.features.length == 8 && d.features.forall(f => f >= 0f && f < 1f)))
  }
}
