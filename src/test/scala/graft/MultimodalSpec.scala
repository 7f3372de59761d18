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

  test("segmentPlan: windows tile the full duration, last window clipped, never empty") {
    val segs = Multimodal.segmentPlan(assets, "doc_id", "payload").collect()
    assert(segs.nonEmpty)
    val byAsset = segs.groupBy(_.getLong(0))
    byAsset.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // seg_no contiguous from 0; starts at stride spacing
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) == i && r.getLong(2) == i * 10000L)
      }
      // every window non-empty, end > start, ends clipped at the max end
      assert(sorted.forall(r => r.getLong(3) > r.getLong(2)))
      val dur = sorted.map(_.getLong(3)).max
      // last window start < duration (no window past the end)
      assert(sorted.last.getLong(2) < dur)
      // all but possibly the last reach the full 30s or the clip
      assert(sorted.init.forall(r => r.getLong(3) - r.getLong(2) <= 30000L))
    }
  }

  test("tilePlan: grid covers the image, edge tiles clipped to (w, h)") {
    val tiles = Multimodal.tilePlan(assets, "doc_id", "payload").collect()
    assert(tiles.nonEmpty)
    tiles.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val w = rows.map(_.getLong(5)).max // max x1 == w (edge tile clipped)
      val h = rows.map(_.getLong(6)).max
      rows.foreach { r =>
        val (tx, ty, x0, y0, x1, y1) =
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
        assert(x0 == tx * 128 && y0 == ty * 128)
        assert(x1 > x0 && y1 > y0, "empty tile")
        assert(x1 <= w && y1 <= h)
        assert(x1 - x0 <= 256 && y1 - y0 <= 256)
      }
      // the grid is dense: tile counts match the per-axis formula
      val nx = rows.map(_.getLong(1)).max + 1
      val ny = rows.map(_.getLong(2)).max + 1
      assert(rows.length == nx * ny, s"grid holes: ${rows.length} != $nx*$ny")
    }
  }

  test("decode output schema is stable and features are bounded") {
    val ds = Multimodal.decodePartitioned(assets, "doc_id", "payload")
    assert(ds.schema.fieldNames.toSeq == Seq("asset_id", "width", "height", "features"))
    val sample = ds.take(20)
    assert(sample.forall(d => d.width >= 1 && d.width <= 1024 && d.height >= 1 && d.height <= 1024))
    assert(sample.forall(d => d.features.length == 8 && d.features.forall(f => f >= 0f && f < 1f)))
  }
}
