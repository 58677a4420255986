package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import graft.tables.Tables

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def assets = Multimodal.assetsFromDocuments(
    spark, Tables.documents(spark, sfDir).limit(50))

  test("binary asset schema round-trips through Dataset encoders") {
    val ds = assets
    val schema = ds.schema
    assert(schema("content").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val first = ds.orderBy("asset_id").head()
    assert(first.meta.kind == "image" && first.content.nonEmpty)
  }

  test("decode → frames: one frame per 256-byte block, deterministic") {
    val frames = Multimodal.decodeToFrames(Multimodal.repartitionForDecode(assets, 4))
    val byAsset = frames.collect().groupBy(_.asset_id)
    val lens = assets.collect().map(a => a.asset_id -> a.content.length).toMap
    byAsset.foreach { case (id, fs) =>
      assert(fs.length == (lens(id) + 255) / 256)
      assert(fs.forall(f => f.mean_intensity > 0 && f.width == 64))
    }
    // determinism across runs
    val again = Multimodal.decodeToFrames(assets).collect().groupBy(_.asset_id)
    assert(again.view.mapValues(_.toSet).toMap ==
      byAsset.view.mapValues(_.toSet).toMap)
  }

  test("frame sampling keeps every 2nd frame") {
    val frames = Multimodal.decodeToFrames(assets)
    val sampled = Multimodal.frameSample(frames, 2).collect()
    assert(sampled.nonEmpty && sampled.forall(_.frame_idx % 2 == 0))
  }

  test("feature extraction: fixed dim, L2-normalized, reusable downstream") {
    val feats = Multimodal.extractFeatures(assets).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.feature.length == Multimodal.FeatureDim)
      val norm = math.sqrt(f.feature.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5)
    }
  }

  test("resize rewrites metadata, preserves ids") {
    val resized = Multimodal.resize(assets, 32, 32).collect()
    assert(resized.forall(a => a.meta.width == 32 && a.meta.height == 32))
    assert(resized.map(_.asset_id).sorted.toSeq ==
      assets.collect().map(_.asset_id).sorted.toSeq)
  }
}
