package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import graft.tables.Tables

/** The multimodal library surface over REAL container bytes (round 14 —
  * the DecodeStub is gone): frames are the MP4 container's extracted
  * sample payloads, features are L2-normalized folded histograms of the
  * decoded units, and undecodable assets flow to the failure lane (no
  * frames, no feature row) instead of producing fake values.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val sfDir = "/root/testdata/sf0.001"

  // ids 1..49 decode; id 0 is the planted truncation (0 % 89 == 0)
  private def assets = Multimodal.assetsFromDocumentsMp4(
    spark, Tables.documents(spark, sfDir).limit(50))

  test("binary asset schema round-trips through Dataset encoders") {
    val ds = assets
    val schema = ds.schema
    assert(schema("content").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val first = ds.orderBy("asset_id").head()
    assert(first.meta.kind == "video" && first.content.nonEmpty)
  }

  test("decode → frames: one frame per container-extracted sample, deterministic") {
    val frames = Multimodal.decodeToFrames(Multimodal.repartitionForDecode(assets, 4))
    val byAsset = frames.collect().groupBy(_.asset_id)
    // the truncated container yields NO frames; every decodable one yields
    // exactly its sample count (1 + id % 7) with the generator's mean bytes
    assert(!byAsset.contains(0L), "the truncated container must yield no frames")
    (1L to 49L).foreach { id =>
      val fs = byAsset(id).sortBy(_.frame_idx)
      assert(fs.length == (1 + id % 7).toInt, s"sample count for $id")
      fs.foreach { f =>
        val sk = (8 + (id + f.frame_idx) % 9).toInt
        val bytes = Array.tabulate(sk)(j => ((id * 31 + f.frame_idx * 17 + j * 7) % 256).toInt)
        assert(f.mean_intensity == bytes.sum.toDouble / sk,
          s"frame mean for ($id, ${f.frame_idx})")
      }
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

  test("feature extraction: fixed dim, L2-normalized, failures skipped") {
    val feats = Multimodal.extractFeatures(assets).collect()
    assert(feats.map(_.asset_id).sorted.toSeq == (1L to 49L),
      "one feature per decodable asset; the truncated one routed to the failure lane")
    feats.foreach { f =>
      assert(f.feature.length == Multimodal.FeatureDim)
      val norm = math.sqrt(f.feature.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5)
    }
  }

  test("decoded units agree across the codec family's parsers") {
    // the PPM/WAV codec stream through the same decodedUnits entry point
    val codecAssets = Multimodal.assetsFromDocumentsCodec(
      spark, Tables.documents(spark, sfDir).limit(10)).collect()
    codecAssets.foreach { a =>
      val units = Multimodal.decodedUnits(a)
      assert(units.nonEmpty, s"codec asset ${a.asset_id} must decode")
      assert(units.get.length == (if (a.asset_id % 2 == 0) 192 else units.get.length))
    }
  }

  test("resize rewrites metadata, preserves ids") {
    val resized = Multimodal.resize(assets, 32, 32).collect()
    assert(resized.forall(a => a.meta.width == 32 && a.meta.height == 32))
    assert(resized.map(_.asset_id).sorted.toSeq ==
      assets.collect().map(_.asset_id).sorted.toSeq)
  }
}
