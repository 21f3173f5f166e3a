package graft.multimodal

import graft.olhovivo.SparkTestBase
import graft.Tables
import Multimodal._

/** Multimodal plumbing: schema, batched partition-local decode, feature
  * shape, determinism. Documents carry prose-byte payloads, so decode
  * routes to the deterministic fallback here; the REAL codec path is
  * covered by JvmCodecSpec and the q62/q63 gates. */
class MultimodalSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("documents → media records: binary payload round-trips, kinds assigned") {
    val ds = fromDocuments(spark, Tables.documents(spark, dir))
    val rows = ds.take(10)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(Set("image", "audio", "video")(r.kind))
      assert(payloadText(r).nonEmpty, "payload must round-trip as bytes")
      assert(r.media_id % 3 match {
        case 0 => r.kind == "image"
        case 1 => r.kind == "audio"
        case _ => r.kind == "video"
      })
    }
  }

  test("batched decode: stable schema, fixed feature dim, deterministic") {
    val ds = fromDocuments(spark, Tables.documents(spark, dir))
    val feats = decodeFeatures(ds, batchSize = 7) // odd batch size → ragged last chunk
    val rows = feats.collect()
    assert(rows.length == ds.count())
    rows.foreach { f =>
      assert(f.feature.length == FeatureDim)
      assert(f.byte_len > 0)
      if (f.kind == "audio") assert(f.width == 0 && f.height == 0)
      else assert(f.width >= 1 && f.height >= 1)
      if (f.kind == "image") assert(f.duration_ms == 0.0)
    }
    // decode twice → identical (stub must be deterministic for tests)
    val again = decodeFeatures(ds, batchSize = 64).collect()
    assert(rows.map(f => (f.media_id, f.width, f.feature.toSeq)).sortBy(_._1).toSeq ==
      again.map(f => (f.media_id, f.width, f.feature.toSeq)).sortBy(_._1).toSeq)
  }
}
