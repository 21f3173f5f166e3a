package graft.text

import org.apache.spark.sql.functions._

import graft.olhovivo.SparkTestBase

/** Concat-and-chunk semantics: window spans follow exactly from the
  * per-shard token offsets, documents cross window boundaries when (and
  * only when) their span demands it, and empty documents vanish. */
class PackingSpec extends SparkTestBase {
  import spark.implicits._

  test("window spans are exact for a hand-computed stream") {
    // one shard (shards=1): stream in doc_id order, W=10
    // id 1: 4 toks  @0  -> w0..w0
    // id 2: 8 toks  @4  -> w0..w1   (crosses the boundary)
    // id 3: 0 toks  dropped
    // id 4: 10 toks @12 -> w1..w2   (ends exactly on a boundary)
    // id 5: 1 tok   @22 -> w2..w2
    val docs = Seq((1L, 4L), (2L, 8L), (3L, 0L), (4L, 10L), (5L, 1L))
      .toDF("id", "n")
    val got = Packing.packWindows(docs, col("id"), col("n"),
        windowTokens = 10L, shards = 1)
      .select("doc_id", "tok_offset", "first_window", "last_window", "n_windows")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(
      (1L, 0L, 0L, 0L, 1L),
      (2L, 4L, 0L, 1L, 2L),
      (4L, 12L, 1L, 2L, 2L),
      (5L, 22L, 2L, 2L, 1L)))
  }

  test("shards pack independently and conserve the token stream") {
    val docs = (1L to 100L).map(i => (i, i % 7 + 1)).toDF("id", "n")
    val packed = Packing.packWindows(docs, col("id"), col("n"),
      windowTokens = 16L, shards = 4).cache()
    // each shard's offsets tile its stream with no gaps or overlaps:
    // max(offset + n) per shard == sum(n) per shard, min offset == 0
    val perShard = packed.groupBy("shard")
      .agg(min("tok_offset").as("lo"),
        max(col("tok_offset") + col("n_tokens")).as("hi"),
        sum("n_tokens").as("total"))
      .collect()
    assert(perShard.length == 4)
    perShard.foreach { r =>
      assert(r.getLong(1) == 0L, "stream must start at offset 0")
      assert(r.getLong(2) == r.getLong(3), "offsets must tile the stream")
    }
    // spans agree with the arithmetic definition on every row
    packed.collect().foreach { r =>
      val off = r.getAs[Long]("tok_offset"); val n = r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("first_window") == off / 16)
      assert(r.getAs[Long]("last_window") == (off + n - 1) / 16)
    }
    packed.unpersist()
  }
}
