package graft.sources

import org.apache.spark.sql.functions._

import graft.olhovivo.SparkTestBase

/** Z-order layout: interleave correctness, row conservation, and the
  * property the layout exists for — parquet file min/max footprints
  * prune box predicates on EVERY clustered dimension, where a
  * single-column sort clusters only its leading column. */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("zValue: exact bit interleave on a 2x2-bit grid") {
    val pts = Seq((0, 0), (1, 0), (0, 1), (3, 3), (2, 1)).toDF("x", "y")
    val z = pts.select(
        $"x", $"y",
        ZOrder.zValue(Seq($"x", $"y"), Seq(0, 0), Seq(3, 3), bits = 2).as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // interleave (x bit i → pos 2i, y bit i → pos 2i+1)
    assert(z((0, 0)) == 0L && z((1, 0)) == 1L && z((0, 1)) == 2L)
    assert(z((3, 3)) == 15L)
    assert(z((2, 1)) == 6L) // x=10b → pos2; y=01b → pos1
  }

  test("zValue: null dimension ranks at the curve origin, not the max corner") {
    val pts = Seq((Some(3), 3), (None, 3)).toDF("x", "y")
    val z = pts.select(
        ZOrder.zValue(Seq($"x", $"y"), Seq(0, 0), Seq(3, 3), bits = 2).as("z"))
      .collect().map(_.getLong(0)).toSet
    // (3,3) interleaves to 15; (null,3) must behave as (0,3) → 10, not
    // collapse into the max corner (least/greatest skip nulls)
    assert(z == Set(15L, 10L), s"got $z")
  }

  test("writeZOrdered: rows conserved, file count as requested") {
    val dir = scratchDir("zorder-rows").toString
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    ZOrder.writeZOrdered(li, s"$dir/li", Seq("l_partkey", "l_suppkey"), 8)
    val files = new java.io.File(s"$dir/li").listFiles
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 8, s"got ${files.length} files")
    assert(spark.read.parquet(s"$dir/li").count() == li.count())
  }

  test("z-order prunes box predicates on both dims; single-col sort only on its leader") {
    val dir = scratchDir("zorder-prune").toString
    // sf0.01: ~60k rows with ~2000 distinct partkeys / ~100 suppkeys —
    // enough key granularity that file footprints reflect the curve
    // (sf0.001's ~200 partkeys quantize too coarsely to assert on)
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select($"l_partkey", $"l_suppkey", $"l_quantity")
    val n = 16
    ZOrder.writeZOrdered(li, s"$dir/z", Seq("l_partkey", "l_suppkey"), n)
    // baseline: clustered on l_partkey alone
    li.repartitionByRange(n, $"l_partkey").sortWithinPartitions($"l_partkey")
      .write.mode("overwrite").parquet(s"$dir/flat")
    // per-file [min,max] footprints of both dims
    def footprints(path: String) =
      new java.io.File(path).listFiles.filter(_.getName.endsWith(".parquet")).map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min($"l_partkey"), max($"l_partkey"),
            min($"l_suppkey"), max($"l_suppkey")).head()
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }
    val (zf, ff) = (footprints(s"$dir/z"), footprints(s"$dir/flat"))
    val (pLo, pHi, sLo, sHi) = li.agg(min($"l_partkey"), max($"l_partkey"),
      min($"l_suppkey"), max($"l_suppkey")).head() match {
      case r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // a ~20%-per-dim box in the middle of the space
    def box(lo: Long, hi: Long, from: Double, to: Double) =
      (lo + ((hi - lo) * from).toLong, lo + ((hi - lo) * to).toLong)
    val (bp1, bp2) = box(pLo, pHi, 0.4, 0.6)
    val (bs1, bs2) = box(sLo, sHi, 0.4, 0.6)
    def hits(fs: Array[(Long, Long, Long, Long)],
             p: Option[(Long, Long)], s: Option[(Long, Long)]) =
      fs.count { case (pmin, pmax, smin, smax) =>
        p.forall { case (a, b) => pmax >= a && pmin <= b } &&
        s.forall { case (a, b) => smax >= a && smin <= b }
      }
    // suppkey-only box: the partkey-sorted layout cannot prune (every
    // file spans the full suppkey range); z-order skips a good fraction
    val zS = hits(zf, None, Some((bs1, bs2)))
    val fS = hits(ff, None, Some((bs1, bs2)))
    assert(fS >= n - 1, s"partkey-sorted layout unexpectedly pruned suppkey box: $fS/$n")
    assert(zS <= (n * 0.7).toInt, s"z-order pruned too little on suppkey: $zS/$n")
    // both-dims box: z-order still skips a meaningful share. The bound
    // is deliberately loose (10/16, not n/2): repartitionByRange's
    // range bounds come from a reservoir sample seeded by the RDD id,
    // so file boundaries jitter ±1 file between runs (observed 8 vs 9
    // hits) — the claim under test is "prunes", not an exact count
    val zB = hits(zf, Some((bp1, bp2)), Some((bs1, bs2)))
    assert(zB <= (n * 0.625).toInt, s"z-order box hit $zB/$n files")
  }

  test("quantile_rank: upper-bound semantics, duplicates, nulls, empty bounds") {
    val bounds = Seq(1.0, 5.0, 5.0, 9.0)
    val rows = Seq(Some(0.0), Some(1.0), Some(4.0), Some(5.0), Some(9.0),
        Some(100.0), None).toDF("v")
      .select(call_function("quantile_rank", $"v", typedlit(bounds)).as("r"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq
    // rank = #{bounds <= v}: 0→0, 1→1, 4→1, 5→3 (both dups), 9→4, 100→4
    assert(rows == Seq(0L, 1L, 1L, 3L, 4L, 4L, null))
    val empty = Seq(3.0).toDF("v")
      .select(call_function("quantile_rank", $"v", typedlit(Seq.empty[Double])).as("r"))
      .head().getLong(0)
    assert(empty == 0L)
  }

  test("quantile_rank strings: byte-order upper bound, nulls, empty") {
    // CODEGEN_ONLY turns any generated-code compile failure into a hard
    // error instead of Spark's silent interpreter fallback — this caught
    // a real one (JVM binary array name "[L...;" emitted where Java
    // source syntax "UTF8String[]" was needed)
    SparkTestBase.sessionConfLock.synchronized {
      val saved = spark.conf.getOption("spark.sql.codegen.factoryMode")
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      try {
        val bounds = Seq("bb", "dd", "dd", "ff")
        val rows = Seq(Some("aa"), Some("bb"), Some("cc"), Some("dd"), Some("ff"),
            Some("zz"), None).toDF("v")
          .select(call_function("quantile_rank", $"v", typedlit(bounds)).as("r"))
          .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq
        // rank = #{bounds <= v}: aa→0, bb→1, cc→1, dd→3 (dups), ff→4, zz→4
        assert(rows == Seq(0L, 1L, 1L, 3L, 4L, 4L, null))
        val empty = Seq("x").toDF("v")
          .select(call_function("quantile_rank", $"v", typedlit(Seq.empty[String])).as("r"))
          .head().getLong(0)
        assert(empty == 0L)
      } finally saved match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("string dimension: skewed domain column prunes with quantile ranks") {
    val dir = scratchDir("zorder-str").toString
    val n = 16
    // web-corpus shape: one heavy-hitter domain holds 90% of rows, the
    // tail spreads over many; y uniform numeric. A string column has no
    // linear min/max quantization AT ALL — quantile ranks are what
    // makes it clusterable.
    val rows = spark.range(0, 50000).select(
      when($"id" % 10 < 9, lit("popular.com"))
        .otherwise(concat(lit("site"), format_string("%04d", $"id" % 2000), lit(".org")))
        .as("domain"),
      (($"id" * 7919) % 1000).as("y"))
    ZOrder.writeZOrdered(rows, s"$dir/z", Seq("domain", "y"), n)
    assert(spark.read.parquet(s"$dir/z").count() == 50000)
    // an equality predicate on a mid-tail domain (~0.005% of rows) must
    // skip most files on the string footprints
    val probe = "site1000.org"
    val hit = new java.io.File(s"$dir/z").listFiles
      .filter(_.getName.endsWith(".parquet")).count { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min($"domain"), max($"domain")).head()
        !r.isNullAt(0) && r.getString(1) >= probe && r.getString(0) <= probe
      }
    assert(hit <= n / 2, s"string dim failed to prune: $hit/$n files overlap $probe")
    // and the heavy hitter itself stays clustered rather than smeared
    // over every file
    val hot = new java.io.File(s"$dir/z").listFiles
      .filter(_.getName.endsWith(".parquet")).count { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min($"domain"), max($"domain")).head()
        !r.isNullAt(0) && r.getString(1) >= "popular.com" && r.getString(0) <= "popular.com"
      }
    assert(hot >= n / 2, s"90% heavy hitter should span many files, got $hot/$n")
  }

  test("two string dimensions share one sample pass; both prune") {
    val dir = scratchDir("zorder-str2").toString
    val n = 16
    // lang is mostly-null (nulls rank at the origin, and must not bias
    // domain's fit through a joint na.drop); domain spreads uniformly
    val rows = spark.range(0, 40000).select(
      concat(lit("host"), format_string("%05d", $"id" % 4000), lit(".net")).as("domain"),
      when($"id" % 4 === 0, concat(lit("lang_"), format_string("%02d", ($"id" / 4).cast("long") % 40)))
        .otherwise(lit(null).cast("string")).as("lang"))
    val bounds = ZOrder.fitBounds(rows, Seq("domain", "lang"))
    assert(bounds.forall(_.isInstanceOf[ZOrder.StringBounds]))
    // the mostly-null column still fits a real boundary model from its
    // non-null sample slice
    assert(bounds(1).size > 10, s"mostly-null column fit only ${bounds(1).size} bounds")
    ZOrder.writeZOrdered(rows, s"$dir/z", Seq("domain", "lang"), n)
    assert(spark.read.parquet(s"$dir/z").count() == 40000)
    def hits(colName: String, probe: String): Int =
      new java.io.File(s"$dir/z").listFiles.filter(_.getName.endsWith(".parquet")).count { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col(colName)), max(col(colName))).head()
        !r.isNullAt(0) && r.getString(1) >= probe && r.getString(0) <= probe
      }
    assert(hits("domain", "host02000.net") <= n / 2, "domain dim failed to prune")
    assert(hits("lang", "lang_20") <= n / 2, "lang dim failed to prune")
  }

  test("skewed column: quantile ranks prune where linear min/max cannot") {
    val dir = scratchDir("zorder-skew").toString
    val n = 16
    // web-scale shape: 90% of x packed into [0, 900), 10% long tail out
    // to ~10^9; y uniform. Linear 8-bit quantization has bucket width
    // ~4*10^6 — the ENTIRE dense region quantizes to rank 0, so the
    // z-curve degenerates to a y-sort and an x-predicate prunes nothing.
    val rows = spark.range(0, 50000).select(
      when($"id" % 10 < 9, $"id" % 900)
        .otherwise(lit(1000L) + ($"id" % 1000) * 1000000L).as("x"),
      (($"id" * 7919) % 1000).as("y"))
    ZOrder.writeZOrdered(rows, s"$dir/q", Seq("x", "y"), n)
    // linear baseline: same curve, same file count, min/max quantization
    val st = rows.agg(min($"x").cast("double"), max($"x").cast("double"),
      min($"y").cast("double"), max($"y").cast("double")).head()
    rows.withColumn("__z", ZOrder.zValue(Seq($"x", $"y"),
        Seq(st.getDouble(0), st.getDouble(2)), Seq(st.getDouble(1), st.getDouble(3)),
        bits = 8))
      .repartitionByRange(n, $"__z").sortWithinPartitions($"__z").drop("__z")
      .write.mode("overwrite").parquet(s"$dir/lin")
    // x-range predicate inside the dense region, ~11% of rows
    def hits(path: String): Int =
      new java.io.File(path).listFiles.filter(_.getName.endsWith(".parquet")).count { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min($"x"), max($"x")).head()
        // an empty part file (reservoir-sampled range bounds can leave
        // one) aggregates to null min/max — count it as pruned
        !r.isNullAt(0) && r.getLong(1) >= 100 && r.getLong(0) <= 200
      }
    val (qh, lh) = (hits(s"$dir/q"), hits(s"$dir/lin"))
    assert(lh >= (n * 0.8).toInt,
      s"expected the linear layout NOT to prune the skewed dim, hit $lh/$n")
    // 0.6, not 0.5: file boundaries come from the range exchange's
    // RESERVOIR SAMPLE, so the hit count jitters ±1 with suite order
    // (one full-suite run read 9/16 where isolation reads ≤8). The
    // claim that matters stays wide: quantile ranks prune where the
    // linear layout hits ≥13/16.
    assert(qh <= (n * 0.6).toInt,
      s"quantile layout failed to prune the skewed dim: hit $qh/$n files")
    assert(qh < lh - 2,
      s"quantile layout must prune far below linear: $qh vs $lh of $n")
  }
}
