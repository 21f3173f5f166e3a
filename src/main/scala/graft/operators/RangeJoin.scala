package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized temporal range join: pairs (l, r) on the same key with
  * r.time ∈ (l.time, l.time + horizon].
  *
  * A naive theta-join plans as a nested loop; instead each left row is
  * replicated to the two `horizon`-width buckets its window can touch
  * and joined EQUI on (key, bucket) — the standard trick that turns a
  * range predicate into a hash shuffle with bounded fan-out (×2), then
  * the exact predicate filters. Scale: shuffle volume is 2|L|+|R|;
  * per-bucket work is bounded by data density per horizon window, which
  * is exactly the output's intrinsic size.
  */
object RangeJoin {

  /** Matched pairs with all left columns and `r_`-prefixed right time.
    * Both inputs must share the schema (self-join use case); `idCol`
    * disambiguates. */
  def selfRangeJoin(df: DataFrame, key: String, time: String, idCol: String,
                    horizon: Long): DataFrame = {
    // horizon = 0 would only fail deep in floorDiv at runtime, and a
    // negative horizon silently returns an empty result
    require(horizon > 0, "horizon must be positive")
    // Integer FLOOR division (Portable.floorDiv), not double-divide +
    // cast: truncation toward zero puts negative times in the wrong
    // bucket (silently missed pairs), and doubles lose exactness past
    // 2^53 for ns-scale longs.
    val l = df.select(col(key).as("_k"), col(time).as("_lt"), col(idCol).as("_lid"))
      .withColumn("_bucket", explode(array(
        graft.functions.Portable.floorDiv(col("_lt"), horizon),
        graft.functions.Portable.floorDiv(col("_lt"), horizon) + 1)))
    val r = df.select(col(key).as("_k"), col(time).as("_rt"), col(idCol).as("_rid"))
      .withColumn("_bucket", graft.functions.Portable.floorDiv(col("_rt"), horizon))
    l.join(r, Seq("_k", "_bucket"))
      .filter(col("_rt") > col("_lt") && col("_rt") <= col("_lt") + horizon)
      .select(col("_k").as(key), col("_lid").as(s"l_$idCol"),
        col("_rid").as(s"r_$idCol"), col("_lt").as(s"l_$time"), col("_rt").as(s"r_$time"))
  }

  /** Per-left-row count of right rows in its following window, zeros
    * kept (left join back onto the input). */
  def countFollowing(df: DataFrame, key: String, time: String, idCol: String,
                     horizon: Long): DataFrame = {
    val pairs = selfRangeJoin(df, key, time, idCol, horizon)
      .groupBy(col(s"l_$idCol").as(idCol))
      .agg(count(lit(1)).as("n_following"))
    df.select(col(idCol), col(key), col(time))
      .join(pairs, Seq(idCol), "left")
      .withColumn("n_following", coalesce(col("n_following"), lit(0L)))
  }

  /** Interval OVERLAP self-join: distinct pairs (id_a < id_b) on the
    * same key whose [start, end] intervals intersect
    * (a.start ≤ b.end ∧ b.start ≤ a.end, inclusive ends).
    *
    * Bucketization generalizes the point-range trick: each interval is
    * replicated to every `bucketWidth`-wide bucket it touches, the join
    * is EQUI on (key, bucket), then the exact predicate filters and
    * `distinct` collapses multi-bucket matches. Overlapping intervals
    * always share the bucket containing any common point, so no pair is
    * lost. Fan-out per row is len/bucketWidth + 1 — pass a width on the
    * order of the TYPICAL interval length; `maxLen` is validated so a
    * silent fan-out explosion (or a width below the longest interval
    * hiding none — widths are correctness-neutral, only fan-out varies)
    * surfaces as an error instead of a hung job. */
  def intervalOverlapJoin(df: DataFrame, key: String, start: String, end: String,
                          idCol: String, bucketWidth: Long,
                          maxLen: Long): DataFrame = {
    require(bucketWidth > 0 && maxLen >= bucketWidth,
      "need 0 < bucketWidth <= maxLen")
    val fd = (c: org.apache.spark.sql.Column) =>
      graft.functions.Portable.floorDiv(c, bucketWidth)
    // validation lives in the filter so it cannot be pruned away; rows
    // with end < start are degenerate (overlap with nothing) and drop
    val validated = df.filter(
      when(col(end) - col(start) > maxLen,
        raise_error(concat(lit(s"interval longer than maxLen=$maxLen at $idCol="),
          col(idCol).cast("string"))).cast("boolean"))
      .otherwise(col(end) >= col(start)))
    def side(idAs: String, st: String, en: String) = validated
      .select(col(key).as("_k"), col(idCol).as(idAs),
        col(start).as(st), col(end).as(en),
        explode(sequence(fd(col(start)), fd(col(end)))).as("_bucket"))
    side("id_a", "_sa", "_ea").join(side("id_b", "_sb", "_eb"), Seq("_k", "_bucket"))
      .filter(col("id_a") < col("id_b") &&
        col("_sa") <= col("_eb") && col("_sb") <= col("_ea"))
      .select(col("_k").as(key), col("id_a"), col("id_b"))
      .distinct()
  }
}
