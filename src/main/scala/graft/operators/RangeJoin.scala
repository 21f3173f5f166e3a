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
}
