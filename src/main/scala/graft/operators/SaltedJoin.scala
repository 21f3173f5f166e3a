package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the join-side skew treatment (the aggregation
  * side is SkewedAggregate): when the fact side's join key is skewed
  * and the dimension is too large to broadcast, a plain shuffle join
  * sends every row of a hot key to ONE reducer. Salting spreads each
  * key over `salts` partitions: fact rows get a deterministic salt in
  * [0, salts), the dimension is replicated once per salt value, and
  * the join keys on (key, salt) — hot keys now occupy `salts`
  * reducers, at the cost of a `salts`× dimension fan-out (bounded:
  * dimension-sized, not fact-sized).
  *
  * Output is EXACTLY the plain inner join: every fact row appears with
  * its original multiplicity (one salt each), and each dimension copy
  * matches only its salt. AQE's skew-join handles the sort-merge case
  * adaptively; this operator is the compositional form for when the
  * plan must be pinned (or the skew is known ahead of time).
  */
object SaltedJoin {

  /** Inner-join `fact` to `dim` on `factKey === dimKey`, salted.
    * `saltSource` picks each fact row's salt deterministically (pass a
    * row-unique column, e.g. the fact's primary key — NOT the join
    * key, which would put every hot-key row back in one bucket). */
  def inner(fact: DataFrame, factKey: Column, dim: DataFrame,
            dimKey: Column, saltSource: Column, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // withColumn silently REPLACES an existing column; a caller column
    // named __sj_salt would be overwritten and then dropped from the
    // output — corrupted data, not an error — so reject it up front
    require(!fact.columns.contains("__sj_salt") && !dim.columns.contains("__sj_salt"),
      "SaltedJoin: input already has a __sj_salt column; rename it first")
    val saltedFact = fact.withColumn("__sj_salt",
      pmod(xxhash64(saltSource), lit(salts.toLong)))
    val replicatedDim = dim.withColumn("__sj_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    // shuffle_hash: pin the shuffled hash join this operator exists to
    // spread (broadcast would make salting moot; sort-merge works too
    // but pays a per-partition sort)
    saltedFact
      .join(replicatedDim.hint("shuffle_hash"),
        factKey === dimKey && saltedFact("__sj_salt") === replicatedDim("__sj_salt"))
      .drop("__sj_salt")
  }
}
