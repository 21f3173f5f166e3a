package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE tokenizer training (Sennrich et al. 2016, word-internal
  * byte-pair encoding) — the merge-rule learner every training-data
  * pipeline runs before tokenizing a corpus.
  *
  * Scale design: ONE corpus aggregation reduces the data to the
  * word-frequency table (vocab-bounded — the classic BPE trainer
  * posture), then each merge round operates on the VOCAB, not the
  * corpus: adjacent-pair counts weighted by word frequency (one
  * vocab-sized aggregation), a 1-row argmax to the driver (the model,
  * not data), and a map-only merge apply. R rounds = R vocab-sized
  * shuffles after the single corpus pass.
  *
  * Determinism (oracle-exact): the winning pair each round is
  * (count DESC, left ASC, right ASC) — binary string order on both
  * engines; overlapping pairs count per occurrence ("aaa" counts
  * (a,a) twice, the reference convention); the merge APPLY is the
  * greedy left-to-right non-overlapping pairing of reference BPE
  * ("aaaa" → [aa, aa], "abab" + (a,b) → [ab, ab]), implemented as a
  * sequential fold over the symbol array carrying (output, skip-next)
  * — a string-replace formulation would silently mis-merge repeating
  * pair sequences because each replacement consumes the boundary the
  * next match needs. The DuckDB oracle runs the IDENTICAL fold via
  * `list_reduce` with a prepended sentinel accumulator.
  */
object BpeTrainer {

  case class MergeRule(round: Int, left: String, right: String, count: Long)

  /** (word, sym, n): symbol array per DISTINCT word with its corpus
    * frequency — the vocab-bounded table every round consumes. */
  def wordSymbols(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(TextAnalysis.tokens(textCol)).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).cast("long").as("n"))
      .select(col("word"),
        transform(sequence(lit(1), length(col("word"))),
          i => substring(col("word"), i, lit(1))).as("sym"),
        col("n"))

  /** BPE ENCODING — apply learned rules in order to the corpus vocab:
    * (word, sym, n, n_tokens). R chained map-only folds = ONE pass over
    * the vocab table when materialized (the deployment tokenizes the
    * corpus itself the same way, word by word, via this vocab map). */
  def encodeWords(docs: DataFrame, textCol: Column,
                  rules: Seq[MergeRule]): DataFrame = {
    var words = wordSymbols(docs, textCol)
    for (rule <- rules)
      words = words.select(col("word"),
        mergeFold(col("sym"), rule.left, rule.right).as("sym"), col("n"))
    words.withColumn("n_tokens", size(col("sym")).cast("long"))
  }

  /** Weighted adjacent-pair counts of the current symbolization
    * (overlaps count per occurrence). */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      // single-symbol words contribute no pairs; without the guard,
      // sequence(0, -1) would DESCEND and element_at(_, 0) throw
      .filter(size(col("sym")) >= 2)
      .select(explode(
        transform(sequence(lit(0), size(col("sym")) - 2),
          i => struct(element_at(col("sym"), i + 1).as("l"),
            element_at(col("sym"), i + 2).as("r")))).as("__p"), col("n"))
      .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
      .agg(sum(col("n")).cast("long").as("cnt"))

  /** Reference BPE merge apply: greedy left-to-right non-overlapping
    * pairing, as a sequential fold carrying (out, skipNext). Symbols
    * are never empty strings, so "" is a safe no-successor sentinel. */
  private def mergeFold(sym: Column, l: String, r: String): Column = {
    val zipped = transform(sequence(lit(0), size(sym) - 1), i =>
      struct(element_at(sym, i + 1).as("s"),
        when(i < size(sym) - 1, element_at(sym, i + 2))
          .otherwise(lit("")).as("nx")))
    aggregate(zipped,
      struct(array().cast("array<string>").as("out"), lit(false).as("skip")),
      (acc, x) =>
        when(acc.getField("skip"),
          struct(acc.getField("out").as("out"), lit(false).as("skip")))
        .when(x.getField("s") === l && x.getField("nx") === r,
          struct(concat(acc.getField("out"), array(lit(l + r))).as("out"),
            lit(true).as("skip")))
        .otherwise(
          struct(concat(acc.getField("out"), array(x.getField("s"))).as("out"),
            lit(false).as("skip"))),
      acc => acc.getField("out"))
  }

  /** Learn `rounds` merge rules. Each round collects ONE row (the
    * argmax pair) to the driver and rewrites the vocab table map-only.
    * Returns the rules in learned order; fewer than `rounds` if the
    * vocab runs out of pairs.
    *
    * Posture: one driver round-trip per rule is the textbook trainer
    * (the model update is inherently sequential) and is right for
    * gate-scale rule counts; at production rule counts (R ≈ 30k for a
    * real tokenizer) this exact loop is driver-latency-bound — use
    * [[trainMany]], which learns batches of provably non-interfering
    * rules per sweep and cuts the round-trips ~batch×. */
  def train(docs: DataFrame, textCol: Column, rounds: Int): Seq[MergeRule] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var words = wordSymbols(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    words.count()
    val rules = scala.collection.mutable.ArrayBuffer.empty[MergeRule]
    var exhausted = false
    for (round <- 1 to rounds if !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc).limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        rules += MergeRule(round, l, r, c)
        val next = words
          .select(mergeFold(col("sym"), l, r).as("sym"), col("n"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        next.count()
        words.unpersist(blocking = false)
        words = next
      }
    }
    words.unpersist(blocking = false)
    rules.toSeq
  }

  /** Batched-rule BPE training: each SWEEP runs ONE vocab-sized pair
    * count and learns up to `batch` rules from it, cutting the
    * driver-round-trip count (the production bottleneck of [[train]]
    * at R ≈ 30k rules) by ~batch× at the same per-sweep data cost.
    *
    * Within a sweep the selected pairs are pairwise SYMBOL-DISJOINT —
    * walking the count-ordered candidates, a pair is taken only if
    * neither its left, its right, nor its merged symbol collides with
    * any symbol already taken (or produced) this sweep. Disjoint merges
    * cannot interfere: merging (a,b) only fuses a–b boundaries, so it
    * neither changes another taken pair's occurrence count nor creates
    * or destroys occurrences of its symbols — every taken pair's
    * recorded count is still its true count when applied, in any
    * order. Pairs that DO share symbols wait for the next sweep's
    * recount, exactly as in the sequential trainer.
    *
    * With `batch = 1` the sweep selects precisely the global argmax —
    * bit-identical rules to [[train]] (BpeTrainerSpec pins this on the
    * textbook corpus). Larger batches may deviate from the sequential
    * rule ORDER beyond the first pick (a batched trainer's documented
    * trade), but every emitted rule is exact for the vocab state it was
    * counted on. */
  def trainMany(docs: DataFrame, textCol: Column, rounds: Int,
                batch: Int = 16): Seq[MergeRule] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(batch >= 1, s"batch must be >= 1, got $batch")
    var words = wordSymbols(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    words.count()
    val rules = scala.collection.mutable.ArrayBuffer.empty[MergeRule]
    var exhausted = false
    while (rules.length < rounds && !exhausted) {
      val want = math.min(batch, rounds - rules.length)
      // 4× headroom over the batch: interference needs shared symbols,
      // so few candidates fall to the disjointness walk; a shortfall
      // only means the next sweep recounts a little earlier
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(4 * want).collect()
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val picked = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        for (row <- top if picked.length < want) {
          val (l, r) = (row.getString(0), row.getString(1))
          if (!used(l) && !used(r) && !used(l + r)) {
            picked += ((l, r, row.getLong(2)))
            used ++= Seq(l, r, l + r)
          }
        }
        // top was non-empty, so the first candidate is always taken —
        // the sweep strictly progresses
        picked.foreach { case (l, r, c) =>
          rules += MergeRule(rules.length + 1, l, r, c)
        }
        val next = picked.foldLeft(words) { case (w, (l, r, _)) =>
          w.select(mergeFold(col("sym"), l, r).as("sym"), col("n"))
        }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        next.count()
        words.unpersist(blocking = false)
        words = next
      }
    }
    words.unpersist(blocking = false)
    rules.toSeq
  }

  /** The learned merge table as a DataFrame — the gate/output shape. */
  def mergesDf(spark: SparkSession, rules: Seq[MergeRule]): DataFrame = {
    import spark.implicits._
    rules.map(r => (r.round, r.left, r.right, r.count))
      .toDF("round", "left", "right", "cnt")
      .select(col("round").cast("long").as("round"),
        col("left"), col("right"), col("cnt"))
  }
}
