package graft.text

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** Quality-classifier discrimination and model-shape properties. */
class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  test("held-out accuracy on the spam fixture beats the majority class by a wide margin") {
    val dir = "/root/testdata/sf0.001"
    val fixture = graft.queries.CorpusOps.qualityFixture(spark, dir)
    val pred = QualityClassifier.predictions(fixture)
    val joined = pred.join(fixture.select(col("doc_id"), col("label")), "doc_id")
    val n = joined.count()
    val correct = joined.filter(col("quality_pred") === col("label")).count()
    val acc = correct.toDouble / n
    info(f"held-out accuracy: $acc%.3f ($correct/$n; majority class = 0.75)")
    assert(acc >= 0.9, f"quality classifier barely beats chance: $acc%.3f")
  }

  test("the model is bucket-bounded: every feature lands in [0, NBuckets)") {
    val buckets = Seq((1L, "some sample text for hashing"))
      .toDF("doc_id", "text")
      .select(explode(QualityClassifier.featureBuckets(col("text"))).as("b"))
      .as[Long].collect()
    assert(buckets.nonEmpty &&
      buckets.forall(b => b >= 0 && b < QualityClassifier.NBuckets))
  }

  test("scoreRows is case-invariant on text whose LOWERCASE changes length ('İ')") {
    // lower('İ') = 'i̇' (TWO code points — sanity-checked below): the
    // trigrams are taken over lower(text), so n must be too, or the
    // streaming score diverges from the batch/oracle score (ADVICE r15).
    // Lowering is idempotent for the features, so scoring the raw text
    // must equal scoring the pre-lowered text EXACTLY — which fails if
    // n is taken over the un-lowered spelling.
    assert("İ".toLowerCase.length == 2)
    val docs = Seq(
      (1L, "good", "a perfectly ordinary training document"),
      (2L, "bad", "buy now buy now buy now promo"),
      (3L, "good", "İstanbul İİİ mixed-case Turkish capital dotted I"),
      (4L, "bad", "free offer promo click İİ buy"))
      .toDF("doc_id", "label", "text")
    val fitted = QualityClassifier.fit(docs)
    def scored(df: org.apache.spark.sql.DataFrame) = QualityClassifier
      .scoreRows(df, col("text"), fitted)
      .select(col("doc_id"), col("quality_pred"), col("score_fp"))
    val raw = scored(docs)
    val lowered = scored(docs.withColumn("text", lower(col("text"))))
    val diverged = raw.exceptAll(lowered).unionByName(lowered.exceptAll(raw))
    assert(diverged.isEmpty, s"case-variant scores: ${diverged.take(4).toSeq}")
  }

  test("short texts (< 3 chars) contribute no features and never break the fit") {
    val docs = Seq(
      (1L, "good", "a"), (2L, "good", ""), (3L, "bad", "xy"),
      (4L, "good", "long enough to have trigrams"),
      (5L, "bad", "spam spam spam spam"),
      (10L, "good", "another training document here"),
      (15L, "bad", "buy now buy now buy now"))
      .toDF("doc_id", "label", "text")
    // must not throw; scores exist for every held-out doc
    val out = QualityClassifier.predictions(docs)
    assert(out.columns.toSeq ==
      Seq("doc_id", "quality_pred", "score_fp"))
    assert(out.count() >= 0)
  }
}
