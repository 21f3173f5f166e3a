package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for great-circle distance (haversine,
  * R = 6371000 m — the reference's constant, etl-olho-vivo-velocidades-
  * medias.py:34–58).
  *
  * The composed-builtin form (Portable.haversineMeters) already lives in
  * whole-stage codegen; this expression exists for (a) ergonomics — one
  * SQL-callable `haversine_m(lat1, lon1, lat2, lon2)` — and (b) tighter
  * generated code: a single static-method call instead of a ~20-node
  * expression tree, with one fused doGenCode. Numerically identical to
  * the composed form (same operation order).
  */
case class Haversine(first: Expression, second: Expression,
                     third: Expression, fourth: Expression)
  extends QuaternaryExpression with ImplicitCastInputTypes with Serializable {

  override def inputTypes: Seq[DataType] =
    Seq(DoubleType, DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "haversine_m"

  override def nullSafeEval(lat1: Any, lon1: Any, lat2: Any, lon2: Any): Any =
    Haversine.compute(
      lat1.asInstanceOf[Double], lon1.asInstanceOf[Double],
      lat2.asInstanceOf[Double], lon2.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lat1, lon1, lat2, lon2) =>
      s"graft.functions.Haversine.compute($lat1, $lon1, $lat2, $lon2)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object Haversine {
  /** Same operation order as Portable.haversineMeters — bit-identical
    * results between the expression and the composed form. */
  def compute(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dlat = math.toRadians(lat2 - lat1)
    val dlon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dlat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dlon / 2), 2)
    2.0 * 6371000.0 * math.atan2(math.sqrt(a), math.sqrt(1.0 - a))
  }

  /** Column-API entry point. Requires GraftExtensions registration on
    * the session (Column construction from a raw Expression is sealed
    * private[sql] in Spark 4; the registry + call_function route is the
    * public path for extension functions). */
  def haversineM(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    org.apache.spark.sql.functions.call_function("haversine_m", lat1, lon1, lat2, lon2)
}

/** Session extensions: registers `haversine_m` for SQL use. Install via
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`; or call
  * GraftExtensions.register(spark) on a live session. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftExtensions.allDescriptors.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.HaversineBoundingBox)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private[functions] val haversineDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("haversine_m"),
    new ExpressionInfo(classOf[Haversine].getName, "haversine_m"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 4, "haversine_m(lat1, lon1, lat2, lon2)")
      Haversine(exprs(0), exprs(1), exprs(2), exprs(3))
    })

  private[functions] val dotProductDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "dot_product(vec_a, vec_b)")
      DotProduct(exprs(0), exprs(1))
    })

  /** Second argument must be a foldable integral literal (the widths
    * fix the generated code shape, so they cannot be data-dependent). */
  private def litInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval(null) match {
      case i: Int  => i
      case l: Long => l.toInt
      case other   => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
  }

  private[functions] val minhashSigDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinhashSignature].getName, "minhash_sig"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "minhash_sig(hashes, k)")
      MinhashSignature(exprs(0), litInt(exprs(1), "k"))
    })

  private[functions] val simhashDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash64"),
    new ExpressionInfo(classOf[Simhash].getName, "simhash64"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "simhash64(token_hashes, bits)")
      Simhash(exprs(0), litInt(exprs(1), "bits"))
    })

  /** Spark's own runtime-filter expressions, surfaced as callable
    * functions (they are registry-internal upstream — only the
    * InjectRuntimeFilter rule plants them). Callers pass xxhash64(key)
    * as the hashed child, mirroring the upstream rule. */
  private[functions] val bloomAggDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_filter_agg"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
      "bloom_filter_agg"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 3,
        "bloom_filter_agg(xxhash64(key), est_items, num_bits)")
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        exprs(0), exprs(1), exprs(2))
    })

  private[functions] val bloomMightContainDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("might_contain"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
      "might_contain"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "might_contain(bloom, xxhash64(key))")
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        exprs(0), exprs(1))
    })

  private[functions] val quantileRankDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("quantile_rank"),
    new ExpressionInfo(classOf[QuantileRank].getName, "quantile_rank"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "quantile_rank(value, boundaries)")
      QuantileRank(exprs(0), exprs(1))
    })

  private[functions] val winnowDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("winnow_fp"),
    new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fp"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 3, "winnow_fp(text, k, w)")
      WinnowFingerprints(exprs(0), litInt(exprs(1), "k"), litInt(exprs(2), "w"))
    })

  private[functions] val tokenNgramsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("token_ngrams"),
    new ExpressionInfo(classOf[TokenNgrams].getName, "token_ngrams"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "token_ngrams(text, n)")
      TokenNgrams(exprs(0), litInt(exprs(1), "n"))
    })

  private[functions] val nearestCidDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nearest_cid"),
    new ExpressionInfo(classOf[NearestCentroid].getName, "nearest_cid"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "nearest_cid(vec, centroids)")
      NearestCentroid(exprs(0), exprs(1))
    })

  private[functions] val nearestCidsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nearest_cids"),
    new ExpressionInfo(classOf[NearestCentroids].getName, "nearest_cids"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 3, "nearest_cids(vec, centroids, n)")
      NearestCentroids(exprs(0), exprs(1), litInt(exprs(2), "n"))
    })

  private[functions] val fxRoundDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("fx_round"),
    new ExpressionInfo(classOf[FxRound].getName, "fx_round"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "fx_round(x, digits)")
      FxRound(exprs(0), litInt(exprs(1), "digits"))
    })

  /** Every extension function — ONE list consumed by BOTH install
    * paths (`.withExtensions` injection and live-session register()),
    * so a new descriptor can't be present on one and missing on the
    * other. */
  private[functions] val idnAsciiDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("idn_ascii"),
    new ExpressionInfo(classOf[IdnAscii].getName, "idn_ascii"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "idn_ascii(host)")
      IdnAscii(exprs(0))
    })

  private[functions] val nfkcDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nfkc"),
    new ExpressionInfo(classOf[Nfkc].getName, "nfkc"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "nfkc(text)")
      Nfkc(exprs(0))
    })

  private[functions] val uchrDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("uchr"),
    new ExpressionInfo(classOf[Uchr].getName, "uchr"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "uchr(codepoint)")
      Uchr(exprs(0))
    })

  private[functions] val htmlEntityDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("html_entity"),
    new ExpressionInfo(classOf[HtmlEntity].getName, "html_entity"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "html_entity(name)")
      HtmlEntity(exprs(0))
    })

  private[functions] val allDescriptors = Seq(
    haversineDescriptor, dotProductDescriptor,
    minhashSigDescriptor, simhashDescriptor,
    bloomAggDescriptor, bloomMightContainDescriptor,
    quantileRankDescriptor, winnowDescriptor, tokenNgramsDescriptor,
    nearestCidDescriptor, nearestCidsDescriptor, fxRoundDescriptor,
    idnAsciiDescriptor, nfkcDescriptor, uchrDescriptor,
    htmlEntityDescriptor)
  private def all = allDescriptors

  /** Register on an already-built session (tests, driver sessions):
    * functions via the registry, the as-of planner strategy via
    * `spark.experimental.extraStrategies`, and the bounding-box
    * optimizer rule via `spark.experimental.extraOptimizations` — the
    * two mutable public seams that work post-construction, so a session
    * built WITHOUT `.withExtensions(new GraftExtensions)` still plans
    * AsOfJoinNode and rewrites haversine range predicates. Idempotent. */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        ident.funcName, builder, "built-in")
    }
    // idempotent against BOTH install paths: skip when the strategy/rule
    // already arrived via .withExtensions (visible in the session's
    // planner/optimizer), not just via a previous register() call —
    // otherwise a GraftSession (withExtensions + register) would run
    // each of them twice per query
    val exp = spark.experimental
    if (!spark.sessionState.planner.strategies.contains(graft.plans.AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ graft.plans.AsOfJoinStrategy
    val ruleInstalled =
      exp.extraOptimizations.contains(graft.plans.HaversineBoundingBox) ||
        spark.sessionState.optimizer.extendedOperatorOptimizationRules
          .contains(graft.plans.HaversineBoundingBox)
    if (!ruleInstalled)
      exp.extraOptimizations = exp.extraOptimizations :+ graft.plans.HaversineBoundingBox
  }
}
