package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — declarative row-level rules audited in
  * ONE pass and enforceable as a quarantine split (the dbt-test /
  * Great-Expectations pattern, as an engine operator: ingest gates,
  * contract checks between pipeline stages).
  *
  * Scale design: `audit` evaluates every rule as a conditional-count
  * aggregate in a single scan (one global aggregate, no per-rule jobs);
  * `quarantine` tags rows with their violated rule names map-only and
  * splits by emptiness of the tag array. Referential rules (key exists
  * in a dimension) compose upstream as a broadcast anti-join producing
  * a boolean column — the rule itself stays row-local.
  */
object Expectations {

  /** A named expectation: rows are EXPECTED to satisfy `pred`; null
    * predicate results count as violations (SQL three-valued logic
    * would otherwise leak nulls through a NOT). Names must be plain
    * identifiers — they are spliced into a `stack` expression by
    * [[audit]], so a free-form string would break (or inject into)
    * the generated SQL. */
  final case class Rule(name: String, pred: Column) {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"rule name must be a bare identifier, got '$name'")
  }

  private def violated(r: Rule): Column = !coalesce(r.pred, lit(false))

  /** One row per rule: violations and total (single-scan audit). */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    require(rules.map(_.name).distinct.length == rules.length,
      s"duplicate rule names: ${rules.map(_.name).diff(rules.map(_.name).distinct).distinct.mkString(", ")}")
    // single aggregation row: total + one conditional count per rule
    val aggCols = count(lit(1)).as("n_rows") +:
      rules.map(r => count(when(violated(r), 1)).as(s"v_${r.name}"))
    val row = df.agg(aggCols.head, aggCols.tail: _*)
    // unpivot to (rule, n_violations, n_rows) — stack is codegen'd
    val stackArgs = rules.map(r => s"'${r.name}', v_${r.name}").mkString(", ")
    row.select(
      expr(s"stack(${rules.length}, $stackArgs) AS (rule, n_violations)"),
      col("n_rows"))
      .select(col("rule"), col("n_violations"), col("n_rows"))
  }

  /** Rows annotated with the sorted names of the rules they violate
    * (empty array = clean). Map-only. */
  def annotate(df: DataFrame, rules: Seq[Rule],
               out: String = "violations"): DataFrame = {
    require(rules.nonEmpty, "no rules")
    df.withColumn(out, array_sort(filter(
      array(rules.map(r => when(violated(r), lit(r.name))): _*),
      v => v.isNotNull)))
  }

  /** (clean, quarantined) split — quarantined rows keep the violation
    * tags for triage. */
  def quarantine(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val tagged = annotate(df, rules)
    (tagged.filter(size(col("violations")) === 0).drop("violations"),
      tagged.filter(size(col("violations")) > 0))
  }
}
