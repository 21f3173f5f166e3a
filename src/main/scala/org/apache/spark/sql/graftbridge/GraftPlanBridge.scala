package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The project's single privileged seam into `private[sql]` Spark:
  * wrapping a custom resolved `LogicalPlan` back into a `DataFrame`.
  *
  * Spark exposes extension points for *rules*, *strategies*, and
  * *functions* (SparkSessionExtensions — how GraftExtensions injects
  * everything else) but no public constructor from a LogicalPlan to a
  * DataFrame, so every OSS engine that adds whole operators (Delta,
  * Sedona, Iceberg's Spark runtime) hosts exactly this shim inside an
  * `org.apache.spark.sql.*` subpackage. Kept to the two one-line calls
  * custom operators need; everything else in graft.* uses public API.
  */
object GraftPlanBridge {

  /** DataFrame over a (resolved) logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (stable attribute ids —
    * the form custom operators compose over). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
}
