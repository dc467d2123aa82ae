package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `private[sql]` Spark internals needed by graft's custom
  * Catalyst expressions (Column <-> Expression, abstract type classes).
  * Kept to the absolute minimum surface.
  */
object Shims {
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType

  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame over a custom LogicalPlan (`Dataset.ofRows` is
    * private[sql]) — the entry point for graft's native operators
    * (plans.AsofJoinPlan). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** A serializable carrier for the driver's Hadoop configuration, so
    * executor-side writers (PrePartition.writeSpread) see the session's
    * `spark.hadoop.*` settings (credentials, fs impls) exactly as Spark's
    * own writers do. Wraps `private[spark]` SerializableConfiguration.
    */
  class SerializableHadoopConf(@transient conf: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private val inner = new org.apache.spark.util.SerializableConfiguration(conf)
    def value: org.apache.hadoop.conf.Configuration = inner.value
  }

  /** Apply the functions registered on a SparkSessionExtensions to a
    * registry (`registerFunctions` is private[sql]) — lets tests exercise
    * the `spark.sql.extensions` injection path without tearing down the
    * shared session.
    */
  def applyExtensionFunctions(
      ext: org.apache.spark.sql.SparkSessionExtensions,
      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry): Unit =
    ext.registerFunctions(registry)
}
