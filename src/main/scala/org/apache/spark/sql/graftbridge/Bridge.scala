package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇔ catalyst Expression bridge. Spark 4's Column wraps a
  * connect-agnostic ColumnNode; the conversion helpers live in
  * `org.apache.spark.sql.classic` with `private[sql]` visibility, so
  * extension expressions (graft.functions.CosineSimilarity) reach them
  * through this in-package shim — the standard pattern for Catalyst
  * extension libraries. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** DataFrame from a raw LogicalPlan (classic Dataset.ofRows is
    * private[sql]). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Release the block-manager storage behind a (local)checkpointed
    * DataFrame. `Dataset.unpersist` only uncaches CacheManager entries;
    * a checkpoint's blocks were persisted at the RDD level inside
    * `RDD.localCheckpoint` and are invisible to it — without this, every
    * iteration's checkpoint lives until the driver GCs the orphaned RDD
    * and the ContextCleaner gets around to it. No-op for plans that are
    * not checkpoint-backed. */
  def releaseCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }

  /** Install an extra planner strategy on a live session (idempotent). */
  def addStrategy(spark: org.apache.spark.sql.SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }
}
