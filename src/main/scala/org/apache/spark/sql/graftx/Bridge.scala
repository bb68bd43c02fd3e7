package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(Expression)` constructor; the
  * supported conversion lives behind `private[sql]`. This bridge (our code,
  * merely compiled into an org.apache.spark.sql subpackage) exposes the two
  * conversions the graft library needs to register custom Catalyst
  * expressions as user-facing Columns. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a SQL function into an existing session's registry (the
    * registry API is private[sql]; production deployments use
    * spark.sql.extensions=graft.GraftExtensions instead). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
