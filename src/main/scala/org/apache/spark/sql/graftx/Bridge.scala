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

  /** Free the storage blocks behind a `localCheckpoint()`ed DataFrame.
    * `DataFrame.unpersist` goes through the CacheManager and never touches
    * checkpoint block storage, so iterative operators (connected
    * components, PageRank) would otherwise pin every superseded round's
    * blocks until the context cleaner happens to run — measured as GC
    * thrash on long multi-query sessions. Safe once nothing will read the
    * checkpoint again (lineage is truncated; recompute is impossible). */
  def freeCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Unload every state-store provider a terminated StreamingQuery left
    * loaded (each holds all retained versions' state maps in memory until
    * the maintenance thread gets to it — dead weight in a long-lived JVM
    * once the query's sink has been consumed). The registry is
    * `private[sql]`; providers reload lazily if a store is needed again. */
  def unloadStreamState(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()

  /** Register a SQL function into an existing session's registry (the
    * registry API is private[sql]; production deployments use
    * spark.sql.extensions=graft.GraftExtensions instead). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
