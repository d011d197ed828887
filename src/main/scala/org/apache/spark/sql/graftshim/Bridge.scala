package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made these conversions private[sql]
  * (org.apache.spark.sql.classic.ExpressionUtils); this shim re-exports the
  * two methods needed to expose custom Catalyst expressions as Columns. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Block until the async listener bus has delivered all queued events
    * (private[spark] LiveListenerBus.waitUntilEmpty) — task-metrics
    * accumulation reads exact per-run deltas, and a poll-until-stable
    * heuristic can snapshot early under driver GC pauses. Returns false on
    * timeout instead of throwing. */
  def drainListenerBus(sc: org.apache.spark.SparkContext, timeoutMs: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
