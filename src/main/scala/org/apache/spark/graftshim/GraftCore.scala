package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/**
 * Bridge into `private[spark]` SparkContext internals, same pattern as
 * [[org.apache.spark.sql.graftshim.GraftSql]]: one shim object inside the
 * org.apache.spark namespace, callers stay in `graft`.
 */
object GraftCore {
  /** Block until queued listener events have been delivered, so metric
    * snapshots taken around a job see that job's task ends (bounded wait). */
  def flushListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(10000L)
}
