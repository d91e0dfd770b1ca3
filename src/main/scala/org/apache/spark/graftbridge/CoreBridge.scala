package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Forwarding shim for `private[spark]` SparkContext internals (same
  * technique as [[org.apache.spark.sql.graftbridge.Bridge]] on the SQL
  * side). One method: drain the async listener bus, so a metrics listener
  * registered around a measured operation has seen every task-end event
  * BEFORE its counters are read — without it, shuffle tallies undercount by
  * whatever the bus hadn't dispatched yet.
  */
object CoreBridge {
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
