/** Lives in the `org.apache.spark` package space on purpose:
  * `SparkContext.listenerBus` is `private[spark]`, and draining it is
  * the only way to read listener-accumulated metrics race-free (events
  * are delivered asynchronously on the bus thread). Access shim only —
  * no graft logic here.
  */
package org.apache.spark.graftshim

import org.apache.spark.SparkContext

object ListenerShim {

  /** Block until every queued listener event has been delivered, so a
    * metric accumulated by a SparkListener reflects all completed
    * stages of the jobs run so far. */
  def drain(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
