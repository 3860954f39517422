package org.apache.spark

/** Accessor for the `protected[spark]` `TaskContext.setTaskContext`, needed
  * by graft's ProcessUdf helper threads: the stdin-writer thread drains the
  * upstream partition iterator, and any lazily-consuming operator in that
  * chain may call `TaskContext.get()` (shuffle readers, memory-acquiring
  * operators, user `mapPartitions` code). Spark's own `PipedRDD` propagates
  * the context into its stdin-writer thread the same way; the setter just
  * isn't public, so this one-liner lives in the spark package namespace —
  * the established pattern for ecosystem libraries needing spark-private
  * surface.
  */
object GraftTaskContextBridge {
  def set(ctx: TaskContext): Unit = TaskContext.setTaskContext(ctx)
}
