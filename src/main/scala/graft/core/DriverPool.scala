package graft.core

/** Bounded driver-side parallel map — the metadata-sweep idiom shared
  * by MergeTree planning (per-part metadata), the projection staleness
  * gate (file stats under the distributed threshold), and footer
  * sweeps: many small independent IO calls that a Spark job would
  * over-pay for. One copy, so pool sizing / error unwrapping are fixed
  * in one place. Exceptions from `f` propagate to the caller (wrapped
  * ExecutionException unwrapped to the cause). */
object DriverPool {
  def map[A, B](items: Seq[A], maxThreads: Int = 16)(f: A => B): Seq[B] = {
    if (items.isEmpty) return Nil
    if (items.size == 1) return Seq(f(items.head))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(items.size, math.max(maxThreads, 1)))
    try {
      import scala.jdk.CollectionConverters._
      pool.invokeAll(items.map { a =>
        new java.util.concurrent.Callable[B] { override def call(): B = f(a) }
      }.asJava).asScala.map { fut =>
        try fut.get()
        catch {
          case e: java.util.concurrent.ExecutionException if e.getCause != null =>
            throw e.getCause
        }
      }.toSeq
    } finally pool.shutdown()
  }
}
