package graft.oma

/** Ordered parallel map on a dedicated bounded pool for the driver-side
  * ingest fan-outs (O5M reset segments, PBF blobs).
  *
  * Deliberately NOT `ExecutionContext.Implicits.global`: the decoders are
  * reachable from executor-side code (OsmSource.read inside a task), and
  * unbounded `Await.result(..., Inf)` on the shared global pool from many
  * tasks at once risks thread starvation. A fresh fixed pool per call is
  * cheap at ingest granularity (one call per file), bounded by the host
  * core count, and torn down deterministically.
  */
private[oma] object ParallelIngest {

  def map[A, B](xs: Seq[A])(f: A => B): Seq[B] = {
    if (xs.size <= 1) return xs.map(f)
    val n = math.max(1, math.min(xs.size, Runtime.getRuntime.availableProcessors()))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      val futures = xs.map { x =>
        pool.submit(new java.util.concurrent.Callable[B] { def call(): B = f(x) })
      }
      futures.map { fut =>
        try fut.get()
        catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
      }
    } finally pool.shutdown()
  }
}
