package graft

import java.util.concurrent.{Callable, Executors, TimeUnit}

/** Concurrent driver-side actions (optimization guide §2.6 "Overlap
  * independent jobs"): Spark's scheduler happily runs several jobs at
  * once inside one application — store lifecycles are only sequential
  * because the driver calls their actions sequentially. Submitting the
  * INDEPENDENT writes of a lifecycle (cells ∥ codebook ∥ locator;
  * probe ∥ append) from a small thread pool lets the next job's tasks
  * back-fill executors freed by the current job's tail, and at bench
  * scale removes the per-job driver sequencing gaps that dominate the
  * store keys' wall (r14 JobAudit: ann_ivf_store 45 jobs, wall ≈
  * jobs × scheduler overhead).
  *
  * Contract: tasks must be mutually independent (no ordering between
  * them is preserved) and everything they need must be resolved BEFORE
  * the call (store paths, manifests). FIFO scheduling keeps the earlier
  * task's resource priority — exactly the back-fill behaviour wanted.
  * Failures propagate: the first task exception rethrows after all
  * tasks have settled (no half-abandoned writes running beyond the
  * call).
  */
object Par {

  /** Runs the thunks concurrently on a fresh bounded pool (2-3 in
    * flight is plenty per §2.6); returns their results in order.
    */
  def run[T](tasks: Seq[() => T]): Seq[T] = {
    if (tasks.sizeIs <= 1) return tasks.map(_())
    val pool = Executors.newFixedThreadPool(math.min(tasks.size, 3))
    try {
      val futures = tasks.map(t => pool.submit(new Callable[T] {
        override def call(): T = t()
      }))
      // gather ALL outcomes before throwing: a failed sibling must not
      // leave another task's write racing past the caller's control flow
      val outcomes = futures.map(f =>
        try Right(f.get()) catch { case e: Throwable => Left(e) })
      outcomes.collectFirst { case Left(e) =>
        throw (e match {
          case ee: java.util.concurrent.ExecutionException
            if ee.getCause != null => ee.getCause
          case other => other
        })
      }
      outcomes.collect { case Right(v) => v }
    } finally {
      pool.shutdown()
      pool.awaitTermination(10, TimeUnit.SECONDS); ()
    }
  }

  /** Two independent actions, with typed results. */
  def run2[A, B](a: () => A, b: () => B): (A, B) = {
    val rs = run[Any](Seq(() => a(), () => b()))
    (rs(0).asInstanceOf[A], rs(1).asInstanceOf[B])
  }
}
