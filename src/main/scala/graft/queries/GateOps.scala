package graft.queries

import org.apache.spark.sql.{Column, DataFrame}

/** Execution-shape helpers for the multi-action referee gates.
  *
  * The lifecycle/referee gates are job-count dominated: tens of
  * sub-second Spark actions issued one at a time from the driver, on a
  * box whose cores sit idle between them (q386 ran 88 sequential jobs).
  * Two shape fixes, neither of which changes what any gate computes:
  *
  *  - `sentinel` replaces the eager `probe.limit(1).count() > 0` +
  *    `range(1).filter(lit(flag))` referee idiom with a LAZY one-row
  *    relation that only fires when the probe is non-empty. The probe
  *    stops being its own driver-blocking action and becomes a branch
  *    of the final job's plan, where it runs in parallel with the
  *    other branches. Only safe when everything the probe reads is
  *    final at assembly time: state no later lifecycle verb mutates,
  *    or an already-materialized (checkpointed) relation.
  *
  *  - `par` overlaps INDEPENDENT action chains (layout builds, brute
  *    force referees) from driver threads — the guide's §2.6 move:
  *    Spark's FIFO scheduler back-fills executors freed by one chain's
  *    stragglers with the next chain's tasks. Chains must not depend
  *    on each other's side effects; session-conf flips do not belong
  *    inside `par` (the conf is session-global, not thread-local).
  */
private[queries] object GateOps {

  /** One row of `cols` iff `probe` has at least one row — the lazy
    * twin of `spark.range(1).filter(lit(probe.limit(1).count() > 0))`.
    * An OR of several probes is `sentinel(a.unionAll(b), ...)` (fires
    * once, like the boolean it replaces).
    */
  def sentinel(probe: DataFrame, cols: Column*): DataFrame =
    probe.limit(1).select(cols: _*)

  /** A bounded pool for overlapping gate chains: enough threads to
    * fill the scheduler's gaps, few enough that chains don't thrash
    * the driver. Threads are daemons — a gate failure must not pin
    * the JVM.
    */
  private lazy val pool = java.util.concurrent.Executors.newFixedThreadPool(
    4,
    (r: Runnable) => {
      val t = new Thread(r, "graft-gate-par")
      t.setDaemon(true)
      t
    })

  /** Run the thunks concurrently, return their results in order.
    * Failures propagate (first one wins) exactly as they would have
    * sequentially.
    */
  def par[A](thunks: (() => A)*): Seq[A] = {
    import scala.jdk.CollectionConverters._
    val futures = thunks.map(t =>
      pool.submit(new java.util.concurrent.Callable[A] {
        def call(): A = t()
      }))
    try futures.map(_.get())
    catch {
      case e: java.util.concurrent.ExecutionException =>
        futures.foreach(_.cancel(true))
        throw e.getCause
    }
  }

  /** Two-chain convenience with distinct result types. */
  def par2[A, B](a: () => A, b: () => B): (A, B) = {
    val r = par[Any](() => a(), () => b())
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }

  /** Three-chain convenience. */
  def par3[A, B, C](a: () => A, b: () => B, c: () => C): (A, B, C) = {
    val r = par[Any](() => a(), () => b(), () => c())
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B], r(2).asInstanceOf[C])
  }
}
