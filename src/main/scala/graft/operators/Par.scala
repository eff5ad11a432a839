package graft.operators

/** Overlap independent Spark action chains from plain driver threads
  * (the guide's §2.6 move, operator-side): maintenance passes over
  * DISJOINT substores (an index's keys/ and sets/, a layout's vectors/
  * and graph/) serialize for no reason otherwise — the FIFO scheduler
  * back-fills each chain's stragglers with the other's tasks. Plain
  * threads, not a shared pool, so nested use from a pooled gate thread
  * cannot deadlock.
  */
private[graft] object Par {
  def run2(a: () => Unit, b: () => Unit): Unit = {
    @volatile var err: Throwable = null
    val t = new Thread(() => {
      try b() catch { case e: Throwable => err = e }
    }, "graft-op-par")
    t.setDaemon(true)
    t.start()
    val errA = try { a(); null } catch { case e: Throwable => e }
    t.join()
    if (errA != null) throw errA
    if (err != null) throw err
  }
}
