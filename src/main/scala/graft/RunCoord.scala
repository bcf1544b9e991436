package graft

/** Cross-process coordination for timing-sensitive runs.
  *
  * Round 18 shipped four bench flags whose cause — the artifact refresh
  * and the driver bench overlapping on one machine — had to be INFERRED
  * from adjudication evidence. This makes it mechanical:
  *
  *  - JVM MARKERS: every graft main registers `/tmp/graft_jvm_<pid>`;
  *    [[otherGraftJvms]] counts live peers, and the bench artifacts stamp
  *    the count, so contamination is a machine-readable field instead of
  *    a forensic conclusion.
  *  - BENCH LOCK: `/tmp/graft_bench.lock`, an OS file lock held for the
  *    whole timed sweep. Concurrent benches (driver bench vs a refresh's
  *    bench/slope phases) SERIALIZE instead of corrupting each other's
  *    timings, and a lock holder that dies releases it automatically —
  *    no stale-lockfile failure mode. Acquisition is bounded: after
  *    `maxWaitS` the bench proceeds anyway (a bench that never runs is
  *    worse than a contaminated one) and says so in the artifact.
  */
object RunCoord {

  private val markerDir = java.nio.file.Paths.get("/tmp")

  private def pid: Long = ProcessHandle.current().pid()

  /** Register this JVM's marker (idempotent; cleaned by shutdown hook —
    * and a dead JVM's leftover marker is ignored by the liveness check). */
  def registerJvm(): Unit = {
    val m = markerDir.resolve(s"graft_jvm_$pid")
    try {
      java.nio.file.Files.write(m, Array.emptyByteArray)
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try java.nio.file.Files.deleteIfExists(m) catch { case _: Exception => () }))
    } catch { case _: Exception => () }
  }

  /** Live graft JVMs other than this one (marker present AND /proc alive;
    * dead markers are swept so the count self-heals). */
  def otherGraftJvms(): Int = {
    try {
      val s = java.nio.file.Files.list(markerDir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.count { p =>
          val n = p.getFileName.toString
          if (!n.startsWith("graft_jvm_")) false
          else n.stripPrefix("graft_jvm_").toLongOption match {
            case Some(other) if other == pid => false
            case Some(other) =>
              val alive = java.nio.file.Files.exists(
                java.nio.file.Paths.get(s"/proc/$other"))
              if (!alive)
                try java.nio.file.Files.deleteIfExists(p)
                catch { case _: Exception => () }
              alive
            case None => false
          }
        }
      } finally s.close()
    } catch { case _: Exception => 0 }
  }

  /** Blocking-with-timeout acquisition of the machine-wide bench lock.
    * Returns (lock handle or null, seconds waited). The caller keeps the
    * returned objects alive for the duration of the timed run and calls
    * [[releaseBenchLock]] after; a null handle means the wait timed out
    * and the run proceeded unserialized (stamp it in the artifact). */
  def acquireBenchLock(maxWaitS: Int): (AutoCloseable, Double) = {
    val t0 = System.nanoTime()
    try {
      val ch = java.nio.channels.FileChannel.open(
        markerDir.resolve("graft_bench.lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      var lock: java.nio.channels.FileLock = null
      while (lock == null && (System.nanoTime() - t0) / 1e9 < maxWaitS) {
        lock = ch.tryLock()
        if (lock == null) Thread.sleep(2000)
      }
      val waited = (System.nanoTime() - t0) / 1e9
      if (lock == null) { ch.close(); (null, waited) }
      else {
        val l = lock
        val closer: AutoCloseable = () => { try l.release() finally ch.close() }
        (closer, waited)
      }
    } catch {
      case _: Exception => (null, (System.nanoTime() - t0) / 1e9)
    }
  }

  def releaseBenchLock(handle: AutoCloseable): Unit =
    if (handle != null) { try handle.close() catch { case _: Exception => () } }
}
