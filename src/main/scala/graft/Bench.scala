package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Benchmark entrypoint (driver contract): times every gate query at the
  * given scale-factor directory and prints ONE JSON line.
  *
  * Each query is executed TWICE in the same session and the reported
  * number is the WARM (second) run: a single cold run per JVM carries
  * multi-second JIT/codegen/shuffle-warmup noise that has produced 3-5×
  * round-over-round swings on queries whose code did not change. The cold
  * timings are still emitted (`cold` object) so startup-sensitive
  * regressions remain visible.
  *
  * Execution is a write to Spark's built-in `noop` sink, NOT `.count()`:
  * under a count Catalyst prunes every projection and eliminates sorts, so
  * map-only queries (scalar funcs, text stats, lang-id, simhash) would be
  * benchmarked as little more than a parquet row count. The noop sink runs
  * the full physical plan — every column computed, every sort executed —
  * and discards the rows, which is the honest per-query cost.
  *
  * `materializes` lists the queries whose COLD run built at least one
  * MaterializeOnce side table (shingle/trigram/centroid relations): their
  * cold number includes a one-time index build that warm runs (and any
  * same-corpus consumer afterwards) do not pay.
  *
  * Failure policy: a query that throws is reported in a `failed` array and
  * contributes nothing to `queries`/`value` — a crashing query must never
  * masquerade as a fast one.
  *
  * REGRESSION GUARD: when a committed per-query baseline exists
  * (`BENCH_BASELINE_PERQ.json`, a flat {query: warmSeconds} object; path
  * overridable via SPARK_GRAFT_BENCH_BASELINE), the output carries a
  * `ratio` object (warm / baseline per query) and a `regressed` array of
  * queries whose warm run exceeded 2× its baseline AND ran at least
  * [[AbsFloorSeconds]] over it. This exists because a 3.9× warm regression
  * on one query once shipped inside a round whose TOTAL improved — totals
  * hide per-query cliffs; the guard makes every per-query regression a
  * named artifact the next round must adjudicate. The absolute floor
  * exists because sub-second queries carry ±0.5 s GC/run-order jitter in
  * the 54-query bench JVM (round 9: q12 flagged at 2.86× whose isolated
  * profile was a flat 0.45 s warm / constant 5 jobs) — ratio-only
  * flagging turns that jitter into false alarms, while every real flag so
  * far (q18's +4.4 s) clears the floor easily. Queries absent from the
  * baseline (new gates) are listed in `unbaselined`, not silently
  * ungoverned.
  *
  * AUTO-ADJUDICATION: every `regressed` flag so far (q18 r8, q12 r9,
  * q44 r9, q53 r10) was resolved by the same manual step — an isolated
  * [[BenchOne]]-style re-profile showing constant job counts and a flat
  * warm time, i.e. bench-JVM context rather than a plan change. Round 10
  * skipped the manual step and left its flag open, so the re-profile now
  * runs automatically: after the sweep, each query whose ratio exceeds the
  * factor — REGARDLESS of the absolute floor, so even a floor-exempt
  * sub-second 2×+ entry ships with its own evidence — is profiled
  * [[AdjudicationRuns]] times in the (now otherwise quiescent) JVM with a
  * job-count listener, and the artifact embeds the evidence under
  * `adjudication: {query: {times, jobs, warm, verdict}}`. `warm` is the
  * median of the post-warmup runs; `verdict` is "environmental" when the
  * job count is constant and the re-profiled warm would NOT itself trip
  * the guard, "confirmed" otherwise. A confirmed verdict still demands a
  * human-written BASELINE_NOTES.md entry — the hook gathers the evidence a
  * do-nothing round used to leave ungathered; it does not bless anything.
  *
  * ARTIFACT FILE: the full JSON line is also written to
  * SPARK_GRAFT_BENCH_OUT (default `BENCH_LOCAL_LAST.json`) — the driver's
  * stdout-tail capture truncates on long lines (round 10 recorded
  * `"parsed": null`), so the complete warm/cold/ratio/adjudication maps
  * must exist as a file the round can commit.
  */
object Bench {

  val RegressionFactor = 2.0
  val AbsFloorSeconds = 0.75
  val AdjudicationRuns = 8

  /** ERA CANARIES: stable, trivial, plan-pinned queries whose blessed-vs-
    * measured ratio estimates the MACHINE ERA of the run (container CPU
    * contention, thermal state — r16's loop ran 1.35× slower than r15's
    * machine-wide with zero shared-path code change, median per-query
    * 1.39×, and produced seven raw flags per artifact with DISJOINT
    * membership across two loops). The era divides into every ratio
    * before flagging (`ratio_norm`, `regressed`); raw ratios stay in the
    * artifact so a canary's own regression — or a genuine shared-path
    * slowdown, which hits canaries and non-canaries alike and shows as
    * era drift rather than per-query flags — remains visible. The era is
    * clamped to [0.5, 3]: a wilder swing is not an era, it is an incident
    * that needs its own adjudication. */
  val CanaryQueries: Seq[String] = Seq(
    "q09_topk", "q12_cond_buckets", "q19_null_handling",
    "q26_contains", "q27_first_match")

  /** UNCLAMPED median blessed-vs-measured ratio over the canaries present
    * in both maps; 1.0 when no canary has a baseline (spec runs, first
    * round). Exposed separately so the artifact can machine-flag "raw era
    * at/past a clamp bound" — which is an incident, not an era. */
  def eraRawOf(warm: scala.collection.Map[String, Double],
               baseline: Map[String, Double]): Double = {
    val rs = CanaryQueries.flatMap(q =>
      for { w <- warm.get(q); b <- baseline.get(q) } yield w / b).sorted
    if (rs.isEmpty) 1.0 else rs(rs.length / 2)
  }

  /** [[eraRawOf]] clamped to [0.5, 3] — the value that divides into every
    * ratio before flagging. */
  def eraOf(warm: scala.collection.Map[String, Double],
            baseline: Map[String, Double]): Double =
    math.min(3.0, math.max(0.5, eraRawOf(warm, baseline)))

  /** ERA ALARM (the canary-regression failure mode): normalization absorbs
    * anything that slows canaries and non-canaries alike, so a genuine
    * shared-path regression — a scan/shuffle/codegen change — could ride
    * era to zero flags. These are the two incident rules BASELINE_NOTES.md
    * declares, machine-checked: a raw era at/past a clamp bound, or an era
    * outside [0.8, 1.3], demands an explicit `machine-era:` adjudication
    * entry in the notes (BaselineNotesSpec enforces the entry for the
    * committed loop artifact). Returns null (JSON) when the era is
    * unremarkable. */
  val EraNotesBand: (Double, Double) = (0.8, 1.3)
  def eraWarnOf(eraRaw: Double, hasBaseline: Boolean): Option[String] =
    if (!hasBaseline) None
    else if (eraRaw <= 0.5 || eraRaw >= 3.0) Some("era_at_clamp_bound")
    else if (eraRaw < EraNotesBand._1 || eraRaw > EraNotesBand._2)
      Some("era_outside_notes_band")
    else None

  /** Flat {name: seconds} baseline, absent → empty. Jackson is already on
    * Spark's classpath; no extra dependency. */
  def loadBaseline(path: String): Map[String, Double] = {
    val f = new java.io.File(path)
    if (!f.exists()) Map.empty
    else {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = om.readTree(f)
      import scala.jdk.CollectionConverters._
      node.fields().asScala
        .filter(_.getValue.isNumber)
        .map(e => e.getKey -> e.getValue.asDouble()).toMap
    }
  }

  /** Runs `exec` `runs` times, recording per-run wall seconds and Spark
    * job counts (listener-based; the async listener bus is given a moment
    * to drain before each count is read). Shared by [[BenchOne]] (manual
    * isolated profiling) and the auto-adjudication pass. */
  def profile(spark: SparkSession, exec: () => Unit, runs: Int)
      : (Seq[Double], Seq[Int]) = {
    val jobs = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val times = scala.collection.mutable.ListBuffer[Double]()
      val jobCounts = scala.collection.mutable.ListBuffer[Int]()
      (1 to runs).foreach { _ =>
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        exec()
        times += (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // listener bus is async; let job-starts drain
        jobCounts += jobs.get() - j0
      }
      (times.toSeq, jobCounts.toSeq)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  /** Median of the post-warmup portion of a profile (first quarter of the
    * runs, minimum 1, dropped as JIT/cache warmup). */
  def profiledWarm(times: Seq[Double]): Double = {
    val warmRuns = times.drop(math.max(1, times.length / 4)).sorted
    warmRuns(warmRuns.length / 2)
  }

  /** Evidence + verdict for one flagged query. "environmental" = the
    * isolated-style re-profile shows a constant job count (no plan change)
    * AND a warm time that would not itself trip the guard; anything else
    * is "confirmed" and needs a written BASELINE_NOTES.md adjudication. */
  def adjudicate(times: Seq[Double], jobCounts: Seq[Int], baseline: Double,
                 factor: Double, floor: Double): (Double, String) = {
    val warm = profiledWarm(times)
    val planStable = jobCounts.distinct.length == 1
    val underGuard = warm <= factor * baseline || warm - baseline <= floor
    (math.rint(warm * 1000) / 1000,
      if (planStable && underGuard) "environmental" else "confirmed")
  }

  /** The full bench sweep as a pure-ish function of its inputs so the
    * adjudication path is spec-testable with a forced flag (tiny baseline
    * + zeroed floor) on a restricted query set. Returns the one-line JSON
    * artifact. */
  def run(spark: SparkSession, sfDir: String,
          queries: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)],
          baseline: Map[String, Double],
          factor: Double = RegressionFactor,
          floor: Double = AbsFloorSeconds,
          adjRuns: Int = AdjudicationRuns): String = {
    val warm = scala.collection.mutable.LinkedHashMap[String, Double]()
    val cold = scala.collection.mutable.LinkedHashMap[String, Double]()
    val failed = scala.collection.mutable.ListBuffer[String]()
    val mats = scala.collection.mutable.ListBuffer[String]()
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    queries.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val matsBefore = graft.operators.MaterializeOnce.relationCount
        // Quiesce before each query (the BenchSlope mitigation, r11):
        // ~400 executions in one JVM pile up unreferenced broadcast/
        // shuffle/RDD blocks faster than the async ContextCleaner retires
        // them (it only acts on GC'd references), and the accumulated
        // churn lands on whichever query runs next — r15's q195 measured
        // 3.15 s warm in-loop vs 0.30 s in the same JVM once the sweep
        // drained, and r16's probe flagged q94 at 2.97× with an
        // adjudicated 0.64 s. The GC runs OUTSIDE the timed window; cold
        // absorbs the cleaner catch-up.
        System.gc()
        cold(name) = once(fn)
        if (graft.operators.MaterializeOnce.relationCount > matsBefore)
          mats += name
        warm(name) = once(fn)
      } catch { case e: Throwable =>
        failed += name
        cold.remove(name)
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
    }
    def obj(m: scala.collection.Map[String, Double]): String =
      m.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    def arr(xs: Seq[String]): String =
      xs.map(n => s"\"$n\"").mkString("[", ",", "]")
    def numArr[T](xs: Seq[T]): String = xs.mkString("[", ",", "]")
    val total = warm.values.sum
    val ratio = scala.collection.immutable.ListMap(warm.toSeq.flatMap {
      case (q, t) => baseline.get(q).map(b => q -> math.rint(t / b * 100) / 100)
    }: _*)
    // Era normalization (see CanaryQueries): flags fire on the CANARY-
    // NORMALIZED ratio so a slow machine era produces one `era` number
    // instead of a flag storm that trains readers to ignore `regressed`.
    val era = eraOf(warm, baseline)
    val ratioNorm = scala.collection.immutable.ListMap(warm.toSeq.flatMap {
      case (q, t) =>
        baseline.get(q).map(b => q -> math.rint(t / (b * era) * 100) / 100)
    }: _*)
    // Evidence and verdict are gated separately: EVERY over-ratio query is
    // re-profiled (the artifact must be self-adjudicating — r14's driver
    // run carried a 2.39× entry under the floor with no embedded evidence,
    // forcing a cross-artifact hunt), but only over-ratio AND over-floor
    // queries are *regressed* (sub-second queries carry ±0.5 s jitter; see
    // the AbsFloorSeconds rationale above). Both tests run against the
    // era-scaled baseline.
    val overRatio = ratioNorm.collect { case (q, r) if r > factor => q }.toSeq.sorted
    val regressed = overRatio.filter(q => warm(q) - baseline(q) * era > floor)
    val unbaselined =
      if (baseline.isEmpty) Seq.empty // no baseline committed yet: no guard
      else warm.keys.filterNot(baseline.contains).toSeq.sorted
    // Auto-adjudication: re-profile each over-ratio query in the
    // now-quiescent JVM and embed the evidence. Runs AFTER the sweep so the
    // re-profile is never concurrent with other timed work. The verdict
    // compares against the era-scaled baseline (the era is machine-wide,
    // not in-JVM, so it applies to the re-profile too).
    val byName = queries.toMap
    val adjudication = overRatio.map { q =>
      val (times, jobCounts) = profile(spark, () => { once(byName(q)); () }, adjRuns)
      val (w, verdict) = adjudicate(times, jobCounts, baseline(q) * era, factor, floor)
      s""""$q":{"times":${numArr(times.map(t => math.rint(t * 1000) / 1000))},"jobs":${numArr(jobCounts)},"warm":$w,"verdict":"$verdict"}"""
    }.mkString("{", ",", "}")
    val eraR = math.rint(era * 1000) / 1000
    // Warn on the UNROUNDED ratio — a raw era just outside the notes band
    // (e.g. 0.7996) must not round back inside and mute the alarm; only
    // the artifact field is rounded for display.
    val eraRawFull = eraRawOf(warm, baseline)
    val eraRaw = math.rint(eraRawFull * 1000) / 1000
    val eraWarn = eraWarnOf(eraRawFull, baseline.nonEmpty)
      .fold("null")(w => s""""$w"""")
    s"""{"metric":"total","value":$total,"unit":"sec","run":"warm","exec":"noop_sink","era":$eraR,"era_raw":$eraRaw,"era_warn":$eraWarn,"queries":${obj(warm)},"cold":${obj(cold)},"ratio":${obj(ratio)},"ratio_norm":${obj(ratioNorm)},"regressed":${arr(regressed)},"adjudication":$adjudication,"unbaselined":${arr(unbaselined)},"materializes":${arr(mats.toSeq)},"failed":${arr(failed.toSeq)},"sf":"$sfDir"}"""
  }

  /** Compact (< 2 KB) summary of a full run artifact: the aggregate, the
    * era fields, every flag array, and the CANARY warm times as the
    * `queries` sample — no 200-entry per-query maps. Printed LAST by
    * [[main]] so a consumer that keeps only a bounded tail of stdout (the
    * round driver keeps 2000 chars — three rounds of its bench artifacts
    * carried `parsed: null` because the 25 KB full line never fit) still
    * captures one complete, parseable JSON object. The full artifact is
    * the preceding stdout line and the SPARK_GRAFT_BENCH_OUT file. */
  def compactOf(json: String, nQueries: Int): String = {
    def f(name: String): String =
      s""""$name":(\\[[^\\]]*\\]|"[^"]*"|[-0-9.E]+|null)""".r
        .findFirstMatchIn(json).map(_.group(1)).getOrElse("null")
    // First occurrence of a query name in the artifact is its WARM time
    // (the `queries` object precedes cold/ratio/ratio_norm).
    val canaries = CanaryQueries.flatMap { q =>
      s""""$q":([-0-9.E]+)""".r.findFirstMatchIn(json)
        .map(m => s""""$q":${m.group(1)}""")
    }.mkString("{", ",", "}")
    s"""{"metric":"total","value":${f("value")},"unit":"sec","run":"warm","exec":"noop_sink","compact":true,"n_queries":$nQueries,"era":${f("era")},"era_raw":${f("era_raw")},"era_warn":${f("era_warn")},"regressed":${f("regressed")},"unbaselined":${f("unbaselined")},"failed":${f("failed")},"queries":$canaries,"queries_note":"canary sample; full per-query artifact on the preceding stdout line and in SPARK_GRAFT_BENCH_OUT","sf":${f("sf")}}"""
  }

  /** Per-query summary (~6 KB for 214 gates): the driver contract fields
    * plus the FULL warm `queries` map rounded to 3 decimals, printed as the
    * FINAL stdout line. Rationale (r19 verdict item 1): the driver's
    * per-query round-over-round comparison (PERF `n_common` / geomean)
    * parses bench stdout, and for two rounds it saw either nothing (the
    * 25 KB full artifact exceeds its line handling) or only the 5-canary
    * sample of [[compactOf]] — so every per-query claim had to be
    * re-derived from committed artifacts by hand. This line carries the
    * complete map while staying an order of magnitude smaller than the
    * full artifact: the bulky evidence objects (cold/ratio/ratio_norm/
    * adjudication) stay on the full-artifact line and in
    * SPARK_GRAFT_BENCH_OUT. The <2 KB [[compactOf]] line immediately
    * precedes it as the fallback for strictly-bounded-tail consumers.
    * Purely additive output — the timed loop and the numbers on every
    * line are unchanged. */
  def perqOf(json: String, nQueries: Int): String = {
    def f(name: String): String =
      s""""$name":(\\[[^\\]]*\\]|"[^"]*"|[-0-9.E]+|null)""".r
        .findFirstMatchIn(json).map(_.group(1)).getOrElse("null")
    // First "queries" object in the artifact is the WARM map (cold/ratio
    // maps follow it).
    val body = """"queries":\{([^{}]*)\}""".r.findFirstMatchIn(json)
      .map(_.group(1)).getOrElse("")
    val entries = """"([^"]+)":([-0-9.E]+)""".r.findAllMatchIn(body).map { m =>
      s""""${m.group(1)}":${math.rint(m.group(2).toDouble * 1000) / 1000}"""
    }.mkString(",")
    s"""{"metric":"total","value":${f("value")},"unit":"sec","run":"warm","exec":"noop_sink","perq":true,"n_queries":$nQueries,"era":${f("era")},"era_raw":${f("era_raw")},"era_warn":${f("era_warn")},"regressed":${f("regressed")},"unbaselined":${f("unbaselined")},"failed":${f("failed")},"queries":{$entries},"sf":${f("sf")}}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL_LAST.json")
    RunCoord.registerJvm()
    // Machine-wide bench serialization + contamination stamp (the r18
    // refresh/driver-bench overlap produced 4 environmental flags that
    // had to be adjudicated forensically): hold /tmp/graft_bench.lock for
    // the whole timed sweep; if another bench holds it, WAIT (up to 45
    // min) rather than contaminate both. other_graft_jvms counts any
    // remaining concurrent graft work at sweep start — nonzero means the
    // run's timings carry contention no matter what the lock serialized.
    val (lock, waited) = RunCoord.acquireBenchLock(maxWaitS = 45 * 60)
    val othersAtStart = RunCoord.otherGraftJvms()
    val json0 = try {
      val spark = GraftSession.local(cpus)
      // JVM/codegen warmup so the first timed query is not charged session
      // startup; deliberately does NOT touch the corpus (I/O stays timed).
      spark.range(1000000).selectExpr("sum(id)").collect()
      val baseline = loadBaseline(sys.env.getOrElse(
        "SPARK_GRAFT_BENCH_BASELINE", "BENCH_BASELINE_PERQ.json"))
      val j = run(spark, sfDir, SparkEntry.queries.toSeq, baseline)
      spark.stop()
      j
    } finally RunCoord.releaseBenchLock(lock)
    // max(start, end): a peer that appeared or disappeared mid-sweep
    // still counts as contamination.
    val json = "{" +
      s""""other_graft_jvms":${math.max(othersAtStart, RunCoord.otherGraftJvms())},""" +
      s""""lock_acquired":${lock != null},""" +
      s""""lock_wait_s":${math.rint(waited * 10) / 10},""" +
      json0.drop(1)
    // The post-stop StateStore maintenance thread logs a 10-line
    // IllegalStateException stack ("SparkEnv not active") into the sbt
    // session after the streaming gates have run — ~800 chars of noise
    // inside the driver's bounded 2000-char stdout tail (it crowded the
    // r19 tail). Stop the maintenance task while SparkEnv is still up.
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    println(json)
    println(compactOf(json, SparkEntry.queries.size))
    // FINAL line: the full per-query warm map (r19 verdict item 1) — the
    // line the round driver parses for its per-query comparison.
    println(perqOf(json, SparkEntry.queries.size))
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    // The driver overwrites outPath on its own runs (its low-core scaling
    // sweep lands LAST, so the 32-cpu per-query artifact survived nowhere
    // in r19). Keep a per-core-count copy alongside it.
    val cpuPath =
      if (outPath.endsWith(".json"))
        outPath.stripSuffix(".json") + s"_c$cpus.json"
      else outPath + s"_c$cpus"
    java.nio.file.Files.write(java.nio.file.Paths.get(cpuPath),
      (json + "\n").getBytes("UTF-8"))
  }
}
