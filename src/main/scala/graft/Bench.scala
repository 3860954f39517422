package graft
import org.apache.spark.sql.SparkSession
object Bench {

  type Q = (SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Time every query in `selected` against `sfDir`: per query, `repeat`
    * CONSECUTIVE samples (discard-first-then-min when ≥3) after one
    * System.gc() + settle at the query boundary. The boundary GC stops a
    * heavy predecessor's garbage from billing its collection pause to the
    * next query (r6 recorded numbers up to 5x isolated steady-state from
    * exactly that); the repeats stay back-to-back because the min is
    * meant to measure the operator's warm steady state — a 4-config
    * experiment (gc on/off x interleaved-passes/consecutive, 8 queries,
    * repeat=3) showed interleaving the suite into full passes instead
    * inflates every query ~1.5-2x (74 generated-code plans thrash the JIT
    * between a query's samples) while the boundary GC is ~free. */
  private def runSuite(
      spark: SparkSession,
      selected: Seq[(String, Q)],
      sfDir: String,
      repeat: Int,
      verbose: Boolean): Seq[(String, Double)] = {
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    // The first selected query pays the tail of whole-JVM C2 compilation of
    // shared Spark machinery even after the sf0.001 warm pass and even under
    // discard-first-then-min (measured: q_mean_hour 0.26 s when first in the
    // list vs 0.19 s when later, repeat=8). One untimed run of the first
    // query at the TARGET SF absorbs that ramp so slot order stops mattering.
    selected.headOption.foreach { case (name, fn) =>
      // NonFatal only: an OOME or interrupt here means the timed runs
      // would be garbage anyway — let it propagate instead of silently
      // proceeding with skewed numbers. Log what we swallow.
      // TWO untimed passes: one is not enough for multi-stage plans —
      // the r19 fresh-JVM child read q_pipeline_curate 6.6 s with a
      // single warm pass vs its 4.9 s fully-warmed truth (C2 keeps
      // compiling through the first timed repeats of a 10-stage plan).
      for (_ <- 1 to 2)
        try fn(spark, sfDir).count()
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] warm-up of $name failed: ${e.getMessage}")
        }
    }
    for ((name, fn) <- selected) {
      // Queries eagerly localCheckpoint small results so they can release
      // their input caches; the checkpoint blocks themselves stay pinned
      // until the async ContextCleaner notices the DataFrame is garbage.
      // 74 warmed queries outrun the cleaner, the leftover storage blocks
      // eat into unified execution memory, and the shuffle-heaviest query
      // spills (measured: q_dedup_ngram 3.2 s in-suite vs 1.3 s isolated).
      // Nothing references a prior query's result here, so drop them NOW.
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      System.gc()
      Thread.sleep(50)
      for (_ <- 1 to repeat) {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        samples.updateWith(name)(prev => Some(dt :: prev.getOrElse(Nil)))
      }
    }
    // discard-first-then-min: the first post-GC run pays cold input I/O +
    // JIT re-warm (r8 recorded q_join_fill 0.92 s vs 0.55 s steady-state
    // because repeat=2's min kept much of it); with ≥3 samples the min of
    // the warm tail is the operator's steady state
    selected.map { case (name, _) =>
      val times = samples.getOrElse(name, Nil).reverse
      if (verbose && repeat > 1)
        System.err.println(s"[bench] $name: ${times.map(t => f"$t%.3f").mkString(" ")}")
      val steady = if (times.length >= 3) times.tail else times
      name -> (if (steady.nonEmpty) steady.min else -1.0)
    }
  }

  /** Re-time `names` in a BRAND-NEW JVM (same classpath/flags as this one —
    * `run / fork := true` makes `java.class.path` the real app classpath)
    * and return the per-query steady-state map. The same-JVM post-suite
    * re-measure shares heap/code-cache state with the 100+-query suite —
    * exactly the contamination it is meant to adjudicate (r17 shipped a
    * 6.4 s q_pipeline_curate reading whose fresh-JVM truth was 3.6 s) — so
    * flagged queries get their number from a JVM that never ran the suite.
    * The child is this same main in dev mode (`names.nonEmpty`), which
    * never forks again, so recursion is structurally impossible. */
  private def freshJvmTimes(names: Seq[String], sfDir: String, repeat: Int): Map[String, Double] = {
    if (names.isEmpty) return Map.empty
    // Contention guard (r20 postmortem: the isolated_fresh re-time — the
    // machinery built to EXONERATE a contended session — itself ran inside
    // the contended session and read 10.6 s for a 5.5 s query). If the box
    // is loaded right now, wait one cooldown for the load to drain; either
    // way the child's launch-time loadavg lands in the artifact (see
    // freshLoadavg) so the adjudication columns carry their own validity
    // stamp instead of needing a judge-side re-measure.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toDouble
    def load1(): Double =
      loadavg().split(" ").headOption.flatMap(_.toDoubleOption).getOrElse(0.0)
    if (load1() > cpus / 8) {
      System.err.println(f"[bench] loadavg ${load1()}%.2f > ${cpus / 8}%.1f before fresh-JVM re-measure; cooling down 60 s")
      Thread.sleep(60000)
    }
    freshLoadavg = loadavg()
    freshContended = load1() > cpus / 8
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-Xrunjdwp"))
    val cmd = (Seq(javaBin) ++ jvmArgs ++
      Seq("-cp", System.getProperty("java.class.path"), "graft.Bench") ++
      names ++ Seq(s"repeat=$repeat")).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
    pb.redirectErrorStream(false)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    try {
      val p = pb.start()
      // Drain stdout on a reader thread so a chatty child can't deadlock
      // on a full pipe while we sit in waitFor.
      val outRef = new java.util.concurrent.atomic.AtomicReference[String]("")
      val drain = new Thread(() =>
        outRef.set(new String(p.getInputStream.readAllBytes(), "UTF-8")))
      drain.setDaemon(true); drain.start()
      // A wedged child must not hang the whole bench run: bound the wait
      // and kill on expiry. A non-zero exit or a missing queries object
      // must be distinguishable in the artifact from "nothing flagged",
      // so record an explicit failure marker instead of silently
      // returning an empty map.
      val finished = p.waitFor(20, java.util.concurrent.TimeUnit.MINUTES)
      if (!finished) {
        p.destroyForcibly()
        System.err.println("[bench] fresh-JVM re-measure timed out after 20 min; killed child")
        return Map("__fresh_jvm_timeout__" -> -1.0)
      }
      drain.join(10000)
      val out = outRef.get()
      // dev mode prints one JSON line {"..","queries":{"name":sec,...},..}.
      // CONTRACT (shared with previousTimes and the println/writeString
      // sites below): the queries object is FLAT and is the first {...}
      // after the "queries" key — keep it that way or switch both parsers
      // to a real tokenizer.
      val qobj = """"queries":\{([^}]*)\}""".r.findFirstMatchIn(out).map(_.group(1)).getOrElse("")
      val parsed = """"([^"]+)":([-0-9.eE]+)""".r.findAllMatchIn(qobj)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
      if (p.exitValue() != 0 || parsed.isEmpty) {
        System.err.println(s"[bench] fresh-JVM child exit=${p.exitValue()}, parsed ${parsed.size} queries")
        if (parsed.isEmpty) return Map("__fresh_jvm_failed__" -> p.exitValue().toDouble)
      }
      parsed
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] fresh-JVM re-measure failed: ${e.getMessage}")
      Map("__fresh_jvm_failed__" -> -1.0)
    }
  }

  /** Previous artifact's per-query map (for the >1.5x flagging), read
    * BEFORE this run overwrites the file. */
  private def previousTimes(): Map[String, Double] = try {
    val p = java.nio.file.Paths.get("/root/repo/bench_times.json")
    if (!java.nio.file.Files.isRegularFile(p)) return Map.empty
    val s = java.nio.file.Files.readString(p)
    // Same flat-queries-object regex contract as freshJvmTimes — see the
    // comment there and at the writeString site.
    val qobj = """"queries":\{([^}]*)\}""".r.findFirstMatchIn(s).map(_.group(1)).getOrElse("")
    """"([^"]+)":([-0-9.eE]+)""".r.findAllMatchIn(qobj)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  } catch { case scala.util.control.NonFatal(_) => Map.empty }

  /** First three /proc/loadavg fields — session-health evidence so uniform
    * cross-query drift (a busy box) is machine-readable in the artifact
    * instead of needing a manual second session to adjudicate (r19). */
  private def loadavg(): String = try {
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg")), "UTF-8").trim
      .split(" ").take(3).mkString(" ")
  } catch { case scala.util.control.NonFatal(_) => "" }

  private def jvmUptimeMs(): Long =
    java.lang.management.ManagementFactory.getRuntimeMXBean.getUptime

  /** Launch-time health of the fresh-JVM adjudication child (r21 item:
    * the re-time must carry its own validity stamp — see freshJvmTimes). */
  @volatile private var freshLoadavg: String = ""
  @volatile private var freshContended: Boolean = false

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val loadStart = loadavg()
    val upStart = jvmUptimeMs()
    val spark = graft.Graft.session("graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (codegen, parquet footers, shuffle machinery) so
    // per-query timings measure the operators, not JVM startup billed to
    // whichever query happens to run first
    try {
      spark.range(1000).selectExpr("sum(id)").count()
      graft.Graft.events(spark, sfDir).count()
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] session warm failed: ${e.getMessage}")
    }
    // warm every query's plan at the tiny SF first: whole-stage codegen
    // compilation and JIT otherwise bill ~1s to whichever query the Map
    // happens to iterate first (observed as a phantom 2.3x q_sum_hour
    // regression in round 2); steady-state per-query time is the metric
    // optional dev mode: `runMain graft.Bench q1 q2 ... [repeat=N]` times just
    // those queries N times each (isolated regression hunting); the driver's
    // no-arg invocation is unchanged
    val repeat = args.collectFirst { case s if s.startsWith("repeat=") => s.drop(7).toInt }.getOrElse(3)
    val names = args.filterNot(_.startsWith("repeat="))
    val selected: Seq[(String, Q)] =
      if (names.isEmpty) SparkEntry.queries.toSeq
      else names.map(n => n -> SparkEntry.queries(n)).toSeq
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && sys.env.getOrElse("GRAFT_BENCH_WARMALL", "1") == "1")
      selected.foreach { case (n, fn) =>
        try fn(spark, warmDir).count()
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] sf0.001 warm of $n failed: ${e.getMessage}")
        }
      }
    val results = runSuite(spark, selected, sfDir, repeat, verbose = true)
    // scaling-slope smoke: re-time the suite at the 10x-smaller SF and
    // report t(sf)/t(small) per query. A query whose warm time grows much
    // faster than the data (ratio >> 10x) has a super-linear stage —
    // exactly the candidate-blowup class the single-SF bench cannot see.
    // Fixed overhead dominates sub-0.05s small-SF times, so only those
    // above it are flagged.
    val smallDir = "/root/testdata/sf0.01"
    val doSlope = names.isEmpty && sfDir != smallDir &&
      new java.io.File(smallDir).isDirectory &&
      sys.env.getOrElse("GRAFT_BENCH_SLOPE", "1") == "1"
    val (slopes, flags) =
      if (!doSlope) (Map.empty[String, Double], Seq.empty[String])
      else {
        val small = runSuite(spark, selected, smallDir, 3, verbose = false).toMap
        val big = results.toMap
        val sl = selected.flatMap { case (n, _) =>
          val s = small.getOrElse(n, -1.0)
          val b = big.getOrElse(n, -1.0)
          if (s > 0 && b > 0) Some(n -> b / s) else None
        }.toMap
        (sl, sl.collect { case (n, r) if r > 15.0 && small(n) > 0.05 => n }.toSeq.sorted)
      }
    // Post-suite isolated re-measure of the most expensive queries: the
    // 100+-query suite inflates its heaviest entries (JIT/codegen cache
    // thrash + ContextCleaner lag — q_pipeline_curate has read 7.4 s in
    // suite vs 3.6-3.9 s isolated across rounds). Re-timing the top
    // queries alone at the end, same session, puts the steady-state
    // number IN the artifact instead of only in ad-hoc dev runs, so a
    // suite-reading jump can be adjudicated against the same round's
    // isolated number directly.
    val prev = if (names.isEmpty) previousTimes() else Map.empty[String, Double]
    val isolated: Map[String, Double] =
      if (names.nonEmpty) Map.empty
      else {
        val top = results.sortBy(-_._2).take(3).map(_._1)
        val lookup = selected.toMap
        runSuite(spark, top.map(n => n -> lookup(n)), sfDir, repeat = 5,
          verbose = true).toMap
      }
    // Fresh-JVM adjudication set: the top-3 plus anything that drifted vs
    // its previous-artifact time — >1.25x for queries above 0.1 s (r18's
    // q_distinct drifted 1.33x and escaped the old 1.5x trigger), >1.5x
    // for the sub-0.1 s tail where scheduler jitter alone reaches 1.3x
    // (capped at 8 — a degraded session flags broadly, and the child JVM
    // re-times serially). Runs AFTER the driver-visible suite numbers
    // exist, in ONE child JVM, so the artifact carries its own
    // session-skew verdict.
    val isolatedFresh: Map[String, Double] =
      if (names.nonEmpty || sys.env.getOrElse("GRAFT_BENCH_FRESH", "1") != "1") Map.empty
      else {
        val big = results.toMap
        val top = results.sortBy(-_._2).take(3).map(_._1)
        val regressed = results.collect {
          case (n, t) if prev.get(n).exists(p =>
            p > 0.05 && t > (if (t > 0.1) 1.25 else 1.5) * p) => n
        }.sortBy(n => -big(n))
        val flagged = (top ++ regressed).distinct.take(8)
        // release this JVM's executors before the child spins up its own
        // 32-thread scheduler — two live local[32] sessions contend
        spark.stop()
        freshJvmTimes(flagged, sfDir, repeat = 8)
      }
    def jnum(v: Double): String = f"$v%.4f"
    // CONTRACT: the "queries" object in BOTH the stdout line and
    // bench_times.json must stay flat (string->number only) and be the
    // first {...} after the "queries" key — previousTimes and
    // freshJvmTimes parse it with a first-match regex, not a JSON parser.
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val flagsJson = flags.map("\"" + _ + "\"").mkString("[", ",", "]")
    // session-health evidence (r19 item 5): loadavg + JVM age at both ends
    // of the run make uniform drift adjudicable from the artifact alone
    val sessionJson =
      s"""{"loadavg_start":"$loadStart","loadavg_end":"${loadavg()}",""" +
      s""""jvm_uptime_ms_start":$upStart,"jvm_uptime_ms_end":${jvmUptimeMs()},""" +
      s""""fresh_loadavg":"$freshLoadavg","fresh_contended":$freshContended}"""
    // only a FULL-suite run owns the artifact — a dev-mode partial run
    // (`runMain graft.Bench q_x repeat=8`) must not clobber the complete
    // per-query map the driver snapshots
    if (names.isEmpty) try {
      val slopesJson = slopes.toSeq.sorted
        .map { case (k, v) => s"\"" + k + "\":" + jnum(v) }.mkString("{", ",", "}")
      val fullQs = results.map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      // suite position per query: a query whose reading is inflated only
      // when it runs late in the slot order is session contamination, not
      // a regression — make that check possible from one artifact
      val posJson = results.zipWithIndex
        .map { case ((k, _), i) => s"\"" + k + "\":" + i }.mkString("{", ",", "}")
      val isoJson = isolated.toSeq.sorted
        .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
      val isoFreshJson = isolatedFresh.toSeq.sorted
        .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/root/repo/bench_times.json"),
        s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","queries":$fullQs,"positions":$posJson,"isolated":$isoJson,"isolated_fresh":$isoFreshJson,"slopes":$slopesJson,"slope_flags":$flagsJson,"session":$sessionJson}""")
    } catch { case _: Throwable => () }
    val isoOut = isolated.toSeq.sorted
      .map { case (k, v) => s"\"" + k + "\":" + jnum(v) }.mkString("{", ",", "}")
    val isoFreshOut = isolatedFresh.toSeq.sorted
      .map { case (k, v) => s"\"" + k + "\":" + jnum(v) }.mkString("{", ",", "}")
    // The stdout line carries the FULL per-query map (r21 verdict item 1:
    // the driver parses per-query perf from this line and does not follow
    // file pointers — the old top-20 + `queries_full` indirection left
    // PERF_*.json empty every round). Expensive queries print first and the
    // adjudication payload (isolated, isolated_fresh, slope_flags, session
    // health) plus the total sit at the END of the line, so even a bounded
    // tail capture keeps the totals. The complete map is also committed in
    // bench_times.json, byte-for-byte the same numbers. Dev mode (explicit
    // query names) keeps its complete map on stdout in run order —
    // freshJvmTimes parses its child's line for exactly that.
    val qsOut = (if (names.isEmpty) results.sortBy(-_._2) else results)
      .map { case (k, v) => s"\"" + k + "\":" + jnum(v) }.mkString("{", ",", "}")
    // stop BEFORE printing the contract line: Spark's shutdown logging goes
    // to stderr and must not race a merged-stream capture mid-line
    spark.stop()
    println(s"""{"metric":"total","unit":"sec","sf":"$sfDir","n_queries":${results.size},"queries":$qsOut,"isolated":$isoOut,"isolated_fresh":$isoFreshOut,"slope_flags":$flagsJson,"session":$sessionJson,"value":${jnum(total)}}""")
    System.out.flush()
  }
}
