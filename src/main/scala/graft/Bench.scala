package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line.
  *
  * Each query is timed SPARK_GRAFT_RUNS times (default 3) and the per-query
  * MEDIAN is reported — single runs on a contended host can vary 3×+, and
  * medians keep one noisy run from reading as a regression. Runs are
  * INTERLEAVED round-robin (all queries once, then again, …) so a host
  * contention burst degrades at most one run of many queries — which the
  * per-query median then discards — instead of all runs of one query,
  * which it can't (the r8 q15/q35 incidents). `value` is the sum of
  * medians. SPARK_GRAFT_ONLY=q41_label_prop,q44_fastrp restricts the run
  * (local profiling loop).
  *
  * Noise hardening (r11, VERDICT item 6 — after two rounds of drift
  * forensics): (a) one DISCARDED warm-up sweep of every selected query
  * runs before the recorded sweeps (JIT, shuffle-file, and session-cache
  * first-use costs land there, not in run 1's medians; SPARK_GRAFT_WARMUP=0
  * disables); (b) a box-health CANARY — q01 timed once, alone, right
  * after table warm-up — is logged to stderr and carried in the JSON as
  * `canary_sec`, so every recorded sweep ships its own drift control and
  * cross-round comparisons can normalize for a slow box instead of
  * re-litigating it (the r9→r10 forensics required rebuilding an old
  * tree to get this number).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every table + JIT the scan/agg/join/codegen machinery
    // once, so per-query timings measure the operators, not first-use costs
    graft.schemas.Tables.names.foreach { t =>
      try graft.schemas.Tables.load(spark, sfDir, t).limit(64).count()
      catch { case _: Throwable => }
    }
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => }
    // warm the session projection cache + the graph-tier JIT the same way:
    // otherwise whichever graph query the Map iteration order runs FIRST
    // absorbs the one-time build and reads 3-8x inflated (the round-3/4
    // "unexplained regression" pattern — see BENCH_LOCAL_r4.md). Skipped
    // when SPARK_GRAFT_ONLY selects no graph-family query, so a text-only
    // profiling loop doesn't pay a projection build it never uses.
    val graphFamily = graft.queries.GraphQueries.defs.keySet + "q13_degrees"
    if (only.forall(_.exists(graphFamily)))
      try SparkEntry.queries("q43_connected_components")(spark, sfDir).count()
      catch { case _: Throwable => }

    // box-health canary (r11): one timed run of a fixed reference query,
    // alone, post-warmup — the per-sweep drift control. Not part of the
    // scored total; lives in the JSON so BENCH_r*.json series carry their
    // own box-speed normalizer.
    val canary = {
      val t0 = System.nanoTime()
      try SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
      catch { case _: Throwable => }
      (System.nanoTime() - t0) / 1e9
    }
    System.err.println(f"BENCH-CANARY q01_pricing_summary $canary%8.3f s")

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) -1.0
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }

    // SPARK_GRAFT_DIAG=1: after each query, log session-accumulation
    // telemetry to STDERR (the stdout JSON contract is untouched) — the
    // instrument for the round-5 "sweep inflation" finding (driver sweep
    // ~71 s vs clean-session ~43 s; later queries' all-three-runs slow).
    val diag = sys.env.get("SPARK_GRAFT_DIAG").contains("1")
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMillis: Long = {
      var t = 0L; gcBeans.forEach(b => t += math.max(0L, b.getCollectionTime)); t
    }
    def diagLine(name: String, gcDelta: Long, times: Seq[Double]): Unit = if (diag) {
      val sc = spark.sparkContext
      val rt = Runtime.getRuntime
      val heapMb = (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
      val memUsedMb = sc.getExecutorMemoryStatus.values
        .map { case (max, remaining) => max - remaining }.sum / (1024 * 1024)
      val rddInfo = sc.getRDDStorageInfo
      val nBlocks = rddInfo.map(_.numCachedPartitions).sum
      val nRdds = sc.getPersistentRDDs.size
      val nStreams = spark.streams.active.length
      val nViews = spark.catalog.listTables().count()
      // min/max across the runs separates "all runs slow" (persistent
      // state / sustained contention) from "one run slow" (transient)
      val tmin = if (times.nonEmpty) times.min else -1.0
      val tmax = if (times.nonEmpty) times.max else -1.0
      System.err.println(
        s"""DIAG {"q":"$name","gc_ms":$gcDelta,"heap_mb":$heapMb,""" +
        s""""storage_mb":$memUsedMb,"blocks":$nBlocks,"rdds":$nRdds,""" +
        s""""active_streams":$nStreams,"views":$nViews,""" +
        f""""t_min":$tmin%.3f,"t_max":$tmax%.3f}""")
    }

    // INTERLEAVED protocol (r9, VERDICT item 4): run 1 of EVERY query,
    // then run 2, then run 3 — a host contention burst (BENCH_LOCAL_r8 §5
    // recorded one spanning all three consecutive runs of a single query,
    // 88.7 s vs a 1.3 s norm, which a per-query median cannot defend)
    // now lands on at most ONE run of each query and the median discards
    // it. Deterministic name order inside each round so cross-round
    // comparisons see the same neighbors.
    val queries = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .toSeq.sortBy(_._1)
    val gcByQuery = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val timesByQuery =
      collection.mutable.Map[String, Vector[Double]]().withDefaultValue(Vector.empty)
    def timeOne(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      val gc0 = gcMillis
      val t0 = System.nanoTime()
      // caller-side result release (the BlockReleaseSweepSpec contract):
      // operators returning checkpointed outputs hand ownership to the
      // consumer — releasing here keeps N-query × M-run sessions at a
      // flat block count (release cost is part of using the result, so
      // it stays inside the timed region)
      var r: org.apache.spark.sql.DataFrame = null
      try {
        r = fn(spark, sfDir)
        r.count()
      } catch { case _: Throwable => }
      finally if (r != null) graft.util.BlockRelease.release(r)
      timesByQuery(name) :+= (System.nanoTime() - t0) / 1e9
      gcByQuery(name) += gcMillis - gc0
      // between-query hygiene: terminated streaming queries (q58/q59
      // start fresh queries every run) otherwise accumulate in the
      // StreamingQueryManager for the life of the session, pinning
      // their progress buffers and last-batch plans
      spark.streams.resetTerminated()
    }
    // SPARK_GRAFT_CONSECUTIVE=1: the r8-and-earlier protocol (all runs of
    // one query back-to-back) — kept as an experiment switch for the r10
    // protocol-vs-session-pressure attribution (BENCH_LOCAL_r10 §2); the
    // contract default stays interleaved.
    val consecutive = sys.env.get("SPARK_GRAFT_CONSECUTIVE").contains("1")
    // discarded warm-up sweep (r11): every query once, nothing recorded —
    // first-use costs (JIT tiers, shuffle files, projection/sym caches)
    // stop contaminating run 1 of the recorded sweeps
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0") {
      val t0 = System.nanoTime()
      queries.foreach { case (name, fn) =>
        var r: org.apache.spark.sql.DataFrame = null
        try { r = fn(spark, sfDir); r.count() }
        catch { case _: Throwable => }
        finally if (r != null) graft.util.BlockRelease.release(r)
        spark.streams.resetTerminated()
      }
      System.err.println(
        f"BENCH-WARMUP-SWEEP discarded ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    if (consecutive) {
      queries.foreach { case (name, fn) =>
        (1 to runs).foreach(_ => timeOne(name, fn))
      }
    } else (1 to runs).foreach { run =>
      queries.foreach { case (name, fn) => timeOne(name, fn) }
      val roundTotal = queries.map { case (n, _) => timesByQuery(n)(run - 1) }.sum
      System.err.println(f"BENCH-ROUND $run/$runs sweep_total $roundTotal%8.2f s")
    }
    val results = queries.map { case (name, _) =>
      val times = timesByQuery(name)
      // per-run spread: a query whose max/min ratio stays high across an
      // INTERLEAVED sweep is genuinely bimodal, not burst-afflicted
      System.err.println(
        f"BENCH-SPREAD $name%-28s ${times.map(t => f"$t%.3f").mkString(" ")}%s")
      diagLine(name, gcByQuery(name), times)
      name -> median(times)
    }
    // The driver records only the LAST 2000 bytes of stdout+stderr and
    // json-parses what it finds there — every round through r6 the full
    // 68-query line overflowed that window and parsed as null. Keep the
    // one contract line under ~1.2 KB: qNN keys (numbering is unique;
    // full names are the CORRECTNESS_r*.json keys) and ms precision.
    // The full-name mapping still goes to stderr for humans.
    results.foreach { case (k, v) => System.err.println(f"BENCH $k%-28s $v%8.3f s") }
    // Locale-independent number formatting: f-interpolation uses the JVM
    // default locale, which under e.g. de_DE emits comma decimals and
    // breaks the JSON contract. Locale.ROOT pins "." forever.
    def num(v: Double, places: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${places}f", Double.box(v))
    // qNN truncation relies on global uniqueness of the numeric prefixes;
    // a future collision would silently drop one query's timing from the
    // JSON object (duplicate keys). Fail loudly at bench time instead.
    val qkeys = results.map(_._1.takeWhile(_ != '_'))
    require(qkeys.distinct.size == qkeys.size,
      s"duplicate qNN bench keys: ${qkeys.diff(qkeys.distinct).distinct.mkString(",")}")
    val qs = results.map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + num(v, 3) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val line =
      s"""{"metric":"total","value":${num(total, 2)},"unit":"sec","sf":"$sfDir","runs_per_query":$runs,"canary_sec":${num(canary, 3)},"queries":$qs}"""
    // Belt-and-braces for the driver's tail-capture: mirror the contract
    // line to a file the judge can read even if the tail parse fails.
    // SPARK_GRAFT_BENCH_MIRROR redirects the mirror (tools/bench_forced.sh
    // uses it so the forced-tier sweep never clobbers the canonical
    // full-sweep BENCH_LAST.json — the r11 hygiene lesson).
    try {
      val mirror = sys.env.getOrElse("SPARK_GRAFT_BENCH_MIRROR", "BENCH_LAST.json")
      val w = new java.io.PrintWriter(new java.io.File(mirror), "UTF-8")
      try w.println(line) finally w.close()
    } catch { case _: Throwable => }
    spark.stop()
    // Printed AFTER spark.stop() so the contract line is the process's
    // final stdout output (build.sbt routes forked stdout raw, so no sbt
    // "[info]" prefix lands in the driver's 2000-byte tail window).
    println(line)
  }
}
