package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** DIAGNOSTIC TOOL, not product surface (the [[graft.graph.ProfileMain]]
  * precedent): structural plan metrics for one registered query — job
  * count, task count, summed executor run time, shuffle bytes — printed
  * once per recorded run after a discarded warm-up. Wall-clock on a
  * drifting box cannot attribute a ±1 s plan change (the r15 gid-stage
  * ABBA read 3.4–11.2 s for the SAME tree at matched canaries); job and
  * shuffle counts are deterministic for a deterministic plan, so A/B
  * trees compare structurally instead.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.PlanMetrics
  * q110_neardup_groups [runs]"; grep stdout for PLAN-METRICS.
  */
object PlanMetrics {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanMetrics <queryName> [recordedRuns]")
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val runMs = new AtomicLong(0)
    val shR = new AtomicLong(0)
    val shW = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          runMs.addAndGet(m.executorRunTime)
          shR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    def runOnce(): Long = SparkEntry.queries(name)(spark, sfDir).count()

    runOnce() // discarded warm-up: JIT, session caches, first-use costs
    // the listener bus is private[spark]; a short drain sleep before each
    // counter reset/read is enough for a diagnostic (events are local)
    def drain(): Unit = Thread.sleep(1500)
    (1 to runs).foreach { i =>
      drain()
      jobs.set(0); tasks.set(0); runMs.set(0); shR.set(0); shW.set(0)
      val t0 = System.nanoTime()
      val n = runOnce()
      drain()
      println(f"PLAN-METRICS $name run=$i rows=$n " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.2f " +
        f"jobs=${jobs.get} tasks=${tasks.get} " +
        f"taskTimeSec=${runMs.get / 1000.0}%.1f " +
        f"shufRdMB=${shR.get / 1e6}%.1f shufWrMB=${shW.get / 1e6}%.1f")
    }
    spark.stop()
  }
}
