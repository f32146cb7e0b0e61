package graft

import org.apache.spark.sql.SparkSession
import graft.images.SyntheticImages
import graft.pipeline.ImageDedupPipeline

/** Scaling-efficiency evidence for the north rule's two-cluster-size
  * criterion, evidenced in this sandbox (per BASELINE.md protocol) by the
  * same end-to-end dedup job at N vs 4N cores on identical input:
  *
  *   efficiency = (T_N × N) / (T_4N × 4N)   (target ≥ 0.8)
  *
  * The measured job is generate→dedup→cluster via
  * [[ImageDedupPipeline.runDirect]] (input is a lazy deterministic plan, so
  * generation work scales with the job — on a real cluster it would be an
  * Iceberg scan). One JIT warmup run precedes measurement; each measured
  * run gets a fresh SparkSession with shuffle partitions = cores.
  *
  * Usage: GRAFT_BENCH_N=300000 sbt "runMain graft.ScalingBench"
  * Writes BENCH_SCALING_RUN.md (raw table of THIS run — the curated
  * multi-run evidence lives in BENCH_SCALING.md) and prints one JSON line.
  */
object ScalingBench {

  case class RunResult(cores: Int, wallSec: Double, imagesPerSec: Double, recall: Double,
                       jobs: Int = 0, taskSec: Double = 0.0, cpuSec: Double = 0.0,
                       gcSec: Double = 0.0, shufRecR: Long = 0L, shufRecW: Long = 0L) {
    /** Core utilization: fraction of the run's core-seconds spent executing
      * task CPU work. The host-drift-robust per-run statistic — a uniform
      * host slowdown inflates wall and cpuSec together and cancels. */
    def utilization: Double = cpuSec / (cores * wallSec)
  }

  /** Counts jobs and summed task time — diagnoses driver-serial overhead:
    * parallel-work floor ≈ taskSec/cores; the rest of wall is serial.
    * Shuffle record counts are the work-invariance control: equal counts at
    * both core counts prove the two runs executed the same data plan. */
  private class Meter extends org.apache.spark.scheduler.SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    val shufRecR = new java.util.concurrent.atomic.AtomicLong
    val shufRecW = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
      if (t.taskMetrics != null) {
        cpuNs.addAndGet(t.taskMetrics.executorCpuTime)
        gcMs.addAndGet(t.taskMetrics.jvmGCTime)
        shufRecR.addAndGet(t.taskMetrics.shuffleReadMetrics.recordsRead)
        shufRecW.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.get("GRAFT_BENCH_N").map(_.toLong).getOrElse(300000L)
    // default N=2 vs 4N=8 — the headline pair in BENCH_SCALING.md: both
    // sizes sit below the box's DRAM-saturation knee (~8-10 threads), so
    // the ratio measures the engine, not the single socket. 6,24 remains
    // available via GRAFT_BENCH_CORES for the saturated-regime numbers.
    val cores = sys.env.getOrElse("GRAFT_BENCH_CORES", "2,8").split(",").map(_.trim.toInt)
    val reps = sys.env.get("GRAFT_BENCH_REPS").map(_.toInt).getOrElse(2)

    // Materialize the input table ONCE, untimed — the north-rule job reads
    // an existing (Iceberg-shaped) table; synthesizing PNG bytes is not part
    // of the measured dedup work, and both cluster sizes must read identical
    // bytes.
    val inputPath = s"/tmp/graft_scaling_input_$n"
    if (!new java.io.File(s"$inputPath/_SUCCESS").exists()) {
      val s = session(cores.max)
      try SyntheticImages.generate(s, n).toDF()
        .write.mode("overwrite").parquet(inputPath)
      finally s.stop()
    }

    // JIT warmup is a FULL run (runOnce reads the whole pre-materialized
    // input regardless of n, so passing a reduced n would only skew the
    // discarded recall/throughput fields — not the work done).
    runOnce(cores.max, n, inputPath)

    // best-of-reps per size: min wall = least external noise
    val results = cores.map(c =>
      (1 to reps).map(_ => runOnce(c, n, inputPath)).minBy(_.wallSec))
    val lo = results.minBy(_.cores)
    val hi = results.maxBy(_.cores)
    val efficiency = (lo.wallSec * lo.cores) / (hi.wallSec * hi.cores)
    // CPU-normalized efficiency: calibrate each run's wall by its own
    // measured CPU speed (cpuSec of the SAME plan — see invariance controls)
    // so a host-speed drift between the two runs cancels:
    //   normalized wall ŵ_c ∝ wall_c / cpuSec_c
    //   eff_cpu = (ŵ_N·N)/(ŵ_4N·4N) = utilization(4N) / utilization(N)
    // i.e. "does the engine keep 4N cores as busy as it keeps N". Valid only
    // when both runs executed the same plan — jobs and shuffle record
    // counts equal — which the JSON/table report as explicit controls.
    val cpuNormEff = hi.utilization / lo.utilization
    val jobsInvariant = lo.jobs == hi.jobs
    // AQE may re-plan partition COUNTS but not record counts; tolerance 1%.
    // Both directions checked: records WRITTEN (map-side plan identical)
    // AND records READ (a reduce-side divergence — e.g. a broadcast
    // flipping to shuffle on one run — shows up here first).
    def within1pct(a: Long, b: Long): Boolean =
      math.abs(a - b) <= 0.01 * math.max(a, b)
    val shufInvariant =
      within1pct(lo.shufRecW, hi.shufRecW) && within1pct(lo.shufRecR, hi.shufRecR)

    val runsJson = results.map(r =>
      s"""{"cores":${r.cores},"wall_sec":${r.wallSec},"images_per_sec":${r.imagesPerSec},"recall":${r.recall},"jobs":${r.jobs},"task_sec":${r.taskSec},"cpu_sec":${r.cpuSec},"gc_sec":${r.gcSec},"shuffle_rec_read":${r.shufRecR},"shuffle_rec_write":${r.shufRecW},"utilization":${r.utilization}}""")
      .mkString("[", ",", "]")
    println(s"""{"bench":"scaling","n":$n,"runs":$runsJson,"efficiency":$efficiency,"cpu_norm_efficiency":$cpuNormEff,"jobs_invariant":$jobsInvariant,"shuffle_invariant":$shufInvariant}""")

    val md = new StringBuilder
    md.append("# BENCH_SCALING — N vs 4N cores on the end-to-end image dedup job\n\n")
    md.append(s"Input: deterministic synthetic input_hint table, n = $n images ")
    md.append("(generate→exact-collapse→MinHash-LSH+substring+phash→verify(PSNR)→CC).\n")
    md.append("Protocol: BASELINE.md 'Scaling protocol' — same input, shuffle partitions = cores.\n\n")
    md.append("| run | cores | wall sec | images/sec | dup-pair recall | jobs | cpu sec | gc sec | shuf rec W | utilization |\n|---|---|---|---|---|---|---|---|---|---|\n")
    results.foreach { r =>
      md.append(f"| local[${r.cores}] | ${r.cores} | ${r.wallSec}%.1f | ${r.imagesPerSec}%.0f | ${r.recall}%.4f | ${r.jobs} | ${r.cpuSec}%.0f | ${r.gcSec}%.0f | ${r.shufRecW} | ${r.utilization}%.3f |\n")
    }
    md.append(f"\nScaling efficiency (T_N·N)/(T_4N·4N) = $efficiency%.3f (target ≥ 0.8)\n")
    md.append(f"CPU-normalized efficiency util(4N)/util(N) = $cpuNormEff%.3f ")
    md.append(f"(host-drift-robust; valid: jobs invariant = $jobsInvariant, shuffle records invariant = $shufInvariant)\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_SCALING_RUN.md"), md.toString)
  }

  private def session(cores: Int): SparkSession = {
    // shuffle partitions = 4x cores: with 1 task per core a single
    // steal-delayed straggler extends every stage barrier; smaller tasks
    // level it (same ratio at both sizes keeps the comparison fair)
    val partsPerCore = sys.env.getOrElse("GRAFT_BENCH_PARTS_PER_CORE", "4").toInt
    // AQE on by default (skew-join safety net); GRAFT_BENCH_AQE=false A/Bs
    // the driver-serial planning cost — explicit salting already handles
    // the skew AQE would
    val aqe = sys.env.getOrElse("GRAFT_BENCH_AQE", "true")
    val builder = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", (cores * partsPerCore).toString)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.adaptive.skewJoin.enabled", aqe)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // optional memory-system experiments (A/B via env, default off):
    // off-heap execution memory takes shuffle/sort/hash buffers out of the
    // GC'd heap — the lever for the GC inflation seen at 4N threads
    sys.env.get("GRAFT_BENCH_OFFHEAP").foreach { size =>
      builder.config("spark.memory.offHeap.enabled", "true")
        .config("spark.memory.offHeap.size", size)
    }
    // optional: shuffle/spill files on a tmpfs (a cluster has one local
    // disk PER NODE; on one box all threads share one disk)
    sys.env.get("GRAFT_BENCH_LOCALDIR").foreach(d =>
      builder.config("spark.local.dir", d))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def runOnce(cores: Int, n: Long, inputPath: String): RunResult = {
    val spark = session(cores)
    val meter = new Meter
    spark.sparkContext.addSparkListener(meter)
    try {
      val input = spark.read.parquet(inputPath) // written with exactly n rows
      val t0 = System.nanoTime()
      val clusters = ImageDedupPipeline.runDirect(spark, input).localCheckpoint()
      clusters.count()
      val wall = (System.nanoTime() - t0) / 1e9
      // snapshot every meter BEFORE the (untimed) recall evaluation below
      // adds its own jobs/tasks to the listener
      val jobs = meter.jobs.get(); val taskSec = meter.taskMs.get() / 1e3
      val cpuSec = meter.cpuNs.get() / 1e9; val gcSec = meter.gcMs.get() / 1e3
      val shufR = meter.shufRecR.get(); val shufW = meter.shufRecW.get()
      System.err.println(f"[scaling] cores=$cores wall=$wall%.1f jobs=$jobs taskSec=$taskSec%.0f cpuSec=$cpuSec%.0f gcSec=$gcSec%.0f shufRecW=$shufW util=${cpuSec / (cores * wall)}%.3f parallelFloor=${taskSec / cores}%.1f")
      val truth = SyntheticImages.truth(spark, n).toDF()
      val (recall, _, _) = Main.pairRecall(clusters, truth)
      RunResult(cores, wall, n / wall, recall, jobs, taskSec,
        cpuSec = cpuSec, gcSec = gcSec, shufRecR = shufR, shufRecW = shufW)
    } finally spark.stop()
  }
}
