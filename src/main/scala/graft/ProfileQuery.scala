package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev-only per-job profiler: runs one query through the noop sink with a
  * listener that prints every job's wall time, stage count and task time —
  * locates WHERE a multi-job query (CC loops, k-means, bloom builds)
  * spends its seconds. Usage:
  *   tools/run_main.sh graft.ProfileQuery q08_dedup_clusters [sfDir] [cpus]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = mutable.Map[Int, (Long, String, Int)]() // id -> (start, desc, stages)
    val taskTime = mutable.Map[Int, Long]()
    val lines = mutable.ArrayBuffer[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.synchronized {
        val names = js.stageInfos.map(si => si.name.take(60)).mkString(" | ")
        jobs(js.jobId) = (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description")).getOrElse("") +
            " :: " + names,
          js.stageIds.size)
        taskTime(js.jobId) = 0L
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = jobs.synchronized {
        val jid = jobs.keys.maxOption.getOrElse(-1)
        if (jid >= 0 && te.taskInfo != null)
          taskTime(jid) = taskTime(jid) + te.taskInfo.duration
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(je.jobId).foreach { case (t0, desc, nst) =>
          lines += f"job ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3fs " +
            f"stages=$nst%2d taskTime=${taskTime.getOrElse(je.jobId, 0L) / 1e3}%8.3fs  $desc"
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val si = sc.stageInfo
          val wall = for {
            s <- si.submissionTime; c <- si.completionTime
          } yield (c - s) / 1e3
          lines += f"    stage ${si.stageId}%3d wall=${wall.getOrElse(-1.0)}%7.3fs " +
            f"tasks=${si.numTasks}%3d ${si.details.linesIterator.toSeq.drop(1).headOption.getOrElse("").trim.take(80)}"
        }
    })
    // stall detector: every 250 ms, if a job has been running ≥ 0.75 s with
    // no task activity recently, dump RUNNABLE non-JIT thread frames
    val lastEvent = new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskStart(ts: SparkListenerTaskStart): Unit =
        lastEvent.set(System.nanoTime())
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        lastEvent.set(System.nanoTime())
    })
    val sampler = new Thread(() => {
      while (true) {
        Thread.sleep(250)
        if ((System.nanoTime() - lastEvent.get()) / 1e9 > 0.75) {
          import scala.jdk.CollectionConverters._
          val stacks = Thread.getAllStackTraces.asScala
          for ((t, st) <- stacks if t.getState == Thread.State.RUNNABLE &&
               !t.getName.contains("sampler") && st.nonEmpty) {
            val frames = st.take(6).map(f => s"${f.getClassName}.${f.getMethodName}")
              .filter(f => !f.startsWith("java.") && !f.startsWith("jdk.") &&
                !f.startsWith("sun."))
            if (frames.nonEmpty)
              println(s"STALL [${t.getName}] " + frames.take(3).mkString(" <- "))
          }
          lastEvent.set(System.nanoTime()) // rate-limit
        }
      }
    }, "sampler")
    sampler.setDaemon(true)
    sampler.start()
    val fn = SparkEntry.queries(name)
    def run(tag: String): Unit = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"== $tag total ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    run("warmup")
    jobs.clear(); lines.clear()
    run("timed")
    Thread.sleep(500)
    lines.foreach(println)
    spark.stop()
  }
}
