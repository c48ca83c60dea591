package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Diagnostic: per-query Spark job / stage / task counts — the fixed-cost
  * profile of the bench surface. At small scale every job submission and
  * stage barrier costs ~0.1-0.2 s of scheduler/AQE overhead, so a query's
  * wall time is largely `jobs × barrier + stages × replan`; this audit
  * finds the keys whose job count (not their compute) is the bill.
  * Usage: JobAudit <sfDir> <outFile> [onlyCsv]
  */
object JobAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/jobaudit.txt"
    val only = if (args.length > 2) Some(args(2).split(",").toSet) else None
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.enableReliableArtifacts(spark)
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val shuffleWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        shuffleWrite.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten); ()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = { tasks.incrementAndGet(); () }
    })
    val sb = new StringBuilder
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        jobs.set(0); stages.set(0); tasks.set(0); shuffleWrite.set(0)
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          // listener events are async; give the bus a moment to drain
          Thread.sleep(100)
          val dt = (System.nanoTime() - t0) / 1e9
          sb.append(f"$name%-24s jobs=${jobs.get}%4d stages=${stages.get}%4d " +
            f"tasks=${tasks.get}%5d shufMB=${shuffleWrite.get / 1e6}%8.1f t=$dt%6.2f\n")
        } catch { case e: Throwable => sb.append(s"$name ERROR ${e.getMessage}\n") }
        GraftSession.releaseStorage(spark)
      }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(sb.toString)
    spark.stop()
  }
}
