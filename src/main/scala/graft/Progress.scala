package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Run-progress reporting — the reference's per-step console progress
  * (util/Progress.java stepped per entity, displayed through a progress
  * bar in Contributions2Parquet.java:227). A Spark job already meters
  * every stage, so the Spark-native face is a listener: one line per
  * completed stage with task count, records in/out, elapsed time and
  * input rate, printed to stderr where it cannot contaminate stdout
  * contracts (the bench JSON line, CLI row output).
  *
  * Registered by [[Cli]] for every command (disable with
  * SPARK_GRAFT_PROGRESS=0); library callers can add it to any session
  * via `spark.sparkContext.addSparkListener(new Progress())`.
  */
final class Progress(out: String => Unit = s => Console.err.println(s))
    extends SparkListener {

  override def onStageCompleted(done: SparkListenerStageCompleted): Unit = {
    val si = done.stageInfo
    val secs = (for { s <- si.submissionTime; c <- si.completionTime }
      yield (c - s) / 1000.0).getOrElse(0.0)
    val m = si.taskMetrics
    val in = m.inputMetrics.recordsRead + m.shuffleReadMetrics.recordsRead
    val written = m.outputMetrics.recordsWritten + m.shuffleWriteMetrics.recordsWritten
    val rate = if (secs > 0 && in > 0) f" (${in / secs}%,.0f rec/s)" else ""
    out(f"[progress] stage ${si.stageId} '${si.name.takeWhile(_ != ' ')}' " +
      f"tasks=${si.numTasks} in=$in out=$written ${secs}%.1fs$rate")
  }
}
