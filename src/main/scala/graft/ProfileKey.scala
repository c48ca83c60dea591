package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

import scala.collection.concurrent.TrieMap

/** Diagnostic: per-JOB wall time + call site for one or more declared
  * keys — JobAudit tells you a key pays 34 jobs; this tells you WHICH
  * operation each job is and what it costs, so optimization aims at the
  * expensive barrier and not the cheap ones.
  * Usage: ProfileKey <sfDir> <keyCsv> [reps]
  */
object ProfileKey {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val keys = args(1).split(",").toSet
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.enableReliableArtifacts(spark)
    val starts = TrieMap[Int, (Long, String)]()
    val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val name = j.stageInfos.lastOption.map(si =>
          si.name.take(60) + " tasks=" + j.stageInfos.map(_.numTasks).sum)
          .getOrElse("?")
        starts(j.jobId) = (System.nanoTime(), name); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        starts.remove(e.jobId).foreach { case (t0, cs) =>
          log.add(f"  job ${e.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $cs")
        }; ()
      }
    })
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => keys.contains(n) }
      .foreach { case (name, fn) =>
        (1 to reps).foreach { r =>
          log.clear()
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(200)
          if (r == reps) { // print only the warmed rep
            println(f"== $name rep$r total $dt%.3f s ==")
            log.forEach(println(_))
          } else println(f"== $name rep$r total $dt%.3f s (warmup) ==")
          GraftSession.releaseStorage(spark)
        }
      }
    spark.stop()
  }
}
