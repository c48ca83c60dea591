package graft

/** Plan audit: dumps `.explain("formatted")` for every SparkEntry query so
  * pushdown (PushedFilters/ReadSchema), broadcast joins, and
  * WholeStageCodegen coverage can be reviewed per operator.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "/tmp/plans.txt"
    val spark = GraftSession.builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Dev-only: a third arg restricts the dump to a comma-separated key
    // subset (the Verify/Bench SPARK_GRAFT_ONLY convention).
    val only = if (args.length > 2) Some(args(2).split(",").toSet) else None
    val sb = new StringBuilder
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      sb.append(s"\n================ $name ================\n")
      try sb.append(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => sb.append(s"ERROR: ${e.getMessage}\n") }
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
