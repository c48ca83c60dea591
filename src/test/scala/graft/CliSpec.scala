package graft

class CliSpec extends SparkSpec {

  test("cli contributions writes the partitioned status×osm_type layout") {
    val out = java.nio.file.Files.createTempDirectory("graft-cli").toString
    Cli.main(Array("contributions", sfDir, out))
    val back = spark.read.parquet(out)
    assert(back.count() > 0)
    assert(back.columns.contains("contrib_type"))
    val parts = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("status="))
    // deleted rows (visible=false) keep their own partition — they must not
    // be mislabeled 'latest' when valid_to is null
    assert(parts.toSet === Set("status=latest", "status=history", "status=deleted"))
    import org.apache.spark.sql.functions.col
    assert(back.filter(col("status") === "deleted").count() > 0)
  }

  test("cli changesets and replication write plain parquet") {
    val o1 = java.nio.file.Files.createTempDirectory("graft-cli").toString
    val o2 = java.nio.file.Files.createTempDirectory("graft-cli").toString
    Cli.main(Array("changesets", sfDir, o1))
    Cli.main(Array("replication", sfDir, o2))
    assert(spark.read.parquet(o1).count() > 0)
    assert(spark.read.parquet(o2).count() > 0)
  }
}
