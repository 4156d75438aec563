package graft.sources

import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("graft_src_fix").toString
    Files.writeString(Paths.get(dir, "a_0.csv"), "k,v\n1,x\n2,y\n")
    Files.writeString(Paths.get(dir, "a_1.csv"), "k,v\n3,z\n")
    val gz = new GZIPOutputStream(Files.newOutputStream(Paths.get(dir, "a_2.csv.gz")))
    gz.write("k,v\n4,w\n".getBytes("UTF-8")); gz.close()
    dir
  }

  test("urlCsv: multi-file fetch carries _file per row (S8 parity)") {
    val df = Sources.urlCsv(spark, s"file://$fixtureDir/a_{0,1}.csv",
      Some("k Int32, v String"))
    val rows = df.select("k", "v", "_file").orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq((1, "x", "a_0.csv"), (2, "y", "a_0.csv"), (3, "z", "a_1.csv")))
  }

  test("urlCsv: gzip decodes by extension like CH") {
    val df = Sources.urlCsv(spark, s"file://$fixtureDir/a_2.csv.gz",
      Some("k Int32, v String"))
    assert(df.select("k").collect().map(_.getInt(0)).toSeq == Seq(4))
  }

  test("urlCsv: inferred-schema path works without re-download surprises") {
    val df = Sources.urlCsv(spark, s"file://$fixtureDir/a_{0,1}.csv", None)
    assert(df.count() == 3)
    assert(df.columns.contains("_file"))
  }

  test("urlCsv: per-URL headers stripped (no data-row loss on 2nd file)") {
    // both files have the same header line; a global "drop lines equal to
    // first header" filter would be correct here, but per-file stripping
    // must also keep exactly one data row from the single-row file
    val df = Sources.urlCsv(spark, s"file://$fixtureDir/a_1.csv", Some("k Int32, v String"))
    assert(df.count() == 1)
  }

  test("urlCsv: missing URL fails the task with a clear error") {
    val e = intercept[Exception] {
      Sources.urlCsv(spark, s"file://$fixtureDir/nope.csv", Some("k Int32")).count()
    }
    assert(e.getMessage != null)
  }

  test("parquetWithFile attaches basename _file") {
    val df = Sources.parquetWithFile(spark, "/root/testdata/sf0.001/nation.parquet")
    val files = df.select("_file").distinct().collect().map(_.getString(0))
    assert(files.toSeq == Seq("nation.parquet"))
    assert(df.filter(col("_path").contains("sf0.001")).count() == df.count())
  }

  test("numeric-range glob feeds the parquet reader (S7)") {
    // single file matched through a degenerate range
    val df = Sources.parquet(spark, "/root/testdata/sf0.00{1..1}/nation.parquet")
    assert(df.count() == 25)
  }
}
