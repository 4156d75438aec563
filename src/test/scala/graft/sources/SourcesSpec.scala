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

  test("urlCsv: RFC-4180 quoted fields parse without column shift") {
    Files.writeString(Paths.get(fixtureDir, "q.csv"),
      "k,v\n1,\"a, b\"\n2,\"say \"\"hi\"\", ok\"\n3,plain\n")
    val df = Sources.urlCsv(spark, s"file://$fixtureDir/q.csv",
      Some("k Int32, v String"))
    val rows = df.select("k", "v").orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(rows.toSeq == Seq((1, "a, b"), (2, "say \"hi\", ok"), (3, "plain")))
  }

  test("parquet over http round-trips byte-identical to a direct read") {
    val port = StaticHttp.serve("/root/testdata/sf0.001")
    val viaHttp = HttpParquet.read(spark,
      s"http://127.0.0.1:$port/nation.parquet")
    val direct = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    // same schema (modulo nullability) and same rows
    assert(viaHttp.drop("_path", "_file").schema.map(f => (f.name, f.dataType)) ==
      direct.schema.map(f => (f.name, f.dataType)))
    val a = viaHttp.drop("_path", "_file").collect().map(_.toSeq).sortBy(_.toString)
    val b = direct.collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
    // virtual columns carry the source object like the file-backed scans
    assert(viaHttp.select("_file").distinct().collect().map(_.getString(0)).toSeq ==
      Seq("nation.parquet"))
  }

  test("parquet over http decodes timestamps/doubles identically to a direct read") {
    val port = StaticHttp.serve("/root/testdata/sf0.001")
    val viaHttp = HttpParquet.read(spark, s"http://127.0.0.1:$port/orders.parquet")
      .drop("_path", "_file")
    val direct = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    assert(viaHttp.schema.map(f => (f.name, f.dataType)) ==
      direct.schema.map(f => (f.name, f.dataType)))
    val a = viaHttp.collect().map(_.toSeq).sortBy(_.toString)
    val b = direct.collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("parquet over http distributes one URL per task and honors globs") {
    Files.copy(Paths.get("/root/testdata/sf0.001/nation.parquet"),
      Paths.get(fixtureDir, "n_0.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Files.copy(Paths.get("/root/testdata/sf0.001/nation.parquet"),
      Paths.get(fixtureDir, "n_1.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val port = StaticHttp.serve(fixtureDir)
    val df = HttpParquet.read(spark, s"http://127.0.0.1:$port/n_{0..1}.parquet")
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 50) // 25 nations per object
    assert(df.select("_file").distinct().count() == 2)
  }

  test("urlJson parses JSONEachRow with schema and with inference") {
    Files.writeString(Paths.get(fixtureDir, "j.jsonl"),
      "{\"k\": 1, \"v\": \"x\"}\n{\"k\": 2, \"v\": \"y, z\"}\n")
    val explicit = Sources.urlJson(spark, s"file://$fixtureDir/j.jsonl",
      Some("k Int64, v String"))
    assert(explicit.select("k", "v", "_file").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((1L, "x", "j.jsonl"), (2L, "y, z", "j.jsonl")))
    val inferred = Sources.urlJson(spark, s"file://$fixtureDir/j.jsonl")
    assert(inferred.select("k").orderBy("k").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L))
  }

  test("urlCsv parses the TabSeparated family with a tab separator") {
    Files.writeString(Paths.get(fixtureDir, "t.tsv"), "k\tv\n1\ta,b\n2\tc\n")
    val df = Sources.urlCsv(spark, s"file://$fixtureDir/t.tsv",
      Some("k Int32, v String"), withNames = true, sep = "\t")
    assert(df.select("k", "v").orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a,b"), (2, "c")))
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

  test("urlCsv refuses a file whose header reorders the declared columns") {
    val p = java.nio.file.Paths.get(fixtureDir, "reordered.csv")
    java.nio.file.Files.writeString(p, "v,k\nx,1\ny,2\n")
    val e = intercept[org.apache.spark.SparkException] {
      Sources.urlCsv(spark, s"file://$fixtureDir/reordered.csv",
        Some("k Int64, v String")).collect()
    }
    assert(e.getMessage.contains("header order") ||
      Option(e.getCause).exists(_.getMessage.contains("header order")))
  }

  test("inferred duplicate header names dedup instead of failing analysis") {
    val p = java.nio.file.Paths.get(fixtureDir, "dup_header.csv")
    java.nio.file.Files.writeString(p, "id,id,value\n1,2,a\n3,4,b\n")
    val df = Sources.urlCsv(spark, s"file://$fixtureDir/dup_header.csv", None)
    assert(df.columns.count(_.startsWith("id")) == 2)
    assert(df.columns.distinct.length == df.columns.length)
    assert(df.count() == 2)
  }

  test("writeCsv round-trips RFC-4180 quoted fields through the package readers") {
    val spark2 = spark
    import spark2.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_csv_rt").toString
    val df = Seq((1L, "he said \"hi\", twice"), (2L, "plain")).toDF("k", "v")
    Sinks.writeCsv(df.coalesce(1), s"$out/t")
    val back = Sources.csv(spark, s"$out/t/*.csv", Some("k Int64, v String"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == Set((1L, "he said \"hi\", twice"), (2L, "plain")))
  }
}
