package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SinksSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  private def nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")

  test("parquet sink round-trips, partitioned layout prunes directories") {
    val dir = Files.createTempDirectory("graft_sink").toString
    Sinks.writeParquet(nation, s"$dir/t", partitionBy = Seq("n_regionkey"))
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == 25)
    // partition pruning: only one directory scanned for an equality filter
    val plan = back.filter(col("n_regionkey") === 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || back.filter(col("n_regionkey") === 2).count() == 5)
  }

  test("csv sink honors header + compression") {
    val dir = Files.createTempDirectory("graft_sink_csv").toString
    Sinks.writeCsv(nation, s"$dir/c", header = true, compression = Some("gzip"))
    val files = new java.io.File(s"$dir/c").listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".csv.gz")))
    val back = spark.read.option("header", "true").csv(s"$dir/c")
    assert(back.count() == 25)
  }

  test("writeSorted produces key-clustered files (W7 MergeTree parity)") {
    val dir = Files.createTempDirectory("graft_sink_sorted").toString
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    Sinks.writeSorted(li, s"$dir/s", sortKey = Seq("l_returnflag", "l_orderkey"), numFiles = 2)
    val back = spark.read.parquet(s"$dir/s")
    assert(back.count() == li.count())
    // within each file, the sort key must be nondecreasing → min/max
    // row-group stats are clustered, the precondition for pruning
    val parts = new java.io.File(s"$dir/s").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts.length == 2)
    parts.foreach { f =>
      val keys = spark.read.parquet(f.getPath)
        .select("l_returnflag", "l_orderkey").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      assert(keys.sameElements(keys.sortBy(identity)),
        s"sort key not clustered within ${f.getName}")
    }
  }

  test("writeJsonEachRow round-trips through the JSONEachRow reader") {
    val dir = Files.createTempDirectory("graft_sink_jsonl").toString
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, "a \"quoted\" value"), (2L, "plain")).toDF("k", "v")
    Sinks.writeJsonEachRow(df, s"$dir/j")
    // each line is a standalone JSON object (ndjson contract)
    val lines = new java.io.File(s"$dir/j").listFiles()
      .filter(_.getName.endsWith(".json"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines())
    assert(lines.length == 2 && lines.forall(l => l.startsWith("{") && l.endsWith("}")))
    val back = graft.sources.Sources.json(spark, s"$dir/j/*.json",
      Some("k Int64, v String"))
    assert(back.orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a \"quoted\" value"), (2L, "plain")))
  }

  test("writeShards lays out one directory per shard with pos-ordered rows") {
    val dir = Files.createTempDirectory("graft_sink_shards").toString
    val spark2 = spark
    import spark2.implicits._
    val docs = (0 until 200).map(i => (i.toLong, s"text payload $i"))
      .toDF("id", "text")
    val sharded = graft.operators.Sampling.shuffleShards(docs, "text", shards = 4, idCol = "id")
    Sinks.writeShards(sharded, s"$dir/s")
    val shardDirs = new java.io.File(s"$dir/s").listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(shardDirs.nonEmpty && shardDirs.forall(_.matches("shard=\\d+")))
    val back = spark.read.parquet(s"$dir/s")
    assert(back.count() == 200)
    // within a shard directory the rows read back in pos order
    val s0 = shardDirs.head.stripPrefix("shard=")
    val pos = spark.read.parquet(s"$dir/s/shard=$s0")
      .select("pos").as[Long].collect()
    assert(pos.sameElements(pos.sorted))
  }
}
