package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus =
    (0 until 400)
      .map(i => (i.toLong, s"doc text number $i payload", if (i % 3 == 0) "en" else "de"))
      .toDF("id", "text", "lang")

  test("hexThreshold: fixed width, monotone, exact at power-of-two fractions") {
    assert(Sampling.hexThreshold(0.25) == "400000")
    assert(Sampling.hexThreshold(0.5) == "800000")
    assert(Sampling.hexThreshold(0.0) == "000000")
    // fraction 1 must sort above every 6-digit bucket
    assert(Sampling.hexThreshold(1.0) > "ffffff")
    assert(Sampling.hexThreshold(0.2) == "333333")
  }

  test("hashSample is deterministic and independent of partitioning") {
    val a = Sampling.hashSample(corpus, "text", 0.3).select("id").as[Long].collect().sorted
    val b = Sampling.hashSample(corpus.repartition(7), "text", 0.3)
      .select("id").as[Long].collect().sorted
    assert(a.sameElements(b))
    assert(a.nonEmpty && a.length < 400)
    // rate lands near the target (24-bit hash, 400 keys: loose band)
    assert(math.abs(a.length / 400.0 - 0.3) < 0.1)
  }

  test("splitTrainTest partitions the input: disjoint and exhaustive") {
    val (train, test0) = Sampling.splitTrainTest(corpus, "text", 0.2)
    val tr = train.select("id").as[Long].collect().toSet
    val te = test0.select("id").as[Long].collect().toSet
    assert((tr & te).isEmpty)
    assert((tr | te).size == 400)
  }

  test("mixture equals per-group hashSample union") {
    val mixed = Sampling.mixture(corpus, "lang", "text",
      Map("en" -> 0.6), defaultFraction = 0.1)
      .select("id").as[Long].collect().toSet
    val manual =
      Sampling.hashSample(corpus.filter($"lang" === "en"), "text", 0.6)
        .select("id").as[Long].collect().toSet ++
      Sampling.hashSample(corpus.filter($"lang" =!= "en"), "text", 0.1)
        .select("id").as[Long].collect().toSet
    assert(mixed == manual)
  }

  test("mixture filter is scan-stage: no exchange before the filter") {
    val plan = Sampling.mixture(corpus, "lang", "text", Map("en" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("stratifiedSample: exact quotas, deterministic, partition-independent") {
    val a = Sampling.stratifiedSample(corpus, "lang", "text", 7, "id")
    val byLang = a.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang == Map("en" -> 7L, "de" -> 7L)) // exact, not in expectation
    val ids1 = a.select("id").as[Long].collect().sorted
    val ids2 = Sampling.stratifiedSample(corpus.repartition(13), "lang", "text", 7, "id")
      .select("id").as[Long].collect().sorted
    assert(ids1.sameElements(ids2))
    // a quota above the group size keeps the whole group
    val all = Sampling.stratifiedSample(corpus, "lang", "text", 1000, "id")
    assert(all.count() == 400)
  }

  test("shuffleShards: dense per-shard positions, deterministic, covers input") {
    val s = Sampling.shuffleShards(corpus, "text", shards = 8, idCol = "id")
    assert(s.count() == 400)
    // every shard's positions are 0..count-1 (dense, no gaps)
    val perShard = s.groupBy("shard")
      .agg(count(lit(1)).as("n"), max($"pos").as("mx"), min($"pos").as("mn"))
      .as[(Int, Long, Long, Long)].collect()
    assert(perShard.map(_._1).toSet.subsetOf((0 until 8).toSet))
    perShard.foreach { case (_, n, mx, mn) => assert(mn == 0L && mx == n - 1) }
    // deterministic across partitionings: same (id → shard, pos)
    val m1 = s.select("id", "shard", "pos").as[(Long, Int, Long)].collect().toSet
    val m2 = Sampling.shuffleShards(corpus.repartition(11), "text", shards = 8, idCol = "id")
      .select("id", "shard", "pos").as[(Long, Int, Long)].collect().toSet
    assert(m1 == m2)
    // the order is a real shuffle: per-shard pos order differs from id order
    val shard0 = m1.filter(_._2 == perShard.head._1).toSeq.sortBy(_._3).map(_._1)
    assert(shard0 != shard0.sorted)
  }

  test("packByTokenBudget: packs fill cumulatively, deterministic, bounded straddle") {
    val docs = corpus.withColumn("tok", (length($"text") % lit(50)) + 1)
    val p = Sampling.packByTokenBudget(docs, "text", "tok",
      budget = 120, shards = 4, idCol = "id")
    assert(p.count() == 400)
    // within a (shard, pack): offsets start where the previous row ended
    // (cumulative fill) and stay under budget
    val rows = p.select($"shard", $"pack", $"pack_tokens_before", $"tok".cast("long"))
      .as[(Int, Long, Long, Long)].collect()
    rows.foreach { case (_, pk, before, _) =>
      assert(pk >= 0 && before >= 0 && before < 120) }
    // pack ids are dense per shard and total tokens per pack stay within
    // budget + max single doc (the bounded straddle)
    rows.groupBy(r => (r._1, r._2)).foreach { case ((_, pk), rs) =>
      val total = rs.map(_._4).sum
      assert(total <= 120 + 50, s"pack $pk holds $total tokens") }
    // deterministic across partitionings
    val p2 = Sampling.packByTokenBudget(docs.repartition(7), "text", "tok",
      budget = 120, shards = 4, idCol = "id")
      .select($"id", $"shard", $"pack", $"pack_tokens_before")
      .as[(Long, Int, Long, Long)].collect().toSet
    val p1 = p.select($"id", $"shard", $"pack", $"pack_tokens_before")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(p1 == p2)
  }
}
