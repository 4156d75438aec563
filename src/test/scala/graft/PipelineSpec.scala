package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators._

/** End-to-end training-data pipeline over the real testdata: quality
  * filter → exact dedup → MinHash near-dedup → deterministic
  * train/test split → token-budget packing — the composition a user
  * of the reference would run as their curation job. Asserts the
  * cross-operator invariants (monotone shrinkage, split/pack
  * determinism, no id invented or duplicated) rather than any single
  * operator's math, which the per-operator specs and oracles own. */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("curation pipeline composes: filter → dedup → near-dedup → split → pack") {
    val docs = Tables.load(spark, dir, "documents")
    val n0 = docs.count()

    // 1. quality gate: token-count band over the scan-stage features
    // (the full Gopher composite drops ALL of this synthetic corpus —
    // by design; its thresholds expect natural text, pinned in q91)
    val quality = TextAnalysis.qualityFeatures(docs, "text")
      .filter(col("n_tokens") >= 5)
      .select(docs.columns.map(col).toIndexedSeq: _*)
    val n1 = quality.count()
    assert(n1 > 0 && n1 <= n0, s"quality kept $n1 of $n0")

    // 2. exact dedup on normalized text
    val exact = Dedup.exact(quality.withColumn("_k", md5(col("text"))), Seq("_k"))
      .drop("_k")
    val n2 = exact.count()
    assert(n2 > 0 && n2 <= n1)

    // 3. MinHash near-dedup survivors
    val pairs = Dedup.minHashDupPairs(exact, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.7)
      .select("id_a", "id_b")
    val survivors = Dedup.nearDupSurvivors(exact, "doc_id", pairs)
    val n3 = survivors.count()
    assert(n3 > 0 && n3 <= n2)

    // 4. deterministic split: disjoint, covering, stable
    val (train, test) = {
      val t = Sampling.splitTrainTest(survivors, "text", 0.9)
      (t._1, t._2)
    }
    val nTrain = train.count(); val nTest = test.count()
    assert(nTrain + nTest == n3, "split must partition the survivors")
    assert(train.select("doc_id").intersect(test.select("doc_id")).count() == 0)

    // 5. pack the train side into token budgets; every doc packed once
    val packed = Sampling.packByTokenBudget(
      train, "text", "n_chars", budget = 8192, shards = 4, idCol = "doc_id")
    assert(packed.count() == nTrain)
    assert(packed.select("doc_id").distinct().count() == nTrain)
    // offsets stay inside the budget
    assert(packed.filter(col("pack_tokens_before") >= 8192 ||
      col("pack_tokens_before") < 0).count() == 0)

    // no stage invents ids: the packed set is a subset of the corpus
    assert(packed.select("doc_id").except(docs.select("doc_id")).count() == 0)

    // determinism: re-running the whole pipeline yields the same packs
    val again = Sampling.packByTokenBudget(
      Sampling.splitTrainTest(
        Dedup.nearDupSurvivors(exact, "doc_id", pairs), "text", 0.9)._1,
      "text", "n_chars", budget = 8192, shards = 4, idCol = "doc_id")
    val a = packed.select("doc_id", "shard", "pack").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = again.select("doc_id", "shard", "pack").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b, "pipeline must be deterministic end-to-end")
  }
}
