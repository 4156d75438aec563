package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the MinHash pipeline (Test/runMain
  * graft.MinhashDiag [sfDir]) — diagnostic, not shipped API. */
object MinhashDiag {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    import graft.operators.Dedup
    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text", 3, 128)
    time("signatures (materialize)") { sigs.write.format("noop").mode("overwrite").save() }
    val cand = Dedup.lshCandidates(sigs, "_id", "_sig", 32)
    val nCand = time("candidates (count)") { cand.count() }
    println(s"[diag] candidate pairs: $nCand")
    val pairs = Dedup.minHashDupPairs(docs, "doc_id", "text")
    val nPairs = time("full pipeline (count)") { pairs.count() }
    println(s"[diag] verified pairs >= 0.7: $nPairs")
    time("full pipeline (noop run 1)") {
      Dedup.minHashDupPairs(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    time("full pipeline (noop run 2)") {
      Dedup.minHashDupPairs(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
