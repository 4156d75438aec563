package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("token count is whitespace-robust") {
    import spark.implicits._
    val rows = Seq("a b c", "  a   b  ", "", "one").toDF("text")
      .select(TextAnalysis.tokenCount(col("text")).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(rows == Seq(3, 2, 0, 1))
  }

  test("subword count splits long words and punctuation") {
    import spark.implicits._
    val n = Seq("internationalization 123456!").toDF("text")
      .select(TextAnalysis.subwordCount(col("text")).as("n"))
      .collect().head.getInt(0)
    // internationalization → 5 chunks of ≤4, 123456 → 2 chunks, ! → 1
    assert(n == 8)
  }

  test("fingerprint is order-sensitive and deterministic") {
    import spark.implicits._
    val fps = Seq("alpha beta gamma", "gamma beta alpha", "alpha beta gamma")
      .toDF("text").select(TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(_.getLong(0)).toSeq
    assert(fps(0) == fps(2))
    assert(fps(0) != fps(1))
    assert(fps.forall(f => f >= 0 && f < 2147483647L))
  }

  test("langId picks the language with most stopword hits, ties deterministic") {
    import spark.implicits._
    val df = Seq(
      (0L, "the cat and the dog went to the park"),
      (1L, "der Hund und die Katze das ist gut"),
      (2L, "xyz qrs tuv")).toDF("doc_id", "text")
    val out = TextAnalysis.langId(df, "text")
      .select("doc_id", "lang_pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == "en")
    assert(out(1L) == "de")
    assert(out(2L) == "de") // zero hits everywhere → first language in sorted order
  }

  test("quality features are integer-exact") {
    import spark.implicits._
    val r = TextAnalysis.qualityFeatures(
        Seq((0L, "Hello, World! 42")).toDF("doc_id", "text"), "text")
      .select("n_chars_m", "n_tokens", "n_punct", "n_digits", "n_upper")
      .collect().head
    assert(r.getInt(0) == 16)
    assert(r.getInt(1) == 3)
    assert(r.getInt(2) == 2) // , and !
    assert(r.getInt(3) == 2) // 4 2
    assert(r.getInt(4) == 2) // H W
  }

  test("multimodal: metadata-only stats never read payload (pruning)") {
    import spark.implicits._
    val media = Multimodal.fromText(
      Seq((0L, "abc"), (1L, "defgh")).toDF("doc_id", "text"), "doc_id", "text")
    val stats = Multimodal.metaStats(media).collect().head
    assert(stats.getAs[String]("kind") == "image")
    assert(stats.getAs[Long]("n_media") == 2L)
    assert(stats.getAs[Long]("total_bytes") == 8L)
  }

  test("multimodal: resize keeps the byte-volume contract") {
    import spark.implicits._
    val media = Multimodal.fromText(
      Seq((0L, "abcdefghij")).toDF("doc_id", "text"), "doc_id", "text")
    val resized = Multimodal.resize(spark, media, w = 4, h = 2).collect().head
    assert(resized.getAs[Array[Byte]]("payload").length == 8)
    assert(resized.getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("width") == 4)
    // deterministic
    val again = Multimodal.resize(spark, media, w = 4, h = 2).collect().head
    assert(resized.getAs[Array[Byte]]("payload").toSeq ==
      again.getAs[Array[Byte]]("payload").toSeq)
  }

  test("multimodal: frame sampling strides through payload stripes") {
    import spark.implicits._
    val media = Multimodal.fromText(
      Seq((0L, "0123456789AB")).toDF("doc_id", "text"), "doc_id", "text")
    // 12 bytes → 3 frames of 4; stride 2 keeps frames 0 and 2
    val frames = Multimodal.sampleFrames(media, frameBytes = 4, stride = 2)
      .orderBy("frame_idx").collect()
    assert(frames.length == 2)
    assert(new String(frames(0).getAs[Array[Byte]]("frame_bytes")) == "0123")
    assert(new String(frames(1).getAs[Array[Byte]]("frame_bytes")) == "89AB")
  }

  test("multimodal: batch feature extraction shapes and determinism") {
    import spark.implicits._
    val media = Multimodal.fromText(
      Seq((0L, "abc"), (1L, "defgh")).toDF("doc_id", "text"), "doc_id", "text")
    val feats = Multimodal.extractFeatures(spark, media, dim = 4)
      .orderBy("media_id").collect()
    assert(feats.length == 2)
    assert(feats(0).getAs[Long]("n_bytes") == 3L)
    assert(feats(0).getAs[scala.collection.Seq[Double]]("feature").length == 4)
    // deterministic across runs
    val again = Multimodal.extractFeatures(spark, media, dim = 4)
      .orderBy("media_id").collect()
    assert(feats.map(_.getLong(2)).toSeq == again.map(_.getLong(2)).toSeq)
  }

  test("word repetition features count total vs distinct words") {
    import spark.implicits._
    val r = TextAnalysis.wordRepetitionFeatures(
        Seq("a b a b a", "x y z").toDF("text"), "text")
      .select("n_words", "n_distinct_words").collect()
    assert(r(0).getLong(0) == 5L && r(0).getLong(1) == 2L)
    assert(r(1).getLong(0) == 3L && r(1).getLong(1) == 3L)
  }

  test("top n-gram stats find the most repeated bigram") {
    import spark.implicits._
    // "a b" appears 3x among 6 bigrams
    val df = Seq((1L, "a b a b a b c")).toDF("id", "text")
    val r = TextAnalysis.topNgramStats(df, "id", "text", n = 2).collect().head
    assert(r.getAs[Long]("n_ngrams") == 6L)
    assert(r.getAs[Long]("top_count") == 3L)
    // unigram path
    val u = TextAnalysis.topNgramStats(df, "id", "text", n = 1).collect().head
    assert(u.getAs[Long]("n_ngrams") == 7L)
    assert(u.getAs[Long]("top_count") == 3L) // 'a' and 'b' both 3x
  }

  test("pii stats and scrub: emails, ips, phones") {
    import spark.implicits._
    val df = Seq(
      "mail bob.smith+x@corp.example.org and 192.168.0.1 call +4915112345678",
      "no pii here").toDF("text")
    val s = TextAnalysis.piiStats(df, "text")
      .select("n_emails", "n_ipv4", "n_phones").collect()
    assert(s(0).getLong(0) == 1L && s(0).getLong(1) == 1L && s(0).getLong(2) == 1L)
    assert(s(1).getLong(0) == 0L && s(1).getLong(1) == 0L && s(1).getLong(2) == 0L)
    val scrubbed = df.select(TextAnalysis.piiScrub(col("text")).as("t"))
      .collect().map(_.getString(0))
    assert(scrubbed(0) == "mail <EMAIL> and <IP> call <PHONE>")
    assert(scrubbed(1) == "no pii here")
  }
}
