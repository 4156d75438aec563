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

  test("gopher filter flags each rule independently") {
    import spark.implicits._
    val t = TextAnalysis.GopherThresholds(
      minWords = 3, maxWords = 10, minMeanWordLen = 2.0, maxMeanWordLen = 6.0,
      maxDigitFraction = 0.5, minStopwordHits = 1, maxDupWordFraction = 0.5)
    val df = Seq(
      (1L, "the quick brown fox runs"), // passes everything
      (2L, "of a"), // too few words
      (3L, "the x y z w q"), // mean word len 1.5 < 2
      (4L, "the 11 22 33 44 55 66"), // digits 12/7 words > 0.5
      (5L, "lorem ipsum dolor sit amet"), // no stopword hit
      (6L, "the the the the dog dog") // dup fraction 4/6 > 0.5
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherFilter(df, "text", t).orderBy("doc_id")
      .select("keep", "ok_n_words", "ok_mean_word_len", "ok_digit_fraction",
        "ok_stopwords", "ok_dup_words")
      .collect().map(r => (0 until 6).map(r.getBoolean))
    assert(out(0).forall(identity))
    assert(!out(1)(1) && !out(1)(0)) // words rule fails → keep false
    assert(!out(2)(2))
    assert(!out(3)(3))
    assert(!out(4)(4))
    assert(!out(5)(5))
  }

  test("unigram logprob scores common-word docs higher") {
    import spark.implicits._
    val df = Seq(
      (1L, "aa aa aa aa"), // all high-frequency words
      (2L, "aa aa aa zz") // one rare word
    ).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 4L && out(2L)._1 == 4L)
    // p(aa)=7/8, p(zz)=1/8: doc 1 = 4·ln(7/8), doc 2 = 3·ln(7/8)+ln(1/8)
    assert(math.abs(out(1L)._2 - 4 * math.log(7.0 / 8)) < 1e-9)
    assert(math.abs(out(2L)._2 - (3 * math.log(7.0 / 8) + math.log(1.0 / 8))) < 1e-9)
    assert(out(1L)._2 > out(2L)._2)
  }

  test("token budget bins pack contiguously per shard") {
    import spark.implicits._
    // 1 shard; docs of 3 tokens each; budget 6 → bins of two docs
    val df = (0L until 6L).map(i => (i, "w w w")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenBudgetBins(df, "doc_id", "text", budget = 6, shards = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(out.map(_._4).toSeq == Seq(0L, 0L, 1L, 1L, 2L, 2L))
    // sharding keeps ids with different residues in separate running sums
    val sharded = TextAnalysis.tokenBudgetBins(df, "doc_id", "text", budget = 6, shards = 2)
      .orderBy("doc_id").collect().map(r => (r.getInt(2), r.getLong(3)))
    assert(sharded.toSeq == Seq((0, 0L), (1, 0L), (0, 0L), (1, 0L), (0, 1L), (1, 1L)))
  }

  test("chunkTokens: overlapping windows cover every token, tail may be short") {
    import spark.implicits._
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(df, "doc_id", "text", win = 4, stride = 3)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    // starts 1,4,7,10 → last chunk is the single trailing token
    assert(out.map(_._2).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10"))
    assert(out.map(_._3).toSeq == Seq(4L, 4L, 4L, 1L))
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("chunkTokens: empty and whitespace-only docs yield no chunks") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "   "), (3L, "one")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(df, "doc_id", "text", win = 8, stride = 8)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(out.toSeq == Seq((3L, "one")))
  }

  test("chunkTokens is scan-stage: zero exchanges") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val plan = TextAnalysis.chunkTokens(df, "doc_id", "text", 4, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
