package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language ID, document fingerprinting. All pure
  * column expressions (codegen'd, no UDFs) — at 100 TB these run inside
  * the scan stage with zero extra shuffles.
  */
object TextAnalysis {

  /** Token count via `\S+` runs — robust to repeated/leading whitespace
    * (deterministic across engines, unlike split-on-space). */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\S+"), lit(0)))

  /** BPE-ish subword count: word-piece regex that splits words, numbers,
    * and punctuation runs separately (a cheap stand-in for a real BPE
    * vocab — the Spark-side plumbing is what matters at scale). */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("[A-Za-z]{1,4}|[0-9]{1,3}|[^A-Za-z0-9\\s]"), lit(0)))

  /** Per-document quality features (integer-exact where possible so the
    * oracle comparison is float-free). */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_chars_m", length(col(textCol)))
      .withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("n_punct",
        size(regexp_extract_all(col(textCol), lit("[.,;:!?]"), lit(0))))
      .withColumn("n_digits",
        size(regexp_extract_all(col(textCol), lit("[0-9]"), lit(0))))
      .withColumn("n_upper",
        size(regexp_extract_all(col(textCol), lit("[A-Z]"), lit(0))))

  /** Language-ID heuristic: score each candidate language by stopword
    * hits and pick the argmax (fixed language order breaks ties
    * deterministically). Word lists are tiny and inlined — the point is
    * the scan-stage mechanism, which at scale would load a real n-gram
    * profile per language. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "et", "est", "un"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langScore(text: Column, words: Seq[String]): Column = {
    val pattern = words.map(java.util.regex.Pattern.quote)
      .mkString("(?:^|\\s)(?:", "|", ")(?:\\s|$)")
    size(regexp_extract_all(text, lit(pattern), lit(0)))
  }

  /** Predicted language code + its score. */
  def langId(df: DataFrame, textCol: String): DataFrame = {
    val langs = stopwords.keys.toSeq.sorted
    val scored = langs.foldLeft(df) { (d, lg) =>
      d.withColumn(s"_score_$lg", langScore(col(textCol), stopwords(lg)))
    }
    val best = langs.tail.foldLeft(
      struct(col(s"_score_${langs.head}").as("score"), lit(langs.head).as("lang"))) {
      (acc, lg) =>
        when(col(s"_score_$lg") > acc.getField("score"),
          struct(col(s"_score_$lg").as("score"), lit(lg).as("lang"))).otherwise(acc)
    }
    scored
      .withColumn("lang_pred", best.getField("lang"))
      .withColumn("lang_score", best.getField("score"))
      .drop(langs.map(lg => s"_score_$lg"): _*)
  }

  /** Rolling polynomial fingerprint of the token sequence:
    * fp = Σ token_hash_i · B^(n-1-i)  (mod p). Order-sensitive (unlike a
    * bag-of-words hash), computed in one `aggregate` pass. Modular
    * arithmetic keeps every intermediate < 2^52, so the expression is
    * ANSI-mode safe (Spark 4 default) — no silent wraps, no overflow
    * errors. */
  def fingerprint(text: Column): Column = {
    val p = 2147483647L // 2^31 - 1
    val b = 1000003L
    val tokens = regexp_extract_all(text, lit("\\S+"), lit(0))
    aggregate(tokens, lit(0L),
      (acc, t) => pmod(acc * b + pmod(xxhash64(t), lit(p)), lit(p)))
  }

  /** Engine-portable fingerprint: same rolling polynomial but over the
    * md5-derived 60-bit token hash ([[Dedup.md5Hash60]]), reproducible
    * in the DuckDB oracle via `list_reduce`. xxhash-based
    * [[fingerprint]] stays the production default (cheaper per token). */
  def fingerprintPortable(text: Column): Column = {
    val p = 2147483647L
    val b = 1000003L
    val tokens = regexp_extract_all(text, lit("\\S+"), lit(0))
    aggregate(tokens, lit(0L),
      (acc, t) => pmod(acc * b + pmod(Dedup.md5Hash60(t), lit(p)), lit(p)))
  }
}
