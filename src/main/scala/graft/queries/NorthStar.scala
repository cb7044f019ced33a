package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

/** North-star LLM-data-pipeline queries over the `documents` / `embeddings`
  * fixtures (SURVEY §2.4): deduplication (exact / n-gram Jaccard /
  * MinHash-LSH / SimHash / embedding-cosine), similarity search (brute-force
  * + LSH ANN), text analysis (stats / lang-id / token counts /
  * fingerprints), and multimodal decode plumbing.
  *
  * Oracle notes: MinHash-LSH and SimHash output candidate pairs *verified*
  * by exact Jaccard, so at 100% recall on the fixture (measured — min pair
  * similarity 0.9 vs miss probability ≈3e-8) their results equal the exact
  * pairwise oracle. The ANN-LSH query trades recall for scan cost and has
  * no SQL twin — its recall is asserted in specs against brute force.
  */
object NorthStar {

  private val JaccardSql =
    """WITH toks AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '\w+') ts FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, len(ts)-2),
      |    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) s
      |  FROM toks WHERE len(ts) >= 3),
      |sizes AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY 1),
      |pairs AS (
      |  SELECT a.doc_id i, b.doc_id j, COUNT(*) c
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT i, j, ROUND(CAST(c AS DOUBLE)/(si.n+sj.n-c), 6) jac
      |FROM pairs JOIN sizes si ON si.doc_id=i JOIN sizes sj ON sj.doc_id=j
      |WHERE CAST(c AS DOUBLE)/(si.n+sj.n-c) >= 0.5 ORDER BY i, j""".stripMargin

  // ---- dedup family ----

  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("canonical_id"))

  val dedupExactSql: String =
    """SELECT md5(text) AS content_hash, MIN(doc_id) AS canonical_id,
      |  COUNT(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY canonical_id""".stripMargin

  def dedupJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(
        Dedup.shingles(Tables.documents(s, dir), "doc_id", "text", 3), 0.5)
      .orderBy(col("i"), col("j"))

  def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(
        Dedup.shingles(Tables.documents(s, dir), "doc_id", "text", 3),
        k = 64, r = 4, threshold = 0.5)
      .orderBy(col("i"), col("j"))

  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text",
        shingleN = 3, threshold = 0.5)
      .orderBy(col("i"), col("j"))

  /** Embedding near-dup: top-20 most-similar pairs (corpus has no pairs
    * above 0.52, so a threshold query would be empty). */
  def dedupEmbedding(s: SparkSession, dir: String): DataFrame =
    Similarity.cosinePairsTopN(Tables.embeddings(s, dir), "vec_id",
      "embedding", 20)

  val dedupEmbeddingSql: String =
    """SELECT a.vec_id AS i, b.vec_id AS j,
      |  ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
      |    / (SQRT(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
      |     * SQRT(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS cos_sim
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |ORDER BY cos_sim DESC, i, j LIMIT 20""".stripMargin

  // ---- similarity search ----

  def annBruteforce(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", 5)
      .orderBy(col("query_id"), col("rnk"))
  }

  val annBruteforceSql: String =
    """WITH scored AS (
      |  SELECT p.vec_id AS query_id, c.vec_id AS nbr_id,
      |    ROUND(list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
      |      / (SQRT(list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(p.embedding AS DOUBLE[])))
      |       * SQRT(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))), 6) AS cos_sim
      |  FROM embeddings p JOIN embeddings c ON p.vec_id < 10 AND c.vec_id != p.vec_id)
      |SELECT query_id, rnk, nbr_id, cos_sim FROM (
      |  SELECT query_id, nbr_id, cos_sim,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, nbr_id) AS rnk
      |  FROM scored)
      |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin

  /** LSH-bucketed ANN — no SQL twin (recall-trading path); specs assert
    * recall ≥ 0.9 against brute force. */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", 5)
      .orderBy(col("query_id"), col("rnk"))
  }

  // ---- text analysis ----

  def textStats(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.stats(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val textStatsSql: String =
    """SELECT doc_id, LENGTH(text) AS n_chars,
      |  len(regexp_extract_all(lower(text), '\w+')) AS n_tokens,
      |  ROUND(CAST(len(regexp_extract_all(lower(text), '\w+')) AS DOUBLE) /
      |    GREATEST(len(regexp_extract_all(text, '\S+')), 1), 6) AS tokens_per_word,
      |  ROUND(CAST(list_sum(list_transform(regexp_extract_all(lower(text), '\w+'), x -> LENGTH(x))) AS DOUBLE) /
      |    GREATEST(len(regexp_extract_all(lower(text), '\w+')), 1), 6) AS avg_token_len,
      |  ROUND(CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / GREATEST(LENGTH(text), 1), 6) AS punct_ratio,
      |  ROUND(CAST(len(regexp_extract_all(text, '\s')) AS DOUBLE) / GREATEST(LENGTH(text), 1), 6) AS space_ratio,
      |  ROUND(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / GREATEST(LENGTH(text), 1), 6) AS digit_ratio,
      |  ROUND(CAST(len(regexp_extract_all(text, '[A-Z]')) AS DOUBLE) / GREATEST(LENGTH(text), 1), 6) AS upper_ratio
      |FROM documents ORDER BY doc_id""".stripMargin

  def textLangid(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.langId(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val textLangidSql: String = {
    def score(words: Seq[String]) =
      s"len(list_filter(regexp_extract_all(lower(text), '\\w+'), x -> x IN (${
        words.map(w => s"'$w'").mkString(",")})))"
    val cases = TextAnalysis.StopwordProfiles.map { case (lang, words) =>
      (lang, score(words))
    }
    val scoreExpr = cases.tail.foldLeft(
        s"struct_pack(s := ${cases.head._2}, l := '${cases.head._1}')") {
      case (acc, (lang, sc)) =>
        s"CASE WHEN $sc > ($acc).s THEN struct_pack(s := $sc, l := '$lang') ELSE $acc END"
    }
    s"""SELECT doc_id, best.s AS lang_score,
       |  CASE WHEN best.s > 0 THEN best.l ELSE 'und' END AS lang_pred
       |FROM (SELECT doc_id, $scoreExpr AS best FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  def textTokenCount(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenCounts(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val textTokenCountSql: String =
    """SELECT doc_id,
      |  len(regexp_extract_all(text, '\S+')) AS n_ws_tokens,
      |  len(regexp_extract_all(lower(text), '\w+')) AS n_word_tokens,
      |  CAST(list_sum(list_transform(regexp_extract_all(lower(text), '\w+'),
      |    x -> CAST(CEIL(CAST(LENGTH(x) AS DOUBLE) / 4.0) AS BIGINT))) AS BIGINT) AS n_subword_est
      |FROM documents ORDER BY doc_id""".stripMargin

  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprint(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val textFingerprintSql: String =
    """SELECT doc_id, md5(text) AS raw_fp,
      |  md5(list_aggregate(regexp_extract_all(lower(text), '\w+'), 'string_agg', ' ')) AS norm_fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Winnowing sketch sizes (the sketch itself is engine-specific; its
    * cardinality is a stable scalar both engines could check — declared
    * rows-only). */
  def textWinnow(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.winnow(Tables.documents(s, dir), "doc_id", "text")
      .select(col("doc_id"), size(col("winnow_fp")).as("fp_size"))
      .orderBy(col("doc_id"))

  // ---- multimodal ----

  def mediaFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeFeatures(s,
        Multimodal.mediaFromDocuments(Tables.documents(s, dir)))
      .toDF().orderBy(col("media_id"))

  val mediaFeaturesSql: String =
    """SELECT doc_id AS media_id, string_split(source, ':')[1] AS media_type,
      |  CAST(LENGTH(text) AS BIGINT) AS n_bytes,
      |  CAST(64 + LENGTH(text) % 577 AS INT) AS width,
      |  CAST(64 + (LENGTH(text) * 31) % 421 AS INT) AS height,
      |  CAST(1 + LENGTH(text) % 24 AS INT) AS n_frames,
      |  md5(text) AS content_hash
      |FROM documents ORDER BY media_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> dedupExact,
    "dedup_ngram_jaccard" -> dedupJaccard,
    "dedup_minhash_lsh" -> dedupMinhash,
    "dedup_simhash" -> dedupSimhash,
    "dedup_embedding" -> dedupEmbedding,
    "ann_bruteforce" -> annBruteforce,
    "ann_lsh" -> annLsh,
    "text_stats" -> textStats,
    "text_langid" -> textLangid,
    "text_token_count" -> textTokenCount,
    "text_fingerprint" -> textFingerprint,
    "text_winnow" -> textWinnow,
    "media_features" -> mediaFeatures)

  def oracleSql: Map[String, String] = Map(
    "dedup_exact" -> dedupExactSql,
    "dedup_ngram_jaccard" -> JaccardSql,
    "dedup_minhash_lsh" -> JaccardSql,
    "dedup_simhash" -> JaccardSql,
    "dedup_embedding" -> dedupEmbeddingSql,
    "ann_bruteforce" -> annBruteforceSql,
    "text_stats" -> textStatsSql,
    "text_langid" -> textLangidSql,
    "text_token_count" -> textTokenCountSql,
    "text_fingerprint" -> textFingerprintSql,
    "media_features" -> mediaFeaturesSql)
    // ann_lsh, text_winnow: rows-only (no SQL twin by design)
}
