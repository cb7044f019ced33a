package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-data pipeline plumbing: deterministic sampling, train/val/test
  * splitting, and shard assignment over the `documents` corpus.
  *
  * All three are built on content-independent md5 hashing of the stable key
  * (`doc_id`) with a per-purpose salt, so that (a) assignment is a pure
  * row-local projection — no shuffle, no state, no RNG seed coordination
  * across 1000 executors; (b) re-running the pipeline on a grown corpus keeps
  * every previously-assigned document in the same split/shard (the property
  * `rand(seed)` does NOT have — its draw depends on partition layout); and
  * (c) the DuckDB oracle can recompute the exact assignment, since md5 of the
  * same UTF-8 bytes is identical on both engines.
  *
  * Rates are expressed as hex-prefix thresholds on the first byte of the
  * digest (256 buckets): `substr(md5(salt || doc_id), 1, 2) < 'XY'` keeps
  * `0xXY/256` of each stratum. String comparison on lowercase hex is
  * order-isomorphic to the numeric value, so no hex→int parsing is needed on
  * either engine.
  *
  * The declared outputs are the audit aggregates a pipeline publishes (per
  * stratum: population, sampled count, id checksum) rather than the sampled
  * rows themselves — one map-side-combined hash aggregate over a scan, the
  * same shape at sf0.001 and at 100 TB.
  */
object Pipeline {

  /** Hex prefix of the salted doc_id digest: 256-bucket assignment key. */
  private def hashBucket(salt: String): Column =
    substring(md5(concat(lit(salt), col("doc_id").cast("string")).cast("binary")), 1, 2)

  /** Stratified sampling audit: keep 25% of 'en' (the majority class),
    * 50% of every other language — the class-rebalancing downsample a
    * training mix applies. Assignment is row-local; the audit is one hash
    * aggregate. */
  def sampleStratified(s: SparkSession, dir: String): DataFrame = {
    val keep = hashBucket("samp:") <
      when(col("lang") === "en", lit("40")).otherwise(lit("80"))
    Tables.documents(s, dir)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_total"),
        count(when(keep, lit(1))).as("n_sampled"),
        coalesce(sum(when(keep, col("doc_id"))), lit(0L)).as("sampled_id_sum"))
      .orderBy(col("lang"))
  }

  val sampleStratifiedSql: String =
    """SELECT lang, count(*) AS n_total,
      |  count(*) FILTER (substr(md5('samp:'||CAST(doc_id AS VARCHAR)),1,2)
      |    < CASE WHEN lang='en' THEN '40' ELSE '80' END) AS n_sampled,
      |  CAST(COALESCE(sum(doc_id) FILTER (substr(md5('samp:'||CAST(doc_id AS VARCHAR)),1,2)
      |    < CASE WHEN lang='en' THEN '40' ELSE '80' END), 0) AS BIGINT) AS sampled_id_sum
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Deterministic 80/10/10 train/val/test split audit per language.
    * A different salt than sampling, so the two assignments are
    * independent; thresholds 0xcc/256 = 79.7%, 0xe6/256 = 89.8%. */
  def splitTrainTest(s: SparkSession, dir: String): DataFrame = {
    val b = hashBucket("split:")
    Tables.documents(s, dir)
      .withColumn("split",
        when(b < "cc", lit("train")).when(b < "e6", lit("val"))
          .otherwise(lit("test")))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
        sum(col("n_chars")).as("chars_sum"))
      .orderBy(col("split"), col("lang"))
  }

  val splitTrainTestSql: String =
    """SELECT split, lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum,
      |  CAST(sum(n_chars) AS BIGINT) AS chars_sum
      |FROM (
      |  SELECT lang, doc_id, n_chars,
      |    CASE WHEN substr(md5('split:'||CAST(doc_id AS VARCHAR)),1,2) < 'cc' THEN 'train'
      |         WHEN substr(md5('split:'||CAST(doc_id AS VARCHAR)),1,2) < 'e6' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents)
      |GROUP BY split, lang ORDER BY split, lang""".stripMargin

  /** Consistent 16-way shard assignment + balance audit. The shard key is
    * the last hex nibble of the digest — documents keep their shard as the
    * corpus grows, and the audit (count + byte mass per shard) is how a
    * pipeline checks its output files are balanced before a 1000-writer
    * fan-out. */
  def docShard(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("shard",
        substring(md5(concat(lit("shard:"), col("doc_id").cast("string")).cast("binary")), 32, 1))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_sum"),
        sum(col("doc_id")).as("id_sum"))
      .orderBy(col("shard"))

  val docShardSql: String =
    """SELECT substr(md5('shard:'||CAST(doc_id AS VARCHAR)),32,1) AS shard,
      |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars_sum,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum
      |FROM documents GROUP BY shard ORDER BY shard""".stripMargin

  /** Deterministic fixed-size (reservoir-equivalent) sample: exactly k=20
    * documents per language, uniform over the stratum — the eval-set /
    * human-review draw where a fixed COUNT is wanted rather than
    * [[sampleStratified]]'s fixed rate. Ranking by the salted md5 digest is
    * equivalent to a uniform k-reservoir but deterministic and engine-
    * independent, and (unlike a true streaming reservoir) re-running on a
    * grown corpus evicts only documents out-ranked by new arrivals.
    *
    * Scale shape: rank-filter over one hash-partitioned window. Spark
    * rewrites the `row_number <= k` filter into WindowGroupLimit, which
    * runs a partial top-k per input partition BEFORE the exchange — the
    * shuffle carries ≤ k rows per (mapper × stratum), not the corpus
    * (guarded in PlanSpec). The declared output is the sample itself
    * (k × languages rows), which pins every chosen id at the gate. */
  def sampleReservoir(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat(lit("resv:"), col("doc_id").cast("string")).cast("binary"))
    val w = Window.partitionBy(col("lang")).orderBy(h, col("doc_id"))
    Tables.documents(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20)
      .select(col("lang"), col("rn"), col("doc_id"), col("n_chars"))
      .orderBy(col("lang"), col("rn"))
  }

  val sampleReservoirSql: String =
    """SELECT lang, rn, doc_id, n_chars FROM (
      |  SELECT lang, doc_id, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY md5('resv:'||CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin

  /** Temperature-scaled source-mixing weights (α = 0.5): the data-mixing
    * step that decides how often each source is drawn during training —
    * up-weighting small sources relative to their raw token share
    * (w_i ∝ n_i^α). One aggregate computes per-source token mass; the
    * sqrt's are IEEE-exact doubles CAST TO DECIMAL before the global sum,
    * so the normalizer is order-independent; only the final weight and
    * share divisions run as double under the fixed r6 rounding.
    * `oversample` = weight / raw-share — how many effective epochs of the
    * source one epoch of the mix consumes. */
  def sampleTemperature(s: SparkSession, dir: String): DataFrame = {
    def r6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
    // toks feeds both the totals aggregate and the final select — cached,
    // or the full documents scan + regex tokenization runs twice.
    val toks = graft.CacheScope.cache(Tables.documents(s, dir)
      .select(col("source"),
        size(regexp_extract_all(lower(col("text")), lit("\\w+"), lit(0)))
          .cast("long").as("n_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tok"))
      .withColumn("sq", sqrt(col("tok").cast("double")).cast("decimal(25,10)")))
    val totals = toks.agg(sum(col("tok")).as("tok_total"),
      sum(col("sq")).as("sq_total"))
    toks.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("tok").as("n_tokens"),
        r6(col("tok").cast("double") / col("tok_total").cast("double"))
          .as("raw_share"),
        r6(col("sq").cast("double") / col("sq_total").cast("double"))
          .as("weight"),
        r6((col("sq").cast("double") / col("sq_total").cast("double")) /
          (col("tok").cast("double") / col("tok_total").cast("double")))
          .as("oversample"))
      .orderBy(col("source"))
  }

  val sampleTemperatureSql: String =
    """WITH toks AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    SUM(CAST(len(regexp_extract_all(lower(text), '\w+')) AS BIGINT)) AS tok
      |  FROM documents GROUP BY source),
      |sq AS (SELECT *, CAST(SQRT(CAST(tok AS DOUBLE)) AS DECIMAL(25,10)) AS sq FROM toks),
      |tot AS (SELECT SUM(tok) AS tok_total, SUM(sq) AS sq_total FROM sq)
      |SELECT source, n_docs, CAST(tok AS BIGINT) AS n_tokens,
      |  FLOOR((CAST(tok AS DOUBLE) / CAST(tok_total AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS raw_share,
      |  FLOOR((CAST(sq AS DOUBLE) / CAST(sq_total AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS weight,
      |  FLOOR(((CAST(sq AS DOUBLE) / CAST(sq_total AS DOUBLE)) /
      |         (CAST(tok AS DOUBLE) / CAST(tok_total AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS oversample
      |FROM sq, tot ORDER BY source""".stripMargin

  /** The canonical preprocessing pipeline as ONE query: quality gate →
    * exact dedup (keep min-id per content hash) → near-dup removal (keep
    * the component canonical over the MinHash-LSH pair graph) → stable
    * hash split → per-(split, source) audit. Every stage is an operator
    * that is individually oracle-green; this query proves they COMPOSE —
    * the whole corpus-cleaning run a training-data team ships, expressed
    * as one declarative plan (quality/exact stages are row-local +
    * hash-partitioned windows, the near-dup stage is the banded pair join
    * + label propagation, the audit one hash aggregate).
    *
    * Twin note: the LSH pair set equals the exact-Jaccard pair set on the
    * fixture (measured 100% recall — NorthStar scaladoc), and both
    * signatures and pair Jaccards are per-document/per-pair quantities,
    * so filtering the corpus upstream cannot change surviving pairs among
    * the survivors — the SQL twin recomputes exact pairs over the
    * filtered set. */
  def pipelineCleanSplit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.{Dedup, TextAnalysis}
    val docs = Tables.documents(s, dir)
    val keep = TextAnalysis.qualityFilter(docs, "doc_id", "text")
      .filter(col("keep")).select(col("doc_id").as("kid"))
    val qdocs = docs.join(keep, col("doc_id") === col("kid")).drop("kid")
    // edocs feeds three consumers (shingling, the CC node list, the final
    // split join) — cached, or the regex-heavy quality filter re-runs over
    // the full corpus once per consumer. Released by the session consumer.
    val edocs = graft.CacheScope.cache(qdocs
      .withColumn("__c", min(col("doc_id"))
        .over(Window.partitionBy(md5(col("text").cast("binary")))))
      .filter(col("doc_id") === col("__c")).drop("__c"))
    val pairs = Dedup.minhashLshPairs(
      Dedup.shingles(edocs, "doc_id", "text", 3), k = 64, r = 4, threshold = 0.5)
    val canon = Dedup.duplicateGroups(pairs, edocs.select(col("doc_id").as("id")))
      .filter(col("member") === col("canonical")).select(col("member"))
    val b = hashBucket("split:")
    edocs.join(canon, col("doc_id") === col("member"))
      .withColumn("split",
        when(b < "cc", lit("train")).when(b < "e6", lit("val"))
          .otherwise(lit("test")))
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_sum"),
        sum(col("doc_id")).as("id_sum"))
      .orderBy(col("split"), col("source"))
  }

  val pipelineCleanSplitSql: String =
    """WITH feat AS (
      |  SELECT doc_id, LENGTH(text) AS n_chars,
      |    len(regexp_extract_all(lower(text), '\w+')) AS n_tokens,
      |    ROUND(CAST(list_sum(list_transform(regexp_extract_all(lower(text), '\w+'), x -> LENGTH(x))) AS DOUBLE) /
      |      GREATEST(len(regexp_extract_all(lower(text), '\w+')), 1), 6) AS avg_token_len,
      |    ROUND(CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / GREATEST(LENGTH(text), 1), 6) AS punct_ratio,
      |    ROUND(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / GREATEST(LENGTH(text), 1), 6) AS digit_ratio
      |  FROM documents),
      |ok AS (
      |  SELECT doc_id FROM feat
      |  WHERE NOT (n_chars < 200 OR n_chars > 100000 OR n_tokens < 30
      |    OR avg_token_len < 2.5 OR avg_token_len > 12.0
      |    OR digit_ratio > 0.2 OR punct_ratio > 0.1)),
      |qdocs AS (SELECT d.* FROM documents d JOIN ok USING (doc_id)),
      |ed AS (SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS c FROM qdocs),
      |edocs AS (SELECT doc_id, text, source, n_chars FROM ed WHERE doc_id = c),
      |toks AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') ts FROM edocs),
      |sh AS (
      |  SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, len(ts)-2),
      |    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) s
      |  FROM toks WHERE len(ts) >= 3),
      |sizes AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY 1),
      |pairs AS (
      |  SELECT i, j FROM (
      |    SELECT a.doc_id i, b.doc_id j, COUNT(*) c
      |    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |    GROUP BY 1, 2) p
      |  JOIN sizes si ON si.doc_id = i JOIN sizes sj ON sj.doc_id = j
      |  WHERE CAST(c AS DOUBLE)/(si.n + sj.n - c) >= 0.5),
      |edges AS (SELECT i AS a, j AS b FROM pairs UNION SELECT j, i FROM pairs),
      |reach AS (
      |  WITH RECURSIVE r(a, b) AS (
      |    SELECT a, b FROM edges
      |    UNION
      |    SELECT r.a, e.b FROM r JOIN edges e ON r.b = e.a)
      |  SELECT a, b FROM r),
      |final AS (
      |  SELECT e.* FROM edocs e
      |  LEFT JOIN (SELECT a, MIN(b) AS mn FROM reach GROUP BY a) m ON m.a = e.doc_id
      |  WHERE LEAST(doc_id, COALESCE(mn, doc_id)) = doc_id)
      |SELECT split, source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS chars_sum,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
      |FROM (
      |  SELECT *,
      |    CASE WHEN substr(md5('split:'||CAST(doc_id AS VARCHAR)),1,2) < 'cc' THEN 'train'
      |         WHEN substr(md5('split:'||CAST(doc_id AS VARCHAR)),1,2) < 'e6' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM final)
      |GROUP BY split, source ORDER BY split, source""".stripMargin

  /** Per-source data card — the governance report a training corpus ships
    * with: volume (docs, chars, tokens), language spread, quality keep
    * rate, and exact-duplication exposure (docs sharing an md5 text hash,
    * and the redundant share a dedup pass would drop).
    *
    * Shape: the quality features come from [[graft.operators.TextAnalysis
    * .qualityFilter]]'s row-local projection; duplicate-group sizes are
    * ONE window over the md5 hash (the dedup_exact key); the report is one
    * hash aggregate per source. Three exchanges total, none over wide
    * data — at 100 TB the hash window is the only corpus-sized shuffle,
    * and it shuffles (id, hash, 3 small columns), not text. */
  def pipelineDataCard(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val q = graft.operators.TextAnalysis.qualityFilter(docs, "doc_id", "text")
      .select(col("doc_id"), col("keep"), col("n_tokens"))
    val wh = Window.partitionBy(col("h"))
    val g = docs.select(col("doc_id"), col("source"), col("lang"),
        col("n_chars"), md5(col("text").cast("binary")).as("h"))
      .withColumn("grp_n", count(lit(1)).over(wh))
      .withColumn("grp_min", min(col("doc_id")).over(wh))
    g.join(q, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("n_tokens")).as("total_tokens"),
        (floor(sum(when(col("keep"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)) * 1e6 + 0.5) / 1e6).as("keep_rate"),
        sum(when(col("grp_n") > 1, 1L).otherwise(0L)).as("n_in_dup_groups"),
        sum(when(col("grp_n") > 1 && col("doc_id") =!= col("grp_min"), 1L)
          .otherwise(0L)).as("n_redundant"))
      .orderBy(col("source"))
  }

  val pipelineDataCardSql: String =
    """WITH feat AS (
      |  SELECT doc_id, LENGTH(text) AS qc,
      |    len(regexp_extract_all(lower(text), '\w+')) AS n_tokens,
      |    ROUND(CAST(list_sum(list_transform(regexp_extract_all(lower(text), '\w+'), x -> LENGTH(x))) AS DOUBLE) /
      |      GREATEST(len(regexp_extract_all(lower(text), '\w+')), 1), 6) AS avg_token_len,
      |    ROUND(CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / GREATEST(LENGTH(text), 1), 6) AS punct_ratio,
      |    ROUND(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / GREATEST(LENGTH(text), 1), 6) AS digit_ratio
      |  FROM documents),
      |q AS (
      |  SELECT doc_id, n_tokens,
      |    (CASE WHEN qc < 200 THEN 'too_short'
      |          WHEN qc > 100000 THEN 'too_long'
      |          WHEN n_tokens < 30 THEN 'too_few_tokens'
      |          WHEN avg_token_len < 2.5 THEN 'tokens_too_short'
      |          WHEN avg_token_len > 12.0 THEN 'tokens_too_long'
      |          WHEN digit_ratio > 0.2 THEN 'too_many_digits'
      |          WHEN punct_ratio > 0.1 THEN 'too_much_punctuation'
      |          ELSE 'ok' END) = 'ok' AS keep
      |  FROM feat),
      |g AS (
      |  SELECT doc_id, source, lang, n_chars,
      |    COUNT(*) OVER (PARTITION BY md5(text)) AS grp_n,
      |    MIN(doc_id) OVER (PARTITION BY md5(text)) AS grp_min
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT lang) AS n_langs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      |  FLOOR(CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
      |    * 1e6 + 0.5) / 1e6 AS keep_rate,
      |  CAST(SUM(CASE WHEN grp_n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_in_dup_groups,
      |  CAST(SUM(CASE WHEN grp_n > 1 AND doc_id != grp_min THEN 1 ELSE 0 END) AS BIGINT) AS n_redundant
      |FROM g JOIN q USING (doc_id)
      |GROUP BY source ORDER BY source""".stripMargin

  /** Domain-mixture resampling: hit a TARGET mixture (web 60% / books 30% /
    * code 10%, domains derived from the source id) with the largest corpus
    * the available per-domain pools allow, never upsampling — the training-
    * mix step every LLM data pipeline runs (The Pile / Dolma publish
    * exactly such target-weight tables). The feasible budget is
    * N* = min_d(n_d·100 div pct_d) (the binding domain is fully consumed),
    * takes are pct_d·N* div 100 — ALL integer arithmetic, so both engines
    * agree exactly. Selection within a domain is the repo's deterministic
    * md5-salted rank: every engine (and every re-run, at any partitioning)
    * picks the same docs.
    *
    * 100 TB shape: per-domain counts are one tiny aggregate; the budget and
    * takes are driver-scale scalars broadcast back; selection is one
    * window rank per domain — Spark rewrites `row_number <= k` into
    * WindowGroupLimit, so each partition keeps only its local top-k before
    * the shuffle (same shape as [[sampleStratified]]). */
  def mixDomains(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val tagged = Tables.documents(s, dir).select(col("doc_id"),
      expr("CASE CAST(substring(source, 4, 18) AS BIGINT) % 3 " +
        "WHEN 0 THEN 'web' WHEN 1 THEN 'books' ELSE 'code' END").as("domain"))
    val weights = Seq(("web", 60L), ("books", 30L), ("code", 10L))
      .toDF("domain", "pct")
    val sizes = tagged.groupBy(col("domain")).agg(count(lit(1)).as("n"))
      .join(broadcast(weights), "domain")
    val nstar = sizes.agg(min(expr("n * 100 div pct")).as("nstar"))
    val takes = sizes.crossJoin(broadcast(nstar))
      .select(col("domain"), expr("pct * nstar div 100").as("take"))
    val w = Window.partitionBy(col("domain")).orderBy(
      md5(concat(lit("mix:"), col("doc_id").cast("string")).cast("binary")),
      col("doc_id"))
    tagged.withColumn("rk", row_number().over(w))
      .join(broadcast(takes), "domain")
      .filter(col("rk") <= col("take"))
      .select(col("doc_id"), col("domain"), col("rk").cast("long").as("rk"))
      .orderBy(col("domain"), col("rk"))
  }

  val mixDomainsSql: String =
    """WITH tagged AS (
      |  SELECT doc_id,
      |    CASE CAST(substr(source, 4, 18) AS BIGINT) % 3
      |      WHEN 0 THEN 'web' WHEN 1 THEN 'books' ELSE 'code' END AS domain
      |  FROM documents),
      |w AS (SELECT * FROM (VALUES ('web', 60), ('books', 30), ('code', 10)) AS t(domain, pct)),
      |sizes AS (
      |  SELECT t.domain, CAST(count(*) AS BIGINT) AS n, any_value(w.pct) AS pct
      |  FROM tagged t JOIN w ON t.domain = w.domain GROUP BY t.domain),
      |budget AS (SELECT min(n * 100 // pct) AS nstar FROM sizes),
      |takes AS (SELECT domain, pct * (SELECT nstar FROM budget) // 100 AS take FROM sizes),
      |ranked AS (
      |  SELECT doc_id, domain,
      |    row_number() OVER (PARTITION BY domain
      |      ORDER BY md5('mix:'||CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM tagged)
      |SELECT r.doc_id, r.domain, CAST(r.rk AS BIGINT) AS rk
      |FROM ranked r JOIN takes t ON r.domain = t.domain
      |WHERE r.rk <= t.take ORDER BY r.domain, r.rk""".stripMargin

  /** Sequence packing for pretraining — the concat-and-chunk layout every
    * autoregressive trainer uses: documents concatenate in a deterministic
    * order (doc_id) into one token stream that is cut into fixed-length
    * training sequences of `seqLen` tokens; each document reports the
    * sequences it lands in (straddling a boundary ⇒ n_seqs > 1, the
    * attention-masking cases a data card has to count).
    *
    * Distinct from `text_pack_bins` (TextAnalysis.packBins), which packs
    * WITHIN a group key via an ordinary partitioned window — that shape
    * cannot produce the single global stream (one window partition = the
    * whole corpus in one task); this one exists precisely to do the
    * global layout scalably.
    *
    * The global token offset is an exact prefix sum, and the naive window
    * (`Window.orderBy(doc_id)` with no partition) would serialize the
    * corpus into ONE task — the textbook 100 TB scale-killer. Instead the
    * classic two-stage distributed prefix sum: range-partition by doc_id,
    * per-partition running sums in parallel (window keyed on the partition
    * id), one tiny per-partition-totals table (numPartitions rows) carries
    * the cross-partition offsets through a driver-scale window, and a
    * broadcast join adds them back. The partition-id column requires ONE
    * materialization of the range exchange (scope-cached) — correctness
    * does not depend on where the sampled range boundaries fall, only on
    * ranges being sorted and disjoint, which RangePartitioner guarantees. */
  /** Deterministic EPOCH ORDERING — the reproducible data-order contract a
    * training run needs (resume a crashed epoch, replay a loss spike,
    * compare runs): a seeded pseudo-random permutation of the corpus,
    * sharded for parallel data-loader workers, bit-identical on every
    * rerun and across engines. Shard and order both derive from the
    * md5(seed || id) digest (the cross-engine hash every sampling op here
    * uses): shard = the digest's first 32 BITS mod nShards (8 hex chars —
    * a first-BYTE key silently capped the knob at 256 shards, the r15
    * code-review catch: past the cap rows/shard floors at corpus/256 and
    * the max window task grows linearly after all; 32 bits supports 2³²
    * shards, far past any real rows-per-task budget), within-shard
    * position = rank by (digest, id). NO global total order is ever
    * materialized — a corpus-wide row_number would serialize the corpus
    * through one window task (the pack_ab lesson); the only shuffle is
    * the per-shard window, bounded by rows/shard, and any worker can
    * locate any document's shard with row-local arithmetic. A new seed is
    * a fresh epoch's order. */
  private[graft] def epochOrderOver(docs: DataFrame, idCol: String,
                                    seed: String,
                                    nShards: Int): DataFrame = {
    val h = md5(concat(lit(s"epoch:$seed:"), col(idCol).cast("string"))
      .cast("binary"))
    import org.apache.spark.sql.expressions.Window
    val keyExpr = hexShardKey("substring")
    val keyed = docs.select(col(idCol), h.as("h"))
      .withColumn("shard",
        pmod(expr(keyExpr), lit(nShards.toLong)).cast("int"))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col(idCol))
    keyed.withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("pos"), col("h").as("order_key"))
  }

  def epochOrder(s: SparkSession, dir: String): DataFrame =
    epochOrderOver(Tables.documents(s, dir), "doc_id", seed = "7",
        nShards = 8)
      .orderBy(col("shard"), col("pos"))

  /** The 32-bit shard key over a digest column `h`, as engine-portable
    * SQL text — hex→int via instr arithmetic (DuckDB has no conv()),
    * each place value CAST to BIGINT or int×int wraps at the top places.
    * ONE generator parameterized on the substring function name
    * ('substring' Spark / 'substr' DuckDB), so the two engines can never
    * drift apart on the parity-critical expression (r15 review catch —
    * it was maintained as two copies). */
  private def hexShardKey(substrFn: String): String =
    (1 to 8).map { i =>
      val shift = 4 * (8 - i)
      val digit = s"(instr('0123456789abcdef', $substrFn(h, $i, 1)) - 1)"
      if (shift == 0) digit
      else s"$digit * CAST(${1L << shift} AS BIGINT)"
    }.mkString(" + ")

  val epochOrderSql: String = {
    val keyExpr = hexShardKey("substr")
    s"""WITH h AS (
      |  SELECT doc_id, md5('epoch:7:' || CAST(doc_id AS VARCHAR)) AS h
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, h,
      |    ($keyExpr) % 8 AS shard
      |  FROM h)
      |SELECT doc_id, CAST(shard AS INT) AS shard,
      |  CAST(row_number() OVER (
      |    PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos,
      |  h AS order_key
      |FROM s ORDER BY shard, pos""".stripMargin
  }

  def packSequences(s: SparkSession, dir: String): DataFrame =
    packSequencesOver(Tables.documents(s, dir))

  private[graft] def packSequencesOver(docs: DataFrame,
                                       seqLen: Int = 512): DataFrame =
    packOffsetsOver(
      docs.select(col("doc_id"),
          size(graft.operators.Dedup.tokens(col("text"))).cast("long")
            .as("n_tokens"))
        .filter(col("n_tokens") > 0),
      seqLen).orderBy(col("doc_id"))

  /** The two-stage distributed prefix sum over a pre-tokenized
    * (doc_id, n_tokens) frame — the packing core, unsorted. */
  private[graft] def packOffsetsOver(toks: DataFrame,
                                     seqLen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withPid = graft.CacheScope.cache(
      toks.repartitionByRange(col("doc_id"))
        .withColumn("pid", spark_partition_id()))
    val pidW = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = withPid.withColumn("local_off",
      coalesce(sum(col("n_tokens")).over(pidW), lit(0L)))
    // numPartitions rows: the single-ordering window here is over a table
    // the size of the CLUSTER, not the corpus
    val pidOff = withPid.groupBy(col("pid"))
      .agg(sum(col("n_tokens")).as("ptot"))
      .withColumn("poff", coalesce(sum(col("ptot")).over(
        Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("poff"))
    local.join(broadcast(pidOff), "pid")
      .select(col("doc_id"), col("n_tokens"),
        (col("local_off") + col("poff")).as("start_offset"))
      .select(col("doc_id"), col("n_tokens"), col("start_offset"),
        floor(col("start_offset") / seqLen).as("first_seq"),
        floor((col("start_offset") + col("n_tokens") - 1) / seqLen)
          .as("last_seq"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1)
  }

  /** The per-SEQUENCE manifest over the same packing — the view the
    * training dataloader actually consumes: for each fixed-length
    * sequence, how many documents compose it, the token contribution sum
    * (= seqLen except the final partial sequence), its first/last
    * document, and whether its head/tail cut a document mid-stream (the
    * attention-mask boundary flags). Derived from [[packOffsetsOver]] by a
    * row-local explode of each document into the sequences it touches
    * (bounded by n_seqs, almost always 1-2) + one keyed aggregate — no new
    * scale machinery beyond the prefix sum it composes over. */
  def packManifest(s: SparkSession, dir: String): DataFrame = {
    val seqLen = 512
    val offs = packOffsetsOver(
      Tables.documents(s, dir)
        .select(col("doc_id"),
          size(graft.operators.Dedup.tokens(col("text"))).cast("long")
            .as("n_tokens"))
        .filter(col("n_tokens") > 0),
      seqLen)
    offs
      .select(col("doc_id"), col("n_tokens"), col("start_offset"),
        explode(sequence(col("first_seq"), col("last_seq"))).as("seq_id"))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(least((col("seq_id") + 1) * seqLen,
            col("start_offset") + col("n_tokens")) -
          greatest(col("seq_id") * seqLen, col("start_offset")))
          .as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        max(when(col("start_offset") < col("seq_id") * seqLen, 1L)
          .otherwise(0L)).as("head_straddles"),
        max(when(col("start_offset") + col("n_tokens") >
            (col("seq_id") + 1) * seqLen, 1L)
          .otherwise(0L)).as("tail_straddles"))
      .orderBy(col("seq_id"))
  }

  val packManifestSql: String =
    """WITH toks AS (SELECT doc_id,
      |  len(regexp_extract_all(lower(text), '\w+')) n FROM documents),
      |offs AS (SELECT doc_id, n, CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |  soff FROM toks WHERE n > 0),
      |spans AS (SELECT doc_id, n, soff,
      |  unnest(generate_series(soff // 512, (soff + n - 1) // 512)) s
      |  FROM offs)
      |SELECT s AS seq_id, COUNT(*) AS n_docs,
      |  CAST(SUM(LEAST((s+1)*512, soff+n) - GREATEST(s*512, soff))
      |    AS BIGINT) AS n_tokens,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
      |  CAST(MAX(CASE WHEN soff < s*512 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS head_straddles,
      |  CAST(MAX(CASE WHEN soff+n > (s+1)*512 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS tail_straddles
      |FROM spans GROUP BY s ORDER BY seq_id""".stripMargin

  /** TOKENIZER-TRUE global packing (VERDICT r14 #4's point): the same
    * two-stage prefix-sum packing, but over the REAL subword token counts
    * [[graft.operators.TextAnalysis.bpeEncode]] produces from the trained
    * merge list, instead of whitespace-ish word counts — the layout an
    * actual pretraining run needs, since sequence budgets are spent in
    * tokenizer tokens. Train (6 rules) → encode (k literal replaces,
    * row-local) → pack (one range exchange + per-partition window): the
    * corpus never shuffles for the encode, and the twin replays the full
    * train/encode/pack chain — a single token miscounted anywhere moves
    * every later document's start offset and breaks the hash. */
  def packBpe(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val toks = graft.operators.TextAnalysis
      .bpeEncode(docs, "doc_id", "text", NorthStar.trainedBpeMerges(docs))
      .select(col("doc_id"), col("n_tokens"))
      .filter(col("n_tokens") > 0)
    packOffsetsOver(toks, 512).orderBy(col("doc_id"))
  }

  val packBpeSql: String =
    s"""WITH ${NorthStar.bpeEncodeCtes},
       |toks AS (SELECT doc_id,
       |  CASE WHEN sym = '' THEN 0
       |    ELSE len(string_split_regex(trim(sym), ' {2,}')) END AS n
       |  FROM enc),
       |offs AS (SELECT doc_id, n, COALESCE(SUM(n) OVER (ORDER BY doc_id
       |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) soff
       |  FROM toks WHERE n > 0)
       |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       |  CAST(soff AS BIGINT) AS start_offset,
       |  CAST(soff // 512 AS BIGINT) AS first_seq,
       |  CAST((soff + n - 1) // 512 AS BIGINT) AS last_seq,
       |  CAST((soff + n - 1) // 512 - soff // 512 + 1 AS BIGINT) AS n_seqs
       |FROM offs ORDER BY doc_id""".stripMargin

  val packSequencesSql: String =
    """WITH toks AS (SELECT doc_id,
      |  len(regexp_extract_all(lower(text), '\w+')) n FROM documents),
      |offs AS (SELECT doc_id, n, COALESCE(SUM(n) OVER (ORDER BY doc_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) soff
      |  FROM toks WHERE n > 0)
      |SELECT doc_id, n AS n_tokens, CAST(soff AS BIGINT) AS start_offset,
      |  CAST(soff // 512 AS BIGINT) AS first_seq,
      |  CAST((soff + n - 1) // 512 AS BIGINT) AS last_seq,
      |  CAST((soff + n - 1) // 512 - soff // 512 + 1 AS BIGINT) AS n_seqs
      |FROM offs ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_pack_sequences" -> packSequences,
    "pipeline_pack_bpe" -> packBpe,
    "pipeline_epoch_order" -> epochOrder,
    "pipeline_pack_manifest" -> packManifest,
    "pipeline_mix_domains" -> mixDomains,
    "pipeline_data_card" -> pipelineDataCard,
    "sample_stratified" -> sampleStratified,
    "sample_reservoir" -> sampleReservoir,
    "split_train_test" -> splitTrainTest,
    "doc_shard" -> docShard,
    "sample_temperature" -> sampleTemperature,
    "pipeline_clean_split" -> pipelineCleanSplit)

  def oracleSql: Map[String, String] = Map(
    "pipeline_pack_sequences" -> packSequencesSql,
    "pipeline_pack_bpe" -> packBpeSql,
    "pipeline_epoch_order" -> epochOrderSql,
    "pipeline_pack_manifest" -> packManifestSql,
    "pipeline_mix_domains" -> mixDomainsSql,
    "pipeline_data_card" -> pipelineDataCardSql,
    "sample_stratified" -> sampleStratifiedSql,
    "sample_reservoir" -> sampleReservoirSql,
    "split_train_test" -> splitTrainTestSql,
    "doc_shard" -> docShardSql,
    "sample_temperature" -> sampleTemperatureSql,
    "pipeline_clean_split" -> pipelineCleanSplitSql)
}
