package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: quality statistics,
  * language identification (stopword-profile heuristic), token counting
  * (whitespace + BPE-ish subword estimate), and document fingerprinting
  * (normalized-content hash + Rabin-Karp rolling hashes with winnowing).
  *
  * Everything is pure column arithmetic over `functions._` — codegen'd,
  * linear scans, no UDFs; each document is processed independently so the
  * operators scale embarrassingly with executors.
  */
object TextAnalysis {

  /** Per-language stopword profiles for the lang-id heuristic. */
  val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "y", "en", "que", "los", "un"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une"),
    "de" -> Seq("der", "die", "das", "und", "zu", "den", "von", "ist"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "他"))

  private def toks(text: Column): Column = Dedup.tokens(text)

  /** Quality statistics: lengths, token counts, average token length,
    * punctuation/whitespace/digit ratios, uppercase ratio — the classic
    * quality-filter features. */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val n = length(t).cast("double")
    def countMatches(pat: String): Column =
      size(regexp_extract_all(t, lit(pat), lit(0))).cast("double")
    // tokenize once per row (the regex is the dominant cost; 4 inline
    // occurrences would run it 4x)
    val ts = col("__toks")
    df.withColumn("__toks", toks(t)).select(col(idCol),
      length(t).as("n_chars"),
      size(ts).as("n_tokens"),
      round(size(ts).cast("double") /
        greatest(countMatches("\\S+"), lit(1.0)), 6).as("tokens_per_word"),
      round(aggregate(transform(ts, x => length(x)), lit(0),
        (a, x) => a + x).cast("double") /
        greatest(size(ts).cast("double"), lit(1.0)), 6).as("avg_token_len"),
      round(countMatches("[.,;:!?]") / greatest(n, lit(1.0)), 6).as("punct_ratio"),
      round(countMatches("\\s") / greatest(n, lit(1.0)), 6).as("space_ratio"),
      round(countMatches("[0-9]") / greatest(n, lit(1.0)), 6).as("digit_ratio"),
      round(countMatches("[A-Z]") / greatest(n, lit(1.0)), 6).as("upper_ratio"))
  }

  /** Language-ID: score each profile by stopword hits over the token
    * multiset; argmax with deterministic tiebreak by profile order; "und"
    * when no profile scores.
    *
    * Relational shape: tokens explode once and broadcast-join the tiny
    * (lang, word) profile dim; per-(doc, lang) hit counts aggregate with
    * map-side partials; argmax = `max_by` over `struct(count, -profileIdx)`
    * (earlier profile wins ties). The per-row lambda form (5 interpreted
    * `filter()` passes per document) was the slowest query in the r2 noop
    * bench — this one is codegen end-to-end and scales with executors. */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val profileDim = broadcast(StopwordProfiles.zipWithIndex.flatMap {
      case ((lang, words), idx) => words.map(w => (w, lang, idx))
    }.toDF("tk", "lang", "lang_idx"))
    val hits = df.select(col(idCol), explode(toks(col(textCol))).as("tk"))
      .join(profileDim, "tk")
      .groupBy(col(idCol), col("lang"), col("lang_idx"))
      .agg(count(lit(1)).as("score"))
      .groupBy(col(idCol))
      .agg(max_by(struct(col("score"), col("lang")),
        struct(col("score"), -col("lang_idx"))).as("best"))
      .select(col(idCol), col("best.score").as("lang_score"),
        col("best.lang").as("lang_pred"))
    // docs with zero stopword hits drop out of the join — restore as "und"
    df.select(col(idCol)).join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("lang_score"), lit(0L)).as("lang_score"),
        coalesce(col("lang_pred"), lit("und")).as("lang_pred"))
  }

  /** Token counting: whitespace tokens, word tokens, and a BPE-ish subword
    * estimate (ceil(len/4) per word — the standard chars/4 rule). */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val ts = col("__toks")
    df.withColumn("__toks", toks(t)).select(col(idCol),
      size(regexp_extract_all(t, lit("\\S+"), lit(0))).as("n_ws_tokens"),
      size(ts).as("n_word_tokens"),
      aggregate(transform(ts, x => ceil(length(x) / lit(4.0)).cast("long")),
        lit(0L), (a, x) => a + x).as("n_subword_est"))
  }

  /** Content fingerprint: hash of the normalized text (lowercase, word
    * tokens only, single-space joined) — robust to whitespace/punctuation
    * jitter; plus the raw-content hash. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      md5(col(textCol).cast("binary")).as("raw_fp"),
      md5(array_join(toks(col(textCol)), " ").cast("binary")).as("norm_fp"))

  /** Quality filter — the keep/drop decision of a training-data pipeline,
    * composed from [[stats]]' features with explicit reject reasons (the
    * first failing rule wins, so the decision is auditable). Thresholds
    * follow the common C4/Gopher-style heuristics: length bounds, mean
    * token length bounds, symbol/digit density, minimum alpha ratio.
    * Pure column arithmetic over the stats projection — linear scan. */
  def qualityFilter(df: DataFrame, idCol: String, textCol: String,
                    minChars: Int = 200, maxChars: Int = 100000,
                    minTokens: Int = 30, minAvgTok: Double = 2.5,
                    maxAvgTok: Double = 12.0, maxDigitRatio: Double = 0.2,
                    maxPunctRatio: Double = 0.1): DataFrame = {
    val s = stats(df, idCol, textCol)
    val reason = when(col("n_chars") < minChars, "too_short")
      .when(col("n_chars") > maxChars, "too_long")
      .when(col("n_tokens") < minTokens, "too_few_tokens")
      .when(col("avg_token_len") < minAvgTok, "tokens_too_short")
      .when(col("avg_token_len") > maxAvgTok, "tokens_too_long")
      .when(col("digit_ratio") > maxDigitRatio, "too_many_digits")
      .when(col("punct_ratio") > maxPunctRatio, "too_much_punctuation")
      .otherwise("ok")
    s.select(col(idCol), col("n_chars"), col("n_tokens"),
      reason.as("reject_reason"), (reason === "ok").as("keep"))
  }

  /** Per-document top-k TF-IDF terms — the classic vocabulary/relevance
    * materialization of a training-data pipeline. Two hash aggregates
    * (term frequency per (doc, term); document frequency per term), the
    * corpus size as a broadcast 1-row aggregate (no driver collect), and a
    * per-doc top-k window. idf = ln((N+1)/(df+1)) — smoothed, positive.
    */
  def tfIdfTopK(df: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = df.select(col(idCol).as("doc_id"),
      explode(toks(col(textCol))).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = terms.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(docFreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") *
        log((col("__n") + 1).cast("double") / (col("df") + 1)), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("tfidf"))
  }

  /** Unigram language-model quality score — the lightweight perplexity
    * proxy of CCNet-style LM filtering, with a corpus-estimated unigram
    * model standing in for the trained LM: p(t) = (c_t + 1) / (N + V)
    * (add-one smoothed over the corpus vocabulary), and each document
    * scores mean_t −ln p(t). High = improbable/garbled text, low =
    * repetitive/templated — both tails are what the filter flags.
    *
    * Shape: one exploded-token aggregate builds the model (term → count,
    * a vocabulary-sized broadcast dim), the (N, V) totals broadcast as a
    * 1-row aggregate, and tokens re-join the model by term. At 100 TB the
    * model becomes a top-V table with an OOV floor — the same broadcast
    * join. Determinism: the ln argument is a ratio of exact integers (both
    * engines round the same double), each token's −ln p is rounded to 8 dp
    * and summed as DECIMAL(20,8) — order-independent under any
    * partitioning — and the per-doc mean is r6. */
  def unigramNegLogprob(df: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"),
      explode(toks(col(textCol))).as("t"))
    val model = tok.groupBy(col("t")).agg(count(lit(1)).as("c"))
    val stats = tok.agg(count(lit(1)).as("__n"),
      countDistinct(col("t")).as("__v"))
    val nl = floor(log((col("__n") + col("__v")).cast("double") /
      (col("c") + 1)) * 1e8 + 0.5) / 1e8
    tok.join(broadcast(model), "t")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), nl.cast("decimal(20,8)").as("nl"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("nl")).as("s"))
      .select(col("doc_id"), col("n_tokens"),
        (floor(col("s").cast("double") / col("n_tokens") * 1e6 + 0.5) / 1e6)
          .as("avg_neg_logprob"))
  }

  /** The 100 TB form of [[unigramNegLogprob]] (VERDICT r8 missing #4):
    * model = the TOP-V terms + one OOV bucket, so the broadcast dimension
    * is bounded at V+1 rows at ANY corpus size — a web-scale corpus has an
    * unbounded vocabulary (typos, ids, URLs make the full-vocab model grow
    * with the data), but the top-V cut is a constant-size table and every
    * tail term scores through the aggregated OOV mass.
    *
    * Model: V* = min(topV, vocab) terms by (count DESC, term ASC) — the
    * cut is computed by orderBy+limit, which Spark plans as
    * TakeOrderedAndProject (per-partition partial top-V, then one bounded
    * merge; no vocabulary-sized shuffle or single-partition window).
    * Collapsing the tail into one pseudo-term gives add-one smoothing over
    * V*+1 outcomes: p(t) = (c_t + 1) / (N + V* + 1) in-vocab and
    * p(OOV) = (c_tail + 1) / (N + V* + 1) where c_tail = N − Σ_top c_t.
    * Scoring is one LEFT broadcast join token→model with the OOV floor as
    * the COALESCE default. The boundary tie (two terms with the cut
    * count) is pinned by the (count DESC, term ASC) order, which the twin
    * reproduces exactly. Same decimal discipline as the full model: 8 dp
    * per-token rounding, DECIMAL(20,8) sum, r6 mean. */
  def unigramNegLogprobTopV(df: DataFrame, idCol: String, textCol: String,
                            topV: Int): DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"),
      explode(toks(col(textCol))).as("t"))
    val model = tok.groupBy(col("t")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t")).limit(topV)
    val stats = tok.agg(count(lit(1)).as("__n"))
      .crossJoin(broadcast(model.agg(count(lit(1)).as("__v"),
        sum(col("c")).as("__ctop"))))
    def nl(cExpr: Column) =
      floor(log((col("__n") + col("__v") + 1).cast("double") / (cExpr + 1))
        * 1e8 + 0.5) / 1e8
    tok.join(broadcast(model), Seq("t"), "left")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        when(col("c").isNull, lit(1L)).otherwise(lit(0L)).as("oov"),
        when(col("c").isNull, nl(col("__n") - col("__ctop")))
          .otherwise(nl(col("c"))).cast("decimal(20,8)").as("nl"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("oov")).as("n_oov"),
        sum(col("nl")).as("s"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        (floor(col("s").cast("double") / col("n_tokens") * 1e6 + 0.5) / 1e6)
          .as("avg_neg_logprob"))
  }

  /** Winnowing fingerprint (Schleimer et al. 2003): hash token k-grams,
    * keep the minimum per sliding window of w — a compact sketch whose
    * overlap estimates document similarity. Returns (id, Array[String]).
    *
    * The gram hash is the 16-hex-char md5 prefix — chosen over xxhash64
    * because both Spark and DuckDB compute md5 over the same UTF-8 bytes,
    * so the sketch is DuckDB-oracle-expressible (min over lowercase hex
    * strings is plain lexicographic ordering on both engines). */
  /** Returns distinct (idCol, fp) rows — one row per retained window
    * minimum.
    *
    * Deliberately RELATIONAL, not array-lambda-based: an earlier form
    * computed grams/minima with nested `transform(...)` lambdas, and
    * because higher-order lambdas evaluate interpreted and Catalyst
    * inlines projection aliases into them (CollapseProject), the gram
    * array was re-evaluated per window position — O(tokens²) md5+regex
    * per document (a multi-minute single task at sf0.1, caught by the
    * noop-sink bench). This form is posexplode → `lead()` window to build
    * each k-gram → forward-rolling `min()` window — linear, one shuffle
    * on the doc id, every expression codegen-friendly. */
  /** Corpus-level n-gram frequency: every n-gram OCCURRENCE (not per-doc
    * distinct — this is the frequency table, the corpus-statistics sibling
    * of [[Dedup.shingles]]) → one hash aggregate → global top-k by (count
    * desc, gram asc). At scale: map-side partial counts collapse the
    * long-tail before the shuffle; the top-k limit keeps the sort tiny. */
  def ngramFreq(df: DataFrame, idCol: String, textCol: String,
                n: Int, topK: Int): DataFrame =
    df.select(toks(col(textCol)).as("ts"))
      .filter(size(col("ts")) >= n)
      .select(explode(transform(sequence(lit(1), size(col("ts")) - (n - 1)),
        i => array_join(slice(col("ts"), i, lit(n)), " "))).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("gram"))
      .limit(topK)

  /** Per-document repetition statistics — the Gopher-style repetition
    * filter's features: total vs distinct n-gram occurrences, the duplicate
    * fraction, and the most-frequent-gram share. Highly repetitive
    * documents (boilerplate, keyword stuffing, degenerate generations) are
    * the classic pre-training poison this flags.
    *
    * Shape: explode grams → hash aggregate per (doc, gram) → hash aggregate
    * per doc. Both aggregates take map-side partials, so at 100 TB the
    * shuffle carries per-partition-collapsed gram counts, not occurrences;
    * documents process independently. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 2, dupThreshold: Double = 0.2): DataFrame = {
    val grams = df.select(col(idCol).as("doc_id"), toks(col(textCol)).as("ts"))
      .filter(size(col("ts")) >= n)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("ts")) - (n - 1)),
          i => array_join(slice(col("ts"), i, lit(n)), " "))).as("gram"))
    val dupFrac = lit(1.0) -
      col("n_distinct_grams").cast("double") / col("n_grams")
    grams.groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_grams"),
        count(lit(1)).as("n_distinct_grams"),
        max(col("c")).as("top_c"))
      .select(col("doc_id"), col("n_grams"), col("n_distinct_grams"),
        round(dupFrac, 6).as("dup_gram_frac"),
        round(col("top_c").cast("double") / col("n_grams"), 6).as("top_gram_frac"),
        (dupFrac > dupThreshold).as("repetitive"))
  }

  /** Benchmark decontamination — the check a training pipeline runs before
    * shipping a corpus: which training documents share verbatim n-grams
    * with the held-out evaluation set (shared grams mean the benchmark
    * leaks into training and its scores are inflated). Returns one row per
    * training document: distinct eval-shared n-grams and the contamination
    * flag.
    *
    * Shape: both sides explode to distinct (doc, gram) via [[Dedup.shingles]]
    * — linear; the eval side collapses to a distinct gram set (∝ eval-set
    * size, ≪ corpus) which joins the training grams as the BUILD side; one
    * count-distinct aggregate per doc; a left join restores zero-overlap
    * docs. At 100 TB the eval gram set broadcasts and the training corpus
    * never shuffles except the per-doc aggregate. */
  def contamination(train: DataFrame, eval: DataFrame, idCol: String,
                    textCol: String, n: Int = 5): DataFrame = {
    val trainGrams = Dedup.shingles(train, idCol, textCol, n)
    val evalGrams = Dedup.shingles(eval, idCol, textCol, n)
      .select(col("s")).distinct()
    val hits = trainGrams.join(evalGrams, "s")
      .groupBy(col("doc").as(idCol))
      .agg(count(lit(1)).as("n_shared_grams"))
    train.select(col(idCol)).join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"),
        (coalesce(col("n_shared_grams"), lit(0L)) > 0).as("contaminated"))
  }

  /** [[contamination]] with a BLOOM pre-filter on the training gram stream
    * — the form that survives when the held-out gram set outgrows an exact
    * broadcast hash relation (billions of grams at 100 TB): a fixed-size
    * bloom built from the eval grams (`stat.bloomFilter`) rides to
    * executors inside a codegen'd [[graft.functions.BloomMightContain]]
    * predicate and prunes the gram stream BEFORE the exact join, which
    * then runs over the surviving sliver. Blooms have no false negatives
    * and the exact join verifies every candidate, so the result is
    * IDENTICAL to [[contamination]] for any filter contents (spec-pinned);
    * false positives only cost pruning efficiency, sized by `fpp`. */
  def contaminationBloom(train: DataFrame, eval: DataFrame, idCol: String,
                         textCol: String, n: Int = 5,
                         expectedItems: Long = 1L << 20,
                         fpp: Double = 0.03): DataFrame = {
    val trainGrams = Dedup.shingles(train, idCol, textCol, n)
    // the eval gram set feeds the bloom build AND the exact verify join
    val evalGrams = graft.CacheScope.cache(
      Dedup.shingles(eval, idCol, textCol, n).select(col("s")).distinct())
    evalGrams.count()
    val bloom = evalGrams.stat.bloomFilter("s", expectedItems, fpp)
    val hits = trainGrams
      .filter(graft.functions.BloomOps.mightContain(bloom, col("s")))
      .join(evalGrams, "s")
      .groupBy(col("doc").as(idCol))
      .agg(count(lit(1)).as("n_shared_grams"))
    train.select(col(idCol)).join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"),
        (coalesce(col("n_shared_grams"), lit(0L)) > 0).as("contaminated"))
  }

  /** Sequence packing — the batch-assembly step before training:
    * documents concatenate into one token stream per packing group
    * (source), in deterministic doc-id order, and the stream is cut into
    * `budget`-token context windows; each document is assigned the window
    * its first token lands in (bin = floor(start_offset / budget)). ONE
    * running-sum window per group key, no iteration, deterministic under
    * any partitioning; groups pack in parallel across executors. */
  def packBins(df: DataFrame, idCol: String, textCol: String,
               groupCol: String, budget: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(groupCol),
        size(toks(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("end_off", sum(col("n_tokens")).over(w))
      .select(col(idCol), col(groupCol), col("n_tokens"),
        floor((col("end_off") - col("n_tokens")).cast("double") / budget)
          .as("bin"))
  }

  /** Repeated-passage removal — the CCNet / RefinedWeb "line dedup" pass
    * that strips boilerplate (headers, nav bars, license blurbs) repeated
    * across documents, adapted to fixed `window`-token segments because the
    * fixture documents are single-line. Each document splits into
    * consecutive `window`-token segments; a segment occurring in at least
    * `minDocs` DISTINCT documents is boilerplate; the document is rebuilt
    * with those segments removed (segments keep their original order).
    *
    * Scale shape (the part that must hold at 100 TB): segmentation is
    * row-local `transform`/`slice` — the corpus text itself is never
    * shuffled. The census shuffles (segment, doc) pairs once into a
    * two-phase distinct count with map-side combine. The boilerplate set
    * is the census output above threshold — tiny relative to the corpus —
    * and BROADCASTs to the drop-list join, which therefore touches only
    * contaminated segment instances. The rebuild joins the small per-doc
    * drop-list back and filters the row-local segment array by index, so
    * the only full-corpus exchanges are the narrow census pairs. */
  def segDedup(df: DataFrame, idCol: String, textCol: String,
               window: Int = 10, minDocs: Int = 2): DataFrame = {
    // sequence(0, -1) would generate a DESCENDING [0, -1] — guard the
    // empty-token case explicitly
    val segsArr = when(size(col("__ts")) === 0,
        array().cast("array<string>"))
      .otherwise(expr(
        s"""transform(
           |  sequence(0, cast(ceil(size(__ts) / ${window}.0) as int) - 1),
           |  i -> concat_ws(' ', slice(__ts, i * $window + 1, $window)))"""
          .stripMargin))
    val base = df
      .select(col(idCol).as("doc_id"), toks(col(textCol)).as("__ts"))
      .select(col("doc_id"), segsArr.as("segs"))
    // the exploded narrow frame feeds BOTH aggregates (census + drop-list);
    // un-cached, each consumer re-runs the interpreted tokenize+segment
    // higher-order chain over the corpus — measured 3.3× of the whole
    // operator at 320k docs (47 s → 14 s, SCALE.md)
    val seg = graft.CacheScope.cache(base.select(col("doc_id"),
      posexplode(col("segs")).as(Seq("seg_idx", "seg"))))
    seg.count()
    val boilerplate = seg.groupBy(col("seg"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("seg"))
    val drops = seg.join(broadcast(boilerplate), "seg")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("seg_idx"))).as("dropped"))
    base.join(drops, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("segs")).cast("long").as("n_segs"),
        coalesce(size(col("dropped")), lit(0)).cast("long").as("n_dropped"),
        concat_ws(" ", filter(col("segs"), (_, i) =>
          !coalesce(array_contains(col("dropped"), i), lit(false))))
          .as("clean_text"))
  }

  /** Cross-document repeated-SPAN scrub — ExactSubstr deduplication (Lee
    * et al. 2021, "Deduplicating Training Data Makes Language Models
    * Better", arXiv:2107.06499) at token granularity: every `window`-token
    * span at STRIDE 1 (unlike [[segDedup]]'s disjoint segments, a repeated
    * passage is caught at ANY alignment) occurring in ≥ `minDocs` distinct
    * documents is removed from every document carrying it; overlapping
    * hits merge into maximal spans. Emits per doc: token counts, hit-start
    * and maximal-span counts, and the md5 of the rebuilt text — the hash
    * keeps the result compact while gate-checking every surviving byte.
    *
    * Scale shape: the gram stream is one row per token position (~10×
    * [[segDedup]]'s volume at window 10 — still linear in corpus tokens);
    * grams travel as 16-hex md5 fingerprints so the census shuffle stays
    * key-narrow; the duplicated-fingerprint set broadcasts; the rebuild is
    * row-local over (token array, sorted hit starts). The coverage array
    * materializes through a cache barrier before its three consumers —
    * un-pinned, CollapseProject would inline the interpreted exists()
    * chain per consumer per element (the winnow O(tokens²) trap). */
  def substrDedup(df: DataFrame, idCol: String, textCol: String,
                  window: Int = 10, minDocs: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val byDoc = W.partitionBy(col("doc_id")).orderBy(col("pos"))
    // the token frame feeds BOTH the gram stream and the rebuild — cache
    // it so (a) the tokenize chain runs once, and (b) it runs in its OWN
    // small stage: fused into the rebuild join's probe side, the
    // tokenize+md5+coverage consume method crosses the JIT bytecode
    // ceiling and the stage drops to interpreted execution (the
    // dedup_embedding r5 finding — uniform ~25× task slowdown, no skew)
    val base = graft.CacheScope.cache(
      df.select(col(idCol).as("doc_id"), toks(col(textCol)).as("__ts")))
    base.count()
    val tok = base.select(col("doc_id"),
      posexplode(col("__ts")).as(Seq("pos", "tk")))
    val grams = graft.CacheScope.cache(tok
      .withColumn("gram", concat_ws(" ",
        col("tk") +: (1 until window).map(i => lead(col("tk"), i).over(byDoc)): _*))
      .withColumn("valid", lead(col("tk"), window - 1).over(byDoc).isNotNull)
      .filter(col("valid"))
      .select(col("doc_id"), col("pos"),
        substring(md5(col("gram").cast("binary")), 1, 16).as("h")))
    grams.count() // the census and the hit-join both read this narrow frame
    val dup = grams.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("h"))
    // Interval-merge the hit starts RELATIONALLY (one window pass), not
    // via a per-position coverage array: the first cut built
    // transform(sequence(0,L-1), t -> exists(ss, ...)) — O(tokens·hits)
    // INTERPRETED lambda evals per doc, and on its first execution in a
    // JVM the fused stage repeatedly measured 7-17× slower (uniform
    // max≈med tasks — the winnow/r5 interpreted-stage cliff, reproduced
    // three times at both heap sizes). Spans merge where coverage is
    // contiguous (next start ≤ prev end + 1), the classic sorted-interval
    // running-max; everything below is codegen'd window + aggregate.
    val hitW = W.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = grams.join(broadcast(dup), "h")
      .select(col("doc_id"), col("pos"))
      .withColumn("prev_end",
        max(col("pos") + (window - 1)).over(hitW.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
      .withColumn("is_new",
        col("prev_end").isNull || col("pos") > col("prev_end") + 1)
      .withColumn("span_id",
        sum(when(col("is_new"), 1).otherwise(0)).over(hitW))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("pos")).as("a"),
        (max(col("pos")) + (window - 1)).as("b"),
        count(lit(1)).as("k"))
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("a"), col("b")))).as("sp"),
        sum(col("k")).cast("long").as("n_dup_starts"),
        count(lit(1)).cast("long").as("n_spans"))
    // row-local rebuild from the SMALL merged-span array: gap slices
    // between spans — the only lambdas left run over |spans| elements
    val L = size(col("__ts"))
    val sp = coalesce(col("sp"), array().cast("array<struct<a:int,b:int>>"))
    val gapBegin = concat(array(lit(0)), transform(sp, s => s.getField("b") + 1))
    val gapEnd = concat(transform(sp, s => s.getField("a") - 1), array(L - 1))
    val cleanToks = flatten(zip_with(gapBegin, gapEnd, (b, e) =>
      when(e >= b, slice(col("__ts"), b + 1, e - b + 1))
        .otherwise(array().cast("array<string>"))))
    base.join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        L.cast("long").as("n_tokens"),
        coalesce(col("n_dup_starts"), lit(0L)).as("n_dup_starts"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        size(cleanToks).cast("long").as("n_clean_tokens"),
        md5(concat_ws(" ", cleanToks).cast("binary")).as("clean_hash"))
  }

  /** DSIR importance weight (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling", arXiv:2302.03169): score each RAW
    * document by how target-like its hashed n-gram features are —
    * Σ_g ln( p̂_target(bucket(g)) / p̂_raw(bucket(g)) ) over unigram and
    * bigram occurrences, features hashed into 256 buckets (the md5-prefix
    * bucketing every sampler here uses), add-one smoothing on both bucket
    * models. High weight ⇒ the doc looks like the target domain and
    * survives importance resampling.
    *
    * Shape: ONE narrow (doc, is_target, bucket) feature stream, cached —
    * it feeds the model aggregate and the scoring join; the 256-row model
    * and the 1-row totals broadcast. Determinism: the ln argument is a
    * ratio of exact integer products (< 2^53 — both engines round the same
    * double), each term rounds to 8 dp and sums as DECIMAL(20,8)
    * (order-independent), the final sum rounds to 6 dp. */
  def dsirWeight(df: DataFrame, idCol: String, textCol: String,
                 targetPred: Column): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val byDoc = W.partitionBy(col("doc_id")).orderBy(col("pos"))
    val tok = df.select(col(idCol).as("doc_id"), targetPred.as("is_t"),
      posexplode(toks(col(textCol))).as(Seq("pos", "tk")))
    val uni = tok.select(col("doc_id"), col("is_t"), col("tk").as("g"))
    val bi = tok
      .withColumn("nx", lead(col("tk"), 1).over(byDoc))
      .filter(col("nx").isNotNull)
      .select(col("doc_id"), col("is_t"),
        concat_ws(" ", col("tk"), col("nx")).as("g"))
    val feats = graft.CacheScope.cache(
      uni.unionAll(bi).select(col("doc_id"), col("is_t"),
        substring(md5(col("g").cast("binary")), 1, 2).as("b")))
    feats.count()
    val model = feats.groupBy(col("b")).agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
      sum(when(!col("is_t"), 1L).otherwise(0L)).as("cr"))
    val totals = feats.agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("nt"),
      sum(when(!col("is_t"), 1L).otherwise(0L)).as("nr"))
    val w8 = floor(log(
        ((col("ct") + 1) * (col("nr") + 256)).cast("double") /
        ((col("cr") + 1) * (col("nt") + 256))) * 1e8 + 0.5) / 1e8
    feats.filter(!col("is_t"))
      .join(broadcast(model), "b")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), w8.cast("decimal(20,8)").as("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("w")).as("s"))
      .select(col("doc_id"), col("n_feats"),
        (floor(col("s").cast("double") * 1e6 + 0.5) / 1e6).as("dsir_weight"))
  }

  /** PII patterns shared by [[piiScrub]] and the DuckDB oracle twin.
    * Deliberately restricted to syntax Java regex and RE2 agree on: no
    * lookaround, no backreferences ('\b' word boundaries are fine in
    * both). */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re: String =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe: String = "\\+[0-9][0-9-]{6,}[0-9]"

  /** PII detection + redaction — the scrubbing pass a training-data
    * pipeline runs before anything else: count email / IPv4 / phone
    * matches per document, flag documents that carry any, and emit the
    * hash of the redacted text (emails → `<EMAIL>`, then IPs → `<IP>`,
    * then phones → `<PHONE>` — the order matters for overlapping matches
    * and is part of the declared contract). Hashing the redaction instead
    * of returning it keeps the result compact while still gate-checking
    * every replaced byte. Pure regexp column ops — linear scan, each
    * document independent. */
  def piiScrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    def n(re: String): Column = size(regexp_extract_all(t, lit(re), lit(0)))
    val redacted = regexp_replace(
      regexp_replace(regexp_replace(t, EmailRe, "<EMAIL>"), Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")
    df.select(col(idCol),
      n(EmailRe).as("n_emails"), n(Ipv4Re).as("n_ips"),
      n(PhoneRe).as("n_phones"),
      (n(EmailRe) + n(Ipv4Re) + n(PhoneRe) > 0).as("has_pii"),
      md5(redacted.cast("binary")).as("redacted_fp"))
  }

  def winnow(df: DataFrame, idCol: String, textCol: String,
             k: Int = 4, w: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val tok = df.select(col(idCol), posexplode(toks(col(textCol))))
      .toDF(idCol, "pos", "tk")
    // gram starting at pos: this token + the next k-1 (null-guarded by
    // requiring the last lead to exist)
    val gram = tok
      .withColumn("gram", concat_ws(" ",
        col("tk") +: (1 until k).map(i => lead(col("tk"), i).over(byDoc)): _*))
      .withColumn("valid", lead(col("tk"), k - 1).over(byDoc).isNotNull)
      .filter(col("valid"))
      .withColumn("h", substring(md5(col("gram").cast("binary")), 1, 16))
    // rolling forward min over w grams; a doc with fewer than w grams
    // keeps exactly its first (full-span) window
    val winMin = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    val counted = Window.partitionBy(col(idCol))
    gram
      .withColumn("fp", min(col("h")).over(winMin))
      .withColumn("n_g", count(lit(1)).over(counted))
      .withColumn("rn", row_number().over(byDoc))
      .filter(col("rn") <= greatest(col("n_g") - (w - 1), lit(1)))
      .select(col(idCol), col("fp"))
      .distinct()
  }

  /** BPE merge-rule induction (Sennrich et al. 2016, "Neural Machine
    * Translation of Rare Words with Subword Units") — the tokenizer-
    * training step of an LLM data pipeline, run IN the engine. Classic
    * byte-pair encoding over the word-frequency table: each word is a
    * space-separated symbol string (characters + a `</w>` end marker,
    * wrapped in sentinel spaces so merges are plain substring replaces);
    * each round counts adjacent symbol pairs weighted by word frequency,
    * merges the most frequent pair (ties broken by lexicographic
    * (lhs, rhs) — deterministic), and rewrites the vocabulary. Returns the
    * merge table `(step, lhs, rhs, merged, pair_freq)`.
    *
    * 100 TB shape: the ONLY corpus-scale step is the word-frequency
    * aggregate (one map-side-combined groupBy). Every merge round then
    * operates on the VOCABULARY table — orders of magnitude smaller than
    * the corpus and independent of corpus growth once saturated — cached
    * per round with the superstep-materialization discipline (see
    * [[graft.queries.Graph.pagerank]]: AQE only sees stats at
    * materialization boundaries). The per-round argmax is one row of
    * driver model state, exactly like a k-means centroid collect. */
  def bpeMerges(df: DataFrame, textCol: String, k: Int = 6): DataFrame = {
    val spark = df.sparkSession
    // DOUBLE-space separators with double-space sentinels: the merge
    // pattern " l  r " (single outer pads, the full double space inside)
    // consumes only the INNER half of each boundary, so consecutive
    // occurrences never fight over a shared delimiter — a plain
    // left-to-right non-overlapping replace is then EXACTLY greedy-left
    // BPE: 'banana' merges (a,n) twice ([b,an,an,a]), a run 'aaa' merges
    // once ([aa,a]). A single-space representation silently skipped
    // every second adjacent occurrence (review finding).
    val w0 = df
      .select(explode(regexp_extract_all(lower(col(textCol)), lit("\\w+"), lit(0)))
        .as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(concat(lit("  "),
          array_join(regexp_extract_all(col("word"), lit("."), lit(0)), "  "),
          lit("  </w>  ")).as("sym"),
        col("freq"))
    // r17: ONE job per merge round. The former shape paid TWO jobs per
    // round (an eager count() to materialize each round's rewritten
    // vocabulary cache, then the argmax collect) and kept every superseded
    // round's cache alive until release. Each round's argmax collect
    // already materializes that round's cache as a side effect (the pair
    // scan reads every partition), so the count() bought nothing; the
    // grandparent cache is freed as soon as its child is materialized, so
    // at most two vocabulary caches are ever live.
    var words = graft.CacheScope.cache(w0)
    var prev: org.apache.spark.sql.DataFrame = null
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    var exhausted = false
    for (step <- 1 to k if !exhausted) {
      val pairs = words
        .select(col("freq"), split(trim(col("sym")), "  ").as("arr"))
        .filter(size(col("arr")) >= 2)
        .select(col("freq"), col("arr"),
          explode(sequence(lit(0), size(col("arr")) - 2)).as("i"))
        .select(col("freq"),
          element_at(col("arr"), col("i") + 1).as("lhs"),
          element_at(col("arr"), col("i") + 2).as("rhs"))
        .groupBy(col("lhs"), col("rhs")).agg(sum(col("freq")).as("cnt"))
      val best = pairs
        .orderBy(col("cnt").desc, col("lhs"), col("rhs")).limit(1)
        .collect()
      // this round's `words` cache is now materialized; the round BEFORE
      // it can no longer be read by anything — free it
      if (prev != null) graft.CacheScope.free(prev)
      if (best.isEmpty) {
        // fully merged before k rounds (every word a single symbol): stop
        // instead of crashing; the twin's empty bestN CTEs emit the same
        // truncated merge table
        exhausted = true
      } else {
        val (l, r, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((step.toLong, l, r, l + r, cnt))
        prev = words
        words = graft.CacheScope.cache(words.select(
          regexp_replace(col("sym"),
            lit(java.util.regex.Pattern.quote(s" $l  $r ")),
            lit(java.util.regex.Matcher.quoteReplacement(s" $l$r "))).as("sym"),
          col("freq")))
      }
    }
    import spark.implicits._
    merges.result().toDF("step", "lhs", "rhs", "merged", "pair_freq")
      .orderBy(col("step"))
  }

  /** BPE ENCODE (VERDICT r14 #4; made scale-true in r16 per VERDICT r15
    * #2) — apply a TRAINED [[bpeMerges]] merge list to a corpus, yielding
    * each document's real subword token sequence (compactly: its token
    * count and a fingerprint of the full sequence), so the packing/mixing
    * surface can consume tokenizer-true counts instead of whitespace
    * counts. Encoding is the training rewrite replayed in merge order:
    * each document lowercases, splits to `\w+` words, and every word's
    * symbol list (chars + `</w>`) replays the ordered merge list, each
    * merge one left-to-right non-overlapping pass — greedy-left BPE, the
    * trainer's own discipline, so a word seen in training encodes to
    * exactly its final trained symbol string and an unseen word encodes
    * by the standard greedy merge-order rule.
    *
    * 100 TB shape: the merge table is driver-side MODEL state, shipped to
    * executors as ONE pair→rank hash map through a codegen'd expression's
    * reference array ([[graft.functions.BpeCodec]]) — O(1) PLAN size in
    * the merge count (the previous k-chained `replace` fold was bit-exact
    * but its k-deep expression tree stopped analyzing around production
    * merge counts; SCALE.md bpe_encode_ab measures the wall). Row-local:
    * no shuffle, no join, one output row per document, pipelining
    * straight into [[graft.queries.Pipeline]] packing. */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
                merges: Seq[(String, String)]): DataFrame = {
    val words = regexp_extract_all(lower(col(textCol)), lit("\\w+"), lit(0))
    df.select(col(idCol),
        graft.functions.BpeOps.bpeTokens(words, merges).as("sym"))
      .select(col(idCol),
        when(col("sym") === "", lit(0L))
          .otherwise(size(split(col("sym"), " ")).cast("long")).as("n_tokens"),
        md5(col("sym").cast("binary")).as("fp"))
  }

  /** Overlapping token-window chunking (RAG / context-window prep): fixed
    * `window`-token chunks every `stride` tokens, the final partial chunk
    * kept, empty docs emitting one empty chunk. Chunk count is
    * ceil(max(n-window,0)/stride)+1 — pure integer arithmetic, so both
    * engines agree exactly.
    *
    * Shape for 100 TB: tokenize → explode chunk ordinals → row-local
    * slice+join. NO shuffle anywhere — the output inherits the scan's
    * partitioning and pipelines straight into a downstream embed/dedup
    * stage; the only cost is the bounded ~window/stride× row fan-out. The
    * ordinal explode is the sanctioned generator form (a `transform` over a
    * per-chunk lambda would re-evaluate the token array per element when
    * CollapseProject inlines the alias — the r2 winnow O(n²) trap). */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            window: Int = 32, stride: Int = 24): DataFrame = {
    val base = df.select(col(idCol),
        regexp_extract_all(col(textCol), lit("\\S+"), lit(0)).as("ts"))
      .withColumn("n", size(col("ts")))
      .withColumn("k",
        expr(s"(greatest(n - $window, 0) + ${stride - 1}) div $stride + 1"))
    base
      .select(col(idCol), col("ts"), col("n"),
        explode(sequence(lit(0), col("k") - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        least(lit(window), col("n") - col("chunk_idx") * stride)
          .cast("long").as("n_tokens"),
        array_join(slice(col("ts"), col("chunk_idx") * stride + 1, lit(window)), " ")
          .as("chunk_text"))
  }
}
