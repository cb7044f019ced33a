package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis, TextIndex}

/** DuckDB SQL generators for the LSH oracles: the random hyperplanes are
  * deterministic literals ([[Similarity.planeComponent]]), so the twin can
  * embed the SAME constants and recompute signatures/bands/candidates
  * independently — Double.toString round-trips exactly through DuckDB's
  * literal parser, and sign(dot) flips only within ~1e-13 of zero
  * (probability ≈ 0 for the 64-dim fixture vectors). */
private object LshOracleSql {

  private def planeArray(p: Int, dim: Int): String =
    (0 until dim).map(d => Similarity.planeComponent(p, d).toString)
      .mkString("[", ", ", "]")

  /** Band-hash expression for band `b`: bit j set iff dot(e, plane_{b*r+j})
    * >= 0 — matching [[Similarity.lshSignature]] bit layout exactly. */
  private def bandExpr(b: Int, r: Int, dim: Int): String =
    (0 until r).map { j =>
      val p = b * r + j
      s"(CASE WHEN list_dot_product(e, ${planeArray(p, dim)}) >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")

  /** (vec_id, e, band, bh) — one row per vector per band. */
  def bandedSignatures(planes: Int, bands: Int, dim: Int): String = {
    val r = planes / bands
    (0 until bands).map { b =>
      s"SELECT vec_id, e, $b AS band, ${bandExpr(b, r, dim)} AS bh FROM v"
    }.mkString("\nUNION ALL ")
  }

  val cosSql =
    """ROUND(list_dot_product(va.e, vb.e) /
      |    (SQRT(list_dot_product(va.e, va.e)) * SQRT(list_dot_product(vb.e, vb.e))), 6)""".stripMargin

  /** Deterministic power-iteration start vector, 6dp decimals (seed row 97
    * of the centroid hash family — distinct from every IVF cell in use).
    * Exposed as exact BigDecimals so the Spark literals and the SQL
    * literals are the same values by construction. */
  def pcaInit(d: Int): java.math.BigDecimal =
    new java.math.BigDecimal(
      math.floor(Similarity.centroidComponent(97, d) * 1e6 + 0.5) / 1e6)
      .setScale(6, java.math.RoundingMode.HALF_UP)

  /** Twin of [[NorthStar.embPcaPower]]: the [[embCovarianceSql]] moment
    * CTEs widened to the full symmetric matrix with DECIMAL(12,6) entries,
    * then `iters` unrolled power steps — each a decimal-exact
    * matrix-vector product (order-independent SUM), an r6 re-quantized w,
    * a norm from the exact decimal square sum, and a 6dp-normalized next
    * vector. Every step is bit-deterministic in both engines, so the hash
    * gate pins the whole trajectory (converged or not). */
  def pcaPower(iters: Int, dim: Int): String = {
    require(iters >= 1)
    val v0 = (0 until dim)
      .map(d => s"($d, CAST('${pcaInit(d).toPlainString}' AS DECIMAL(12,6)))")
      .mkString(",\n    ")
    val sb = new StringBuilder
    sb.append(s"pv0 AS (SELECT * FROM (VALUES\n    $v0) t(d, val)),\n")
    for (t <- 1 to iters) {
      sb.append(s"""w$t AS (SELECT cov.i,
         |    CAST(FLOOR(CAST(SUM(cov.c6 * pv.val) AS DOUBLE) * 1e6 + 0.5)
         |      / 1e6 AS DECIMAL(12,6)) AS w6
         |  FROM cov JOIN pv${t - 1} pv ON pv.d = cov.j GROUP BY cov.i),
         |n$t AS (SELECT sqrt(CAST(SUM(w6 * w6) AS DOUBLE)) AS nrm FROM w$t),
         |""".stripMargin)
      if (t < iters)
        sb.append(s"pv$t AS (SELECT i AS d, CAST(FLOOR(CAST(w6 AS DOUBLE) / nrm " +
          s"* 1e6 + 0.5) / 1e6 AS DECIMAL(12,6)) AS val FROM w$t, n$t),\n")
    }
    val steps = sb.toString.stripSuffix(",\n").stripSuffix("\n").stripSuffix(",")
    s"""WITH vec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
       |e1 AS (SELECT vec_id, unnest(generate_series(1, len(e))) AS i, e FROM vec),
       |pp AS (SELECT vec_id, i, unnest(generate_series(i, len(e))) AS j, e FROM e1),
       |mm AS (
       |  SELECT CAST(i - 1 AS INT) AS d1, CAST(j - 1 AS INT) AS d2,
       |    COUNT(*) AS n,
       |    SUM(CAST(e[i] AS DECIMAL(20,8))) AS s1,
       |    SUM(CAST(e[j] AS DECIMAL(20,8))) AS s2,
       |    SUM(CAST(e[i] AS DECIMAL(20,8)) * CAST(e[j] AS DECIMAL(20,8))) AS s12
       |  FROM pp GROUP BY i, j),
       |cu AS (SELECT d1 AS i, d2 AS j,
       |  CAST(FLOOR((CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / n)
       |    / n * 1e6 + 0.5) / 1e6 AS DECIMAL(12,6)) AS c6 FROM mm),
       |cov AS (SELECT * FROM cu UNION ALL SELECT j, i, c6 FROM cu WHERE i != j),
       |$steps
       |SELECT i AS d,
       |  FLOOR(CAST(w6 AS DOUBLE) / nrm * 1e6 + 0.5) / 1e6 AS loading,
       |  FLOOR(nrm * 1e6 + 0.5) / 1e6 AS lambda
       |FROM w$iters, n$iters ORDER BY d""".stripMargin
  }

  /** Twin of [[Similarity.lshBandedPairs]] — including the hot-bucket cap
    * (`cb` excludes band buckets larger than `maxBucket`, exactly like
    * [[graft.operators.Dedup.capHotBuckets]]; deterministic, so the twin
    * stays a full-pipeline hash check even when the cap fires). */
  def bandedPairs(threshold: Double, planes: Int, bands: Int, dim: Int,
                  maxBucket: Int): String =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
       |sb AS (
       |${bandedSignatures(planes, bands, dim)}),
       |cb AS (
       |  SELECT * FROM (
       |    SELECT vec_id, band, bh, COUNT(*) OVER (PARTITION BY band, bh) bn
       |    FROM sb) WHERE bn <= $maxBucket),
       |cand AS (
       |  SELECT DISTINCT a.vec_id i, b.vec_id j
       |  FROM cb a JOIN cb b ON a.band = b.band AND a.bh = b.bh AND a.vec_id < b.vec_id)
       |SELECT i, j, cos_sim FROM (
       |  SELECT i, j, $cosSql AS cos_sim
       |  FROM cand JOIN v va ON va.vec_id = i JOIN v vb ON vb.vec_id = j)
       |WHERE cos_sim >= $threshold ORDER BY i, j""".stripMargin

  private def centroidArray(c: Int, dim: Int): String =
    (0 until dim).map(d => Similarity.centroidComponent(c, d).toString)
      .mkString("[", ", ", "]")

  /** Twin of [[Similarity.ivfTopK]]: the same literal centroids, the same
    * rank-1 cell assignment / top-nprobe probe cells, the same exact-cosine
    * re-rank — so the gate hash-checks the whole IVF pipeline. */
  def ivfTopK(k: Int, cells: Int, nprobe: Int, dim: Int,
              corpusPred: String = ""): String = {
    val scoreRows = (0 until cells).map { c =>
      s"SELECT vec_id, e, $c AS cell, list_dot_product(e, ${centroidArray(c, dim)}) AS score FROM v"
    }.mkString("\nUNION ALL ")
    // corpusPred restricts the SEARCHABLE corpus only (metadata-filtered
    // search) — probes still rank their cells against the full quantizer
    val cFilter =
      if (corpusPred.isEmpty) ""
      else s" AND vec_id IN (SELECT vec_id FROM embeddings WHERE $corpusPred)"
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
       |sc AS (
       |$scoreRows),
       |ranked AS (
       |  SELECT vec_id, cell, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY score DESC, cell) AS rnk
       |  FROM sc),
       |corpus_cells AS (SELECT vec_id AS nbr_id, cell FROM ranked WHERE rnk = 1$cFilter),
       |probe_cells AS (
       |  SELECT vec_id AS query_id, cell FROM ranked
       |  WHERE rnk <= $nprobe AND vec_id < 10),
       |scored AS (
       |  SELECT query_id, nbr_id, $cosSql AS cos_sim
       |  FROM probe_cells JOIN corpus_cells USING (cell)
       |  JOIN v va ON va.vec_id = query_id JOIN v vb ON vb.vec_id = nbr_id
       |  WHERE query_id != nbr_id)
       |SELECT query_id, rnk, nbr_id, cos_sim FROM (
       |  SELECT query_id, nbr_id, cos_sim, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos_sim DESC, nbr_id) AS rnk
       |  FROM scored)
       |WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  /** Shared SemDeDup tail: expects CTEs `v` (vec_id, e) and `sc`
    * (vec_id, e, cell, score) — rank-1 max-dot assignment, hot-cell cap,
    * cell-scoped dominated-by-any-earlier-row pairing. */
  private def semanticTail(threshold: Double, maxCell: Int): String =
    s"""ranked AS (
       |  SELECT vec_id, e, cell, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY score DESC, cell) AS rnk
       |  FROM sc),
       |a AS (SELECT vec_id, e, cell FROM ranked WHERE rnk = 1),
       |sized AS (
       |  SELECT vec_id, e, cell, COUNT(*) OVER (PARTITION BY cell) AS cn
       |  FROM a),
       |dup AS (
       |  SELECT DISTINCT vb.vec_id AS vec_id
       |  FROM sized va JOIN sized vb
       |    ON va.cell = vb.cell AND va.vec_id < vb.vec_id
       |    AND va.cn <= $maxCell AND vb.cn <= $maxCell
       |  WHERE $cosSql >= $threshold)
       |SELECT a.vec_id, a.cell, (dup.vec_id IS NOT NULL) AS is_dup
       |FROM a LEFT JOIN dup ON dup.vec_id = a.vec_id
       |ORDER BY a.vec_id""".stripMargin

  /** Twin of [[Similarity.semanticDedup]]: the same literal centroids,
    * rank-1 cell assignment, hot-cell cap, and cell-scoped
    * dominated-by-any-earlier-row pairing — the gate hash-checks the
    * whole SemDeDup pipeline. */
  def semanticDedup(threshold: Double, cells: Int, dim: Int,
                    maxCell: Int): String = {
    val scoreRows = (0 until cells).map { c =>
      s"SELECT vec_id, e, $c AS cell, list_dot_product(e, ${centroidArray(c, dim)}) AS score FROM v"
    }.mkString("\nUNION ALL ")
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
       |sc AS (
       |$scoreRows),
       |${semanticTail(threshold, maxCell)}""".stripMargin
  }

  private def arrayLitOf(a: Array[Double]): String =
    a.map(_.toString).mkString("[", ", ", "]")

  /** Twin of [[Similarity.semanticDedup2LevelWith]] over the deterministic
    * fine codebook: rank-1 against the coarse group means (the SAME
    * doubles — [[Similarity.coarseCentroids]] computes them once, both
    * sides embed them), then rank-1 among the winning group's fine cells,
    * then the shared [[semanticTail]]. */
  def semanticDedup2Level(threshold: Double, cells: Int, groupSize: Int,
                          dim: Int, maxCell: Int): String = {
    val fine = Array.tabulate(cells, dim)(Similarity.centroidComponent)
    val coarse = Similarity.coarseCentroids(fine, groupSize)
    val coarseRows = coarse.indices.map { j =>
      s"SELECT vec_id, $j AS grp, list_dot_product(e, ${arrayLitOf(coarse(j))}) AS score FROM v"
    }.mkString("\nUNION ALL ")
    val fineRows = (0 until cells).map { c =>
      s"SELECT vec_id, e, $c AS cell, ${c / groupSize} AS grp, list_dot_product(e, ${centroidArray(c, dim)}) AS score FROM v"
    }.mkString("\nUNION ALL ")
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
       |csc AS (
       |$coarseRows),
       |cwin AS (SELECT vec_id, grp FROM (
       |  SELECT vec_id, grp, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY score DESC, grp) AS rn FROM csc)
       |  WHERE rn = 1),
       |fsc AS (
       |$fineRows),
       |sc AS (SELECT f.vec_id, f.e, f.cell, f.score
       |  FROM fsc f JOIN cwin USING (vec_id, grp)),
       |${semanticTail(threshold, maxCell)}""".stripMargin
  }

  /** Twin of [[graft.operators.Similarity.hardNegatives]]: the same
    * literal-centroid rank-1 assignment and hot-cell cap as
    * [[semanticDedup]], then per anchor the (sim desc, id asc)-pinned best
    * same-label and different-label cell neighbors. */
  def hardNegatives(cells: Int, dim: Int, maxCell: Int): String = {
    val scoreRows = (0 until cells).map { c =>
      s"SELECT vec_id, label, e, $c AS cell, list_dot_product(e, ${centroidArray(c, dim)}) AS score FROM v"
    }.mkString("\nUNION ALL ")
    s"""WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) e FROM embeddings),
       |sc AS (
       |$scoreRows),
       |ranked AS (
       |  SELECT vec_id, label, e, cell, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY score DESC, cell) AS rnk
       |  FROM sc),
       |a AS (SELECT vec_id, label, e, cell FROM ranked WHERE rnk = 1),
       |cn AS (SELECT cell, COUNT(*) AS c FROM a GROUP BY cell),
       |ip AS (SELECT a.* FROM a JOIN cn USING (cell) WHERE c <= $maxCell),
       |pairs AS (
       |  SELECT va.vec_id AS a_id, va.label AS a_label,
       |    vb.vec_id AS b_id, vb.label AS b_label, $cosSql AS sim
       |  FROM ip va JOIN ip vb
       |    ON va.cell = vb.cell AND va.vec_id != vb.vec_id),
       |pos AS (SELECT a_id, b_id, sim FROM (
       |  SELECT a_id, b_id, sim, row_number() OVER (
       |    PARTITION BY a_id ORDER BY sim DESC, b_id) AS rn
       |  FROM pairs WHERE a_label = b_label) WHERE rn = 1),
       |neg AS (SELECT a_id, b_id, sim FROM (
       |  SELECT a_id, b_id, sim, row_number() OVER (
       |    PARTITION BY a_id ORDER BY sim DESC, b_id) AS rn
       |  FROM pairs WHERE a_label != b_label) WHERE rn = 1)
       |SELECT a.vec_id, a.label,
       |  pos.b_id AS pos_id, pos.sim AS pos_sim,
       |  neg.b_id AS neg_id, neg.sim AS neg_sim,
       |  ROUND(pos.sim - neg.sim, 6) AS margin
       |FROM a
       |LEFT JOIN pos ON pos.a_id = a.vec_id
       |LEFT JOIN neg ON neg.a_id = a.vec_id
       |ORDER BY a.vec_id""".stripMargin
  }

  /** Twin of the TRAINED SemDeDup composition: the [[kmeansCtes]] training
    * chain produces the codebook, assignment is max-dot against the trained
    * centroid lists (same as [[ivfTrainedTopK]]'s search-time rule), then
    * the shared [[semanticTail]]. */
  def semanticDedupTrained(threshold: Double, cells: Int, iters: Int,
                           dim: Int, maxCell: Int): String =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
       |${kmeansCtes(cells, iters, dim)},
       |tcf AS (SELECT s.cell, s.d, COALESCE(m.c, s.c) AS c
       |  FROM f${iters - 1} s LEFT JOIN m$iters m
       |  ON m.cell = s.cell AND m.d = s.d),
       |tc AS (SELECT cell, list(c ORDER BY d) AS carr FROM tcf GROUP BY cell),
       |sc AS (SELECT v.vec_id, e, t.cell, list_dot_product(e, t.carr) AS score
       |  FROM v CROSS JOIN tc t),
       |${semanticTail(threshold, maxCell)}""".stripMargin

  /** Twin of the IMI-TRAINED two-level SemDeDup
    * ([[Similarity.imiTrain]] feeding
    * [[Similarity.semanticDedup2LevelTrainedWith]]): recomputes the WHOLE
    * training pipeline —
    *   1. coarse k-means ([[kmeansCtes]] at k = groups, prefix `g`),
    *   2. serve-rule routing of every vector to its coarse group (max-dot,
    *      ties to the lowest group — the training partition IS the serving
    *      partition),
    *   3. `iters` joint fine Lloyd's iterations where each vector competes
    *      only among its own group's `groupSize` cells (min-L2 via the same
    *      dot-decomposed distance, ties to the lowest cell; exact decimal
    *      sums, r6 means; empty cells keep the previous generation),
    * then the two-level serve assignment (coarse max-dot rank-1, fine
    * max-dot rank-1 within the winning group) and the shared
    * [[semanticTail]]. Every trajectory step is hash-pinned. */
  def semanticDedupImi(threshold: Double, groups: Int, groupSize: Int,
                       iters: Int, dim: Int, maxCell: Int): String =
    s"""WITH ${imiModelCtes(groups, groupSize, iters, dim)},
       |${semanticTail(threshold, maxCell)}""".stripMargin

  /** The IMI training + serve-assignment CTE chain shared by
    * [[semanticDedupImi]] and [[imiTopK]] (no leading WITH). Produces:
    * `v` (vec_id, e), `gtc` (trained coarse group lists), `ftc` (trained
    * fine cell lists), `csc` (per-vector coarse scores), `cwin` (rank-1
    * group), `fsc` (per-vector fine scores with each cell's grp), and
    * `sc` (the winning group's fine scores — rank-1 over it is the
    * two-level assignment). */
  private def imiModelCtes(groups: Int, groupSize: Int, iters: Int,
                           dim: Int, trainPred: String = ""): String = {
    val k = groups * groupSize
    // trainPred restricts the TRAINING population (coarse k-means, routing,
    // fine Lloyd's) only — serve assignment (csc/cwin/fsc/sc) always covers
    // the full corpus, mirroring the frozen-model append lifecycle
    val vtCte =
      if (trainPred.isEmpty) ""
      else s"vt AS (SELECT * FROM v WHERE $trainPred),\n"
    val vTrain = if (trainPred.isEmpty) "v" else "vt"
    def exactArr(c: Int): String =
      (0 until dim)
        .map(d => s"CAST('${Similarity.centroidComponent(c, d)}' AS DOUBLE)")
        .mkString("[", ", ", "]")
    val fineInit = (0 until k).map(c => s"($c, ${exactArr(c)})")
      .mkString(",\n    ")
    def distExpr(carr: String) =
      s"list_dot_product(e, e) - 2.0 * list_dot_product(e, $carr) + " +
        s"list_dot_product($carr, $carr)"
    val fineIters = new StringBuilder
    for (it <- 1 to iters) {
      fineIters.append(
        s"""ffc${it - 1} AS (SELECT cell, list(c ORDER BY d) AS carr
           |  FROM ff${it - 1} GROUP BY cell),
           |fa$it AS (SELECT vec_id, cell FROM (
           |  SELECT r.vec_id, cc.cell, row_number() OVER (PARTITION BY r.vec_id
           |    ORDER BY ${distExpr("cc.carr")}, cc.cell) AS rn
           |  FROM rt r JOIN v USING (vec_id)
           |  JOIN ffc${it - 1} cc ON CAST(cc.cell // $groupSize AS INT) = r.grp)
           |  WHERE rn = 1),
           |fex$it AS (SELECT a.cell, unnest(generate_series(1, len(e))) AS i, e
           |  FROM fa$it a JOIN v USING (vec_id)),
           |fm$it AS (SELECT cell, CAST(i - 1 AS INT) AS d,
           |    FLOOR(CAST(SUM(CAST(e[i] AS DECIMAL(20,8))) AS DOUBLE) / COUNT(*)
           |      * 1e6 + 0.5) / 1e6 AS c
           |  FROM fex$it GROUP BY cell, i),
           |ff$it AS (SELECT s.cell, s.d, COALESCE(m.c, s.c) AS c
           |  FROM ff${it - 1} s LEFT JOIN fm$it m ON m.cell = s.cell AND m.d = s.d),
           |""".stripMargin)
    }
    s"""v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
       |$vtCte${kmeansCtes(groups, iters, dim, prefix = "g", vName = vTrain)},
       |gt AS (SELECT s.cell AS grp, s.d, COALESCE(m.c, s.c) AS c
       |  FROM gf${iters - 1} s LEFT JOIN gm$iters m
       |  ON m.cell = s.cell AND m.d = s.d),
       |gtc AS (SELECT grp, list(c ORDER BY d) AS carr FROM gt GROUP BY grp),
       |rt AS (SELECT vec_id, grp FROM (
       |  SELECT v.vec_id, g.grp, row_number() OVER (PARTITION BY v.vec_id
       |    ORDER BY list_dot_product(e, g.carr) DESC, g.grp) AS rn
       |  FROM $vTrain v CROSS JOIN gtc g) WHERE rn = 1),
       |ff0 AS (SELECT cell, CAST(i - 1 AS INT) AS d, carr[i] AS c FROM (
       |  SELECT cell, unnest(generate_series(1, $dim)) AS i, carr FROM (
       |    SELECT * FROM (VALUES
       |    $fineInit) t0(cell, carr)))),
       |${fineIters.toString}ftc AS (SELECT cell, list(c ORDER BY d) AS carr
       |  FROM ff$iters GROUP BY cell),
       |csc AS (SELECT v.vec_id, g.grp, list_dot_product(e, g.carr) AS score
       |  FROM v CROSS JOIN gtc g),
       |cwin AS (SELECT vec_id, grp FROM (
       |  SELECT vec_id, grp, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY score DESC, grp) AS rn FROM csc)
       |  WHERE rn = 1),
       |fsc AS (SELECT v.vec_id, v.e, t.cell,
       |    CAST(t.cell // $groupSize AS INT) AS grp,
       |    list_dot_product(e, t.carr) AS score
       |  FROM v CROSS JOIN ftc t),
       |sc AS (SELECT f.vec_id, f.e, f.cell, f.score
       |  FROM fsc f JOIN cwin USING (vec_id, grp))""".stripMargin
  }

  /** Twin of [[Similarity.imiTrainedTopK]] with probe set vec_id < 10:
    * the [[imiModelCtes]] chain recomputes the whole IMI trajectory, the
    * corpus inverted lists are rank-1 over `sc` (the two-level
    * assignment), probes take top-`nprobeGroups` groups from `csc` then
    * top-`nprobeCells` cells among those groups' `fsc` scores, and the
    * probed cells' members re-rank by the shared exact-cosine rule. */
  def imiTopK(k: Int, groups: Int, groupSize: Int, iters: Int, dim: Int,
              nprobeGroups: Int, nprobeCells: Int,
              trainPred: String = "",
              // servePred restricts the SERVED corpus only (the index's
              // tombstone-delete contract): training, lists assignment and
              // probes are unchanged — exactly what indexDelete leaves
              // frozen — and the deleted rows just stop being candidates
              servePred: String = ""): String = {
    val serveFilter = if (servePred.isEmpty) "" else s" AND ($servePred)"
    s"""WITH ${imiModelCtes(groups, groupSize, iters, dim, trainPred)},
       |corpus_cells AS (SELECT vec_id AS nbr_id, cell FROM (
       |  SELECT vec_id, cell, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY score DESC, cell) AS rn FROM sc)
       |  WHERE rn = 1$serveFilter),
       |pg AS (SELECT query_id, grp FROM (
       |  SELECT vec_id AS query_id, grp, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY score DESC, grp) AS rn
       |  FROM csc WHERE vec_id < 10) WHERE rn <= $nprobeGroups),
       |pc AS (SELECT query_id, cell FROM (
       |  SELECT p.query_id, f.cell, row_number() OVER (
       |    PARTITION BY p.query_id ORDER BY f.score DESC, f.cell) AS rn
       |  FROM pg p JOIN fsc f ON f.vec_id = p.query_id AND f.grp = p.grp)
       |  WHERE rn <= $nprobeCells),
       |scored AS (
       |  SELECT query_id, nbr_id, $cosSql AS cos_sim
       |  FROM pc JOIN corpus_cells USING (cell)
       |  JOIN v va ON va.vec_id = query_id JOIN v vb ON vb.vec_id = nbr_id
       |  WHERE query_id != nbr_id)
       |SELECT query_id, rnk, nbr_id, cos_sim FROM (
       |  SELECT query_id, nbr_id, cos_sim, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos_sim DESC, nbr_id) AS rnk
       |  FROM scored)
       |WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  /** Twin of [[Similarity.imiPqTopK]] with probe set vec_id < 10: the
    * [[imiModelCtes]] chain recomputes the trained IMI, the corpus index
    * joins the rank-1 two-level cells with [[pqCodes]]'s packed words,
    * probes fan out groups then cells exactly as [[imiTopK]], and the
    * probed cells' members score by the bit-sliced ADC CASE. */
  def imiPqTopK(k: Int, groups: Int, groupSize: Int, iters: Int, dim: Int,
                nprobeGroups: Int, nprobeCells: Int, subs: Int,
                ksub: Int, trainPred: String = ""): String = {
    val shift = Integer.numberOfTrailingZeros(ksub)
    val adc = (0 until subs).map { s =>
      val whens = (0 until ksub)
        .map(c => s"WHEN $c THEN d_${s}_$c").mkString(" ")
      s"(CASE ((pq_code >> ${s * shift}) & ${ksub - 1}) $whens END)"
    }.mkString("\n      + ")
    s"""WITH ${imiModelCtes(groups, groupSize, iters, dim, trainPred)},
       |corpus_cells AS (SELECT vec_id, cell FROM (
       |  SELECT vec_id, cell, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY score DESC, cell) AS rn FROM sc)
       |  WHERE rn = 1),
       |d AS (
       |  SELECT vec_id,
       |    ${pqDistCols(subs, ksub, dim)}
       |  FROM embeddings),
       |codes AS (
       |  SELECT vec_id,
       |    CAST(${pqPackedExpr(subs, ksub)} AS BIGINT) AS pq_code
       |  FROM d),
       |corpus_idx AS (
       |  SELECT cc.vec_id AS nbr_id, cc.cell, c.pq_code
       |  FROM corpus_cells cc JOIN codes c ON c.vec_id = cc.vec_id),
       |pg AS (SELECT query_id, grp FROM (
       |  SELECT vec_id AS query_id, grp, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY score DESC, grp) AS rn
       |  FROM csc WHERE vec_id < 10) WHERE rn <= $nprobeGroups),
       |pc AS (SELECT query_id, cell FROM (
       |  SELECT p.query_id, f.cell, row_number() OVER (
       |    PARTITION BY p.query_id ORDER BY f.score DESC, f.cell) AS rn
       |  FROM pg p JOIN fsc f ON f.vec_id = p.query_id AND f.grp = p.grp)
       |  WHERE rn <= $nprobeCells),
       |pd AS (
       |  SELECT vec_id AS query_id,
       |    ${pqDistCols(subs, ksub, dim)}
       |  FROM embeddings WHERE vec_id < 10),
       |scored AS (
       |  SELECT p.query_id, ci.nbr_id,
       |    FLOOR(($adc) * 1e6 + 0.5) / 1e6 AS adc_dist
       |  FROM pc p JOIN corpus_idx ci USING (cell)
       |  JOIN pd ON pd.query_id = p.query_id
       |  WHERE p.query_id != ci.nbr_id)
       |SELECT query_id, rnk, nbr_id, adc_dist FROM (
       |  SELECT query_id, nbr_id, adc_dist, row_number() OVER (
       |    PARTITION BY query_id ORDER BY adc_dist, nbr_id) AS rnk
       |  FROM scored)
       |WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  /** Shared select list of probe/corpus→centroid squared distances
    * `d_s_k` — the same fixed-order folds as [[Similarity.pqCodes]]. */
  private def pqDistCols(subs: Int, ksub: Int, dim: Int): String = {
    val ds = dim / subs
    def dist(s: Int, k: Int): String =
      (0 until ds).map { d =>
        val c = Similarity.pqComponent(s, k, d).toString
        val x = s"CAST(embedding[${s * ds + d + 1}] AS DOUBLE)"
        s"(($x - $c) * ($x - $c))"
      }.mkString(" + ")
    (for (s <- 0 until subs; k <- 0 until ksub)
      yield s"${dist(s, k)} AS d_${s}_$k").mkString(",\n    ")
  }

  /** Mixed-radix packed code word from the argmin of each subspace's
    * `d_s_k` columns (ties → lowest k, same CASE order as the plan). */
  private def pqPackedExpr(subs: Int, ksub: Int): String = {
    def code(s: Int): String = {
      val whens = (0 until ksub - 1).map { k =>
        val conds = (k + 1 until ksub)
          .map(j => s"d_${s}_$k <= d_${s}_$j").mkString(" AND ")
        s"WHEN $conds THEN $k"
      }.mkString(" ")
      s"(CASE $whens ELSE ${ksub - 1} END)"
    }
    val weights = Iterator.iterate(1L)(_ * ksub).take(subs).toSeq
    (0 until subs).map(s => s"${code(s)} * ${weights(s)}").mkString(" + ")
  }

  /** Twin of [[Similarity.pqCodes]]: the same literal codebooks
    * ([[Similarity.pqComponent]]), the same left-associated fixed-order
    * squared-difference sums (identical double bits), the same
    * ties-to-lowest argmin and mixed-radix packing. Distances compute once
    * in a CTE; the outer select does the argmin/pack/error arithmetic. */
  def pqCodes(subs: Int, ksub: Int, dim: Int): String = {
    val err = (0 until subs).map(s =>
      s"LEAST(${(0 until ksub).map(k => s"d_${s}_$k").mkString(", ")})")
      .mkString(" + ")
    s"""WITH d AS (
       |  SELECT vec_id,
       |    ${pqDistCols(subs, ksub, dim)}
       |  FROM embeddings)
       |SELECT vec_id, CAST(${pqPackedExpr(subs, ksub)} AS BIGINT) AS pq_code,
       |  FLOOR(($err) * 1e6 + 0.5) / 1e6 AS recon_err
       |FROM d ORDER BY vec_id""".stripMargin
  }

  /** Twin of [[Similarity.pqTopK]] with probe set vec_id < 10: corpus
    * re-encoded from the `d_s_k` distances, probe table re-derived from
    * the SAME select list, ADC assembled per subspace by bit-slicing the
    * code word into a CASE over the probe's distance columns — the SQL
    * mirror of the `element_at` table lookup. */
  def pqTopK(k: Int, subs: Int, ksub: Int, dim: Int): String = {
    val shift = Integer.numberOfTrailingZeros(ksub)
    val adc = (0 until subs).map { s =>
      val whens = (0 until ksub)
        .map(c => s"WHEN $c THEN d_${s}_$c").mkString(" ")
      s"(CASE ((pq_code >> ${s * shift}) & ${ksub - 1}) $whens END)"
    }.mkString("\n      + ")
    s"""WITH d AS (
       |  SELECT vec_id,
       |    ${pqDistCols(subs, ksub, dim)}
       |  FROM embeddings),
       |codes AS (
       |  SELECT vec_id AS nbr_id,
       |    CAST(${pqPackedExpr(subs, ksub)} AS BIGINT) AS pq_code
       |  FROM d),
       |pd AS (
       |  SELECT vec_id AS query_id,
       |    ${pqDistCols(subs, ksub, dim)}
       |  FROM embeddings WHERE vec_id < 10),
       |scored AS (
       |  SELECT query_id, nbr_id,
       |    FLOOR(($adc) * 1e6 + 0.5) / 1e6 AS adc_dist
       |  FROM codes CROSS JOIN pd
       |  WHERE query_id != nbr_id)
       |SELECT query_id, rnk, nbr_id, adc_dist FROM (
       |  SELECT query_id, nbr_id, adc_dist,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc_dist, nbr_id) AS rnk
       |  FROM scored)
       |WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  /** Twin of [[Similarity.kmeansTrain]]: the same literal init centroids
    * ([[centroidArray]]), each iteration an assign CTE (argmin of the
    * dot-decomposed L2², ties → lowest cell) + an update CTE (exact
    * decimal dimension sums, r6 mean), empty cells filled from the
    * previous generation — so the gate hash-checks the whole training
    * trajectory, collected driver-side literals included. */
  /** The iteration CTE chain shared by [[kmeansTrain]] and
    * [[ivfTrainedTopK]]: assumes a `v (vec_id, e DOUBLE[])` CTE is already
    * in scope; defines f0 (init), then per iteration c/a/ex/m CTEs, ending
    * (no trailing comma) at `m{iters}`. `f{iters-1}` carries the previous
    * generation for empty-cell fills. */
  private def kmeansCtes(k: Int, iters: Int, dim: Int,
                         prefix: String = "", vName: String = "v",
                         init: (Int, Int) => Double =
                           Similarity.centroidComponent): String = {
    def nm(name: String) = s"$prefix$name"
    // String-cast element literals: DuckDB parses bare numeric literals
    // as DECIMAL (losing the last ulp of a 17-digit double — CAST
    // (-0.09185728993818969 AS DOUBLE) ≠ CAST('-0.09185728993818969' AS
    // DOUBLE)); the string cast round-trips exactly like Scala's
    // Double.toString parse, so untouched empty-cell centroids hash-match.
    def exactArr(c: Int): String =
      (0 until dim)
        .map(d => s"CAST('${init(c, d)}' AS DOUBLE)")
        .mkString("[", ", ", "]")
    val initVals = (0 until k)
      .map(c => s"($c, ${exactArr(c)})").mkString(",\n    ")
    def distExpr(carr: String) =
      s"list_dot_product(e, e) - 2.0 * list_dot_product(e, $carr) + " +
        s"list_dot_product($carr, $carr)"
    val sb = new StringBuilder
    sb.append(s"${nm("c0raw")} AS (SELECT * FROM (VALUES\n    $initVals) t0(cell, carr)),\n")
    sb.append(s"${nm("f0")} AS (SELECT cell, CAST(i - 1 AS INT) AS d, carr[i] AS c FROM (\n")
    sb.append(s"  SELECT cell, unnest(generate_series(1, $dim)) AS i, carr FROM ${nm("c0raw")})),\n")
    for (it <- 1 to iters) {
      sb.append(s"${nm(s"c${it - 1}")} AS (SELECT cell, list(c ORDER BY d) AS carr " +
        s"FROM ${nm(s"f${it - 1}")} GROUP BY cell),\n")
      sb.append(s"""${nm(s"a$it")} AS (SELECT vec_id, cell FROM (
         |  SELECT v.vec_id, cc.cell, row_number() OVER (PARTITION BY v.vec_id
         |    ORDER BY ${distExpr("cc.carr")}, cc.cell) AS rn
         |  FROM $vName v CROSS JOIN ${nm(s"c${it - 1}")} cc) WHERE rn = 1),
         |${nm(s"ex$it")} AS (SELECT a.cell, unnest(generate_series(1, len(e))) AS i, e
         |  FROM ${nm(s"a$it")} a JOIN $vName USING (vec_id)),
         |${nm(s"m$it")} AS (SELECT cell, CAST(i - 1 AS INT) AS d, COUNT(*) AS n,
         |    FLOOR(CAST(SUM(CAST(e[i] AS DECIMAL(20,8))) AS DOUBLE) / COUNT(*)
         |      * 1e6 + 0.5) / 1e6 AS c
         |  FROM ${nm(s"ex$it")} GROUP BY cell, i),
         |""".stripMargin)
      if (it < iters)
        sb.append(s"${nm(s"f$it")} AS (SELECT s.cell, s.d, COALESCE(m.c, s.c) AS c " +
          s"FROM ${nm(s"f${it - 1}")} s LEFT JOIN ${nm(s"m$it")} m ON m.cell = s.cell AND m.d = s.d),\n")
    }
    sb.toString.stripSuffix(",\n").stripSuffix("\n").stripSuffix(",")
  }

  def kmeansTrain(k: Int, iters: Int, dim: Int): String =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
       |${kmeansCtes(k, iters, dim)}
       |SELECT s.cell, s.d, COALESCE(m.c, s.c) AS c_val,
       |  COALESCE(m.n, 0) AS n_members
       |FROM f${iters - 1} s LEFT JOIN m$iters m
       |  ON m.cell = s.cell AND m.d = s.d
       |ORDER BY s.cell, s.d""".stripMargin

  /** Twin of [[Similarity.ivfTrainedTopK]] with probe set vec_id < 10: the
    * [[kmeansCtes]] training chain feeding the [[ivfTopK]] search tail,
    * with cell scores computed against the trained centroid lists. */
  def ivfTrainedTopK(k: Int, cells: Int, nprobe: Int, iters: Int,
                     dim: Int): String =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
       |${kmeansCtes(cells, iters, dim)},
       |tcf AS (SELECT s.cell, s.d, COALESCE(m.c, s.c) AS c
       |  FROM f${iters - 1} s LEFT JOIN m$iters m
       |  ON m.cell = s.cell AND m.d = s.d),
       |tc AS (SELECT cell, list(c ORDER BY d) AS carr FROM tcf GROUP BY cell),
       |sc AS (SELECT v.vec_id, t.cell, list_dot_product(e, t.carr) AS score
       |  FROM v CROSS JOIN tc t),
       |ranked AS (
       |  SELECT vec_id, cell, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY score DESC, cell) AS rnk
       |  FROM sc),
       |corpus_cells AS (SELECT vec_id AS nbr_id, cell FROM ranked WHERE rnk = 1),
       |probe_cells AS (
       |  SELECT vec_id AS query_id, cell FROM ranked
       |  WHERE rnk <= $nprobe AND vec_id < 10),
       |scored AS (
       |  SELECT query_id, nbr_id, $cosSql AS cos_sim
       |  FROM probe_cells JOIN corpus_cells USING (cell)
       |  JOIN v va ON va.vec_id = query_id JOIN v vb ON vb.vec_id = nbr_id
       |  WHERE query_id != nbr_id)
       |SELECT query_id, rnk, nbr_id, cos_sim FROM (
       |  SELECT query_id, nbr_id, cos_sim, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos_sim DESC, nbr_id) AS rnk
       |  FROM scored)
       |WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin

  /** Per-subspace trained-codebook CTEs shared by [[pqTrainedTopK]] and
    * [[ivfPqTrainedTopK]]: for each subspace s — the subvector slice view
    * `v{s}`, its [[kmeansCtes]] training chain, the trained codebook list
    * `s{s}_tc`, all (vec, candidate) distances `s{s}_cd` (dot-identity,
    * same assoc as the Spark side), the argmin code `s{s}_code`, and the
    * probe distance rows `s{s}_pd`. */
  private def pqSubspaceCtes(subs: Int, ksub: Int, iters: Int,
                             ds: Int, trainPred: String = ""): String =
    (0 until subs).map { s =>
      val p = s"s${s}_"
      // trainPred restricts the TRAINING population only — codes and
      // probe distances still cover all of v (the append-without-retrain
      // contract: late vectors are encoded by the frozen codebooks)
      val trainCte =
        if (trainPred.isEmpty) ""
        else s"vt$s AS (SELECT * FROM v$s WHERE $trainPred),\n"
      val vTrain = if (trainPred.isEmpty) s"v$s" else s"vt$s"
      s"""v$s AS (SELECT vec_id, e[${s * ds + 1}:${(s + 1) * ds}] AS e FROM v),
         |$trainCte${kmeansCtes(ksub, iters, ds, prefix = p, vName = vTrain,
             init = (c, d) => Similarity.pqComponent(s, c, d))},
         |${p}tc AS (SELECT s.cell, list(COALESCE(m.c, s.c) ORDER BY s.d) AS carr
         |  FROM ${p}f${iters - 1} s LEFT JOIN ${p}m$iters m
         |  ON m.cell = s.cell AND m.d = s.d GROUP BY s.cell),
         |${p}cd AS (SELECT w.vec_id, t.cell AS ck,
         |  list_dot_product(w.e, w.e) - 2.0 * list_dot_product(w.e, t.carr)
         |    + list_dot_product(t.carr, t.carr) AS dist
         |  FROM v$s w CROSS JOIN ${p}tc t),
         |${p}code AS (SELECT vec_id, ck AS c FROM (
         |  SELECT vec_id, ck, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY dist, ck) AS rn FROM ${p}cd) WHERE rn = 1),
         |${p}pd AS (SELECT vec_id AS query_id, ck, dist FROM ${p}cd
         |  WHERE vec_id < 10)""".stripMargin
    }.mkString(",\n")

  /** The `codes` CTE body (mixed-radix pack of the per-subspace argmins). */
  private def pqCodesCte(subs: Int, ksub: Int): String = {
    val weights = Iterator.iterate(1L)(_ * ksub).take(subs).toSeq
    val codeExpr = (0 until subs)
      .map(s => s"CAST(c$s.c AS BIGINT) * ${weights(s)}").mkString(" + ")
    val codeJoins = (0 until subs).map { s =>
      if (s == 0) s"FROM s0_code c0"
      else s"JOIN s${s}_code c$s USING (vec_id)"
    }.mkString("\n  ")
    s"codes AS (SELECT c0.vec_id, $codeExpr AS pq_code\n  $codeJoins)"
  }

  /** Left-assoc explicit ADC sum `q0.dist + … + q{subs-1}.dist` — never an
    * unordered SUM (engine-chosen order could flip the r6 rounding). */
  private def pqAdcExpr(subs: Int): String =
    (0 until subs).map(s => s"q$s.dist").mkString(" + ")

  /** Joins picking each subspace's probe-distance row by the bit-sliced
    * code; `anchor` is the column every q{s}.query_id equates to ("" makes
    * q0 the anchor, the plain-PQ case). */
  private def pqAdcJoins(subs: Int, ksub: Int, anchor: String): String = {
    val shift = Integer.numberOfTrailingZeros(ksub)
    (0 until subs).map { s =>
      val cond = s"q$s.ck = CAST((c.pq_code >> ${s * shift}) & ${ksub - 1} AS INT)"
      val qid =
        if (s == 0 && anchor.isEmpty) "" else
          s"q$s.query_id = ${if (anchor.isEmpty) "q0.query_id" else anchor} AND "
      s"JOIN s${s}_pd q$s ON $qid$cond"
    }.mkString("\n  ")
  }

  /** Twin of [[Similarity.pqTrainedTopK]] with probe set vec_id < 10: one
    * [[kmeansCtes]] chain per subspace (over the sliced subvectors, init =
    * the pqComponent literals), trained codebooks regrouped to lists, then
    * codes via argmin of the dot-identity distance (the exact form the
    * Spark side evaluates — `(dot(x,x) − 2·dot(x,c)) + cc`, left-assoc),
    * and the ADC sum assembled by joining each subspace's probe-distance
    * row on the bit-sliced code — an explicit left-assoc d0+d1+…+d7, never
    * an unordered SUM (8 doubles summed in engine-chosen order could flip
    * the r6 rounding). */
  def pqTrainedTopK(k: Int, subs: Int, ksub: Int, iters: Int,
                    dim: Int, trainPred: String = ""): String =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
       |${pqSubspaceCtes(subs, ksub, iters, dim / subs, trainPred)},
       |${pqCodesCte(subs, ksub)},
       |scored AS (
       |  SELECT q0.query_id, c.vec_id AS nbr_id,
       |    FLOOR((${pqAdcExpr(subs)}) * 1e6 + 0.5) / 1e6 AS adc_dist
       |  FROM codes c
       |  ${pqAdcJoins(subs, ksub, anchor = "")}
       |  WHERE q0.query_id != c.vec_id)
       |SELECT query_id, rnk, nbr_id, adc_dist FROM (
       |  SELECT query_id, nbr_id, adc_dist, row_number() OVER (
       |    PARTITION BY query_id ORDER BY adc_dist, nbr_id) AS rnk
       |  FROM scored)
       |WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin

  /** Twin of [[Similarity.ivfPqTrainedTopK]] with probe set vec_id < 10:
    * the coarse [[kmeansCtes]] chain ranks cells (corpus rank-1, probe
    * top-nprobe) exactly like [[ivfTrainedTopK]], the [[pqSubspaceCtes]]
    * chains encode, and the ADC joins anchor on the probe-cell pairs. */
  def ivfPqTrainedTopK(k: Int, cells: Int, nprobe: Int, subs: Int,
                       ksub: Int, iters: Int, dim: Int): String =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
       |${kmeansCtes(cells, iters, dim)},
       |tcf AS (SELECT s.cell, s.d, COALESCE(m.c, s.c) AS c
       |  FROM f${iters - 1} s LEFT JOIN m$iters m
       |  ON m.cell = s.cell AND m.d = s.d),
       |tc AS (SELECT cell, list(c ORDER BY d) AS carr FROM tcf GROUP BY cell),
       |csc AS (SELECT v.vec_id, t.cell, list_dot_product(e, t.carr) AS score
       |  FROM v CROSS JOIN tc t),
       |cranked AS (SELECT vec_id, cell, row_number() OVER (
       |  PARTITION BY vec_id ORDER BY score DESC, cell) AS rnk FROM csc),
       |corpus_cells AS (SELECT vec_id AS nbr_id, cell FROM cranked WHERE rnk = 1),
       |probe_cells AS (SELECT vec_id AS query_id, cell FROM cranked
       |  WHERE rnk <= $nprobe AND vec_id < 10),
       |${pqSubspaceCtes(subs, ksub, iters, dim / subs)},
       |${pqCodesCte(subs, ksub)},
       |scored AS (
       |  SELECT pc.query_id, c.vec_id AS nbr_id,
       |    FLOOR((${pqAdcExpr(subs)}) * 1e6 + 0.5) / 1e6 AS adc_dist
       |  FROM codes c
       |  JOIN corpus_cells cc ON cc.nbr_id = c.vec_id
       |  JOIN probe_cells pc ON pc.cell = cc.cell
       |  ${pqAdcJoins(subs, ksub, anchor = "pc.query_id")}
       |  WHERE pc.query_id != c.vec_id)
       |SELECT query_id, rnk, nbr_id, adc_dist FROM (
       |  SELECT query_id, nbr_id, adc_dist, row_number() OVER (
       |    PARTITION BY query_id ORDER BY adc_dist, nbr_id) AS rnk
       |  FROM scored)
       |WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin

  /** Twin of [[Similarity.pqRerankTopK]] with probe set vec_id < 10: the
    * [[pqTopK]] CTE chain truncated at `kCand` candidates, re-scored by
    * the exact [[cosSql]] cosine and re-ranked. */
  def pqRerank(k: Int, kCand: Int, subs: Int, ksub: Int, dim: Int): String = {
    val shift = Integer.numberOfTrailingZeros(ksub)
    val adc = (0 until subs).map { s =>
      val whens = (0 until ksub)
        .map(c => s"WHEN $c THEN d_${s}_$c").mkString(" ")
      s"(CASE ((pq_code >> ${s * shift}) & ${ksub - 1}) $whens END)"
    }.mkString("\n      + ")
    s"""WITH d AS (
       |  SELECT vec_id,
       |    ${pqDistCols(subs, ksub, dim)}
       |  FROM embeddings),
       |codes AS (
       |  SELECT vec_id AS nbr_id,
       |    CAST(${pqPackedExpr(subs, ksub)} AS BIGINT) AS pq_code
       |  FROM d),
       |pd AS (
       |  SELECT vec_id AS query_id,
       |    ${pqDistCols(subs, ksub, dim)}
       |  FROM embeddings WHERE vec_id < 10),
       |adcs AS (
       |  SELECT query_id, nbr_id,
       |    FLOOR(($adc) * 1e6 + 0.5) / 1e6 AS adc_dist
       |  FROM codes CROSS JOIN pd
       |  WHERE query_id != nbr_id),
       |cand AS (
       |  SELECT query_id, nbr_id FROM (
       |    SELECT query_id, nbr_id, row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc_dist, nbr_id) AS rnk
       |    FROM adcs) WHERE rnk <= $kCand),
       |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
       |rescored AS (
       |  SELECT query_id, nbr_id, $cosSql AS cos_sim
       |  FROM cand JOIN v va ON va.vec_id = query_id JOIN v vb ON vb.vec_id = nbr_id)
       |SELECT query_id, rnk, nbr_id, cos_sim FROM (
       |  SELECT query_id, nbr_id, cos_sim, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos_sim DESC, nbr_id) AS rnk
       |  FROM rescored)
       |WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  /** Twin of [[Similarity.ivfPqTopK]] with probe set vec_id < 10:
    * composes the ivfTopK cell CTEs (corpus rank-1 cell, probe top-nprobe
    * cells) with the pqTopK code/ADC CTEs — the cell join prunes, the
    * bit-sliced CASE scores. */
  def ivfPqTopK(k: Int, cells: Int, nprobe: Int, subs: Int, ksub: Int,
                dim: Int): String = {
    val shift = Integer.numberOfTrailingZeros(ksub)
    val scoreRows = (0 until cells).map { c =>
      s"SELECT vec_id, $c AS cell, list_dot_product(e, ${centroidArray(c, dim)}) AS score FROM v"
    }.mkString("\nUNION ALL ")
    val adc = (0 until subs).map { s =>
      val whens = (0 until ksub)
        .map(c => s"WHEN $c THEN d_${s}_$c").mkString(" ")
      s"(CASE ((pq_code >> ${s * shift}) & ${ksub - 1}) $whens END)"
    }.mkString("\n      + ")
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
       |sc AS (
       |$scoreRows),
       |ranked AS (
       |  SELECT vec_id, cell, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY score DESC, cell) AS rnk
       |  FROM sc),
       |d AS (
       |  SELECT vec_id,
       |    ${pqDistCols(subs, ksub, dim)}
       |  FROM embeddings),
       |codes AS (
       |  SELECT vec_id,
       |    CAST(${pqPackedExpr(subs, ksub)} AS BIGINT) AS pq_code
       |  FROM d),
       |corpus_idx AS (
       |  SELECT r.vec_id AS nbr_id, r.cell, c.pq_code
       |  FROM ranked r JOIN codes c ON c.vec_id = r.vec_id
       |  WHERE r.rnk = 1),
       |probe_cells AS (
       |  SELECT vec_id AS query_id, cell FROM ranked
       |  WHERE rnk <= $nprobe AND vec_id < 10),
       |pd AS (
       |  SELECT vec_id AS query_id,
       |    ${pqDistCols(subs, ksub, dim)}
       |  FROM embeddings WHERE vec_id < 10),
       |scored AS (
       |  SELECT pc.query_id, ci.nbr_id,
       |    FLOOR(($adc) * 1e6 + 0.5) / 1e6 AS adc_dist
       |  FROM probe_cells pc
       |  JOIN corpus_idx ci USING (cell)
       |  JOIN pd ON pd.query_id = pc.query_id
       |  WHERE pc.query_id != ci.nbr_id)
       |SELECT query_id, rnk, nbr_id, adc_dist FROM (
       |  SELECT query_id, nbr_id, adc_dist,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc_dist, nbr_id) AS rnk
       |  FROM scored)
       |WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  /** Twin of [[Similarity.lshTopK]] with probe set vec_id < 10 — including
    * the CORPUS-side hot-bucket cap (`cb` mirrors
    * [[graft.operators.Dedup.capHotBuckets]]; probes stay uncapped, same
    * as the Spark side). */
  def lshTopK(k: Int, planes: Int, bands: Int, dim: Int,
              maxBucket: Int): String =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
       |sb AS (
       |${bandedSignatures(planes, bands, dim)}),
       |cb AS (
       |  SELECT * FROM (
       |    SELECT vec_id, band, bh, COUNT(*) OVER (PARTITION BY band, bh) bn
       |    FROM sb) WHERE bn <= $maxBucket),
       |cand AS (
       |  SELECT DISTINCT p.vec_id query_id, c.vec_id nbr_id
       |  FROM sb p JOIN cb c ON p.band = c.band AND p.bh = c.bh
       |  WHERE p.vec_id < 10 AND c.vec_id != p.vec_id),
       |scored AS (
       |  SELECT query_id, nbr_id, $cosSql AS cos_sim
       |  FROM cand JOIN v va ON va.vec_id = query_id JOIN v vb ON vb.vec_id = nbr_id)
       |SELECT query_id, rnk, nbr_id, cos_sim FROM (
       |  SELECT query_id, nbr_id, cos_sim, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos_sim DESC, nbr_id) AS rnk
       |  FROM scored)
       |WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
}

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

  /** Asymmetric containment dedup: |A∩B| / min(|A|,|B|) ≥ 0.8 over the
    * same 3-gram shingle sets — flags short-doc-inside-long-doc pairs that
    * Jaccard's symmetric denominator dilutes below any usable threshold. */
  def dedupContainment(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.containmentPairs(
        graft.operators.Dedup.shingles(Tables.documents(s, dir), "doc_id", "text", 3), 0.8)
      .orderBy(col("i"), col("j"))

  val dedupContainmentSql: String =
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
      |SELECT i, j, containment FROM (
      |  SELECT i, j, ROUND(CAST(c AS DOUBLE)/least(si.n, sj.n), 6) containment
      |  FROM pairs JOIN sizes si ON si.doc_id=i JOIN sizes sj ON sj.doc_id=j)
      |WHERE containment >= 0.8 ORDER BY i, j""".stripMargin

  def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(
        Dedup.shingles(Tables.documents(s, dir), "doc_id", "text", 3),
        k = 64, r = 4, threshold = 0.5)
      .orderBy(col("i"), col("j"))

  /** Incremental / decontamination dedup: near-dup pairs between an
    * incoming batch (every 5th doc — a deterministic 20% "new crawl") and
    * the held corpus (the rest), via [[Dedup.minhashLshPairsCross]]. The
    * band join never pairs the corpus against itself — the shape that lets
    * a daily batch dedup against 100 TB of history. Recall argument is the
    * same as `dedup_minhash_lsh`: every fixture cross pair sits at
    * jaccard ≥ 0.9, where 16 bands of r=4 miss with p ≈ 3e-8. */
  def dedupCross(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val incoming = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    Dedup.minhashLshPairsCross(
        Dedup.shingles(incoming, "doc_id", "text", 3),
        Dedup.shingles(corpus, "doc_id", "text", 3),
        k = 64, r = 4, threshold = 0.5)
      .orderBy(col("i"), col("j"))
  }

  val dedupCrossSql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '\w+') ts FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, len(ts)-2),
      |    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) s
      |  FROM toks WHERE len(ts) >= 3),
      |sizes AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY 1),
      |pairs AS (
      |  SELECT a.doc_id i, b.doc_id j, COUNT(*) c
      |  FROM sh a JOIN sh b ON a.s = b.s
      |  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
      |  GROUP BY 1, 2)
      |SELECT i, j, ROUND(CAST(c AS DOUBLE)/(si.n+sj.n-c), 6) jac
      |FROM pairs JOIN sizes si ON si.doc_id=i JOIN sizes sj ON sj.doc_id=j
      |WHERE CAST(c AS DOUBLE)/(si.n+sj.n-c) >= 0.5 ORDER BY i, j""".stripMargin

  /** [[dedupCross]] against a PERSISTED signature index — the dedup
    * family's write-once/check-many lifecycle ([[Dedup.dedupIndexWrite]] /
    * `Append` / `Compact` / `Check`): the held corpus's banded buckets,
    * hashed shingle sets and per-doc sizes persist as generational parquet
    * tables; half the corpus writes the base index, the other half appends
    * (its signatures computed once, at arrival), the fragmented tables
    * compact, and the incoming 20% batch checks against the STORED tables
    * — per-batch cost tracks the batch, not the history. Same corpus
    * split, parameters and recall argument as `dedup_cross`, so the twin
    * is IDENTICAL — a signature drifted through the parquet round-trip, a
    * batch lost by append or compaction, or a verification against stale
    * sizes all break the hash. */
  def dedupCrossIndex(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val held = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val base = held.filter(pmod(col("doc_id"), lit(2)) =!= 0)
    val late = held.filter(pmod(col("doc_id"), lit(2)) === 0)
    val incoming = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val path = Streaming.tempWorkspace("graft-dedup-index")
    Dedup.dedupIndexWrite(Dedup.shingles(base, "doc_id", "text", 3), path,
      k = 64, r = 4)
    Dedup.dedupIndexAppend(Dedup.shingles(late, "doc_id", "text", 3), path,
      k = 64, r = 4)
    Dedup.dedupIndexCompact(s, path)
    Dedup.dedupIndexCheck(s, Dedup.shingles(incoming, "doc_id", "text", 3),
        path, k = 64, r = 4, threshold = 0.5)
      .orderBy(col("i"), col("j"))
  }

  val dedupCrossIndexSql: String = dedupCrossSql

  /** [[dedupCrossIndex]] with a TAKEDOWN in the lifecycle
    * ([[Dedup.dedupIndexDelete]]): a third of the held docs are
    * tombstone-deleted after the index is built, and the incoming batch's
    * check must stop matching them immediately — the held tables stay
    * untouched (ids-only tombstones, anti-joined at check;
    * [[Dedup.dedupIndexVacuum]] folds them in on the maintenance cadence,
    * IndexDeleteSpec pins vacuum identity). The twin filters the deleted
    * docs from the held side of the cross pairs. */
  def dedupCrossIndexDelete(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val held = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val incoming = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val path = Streaming.tempWorkspace("graft-dedup-index-del")
    Dedup.dedupIndexWrite(Dedup.shingles(held, "doc_id", "text", 3), path,
      k = 64, r = 4)
    Dedup.dedupIndexDelete(s,
      held.filter(pmod(col("doc_id"), lit(3)) === 1).select(col("doc_id")),
      "doc_id", path)
    Dedup.dedupIndexCheck(s, Dedup.shingles(incoming, "doc_id", "text", 3),
        path, k = 64, r = 4, threshold = 0.5)
      .orderBy(col("i"), col("j"))
  }

  val dedupCrossIndexDeleteSql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '\w+') ts FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, len(ts)-2),
      |    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) s
      |  FROM toks WHERE len(ts) >= 3),
      |sizes AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY 1),
      |pairs AS (
      |  SELECT a.doc_id i, b.doc_id j, COUNT(*) c
      |  FROM sh a JOIN sh b ON a.s = b.s
      |  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0 AND b.doc_id % 3 <> 1
      |  GROUP BY 1, 2)
      |SELECT i, j, ROUND(CAST(c AS DOUBLE)/(si.n+sj.n-c), 6) jac
      |FROM pairs JOIN sizes si ON si.doc_id=i JOIN sizes sj ON sj.doc_id=j
      |WHERE CAST(c AS DOUBLE)/(si.n+sj.n-c) >= 0.5 ORDER BY i, j""".stripMargin

  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text",
        shingleN = 3, threshold = 0.5)
      .orderBy(col("i"), col("j"))

  /** Duplicate groups: connected components over the MinHash-LSH pair set
    * — every document labelled with its group's canonical (minimum) id;
    * documents with no near-dup are their own canonical. */
  def dedupGroups(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val pairs = Dedup.minhashLshPairs(
      Dedup.shingles(docs, "doc_id", "text", 3), k = 64, r = 4, threshold = 0.5)
    Dedup.duplicateGroups(pairs, docs.select(col("doc_id").as("id")))
      .orderBy(col("member"))
  }

  // transitive closure of the exact-Jaccard pair graph via recursive CTE;
  // canonical = min reachable node (or self for singletons)
  private val dedupGroupsCoreSql: String =
    s"""WITH pairs AS ($JaccardSql),
       |edges AS (
       |  SELECT i AS a, j AS b FROM pairs
       |  UNION SELECT j, i FROM pairs),
       |reach AS (
       |  WITH RECURSIVE r(a, b) AS (
       |    SELECT a, b FROM edges
       |    UNION
       |    SELECT r.a, e.b FROM r JOIN edges e ON r.b = e.a)
       |  SELECT a, b FROM r)
       |SELECT doc_id AS member,
       |  LEAST(doc_id, COALESCE(m.mn, doc_id)) AS canonical
       |FROM documents
       |LEFT JOIN (SELECT a, MIN(b) AS mn FROM reach GROUP BY a) m
       |  ON m.a = doc_id""".stripMargin

  val dedupGroupsSql: String =
    s"$dedupGroupsCoreSql\nORDER BY member"

  /** [[dedupGroups]] computed by the alternating large-star/small-star CC
    * ([[Dedup.duplicateGroupsStar]]) — the O(log²)-round variant for
    * unbounded component diameters. Same (member, canonical) contract, so
    * the twin is the same recursive-CTE closure: the oracle proves the two
    * algorithms agree on real pair graphs, not just the spec fixtures. */
  def dedupGroupsStar(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val pairs = Dedup.minhashLshPairs(
      Dedup.shingles(docs, "doc_id", "text", 3), k = 64, r = 4, threshold = 0.5)
    Dedup.duplicateGroupsStar(pairs, docs.select(col("doc_id").as("id")))
      .orderBy(col("member"))
  }

  /** Dedup APPLY audit — the shrinkage report a pipeline publishes after
    * near-dup removal: per source, the docs and character mass kept under
    * the keep-the-canonical policy. The components are the same
    * MinHash-LSH pair set as `dedup_groups`; applying them is one join
    * back to the corpus on the doc key plus a conditional aggregate —
    * integer counts/sums, one double keep-rate under r6. */
  def dedupShrinkage(s: SparkSession, dir: String): DataFrame = {
    def r6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
    val docs = Tables.documents(s, dir)
    val pairs = Dedup.minhashLshPairs(
      Dedup.shingles(docs, "doc_id", "text", 3), k = 64, r = 4, threshold = 0.5)
    val groups = Dedup.duplicateGroups(pairs, docs.select(col("doc_id").as("id")))
    docs.join(groups, col("doc_id") === col("member"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("doc_id") === col("canonical"), lit(1))).as("n_kept"),
        sum(col("n_chars")).as("chars_total"),
        coalesce(sum(when(col("doc_id") === col("canonical"), col("n_chars"))),
          lit(0L)).as("chars_kept"))
      .select(col("source"), col("n_docs"), col("n_kept"),
        col("chars_total"), col("chars_kept"),
        r6(col("n_kept").cast("double") / col("n_docs")).as("keep_rate"))
      .orderBy(col("source"))
  }

  val dedupShrinkageSql: String =
    s"""WITH g AS ($dedupGroupsCoreSql)
       |SELECT source, COUNT(*) AS n_docs,
       |  COUNT(*) FILTER (doc_id = canonical) AS n_kept,
       |  CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       |  CAST(COALESCE(SUM(n_chars) FILTER (doc_id = canonical), 0) AS BIGINT) AS chars_kept,
       |  FLOOR((CAST(COUNT(*) FILTER (doc_id = canonical) AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6 AS keep_rate
       |FROM documents JOIN g ON doc_id = member
       |GROUP BY source ORDER BY source""".stripMargin

  /** Embedding near-dup — the 100 TB shape: LSH-band candidate generation
    * (shuffle hash join on (band, band_hash), candidate count ∝ collision
    * density, never corpus×corpus) + exact cosine ≥ 0.4 on candidates
    * only. 32 planes / 4 bands of 8 bits: a random pair collides with
    * P ≈ 1.5%, a cos-0.95 near-dup with P ≈ 0.90. The oracle twin embeds
    * the same plane literals, so the gate checks the full pipeline —
    * signatures, banding, candidate join, verification — not just recall
    * luck. The all-pairs exact form stays in [[Similarity.cosinePairsTopN]]
    * as the spec-checked small-scale baseline.
    *
    * The band width SELF-SIZES from the corpus count
    * ([[Similarity.lshBandedPairsSized]]): fixed r=8 was measured
    * quadratic at 80k vectors (396 s — SCALE.md); sized r keeps bucket
    * occupancy ~16. At the gate's fixture sizes (n ≤ 4096) the sizing
    * floors at r=8, so the static twin below stays an exact hash check. */
  def dedupEmbedding(s: SparkSession, dir: String): DataFrame =
    Similarity.lshBandedPairsSized(Tables.embeddings(s, dir), "vec_id",
      "embedding", threshold = 0.4, bands = 4, dim = 64)

  val dedupEmbeddingSql: String =
    LshOracleSql.bandedPairs(threshold = 0.4, planes = 32, bands = 4, dim = 64,
      maxBucket = graft.operators.Dedup.DefaultMaxBucket)

  /** SemDeDup — semantic dedup via cluster-scoped pairwise comparison
    * (the published recipe for embedding-level dedup at corpus scale:
    * k-means cells bound the quadratic term; here the deterministic
    * literal quantizer so the twin recomputes the WHOLE pipeline —
    * assignment, cap, pairing, keep-first survivorship). Complements
    * [[dedupEmbedding]]'s LSH-band path: same goal, the other published
    * candidate-generation strategy. */
  def dedupSemantic(s: SparkSession, dir: String): DataFrame =
    Similarity.semanticDedup(Tables.embeddings(s, dir), "vec_id",
        "embedding", threshold = 0.4)
      .orderBy(col("vec_id"))

  val dedupSemanticSql: String =
    LshOracleSql.semanticDedup(threshold = 0.4, cells = 16, dim = 64,
      maxCell = graft.operators.Dedup.DefaultMaxBucket)

  /** TRAINED SemDeDup — the composition the paper runs: in-engine k-means
    * (2 iterations, every trajectory step hash-pinned by the twin's
    * unrolled CTEs) feeding the cluster-scoped keep-first dedup. Together
    * with [[dedupSemantic]] both quantizer sources are gated: the
    * deterministic literal codebook and the trained one. */
  def dedupSemanticTrained(s: SparkSession, dir: String): DataFrame =
    Similarity.semanticDedupTrained(Tables.embeddings(s, dir), "vec_id",
        "embedding", threshold = 0.4, cells = 16, iters = 2, dim = 64)
      .orderBy(col("vec_id"))

  val dedupSemanticTrainedSql: String =
    LshOracleSql.semanticDedupTrained(threshold = 0.4, cells = 16,
      iters = 2, dim = 64, maxCell = graft.operators.Dedup.DefaultMaxBucket)

  /** Two-level SemDeDup — the assignment that survives the paper's
    * k ∝ n cell sizing: coarse-then-fine rank-1 (exact rule, approximate
    * vs flat assignment — the published IMI trade), gated here at
    * k=16 / g=4 so the twin recomputes both levels. */
  def dedupSemantic2Level(s: SparkSession, dir: String): DataFrame =
    Similarity.semanticDedup2LevelWith(Tables.embeddings(s, dir), "vec_id",
        "embedding", threshold = 0.4,
        Array.tabulate(16, 64)(Similarity.centroidComponent), groupSize = 4)
      .orderBy(col("vec_id"))

  val dedupSemantic2LevelSql: String =
    LshOracleSql.semanticDedup2Level(threshold = 0.4, cells = 16,
      groupSize = 4, dim = 64,
      maxCell = graft.operators.Dedup.DefaultMaxBucket)

  /** IMI-TRAINED two-level SemDeDup — the full production composition
    * (VERDICT r9 #6 / r10 #5): [[Similarity.imiTrain]] trains the coarse
    * quantizer (2 Lloyd's iterations) and the per-group fine codebooks
    * (2 joint group-scoped iterations — k-independent cost per iteration,
    * the property that makes the trainer viable at the paper's k ∝ n
    * sizing), then [[Similarity.semanticDedup2LevelTrainedWith]] serves
    * the coarse-then-fine assignment and the cluster-scoped keep-first
    * dedup. Gated at groups=4 × groupSize=4 (k=16) so the DuckDB twin
    * recomputes the ENTIRE trajectory — coarse training, routing, both
    * fine iterations, serve assignment, pairing — with every collected
    * model double hash-pinned, same discipline as
    * [[dedupSemanticTrained]]. */
  def dedupSemanticImi(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val (coarse, fine) = Similarity.imiTrain(emb, "embedding",
      groups = 4, groupSize = 4, iters = 2, dim = 64)
    Similarity.semanticDedup2LevelTrainedWith(emb, "vec_id", "embedding",
        threshold = 0.4, coarse, fine, groupSize = 4)
      .orderBy(col("vec_id"))
  }

  val dedupSemanticImiSql: String =
    LshOracleSql.semanticDedupImi(threshold = 0.4, groups = 4,
      groupSize = 4, iters = 2, dim = 64,
      maxCell = graft.operators.Dedup.DefaultMaxBucket)

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

  /** LSH-bucketed ANN. The oracle twin recomputes the same LSH (plane
    * literals embedded in the SQL) — the gate checks the bucketed search
    * end-to-end, misses and all; specs additionally assert recall ≥ 0.9
    * against brute force. */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", 5)
      .orderBy(col("query_id"), col("rnk"))
  }

  val annLshSql: String =
    LshOracleSql.lshTopK(k = 5, planes = 16, bands = 8, dim = 64,
      maxBucket = graft.operators.Dedup.DefaultMaxBucket)

  /** IVF ANN — coarse-quantize + probe, the inverted-file scale path
    * alongside the LSH one. Deterministic literal centroids make the twin
    * recompute the full index (see [[Similarity.ivfTopK]]). */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, cells = 16, nprobe = 8)
      .orderBy(col("query_id"), col("rnk"))
  }

  val annIvfSql: String =
    LshOracleSql.ivfTopK(k = 5, cells = 16, nprobe = 8, dim = 64)

  /** Metadata-FILTERED vector search — the access pattern every
    * production vector store serves ("nearest neighbors WHERE label ∈
    * …"): the predicate restricts the searchable corpus BEFORE the IVF
    * cell join (pre-filtering — exact with respect to the filtered
    * corpus, no post-filter recall loss), and because the corpus is a
    * DataFrame the filter rides the parquet scan like any other
    * predicate. Probes rank their nprobe cells against the full
    * quantizer; only the corpus side narrows. */
  def annFiltered(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfTopK(emb.filter(col("label").isin(0, 1, 2, 3)),
        emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, cells = 16, nprobe = 8)
      .orderBy(col("query_id"), col("rnk"))
  }

  val annFilteredSql: String =
    LshOracleSql.ivfTopK(k = 5, cells = 16, nprobe = 8, dim = 64,
      corpusPred = "label IN (0, 1, 2, 3)")

  /** Radius search — all neighbors above a similarity floor, no top-k
    * truncation (the contamination-sweep access pattern). One codegen
    * stage, zero shuffles: the probe set broadcasts and the threshold is a
    * row-local filter. */
  def annRange(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.rangeSearch(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", minCos = 0.2)
      .orderBy(col("query_id"), col("nbr_id"))
  }

  val annRangeSql: String =
    """WITH scored AS (
      |  SELECT p.vec_id AS query_id, c.vec_id AS nbr_id,
      |    ROUND(list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
      |      / (SQRT(list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(p.embedding AS DOUBLE[])))
      |       * SQRT(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))), 6) AS cos_sim
      |  FROM embeddings p JOIN embeddings c ON p.vec_id < 10 AND c.vec_id != p.vec_id)
      |SELECT query_id, nbr_id, cos_sim FROM scored
      |WHERE cos_sim >= 0.2 ORDER BY query_id, nbr_id""".stripMargin

  /** Nearest-centroid confusion — label separability audit (one k-means
    * classification step against the exact-decimal label centroids). */
  def embNearestCentroid(s: SparkSession, dir: String): DataFrame =
    Similarity.nearestCentroidConfusion(Tables.embeddings(s, dir),
        "vec_id", "label", "embedding")
      .orderBy(col("label"), col("assigned"))

  val embNearestCentroidSql: String =
    """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) e FROM embeddings),
      |cent AS (
      |  SELECT label AS cand, CAST(i - 1 AS INT) AS pos,
      |    ROUND(CAST(SUM(CAST(e[i] AS DECIMAL(20,8))) AS DOUBLE) / COUNT(*), 6) AS centroid
      |  FROM (SELECT label, unnest(generate_series(1, len(e))) AS i, e FROM v)
      |  GROUP BY label, i),
      |ex AS (SELECT vec_id AS vid, label, unnest(generate_series(1, len(e))) AS i, e FROM v),
      |d AS (
      |  SELECT vid, label, cand, SUM(CAST(df * df AS DECIMAL(25,10))) AS dist
      |  FROM (SELECT vid, label, cand, e[i] - centroid AS df
      |        FROM ex JOIN cent ON cent.pos = i - 1)
      |  GROUP BY vid, label, cand),
      |a AS (
      |  SELECT vid, label, cand AS assigned,
      |    row_number() OVER (PARTITION BY vid, label ORDER BY dist, cand) AS rn
      |  FROM d)
      |SELECT label, assigned, COUNT(*) AS n_vecs FROM a WHERE rn = 1
      |GROUP BY label, assigned ORDER BY label, assigned""".stripMargin

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

  /** Overlapping token-window chunking ([[TextAnalysis.chunk]], RAG prep):
    * 32-token chunks every 24 tokens over every document — the shuffle-free
    * fan-out stage that feeds embedding/dedup at corpus scale. The gate
    * hash-checks every chunk's byte-exact text, ordinal, and token count. */
  def textChunk(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunk(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"), col("chunk_idx"))

  val textChunkSql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_extract_all(text, '\S+') AS ts FROM documents),
      |spec AS (
      |  SELECT doc_id, ts, len(ts) AS n,
      |    ((CASE WHEN len(ts) > 32 THEN len(ts) - 32 ELSE 0 END) + 23) // 24 + 1 AS k
      |  FROM toks)
      |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
      |  CAST(least(32, n - i*24) AS BIGINT) AS n_tokens,
      |  array_to_string(ts[i*24 + 1 : i*24 + 32], ' ') AS chunk_text
      |FROM spec, LATERAL (SELECT unnest(range(k)) AS i) u
      |ORDER BY doc_id, chunk_idx""".stripMargin

  /** In-engine BPE tokenizer training ([[TextAnalysis.bpeMerges]]): the
    * first 6 merge rules learned from the corpus, hash-gated. The twin
    * unrolls the identical 6 rounds as generated CTEs (word-freq table →
    * pair counts → lexicographic-tie-broken argmax → sentinel-space
    * substring replace), so a divergence in ANY round's pair statistics or
    * merge application breaks the gate. */
  def textBpeMerges(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeMerges(Tables.documents(s, dir), "text", k = 6)

  /** The BPE trainer replayed as generated CTEs — shared by the merges
    * and encode twins. One round: best_t picks the argmax pair of
    * w_{t-1}; w_t rewrites. DOUBLE-space separators (matching
    * TextAnalysis.bpeMerges): the " l  r " pattern consumes only the
    * inner half of each boundary, so DuckDB's plain left-to-right replace
    * IS greedy-left BPE — adjacent occurrences (banana's two (a,n)s, runs
    * like 'aaa') merge correctly. */
  private def bpeTrainCtes(k: Int): String = {
    def round(t: Int): String = {
      val prev = if (t == 1) "w0" else s"w${t - 1}"
      s"""pairs$t AS (
         |  SELECT arr[i+1] AS lhs, arr[i+2] AS rhs, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (SELECT freq, string_split(trim(sym), '  ') AS arr FROM $prev),
         |    LATERAL (SELECT unnest(range(len(arr) - 1)) AS i) u
         |  WHERE len(arr) >= 2 GROUP BY lhs, rhs),
         |best$t AS (
         |  SELECT $t AS step, lhs, rhs, lhs||rhs AS merged, cnt AS pair_freq
         |  FROM pairs$t ORDER BY cnt DESC, lhs, rhs LIMIT 1),
         |w$t AS (
         |  SELECT replace(sym, ' '||lhs||'  '||rhs||' ', ' '||lhs||rhs||' ') AS sym, freq
         |  FROM $prev, best$t)""".stripMargin
    }
    s"""w0 AS (
       |  SELECT '  '||array_to_string(regexp_extract_all(word, '.'), '  ')||'  </w>  ' AS sym,
       |    CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(regexp_extract_all(lower(text), '\\w+')) AS word
       |        FROM documents)
       |  GROUP BY word),
       |${(1 to k).map(round).mkString(",\n")}""".stripMargin
  }

  val textBpeMergesSql: String =
    s"""WITH ${bpeTrainCtes(6)}
       |SELECT CAST(step AS BIGINT) AS step, lhs, rhs, merged, pair_freq FROM (
       |  ${(1 to 6).map(t => s"SELECT * FROM best$t").mkString(" UNION ALL ")})
       |ORDER BY step""".stripMargin

  /** BPE ENCODE over the trained merge list
    * ([[TextAnalysis.bpeEncode]], VERDICT r14 #4): train the 6-rule
    * tokenizer in-engine, then encode EVERY document — per doc the real
    * subword token count and an md5 fingerprint of the full token
    * sequence, so a single token out of place anywhere in the corpus
    * breaks the gate. The twin re-trains the identical 6 rounds
    * (the `text_bpe_merges` CTE chain) and re-encodes each document with
    * the same sentinel-space representation and the same 6 ordered
    * literal replaces — both engines' replace is left-to-right
    * non-overlapping, which over the double-space form IS greedy-left
    * BPE. (Assumes the corpus trains all 6 rounds — pinned by
    * `text_bpe_merges` emitting 6 rows on this fixture; an
    * earlier-exhausted vocabulary would need the twin's cross joins
    * relaxed.) */
  def textBpeEncode(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    TextAnalysis.bpeEncode(docs, "doc_id", "text", trainedBpeMerges(docs))
      .orderBy(col("doc_id"))
  }

  /** Train + encode as CTEs ending in `enc(doc_id, sym)` — shared by the
    * encode twin and the BPE-true packing twin. */
  private[queries] def bpeEncodeCtes: String = {
    val applied = (1 to 6).foldLeft("d.sym") { (acc, t) =>
      s"replace($acc, ' '||b$t.lhs||'  '||b$t.rhs||' ', ' '||b$t.merged||' ')"
    }
    s"""${bpeTrainCtes(6)},
       |docsym AS (
       |  SELECT doc_id,
       |    CASE WHEN len(regexp_extract_all(lower(text), '\\w+')) = 0 THEN ''
       |    ELSE '  '||array_to_string(list_transform(
       |        regexp_extract_all(lower(text), '\\w+'),
       |        w -> array_to_string(regexp_extract_all(w, '.'), '  ')),
       |      '  </w>    ')||'  </w>  ' END AS sym
       |  FROM documents),
       |enc AS (
       |  SELECT d.doc_id, $applied AS sym
       |  FROM docsym d, best1 b1, best2 b2, best3 b3, best4 b4, best5 b5, best6 b6)""".stripMargin
  }

  /** The trained 6-rule merge list, collected as driver-side model state
    * (k rows, a centroid-sized collect) — encode-side callers share it. */
  private[queries] def trainedBpeMerges(docs: DataFrame): Seq[(String, String)] =
    TextAnalysis.bpeMerges(docs, "text", k = 6)
      .select(col("lhs"), col("rhs")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  val textBpeEncodeSql: String =
    s"""WITH $bpeEncodeCtes
       |SELECT doc_id,
       |  CASE WHEN sym = '' THEN CAST(0 AS BIGINT)
       |    ELSE CAST(len(string_split_regex(trim(sym), ' {2,}')) AS BIGINT)
       |  END AS n_tokens,
       |  md5(CASE WHEN sym = '' THEN ''
       |    ELSE array_to_string(string_split_regex(trim(sym), ' {2,}'), ' ')
       |  END) AS fp
       |FROM enc ORDER BY doc_id""".stripMargin

  /** In-engine TRAINED quality model, closed form: a ridge-regularized
    * linear probe (two cheap features — stopword ratio, chars-per-token —
    * plus intercept) fit against a binary teacher label (lang = 'en') by
    * the NORMAL EQUATIONS, then used to score every document; the gate
    * checks the top-50. This is the distill-an-expensive-classifier-into-
    * cheap-features pattern (fastText-quality style) with the training
    * INSIDE the engine: the moment matrix XᵀX and XᵀY is one exact-decimal
    * aggregate (features quantized to DECIMAL(18,6), sums exact and
    * order-independent), and the 3×3 solve is Cramer's rule over doubles.
    *
    * Determinism across engines, without the iterative machinery the
    * kmeans/PCA twins need: the moment sums are exact decimals (identical
    * doubles after the final cast), and every downstream op is IEEE
    * +,-,×,÷ — correctly rounded, so the IDENTICAL Cramer expression trees
    * here and in the twin produce identical bits; no transcendentals
    * anywhere (the logistic form would cost exp() bit-parity). At 100 TB
    * the train step stays one map-side-combined aggregate producing nine
    * doubles; scoring is a codegen'd projection — the model never touches
    * a shuffle. */
  def textQualityDistill(s: SparkSession, dir: String): DataFrame = {
    val stops = Seq("the", "a", "of", "and", "to", "in", "is")
    val nTok = greatest(size(col("ts")), lit(1))
    val feats = graft.CacheScope.cache(
      Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"), col("lang"),
          regexp_extract_all(col("text"), lit("\\S+"), lit(0)).as("ts"))
        .select(col("doc_id"),
          round(size(filter(col("ts"), t => t.isInCollection(stops)))
            .cast("double") / nTok, 6).cast("decimal(18,6)").as("x1"),
          round(col("n_chars").cast("double") / nTok, 6)
            .cast("decimal(18,6)").as("x2"),
          when(col("lang") === "en", 1L).otherwise(0L).as("y")))
    val m = feats.agg(
      count(lit(1)).cast("double").as("m00"),
      sum(col("x1")).cast("double").as("m01"),
      sum(col("x2")).cast("double").as("m02"),
      (sum(col("x1") * col("x1")).cast("double") + 0.001).as("m11"),
      sum(col("x1") * col("x2")).cast("double").as("m12"),
      (sum(col("x2") * col("x2")).cast("double") + 0.001).as("m22"),
      sum(col("y")).cast("double").as("b0"),
      sum(col("x1") * col("y")).cast("double").as("b1"),
      sum(col("x2") * col("y")).cast("double").as("b2")).head()
    val (m00, m01, m02, m11, m12, m22, b0, b1, b2) =
      (m.getDouble(0), m.getDouble(1), m.getDouble(2), m.getDouble(3),
        m.getDouble(4), m.getDouble(5), m.getDouble(6), m.getDouble(7),
        m.getDouble(8))
    // Cramer's rule — EXACTLY the twin's expression trees (left-assoc,
    // same parenthesization): IEEE ops are correctly rounded, so equal
    // inputs + equal trees = equal bits
    val det = m00*(m11*m22 - m12*m12) - m01*(m01*m22 - m12*m02) + m02*(m01*m12 - m11*m02)
    val w0 = (b0*(m11*m22 - m12*m12) - m01*(b1*m22 - m12*b2) + m02*(b1*m12 - m11*b2)) / det
    val w1 = (m00*(b1*m22 - b2*m12) - b0*(m01*m22 - m12*m02) + m02*(m01*b2 - b1*m02)) / det
    val w2 = (m00*(m11*b2 - m12*b1) - m01*(m01*b2 - b1*m02) + b0*(m01*m12 - m11*m02)) / det
    feats.select(col("doc_id"),
        round(lit(w0) + lit(w1) * col("x1").cast("double") +
          lit(w2) * col("x2").cast("double"), 6).as("yhat"),
        col("y"))
      .orderBy(col("yhat").desc, col("doc_id")).limit(50)
  }

  val textQualityDistillSql: String =
    """WITH feats AS (
      |  SELECT doc_id,
      |    CAST(round(CAST(len(list_filter(regexp_extract_all(text, '\S+'),
      |        x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
      |      / greatest(len(regexp_extract_all(text, '\S+')), 1), 6) AS DECIMAL(18,6)) AS x1,
      |    CAST(round(CAST(n_chars AS DOUBLE)
      |      / greatest(len(regexp_extract_all(text, '\S+')), 1), 6) AS DECIMAL(18,6)) AS x2,
      |    CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y
      |  FROM documents),
      |m AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS m00,
      |    CAST(sum(x1) AS DOUBLE) AS m01, CAST(sum(x2) AS DOUBLE) AS m02,
      |    CAST(sum(x1*x1) AS DOUBLE) + 0.001 AS m11, CAST(sum(x1*x2) AS DOUBLE) AS m12,
      |    CAST(sum(x2*x2) AS DOUBLE) + 0.001 AS m22,
      |    CAST(sum(y) AS DOUBLE) AS b0, CAST(sum(x1*y) AS DOUBLE) AS b1, CAST(sum(x2*y) AS DOUBLE) AS b2
      |  FROM feats),
      |wts AS (
      |  SELECT
      |    (b0*(m11*m22 - m12*m12) - m01*(b1*m22 - m12*b2) + m02*(b1*m12 - m11*b2)) /
      |    (m00*(m11*m22 - m12*m12) - m01*(m01*m22 - m12*m02) + m02*(m01*m12 - m11*m02)) AS w0,
      |    (m00*(b1*m22 - b2*m12) - b0*(m01*m22 - m12*m02) + m02*(m01*b2 - b1*m02)) /
      |    (m00*(m11*m22 - m12*m12) - m01*(m01*m22 - m12*m02) + m02*(m01*m12 - m11*m02)) AS w1,
      |    (m00*(m11*b2 - m12*b1) - m01*(m01*b2 - b1*m02) + b0*(m01*m12 - m11*m02)) /
      |    (m00*(m11*m22 - m12*m12) - m01*(m01*m22 - m12*m02) + m02*(m01*m12 - m11*m02)) AS w2
      |  FROM m)
      |SELECT doc_id,
      |  CAST(round(w0 + w1*CAST(x1 AS DOUBLE) + w2*CAST(x2 AS DOUBLE), 6) AS DOUBLE) AS yhat, y
      |FROM feats, wts ORDER BY yhat DESC, doc_id LIMIT 50""".stripMargin

  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprint(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val textFingerprintSql: String =
    """SELECT doc_id, md5(text) AS raw_fp,
      |  md5(list_aggregate(regexp_extract_all(lower(text), '\w+'), 'string_agg', ' ')) AS norm_fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Winnowing fingerprints, exploded to (doc_id, fp) rows. The gram hash
    * is an md5 prefix (identical UTF-8 md5 on both engines; min over hex
    * strings is plain lexicographic order), so the full sketch — k-grams,
    * window minima, dedup — is oracle-checked, not just its size. */
  def textWinnow(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.winnow(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"), col("fp"))

  // k=4 token-grams hashed to 16-hex md5 prefixes, window w=8 minima,
  // distinct — mirrors TextAnalysis.winnow's defaults exactly.
  val textWinnowSql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '\w+') ts FROM documents),
      |grams AS (
      |  SELECT doc_id, CASE WHEN len(ts) < 4 THEN []
      |    ELSE list_transform(generate_series(1, len(ts) - 3),
      |      i -> substr(md5(array_to_string(list_slice(ts, i, i + 3), ' ')), 1, 16))
      |    END g
      |  FROM toks),
      |mins AS (
      |  SELECT doc_id, CASE WHEN len(g) = 0 THEN []
      |    WHEN len(g) < 8 THEN [list_min(g)]
      |    ELSE list_transform(generate_series(1, len(g) - 7),
      |      i -> list_min(list_slice(g, i, i + 7)))
      |    END m
      |  FROM grams)
      |SELECT DISTINCT doc_id, fp FROM (SELECT doc_id, unnest(m) AS fp FROM mins)
      |ORDER BY doc_id, fp""".stripMargin

  /** Unigram-LM perplexity proxy per document — the corpus-model quality
    * score; see [[TextAnalysis.unigramNegLogprob]]. */
  def textPerplexity(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramNegLogprob(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** Twin: same add-one unigram model, same 8 dp per-token rounding into
    * an exact decimal sum, same r6 mean — LN of a ratio of exact integers
    * rounds to the same double in both engines. */
  val textPerplexitySql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS t
      |  FROM documents),
      |st AS (SELECT COUNT(*) AS n, COUNT(DISTINCT t) AS v FROM tok),
      |m AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
      |sc AS (
      |  SELECT doc_id,
      |    FLOOR(LN(CAST(n + v AS DOUBLE) / (c + 1)) * 1e8 + 0.5) / 1e8 AS nl
      |  FROM tok JOIN m USING (t), st),
      |agg AS (
      |  SELECT doc_id, COUNT(*) AS n_tokens,
      |    SUM(CAST(nl AS DECIMAL(20,8))) AS s
      |  FROM sc GROUP BY doc_id)
      |SELECT doc_id, n_tokens,
      |  FLOOR(CAST(s AS DOUBLE) / n_tokens * 1e6 + 0.5) / 1e6 AS avg_neg_logprob
      |FROM agg ORDER BY doc_id""".stripMargin

  /** The bounded-model form: top-512 terms + OOV floor
    * ([[TextAnalysis.unigramNegLogprobTopV]]) — the same scoring join with
    * a broadcast that stays V+1 rows at any corpus size. 512 against the
    * fixture's multi-thousand-term vocabulary forces REAL OOV traffic, so
    * the gate exercises both the in-vocab path and the floor. */
  def textPerplexityTopv(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramNegLogprobTopV(Tables.documents(s, dir), "doc_id",
        "text", topV = 512)
      .orderBy(col("doc_id"))

  /** Twin: same (count DESC, term ASC) top-512 cut, same collapsed-tail
    * add-one model, same decimal discipline. */
  val textPerplexityTopvSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS t
      |  FROM documents),
      |m AS (
      |  SELECT t, c FROM (SELECT t, COUNT(*) AS c FROM tok GROUP BY t)
      |  ORDER BY c DESC, t LIMIT 512),
      |st AS (
      |  SELECT (SELECT COUNT(*) FROM tok) AS n,
      |         (SELECT COUNT(*) FROM m) AS v,
      |         (SELECT SUM(c) FROM m) AS ctop),
      |sc AS (
      |  SELECT doc_id,
      |    CASE WHEN m.t IS NULL THEN 1 ELSE 0 END AS oov,
      |    CASE WHEN m.t IS NULL
      |      THEN FLOOR(LN(CAST(n + v + 1 AS DOUBLE) / (n - ctop + 1)) * 1e8 + 0.5) / 1e8
      |      ELSE FLOOR(LN(CAST(n + v + 1 AS DOUBLE) / (m.c + 1)) * 1e8 + 0.5) / 1e8
      |    END AS nl
      |  FROM tok LEFT JOIN m USING (t), st),
      |agg AS (
      |  SELECT doc_id, COUNT(*) AS n_tokens, CAST(SUM(oov) AS BIGINT) AS n_oov,
      |    SUM(CAST(nl AS DECIMAL(20,8))) AS s
      |  FROM sc GROUP BY doc_id)
      |SELECT doc_id, n_tokens, n_oov,
      |  FLOOR(CAST(s AS DOUBLE) / n_tokens * 1e6 + 0.5) / 1e6 AS avg_neg_logprob
      |FROM agg ORDER BY doc_id""".stripMargin

  /** Quality-filter decisions with auditable reject reasons. */
  def textQuality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityFilter(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  // mirrors TextAnalysis.stats' feature arithmetic + the rule cascade
  val textQualitySql: String =
    """WITH feat AS (
      |  SELECT doc_id, LENGTH(text) AS n_chars,
      |    len(regexp_extract_all(lower(text), '\w+')) AS n_tokens,
      |    ROUND(CAST(list_sum(list_transform(regexp_extract_all(lower(text), '\w+'), x -> LENGTH(x))) AS DOUBLE) /
      |      GREATEST(len(regexp_extract_all(lower(text), '\w+')), 1), 6) AS avg_token_len,
      |    ROUND(CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / GREATEST(LENGTH(text), 1), 6) AS punct_ratio,
      |    ROUND(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / GREATEST(LENGTH(text), 1), 6) AS digit_ratio
      |  FROM documents),
      |decided AS (
      |  SELECT doc_id, n_chars, n_tokens,
      |    CASE WHEN n_chars < 200 THEN 'too_short'
      |         WHEN n_chars > 100000 THEN 'too_long'
      |         WHEN n_tokens < 30 THEN 'too_few_tokens'
      |         WHEN avg_token_len < 2.5 THEN 'tokens_too_short'
      |         WHEN avg_token_len > 12.0 THEN 'tokens_too_long'
      |         WHEN digit_ratio > 0.2 THEN 'too_many_digits'
      |         WHEN punct_ratio > 0.1 THEN 'too_much_punctuation'
      |         ELSE 'ok' END AS reject_reason
      |  FROM feat)
      |SELECT doc_id, n_chars, n_tokens, reject_reason,
      |  reject_reason = 'ok' AS keep
      |FROM decided ORDER BY doc_id""".stripMargin

  /** Top-3 TF-IDF terms per document. */
  def textTfidf(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfIdfTopK(Tables.documents(s, dir), "doc_id", "text", 3)
      .orderBy(col("doc_id"), col("rnk"))

  val textTfidfSql: String =
    """WITH terms AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
      |dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT doc_id, term, tf,
      |    ROUND(tf * LN(CAST(n_docs + 1 AS DOUBLE) / (df + 1)), 6) AS tfidf
      |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
      |SELECT doc_id, rnk, term, tf, tfidf FROM (
      |  SELECT doc_id, term, tf, tfidf, row_number() OVER (
      |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
      |  FROM scored)
      |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin

  /** Gopher-style repetition features: duplicate-bigram fraction and
    * top-bigram share per document, with the keep/flag decision. */
  def textRepetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionStats(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val textRepetitionSql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '\w+') ts FROM documents),
      |grams AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(ts) - 1),
      |    i -> ts[i] || ' ' || ts[i+1])) AS gram
      |  FROM toks WHERE len(ts) >= 2),
      |cnt AS (SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2),
      |agg AS (
      |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
      |    COUNT(*) AS n_distinct_grams, MAX(c) AS top_c
      |  FROM cnt GROUP BY 1)
      |SELECT doc_id, n_grams, n_distinct_grams,
      |  ROUND(1.0 - CAST(n_distinct_grams AS DOUBLE) / n_grams, 6) AS dup_gram_frac,
      |  ROUND(CAST(top_c AS DOUBLE) / n_grams, 6) AS top_gram_frac,
      |  (1.0 - CAST(n_distinct_grams AS DOUBLE) / n_grams) > 0.2 AS repetitive
      |FROM agg ORDER BY doc_id""".stripMargin

  /** Dedup audit: histogram of NEAR-DUP cluster sizes (how many clusters
    * of each size, how many documents they hold, what corpus share a dedup
    * pass would touch) over the [[dedupGroups]] connected components. The
    * exact-duplicate clustering is all singletons on this fixture
    * (`dedup_exact` — 500 clusters of 1), so the informative audit is the
    * near-dup one; the twin recomputes the recursive-CTE closure plus the
    * same two-aggregate histogram. */
  def dedupClusterStats(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val pairs = Dedup.minhashLshPairs(
      Dedup.shingles(docs, "doc_id", "text", 3), k = 64, r = 4, threshold = 0.5)
    Dedup.clusterSizeStats(
        Dedup.duplicateGroups(pairs, docs.select(col("doc_id").as("id"))),
        "canonical")
      .orderBy(col("cluster_size"))
  }

  val dedupClusterStatsSql: String =
    s"""WITH g AS ($dedupGroupsCoreSql),
       |cl AS (SELECT canonical, COUNT(*) AS cluster_size FROM g GROUP BY 1),
       |hist AS (
       |  SELECT cluster_size, COUNT(*) AS n_clusters,
       |    cluster_size * COUNT(*) AS n_docs
       |  FROM cl GROUP BY 1)
       |SELECT cluster_size, n_clusters, n_docs,
       |  FLOOR(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER () * 1e6 + 0.5) / 1e6 AS doc_share
       |FROM hist ORDER BY cluster_size""".stripMargin

  /** PII scrub over documents. The fixture corpus is synthetic word-salad
    * with no real PII, so the query PLANTS deterministic PII (an email,
    * phone, and IP derived from doc_id, on every third document — the same
    * honest-stub pattern as the media decode arithmetic) and then runs the
    * real detection + redaction pipeline over it; the twin recomputes the
    * planting AND the scrub, so the gate checks both detection counts and
    * every redacted byte (via the hash). */
  def textPii(s: SparkSession, dir: String): DataFrame = {
    val footer = concat(lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com ph +1-555-"),
      lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0"),
      lit(" ip 10."), pmod(col("doc_id"), lit(256L)).cast("string"),
      lit(".0."), pmod(col("doc_id") * 7, lit(256L)).cast("string"))
    val planted = Tables.documents(s, dir).withColumn("pii_text",
      when(pmod(col("doc_id"), lit(3L)) === 0, concat(col("text"), footer))
        .otherwise(col("text")))
    TextAnalysis.piiScrub(planted, "doc_id", "pii_text")
      .orderBy(col("doc_id"))
  }

  val textPiiSql: String = {
    // DuckDB single-quoted strings keep backslashes literal, so the
    // runtime Java-regex strings embed verbatim
    val email = TextAnalysis.EmailRe
    val ip = TextAnalysis.Ipv4Re
    val phone = TextAnalysis.PhoneRe
    s"""WITH planted AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
       |      || '@example.com ph +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |      || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)
       |    ELSE text END AS t
       |  FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(t, '$email')) AS n_emails,
       |  len(regexp_extract_all(t, '$ip')) AS n_ips,
       |  len(regexp_extract_all(t, '$phone')) AS n_phones,
       |  len(regexp_extract_all(t, '$email')) + len(regexp_extract_all(t, '$ip'))
       |    + len(regexp_extract_all(t, '$phone')) > 0 AS has_pii,
       |  md5(regexp_replace(regexp_replace(regexp_replace(t,
       |    '$email', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'), '$phone', '<PHONE>', 'g')) AS redacted_fp
       |FROM planted ORDER BY doc_id""".stripMargin
  }

  /** Int8 scalar-quantization audit over the embedding corpus — codes are
    * exact integers (sum + position-weighted checksum declared), the range
    * and max reconstruction error per vector. */
  def embQuantize(s: SparkSession, dir: String): DataFrame =
    Similarity.quantizeStats(Tables.embeddings(s, dir), "vec_id", "embedding")
      .orderBy(col("vec_id"))

  val embQuantizeSql: String =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
      |el AS (
      |  SELECT vec_id, unnest(generate_series(1, len(e))) AS i, e FROM v),
      |st AS (
      |  SELECT vec_id, i, e[i] AS x,
      |    MIN(e[i]) OVER (PARTITION BY vec_id) AS mn,
      |    MAX(e[i]) OVER (PARTITION BY vec_id) AS mx
      |  FROM el),
      |qd AS (
      |  SELECT vec_id, i, x, mn, mx,
      |    CASE WHEN mx > mn
      |      THEN CAST(FLOOR((x - mn) / (mx - mn) * 255 + 0.5) AS BIGINT)
      |      ELSE 0 END AS q
      |  FROM st)
      |SELECT vec_id, COUNT(*) AS n_dims, MIN(x) AS mn, MAX(x) AS mx,
      |  CAST(SUM(q) AS BIGINT) AS q_sum,
      |  CAST(SUM(q * i) AS BIGINT) AS q_checksum,
      |  FLOOR(MAX(ABS(x - (mn + q * ((mx - mn) / 255)))) * 1e8 + 0.5) / 1e8 AS max_abs_err
      |FROM qd GROUP BY vec_id ORDER BY vec_id""".stripMargin

  /** Product-quantization encoding over the embedding corpus — the
    * IVF-PQ memory layout step (64 float32 dims → one 16-bit code word +
    * reconstruction error). One row-local projection, no shuffle; see
    * [[Similarity.pqCodes]]. */
  def embPqQuantize(s: SparkSession, dir: String): DataFrame =
    Similarity.pqCodes(Tables.embeddings(s, dir), "vec_id", "embedding",
        subs = 8, ksub = 4, dim = 64)
      .orderBy(col("vec_id"))

  val embPqQuantizeSql: String = LshOracleSql.pqCodes(subs = 8, ksub = 4, dim = 64)

  /** PQ-ADC top-k search — corpus scanned as 2-byte code words, probes
    * carrying a broadcast distance table; see [[Similarity.pqTopK]]. */
  def annPq(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.pqTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
      .orderBy(col("query_id"), col("rnk"))
  }

  val annPqSql: String = LshOracleSql.pqTopK(k = 5, subs = 8, ksub = 4, dim = 64)

  /** IVF-PQ composed index search — cell pruning × compressed ADC scan;
    * see [[Similarity.ivfPqTopK]]. */
  def annIvfPq(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, cells = 16, nprobe = 8)
      .orderBy(col("query_id"), col("rnk"))
  }

  val annIvfPqSql: String = LshOracleSql.ivfPqTopK(k = 5, cells = 16,
    nprobe = 8, subs = 8, ksub = 4, dim = 64)

  /** Two-stage funnel: PQ-ADC candidates re-ranked by exact cosine; see
    * [[Similarity.pqRerankTopK]]. */
  def annRerank(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.pqRerankTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, kCand = 20)
      .orderBy(col("query_id"), col("rnk"))
  }

  val annRerankSql: String = LshOracleSql.pqRerank(k = 5, kCand = 20,
    subs = 8, ksub = 4, dim = 64)

  /** Lloyd's k-means training of the IVF coarse quantizer (2 iterations
    * from the deterministic init); see [[Similarity.kmeansTrain]]. */
  def embKmeans(s: SparkSession, dir: String): DataFrame =
    Similarity.kmeansTrain(Tables.embeddings(s, dir), "embedding",
      k = 8, iters = 2, dim = 64)

  val embKmeansSql: String = LshOracleSql.kmeansTrain(k = 8, iters = 2,
    dim = 64)

  /** Trained-codebook IVF search (train → index → search composed);
    * see [[Similarity.ivfTrainedTopK]]. */
  def annIvfTrained(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfTrainedTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, cells = 8, nprobe = 2, iters = 2,
        dim = 64)
      .orderBy(col("query_id"), col("rnk"))
  }

  val annIvfTrainedSql: String = LshOracleSql.ivfTrainedTopK(k = 5,
    cells = 8, nprobe = 2, iters = 2, dim = 64)

  /** IMI-trained ANN search (train → two-level inverted lists → group/cell
    * probe → exact re-rank composed); see [[Similarity.imiTrainedTopK]].
    * Gated at groups=4 × groupSize=4 (k=16) with a 2-group / 4-cell probe
    * so the DuckDB twin recomputes the ENTIRE trajectory, same model
    * discipline as `dedup_semantic_imi` (which shares these codebooks'
    * training chain). */
  def annImiTrained(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.imiTrainedTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, groups = 4, groupSize = 4, iters = 2,
        dim = 64, nprobeGroups = 2, nprobeCells = 4)
      .orderBy(col("query_id"), col("rnk"))
  }

  val annImiTrainedSql: String = LshOracleSql.imiTopK(k = 5, groups = 4,
    groupSize = 4, iters = 2, dim = 64, nprobeGroups = 2, nprobeCells = 4)

  /** Recall@5 of the trained-IMI search against brute force — evaluation
    * as an engine operator ([[Similarity.recallAudit]]): per probe, how
    * many of the exact top-5 the probed cells actually contained. The twin
    * recomputes BOTH searches (the full IMI training trajectory and the
    * exact ranking) and intersects them independently — the audit itself
    * is under the hash, not just its inputs. */
  def annRecallAudit(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val probes = emb.filter(col("vec_id") < 10)
    val imi = Similarity.imiTrainedTopK(emb, probes, "vec_id", "embedding",
      k = 5, groups = 4, groupSize = 4, iters = 2, dim = 64,
      nprobeGroups = 2, nprobeCells = 4)
    val brute = Similarity.bruteForceTopK(emb, probes, "vec_id",
      "embedding", 5)
    Similarity.recallAudit(imi, brute, 5).orderBy(col("query_id"))
  }

  val annRecallAuditSql: String =
    s"""WITH imi AS (${annImiTrainedSql}),
       |brute AS (${annBruteforceSql})
       |SELECT b.query_id, COUNT(i.nbr_id) AS n_hits,
       |  ROUND(COUNT(i.nbr_id) / 5.0, 6) AS recall_at_5
       |FROM brute b LEFT JOIN imi i
       |  ON b.query_id = i.query_id AND b.nbr_id = i.nbr_id
       |GROUP BY b.query_id ORDER BY b.query_id""".stripMargin

  /** IMI + PQ composed index search (trained coarse structure × compressed
    * ADC scan — the canonical billion-vector serving composition); see
    * [[Similarity.imiPqTopK]]. Same IMI gate parameters as
    * [[annImiTrained]], same PQ parameters as [[annIvfPq]]. */
  def annImiPq(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.imiPqTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, groups = 4, groupSize = 4, iters = 2,
        dim = 64, nprobeGroups = 2, nprobeCells = 4, subs = 8, ksub = 4)
      .orderBy(col("query_id"), col("rnk"))
  }

  val annImiPqSql: String = LshOracleSql.imiPqTopK(k = 5, groups = 4,
    groupSize = 4, iters = 2, dim = 64, nprobeGroups = 2, nprobeCells = 4,
    subs = 8, ksub = 4)

  /** Trained-IMI index PERSISTENCE round-trip — closes the serving split
    * for the IMI family ([[annPqIndexRoundtrip]]'s analog, VERDICT r11
    * missing #1): [[Similarity.imiIndexWrite]] trains the two-level model
    * once, lands codebooks + inverted lists as plain parquet tables in a
    * fresh temp workspace; [[Similarity.imiIndexSearch]] reloads the
    * frozen model and serves top-k from the STORED lists without
    * retraining. Gated against the SAME twin as `ann_imi_trained`:
    * doubles are bit-exact through parquet, so a byte flip anywhere in
    * model-save → reload → probe → re-rank breaks the hash. Every
    * invocation pays the real write + read, like the ts_store_* family. */
  def annImiIndexRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val path = Streaming.tempWorkspace("graft-imi-index")
    Similarity.imiIndexWrite(emb, "vec_id", "embedding", path,
      groups = 4, groupSize = 4, iters = 2, dim = 64)
    Similarity.imiIndexSearch(s, emb.filter(col("vec_id") < 10), "vec_id",
        "embedding", path, k = 5, groupSize = 4, nprobeGroups = 2,
        nprobeCells = 4)
      .orderBy(col("query_id"), col("rnk"))
  }

  val annImiIndexRoundtripSql: String = annImiTrainedSql

  /** Append-without-retrain on the persisted IMI index
    * ([[annPqIndexAppend]]'s analog): the two-level model trains on 90%
    * of the corpus (vec_id % 10 ≠ 0), the held-out 10% arrives LATER and
    * is assigned by the frozen, RELOADED codebooks
    * ([[Similarity.imiIndexAppend]] — an ordinary parquet append to the
    * inverted lists); the fragmented table is then COMPACTED
    * ([[Similarity.indexCompact]] — binary row-group merge into a new
    * generation, VERDICT r12 #1) and search serves the union from the
    * compacted generation, so the gate hash-pins the whole
    * write → append → compact → search maintenance lifecycle. The twin
    * trains its coarse k-means + fine Lloyd's chains on the same 90%
    * predicate but assigns and probes everything: a drifted codebook, a
    * re-assignment of the base lists, a mis-assigned appended batch, or a
    * row lost/duplicated by compaction all break the hash. */
  def annImiIndexAppend(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val path = Streaming.tempWorkspace("graft-imi-index-append")
    Similarity.imiIndexWrite(emb.filter(pmod(col("vec_id"), lit(10)) =!= 0),
      "vec_id", "embedding", path, groups = 4, groupSize = 4, iters = 2,
      dim = 64)
    Similarity.imiIndexAppend(s, emb.filter(pmod(col("vec_id"), lit(10)) === 0),
      "vec_id", "embedding", path, groupSize = 4)
    Similarity.indexCompact(s, path)
    Similarity.imiIndexSearch(s, emb.filter(col("vec_id") < 10), "vec_id",
        "embedding", path, k = 5, groupSize = 4, nprobeGroups = 2,
        nprobeCells = 4)
      .orderBy(col("query_id"), col("rnk"))
  }

  val annImiIndexAppendSql: String = LshOracleSql.imiTopK(k = 5, groups = 4,
    groupSize = 4, iters = 2, dim = 64, nprobeGroups = 2, nprobeCells = 4,
    trainPred = "vec_id % 10 != 0")

  /** Tombstone-delete against the persisted IMI index — the takedown /
    * decontamination lifecycle step ([[Similarity.indexDelete]]): the
    * index is built on the FULL corpus, a deletion batch (vec_id % 7 = 3)
    * lands as an ids-only tombstone table, and search anti-joins the
    * stored lists against it — model, lists and probe fan-out stay
    * frozen, the deleted vectors just stop being candidates. The twin
    * serves the identical trained trajectory with the deleted ids
    * filtered from the corpus lists, so a tombstone missed by the
    * anti-join (or one applied to the wrong side) breaks the hash.
    * IndexDeleteSpec pins that [[Similarity.indexVacuum]] then folds the
    * tombstones in physically with bit-identical results. */
  def annImiIndexDelete(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val path = Streaming.tempWorkspace("graft-imi-index-delete")
    Similarity.imiIndexWrite(emb, "vec_id", "embedding", path,
      groups = 4, groupSize = 4, iters = 2, dim = 64)
    Similarity.indexDelete(s,
      emb.filter(pmod(col("vec_id"), lit(7)) === 3).select(col("vec_id")),
      "vec_id", path)
    Similarity.imiIndexSearch(s, emb.filter(col("vec_id") < 10), "vec_id",
        "embedding", path, k = 5, groupSize = 4, nprobeGroups = 2,
        nprobeCells = 4)
      .orderBy(col("query_id"), col("rnk"))
  }

  val annImiIndexDeleteSql: String = LshOracleSql.imiTopK(k = 5, groups = 4,
    groupSize = 4, iters = 2, dim = 64, nprobeGroups = 2, nprobeCells = 4,
    servePred = "vec_id % 7 != 3")

  /** FILTERED search against the persisted IMI index — the vector-DB
    * table stake (serve only candidates passing a metadata predicate):
    * the predicate composes INSIDE the probed-cell-pruned list scan, so
    * the ranked stream shrinks at the source and the top-k is the top-k
    * OF THE FILTERED SET (a post-filter of an unfiltered top-k would
    * return fewer than k survivors — different, and wrong, semantics).
    * Twin: the same IMI trajectory with the predicate applied to the
    * served corpus only ([[LshOracleSql.imiTopK]] `servePred` — training
    * and the probe fan-out see everything, exactly what the stored frozen
    * index does). */
  def annImiIndexFiltered(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val path = Streaming.tempWorkspace("graft-imi-index-filtered")
    Similarity.imiIndexWrite(emb, "vec_id", "embedding", path,
      groups = 4, groupSize = 4, iters = 2, dim = 64)
    Similarity.imiIndexSearch(s, emb.filter(col("vec_id") < 10), "vec_id",
        "embedding", path, k = 5, groupSize = 4, nprobeGroups = 2,
        nprobeCells = 4,
        serveFilter = Some(pmod(col("nbr_id"), lit(3)) === 0))
      .orderBy(col("query_id"), col("rnk"))
  }

  val annImiIndexFilteredSql: String = LshOracleSql.imiTopK(k = 5,
    groups = 4, groupSize = 4, iters = 2, dim = 64, nprobeGroups = 2,
    nprobeCells = 4, servePred = "vec_id % 3 = 0")

  /** RETRAIN lifecycle of the persisted IMI index (VERDICT r13 #1 —
    * [[Similarity.imiIndexRebuild]]): the model trains on 90% of the
    * corpus, the held-out 10% arrives LATER under the frozen model (the
    * append contract — exactly how drift-skewed cells accumulate), then
    * the index REBUILDS: both codebook levels retrain on the union held in
    * the stored lists, every vector re-assigns under the new model, and
    * model + lists swap in as index-root generation N+1. The gate pins
    * rebuild ≡ fresh build: the twin trains on the FULL corpus (no train
    * predicate), so serving the rebuilt index must hash-equal an index
    * built on everything from scratch — a rebuild that trained on stale
    * rows, missed the appended batch, kept the old model, or re-assigned
    * wrongly all break the hash. (Contrast `ann_imi_index_append`, whose
    * twin trains on the 90% — the two gates bracket the frozen-vs-retrained
    * model semantics.) */
  def annImiIndexRebuild(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val path = Streaming.tempWorkspace("graft-imi-index-rebuild")
    Similarity.imiIndexWrite(emb.filter(pmod(col("vec_id"), lit(10)) =!= 0),
      "vec_id", "embedding", path, groups = 4, groupSize = 4, iters = 2,
      dim = 64)
    Similarity.imiIndexAppend(s, emb.filter(pmod(col("vec_id"), lit(10)) === 0),
      "vec_id", "embedding", path, groupSize = 4)
    Similarity.imiIndexRebuild(s, path, iters = 2)
    Similarity.imiIndexSearch(s, emb.filter(col("vec_id") < 10), "vec_id",
        "embedding", path, k = 5, groupSize = 4, nprobeGroups = 2,
        nprobeCells = 4)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Twin: the full-corpus IMI trajectory — a rebuilt index must be
    * indistinguishable from one freshly built on the union. */
  val annImiIndexRebuildSql: String = annImiTrainedSql

  /** REBUILD-BY-REWRITE for the lossy-code families (the r14 root-
    * generation discipline's other arm): PQ codes can't retrain from
    * themselves — the stored 2-byte words are lossy — so the PQ index's
    * rebuild IS a fresh [[Similarity.pqIndexWrite]] on the source corpus
    * over the SAME path, which now lands as index-root generation N+1
    * under one atomic commit (no caller-side path repointing, readers
    * keep serving the old index until the swap). The gate builds on 90%,
    * then REBUILDS on the full corpus at the same path; search must
    * hash-equal the full-corpus twin — a serve that resolved the stale
    * root, mixed books across generations, or read both generations'
    * codes all break the hash. */
  def annPqIndexRewrite(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val path = Streaming.tempWorkspace("graft-pq-index-rewrite")
    Similarity.pqIndexWrite(emb.filter(pmod(col("vec_id"), lit(10)) =!= 0),
      "vec_id", "embedding", path, subs = 8, ksub = 4, iters = 2, dim = 64)
    Similarity.pqIndexWrite(emb, "vec_id", "embedding", path,
      subs = 8, ksub = 4, iters = 2, dim = 64)
    Similarity.pqIndexSearch(s, emb.filter(col("vec_id") < 10), "vec_id",
        "embedding", path, k = 5, subs = 8, ksub = 4, dim = 64)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Twin: the full-corpus trained-PQ chain — the rewritten generation
    * must serve as if the 90% build never existed. (lazy: annPqTrainedSql
    * is declared further down the object — a plain val would capture
    * null at init order.) */
  lazy val annPqIndexRewriteSql: String = annPqTrainedSql

  /** Persisted IMI+PQ composed index round-trip — the serving split for
    * the canonical billion-vector structure ([[annImiPq]]'s composition,
    * [[annImiIndexRoundtrip]]'s lifecycle): [[Similarity.imiPqIndexWrite]]
    * trains the two IMI levels once and lands codebooks + the
    * (nbr_id, cell, pq_code) corpus index as parquet;
    * [[Similarity.imiPqIndexSearch]] reloads the frozen model and
    * ADC-scans only the probed cells' STORED code words — the original
    * vectors never reload. Same twin as `ann_imi_pq`. */
  def annImiPqIndexRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val path = Streaming.tempWorkspace("graft-imipq-index")
    Similarity.imiPqIndexWrite(emb, "vec_id", "embedding", path,
      groups = 4, groupSize = 4, iters = 2, dim = 64, subs = 8, ksub = 4)
    Similarity.imiPqIndexSearch(s, emb.filter(col("vec_id") < 10), "vec_id",
        "embedding", path, k = 5, groupSize = 4, nprobeGroups = 2,
        nprobeCells = 4, dim = 64, subs = 8, ksub = 4)
      .orderBy(col("query_id"), col("rnk"))
  }

  val annImiPqIndexRoundtripSql: String = annImiPqSql

  /** Append-without-retrain on the persisted IMI+PQ index: the IMI levels
    * train on 90% of the corpus, the held-out 10% is cell-assigned by the
    * frozen RELOADED model and PQ-coded by the shared literal codebook
    * (parquet append to the code table); the fragmented code table is then
    * COMPACTED ([[Similarity.indexCompact]]) and search serves the union
    * from the compacted generation — the full maintenance lifecycle under
    * one hash. The twin trains its IMI CTE chains on the same 90%
    * predicate but codes and probes everything. */
  def annImiPqIndexAppend(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val path = Streaming.tempWorkspace("graft-imipq-index-append")
    Similarity.imiPqIndexWrite(emb.filter(pmod(col("vec_id"), lit(10)) =!= 0),
      "vec_id", "embedding", path, groups = 4, groupSize = 4, iters = 2,
      dim = 64, subs = 8, ksub = 4)
    Similarity.imiPqIndexAppend(s,
      emb.filter(pmod(col("vec_id"), lit(10)) === 0), "vec_id", "embedding",
      path, groupSize = 4, dim = 64, subs = 8, ksub = 4)
    Similarity.indexCompact(s, path)
    Similarity.imiPqIndexSearch(s, emb.filter(col("vec_id") < 10), "vec_id",
        "embedding", path, k = 5, groupSize = 4, nprobeGroups = 2,
        nprobeCells = 4, dim = 64, subs = 8, ksub = 4)
      .orderBy(col("query_id"), col("rnk"))
  }

  val annImiPqIndexAppendSql: String = LshOracleSql.imiPqTopK(k = 5,
    groups = 4, groupSize = 4, iters = 2, dim = 64, nprobeGroups = 2,
    nprobeCells = 4, subs = 8, ksub = 4, trainPred = "vec_id % 10 != 0")

  /** [[annIvfTrained]] with `literalBudget = 0`: BOTH k-means training and
    * search assignment forced through the broadcast-codebook JOIN path —
    * the production large-k strategy. Declared against the SAME oracle SQL
    * as the literal-path query: the two strategies are bit-identical by
    * design, and this entry makes the hash gate (not just a spec
    * comparison) enforce that for the join path (VERDICT r6 next #7). */
  def annIvfTrainedJoinpath(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfTrainedTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, cells = 8, nprobe = 2, iters = 2,
        dim = 64, literalBudget = 0L)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Trained-PQ ADC search (per-subspace k-means codebooks → encode →
    * ADC scan composed); see [[Similarity.pqTrainedTopK]]. */
  def annPqTrained(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.pqTrainedTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, subs = 8, ksub = 4, iters = 2,
        dim = 64)
      .orderBy(col("query_id"), col("rnk"))
  }

  val annPqTrainedSql: String = LshOracleSql.pqTrainedTopK(k = 5,
    subs = 8, ksub = 4, iters = 2, dim = 64)

  /** Trained-PQ index PERSISTENCE round-trip — the production serving
    * split: [[Similarity.pqIndexWrite]] trains the codebooks, encodes the
    * corpus, and lands both as plain parquet tables in a fresh temp
    * workspace; [[Similarity.pqIndexSearch]] reloads the model and serves
    * top-k from the stored 2-byte codes WITHOUT touching the original
    * vectors. Gated against the SAME twin as `ann_pq_trained`: doubles
    * are bit-exact through parquet, so a byte flip anywhere in
    * model-save → reload → ADC scoring breaks the hash. Like the
    * ts_store_* family, every invocation pays the real write + read. */
  def annPqIndexRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val path = Streaming.tempWorkspace("graft-pq-index")
    Similarity.pqIndexWrite(emb, "vec_id", "embedding", path,
      subs = 8, ksub = 4, iters = 2, dim = 64)
    Similarity.pqIndexSearch(s, emb.filter(col("vec_id") < 10), "vec_id",
        "embedding", path, k = 5, subs = 8, ksub = 4, dim = 64)
      .orderBy(col("query_id"), col("rnk"))
  }

  val annPqIndexRoundtripSql: String = annPqTrainedSql

  /** Append-without-retrain on the persisted index: codebooks train on
    * 90% of the corpus ([[Similarity.pqIndexWrite]] over vec_id % 10 ≠ 0),
    * then the held-out 10% arrives LATER and is encoded by the frozen,
    * RELOADED model ([[Similarity.pqIndexAppend]] — an ordinary parquet
    * append); the code table is then COMPACTED
    * ([[Similarity.indexCompact]]) and search serves the union from the
    * compacted generation. The twin trains its unrolled k-means chains on
    * the same 90% predicate but codes/probes everything, so a drifted
    * codebook, a re-encode of the base, a mis-encoded appended batch, or a
    * row lost/duplicated by compaction all break the hash. */
  def annPqIndexAppend(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val path = Streaming.tempWorkspace("graft-pq-index-append")
    Similarity.pqIndexWrite(emb.filter(pmod(col("vec_id"), lit(10)) =!= 0),
      "vec_id", "embedding", path, subs = 8, ksub = 4, iters = 2, dim = 64)
    Similarity.pqIndexAppend(s, emb.filter(pmod(col("vec_id"), lit(10)) === 0),
      "vec_id", "embedding", path, subs = 8, ksub = 4, dim = 64)
    Similarity.indexCompact(s, path)
    Similarity.pqIndexSearch(s, emb.filter(col("vec_id") < 10), "vec_id",
        "embedding", path, k = 5, subs = 8, ksub = 4, dim = 64)
      .orderBy(col("query_id"), col("rnk"))
  }

  val annPqIndexAppendSql: String = LshOracleSql.pqTrainedTopK(k = 5,
    subs = 8, ksub = 4, iters = 2, dim = 64,
    trainPred = "vec_id % 10 != 0")

  /** Fully-trained IVF-PQ (trained coarse pruning × trained compressed
    * scan); see [[Similarity.ivfPqTrainedTopK]]. */
  def annIvfPqTrained(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfPqTrainedTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, cells = 8, nprobe = 2, subs = 8,
        ksub = 4, iters = 2, dim = 64)
      .orderBy(col("query_id"), col("rnk"))
  }

  val annIvfPqTrainedSql: String = LshOracleSql.ivfPqTrainedTopK(k = 5,
    cells = 8, nprobe = 2, subs = 8, ksub = 4, iters = 2, dim = 64)

  /** Benchmark decontamination: training docs (source != src0) sharing
    * verbatim 5-gram spans with the held-out slice (source = src0). */
  def textContamination(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    TextAnalysis.contamination(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "doc_id", "text", n = 5)
      .orderBy(col("doc_id"))
  }

  val textContaminationSql: String =
    """WITH toks AS (
      |  SELECT doc_id, source, regexp_extract_all(lower(text), '\w+') ts
      |  FROM documents),
      |tr AS (
      |  SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, len(ts)-4),
      |    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4])) s
      |  FROM toks WHERE source != 'src0' AND len(ts) >= 5),
      |ev AS (
      |  SELECT DISTINCT unnest(list_transform(generate_series(1, len(ts)-4),
      |    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4])) s
      |  FROM toks WHERE source = 'src0' AND len(ts) >= 5),
      |hits AS (
      |  SELECT tr.doc_id, COUNT(*) AS n FROM tr JOIN ev USING (s) GROUP BY 1)
      |SELECT d.doc_id, COALESCE(n, 0) AS n_shared_grams,
      |  COALESCE(n, 0) > 0 AS contaminated
      |FROM documents d LEFT JOIN hits ON hits.doc_id = d.doc_id
      |WHERE d.source != 'src0' ORDER BY d.doc_id""".stripMargin

  /** The same decontamination contract served through the BLOOM-prefilter
    * path ([[TextAnalysis.contaminationBloom]]) — gated against the SAME
    * twin as `text_contamination`, which IS the point: the codegen'd
    * bloom probe prunes the gram stream but the exact verify join makes
    * any filter contents invisible in the result. */
  def textContaminationBloom(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    TextAnalysis.contaminationBloom(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "doc_id", "text", n = 5)
      .orderBy(col("doc_id"))
  }

  /** Per-source curriculum ordering — rank documents easiest→hardest by
    * the unigram-LM difficulty score ([[TextAnalysis.unigramNegLogprob]]:
    * rarer vocabulary ⇒ higher mean neg-logprob ⇒ later stage) and cut
    * each source into 4 curriculum stages. The window partitions by
    * SOURCE deliberately: per-group windows parallelize across executors,
    * and per-mixture-component curricula are what a data-mixing trainer
    * consumes — a single global ntile would funnel the corpus through one
    * partition (the classic unpartitioned-window scale trap). */
  def pipelineCurriculum(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val diff = TextAnalysis.unigramNegLogprob(docs, "doc_id", "text")
      .select(col("doc_id"), col("avg_neg_logprob").as("difficulty"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("difficulty"), col("doc_id"))
    docs.select(col("doc_id"), col("source"))
      .join(diff, "doc_id")
      .select(col("doc_id"), col("source"), col("difficulty"),
        // long: DuckDB's ntile emits BIGINT and the gate compares schemas
        ntile(4).over(w).cast("long").as("stage"))
      .orderBy(col("doc_id"))
  }

  /** Twin: the [[textPerplexitySql]] difficulty arithmetic + the same
    * per-source ntile (SQL-standard even distribution, earlier tiles take
    * the remainder — Spark and DuckDB agree). */
  val pipelineCurriculumSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS t
      |  FROM documents),
      |st AS (SELECT COUNT(*) AS n, COUNT(DISTINCT t) AS v FROM tok),
      |m AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
      |sc AS (
      |  SELECT doc_id,
      |    FLOOR(LN(CAST(n + v AS DOUBLE) / (c + 1)) * 1e8 + 0.5) / 1e8 AS nl
      |  FROM tok JOIN m USING (t), st),
      |agg AS (
      |  SELECT doc_id, COUNT(*) AS n_tokens,
      |    SUM(CAST(nl AS DECIMAL(20,8))) AS s
      |  FROM sc GROUP BY doc_id),
      |diff AS (
      |  SELECT doc_id,
      |    FLOOR(CAST(s AS DOUBLE) / n_tokens * 1e6 + 0.5) / 1e6 AS difficulty
      |  FROM agg)
      |SELECT d.doc_id, d.source, difficulty,
      |  ntile(4) OVER (PARTITION BY d.source
      |                 ORDER BY difficulty, d.doc_id) AS stage
      |FROM documents d JOIN diff ON diff.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Sequence packing: documents → fixed-500-token bins per source,
    * next-fit in doc-id order (budget chosen to split every fixture
    * source into multiple bins — ~1.3-1.5k tokens per source at sf0.01). */
  def textPackBins(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.packBins(Tables.documents(s, dir), "doc_id", "text",
        "source", budget = 500)
      .orderBy(col("doc_id"))

  val textPackBinsSql: String =
    """SELECT doc_id, source, n_tokens,
      |  CAST(FLOOR(CAST(SUM(n_tokens) OVER w - n_tokens AS DOUBLE) / 500) AS BIGINT) AS bin
      |FROM (
      |  SELECT doc_id, source,
      |    CAST(len(regexp_extract_all(lower(text), '\w+')) AS BIGINT) AS n_tokens
      |  FROM documents)
      |WINDOW w AS (PARTITION BY source ORDER BY doc_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY doc_id""".stripMargin

  /** Repeated-passage scrub (CCNet-style line dedup over 10-token
    * segments): segments occurring in ≥2 distinct documents are removed
    * and every document is rebuilt; the twin re-derives the census, the
    * drop set, and the byte-exact rebuilt text — so the gate checks the
    * whole scrub, not just the counts. */
  def textSegDedup(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.segDedup(Tables.documents(s, dir), "doc_id", "text",
        window = 10, minDocs = 2)
      .orderBy(col("doc_id"))

  val textSegDedupSql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '\w+') ts
      |  FROM documents),
      |segs AS (
      |  SELECT doc_id, CAST(i AS INT) - 1 AS seg_idx,
      |    array_to_string(ts[(i-1)*10+1 : (i-1)*10+10], ' ') AS seg
      |  FROM (SELECT doc_id, ts,
      |          unnest(generate_series(1, CAST(ceil(len(ts)/10.0) AS BIGINT))) AS i
      |        FROM toks)),
      |bp AS (
      |  SELECT seg FROM segs GROUP BY seg
      |  HAVING COUNT(DISTINCT doc_id) >= 2)
      |SELECT t.doc_id,
      |  COUNT(s.seg) AS n_segs,
      |  COUNT(bp.seg) AS n_dropped,
      |  COALESCE(string_agg(CASE WHEN bp.seg IS NULL THEN s.seg END,
      |    ' ' ORDER BY s.seg_idx), '') AS clean_text
      |FROM toks t
      |LEFT JOIN segs s ON s.doc_id = t.doc_id
      |LEFT JOIN bp ON bp.seg = s.seg
      |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin

  /** ExactSubstr cross-document span scrub (Lee et al. 2021) — stride-1
    * 10-token spans repeated across ≥2 docs removed everywhere, the twin
    * re-deriving the fingerprint census, hit merging, and the md5 of every
    * rebuilt document; see [[TextAnalysis.substrDedup]]. */
  def textSubstrDedup(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.substrDedup(Tables.documents(s, dir), "doc_id", "text",
        window = 10, minDocs = 2)
      .orderBy(col("doc_id"))

  val textSubstrDedupSql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ts
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, i - 1 AS pos,
      |    substr(md5(array_to_string(ts[i : i + 9], ' ')), 1, 16) AS h
      |  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 9)) AS i
      |        FROM toks WHERE len(ts) >= 10)),
      |dup AS (SELECT h FROM grams GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
      |starts AS (
      |  SELECT doc_id, list_sort(list(pos)) AS ss
      |  FROM grams JOIN dup USING (h) GROUP BY doc_id),
      |cov AS (
      |  SELECT t.doc_id, ts, COALESCE(ss, []) AS ss,
      |    list_transform(range(len(ts)),
      |      p -> len(list_filter(COALESCE(ss, []), s -> s <= p AND p <= s + 9)) > 0) AS cv
      |  FROM toks t LEFT JOIN starts USING (doc_id))
      |SELECT doc_id,
      |  CAST(len(ts) AS BIGINT) AS n_tokens,
      |  CAST(len(ss) AS BIGINT) AS n_dup_starts,
      |  CAST(len(list_filter(range(len(ts)),
      |    p -> cv[p + 1] AND (p = 0 OR NOT cv[p]))) AS BIGINT) AS n_spans,
      |  CAST(len(list_filter(cv, c -> NOT c)) AS BIGINT) AS n_clean_tokens,
      |  md5(COALESCE(array_to_string(list_transform(list_filter(range(len(ts)),
      |    p -> NOT cv[p + 1]), p -> ts[p + 1]), ' '), '')) AS clean_hash
      |FROM cov ORDER BY doc_id""".stripMargin

  /** DSIR importance weights against the src0 target domain (Xie et al.
    * 2023) — hashed unigram+bigram bucket models, add-one smoothing; see
    * [[TextAnalysis.dsirWeight]]. */
  def textDsirWeight(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.dsirWeight(Tables.documents(s, dir), "doc_id", "text",
        col("source") === "src0")
      .orderBy(col("doc_id"))

  val textDsirWeightSql: String =
    """WITH d AS (
      |  SELECT doc_id, source = 'src0' AS is_t,
      |    regexp_extract_all(lower(text), '\w+') AS ts
      |  FROM documents),
      |feats AS (
      |  SELECT doc_id, is_t, substr(md5(g), 1, 2) AS b
      |  FROM (
      |    SELECT doc_id, is_t, unnest(ts) AS g FROM d
      |    UNION ALL
      |    SELECT doc_id, is_t,
      |      unnest(list_transform(generate_series(1, len(ts) - 1),
      |        i -> ts[i] || ' ' || ts[i + 1])) AS g
      |    FROM d)),
      |model AS (
      |  SELECT b, SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
      |         SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS cr
      |  FROM feats GROUP BY b),
      |tot AS (
      |  SELECT SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS nt,
      |         SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS nr
      |  FROM feats),
      |sc AS (
      |  SELECT doc_id,
      |    FLOOR(LN(CAST((ct + 1) * (nr + 256) AS DOUBLE) /
      |             ((cr + 1) * (nt + 256))) * 1e8 + 0.5) / 1e8 AS w
      |  FROM feats JOIN model USING (b), tot
      |  WHERE NOT is_t)
      |SELECT doc_id, COUNT(*) AS n_feats,
      |  FLOOR(CAST(SUM(CAST(w AS DECIMAL(20,8))) AS DOUBLE) * 1e6 + 0.5) / 1e6
      |    AS dsir_weight
      |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Contrastive hard-negative / nearest-positive mining over the labeled
    * embedding corpus — cell-scoped (IVF-style) neighborhoods with pinned
    * winners; see [[Similarity.hardNegatives]]. */
  def embHardNegatives(s: SparkSession, dir: String): DataFrame =
    Similarity.hardNegatives(Tables.embeddings(s, dir), "vec_id", "label",
        "embedding", Array.tabulate(16, 64)(Similarity.centroidComponent))
      .orderBy(col("vec_id"))

  val embHardNegativesSql: String =
    LshOracleSql.hardNegatives(cells = 16, dim = 64,
      maxCell = graft.operators.Dedup.DefaultMaxBucket)

  /** Centroid-distance outliers — the per-label embedding-space quality
    * filter (>2σ distance to own centroid ⇒ mislabeled / OOD candidate). */
  def embOutliers(s: SparkSession, dir: String): DataFrame =
    Similarity.centroidOutlierStats(Tables.embeddings(s, dir),
        "vec_id", "label", "embedding")
      .orderBy(col("label"))

  val embOutliersSql: String =
    """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) e FROM embeddings),
      |cent AS (
      |  SELECT label, CAST(i - 1 AS INT) AS pos,
      |    ROUND(CAST(SUM(CAST(e[i] AS DECIMAL(20,8))) AS DOUBLE) / COUNT(*), 6) AS centroid
      |  FROM (SELECT label, unnest(generate_series(1, len(e))) AS i, e FROM v)
      |  GROUP BY label, i),
      |ex AS (SELECT vec_id AS vid, label, unnest(generate_series(1, len(e))) AS i, e FROM v),
      |dtab AS (
      |  SELECT vid, label,
      |    CAST(SQRT(CAST(SUM(CAST(df * df AS DECIMAL(25,10))) AS DOUBLE)) AS DECIMAL(18,9)) AS d
      |  FROM (SELECT vid, ex.label AS label, e[i] - centroid AS df
      |        FROM ex JOIN cent ON cent.label = ex.label AND cent.pos = i - 1)
      |  GROUP BY vid, label),
      |st AS (SELECT label, COUNT(*) AS n, SUM(d) AS sd, SUM(d * d) AS qd
      |       FROM dtab GROUP BY label),
      |zs AS (
      |  SELECT dtab.label AS label,
      |    FLOOR(((CAST(d AS DOUBLE) - CAST(sd AS DOUBLE) / n)
      |      / SQRT(CAST(qd AS DOUBLE) / n - (CAST(sd AS DOUBLE) / n) * (CAST(sd AS DOUBLE) / n)))
      |      * 1e6 + 0.5) / 1e6 AS z
      |  FROM dtab JOIN st USING (label))
      |SELECT label, n AS n_vecs,
      |  FLOOR((CAST(sd AS DOUBLE) / n) * 1e6 + 0.5) / 1e6 AS mean_d,
      |  n_outliers, max_z
      |FROM st JOIN (
      |  SELECT label, COUNT(*) FILTER (z > 2.0) AS n_outliers, MAX(z) AS max_z
      |  FROM zs GROUP BY label) oc USING (label)
      |ORDER BY label""".stripMargin

  /** Per-label mean embedding — one row per (label, dimension). The
    * component sums are exact decimals on both engines, so the gate
    * hash-checks elementwise means despite float inputs. */
  def embLabelCentroids(s: SparkSession, dir: String): DataFrame =
    Similarity.labelCentroids(Tables.embeddings(s, dir), "label", "embedding")
      .orderBy(col("label"), col("pos"))

  val embLabelCentroidsSql: String =
    """WITH v AS (SELECT label, CAST(embedding AS DOUBLE[]) e FROM embeddings),
      |ex AS (SELECT label, unnest(generate_series(1, len(e))) AS i, e FROM v)
      |SELECT label, CAST(i - 1 AS INT) AS pos, COUNT(*) AS n_vecs,
      |  ROUND(CAST(SUM(CAST(e[i] AS DECIMAL(20,8))) AS DOUBLE) / COUNT(*), 6) AS centroid
      |FROM ex GROUP BY label, i ORDER BY label, pos""".stripMargin

  /** Upper-triangle dimension-pair covariance of the embedding corpus —
    * the d×d moment matrix PCA/whitening starts from (and the input to a
    * trained OPQ rotation). The pair terms are generated ROW-LOCALLY by
    * two chained posexplodes (no self-join: each corpus row streams its
    * d(d+1)/2 products straight into the aggregate), so the only exchange
    * is the final 2080-group hash aggregate and map-side combine shrinks
    * every partition to ≤2080 partial rows — at 100 TB this is the
    * per-partition Gram-partials pattern, with no corpus shuffle at all.
    *
    * Determinism: [[embDimStats]]' decimal moment pattern — DECIMAL(20,8)
    * casts, exact order-independent sums, r6 on the derived doubles. */
  def embCovariance(s: SparkSession, dir: String): DataFrame = {
    def r6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
    def dec8(c: Column): Column = c.cast("double").cast("decimal(20,8)")
    val n = col("n").cast("double")
    val m = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        posexplode(col("embedding")).as(Seq("d1", "x1r")))
      .select(col("d1"), dec8(col("x1r")).as("x1"),
        posexplode(col("embedding")).as(Seq("d2", "x2r")))
      .filter(col("d1") <= col("d2"))
      .select(col("d1"), col("d2"), col("x1"), dec8(col("x2r")).as("x2"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("n"), sum(col("x1")).as("s1"),
        sum(col("x2")).as("s2"), sum(col("x1") * col("x2")).as("s12"))
    m.select(col("d1"), col("d2"), col("n"),
        r6((col("s12").cast("double") -
          col("s1").cast("double") * col("s2").cast("double") / n) / n)
          .as("cov_pop"))
      .orderBy(col("d1"), col("d2"))
  }

  val embCovarianceSql: String =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
      |e1 AS (SELECT vec_id, unnest(generate_series(1, len(e))) AS i, e FROM v),
      |p AS (SELECT vec_id, i, unnest(generate_series(i, len(e))) AS j, e FROM e1),
      |m AS (
      |  SELECT CAST(i - 1 AS INT) AS d1, CAST(j - 1 AS INT) AS d2,
      |    COUNT(*) AS n,
      |    SUM(CAST(e[i] AS DECIMAL(20,8))) AS s1,
      |    SUM(CAST(e[j] AS DECIMAL(20,8))) AS s2,
      |    SUM(CAST(e[i] AS DECIMAL(20,8)) * CAST(e[j] AS DECIMAL(20,8))) AS s12
      |  FROM p GROUP BY i, j)
      |SELECT d1, d2, n,
      |  FLOOR((CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / n)
      |    / n * 1e6 + 0.5) / 1e6 AS cov_pop
      |FROM m ORDER BY d1, d2""".stripMargin

  /** Top principal component by POWER ITERATION over the covariance frame
    * — the dimensionality-reduction/whitening step of an embedding
    * pipeline, composed from [[embCovariance]] exactly like the trained-ANN
    * family composes [[Similarity.kmeansTrain]]: the heavy work (the d²
    * moment matrix from n·d² corpus terms) is one distributed pass; each
    * power step is then a matrix-vector product over the (cached) d²-row
    * covariance frame with the current vector broadcast as model state —
    * the shape that still works when d² rows outgrow the driver. The final
    * step stays in the returned plan.
    *
    * Determinism (both engines bit-identical, converged or not): covariance
    * entries re-quantize to DECIMAL(12,6); each product sum is exact
    * decimal (order-independent); w re-quantizes r6 before the norm square
    * sum (so that sum is exact decimal too); only sqrt/divide run in
    * doubles — on identical inputs. The hash gate pins the entire
    * trajectory. */
  def embPcaPower(s: SparkSession, dir: String,
                  iters: Int = 3, dim: Int = 64): DataFrame = {
    import s.implicits._
    def r6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
    // r17 (VERDICT r16 next #5): the d² covariance moment aggregation is
    // the ONLY corpus-sized work — collect its dim(dim+1)/2 decimal rows
    // ONCE (model-sized state, like a k-means centroid collect) and run
    // the power iterations DRIVER-LOCAL on the mirrored matrix. The old
    // shape cached a self-union (which re-ran the corpus aggregation for
    // EACH union branch) and paid one distributed matvec job per
    // iteration; job count drops from O(iters) to O(1) and the corpus
    // aggregation runs once instead of twice. Arithmetic is step-for-step
    // identical: the matvec is an exact decimal Σ c6·val (order-
    // independent, so locality cannot change it), re-quantized through the
    // same floor(x·1e6+0.5)/1e6 double and DECIMAL(12,6) HALF_UP cast the
    // in-plan expressions applied, then the same exact-decimal square sum,
    // double sqrt and divisions — bit-identical loadings by construction
    // (hash-gated against the unchanged DuckDB twin).
    val covRows = embCovariance(s, dir)
      .select(col("d1"), col("d2"),
        col("cov_pop").cast("decimal(12,6)").as("c6"))
      .collect()
    val c = Array.ofDim[java.math.BigDecimal](dim, dim)
    covRows.foreach { r =>
      val (i, j) = (r.getAs[Int]("d1"), r.getAs[Int]("d2"))
      val b = r.getAs[java.math.BigDecimal]("c6")
      c(i)(j) = b
      c(j)(i) = b // the old self-union's mirrored lower triangle
    }
    def dec6(x: Double): java.math.BigDecimal =
      new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP)
    // Σ_j c6(i,j)·val(j) exactly as the grouped decimal sum computed it,
    // then the r6-on-double requantization to DECIMAL(12,6)
    def matvec(v: IndexedSeq[java.math.BigDecimal]): Array[java.math.BigDecimal] =
      Array.tabulate(dim) { i =>
        var ws = java.math.BigDecimal.ZERO
        var j = 0
        while (j < dim) { ws = ws.add(c(i)(j).multiply(v(j))); j += 1 }
        dec6(math.floor(ws.doubleValue() * 1e6 + 0.5) / 1e6)
      }
    var v: IndexedSeq[java.math.BigDecimal] =
      (0 until dim).map(LshOracleSql.pcaInit)
    for (_ <- 1 until iters) {
      val w6 = matvec(v)
      // exact decimal square sum, then double sqrt/divide — the same op
      // order the twin runs in SQL
      val n2 = w6.map(b => b.multiply(b))
        .reduce(_.add(_)).doubleValue()
      val nrm = math.sqrt(n2)
      v = w6.toIndexedSeq.map(b =>
        dec6(math.floor(b.doubleValue() / nrm * 1e6 + 0.5) / 1e6))
    }
    val w6 = matvec(v)
    val nrm = math.sqrt(
      w6.map(b => b.multiply(b)).reduce(_.add(_)).doubleValue())
    // the final projection runs IN-PLAN over the driver-computed decimal
    // vector (a 64-row local relation), keeping the declared output the
    // same r6 column expressions — and their types/nullability — as before
    val fin = w6.toIndexedSeq.zipWithIndex
      .map { case (b, i) => (i, BigDecimal(b)) }
      .toDF("i", "w6")
      .select(col("i"), col("w6").cast("decimal(12,6)").as("w6"))
    fin.select(col("i").as("d"),
        r6(col("w6").cast("double") / lit(nrm)).as("loading"),
        r6(lit(nrm)).as("lambda"))
      .orderBy(col("d"))
  }

  val embPcaPowerSql: String = LshOracleSql.pcaPower(iters = 3, dim = 64)

  /** Per-dimension embedding statistics (mean/variance/range) — the
    * codebook-health audit run before quantization or whitening: a
    * near-zero-variance dimension is dead weight, a huge-range one
    * dominates distance. Decimal moment sums (exact, order-independent)
    * with the agg_corr 6dp rounding on the derived doubles; one posexplode
    * + one hash aggregate, linear at any corpus size. */
  def embDimStats(s: SparkSession, dir: String): DataFrame = {
    def r6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
    val n  = col("n").cast("double")
    val sv = col("sv").cast("double")
    Tables.embeddings(s, dir)
      .select(posexplode(col("embedding"))).toDF("pos", "x0")
      .withColumn("x", col("x0").cast("double").cast("decimal(20,8)"))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sv"),
        sum(col("x") * col("x")).as("qv"),
        min(col("x")).cast("double").as("min_x"),
        max(col("x")).cast("double").as("max_x"))
      .select(col("pos"), col("n"),
        r6(sv / n).as("mean"),
        r6((col("qv").cast("double") - sv * sv / n) / n).as("var_pop"),
        col("min_x"), col("max_x"))
      .orderBy(col("pos"))
  }

  val embDimStatsSql: String =
    """WITH v AS (SELECT CAST(embedding AS DOUBLE[]) e FROM embeddings),
      |ex AS (SELECT unnest(generate_series(1, len(e))) AS i, e FROM v),
      |m AS (
      |  SELECT CAST(i - 1 AS INT) AS pos, COUNT(*) AS n,
      |    SUM(CAST(e[i] AS DECIMAL(20,8))) AS sv,
      |    SUM(CAST(e[i] AS DECIMAL(20,8)) * CAST(e[i] AS DECIMAL(20,8))) AS qv,
      |    CAST(MIN(CAST(e[i] AS DECIMAL(20,8))) AS DOUBLE) AS min_x,
      |    CAST(MAX(CAST(e[i] AS DECIMAL(20,8))) AS DOUBLE) AS max_x
      |  FROM ex GROUP BY i)
      |SELECT pos, n,
      |  FLOOR(CAST(sv AS DOUBLE) / n * 1e6 + 0.5) / 1e6 AS mean,
      |  FLOOR((CAST(qv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / n) / n
      |    * 1e6 + 0.5) / 1e6 AS var_pop,
      |  min_x, max_x
      |FROM m ORDER BY pos""".stripMargin

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

  /** Aspect-preserving media resize ([[Multimodal.resizeMedia]], maxDim
    * 96) — the thumbnail/normalization step before a vision encoder. The
    * fixture blobs are text bytes, so every record runs the STUB seam
    * (real `BufferedImage` resizing is pinned on genuine PNGs in
    * MultimodalSpec); the twin recomputes the stub dims, the integer
    * downscale arithmetic, and the tagged content hash. */
  def mediaResize(s: SparkSession, dir: String): DataFrame =
    Multimodal.resizeMedia(s,
        Multimodal.mediaFromDocuments(Tables.documents(s, dir)), maxDim = 96)
      .toDF().orderBy(col("media_id"))

  val mediaResizeSql: String =
    """WITH feat AS (
      |  SELECT doc_id AS media_id, string_split(source, ':')[1] AS media_type,
      |    LENGTH(text) AS n, text FROM documents),
      |dims AS (
      |  SELECT media_id, media_type, text,
      |    CAST(64 + n % 577 AS INT) AS sw,
      |    CAST(64 + (n * 31) % 421 AS INT) AS sh
      |  FROM feat),
      |t AS (SELECT *, GREATEST(sw, sh) AS lng FROM dims),
      |r AS (
      |  SELECT media_id, media_type, text, sw, sh,
      |    CASE WHEN lng <= 96 THEN sw ELSE GREATEST(1, sw*96//lng) END AS w,
      |    CASE WHEN lng <= 96 THEN sh ELSE GREATEST(1, sh*96//lng) END AS h
      |  FROM t)
      |SELECT media_id, media_type, sw AS src_width, sh AS src_height,
      |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
      |  md5(text || ':resize:' || CAST(w AS VARCHAR) || 'x' ||
      |    CAST(h AS VARCHAR)) AS content_hash
      |FROM r ORDER BY media_id""".stripMargin

  /** Corpus bigram frequency table, top 20 by (count desc, gram). */
  def textNgramFreq(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.ngramFreq(Tables.documents(s, dir), "doc_id", "text",
        n = 2, topK = 20)
      .orderBy(col("n_occurrences").desc, col("gram"))

  val textNgramFreqSql: String =
    """WITH toks AS (
      |  SELECT regexp_extract_all(lower(text), '\w+') ts FROM documents),
      |grams AS (
      |  SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
      |    i -> ts[i] || ' ' || ts[i+1])) AS gram
      |  FROM toks WHERE len(ts) >= 2)
      |SELECT gram, COUNT(*) AS n_occurrences FROM grams
      |GROUP BY gram ORDER BY n_occurrences DESC, gram LIMIT 20""".stripMargin

  /** Frame sampling over the decoded media features: every 4th frame index
    * per record — the video fan-out a per-frame extractor consumes. The
    * oracle twin recomputes the stub's n_frames arithmetic + the same
    * stride series. */
  def mediaFrameSample(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
        Multimodal.decodeFeatures(s,
          Multimodal.mediaFromDocuments(Tables.documents(s, dir))).toDF(),
        stride = 4)
      .orderBy(col("media_id"), col("frame_idx"))

  val mediaFrameSampleSql: String =
    """WITH feat AS (
      |  SELECT doc_id AS media_id, CAST(1 + LENGTH(text) % 24 AS INT) AS n_frames
      |  FROM documents)
      |SELECT media_id,
      |  CAST(unnest(generate_series(0, n_frames - 1, 4)) AS INT) AS frame_idx,
      |  n_frames
      |FROM feat ORDER BY media_id, frame_idx""".stripMargin

  // ---- BM25 keyword retrieval (persisted text index family) ----

  /** The retrieval gates' query batch: the first 8 documents' first 6
    * tokens, re-joined as query text — derived from the fixture so the
    * set scales with it, tokenizing back to exactly the sliced tokens
    * (\w+ runs survive a space re-join). */
  private[queries] def bm25GateQueries(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") < 8)
      .select(col("doc_id").as("query_id"),
        array_join(slice(graft.operators.Dedup.tokens(col("text")), 1, 6),
          " ").as("qtext"))

  /** The BM25 DuckDB twin: full Okapi scoring (k1=1.2, b=0.75,
    * +1-form idf) with per-term contributions rounded to 8 dp and summed
    * as DECIMAL(20,8) — the same order-independent decimal discipline as
    * [[graft.operators.TextIndex.bm25TopK]], literal-for-literal. The
    * `e0` suffixes force DOUBLE literals (a bare 0.5 is DECIMAL in
    * DuckDB, which would reshape the arithmetic). */
  private def bm25Sql(docPred: String, k: Int = 5): String = {
    val where = if (docPred.isEmpty) "" else s" WHERE $docPred"
    s"""WITH corpus AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ts
       |  FROM documents$where),
       |lens AS (SELECT doc_id, len(ts) AS dl FROM corpus),
       |tf AS (
       |  SELECT doc_id, term, COUNT(*) AS tf FROM (
       |    SELECT doc_id, unnest(ts) AS term FROM corpus)
       |  GROUP BY 1, 2),
       |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |g AS (SELECT COUNT(*) AS n, COALESCE(SUM(dl), 0) AS len_sum FROM lens),
       |qd AS (
       |  SELECT DISTINCT doc_id AS query_id, term FROM (
       |    SELECT doc_id, unnest(ts[1:6]) AS term FROM (
       |      SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ts
       |      FROM documents WHERE doc_id < 8))),
       |scored AS (
       |  SELECT qd.query_id, tf.doc_id,
       |    SUM(CAST(ROUND(
       |      LN(1.0e0 + (g.n - dfreq.df + 0.5e0) / (dfreq.df + 0.5e0)) *
       |      ((tf.tf * 2.2e0) /
       |       (tf.tf + 1.2e0 * (0.25e0 + (0.75e0 * lens.dl) /
       |          (CAST(g.len_sum AS DOUBLE) / g.n)))), 8)
       |      AS DECIMAL(20,8))) AS score
       |  FROM qd
       |  JOIN tf ON qd.term = tf.term
       |  JOIN dfreq ON tf.term = dfreq.term
       |  JOIN lens ON tf.doc_id = lens.doc_id
       |  CROSS JOIN g
       |  GROUP BY 1, 2)
       |SELECT query_id, rnk, doc_id, CAST(score AS DOUBLE) AS score FROM (
       |  SELECT query_id, doc_id, score, row_number() OVER (
       |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
       |  FROM scored)
       |WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  /** One-shot BM25 top-5 keyword retrieval over the documents corpus —
    * lexical search alongside the ANN family (hybrid retrieval's other
    * half, and the "find every document matching these phrases" audit
    * query a training-data pipeline runs constantly). */
  def textBm25TopK(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    TextIndex.bm25TopK(docs, bm25GateQueries(docs), "doc_id", "text",
        "query_id", "qtext", k = 5)
      .orderBy(col("query_id"), col("rnk"))
  }

  val textBm25TopKSql: String = bm25Sql("")

  /** Persisted BM25 index round-trip — the serving split for keyword
    * retrieval ([[annImiIndexRoundtrip]]'s lexical analog): postings +
    * statistics land as generational parquet tables, search serves from
    * the STORED tables with a term-pruned scan. Hash-gated against the
    * same twin as the one-shot compute, so a byte lost anywhere in
    * tokenize → persist → reload → prune → score breaks the gate. Every
    * invocation pays the real write + read. */
  def textBm25IndexRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val path = Streaming.tempWorkspace("graft-bm25-index")
    TextIndex.bm25IndexWrite(docs, "doc_id", "text", path)
    TextIndex.bm25IndexSearch(s, bm25GateQueries(docs), "query_id", "qtext",
        path, k = 5)
      .orderBy(col("query_id"), col("rnk"))
  }

  val textBm25IndexRoundtripSql: String = bm25Sql("")

  /** Append-without-rebuild on the persisted BM25 index: the base index
    * holds 90% of the corpus (doc_id % 10 != 0), the held-out 10% arrives
    * as a frozen-stats append (df/global are additive DELTAS over the
    * disjoint doc sets — no held row is read or rewritten), the
    * fragmented tables COMPACT (binary row-group merge), and search
    * serves the union. The twin scores the full corpus from scratch: a
    * double-counted df, a missed global delta, or a row lost/duplicated
    * by compaction all break the hash. */
  def textBm25IndexAppend(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val path = Streaming.tempWorkspace("graft-bm25-index-append")
    TextIndex.bm25IndexWrite(docs.filter(pmod(col("doc_id"), lit(10)) =!= 0),
      "doc_id", "text", path)
    TextIndex.bm25IndexAppend(s,
      docs.filter(pmod(col("doc_id"), lit(10)) === 0), "doc_id", "text",
      path)
    TextIndex.bm25IndexCompact(s, path)
    TextIndex.bm25IndexSearch(s, bm25GateQueries(docs), "query_id", "qtext",
        path, k = 5)
      .orderBy(col("query_id"), col("rnk"))
  }

  val textBm25IndexAppendSql: String = bm25Sql("")

  /** Tombstone-delete against the persisted BM25 index — takedown for
    * keyword retrieval: a deletion batch (doc_id % 7 = 3) lands as
    * tombstones (ids + captured lengths), and search drops the deleted
    * docs' postings AND corrects n/avgdl/df in-plan from rows already in
    * hand — BM25's statistics genuinely shift on delete, so the twin
    * (scoring a corpus that never held the deleted docs) breaks the hash
    * if any of the three corrections is missed. IndexDeleteSpec-style
    * vacuum parity is pinned in BM25Spec. */
  def textBm25IndexDelete(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val path = Streaming.tempWorkspace("graft-bm25-index-delete")
    TextIndex.bm25IndexWrite(docs, "doc_id", "text", path)
    TextIndex.bm25IndexDelete(s,
      docs.filter(pmod(col("doc_id"), lit(7)) === 3).select(col("doc_id")),
      "doc_id", path)
    TextIndex.bm25IndexSearch(s, bm25GateQueries(docs), "query_id", "qtext",
        path, k = 5)
      .orderBy(col("query_id"), col("rnk"))
  }

  val textBm25IndexDeleteSql: String = bm25Sql("doc_id % 7 != 3")

  /** Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical top-10
    * and the exact-cosine semantic top-10 over the SAME query ids
    * (documents 0-7's text prefixes / vectors 0-7) —
    * [[graft.operators.TextIndex.rrfFuse]], the production shape every
    * retrieval stack runs (each index prunes its own way, ranks fuse
    * calibration-free). Both input rankings are independently
    * oracle-gated (`text_bm25_topk`, `ann_bruteforce`); this gate pins
    * the fusion arithmetic and the outer-join membership on top. */
  def annHybridRrf(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val emb = Tables.embeddings(s, dir)
    val lex = TextIndex.bm25TopK(docs, bm25GateQueries(docs), "doc_id",
      "text", "query_id", "qtext", k = 10)
    val sem = Similarity.bruteForceTopK(emb,
      emb.filter(col("vec_id") < 8), "vec_id", "embedding", 10)
    TextIndex.rrfFuse(lex, "doc_id", sem, "nbr_id", k = 5)
      .orderBy(col("query_id"), col("rnk"))
  }

  val annHybridRrfSql: String = {
    // the bm25 CTE chain verbatim (k folded into the bm CTE), plus the
    // ann_bruteforce scoring verbatim (vec_id < 8, k=10), fused by RRF
    s"""WITH corpus AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ts
       |  FROM documents),
       |lens AS (SELECT doc_id, len(ts) AS dl FROM corpus),
       |tf AS (
       |  SELECT doc_id, term, COUNT(*) AS tf FROM (
       |    SELECT doc_id, unnest(ts) AS term FROM corpus)
       |  GROUP BY 1, 2),
       |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |g AS (SELECT COUNT(*) AS n, COALESCE(SUM(dl), 0) AS len_sum FROM lens),
       |qd AS (
       |  SELECT DISTINCT doc_id AS query_id, term FROM (
       |    SELECT doc_id, unnest(ts[1:6]) AS term FROM (
       |      SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ts
       |      FROM documents WHERE doc_id < 8))),
       |bm_scored AS (
       |  SELECT qd.query_id, tf.doc_id,
       |    SUM(CAST(ROUND(
       |      LN(1.0e0 + (g.n - dfreq.df + 0.5e0) / (dfreq.df + 0.5e0)) *
       |      ((tf.tf * 2.2e0) /
       |       (tf.tf + 1.2e0 * (0.25e0 + (0.75e0 * lens.dl) /
       |          (CAST(g.len_sum AS DOUBLE) / g.n)))), 8)
       |      AS DECIMAL(20,8))) AS score
       |  FROM qd
       |  JOIN tf ON qd.term = tf.term
       |  JOIN dfreq ON tf.term = dfreq.term
       |  JOIN lens ON tf.doc_id = lens.doc_id
       |  CROSS JOIN g
       |  GROUP BY 1, 2),
       |bm AS (
       |  SELECT query_id, doc_id, rnk AS lex_rnk FROM (
       |    SELECT query_id, doc_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
       |    FROM bm_scored)
       |  WHERE rnk <= 10),
       |ann_scored AS (
       |  SELECT p.vec_id AS query_id, c.vec_id AS doc_id,
       |    ROUND(list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
       |      / (SQRT(list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(p.embedding AS DOUBLE[])))
       |       * SQRT(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))), 6) AS cos_sim
       |  FROM embeddings p JOIN embeddings c ON p.vec_id < 8 AND c.vec_id != p.vec_id),
       |ann AS (
       |  SELECT query_id, doc_id, rnk AS sem_rnk FROM (
       |    SELECT query_id, doc_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY cos_sim DESC, doc_id) AS rnk
       |    FROM ann_scored)
       |  WHERE rnk <= 10),
       |fused AS (
       |  SELECT COALESCE(bm.query_id, ann.query_id) AS query_id,
       |    COALESCE(bm.doc_id, ann.doc_id) AS doc_id,
       |    COALESCE(1.0e0 / (60 + bm.lex_rnk), 0.0e0) +
       |    COALESCE(1.0e0 / (60 + ann.sem_rnk), 0.0e0) AS rrf
       |  FROM bm FULL OUTER JOIN ann
       |    ON bm.query_id = ann.query_id AND bm.doc_id = ann.doc_id)
       |SELECT query_id, rnk, doc_id, ROUND(rrf, 8) AS rrf FROM (
       |  SELECT query_id, doc_id, rrf, row_number() OVER (
       |    PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rnk
       |  FROM fused)
       |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
  }

  /** Weighted normalized-score hybrid fusion ([[TextIndex.scoreFuse]] —
    * `ann_hybrid_rrf`'s sibling over the SAME two rankings): per query,
    * BM25 and cosine scores min-max normalize and fuse as
    * 0.5·lex + 0.5·sem — the combiner that preserves score MARGIN where
    * RRF keeps only ranks; together the two gates pin both ends of the
    * standard hybrid configuration space. Same one-sided coverage
    * asymmetry as the RRF gate (lexical queries doc_id < 8, semantic
    * probes vec_id < 8 — here both sides cover the same ids, so every
    * fused row genuinely mixes both signals). The twin recomputes the
    * full BM25 chain, the brute-force cosine ranking, the per-query
    * min-max windows, and the convex combination. */
  def annHybridWsum(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val emb = Tables.embeddings(s, dir)
    val lex = TextIndex.bm25TopK(docs, bm25GateQueries(docs), "doc_id",
      "text", "query_id", "qtext", k = 10)
    val sem = Similarity.bruteForceTopK(emb,
      emb.filter(col("vec_id") < 8), "vec_id", "embedding", 10)
    TextIndex.scoreFuse(lex, "doc_id", "score", sem, "nbr_id", "cos_sim",
        k = 5)
      .orderBy(col("query_id"), col("rnk"))
  }

  lazy val annHybridWsumSql: String =
    s"""WITH lex AS (${bm25Sql("", k = 10)}),
       |ann_scored AS (
       |  SELECT p.vec_id AS query_id, c.vec_id AS doc_id,
       |    ROUND(list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
       |      / (SQRT(list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(p.embedding AS DOUBLE[])))
       |       * SQRT(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))), 6) AS cos_sim
       |  FROM embeddings p JOIN embeddings c ON p.vec_id < 8 AND c.vec_id != p.vec_id),
       |sem AS (
       |  SELECT query_id, doc_id, cos_sim FROM (
       |    SELECT query_id, doc_id, cos_sim, row_number() OVER (
       |      PARTITION BY query_id ORDER BY cos_sim DESC, doc_id) AS rnk
       |    FROM ann_scored)
       |  WHERE rnk <= 10),
       |lexn AS (
       |  SELECT query_id, doc_id,
       |    CASE WHEN mx = mn THEN 1.0e0 ELSE (s - mn) / (mx - mn) END AS ln
       |  FROM (
       |    SELECT query_id, doc_id, score AS s,
       |      MIN(score) OVER (PARTITION BY query_id) AS mn,
       |      MAX(score) OVER (PARTITION BY query_id) AS mx
       |    FROM lex)),
       |semn AS (
       |  SELECT query_id, doc_id,
       |    CASE WHEN mx = mn THEN 1.0e0 ELSE (s - mn) / (mx - mn) END AS sn
       |  FROM (
       |    SELECT query_id, doc_id, cos_sim AS s,
       |      MIN(cos_sim) OVER (PARTITION BY query_id) AS mn,
       |      MAX(cos_sim) OVER (PARTITION BY query_id) AS mx
       |    FROM sem)),
       |fused AS (
       |  SELECT COALESCE(l.query_id, a.query_id) AS query_id,
       |    COALESCE(l.doc_id, a.doc_id) AS doc_id,
       |    0.5e0 * COALESCE(l.ln, 0.0e0) + 0.5e0 * COALESCE(a.sn, 0.0e0) AS fused
       |  FROM lexn l FULL OUTER JOIN semn a
       |    ON l.query_id = a.query_id AND l.doc_id = a.doc_id)
       |SELECT query_id, rnk, doc_id, ROUND(fused, 6) AS fused FROM (
       |  SELECT query_id, doc_id, fused, row_number() OVER (
       |    PARTITION BY query_id ORDER BY fused DESC, doc_id) AS rnk
       |  FROM fused)
       |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin

  /** Hybrid retrieval over BOTH frozen persisted indexes — the production
    * serving composition (`ann_hybrid_rrf` is the same fusion with both
    * sides recomputed in-invocation; here the BM25 postings and the IMI
    * inverted lists each build ONCE and the query batch serves from the
    * stored tables — term-pruned postings scan + probed-cell-pruned list
    * scan — then RRF-fuses). The lexical query set is doc_id < 8, the
    * semantic probe set vec_id < 10: the asymmetry makes the fusion's
    * one-sided coalesce load-bearing on queries 8-9. The twin recomputes
    * the full-scoring BM25 chain and the full IMI trajectory from scratch
    * (k=10 each) and fuses with the same 1/(60+rnk) rule — an index row
    * lost to fragmentation, a stale df after append, or a rank drift in
    * either stored search breaks the hash. */
  def annHybridIndexRrf(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val emb = Tables.embeddings(s, dir)
    val bmPath = Streaming.tempWorkspace("graft-hybrid-bm25-index")
    val imiPath = Streaming.tempWorkspace("graft-hybrid-imi-index")
    TextIndex.bm25IndexWrite(docs, "doc_id", "text", bmPath)
    Similarity.imiIndexWrite(emb, "vec_id", "embedding", imiPath,
      groups = 4, groupSize = 4, iters = 2, dim = 64)
    val lex = TextIndex.bm25IndexSearch(s, bm25GateQueries(docs),
      "query_id", "qtext", bmPath, k = 10)
    val sem = Similarity.imiIndexSearch(s, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", imiPath, k = 10, groupSize = 4,
      nprobeGroups = 2, nprobeCells = 4)
    TextIndex.rrfFuse(lex, "doc_id", sem, "nbr_id", k = 5)
      .orderBy(col("query_id"), col("rnk"))
  }

  val annHybridIndexRrfSql: String =
    s"""WITH lex AS (${bm25Sql("", k = 10)}),
       |sem AS (${LshOracleSql.imiTopK(k = 10, groups = 4, groupSize = 4,
      iters = 2, dim = 64, nprobeGroups = 2, nprobeCells = 4)}),
       |fused AS (
       |  SELECT COALESCE(l.query_id, s.query_id) AS query_id,
       |    COALESCE(l.doc_id, s.nbr_id) AS doc_id,
       |    COALESCE(1.0e0 / (60 + l.rnk), 0.0e0) +
       |    COALESCE(1.0e0 / (60 + s.rnk), 0.0e0) AS rrf
       |  FROM lex l FULL OUTER JOIN sem s
       |    ON l.query_id = s.query_id AND l.doc_id = s.nbr_id)
       |SELECT query_id, rnk, doc_id, ROUND(rrf, 8) AS rrf FROM (
       |  SELECT query_id, doc_id, rrf, row_number() OVER (
       |    PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rnk
       |  FROM fused)
       |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin

  /** Weighted-sum hybrid over BOTH frozen persisted indexes (VERDICT r14
    * #3): [[annHybridIndexRrf]]'s sibling with [[TextIndex.scoreFuse]] as
    * the combiner — the TUNABLE fusion (the reason `scoreFuse` exists) now
    * serves from the stored BM25 postings and IMI lists instead of a
    * corpus recompute, which is the config a deployment that tunes the
    * fusion weight actually runs. Same build-once/serve-from-frozen shape
    * and the same one-sided asymmetry (lexical queries doc_id < 8,
    * semantic probes vec_id < 10); the twin recomputes both rankings from
    * scratch and replays the min-max normalization + convex combination,
    * so a stale statistic in either stored index shifts a normalized
    * score and breaks the hash. */
  def annHybridIndexWsum(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val emb = Tables.embeddings(s, dir)
    val bmPath = Streaming.tempWorkspace("graft-hybridw-bm25-index")
    val imiPath = Streaming.tempWorkspace("graft-hybridw-imi-index")
    TextIndex.bm25IndexWrite(docs, "doc_id", "text", bmPath)
    Similarity.imiIndexWrite(emb, "vec_id", "embedding", imiPath,
      groups = 4, groupSize = 4, iters = 2, dim = 64)
    val lex = TextIndex.bm25IndexSearch(s, bm25GateQueries(docs),
      "query_id", "qtext", bmPath, k = 10)
    val sem = Similarity.imiIndexSearch(s, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", imiPath, k = 10, groupSize = 4,
      nprobeGroups = 2, nprobeCells = 4)
    TextIndex.scoreFuse(lex, "doc_id", "score", sem, "nbr_id", "cos_sim",
        k = 5)
      .orderBy(col("query_id"), col("rnk"))
  }

  lazy val annHybridIndexWsumSql: String =
    s"""WITH lex AS (${bm25Sql("", k = 10)}),
       |sem AS (${LshOracleSql.imiTopK(k = 10, groups = 4, groupSize = 4,
      iters = 2, dim = 64, nprobeGroups = 2, nprobeCells = 4)}),
       |lexn AS (
       |  SELECT query_id, doc_id,
       |    CASE WHEN mx = mn THEN 1.0e0 ELSE (s - mn) / (mx - mn) END AS ln
       |  FROM (
       |    SELECT query_id, doc_id, score AS s,
       |      MIN(score) OVER (PARTITION BY query_id) AS mn,
       |      MAX(score) OVER (PARTITION BY query_id) AS mx
       |    FROM lex)),
       |semn AS (
       |  SELECT query_id, doc_id,
       |    CASE WHEN mx = mn THEN 1.0e0 ELSE (s - mn) / (mx - mn) END AS sn
       |  FROM (
       |    SELECT query_id, nbr_id AS doc_id, cos_sim AS s,
       |      MIN(cos_sim) OVER (PARTITION BY query_id) AS mn,
       |      MAX(cos_sim) OVER (PARTITION BY query_id) AS mx
       |    FROM sem)),
       |fused AS (
       |  SELECT COALESCE(l.query_id, a.query_id) AS query_id,
       |    COALESCE(l.doc_id, a.doc_id) AS doc_id,
       |    0.5e0 * COALESCE(l.ln, 0.0e0) + 0.5e0 * COALESCE(a.sn, 0.0e0) AS fused
       |  FROM lexn l FULL OUTER JOIN semn a
       |    ON l.query_id = a.query_id AND l.doc_id = a.doc_id)
       |SELECT query_id, rnk, doc_id, ROUND(fused, 6) AS fused FROM (
       |  SELECT query_id, doc_id, fused, row_number() OVER (
       |    PARTITION BY query_id ORDER BY fused DESC, doc_id) AS rnk
       |  FROM fused)
       |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bm25_topk" -> textBm25TopK,
    "ann_hybrid_index_rrf" -> annHybridIndexRrf,
    "ann_hybrid_index_wsum" -> annHybridIndexWsum,
    "text_bm25_index_roundtrip" -> textBm25IndexRoundtrip,
    "text_bm25_index_append" -> textBm25IndexAppend,
    "text_bm25_index_delete" -> textBm25IndexDelete,
    "ann_hybrid_rrf" -> annHybridRrf,
    "ann_hybrid_wsum" -> annHybridWsum,
    "text_ngram_freq" -> textNgramFreq,
    "text_pii" -> textPii,
    "text_contamination" -> textContamination,
    "text_pack_bins" -> textPackBins,
    "text_seg_dedup" -> textSegDedup,
    "media_frame_sample" -> mediaFrameSample,
    "media_resize" -> mediaResize,
    "dedup_exact" -> dedupExact,
    "dedup_cluster_stats" -> dedupClusterStats,
    "emb_quantize" -> embQuantize,
    "emb_pq_quantize" -> embPqQuantize,
    "ann_pq" -> annPq,
    "ann_ivfpq" -> annIvfPq,
    "ann_rerank" -> annRerank,
    "emb_kmeans" -> embKmeans,
    "ann_imi_pq" -> annImiPq,
    "ann_imi_trained" -> annImiTrained,
    "ann_recall_audit" -> annRecallAudit,
    "ann_ivf_trained" -> annIvfTrained,
    "ann_ivf_trained_joinpath" -> annIvfTrainedJoinpath,
    "ann_pq_trained" -> annPqTrained,
    "ann_pq_index_roundtrip" -> annPqIndexRoundtrip,
    "ann_pq_index_append" -> annPqIndexAppend,
    "ann_imi_index_roundtrip" -> annImiIndexRoundtrip,
    "ann_imi_index_append" -> annImiIndexAppend,
    "ann_imi_index_delete" -> annImiIndexDelete,
    "ann_imi_index_filtered" -> annImiIndexFiltered,
    "ann_imi_index_rebuild" -> annImiIndexRebuild,
    "ann_pq_index_rewrite" -> annPqIndexRewrite,
    "ann_imipq_index_roundtrip" -> annImiPqIndexRoundtrip,
    "ann_imipq_index_append" -> annImiPqIndexAppend,
    "ann_ivfpq_trained" -> annIvfPqTrained,
    "dedup_ngram_jaccard" -> dedupJaccard,
    "dedup_containment" -> dedupContainment,
    "dedup_minhash_lsh" -> dedupMinhash,
    "dedup_simhash" -> dedupSimhash,
    "dedup_groups" -> dedupGroups,
    "dedup_groups_star" -> dedupGroupsStar,
    "dedup_cross" -> dedupCross,
    "dedup_cross_index" -> dedupCrossIndex,
    "dedup_cross_index_delete" -> dedupCrossIndexDelete,
    "dedup_shrinkage" -> dedupShrinkage,
    "dedup_embedding" -> dedupEmbedding,
    "dedup_semantic" -> dedupSemantic,
    "dedup_semantic_trained" -> dedupSemanticTrained,
    "dedup_semantic_2level" -> dedupSemantic2Level,
    "dedup_semantic_imi" -> dedupSemanticImi,
    "ann_bruteforce" -> annBruteforce,
    "ann_lsh" -> annLsh,
    "ann_ivf" -> annIvf,
    "ann_filtered" -> annFiltered,
    "ann_range" -> annRange,
    "emb_nearest_centroid" -> embNearestCentroid,
    "emb_outliers" -> embOutliers,
    "text_stats" -> textStats,
    "text_langid" -> textLangid,
    "text_token_count" -> textTokenCount,
    "text_chunk" -> textChunk,
    "text_bpe_merges" -> textBpeMerges,
    "text_bpe_encode" -> textBpeEncode,
    "text_quality_distill" -> textQualityDistill,
    "text_fingerprint" -> textFingerprint,
    "text_winnow" -> textWinnow,
    "text_tfidf" -> textTfidf,
    "text_perplexity" -> textPerplexity,
    "text_perplexity_topv" -> textPerplexityTopv,
    "text_quality" -> textQuality,
    "text_repetition" -> textRepetition,
    "text_substr_dedup" -> textSubstrDedup,
    "text_dsir_weight" -> textDsirWeight,
    "text_contamination_bloom" -> textContaminationBloom,
    "pipeline_curriculum" -> pipelineCurriculum,
    "emb_hard_negatives" -> embHardNegatives,
    "emb_label_centroids" -> embLabelCentroids,
    "emb_dim_stats" -> embDimStats,
    "emb_covariance" -> embCovariance,
    "emb_pca_power" -> ((s, d) => embPcaPower(s, d)),
    "media_features" -> mediaFeatures)

  def oracleSql: Map[String, String] = Map(
    "text_bm25_topk" -> textBm25TopKSql,
    "text_bm25_index_roundtrip" -> textBm25IndexRoundtripSql,
    "text_bm25_index_append" -> textBm25IndexAppendSql,
    "text_bm25_index_delete" -> textBm25IndexDeleteSql,
    "ann_hybrid_rrf" -> annHybridRrfSql,
    "ann_hybrid_wsum" -> annHybridWsumSql,
    "ann_hybrid_index_rrf" -> annHybridIndexRrfSql,
    "ann_hybrid_index_wsum" -> annHybridIndexWsumSql,
    "text_ngram_freq" -> textNgramFreqSql,
    "text_pii" -> textPiiSql,
    "text_contamination" -> textContaminationSql,
    "text_pack_bins" -> textPackBinsSql,
    "text_seg_dedup" -> textSegDedupSql,
    "media_frame_sample" -> mediaFrameSampleSql,
    "media_resize" -> mediaResizeSql,
    "dedup_exact" -> dedupExactSql,
    "dedup_cluster_stats" -> dedupClusterStatsSql,
    "emb_quantize" -> embQuantizeSql,
    "emb_pq_quantize" -> embPqQuantizeSql,
    "ann_pq" -> annPqSql,
    "ann_ivfpq" -> annIvfPqSql,
    "ann_rerank" -> annRerankSql,
    "emb_kmeans" -> embKmeansSql,
    "ann_imi_pq" -> annImiPqSql,
    "ann_imi_trained" -> annImiTrainedSql,
    "ann_recall_audit" -> annRecallAuditSql,
    "ann_ivf_trained" -> annIvfTrainedSql,
    "ann_ivf_trained_joinpath" -> annIvfTrainedSql,
    "ann_pq_trained" -> annPqTrainedSql,
    "ann_pq_index_roundtrip" -> annPqIndexRoundtripSql,
    "ann_pq_index_append" -> annPqIndexAppendSql,
    "ann_imi_index_roundtrip" -> annImiIndexRoundtripSql,
    "ann_imi_index_append" -> annImiIndexAppendSql,
    "ann_imi_index_delete" -> annImiIndexDeleteSql,
    "ann_imi_index_filtered" -> annImiIndexFilteredSql,
    "ann_imi_index_rebuild" -> annImiIndexRebuildSql,
    "ann_pq_index_rewrite" -> annPqIndexRewriteSql,
    "ann_imipq_index_roundtrip" -> annImiPqIndexRoundtripSql,
    "ann_imipq_index_append" -> annImiPqIndexAppendSql,
    "ann_ivfpq_trained" -> annIvfPqTrainedSql,
    "dedup_ngram_jaccard" -> JaccardSql,
    "dedup_containment" -> dedupContainmentSql,
    "dedup_minhash_lsh" -> JaccardSql,
    "dedup_simhash" -> JaccardSql,
    "dedup_groups" -> dedupGroupsSql,
    "dedup_groups_star" -> dedupGroupsSql,
    "dedup_cross" -> dedupCrossSql,
    "dedup_cross_index" -> dedupCrossIndexSql,
    "dedup_cross_index_delete" -> dedupCrossIndexDeleteSql,
    "dedup_shrinkage" -> dedupShrinkageSql,
    "dedup_embedding" -> dedupEmbeddingSql,
    "dedup_semantic" -> dedupSemanticSql,
    "dedup_semantic_trained" -> dedupSemanticTrainedSql,
    "dedup_semantic_2level" -> dedupSemantic2LevelSql,
    "dedup_semantic_imi" -> dedupSemanticImiSql,
    "ann_bruteforce" -> annBruteforceSql,
    "ann_lsh" -> annLshSql,
    "ann_ivf" -> annIvfSql,
    "ann_filtered" -> annFilteredSql,
    "ann_range" -> annRangeSql,
    "emb_nearest_centroid" -> embNearestCentroidSql,
    "emb_outliers" -> embOutliersSql,
    "text_stats" -> textStatsSql,
    "text_langid" -> textLangidSql,
    "text_token_count" -> textTokenCountSql,
    "text_chunk" -> textChunkSql,
    "text_bpe_merges" -> textBpeMergesSql,
    "text_bpe_encode" -> textBpeEncodeSql,
    "text_quality_distill" -> textQualityDistillSql,
    "text_fingerprint" -> textFingerprintSql,
    "text_winnow" -> textWinnowSql,
    "text_tfidf" -> textTfidfSql,
    "text_perplexity" -> textPerplexitySql,
    "text_perplexity_topv" -> textPerplexityTopvSql,
    "text_quality" -> textQualitySql,
    "text_repetition" -> textRepetitionSql,
    "text_substr_dedup" -> textSubstrDedupSql,
    "text_dsir_weight" -> textDsirWeightSql,
    "text_contamination_bloom" -> textContaminationSql,
    "pipeline_curriculum" -> pipelineCurriculumSql,
    "emb_hard_negatives" -> embHardNegativesSql,
    "emb_label_centroids" -> embLabelCentroidsSql,
    "emb_dim_stats" -> embDimStatsSql,
    "emb_covariance" -> embCovarianceSql,
    "emb_pca_power" -> embPcaPowerSql,
    "media_features" -> mediaFeaturesSql)
}
