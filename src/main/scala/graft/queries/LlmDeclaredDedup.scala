package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.llm._

/** Declared queries — text dedup/decontamination family (llm/Dedup.scala operators).
  *
  * Mechanical split of the single LlmDeclared registry (round 13,
  * VERDICT directive #8) — every member moved verbatim; `LlmDeclared.all`
  * preserves the original declaration order, so bench sequence and
  * artifacts stay comparable round-over-round.
  */
private[queries] trait LlmDeclaredDedup extends LlmDeclaredBase {

  // ----------------------------------------------------------- dedup plane

  /** L1 — exact dedup (hash-groupBy). The fixture corpus is dup-free by
    * construction, so the query runs over the corpus unioned with a
    * doc_id-shifted copy of itself: every text then has exactly one
    * duplicate and the kept representative is the original (minimum) id. */
  protected val l01 = DeclaredQuery(
    "l01_exact_dedup",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = d.unionByName(d.withColumn("doc_id", col("doc_id") + 1000000L))
      Dedup.exactDupGroups(corpus).orderBy(col("text_md5"))
    },
    Some("""WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT doc_id + 1000000, text FROM documents)
      SELECT md5(text) AS text_md5, COUNT(*) AS n_copies, MIN(doc_id) AS keep_doc_id
      FROM corpus GROUP BY md5(text) ORDER BY text_md5"""))


  /** L2 — exact n-gram Jaccard near-dup pairs via the inverted-index join
    * (the exact baseline the LSH paths are verified against). */
  protected val l02 = DeclaredQuery(
    "l02_jaccard_pairs",
    (s, dir) => Dedup.jaccardPairs(t(s, dir, "documents"), n = 3, minJ = 0.5)
      .orderBy(col("doc_a"), col("doc_b")),
    Some(s"""WITH $shingleCte,
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      common AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
                 FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
                 GROUP BY x.doc_id, y.doc_id)
      SELECT doc_a, doc_b,
             CAST(c AS DOUBLE) / (sa.n_sh + sb.n_sh - c) AS jaccard
      FROM common
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(c AS DOUBLE) / (sa.n_sh + sb.n_sh - c) >= 0.5
      ORDER BY doc_a, doc_b"""))


  /** L3 — MinHash + LSH near-dup detection (the 100 TB scale path: banded
    * equality-join candidates, exact verification of candidates only). */
  protected val l03 = {
    val k = 16; val bands = 4; val r = k / bands
    val sigCols = (0 until k)
      .map(i => s"MIN((h * ${Dedup.minhashA(i)} + ${Dedup.minhashB(i)}) % ${Dedup.minhashP}) AS m$i")
      .mkString(",\n        ")
    val bandSelects = (0 until bands).map { b =>
      val cat = (0 until r).map(j => s"m${r * b + j}").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band_idx, md5($cat) AS band_hash FROM sig"
    }.mkString("\n        UNION ALL ")
    DeclaredQuery(
      "l03_minhash_lsh",
      (s, dir) => Dedup.minhashNearDups(t(s, dir, "documents"), 3, k, bands, 0.5)
        .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""WITH $shingleCte,
      shh AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h FROM sh),
      sig AS (SELECT doc_id,
        $sigCols
        FROM shh GROUP BY doc_id),
      bands AS (
        $bandSelects),
      cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
               FROM bands x JOIN bands y
                 ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
                AND x.doc_id < y.doc_id),
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      common AS (SELECT doc_a, doc_b, COUNT(*) AS c
                 FROM cand
                 JOIN sh sa ON sa.doc_id = doc_a
                 JOIN sh sb ON sb.doc_id = doc_b AND sb.s = sa.s
                 GROUP BY doc_a, doc_b)
      SELECT doc_a, doc_b,
             CAST(c AS DOUBLE) / (sa.n_sh + sb.n_sh - c) AS jaccard
      FROM common
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(c AS DOUBLE) / (sa.n_sh + sb.n_sh - c) >= 0.5
      ORDER BY doc_a, doc_b"""))
  }


  /** L4 — 32-bit SimHash near-dup pairs (signature banding + XOR popcount). */
  protected val l04 = {
    val bits = 32
    val sumCols = (0 until bits)
      .map(i => s"SUM(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i")
      .mkString(",\n        ")
    val sigExpr = (0 until bits)
      .map(i => s"(CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
    val bandSelects = (0 until 4)
      .map(b => s"SELECT doc_id, simhash, $b AS band_idx, (simhash >> ${8 * b}) & 255 AS band_val FROM sig")
      .mkString("\n        UNION ALL ")
    DeclaredQuery(
      "l04_simhash_pairs",
      (s, dir) => Dedup.simhashNearDups(t(s, dir, "documents"), maxHamming = 6)
        .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""WITH $shingleCte,
      th AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h FROM sh),
      sums AS (SELECT doc_id,
        $sumCols
        FROM th GROUP BY doc_id),
      sig AS (SELECT doc_id, $sigExpr AS simhash FROM sums),
      banded AS (
        $bandSelects)
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
             CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
      FROM banded x JOIN banded y
        ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       AND x.doc_id < y.doc_id
      WHERE bit_count(xor(x.simhash, y.simhash)) <= 6
      ORDER BY doc_a, doc_b"""))
  }


  /** L16 — near-dup clustering: connected components over the exact
    * jaccard pair graph, every member labeled with its cluster's canonical
    * (minimum) doc_id. Spark side: iterative min-label propagation
    * (Dedup.nearDupClusters); oracle: recursive-CTE transitive closure —
    * two very different algorithms that must agree exactly. */
  protected val l16 = DeclaredQuery(
    "l16_dedup_clusters",
    (s, dir) => Dedup.nearDupClusters(
      Dedup.jaccardPairs(t(s, dir, "documents"), n = 3, minJ = 0.5))
      .orderBy(col("doc_id")),
    Some(s"""WITH RECURSIVE $shingleCte,
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      common AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
                 FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
                 GROUP BY x.doc_id, y.doc_id),
      pairs AS (
        SELECT doc_a, doc_b FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(c AS DOUBLE) / (sa.n_sh + sb.n_sh - c) >= 0.5),
      edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                UNION SELECT doc_b, doc_a FROM pairs),
      reach(a, b) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges) n
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
      SELECT a AS doc_id, MIN(b) AS cluster_id
      FROM reach GROUP BY a ORDER BY doc_id"""))


  // --------------------------------- corpus curation (round 4, continued)

  /** L24 — train/eval decontamination: train-split docs sharing any 3-gram
    * with any test-split doc (split = the same md5(doc_id) bucketing as
    * l15, derivable per row with no join). */
  protected val l24 = DeclaredQuery(
    "l24_decontaminate",
    (s, dir) => Dedup.decontaminate(t(s, dir, "documents"), n = 3)
      .orderBy(col("doc_id")),
    Some(s"""WITH $shingleCte,
      b AS (SELECT doc_id, s,
              ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
            FROM sh)
      SELECT tr.doc_id AS doc_id,
             COUNT(DISTINCT ev.doc_id) AS n_eval_docs,
             COUNT(DISTINCT tr.s) AS n_shared_shingles
      FROM b tr JOIN b ev ON tr.s = ev.s
      WHERE tr.bucket < 80 AND ev.bucket >= 90
      GROUP BY tr.doc_id ORDER BY doc_id"""))


  /** L27 — directional containment pairs |A∩B|/|A| (catches short docs
    * embedded in long ones, where symmetric Jaccard stays low). */
  protected val l27 = DeclaredQuery(
    "l27_containment_pairs",
    (s, dir) => Dedup.containmentPairs(t(s, dir, "documents"), n = 3, minC = 0.6)
      .orderBy(col("doc_a"), col("doc_b")),
    Some(s"""WITH $shingleCte,
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      common AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
                 FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id <> y.doc_id
                 GROUP BY x.doc_id, y.doc_id)
      SELECT doc_a, doc_b, CAST(c AS DOUBLE) / sa.n_sh AS containment
      FROM common JOIN sizes sa ON sa.doc_id = doc_a
      WHERE CAST(c AS DOUBLE) / sa.n_sh >= 0.6
      ORDER BY doc_a, doc_b"""))


  /** L30 — end-to-end dedup materialization: pair generation → clustering
    * → survivor anti-join, returning the clean corpus (the composition a
    * pipeline user actually runs). Oracle: the l16 recursive-CTE closure
    * plus an ANTI JOIN of the non-canonical members. */
  protected val l30 = DeclaredQuery(
    "l30_dedup_apply",
    (s, dir) => Dedup.dedupApply(t(s, dir, "documents"), n = 3, minJ = 0.5)
      .orderBy(col("doc_id")),
    Some(s"""WITH RECURSIVE $shingleCte,
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      common AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
                 FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
                 GROUP BY x.doc_id, y.doc_id),
      pairs AS (
        SELECT doc_a, doc_b FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(c AS DOUBLE) / (sa.n_sh + sb.n_sh - c) >= 0.5),
      edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                UNION SELECT doc_b, doc_a FROM pairs),
      reach(a, b) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges) n
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      clusters AS (SELECT a AS doc_id, MIN(b) AS cluster_id
                   FROM reach GROUP BY a),
      losers AS (SELECT doc_id FROM clusters WHERE cluster_id <> doc_id)
      SELECT d.doc_id, md5(d.text) AS text_md5
      FROM documents d ANTI JOIN losers l ON d.doc_id = l.doc_id
      ORDER BY d.doc_id"""))


  /** L33 — Bloom-prefiltered decontamination: the l24 exact join behind a
    * deterministic (md5-positioned) Bloom filter built from the eval
    * shingle set. The oracle recomputes the SAME filter in SQL, so even
    * the false-positive counts must agree bit-for-bit — the pruning is
    * verified, not just the final answer. */
  protected val l33 = DeclaredQuery(
    "l33_bloom_decontaminate",
    (s, dir) => Dedup.bloomDecontaminate(t(s, dir, "documents"), n = 3)
      .orderBy(col("doc_id")),
    Some(s"""WITH $shingleCte,
      b AS (SELECT doc_id, s,
              ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
            FROM sh),
      tr AS (SELECT doc_id, s FROM b WHERE bucket < 80),
      ev AS (SELECT DISTINCT s FROM b WHERE bucket >= 90),
      bits AS (SELECT DISTINCT unnest([
                 ('0x' || substr(md5(s), 1, 8))::BIGINT % 131072,
                 ('0x' || substr(md5(s), 9, 8))::BIGINT % 131072]) AS p
               FROM ev),
      cand AS (SELECT doc_id, s FROM tr
               WHERE ('0x' || substr(md5(s), 1, 8))::BIGINT % 131072
                       IN (SELECT p FROM bits)
                 AND ('0x' || substr(md5(s), 9, 8))::BIGINT % 131072
                       IN (SELECT p FROM bits))
      SELECT doc_id, COUNT(*) AS n_candidates,
        COUNT(*) FILTER (WHERE s IN (SELECT s FROM ev)) AS n_shared
      FROM cand GROUP BY doc_id ORDER BY doc_id"""))


  /** L43 — MinHash estimator audit: per band-candidate pair, the
    * signature-agreement estimate next to the exact Jaccard and the signed
    * error — the (k, bands) tuning measurement. Reuses l03's signature /
    * banding arithmetic; the exact side LEFT-joins shared-shingle counts so
    * hash-collision candidates surface as j_exact = 0 instead of
    * vanishing. */
  protected val l43 = {
    val k = 16; val bands = 4; val r = k / bands
    val sigCols = (0 until k)
      .map(i => s"MIN((h * ${Dedup.minhashA(i)} + ${Dedup.minhashB(i)}) % ${Dedup.minhashP}) AS m$i")
      .mkString(",\n        ")
    val bandSelects = (0 until bands).map { b =>
      val cat = (0 until r).map(j => s"m${r * b + j}").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band_idx, md5($cat) AS band_hash FROM sig"
    }.mkString("\n        UNION ALL ")
    val matchSum = (0 until k)
      .map(i => s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    DeclaredQuery(
      "l43_minhash_estimate_audit",
      (s, dir) => Dedup.minhashEstimateAudit(t(s, dir, "documents"), 3, k, bands)
        .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""WITH $shingleCte,
      shh AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h FROM sh),
      sig AS (SELECT doc_id,
        $sigCols
        FROM shh GROUP BY doc_id),
      bands AS (
        $bandSelects),
      cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
               FROM bands x JOIN bands y
                 ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
                AND x.doc_id < y.doc_id),
      est AS (SELECT c.doc_a, c.doc_b,
                CAST($matchSum AS BIGINT) AS n_match
              FROM cand c
              JOIN sig a ON a.doc_id = c.doc_a
              JOIN sig b ON b.doc_id = c.doc_b),
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      common AS (SELECT doc_a, doc_b, COUNT(*) AS c
                 FROM cand
                 JOIN sh sa ON sa.doc_id = doc_a
                 JOIN sh sb ON sb.doc_id = doc_b AND sb.s = sa.s
                 GROUP BY doc_a, doc_b)
      SELECT e.doc_a, e.doc_b, e.n_match,
             CAST(e.n_match AS DOUBLE) / $k AS j_est,
             CAST(COALESCE(cm.c, 0) AS DOUBLE)
               / (sa.n_sh + sb.n_sh - COALESCE(cm.c, 0)) AS j_exact,
             CAST(e.n_match AS DOUBLE) / $k
               - CAST(COALESCE(cm.c, 0) AS DOUBLE)
                 / (sa.n_sh + sb.n_sh - COALESCE(cm.c, 0)) AS err
      FROM est e
      LEFT JOIN common cm ON cm.doc_a = e.doc_a AND cm.doc_b = e.doc_b
      JOIN sizes sa ON sa.doc_id = e.doc_a
      JOIN sizes sb ON sb.doc_id = e.doc_b
      ORDER BY e.doc_a, e.doc_b"""))
  }


  /** L46 — per-document duplicated-shingle fraction (corpus-level substring
    * duplication profile). Both engines hash shingles to md5 digests before
    * any shuffle/join, so document frequency is counted over identical
    * keys; dup_frac is the same two-long division on both sides. */
  protected val l46 = DeclaredQuery(
    "l46_dup_shingle_profile",
    (s, dir) => Dedup.dupShingleProfile(t(s, dir, "documents"), n = 3)
      .orderBy(col("doc_id")),
    Some(s"""WITH $shingleCte,
      shh AS (SELECT doc_id, md5(s) AS h FROM sh),
      df AS (SELECT h, COUNT(*) AS nd FROM shh GROUP BY h)
      SELECT shh.doc_id,
             COUNT(*) AS n_shingles,
             CAST(SUM(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
             CAST(SUM(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS dup_frac
      FROM shh JOIN df USING (h)
      GROUP BY shh.doc_id
      ORDER BY doc_id"""))


  /** L49 — cross-source contamination matrix: shared distinct 3-gram
    * shingles per source pair with containments and Jaccard. Shingles are
    * md5-hashed before any shuffle on both engines; divisions are the same
    * two-integer arithmetic. */
  protected val l49 = DeclaredQuery(
    "l49_source_overlap",
    (s, dir) => Dedup.sourceOverlap(t(s, dir, "documents"), n = 3)
      .orderBy(col("src_a"), col("src_b")),
    Some("""WITH tt AS (SELECT source, string_split(text, ' ') AS w FROM documents),
      ssh AS (SELECT DISTINCT source,
                md5(unnest(list_distinct(list_transform(
                  range(1, len(w) - 1),
                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])))) AS h
              FROM tt),
      sizes AS (SELECT source, COUNT(*) AS n_sh FROM ssh GROUP BY source),
      common AS (SELECT x.source AS src_a, y.source AS src_b,
                   COUNT(*) AS n_common
                 FROM ssh x JOIN ssh y ON x.h = y.h AND x.source < y.source
                 GROUP BY 1, 2)
      SELECT src_a, src_b, n_common,
             CAST(n_common AS DOUBLE) / sa.n_sh AS contain_a,
             CAST(n_common AS DOUBLE) / sb.n_sh AS contain_b,
             CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
      FROM common
      JOIN sizes sa ON sa.source = src_a
      JOIN sizes sb ON sb.source = src_b
      ORDER BY src_a, src_b"""))


  /** L50 — span-level dedup APPLY (repeated-passage removal): keep each
    * distinct 8-token span's first corpus occurrence (ordered by (doc_id,
    * idx) — total order, so survivors are layout-independent), strip later
    * repeats, emit the rewritten doc as a digest. The oracle replays the
    * same first-occurrence rule with a row_number window and rebuilds the
    * kept-span concatenation with an ordered string_agg. */
  protected val l50 = DeclaredQuery(
    "l50_span_dedup",
    (s, dir) => Dedup.spanDedupApply(t(s, dir, "documents"), k = 8)
      .orderBy(col("doc_id")),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      sp AS (SELECT doc_id, toks, unnest(range(len(toks) // 8)) AS idx
             FROM t WHERE len(toks) >= 8),
      s2 AS (SELECT doc_id, idx,
               array_to_string(list_slice(toks,
                 CAST(idx*8 + 1 AS INTEGER), CAST(idx*8 + 8 AS INTEGER)), ' ') AS span
             FROM sp),
      w AS (SELECT doc_id, idx, span,
              row_number() OVER (PARTITION BY span ORDER BY doc_id, idx) AS rn
            FROM s2),
      agg AS (SELECT doc_id, COUNT(*) AS n_kept,
                md5(string_agg(span, ' ' ORDER BY idx)) AS clean_md5
              FROM w WHERE rn = 1 GROUP BY doc_id)
      SELECT t.doc_id,
        CAST(len(t.toks) // 8 AS BIGINT) AS n_spans,
        CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept,
        COALESCE(agg.clean_md5, md5('')) AS clean_md5
      FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id
      ORDER BY t.doc_id"""))


  /** L52 — incremental near-dup admission: the 'src0' slice plays the new
    * crawl batch, every other source the already-curated corpus whose
    * persisted band index the batch is verdicted against (dup_corpus /
    * dup_batch / kept; band-collision policy — see Dedup.incrementalDedup
    * for why this is the one-pass parallel form of sequential admission).
    * The fixture corpus plants no near-dup pair INSIDE one source, so the
    * batch is src0 unioned with a doc_id-shifted copy of itself (the l01
    * fixture pattern): every shifted twin then collides with its original
    * (→ dup_batch), except twins of corpus near-dups (→ dup_corpus wins),
    * exercising all three verdicts. */
  protected val l52 = {
    val k = 16; val bands = 4; val r = k / bands
    val sigCols = (0 until k)
      .map(i => s"MIN((h * ${Dedup.minhashA(i)} + ${Dedup.minhashB(i)}) % ${Dedup.minhashP}) AS m$i")
      .mkString(",\n        ")
    val bandSelects = (0 until bands).map { b =>
      val cat = (0 until r).map(j => s"m${r * b + j}").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band_idx, md5($cat) AS band_hash FROM sig"
    }.mkString("\n        UNION ALL ")
    DeclaredQuery(
      "l52_incremental_dedup",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val src0 = docs.filter(col("source") === "src0")
          .select(col("doc_id"), col("text"))
        val batch = src0.unionByName(
          src0.withColumn("doc_id", col("doc_id") + 1000000L))
        val corpus = docs.filter(col("source") =!= "src0")
        Dedup.incrementalDedup(batch, Dedup.bandIndex(corpus), 3, k, bands)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ad AS (SELECT doc_id, text FROM documents
              UNION ALL SELECT doc_id + 1000000, text FROM documents
              WHERE source = 'src0'),
      t AS (SELECT doc_id, string_split(text, ' ') AS w FROM ad),
      sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, len(w) - 1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
             FROM t),
      shh AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h FROM sh),
      sig AS (SELECT doc_id,
        $sigCols
        FROM shh GROUP BY doc_id),
      bands AS (
        $bandSelects),
      b_ids AS (SELECT doc_id FROM documents WHERE source = 'src0'
                UNION ALL SELECT doc_id + 1000000 FROM documents
                WHERE source = 'src0'),
      nb AS (SELECT b.* FROM bands b JOIN b_ids USING (doc_id)),
      ci AS (SELECT DISTINCT band_idx, band_hash
             FROM bands b JOIN documents d USING (doc_id)
             WHERE d.source <> 'src0'),
      dc AS (SELECT DISTINCT nb.doc_id
             FROM nb JOIN ci USING (band_idx, band_hash)),
      fb AS (SELECT band_idx, band_hash, MIN(doc_id) AS first_id
             FROM nb GROUP BY band_idx, band_hash),
      db AS (SELECT DISTINCT nb.doc_id
             FROM nb JOIN fb USING (band_idx, band_hash)
             WHERE nb.doc_id > fb.first_id)
      SELECT b_ids.doc_id,
        CASE WHEN dc.doc_id IS NOT NULL THEN 'dup_corpus'
             WHEN db.doc_id IS NOT NULL THEN 'dup_batch'
             ELSE 'kept' END AS verdict
      FROM b_ids
      LEFT JOIN dc ON b_ids.doc_id = dc.doc_id
      LEFT JOIN db ON b_ids.doc_id = db.doc_id
      ORDER BY b_ids.doc_id"""))
  }


  /** L53 — quality-aware dedup apply: l30's clusters, but each cluster
    * keeps its LONGEST member (token count, ties → min doc_id) instead of
    * the arbitrary minimum id — the survivor policy curation pipelines
    * actually want when near-dups are truncations of one another. */
  protected val l53 = DeclaredQuery(
    "l53_dedup_keep_best",
    (s, dir) => Dedup.dedupApplyKeepBest(
        t(s, dir, "documents"),
        size(TextOps.tokens(col("text"))).cast("long"),
        n = 3, minJ = 0.5)
      .orderBy(col("doc_id")),
    Some(s"""WITH RECURSIVE $shingleCte,
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      common AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
                 FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
                 GROUP BY x.doc_id, y.doc_id),
      pairs AS (
        SELECT doc_a, doc_b FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(c AS DOUBLE) / (sa.n_sh + sb.n_sh - c) >= 0.5),
      edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                UNION SELECT doc_b, doc_a FROM pairs),
      reach(a, b) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges) n
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      clusters AS (SELECT a AS doc_id, MIN(b) AS cluster_id
                   FROM reach GROUP BY a),
      members AS (SELECT c.doc_id, c.cluster_id,
                    len(string_split(d.text, ' ')) AS q
                  FROM clusters c JOIN documents d USING (doc_id)),
      winners AS (SELECT cluster_id, doc_id AS keep_id FROM (
                    SELECT cluster_id, doc_id,
                      row_number() OVER (PARTITION BY cluster_id
                        ORDER BY q DESC, doc_id ASC) AS rn
                    FROM members) WHERE rn = 1),
      losers AS (SELECT m.doc_id FROM members m
                 JOIN winners w USING (cluster_id)
                 WHERE m.doc_id <> w.keep_id)
      SELECT d.doc_id, md5(d.text) AS text_md5
      FROM documents d ANTI JOIN losers l ON d.doc_id = l.doc_id
      ORDER BY d.doc_id"""))


  /** L54 — graded decontamination: per-train-doc FRACTION of distinct
    * 3-gram shingles hit by the eval split (threshold-policy input; l24
    * reports raw shared counts for contaminated docs only, this scores
    * every train doc including clean ones). */
  protected val l54 = DeclaredQuery(
    "l54_contamination_frac",
    (s, dir) => Dedup.contaminationFraction(t(s, dir, "documents"), n = 3)
      .orderBy(col("doc_id")),
    Some(s"""WITH $shingleCte,
      b AS (SELECT doc_id, s,
              ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
            FROM sh),
      ev AS (SELECT DISTINCT s FROM b WHERE bucket >= 90)
      SELECT tr.doc_id AS doc_id,
             COUNT(*) AS n_shingles,
             COUNT(ev.s) AS n_contaminated,
             CAST(COUNT(ev.s) AS DOUBLE) / COUNT(*) AS contamination
      FROM b tr LEFT JOIN ev ON tr.s = ev.s
      WHERE tr.bucket < 80
      GROUP BY tr.doc_id ORDER BY doc_id"""))


  /** L58 — leakage-safe cluster-aware split: the l15 split bucket hashed
    * on the near-dup CLUSTER id (l16's components over the exact jaccard
    * pair graph), so near-duplicate documents can never straddle the
    * train/eval boundary. Oracle: the l16 recursive-CTE closure feeding
    * the l15 CASE on the cluster key. */
  protected val l58 = DeclaredQuery(
    "l58_leakage_safe_split",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.leakageSafeSplit(docs, Dedup.jaccardPairs(docs, n = 3, minJ = 0.5))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE $shingleCte,
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      common AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
                 FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
                 GROUP BY x.doc_id, y.doc_id),
      prs AS (
        SELECT doc_a, doc_b FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(c AS DOUBLE) / (sa.n_sh + sb.n_sh - c) >= 0.5),
      edges AS (SELECT doc_a AS a, doc_b AS b FROM prs
                UNION SELECT doc_b, doc_a FROM prs),
      reach(a, b) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges) n
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      clusters AS (SELECT a AS doc_id, MIN(b) AS cluster_id
                   FROM reach GROUP BY a),
      keyed AS (SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
                FROM documents d LEFT JOIN clusters c USING (doc_id))
      SELECT doc_id, cluster_id,
        CASE WHEN ('0x' || substr(md5(cluster_id::VARCHAR), 1, 8))::BIGINT % 100 < 80 THEN 'train'
             WHEN ('0x' || substr(md5(cluster_id::VARCHAR), 1, 8))::BIGINT % 100 < 90 THEN 'val'
             ELSE 'test' END AS split
      FROM keyed ORDER BY doc_id"""))


  /** L65 — dedup-threshold sensitivity sweep: the jaccard decile
    * histogram over every shingle-sharing pair with cumulative at-or-
    * above counts — the pair volume a dedup run at each threshold would
    * process. */
  protected val l65 = DeclaredQuery(
    "l65_dedup_sweep",
    (s, dir) => Dedup.jaccardThresholdSweep(t(s, dir, "documents"))
      .orderBy(col("bucket")),
    Some(s"""WITH $shingleCte,
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      common AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
                 FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
                 GROUP BY x.doc_id, y.doc_id),
      j AS (SELECT CAST(c AS DOUBLE) / (sa.n_sh + sb.n_sh - c) AS jac
            FROM common
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b),
      g AS (SELECT CAST(FLOOR(jac * 10) AS BIGINT) AS bucket,
              COUNT(*) AS n_pairs
            FROM j GROUP BY bucket)
      SELECT bucket, n_pairs,
        CAST(SUM(n_pairs) OVER (ORDER BY bucket DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS n_pairs_ge
      FROM g ORDER BY bucket"""))


  /** L66 — near-dup cluster-size profile: per cluster size, the cluster
    * count, member docs, and keep-one removal count (Σ n_removable = the
    * dedup apply's savings). Singletons are size-1 clusters, so n_docs
    * totals the corpus. Oracle: the l16 closure + two GROUP BYs. */
  protected val l66 = DeclaredQuery(
    "l66_cluster_profile",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.clusterSizeProfile(docs,
          Dedup.jaccardPairs(docs, n = 3, minJ = 0.5))
        .orderBy(col("cluster_size"))
    },
    Some(s"""WITH RECURSIVE $shingleCte,
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      common AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
                 FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
                 GROUP BY x.doc_id, y.doc_id),
      prs AS (
        SELECT doc_a, doc_b FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(c AS DOUBLE) / (sa.n_sh + sb.n_sh - c) >= 0.5),
      edges AS (SELECT doc_a AS a, doc_b AS b FROM prs
                UNION SELECT doc_b, doc_a FROM prs),
      reach(a, b) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges) n
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      clusters AS (SELECT a AS doc_id, MIN(b) AS cluster_id
                   FROM reach GROUP BY a),
      keyed AS (SELECT COALESCE(c.cluster_id, d.doc_id) AS cid
                FROM documents d LEFT JOIN clusters c USING (doc_id)),
      cs AS (SELECT cid, COUNT(*) AS sz FROM keyed GROUP BY cid)
      SELECT sz AS cluster_size,
        CAST(COUNT(*) AS BIGINT) AS n_clusters,
        CAST(sz * COUNT(*) AS BIGINT) AS n_docs,
        CAST((sz - 1) * COUNT(*) AS BIGINT) AS n_removable
      FROM cs GROUP BY sz ORDER BY cluster_size"""))


  /** L68 — cross-source NEAR-DUP matrix: per unordered source pair, the
    * count of verified near-duplicate document pairs (exact jaccard ≥ 0.5
    * over 3-gram shingles) connecting them and the distinct documents
    * those pairs touch. The diagonal is intra-source duplication; the
    * off-diagonal cells are mirror/re-post edges (l49 measures shared
    * TEXT; this measures shared near-dup DOCUMENTS, the unit a dedup
    * apply removes). Oracle: the l02 pair graph joined to sources, one
    * endpoint-explode, two GROUP BYs. */
  protected val l68 = DeclaredQuery(
    "l68_neardup_source_matrix",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.nearDupSourceMatrix(docs,
          Dedup.jaccardPairs(docs, n = 3, minJ = 0.5))
        .orderBy(col("src_a"), col("src_b"))
    },
    Some(s"""WITH $shingleCte,
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      common AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
                 FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
                 GROUP BY x.doc_id, y.doc_id),
      prs AS (
        SELECT doc_a, doc_b FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(c AS DOUBLE) / (sa.n_sh + sb.n_sh - c) >= 0.5),
      lab AS (SELECT least(da.source, db.source) AS src_a,
                greatest(da.source, db.source) AS src_b,
                unnest([prs.doc_a, prs.doc_b]) AS d
              FROM prs
              JOIN documents da ON da.doc_id = prs.doc_a
              JOIN documents db ON db.doc_id = prs.doc_b),
      g AS (SELECT src_a, src_b, d, COUNT(*) AS m
            FROM lab GROUP BY src_a, src_b, d)
      SELECT src_a, src_b,
        CAST(SUM(m) // 2 AS BIGINT) AS n_pairs,
        CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM g GROUP BY src_a, src_b ORDER BY src_a, src_b"""))


  /** L69 — per-source EFFECTIVE-TOKEN audit: docs/tokens surviving a
    * keep-one near-dup apply (canonical = cluster-minimum doc_id, l30's
    * rule) vs raw totals, with the duplicated-token fraction — the table
    * mixture planning reads instead of raw source sizes. Oracle: the l16
    * recursive closure + whitespace token counts + one GROUP BY. */
  protected val l69 = DeclaredQuery(
    "l69_effective_tokens",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.effectiveTokens(docs,
          Dedup.jaccardPairs(docs, n = 3, minJ = 0.5))
        .orderBy(col("source"))
    },
    Some(s"""WITH RECURSIVE $shingleCte,
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      common AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
                 FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
                 GROUP BY x.doc_id, y.doc_id),
      prs AS (
        SELECT doc_a, doc_b FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(c AS DOUBLE) / (sa.n_sh + sb.n_sh - c) >= 0.5),
      edges AS (SELECT doc_a AS a, doc_b AS b FROM prs
                UNION SELECT doc_b, doc_a FROM prs),
      reach(a, b) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges) n
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      clusters AS (SELECT a AS doc_id, MIN(b) AS cluster_id
                   FROM reach GROUP BY a),
      tok AS (SELECT doc_id, source,
                COALESCE(CAST(len(string_split(text, ' ')) AS BIGINT), 0)
                  AS n_tok
              FROM documents),
      k AS (SELECT tk.source, tk.n_tok,
              (COALESCE(c.cluster_id, tk.doc_id) = tk.doc_id) AS keep
            FROM tok tk LEFT JOIN clusters c USING (doc_id))
      SELECT source,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
        CAST(SUM(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT)
          AS n_tokens_kept,
        CASE WHEN SUM(n_tok) > 0 THEN
          CAST(SUM(n_tok) - SUM(CASE WHEN keep THEN n_tok ELSE 0 END)
            AS DOUBLE) / CAST(SUM(n_tok) AS DOUBLE) END AS dup_token_frac
      FROM k GROUP BY source ORDER BY source"""))


  /** L74 — UNIQUE-TOKEN epoch plan: l70's budget allocation composed
    * over the keep-one dedup survivors, so epochs are implied by each
    * source's UNIQUE tokens (effectiveTokens' n_tokens_kept), not its
    * raw size — a heavily-duplicated source stops hiding repetition
    * behind its byte count. Oracle: the l16 closure selects survivors,
    * then l70's allocation SQL verbatim over them. */
  protected val l74 = DeclaredQuery(
    "l74_unique_token_epoch_plan",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.epochPlan(
          Dedup.keepOneSurvivors(docs,
            Dedup.jaccardPairs(docs, n = 3, minJ = 0.5)),
          totalBudget = 50000L)
        .orderBy(col("source"))
    },
    Some(s"""WITH RECURSIVE $shingleCte,
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      common AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
                 FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
                 GROUP BY x.doc_id, y.doc_id),
      prs AS (
        SELECT doc_a, doc_b FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(c AS DOUBLE) / (sa.n_sh + sb.n_sh - c) >= 0.5),
      edges AS (SELECT doc_a AS a, doc_b AS b FROM prs
                UNION SELECT doc_b, doc_a FROM prs),
      reach(a, b) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges) n
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      clusters AS (SELECT a AS doc_id, MIN(b) AS cluster_id
                   FROM reach GROUP BY a),
      kept AS (SELECT d.source, d.text FROM documents d
               LEFT JOIN clusters c USING (doc_id)
               WHERE COALESCE(c.cluster_id, d.doc_id) = d.doc_id),
      ps AS (SELECT source,
              CAST(SUM(COALESCE(len(string_split(text, ' ')), 0)) AS BIGINT)
                AS n_tokens
            FROM kept GROUP BY source),
      w AS (SELECT source, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) AS w
            FROM ps),
      tot AS (SELECT list_reduce(list(w ORDER BY source NULLS FIRST),
                (a, b) -> a + b) AS tw FROM w)
      SELECT source, n_tokens,
        w / tw AS mix_weight,
        50000.0 * w / tw AS alloc_tokens,
        50000.0 * w / tw / CAST(n_tokens AS DOUBLE) AS epochs,
        50000.0 * w / tw / CAST(n_tokens AS DOUBLE) > 4.0 AS over_repeated
      FROM w CROSS JOIN tot WHERE n_tokens > 0 ORDER BY source"""))


  /** L75 — excerpt-removal apply: asymmetric containment dedup — drop
    * every doc ≥ 0.6-contained in another (smaller-side rule, equal
    * sizes drop the larger id), keep the supersets. The declared minC
    * matches l27's threshold so the fixture exercises real drops.
    * Oracle: the l02 intersection table + the same directed predicate +
    * an anti-join. */
  protected val l75 = DeclaredQuery(
    "l75_containment_dedup",
    (s, dir) => Dedup.containmentDedupApply(t(s, dir, "documents"),
        n = 3, minC = 0.6)
      .orderBy(col("doc_id")),
    Some(s"""WITH $shingleCte,
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      common AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
                 FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
                 GROUP BY x.doc_id, y.doc_id),
      dirx AS (SELECT doc_a, doc_b, c FROM common
               UNION ALL SELECT doc_b, doc_a, c FROM common),
      losers AS (SELECT DISTINCT d.doc_a AS doc_id
                 FROM dirx d
                 JOIN sizes sa ON sa.doc_id = d.doc_a
                 JOIN sizes sb ON sb.doc_id = d.doc_b
                 WHERE CAST(c AS DOUBLE) / sa.n_sh >= 0.6
                   AND (sa.n_sh < sb.n_sh OR
                        (sa.n_sh = sb.n_sh AND d.doc_a > d.doc_b)))
      SELECT doc_id, md5(text) AS text_md5 FROM documents
      WHERE doc_id NOT IN (SELECT doc_id FROM losers)
      ORDER BY doc_id"""))


  /** L77 — corpus NOVELTY curve (Heaps'-law saturation): per md5-order
    * corpus decile, distinct shingles seen, first-seen count, first-seen
    * fraction, and cumulative vocabulary — the "is more crawl still
    * adding new content" audit. Oracle: the same md5(doc_id) decile and
    * two grouped counts over the distinct (shingle, decile) cells. */
  protected val l77 = DeclaredQuery(
    "l77_novelty_curve",
    (s, dir) => Dedup.noveltyCurve(t(s, dir, "documents"))
      .orderBy(col("decile")),
    Some(s"""WITH $shingleCte,
      cells AS (SELECT DISTINCT md5(s) AS h,
          CAST(floor((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
            % 100) / 10.0) AS BIGINT) AS decile
        FROM sh),
      seen AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_shingles_seen
               FROM cells GROUP BY decile),
      fst AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_new_shingles
              FROM (SELECT h, MIN(decile) AS decile FROM cells GROUP BY h)
              GROUP BY decile)
      SELECT s.decile, s.n_shingles_seen,
        CAST(COALESCE(f.n_new_shingles, 0) AS BIGINT) AS n_new_shingles,
        CAST(COALESCE(f.n_new_shingles, 0) AS DOUBLE)
          / CAST(s.n_shingles_seen AS DOUBLE) AS frac_new,
        CAST(SUM(COALESCE(f.n_new_shingles, 0)) OVER (ORDER BY s.decile
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS vocab_cumulative
      FROM seen s LEFT JOIN fst f USING (decile) ORDER BY decile"""))


  /** L78 — source-overlap SKETCH audit: l49's pairwise source Jaccard
    * estimated from per-source bottom-k (k = 128) hash sketches via the
    * bounded_top_m aggregate, with the exact l49 Jaccard and signed error
    * alongside. Oracle: per-source bottom-k by row_number, the same
    * bottom-k-of-union estimator in list arithmetic, exact side from
    * full-md5 distinct counts. */
  protected val l78 = DeclaredQuery(
    "l78_source_sketch_audit",
    (s, dir) => Dedup.sourceSketchAudit(t(s, dir, "documents"))
      .orderBy(col("src_a"), col("src_b")),
    Some(s"""WITH $shingleCte,
      srcsh AS (SELECT DISTINCT d.source, sh.s
                FROM sh JOIN documents d USING (doc_id)),
      hs AS (SELECT DISTINCT source,
               ('0x' || substr(md5(s), 1, 13))::BIGINT AS h FROM srcsh),
      rk AS (SELECT source, h,
               row_number() OVER (PARTITION BY source ORDER BY h) AS rn
             FROM hs),
      sk AS (SELECT source, list(h ORDER BY h) AS sk
             FROM rk WHERE rn <= 128 GROUP BY source),
      sm AS (SELECT DISTINCT source, md5(s) AS hh FROM srcsh),
      sizes AS (SELECT source, COUNT(*) AS ns FROM sm GROUP BY source),
      com AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS c
              FROM sm a JOIN sm b ON a.hh = b.hh AND a.source < b.source
              GROUP BY a.source, b.source),
      est AS (SELECT a.source AS src_a, b.source AS src_b,
          a.sk AS ska, b.sk AS skb,
          (list_sort(list_distinct(a.sk || b.sk)))[1:128] AS m
        FROM sk a JOIN sk b ON a.source < b.source)
      SELECT e.src_a, e.src_b,
        CAST(len(m) AS BIGINT) AS n_sketch,
        CAST(len(list_intersect(list_intersect(m, ska), skb)) AS DOUBLE)
          / CAST(len(m) AS DOUBLE) AS j_est,
        COALESCE(CAST(c AS DOUBLE)
          / CAST(sa.ns + sb.ns - c AS DOUBLE), 0.0) AS j_exact,
        CAST(len(list_intersect(list_intersect(m, ska), skb)) AS DOUBLE)
          / CAST(len(m) AS DOUBLE)
          - COALESCE(CAST(c AS DOUBLE)
              / CAST(sa.ns + sb.ns - c AS DOUBLE), 0.0) AS err
      FROM est e
      LEFT JOIN com ON com.src_a = e.src_a AND com.src_b = e.src_b
      JOIN sizes sa ON sa.source = e.src_a
      JOIN sizes sb ON sb.source = e.src_b
      ORDER BY e.src_a, e.src_b"""))


  /** L80 — cross-SPLIT leakage matrix: l49's overlap machinery on the
    * train/val/test axis (shared shingles + containments + Jaccard per
    * split pair) — the whole-boundary audit published with a benchmark
    * result. Oracle: per-split distinct shingle digests from the same
    * md5 split rule, then the l49 pair arithmetic. */
  protected val l80 = DeclaredQuery(
    "l80_split_leakage_matrix",
    (s, dir) => Dedup.splitLeakageMatrix(t(s, dir, "documents"))
      .orderBy(col("split_a"), col("split_b")),
    Some(s"""WITH $shingleCte,
      lab AS (SELECT doc_id,
          CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                 % 100 < 80 THEN 'train'
               WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                 % 100 < 90 THEN 'val'
               ELSE 'test' END AS split
        FROM documents),
      ss AS (SELECT DISTINCT l.split AS source, md5(s) AS h
             FROM sh JOIN lab l USING (doc_id)),
      sizes AS (SELECT source, COUNT(*) AS n_sh FROM ss GROUP BY source),
      com AS (SELECT a.source AS src_a, b.source AS src_b,
                COUNT(*) AS n_common
              FROM ss a JOIN ss b ON a.h = b.h AND a.source < b.source
              GROUP BY a.source, b.source)
      SELECT src_a AS split_a, src_b AS split_b, n_common,
        CAST(n_common AS DOUBLE) / CAST(sa.n_sh AS DOUBLE) AS contain_a,
        CAST(n_common AS DOUBLE) / CAST(sb.n_sh AS DOUBLE) AS contain_b,
        CAST(n_common AS DOUBLE)
          / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) AS jaccard
      FROM com
      JOIN sizes sa ON sa.source = src_a
      JOIN sizes sb ON sb.source = src_b
      ORDER BY split_a, split_b"""))


  /** L81 — duplication TREND over md5-order corpus deciles: per decile,
    * docs duplicating a text first seen in an EARLIER decile, plus
    * running totals — the marginal-crawl dup rate (document-level twin of
    * l77's shingle novelty). The fixture corpus is dup-free by
    * construction, so the query runs over the corpus unioned with a
    * doc_id-shifted copy (the l01 convention): every text has two copies
    * whose deciles are independent md5 draws. */
  protected val l81 = DeclaredQuery(
    "l81_dup_trend",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = d.unionByName(
        d.withColumn("doc_id", col("doc_id") + 1000000L))
      Dedup.dupTrend(corpus).orderBy(col("decile"))
    },
    Some("""WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 1000000, text FROM documents),
      cells AS (SELECT md5(text) AS h,
          CAST(floor((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
            % 100) / 10.0) AS BIGINT) AS decile
        FROM corpus),
      cc AS (SELECT h, decile, CAST(COUNT(*) AS BIGINT) AS n
             FROM cells GROUP BY h, decile),
      wf AS (SELECT decile, n,
               MIN(decile) OVER (PARTITION BY h) AS fd FROM cc),
      g AS (SELECT decile, CAST(SUM(n) AS BIGINT) AS n_docs,
              CAST(SUM(CASE WHEN fd < decile THEN n ELSE 0 END) AS BIGINT)
                AS n_dup_of_earlier
            FROM wf GROUP BY decile),
      g2 AS (SELECT decile, n_docs, n_dup_of_earlier,
              CAST(SUM(n_docs) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_docs,
              CAST(SUM(n_dup_of_earlier) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_dups
            FROM g)
      SELECT decile, n_docs, n_dup_of_earlier,
        CAST(n_dup_of_earlier AS DOUBLE) / CAST(n_docs AS DOUBLE)
          AS dup_frac,
        cum_docs, cum_dups,
        CAST(cum_dups AS DOUBLE) / CAST(cum_docs AS DOUBLE)
          AS cum_dup_frac
      FROM g2 ORDER BY decile"""))


  /** L82 — LSH band-config S-CURVE sweep: measured recall/precision of
    * every (bands, rows) tiling of the k=16 MinHash signature against the
    * exact >= 0.5 Jaccard ground truth, next to the theoretical collision
    * probability at the threshold — the table the l03 knobs are chosen
    * from. Oracle: l03's signature/banding CTEs instantiated per config,
    * truth from l02's pair arithmetic, counts via scalar subqueries. */
  protected val l82 = {
    val k = 16; val minJ = 0.5
    val configs = Seq(2, 4, 8, 16)
    val sigCols = (0 until k)
      .map(i => s"MIN((h * ${Dedup.minhashA(i)} + ${Dedup.minhashB(i)}) % ${Dedup.minhashP}) AS m$i")
      .mkString(",\n        ")
    def bandCtes(b: Int): String = {
      val r = k / b
      val sels = (0 until b).map { bi =>
        // r = 1 has no '||' coercion to VARCHAR — cast the lone column
        // (BIGINT::VARCHAR prints the same digits Spark's concat_ws does)
        val cat =
          if (r == 1) s"m${bi}::VARCHAR"
          else (0 until r).map(j => s"m${r * bi + j}").mkString(" || ',' || ")
        s"SELECT doc_id, $bi AS band_idx, md5($cat) AS band_hash FROM sig"
      }.mkString("\n        UNION ALL ")
      s"""bands$b AS (
        $sels),
      cand$b AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
               FROM bands$b x JOIN bands$b y
                 ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
                AND x.doc_id < y.doc_id)"""
    }
    def cfgRow(b: Int): String = {
      val r = k / b
      val theory = 1.0 - math.pow(1.0 - math.pow(minJ, r), b)
      s"""SELECT CAST($b AS BIGINT) AS bands, CAST($r AS BIGINT) AS rows_per_band,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM cand$b) AS n_candidates,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM cand$b c
           JOIN truth t ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b) AS n_hits,
        (SELECT n_truth FROM tn) AS n_truth,
        CAST((SELECT CAST(COUNT(*) AS BIGINT) FROM cand$b c
           JOIN truth t ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b) AS DOUBLE)
          / NULLIF((SELECT n_truth FROM tn), 0) AS recall,
        CAST((SELECT CAST(COUNT(*) AS BIGINT) FROM cand$b c
           JOIN truth t ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b) AS DOUBLE)
          / NULLIF((SELECT CAST(COUNT(*) AS BIGINT) FROM cand$b), 0) AS prec,
        CAST('${theory}' AS DOUBLE) AS p_collide_at_minj"""
    }
    DeclaredQuery(
      "l82_band_config_sweep",
      (s, dir) => Dedup.bandConfigSweep(t(s, dir, "documents"), 3, k,
          configs, minJ)
        .withColumnRenamed("precision", "prec")
        .orderBy(col("bands")),
      Some(s"""WITH $shingleCte,
      shh AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h FROM sh),
      sig AS (SELECT doc_id,
        $sigCols
        FROM shh GROUP BY doc_id),
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      com AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
              FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
              GROUP BY x.doc_id, y.doc_id),
      truth AS (SELECT doc_a, doc_b FROM com
                JOIN sizes sa ON sa.doc_id = doc_a
                JOIN sizes sb ON sb.doc_id = doc_b
                WHERE CAST(c AS DOUBLE) / (sa.n_sh + sb.n_sh - c) >= $minJ),
      tn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
      ${configs.map(bandCtes).mkString(",\n      ")}
      ${configs.map(cfgRow).mkString("\n      UNION ALL ")}
      ORDER BY bands"""))
  }


  /** L83 — IDF-WEIGHTED Jaccard near-dup pairs: exact weighted-set
    * similarity with integer rarity weights w(h) = floor(N/df(h)) —
    * boilerplate shingles weigh 1, near-unique ones ~N, so shared
    * DISTINCTIVE content dominates the score (the similarity plain l02
    * under-reports on template-heavy corpora). Integer weights keep every
    * sum exact cross-engine. Oracle: df/weights from a digest group-by,
    * the l02 join shape with SUM(w) in place of COUNT. */
  protected val l83 = DeclaredQuery(
    "l83_weighted_jaccard_pairs",
    (s, dir) => Dedup.weightedJaccardPairs(t(s, dir, "documents"), 3, 0.5)
      .orderBy(col("doc_a"), col("doc_b")),
    Some(s"""WITH $shingleCte,
      shh AS (SELECT doc_id, md5(s) AS h FROM sh),
      nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
      wts AS (SELECT h, CAST((SELECT n FROM nd) // COUNT(*) AS BIGINT) AS w
              FROM shh GROUP BY h),
      docw AS (SELECT doc_id, CAST(SUM(w) AS BIGINT) AS w_doc
               FROM shh JOIN wts USING (h) GROUP BY doc_id),
      com AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                CAST(SUM(w.w) AS BIGINT) AS w_common
              FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
              JOIN wts w ON w.h = a.h
              GROUP BY a.doc_id, b.doc_id)
      SELECT doc_a, doc_b, w_common,
        CAST(w_common AS DOUBLE) / (wa.w_doc + wb.w_doc - w_common) AS jw
      FROM com
      JOIN docw wa ON wa.doc_id = doc_a
      JOIN docw wb ON wb.doc_id = doc_b
      WHERE CAST(w_common AS DOUBLE) / (wa.w_doc + wb.w_doc - w_common) >= 0.5
      ORDER BY doc_a, doc_b"""))


  /** L86 — cluster COHESION audit: edge density of every multi-member
    * near-dup cluster by size band — the over-merge (transitive-chain)
    * alarm read before trusting a dedup apply. Oracle: l16's recursive-CC
    * labeling + per-cluster edge counts + the size-band arithmetic. */
  protected val l86 = DeclaredQuery(
    "l86_cluster_cohesion",
    (s, dir) => Dedup.clusterCohesion(
        Dedup.jaccardPairs(t(s, dir, "documents"), n = 3, minJ = 0.5))
      .orderBy(col("n_members")),
    Some(s"""WITH RECURSIVE $shingleCte,
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      com AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
              FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
              GROUP BY x.doc_id, y.doc_id),
      pairs AS (
        SELECT doc_a, doc_b FROM com
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(c AS DOUBLE) / (sa.n_sh + sb.n_sh - c) >= 0.5),
      edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                UNION SELECT doc_b, doc_a FROM pairs),
      reach(a, b) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges) n
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      lab AS (SELECT a AS doc_id, MIN(b) AS cluster_id
              FROM reach GROUP BY a),
      csize AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
                FROM lab GROUP BY cluster_id),
      cedge AS (SELECT l.cluster_id, CAST(COUNT(*) AS BIGINT) AS n_edges
                FROM pairs p JOIN lab l ON l.doc_id = p.doc_a
                GROUP BY l.cluster_id),
      g AS (SELECT s.n_members,
              CAST(COUNT(*) AS BIGINT) AS n_clusters,
              CAST(SUM(e.n_edges) AS BIGINT) AS n_edges_total,
              CAST(MIN(e.n_edges) AS BIGINT) AS min_edges,
              CAST(MAX(e.n_edges) AS BIGINT) AS max_edges
            FROM csize s JOIN cedge e USING (cluster_id)
            GROUP BY s.n_members)
      SELECT n_members, n_clusters, n_edges_total, min_edges, max_edges,
        CAST(n_clusters * (n_members * (n_members - 1) // 2) AS BIGINT)
          AS n_edges_possible,
        CAST(n_edges_total AS DOUBLE)
          / CAST(n_clusters * (n_members * (n_members - 1) // 2) AS DOUBLE)
          AS pooled_density
      FROM g ORDER BY n_members"""))


  /** L88 — decontamination n-gram-size sweep: contaminated-train-doc
    * counts/fractions and shared-digest counts at n ∈ {2,3,5,8} — the
    * "choose n" table for the contamination rule (monotone non-increasing
    * in n by construction). Oracle: a generic per-n shingle CTE over one
    * tokenized projection, l24's join shape, scalar-subquery totals. */
  protected val l88 = {
    val ns = Seq(2, 3, 5, 8)
    def shCte(n: Int): String = {
      val cat = (0 until n).map(j =>
        if (j == 0) "w[i]" else s"w[i+$j]").mkString(" || ' ' || ")
      s"""sh$n AS (SELECT doc_id, bkt, unnest(list_distinct(list_transform(
        range(1, len(w) - ${n - 2}), i -> $cat))) AS s FROM tt),
      tr$n AS (SELECT doc_id, md5(s) AS sd FROM sh$n WHERE bkt < 80),
      ev$n AS (SELECT DISTINCT md5(s) AS sd FROM sh$n WHERE bkt >= 90),
      c$n AS (SELECT CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS n_cont,
          CAST(COUNT(DISTINCT t.sd) AS BIGINT) AS n_sh
        FROM tr$n t JOIN ev$n e USING (sd))"""
    }
    def cfgRow(n: Int): String =
      s"""SELECT CAST($n AS BIGINT) AS n,
        (SELECT n_train FROM nt) AS n_train,
        n_cont AS n_contaminated,
        CAST(n_cont AS DOUBLE)
          / CAST((SELECT n_train FROM nt) AS DOUBLE) AS contaminated_frac,
        n_sh AS n_shared_digests
      FROM c$n"""
    DeclaredQuery(
      "l88_decon_ngram_sweep",
      (s, dir) => Dedup.deconNgramSweep(t(s, dir, "documents"), ns)
        .orderBy(col("n")),
      Some(s"""WITH tt AS (
        SELECT doc_id,
          ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bkt,
          string_split(text, ' ') AS w
        FROM documents),
      nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_train FROM tt WHERE bkt < 80),
      ${ns.map(shCte).mkString(",\n      ")}
      ${ns.map(cfgRow).mkString("\n      UNION ALL ")}
      ORDER BY n"""))
  }


  /** L91 — SimHash ESTIMATOR audit (l43's measurement for the other
    * sketch): every band-candidate pair's Hamming distance next to its
    * exact Jaccard, collisions included at j_exact = 0 — completes the
    * estimator-audit family across all four sketches. Oracle: l04's
    * signature/banding CTEs + the candidate-verified exact side. */
  protected val l91 = {
    val bits = 32
    val sumCols = (0 until bits)
      .map(i => s"SUM(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i")
      .mkString(",\n        ")
    val sigExpr = (0 until bits)
      .map(i => s"(CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
    val bandSelects = (0 until 4)
      .map(b => s"SELECT doc_id, simhash, $b AS band_idx, (simhash >> ${8 * b}) & 255 AS band_val FROM sig")
      .mkString("\n        UNION ALL ")
    DeclaredQuery(
      "l91_simhash_estimate_audit",
      (s, dir) => Dedup.simhashEstimateAudit(t(s, dir, "documents"))
        .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""WITH $shingleCte,
      th AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h FROM sh),
      sums AS (SELECT doc_id,
        $sumCols
        FROM th GROUP BY doc_id),
      sig AS (SELECT doc_id, $sigExpr AS simhash FROM sums),
      banded AS (
        $bandSelects),
      cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
          CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
        FROM banded x JOIN banded y
          ON x.band_idx = y.band_idx AND x.band_val = y.band_val
         AND x.doc_id < y.doc_id
        WHERE bit_count(xor(x.simhash, y.simhash)) <= 6),
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      cm AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS cc
             FROM cand c
             JOIN sh sa ON sa.doc_id = c.doc_a
             JOIN sh sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
             GROUP BY c.doc_a, c.doc_b)
      SELECT c.doc_a, c.doc_b, c.hamming,
        CAST(COALESCE(cm.cc, 0) AS DOUBLE)
          / (sa.n_sh + sb.n_sh - COALESCE(cm.cc, 0)) AS j_exact
      FROM cand c
      LEFT JOIN cm ON cm.doc_a = c.doc_a AND cm.doc_b = c.doc_b
      JOIN sizes sa ON sa.doc_id = c.doc_a
      JOIN sizes sb ON sb.doc_id = c.doc_b
      ORDER BY c.doc_a, c.doc_b"""))
  }


  /** L92 — directional source-containment matrix ("who copies whom"):
    * ordered-source-pair counts of ≥ 0.6 containment pairs plus distinct
    * contained docs — the asymmetry readout l68's symmetric matrix can't
    * express. Oracle: l27's directed containment + two label joins +
    * the cell agg. */
  protected val l92 = DeclaredQuery(
    "l92_source_containment_matrix",
    (s, dir) => Dedup.sourceContainmentMatrix(t(s, dir, "documents"))
      .orderBy(col("src_contained"), col("src_container")),
    Some(s"""WITH $shingleCte,
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      com AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
              FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id <> y.doc_id
              GROUP BY x.doc_id, y.doc_id),
      cp AS (SELECT doc_a, doc_b
             FROM com JOIN sizes sa ON sa.doc_id = doc_a
             WHERE CAST(c AS DOUBLE) / sa.n_sh >= 0.6)
      SELECT da.source AS src_contained, db.source AS src_container,
        CAST(COUNT(*) AS BIGINT) AS n_pairs,
        CAST(COUNT(DISTINCT p.doc_a) AS BIGINT) AS n_docs_contained
      FROM cp p
      JOIN documents da ON da.doc_id = p.doc_a
      JOIN documents db ON db.doc_id = p.doc_b
      GROUP BY da.source, db.source
      ORDER BY src_contained, src_container"""))


  /** L96 — dedup MODALITY-AGREEMENT matrix: text-Jaccard pair verdicts vs
    * embedding-cosine pair verdicts as a 2×2 contingency. The fixture
    * corpora are modality-independent by construction (measured: zero
    * overlap between the j ≥ 0.05 text pairs and the cos ≥ 0.3 embedding
    * pairs), so — the l01/l38 planting precedent — the query runs over
    * each table unioned with an id-shifted copy of its doc_id % 10 = 0
    * SLICE (a contaminated 10% tranche, not a wholesale corpus copy —
    * keeps the planted-pair volume linear in the slice while the
    * corpus-sized passes stay ~1.1×): every planted (i, i+10⁶) pair is
    * an exact dup in BOTH planes, exercising the (true, true) cell,
    * while the corpora's own near-dup pairs populate the one-modality
    * cells. Booleans and exact counts only — no floats in the output. */
  protected val l96 = DeclaredQuery(
    "l96_modality_agreement",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = d.unionByName(
        d.filter(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val vecs = e.unionByName(
        e.filter(col("vec_id") % 10 === 0)
          .withColumn("vec_id", col("vec_id") + 1000000L))
      Dedup.modalityAgreement(corpus, vecs, n = 3, minJ = 0.5, minSim = 0.3)
        .orderBy(col("text_dup"), col("sem_dup"))
    },
    Some(s"""WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 1000000, text FROM documents
        WHERE doc_id % 10 = 0),
      vecs AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL SELECT vec_id + 1000000, embedding FROM embeddings
        WHERE vec_id % 10 = 0),
      t AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
      sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, len(w) - 1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
             FROM t),
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      tp AS (
        SELECT doc_a AS a, doc_b AS b FROM (
          SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
          FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
          GROUP BY x.doc_id, y.doc_id) cm
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(c AS DOUBLE) / (sa.n_sh + sb.n_sh - c) >= 0.5),
      planes AS (
        SELECT h, list_transform(range(64),
          d -> ('0x' || substr(md5(h::VARCHAR || ':' || d::VARCHAR), 1, 8))::BIGINT
               / 2147483648.0 - 1.0) AS plane
        FROM range(8) AS pt(h)),
      buckets AS (
        SELECT e.vec_id, e.embedding,
          SUM(CASE WHEN list_reduce(list_apply(list_zip(e.embedding, p.plane),
                x -> CAST(x[1] AS DOUBLE) * x[2]), (x, y) -> x + y) >= 0
              THEN 1 << h ELSE 0 END) AS bkt
        FROM vecs e CROSS JOIN planes p
        GROUP BY e.vec_id, e.embedding),
      sp AS (
        SELECT a.vec_id AS a, b.vec_id AS b
        FROM buckets a JOIN buckets b
          ON a.bkt = b.bkt AND a.vec_id < b.vec_id
        WHERE ${duckCosine("a.embedding", "b.embedding")} >= 0.3),
      u AS (
        SELECT tp.a IS NOT NULL AS text_dup, sp.a IS NOT NULL AS sem_dup,
          unnest([COALESCE(tp.a, sp.a), COALESCE(tp.b, sp.b)]) AS d
        FROM tp FULL OUTER JOIN sp ON tp.a = sp.a AND tp.b = sp.b)
      SELECT text_dup, sem_dup, CAST(COUNT(*) / 2 AS BIGINT) AS n_pairs,
        COUNT(DISTINCT d) AS n_docs
      FROM u GROUP BY text_dup, sem_dup ORDER BY text_dup, sem_dup"""))
}
