package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.llm._

/** Declared queries — retrieval family: BM25, winnowing, hybrid fusion, retrievability (llm/Retrieval.scala + the winnow operators).
  *
  * Mechanical split of the single LlmDeclared registry (round 13,
  * VERDICT directive #8) — every member moved verbatim; `LlmDeclared.all`
  * preserves the original declaration order, so bench sequence and
  * artifacts stay comparable round-over-round.
  */
private[queries] trait LlmDeclaredRetrieval extends LlmDeclaredBase {

  /** L101 — BM25 retrieval top-k (Okapi weighting, rational-idf integer-
    * polynomial form; Retrieval.scala's scaladoc derives the formula):
    * index the train split, retrieve for every eval doc — the retrieval-
    * based decontamination table. The oracle mirrors the one-division
    * snapped term score literally. */
  /** The l101 BM25 oracle chain (td → … → rk), shared with the l106
    * agreement audit. */
  protected val bm25Cte =
    """td AS (SELECT doc_id, string_split(text, ' ') AS w,
               ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
             FROM documents),
      train AS (SELECT doc_id, list_filter(w, x -> len(x) > 0) AS w
                FROM td WHERE bucket < 80),
      qr AS (SELECT doc_id AS q_id, unnest(list_distinct(list_filter(w, x -> len(x) > 0))) AS tok
             FROM td WHERE bucket >= 80),
      post AS (SELECT doc_id, unnest(w) AS tok FROM train),
      tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
             FROM post GROUP BY doc_id, tok),
      dft AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
      dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM train),
      st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                    CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
      terms AS (SELECT q.q_id, f.doc_id,
          floor(CAST((2 * (st.n_docs - g.df) + 1) * 22 * st.sum_dl * f.tf AS DOUBLE)
            / CAST((2 * g.df + 1) * (10 * st.sum_dl * f.tf + 3 * st.sum_dl
                + 9 * st.n_docs * d.dl) AS DOUBLE) * 1000000.0) AS term_score
        FROM qr q
        JOIN tf f ON f.tok = q.tok
        JOIN dft g ON g.tok = q.tok
        JOIN dl d ON d.doc_id = f.doc_id
        CROSS JOIN st),
      sc AS (SELECT q_id, doc_id, CAST(SUM(CAST(term_score AS BIGINT)) AS BIGINT) AS score
             FROM terms GROUP BY q_id, doc_id),
      rk AS (SELECT q_id, doc_id, score,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rank
             FROM sc)"""


  protected val l101 = DeclaredQuery(
    "l101_bm25_topk",
    (s, dir) => Retrieval.bm25TopK(t(s, dir, "documents"), k = 5)
      .orderBy(col("q_id"), col("rank")),
    Some(s"""WITH $bm25Cte
      SELECT q_id, doc_id, score, rank FROM rk
      WHERE rank <= 5 ORDER BY q_id, rank"""))


  /** L102 — winnowing fingerprint selection (Schleimer et al., SIGMOD'03):
    * per-window rightmost-minimum over the positional 3-gram hash
    * sequence, w = 4. The oracle replays the in-row selection with list
    * lambdas (reverse + first-position = rightmost argmin). */
  /** The l102 winnow-selection oracle chain (t → h → p → sel → sh),
    * shared with the l112 match-pair oracle. */
  protected val winnowCte =
    """t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      h AS (SELECT doc_id,
              list_transform(range(1, len(w) - 1),
                i -> ('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 8))::BIGINT) AS hs
            FROM t WHERE len(w) >= 3),
      p AS (SELECT doc_id, hs, len(hs) AS g, least(4, len(hs)) AS weff FROM h),
      sel AS (SELECT doc_id, hs, g,
              list_distinct(list_transform(range(0, g - weff + 1),
                j -> j + weff + 1
                  - list_position(list_reverse(list_slice(hs, j + 1, j + weff)),
                      list_min(list_slice(hs, j + 1, j + weff))))) AS sel_pos
            FROM p),
      sh AS (SELECT doc_id, g, sel_pos,
              list_transform(sel_pos, q -> hs[q]) AS sel_h
            FROM sel)"""


  protected val l102 = DeclaredQuery(
    "l102_winnow",
    (s, dir) => TextAnalysis.winnow(t(s, dir, "documents"), n = 3, w = 4)
      .orderBy(col("doc_id")),
    Some(s"""WITH $winnowCte
      SELECT doc_id, CAST(g AS BIGINT) AS n_grams,
        CAST(len(sel_pos) AS BIGINT) AS n_sel,
        CAST(len(list_distinct(sel_h)) AS BIGINT) AS n_sel_distinct,
        CAST(len(sel_pos) AS DOUBLE) / CAST(g AS DOUBLE) AS density,
        md5(array_to_string(list_transform(list_sort(sel_h), x -> x::VARCHAR), ',')) AS fp
      FROM sh ORDER BY doc_id"""))


  /** L106 — retrieval-vs-n-gram decontamination agreement: per eval doc,
    * BM25 top-5 vs exact shared-shingle top-5 — list sizes, intersection,
    * rank-1 agreement. The "can cheap retrieval stand in for the exact
    * n-gram join" policy table. */
  protected val l106 = DeclaredQuery(
    "l106_retrieval_decon_agreement",
    (s, dir) => Retrieval.deconAgreement(t(s, dir, "documents"), k = 5)
      .orderBy(col("q_id")),
    Some(s"""WITH $bm25Cte,
      t2 AS (SELECT doc_id, w, bucket FROM td),
      shl AS (SELECT doc_id, bucket, unnest(list_distinct(list_transform(
                range(1, len(w) - 1),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
              FROM t2),
      tr_sh AS (SELECT doc_id, s FROM shl WHERE bucket < 80),
      ev_sh AS (SELECT doc_id AS q_id, s FROM shl WHERE bucket >= 80),
      ex AS (SELECT e.q_id, t.doc_id, COUNT(*) AS shared
             FROM ev_sh e JOIN tr_sh t ON e.s = t.s
             GROUP BY e.q_id, t.doc_id),
      exr AS (SELECT q_id, doc_id, shared,
                ROW_NUMBER() OVER (PARTITION BY q_id
                  ORDER BY shared DESC, doc_id) AS rank
              FROM ex),
      exk AS (SELECT q_id, doc_id, rank FROM exr WHERE rank <= 5),
      bmk AS (SELECT q_id, doc_id, rank FROM rk WHERE rank <= 5),
      nb AS (SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_bm25 FROM bmk GROUP BY q_id),
      ne AS (SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM exk GROUP BY q_id),
      cm AS (SELECT b.q_id, CAST(COUNT(*) AS BIGINT) AS n_common
             FROM bmk b JOIN exk e ON e.q_id = b.q_id AND e.doc_id = b.doc_id
             GROUP BY b.q_id),
      t1 AS (SELECT b.q_id, CAST(b.doc_id = e.doc_id AS BIGINT) AS top1_agree
             FROM bmk b JOIN exk e ON e.q_id = b.q_id
             WHERE b.rank = 1 AND e.rank = 1),
      ev AS (SELECT doc_id AS q_id FROM td WHERE bucket >= 80)
      SELECT ev.q_id,
        COALESCE(nb.n_bm25, 0) AS n_bm25,
        COALESCE(ne.n_exact, 0) AS n_exact,
        COALESCE(cm.n_common, 0) AS n_common,
        COALESCE(t1.top1_agree, 0) AS top1_agree
      FROM ev
      LEFT JOIN nb USING (q_id) LEFT JOIN ne USING (q_id)
      LEFT JOIN cm USING (q_id) LEFT JOIN t1 USING (q_id)
      ORDER BY ev.q_id"""))


  /** The dense-leg oracle chain (vb → ev/tv → ds → dr → dk): id-aligned
    * eval vectors cosine-ranked against train vectors, shared by the
    * l109 agreement and l110 fusion oracles. */
  protected val denseCte =
    s"""vb AS (SELECT vec_id, embedding,
               ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
             FROM embeddings),
      qv AS (SELECT vec_id AS q_id FROM vb WHERE bucket >= 80),
      ev AS (SELECT vec_id AS q_id, embedding FROM vb WHERE bucket >= 80),
      tv AS (SELECT vec_id, embedding FROM vb WHERE bucket < 80),
      ds AS (SELECT e.q_id, t.vec_id AS doc_id,
               ${duckCosine("e.embedding", "t.embedding")} AS sim
             FROM ev e JOIN tv t ON e.q_id <> t.vec_id),
      dr AS (SELECT q_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY sim DESC, doc_id) AS rank
             FROM ds),
      dk AS (SELECT q_id, doc_id, CAST(rank AS BIGINT) AS rank
             FROM dr WHERE rank <= 5),
      sp AS (SELECT r.q_id, r.doc_id, r.rank
             FROM rk r JOIN qv ON qv.q_id = r.q_id WHERE r.rank <= 5)"""


  /** L109 — sparse-vs-dense retrieval agreement: per id-aligned eval
    * query, BM25 top-5 over train docs vs exact-cosine top-5 over train
    * vectors — list sizes, intersection, rank-1 agreement. The hybrid-
    * retrieval calibration table (Retrieval.hybridAgreement scaladoc). */
  protected val l109 = DeclaredQuery(
    "l109_hybrid_retrieval_agreement",
    (s, dir) => Retrieval.hybridAgreement(
      t(s, dir, "documents"), t(s, dir, "embeddings"), k = 5)
      .orderBy(col("q_id")),
    Some(s"""WITH $bm25Cte, $denseCte,
      nb AS (SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_sparse FROM sp GROUP BY q_id),
      ne AS (SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_dense FROM dk GROUP BY q_id),
      cm AS (SELECT a.q_id, CAST(COUNT(*) AS BIGINT) AS n_common
             FROM sp a JOIN dk b ON b.q_id = a.q_id AND b.doc_id = a.doc_id
             GROUP BY a.q_id),
      t1 AS (SELECT a.q_id, CAST(a.doc_id = b.doc_id AS BIGINT) AS top1_agree
             FROM sp a JOIN dk b ON b.q_id = a.q_id
             WHERE a.rank = 1 AND b.rank = 1)
      SELECT qv.q_id,
        COALESCE(nb.n_sparse, 0) AS n_sparse,
        COALESCE(ne.n_dense, 0) AS n_dense,
        COALESCE(cm.n_common, 0) AS n_common,
        COALESCE(t1.top1_agree, 0) AS top1_agree
      FROM qv
      LEFT JOIN nb USING (q_id) LEFT JOIN ne USING (q_id)
      LEFT JOIN cm USING (q_id) LEFT JOIN t1 USING (q_id)
      ORDER BY qv.q_id"""))


  /** L110 — hybrid RRF fusion top-k: the two legs full-outer joined per
    * (q_id, doc_id), fused by Σ ⌊10⁶/(60+rank)⌋ summed as BIGINT (the
    * snap makes the sum order-free and bit-portable — Retrieval.rrfFuse
    * scaladoc), fused top-5 with each leg's rank carried (NULL where one
    * leg missed the doc). */
  protected val l110 = DeclaredQuery(
    "l110_hybrid_rrf_fusion",
    (s, dir) => Retrieval.hybridRrfTopK(
      t(s, dir, "documents"), t(s, dir, "embeddings"), k = 5)
      .orderBy(col("q_id"), col("rank")),
    Some(s"""WITH $bm25Cte, $denseCte,
      fj AS (SELECT COALESCE(s.q_id, d.q_id) AS q_id,
               COALESCE(s.doc_id, d.doc_id) AS doc_id,
               s.rank AS sparse_rank, d.rank AS dense_rank
             FROM sp s FULL OUTER JOIN dk d
               ON d.q_id = s.q_id AND d.doc_id = s.doc_id),
      fsc AS (SELECT q_id, doc_id, sparse_rank, dense_rank,
               COALESCE(CAST(floor(1000000.0 /
                 (CAST(sparse_rank AS DOUBLE) + 60.0)) AS BIGINT), 0)
             + COALESCE(CAST(floor(1000000.0 /
                 (CAST(dense_rank AS DOUBLE) + 60.0)) AS BIGINT), 0) AS rrf_e6
             FROM fj),
      fr AS (SELECT q_id, doc_id, rrf_e6, sparse_rank, dense_rank,
               ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY rrf_e6 DESC, doc_id) AS rank
             FROM fsc)
      SELECT q_id, doc_id, rrf_e6, CAST(rank AS BIGINT) AS rank,
        sparse_rank, dense_rank
      FROM fr WHERE rank <= 5 ORDER BY q_id, rank"""))


  /** L112 — winnow match pairs: docs sharing ≥ 2 distinct selected
    * fingerprints, with selection sizes and containment — the matching
    * half of l102's selection (TextAnalysis.winnowMatchPairs scaladoc). */
  protected val l112 = DeclaredQuery(
    "l112_winnow_match_pairs",
    (s, dir) => TextAnalysis.winnowMatchPairs(t(s, dir, "documents"))
      .orderBy(col("doc_a"), col("doc_b")),
    Some(s"""WITH $winnowCte,
      e AS (SELECT DISTINCT doc_id, unnest(list_distinct(sel_h)) AS fh FROM sh),
      sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY doc_id),
      pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
             FROM e a JOIN e b ON b.fh = a.fh AND a.doc_id < b.doc_id
             GROUP BY a.doc_id, b.doc_id)
      SELECT pr.doc_a, pr.doc_b, pr.n_shared, sa.n AS na, sb.n AS nb,
        CAST(pr.n_shared AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE)
          AS containment
      FROM pr
      JOIN sz sa ON sa.doc_id = pr.doc_a
      JOIN sz sb ON sb.doc_id = pr.doc_b
      WHERE pr.n_shared >= 2 ORDER BY pr.doc_a, pr.doc_b"""))


  /** L113 — retrievability audit (Azzopardi–Vinay): per train doc, eval-
    * query hit counts in the sparse and dense top-k legs, zeros included;
    * in_dense_index marks id-aligned vector membership
    * (Retrieval.retrievability scaladoc). */
  protected val l113 = DeclaredQuery(
    "l113_retrievability",
    (s, dir) => Retrieval.retrievability(
      t(s, dir, "documents"), t(s, dir, "embeddings"), k = 5)
      .orderBy(col("doc_id")),
    Some(s"""WITH $bm25Cte, $denseCte,
      sh AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sparse_hits
             FROM rk WHERE rank <= 5 GROUP BY doc_id),
      dh AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dense_hits
             FROM dk GROUP BY doc_id),
      iv AS (SELECT vec_id AS doc_id, CAST(1 AS BIGINT) AS in_dense_index
             FROM vb WHERE bucket < 80),
      spine AS (SELECT doc_id FROM td WHERE bucket < 80)
      SELECT spine.doc_id,
        COALESCE(sh.n_sparse_hits, 0) AS n_sparse_hits,
        COALESCE(dh.n_dense_hits, 0) AS n_dense_hits,
        COALESCE(iv.in_dense_index, 0) AS in_dense_index
      FROM spine
      LEFT JOIN sh USING (doc_id) LEFT JOIN dh USING (doc_id)
      LEFT JOIN iv USING (doc_id)
      ORDER BY spine.doc_id"""))
}
