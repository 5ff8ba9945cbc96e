package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.llm._

/** Declared queries — embedding/ANN family (llm/Similarity.scala operators).
  *
  * Mechanical split of the single LlmDeclared registry (round 13,
  * VERDICT directive #8) — every member moved verbatim; `LlmDeclared.all`
  * preserves the original declaration order, so bench sequence and
  * artifacts stay comparable round-over-round.
  */
private[queries] trait LlmDeclaredSimilarity extends LlmDeclaredBase {

  // ------------------------------------------------------ similarity plane

  /** L5 — brute-force cosine top-k (the exact ANN baseline): 8 query
    * vectors against the full corpus. */
  protected val l05 = DeclaredQuery(
    "l05_cosine_topk",
    (s, dir) => {
      val em = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(em.filter(col("vec_id") < 8), em, k = 5)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("qid"), col("rnk"))
    },
    Some(s"""WITH sims AS (
      SELECT q.vec_id AS qid, c.vec_id AS nid,
        ${duckCosine("q.embedding", "c.embedding")} AS sim
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 8)
      SELECT qid, rnk, nid, sim FROM (
        SELECT qid, nid, sim,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk
        FROM sims) r
      WHERE rnk <= 5 ORDER BY qid, rnk"""))


  /** L6 — ANN top-k via random-hyperplane LSH (the scale path: only
    * same-bucket pairs are compared; hyperplanes are md5-derived so the
    * oracle regenerates them bit-for-bit). */
  protected val l06 = DeclaredQuery(
    "l06_ann_lsh",
    (s, dir) => {
      val em = t(s, dir, "embeddings")
      Similarity.annTopK(em.filter(col("vec_id") < 8), em, k = 3)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("qid"), col("rnk"))
    },
    Some(s"""WITH planes AS (
      SELECT h, list_transform(range(64),
        d -> ('0x' || substr(md5(h::VARCHAR || ':' || d::VARCHAR), 1, 8))::BIGINT
             / 2147483648.0 - 1.0) AS plane
      FROM range(8) AS t(h)),
      buckets AS (
        SELECT e.vec_id, e.embedding,
          SUM(CASE WHEN list_reduce(list_apply(list_zip(e.embedding, p.plane),
                x -> CAST(x[1] AS DOUBLE) * x[2]), (x, y) -> x + y) >= 0
              THEN 1 << h ELSE 0 END) AS bkt
        FROM embeddings e CROSS JOIN planes p
        GROUP BY e.vec_id, e.embedding),
      sims AS (
        SELECT q.vec_id AS qid, c.vec_id AS nid,
          ${duckCosine("q.embedding", "c.embedding")} AS sim
        FROM buckets q JOIN buckets c ON q.bkt = c.bkt AND q.vec_id <> c.vec_id
        WHERE q.vec_id < 8)
      SELECT qid, rnk, nid, sim FROM (
        SELECT qid, nid, sim,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk
        FROM sims) r
      WHERE rnk <= 3 ORDER BY qid, rnk"""))


  /** L14 — embedding-cosine near-duplicate pairs: same-LSH-bucket pairs
    * above a similarity threshold (the embedding analog of MinHash near-dup
    * — bucket occupancy bounds pair work, never all-pairs). The fixture
    * embeddings are near-orthogonal random vectors (corpus max cosine
    * 0.513), so the declared threshold is 0.3 to exercise non-empty output;
    * a production dedup run would use ~0.95. */
  /** The md5-derived hyperplane LSH bucket CTEs shared by l14 and l39 —
    * identical to Similarity.bucketExpr's arithmetic. */
  protected val lshBucketsCte =
    s"""planes AS (
      SELECT h, list_transform(range(64),
        d -> ('0x' || substr(md5(h::VARCHAR || ':' || d::VARCHAR), 1, 8))::BIGINT
             / 2147483648.0 - 1.0) AS plane
      FROM range(8) AS t(h)),
      buckets AS (
        SELECT e.vec_id, e.embedding,
          SUM(CASE WHEN list_reduce(list_apply(list_zip(e.embedding, p.plane),
                x -> CAST(x[1] AS DOUBLE) * x[2]), (x, y) -> x + y) >= 0
              THEN 1 << h ELSE 0 END) AS bkt
        FROM embeddings e CROSS JOIN planes p
        GROUP BY e.vec_id, e.embedding)"""


  protected val l14 = DeclaredQuery(
    "l14_cosine_near_dups",
    (s, dir) =>
      Similarity.cosineNearDups(t(s, dir, "embeddings"), minSim = 0.3)
        .orderBy(col("vec_a"), col("vec_b")),
    Some(s"""WITH $lshBucketsCte
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        ${duckCosine("a.embedding", "b.embedding")} AS sim
      FROM buckets a JOIN buckets b ON a.bkt = b.bkt AND a.vec_id < b.vec_id
      WHERE ${duckCosine("a.embedding", "b.embedding")} >= 0.3
      ORDER BY vec_a, vec_b"""))


  /** L39 — semantic dedup applied end-to-end (the embedding twin of l30):
    * LSH-bucketed cosine pairs → connected components (via the star-
    * contraction path, giving it an oracle-checked exercise) → survivors
    * after a broadcast anti-join of the losers. */
  protected val l39 = DeclaredQuery(
    "l39_embedding_dedup",
    (s, dir) => Similarity.embeddingDedupApply(
        t(s, dir, "embeddings"), minSim = 0.3)
      .orderBy(col("vec_id")),
    Some(s"""WITH RECURSIVE $lshBucketsCte,
      pairs AS (
        SELECT a.vec_id AS va, b.vec_id AS vb
        FROM buckets a JOIN buckets b ON a.bkt = b.bkt AND a.vec_id < b.vec_id
        WHERE ${duckCosine("a.embedding", "b.embedding")} >= 0.3),
      edges AS (SELECT va AS a, vb AS b FROM pairs
                UNION SELECT vb, va FROM pairs),
      reach(a, b) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges) n
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      clusters AS (SELECT a AS vec_id, MIN(b) AS cluster_id
                   FROM reach GROUP BY a),
      losers AS (SELECT vec_id FROM clusters WHERE cluster_id <> vec_id)
      SELECT e.vec_id, e.label
      FROM embeddings e ANTI JOIN losers l ON e.vec_id = l.vec_id
      ORDER BY e.vec_id"""))


  /** L17 — ANN top-k via the IVF path (coarse quantizer cells + nProbe
    * probing + exact rerank of cell members) — the index-structured
    * alternative to l06's hash-structured LSH. */
  protected val l17 = DeclaredQuery(
    "l17_ann_ivf",
    (s, dir) => {
      val em = t(s, dir, "embeddings")
      Similarity.annTopKIvf(em.filter(col("vec_id") < 8), em, k = 3)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("qid"), col("rnk"))
    },
    Some(s"""WITH cents AS (
        SELECT vec_id AS cent_id, embedding AS cent
        FROM embeddings ORDER BY vec_id LIMIT 16),
      assigned AS (
        SELECT nid, ce, cell FROM (
          SELECT e.vec_id AS nid, e.embedding AS ce, c.cent_id AS cell,
            ROW_NUMBER() OVER (PARTITION BY e.vec_id
              ORDER BY ${duckCosine("e.embedding", "c.cent")} DESC, c.cent_id) AS rn
          FROM embeddings e CROSS JOIN cents c) x
        WHERE rn <= 1),
      probes AS (
        SELECT qid, qe, cell FROM (
          SELECT e.vec_id AS qid, e.embedding AS qe, c.cent_id AS cell,
            ROW_NUMBER() OVER (PARTITION BY e.vec_id
              ORDER BY ${duckCosine("e.embedding", "c.cent")} DESC, c.cent_id) AS rn
          FROM embeddings e CROSS JOIN cents c
          WHERE e.vec_id < 8) x
        WHERE rn <= 2),
      sims AS (
        SELECT DISTINCT qid, nid, ${duckCosine("qe", "ce")} AS sim
        FROM probes p JOIN assigned a ON p.cell = a.cell
        WHERE qid <> nid)
      SELECT qid, rnk, nid, sim FROM (
        SELECT qid, nid, sim,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk
        FROM sims) r
      WHERE rnk <= 3 ORDER BY qid, rnk"""))


  /** L23 — per-label embedding centroids, quantized to 1e-6 so the mean is
    * an exact integer sum + one division on both engines (a double avg()
    * would be partition-order-dependent). DuckDB explodes positions via
    * range() + 1-based list indexing. */
  protected val l23 = DeclaredQuery(
    "l23_label_centroids",
    (s, dir) => Similarity.labelCentroids(t(s, dir, "embeddings"))
      .orderBy(col("label"), col("pos")),
    Some("""SELECT label, pos, COUNT(*) AS n_vecs,
        SUM(CAST(round(CAST(embedding[CAST(pos + 1 AS INTEGER)] AS DOUBLE)
                       * 1000000) AS BIGINT))
          / (COUNT(*) * 1000000) AS centroid
      FROM (SELECT label, embedding, unnest(range(len(embedding))) AS pos
            FROM embeddings) x
      GROUP BY label, pos ORDER BY label, pos"""))


  /** L25 — int8 embedding quantization summary: ⌊x/s + 0.5⌋ codes (the
    * explicit half-up formula — round()'s tie rule is dialect-defined),
    * sequential-fold reconstruction error. */
  protected val l25 = DeclaredQuery(
    "l25_quantize",
    (s, dir) => Similarity.quantizeInt8(t(s, dir, "embeddings"))
      .orderBy(col("vec_id")),
    Some("""WITH v AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
      s AS (SELECT vec_id, e,
              list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale FROM v),
      c AS (SELECT vec_id, e, scale,
              list_transform(e, x -> CASE WHEN scale = 0.0 THEN 0
                ELSE CAST(floor(x / scale + 0.5) AS BIGINT) END) AS codes
            FROM s)
      SELECT vec_id, CAST(len(e) AS BIGINT) AS n_dims, scale,
        list_min(codes) AS code_min, list_max(codes) AS code_max,
        list_reduce(codes, (a, c) -> a + c) AS code_sum,
        list_reduce(list_transform(list_zip(e, codes),
          p -> (p[1] - p[2] * scale) * (p[1] - p[2] * scale)),
          (a, v) -> a + v) AS recon_err
      FROM c ORDER BY vec_id"""))


  /** One Lloyd iteration as a DuckDB CTE pair: assign every vector to its
    * max-cosine centroid from `c${i-1}` (ties by cent_id, exactly the
    * Spark window), then recompute each centroid per dimension with the
    * l23 quantized-mean discipline — round(x·10⁶) summed in integers,
    * divided once — so the replayed centroids are bit-identical to
    * `fitCentroids(quantum = Some(1000000L))` regardless of either
    * engine's aggregation order. */
  protected def ivfFitIter(i: Int): String =
    s"""a$i AS (
       SELECT cent_id, embedding FROM (
         SELECT e.embedding, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY ${duckCosine("e.embedding", "c.cent")} DESC, c.cent_id) AS rn
         FROM embeddings e CROSS JOIN c${i - 1} c) x
       WHERE rn = 1),
     f$i AS (
       SELECT cent_id, list(m ORDER BY pos) AS cent FROM (
         SELECT cent_id, pos,
           SUM(CAST(round(CAST(embedding[CAST(pos + 1 AS INTEGER)] AS DOUBLE)
                          * 1000000) AS BIGINT))
             / (COUNT(*) * 1000000) AS m
         FROM (SELECT cent_id, embedding, unnest(range(len(embedding))) AS pos
               FROM a$i) u
         GROUP BY cent_id, pos) g
       GROUP BY cent_id),
     c$i AS (
       -- keep-previous rule for empty clusters (mirrors fitCentroids)
       SELECT p.cent_id, COALESCE(n.cent, p.cent) AS cent
       FROM c${i - 1} p LEFT JOIN f$i n ON n.cent_id = p.cent_id)"""


  /** L37 — the l17 IVF probe with TRAINED centroids: 3 Lloyd iterations of
    * spherical k-means (k=16) over the corpus, then the same
    * cell-assign/probe/rerank plan against the fitted cells. Closes the
    * fit→probe loop end-to-end under the oracle: the quantized per-
    * dimension mean makes every intermediate centroid — and therefore
    * every cell assignment and final sim — reproducible from SQL. */
  protected val l37 = DeclaredQuery(
    "l37_ann_ivf_trained",
    (s, dir) => {
      val em = t(s, dir, "embeddings")
      val cents = Similarity.fitCentroids(em, k = 16, iters = 3,
        quantum = Some(1000000L))
      Similarity.annTopKIvf(em.filter(col("vec_id") < 8), em, k = 3,
          centroids = Some(cents))
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("qid"), col("rnk"))
    },
    Some(s"""WITH c0 AS (
        SELECT vec_id AS cent_id, list_apply(embedding, x -> CAST(x AS DOUBLE)) AS cent
        FROM embeddings ORDER BY vec_id LIMIT 16),
      ${ivfFitIter(1)},
      ${ivfFitIter(2)},
      ${ivfFitIter(3)},
      assigned AS (
        SELECT nid, ce, cell FROM (
          SELECT e.vec_id AS nid, e.embedding AS ce, c.cent_id AS cell,
            ROW_NUMBER() OVER (PARTITION BY e.vec_id
              ORDER BY ${duckCosine("e.embedding", "c.cent")} DESC, c.cent_id) AS rn
          FROM embeddings e CROSS JOIN c3 c) x
        WHERE rn <= 1),
      probes AS (
        SELECT qid, qe, cell FROM (
          SELECT e.vec_id AS qid, e.embedding AS qe, c.cent_id AS cell,
            ROW_NUMBER() OVER (PARTITION BY e.vec_id
              ORDER BY ${duckCosine("e.embedding", "c.cent")} DESC, c.cent_id) AS rn
          FROM embeddings e CROSS JOIN c3 c
          WHERE e.vec_id < 8) x
        WHERE rn <= 2),
      sims AS (
        SELECT DISTINCT qid, nid, ${duckCosine("qe", "ce")} AS sim
        FROM probes p JOIN assigned a ON p.cell = a.cell
        WHERE qid <> nid)
      SELECT qid, rnk, nid, sim FROM (
        SELECT qid, nid, sim,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk
        FROM sims) r
      WHERE rnk <= 3 ORDER BY qid, rnk"""))


  /** L40 — semantic decontamination: the embedding analog of l24 (n-gram
    * decontamination) — train-split vectors within cosine 0.3 of any
    * eval-split vector, with hit counts and the worst similarity. Split
    * derives per row (md5(vec_id) buckets, the l15 discipline); candidates
    * from the same LSH bucket join as l14/l39. */
  protected val l40 = DeclaredQuery(
    "l40_semantic_decontaminate",
    (s, dir) => Similarity.semanticDecontaminate(
        t(s, dir, "embeddings"), minSim = 0.3)
      .orderBy(col("vec_id")),
    Some(s"""WITH $lshBucketsCte,
      b2 AS (SELECT vec_id, embedding, bkt,
               ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT % 100 AS split
             FROM buckets),
      hits AS (
        SELECT tr.vec_id, ev.vec_id AS eid,
          ${duckCosine("tr.embedding", "ev.embedding")} AS sim
        FROM b2 tr JOIN b2 ev ON tr.bkt = ev.bkt
        WHERE tr.split < 80 AND ev.split >= 90)
      SELECT vec_id, COUNT(DISTINCT eid) AS n_eval_hits, MAX(sim) AS max_sim
      FROM hits WHERE sim >= 0.3
      GROUP BY vec_id ORDER BY vec_id"""))


  /** L44 — embedding-LSH recall audit (the l43 estimator audit's embedding
    * twin, VERDICT r8 item 3): for each (planes, tables) config, the
    * fraction of exact cosine-threshold neighbor pairs the bucket-equality
    * join would have surfaced. Ground truth is a 5% deterministic query
    * sample (vec_id ≡ 0 mod 20) exact-paired against the corpus — broadcast
    * sample × one corpus pass, never all-pairs. The oracle replays the
    * md5-derived planes for all 64 plane indices (8 tables × 8 planes) and
    * derives every config's buckets from one per-(vector, plane) sign
    * table. */
  protected val l44 = DeclaredQuery(
    "l44_lsh_recall_audit",
    (s, dir) => Similarity.lshRecallAudit(t(s, dir, "embeddings"), minSim = 0.3)
      .orderBy(col("planes"), col("tables")),
    Some(s"""WITH planes AS (
      SELECT h, list_transform(range(64),
        d -> ('0x' || substr(md5(h::VARCHAR || ':' || d::VARCHAR), 1, 8))::BIGINT
             / 2147483648.0 - 1.0) AS plane
      FROM range(64) AS t(h)),
      signs AS (
        SELECT e.vec_id, p.h,
          CASE WHEN list_reduce(list_apply(list_zip(e.embedding, p.plane),
                x -> CAST(x[1] AS DOUBLE) * x[2]), (x, y) -> x + y) >= 0
          THEN 1 ELSE 0 END AS s
        FROM embeddings e CROSS JOIN planes p),
      bks AS (
        SELECT sg.vec_id, cfg.p, tt.t,
               SUM(CASE WHEN sg.s = 1 THEN 1 << (sg.h - tt.t * cfg.p) ELSE 0 END) AS bkt
        FROM signs sg
        CROSS JOIN (VALUES (4), (8)) AS cfg(p)
        JOIN range(8) AS tt(t)
          ON sg.h >= tt.t * cfg.p AND sg.h < (tt.t + 1) * cfg.p
        GROUP BY sg.vec_id, cfg.p, tt.t),
      truth AS (
        SELECT q.vec_id AS qid, c.vec_id AS nid
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id % 20 = 0
          AND ${duckCosine("q.embedding", "c.embedding")} >= 0.3),
      hits AS (
        SELECT tr.qid, tr.nid, b1.p, b1.t
        FROM truth tr
        JOIN bks b1 ON b1.vec_id = tr.qid
        JOIN bks b2 ON b2.vec_id = tr.nid
         AND b2.p = b1.p AND b2.t = b1.t AND b2.bkt = b1.bkt),
      cfgs AS (SELECT * FROM (VALUES (4, 1), (4, 8), (8, 1), (8, 8))
               AS v(planes, tables)),
      found AS (
        SELECT c.planes, c.tables, tr.qid, tr.nid,
          MAX(CASE WHEN h.p IS NOT NULL THEN 1 ELSE 0 END) AS f
        FROM cfgs c
        CROSS JOIN truth tr
        LEFT JOIN hits h ON h.qid = tr.qid AND h.nid = tr.nid
         AND h.p = c.planes AND h.t < c.tables
        GROUP BY c.planes, c.tables, tr.qid, tr.nid)
      SELECT CAST(planes AS BIGINT) AS planes, CAST(tables AS BIGINT) AS tables,
             COUNT(*) AS n_truth, CAST(SUM(f) AS BIGINT) AS n_found,
             CAST(SUM(f) AS DOUBLE) / COUNT(*) AS recall
      FROM found GROUP BY planes, tables ORDER BY planes, tables"""))


  /** L48 — int8-quantized ANN with exact rerank. The approximate score is
    * an exact-integer code dot times doubles in a fixed association order,
    * so shortlist membership — and therefore the reranked output — is
    * bit-reproducible in DuckDB (codes share l25's portable rounding). */
  /** Shared by l48 and l48b: the two Spark plans differ ONLY in the coarse
    * pass's code representation (array<long> vs packed binary) — the codes,
    * the integer dot, the shortlist, and the rerank are value-identical, so
    * one oracle covers both. */
  protected val l48OracleSql: String = {
    def norm(col: String) =
      s"sqrt(list_reduce(list_apply($col, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))"
    s"""WITH v AS (SELECT vec_id, embedding,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
        sc AS (SELECT vec_id, embedding, e,
                 list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale FROM v),
        c AS (SELECT vec_id, embedding, e, scale,
                list_transform(e, x -> CASE WHEN scale = 0.0 THEN 0
                  ELSE CAST(floor(x / scale + 0.5) AS BIGINT) END) AS codes
              FROM sc),
        ap AS (SELECT q.vec_id AS qid, n.vec_id AS nid,
                 q.embedding AS qe, n.embedding AS ne,
                 q.scale * n.scale * CAST(list_reduce(
                   list_transform(list_zip(q.codes, n.codes), p -> p[1] * p[2]),
                   (a, b) -> a + b) AS DOUBLE)
                   / (${norm("q.embedding")} * ${norm("n.embedding")}) AS approx_sim
               FROM c q JOIN c n ON q.vec_id <> n.vec_id
               WHERE q.vec_id % 20 = 0),
        sl AS (SELECT *, ROW_NUMBER() OVER
                 (PARTITION BY qid ORDER BY approx_sim DESC, nid) AS arank
               FROM ap),
        re AS (SELECT qid, nid, approx_sim,
                 ${duckCosine("qe", "ne")} AS sim
               FROM sl WHERE arank <= 10),
        rk AS (SELECT qid, nid, sim, approx_sim, ROW_NUMBER() OVER
                 (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
               FROM re)
        SELECT qid, CAST(rank AS BIGINT) AS rank, nid, sim, approx_sim
        FROM rk WHERE rank <= 3 ORDER BY qid, rank"""
  }


  protected val l48 = DeclaredQuery(
    "l48_int8_rerank",
    (s, dir) => Similarity.int8RerankTopK(t(s, dir, "embeddings"))
      .orderBy(col("qid"), col("rank")),
    Some(l48OracleSql))


  /** L48b — l48 with the coarse-pass codes BYTE-PACKED into `binary`
    * (`int8_pack` / `int8_packed_dot` native expressions): 1 B per code
    * instead of array<long>'s 8 B + offsets — the scan/broadcast-bandwidth
    * form the int8 rerank exists for. Value-identical to l48 (same codes,
    * same integer dot, same shortlist), hence the shared oracle. */
  protected val l48b = DeclaredQuery(
    "l48b_int8_rerank_packed",
    (s, dir) => Similarity.int8RerankTopKPacked(t(s, dir, "embeddings"))
      .orderBy(col("qid"), col("rank")),
    Some(l48OracleSql))


  /** L60 — centroid-similarity outlier audit: every vector's cosine to
    * its own label's exact quantized centroid (l23), vectors below 0
    * flagged — the mislabeled/noisy-embedding filter. The centroid is an
    * exact rational on both engines and the cosine is the shared
    * sequential fold, so the doubles hash identically. */
  protected val l60 = DeclaredQuery(
    "l60_centroid_outliers",
    (s, dir) => Similarity.centroidOutliers(t(s, dir, "embeddings"))
      .orderBy(col("vec_id")),
    Some(s"""WITH c AS (SELECT label, pos,
        SUM(CAST(round(CAST(embedding[CAST(pos + 1 AS INTEGER)] AS DOUBLE)
                       * 1000000) AS BIGINT))
          / (COUNT(*) * 1000000) AS centroid
      FROM (SELECT label, embedding, unnest(range(len(embedding))) AS pos
            FROM embeddings) x
      GROUP BY label, pos),
      ca AS (SELECT label, list(centroid ORDER BY pos) AS cent
             FROM c GROUP BY label),
      scored AS (SELECT e.vec_id, e.label,
        ${duckCosine("e.embedding", "ca.cent")} AS cent_sim
      FROM embeddings e JOIN ca USING (label))
      SELECT vec_id, label, cent_sim, cent_sim < 0.0 AS is_outlier
      FROM scored ORDER BY vec_id"""))


  /** L76 — centroid-similarity outlier RANKS: the l71 exact-rank
    * primitive on the embedding plane — every vector's exact global rank
    * + decile under l60's centroid-cosine score, no global sort; decile
    * 0 is the budgeted "drop the worst 10%" outlier set. Oracle: l60's
    * scoring CTEs + a single row_number over (cent_sim, vec_id). */
  protected val l76 = DeclaredQuery(
    "l76_outlier_ranks",
    (s, dir) => Similarity.outlierRanks(t(s, dir, "embeddings"))
      .orderBy(col("vec_id")),
    Some(s"""WITH c AS (SELECT label, pos,
        SUM(CAST(round(CAST(embedding[CAST(pos + 1 AS INTEGER)] AS DOUBLE)
                       * 1000000) AS BIGINT))
          / (COUNT(*) * 1000000) AS centroid
      FROM (SELECT label, embedding, unnest(range(len(embedding))) AS pos
            FROM embeddings) x
      GROUP BY label, pos),
      ca AS (SELECT label, list(centroid ORDER BY pos) AS cent
             FROM c GROUP BY label),
      scored AS (SELECT e.vec_id,
        ${duckCosine("e.embedding", "ca.cent")} AS cent_sim
      FROM embeddings e JOIN ca USING (label)),
      r AS (SELECT vec_id, cent_sim,
              row_number() OVER (ORDER BY cent_sim, vec_id) AS rnk,
              COUNT(*) OVER () AS n_total
            FROM scored WHERE cent_sim IS NOT NULL)
      SELECT vec_id, cent_sim,
        CAST(rnk AS BIGINT) AS sim_rank,
        CAST(FLOOR(CAST((rnk - 1) * 10 AS DOUBLE)
          / CAST(n_total AS DOUBLE)) AS BIGINT) AS decile
      FROM r ORDER BY vec_id"""))


  /** L79 — k-NN graph HUBNESS audit: in-degree distribution of the top-5
    * neighbor graph over the 20% md5-sampled query set (in-degree 0 =
    * never-retrieved vectors). Oracle: l05's exact-cosine machinery with
    * the sample predicate, a rank-5 window, and two grouped counts. */
  protected val l79 = DeclaredQuery(
    "l79_hubness_audit",
    (s, dir) => Similarity.hubnessAudit(t(s, dir, "embeddings"))
      .orderBy(col("in_degree")),
    Some(s"""WITH sims AS (
        SELECT q.vec_id AS qid, c.vec_id AS nid,
          ${duckCosine("q.embedding", "c.embedding")} AS sim
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE ('0x' || substr(md5(q.vec_id::VARCHAR), 1, 8))::BIGINT
          % 100 < 20),
      top AS (SELECT qid, nid FROM (
          SELECT qid, nid,
            ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid)
              AS rnk
          FROM sims) r WHERE rnk <= 5),
      deg AS (SELECT nid, COUNT(*) AS in_degree FROM top GROUP BY nid),
      nc AS (SELECT COUNT(*) AS n_corpus FROM embeddings),
      hist AS (
        SELECT in_degree, CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM deg GROUP BY in_degree
        UNION ALL
        SELECT CAST(0 AS BIGINT),
          (SELECT n_corpus FROM nc)
            - (SELECT CAST(COUNT(*) AS BIGINT) FROM deg))
      SELECT in_degree, n_vecs,
        CAST(n_vecs AS DOUBLE)
          / CAST((SELECT n_corpus FROM nc) AS DOUBLE) AS frac_vecs
      FROM hist WHERE n_vecs > 0 ORDER BY in_degree"""))


  /** L84 — embedding-space COVERAGE audit: occupancy of the 256 SimHash
    * cells (l06's hyperplane buckets as a fixed grid) — per occupied cell
    * its population, corpus fraction, skew vs uniform, with occupied-cell
    * count and occupancy fraction on every row; the diversity readout run
    * before trusting a crawl snapshot. Oracle: the shared bucket CTE,
    * one group-by, totals via scalar subqueries. */
  protected val l84 = DeclaredQuery(
    "l84_embedding_coverage",
    (s, dir) => Similarity.embeddingCoverage(t(s, dir, "embeddings"))
      .orderBy(col("bkt")),
    Some(s"""WITH $lshBucketsCte,
      cells AS (SELECT CAST(bkt AS BIGINT) AS bkt,
          CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM buckets GROUP BY bkt),
      tot AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS n_corpus,
          CAST(COUNT(*) AS BIGINT) AS n_cells_occupied FROM cells)
      SELECT bkt, n_vecs,
        CAST(n_vecs AS DOUBLE)
          / CAST((SELECT n_corpus FROM tot) AS DOUBLE) AS frac_vecs,
        CAST(n_vecs AS DOUBLE) * 256
          / CAST((SELECT n_corpus FROM tot) AS DOUBLE) AS skew_vs_uniform,
        (SELECT n_cells_occupied FROM tot) AS n_cells_occupied,
        CAST((SELECT n_cells_occupied FROM tot) AS DOUBLE) / 256
          AS occupancy_frac
      FROM cells ORDER BY bkt"""))


  /** L85 — cell-capped DIVERSITY sample: keep at most 4 vectors per
    * SimHash cell, chosen by ascending md5 of the vec_id (deterministic,
    * content-independent) — the de-clustering downsample l84's audit
    * motivates. Oracle: the bucket CTE + row_number over (md5, vec_id)
    * within cell. */
  protected val l85 = DeclaredQuery(
    "l85_diversity_sample",
    (s, dir) => Similarity.diversitySample(t(s, dir, "embeddings"), cap = 4)
      .orderBy(col("bkt"), col("vec_id")),
    Some(s"""WITH $lshBucketsCte,
      hq AS (SELECT CAST(bkt AS BIGINT) AS bkt, vec_id,
          ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT AS h
        FROM buckets),
      r AS (SELECT bkt, vec_id,
          ROW_NUMBER() OVER (PARTITION BY bkt ORDER BY h, vec_id) AS rn
        FROM hq)
      SELECT bkt, vec_id FROM r WHERE rn <= 4 ORDER BY bkt, vec_id"""))


  /** L87 — IVF probe-count recall sweep: measured recall@3 at nProbe ∈
    * {1,2,4} vs the brute-force truth over the md5-sampled query set —
    * the audit that prices the IVF serving knob (l44's table for the LSH
    * knobs, l82's for the MinHash bands). Oracle: l17's cents/assignment
    * CTEs, probe ranks kept to the max config, per-config top-3 +
    * scalar-subquery counts. */
  protected val l87 = {
    val k = 3; val nCells = 16; val probes = Seq(1, 2, 4)
    val pMax = probes.max
    def gotCte(p: Int): String =
      s"""got$p AS (SELECT qid, nid FROM (
        SELECT qid, nid,
          ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk
        FROM sims WHERE prn <= $p) g WHERE rnk <= $k)"""
    def cfgRow(p: Int): String =
      s"""SELECT CAST($p AS BIGINT) AS nprobe,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM got$p) AS n_retrieved,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM got$p g
           JOIN truth t ON g.qid = t.qid AND g.nid = t.nid) AS n_hits,
        (SELECT n_truth FROM tn) AS n_truth,
        CAST((SELECT CAST(COUNT(*) AS BIGINT) FROM got$p g
           JOIN truth t ON g.qid = t.qid AND g.nid = t.nid) AS DOUBLE)
          / CAST((SELECT n_truth FROM tn) AS DOUBLE) AS recall"""
    DeclaredQuery(
      "l87_ivf_probe_sweep",
      (s, dir) => Similarity.ivfProbeSweep(t(s, dir, "embeddings"),
          k, nCells, probes).orderBy(col("nprobe")),
      Some(s"""WITH sampleq AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT % 100 < 20),
      cents AS (
        SELECT vec_id AS cent_id, embedding AS cent
        FROM embeddings ORDER BY vec_id LIMIT $nCells),
      assigned AS (
        SELECT nid, ce, cell FROM (
          SELECT e.vec_id AS nid, e.embedding AS ce, c.cent_id AS cell,
            ROW_NUMBER() OVER (PARTITION BY e.vec_id
              ORDER BY ${duckCosine("e.embedding", "c.cent")} DESC, c.cent_id) AS rn
          FROM embeddings e CROSS JOIN cents c) x
        WHERE rn <= 1),
      probed AS (
        SELECT qid, qe, cell, prn FROM (
          SELECT q.vec_id AS qid, q.embedding AS qe, c.cent_id AS cell,
            ROW_NUMBER() OVER (PARTITION BY q.vec_id
              ORDER BY ${duckCosine("q.embedding", "c.cent")} DESC, c.cent_id) AS prn
          FROM sampleq q CROSS JOIN cents c) x
        WHERE prn <= $pMax),
      sims AS (
        SELECT qid, nid, prn, ${duckCosine("qe", "ce")} AS sim
        FROM probed p JOIN assigned a ON p.cell = a.cell
        WHERE qid <> nid),
      truth AS (SELECT qid, nid FROM (
          SELECT q.vec_id AS qid, e.vec_id AS nid,
            ROW_NUMBER() OVER (PARTITION BY q.vec_id
              ORDER BY ${duckCosine("q.embedding", "e.embedding")} DESC, e.vec_id) AS rnk
          FROM sampleq q JOIN embeddings e ON q.vec_id <> e.vec_id) t
        WHERE rnk <= $k),
      tn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
      ${probes.map(gotCte).mkString(",\n      ")}
      ${probes.map(cfgRow).mkString("\n      UNION ALL ")}
      ORDER BY nprobe"""))
  }


  /** L95 — PQ-ADC ANN with exact rerank (Jégou et al. TPAMI 2011): m=16
    * sub-space codebooks of ks=16 codewords fit by 2 quantized-mean Lloyd
    * iterations (the l37 discipline per subspace), corpus encoded to
    * m·log₂(ks) = 8 bytes of code per vector, queries scored by
    * Asymmetric Distance Computation (per-sub lookup of ⟨q_sub,
    * codeword⟩, left-associated m-term sum), bounded_top_m shortlist,
    * exact cosine rerank. The oracle replays the whole chain:
    * sub-slicing, both Lloyd rounds (integer-snapped means, keep-previous
    * for starved codewords), argmin encode with (dist, cent_id) ties, and
    * the ADC sum as list_reduce over sub-ordered terms — so shortlist and
    * final ranks are bit-identical across engines. Config measured in
    * LlmSpec: (m=16, ks=16, shortM=20) reads 0.92 top-1 agreement vs
    * brute force on the fixture corpus (coarser m=8/ks=8 read 0.16). */
  /** The PQ oracle's shared pieces (l95 + l98): sub-slicing, both Lloyd
    * rounds, argmin encode, norms, and the ADC approx scores — everything
    * up to the per-pair `approx` CTE that both the rerank and the
    * shortlist sweep consume. */
  protected object PqOracle {
    val (m, ks, subDim, queryMod) = (16, 16, 4, 20)
    def duckDot(a: String, b: String): String =
      s"""list_reduce(list_apply(list_zip($a, $b),
         |  x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (x, y) -> x + y)""".stripMargin
    def duckL2(a: String, b: String): String =
      s"""list_reduce(list_apply(list_zip($a, $b),
         |  x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
         |     * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))), (x, y) -> x + y)""".stripMargin
    /** one Lloyd round keyed by (sub, cent_id): L2 argmin assign from
      * c${i-1}, quantized per-dim means, keep-previous via LEFT JOIN. */
    def pqFitIter(i: Int): String =
      s"""a$i AS (
       SELECT sub, cent_id, sv FROM (
         SELECT v.sub, v.vec_id, v.sv, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.sub
             ORDER BY ${duckL2("v.sv", "c.cent")} ASC, c.cent_id) AS rn
         FROM sv v JOIN c${i - 1} c ON c.sub = v.sub) x
       WHERE rn = 1),
     f$i AS (
       SELECT sub, cent_id, list(mn ORDER BY pos) AS cent FROM (
         SELECT sub, cent_id, pos,
           SUM(CAST(round(sv[CAST(pos + 1 AS INTEGER)] * 1000000) AS BIGINT))
             / (COUNT(*) * 1000000) AS mn
         FROM (SELECT sub, cent_id, sv, unnest(range(len(sv))) AS pos
               FROM a$i) u
         GROUP BY sub, cent_id, pos) g
       GROUP BY sub, cent_id),
     c$i AS (
       SELECT p.sub, p.cent_id, COALESCE(n.cent, p.cent) AS cent
       FROM c${i - 1} p LEFT JOIN f$i n
         ON n.sub = p.sub AND n.cent_id = p.cent_id)"""
    /** CTEs sv → approx: everything up to the per-pair ADC approx score. */
    lazy val ctePrefix: String = s"""sv AS (
        SELECT vec_id, s.sub,
          list_apply(embedding[(s.sub*$subDim+1):(s.sub*$subDim+$subDim)],
                     x -> CAST(x AS DOUBLE)) AS sv
        FROM embeddings CROSS JOIN (SELECT unnest(range($m)) AS sub) s),
      c0 AS (
        SELECT s.sub, e.vec_id AS cent_id,
          list_apply(e.embedding[(s.sub*$subDim+1):(s.sub*$subDim+$subDim)],
                     x -> CAST(x AS DOUBLE)) AS cent
        FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT $ks) e
        CROSS JOIN (SELECT unnest(range($m)) AS sub) s),
      ${pqFitIter(1)},
      ${pqFitIter(2)},
      enc AS (
        SELECT vec_id, sub, cent FROM (
          SELECT v.vec_id, v.sub, c.cent,
            ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.sub
              ORDER BY ${duckL2("v.sv", "c.cent")} ASC, c.cent_id) AS rn
          FROM sv v JOIN c2 c ON c.sub = v.sub) x
        WHERE rn = 1),
      nrm AS (
        SELECT vec_id,
          sqrt(list_reduce(list_apply(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
            AS nrm
        FROM embeddings),
      terms AS (
        SELECT q.vec_id AS qid, e.vec_id AS nid, e.sub,
          ${duckDot("q.sv", "e.cent")} AS term
        FROM sv q JOIN enc e ON e.sub = q.sub
        WHERE q.vec_id % $queryMod = 0 AND q.vec_id <> e.vec_id),
      adc AS (
        SELECT qid, nid,
          list_reduce(list(term ORDER BY sub), (x, y) -> x + y) AS dp
        FROM terms GROUP BY qid, nid),
      approx AS (
        SELECT a.qid, a.nid, a.dp / (nq.nrm * nc.nrm) AS approx_sim
        FROM adc a
        JOIN nrm nq ON nq.vec_id = a.qid
        JOIN nrm nc ON nc.vec_id = a.nid)"""
  }


  protected val l95 = {
    import PqOracle.{m, ks, queryMod}
    val (shortM, k) = (20, 3)
    DeclaredQuery(
      "l95_pq_ann",
      (s, dir) => Similarity.pqRerankTopK(t(s, dir, "embeddings"),
          k = k, shortM = shortM, queryMod = queryMod, m = m, ks = ks,
          iters = 2, dim = 64)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("qid"), col("rnk")),
      Some(s"""WITH ${PqOracle.ctePrefix},
      short AS (
        SELECT qid, nid, approx_sim FROM (
          SELECT qid, nid, approx_sim,
            ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY approx_sim DESC, nid) AS srn
          FROM approx) x
        WHERE srn <= $shortM),
      rer AS (
        SELECT s.qid, s.nid, s.approx_sim,
          ${duckCosine("qe.embedding", "ce.embedding")} AS sim
        FROM short s
        JOIN embeddings qe ON qe.vec_id = s.qid
        JOIN embeddings ce ON ce.vec_id = s.nid)
      SELECT qid, rnk, nid, sim, approx_sim FROM (
        SELECT qid, nid, sim, approx_sim,
          ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk
        FROM rer) r
      WHERE rnk <= $k ORDER BY qid, rnk"""))
  }


  /** L98 — PQ SHORTLIST-SIZE recall sweep: recall@k of the l95 ADC
    * shortlist at each candidate shortM vs brute-force truth on the same
    * sampled query set, from ONE shared coarse pass (the l87/l88
    * shared-pass discipline — l87 prices IVF's nProbe, this prices PQ's
    * shortM). The oracle reuses l95's whole CTE chain through `approx`
    * and replays the membership counts exactly. */
  protected val l98 = {
    import PqOracle.{m, ks, queryMod}
    val (k, shortMs) = (3, Seq(5, 10, 20))
    DeclaredQuery(
      "l98_pq_shortlist_sweep",
      (s, dir) => Similarity.pqShortlistSweep(t(s, dir, "embeddings"),
          shortMs = shortMs, k = k, queryMod = queryMod, m = m, ks = ks,
          iters = 2, dim = 64)
        .orderBy(col("short_m")),
      Some(s"""WITH ${PqOracle.ctePrefix},
      short AS (
        SELECT qid, nid,
          ROW_NUMBER() OVER (PARTITION BY qid
            ORDER BY approx_sim DESC, nid) AS srn
        FROM approx),
      tq AS (
        SELECT q.vec_id AS qid, c.vec_id AS nid,
          ROW_NUMBER() OVER (PARTITION BY q.vec_id
            ORDER BY ${duckCosine("q.embedding", "c.embedding")} DESC,
              c.vec_id) AS trn
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id % $queryMod = 0),
      truth AS (SELECT qid, nid FROM tq WHERE trn <= $k),
      j AS (
        SELECT t.qid, s.srn FROM truth t
        LEFT JOIN short s ON s.qid = t.qid AND s.nid = t.nid)
      SELECT short_m, CAST(COUNT(DISTINCT qid) AS BIGINT) AS n_queries,
        CAST(COUNT(*) AS BIGINT) AS n_truth,
        CAST(SUM(CASE WHEN srn <= short_m THEN 1 ELSE 0 END) AS BIGINT)
          AS n_hit,
        CAST(SUM(CASE WHEN srn <= short_m THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS recall
      FROM j CROSS JOIN (SELECT CAST(unnest(${shortMs.mkString("[", ", ", "]")})
        AS BIGINT) AS short_m) s
      GROUP BY short_m ORDER BY short_m"""))
  }


  /** L100 — PQ CODEBOOK-health audit: per (sub, cent_id) assignment count
    * and integer-snapped total squared reconstruction error, dead
    * codewords kept at zero — the retrain-signal table completing the PQ
    * family (fit → encode → serve → sweep → audit). The oracle reuses
    * l95's fit CTEs and replays the argmin + the 10⁻⁶ error snap. */
  protected val l100 = {
    import PqOracle.duckL2
    DeclaredQuery(
      "l100_pq_codebook_audit",
      (s, dir) => Similarity.pqCodebookAudit(t(s, dir, "embeddings"),
          m = PqOracle.m, ks = PqOracle.ks, iters = 2, dim = 64)
        .orderBy(col("sub"), col("cent_id")),
      Some(s"""WITH ${PqOracle.ctePrefix},
      asg AS (
        SELECT sub, cent_id,
          CAST(floor(d * 1000000 + 0.5) AS BIGINT) AS err_e6
        FROM (
          SELECT v.sub, v.vec_id, c.cent_id, ${duckL2("v.sv", "c.cent")} AS d,
            ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.sub
              ORDER BY ${duckL2("v.sv", "c.cent")} ASC, c.cent_id) AS rn
          FROM sv v JOIN c2 c ON c.sub = v.sub) x
        WHERE rn = 1),
      st AS (
        SELECT sub, cent_id, CAST(COUNT(*) AS BIGINT) AS n_assigned,
          CAST(SUM(err_e6) AS BIGINT) AS err_e6_sum
        FROM asg GROUP BY sub, cent_id)
      SELECT c.sub, c.cent_id,
        COALESCE(st.n_assigned, 0) AS n_assigned,
        COALESCE(st.err_e6_sum, 0) AS err_e6_sum
      FROM c2 c LEFT JOIN st ON st.sub = c.sub AND st.cent_id = c.cent_id
      ORDER BY c.sub, c.cent_id"""))
  }


  /** L104 — hard-negative mining (FaceNet triplet construction): top-k
    * cross-label neighbors per sampled query next to its best same-label
    * similarity; `violates` marks negatives outscoring the positive. */
  protected val l104 = DeclaredQuery(
    "l104_hard_negatives",
    (s, dir) => Similarity.hardNegatives(t(s, dir, "embeddings"),
        k = 3, samplePct = 20)
      .orderBy(col("qid"), col("rnk")),
    Some(s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS qlabel
               FROM embeddings
               WHERE ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT % 100 < 20),
      sims AS (SELECT q.qid, q.qlabel, c.vec_id AS nid, c.label AS nlabel,
          ${duckCosine("q.qe", "c.embedding")} AS sim
        FROM q JOIN embeddings c ON q.qid <> c.vec_id),
      neg AS (SELECT qid, nid, nlabel, sim,
          ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk
        FROM sims WHERE nlabel <> qlabel),
      pos AS (SELECT qid, MAX(sim) AS pos_sim FROM sims
              WHERE nlabel = qlabel GROUP BY qid)
      SELECT n.qid, CAST(n.rnk AS BIGINT) AS rnk, n.nid, n.nlabel,
        n.sim AS neg_sim, p.pos_sim,
        n.sim - p.pos_sim AS margin,
        CAST(n.sim > p.pos_sim AS BIGINT) AS violates
      FROM neg n LEFT JOIN pos p USING (qid)
      WHERE n.rnk <= 3 ORDER BY n.qid, n.rnk"""))


  /** L108 — embedding dimension-health audit: per-dim count, 10⁻⁶-snapped
    * sum (l25 half-up), min/max codes, exact zero count. */
  protected val l108 = DeclaredQuery(
    "l108_embedding_dim_stats",
    (s, dir) => Similarity.dimStats(t(s, dir, "embeddings"))
      .orderBy(col("dim")),
    Some("""WITH v AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
      u AS (SELECT vec_id, unnest(list_transform(range(1, len(e) + 1),
              i -> {'d': i - 1, 'v': e[i]})) AS s FROM v),
      q AS (SELECT CAST(s.d AS BIGINT) AS dim, s.v AS v,
              CAST(floor(s.v * 1000000.0 + 0.5) AS BIGINT) AS q FROM u)
      SELECT dim, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        CAST(SUM(q) AS BIGINT) AS sum_e6,
        MIN(q) AS min_e6, MAX(q) AS max_e6,
        CAST(SUM(CASE WHEN v = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
      FROM q GROUP BY dim ORDER BY dim"""))


  /** L118 — SemDeDup semantic deduplication (Abbas et al. 2023): the l37
    * trained-k-means fit scopes within-cluster pairwise cosine; a vector
    * is a duplicate iff it has sim ≥ 0.35 to an EARLIER vector in its
    * cluster's keep order (ascending centroid similarity, ties by
    * vec_id — the paper's keep-the-most-atypical policy as a pure
    * pairwise predicate). The oracle replays the identical 3 Lloyd
    * iterations (quantized means), assignment, centroid sims, and the
    * upper-triangle verdict (Similarity.semDedup). */
  protected val l118 = DeclaredQuery(
    "l118_semdedup",
    (s, dir) => Similarity.semDedup(t(s, dir, "embeddings"))
      .orderBy(col("vec_id")),
    Some(s"""WITH c0 AS (
        SELECT vec_id AS cent_id, list_apply(embedding, x -> CAST(x AS DOUBLE)) AS cent
        FROM embeddings ORDER BY vec_id LIMIT 16),
      ${ivfFitIter(1)},
      ${ivfFitIter(2)},
      ${ivfFitIter(3)},
      assigned AS (
        SELECT nid, ce, cell FROM (
          SELECT e.vec_id AS nid, e.embedding AS ce, c.cent_id AS cell,
            ROW_NUMBER() OVER (PARTITION BY e.vec_id
              ORDER BY ${duckCosine("e.embedding", "c.cent")} DESC, c.cent_id) AS rn
          FROM embeddings e CROSS JOIN c3 c) x
        WHERE rn <= 1),
      cs AS (
        SELECT a.nid, a.ce, a.cell,
          ${duckCosine("a.ce", "c.cent")} AS cent_sim
        FROM assigned a JOIN c3 c ON a.cell = c.cent_id),
      dup AS (
        SELECT b.nid AS b_id, CAST(COUNT(*) AS BIGINT) AS n_dup
        FROM cs a JOIN cs b ON a.cell = b.cell
          AND (a.cent_sim < b.cent_sim
               OR (a.cent_sim = b.cent_sim AND a.nid < b.nid))
        WHERE ${duckCosine("a.ce", "b.ce")} >= 0.35
        GROUP BY b.nid)
      SELECT cs.nid AS vec_id, cs.cell, cs.cent_sim,
        COALESCE(d.n_dup, 0) AS n_dup_earlier,
        CAST(CASE WHEN d.b_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS dropped
      FROM cs LEFT JOIN dup d ON cs.nid = d.b_id
      ORDER BY vec_id"""))


  /** L120 — SemDeDup τ-sensitivity sweep: dropped/kept counts at a τ
    * ladder from ONE within-cell pair pass over l118's assignment table
    * (per-vector MAX earlier-member cosine — order-independent, so
    * cross-engine exact — then conditional sums per τ; the l64/l88/l98
    * shared-pass discipline). The oracle replays the l118 fit/assignment
    * CTEs, the pair max, and the ladder counts. */
  protected val l120 = DeclaredQuery(
    "l120_semdedup_tau_sweep",
    (s, dir) => Similarity.semDedupTauSweep(t(s, dir, "embeddings"))
      .orderBy(col("tau")),
    Some(s"""WITH c0 AS (
        SELECT vec_id AS cent_id, list_apply(embedding, x -> CAST(x AS DOUBLE)) AS cent
        FROM embeddings ORDER BY vec_id LIMIT 16),
      ${ivfFitIter(1)},
      ${ivfFitIter(2)},
      ${ivfFitIter(3)},
      assigned AS (
        SELECT nid, ce, cell FROM (
          SELECT e.vec_id AS nid, e.embedding AS ce, c.cent_id AS cell,
            ROW_NUMBER() OVER (PARTITION BY e.vec_id
              ORDER BY ${duckCosine("e.embedding", "c.cent")} DESC, c.cent_id) AS rn
          FROM embeddings e CROSS JOIN c3 c) x
        WHERE rn <= 1),
      cs AS (
        SELECT a.nid, a.ce, a.cell,
          ${duckCosine("a.ce", "c.cent")} AS cent_sim
        FROM assigned a JOIN c3 c ON a.cell = c.cent_id),
      mx AS (
        SELECT b.nid AS b_id, MAX(${duckCosine("a.ce", "b.ce")}) AS mes
        FROM cs a JOIN cs b ON a.cell = b.cell
          AND (a.cent_sim < b.cent_sim
               OR (a.cent_sim = b.cent_sim AND a.nid < b.nid))
        GROUP BY b.nid),
      per AS (
        SELECT cs.nid, m.mes FROM cs LEFT JOIN mx m ON cs.nid = m.b_id),
      t AS (SELECT CAST(unnest([0.2, 0.35, 0.5, 0.65, 0.8]) AS DOUBLE) AS tau)
      SELECT tau, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        CAST(SUM(CASE WHEN mes >= tau THEN 1 ELSE 0 END) AS BIGINT)
          AS n_dropped,
        CAST(COUNT(*) - SUM(CASE WHEN mes >= tau THEN 1 ELSE 0 END) AS BIGINT)
          AS n_kept,
        CAST(SUM(CASE WHEN mes >= tau THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS drop_rate
      FROM per CROSS JOIN t GROUP BY tau ORDER BY tau"""))


  /** One residual-PQ Lloyd round (pc/pa/pf-prefixed so the CTE names
    * never collide with the coarse fit's c/a/f chain): L2 argmin assign
    * over the residual sub-vectors `sv`, quantized per-dim means,
    * keep-previous — PqOracle.pqFitIter's body verbatim modulo names. */
  private def ivfPqFitIter(i: Int): String =
    s"""pa$i AS (
       SELECT sub, cent_id, sv FROM (
         SELECT v.sub, v.vec_id, v.sv, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.sub
             ORDER BY ${PqOracle.duckL2("v.sv", "c.cent")} ASC, c.cent_id) AS rn
         FROM sv v JOIN pc${i - 1} c ON c.sub = v.sub) x
       WHERE rn = 1),
     pf$i AS (
       SELECT sub, cent_id, list(mn ORDER BY pos) AS cent FROM (
         SELECT sub, cent_id, pos,
           SUM(CAST(round(sv[CAST(pos + 1 AS INTEGER)] * 1000000) AS BIGINT))
             / (COUNT(*) * 1000000) AS mn
         FROM (SELECT sub, cent_id, sv, unnest(range(len(sv))) AS pos
               FROM pa$i) u
         GROUP BY sub, cent_id, pos) g
       GROUP BY sub, cent_id),
     pc$i AS (
       SELECT p.sub, p.cent_id, COALESCE(n.cent, p.cent) AS cent
       FROM pc${i - 1} p LEFT JOIN pf$i n
         ON n.sub = p.sub AND n.cent_id = p.cent_id)"""

  /** L119 — IVF-PQ composed serving (the FAISS IVFADC shape, Jégou et
    * al. TPAMI 2011 §V): the l37 trained coarse quantizer scopes the
    * scan to nProbe probed cells per query, and the candidate score is
    * ADC over ONE residual codebook shared across cells —
    * approx_sim = (⟨q, c(x)⟩ + Σ_s lut[s, code_s(x)]) / (|q|·|x|) —
    * then the l95 exact rerank of the bounded_top_m shortlist. The
    * oracle replays the full chain: 3 coarse Lloyd rounds (quantized
    * means), assignment, residuals, 2 residual-PQ rounds, argmin
    * encode, probe windows, the qcd + ordered-term list_reduce ADC sum,
    * shortlist and rerank windows — bit-identical end to end. */
  protected val l119 = {
    import PqOracle.{m, ks, subDim, queryMod}
    // nProbe = 4 by the measured-recall discipline (the l87/ivfProbeForRecall
    // knob): recall@3 vs brute force on the fixture corpus reads 0.44/0.67/
    // 0.72/0.69 at nProbe 2/4/6/8 — the 8-probe DIP is the composed-index
    // signature (more probed cells let more ADC-approximate candidates
    // displace true neighbors from the fixed shortM=20 shortlist), so more
    // probes need a wider shortlist, and 4 is the knee at this config.
    val (nCells, nProbe, shortM, k) = (16, 4, 20, 3)
    DeclaredQuery(
      "l119_ivfpq_ann",
      (s, dir) => Similarity.ivfPqRerankTopK(t(s, dir, "embeddings"),
          k = k, nProbe = nProbe, shortM = shortM, queryMod = queryMod,
          nCells = nCells, coarseIters = 3, m = m, ks = ks, pqIters = 2,
          dim = 64)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("qid"), col("rnk")),
      Some(s"""WITH c0 AS (
        SELECT vec_id AS cent_id, list_apply(embedding, x -> CAST(x AS DOUBLE)) AS cent
        FROM embeddings ORDER BY vec_id LIMIT $nCells),
      ${ivfFitIter(1)},
      ${ivfFitIter(2)},
      ${ivfFitIter(3)},
      assigned AS (
        SELECT nid, ce, cell FROM (
          SELECT e.vec_id AS nid, e.embedding AS ce, c.cent_id AS cell,
            ROW_NUMBER() OVER (PARTITION BY e.vec_id
              ORDER BY ${duckCosine("e.embedding", "c.cent")} DESC, c.cent_id) AS rn
          FROM embeddings e CROSS JOIN c3 c) x
        WHERE rn <= 1),
      resid AS (
        SELECT a.nid AS vec_id,
          list_apply(list_zip(a.ce, c.cent),
            x -> CAST(x[1] AS DOUBLE) - x[2]) AS emb,
          a.cell
        FROM assigned a JOIN c3 c ON a.cell = c.cent_id),
      sv AS (
        SELECT vec_id, s.sub, r.emb[(s.sub*$subDim+1):(s.sub*$subDim+$subDim)] AS sv
        FROM resid r CROSS JOIN (SELECT unnest(range($m)) AS sub) s),
      pc0 AS (
        SELECT s.sub, r.vec_id AS cent_id,
          r.emb[(s.sub*$subDim+1):(s.sub*$subDim+$subDim)] AS cent
        FROM (SELECT * FROM resid ORDER BY vec_id LIMIT $ks) r
        CROSS JOIN (SELECT unnest(range($m)) AS sub) s),
      ${ivfPqFitIter(1)},
      ${ivfPqFitIter(2)},
      enc AS (
        SELECT vec_id, sub, cent FROM (
          SELECT v.vec_id, v.sub, c.cent,
            ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.sub
              ORDER BY ${PqOracle.duckL2("v.sv", "c.cent")} ASC, c.cent_id) AS rn
          FROM sv v JOIN pc2 c ON c.sub = v.sub) x
        WHERE rn = 1),
      nrm AS (
        SELECT vec_id,
          sqrt(list_reduce(list_apply(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
            AS nrm
        FROM embeddings),
      probes AS (
        SELECT qid, cell, qcd FROM (
          SELECT q.vec_id AS qid, c.cent_id AS cell,
            ${PqOracle.duckDot("q.embedding", "c.cent")} AS qcd,
            ROW_NUMBER() OVER (PARTITION BY q.vec_id
              ORDER BY ${duckCosine("q.embedding", "c.cent")} DESC, c.cent_id) AS rn
          FROM embeddings q CROSS JOIN c3 c
          WHERE q.vec_id % $queryMod = 0) x
        WHERE rn <= $nProbe),
      qsv AS (
        SELECT vec_id, s.sub,
          list_apply(embedding[(s.sub*$subDim+1):(s.sub*$subDim+$subDim)],
                     x -> CAST(x AS DOUBLE)) AS sv
        FROM embeddings CROSS JOIN (SELECT unnest(range($m)) AS sub) s
        WHERE vec_id % $queryMod = 0),
      terms AS (
        SELECT p.qid, r.vec_id AS nid, q.sub,
          ${PqOracle.duckDot("q.sv", "e.cent")} AS term
        FROM probes p
        JOIN resid r ON r.cell = p.cell AND r.vec_id <> p.qid
        JOIN qsv q ON q.vec_id = p.qid
        JOIN enc e ON e.vec_id = r.vec_id AND e.sub = q.sub),
      adc AS (
        SELECT qid, nid,
          list_reduce(list(term ORDER BY sub), (x, y) -> x + y) AS rdp
        FROM terms GROUP BY qid, nid),
      approx AS (
        SELECT a.qid, a.nid, (p.qcd + a.rdp) / (nq.nrm * nc.nrm) AS approx_sim
        FROM adc a
        JOIN resid r ON r.vec_id = a.nid
        JOIN probes p ON p.qid = a.qid AND p.cell = r.cell
        JOIN nrm nq ON nq.vec_id = a.qid
        JOIN nrm nc ON nc.vec_id = a.nid),
      short AS (
        SELECT qid, nid, approx_sim FROM (
          SELECT qid, nid, approx_sim,
            ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY approx_sim DESC, nid) AS srn
          FROM approx) x
        WHERE srn <= $shortM),
      rer AS (
        SELECT s.qid, s.nid, s.approx_sim,
          ${duckCosine("qe.embedding", "ce.embedding")} AS sim
        FROM short s
        JOIN embeddings qe ON qe.vec_id = s.qid
        JOIN embeddings ce ON ce.vec_id = s.nid)
      SELECT qid, rnk, nid, sim, approx_sim FROM (
        SELECT qid, nid, sim, approx_sim,
          ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk
        FROM rer) r
      WHERE rnk <= $k ORDER BY qid, rnk"""))
  }


  /** L121 — IVF-PQ coupled-knob recall sweep: the l87/l98 pricing
    * discipline on the composed index, over the (nProbe, shortM) ladder
    * `KnobSchedule.ivfPqKnobs` encodes (shortM = 5·nProbe — the coupling
    * that removes the fixed-shortlist dip). ONE shared ADC pass at
    * maxProbe cells; each config ranks its own probed subset; recall =
    * fraction of brute-force top-k pairs in that config's shortlist.
    * The oracle reuses l119's whole fit/encode chain, carries the cell
    * rank through the probe window, and replays the per-config ranks
    * and membership counts. */
  protected val l121 = {
    import PqOracle.{m, ks, subDim, queryMod}
    val (nCells, k) = (16, 3)
    val configs = Seq((2, 10), (4, 20), (8, 40))
    val maxProbe = configs.map(_._1).max
    DeclaredQuery(
      "l121_ivfpq_probe_sweep",
      (s, dir) => Similarity.ivfPqProbeSweep(t(s, dir, "embeddings"),
          configs = configs, k = k, queryMod = queryMod, nCells = nCells,
          coarseIters = 3, m = m, ks = ks, pqIters = 2, dim = 64)
        .orderBy(col("n_probe"), col("short_m")),
      Some(s"""WITH c0 AS (
        SELECT vec_id AS cent_id, list_apply(embedding, x -> CAST(x AS DOUBLE)) AS cent
        FROM embeddings ORDER BY vec_id LIMIT $nCells),
      ${ivfFitIter(1)},
      ${ivfFitIter(2)},
      ${ivfFitIter(3)},
      assigned AS (
        SELECT nid, ce, cell FROM (
          SELECT e.vec_id AS nid, e.embedding AS ce, c.cent_id AS cell,
            ROW_NUMBER() OVER (PARTITION BY e.vec_id
              ORDER BY ${duckCosine("e.embedding", "c.cent")} DESC, c.cent_id) AS rn
          FROM embeddings e CROSS JOIN c3 c) x
        WHERE rn <= 1),
      resid AS (
        SELECT a.nid AS vec_id,
          list_apply(list_zip(a.ce, c.cent),
            x -> CAST(x[1] AS DOUBLE) - x[2]) AS emb,
          a.cell
        FROM assigned a JOIN c3 c ON a.cell = c.cent_id),
      sv AS (
        SELECT vec_id, s.sub, r.emb[(s.sub*$subDim+1):(s.sub*$subDim+$subDim)] AS sv
        FROM resid r CROSS JOIN (SELECT unnest(range($m)) AS sub) s),
      pc0 AS (
        SELECT s.sub, r.vec_id AS cent_id,
          r.emb[(s.sub*$subDim+1):(s.sub*$subDim+$subDim)] AS cent
        FROM (SELECT * FROM resid ORDER BY vec_id LIMIT $ks) r
        CROSS JOIN (SELECT unnest(range($m)) AS sub) s),
      ${ivfPqFitIter(1)},
      ${ivfPqFitIter(2)},
      enc AS (
        SELECT vec_id, sub, cent FROM (
          SELECT v.vec_id, v.sub, c.cent,
            ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.sub
              ORDER BY ${PqOracle.duckL2("v.sv", "c.cent")} ASC, c.cent_id) AS rn
          FROM sv v JOIN pc2 c ON c.sub = v.sub) x
        WHERE rn = 1),
      nrm AS (
        SELECT vec_id,
          sqrt(list_reduce(list_apply(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
            AS nrm
        FROM embeddings),
      probes AS (
        SELECT qid, cell, qcd, rn AS cell_rank FROM (
          SELECT q.vec_id AS qid, c.cent_id AS cell,
            ${PqOracle.duckDot("q.embedding", "c.cent")} AS qcd,
            ROW_NUMBER() OVER (PARTITION BY q.vec_id
              ORDER BY ${duckCosine("q.embedding", "c.cent")} DESC, c.cent_id) AS rn
          FROM embeddings q CROSS JOIN c3 c
          WHERE q.vec_id % $queryMod = 0) x
        WHERE rn <= $maxProbe),
      qsv AS (
        SELECT vec_id, s.sub,
          list_apply(embedding[(s.sub*$subDim+1):(s.sub*$subDim+$subDim)],
                     x -> CAST(x AS DOUBLE)) AS sv
        FROM embeddings CROSS JOIN (SELECT unnest(range($m)) AS sub) s
        WHERE vec_id % $queryMod = 0),
      terms AS (
        SELECT p.qid, r.vec_id AS nid, q.sub,
          ${PqOracle.duckDot("q.sv", "e.cent")} AS term
        FROM probes p
        JOIN resid r ON r.cell = p.cell AND r.vec_id <> p.qid
        JOIN qsv q ON q.vec_id = p.qid
        JOIN enc e ON e.vec_id = r.vec_id AND e.sub = q.sub),
      adc AS (
        SELECT qid, nid,
          list_reduce(list(term ORDER BY sub), (x, y) -> x + y) AS rdp
        FROM terms GROUP BY qid, nid),
      approxr AS (
        SELECT a.qid, a.nid, p.cell_rank,
          (p.qcd + a.rdp) / (nq.nrm * nc.nrm) AS approx_sim
        FROM adc a
        JOIN resid r ON r.vec_id = a.nid
        JOIN probes p ON p.qid = a.qid AND p.cell = r.cell
        JOIN nrm nq ON nq.vec_id = a.qid
        JOIN nrm nc ON nc.vec_id = a.nid),
      cfgs AS (
        SELECT CAST(n_probe AS BIGINT) AS n_probe,
               CAST(short_m AS BIGINT) AS short_m
        FROM (VALUES ${configs.map { case (np, sm) => s"($np, $sm)" }
          .mkString(", ")}) AS t(n_probe, short_m)),
      cand AS (
        SELECT c.n_probe, c.short_m, a.qid, a.nid,
          ROW_NUMBER() OVER (PARTITION BY c.n_probe, c.short_m, a.qid
            ORDER BY a.approx_sim DESC, a.nid) AS srn
        FROM approxr a JOIN cfgs c ON a.cell_rank <= c.n_probe),
      short AS (
        SELECT n_probe, short_m, qid, nid FROM cand WHERE srn <= short_m),
      tq AS (
        SELECT q.vec_id AS qid, c.vec_id AS nid,
          ROW_NUMBER() OVER (PARTITION BY q.vec_id
            ORDER BY ${duckCosine("q.embedding", "c.embedding")} DESC,
              c.vec_id) AS trn
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id % $queryMod = 0),
      grid AS (
        SELECT t.qid, t.nid, c.n_probe, c.short_m
        FROM (SELECT qid, nid FROM tq WHERE trn <= $k) t CROSS JOIN cfgs c)
      SELECT g.n_probe, g.short_m,
        CAST(COUNT(DISTINCT g.qid) AS BIGINT) AS n_queries,
        CAST(COUNT(*) AS BIGINT) AS n_truth,
        CAST(SUM(CASE WHEN s.nid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_hit,
        CAST(SUM(CASE WHEN s.nid IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS recall
      FROM grid g LEFT JOIN short s
        ON s.n_probe = g.n_probe AND s.short_m = g.short_m
        AND s.qid = g.qid AND s.nid = g.nid
      GROUP BY g.n_probe, g.short_m ORDER BY g.n_probe, g.short_m"""))
  }
}
