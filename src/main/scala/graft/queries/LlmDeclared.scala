package graft.queries

import graft.Tables
import graft.llm.{Bpe, Dedup, Multimodal, Retrieval, Similarity, Sketches, TextAnalysis, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The LLM-training-data-pipeline declared queries (L1–L93 + the hex scalar
  * D29): dedup, similarity search, text analysis, multimodal plumbing,
  * splits/sampling/mixture scheduling, coverage and drift audits,
  * sketches/UDAF — each oracle-checked against DuckDB on the same parquet.
  *
  * Cross-engine determinism rules specific to this plane:
  *  - All content hashes are md5 (byte-identical in any engine) — never
  *    engine-internal hash functions.
  *  - Every floating-point similarity is a sequential left fold over
  *    doubles (`aggregate`/`zip_with` in Spark, `list_reduce`/`list_apply`
  *    in DuckDB): same values, same operation order ⇒ bit-identical
  *    doubles on both sides.
  *  - Ratios divide exact integers as doubles (one exact division each).
  *  - ROW_NUMBER ranks cast to BIGINT on the Spark side (DuckDB returns
  *    BIGINT).
  */
object LlmDeclared {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** DuckDB list-comprehension shingle CTE shared by the text oracles:
    * distinct word 3-grams per document. */
  private val shingleCte =
    """t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
      |         range(1, len(w) - 1),
      |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
      |       FROM t)""".stripMargin

  /** DuckDB sequential-fold cosine over two float lists (bit-identical to
    * Spark's zip_with/aggregate fold — same values, same order). */
  private def duckCosine(a: String, b: String): String =
    s"""list_reduce(list_apply(list_zip($a, $b),
       |  x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (x, y) -> x + y)
       |/ (sqrt(list_reduce(list_apply($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
       | * sqrt(list_reduce(list_apply($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)))""".stripMargin

  // ----------------------------------------------------------- dedup plane

  /** L1 — exact dedup (hash-groupBy). The fixture corpus is dup-free by
    * construction, so the query runs over the corpus unioned with a
    * doc_id-shifted copy of itself: every text then has exactly one
    * duplicate and the kept representative is the original (minimum) id. */
  private val l01 = DeclaredQuery(
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
  private val l02 = DeclaredQuery(
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
  private val l03 = {
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
  private val l04 = {
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

  // ------------------------------------------------------ similarity plane

  /** L5 — brute-force cosine top-k (the exact ANN baseline): 8 query
    * vectors against the full corpus. */
  private val l05 = DeclaredQuery(
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
  private val l06 = DeclaredQuery(
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
  private val lshBucketsCte =
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

  private val l14 = DeclaredQuery(
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
  private val l39 = DeclaredQuery(
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

  // ---------------------------------------------------- text-analysis plane

  private def duckList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  /** L7 — language ID by stopword-profile argmax. */
  private val l07 = {
    val langs = TextAnalysis.stopwords.toSeq.sortBy(_._1)
    val scoreCols = langs.map { case (lang, words) =>
      s"CAST(len(list_filter(w, x -> list_contains(${duckList(words)}, x))) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS s_$lang"
    }.mkString(",\n        ")
    val unpivot = langs.map { case (lang, _) =>
      s"SELECT doc_id, '$lang' AS lang, s_$lang AS score FROM scores"
    }.mkString("\n        UNION ALL ")
    DeclaredQuery(
      "l07_lang_id",
      (s, dir) => TextAnalysis.langId(t(s, dir, "documents")).orderBy(col("doc_id")),
      Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      scores AS (SELECT doc_id,
        $scoreCols
        FROM t),
      unp AS (
        $unpivot)
      SELECT doc_id, lang AS pred_lang, score FROM (
        SELECT doc_id, lang, score,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
        FROM unp) r
      WHERE rn = 1 ORDER BY doc_id"""))
  }

  /** L8 — quality metrics (length / punctuation / stopword heuristics). */
  private val l08 = DeclaredQuery(
    "l08_quality",
    (s, dir) => TextAnalysis.quality(t(s, dir, "documents")).orderBy(col("doc_id")),
    Some(s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
      SELECT doc_id,
        CAST(len(w) AS BIGINT) AS n_tok,
        CAST(length(text) - (len(w) - 1) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS mean_tok_len,
        CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
          / CAST(length(text) AS DOUBLE) AS punct_ratio,
        CAST(len(list_filter(w, x -> list_contains(${duckList(TextAnalysis.stopwords("en"))}, x))) AS DOUBLE)
          / CAST(len(w) AS DOUBLE) AS stop_ratio
      FROM t ORDER BY doc_id"""))

  /** L9 — token counting: whitespace and BPE-ish regex tokenizers. */
  private val l09 = DeclaredQuery(
    "l09_token_counts",
    (s, dir) => TextAnalysis.tokenCounts(t(s, dir, "documents")).orderBy(col("doc_id")),
    Some("""SELECT doc_id,
      CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tokens
      FROM documents ORDER BY doc_id"""))

  /** L10 — document fingerprinting by mod-p shingle sampling. */
  private val l10 = DeclaredQuery(
    "l10_fingerprints",
    (s, dir) => TextAnalysis.fingerprints(t(s, dir, "documents")).orderBy(col("doc_id")),
    Some(s"""WITH $shingleCte,
      sel AS (SELECT doc_id, substr(md5(s), 1, 8) AS hx
              FROM sh
              WHERE ('0x' || substr(md5(s), 1, 8))::BIGINT % 8 = 0)
      SELECT doc_id, COUNT(*) AS n_sel,
             md5(string_agg(hx, ',' ORDER BY hx)) AS fp
      FROM sel GROUP BY doc_id ORDER BY doc_id"""))

  /** L17 — ANN top-k via the IVF path (coarse quantizer cells + nProbe
    * probing + exact rerank of cell members) — the index-structured
    * alternative to l06's hash-structured LSH. */
  private val l17 = DeclaredQuery(
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

  /** L15 — deterministic corpus split (stable holdout assignment). */
  private val l15 = DeclaredQuery(
    "l15_stable_split",
    (s, dir) => TextAnalysis.stableSplit(t(s, dir, "documents")).orderBy(col("doc_id")),
    Some("""SELECT doc_id, lang,
      CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 80 THEN 'train'
           WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 90 THEN 'val'
           ELSE 'test' END AS split
      FROM documents ORDER BY doc_id"""))

  /** L16 — near-dup clustering: connected components over the exact
    * jaccard pair graph, every member labeled with its cluster's canonical
    * (minimum) doc_id. Spark side: iterative min-label propagation
    * (Dedup.nearDupClusters); oracle: recursive-CTE transitive closure —
    * two very different algorithms that must agree exactly. */
  private val l16 = DeclaredQuery(
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

  /** L18 — text cleaning/normalization with audit columns. */
  private val l18 = DeclaredQuery(
    "l18_clean_text",
    (s, dir) => TextAnalysis.cleanText(t(s, dir, "documents")).orderBy(col("doc_id")),
    Some("""SELECT doc_id,
      md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS clean_md5,
      CAST(length(text) AS BIGINT) AS raw_len,
      CAST(length(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS BIGINT) AS clean_len
      FROM documents ORDER BY doc_id"""))

  /** L19 — contiguous sequence packing into fixed token budgets. */
  private val l19 = DeclaredQuery(
    "l19_sequence_pack",
    (s, dir) => TextAnalysis.sequencePack(t(s, dir, "documents"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id, n_tok,
      CAST(FLOOR(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000) AS BIGINT) AS pack_id
      FROM (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
            FROM documents)
      ORDER BY doc_id"""))

  // ------------------------------------------------- multimodal + sketches

  /** The DuckDB twin of `Multimodal.encodePpm`'s derivation: per doc, the
    * P6 dimensions (w, h), text length, and header string. Pixel-plane
    * byte k is then `ppmPx` below — the text bytes tiling the raster
    * cyclically ('0' = 48 for empty text). The corpus is printable ASCII
    * (verified), so ascii(substr) = byte and md5-of-string = md5-of-bytes. */
  private val ppmCte =
    """ppm AS (
      SELECT doc_id, text, length(text) AS len,
        1 + CASE WHEN length(text) = 0 THEN 0
              ELSE ascii(substr(text, 1, 1)) END % 16 AS w,
        1 + CASE WHEN length(text) = 0 THEN 0
              ELSE ascii(substr(text, length(text), 1)) END % 16 AS h
      FROM documents)"""

  /** Pixel-plane byte at 0-based index `k` (SQL fragment). */
  private def ppmPx(k: String) =
    s"""CASE WHEN len = 0 THEN 48
        ELSE ascii(substr(text, CAST(($k) % len + 1 AS INTEGER), 1)) END"""

  /** P6 header string for dimensions (`w`, `h`) (SQL fragment). */
  private def ppmHdr(w: String, h: String) =
    s"""'P6' || chr(10) || CAST($w AS VARCHAR) || ' ' || CAST($h AS VARCHAR)
        || chr(10) || '255' || chr(10)"""

  /** L11 — multimodal decode: deterministic P6 PPM payloads through the
    * REAL netpbm parser (`Multimodal.parsePpm` — magic, comments, ASCII
    * decimal fields), features = header dims + exact pixel checksum. The
    * oracle regenerates the same image in SQL and replays the decode. */
  private val l11 = DeclaredQuery(
    "l11_multimodal_decode",
    (s, dir) =>
      Multimodal.decodeFeatures(s,
        Multimodal.encodePpm(s, t(s, dir, "documents")).toDF())
        .toDF().orderBy(col("doc_id")),
    Some(s"""WITH $ppmCte
      SELECT doc_id,
        CAST(length(${ppmHdr("w", "h")}) + w*h*3 AS BIGINT) AS n_bytes,
        CAST(w AS BIGINT) AS width,
        CAST(h AS BIGINT) AS height,
        CAST(list_reduce(list_transform(range(0, w*h*3),
          k -> ${ppmPx("k")}), (x, y) -> x + y) AS BIGINT) AS sum_bytes
      FROM ppm ORDER BY doc_id"""))

  /** L20 — multimodal frame sampling: every scanline of each image as one
    * checksum row — the 1→N table-generating decode shape (video frame
    * extraction), as a typed flatMap over parsed P6 payloads. */
  private val l20 = DeclaredQuery(
    "l20_frame_sample",
    (s, dir) =>
      Multimodal.frameSample(s,
        Multimodal.encodePpm(s, t(s, dir, "documents")).toDF())
        .toDF().orderBy(col("doc_id"), col("frame_idx")),
    Some(s"""WITH $ppmCte,
      f AS (SELECT doc_id, text, len, w, unnest(range(h)) AS frame_idx FROM ppm)
      SELECT doc_id, frame_idx,
        CAST(list_reduce(list_transform(range(0, w*3),
          x -> ${ppmPx("frame_idx * w * 3 + x")}), (a, b) -> a + b)
          AS BIGINT) AS frame_sum
      FROM f ORDER BY doc_id, frame_idx"""))

  /** L12 — per-group profile: exact distinct + exact percentiles (the
    * oracle-checkable twins of the HLL/KLL sketches, which LlmSpec
    * bounds-checks separately). */
  private val l12 = DeclaredQuery(
    "l12_profile",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("exact_users"),
          expr("percentile(value, array(0.25, 0.5, 0.9))").as("pct"))
        .select(col("event_type"), col("exact_users"),
          element_at(col("pct"), 1).as("p25"),
          element_at(col("pct"), 2).as("p50"),
          element_at(col("pct"), 3).as("p90"))
        .orderBy(col("event_type")),
    Some("""SELECT event_type,
      COUNT(DISTINCT user_id) AS exact_users,
      quantile_cont(value, 0.25) AS p25,
      quantile_cont(value, 0.5) AS p50,
      quantile_cont(value, 0.9) AS p90
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** L13 — typed Aggregator UDAF (exact decimal sum-of-squares): the
    * extension surface for custom aggregation, made oracle-checkable by
    * the order-independent decimal buffer. */
  private val l13 = DeclaredQuery(
    "l13_udaf_sumsq",
    (s, dir) => {
      val sumsq = udaf(Sketches.SumSquares)
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(sumsq(col("value")).as("sum_sq"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type,
      CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_sq
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** D29 — hex encoding scalar (operator CDC6: the DMS `noHexPrefix:false`
    * 0x-prefixed binary rendering, as a portable scalar). */
  private val d29 = DeclaredQuery(
    "d29_hex_encode",
    (s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"),
          concat(lit("0x"), hex(col("c_name"))).as("hexname"))
        .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, '0x' || hex(c_name) AS hexname
      FROM customer ORDER BY c_custkey"""))

  // --------------------------------------- corpus statistics (round 4)

  /** L21 — tf-idf top-k terms per document (rational idf N/df — see
    * TextAnalysis.tfidfTopK for why not ln). */
  private val l21 = DeclaredQuery(
    "l21_tfidf_topk",
    (s, dir) => TextAnalysis.tfidfTopK(t(s, dir, "documents"), k = 3)
      .orderBy(col("doc_id"), col("tok")),
    Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents),
      tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY doc_id, tok),
      df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
      n AS (SELECT COUNT(*) AS n_docs FROM documents)
      SELECT doc_id, tok, tf, df, score FROM (
        SELECT doc_id, tok, tf, df, (tf * n_docs) / df AS score,
          ROW_NUMBER() OVER (PARTITION BY doc_id
            ORDER BY (tf * n_docs) / df DESC, tok) AS rn
        FROM tf JOIN df USING (tok) CROSS JOIN n) x
      WHERE rn <= 3 ORDER BY doc_id, tok"""))

  /** L22 — top-100 corpus vocabulary by occurrence count (the tokenizer-
    * training first pass), deterministic tie-break on the token. */
  private val l22 = DeclaredQuery(
    "l22_vocab_topk",
    (s, dir) => TextAnalysis.vocabulary(t(s, dir, "documents"))
      .orderBy(col("n_occ").desc, col("tok")).limit(100),
    Some("""SELECT tok, COUNT(*) AS n_occ, COUNT(DISTINCT doc_id) AS n_docs
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents) x
      GROUP BY tok ORDER BY n_occ DESC, tok LIMIT 100"""))

  /** L23 — per-label embedding centroids, quantized to 1e-6 so the mean is
    * an exact integer sum + one division on both engines (a double avg()
    * would be partition-order-dependent). DuckDB explodes positions via
    * range() + 1-based list indexing. */
  private val l23 = DeclaredQuery(
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

  // --------------------------------- corpus curation (round 4, continued)

  /** L24 — train/eval decontamination: train-split docs sharing any 3-gram
    * with any test-split doc (split = the same md5(doc_id) bucketing as
    * l15, derivable per row with no join). */
  private val l24 = DeclaredQuery(
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

  /** L25 — int8 embedding quantization summary: ⌊x/s + 0.5⌋ codes (the
    * explicit half-up formula — round()'s tie rule is dialect-defined),
    * sequential-fold reconstruction error. */
  private val l25 = DeclaredQuery(
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

  /** L26 — hash-threshold stratified sampling (no shuffle, no window):
    * keep iff md5(lang:doc_id) mod 1000 under the stratum's permille rate
    * (en 150‰ down, zh 500‰ up, 250‰ default). */
  private val l26 = DeclaredQuery(
    "l26_stratified_sample",
    (s, dir) => TextAnalysis.stratifiedSample(t(s, dir, "documents"),
      rates = Map("en" -> 150, "zh" -> 500), defaultRate = 250)
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id, lang,
        ('0x' || substr(md5(lang || ':' || doc_id::VARCHAR), 1, 8))::BIGINT
          % 1000 AS bucket
      FROM documents
      WHERE ('0x' || substr(md5(lang || ':' || doc_id::VARCHAR), 1, 8))::BIGINT
          % 1000 < CASE lang WHEN 'en' THEN 150 WHEN 'zh' THEN 500 ELSE 250 END
      ORDER BY doc_id"""))

  /** L27 — directional containment pairs |A∩B|/|A| (catches short docs
    * embedded in long ones, where symmetric Jaccard stays low). */
  private val l27 = DeclaredQuery(
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

  /** L28 — domain mixing weights: per-source token share and the uniform-
    * target resampling weight (exact integer counts, one final double
    * division). */
  private val l28 = DeclaredQuery(
    "l28_domain_mix",
    (s, dir) => TextAnalysis.domainMix(t(s, dir, "documents"))
      .orderBy(col("source")),
    Some("""WITH per AS (SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source),
      tot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS tot_tokens,
                COUNT(*) AS n_sources FROM per)
      SELECT source, n_docs, n_tokens,
        tot_tokens / (n_sources * n_tokens) AS weight
      FROM per CROSS JOIN tot ORDER BY source"""))

  /** L29 — within-doc repetition ratio (the boilerplate/degenerate-text
    * quality filter): 1 − distinct/total 3-gram positions. */
  private val l29 = DeclaredQuery(
    "l29_repetition",
    (s, dir) => TextAnalysis.repetition(t(s, dir, "documents"), n = 3)
      .orderBy(col("doc_id")),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      r AS (SELECT doc_id,
              CAST(greatest(len(w) - 2, 0) AS BIGINT) AS n_shingles,
              CAST(len(list_distinct(list_transform(range(1, len(w) - 1),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS BIGINT)
                AS n_distinct
            FROM t)
      SELECT doc_id, n_shingles, n_distinct,
        CASE WHEN n_shingles > 0
          THEN CAST(1 AS DOUBLE) - CAST(n_distinct AS DOUBLE)
               / CAST(n_shingles AS DOUBLE)
          ELSE CAST(0 AS DOUBLE) END AS rep_ratio
      FROM r ORDER BY doc_id"""))

  /** L30 — end-to-end dedup materialization: pair generation → clustering
    * → survivor anti-join, returning the clean corpus (the composition a
    * pipeline user actually runs). Oracle: the l16 recursive-CTE closure
    * plus an ANTI JOIN of the non-canonical members. */
  private val l30 = DeclaredQuery(
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

  /** L31 — corpus-frequent-shingle boilerplate scoring: the cross-document
    * dual of l29's within-document repetition. The hot cut is RELATIVE
    * (df > 1% of corpus size, via a scalar-subquery count on the oracle
    * side), so the operator means the same thing at every scale. */
  private val l31 = DeclaredQuery(
    "l31_boilerplate",
    (s, dir) => TextAnalysis.boilerplateStrip(t(s, dir, "documents"),
      n = 3, permille = 10).orderBy(col("doc_id")),
    Some(s"""WITH $shingleCte,
      df AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s),
      hot AS (SELECT s FROM df
              WHERE df * 1000 > (SELECT COUNT(*) FROM documents) * 10)
      SELECT doc_id, COUNT(*) AS n_sh,
        COUNT(*) FILTER (WHERE s IN (SELECT s FROM hot)) AS n_boiler,
        CAST(COUNT(*) FILTER (WHERE s IN (SELECT s FROM hot)) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS boiler_ratio
      FROM sh GROUP BY doc_id ORDER BY doc_id"""))

  /** L32 — the curation funnel: cumulative survivor counts through the
    * length → tokens → repetition → stopword gates, one row per gate.
    * Every predicate is integer-exact (cross-multiplied ratios), so the
    * counts agree across engines with no float boundary cases. */
  private val l32 = DeclaredQuery(
    "l32_curation_funnel",
    (s, dir) => TextAnalysis.curationFunnel(t(s, dir, "documents"))
      .orderBy(col("stage")),
    Some("""WITH f AS (
        SELECT n_chars BETWEEN 200 AND 2000 AS g1,
               len(w) >= 40 AS g2,
               (len(w) - 2 <= 0 OR
                len(list_distinct(list_transform(range(1, len(w) - 1),
                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) * 100
                  >= (len(w) - 2) * 99) AS g3,
               len(list_filter(w, x -> x IN
                 ('the','a','of','and','to','in','is','it'))) * 20
                 >= len(w) AS g4
        FROM (SELECT n_chars, string_split(text, ' ') AS w FROM documents)),
      c AS (SELECT COUNT(*) AS c0,
              COUNT(*) FILTER (WHERE g1) AS c1,
              COUNT(*) FILTER (WHERE g1 AND g2) AS c2,
              COUNT(*) FILTER (WHERE g1 AND g2 AND g3) AS c3,
              COUNT(*) FILTER (WHERE g1 AND g2 AND g3 AND g4) AS c4
            FROM f)
      SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS stage, 'length' AS gate,
               c0 AS n_in, c1 AS n_out, c0 - c1 AS dropped FROM c
        UNION ALL SELECT 2, 'tokens',     c1, c2, c1 - c2 FROM c
        UNION ALL SELECT 3, 'repetition', c2, c3, c2 - c3 FROM c
        UNION ALL SELECT 4, 'stopwords',  c3, c4, c3 - c4 FROM c)
      ORDER BY stage"""))

  /** L33 — Bloom-prefiltered decontamination: the l24 exact join behind a
    * deterministic (md5-positioned) Bloom filter built from the eval
    * shingle set. The oracle recomputes the SAME filter in SQL, so even
    * the false-positive counts must agree bit-for-bit — the pruning is
    * verified, not just the final answer. */
  private val l33 = DeclaredQuery(
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

  /** L34 — count-min-sketch heavy hitters vs the exact twin. The sketch is
    * md5-positioned (not engine-internal Murmur3), so the oracle rebuilds
    * the SAME counter tables and the estimates — including every collision
    * — agree bit-for-bit. est ≥ n by construction; the gap is the sketch's
    * collision error at (d=2, m=1024). */
  private val l34 = DeclaredQuery(
    "l34_cms_heavy_hitters",
    (s, dir) => Sketches.cmsHeavyHitters(t(s, dir, "documents"))
      .orderBy(col("n").desc, col("tok")),
    Some("""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok
                         FROM documents),
      exact AS (SELECT tok, COUNT(*) AS n FROM tok GROUP BY tok),
      h AS (SELECT tok, n,
              ('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS p0,
              ('0x' || substr(md5(tok), 9, 8))::BIGINT % 1024 AS p1
            FROM exact),
      s0 AS (SELECT p0 AS p, CAST(SUM(n) AS BIGINT) AS c FROM h GROUP BY p0),
      s1 AS (SELECT p1 AS p, CAST(SUM(n) AS BIGINT) AS c FROM h GROUP BY p1),
      top AS (SELECT tok, n, p0, p1 FROM h ORDER BY n DESC, tok LIMIT 20)
      SELECT t.tok, t.n, least(s0.c, s1.c) AS est
      FROM top t JOIN s0 ON t.p0 = s0.p JOIN s1 ON t.p1 = s1.p
      ORDER BY n DESC, tok"""))

  /** L35 — overlapping token-window chunking (64-token windows, stride 48).
    * Chunk content crosses engines as md5 digests; the generator fan-out
    * is per-row, no shuffle. */
  private val l35 = DeclaredQuery(
    "l35_chunking",
    (s, dir) => TextAnalysis.chunk(t(s, dir, "documents"))
      .orderBy(col("doc_id"), col("chunk_id")),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      c AS (SELECT doc_id, len(w) AS n_tok, w,
              unnest(range(0, len(w), 48)) AS st
            FROM t)
      SELECT doc_id, CAST(st / 48 AS BIGINT) AS chunk_id,
        CAST(least(64, n_tok - st) AS BIGINT) AS n_chunk_tok,
        md5(array_to_string(w[st+1:st+64], ' ')) AS chunk_md5
      FROM c ORDER BY doc_id, chunk_id"""))

  /** L36 — exact-k per-stratum sampling by salted md5 rank (eval-set
    * construction): exactly 10 docs per language, identical selection on
    * any engine, any partition layout. */
  private val l36 = DeclaredQuery(
    "l36_eval_sample",
    (s, dir) => TextAnalysis.perStratumSample(t(s, dir, "documents"),
      stratumCol = "lang", k = 10).orderBy(col("stratum"), col("rank")),
    Some("""SELECT doc_id, stratum, rank FROM (
        SELECT doc_id, lang AS stratum,
          CAST(ROW_NUMBER() OVER (PARTITION BY lang
            ORDER BY md5(lang || ':' || CAST(doc_id AS VARCHAR)), doc_id)
            AS BIGINT) AS rank
        FROM documents) x
      WHERE rank <= 10 ORDER BY stratum, rank"""))

  /** One Lloyd iteration as a DuckDB CTE pair: assign every vector to its
    * max-cosine centroid from `c${i-1}` (ties by cent_id, exactly the
    * Spark window), then recompute each centroid per dimension with the
    * l23 quantized-mean discipline — round(x·10⁶) summed in integers,
    * divided once — so the replayed centroids are bit-identical to
    * `fitCentroids(quantum = Some(1000000L))` regardless of either
    * engine's aggregation order. */
  private def ivfFitIter(i: Int): String =
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
  private val l37 = DeclaredQuery(
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

  /** L38 — PII redaction with audit counts. The fixture corpus is PII-free
    * word salad by construction, so (the l01 precedent) the query plants
    * one email, one phone and one long account id per document,
    * deterministically from doc_id, then redacts — the oracle replays the
    * same augmentation and the same RE2-safe patterns. */
  private val l38 = DeclaredQuery(
    "l38_pii_redaction",
    (s, dir) => {
      val planted = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit(" contact u"), col("doc_id"), lit("@mail.example.com call 555-"),
          lpad(pmod(col("doc_id"), lit(1000)).cast(StringType), 3, "0"),
          lit("-0199 acct 9"),
          lpad(col("doc_id").cast(StringType), 8, "0")).as("text"))
      TextAnalysis.redactPii(planted).orderBy(col("doc_id"))
    },
    Some(s"""WITH aug AS (
        SELECT doc_id,
          text || ' contact u' || doc_id || '@mail.example.com call 555-' ||
            lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-0199 acct 9' ||
            lpad(doc_id::VARCHAR, 8, '0') AS text
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(text, '${TextAnalysis.EmailRe}')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(text, '${TextAnalysis.PhoneRe}')) AS BIGINT) AS n_phones,
        CAST(len(regexp_extract_all(text, '${TextAnalysis.LongIdRe}')) AS BIGINT) AS n_ids,
        md5(regexp_replace(regexp_replace(regexp_replace(text,
          '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
          '${TextAnalysis.PhoneRe}', '<PHONE>', 'g'),
          '${TextAnalysis.LongIdRe}', '<ID>', 'g')) AS redacted_md5
      FROM aug ORDER BY doc_id"""))

  /** L40 — semantic decontamination: the embedding analog of l24 (n-gram
    * decontamination) — train-split vectors within cosine 0.3 of any
    * eval-split vector, with hit counts and the worst similarity. Split
    * derives per row (md5(vec_id) buckets, the l15 discipline); candidates
    * from the same LSH bucket join as l14/l39. */
  private val l40 = DeclaredQuery(
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

  /** L41 — multimodal FEATURE-EXTRACT: per-CHANNEL pixel statistics over
    * the parsed P6 raster (the embedding-extractor stand-in; same
    * mapPartitions plumbing as l11's decode). mean_px = exact long sum /
    * one division, so it is aggregation-order independent. */
  private val l41 = DeclaredQuery(
    "l41_multimodal_features",
    (s, dir) =>
      Multimodal.featureExtract(s,
        Multimodal.encodePpm(s, t(s, dir, "documents")).toDF())
        .toDF().orderBy(col("doc_id")),
    Some(s"""WITH $ppmCte,
      px AS (SELECT doc_id, w, h,
        list_transform(range(0, w*h*3), k -> ${ppmPx("k")}) AS bs,
        list_reduce(list_transform(range(0, w*h),
          i -> ${ppmPx("3*i")}), (x, y) -> x + y) AS r_sum,
        list_reduce(list_transform(range(0, w*h),
          i -> ${ppmPx("3*i + 1")}), (x, y) -> x + y) AS g_sum,
        list_reduce(list_transform(range(0, w*h),
          i -> ${ppmPx("3*i + 2")}), (x, y) -> x + y) AS b_sum
        FROM ppm)
      SELECT doc_id,
        CAST(w*h AS BIGINT) AS n_px,
        CAST(r_sum AS BIGINT) AS r_sum,
        CAST(g_sum AS BIGINT) AS g_sum,
        CAST(b_sum AS BIGINT) AS b_sum,
        CAST(list_min(bs) AS BIGINT) AS px_min,
        CAST(list_max(bs) AS BIGINT) AS px_max,
        CAST(r_sum + g_sum + b_sum AS DOUBLE) / (3 * w * h) AS mean_px
      FROM px ORDER BY doc_id"""))

  /** L42 — multimodal RESIZE: true 2-D nearest-neighbor ÷2 downsample on
    * the parsed raster, re-encoded as VALID P6 (payload → payload),
    * audited by before/after sizes and the resized digest. The corpus is
    * printable ASCII (verified) and the P6 header is ASCII, so DuckDB's
    * md5-of-string hashes the same bytes Spark's md5-of-binary does. */
  private val l42 = DeclaredQuery(
    "l42_multimodal_resize",
    (s, dir) => {
      val blobs = Multimodal.encodePpm(s, t(s, dir, "documents")).toDF()
      val orig = blobs.select(col("doc_id"),
        length(col("payload")).cast(LongType).as("orig_bytes"))
      Multimodal.resize(s, blobs, factor = 2).toDF()
        .select(col("doc_id"),
          length(col("payload")).cast(LongType).as("resized_bytes"),
          md5(col("payload")).as("resized_md5"))
        .join(orig, "doc_id")
        .select(col("doc_id"), col("orig_bytes"), col("resized_bytes"),
          col("resized_md5"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH $ppmCte,
      d AS (SELECT doc_id, text, len, w, h,
              (w + 1) // 2 AS w2, (h + 1) // 2 AS h2 FROM ppm)
      SELECT doc_id,
        CAST(length(${ppmHdr("w", "h")}) + w*h*3 AS BIGINT) AS orig_bytes,
        CAST(length(${ppmHdr("w2", "h2")}) + w2*h2*3 AS BIGINT) AS resized_bytes,
        md5(${ppmHdr("w2", "h2")} ||
          array_to_string(list_transform(range(0, w2*h2*3), k ->
            CASE WHEN len = 0 THEN '0' ELSE substr(text,
              CAST((((k // (w2*3)) * 2 * w + ((k % (w2*3)) // 3) * 2) * 3
                + k % 3) % len + 1 AS INTEGER), 1) END), '')) AS resized_md5
      FROM d ORDER BY doc_id"""))

  /** L43 — MinHash estimator audit: per band-candidate pair, the
    * signature-agreement estimate next to the exact Jaccard and the signed
    * error — the (k, bands) tuning measurement. Reuses l03's signature /
    * banding arithmetic; the exact side LEFT-joins shared-shingle counts so
    * hash-collision candidates surface as j_exact = 0 instead of
    * vanishing. */
  private val l43 = {
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

  /** L44 — embedding-LSH recall audit (the l43 estimator audit's embedding
    * twin, VERDICT r8 item 3): for each (planes, tables) config, the
    * fraction of exact cosine-threshold neighbor pairs the bucket-equality
    * join would have surfaced. Ground truth is a 5% deterministic query
    * sample (vec_id ≡ 0 mod 20) exact-paired against the corpus — broadcast
    * sample × one corpus pass, never all-pairs. The oracle replays the
    * md5-derived planes for all 64 plane indices (8 tables × 8 planes) and
    * derives every config's buckets from one per-(vector, plane) sign
    * table. */
  private val l44 = DeclaredQuery(
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

  /** L45 — deterministic corpus shuffle + sharding (the reproducible
    * data-ordering step between curation and packing): stable md5 shuffle
    * key per doc, shard = leading 32 key bits mod nShards, position =
    * rank within shard. Pure projection + one per-shard sort; identical
    * output on any engine/layout/run. */
  private val l45 = DeclaredQuery(
    "l45_shard_shuffle",
    (s, dir) => TextAnalysis.shardShuffle(t(s, dir, "documents"))
      .orderBy(col("shard"), col("pos")),
    Some("""WITH keyed AS (
      SELECT doc_id, md5('graft:' || doc_id::VARCHAR) AS k FROM documents),
      sharded AS (
        SELECT doc_id, ('0x' || substr(k, 1, 8))::BIGINT % 8 AS shard, k
        FROM keyed)
      SELECT doc_id, shard,
             ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, doc_id) AS pos
      FROM sharded ORDER BY shard, pos"""))

  /** L46 — per-document duplicated-shingle fraction (corpus-level substring
    * duplication profile). Both engines hash shingles to md5 digests before
    * any shuffle/join, so document frequency is counted over identical
    * keys; dup_frac is the same two-long division on both sides. */
  private val l46 = DeclaredQuery(
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

  /** L47 — per-language length-distribution audit: exact quartiles of
    * n_chars. Dyadic fractions (see TextAnalysis.lengthPercentiles) make
    * Spark `percentile` and DuckDB `quantile_cont` bit-identical on the
    * integer column. */
  private val l47 = DeclaredQuery(
    "l47_length_percentiles",
    (s, dir) => TextAnalysis.lengthPercentiles(t(s, dir, "documents"))
      .orderBy(col("lang")),
    Some("""SELECT lang,
             COUNT(*) AS n_docs,
             MIN(n_chars) AS min_chars,
             quantile_cont(n_chars, 0.25) AS p25_chars,
             quantile_cont(n_chars, 0.50) AS p50_chars,
             quantile_cont(n_chars, 0.75) AS p75_chars,
             MAX(n_chars) AS max_chars
      FROM documents
      GROUP BY lang
      ORDER BY lang"""))

  /** L48 — int8-quantized ANN with exact rerank. The approximate score is
    * an exact-integer code dot times doubles in a fixed association order,
    * so shortlist membership — and therefore the reranked output — is
    * bit-reproducible in DuckDB (codes share l25's portable rounding). */
  /** Shared by l48 and l48b: the two Spark plans differ ONLY in the coarse
    * pass's code representation (array<long> vs packed binary) — the codes,
    * the integer dot, the shortlist, and the rerank are value-identical, so
    * one oracle covers both. */
  private val l48OracleSql: String = {
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

  private val l48 = DeclaredQuery(
    "l48_int8_rerank",
    (s, dir) => Similarity.int8RerankTopK(t(s, dir, "embeddings"))
      .orderBy(col("qid"), col("rank")),
    Some(l48OracleSql))

  /** L48b — l48 with the coarse-pass codes BYTE-PACKED into `binary`
    * (`int8_pack` / `int8_packed_dot` native expressions): 1 B per code
    * instead of array<long>'s 8 B + offsets — the scan/broadcast-bandwidth
    * form the int8 rerank exists for. Value-identical to l48 (same codes,
    * same integer dot, same shortlist), hence the shared oracle. */
  private val l48b = DeclaredQuery(
    "l48b_int8_rerank_packed",
    (s, dir) => Similarity.int8RerankTopKPacked(t(s, dir, "embeddings"))
      .orderBy(col("qid"), col("rank")),
    Some(l48OracleSql))

  /** L49 — cross-source contamination matrix: shared distinct 3-gram
    * shingles per source pair with containments and Jaccard. Shingles are
    * md5-hashed before any shuffle on both engines; divisions are the same
    * two-integer arithmetic. */
  private val l49 = DeclaredQuery(
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
  private val l50 = DeclaredQuery(
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

  /** L51 — bigram fluency: per-doc mean corpus frequency of its token
    * bigrams + corpus-hapax fraction (the exact-integer stand-in for the
    * CCNet LM-perplexity quality filter; a log-prob formulation would
    * hang the oracle on cross-libm ulp differences). The bigram key is
    * the md5-int32 hash grid (the l102 convention) — the Spark side
    * computes it with the native positional_gram_hashes(toks, 2), and
    * the oracle replays the identical 32-bit values, so any hash
    * collision folds the same two bigrams in both engines. */
  private val l51 = DeclaredQuery(
    "l51_bigram_fluency",
    (s, dir) => TextAnalysis.bigramFluency(t(s, dir, "documents"))
      .orderBy(col("doc_id")),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      b AS (SELECT doc_id,
              ('0x' || substr(md5(toks[CAST(i+1 AS INTEGER)] || ' '
                || toks[CAST(i+2 AS INTEGER)]), 1, 8))::BIGINT AS bg
            FROM (SELECT doc_id, toks, unnest(range(len(toks) - 1)) AS i
                  FROM t WHERE len(toks) >= 2)),
      c AS (SELECT bg, COUNT(*) AS cnt FROM b GROUP BY bg),
      agg AS (SELECT doc_id, COUNT(*) AS n_bigrams, SUM(cnt) AS c_sum,
                SUM(CASE WHEN cnt <= 1 THEN 1 ELSE 0 END) AS n_rare
              FROM b JOIN c USING (bg) GROUP BY doc_id)
      SELECT t.doc_id,
        CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
        COALESCE(CAST(c_sum AS DOUBLE) / n_bigrams, 0.0) AS mean_count,
        COALESCE(CAST(n_rare AS DOUBLE) / n_bigrams, 0.0) AS rare_frac
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
  private val l52 = {
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
  private val l53 = DeclaredQuery(
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
  private val l54 = DeclaredQuery(
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

  /** L55 — token-budget mixture sampling: per source, admit docs in
    * stable md5(doc_id) order until cumulative tokens reach the budget
    * (first doc to cross the line kept — bounded overshoot). The salted
    * prefix-sum form; 800 tokens/source is non-trivial at sf0.01 (~60%
    * kept) and sf0.1 (~6%) alike. */
  private val l55 = DeclaredQuery(
    "l55_token_budget_sample",
    (s, dir) => TextAnalysis.tokenBudgetSample(
        t(s, dir, "documents"), budget = 800L)
      .orderBy(col("doc_id")),
    Some("""WITH d AS (SELECT doc_id, source,
              COALESCE(CAST(len(string_split(text, ' ')) AS BIGINT), 0) AS n_tokens,
              md5(doc_id::VARCHAR) AS h FROM documents),
      c AS (SELECT doc_id, source, n_tokens,
              COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY h
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
            FROM d)
      SELECT doc_id, source, n_tokens FROM c
      WHERE before < 800 ORDER BY doc_id"""))

  /** L56 — BPE tokenizer-training statistics: corpus-weighted adjacent
    * symbol-pair counts over the character-split vocabulary (the exact
    * round-1 statistics of Sennrich-style BPE training; `Bpe.train` runs
    * the full merge loop on the same primitive). The corpus is touched
    * once (word hash-agg); pair counting is vocab-table work. */
  private val l56 = DeclaredQuery(
    "l56_bpe_pair_counts",
    (s, dir) => Bpe.pairCounts(Bpe.wordSymbols(t(s, dir, "documents")))
      .orderBy(col("l"), col("r")),
    Some("""WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
              FROM documents),
      v AS (SELECT word, COUNT(*) AS freq FROM w
            WHERE len(word) > 0 GROUP BY word),
      p AS (SELECT freq, string_split(word, '') AS cs FROM v),
      e AS (SELECT freq, unnest(list_transform(range(1, len(cs)),
              i -> cs[i] || chr(1) || cs[i+1])) AS pr FROM p)
      SELECT string_split(pr, chr(1))[1] AS l,
             string_split(pr, chr(1))[2] AS r,
             CAST(SUM(freq) AS BIGINT) AS pair_count
      FROM e GROUP BY 1, 2 ORDER BY l, r"""))

  /** L57 — temperature-weighted mixture sampling: per-source budgets
    * computed from the corpus at α = 1/2 (√-share of tokens — the
    * standard rebalancing curve), then the salted prefix-sum admission.
    * sqrt is IEEE-correctly-rounded and the √-sum folds sequentially in
    * source order, so the double budgets hash identically cross-engine. */
  private val l57 = DeclaredQuery(
    "l57_temperature_sample",
    (s, dir) => TextAnalysis.temperatureBudgetSample(
        t(s, dir, "documents"), totalBudget = 4000L)
      .orderBy(col("doc_id")),
    Some("""WITH d AS (SELECT doc_id, source,
              COALESCE(CAST(len(string_split(text, ' ')) AS BIGINT), 0) AS n_tokens,
              md5(doc_id::VARCHAR) AS h FROM documents),
      ps AS (SELECT source, sqrt(CAST(SUM(n_tokens) AS DOUBLE)) AS w
             FROM d GROUP BY source),
      tot AS (SELECT list_reduce(list(w ORDER BY source NULLS FIRST),
                (a, b) -> a + b) AS tw FROM ps),
      b AS (SELECT source, 4000.0 * w / tw AS budget
            FROM ps CROSS JOIN tot),
      c AS (SELECT doc_id, source, n_tokens,
              COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY h
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
            FROM d)
      SELECT c.doc_id, c.source, c.n_tokens FROM c
      JOIN b ON c.source IS NOT DISTINCT FROM b.source
      WHERE before < budget ORDER BY doc_id"""))

  /** L58 — leakage-safe cluster-aware split: the l15 split bucket hashed
    * on the near-dup CLUSTER id (l16's components over the exact jaccard
    * pair graph), so near-duplicate documents can never straddle the
    * train/eval boundary. Oracle: the l16 recursive-CTE closure feeding
    * the l15 CASE on the cluster key. */
  private val l58 = DeclaredQuery(
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

  /** L59 — train-vocabulary OOV-rate audit: vocabulary = top-500 token
    * bigrams by TRAIN-split frequency (freq desc, bigram asc — a
    * deterministic cut), then per (split, source) the fraction of bigram
    * occurrences outside it. The val/test numbers are the coverage a
    * train-fixed tokenizer actually achieves on held-out data. */
  private val l59 = DeclaredQuery(
    "l59_oov_rate",
    (s, dir) => TextAnalysis.oovRateAudit(t(s, dir, "documents"))
      .orderBy(col("split"), col("source")),
    Some("""WITH d AS (SELECT
        CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 80 THEN 'train'
             WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 90 THEN 'val'
             ELSE 'test' END AS split,
        source, string_split(text, ' ') AS w FROM documents),
      bg AS (SELECT split, source,
               unnest(list_transform(range(1, len(w)),
                 i -> w[i] || ' ' || w[i+1])) AS b
             FROM d WHERE len(w) >= 2),
      cell AS (SELECT split, source, b, COUNT(*) AS cnt
               FROM bg GROUP BY split, source, b),
      vocab AS (SELECT b FROM (
        SELECT b, SUM(cnt) AS freq FROM cell WHERE split = 'train'
        GROUP BY b ORDER BY freq DESC, b LIMIT 500)),
      flags AS (SELECT c.split, c.source, c.cnt,
                  CASE WHEN v.b IS NULL THEN c.cnt ELSE 0 END AS oov
                FROM cell c LEFT JOIN vocab v USING (b))
      SELECT split, source,
        CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
        CAST(SUM(oov) AS BIGINT) AS n_oov,
        CAST(SUM(oov) AS DOUBLE) / SUM(cnt) AS oov_rate
      FROM flags GROUP BY split, source
      ORDER BY split NULLS FIRST, source NULLS FIRST"""))

  /** L60 — centroid-similarity outlier audit: every vector's cosine to
    * its own label's exact quantized centroid (l23), vectors below 0
    * flagged — the mislabeled/noisy-embedding filter. The centroid is an
    * exact rational on both engines and the cosine is the shared
    * sequential fold, so the doubles hash identically. */
  private val l60 = DeclaredQuery(
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
  private val l76 = DeclaredQuery(
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

  /** L61 — sequence-pack efficiency audit: per l19 pack, doc count,
    * exact token total, and fill rate vs the 2000-token budget (the
    * padding-waste table; fill > 1 = boundary straddle). */
  private val l61 = DeclaredQuery(
    "l61_pack_efficiency",
    (s, dir) => TextAnalysis.packEfficiency(t(s, dir, "documents"))
      .orderBy(col("pack_id")),
    Some("""WITH p AS (SELECT doc_id, n_tok,
        CAST(FLOOR(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000) AS BIGINT) AS pack_id
        FROM (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
              FROM documents))
      SELECT pack_id, COUNT(*) AS n_docs,
        CAST(SUM(n_tok) AS BIGINT) AS pack_tokens,
        CAST(SUM(n_tok) AS DOUBLE) / 2000.0 AS fill_rate
      FROM p GROUP BY pack_id ORDER BY pack_id"""))

  /** L62 — deterministic interleaved mixture order: each source's docs
    * take schedule positions rank/√tokens (stable md5 rank within the
    * source, l57's α = 1/2 weights), ascending order_key = the global
    * training order. The salted-rank equivalence (bucket-major md5 order
    * IS global md5 order) is l55's argument; the oracle uses the
    * straight-line per-source ROW_NUMBER. */
  private val l62 = DeclaredQuery(
    "l62_mixture_order",
    (s, dir) => TextAnalysis.mixtureOrder(t(s, dir, "documents"))
      .orderBy(col("order_key"), col("source"), col("doc_id")),
    Some("""WITH d AS (SELECT doc_id, source,
        COALESCE(CAST(len(string_split(text, ' ')) AS BIGINT), 0) AS n_tokens,
        md5(doc_id::VARCHAR) AS h FROM documents),
      ps AS (SELECT source, sqrt(CAST(SUM(n_tokens) AS DOUBLE)) AS w
             FROM d GROUP BY source),
      r AS (SELECT doc_id, source,
              ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rank_in_source
            FROM d)
      SELECT r.doc_id, r.source AS source, rank_in_source,
             CAST(rank_in_source AS DOUBLE) / w AS order_key
      FROM r JOIN ps ON r.source IS NOT DISTINCT FROM ps.source
      ORDER BY order_key, r.source NULLS FIRST, doc_id"""))

  /** L63 — per-source vocabulary drift: χ² distance of each source's
    * word distribution from the corpus distribution over the full corpus
    * word domain (zero cells included). Exact integer divisions per
    * term, sequential word-order fold — cross-engine identical doubles
    * (chi-square, not KL, precisely because log is not correctly
    * rounded across libms). */
  private val l63 = DeclaredQuery(
    "l63_vocab_drift",
    (s, dir) => TextAnalysis.vocabDrift(t(s, dir, "documents"))
      .orderBy(col("source")),
    Some("""WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS word
              FROM documents),
      sw AS (SELECT source, word, COUNT(*) AS cnt FROM w
             WHERE len(word) > 0 GROUP BY source, word),
      wc AS (SELECT word, SUM(cnt) AS wc FROM sw GROUP BY word),
      tc AS (SELECT SUM(wc) AS tc FROM wc),
      wp AS (SELECT word, CAST(wc AS DOUBLE) / CAST(tc AS DOUBLE) AS p
             FROM wc CROSS JOIN tc),
      st AS (SELECT source, SUM(cnt) AS st FROM sw GROUP BY source),
      grid AS (SELECT st.source, st.st, wp.word, wp.p,
                 COALESCE(sw.cnt, 0) AS cnt
               FROM st CROSS JOIN wp
               LEFT JOIN sw ON sw.source IS NOT DISTINCT FROM st.source
                           AND sw.word = wp.word),
      terms AS (SELECT source, st, word,
                  (CAST(cnt AS DOUBLE) / CAST(st AS DOUBLE) - p)
                  * (CAST(cnt AS DOUBLE) / CAST(st AS DOUBLE) - p) / p AS term
                FROM grid)
      SELECT source, CAST(st AS BIGINT) AS n_tokens,
        list_reduce(list(term ORDER BY word), (a, b) -> a + b) AS chi2
      FROM terms GROUP BY source, st
      ORDER BY source NULLS FIRST"""))

  /** L64 — quality-threshold sensitivity sweep: per source, the pass
    * count/fraction at nine stopword-ratio cutoffs (k/50). Oracle
    * unpivots via a 9-way UNION ALL over one conditional aggregate. */
  private val l64 = DeclaredQuery(
    "l64_quality_sweep",
    (s, dir) => TextAnalysis.qualityThresholdSweep(t(s, dir, "documents"))
      .orderBy(col("source"), col("threshold")),
    Some {
      val stoplist = duckList(TextAnalysis.stopwords("en"))
      val sums = (1 to 9).map(k =>
        s"SUM(CASE WHEN sr >= CAST($k AS DOUBLE)/50 THEN 1 ELSE 0 END) AS p$k")
        .mkString(", ")
      val arms = (1 to 9).map(k =>
        s"""SELECT source, CAST($k AS DOUBLE)/50 AS threshold,
              n_docs, CAST(p$k AS BIGINT) AS n_pass,
              CAST(p$k AS DOUBLE)/n_docs AS pass_frac FROM g""")
        .mkString("\nUNION ALL ")
      s"""WITH q AS (SELECT source,
            CAST(len(list_filter(w, x -> list_contains($stoplist, x))) AS DOUBLE)
              / CAST(len(w) AS DOUBLE) AS sr
          FROM (SELECT source, string_split(text, ' ') AS w FROM documents)),
        g AS (SELECT source, COUNT(*) AS n_docs, $sums
              FROM q GROUP BY source)
        $arms
        ORDER BY source NULLS FIRST, threshold"""
    })

  /** L65 — dedup-threshold sensitivity sweep: the jaccard decile
    * histogram over every shingle-sharing pair with cumulative at-or-
    * above counts — the pair volume a dedup run at each threshold would
    * process. */
  private val l65 = DeclaredQuery(
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
  private val l66 = DeclaredQuery(
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

  /** L67 — hashed-n-gram importance weights (DSIR-style domain-matched
    * selection, Xie et al. 2023): score every document by the ratio of
    * its smoothed mean feature likelihood under the TARGET domain model
    * (here lang = 'en' — "select documents that look like the English
    * reference corpus") vs the corpus background model, over B = 256
    * md5-hashed token-bigram buckets. Integer bucket sums + exactly
    * three correctly-rounded double divisions — no log (the l51/l63
    * cross-libm rule), so the oracle reproduces every bit. */
  private val l67OracleSql = """WITH t AS (SELECT doc_id, source, lang,
              string_split(text, ' ') AS toks FROM documents),
      occ AS (SELECT doc_id, (lang = 'en') AS tgt,
               ('0x' || substr(md5(toks[CAST(i+1 AS INTEGER)] || ' ' ||
                  toks[CAST(i+2 AS INTEGER)]), 1, 8))::BIGINT % 256 AS bucket
              FROM (SELECT doc_id, lang, toks, unnest(range(len(toks) - 1)) AS i
                    FROM t WHERE len(toks) >= 2)),
      bs AS (SELECT bucket, COUNT(*) AS n_s,
               SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS n_t
             FROM occ GROUP BY bucket),
      tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS ns_tot,
               CAST(SUM(n_t) AS BIGINT) AS nt_tot FROM bs),
      db AS (SELECT doc_id, bucket, COUNT(*) AS c FROM occ
             GROUP BY doc_id, bucket),
      sc AS (SELECT doc_id,
               CAST(SUM(c * (n_t + 1)) AS BIGINT) AS num,
               CAST(SUM(c * (n_s + 1)) AS BIGINT) AS den,
               CAST(SUM(c) AS BIGINT) AS n_feat
             FROM db JOIN bs USING (bucket) GROUP BY doc_id)
      SELECT d.doc_id, d.source,
        CAST(COALESCE(sc.n_feat, 0) AS BIGINT) AS n_feat,
        CAST(COALESCE(sc.num, 0) AS DOUBLE)
          / CAST(tot.nt_tot + 256 AS DOUBLE) AS t_score,
        CAST(COALESCE(sc.den, 0) AS DOUBLE)
          / CAST(tot.ns_tot + 256 AS DOUBLE) AS s_score,
        CASE WHEN COALESCE(sc.n_feat, 0) > 0
          THEN (CAST(COALESCE(sc.num, 0) AS DOUBLE)
                  / CAST(tot.nt_tot + 256 AS DOUBLE))
             / (CAST(COALESCE(sc.den, 0) AS DOUBLE)
                  / CAST(tot.ns_tot + 256 AS DOUBLE))
        END AS importance
      FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id, tot
      ORDER BY d.doc_id"""

  private val l67 = DeclaredQuery(
    "l67_importance_weights",
    (s, dir) => TextAnalysis.importanceWeights(
        t(s, dir, "documents"), col("lang") === "en")
      .orderBy(col("doc_id")),
    Some(l67OracleSql))

  /** L67b — the INCREMENTAL importance-weight pipeline (model built as a
    * standalone persistable table, batch scored against it) composed over
    * one corpus — value-identical to the fused l67 by construction (the
    * l48b pattern: same oracle, different execution), so the same oracle
    * SQL gates both. The split is what a production deployment runs: the
    * reference-corpus model is built once and every future crawl batch is
    * scored against it with no reference re-scan (StreamingSpec runs the
    * scoring half under foreachBatch). */
  private val l67b = DeclaredQuery(
    "l67b_importance_incremental",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.importanceScore(docs,
          TextAnalysis.importanceModel(docs, col("lang") === "en"))
        .orderBy(col("doc_id"))
    },
    Some(l67OracleSql))

  /** L68 — cross-source NEAR-DUP matrix: per unordered source pair, the
    * count of verified near-duplicate document pairs (exact jaccard ≥ 0.5
    * over 3-gram shingles) connecting them and the distinct documents
    * those pairs touch. The diagonal is intra-source duplication; the
    * off-diagonal cells are mirror/re-post edges (l49 measures shared
    * TEXT; this measures shared near-dup DOCUMENTS, the unit a dedup
    * apply removes). Oracle: the l02 pair graph joined to sources, one
    * endpoint-explode, two GROUP BYs. */
  private val l68 = DeclaredQuery(
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
  private val l69 = DeclaredQuery(
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

  /** L70 — repetition-aware EPOCH plan (Muennighoff et al. 2023): the
    * α = 1/2 temperature allocation of a 50k-token training budget with
    * per-source implied epochs and the > 4-epoch over-repetition flag.
    * Every double is the same left-assoc mul/div chain on both engines
    * (sqrt weights, sequential Σ√ fold — the l57 exactness rules). */
  private val l70 = DeclaredQuery(
    "l70_epoch_plan",
    (s, dir) => TextAnalysis.epochPlan(t(s, dir, "documents"),
        totalBudget = 50000L)
      .orderBy(col("source")),
    Some("""WITH ps AS (SELECT source,
              CAST(SUM(COALESCE(len(string_split(text, ' ')), 0)) AS BIGINT)
                AS n_tokens
            FROM documents GROUP BY source),
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

  /** L74 — UNIQUE-TOKEN epoch plan: l70's budget allocation composed
    * over the keep-one dedup survivors, so epochs are implied by each
    * source's UNIQUE tokens (effectiveTokens' n_tokens_kept), not its
    * raw size — a heavily-duplicated source stops hiding repetition
    * behind its byte count. Oracle: the l16 closure selects survivors,
    * then l70's allocation SQL verbatim over them. */
  private val l74 = DeclaredQuery(
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
  private val l75 = DeclaredQuery(
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

  /** L71 — exact quality RANK + decile of the l08 stopword ratio with no
    * global sort on the Spark side (salted bucket-prefix ranks, the l55
    * argument on a score axis); oracle is the straight global
    * row_number the Spark plan must reproduce exactly. */
  private val l71 = DeclaredQuery(
    "l71_quality_ranks",
    (s, dir) => TextAnalysis.qualityRanks(t(s, dir, "documents"))
      .orderBy(col("doc_id")),
    Some(s"""WITH qsrc AS (SELECT doc_id, text, string_split(text, ' ') AS w
              FROM documents),
      q AS (SELECT doc_id,
              CAST(len(list_filter(w, x -> list_contains(
                ${duckList(TextAnalysis.stopwords("en"))}, x))) AS DOUBLE)
                / CAST(len(w) AS DOUBLE) AS stop_ratio
            FROM qsrc),
      r AS (SELECT doc_id, stop_ratio,
              row_number() OVER (ORDER BY stop_ratio, doc_id) AS rnk,
              COUNT(*) OVER () AS n_total
            FROM q WHERE stop_ratio IS NOT NULL)
      SELECT doc_id, stop_ratio,
        CAST(rnk AS BIGINT) AS q_rank,
        CAST(FLOOR(CAST((rnk - 1) * 10 AS DOUBLE)
          / CAST(n_total AS DOUBLE)) AS BIGINT) AS decile
      FROM r ORDER BY doc_id"""))

  /** L72 — quality-SIGNAL agreement: the joint decile contingency of the
    * l08 stopword ratio vs mean token length (two independent quality
    * signals), cell (i, j) = docs in stop-decile i and length-decile j —
    * the calibration table read before composing quality filters into a
    * funnel. Deciles on both sides are the same exact ranks as l71. */
  private val l72 = DeclaredQuery(
    "l72_signal_agreement",
    (s, dir) => TextAnalysis.signalAgreement(t(s, dir, "documents"))
      .orderBy(col("stop_decile"), col("len_decile")),
    Some(s"""WITH qsrc AS (SELECT doc_id, text, string_split(text, ' ') AS w
              FROM documents),
      q AS (SELECT doc_id,
              CAST(len(list_filter(w, x -> list_contains(
                ${duckList(TextAnalysis.stopwords("en"))}, x))) AS DOUBLE)
                / CAST(len(w) AS DOUBLE) AS stop_ratio,
              CAST(length(text) - (len(w) - 1) AS DOUBLE)
                / CAST(len(w) AS DOUBLE) AS mean_tok_len
            FROM qsrc),
      a AS (SELECT doc_id,
              CAST(FLOOR(CAST((row_number() OVER (ORDER BY stop_ratio, doc_id)
                - 1) * 10 AS DOUBLE) / CAST(COUNT(*) OVER () AS DOUBLE))
                AS BIGINT) AS stop_decile
            FROM q WHERE stop_ratio IS NOT NULL),
      b AS (SELECT doc_id,
              CAST(FLOOR(CAST((row_number() OVER (ORDER BY mean_tok_len,
                doc_id) - 1) * 10 AS DOUBLE) / CAST(COUNT(*) OVER ()
                AS DOUBLE)) AS BIGINT) AS len_decile
            FROM q WHERE mean_tok_len IS NOT NULL)
      SELECT stop_decile, len_decile, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM a JOIN b USING (doc_id)
      GROUP BY stop_decile, len_decile
      ORDER BY stop_decile, len_decile"""))

  /** L73 — quality-vs-token-budget TRADEOFF: per l71 quality decile, doc
    * and token mass plus cumulative tokens (and corpus fraction) a filter
    * keeping that decile and above retains — the Pareto table a quality
    * cutoff is chosen from. Oracle: the l71 decile + token counts + a
    * descending cumulative window. */
  private val l73 = DeclaredQuery(
    "l73_quality_token_tradeoff",
    (s, dir) => TextAnalysis.qualityTokenTradeoff(t(s, dir, "documents"))
      .orderBy(col("decile")),
    Some(s"""WITH qsrc AS (SELECT doc_id, text, string_split(text, ' ') AS w
              FROM documents),
      q AS (SELECT doc_id,
              COALESCE(CAST(len(w) AS BIGINT), 0) AS n_tok,
              CAST(len(list_filter(w, x -> list_contains(
                ${duckList(TextAnalysis.stopwords("en"))}, x))) AS DOUBLE)
                / CAST(len(w) AS DOUBLE) AS stop_ratio
            FROM qsrc),
      r AS (SELECT doc_id, n_tok,
              CAST(FLOOR(CAST((row_number() OVER (ORDER BY stop_ratio,
                doc_id) - 1) * 10 AS DOUBLE) / CAST(COUNT(*) OVER ()
                AS DOUBLE)) AS BIGINT) AS decile
            FROM q WHERE stop_ratio IS NOT NULL),
      g AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(n_tok) AS BIGINT) AS n_tokens
            FROM r GROUP BY decile)
      SELECT decile, n_docs, n_tokens,
        CAST(SUM(n_tokens) OVER (ORDER BY decile DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS tokens_kept_at,
        CAST(SUM(n_tokens) OVER (ORDER BY decile DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          / CAST(SUM(n_tokens) OVER () AS DOUBLE) AS frac_kept_at
      FROM g ORDER BY decile"""))

  /** L77 — corpus NOVELTY curve (Heaps'-law saturation): per md5-order
    * corpus decile, distinct shingles seen, first-seen count, first-seen
    * fraction, and cumulative vocabulary — the "is more crawl still
    * adding new content" audit. Oracle: the same md5(doc_id) decile and
    * two grouped counts over the distinct (shingle, decile) cells. */
  private val l77 = DeclaredQuery(
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
  private val l78 = DeclaredQuery(
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

  /** L79 — k-NN graph HUBNESS audit: in-degree distribution of the top-5
    * neighbor graph over the 20% md5-sampled query set (in-degree 0 =
    * never-retrieved vectors). Oracle: l05's exact-cosine machinery with
    * the sample predicate, a rank-5 window, and two grouped counts. */
  private val l79 = DeclaredQuery(
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

  /** L80 — cross-SPLIT leakage matrix: l49's overlap machinery on the
    * train/val/test axis (shared shingles + containments + Jaccard per
    * split pair) — the whole-boundary audit published with a benchmark
    * result. Oracle: per-split distinct shingle digests from the same
    * md5 split rule, then the l49 pair arithmetic. */
  private val l80 = DeclaredQuery(
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
  private val l81 = DeclaredQuery(
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
  private val l82 = {
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
  private val l83 = DeclaredQuery(
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

  /** L84 — embedding-space COVERAGE audit: occupancy of the 256 SimHash
    * cells (l06's hyperplane buckets as a fixed grid) — per occupied cell
    * its population, corpus fraction, skew vs uniform, with occupied-cell
    * count and occupancy fraction on every row; the diversity readout run
    * before trusting a crawl snapshot. Oracle: the shared bucket CTE,
    * one group-by, totals via scalar subqueries. */
  private val l84 = DeclaredQuery(
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
  private val l85 = DeclaredQuery(
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

  /** L86 — cluster COHESION audit: edge density of every multi-member
    * near-dup cluster by size band — the over-merge (transitive-chain)
    * alarm read before trusting a dedup apply. Oracle: l16's recursive-CC
    * labeling + per-cluster edge counts + the size-band arithmetic. */
  private val l86 = DeclaredQuery(
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

  /** L87 — IVF probe-count recall sweep: measured recall@3 at nProbe ∈
    * {1,2,4} vs the brute-force truth over the md5-sampled query set —
    * the audit that prices the IVF serving knob (l44's table for the LSH
    * knobs, l82's for the MinHash bands). Oracle: l17's cents/assignment
    * CTEs, probe ranks kept to the max config, per-config top-3 +
    * scalar-subquery counts. */
  private val l87 = {
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

  /** L88 — decontamination n-gram-size sweep: contaminated-train-doc
    * counts/fractions and shared-digest counts at n ∈ {2,3,5,8} — the
    * "choose n" table for the contamination rule (monotone non-increasing
    * in n by construction). Oracle: a generic per-n shingle CTE over one
    * tokenized projection, l24's join shape, scalar-subquery totals. */
  private val l88 = {
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

  /** L89 — pack-budget sweep: pack counts, capacity, fill rate and
    * over-budget-pack counts at budgets {512,1024,2048,4096} — the
    * "choose the context length" table over l19's contiguous packing
    * (corpus tokens constant across rows = conservation check). Oracle:
    * l19's prefix-sum SQL per budget + a one-row summary each. */
  private val l89 = {
    val budgets = Seq(512L, 1024L, 2048L, 4096L)
    def pkCte(b: Long): String =
      s"""pk$b AS (SELECT CAST(FLOOR(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / $b) AS BIGINT)
            AS pack_id, n_tok FROM base),
      gp$b AS (SELECT pack_id, CAST(SUM(n_tok) AS BIGINT) AS pack_tokens
               FROM pk$b GROUP BY pack_id)"""
    def cfgRow(b: Long): String =
      s"""SELECT CAST($b AS BIGINT) AS budget,
        CAST(COUNT(*) AS BIGINT) AS n_packs,
        CAST(SUM(pack_tokens) AS BIGINT) AS corpus_tokens,
        CAST(COUNT(*) * $b AS BIGINT) AS capacity,
        CAST(SUM(pack_tokens) AS DOUBLE)
          / CAST(COUNT(*) * $b AS DOUBLE) AS fill_rate,
        CAST(SUM(CASE WHEN pack_tokens > $b THEN 1 ELSE 0 END) AS BIGINT)
          AS n_over_budget_packs
      FROM gp$b"""
    DeclaredQuery(
      "l89_pack_budget_sweep",
      (s, dir) => TextAnalysis.packBudgetSweep(t(s, dir, "documents"),
          budgets).orderBy(col("budget")),
      Some(s"""WITH base AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents),
      ${budgets.map(pkCte).mkString(",\n      ")}
      ${budgets.map(cfgRow).mkString("\n      UNION ALL ")}
      ORDER BY budget"""))
  }

  /** L90 — language-ID AGREEMENT confusion matrix: the langId heuristic
    * vs the corpus's own `lang` label, per (labeled, predicted) cell with
    * row fractions and the diagonal flag — the calibration check run
    * before per-language filtering. Oracle: l07's scoring CTEs + the
    * label join + cell/total arithmetic. */
  private val l90 = {
    val langs = TextAnalysis.stopwords.toSeq.sortBy(_._1)
    val scoreCols = langs.map { case (lang, words) =>
      s"CAST(len(list_filter(w, x -> list_contains(${duckList(words)}, x))) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS s_$lang"
    }.mkString(",\n        ")
    val unpivot = langs.map { case (lang, _) =>
      s"SELECT doc_id, '$lang' AS lang, s_$lang AS score FROM scores"
    }.mkString("\n        UNION ALL ")
    DeclaredQuery(
      "l90_langid_agreement",
      (s, dir) => TextAnalysis.langIdAgreement(t(s, dir, "documents"))
        .orderBy(col("lang"), col("pred_lang")),
      Some(s"""WITH tt AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      scores AS (SELECT doc_id,
        $scoreCols
        FROM tt),
      unp AS (
        $unpivot),
      pred AS (SELECT doc_id, lang AS pred_lang FROM (
          SELECT doc_id, lang, score,
            ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY score DESC, lang) AS rn
          FROM unp) r
        WHERE rn = 1),
      cells AS (SELECT d.lang, p.pred_lang,
          CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents d JOIN pred p USING (doc_id)
        GROUP BY d.lang, p.pred_lang),
      tot AS (SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS n_label
              FROM cells GROUP BY lang)
      SELECT c.lang, c.pred_lang, c.n_docs, t.n_label,
        CAST(c.n_docs AS DOUBLE) / CAST(t.n_label AS DOUBLE) AS frac_of_label,
        CAST(CASE WHEN c.lang = c.pred_lang THEN 1 ELSE 0 END AS BIGINT)
          AS is_match
      FROM cells c JOIN tot t USING (lang)
      ORDER BY lang, pred_lang"""))
  }

  /** L91 — SimHash ESTIMATOR audit (l43's measurement for the other
    * sketch): every band-candidate pair's Hamming distance next to its
    * exact Jaccard, collisions included at j_exact = 0 — completes the
    * estimator-audit family across all four sketches. Oracle: l04's
    * signature/banding CTEs + the candidate-verified exact side. */
  private val l91 = {
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
  private val l92 = DeclaredQuery(
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

  /** L93 — per-source media STORAGE audit: blob counts, payload bytes,
    * pixels, exact checksum and mean bytes per blob, computed by decoding
    * the real binary payloads (l11's parser) — the capacity-planning +
    * corruption-tripwire table of a multimodal lake. Oracle: the ppm CTE
    * regenerates every payload in SQL, then the same per-source sums. */
  private val l93 = DeclaredQuery(
    "l93_media_storage_audit",
    (s, dir) => Multimodal.mediaStorageAudit(s, t(s, dir, "documents"))
      .orderBy(col("source")),
    Some(s"""WITH $ppmCte,
      feats AS (SELECT doc_id,
          CAST(length(${ppmHdr("w", "h")}) + w*h*3 AS BIGINT) AS n_bytes,
          CAST(w*h AS BIGINT) AS n_px,
          CAST(list_reduce(list_transform(range(0, w*h*3),
            k -> ${ppmPx("k")}), (x, y) -> x + y) AS BIGINT) AS sum_bytes
        FROM ppm)
      SELECT d.source,
        CAST(COUNT(*) AS BIGINT) AS n_blobs,
        CAST(SUM(f.n_bytes) AS BIGINT) AS total_bytes,
        CAST(SUM(f.n_px) AS BIGINT) AS total_pixels,
        CAST(SUM(f.sum_bytes) AS BIGINT) AS payload_checksum,
        CAST(SUM(f.n_bytes) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
          AS mean_bytes_per_blob
      FROM feats f JOIN documents d USING (doc_id)
      GROUP BY d.source ORDER BY d.source"""))

  /** L94 — mixture-TEMPERATURE sweep: l70's budget allocation at α ∈
    * {0.25, 0.5, 1.0} (the sqrt-exact family — sqrt chains are bit-stable
    * cross-engine where general pow is not): the "choose the mixture
    * temperature" table. Oracle: l70's fold SQL per α with the weight
    * expression swapped. */
  private val l94 = {
    val budget = 50000L
    def leg(a: Double, wExpr: String): String =
      s"""SELECT CAST($a AS DOUBLE) AS alpha, source, n_tokens,
        w / tw AS mix_weight,
        $budget.0 * w / tw AS alloc_tokens,
        $budget.0 * w / tw / CAST(n_tokens AS DOUBLE) AS epochs,
        $budget.0 * w / tw / CAST(n_tokens AS DOUBLE) > 4.0 AS over_repeated
      FROM (SELECT source, n_tokens, $wExpr AS w FROM ps) w
      CROSS JOIN (SELECT list_reduce(list($wExpr ORDER BY source NULLS FIRST),
          (a, b) -> a + b) AS tw FROM ps) tot
      WHERE n_tokens > 0"""
    DeclaredQuery(
      "l94_temperature_sweep",
      (s, dir) => TextAnalysis.temperatureSweep(t(s, dir, "documents"),
          totalBudget = budget)
        .orderBy(col("alpha"), col("source")),
      Some(s"""WITH ps AS (SELECT source,
              CAST(SUM(COALESCE(len(string_split(text, ' ')), 0)) AS BIGINT)
                AS n_tokens
            FROM documents GROUP BY source)
      ${Seq(
        leg(0.25, "sqrt(sqrt(CAST(n_tokens AS DOUBLE)))"),
        leg(0.5, "sqrt(CAST(n_tokens AS DOUBLE))"),
        leg(1.0, "CAST(n_tokens AS DOUBLE)")).mkString("\n      UNION ALL ")}
      ORDER BY alpha, source"""))
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
  private object PqOracle {
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

  private val l95 = {
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
  private val l96 = DeclaredQuery(
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

  /** L97 — per-source quality-DRIFT audit: each source's Mann–Whitney
    * rank-sum / AUC vs the rest of the corpus on the l08 stopword-ratio
    * axis (tie-averaged ranks carried ×2 as exact longs — see
    * `TextAnalysis.sourceQualityDrift`). AUC 0.5 = in family; tails =
    * drifted sources. Oracle replays the l71 rank CTE plus the tie-group
    * min/count fold. */
  private val l97 = DeclaredQuery(
    "l97_source_quality_drift",
    (s, dir) => TextAnalysis.sourceQualityDrift(t(s, dir, "documents"))
      .orderBy(col("source")),
    Some(s"""WITH qsrc AS (SELECT doc_id, source, text,
               string_split(text, ' ') AS w FROM documents),
      q AS (SELECT doc_id, source,
              CAST(len(list_filter(w, x -> list_contains(
                ${duckList(TextAnalysis.stopwords("en"))}, x))) AS DOUBLE)
                / CAST(len(w) AS DOUBLE) AS stop_ratio
            FROM qsrc),
      r AS (SELECT doc_id, source, stop_ratio,
              row_number() OVER (ORDER BY stop_ratio, doc_id) AS rnk
            FROM q WHERE stop_ratio IS NOT NULL),
      g AS (SELECT stop_ratio, MIN(rnk) AS mn, COUNT(*) AS c
            FROM r GROUP BY stop_ratio),
      a AS (SELECT r.source, 2 * g.mn + g.c - 1 AS ar2
            FROM r JOIN g USING (stop_ratio)),
      t AS (SELECT COUNT(*) AS n_total FROM r)
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(ar2) AS BIGINT) AS rank_sum_x2,
        CAST(SUM(ar2) - COUNT(*) * (COUNT(*) + 1) AS BIGINT) AS u_x2,
        CAST(SUM(ar2) - COUNT(*) * (COUNT(*) + 1) AS DOUBLE)
          / (2.0 * COUNT(*) * (n_total - COUNT(*))) AS auc
      FROM a CROSS JOIN t
      GROUP BY source, n_total
      ORDER BY source"""))

  /** L98 — PQ SHORTLIST-SIZE recall sweep: recall@k of the l95 ADC
    * shortlist at each candidate shortM vs brute-force truth on the same
    * sampled query set, from ONE shared coarse pass (the l87/l88
    * shared-pass discipline — l87 prices IVF's nProbe, this prices PQ's
    * shortM). The oracle reuses l95's whole CTE chain through `approx`
    * and replays the membership counts exactly. */
  private val l98 = {
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

  /** L99 — eval-CANARY tripwire: exact substring scan for a known canary
    * list, zero-hit canaries reported with n_docs = 0 (the reading that
    * matters). The declared query plants `__canary_alpha__` into a
    * doc_id % 50 = 0 slice under shifted ids (the l96 planting precedent)
    * so the hit path and the clean path both execute on fixture corpora. */
  private val l99 = DeclaredQuery(
    "l99_canary_tripwire",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("source"))
      val corpus = d.unionByName(
        d.filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(col("text"), lit(" __canary_alpha__")).as("text"),
            col("source")))
      val canaries = s.sql(
        """SELECT CAST(canary_id AS BIGINT) AS canary_id, phrase
           FROM VALUES (1, '__canary_alpha__'), (2, '__canary_never__')
           AS t(canary_id, phrase)""")
      TextAnalysis.canaryScan(corpus, canaries).orderBy(col("canary_id"))
    },
    Some("""WITH corpus AS (
        SELECT doc_id, text, source FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text || ' __canary_alpha__', source
        FROM documents WHERE doc_id % 50 = 0),
      can AS (SELECT CAST(canary_id AS BIGINT) AS canary_id, phrase
              FROM (VALUES (1, '__canary_alpha__'), (2, '__canary_never__'))
              AS t(canary_id, phrase)),
      hits AS (
        SELECT c.canary_id, c.phrase, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(COUNT(DISTINCT d.source) AS BIGINT) AS n_sources,
          MIN(d.doc_id) AS first_doc
        FROM corpus d JOIN can c ON contains(d.text, c.phrase)
        GROUP BY c.canary_id, c.phrase)
      SELECT c.canary_id, c.phrase,
        COALESCE(h.n_docs, 0) AS n_docs,
        COALESCE(h.n_sources, 0) AS n_sources,
        h.first_doc
      FROM can c LEFT JOIN hits h
        ON h.canary_id = c.canary_id AND h.phrase = c.phrase
      ORDER BY c.canary_id"""))

  /** L100 — PQ CODEBOOK-health audit: per (sub, cent_id) assignment count
    * and integer-snapped total squared reconstruction error, dead
    * codewords kept at zero — the retrain-signal table completing the PQ
    * family (fit → encode → serve → sweep → audit). The oracle reuses
    * l95's fit CTEs and replays the argmin + the 10⁻⁶ error snap. */
  private val l100 = {
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

  /** L101 — BM25 retrieval top-k (Okapi weighting, rational-idf integer-
    * polynomial form; Retrieval.scala's scaladoc derives the formula):
    * index the train split, retrieve for every eval doc — the retrieval-
    * based decontamination table. The oracle mirrors the one-division
    * snapped term score literally. */
  /** The l101 BM25 oracle chain (td → … → rk), shared with the l106
    * agreement audit. */
  private val bm25Cte =
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

  private val l101 = DeclaredQuery(
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
  private val winnowCte =
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

  private val l102 = DeclaredQuery(
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

  /** L103 — Gopher-style quality-rule battery (Rae et al. 2021): per
    * source, pass counts for the five word-form rules and the
    * conjunction. Exact integer comparisons only. */
  private val l103 = DeclaredQuery(
    "l103_gopher_rules",
    (s, dir) => TextAnalysis.gopherRules(t(s, dir, "documents"))
      .orderBy(col("source")),
    Some(s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w
               FROM documents),
      r AS (SELECT source,
          len(w) AS nw,
          list_reduce(list_transform(w, x -> len(x)), (a, b) -> a + b) AS sumlen,
          len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS nalpha,
          len(list_filter(w, x -> contains(x, '#') OR contains(x, '...'))) AS nsym,
          len(list_distinct(list_filter(w, x -> list_contains(
            ${duckList(TextAnalysis.stopwords("en"))}, x)))) AS nstop
        FROM t),
      b AS (SELECT source,
          (nw >= 50 AND nw <= 100000) AS r_wc,
          (sumlen >= nw * 3 AND sumlen <= nw * 10) AS r_mwl,
          (nalpha * 10 >= nw * 8) AS r_alpha,
          (nstop >= 2) AS r_stop,
          (nsym * 10 <= nw) AS r_sym
        FROM r)
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN r_wc THEN 1 ELSE 0 END) AS BIGINT) AS n_wc,
        CAST(SUM(CASE WHEN r_mwl THEN 1 ELSE 0 END) AS BIGINT) AS n_mwl,
        CAST(SUM(CASE WHEN r_alpha THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha,
        CAST(SUM(CASE WHEN r_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
        CAST(SUM(CASE WHEN r_sym THEN 1 ELSE 0 END) AS BIGINT) AS n_sym,
        CAST(SUM(CASE WHEN r_wc AND r_mwl AND r_alpha AND r_stop AND r_sym
             THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
      FROM b GROUP BY source ORDER BY source"""))

  /** L104 — hard-negative mining (FaceNet triplet construction): top-k
    * cross-label neighbors per sampled query next to its best same-label
    * similarity; `violates` marks negatives outscoring the positive. */
  private val l104 = DeclaredQuery(
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

  /** L105 — tokenizer fertility per language under the frozen published
    * merge list (Petrov et al. 2023 tokenizer-fairness audit). The oracle
    * replays the merge fold as boundary-preserving string rewriting: a
    * symbol sequence is chr(1)chr(1)-delimited with a chr(1)chr(1) at
    * each end; merge (l, r) is then replace(chr(1)+l+chr(1)chr(1)+r+chr(1)
    * → chr(1)+lr+chr(1)) — each match consumes one chr(1) from each
    * neighboring boundary pair and restores both, so left-to-right
    * non-overlapping replace() IS the BPE merge fold (LlmSpec pins the
    * equality against Bpe.encode). */
  private val l105 = {
    val sep2 = "chr(1) || chr(1)"
    val base = s"$sep2 || array_to_string(string_split(word, ''), $sep2) || $sep2"
    val folded = Bpe.publishedMerges.foldLeft(base) { case (e, (l, r)) =>
      s"replace($e, chr(1) || '$l' || $sep2 || '$r' || chr(1), chr(1) || '$l$r' || chr(1))"
    }
    DeclaredQuery(
      "l105_bpe_fertility",
      (s, dir) => Bpe.fertility(t(s, dir, "documents")).orderBy(col("lang")),
      Some(s"""WITH w AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
                 FROM documents),
        ww AS (SELECT doc_id, lang, word FROM w WHERE len(word) > 0),
        enc AS (SELECT doc_id, lang,
            len(string_split($folded, $sep2)) - 2 AS n_sym
          FROM ww),
        d AS (SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS n_words,
                CAST(SUM(n_sym) AS BIGINT) AS n_bpe
              FROM enc GROUP BY doc_id, lang)
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(n_words) AS BIGINT) AS n_words,
          CAST(SUM(n_bpe) AS BIGINT) AS n_bpe_tokens,
          CAST(SUM(n_bpe) AS DOUBLE) / CAST(SUM(n_words) AS DOUBLE) AS fertility
        FROM d GROUP BY lang ORDER BY lang"""))
  }

  /** L106 — retrieval-vs-n-gram decontamination agreement: per eval doc,
    * BM25 top-5 vs exact shared-shingle top-5 — list sizes, intersection,
    * rank-1 agreement. The "can cheap retrieval stand in for the exact
    * n-gram join" policy table. */
  private val l106 = DeclaredQuery(
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

  /** L107 — vocabulary coverage curve by vocab-rank decile: interval
    * arithmetic on the (freq, count, before) grid — no per-token ranks,
    * no hapax-tie-group skew (TextAnalysis.vocabCoverage scaladoc). */
  private val l107 = DeclaredQuery(
    "l107_vocab_coverage",
    (s, dir) => TextAnalysis.vocabCoverage(t(s, dir, "documents"))
      .orderBy(col("decile")),
    Some("""WITH w AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq FROM w
             WHERE len(tok) > 0 GROUP BY tok),
      grid AS (SELECT freq, CAST(COUNT(*) AS BIGINT) AS c FROM tf GROUP BY freq),
      gb AS (SELECT freq, c,
               CAST(COALESCE(SUM(c) OVER (ORDER BY freq DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS before
             FROM grid),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS v_total,
                     CAST(SUM(freq) AS BIGINT) AS mass_total FROM tf),
      dec AS (SELECT unnest(range(0, 10)) AS decile),
      ov AS (SELECT d.decile, g.freq, g.c, g.before,
               CAST(floor(CAST(d.decile * t.v_total AS DOUBLE) / 10.0) AS BIGINT) + 1 AS lo,
               CAST(floor(CAST((d.decile + 1) * t.v_total AS DOUBLE) / 10.0) AS BIGINT) AS hi
             FROM gb g CROSS JOIN dec d CROSS JOIN tot t),
      nn AS (SELECT decile,
               greatest(0, least(hi, before + c) - greatest(lo, before + 1) + 1) AS n,
               freq
             FROM ov),
      agg AS (SELECT decile, CAST(SUM(n) AS BIGINT) AS n_tokens,
                CAST(SUM(n * freq) AS BIGINT) AS token_mass
              FROM nn GROUP BY decile),
      cum AS (SELECT decile, n_tokens, token_mass,
                CAST(SUM(token_mass) OVER (ORDER BY decile
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_mass
              FROM agg)
      SELECT c.decile, c.n_tokens, c.token_mass, c.cum_mass,
        CAST(c.cum_mass AS DOUBLE) / CAST(t.mass_total AS DOUBLE) AS cum_frac
      FROM cum c CROSS JOIN tot t ORDER BY c.decile"""))

  /** L108 — embedding dimension-health audit: per-dim count, 10⁻⁶-snapped
    * sum (l25 half-up), min/max codes, exact zero count. */
  private val l108 = DeclaredQuery(
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

  /** The dense-leg oracle chain (vb → ev/tv → ds → dr → dk): id-aligned
    * eval vectors cosine-ranked against train vectors, shared by the
    * l109 agreement and l110 fusion oracles. */
  private val denseCte =
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
  private val l109 = DeclaredQuery(
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
  private val l110 = DeclaredQuery(
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

  /** L111 — replayable-HLL distinct-shingle cardinality audit per source:
    * exact distinct count next to the md5-register HLL estimate and the
    * signed error (Sketches.hllShingleCardinality scaladoc — the
    * cardinality sketch completing the estimator-audit family; every
    * register derives from md5 bit arithmetic both engines replay). */
  private val l111 = DeclaredQuery(
    "l111_hll_shingle_cardinality",
    (s, dir) => Sketches.hllShingleCardinality(t(s, dir, "documents"))
      .orderBy(col("source")),
    Some("""WITH w AS (SELECT source, doc_id, string_split(text, ' ') AS toks
               FROM documents),
      sh AS (SELECT DISTINCT source, unnest(list_distinct(list_transform(
               range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
             FROM w),
      h AS (SELECT source, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h FROM sh),
      ex AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS exact_distinct
             FROM h GROUP BY source),
      r AS (SELECT source,
              CAST(floor(h / 67108864.0) AS BIGINT) AS reg,
              CASE WHEN h % 67108864 = 0 THEN 27
                   ELSE 26 - (length(bin(h % 67108864)) - 1) END AS rho
            FROM h),
      mr AS (SELECT source, reg, MAX(rho) AS max_rho FROM r GROUP BY source, reg),
      grid AS (SELECT d.source, g.reg
               FROM (SELECT DISTINCT source FROM documents) d
               CROSS JOIN (SELECT unnest(range(0, 64)) AS reg) g),
      cells AS (SELECT grid.source, COALESCE(mr.max_rho, 0) AS rho
                FROM grid LEFT JOIN mr
                  ON mr.source = grid.source AND mr.reg = grid.reg),
      agg AS (SELECT source,
                CAST(SUM(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_regs,
                CAST(SUM(CAST(floor(power(2.0, 50.0 - rho)) AS BIGINT)) AS BIGINT) AS z_e50
              FROM cells GROUP BY source)
      SELECT a.source, ex.exact_distinct, a.n_zero_regs, a.z_e50,
        0.709 * 64.0 * 64.0 * power(2.0, 50.0) / CAST(a.z_e50 AS DOUBLE) AS est_raw,
        0.709 * 64.0 * 64.0 * power(2.0, 50.0) / CAST(a.z_e50 AS DOUBLE)
          - CAST(ex.exact_distinct AS DOUBLE) AS err
      FROM agg a JOIN ex USING (source) ORDER BY a.source"""))

  /** L112 — winnow match pairs: docs sharing ≥ 2 distinct selected
    * fingerprints, with selection sizes and containment — the matching
    * half of l102's selection (TextAnalysis.winnowMatchPairs scaladoc). */
  private val l112 = DeclaredQuery(
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
  private val l113 = DeclaredQuery(
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

  /** L114 — substring-granularity dedup apply (Lee et al. 2022 maximal
    * repeated substring removal, winnow-anchored approximation): remove
    * every cross-document repeated token run of ≥ 8 tokens from the
    * later document, at any alignment (l50's fixed-grid spans can miss a
    * misaligned repeat; this cannot, for runs ≥ w+n−1). The declared
    * query plants full doc copies into a doc_id % 10 = 0 slice (the
    * l52/l96 precedent) so complete-removal, partial natural near-dup,
    * and untouched paths all execute; the oracle replays the winnow
    * selection, anchor extension, and interval removal with DuckDB list
    * lambdas bit-for-bit. */
  private val l114 = DeclaredQuery(
    "l114_substring_dedup",
    (s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = docs.unionByName(
        docs.filter(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      TextAnalysis.substringDedupApply(planted).orderBy(col("doc_id"))
    },
    Some("""WITH ad AS (SELECT doc_id, text FROM documents
              UNION ALL SELECT doc_id + 1000000, text FROM documents
              WHERE doc_id % 10 = 0),
      t AS (SELECT doc_id, string_split(text, ' ') AS w FROM ad),
      h AS (SELECT doc_id, list_transform(range(1, len(w) - 1),
              i -> ('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 8))::BIGINT) AS hs
            FROM t WHERE len(w) >= 3),
      p AS (SELECT doc_id, hs, len(hs) AS g, least(4, len(hs)) AS weff FROM h),
      sel AS (SELECT doc_id, hs,
              list_distinct(list_transform(range(0, g - weff + 1),
                j -> j + weff + 1
                  - list_position(list_reverse(list_slice(hs, j + 1, j + weff)),
                      list_min(list_slice(hs, j + 1, j + weff))))) AS sel_pos
            FROM p),
      posts AS (SELECT doc_id, hs, unnest(sel_pos) AS p FROM sel),
      anch AS (SELECT a.doc_id AS a_id, a.p AS pa, a.hs AS ha,
                      b.doc_id AS b_id, b.p AS pb, b.hs AS hb
               FROM posts a JOIN posts b
                 ON a.hs[a.p] = b.hs[b.p] AND a.doc_id < b.doc_id),
      ext AS (SELECT b_id, pa, pb, ha, hb,
        least(pa, pb) - 1 AS maxback,
        least(len(ha) - pa, len(hb) - pb) AS maxfwd,
        list_position(list_transform(range(1, least(pa, pb)),
          q -> ha[pa - q] != hb[pb - q]), true) AS mismb,
        list_position(list_transform(
          range(1, least(len(ha) - pa, len(hb) - pb) + 1),
          q -> ha[pa + q] != hb[pb + q]), true) AS mismf
        FROM anch),
      lr AS (SELECT b_id, pb,
        CASE WHEN maxback < 1 THEN 0
             WHEN mismb IS NULL OR mismb = 0 THEN maxback
             ELSE mismb - 1 END AS l,
        CASE WHEN maxfwd < 1 THEN 0
             WHEN mismf IS NULL OR mismf = 0 THEN maxfwd
             ELSE mismf - 1 END AS r
        FROM ext),
      iv AS (SELECT DISTINCT b_id AS doc_id, pb - l AS s, pb + r + 2 AS e
             FROM lr WHERE l + r + 3 >= 8),
      rem AS (SELECT DISTINCT doc_id, unnest(range(s, e + 1)) AS i FROM iv),
      rs AS (SELECT doc_id, list_sort(list(i)) AS rem FROM rem GROUP BY doc_id)
      SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_tok,
        CAST(COALESCE(len(rs.rem), 0) AS BIGINT) AS n_removed,
        md5(COALESCE(array_to_string(list_filter(
          list_transform(range(1, len(t.w) + 1),
            i -> CASE WHEN rs.rem IS NOT NULL AND list_contains(rs.rem, i)
                 THEN NULL ELSE t.w[i] END),
          x -> x IS NOT NULL), ' '), '')) AS clean_md5
      FROM t LEFT JOIN rs ON t.doc_id = rs.doc_id
      ORDER BY t.doc_id"""))

  val all: Seq[DeclaredQuery] = Seq(
    l01, l02, l03, l04, l05, l06, l07, l08, l09, l10,
    l11, l12, l13, l14, l15, l16, l17, l18, l19, l20,
    l21, l22, l23, l24, l25, l26, l27, l28, l29, l30,
    l31, l32, l33, l34, l35, l36, l37, l38, l39, l40,
    l41, l42, l43, l44, l45, l46, l47, l48, l48b, l49, l50,
    l51, l52, l53, l54, l55, l56, l57, l58, l59, l60, l61, l62, l63,
    l64, l65, l66, l67, l67b, l68, l69, l70, l71, l72, l73, l74, l75,
    l76, l77, l78, l79, l80, l81, l82, l83, l84, l85, l86, l87, l88,
    l89, l90, l91, l92, l93, l94, l95, l96, l97, l98, l99, l100,
    l101, l102, l103, l104, l105, l106, l107, l108, l109, l110, l111,
    l112, l113, l114, d29)
}
