package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sparse (lexical) retrieval over the `documents` corpus — the BM25
  * query→document scorer (Robertson & Spärck Jones probabilistic
  * relevance framework; the Okapi BM25 form with k1 = 1.2, b = 0.75).
  * The LLM-pipeline uses for it: retrieval-based decontamination ("which
  * train documents does this eval document retrieve"), RAG index
  * construction, and attribution audits ("which corpus documents would
  * surface for this probe query").
  *
  * Factored at the MODEL boundary (the l95/S24 discipline): `bm25Model`
  * builds the postings + corpus statistics a production index persists;
  * `bm25Serve` scores an arriving query table against that static model
  * (per-query independence ⇒ the S27 streaming form equals batch for any
  * micro-batch split); `bm25TopK` is the fused end-to-end declared form.
  *
  * Cross-engine exactness: ln-idf is not reproducible across engines
  * (libm ulp differences), so scores use the RATIONAL Robertson idf
  * (2(N−df)+1)/(2df+1) — the same ranking family — and the whole
  * per-term score is ONE double division of two exact LONG polynomials
  * (multiply numerator and denominator through by 10·S so k1 = 1.2 and
  * b = 0.75 become integer coefficients):
  *
  *   term = (2(N−df)+1)·22·S·tf  /  (2df+1)·(10·S·tf + 3·S + 9·N·dl)
  *
  * snapped to ⌊10⁶·term⌋ and summed as BIGINT — order-independent and
  * bit-identical in any engine. Query term frequency is saturated at 1
  * (distinct query terms — the standard short-query simplification).
  * LONG headroom: the numerator is ≤ 2N·22·S·tf_max ≈ 10⁶·22·10⁸·10² ≈
  * 2·10¹⁷ at a 10⁸-token corpus shard; beyond that the model is built
  * per-shard (and production ranking would drop the snap and use plain
  * doubles — the snap exists for the oracle gate).
  *
  * Scale shape: the corpus is read once into (doc_id, tok, tf) + (doc_id,
  * dl) — hash-aggs with map-side partials whose shuffles carry word atoms
  * and ids, never documents. df is an agg OVER tf (vocabulary-sized). The
  * query⋈postings join key is the term — Zipf-skewed, but high-df terms
  * carry near-zero idf weight, so production serving prunes them
  * (`dfCapPermille`, the WAND/impact-ordered analogue: skip query terms
  * present in more than that ‰ of documents; the declared query runs
  * exact with the cap off). Corpus stats are a broadcast 1-row cross
  * join. Top-k is a per-query window over the candidate set — bounded by
  * |terms per query| · max df, never |Q|·|corpus|.
  */
object Retrieval {

  /** The persisted index: postings (tok, doc_id, tf, dl, df) and the
    * 1-row corpus statistics (n_docs, sum_dl). dl rides denormalized on
    * the postings row so serving joins once on the term only.
    *
    * The postings table leaves here CLUSTERED BY doc_id — the property
    * bm25Serve's aggregation plan relies on: every (q_id, doc_id) score
    * group lives entirely inside doc d's partition, so the per-pair sum
    * completes in-stage and the candidate expansion NEVER crosses an
    * exchange (round 12: the un-clustered form shuffled the full
    * candidate set — ~73M (q, d, term_score) rows at sf0.1 — because the
    * (doc_id, tok)-partitioned join output scattered each pair's terms
    * across partitions and partial aggregation collapsed nothing; 34.9 s
    * → 2.7 s isolated). The repartition moves index-sized rows (the tf
    * exchange already reduced corpus tokens to per-doc term counts
    * map-side), never document text.
    *
    * The repartition pins an explicit partition count (REPARTITION_BY_NUM)
    * because AQE's coalescer sizes partitions by the EXCHANGE's bytes —
    * the index is a few MB, so it would collapse to one partition — but
    * the work downstream of this exchange is the candidate EXPANSION,
    * ~630× the index rows on a skewed corpus: measured 29.8 s
    * single-partition vs 1.6 s at 32 (round 12). AQE cannot see through
    * a build-side blow-up; any exchange feeding a many-to-many broadcast
    * probe must pin its own parallelism. */
  def bm25Model(corpus: DataFrame): (DataFrame, DataFrame) = {
    val (tf, dl) = bm25Core(corpus)
    bm25FromCore(tf, dl)
  }

  /** The INCREMENTAL index core (S31): per-doc rows only — term counts
    * (doc_id, tok, tf) and lengths (doc_id, dl). Deliberately df-free and
    * stats-free: document frequency and corpus totals are GLOBAL, so any
    * carried form of them would need re-aggregation on every arrival
    * anyway — what CAN merge by plain union is exactly the per-doc rows,
    * and `mergeBm25Core` is that union (associative and commutative over
    * DISJOINT doc batches; re-delivery is NOT idempotent — duplicate rows
    * would double tf — so the S22 exactly-once foreachBatch discipline
    * applies). The serving index derives at REFRESH time via
    * `bm25FromCore` (one vocab-sized df agg + the doc_id re-cluster),
    * the l52 persisted-model discipline: arriving batches pay per-batch
    * work, the global recompute happens once per index swap, and the
    * maintained index equals the from-scratch model of the drained
    * corpus for any batch split (tested in StreamingSpec). */
  def bm25Core(corpus: DataFrame): (DataFrame, DataFrame) =
    bm25CoreFromToks(
      corpus.select(col("doc_id"), TextOps.tokens(col("text")).as("toks")))

  /** bm25Core over an ALREADY-TOKENIZED (doc_id, toks) table — the shared
    * entry the fused audits use to tokenize the corpus ONCE for every leg
    * (round 21: deconAgreement tokenized the same documents three times —
    * shingles, train core, query terms — through three separate scans). */
  private[graft] def bm25CoreFromToks(toks: DataFrame)
      : (DataFrame, DataFrame) = {
    // dl counts the SAME tokens that can appear in postings (len > 0):
    // consecutive/leading/trailing spaces split into empty tokens that tf
    // filters out, and the l101 oracle's dl is len(list_filter(w, len>0))
    // — an unfiltered size() here diverged on any such document.
    val dl = toks.select(col("doc_id"),
      size(filter(col("toks"), t => length(t) > 0)).cast(LongType).as("dl"))
    val tf = toks.select(col("doc_id"), explode(col("toks")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    (tf, dl)
  }

  /** Disjoint-doc-batch merge of two index cores (see bm25Core). */
  def mergeBm25Core(a: (DataFrame, DataFrame),
                    b: (DataFrame, DataFrame)): (DataFrame, DataFrame) =
    (a._1.unionByName(b._1), a._2.unionByName(b._2))

  /** Derive the serving index (postings + stats) from a core — the
    * refresh step of the incremental loop, and the second half of the
    * fused bm25Model. */
  def bm25FromCore(tf: DataFrame, dl: DataFrame): (DataFrame, DataFrame) = {
    val shufflePartitions =
      tf.sparkSession.sessionState.conf.numShufflePartitions
    // Materialize each core table once: tf feeds BOTH the postings join
    // and the df aggregation, dl feeds BOTH the postings join and the
    // corpus stats — without the checkpoints every consumer branch
    // re-ran the corpus tokenize/count from the scan (round 12: two full
    // extra corpus passes inside every model build). Index-sized rows;
    // a production build persists exactly these tables anyway.
    val tfC = tf.localCheckpoint()
    val dlC = dl.localCheckpoint()
    val dfT = tfC.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val postings = tfC.join(dfT, Seq("tok")).join(dlC, Seq("doc_id"))
      .repartition(shufflePartitions, col("doc_id"))
    val stats = dlC.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    (postings, stats)
  }

  /** Score a query table (q_id, text) against a static model; top-k per
    * query by snapped BM25 score, ties broken on doc_id. Pure function of
    * (queries, model) with per-query independence — the streaming serve
    * (S27) wraps exactly this under foreachBatch. */
  /** Per-posting snapped BM25 term weight with (df, n_docs) carried — the
    * impact-ordered-postings layout shared by bm25Serve and the
    * dfCapPermille calibration sweep (KnobSchedule.bm25DfCapForRecall).
    * The weight is query-independent (query tf saturates at 1): one
    * rational Robertson-idf × saturation division per POSTING, snapped to
    * ⌊10⁶·term⌋ so the per-(q, doc) sum is an order-free BIGINT. */
  def weightedPostings(postings: DataFrame, stats: DataFrame): DataFrame = {
    val num = (lit(2L) * (col("n_docs") - col("df")) + lit(1L)) *
      lit(22L) * col("sum_dl") * col("tf")
    val den = (lit(2L) * col("df") + lit(1L)) *
      (lit(10L) * col("sum_dl") * col("tf") + lit(3L) * col("sum_dl") +
        lit(9L) * col("n_docs") * col("dl"))
    val snapped = floor((num.cast(DoubleType) / den.cast(DoubleType)) * lit(1000000.0))
    postings.crossJoin(broadcast(stats))
      .select(col("tok"), col("doc_id"), col("df"), col("n_docs"),
        snapped.as("term_score"))
  }

  def bm25Serve(queries: DataFrame, postings: DataFrame, stats: DataFrame,
                k: Int = 5, dfCapPermille: Int = 1000): DataFrame =
    bm25ServeTerms(queries
      .select(col("q_id"),
        explode(array_distinct(TextOps.tokens(col("text")))).as("tok"))
      .filter(length(col("tok")) > 0),
      postings, stats, k, dfCapPermille)

  /** bm25Serve from ALREADY-EXPLODED distinct query terms (q_id, tok) —
    * the tokenize-once twin of bm25CoreFromToks. */
  private[graft] def bm25ServeTerms(qterms: DataFrame, postings: DataFrame,
                                    stats: DataFrame, k: Int = 5,
                                    dfCapPermille: Int = 1000): DataFrame = {
    // The per-term weight is QUERY-INDEPENDENT (query tf saturates at 1),
    // so it is computed once per POSTING — index-sized work — and the
    // candidate expansion only sums precomputed longs (the impact-ordered-
    // postings layout; round 12: evaluating the polynomial division per
    // (q, d, t) contribution did ~630× the arithmetic). The query side
    // broadcasts: a serving/eval batch is always vanishingly small next
    // to the corpus index, and the broadcast probe keeps the expansion
    // inside the postings' doc_id-clustered stage, where the (q_id,
    // doc_id) sum then completes without an exchange (see bm25Model).
    val weighted = weightedPostings(postings, stats)
      .filter(col("df") * 1000 <= col("n_docs") * dfCapPermille)
      .select(col("tok"), col("doc_id"), col("term_score"))
    val scored = broadcast(qterms).join(weighted, Seq("tok"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("term_score")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("doc_id"), col("score"), col("rank"))
  }

  /** The fused declared form: index the TRAIN split, retrieve for every
    * eval (val+test) document — the retrieval-based decontamination
    * table ("which train docs surface for each held-out doc"). Split
    * membership derives from THE shared split bucket (TextOps.splitBucket,
    * the l15/l24 lockstep rule). */
  def bm25TopK(docs: DataFrame, k: Int = 5, trainPct: Int = 80): DataFrame =
    bm25TopKFromToks(tokBucketed(docs), k, trainPct)

  /** (doc_id, toks, bucket) — the corpus tokenized ONCE and materialized,
    * so the train core, the query terms (and in the fused audits the
    * shingle leg) all read one token pass instead of re-scanning and
    * re-splitting the text per leg (round 21; the index-build checkpoints
    * in bm25FromCore are the same discipline one derivation later). */
  private[graft] def tokBucketed(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"),
        TextOps.splitBucket(col("doc_id")).as("bucket"))
      .localCheckpoint()

  /** bm25TopK over a pre-tokenized (doc_id, toks, bucket) table. */
  private[graft] def bm25TopKFromToks(toks: DataFrame, k: Int = 5,
                                      trainPct: Int = 80): DataFrame = {
    val (tf, dl) = bm25CoreFromToks(
      toks.filter(col("bucket") < trainPct)
        .select(col("doc_id"), col("toks")))
    val (postings, stats) = bm25FromCore(tf, dl)
    val qterms = toks.filter(col("bucket") >= trainPct)
      .select(col("doc_id").as("q_id"),
        explode(array_distinct(col("toks"))).as("tok"))
      .filter(length(col("tok")) > 0)
    bm25ServeTerms(qterms, postings, stats, k)
  }

  /** Retrieval-vs-n-gram DECONTAMINATION AGREEMENT audit — per eval doc,
    * does BM25 retrieval surface the same train documents the exact
    * shingle-overlap ranking names as contaminators? Two top-k lists per
    * eval doc: the BM25 top-k (bm25TopK) and the exact top-k by shared
    * distinct 3-gram shingle count (ties by doc_id — the l24 overlap
    * measurement as a ranking); reported per eval doc as list sizes,
    * intersection size, and whether the two rank-1 picks agree. The table
    * that decides whether retrieval-based decontamination (cheap, serves
    * incrementally — S27) can stand in for the n-gram join (exact,
    * corpus-sized) on a given corpus.
    *
    * Scale shape: the BM25 leg is bm25TopK's (postings-bounded); the
    * exact leg ships shingle ATOMS through the inverted-index join (the
    * l02/l24 family — at 100 TB the digested LLM3 path replaces it); both
    * collapse to ≤k (q_id, doc_id) rows before the id-only agreement
    * joins. Eval docs with NO shared term/shingle appear with zeroes
    * (driven from the eval-doc table, left joins). */
  def deconAgreement(docs: DataFrame, k: Int = 5, n: Int = 3,
                     trainPct: Int = 80): DataFrame = {
    // ONE tokenize pass feeds every leg (round 21): the shingle transform,
    // the BM25 train core and the BM25 query terms all derive from the
    // same materialized (doc_id, toks, bucket) table — the previous form
    // scanned and re-split the corpus text three times (shingles here,
    // then twice inside bm25TopK).
    val toks = tokBucketed(docs)
    // one checkpointed shingle pass feeds BOTH split sides (the
    // boilerplateStrip precedent) — without it each filter branch
    // re-ran the shingle transform, the operator's dominant cost
    val sh = toks.select(col("doc_id"),
        explode(TextOps.shinglesFromTokens(col("toks"), n)).as("s"),
        col("bucket"))
      .localCheckpoint()
    // The bm25Serve join shape (see bm25Model's scaladoc): the EVAL side
    // broadcasts (an eval set is vanishingly small next to the train
    // corpus), the train shingles cluster by doc_id with pinned
    // parallelism, so the shared-shingle expansion stays in the train
    // partitions and the (q_id, doc_id) count completes in-stage — the
    // shuffled-by-s form re-exchanged every candidate pair contribution.
    val shufflePartitions =
      docs.sparkSession.sessionState.conf.numShufflePartitions
    val trainSh = sh.filter(col("bucket") < trainPct)
      .select(col("doc_id"), col("s"))
      .repartition(shufflePartitions, col("doc_id"))
    val evalSh = sh.filter(col("bucket") >= trainPct)
      .select(col("doc_id").as("q_id"), col("s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("shared").desc, col("doc_id"))
    val exactTop = broadcast(evalSh).join(trainSh, Seq("s"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("doc_id"), col("rank"))
    val bm25Top = bm25TopKFromToks(toks, k, trainPct)
      .select(col("q_id"), col("doc_id"), col("rank"))
    val evalIds = toks.filter(col("bucket") >= trainPct)
      .select(col("doc_id").as("q_id"))
    agreementTable(evalIds, bm25Top, exactTop, "n_bm25", "n_exact")
  }

  /** Shared agreement-table core for the l106/l109 audits: per query id in
    * `qIds`, the two top-k lists' sizes, intersection size, and rank-1
    * agreement (zeroes for queries absent from a leg — left joins).
    * Every input is an id-rank table (≤k rows per query), so all four
    * comparison joins are id-only. */
  private def agreementTable(qIds: DataFrame, aTop: DataFrame,
                             bTop: DataFrame, aName: String,
                             bName: String): DataFrame = {
    val nA = aTop.groupBy(col("q_id")).agg(count(lit(1)).as(aName))
    val nB = bTop.groupBy(col("q_id")).agg(count(lit(1)).as(bName))
    val common = aTop.select(col("q_id"), col("doc_id"))
      .join(bTop.select(col("q_id"), col("doc_id")), Seq("q_id", "doc_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_common"))
    val top1 = aTop.filter(col("rank") === 1L)
      .select(col("q_id"), col("doc_id").as("a1"))
      .join(bTop.filter(col("rank") === 1L)
        .select(col("q_id"), col("doc_id").as("b1")), Seq("q_id"))
      .select(col("q_id"),
        (col("a1") === col("b1")).cast(LongType).as("top1_agree"))
    qIds
      .join(nA, Seq("q_id"), "left")
      .join(nB, Seq("q_id"), "left")
      .join(common, Seq("q_id"), "left")
      .join(top1, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col(aName), lit(0L)).as(aName),
        coalesce(col(bName), lit(0L)).as(bName),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(col("top1_agree"), lit(0L)).as("top1_agree"))
  }

  /** Dense (embedding-cosine) eval→train exact top-k — the dense leg of
    * the hybrid-retrieval family, in (q_id, doc_id, rank) form. Exact
    * brute force by design (the l44/l104 audit discipline: the agreement/
    * fusion tables ARE ground-truth readouts; production serving runs the
    * IVF/PQ/LSH candidate machinery shipped elsewhere). The id-aligned
    * convention (modalityAgreement's): vec_id and doc_id share one id
    * space, so split buckets agree across planes by construction. */
  def denseEvalTopK(vectors: DataFrame, k: Int = 5,
                    trainPct: Int = 80): DataFrame = {
    val bucket = TextOps.splitBucket(col("vec_id"))
    val trainV = vectors.filter(bucket < trainPct)
    val evalV = vectors.filter(bucket >= trainPct)
    Similarity.bruteForceTopK(evalV, trainV, k)
      .select(col("qid").as("q_id"), col("nid").as("doc_id"), col("rank"))
  }

  /** SPARSE-vs-DENSE retrieval agreement audit (l109) — per eval query
    * present in BOTH planes (id-aligned eval vectors): BM25 top-k over
    * train documents vs exact-cosine top-k over train vectors — list
    * sizes, intersection, rank-1 agreement. The hybrid-retrieval
    * calibration table: high agreement says one index suffices; low
    * agreement says the planes surface DIFFERENT neighbors and a fused
    * serve (l110/S29) is worth its cost.
    *
    * Scale shape: both legs collapse to ≤k (q_id, doc_id) id-pairs before
    * the agreement joins (the l106 discipline); the query universe is the
    * eval VECTOR ids — vanishingly small, broadcast into the sparse
    * restriction semi-join. */
  def hybridAgreement(docs: DataFrame, vectors: DataFrame, k: Int = 5,
                      trainPct: Int = 80): DataFrame = {
    val qIds = vectors
      .filter(TextOps.splitBucket(col("vec_id")) >= trainPct)
      .select(col("vec_id").as("q_id"))
    val sparse = bm25TopK(docs, k, trainPct)
      .join(broadcast(qIds), Seq("q_id"), "left_semi")
      .select(col("q_id"), col("doc_id"), col("rank"))
    val dense = denseEvalTopK(vectors, k, trainPct)
    agreementTable(qIds, sparse, dense, "n_sparse", "n_dense")
  }

  /** RECIPROCAL-RANK-FUSION of two (q_id, doc_id, rank) top-k tables
    * (Cormack, Clarke & Büttner, SIGIR'09 — the standard hybrid-serving
    * combiner): fused score = Σ_legs ⌊10⁶/(60+rank)⌋, summed as BIGINT
    * (the l25 snap idiom — the floor makes the sum order-free and
    * bit-identical cross-engine where the textbook 1/(60+r) double sum
    * would hinge on addition order); fused top-k per query, ties on
    * doc_id. Carries each leg's rank (null where a doc appeared in one
    * leg only — the full-outer join IS the fusion's value add).
    *
    * Pure function of two rank tables: per-query independence makes the
    * streaming serve (S29) equal batch fusion for any micro-batch split. */
  def rrfFuse(sparseTop: DataFrame, denseTop: DataFrame, k: Int = 5,
              k0: Int = 60): DataFrame = {
    def contrib(r: Column): Column =
      floor(lit(1000000.0) / (r.cast(DoubleType) + lit(k0.toDouble)))
        .cast(LongType)
    val joined = sparseTop
      .select(col("q_id"), col("doc_id"), col("rank").as("sparse_rank"))
      .join(denseTop
        .select(col("q_id"), col("doc_id"), col("rank").as("dense_rank")),
        Seq("q_id", "doc_id"), "full_outer")
      .select(col("q_id"), col("doc_id"),
        col("sparse_rank"), col("dense_rank"),
        (coalesce(contrib(col("sparse_rank")), lit(0L)) +
          coalesce(contrib(col("dense_rank")), lit(0L))).as("rrf_e6"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("rrf_e6").desc, col("doc_id"))
    joined.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("doc_id"), col("rrf_e6"), col("rank"),
        col("sparse_rank"), col("dense_rank"))
  }

  /** Hybrid SERVE — score an arriving query batch (q_id, text, embedding)
    * against the static sparse model (postings + stats) AND the static
    * train vectors, fused by RRF. The serving core shared by the batch
    * declared form (hybridRrfTopK) and the streaming serve (S29) — the
    * S26/S27 model-boundary discipline: each batch pays its own term join
    * + |Q_batch|-sized dense scan only; index refresh = swap the persisted
    * tables at a trigger boundary. */
  def hybridServe(queries: DataFrame, postings: DataFrame, stats: DataFrame,
                  trainVecs: DataFrame, k: Int = 5): DataFrame = {
    val sparse = bm25Serve(queries.select(col("q_id"), col("text")),
      postings, stats, k)
    val dense = Similarity.bruteForceTopK(
      queries.select(col("q_id").as("vec_id"), col("embedding")),
      trainVecs, k)
      .select(col("qid").as("q_id"), col("nid").as("doc_id"), col("rank"))
    rrfFuse(sparse.select(col("q_id"), col("doc_id"), col("rank")), dense, k)
  }

  /** RETRIEVABILITY audit (l113; Azzopardi & Vinay, CIKM'08) — per TRAIN
    * document: how many eval queries retrieve it in the sparse top-k and
    * in the dense top-k, zeros included (the left joins are the point:
    * documents NO query can surface are dead index weight — they pay
    * storage and scan cost in every serve yet can never be returned —
    * and documents with outsized counts are retrieval hubs, the sparse
    * twin of l79's dense-only in-degree). `in_dense_index` marks
    * id-aligned membership in the vector table so a dense zero is
    * readable (absent ≠ never-retrieved).
    *
    * Scale shape: both legs collapse to ≤k·|eval| (q_id, doc_id) id-pairs
    * before the per-doc counts; the train-doc spine is ids only. */
  def retrievability(docs: DataFrame, vectors: DataFrame, k: Int = 5,
                     trainPct: Int = 80): DataFrame = {
    val sparseHits = bm25TopK(docs, k, trainPct)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_sparse_hits"))
    val denseHits = denseEvalTopK(vectors, k, trainPct)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dense_hits"))
    val inDense = vectors
      .filter(TextOps.splitBucket(col("vec_id")) < trainPct)
      .select(col("vec_id").as("doc_id"), lit(1L).as("in_dense_index"))
    docs.filter(TextOps.splitBucket(col("doc_id")) < trainPct)
      .select(col("doc_id"))
      .join(sparseHits, Seq("doc_id"), "left")
      .join(denseHits, Seq("doc_id"), "left")
      .join(inDense, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_sparse_hits"), lit(0L)).as("n_sparse_hits"),
        coalesce(col("n_dense_hits"), lit(0L)).as("n_dense_hits"),
        coalesce(col("in_dense_index"), lit(0L)).as("in_dense_index"))
  }

  /** The fused declared form (l110): queries = eval-split ids present in
    * BOTH planes (text from documents, vector from embeddings — the
    * id-aligned join), models built on the train split. */
  def hybridRrfTopK(docs: DataFrame, vectors: DataFrame, k: Int = 5,
                    trainPct: Int = 80): DataFrame = {
    val bucket = TextOps.splitBucket(col("doc_id"))
    val (postings, stats) = bm25Model(docs.filter(bucket < trainPct))
    val trainV = vectors.filter(TextOps.splitBucket(col("vec_id")) < trainPct)
    val queries = docs.filter(bucket >= trainPct)
      .select(col("doc_id").as("q_id"), col("text"))
      .join(vectors.filter(TextOps.splitBucket(col("vec_id")) >= trainPct)
        .select(col("vec_id").as("q_id"), col("embedding")), Seq("q_id"))
    hybridServe(queries, postings, stats, trainV, k)
  }
}
