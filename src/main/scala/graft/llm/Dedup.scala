package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document deduplication operators — the training-data-pipeline plane.
  *
  * Scale design (the 100 TB story):
  *  - Exact dedup is one hash-groupBy on a 32-byte digest — the shuffle
  *    carries (digest, doc_id), never the text.
  *  - MinHash+LSH is THE scale path for near-dup detection: candidate pairs
  *    come from equality joins on band hashes, so work per task is bounded
  *    by band-bucket occupancy — no all-pairs comparison ever happens.
  *  - The inverted-index Jaccard operator (jaccardPairs) is the exact
  *    baseline: grouped postings shuffle on the shingle, so an ultra-common
  *    shingle is a skew unit (its posting list lands on one task). Fine for
  *    verification corpora; at 100 TB use minhashNearDups (or drop shingles
  *    with document frequency above a cutoff — the standard stopword-shingle
  *    guard — before pair expansion).
  *  - SimHash packs a document into one 64/32-bit signature; banding the
  *    signature bytes gives equality-join candidate generation just like
  *    MinHash-LSH, and verification is a single XOR+popcount.
  *
  * All hashes are md5-derived so the DuckDB correctness oracles reproduce
  * every signature bit-for-bit (see queries/LlmDeclared).
  */
object Dedup {

  /** Connected-components execution telemetry (round-12 directive #1a):
    * l66's bimodal wall-clock (7.3 s vs 1.9 s on identical code+data)
    * needed per-invocation evidence of WHICH algorithm the auto probe
    * selected and WHERE the rounds spent their time — prose arbitration
    * had run out. Every propagation/star round records its wall ms here;
    * `nearDupClustersAuto` records the verdict. Dev probes read
    * `CcLog.drain()` after an action; `GRAFT_DEBUG_CC=1` additionally
    * prints each round as it completes. Zero overhead in the hot path
    * beyond a few `System.nanoTime` calls per ROUND (not per row), and
    * nothing reads it unless a harness asks. */
  object CcLog {
    final case class Round(algo: String, round: Int, changed: Long, ms: Double)
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Round]
    @volatile var lastAlgo: String = ""
    private[llm] def add(algo: String, round: Int, changed: Long, ms: Double): Unit = {
      synchronized { buf += Round(algo, round, changed, ms) }
      if (sys.env.contains("GRAFT_DEBUG_CC"))
        println(f"[cc] $algo round $round changed=$changed ${ms}%.0f ms")
    }
    def drain(): Seq[Round] = synchronized { val r = buf.toList; buf.clear(); r }
  }

  /** Exact duplicate groups: one row per distinct text, with the copy count
    * and the surviving (minimum) doc_id. The canonical "keep one copy"
    * compaction: group on md5(text) — the shuffle carries 32-byte digests,
    * not documents. */
  def exactDupGroups(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_doc_id"))

  /** Per-document DUPLICATED-SHINGLE fraction — the corpus-level substring-
    * duplication signal (Lee et al., "Deduplicating Training Data Makes
    * Language Models Better"): for each document, what share of its distinct
    * n-gram shingles also appears in at least one OTHER document. High
    * dup_frac flags boilerplate-heavy or near-duplicate documents without
    * naming the partner doc — the per-doc profile that pair operators
    * (jaccardPairs) can't produce without materializing O(pairs) rows.
    *
    * Scale: shingles are md5-hashed at the scan, so both shuffles carry
    * (digest, doc_id) — never shingle text. One groupBy(h) computes document
    * frequency; the join back to the per-doc shingle table reuses that same
    * hash partitioning (exchange reuse — no third shuffle of the postings),
    * then one groupBy(doc_id) folds the profile. No pair expansion anywhere,
    * so a corpus-wide boilerplate shingle costs one hot aggregation key
    * (mergeable partial aggregates), not a d² pair blow-up. */
  def dupShingleProfile(docs: DataFrame, n: Int = 3): DataFrame = {
    val sh = TextOps.docShingles(docs, n)
      .select(col("doc_id"), md5(col("s")).as("h"))
    val df = sh.groupBy("h").agg(count(lit(1)).as("nd"))
    sh.join(df, "h")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_frac",
        col("n_dup").cast(DoubleType) / col("n_shingles"))
  }

  /** Exact n-gram Jaccard similarity for all pairs sharing >= 1 shingle,
    * via grouped inverted-index postings (one shuffle on the shingle,
    * singleton postings pruned, pairs expanded in-row — see `common`).
    * Returns (doc_a, doc_b, jaccard) for pairs with jaccard >= minJ.
    *
    * `maxDocFreq` is the skew guard for the 100 TB case: a shingle present
    * in d documents contributes d² candidate pairs on ONE task — a single
    * boilerplate sentence corpus-wide is a job-killing hot key. Setting the
    * guard drops shingles with document frequency > maxDocFreq before the
    * join (and from the denominators — jaccard is then computed over the
    * discriminative shingle sets, the standard stopword-shingle treatment).
    * None = exact textbook jaccard, the oracle-checked default. */
  def jaccardPairs(docs: DataFrame, n: Int = 3, minJ: Double = 0.5,
                   maxDocFreq: Option[Long] = None): DataFrame = maxDocFreq match {
    case None =>
      // Set sizes ride THROUGH the posting lists (commonWithSizes): one
      // extra long per exploded shingle row buys the elimination of the
      // sizes aggregation, both size joins, and the shingle-table
      // materialization those joins forced. One scan, two shuffles
      // (postings, pair counts), no checkpoint.
      // (Round-6 measured dead ends, for the record: sizes as a separate
      // per-doc projection re-ran the shingle transform per consumer —
      // l02 2.2 s → 6.2 s; the transform is the dominant cost and must
      // run exactly once.)
      commonWithSizes(docs, n)
        .withColumn("jaccard",
          col("n_common").cast(DoubleType)
            / (col("na") + col("nb") - col("n_common")))
        .filter(col("jaccard") >= minJ)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
    case Some(t) =>
      // With a df guard, sizes count the SURVIVING shingles — they are only
      // known after the hot-set drop, so this path keeps the materialized
      // table + joins shape ("write the shingle silver table, then join").
      val shAll = TextOps.docShingles(docs, n).localCheckpoint()
      val hot = shAll.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .filter(col("df") > t).select(col("s"))
      // hot set is tiny by construction (only corpus-wide boilerplate) —
      // broadcast anti-join, no extra shuffle of the shingle table
      val sh = shAll.join(broadcast(hot), Seq("s"), "left_anti")
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      common(sh)
        .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
        .withColumn("jaccard",
          col("n_common").cast(DoubleType) / (col("na") + col("nb") - col("n_common")))
        .filter(col("jaccard") >= minJ)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** `common` with each document's distinct-shingle count riding along in
    * the posting-list structs. The shingle ARRAY is materialized at doc
    * granularity (localCheckpoint of ~|docs| compact array rows — far
    * smaller than the exploded table) because `size` and `explode` both
    * consume it and Catalyst's CollapseProject would otherwise inline the
    * expensive transform into BOTH consumers (measured: 3× slower — the
    * staged-projection "bound attribute" trick does not survive projection
    * collapsing; only a materialization barrier does).
    * Output: (doc_a, na, doc_b, nb, n_common). */
  private def commonWithSizes(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), TextOps.shinglesFromTokens(col("toks"), n).as("shs"))
      .localCheckpoint()
      .select(col("doc_id"), size(col("shs")).cast("long").as("n_sh"),
        explode(col("shs")).as("s"))
      .groupBy(col("s"))
      .agg(array_sort(collect_list(struct(col("doc_id"), col("n_sh")))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(col("ds"), posexplode(col("ds")).as(Seq("i", "a")))
      .select(col("a"),
        explode(slice(col("ds"), col("i") + lit(2), size(col("ds")))).as("b"))
      .groupBy(col("a.doc_id").as("doc_a"), col("a.n_sh").as("na"),
        col("b.doc_id").as("doc_b"), col("b.n_sh").as("nb"))
      .agg(count(lit(1)).as("n_common"))

  /** Shared-shingle counts per unordered doc pair (doc_a < doc_b, n_common)
    * — the core of every exact near-dup operator here.
    *
    * Shape: grouped postings, NOT a self-join. `groupBy(shingle) →
    * collect_list(doc_id)` builds the inverted index in one shuffle; posting
    * lists of length 1 — the overwhelming majority in any natural corpus —
    * are pruned BEFORE pair expansion (a singleton shingle cannot witness a
    * pair; the round-4 self-join shuffled and probed them all anyway, and
    * they were ~95% of the postings). Surviving lists expand to their
    * ordered pairs via TWO CHAINED GENERATORS — posexplode the sorted
    * posting list to (i, doc_a), then explode the list's tail past i — so
    * a k-length posting emits its k²/2 pairs as a stream of O(k)-sized
    * rows; no operator ever materializes the full pair array (the flatten/
    * transform form built all k²/2 structs inside ONE row first — an
    * executor-OOM unit for a hot shingle). Then one count-aggregate on
    * (doc_a, doc_b).
    *
    * 100 TB note: a hot shingle still CONTRIBUTES k²/2 generated rows —
    * streamed, so memory-safe, but quadratic work on one task. The
    * `maxDocFreq` guard in the callers (jaccardPairs / containmentPairs)
    * drops such shingles before this point; that is the skew treatment,
    * this generator chain is the memory treatment. */
  private def common(sh: DataFrame): DataFrame =
    sh.groupBy(col("s")).agg(array_sort(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(col("ds"), posexplode(col("ds")).as(Seq("i", "doc_a")))
      .select(col("doc_a"),
        explode(slice(col("ds"), col("i") + lit(2), size(col("ds")))).as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))

  /** The universal-hash family behind MinHash: hash_i(x) = (a_i·x + b_i)
    * mod P over ONE md5-derived 32-bit base value. P prime > 2^32; x < 2^32
    * and a_i < 2^31 keep every product inside a signed 64-bit long — exact
    * integer arithmetic, identical in any engine. (The round-3 first cut
    * ran k=16 independent md5 calls per shingle — 4.2M digests at sf0.1,
    * the whole operator's hot spot; one digest + 16 affine transforms is
    * the standard formulation and ~3× cheaper.) */
  val minhashP: Long = 4294967311L
  def minhashA(i: Int): Long = 2L * i + 1
  def minhashB(i: Int): Long = 104729L * i

  /** k min-aggregates over an exploded (doc_id, s) shingle table — one
    * pass, one md5 per shingle. */
  private def signaturesFromShingles(sh: DataFrame, k: Int): DataFrame =
    sh.withColumn("h", TextOps.md5Int32(col("s")))
      .groupBy(col("doc_id"))
      .agg(
        min((col("h") * minhashA(0) + minhashB(0)) % minhashP).as("m0"),
        (1 until k).map(i =>
          min((col("h") * minhashA(i) + minhashB(i)) % minhashP).as(s"m$i")): _*)

  /** MinHash signatures: k independent min-hashes per document. */
  def minhashSignatures(docs: DataFrame, n: Int = 3, k: Int = 16): DataFrame =
    signaturesFromShingles(TextOps.docShingles(docs, n), k)

  /** LSH banding of a k-wide signature into `bands` bands of k/bands rows
    * each: (doc_id, band_idx, band_hash). Docs agreeing on ANY band become
    * candidates via an equality join on (band_idx, band_hash). `carry`
    * names extra columns to ride along (e.g. the event-time column for the
    * streaming S12 path). */
  def lshBands(sig: DataFrame, k: Int = 16, bands: Int = 4,
               carry: Seq[String] = Nil): DataFrame = {
    // bands must tile the signature exactly: truncation would silently
    // drop signature components (changing the documented s-curve), and
    // bands > k would give r = 0 — every band md5(""), i.e. one global
    // bucket and the O(N²) pair blow-up this path exists to avoid.
    require(bands >= 1 && k % bands == 0,
      s"lshBands: bands ($bands) must divide k ($k)")
    val r = k / bands
    val bandCols = (0 until bands).map(b =>
      md5(concat_ws(",", (0 until r).map(j => col(s"m${r * b + j}")): _*)))
    sig.select(col("doc_id") +: carry.map(col) :+
      posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_hash")): _*)
  }

  /** PER-ROW MinHash band signatures — the same (k, bands) banding as
    * minhashSignatures + lshBands, but as a PURE PROJECTION: the k
    * min-hashes fold over the row's own shingle array (array_min of an
    * affine transform) instead of aggregating an exploded shingle table,
    * so there is no shuffle and no aggregation state. That makes it legal
    * in a streaming scan — the S12/S15 incremental near-dup paths — and
    * right for small per-batch inputs; over a FULL corpus the aggregated
    * form wins (k transform+array_min passes per row cost ~6× the
    * one-md5-per-shingle aggregation — measured at sf0.1 in the l52
    * composition; see bandIndex). Values are identical to the aggregated
    * form (min over a multiset ignores duplicates; both fold the same
    * md5-derived 32-bit hashes through the same exact integer arithmetic).
    *
    * Output: (doc_id, carry…, band_idx, band_hash) — `bands` rows per doc.
    * TEXT IS NOT CARRIED: what flows to any downstream state store is the
    * 32-char band hash, never content (the S11 digest-only discipline).
    * Docs with no n-shingle (< n tokens) are dropped, matching the batch
    * form (whose groupBy over the exploded shingle table never sees them). */
  def bandSignatures(docs: DataFrame, n: Int = 3, k: Int = 16, bands: Int = 4,
                     carry: Seq[String] = Nil): DataFrame = {
    val sigs = docs
      .withColumn("shs", TextOps.shinglesFromTokens(TextOps.tokens(col("text")), n))
      .filter(size(col("shs")) >= 1)
      // Materialize the 32-bit shingle hashes ONCE: HOF lambdas re-evaluate
      // their argument per reference (the round-3 trap, SURVEY §2.7), and
      // the k min-folds below each reference this array. The hashes come
      // from the NATIVE positional_gram_hashes at n = 1 (per-element
      // md5-int32 in one codegen digest pass — pinned equal to the
      // md5Int32 HOF twin in ExpressionSpec): the interpreted
      // transform(shs, s => md5Int32(s)) paid the ~50× HOF interpreter
      // tax on every shingle of the S12/S14/S15 streaming ingest path.
      .withColumn("hs",
        call_function("positional_gram_hashes", col("shs"), lit(1)))
      .select(col("doc_id") +: carry.map(col) ++: (0 until k).map(i =>
        array_min(transform(col("hs"),
          h => (h * minhashA(i) + minhashB(i)) % minhashP)).as(s"m$i")): _*)
    lshBands(sigs, k, bands, carry)
  }

  /** MinHash-LSH near-duplicate pairs: band-equality candidates, then exact
    * Jaccard verification of ONLY the candidates. The candidate set is
    * usually tiny relative to the corpus, but its size is data-dependent
    * (a corpus with a large exact-dup cluster yields O(cluster²) same-band
    * pairs), so no broadcast hint is forced — AQE promotes the join to
    * broadcast at runtime when the set is actually small, and falls back to
    * a shuffle join when it isn't (forcing it could OOM the driver). */
  def minhashNearDups(docs: DataFrame, n: Int = 3, k: Int = 16, bands: Int = 4,
                      minJ: Double = 0.5): DataFrame = {
    // The shingle table serves the signature pass AND the verification
    // pass (twice) AND the size computation — materialize ONCE at document
    // granularity (compact array rows; see commonWithSizes for why the
    // barrier is required) and explode on demand per consumer; sizes are
    // then a pure projection instead of a corpus-wide groupBy.
    val docSh = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), TextOps.shinglesFromTokens(col("toks"), n).as("shs"))
      .localCheckpoint()
    val sh = docSh.select(col("doc_id"), explode(col("shs")).as("s"))
    val sizes = docSh.select(col("doc_id"), size(col("shs")).cast("long").as("n_sh"))
    val bandsDf = lshBands(signaturesFromShingles(sh, k), k, bands)
    val cand = bandsDf.as("x").join(bandsDf.as("y"),
        col("x.band_idx") === col("y.band_idx")
          && col("x.band_hash") === col("y.band_hash")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val common = cand
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"),
        col("doc_b") === col("sb.doc_id") && col("sa.s") === col("sb.s"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("n_common").cast(DoubleType) / (col("na") + col("nb") - col("n_common")))
      .filter(col("jaccard") >= minJ)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** MinHash ESTIMATOR AUDIT — the measurement a pipeline runs when tuning
    * (k, bands): for every band-candidate pair, the signature-agreement
    * estimate ĵ = |{i : mᵢ(A)=mᵢ(B)}| / k next to the exact Jaccard and the
    * signed error. E[ĵ] = J(A,B) (each component agrees with probability J);
    * the audit makes the variance at this k VISIBLE instead of assumed.
    *
    * Same scale shape as minhashNearDups (band-equality candidates, exact
    * verification of candidates only, shingles materialized once at doc
    * granularity). The exact side LEFT-joins the shared-shingle counts:
    * a band collision between docs sharing NO shingle (possible — two
    * different shingles can md5 to the same 32-bit h, making min-hashes
    * agree) must appear as j_exact = 0, not vanish.
    * Output: (doc_a, doc_b, n_match, j_est, j_exact, err). */
  def minhashEstimateAudit(docs: DataFrame, n: Int = 3, k: Int = 16,
                           bands: Int = 4): DataFrame = {
    val docSh = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), TextOps.shinglesFromTokens(col("toks"), n).as("shs"))
      .localCheckpoint()
    val sh = docSh.select(col("doc_id"), explode(col("shs")).as("s"))
    val sizes = docSh.select(col("doc_id"), size(col("shs")).cast("long").as("n_sh"))
    val sig = signaturesFromShingles(sh, k).localCheckpoint()
    val bandsDf = lshBands(sig, k, bands)
    val cand = bandsDf.as("x").join(bandsDf.as("y"),
        col("x.band_idx") === col("y.band_idx")
          && col("x.band_hash") === col("y.band_hash")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
      // checkpointed: cand feeds BOTH the estimate join and the exact-
      // common join below — without materialization the band self-join +
      // distinct (the audit's most expensive intermediate) would execute
      // twice, the same double-execution the sig checkpoint prevents
      .localCheckpoint()
    val nMatch = (0 until k)
      .map(i => when(col(s"a.m$i") === col(s"b.m$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val withEst = cand
      .join(sig.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sig.as("b"), col("doc_b") === col("b.doc_id"))
      .select(col("doc_a"), col("doc_b"), nMatch.as("n_match"))
    val common = cand
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"),
        col("doc_b") === col("sb.doc_id") && col("sa.s") === col("sb.s"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    withEst
      .join(common, Seq("doc_a", "doc_b"), "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_match"),
        (col("n_match").cast(DoubleType) / k).as("j_est"),
        (col("n_common").cast(DoubleType)
          / (col("na") + col("nb") - col("n_common"))).as("j_exact"))
      .withColumn("err", col("j_est") - col("j_exact"))
  }

  /** The persisted BAND INDEX of a curated corpus: the distinct
    * (band_idx, band_hash) pairs of its MinHash-LSH banding. This is the
    * state an INCREMENTAL dedup pipeline carries between crawl batches —
    * 32-char hashes only (the S11 digest-only discipline: content never
    * enters the index), at most `bands` rows per corpus document before
    * dedup, typically far fewer after. At 100 TB the index is parquet on
    * the lake, re-read per batch; nothing here scales with document SIZE,
    * only with corpus cardinality × bands. */
  def bandIndex(corpus: DataFrame, n: Int = 3, k: Int = 16,
                bands: Int = 4): DataFrame =
    // The AGGREGATED MinHash form (explode + k min-aggregates), not the
    // per-row HOF form: over a full corpus the HOF's k transform+array_min
    // passes per document cost ~6× the one-md5-per-shingle aggregation
    // (measured at sf0.1: 8.7 s → 1.4 s for the l52 composition). The two
    // forms are value-identical (tested); the HOF form's niche is
    // streaming legality (S12/S15) and small per-batch inputs.
    lshBands(minhashSignatures(corpus, n, k), k, bands)
      .select(col("band_idx"), col("band_hash")).distinct()

  /** INCREMENTAL near-dup admission — the operator a growing corpus runs
    * per crawl batch: verdict every NEW document against the persisted
    * band index of the already-curated corpus, without ever touching
    * corpus text. Verdicts:
    *   - `dup_corpus`: some band collides with the index (a near-dup of an
    *     already-admitted document);
    *   - `dup_batch`:  no corpus collision wins, but some band bucket holds
    *     an earlier (smaller doc_id) batch document — first occurrence
    *     within the batch survives;
    *   - `kept`:       no collision anywhere (including documents too short
    *     to shingle — no bands means no evidence of duplication).
    *
    * The batch-first-occurrence rule is deliberately INDEPENDENT of the
    * corpus verdicts: a one-at-a-time sequential admission would re-judge
    * each doc against survivors only, but that is an inherently serial
    * chain. This parallel policy differs only by also dropping batch
    * near-twins of `dup_corpus` docs — conservative over-dropping of
    * near-dups of rejected documents, the desirable direction — and in
    * exchange is deterministic, order-independent, and one pass.
    *
    * Scale shape (the reason this is NOT minhashNearDups on corpus∪batch):
    * the corpus contributes only its distinct band pairs (broadcast-sized
    * relative to its text); the batch is banded (pure projection), window-
    * min'd per band bucket (ONE exchange on band keys — bucket occupancy
    * is bounded by batch near-dup cluster size, the same unit every LSH
    * path already lives with), probed against the index on the SAME keys
    * (partitioning reused; AQE broadcasts the index when it fits), and
    * folded to one verdict per doc (one exchange on doc_id). No pair
    * expansion at all — the within-batch leg needs bucket MINIMA, never
    * pairs. Duplicate rows in a non-distinct `index` cannot change
    * verdicts (the per-doc fold is a boolean max). */
  def incrementalDedup(batch: DataFrame, index: DataFrame, n: Int = 3,
                       k: Int = 16, bands: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("band_idx"), col("band_hash"))
    val verdicts = bandSignatures(batch, n, k, bands)
      .withColumn("first_id", min(col("doc_id")).over(w))
      .join(index.withColumn("in_corpus", lit(true)),
        Seq("band_idx", "band_hash"), "left")
      .groupBy(col("doc_id"))
      .agg(
        max(coalesce(col("in_corpus"), lit(false))).as("dup_c"),
        max(col("doc_id") > col("first_id")).as("dup_b"))
    batch.select(col("doc_id"))
      .join(verdicts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("dup_c"), lit("dup_corpus"))
          .when(col("dup_b"), lit("dup_batch"))
          .otherwise(lit("kept")).as("verdict"))
  }

  /** Index maintenance for the incremental loop: fold a batch's ADMITTED
    * documents into the persisted band index. Union-distinct on 32-char
    * hashes — at 100 TB this is the cheap side of the loop (the index is
    * orders of magnitude smaller than the corpus text it stands for). */
  def extendIndex(index: DataFrame, admitted: DataFrame, n: Int = 3,
                  k: Int = 16, bands: Int = 4): DataFrame =
    index.unionByName(bandIndex(admitted, n, k, bands)).distinct()

  /** Near-dup CLUSTERING — the step that turns pairwise matches into a
    * dedup decision: connected components over the near-dup pair graph,
    * labeling every member with its component's minimum doc_id (the
    * canonical survivor). Iterative min-label propagation: each round,
    * every node takes the min label among itself and its neighbors;
    * converges in O(component diameter) rounds — near-dup clusters are
    * shallow (dups of dups), so a handful of joins. `localCheckpoint`
    * truncates lineage per round (without it the plan doubles each
    * iteration). At extreme scale the same loop upgrades to the
    * large-star/small-star formulation; the contract is unchanged.
    * Accepts any (doc_a, doc_b) edge list — ordering, duplicates, and
    * self-pairs are all normalized by the symmetric-closure step.
    * Returns (doc_id, cluster_id) for every doc in at least one pair. */
  def nearDupClusters(pairs: DataFrame, maxIters: Int = 30): DataFrame = {
    val (labels, converged) = propagateRounds(pairs.localCheckpoint(), maxIters)
    if (!converged) throw new IllegalArgumentException(
      s"label propagation did not converge in $maxIters rounds")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** CC with the algorithm AUTO-SELECTED by a cheap diameter probe: run
    * min-label propagation for up to `probeRounds` rounds (one shuffle
    * each — the cheap path on the dense low-diameter clumps near-dup
    * graphs usually are); on non-convergence fall back to star
    * contraction (O(log n) on any shape — chains, paraphrase ladders).
    * The probe's cost on the fallback path is bounded: `probeRounds`
    * label-only shuffles against an edge table that stays put. Callers
    * get the documented best-of-both without knowing the graph shape;
    * both algorithms label every node with its component minimum, so the
    * choice is invisible in the output.
    *
    * probeRounds sizing: convergence DETECTION costs one extra round past
    * the effective diameter (the round that observes changed=0), and
    * measured near-dup graphs settle in 2–4 rounds (sf0.1: l39 in 2, l30
    * in 4) — 6 buys slack for both without letting a genuine chain run
    * long: a diameter-6 graph is still firmly propagation territory (6
    * cheap label shuffles vs ~6 heavier stages PER star round). */
  def nearDupClustersAuto(pairs: DataFrame, probeRounds: Int = 6): DataFrame = {
    // One materialization shared by the probe and (if needed) the fallback
    // — the pair generation upstream is usually the expensive subtree, so
    // its materialization is timed into CcLog too ("ckpt" row): l66's
    // round-12 diagnosis needed to split "pair generation slow" from
    // "label loop slow" inside one invocation.
    val t0 = System.nanoTime()
    val p = pairs.localCheckpoint()
    CcLog.add("ckpt", 0, -1L, (System.nanoTime() - t0) / 1e6)
    val (labels, converged) = propagateRounds(p, probeRounds)
    val out =
      if (converged) {
        CcLog.lastAlgo = "propagate"
        labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
      } else {
        // SEEDED star fallback (round 21): the probe's partial labels are
        // not thrown away — contract the graph by them first. Propagation
        // invariants after any number of rounds: label(v) is in v's
        // component and ≤ v, and the component minimum m keeps label(m) =
        // m (nothing in its component is smaller). Quotienting edges by
        // the labeling therefore preserves the component partition (la,
        // lb adjacent in the condensed graph iff some original edge joins
        // their pre-images), every condensed component still contains its
        // original minimum as a node, and star contraction on the
        // condensed graph — clusters the probe already collapsed are now
        // single nodes, so it is far smaller than the original — labels
        // each probe label with the true component minimum; one
        // composition join labels the original nodes. The previous form
        // re-ran star from scratch on the full edge set, paying the 6
        // probe rounds for nothing (measured: every perceptual-plane
        // apply graph at sf0.1 takes this path, 5 full-graph star rounds
        // each).
        CcLog.lastAlgo = "star"
        val condensed = p
          .join(labels.withColumnRenamed("id", "doc_a")
            .withColumnRenamed("label", "la"), "doc_a")
          .join(labels.withColumnRenamed("id", "doc_b")
            .withColumnRenamed("label", "lb"), "doc_b")
          .select(col("la").as("doc_a"), col("lb").as("doc_b"))
          .filter(col("doc_a") =!= col("doc_b"))
          .distinct()
          .localCheckpoint()
        val starLab = starContract(condensed, 48)
          .select(col("doc_id").as("label"), col("cluster_id"))
        labels.join(starLab, Seq("label"), "left")
          .select(col("id").as("doc_id"),
            coalesce(col("cluster_id"), col("label")).as("cluster_id"))
      }
    if (sys.env.contains("GRAFT_DEBUG_CC"))
      println(s"[cc] auto selected ${CcLog.lastAlgo}")
    out
  }

  /** The min-label-propagation loop body over a PRE-MATERIALIZED pair
    * table (every caller localCheckpoints first — the symmetric closure
    * below reads it twice, and re-checkpointing here would pay a pointless
    * extra copy on the Auto path). Returns the (id, label) table after the
    * last round plus whether the loop CONVERGED within `maxIters`; a
    * non-converged labeling is still a valid partial contraction (label ∈
    * component, label ≤ id, component minima label themselves) — the Auto
    * fallback seeds star contraction with it instead of discarding the
    * probe's work. */
  private def propagateRounds(p: DataFrame, maxIters: Int)
      : (DataFrame, Boolean) = {
    // Symmetric edge list plus one self-loop per node: a single
    // join+groupBy then computes min over {self} ∪ neighbors AND carries
    // the node's previous label (via the self-loop row) for the
    // convergence test — one shuffle stage per round, no separate
    // old-vs-new join (the round-3 loop ran two joins + a union per
    // round; at tiny per-round data the fixed stage cost dominates, and
    // at scale one fewer shuffle of the labels table per round is real).
    val sym = p.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .unionByName(p.select(col("doc_b").as("a"), col("doc_a").as("b")))
    // Pre-partition the closure on the JOIN key before checkpointing:
    // localCheckpoint preserves the hash partitioning, so every
    // propagation round's join reuses it and only the (smaller) labels
    // side shuffles — without this, each round re-exchanges the full edge
    // table, and edges is the big table (diameter × |edges| shuffle volume
    // at 100 TB; the repartition is one extra setup shuffle).
    val edges = sym.unionByName(sym.select(col("a"), col("a").as("b")))
      .distinct()
      .withColumn("self", col("a") === col("b"))
      .repartition(col("b"))
      // lazy: round 1's changed-count job materializes it (labels' init
      // filter reads the same RDD) — no separate setup job
      .localCheckpoint(eager = false)
    var labels = edges.filter(col("self"))
      .select(col("a").as("id"), col("a").as("label"))
    var changed = 1L
    var iters = 0
    while (changed > 0 && iters < maxIters) {
      val tRound = System.nanoTime()
      // LAZY checkpoint + exact changed-count in ONE job: the count is the
      // first action over the checkpoint-marked RDD, so it materializes
      // (and persists) every partition as a side effect — an eager
      // localCheckpoint here would pay a separate full-materialization job
      // per round, doubling the blocking actions in a loop whose per-round
      // data is small enough that fixed stage cost dominates (this was
      // round 10's l16 directive; the star loop uses the same discipline).
      // The previous round-1 limit(1) shortcut is gone for the same
      // reason: with the fold, the exact count costs exactly the
      // materialization job the checkpoint needed anyway.
      val next = edges
        .join(labels.withColumnRenamed("id", "b"), "b")
        .groupBy(col("a").as("id"))
        .agg(min(col("label")).as("label"),
          min(when(col("self"), col("label"))).as("prev"))
        .localCheckpoint(eager = false)
      iters += 1
      changed = next.filter(col("label") =!= col("prev")).count()
      labels = next.select(col("id"), col("label"))
      CcLog.add("propagate", iters, changed, (System.nanoTime() - tRound) / 1e6)
    }
    (labels, changed == 0)
  }

  /** Connected components by ALTERNATING STAR CONTRACTION (large-star /
    * small-star — Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14): O(log n) rounds on ANY graph, vs nearDupClusters'
    * O(diameter) min-label propagation. Same contract: (doc_id,
    * cluster_id = component minimum), one row per node of the pair graph.
    *
    * Which to use at 100 TB: near-dup graphs are dense local clumps —
    * diameter 2-4 — where propagation's ONE shuffle per round beats the
    * two star phases. But chain-shaped graphs (containment ladders,
    * entity-resolution paths) have diameter O(n) in the worst case, where
    * propagation needs O(n) blocking rounds and star contraction stays
    * logarithmic (the path-graph test pins exactly the case propagation
    * cannot finish). Both phases are plain join+groupBy rounds:
    *  - large-star at u: m = min(N(u) ∪ u); re-point every neighbor v > u
    *    at m. Never increases the edge count; kills long chains by
    *    doubling the reach of small ids.
    *  - small-star at u (edges held at their larger endpoint): m =
    *    min(N⁻(u) ∪ u); re-point u and its smaller neighbors at m.
    * At the joint fixpoint the edge set is a star forest whose centers are
    * the component minima (paper, Thm 4.1) — the canonical edge list IS
    * the label table. Convergence is an exact two-sided anti-join count,
    * per-round state is lineage-truncated; the min(m) per group computes
    * as a map-side partial, so a hot star center never concentrates its
    * neighbor list in one task the way a collect_list formulation would. */
  def nearDupClustersStar(pairs: DataFrame, maxIters: Int = 48): DataFrame =
    // maxIters budgets ~log2(n) + c composite rounds (the 300-node path in
    // LlmSpec converges in <= 12 ~ log2(300)+4); 48 covers n ~ 2^44 nodes —
    // a bound no real corpus exceeds, kept finite only to fail loudly on a
    // logic regression rather than loop forever.
    starContract(pairs.localCheckpoint(), maxIters)

  /** Star-contraction body over a PRE-MATERIALIZED pair table (same
    * single-checkpoint discipline as propagateLabels). */
  private def starContract(p: DataFrame, maxIters: Int): DataFrame = {
    val nodes = p.select(col("doc_a").as("id"))
      .unionByName(p.select(col("doc_b").as("id")))
      .distinct()
      // lazy: only read once, by the final labeling join
      .localCheckpoint(eager = false)
    // canonical undirected edges, held at the LARGER endpoint: (u > v)
    var es = p.select(
        greatest(col("doc_a"), col("doc_b")).as("u"),
        least(col("doc_a"), col("doc_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      // lazy: the stats() action right below materializes it — an eager
      // checkpoint here paid a separate full job (the propagateRounds
      // one-job-per-round discipline)
      .localCheckpoint(eager = false)
    // One aggregation action per round computes BOTH the cardinality and an
    // order-independent set digest (xor of per-row xxhash64 — sets are
    // DISTINCT, so no cancellation). Any difference in either proves the
    // sets differ with no further work; only a candidate fixpoint (both
    // equal) pays the deterministic except-confirm, and only once.
    def stats(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        call_function("bit_xor", xxhash64(col("u"), col("v")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var (esCount, esDigest) = stats(es)
    var changed = 1L
    var iters = 0
    while (changed > 0 && iters < maxIters) {
      val tRound = System.nanoTime()
      // large-star works on the symmetric view (every node sees ALL its
      // neighbors); emits (v, m) for strictly larger neighbors only —
      // output is canonical (v > m) by construction of m as a minimum
      val sym = es.unionByName(es.select(col("v").as("u"), col("u").as("v")))
      val mL = sym.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = sym.filter(col("v") > col("u"))
        .join(mL, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      // small-star on the canonical (larger-endpoint) view: re-point u and
      // every (≤ u) neighbor at the group min; output again canonical
      val mS = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val next = large.join(mS, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(mS.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
        // lazy: the stats() action below materializes the checkpoint —
        // same one-job-per-round fold as propagateLabels
        .localCheckpoint(eager = false)
      iters += 1
      // Both sides are DISTINCT sets, so equal cardinality plus an empty
      // one-sided difference proves set equality. The (count, digest) pair
      // from the single stats action settles every changed round for free;
      // the except runs only to CONFIRM a candidate fixpoint — exactness is
      // never delegated to the digest (a colliding round would just pay one
      // extra except and keep looping).
      val (nextCount, nextDigest) = stats(next)
      changed =
        if (nextCount != esCount || nextDigest != esDigest) 1L
        else next.except(es).count()
      es = next
      esCount = nextCount
      esDigest = nextDigest
      CcLog.add("star", iters, changed, (System.nanoTime() - tRound) / 1e6)
    }
    require(changed == 0, s"star contraction did not converge in $maxIters rounds")
    // fixpoint = star forest: es is exactly (member, componentMin) for every
    // non-center node; centers and singletons label themselves
    nodes
      .join(es.select(col("u").as("id"), col("v").as("lbl")), Seq("id"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("lbl"), col("id")).as("cluster_id"))
  }

  /** LEAKAGE-SAFE train/val/test split — the cluster-aware variant of
    * TextAnalysis.stableSplit. Hashing doc_id (l15) puts two near-
    * duplicate documents in independent buckets, so ~2·valPct% of every
    * near-dup pair straddles the train/eval boundary and the eval loss is
    * contaminated by memorized twins. Here the split bucket hashes the
    * near-dup CLUSTER id instead: every member of a cluster lands in the
    * same split by construction, and singleton docs (their own cluster)
    * degrade to exactly l15's assignment. Same splitBucket discipline as
    * every other split-deriving operator (TextOps.splitBucket).
    *
    * Scale: the cluster labeling is nearDupClustersAuto's story (label
    * shuffles over the pair graph, never text); the label table carries
    * only docs that appear in some pair, so the left join is an id-to-id
    * sort-merge on doc_id and the split itself is a projection. */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame,
                       trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val clusters = nearDupClustersAuto(pairs)
    val keyed = docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    keyed.select(col("doc_id"), col("cluster_id"),
      TextOps.splitLabel(col("cluster_id"), trainPct, valPct).as("split"))
  }

  /** Near-dup cluster-SIZE profile — the dedup-savings estimator read
    * before committing to a full apply: for each cluster size k, the
    * cluster count, the docs they hold, and the docs a keep-one apply
    * would remove ((k−1) per cluster — Σ n_removable IS the apply's
    * removal count, cross-checked against dedupApply in LlmSpec).
    * Singletons (docs in no pair) appear as size-1 clusters, so n_docs
    * totals the corpus and the singleton share is read off the first
    * row. A heavy tail here (few giant clusters) also warns that the
    * apply's anti-join side will be dominated by those clusters' losers.
    *
    * Scale: the cluster labeling is nearDupClustersAuto's story; after
    * it, everything is id-arithmetic — one count per cluster id, one
    * ≤|sizes|-key histogram agg, both map-side-combining. */
  def clusterSizeProfile(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val clusters = nearDupClustersAuto(pairs)
    docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(coalesce(col("cluster_id"), col("doc_id")).as("cid"))
      .groupBy(col("cid")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"),
        ((col("cluster_size") - 1) * col("n_clusters")).as("n_removable"))
  }

  /** Cluster COHESION audit — edge density of every multi-member near-dup
    * cluster, aggregated by cluster size: n_clusters, total/min/max direct
    * pair-edges, the possible-edge count, and the pooled density
    * Σedges / Σpossible. The over-merge alarm read BEFORE trusting a
    * transitive dedup apply: connected components merge by CHAINS (A~B,
    * B~C puts A,C in one cluster with no direct pair), so a low-density
    * size band says the minJ threshold is linking documents that are not
    * pairwise similar — the classic MinHash-dedup hairball — while
    * density ≈ 1 certifies clusters are near-cliques and keep-one loses
    * nothing pairwise-distinct. Complements l66's size profile (how big)
    * with the structural question (how tight).
    *
    * Scale: shares the pair table with every cluster consumer (the
    * caller passes it; declared form reuses l16's jaccardPairs subtree);
    * labeling is nearDupClustersAuto's story; after it everything is
    * id-arithmetic — one membership join keyed on doc ids, one count per
    * cluster, one ≤|sizes|-key histogram — and the output is bounded by
    * the distinct-size count (the l66 discipline: a viral cluster is one
    * row's max_edges, never a collected list). Density divides exact
    * longs once; n(n−1)/2 is exact in double far past any real cluster
    * size (< 2^26 members). */
  def clusterCohesion(pairs: DataFrame): DataFrame = {
    val p = pairs.select(col("doc_a"), col("doc_b")).localCheckpoint()
    val clusters = nearDupClustersAuto(p)
    val sizes = clusters.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"))
    val edges = p
      .join(clusters.withColumnRenamed("doc_id", "doc_a"), "doc_a")
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("n_edges"))
    sizes.join(edges, "cluster_id")
      .groupBy(col("n_members"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("n_edges")).as("n_edges_total"),
        min(col("n_edges")).as("min_edges"),
        max(col("n_edges")).as("max_edges"))
      .withColumn("n_edges_possible",
        (col("n_clusters") * ((col("n_members") * (col("n_members") - 1)) / 2))
          .cast(LongType))
      .withColumn("pooled_density",
        col("n_edges_total").cast(DoubleType)
          / col("n_edges_possible").cast(DoubleType))
  }

  /** KEEP-ONE SURVIVORS — the canonical-per-cluster subset of the corpus
    * (cluster-minimum doc_id wins, l30's rule; docs in no pair survive
    * unchanged): the "unique data" view every dedup-adjusted downstream
    * reads. Schema-preserving on the projected columns, so any corpus
    * operator composes over it directly — effectiveTokens is its
    * per-source audit, and epochPlan over it budgets on unique tokens
    * (the l74 declared composition).
    *
    * Scale: cluster labeling is nearDupClustersAuto's story; the
    * survivor filter is one id-keyed left join deciding keep from
    * (cluster_id, doc_id) per row — no window, no anti-join (the losers
    * set is never materialized). */
  def keepOneSurvivors(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val cols = docs.columns.map(col).toSeq
    docs.join(nearDupClustersAuto(pairs), Seq("doc_id"), "left")
      .filter(coalesce(col("cluster_id"), col("doc_id")) === col("doc_id"))
      .select(cols: _*)
  }

  /** Cross-source NEAR-DUP matrix — l49's question asked of the verified
    * near-duplicate pair graph instead of raw shingle overlap: for every
    * (unordered) source pair, how many near-dup DOCUMENT pairs connect
    * them and how many distinct documents those pairs touch. The diagonal
    * (src_a = src_b) is intra-source duplication — in real crawls most of
    * the dup mass — and off-diagonal cells are the re-post/mirror edges
    * that make naive per-source mixture weights double-count. l49 says
    * "these sources share text"; this says "these sources share whole
    * near-duplicate documents", the unit a dedup apply actually removes.
    *
    * Scale: pair generation is jaccardPairs' story (inverted index, digest
    * shuffles, `maxDocFreq` skew guard at real scale — or feed
    * minhashNearDups' pairs, any (doc_a, doc_b) frame works). Labeling is
    * two id-keyed joins against an (id, source) projection — ids and short
    * strings only; AQE broadcasts the pair side when it is small. The
    * matrix itself folds in one lineage: explode each pair into its two
    * endpoints, one (src_a, src_b, doc) hash-agg dedups endpoint
    * multiplicity, one ≤|sources|²-key agg emits the cells — no second
    * pass over the pair graph, nothing to checkpoint. */
  def nearDupSourceMatrix(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val src = docs.select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")),
        Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")),
        Seq("doc_b"))
      .select(least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"),
        explode(array(col("doc_a"), col("doc_b"))).as("d"))
      .groupBy(col("src_a"), col("src_b"), col("d"))
      .agg(count(lit(1)).as("m"))
      .groupBy(col("src_a"), col("src_b"))
      // Σm counts each pair once per endpoint, so pairs = Σm / 2 — always
      // even, the cast is exact
      .agg((sum(col("m")) / 2).cast(LongType).as("n_pairs"),
        count(lit(1)).as("n_docs"))
  }

  /** Per-source EFFECTIVE-TOKEN audit — "how much unique data do I
    * actually have": per source, the doc and whitespace-token totals, the
    * docs/tokens surviving a keep-one near-dup apply (canonical = the
    * cluster's minimum doc_id, l30's rule; singletons survive), and the
    * duplicated-token fraction. This is the table mixture planning reads
    * INSTEAD of raw source sizes — a source that is 40% near-duplicate
    * text contributes far fewer unique tokens than its byte count claims,
    * and weighting by raw size over-samples it (see epochPlan for the
    * budget-side consumer).
    *
    * Scale: cluster labeling is nearDupClustersAuto's story (label-only
    * shuffles, lazy checkpoints); after it this is one id-keyed left join
    * (token counts ride as one long) and one ≤|sources|-key hash-agg with
    * map-side partials. The keep verdict is derived per row from
    * (cluster_id, doc_id) alone — no per-cluster subquery, no window. */
  def effectiveTokens(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val clusters = nearDupClustersAuto(pairs)
    docs
      .select(col("doc_id"), col("source"),
        coalesce(TextOps.tokenCount(col("text")).cast(LongType), lit(0L))
          .as("n_tok"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("keep",
        coalesce(col("cluster_id"), col("doc_id")) === col("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        count(when(col("keep"), 1)).as("n_docs_kept"),
        sum(when(col("keep"), col("n_tok")).otherwise(lit(0L)))
          .as("n_tokens_kept"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_docs_kept"), col("n_tokens_kept"),
        // one correctly-rounded division of two exact longs (cross-engine
        // bit-equal); an all-null-text source has zero tokens -> null, not
        // a DIVIDE_BY_ZERO stage failure under ANSI mode
        when(col("n_tokens") > 0,
          (col("n_tokens") - col("n_tokens_kept")).cast(DoubleType)
            / col("n_tokens").cast(DoubleType)).as("dup_token_frac"))
  }

  /** Dedup-threshold SENSITIVITY sweep — the knob-tuning table read
    * before fixing minJ: the full jaccard histogram of every
    * shingle-sharing pair (decile buckets, floor(j·10)) with the
    * cumulative "pairs at or above" count per bucket — n_pairs_ge AT a
    * bucket is exactly the pair volume a dedup run at that threshold
    * would process. A bimodal histogram (noise floor vs near-dup mass,
    * this fixture's shape) certifies that any threshold between the
    * modes is safe; mid-range mass warns the threshold choice is load-
    * bearing.
    *
    * Scale: jaccardPairs' inverted-index machinery unchanged (minJ = 0
    * keeps every sharing pair — candidate generation is identical, only
    * the post-filter differs), INCLUDING the `maxDocFreq` hot-shingle
    * guard: at real corpus sizes the sharing-pair count is governed by
    * shingle document frequency, so a sweep over everything sets the
    * guard (and/or runs on an l26 stratified sample — a threshold
    * choice needs no more). The histogram is a ≤11-key hash-agg and
    * the cumulative window runs over those ≤11 rows (pmod keeps the
    * single-partition intent explicit, the l19 rule). */
  def jaccardThresholdSweep(docs: DataFrame, n: Int = 3,
                            maxDocFreq: Option[Long] = None): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val wCum = W.partitionBy(pmod(col("bucket"), lit(1)))
      .orderBy(col("bucket").desc)
      .rowsBetween(W.unboundedPreceding, 0)
    jaccardPairs(docs, n, minJ = 0.0, maxDocFreq)
      .groupBy(floor(col("jaccard") * 10).as("bucket"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("n_pairs_ge", sum(col("n_pairs")).over(wCum))
      .select(col("bucket"), col("n_pairs"), col("n_pairs_ge"))
  }

  /** Cross-SOURCE contamination matrix — the corpus-overlap measurement
    * dataset papers publish before mixing sources: for every source pair,
    * the count of shared distinct n-gram shingles plus both containment
    * directions and Jaccard. High containment of A in B means source A is
    * largely a subset crawl/re-post of B and mixing both double-counts it.
    * Pairs sharing zero shingles are absent (the matrix's zero cells).
    *
    * Scale: the unit of aggregation is the (source, shingle-digest) pair —
    * text leaves the plan at the scan (md5 before every shuffle), and the
    * per-shingle posting is the SOURCE SET, bounded by the source count
    * (dozens), not the corpus — so the collect_set and the in-row pair
    * expansion are O(|sources|²) per shingle worst-case, never O(docs²).
    * One distinct, one groupBy(h), one tiny groupBy(pair). */
  def sourceOverlap(docs: DataFrame, n: Int = 3): DataFrame =
    sourceOverlapOnDigests(sourceShingleDigests(docs, n))

  /** The distinct per-source shingle-digest table both overlap
    * measurements read: (source, 32-char md5). Text and raw shingles die
    * in the scan projection; the distinct's shuffle carries digests. */
  private def sourceShingleDigests(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(col("source"), TextOps.tokens(col("text")).as("toks"))
      .select(col("source"),
        explode(TextOps.shinglesFromTokens(col("toks"), n)).as("s"))
      .select(col("source"), md5(col("s")).as("h"))
      .distinct()

  private def sourceOverlapOnDigests(srcSh: DataFrame): DataFrame = {
    val sizes = srcSh.groupBy("source").agg(count(lit(1)).as("n_sh"))
    val common = srcSh.groupBy("h")
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
      .filter(size(col("srcs")) >= 2)
      .select(posexplode(col("srcs")).as(Seq("i", "src_a")), col("srcs"))
      .select(col("src_a"),
        explode(slice(col("srcs"), col("i") + lit(2),
          size(col("srcs")))).as("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_common"))
    common
      .join(broadcast(sizes.select(col("source").as("src_a"), col("n_sh").as("na"))), "src_a")
      .join(broadcast(sizes.select(col("source").as("src_b"), col("n_sh").as("nb"))), "src_b")
      .select(col("src_a"), col("src_b"), col("n_common"),
        (col("n_common").cast(DoubleType) / col("na")).as("contain_a"),
        (col("n_common").cast(DoubleType) / col("nb")).as("contain_b"),
        (col("n_common").cast(DoubleType) /
          (col("na") + col("nb") - col("n_common"))).as("jaccard"))
  }

  /** Train/eval DECONTAMINATION — the dedup variant every training pipeline
    * runs before a model ships: find TRAIN-split documents that share any
    * n-gram shingle with any EVAL-split document (such train docs leak the
    * benchmark and must be dropped). The split is the same content- and
    * layout-independent md5(doc_id) bucketing as TextAnalysis.stableSplit,
    * so train/eval membership is derivable per row with NO join.
    *
    * Scale: one shingle pass over the corpus (materialized once for both
    * sides), then an inverted-index equality join whose build side is the
    * EVAL shingle set — a few percent of the corpus by construction, so
    * the join is broadcast-or-small-shuffle at any corpus size. The same
    * ultra-common-shingle skew guard as jaccardPairs applies at 100 TB
    * (drop shingles with df above a cutoff before the join); real
    * decontamination uses long shingles (n=8..13) where boilerplate
    * collisions are rare by construction.
    *
    * Returns (doc_id, n_eval_docs, n_shared_shingles) per contaminated
    * train doc. */
  def decontaminate(docs: DataFrame, n: Int = 3,
                    trainPct: Int = 80, evalFromPct: Int = 90): DataFrame = {
    // Split BEFORE shingling: the bucket is derivable from doc_id alone, so
    // each side tokenizes only its own subset (the round-4 form shingled
    // the full corpus into a checkpoint and post-filtered — 10% wasted
    // shingle work plus a corpus-wide materialization). Neither side is
    // read twice, so nothing needs checkpointing.
    val bucket = TextOps.splitBucket(col("doc_id"))
    // Digest at the scan (round-10, matching l54/l46): the exact shingle
    // join carries fixed 32-char md5s instead of raw n-gram strings, so a
    // non-broadcast eval side shuffles uniform bounded keys; the distinct
    // counts are identical modulo md5 collisions (negligible always).
    val trainSh = TextOps.docShingles(docs.filter(bucket < trainPct), n)
      .select(col("doc_id"), md5(col("s")).as("sd"))
    val evalSh = TextOps.docShingles(docs.filter(bucket >= evalFromPct), n)
      .select(col("doc_id"), md5(col("s")).as("sd"))
    trainSh.as("tr").join(evalSh.as("ev"), col("tr.sd") === col("ev.sd"))
      .groupBy(col("tr.doc_id").as("doc_id"))
      .agg(
        countDistinct(col("ev.doc_id")).as("n_eval_docs"),
        countDistinct(col("tr.sd")).as("n_shared_shingles"))
  }

  /** Decontamination N-GRAM-SIZE sweep — the "choose n" table read before
    * fixing the contamination rule: for each shingle size n, how many
    * train documents share at least one n-gram with the eval split, the
    * train fraction that is, and the shared-digest count. Small n flags
    * generously (any shared n-gram of a larger match is itself a match —
    * the contaminated set at larger n is a SUBSET of the set at smaller n,
    * so the curve is provably monotone non-increasing, asserted in
    * LlmSpec); large n only catches verbatim spans. The spread between
    * the n rows is the policy cost of strict vs loose decontamination in
    * retained documents.
    *
    * Scale: the corpus TOKENIZES ONCE (one checkpointed (doc_id, bucket,
    * tokens) projection serves every n — re-shingling is an in-row
    * transform over the bound token array, not a corpus re-scan); each
    * n's legs follow decontaminate's discipline — split before shingling,
    * digests at the scan, eval side distinct-reduced first (broadcast by
    * AQE); per-n counts are broadcast 1-row aggregates. */
  def deconNgramSweep(docs: DataFrame, ns: Seq[Int] = Seq(2, 3, 5, 8),
                      trainPct: Int = 80, evalFromPct: Int = 90): DataFrame = {
    val toks = docs
      .select(col("doc_id"), TextOps.splitBucket(col("doc_id")).as("bkt"),
        TextOps.tokens(col("text")).as("toks"))
      .localCheckpoint()
    val nTrain = broadcast(toks.filter(col("bkt") < trainPct)
      .agg(count(lit(1)).as("n_train")))
    ns.map { n =>
      val tr = toks.filter(col("bkt") < trainPct)
        .select(col("doc_id"),
          explode(TextOps.shinglesFromTokens(col("toks"), n)).as("s"))
        .select(col("doc_id"), md5(col("s")).as("sd"))
      val ev = toks.filter(col("bkt") >= evalFromPct)
        .select(explode(TextOps.shinglesFromTokens(col("toks"), n)).as("s"))
        .select(md5(col("s")).as("sd")).distinct()
      tr.join(ev, "sd")
        .agg(countDistinct(col("doc_id")).as("n_contaminated"),
          countDistinct(col("sd")).as("n_shared_digests"))
        .crossJoin(nTrain)
        .select(lit(n.toLong).as("n"), col("n_train"),
          col("n_contaminated"),
          (col("n_contaminated").cast(DoubleType)
            / col("n_train").cast(DoubleType)).as("contaminated_frac"),
          col("n_shared_digests"))
    }.reduce(_ unionByName _)
  }

  /** GRADED decontamination — per-train-document contamination FRACTION:
    * the share of each train document's distinct n-gram shingles that
    * appear anywhere in the eval split. `decontaminate` answers "which
    * docs touch the eval set and how hard"; this is the score a THRESHOLD
    * drop policy consumes ("drop if > X% of the doc's n-grams are
    * eval-tainted" — the graded overlap rule the GPT-3/PaLM contamination
    * appendices describe, which distinguishes a doc quoting one eval
    * sentence from a doc that IS an eval document).
    *
    * Scale shape: shingles become md5 DIGESTS at the scan on both sides
    * (the l46 discipline — if the eval set ever outgrows AQE's broadcast
    * threshold, the fallback shuffle join carries fixed 32-char digests,
    * never arbitrary-length shingle text; membership counts are identical
    * modulo md5 collisions, negligible at any corpus size). The eval
    * digest set distinct-reduces FIRST (small by construction — the eval
    * split is a fixed small slice), so the train side LEFT-joins a set AQE
    * broadcasts; train shingles are already distinct per doc
    * (docShingles), so the per-doc fold is plain counts (no countDistinct
    * re-shuffle), and partial aggregation means the final exchange carries
    * (doc_id, partial counts). Every train doc with ≥ 1 shingle gets a row
    * (fraction 0 when clean), unlike decontaminate's contaminated-only
    * output — a threshold policy needs the clean rows too. */
  def contaminationFraction(docs: DataFrame, n: Int = 3,
                            trainPct: Int = 80,
                            evalFromPct: Int = 90): DataFrame = {
    val bucket = TextOps.splitBucket(col("doc_id"))
    val trainSh = TextOps.docShingles(docs.filter(bucket < trainPct), n)
      .select(col("doc_id"), md5(col("s")).as("sd"))
    val evalSh = TextOps.docShingles(docs.filter(bucket >= evalFromPct), n)
      .select(md5(col("s")).as("sd")).distinct().withColumn("hit", lit(true))
    trainSh.join(evalSh, Seq("sd"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        count(when(col("hit"), lit(1))).as("n_contaminated"))
      .withColumn("contamination",
        col("n_contaminated").cast(DoubleType) / col("n_shingles"))
  }

  /** BLOOM-PREFILTERED decontamination — the 100 TB refinement of
    * `decontaminate`: before the exact train⋈eval shingle join, the train
    * side is pruned by a Bloom filter built from the eval shingle set, so
    * the join's probe input shrinks from "every train shingle" to "train
    * shingles that might collide" (typically a tiny fraction). At cluster
    * scale the filter is a broadcast bitset ORed together from executor
    * partials; here the bit positions live in a broadcast array — same
    * dataflow, same semantics, and deterministic (md5-derived positions),
    * so the whole pipeline — including the filter's false positives —
    * oracle-checks bit-for-bit.
    *
    * k = 2 hash functions (both positions from ONE md5 digest — hex chars
    * 1-8 and 9-16, the standard double-hashing construction — so the hot
    * path hashes each train shingle once, not k times) over m = 2^17 bits.
    * m sizing: set bits ≈ k·|eval shingles|, and the FP rate is (fill)^k —
    * m must be a small multiple of the eval set, NOT of the train side
    * being pruned; an undersized filter saturates and prunes nothing.
    * The probe is a broadcast hash SEMI-JOIN per position — Spark's O(1)
    * bitset-membership form (an `array_contains` over a bits array would
    * be an O(m) linear scan per row, and a Catalyst map literal is also
    * linear — broadcast hash tables are the engine's hash structure).
    *
    * Per flagged train doc, returns (doc_id, n_candidates, n_shared):
    * candidates = shingles passing the Bloom filter (shared + false
    * positives), shared = exactly present in the eval set. n_candidates −
    * n_shared is the observed FP volume — the number the filter's m/k
    * sizing trades against shuffle bytes at scale. Docs whose candidates
    * are ALL false positives still appear (n_shared = 0): exactly the rows
    * a verify-free pruner would wrongly drop, made visible. */
  def bloomDecontaminate(docs: DataFrame, n: Int = 3, m: Int = 131072,
                         trainPct: Int = 80, evalFromPct: Int = 90): DataFrame = {
    def pos(i: Int): Column =
      conv(substring(md5(col("s")), 1 + 8 * i, 8), 16, 10)
        .cast(LongType) % m
    val bucket = TextOps.splitBucket(col("doc_id"))
    val trainSh = TextOps.docShingles(docs.filter(bucket < trainPct), n)
    val evalSh = TextOps.docShingles(docs.filter(bucket >= evalFromPct), n)
      .select(col("s")).distinct().localCheckpoint()
    // The "bitset": every set position, once (≤ m rows, broadcast twice).
    val bits = evalSh
      .select(explode(array(pos(0), pos(1))).as("p")).distinct()
      .localCheckpoint()
    val candidates = trainSh
      .withColumn("p0", pos(0)).withColumn("p1", pos(1))
      .join(broadcast(bits.withColumnRenamed("p", "p0")), Seq("p0"), "left_semi")
      .join(broadcast(bits.withColumnRenamed("p", "p1")), Seq("p1"), "left_semi")
      .select(col("doc_id"), col("s"))
    candidates
      .join(broadcast(evalSh.withColumn("hit", lit(1))), Seq("s"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_candidates"), count(col("hit")).as("n_shared"))
  }

  /** CONTAINMENT pairs — the asymmetric cousin of Jaccard: |A∩B| / |A|,
    * which catches a short document fully embedded inside a longer one
    * (quote-inclusion, page-within-crawl), where symmetric Jaccard stays
    * low because the union is dominated by the long side. Directional:
    * (doc_a, doc_b, containment) means doc_a's shingles are covered by
    * doc_b to degree `containment`; both directions are emitted.
    *
    * Same inverted-index join shape — and the same `maxDocFreq` skew guard
    * — as jaccardPairs: a shingle in d documents contributes d² candidate
    * pairs on one task, so at 100 TB drop shingles with document frequency
    * above the cutoff before pair expansion (containment denominators then
    * count the surviving shingles, exactly as jaccard's do). None = exact
    * textbook containment, the oracle-checked default. */
  def containmentPairs(docs: DataFrame, n: Int = 3, minC: Double = 0.6,
                       maxDocFreq: Option[Long] = None): DataFrame = {
    // The intersection is symmetric: aggregate each unordered pair ONCE
    // (doc_a < doc_b — half the pair volume of a <> formulation), then emit
    // both directions from the one n_common row. Set sizes ride through the
    // posting lists (commonWithSizes) so no sizes join is needed at all.
    // Materialize the aggregate once: the unionByName below reads it twice,
    // and exchange reuse only amortizes the shuffle — the final aggregation
    // subtree would execute twice without the checkpoint.
    val com = (maxDocFreq match {
      case None => commonWithSizes(docs, n)
      case Some(t) =>
        // Guarded path mirrors jaccardPairs: sizes must count the SURVIVING
        // shingles (known only after the hot-set drop), so this path keeps
        // the materialized-table + sizes-joins shape.
        val shAll = TextOps.docShingles(docs, n).localCheckpoint()
        val hot = shAll.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .filter(col("df") > t).select(col("s"))
        val sh = shAll.join(broadcast(hot), Seq("s"), "left_anti")
        val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
        common(sh)
          .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
          .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
          .select(col("doc_a"), col("na"), col("doc_b"), col("nb"), col("n_common"))
    }).localCheckpoint()
    val directed = com
      .select(col("doc_a"), col("doc_b"), col("na"), col("n_common"))
      .unionByName(com
        .select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b"),
          col("nb").as("na"), col("n_common")))
    directed
      .withColumn("containment", col("n_common").cast(DoubleType) / col("na"))
      .filter(col("containment") >= minC)
      .select(col("doc_a"), col("doc_b"), col("containment"))
  }

  /** DIRECTIONAL source-containment matrix — "who copies whom": for every
    * ORDERED source pair, how many ≥ minC containment pairs point from it
    * (doc in src_contained is ≥ minC contained in a doc of src_container)
    * and how many distinct documents are the contained side. l68's
    * near-dup matrix is symmetric (who SHARES documents); this one is the
    * asymmetry readout — a large (A→B) cell against a small (B→A) cell
    * says A carries excerpts/re-posts OF B's content (aggregators,
    * scrapers, quote-farms), the crawl-forensics fact that decides which
    * source the l75 excerpt-removal apply should favor, and a mixture
    * signal l49's symmetric overlap can't express. The diagonal is
    * intra-source excerpting.
    *
    * Scale: pair generation is containmentPairs' story (inverted index,
    * one symmetric aggregate emitting both directions, maxDocFreq guard
    * at real scale); labeling is two id-keyed joins against an (id,
    * source) projection (the l68 shape — ids and short strings only);
    * the matrix agg lands on ≤ |sources|² cells. */
  def sourceContainmentMatrix(docs: DataFrame, n: Int = 3,
                              minC: Double = 0.6,
                              maxDocFreq: Option[Long] = None): DataFrame = {
    val pairs = containmentPairs(docs, n, minC, maxDocFreq)
    val src = docs.select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("doc_a"),
        col("source").as("src_contained")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"),
        col("source").as("src_container")), "doc_b")
      .groupBy(col("src_contained"), col("src_container"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("doc_a")).as("n_docs_contained"))
  }

  /** End-to-end dedup MATERIALIZATION — the query a pipeline user actually
    * runs ("give me the clean corpus"): compose near-dup pair generation →
    * connected-components clustering → survivor selection (each cluster's
    * minimum doc_id) → anti-join the losers out of the corpus. The loser
    * set is tiny relative to the corpus (cluster members minus one per
    * cluster), so the final anti-join broadcasts at any corpus size.
    * Returns the surviving (doc_id, text_md5). */
  def dedupApply(docs: DataFrame, n: Int = 3, minJ: Double = 0.5): DataFrame = {
    // Auto-selected CC: n-gram near-dup graphs are low-diameter clumps
    // (propagation probe converges), but the composition must not hang on
    // a pathological chain — the probe falls back to star contraction.
    val clusters = nearDupClustersAuto(jaccardPairs(docs, n, minJ))
    val losers = clusters.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"))
    // Digest BEFORE the anti-join: AQE broadcasts the small losers side,
    // but if it ever falls back to a shuffle join, the corpus side's
    // shuffle write must carry (doc_id, 32-char digest), never the text —
    // the join is on doc_id alone, so projecting first changes nothing.
    docs.select(col("doc_id"), md5(col("text")).as("text_md5"))
      .join(losers, Seq("doc_id"), "left_anti")
  }

  /** QUALITY-AWARE dedup APPLY — the survivor-selection policy real
    * curation pipelines run: within each near-dup cluster keep the member
    * with the HIGHEST `score` (ties broken by minimum doc_id), instead of
    * dedupApply's arbitrary minimum-id representative. `score` is any
    * deterministic per-document Column over `docs` (the declared query
    * uses token count — "keep the longest version", the common choice when
    * near-dups are truncations/excerpts of one another).
    *
    * Scale shape: identical to dedupApply plus one small aggregation —
    * the corpus is scored IN THE SCAN and only (doc_id, q) longs reach
    * the membership join, the winner argmax is a hash-agg over members
    * (max of a (score, -doc_id) struct — one pass, no per-cluster window
    * over the corpus), and the losers anti-join against the pre-digested
    * corpus (AQE broadcasts them; a fallback shuffle carries digests). */
  def dedupApplyKeepBest(docs: DataFrame, score: Column, n: Int = 3,
                         minJ: Double = 0.5): DataFrame = {
    val clusters = nearDupClustersAuto(jaccardPairs(docs, n, minJ))
    // Score in the SCAN, then join: the shuffle carries (doc_id, q) longs
    // only. A round-10 review killed the previous "semi-join prune before
    // scoring" form — ANY non-broadcast membership join on the raw corpus
    // writes (doc_id, TEXT) to shuffle (AQE's broadcast conversion still
    // materializes the probe side's map output first), and at 100 TB that
    // text write dwarfs evaluating a scan-local score for every doc.
    // Assumption, stated: `score` is a cheap projection (the declared
    // query's token count is one codegen'd byte scan). A genuinely
    // expensive scorer should prune with an explicit broadcast membership
    // join first and accept scoring only the members.
    val members = docs.select(col("doc_id"), score.as("q"))
      .join(clusters, Seq("doc_id"))
    val winners = members.groupBy(col("cluster_id"))
      .agg((-max(struct(col("q"), (-col("doc_id")).as("nid")))
        .getField("nid")).as("keep_id"))
    val losers = members.join(winners, Seq("cluster_id"))
      .filter(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id"))
    // digest before the anti-join — same discipline as dedupApply
    docs.select(col("doc_id"), md5(col("text")).as("text_md5"))
      .join(losers, Seq("doc_id"), "left_anti")
  }

  /** SPAN-level dedup APPLY — repeated-passage removal (the RefinedWeb/
    * CCNet boilerplate-stripping step, at span granularity): split each
    * document into non-overlapping `k`-token spans, keep each distinct
    * span's FIRST occurrence corpus-wide (ordered by (doc_id, span_idx) —
    * total, so the survivor set is partition-layout independent), strip
    * every later repeat, and emit the rewritten document as a digest.
    * Per doc: (n_spans, n_kept, clean_md5) where clean_md5 hashes the
    * kept spans joined in original order. The trailing <k-token remainder
    * is outside the span stream by contract (documented, not dropped
    * silently: n_spans counts only full spans).
    *
    * Scale shape: spans leave the scan as md5 digests with (doc_id, idx) —
    * text never enters the winner computation; the first-occurrence
    * groupBy is a min(struct) hash aggregate with map-side partials (never
    * a collect of postings); the kept-index sets come back as one narrow
    * long-array row per doc. The final reconstruction join is keyed on
    * doc_id — the ONE place document text crosses an exchange, inherent to
    * any rewrite join (on a doc_id-bucketed table it is co-located and
    * shuffle-free). */
  def spanDedupApply(docs: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 1, s"span width must be >= 1: $k")
    val toks = col("toks")
    // Column./ is double division — the span count needs integer floor div
    def nSpans: Column = floor(size(toks) / k).cast("int")
    def spanText(i: Column): Column =
      concat_ws(" ", slice(toks, i * k + 1, lit(k)))
    // posexplode the START INDEX sequence, then hash as a TOP-LEVEL
    // projection: md5 inside a transform lambda runs interpreted (HOFs
    // have no codegen — the ~50× tax, SURVEY §2.6 traps), while this
    // Generate + Project shape keeps the digest inside whole-stage
    // codegen and the 32-char hex value — which the oracle replays
    // verbatim — unchanged.
    val spans = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(when(size(toks) >= k, sequence(lit(0), nSpans - 1))
          .otherwise(array().cast("array<int>"))).as(Seq("idx", "i")))
      .select(col("doc_id"), col("idx"), md5(spanText(col("i"))).as("h"))
    val winners = spans
      .groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("idx"))).as("w"))
      .select(col("w.doc_id").as("doc_id"), col("w.idx").as("idx"))
    val keptIdx = winners.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("idx"))).as("kept"))
    docs.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .join(keptIdx, Seq("doc_id"), "left")
      .select(col("doc_id"),
        nSpans.cast(LongType).as("n_spans"),
        coalesce(size(col("kept")), lit(0)).cast(LongType).as("n_kept"),
        md5(concat_ws(" ", transform(
          coalesce(col("kept"), array().cast("array<int>")),
          i => spanText(i)))).as("clean_md5"))
  }

  /** 32-bit SimHash per document over distinct 3-gram shingles: shingle →
    * md5-int32; signature bit i is set iff Σ_features (±1 by feature bit i)
    * > 0. One explode + one groupBy with 32 sum-aggregates — a single
    * shuffle of (doc_id, 32 ints). Features are SHINGLES, not unigrams: on
    * a small-vocabulary corpus most documents contain most words, making
    * unigram simhash degenerate (near-identical signatures corpus-wide);
    * the shingle space is large enough that only true near-dups land close. */
  def simhash(docs: DataFrame, bits: Int = 32, n: Int = 3): DataFrame = {
    val toks = TextOps.docShingles(docs, n)
      .withColumn("th", TextOps.md5Int32(col("s")))
    val sums = toks.groupBy(col("doc_id")).agg(
      sum(shiftright(col("th"), 0).bitwiseAND(lit(1L)) * 2 - 1).as("b0"),
      (1 until bits).map(i =>
        sum(shiftright(col("th"), i).bitwiseAND(lit(1L)) * 2 - 1).as(s"b$i")): _*)
    sums.select(col("doc_id"),
      (0 until bits).map(i =>
        when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
        .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-duplicate pairs: band the 32-bit signature into 4 bytes,
    * equality-join on any agreeing byte (candidate generation), verify with
    * XOR+popcount <= maxHamming. */
  def simhashNearDups(docs: DataFrame, maxHamming: Int = 6): DataFrame = {
    val sig = simhash(docs)
    val banded = sig.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), 8 * b).bitwiseAND(lit(255L))): _*))
        .as(Seq("band_idx", "band_val")))
    banded.as("x").join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx")
          && col("x.band_val") === col("y.band_val")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast(LongType)
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** SimHash ESTIMATOR audit — the l43 measurement for the OTHER sketch:
    * every simhash band-candidate pair's Hamming distance next to its
    * exact n-gram Jaccard (left-joined — a band collision between docs
    * sharing no shingle must read j_exact = 0, not vanish). Hamming over
    * the 32-bit signature is the simhash proxy for similarity; this table
    * makes its correlation with ground truth VISIBLE at the corpus's own
    * pair distribution, completing the estimator-audit family (l43
    * MinHash, l44 embedding-LSH, l87 IVF, this one SimHash) — the four
    * sketches a pipeline chooses between, each priced against exact truth.
    *
    * Scale: candidates are simhashNearDups' story (byte-banded equality
    * join on the 32-bit signature — digest-only). The exact side
    * re-tokenizes ONLY the documents appearing in some candidate pair
    * (semi-join before the shingle transform) and builds l02's inverted
    * index over that REDUCED corpus — byte-band collision is loose (a
    * 4×8-bit tiling of 32 bits admits weakly-similar pairs), so |cand|
    * can be large, and the first-cut per-pair verification (cand joined
    * twice against the FULL exploded shingle table by (doc_id, s))
    * shuffled the whole corpus's shingles for both join sides: measured
    * 12.1 s at sf0.1 vs ~1.6 s for this form (same-run-sentinel
    * normalized) — the audit's cost is now bounded by the candidate-doc
    * neighborhood, not the corpus. A hot
    * shingle within the candidate set streams k²/2 pairs exactly as
    * `common` documents; at 100 TB apply the maxDocFreq guard upstream
    * as jaccardPairs does. */
  def simhashEstimateAudit(docs: DataFrame, n: Int = 3,
                           maxHamming: Int = 6): DataFrame = {
    val cand = simhashNearDups(docs, maxHamming).localCheckpoint()
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .unionByName(cand.select(col("doc_b").as("doc_id")))
      .distinct()
    // broadcast the id-only candidate set (the l30 losers pattern): a
    // shuffled semi-join would move the corpus WITH text through an
    // exchange; broadcast keeps the text inside the scan
    val docSh = docs
      .join(broadcast(candDocs), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), TextOps.shinglesFromTokens(col("toks"), n).as("shs"))
      .localCheckpoint()
    val sizes = docSh.select(col("doc_id"), size(col("shs")).cast("long").as("n_sh"))
    val common = docSh
      .select(col("doc_id"), explode(col("shs")).as("s"))
      .groupBy(col("s")).agg(array_sort(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(col("ds"), posexplode(col("ds")).as(Seq("i", "doc_a")))
      .select(col("doc_a"),
        explode(slice(col("ds"), col("i") + lit(2), size(col("ds")))).as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("cc"))
    cand
      .join(common, Seq("doc_a", "doc_b"), "left")
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("hamming"),
        (coalesce(col("cc"), lit(0L)).cast(DoubleType)
          / (col("na") + col("nb") - coalesce(col("cc"), lit(0L))))
          .as("j_exact"))
  }

  /** EXCERPT-REMOVAL apply — the ASYMMETRIC dedup policy l27's
    * containment pairs enable but symmetric keep-one can't express: drop
    * every document whose shingle set is ≥ `minC` contained in another
    * document's, keeping the supersets (quotes, excerpts and partial
    * re-posts vanish; the fullest version of the content survives — the
    * complement of jaccard dedup, which treats both members of an
    * asymmetric pair as equals). Drop rule: doc A drops for pair (A, B)
    * iff containment(A in B) ≥ minC AND A is the SMALLER side (fewer
    * distinct shingles; equal sizes drop the larger doc_id). The rule is
    * well-founded — each connected overlap group's maximal doc under
    * (n_shingles, −doc_id) never drops, so a survivor always exists even
    * under mutual containment (exact dups drop to the minimum id, the
    * l01/l30 convention).
    *
    * Scale: pair generation is commonWithSizes' story (inverted index,
    * posting-list pair streaming; at 100 TB apply the maxDocFreq guard
    * upstream exactly as containmentPairs documents). The verdict is a
    * per-row predicate over (na, nb, n_common) — no window, no second
    * pass — and the loser set anti-joins the pre-digested corpus (the
    * dedupApply shape: ids + 32-char digests only). */
  def containmentDedupApply(docs: DataFrame, n: Int = 3,
                            minC: Double = 0.9): DataFrame = {
    val com = commonWithSizes(docs, n)
    val losers = com
      .select(col("doc_a"), col("na"), col("doc_b"), col("nb"),
        col("n_common"))
      .unionByName(com.select(col("doc_b").as("doc_a"),
        col("nb").as("na"), col("doc_a").as("doc_b"),
        col("na").as("nb"), col("n_common")))
      .filter(col("n_common").cast(DoubleType) / col("na") >= minC &&
        (col("na") < col("nb") ||
          (col("na") === col("nb") && col("doc_a") > col("doc_b"))))
      .select(col("doc_a").as("doc_id")).distinct()
    docs.select(col("doc_id"), md5(col("text")).as("text_md5"))
      .join(losers, Seq("doc_id"), "left_anti")
  }

  /** Corpus NOVELTY curve (Heaps'-law saturation audit) — per corpus
    * decile in the content-independent md5(doc_id) order, the distinct
    * n-gram shingles appearing in that decile, how many appear there for
    * the FIRST time, the first-seen fraction, and the cumulative distinct
    * vocabulary: the "is more crawl still adding new content" table read
    * before paying for the next 10% of data. The md5 decile is a random
    * permutation of the corpus (TextOps.splitBucket's discipline), so the
    * curve is the unbiased expected-novelty-at-fraction-f estimate — the
    * flattening of frac_new is Heaps-law saturation, and the marginal
    * vocab per decile is the new-data value signal LLM52's incremental
    * admission acts on at the document level.
    *
    * Scale: shingles become md5 digests in the scan projection and the
    * decile is derivable per row (no rank, no sort, no join) — the only
    * corpus-sized shuffles are the (digest, decile) distinct and the
    * per-digest min agg, both digests+ints with map-side partials. The
    * distinct cell table is localCheckpointed because both the seen and
    * first-seen branches read it. Everything after is a ≤10-row table;
    * the cumulative window runs over those rows (pmod single-partition
    * intent, the l19/l65 rule). frac_new is one exact division. */
  def noveltyCurve(docs: DataFrame, n: Int = 3): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val wCum = W.partitionBy(pmod(col("decile"), lit(1)))
      .orderBy(col("decile"))
      .rowsBetween(W.unboundedPreceding, 0)
    val cells = TextOps.docShingles(docs, n)
      .select(md5(col("s")).as("h"),
        floor(TextOps.splitBucket(col("doc_id")).cast(DoubleType) / 10.0)
          .cast(LongType).as("decile"))
      .distinct()
      .localCheckpoint()
    val seen = cells.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_shingles_seen"))
    val first = cells.groupBy(col("h"))
      .agg(min(col("decile")).as("decile"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_new_shingles"))
    seen.join(first, Seq("decile"), "left")
      .na.fill(0L, Seq("n_new_shingles"))
      .withColumn("frac_new",
        col("n_new_shingles").cast(DoubleType)
          / col("n_shingles_seen").cast(DoubleType))
      .withColumn("vocab_cumulative", sum(col("n_new_shingles")).over(wCum))
      .select(col("decile"), col("n_shingles_seen"), col("n_new_shingles"),
        col("frac_new"), col("vocab_cumulative"))
  }

  /** Source-overlap SKETCH audit — l49's pairwise source-Jaccard measured
    * from per-source BOTTOM-K sketches (the k smallest 52-bit shingle
    * hashes per source) instead of the full shingle inventory, with the
    * exact l49 Jaccard and signed error alongside: the certification table
    * read before trusting the sketch on a corpus where the exact pass is
    * the expensive one. Estimator: with M = the k smallest of A ∪ B
    * (computable from the two sketches alone), Ĵ = |M ∩ A ∩ B| / |M| —
    * the standard bottom-k estimator; when |A ∪ B| ≤ k the sketch IS the
    * set and Ĵ is exact by construction.
    *
    * Scale: the per-source sketch is `bounded_top_m` (plans.BoundedTopM)
    * on the negated hash — map-side ≤k-entry heaps per source, the
    * exchange carries |sources|·P serialized heaps, never a per-source
    * window over the corpus-wide shingle set (the l48/l55 straggler
    * shape). The sketch table is |sources|×k longs — persistable, and
    * bottom-k merge is associative, so a new crawl batch extends it
    * without re-scanning old sources (the l52 incremental discipline
    * applied to the overlap measurement). Pair expansion happens on that
    * tiny table only. Hashes are the first 13 md5 hex chars (52 bits —
    * exactly representable in the aggregate's double score, so negation
    * and selection are bit-exact cross-engine); the exact side reuses
    * full-md5 distinct counts, so the reported error includes the 52-bit
    * truncation's (negligible) collision contribution. */
  def sourceSketchAudit(docs: DataFrame, n: Int = 3, k: Int = 128): DataFrame = {
    // ONE tokenize+shingle+distinct pass feeds both legs: the sketch's
    // 52-bit hash is a prefix of the full md5, so it derives from the
    // shared digest table (localCheckpointed — the exact leg reads it
    // too). The re-distinct after truncation collapses the (negligible)
    // prefix collisions so the sketch input is a true SET of 52-bit
    // values (the oracle's DISTINCT source, h) — a digest+int shuffle,
    // not a second corpus scan.
    val srcH = sourceShingleDigests(docs, n).localCheckpoint()
    val sketches = sketchFromDigests(srcH, k)
    val pairs = sketches.as("a")
      .join(sketches.as("b"), col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
        col("a.sk").as("ska"), col("b.sk").as("skb"))
      .withColumn("m",
        slice(array_sort(array_union(col("ska"), col("skb"))), 1, k))
      .select(col("src_a"), col("src_b"),
        size(col("m")).cast(LongType).as("n_sketch"),
        (size(array_intersect(array_intersect(col("m"), col("ska")),
          col("skb"))).cast(DoubleType)
          / size(col("m")).cast(DoubleType)).as("j_est"))
    val exact = sourceOverlapOnDigests(srcH)
      .select(col("src_a"), col("src_b"), col("jaccard").as("j_exact"))
    pairs.join(exact, Seq("src_a", "src_b"), "left")
      .na.fill(0.0, Seq("j_exact"))
      .withColumn("err", col("j_est") - col("j_exact"))
  }

  /** Cross-SPLIT leakage matrix — l49's overlap measurement on the
    * train/val/test axis: for every split pair, the count of shared
    * distinct n-gram shingles plus both containment directions and
    * Jaccard. The whole-boundary audit published WITH a benchmark result:
    * l24/l54 decide per-document verdicts for the train side; this is the
    * one-table summary of every boundary at once (a non-trivial
    * train↔test cell is the "our eval is in our training set" headline
    * number, val↔test overlap warns the two holdouts are not
    * independent). Split membership is derivable per row from doc_id
    * (TextOps.splitLabel — no join), so this IS sourceOverlap's machinery
    * with the split label as the grouping key: digests before every
    * shuffle, per-shingle postings bounded by the 3 split labels. */
  def splitLeakageMatrix(docs: DataFrame, n: Int = 3,
                         trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val labeled = docs.select(
      TextOps.splitLabel(col("doc_id"), trainPct, valPct).as("source"),
      col("text"))
    sourceOverlapOnDigests(sourceShingleDigests(labeled, n))
      .withColumnRenamed("src_a", "split_a")
      .withColumnRenamed("src_b", "split_b")
  }

  /** Duplication TREND over the md5-order corpus deciles — the exact-dup
    * rate of the MARGINAL crawl batch: per decile (the l77 random-order
    * prefix discipline), how many docs duplicate a text already seen in
    * an EARLIER decile, the within-decile novel-text count, and the
    * running duplicate fraction. A rising dup_frac curve says each new
    * 10% of crawl re-fetches more of what the corpus already holds — the
    * diminishing-returns signal for continued crawling, the document-
    * level twin of l77's shingle-novelty saturation (and the measurement
    * behind l52's "dedup once, admit incrementally" operating model).
    *
    * Scale: decile and digest are scan projections (no join, no rank);
    * ONE corpus-sized exchange — the per-digest hash-agg computing each
    * text's earliest decile and per-decile copy counts via conditional
    * sums (map-side partials, digests+ints only); the ≤10-row tail runs
    * its cumulative window under the pmod single-partition intent. A doc
    * in the same decile as its text's first occurrence is NOT an
    * earlier-decile dup (first-decile copies count as novel mass there —
    * the batch-internal dups l52's dup_batch verdict covers). */
  def dupTrend(docs: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val wCum = W.partitionBy(pmod(col("decile"), lit(1)))
      .orderBy(col("decile"))
      .rowsBetween(W.unboundedPreceding, 0)
    val cells = docs.select(
      md5(col("text")).as("h"),
      floor(TextOps.splitBucket(col("doc_id")).cast(DoubleType) / 10.0)
        .cast(LongType).as("decile"))
    // (digest, decile) copy counts first — a viral text is ONE row per
    // decile here, never a collected list — then the earliest decile as
    // a ≤10-row-per-digest window over that bounded cell table
    val cellCnt = cells.groupBy(col("h"), col("decile"))
      .agg(count(lit(1)).as("n_in_cell"))
    val wMin = W.partitionBy(col("h"))
    cellCnt
      .withColumn("first_decile", min(col("decile")).over(wMin))
      .groupBy(col("decile"))
      .agg(sum(col("n_in_cell")).as("n_docs"),
        sum(when(col("first_decile") < col("decile"), col("n_in_cell"))
          .otherwise(0L)).as("n_dup_of_earlier"))
      .withColumn("dup_frac",
        col("n_dup_of_earlier").cast(DoubleType)
          / col("n_docs").cast(DoubleType))
      .withColumn("cum_docs", sum(col("n_docs")).over(wCum))
      .withColumn("cum_dups", sum(col("n_dup_of_earlier")).over(wCum))
      .withColumn("cum_dup_frac",
        col("cum_dups").cast(DoubleType) / col("cum_docs").cast(DoubleType))
      .select(col("decile"), col("n_docs"), col("n_dup_of_earlier"),
        col("dup_frac"), col("cum_docs"), col("cum_dups"),
        col("cum_dup_frac"))
  }

  /** The per-source bottom-k sketch TABLE — (source, sk: array<long>,
    * ascending) — as a standalone persistable artifact: build it once per
    * crawl batch, keep it, and merge batches associatively with
    * `mergeSourceSketches` (the l52 incremental discipline: the overlap
    * measurement never re-scans already-sketched sources). */
  def sourceSketchTable(docs: DataFrame, n: Int = 3, k: Int = 128): DataFrame =
    sketchFromDigests(sourceShingleDigests(docs, n), k)

  /** bottom-k over the distinct 52-bit truncations of a (source, md5)
    * digest table. `bounded_top_m` on the negated hash: map-side ≤k-entry
    * heaps, the exchange carries |sources|·P serialized heaps. */
  private def sketchFromDigests(srcH: DataFrame, k: Int): DataFrame =
    srcH
      .select(col("source"),
        conv(substring(col("h"), 1, 13), 16, 10).cast(LongType).as("h"))
      .distinct()
      .groupBy(col("source"))
      .agg(call_function("bounded_top_m",
        negate(col("h").cast(DoubleType)), col("h"), lit(k)).as("tm"))
      .select(col("source"),
        transform(col("tm"), x => x.getField("id")).as("sk"))

  /** Associative MERGE of two sketch tables: bottom-k of the union of two
    * bottom-k sketches IS the bottom-k of the united underlying sets (any
    * value in the true bottom-k of A ∪ B is in the bottom-k of its own
    * side — k values at most sit below it there). Sources present on one
    * side pass through. The whole computation touches ≤ 2k longs per
    * source — sketch-table work, no corpus anywhere. */
  def mergeSourceSketches(a: DataFrame, b: DataFrame,
                          k: Int = 128): DataFrame =
    a.unionByName(b)
      .select(col("source"), explode(col("sk")).as("h"))
      .distinct()
      .groupBy(col("source"))
      .agg(call_function("bounded_top_m",
        negate(col("h").cast(DoubleType)), col("h"), lit(k)).as("tm"))
      .select(col("source"),
        transform(col("tm"), x => x.getField("id")).as("sk"))

  /** LSH BAND-CONFIG S-curve sweep — the measured recall/precision of
    * every (bands, rows) tiling of one k-wide MinHash signature against
    * the exact-Jaccard ground truth at `minJ`: the table the l03 knobs
    * are chosen FROM before committing a 100 TB dedup run to one config
    * (the l43 audit trusts a single config's estimator; this one ranks
    * the configs). Emits per config: candidate-pair count, hits (candidates
    * that are true >= minJ pairs), recall, precision, and the theoretical
    * s-curve collision probability 1-(1-minJ^r)^b at the threshold — the
    * measured-vs-theory column that makes a mis-tuned config visible.
    *
    * Scale: the corpus is touched ONCE — one shingle transform (doc-
    * granularity, localCheckpoint barrier per commonWithSizes' rationale)
    * feeds the exact-truth leg and ONE k-wide signature aggregation; each
    * config then re-bands the |docs|-row signature table (a pure
    * projection, no corpus re-scan) and self-joins on (band_idx,
    * band_hash) — digest-only exchanges. Truth pairs and per-config
    * counts are 1-row broadcast aggregates; the output is |configs| rows.
    * recall/precision are single divisions of exact longs (null when the
    * denominator is 0, same on both engines via nullif). */
  def bandConfigSweep(docs: DataFrame, n: Int = 3, k: Int = 16,
                      bandConfigs: Seq[Int] = Seq(2, 4, 8, 16),
                      minJ: Double = 0.5): DataFrame = {
    val docSh = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), TextOps.shinglesFromTokens(col("toks"), n).as("shs"))
      .localCheckpoint()
    val sh = docSh.select(col("doc_id"), explode(col("shs")).as("s"))
    // exact ground truth >= minJ, consumed by every config's hit join
    val truth = docSh
      .select(col("doc_id"), size(col("shs")).cast("long").as("n_sh"),
        explode(col("shs")).as("s"))
      .groupBy(col("s"))
      .agg(array_sort(collect_list(struct(col("doc_id"), col("n_sh")))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(col("ds"), posexplode(col("ds")).as(Seq("i", "a")))
      .select(col("a"),
        explode(slice(col("ds"), col("i") + lit(2), size(col("ds")))).as("b"))
      .groupBy(col("a.doc_id").as("doc_a"), col("a.n_sh").as("na"),
        col("b.doc_id").as("doc_b"), col("b.n_sh").as("nb"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common").cast(DoubleType)
        / (col("na") + col("nb") - col("n_common")) >= minJ)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint()
    val truthN = broadcast(truth.agg(count(lit(1)).as("n_truth")))
    // ONE signature aggregation; each config re-bands this |docs|-row table
    val sig = signaturesFromShingles(sh, k).localCheckpoint()
    bandConfigs.map { b =>
      val r = k / b
      val bd = lshBands(sig, k, b)
      val cand = bd.as("x").join(bd.as("y"),
          col("x.band_idx") === col("y.band_idx")
            && col("x.band_hash") === col("y.band_hash")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
        .localCheckpoint()
      val hits = cand.join(truth, Seq("doc_a", "doc_b"), "left_semi")
      // theory at the threshold: both engines read the same decimal literal
      // (Java shortest-repr round-trips; strtod rounds once)
      val theory = 1.0 - math.pow(1.0 - math.pow(minJ, r), b)
      cand.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(broadcast(hits.agg(count(lit(1)).as("n_hits"))))
        .crossJoin(truthN)
        .select(
          lit(b.toLong).as("bands"), lit(r.toLong).as("rows_per_band"),
          col("n_candidates"), col("n_hits"), col("n_truth"),
          (col("n_hits").cast(DoubleType)
            / nullif(col("n_truth"), lit(0L)).cast(DoubleType)).as("recall"),
          (col("n_hits").cast(DoubleType)
            / nullif(col("n_candidates"), lit(0L)).cast(DoubleType))
            .as("precision"),
          lit(theory).as("p_collide_at_minj"))
    }.reduce(_ unionByName _)
  }

  /** IDF-WEIGHTED Jaccard near-dup pairs — exact weighted-set similarity
    * where each shingle carries the integer rarity weight w(h) =
    * floor(N_docs / df(h)): a corpus-wide boilerplate shingle (df ~ N)
    * weighs 1 while a near-unique one weighs ~N, so two documents sharing
    * distinctive content score high even when template text dominates
    * their plain-Jaccard union — the similarity the unweighted l02 pass
    * under-reports on template-heavy corpora. Integer weights keep every
    * sum exact cross-engine (the determinism reason to floor the classic
    * log-idf: same ordering, no transcendental).
    *
    * J_w(A,B) = sum_{h in A∩B} w(h) / sum_{h in A∪B} w(h), emitted with
    * the shared weight mass for pairs >= minW.
    *
    * Scale: ONE corpus shuffle builds the digest-keyed postings; df is
    * size(postings) — free, no separate frequency pass; both consumers
    * (per-doc weight totals, pair expansion) read the checkpointed
    * postings, so weights never join back against the corpus. Pair
    * expansion is the chained-generator stream of `common` (no
    * materialized pair arrays); `maxDocFreq` is the same quadratic-hot-key
    * guard as jaccardPairs — dropped shingles leave the denominators,
    * which is exactly the weighted story (their weight ~ 1 anyway). */
  def weightedJaccardPairs(docs: DataFrame, n: Int = 3, minW: Double = 0.5,
                           maxDocFreq: Option[Long] = None): DataFrame = {
    val sh = TextOps.docShingles(docs, n)
      .select(col("doc_id"), md5(col("s")).as("h"))
    val nDocs = broadcast(docs.agg(count(lit(1)).as("n_docs")))
    val post0 = sh.groupBy(col("h"))
      .agg(array_sort(collect_list(col("doc_id"))).as("ds"))
    val post = maxDocFreq.fold(post0)(t => post0.filter(size(col("ds")) <= t))
      .crossJoin(nDocs)
      .select(col("ds"),
        floor(col("n_docs") / size(col("ds"))).cast(LongType).as("wt"))
      .localCheckpoint()
    val docW = post
      .select(col("wt"), explode(col("ds")).as("doc_id"))
      .groupBy(col("doc_id")).agg(sum(col("wt")).as("w_doc"))
    val pairW = post.filter(size(col("ds")) >= 2)
      .select(col("wt"), col("ds"), posexplode(col("ds")).as(Seq("i", "doc_a")))
      .select(col("wt"), col("doc_a"),
        explode(slice(col("ds"), col("i") + lit(2), size(col("ds")))).as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("wt")).as("w_common"))
    pairW
      .join(docW.select(col("doc_id").as("doc_a"), col("w_doc").as("wa")), "doc_a")
      .join(docW.select(col("doc_id").as("doc_b"), col("w_doc").as("wb")), "doc_b")
      .withColumn("jw", col("w_common").cast(DoubleType)
        / (col("wa") + col("wb") - col("w_common")))
      .filter(col("jw") >= minW)
      .select(col("doc_a"), col("doc_b"), col("w_common"), col("jw"))
  }

  /** Dedup MODALITY-AGREEMENT matrix — the 2×2 contingency of the two
    * near-dup verdict sets a curation pipeline runs side by side: text
    * n-gram Jaccard pairs (jaccardPairs ≥ minJ) vs embedding cosine pairs
    * (Similarity.cosineNearDups ≥ minSim) over id-aligned corpora. The
    * (true, false) cell is copy/boilerplate duplication the embedding
    * plane misses; (false, true) is paraphrase duplication text signatures
    * miss; (true, true) is both — the table that decides whether one
    * modality's dedup suffices or the pipeline needs both (and the sanity
    * check that the two planes aren't accidentally uncorrelated).
    *
    * Scale: both pair sets come from their bounded generators (inverted-
    * index postings with the maxDocFreq skew guard; LSH bucket-equality
    * join) — never all-pairs; the FULL OUTER join keys on (a, b) id pairs
    * (longs only — no text or embedding enters this plan after the
    * generators), and the contingency agg lands on ≤4 cells with map-side
    * partials. n_docs counts distinct documents touched per cell (each
    * pair contributes two id rows; n_pairs = rows/2 exactly). */
  def modalityAgreement(docs: DataFrame, vectors: DataFrame, n: Int = 3,
                        minJ: Double = 0.5, minSim: Double = 0.3,
                        planes: Int = 8, dim: Int = 64,
                        maxDocFreq: Option[Long] = None): DataFrame = {
    val tp = jaccardPairs(docs, n, minJ, maxDocFreq)
      .select(col("doc_a").as("a"), col("doc_b").as("b"), col("jaccard"))
    val sp = Similarity.cosineNearDups(vectors, minSim, planes, dim)
      .select(col("vec_a").as("a"), col("vec_b").as("b"), col("sim"))
    tp.join(sp, Seq("a", "b"), "full_outer")
      .select(col("jaccard").isNotNull.as("text_dup"),
        col("sim").isNotNull.as("sem_dup"),
        explode(array(col("a"), col("b"))).as("d"))
      .groupBy(col("text_dup"), col("sem_dup"))
      .agg((count(lit(1)) / 2).cast(LongType).as("n_pairs"),
        countDistinct(col("d")).as("n_docs"))
  }
}
