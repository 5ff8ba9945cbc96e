package graft.streaming

import graft.schema.Schemas
import graft.datagen.DataGen
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Stateless / built-in-stateful streaming operators (S1, S3, S4, S7, S8 of
  * SURVEY §2.6). Each takes a streaming DataFrame of activity rows (schema =
  * Schemas.customerActivity) so the same transform composes onto any source
  * — rate-synthesized, file-drop CDC envelopes, or MemoryStream in tests.
  */
object StreamOps {

  /** Typed row for S11 streaming content dedup tests/sources. */
  final case class StreamDoc(doc_id: Long, text: String, ts: java.sql.Timestamp)

  /** Typed row for S14 streaming semantic dedup tests/sources. */
  final case class StreamBlob(doc_id: Long, payload: Array[Byte],
      ts: java.sql.Timestamp)

  final case class StreamVec(vec_id: Long, embedding: Array[Float],
                             ts: java.sql.Timestamp)

  /** Typed row for S29 streaming hybrid (sparse + dense) retrieval serving:
    * a query carries BOTH its text (the BM25 leg) and its embedding (the
    * cosine leg). */
  final case class StreamHybridQuery(q_id: Long, text: String,
                                     embedding: Array[Float],
                                     ts: java.sql.Timestamp)

  /** S1 — paced ingest (updateTables.py:56-59: one insert / 5 s over the
    * first 1000 ids). The pacing is *config* on a rate source, not a loop;
    * the row synthesis reuses the GEN2 expressions keyed by the rate
    * source's monotone `value`. */
  def pacedActivity(spark: SparkSession, rowsPerSecond: Double = 0.2,
                    idCount: Int = 1000, seed: Long = 42L): DataFrame = {
    // The rate source only supports integer rows/s ≥ 1, so this operator
    // honors exactly (a) integer rates and (b) unit-fraction rates 1/N
    // (emit at 1 Hz, keep every Nth row — identical average rate). Anything
    // else (1.5 rows/s, 0.3 rows/s) would be silently approximated by
    // truncation — rejected instead (round-2 advice fix).
    require(rowsPerSecond > 0, s"rowsPerSecond must be positive: $rowsPerSecond")
    val rate =
      if (rowsPerSecond >= 1.0) {
        require(math.abs(rowsPerSecond - math.rint(rowsPerSecond)) < 1e-9,
          s"rates >= 1 must be integral (rate source granularity): $rowsPerSecond")
        spark.readStream.format("rate")
          .option("rowsPerSecond", math.rint(rowsPerSecond).toLong).load()
      } else {
        val n = math.rint(1.0 / rowsPerSecond)
        require(math.abs(1.0 / rowsPerSecond - n) < 1e-9,
          s"rates < 1 must be unit fractions 1/N: $rowsPerSecond")
        spark.readStream.format("rate").option("rowsPerSecond", 1L).load()
          .filter(col("value") % n.toLong === 0)
      }
    // Bounded input (idCount ≤ 1000): single-partition indexing is the
    // intent — the constant-valued non-foldable partition key says so
    // without the global-window warning.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("id"), lit(1))).orderBy("id")
    val ids = DataGen.idSlice(spark, seed, idCount)
      .withColumn("idx", row_number().over(w).cast(LongType) - 1)
    rate
      .withColumn("idx", col("value") % idCount)
      .join(broadcast(ids), "idx")
      .select(
        col("id").cast(IntegerType).as("user_id"),
        element_at(array(Schemas.cityDomain.map(lit): _*),
          (pmod(hash(col("value"), lit(seed + 1)), lit(Schemas.cityDomain.size)) + 1)
            .cast(IntegerType)).as("city"),
        element_at(array(DataGen.generatorTrxTypes.map(lit): _*),
          (pmod(hash(col("value"), lit(seed + 2)), lit(3)) + 1).cast(IntegerType))
          .as("transaction_type"),
        round(lit(100.0) + pmod(hash(col("value"), lit(seed + 3)), lit(990001)) / 100.0, 2)
          .cast(DecimalType(8, 2)).as("monetary_value"),
        (pmod(hash(col("value"), lit(seed + 4)), lit(81)) + 100).cast(ShortType)
          .as("timeinapp"),
        element_at(array(Schemas.featureDomain.map(lit): _*),
          (pmod(hash(col("value"), lit(seed + 5)), lit(Schemas.featureDomain.size)) + 1)
            .cast(IntegerType)).as("feature_used"),
        col("timestamp").as("ts"))
  }

  /** S3 — tumbling hourly counts per feature with a watermark (the
    * Firehose-hourly-prefix analog). Late rows beyond the watermark are
    * dropped; state per (hour, feature) is bounded by watermark horizon. */
  def hourlyFeatureCounts(activity: DataFrame,
                          watermark: String = "10 minutes"): DataFrame =
    activity
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("feature_used"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("feature_used"), col("n"))

  /** S4 — session windows per user (rule C2's streaming form, fixed gap).
    * `session_window` merges rows within `gap` into one growing window;
    * state closes when the watermark passes the session end. */
  def sessionStats(activity: DataFrame, gap: String = "5 minutes",
                   watermark: String = "10 minutes"): DataFrame =
    activity
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(col("timeinapp").cast(LongType)).as("total_timeinapp"))
      .select(col("user_id"),
        col("session_window.start").as("start_ts"),
        col("session_window.end").as("end_ts"),
        col("n_events"), col("total_timeinapp"))

  /** S8 — streaming dedup (rule C4 first-occurrence): first event per
    * (user, feature) under a watermark.
    *
    * `dropDuplicatesWithinWatermark`, NOT `dropDuplicates` (round-8 scale
    * fix): a plain dropDuplicates whose key subset lacks the event-time
    * column keeps its state FOREVER — the watermark never clears it, and
    * at 100 TB the state store grows with the distinct-key count of the
    * whole stream's history. The WithinWatermark variant expires each
    * key's state once the watermark passes first-seen + horizon. The
    * honest trade, documented: a duplicate arriving MORE than `watermark`
    * after the first occurrence is re-admitted as new (bounded state
    * cannot remember forever); the batch C4 twin over any drained window
    * shorter than the horizon is unaffected (equivalence test in
    * StreamingSpec). */
  def firstFeatureUse(activity: DataFrame,
                      watermark: String = "1 hour"): DataFrame =
    activity
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "feature_used")

  /** S11 — streaming exact CONTENT dedup: the incremental form of the
    * LLM-plane's l01 (exact dedup by md5 digest), for corpus ingestion
    * pipelines where documents arrive continuously and re-crawls/re-posts
    * must be dropped before they reach the lake.
    *
    * The text never enters the state store — only the 32-char digest is
    * kept per key (the l01 shuffle-the-digest-not-the-text argument,
    * applied to streaming state), and each digest's state expires once the
    * watermark passes its first arrival + horizon. Same bounded-state
    * trade as S8: a re-crawl later than `watermark` after the original is
    * re-admitted; horizon = the dedup memory you are paying state for. */
  def dedupDocuments(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("digest", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("digest")

  /** S12 — streaming NEAR-dup dedup: the incremental form of the l03
    * MinHash+LSH batch path, for ingestion pipelines where a re-post is
    * edited just enough to beat exact dedup (S11). Two chained stateful
    * stages, both watermark-bounded:
    *
    *   1. per-row MinHash band signatures (`Dedup.bandSignatures` — a pure
    *      projection, no shuffle/aggregation, so it is legal in a stream)
    *      → `dropDuplicatesWithinWatermark` on (band_idx, band_hash): each
    *      band value's FIRST occurrence survives; state per key is the
    *      32-char band hash, never text (the S11 digest-only discipline).
    *   2. per-doc reassembly: a doc survives iff ALL its `bands` band rows
    *      survived — i.e. no band was claimed by an earlier doc. Grouping
    *      by (1s tumbling window, doc_id) keeps the aggregation
    *      append-emittable and its state watermark-expired.
    *
    * Emits (doc_id, ts) of survivors once the watermark passes their
    * window — survivors then gate the full rows via a batch join on the
    * lake, keeping text out of every streaming shuffle. The LSH trade,
    * stated: a doc sharing ANY band with an earlier in-horizon doc is
    * dropped (P[false drop] per dissimilar pair ≈ bands·s^r, tiny), a
    * near-dup arriving later than the horizon is re-admitted (bounded
    * state cannot remember forever), and near-dups landing in the SAME
    * micro-batch may split band ownership so that the whole group is
    * dropped (no arrival order within a batch ⇒ no canonical survivor;
    * bulk loads belong to the batch l03/l30 path). Batch equivalence on
    * cross-batch arrivals is tested in StreamingSpec. */
  def nearDupDocuments(docs: DataFrame, watermark: String = "1 hour",
                       n: Int = 3, k: Int = 16, bands: Int = 4): DataFrame =
    admissionGate(docs, None, watermark, n, k, bands)

  /** S15 — streaming incremental ADMISSION: S12's near-dup gate with the
    * l52 persisted corpus band index (`Dedup.bandIndex`) as a STATIC
    * prefilter, the streaming half of the batch-to-batch loop: docs
    * near-duplicating the already-curated corpus never reach the stateful
    * stage at all. The prefilter is a stream-static LEFT ANTI join on
    * (band_idx, band_hash) — stateless, so it costs no state and no
    * watermark interaction; a corpus hit removes that band row, the
    * all-bands-novel reassembly then drops the doc (exactly l52's
    * dup_corpus verdict), and the surviving rows flow into S12's
    * first-claimer-wins band state (the arrival-order analogue of l52's
    * min-doc_id dup_batch rule). Short/null docs keep S12's pass-through
    * (no bands = no evidence — l52's `kept`). The index is read once per
    * micro-batch plan; refresh cadence (e.g. after each batch
    * `extendIndex`) is the caller's restart/trigger policy. */
  def admitDocuments(docs: DataFrame, corpusIndex: DataFrame,
                     watermark: String = "1 hour",
                     n: Int = 3, k: Int = 16, bands: Int = 4): DataFrame =
    admissionGate(docs, Some(corpusIndex), watermark, n, k, bands)

  private def admissionGate(docs: DataFrame, corpusIndex: Option[DataFrame],
                            watermark: String,
                            n: Int, k: Int, bands: Int): DataFrame = {
    val b0 = graft.llm.Dedup.bandSignatures(docs, n, k, bands, carry = Seq("ts"))
    val banded = corpusIndex
      .fold(b0)(idx => b0.join(idx, Seq("band_idx", "band_hash"), "left_anti"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("band_idx", "band_hash")
      .groupBy(window(col("ts"), "1 second"), col("doc_id"))
      .agg(count(lit(1)).as("n_novel"), min(col("ts")).as("doc_ts"))
      .filter(col("n_novel") === bands)
      .select(col("doc_id"), col("doc_ts").as("ts"))
    // Documents with fewer than n tokens have NO n-gram shingle:
    // bandSignatures drops them, so without this branch they would vanish
    // from the survivor stream entirely — data LOSS, not deduplication.
    // They bypass the near-dup stage unexamined (no shingles = nothing for
    // MinHash to compare; exact re-posts of them are S11's job — chain
    // dedupDocuments upstream for that). The predicate MUST be the exact
    // complement of bandSignatures' shingle condition, so it goes through
    // the SAME tokenizer (TextOps.tokens) — a second tokenizer definition
    // here would silently break the complement invariant (docs
    // double-emitted or lost) the first time one of them changed.
    // Null-text docs shingle to nothing upstream, so they take this branch
    // too (isNull): a null payload is still a document the pipeline must
    // not lose; content dedup of nulls is, like all exact dedup, S11's job.
    val short = docs
      .filter(col("text").isNull
        || size(graft.llm.TextOps.tokens(col("text"))) < n)
      .select(col("doc_id"), col("ts"))
    banded.unionByName(short)
  }

  /** S14 — streaming SEMANTIC near-dup dedup: the embedding-space twin of
    * S12 (and the incremental form of the batch l39 pipeline's candidate
    * stage), for ingestion where a re-post is paraphrased — same meaning,
    * new n-grams — so S11/S12's text signatures miss it.
    *
    * Per-row multi-table hyperplane-LSH bucket ids
    * (`Similarity.bucketExpr` — sign bits of fvec_dot against literal
    * planes, a pure projection, legal in a stream) →
    * `dropDuplicatesWithinWatermark(tbl, bkt)` → per-vector all-tables-
    * novel reassembly, exactly S12's two-stage shape. State per key is one
    * (table, bucket) long pair — doubly bounded: by the watermark AND by
    * the tables·2^planes key domain itself; the embedding never enters a
    * shuffle or the state store.
    *
    * The LSH trade, stated for the semantic case: a vector sharing ANY
    * table-bucket with an earlier in-horizon vector is dropped. With
    * random-direction data the per-table false-drop rate is ~2^-planes
    * (~0.4% at 8 planes, ×tables); real embedding corpora cluster, so
    * buckets fire mostly on true semantic neighbors — l44's recall audit
    * measures exactly this geometry's hit rates. Same-micro-batch
    * ambiguity and beyond-horizon re-admission as S12 (documented there);
    * bulk loads belong to the batch l39/l40 path. */
  def semanticDedupVectors(vecs: DataFrame, watermark: String = "1 hour",
                           planes: Int = 8, dim: Int = 64,
                           tables: Int = 4): DataFrame =
    vecs
      // Fail FAST on a dim mismatch or null embedding: bucketExpr's dot
      // returns NULL for either, when(NULL >= 0).otherwise(0) folds it to
      // bucket 0, and EVERY such vector lands in the same (tbl, 0) cell —
      // the dedup would then silently keep one vector per horizon and
      // drop the rest of the stream. Mass data loss must be an error.
      // The assertion is woven INTO the kept ts column (assert_true is
      // null on success, so coalesce passes ts through) — a standalone
      // asserted column would be pruned away as unreferenced.
      .select(col("vec_id"),
        coalesce(
          assert_true(col("embedding").isNotNull && size(col("embedding")) === dim,
            concat(lit(s"semanticDedupVectors: embedding must be non-null with dim=$dim, got size "),
              coalesce(size(col("embedding")).cast("string"), lit("null"))))
            .cast("timestamp"),
          col("ts")).as("ts"),
        posexplode(array((0 until tables).map(t =>
          graft.llm.Similarity.bucketExpr(col("embedding"), planes, dim, t * planes)): _*))
          .as(Seq("tbl", "bkt")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("tbl", "bkt")
      .groupBy(window(col("ts"), "1 second"), col("vec_id"))
      .agg(count(lit(1)).as("n_novel"), min(col("ts")).as("vec_ts"))
      .filter(col("n_novel") === tables)
      .select(col("vec_id"), col("vec_ts").as("ts"))

  /** S13 — streaming count-min counter maintenance: the incremental form
    * of the l34 batch CMS, for "top tokens over an unbounded stream"
    * monitoring where a full streaming vocabulary aggregation would grow
    * state with the stream's lifetime.
    *
    * The whole trick is that CMS turns an UNBOUNDED key domain (tokens)
    * into a BOUNDED one (d rows × m counter positions): a plain streaming
    * groupBy on (row, p) then has at most d·m state entries FOREVER — the
    * state is bounded by construction, no watermark/TTL needed, which is
    * why this is an ordinary always-mergeable streaming aggregation
    * rather than a flatMapGroupsWithState machine. Counter increments are
    * associative + commutative, so the final table is independent of
    * micro-batch boundaries and equals the batch counters cell-for-cell
    * (the equivalence StreamingSpec pins; both sides share Sketches.cmsPos).
    * Point estimates/heavy-hitter probes stay a batch-side broadcast join
    * against these tiny tables (l34's probe shape) — the stream maintains
    * counters, it never shuffles the vocabulary. */
  def cmsCounterStream(docs: DataFrame, m: Int = 1024, d: Int = 2): DataFrame =
    docs
      // ONE pass: tokenize/scan once, hash each token once, then fan each
      // token out to its d (row, position) cells with an in-row explode —
      // a d-way self-union here would re-read and re-tokenize every
      // micro-batch d times (union branches share no CSE across subtrees)
      .select(explode(graft.llm.TextOps.tokens(col("text"))).as("tok"))
      .select(md5(col("tok")).as("h"))
      .select(explode(array((0 until d).map(i =>
        struct(lit(i).as("row"),
          graft.llm.Sketches.cmsPosFromMd5(col("h"), i, m).as("p"))): _*)).as("rp"))
      .select(col("rp.row").as("row"), col("rp.p").as("p"))
      .groupBy(col("row"), col("p"))
      .agg(count(lit(1)).as("c"))

  /** S17 — streaming BPE pair-statistics maintenance: the incremental
    * form of l56's training statistics, for "when has the corpus drifted
    * enough to retrain the tokenizer" monitoring. Batch BPE weights each
    * distinct word's pairs by its corpus frequency; summing pairs over
    * every word OCCURRENCE is the same total, and the occurrence form
    * needs no vocabulary state — so this is an ordinary always-mergeable
    * streaming aggregation whose key domain is the adjacent CHARACTER-
    * pair space: bounded by the corpus alphabet squared, by construction,
    * forever (S13's counter-grid argument — no watermark/TTL needed).
    * Counter increments are associative+commutative, so the table is
    * independent of micro-batch boundaries and equals
    * `Bpe.pairCounts(Bpe.wordSymbols(drained))` row-for-row (tested).
    * The merge LOOP stays batch-side (l56): merge rounds need the global
    * argmax over a consistent snapshot — exactly what reading this
    * table at a trigger boundary provides. */
  def bpePairCountStream(docs: DataFrame): DataFrame =
    docs
      .select(explode(graft.llm.TextOps.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      // bind the char array BEFORE the lambda reads it ~3n times
      // (shinglesFromTokens' rule: lambdas re-evaluate expression args)
      .select(split(col("word"), "").as("cs"))
      .select(explode(filter(
        transform(col("cs"), (_, i) =>
          when(i <= size(col("cs")) - 2,
            struct(element_at(col("cs"), i + 1).as("l"),
              element_at(col("cs"), i + 2).as("r")))),
        x => x.isNotNull)).as("pr"))
      .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
      .agg(count(lit(1)).as("pair_count"))

  /** S18 — streaming OOV-rate monitoring: the production deployment of
    * l59's coverage audit. The vocabulary is FIXED offline (trained on
    * the curated train split — the tokenizer does not drift with the
    * stream) and arrives as a static table of `b` bigram atoms; the
    * stream maintains per-source totals of bigram occurrences and
    * out-of-vocabulary occurrences, the live "is this source drifting
    * away from what the tokenizer covers" alarm.
    *
    * State story: the vocab probe is a stream-static LEFT join against a
    * by-construction-small static side (top-V atoms — Spark broadcasts
    * it; stateless, re-planned each micro-batch), and the only stateful
    * stage is the per-source counter aggregation — state bounded by the
    * source vocabulary forever, no watermark/TTL (coverage totals are
    * monotone; S13's bounded-grid argument). Counter increments are
    * associative+commutative ⇒ the table is micro-batch-boundary
    * independent and equals the batch cells on the drained input
    * (tested in StreamingSpec). */
  def oovRateStream(docs: DataFrame, vocab: DataFrame): DataFrame =
    docs
      .select(col("source"), graft.llm.TextOps.tokens(col("text")).as("toks"))
      .select(col("source"),
        explode(graft.llm.TextOps.bigramOccurrences(col("toks"))).as("b"))
      // distinct: the batch l59 vocab is distinct by construction
      // (groupBy), but an arbitrary caller table with a repeated bigram
      // would join-multiply its occurrences and silently UNDER-report the
      // OOV rate; the static side is top-V rows, so this is free
      .join(vocab.select(col("b")).distinct()
        .withColumn("in_vocab", lit(true)), Seq("b"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))

  /** Typed rows for S16 streaming budget admission. */
  final case class StreamSrcDoc(doc_id: Long, text: String, source: String,
                                ts: java.sql.Timestamp)
  /** Internal typed row of the S16 gate (public: encoder codegen needs
    * reflective access to the companion's apply). */
  final case class BudgetRow(doc_id: Long, source: String,
                             n_tokens: Long, h: String)

  /** S16 — streaming token-budget admission: the incremental form of the
    * l55 batch sampler, for ingestion pipelines that fill a per-source
    * token quota as documents arrive ("stop taking src_k once we have N
    * tokens of it") instead of sampling a static corpus.
    *
    * State is ONE long per source (tokens admitted so far) under
    * `flatMapGroupsWithState` keyed by source — bounded by the source
    * vocabulary forever, no watermark/TTL needed (the same
    * bounded-by-construction argument as S13's counter grid; a budget is
    * a permanent quota, so expiring it would re-open closed sources).
    * A doc is admitted iff the tokens admitted BEFORE it are under the
    * budget — l55's `before < budget` rule, so each source overshoots by
    * at most its crossing document.
    *
    * Order semantics, stated: ACROSS micro-batches admission is arrival
    * order (streaming has no other order); WITHIN a micro-batch the
    * group's rows are sorted by the same md5(doc_id) key l55 orders by,
    * so a stream drained in one batch reproduces l55's kept set exactly
    * (StreamingSpec pins this), and replays are deterministic. The
    * in-memory sort is per (micro-batch, source) — bounded by batch
    * sizing, the unit every flatMapGroups stage already buffers. */
  def budgetAdmit(docs: DataFrame, budget: Long): DataFrame = {
    val spark2 = docs.sparkSession
    import spark2.implicits._
    docs
      .select(col("doc_id"), col("source"),
        coalesce(graft.llm.TextOps.tokenCount(col("text")), lit(0L))
          .cast(LongType).as("n_tokens"),
        md5(col("doc_id").cast(StringType)).as("h"))
      .as[BudgetRow]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[BudgetRow], state: GroupState[Long]) =>
          var admitted = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_.h).flatMap { d =>
            if (admitted < budget) {
              admitted += d.n_tokens
              Some((d.doc_id, src, d.n_tokens))
            } else None
          }
          state.update(admitted)
          out.iterator
      }
      .toDF("doc_id", "source", "n_tokens")
  }

  /** S7 — the buffered, time-prefixed lake sink (Firehose analog,
    * lib/fin-transactions-stack.ts:192-205): micro-batch trigger ≙ the
    * 300 s buffer, `partitionBy` year/month/day/hour ≙ the default
    * yyyy/MM/dd/HH/ key prefix. Checkpointed ⇒ exactly-once file output —
    * a documented upgrade over Firehose's at-least-once. JSON to stay
    * faithful to the raw landing format; a silver parquet compaction would
    * chain a second batch job over these partitions. */
  def lakeSink(activity: DataFrame, path: String, checkpoint: String,
               trigger: Trigger = Trigger.ProcessingTime("300 seconds"))
      : DataStreamWriter[org.apache.spark.sql.Row] =
    activity
      .withColumn("year", date_format(col("ts"), "yyyy"))
      .withColumn("month", date_format(col("ts"), "MM"))
      .withColumn("day", date_format(col("ts"), "dd"))
      .withColumn("hour", date_format(col("ts"), "HH"))
      .writeStream
      .format("json")
      .partitionBy("year", "month", "day", "hour")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
}
