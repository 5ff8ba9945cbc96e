package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only scale-up experiment (results recorded in BASELINE.md): replicate
  * the sf0.1 documents corpus R× with REPLICA-ISOLATED shingle structure —
  * every token is prefixed with its replica id, so each replica reproduces
  * the original near-dup structure internally and shares NO shingle across
  * replicas. Data grows R× while per-document statistics stay constant:
  * exactly the "same pipeline, more data" shape a cluster scale-up has,
  * without the quadratic near-dup blow-up a naive text copy would plant
  * (10 exact copies of every doc would multiply candidate PAIRS by 100,
  * measuring an adversarial corpus rather than scale).
  *
  * The small control corpus is the SAME transform at replica 0 only, both
  * re-read from parquet, so format/codec costs cancel. Timing mirrors
  * Bench: one warm run, min of 2 timed, blocking cleanup between runs.
  *
  * Usage: runMain graft.DevScale [R] [query names...]
  */
object DevScale {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("graft-scale")
    // R is optional: a non-numeric first arg is a query name, not a crash
    val reps = args.headOption.flatMap(a => scala.util.Try(a.toInt).toOption)
      .getOrElse(10)
    val rest = if (args.headOption.exists(a => scala.util.Try(a.toInt).isSuccess))
      args.tail.toSeq else args.toSeq
    if (rest == Seq("embed")) {
      embedExperiment(spark, reps)
      spark.stop()
      return
    }
    if (rest == Seq("incr")) {
      incrementalExperiment(spark, reps)
      spark.stop()
      return
    }
    if (rest == Seq("bpe")) {
      bpeExperiment(spark, reps)
      spark.stop()
      return
    }
    if (rest == Seq("packed")) {
      packedExperiment(spark, reps)
      spark.stop()
      return
    }
    if (rest == Seq("pq")) {
      pqExperiment(spark, reps)
      spark.stop()
      return
    }
    if (rest == Seq("sketch")) {
      sketchExperiment(spark, reps)
      spark.stop()
      return
    }
    if (rest == Seq("bm25")) {
      bm25Experiment(spark, reps)
      spark.stop()
      return
    }
    if (rest == Seq("coverage")) {
      coverageExperiment(spark, reps)
      spark.stop()
      return
    }
    if (rest == Seq("sweepshare")) {
      sweepShareExperiment(spark, reps)
      spark.stop()
      return
    }
    if (rest == Seq("semdedup")) {
      semDedupExperiment(spark, reps)
      spark.stop()
      return
    }
    if (rest == Seq("ivfpq")) {
      ivfPqExperiment(spark, reps)
      spark.stop()
      return
    }
    if (rest == Seq("semdedupskew")) {
      semDedupSkewExperiment(spark, reps)
      spark.stop()
      return
    }
    if (rest == Seq("pipeline")) {
      pipelineExperiment(spark, reps)
      spark.stop()
      return
    }
    if (rest == Seq("imagedup")) {
      imageDupExperiment(spark, reps)
      spark.stop()
      return
    }
    if (rest == Seq("videodup")) {
      videoDupExperiment(spark, reps)
      spark.stop()
      return
    }
    if (rest == Seq("offsetgrouped")) {
      offsetGroupedExperiment(spark, reps)
      spark.stop()
      return
    }
    if (rest == Seq("sigcompact")) {
      sigCompactExperiment(spark, reps)
      spark.stop()
      return
    }
    val queries = if (rest.nonEmpty) rest
      else Seq("l01_exact_dedup", "l03_minhash_lsh", "l16_dedup_clusters",
        "l46_dup_shingle_profile", "l47_length_percentiles")

    def replicated(r: Int): DataFrame = replicatedText(spark, r)

    val smallDir = "/tmp/graft_scale_small"
    val bigDir = "/tmp/graft_scale_big"
    replicated(1).write.mode("overwrite").parquet(s"$smallDir/documents.parquet")
    replicated(reps).write.mode("overwrite").parquet(s"$bigDir/documents.parquet")

    def steady(name: String, dir: String): Double =
      BenchTiming.steady(spark, name, dir)

    // host-speed sentinel on the UNSCALED driver corpus
    val d01 = steady("d01_scan_count", "/root/testdata/sf0.1")
    println(f"d01 sentinel: $d01%.3f s")
    queries.foreach { q =>
      val s = steady(q, smallDir)
      val b = steady(q, bigDir)
      println(f"$q%-28s small=$s%7.3f s  big(${reps}x)=$b%7.3f s  ratio=${b / s}%5.2f")
    }
    spark.stop()
  }

  /** The replica-isolated text transform shared by the text and
    * incremental experiments: replica k prefixes every token with `rk_`,
    * so each replica reproduces the original near-dup structure internally
    * and shares NO shingle across replicas. */
  private def replicatedText(spark: org.apache.spark.sql.SparkSession,
                             r: Int): DataFrame = {
    val base = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    (0 until r).map { k =>
      base.select(
        (col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          t => concat(lit(s"r${k}_"), t))).as("text"),
        col("lang"), col("source"))
        // n_chars must track the REWRITTEN text — copying the original
        // value would leave n_chars-banded queries (l08/l47) measuring a
        // corpus whose two length signals disagree
        .withColumn("n_chars", length(col("text")).cast("long"))
    }.reduce(_ unionByName _)
  }

  /** SHARED-token replication (ids shifted, text UNCHANGED) — the Zipf
    * stress shape the dfCapPermille receipt needs: every replica shares
    * the token space, so term df grows R× with the corpus (df‰ constant,
    * absolute posting lists R×-long) and a fixed query's candidate volume
    * grows R× — exactly the skew the term-pruning cap exists to bound.
    * (replicatedText's isolated tokens keep candidates FLAT by design —
    * right for the serve-cost claim, blind to the pruning claim.) */
  private def sharedText(spark: org.apache.spark.sql.SparkSession,
                         r: Int): DataFrame = {
    val base = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    (0 until r).map { k =>
      base.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        col("text"))
    }.reduce(_ unionByName _)
  }

  /** INCREMENTAL-dedup scale-up (`runMain graft.DevScale R incr`) — the
    * l52 claim measured: the per-crawl cost of admitting a FIXED-SIZE
    * batch as the curated corpus grows R×. The corpus band index is
    * PERSISTED parquet built once per scale OUTSIDE the clock (it is the
    * state the batch-to-batch loop carries), so the timed operator is
    * exactly what a pipeline pays per batch: band the batch, probe the
    * index, fold verdicts. The comparison row is the from-scratch
    * alternative — dedupApply over corpus ∪ batch — whose cost grows with
    * the corpus. The batch is half corpus near-dups (a re-crawl of the
    * replica-0 'src0' slice under new ids) and half novel docs ('src1'
    * re-tokenized with a `new_` prefix shared with nothing), so both
    * verdict paths execute and the printed counts confirm correctness at
    * every scale. */
  /** BPE vocabulary-residence experiment (`runMain graft.DevScale R bpe`):
    * the trainer's claim is that merge rounds cost VOCAB-table work,
    * independent of corpus size after the one word aggregation. Measured
    * by scaling the corpus two ways: SAME-VOCAB (the same documents
    * unioned R times under fresh ids — corpus R×, vocabulary unchanged)
    * must hold the per-round pair-counting cost ~flat, while the word agg
    * itself may grow with the corpus; GROWN-VOCAB (replica-prefixed text,
    * vocabulary R×) is the control where rounds are allowed to grow. */
  private def bpeExperiment(spark: org.apache.spark.sql.SparkSession,
                            reps: Int): Unit = {
    import graft.llm.Bpe
    val d01 = BenchTiming.steady(spark, "d01_scan_count", "/root/testdata/sf0.1")
    println(f"d01 sentinel: $d01%.3f s")
    val base = replicatedText(spark, 1).select(col("doc_id"), col("text"))
    def sameVocab(r: Int) = (0 until r).map(k =>
      base.select((col("doc_id") + k * 10000000L).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    for ((label, mk) <- Seq(
        ("same-vocab", sameVocab _),
        ("grown-vocab", (r: Int) => replicatedText(spark, r)
          .select(col("doc_id"), col("text"))));
        r <- Seq(1, reps)) {
      val dir = s"/tmp/graft_scale_bpe_${label}_$r"
      mk(r).write.mode("overwrite").parquet(s"$dir/docs.parquet")
      val docs = spark.read.parquet(s"$dir/docs.parquet")
      val tAgg = BenchTiming.steadyOf(spark, () => Bpe.wordSymbols(docs))
      Bpe.wordSymbols(docs).write.mode("overwrite")
        .parquet(s"$dir/vocab.parquet")
      val vocab = spark.read.parquet(s"$dir/vocab.parquet")
      val nVocab = vocab.count()
      val tRound = BenchTiming.steadyOf(spark, () => Bpe.pairCounts(vocab))
      println(f"$label%-12s R=$r%-3d vocab=$nVocab%8d words  " +
        f"word-agg=$tAgg%7.3f s  pair-round=$tRound%7.3f s")
    }
  }

  /** BM25 retrieval scale-up (`runMain graft.DevScale R bm25`) — the
    * LLM101/S27/S31 serving claims measured at corpus scale. The index
    * (postings + stats) is PERSISTED parquet built outside the clock (it
    * is the model a production serve carries); replica-isolated tokens
    * mean a fixed replica-0 query set matches ONLY replica-0 postings, so
    * the CANDIDATE volume stays constant while the index grows R× — the
    * printed rows separate the two cost terms the scaladoc claims:
    * per-query work bounded by matched postings (flat candidates), index
    * scan growing with corpus (the term a term-partitioned physical
    * layout removes on a real cluster). The incremental row is the S31
    * receipt: admitting a FIXED batch into the core costs the batch's
    * own tokenize/count regardless of corpus size, vs the from-scratch
    * model rebuild growing R×. */
  private def bm25Experiment(spark: org.apache.spark.sql.SparkSession,
                             reps: Int): Unit = {
    import graft.llm.{Retrieval, TextOps}
    // fixed query set: replica-0 eval docs (bucket >= 80), text already
    // in replica-0 token space
    val queriesDir = "/tmp/graft_scale_bm25_queries"
    replicatedText(spark, 1)
      .filter(TextOps.splitBucket(col("doc_id")) >= 80)
      .select(col("doc_id").as("q_id"), col("text"))
      .write.mode("overwrite").parquet(queriesDir)
    val queries = spark.read.parquet(queriesDir)
    val nQ = queries.count()
    // fixed admission batch: 1x-sized novel docs (disjoint ids + tokens)
    val batchDir = "/tmp/graft_scale_bm25_batch"
    replicatedText(spark, 1)
      .select((col("doc_id") + 95000000L).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          t => concat(lit("new_"), t))).as("text"))
      .write.mode("overwrite").parquet(batchDir)
    val batch = spark.read.parquet(batchDir)

    val d01 = BenchTiming.steady(spark, "d01_scan_count", "/root/testdata/sf0.1")
    println(f"d01 sentinel: $d01%.3f s  queries=$nQ")
    for (r <- Seq(1, reps)) {
      val dir = s"/tmp/graft_scale_bm25_$r"
      val corpus = replicatedText(spark, r)
        .filter(TextOps.splitBucket(col("doc_id")) < 80)
        .select(col("doc_id"), col("text"))
      val (postings0, stats0) = Retrieval.bm25Model(corpus)
      postings0.write.mode("overwrite").parquet(s"$dir/postings.parquet")
      stats0.write.mode("overwrite").parquet(s"$dir/stats.parquet")
      val postings = spark.read.parquet(s"$dir/postings.parquet")
      val stats = spark.read.parquet(s"$dir/stats.parquet")
      val nPost = postings.count()
      val candidates = queries
        .select(col("q_id"), explode(array_distinct(
          TextOps.tokens(col("text")))).as("tok"))
        .filter(length(col("tok")) > 0)
        .join(postings, Seq("tok")).count()
      val tServe = BenchTiming.steadyOf(spark,
        () => Retrieval.bm25Serve(queries, postings, stats, k = 5))
      val tAdmit = BenchTiming.steadyOf(spark, () => {
        val (tf, dl) = Retrieval.bm25Core(batch)
        tf.unionByName(dl.withColumn("tok", lit("")).withColumn("tf", lit(0L))
          .select(col("doc_id"), col("tok"), col("tf")))
      })
      val tRebuild = BenchTiming.steadyOf(spark, () => {
        val (p, s) = Retrieval.bm25Model(corpus.unionByName(batch))
        p.crossJoin(s)
      })
      println(f"R=$r%-3d postings=$nPost%9d rows  candidates=$candidates%9d  " +
        f"serve=$tServe%7.3f s  admit-batch=$tAdmit%7.3f s  " +
        f"rebuild=$tRebuild%8.3f s")
    }

    // SHARED-TOKEN leg — the dfCapPermille receipt: with every replica in
    // ONE token space, df grows R× and a fixed query's candidate volume
    // grows R× (the Zipf-skew regime); the measured cap
    // (KnobSchedule.bm25DfCapForRecall at recall 0.95) bounds the
    // expansion where the exact serve pays it in full. A 20-query sample
    // keeps the uncapped truth leg affordable at R=50.
    import graft.llm.KnobSchedule
    val sharedQDir = "/tmp/graft_scale_bm25_sharedq"
    sharedText(spark, 1)
      .filter(TextOps.splitBucket(col("doc_id")) >= 80)
      .filter(TextOps.md5Int32(col("doc_id").cast("string")) % 20 === 0)
      .select(col("doc_id").as("q_id"), col("text"))
      .write.mode("overwrite").parquet(sharedQDir)
    val sharedQ = spark.read.parquet(sharedQDir)
    println(s"shared-token leg: queries=${sharedQ.count()}")
    for (r <- Seq(1, reps)) {
      val dir = s"/tmp/graft_scale_bm25_shared_$r"
      val corpus = sharedText(spark, r)
        .filter(TextOps.splitBucket(col("doc_id") % 10000000L) < 80)
      val (postings0, stats0) = Retrieval.bm25Model(corpus)
      postings0.write.mode("overwrite").parquet(s"$dir/postings.parquet")
      stats0.write.mode("overwrite").parquet(s"$dir/stats.parquet")
      val postings = spark.read.parquet(s"$dir/postings.parquet")
      val stats = spark.read.parquet(s"$dir/stats.parquet")
      val qt = sharedQ.select(col("q_id"), explode(array_distinct(
          TextOps.tokens(col("text")))).as("tok"))
        .filter(length(col("tok")) > 0)
      val cap = KnobSchedule.bm25DfCapForRecall(corpus, sharedQ,
        targetRecall = 0.95)
      val candAll = qt.join(postings, Seq("tok")).count()
      val candCap = qt.join(postings
        .crossJoin(broadcast(stats.select(col("n_docs"))))
        .filter(col("df") * 1000 <= col("n_docs") * cap), Seq("tok")).count()
      val tExact = BenchTiming.steadyOf(spark,
        () => Retrieval.bm25Serve(sharedQ, postings, stats, k = 5))
      val tCapped = BenchTiming.steadyOf(spark,
        () => Retrieval.bm25Serve(sharedQ, postings, stats, k = 5,
          dfCapPermille = cap))
      println(f"R=$r%-3d shared: cap(0.95)=$cap%4d  cand_exact=$candAll%10d  " +
        f"cand_capped=$candCap%10d  serve_exact=$tExact%7.3f s  " +
        f"serve_capped=$tCapped%7.3f s")
    }
  }

  private def incrementalExperiment(spark: org.apache.spark.sql.SparkSession,
                                    reps: Int): Unit = {
    import graft.llm.Dedup
    val r0 = replicatedText(spark, 1)
    val dupHalf = r0.filter(col("source") === "src0")
      .select((col("doc_id") + 90000000L).as("doc_id"), col("text"))
    val novelHalf = r0.filter(col("source") === "src1")
      .select((col("doc_id") + 91000000L).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          t => concat(lit("new_"), t))).as("text"))
    val batchDir = "/tmp/graft_scale_incr_batch"
    dupHalf.unionByName(novelHalf)
      .write.mode("overwrite").parquet(batchDir)
    val batch = spark.read.parquet(batchDir)

    val d01 = BenchTiming.steady(spark, "d01_scan_count", "/root/testdata/sf0.1")
    println(f"d01 sentinel: $d01%.3f s")
    for (r <- Seq(1, reps)) {
      val dir = s"/tmp/graft_scale_incr_$r"
      replicatedText(spark, r).select(col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(s"$dir/corpus.parquet")
      val corpus = spark.read.parquet(s"$dir/corpus.parquet")
      Dedup.bandIndex(corpus)
        .write.mode("overwrite").parquet(s"$dir/band_index.parquet")
      val idx = spark.read.parquet(s"$dir/band_index.parquet")
      val nIdx = idx.count()
      val tInc = BenchTiming.steadyOf(spark,
        () => Dedup.incrementalDedup(batch, idx))
      val tFull = BenchTiming.steadyOf(spark,
        () => Dedup.dedupApply(corpus.unionByName(batch)))
      val verdicts = Dedup.incrementalDedup(batch, idx)
        .groupBy(col("verdict")).count().collect()
        .map(x => s"${x.getString(0)}=${x.getLong(1)}").sorted.mkString(" ")
      println(f"R=$r%-3d index=$nIdx%9d rows  incremental=$tInc%7.3f s  " +
        f"full-rededup=$tFull%8.3f s  verdicts: $verdicts")
    }
  }

  /** SOURCE-SKETCH incremental scale-up (`runMain graft.DevScale R
    * sketch`) — the l78 claim measured: the per-crawl cost of keeping the
    * source-overlap sketch current as the already-sketched corpus grows
    * R×. The old corpus's sketch table is PERSISTED parquet built outside
    * the clock (it is the state the batch loop carries), so the timed
    * incremental path is exactly what a pipeline pays per batch: sketch
    * the 1× batch, merge ≤2k longs per source. The comparison rows are
    * (a) re-sketching the grown corpus from scratch and (b) the exact l49
    * matrix over it — both of which grow with the corpus. The printed
    * equality check confirms merge(old, batch) == scratch at every scale
    * (the associativity LlmSpec proves at sf0.001, re-verified on the
    * scaled corpus). */
  private def sketchExperiment(spark: org.apache.spark.sql.SparkSession,
                               reps: Int): Unit = {
    import graft.llm.Dedup
    val d01 = BenchTiming.steady(spark, "d01_scan_count", "/root/testdata/sf0.1")
    println(f"d01 sentinel: $d01%.3f s")
    for (r <- Seq(math.max(2, reps / 5), reps)) {
      val dir = s"/tmp/graft_scale_sketch_$r"
      // batch = the newest replica alone (1×, shingle-isolated from the
      // rest); old = everything sketched before it arrived
      replicatedText(spark, r).filter(col("doc_id") < (r - 1) * 10000000L)
        .write.mode("overwrite").parquet(s"$dir/old.parquet")
      replicatedText(spark, r).filter(col("doc_id") >= (r - 1) * 10000000L)
        .write.mode("overwrite").parquet(s"$dir/batch.parquet")
      replicatedText(spark, r)
        .write.mode("overwrite").parquet(s"$dir/big.parquet")
      val old = spark.read.parquet(s"$dir/old.parquet")
      val batch = spark.read.parquet(s"$dir/batch.parquet")
      val big = spark.read.parquet(s"$dir/big.parquet")
      Dedup.sourceSketchTable(old)
        .write.mode("overwrite").parquet(s"$dir/sketch_old.parquet")
      val oldSk = spark.read.parquet(s"$dir/sketch_old.parquet")
      val tIncr = BenchTiming.steadyOf(spark,
        () => Dedup.mergeSourceSketches(oldSk, Dedup.sourceSketchTable(batch)))
      val tScratch = BenchTiming.steadyOf(spark,
        () => Dedup.sourceSketchTable(big))
      val tExact = BenchTiming.steadyOf(spark,
        () => Dedup.sourceOverlap(big))
      val merged = Dedup.mergeSourceSketches(
        oldSk, Dedup.sourceSketchTable(batch))
      val same = merged
        .join(Dedup.sourceSketchTable(big).withColumnRenamed("sk", "want"),
          "source")
        .filter(col("sk") =!= col("want")).isEmpty
      println(f"R=$r%-3d incr=$tIncr%7.3f s  scratch=$tScratch%7.3f s  " +
        f"exact-l49=$tExact%8.3f s  merge==scratch: $same")
    }
  }

  /** EMBEDDING scale-up (`runMain graft.DevScale R embed`) — the
    * experiment BASELINE.md's round-9 notes excluded from the text table:
    * scaling an LSH corpus at fixed knobs is mistuning (bucket occupancy
    * grows with n, candidate pairs quadratically), so this run grows the
    * knobs by KnobSchedule's occupancy-constant leg and measures l06/l39's
    * operator shapes at 1× and R× — plus the FIXED-knob control at R×
    * that demonstrates the mistuning the schedule exists to avoid.
    *
    * Replica isolation in embedding space: replica k applies a
    * deterministic ORTHOGONAL transform — circular dimension shift by k
    * with md5-derived sign flips — so every within-replica pairwise cosine
    * is preserved EXACTLY (the near-dup structure replicates) while
    * cross-replica similarities are scrambled toward zero. The printed
    * candidate-pair and near-dup-pair counts make any cross-replica
    * leakage visible: at constant occupancy, pairs should grow ~R×, not
    * R²×. */
  /** The replica-isolated EMBEDDING transform shared by the embed and
    * packed experiments: replica k applies a deterministic orthogonal
    * transform (circular dimension shift by k + md5-derived sign flips),
    * preserving every within-replica cosine exactly while scrambling
    * cross-replica similarities toward zero. */
  private val embedDim = 64
  private def replicatedEmbeddings(spark: org.apache.spark.sql.SparkSession,
                                   r: Int): DataFrame = {
    val base = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    def signOf(k: Int, i: Int): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rep:$k:$i".getBytes("UTF-8"))
      if ((d(0) & 1) == 0) 1.0 else -1.0
    }
    (0 until r).map { k =>
      base.select(
        (col("vec_id") + lit(k * 10000000L)).as("vec_id"),
        array((0 until embedDim).map(i =>
          (element_at(col("embedding"), ((i + k) % embedDim) + 1)
            * lit(signOf(k, i))).cast("float")): _*).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
  }

  private def embedExperiment(spark: org.apache.spark.sql.SparkSession,
                              reps: Int): Unit = {
    import graft.llm.{KnobSchedule, Similarity}
    val dim = embedDim
    val n1 = Tables.load(spark, "/root/testdata/sf0.1", "embeddings").count()
    def replicated(r: Int): DataFrame = replicatedEmbeddings(spark, r)
    val smallDir = "/tmp/graft_scale_embed_small"
    val bigDir = "/tmp/graft_scale_embed_big"
    replicated(1).write.mode("overwrite").parquet(s"$smallDir/embeddings.parquet")
    replicated(reps).write.mode("overwrite").parquet(s"$bigDir/embeddings.parquet")

    val d01 = BenchTiming.steady(spark, "d01_scan_count", "/root/testdata/sf0.1")
    println(f"d01 sentinel: $d01%.3f s")
    def em(dir: String) = Tables.load(spark, dir, "embeddings")
    def run(tag: String, dir: String, planes: Int): Unit = {
      val t06 = BenchTiming.steadyOf(spark, () =>
        Similarity.annTopK(em(dir).filter(col("vec_id") < 8), em(dir),
          k = 3, planes = planes, dim = dim))
      val t39 = BenchTiming.steadyOf(spark, () =>
        Similarity.embeddingDedupApply(em(dir), minSim = 0.3, planes = planes))
      // l76: rank machinery over the replicated corpus (centroids mix
      // replicas — fine for a TIMING receipt, the plan shape is identical)
      val t76 = BenchTiming.steadyOf(spark, () =>
        Similarity.outlierRanks(em(dir)))
      // occupancy/isolation evidence: candidate pairs and near-dup pairs
      val pairs = Similarity.cosineNearDups(em(dir), minSim = 0.3,
        planes = planes, dim = dim).count()
      println(f"$tag%-26s planes=$planes%2d  l06=$t06%7.3f s  l39=$t39%7.3f s  l76=$t76%7.3f s  nearDupPairs=$pairs%7d")
    }
    val p1 = KnobSchedule.lshPlanes(n1)
    val pR = KnobSchedule.lshPlanes(n1 * reps)
    run("1x control", smallDir, p1)
    run(s"${reps}x scheduled", bigDir, pR)
    run(s"${reps}x FIXED-KNOB control", bigDir, p1)
  }

  /** SEMDEDUP cell-schedule receipt (`runMain graft.DevScale R semdedup`)
    * — the round-13 directive-#4 evidence for l118's 100 TB plan: the
    * within-cell pair volume of SemDeDup is Σ occ·(occ−1)/2, and the
    * claim is that under the √n schedule (nCells = KnobSchedule.ivfCells)
    * per-vector pair work grows ~√R at R× corpus while a FIXED k grows
    * it ~R× (quadratic in disguise), and that the hot-cell guard
    * (refineHotCells) caps max-cell occupancy near the target when
    * k-means hands one cell a disproportionate share. Prints, per
    * config: k, target occupancy, max occupancy and pairs/vector BEFORE
    * and AFTER the guard, hot-cell count, and the measured wall-clock of
    * the within-cell pair pass itself (join-on-cell + cosine + count —
    * the operator's cost center). */
  private def semDedupExperiment(spark: org.apache.spark.sql.SparkSession,
                                 reps: Int): Unit = {
    import graft.llm.{KnobSchedule, Similarity}
    val n1 = Tables.load(spark, "/root/testdata/sf0.1", "embeddings").count()
    val smallDir = "/tmp/graft_scale_sd_small"
    val bigDir = "/tmp/graft_scale_sd_big"
    replicatedEmbeddings(spark, 1).write.mode("overwrite")
      .parquet(s"$smallDir/embeddings.parquet")
    replicatedEmbeddings(spark, reps).write.mode("overwrite")
      .parquet(s"$bigDir/embeddings.parquet")
    val d01 = BenchTiming.steady(spark, "d01_scan_count", "/root/testdata/sf0.1")
    println(f"d01 sentinel: $d01%.3f s")
    def occStats(cs: DataFrame): (Long, Long, Long) = {
      val r = cs.groupBy(col("cell")).agg(count(lit(1)).as("occ"))
        .agg(max(col("occ")),
          sum((col("occ") * (col("occ") - 1) / 2).cast("long")),
          sum(col("occ"))).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    def run(tag: String, dir: String, n: Long, k: Int,
            guard: Boolean): Unit = {
      val em = Tables.load(spark, dir, "embeddings")
      val cents = Similarity.fitCentroids(em, k, iters = 2)
      val cs = Similarity.cellAssignments(em, cents).localCheckpoint()
      val (mx0, p0, nn) = occStats(cs)
      // per-LEVEL split tracking (round-17 polish: each recursion level
      // reports cells added against its OWN input — the total still
      // equals the pre/post distinct diff because the dense relabel
      // preserves distinct counts, so levels compose)
      val levels = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
      val refined = if (guard)
        Similarity.refineHotCellsDeep(cs, n, k, hotFactor = 4.0, iters = 2,
          onLevel = Some((d, c) => levels += ((d, c))))
        else cs
      val (mx1, p1, _) = occStats(refined)
      val nHot = levels.map(_._2).sum
      val perLvl = levels.map { case (d, c) => s"L$d+$c" }.mkString(" ")
      // the cost center, measured: within-cell pair pass over the
      // (possibly refined) assignment table. Persisted to parquet first —
      // BenchTiming's cleanup unpersists localCheckpoint blocks, and the
      // persisted-assignment read IS the serving-boundary shape anyway.
      val asgDir = s"/tmp/graft_scale_sd_asg_${tag.replace(' ', '_')}"
      refined.write.mode("overwrite").parquet(asgDir)
      val tPair = BenchTiming.steadyOf(spark, () => {
        val a = spark.read.parquet(asgDir)
        a.select(col("cell"), col("nid").as("a"), col("ce").as("ae"))
          .join(a.select(col("cell"), col("nid").as("b"),
            col("ce").as("be")), Seq("cell"))
          .filter(col("a") < col("b"))
          .filter(Similarity.cosine(col("ae"), col("be")) >= 0.35)
          .groupBy(col("cell")).agg(count(lit(1)).as("c"))
      })
      val tgt = math.max(1L, n / k)
      println(f"$tag%-24s n=$nn%7d k=$k%4d tgtOcc=$tgt%5d | pre: maxOcc=$mx0%6d pairs/vec=${p0.toDouble / nn}%9.1f | post: maxOcc=$mx1%6d pairs/vec=${p1.toDouble / nn}%9.1f cellsAdded=$nHot%3d [$perLvl%s] | pairPass=$tPair%7.3f s")
    }
    run("1x scheduled", smallDir, n1, KnobSchedule.ivfCells(n1), guard = true)
    run(s"${reps}x scheduled", bigDir, n1 * reps,
      KnobSchedule.ivfCells(n1 * reps), guard = true)
    run(s"${reps}x FIXED-KNOB ctl", bigDir, n1 * reps,
      KnobSchedule.ivfCells(n1), guard = false)
  }

  /** SEMDEDUP HOT-CELL-GUARD receipt (`runMain graft.DevScale R
    * semdedupskew`) — the balanced `semdedup` leg showed the guard
    * correctly DORMANT (spherical k-means balances the replicated
    * corpus); this leg plants the case the guard exists for: a
    * near-duplicate pile — 25% of the corpus concentrated in ONE tight
    * direction (unit e0 + small per-vector noise in a rotating second
    * dimension — near-identical, so k-means cannot split it at the top
    * level but CAN split it on the noise dimensions when recursed).
    * k-means parks one centroid on the pile → one cell holds ~25% of
    * the corpus → within-cell pair volume ~(n/4)²/2 re-creates the
    * all-pairs blow-up clustering was supposed to prevent. The guard
    * (occ > 4×target) sub-fits the pile into ceil(occ/target)
    * subcells. Printed per scale: pre/post max occupancy, pre/post
    * pairs/vector, subcell count, and the measured within-cell pair
    * pass — the post numbers are the receipt that the recursion caps
    * the quadratic term. */
  private def semDedupSkewExperiment(spark: org.apache.spark.sql.SparkSession,
                                     reps: Int): Unit = {
    import graft.llm.{KnobSchedule, Similarity}
    val dim = embedDim
    // hot pile: id-disjoint vectors clustered around e0 with ±0.05 noise
    // in a rotating dimension — near-dups (pairwise cosine ≈ 0.996+).
    // exact = true drops the noise: BYTE-IDENTICAL copies, the pile the
    // guard's sub-fits cannot split (no geometry) and the round-17
    // collapseExactDups pre-collapse exists for.
    def pile(count: Int, exact: Boolean): DataFrame = {
      import spark.implicits._
      (0 until count).map { i =>
        val e = Array.fill(dim)(0.0f)
        e(0) = 1.0f
        if (!exact) e(1 + (i % (dim - 1))) = 0.05f + 0.0005f * (i % 7)
        (900000000L + i, e)
      }.toDF("vec_id", "embedding")
    }
    def corpus(r: Int, dir: String, exact: Boolean,
               pileCount: Option[Int]): Long = {
      val base = replicatedEmbeddings(spark, r)
        .select(col("vec_id"), col("embedding"))
      val n0 = base.count()
      // pile = 25% of total unless the caller pins an absolute count
      val pc = pileCount.getOrElse((n0 / 3).toInt)
      val full = base.unionByName(pile(pc, exact))
      full.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      n0 + pc
    }
    val d01 = BenchTiming.steady(spark, "d01_scan_count", "/root/testdata/sf0.1")
    println(f"d01 sentinel: $d01%.3f s")
    def occStats(cs: DataFrame): (Long, Long, Long) = {
      val r = cs.groupBy(col("cell")).agg(count(lit(1)).as("occ"))
        .agg(max(col("occ")),
          sum((col("occ") * (col("occ") - 1) / 2).cast("long")),
          sum(col("occ"))).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    def run(tag: String, r: Int, exact: Boolean = false,
            pileCount: Option[Int] = None): Unit = {
      val dir = s"/tmp/graft_scale_sdskew_${r}_${exact}_" +
        pileCount.getOrElse(0)
      val n = corpus(r, dir, exact, pileCount)
      val em = spark.read.parquet(s"$dir/embeddings.parquet")
      val k = KnobSchedule.ivfCells(n)
      val cents = Similarity.fitCentroids(em, k, iters = 2)
      val cs = Similarity.cellAssignments(em, cents).localCheckpoint()
      val (mx0, p0, nn) = occStats(cs)
      // per-level split tracking (see semDedupExperiment)
      val levels = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
      val lvlCb: Option[(Int, Long) => Unit] =
        Some((d, c) => levels += ((d, c)))
      // the exact leg runs the round-17 production path: collapse
      // byte-identical values BEFORE the guard (one rep per value enters
      // the occupancy math and the pair pass); the near-dup leg keeps
      // the guard-only path (noise ⇒ every vector is a distinct value,
      // collapse would be a no-op there). Round-18: the collapse META is
      // the narrow member table (rep_id, mult, m_id, rk) — count its
      // widest GROUP to receipt that a 10⁵-deep pile no longer makes an
      // O(multiplicity) row anywhere (the old collect_list(nids) did).
      val guarded = if (exact) {
        val (reps, meta) = Similarity.collapseExactDups(cs)
        val nReps = reps.count()
        val widest = meta.groupBy(col("rep_id"))
          .agg(count(lit(1)).as("m")).agg(max(col("m"))).collect()(0)
          .getLong(0)
        println(f"$tag%-14s collapse: $nn rows -> $nReps reps " +
          f"(widest group mult=$widest%d carried as $widest%d narrow " +
          "member ROWS, no array row)")
        Similarity.refineHotCellsDeep(reps.localCheckpoint(), nReps, k,
          hotFactor = 4.0, iters = 2, onLevel = lvlCb)
      } else cs
      val refined = if (exact) guarded else
        Similarity.refineHotCellsDeep(cs, n, k, hotFactor = 4.0, iters = 2,
          onLevel = lvlCb)
      val nSub = levels.map(_._2).sum
      val perLvl = levels.map { case (d, c) => s"L$d+$c" }.mkString(" ")
      val (mx1, p1, _) = occStats(refined)
      val asgDir = s"$dir/asg"
      refined.write.mode("overwrite").parquet(asgDir)
      val tPair = BenchTiming.steadyOf(spark, () => {
        val a = spark.read.parquet(asgDir)
        a.select(col("cell"), col("nid").as("a"), col("ce").as("ae"))
          .join(a.select(col("cell"), col("nid").as("b"),
            col("ce").as("be")), Seq("cell"))
          .filter(col("a") < col("b"))
          .filter(Similarity.cosine(col("ae"), col("be")) >= 0.35)
          .groupBy(col("cell")).agg(count(lit(1)).as("c"))
      })
      val tgt = math.max(1L, n / k)
      println(f"$tag%-14s n=$nn%7d k=$k%4d tgtOcc=$tgt%5d | pre: maxOcc=$mx0%7d pairs/vec=${p0.toDouble / nn}%10.1f | post: maxOcc=$mx1%7d pairs/vec=${p1.toDouble / nn}%10.1f cellsAdded=$nSub%4d [$perLvl%s] | pairPass=$tPair%7.3f s")
    }
    run("1x+pile", 1)
    run(s"${reps}x+pile", reps)
    // the round-17 receipt: the SAME pile made byte-identical — the
    // sub-fit guard alone cannot split it (post numbers would stay at
    // occ ≈ n/4); with the collapse the pile enters as ONE row and the
    // pair pass reads flat
    run("1x+exactpile", 1, exact = true)
    run(s"${reps}x+exactpile", reps, exact = true)
    // the round-18 receipt for the de-widened collapse meta: a planted
    // 10⁵-deep byte-identical pile — the OLD collect_list(nids) meta
    // would have made one 10⁵-element array row here; the member table
    // carries it as 10⁵ narrow rows (the printed widest-group line),
    // and the pair pass still reads flat
    run("1x+exactpile1e5", 1, exact = true, pileCount = Some(100000))
  }

  /** IMAGE-DEDUP band-width receipt (`runMain graft.DevScale R imagedup`)
    * — the l122 100 TB claim measured: random band collisions cost
    * n²/2^bits candidate pairs, so FIXED 8-bit bands are quadratic
    * growth in disguise — at R× corpus the hot-band guard (occupancy
    * cap) turns from a skew protection into a recall killer (most
    * buckets cross the cap and their pairs are LOST), while the
    * SCHEDULED width (`KnobSchedule.dhashBandBits` — 16-bit at this
    * scale, still recall-lossless for Hamming ≤ 3) keeps occupancy
    * under the cap with the guard dormant. Printed per (scale, width):
    * hot buckets, guarded candidate volume, verified pairs (the
    * 16-bit run is the truth — lossless at radius 2 with a dormant
    * guard), and the pair-pass wall. */
  private def imageDupExperiment(spark: org.apache.spark.sql.SparkSession,
                                 reps: Int): Unit = {
    import graft.llm.{KnobSchedule, Multimodal}
    val smallDir = "/tmp/graft_scale_img_small"
    val bigDir = "/tmp/graft_scale_img_big"
    replicatedText(spark, 1).write.mode("overwrite")
      .parquet(s"$smallDir/documents.parquet")
    replicatedText(spark, reps).write.mode("overwrite")
      .parquet(s"$bigDir/documents.parquet")
    val d01 = BenchTiming.steady(spark, "d01_scan_count", "/root/testdata/sf0.1")
    println(f"d01 sentinel: $d01%.3f s")
    def run(tag: String, dir: String, bits: Int): Unit = {
      val docs = Tables.load(spark, dir, "documents")
      val sigDir = s"$dir/dhash_sig"
      Multimodal.dHash(spark, Multimodal.encodePpm(spark, docs).toDF())
        .toDF().write.mode("overwrite").parquet(sigDir)
      val sig = spark.read.parquet(sigDir)
      val n = sig.count()
      val cap = 500
      val nBands = 64 / bits
      val mask = (1L << bits) - 1
      val bands = sig.select(col("doc_id"), col("dhash"),
        posexplode(array((0 until nBands).map(bi =>
          shiftright(col("dhash"), bits * bi).bitwiseAND(lit(mask))): _*))
          .as(Seq("band_idx", "band_val")))
      val occ = bands.groupBy(col("band_idx"), col("band_val"))
        .agg(count(lit(1)).as("occ")).localCheckpoint()
      val nHot = occ.filter(col("occ") > cap).count()
      // guarded candidate volume = Σ_cold-buckets occ·(occ−1)/2 (upper
      // bound of distinct pairs — the exact distinct needs the join)
      val candVol = occ.filter(col("occ") <= cap)
        .agg(sum((col("occ") * (col("occ") - 1) / 2).cast("long")))
        .collect()(0).getLong(0)
      val nPairs = Multimodal.imageNearDupsFromSigs(
        spark.read.parquet(sigDir), maxHamming = 2, maxBandOcc = cap,
        bandBits = bits).count()
      val tPair = BenchTiming.steadyOf(spark, () =>
        Multimodal.imageNearDupsFromSigs(spark.read.parquet(sigDir),
          maxHamming = 2, maxBandOcc = cap, bandBits = bits))
      println(f"$tag%-16s n=$n%7d bits=$bits%2d bands=$nBands | hotBuckets=$nHot%5d candVol=$candVol%12d pairs=$nPairs%9d | pairPass=$tPair%7.3f s")
    }
    run("1x fixed8", smallDir, 8)
    run(s"${reps}x fixed8", bigDir, 8)
    val nBig = spark.read.parquet(s"$bigDir/documents.parquet").count()
    run(s"${reps}x scheduled", bigDir, KnobSchedule.dhashBandBits(nBig))
    // the l146 PAIRED-GROUP legs — the lever past the 16-bit ladder
    // end: measure, at a LOW cap (the at-scale occupancy pressure made
    // visible without synthesizing 8M images), how many buckets the
    // guard eats and how many true pairs survive under 16-bit banding
    // vs the 21-22-bit paired-group keys, truth = the unguarded pass
    def runGrouped(tag: String, dir: String, cap: Int): Unit = {
      // the production apply pipeline pre-collapses exact-hash cliques
      // before any banding — run the comparison on the collapsed reps,
      // where occupancy pressure is CONTENT clustering, not replication
      val sig0 = spark.read.parquet(s"$dir/dhash_sig")
      sig0.join(
          sig0.groupBy(col("dhash")).agg(min(col("doc_id")).as("doc_id")),
          Seq("dhash", "doc_id"), "left_semi")
        .write.mode("overwrite").parquet(s"$dir/dhash_sig_reps")
      val sig = spark.read.parquet(s"$dir/dhash_sig_reps")
      val truth = Multimodal.sigPairsGrouped(sig, maxHamming = 2,
        maxTableOcc = 1 << 30).count()
      def leg(name: String, nHot: Long, nPairs: Long, t: Double): Unit =
        println(f"$tag%-16s $name%-14s cap=$cap%4d | hotBuckets=$nHot%6d pairs=$nPairs%9d of $truth%9d | pairPass=$t%7.3f s")
      val bHot = sig.select(col("dhash"),
          posexplode(array((0 until 4).map(bi =>
            shiftright(col("dhash"), 16 * bi)
              .bitwiseAND(lit(65535L))): _*))
            .as(Seq("band_idx", "band_val")))
        .groupBy(col("band_idx"), col("band_val"))
        .agg(count(lit(1)).as("occ")).filter(col("occ") > cap).count()
      val bPairs = Multimodal.imageNearDupsFromSigs(sig, maxHamming = 2,
        maxBandOcc = cap, bandBits = 16).count()
      val bT = BenchTiming.steadyOf(spark, () =>
        Multimodal.imageNearDupsFromSigs(sig, maxHamming = 2,
          maxBandOcc = cap, bandBits = 16))
      leg("banded16", bHot, bPairs, bT)
      val gPairs = Multimodal.sigPairsGrouped(sig, maxHamming = 2,
        maxTableOcc = cap).count()
      val gT = BenchTiming.steadyOf(spark, () =>
        Multimodal.sigPairsGrouped(sig, maxHamming = 2, maxTableOcc = cap))
      // hot-bucket count for the grouped keys at the same cap — the
      // PRODUCTION key expressions (Multimodal.sigGroupKeyed), so a
      // grouping change can never desynchronize this receipt
      val gHotN = Multimodal.sigGroupKeyed(
          sig.select(col("doc_id"), col("dhash")))
        .groupBy(col("table_id"), col("tkey"))
        .agg(count(lit(1)).as("occ")).filter(col("occ") > cap).count()
      leg("grouped15x21b", gHotN, gPairs, gT)
    }
    runGrouped(s"${reps}x lowcap", bigDir, 48)
  }

  /** VIDEO-DEDUP band-width receipt (`runMain graft.DevScale R
    * videodup`) — the l135 schedule claim measured at scale: each
    * (frame, band) bucket's occupancy grows with the CLIP count, so
    * fixed 8-bit bands are the same n²/2^bits quadratic-in-disguise as
    * the single-signature planes and the guard turns into a per-frame
    * recall killer at R×, while the scheduled width keeps the guard
    * near-dormant. Printed per (scale, width): hot (frame, band)
    * buckets, verified PAIR count (≥ 2 aligned close frames), and the
    * pair-pass wall. */
  private def videoDupExperiment(spark: org.apache.spark.sql.SparkSession,
                                 reps: Int): Unit = {
    import graft.llm.{KnobSchedule, Multimodal}
    val smallDir = "/tmp/graft_scale_vid_small"
    val bigDir = "/tmp/graft_scale_vid_big"
    replicatedText(spark, 1).write.mode("overwrite")
      .parquet(s"$smallDir/documents.parquet")
    replicatedText(spark, reps).write.mode("overwrite")
      .parquet(s"$bigDir/documents.parquet")
    val d01 = BenchTiming.steady(spark, "d01_scan_count", "/root/testdata/sf0.1")
    println(f"d01 sentinel: $d01%.3f s")
    def run(tag: String, dir: String, bits: Int): Unit = {
      val docs = Tables.load(spark, dir, "documents")
      val sigDir = s"$dir/vframe_sig"
      Multimodal.videoFrameHashes(spark,
          Multimodal.encodeVideo(spark, docs).toDF())
        .toDF().write.mode("overwrite").parquet(sigDir)
      val sig = spark.read.parquet(sigDir)
      val nClips = sig.select(col("doc_id")).distinct().count()
      val cap = 500
      val nBands = 64 / bits
      val mask = (1L << bits) - 1
      val nHot = sig.select(col("doc_id"), col("frame_idx"), col("dhash"),
          posexplode(array((0 until nBands).map(bi =>
            shiftright(col("dhash"), bits * bi).bitwiseAND(lit(mask))): _*))
            .as(Seq("band_idx", "band_val")))
        .groupBy(col("frame_idx"), col("band_idx"), col("band_val"))
        .agg(count(lit(1)).as("occ"))
        .filter(col("occ") > cap).count()
      val nPairs = Multimodal.videoNearDupsFromSigs(
        spark.read.parquet(sigDir), maxHamming = 2, maxBandOcc = cap,
        minFrames = 2, bandBits = bits).count()
      val tPair = BenchTiming.steadyOf(spark, () =>
        Multimodal.videoNearDupsFromSigs(spark.read.parquet(sigDir),
          maxHamming = 2, maxBandOcc = cap, minFrames = 2, bandBits = bits))
      println(f"$tag%-16s clips=$nClips%7d bits=$bits%2d bands=$nBands | hotFrameBuckets=$nHot%6d pairs=$nPairs%9d | pairPass=$tPair%7.3f s")
    }
    run("1x fixed8", smallDir, 8)
    run(s"${reps}x fixed8", bigDir, 8)
    val nBig = spark.read.parquet(s"$bigDir/documents.parquet").count()
    run(s"${reps}x scheduled", bigDir, KnobSchedule.dhashBandBits(nBig))
    // the l136 OFFSET detector's legs: frame-BLIND banding, so the
    // bucket occupancy (and the schedule's collision unit) is the SIG
    // ROW count (clips × frames) — its Auto twin schedules from
    // sig.count(), and this is the measured receipt that the wider
    // width keeps the frame-blind guard dormant at R×
    def runOffset(tag: String, dir: String, bits: Int): Unit = {
      val sig = spark.read.parquet(s"$dir/vframe_sig")
      val cap = 500
      val nBands = 64 / bits
      val mask = (1L << bits) - 1
      val nHot = sig.select(col("dhash"),
          posexplode(array((0 until nBands).map(bi =>
            shiftright(col("dhash"), bits * bi).bitwiseAND(lit(mask))): _*))
            .as(Seq("band_idx", "band_val")))
        .groupBy(col("band_idx"), col("band_val"))
        .agg(count(lit(1)).as("occ"))
        .filter(col("occ") > cap).count()
      val nPairs = Multimodal.videoOffsetNearDupsFromSigs(sig,
        maxHamming = 2, maxBandOcc = cap, minFrames = 1, maxOffset = 1,
        bandBits = bits).count()
      val tPair = BenchTiming.steadyOf(spark, () =>
        Multimodal.videoOffsetNearDupsFromSigs(sig,
          maxHamming = 2, maxBandOcc = cap, minFrames = 1, maxOffset = 1,
          bandBits = bits))
      println(f"$tag%-16s offset-detector bits=$bits%2d | hotBlindBuckets=$nHot%6d pairOffsetRows=$nPairs%9d | pairPass=$tPair%7.3f s")
    }
    runOffset("1x fixed8", smallDir, 8)
    runOffset(s"${reps}x fixed8", bigDir, 8)
    val nSigBig = spark.read.parquet(s"$bigDir/vframe_sig").count()
    runOffset(s"${reps}x scheduled", bigDir,
      KnobSchedule.dhashBandBits(nSigBig))
  }

  /** GROUPED-KEYS receipts for the frame-blind offset cores and the
    * persisted probe index (`runMain graft.DevScale R offsetgrouped`) —
    * the round-18 directive-#1 measured legs. Three claims:
    *  1. LOWCAP offset legs (cap 48 — the at-scale occupancy pressure
    *     made visible, the l146/imagedup lowcap discipline): under the
    *     same cap the 16-bit frame-blind bands go hot and shed verified
    *     offset rows, the 21–22-bit grouped keys keep them.
    *  2. The SCHEDULED path crosses the switch threshold by REP COUNT:
    *     threshold = targetOcc·2¹⁶ sig rows, so at targetOcc = 1 the 1×
    *     corpus (~15k rows) sits below it and the R× corpus above —
    *     the same code path and the same occupancy algebra as 4.2M rows
    *     at the default 64, differing only by the constant the lowcap
    *     legs price.
    *  3. The 8-bit band PROBE INDEX saturates first of everything: it
    *     has 2048 buckets TOTAL, so state occupancy n/2048 crosses any
    *     cap ~2¹³× earlier than the grouped keys' 15·2²¹⁺ buckets —
    *     at R× state and the equivalent cap, the banded compaction
    *     exclusion silences the whole index (0 dup verdicts retained on
    *     an all-duplicates probe) while the grouped index retains all,
    *     at a bounded probe wall. */
  private def offsetGroupedExperiment(
      spark: org.apache.spark.sql.SparkSession, reps: Int): Unit = {
    import graft.llm.{KnobSchedule, Multimodal}
    val smallDir = "/tmp/graft_scale_og_small"
    val bigDir = "/tmp/graft_scale_og_big"
    replicatedText(spark, 1).write.mode("overwrite")
      .parquet(s"$smallDir/documents.parquet")
    replicatedText(spark, reps).write.mode("overwrite")
      .parquet(s"$bigDir/documents.parquet")
    val d01 = BenchTiming.steady(spark, "d01_scan_count",
      "/root/testdata/sf0.1")
    println(f"d01 sentinel: $d01%.3f s")
    // All leg inputs live in PARQUET, never localCheckpoint — the
    // BenchTiming cleanup between timed runs unpersists every RDD,
    // which would evict a checkpointed input out from under the timed
    // closure (the documented DevScale trap). The offset legs run on
    // the exact-SEQUENCE collapsed reps — the production offset
    // applies' actual input (the imagedup runGrouped discipline): on
    // raw sigs the truth leg is dominated by exact-re-post clique mass
    // (hundreds of millions of rows at 10×), which the pre-collapse
    // removes by EQUALITY before any banding; occupancy pressure on
    // the reps is CONTENT clustering, the thing the guard faces.
    for (dir <- Seq(smallDir, bigDir)) {
      val docs = Tables.load(spark, dir, "documents")
      Multimodal.videoFrameHashes(spark,
          Multimodal.encodeVideo(spark, docs).toDF())
        .toDF().write.mode("overwrite").parquet(s"$dir/vframe_sig")
      Multimodal.videoSeqReps(spark.read.parquet(s"$dir/vframe_sig")
          .select(col("doc_id"), col("frame_idx"), col("dhash")))
        .write.mode("overwrite").parquet(s"$dir/vframe_sig_reps")
      Multimodal.dHash(spark, Multimodal.encodePpm(spark, docs).toDF())
        .toDF().select(col("doc_id"), col("dhash"))
        .write.mode("overwrite").parquet(s"$dir/img_sig")
    }
    // 1 — lowcap offset legs: banded16 vs grouped at the same cap,
    // truth = the unguarded widest-band pass over the collapsed reps
    def offsetLeg(tag: String, dir: String, cap: Int): Unit = {
      val sig = spark.read.parquet(s"$dir/vframe_sig_reps")
      val truth = Multimodal.videoOffsetNearDupsFromSigs(sig, 2, 1 << 30,
        1, 1, bandBits = 16).count()
      val bRows = Multimodal.videoOffsetNearDupsFromSigs(sig, 2, cap, 1, 1,
        bandBits = 16).count()
      val bT = BenchTiming.steadyOf(spark, () =>
        Multimodal.videoOffsetNearDupsFromSigs(sig, 2, cap, 1, 1,
          bandBits = 16))
      val gRows = Multimodal.videoOffsetNearDupsGroupedFromSigs(sig, 2, cap,
        1, 1).count()
      val gT = BenchTiming.steadyOf(spark, () =>
        Multimodal.videoOffsetNearDupsGroupedFromSigs(sig, 2, cap, 1, 1))
      println(f"$tag%-12s offset cap=$cap%4d | banded16 rows=$bRows%8d of $truth%8d wall=$bT%7.3f s | grouped rows=$gRows%8d wall=$gT%7.3f s")
    }
    offsetLeg(s"${reps}x lowcap", bigDir, 48)
    offsetLeg(s"${reps}x cap500", bigDir, 500)
    // 2 — the scheduled path crossing the switch threshold by row
    // count, on the RAW sig table: the PAIR-core Auto twins schedule
    // from the uncollapsed clips × frames row count (only the applies
    // pre-collapse), so this is videoOffsetNearDupsAuto's honest input
    for ((tag, dir) <- Seq(("1x", smallDir), (s"${reps}x", bigDir))) {
      val sig = spark.read.parquet(s"$dir/vframe_sig")
      val n = sig.count()
      val on = KnobSchedule.dhashUseGroupedKeys(n, 2, targetOcc = 1)
      val rows = Multimodal.frameOffsetPairsScheduled(sig, 2, 500, 1, 1,
        targetOcc = 1).count()
      val t = BenchTiming.steadyOf(spark, () =>
        Multimodal.frameOffsetPairsScheduled(sig, 2, 500, 1, 1,
          targetOcc = 1))
      println(f"$tag%-12s scheduled(targetOcc=1) nSig=$n%8d groupedKeys=$on%5s rows=$rows%8d wall=$t%7.3f s")
    }
    // 3 — the persisted probe index at saturation: an all-duplicates
    // probe batch (replica-0 signatures re-tagged) against the R×
    // state, compacted + probed with each key family at the same cap
    def indexLeg(tag: String, cap: Int): Unit = {
      val state = spark.read.parquet(s"$bigDir/img_sig")
      // every leg input in parquet (the cleanup-eviction trap above)
      spark.read.parquet(s"$smallDir/img_sig")
        .select((col("doc_id") + 900000000L).as("doc_id"), col("dhash"))
        .write.mode("overwrite").parquet(s"$bigDir/probe_sig")
      val probe = spark.read.parquet(s"$bigDir/probe_sig")
      val nProbe = probe.count()
      val (bReps, bHot0) = Multimodal.compactSigState(state, maxBandOcc = cap)
      bHot0.write.mode("overwrite").parquet(s"$bigDir/bhot")
      Multimodal.sigBandIndex(bReps)
        .write.mode("overwrite").parquet(s"$bigDir/bidx")
      val bHot = spark.read.parquet(s"$bigDir/bhot")
      val bIdx = spark.read.parquet(s"$bigDir/bidx")
      val bDup = Multimodal.sigDedupIncrementIndexed(probe, bIdx, 2,
        Some(bHot))._1.filter(col("verdict") === "dup_corpus").count()
      val bT = BenchTiming.steadyOf(spark, () =>
        Multimodal.sigDedupIncrementIndexed(probe, bIdx, 2, Some(bHot))._1)
      val nbHot = bHot.count()
      val (gReps, gHot0) = Multimodal.compactSigStateGrouped(state,
        maxTableOcc = cap)
      gHot0.write.mode("overwrite").parquet(s"$bigDir/ghot")
      Multimodal.sigGroupIndex(gReps)
        .write.mode("overwrite").parquet(s"$bigDir/gidx")
      val gHot = spark.read.parquet(s"$bigDir/ghot")
      val gIdx = spark.read.parquet(s"$bigDir/gidx")
      val gDup = Multimodal.sigDedupIncrementIndexedGrouped(probe, gIdx, 2,
        Some(gHot))._1.filter(col("verdict") === "dup_corpus").count()
      val gT = BenchTiming.steadyOf(spark, () =>
        Multimodal.sigDedupIncrementIndexedGrouped(probe, gIdx, 2,
          Some(gHot))._1)
      val ngHot = gHot.count()
      println(f"$tag%-12s index cap=$cap%4d probe=$nProbe%6d | banded8 hot=$nbHot%5d dupKept=$bDup%6d wall=$bT%7.3f s | grouped hot=$ngHot%5d dupKept=$gDup%6d wall=$gT%7.3f s")
    }
    indexLeg(s"${reps}x lowcap", 48)
    indexLeg(s"${reps}x cap500", 500)
    // 4 — the FRAME-PLANE admission probe (S43) at the ladder's end:
    // an all-duplicates batch (replica-0 clips re-tagged) against the
    // R× frame state, compacted with each key family's exclusion at
    // the same cap — the indexLeg story on the plane that saturates
    // FIRST (frame-blind buckets collide on clips × frames rows)
    def frameProbeLeg(tag: String, cap: Int): Unit = {
      val state = spark.read.parquet(s"$bigDir/vframe_sig")
        .select(col("doc_id"), col("frame_idx"), col("dhash"))
      Multimodal.encodeVideo(spark,
          Tables.load(spark, smallDir, "documents")
            .select((col("doc_id") + 900000000L).as("doc_id"),
              col("text")))
        .toDF().write.mode("overwrite").parquet(s"$bigDir/probe_blobs")
      val batch = spark.read.parquet(s"$bigDir/probe_blobs")
      val nBatch = batch.count()
      val (bReps, bHot0) =
        Multimodal.compactVideoSigStateOffset(state, maxBandOcc = cap)
      bReps.write.mode("overwrite").parquet(s"$bigDir/vf_breps")
      bHot0.write.mode("overwrite").parquet(s"$bigDir/vf_bhot")
      val (bR, bH) = (spark.read.parquet(s"$bigDir/vf_breps"),
        spark.read.parquet(s"$bigDir/vf_bhot"))
      val bDup = Multimodal.videoOffsetDedupIncrement(spark, batch, bR,
        maxHamming = 2, minFrames = 2, maxOffset = 1,
        hotBands = Some(bH))._1
        .filter(col("verdict") === "dup_corpus").count()
      val bT = BenchTiming.steadyOf(spark, () =>
        Multimodal.videoOffsetDedupIncrement(spark, batch, bR,
          maxHamming = 2, minFrames = 2, maxOffset = 1,
          hotBands = Some(bH))._1)
      val (gReps, gHot0) = Multimodal.compactVideoSigStateOffsetGrouped(
        state, maxTableOcc = cap)
      gReps.write.mode("overwrite").parquet(s"$bigDir/vf_greps")
      gHot0.write.mode("overwrite").parquet(s"$bigDir/vf_ghot")
      val (gR, gH) = (spark.read.parquet(s"$bigDir/vf_greps"),
        spark.read.parquet(s"$bigDir/vf_ghot"))
      val gDup = Multimodal.videoOffsetDedupIncrementGrouped(spark, batch,
        gR, maxHamming = 2, minFrames = 2, maxOffset = 1,
        hotKeys = Some(gH))._1
        .filter(col("verdict") === "dup_corpus").count()
      val gT = BenchTiming.steadyOf(spark, () =>
        Multimodal.videoOffsetDedupIncrementGrouped(spark, batch, gR,
          maxHamming = 2, minFrames = 2, maxOffset = 1,
          hotKeys = Some(gH))._1)
      println(f"$tag%-12s frameProbe cap=$cap%4d batch=$nBatch%6d | banded8 hot=${bH.count()}%6d dupKept=$bDup%6d wall=$bT%7.3f s | grouped hot=${gH.count()}%6d dupKept=$gDup%6d wall=$gT%7.3f s")
    }
    frameProbeLeg(s"${reps}x lowcap", 48)
    frameProbeLeg(s"${reps}x cap500", 500)
    // 5 — the switch's COST table (round-19 directive #6): wall vs
    // retention BELOW / AT / ABOVE the grouped threshold (targetOcc = 1
    // → 65,536 sig rows), banded16 and grouped at the same cap, the
    // unguarded 16-bit pass as truth. The earlier rounds priced the
    // switch's recall side (10.9×–78× retention); this prices what the
    // grouped pair pass COSTS at and around the point the schedule
    // flips it on. Two sub-tables, two honest inputs: (a) COLLAPSED
    // reps — the applies' input, where the unguarded truth leg is
    // affordable, so retention is an absolute recall; (b) the RAW sig
    // table — the pair-core Autos' actual scheduling input, which is
    // what genuinely crosses the 65,536-row threshold (collapsed reps
    // saturate ~18k on this corpus), where truth is clique-dominated
    // and prohibitive, so retention is the grouped/banded RELATIVE
    // differential at the same cap.
    val midDir = "/tmp/graft_scale_og_mid"
    val n1SigRaw = spark.read.parquet(s"$smallDir/vframe_sig").count()
    val midReps = math.max(2, math.ceil(65536.0 / math.max(1L, n1SigRaw)
      .toDouble).toInt)
    replicatedText(spark, midReps).write.mode("overwrite")
      .parquet(s"$midDir/documents.parquet")
    locally {
      val docs = Tables.load(spark, midDir, "documents")
      Multimodal.videoFrameHashes(spark,
          Multimodal.encodeVideo(spark, docs).toDF())
        .toDF().write.mode("overwrite").parquet(s"$midDir/vframe_sig")
      Multimodal.videoSeqReps(spark.read.parquet(s"$midDir/vframe_sig")
          .select(col("doc_id"), col("frame_idx"), col("dhash")))
        .write.mode("overwrite").parquet(s"$midDir/vframe_sig_reps")
    }
    def wallLeg(tag: String, dir: String, cap: Int): Unit = {
      val sig = spark.read.parquet(s"$dir/vframe_sig_reps")
      val n = sig.count()
      val truth = Multimodal.videoOffsetNearDupsFromSigs(sig, 2, 1 << 30,
        1, 1, bandBits = 16).count()
      val bRows = Multimodal.videoOffsetNearDupsFromSigs(sig, 2, cap, 1, 1,
        bandBits = 16).count()
      val bT = BenchTiming.steadyOf(spark, () =>
        Multimodal.videoOffsetNearDupsFromSigs(sig, 2, cap, 1, 1,
          bandBits = 16))
      val gRows = Multimodal.videoOffsetNearDupsGroupedFromSigs(sig, 2, cap,
        1, 1).count()
      val gT = BenchTiming.steadyOf(spark, () =>
        Multimodal.videoOffsetNearDupsGroupedFromSigs(sig, 2, cap, 1, 1))
      println(f"$tag%-12s wallVsRet cap=$cap%4d nReps=$n%7d | banded16 rows=$bRows%8d of $truth%8d wall=$bT%7.3f s | grouped rows=$gRows%8d of $truth%8d wall=$gT%7.3f s")
    }
    for (cap <- Seq(48, 500);
         (tag, dir) <- Seq(("1x", smallDir),
           (s"${midReps}x", midDir), (s"${reps}x", bigDir)))
      wallLeg(tag, dir, cap)
    def rawLeg(tag: String, dir: String): Unit = {
      val sig = spark.read.parquet(s"$dir/vframe_sig")
        .select(col("doc_id"), col("frame_idx"), col("dhash"))
      val n = sig.count()
      val on = KnobSchedule.dhashUseGroupedKeys(n, 2, targetOcc = 1)
      val bRows = Multimodal.videoOffsetNearDupsFromSigs(sig, 2, 500, 1, 1,
        bandBits = 16).count()
      val bT = BenchTiming.steadyOf(spark, () =>
        Multimodal.videoOffsetNearDupsFromSigs(sig, 2, 500, 1, 1,
          bandBits = 16))
      val gRows = Multimodal.videoOffsetNearDupsGroupedFromSigs(sig, 2, 500,
        1, 1).count()
      val gT = BenchTiming.steadyOf(spark, () =>
        Multimodal.videoOffsetNearDupsGroupedFromSigs(sig, 2, 500, 1, 1))
      println(f"$tag%-12s rawThreshold cap= 500 nSig=$n%7d grouped=$on%5s | banded16 rows=$bRows%8d wall=$bT%7.3f s | grouped rows=$gRows%8d wall=$gT%7.3f s")
    }
    rawLeg("below 1x", smallDir)
    rawLeg(s"at ${midReps}x", midDir)
    rawLeg(s"above ${reps}x", bigDir)
    // 6 — directive-#1 receipt on this plane: the cap the calibration
    // closure picks off the l150 frame-plane sweep at target recall,
    // in the grouped era the R× corpus sits in at targetOcc = 1
    val calSig = spark.read.parquet(s"$bigDir/vframe_sig_reps")
    Seq(0.90, 0.95, 0.99).foreach { r =>
      val cal = Multimodal.frameGuardCapCalibrated(calSig, maxHamming = 2,
        minFrames = 1, maxOffset = 1, aligned = false, targetRecall = r,
        caps = Seq(48, 100, 200, 500, 1000, 1 << 30), targetOcc = 1L)
      println(f"${reps}x frameGuardCapCalibrated target=$r%.2f -> cap=$cal%d")
    }
  }

  /** S42/S43 COMPACTION-CADENCE receipt (`runMain graft.DevScale R
    * sigcompact`) — the round-18 stretch directive #7: the video-offset
    * admission loop's carried state compacts by exact-SEQUENCE collapse
    * + frame-blind hot-bucket exclusion (`compactVideoSigStateOffset`);
    * this prices what a skipped compaction costs. State model: the R×
    * corpus plus a VIRAL re-post pile — `viralCopies` exact payload
    * copies of the replica-0 clips (the multiplicity skew compaction
    * exists for; replicas themselves are content-distinct by
    * construction, so without the pile the collapse would be a no-op
    * and the receipt vacuous). Per leg: state rows, one-batch
    * `videoOffsetDedupIncrement` probe wall against RAW vs COMPACTED
    * state, and the dup-verdict count (must be equal — the collapse is
    * verdict-lossless, the S43 scaladoc's claim, here measured). */
  private def sigCompactExperiment(
      spark: org.apache.spark.sql.SparkSession, reps: Int): Unit = {
    import graft.llm.Multimodal
    val dir = "/tmp/graft_scale_sigcompact"
    val viralCopies = 50
    replicatedText(spark, reps).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val d01 = BenchTiming.steady(spark, "d01_scan_count",
      "/root/testdata/sf0.1")
    println(f"d01 sentinel: $d01%.3f s")
    val docs = Tables.load(spark, dir, "documents")
    Multimodal.videoFrameHashes(spark,
        Multimodal.encodeVideo(spark, docs).toDF())
      .toDF().write.mode("overwrite").parquet(s"$dir/vframe_sig")
    val baseSig = spark.read.parquet(s"$dir/vframe_sig")
    val rep0 = baseSig.filter(col("doc_id") < 10000000L)
    // viral ids start at 500M — past any feasible replica slot
    // (replicatedText uses doc_id + k·10M, so reps ≤ 49 stay below
    // 500M; 20M-based ids collided with replica slots at reps ≥ 3 and
    // silently merged content-distinct clips, round-19 ADVICE)
    val viral = (0 until viralCopies).map(k =>
      rep0.select((col("doc_id") + lit(500000000L + k * 10000000L))
        .as("doc_id"), col("frame_idx"), col("dhash")))
      .reduce(_ unionByName _)
    baseSig.select(col("doc_id"), col("frame_idx"), col("dhash"))
      .unionByName(viral)
      .write.mode("overwrite").parquet(s"$dir/state_raw")
    val raw = spark.read.parquet(s"$dir/state_raw")
    val (comp0, hot0) = Multimodal.compactVideoSigStateOffset(raw,
      maxBandOcc = 500)
    comp0.write.mode("overwrite").parquet(s"$dir/state_comp")
    val comp = spark.read.parquet(s"$dir/state_comp")
    // every leg input in parquet, never localCheckpoint — BenchTiming's
    // cleanup between timed runs unpersists all RDDs (the documented
    // DevScale eviction trap)
    hot0.write.mode("overwrite").parquet(s"$dir/hot")
    val hot = spark.read.parquet(s"$dir/hot")
    val nRaw = raw.count()
    val nComp = comp.count()
    val nHot = hot.count()
    // one fresh batch: replica-0 clips re-tagged — every member is an
    // exact duplicate of state content, so dup verdicts must be total
    // and identical on both legs
    Multimodal.encodeVideo(spark,
        Tables.load(spark, dir, "documents")
          .filter(col("doc_id") < 10000000L)
          .select((col("doc_id") + 900000000L).as("doc_id"), col("text")))
      .toDF().write.mode("overwrite").parquet(s"$dir/batch_blobs")
    val batch = spark.read.parquet(s"$dir/batch_blobs")
    // three legs, separating the two claims the compaction contract
    // makes: (a) raw state — the skipped-compaction control; (b) the
    // exact-SEQUENCE collapse ALONE — must be verdict-LOSSLESS (the
    // S43 scaladoc claim, here measured) at a fraction of (a)'s wall;
    // (c) collapse + hot-bucket exclusion — the guard's DOCUMENTED
    // recall trade, priced on this deliberately degenerate corpus
    // (content so clustered that even collapsed occupancy tops the
    // cap; a real corpus's guard stays near-dormant — the cap-500
    // offsetgrouped legs — but the trade must be visible, not hidden)
    def dupCount(state: DataFrame, hotBands: Option[DataFrame]): Long =
      Multimodal.videoOffsetDedupIncrement(spark, batch, state,
        maxHamming = 2, minFrames = 2, maxOffset = 1,
        hotBands = hotBands)._1
        .filter(col("verdict") === "dup_corpus").count()
    def probeWall(state: DataFrame, hotBands: Option[DataFrame]): Double =
      BenchTiming.steadyOf(spark, () =>
        Multimodal.videoOffsetDedupIncrement(spark, batch, state,
          maxHamming = 2, minFrames = 2, maxOffset = 1,
          hotBands = hotBands)._1)
    val dRaw = dupCount(raw, None)
    val dComp = dupCount(comp, None)
    val dGuard = dupCount(comp, Some(hot))
    val tRaw = probeWall(raw, None)
    val tComp = probeWall(comp, None)
    val tGuard = probeWall(comp, Some(hot))
    println(f"${reps}x+viral$viralCopies stateRows raw=$nRaw%9d compacted=$nComp%9d (hotBlindBuckets=$nHot%4d) | probe raw=$tRaw%8.3f s collapsed=$tComp%8.3f s collapsed+guard=$tGuard%8.3f s | dupVerdicts raw=$dRaw%6d collapsed=$dComp%6d collapsed+guard=$dGuard%6d")
    // the round-20 cadence predicate read against THIS state (the
    // corpus the knob was derived for): it must fire on the piled raw
    // state and stand down right after the collapse
    val dueRaw = graft.llm.KnobSchedule.compactionDue(nRaw, nComp)
    val dueComp = graft.llm.KnobSchedule.compactionDue(nComp, nComp)
    println(f"${reps}x+viral$viralCopies compactionDue(raw=$nRaw%d, reps=$nComp%d)=$dueRaw%5s | compactionDue(reps, reps)=$dueComp%5s (expansion=${nRaw.toDouble / nComp}%5.1f x, trigger at 2x)")
  }

  /** COMPOSED curation-pipeline scale-up (`runMain graft.DevScale R
    * pipeline`) — the round-16 stretch receipt: the scheduled knobs must
    * hold COMPOSED, not just per-operator. Per scale: semDedupAuto
    * (√n cells + exact-dup collapse + iterated guard) curates the vector
    * store; ivfPqFit at coarse cells scheduled from the SURVIVOR count
    * builds the serving index over the survivors; a FIXED query log
    * serves from the persisted model at the coupled (nProbe, shortM)
    * knobs. Printed: survivor count, scheduled knobs, the dedup stage's
    * one-shot wall (a batch job runs once per corpus — one-shot is its
    * honest unit), and the steady-state serve wall (min-of-2, the
    * ivfPqExperiment discipline). The claim: survivors feed the index
    * with no re-introduced linear term — dedup wall tracks the
    * semDedup √R receipt, serve wall tracks the ivfpq √R receipt, and
    * the composition's knobs derive from the honest intermediate
    * (survivor) cardinality, not the raw corpus. */
  private def pipelineExperiment(spark: org.apache.spark.sql.SparkSession,
                                 reps: Int): Unit = {
    import graft.llm.{KnobSchedule, Multimodal, Similarity}
    val n1 = Tables.load(spark, "/root/testdata/sf0.1", "embeddings").count()
    val smallDir = "/tmp/graft_scale_pipe_small"
    val bigDir = "/tmp/graft_scale_pipe_big"
    replicatedEmbeddings(spark, 1).write.mode("overwrite")
      .parquet(s"$smallDir/embeddings.parquet")
    replicatedEmbeddings(spark, reps).write.mode("overwrite")
      .parquet(s"$bigDir/embeddings.parquet")
    replicatedText(spark, 1).write.mode("overwrite")
      .parquet(s"$smallDir/documents.parquet")
    replicatedText(spark, reps).write.mode("overwrite")
      .parquet(s"$bigDir/documents.parquet")
    val d01 = BenchTiming.steady(spark, "d01_scan_count", "/root/testdata/sf0.1")
    println(f"d01 sentinel: $d01%.3f s")
    def run(tag: String, dir: String, n: Long): Unit = {
      // stage 0 — PERCEPTUAL dedup applies (pipeline v3: the cheap
      // signature passes run before anything embedding-priced; band
      // width schedules from each plane's collapsed rep count — the
      // composed form of the imagedup receipt's scheduled-vs-fixed claim)
      val docs = Tables.load(spark, dir, "documents")
      val tI0 = System.nanoTime()
      Multimodal.imageDedupApplyAuto(spark,
          Multimodal.encodePpm(spark, docs).toDF())
        .write.mode("overwrite").parquet(s"$dir/img_kept.parquet")
      val tImg = (System.nanoTime() - tI0) / 1e9
      val tA0 = System.nanoTime()
      Multimodal.audioDedupApplyAuto(spark,
          Multimodal.encodeWav(spark, docs).toDF())
        .write.mode("overwrite").parquet(s"$dir/aud_kept.parquet")
      val tAud = (System.nanoTime() - tA0) / 1e9
      val tV0 = System.nanoTime()
      Multimodal.videoDedupApplyAuto(spark,
          Multimodal.encodeVideo(spark, docs).toDF())
        .write.mode("overwrite").parquet(s"$dir/vid_kept.parquet")
      val tVid = (System.nanoTime() - tV0) / 1e9
      val imgKept = spark.read.parquet(s"$dir/img_kept.parquet")
      val audKept = spark.read.parquet(s"$dir/aud_kept.parquet")
      val vidKept = spark.read.parquet(s"$dir/vid_kept.parquet")
      val bits = KnobSchedule.dhashBandBits(imgKept.count(), 2)
      // v5 — the l146 grouped-keys SWITCH exercised in composition
      // (round-18 directive #5). This corpus CANNOT cross the switch
      // threshold by rep count at any feasible R: the image plane is
      // deliberately dup-saturated, so collapsed reps saturate
      // sub-linearly (measured 1,883 at 1× → 3,975 at 20× — the
      // exact-hash collapse absorbs replication) and never approach
      // targetOcc·2¹⁶. The by-count crossing is receipted where it
      // genuinely happens — the frame-blind offset plane
      // (`offsetgrouped` leg 2: 10k rows banded → 100k rows grouped at
      // targetOcc = 1). HERE the grouped era is entered through the
      // schedule's own occupancy parameter (targetOcc = 0 — threshold
      // 0 reps, the LlmPipelineSpec v5 device), which is the same
      // branch the count crossing takes; what this leg proves is that
      // the era holds COMPOSED: the grouped apply's store feeds
      // curation and the downstream stages run green on it (including
      // ivfPq serving on the tiny survivor set — the narrow-codebook
      // stride path). Where the occupancy guard is DORMANT the store
      // is byte-identical across the switch (the LlmPipelineSpec v5
      // pin); on this corpus the fixed-8-bit guard is already lossy
      // at 1× (the imagedup receipt), so the grouped-era store keeps
      // FEWER docs — the extra drops are true near-dup pairs the
      // saturated bands missed, the rescue the switch exists for.
      // Both kept counts print so the delta is visible.
      val imgSig = Multimodal.dHash(spark,
          Multimodal.encodePpm(spark, docs).toDF()).toDF()
        .select(col("doc_id"), col("dhash")).localCheckpoint()
      val nImgReps = imgSig.select(col("dhash")).distinct().count()
      val switchOn = KnobSchedule.dhashUseGroupedKeys(nImgReps, 2,
        targetOcc = 0)
      val tG0 = System.nanoTime()
      Multimodal.sigDedupApply(imgSig, 2, 500, bandBits = None,
          targetOcc = 0)
        .write.mode("overwrite").parquet(s"$dir/img_kept_v5.parquet")
      val tImgV5 = (System.nanoTime() - tG0) / 1e9
      val v5Kept = spark.read.parquet(s"$dir/img_kept_v5.parquet")
      val nV5 = v5Kept.count()
      val nV3 = imgKept.count()
      val curated = v5Kept.select(col("doc_id").as("vec_id"))
        .join(audKept.select(col("doc_id").as("vec_id")), Seq("vec_id"),
          "left_semi")
        .join(vidKept.select(col("doc_id").as("vec_id")), Seq("vec_id"),
          "left_semi")
      val nCur = curated.count()
      // stage 1 — scheduled semantic dedup over the CURATED vectors,
      // wall measured end to end (fit, collapse, guard, pair verdict,
      // survivor materialization)
      val em = Tables.load(spark, dir, "embeddings")
        .join(curated, Seq("vec_id"), "left_semi").localCheckpoint()
      val t0 = System.nanoTime()
      val verdicts = Similarity.semDedupAuto(em, tau = 0.35, iters = 2)
      val keep = verdicts.filter(col("dropped") === 0).select("vec_id")
      em.join(keep, Seq("vec_id"), "left_semi")
        .write.mode("overwrite").parquet(s"$dir/survivors.parquet")
      val tDedup = (System.nanoTime() - t0) / 1e9
      val surv = spark.read.parquet(s"$dir/survivors.parquet")
      val nS = surv.count()
      // stage 2 — serving index at knobs scheduled from the SURVIVOR
      // count (the composition's honest cardinality), persisted
      val (kC, nProbe, shortM) = KnobSchedule.ivfPqKnobs(nS)
      val (cents, rcb, index) = Similarity.ivfPqFit(surv, nCells = kC,
        coarseIters = 2, pqIters = 2)
      val mdl = s"/tmp/graft_scale_pipe_model_${tag.replace(' ', '_')}"
      cents.write.mode("overwrite").parquet(s"$mdl/cents")
      rcb.write.mode("overwrite").parquet(s"$mdl/rcb")
      index.write.mode("overwrite").parquet(s"$mdl/index")
      // fixed query log: replica-0 ids that SURVIVED at every scale
      def qlog() = spark.read.parquet(s"$dir/survivors.parquet")
        .filter(col("vec_id") % 20 === 0 && col("vec_id") < 10000000L)
      val tServe = BenchTiming.steadyOf(spark, () =>
        Similarity.ivfPqServeTopK(qlog(),
          spark.read.parquet(s"$dir/survivors.parquet"),
          spark.read.parquet(s"$mdl/cents"),
          spark.read.parquet(s"$mdl/rcb"),
          spark.read.parquet(s"$mdl/index"),
          k = 3, nProbe = nProbe, shortM = shortM))
      println(f"$tag%-8s n=$n%7d curated=$nCur%7d survivors=$nS%7d | bandBits=$bits%2d imgWall=$tImg%7.3f s audWall=$tAud%7.3f s vidWall=$tVid%7.3f s | v5 reps=$nImgReps%7d groupedKeys=$switchOn%5s kept v3=$nV3%7d v5=$nV5%7d imgV5Wall=$tImgV5%7.3f s | knobs k=$kC%4d nProbe=$nProbe shortM=$shortM | dedupWall=$tDedup%8.3f s serve=$tServe%7.3f s")
    }
    // untimed JIT warm pass (the codec/CC/EM code paths are cold on the
    // first invocation — a timed cold 1x leg would read HIGHER than the
    // warm 10x leg and invert every ratio)
    run("warmup", smallDir, n1)
    run("1x", smallDir, n1)
    run(s"${reps}x", bigDir, n1 * reps)
    // v5-CROSS leg (round-19 directive #5): the grouped era entered BY
    // COUNT at the production threshold (targetOcc = 1 → 65,536 reps).
    // Text-derived image hashes saturate ~4k distinct on this corpus
    // (the honest reason the replicated legs above enter the era through
    // the occupancy knob), so the crossing corpus plants near-dup
    // LADDERS in signature space: 90k uniform base signatures (seeded
    // xxhash64 — deterministic), a Hamming-1 and a Hamming-2 rung on
    // every 16th base row, and a 2k exact viral pile. Every true pair
    // sits within radius 2 — inside BOTH families' lossless radii — and
    // at cap 500 both guard tables are dormant on ~101k uniform reps
    // (16-bit buckets at ~1.5 expected occupancy, grouped buckets ~2⁵×
    // colder), so the two stores must be BYTE-IDENTICAL across the
    // switch; the leg measures that instead of assuming it, and prints
    // the calibrated cap the directive-#1 closure picks on this corpus.
    val crossDir = "/tmp/graft_scale_pipe_cross"
    val nBase = 90000L
    val baseSig = spark.range(nBase).select(col("id").as("doc_id"),
      xxhash64(lit("cross"), col("id")).as("dhash"))
    val flip1 = "shiftleft(CAST(1 AS BIGINT), CAST(id % 63 AS INT))"
    val flip2 = "shiftleft(CAST(1 AS BIGINT), CAST((id * 7 + 13) % 63 AS INT))"
    val rung1 = spark.range(0, nBase, 16).select(
      (col("id") + 10000000L).as("doc_id"),
      expr(s"xxhash64('cross', id) ^ $flip1").as("dhash"))
    val rung2 = spark.range(0, nBase, 16).select(
      (col("id") + 20000000L).as("doc_id"),
      expr(s"xxhash64('cross', id) ^ $flip1 ^ $flip2").as("dhash"))
    val pile = spark.range(2000).select(
      (col("id") + 30000000L).as("doc_id"),
      xxhash64(lit("cross"), lit(0L)).as("dhash"))
    baseSig.unionByName(rung1).unionByName(rung2).unionByName(pile)
      .write.mode("overwrite").parquet(s"$crossDir/sig")
    val crossSig = spark.read.parquet(s"$crossDir/sig")
    val nCrossReps = crossSig.select(col("dhash")).distinct().count()
    val crossOn = KnobSchedule.dhashUseGroupedKeys(nCrossReps, 2,
      targetOcc = 1)
    // the BELOW contrast: the 1× text corpus's collapsed rep count
    // sits far under the same threshold
    val n1Reps = Multimodal.dHash(spark, Multimodal.encodePpm(spark,
        Tables.load(spark, smallDir, "documents")).toDF()).toDF()
      .select(col("dhash")).distinct().count()
    val belowOn = KnobSchedule.dhashUseGroupedKeys(n1Reps, 2,
      targetOcc = 1)
    val tCg0 = System.nanoTime()
    Multimodal.sigDedupApply(crossSig, 2, 500, bandBits = None,
        targetOcc = 1)
      .write.mode("overwrite").parquet(s"$crossDir/kept_grouped")
    val tCg = (System.nanoTime() - tCg0) / 1e9
    val tCb0 = System.nanoTime()
    Multimodal.sigDedupApply(crossSig, 2, 500, bandBits = Some(16))
      .write.mode("overwrite").parquet(s"$crossDir/kept_banded16")
    val tCb = (System.nanoTime() - tCb0) / 1e9
    val kg = spark.read.parquet(s"$crossDir/kept_grouped")
    val kb = spark.read.parquet(s"$crossDir/kept_banded16")
    val nDiff = kg.except(kb).count() + kb.except(kg).count()
    // dormancy evidence: hot buckets at cap 500 in both key families
    // over the collapsed reps (what each pair pass actually guards)
    val crossReps = crossSig.select(col("dhash")).distinct()
      .withColumn("doc_id", lit(0L))
    val bHotN = crossReps.select(posexplode(array((0 until 4).map(bi =>
        shiftright(col("dhash"), 16 * bi).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("band_idx", "band_val")))
      .groupBy(col("band_idx"), col("band_val"))
      .agg(count(lit(1)).as("occ")).filter(col("occ") > 500).count()
    val gHotN = Multimodal.sigGroupKeyed(crossReps)
      .groupBy(col("table_id"), col("tkey"))
      .agg(count(lit(1)).as("occ")).filter(col("occ") > 500).count()
    // calibrate on the exact-collapsed reps — the production apply's
    // cap input (sigDedupApply collapses the pile to one guard-immune
    // rep BEFORE pairing, so the cap is priced on what the pair pass
    // actually guards; on the raw sigs the pile's own 2,001-deep
    // buckets are hot at every finite cap and the closure would
    // honestly return the sentinel)
    val crossRepSig = crossSig.groupBy(col("dhash"))
      .agg(min(col("doc_id")).as("doc_id"))
    val calCap = Multimodal.sigGuardCapCalibrated(crossRepSig,
      maxHamming = 2, targetRecall = 0.95,
      caps = Seq(48, 100, 200, 500, 1000, 1 << 30), targetOcc = 1L)
    println(f"cross    reps=$nCrossReps%7d groupedByCount=$crossOn%5s " +
      f"(1x text reps=$n1Reps%7d grouped=$belowOn%5s) | kept grouped=" +
      f"${kg.count()}%7d (wall=$tCg%7.3f s) banded16=${kb.count()}%7d " +
      f"(wall=$tCb%7.3f s) storeDiff=$nDiff%d | hot@500 banded16=$bHotN%d " +
      f"grouped=$gHotN%d | sigGuardCapCalibrated(0.95)=$calCap%d")
  }

  /** IVF-PQ serving scale-up (`runMain graft.DevScale R ivfpq`) — the
    * l119 100 TB claim measured: with coarse cells SCHEDULED
    * (KnobSchedule.ivfCells = √n), a FIXED query log served against a
    * growing catalog pays probe-scan work |Q|·nProbe·(n/k) ≈ |Q|·nProbe·√n
    * — √R growth at R× corpus — while brute-force truth pays |Q|·n (R×),
    * and the scanned rows carry 8 information bytes of codes, not 256 B
    * of floats. Model trains once per scale and persists to parquet (the
    * serving boundary; also keeps BenchTiming's cleanup from killing
    * checkpoint blocks). Prints per scale: k, serve wall-clock,
    * ADC-candidate rows (the probe-scan volume), and the brute-force
    * control. */
  private def ivfPqExperiment(spark: org.apache.spark.sql.SparkSession,
                              reps: Int): Unit = {
    import graft.llm.{KnobSchedule, Similarity}
    val n1 = Tables.load(spark, "/root/testdata/sf0.1", "embeddings").count()
    val smallDir = "/tmp/graft_scale_ivfpq_small"
    val bigDir = "/tmp/graft_scale_ivfpq_big"
    replicatedEmbeddings(spark, 1).write.mode("overwrite")
      .parquet(s"$smallDir/embeddings.parquet")
    replicatedEmbeddings(spark, reps).write.mode("overwrite")
      .parquet(s"$bigDir/embeddings.parquet")
    val d01 = BenchTiming.steady(spark, "d01_scan_count", "/root/testdata/sf0.1")
    println(f"d01 sentinel: $d01%.3f s")
    def run(tag: String, dir: String, n: Long): Unit = {
      val em = Tables.load(spark, dir, "embeddings")
      val k = KnobSchedule.ivfCells(n)
      val (cents, rcb, index) =
        Similarity.ivfPqFit(em, nCells = k, coarseIters = 2, pqIters = 2)
      val mdl = s"/tmp/graft_scale_ivfpq_model_${tag.replace(' ', '_')}"
      cents.write.mode("overwrite").parquet(s"$mdl/cents")
      rcb.write.mode("overwrite").parquet(s"$mdl/rcb")
      index.write.mode("overwrite").parquet(s"$mdl/index")
      def qlog(e: DataFrame) = e.filter(
        col("vec_id") % 20 === 0 && col("vec_id") < 10000000L)
      def serve() = Similarity.ivfPqServeTopK(
        qlog(Tables.load(spark, dir, "embeddings")),
        Tables.load(spark, dir, "embeddings"),
        spark.read.parquet(s"$mdl/cents"),
        spark.read.parquet(s"$mdl/rcb"),
        spark.read.parquet(s"$mdl/index"),
        k = 3, nProbe = 4, shortM = 20)
      val tServe = BenchTiming.steadyOf(spark, () => serve())
      val tBrute = BenchTiming.steadyOf(spark, () =>
        Similarity.bruteForceTopK(qlog(em), em, k = 3))
      // probe-scan volume: ADC candidate rows = Σ_q Σ_probed-cells occ
      val wP = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid"))
        .orderBy(Similarity.cosine(col("qe"), col("cent")).desc,
          col("cent_id"))
      val probes = qlog(em)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        .crossJoin(broadcast(spark.read.parquet(s"$mdl/cents")))
        .withColumn("rn", row_number().over(wP))
        .filter(col("rn") <= 4)
        .select(col("qid"), col("cent_id").as("cell"))
      val cand = probes.join(
        spark.read.parquet(s"$mdl/index").select(col("cell")), Seq("cell"))
        .count()
      println(f"$tag%-16s n=$n%7d k=$k%4d | serve=$tServe%7.3f s candRows=$cand%9d | brute=$tBrute%7.3f s")
    }
    run("1x", smallDir, n1)
    run(s"${reps}x", bigDir, n1 * reps)
  }

  /** COVERAGE/DIVERSITY scale-up (`runMain graft.DevScale R coverage`) —
    * the l84/l85 claims measured: both are single-pass codegen projections
    * plus a ≤2^planes-cell aggregation, so wall-clock should grow ~R×
    * (scan-bound, no superlinear term), and the DIVERSITY SAMPLE'S OUTPUT
    * IS BOUNDED — ≤ 256·cap kept rows no matter how large the corpus —
    * which is the de-clustering operator's whole point: at R× density the
    * keep set stays fixed-size while the drop set absorbs the growth.
    * Printed kept counts verify the bound at each scale. */
  private def coverageExperiment(spark: org.apache.spark.sql.SparkSession,
                                 reps: Int): Unit = {
    import graft.llm.Similarity
    val smallDir = "/tmp/graft_scale_cov_small"
    val bigDir = "/tmp/graft_scale_cov_big"
    replicatedEmbeddings(spark, 1)
      .write.mode("overwrite").parquet(s"$smallDir/embeddings.parquet")
    replicatedEmbeddings(spark, reps)
      .write.mode("overwrite").parquet(s"$bigDir/embeddings.parquet")
    val d01 = BenchTiming.steady(spark, "d01_scan_count", "/root/testdata/sf0.1")
    println(f"d01 sentinel: $d01%.3f s")
    def em(dir: String) = Tables.load(spark, dir, "embeddings")
    for ((tag, dir) <- Seq(("1x", smallDir), (s"${reps}x", bigDir))) {
      val t84 = BenchTiming.steadyOf(spark,
        () => Similarity.embeddingCoverage(em(dir)))
      val t85 = BenchTiming.steadyOf(spark,
        () => Similarity.diversitySample(em(dir), cap = 4))
      val kept = Similarity.diversitySample(em(dir), cap = 4).count()
      val cells = Similarity.embeddingCoverage(em(dir)).count()
      println(f"$tag%-6s l84=$t84%7.3f s  l85=$t85%7.3f s  " +
        f"cellsOccupied=$cells%4d  kept=$kept%6d (bound=${cells * 4})")
    }
  }

  /** SWEEP shared-pass receipts (`runMain graft.DevScale R sweepshare`) —
    * the l87/l88 claims measured: a sweep that SHARES its config-
    * independent work must beat running the per-config operators
    * separately, and the gap should grow with corpus size (the shared
    * term is the corpus-sized one). Legs:
    *  - l88 vs 4 × decontaminate: the sweep tokenizes the corpus ONCE
    *    for all four n's; the separate runs re-tokenize per n.
    *  - l87 vs truth + 3 × annTopKIvf: the sweep runs one assignment
    *    pass and one cosine pass for all three probe configs; the
    *    separate runs re-assign and re-score per config (truth timed
    *    once for both arms — it is common to any audit). */
  private def sweepShareExperiment(spark: org.apache.spark.sql.SparkSession,
                                   reps: Int): Unit = {
    import graft.llm.{Dedup, Similarity, TextOps}
    val textDir = "/tmp/graft_scale_sweep_text"
    val embDir = "/tmp/graft_scale_sweep_emb"
    replicatedText(spark, reps)
      .write.mode("overwrite").parquet(s"$textDir/documents.parquet")
    replicatedEmbeddings(spark, reps)
      .write.mode("overwrite").parquet(s"$embDir/embeddings.parquet")
    val d01 = BenchTiming.steady(spark, "d01_scan_count", "/root/testdata/sf0.1")
    println(f"d01 sentinel: $d01%.3f s")
    val docs = Tables.load(spark, textDir, "documents")
    val ns = Seq(2, 3, 5, 8)
    val tSweep88 = BenchTiming.steadyOf(spark,
      () => Dedup.deconNgramSweep(docs, ns))
    val tSep88 = ns.map(n => BenchTiming.steadyOf(spark,
      () => Dedup.decontaminate(docs, n))).sum
    println(f"${reps}x l88 sweep=$tSweep88%7.3f s  4 separate=$tSep88%7.3f s  " +
      f"speedup=${tSep88 / tSweep88}%5.2f")
    val em = Tables.load(spark, embDir, "embeddings")
    val probes = Seq(1, 2, 4)
    val tSweep87 = BenchTiming.steadyOf(spark,
      () => Similarity.ivfProbeSweep(em, k = 3, nCells = 16, probes))
    val tTruth = BenchTiming.steadyOf(spark, () => Similarity.bruteForceTopK(
      em.filter(TextOps.splitBucket(col("vec_id")) < 20), em, 3))
    val tIvfEach = probes.map(p => BenchTiming.steadyOf(spark,
      () => Similarity.annTopKIvf(
        em.filter(TextOps.splitBucket(col("vec_id")) < 20), em,
        k = 3, nCells = 16, nProbe = p)))
    val tSep87 = tTruth + tIvfEach.sum
    println(f"${reps}x l87 sweep=$tSweep87%7.3f s  " +
      f"truth+3 separate=$tSep87%7.3f s  speedup=${tSep87 / tSweep87}%5.2f  " +
      f"[truth=$tTruth%7.3f s  ivf=${tIvfEach.map(t => f"$t%.2f").mkString("/")} s  " +
      f"sweep-minus-truth=${tSweep87 - tTruth}%7.3f s  ivf-sum=${tIvfEach.sum}%7.3f s]")
  }

  /** PACKED-RERANK scale-up (`runMain graft.DevScale R packed`) — the l48b
    * claim measured at scale (round-12 directive #5): the byte-packed
    * coarse pass reads 1 B/code vs array<long>'s 8 B + offsets, so its
    * advantage should GROW with corpus size — the |Q|×N coarse scan is the
    * term that scales, the m-row exact rerank is not. Both variants run on
    * the SAME replica-isolated parquet at 1× and R× (queries grow with the
    * corpus too — vec_id % 20 — so the coarse pass scales in both factors,
    * exactly like a production store whose query log grows with its
    * catalog). Printed speedup = unpacked/packed wall-clock at each scale;
    * the 100 TB story holds if speedup(R×) ≥ speedup(1×). */
  /** PQ-ANN scale-up (`runMain graft.DevScale R pq`) — the l95 claims
    * measured: serve a FIXED query log (the base replica's vec_id % 20
    * set — `queryMax` pins it, so |Q| does NOT grow with the catalog)
    * against a catalog growing R×. Legs per scale:
    *  - fit: the codebook build — m·N sub-vector rows, should grow ~R×
    *    (it is one corpus-bytes pass per Lloyd round, never m loops);
    *  - pq-serve: full l95 (fit + encode + ADC coarse + exact rerank);
    *  - exact: bruteForceTopK on the same queries — the float-bandwidth
    *    alternative PQ's 8-byte codes replace; the pq-serve advantage
    *    should GROW with R (both scans are |Q|·N, but PQ's touches codes
    *    while exact touches full float vectors);
    *  - top-1 agreement vs exact at each scale: codebook capacity is
    *    FIXED (m=16, ks=16) while the catalog grows, so this prints the
    *    recall price of not growing ks — the knob-schedule conversation
    *    l87's probe sweep has for IVF. */
  private def pqExperiment(spark: org.apache.spark.sql.SparkSession,
                           reps: Int): Unit = {
    import graft.llm.Similarity
    val smallDir = "/tmp/graft_scale_pq_small"
    val bigDir = "/tmp/graft_scale_pq_big"
    replicatedEmbeddings(spark, 1)
      .write.mode("overwrite").parquet(s"$smallDir/embeddings.parquet")
    replicatedEmbeddings(spark, reps)
      .write.mode("overwrite").parquet(s"$bigDir/embeddings.parquet")
    val d01 = BenchTiming.steady(spark, "d01_scan_count", "/root/testdata/sf0.1")
    println(f"d01 sentinel: $d01%.3f s")
    val qMax = 10000000L // replica-0 ids only: fixed query set at every R
    def em(dir: String) = Tables.load(spark, dir, "embeddings")
    for ((tag, dir) <- Seq(("1x", smallDir), (s"${reps}x", bigDir))) {
      val v = em(dir)
      val q = v.filter(col("vec_id") % 20 === 0 && col("vec_id") < qMax)
      val tFit = BenchTiming.steadyOf(spark, () => Similarity.pqFit(v))
      val tServe = BenchTiming.steadyOf(spark,
        () => Similarity.pqRerankTopK(v, queryMax = qMax))
      val tExact = BenchTiming.steadyOf(spark,
        () => Similarity.bruteForceTopK(q, v, k = 3))
      val pq1 = Similarity.pqRerankTopK(v, k = 1, queryMax = qMax)
        .select(col("qid"), col("nid"))
      val ex1 = Similarity.bruteForceTopK(q, v, k = 1)
        .select(col("qid"), col("nid").as("want"))
      val nQ = ex1.count()
      val agree = pq1.join(ex1, "qid")
        .filter(col("nid") === col("want")).count()
      println(f"$tag%-6s fit=$tFit%7.3f s  pq-serve(l95)=$tServe%7.3f s  " +
        f"exact=$tExact%7.3f s  top1-agreement=$agree%4d/$nQ%-4d " +
        f"(${agree.toDouble / nQ}%4.2f)")
    }
  }

  private def packedExperiment(spark: org.apache.spark.sql.SparkSession,
                               reps: Int): Unit = {
    import graft.llm.Similarity
    val smallDir = "/tmp/graft_scale_packed_small"
    val bigDir = "/tmp/graft_scale_packed_big"
    replicatedEmbeddings(spark, 1)
      .write.mode("overwrite").parquet(s"$smallDir/embeddings.parquet")
    replicatedEmbeddings(spark, reps)
      .write.mode("overwrite").parquet(s"$bigDir/embeddings.parquet")
    val d01 = BenchTiming.steady(spark, "d01_scan_count", "/root/testdata/sf0.1")
    println(f"d01 sentinel: $d01%.3f s")
    def em(dir: String) = Tables.load(spark, dir, "embeddings")
    for ((tag, dir) <- Seq(("1x", smallDir), (s"${reps}x", bigDir))) {
      val tU = BenchTiming.steadyOf(spark,
        () => Similarity.int8RerankTopK(em(dir)))
      val tP = BenchTiming.steadyOf(spark,
        () => Similarity.int8RerankTopKPacked(em(dir)))
      // value-identity spot check at every scale: the packed plan must
      // return row-identical results, not just faster ones
      val diff = Similarity.int8RerankTopK(em(dir))
        .except(Similarity.int8RerankTopKPacked(em(dir))).count()
      println(f"$tag%-6s unpacked(l48)=$tU%7.3f s  packed(l48b)=$tP%7.3f s  " +
        f"speedup=${tU / tP}%5.2f  rowDiff=$diff")
    }
  }
}
