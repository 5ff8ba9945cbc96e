package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Distributed UNIGRAM-LM tokenizer training statistics (Kudo, ACL'18 —
  * the SentencePiece unigram model): the l56/l105 BPE family's missing
  * sibling, and the tokenizer most modern pipelines actually ship.
  *
  * Scale design is the Bpe discipline verbatim: statistics live on the
  * VOCABULARY, not the corpus. The corpus is read once into
  * (distinct word, freq) — the only corpus-sized shuffle — and
  * everything after (the candidate-piece table, the per-word
  * forward–backward E-step, the Viterbi fertility) is vocab-table work:
  * at 100 TB of text with a bounded word-form vocabulary, EM rounds cost
  * the same as at 1 GB.
  *
  * Cross-engine determinism (the l101/l117 rational dialect):
  *  - piece probabilities are ONE exact-rounded double division of two
  *    BIGINTs (seed_freq / T);
  *  - the forward (α) and backward (β) lattice passes are SEQUENTIAL
  *    folds in a pinned span order (position ascending, span start
  *    ascending — same values, same operation order ⇒ bit-identical
  *    doubles in Spark's `aggregate` and the oracle's unrolled-CTE
  *    chain);
  *  - per-SPAN posteriors are snapped to ⌊10⁹·e⌋ BIGINTs before any
  *    cross-word aggregation (the DSIR λ-snap rule), so the corpus-wide
  *    expected counts are exact integer sums — aggregation-order free.
  */
object UnigramLm {

  /** The candidate-piece SEED table (piece, seed_freq): every substring
    * of length 1..maxLen of every corpus word, corpus-weighted
    * (overlapping occurrences each count — the suffix-array seed
    * statistic of the paper §3), cut to the top `vocabSize` by
    * (freq desc, piece asc) UNION every single character (segmentation
    * coverage: the lattice must always reach every position). */
  def seedVocab(docs: DataFrame, vocabSize: Int = 40,
                maxLen: Int = 4): DataFrame =
    seedVocabFromWords(words(docs), vocabSize, maxLen)

  /** seedVocab over a maintained (word, freq) table — the S40 surface.
    * Top-V selection is TakeOrdered (orderBy+limit → per-partition
    * partial top-V merged on the driver — the l59 discipline), never a
    * global row_number window: the candidate table is vocab-domain
    * sized, but a single-task corpus-wide sort is still the one
    * straggler shape this repo bans. The single-char union preserves
    * segmentation coverage; both legs project identical (piece,
    * seed_freq) rows from the same aggregate, so the distinct is an
    * exact-duplicate drop, not a semantic choice. */
  def seedVocabFromWords(wordFreq: DataFrame, vocabSize: Int = 40,
                         maxLen: Int = 4): DataFrame = {
    val occ = wordSpans(wordFreq, maxLen)
      .groupBy(col("piece")).agg(sum(col("freq")).as("seed_freq"))
    val topV = occ.orderBy(col("seed_freq").desc, col("piece"))
      .limit(vocabSize)
    val singles = occ.filter(length(col("piece")) === 1)
    topV.unionByName(singles).distinct()
      .select(col("piece"), col("seed_freq"))
  }

  /** The distinct-word working set (word, freq) — the one corpus-sized
    * shuffle (Bpe.wordSymbols without the split), and the CARRIED STATE
    * of the streaming trainer (S40): plain counts fold associatively
    * and commutatively, so a maintained word table equals the drained
    * corpus's for any batch split. */
  def words(docs: DataFrame): DataFrame =
    docs.select(explode(TextOps.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Associative MERGE of two (word, freq) count tables — the S40 fold:
    * per-word addition, vocab-table work (no document re-tokenized).
    * NOT idempotent under re-delivery — the S22 exactly-once
    * foreachBatch discipline applies. */
  def mergeWordCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("word")).agg(sum(col("freq")).as("freq"))

  /** All (j, k, piece) substring spans of each word, 0-based start j,
    * length k ≤ maxLen — the lattice edge candidates. Emitted in-row
    * (flatten of nested transforms); rows = Σ len·maxLen per DISTINCT
    * word — vocab-table sized. */
  private def wordSpans(w: DataFrame, maxLen: Int): DataFrame =
    w.select(col("word"), col("freq"),
      explode(flatten(transform(
        sequence(lit(0), length(col("word")) - 1), j =>
          transform(sequence(lit(1),
            least(lit(maxLen), length(col("word")) - j)), k =>
            struct(j.cast(IntegerType).as("j"), k.cast(IntegerType).as("k"),
              col("word").substr(j + 1, k).as("piece")))))).as("sp"))
      .select(col("word"), col("freq"), col("sp.j").as("j"),
        col("sp.k").as("k"), col("sp.piece").as("piece"))

  /** Per-word lattice table: (word, freq, n, sps) where sps is the array
    * of vocab-matched spans struct(end, j, p, piece) sorted by
    * (end, j) — the PINNED fold order of every pass below. p is the
    * piece's unigram probability seed_freq/T (T = total seed mass). */
  private def lattice(wordFreq: DataFrame, vocabSize: Int,
                      maxLen: Int): DataFrame =
    latticeFromModel(wordFreq,
      seedVocabFromWords(wordFreq, vocabSize, maxLen)
        .select(col("piece"), col("seed_freq").as("cnt"))
        .localCheckpoint(),
      maxLen)

  /** The lattice under an explicit MODEL count table (piece, cnt BIGINT)
    * — the trainer's per-round E-step surface. Piece probabilities are
    * ONE exact-rounded double division cnt/T (T = Σ cnt — the round-1
    * seed_freq/t_mass expression verbatim, so the seed path is
    * byte-identical), and the model always broadcasts: it is
    * vocab-table sized by construction, so EM rounds never re-shuffle
    * the corpus — the one corpus-sized exchange is the (word, freq)
    * fold the caller already paid. */
  private def latticeFromModel(wordFreq: DataFrame, model: DataFrame,
                               maxLen: Int): DataFrame = {
    val t = model.agg(sum(col("cnt")).as("t_mass"))
    val matched = wordSpans(wordFreq, maxLen)
      .join(broadcast(model), Seq("piece"))
      .crossJoin(broadcast(t))
      .select(col("word"), col("freq"), col("j"), col("k"), col("piece"),
        (col("cnt").cast(DoubleType) / col("t_mass").cast(DoubleType))
          .as("p"))
    matched.groupBy(col("word"), col("freq"))
      .agg(sort_array(collect_list(struct(
        (col("j") + col("k")).as("end"), col("j"), col("p"),
        col("piece")))).as("sps"))
      .withColumn("n", length(col("word")).cast(IntegerType))
  }

  /** Forward lattice pass: α(0..n) as an in-row array — α(0) = 1,
    * α(i) = Σ_{spans (j→i), j asc} α(j)·p. Left fold in the pinned
    * span order. */
  private def alphaArr(sps: Column, n: Column): Column =
    aggregate(sequence(lit(1), n), array(lit(1.0)),
      (acc, i) => concat(acc, array(
        aggregate(filter(sps, sp => sp.getField("end") === i),
          lit(0.0), (a2, sp) =>
            a2 + element_at(acc, sp.getField("j") + 1) * sp.getField("p")))))

  /** Backward lattice pass, stored by DISTANCE from the word end:
    * β(d=0) = 1, β at distance d (i.e. position i = n−d) =
    * Σ_{spans (i→end), end asc} p·β(n−end). */
  private def betaArr(sps: Column, n: Column): Column =
    aggregate(sequence(lit(1), n), array(lit(1.0)),
      (acc, d) => concat(acc, array(
        aggregate(filter(sps, sp => sp.getField("j") === n - d),
          lit(0.0), (a2, sp) =>
            a2 + sp.getField("p")
              * element_at(acc, n - sp.getField("end") + 1)))))

  /** Per-SPAN posterior table — the E-step's atoms: for every matched
    * span of every distinct word, e = α(j)·p·β(end)/α(n) (the
    * probability the unigram model segments the word THROUGH this
    * span), plus its ⌊10⁹·e⌋ snap and the corpus weight. Public for
    * the conservation receipts in LlmSpec (per word, the first-piece
    * posteriors sum to 1). */
  def spanPosteriors(docs: DataFrame, vocabSize: Int = 40,
                     maxLen: Int = 4): DataFrame =
    spanPosteriorsFromWords(words(docs).localCheckpoint(), vocabSize, maxLen)

  /** spanPosteriors over a maintained (word, freq) table — the S40
    * surface (and the shared one-corpus-pass path of emRound1). */
  def spanPosteriorsFromWords(wordFreq: DataFrame, vocabSize: Int = 40,
                              maxLen: Int = 4): DataFrame =
    posteriorsOf(lattice(wordFreq, vocabSize, maxLen))

  /** The snapped per-span posteriors of a built lattice (shared by the
    * seed-model round-1 path and the trainer's model-round E-steps). */
  private def posteriorsOf(lat0: DataFrame): DataFrame = {
    val lat = lat0
      .withColumn("alpha", alphaArr(col("sps"), col("n")))
      .withColumn("beta", betaArr(col("sps"), col("n")))
    lat.select(col("word"), col("freq"), col("n"), col("alpha"),
        col("beta"), explode(col("sps")).as("sp"))
      .select(col("word"), col("freq"), col("sp.piece").as("piece"),
        col("sp.j").as("j"), col("sp.end").as("end"),
        (element_at(col("alpha"), col("sp.j") + 1) * col("sp.p")
          * element_at(col("beta"), col("n") - col("sp.end") + 1)
          / element_at(col("alpha"), col("n") + 1)).as("e"))
      .withColumn("e_snap", floor(lit(1e9) * col("e")).cast(LongType))
  }

  /** One E-step under an explicit model: per model piece, the snapped
    * corpus-weighted expected count (pieces the posteriors never touch
    * keep a 0 — they still rank, and prune, in the same round). */
  private def emCounts(wordFreq: DataFrame, model: DataFrame,
                       maxLen: Int): DataFrame = {
    val em = posteriorsOf(latticeFromModel(wordFreq, model, maxLen))
      .groupBy(col("piece"))
      .agg(sum(col("e_snap") * col("freq")).as("em_count"))
    model.select(col("piece")).join(em, Seq("piece"), "left")
      .select(col("piece"),
        coalesce(col("em_count"), lit(0L)).as("em_count"))
  }

  /** L123 — unigram-LM ROUND-1 EM statistics: per seed piece, its seed
    * frequency and the corpus-weighted round-1 expected count
    * Σ_words freq·Σ_spans ⌊10⁹·posterior⌋ — exactly what the M-step
    * renormalizes and the prune step ranks. The declared, oracle-
    * replayable form of the trainer's first iteration (the l56
    * precedent: round-1 statistics ARE the training primitive). */
  def emRound1(docs: DataFrame, vocabSize: Int = 40,
               maxLen: Int = 4): DataFrame =
    emRound1FromWords(words(docs).localCheckpoint(), vocabSize, maxLen)

  /** emRound1 over a maintained (word, freq) table — the S40 refresh
    * surface (the bm25FromCore/S31 discipline: the carried state is the
    * df-free count table; the trained artifact derives once per swap,
    * never per batch). Also the shared-pass form behind `emRound1`: the
    * corpus tokenizes ONCE into the checkpointed word table that feeds
    * both the seed and the lattice. */
  def emRound1FromWords(wordFreq: DataFrame, vocabSize: Int = 40,
                        maxLen: Int = 4): DataFrame = {
    val em = spanPosteriorsFromWords(wordFreq, vocabSize, maxLen)
      .groupBy(col("piece"))
      .agg(sum(col("e_snap") * col("freq")).as("em_count"))
    seedVocabFromWords(wordFreq, vocabSize, maxLen)
      .join(em, Seq("piece"), "left")
      .select(col("piece"), col("seed_freq"),
        coalesce(col("em_count"), lit(0L)).as("em_count"))
  }

  // ------------------------------------------------------- trainer loop

  /** Per-piece ALTERNATIVE segmentation score (the prune statistic's
    * denominator, Kudo §3.2 / the SentencePiece trainer's
    * alternative-path loss): for every multi-character model piece, the
    * Viterbi-best segmentation score of the piece ITSELF using the
    * OTHER model pieces — every matched span except the full-width one.
    * Pure vocab-table work: each lattice is over a ≤ maxLen-character
    * string. Always positive, because single-character pieces never
    * leave the model and carry the M-step's count-1 coverage floor.
    * Fold order is the pinned Viterbi rule (position ascending, start
    * ascending, strictly-greater replaces), so the score replays
    * bit-identically in the oracle's unrolled chain. */
  private def altScores(model: DataFrame, maxLen: Int): DataFrame = {
    val t = model.agg(sum(col("cnt")).as("t_mass"))
    val multi = model.filter(length(col("piece")) > 1)
      .select(col("piece").as("word"), lit(1L).as("freq"))
    val sps = wordSpans(multi, maxLen)
      .filter(col("k") < length(col("word")))
      .join(broadcast(model), Seq("piece"))
      .crossJoin(broadcast(t))
      .select(col("word"), col("j"), col("k"),
        (col("cnt").cast(DoubleType) / col("t_mass").cast(DoubleType))
          .as("p"))
      .groupBy(col("word"))
      .agg(sort_array(collect_list(struct(
        (col("j") + col("k")).as("end"), col("j"), col("p")))).as("sps"))
      .withColumn("n", length(col("word")).cast(IntegerType))
    val vit = aggregate(sequence(lit(1), col("n")), array(lit(1.0)),
      (acc, i) => concat(acc, array(
        aggregate(filter(col("sps"), sp => sp.getField("end") === i),
          lit(-1.0), (best, sp) => {
            val cs = element_at(acc, sp.getField("j") + 1) * sp.getField("p")
            when(cs > best, cs).otherwise(best)
          }))))
    sps.withColumn("v", vit)
      .select(col("word").as("piece"),
        element_at(col("v"), col("n") + 1).as("alt"))
  }

  /** ONE trainer round: E-step under the current model, M-step
    * re-count (single-character pieces keep a count-1 coverage floor —
    * the lattice must always reach every position), then the Kudo §3.2
    * PRUNE: per multi-character piece, loss = em_count · (p / alt) —
    * the piece's expected usage weighted by how much better the piece
    * explains itself than its best alternative segmentation. The
    * paper's log-difference weight log(p) − log(alt) is replaced by
    * the odds RATIO p/alt: ln is the one operation the cross-engine
    * rational dialect bans (neither JVM Math.log nor DuckDB ln is
    * exactly rounded), while the ratio is a single exactly-rounded
    * division of two bit-identical doubles — same "useless pieces
    * first" intent, replayable to the bit. Keep the top
    * ⌈shrinkNum·nMulti/shrinkDen⌉ multi pieces by (loss desc, piece
    * asc) — TakeOrdered, never a global window — plus every single
    * character. The one driver-side read is the vocab-table count that
    * sizes the keep (the Bpe.train loop-control class). */
  private def trainRound(wordFreq: DataFrame, model: DataFrame,
                         maxLen: Int, shrinkNum: Int, shrinkDen: Int,
                         emIters: Int = 1): DataFrame = {
    // emIters > 1 = the SentencePiece trainer's sub-iteration count
    // (Kudo runs 2 E+M passes per prune round): each sub-iteration
    // re-estimates counts under the PREVIOUS sub-iteration's
    // renormalized model — same piece set, sharper posteriors. The
    // declared l129 pins emIters = 1 (one lattice instance per round in
    // the unrolled oracle); more sub-iterations are the same machinery
    // and stay replayable, just a longer chain.
    require(emIters >= 1, s"emIters: $emIters")
    var mstep = model
    for (_ <- 1 to emIters)
      mstep = emCounts(wordFreq, mstep, maxLen)
        .select(col("piece"),
          when(length(col("piece")) === 1, greatest(col("em_count"), lit(1L)))
            .otherwise(col("em_count")).as("cnt"))
        .localCheckpoint()
    val t = mstep.agg(sum(col("cnt")).as("t_mass"))
    val loss = mstep.filter(length(col("piece")) > 1)
      .crossJoin(broadcast(t))
      .join(altScores(mstep, maxLen), Seq("piece"))
      .select(col("piece"), col("cnt"),
        (col("cnt").cast(DoubleType) *
          ((col("cnt").cast(DoubleType) / col("t_mass").cast(DoubleType))
            / col("alt"))).as("loss"))
      .localCheckpoint()
    val nMulti = loss.count()
    val keepM = (shrinkNum.toLong * nMulti + shrinkDen - 1) / shrinkDen
    val kept = loss.orderBy(col("loss").desc, col("piece"))
      .limit(keepM.toInt)
      .select(col("piece"), col("cnt"))
    kept.unionByName(mstep.filter(length(col("piece")) === 1))
      .localCheckpoint()
  }

  /** The unigram-LM TRAINER, fixed-round form (the declared l129
    * surface — a static round count unrolls in the oracle; the
    * to-target loop below is the production wrapper): seed vocabulary
    * → `rounds` × (E-step, M-step renormalize, loss-ranked prune at
    * shrinkNum/shrinkDen). Returns the final model (piece, em_count,
    * prob) — prob renormalized over the SURVIVING mass, the
    * distribution S40's derive-at-swap serves and Viterbi segmentation
    * consumes. Vocab-resident throughout (the Bpe.train discipline):
    * the corpus is paid once in `words`; every round is vocab-table
    * work over the broadcast model. */
  def trainRounds(docs: DataFrame, seedSize: Int = 40, maxLen: Int = 4,
                  rounds: Int = 2, shrinkNum: Int = 3,
                  shrinkDen: Int = 4): DataFrame =
    trainRoundsFromWords(words(docs).localCheckpoint(), seedSize, maxLen,
      rounds, shrinkNum, shrinkDen)

  /** trainRounds over a maintained (word, freq) table — the S40
    * surface: the carried streaming state is the word-count table, and
    * the trained model derives at swap time, never per batch. */
  def trainRoundsFromWords(wordFreq: DataFrame, seedSize: Int = 40,
                           maxLen: Int = 4, rounds: Int = 2,
                           shrinkNum: Int = 3, shrinkDen: Int = 4,
                           emIters: Int = 1): DataFrame = {
    var model = seedVocabFromWords(wordFreq, seedSize, maxLen)
      .select(col("piece"), col("seed_freq").as("cnt"))
      .localCheckpoint()
    for (_ <- 1 to rounds)
      model = trainRound(wordFreq, model, maxLen, shrinkNum, shrinkDen,
        emIters)
    finalizeModel(model)
  }

  /** The production TRAIN-TO-TARGET wrapper: prune rounds until the
    * vocabulary fits `targetVocab` (or stops shrinking / maxRounds — a
    * tiny multi set can make ⌈shrink·n⌉ = n). Each round's vocab-table
    * count is the allowed loop-control read; everything else is the
    * fixed-round machinery. */
  def train(docs: DataFrame, targetVocab: Int, seedSize: Int = 40,
            maxLen: Int = 4, shrinkNum: Int = 3, shrinkDen: Int = 4,
            maxRounds: Int = 10, emIters: Int = 1): DataFrame = {
    val wordFreq = words(docs).localCheckpoint()
    var model = seedVocabFromWords(wordFreq, seedSize, maxLen)
      .select(col("piece"), col("seed_freq").as("cnt"))
      .localCheckpoint()
    var n = model.count()
    var r = 0
    var shrinking = true
    while (n > targetVocab && r < maxRounds && shrinking) {
      model = trainRound(wordFreq, model, maxLen, shrinkNum, shrinkDen,
        emIters)
      val n2 = model.count()
      shrinking = n2 < n
      n = n2
      r += 1
    }
    finalizeModel(model)
  }

  /** (piece, cnt) → the served (piece, em_count, prob) table: one
    * exact-rounded division over the surviving mass. */
  private def finalizeModel(model: DataFrame): DataFrame = {
    val t = model.agg(sum(col("cnt")).as("t_mass"))
    model.crossJoin(broadcast(t))
      .select(col("piece"), col("cnt").as("em_count"),
        (col("cnt").cast(DoubleType) / col("t_mass").cast(DoubleType))
          .as("prob"))
  }

  /** Per-word Viterbi piece count under the seed model: the 1-best
    * segmentation's length, by the pinned argmax — fold spans ending at
    * each position in start-ascending order, a candidate replaces the
    * incumbent only on STRICTLY greater path score (ties keep the
    * earliest = longest-final-piece path). Scores are products of the
    * bit-identical p's in pinned order, so the comparison replays. */
  def viterbiPieceCounts(docs: DataFrame, vocabSize: Int = 40,
                         maxLen: Int = 4): DataFrame =
    viterbiOf(lattice(words(docs).localCheckpoint(), vocabSize, maxLen))

  /** Per-word Viterbi piece count under an explicit TRAINED model
    * (piece, em_count, …) — the l130 surface: the fertility a pipeline
    * measures after training is the trained model's, not the seed's. */
  def viterbiPieceCountsFromModel(wordFreq: DataFrame, model: DataFrame,
                                  maxLen: Int = 4): DataFrame =
    viterbiOf(latticeFromModel(wordFreq,
      model.select(col("piece"), col("em_count").as("cnt")), maxLen))

  private def viterbiOf(lat: DataFrame): DataFrame = {
    val vit = aggregate(sequence(lit(1), col("n")),
      array(struct(lit(1.0).as("s"), lit(0).cast(IntegerType).as("c"))),
      (acc, i) => concat(acc, array(
        aggregate(filter(col("sps"), sp => sp.getField("end") === i),
          struct(lit(-1.0).as("s"), lit(0).cast(IntegerType).as("c")),
          (best, sp) => {
            val prev = element_at(acc, sp.getField("j") + 1)
            val cs = prev.getField("s") * sp.getField("p")
            when(cs > best.getField("s"),
              struct(cs.as("s"),
                (prev.getField("c") + 1).cast(IntegerType).as("c")))
              .otherwise(best)
          }))))
    lat.withColumn("v", vit)
      .select(col("word"),
        element_at(col("v"), col("n") + 1).getField("c")
          .cast(LongType).as("n_pieces"))
  }

  /** L124 — tokenizer-family FERTILITY comparison: per language, the
    * corpus fertility (subword tokens per word) under the BPE published
    * merge list (l105's number, same legs) NEXT TO the unigram-LM
    * Viterbi segmentation — the table a pipeline reads when choosing
    * its tokenizer family (Kudo §5 reports exactly this comparison).
    * Corpus-side exchanges carry (doc_id, word) atoms (the Bpe.encode
    * vocabulary-residence shape); both per-word token counts come from
    * vocab-table work. */
  def tokenizerFertilityCompare(docs: DataFrame, vocabSize: Int = 40,
                                maxLen: Int = 4): DataFrame =
    fertilityCompareWith(docs, viterbiPieceCounts(docs, vocabSize, maxLen))

  /** L130 — the l124 fertility comparison RE-CHECKED against the
    * TRAINED model (trainRounds' final vocabulary), not the seed: the
    * prune rounds change the unigram segmentation (dropped pieces force
    * their words onto surviving alternatives), and the trained number
    * is the one a pipeline actually ships. BPE leg unchanged (same
    * frozen published merges — the comparison's control arm). */
  def tokenizerFertilityCompareTrained(docs: DataFrame, seedSize: Int = 40,
                                       maxLen: Int = 4, rounds: Int = 2,
                                       shrinkNum: Int = 3,
                                       shrinkDen: Int = 4): DataFrame = {
    val wordFreq = words(docs).localCheckpoint()
    val model = trainRoundsFromWords(wordFreq, seedSize, maxLen, rounds,
      shrinkNum, shrinkDen).localCheckpoint()
    fertilityCompareWith(docs,
      viterbiPieceCountsFromModel(wordFreq, model, maxLen))
  }

  /** The shared fertility table: frozen-BPE token counts next to a
    * caller-supplied per-word unigram (word, n_pieces) leg, folded to
    * per-language corpus fertility. */
  private def fertilityCompareWith(docs: DataFrame,
                                   uni: DataFrame): DataFrame = {
    val bpeSyms = Bpe.publishedMerges
      .foldLeft(Bpe.wordSymbols(docs).select(col("word"), col("syms"))) {
        case (v, (l, r)) => v.withColumn("syms", Bpe.mergePair(col("syms"), l, r))
      }
      .select(col("word"), size(col("syms")).cast(LongType).as("n_bpe"))
    val perWord = bpeSyms.join(uni, Seq("word"))
    docs.select(col("doc_id"), col("lang"),
        explode(TextOps.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .join(broadcast(perWord), Seq("word"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_bpe")).as("n_bpe_tokens"),
        sum(col("n_pieces")).as("n_unigram_tokens"))
      .select(col("lang"), col("n_words"), col("n_bpe_tokens"),
        col("n_unigram_tokens"),
        (col("n_bpe_tokens").cast(DoubleType)
          / col("n_words").cast(DoubleType)).as("bpe_fertility"),
        (col("n_unigram_tokens").cast(DoubleType)
          / col("n_words").cast(DoubleType)).as("unigram_fertility"))
  }
}
