package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training — the "train the tokenizer on the
  * corpus" step of an LLM data pipeline (Sennrich et al., ACL'16: merge
  * the most frequent adjacent symbol pair, repeat).
  *
  * Scale design: BPE statistics live on the VOCABULARY, not the corpus.
  * The corpus is read ONCE into (distinct word, frequency) — the only
  * corpus-sized shuffle in the whole trainer, and it carries word atoms
  * (bounded, ~tens of bytes), never documents. Every merge round then
  * works over the vocab table: pair counting is a projection + one
  * hash-agg whose key domain is the symbol-pair space, the argmax is a
  * 1-row action (loop control, the CC-loop discipline), and the merge
  * rewrite is a per-row array fold. At 100 TB of text with a ~10M-word
  * vocabulary, rounds cost vocab-table work — independent of corpus
  * size after the first aggregation.
  */
object Bpe {

  /** The BPE working set: (word, freq, syms) — distinct corpus words with
    * occurrence counts, split to character symbols. One corpus pass, one
    * shuffle (the word hash-agg; map-side partials reduce each partition
    * to its distinct words before the exchange). */
  def wordSymbols(docs: DataFrame): DataFrame =
    docs.select(explode(TextOps.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("syms", split(col("word"), ""))

  /** Corpus-weighted adjacent-pair counts over a (freq, syms) vocab — ONE
    * BPE statistics round. Pairs are positional (overlapping, one per
    * adjacent index), weighted by word frequency; the lambda emits
    * in-row, so the only shuffle is the final (l, r) hash-agg whose
    * cardinality is the pair space, not the corpus. */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("freq"), explode(filter(
        transform(col("syms"), (_, i) =>
          when(i <= size(col("syms")) - 2,
            struct(element_at(col("syms"), i + 1).as("l"),
              element_at(col("syms"), i + 2).as("r")))),
        x => x.isNotNull)).as("pr"))
      .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
      .agg(sum(col("freq")).as("pair_count"))

  /** Left-to-right non-overlapping merge of the pair (l, r) inside one
    * symbol array — the standard BPE apply rule ("aaa" under (a,a) →
    * [aa, a]): a fold that replaces a trailing `l` with `l+r` when the
    * next symbol is `r`, else appends. Pure per-row expression — the
    * merge rewrite shuffles nothing. */
  def mergePair(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0
          && element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** ENCODE a corpus with a trained merge list — the consume side of
    * `train`: every document's words become BPE symbol sequences, and the
    * per-doc output is (doc_id, n_bpe_tokens, n_words).
    *
    * Same vocabulary-residence trick as training: the merge fold runs
    * over the DISTINCT-WORD table, and the corpus then joins its words
    * against the symbolized vocab on the word atom. At scale the vocab
    * side is dictionary-sized — AQE broadcasts it; the corpus-side
    * exchange carries (doc_id, word) atoms, never documents.
    *
    * Expression-depth discipline: a realistic merge list is thousands of
    * rules, and folding them into ONE projection nests that many lambda
    * expressions — analysis recurses k-deep and codegen emits one
    * enormous method (planning blows up long before corpus size
    * matters). The fold therefore checkpoints the (tiny, vocab-sized)
    * table every `checkpointEvery` merges, the same depth-bounding
    * train() applies per round. */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
             checkpointEvery: Int = 64): DataFrame = {
    val vocabSyms = merges.grouped(checkpointEvery).foldLeft(
        wordSymbols(docs).select(col("word"), col("syms"))) {
      (v, group) =>
        group.foldLeft(v) { case (vv, (l, r)) =>
          vv.withColumn("syms", mergePair(col("syms"), l, r))
        }.localCheckpoint()
    }.select(col("word"), size(col("syms")).as("n_sym"))
    docs.select(col("doc_id"),
        explode(TextOps.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .join(vocabSyms, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_sym")).as("n_bpe_tokens"),
        count(lit(1)).as("n_words"))
  }

  /** A FROZEN reference merge list — the first 10 rules a train() run
    * produces on the reference corpus (count-desc, (l, r)-lex tie-break),
    * hard-coded because the fertility audit's semantics is "measure the
    * corpus under a PUBLISHED tokenizer", not "train then measure": the
    * audit must be a pure function of the corpus so the oracle can apply
    * the same fixed rules. Includes multi-symbol right-hand sides
    * ((m, er), (p, ar)) so the merge fold's composed-symbol path is
    * exercised, not just character pairs. */
  val publishedMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"))

  /** Tokenizer FERTILITY per language under a fixed merge list — the
    * tokenizer-fairness audit (Petrov et al., NeurIPS 2023: languages a
    * tokenizer under-serves pay more subword tokens per word, i.e. more
    * compute and context for the same content). Per lang: doc count, word
    * count, subword-token count, and fertility = subtokens/words (one
    * exact division of LONG sums).
    *
    * Scale shape inherits `encode`'s vocabulary residence: the merge fold
    * runs over the distinct-word table, the corpus-side exchange carries
    * (doc_id, word) atoms, and the per-lang rollup moves five longs per
    * language. */
  def fertility(docs: DataFrame,
                merges: Seq[(String, String)] = publishedMerges): DataFrame =
    encode(docs, merges)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_bpe_tokens")).as("n_bpe_tokens"))
      .withColumn("fertility",
        col("n_bpe_tokens").cast("double") / col("n_words").cast("double"))

  /** Train `merges` BPE merge rules over the corpus. Returns the ordered
    * merge list and the final vocab symbolization (for tests/encoding).
    *
    * Loop discipline (the CC-loop pattern): the vocab is checkpointed
    * lazily each round so lineage stays flat; the per-round blocking
    * action is the 1-row argmax collect — loop CONTROL, not data
    * movement (ties break lexicographically on (l, r) so training is
    * deterministic on any cluster layout). Stops early when no pair
    * repeats (pair_count < 2 can never merge usefully — every remaining
    * pair is unique). */
  def train(docs: DataFrame, merges: Int): (Seq[(String, String)], DataFrame) = {
    var vocab = wordSymbols(docs).localCheckpoint()
    val out = scala.collection.mutable.Buffer[(String, String)]()
    var round = 0
    var done = false
    while (round < merges && !done) {
      val top = pairCounts(vocab)
        .filter(col("pair_count") >= 2)
        .orderBy(col("pair_count").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        out += ((l, r))
        vocab = vocab
          .withColumn("syms", mergePair(col("syms"), l, r))
          .localCheckpoint(eager = false)
      }
      round += 1
    }
    (out.toSeq, vocab)
  }
}
