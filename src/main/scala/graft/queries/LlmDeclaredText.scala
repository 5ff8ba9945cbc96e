package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.llm._

/** Declared queries — text analysis/quality/mixture family (llm/TextAnalysis.scala, llm/Bpe.scala operators).
  *
  * Mechanical split of the single LlmDeclared registry (round 13,
  * VERDICT directive #8) — every member moved verbatim; `LlmDeclared.all`
  * preserves the original declaration order, so bench sequence and
  * artifacts stay comparable round-over-round.
  */
private[queries] trait LlmDeclaredText extends LlmDeclaredBase {

  /** L7 — language ID by stopword-profile argmax. */
  protected val l07 = {
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
  protected val l08 = DeclaredQuery(
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
  protected val l09 = DeclaredQuery(
    "l09_token_counts",
    (s, dir) => TextAnalysis.tokenCounts(t(s, dir, "documents")).orderBy(col("doc_id")),
    Some("""SELECT doc_id,
      CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tokens
      FROM documents ORDER BY doc_id"""))


  /** L10 — document fingerprinting by mod-p shingle sampling. */
  protected val l10 = DeclaredQuery(
    "l10_fingerprints",
    (s, dir) => TextAnalysis.fingerprints(t(s, dir, "documents")).orderBy(col("doc_id")),
    Some(s"""WITH $shingleCte,
      sel AS (SELECT doc_id, substr(md5(s), 1, 8) AS hx
              FROM sh
              WHERE ('0x' || substr(md5(s), 1, 8))::BIGINT % 8 = 0)
      SELECT doc_id, COUNT(*) AS n_sel,
             md5(string_agg(hx, ',' ORDER BY hx)) AS fp
      FROM sel GROUP BY doc_id ORDER BY doc_id"""))


  /** L15 — deterministic corpus split (stable holdout assignment). */
  protected val l15 = DeclaredQuery(
    "l15_stable_split",
    (s, dir) => TextAnalysis.stableSplit(t(s, dir, "documents")).orderBy(col("doc_id")),
    Some("""SELECT doc_id, lang,
      CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 80 THEN 'train'
           WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 90 THEN 'val'
           ELSE 'test' END AS split
      FROM documents ORDER BY doc_id"""))


  /** L18 — text cleaning/normalization with audit columns. */
  protected val l18 = DeclaredQuery(
    "l18_clean_text",
    (s, dir) => TextAnalysis.cleanText(t(s, dir, "documents")).orderBy(col("doc_id")),
    Some("""SELECT doc_id,
      md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS clean_md5,
      CAST(length(text) AS BIGINT) AS raw_len,
      CAST(length(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS BIGINT) AS clean_len
      FROM documents ORDER BY doc_id"""))


  /** L19 — contiguous sequence packing into fixed token budgets. */
  protected val l19 = DeclaredQuery(
    "l19_sequence_pack",
    (s, dir) => TextAnalysis.sequencePack(t(s, dir, "documents"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id, n_tok,
      CAST(FLOOR(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000) AS BIGINT) AS pack_id
      FROM (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
            FROM documents)
      ORDER BY doc_id"""))


  // --------------------------------------- corpus statistics (round 4)

  /** L21 — tf-idf top-k terms per document (rational idf N/df — see
    * TextAnalysis.tfidfTopK for why not ln). */
  protected val l21 = DeclaredQuery(
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
  protected val l22 = DeclaredQuery(
    "l22_vocab_topk",
    (s, dir) => TextAnalysis.vocabulary(t(s, dir, "documents"))
      .orderBy(col("n_occ").desc, col("tok")).limit(100),
    Some("""SELECT tok, COUNT(*) AS n_occ, COUNT(DISTINCT doc_id) AS n_docs
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents) x
      GROUP BY tok ORDER BY n_occ DESC, tok LIMIT 100"""))


  /** L26 — hash-threshold stratified sampling (no shuffle, no window):
    * keep iff md5(lang:doc_id) mod 1000 under the stratum's permille rate
    * (en 150‰ down, zh 500‰ up, 250‰ default). */
  protected val l26 = DeclaredQuery(
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


  /** L28 — domain mixing weights: per-source token share and the uniform-
    * target resampling weight (exact integer counts, one final double
    * division). */
  protected val l28 = DeclaredQuery(
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
  protected val l29 = DeclaredQuery(
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


  /** L31 — corpus-frequent-shingle boilerplate scoring: the cross-document
    * dual of l29's within-document repetition. The hot cut is RELATIVE
    * (df > 1% of corpus size, via a scalar-subquery count on the oracle
    * side), so the operator means the same thing at every scale. */
  protected val l31 = DeclaredQuery(
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
  protected val l32 = DeclaredQuery(
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


  /** L35 — overlapping token-window chunking (64-token windows, stride 48).
    * Chunk content crosses engines as md5 digests; the generator fan-out
    * is per-row, no shuffle. */
  protected val l35 = DeclaredQuery(
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
  protected val l36 = DeclaredQuery(
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


  /** L38 — PII redaction with audit counts. The fixture corpus is PII-free
    * word salad by construction, so (the l01 precedent) the query plants
    * one email, one phone and one long account id per document,
    * deterministically from doc_id, then redacts — the oracle replays the
    * same augmentation and the same RE2-safe patterns. */
  protected val l38 = DeclaredQuery(
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


  /** L45 — deterministic corpus shuffle + sharding (the reproducible
    * data-ordering step between curation and packing): stable md5 shuffle
    * key per doc, shard = leading 32 key bits mod nShards, position =
    * rank within shard. Pure projection + one per-shard sort; identical
    * output on any engine/layout/run. */
  protected val l45 = DeclaredQuery(
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


  /** L47 — per-language length-distribution audit: exact quartiles of
    * n_chars. Dyadic fractions (see TextAnalysis.lengthPercentiles) make
    * Spark `percentile` and DuckDB `quantile_cont` bit-identical on the
    * integer column. */
  protected val l47 = DeclaredQuery(
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


  /** L51 — bigram fluency: per-doc mean corpus frequency of its token
    * bigrams + corpus-hapax fraction (the exact-integer stand-in for the
    * CCNet LM-perplexity quality filter; a log-prob formulation would
    * hang the oracle on cross-libm ulp differences). The bigram key is
    * the md5-int32 hash grid (the l102 convention) — the Spark side
    * computes it with the native positional_gram_hashes(toks, 2), and
    * the oracle replays the identical 32-bit values, so any hash
    * collision folds the same two bigrams in both engines. */
  protected val l51 = DeclaredQuery(
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


  /** L55 — token-budget mixture sampling: per source, admit docs in
    * stable md5(doc_id) order until cumulative tokens reach the budget
    * (first doc to cross the line kept — bounded overshoot). The salted
    * prefix-sum form; 800 tokens/source is non-trivial at sf0.01 (~60%
    * kept) and sf0.1 (~6%) alike. */
  protected val l55 = DeclaredQuery(
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
  protected val l56 = DeclaredQuery(
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
  protected val l57 = DeclaredQuery(
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


  /** L59 — train-vocabulary OOV-rate audit: vocabulary = top-500 token
    * bigrams by TRAIN-split frequency (freq desc, bigram asc — a
    * deterministic cut), then per (split, source) the fraction of bigram
    * occurrences outside it. The val/test numbers are the coverage a
    * train-fixed tokenizer actually achieves on held-out data. */
  protected val l59 = DeclaredQuery(
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


  /** L61 — sequence-pack efficiency audit: per l19 pack, doc count,
    * exact token total, and fill rate vs the 2000-token budget (the
    * padding-waste table; fill > 1 = boundary straddle). */
  protected val l61 = DeclaredQuery(
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
  protected val l62 = DeclaredQuery(
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
  protected val l63 = DeclaredQuery(
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
  protected val l64 = DeclaredQuery(
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


  /** L67 — hashed-n-gram importance weights (DSIR-style domain-matched
    * selection, Xie et al. 2023): score every document by the ratio of
    * its smoothed mean feature likelihood under the TARGET domain model
    * (here lang = 'en' — "select documents that look like the English
    * reference corpus") vs the corpus background model, over B = 256
    * md5-hashed token-bigram buckets. Integer bucket sums + exactly
    * three correctly-rounded double divisions — no log (the l51/l63
    * cross-libm rule), so the oracle reproduces every bit. */
  protected val l67OracleSql = """WITH t AS (SELECT doc_id, source, lang,
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


  protected val l67 = DeclaredQuery(
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
  protected val l67b = DeclaredQuery(
    "l67b_importance_incremental",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.importanceScore(docs,
          TextAnalysis.importanceModel(docs, col("lang") === "en"))
        .orderBy(col("doc_id"))
    },
    Some(l67OracleSql))


  /** L70 — repetition-aware EPOCH plan (Muennighoff et al. 2023): the
    * α = 1/2 temperature allocation of a 50k-token training budget with
    * per-source implied epochs and the > 4-epoch over-repetition flag.
    * Every double is the same left-assoc mul/div chain on both engines
    * (sqrt weights, sequential Σ√ fold — the l57 exactness rules). */
  protected val l70 = DeclaredQuery(
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


  /** L71 — exact quality RANK + decile of the l08 stopword ratio with no
    * global sort on the Spark side (salted bucket-prefix ranks, the l55
    * argument on a score axis); oracle is the straight global
    * row_number the Spark plan must reproduce exactly. */
  protected val l71 = DeclaredQuery(
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
  protected val l72 = DeclaredQuery(
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
  protected val l73 = DeclaredQuery(
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


  /** L89 — pack-budget sweep: pack counts, capacity, fill rate and
    * over-budget-pack counts at budgets {512,1024,2048,4096} — the
    * "choose the context length" table over l19's contiguous packing
    * (corpus tokens constant across rows = conservation check). Oracle:
    * l19's prefix-sum SQL per budget + a one-row summary each. */
  protected val l89 = {
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
  protected val l90 = {
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


  /** L94 — mixture-TEMPERATURE sweep: l70's budget allocation at α ∈
    * {0.25, 0.5, 1.0} (the sqrt-exact family — sqrt chains are bit-stable
    * cross-engine where general pow is not): the "choose the mixture
    * temperature" table. Oracle: l70's fold SQL per α with the weight
    * expression swapped. */
  protected val l94 = {
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


  /** L97 — per-source quality-DRIFT audit: each source's Mann–Whitney
    * rank-sum / AUC vs the rest of the corpus on the l08 stopword-ratio
    * axis (tie-averaged ranks carried ×2 as exact longs — see
    * `TextAnalysis.sourceQualityDrift`). AUC 0.5 = in family; tails =
    * drifted sources. Oracle replays the l71 rank CTE plus the tie-group
    * min/count fold. */
  protected val l97 = DeclaredQuery(
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


  /** L99 — eval-CANARY tripwire: exact substring scan for a known canary
    * list, zero-hit canaries reported with n_docs = 0 (the reading that
    * matters). The declared query plants `__canary_alpha__` into a
    * doc_id % 50 = 0 slice under shifted ids (the l96 planting precedent)
    * so the hit path and the clean path both execute on fixture corpora. */
  protected val l99 = DeclaredQuery(
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


  /** L103 — Gopher-style quality-rule battery (Rae et al. 2021): per
    * source, pass counts for the five word-form rules and the
    * conjunction. Exact integer comparisons only. */
  protected val l103 = DeclaredQuery(
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


  /** L105 — tokenizer fertility per language under the frozen published
    * merge list (Petrov et al. 2023 tokenizer-fairness audit). The oracle
    * replays the merge fold as boundary-preserving string rewriting: a
    * symbol sequence is chr(1)chr(1)-delimited with a chr(1)chr(1) at
    * each end; merge (l, r) is then replace(chr(1)+l+chr(1)chr(1)+r+chr(1)
    * → chr(1)+lr+chr(1)) — each match consumes one chr(1) from each
    * neighboring boundary pair and restores both, so left-to-right
    * non-overlapping replace() IS the BPE merge fold (LlmSpec pins the
    * equality against Bpe.encode). */
  protected val l105 = {
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


  /** L107 — vocabulary coverage curve by vocab-rank decile: interval
    * arithmetic on the (freq, count, before) grid — no per-token ranks,
    * no hapax-tie-group skew (TextAnalysis.vocabCoverage scaladoc). */
  protected val l107 = DeclaredQuery(
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
  protected val l114 = DeclaredQuery(
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


  /** L116 — Gopher-style REPETITION filter battery (Rae et al. 2021,
    * table A1 repetition subset — completes l103's word-form subset):
    * per source, pass counts for top-{2,3,4}-gram and dup-{5,6}-gram
    * char-coverage rules and the conjunction. Exact integer
    * cross-multiplications only (TextAnalysis.repetitionRules). */
  protected val l116 = DeclaredQuery(
    "l116_repetition_rules",
    (s, dir) => TextAnalysis.repetitionRules(t(s, dir, "documents"))
      .orderBy(col("source")),
    Some("""WITH t AS (SELECT doc_id, source, CAST(len(text) AS BIGINT) AS total,
               string_split(text, ' ') AS w FROM documents),
      g AS (
        SELECT doc_id, 2 AS n, unnest(list_transform(range(1, len(w) - 0),
          i -> array_to_string(w[i:i+1], ' '))) AS gram FROM t
        UNION ALL
        SELECT doc_id, 3 AS n, unnest(list_transform(range(1, len(w) - 1),
          i -> array_to_string(w[i:i+2], ' '))) AS gram FROM t
        UNION ALL
        SELECT doc_id, 4 AS n, unnest(list_transform(range(1, len(w) - 2),
          i -> array_to_string(w[i:i+3], ' '))) AS gram FROM t
        UNION ALL
        SELECT doc_id, 5 AS n, unnest(list_transform(range(1, len(w) - 3),
          i -> array_to_string(w[i:i+4], ' '))) AS gram FROM t
        UNION ALL
        SELECT doc_id, 6 AS n, unnest(list_transform(range(1, len(w) - 4),
          i -> array_to_string(w[i:i+5], ' '))) AS gram FROM t),
      gc AS (SELECT doc_id, n, gram, CAST(COUNT(*) AS BIGINT) AS c
             FROM g GROUP BY doc_id, n, gram),
      cov AS (SELECT doc_id, n,
               MAX(c * len(gram)) AS top_cov,
               SUM(CASE WHEN c >= 2 THEN c * len(gram) ELSE 0 END) AS dup_cov
             FROM gc GROUP BY doc_id, n),
      piv AS (SELECT doc_id,
               COALESCE(MAX(CASE WHEN n = 2 THEN top_cov END), 0) AS top2,
               COALESCE(MAX(CASE WHEN n = 3 THEN top_cov END), 0) AS top3,
               COALESCE(MAX(CASE WHEN n = 4 THEN top_cov END), 0) AS top4,
               COALESCE(MAX(CASE WHEN n = 5 THEN dup_cov END), 0) AS dup5,
               COALESCE(MAX(CASE WHEN n = 6 THEN dup_cov END), 0) AS dup6
             FROM cov GROUP BY doc_id),
      r AS (SELECT t.source,
               (COALESCE(p.top2, 0) * 100 <= 20 * t.total) AS r_top2,
               (COALESCE(p.top3, 0) * 100 <= 18 * t.total) AS r_top3,
               (COALESCE(p.top4, 0) * 100 <= 16 * t.total) AS r_top4,
               (COALESCE(p.dup5, 0) * 100 <= 15 * t.total) AS r_dup5,
               (COALESCE(p.dup6, 0) * 100 <= 14 * t.total) AS r_dup6
             FROM t LEFT JOIN piv p USING (doc_id))
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN r_top2 THEN 1 ELSE 0 END) AS BIGINT) AS n_top2,
        CAST(SUM(CASE WHEN r_top3 THEN 1 ELSE 0 END) AS BIGINT) AS n_top3,
        CAST(SUM(CASE WHEN r_top4 THEN 1 ELSE 0 END) AS BIGINT) AS n_top4,
        CAST(SUM(CASE WHEN r_dup5 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup5,
        CAST(SUM(CASE WHEN r_dup6 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup6,
        CAST(SUM(CASE WHEN r_top2 AND r_top3 AND r_top4 AND r_dup5 AND r_dup6
             THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
      FROM r GROUP BY source ORDER BY source"""))


  /** L117 — DSIR data selection via importance resampling (Xie et al.,
    * NeurIPS 2023): hashed unigram+bigram features (1024 buckets), λ_b
    * the rational-snapped add-one likelihood ratio of the eval-split
    * (target) vs train-split (raw) bucket distributions, per-train-doc
    * importance score Σ c_b·λ_b, top-50 selection head by (score desc,
    * doc_id) — the deterministic zero-temperature resampling limit
    * (TextAnalysis.dsirSelect). */
  protected val l117 = DeclaredQuery(
    "l117_dsir_select",
    (s, dir) => TextAnalysis.dsirSelect(t(s, dir, "documents"))
      .orderBy(col("rank")),
    Some("""WITH t AS (SELECT doc_id, source,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS sb,
               string_split(text, ' ') AS w
             FROM documents),
      f AS (SELECT doc_id, sb >= 80 AS is_target,
              unnest(list_concat(
                list_filter(w, x -> len(x) > 0),
                list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))) AS feat
            FROM t),
      fb AS (SELECT doc_id, is_target,
               ('0x' || substr(md5(feat), 1, 8))::BIGINT % 1024 AS b
             FROM f),
      db AS (SELECT doc_id, is_target, b, CAST(COUNT(*) AS BIGINT) AS c
             FROM fb GROUP BY doc_id, is_target, b),
      cnt AS (SELECT b,
               CAST(SUM(CASE WHEN is_target THEN c ELSE 0 END) AS BIGINT) AS c_t,
               CAST(SUM(CASE WHEN NOT is_target THEN c ELSE 0 END) AS BIGINT) AS c_r
             FROM db GROUP BY b),
      tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS t_t,
                     CAST(SUM(c_r) AS BIGINT) AS t_r FROM cnt),
      lam AS (SELECT b, CAST(floor(
                CAST((c_t + 1) * (t_r + 1024) AS DOUBLE) /
                CAST((c_r + 1) * (t_t + 1024) AS DOUBLE) * 1000000.0)
              AS BIGINT) AS lam
             FROM cnt CROSS JOIN tot),
      sc AS (SELECT d.doc_id, CAST(SUM(d.c * l.lam) AS BIGINT) AS score,
                    CAST(SUM(d.c) AS BIGINT) AS n_feats
             FROM db d JOIN lam l USING (b) WHERE NOT d.is_target
             GROUP BY d.doc_id),
      top AS (SELECT doc_id, n_feats, score,
                CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
              FROM sc ORDER BY score DESC, doc_id LIMIT 50)
      SELECT p.doc_id, d2.source, p.n_feats, p.score, p.rank
      FROM top p JOIN (SELECT doc_id, source FROM documents) d2 USING (doc_id)
      ORDER BY p.rank"""))


  // ------------------------------------------------ unigram-LM tokenizer

  /** The unrolled-CTE word-length bound. The fixture generator's words
    * top out at 8 characters today; the `wlg` guard CTE (crossed into
    * every lattice/Viterbi head) makes a longer future word fail the
    * oracle LOUDLY instead of silently vanishing from the inner joins
    * (round-17 ADVICE). */
  private val UnigramMaxWordLen = 12

  /** Shared DuckDB CTE prefix for the unigram-LM oracles: distinct words
    * with corpus freq, the candidate-span table, the ranked seed, the
    * probability-annotated match table `m`. WORDS must come from `ww`
    * (the caller defines it — l123 needs only words, l124 carries
    * doc_id/lang). */
  private def unigramBaseCtes(vocabSize: Int, maxLen: Int): String =
    s"""v AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
        FROM ww GROUP BY word),
      wlg AS (SELECT CASE WHEN MAX(len(word)) > $UnigramMaxWordLen
          THEN error('unigram oracle: a corpus word exceeds the unrolled maxWordLen=$UnigramMaxWordLen')
          ELSE 1 END AS ok FROM v),
      spn AS (SELECT word, freq, j, k, substr(word, j + 1, k) AS piece
        FROM (SELECT word, freq, unnest(range(0, len(word))) AS j FROM v) jt
        CROSS JOIN (SELECT unnest(range(1, ${maxLen + 1})) AS k) ks
        WHERE j + k <= len(word)),
      occ AS (SELECT piece, CAST(SUM(freq) AS BIGINT) AS seed_freq
        FROM spn GROUP BY piece),
      seed AS MATERIALIZED (SELECT piece, seed_freq FROM (
          SELECT piece, seed_freq,
            ROW_NUMBER() OVER (ORDER BY seed_freq DESC, piece) AS rk
          FROM occ) rkt
        WHERE rk <= $vocabSize OR len(piece) = 1),
      tm AS (SELECT CAST(SUM(seed_freq) AS BIGINT) AS t_mass FROM seed),
      m AS MATERIALIZED (SELECT s.word, s.freq, s.j, s.k, s.piece,
          s.j + s.k AS e,
          CAST(sd.seed_freq AS DOUBLE) / CAST(tm.t_mass AS DOUBLE) AS p
        FROM spn s JOIN seed sd USING (piece) CROSS JOIN tm)"""

  /** Unrolled forward/backward lattice CTEs (α by absolute position i,
    * β by distance d from the word end), replaying UnigramLm's pinned
    * fold orders exactly: α sums spans ending at i in START-ascending
    * order (k descending — the left-assoc chain below), β sums spans
    * starting at n−d in END-ascending order (k ascending). A missing
    * span contributes +0.0, which is a fold no-op on the positive
    * partials, so the chain equals Spark's skip-missing fold
    * bit-for-bit. */
  private def unigramLatticeCtes(maxLen: Int, maxWordLen: Int,
                                 sfx: String = "", mTable: String = "m")
      : String = {
    val aLvls = (1 to maxWordLen).map { i =>
      val ks = (math.min(maxLen, i) to 1 by -1)
      val joins = ks.map { k =>
        s"""LEFT JOIN $mTable s$k ON s$k.word = v.word AND s$k.j = ${i - k} AND s$k.k = $k
        LEFT JOIN a${i - k}$sfx ap$k ON ap$k.word = v.word"""
      }.mkString("\n        ")
      val sum = ks.map(k => s"COALESCE(s$k.p * ap$k.a, 0)")
        .reduce((l, r) => s"($l + $r)")
      // MATERIALIZED: each level references up to maxLen prior levels —
      // inlined, the reference tree is exponential in word length and
      // every leaf re-opens the parquet scan (observed: fd exhaustion)
      s"""a$i$sfx AS MATERIALIZED (SELECT v.word, $sum AS a FROM v
        $joins
        WHERE len(v.word) >= $i)"""
    }
    val bLvls = (1 to maxWordLen).map { d =>
      val ks = 1 to math.min(maxLen, d)
      val joins = ks.map { k =>
        s"""LEFT JOIN $mTable s$k ON s$k.word = v.word AND s$k.j = len(v.word) - $d AND s$k.k = $k
        LEFT JOIN b${d - k}$sfx bp$k ON bp$k.word = v.word"""
      }.mkString("\n        ")
      val sum = ks.map(k => s"COALESCE(s$k.p * bp$k.a, 0)")
        .reduce((l, r) => s"($l + $r)")
      s"""b$d$sfx AS MATERIALIZED (SELECT v.word, $sum AS a FROM v
        $joins
        WHERE len(v.word) >= $d)"""
    }
    val aAll = (0 to maxWordLen)
      .map(i => s"SELECT word, $i AS i, a FROM a$i$sfx")
      .mkString("\n        UNION ALL ")
    val bAll = (0 to maxWordLen)
      .map(d => s"SELECT word, $d AS d, a FROM b$d$sfx")
      .mkString("\n        UNION ALL ")
    s"""a0$sfx AS (SELECT word, 1.0 AS a FROM v),
      b0$sfx AS (SELECT word, 1.0 AS a FROM v),
      ${(aLvls ++ bLvls).mkString(",\n      ")},
      aall$sfx AS (
        $aAll),
      ball$sfx AS (
        $bAll),
      an$sfx AS (SELECT aall$sfx.word, aall$sfx.a FROM aall$sfx
        JOIN v ON v.word = aall$sfx.word CROSS JOIN wlg
        WHERE aall$sfx.i = len(v.word))"""
  }

  /** L123 — unigram-LM tokenizer ROUND-1 EM statistics (Kudo ACL'18 /
    * SentencePiece — the l56 BPE precedent: round-1 statistics ARE the
    * training primitive). Per seed candidate piece: its substring-seed
    * frequency and the round-1 E-step expected count — the
    * forward–backward span posteriors of the whole-corpus word lattice,
    * snapped per span to ⌊10⁹·e⌋ (the l117 λ-snap rule) and summed as
    * exact corpus-weighted BIGINTs. Oracle: the same lattice, unrolled
    * one CTE per position — both engines fold the same doubles in the
    * same pinned order. */
  protected val l123 = DeclaredQuery(
    "l123_unigram_round1",
    (s, dir) => UnigramLm.emRound1(t(s, dir, "documents"))
      .orderBy(col("piece")),
    Some(s"""WITH ww AS (SELECT word FROM (
          SELECT unnest(string_split(text, ' ')) AS word FROM documents) uw
          WHERE len(word) > 0),
      ${unigramBaseCtes(40, 4)},
      ${unigramLatticeCtes(4, UnigramMaxWordLen)},
      post AS (SELECT m.piece, m.freq,
          CAST(floor(1e9 * (((aj.a * m.p) * bd.a) / an.a)) AS BIGINT)
            AS e_snap
        FROM m
        JOIN aall aj ON aj.word = m.word AND aj.i = m.j
        JOIN ball bd ON bd.word = m.word AND bd.d = len(m.word) - m.e
        JOIN an ON an.word = m.word)
      SELECT sd.piece, sd.seed_freq,
        CAST(COALESCE(em.em_count, 0) AS BIGINT) AS em_count
      FROM seed sd LEFT JOIN (
        SELECT piece, SUM(e_snap * freq) AS em_count FROM post
        GROUP BY piece) em USING (piece)
      ORDER BY piece"""))

  /** Unrolled Viterbi CTEs: per position i, the 1-best (score, pieces)
    * state — candidates folded in START-ascending order (k descending),
    * a candidate replacing the incumbent only on strictly greater
    * score (NULL-propagating products skip missing spans; ties keep the
    * earliest = longest-final-piece path — UnigramLm's pinned rule).
    * Uses DuckDB lateral column aliases for the in-SELECT fold. */
  private def unigramViterbiCtes(maxLen: Int, maxWordLen: Int,
                                 sfx: String = "", mTable: String = "m")
      : String = {
    val lvls = (1 to maxWordLen).map { i =>
      val ks = (math.min(maxLen, i) to 1 by -1)
      val joins = ks.map { k =>
        s"""LEFT JOIN $mTable s$k ON s$k.word = v.word AND s$k.j = ${i - k} AND s$k.k = $k
        LEFT JOIN vt${i - k}$sfx p$k ON p$k.word = v.word"""
      }.mkString("\n        ")
      // the LAST fold element is the level's result — name it (s, c) so
      // every level exposes the same schema vt0 does (downstream levels
      // join p$k.s / p$k.c)
      val chain = ks.zipWithIndex.map { case (k, ix) =>
        val (ps, pc) = if (ix == 0) ("-1.0", "0")
          else (s"s${ks(ix - 1)}v", s"c${ks(ix - 1)}v")
        val (as_, ac) = if (ix == ks.length - 1) ("s", "c")
          else (s"s${k}v", s"c${k}v")
        s"""CASE WHEN p$k.s * s$k.p > $ps THEN p$k.s * s$k.p ELSE $ps END AS $as_,
        CASE WHEN p$k.s * s$k.p > $ps THEN p$k.c + 1 ELSE $pc END AS $ac"""
      }.mkString(",\n        ")
      // inner wrap: only (word, s, c) escape the level — the fold's
      // intermediate aliases would otherwise collide with the SAME
      // aliases exposed by the joined prior levels
      s"""vt$i$sfx AS MATERIALIZED (SELECT word, s, c FROM (
        SELECT v.word, $chain FROM v
        $joins
        WHERE len(v.word) >= $i) lvl$i$sfx)"""
    }
    val vAll = (1 to maxWordLen)
      .map(i => s"SELECT word, $i AS i, c FROM vt$i$sfx")
      .mkString("\n        UNION ALL ")
    s"""vt0$sfx AS (SELECT word, 1.0 AS s, 0 AS c FROM v),
      ${lvls.mkString(",\n      ")},
      vtall$sfx AS (
        $vAll),
      np$sfx AS (SELECT vtall$sfx.word, CAST(vtall$sfx.c AS BIGINT) AS n_pieces
        FROM vtall$sfx JOIN v ON v.word = vtall$sfx.word CROSS JOIN wlg
        WHERE vtall$sfx.i = len(v.word))"""
  }

  /** L124 — tokenizer-FAMILY fertility comparison: per language, the
    * corpus fertility under the frozen BPE merge list (l105's number)
    * next to the unigram-LM Viterbi segmentation under the l123 seed
    * model — the table a pipeline reads when choosing its tokenizer
    * family (Kudo §5 publishes exactly this BPE-vs-unigram comparison).
    * Both token counts are vocab-table work joined back to (doc_id,
    * word) atoms — the Bpe.encode vocabulary-residence shape. */
  protected val l124 = {
    val sep2 = "chr(1) || chr(1)"
    val base = s"$sep2 || array_to_string(string_split(word, ''), $sep2) || $sep2"
    val folded = Bpe.publishedMerges.foldLeft(base) { case (e, (l, r)) =>
      s"replace($e, chr(1) || '$l' || $sep2 || '$r' || chr(1), chr(1) || '$l$r' || chr(1))"
    }
    DeclaredQuery(
      "l124_tokenizer_fertility",
      (s, dir) => UnigramLm.tokenizerFertilityCompare(t(s, dir, "documents"))
        .orderBy(col("lang")),
      Some(s"""WITH wd AS (SELECT doc_id, lang,
            unnest(string_split(text, ' ')) AS word FROM documents),
        ww AS (SELECT word FROM wd WHERE len(word) > 0),
        ${unigramBaseCtes(40, 4)},
        ${unigramViterbiCtes(4, UnigramMaxWordLen)},
        nb AS (SELECT word,
            CAST(len(string_split($folded, $sep2)) - 2 AS BIGINT) AS n_bpe
          FROM v)
        SELECT wd.lang, CAST(COUNT(*) AS BIGINT) AS n_words,
          CAST(SUM(nb.n_bpe) AS BIGINT) AS n_bpe_tokens,
          CAST(SUM(np.n_pieces) AS BIGINT) AS n_unigram_tokens,
          CAST(SUM(nb.n_bpe) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
            AS bpe_fertility,
          CAST(SUM(np.n_pieces) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
            AS unigram_fertility
        FROM wd
        JOIN nb ON nb.word = wd.word
        JOIN np ON np.word = wd.word
        WHERE len(wd.word) > 0
        GROUP BY wd.lang ORDER BY wd.lang"""))
  }

  /** ONE unigram-LM trainer round (the l129 chain's repeating unit),
    * replaying `UnigramLm.trainRound` bit-for-bit: E-step posteriors
    * under the round's lattice (`aall$latSfx`…, built by the caller
    * over `$mTable`), M-step re-count over the INPUT model's pieces
    * with the single-character count-1 coverage floor, the
    * alternative-segmentation Viterbi over the M-step pieces
    * themselves (every matched span EXCEPT the full-width one — the
    * Kudo §3.2 prune statistic), loss = cnt · ((cnt/T) / alt) (the
    * odds-ratio dialect: ln is not exactly rounded in either engine,
    * so the log-difference weight is replaced by one exactly-rounded
    * division), and the keep of the top ⌈shrinkNum·n/shrinkDen⌉ multi
    * pieces by (loss DESC, piece) plus every single character →
    * `mdl$r`. */
  private def unigramTrainRoundCtes(r: Int, maxLen: Int, inModel: String,
                                    mTable: String, latSfx: String,
                                    shrinkNum: Int, shrinkDen: Int)
      : String = {
    val altLvls = (1 to maxLen).map { i =>
      val ks = (math.min(maxLen, i) to 1 by -1)
      val joins = ks.map { k =>
        s"""LEFT JOIN am$r s$k ON s$k.pw = vp$r.pw AND s$k.j = ${i - k} AND s$k.k = $k
        LEFT JOIN av${i - k}_$r p$k ON p$k.pw = vp$r.pw"""
      }.mkString("\n        ")
      val chain = ks.zipWithIndex.map { case (k, ix) =>
        val ps = if (ix == 0) "-1.0" else s"s${ks(ix - 1)}v"
        val as_ = if (ix == ks.length - 1) "s" else s"s${k}v"
        s"CASE WHEN p$k.s * s$k.p > $ps THEN p$k.s * s$k.p ELSE $ps END AS $as_"
      }.mkString(",\n        ")
      s"""av${i}_$r AS MATERIALIZED (SELECT pw, s FROM (
        SELECT vp$r.pw, $chain FROM vp$r
        $joins
        WHERE len(vp$r.pw) >= $i) alvl${i}_$r)"""
    }
    val altAll = (2 to maxLen)
      .map(i => s"SELECT pw, $i AS i, s FROM av${i}_$r")
      .mkString("\n        UNION ALL ")
    s"""post$r AS (SELECT $mTable.piece, $mTable.freq,
        CAST(floor(1e9 * (((aj.a * $mTable.p) * bd.a) / an$latSfx.a))
          AS BIGINT) AS e_snap
      FROM $mTable
      JOIN aall$latSfx aj ON aj.word = $mTable.word AND aj.i = $mTable.j
      JOIN ball$latSfx bd ON bd.word = $mTable.word
        AND bd.d = len($mTable.word) - $mTable.e
      JOIN an$latSfx ON an$latSfx.word = $mTable.word),
      em$r AS (SELECT piece, SUM(e_snap * freq) AS em FROM post$r
        GROUP BY piece),
      mstep$r AS MATERIALIZED (SELECT md.piece,
          CAST(CASE WHEN len(md.piece) = 1
            THEN GREATEST(COALESCE(em.em, 0), 1)
            ELSE COALESCE(em.em, 0) END AS BIGINT) AS cnt
        FROM $inModel md LEFT JOIN em$r em ON em.piece = md.piece),
      tms$r AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t_mass FROM mstep$r),
      vp$r AS (SELECT piece AS pw FROM mstep$r WHERE len(piece) > 1),
      asp$r AS (SELECT pw, j, k, substr(pw, j + 1, k) AS piece
        FROM (SELECT pw, unnest(range(0, len(pw))) AS j FROM vp$r) jt
        CROSS JOIN (SELECT unnest(range(1, ${maxLen + 1})) AS k) ks
        WHERE j + k <= len(pw) AND k < len(pw)),
      am$r AS MATERIALIZED (SELECT a.pw, a.j, a.k,
          CAST(md.cnt AS DOUBLE) / CAST(tm.t_mass AS DOUBLE) AS p
        FROM asp$r a JOIN mstep$r md USING (piece) CROSS JOIN tms$r tm),
      av0_$r AS (SELECT pw, 1.0 AS s FROM vp$r),
      ${altLvls.mkString(",\n      ")},
      alt$r AS (SELECT altall.pw, altall.s FROM (
          $altAll) altall
        JOIN vp$r ON vp$r.pw = altall.pw WHERE altall.i = len(vp$r.pw)),
      loss$r AS MATERIALIZED (SELECT ms.piece, ms.cnt,
          CAST(ms.cnt AS DOUBLE)
            * ((CAST(ms.cnt AS DOUBLE) / CAST(tm.t_mass AS DOUBLE))
              / alt$r.s) AS loss
        FROM mstep$r ms JOIN alt$r ON alt$r.pw = ms.piece
        CROSS JOIN tms$r tm),
      keep$r AS (SELECT piece, cnt FROM (
          SELECT piece, cnt,
            ROW_NUMBER() OVER (ORDER BY loss DESC, piece) AS rk
          FROM loss$r) rt
        WHERE rk <= (SELECT ($shrinkNum * COUNT(*) + $shrinkDen - 1)
          // $shrinkDen FROM loss$r)),
      mdl$r AS MATERIALIZED (SELECT piece, cnt FROM keep$r
        UNION ALL
        SELECT piece, cnt FROM mstep$r WHERE len(piece) = 1)"""
  }

  /** The shared 2-round trainer CTE chain (seed → round 1 → round 2 →
    * `mdl2`), used by l129 (final model statistics) and l130 (trained
    * fertility). Round 1 reuses the l123 lattice verbatim (the seed
    * model's p IS seed_freq/t_mass); round 2 rebuilds the lattice
    * under the pruned round-1 model. */
  private def unigramTrainCtes(vocabSize: Int, maxLen: Int): String =
    s"""${unigramBaseCtes(vocabSize, maxLen)},
      ${unigramLatticeCtes(maxLen, UnigramMaxWordLen)},
      mdl0 AS (SELECT piece, seed_freq AS cnt FROM seed),
      ${unigramTrainRoundCtes(1, maxLen, "mdl0", "m", "", 3, 4)},
      tmr2 AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t_mass FROM mdl1),
      m2 AS MATERIALIZED (SELECT s.word, s.freq, s.j, s.k, s.piece,
          s.j + s.k AS e,
          CAST(md.cnt AS DOUBLE) / CAST(tmr2.t_mass AS DOUBLE) AS p
        FROM spn s JOIN mdl1 md USING (piece) CROSS JOIN tmr2),
      ${unigramLatticeCtes(maxLen, UnigramMaxWordLen, "_r2", "m2")},
      ${unigramTrainRoundCtes(2, maxLen, "mdl1", "m2", "_r2", 3, 4)},
      tmf AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t_mass FROM mdl2)"""

  /** L129 — the unigram-LM TRAINER (Kudo ACL'18 §3.2 / the
    * SentencePiece trainer, the full loop l123's round-1 statistics
    * seeded): seed vocabulary → 2 × (E-step expected counts, M-step
    * renormalize with the single-character coverage floor, prune the
    * lowest-loss quarter of the multi-character pieces — loss ranks
    * each piece's expected usage against its own best alternative
    * segmentation). Output: the final model (piece, em_count, prob)
    * — what S40's derive-at-swap serves and l130's segmentation
    * consumes. The oracle unrolls both rounds' lattices and the
    * piece-level alternative-segmentation Viterbi into one CTE chain:
    * two engines, two very different executions, bit-identical
    * doubles by pinned fold order. */
  protected val l129 = DeclaredQuery(
    "l129_unigram_train",
    (s, dir) => UnigramLm.trainRounds(t(s, dir, "documents"))
      .orderBy(col("piece")),
    Some(s"""WITH ww AS (SELECT word FROM (
          SELECT unnest(string_split(text, ' ')) AS word FROM documents) uw
          WHERE len(word) > 0),
      ${unigramTrainCtes(40, 4)}
      SELECT mdl2.piece, mdl2.cnt AS em_count,
        CAST(mdl2.cnt AS DOUBLE) / CAST(tmf.t_mass AS DOUBLE) AS prob
      FROM mdl2 CROSS JOIN tmf
      ORDER BY mdl2.piece"""))

  /** L130 — the l124 tokenizer-family fertility comparison RE-CHECKED
    * against the TRAINED model (l129's 2-round output), not the seed:
    * pruned pieces force their words onto surviving alternatives, and
    * the trained fertility is the number a pipeline actually ships
    * (the BPE leg is the unchanged control arm — the same frozen
    * published merge list as l105/l124). */
  protected val l130 = {
    val sep2 = "chr(1) || chr(1)"
    val base = s"$sep2 || array_to_string(string_split(word, ''), $sep2) || $sep2"
    val folded = Bpe.publishedMerges.foldLeft(base) { case (e, (l, r)) =>
      s"replace($e, chr(1) || '$l' || $sep2 || '$r' || chr(1), chr(1) || '$l$r' || chr(1))"
    }
    DeclaredQuery(
      "l130_tokenizer_fertility_trained",
      (s, dir) =>
        UnigramLm.tokenizerFertilityCompareTrained(t(s, dir, "documents"))
          .orderBy(col("lang")),
      Some(s"""WITH wd AS (SELECT doc_id, lang,
            unnest(string_split(text, ' ')) AS word FROM documents),
        ww AS (SELECT word FROM wd WHERE len(word) > 0),
        ${unigramTrainCtes(40, 4)},
        mv AS MATERIALIZED (SELECT s.word, s.freq, s.j, s.k, s.piece,
            s.j + s.k AS e,
            CAST(md.cnt AS DOUBLE) / CAST(tmf.t_mass AS DOUBLE) AS p
          FROM spn s JOIN mdl2 md USING (piece) CROSS JOIN tmf),
        ${unigramViterbiCtes(4, UnigramMaxWordLen, "t", "mv")},
        nb AS (SELECT word,
            CAST(len(string_split($folded, $sep2)) - 2 AS BIGINT) AS n_bpe
          FROM v)
        SELECT wd.lang, CAST(COUNT(*) AS BIGINT) AS n_words,
          CAST(SUM(nb.n_bpe) AS BIGINT) AS n_bpe_tokens,
          CAST(SUM(npt.n_pieces) AS BIGINT) AS n_unigram_tokens,
          CAST(SUM(nb.n_bpe) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
            AS bpe_fertility,
          CAST(SUM(npt.n_pieces) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
            AS unigram_fertility
        FROM wd
        JOIN nb ON nb.word = wd.word
        JOIN npt ON npt.word = wd.word
        WHERE len(wd.word) > 0
        GROUP BY wd.lang ORDER BY wd.lang"""))
  }
}
