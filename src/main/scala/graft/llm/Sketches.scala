package graft.llm

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoders, ExpressionEncoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate sketches + the typed-UDAF extension surface (SURVEY §2.6 S9).
  *
  * - approx sketches: `approx_count_distinct` (HLL++) and
  *   `percentile_approx` — constant-memory per group at any scale, the
  *   sketches a 100 TB profile pass actually runs (exactness bounds
  *   asserted in LlmSpec against the exact twins).
  * - SumSquares: the canonical `Aggregator[IN, BUF, OUT]` — an exact
  *   decimal sum-of-squares. The buffer is a DECIMAL, not a double, so the
  *   result is independent of partitioning/merge order (fp addition is not
  *   associative; decimal addition is) — which is exactly what makes it
  *   DuckDB-oracle-checkable.
  */
object Sketches {

  /** Exact Σ value² over DECIMAL(18,2)-quantized inputs. Buffer DECIMAL(38,4):
    * square of (18,2) has scale 4, leaving 34 integer digits — 10^26 rows of
    * max-value (10^8) squares before overflow. (Encoders.DECIMAL would be the
    * system default (38,18) with only 20 integer digits — too tight at 100 TB,
    * and Spark nulls overflowing decimals silently.) */
  object SumSquares extends Aggregator[java.lang.Double, java.math.BigDecimal, Double] {
    private def quant(v: java.lang.Double): java.math.BigDecimal =
      new java.math.BigDecimal(v.doubleValue)
        .setScale(2, java.math.RoundingMode.HALF_UP)
    def zero: java.math.BigDecimal = java.math.BigDecimal.ZERO.setScale(4)
    def reduce(b: java.math.BigDecimal, v: java.lang.Double): java.math.BigDecimal =
      // non-finite doubles (NaN, ±Inf) are skipped like nulls: BigDecimal
      // cannot represent them and an executor-side NumberFormatException
      // would abort the whole job over one bad row at 100 TB; skipping
      // matches the quantized-decimal contract (document values only)
      if (v == null || v.isNaN || v.isInfinite) b
      else { val q = quant(v); b.add(q.multiply(q)) }
    def merge(a: java.math.BigDecimal, b: java.math.BigDecimal): java.math.BigDecimal =
      a.add(b)
    def finish(b: java.math.BigDecimal): Double = b.doubleValue
    def bufferEncoder: Encoder[java.math.BigDecimal] =
      ExpressionEncoder(
        AgnosticEncoders.JavaDecimalEncoder(DecimalType(38, 4),
          lenientSerialization = true))
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Per-group profile combining the exact twins with their sketches —
    * the exact columns are oracle-checked; the approx columns are bounds-
    * checked in LlmSpec (cross-engine sketch internals differ by design). */
  def profile(events: DataFrame): DataFrame =
    events.groupBy(col("event_type")).agg(
      countDistinct(col("user_id")).as("exact_users"),
      approx_count_distinct(col("user_id")).as("approx_users"),
      expr("percentile(value, array(0.25, 0.5, 0.9))").as("pct"),
      expr("percentile_approx(value, 0.5, 10000)").as("approx_p50"))

  /** COUNT-MIN-SKETCH heavy hitters with the exact twin, over the corpus
    * token stream: d = 2 hash rows (both positions from one md5 digest —
    * the double-hashing construction, deterministic in any engine, unlike
    * Spark's Murmur3-based built-in CountMinSketchAgg) × m counters;
    * estimate(tok) = min over rows of the counter at the token's position.
    * Emitted per top-k exact token: (tok, n, est) — est ≥ n always, with
    * the gap exposing the collision error the (d, m) sizing trades against
    * memory. CMS is the mergeable-sketch answer to "top tokens over 100 TB
    * without a full vocabulary shuffle": counter arrays are fixed size
    * (d·m longs) regardless of corpus, merged associatively across
    * executors. Here each counter row is built as a grouped sum (the batch
    * equivalent of streaming increments — same table, provably), and the
    * estimate probe is a broadcast join of the tiny counter tables against
    * the top-k candidates. */
  /** CMS row-i counter position from an ALREADY-COMPUTED md5 digest
    * column: the i-th 8-hex-char window mod the table width — d
    * independent-enough hash rows from ONE md5 evaluation. Call sites
    * materialize `md5(tok)` in a projection once and derive every row's
    * position from it (evaluating `cmsPos(tok, i, m)` per row would hash
    * the token d times). Shared by the batch operator below and the
    * streaming counter maintenance (StreamOps.cmsCounterStream) so their
    * counter tables are comparable cell-for-cell. */
  def cmsPosFromMd5(digest: org.apache.spark.sql.Column, i: Int, m: Int): org.apache.spark.sql.Column = {
    // md5 has exactly four disjoint 8-hex windows: i >= 4 would substring
    // past the digest, conv("") → NULL, and every row-i count would
    // silently collapse into one (i, null) cell, corrupting the min-over-
    // rows estimate instead of failing.
    require(i >= 0 && i < 4, s"cmsPosFromMd5: row index $i outside md5's 4 windows")
    require(m >= 1, s"cmsPosFromMd5: width m ($m) must be >= 1")
    conv(substring(digest, 1 + 8 * i, 8), 16, 10).cast(LongType) % m
  }

  /** Convenience form over the raw token — one md5 per call; prefer
    * cmsPosFromMd5 when deriving several rows from the same token. */
  def cmsPos(tok: org.apache.spark.sql.Column, i: Int, m: Int): org.apache.spark.sql.Column =
    cmsPosFromMd5(md5(tok), i, m)

  def cmsHeavyHitters(docs: DataFrame, m: Int = 1024, k: Int = 20): DataFrame = {
    def pos(i: Int) = cmsPosFromMd5(col("h"), i, m)
    val exact = docs
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .withColumn("h", md5(col("tok"))) // hash once; both counter rows + probe derive from it
      .localCheckpoint() // feeds both counter rows AND the top-k probe
    def counters(i: Int): DataFrame =
      exact.groupBy(pos(i).as(s"p$i")).agg(sum(col("n")).as(s"c$i"))
    exact
      .orderBy(col("n").desc, col("tok")).limit(k)
      .withColumn("p0", pos(0)).withColumn("p1", pos(1))
      .join(broadcast(counters(0)), "p0")
      .join(broadcast(counters(1)), "p1")
      .select(col("tok"), col("n"), least(col("c0"), col("c1")).as("est"))
  }

  /** HLL distinct-shingle cardinality audit per source (l111) — a
    * REPLAYABLE HyperLogLog (Flajolet et al., AofA'07) built from the
    * portable md5-int32 hash, next to the exact distinct count and the
    * signed estimation error. Completes the estimator-audit family
    * (CMS l34, bottom-k l78, MinHash l43, LSH l44, SimHash l91, IVF l87,
    * PQ l98) with THE cardinality sketch a 100 TB profile pass runs when
    * `approx_count_distinct`'s Spark-internal HLL++ can't be replayed by
    * a second engine: every register here derives from md5 bit
    * arithmetic both engines reproduce exactly.
    *
    * Construction (m = 2^b registers): h = md5-int32(shingle) (uint32);
    * register j = ⌊h / 2^(32−b)⌋ (top b bits); ρ = position of the first
    * 1-bit in the remaining (32−b)-bit suffix = (32−b+1) − bitlength(rem),
    * with ρ = 32−b+1 for rem = 0. Per (source, register): max ρ, empty
    * registers at ρ = 0 via the source × register grid. The harmonic sum
    * Z = Σ 2^(−ρ_j) is carried as the EXACT LONG Σ 2^(50−ρ_j) (ρ ≤ 27 at
    * b = 6 → max term 2^49; m·2^50 < 2^57 — no overflow), so the only
    * double is the final α·m²·2^50/Z_e50 division — one op chain, bit-
    * identical cross-engine. α = 0.709 (the published α_64 constant).
    * The small-range linear-counting correction needs ln() — not
    * bit-portable — so the audit reports est_raw plus n_zero_regs and
    * lets the reader apply corrections; the signed error column is the
    * point of the table anyway.
    *
    * Scale shape: one shingle pass → distinct (source, shingle) hash-agg
    * (the exact count needs it regardless); registers collapse map-side
    * to ≤|sources|·m cells; the grid crossJoin is |sources| × m rows. */
  def hllShingleCardinality(docs: DataFrame, n: Int = 3,
                            b: Int = 6): DataFrame = {
    // b ≤ 12 because hllEstimate's exact LONG harmonic sum caps at
    // m·2^50 = 2^(b+50): b = 12 → 2^62 < 2^63 fits; b = 13 wraps.
    require(b >= 4 && b <= 12, s"hllShingleCardinality: b ($b) out of range")
    val ss = docs
      .select(col("source"), TextOps.tokens(col("text")).as("toks"))
      .select(col("source"),
        explode(TextOps.shinglesFromTokens(col("toks"), n)).as("s"))
      .distinct()
      .withColumn("h", TextOps.md5Int32(col("s")))
      .localCheckpoint() // feeds the exact count AND the registers
    val exact = ss.groupBy(col("source"))
      .agg(count(lit(1)).as("exact_distinct"))
    hllEstimate(hllRegistersFromHashes(ss, b),
        docs.select(col("source")).distinct(), b)
      .join(exact, Seq("source"))
      .select(col("source"), col("exact_distinct"), col("n_zero_regs"),
        col("z_e50"), col("est_raw"),
        (col("est_raw") - col("exact_distinct").cast(DoubleType)).as("err"))
  }

  /** The occupied-register table (source, reg, max_rho) from a
    * (source, h) hash table — the HLL sketch STATE the streaming monitor
    * (S30) carries. */
  def hllRegistersFromHashes(hashes: DataFrame, b: Int = 6): DataFrame = {
    val suffixBits = 32 - b
    val rem = pmod(col("h"), lit(1L << suffixBits))
    val rho = when(rem === 0L, lit(suffixBits + 1L))
      .otherwise(lit(suffixBits.toLong) - (length(bin(rem)) - lit(1L)))
    hashes
      .select(col("source"),
        floor(col("h").cast(DoubleType) / lit(math.pow(2.0, suffixBits)))
          .cast(LongType).as("reg"),
        rho.as("rho"))
      .groupBy(col("source"), col("reg"))
      .agg(max(col("rho")).as("max_rho"))
  }

  /** Per-batch register table straight from a (source, text) document
    * batch — the S30 per-arrival step (batch-local distinct is an
    * optimization only; the max-merge absorbs duplicates). */
  def hllShingleRegisters(docs: DataFrame, n: Int = 3,
                          b: Int = 6): DataFrame =
    hllRegistersFromHashes(
      docs.select(col("source"), TextOps.tokens(col("text")).as("toks"))
        .select(col("source"),
          explode(TextOps.shinglesFromTokens(col("toks"), n)).as("s"))
        .distinct()
        .withColumn("h", TextOps.md5Int32(col("s"))), b)

  /** Associative merge of two register tables — the S30 maintenance fold.
    * Per-cell MAX is associative, commutative, AND IDEMPOTENT, which is
    * strictly stronger than the S22 count discipline: re-delivered
    * batches and cross-batch duplicate shingles are absorbed outright
    * (same shingle → same register → same ρ → max unchanged), so the
    * maintained table equals the from-scratch registers of the drained
    * corpus under ANY delivery semantics, not just exactly-once. State is
    * ≤ |sources|·2^b rows of three longs. */
  def mergeHllRegisters(a: DataFrame, bTab: DataFrame): DataFrame =
    a.unionByName(bTab).groupBy(col("source"), col("reg"))
      .agg(max(col("max_rho")).as("max_rho"))

  /** The estimate readout over a register table: empty registers at
    * ρ = 0 via the sources × 2^b grid, harmonic sum as the exact LONG
    * Σ 2^(50−ρ), α·m²·2⁵⁰/Z as the one double op chain (scaladoc of
    * hllShingleCardinality). */
  def hllEstimate(registers: DataFrame, sources: DataFrame,
                  b: Int = 6): DataFrame = {
    // same bound as hllShingleCardinality: the LONG Σ 2^(50−ρ) needs
    // m·2^50 = 2^(b+50) < 2^63 headroom in the worst (all-empty) case
    require(b >= 4 && b <= 12, s"hllEstimate: b ($b) out of range")
    val m = 1 << b
    val grid = sources.select(col("source"),
      explode(sequence(lit(0L), lit((m - 1).toLong))).as("reg"))
    val cells = grid.join(registers, Seq("source", "reg"), "left")
      .select(col("source"),
        coalesce(col("max_rho"), lit(0L)).as("rho"))
    val zE50 = floor(pow(lit(2.0), lit(50.0) - col("rho").cast(DoubleType)))
      .cast(LongType)
    cells.groupBy(col("source"))
      .agg(sum((col("rho") === 0L).cast(LongType)).as("n_zero_regs"),
        sum(zE50).as("z_e50"))
      .withColumn("est_raw",
        lit(0.709) * lit(m.toDouble) * lit(m.toDouble) *
          pow(lit(2.0), lit(50.0)) / col("z_e50").cast(DoubleType))
  }
}
