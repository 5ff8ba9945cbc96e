package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hot-key (skew) mitigation operators — the manual tools for the one
  * distribution problem AQE does NOT solve by itself.
  *
  * What AQE already covers: a skewed SORT-MERGE JOIN partition is split into
  * multiple task-reads by `OptimizeSkewedJoin` (the other side is re-read per
  * split), so plain equi-joins usually self-heal at runtime.
  *
  * What it does not cover:
  *  - AGGREGATION skew: a hash-agg's shuffle sends every row of a hot key to
  *    ONE reducer. At 100 TB one bot account with 10⁹ events serializes a
  *    whole stage behind a single task. `saltedAggregate` fixes this with a
  *    two-phase (distributive) aggregation: partial agg on (key, salt) —
  *    `salts`-way parallel per hot key — then final agg of the tiny partial
  *    table on the key alone. Exactness: the partials here are
  *    SUM/COUNT/MIN/MAX over exact types (longs/decimals), so the regrouping
  *    is value-identical to the one-phase form (a DOUBLE sum would NOT be —
  *    fp addition is order-sensitive; callers pass decimal columns).
  *  - Join skew where runtime splitting is unavailable: AQE ≥ 3.2 splits
  *    skewed partitions of BOTH sort-merge and shuffled-hash joins
  *    (`OptimizeSkewedJoin`), so on a modern Spark the manual tool is only
  *    needed when AQE is off (streaming micro-batches, fixed-plan
  *    requirements) or when skew must be prevented at shuffle-write time
  *    rather than healed at read time (a single monster key can still
  *    overflow one map output before AQE ever sees it). `saltedJoin`
  *    spreads each hot fact key across `salts` tasks by salting the fact
  *    side and replicating the dim side `salts`-fold. Replication cost is
  *    |dim|·salts — the technique applies exactly when dim is small-ish
  *    but too big (or too dynamic) to broadcast outright.
  *
  * Both operators are semantically transparent (oracle-checked against the
  * unsalted SQL in d41/d42): salting changes the SHUFFLE GRAPH, never the
  * result.
  */
object Skew {

  /** Deterministic row salt in [0, salts): md5-derived from a caller-named
    * unique column, so re-runs (and the correctness oracle) see identical
    * partition assignment. Any roughly-uniform per-row value works; a
    * unique id is always available and never correlated with the hot key. */
  private def saltOf(uniqueCol: Column, salts: Int): Column =
    pmod(conv(substring(md5(uniqueCol.cast(StringType)), 1, 8), 16, 10)
      .cast(LongType), lit(salts.toLong)).cast(IntegerType)

  /** Internal salt column — collision-proof by naming convention (a user
    * column starting with "__graft_" is rejected below rather than
    * silently clobbered). */
  private val SaltCol = "__graft_salt"

  /** Two-phase salted SUM/COUNT aggregation over a (possibly) hot key.
    * `sumCols` must be exact-typed (integral or decimal) for the two-phase
    * regroup to be bit-identical to the one-phase aggregate. Output:
    * keys ++ (sum_<c> per sumCol) ++ n_rows — with each sum cast back to
    * the type the ONE-phase `groupBy(keys).agg(sum(c))` would produce
    * (sum-of-partial-sums widens decimals one extra step; the cast keeps
    * "result-transparent" true for schema as well as values — the regroup
    * sum is exact, so narrowing back never loses digits). */
  def saltedAggregate(df: DataFrame, keys: Seq[String], sumCols: Seq[String],
                      uniqueCol: String, salts: Int = 16): DataFrame = {
    require(sumCols.nonEmpty, "saltedAggregate: sumCols must be non-empty")
    val reserved = (sumCols.map(c => s"sum_$c") :+ "n_rows").toSet
    require(!keys.exists(reserved), s"saltedAggregate: key columns ${keys.filter(reserved)} " +
      "collide with generated output names (sum_<c>/n_rows)")
    require(!df.columns.exists(_.startsWith("__graft_")),
      "saltedAggregate: input columns starting with __graft_ are reserved")
    // One-phase output types, read from an unexecuted plan — the contract
    // is "same schema as the plain groupBy", so derive it from exactly that.
    val onePhase = df.groupBy(keys.map(col): _*)
      .agg(sum(col(sumCols.head)).as(s"sum_${sumCols.head}"),
        sumCols.tail.map(c => sum(col(c)).as(s"sum_$c")): _*)
    val sumType = sumCols.map(c => c -> onePhase.schema(s"sum_$c").dataType).toMap
    val partial = df
      .withColumn(SaltCol, saltOf(col(uniqueCol), salts))
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(
        sum(col(sumCols.head)).as(s"sum_${sumCols.head}"),
        sumCols.tail.map(c => sum(col(c)).as(s"sum_$c"))
          :+ count(lit(1)).as("n_rows"): _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col(s"sum_${sumCols.head}")).cast(sumType(sumCols.head))
          .as(s"sum_${sumCols.head}"),
        sumCols.tail.map(c =>
          sum(col(s"sum_$c")).cast(sumType(c)).as(s"sum_$c"))
          :+ sum(col("n_rows")).as("n_rows"): _*)
  }

  /** Salted fact ⋈ dim equi-join on `factKey = dimKey`: the fact side gets a
    * per-row salt, the dim side is replicated once per salt value (explode
    * of a literal range — no shuffle to build it), and the join key becomes
    * (key, salt). Each hot fact key now lands on `salts` tasks instead of
    * one. Inner join; result columns = fact.* ++ dim.* minus the dim key. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, uniqueCol: String, salts: Int = 8): DataFrame = {
    require(!(fact.columns ++ dim.columns).exists(_.startsWith("__graft_")),
      "saltedJoin: input columns starting with __graft_ are reserved")
    val saltedFact = fact.withColumn(SaltCol, saltOf(col(uniqueCol), salts))
    val repDim = dim.withColumn(SaltCol,
      explode(array((0 until salts).map(i => lit(i)): _*)))
    saltedFact.join(repDim,
        saltedFact(factKey) === repDim(dimKey) &&
          saltedFact(SaltCol) === repDim(SaltCol))
      .drop(repDim(SaltCol)).drop(SaltCol).drop(repDim(dimKey))
  }
}
