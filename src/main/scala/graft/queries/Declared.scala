package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One declared query: a Spark-first DataFrame build plus (where the operator
  * is ANSI-SQL-expressible) an equivalent DuckDB oracle statement over the
  * same parquet tables. Column names/types are aligned exactly between the
  * two sides — the driver's compare hashes values under name-sorted columns.
  */
final case class DeclaredQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** The D1–D48 declared batch query inventory (SURVEY.md §2.5).
  *
  * Determinism rules (SURVEY §7.4): every money aggregate runs on
  * DECIMAL(18,2) casts (never raw doubles — fp summation order would
  * diverge) and the final output column is cast to DOUBLE on both engines
  * (identical nearest-even conversion → identical float64 rendering); every
  * query ends in a total ORDER BY with a unique tie-break; session timezone
  * is UTC on both sides.
  *
  * Scale notes are inline per query — each plan is written for the 100 TB
  * case (pushdown-friendly filters, broadcast of fixed-cardinality dims,
  * key-partitioned joins) and merely *runs* on the small local corpus.
  */
object Declared {

  /** Money math lands on exact decimals; doubles only pass through untouched. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Final money/decimal OUTPUT columns are cast to DOUBLE on both engines.
    * Compute stays exact (DECIMAL); only the output representation changes.
    * Rationale (round-1 verdict): the driver stringifies the DuckDB oracle
    * through pandas float64 ('138014.0') while Spark's parquet DECIMAL reads
    * back fixed-scale ('138014.00') — value-identical, hash-different. A
    * DECIMAL→DOUBLE cast is the same nearest-even conversion in both engines,
    * so both sides land on bit-identical float64. */
  private def outd(c: Column): Column = c.cast(DoubleType)

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------- D1–D10

  /** D1 — full scan + count. Parquet row-group stats answer this without
    * materializing columns (ReadSchema is empty). */
  private val d01 = DeclaredQuery(
    "d01_scan_count",
    (s, dir) => t(s, dir, "lineitem").agg(count(lit(1)).as("n")),
    Some("SELECT COUNT(*) AS n FROM lineitem"))

  /** D2 — TPC-H Q1 shape: scan + filter + projection + decimal hash-agg.
    * The shipdate filter is pushed to the parquet scan; partial aggregation
    * runs map-side so the shuffle carries ≤ (flags × statuses) rows per task
    * regardless of input scale. */
  private val d02 = DeclaredQuery(
    "d02_pricing_summary",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          outd(sum(dec(col("l_quantity")))).as("sum_qty"),
          outd(sum(dec(col("l_extendedprice")))).as("sum_base"),
          outd(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))).as("sum_disc"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS VARCHAR) AS DOUBLE) AS sum_disc,
      COUNT(*) AS cnt
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""))

  /** D3 — predicate zoo: IN-list, BETWEEN, IS NOT NULL. All three push down
    * to the scan (verify via PushedFilters in explain). */
  private val d03 = DeclaredQuery(
    "d03_predicates",
    (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderstatus").isin("F", "O")
          && col("o_orderdate").between(
            lit("1995-01-01 00:00:00").cast(TimestampType),
            lit("1996-12-31 00:00:00").cast(TimestampType))
          && col("o_custkey").isNotNull)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_orderstatus IN ('F','O')
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
        AND o_custkey IS NOT NULL
      ORDER BY o_orderkey"""))

  /** D4 — inner equi-join + agg. At 100 TB orders≫customer: Catalyst/AQE
    * picks broadcast when customer fits, else shuffled hash on o_custkey —
    * both sides hash-partition on the join key, no sort needed. */
  private val d04 = DeclaredQuery(
    "d04_join_agg",
    (s, dir) =>
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), outd(sum(dec(col("o_totalprice")))).as("v"))
        .orderBy(col("c_mktsegment")),
    Some("""SELECT c_mktsegment, COUNT(*) AS n,
      CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS v
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** D5 — TPC-H Q5 shape: 5-way join. region/nation have *fixed* cardinality
    * (5/25 rows at any scale) so they are broadcast unconditionally; the
    * lineitem⋈orders spine stays a key-partitioned join. Region + date
    * filters are applied before the joins so pruning happens at the scans. */
  private val d05 = DeclaredQuery(
    "d05_multiway_join",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders").filter(
        col("o_orderdate") >= lit("1995-01-01 00:00:00").cast(TimestampType)
          && col("o_orderdate") < lit("1997-01-01 00:00:00").cast(TimestampType))
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(outd(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS VARCHAR) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n_name ORDER BY revenue DESC, n_name"""))

  /** D6 — left outer join + COUNT(col) null semantics (customers with zero
    * orders count 0, not 1). */
  private val d06 = DeclaredQuery(
    "d06_left_join",
    (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n"))
        .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, COUNT(o_orderkey) AS n
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey"""))

  /** D7 — left semi (EXISTS). Semi-join keeps the build side to keys only —
    * at scale this is a shuffle of distinct custkeys, not whole orders rows. */
  private val d07 = DeclaredQuery(
    "d07_semi_join",
    (s, dir) =>
      t(s, dir, "customer")
        .join(
          t(s, dir, "orders").filter(col("o_totalprice") > 400000).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, c_name FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      ORDER BY c_custkey"""))

  /** D8 — left anti (NOT EXISTS), rule C4 shape: users with no high-value
    * purchase event. */
  private val d08 = DeclaredQuery(
    "d08_anti_join",
    (s, dir) => {
      val ev = t(s, dir, "events")
      ev.select(col("user_id")).distinct()
        .join(
          ev.filter(col("event_type") === "purchase" && col("value") > 90).select(col("user_id")),
          Seq("user_id"), "left_anti")
        .orderBy(col("user_id"))
    },
    Some("""SELECT DISTINCT user_id FROM events e
      WHERE NOT EXISTS (SELECT 1 FROM events x
        WHERE x.user_id = e.user_id AND x.event_type = 'purchase' AND x.value > 90)
      ORDER BY user_id"""))

  /** D9 — range/interval self-join (rule C1 batch form), bucketed against
    * key skew. A bare equi-join on user_id alone is O(n_u²) per user — one
    * hot key (bot traffic) with 1M events would put 10¹² candidate pairs on
    * a single task at 100 TB. Instead both sides join on
    * (user_id, hour_bucket): the left side is replicated into its own and
    * the next hour's bucket (a pair within 1 hour can span at most adjacent
    * buckets), so candidate pairs per task are bounded by per-(user, hour)
    * occupancy, not per-user totals. Each true pair matches in exactly one
    * bucket (the right row's own), so no dedup is needed; the precise
    * interval predicate stays as the post-join filter. */
  private val d09 = DeclaredQuery(
    "d09_range_self_join",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("bkt", floor(unix_timestamp(col("ts")) / 3600L))
      val a = ev.select(col("user_id"), col("event_id").as("id_a"),
        col("ts").as("ts_a"), col("event_type").as("type_a"),
        explode(array(col("bkt"), col("bkt") + 1)).as("bkt"))
      val b = ev.select(col("user_id"), col("event_id").as("id_b"),
        col("ts").as("ts_b"), col("event_type").as("type_b"), col("bkt"))
      a.join(b, Seq("user_id", "bkt"))
        .filter(col("id_a") < col("id_b")
          && col("ts_b") >= col("ts_a")
          && col("ts_b") <= col("ts_a") + expr("INTERVAL 1 HOUR")
          && col("type_a") =!= col("type_b"))
        .select(col("user_id"), col("id_a"), col("id_b"))
        .orderBy(col("user_id"), col("id_a"), col("id_b"))
    },
    Some("""SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b
      FROM events a JOIN events b
        ON a.user_id = b.user_id AND a.event_id < b.event_id
       AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
       AND a.event_type <> b.event_type
      ORDER BY a.user_id, id_a, id_b"""))

  /** D10 — cross join (bounded nested-loop: 5×25 rows at any scale). */
  private val d10 = DeclaredQuery(
    "d10_cross_join",
    (s, dir) =>
      t(s, dir, "region").crossJoin(t(s, dir, "nation"))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
        .limit(50),
    Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
      ORDER BY r_name, n_name LIMIT 50"""))

  // --------------------------------------------------------------- D11–D20

  /** D11 — group-count + HAVING (rule P1: repeat enquiries ⇒ intent). */
  private val d11 = DeclaredQuery(
    "d11_having",
    (s, dir) =>
      t(s, dir, "events")
        .filter(col("event_type") === "view")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("c"))
        .filter(col("c") >= 3)
        .orderBy(col("user_id")),
    Some("""SELECT user_id, COUNT(*) AS c FROM events WHERE event_type = 'view'
      GROUP BY user_id HAVING COUNT(*) >= 3 ORDER BY user_id"""))

  /** D12 — exact distinct aggregate. Spark expands to a two-phase agg
    * (partial distinct per partition, then merge) — no driver-side set. */
  private val d12 = DeclaredQuery(
    "d12_count_distinct",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("u"))
        .orderBy(col("event_type")),
    Some("""SELECT event_type, COUNT(DISTINCT user_id) AS u FROM events
      GROUP BY event_type ORDER BY event_type"""))

  /** D13 — ROLLUP + GROUPING(). GROUPING() cast to INT on both sides (Spark
    * returns tinyint, DuckDB bigint — the cast pins an identical schema). */
  private val d13 = DeclaredQuery(
    "d13_rollup",
    (s, dir) =>
      t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(
          grouping(col("r_name")).cast(IntegerType).as("g1"),
          grouping(col("n_name")).cast(IntegerType).as("g2"),
          count(lit(1)).as("cnt"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first),
    Some("""SELECT r_name, n_name,
      CAST(GROUPING(r_name) AS INTEGER) AS g1, CAST(GROUPING(n_name) AS INTEGER) AS g2,
      COUNT(*) AS cnt
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY r_name NULLS FIRST, n_name NULLS FIRST"""))

  /** D14 — CUBE over the same join. */
  private val d14 = DeclaredQuery(
    "d14_cube",
    (s, dir) =>
      t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .cube(col("r_name"), col("n_name"))
        .agg(
          grouping(col("r_name")).cast(IntegerType).as("g1"),
          grouping(col("n_name")).cast(IntegerType).as("g2"),
          count(lit(1)).as("cnt"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first, col("g1"), col("g2")),
    Some("""SELECT r_name, n_name,
      CAST(GROUPING(r_name) AS INTEGER) AS g1, CAST(GROUPING(n_name) AS INTEGER) AS g2,
      COUNT(*) AS cnt
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY CUBE(r_name, n_name)
      ORDER BY r_name NULLS FIRST, n_name NULLS FIRST, g1, g2"""))

  /** D15 — window ranking, top-3 orders per customer (rule P4 top-k-per-group).
    * Partition by customer ⇒ the sort is per-key inside the shuffle partition,
    * never a global sort. */
  private val d15 = DeclaredQuery(
    "d15_topk_per_group",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast(LongType))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) x
      WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  /** D16 — lag/lead sessionization (rule C2 batch form): 30-minute gap rule,
    * one output row per session. Interval comparison (not epoch arithmetic)
    * keeps microsecond semantics identical across engines. */
  private val d16 = DeclaredQuery(
    "d16_sessionize",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_s",
          when(col("prev_ts").isNull
            || (col("ts") - col("prev_ts")) > expr("INTERVAL 30 MINUTES"), 1).otherwise(0))
        .withColumn("session_id",
          sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"), min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
        .orderBy(col("user_id"), col("session_id"))
    },
    Some("""WITH g AS (
        SELECT user_id, ts, event_id,
          CASE WHEN LAG(ts) OVER w IS NULL OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTES
               THEN 1 ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), sess AS (
        SELECT user_id, ts,
          CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM g)
      SELECT user_id, session_id, COUNT(*) AS n_events, MIN(ts) AS start_ts, MAX(ts) AS end_ts
      FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id"""))

  /** D17 — window frame running balance (rule C3 shape), exact decimal. */
  private val d17 = DeclaredQuery(
    "d17_running_balance",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val signed = when(col("event_type") === "purchase", dec(col("value")))
        .otherwise(-dec(col("value")))
      t(s, dir, "events")
        .withColumn("bal", outd(sum(signed).over(w)))
        .select(col("user_id"), col("event_id"), col("bal"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""SELECT user_id, event_id,
      CAST(CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2))
                    ELSE -CAST(value AS DECIMAL(18,2)) END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS bal
      FROM events ORDER BY user_id, event_id"""))

  /** D18 — global sort + limit. Spark runs this as TakeOrderedAndProject:
    * per-partition top-k then a k-row merge on the driver — no global sort
    * materialization at any scale. */
  private val d18 = DeclaredQuery(
    "d18_topk",
    (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
    Some("""SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""))

  /** D19 — set operations: UNION (distinct), INTERSECT, EXCEPT, tagged and
    * stacked so one deterministic result covers all three. */
  private val d19 = DeclaredQuery(
    "d19_set_ops",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
      val b = o.filter(col("o_totalprice") > 200000).select(col("o_custkey").as("k"))
      a.union(b).distinct().withColumn("op", lit("union"))
        .unionByName(a.intersect(b).withColumn("op", lit("intersect")))
        .unionByName(a.except(b).withColumn("op", lit("except")))
        .select(col("op"), col("k"))
        .orderBy(col("op"), col("k"))
    },
    Some("""WITH a AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
           b AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000)
      SELECT 'union' AS op, k FROM (SELECT k FROM a UNION SELECT k FROM b)
      UNION ALL SELECT 'intersect' AS op, k FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
      UNION ALL SELECT 'except' AS op, k FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
      ORDER BY op, k"""))

  /** D20 — string functions: SUBSTR/UPPER/CONCAT/LIKE/regexp (extract+match). */
  private val d20 = DeclaredQuery(
    "d20_strings",
    (s, dir) =>
      t(s, dir, "customer")
        .filter(col("c_name").like("Customer%") && col("c_name").rlike("[0-9]+"))
        .select(
          col("c_custkey"),
          upper(substring(col("c_name"), 1, 8)).as("up8"),
          concat(col("c_mktsegment"), lit("#"), col("c_nationkey").cast(StringType)).as("tag"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"))
        .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, UPPER(SUBSTR(c_name, 1, 8)) AS up8,
      CONCAT(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS tag,
      regexp_extract(c_name, '([0-9]+)', 1) AS digits
      FROM customer
      WHERE c_name LIKE 'Customer%' AND regexp_matches(c_name, '[0-9]+')
      ORDER BY c_custkey"""))

  // --------------------------------------------------------------- D21–D28

  /** D21 — date functions + gaps-and-islands (rule C5: threshold spend on 3
    * consecutive days). Two LAGs over the daily aggregate. */
  private val d21 = DeclaredQuery(
    "d21_consecutive_days",
    (s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("user_id"), col("ts").cast(DateType).as("d"))
        .agg(sum(dec(col("value"))).as("spend"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
      daily
        .withColumn("d1", lag(col("d"), 1).over(w))
        .withColumn("d2", lag(col("d"), 2).over(w))
        .withColumn("s1", lag(col("spend"), 1).over(w))
        .withColumn("s2", lag(col("spend"), 2).over(w))
        .filter(col("d2").isNotNull
          && datediff(col("d"), col("d1")) === 1
          && datediff(col("d1"), col("d2")) === 1
          && col("spend") > 5 && col("s1") > 5 && col("s2") > 5)
        .select(col("user_id"), col("d"), outd(col("spend")).as("spend"))
        .orderBy(col("user_id"), col("d"))
    },
    Some("""WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               SUM(CAST(value AS DECIMAL(18,2))) AS spend
        FROM events GROUP BY user_id, CAST(ts AS DATE)
      ), lagged AS (
        SELECT user_id, d, spend,
               LAG(d, 1) OVER w AS d1, LAG(d, 2) OVER w AS d2,
               LAG(spend, 1) OVER w AS s1, LAG(spend, 2) OVER w AS s2
        FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY d))
      SELECT user_id, d, CAST(CAST(spend AS VARCHAR) AS DOUBLE) AS spend FROM lagged
      WHERE d2 IS NOT NULL AND date_diff('day', d1, d) = 1 AND date_diff('day', d2, d1) = 1
        AND spend > 5 AND s1 > 5 AND s2 > 5
      ORDER BY user_id, d"""))

  /** D22 — math/decimal scalar functions. FLOOR/CEIL cast to BIGINT on both
    * sides (Spark returns BIGINT, DuckDB DOUBLE); ROUND runs on the decimal,
    * not the raw double, so HALF_UP agrees. */
  private val d22 = DeclaredQuery(
    "d22_math",
    (s, dir) =>
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          outd(round(dec(col("l_extendedprice")), 1)).as("r1"),
          outd(abs(dec(col("l_discount")))).as("ad"),
          floor(col("l_quantity")).cast(LongType).as("fl"),
          ceil(col("l_tax") * 100).cast(LongType).as("ce"),
          (col("l_linenumber") % 3).cast(IntegerType).as("md"),
          pow(col("l_quantity"), 2).as("pw"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    Some("""SELECT l_orderkey, l_linenumber,
      CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS r1,
      CAST(ABS(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS ad,
      CAST(FLOOR(l_quantity) AS BIGINT) AS fl,
      CAST(CEIL(l_tax * 100) AS BIGINT) AS ce,
      CAST(l_linenumber % 3 AS INTEGER) AS md,
      POWER(l_quantity, 2) AS pw
      FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  /** D23 — array functions over the embedding column (1-based element_at in
    * both engines). */
  private val d23 = DeclaredQuery(
    "d23_arrays",
    (s, dir) =>
      t(s, dir, "embeddings")
        .select(
          col("vec_id"),
          size(col("embedding")).cast(IntegerType).as("dim"),
          element_at(col("embedding"), 1).as("first_val"))
        .orderBy(col("vec_id")),
    Some("""SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim,
      embedding[1] AS first_val
      FROM embeddings ORDER BY vec_id"""))

  /** D24 — JSON scalar extraction from the events.props string column. */
  private val d24 = DeclaredQuery(
    "d24_json",
    (s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"), get_json_object(col("props"), "$.k").as("k"))
        .orderBy(col("event_id")),
    Some("""SELECT event_id, json_extract_string(props, '$.k') AS k
      FROM events ORDER BY event_id"""))

  /** D25 — conditional/null functions: CASE, COALESCE, NULLIF. */
  private val d25 = DeclaredQuery(
    "d25_conditional",
    (s, dir) =>
      t(s, dir, "customer")
        .select(
          when(col("c_acctbal") < 0, "neg")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high").as("bucket"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"),
          dec(col("c_acctbal")).as("bal"))
        .groupBy(col("bucket"), col("seg"))
        .agg(count(lit(1)).as("n"), outd(sum(col("bal"))).as("tot"))
        .orderBy(col("bucket"), col("seg")),
    Some("""SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
                        WHEN c_acctbal < 5000 THEN 'mid'
                        ELSE 'high' END AS bucket,
        COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
        COUNT(*) AS n,
        CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS tot
      FROM customer GROUP BY 1, 2 ORDER BY bucket, seg"""))

  /** D26 — latest-state view (operator CDC9): reconstruct current state from
    * an append-only change log via per-key ROW_NUMBER. At 100 TB this is the
    * canonical upsert-compaction job — one shuffle on the key. */
  private val d26 = DeclaredQuery(
    "d26_latest_state",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id, event_id, ts, event_type, value FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) x
      WHERE rn = 1 ORDER BY user_id"""))

  /** D27 — first-occurrence detection (rule C4: first-ever event of a type). */
  private val d27 = DeclaredQuery(
    "d27_first_occurrence",
    (s, dir) =>
      t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("first_ts"))
        .orderBy(col("user_id")),
    Some("""SELECT user_id, MIN(ts) AS first_ts FROM events
      WHERE event_type = 'purchase' GROUP BY user_id ORDER BY user_id"""))

  /** D28 — regularity cohort (rules P2/P3/P5 shape): users active with a
    * given event type on ≥ 10 distinct days. */
  private val d28 = DeclaredQuery(
    "d28_regularity_cohort",
    (s, dir) =>
      t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(countDistinct(col("ts").cast(DateType)).as("active_days"))
        .filter(col("active_days") >= 10)
        .orderBy(col("user_id")),
    Some("""SELECT user_id, COUNT(DISTINCT CAST(ts AS DATE)) AS active_days FROM events
      WHERE event_type = 'purchase' GROUP BY user_id
      HAVING COUNT(DISTINCT CAST(ts AS DATE)) >= 10 ORDER BY user_id"""))

  // ------------------------------------------- D30–D37 (round-4 widening)

  /** D30 — rule P3 COMPLETE form: regularity (≥10 active purchase days) AND
    * a spend threshold (setupTables.py:42's "high-value" leg that D28's
    * shape-only version omitted). The threshold predicate evaluates on the
    * exact decimal sum; only the OUTPUT is double. One hash-agg, map-side
    * partials — same scale story as D28. */
  private val d30 = DeclaredQuery(
    "d30_p3_value_cohort",
    (s, dir) =>
      t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(
          countDistinct(col("ts").cast(DateType)).as("active_days"),
          sum(dec(col("value"))).as("tv"))
        .filter(col("active_days") >= 10 && col("tv") >= 600)
        .select(col("user_id"), col("active_days"), outd(col("tv")).as("total_value"))
        .orderBy(col("user_id")),
    Some("""SELECT user_id, COUNT(DISTINCT CAST(ts AS DATE)) AS active_days,
      CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
      HAVING COUNT(DISTINCT CAST(ts AS DATE)) >= 10
         AND SUM(CAST(value AS DECIMAL(18,2))) >= 600
      ORDER BY user_id"""))

  /** D31 — rule P5 COMPLETE form: regularity cohort (≥12 active view days)
    * ANTI-JOINED against users already holding the product (a premium
    * purchase, value > 95) — setupTables.py:44's cross-sell leg. The held
    * set is an aggregate (distinct user_ids), orders of magnitude smaller
    * than events — broadcast anti-join, no shuffle of the cohort. */
  private val d31 = DeclaredQuery(
    "d31_p5_crosssell",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val held = ev
        .filter(col("event_type") === "purchase" && col("value") > 95)
        .select(col("user_id")).distinct()
      ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"))
        .agg(countDistinct(col("ts").cast(DateType)).as("active_days"))
        .filter(col("active_days") >= 12)
        .join(broadcast(held), Seq("user_id"), "left_anti")
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id, COUNT(DISTINCT CAST(ts AS DATE)) AS active_days
      FROM events WHERE event_type = 'view' GROUP BY user_id
      HAVING COUNT(DISTINCT CAST(ts AS DATE)) >= 12
         AND user_id NOT IN (SELECT DISTINCT user_id FROM events
                             WHERE event_type = 'purchase' AND value > 95)
      ORDER BY user_id"""))

  /** D32 — as-of join (latest prior event of another kind): for every
    * purchase, the most recent view by the same user strictly before it.
    * Spark-first scale form: NOT a join at all — one window over the
    * union of both event kinds, partitioned by user (single shuffle,
    * max-over-prefix frame). The naive alternative (self-join on user +
    * ts inequality, then max per purchase) shuffles twice and explodes
    * per-user pair counts quadratically — the d09 skew problem with no
    * upside. Same formulation on the oracle side (ANSI window). */
  private val d32 = DeclaredQuery(
    "d32_asof_join",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, dir, "events")
        .filter(col("event_type").isin("purchase", "view"))
        .withColumn("prior_view_ts",
          max(when(col("event_type") === "view", col("ts"))).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("prior_view_ts"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, user_id, ts, prior_view_ts FROM (
        SELECT event_id, user_id, ts, event_type,
          MAX(CASE WHEN event_type = 'view' THEN ts END) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_view_ts
        FROM events WHERE event_type IN ('purchase', 'view')) x
      WHERE event_type = 'purchase' ORDER BY event_id"""))

  /** D33 — pivot (long→wide conditional aggregation). The value list is
    * EXPLICIT, so Spark plans a single hash-agg with one conditional
    * count per type — no extra distinct-values job, no second shuffle;
    * exactly the oracle's FILTER-aggregate shape. Absent combinations
    * pivot to null → coalesced to 0 to match COUNT semantics. */
  private val d33 = DeclaredQuery(
    "d33_pivot",
    (s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      p.select(col("user_id") +:
          types.map(tp => coalesce(col(tp), lit(0L)).as(s"n_$tp")): _*)
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id,
      COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
      COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
      COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
      COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
      COUNT(*) FILTER (WHERE event_type = 'view') AS n_view
      FROM events GROUP BY user_id ORDER BY user_id"""))

  /** D34 — statistical aggregates (corr, sample stddev) made
    * oracle-exact: built-in corr()/stddev() accumulate doubles in
    * partition order (non-deterministic across layouts, never mind
    * engines), so the moments are accumulated as EXACT decimals —
    * order-independent — and the textbook formulas are then applied in
    * double arithmetic with an identical expression tree on both sides
    * (IEEE +,-,*,/,sqrt are correctly rounded ⇒ bit-identical). Same
    * single-pass, map-side-partial aggregation shape as any sum. */
  private val d34 = DeclaredQuery(
    "d34_stats_moments",
    (s, dir) => {
      val q = dec(col("l_quantity"))
      val p = dec(col("l_extendedprice"))
      val m = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          outd(sum(q)).as("sq"), outd(sum(p)).as("sp"),
          outd(sum(q * p)).as("sqp"), outd(sum(q * q)).as("sqq"),
          outd(sum(p * p)).as("spp"))
      m.select(col("l_returnflag"), col("n"),
          ((col("n") * col("sqp") - col("sq") * col("sp")) /
            sqrt((col("n") * col("sqq") - col("sq") * col("sq")) *
              (col("n") * col("spp") - col("sp") * col("sp"))))
            .as("corr_qty_price"),
          sqrt((col("n") * col("spp") - col("sp") * col("sp")) /
            (col("n") * (col("n") - 1))).as("sd_price"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH m AS (SELECT l_returnflag, COUNT(*) AS n,
        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sq,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sp,
        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sqp,
        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sqq,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS spp
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
        (n * sqp - sq * sp) / sqrt((n * sqq - sq * sq) * (n * spp - sp * sp)) AS corr_qty_price,
        sqrt((n * spp - sp * sp) / (n * (n - 1))) AS sd_price
      FROM m ORDER BY l_returnflag"""))

  /** D35 — unpivot/melt (wide→long): per-flag decimal sums rotated into
    * (measure, val) rows with Dataset.unpivot — Catalyst's Expand node,
    * one pass, no join; the oracle is the equivalent UNION ALL. */
  private val d35 = DeclaredQuery(
    "d35_unpivot",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          outd(sum(dec(col("l_quantity")))).as("sum_qty"),
          outd(sum(dec(col("l_extendedprice")))).as("sum_price"),
          outd(sum(dec(col("l_discount")))).as("sum_disc"))
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "measure", "val")
        .orderBy(col("l_returnflag"), col("measure")),
    Some("""WITH a AS (SELECT l_returnflag,
        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_price,
        CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_disc
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS val FROM a
      UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM a
      UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM a
      ORDER BY l_returnflag, measure"""))

  /** D36 — scalar subquery (orders above the global mean). The mean
    * comparison is kept EXACT: price × count > total is a pure decimal
    * predicate (no decimal division, whose scale rules differ across
    * engines). Spark form: the 1-row global aggregate broadcast against
    * the scan — a scalar subquery is exactly a broadcast nested loop of
    * one row, so this is the plan a correlated optimizer would pick. */
  private val d36 = DeclaredQuery(
    "d36_scalar_subquery",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val tot = o.agg(sum(dec(col("o_totalprice"))).as("s"), count(lit(1)).as("n"))
      o.crossJoin(broadcast(tot))
        .filter(dec(col("o_totalprice")) * col("n") > col("s"))
        .select(col("o_orderkey"), outd(dec(col("o_totalprice"))).as("price"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
      FROM orders
      WHERE CAST(o_totalprice AS DECIMAL(18,2)) * (SELECT COUNT(*) FROM orders)
            > (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)
      ORDER BY o_orderkey"""))

  /** D37 — value window functions (first/last/nth over an explicit full
    * frame): per-user first, latest, and second event values. Pure value
    * selection — the doubles pass through untouched, so cross-engine
    * equality is positional, not arithmetic. */
  private val d37 = DeclaredQuery(
    "d37_value_windows",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          first(col("value")).over(w).as("first_v"),
          last(col("value")).over(w).as("last_v"),
          nth_value(col("value"), 2).over(w).as("second_v"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, user_id,
      FIRST_VALUE(value) OVER w AS first_v,
      LAST_VALUE(value) OVER w AS last_v,
      NTH_VALUE(value, 2) OVER w AS second_v
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY event_id"""))

  /** D38 — time-RANGE moving aggregate (trailing 1 h sum/count per user):
    * a RANGE frame over epoch-microseconds, so peers at the same timestamp
    * enter the frame together — deterministic under ties, unlike a ROWS
    * frame over a non-unique ordering. The rule-C1 "activity in the last
    * hour" primitive in batch form; one shuffle on the partition key. */
  private val d38 = DeclaredQuery(
    "d38_moving_window",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600L * 1000000L, 0)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"),
          outd(sum(dec(col("value"))).over(w)).as("mov_sum"),
          count(lit(1)).over(w).as("mov_n"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, user_id, ts,
      CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS VARCHAR) AS DOUBLE) AS mov_sum,
      COUNT(*) OVER w AS mov_n
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY event_id"""))

  /** D39 — gap filling + forward fill (time-series resampling): a daily
    * per-user grid generated with sequence() between each user's first and
    * last active day, left-joined to the daily aggregate, missing days
    * carried forward with last(ignoreNulls). The grid fan-out is bounded
    * per user (span days) and generated AT the executor from the span row
    * — no driver-side calendar, no cross join against a global dimension. */
  private val d39 = DeclaredQuery(
    "d39_gap_fill",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val daily = ev
        .groupBy(col("user_id"), col("ts").cast(DateType).as("d"))
        .agg(sum(dec(col("value"))).as("dvx"))
      val spans = daily.groupBy(col("user_id"))
        .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      val grid = spans.select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("d"))
      grid.join(daily, Seq("user_id", "d"), "left")
        .select(col("user_id"), col("d"), outd(col("dvx")).as("dv"))
        .withColumn("filled", last(col("dv"), ignoreNulls = true).over(
          Window.partitionBy(col("user_id")).orderBy(col("d"))
            .rowsBetween(Window.unboundedPreceding, 0)))
        .orderBy(col("user_id"), col("d"))
    },
    Some("""WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS d,
          SUM(CAST(value AS DECIMAL(18,2))) AS dvx
        FROM events GROUP BY user_id, CAST(ts AS DATE)),
      spans AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY user_id),
      grid AS (SELECT user_id, CAST(unnest(generate_series(
          CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
        FROM spans)
      SELECT user_id, d, CAST(CAST(dvx AS VARCHAR) AS DOUBLE) AS dv,
        LAST_VALUE(CAST(CAST(dvx AS VARCHAR) AS DOUBLE) IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      FROM grid LEFT JOIN daily USING (user_id, d)
      ORDER BY user_id, d"""))

  /** D40 — distribution-rank windows (percent_rank, cume_dist, ntile):
    * ANSI definitions are pure rational arithmetic over ranks and counts,
    * so cross-engine equality is exact given the unique (value, event_id)
    * ordering. */
  private val d40 = DeclaredQuery(
    "d40_rank_stats",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value"), col("event_id"))
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          ntile(4).over(w).cast(LongType).as("tile"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, user_id, value,
      PERCENT_RANK() OVER w AS pr,
      CUME_DIST() OVER w AS cd,
      NTILE(4) OVER w AS tile
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
      ORDER BY event_id"""))

  /** D41 — hot-key-safe aggregation via two-phase salting (plans.Skew).
    * The salt changes the shuffle graph only: partials are exact decimals,
    * so the regrouped result is value-identical to the plain GROUP BY the
    * oracle runs. The 100 TB scenario: one bot user with 10⁹ events no
    * longer serializes the agg stage behind a single reducer. */
  private val d41 = DeclaredQuery(
    "d41_salted_agg",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("v", dec(col("value")))
      graft.plans.Skew.saltedAggregate(ev, Seq("user_id"), Seq("v"),
          uniqueCol = "event_id", salts = 16)
        .select(col("user_id"), outd(col("sum_v")).as("sum_value"),
          col("n_rows"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id,
      CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value,
      COUNT(*) AS n_rows
      FROM events GROUP BY user_id ORDER BY user_id"""))

  /** D42 — hot-key-safe equi-join via fact-salting + dim-replication
    * (plans.Skew.saltedJoin): each hot fact key spreads over `salts` tasks.
    * Oracle = the plain unsalted join (salting must be result-transparent). */
  private val d42 = DeclaredQuery(
    "d42_salted_join",
    (s, dir) => {
      val dim = t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
      graft.plans.Skew.saltedJoin(t(s, dir, "events"), dim,
          factKey = "user_id", dimKey = "c_custkey",
          uniqueCol = "event_id", salts = 8)
        .select(col("event_id"), col("user_id"), col("c_mktsegment"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT e.event_id, e.user_id, c.c_mktsegment
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      ORDER BY e.event_id"""))

  /** D43 — SCD2 history materialization (cdc.LatestState.scd2History): the
    * full-history sibling of D26's latest-state view. Every change row gets
    * its validity interval and per-key version from ONE window pass (lead +
    * row_number over the same sort — a single shuffle on the key, no
    * self-join). The standard CDC silver "as-of any time" table. */
  private val d43 = DeclaredQuery(
    "d43_scd2_history",
    (s, dir) =>
      graft.cdc.LatestState.scd2History(
          t(s, dir, "events"), key = "user_id", tsCol = "ts", ord = "event_id")
        .select(col("event_id"), col("user_id"), col("valid_from"),
          col("valid_to"), col("version"), col("is_current"))
        .orderBy(col("event_id")),
    Some("""SELECT event_id, user_id,
      ts AS valid_from,
      LEAD(ts, 1) OVER w AS valid_to,
      ROW_NUMBER() OVER w AS version,
      CAST(CASE WHEN LEAD(ts, 1) OVER w IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY event_id"""))

  /** D44 — Z-order (Morton) layout key (plans.Layout.mortonKey): the
    * multi-dimensional clustering key for write-side file layout. Exact
    * integer bit-interleave of (user_id, day-number) — the key d44 checks;
    * the companion `Layout.clusterByZ` range-repartitions on it for
    * writing (plan-asserted in PlanSpec, not oracle-checkable — layout,
    * not values). */
  private val d44 = DeclaredQuery(
    "d44_zorder_key",
    (s, dir) => {
      val day = datediff(col("ts").cast(DateType),
        lit("1970-01-01").cast(DateType)).cast(LongType)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), day.as("day"),
          graft.plans.Layout.mortonKey(col("user_id"), day).as("zkey"))
        .orderBy(col("event_id"))
    },
    Some {
      val terms = (0 until 16).map { i =>
        s"((x >> $i) & 1) * ${1L << (2 * i)} + ((y >> $i) & 1) * ${1L << (2 * i + 1)}"
      }.mkString(" + ")
      s"""SELECT event_id, user_id, day, $terms AS zkey
      FROM (SELECT event_id, user_id,
              CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
              user_id & 65535 AS x,
              CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) & 65535 AS y
            FROM events)
      ORDER BY event_id"""
    })

  /** D45 — snapshot diff (cdc.LatestState.snapshotDiff): the CDC bootstrap
    * for binlog-less sources — diff two "active purchaser profile"
    * snapshots (trailing 10-day windows, 3 days apart) into a change set.
    * Users present only in the new window → insert; only in the old →
    * delete; same latest purchase in both → unchanged (suppressed); a
    * newer purchase → update. Each side collapses to (key, digest) in its
    * scan projection, so the full-outer join shuffles 32-byte digests. */
  private val d45 = DeclaredQuery(
    "d45_snapshot_diff",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      def snap(lo: String, hi: String): DataFrame =
        t(s, dir, "events")
          .filter(col("event_type") === "purchase"
            && col("ts") > lit(s"$lo 00:00:00").cast(TimestampType)
            && col("ts") <= lit(s"$hi 00:00:00").cast(TimestampType))
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("user_id"), col("event_id"), col("value"))
      graft.cdc.LatestState.snapshotDiff(
          snap("2024-01-08", "2024-01-18"), snap("2024-01-11", "2024-01-21"))
        .orderBy(col("user_id"))
    },
    Some("""WITH o AS (SELECT user_id, event_id, value FROM (
        SELECT user_id, event_id, value, ROW_NUMBER() OVER
          (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase'
          AND ts > TIMESTAMP '2024-01-08 00:00:00'
          AND ts <= TIMESTAMP '2024-01-18 00:00:00') x WHERE rn = 1),
      n AS (SELECT user_id, event_id, value FROM (
        SELECT user_id, event_id, value, ROW_NUMBER() OVER
          (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase'
          AND ts > TIMESTAMP '2024-01-11 00:00:00'
          AND ts <= TIMESTAMP '2024-01-21 00:00:00') x WHERE rn = 1),
      oh AS (SELECT user_id, md5(concat_ws(chr(1),
               COALESCE(CAST(length(CAST(event_id AS VARCHAR)) AS VARCHAR)
                 || ':' || CAST(event_id AS VARCHAR), chr(0)),
               COALESCE(CAST(length(CAST(value AS VARCHAR)) AS VARCHAR)
                 || ':' || CAST(value AS VARCHAR), chr(0)))) AS h FROM o),
      nh AS (SELECT user_id, md5(concat_ws(chr(1),
               COALESCE(CAST(length(CAST(event_id AS VARCHAR)) AS VARCHAR)
                 || ':' || CAST(event_id AS VARCHAR), chr(0)),
               COALESCE(CAST(length(CAST(value AS VARCHAR)) AS VARCHAR)
                 || ':' || CAST(value AS VARCHAR), chr(0)))) AS h FROM n)
      SELECT COALESCE(oh.user_id, nh.user_id) AS user_id,
        CASE WHEN oh.user_id IS NULL THEN 'insert'
             WHEN nh.user_id IS NULL THEN 'delete'
             WHEN oh.h <> nh.h THEN 'update' END AS change
      FROM oh FULL JOIN nh ON oh.user_id = nh.user_id
      WHERE (oh.user_id IS NULL OR nh.user_id IS NULL OR oh.h <> nh.h)
      ORDER BY user_id"""))

  /** D46 — point-in-time lookup ("time travel") over the D43 SCD2 history:
    * every key's state as of one instant = the validity interval containing
    * it. On a stored history table this is a pruned scan + filter. */
  private val d46 = DeclaredQuery(
    "d46_time_travel",
    (s, dir) =>
      graft.cdc.LatestState.asOf(
          graft.cdc.LatestState.scd2History(
            t(s, dir, "events"), key = "user_id", tsCol = "ts", ord = "event_id"),
          // UTC-explicit instant: Timestamp.valueOf parses in the JVM
          // DEFAULT timezone and would diverge from the oracle's UTC
          // literal on any non-UTC host (the session conf pins only
          // Spark's timezone, not the JVM's)
          java.sql.Timestamp.from(java.time.LocalDateTime
            .parse("2024-01-15T12:00:00")
            .toInstant(java.time.ZoneOffset.UTC)))
        .select(col("user_id"), col("event_id"), col("valid_from"), col("version"))
        .orderBy(col("user_id")),
    Some("""SELECT user_id, event_id, valid_from, version FROM (
        SELECT user_id, event_id, ts AS valid_from,
          LEAD(ts, 1) OVER w AS valid_to,
          ROW_NUMBER() OVER w AS version
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) x
      WHERE valid_from <= TIMESTAMP '2024-01-15 12:00:00'
        AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 12:00:00')
      ORDER BY user_id"""))

  /** D47 — retention cohort matrix (the P-rules' lifecycle-analytics
    * sibling): users cohorted by first-activity day, counted distinct on
    * each day-offset since. Spark-first shape: the cohort day comes from a
    * window MIN over the user partition — ONE shuffle on user_id and no
    * self-join (the groupBy-then-join form shuffles twice and re-scans);
    * the (cohort, offset) count is then a standard two-phase hash-agg. */
  private val d47 = DeclaredQuery(
    "d47_retention_cohorts",
    (s, dir) => {
      val cohort = min(col("ts").cast(DateType))
        .over(Window.partitionBy(col("user_id")))
      t(s, dir, "events")
        .select(col("user_id"), cohort.as("cohort_day"),
          col("ts").cast(DateType).as("day"))
        .select(col("user_id"), col("cohort_day"),
          datediff(col("day"), col("cohort_day")).cast(LongType).as("day_offset"))
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy(col("cohort_day"), col("day_offset"))
    },
    Some("""SELECT cohort_day, day_offset, COUNT(DISTINCT user_id) AS n_active
      FROM (SELECT user_id,
              MIN(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS cohort_day,
              CAST(datediff('day',
                MIN(CAST(ts AS DATE)) OVER (PARTITION BY user_id),
                CAST(ts AS DATE)) AS BIGINT) AS day_offset
            FROM events) x
      GROUP BY cohort_day, day_offset ORDER BY cohort_day, day_offset"""))

  /** D48 — ordered conversion funnel (view → click → purchase, each stage
    * strictly after the user's entry into the previous one): the staple
    * product-analytics query, and a sequencing operator distinct from the
    * d32 as-of join (which pairs single events) and d47 cohorts (which
    * ignore order). Spark-first shape: ONE pass — per user, min view ts,
    * then conditional mins over the SAME aggregation via min(when(...)):
    * no per-stage self-joins... except stage ordering needs the previous
    * stage's timestamp, so stages chain through per-user aggregates
    * (≤ |users| rows each — broadcast-sized at any event scale; the event
    * table is scanned once per stage with the event-type filter pushed
    * down, never joined to itself row-to-row). */
  private val d48 = DeclaredQuery(
    "d48_funnel",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val s1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val s2 = ev.filter(col("event_type") === "click")
        .join(broadcast(s1), "user_id")
        .filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(broadcast(s2), "user_id")
        .filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      val counts = s1.agg(count(lit(1)).as("n")).withColumn("stage", lit(1L))
        .withColumn("gate", lit("view"))
        .unionByName(s2.agg(count(lit(1)).as("n")).withColumn("stage", lit(2L))
          .withColumn("gate", lit("click_after_view")))
        .unionByName(s3.agg(count(lit(1)).as("n")).withColumn("stage", lit(3L))
          .withColumn("gate", lit("purchase_after_click")))
      counts.select(col("stage"), col("gate"), col("n")).orderBy(col("stage"))
    },
    Some("""WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                        WHERE event_type = 'view' GROUP BY user_id),
      s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
             JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
             WHERE e.event_type = 'click' GROUP BY e.user_id),
      s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
             JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
             WHERE e.event_type = 'purchase' GROUP BY e.user_id)
      SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS stage, 'view' AS gate, COUNT(*) AS n FROM s1
        UNION ALL SELECT 2, 'click_after_view', COUNT(*) FROM s2
        UNION ALL SELECT 3, 'purchase_after_click', COUNT(*) FROM s3)
      ORDER BY stage"""))

  val all: Seq[DeclaredQuery] = Seq(
    d01, d02, d03, d04, d05, d06, d07, d08, d09, d10,
    d11, d12, d13, d14, d15, d16, d17, d18, d19, d20,
    d21, d22, d23, d24, d25, d26, d27, d28,
    d30, d31, d32, d33, d34, d35, d36, d37, d38, d39, d40,
    d41, d42, d43, d44, d45, d46, d47, d48)
}
