package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** The remaining classic TPC-H plan shapes (Q2/Q9/Q11/Q12/Q14/Q16/Q20/Q21)
  * adapted to the trimmed fixture schema. The fixtures carry no partsupp
  * table, ship modes, or receipt/commit dates, so:
  *   - partsupp is DERIVED from lineitem (per-(partkey, suppkey) min price
  *     or shipped volume) — same plan shapes, same join graphs;
  *   - "late" means shipped more than 90 days after the order date.
  * Every query follows the oracle-parity rules (integer-cents sums,
  * explicit BIGINT casts, fully tie-broken orderings). The reference has
  * none of these operators (SURVEY.md §2.1 — its only pipeline is the
  * insights cube); they widen §2.2 relational coverage.
  *
  * Scale notes (100 TB): dimension sides (part/supplier/nation/region and
  * every derived qualifying-key set) stay small enough to broadcast, so
  * each query shuffles the fact table at most once on its natural key —
  * the aggregates before joins pattern keeps the shuffled bytes to the
  * grouped keys, never raw lineitem rows.
  */
object Tpch {

  /** Q2 shape: min-cost supplier per part. The correlated min subquery
    * becomes a per-part window min over the ALREADY part-filtered
    * eligible relation — one evaluation, no self-join back onto an
    * unpersisted aggregate (an agg+equality-join form would run the
    * lineitem aggregate twice). lineitem shuffles once on
    * (partkey, suppkey); the window shuffles only the tiny eligible set.
    *
    * r18 (guide §3.2 — reduce the big side BEFORE shuffling it): the
    * part filter (LARGE, size ≤ 5) and the Europe-supplier set used to
    * join the (partkey, suppkey) aggregate AFTER its shuffle; Spark
    * cannot push an inner join below an aggregate, so every lineitem
    * row paid the aggregate exchange only for ~all of them to be
    * dropped by the dimension filters. Two broadcast SEMI joins on the
    * scan side now prune lineitem to qualifying (part, supplier) rows
    * before the aggregate — identical min per surviving key, identical
    * result (the later inner joins apply the same predicates). */
  def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val largeParts = part(s, dir)
      .filter(col("p_type") === "LARGE" && col("p_size") <= 5)
    val euroSupp = supplier(s, dir)
      .join(broadcast(nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, dir).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
    val ps = lineitem(s, dir)
      .join(broadcast(largeParts.select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .join(broadcast(euroSupp.select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(cents(col("l_extendedprice"))).as("cost_cents"))
    val eligible = ps
      .join(broadcast(largeParts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(euroSupp), col("l_suppkey") === col("s_suppkey"))
      .select(cents(col("s_acctbal")).as("s_acctbal_cents"), col("s_name"),
        col("n_name"), col("p_partkey").cast("long").as("p_partkey"),
        col("p_name"), col("cost_cents"))
    eligible
      .withColumn("min_cost",
        min(col("cost_cents")).over(Window.partitionBy(col("p_partkey"))))
      .filter(col("cost_cents") === col("min_cost"))
      .drop("min_cost")
      .orderBy(col("s_acctbal_cents").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
  }

  /** Q9 shape: profit by supplier nation and order year over a 5-relation
    * join. part ('%red%'), supplier, and nation broadcast; lineitem joins
    * orders on orderkey (the one big-big shuffle) after the part semi
    * filter has already cut the fact side. */
  def q9ProductProfit(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .join(broadcast(part(s, dir).filter(col("p_name").contains("red"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(revenueCents(col("l_extendedprice"), col("l_discount")))
        .as("profit_cents"))
      .orderBy(col("n_name"), col("o_year").desc)

  /** Q11 shape: parts whose value from one nation's suppliers exceeds a
    * fraction of the total. The per-part values are aggregated once; the
    * grand total re-aggregates that SMALL result and returns via a
    * broadcast cross join (no driver collect, single plan). Threshold is
    * exact integer math: value*500 > total. */
  def q11ImportantParts(s: SparkSession, dir: String): DataFrame = {
    val supp7 = supplier(s, dir)
      .join(broadcast(nation(s, dir).filter(col("n_name") === "NATION_7")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    // the per-part value relation feeds both the output and the grand
    // total — materialize it so the lineitem aggregate runs once
    val value = lineitem(s, dir)
      .join(broadcast(supp7), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(cents(col("l_extendedprice"))).as("value_cents"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = value.agg(sum(col("value_cents")).as("total_cents"))
    value.crossJoin(broadcast(total))
      .filter(col("value_cents") * 500 > col("total_cents"))
      .select(col("l_partkey").cast("long").as("p_partkey"), col("value_cents"))
      .orderBy(col("value_cents").desc, col("p_partkey"))
  }

  /** Q12 shape: conditional priority counts by shipping-delay bucket.
    * One orderkey shuffle joins the two big tables (lineitem pre-filtered
    * to one ship year at the scan); the CASE aggregation is map-side
    * partial. */
  def q12ShippingDelay(s: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    val delay = datediff(col("l_shipdate"), col("o_orderdate"))
    orders(s, dir)
      .join(lineitem(s, dir).filter(yearIs(col("l_shipdate"), 1996)),
        col("o_orderkey") === col("l_orderkey"))
      .select(
        when(delay <= 30, "fast").when(delay <= 90, "medium")
          .otherwise("slow").as("delay_bucket"),
        when(high, 1L).otherwise(0L).as("is_high"))
      .groupBy(col("delay_bucket"))
      .agg(sum(col("is_high")).as("high_line_count"),
        sum(lit(1L) - col("is_high")).as("low_line_count"))
      .orderBy(col("delay_bucket"))
  }

  /** Q14 shape: promo revenue share over one ship month. Broadcast part
    * join + a single global aggregate; the percentage is ONE deterministic
    * double division over two exact cents sums (same IEEE expression in
    * the oracle). */
  def q14PromoRevenue(s: SparkSession, dir: String): DataFrame = {
    val rev = revenueCents(col("l_extendedprice"), col("l_discount"))
    lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .join(broadcast(part(s, dir)), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev).otherwise(0L)).as("promo_cents"),
        sum(rev).as("total_cents"))
      .select(col("promo_cents"), col("total_cents"),
        (lit(100.0) * col("promo_cents").cast("double") /
          col("total_cents").cast("double")).as("promo_pct"))
  }

  /** Q16 shape: distinct supplier counts per brand/type/size, excluding a
    * NOT IN supplier set (negative balance — the complaints proxy). Part
    * and the exclusion set broadcast (anti join).
    *
    * r18 (guide §2.4 — remove shuffles outright): the derived partsupp
    * used to pay its own `distinct()` exchange on (partkey, suppkey)
    * BEFORE the joins; but the final `countDistinct(l_suppkey)` already
    * dedups — its partial aggregate dedups (brand, type, size, suppkey)
    * map-side — so the extra distinct bought nothing the aggregate was
    * not already doing. Dropping it removes one full exchange of the
    * fact keys (3 → 2), and the map-side partial dedup now runs on
    * part-filtered survivors only. Result identical: duplicate
    * (partkey, suppkey) rows cannot change a distinct supplier count. */
  def q16SupplierCounts(s: SparkSession, dir: String): DataFrame = {
    val ps = lineitem(s, dir).select(col("l_partkey"), col("l_suppkey"))
    val excluded = supplier(s, dir).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    ps
      .join(broadcast(part(s, dir).filter(col("p_brand") =!= "Brand#1" &&
          col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 9, 16, 25, 36, 49))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size").cast("long").as("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** Q20 shape: suppliers who shipped more than half of a part's annual
    * volume (excess-stock surrogate). Nested aggregates over the same
    * small derived relation; the part name filter becomes a broadcast
    * semi join BEFORE the volume aggregate, so only qualifying rows
    * shuffle. Integer compare 2·supp > part total (quantities are whole). */
  def q20ExcessShippers(s: SparkSession, dir: String): DataFrame = {
    val smallParts = part(s, dir).filter(col("p_name").startsWith("small"))
      .select(col("p_partkey"))
    val vol = lineitem(s, dir)
      .filter(yearIs(col("l_shipdate"), 1995))
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"),
        "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(round(col("l_quantity")).cast("long")).as("supp_qty"))
    // part totals via a window over the (already aggregated, partkey-
    // partitioned) volume relation — single evaluation, no re-agg join
    vol
      .withColumn("part_qty",
        sum(col("supp_qty")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("supp_qty") * 2 > col("part_qty"))
      .join(broadcast(supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("s_name"), col("n_name"))
      .agg(count(lit(1)).as("n_parts"), sum(col("supp_qty")).as("qty_shipped"))
      .orderBy(col("n_parts").desc, col("s_name"))
  }

  /** Q21 shape: the sole late supplier in multi-supplier finished orders.
    * The EXISTS / NOT EXISTS pair collapses into ONE per-order aggregate:
    * an order blames supplier X iff it has >1 distinct suppliers and
    * exactly one distinct LATE supplier (= X). One orderkey shuffle for
    * the orders join, one for the per-order aggregate — no self-joins on
    * lineitem at all (the textbook form does two). The DuckDB oracle keeps
    * the EXISTS/NOT EXISTS formulation, cross-validating the rewrite. */
  def q21WaitingSuppliers(s: SparkSession, dir: String): DataFrame = {
    val l1 = lineitem(s, dir)
      .join(orders(s, dir).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
          .as("late"))
    // r18 (guide §2.3 — shuffle fewer bytes): countDistinct mixed with
    // the non-distinct collect_set planned as Expand(×2) + a two-level
    // distinct aggregate — every joined lineitem row shuffled twice
    // over. collect_set IS a distinct set, so n_supp = size of a second
    // collect_set: one ObjectHashAggregate, no Expand, half the
    // aggregate input rows (l_suppkey is non-null, and countDistinct /
    // collect_set both ignore nulls, so the counts are identical).
    val blamed = l1
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_suppkey")).as("supps"),
        collect_set(when(col("late"), col("l_suppkey"))).as("late_supps"))
      .filter(size(col("supps")) > 1 && size(col("late_supps")) === 1)
      .select(element_at(col("late_supps"), 1).as("l_suppkey"))
    blamed
      .join(broadcast(supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost_supplier" -> q2MinCostSupplier _,
    "q9_product_profit" -> q9ProductProfit _,
    "q11_important_parts" -> q11ImportantParts _,
    "q12_shipping_delay" -> q12ShippingDelay _,
    "q14_promo_revenue" -> q14PromoRevenue _,
    "q16_supplier_counts" -> q16SupplierCounts _,
    "q20_excess_shippers" -> q20ExcessShippers _,
    "q21_waiting_suppliers" -> q21WaitingSuppliers _,
  )

  val oracleSql: Map[String, String] = Map(
    "q2_min_cost_supplier" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(min(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS cost_cents
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |eligible AS (
        |  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name, cost_cents
        |  FROM ps
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE p_type = 'LARGE' AND p_size <= 5 AND r_name = 'EUROPE')
        |SELECT CAST(round(s_acctbal*100) AS BIGINT) AS s_acctbal_cents,
        |       s_name, n_name, CAST(p_partkey AS BIGINT) AS p_partkey, p_name, cost_cents
        |FROM eligible e
        |WHERE cost_cents = (SELECT min(cost_cents) FROM eligible i
        |                    WHERE i.p_partkey = e.p_partkey)
        |ORDER BY s_acctbal_cents DESC, n_name, s_name, p_partkey""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT)
        |    AS profit_cents
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY n_name, o_year
        |ORDER BY n_name, o_year DESC""".stripMargin,
    "q11_important_parts" ->
      """WITH val AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS value_cents
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_7'
        |  GROUP BY l_partkey)
        |SELECT CAST(l_partkey AS BIGINT) AS p_partkey, value_cents
        |FROM val
        |WHERE value_cents * 500 > (SELECT CAST(sum(value_cents) AS BIGINT) FROM val)
        |ORDER BY value_cents DESC, p_partkey""".stripMargin,
    "q12_shipping_delay" ->
      """SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30 THEN 'fast'
        |            WHEN datediff('day', o_orderdate, l_shipdate) <= 90 THEN 'medium'
        |            ELSE 'slow' END AS delay_bucket,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
        |    AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
        |    AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE year(l_shipdate) = 1996
        |GROUP BY delay_bucket ORDER BY delay_bucket""".stripMargin,
    "q14_promo_revenue" ->
      """SELECT
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT) ELSE 0 END) AS BIGINT)
        |    AS promo_cents,
        |  CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT)
        |    AS total_cents,
        |  100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT) ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS DOUBLE)
        |    AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= DATE '1996-03-01' AND l_shipdate < DATE '1996-04-01'""".stripMargin,
    "q16_supplier_counts" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM ps JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' AND p_size IN (1,4,9,16,25,36,49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q20_excess_shippers" ->
      """WITH vol AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS supp_qty
        |  FROM lineitem
        |  WHERE year(l_shipdate) = 1995
        |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |  GROUP BY l_partkey, l_suppkey),
        |tot AS (
        |  SELECT l_partkey, CAST(sum(supp_qty) AS BIGINT) AS part_qty
        |  FROM vol GROUP BY l_partkey)
        |SELECT s_name, n_name,
        |  CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(supp_qty) AS BIGINT) AS qty_shipped
        |FROM vol JOIN tot ON vol.l_partkey = tot.l_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE 2 * supp_qty > part_qty
        |GROUP BY s_name, n_name
        |ORDER BY n_parts DESC, s_name""".stripMargin,
    "q21_waiting_suppliers" ->
      """WITH l1 AS (
        |  SELECT l_orderkey, l_suppkey,
        |    CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F')
        |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM l1 WHERE late = 1) w
        |JOIN supplier ON w.l_suppkey = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM l1 o WHERE o.l_orderkey = w.l_orderkey
        |              AND o.l_suppkey <> w.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM l1 o WHERE o.l_orderkey = w.l_orderkey
        |              AND o.l_suppkey <> w.l_suppkey AND o.late = 1)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,
  )
}
