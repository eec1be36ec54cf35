package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Join/aggregation coverage over the TPC-H-ish star schema — beyond the
  * reference surface (it has no joins, SURVEY.md §2 end note) but core to
  * "complete analytics engine" and to demonstrating the scale posture:
  *
  *  - dimension tables (region/nation/customer/supplier/part) are
  *    broadcast — no shuffle of the fact table for dimension joins;
  *  - fact-fact joins (lineitem ⋈ orders) hash-shuffle on the join key
  *    once, with AQE free to pick broadcast when the filtered side fits;
  *  - every aggregate is partial-aggregation friendly.
  */
object TpchQueries {

  /** j01 — TPC-H Q1 shape: pricing summary over lineitem. The scan filter
    * is pushed to parquet; one shuffle for the 6-group aggregation. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
          .as("sum_charge"),
        avg(col("l_quantity")).as("avg_qty"),
        avg(col("l_extendedprice")).as("avg_price"),
        avg(col("l_discount")).as("avg_disc"),
        count("*").as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  SUM(l_quantity) AS sum_qty,
      |  SUM(l_extendedprice) AS sum_base_price,
      |  SUM(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
      |  SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
      |  AVG(l_quantity) AS avg_qty,
      |  AVG(l_extendedprice) AS avg_price,
      |  AVG(l_discount) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** j02 — TPC-H Q5 shape: revenue by nation for one region & year.
    * customer/nation/region broadcast; lineitem⋈orders is the only
    * fact-side shuffle. */
  def revenueByNation(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
           count("*").as("n_lineitems"))
      .orderBy(desc("revenue"), col("r_name"), col("n_name"))
  }

  val revenueByNationSql: String =
    """SELECT r_name, n_name,
      |  SUM(l_extendedprice * (1 - l_discount)) AS revenue,
      |  COUNT(*) AS n_lineitems
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY r_name, n_name
      |ORDER BY revenue DESC, r_name, n_name""".stripMargin

  /** j03 — TPC-H Q10 shape: top-20 customers by revenue. */
  def topCustomers(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"), col("c_acctbal"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)
  }

  val topCustomersSql: String =
    """SELECT c_custkey, c_name, n_name, c_acctbal,
      |  SUM(l_extendedprice * (1 - l_discount)) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name, c_acctbal
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** j04 — TPC-H Q4 shape: order-priority distribution with an EXISTS
    * (left-semi join) against lineitem shipped after the order date. */
  def orderPriority(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val late = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
    o.join(late,
        col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count("*").as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val orderPrioritySql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** j05 — parts by supplier nation: part ⋈ lineitem ⋈ supplier ⋈ nation,
    * grouped by (nation, brand): volume + distinct parts. */
  def partsBySupplierNation(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir)
    val su = Tables.supplier(s, dir)
    val n = Tables.nation(s, dir)
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("p_brand"))
      .agg(sum(col("l_quantity")).as("total_qty"),
           count_distinct(col("p_partkey")).as("distinct_parts"))
      .orderBy(col("n_name"), col("p_brand"))
  }

  val partsBySupplierNationSql: String =
    """SELECT n_name, p_brand, SUM(l_quantity) AS total_qty,
      |  COUNT(DISTINCT p_partkey) AS distinct_parts
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name, p_brand ORDER BY n_name, p_brand""".stripMargin

  /** j06 — TPC-H Q22 shape: ANTI join. INACTIVE customers — no order
    * since the cutoff — counted per nation (every fixture customer has
    * *some* order, so "no orders ever" would be vacuous; churn-since is
    * the realistic form anyway). The pushed date filter shrinks the anti
    * side before the join; the anti join broadcasts the filtered
    * custkeys when they fit and degrades to one hash shuffle on custkey
    * at scale — never a cartesian. `left_anti` is the plan-native form
    * of `NOT EXISTS` (no null-trap, unlike `NOT IN`). */
  def customersWithoutOrders(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir)
              .filter(col("o_orderdate") >= lit("1998-06-01"))
              .select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_custs"),
           sum(col("c_acctbal")).as("total_acctbal"))
      .orderBy(col("n_name"))

  val customersWithoutOrdersSql: String =
    """SELECT n.n_name, COUNT(*) AS n_custs, SUM(c.c_acctbal) AS total_acctbal
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderdate >= TIMESTAMP '1998-06-01 00:00:00')
      |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin

  /** j07 — TPC-H Q13 shape: LEFT OUTER join + two-level aggregation.
    * Orders-per-customer distribution, customers with zero orders
    * included. First aggregation shuffles on custkey (partial agg
    * map-side), second on the tiny count domain. */
  def orderCountDistribution(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_custkey"))
      .join(Tables.orders(s, dir).select(col("o_custkey"), col("o_orderkey")),
            col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))

  val orderCountDistributionSql: String =
    """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
      |FROM (
      |  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      |  FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
      |  GROUP BY c.c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** j08 — ROLLUP grouping sets: pricing totals at (flag, status),
    * (flag) and grand-total grains in ONE pass — Catalyst's Expand turns
    * the rollup into one shuffle carrying all three grains with partial
    * aggregation intact (vs 3 scans for 3 queries). NULL grouping slots
    * are labeled 'ALL' on both sides so the oracle compare never
    * depends on engine NULL-ordering. */
  def pricingRollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"),
           sum(col("l_extendedprice")).as("sum_price"),
           count(lit(1)).as("n_rows"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("sum_price"), col("n_rows"))
      .orderBy("returnflag", "linestatus")

  val pricingRollupSql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |       COALESCE(l_linestatus, 'ALL') AS linestatus,
      |       SUM(l_quantity) AS sum_qty,
      |       SUM(l_extendedprice) AS sum_price,
      |       COUNT(*) AS n_rows
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** j09 — RANGE (interval) join without a cartesian: for every order
    * date, count the shipments (any order) falling in its 7-day
    * forward window. The declarative inequality join would plan as a
    * nested-loop; the scale-safe shape is TIME-BIN BUCKETING: bin both
    * sides by 7-day units of epoch time, explode each window onto the
    * (≤2) bins it overlaps, equi-join on the bin, and re-check the
    * exact range on the survivors — the bin join IS the blocking, the
    * filter restores exact semantics (the same
    * bucket-then-verify pattern as the dedup family). Here the
    * order-date side is aggregate-small and broadcast, so the plan is
    * a BroadcastHashJoin on the bin (spec-asserted: no nested-loop);
    * at fact×fact scale the identical code shuffles both sides on the
    * bin instead. Inner-join semantics: dates with zero shipments in
    * window don't appear (mirrored in the oracle). */
  def shipmentsInWindow(s: SparkSession, dir: String): DataFrame = {
    val W = 7L * 86400L // window = bin width, seconds
    val o = Tables.orders(s, dir)
      .groupBy(col("o_orderdate")).agg(count(lit(1)).as("n_orders"))
      .select(col("o_orderdate"), col("n_orders"),
        explode(array_distinct(array(
          floor(unix_timestamp(col("o_orderdate")) / W),
          floor((unix_timestamp(col("o_orderdate")) + W - 1) / W)))).as("bin"))
    val li = Tables.lineitem(s, dir).select(col("l_shipdate"),
      floor(unix_timestamp(col("l_shipdate")) / W).as("bin"))
    broadcast(o).join(li, Seq("bin"))
      .filter(col("l_shipdate") >= col("o_orderdate") &&
              col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 7 DAYS"))
      .groupBy(col("o_orderdate"), col("n_orders"))
      .agg(count(lit(1)).as("n_shipments"))
      .orderBy(col("o_orderdate"))
  }

  val shipmentsInWindowSql: String =
    """WITH o AS (SELECT o_orderdate, CAST(COUNT(*) AS BIGINT) AS n_orders
      |           FROM orders GROUP BY 1)
      |SELECT o.o_orderdate, o.n_orders, CAST(COUNT(*) AS BIGINT) AS n_shipments
      |FROM o JOIN lineitem l
      |  ON l.l_shipdate >= o.o_orderdate
      | AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin

  /** j10 — set operations (INTERSECT / EXCEPT), a SQL-surface capability
    * the reference's declared queries never use: suppliers who shipped
    * in both 1996 and 1997, and those active in 1996 only. Spark plans
    * both as aggregates/joins on the distinct key sets — the inputs are
    * already distinct supplier keys (suppliers-sized, not fact-sized),
    * so each set op is one co-partitioned shuffle of a dimension-scale
    * relation. */
  def supplierSetOps(s: SparkSession, dir: String): DataFrame = {
    def shippers(year: Int) = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit(s"$year-01-01") &&
              col("l_shipdate") < lit(s"${year + 1}-01-01"))
      .select(col("l_suppkey")).distinct()
    val y96 = shippers(1996); val y97 = shippers(1997)
    y96.intersect(y97).withColumn("set_op", lit("both"))
      .unionByName(y96.except(y97).withColumn("set_op", lit("only_1996")))
      .select(col("set_op"), col("l_suppkey"))
      .orderBy("set_op", "l_suppkey")
  }

  val supplierSetOpsSql: String =
    """WITH y96 AS (SELECT DISTINCT l_suppkey FROM lineitem
      |             WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |               AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'),
      |     y97 AS (SELECT DISTINCT l_suppkey FROM lineitem
      |             WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |               AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00')
      |SELECT 'both' AS set_op, l_suppkey
      |FROM (SELECT l_suppkey FROM y96 INTERSECT SELECT l_suppkey FROM y97)
      |UNION ALL
      |SELECT 'only_1996' AS set_op, l_suppkey
      |FROM (SELECT l_suppkey FROM y96 EXCEPT SELECT l_suppkey FROM y97)
      |ORDER BY set_op, l_suppkey""".stripMargin

  /** j11 — correlated-subquery shape: orders above 1.5× THEIR nation's
    * average order value. The correlated scalar subquery decorrelates
    * into a per-nation aggregate joined back — Spark-side that join is
    * explicit: the nation-average relation is nations-sized and
    * broadcast, so the fact table is filtered row-locally with no
    * second fact shuffle. */
  def bigSpenders(s: SparkSession, dir: String): DataFrame = {
    val co = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)),
            col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"), col("o_totalprice"))
    // round the threshold to fixed precision on BOTH engines: partial-agg
    // summation order differs between Spark and DuckDB, so an unrounded
    // avg() could flip membership of a row sitting exactly on 1.5×avg
    val natAvg = co.groupBy(col("c_nationkey"))
      .agg(round(avg(col("o_totalprice")), 6).as("nat_avg"))
    co.join(broadcast(natAvg), "c_nationkey")
      .filter(col("o_totalprice") > lit(1.5) * col("nat_avg"))
      .join(broadcast(Tables.nation(s, dir)),
            col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_big_orders"),
           max(col("o_totalprice")).as("max_price"))
      .orderBy("n_name")
  }

  val bigSpendersSql: String =
    """SELECT n.n_name,
      |       CAST(COUNT(*) AS BIGINT) AS n_big_orders,
      |       MAX(o.o_totalprice) AS max_price
      |FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE o.o_totalprice > 1.5 * (
      |  SELECT round(AVG(o2.o_totalprice), 6)
      |  FROM orders o2 JOIN customer c2 ON o2.o_custkey = c2.c_custkey
      |  WHERE c2.c_nationkey = c.c_nationkey)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** j12 — window FRAME analytics: per-event-type daily counts with a
    * trailing 7-row moving average. The frame runs over the PRE-AGGREGATED
    * (type, day) relation — types × days rows, shuffled once on the
    * low-cardinality type key — never over raw events; the partial agg
    * below it is what touches the corpus. Sum of ≤7 longs then one
    * division keeps float parity exact across engines. */
  def dailyMovingAvg(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
               date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("ma7", sum(col("n")).over(w).cast("double") /
                         count(lit(1)).over(w).cast("double"))
      .orderBy("event_type", "day")
  }

  val dailyMovingAvgSql: String =
    """WITH daily AS (
      |  SELECT event_type, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
      |         CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, day, n,
      |       CAST(SUM(n) OVER w AS DOUBLE) / CAST(COUNT(*) OVER w AS DOUBLE) AS ma7
      |FROM daily
      |WINDOW w AS (PARTITION BY event_type ORDER BY day
      |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY event_type, day""".stripMargin

  /** j13 — TPC-H Q18 shape (large-volume orders): `IN (SELECT … GROUP BY
    * … HAVING …)` — the aggregate-membership subquery class. Decorrelated
    * Spark-side as a LEFT SEMI join against the HAVING-filtered
    * aggregate: the filter runs on the aggregated (orders-grain)
    * relation, the semi-join carries only qualifying keys, and lineitem
    * is shuffled once for the aggregate — never re-scanned per-row the
    * way a naive subquery would. */
  def largeVolumeOrders(s: SparkSession, dir: String,
                        minQty: Double = 300.0): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val qualifying = li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > minQty)
    Tables.orders(s, dir)
      .join(qualifying.select(col("l_orderkey"), col("total_qty")),
            col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
              col("o_totalprice"), col("total_qty"))
      .orderBy("o_orderkey")
  }

  val largeVolumeOrdersSql: String =
    """WITH q AS (
      |  SELECT l_orderkey, SUM(l_quantity) AS total_qty
      |  FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 300)
      |SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_totalprice, q.total_qty
      |FROM orders o JOIN q ON o.o_orderkey = q.l_orderkey
      |WHERE o.o_orderkey IN (SELECT l_orderkey FROM q)
      |ORDER BY o.o_orderkey""".stripMargin

  /** j14 — TPC-H Q21 shape (suppliers who kept orders waiting): the
    * double-correlated EXISTS / NOT EXISTS class — "a late supplier on a
    * multi-supplier order where NO OTHER supplier was late". The fixture
    * lineitem has no commit/receipt dates, so "late" = shipped more than
    * 60 days after the order date.
    *
    * Decorrelated Spark-side as two stacked aggregations instead of two
    * correlated subqueries per row: one shuffle of lineitem on
    * (orderkey, suppkey) collapses lines to per-(order, supplier) late
    * flags; re-aggregating THAT relation per order gives supplier count
    * and late-supplier count; the EXISTS/NOT-EXISTS pair becomes a
    * row-local filter (has_late ∧ n_supp ≥ 2 ∧ n_late = 1). Lineitem is
    * never re-scanned per subquery, supplier names broadcast, and the
    * top-20 is a TakeOrdered, not a global sort. */
  def waitingSuppliers(s: SparkSession, dir: String): DataFrame = {
    val flagged = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("interval 60 days"))
          .cast("int").as("late"))
    val perSupp = flagged.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("has_late"))
    val perOrder = perSupp.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"), sum(col("has_late")).as("n_late"))
    perSupp.join(perOrder, "l_orderkey")
      .filter(col("has_late") === 1 && col("n_supp") >= 2 && col("n_late") === 1)
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(s, dir)),
            col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(desc("numwait"), col("s_name"))
      .limit(20)
  }

  val waitingSuppliersSql: String =
    """WITH f AS (
      |  SELECT l.l_orderkey, l.l_suppkey,
      |         CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      |              THEN 1 ELSE 0 END AS late
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |), ps AS (
      |  SELECT l_orderkey, l_suppkey, MAX(late) AS has_late
      |  FROM f GROUP BY 1, 2
      |), po AS (
      |  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_supp,
      |         SUM(has_late) AS n_late
      |  FROM ps GROUP BY 1)
      |SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM ps
      |JOIN po USING (l_orderkey)
      |JOIN supplier s ON ps.l_suppkey = s.s_suppkey
      |WHERE ps.has_late = 1 AND po.n_supp >= 2 AND po.n_late = 1
      |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  /** j15 — PIVOT: the nation × order-year revenue matrix, the wide
    * cross-tab report shape (ClickHouse dashboards build these with
    * sumIf columns; ANSI SQL with FILTER/CASE conditional aggregates).
    *
    * The pivot values are EXPLICIT: `pivot(col, values)` with the year
    * list spelled out compiles to one two-phase aggregate, whereas the
    * values-less overload first runs a separate distinct-scan job over
    * the fact table to discover the columns — a full extra pass at
    * 100 TB, and a nondeterministic schema besides. Fact-fact join
    * shuffles once on orderkey; customer and nation broadcast; the
    * pivot aggregate is partial-agg friendly (per-year sums combine
    * map-side). */
  def revenuePivot(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir)
              .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)
              .select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)
              .select(col("n_nationkey"), col("n_name"))),
            col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), year(col("o_orderdate")).as("yr"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    rev.groupBy(col("n_name"))
      .pivot("yr", PivotYears)
      .agg(round(sum(col("rev")), 2))
      .orderBy("n_name")
  }

  private val PivotYears: Seq[Int] = 1992 to 1998

  val revenuePivotSql: String = {
    val cols = PivotYears.map(y =>
      s"""round(SUM(CASE WHEN yr = $y THEN rev END), 2) AS "$y"""").mkString(",\n|  ")
    s"""WITH rev AS (
       |  SELECT n.n_name,
       |         CAST(year(o.o_orderdate) AS INT) AS yr,
       |         l.l_extendedprice * (1 - l.l_discount) AS rev
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN nation n ON c.c_nationkey = n.n_nationkey)
       |SELECT n_name,
       |  $cols
       |FROM rev GROUP BY n_name ORDER BY n_name""".stripMargin
  }

  // ---------------------------------------------------------------------
  // j16 — POINT-IN-TIME dimension lookup: enrich every order with the
  // customer's priority tier in effect AT order time, read from the s27
  // SCD2 history, then roll revenue up by (tier, order year). The
  // temporal predicate rides a plain equi-join on the customer key (per-
  // key version counts are bounded, so the interval filter after the
  // hash join is cheap) — never a range-only join, which would plan as a
  // nested loop over the fact table. This is the "was the customer
  // premium when they ordered" shape every warehouse with SCD2
  // dimensions answers daily.
  // ---------------------------------------------------------------------
  def asofDimension(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val obs = orders
      .groupBy(col("o_custkey").as("key"), col("o_orderdate").as("ts"))
      .agg(min(col("o_orderpriority")).as("attr"))
    val hist = graft.store.Scd2.fromObservations(obs).localCheckpoint()
    orders.join(hist,
        orders("o_custkey") === hist("key") &&
        orders("o_orderdate") >= hist("valid_from") &&
        (hist("valid_to").isNull || orders("o_orderdate") < hist("valid_to")))
      .groupBy(col("attr").as("tier"), year(col("o_orderdate")).as("yr"))
      // money sums as DECIMAL: double addition is association-sensitive
      // and these groups are big enough (~2k orders) for the partial-agg
      // order to move the 9th significant digit — decimal is exact and
      // order-independent, converted to double once at the end
      .agg(count(lit(1)).as("n_orders"),
           sum(col("o_totalprice").cast("decimal(18,2)"))
             .cast("double").as("revenue"))
      .orderBy("tier", "yr")
  }

  /** Oracle rebuilds the same history from scratch (the s27 CTE chain)
    * and applies the identical interval predicate. */
  val asofDimensionSql: String =
    s"""WITH obs AS (
       |  SELECT o_custkey AS key, o_orderdate AS ts, min(o_orderpriority) AS attr
       |  FROM orders GROUP BY 1, 2),
       |seq AS (SELECT *, lag(attr) OVER (PARTITION BY key ORDER BY ts) AS prev FROM obs),
       |runs AS (
       |  SELECT *, CAST(sum(CASE WHEN prev IS NULL OR prev <> attr THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY key ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
       |  FROM seq),
       |ver AS (SELECT key, run, min(attr) AS attr, min(ts) AS valid_from
       |        FROM runs GROUP BY 1, 2),
       |hist AS (
       |  SELECT key, attr, valid_from,
       |         lead(valid_from) OVER (PARTITION BY key ORDER BY valid_from) AS valid_to
       |  FROM ver)
       |SELECT h.attr AS tier, CAST(year(o.o_orderdate) AS INT) AS yr,
       |       CAST(count(*) AS BIGINT) AS n_orders,
       |       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
       |FROM orders o JOIN hist h
       |  ON o.o_custkey = h.key
       | AND o.o_orderdate >= h.valid_from
       | AND (h.valid_to IS NULL OR o.o_orderdate < h.valid_to)
       |GROUP BY 1, 2 ORDER BY tier, yr""".stripMargin

  // ---------------------------------------------------------------------
  // j17 — TPC-H Q17 shape (VERDICT r19 task 6): small-quantity revenue
  // behind a CORRELATED SCALAR SUBQUERY against a per-group average —
  // the most common analyst shape the j-family lacked. The oracle
  // states it correlated (DuckDB decorrelates it); the Spark side IS
  // the decorrelated plan an optimizer should reach: the brand/size
  // part filter BROADCASTS onto lineitem, the per-part avg is ONE
  // partial-agg'd aggregate over the same filtered join (part-count
  // rows — broadcast back), and the threshold compare is row-local.
  // No cartesian anywhere (PlanSpec pins it). The j11 rounding
  // discipline: the avg is round(…, 6) on both engines before the
  // 0.2× compare, so partial-agg summation order can never flip a
  // boundary row; revenue sums as DECIMAL (the j16 precedent).
  // ---------------------------------------------------------------------
  def smallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
      .filter(col("p_brand") === "Brand#12" && col("p_size") <= 25)
      .select(col("p_partkey"))
    val li = Tables.lineitem(s, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val avgQ = li.groupBy(col("l_partkey"))
      .agg(round(avg(col("l_quantity")), 6).as("avg_qty"))
    li.join(broadcast(avgQ), "l_partkey")
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)"))
               .cast("double") / 7.0, 2).as("avg_yearly"),
           count(lit(1)).as("n_small_lines"))
  }

  val smallQtyRevenueSql: String =
    """SELECT round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2)
      |         AS avg_yearly,
      |       CAST(COUNT(*) AS BIGINT) AS n_small_lines
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE p.p_brand = 'Brand#12' AND p.p_size <= 25
      |  AND l.l_quantity < 0.2 * (
      |    SELECT round(AVG(l2.l_quantity), 6) FROM lineitem l2
      |    WHERE l2.l_partkey = p.p_partkey)""".stripMargin

  // ---------------------------------------------------------------------
  // j18 — TPC-H Q20 shape: the NESTED SEMI-JOIN chain — suppliers
  // (outer semi) who dominate a part's annual volume (inner correlated
  // share test) for a name-filtered part family (innermost semi). This
  // corpus has no partsupp table, so lineitem's 1996 shipments stand in
  // for availqty — same chain depth, same decorrelation demands: the
  // part filter broadcasts onto the date-pruned lineitem scan, the
  // per-(part,supplier) and per-part sums are two partial-agg'd
  // aggregates over that one join (part×supplier-bounded rows), the
  // share compare is row-local after a broadcast join, and the
  // survivor supplier ids reach supplier as a LEFT SEMI — never a
  // cartesian, never a per-row subquery loop. Quantities are
  // integer-valued doubles, so every sum and the 0.5× compare are
  // exact on both engines.
  // ---------------------------------------------------------------------
  def volumeLeaders(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
      .filter(col("p_name").startsWith("red "))
      .select(col("p_partkey"))
    val li96 = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
              col("l_shipdate") < lit("1997-01-01"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
    val perSupp = li96.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("qty"))
    val perPart = perSupp.groupBy(col("l_partkey"))
      .agg(sum(col("qty")).as("tot"))
    val heavy = perSupp.join(broadcast(perPart), "l_partkey")
      .filter(col("qty") > lit(0.5) * col("tot"))
      .select(col("l_suppkey")).distinct()
    Tables.supplier(s, dir)
      .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy("s_name")
  }

  val volumeLeadersSql: String =
    """WITH l96 AS (
      |  SELECT l_partkey, l_suppkey, l_quantity FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red %')
      |), ps AS (
      |  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
      |  FROM l96 GROUP BY 1, 2)
      |SELECT s.s_name, s.s_acctbal
      |FROM supplier s
      |WHERE s.s_suppkey IN (
      |  SELECT ps.l_suppkey FROM ps
      |  WHERE ps.qty > 0.5 * (
      |    SELECT SUM(ps2.qty) FROM ps ps2
      |    WHERE ps2.l_partkey = ps.l_partkey))
      |ORDER BY s.s_name""".stripMargin

  val all: Seq[(String, ((SparkSession, String) => DataFrame, Option[String]))] = Seq(
    "j01_pricing_summary"   -> ((pricingSummary _, Some(pricingSummarySql))),
    "j02_revenue_by_nation" -> ((revenueByNation _, Some(revenueByNationSql))),
    "j03_top_customers"     -> ((topCustomers _, Some(topCustomersSql))),
    "j04_order_priority"    -> ((orderPriority _, Some(orderPrioritySql))),
    "j05_parts_by_supplier" -> ((partsBySupplierNation _, Some(partsBySupplierNationSql))),
    "j06_customers_no_orders" -> ((customersWithoutOrders _, Some(customersWithoutOrdersSql))),
    "j07_order_count_dist"  -> ((orderCountDistribution _, Some(orderCountDistributionSql))),
    "j08_pricing_rollup"    -> ((pricingRollup _, Some(pricingRollupSql))),
    "j09_range_join"        -> ((shipmentsInWindow _, Some(shipmentsInWindowSql))),
    "j10_set_ops"           -> ((supplierSetOps _, Some(supplierSetOpsSql))),
    "j11_correlated_subq"   -> ((bigSpenders _, Some(bigSpendersSql))),
    "j12_moving_avg"        -> ((dailyMovingAvg _, Some(dailyMovingAvgSql))),
    "j13_large_volume"      -> ((largeVolumeOrders(_, _), Some(largeVolumeOrdersSql))),
    "j14_waiting_suppliers" -> ((waitingSuppliers _, Some(waitingSuppliersSql))),
    "j15_revenue_pivot"     -> ((revenuePivot _, Some(revenuePivotSql))),
    "j16_asof_dimension"    -> ((asofDimension _, Some(asofDimensionSql))),
    "j17_small_qty_revenue" -> ((smallQtyRevenue _, Some(smallQtyRevenueSql))),
    "j18_volume_leaders"    -> ((volumeLeaders _, Some(volumeLeadersSql))),
  )
}
