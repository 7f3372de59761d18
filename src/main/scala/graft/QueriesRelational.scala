package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.{Joins, Keyed, Relational, Windows}
import graft.functions.{DedupFns, Fence, Multimodal, TextFns, VectorFns}

/** The RELATIONAL / TPC-H + lakehouse family (§2 rows 19-25x, 3b-3d): the 22 TPC-H shapes, JSON extraction, zonemap/Z-order/compaction, SCD2, basket mining.
  *
  * Round-17 split of Queries.scala (VERDICT r16 item 7), behavior-
  * frozen: the SAME GraftQuery values, registered by the SAME names
  * in Queries.all; helpers stay on the Queries object (reached via
  * the self-type), and every member is a lazy val so cross-file
  * initialization order cannot bite.
  */
private[graft] trait QueriesRelational { this: Queries.type =>

  // =======================================================================
  // Relational / analytics core (rows 19-22)
  // =======================================================================

  private[graft] lazy val q1Pricing = GraftQuery(
    "q1_pricing",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= ntz("2001-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sumDec(col("l_extendedprice")).as("sum_base_price"),
          round(sum(discPrice), 2).cast("double").as("sum_disc_price"),
          round(sum(charge), 2).cast("double").as("sum_charge"),
          sum(round(col("l_discount") * 100).cast("long")).as("__sum_disc_e2"),
          count(lit(1)).as("n"))
        .withColumn("avg_qty_e4", expr("(sum_qty * 10000) div n"))
        .withColumn("avg_disc_e6", expr("(__sum_disc_e2 * 10000) div n"))
        .drop("__sum_disc_e2"),
    Some("""SELECT l_returnflag, l_linestatus,
              CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
              CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(12,8))), 2) AS DOUBLE) AS sum_disc_price,
              CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST((1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(12,8))), 2) AS DOUBLE) AS sum_charge,
              CAST(count(*) AS BIGINT) AS n,
              CAST((sum(CAST(l_quantity AS BIGINT)) * 10000) // count(*) AS BIGINT) AS avg_qty_e4,
              CAST((sum(CAST(round(l_discount * 100) AS BIGINT)) * 10000) // count(*) AS BIGINT) AS avg_disc_e6
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
            GROUP BY 1, 2"""))


  private[graft] lazy val q3Topk = GraftQuery(
    "q3_topk",
    (s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < ntz("1998-01-01 00:00:00"))
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > ntz("1998-01-01 00:00:00"))
      // reduce orders by the broadcast dim BEFORE the fact join: the
      // orders side of the big l⋈o shuffle shrinks by the segment's
      // selectivity (~5×) — same rows, better shape at scale
      val oc = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      l.join(oc, l("l_orderkey") === o("o_orderkey"))
        .groupBy(l("l_orderkey"), o("o_orderdate"), o("o_orderpriority"))
        .agg(round(sum(discPrice), 2).cast("double").as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_d"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""SELECT l_orderkey,
              CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(12,8))), 2) AS DOUBLE) AS revenue,
              strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_d, o_orderpriority
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
              AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey LIMIT 10"""))


  /** TPC-H Q14 shape: promo revenue share for one month — conditional
    * aggregation over the lineitem ⋈ part join (part broadcasts; the
    * shipdate filter pushes to the fact scan). The share is emitted as
    * exact integer milli-units (cents div cents) alongside the decimal
    * sums, so no cross-engine division rounding exists.
    */
  private[graft] lazy val q14Promo = GraftQuery(
    "q14_promo",
    (s, dir) => {
      val p = t(s, dir, "part")
        .select(col("p_partkey"), (col("p_type") === "PROMO").as("__promo"))
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ntz("1998-01-01 00:00:00") &&
          col("l_shipdate") < ntz("1998-02-01 00:00:00"))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg(
          round(coalesce(sum(when(col("__promo"), discPrice)), lit(0)), 2)
            .cast(dec).as("__np"),
          round(sum(discPrice), 2).cast(dec).as("__nt"))
        .select(col("__np").cast("double").as("sum_promo"),
          col("__nt").cast("double").as("sum_total"),
          expr("(CAST(__np * 100 AS BIGINT) * 1000) div CAST(__nt * 100 AS BIGINT)")
            .as("promo_milli"))
    },
    Some("""WITH x AS (
              SELECT
                CAST(round(sum(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(12,8))
                  ELSE 0 END), 2) AS DECIMAL(18,2)) AS np,
                CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(12,8))), 2) AS DECIMAL(18,2)) AS nt
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
                AND l_shipdate < TIMESTAMP '1998-02-01 00:00:00')
            SELECT CAST(np AS DOUBLE) AS sum_promo, CAST(nt AS DOUBLE) AS sum_total,
              CAST(CAST(np * 100 AS BIGINT) * 1000 // CAST(nt * 100 AS BIGINT) AS BIGINT) AS promo_milli
            FROM x"""))


  private[graft] lazy val q5Region = GraftQuery(
    "q5_region",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= ntz("1996-01-01 00:00:00") &&
          col("o_orderdate") < ntz("1997-01-01 00:00:00"))
      val c = t(s, dir, "customer")
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      // the one fact-fact join: shuffle-hash with the build on the
      // year-filtered orders side — lineitem (the big stream) is never
      // sorted, which a sort-merge plan would charge at every scale
      l.join(o.hint("shuffle_hash"), l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey") && c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(discPrice), 2).cast("double").as("revenue"))
    },
    Some("""SELECT n_name,
              CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(12,8))), 2) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY n_name"""))


  /** TPC-H Q2 shape: cheapest supplier per (filtered) part — the
    * argmin-per-group join pattern. The argmin is `min(struct(cost,
    * suppkey))`: lexicographic struct ordering keeps it deterministic
    * AND partial-agg friendly (map-side combine before one shuffle on
    * partkey — a window row_number would sort every group instead).
    * Unit cost is exact integer cents: decimal-cast price × 100 div
    * quantity. Part filter and supplier lookup are broadcast joins.
    */
  private[graft] lazy val q2Mincost = GraftQuery(
    "q2_mincost",
    (s, dir) => {
      val p = t(s, dir, "part").filter(col("p_size") <= 10).select(col("p_partkey"))
      val su = t(s, dir, "supplier")
      t(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"),
          struct(
            expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint) div cast(l_quantity as bigint)")
              .as("unit_cents"),
            col("l_suppkey").as("suppkey")).as("m"))
        .groupBy(col("l_partkey"))
        .agg(min(col("m")).as("m"))
        .select(col("l_partkey").as("p_partkey"),
          col("m.unit_cents").as("unit_cents"), col("m.suppkey").as("suppkey"))
        .join(broadcast(su), col("suppkey") === col("s_suppkey"))
        .select(col("p_partkey"), col("s_name"), col("unit_cents"))
    },
    Some("""WITH u AS (SELECT l_partkey, l_suppkey,
              CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) // CAST(l_quantity AS BIGINT) AS unit_cents
              FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_size <= 10),
            r AS (SELECT l_partkey AS p_partkey, l_suppkey AS suppkey, unit_cents,
                    row_number() OVER (PARTITION BY l_partkey ORDER BY unit_cents, l_suppkey) AS rn
                  FROM u)
            SELECT p_partkey, s_name, unit_cents
            FROM r JOIN supplier ON suppkey = s_suppkey WHERE rn = 1"""))


  /** TPC-H Q18 shape: large-volume orders — aggregate lineitem per
    * order, keep totals over a threshold, join back to orders and the
    * broadcast customer dim. The quantity agg and the orders join share
    * the orderkey, so AQE plans ONE shuffle for both; total quantity is
    * an exact BIGINT (quantities are integral), the order price exact
    * integer cents.
    */
  private[graft] lazy val q18Bigorders = GraftQuery(
    "q18_bigorders",
    (s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
        .filter(col("total_qty") > 150)
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_custkey"), col("o_orderkey"), col("total_qty"),
          expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)").as("price_cents"))
    },
    Some("""SELECT c_name, o_custkey, o_orderkey, CAST(total_qty AS BIGINT) AS total_qty,
              CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents
            FROM (SELECT l_orderkey, sum(CAST(l_quantity AS BIGINT)) AS total_qty
                  FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS BIGINT)) > 150) b
            JOIN orders ON o_orderkey = b.l_orderkey
            JOIN customer ON o_custkey = c_custkey"""))


  /** TPC-H Q22 shape: churned high-value customers — above-average
    * balance (scalar subquery) with no order since a cutoff (anti
    * join), aggregated per nation. The scalar average rides a 1-row
    * broadcast (Spark's scalar-attach shape, see §5); the LEFT ANTI
    * join prunes the orders side to custkeys only and the date filter
    * pushes to the orders scan. Balances are exact integer cents and
    * the average an exact floor division.
    */
  private[graft] lazy val q22Churn = GraftQuery(
    "q22_churn",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val bal = expr("cast(cast(c_acctbal as decimal(18,2)) * 100 as bigint)")
      val avgPos = c.filter(col("c_acctbal") > 0)
        .agg(expr("sum(cast(cast(c_acctbal as decimal(18,2)) * 100 as bigint)) div count(1)")
          .as("__avg_cents"))
      val recent = t(s, dir, "orders")
        .filter(col("o_orderdate") >= ntz("2001-01-01 00:00:00"))
        .select(col("o_custkey"))
      c.select(col("c_custkey"), col("c_nationkey").cast("long").as("nationkey"),
          bal.as("__bal"))
        .crossJoin(broadcast(avgPos))
        .filter(col("__bal") > col("__avg_cents"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("nationkey"))
        .agg(count(lit(1)).as("n_cust"), sum(col("__bal")).as("sum_cents"))
    },
    Some("""WITH a AS (SELECT sum(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) // count(*) AS avg_cents
              FROM customer WHERE c_acctbal > 0)
            SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
              CAST(count(*) AS BIGINT) AS n_cust,
              CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents
            FROM customer, a
            WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) > a.avg_cents
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
            GROUP BY c_nationkey"""))


  /** TPC-H Q4 shape: orders with at least one returned line, counted
    * per priority — the EXISTS / LEFT SEMI join pattern (Q22 covers the
    * anti side; this is its complement). The semi join needs only
    * `l_orderkey` from the probe side after the returnflag filter
    * pushes to the lineitem scan, duplicates on the lineitem side never
    * multiply rows (semi short-circuits on first match), and both sides
    * hash-partition on the shared orderkey.
    */
  private[graft] lazy val q4Semi = GraftQuery(
    "q4_semi",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= ntz("1996-01-01 00:00:00") &&
          col("o_orderdate") < ntz("1996-07-01 00:00:00"))
      val ret = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"))
      o.join(ret, o("o_orderkey") === ret("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
    },
    Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
            GROUP BY o_orderpriority"""))


  /** TPC-H Q6 shape: the pure scan→filter→agg forecast query — zero
    * joins, zero shuffles past the partial agg. Every predicate
    * (shipdate range, discount band, quantity cap) is a parquet
    * pushdown (PlanSpec asserts PushedFilters), so at 100 TB the scan
    * skips row groups on shipdate min/max stats and the agg reduces
    * map-side to one row per task. Revenue is the exact decimal
    * product sum; the discount factor goes through DECIMAL(12,8) like
    * every money expression here (SURVEY §4).
    */
  private[graft] lazy val q6Forecast = GraftQuery(
    "q6_forecast",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ntz("1997-01-01 00:00:00") &&
          col("l_shipdate") < ntz("1998-01-01 00:00:00") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(
          round(sum(col("l_extendedprice").cast(dec) *
            col("l_discount").cast(DecimalType(12, 8))), 2).cast("double").as("revenue"),
          count(lit(1)).as("n_lines")),
    Some("""SELECT
              CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(12,8))), 2) AS DOUBLE) AS revenue,
              CAST(count(*) AS BIGINT) AS n_lines
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24"""))


  /** TPC-H Q10 shape: top-20 customers by revenue lost to returns in a
    * quarter. lineitem(returnflag pushed) ⋈ orders(date pushed) is the
    * one big shuffle (shared orderkey partitioning); customer and
    * nation broadcast. The final top-20 is TakeOrderedAndProject —
    * never a global sort — with c_custkey as the deterministic
    * tiebreak. Account balance rides as exact integer cents inside the
    * group key (functionally dependent on c_custkey, so the group
    * count is unchanged).
    */
  private[graft] lazy val q10Returns = GraftQuery(
    "q10_returns",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= ntz("1997-01-01 00:00:00") &&
          col("o_orderdate") < ntz("1997-04-01 00:00:00"))
      val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"),
          expr("cast(cast(c_acctbal as decimal(18,2)) * 100 as bigint)").as("acctbal_cents"))
        .agg(round(sum(discPrice), 2).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name, n_name,
              CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS acctbal_cents,
              CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(12,8))), 2) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY c_custkey, c_name, n_name, acctbal_cents
            ORDER BY revenue DESC, c_custkey LIMIT 20"""))


  /** TPC-H Q12 shape re-keyed to this schema (no l_shipmode column):
    * per returnflag class, how many lines belong to urgent vs
    * non-urgent orders in a ship year. The canonical big-big join +
    * conditional-aggregation pattern: lineitem ⋈ orders shuffle on the
    * shared orderkey (orders is NOT broadcast — at 100 TB it is a fact
    * table), the urgency CASE folds into the aggregate so one scan
    * serves both counters, and the shipdate filter pushes down.
    */
  private[graft] lazy val q12Priority = GraftQuery(
    "q12_priority",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ntz("1997-01-01 00:00:00") &&
          col("l_shipdate") < ntz("1998-01-01 00:00:00"))
      val o = t(s, dir, "orders")
      val urgent = col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH"
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(urgent, lit(1L)).otherwise(lit(0L))).as("high_line_count"),
          sum(when(urgent, lit(0L)).otherwise(lit(1L))).as("low_line_count"))
    },
    Some("""SELECT l_returnflag,
              CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
              CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY l_returnflag"""))


  /** TPC-H Q19 shape: discounted revenue for three OR'd
    * (type, size-band, quantity-band) brackets. Catalyst extracts the
    * common `l_partkey = p_partkey` equi-conjunct for the broadcast
    * hash join and keeps the disjunction as the join residual; the
    * quantity bound common to all brackets (l_quantity <= 32) is
    * OR-factored and pushed to the lineitem scan. The disjunctive-
    * predicate pattern is the point: at 100 TB the fact scan must not
    * evaluate three bracket predicates row-by-row pre-join — the resid
    * runs only on rows surviving the hash probe.
    */
  private[graft] lazy val q19Brackets = GraftQuery(
    "q19_brackets",
    (s, dir) => {
      val p = t(s, dir, "part")
      val l = t(s, dir, "lineitem")
      val bracket =
        (col("p_type") === "PROMO" && col("p_size").between(1, 10) && col("l_quantity").between(1, 11)) ||
        (col("p_type") === "SMALL" && col("p_size").between(1, 20) && col("l_quantity").between(10, 20)) ||
        (col("p_type") === "LARGE" && col("p_size").between(1, 30) && col("l_quantity").between(20, 32))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey") && bracket)
        .agg(round(sum(discPrice), 2).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    },
    Some("""SELECT
              CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(12,8))), 2) AS DOUBLE) AS revenue,
              CAST(count(*) AS BIGINT) AS n_lines
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_type = 'PROMO' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
               OR (p_type = 'SMALL' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
               OR (p_type = 'LARGE' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 32)"""))


  /** TPC-H Q7 shape: bilateral trade-lane revenue by year between two
    * nations. Supplier and customer nation attach via broadcast dims;
    * the (n1,n2)∈{(A,B),(B,A)} disjunction is a residual on the
    * broadcast probe, and the only big shuffle is l⋈o on the shared
    * orderkey. The year comes from the NTZ shipdate (identical
    * date_part in both engines), revenue is the exact decimal sum.
    */
  private[graft] lazy val q7Trade = GraftQuery(
    "q7_trade",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val su = t(s, dir, "supplier")
      val n1 = t(s, dir, "nation").select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation").select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      val lanes = (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n1), su("s_nationkey") === col("sk"))
        .join(broadcast(n2), c("c_nationkey") === col("ck"))
        .filter(lanes)
        .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(discPrice), 2).cast("double").as("revenue"))
    },
    Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              CAST(year(l_shipdate) AS INTEGER) AS l_year,
              CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(12,8))), 2) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
            GROUP BY 1, 2, 3"""))


  /** TPC-H Q15 shape: the top-revenue supplier(s) for a quarter — the
    * scalar-max pattern. The per-supplier revenue aggregates once; its
    * max rides a 1-row broadcast (Spark's scalar-subquery shape, §5)
    * and the equality filter re-reads the SAME aggregated subtree
    * (runtime stage reuse), so the fact scans once per exchange, never
    * per candidate. Revenue is exact integer cents end to end.
    */
  private[graft] lazy val q15TopSupp = GraftQuery(
    "q15_topsupp",
    (s, dir) => {
      // The explicit l_suppkey IS NOT NULL mirrors the constraint the
      // optimizer infers on the MAIN branch from the supplier equi-join
      // — without it the two rev branches' scans differ by exactly that
      // inferred filter, are no longer canonically equal, and the fact
      // scans twice instead of riding one reused exchange (PlanSpec).
      // Semantics unchanged: an inner join on l_suppkey drops null keys
      // anyway, and a null key can't carry the max revenue group here.
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ntz("1997-01-01 00:00:00") &&
          col("l_shipdate") < ntz("1997-04-01 00:00:00") &&
          col("l_suppkey").isNotNull)
        .groupBy(col("l_suppkey"))
        .agg(sum(expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)"))
          .as("rev_cents"))
      val mx = rev.agg(max(col("rev_cents")).as("mx"))
      rev.crossJoin(broadcast(mx))
        .filter(col("rev_cents") === col("mx"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("rev_cents"))
    },
    Some("""WITH rev AS (
              SELECT l_suppkey, sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS rev_cents
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
                AND l_suppkey IS NOT NULL
              GROUP BY l_suppkey)
            SELECT s_suppkey, s_name, CAST(rev_cents AS BIGINT) AS rev_cents
            FROM rev JOIN supplier ON l_suppkey = s_suppkey
            WHERE rev_cents = (SELECT max(rev_cents) FROM rev)"""))


  /** TPC-H Q17 shape: revenue from small-quantity lines of one part
    * type — the correlated-scalar-subquery (per-part 0.2×avg quantity
    * threshold) re-expressed as an aggregate + same-key join. The
    * filtered fact joins its own per-partkey average ON THE KEY THE
    * AVERAGE GROUPED BY, so one partkey exchange serves both; the
    * threshold compare is exact integer cross-multiplication
    * (5·qty·n < Σqty ⇔ qty < 0.2·avg), no float division anywhere.
    */
  private[graft] lazy val q17SmallQty = GraftQuery(
    "q17_smallqty",
    (s, dir) => {
      val p = t(s, dir, "part").filter(col("p_type") === "PROMO").select(col("p_partkey"))
      // the per-part average rides UNORDERED windows over the SAME
      // l_partkey partitioning the rows already need — one scan, one
      // exchange, no sort beyond the partition key. The
      // aggregate-joined-back-on-its-own-key form scanned the fact
      // twice (the agg branch's partial aggregate de-canonicalized the
      // exchange — PlanAudit).
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_partkey")
      t(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"),
          expr("cast(cast(l_quantity as decimal(18,3)) * 1000 as bigint)").as("qty_milli"),
          expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)").as("price_cents"))
        .withColumn("sq", sum(col("qty_milli")).over(w))
        .withColumn("n", count(lit(1)).over(w))
        .filter(col("qty_milli") * 5 * col("n") < col("sq"))
        .agg(coalesce(sum(col("price_cents")), lit(0L)).as("revenue_cents"),
          count(lit(1)).as("n_lines"))
    },
    Some("""WITH fl AS (
              SELECT l_partkey,
                CAST(CAST(l_quantity AS DECIMAL(18,3)) * 1000 AS BIGINT) AS qty_milli,
                CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_type = 'PROMO'),
            ag AS (SELECT l_partkey, sum(qty_milli) AS sq, count(*) AS n FROM fl GROUP BY 1)
            SELECT CAST(coalesce(sum(price_cents), 0) AS BIGINT) AS revenue_cents,
              CAST(count(*) AS BIGINT) AS n_lines
            FROM fl JOIN ag USING (l_partkey)
            WHERE fl.qty_milli * 5 * ag.n < ag.sq"""))


  /** TPC-H Q8 shape: one supplier nation's market share, per year, of
    * the revenue generated by ASIA-region customers — the
    * ratio-of-conditional-sums pattern. Both the numerator and the
    * denominator fold into ONE aggregation over the single l⋈o
    * shuffle (dims broadcast); the share is an exact integer division
    * of cents (milli-units), so no cross-engine float ratio exists.
    */
  private[graft] lazy val q8Share = GraftQuery(
    "q8_share",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val c = t(s, dir, "customer")
        .join(broadcast(n.select(col("n_nationkey").as("cnk"), col("n_regionkey"))),
          col("c_nationkey") === col("cnk"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val su = t(s, dir, "supplier")
        .join(broadcast(n.select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("snk"))
        .select(col("s_suppkey"), col("supp_nation"))
      val cents = expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === col("c_custkey"))
        .join(broadcast(su), l("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(sum(cents).as("total_cents"),
          sum(when(col("supp_nation") === "NATION_2", cents).otherwise(lit(0L)))
            .as("nation_cents"))
        .select(col("o_year"), col("total_cents"), col("nation_cents"),
          expr("nation_cents * 1000 div total_cents").as("share_milli"))
    },
    Some("""WITH x AS (
              SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
                n2.n_name AS supp_nation
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation n1 ON c_nationkey = n1.n_nationkey
              JOIN region ON n1.n_regionkey = r_regionkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation n2 ON s_nationkey = n2.n_nationkey
              WHERE r_name = 'ASIA')
            SELECT o_year, CAST(sum(cents) AS BIGINT) AS total_cents,
              CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN cents ELSE 0 END) AS BIGINT) AS nation_cents,
              CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN cents ELSE 0 END) * 1000
                   // sum(cents) AS BIGINT) AS share_milli
            FROM x GROUP BY o_year"""))


  /** TPC-H Q21 shape: suppliers SOLELY responsible for an order's
    * returned lines — the semi/anti composition. The distinct
    * (orderkey, suppkey) return pairs anti-join themselves on the SAME
    * orderkey with a suppkey-inequality residual ("no OTHER supplier
    * returned in this order"): Catalyst extracts the orderkey
    * equi-conjunct so the anti join stays hash-partitioned, and the
    * inequality runs as the join residual — never a nested loop. The
    * blame count then aggregates on suppkey and the name attaches via
    * broadcast.
    */
  private[graft] lazy val q21Blame = GraftQuery(
    "q21_blame",
    (s, dir) => {
      // "sole supplier of an order's returns" = orders whose DISTINCT
      // returned-supplier count is one — a per-order property, so the
      // whole check rides ONE fenced l_orderkey repartition: the
      // (orderkey, suppkey) dedup aggregates on it without a second
      // exchange (clustering by orderkey already co-locates every
      // (orderkey, suppkey) pair), the solo test is an unordered count
      // window over the same partitioning, and only the final
      // per-supplier rollup re-shuffles. The previous self-anti-join
      // scanned lineitem twice AND broadcast a fact-derived frame —
      // the shape AQE happily builds at bench scale and a cluster
      // cannot at 100 TB (PlanSpec pins the single scan).
      import org.apache.spark.sql.expressions.Window
      t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_suppkey"))
        .repartition(col("l_orderkey"))
        .dropDuplicates("l_orderkey", "l_suppkey")
        .withColumn("__nsupp",
          count(lit(1)).over(Window.partitionBy("l_orderkey")))
        .filter(col("__nsupp") === 1)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_solo_orders"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_solo_orders"))
        .orderBy(col("n_solo_orders").desc, col("s_suppkey"))
        .limit(10)
    },
    Some("""WITH pairs AS (
              SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R')
            SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS n_solo_orders
            FROM pairs JOIN supplier ON l_suppkey = s_suppkey
            WHERE NOT EXISTS (SELECT 1 FROM pairs o
                              WHERE o.l_orderkey = pairs.l_orderkey
                                AND o.l_suppkey <> pairs.l_suppkey)
            GROUP BY s_suppkey, s_name
            ORDER BY n_solo_orders DESC, s_suppkey LIMIT 10"""))


  /** TPC-H Q20 shape: suppliers shipping an outsized share of one part
    * type — excess = more than 10% above the average per-supplier
    * volume. The per-supplier aggregate computes once; the corpus
    * average rides a 1-row broadcast (the scalar-attach shape, §5) and
    * the threshold is an exact integer cross-multiplication
    * (10·sq·n_supp > 11·Σ), so no division exists on either engine.
    */
  private[graft] lazy val q20Excess = GraftQuery(
    "q20_excess",
    (s, dir) => {
      val p = t(s, dir, "part").filter(col("p_type") === "PROMO").select(col("p_partkey"))
      // explicit isNotNull mirrors the constraint the supplier join
      // infers on the MAIN branch only — without it the scalar-total
      // branch's scan lacks that filter, the two per-supplier
      // exchanges de-canonicalize, and the fact scans twice (the q15
      // disease; PlanSpec pins the reuse)
      val perSupp = t(s, dir, "lineitem")
        .filter(col("l_suppkey").isNotNull)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"))
        .agg(sum(expr("cast(cast(l_quantity as decimal(18,3)) * 1000 as bigint)")).as("sq"))
      val tot = perSupp.agg(sum(col("sq")).as("total"), count(lit(1)).as("n_supp"))
      perSupp.crossJoin(broadcast(tot))
        .filter(col("sq") * col("n_supp") * 10 > col("total") * 11)
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("sq").as("qty_milli"))
    },
    Some("""WITH per AS (
              SELECT l_suppkey, sum(CAST(CAST(l_quantity AS DECIMAL(18,3)) * 1000 AS BIGINT)) AS sq
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_type = 'PROMO' AND l_suppkey IS NOT NULL GROUP BY 1),
            tot AS (SELECT sum(sq) AS total, count(*) AS n_supp FROM per)
            SELECT s_suppkey, s_name, CAST(sq AS BIGINT) AS qty_milli
            FROM per, tot
            JOIN supplier ON l_suppkey = s_suppkey
            WHERE sq * n_supp * 10 > total * 11"""))


  /** TPC-H Q13 shape: the customer order-count distribution — LEFT
    * OUTER join (zero-order customers must appear with c_count = 0)
    * feeding two stacked aggregations. The join and the per-customer
    * count share the custkey hash partitioning (one exchange serves
    * both); the second agg groups the tiny (c_count, custdist)
    * histogram. count(o_orderkey) counts only matched rows — the LEFT
    * join's null rows fall out of the count exactly as in SQL.
    */
  private[graft] lazy val q13Custdist = GraftQuery(
    "q13_custdist",
    (s, dir) => {
      val c = t(s, dir, "customer").select(col("c_custkey"))
      val o = t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },
    Some("""SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
            FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
                  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
                  GROUP BY c_custkey)
            GROUP BY c_count"""))


  /** TPC-H Q16 shape re-keyed to this schema (no partsupp table):
    * distinct suppliers that shipped each part type, excluding
    * suppliers in bad standing (negative balance) — the NOT IN → LEFT
    * ANTI join + two-phase exact distinct aggregation pattern. The
    * anti join's build side is the tiny filtered supplier set; the
    * distinct agg dedups (p_type, suppkey) map-side before the one
    * count shuffle.
    */
  private[graft] lazy val q16Suppliers = GraftQuery(
    "q16_suppliers",
    (s, dir) => {
      val bad = t(s, dir, "supplier").filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      val p = t(s, dir, "part").select(col("p_partkey"), col("p_type"))
      val l = t(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .join(broadcast(bad), l("l_suppkey") === bad("s_suppkey"), "left_anti")
        .groupBy(col("p_type"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    },
    Some("""SELECT p_type, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY p_type"""))


  private[graft] lazy val qJsonExtract = GraftQuery(
    "q_json_extract",
    (s, dir) =>
      events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), sumDec(col("value")).as("sum_value")),
    Some(s"""SELECT json_extract_string(props, '$$.k')::BIGINT % 10 AS k_bucket,
             $nSql AS n, $sumValSql AS sum_value
             FROM events GROUP BY 1"""))


  /** Compaction planning: per source, how many target-size output
    * files a rewrite should produce — the small-files operational
    * answer (file counts, exact ceil division) a 100 TB table needs
    * before every write. One aggregation; everything else is integer
    * arithmetic on the per-source totals.
    */
  private[graft] lazy val qCompactionPlan = GraftQuery(
    "q_compaction_plan",
    (s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(sum(col("n_chars").cast("long")).as("total_bytes"),
          count(lit(1)).as("n_docs"))
        .select(col("source"), col("total_bytes"), col("n_docs"),
          expr("(total_bytes + 4095) div 4096").as("n_files"),
          expr("n_docs div ((total_bytes + 4095) div 4096)").as("docs_per_file")),
    Some("""SELECT source, CAST(sum(n_chars) AS BIGINT) AS total_bytes,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST((sum(n_chars) + 4095) // 4096 AS BIGINT) AS n_files,
              CAST(count(*) // ((sum(n_chars) + 4095) // 4096) AS BIGINT) AS docs_per_file
            FROM documents GROUP BY source"""))


  /** Market-basket co-purchase mining over the order/part bipartite
    * graph (the support/confidence/lift core of Agrawal-Srikant
    * association rules, reference-class analytics over the TPC-H
    * schema): part pairs that co-occur in an order, with exact
    * integer-milli confidence (c_ab/c_a) and lift (n·c_ab/(c_a·c_b)).
    *
    * Scale shape: the pair generator is a SELF-EQUI-JOIN on l_orderkey
    * over the distinct (order, part) projection — output bounded by
    * Σ basket² (baskets are small and bounded by order size, never
    * corpus²), and both join sides ride ONE orderkey exchange (AQE
    * ReusedExchange). Part supports are a dim-bounded aggregate
    * attached via shuffle_hash (broadcast-eligible when the part dim
    * fits); the order total rides a 1-row broadcast. Top-50 by lift is
    * TakeOrderedAndProject with a full-tuple tie-break — never a
    * global sort.
    */
  private[graft] lazy val qCopurchase = GraftQuery(
    "q_copurchase",
    (s, dir) => {
      // li is referenced FOUR times (both pair sides, the per-part
      // support counts, the order total): the keepAll fence plus
      // pre-materialized isnotnull on both keys keep every reference's
      // copy of the (ok, pk) dedup canonically identical, so the fact
      // scans once and the shared exchange serves all four (the
      // unfenced form computed three separate scans — PlanAudit).
      val li = Fence.keepAll(
        t(s, dir, "lineitem")
          .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct())
      val pairs = li.as("a").join(li.as("b").hint("shuffle_hash"), Seq("ok"))
        .filter(col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
        .agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 3)
      val supp = li.groupBy(col("pk")).agg(count(lit(1)).as("c"))
      val n = li.agg(countDistinct(col("ok")).as("n_orders"))
      pairs
        .join(supp.as("sa").hint("shuffle_hash"), col("p1") === col("sa.pk"))
        .join(supp.as("sb").hint("shuffle_hash"), col("p2") === col("sb.pk"))
        .crossJoin(broadcast(n))
        .select(col("p1"), col("p2"), col("c_ab"),
          expr("c_ab * 1000 div sa.c").as("conf_milli"),
          expr("c_ab * n_orders * 1000 div (sa.c * sb.c)").as("lift_milli"))
        .orderBy(col("lift_milli").desc, col("c_ab").desc, col("p1"), col("p2"))
        .limit(50)
    },
    Some("""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
                        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
             pr AS (SELECT a.pk AS p1, b.pk AS p2, CAST(count(*) AS BIGINT) AS c_ab
                    FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
                    GROUP BY 1, 2 HAVING count(*) >= 3),
             sp AS (SELECT pk, count(*) AS c FROM li GROUP BY 1),
             n AS (SELECT count(DISTINCT ok) AS n_orders FROM li)
             SELECT p1, p2, c_ab,
               CAST(c_ab * 1000 // sa.c AS BIGINT) AS conf_milli,
               CAST(c_ab * n_orders * 1000 // (sa.c * sb.c) AS BIGINT) AS lift_milli
             FROM pr JOIN sp sa ON pr.p1 = sa.pk
                     JOIN sp sb ON pr.p2 = sb.pk
                     CROSS JOIN n
             ORDER BY lift_milli DESC, c_ab DESC, p1, p2
             LIMIT 50"""))


  /** SCD2 state-interval compaction: collapse each user's event-type
    * stream into validity intervals [valid_from, valid_to) — change
    * detection (`lag` differs) then interval close (`lead` over the
    * compacted rows). Both windows share the key+order, so the whole
    * derivation is one shuffle + one per-key sort. Open intervals
    * close at a +inf sentinel, keeping the compare NULL-free.
    */
  private[graft] lazy val qScd2 = GraftQuery(
    "q_scd2",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("__us"), col("event_id"))
      val changes = events(s, dir)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("__us"),
          col("event_id"))
        .withColumn("__prev", lag(col("event_type"), 1).over(w))
        .filter(col("__prev").isNull || col("__prev") =!= col("event_type"))
      changes
        .withColumn("valid_to_us",
          coalesce(lead(col("__us"), 1).over(w), lit(32503680000000000L)))
        .select(col("user_id"), col("event_type").as("state"),
          col("__us").as("valid_from_us"), col("valid_to_us"))
    },
    Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
             ch AS (SELECT user_id, event_type, us, event_id FROM e
                    QUALIFY lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
                            IS DISTINCT FROM event_type)
             SELECT user_id, event_type AS state, us AS valid_from_us,
               COALESCE(lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id),
                        32503680000000000) AS valid_to_us
             FROM ch"""))


  /** Zone-map / data-skipping audit: per-day min/max/count of the
    * predicate columns, plus 0/1 prunability verdicts for two concrete
    * predicates — the report that tells you whether the table's
    * physical clustering lets a reader skip row groups (the mechanism
    * parquet min/max stats + partition pruning use at 100 TB). Pure
    * one-scan partial aggregation; the bucket column would be the
    * file/row-group id in a real lakehouse audit.
    */
  private[graft] lazy val qZonemap = GraftQuery(
    "q_zonemap",
    (s, dir) =>
      events(s, dir)
        .select(expr("unix_micros(ts) div 86400000000").as("day"),
          (col("value").cast(dec) * 100).cast("long").as("cents"), col("user_id"))
        .groupBy("day")
        .agg(count(lit(1)).as("n"),
          min("cents").as("min_cents"), max("cents").as("max_cents"),
          min("user_id").as("min_user"), max("user_id").as("max_user"))
        .withColumn("prune_cents_ge_1500", when(col("max_cents") < 1500, 1L).otherwise(0L))
        .withColumn("prune_user_ge_90", when(col("max_user") < 90, 1L).otherwise(0L)),
    Some("""WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents, user_id
                FROM events),
            z AS (SELECT day, CAST(count(*) AS BIGINT) AS n,
                    min(cents) AS min_cents, max(cents) AS max_cents,
                    min(user_id) AS min_user, max(user_id) AS max_user
                  FROM e GROUP BY day)
            SELECT day, n, min_cents, max_cents, min_user, max_user,
              CAST(CASE WHEN max_cents < 1500 THEN 1 ELSE 0 END AS BIGINT) AS prune_cents_ge_1500,
              CAST(CASE WHEN max_user < 90 THEN 1 ELSE 0 END AS BIGINT) AS prune_user_ge_90
            FROM z"""))


  // =======================================================================
  // Round-11 additions: TPC-H Q9/Q11 shapes on the available star schema,
  // KMV sketch set-intersection, exact moment sufficient statistics,
  // epoch-mix materialization plan, deterministic A/B lift report.
  // =======================================================================

  /** TPC-H Q9 shape: product-type profit by supplier nation and order
    * year — the widest join tree in the suite (lineitem ⋈ part ⋈
    * supplier ⋈ nation ⋈ orders). The schema has no partsupp, so unit
    * supply cost is p_retailprice (the same proxy substitution as
    * q2_mincost's derived unit cost). Dims broadcast; the only big-big
    * shuffle is lineitem ⋈ orders on orderkey; the (nation, year)
    * group-by is partial-aggregated map-side so the final exchange
    * carries ~|nations|×|years| rows regardless of fact size. Profit is
    * exact integer cents on both engines: revenue via the
    * ep_cents·(100−disc_e2) div 100 integer identity (numerators always
    * positive, so Spark's truncating div = DuckDB's floor //), cost via
    * retail_cents·quantity.
    */
  private[graft] lazy val q9Profit = GraftQuery(
    "q9_profit",
    (s, dir) => {
      val p = t(s, dir, "part")
        .filter(col("p_type") === "STANDARD")
        .select(col("p_partkey"),
          (col("p_retailprice").cast(dec) * 100).cast("long").as("__cost_cents"))
      val sn = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
      t(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("n_name").as("nation"), col("o_year"),
          expr("""(cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)
                   * (100 - cast(round(l_discount * 100) as bigint))) div 100
                  - __cost_cents * cast(l_quantity as bigint)""").as("__profit"))
        .groupBy("nation", "o_year")
        .agg(sum(col("__profit")).as("profit_cents"), count(lit(1)).as("n"))
    },
    Some("""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
              CAST(sum((CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                          * (100 - CAST(round(l_discount * 100) AS BIGINT))) // 100
                       - CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                          * CAST(l_quantity AS BIGINT)) AS BIGINT) AS profit_cents,
              CAST(count(*) AS BIGINT) AS n
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            WHERE p_type = 'STANDARD'
            GROUP BY 1, 2"""))


  /** TPC-H Q11 shape: "important stock" — per-part value held by one
    * nation's suppliers, kept only where the part's share exceeds a
    * global threshold (> 0.1% of that nation's total). The signature
    * move is the scalar subquery: the per-part aggregate is reused for
    * the grand total (a second, one-row aggregation over the SAME
    * per-part frame — no second fact scan), attached as a broadcast
    * 1-row cross join. Threshold compare is pure integer
    * (value_cents·1000 > total), share emitted in exact basis points.
    */
  private[graft] lazy val q11Stock = GraftQuery(
    "q11_stock",
    (s, dir) => {
      val sn = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val perPart = t(s, dir, "lineitem")
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(expr("sum(cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint))")
            .as("value_cents"),
          count(lit(1)).as("n_lines"))
      // The grand total re-aggregates perPart — but column pruning
      // would drop n_lines from THIS branch's per-part partial
      // aggregate, making its shuffle canonically different from the
      // main branch's (partial_sum vs partial_sum+partial_count) and
      // defeating AQE exchange reuse: the fact subtree would scan
      // twice. Fence.keepAll (whose scaladoc documents exactly this
      // failure mode) keeps every perPart column referenced, so both
      // branches carry the identical authored aggregate and the
      // lineitem scan+join+partial-agg runs ONCE — the total is a tiny
      // re-read of the reused exchange (pinned in PlanSpec).
      val tot = Fence.keepAll(perPart).agg(sum(col("value_cents")).as("__tot"))
      perPart.crossJoin(broadcast(tot))
        .filter(col("value_cents") * 1000 > col("__tot"))
        .select(col("l_partkey").as("p_partkey"), col("value_cents"), col("n_lines"),
          expr("value_cents * 10000 div __tot").as("share_bp"))
    },
    Some("""WITH v AS (SELECT l_partkey AS p_partkey,
                  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS value_cents,
                  CAST(count(*) AS BIGINT) AS n_lines
                FROM lineitem
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                WHERE n_name = 'NATION_3'
                GROUP BY 1),
            tot AS (SELECT CAST(sum(value_cents) AS BIGINT) AS tt FROM v)
            SELECT p_partkey, value_cents, n_lines,
              CAST(value_cents * 10000 // tt AS BIGINT) AS share_bp
            FROM v, tot WHERE value_cents * 1000 > tt"""))


  /** Z-order clustering key + layout audit (Morton 1966; the
    * multi-dimensional clustering behind Delta/Iceberg Z-ORDER BY):
    * interleave the low 16 bits of two predicate dimensions
    * (user bucket, value cents clamped to [0, 65535]) into one 32-bit
    * Morton key, bucket
    * rows by its top 10 bits, and report per-bucket count + min/max of
    * BOTH dims and the summed span — the zone-map audit (31n11b) run
    * against the layout a Z-ORDER rewrite WOULD produce. A
    * single-dimension sort gives tight zones on one predicate column
    * and full-range zones on every other; the Morton key bounds both
    * spans at once, which is why it is the standard data-skipping
    * layout for two-predicate scans at 100 TB. Bit-spreading is the
    * classic mask-and-shift sequence, identical integer ops on both
    * engines; cents clamp to [0, 65535] so negative values can never
    * reach the truncate-vs-floor divide divergence or the bit ops.
    * Shape: map-only key computation + one partial-agg
    * group-by on the 1024-value bucket — one scan, one tiny exchange,
    * invariant to fact scale.
    */
  private[graft] lazy val qZorder = GraftQuery(
    "q_zorder",
    (s, dir) => {
      def spread(c: Column): Column = {
        val a = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(16711935L))
        val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(252645135L))
        val d = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(858993459L))
        d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(1431655765L))
      }
      events(s, dir)
        .select(pmod(abs(col("user_id")), lit(65536L)).as("__ux"),
          least(greatest(expr("cast(cast(value as decimal(18,2)) * 100 as bigint)"), lit(0L)),
            lit(65535L)).as("__vy"))
        .withColumn("__z", spread(col("__ux")).bitwiseOR(shiftleft(spread(col("__vy")), 1)))
        .groupBy(expr("__z div 4194304").as("zbucket"))
        .agg(count(lit(1)).as("n"),
          min("__ux").as("min_u"), max("__ux").as("max_u"),
          min("__vy").as("min_v"), max("__vy").as("max_v"))
        .withColumn("span_sum", expr("(max_u - min_u) + (max_v - min_v)"))
    },
    Some {
      def spreadSql(v: String): String = {
        val a = s"((($v) | (($v) << 8)) & 16711935)"
        val b = s"(($a | ($a << 4)) & 252645135)"
        val c = s"(($b | ($b << 2)) & 858993459)"
        s"(($c | ($c << 1)) & 1431655765)"
      }
      s"""WITH e AS (SELECT abs(user_id) % 65536 AS ux,
                least(greatest(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT), 0), 65535) AS vy
              FROM events),
          z AS (SELECT (${spreadSql("ux")} | (${spreadSql("vy")} << 1)) AS zv, ux, vy FROM e),
          g AS (SELECT zv // 4194304 AS zbucket, CAST(count(*) AS BIGINT) AS n,
                  min(ux) AS min_u, max(ux) AS max_u,
                  min(vy) AS min_v, max(vy) AS max_v
                FROM z GROUP BY 1)
          SELECT zbucket, n, min_u, max_u, min_v, max_v,
            CAST((max_u - min_u) + (max_v - min_v) AS BIGINT) AS span_sum
          FROM g"""
    })

}
