package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deeper TPC-H-shaped relational queries: multi-join + filter + agg +
  * top-k compositions exercising the planner end to end.
  */
object DeepQueries {
  import Exact._

  /** Dialect-common ANSI SQL executed verbatim by BOTH Spark and DuckDB. */
  val SharedSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  MIN(o_orderkey) AS first_key, MAX(o_orderkey) AS last_key
      |FROM orders
      |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- q43: scalar-subquery filter (TPC-H Q2 flavor) --------------------
    // parts above the global average retail price; the average is an
    // order-independent decimal-sum / count, broadcast as a 1-row join.
    QueryDef(
      "q43_above_avg_parts",
      (s, dir) => {
        val p = Tables.part(s, dir)
        val avgP = p.agg((sum(dec(col("p_retailprice"))).cast(DoubleType)
          / count(lit(1))).as("avg_price"))
        p.crossJoin(broadcast(avgP))
          .filter(col("p_retailprice") > col("avg_price"))
          .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey, p_brand, p_retailprice FROM part
             |WHERE p_retailprice > (
             |  SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
             |  FROM part)
             |ORDER BY p_partkey""".stripMargin)),

    // ---- q44: large-volume orders (TPC-H Q18 shape) -----------------------
    QueryDef(
      "q44_large_orders",
      (s, dir) => {
        val qty = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"))
          .agg(sum(dec(col("l_quantity"))).as("qty_dec"))
          .filter(col("qty_dec") > 300)
          .select(col("l_orderkey"), col("qty_dec").cast(DoubleType).as("qty"))
        Tables.orders(s, dir)
          .join(qty, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderkey"), col("o_totalprice"), col("qty"))
          .orderBy(col("qty").desc, col("o_orderkey").asc)
          .limit(20)
      },
      Some("""SELECT o_orderkey, o_totalprice, qty FROM orders
             |JOIN (SELECT l_orderkey,
             |        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
             |      FROM lineitem GROUP BY l_orderkey
             |      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300) t
             |  ON o_orderkey = l_orderkey
             |ORDER BY qty DESC, o_orderkey ASC LIMIT 20""".stripMargin)),

    // ---- q45: one SQL text, two engines -----------------------------------
    // The oracle string itself runs through spark.sql over registered
    // views — dialect-common ANSI SQL is a first-class query surface.
    QueryDef(
      "q45_shared_sql",
      (s, dir) => {
        graft.Tables.registerViews(s, dir)
        s.sql(SharedSql)
      },
      Some(SharedSql)),

    // ---- q41: shipping priority (TPC-H Q3 shape) --------------------------
    // filter both sides of a 3-way join, aggregate revenue, top-10.
    QueryDef(
      "q41_shipping_priority",
      (s, dir) => {
        val cut = lit("1997-06-15").cast(TimestampType)
        val c = broadcast(Tables.customer(s, dir)
          .filter(col("c_mktsegment") === "BUILDING"))
        val o = Tables.orders(s, dir).filter(col("o_orderdate") < cut)
        val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > cut)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast(DoubleType).as("revenue"))
          .select(col("l_orderkey"),
            unix_timestamp(col("o_orderdate")).as("orderdate_epoch"),
            col("o_orderpriority"), col("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey").asc)
          .limit(10)
      },
      Some("""SELECT l_orderkey,
             |  CAST(epoch(o_orderdate) AS BIGINT) AS orderdate_epoch,
             |  o_orderpriority,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1997-06-15'
             |  AND l_shipdate > TIMESTAMP '1997-06-15'
             |GROUP BY l_orderkey, o_orderdate, o_orderpriority
             |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin)),

    // ---- q42: volume between nation pairs (TPC-H Q7 shape) ----------------
    // two customer/supplier nation legs over the same fact rows.
    QueryDef(
      "q42_nation_volume",
      (s, dir) => {
        val n1 = broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
        val n2 = broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
        val su = broadcast(Tables.supplier(s, dir))
        val cu = broadcast(Tables.customer(s, dir))
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(su, col("l_suppkey") === col("s_suppkey"))
          .join(cu, col("o_custkey") === col("c_custkey"))
          .join(n1, col("s_nationkey") === col("s_nk"))
          .join(n2, col("c_nationkey") === col("c_nk"))
          .filter(col("supp_nation") < col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast(DoubleType).as("volume"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS volume
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |WHERE n1.n_name < n2.n_name
             |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
             |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)),

    // ---- q46: order-priority checking (TPC-H Q4 shape — EXISTS) -----------
    // semi-join realizes the correlated EXISTS; Catalyst plans a LeftSemi
    // hash join, no subquery re-execution per row. (Predicate adapted to
    // the synthetic schema: deep-discount line exists.)
    QueryDef(
      "q46_priority_exists",
      (s, dir) => {
        val deep = Tables.lineitem(s, dir)
          .filter(col("l_discount") > 0.08)
          .select(col("l_orderkey"))
        Tables.orders(s, dir)
          .join(deep, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count
             |FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |  WHERE l_orderkey = o_orderkey AND l_discount > 0.08)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ---- q47: two-class conditional aggregation (TPC-H Q12 shape) ---------
    // two CASE sums in one pass over a fact-dimension join.
    QueryDef(
      "q47_returnflag_priority",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
          .filter(col("l_returnflag").isin("R", "A") && col("l_tax") < col("l_discount"))
        l.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_returnflag"))
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("high_line_count"),
            sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("low_line_count"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_returnflag IN ('R','A') AND l_tax < l_discount
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- q48: supplier-part counting with NOT IN (TPC-H Q16 shape) --------
    // anti-join realizes NOT IN against a filtered supplier set.
    QueryDef(
      "q48_parts_not_in",
      (s, dir) => {
        val badSupp = Tables.supplier(s, dir)
          .filter(col("s_acctbal") < 0.0)
          .select(col("s_suppkey"))
        val ps = Tables.part(s, dir)
          .filter(col("p_size").isin(1, 14, 23, 45))
          .select(col("p_partkey"), col("p_brand"), col("p_size"))
        Tables.lineitem(s, dir)
          .select(col("l_partkey"), col("l_suppkey"))
          .distinct()
          .join(badSupp, col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(ps, col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_size"))
          .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
      },
      Some("""SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
             |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pl
             |JOIN part ON l_partkey = p_partkey
             |WHERE p_size IN (1, 14, 23, 45)
             |  AND l_suppkey NOT IN (
             |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
             |GROUP BY p_brand, p_size
             |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin)),

    // ---- q49: idle-customer country codes (TPC-H Q22 shape) ---------------
    // scalar AVG subquery + NOT EXISTS anti-join against orders; country
    // code adapted to nation key (synthetic schema has no phone).
    QueryDef(
      "q49_idle_customers",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val avgBal = c.filter(col("c_acctbal") > 0.0)
          .agg((sum(dec(col("c_acctbal"))).cast(DoubleType) / count(lit(1)))
            .as("avg_bal"))
        c.join(Tables.orders(s, dir)
              .filter(col("o_orderpriority") === "1-URGENT")
              .select(col("o_custkey")).distinct(),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("numcust"),
            dsum(col("c_acctbal")).as("totacctbal"))
          .orderBy(col("c_nationkey"))
      },
      Some("""SELECT c_nationkey, COUNT(*) AS numcust,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
             |FROM customer
             |WHERE c_acctbal > (
             |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
             |    FROM customer WHERE c_acctbal > 0.0)
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin))
  )
}
