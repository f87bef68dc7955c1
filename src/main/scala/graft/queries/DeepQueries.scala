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
             |ORDER BY supp_nation, cust_nation, l_year""".stripMargin))
  )
}
