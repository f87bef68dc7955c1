package graft.queries

import graft.{MDFrame, QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Join surface (SURVEY.md §2.4): n-way index joins with the reference's
  * semantics (key-sorted output, dtype-zero fill) routed through
  * `MDFrame.join`, plus the Spark-superset joins (semi/anti) the reference
  * expresses via `isin`/`Index.diff`.
  *
  * Scale notes: dimension tables (region/nation/customer/supplier) are
  * broadcast — at 100 TB the fact side never shuffles for these joins; the
  * lineitem⋈orders join shuffles on the shared key only.
  */
object JoinQueries {
  import Exact._

  val defs: Seq[QueryDef] = Seq(

    // ---- q11: MDFrame inner index join, customer⋈nation -------------------
    QueryDef(
      "q11_join_inner",
      (s, dir) => {
        val cust = MDFrame(Tables.customer(s, dir), Seq("c_nationkey"))
        val nat = MDFrame(broadcast(Tables.nation(s, dir)), Seq("n_nationkey"))
        MDFrame.join("inner", Seq(cust, nat)).ds
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("total_bal"))
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name, COUNT(*) AS n_cust,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // ---- q12: MDFrame left join with dtype-zero fill (J4) -----------------
    // Nations with no customers get count 0, not null — the reference's
    // missing-slot semantics (dataframe.py:1339-1346).
    QueryDef(
      "q12_join_left_zerofill",
      (s, dir) => {
        val perNation = Tables.customer(s, dir)
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_cust"))
        val nat = MDFrame(Tables.nation(s, dir), Seq("n_nationkey"))
        val agg = MDFrame(perNation, Seq("c_nationkey"))
        MDFrame.join("left", Seq(nat, agg)).ds
          .select(col("n_nationkey"), col("n_name"), col("n_cust"))
          .orderBy(col("n_nationkey"))
      },
      Some("""SELECT n_nationkey, n_name, COALESCE(cnt, 0) AS n_cust
             |FROM nation LEFT JOIN
             |  (SELECT c_nationkey, COUNT(*) AS cnt FROM customer GROUP BY c_nationkey) c
             |  ON n_nationkey = c_nationkey
             |ORDER BY n_nationkey""".stripMargin)),

    // ---- q13: MDFrame outer join, zero-fill both sides --------------------
    QueryDef(
      "q13_join_outer",
      (s, dir) => {
        val cust = MDFrame(
          Tables.customer(s, dir).groupBy(col("c_nationkey"))
            .agg(count(lit(1)).as("n_cust")),
          Seq("c_nationkey"))
        val supp = MDFrame(
          Tables.supplier(s, dir).groupBy(col("s_nationkey"))
            .agg(count(lit(1)).as("n_supp")),
          Seq("s_nationkey"))
        MDFrame.join("outer", Seq(cust, supp)).ds
          .select(col("c_nationkey").as("nationkey"), col("n_cust"), col("n_supp"))
          .orderBy(col("nationkey"))
      },
      Some("""SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
             |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
             |FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) c
             |FULL OUTER JOIN (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
             |  ON c.c_nationkey = s.s_nationkey
             |ORDER BY nationkey""".stripMargin)),

    // ---- q14: 5-way broadcast join — revenue per nation (TPC-H Q5-ish) ----
    QueryDef(
      "q14_join_nway_revenue",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        val c = broadcast(Tables.customer(s, dir))
        val n = broadcast(Tables.nation(s, dir))
        val r = broadcast(Tables.region(s, dir))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .groupBy(col("n_name"))
          .agg(
            sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
              .cast(DoubleType).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             |  COUNT(*) AS n_items
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),
      headline = true),

    // ---- q15: left-semi join (reference isin-as-semi-join, P9/J7) ---------
    QueryDef(
      "q15_semi_join",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val bld = Tables.customer(s, dir)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        o.join(broadcast(bld), col("o_custkey") === col("c_custkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n FROM orders
             |WHERE EXISTS (SELECT 1 FROM customer
             |  WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ---- q16: Index.diff as left-anti (J6) --------------------------------
    QueryDef(
      "q16_anti_join",
      (s, dir) => {
        val cust = MDFrame(Tables.customer(s, dir), Seq("c_custkey"))
        val ords = MDFrame(Tables.orders(s, dir), Seq("o_custkey"))
        cust.indexDiff(ords).ds
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_no_orders"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n_no_orders FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // ---- q17: duplicate first-frame keys repeat rows (J3, m:1 join) -------
    QueryDef(
      "q17_join_dup_left",
      (s, dir) => {
        val li = MDFrame(
          Tables.lineitem(s, dir)
            .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
          Seq("l_orderkey"))
        val o = MDFrame(
          Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority")),
          Seq("o_orderkey"))
        MDFrame.join("left", Seq(li, o)).ds
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("qty"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n_items,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
             |FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))
  )
}
