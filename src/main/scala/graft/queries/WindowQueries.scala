package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Window-function surface (SURVEY.md §2.10). The reference has no window
  * functions; these are the Spark-superset operators needed internally for
  * positional semantics (dedup keep=first/last, iloc) and exposed as
  * first-class queries.
  *
  * Every window has a deterministic ORDER BY (unique tiebreaker key) so
  * results are reproducible under any partitioning.
  */
object WindowQueries {
  import Exact._

  val defs: Seq[QueryDef] = Seq(

    // ---- q26: top-k per group (row_number) --------------------------------
    QueryDef(
      "q26_topk_per_group",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables.orders(s, dir)
          .filter(col("o_custkey") <= 100)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("o_custkey"), col("rk"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_custkey"), col("rk"))
      },
      Some("""SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY o_custkey
             |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
             |  FROM orders WHERE o_custkey <= 100) t
             |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin)),

    // ---- q27: lag — inter-order gap per customer --------------------------
    QueryDef(
      "q27_lag_gap",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        Tables.orders(s, dir)
          .filter(col("o_custkey") <= 50)
          .withColumn("prev_epoch", lag(unix_timestamp(col("o_orderdate")), 1).over(w))
          .withColumn("gap_s", unix_timestamp(col("o_orderdate")) - col("prev_epoch"))
          .select(col("o_custkey"), col("o_orderkey"), col("gap_s"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(epoch(o_orderdate) AS BIGINT)
             |    - LAG(CAST(epoch(o_orderdate) AS BIGINT), 1) OVER (
             |        PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS gap_s
             |FROM orders WHERE o_custkey <= 50
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- q28: running (cumulative) sum per partition ----------------------
    // Cumulative sum in DECIMAL: exact at every prefix, so the double cast
    // matches the oracle bitwise on every row.
    QueryDef(
      "q28_running_sum",
      (s, dir) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.lineitem(s, dir)
          .filter(col("l_suppkey") <= 5)
          .withColumn("running_qty", sum(dec(col("l_quantity"))).over(w).cast(DoubleType))
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
          .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
             |    PARTITION BY l_suppkey
             |    ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
             |FROM lineitem WHERE l_suppkey <= 5
             |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin)),

    // ---- q29: rank with gaps + dense_rank ---------------------------------
    // Global ranking WITHOUT the single-partition window funnel: range
    // partition + parallel local ranks + tiny per-partition offsets
    // (graft.ops.Ranking) — same results as the global window at any scale.
    QueryDef(
      "q29_rank_dense",
      (s, dir) =>
        graft.ops.Ranking.withGlobalRanks(
            Tables.part(s, dir).filter(col("p_size") >= 40)
              // key-only projection (the Ranking no-rider contract)
              .select(col("p_retailprice"), col("p_partkey")),
            Seq("p_retailprice" -> false, "p_partkey" -> true))
          .select(col("p_partkey"), col("p_retailprice"), col("rnk"), col("drnk"))
          .orderBy(col("rnk"), col("p_partkey")),
      Some("""SELECT p_partkey, p_retailprice,
             |  RANK() OVER (ORDER BY p_retailprice DESC, p_partkey ASC) AS rnk,
             |  DENSE_RANK() OVER (ORDER BY p_retailprice DESC, p_partkey ASC) AS drnk
             |FROM part WHERE p_size >= 40
             |ORDER BY rnk, p_partkey""".stripMargin)),

    // ---- q51: analytic-function sweep (ntile/percent_rank/cume_dist/
    //      first_value) — partitioned windows, unique total order, exact
    //      rational percent_rank/cume_dist → bitwise across engines.
    QueryDef(
      "q51_analytics",
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_orderkey"))
        Tables.orders(s, dir)
          .filter(col("o_custkey") <= 200)
          .select(col("o_orderkey"), col("o_orderpriority"),
            ntile(4).over(w).as("quartile"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"),
            first(col("o_totalprice")).over(w).as("first_price"))
          .orderBy(col("o_orderpriority"), col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderpriority,
             |  NTILE(4) OVER w AS quartile,
             |  PERCENT_RANK() OVER w AS pr,
             |  CUME_DIST() OVER w AS cd,
             |  FIRST_VALUE(o_totalprice) OVER w AS first_price
             |FROM orders WHERE o_custkey <= 200
             |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
             |ORDER BY o_orderpriority, o_orderkey""".stripMargin))
  )
}
