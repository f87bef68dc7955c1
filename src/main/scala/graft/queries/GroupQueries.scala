package graft.queries

import graft.{MDFrame, QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Grouping / dedup / null-handling surface (SURVEY.md §2.6, §2.2 P10-P11).
  * Dedup goes through `MDFrame.dropDuplicates` (window + row_number over an
  * explicit order column — no positional assumptions, scales to any
  * partition count).
  */
object GroupQueries {
  import Exact._

  val defs: Seq[QueryDef] = Seq(

    // ---- q18: multi-key grouping with min/max/count/sum (G1-G3, G8) -------
    QueryDef(
      "q18_group_multi",
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy(col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n"),
            min(col("o_totalprice")).as("min_price"),
            max(col("o_totalprice")).as("max_price"),
            dsum(col("o_totalprice")).as("sum_price"))
          .orderBy(col("o_orderstatus"), col("o_orderpriority")),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
             |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM orders GROUP BY o_orderstatus, o_orderpriority
             |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)),

    // ---- q19: drop_duplicates keep=first via MDFrame (G6) -----------------
    // "first" = the customer's earliest order (unique tiebreak o_orderkey);
    // key-sorted output, exactly the reference's _unique semantics with an
    // explicit total order.
    QueryDef(
      "q19_dedup_first",
      (s, dir) => {
        val o = MDFrame(
          Tables.orders(s, dir)
            .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("o_orderdate")),
          Seq("o_custkey"))
        o.dropDuplicates(Seq("o_custkey"), keep = "first",
            orderCols = Seq("o_orderdate", "o_orderkey"))
          .ds.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
             |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
             |  FROM orders) t
             |WHERE rn = 1 ORDER BY o_custkey""".stripMargin)),

    // ---- q20: drop_duplicates keep=last via MDFrame (G6) ------------------
    QueryDef(
      "q20_dedup_last",
      (s, dir) => {
        val o = MDFrame(
          Tables.orders(s, dir)
            .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("o_orderdate")),
          Seq("o_custkey"))
        o.dropDuplicates(Seq("o_custkey"), keep = "last",
            orderCols = Seq("o_orderdate", "o_orderkey"))
          .ds.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
             |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             |  FROM orders) t
             |WHERE rn = 1 ORDER BY o_custkey""".stripMargin)),

    // ---- q21: duplicated-mask statistics (G7) -----------------------------
    QueryDef(
      "q21_duplicated_stats",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(count(lit(1)).as("c"))
          .agg(
            count(when(col("c") > 1, 1)).as("dup_keys"),
            sum(when(col("c") > 1, col("c") - 1).otherwise(lit(0))).as("dup_rows"),
            count(lit(1)).as("distinct_keys")),
      // CAST to BIGINT: DuckDB SUM(BIGINT) yields HUGEINT, which the driver
      // hash renders differently from Spark's int64 (same fix as x01)
      Some("""SELECT COUNT(*) FILTER (WHERE c > 1) AS dup_keys,
             |  CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c - 1 ELSE 0 END), 0) AS BIGINT) AS dup_rows,
             |  COUNT(*) AS distinct_keys
             |FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_partkey, l_suppkey) t""".stripMargin)),

    // ---- q22: nonemin/nonemax as null-skipping min/max + monotonicity (G8/G9)
    QueryDef(
      "q22_minmax_props",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.agg(
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          unix_timestamp(min(col("o_orderdate"))).as("min_date_epoch"),
          unix_timestamp(max(col("o_orderdate"))).as("max_date_epoch"),
          (count(lit(1)) === count_distinct(col("o_orderkey"))).as("key_unique"))
      },
      Some("""SELECT MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
             |  CAST(epoch(MIN(o_orderdate)) AS BIGINT) AS min_date_epoch,
             |  CAST(epoch(MAX(o_orderdate)) AS BIGINT) AS max_date_epoch,
             |  (COUNT(*) = COUNT(DISTINCT o_orderkey)) AS key_unique
             |FROM orders""".stripMargin)),

    // ---- q23: fillna round-trip (P10/P11) ---------------------------------
    // Nulls are synthesized with NULLIF, then repaired with MDFrame.fillna —
    // the whole pipeline is one codegen'd projection.
    QueryDef(
      "q23_fillna",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .withColumn("v_null", when(col("value") < 10.0, lit(null)).otherwise(col("value")))
        MDFrame(e).fillna(-1.0, Seq("v_null")).ds
          .groupBy(col("event_type"))
          .agg(
            count(when(col("v_null") === -1.0, 1)).as("n_filled"),
            dsum(col("v_null")).as("sum_v"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
             |  COUNT(*) FILTER (WHERE v2 = -1.0) AS n_filled,
             |  CAST(SUM(CAST(v2 AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
             |FROM (SELECT event_type,
             |        COALESCE(CASE WHEN value < 10.0 THEN NULL ELSE value END, -1.0) AS v2
             |      FROM events) t
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- q24: rollup with explicit null ordering (G10 — Spark superset) ---
    QueryDef(
      "q24_rollup",
      (s, dir) =>
        Tables.orders(s, dir)
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
             |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // ---- q54: calendar truncation — monthly order volume ------------------
    // date_trunc agrees across engines under a UTC session; output as
    // integer epoch (raw timestamps never cross the oracle boundary).
    QueryDef(
      "q54_monthly_orders",
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy(unix_timestamp(date_trunc("month", col("o_orderdate")))
            .as("month_epoch"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("month_epoch")),
      Some("""SELECT CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_epoch,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders GROUP BY 1 ORDER BY month_epoch""".stripMargin)),

    // ---- q50: cube — every grouping-set combination (G10 superset) --------
    QueryDef(
      "q50_cube",
      (s, dir) =>
        Tables.orders(s, dir)
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // ---- q55: explicit GROUPING SETS (G10 completion beyond rollup/cube) --
    // Two chosen groupings in one pass — expressed through the SQL surface
    // (the DataFrame API has no grouping-sets builder), identical text
    // semantics both engines.
    QueryDef(
      "q55_grouping_sets",
      (s, dir) => {
        Tables.registerViews(s, dir)
        s.sql("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
                |FROM orders
                |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
                |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
             |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // ---- q25: pivot (T3 — Spark superset) ---------------------------------
    QueryDef(
      "q25_pivot",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(sum(dec(col("l_quantity"))).cast(DoubleType))
          .select(col("l_returnflag"), col("F").as("qty_f"), col("O").as("qty_o"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_f,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_o
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))
  )
}
