package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Numeric helpers shared by query builders.
  *
  * Money/ratio aggregates are computed in DECIMAL and only cast to DOUBLE at
  * the very end, on both the Spark side and the DuckDB oracle side. Decimal
  * addition is exact and therefore independent of partitioning / summation
  * order — the resulting double is bitwise identical no matter how Spark
  * shuffles, which is what the driver's hash compare needs. This also holds
  * at any scale factor (no float error accumulation at 100 TB).
  */
object Exact {
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  /** Order-independent sum of a 2-decimal money column, as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)
  /** Order-independent average (exact decimal sum / count), as double. */
  def davg(c: Column): Column = sum(dec(c)).cast(DoubleType) / count(lit(1))
}

/** Core relational surface: scan→filter→agg (flagship), projections, casts,
  * computed columns, isin membership, distinct, sorts, top-k.
  *
  * Reference semantics per SURVEY.md §2.2-§2.3, §2.6-§2.7 (medvedi
  * `take`/`isin`/`astype`/`unique`/`sort_values`, dataframe.py:484-946).
  */
object CoreQueries {
  import Exact._

  val defs: Seq[QueryDef] = Seq(

    // ---- q01: flagship TPC-H-Q1-shaped pricing summary --------------------
    // filter (P8) + groupBy/agg (G1-G3) + sort (O1) in one plan; filter and
    // the two grouping columns reach the parquet scan (PushedFilters).
    QueryDef(
      "q01_pricing_summary",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            // TIGHT operand precisions so the 3-factor product stays
            // within 38 digits EXACTLY: (12,2)x(5,2)x(5,2) -> (24,6).
            // With dec()'s (18,2) the product precision overflows 38
            // and Spark's allowPrecisionLoss rounds PER ROW — invisible
            // at sf0.1, a last-ulp sum divergence at sf1.
            // round the exact decimal to 2dp BEFORE the double cast:
            // at sf1 magnitudes the scale-6 unscaled value exceeds
            // 2^53 and DuckDB's decimal->double cast double-rounds
            // (integer-to-double then /10^scale) while Spark's is a
            // single correctly-rounded conversion — at 2dp both casts
            // are exact
            round(sum(col("l_extendedprice").cast(DecimalType(12, 2)) *
              (lit(1) - col("l_discount").cast(DecimalType(4, 2)))), 2)
              .cast(DoubleType).as("sum_disc_price"),
            round(sum(col("l_extendedprice").cast(DecimalType(12, 2)) *
              (lit(1) - col("l_discount").cast(DecimalType(4, 2))) *
              (lit(1) + col("l_tax").cast(DecimalType(4, 2)))), 2)
              .cast(DoubleType).as("sum_charge"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_extendedprice")).as("avg_price"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      // TIGHT decimal operand widths in BOTH engines: with (18,2)
      // operands the 3-factor product exceeds 38 digits and DuckDB
      // silently degrades the multiplication to DOUBLE (per-row float
      // rounding — a last-ulp sum divergence that only surfaced at
      // sf1), while Spark's allowPrecisionLoss rounds the decimal.
      // (12,2)x(5,2)x(5,2) -> (24,6) stays exact everywhere.
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
             |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
             |  COUNT(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      headline = true),

    // ---- q02: projection + predicate filter (P1/P2/P8) --------------------
    QueryDef(
      "q02_project_filter",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_quantity") >= 45 && col("l_discount") > 0.05)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("l_extendedprice"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem WHERE l_quantity >= 45 AND l_discount > 0.05
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- q03: isin membership (P9) ----------------------------------------
    QueryDef(
      "q03_isin",
      (s, dir) =>
        Tables.orders(s, dir)
          .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority, COUNT(*) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ---- q04: inverted isin (P9 invert=True → NOT IN) ---------------------
    QueryDef(
      "q04_isin_invert",
      (s, dir) =>
        Tables.orders(s, dir)
          .filter(!col("o_orderstatus").isin("F", "O"))
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice
             |FROM orders WHERE o_orderstatus NOT IN ('F','O')
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- q05: rename + astype (P6/P7) -------------------------------------
    QueryDef(
      "q05_rename_cast",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_orderkey") % 1000 === 0)
          .select(
            col("l_orderkey").as("okey"),
            col("l_linenumber").cast(LongType).as("lineno"),
            col("l_quantity").cast(IntegerType).as("qty_int"),
            col("l_returnflag").as("flag"))
          .orderBy(col("okey"), col("lineno")),
      Some("""SELECT l_orderkey AS okey, CAST(l_linenumber AS BIGINT) AS lineno,
             |  CAST(l_quantity AS INTEGER) AS qty_int, l_returnflag AS flag
             |FROM lineitem WHERE l_orderkey % 1000 = 0
             |ORDER BY okey, lineno""".stripMargin)),

    // ---- q06: computed column / withColumn (P3) ---------------------------
    // Per-row IEEE double products are deterministic — no decimal needed.
    QueryDef(
      "q06_with_column",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .withColumn("revenue", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .filter(col("revenue") > 95000.0)
          .select(col("l_orderkey"), col("l_linenumber"), col("revenue"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  l_extendedprice * (1.0 - l_discount) AS revenue
             |FROM lineitem WHERE l_extendedprice * (1.0 - l_discount) > 95000.0
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- q07: unique / distinct (G5) --------------------------------------
    QueryDef(
      "q07_distinct",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .select(col("l_returnflag"), col("l_linestatus"))
          .distinct()
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- q08: multi-column sort with explicit null placement (O1/O2) ------
    QueryDef(
      "q08_sort_values",
      (s, dir) =>
        Tables.part(s, dir)
          .select(col("p_partkey"), col("p_brand"), col("p_size"), col("p_retailprice"))
          .orderBy(col("p_brand").asc, col("p_size").desc, col("p_partkey").asc),
      Some("""SELECT p_partkey, p_brand, p_size, p_retailprice FROM part
             |ORDER BY p_brand ASC, p_size DESC, p_partkey ASC""".stripMargin)),

    // ---- q09: top-k (O4 — TakeOrderedAndProject, no global sort) ----------
    QueryDef(
      "q09_topk",
      (s, dir) =>
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(25),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""".stripMargin)),

    // ---- q10: positional slice iloc[a:b] (R2/R3) over a total order -------
    QueryDef(
      "q10_slice_offset",
      (s, dir) =>
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
          .offset(100).limit(20),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_orderkey LIMIT 20 OFFSET 100""".stripMargin))
  )
}
