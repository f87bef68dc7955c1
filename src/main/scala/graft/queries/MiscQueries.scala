package graft.queries

import graft.{MDFrame, QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Exact.dec

/** Set ops (U3), vertical concat (U1/U2), explode (T1), JSON (S5), sampling
  * (R4), positional take (R1) — the remaining SURVEY.md §2 surface.
  */
object MiscQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- q30: concat strict via MDFrame (U1 — UNION ALL keeps dupes) ------
    QueryDef(
      "q30_concat_strict",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val hi = MDFrame(o.filter(col("o_totalprice") > 400000.0)
          .select(col("o_orderkey"), col("o_totalprice")))
        val ur = MDFrame(o.filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 350000.0)
          .select(col("o_orderkey"), col("o_totalprice")))
        MDFrame.concat(Seq(hi, ur)).ds
          .orderBy(col("o_orderkey"), col("o_totalprice"))
      },
      Some("""SELECT * FROM (
             |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 400000.0
             |  UNION ALL
             |  SELECT o_orderkey, o_totalprice FROM orders
             |  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 350000.0) t
             |ORDER BY o_orderkey, o_totalprice""".stripMargin)),

    // ---- q31: concat loose via MDFrame (U2 — dtype-zero fill) -------------
    // Missing long → 0, missing native string → "" (reference
    // tests/test_concat.py:96-111 semantics).
    QueryDef(
      "q31_concat_loose",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val a = MDFrame(o.filter(col("o_totalprice") > 450000.0)
          .select(col("o_orderkey"), col("o_custkey")))
        val b = MDFrame(o.filter(col("o_orderkey") <= 100)
          .select(col("o_orderkey"), col("o_orderpriority")))
        MDFrame.concat(Seq(a, b), strict = false).ds
          .orderBy(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      },
      Some("""SELECT * FROM (
             |  SELECT o_orderkey, o_custkey, '' AS o_orderpriority
             |  FROM orders WHERE o_totalprice > 450000.0
             |  UNION ALL
             |  SELECT o_orderkey, 0 AS o_custkey, o_orderpriority
             |  FROM orders WHERE o_orderkey <= 100) t
             |ORDER BY o_orderkey, o_custkey, o_orderpriority""".stripMargin)),

    // ---- q32: intersect (U3 — free in Spark) ------------------------------
    QueryDef(
      "q32_intersect",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        val building = c.filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("custkey"))
        val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("custkey"))
        building.intersect(urgent).orderBy(col("custkey"))
      },
      Some("""SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
             |INTERSECT
             |SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
             |ORDER BY custkey""".stripMargin)),

    // ---- q33: except ------------------------------------------------------
    QueryDef(
      "q33_except",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        c.select(col("c_custkey").as("custkey"))
          .except(o.select(col("o_custkey").as("custkey")))
          .orderBy(col("custkey"))
      },
      Some("""SELECT c_custkey AS custkey FROM customer
             |EXCEPT
             |SELECT o_custkey AS custkey FROM orders
             |ORDER BY custkey""".stripMargin)),

    // ---- q34: explode via MDFrame (T1) ------------------------------------
    QueryDef(
      "q34_explode_tokens",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .filter(col("doc_id") < 50)
          .withColumn("tok", split(col("text"), " "))
          .select(col("doc_id"), col("tok"))
        MDFrame(docs).explodeCol("tok").ds
          .orderBy(col("doc_id"), col("tok"))
      },
      Some("""SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |FROM documents WHERE doc_id < 50
             |ORDER BY doc_id, tok""".stripMargin)),

    // ---- q35: to_json (S5 — the reference's canonical JSON encoder) -------
    QueryDef(
      "q35_to_json",
      (s, dir) =>
        Tables.orders(s, dir)
          .filter(col("o_orderkey") <= 200)
          .select(col("o_orderkey"),
            to_json(struct(col("o_orderkey"), col("o_orderstatus"), col("o_custkey")))
              .as("js"))
          .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
             |  to_json(struct_pack(o_orderkey := o_orderkey,
             |    o_orderstatus := o_orderstatus, o_custkey := o_custkey))::VARCHAR AS js
             |FROM orders WHERE o_orderkey <= 200
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- q36: get_json_object — parse the events props JSON ---------------
    QueryDef(
      "q36_json_extract",
      (s, dir) =>
        Tables.events(s, dir)
          .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
          .orderBy(col("event_type")),
      // outer CAST: DuckDB SUM(BIGINT) yields HUGEINT → driver hash mismatch
      Some("""SELECT event_type, COUNT(*) AS n,
             |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- q37: positional take — gather specific row numbers (R1) ----------
    // Scale-safe positional idiom: MDFrame.takePositions range-partitions on
    // the order key and numbers rows with parallel zipWithIndex — no
    // single-partition global-window Exchange (the plan this replaces).
    QueryDef(
      "q37_take_positions",
      (s, dir) =>
        MDFrame(Tables.orders(s, dir)
            .select(col("o_orderkey"), col("o_totalprice")))
          .takePositions(Seq(0L, 10L, 100L, 1000L), Seq("o_orderkey")).ds
          .orderBy(col("pos")),
      Some("""SELECT o_orderkey, o_totalprice, pos FROM (
             |  SELECT o_orderkey, o_totalprice,
             |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS pos
             |  FROM orders) t
             |WHERE pos IN (0, 10, 100, 1000) ORDER BY pos""".stripMargin)),

    // ---- q38: deterministic md5-Bernoulli sample (R4) ---------------------
    // A seeded engine RNG can never be oracle-checked across engines; the
    // md5-keyed Bernoulli filter IS the engine's reproducible sampling
    // primitive, so the oracle replays it bit-for-bit.
    QueryDef(
      "q38_sample",
      (s, dir) =>
        MDFrame(Tables.orders(s, dir)
            .select(col("o_orderkey"), col("o_totalprice")))
          .sampleDeterministic(0.1, "o_orderkey").ds
          .orderBy(col("o_orderkey")),
      Some(s"""SELECT o_orderkey, o_totalprice FROM orders
              |WHERE ${graft.ops.TextAnalysis.hexToIntSql("md5(concat('smp:', o_orderkey))", 12)}
              |  < ${MDFrame.bernoulliThreshold(0.1)}
              |ORDER BY o_orderkey""".stripMargin)),

    // ---- q52: exact column profile (S6/P5 summary, oracle-checked) --------
    QueryDef(
      "q52_describe",
      (s, dir) =>
        MDFrame(Tables.lineitem(s, dir))
          .describeExact(Seq("l_quantity", "l_extendedprice", "l_discount"))
          .orderBy(col("col_name")),
      Some("""SELECT * FROM (
             |  SELECT 'l_quantity' AS col_name, COUNT(*) AS n, CAST(0 AS BIGINT) AS n_null,
             |    CAST(MIN(l_quantity) AS DOUBLE) AS min_v, CAST(MAX(l_quantity) AS DOUBLE) AS max_v,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_v FROM lineitem
             |  UNION ALL
             |  SELECT 'l_extendedprice', COUNT(*), CAST(0 AS BIGINT),
             |    CAST(MIN(l_extendedprice) AS DOUBLE), CAST(MAX(l_extendedprice) AS DOUBLE),
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) FROM lineitem
             |  UNION ALL
             |  SELECT 'l_discount', COUNT(*), CAST(0 AS BIGINT),
             |    CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE),
             |    CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) FROM lineitem) t
             |ORDER BY col_name""".stripMargin)),

    // ---- q53: 2-level-index join (J1 multi-level, oracle-checked) ---------
    // Both frames keyed by the composite (orderkey, linenumber) index;
    // the join drags both levels and zero-fills the left-only slots.
    QueryDef(
      "q53_join_multilevel",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val a = MDFrame(li.select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
          Seq("l_orderkey", "l_linenumber"))
        val b = MDFrame(li.filter(col("l_discount") > 0.05)
            .select(col("l_orderkey"), col("l_linenumber"),
              col("l_extendedprice").as("price")),
          Seq("l_orderkey", "l_linenumber"))
        MDFrame.join("left", Seq(a, b)).ds
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n"),
            sum(dec(col("l_quantity"))).cast(DoubleType).as("qty"),
            // unmatched slots were dtype-zero-filled with NaN: route them
            // through null (ANSI cast of NaN to DECIMAL raises) so the
            // decimal sum skips them exactly like DuckDB's null-skipping SUM
            sum(dec(when(isnan(col("price")), lit(null)).otherwise(col("price"))))
              .cast(DoubleType).as("price_filled"))
          .orderBy(col("l_orderkey"))
      },
      // NaN zero-fill on the float column makes unmatched slots NaN; DuckDB
      // SUM skips NULL while Spark's decimal-sum skips NaN after the cast —
      // both sides aggregate only matched rows
      Some("""SELECT l_orderkey, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
             |  CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS price_filled
             |FROM (SELECT a.l_orderkey, a.l_linenumber, a.l_quantity, b.price
             |      FROM lineitem a LEFT JOIN (
             |        SELECT l_orderkey, l_linenumber, l_extendedprice AS price
             |        FROM lineitem WHERE l_discount > 0.05) b
             |      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber) t
             |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)),

    // ---- q39: per-dtype isnull matrix (P10) -------------------------------
    // The reference's null model (dataframe.py:948-978): float → NaN IS
    // null, timestamp → null, object string → null, native string and
    // integers → NEVER null. Nulls are synthesized, then counted through
    // MDFrame.isnullMask — one codegen'd projection.
    QueryDef(
      "q39_isnull_matrix",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .withColumn("v_nan",
            when(col("value") < 5.0, lit(Double.NaN)).otherwise(col("value")))
          .withColumn("ts_null",
            when(col("event_type") === "click", lit(null).cast(TimestampType))
              .otherwise(col("ts")))
          .withColumn("props_null",
            when(col("event_type") === "view", lit(null).cast(StringType))
              .otherwise(col("props")))
        val f = MDFrame(e, Nil, objectCols = Set("props_null"))
        f.ds.agg(
          count(when(f.isnullMask("v_nan"), 1)).as("n_nan"),
          count(when(f.isnullMask("ts_null"), 1)).as("n_ts_null"),
          count(when(f.isnullMask("props_null"), 1)).as("n_obj_null"),
          // native string + integer columns can never be null by dtype rule
          count(when(f.isnullMask("event_type"), 1)).as("n_str_null"),
          count(when(f.isnullMask("user_id"), 1)).as("n_int_null"))
      },
      Some("""SELECT
             |  COUNT(*) FILTER (WHERE isnan(CASE WHEN value < 5.0 THEN 'NaN'::DOUBLE ELSE value END)) AS n_nan,
             |  COUNT(*) FILTER (WHERE (CASE WHEN event_type = 'click' THEN NULL ELSE ts END) IS NULL) AS n_ts_null,
             |  COUNT(*) FILTER (WHERE (CASE WHEN event_type = 'view' THEN NULL ELSE props END) IS NULL) AS n_obj_null,
             |  CAST(0 AS BIGINT) AS n_str_null,
             |  CAST(0 AS BIGINT) AS n_int_null
             |FROM events""".stripMargin)),

    // ---- q40: per-group apply via typed mapGroups (G4) --------------------
    // The reference's `for group in grouper: ufunc(group)` loop → Spark's
    // KeyValueGroupedDataset.mapGroups with arbitrary Scala per group.
    // Top-k is folded with a bounded heap (O(k) memory per group — a group
    // at 100 TB can be billions of rows, never materialize it). Exact
    // decimal summation matches the oracle bitwise.
    QueryDef(
      "q40_group_apply",
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir)
          .select(col("o_orderpriority"), col("o_totalprice").cast(DoubleType))
          .as[(String, Double)]
          .groupByKey(_._1)
          .mapGroups { (k, rows) =>
            val heap = scala.collection.mutable.PriorityQueue.empty[Double](
              Ordering[Double].reverse) // min-heap of the current top-3
            rows.foreach { r =>
              heap.enqueue(r._2)
              if (heap.size > 3) heap.dequeue()
            }
            val top = heap.dequeueAll
            val sum3 = top.map(v => BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
            (k, top.size.toLong, sum3.toDouble)
          }
          .toDF("o_orderpriority", "n_top", "top3_sum")
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n_top,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS top3_sum
             |FROM (
             |  SELECT o_orderpriority, o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
             |      ORDER BY o_totalprice DESC) AS rn
             |  FROM orders) t
             |WHERE rn <= 3 GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))
  )
}
