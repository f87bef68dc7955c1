package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence analysis over order lines: which item
  * pairs appear together in the same order, with support and lift.
  *
  * Scale shape (100 TB lineitem): the pair space is generated PER BASKET,
  * never by a corpus self-join — groupBy(orderkey) collects each order's
  * distinct item set (baskets are small and bounded: TPC-H ≤ 7 lines,
  * retail baskets tens of items), then a codegen'd nested `transform`
  * emits the i<j pairs map-side, so pair generation is O(Σ basket²) with
  * basket bounded, i.e. linear in orders. The alternative — self-joining
  * the (order, item) table with itself on orderkey — shuffles the corpus
  * twice and explodes skewed mega-orders quadratically inside one task;
  * the per-basket form caps that blast radius at basket size. Item
  * marginals reuse the same exploded pairs' source scan; the total-order
  * count joins as a broadcast one-row.
  */
object Baskets {

  /** The distinct (order, item) projection — computed ONCE and shared
    * by the pair stage and the marginals (the module doc's one-scan
    * promise; the same DataFrame instance means Spark reuses the
    * exchange across consumers). */
  private def itemsOf(lineitem: DataFrame, orderCol: String,
      itemCol: String): DataFrame =
    lineitem.select(col(orderCol).as("ok"), col(itemCol).as("pk"))
      .distinct()

  private def coPairsFromItems(items: DataFrame, minSupport: Long): DataFrame =
    // One basket row per order; sort_array makes pair order canonical;
    // i<j pairs generated inside the row (codegen'd lambda, no join).
    items.groupBy(col("ok"))
      .agg(sort_array(collect_set(col("pk"))).as("arr"))
      .select(explode(expr(
        """flatten(transform(arr, (a, i) ->
          |  transform(slice(arr, i + 2, size(arr)), b ->
          |    named_struct('part_a', a, 'part_b', b))))""".stripMargin)).as("p"))
      .select(col("p.part_a"), col("p.part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minSupport)

  /** The co-occurrence pair stage alone: (part_a, part_b, n_pair) with
    * a < b and n_pair >= minSupport — the edge list feeding both
    * [[pairLift]] and graph analytics (Graphs.pageRank). */
  def coPairs(lineitem: DataFrame, minSupport: Long = 2,
      orderCol: String = "l_orderkey", itemCol: String = "l_partkey"): DataFrame =
    coPairsFromItems(itemsOf(lineitem, orderCol, itemCol), minSupport)

  /** Item-pair support + lift from an order-lines table.
    *
    * Output: `part_a, part_b (a < b), n_pair, support, lift` for pairs
    * with `n_pair >= minSupport`; support = n_pair / n_orders, lift =
    * n_pair * n_orders / (n_a * n_b), both rounded to 6. Counts are over
    * DISTINCT (order, item) — duplicate lines of the same part in one
    * order count once, the standard basket semantics.
    */
  def pairLift(lineitem: DataFrame, minSupport: Long = 2,
      orderCol: String = "l_orderkey", itemCol: String = "l_partkey"): DataFrame = {
    val items = itemsOf(lineitem, orderCol, itemCol)
    val pairs = coPairsFromItems(items, minSupport)
    val itemCounts = items.groupBy(col("pk")).agg(count(lit(1)).as("n_item"))
    val nOrders = items.select(col("ok")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val joined = pairs
      .join(itemCounts.withColumnRenamed("pk", "part_a")
        .withColumnRenamed("n_item", "n_a"), Seq("part_a"))
      .join(itemCounts.withColumnRenamed("pk", "part_b")
        .withColumnRenamed("n_item", "n_b"), Seq("part_b"))
      .crossJoin(broadcast(nOrders))
    joined.select(
      col("part_a"), col("part_b"), col("n_pair"),
      round(col("n_pair").cast("double") / col("n_orders").cast("double"), 6)
        .as("support"),
      round(col("n_pair").cast("double") * col("n_orders").cast("double") /
        (col("n_a").cast("double") * col("n_b").cast("double")), 6).as("lift"))
  }

  /** Item-item cosine similarity over the binary basket matrix — the
    * collaborative-filtering "customers also bought" score:
    * cos(a, b) = n_pair / √(n_a·n_b) for co-occurring pairs with
    * `n_pair >= minSupport` (a < b). Same per-basket pair generation as
    * [[pairLift]] (never a corpus self-join); marginals join back on the
    * bounded pair table; one sqrt + one division, round 6.
    */
  def itemCosine(lineitem: DataFrame, minSupport: Long = 2,
      orderCol: String = "l_orderkey", itemCol: String = "l_partkey"): DataFrame = {
    val items = itemsOf(lineitem, orderCol, itemCol)
    val pairs = coPairsFromItems(items, minSupport)
    val itemCounts = items.groupBy(col("pk")).agg(count(lit(1)).as("n_item"))
    pairs
      .join(itemCounts.withColumnRenamed("pk", "part_a")
        .withColumnRenamed("n_item", "n_a"), Seq("part_a"))
      .join(itemCounts.withColumnRenamed("pk", "part_b")
        .withColumnRenamed("n_item", "n_b"), Seq("part_b"))
      .select(col("part_a"), col("part_b"), col("n_pair"),
        round(col("n_pair").cast("double") /
          sqrt(col("n_a").cast("double") * col("n_b").cast("double")), 6)
          .as("cosine"))
  }
}
