package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Relational coverage over the TPC-H-ish tables: joins (broadcast / semi /
 * anti), aggregation with pushdown-friendly shape, and top-k. The reference
 * delegates all of this to external SQL engines (SURVEY.md §2.6 "Joins");
 * here they are explicit Catalyst plans — dimension sides broadcast, filters
 * and projections land in the parquet scan.
 */
object RelationalOps {

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Fact-dim equi-join with an explicitly broadcast dimension.
    "q_join_enrich" -> ((s, dir) => {
      val orders = tbl(s, dir, "orders")
      val customer = tbl(s, dir, "customer")
      orders.join(broadcast(customer),
        orders("o_custkey") === customer("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
    }),

    // EXISTS as left-semi (touched-file-pruning join shape in the merge).
    "q_semi_join" -> ((s, dir) => {
      val orders = tbl(s, dir, "orders")
      val lineitem = tbl(s, dir, "lineitem")
      orders.join(lineitem, orders("o_orderkey") === lineitem("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
    }),

    // NOT EXISTS as left-anti (customers with no high-value order).
    "q_anti_join" -> ((s, dir) => {
      val customer = tbl(s, dir, "customer")
      val bigOrders = tbl(s, dir, "orders").filter(col("o_totalprice") > 400000)
      customer.join(bigOrders, customer("c_custkey") === bigOrders("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // TPC-H Q1 shape: scan-side projection + filter pushdown, 2-key agg.
    "q_agg_pushdown" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // Sort + limit (top-k) with deterministic tie-break.
    "q_topk_orders" -> ((s, dir) => {
      tbl(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(10)
    }))

  val oracles: Map[String, String] = Map(
    "q_join_enrich" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "q_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
         GROUP BY o_orderpriority""",
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 400000)""",
    "q_agg_pushdown" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*) AS n_rows
         FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus""",
    "q_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")
}
