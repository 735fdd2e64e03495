package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
    }),

    // Rollup (grouping sets): subtotal rows materialized with grouping flags.
    "q_rollup" -> ((s, dir) => {
      tbl(s, dir, "orders")
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n"))
    }),

    // Analytic window frame: centered-on-history moving sum (2 preceding ..
    // current) of an integer-valued measure — exact across engines.
    "q_moving_avg" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(-2, Window.currentRow)
      tbl(s, dir, "lineitem")
        .filter(col("l_suppkey") <= 10)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(col("l_quantity")).over(w).as("qty_3"))
    }),

    // Pivot: per-key counts fanned out to one column per category.
    "q_pivot" -> ((s, dir) => {
      tbl(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
    }),

    // Set ops: intersect / except on key sets (distinct semantics).
    "q_intersect" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
      o.filter(col("o_totalprice") > 200000).select(col("o_custkey"))
        .intersect(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
    }),
    "q_except" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
      o.select(col("o_custkey"))
        .except(o.filter(col("o_totalprice") > 400000).select(col("o_custkey")))
    }),

    // The SQL-text surface (the reference pushes raw SQL strings to external
    // engines, processors/sql_reader.go:16-28; here Catalyst runs them):
    // TPC-H Q3 shape through spark.sql over registered views.
    "q_sql_text" -> ((s, dir) => {
      tbl(s, dir, "customer").createOrReplaceTempView("v_customer")
      tbl(s, dir, "orders").createOrReplaceTempView("v_orders")
      tbl(s, dir, "lineitem").createOrReplaceTempView("v_lineitem")
      s.sql("""
        SELECT o_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM v_customer JOIN v_orders ON c_custkey = o_custkey
                        JOIN v_lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey
        ORDER BY revenue DESC, o_orderkey
        LIMIT 20""")
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
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q_rollup" ->
      """SELECT coalesce(o_orderpriority, 'ALL') AS prio,
                coalesce(o_orderstatus, 'ALL') AS status, count(*) AS n
         FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""",
    "q_moving_avg" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
                sum(l_quantity) OVER (PARTITION BY l_suppkey
                  ORDER BY l_orderkey, l_linenumber
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS qty_3
         FROM lineitem WHERE l_suppkey <= 10""",
    "q_pivot" ->
      """SELECT o_orderpriority,
                CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_f,
                CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_o,
                CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_p
         FROM orders GROUP BY o_orderpriority""",
    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 200000
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""",
    "q_except" ->
      """SELECT o_custkey FROM orders
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_totalprice > 400000""",
    "q_sql_text" ->
      """SELECT o_orderkey,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
                       JOIN lineitem ON l_orderkey = o_orderkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY o_orderkey
         ORDER BY revenue DESC, o_orderkey LIMIT 20""")
}
