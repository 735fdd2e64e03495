package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.merge.MergeInto
import graft.ops.{CdcQueries, RelationalOps}

/**
 * Physical-plan assertions: the properties the 100-TB story depends on must
 * be visible in the plan, not assumed — filter/projection pushdown into the
 * parquet scan, broadcast of dimension sides, hash (not sort) aggregation
 * for the CDC fold, and a single shuffle for the unsalted arg-max.
 */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString()

  test("q_agg_pushdown: filter and projection reach the parquet scan") {
    val p = plan(RelationalOps.queries("q_agg_pushdown")(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"),
      s"filter not pushed to scan:\n$p")
    // projection pruning: scan must not read the unused wide columns
    assert(p.contains("ReadSchema") && !p.contains("l_comment"),
      s"column pruning failed (l_comment read):\n$p")
  }

  test("q_join_enrich: dimension side is broadcast, not shuffled") {
    val p = plan(RelationalOps.queries("q_join_enrich")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("q_latest_by_key: CDC fold partial-aggregates map-side before the shuffle") {
    // built-in max_by carries string buffers => SortAggregate (hash agg
    // impossible); what matters at scale is that the partial aggregate sits
    // below the exchange so hot keys combine map-side.
    val p = plan(CdcQueries.queries("q_latest_by_key")(spark, sf))
    val exIdx = p.indexOf("Exchange")
    val partialIdx = p.indexOf("partial_max")
    assert(exIdx >= 0 && partialIdx > exIdx,
      s"no map-side partial aggregation under the shuffle:\n$p")
  }

  test("unsalted arg-max resolution costs exactly one shuffle") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id").cast("string").as("conv_id"),
        lit(0).as("turn_idx"), col("event_id").as("_lsn"), col("value"))
    val resolved = MergeInto.resolveMaxLsn(df, Seq("conv_id", "turn_idx"), 1)
    val exchanges = "Exchange".r.findAllIn(plan(resolved)).size
    assert(exchanges == 1, s"expected 1 shuffle, saw $exchanges:\n${plan(resolved)}")
    // salted variant adds exactly one more (the pre-reduce)
    val salted = MergeInto.resolveMaxLsn(df, Seq("conv_id", "turn_idx"), 16)
    val saltedEx = "Exchange".r.findAllIn(plan(salted)).size
    assert(saltedEx == 2, s"expected 2 shuffles for salted, saw $saltedEx")
  }

  test("MoR read: delta fold is one ObjectHashAggregate shuffle, no sort") {
    import org.apache.spark.sql.functions._
    import graft.lake.LakeTable
    import graft.merge.{MergeInto, MergeMode, MergeOptions}
    import spark.implicits._
    val dir = TestSpark.tmpDir("plan-mor")
    val table = LakeTable.create(s"$dir/t", graft.model.Schemas.turn)
    val mor = MergeOptions(mode = MergeMode.Mor,
      morCompactDeltaRatio = 1e9, morCompactMaxDeltaFiles = Int.MaxValue)
    val b = Seq(("I", 1L, "c1", 0, "user", "x", None: Option[String],
      java.sql.Timestamp.valueOf("2025-01-01 00:00:00")))
      .toDF("op", "lsn", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    MergeInto.merge(spark, table, b, "ck", 0L, mor)
    MergeInto.merge(spark, table, b.withColumn("lsn", lit(2L)), "ck", 1L, mor)
    val p = plan(table.read(spark))
    // the consumer-facing fold must hash-aggregate (map-side combine), never
    // fall into max_by's SortAggregate, and cost exactly one shuffle
    assert(p.contains("ObjectHashAggregate"), s"expected hash agg fold:\n$p")
    assert(!p.contains("SortAggregate"), s"SortAggregate in read path:\n$p")
    val ex = "Exchange".r.findAllIn(p).size
    assert(ex == 1, s"expected 1 shuffle in MoR read, saw $ex:\n$p")
  }

  test("sparse resolution: all per-column folds share one key clustering") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id").cast("string").as("conv_id"),
        (col("event_id") % 5).cast("int").as("turn_idx"),
        col("event_id").as("_lsn"), lit(false).as("_deleted"),
        col("value"), col("event_type"),
        map_from_arrays(array(lit("value"), lit("event_type")),
          array(col("event_id"), col("event_id"))).as("_cell_lsn"))
    val p = plan(MergeInto.resolveSparse(
      df.repartition(8, col("conv_id"), col("turn_idx")),
      Seq("conv_id", "turn_idx"), Seq("value", "event_type")))
    // the caller's hash exchange must satisfy every window's clustering:
    // one shuffle total, however many payload columns fold
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 shuffle in sparse resolve, saw $exchanges:\n$p")
  }

  test("sparse AGG resolution: one ObjectHashAggregate shuffle, no sort, no window") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id").cast("string").as("conv_id"),
        (col("event_id") % 5).cast("int").as("turn_idx"),
        col("event_id").as("_lsn"), lit(false).as("_deleted"),
        col("value"), col("event_type"),
        map_from_arrays(array(lit("value"), lit("event_type")),
          array(col("event_id"), col("event_id"))).as("_cell_lsn"),
        lit(null).cast("long").as("_del_lsn"))
    val p = plan(MergeInto.resolveSparseAgg(df,
      Seq("conv_id", "turn_idx"), Seq("value", "event_type")))
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 shuffle in sparse agg resolve, saw $exchanges:\n$p")
    assert(p.contains("ObjectHashAggregate"),
      s"native arg-max should run in ObjectHashAggregate:\n$p")
    assert(!p.contains("SortAggregate"), s"SortAggregate fallback:\n$p")
    assert(!p.contains("Window"), s"agg form must not plan windows:\n$p")
  }

  test("sort-dedup resolution: one exchange, one sort, rank-limit pushdown") {
    import org.apache.spark.sql.functions._
    // real (non-literal) key columns: a folded literal key would drop out of
    // the window's partition spec and break the partitioning match
    val df = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id").cast("string").as("conv_id"),
        (col("event_id") % 5).cast("int").as("turn_idx"),
        col("event_id").as("_lsn"), col("value"))
    val p = plan(MergeInto.resolveSortDedup(df, Seq("conv_id", "turn_idx"), 8))
    val exchanges = "Exchange".r.findAllIn(p).size
    val sorts = "Sort ".r.findAllIn(p).size
    // The range exchange must double as the window's clustering — a second
    // (hash) exchange would mean EnsureRequirements didn't accept it.
    assert(exchanges == 1, s"expected 1 shuffle, saw $exchanges:\n$p")
    assert(sorts == 1, s"expected 1 sort, saw $sorts:\n$p")
    // WindowGroupLimit drops losing rows before full window evaluation
    assert(p.contains("WindowGroupLimit"), s"rank-limit pushdown missing:\n$p")
  }
}
