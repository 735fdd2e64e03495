package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.{ChangelogGen, GenParams}
import graft.merge.MergeInto

/**
 * The native max_row_by_long aggregate is a drop-in for max_by: identical
 * results on the real changelog workload (dups, deletes, hot keys, nulls in
 * payload columns), under any salting, and it must run as hash-based
 * aggregation (the whole point).
 */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def events = {
    val p = GenParams(nEvents = 30000, nConvs = 200, eventsPerFile = 5000,
      maxLateEvents = 500)
    ChangelogGen.events(spark, p).toDF("wal_file", "ev")
      .select(col("ev.*"))
      .withColumnRenamed("lsn", "_lsn")
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map((r: Row) => r.toSeq).sortBy(_.mkString("|"))

  test("native arg-max == max_by on the changelog workload, salted and not") {
    val ev = events
    val keys = Seq("conv_id", "turn_idx")
    for (salt <- Seq(1, 16)) {
      val native = canon(MergeInto.resolveMaxLsn(ev, keys, salt, useNative = true))
      val builtin = canon(MergeInto.resolveMaxLsn(ev, keys, salt, useNative = false))
      assert(native == builtin, s"divergence at saltBuckets=$salt")
    }
  }

  test("native arg-max plan is hash-based (no SortAggregate) and 1 shuffle") {
    val plan = MergeInto.resolveMaxLsn(events, Seq("conv_id", "turn_idx"), 1)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("ObjectHashAggregate"), s"expected object hash agg:\n$plan")
    assert(!plan.contains("SortAggregate"), s"unexpected sort agg:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1)
  }

  test("native arg-max survives shuffle-serialization (partial buffers cross the wire)") {
    // force tiny input partitions so partial buffers are serialized/merged
    val ev = events.repartition(37)
    val keys = Seq("conv_id", "turn_idx")
    val a = canon(MergeInto.resolveMaxLsn(ev, keys, 1, useNative = true))
    val b = canon(MergeInto.resolveMaxLsn(events, keys, 1, useNative = false))
    assert(a == b)
  }
}
