package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.{ChangelogGen, GenParams}
import graft.stream.StreamOps

/**
 * Streaming operators agree with their batch equivalents on the same WAL:
 * windowed event-time aggregation (watermarks bound state, AvailableNow
 * drains everything) and mapGroupsWithState custom keyed state.
 */
class StreamOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val p = GenParams(nEvents = 6000, nConvs = 80, eventsPerFile = 1500,
    maxLateEvents = 200)

  test("windowed change counts (streaming, complete mode) == batch window agg") {
    val work = TestSpark.tmpDir("streamops-win")
    ChangelogGen.writeWal(spark, p, s"$work/wal")

    val got = StreamOps.runWindowedCounts(spark, s"$work/wal", s"$work/ckpt", "win_counts")
      .select(col("win_start").cast("long"), col("op"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

    val batch = spark.read.schema(graft.model.Schemas.changeV2)
      .option("recursiveFileLookup", "true").parquet(s"$work/wal")
      .groupBy(window(col("ts"), "10 minutes"), col("op"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").cast("long"), col("op"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

    assert(got == batch, s"windowed counts differ: ${got.size} vs ${batch.size} windows")
    assert(got.nonEmpty)
  }

  test("mapGroupsWithState running conv state == batch fold, across micro-batches") {
    val work = TestSpark.tmpDir("streamops-state")
    ChangelogGen.writeWal(spark, p, s"$work/wal")

    val got = StreamOps.runRunningConvState(spark, s"$work/wal", s"$work/ckpt",
      "conv_state", maxFilesPerTrigger = Some(1))
      .collect().map(r => r.getAs[String]("conv_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("max_lsn"), r.getAs[Long]("n_deletes"))))
      .toMap

    val batch = spark.read.schema(graft.model.Schemas.changeV2)
      .option("recursiveFileLookup", "true").parquet(s"$work/wal")
      .groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n"), max(col("lsn")).as("mx"),
        sum(when(col("op") === "D", 1L).otherwise(0L)).as("d"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

    assert(got == batch, "keyed state must equal the batch fold")
    // multiple micro-batches actually happened (state crossed batch boundaries)
    assert(p.nFiles > 1)
  }
}
