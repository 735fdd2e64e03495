package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

import graft.model.Schemas

/**
 * Streaming operators beyond the ingest loop — the declarative replacements
 * for the reference's accumulate-then-emit custom processors
 * (DataProcessor.Finish, /root/reference/data_processor.go:21-25) and its
 * per-stage counters (/root/reference/execution_stat.go:9-48), upgraded with
 * what the reference lacks entirely (SURVEY.md §2.6 "Streaming"): event time,
 * watermarks, windows, and checkpointable state.
 */
object StreamOps {

  /** Per-conversation running state maintained by mapGroupsWithState. */
  final case class ConvState(
      conv_id: String,
      n_events: Long,
      max_lsn: Long,
      n_deletes: Long)

  def walStream(spark: SparkSession, walDir: String,
      schema: StructType = Schemas.changeV2,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    var src = spark.readStream.schema(schema).option("recursiveFileLookup", "true")
    maxFilesPerTrigger.foreach(n => src = src.option("maxFilesPerTrigger", n))
    src.parquet(walDir)
  }

  /**
   * Watermarked tumbling-window aggregation over the change feed: events and
   * distinct-conv counts per event-time window. Watermark bounds window state;
   * late events beyond it are dropped from these *telemetry* windows (the
   * table state itself never loses them — the merge is idempotent).
   */
  def windowedChangeCounts(
      changes: DataFrame,
      windowDur: String = "10 minutes",
      watermarkDelay: String = "2 hours"): DataFrame =
    changes
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur), col("op"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct(col("conv_id")).as("n_convs_approx"))
      .select(col("window.start").as("win_start"), col("op"),
        col("n_events"), col("n_convs_approx"))

  /**
   * Custom keyed state: running per-conversation counters via
   * mapGroupsWithState (exact per-key fold across micro-batches, checkpointed
   * with the query). Update-mode output; the latest emission per key is the
   * current state.
   */
  def runningConvState(changes: DataFrame): Dataset[ConvState] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .select(col("conv_id"), col("lsn").cast("long"), col("op"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (conv: String, it: Iterator[(String, Long, String)], state: GroupState[ConvState]) =>
          var s = state.getOption.getOrElse(ConvState(conv, 0L, Long.MinValue, 0L))
          it.foreach { case (_, lsn, op) =>
            s = s.copy(
              n_events = s.n_events + 1,
              max_lsn = math.max(s.max_lsn, lsn),
              n_deletes = s.n_deletes + (if (op == "D") 1L else 0L))
          }
          state.update(s)
          s
      }
  }

  /** Run a windowed-counts query to completion (complete mode, memory sink). */
  def runWindowedCounts(spark: SparkSession, walDir: String, ckptDir: String,
      name: String): DataFrame = {
    val q = windowedChangeCounts(walStream(spark, walDir))
      .writeStream.queryName(name).format("memory")
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Run the keyed-state query to completion; final state per key. */
  def runRunningConvState(spark: SparkSession, walDir: String, ckptDir: String,
      name: String, maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val q = runningConvState(walStream(spark, walDir, maxFilesPerTrigger = maxFilesPerTrigger))
      .writeStream.queryName(name).format("memory")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // n_events is monotone per key, so the max-n_events emission is the final
    // state for that key (update-mode memory sink keeps every emission).
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("conv_id")).orderBy(col("n_events").desc)
    spark.table(name)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }
}
