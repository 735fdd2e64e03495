package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.lake.{Compaction, LakeTable}
import graft.merge.{MergeInto, MergeMode, MergeOptions}
import graft.model.Schemas

/**
 * `spark.readStream.format("graft")`: the table's CDC-out feed as a
 * Structured Streaming source — delivers exactly the change rows of
 * `readChangesBetween`, resumes from the engine checkpoint without
 * re-delivery, honors `startingVersion`, and surfaces the lake's named
 * retention error when the requested history fell behind vacuum.
 */
class GraftStreamSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val ts = Timestamp.valueOf("2025-01-01 00:00:00")
  private val mor = MergeOptions(mode = MergeMode.Mor)

  private def batch(rows: Seq[(String, Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (op, lsn, k, text) =>
      (op, lsn, k, 0, "user", text, None: Option[String], ts)
    }.toDF("op", "lsn", "conv_id", "turn_idx", "role", "text", "tool", "ts")
  }

  /** canonical change-row image: key|text|lsn|deleted */
  private def canon(df: DataFrame): Seq[String] =
    df.selectExpr("conv_id", "text", "_lsn", "_deleted").collect()
      .map(_.mkString("|")).toSeq.sorted

  /** run the stream to AvailableNow completion, appending into sinkDir */
  private def drain(upDir: String, ckpt: String, sinkDir: String,
      options: Map[String, String] = Map.empty): Unit = {
    val q = spark.readStream.format("graft").options(options).load(upDir)
      .writeStream.format("parquet").option("path", sinkDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))
  }

  test("stream delivers the change feed, resumes from checkpoint, no re-delivery") {
    val work = TestSpark.tmpDir("gss")
    val up = s"$work/up"
    LakeTable.create(up, Schemas.turn)
    val table = LakeTable.load(up)
    val keys = (0 until 15).map(i => f"k$i%03d")
    MergeInto.merge(spark, table,
      batch(keys.zipWithIndex.map { case (k, i) => ("I", 1L + i, k, s"v0-$k") }),
      "up", 0L, mor)
    MergeInto.merge(spark, table,
      batch(Seq(("U", 100L, keys(0), "v1"), ("D", 101L, keys(1), null))),
      "up", 1L, mor)

    drain(up, s"$work/ckpt", s"$work/sink")
    val got = spark.read.parquet(s"$work/sink")
    assert(got.schema.fieldNames.toSeq ==
      table.payloadSchema.fieldNames.toSeq ++ Seq("_lsn", "_deleted"))
    assert(canon(got) == canon(table.readChangesSince(spark, 0L)),
      "streamed rows must equal the batch change feed")
    assert(got.count() == 17) // 15 inserts + 1 update + 1 tombstone

    // more upstream commits, same checkpoint: ONLY the new versions arrive
    MergeInto.merge(spark, table,
      batch(Seq(("U", 200L, keys(2), "v2"), ("I", 201L, "k999", "new"))),
      "up", 2L, mor)
    drain(up, s"$work/ckpt", s"$work/sink")
    val after = spark.read.parquet(s"$work/sink")
    assert(after.count() == 19, "resume must deliver exactly the 2 new rows")
    assert(canon(after) == canon(table.readChangesSince(spark, 0L)))

    // no new commits: a third run delivers nothing (fold/maintenance commits
    // also contribute nothing — delta=false files are skipped by the feed)
    Compaction.foldDeltas(spark, table)
    drain(up, s"$work/ckpt", s"$work/sink")
    assert(spark.read.parquet(s"$work/sink").count() == 19,
      "maintenance commits must not re-deliver rows")
  }

  test("maxVersionsPerBatch paces catch-up; AvailableNow drains the pinned head in chunks") {
    val work = TestSpark.tmpDir("gss-adm")
    val up = s"$work/up"
    LakeTable.create(up, Schemas.turn)
    val table = LakeTable.load(up)
    MergeInto.merge(spark, table,
      batch(Seq(("I", 1L, "a", "a0"), ("I", 2L, "b", "b0"))), "up", 0L, mor)
    MergeInto.merge(spark, table,
      batch(Seq(("U", 10L, "a", "a1"))), "up", 1L, mor)
    MergeInto.merge(spark, table,
      batch(Seq(("D", 20L, "b", null), ("I", 21L, "c", "c0"))), "up", 2L, mor)

    drain(up, s"$work/ckpt", s"$work/sink",
      Map("maxVersionsPerBatch" -> "1"))
    assert(canon(spark.read.parquet(s"$work/sink")) ==
      canon(table.readChangesSince(spark, 0L)),
      "paced catch-up must still deliver the complete feed")
    // one micro-batch per upstream version: the offset log proves the
    // admission limit actually chunked the drain (the old fallback path
    // processed everything as a single batch)
    val offsetLog = new java.io.File(s"$work/ckpt/offsets").listFiles
      .count(f => f.getName.forall(_.isDigit))
    assert(offsetLog >= 3, s"expected >=3 admission-limited batches, " +
      s"offset log has $offsetLog entries")
  }

  test("startingVersion=latest tails only new commits; retention error is named") {
    val work = TestSpark.tmpDir("gss-start")
    val up = s"$work/up"
    LakeTable.create(up, Schemas.turn)
    val table = LakeTable.load(up)
    MergeInto.merge(spark, table,
      batch(Seq(("I", 1L, "old", "o"))), "up", 0L, mor)

    // latest: the pre-existing row is skipped, only post-start commits flow
    val opts = Map("startingVersion" -> "latest")
    // capture "latest" at stream definition time, then commit one more epoch
    val q = spark.readStream.format("graft").options(opts).load(up)
      .writeStream.format("parquet").option("path", s"$work/sink")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val sinkSchema = graft.spark.GraftStreamSource.changeSchema(table)
    assert(spark.read.schema(sinkSchema).parquet(s"$work/sink").count() == 0)
    MergeInto.merge(spark, table,
      batch(Seq(("U", 2L, "old", "o2"))), "up", 1L, mor)
    drain(up, s"$work/ckpt", s"$work/sink", opts)
    assert(canon(spark.read.parquet(s"$work/sink")) ==
      canon(table.readChangesBetween(spark, 1L, 2L)))

    // history aged out below the requested start -> the lake's NAMED error
    (2 to 5).foreach { e =>
      MergeInto.merge(spark, table,
        batch(Seq(("U", 10L + e, "old", s"v$e"))), "up", e.toLong, mor)
    }
    Compaction.vacuum(table, retainVersions = 1, orphanMinAgeMs = 0L)
    val ex = intercept[StreamingQueryException] {
      val bad = spark.readStream.format("graft").load(up)
        .writeStream.format("parquet").option("path", s"$work/sink2")
        .option("checkpointLocation", s"$work/ckpt2")
        .trigger(Trigger.AvailableNow()).start()
      bad.awaitTermination()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("vacuumed past the retention floor"), msgs)
  }
}
