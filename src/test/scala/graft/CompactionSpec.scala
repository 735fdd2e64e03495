package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.{ChangelogGen, GenParams}
import graft.lake.{Compaction, LakeTable}
import graft.merge.{MergeInto, MergeOptions}
import graft.model.Schemas
import org.apache.spark.sql.functions._

/** Compaction changes the file layout, never the logical table state. */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("compaction: fewer files, identical state, ledger preserved") {
    val work = TestSpark.tmpDir("compaction")
    val p = GenParams(nEvents = 20000, nConvs = 150, eventsPerFile = 2000,
      maxLateEvents = 300)
    val table = LakeTable.create(s"$work/t", Schemas.turn)
    val ev = ChangelogGen.events(spark, p).toDF("wal_file", "ev")
      .select(col("wal_file"), col("ev.*")).cache()
    // many tiny epochs with tiny target files => fragmented layout
    val fragOpts = MergeOptions(targetRowsPerFile = 500L, minRowsPerFile = 1L)
    (0 until 10).foreach { e =>
      MergeInto.merge(spark, table,
        ev.filter(pmod(col("wal_file"), lit(10)) === e).drop("wal_file"),
        "cmp", e.toLong, fragOpts)
    }
    ev.unpersist()

    def state(): Seq[Seq[Any]] = {
      val df = table.read(spark)
      val cols = df.columns.sorted
      df.selectExpr(cols: _*).collect().toSeq.map((r: Row) => r.toSeq)
        .sortBy(_.mkString("|"))
    }

    val before = state()
    val filesBefore = table.currentFiles.size
    val epochsBefore = table.currentSnapshot.epochHwm

    val stats = Compaction.compact(spark, table, targetRowsPerFile = 50000L,
      smallFileRows = 50000L)
    assert(stats.filesAfter < stats.filesBefore,
      s"expected fewer files: ${stats.filesBefore} -> ${stats.filesAfter}")
    assert(table.currentFiles.size < filesBefore)

    // logical state is bit-for-bit unchanged
    assert(state() == before, "compaction must not change table contents")
    // exactly-once ledger survives (replays still no-op after compaction)
    assert(table.currentSnapshot.epochHwm == epochsBefore)
    // vacuum: retain 2 versions -> older snapshots + orphaned files go,
    // current state and recent time travel survive
    val before2 = state()
    val vCur = table.currentVersion
    val liveCount = table.currentFiles.size
    val (filesGone, snapsGone) = Compaction.vacuum(table, retainVersions = 2)
    assert(snapsGone > 0, "expected old snapshots removed")
    assert(filesGone > 0, "expected orphaned data files removed")
    assert(state() == before2, "vacuum must not change current contents")
    assert(table.currentFiles.size == liveCount)
    assert(table.readAt(spark, vCur - 1).count() >= 0) // retained version reads
    // history beyond the window fails with a CLEAR retention error (never a
    // raw NoSuchFileException or a mid-scan FNF)
    val exv = intercept[IllegalStateException](table.readAt(spark, 0L))
    assert(exv.getMessage.contains("vacuumed past the retention floor"),
      exv.getMessage)
    // live data files all still exist on disk
    table.currentFiles.foreach { f =>
      val p = if (f.path.startsWith("file:"))
        java.nio.file.Paths.get(java.net.URI.create(f.path).getPath)
      else java.nio.file.Paths.get(f.path)
      assert(java.nio.file.Files.exists(p), s"live file deleted: ${f.path}")
    }

    val replay = MergeInto.merge(spark, table,
      table.read(spark).limit(0).withColumn("op", lit("I")).withColumn("lsn", lit(0L)),
      "cmp", 3L)
    assert(replay.noop, "epoch replay after compaction must remain a no-op")

    // merges still work after compaction (bounds stayed tight)
    val extra = ChangelogGen.events(spark, p.copy(nEvents = p.nEvents + 500))
      .toDF("wal_file", "ev").select(col("ev.*"))
      .filter(col("lsn") >= p.nEvents)
    val st = MergeInto.merge(spark, table, extra, "cmp", 99L)
    assert(!st.noop && st.batchRows > 0)
  }
}
