package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.{ChangelogGen, GenParams}
import graft.lake.LakeTable
import graft.merge.{MergeInto, MergeOptions}
import graft.model.Schemas
import graft.stream.{CdcIngestJob, IngestConfig}

/**
 * Whole-engine queries (no SQL-expressible DuckDB oracle — the correctness
 * authority for these is the in-memory fold oracle + replay equality in
 * `sbt test`; here the driver gets a rows-only smoke signal).
 */
object EngineQueries {

  /** Scale the synthetic changelog with the sf directory being queried. */
  private def paramsFor(dir: String): GenParams = {
    val n = if (dir.contains("0.1")) 200000L
    else if (dir.contains("0.01")) 50000L
    else 20000L
    GenParams(nEvents = n, nConvs = (n / 80).toInt.max(50),
      eventsPerFile = n / 8, maxLateEvents = (n / 40).toInt)
  }

  /** Full batch CDC ingest: gen -> epoch merges -> final table state. */
  def cdcIngestE2E(s: SparkSession, p: GenParams): DataFrame = {
    val work = Files.createTempDirectory("graft-e2e").toString
    val table = LakeTable.create(s"$work/table", Schemas.turn)
    val ev = ChangelogGen.events(s, p).toDF("wal_file", "ev")
      .select(col("wal_file"), col("ev.*")).cache()
    try {
      val epochs = 4
      (0 until epochs).foreach { e =>
        val batch = ev.filter(pmod(col("wal_file"), lit(epochs)) === e).drop("wal_file")
        MergeInto.merge(s, table, batch, "e2e", e.toLong)
      }
    } finally ev.unpersist()
    table.read(s)
  }

  /** Full streaming CDC ingest over a WAL directory (the flagship). */
  def cdcStreamE2E(s: SparkSession, p: GenParams): DataFrame = {
    val work = Files.createTempDirectory("graft-stream-e2e").toString
    ChangelogGen.writeWal(s, p, s"$work/wal")
    CdcIngestJob.runAvailableNow(s,
      IngestConfig(s"$work/wal", s"$work/table", s"$work/ckpt",
        maxFilesPerTrigger = Some(3)))
    LakeTable.load(s"$work/table").read(s)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cdc_ingest_e2e" -> ((s, dir) => cdcIngestE2E(s, paramsFor(dir))),
    "q_cdc_stream_e2e" -> ((s, dir) =>
      cdcStreamE2E(s, paramsFor(dir).copy(nEvents = 20000L, eventsPerFile = 2500L,
        maxLateEvents = 500))))

  val oracles: Map[String, String] = Map.empty
}
