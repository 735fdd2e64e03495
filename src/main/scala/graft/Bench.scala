package graft

import org.apache.spark.sql.SparkSession

import graft.gen.{ChangelogGen, GenParams}
import graft.stream.{CdcIngestJob, IngestConfig}

/**
 * Per-round benchmark (driver contract: ONE JSON line on stdout).
 *
 * Two parts:
 *  1. operator queries from SparkEntry at `SPARK_GRAFT_SF_DIR`, timed at
 *     local[SPARK_GRAFT_CPUS] (default 32);
 *  2. the headline north-rule metric: sustained CDC upsert throughput
 *     (change-events/sec) of the streaming ingest job, measured on the SAME
 *     synthetic changelog at two parallelism levels (local[N] and local[4N]),
 *     with shuffle partitions scaled to cores — the sandbox evidence for the
 *     N -> 4N executor scaling-efficiency >= 0.8 criterion (BASELINE.md).
 *
 * Event count is env-tunable (`SPARK_GRAFT_BENCH_EVENTS`); the default is
 * large enough that per-epoch fixed overheads don't mask scaling.
 */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Ingest `p`'s WAL (already written to walDir) at `cores`; events/sec. */
  private def ingestEps(cores: Int, walDir: String, work: String, p: GenParams): Double = {
    val spark = session(cores)
    try {
      val t0 = System.nanoTime()
      CdcIngestJob.runAvailableNow(spark,
        IngestConfig(walDir, s"$work/table$cores", s"$work/ckpt$cores",
          maxFilesPerTrigger = Some(math.max(1, p.nFiles / 8))))
      p.nEvents.toDouble / ((System.nanoTime() - t0) / 1e9)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_BENCH_EVENTS", "2000000").toLong
    val coresLo = math.max(1, cpus / 4)

    // --- part 1: operator query timings at full parallelism ----------------
    var spark = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // --- part 2: scaling — same WAL ingested at N and 4N cores -------------
    val work = java.nio.file.Files.createTempDirectory("graft-bench").toString
    val p = GenParams(nEvents = nEvents, nConvs = (nEvents / 200).toInt.max(100),
      eventsPerFile = math.max(1L, nEvents / 32), maxLateEvents = 2000)
    ChangelogGen.writeWal(spark, p, s"$work/wal")
    spark.stop()

    val epsLo = ingestEps(coresLo, s"$work/wal", work, p)
    val epsHi = ingestEps(cpus, s"$work/wal", work, p)
    val eff = (epsHi / epsLo) / (cpus.toDouble / coresLo)

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","ingest":{"events":$nEvents,"cores_lo":$coresLo,"events_per_sec_lo":$epsLo%.0f,"cores_hi":$cpus,"events_per_sec_hi":$epsHi%.0f,"scaling_efficiency":$eff%.3f}}""")
  }
}
