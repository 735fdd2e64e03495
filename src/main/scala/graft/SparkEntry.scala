package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.gen.GenParams
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /**
   * Flagship: the CDC ingest loop of the north rule at smoke scale —
   * deterministic changelog -> WAL -> streaming ingest (watermarked lsn
   * dedup, exactly-once epoch merges) -> final transcript table.
   */
  def entry(spark: SparkSession): DataFrame =
    EngineQueries.cdcStreamE2E(spark,
      GenParams(nEvents = 10000, nConvs = 120, eventsPerFile = 2000,
        maxLateEvents = 300))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CdcQueries.queries ++ TextOps.queries ++ SimilarityOps.queries ++
      RelationalOps.queries ++ Multimodal.queries ++ EngineQueries.queries ++
      SinkOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (engine e2e, LSH/minhash/simhash, multimodal stub) — those are
    * verified by the fold-oracle + replay tests in `sbt test`.
    * Default tier substitution: SPARK_GRAFT_SF_DIR or sf0.01 (the driver's
    * correctness tier); Verify re-emits with its actual sf argument. */
  def oracleSql: Map[String, String] =
    oracleSqlFor(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))

  /** Oracle SQL with path placeholders bound to the given sf directory —
    * oracles that read files directly (read_blob) must point at the same
    * corpus the Spark query ran on, whatever the tier. */
  def oracleSqlFor(sfDir: String): Map[String, String] =
    (CdcQueries.oracles ++ TextOps.oracles ++ SimilarityOps.oracles ++
      RelationalOps.oracles ++ Multimodal.oracles ++ EngineQueries.oracles ++
      SinkOps.oracles).map { case (k, v) => k -> v.replace("__SF_DIR__", sfDir) }
}
