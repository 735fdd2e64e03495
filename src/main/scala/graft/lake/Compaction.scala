package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Small-file compaction: rewrite fragmented data files into
 * `targetRowsPerFile`-sized, key-range-partitioned files WITHOUT changing
 * logical table state (same rows, same tombstones, same schema).
 *
 * Why it exists: every streaming epoch commits at least one file per touched
 * key range, so a long-running ingest accumulates many small files; scan cost
 * and manifest size then grow with epoch count, not data size. Compaction
 * restores O(data/targetRowsPerFile) files and re-tightens per-file key
 * bounds, keeping merge-time file pruning effective. (The reference has no
 * analogue — its sink is an external DB; this is the lake-format maintenance
 * op that role requires.)
 *
 * Safe to run between epochs: it commits through the same atomic snapshot
 * rename as merges, and preserves the epoch ledger, so exactly-once
 * accounting is unaffected.
 */
object CompactionStats {
  val empty: CompactionStats = CompactionStats(0, 0, 0, 0)
}
final case class CompactionStats(
    filesBefore: Int,
    filesAfter: Int,
    rowsRewritten: Long,
    wallMs: Long)

object Compaction {

  /**
   * Rewrite all files smaller than `smallFileRows` (plus nothing else) into
   * target-sized files. Files already at/above the threshold are carried over
   * untouched — compaction cost is proportional to the small-file tail, not
   * table size.
   */
  def compact(
      spark: SparkSession,
      table: LakeTable,
      keyCols: Seq[String] = Seq("conv_id", "turn_idx"),
      targetRowsPerFile: Long = 500000L,
      smallFileRows: Long = 250000L): CompactionStats = {
    val t0 = System.nanoTime()
    val snap = table.currentSnapshot
    val (small, big) = snap.files.partition(_.rows < smallFileRows)
    if (small.size <= 1) return CompactionStats.empty

    val schema = snap.schema
    val rows = small.map(_.rows).sum
    val nOut = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    val newVersion = snap.version + 1
    val outDir = s"${table.dir}/data/v$newVersion"

    spark.read.schema(schema).parquet(small.map(_.path): _*)
      .repartitionByRange(nOut, keyCols.map(col): _*)
      .sortWithinPartitions((keyCols.map(col) :+ col(LakeTable.LsnCol)): _*)
      .write.mode("overwrite").parquet(outDir)

    val newFiles = graft.merge.FileStats
      .fromFooters(spark, outDir, keyCols.head, newVersion)
      .getOrElse(graft.merge.FileStats.fromScan(spark, outDir, schema,
        keyCols.head, newVersion))

    table.commit(Snapshot(newVersion, snap.version, snap.schemaJson,
      big ++ newFiles, snap.epochs))
    CompactionStats(snap.files.size, big.size + newFiles.size, rows,
      (System.nanoTime() - t0) / 1000000L)
  }
}
