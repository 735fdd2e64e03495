package graft.merge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.lake.{DataFile, LakeTable, SchemaMerge, Snapshot}

/**
 * Key-partitioned MERGE INTO (copy-on-write upsert) — the Spark-native
 * replacement for the reference's `SQLWriter` + `ON DUPLICATE KEY UPDATE`
 * load path (/root/reference/processors/sql_writer.go:21-80,
 * /root/reference/util/sql.go:246-298), which delegates key-equality merge to
 * MySQL. Here the merge is an explicit distributed plan.
 *
 * Plan shape (chosen for 100 TB scale, see explain notes in MergeSpec):
 *
 *   1. File pruning: only target files whose (minKey, maxKey) bounds intersect
 *      the batch's key set are read and rewritten; everything else is carried
 *      over in the manifest untouched. Manifest pruning happens on the driver
 *      against snapshot metadata — no data read for untouched files.
 *   2. Conflict resolution: because the rule is max-LSN-wins with a globally
 *      unique lsn, MERGE degenerates to an associative/commutative arg-max
 *      fold. We therefore use ONE hash aggregate over (touched target rows
 *      UNION normalized batch rows) instead of a full-outer join — map-side
 *      partial aggregation halves the shuffle, and no join strategy/skew
 *      machinery is needed. (A full-outer SMJ would shuffle both sides and
 *      cannot be broadcast.)
 *   3. Explicit skew salting: hot keys (e.g. one conv_id receiving 20% of all
 *      events) are first reduced per (key, salt = hash(lsn) % k) bucket, then
 *      re-reduced per key. Correct because arg-max is associative; bounds the
 *      per-reducer row count for any key. Layered on top of AQE, per the
 *      north rule.
 *   4. Deletes write tombstones (_deleted = true, _lsn = delete's lsn) so a
 *      late-arriving lower-lsn insert can never resurrect a deleted key —
 *      required for replay determinism under out-of-order delivery.
 *   5. Exactly-once: the (checkpointId, epochId) ledger in the snapshot makes
 *      re-delivered micro-batches no-ops; the commit itself is an atomic
 *      rename.
 *
 * Output files are range-partitioned and sorted by (key, lsn) so per-file key
 * bounds stay tight (pruning effectiveness) and file contents are
 * deterministic given the same final row set.
 */
final case class MergeOptions(
    keyCols: Seq[String] = Seq("conv_id", "turn_idx"),
    lsnCol: String = "lsn",
    opCol: String = "op",
    deleteOp: String = "D",
    saltBuckets: Int = 16,
    targetRowsPerFile: Long = 500000L,
    /** parallelism floor only applies while files stay above this size */
    minRowsPerFile: Long = 10000L,
    /** max #distinct first-key values collected to the driver for pruning */
    collectKeysLimit: Int = 100000)

final case class MergeStats(
    ckptId: String,
    epochId: Long,
    snapshotVersion: Long,
    batchRows: Long,
    batchMinLsn: Long,
    batchMaxLsn: Long,
    outputRows: Long,
    tombstones: Long,
    filesRewritten: Int,
    filesPruned: Int,
    filesAdded: Int,
    wallMs: Long,
    noop: Boolean)

object MergeInto {
  import LakeTable.{DeletedCol, LsnCol}

  /**
   * Merge one change batch into the table under (ckptId, epochId) idempotence.
   * Batch columns: opCol, lsnCol + payload columns (superset-merged into the
   * table schema; missing payload columns read as null).
   */
  def merge(
      spark: SparkSession,
      table: LakeTable,
      batch: DataFrame,
      ckptId: String,
      epochId: Long,
      opts: MergeOptions = MergeOptions()): MergeStats = {
    val t0 = System.nanoTime()
    val snap = table.currentSnapshot
    val epochKey = s"$ckptId:$epochId"
    if (snap.epochs.contains(epochKey)) {
      // exactly-once: replayed epoch is a no-op
      return MergeStats(ckptId, epochId, snap.version, 0, -1, -1, 0, 0, 0,
        snap.files.size, 0, 0, noop = true)
    }

    val keyCols = opts.keyCols
    val batchPayload = StructType(batch.schema.fields.filterNot(f =>
      f.name == opts.opCol || f.name == opts.lsnCol))
    val mergedPayload = SchemaMerge.merge(tablePayload(snap), batchPayload)
    val storedSchema = StructType(mergedPayload.fields.toSeq ++ LakeTable.metaFields)

    // Normalize the batch to stored shape: payload (nulls for D rows except
    // keys, nulls for columns the batch doesn't carry), _lsn, _deleted.
    val isDelete = col(opts.opCol) === lit(opts.deleteOp)
    val batchCols = batch.columns.toSet
    val payloadExprs = mergedPayload.fields.toSeq.map { f =>
      if (!batchCols.contains(f.name)) lit(null).cast(f.dataType).as(f.name)
      else if (keyCols.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else when(isDelete, lit(null).cast(f.dataType))
        .otherwise(col(f.name).cast(f.dataType)).as(f.name)
    }
    val bNorm = batch.select(payloadExprs ++ Seq(
      col(opts.lsnCol).cast(LongType).as(LsnCol),
      isDelete.as(DeletedCol)): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)

    try {
      val Array(bRows, bMinLsn, bMaxLsn) = {
        val r = bNorm.agg(count(lit(1)), min(col(LsnCol)), max(col(LsnCol))).head()
        Array(r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))
      }

      if (bRows == 0) {
        val next = snap.copy(version = snap.version + 1, parentVersion = snap.version,
          epochs = snap.epochs :+ epochKey)
        table.commit(next)
        return MergeStats(ckptId, epochId, next.version, 0, -1, -1, 0, 0, 0,
          snap.files.size, 0, millisSince(t0), noop = false)
      }

      // --- file pruning against manifest key bounds -------------------------
      val (touched, untouched) = pruneFiles(snap, bNorm, keyCols.head, opts)

      // --- union + salted two-phase arg-max ---------------------------------
      val target =
        if (touched.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            storedSchema)
        else
          spark.read.schema(storedSchema).parquet(touched.map(_.path): _*)
      val resolved = resolveMaxLsn(target.unionByName(bNorm), keyCols, opts.saltBuckets)

      // --- copy-on-write write, range-partitioned on the key ---------------
      val newVersion = snap.version + 1
      val outDir = s"${table.dir}/data/v$newVersion"
      val estRows = touched.map(_.rows).sum + bRows
      // File-count target, floored at cluster parallelism: with few/large
      // target files the final sort+write would otherwise run as 1-2 tasks
      // and serialize the whole epoch (cores beyond the file count idle).
      // The floor is itself bounded by minRowsPerFile so tiny epochs don't
      // spray micro-files (compaction cleans up what remains).
      val bySize = (estRows + opts.targetRowsPerFile - 1) / opts.targetRowsPerFile
      val byPar = math.min(spark.sparkContext.defaultParallelism.toLong,
        estRows / opts.minRowsPerFile)
      val nOut = math.max(1L, math.max(bySize, byPar)).toInt
      val sortCols = keyCols.map(col) :+ col(LsnCol)
      resolved
        .repartitionByRange(nOut, keyCols.map(col): _*)
        .sortWithinPartitions(sortCols: _*)
        .write.mode("overwrite").parquet(outDir)

      // --- per-file stats (reads only key + meta columns) -------------------
      val k1 = keyCols.head
      val fileRows = spark.read.schema(storedSchema).parquet(outDir)
        .groupBy(input_file_name().as("path"))
        .agg(count(lit(1)).as("rows"),
          min(col(k1).cast(StringType)).as("minKey"),
          max(col(k1).cast(StringType)).as("maxKey"),
          min(col(LsnCol)).as("minLsn"),
          max(col(LsnCol)).as("maxLsn"),
          sum(when(col(DeletedCol), 1L).otherwise(0L)).as("tombstones"))
        .collect()
      val newFiles = fileRows.map(r => DataFile(r.getString(0), r.getLong(1),
        r.getString(2), r.getString(3), r.getLong(4), r.getLong(5), newVersion)).toList
      val outputRows = newFiles.map(_.rows).sum + untouched.map(_.rows).sum
      val tombstones = fileRows.map(_.getLong(6)).sum

      val next = Snapshot(newVersion, snap.version, storedSchema.json,
        untouched ++ newFiles, snap.epochs :+ epochKey)
      table.commit(next)

      val stats = MergeStats(ckptId, epochId, newVersion, bRows, bMinLsn, bMaxLsn,
        outputRows, tombstones, touched.size, untouched.size, newFiles.size,
        millisSince(t0), noop = false)
      writeMetrics(spark, table, stats)
      stats
    } finally bNorm.unpersist()
  }

  /**
   * Salted two-phase arg-max: per (key, salt) partial reduce, then per key.
   * Associativity of max-by-lsn makes the two-phase split exact; hash
   * aggregation gives map-side combine on top, so even a key holding 20% of
   * the batch never funnels its raw rows into one reducer.
   */
  def resolveMaxLsn(union: DataFrame, keyCols: Seq[String], saltBuckets: Int): DataFrame = {
    val all = union.columns.toSeq
    val ev = struct(all.map(col): _*)
    if (saltBuckets <= 1) {
      union.groupBy(keyCols.map(col): _*)
        .agg(max_by(ev, col(LsnCol)).as("_e"))
        .select(all.map(c => col(s"_e.$c").as(c)): _*)
    } else {
      val salted = union
        .groupBy((keyCols.map(col) :+ pmod(xxhash64(col(LsnCol)), lit(saltBuckets)).as("_salt")): _*)
        .agg(max_by(ev, col(LsnCol)).as("_e"))
      salted.groupBy(keyCols.map(col): _*)
        .agg(max_by(col("_e"), col(s"_e.$LsnCol")).as("_e"))
        .select(all.map(c => col(s"_e.$c").as(c)): _*)
    }
  }

  /** Split manifest files into (touched, untouched) by first-key bounds. */
  private def pruneFiles(
      snap: Snapshot,
      bNorm: DataFrame,
      firstKey: String,
      opts: MergeOptions): (List[DataFile], List[DataFile]) = {
    if (snap.files.isEmpty) return (Nil, Nil)
    val stringKey = bNorm.schema(firstKey).dataType == StringType
    if (!stringKey) return (snap.files, Nil) // lexical bounds unsafe: rewrite all

    val distinctKeys = bNorm.select(col(firstKey)).distinct()
      .limit(opts.collectKeysLimit + 1).collect().map(_.getString(0))
    if (distinctKeys.length > opts.collectKeysLimit) {
      // too many keys for exact pruning: fall back to range intersection
      val r = bNorm.agg(min(col(firstKey)), max(col(firstKey))).head()
      val (lo, hi) = (r.getString(0), r.getString(1))
      snap.files.partition(f => f.maxKey >= lo && f.minKey <= hi)
    } else {
      val sorted = distinctKeys.sorted
      def intersects(f: DataFile): Boolean = {
        // lowest key >= minKey; touched iff it also <= maxKey
        var lo = 0; var hi = sorted.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (sorted(mid) < f.minKey) lo = mid + 1 else hi = mid
        }
        lo < sorted.length && sorted(lo) <= f.maxKey
      }
      snap.files.partition(intersects)
    }
  }

  private def tablePayload(snap: Snapshot): StructType =
    StructType(snap.schema.fields.filterNot(f => LakeTable.MetaCols.contains(f.name)))

  private def millisSince(t0: Long): Long = (System.nanoTime() - t0) / 1000000L

  private def writeMetrics(spark: SparkSession, table: LakeTable, s: MergeStats): Unit = {
    import spark.implicits._
    Seq(s).toDS().write.mode("append").parquet(s"${table.dir}/_metrics")
  }
}
