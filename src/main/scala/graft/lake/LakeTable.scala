package graft.lake

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

/**
 * Minimal Iceberg-style lake table: an append-only log of JSON snapshots, each
 * listing immutable parquet data files with per-file key/lsn bounds, plus an
 * epoch ledger for exactly-once commits.
 *
 * This plays the role the destination SQL database plays for the reference's
 * SQLWriter upserts (/root/reference/processors/sql_writer.go:21-80,
 * /root/reference/util/sql.go:269-284): the thing that makes at-least-once
 * delivery converge. Here convergence is stronger — idempotent by epoch
 * (a replayed (checkpointId, epochId) commit is a no-op) and deterministic
 * (max-LSN-wins fold), so replay reproduces the final state bit-for-bit.
 *
 * Layout:
 *   dir/_snapshots/v{version%020d}.json   — snapshot log (atomic rename commit)
 *   dir/data/v{version}/part-*.parquet    — immutable data files
 *   dir/_metrics/                         — per-epoch merge metrics (parquet)
 *
 * Stored schema = user payload columns + metadata columns:
 *   _lsn: long       — lsn of the change that produced this row version
 *   _deleted: bool   — tombstone (kept so a late lower-lsn insert cannot
 *                      resurrect a deleted key; filtered out by `read`)
 *
 * Schema evolution is add-column-only (`SchemaMerge.merge`), mirroring the
 * reference's dynamic column union (/root/reference/util/sql.go:300-317).
 */
final case class DataFile(
    path: String,
    rows: Long,
    minKey: String,
    maxKey: String,
    minLsn: Long,
    maxLsn: Long,
    addedAtVersion: Long)

final case class Snapshot(
    version: Long,
    parentVersion: Long,
    schemaJson: String,
    files: List[DataFile],
    /** exactly-once ledger: "ckptId:epochId" entries already applied */
    epochs: List[String]) {
  def schema: StructType = DataType.fromJson(schemaJson).asInstanceOf[StructType]
  def totalRows: Long = files.map(_.rows).sum
}

object LakeTable {
  val LsnCol = "_lsn"
  val DeletedCol = "_deleted"
  val MetaCols: Seq[String] = Seq(LsnCol, DeletedCol)
  private implicit val fmts: Formats = DefaultFormats

  def metaFields: Seq[StructField] = Seq(
    StructField(LsnCol, LongType, nullable = true),
    StructField(DeletedCol, BooleanType, nullable = true))

  /** Create an empty table with the given payload schema (no data files). */
  def create(dir: String, payloadSchema: StructType): LakeTable = {
    val t = new LakeTable(dir)
    Files.createDirectories(Paths.get(dir, "_snapshots"))
    Files.createDirectories(Paths.get(dir, "data"))
    val stored = StructType(payloadSchema.fields.toSeq ++ metaFields)
    t.commit(Snapshot(0L, -1L, stored.json, Nil, Nil))
    t
  }

  def load(dir: String): LakeTable = {
    require(Files.isDirectory(Paths.get(dir, "_snapshots")), s"not a lake table: $dir")
    new LakeTable(dir)
  }

  def exists(dir: String): Boolean = Files.isDirectory(Paths.get(dir, "_snapshots"))
}

final class LakeTable(val dir: String) {
  import LakeTable._
  private implicit val fmts: Formats = DefaultFormats

  private def snapDir = Paths.get(dir, "_snapshots")

  private def versionOf(name: String): Long =
    name.stripPrefix("v").stripSuffix(".json").toLong

  def currentVersion: Long = {
    val vs = Files.list(snapDir).iterator().asScala
      .map(_.getFileName.toString).filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(versionOf).toSeq
    if (vs.isEmpty) -1L else vs.max
  }

  def snapshot(version: Long): Snapshot = {
    val p = snapDir.resolve(f"v$version%020d.json")
    Serialization.read[Snapshot](
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8))(fmts, manifest[Snapshot])
  }

  def currentSnapshot: Snapshot = snapshot(currentVersion)

  /** Stored schema (payload + metadata cols). */
  def storedSchema: StructType = currentSnapshot.schema

  /** User-facing payload schema. */
  def payloadSchema: StructType =
    StructType(storedSchema.fields.filterNot(f => MetaCols.contains(f.name)))

  def hasEpoch(ckptId: String, epochId: Long): Boolean =
    currentSnapshot.epochs.contains(s"$ckptId:$epochId")

  /**
   * Atomic commit: write-temp-then-rename of the next snapshot file. Fails if
   * the target version already exists (single-writer optimistic concurrency).
   */
  def commit(s: Snapshot): Unit = {
    val target = snapDir.resolve(f"v${s.version}%020d.json")
    val tmp = snapDir.resolve(f".v${s.version}%020d.json.tmp")
    Files.write(tmp, Serialization.write(s)(fmts).getBytes(StandardCharsets.UTF_8))
    try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new IllegalStateException(
          s"concurrent commit detected at version ${s.version}", e)
    }
  }

  /** Raw stored rows (incl. tombstones + metadata cols) at a snapshot. */
  def readRaw(spark: SparkSession, snap: Snapshot): DataFrame = {
    val schema = snap.schema
    if (snap.files.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    } else {
      // Explicit schema (not inferred) => files written before a column was
      // added read as null for that column — add-column schema evolution
      // without rewriting history.
      spark.read.schema(schema).parquet(snap.files.map(_.path): _*)
    }
  }

  def readRaw(spark: SparkSession): DataFrame = readRaw(spark, currentSnapshot)

  /** Current table contents (tombstones filtered, metadata cols dropped). */
  def read(spark: SparkSession): DataFrame = readAt(spark, currentVersion)

  /** Per-epoch merge metrics table (throughput/lineage surface; one JSON-line
    * row per committed epoch — see MergeStats). Empty before first merge. */
  def metrics(spark: SparkSession): DataFrame = {
    val p = Paths.get(dir, "_metrics")
    if (Files.isDirectory(p)) spark.read.json(p.toString)
    else spark.emptyDataFrame
  }

  /** Time travel: table contents as of a given snapshot version. */
  def readAt(spark: SparkSession, version: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, not, coalesce, lit}
    val snap = snapshot(version)
    val payloadCols = snap.schema.fieldNames.filterNot(MetaCols.contains).map(col).toSeq
    readRaw(spark, snap)
      .filter(not(coalesce(col(DeletedCol), lit(false))))
      .select(payloadCols: _*)
  }
}

/** Add-column-only schema merge (type conflicts are errors in v1). */
object SchemaMerge {
  def merge(base: StructType, incoming: StructType): StructType = {
    val byName = base.fields.map(f => f.name -> f).toMap
    incoming.fields.foreach { f =>
      byName.get(f.name).foreach { existing =>
        require(existing.dataType == f.dataType,
          s"schema conflict on '${f.name}': ${existing.dataType} vs ${f.dataType}")
      }
    }
    val added = incoming.fields.filterNot(f => byName.contains(f.name))
      .map(_.copy(nullable = true))
    StructType(base.fields.toSeq ++ added)
  }
}
