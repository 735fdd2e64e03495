package graft.merge

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

import graft.lake.{DataFile, LakeTable}

/**
 * Per-file manifest stats for freshly written data files.
 *
 * Fast path: parquet footers already carry exact row counts and per-column
 * min/max, so the manifest entry (rows, key bounds, lsn bounds) comes from a
 * driver-side footer read — no second full scan of the epoch's output, which
 * otherwise doubles merge IO. Falls back to a Spark scan if any footer lacks
 * usable statistics (e.g. a future writer truncating binary stats).
 */
object FileStats {

  /** All footer stats present and usable -> Some(files); else None. */
  def fromFooters(spark: SparkSession, outDir: String, k1: String,
      version: Long): Option[List[DataFile]] = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new Path(outDir)
    val fs = dir.getFileSystem(conf)
    val parts = fs.listStatus(dir).toList
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    try {
      val files = parts.map { st =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
        try {
          val blocks = reader.getFooter.getBlocks.asScala.toList
          val rows = blocks.map(_.getRowCount).sum
          if (rows == 0L) {
            None // empty part file: drop from manifest
          } else {
            def colStats[T](name: String, get: org.apache.parquet.column.statistics.Statistics[_] => (T, T)): (T, T) = {
              val perBlock = blocks.map { b =>
                val c = b.getColumns.asScala
                  .find(_.getPath.toDotString == name)
                  .getOrElse(throw StatsMissing)
                val s = c.getStatistics
                if (s == null || s.isEmpty || !s.hasNonNullValue) throw StatsMissing
                get(s)
              }
              (perBlock.map(_._1).min(UnsafeOrd[T]), perBlock.map(_._2).max(UnsafeOrd[T]))
            }
            val (minKey, maxKey) = colStats[String](k1, s =>
              (s.genericGetMin.asInstanceOf[Binary].toStringUsingUTF8,
                s.genericGetMax.asInstanceOf[Binary].toStringUsingUTF8))
            val (minLsn, maxLsn) = colStats[Long](LakeTable.LsnCol, s =>
              (s.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
                s.genericGetMax.asInstanceOf[java.lang.Long].longValue()))
            Some(DataFile(st.getPath.toString, rows, minKey, maxKey,
              minLsn, maxLsn, version))
          }
        } finally reader.close()
      }
      Some(files.flatten)
    } catch {
      case StatsMissing => None
    }
  }

  /** Fallback: compute stats with a Spark scan of the written files. */
  def fromScan(spark: SparkSession, outDir: String, schema: StructType,
      k1: String, version: Long): List[DataFile] = {
    spark.read.schema(schema).parquet(outDir)
      .groupBy(input_file_name().as("path"))
      .agg(count(lit(1)).as("rows"),
        min(col(k1).cast(StringType)).as("minKey"),
        max(col(k1).cast(StringType)).as("maxKey"),
        min(col(LakeTable.LsnCol)).as("minLsn"),
        max(col(LakeTable.LsnCol)).as("maxLsn"))
      .collect()
      .map(r => DataFile(r.getString(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getLong(5), version))
      .toList
  }

  private case object StatsMissing extends RuntimeException

  /** Natural ordering for the two stat types we read (String, Long). */
  private def UnsafeOrd[T]: Ordering[T] = new Ordering[T] {
    def compare(a: T, b: T): Int = (a, b) match {
      case (x: String, y: String) => x.compareTo(y)
      case (x: java.lang.Long, y: java.lang.Long) => x.compareTo(y)
      case _ => throw StatsMissing
    }
  }
}
