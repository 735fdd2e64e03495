package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Sink/source roundtrips covering the reference's writer surface as
 * Spark-native IO, each verified end-to-end (write, read back, aggregate —
 * so content fidelity is part of the oracle check):
 *
 *  - CSVWriter (/root/reference/processors/csv_writer.go:16-69,
 *    util/csv_writer.go:12-116): header + quote-escaping ("" doubling, the
 *    reference's AlwaysEncapsulate-compatible form), deterministic
 *    schema-ordered columns (the reference sorts keys, csv_writer.go:33-38).
 *  - SQLWriterData dynamic table routing
 *    (/root/reference/processors/sql_writer.go:30-37,52-61): one payload
 *    stream fanned out to per-key destinations = partitioned write; reading
 *    one partition back = the routed table.
 *  - IoReader gzip + line-by-line (/root/reference/processors/io_reader.go:
 *    26-30,47-54): gzip-compressed text lines, decoded transparently by the
 *    Hadoop codec on read.
 *
 * All writes go to a fresh temp dir; inputs come only from the shared
 * testdata tables.
 */
object SinkOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def events(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CSV write -> read roundtrip; aggregates prove the text survived quoting.
    "q_csv_roundtrip" -> ((s, dir) => {
      val out = Scratch.dir("graft-csv")
      docs(s, dir).select(col("doc_id"), col("lang"), col("text"))
        .write.mode("overwrite")
        .option("header", "true").option("quote", "\"").option("escape", "\"")
        .csv(out)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("text", StringType)))
      s.read.schema(schema)
        .option("header", "true").option("quote", "\"").option("escape", "\"")
        .option("multiLine", "true")
        .csv(out)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("doc_id")).as("id_sum"),
          sum(length(col("text"))).as("chars"),
          countDistinct(md5(col("text"))).as("n_distinct_texts"))
    }),

    // Dynamic sink routing: partition the stream by its routing key on write,
    // read the routed store back, per-destination row counts.
    "q_route_partitioned" -> ((s, dir) => {
      val out = Scratch.dir("graft-route")
      events(s, dir).write.mode("overwrite")
        .partitionBy("event_type").parquet(out)
      s.read.parquet(out)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), max(col("event_id")).as("max_id"))
    }),

    // CSV quote-escaping golden test: texts are made pathological (embedded
    // double quotes, commas, AND newlines — the reference's AlwaysEncapsulate
    // + ""-doubling territory, /root/reference/util/csv_writer.go:43-76) by
    // the SAME expression the DuckDB oracle applies directly, so a quoting
    // bug cannot cancel out in the roundtrip: any mis-escaped row changes
    // the md5 set / char count.
    "q_csv_escaping" -> ((s, dir) => {
      val out = Scratch.dir("graft-csv-esc")
      val evil = concat(lit("q\""), col("text"), lit("\",\n|"), col("lang"))
      docs(s, dir).select(col("doc_id"), evil.as("evil"))
        .write.mode("overwrite")
        .option("header", "true").option("quote", "\"").option("escape", "\"")
        .csv(out)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("evil", StringType)))
      s.read.schema(schema)
        .option("header", "true").option("quote", "\"").option("escape", "\"")
        .option("multiLine", "true")
        .csv(out)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("doc_id")).as("id_sum"),
          sum(length(col("evil"))).as("chars"),
          countDistinct(md5(col("evil"))).as("n_distinct"))
    }),

    // IoReaderWriter tee (read + write + forward the SAME frame,
    // /root/reference/processors/io_reader_writer.go): write the frame to a
    // sink, keep processing the forwarded side, and join it against what was
    // written — every forwarded row must find its written twin, so the
    // aggregate equals the plain-documents oracle iff the tee is lossless.
    "q_tee" -> ((s, dir) => {
      val out = Scratch.dir("graft-tee")
      val frame = docs(s, dir).select(col("doc_id"), col("lang"), col("text"))
      frame.write.mode("overwrite").parquet(out) // tee: write...
      val written = s.read.parquet(out)
      frame // ...and forward
        .join(written, Seq("doc_id", "lang", "text"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
          countDistinct(md5(col("text"))).as("n_texts"))
    }),

    // Opaque whole-file reads (IoReader buffered/chunked mode,
    // /root/reference/processors/io_reader.go:56-69; FileReader whole-file
    // payloads, file_reader.go:22-26): the binaryFile source yields
    // (path, length, bytes) rows — the multimodal ingestion entry point.
    // The driver oracle checks (file, length) via DuckDB read_blob; the
    // content checksum can't be oracled there (DuckDB 1.0 md5 takes VARCHAR
    // only and the BLOB cast escapes bytes) so OpsSpec asserts the bytes'
    // md5 against java.security directly.
    "q_binary_file_source" -> ((s, dir) => {
      s.read.format("binaryFile").load(s"$dir/documents.parquet")
        .select(
          element_at(split(col("path"), "/"), -1).as("file"),
          col("length"))
    }),

    // Gzipped line-oriented IO: encode rows as text lines, gzip on write,
    // transparent decode on read, parse, aggregate.
    "q_gzip_lines" -> ((s, dir) => {
      val out = Scratch.dir("graft-gz")
      docs(s, dir)
        .select(concat_ws("|", col("doc_id"), md5(col("text"))).as("value"))
        .write.mode("overwrite")
        .option("compression", "gzip").text(out)
      s.read.text(out)
        .select(split(col("value"), "\\|").as("f"))
        .select(element_at(col("f"), 1).cast(LongType).as("doc_id"),
          element_at(col("f"), 2).as("fp"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("doc_id")).as("id_sum"),
          countDistinct(col("fp")).as("n_fps"))
    }))

  val oracles: Map[String, String] = Map(
    "q_csv_roundtrip" ->
      """SELECT count(*) AS n_rows, CAST(sum(doc_id) AS BIGINT) AS id_sum,
         CAST(sum(length(text)) AS BIGINT) AS chars,
         count(DISTINCT md5(text)) AS n_distinct_texts FROM documents""",
    "q_route_partitioned" ->
      """SELECT event_type, count(*) AS n, max(event_id) AS max_id
         FROM events GROUP BY event_type""",
    "q_csv_escaping" ->
      """WITH evil AS (SELECT doc_id,
           'q"' || text || '",' || chr(10) || '|' || lang AS evil FROM documents)
         SELECT count(*) AS n_rows, CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(sum(length(evil)) AS BIGINT) AS chars,
           count(DISTINCT md5(evil)) AS n_distinct FROM evil""",
    "q_tee" ->
      """SELECT count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum,
         count(DISTINCT md5(text)) AS n_texts FROM documents""",
    // __SF_DIR__ is substituted with the actual scale-factor dir at emit time
    // (SparkEntry.oracleSqlFor) so the oracle always reads the SAME corpus
    // the Spark query ran on, at any tier
    "q_binary_file_source" ->
      """SELECT parse_filename(filename) AS file, CAST(size AS BIGINT) AS length
         FROM read_blob('__SF_DIR__/documents.parquet')""",
    "q_gzip_lines" ->
      """SELECT count(*) AS n_lines, CAST(sum(doc_id) AS BIGINT) AS id_sum,
         count(DISTINCT md5(text)) AS n_fps FROM documents""")
}
