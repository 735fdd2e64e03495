package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.lake.{KeyCodec, LakeTable}
import graft.merge.{MergeInto, MergeMode, MergeOptions}

/**
 * DataSourceV2 surface: `spark.read.format("graft")`, SQL
 * `CREATE TABLE … USING graft` + SELECT/INSERT, filter-pushdown pruning,
 * time travel via `versionAsOf`.
 */
class DsvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val payload = StructType(Seq(
    StructField("conv_id", StringType), StructField("turn_idx", IntegerType),
    StructField("text", StringType)))
  private val opts = MergeOptions(keyCols = Seq("conv_id", "turn_idx"),
    mode = MergeMode.Mor)

  /** 3 epochs: inserts, updates on conv-1, a delete — the read must fold. */
  private def seedTable(dir: String): LakeTable = {
    val t = LakeTable.create(dir, payload, keyCols = Seq("conv_id", "turn_idx"))
    val ins = (0 until 60).map(i => ("I", i.toLong, s"conv-${i % 6}", i / 6, s"t$i"))
      .toDF("op", "lsn", "conv_id", "turn_idx", "text")
    val upd = (0 until 10).map(i => ("U", 100L + i, "conv-1", i, s"u$i"))
      .toDF("op", "lsn", "conv_id", "turn_idx", "text")
    val del = Seq(("D", 200L, "conv-2", 0, null.asInstanceOf[String]))
      .toDF("op", "lsn", "conv_id", "turn_idx", "text")
    MergeInto.merge(spark, t, ins, "seed", 0L, opts)
    MergeInto.merge(spark, t, upd, "seed", 1L, opts)
    MergeInto.merge(spark, t, del, "seed", 2L, opts)
    t
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select($"conv_id", $"turn_idx", $"text").collect()
      .map(_.mkString("|")).toSeq.sorted

  test("format(graft) batch read equals the native resolved read") {
    val dir = TestSpark.tmpDir("dsv-read")
    val t = seedTable(s"$dir/t")
    val dsv = spark.read.format("graft").load(s"$dir/t")
    assert(dsv.schema.fieldNames.toSeq == Seq("conv_id", "turn_idx", "text"))
    assert(canon(dsv) == canon(t.read(spark)))
    assert(dsv.count() == 59) // 60 inserts - 1 delete
  }

  test("key filter pushes into manifest/file envelope pruning, result exact") {
    val dir = TestSpark.tmpDir("dsv-prune")
    val t = seedTable(s"$dir/t")
    val dsv = spark.read.format("graft").load(s"$dir/t")
      .filter($"conv_id" === "conv-1")
    // resolved + updated rows for conv-1 only, residual filter re-applied
    val want = canon(t.read(spark).filter($"conv_id" === "conv-1"))
    assert(canon(dsv) == want)
    assert(want.size == 10)
    // the physical scan reports the pushed key filter
    val plan = dsv.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("conv_id"),
      s"expected pushed filter in plan:\n$plan")
    // and the envelope actually prunes: conv-1's encoded point envelope
    // selects strictly fewer files than the full snapshot
    val snap = t.currentSnapshot
    val all = t.files(snap).size
    val k = KeyCodec.encode(StringType, "conv-1")
    val pruned = t.readAtIntersecting(spark, t.currentVersion, Some(k), Some(k))
      .inputFiles.length
    assert(pruned < all, s"pruned=$pruned all=$all")
  }

  test("SQL: CREATE TABLE USING graft, SELECT, INSERT INTO upserts via merge") {
    val dir = TestSpark.tmpDir("dsv-sql")
    val t = seedTable(s"$dir/t")
    spark.sql(s"CREATE OR REPLACE TABLE dsv_sql USING graft OPTIONS (path '$dir/t')")
    try {
      assert(spark.sql("SELECT count(*) FROM dsv_sql").head().getLong(0) == 59)
      // INSERT = upsert epoch: one new key, one existing key overwritten
      spark.sql(
        "INSERT INTO dsv_sql VALUES ('conv-9', 0, 'new'), ('conv-1', 0, 'sql-upd')")
      val after = spark.sql(
        "SELECT text FROM dsv_sql WHERE conv_id IN ('conv-9','conv-1') AND turn_idx = 0")
        .as[String].collect().sorted.toSeq
      assert(after == Seq("new", "sql-upd"))
      assert(spark.sql("SELECT count(*) FROM dsv_sql").head().getLong(0) == 60)
      // lineage: the SQL writer has its own checkpoint ledger entry
      assert(t.currentSnapshot.epochHwm.contains("sql-writer"))
    } finally spark.sql("DROP TABLE IF EXISTS dsv_sql")
  }

  test("df.write.format(graft).mode(append) merges; versionAsOf time-travels") {
    val dir = TestSpark.tmpDir("dsv-write")
    val t = seedTable(s"$dir/t")
    val v = t.currentVersion
    Seq(("conv-0", 0, "rewrite"), ("conv-8", 1, "fresh"))
      .toDF("conv_id", "turn_idx", "text")
      .write.format("graft").mode("append").save(s"$dir/t")
    val now = spark.read.format("graft").load(s"$dir/t")
    assert(now.filter($"conv_id" === "conv-0" && $"turn_idx" === 0)
      .select($"text").head().getString(0) == "rewrite")
    assert(now.count() == 60)
    // schema evolution through the SQL face: extra column widens the table
    Seq(("conv-8", 2, "tooled", "calc"))
      .toDF("conv_id", "turn_idx", "text", "tool")
      .write.format("graft").mode("append").save(s"$dir/t")
    val widened = spark.read.format("graft").load(s"$dir/t")
    assert(widened.schema.fieldNames.contains("tool"))
    assert(widened.filter($"tool".isNotNull).count() == 1)
    // time travel sees the pre-append state and schema
    val past = spark.read.format("graft").option("versionAsOf", v).load(s"$dir/t")
    assert(!past.schema.fieldNames.contains("tool"))
    assert(canon(past) == canon(t.readAt(spark, v)))
    // overwrite is refused, not silently destructive
    val e = intercept[Exception] {
      Seq(("x", 0, "boom")).toDF("conv_id", "turn_idx", "text")
        .write.format("graft").mode("overwrite").save(s"$dir/t")
    }
    assert(e.getMessage != null)
  }

  test("zero-overlap DataFrame append fails loudly; named INSERT SELECT works") {
    val dir = TestSpark.tmpDir("dsv-posguard")
    seedTable(s"$dir/t")
    // misnamed columns must NOT be silently positionally mapped
    val e = intercept[Exception] {
      Seq(("oops", 9, "boom")).toDF("a", "b", "c")
        .write.format("graft").mode("append").save(s"$dir/t")
    }
    assert(e.getMessage != null && e.getMessage.contains("positional"),
      s"expected the positional-mapping refusal, got: ${e.getMessage}")
    // the documented alternative: resolve by name (aliased select list)
    spark.sql(s"CREATE OR REPLACE TEMP VIEW dsv_guard_src AS " +
      "SELECT 'conv-7' AS s1, 0 AS s2, 'via-select' AS s3")
    spark.read.format("graft").load(s"$dir/t") // force table registration path
    spark.sql(s"CREATE TABLE IF NOT EXISTS dsv_guard USING graft " +
      s"OPTIONS (path '$dir/t')")
    spark.sql("INSERT INTO dsv_guard " +
      "SELECT s1 AS conv_id, s2 AS turn_idx, s3 AS text FROM dsv_guard_src")
    assert(spark.read.format("graft").load(s"$dir/t")
      .filter($"conv_id" === "conv-7").count() == 1)
  }

  test("auto-LSN assignment parses zero manifests (snapshot maxLsn watermark)") {
    val dir = TestSpark.tmpDir("dsv-lsn-hwm")
    val t = seedTable(s"$dir/t") // 3 MoR epochs -> several manifests
    // the ref watermark must equal the full-walk answer on a fresh table
    val snap = t.currentSnapshot
    assert(t.maxLsn(snap) == (t.files(snap).map(_.maxLsn) :+ 0L).max,
      "snapshot-ref maxLsn diverges from the manifest walk")
    assert(t.maxLsn(snap) == 200L) // the seed's delete carries the top lsn
    // SQL-face append: the whole upsert (watermark + MoR merge + pure-append
    // commit) must parse NO manifest — O(manifest count) driver work only
    LakeTable.clearManifestCacheForTest()
    val p0 = LakeTable.manifestParses.get()
    Seq(("conv-0", 1, "hwm-upd")).toDF("conv_id", "turn_idx", "text")
      .write.format("graft").mode("append").save(s"$dir/t")
    val parsed = LakeTable.manifestParses.get() - p0
    assert(parsed == 0, s"auto-LSN append parsed $parsed manifests, expected 0")
    // and the assigned lsn actually won over the incumbent row
    assert(spark.read.format("graft").load(s"$dir/t")
      .filter($"conv_id" === "conv-0" && $"turn_idx" === 1)
      .select($"text").head().getString(0) == "hwm-upd")
    // a ref predating the field (maxLsn = -1) falls back to the walk
    val legacy = snap.copy(manifests = snap.manifests.map(_.copy(maxLsn = -1L)))
    assert(t.maxLsn(legacy) == 200L)
  }
}
