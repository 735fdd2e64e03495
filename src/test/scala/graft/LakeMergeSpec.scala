package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.{ChangelogGen, GenParams}
import graft.lake.{LakeTable, SchemaMerge}
import graft.merge.{MergeInto, MergeOptions}
import graft.model.Schemas

class LakeMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val p = GenParams(nEvents = 10000, nConvs = 100, eventsPerFile = 1000,
    turnsPerConv = 30)

  /** Collect the table's payload rows as comparable tuples keyed by (conv, turn). */
  private def tableState(t: LakeTable): Map[(String, Int), (String, String, Option[String], Timestamp, Option[String])] =
    t.read(spark).collect().map { r =>
      (r.getString(r.fieldIndex("conv_id")), r.getInt(r.fieldIndex("turn_idx"))) ->
        ((r.getString(r.fieldIndex("role")), r.getString(r.fieldIndex("text")),
          Option(r.getString(r.fieldIndex("tool"))), r.getTimestamp(r.fieldIndex("ts")),
          if (r.schema.fieldNames.contains("tool_meta"))
            Option(r.getString(r.fieldIndex("tool_meta"))) else None))
    }.toMap

  private def oracleState(p: GenParams) =
    ChangelogGen.foldOracle(p).map { case (k, e) =>
      k -> ((e.role, e.text, e.tool, e.ts, e.tool_meta))
    }

  test("epoch-by-epoch merge reproduces the sequential fold oracle") {
    val dir = TestSpark.tmpDir("lake-fold")
    val table = LakeTable.create(s"$dir/t", Schemas.turn)
    val ev = ChangelogGen.events(spark, p)
      .map { case (f, e) => (f, e.op, e.lsn, e.conv_id, e.turn_idx, e.role, e.text,
        e.tool, e.ts, e.tool_meta) }
      .toDF("wal_file", "op", "lsn", "conv_id", "turn_idx", "role", "text",
        "tool", "ts", "tool_meta")
      .cache()
    try {
      (0 until p.nFiles).foreach { f =>
        val batch = ev.filter($"wal_file" === f).drop("wal_file")
        val stats = MergeInto.merge(spark, table, batch, "ck1", f.toLong,
          MergeOptions(targetRowsPerFile = 2000))
        assert(!stats.noop)
      }
      val got = tableState(table)
      val want = oracleState(p)
      assert(got.size == want.size,
        s"row count: got ${got.size}, want ${want.size}")
      want.foreach { case (k, w) =>
        assert(got.contains(k), s"missing key $k")
        assert(got(k) == w, s"key $k: got ${got(k)}, want $w")
      }
    } finally ev.unpersist()
  }

  test("replayed epoch is a no-op (exactly-once ledger)") {
    val dir = TestSpark.tmpDir("lake-idem")
    val table = LakeTable.create(s"$dir/t", Schemas.turn)
    val batch = Seq(
      ("I", 1L, "c1", 0, "user", "hello", None: Option[String],
        Timestamp.valueOf("2025-01-01 00:00:00")),
      ("I", 2L, "c1", 1, "assistant", "hi", None: Option[String],
        Timestamp.valueOf("2025-01-01 00:00:01")))
      .toDF("op", "lsn", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    val s1 = MergeInto.merge(spark, table, batch, "ck", 0L)
    assert(!s1.noop && s1.outputRows == 2)
    val v1 = table.currentVersion
    val s2 = MergeInto.merge(spark, table, batch, "ck", 0L)
    assert(s2.noop)
    assert(table.currentVersion == v1, "replayed epoch must not create a snapshot")
    assert(tableState(table).size == 2)
  }

  test("tombstone: delete wins over a later-arriving lower-lsn insert") {
    val dir = TestSpark.tmpDir("lake-tomb")
    val table = LakeTable.create(s"$dir/t", Schemas.turn)
    val del = Seq(("D", 10L, "c1", 0, null: String, null: String,
      None: Option[String], null: Timestamp))
      .toDF("op", "lsn", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    val ins = Seq(("I", 5L, "c1", 0, "user", "stale", None: Option[String],
      Timestamp.valueOf("2025-01-01 00:00:00")))
      .toDF("op", "lsn", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    MergeInto.merge(spark, table, del, "ck", 0L)
    MergeInto.merge(spark, table, ins, "ck", 1L)
    assert(table.read(spark).count() == 0,
      "lower-lsn insert must not resurrect a deleted key")
    // but a HIGHER-lsn insert re-creates the key
    val ins2 = Seq(("I", 11L, "c1", 0, "user", "fresh", None: Option[String],
      Timestamp.valueOf("2025-01-01 00:00:00")))
      .toDF("op", "lsn", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    MergeInto.merge(spark, table, ins2, "ck", 2L)
    val rows = table.read(spark).collect()
    assert(rows.length == 1 && rows(0).getAs[String]("text") == "fresh")
  }

  test("schema evolution: added column merges without rewriting history") {
    val dir = TestSpark.tmpDir("lake-evolve")
    val table = LakeTable.create(s"$dir/t", Schemas.turn)
    val b1 = Seq(("I", 1L, "c1", 0, "user", "v1 row", None: Option[String],
      Timestamp.valueOf("2025-01-01 00:00:00")))
      .toDF("op", "lsn", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    MergeInto.merge(spark, table, b1, "ck", 0L)
    assert(!table.payloadSchema.fieldNames.contains("tool_meta"))
    val b2 = Seq(("I", 2L, "c2", 0, "user", "v2 row", None: Option[String],
      Timestamp.valueOf("2025-01-01 00:01:00"), Some("""{"calls":1}""")))
      .toDF("op", "lsn", "conv_id", "turn_idx", "role", "text", "tool", "ts", "tool_meta")
    MergeInto.merge(spark, table, b2, "ck", 1L)
    assert(table.payloadSchema.fieldNames.contains("tool_meta"))
    val rows = table.read(spark).orderBy("conv_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("tool_meta") == null) // old row reads as null
    assert(rows(1).getAs[String]("tool_meta") == """{"calls":1}""")
  }

  test("file pruning: untouched files are carried over, not rewritten") {
    val dir = TestSpark.tmpDir("lake-prune")
    val table = LakeTable.create(s"$dir/t", Schemas.turn)
    // seed 20 convs across several files
    val seedRows = (0 until 20).map { i =>
      ("I", i.toLong, f"conv_$i%03d", 0, "user", s"seed $i", None: Option[String],
        Timestamp.valueOf("2025-01-01 00:00:00"))
    }
    MergeInto.merge(spark, table, seedRows
      .toDF("op", "lsn", "conv_id", "turn_idx", "role", "text", "tool", "ts"),
      "ck", 0L, MergeOptions(targetRowsPerFile = 5))
    val before = table.currentSnapshot
    assert(before.files.size >= 3, s"expected multiple files, got ${before.files.size}")
    // update a single conv — only files whose bounds contain it may be rewritten
    val upd = Seq(("U", 100L, "conv_019", 0, "user", "updated", None: Option[String],
      Timestamp.valueOf("2025-01-01 00:01:00")))
      .toDF("op", "lsn", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    val stats = MergeInto.merge(spark, table, upd, "ck", 1L,
      MergeOptions(targetRowsPerFile = 5))
    assert(stats.filesRewritten < before.files.size,
      s"pruning failed: rewrote ${stats.filesRewritten}/${before.files.size} files")
    assert(stats.filesPruned > 0)
    val after = table.currentSnapshot
    // untouched files are literally the same file objects
    assert(before.files.filter(_.maxKey < "conv_019").forall(after.files.contains))
    val rows = table.read(spark).collect().map(r =>
      r.getAs[String]("conv_id") -> r.getAs[String]("text")).toMap
    assert(rows.size == 20 && rows("conv_019") == "updated" && rows("conv_000") == "seed 0")
  }

  test("salted and unsalted resolution agree") {
    val dir0 = TestSpark.tmpDir("lake-salt")
    val pSkew = p.copy(nEvents = 4000, hotFrac = 0.5)
    val ev = ChangelogGen.events(spark, pSkew)
      .map { case (_, e) => (e.op, e.lsn, e.conv_id, e.turn_idx, e.role, e.text,
        e.tool, e.ts, e.tool_meta) }
      .toDF("op", "lsn", "conv_id", "turn_idx", "role", "text", "tool", "ts", "tool_meta")
    val tA = LakeTable.create(s"$dir0/a", Schemas.turn)
    val tB = LakeTable.create(s"$dir0/b", Schemas.turn)
    MergeInto.merge(spark, tA, ev, "ck", 0L, MergeOptions(saltBuckets = 1))
    MergeInto.merge(spark, tB, ev, "ck", 0L, MergeOptions(saltBuckets = 32))
    val a = tableState(tA)
    val b = tableState(tB)
    assert(a == b)
    assert(a == oracleState(pSkew))
  }

  test("schema merge rejects type conflicts, appends new nullable columns") {
    import org.apache.spark.sql.types._
    val base = StructType(Seq(StructField("a", StringType), StructField("b", IntegerType)))
    val inc = StructType(Seq(StructField("b", IntegerType), StructField("c", LongType)))
    val merged = SchemaMerge.merge(base, inc)
    assert(merged.fieldNames.toSeq == Seq("a", "b", "c"))
    assert(merged("c").nullable)
    val bad = StructType(Seq(StructField("b", StringType)))
    assertThrows[IllegalArgumentException](SchemaMerge.merge(base, bad))
  }
}
