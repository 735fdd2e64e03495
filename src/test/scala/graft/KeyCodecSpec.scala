package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{KeyCodec, LakeTable}
import graft.merge.{MergeInto, MergeOptions}
import graft.model.Schemas

/**
 * The single-ordering contract behind manifest pruning: KeyCodec encoding +
 * UTF-8 byte comparison must agree with (a) numeric order for integral keys
 * and (b) the order parquet/Spark compute string min/max in — including for
 * supplementary characters, where Java's UTF-16 `compareTo` disagrees (the
 * round-1 silent-duplicate hazard).
 */
class KeyCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("encodeLong: byte order == numeric order across the full long range") {
    val rnd = new scala.util.Random(42)
    val values = Seq(Long.MinValue, Long.MinValue + 1, -1L, 0L, 1L,
      Long.MaxValue - 1, Long.MaxValue) ++ Seq.fill(2000)(rnd.nextLong())
    val sortedNum = values.sorted
    val sortedEnc = values.sortBy(KeyCodec.encodeLong)(KeyCodec.ordering)
    assert(sortedEnc == sortedNum)
    // and plain java String order on the encodings agrees too (ASCII digits)
    assert(values.sortBy(KeyCodec.encodeLong) == sortedNum)
  }

  test("string compare matches UTF-8 byte order where UTF-16 disagrees") {
    // U+FF5A (FULLWIDTH z, 3-byte UTF-8) vs U+1F600 (emoji, 4-byte UTF-8):
    // UTF-16 sorts the emoji's surrogates (0xD83D...) BELOW 0xFF5A;
    // UTF-8 byte order sorts the emoji above. Parquet stats use UTF-8 order.
    val z = "ｚ"
    val emoji = new String(Character.toChars(0x1F600))
    assert(z.compareTo(emoji) > 0, "sanity: UTF-16 disagrees on this pair")
    assert(KeyCodec.compare(z, emoji) < 0, "KeyCodec must use UTF-8 order")
    // general agreement with byte arrays on random strings
    val rnd = new scala.util.Random(7)
    def randStr(): String = (0 until rnd.nextInt(8)).map { _ =>
      rnd.nextInt(4) match {
        case 0 => ('a' + rnd.nextInt(26)).toChar.toString
        case 1 => "é" // 2-byte
        case 2 => "ｚ" // 3-byte
        case 3 => new String(Character.toChars(0x1F600 + rnd.nextInt(16))) // 4-byte
      }
    }.mkString
    (0 until 2000).foreach { _ =>
      val (a, b) = (randStr(), randStr())
      val byBytes = {
        val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
        val n = math.min(x.length, y.length)
        val i = (0 until n).find(i => x(i) != y(i))
        i.map(j => (x(j) & 0xFF) - (y(j) & 0xFF)).getOrElse(x.length - y.length)
      }
      assert(Integer.signum(KeyCodec.compare(a, b)) == Integer.signum(byBytes))
    }
  }

  test("emoji conv_ids: pruning never strands a stale row (round-1 hazard)") {
    val dir = TestSpark.tmpDir("lake-emoji")
    val table = LakeTable.create(s"$dir/t", Schemas.turn)
    // keys straddling the UTF-16/UTF-8 disagreement, spread over small files
    val keys = Seq("conv_a", "conv_z", "ｚ_fullwidth",
      new String(Character.toChars(0x1F600)) + "_emoji",
      new String(Character.toChars(0x1F680)) + "_rocket")
    val seed = keys.zipWithIndex.map { case (k, i) =>
      ("I", i.toLong, k, 0, "user", s"v1 of $k", None: Option[String],
        Timestamp.valueOf("2025-01-01 00:00:00"))
    }.toDF("op", "lsn", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    MergeInto.merge(spark, table, seed, "ck", 0L, MergeOptions(targetRowsPerFile = 1))
    assert(table.currentFiles.size >= 3, "need multiple files for the hazard")
    // update EVERY key, one epoch per key: the file holding the key must be
    // rewritten every time — a UTF-16-ordered prune would classify the
    // emoji-holding file untouched and leave both versions alive
    keys.zipWithIndex.foreach { case (k, i) =>
      val upd = Seq(("U", 100L + i, k, 0, "user", s"v2 of $k",
        None: Option[String], Timestamp.valueOf("2025-01-01 00:01:00")))
        .toDF("op", "lsn", "conv_id", "turn_idx", "role", "text", "tool", "ts")
      MergeInto.merge(spark, table, upd, "ck", 1L + i,
        MergeOptions(targetRowsPerFile = 1))
    }
    val rows = table.read(spark).collect()
      .map(r => r.getAs[String]("conv_id") -> r.getAs[String]("text"))
    assert(rows.length == keys.size,
      s"stale duplicates survived: ${rows.mkString("; ")}")
    keys.foreach(k => assert(rows.toMap.apply(k) == s"v2 of $k"))
  }
}
