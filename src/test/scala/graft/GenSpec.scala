package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.gen.{ChangelogGen, GenParams}

class GenSpec extends AnyFunSuite {
  private val p = GenParams(nEvents = 5000, nConvs = 50, eventsPerFile = 500,
    maxLateEvents = 200)

  test("generator is a pure function of (params, index)") {
    val a = (0L until 5000L).map(ChangelogGen.emittedRow(p, _))
    val b = (0L until 5000L).map(ChangelogGen.emittedRow(p, _))
    assert(a == b)
  }

  test("every delivery of the same lsn carries an identical payload") {
    val byLsn = (0L until 5000L).map(ChangelogGen.emittedRow(p, _)._2).groupBy(_.lsn)
    byLsn.foreach { case (lsn, evs) =>
      assert(evs.distinct.size == 1, s"lsn $lsn has ${evs.distinct.size} payload variants")
    }
  }

  test("workload profile: duplicates, deletes, out-of-order, hot key") {
    val rows = (0L until 5000L).map(ChangelogGen.emittedRow(p, _))
    val evs = rows.map(_._2)
    val dupRate = 1.0 - evs.map(_.lsn).distinct.size.toDouble / evs.size
    assert(dupRate > 0.005 && dupRate < 0.05, s"dup rate $dupRate")
    val delRate = evs.count(_.op == "D").toDouble / evs.size
    assert(delRate > 0.02 && delRate < 0.10, s"delete rate $delRate")
    val hotRate = evs.count(_.conv_id == "conv_hot").toDouble / evs.size
    assert(hotRate > 0.12 && hotRate < 0.30, s"hot-key rate $hotRate")
    // out-of-order: some row lands in an earlier file than its in-order position
    val late = rows.zipWithIndex.count { case ((f, _), i) =>
      f < (i / p.eventsPerFile).toInt
    }
    assert(late > 0, "expected some late (out-of-order) arrivals")
  }

  test("era-0 files never carry tool_meta; evolved events exist in era 1") {
    val rows = (0L until 5000L).map(ChangelogGen.emittedRow(p, _))
    assert(rows.filter(_._1 < p.evolveFile).forall(_._2.tool_meta.isEmpty))
    assert(rows.exists(r => r._1 >= p.evolveFile && r._2.tool_meta.nonEmpty))
  }

  test("distributed generation equals driver-side generation") {
    val spark = TestSpark.spark
    val dist = ChangelogGen.events(spark, p).collect().toSeq.sortBy(r => (r._2.lsn, r._1))
    val local = (0L until p.nEvents).map(ChangelogGen.emittedRow(p, _)).sortBy(r => (r._2.lsn, r._1))
    assert(dist == local)
  }

  test("WAL file modification times follow event-time order (binlog contract)") {
    // the file streaming source consumes oldest-modTime first; if modTimes
    // didn't track event order, the watermark could outrun unread files and
    // the streaming dedup would drop their events as too-late
    val spark = TestSpark.spark
    val wal = TestSpark.tmpDir("gen-wal-order")
    ChangelogGen.writeWal(spark, p, wal)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isFile) Seq(f)
      else Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
    val files = walk(new java.io.File(wal))
      .filter(f => f.getName.startsWith("part-") && f.length > 0).toArray
    assert(files.length > 2)
    val byModTime = files.sortBy(_.lastModified)
    assert(byModTime.map(_.lastModified).distinct.length == files.length,
      "modTimes must be strictly increasing (distinct)")
    // min event-ts per file must be non-decreasing in modTime order, within
    // the generator's bounded lateness
    val minTs = byModTime.map { f =>
      spark.read.parquet(f.getAbsolutePath)
        .agg(org.apache.spark.sql.functions.min("ts")).head().getTimestamp(0).getTime
    }
    val slackMs = (p.maxLateEvents.toLong + p.eventsPerFile) * 1000L
    minTs.sliding(2).foreach { case Array(a, b) =>
      assert(b >= a - slackMs, s"event time regressed beyond lateness bound: $a -> $b")
    }
  }
}
