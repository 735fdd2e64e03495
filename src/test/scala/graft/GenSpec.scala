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
}
