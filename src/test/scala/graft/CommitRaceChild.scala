package graft

/**
 * Forked-JVM writer for the cross-process commit race test: loads an
 * existing lake table and advances its own checkpoint ledger `n` times
 * through the same optimistic-commit path a racing compactor or second
 * ingest stream would use. Pure metadata (no Spark) — the point is the
 * hard-link test-and-set in [[graft.lake.LakeTable.commit]] across real
 * process boundaries, which an in-JVM thread race cannot prove (rename(2)
 * semantics and page-cache effects are per-kernel, not per-thread).
 */
object CommitRaceChild {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val ckpt = args(1)
    val n = args(2).toInt
    val sleepMs = if (args.length > 3) args(3).toLong else 10L
    val table = graft.lake.LakeTable.load(dir)
    var i = 0
    while (i < n) {
      val snap = table.currentSnapshot
      // high maxRetries: under deliberate contention a commit may lose many
      // version races before landing; each loss rebases, never corrupts
      table.commitChange(snap, snap.schemaJson, Set.empty, Nil,
        Some((ckpt, i.toLong)), maxRetries = 1000)
      i += 1
      if (sleepMs > 0) Thread.sleep(sleepMs)
    }
    println("CHILD_DONE")
  }
}
