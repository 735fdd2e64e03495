ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ratchetspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Forked JVMs put java.io.tmpdir on tmpfs when one exists (override with
// SPARK_GRAFT_TMPDIR; unset fast-tmp entirely with SPARK_GRAFT_TMPDIR=system).
// Everything transient rides java.io.tmpdir — operator-query scratch tables
// (graft.ops.Scratch), Spark's local dirs (shuffle/spill; spark.local.dir
// defaults to java.io.tmpdir), and streaming checkpoints — and the sandbox's
// /tmp sits on a single slow virtual disk while the deployment target has
// fast local scratch. Same reasoning as the scaling bench's explicit
// /dev/shm work dirs (see Bench.scala): measure the engine, not the
// sandbox's disk. Inputs are still read from $SPARK_GRAFT_SF_DIR and every
// query recomputes from them — nothing persists across runs.
val fastTmp: Seq[String] = sys.env.get("SPARK_GRAFT_TMPDIR") match {
  case Some("system") => Seq.empty
  case other =>
    val shm = new java.io.File("/dev/shm")
    other.orElse(if (shm.isDirectory && shm.canWrite) Some("/dev/shm/graft-tmp")
      else None)
      .flatMap { d =>
        // never let a tmpfs hiccup break the BUILD — fall back to the system
        // tmpdir instead (the flag is an optimization, not a requirement)
        try {
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
          Some(s"-Djava.io.tmpdir=$d")
        } catch { case _: Exception => None }
      }.toSeq
}
javaOptions ++= fastTmp ++ jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "20g")}",
  // G1 (JDK17 default): re-measured for the merge-on-read engine — total GC
  // pause 2-2.5s per 16M-event ingest at any width, vs ParallelGC's 7s at
  // 8-wide growing to 12s at 32-wide (stop-the-world full collections are
  // the one cost that scaled WITH width). ParallelGC had won for the old
  // CoW + state-store engine; the allocation profile changed.
)
