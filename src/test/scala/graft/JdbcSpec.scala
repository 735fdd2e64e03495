package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Jdbc

/**
 * Live JDBC round-trip against embedded Apache Derby (the one JDBC engine on
 * this classpath): the reference's SQLReader/SQLWriter/SQLExecutor surface
 * exercised against a real database rather than mapped on paper.
 */
class JdbcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val url = {
    val dir = TestSpark.tmpDir("derby")
    s"jdbc:derby:$dir/db;create=true"
  }

  test("SQLWriter/SQLReader: write, parallel partitioned read, exact equality") {
    val rows = (0 until 1000).map(i => (i.toLong, s"user_$i", i * 2.5))
    val df = rows.toDF("id", "name", "score")
    Jdbc.write(df, url, "people", SaveMode.Overwrite)

    // partitioned read: Spark issues one ranged SELECT per partition
    val back = Jdbc.read(spark, url, "people",
      partitionColumn = "id", lowerBound = 0L, upperBound = 1000L,
      numPartitions = 4)
    assert(back.rdd.getNumPartitions == 4, "expected 4 parallel JDBC partitions")
    val got = back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == rows.toSet)

    // predicate pushdown to the database: the filter must appear in the scan
    val plan = back.filter(col("id") < 10)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(id,10)"),
      s"filter not pushed to JDBC source:\n$plan")
    assert(back.filter(col("id") < 10).count() == 10)
  }

  test("SQLExecutor: DDL + DML side effects visible to subsequent reads") {
    Jdbc.execute(url, "CREATE TABLE flags (k VARCHAR(20), v INT)")
    Jdbc.execute(url, "INSERT INTO flags VALUES ('ready', 1)")
    val got = Jdbc.read(spark, url, "flags").collect()
    assert(got.length == 1 && got(0).getString(0) == "ready" && got(0).getInt(1) == 1)
  }
}
