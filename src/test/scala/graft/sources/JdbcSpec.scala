package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** JDBC connector spec against embedded Derby (ships with Spark). */
class JdbcSpec extends SparkSpecBase {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private def withStmt[A](f: java.sql.Statement => A): A = {
    val conn = DriverManager.getConnection(url)
    try f(conn.createStatement()) finally conn.close()
  }

  private def seedTable(name: String, n: Int): Unit = withStmt { st =>
    try st.execute(s"DROP TABLE $name") catch { case _: Exception => }
    st.execute(s"CREATE TABLE $name (id BIGINT PRIMARY KEY, " +
      "val VARCHAR(64), score DOUBLE)")
    val conn = st.getConnection
    val ps = conn.prepareStatement(s"INSERT INTO $name VALUES (?, ?, ?)")
    (1 to n).foreach { i =>
      ps.setLong(1, i.toLong); ps.setString(2, s"v$i")
      ps.setDouble(3, i * 0.5); ps.addBatch()
    }
    ps.executeBatch()
  }

  test("partitioned read sees all rows across N connections") {
    seedTable("t_read", 1000)
    val df = Jdbc.readPartitioned(spark, url, "t_read", "id", 1, 1000, 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 1000)
    assert(df.agg(sum("id")).head().getLong(0) == 500500L)
  }

  test("readAuto discovers bounds remotely; empty table degrades cleanly") {
    seedTable("t_auto", 257)
    val df = Jdbc.readAuto(spark, url, "t_auto", "id", 5)
    assert(df.rdd.getNumPartitions == 5 && df.count() == 257)
    seedTable("t_empty", 0)
    assert(Jdbc.readAuto(spark, url, "t_empty", "id", 5).count() == 0)
  }

  test("filter and column pruning push into the remote query") {
    seedTable("t_push", 100)
    val df = Jdbc.readPartitioned(spark, url, "t_push", "id", 1, 100, 2)
      .filter(col("score") > 25.0).select("id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(SCORE,25.0)"), plan)
    assert(df.count() == 50)
  }

  test("write overwrite + read-back round-trips values") {
    val src = (1 to 50).map(i => (i.toLong, s"row$i", i * 1.5))
      .toDF("id", "val", "score")
    Jdbc.write(src, url, "t_write", SaveMode.Overwrite, batchSize = 16)
    val back = Jdbc.read(spark, url, "t_write")
    assert(back.count() == 50)
    val got = back.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == src.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq)
  }

  test("appendIdempotent inserts only unseen keys (rerun-safe)") {
    seedTable("t_upsert", 10)
    val incoming = ((6 to 15).map(i => (i.toLong, s"new$i", 0.0)))
      .toDF("id", "val", "score")
    Jdbc.appendIdempotent(incoming, url, "t_upsert", Seq("id"))
    val after = Jdbc.read(spark, url, "t_upsert")
    assert(after.count() == 15)
    // ids 6..10 keep their ORIGINAL values (first writer wins)
    val v6 = after.filter(col("id") === 6).head().getString(1)
    assert(v6 == "v6")
    // rerun: no change
    Jdbc.appendIdempotent(incoming, url, "t_upsert", Seq("id"))
    assert(Jdbc.read(spark, url, "t_upsert").count() == 15)
  }
}
