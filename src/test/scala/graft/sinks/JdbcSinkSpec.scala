package graft.sinks

import java.sql.DriverManager

import graft.SparkSpec
import graft.pipeline.EventStatements
import org.apache.spark.sql.functions._

/** Drives the real JDBC path against embedded Derby (shipped with Spark for
  * the Hive metastore) — executor-side batched PreparedStatements, the
  * production ClickHouse shape minus the dialect's `now()`. */
class JdbcSinkSpec extends SparkSpec {

  test("JdbcStatementsSink writes the 4-column reference shape via bound parameters") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      """CREATE TABLE statements (
        |  id VARCHAR(64), statement VARCHAR(4096),
        |  created_at TIMESTAMP, "TIMESTAMP" TIMESTAMP)""".stripMargin)
    conn.close()

    val batch = EventStatements.statements(
      graft.Tables(spark, sf("sf0.001")).events.filter(col("event_id") < 50))
    val expected = batch.count()

    new JdbcStatementsSink(url, "", "", batchSize = 16, nowSql = "CURRENT_TIMESTAMP")
      .write(batch, "statements")

    val check = DriverManager.getConnection(url)
    val rs = check.createStatement().executeQuery(
      "SELECT count(*), count(created_at), count(DISTINCT id) FROM statements")
    rs.next()
    assert(rs.getLong(1) == expected)
    assert(rs.getLong(2) == expected) // created_at filled server-side
    assert(rs.getLong(3) == expected) // ids unique and intact
    // spot-check content round-trip incl. the anonymized JSON payload
    val rs2 = check.createStatement().executeQuery(
      "SELECT statement FROM statements FETCH FIRST 1 ROWS ONLY")
    rs2.next()
    assert(rs2.getString(1).contains("\"actor\":{\"account\":{\"name\":\""))
    check.close()
  }
}
