package graft

import java.sql.{DriverManager, Timestamp}

import org.apache.spark.sql.functions._
import graft.sources.JdbcTranscripts

/**
 * EXECUTED external-database ingest: an embedded Apache Derby instance
 * (in-memory, same JVM — derby jars ship with the Spark distribution at
 * /opt/spark/jars, so this exercises the real `spark.read.jdbc` path with
 * zero egress). The reference's analog is a live Neo4j-over-bolt pull
 * (cs562_sdpg `schemadiscovery/src/main/scala/DataLoader.scala:23,71`);
 * round 3 could only unit-test the contract projection against mocked
 * schemas — this suite closes that gap with a real remote read: parallel
 * range partitions, pushed predicate, remote type widenings.
 */
class JdbcIntegrationSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  private lazy val seeded: Unit = {
    Class.forName(driver)
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      // remote shape: BIGINT turn_idx (widened), empty-string tool
      // convention, an extra row-id for range partitioning, a junk column
      // the contract projection must drop
      st.executeUpdate(
        """CREATE TABLE transcripts (
          |  rid BIGINT NOT NULL PRIMARY KEY,
          |  conv_id VARCHAR(64), turn_idx BIGINT, role VARCHAR(16),
          |  text VARCHAR(512), tool VARCHAR(64), ts TIMESTAMP,
          |  junk VARCHAR(8))""".stripMargin)
      val ps = conn.prepareStatement("INSERT INTO transcripts VALUES (?,?,?,?,?,?,?,?)")
      (0 until 100).foreach { i =>
        ps.setLong(1, i.toLong)
        ps.setString(2, s"c${i / 10}")
        ps.setLong(3, (i % 10).toLong)
        ps.setString(4, if (i % 2 == 0) "user" else "assistant")
        ps.setString(5, s"turn text $i")
        ps.setString(6, if (i % 3 == 0) "search" else "") // "" -> null contract
        ps.setTimestamp(7, Timestamp.valueOf(f"2026-01-01 10:${i % 60}%02d:00"))
        ps.setString(8, "junk")
        ps.executeUpdate()
      }
      ps.close(); st.close()
    } finally conn.close()
  }

  private def read(pred: Option[String]) = {
    seeded
    JdbcTranscripts.read(spark, url, "transcripts", "rid", 0L, 100L, 4,
      predicate = pred, options = Map("driver" -> driver))
  }

  test("jdbc: executed Derby read matches the same rows built locally") {
    import spark.implicits._
    val got = read(None)
    assert(got.rdd.getNumPartitions == 4, "range-partitioned parallel pull")
    val expected = (0 until 100).map { i =>
      (s"c${i / 10}", i % 10, if (i % 2 == 0) "user" else "assistant",
        s"turn text $i", if (i % 3 == 0) Some("search") else None,
        Timestamp.valueOf(f"2026-01-01 10:${i % 60}%02d:00"))
    }.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    // compare names + types (nullability differs: the remote NOT NULL
    // metadata is not part of the contract)
    assert(got.schema.map(f => (f.name, f.dataType)) ==
      expected.schema.map(f => (f.name, f.dataType)),
      s"contract schema: ${got.schema} vs ${expected.schema}")
    assert(got.collect().toSet == expected.collect().toSet)
  }

  test("jdbc: predicate is pushed into the remote scan as a derived table") {
    val got = read(Some("turn_idx >= 2"))
    assert(got.count() == 80)
    assert(got.agg(min(col("turn_idx"))).head().getInt(0) == 2)
    // the remote query plan (JDBCRelation) carries the pushed filter
    val p = got.queryExecution.toString()
    assert(p.contains("graft_src") && p.contains("turn_idx >= 2"),
      s"expected derived-table pushdown in the scan; got:\n${p.take(1500)}")
  }
}
