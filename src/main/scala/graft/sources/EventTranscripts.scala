package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Deterministic transcript-shaped view over the driver harness's `events`
 * table — gives the KG pipeline an oracle-checkable input that exists in
 * `/root/testdata` (the DuckDB oracle re-derives the same rows in SQL).
 *
 * conv_id  = "conv_" + user_id
 * turn_idx = rank of the event within its user by (ts, event_id)
 * text     = one of the extraction templates, chosen by event_id % 5
 *            (template 4 is chatter — no triple).
 */
object EventTranscripts {

  def fromEvents(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val person = concat(lit("user "), col("user_id").cast("string"))
    val person2 = concat(lit("user "), (col("user_id") + 1).cast("string"))
    val org = concat(lit("org "), pmod(col("event_id"), lit(20)).cast("string"))
    val city = concat(lit("city "), pmod(col("event_id"), lit(10)).cast("string"))
    val tmpl = pmod(col("event_id"), lit(5))
    events.select(
      concat(lit("conv_"), col("user_id").cast("string")).as("conv_id"),
      (row_number().over(w) - 1).as("turn_idx"),
      when(col("event_type") === "error", lit("tool")).otherwise(lit("user")).as("role"),
      when(tmpl === 0, concat(person, lit(" works at "), org, lit(".")))
        .when(tmpl === 1, concat(person, lit(" lives in "), city, lit(".")))
        .when(tmpl === 2, concat(person, lit(" reports to "), person2, lit(".")))
        .when(tmpl === 3, concat(org, lit(" is based in "), city, lit(".")))
        .otherwise(lit("Please summarize the previous discussion.")).as("text"),
      when(col("event_type") === "error", lit("db_query")).otherwise(lit(null).cast("string")).as("tool"),
      col("ts"))
  }

  /** The same synthesis as ANSI SQL for the DuckDB oracle (kept adjacent so
    * the two cannot drift). Emits a `transcripts` CTE body over `events`. */
  val sqlCte: String =
    """SELECT 'conv_' || CAST(user_id AS VARCHAR) AS conv_id,
      |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
      |  CASE WHEN event_type = 'error' THEN 'tool' ELSE 'user' END AS role,
      |  CASE event_id % 5
      |    WHEN 0 THEN 'user ' || CAST(user_id AS VARCHAR) || ' works at org ' || CAST(event_id % 20 AS VARCHAR) || '.'
      |    WHEN 1 THEN 'user ' || CAST(user_id AS VARCHAR) || ' lives in city ' || CAST(event_id % 10 AS VARCHAR) || '.'
      |    WHEN 2 THEN 'user ' || CAST(user_id AS VARCHAR) || ' reports to user ' || CAST(user_id + 1 AS VARCHAR) || '.'
      |    WHEN 3 THEN 'org ' || CAST(event_id % 20 AS VARCHAR) || ' is based in city ' || CAST(event_id % 10 AS VARCHAR) || '.'
      |    ELSE 'Please summarize the previous discussion.'
      |  END AS text,
      |  CASE WHEN event_type = 'error' THEN 'db_query' ELSE NULL END AS tool,
      |  ts
      |FROM events""".stripMargin
}
