package graft.operators

import graft.Tables.load
import graft.functions.TextClean
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function battery (SURVEY.md §2.8 X1–X12). Each query drives the
  * function through data plus synthesized edge cases (URLs, punctuation,
  * stop-tokens, mixed case) so the oracle actually exercises the branches.
  * All expressions stay inside whole-stage codegen — no UDFs.
  */
object ScalarFns {

  type Q = (SparkSession, String) => DataFrame

  // Edge-case prefix/suffix spliced around every document so the cleaning
  // chain's URL/punct/stop/case branches all fire on real rows.
  private[graft] val EdgePrefix = "Check http://ex.com/A?q=1 THIS Just WWW.x.Y "
  private[graft] val EdgeSuffix = " !!! im IVE (parens) [brack] {brace} a.b,c;d"

  val queries: Map[String, Q] = Map(
    // X1–X5 / D2 — the full preprocess chain (redditProcessor.py:36-53).
    "x_clean_text" -> ((s, dir) =>
      load(s, dir, "documents")
        .select(col("doc_id"),
          TextClean.clean(concat(lit(EdgePrefix), col("text"), lit(EdgeSuffix)))
            .as("cleaned"))
        .orderBy("doc_id")),

    // X6 — null-safe concat with space (pandas NaN vs concat_ws parity:
    // coalesce to '' so both engines see the same value).
    "x6_concat" -> ((s, dir) =>
      load(s, dir, "documents")
        .select(col("doc_id"),
          concat_ws(" ", coalesce(col("lang"), lit("")), coalesce(col("source"), lit("")))
            .as("joined"))
        .orderBy("doc_id")),

    // X8 — timestamp → ISO-8601 'Z' string (reddit_harvester_aus.py:46-49).
    "x8_iso8601" -> ((s, dir) =>
      load(s, dir, "events")
        .select(col("event_id"), TextClean.toIso8601(col("ts")).as("iso"))
        .orderBy("event_id")),

    // X10 — string casts (addReddit.py:49).
    "x10_cast" -> ((s, dir) =>
      load(s, dir, "events")
        .select(col("event_id"),
          col("user_id").cast("string").as("user_s"),
          col("value").cast("string").as("value_s"))
        .orderBy("event_id")),

    // X11 — JSON field extraction (enqueue.py:45 / addReddit.py:34-37).
    "x11_json" -> ((s, dir) =>
      load(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")),

    // X12 — composite sink key `{row}_{batch}` (redditProcessor.py:135).
    "x12_composite_key" -> ((s, dir) =>
      load(s, dir, "events")
        .select(concat_ws("_", col("user_id"), col("event_id")).as("k"),
          col("event_type"))
        .orderBy("k", "event_type")))

  val oracle: Map[String, String] = Map(
    "x_clean_text" -> {
      val inner = "concat('" + EdgePrefix.replace("'", "''") + "', text, '" +
        EdgeSuffix.replace("'", "''") + "')"
      s"SELECT doc_id, ${TextClean.cleanSql(inner)} AS cleaned FROM documents ORDER BY doc_id"
    },

    "x6_concat" ->
      """SELECT doc_id, concat_ws(' ', coalesce(lang, ''), coalesce(source, '')) AS joined
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x8_iso8601" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso
        |FROM events ORDER BY event_id""".stripMargin,

    "x10_cast" ->
      """SELECT event_id, CAST(user_id AS VARCHAR) AS user_s,
        |  CAST(value AS VARCHAR) AS value_s
        |FROM events ORDER BY event_id""".stripMargin,

    "x11_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "x12_composite_key" ->
      """SELECT concat_ws('_', user_id, event_id) AS k, event_type
        |FROM events ORDER BY k, event_type""".stripMargin)
}
