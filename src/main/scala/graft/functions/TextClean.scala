package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's text-preprocessing chain (SURVEY.md §2.8 X1–X5, D2;
  * redditProcessor.py:36-53) as pure, codegen'd column expressions — no UDF.
  *
  * Regex patterns are written in the subset common to Java regex (Spark) and
  * RE2 (DuckDB oracle) so the identical pattern strings run on both engines.
  */
object TextClean {

  /** X2 — URL strip (redditProcessor.py:38-40). */
  val UrlRe = "(?i)http\\S+|www\\S+|https\\S+"

  /** X3 — exact `string.punctuation` char class (redditProcessor.py:42-43).
    * Deliberately the Python list, not Unicode \p{Punct}, for parity. */
  val PunctRe = "[!\"#$%&'()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]"

  /** X4 — the reference's fixed 23-token stop-phrase list
    * (redditProcessor.py:45-50), word-boundary-delimited, case-insensitive. */
  val StopTokens: Seq[String] = Seq(
    "'ve", "ve", "this", "just", "like", "dont", "got", "really", "think",
    "know", "knew", "actually", "way", "yeah", "did", "im", "ive", "st",
    "want", "tho", "thats", "yes")
  val StopRe: String = "(?i)\\b(?:" + StopTokens.mkString("|") + ")\\b"

  /** X5 — whitespace collapse. */
  val WsRe = "\\s+"

  /** D2 — the full X1..X5 composition: lower → strip URLs → strip punct →
    * strip stop phrases → normalize whitespace → trim. */
  def clean(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(lower(c), UrlRe, ""),
          PunctRe, ""),
        StopRe, ""),
      WsRe, " "))

  /** The same chain rendered for the DuckDB oracle (single-quoted SQL string
    * of `expr`). RE2's 'g' flag mirrors Java's replace-all default. */
  def cleanSql(expr: String): String = {
    def q(re: String) = "'" + re.replace("'", "''") + "'"
    s"trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
      s"lower($expr), ${q(UrlRe)}, '', 'g'), ${q(PunctRe)}, '', 'g'), " +
      s"${q(StopRe)}, '', 'g'), '\\s+', ' ', 'g'))"
  }

  /** X8 — epoch/timestamp → ISO-8601 'Z' string (reddit_harvester_aus.py:46-49). */
  def toIso8601(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")
}
