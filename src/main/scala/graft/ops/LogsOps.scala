package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.Context

/** Golden Apache-weblog pipeline — the reference's logs benchmark shape
  * (`/root/reference/benchmarks/logs/runtuplex.py:43-62,283-286`): text
  * source of raw log lines → regex parse into 9 fields with sentinel
  * values on unparseable lines ('' / -1, the "regex" pipeline variant) →
  * endpoint anonymization (the `/~user` prefix rewritten; deterministic
  * md5 here where the reference uses random.choice, so both engines can
  * recompute it) → inner join against an IP blacklist → project the
  * malicious-request rows.
  *
  * The fixture synthesizes deterministic log lines from the events table
  * (every 13th line corrupt, every 7th content size '-', every 3rd
  * endpoint user-homedir-shaped) and round-trips them through a real text
  * sink + `Context.text` source, so the parse runs over files exactly as
  * the reference's does. The oracle rebuilds the same lines in SQL and
  * parses them with the same RE2-compatible regex — a hash match proves
  * the whole synthesize→write→read→parse→anonymize→join pipeline. */
object LogsOps {

  /** Apache common-log regex (reference `runtuplex.py:43`) — RE2-compatible
    * subset (no lookaround/backrefs) so Spark (Java regex) and DuckDB
    * (RE2) match identically on this data. */
  private val LogPat =
    """^(\S+) (\S+) (\S+) \[([\w:/]+\s[+\-]\d{4})\] "(\S+) (\S+)\s*(\S*)\s*" (\d{3}) (\S+)"""

  /** Deterministic log-line synthesis shared (in formula) with the
    * oracle: ip/method/endpoint/code/size all pure functions of
    * (event_id, user_id, event_type). */
  private def lineCol: Column = {
    val e = col("event_id")
    val u = col("user_id")
    val ip = concat(lit("10.0."), (u / 256).cast("long").cast("string"),
      lit("."), (u % 256).cast("string"))
    val sec = lpad((e % 60).cast("string"), 2, "0")
    val method = when(col("event_type") === "purchase", "POST")
      .when(col("event_type") === "signup", "PUT").otherwise(lit("GET"))
    val endpoint = when(e % 3 === 0,
        concat(lit("/~u"), u.cast("string"), lit("/p"), (e % 10).cast("string")))
      .otherwise(concat(lit("/"), col("event_type")))
    val code = when(e % 10 === 0, 500).when(e % 10 < 4, 404).otherwise(lit(200))
    val size = when(e % 7 === 0, lit("-")).otherwise((e % 2048).cast("string"))
    when(e % 13 === 0, concat(lit("CORRUPT-"), e.cast("string")))
      .otherwise(concat(
        ip, lit(" - u"), u.cast("string"),
        lit(" [01/Jan/2026:12:34:"), sec, lit(" +0000] \""),
        method, lit(" "), endpoint, lit(" HTTP/1.0\" "),
        code.cast("string"), lit(" "), size))
  }

  /** Same synthesis as [[lineCol]] in DuckDB SQL. */
  private val oLine: String =
    """CASE WHEN event_id % 13 = 0 THEN 'CORRUPT-' || event_id
      | ELSE '10.0.' || (user_id // 256) || '.' || (user_id % 256)
      |   || ' - u' || user_id
      |   || ' [01/Jan/2026:12:34:' || lpad(CAST(event_id % 60 AS VARCHAR), 2, '0')
      |   || ' +0000] "'
      |   || (CASE WHEN event_type = 'purchase' THEN 'POST'
      |            WHEN event_type = 'signup' THEN 'PUT' ELSE 'GET' END)
      |   || ' '
      |   || (CASE WHEN event_id % 3 = 0
      |            THEN '/~u' || user_id || '/p' || (event_id % 10)
      |            ELSE '/' || event_type END)
      |   || ' HTTP/1.0" '
      |   || (CASE WHEN event_id % 10 = 0 THEN 500
      |            WHEN event_id % 10 < 4 THEN 404 ELSE 200 END)
      |   || ' '
      |   || (CASE WHEN event_id % 7 = 0 THEN '-'
      |            ELSE CAST(event_id % 2048 AS VARCHAR) END)
      |END""".stripMargin
      // flattened before interpolation: the enclosing query template runs
      // its own stripMargin, which would eat the leading pipe of a
      // line-initial `||` operator
      .replace("\n", " ")

  val all: Seq[Q] = Seq(

    Q("q_logs_golden", {
      // single-quote the regex for SQL; group indices match Spark's
      val p = LogPat.replace("'", "''")
      s"""WITH lines AS (SELECT $oLine AS logline FROM events),
         |parsed AS (SELECT
         |    regexp_extract(logline, '$p', 1) AS ip,
         |    regexp_extract(logline, '$p', 4) AS date,
         |    regexp_extract(logline, '$p', 5) AS method,
         |    regexp_extract(logline, '$p', 6) AS endpoint,
         |    regexp_extract(logline, '$p', 7) AS protocol,
         |    CASE WHEN regexp_extract(logline, '$p', 8) = '' THEN -1
         |         ELSE CAST(regexp_extract(logline, '$p', 8) AS INT) END AS response_code,
         |    CASE WHEN regexp_extract(logline, '$p', 9) = '' THEN -1
         |         WHEN regexp_extract(logline, '$p', 9) = '-' THEN 0
         |         ELSE CAST(regexp_extract(logline, '$p', 9) AS INT) END AS content_size
         |  FROM lines),
         |anon AS (SELECT ip, date, method,
         |    regexp_replace(endpoint, '^/~[^/]+',
         |      '/~' || upper(substr(md5(endpoint), 1, 10))) AS endpoint,
         |    protocol, response_code, content_size
         |  FROM parsed),
         |bad AS (SELECT DISTINCT
         |    '10.0.' || (user_id // 256) || '.' || (user_id % 256) AS ip
         |  FROM events WHERE user_id % 10 = 0)
         |SELECT a.ip, date, method, endpoint, protocol, response_code,
         |  content_size, CAST(count(*) AS BIGINT) AS n
         |FROM anon a JOIN bad b ON a.ip = b.ip
         |GROUP BY 1, 2, 3, 4, 5, 6, 7""".stripMargin
    }) { (s, d) =>
      val ctx = new Context(s)
      // fixture: synthesize the raw log file through a real text sink
      val dir = Files.createTempDirectory("graft_logs").toString
      Tables(s, d, "events").select(lineCol.as("value"))
        .coalesce(4).write.mode("overwrite").text(dir)
      val badIps = Tables(s, d, "events")
        .filter(col("user_id") % 10 === 0)
        .select(concat(lit("10.0."), (col("user_id") / 256).cast("long").cast("string"),
          lit("."), (col("user_id") % 256).cast("string")).as("bad_ip"))
        .distinct()
      def ex(i: Int) = regexp_extract(col("logline"), LogPat, i)
      ctx.text(dir + "/*.txt")
        .renameColumn("value", "logline")
        .withColumn("ip", ex(1))
        .withColumn("date", ex(4))
        .withColumn("method", ex(5))
        .withColumn("endpoint", ex(6))
        .withColumn("protocol", ex(7))
        .withColumn("response_code",
          when(ex(8) === "", -1).otherwise(ex(8).cast("int")))
        .withColumn("content_size",
          when(ex(9) === "", -1).when(ex(9) === "-", 0)
            .otherwise(ex(9).cast("int")))
        .withColumn("endpoint", regexp_replace(col("endpoint"), lit("^/~[^/]+"),
          concat(lit("/~"), upper(substring(md5(col("endpoint")), 1, 10)))))
        .join(ctx.fromDataFrame(badIps), "ip", "bad_ip")
        .selectColumns(Seq("ip", "date", "method", "endpoint", "protocol",
          "response_code", "content_size"))
        .toDF
        .groupBy("ip", "date", "method", "endpoint", "protocol",
          "response_code", "content_size")
        .agg(count(lit(1)).as("n"))
    }
  )
}
