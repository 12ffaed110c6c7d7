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
      val dir = TempDirs.tempDir("graft_logs")
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
    },

    // ---- 311 golden: the reference's service-requests cleaning job --------
    // `/root/reference/benchmarks/311/runtuplex.py:91-118`: csv with the
    // benchmark's six null-value strings -> mapColumn("Incident Zip",
    // fix_zip_codes) (truncate to 5, '00000' -> None, None passes
    // through) -> unique() -> csv. The fixture synthesizes a dirty zip
    // column cycling through all the benchmark's null/zip+4/short/sentinel
    // shapes, round-trips it through a REAL csv sink + the api csv source
    // (null-value mapping exercised on actual files), and the oracle
    // replays the synthesis + cleaning in SQL — a hash match proves the
    // write->read->nullmap->fix->distinct loop end-to-end.
    Q("q_311_golden", {
      val zipRaw =
        """CASE event_id % 9
          | WHEN 0 THEN '10023'
          | WHEN 1 THEN CAST(10000 + event_id % 80000 AS VARCHAR) || '-'
          |   || lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0')
          | WHEN 2 THEN '00000'
          | WHEN 3 THEN 'NO CLUE'
          | WHEN 4 THEN 'N/A'
          | WHEN 5 THEN 'Unspecified'
          | WHEN 6 THEN ''
          | WHEN 7 THEN '0'
          | ELSE CAST(10000 + event_id % 89999 AS VARCHAR)
          |END""".stripMargin.replace("\n", " ")
      s"""WITH raw AS (SELECT event_type AS complaint_type,
         |    ['MANHATTAN','BROOKLYN','QUEENS','BRONX','STATEN ISLAND'][CAST(user_id % 5 AS INT) + 1] AS borough,
         |    $zipRaw AS zip_raw
         |  FROM events),
         |n AS (SELECT complaint_type, borough,
         |    CASE WHEN zip_raw IN ('Unspecified', 'NO CLUE', 'NA', 'N/A', '0', '')
         |         THEN NULL ELSE zip_raw END AS z
         |  FROM raw)
         |SELECT DISTINCT complaint_type, borough,
         |  CASE WHEN z IS NULL THEN NULL
         |       WHEN substr(z, 1, 5) = '00000' THEN NULL
         |       ELSE substr(z, 1, 5) END AS incident_zip
         |FROM n""".stripMargin
    }) { (s, d) =>
      val ctx = new Context(s)
      val dir = TempDirs.tempDir("graft_311")
      val boroughs = array(lit("MANHATTAN"), lit("BROOKLYN"), lit("QUEENS"),
        lit("BRONX"), lit("STATEN ISLAND"))
      val e = col("event_id")
      val zipRaw = when(e % 9 === 0, lit("10023"))
        .when(e % 9 === 1, concat((lit(10000) + e % 80000).cast("string"),
          lit("-"), lpad((e % 10000).cast("string"), 4, "0")))
        .when(e % 9 === 2, lit("00000"))
        .when(e % 9 === 3, lit("NO CLUE"))
        .when(e % 9 === 4, lit("N/A"))
        .when(e % 9 === 5, lit("Unspecified"))
        .when(e % 9 === 6, lit(""))
        .when(e % 9 === 7, lit("0"))
        .otherwise((lit(10000) + e % 89999).cast("string"))
      Tables(s, d, "events").select(
          col("event_type").as("complaint_type"),
          element_at(boroughs, (col("user_id") % 5 + 1).cast("int")).as("borough"),
          zipRaw.as("incident_zip"))
        .coalesce(4).write.mode("overwrite").option("header", "true").csv(dir)
      ctx.csv(dir + "/*.csv",
          nullValues = Seq("Unspecified", "NO CLUE", "NA", "N/A", "0", ""))
        .mapColumnUdf[String, String]("incident_zip") { z =>
          if (z == null) null
          else { val s5 = z.take(5); if (s5 == "00000") null else s5 }
        }
        .unique()
        .toDF
    },

    // ---- retention cohorts: first-seen day × activity-day offset ----------
    // The standard DAU-retention triangle. Two user-keyed aggregations
    // (first-seen, then distinct activity days) — the cohort join is on
    // user_id, so at scale both sides share one hash partitioning and
    // the day grid is tiny. All-integer outputs.
    Q("q_retention_cohorts",
      """WITH a AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS act_day
        |           FROM events),
        |f AS (SELECT user_id, min(act_day) AS cohort_day FROM a GROUP BY user_id)
        |SELECT cohort_day,
        |  CAST(datediff('day', cohort_day, act_day) AS BIGINT) AS day_offset,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
        |FROM a JOIN f USING (user_id)
        |WHERE datediff('day', cohort_day, act_day) <= 28
        |GROUP BY cohort_day, datediff('day', cohort_day, act_day)""".stripMargin) { (s, d) =>
      val a = Tables(s, d, "events")
        .select(col("user_id"), to_date(col("ts")).as("act_day")).distinct()
      val f = a.groupBy("user_id").agg(min(col("act_day")).as("cohort_day"))
      a.join(f, "user_id")
        .withColumn("day_offset", datediff(col("act_day"), col("cohort_day")).cast("long"))
        .filter(col("day_offset") <= 28)
        .groupBy("cohort_day", "day_offset")
        .agg(countDistinct(col("user_id")).as("n_active"))
    },

    // ---- ordered funnel: view -> click -> purchase, strictly in order -----
    // Each stage is a user-keyed min-timestamp aggregation constrained
    // AFTER the previous stage's time — three shuffles on user_id (one
    // partitioning, reused), never a self-join explosion. The three
    // stage counts land in one row via labeled 1-row cross joins (same
    // scalar license as q22/q15). Timestamps are µs-exact in both
    // engines (verified: no sub-µs components in the fixture), so the
    // strict > comparisons are engine-identical.
    Q("q_funnel",
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
        |SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
        |  CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click_after,
        |  CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase_after""".stripMargin) { (s, d) =>
      val e = Tables(s, d, "events").select("user_id", "event_type", "ts")
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val c = e.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
      val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("ts") > col("t2"))
        .groupBy("user_id").agg(min(col("ts")).as("t3"))
      v.agg(count(lit(1)).as("n_view"))
        .join(broadcast(c.agg(count(lit(1)).as("n_click_after")))) // 1-row scalar
        .join(broadcast(p.agg(count(lit(1)).as("n_purchase_after")))) // 1-row scalar
    }
  )
}
