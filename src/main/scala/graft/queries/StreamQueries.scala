package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.EventsStream

/** s01 (SURVEY §2): gap-based sessionization over the events table —
  * the batch twin of the streaming sessionizer, fully DuckDB-oracled
  * (lag + cumsum + per-session aggregate, epoch-microsecond longs so
  * no timestamp rendering is compared). */
object StreamQueries {

  val defs: Map[String, Q] = Map(
    "s01_sessionize_batch" -> Q(
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus, value FROM events),
        |flags AS (
        |  SELECT user_id, tus, value,
        |    CASE WHEN lag(tus) OVER w IS NULL
        |              OR tus - lag(tus) OVER w > 3600000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |sess AS (
        |  SELECT user_id, tus, value,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flags)
        |SELECT user_id, session_id,
        |  MIN(tus) AS session_start_us, MAX(tus) AS session_end_us,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin) { (s, dir) =>
      EventsStream.sessionizeBatch(Tables(s, dir).events, gapSec = 3600)
        .orderBy("user_id", "session_id")
    },

    // Skew-safe two-phase aggregation over event_type — 5 values for
    // 10k+ rows is exactly the hot-key shape that pins a plain shuffle
    // on 5 reducers; the salt spreads each key over 16. Results are
    // salt-invariant, so the oracle is the plain GROUP BY.
    "x01_salted_agg" -> Q(
      """SELECT event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  COUNT(*) AS n,
        |  MIN(value) AS min_value, MAX(value) AS max_value,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      graft.operators.Skew.saltedAgg(
          Tables(s, dir).events, Seq("event_type"), "value", buckets = 16)
        .select("event_type", "total", "n", "min_value", "max_value", "avg_value")
        .orderBy("event_type")
    },

    // Skew-safe JOIN: enrich every event with its type profile (the
    // "join back a computed dim" shape — the dim is an aggregate of the
    // fact itself, so every fact row matches one of 5 hot keys). The
    // salt spreads each hot key over 16 reducers; results are
    // salt-invariant, so the oracle is the plain join. Deviation is
    // double-arithmetic on an exact decimal mean, rounded to 6 in both
    // engines.
    "x02_skew_join" -> Q(
      """WITH d AS (
        |  SELECT event_type, COUNT(*) AS n_type,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_v
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, n_type,
        |  ROUND(e.value - d.avg_v, 6) AS dev
        |FROM events e JOIN d USING (event_type)
        |ORDER BY e.event_id""".stripMargin) { (s, dir) =>
      val events = Tables(s, dir).events
      val dim = events.groupBy("event_type")
        .agg(count(lit(1)).as("n_type"),
          (sum(col("value").cast("decimal(18,2)")).cast("double")
            / count(lit(1))).as("avg_v"))
      graft.operators.Skew.saltedJoin(events, dim, "event_type", buckets = 16)
        .select(col("event_id"), col("event_type"), col("n_type"),
          round(col("value") - col("avg_v"), 6).as("dev"))
        .orderBy("event_id")
    }
  )
}
