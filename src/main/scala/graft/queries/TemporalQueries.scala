package graft.queries

import org.apache.spark.sql.functions._

import QueryDsl._
import graft.ops.TemporalJoins

/** Temporal operators over the `events` table: as-of join, time-window
  * (equi-key + range) join, bucketized pure range join, and the
  * daily-pivot rollup. Each has a DuckDB oracle — the as-of oracle uses
  * DuckDB's native `ASOF JOIN`, so the union+window implementation is
  * checked against an independent engine's definition of the operator.
  */
object TemporalQueries {

  val entries: List[(String, Q, Option[String])] = List(

    // ---- as-of join: for each purchase, the most recent prior-or-equal
    // click by the same user (TemporalJoins.asofJoin: union + window,
    // ONE shuffle, no join node; DuckDB plans its native ASOF JOIN) ----
    ("q60_asof_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        // unique per (user_id, ts): ties (same-µs clicks) pick max id
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("click_id"))
          .withColumn("click_ts", col("ts"))
        TemporalJoins.asofJoin(purchases, clicks, key = "user_id")
          .select(col("event_id"), col("user_id"),
            unix_timestamp(col("ts")).as("purchase_sec"),
            col("click_id"),
            (unix_timestamp(col("ts")) - unix_timestamp(col("click_ts"))).as("gap_sec"))
          .orderBy(col("event_id"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        c AS (SELECT user_id, ts, MAX(event_id) AS click_id
              FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
        SELECT p.event_id, p.user_id,
          CAST(epoch(date_trunc('second', p.ts)) AS BIGINT) AS purchase_sec,
          c.click_id,
          CAST(epoch(date_trunc('second', p.ts))
             - epoch(date_trunc('second', c.ts)) AS BIGINT) AS gap_sec
        FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id""")),

    // ---- time-window join: purchases within 30 min after a click by
    // the same user. The equi-key (user_id) carries the shuffle; the
    // range predicate only filters within key groups — the standard
    // funnel/attribution join shape (batch face of
    // EventStreams.clickPurchaseJoin) ----------------------------------
    ("q61_window_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("c_ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("p_ts"))
        clicks.join(purchases, Seq("user_id"))
          .filter(col("p_ts") > col("c_ts") &&
                  col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_pairs"),
            min(unix_timestamp(col("p_ts")) - unix_timestamp(col("c_ts"))).as("min_gap_sec"))
          .orderBy(col("user_id"))
      },
      Some("""WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
        p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
        SELECT c.user_id, COUNT(*) AS n_pairs,
          CAST(MIN(epoch(date_trunc('second', p.ts))
                 - epoch(date_trunc('second', c.ts))) AS BIGINT) AS min_gap_sec
        FROM c JOIN p ON c.user_id = p.user_id
          AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        GROUP BY c.user_id ORDER BY c.user_id""")),

    // ---- pure range join (NO equi-key): events inside each error's
    // 10-minute follow-up window, via the bucketized equi-join
    // (TemporalJoins.rangeBucketJoin). Catalyst's own plan for the raw
    // inequality would be a BroadcastNestedLoopJoin — quadratic.
    // DuckDB (range-join aware: IEJoin) runs the inequality directly --
    ("q62_range_join",
      (s, dir) => {
        val ev = t(s, dir, "events").withColumn("ts_us", unix_micros(col("ts")))
        val windowUs = 10L * 60 * 1000 * 1000
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("ts_us").as("w_start"))
          .withColumn("w_end", col("w_start") + windowUs)
        val points = ev.select(col("event_id"), col("ts_us"))
        val pairs = TemporalJoins.rangeBucketJoin(errors, points,
          intervalId = "err_id", startCol = "w_start", endCol = "w_end",
          pointId = "event_id", pointCol = "ts_us", bucketWidth = windowUs)
          .filter(col("event_id") =!= col("err_id"))
        val counts = pairs.groupBy(col("err_id")).agg(count(lit(1)).as("n_following"))
        errors.select(col("err_id").as("event_id"))
          .join(counts.withColumnRenamed("err_id", "event_id"), Seq("event_id"), "left")
          .na.fill(0L, Seq("n_following"))
          .orderBy(col("event_id"))
      },
      Some("""WITH err AS (SELECT event_id, ts FROM events WHERE event_type = 'error')
        SELECT err.event_id, COUNT(e.event_id) AS n_following
        FROM err LEFT JOIN events e
          ON e.ts >= err.ts AND e.ts < err.ts + INTERVAL 10 MINUTE
          AND e.event_id <> err.event_id
        GROUP BY err.event_id ORDER BY err.event_id""")),

    // ---- the SAME range join written as a RAW inequality join: the
    // RangeJoinRewrite optimizer rule (installed here via
    // experimental.extraOptimizations; via GraftExtensions in
    // configured deployments) rewrites it to the bucketized equi-join
    // — PlanAudit asserts no BroadcastNestedLoopJoin survives. Same
    // oracle as q62: the rewrite must not change a single row ---------
    ("q73_range_join_auto",
      (s, dir) => {
        import graft.plans.RangeJoinRewrite
        if (!s.experimental.extraOptimizations.exists(_ eq RangeJoinRewrite))
          s.experimental.extraOptimizations =
            s.experimental.extraOptimizations :+ RangeJoinRewrite
        val windowUs = 10L * 60 * 1000 * 1000
        s.conf.set(RangeJoinRewrite.WidthKey, windowUs.toString)
        val ev = t(s, dir, "events").withColumn("ts_us", unix_micros(col("ts")))
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("ts_us").as("w_start"))
          .withColumn("w_end", col("w_start") + windowUs)
        val points = ev.select(col("event_id"), col("ts_us"))
        val pairs = errors.join(points,
            col("ts_us") >= col("w_start") && col("ts_us") < col("w_end") &&
            col("event_id") =!= col("err_id"))
        val counts = pairs.groupBy(col("err_id")).agg(count(lit(1)).as("n_following"))
        errors.select(col("err_id").as("event_id"))
          .join(counts.withColumnRenamed("err_id", "event_id"), Seq("event_id"), "left")
          .na.fill(0L, Seq("n_following"))
          .orderBy(col("event_id"))
      },
      Some("""WITH err AS (SELECT event_id, ts FROM events WHERE event_type = 'error')
        SELECT err.event_id, COUNT(e.event_id) AS n_following
        FROM err LEFT JOIN events e
          ON e.ts >= err.ts AND e.ts < err.ts + INTERVAL 10 MINUTE
          AND e.event_id <> err.event_id
        GROUP BY err.event_id ORDER BY err.event_id""")),

    // ---- the SAME range join on RAW TimestampType columns — the
    // natural user formulation (`ts >= w_start AND ts < w_end` with
    // interval arithmetic, no manual unix_micros prep). The rewrite
    // bucketizes through UnixMicros; same oracle as q62/q73 ----------
    ("q88_range_join_ts",
      (s, dir) => {
        import graft.plans.RangeJoinRewrite
        if (!s.experimental.extraOptimizations.exists(_ eq RangeJoinRewrite))
          s.experimental.extraOptimizations =
            s.experimental.extraOptimizations :+ RangeJoinRewrite
        val windowUs = 10L * 60 * 1000 * 1000
        s.conf.set(RangeJoinRewrite.WidthKey, windowUs.toString)
        val ev = t(s, dir, "events")
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("ts").as("w_start"))
          .withColumn("w_end", col("w_start") + expr("INTERVAL 10 MINUTES"))
        val points = ev.select(col("event_id"), col("ts"))
        val pairs = errors.join(points,
            col("ts") >= col("w_start") && col("ts") < col("w_end") &&
            col("event_id") =!= col("err_id"))
        val counts = pairs.groupBy(col("err_id")).agg(count(lit(1)).as("n_following"))
        errors.select(col("err_id").as("event_id"))
          .join(counts.withColumnRenamed("err_id", "event_id"), Seq("event_id"), "left")
          .na.fill(0L, Seq("n_following"))
          .orderBy(col("event_id"))
      },
      Some("""WITH err AS (SELECT event_id, ts FROM events WHERE event_type = 'error')
        SELECT err.event_id, COUNT(e.event_id) AS n_following
        FROM err LEFT JOIN events e
          ON e.ts >= err.ts AND e.ts < err.ts + INTERVAL 10 MINUTE
          AND e.event_id <> err.event_id
        GROUP BY err.event_id ORDER BY err.event_id""")),

    // ---- pivot: daily event-type count matrix. The pivot value list
    // is FIXED (no driver-side distinct scan — .pivot(col) without
    // values collects the domain to the driver, a full extra scan at
    // 100 TB); absent cells coalesce to 0 -----------------------------
    ("q63_pivot_daily",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        t(s, dir, "events")
          .groupBy(unix_timestamp(date_trunc("day", col("ts"))).as("day_ts"))
          .pivot("event_type", types)
          .agg(count(lit(1)))
          .select(col("day_ts") +: types.map(tp =>
            coalesce(col(tp), lit(0L)).as(s"n_$tp")): _*)
          .orderBy(col("day_ts"))
      },
      Some("""SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_ts,
        COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
        COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
        COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
        FROM events GROUP BY 1 ORDER BY day_ts"""))
  )
}
