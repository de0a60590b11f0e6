package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage (SURVEY.md §2.2–§2.6) expressed over the
  * TPC-H-ish testdata.
  *
  * Scale design notes (100 TB):
  *  - Aggregations rely on Catalyst's partial+final HashAggregate — the
  *    Spark twin of the reference's hand-installed combiners (§2.4).
  *  - Dimension joins (`nation`, `region`, param grids) are explicitly
  *    `broadcast()` — no shuffle of the fact side.
  *  - Fact-fact joins (orders⋈customer) shuffle on the join key; AQE
  *    handles skew and re-plans to broadcast when a side turns out tiny.
  *  - Money sums go through DECIMAL so results are exact and
  *    order-independent — a raw double sum is nondeterministic under
  *    parallel reduction and could never match an oracle (or itself).
  */
object RelationalQueries {

  private def decSum(col: String, scale: Int = 2): String =
    Decl.decSumSql(col, scale)

  val all: Seq[Decl] = Seq(

    // A1/A2: multi-metric aggregation with automatic partial aggregation
    // (reference combiner pattern: WordCount.java:99, QueryTermCount.java:194).
    Decl(
      "q01_agg_sums",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            expr(decSum("l_quantity")).as("sum_qty"),
            expr(decSum("l_extendedprice")).as("sum_base"),
            expr(decSum("l_extendedprice*(1-l_discount)", 4)).as("sum_disc_price"),
            count(lit(1)).as("cnt")),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  ${decSum("l_quantity")} AS sum_qty,
              |  ${decSum("l_extendedprice")} AS sum_base,
              |  ${decSum("l_extendedprice*(1-l_discount)", 4)} AS sum_disc_price,
              |  count(*) AS cnt
              |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin),
      survey = Seq("A1", "A2")),

    // J2/J3/S10: multiway join; small dims broadcast, fact join shuffled.
    Decl(
      "q02_join_multiway",
      (s, dir) => {
        val orders = Tables(s, dir, "orders")
        val customer = Tables(s, dir, "customer")
        val nation = Tables(s, dir, "nation")
        val region = Tables(s, dir, "region")
        orders
          .join(customer, orders("o_custkey") === customer("c_custkey"))
          .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
          .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
          .groupBy("r_name")
          .agg(count(lit(1)).as("n_orders"),
            expr(decSum("o_totalprice")).as("revenue"))
      },
      Some(s"""SELECT r_name, count(*) AS n_orders,
              |  ${decSum("o_totalprice")} AS revenue
              |FROM orders
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |GROUP BY r_name""".stripMargin),
      survey = Seq("J2", "J3", "S10")),

    // T1/T2/T3: per-group top-k via window — the Spark twin of the
    // reference's bounded insertion-sort combiner (TrecRun.java:156-196).
    // Partial limits run map-side under AQE; the only shuffle is the
    // window hash partition on the group key.
    Decl(
      "q03_topk_per_group",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        Tables(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) t WHERE rn <= 3""".stripMargin),
      survey = Seq("T1", "T2", "T3")),

    // P7/P10: predicate + projection pushed to the parquet scan
    // (PushedFilters/ReadSchema visible in .explain).
    Decl(
      "q04_filter_project",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .filter(col("l_quantity") >= 48 && col("l_returnflag") === "R")
          .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"),
      Some("""SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
             |FROM lineitem
             |WHERE l_quantity >= 48 AND l_returnflag = 'R'""".stripMargin),
      survey = Seq("P7", "P10")),

    // Left-semi join (the reference's query-vocabulary prefilter pattern,
    // TrecRun.java:131).
    Decl(
      "q05_semi_join",
      (s, dir) =>
        Tables(s, dir, "customer")
          .join(Tables(s, dir, "orders").select(col("o_custkey").as("c_custkey")),
            Seq("c_custkey"), "left_semi")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n")),
      Some("""SELECT c_mktsegment, count(*) AS n FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |GROUP BY c_mktsegment""".stripMargin),
      survey = Seq("J1", "P9")),

    // Left-anti join (the reference's stoplist pattern, §2.2 P9):
    // orders with no high-quantity line item.
    Decl(
      "q06_anti_join",
      (s, dir) =>
        Tables(s, dir, "orders")
          .join(
            Tables(s, dir, "lineitem").filter(col("l_quantity") >= 45)
              .select(col("l_orderkey").as("o_orderkey")),
            Seq("o_orderkey"), "left_anti")
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n")),
      Some("""SELECT o_orderstatus, count(*) AS n FROM orders
             |WHERE NOT EXISTS (SELECT 1 FROM lineitem
             |                  WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
             |GROUP BY o_orderstatus""".stripMargin),
      survey = Seq("P9")),

    // A9: distinct.
    Decl(
      "q07_distinct",
      (s, dir) =>
        Tables(s, dir, "lineitem").select("l_returnflag", "l_linestatus").distinct(),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"),
      survey = Seq("A9")),

    // T3: global sort + limit — Spark plans TakeOrderedAndProject (partial
    // top-k per partition, no full sort shuffle).
    Decl(
      "q08_sort_limit",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_extendedprice")
          .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))
          .limit(20),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
             |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin),
      survey = Seq("T3")),

    // §2.6 set ops: union-all + aggregate.
    Decl(
      "q09_union_agg",
      (s, dir) =>
        Tables(s, dir, "customer").select(col("c_nationkey").as("nk"))
          .unionByName(Tables(s, dir, "supplier").select(col("s_nationkey").as("nk")))
          .groupBy("nk").agg(count(lit(1)).as("n")),
      Some("""SELECT nk, count(*) AS n FROM (
             |  SELECT c_nationkey AS nk FROM customer
             |  UNION ALL SELECT s_nationkey FROM supplier) u GROUP BY nk""".stripMargin),
      survey = Seq("SET")),

    // A3: global counters (reference Hadoop counters → one-row agg).
    Decl(
      "q10_global_stats",
      (s, dir) =>
        Tables(s, dir, "lineitem").agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_partkey")).as("n_parts"),
          expr(decSum("l_quantity")).as("sum_qty")),
      Some(s"""SELECT count(*) AS n_rows, count(DISTINCT l_partkey) AS n_parts,
              |  ${decSum("l_quantity")} AS sum_qty FROM lineitem""".stripMargin),
      survey = Seq("A3")),

    // §2.7 parameter sweeps: aggregate once, THEN cross-join the λ grid
    // (the reference recomputes per λ; aggregating first is the scale win).
    Decl(
      "q11_param_sweep",
      (s, dir) => {
        val agg = Tables(s, dir, "events")
          .groupBy("event_type")
          .agg(expr(decSum("value")).as("sum_value"))
        val grid = s.range(0, 5).select(
          (col("id").cast("double") * 0.2 + 0.1).as("lam"))
        agg.crossJoin(broadcast(grid))
          .select(col("event_type"), col("lam"),
            (col("sum_value") * col("lam")).as("weighted"))
      },
      Some(s"""SELECT event_type, lam, sum_value * lam AS weighted FROM (
              |  SELECT event_type, ${decSum("value")} AS sum_value
              |  FROM events GROUP BY event_type) a
              |CROSS JOIN (SELECT unnest([0,1,2,3,4]) * CAST(0.2 AS DOUBLE)
              |            + CAST(0.1 AS DOUBLE) AS lam) g""".stripMargin),
      survey = Seq("GRID")),

    // Batch twin of a streaming tumbling-window aggregation (§2.8).
    Decl(
      "q12_time_window",
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
          .agg(count(lit(1)).as("n"), expr(decSum("value")).as("sum_value")),
      Some(s"""SELECT date_trunc('hour', ts) AS hour_ts, event_type,
              |  count(*) AS n, ${decSum("value")} AS sum_value
              |FROM events GROUP BY 1, 2""".stripMargin),
      survey = Seq("STREAM-WINDOW")),

    // Gap-based sessionization: lag + conditional cumsum — the batch twin
    // of flatMapGroupsWithState sessionization.
    Decl(
      "q13_sessionize",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables(s, dir, "events")
          .withColumn("prev", lag(col("ts"), 1).over(w))
          .withColumn("is_new",
            when(col("prev").isNull ||
              unix_micros(col("ts")) - unix_micros(col("prev")) > 1800000000L, 1L)
              .otherwise(0L))
          .groupBy("user_id")
          .agg(sum(col("is_new")).as("n_sessions"), count(lit(1)).as("n_events"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, ts,
             |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM events)
             |SELECT user_id,
             |  CAST(sum(CASE WHEN prev IS NULL
             |       OR epoch_us(ts) - epoch_us(prev) > 1800000000 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_sessions,
             |  count(*) AS n_events
             |FROM e GROUP BY user_id""".stripMargin),
      survey = Seq("STREAM-STATE")),

    // Explicit window frame: running order count + exact running
    // revenue per customer (frames beyond the default appear nowhere
    // else in the gated surface).
    Decl(
      "q16_running_sum",
      (s, dir) =>
        Tables(s, dir, "orders")
          .withColumn("run_n", expr(
            "count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey" +
              " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"))
          .withColumn("run_rev", expr(
            "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))" +
              " OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey" +
              " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)"))
          .select("o_custkey", "o_orderkey", "run_n", "run_rev"),
      Some("""SELECT o_custkey, o_orderkey,
             |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_rev
             |FROM orders""".stripMargin),
      survey = Seq("WINDOW-FRAME")),

    // Hierarchical subtotals (beyond the reference — no grouping sets
    // exist there, SURVEY §2.4; standard engine surface).
    Decl(
      "q15_rollup",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("cnt"),
            expr(decSum("l_extendedprice")).as("sum_base")),
      Some(s"""SELECT l_returnflag, l_linestatus, count(*) AS cnt,
              |  ${decSum("l_extendedprice")} AS sum_base
              |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin),
      survey = Seq("ROLLUP")),

    // Sequential-pattern funnel: users progressing view → click →
    // purchase in strict time order (min-timestamp chaining — three
    // keyed aggregations, no window state).
    Decl(
      "q17_funnel",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("tv"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, Seq("user_id"))
          .filter(col("ts") > col("tv"))
          .groupBy("user_id").agg(min("ts").as("tc"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, Seq("user_id"))
          .filter(col("ts") > col("tc"))
          .groupBy("user_id").agg(min("ts").as("tp"))
        v.select(lit("1_view").as("stage"), col("user_id"))
          .unionByName(c.select(lit("2_click").as("stage"), col("user_id")))
          .unionByName(p.select(lit("3_purchase").as("stage"), col("user_id")))
          .groupBy("stage").agg(count(lit(1)).as("n_users"))
      },
      Some("""WITH v AS (SELECT user_id, min(ts) AS tv FROM events
             |           WHERE event_type = 'view' GROUP BY user_id),
             |c AS (SELECT e.user_id, min(e.ts) AS tc
             |      FROM events e JOIN v ON e.user_id = v.user_id
             |      WHERE e.event_type = 'click' AND e.ts > v.tv
             |      GROUP BY e.user_id),
             |p AS (SELECT e.user_id, min(e.ts) AS tp
             |      FROM events e JOIN c ON e.user_id = c.user_id
             |      WHERE e.event_type = 'purchase' AND e.ts > c.tc
             |      GROUP BY e.user_id),
             |stages AS (
             |  SELECT '1_view' AS stage, user_id FROM v
             |  UNION ALL SELECT '2_click', user_id FROM c
             |  UNION ALL SELECT '3_purchase', user_id FROM p)
             |SELECT stage, count(*) AS n_users FROM stages GROUP BY stage""".stripMargin),
      survey = Seq("FUNNEL")),

    // As-of join: for every purchase, the latest click by the same user
    // at-or-before the purchase time. Spark lacks a native ASOF JOIN —
    // the scale-correct composition is union-tag + one windowed
    // last_value(IGNORE NULLS) pass: ONE shuffle on user_id, no
    // per-row range probe, no n² candidate join (a time-bucketed join
    // would shuffle twice and still need a residual top-1).
    Decl(
      "q18_asof_join",
      (s, dir) => {
        val t = Tables(s, dir, "events")
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("t_us"), col("event_type"))
          .withColumn("last_click", expr(
            "last_value(CASE WHEN event_type = 'click' THEN event_id END, true)" +
              " OVER (PARTITION BY user_id ORDER BY t_us," +
              " CASE WHEN event_type = 'click' THEN 0 ELSE 1 END, event_id" +
              " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"))
        t.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "t_us", "last_click")
      },
      Some("""WITH t AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS t_us, event_type,
             |    last_value(CASE WHEN event_type = 'click' THEN event_id END
             |        IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts),
             |            CASE WHEN event_type = 'click' THEN 0 ELSE 1 END,
             |            event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS last_click
             |  FROM events WHERE event_type IN ('click', 'purchase'))
             |SELECT event_id, user_id, t_us, last_click FROM t
             |WHERE event_type = 'purchase'""".stripMargin),
      survey = Seq("ASOF-JOIN")),

    // Range (interval) join: clicks by the same user in the 5 minutes
    // before each error. Spark-first shape: time-BUCKET both sides
    // (bucket width = window width, so each probe covers exactly two
    // buckets) and equi-join on (user_id, bucket) + residual range
    // filter — a pure hash join whose fan-out is bounded by bucket
    // population, never the O(|A|·|B|) interval cross product a naive
    // range predicate degenerates to at 100 TB.
    Decl(
      "q19_range_join",
      (s, dir) => {
        val W = 300000000L // 5 min in µs == bucket width
        val ev = Tables(s, dir, "events")
        val err = ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("t0"))
        val probe = err.withColumn("wk",
          explode(expr(s"array(t0 div $W - 1, t0 div $W)")))
        val clk = ev.filter(col("event_type") === "click")
          .select(col("user_id"), unix_micros(col("ts")).as("tc"))
          .withColumn("wk", expr(s"tc div $W"))
        val n = probe.join(clk, Seq("user_id", "wk"))
          .filter(col("tc") >= col("t0") - W && col("tc") < col("t0"))
          .groupBy("event_id").agg(count(lit(1)).as("n_clicks"))
        err.join(n, Seq("event_id"), "left")
          .select(col("event_id"), col("user_id"),
            coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
      },
      Some("""WITH err AS (SELECT event_id, user_id, epoch_us(ts) AS t0
             |            FROM events WHERE event_type = 'error'),
             |clk AS (SELECT user_id, epoch_us(ts) AS tc
             |        FROM events WHERE event_type = 'click')
             |SELECT e.event_id, e.user_id,
             |  CAST(count(c.tc) AS BIGINT) AS n_clicks
             |FROM err e LEFT JOIN clk c
             |  ON c.user_id = e.user_id
             | AND c.tc >= e.t0 - 300000000 AND c.tc < e.t0
             |GROUP BY e.event_id, e.user_id""".stripMargin),
      survey = Seq("RANGE-JOIN")),

    // Set intersection/difference (§2.6 beyond union): repeat customers
    // of 1995∩1996 minus anyone with a finalized order. INTERSECT binds
    // tighter than EXCEPT in standard SQL — the Spark composition
    // mirrors (A ∩ B) ∖ C explicitly. Both ops hash-aggregate to
    // distinct keys before comparing — one shuffle each, no sort.
    Decl(
      "q20_intersect_except",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val a = o.filter(expr("year(o_orderdate) = 1995")).select("o_custkey")
        val b = o.filter(expr("year(o_orderdate) = 1996")).select("o_custkey")
        val c = o.filter(col("o_orderstatus") === "F").select("o_custkey")
        a.intersect(b).except(c)
      },
      Some("""SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
             |INTERSECT
             |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
             |EXCEPT
             |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin),
      survey = Seq("SET-INTERSECT", "SET-EXCEPT")),

    // Pivot (long→wide reshape over a known value set). Spark's
    // relational pivot compiles to one aggregation with per-value
    // branches — same plan the FILTER-aggregation oracle describes; a
    // dynamic-values pivot would first collect the distinct set (one
    // extra small job), which is why the value list is declared.
    Decl(
      "q21_pivot",
      (s, dir) =>
        Tables(s, dir, "orders")
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .select(col("o_orderpriority"),
            coalesce(col("F"), lit(0L)).as("n_f"),
            coalesce(col("O"), lit(0L)).as("n_o"),
            coalesce(col("P"), lit(0L)).as("n_p")),
      Some("""SELECT o_orderpriority,
             |  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
             |  CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
             |  CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
             |FROM orders GROUP BY o_orderpriority""".stripMargin),
      survey = Seq("PIVOT")),

    // lag + ntile window coverage: per-customer inter-order gap in days
    // and order-recency quartile — one shuffle on the partition key,
    // both functions evaluated in the same Window operator.
    Decl(
      "q22_ntile_lag",
      (s, dir) =>
        Tables(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            // o_orderdate is TIMESTAMP_NTZ; session tz is UTC, so the
            // cast reads the naive value as UTC — exactly DuckDB's
            // epoch_us on a naive timestamp.
            expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("t"))
          .withColumn("prev_t", expr(
            "lag(t, 1) OVER (PARTITION BY o_custkey ORDER BY t, o_orderkey)"))
          .withColumn("gap_days", expr("(t - prev_t) div 86400000000"))
          .withColumn("quartile", expr(
            "CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY t, o_orderkey) AS BIGINT)"))
          .select("o_custkey", "o_orderkey", "gap_days", "quartile"),
      Some("""SELECT o_custkey, o_orderkey,
             |  (epoch_us(o_orderdate) - lag(epoch_us(o_orderdate), 1)
             |     OVER (PARTITION BY o_custkey
             |           ORDER BY epoch_us(o_orderdate), o_orderkey))
             |    // 86400000000 AS gap_days,
             |  ntile(4) OVER (PARTITION BY o_custkey
             |    ORDER BY epoch_us(o_orderdate), o_orderkey) AS quartile
             |FROM orders""".stripMargin),
      survey = Seq("WINDOW-LAG", "WINDOW-NTILE")),

    // Exact per-group median WITHOUT an engine median() (whose
    // interpolation rules differ across engines): row_number to the
    // one/two middle positions, average them. Integer position math
    // (div) is engine-portable; the value average touches ≤2 doubles.
    //
    // Scale adjudication (review r19, queries slice): the window
    // partitions by o_orderpriority (~5 groups), so at 100 TB five
    // tasks each sort a fifth of the table — inherent to EXACT
    // order statistics over a near-unique value column (o_totalprice):
    // px36's agg-first rewrite doesn't apply because the per-(group,
    // value) aggregation barely shrinks a near-unique column, and the
    // window sort pays the same bytes again. Spark's window sort
    // spills, so it completes; the 100 TB production shapes are
    // percentile_approx (one pass, mergeable sketch) or a two-pass
    // count/binary-search when the answer must be exact — kept out of
    // the gated query because approx results are engine-specific and
    // the gate exists to pin exact cross-engine arithmetic.
    Decl(
      "q23_group_median",
      (s, dir) =>
        Tables(s, dir, "orders")
          .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
          .withColumn("rn", expr(
            "row_number() OVER (PARTITION BY o_orderpriority" +
              " ORDER BY o_totalprice, o_orderkey)"))
          .withColumn("n", expr(
            "count(*) OVER (PARTITION BY o_orderpriority)"))
          .filter(expr("rn = (n + 1) div 2 OR rn = (n + 2) div 2"))
          .groupBy("o_orderpriority")
          .agg(expr("round(avg(o_totalprice), 6)").as("median_price"),
            expr("CAST(max(n) AS BIGINT)").as("n")),
      Some("""SELECT o_orderpriority, round(avg(o_totalprice), 6) AS median_price,
             |  CAST(max(n) AS BIGINT) AS n
             |FROM (SELECT o_orderpriority, o_totalprice,
             |        row_number() OVER (PARTITION BY o_orderpriority
             |          ORDER BY o_totalprice, o_orderkey) AS rn,
             |        count(*) OVER (PARTITION BY o_orderpriority) AS n
             |      FROM orders) t
             |WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
             |GROUP BY o_orderpriority""".stripMargin),
      survey = Seq("MEDIAN-EXACT")),

    // Skew-salted join (builder brief: "salting for skew"): the fact
    // side carries a deterministic salt, the dimension is replicated
    // once per salt, and the join key becomes (user_id, salt) — a
    // heavy-hitter user's rows now spread across 8 reducers instead of
    // one. The oracle is the UNSALTED join: salting must be a pure
    // execution rewrite with identical results. (AQE skew-join handles
    // moderate skew automatically; explicit salting is the tool when
    // one key exceeds a single executor.)
    Decl(
      "q24_salted_join",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
          .select("event_id", "user_id", "event_type")
        val dim = ev.groupBy("user_id").agg(count(lit(1)).as("n_user"))
        // pmod, not %: Spark's % takes the dividend's sign, so a
        // negative event_id would salt to a negative bucket that
        // matches NO dimx row and silently drops the event from the
        // inner join (review r14; the fixture's ids happen to be
        // non-negative, which is exactly why the gate couldn't see it)
        val salted = ev.withColumn("salt", expr("CAST(pmod(event_id, 8) AS INT)"))
        val dimx = dim.crossJoin(
          broadcast(s.range(0, 8).select(col("id").cast("int").as("salt"))))
        salted.join(dimx, Seq("user_id", "salt"))
          .groupBy("event_type")
          .agg(expr("CAST(sum(n_user) AS BIGINT)").as("sum_weight"),
            count(lit(1)).as("n"))
      },
      Some("""WITH dim AS (SELECT user_id, count(*) AS n_user
             |            FROM events GROUP BY user_id)
             |SELECT event_type, CAST(sum(n_user) AS BIGINT) AS sum_weight,
             |  count(*) AS n
             |FROM events e JOIN dim USING (user_id)
             |GROUP BY event_type""".stripMargin),
      survey = Seq("SKEW-SALT")),

    // Exponential time-decay aggregation: per-user decayed value mass
    // with a 7-day half-life-style kernel anchored at the corpus max
    // timestamp — the recency-weighted feature aggregation of
    // behavioral pipelines. One broadcast of the single-row anchor,
    // one keyed aggregation; exp() noise absorbed by round-6.
    Decl(
      "q25_decay_sum",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
          .select(col("user_id"), col("value"),
            unix_micros(col("ts")).as("t"))
        val ref = ev.agg(max("t").as("tref"))
        ev.crossJoin(broadcast(ref))
          .groupBy("user_id")
          .agg(
            expr("round(sum(value * exp(-((tref - t) / 86400000000e0) / 7e0)), 6)")
              .as("decayed"),
            count(lit(1)).as("n"))
      },
      Some("""WITH ev AS (SELECT user_id, value, epoch_us(ts) AS t
             |            FROM events),
             |ref AS (SELECT max(t) AS tref FROM ev)
             |SELECT user_id,
             |  round(sum(value * exp(-((tref - t) / 86400000000e0) / 7e0)), 6)
             |    AS decayed,
             |  count(*) AS n
             |FROM ev CROSS JOIN ref GROUP BY user_id""".stripMargin),
      survey = Seq("DECAY-AGG")),

    // Time-RANGE window frame: rolling 1-hour event count/sum per user.
    // Complements q16 (ROWS frame): RANGE frames are the shape of every
    // "activity in the trailing window" feature at scale — one shuffle
    // on the partition key, frame evaluated by ordinal scan within the
    // sorted partition, never a self-join on the time predicate.
    // Deterministic: the frame is defined by the t VALUE (peers always
    // all-in under RANGE/CURRENT ROW), so ties can't reorder results.
    Decl(
      "q26_rolling_time_window",
      (s, dir) =>
        Tables(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("value"),
            unix_micros(col("ts")).as("t"))
          .withColumn("roll_n", expr(
            "count(*) OVER (PARTITION BY user_id ORDER BY t" +
              " RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"))
          .withColumn("roll_v", expr(
            "CAST(sum(CAST(value AS DECIMAL(18,2)))" +
              " OVER (PARTITION BY user_id ORDER BY t" +
              " RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE)"))
          .select("user_id", "event_id", "roll_n", "roll_v"),
      Some("""WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS t
             |            FROM events)
             |SELECT user_id, event_id,
             |  count(*) OVER (PARTITION BY user_id ORDER BY t
             |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS roll_n,
             |  CAST(sum(CAST(value AS DECIMAL(18,2)))
             |    OVER (PARTITION BY user_id ORDER BY t
             |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
             |    AS roll_v
             |FROM e""".stripMargin),
      survey = Seq("WINDOW-FRAME", "STREAM-WINDOW")),

    // CUBE grouping sets with grouping_id (q15 covers ROLLUP): all four
    // (flag, status) aggregation lattice cells in ONE pass — Catalyst
    // expands the grouping sets before the partial aggregate, so the
    // input is still read once at 100 TB.
    Decl(
      "q27_cube_grouping",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .cube("l_returnflag", "l_linestatus")
          .agg(grouping_id().cast("bigint").as("gid"),
            count(lit(1)).as("cnt"),
            expr(decSum("l_extendedprice")).as("sum_base")),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
              |  count(*) AS cnt,
              |  ${decSum("l_extendedprice")} AS sum_base
              |FROM lineitem
              |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin),
      survey = Seq("A1", "A2")),

    // JSON scalar extraction (events.props).
    Decl(
      "q14_json_extract",
      (s, dir) =>
        Tables(s, dir, "events")
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("int").as("k"))
          .groupBy("event_type")
          .agg(sum(col("k")).cast("bigint").as("sum_k"), count(lit(1)).as("n")),
      Some("""SELECT event_type,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
             |  count(*) AS n
             |FROM events GROUP BY event_type""".stripMargin),
      survey = Seq("JSON"))
  )
}
