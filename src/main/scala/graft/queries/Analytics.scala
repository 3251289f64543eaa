package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Analytics beyond the reference's surface (SURVEY §2.6 gaps — all
  * native Spark): joins (broadcast / shuffle / semi / anti / outer),
  * GROUP BY + ROLLUP/CUBE, ORDER BY/LIMIT, top-k per group, window
  * functions, set ops, event-time windowing and sessionization.
  *
  * Scale notes (100 TB thinking):
  *  - Dimension joins (region/nation/supplier) are broadcast — no
  *    shuffle of the fact table.
  *  - Fact-fact joins shuffle on the join key only after filters and
  *    projections are pushed to the scan.
  *  - All sums go through DECIMAL for exact, order-independent
  *    aggregation (see Q.scala); partial aggregation (map-side
  *    combine) stays enabled.
  */
object Analytics {

  private val dec  = DecimalType(18, 2)
  private val dec6 = DecimalType(18, 6)

  val all: Map[String, Q] = Map(

    // ---- joins ------------------------------------------------------------
    // customer ⋈ nation ⋈ region: both dims broadcast; one shuffle for the
    // final group-by only.
    // Final CAST(… AS DOUBLE) on decimal sums throughout this file pins
    // the output type: Spark widens sum(DECIMAL(18,2)) to DECIMAL(28,2),
    // DuckDB to DECIMAL(38,2) — value-identical but hash-mismatched in
    // the driver compare without the cast. The sum itself still folds
    // exactly in decimal; only the final value is converted.
    "q_join_bcast_dims" -> Q(
      """SELECT r_name, n_name, count(*) AS n_cust,
                CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name
         ORDER BY r_name, n_name""") { (s, d) =>
      t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
             sum(col("c_acctbal").cast(dec)).cast("double").as("sum_bal"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // fact ⋈ fact on the natural key; revenue folded exactly in decimal.
    "q_join_fact" -> Q(
      """SELECT o_orderpriority,
                count(*) AS n_lines,
                sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""") { (s, d) =>
      val rev = col("l_extendedprice").cast(dec) *
        (lit(1).cast(DecimalType(4, 2)) - col("l_discount").cast(DecimalType(4, 2)))
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"), sum(rev).as("revenue"))
        .orderBy(col("o_orderpriority"))
    },

    "q_join_semi" -> Q(
      """SELECT c_custkey FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""") { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey")).orderBy(col("c_custkey"))
    },

    // customers with no HIGH-VALUE order: the build-side filter makes
    // the result non-empty at every SF (a plain customers-without-
    // orders anti-join is vacuously 0 rows on this data — a 0-row
    // hash match proves nothing about the join)
    "q_join_anti" -> Q(
      """SELECT c_custkey FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
         ORDER BY c_custkey""") { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 400000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey")).orderBy(col("c_custkey"))
    },

    "q_join_outer" -> Q(
      """SELECT c_custkey, count(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON o_custkey = c_custkey
         GROUP BY c_custkey ORDER BY c_custkey""") { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    },

    // ---- group by / rollup / cube ----------------------------------------
    // TPC-H Q1 shape: the flagship aggregation.
    "q_groupby_q1" -> Q(
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
                count(*) AS count_order
         FROM lineitem
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""") { (s, d) =>
      val qty   = col("l_quantity").cast(dec)
      val price = col("l_extendedprice").cast(dec)
      val disc  = lit(1).cast(DecimalType(4, 2)) - col("l_discount").cast(DecimalType(4, 2))
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(qty).cast("double").as("sum_qty"),
          sum(price).cast("double").as("sum_base"),
          sum(price * disc).cast("double").as("sum_disc_price"),
          (sum(qty).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(price).cast("double") / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    "q_rollup" -> Q(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
         FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""") { (s, d) =>
      t(s, d, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    },

    "q_cube" -> Q(
      """SELECT l_returnflag, l_linestatus, count(*) AS n
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""") { (s, d) =>
      t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // ---- HAVING ------------------------------------------------------------
    "q_having" -> Q(
      """SELECT o_custkey, count(*) AS n
         FROM orders GROUP BY o_custkey HAVING count(*) >= 15
         ORDER BY o_custkey""") { (s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 15)
        .orderBy(col("o_custkey"))
    },

    // ---- GROUPING SETS -----------------------------------------------------
    "q_grouping_sets" -> Q(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""") { (s, d) =>
      // unique view name: clobbering a view named "orders" would leak
      // stale-session state into anything else resolving that name
      t(s, d, "orders").createOrReplaceTempView("graft_gs_orders")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n
           FROM graft_gs_orders
           GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
           ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")
    },

    // ---- JSON extraction ---------------------------------------------------
    "q_json_funcs" -> Q(
      """SELECT event_type,
                CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      t(s, d, "events")
        .groupBy(col("event_type"))
        .agg(
          sum(get_json_object(col("props"), "$.k").cast("bigint")).cast("bigint").as("sum_k"),
          max(get_json_object(col("props"), "$.k").cast("bigint")).as("max_k"))
        .orderBy(col("event_type"))
    },

    // ---- order by / limit / top-k ----------------------------------------
    "q_orderby_limit" -> Q(
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""") { (s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(10)
    },

    "q_topk_per_group" -> Q(
      """SELECT o_orderstatus, o_orderkey, o_totalprice FROM (
           SELECT o_orderstatus, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_orderstatus
                                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3
         ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey""") { (s, d) =>
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderstatus"), col("o_totalprice").desc, col("o_orderkey"))
    },

    // ---- custom aggregate: heap-based top-k per group ---------------------
    // Same result contract as q_topk_per_group but computed with the
    // graft.functions.TopKStruct TypedImperativeAggregate: bounded
    // per-partition heaps merged associatively instead of a full
    // per-key window sort — at scale this ships k rows per partition
    // per group, not every row through a sort. Oracle: the
    // row_number formulation.
    "q_topk_agg" -> Q(
      """SELECT o_orderstatus, o_orderkey, o_totalprice FROM (
           SELECT o_orderstatus, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_orderstatus
                                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3
         ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey""") { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      t(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(expr(
          "topk_struct(struct(-o_totalprice AS s1, o_orderkey AS s2), 3)")
          .as("top"))
        .select(col("o_orderstatus"), explode(col("top")).as("r"))
        .select(col("o_orderstatus"), col("r.s2").as("o_orderkey"),
          // double negation is bit-exact: the price rides only once
          (-col("r.s1")).as("o_totalprice"))
        .orderBy(col("o_orderstatus"), col("o_totalprice").desc, col("o_orderkey"))
    },

    // ---- distinct / set ops ----------------------------------------------
    "q_distinct" -> Q(
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
         ORDER BY o_orderstatus, o_orderpriority""") { (s, d) =>
      t(s, d, "orders").select(col("o_orderstatus"), col("o_orderpriority"))
        .distinct().orderBy(col("o_orderstatus"), col("o_orderpriority"))
    },

    "q_setop_intersect" -> Q(
      """SELECT c_nationkey AS nk FROM customer
         INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk""") { (s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy(col("nk"))
    },

    // nations with customers but no NEGATIVE-balance supplier: the
    // subtrahend filter makes the difference non-empty at every SF
    // (all 25 nations appear on both unfiltered sides — a 0-row hash
    // match proves nothing about EXCEPT)
    "q_setop_except" -> Q(
      """SELECT c_nationkey AS nk FROM customer
         EXCEPT SELECT s_nationkey FROM supplier WHERE s_acctbal < 0
         ORDER BY nk""") { (s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .except(t(s, d, "supplier").filter(col("s_acctbal") < 0)
          .select(col("s_nationkey").as("nk")))
        .orderBy(col("nk"))
    },

    "q_union_all" -> Q(
      """SELECT nk, count(*) AS n FROM (
           SELECT c_nationkey AS nk FROM customer
           UNION ALL SELECT s_nationkey AS nk FROM supplier)
         GROUP BY nk ORDER BY nk""") { (s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .unionByName(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .groupBy(col("nk")).agg(count(lit(1)).as("n"))
        .orderBy(col("nk"))
    },

    // ---- window functions -------------------------------------------------
    "q_window_rank" -> Q(
      """SELECT p_brand, p_partkey, p_retailprice, rnk FROM (
           SELECT p_brand, p_partkey, p_retailprice,
                  row_number() OVER (PARTITION BY p_brand
                                     ORDER BY p_retailprice DESC, p_partkey) AS rnk
           FROM part) WHERE rnk <= 5
         ORDER BY p_brand, rnk""") { (s, d) =>
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      t(s, d, "part")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"), col("rnk"))
        .orderBy(col("p_brand"), col("rnk"))
    },

    // running (cumulative) sum — exact via decimal accumulation.
    "q_window_running" -> Q(
      """SELECT o_custkey, o_orderkey,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
         FROM orders
         ORDER BY o_custkey, o_orderkey""") { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast(dec)).over(w).cast("double").as("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // ---- event-time RANGE window (trailing 1 hour per user) ---------------
    // The time-based frame the rows-frame family can't express: each
    // event's trailing-hour activity (sum + count) per user — RANGE
    // BETWEEN over event time in MICROSECONDS (epoch µs on both
    // engines, so sub-second components land in the same frame;
    // seconds would silently shift frame edges). Decimal sums keep
    // the double output bit-identical regardless of in-frame order,
    // and RANGE semantics make timestamp ties peer-inclusive —
    // deterministic under any tie order.
    //
    // 100 TB shape: one shuffle by user_id, then a sorted
    // sliding-frame pass per partition — identical cost class to the
    // rows-frame window; no self-join range explosion (the naive
    // events×events ts-bracket join this replaces is O(rows ×
    // in-horizon rows)).
    "q_window_time_range" -> Q(
      """SELECT event_id, user_id,
                CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS hour_sum,
                CAST(count(*) OVER w AS BIGINT) AS hour_n
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""") { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-3600000000L, Window.currentRow)
      t(s, d, "events")
        .selectExpr("event_id", "user_id",
          "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us", "value")
        .select(col("event_id"), col("user_id"),
          sum(col("value").cast(dec6)).over(w).cast("double").as("hour_sum"),
          count(lit(1)).over(w).cast("bigint").as("hour_n"))
        .orderBy(col("event_id"))
    },

    "q_window_lag" -> Q(
      """SELECT o_custkey, o_orderkey,
                CAST(CAST(o_totalprice AS DECIMAL(18,2)) -
                lag(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS delta_prev
         FROM orders ORDER BY o_custkey, o_orderkey""") { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val p = col("o_totalprice").cast(dec)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          (p - lag(p, 1).over(w)).cast("double").as("delta_prev"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // ---- distribution windows: quartiles + percentile position ------------
    // ntile/percent_rank per priority class — the window pair behind
    // per-group percentile bucketing. The ORDER BY is made TOTAL with
    // the pk tie-break, so rank (and thus percent_rank's (r-1)/(n-1)
    // integer division, bit-identical across engines) is deterministic
    // and no rounding is needed.
    "q_window_ntile" -> Q(
      """SELECT o_orderkey, o_orderpriority,
                ntile(4) OVER w AS quartile,
                percent_rank() OVER w AS pr
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
         ORDER BY o_orderkey""") { (s, d) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).cast("bigint").as("quartile"),
          percent_rank().over(w).as("pr"))
        .orderBy(col("o_orderkey"))
    },

    // ---- scale-safe percentile bucketing (q_window_ntile's 100 TB twin) ----
    // q_window_ntile partitions its window by o_orderpriority — 5
    // distinct values, so parallelism caps at 5 and each partition is
    // a full n/5-row sort: the canonical skewed-window scale-killer.
    // The scale form is bucket-by-boundary: ONE exact-percentile
    // aggregate computes the per-group quartile boundaries (output =
    // |groups| rows), broadcast joins them back, and bucket assignment
    // is a map-side comparison — no per-row window, no giant sort,
    // parallelism follows the scan. Ties get the same bucket (value
    // semantics), which is the honest difference from ntile's
    // arbitrary rank-split of equal values. Boundary doubles come
    // from the same (n-1)*p linear interpolation in both engines and
    // only feed > comparisons, never the output; the two engines MAY
    // order the interpolation's FP ops differently, so a data value
    // landing within 1 ulp of a boundary could in principle flip a
    // bucket — unreachable with 2-decimal TPC-H prices (boundaries
    // are exact midpoints of cent values), but data-dependent, not
    // guaranteed. Exact percentile buffers per-group value counts —
    // fine while per-group distinct values stay executor-sized; past
    // that, approx_percentile swaps into the SAME bucketing shape
    // (only the aggregate changes — see q_ntile_bucketed_approx).
    "q_ntile_bucketed" -> Q(
      """WITH b AS (SELECT o_orderpriority,
                           quantile_cont(o_totalprice, 0.25) AS b1,
                           quantile_cont(o_totalprice, 0.50) AS b2,
                           quantile_cont(o_totalprice, 0.75) AS b3
                    FROM orders GROUP BY 1)
         SELECT o.o_orderkey, o.o_orderpriority,
                CAST(1 + CAST(o.o_totalprice > b.b1 AS INT)
                       + CAST(o.o_totalprice > b.b2 AS INT)
                       + CAST(o.o_totalprice > b.b3 AS INT) AS BIGINT) AS quartile
         FROM orders o JOIN b USING (o_orderpriority)
         ORDER BY o.o_orderkey""") { (s, d) =>
      val bounds = t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(expr("percentile(o_totalprice, array(0.25D, 0.50D, 0.75D))").as("bs"))
        .select(col("o_orderpriority"),
          col("bs")(0).as("b1"), col("bs")(1).as("b2"), col("bs")(2).as("b3"))
      t(s, d, "orders")
        .join(broadcast(bounds), Seq("o_orderpriority"))
        .select(col("o_orderkey"), col("o_orderpriority"),
          (lit(1) + (col("o_totalprice") > col("b1")).cast("int")
                  + (col("o_totalprice") > col("b2")).cast("int")
                  + (col("o_totalprice") > col("b3")).cast("int")).cast("bigint").as("quartile"))
        .orderBy(col("o_orderkey"))
    },

    // ---- q_ntile_bucketed with sketch boundaries, share-gated --------------
    // Same bucket-by-boundary shape, but the ONE aggregate that
    // computes quartile boundaries is approx_percentile — bounded
    // mergeable sketch state instead of a per-group value buffer, so
    // the boundary pass survives groups with billions of distinct
    // values. Each boundary's true rank is within n/accuracy of the
    // target (sketch contract), so each quartile's row share can miss
    // 0.25 by at most ~2*eps plus boundary-tie and discretization
    // effects; the gate asserts every (group, quartile) share within
    // 2*eps + 8/n and emits 0/1 verdicts, oracled against literal 1s.
    // Boundary assignment stays a broadcast-join map-side comparison;
    // the gate is one more partial-aggregated count — the whole plan,
    // gate included, is the 100 TB form.
    "q_ntile_bucketed_approx" -> Q(
      """SELECT DISTINCT o_orderpriority, CAST(r.range + 1 AS BIGINT) AS quartile,
                CAST(1 AS INT) AS share_ok
         FROM orders CROSS JOIN range(4) r ORDER BY o_orderpriority, quartile""") { (s, d) =>
      val acc = 1000
      val eps = 1.0 / acc
      val bounds = t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(expr(s"approx_percentile(o_totalprice, array(0.25D, 0.50D, 0.75D), $acc)").as("bs"))
        .select(col("o_orderpriority"),
          col("bs")(0).as("b1"), col("bs")(1).as("b2"), col("bs")(2).as("b3"))
      t(s, d, "orders")
        .join(broadcast(bounds), Seq("o_orderpriority"))
        .select(col("o_orderpriority"),
          (lit(1) + (col("o_totalprice") > col("b1")).cast("int")
                  + (col("o_totalprice") > col("b2")).cast("int")
                  + (col("o_totalprice") > col("b3")).cast("int")).cast("bigint").as("quartile"))
        .groupBy(col("o_orderpriority"), col("quartile"))
        .agg(count(lit(1)).as("nb"))
        .withColumn("n", sum(col("nb")).over(Window.partitionBy(col("o_orderpriority"))))
        .select(col("o_orderpriority"), col("quartile"),
          (abs(col("nb") / col("n") - lit(0.25)) <= lit(2 * eps) + lit(8.0) / col("n"))
            .cast("int").as("share_ok"))
        .orderBy(col("o_orderpriority"), col("quartile"))
    },

    // ---- scalar expression surface ----------------------------------------
    "q_case_expr" -> Q(
      """SELECT CASE WHEN o_totalprice < 100000.0 THEN 'low'
                     WHEN o_totalprice < 300000.0 THEN 'mid'
                     ELSE 'high' END AS bucket,
                count(*) AS n,
                sum(CAST(o_totalprice AS DECIMAL(18,2))) AS sum_price
         FROM orders GROUP BY 1 ORDER BY bucket""") { (s, d) =>
      val bucket = when(col("o_totalprice") < 100000.0, "low")
        .when(col("o_totalprice") < 300000.0, "mid")
        .otherwise("high").as("bucket")
      t(s, d, "orders")
        .groupBy(bucket)
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice").cast(dec)).as("sum_price"))
        .orderBy(col("bucket"))
    },

    "q_string_funcs" -> Q(
      """SELECT c_custkey, upper(c_name) AS name_u, CAST(length(c_name) AS INT) AS name_len,
                substr(c_name, 1, 8) AS name_pre, concat(c_mktsegment, '#', c_name) AS tagged
         FROM customer ORDER BY c_custkey""") { (s, d) =>
      t(s, d, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("name_u"),
        length(col("c_name")).cast("int").as("name_len"),
        substring(col("c_name"), 1, 8).as("name_pre"),
        concat(col("c_mktsegment"), lit("#"), col("c_name")).as("tagged"))
        .orderBy(col("c_custkey"))
    },

    "q_date_funcs" -> Q(
      """SELECT CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
                count(*) AS n
         FROM orders GROUP BY 1, 2 ORDER BY y, m""") { (s, d) =>
      t(s, d, "orders")
        .groupBy(year(col("o_orderdate")).cast("int").as("y"),
                 month(col("o_orderdate")).cast("int").as("m"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("y"), col("m"))
    },

    // ---- as-of join (graft.operators.AsOfJoin; DuckDB oracle uses its
    // native ASOF JOIN) — each purchase matched to the user's most
    // recent signup at or before it.
    "q_asof_join" -> Q(
      """SELECT p.event_id, p.user_id,
                strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
                strftime(s.ts, '%Y-%m-%d %H:%M:%S.%f') AS signup_ts
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
           ON p.user_id = s.user_id AND p.ts >= s.ts
         ORDER BY p.event_id""") { (s, d) =>
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"))
      graft.operators.AsOfJoin.asOf(purchases, signups, "user_id", "ts", "signup_raw")
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
          date_format(col("signup_raw"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("signup_ts"))
        .orderBy(col("event_id"))
    },

    // ---- forward as-of join (next-event attribution) ----------------------
    // The mirror direction pandas merge_asof calls 'forward': for each
    // view, the user's NEXT purchase (smallest purchase ts >= view
    // ts) — time-to-conversion analysis. Same merge-scan plan as
    // q_asof_join over the descending order; DuckDB expresses it as
    // ASOF with the <= inequality.
    "q_asof_forward" -> Q(
      """SELECT v.event_id, v.user_id,
                strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
                strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS next_purchase_ts
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') v
         ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
           ON v.user_id = p.user_id AND v.ts <= p.ts
         ORDER BY v.event_id""") { (s, d) =>
      val ev = t(s, d, "events")
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"))
      graft.operators.AsOfJoin
        .asOf(views, purchases, "user_id", "ts", "next_raw", forward = true)
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("view_ts"),
          date_format(col("next_raw"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("next_purchase_ts"))
        .orderBy(col("event_id"))
    },

    // ---- as-of join with tolerance (bounded-staleness match) ---------------
    // pandas merge_asof's `tolerance`: the as-of match only counts if
    // it is RECENT enough (signup within 7 days of the purchase) —
    // attribution windows, staleness bounds. The tolerance is a pure
    // map-side post-filter on the identical merge-scan plan (zero
    // extra exchanges); both engines compare the SAME epoch-ms
    // difference of exact integers.
    "q_asof_tolerance" -> Q(
      """SELECT p.event_id, p.user_id,
                strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
                strftime(CASE WHEN epoch_ms(p.ts) - epoch_ms(s.ts) <= 604800000
                         THEN s.ts END, '%Y-%m-%d %H:%M:%S.%f') AS recent_signup_ts
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
           ON p.user_id = s.user_id AND p.ts >= s.ts
         ORDER BY p.event_id""") { (s, d) =>
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"))
      graft.operators.AsOfJoin
        .asOf(purchases, signups, "user_id", "ts", "signup_raw",
          toleranceMs = Some(604800000L))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
          date_format(col("signup_raw"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("recent_signup_ts"))
        .orderBy(col("event_id"))
    },

    // ---- banded range join (graft.operators.RangeJoin) — price-band
    // rollup; the oracle is the plain BETWEEN join, the Spark side is
    // the bucketed equi-join that replaces the nested-loop at scale.
    "q_range_join" -> Q(
      """WITH bands AS (
           SELECT n_nationkey AS band_id,
                  n_nationkey * 12000.0 AS lo,
                  n_nationkey * 12000.0 + 23999.0 AS hi
           FROM nation)
         SELECT band_id, count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders JOIN bands ON o_totalprice BETWEEN lo AND hi
         GROUP BY band_id ORDER BY band_id""") { (s, d) =>
      val bands = t(s, d, "nation").select(
        col("n_nationkey").as("band_id"),
        (col("n_nationkey") * 12000.0).as("lo"),
        (col("n_nationkey") * 12000.0 + 23999.0).as("hi"))
      graft.operators.RangeJoin
        .pointInInterval(t(s, d, "orders"), bands, "o_totalprice", "lo", "hi", 12000.0)
        .groupBy(col("band_id"))
        .agg(count(lit(1)).as("n_orders"),
             sum(col("o_totalprice").cast(dec)).cast("double").as("sum_price"))
        .orderBy(col("band_id"))
    },

    // ---- statistics: exact-moments stddev + interpolated median ----------
    // stddev derived from exact decimal moments so both engines run the
    // same IEEE arithmetic on identical inputs (no algorithm drift).
    "q_stats" -> Q(
      """SELECT n, round(sqrt((s2 - s1 * s1 / n) / (n - 1)), 4) AS stddev_price,
                round(med, 4) AS median_price
         FROM (SELECT count(*) AS n,
                      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
                      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) *
                               CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s2,
                      quantile_cont(o_totalprice, 0.5) AS med
               FROM orders)""") { (s, d) =>
      val p = col("o_totalprice").cast(dec)
      t(s, d, "orders")
        .agg(count(lit(1)).as("n"),
             sum(p).cast("double").as("s1"),
             sum(p * p).cast("double").as("s2"),
             expr("percentile(o_totalprice, 0.5)").as("med"))
        .select(col("n"),
          round(sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)), 4)
            .as("stddev_price"),
          round(col("med"), 4).as("median_price"))
    },

    // ---- pivot: categories to columns --------------------------------------
    "q_pivot" -> Q(
      """SELECT user_id,
                count(*) FILTER (event_type = 'click') AS n_click,
                count(*) FILTER (event_type = 'error') AS n_error,
                count(*) FILTER (event_type = 'purchase') AS n_purchase,
                count(*) FILTER (event_type = 'signup') AS n_signup,
                count(*) FILTER (event_type = 'view') AS n_view
         FROM events GROUP BY user_id ORDER BY user_id""") { (s, d) =>
      t(s, d, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("user_id"), col("click").as("n_click"), col("error").as("n_error"),
          col("purchase").as("n_purchase"), col("signup").as("n_signup"),
          col("view").as("n_view"))
        .orderBy(col("user_id"))
    },

    // ---- per-group interpolated quantiles ----------------------------------
    // exact percentile buffers per-group value counts (see the
    // q_ntile_bucketed note) — approx_percentile is the drop-in once
    // per-group distinct values outgrow executor memory
    "q_quantile_group" -> Q(
      """SELECT event_type,
                round(quantile_cont(value, 0.25), 6) AS p25,
                round(quantile_cont(value, 0.5), 6) AS p50,
                round(quantile_cont(value, 0.95), 6) AS p95
         FROM events GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      t(s, d, "events")
        .groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.25)"), 6).as("p25"),
             round(expr("percentile(value, 0.5)"), 6).as("p50"),
             round(expr("percentile(value, 0.95)"), 6).as("p95"))
        .orderBy(col("event_type"))
    },

    // ---- the 100 TB form: sketch quantiles, rank-gated ---------------------
    // Exact `percentile` holds every per-group value in aggregation
    // state — the first OOM at 100 TB. `approx_percentile` keeps a
    // bounded mergeable sketch (QuantileSummaries, Greenwald-Khanna
    // style) with a published RANK guarantee: the returned value's
    // true rank is within n/accuracy of the target rank, and partials
    // combine map-side like any other aggregate.
    //
    // The gate holds the sketch to exactly that contract WITHOUT ever
    // buffering values: a second partial-aggregable pass counts rows
    // <= and >= the sketch's answer per group, which brackets the
    // answer's true rank interval [n-ge+1, le]; the query asserts that
    // interval intersects [(p-eps)*n, (p+eps)*n] (+2 ranks of slack
    // for the open/closed and (n-1)-vs-n conventions). Output is the
    // group plus 0/1 verdicts, oracled against literal 1s — a broken
    // sketch registration flips a verdict and hash-fails the round.
    // Every operator in the plan (sketch agg, conditional-sum agg,
    // broadcast of |groups| sketch rows) is map-side combinable: this
    // declared query IS the scale form, gate included.
    "q_quantile_group_approx" -> Q(
      """SELECT event_type,
                CAST(1 AS INT) AS p25_ok, CAST(1 AS INT) AS p50_ok, CAST(1 AS INT) AS p95_ok
         FROM events GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      val acc = 1000
      val eps = 1.0 / acc
      val ps  = Seq(0.25, 0.50, 0.95)
      val approx = t(s, d, "events")
        .groupBy(col("event_type"))
        .agg(expr(s"approx_percentile(value, array(${ps.map(_.toString + "D").mkString(", ")}), $acc)").as("ap"))
      val withAp = t(s, d, "events").join(broadcast(approx), Seq("event_type"))
      val rankAggs = ps.indices.flatMap { i =>
        Seq(sum((col("value") <= col("ap")(i)).cast("long")).as(s"le$i"),
            sum((col("value") >= col("ap")(i)).cast("long")).as(s"ge$i"))
      }
      val counted = withAp.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), rankAggs: _*)
      val oks = ps.zipWithIndex.map { case (p, i) =>
        val loRank = col("n") - col(s"ge$i") + lit(1)
        val hiRank = col(s"le$i")
        ((loRank <= col("n") * (p + eps) + lit(2)) &&
         (hiRank >= col("n") * (p - eps) - lit(2)))
          .cast("int").as(s"p${(p * 100).toInt}_ok")
      }
      counted.select(col("event_type") +: oks: _*).orderBy(col("event_type"))
    },

    // ---- ordered string aggregation ----------------------------------------
    "q_string_agg" -> Q(
      """SELECT n_regionkey AS rk,
                string_agg(n_name, ',' ORDER BY n_name) AS members
         FROM nation GROUP BY 1 ORDER BY rk""") { (s, d) =>
      t(s, d, "nation")
        .groupBy(col("n_regionkey").as("rk"))
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("members"))
        .orderBy(col("rk"))
    },
    "q_event_window" -> Q(
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
                event_type, count(*) AS n,
                CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""") { (s, d) =>
      t(s, d, "events")
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value").cast(dec6)).cast("double").as("sum_value"))
        .orderBy(col("win_start"), col("event_type"))
    },

    // ---- ordered funnel: view -> click -> purchase ---------------------------
    // Per-user first-occurrence timestamps via conditional min (one
    // partial-aggregated shuffle keyed by user), then ordering
    // constraints as NULL-safe comparisons and one global count —
    // the classic funnel without self-joins, so no per-stage pass
    // over the events table.
    "q_funnel" -> Q(
      """WITH f AS (
           SELECT user_id,
                  min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                  min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                  min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
           FROM events GROUP BY user_id)
         SELECT count(*) AS n_view,
                count(CASE WHEN t_click > t_view THEN 1 END) AS n_click,
                count(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END) AS n_purchase
         FROM f WHERE t_view IS NOT NULL""") { (s, d) =>
      t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("t_view"),
          min(when(col("event_type") === "click", col("ts"))).as("t_click"),
          min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
        .filter(col("t_view").isNotNull)
        .agg(
          count(lit(1)).as("n_view"),
          count(when(col("t_click") > col("t_view"), 1)).as("n_click"),
          count(when(col("t_purchase") > col("t_click") &&
            col("t_click") > col("t_view"), 1)).as("n_purchase"))
    },

    // ---- day-over-day retention ----------------------------------------------
    // Distinct active (user, day) pairs self-joined one day forward:
    // the join keys are (user_id, day+1) = (user_id, day), a plain
    // hash-partitioned equi-join on pairs already deduped to at most
    // |users|x|days| rows — never the raw event stream.
    "q_retention" -> Q(
      """WITH days AS (
           SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events)
         SELECT strftime(a.day, '%Y-%m-%d') AS day, count(*) AS active,
                count(b.user_id) AS retained
         FROM days a LEFT JOIN days b
           ON a.user_id = b.user_id AND b.day = a.day + 1
         GROUP BY a.day ORDER BY day""") { (s, d) =>
      val days = t(s, d, "events")
        .select(col("user_id"), to_date(date_trunc("day", col("ts"))).as("day"))
        .distinct()
      days.as("a").join(days.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("b.day") === date_add(col("a.day"), 1), "left")
        .groupBy(col("a.day"))
        .agg(count(lit(1)).as("active"), count(col("b.user_id")).as("retained"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("active"), col("retained"))
        .orderBy(col("day"))
    },

    // sessionization: 30-minute inactivity gap, per user.
    "q_sessionize" -> Q(
      """SELECT user_id, count(*) AS n_events, CAST(sum(new_sess) AS BIGINT) AS n_sessions FROM (
           SELECT user_id,
                  CASE WHEN prev_ts IS NULL
                            OR date_diff('microsecond', prev_ts, ts) > 1800000000
                       THEN 1 ELSE 0 END AS new_sess
           FROM (SELECT user_id, ts,
                        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                 FROM events))
         GROUP BY user_id ORDER BY user_id""") { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
               expr("timestampdiff(MICROSECOND, prev_ts, ts)") > 1800000000L, 1)
            .otherwise(0))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("new_sess")).as("n_sessions"))
        .orderBy(col("user_id"))
    },

    // ---- Z-order layout codes (multi-dimensional data clustering) -----------
    // The lakehouse OPTIMIZE ZORDER primitive: each event's (user,
    // hour) pair min/max-normalizes to two 16-bit fields and
    // bit-interleaves into a 32-bit Morton code; files laid out by
    // code ranges then serve BOTH user-range and time-range
    // predicates from ~2^(-k/2) of the files (top 6 code bits
    // alternate 3 user + 3 hour bits → a 1/8-of-range box on EITHER
    // dimension touches ≤ 16 of the 64 buckets — ZOrderSpec measures
    // exactly this). All integer arithmetic, so the code table
    // hash-matches. Scale shape: min/max are footer-cheap stats, the
    // code is map-only, and the physical write is
    // repartitionByRange(zcode).sortWithinPartitions — ONE range
    // exchange, the same plan OPTIMIZE runs.
    "q_zorder" -> Q(
      s"""WITH b AS (SELECT min(user_id) AS u0, max(user_id) AS u1,
                     min(CAST(floor(epoch(ts)) AS BIGINT) // 3600) AS h0,
                     max(CAST(floor(epoch(ts)) AS BIGINT) // 3600) AS h1 FROM events),
         sc AS (SELECT event_id,
                  CAST((user_id - b.u0) * 65536 // (b.u1 - b.u0 + 1) AS BIGINT) AS zx,
                  CAST((CAST(floor(epoch(ts)) AS BIGINT) // 3600 - b.h0) * 65536
                       // (b.h1 - b.h0 + 1) AS BIGINT) AS zt
                FROM events CROSS JOIN b),
         z AS (SELECT event_id, zx, zt,
                 CAST(${mortonDuck("zx", "zt")} AS BIGINT) AS zcode FROM sc)
         SELECT event_id, zx, zt, zcode, CAST(zcode >> 26 AS BIGINT) AS zbucket
         FROM z ORDER BY event_id""") { (s, d) =>
      val hourExpr = "CAST(unix_timestamp(ts) AS BIGINT) DIV 3600"
      // stats over STORED columns only (user_id, ts) — parquet
      // aggregate pushdown can serve these from footers; the hour
      // bounds derive in the driver because hour is monotonic in ts
      val b = t(s, d, "events").agg(
        min(col("user_id")), max(col("user_id")), min(col("ts")), max(col("ts"))).head()
      val (u0, u1) = (b.getLong(0), b.getLong(1))
      // the footer-aware events loader may surface ts as TIMESTAMP
      // (Instant/Timestamp) or TIMESTAMP_NTZ (LocalDateTime, wall
      // time in the UTC session zone) — same instant either way
      def hourOf(i: Int): Long = {
        val secs = b.get(i) match {
          case t: java.sql.Timestamp => Math.floorDiv(t.getTime, 1000L)
          case l: java.time.LocalDateTime => l.toEpochSecond(java.time.ZoneOffset.UTC)
          case t: java.time.Instant => t.getEpochSecond
          case other => throw new IllegalStateException(
            s"unexpected ts stat type ${other.getClass}")
        }
        Math.floorDiv(secs, 3600L)
      }
      val (h0, h1) = (hourOf(2), hourOf(3))
      t(s, d, "events")
        .selectExpr("event_id",
          s"CAST((user_id - ${u0}L) * 65536 DIV ${u1 - u0 + 1}L AS BIGINT) AS zx",
          s"CAST(($hourExpr - ${h0}L) * 65536 DIV ${h1 - h0 + 1}L AS BIGINT) AS zt")
        .selectExpr("event_id", "zx", "zt",
          s"CAST(${mortonSpark("zx", "zt")} AS BIGINT) AS zcode")
        .selectExpr("event_id", "zx", "zt", "zcode",
          "CAST(shiftright(zcode, 26) AS BIGINT) AS zbucket")
        .orderBy(col("event_id"))
    }
  )

  /** Morton bit-interleave of two 16-bit fields — x takes even bit
    * positions, y odd — written as pure shift/mask/add arithmetic.
    * Two renderings of the SAME formula: Spark's shiftleft/shiftright
    * functions and DuckDB's <</>> operators (fully parenthesized, so
    * engine precedence cannot differ).
    */
  private def mortonSpark(x: String, y: String): String =
    (0 until 16).map(i =>
      s"shiftleft((shiftright($x, $i) & 1), ${2 * i}) + " +
        s"shiftleft((shiftright($y, $i) & 1), ${2 * i + 1})").mkString("(", " + ", ")")

  private def mortonDuck(x: String, y: String): String =
    (0 until 16).map(i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})")
      .mkString("(", " + ", ")")
}
