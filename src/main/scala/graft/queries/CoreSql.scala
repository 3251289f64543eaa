package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2.1–2.4 parity surface, re-expressed over the driver's
  * TPC-H-ish tables: scans (point / range / full), every WHERE
  * comparison op, AND/OR nesting, and the five reference aggregates
  * (COUNT/SUM/AVG/MIN/MAX) including the reference's empty-set→0 and
  * AVG = SUM/COUNT(*) semantics (SURVEY §4.3; reference
  * SQLLayer/query_executor.cpp:226-263).
  *
  * The last-writer-wins multi-layer merge (SURVEY §2.4 C4,
  * reference includes/range_query_executor.hpp:38-179) — the HTAP
  * engine's central operator — appears here as a window dedup over
  * the `events` changelog.
  */
object CoreSql {

  private val dec = DecimalType(18, 2)

  val all: Map[String, Q] = Map(

    // ---- scans (C1/C2/C3) -------------------------------------------------
    "q_full_scan" -> Q(
      "SELECT r_regionkey, r_name FROM region") { (s, d) =>
      t(s, d, "region").select(col("r_regionkey"), col("r_name"))
    },

    "q_projection" -> Q(
      "SELECT c_custkey, c_name, c_acctbal FROM customer") { (s, d) =>
      t(s, d, "customer").select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    },

    // point lookup: reference detects `pk = lit` and routes to the
    // bloom-filtered LSM get (storage_engine.hpp:385-425); in Spark the
    // same predicate reaches the parquet scan as a pushed filter.
    "q_point_lookup" -> Q(
      "SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer WHERE c_custkey = 42") { (s, d) =>
      t(s, d, "customer")
        .filter(col("c_custkey") === 42)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_acctbal"))
    },

    "q_range_scan" -> Q(
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 400000.0") { (s, d) =>
      t(s, d, "orders")
        .filter(col("o_totalprice") > 400000.0)
        .select(col("o_orderkey"), col("o_totalprice"))
    },

    // ---- WHERE comparison ops (P1) ---------------------------------------
    "q_pred_eq" -> Q(
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_returnflag = 'R'") { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    },

    "q_pred_ne" -> Q(
      "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus != 'F'") { (s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderstatus") =!= "F")
        .select(col("o_orderkey"), col("o_orderstatus"))
    },

    "q_pred_lt" -> Q(
      "SELECT count(*) AS n FROM lineitem WHERE l_quantity < 25.0") { (s, d) =>
      t(s, d, "lineitem").filter(col("l_quantity") < 25.0)
        .agg(count(lit(1)).as("n"))
    },

    "q_pred_le" -> Q(
      "SELECT count(*) AS n FROM lineitem WHERE l_quantity <= 25.0") { (s, d) =>
      t(s, d, "lineitem").filter(col("l_quantity") <= 25.0)
        .agg(count(lit(1)).as("n"))
    },

    "q_pred_gt" -> Q(
      "SELECT count(*) AS n FROM lineitem WHERE l_extendedprice > 30000.0") { (s, d) =>
      t(s, d, "lineitem").filter(col("l_extendedprice") > 30000.0)
        .agg(count(lit(1)).as("n"))
    },

    "q_pred_ge" -> Q(
      "SELECT count(*) AS n FROM lineitem WHERE l_quantity >= 49.0") { (s, d) =>
      t(s, d, "lineitem").filter(col("l_quantity") >= 49.0)
        .agg(count(lit(1)).as("n"))
    },

    "q_pred_ts" -> Q(
      "SELECT count(*) AS n FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'") { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz"))
        .agg(count(lit(1)).as("n"))
    },

    // ---- AND / OR nesting (P2) -------------------------------------------
    "q_pred_and" -> Q(
      "SELECT count(*) AS n FROM lineitem WHERE l_returnflag = 'A' AND l_quantity > 30.0") { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_returnflag") === "A" && col("l_quantity") > 30.0)
        .agg(count(lit(1)).as("n"))
    },

    "q_pred_or" -> Q(
      "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING' OR c_acctbal < 0.0") { (s, d) =>
      t(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING" || col("c_acctbal") < 0.0)
        .select(col("c_custkey"))
    },

    "q_pred_nested" -> Q(
      """SELECT count(*) AS n FROM orders
         WHERE (o_orderstatus = 'F' AND o_totalprice > 200000.0)
            OR (o_orderstatus = 'O' AND o_totalprice < 50000.0)""") { (s, d) =>
      t(s, d, "orders")
        .filter((col("o_orderstatus") === "F" && col("o_totalprice") > 200000.0) ||
                (col("o_orderstatus") === "O" && col("o_totalprice") < 50000.0))
        .agg(count(lit(1)).as("n"))
    },

    // ---- aggregates (A1–A4) ----------------------------------------------
    "q_agg_count" -> Q(
      "SELECT count(*) AS n FROM lineitem") { (s, d) =>
      t(s, d, "lineitem").agg(count(lit(1)).as("n"))
    },

    "q_agg_count_col" -> Q(
      "SELECT count(l_quantity) AS n FROM lineitem") { (s, d) =>
      t(s, d, "lineitem").agg(count(col("l_quantity")).as("n"))
    },

    "q_agg_sum" -> Q(
      "SELECT sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_price FROM lineitem") { (s, d) =>
      t(s, d, "lineitem")
        .agg(sum(col("l_extendedprice").cast(dec)).as("sum_price"))
    },

    // reference AVG = SUM / COUNT(*) (query_executor.cpp:256-258) — on the
    // driver's clean data this coincides with SQL AVG; we mirror the ref
    // formula and derive the double from exact decimal + exact count.
    "q_agg_avg" -> Q(
      """SELECT CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
         FROM lineitem""") { (s, d) =>
      t(s, d, "lineitem")
        .agg((sum(col("l_quantity").cast(dec)).cast("double") / count(lit(1))).as("avg_qty"))
    },

    "q_agg_min_max" -> Q(
      """SELECT min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
                min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
         FROM lineitem""") { (s, d) =>
      t(s, d, "lineitem").agg(
        min(col("l_quantity")).as("min_qty"), max(col("l_quantity")).as("max_qty"),
        min(col("l_extendedprice")).as("min_price"), max(col("l_extendedprice")).as("max_price"))
    },

    "q_agg_minmax_str" -> Q(
      "SELECT min(o_orderpriority) AS min_prio, max(o_orderpriority) AS max_prio FROM orders") { (s, d) =>
      t(s, d, "orders").agg(
        min(col("o_orderpriority")).as("min_prio"),
        max(col("o_orderpriority")).as("max_prio"))
    },

    // reference empty-set quirk: SUM/MIN/MAX/AVG of zero rows return 0,
    // not NULL (query_executor.cpp:256-263) — reproduced via coalesce.
    // Final CAST to DOUBLE pins the output type on both sides: Spark's
    // sum(DECIMAL(18,2)) widens to DECIMAL(28,2) while DuckDB's widens
    // to DECIMAL(38,2) — value-identical but hash-mismatched without it.
    "q_agg_empty_zero" -> Q(
      """SELECT CAST(coalesce(sum(CAST(l_quantity AS DECIMAL(18,2))), 0) AS DOUBLE) AS sum_qty,
                count(*) AS n
         FROM lineitem WHERE l_quantity < 0.0""") { (s, d) =>
      t(s, d, "lineitem").filter(col("l_quantity") < 0.0).agg(
        coalesce(sum(col("l_quantity").cast(dec)), lit(0).cast(dec)).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
    },

    // BASELINE.md bench shape 3: filtered SUM.
    "q_agg_filtered" -> Q(
      """SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders WHERE o_orderstatus = 'O'""") { (s, d) =>
      t(s, d, "orders").filter(col("o_orderstatus") === "O")
        .agg(sum(col("o_totalprice").cast(dec)).cast("double").as("sum_price"))
    },

    "q_agg_count_distinct" -> Q(
      "SELECT count(DISTINCT l_partkey) AS n_parts FROM lineitem") { (s, d) =>
      t(s, d, "lineitem").agg(countDistinct(col("l_partkey")).as("n_parts"))
    },

    // approximate distinct (HyperLogLog++) — the sketch itself is
    // engine-specific, but its ERROR CONTRACT is not: with the default
    // rsd = 0.05 the estimate's relative error is ~N(0, rsd), so a
    // 3-sigma band (15%) around the exact count catches any broken
    // sketch registration while never flapping on a healthy one. The
    // query emits the exact count plus a 0/1 verdict and hash-matches
    // a DuckDB oracle asserting literal 1 — this used to be the one
    // rows-only query with no ground-truth gate at all. Both
    // aggregates are partial (HLL registers and count-distinct expand
    // both combine map-side); at 100 TB you drop the exact branch and
    // keep the sketch — the gate exists to pin the sketch to truth at
    // test scale. FunctionsSpec repeats the gate at all three SFs.
    "q_agg_approx_distinct" -> Q(
      """SELECT count(DISTINCT l_partkey) AS n_exact, CAST(1 AS INT) AS hll_ok
         FROM lineitem""") { (s, d) =>
      t(s, d, "lineitem")
        .agg(countDistinct(col("l_partkey")).as("n_exact"),
             approx_count_distinct(col("l_partkey")).as("ap"))
        .select(col("n_exact"),
          (abs(col("ap").cast("double") / col("n_exact") - lit(1.0)) <= lit(0.15))
            .cast("int").as("hll_ok"))
    },

    // ---- last-writer-wins merge (C4) — the HTAP snapshot operator --------
    // Treat `events` as a changelog keyed by user_id: the newest event
    // (ts, then event_id as the deterministic tiebreak ≈ sequence number)
    // wins — exactly the reference's seq-resolved multi-layer merge.
    "q_lww_snapshot" -> Q(
      """SELECT user_id, event_id, event_type, value FROM (
           SELECT user_id, event_id, event_type, value,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) WHERE rn = 1""") { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      t(s, d, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
    },

    // Skew-proof twin of q_lww_snapshot: same rows, but the latest
    // version per key is a MERGEABLE max-of-struct aggregate
    // (SkewTools.lwwLatest) instead of a per-key window. Partial
    // aggregation pre-reduces a hot key map-side — one record per map
    // task reaches the shuffle — where the window form must pile every
    // version of the key into a single reducer. The oracle is the
    // window-form SQL: both forms must resolve the identical snapshot.
    "q_lww_agg" -> Q(
      """SELECT user_id, event_id, event_type, value FROM (
           SELECT user_id, event_id, event_type, value,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) WHERE rn = 1""") { (s, d) =>
      graft.operators.SkewTools.lwwLatest(t(s, d, "events"),
        "user_id", Seq("ts", "event_id"), Seq("event_id", "event_type", "value"))
    },

    // Tombstone-aware variant: 'error' events act as deletes — a key whose
    // latest version is a tombstone disappears from the snapshot
    // (reference range_query_executor.hpp:122-129 drops tombstones last).
    "q_lww_tombstone" -> Q(
      """SELECT user_id, event_id, event_type FROM (
           SELECT user_id, event_id, event_type,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) WHERE rn = 1 AND event_type != 'error'""") { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      t(s, d, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("event_type") =!= "error")
        .select(col("user_id"), col("event_id"), col("event_type"))
    }
  )
}
