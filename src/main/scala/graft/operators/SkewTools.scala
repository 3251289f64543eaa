package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's skew-join handling covers sort-
  * merge joins at runtime; these cover the two cases it does not:
  * skewed AGGREGATION keys, and skewed join keys when the build side
  * must be replicated deterministically.
  */
object SkewTools {

  /** Two-phase (salted) aggregation for SUM-MERGEABLE aggregates —
    * sum() and count() (counts merge by summing partial counts).
    * Aggregates whose merge is not a sum (min/max/avg/countDistinct)
    * do NOT belong here: the merge phase sums the partials and would
    * silently produce wrong results. Partials first fold within
    * (key, salt) — spreading one hot key over `salts` reducers —
    * then merge.
    *
    * The salt is a deterministic hash of stable row identity columns
    * (`saltBy`), not rand(): retries and speculative tasks must land
    * rows on the same salt or partials double-count.
    *
    * The output key column keeps the input column's name.
    */
  def saltedAgg(df: DataFrame, key: Column, salts: Int,
                saltBy: Seq[Column], aggs: (String, Column)*): DataFrame = {
    require(aggs.nonEmpty, "saltedAgg needs at least one aggregate")
    val keyName = df.select(key).columns.head
    val salted = df.withColumn("__salt",
      pmod(hash(saltBy: _*), lit(salts)))
    val partial = salted
      .groupBy(key.as(keyName), col("__salt"))
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
    partial
      .groupBy(col(keyName))
      .agg(sum(col(aggs.head._1)).as(aggs.head._1),
        aggs.tail.map { case (n, _) => sum(col(n)).as(n) }: _*)
  }

  /** Skew-proof last-writer-wins: the latest version per key as a
    * MERGEABLE max-of-struct aggregate instead of a row_number
    * window. The window form (q_lww_snapshot) must colocate ALL of a
    * key's versions in one reducer task — a key holding 10% of a
    * changelog makes that task a straggler no matter how many
    * executors exist. max(struct(orderBy..., payload...)) merges
    * associatively, so partial aggregation pre-reduces every map
    * task's versions of the hot key to ONE row before the shuffle:
    * the hot key contributes at most one record per map task to the
    * exchange, and no reducer ever sees a version pileup.
    * (AQE's skew handling covers sort-merge JOINS only — a skewed
    * window has no runtime rescue, which is why the aggregate form
    * is the 100 TB changelog shape.)
    *
    * `orderBy` must order versions totally WITHIN a key (e.g. ts +
    * unique event id, or a sequence number): on an orderBy tie the
    * comparison would fall through to payload fields, which is
    * exactly the arbitrary tie-break a correct changelog never needs.
    * Output columns: key, then `payload` in caller order (payload may
    * repeat orderBy columns; struct fields are deduplicated).
    */
  def lwwLatest(df: DataFrame, key: String, orderBy: Seq[String],
                payload: Seq[String]): DataFrame = {
    require(orderBy.nonEmpty, "lwwLatest needs version-ordering columns")
    val fields = (orderBy ++ payload.filterNot(orderBy.contains)).distinct
    df.groupBy(col(key))
      .agg(max(struct(fields.map(col): _*)).as("__lww"))
      .select(col(key) +: payload.map(c => col(s"__lww.$c").as(c)): _*)
  }

  /** Salted join for a skewed left side against a small-ish right
    * side that is still too big to broadcast: the left adds a
    * deterministic salt in [0, salts), the right is replicated once
    * per salt value, and the join key becomes (key, salt) — one hot
    * key's rows spread over `salts` partitions instead of one.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int, leftSaltBy: Seq[Column]): DataFrame = {
    val l = left.withColumn("__salt", pmod(hash(leftSaltBy: _*), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
