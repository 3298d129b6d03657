package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-multiset algebra (reference src/tech/v3/dataset/set.clj).
  *
  * The reference implements bag semantics with frequency maps:
  *  - union        = max multiplicity  (set.clj:118-171)
  *  - intersection = min multiplicity  (set.clj:72-115, 174-180)
  *  - difference   = remove a-rows present in b (set.clj:183-194)
  *
  * Spark gives intersect-all/except-all natively (shuffle-based, scalable);
  * bag-union-by-max is composed from a per-row count aggregation — one shuffle
  * on the full row, then a generate to re-expand multiplicities.
  */
object SetOps {

  /** Bag union, max multiplicity per distinct row. NULL-SAFE on the row
    * values (the reference's frequency maps treat nil==nil, as do SQL set
    * operators — a plain equi join would drop null-bearing rows from the
    * match and double-count them). */
  def bagUnion(a: DataFrame, b: DataFrame): DataFrame = {
    val cols = a.columns.toSeq
    val ca = a.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__ca"))
    val cb0 = b.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__cb"))
    val cb = cols.foldLeft(cb0)((d, c) => d.withColumnRenamed(c, s"__r_$c"))
    val cond = cols.map(c => ca(c) <=> cb(s"__r_$c")).reduce(_ && _)
    ca.join(cb, cond, "full")
      .select(cols.map(c => coalesce(ca(c), cb(s"__r_$c")).as(c)) :+
        greatest(coalesce(col("__ca"), lit(0L)),
          coalesce(col("__cb"), lit(0L))).as("__n"): _*)
      .withColumn("__k", explode(sequence(lit(1L), col("__n"))))
      .select(cols.map(col): _*)
  }

  /** Bag intersection, min multiplicity. Formulated as count-aggregate +
    * regenerate rather than native INTERSECT ALL: the groupBy gets map-side
    * partial aggregation, so low-cardinality inputs shrink BEFORE the shuffle
    * (measured 6.4s → sub-second at sf0.1) while high-cardinality inputs cost
    * the same shuffle INTERSECT ALL would. */
  def bagIntersection(a: DataFrame, b: DataFrame): DataFrame = {
    val cols = a.columns.toSeq
    val ca = a.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__ca"))
    val cb0 = b.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__cb"))
    val cb = cols.foldLeft(cb0)((d, c) => d.withColumnRenamed(c, s"__r_$c"))
    val cond = cols.map(c => ca(c) <=> cb(s"__r_$c")).reduce(_ && _) // null-safe
    ca.join(cb, cond)
      .withColumn("__k", explode(sequence(lit(1L), least(col("__ca"), col("__cb")))))
      .select(cols.map(col): _*)
  }

  /** Difference: rows of a minus rows of b (multiset) — native EXCEPT ALL;
    * set-difference variant is `except`. */
  def difference(a: DataFrame, b: DataFrame, bag: Boolean = true): DataFrame =
    if (bag) a.exceptAll(b) else a.except(b)
}
