package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Domain-mixture resampling for training-data pipelines: hit a target
  * mixture over a domain column (source, language, quality bucket) by
  * down-sampling some domains and up-sampling ("multiple epochs") others —
  * the Pile/DoReMi-style domain-weights step, expressed as pure columnar
  * filtering + row replication.
  *
  * Rates are basis points of one epoch (10000 = keep exactly once,
  * 2500 = keep 25%, 15000 = one full copy plus a 50% chance of a second).
  * The fractional keep decision is an md5-derived uniform over the row's key
  * columns — a pure function of the data, so results are reproducible on any
  * cluster size/engine (oracle-checkable), and a given row's keep decision
  * never changes when the corpus around it changes.
  *
  * Scale: no shuffle at all — the filter and the `explode(sequence(...))`
  * replication are map-side; downstream shuffles operate on the resampled
  * (smaller or replicated) stream.
  */
object DomainMix {

  /** md5-derived uniform in [0, 10000) over the key columns. */
  private def uBp(keyCols: Seq[Column]): Column =
    pmod(conv(substring(md5(concat_ws("#", keyCols: _*)), 1, 15), 16, 10)
      .cast(LongType), lit(10000L))

  /** Resample to a target domain mixture. `rateBp` maps domain value →
    * basis points (see object doc); unlisted domains use `defaultBp`.
    * Output rows carry `copy_id` (0-based epoch index) — rows with zero
    * copies are dropped. */
  def sampleByDomain(df: DataFrame, domainCol: Column,
                     rateBp: Map[String, Int], defaultBp: Int,
                     keyCols: Seq[Column]): DataFrame = {
    require(defaultBp >= 0 && rateBp.values.forall(_ >= 0),
      "rates must be non-negative basis points")
    // full epochs and the fractional remainder are split driver-side so the
    // runtime arithmetic (and its oracle mirror) is two integer CASE chains
    val full = rateBp.toSeq.sortBy(_._1).foldLeft(lit(defaultBp / 10000)) {
      case (acc, (k, v)) => when(domainCol === k, v / 10000).otherwise(acc)
    }
    val frac = rateBp.toSeq.sortBy(_._1).foldLeft(lit(defaultBp % 10000)) {
      case (acc, (k, v)) => when(domainCol === k, v % 10000).otherwise(acc)
    }
    val copies = (full + when(uBp(keyCols) < frac, 1).otherwise(0)).cast(LongType)
    df.withColumn("n_copies", copies)
      .filter(col("n_copies") > 0)
      .withColumn("copy_id", explode(sequence(lit(0L), col("n_copies") - 1)))
      .drop("n_copies")
  }
}
