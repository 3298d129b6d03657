package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Bounded._

/** Reshape operators (SURVEY §2.6): melt / pivot / explode.
  *
  * Reference cites:
  *  - columnwise-concat (melt)      — src/tech/v3/dataset_api.clj:1126-1180
  *  - transpose-by-key (pivot)      — src/tech/v3/dataset_api.clj:1472-1491
  *  - unroll-column (explode)       — src/tech/v3/dataset_api.clj:1204-1296
  *  - row-mapcat (flatMap)          — src/tech/v3/dataset_api.clj:946-1023
  */
object Reshape {

  /** columnwise-concat / melt: unpivot `valueCols` into (column, value) pairs,
    * repeating the id columns. Uses the native unpivot operator (no UDF, no
    * shuffle — a Generate node that stays in whole-stage codegen). */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
           varName: String = "column", valueName: String = "value"): DataFrame =
    df.unpivot(idCols.map(col).toArray, valueCols.map(col).toArray,
      varName, valueName)

  /** transpose-by-key / pivot: values of `keyCol` become columns. `values`
    * must be supplied explicitly at scale (skips the extra distinct scan
    * Spark otherwise runs to discover the pivot domain). */
  def pivot(df: DataFrame, groupCols: Seq[String], keyCol: String,
            values: Seq[String], agg: Column): DataFrame =
    df.groupBy(groupCols.map(col): _*).pivot(keyCol, values).agg(agg)

  /** unroll-column: explode a sequence-valued column; `indexes=true` adds the
    * ordinal like the reference's `:indexes?` option. */
  def unroll(df: DataFrame, c: String, indexes: Boolean = false): DataFrame =
    if (indexes)
      df.select(df.columns.filterNot(_ == c).map(col) :+
        posexplode(col(c)).as(Seq(s"${c}_idx", c)): _*)
    else
      df.withColumn(c, explode(col(c)))

  /** row-mapcat: one row → n rows via an array-building expression + explode.
    * Declarative flatMap — stays inside codegen, unlike a closure flatMap. */
  def rowMapcat(df: DataFrame, buildArray: Column, outName: String): DataFrame =
    df.withColumn(outName, explode(buildArray))

  /** column-labeled-mapseq (reference dataset_api.clj:1183-1201): melt the
    * value columns into {:label, :value} and return DRIVER-SIDE maps — the
    * reference's quick path to a labeled scatter/timeseries plot. Collects:
    * bound the frame first (it's a plotting helper, not a pipeline stage). */
  def columnLabeledMapseq(df: DataFrame,
                          valueCols: Seq[String]): Seq[Map[String, Any]] = {
    val idCols = df.columns.filterNot(valueCols.contains).toSeq
    val melted = melt(df, idCols, valueCols, "label", "value")
    val names = melted.columns
    melted.collectBounded(1 << 22, "driver-side mapseq API contract").iterator
      .map(r => names.zip(r.toSeq).toMap).toSeq
  }

  /** extend-with-empty (reference base.clj:1091-1096). */
  def extendWithEmpty(df: DataFrame, n: Int): DataFrame = {
    val spark = df.sparkSession
    val empties = spark.range(n.toLong).select(
      df.schema.fields.map(f => lit(null).cast(f.dataType).as(f.name)): _*)
    df.unionByName(empties)
  }
}
