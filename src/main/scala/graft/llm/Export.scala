package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Training-data EXPORT: the last step of a curation pipeline — shard the
  * corpus deterministically, write JSONL part files, and publish the
  * release manifest the training job (and the dataset card) consumes.
  * Sharding is an md5-derived function of the document id (the same
  * engine-portable-draw policy as every sampler in this layer), NOT
  * Spark's task partitioning: re-running the export on any cluster size,
  * or any engine, lands every document in the same shard, which is what
  * makes shard-level resume / diff / decontam-patching possible at
  * 100 TB.
  */
object Export {

  /** Deterministic shard id in [0, nShards): md5-uniform over the doc id. */
  def shardId(id: Column, nShards: Int): Column =
    pmod(conv(substring(md5(concat(lit("shard#"), id.cast("string"))),
      1, 15), 16, 10).cast(LongType), lit(nShards.toLong))

  /** Manifest of a sharded export WITHOUT writing (the dry-run/audit
    * form): one keyed aggregation to O(shards) rows —
    * (shard, n_docs, n_tokens, n_chars, min_id, max_id). */
  def shardManifest(df: DataFrame, idCol: String, textCol: String,
                    nShards: Int): DataFrame =
    df.select(col(idCol).as("__id"), col(textCol).as("__t"),
        shardId(col(idCol), nShards).as("shard"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextStats.tokenCount(col("__t")).cast(LongType)).as("n_tokens"),
        sum(length(col("__t")).cast(LongType)).as("n_chars"),
        min(col("__id")).as("min_id"), max(col("__id")).as("max_id"))

  /** Write `df` as `nShards` JSONL shard directories
    * (`outDir/shard=K/part-*.json`) and return the manifest. The write is
    * ONE shuffle keyed on the shard id (partitionBy routes rows to their
    * shard directory); the manifest is the [[shardManifest]] aggregation
    * over the same frame. At scale each shard streams through its
    * writers — no driver materialization, no per-doc files. */
  def exportJsonlShards(df: DataFrame, idCol: String, textCol: String,
                        outDir: String, nShards: Int): DataFrame = {
    val sharded = df.withColumn("shard", shardId(col(idCol), nShards))
    sharded.repartition(nShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").json(outDir)
    shardManifest(df, idCol, textCol, nShards)
  }
}
