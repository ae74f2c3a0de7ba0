package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-shard materialization ([EXT]): write a curated corpus as N
  * deterministic shards in a deterministic pseudo-random order — the
  * last-mile step before a training job consumes the data. The "global
  * shuffle" every training pipeline needs is NOT `orderBy(rand())`
  * (non-reproducible, and a full sort): it's an md5 draw used twice —
  * mod-N for the shard, sort-key within the shard — so the exact same
  * corpus always produces byte-identical shard contents and order, on
  * any cluster size, and a resumed/re-run job sees the same stream.
  *
  * Plan shape: one hash exchange on the shard id (each shard's rows land
  * in exactly one task), an in-partition sort, and a partitionBy write —
  * exactly one file per shard directory. No global sort, no sampling
  * pass (`repartitionByRange` samples, which breaks run-to-run
  * determinism guarantees; the mod-N split trades perfectly equal shard
  * sizes for exact reproducibility — md5 uniformity keeps the imbalance
  * within ~1/sqrt(rows-per-shard)).
  */
object ShardWriter {

  /** Write `docs` under `path` as `shard=0..nShards-1` parquet dirs, one
    * file per shard, rows ordered by the md5 draw within each shard.
    * Returns the shard assignment frame (id, shard) for auditing — read
    * back FROM THE WRITTEN SHARDS, not rebuilt from `docs`' lineage: an
    * action on a lineage-derived frame would re-execute the whole
    * upstream job (curation + tokenize + packing for the training
    * pipeline), and for a non-deterministic input it could disagree with
    * the files on disk. The read-back is cheap (two pruned columns) and
    * is BY CONSTRUCTION the assignment the shards actually carry.
    */
  def writeShards(
      docs: DataFrame,
      idCol: String,
      nShards: Int,
      path: String): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    // withColumn would silently REPLACE caller columns with these names,
    // corrupting both the written shards and the returned assignment frame
    require(!docs.columns.contains("__key") && !docs.columns.contains("shard"),
      "input must not already contain __key or shard columns — rename them " +
        "before sharding (shard is the writer's partition column)")
    val key = graft.operators.Sampling.md5Draw(col(idCol), "shard ")
    val shard = graft.operators.Sampling
      .md5Mod(col(idCol), "shard ", nShards.toLong)
    docs.withColumn("__key", key)
      .withColumn("shard", shard)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__key"), col(idCol))
      .drop("__key")
      .write.partitionBy("shard").mode("overwrite").parquet(path)
    // partition-column inference reads `shard` as int; cast back to the
    // long the md5Mod expression carried so the audit schema is unchanged
    docs.sparkSession.read.parquet(path)
      .select(col(idCol), col("shard").cast("long").as("shard"))
  }
}
