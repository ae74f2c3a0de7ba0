package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Dataset
import org.apache.spark.util.SerializableConfiguration

/** Batched object deletion keyed off record ids (reference
  * ThumbnailPurge.scala:9-38 + S3FileHelper.scala:46-55).
  *
  * The reference `collect()`s EVERY id to the driver and deletes from there
  * (ThumbnailPurge.scala:20 — unbounded driver memory at 40M+ records). The
  * engine replaces that with `foreachPartition` deletes running on the
  * executors (SURVEY.md §2.F5 fix): driver traffic drops to one count, and
  * deletion parallelism scales with the cluster. The 1000-key batch idiom is
  * kept (S3 DeleteObjects API limit; harmless batching elsewhere).
  */
object KeyPurge {

  /** id → `c0/c1/c2/c3/id.jpg` thumbnail key (ThumbnailPurge.scala:31-33);
    * ids shorter than 4 chars yield None (reference would throw).
    */
  def thumbnailKey(id: String): Option[String] =
    if (id == null || id.length < 4) None
    else Some(s"${id(0)}/${id(1)}/${id(2)}/${id(3)}/$id.jpg")

  /** Delete `rootDir/<key>` for every key; returns the number of keys
    * absent after the purge pass (deleted by this run OR already gone).
    *
    * Counting only `delete() == true` undercounts under task retry: a
    * task that deletes some keys and then dies has its accumulator
    * updates DISCARDED (Spark only folds in updates from successful
    * tasks), and the retry's delete returns false for the already-gone
    * paths — so those deletions vanish from the total. "Gone after the
    * attempt" is retry-stable: the retry counts the same keys the failed
    * attempt removed, and the audit number reconciles against the input
    * key count regardless of how many attempts it took.
    */
  def purge(keys: Dataset[String], rootDir: String, batchSize: Int = 1000): Long = {
    val spark = keys.sparkSession
    val hconf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val deleted = spark.sparkContext.longAccumulator("purged")
    val root = rootDir.stripSuffix("/")
    keys.foreachPartition { (iter: Iterator[String]) =>
      val fs = new Path(root).getFileSystem(hconf.value)
      // per-path deletes: the Hadoop FileSystem API has no bulk
      // DeleteObjects; batchSize is kept in the signature as the knob a
      // bulk-capable store client would consume, but there is no dead
      // grouped() indirection pretending otherwise (review finding)
      iter.foreach { key =>
        val p = new Path(s"$root/$key")
        if (fs.delete(p, false) || !fs.exists(p)) deleted.add(1L)
      }
    }
    deleted.value
  }
}
