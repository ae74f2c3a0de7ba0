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
    * absent after the purge pass (deleted by this run OR already gone) —
    * an audit number that reconciles against the INPUT key count, not a
    * measure of work done. A run over 100% bogus keys reports them all
    * "gone"; callers that need the work split use [[purgeStats]].
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
    val (deleted, alreadyAbsent) = purgeStats(keys, rootDir, batchSize)
    deleted + alreadyAbsent
  }

  /** [[purge]] with the audit split: (deleted-by-this-pass,
    * absent-without-a-delete). The second class costs one extra
    * `exists()` RPC per key on object stores — only keys whose delete
    * returned false pay it, so a purge over mostly-present keys pays
    * ~nothing. Note the split itself is NOT retry-stable (a retried
    * task re-classifies its dead attempt's deletions as already-absent);
    * the retry-stable audit number is the SUM, which is what [[purge]]
    * returns.
    */
  def purgeStats(keys: Dataset[String], rootDir: String,
      batchSize: Int = 1000): (Long, Long) = {
    val spark = keys.sparkSession
    val hconf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val deleted = spark.sparkContext.longAccumulator("purged")
    val absent = spark.sparkContext.longAccumulator("already_absent")
    val root = rootDir.stripSuffix("/")
    keys.foreachPartition { (iter: Iterator[String]) =>
      val fs = new Path(root).getFileSystem(hconf.value)
      // per-path deletes: the Hadoop FileSystem API has no bulk
      // DeleteObjects; batchSize is kept in the signature as the knob a
      // bulk-capable store client would consume, but there is no dead
      // grouped() indirection pretending otherwise (review finding)
      iter.foreach { key =>
        val p = new Path(s"$root/$key")
        if (fs.delete(p, false)) deleted.add(1L)
        else if (!fs.exists(p)) absent.add(1L)
      }
    }
    (deleted.value, absent.value)
  }
}
