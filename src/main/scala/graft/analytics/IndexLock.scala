package graft.analytics

import org.apache.spark.sql.SparkSession

/** Single-writer contract for the persisted indexes ([[PqIndex]],
  * [[SearchIndex]], [[DedupIndex]], [[BloomIndex]]).
  *
  * Why: every index mutation is MULTI-FILE (codes + centroids, postings +
  * df + stats, bands + shingles, bloom.bin + shingles), and two writers
  * interleaving those writes can leave a silently-torn index — e.g. two
  * racing [[BloomIndex.append]]s both read the same base `bloom.bin`, each
  * ORs in only its own delta, and the second write DROPS the first's bits
  * while both shingle appends land: the filter now under-screens with no
  * error anywhere. Real ingest pipelines retry, so the race is not
  * hypothetical; the contract is that a concurrent mutation FAILS LOUDLY
  * instead of corrupting.
  *
  * Mechanism: an atomic create of `<dir>/_lock` (POSIX O_CREAT|O_EXCL via
  * NIO for local/file: paths; Hadoop `create(p, overwrite=false)` — atomic
  * on HDFS — otherwise). The loser of a race gets
  * [[IndexLock.ConcurrentWriterException]] naming the current holder and
  * the index is untouched. The lock is released in a `finally`, so a body
  * that throws cannot leak it; a lock orphaned by a CRASHED JVM must be
  * removed by the operator (the exception message carries owner + acquire
  * time so staleness is diagnosable). On object stores without atomic
  * create-if-absent, swap `acquire` for the store's conditional-put
  * primitive; the index code is unchanged.
  *
  * Readers never take the lock: every layout is either append-only parquet
  * parts merged on read or a single file swapped whole, so a reader
  * concurrent with one (serialized) writer sees a consistent pre- or
  * post-state.
  */
object IndexLock {

  val LockFile = "_lock"

  final class ConcurrentWriterException(dir: String, holder: String)
    extends RuntimeException(
      s"index at $dir has a concurrent writer (lock held by $holder); " +
        s"writes are single-writer — retry after it finishes, or remove " +
        s"$dir/$LockFile if the holder crashed")

  private def isLocal(dir: String): Boolean =
    !dir.contains(":/") || dir.startsWith("file:")

  private def localPath(dir: String): java.nio.file.Path =
    java.nio.file.Paths.get(
      if (dir.startsWith("file:")) new java.net.URI(dir).getPath else dir)

  /** Acquire or throw [[ConcurrentWriterException]]. Never blocks. */
  def acquire(spark: SparkSession, dir: String): Unit = {
    val owner = s"pid=${ProcessHandle.current().pid()} " +
      s"thread=${Thread.currentThread().getName} " +
      s"at=${java.time.Instant.ofEpochMilli(System.currentTimeMillis())}"
    if (isLocal(dir)) {
      val p = localPath(dir)
      java.nio.file.Files.createDirectories(p)
      val lock = p.resolve(LockFile)
      try {
        java.nio.file.Files.write(lock, owner.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        ()
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val holder = try new String(
            java.nio.file.Files.readAllBytes(lock), "UTF-8")
          catch { case _: Exception => "<unreadable>" }
          throw new ConcurrentWriterException(dir, holder)
      }
    } else {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$LockFile")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = try fs.create(p, false) catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
             _: java.io.IOException =>
          throw new ConcurrentWriterException(dir, "<remote holder>")
      }
      try out.write(owner.getBytes("UTF-8")) finally out.close()
    }
  }

  def release(spark: SparkSession, dir: String): Unit =
    if (isLocal(dir)) {
      java.nio.file.Files.deleteIfExists(localPath(dir).resolve(LockFile)): Unit
    } else {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$LockFile")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, false): Unit
    }

  /** Run `body` holding the index write lock; release on any exit. */
  def withLock[T](spark: SparkSession, dir: String)(body: => T): T = {
    acquire(spark, dir)
    try body finally release(spark, dir)
  }
}
