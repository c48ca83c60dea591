package graft.operators

import java.nio.file.{Files, Path}

/** Scratch directories for the driver-checked store keys.
  *
  * Every persisted-artifact key (`bm25_store`, `ann_ivf_store`,
  * `dedup_incr_store`, `sketch_hll_store`, `cs_build`, `cs_catchup`)
  * materializes its store under a fresh temp directory per invocation —
  * the right semantics for a per-rep build benchmark, but each rep,
  * plan audit, and Verify run used to leak a full store copy in /tmp.
  * All call sites now allocate through [[scratch]], which registers the
  * directory for recursive deletion in ONE JVM shutdown hook.
  *
  * Deletion is deliberately end-of-JVM, not end-of-query: the returned
  * DataFrames read the store lazily, so the artifact must outlive every
  * later `.collect()` on the same plan (bench reps re-collect).
  */
object Scratch {

  private val live = java.util.Collections.synchronizedList(
    new java.util.ArrayList[Path]())

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      live.forEach(p => deleteRecursively(p))
    }, "graft-scratch-cleanup"))
  }

  /** A fresh temp directory, cleaned up recursively at JVM exit. */
  def scratch(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    live.add(p)
    p
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val children = Files.list(p)
      try children.forEach(c => deleteRecursively(c))
      finally children.close()
    }
    try Files.deleteIfExists(p)
    catch { case _: java.io.IOException => () } // best effort at exit
  }
}
