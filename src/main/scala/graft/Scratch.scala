package graft

/** Deterministic scratch directories for the graded index-store
  * round-trips (MinHash band store, IVF-PQ code store, DSIR count
  * store).
  *
  * A fresh `createTempDirectory` per execution leaked one full store
  * copy per run: the 3-pass interleaved bench plus the correctness
  * pass re-execute each store query several times per round, so
  * copies compounded across rounds. A path fixed per (store,
  * fixture-dir, PROCESS) and written with `mode("overwrite")` bounds
  * disk to one live copy per store per JVM — each execution inside a
  * run replaces the previous one (the swap protocol the mutable-store
  * maintainers use, SCALE.md §13) — while the pid component keeps two
  * concurrent graft JVMs (a Verify started mid-bench, two CI jobs on
  * one host) from overwriting each other's in-flight reads. A
  * shutdown hook deletes the process's scratch trees on clean exit,
  * so only a crashed JVM leaves one copy behind.
  */
object Scratch {
  private val pid = ProcessHandle.current().pid()
  private val created =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[java.io.File, java.lang.Boolean]())
  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach(f => delete(f))
    }))
  }
  private def delete(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(delete)
    f.delete(); ()
  }

  /** Full md5 hex of the fixture path — not `String.hashCode`: two
    * distinct fixture dirs must never alias to one scratch dir (a
    * 32-bit hash collides across the fixture paths a long-lived CI
    * host accumulates; an md5 collision does not happen by
    * accident). */
  private def pathDigest(sfDir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(sfDir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
  }

  def dir(store: String, sfDir: String): String = {
    hook
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-$store-${pathDigest(sfDir)}-$pid")
    created.add(f)
    f.getAbsolutePath
  }
}
