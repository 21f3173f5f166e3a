package graft

import java.nio.file.{Files, Path}

/** Temp directories for session-lifetime derived artifacts (q103's
  * bucketed layout, q52's stored IVF index): created under the system
  * temp dir, deleted recursively when the JVM exits. Without the hook
  * every Bench/Verify/test JVM on a long-lived shared VM leaves behind a
  * projected table copy per run. */
object TempArtifacts {

  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach { p => deleteRecursively(p.toFile) }
    }, "graft-temp-artifacts-cleanup"))
  }

  /** The library's one recursive delete (scratch zones, probe dirs,
    * artifact dirs all funnel here). */
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** A fresh artifact dir; registered for recursive delete at JVM exit. */
  def dir(prefix: String): String = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }
}
