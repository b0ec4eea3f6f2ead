package graft.util

import java.nio.file.{Files, Path, Paths}
import java.sql.{DriverManager, SQLException}

/** Scratch-directory lifecycle for queries that stage real substrates
  * (embedded Derby databases, binlog wire directories) under /tmp.
  *
  * Each staging query creates a fresh per-invocation directory — concurrent
  * query constructions (parallel test suites, interleaved bench reps) must
  * never contend on one database or directory — so nothing here reuses or
  * reclaims a dir that might still back an unread lazy DataFrame. Instead
  * every dir registers with one JVM shutdown hook that (a) shuts the whole
  * embedded Derby engine down, releasing every booted database's page cache
  * and file handles (Derby otherwise keeps each database open for the JVM
  * lifetime), and (b) deletes the registered trees, so a full bench+test
  * session leaves /tmp net-clean.
  */
object Scratch {

  private val dirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val hooked = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Point derby.system.home at a temp dir once per JVM (before the engine
    * first boots) so derby.log never lands in the working directory. */
  def ensureDerbyHome(): Unit =
    if (System.getProperty("derby.system.home") == null) {
      val home = "/tmp/graft_derby_home"
      Files.createDirectories(Paths.get(home))
      System.setProperty("derby.system.home", home)
    }

  /** A fresh temp dir registered for shutdown-time cleanup. */
  def dir(prefix: String): String = {
    val d = Files.createTempDirectory(prefix).toString
    dirs.add(d)
    if (hooked.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() => cleanup(), "graft-scratch-cleanup"))
    d
  }

  private[graft] def cleanup(): Unit = {
    // engine-wide shutdown: XJ015 ("Derby system shutdown") IS the success
    // signal; a no-Derby-loaded session throws nothing we care about
    try { DriverManager.getConnection("jdbc:derby:;shutdown=true"); () }
    catch {
      case e: SQLException if e.getSQLState == "XJ015" => ()
      case _: Throwable => ()
    }
    dirs.forEach(d => delete(Paths.get(d)))
    dirs.clear()
  }

  private def delete(root: Path): Unit =
    if (Files.exists(root)) {
      val stream = Files.walk(root)
      try
        stream.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => try Files.deleteIfExists(p) catch { case _: Throwable => () })
      finally stream.close()
    }
}
