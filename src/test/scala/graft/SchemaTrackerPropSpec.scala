package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SchemaTracker

/** Differential property sweep of the T5 schema catalog: random legal
  * DDL sequences — column add/modify/drop/rename/change, table
  * create/rename (incl. cross-schema)/truncate/drop/recover/FLASHBACK-
  * to-name, exchange-partition swaps, origin-default and dictionary
  * metadata — drive [[SchemaTracker]] against an independently-written
  * model, then `current`, `atVersion` (over the retained window),
  * `originDefault`, `dictionary`, `tablesOf`, `droppedTables` and
  * `droppedShape` are compared after EVERY op.
  *
  * The model keeps each key's FULL entry history and applies the
  * retention cap at query time (`takeRight(depth)`), where the
  * implementation caps at push time and re-homes capped vectors through
  * renames — the bookkeeping difference is the point: the r16 review
  * found renameTable stamping every retained entry with one version
  * (pre-rename DMLs could no longer resolve their shape), exactly the
  * class of divergence this sweep exists to catch. */
class SchemaTrackerPropSpec extends AnyFunSuite {

  private case class MInfo(version: Long, cols: Vector[String],
    defaults: Map[String, String], dicts: Map[String, Vector[String]])

  private val Schemas = Vector("app", "aux")
  private val TNames = Vector("t", "u", "w")
  private val CNames = Vector("a", "b", "c", "d")
  private val Types = Vector("INT", "STRING", "DECIMAL(10,2)")

  private def runScenario(seed: Int): Unit = {
    val rnd = new Random(seed)
    val depth = 2 + rnd.nextInt(2)
    val st = new SchemaTracker(historyDepth = depth)
    type K = (String, String)
    // model: FULL history per live key; cap applied only when reading
    val hist = scala.collection.mutable.Map.empty[K, Vector[MInfo]]
    val grave = scala.collection.mutable.Map.empty[K, MInfo]
    var mVersion = 0L
    var v = 0L
    def nextV(): Long = { v += 1 + rnd.nextInt(3); mVersion = v; v }
    val ops = scala.collection.mutable.ArrayBuffer.empty[String]

    def retained(k: K): Vector[MInfo] =
      hist.getOrElse(k, Vector.empty).takeRight(depth)
    def last(k: K): MInfo = hist(k).last
    def append(k: K, i: MInfo): Unit = hist(k) = hist.getOrElse(k, Vector.empty) :+ i
    def amend(k: K)(f: MInfo => MInfo): Unit =
      hist(k) = hist(k).init :+ f(hist(k).last)
    def nameOf(d: String): String = d.split(" ", 2)(0)
    def colsOf(k: K): Vector[String] = last(k).cols.map(nameOf)
    def liveKeys: Vector[K] = hist.keys.toVector.sorted
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.size))

    def create(): Unit = {
      val free = for (s <- Schemas; t <- TNames; if !hist.contains((s, t)))
        yield (s, t)
      if (free.isEmpty) return
      val k = pick(free)
      val cols = rnd.shuffle(CNames).take(1 + rnd.nextInt(2))
        .map(c => s"$c ${pick(Types)}").toVector
      val ver = nextV()
      ops += s"create $k v=$ver $cols"
      st.createTable(k._1, k._2, cols, ver)
      append(k, MInfo(ver, cols, Map.empty, Map.empty))
    }

    def columnOp(): Unit = {
      if (liveKeys.isEmpty) return
      val k = pick(liveKeys)
      val present = colsOf(k)
      val free = CNames.filterNot(present.contains)
      rnd.nextInt(6) match {
        case 0 if free.nonEmpty => // add (+ maybe metadata of the add)
          val c = pick(free); val d = s"$c ${pick(Types)}"
          val ver = nextV()
          ops += s"add $k $d v=$ver"
          st.addColumn(k._1, k._2, d, ver)
          append(k, last(k).copy(version = ver, cols = last(k).cols :+ d))
          if (rnd.nextBoolean()) {
            val dflt = s"'${rnd.nextInt(9)}'"
            ops += s"  default $c $dflt"
            st.setOriginDefault(k._1, k._2, c, dflt, ver)
            amend(k)(i => i.copy(defaults = i.defaults + (c -> dflt)))
          }
          if (rnd.nextBoolean()) {
            val dict = Vector("x", "y").take(1 + rnd.nextInt(2))
            ops += s"  dict $c $dict"
            st.setDictionary(k._1, k._2, c, dict, ver)
            amend(k)(i => i.copy(dicts = i.dicts + (c -> dict)))
          }
        case 1 if present.nonEmpty => // modify keeps name, new def text
          val c = pick(present); val d = s"$c ${pick(Types)}"
          val ver = nextV()
          ops += s"modify $k $c -> $d v=$ver"
          st.modifyColumn(k._1, k._2, c, d, ver)
          append(k, last(k).copy(version = ver,
            cols = last(k).cols.map(x => if (nameOf(x) == c) d else x)))
        case 2 => // drop — lenient on an absent name (version-only step)
          val c = pick(CNames)
          val ver = nextV()
          ops += s"dropCol $k $c v=$ver"
          st.dropColumn(k._1, k._2, c, ver)
          append(k, last(k).copy(version = ver,
            cols = last(k).cols.filterNot(x => nameOf(x) == c),
            defaults = last(k).defaults - c, dicts = last(k).dicts - c))
        case 3 if present.nonEmpty && free.nonEmpty => // rename re-keys metadata
          val c = pick(present); val to = pick(free)
          val ver = nextV()
          ops += s"renameCol $k $c->$to v=$ver"
          st.renameColumn(k._1, k._2, c, to, ver)
          append(k, MInfo(ver,
            last(k).cols.map(x => if (nameOf(x) == c)
              to + x.substring(c.length) else x),
            last(k).defaults.map { case (n2, d) => (if (n2 == c) to else n2, d) },
            last(k).dicts.map { case (n2, d) => (if (n2 == c) to else n2, d) }))
        case 4 if present.nonEmpty && free.nonEmpty => // change = rename+retype
          val c = pick(present); val to = pick(free)
          val d = s"$to ${pick(Types)}"
          val ver = nextV()
          ops += s"changeCol $k $c -> $d v=$ver"
          st.changeColumn(k._1, k._2, c, d, ver)
          append(k, MInfo(ver,
            last(k).cols.map(x => if (nameOf(x) == c) d else x),
            last(k).defaults.map { case (n2, dd) => (if (n2 == c) to else n2, dd) },
            last(k).dicts.map { case (n2, dd) => (if (n2 == c) to else n2, dd) }))
        case _ => ()
      }
    }

    def tableOp(): Unit = {
      if (liveKeys.isEmpty) { create(); return }
      val k = pick(liveKeys)
      rnd.nextInt(6) match {
        case 0 => // rename, possibly cross-schema: history re-homes INTACT
          val free = for (s <- Schemas; t <- TNames; if !hist.contains((s, t)))
            yield (s, t)
          if (free.isEmpty) return
          val to = pick(free)
          val ver = nextV()
          ops += s"renameTable $k -> $to v=$ver"
          st.renameTable(k._1, k._2, to._1, to._2, ver)
          val moved = hist(k)
          hist -= k
          hist(to) = moved :+ moved.last.copy(version = ver)
        case 1 => // truncate: shape kept, new version entry
          val ver = nextV()
          ops += s"truncate $k v=$ver"
          st.truncateTable(k._1, k._2, ver)
          append(k, last(k).copy(version = ver))
        case 2 => // drop: last shape to the graveyard, history gone
          val ver = nextV()
          ops += s"dropTable $k v=$ver"
          st.dropTable(k._1, k._2, ver)
          grave(k) = last(k).copy(version = ver)
          hist -= k
        case 3 if grave.nonEmpty => // recover / FLASHBACK ... TO name
          val gk = pick(grave.keys.toVector.sorted)
          val to = (gk._1, pick(TNames))
          if (hist.contains(to)) return
          val ver = nextV()
          ops += s"recover $gk -> $to v=$ver"
          st.recoverTable(gk._1, gk._2, to._2, ver)
          append(to, grave(gk).copy(version = ver))
          grave -= gk
        case 4 if liveKeys.size >= 2 => // exchange partition: shapes swap
          val a = pick(liveKeys)
          val b = pick(liveKeys.filterNot(_ == a))
          val ver = nextV()
          ops += s"exchange $a <-> $b v=$ver"
          st.exchangePartition(a._1, a._2, b._1, b._2, ver)
          val (ia, ib) = (last(a), last(b))
          append(a, MInfo(ver, ib.cols, ib.defaults, ib.dicts))
          append(b, MInfo(ver, ia.cols, ia.defaults, ia.dicts))
        case _ => ()
      }
    }

    def check(): Unit = {
      def fail(msg: String) =
        s"seed=$seed depth=$depth: $msg\nops:\n${ops.mkString("\n")}"
      assert(st.version == mVersion, fail("global version"))
      Schemas.foreach { s =>
        assert(st.tablesOf(s) ==
          hist.keys.collect { case (s2, t) if s2 == s => t }.toSeq.sorted,
          fail(s"tablesOf($s)"))
        assert(st.droppedTables(s) ==
          grave.keys.collect { case (s2, t) if s2 == s => t }.toSeq.sorted,
          fail(s"droppedTables($s)"))
      }
      (hist.keys ++ grave.keys).toVector.distinct.foreach { k =>
        val cur = st.current(k._1, k._2)
        val want = hist.get(k).map(_.last)
        assert(cur.map(_.columns) == want.map(_.cols), fail(s"current cols $k"))
        assert(cur.map(_.version) == want.map(_.version), fail(s"current ver $k"))
        assert(cur.map(_.defaults) == want.map(_.defaults), fail(s"defaults $k"))
        assert(cur.map(_.dicts) == want.map(_.dicts), fail(s"dicts $k"))
        CNames.foreach { c =>
          assert(st.originDefault(k._1, k._2, c) ==
            want.flatMap(_.defaults.get(c)), fail(s"originDefault $k.$c"))
          assert(st.dictionary(k._1, k._2, c) ==
            want.flatMap(_.dicts.get(c)), fail(s"dictionary $k.$c"))
        }
        assert(st.droppedShape(k._1, k._2) == grave.get(k).map(_.cols),
          fail(s"droppedShape $k"))
        // atVersion resolves inside the RETAINED window: newest entry
        // with version <= the probe, per probe across recent versions
        (math.max(0L, v - 8) to v).foreach { probe =>
          val want2 = retained(k).reverse.find(_.version <= probe)
          assert(st.atVersion(k._1, k._2, probe).map(i => (i.columns, i.version)) ==
            want2.map(i => (i.cols, i.version)), fail(s"atVersion($k, $probe)"))
        }
      }
    }

    create()
    (1 to 25).foreach { _ =>
      if (rnd.nextBoolean()) columnOp() else tableOp()
      check()
    }
  }

  test("random legal DDL sequences: catalog matches the full-history model") {
    (1 to 300).foreach(runScenario)
  }
}
