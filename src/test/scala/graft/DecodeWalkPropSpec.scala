package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.PbBinlogFile
import graft.streaming.{CdcStream, SchemaTracker}

/** Randomized INTEGRATION sweep of the schema-versioned decode walk —
  * the layer the component sweeps cannot see: random column
  * ADD/DROP/RENAME DDL interleaved with DML rows goes through the REAL
  * path (binlog wire files → streaming decode → slice cutting → version
  * stamping → decode-time fill), and every (row, output column) cell of
  * the decoded parquet is compared to an independent row-level model.
  *
  * The model is deliberately naive: per-row column-set snapshots taken
  * at generation time, rename aliasing as snapshot mutation, fill
  * resolution as "smallest later add of the name" — no slices, no
  * versions-as-state, no union schemas. Where [[DecodeFillPropSpec]]
  * drives the fill STATE MACHINE directly and [[SchemaTrackerPropSpec]]
  * the catalog, this pins their COMPOSITION with the wire grammar and
  * the micro-batch walk (ref: drainer/schema.go:293-331 replay-to-
  * version + translator.go:169-227 fill, composed). */
class DecodeWalkPropSpec extends SparkSpec {
  import spark.implicits._

  private case class ColDef(name: String, ty: String, notNull: Boolean,
    dflt: Option[String], addTs: Long)

  private def fmtTs(sec: Long): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochSecond(sec))

  /** The typed fill a later add gives an earlier row, or None. */
  private def fillOf(c: ColDef): Option[String] = (c.dflt, c.ty) match {
    case (Some("CURRENT_TIMESTAMP"), "TIMESTAMP") => Some(fmtTs(c.addTs))
    case (Some("CURRENT_TIMESTAMP"), _)           => None
    case (Some(d), "VARCHAR(8)") => Some(d.stripPrefix("'").stripSuffix("'"))
    case (Some(d), _)            => Some(d)
    case (None, _) if !c.notNull => None
    case (None, "INT")           => Some("0")
    case (None, "VARCHAR(8)")    => Some("")
    case (None, _)               => None // TIMESTAMP zero-datetime divergence
  }

  private def runScenario(seed: Int): Unit = {
    val rnd = new Random(seed)
    val wireDir = graft.util.Scratch.dir(s"graft_walkprop_${seed}_wire")
    val outDir = graft.util.Scratch.dir(s"graft_walkprop_${seed}_out")
    val ckpt = graft.util.Scratch.dir(s"graft_walkprop_${seed}_ckpt")

    val NamePool = Vector("c1", "c2", "c3", "c4")
    // live column defs beyond the base `k DOUBLE` (which never mutates)
    var live = Vector.empty[ColDef]
    // fill entries keyed by CURRENT name (single table, one incarnation):
    // rename re-keys, drop clears — the walk's rekey rule
    var entries = Map.empty[String, Vector[ColDef]]
    var ddlTimes = Vector.empty[Long]
    // per emitted row: (ts, version, provided values, written = the
    // emission-time column set that actually shaped the slice, present =
    // the same set under rename ALIASING — mutable because a rename
    // aliases the NEW name onto old snapshots)
    case class MRow(ts: Long, version: Long, vals: Map[String, String],
      written: Set[String], present: scala.collection.mutable.Set[String])
    val rows = scala.collection.mutable.ArrayBuffer.empty[MRow]
    val ops = scala.collection.mutable.ArrayBuffer.empty[String]
    var wire: DataFrame = null

    def wireRow(ts: Long, op: String, props: String, sql: String): DataFrame =
      Seq(ts).toDF("commit_ts").select(
        col("commit_ts"), lit(ts).as("pk"), lit(op).as("op"),
        lit(if (op == "DDL") "ddl" else "t").as("event_type"),
        timestamp_micros(col("commit_ts") * 1000000L).as("ts"),
        lit(null).cast("double").as("value"),
        (if (props == null) lit(null).cast("string") else lit(props)).as("props"),
        (if (sql == null) lit(null).cast("string") else lit(sql)).as("ddl_sql"))
    def emit(df: DataFrame): Unit =
      wire = if (wire == null) df else wire.unionByName(df)

    def dml(ts: Long): Unit = {
      val chosen = live.filter(_ => rnd.nextBoolean())
      val vals = Map("k" -> s"$ts.5") ++ chosen.map { c =>
        c.ty match {
          case "INT"        => c.name -> s"${ts % 50}"
          case "VARCHAR(8)" => c.name -> s"v$ts"
          case "TIMESTAMP"  => c.name -> fmtTs(ts % 3600)
        }
      }
      val json = "{" + vals.map { case (n, v) =>
        val quoted = live.find(_.name == n).map(_.ty) match {
          case Some("VARCHAR(8)") => s""""$v""""
          case Some("TIMESTAMP")  => s""""${v.replace(" ", "T")}""""
          case _                  => v // numbers (k rides unquoted too)
        }
        s""""$n": $quoted"""
      }.mkString(", ") + "}"
      val version = ddlTimes.lastOption.getOrElse(0L)
      ops += s"dml ts=$ts v=$version vals=$vals"
      val names = ("k" +: live.map(_.name)).toSet
      rows += MRow(ts, version, vals, names,
        scala.collection.mutable.Set(names.toSeq: _*))
      emit(wireRow(ts, "U", json, null))
    }

    def ddl(ts: Long): Unit = {
      val free = NamePool.filterNot(n => live.exists(_.name == n))
      val kind = rnd.nextInt(3)
      if (kind == 0 && free.nonEmpty) { // ADD
        val n = free(rnd.nextInt(free.size))
        val (ty, tail, dflt, nn) = rnd.nextInt(6) match {
          case 0 => ("INT", "INT", None, false)
          case 1 => ("INT", "INT NOT NULL", None, true)
          case 2 => ("INT", "INT DEFAULT 5", Some("5"), false)
          case 3 => ("VARCHAR(8)", "VARCHAR(8) NOT NULL", None, true)
          case 4 => ("VARCHAR(8)", "VARCHAR(8) DEFAULT 'x'", Some("'x'"), false)
          case _ => ("TIMESTAMP", "TIMESTAMP DEFAULT CURRENT_TIMESTAMP",
            Some("CURRENT_TIMESTAMP"), false)
        }
        ops += s"ddl ts=$ts ADD $n $tail"
        val c = ColDef(n, ty, nn, dflt, ts)
        live :+= c
        entries += n -> (entries.getOrElse(n, Vector.empty) :+ c)
        ddlTimes :+= ts
        emit(wireRow(ts, "DDL", null, s"ALTER TABLE app.t ADD COLUMN $n $tail"))
      } else if (kind == 1 && live.nonEmpty) { // DROP
        val n = live(rnd.nextInt(live.size)).name
        ops += s"ddl ts=$ts DROP $n"
        live = live.filterNot(_.name == n)
        entries -= n
        ddlTimes :+= ts
        emit(wireRow(ts, "DDL", null, s"ALTER TABLE app.t DROP COLUMN $n"))
      } else if (kind == 2 && live.nonEmpty && free.nonEmpty) { // RENAME
        val from = live(rnd.nextInt(live.size)).name
        val to = free(rnd.nextInt(free.size))
        ops += s"ddl ts=$ts RENAME $from -> $to"
        live = live.map(c => if (c.name == from) c.copy(name = to) else c)
        entries.get(from).foreach { vec =>
          entries = entries - from + (to -> (entries.getOrElse(to, Vector.empty) ++ vec))
        }
        // the value-rides-the-old-name rule: earlier snapshots carrying
        // `from` are present for `to` as well
        rows.foreach(r => if (r.present.contains(from)) { r.present += to; () })
        ddlTimes :+= ts
        emit(wireRow(ts, "DDL", null,
          s"ALTER TABLE app.t RENAME COLUMN $from TO $to"))
      }
    }

    dml(1L)
    var ts = 1L
    (1 to 12).foreach { _ =>
      ts += 1 + rnd.nextInt(3)
      if (rnd.nextInt(10) < 6) dml(ts) else ddl(ts)
    }
    dml(ts + 1)

    // ONE wire file → one micro-batch: the decode-time fill is
    // deliberately batch-local (cross-batch parity is the sink-side mode),
    // so the sweep must not split the wire across admission triggers
    PbBinlogFile.write(wire, wireDir, nFiles = 1)
    val tracker = new SchemaTracker()
    tracker.createTable("app", "t", Seq("k DOUBLE"), version = 0)
    val q = CdcStream.ddlDrivenDecodeTables(PbBinlogFile.readStream(spark, wireDir),
      tracker, outDir, ckpt, "app", col("event_type"),
      fillOriginDefaults = true)
    try q.processAllAvailable() finally q.stop()

    // expected cell value for row r, output column n
    def expect(r: MRow, n: String): Option[String] =
      if (r.present.contains(n)) r.vals.get(n)
      else entries.getOrElse(n, Vector.empty)
        .filter(_.addTs > r.version).sortBy(_.addTs).headOption.flatMap(fillOf)

    val out = spark.read.parquet(s"$outDir/data")
    val strCols = out.columns.filter(_.endsWith("_str")).toVector
    // every column any row's slice actually CARRIED must have surfaced
    // (aliased names only surface if some written slice bore them)
    val expectedCols = rows.flatMap(_.written).toSet
    assert(expectedCols.map(_ + "_str").subsetOf(strCols.toSet),
      s"seed=$seed missing output columns: got $strCols want $expectedCols" +
        s"\nops:\n${ops.mkString("\n")}")
    val got = out.select(col("commit_ts") +: col("schema_version") +:
        strCols.map(col): _*)
      .collect().map { r =>
        r.getLong(0) -> ((r.getLong(1), strCols.zipWithIndex.map { case (c, i) =>
          c.stripSuffix("_str") -> Option(r.getString(i + 2))
        }.toMap))
      }.toMap
    assert(got.keySet == rows.map(_.ts).toSet,
      s"seed=$seed row set mismatch: ${got.keySet} vs ${rows.map(_.ts)}" +
        s"\nops:\n${ops.mkString("\n")}")
    rows.foreach { r =>
      val (gotVer, cells) = got(r.ts)
      assert(gotVer == r.version,
        s"seed=$seed ts=${r.ts}: version $gotVer != ${r.version}" +
          s"\nops:\n${ops.mkString("\n")}")
      cells.keys.foreach { n =>
        val want = expect(r, n)
        assert(cells(n) == want,
          s"seed=$seed ts=${r.ts} col=$n: impl=${cells(n)} model=$want " +
            s"(present=${r.present})\nops:\n${ops.mkString("\n")}")
      }
    }
  }

  test("random DDL/DML wires: the decode walk matches the row-level model") {
    (1 to 8).foreach(runScenario)
  }
}
