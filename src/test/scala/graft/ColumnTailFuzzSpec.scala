package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DdlGrammar.normalizeColumnTail

/** Permutation fuzz of the wire DDL column-tail normalizer: MySQL
  * accepts column options in (almost) any order, so a random type
  * spelling from the full native pool is combined with a random-order
  * draw of option clauses, and the normalized result is checked against
  * the table-driven expectation — mapped Spark type, canonical
  * `NOT NULL`/`COMMENT` re-emission, captured origin default, captured
  * ENUM/SET dictionary, native spelling. The existing point tests pin
  * single spellings; this pins the option-ORDER space (the grammar's
  * while-loop must not care where DEFAULT/COMMENT/charset/check/
  * generated clauses sit relative to each other). */
class ColumnTailFuzzSpec extends AnyFunSuite {

  /** (spelling, expected mapped type, expected native head, expected dict). */
  private val TypePool: Vector[(String, String, String, Option[Vector[String]])] =
    Vector(
      ("INT(11)", "INT", "INT(11)", None),
      ("MEDIUMINT", "INT", "MEDIUMINT", None),
      ("TINYINT(1) UNSIGNED ZEROFILL", "SMALLINT", "TINYINT(1)", None),
      ("INT UNSIGNED", "BIGINT", "INT", None),
      ("BIGINT UNSIGNED", "DECIMAL(20,0)", "BIGINT", None),
      ("VARCHAR(32)", "STRING", "VARCHAR(32)", None),
      ("NATIONAL VARCHAR(8)", "STRING", "VARCHAR(8)", None),
      ("CHARACTER VARYING(8)", "STRING", "VARCHAR(8)", None),
      ("NCHAR VARYING(8)", "STRING", "VARCHAR(8)", None),
      ("ENUM('red','green')", "STRING", "ENUM('red','green')",
        Some(Vector("red", "green"))),
      ("ENUM ('red','green')", "STRING", "ENUM('red','green')",
        Some(Vector("red", "green"))),
      ("SET('a','b')", "STRING", "SET('a','b')", Some(Vector("a", "b"))),
      ("DOUBLE PRECISION", "DOUBLE", "DOUBLE", None),
      ("FLOAT(10,2)", "FLOAT", "FLOAT(10,2)", None),
      ("DEC(10,2)", "DECIMAL(10,2)", "DEC(10,2)", None),
      ("FIXED(8,3)", "DECIMAL(8,3)", "FIXED(8,3)", None),
      ("BIT(8)", "BIGINT", "BIT(8)", None),
      ("TIME", "STRING", "TIME", None),
      ("JSON", "STRING", "JSON", None),
      ("DATETIME(3)", "TIMESTAMP", "DATETIME(3)", None),
      ("TIMESTAMP", "TIMESTAMP", "TIMESTAMP", None),
      ("YEAR", "INT", "YEAR", None),
      ("BOOL", "BOOLEAN", "BOOL", None),
      ("REAL", "DOUBLE", "REAL", None),
      ("BLOB", "BINARY", "BLOB", None),
      ("VARBINARY(16)", "BINARY", "VARBINARY(16)", None))

  private val Defaults = Vector(
    "DEFAULT 5", "DEFAULT 'a b'", "DEFAULT CURRENT_TIMESTAMP",
    "DEFAULT 0x1F", "DEFAULT (a > 0)")

  /** Decode-neutral clauses the normalizer must strip wherever they sit. */
  private val Neutral = Vector(
    "AFTER k", "FIRST", "AUTO_INCREMENT", "UNIQUE KEY", "UNIQUE",
    "PRIMARY KEY", "KEY", "COLLATE utf8mb4_bin", "CHARSET utf8mb4",
    "CHARACTER SET utf8mb4", "ON UPDATE CURRENT_TIMESTAMP",
    "CHECK (a > 0)", "CHECK(a>0)",
    "CONSTRAINT ck CHECK (a > 0) NOT ENFORCED",
    "GENERATED ALWAYS AS (a + 1) STORED", "AS (a + 1) VIRTUAL")

  test("random option orderings normalize to the canonical shape") {
    (1 to 500).foreach { seed =>
      val rnd = new Random(seed)
      val (ty, mapped, native, dict) = TypePool(rnd.nextInt(TypePool.size))
      val dflt = if (rnd.nextBoolean()) Some(Defaults(rnd.nextInt(Defaults.size)))
                 else None
      val nullability = rnd.nextInt(3) match {
        case 0 => Some("NOT NULL"); case 1 => Some("NULL"); case _ => None
      }
      val comment = if (rnd.nextInt(3) == 0) Some("COMMENT 'c x'") else None
      val neutral = rnd.shuffle(Neutral).take(rnd.nextInt(4))
      val opts = rnd.shuffle(
        dflt.toVector ++ nullability.toVector ++ comment.toVector ++ neutral)
      val tail = (ty +: opts).mkString(" ")
      val (clean, gotDflt, gotDict, gotNative) = normalizeColumnTail(tail)
      val wantClean = mapped +
        (if (nullability.contains("NOT NULL")) " NOT NULL" else "") +
        (if (comment.isDefined) " COMMENT 'c x'" else "")
      def ctx = s"seed=$seed tail=[$tail]"
      assert(clean == wantClean, s"$ctx clean=[$clean] want=[$wantClean]")
      assert(gotDflt == dflt.map(_.stripPrefix("DEFAULT ")), s"$ctx default")
      assert(gotDict == dict, s"$ctx dict")
      assert(gotNative == native, s"$ctx native")
    }
  }

  /** MySQL-escape a literal: each quote doubles or backslash-escapes
    * (random choice — both are legal and may MIX in one literal), each
    * backslash doubles. */
  private def quoteLit(s: String, rnd: Random): String =
    "'" + s.flatMap {
      case '\'' => if (rnd.nextBoolean()) "''" else "\\'"
      case '\\' => "\\\\"
      case c    => c.toString
    } + "'"

  test("quoted DEFAULT literals round-trip through tokenizer and unescape") {
    // the tokenizer must keep a literal with embedded commas/parens/
    // spaces/escapes ONE token (and not swallow the following clause),
    // and unquoteLiteral must recover the exact original text
    val alphabet = "ab,() '\\".toVector
    (1 to 2000).foreach { seed =>
      val rnd = new Random(seed)
      val original = Vector.fill(rnd.nextInt(8))(
        alphabet(rnd.nextInt(alphabet.size))).mkString
      val lit = quoteLit(original, rnd)
      val (clean, dflt, _, _) =
        normalizeColumnTail(s"VARCHAR(8) DEFAULT $lit NOT NULL")
      def ctx = s"seed=$seed original=[$original] lit=[$lit]"
      assert(clean == "STRING NOT NULL", s"$ctx literal swallowed the tail: [$clean]")
      assert(dflt.contains(lit), s"$ctx captured=[$dflt]")
      assert(dflt.map(graft.streaming.DdlGrammar.unquoteLiteral) == Some(original),
        s"$ctx unescaped=[${dflt.map(graft.streaming.DdlGrammar.unquoteLiteral)}]")
    }
  }

  test("ENUM dictionaries round-trip arbitrary member text") {
    val alphabet = "ab,() '\\".toVector // commas/parens/quotes/escapes
    (1 to 1000).foreach { seed =>
      val rnd = new Random(seed)
      val members = Vector.fill(1 + rnd.nextInt(3))(
        // non-empty: dictValues drops empty members like MySQL rejects them
        "m" + Vector.fill(rnd.nextInt(6))(
          alphabet(rnd.nextInt(alphabet.size))).mkString)
      val lits = members.map(m => quoteLit(m, rnd))
      val (clean, _, dict, _) =
        normalizeColumnTail(s"ENUM(${lits.mkString(",")}) NOT NULL")
      def ctx = s"seed=$seed members=$members lits=$lits"
      assert(clean == "STRING NOT NULL", s"$ctx clean=[$clean]")
      assert(dict.contains(members), s"$ctx dict=$dict")
    }
  }

  test("an unknown tail token is retained, never silently dropped") {
    // the loud-fail contract: an unrecognized clause stays in the def,
    // where the statement-time decodability check rejects it
    val (clean, _, _, _) = normalizeColumnTail("INT SRID 4326")
    assert(clean.contains("SRID"), s"unknown token vanished: [$clean]")
  }

  test("keyword folding is locale-independent (the tr-TR dotted-I hazard)") {
    // normalizeColumnTail's keyword matcher must fold through Locale.ROOT:
    // under a Turkish default locale, "unsigned".toUpperCase is UNSİGNED
    // (dotted İ) and the widening/stripping arms would silently miss —
    // the def then reaches Spark's DDL parser with raw MySQL tokens and
    // kills the stream (r18 review fix)
    val prev = java.util.Locale.getDefault
    java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
    try {
      val (clean, dflt, dict, native) =
        normalizeColumnTail("int unsigned not null first")
      assert(clean == "BIGINT NOT NULL" && dflt.isEmpty && dict.isEmpty &&
        native == "int", s"tr-TR fold broke: [$clean] native=[$native]")
    } finally java.util.Locale.setDefault(prev)
  }
}
