package graft.streaming

/** The wire-DDL grammar: lexing, statement shapes, and column-def
  * normalization for the text DDL the binlog wire carries (ref:
  * drainer/schema.go handleDDL dispatch; drainer/syncer.go:436-462 skip
  * list). Extracted verbatim from [[CdcStream]] (r18) — the dispatch that
  * CONSUMES parsed statements (slice routing, tracker application, loud-fail
  * policy) stays there; this object owns only text → [[DdlGrammar.WireDdl]].
  * Two fuzz suites pin it: ColumnTailFuzzSpec (tail permutation/quoting) and
  * DecodeWalkPropSpec (random DDL×DML against an independent model).
  */
private[graft] object DdlGrammar {
  // ---- wire-DDL grammar ---------------------------------------------------
  // Keywords lex case-insensitively and identifiers take optional backticks
  // (real binlog traffic carries both); identifier TEXT stays case-sensitive
  // against the registration BY DEFAULT — table names are case-sensitive on
  // the reference's platform (MySQL on Linux), so `APP.T` and `app.t` are
  // different tables, not different spellings. `SchemaTracker(foldCase =
  // true)` opts into the lower_case_table_names policy instead: the decode
  // then folds schema/table identifiers across registration, routing and
  // this grammar (never columns).
  private val Id = "`?([A-Za-z0-9_]+)`?"
  private val Qual = s"$Id\\.$Id"
  private val ModifyColumnRe =
    s"(?i)^ALTER TABLE $Qual MODIFY(?: COLUMN)? $Id (.+)$$".r
  // COLUMN-less ADD is legal MySQL; ADD INDEX/KEY/… is claimed by the
  // admin set FIRST (parse order below), so the bare-identifier form here
  // can only be a column def
  private val AddColumnRe =
    s"(?i)^ALTER TABLE $Qual ADD(?: COLUMN)? $Id (.+)$$".r
  // CHANGE [COLUMN] old new TYPE — MySQL's combined rename+retype
  private val ChangeColumnRe =
    s"(?i)^ALTER TABLE $Qual CHANGE(?: COLUMN)? $Id $Id (.+)$$".r
  private val DropColumnRe =
    s"(?i)^ALTER TABLE $Qual DROP(?: COLUMN)? $Id$$".r
  private val RenameColumnRe =
    s"(?i)^ALTER TABLE $Qual RENAME COLUMN $Id TO $Id$$".r
  private val TruncateTableRe =
    s"(?i)^TRUNCATE(?: TABLE)? $Qual$$".r
  // head only — the column-def list is cut by a balanced-paren scan in
  // [[parseWireDdl]], because trailing table options may themselves carry
  // parens (PARTITION BY HASH(a), COMMENT '(x)') that defeat any
  // single-regex capture. IF NOT EXISTS is captured: a create of an
  // already-tracked name is a legal upstream no-op WITH it, illegal
  // without — the dispatch skips one and throws on the other.
  private val CreateTableHeadRe =
    s"(?i)^CREATE TABLE( IF NOT EXISTS)? $Qual\\s*\\(".r
  private val DropTableRe =
    s"(?i)^DROP TABLE(?: IF EXISTS)? $Qual$$".r
  // TiDB FLASHBACK: recover a dropped table (optionally under a new name)
  // while it is still in the GC window
  private val FlashbackRe =
    s"(?i)^FLASHBACK TABLE $Qual(?: TO $Id)?$$".r
  private val CreateLikeRe =
    s"(?i)^CREATE TABLE( IF NOT EXISTS)? $Qual LIKE $Qual$$".r
  private val RenameTableRe =
    s"(?i)^RENAME TABLE $Qual TO (?:$Id\\.)?$Id$$".r
  // ALTER TABLE … RENAME [TO|AS] … — the equivalent single-table form
  private val AlterRenameRe =
    s"(?i)^ALTER TABLE $Qual RENAME(?: TO| AS)? (?:$Id\\.)?$Id$$".r
  private val DropSchemaRe =
    s"(?i)^DROP (?:DATABASE|SCHEMA)(?: IF EXISTS)? $Id$$".r

  /** Administrative / shape-neutral statements the decode SKIPS with a
    * counter instead of killing the stream — indexes, constraints,
    * partition/tablespace maintenance, column defaults,
    * placement/resource/lock/cache/attribute statements, ANALYZE/OPTIMIZE,
    * CREATE/ALTER DATABASE (ref: drainer/schema.go:333-353 skip list;
    * drainer/syncer.go:436-462 logs and continues past unsupported jobs).
    * None of these change how a row's payload decodes, so replication must
    * ride over them. Checked BEFORE the shape grammar: `ADD INDEX i (k)`
    * must land here, not in the COLUMN-less ADD-column form (a column
    * literally named `index`/`key` is written backticked in MySQL for the
    * same reason, and the backtick routes it past these keywords). */
  private val AdminDdlRes: Seq[scala.util.matching.Regex] = Seq(
    "(?i)^CREATE (?:UNIQUE |FULLTEXT |SPATIAL )?INDEX .+".r,
    "(?i)^DROP INDEX .+".r,
    ("(?i)^ALTER TABLE \\S+ (?:ADD|DROP|RENAME|ALTER) (?:UNIQUE|FULLTEXT|" +
      "SPATIAL|INDEX|KEY|CONSTRAINT|CHECK|PRIMARY|FOREIGN|PARTITION)\\b.*").r,
    // ALTER [COLUMN] c SET/DROP DEFAULT — default changes are decode-neutral
    "(?i)^ALTER TABLE \\S+ ALTER(?: COLUMN)? \\S+ (?:SET|DROP) DEFAULT\\b.*".r,
    // partition / tablespace maintenance verbs
    ("(?i)^ALTER TABLE \\S+ (?:TRUNCATE|REORGANIZE|COALESCE|ANALYZE|CHECK|" +
      "OPTIMIZE|REBUILD|REPAIR|EXCHANGE|IMPORT|DISCARD) " +
      "(?:PARTITION|TABLESPACE)\\b.*").r,
    ("(?i)^ALTER TABLE \\S+ (?:COMMENT|AUTO_INCREMENT|ENGINE|ROW_FORMAT|" +
      "CHARACTER SET|CONVERT TO|CACHE|NOCACHE|PLACEMENT|COMPACT|ATTRIBUTES|" +
      "SHARD_ROW_ID_BITS|SET TIFLASH)\\b.*").r,
    "(?i)^(?:CREATE|ALTER|DROP) PLACEMENT POLICY .+".r,
    "(?i)^(?:CREATE|ALTER|DROP) RESOURCE GROUP .+".r,
    "(?i)^(?:LOCK|UNLOCK) TABLES?\\b.*".r,
    "(?i)^(?:ANALYZE|OPTIMIZE) TABLE .+".r,
    "(?i)^(?:CREATE|ALTER) (?:DATABASE|SCHEMA)\\b.*".r)

  /** The loud-fail gate for statements outside the grammar: a table-verb
    * statement is scanned for EVERY qualified name it carries (a legal
    * multi-table `RENAME TABLE a TO b, c TO d` or `DROP TABLE x, y` names
    * several), because an unknown statement aimed at ANY tracked table
    * cannot be skipped — later frames of that table might decode against
    * a stale shape. FLASHBACK is in the verb set WITHOUT a noun: every
    * unrecognized variant of that family (FLASHBACK DATABASE, FLASHBACK
    * CLUSTER, an option tail the grammar rejects) RECREATES tracked state,
    * so it must reach the qual scan — and, because its operand may be a
    * bare unqualified name, the dispatch additionally scans its bare
    * identifiers against the tracked namespace ([[decodeQuery]]). */
  private val TableVerbRe =
    "(?i)^(?:(?:ALTER|TRUNCATE|RENAME|CREATE|DROP) TABLE|FLASHBACK)\\b.*".r
  private[streaming] val CreateTableVerbRe = "(?i)^CREATE TABLE\\b.*".r
  private[streaming] val FlashbackVerbRe = "(?i)^FLASHBACK\\b.*".r
  private val QualAnyRe = s"$Qual".r
  private val BareIdRe = s"$Id".r
  // the statement's own lexical material — never table/schema operands
  private val FlashbackKeywords =
    Set("FLASHBACK", "TABLE", "DATABASE", "SCHEMA", "CLUSTER", "TO", "IF",
      "NOT", "EXISTS", "TIMESTAMP", "TSO")

  private[streaming] def qualsAddressed(stmt0: String): Seq[(String, String)] = {
    // a qualified name INSIDE a single-quoted literal is the statement's
    // DATA (a CTAS predicate's text, a COMMENT), never an operand — blank
    // literals first, the same rule [[flashbackBareIds]] applies, or a
    // foreign statement quoting a tracked name would trip the loud-fail
    val stmt = stmt0.replaceAll("'(?:\\\\.|[^'\\\\])*'", " ")
    if (TableVerbRe.pattern.matcher(stmt).matches)
      QualAnyRe.findAllMatchIn(stmt).map(m => (m.group(1), m.group(2))).toSeq
    else Seq.empty
  }

  /** Bare (unqualified) identifier operands of an unparseable FLASHBACK
    * statement — everything that lexes as an identifier minus the
    * statement's own keywords and the qualified names (already scanned by
    * [[qualsAddressed]]). Single-quoted literals are blanked first: a
    * token inside `TO TIMESTAMP '2024-01-01 …'` is the statement's DATA,
    * not an operand, and must not widen the loud-fail over-match. */
  private[streaming] def flashbackBareIds(stmt: String): Seq[String] = {
    val noLits = stmt.replaceAll("'(?:\\\\.|[^'\\\\])*'", " ")
    val inQuals = qualsAddressed(noLits).flatMap { case (s, t) => Seq(s, t) }.toSet
    BareIdRe.findAllMatchIn(noLits).map(_.group(1)).toSeq
      .filterNot(id => FlashbackKeywords(
        id.toUpperCase(java.util.Locale.ROOT)) || inQuals(id))
  }

  /** One parsed wire statement. `AdminDdl` = recognized shape-neutral,
    * `UnknownDdl` = outside the grammar; the dispatch decides whether an
    * unknown is skippable (foreign/untracked) or fatal (tracked shape).
    * `default` on a column action (and `defaults` on a create) is the
    * ORIGIN default stripped from the def by [[normalizeColumnTail]]. */
  private[graft] sealed trait WireDdl
  private[graft] final case class ColumnDdl(schema: String, table: String,
    action: String, column: String, arg: String,
    default: Option[String] = None,
    dict: Option[Vector[String]] = None,
    native: String = "") extends WireDdl
  private[graft] final case class TruncateDdl(schema: String, table: String) extends WireDdl
  private[graft] final case class CreateDdl(schema: String, table: String,
    defs: Seq[String], ifNotExists: Boolean = false,
    defaults: Map[String, String] = Map.empty,
    dicts: Map[String, Vector[String]] = Map.empty) extends WireDdl
  private[graft] final case class DropTableDdl(schema: String, table: String) extends WireDdl
  private[graft] final case class RenameDdl(schema: String, table: String,
    toSchema: Option[String], to: String) extends WireDdl
  private[graft] final case class DropSchemaDdl(schema: String) extends WireDdl
  private[graft] final case class FlashbackDdl(schema: String, table: String,
    to: Option[String]) extends WireDdl
  private[graft] final case class CreateLikeDdl(schema: String, table: String,
    srcSchema: String, srcTable: String,
    ifNotExists: Boolean = false) extends WireDdl
  private[graft] case object AdminDdl extends WireDdl
  private[graft] final case class UnknownDdl(stmt: String) extends WireDdl

  /** The ONE top-level scanner behind the grammar's splitters: walk `s`
    * tracking single-quote literals (backslash escapes the next char —
    * MySQL/TiDB default escaping), paren depth, and — when `angles` —
    * generic-type depth, and split on characters matching `splitOn` at
    * top level only. Angle brackets count as nesting ONLY at paren depth
    * 0 (`STRUCT<a: INT>` nests; the comparisons of an expression default
    * like `DEFAULT (a < 0)` or `DEFAULT (a > 0)` sit inside parens and
    * must not), and a bare `>` with no open `<` never counts. Shared by
    * [[splitColumnDefs]] (split on commas) and [[tailTokens]] (split on
    * whitespace) so the quoting/nesting convention can never diverge. */
  private[streaming] def splitTopLevel(s: String, splitOn: Char => Boolean,
      angles: Boolean): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0; var start = 0; var depth = 0; var angle = 0; var inQ = false
    while (i < s.length) {
      val ch = s.charAt(i)
      ch match {
        case '\\' if inQ => i += 1
        case '\'' => inQ = !inQ
        case '(' if !inQ => depth += 1
        case ')' if !inQ => depth -= 1
        case '<' if angles && !inQ && depth == 0 => angle += 1
        case '>' if angles && !inQ && depth == 0 && angle > 0 => angle -= 1
        case _ => ()
      }
      if (splitOn(ch) && !inQ && depth <= 0 && angle == 0) {
        out += s.substring(start, i); start = i + 1
      }
      i += 1
    }
    out += s.substring(start)
    out.result()
  }

  /** Split a column-def tail into top-level tokens: whitespace splits only
    * outside quoted literals and outside ()/<> nesting, so
    * `DECIMAL(10, 2)`, `STRUCT<a: INT>`, `DEFAULT (a > 0)` and
    * `DEFAULT 'a b'` each stay one token. */
  private[streaming] def tailTokens(s: String): Vector[String] =
    splitTopLevel(s, _.isWhitespace, angles = true).filter(_.nonEmpty)

  /** Strip the decode-neutral column-option tails real MySQL/TiDB traffic
    * carries on ADD/MODIFY/CHANGE defs and CREATE TABLE column defs —
    * position (`AFTER x`/`FIRST`), `ON UPDATE`, charset/collation, bare
    * `NULL`, `AUTO_INCREMENT`, inline key markers — none change how a
    * row's payload decodes, so they must not reach the tracker (whose defs
    * feed Spark's DDL parser, which rejects them). `DEFAULT <expr>` is
    * stripped AND captured: it is the column's ORIGIN default — the value
    * TiDB fills for rows that predate the column (ref:
    * drainer/translator/translator.go:169-227 consumes origin defaults;
    * tests/dailytest/case.go:386-485 runs add-column-with-default under
    * load) — and rides its own `origin_default` log record into the
    * tracker's metadata for T7-parity fill. `NOT NULL` and `COMMENT`
    * survive in the def: Spark's DDL parser accepts both and a composing
    * sink's target DDL wants them. Anything ELSE unrecognized stays in the
    * def, where the statement-time decodability check fails LOUDLY — the
    * normalizer never turns an unknown tail into a silent drop. */
  private val IntTypeBases =
    Set("TINYINT", "SMALLINT", "MEDIUMINT", "INT", "INTEGER", "BIGINT")

  /** MySQL integer display widths (`INT(11)`, `TINYINT(1)` — the
    * canonical mysqldump spelling) are pure formatting and drop; bare
    * `MEDIUMINT` maps to the Spark type that holds it. Non-integer types
    * pass through untouched (`DECIMAL(10,2)` keeps its real precision
    * args). */
  private def normalizeIntType(ty: String): String = {
    val base = ty.toUpperCase(java.util.Locale.ROOT).takeWhile(_ != '(')
    if (!IntTypeBases(base)) ty
    else if (base == "MEDIUMINT") "INT"
    else base
  }

  /** `TYPE UNSIGNED` (TiDB's routine auto-id shape) widens to the next
    * Spark type that holds the full unsigned range — Spark has no
    * unsigned integers, and `BIGINT UNSIGNED` values above 2^63-1 must
    * not overflow the decode (the M9 type-domain rule). Non-integer
    * `UNSIGNED` (deprecated MySQL float/decimal forms) keeps its type —
    * the signed domain already contains the values. (Runs AFTER
    * [[normalizeIntType]], so MEDIUMINT arrives as INT — unsigned
    * mediumint's 2^24-1 max fits the signed BIGINT that yields.) */
  private def widenUnsigned(ty: String): String = {
    val base = ty.toUpperCase(java.util.Locale.ROOT).takeWhile(_ != '(')
    base match {
      case "TINYINT"           => "SMALLINT"
      case "SMALLINT"          => "INT"
      case "MEDIUMINT"         => "INT"
      case "INT" | "INTEGER"   => "BIGINT"
      case "BIGINT"            => "DECIMAL(20,0)"
      case _                   => ty
    }
  }

  /** The text VALUE of a single-quoted SQL literal: surrounding quotes
    * strip, backslash escapes (`\'`, `\\`) and doubled `''` unescape in
    * ONE left-to-right scan — chained global replaces mis-read adjacent
    * escapes (`\'\'` collapsed to a single quote because the second
    * replace consumed the `''` the first produced; the r17 tail fuzz
    * caught it); non-literal text passes through (a numeric DEFAULT
    * keeps its spelling). */
  private[graft] def unquoteLiteral(s: String): String =
    if (s.length >= 2 && s.head == '\'' && s.last == '\'') {
      val t = s.substring(1, s.length - 1)
      val b = new java.lang.StringBuilder(t.length)
      var i = 0
      while (i < t.length) {
        val c = t.charAt(i)
        if (i + 1 < t.length &&
            ((c == '\\' && (t.charAt(i + 1) == '\'' || t.charAt(i + 1) == '\\')) ||
             (c == '\'' && t.charAt(i + 1) == '\''))) {
          b.append(t.charAt(i + 1)); i += 2
        } else { b.append(c); i += 1 }
      }
      b.toString
    } else s

  /** ENUM/SET value list, declaration order (= 1-based ordinal order; SET
    * bit positions follow the same order). */
  private def dictValues(ty: String): Vector[String] = {
    val open = ty.indexOf('(')
    if (open < 0 || !ty.endsWith(")")) Vector.empty
    else splitTopLevel(ty.substring(open + 1, ty.length - 1), _ == ',',
      angles = false).map(_.trim).filter(_.nonEmpty).map(unquoteLiteral)
  }

  /** Map a MySQL/TiDB-native column-type spelling to the Spark type that
    * holds its value domain — what real wire DDL carries (ref:
    * drainer/translator/kafka.go:227-294 DatumToColumn maps the full
    * domain; tests/dailytest/case.go:97-146 exercises it; SURVEY §1.3 is
    * the target table): the CHAR/TEXT families → STRING;
    * DATETIME/TIMESTAMP → TIMESTAMP; TIME → STRING and YEAR → INT (the
    * reference formats both to text/int, mysql.go:258-265); ENUM/SET →
    * STRING value text PLUS their value DICTIONARY (M9 parity: the
    * reference maps enum/set to the numeric value, mysql.go:266-269 — the
    * dictionary rides the tracker so a sink can choose either
    * representation); JSON → STRING (opaque text, kafka.go:283-284); the
    * BLOB/BINARY families → BINARY; BIT → BIGINT (uint64 domain,
    * mysql.go:270-276); BOOL → BOOLEAN; REAL → DOUBLE (MySQL REAL
    * defaults to double precision); deprecated FLOAT/DOUBLE display args
    * drop; DEC/FIXED/NUMERIC → DECIMAL keeping real precision args.
    * Integer spellings normalize as before ([[normalizeIntType]]). An
    * UNKNOWN spelling passes through, where the statement-time
    * decodability check fails LOUDLY — never a silent guess. */
  private def mysqlTypeToSpark(ty0: String): (String, Option[Vector[String]]) = {
    val ty = normalizeIntType(ty0)
    val base = ty.toUpperCase(java.util.Locale.ROOT).takeWhile(_ != '(')
    base match {
      case "CHAR" | "CHARACTER" | "VARCHAR" | "NCHAR" | "NVARCHAR" |
           "TINYTEXT" | "TEXT" |
           "MEDIUMTEXT" | "LONGTEXT" | "JSON" | "TIME" => ("STRING", None)
      case "DATETIME" | "TIMESTAMP"    => ("TIMESTAMP", None)
      case "YEAR"                      => ("INT", None)
      case "ENUM" | "SET"              => ("STRING", Some(dictValues(ty)))
      case "TINYBLOB" | "BLOB" | "MEDIUMBLOB" | "LONGBLOB" | "BINARY" |
           "VARBINARY"                 => ("BINARY", None)
      case "BIT"                       => ("BIGINT", None)
      case "BOOL" | "BOOLEAN"          => ("BOOLEAN", None)
      case "REAL"                      => ("DOUBLE", None)
      case "DOUBLE" | "FLOAT"          => (base, None)
      case "DEC" | "FIXED" | "NUMERIC" =>
        ("DECIMAL" + ty.dropWhile(_ != '('), None)
      case _                           => (ty, None)
    }
  }

  private[graft] def normalizeColumnTail(tail: String):
      (String, Option[String], Option[Vector[String]], String) = {
    val toksR = tailTokens(tail)
    // multi-token TYPE spellings collapse to the single head token the map
    // reads: a leading NATIONAL drops (NATIONAL [VAR]CHAR[ACTER]), a
    // VARYING word folds its head into VARCHAR (CHAR[ACTER] VARYING), and
    // MySQL's optional space before the type's paren args (`ENUM ('a','b')`,
    // `INT (11)`) folds the paren token back onto the word — `DOUBLE
    // PRECISION` keeps its dedicated fold below
    val toks0 = {
      var t = toksR
      if (t.length > 1 && t.head.equalsIgnoreCase("NATIONAL")) t = t.tail
      val headBase = t.headOption.map(_.toUpperCase(java.util.Locale.ROOT)
        .takeWhile(_ != '(')).getOrElse("")
      if (t.length > 1 &&
          (headBase == "CHAR" || headBase == "CHARACTER" || headBase == "NCHAR") &&
          t(1).toUpperCase(java.util.Locale.ROOT).startsWith("VARYING"))
        t = ("VARCHAR" + t(1).dropWhile(_ != '(')) +: t.drop(2)
      if (t.length > 1 && t(1).startsWith("(")) t = (t.head + t(1)) +: t.drop(2)
      t
    }
    // the first token is the TYPE: the MySQL-native domain maps to Spark's
    // here (ENUM/SET yield their value dictionary); `DOUBLE PRECISION` is
    // the one remaining TWO-token spelling — its tail word drops with the map
    val (toks, dict) = if (toks0.isEmpty) (toks0, None)
      else {
        val (ty, d) = mysqlTypeToSpark(toks0.head)
        val mapped = toks0.updated(0, ty)
        (if (ty == "DOUBLE" && toks0.length > 1 &&
            toks0(1).equalsIgnoreCase("PRECISION")) mapped.patch(1, Nil, 1)
         else mapped, d)
      }
    val keep = scala.collection.mutable.ArrayBuffer.empty[String]
    var default: Option[String] = None
    // NOT NULL / COMMENT are re-emitted in CANONICAL order (type, NOT
    // NULL, COMMENT): MySQL accepts the clauses in any order, Spark's
    // DDL parser only in this one
    var notNull = false
    var comment: Option[String] = None
    // UNSIGNED widens the type exactly once — MySQL's ZEROFILL IMPLIES
    // UNSIGNED (a bare-ZEROFILL column stores the unsigned range), so
    // both tokens trigger the widening, and `INT UNSIGNED ZEROFILL`
    // must not widen twice
    var widened = false
    var i = 0
    def up(j: Int): String =
      if (j < toks.length) toks(j).toUpperCase(java.util.Locale.ROOT) else ""
    def widenOnce(): Unit =
      if (!widened && keep.nonEmpty) {
        keep(keep.length - 1) = widenUnsigned(keep.last); widened = true
      }
    while (i < toks.length) {
      up(i) match {
        case "DEFAULT" if i + 1 < toks.length =>
          default = Some(toks(i + 1)); i += 2
        case "NOT" if up(i + 1) == "NULL" =>
          notNull = true; i += 2
        case "COMMENT" if i + 1 < toks.length =>
          comment = Some(toks(i + 1)); i += 2
        case "UNSIGNED" | "ZEROFILL" =>
          // the tail's grammar puts both immediately after the type
          widenOnce(); i += 1
        case "AFTER" | "COLLATE" | "CHARSET" if i + 1 < toks.length => i += 2
        case "FIRST" | "NULL" | "AUTO_INCREMENT" | "KEY" => i += 1
        case "UNIQUE" => i += (if (up(i + 1) == "KEY") 2 else 1)
        case "PRIMARY" if up(i + 1) == "KEY" => i += 2
        case "ON" if up(i + 1) == "UPDATE" && i + 2 < toks.length => i += 3
        case "CHARACTER" if up(i + 1) == "SET" && i + 2 < toks.length => i += 3
        // column-level CHECK constraints are decode-neutral (the payload is
        // unaffected by a predicate on it): `[CONSTRAINT [sym]] CHECK (expr)
        // [[NOT] ENFORCED]` strips whole
        case "CHECK" if i + 1 < toks.length && toks(i + 1).startsWith("(") => i += 2
        // no space before the predicate's paren: one token (`CHECK(c>0)`)
        case ck if ck.startsWith("CHECK(") => i += 1
        case "CONSTRAINT" if up(i + 1) == "CHECK" => i += 1
        case "CONSTRAINT" if i + 1 < toks.length => i += 2
        case "NOT" if up(i + 1) == "ENFORCED" => i += 2
        case "ENFORCED" => i += 1
        // generated columns: `[GENERATED ALWAYS] AS (expr) [VIRTUAL|STORED]`
        // strips to a plain column of the declared type — the reference
        // EXCLUDES generated columns from binlog rows (the F7 writable-
        // columns rule), so the wire payload never carries a value and the
        // decode correctly reads NULL
        case "GENERATED" if up(i + 1) == "ALWAYS" && up(i + 2) == "AS" &&
            i + 3 < toks.length && toks(i + 3).startsWith("(") => i += 4
        case "AS" if i + 1 < toks.length && toks(i + 1).startsWith("(") => i += 2
        case "VIRTUAL" | "STORED" => i += 1
        case _ => keep += toks(i); i += 1
      }
    }
    if (notNull) { keep += "NOT"; keep += "NULL" }
    comment.foreach { c => keep += "COMMENT"; keep += c }
    // the NATIVE type spelling rides along (4th element): the map above
    // erases distinctions the T7 zero-value fill needs (TIME/JSON vs
    // CHAR, fixed-width BINARY(n) vs BLOB — tidb table.GetZeroValue)
    (keep.mkString(" "), default, dict, toks0.headOption.getOrElse(""))
  }

  /** Table-level constraint entries legal inside a CREATE TABLE def list —
    * indexes and key declarations are decode-neutral (the F5/admin rule)
    * and drop out of the tracked shape. A backticked COLUMN named `key`
    * routes past these keywords, same as in the ALTER grammar. */
  private val ConstraintDefRe =
    ("(?i)^(?:PRIMARY KEY|UNIQUE(?: KEY| INDEX)?|KEY|INDEX|CONSTRAINT|" +
      "FOREIGN KEY|CHECK|FULLTEXT|SPATIAL)\\b.*").r

  /** Normalize one CREATE TABLE column def: `name` keeps its text (minus
    * backticks), the tail goes through [[normalizeColumnTail]] (origin
    * default and ENUM/SET dictionary captured per column). */
  private def normalizeCreateDef(
      d: String): (String, Option[(String, String)],
                   Option[(String, Vector[String])]) = {
    val toks = tailTokens(d)
    if (toks.length < 2) (d, None, None)
    else {
      val name = toks.head.stripPrefix("`").stripSuffix("`")
      val (clean, dflt, dict, _) = normalizeColumnTail(toks.tail.mkString(" "))
      (s"$name $clean", dflt.map(name -> _), dict.map(name -> _))
    }
  }

  /** CREATE TABLE: cut the column-def list at the close paren BALANCING
    * the list's open — trailing table options may carry parens of their
    * own (`PARTITION BY HASH(a)`, `COMMENT '(x)'`), so a regex capture
    * either swallows option text into the defs or rejects the statement
    * outright. An unbalanced statement parses as unknown. Each column def
    * normalizes through [[normalizeColumnTail]] (origin defaults captured
    * per column); table-level constraint entries drop as decode-neutral. */
  private def parseCreateTable(stmt: String): Option[WireDdl] =
    CreateTableHeadRe.findPrefixMatchOf(stmt).flatMap { m =>
      val open = m.end - 1
      var depth = 0; var i = open; var close = -1; var inQ = false
      while (i < stmt.length && close < 0) {
        stmt.charAt(i) match {
          case '\\' if inQ => i += 1 // escaped char inside a literal
          case '\'' => inQ = !inQ
          case '(' if !inQ => depth += 1
          case ')' if !inQ => depth -= 1; if (depth == 0) close = i
          case _ => ()
        }
        i += 1
      }
      if (close < 0) None
      else {
        val normed = splitColumnDefs(stmt.substring(open + 1, close))
          .filterNot(d => ConstraintDefRe.pattern.matcher(d).matches)
          .map(normalizeCreateDef)
        Some(CreateDdl(m.group(2), m.group(3), normed.map(_._1),
          ifNotExists = m.group(1) != null,
          defaults = normed.flatMap(_._2).toMap,
          dicts = normed.flatMap(_._3).toMap))
      }
    }

  private val RenameListHeadRe = "(?i)^RENAME TABLE (.+)$".r
  private val DropListHeadRe = "(?i)^DROP TABLE(?: IF EXISTS)? (.+)$".r
  private val RenamePartRe = s"(?i)^$Qual TO (?:$Id\\.)?$Id$$".r
  private val QualOnlyRe = s"^$Qual$$".r
  private val AlterListHeadRe = s"(?i)^ALTER TABLE $Qual (.+)$$".r
  // online-DDL clauses migration tools append (gh-ost/pt-osc emit them;
  // TiDB parses and ignores them) — decode-neutral, dropped from the list
  private val AlterSuffixRe =
    "(?i)^(?:(?:ALGORITHM|LOCK)\\s*=?\\s*[A-Za-z_]+|FORCE)$".r

  /** Legal MySQL renames/drops SEVERAL tables in one statement. Each part
    * becomes its own action applied in STATEMENT ORDER (the reference's
    * TiDB jobs are per-table anyway); parts split on top-level commas
    * with the quote-aware splitter. Chained lists — `RENAME TABLE t TO
    * _old, _new TO t`, the standard online-schema-change cutover — are
    * order-dependent, which the applied log preserves via its per-batch
    * `seq` column (replayed by (version, seq), see
    * [[recoverDecodeTracker]]). */
  private[graft] def parseWireDdls(stmt0: String): Seq[WireDdl] = {
    if (stmt0 == null) return Seq(UnknownDdl("<missing ddl_sql>"))
    val stmt = stmt0.trim
    def multiRename(rest: String): Option[Seq[WireDdl]] = {
      val parts = splitColumnDefs(rest)
      if (parts.size < 2) None
      else {
        val parsed = parts.map {
          case RenamePartRe(s, t, toS, to) => Some(RenameDdl(s, t, Option(toS), to))
          case _ => None
        }
        if (parsed.forall(_.isDefined)) Some(parsed.flatten) else None
      }
    }
    def multiDrop(rest: String): Option[Seq[WireDdl]] = {
      val parts = splitColumnDefs(rest)
      if (parts.size < 2) None
      else {
        val parsed = parts.map {
          case QualOnlyRe(s, t) => Some(DropTableDdl(s, t))
          case _ => None
        }
        if (parsed.forall(_.isDefined)) Some(parsed.flatten) else None
      }
    }
    // legal MySQL also packs SEVERAL actions into one ALTER TABLE (TiDB's
    // multi-schema change) and/or appends ALGORITHM=/LOCK=/FORCE clauses;
    // the list splits on top-level commas (a DECIMAL(10,2) arg list or a
    // DEFAULT 'a,b' literal stays one part), neutral clauses drop, and
    // each remaining action re-parses as its own single-action statement,
    // applied in statement order like a multi-table RENAME. A list with
    // any unrecognized part falls back to ONE UnknownDdl of the whole
    // statement — the dispatch's tracked-qual scan decides loud-vs-skip;
    // partial application of a half-understood statement would be worse
    // than either. Engages only when a top-level comma or suffix clause
    // is present, so the single-action path is byte-identical.
    def multiAlter(s0: String, t0: String, rest: String): Option[Seq[WireDdl]] = {
      val parts = splitColumnDefs(rest)
      val (neutral, actions) =
        parts.partition(p => AlterSuffixRe.pattern.matcher(p).matches)
      if (parts.size < 2 && neutral.isEmpty) None
      else if (actions.isEmpty) Some(Seq(AdminDdl))
      else {
        val parsed = actions.map(a => parseWireDdl(s"ALTER TABLE `$s0`.`$t0` $a"))
        if (parsed.exists(_.isInstanceOf[UnknownDdl])) None
        else {
          // MySQL applies every non-RENAME clause of a multi-action ALTER
          // to the ORIGINAL table regardless of clause position — emitting
          // the rename in statement order would re-home the table first
          // and drop the remaining actions into the dispatch's counted
          // skip, leaving the tracked shape stale. Apply the rename LAST.
          // Two renames in one ALTER is not legal MySQL — half-understood,
          // fall through to one UnknownDdl (loud-vs-skip at dispatch).
          val (renames, rest) = parsed.partition(_.isInstanceOf[RenameDdl])
          if (renames.size > 1) None else Some(rest ++ renames)
        }
      }
    }
    (stmt match {
      case RenameListHeadRe(rest) => multiRename(rest)
      case DropListHeadRe(rest)   => multiDrop(rest)
      case AlterListHeadRe(s0, t0, rest) => multiAlter(s0, t0, rest)
      case _ => None
    }).getOrElse(Seq(parseWireDdl(stmt)))
  }

  private[graft] def parseWireDdl(stmt0: String): WireDdl = {
    // a DDL frame with no statement text carries no shape information —
    // parse to unknown (the dispatch skips it, counted) instead of NPEing
    if (stmt0 == null) return UnknownDdl("<missing ddl_sql>")
    val stmt = stmt0.trim
    if (AdminDdlRes.exists(_.pattern.matcher(stmt).matches)) AdminDdl
    else stmt match {
      case ModifyColumnRe(s, t, c, ty) =>
        val (clean, dflt, dict, native) = normalizeColumnTail(ty.trim)
        ColumnDdl(s, t, "modify", c, clean, dflt, dict, native)
      case AddColumnRe(s, t, c, ty)    =>
        val (clean, dflt, dict, native) = normalizeColumnTail(ty.trim)
        ColumnDdl(s, t, "add", c, clean, dflt, dict, native)
      case ChangeColumnRe(s, t, c, nc, ty) =>
        val (clean, dflt, dict, native) = normalizeColumnTail(ty.trim)
        ColumnDdl(s, t, "change", c, s"$nc $clean", dflt, dict, native)
      case DropColumnRe(s, t, c)       => ColumnDdl(s, t, "drop", c, "")
      case RenameColumnRe(s, t, a, b)  => ColumnDdl(s, t, "rename", a, b)
      case TruncateTableRe(s, t)       => TruncateDdl(s, t)
      case DropTableRe(s, t)           => DropTableDdl(s, t)
      case FlashbackRe(s, t, to)       => FlashbackDdl(s, t, Option(to))
      case CreateLikeRe(ine, s, t, s2, u) =>
        CreateLikeDdl(s, t, s2, u, ifNotExists = ine != null)
      case RenameTableRe(s, t, toS, to) => RenameDdl(s, t, Option(toS), to)
      case AlterRenameRe(s, t, toS, to) => RenameDdl(s, t, Option(toS), to)
      case DropSchemaRe(s)             => DropSchemaDdl(s)
      case other => parseCreateTable(other).getOrElse(UnknownDdl(other))
    }
  }

  /** Split a CREATE TABLE column list on top-level commas only — a type
    * argument list like `DECIMAL(10,2)` carries commas of its own, and a
    * quoted literal (`DEFAULT 'x,y'`) may carry commas AND parens that
    * must not count. Inside a literal, a backslash escapes the next
    * character (MySQL/TiDB default escaping; `DEFAULT 'x\'y'` stays one
    * literal) and a doubled `''` toggles the state twice, which nets out
    * correctly for counting purposes. Angle brackets nest too (shared
    * [[splitTopLevel]] rules): the wire's type domain is Spark's, where a
    * def like `c STRUCT<a: INT, b: STRING>` legally carries top-level-
    * paren-depth commas inside generics. */
  private[streaming] def splitColumnDefs(defs: String): Seq[String] =
    splitTopLevel(defs, _ == ',', angles = true).map(_.trim).filter(_.nonEmpty)
}
