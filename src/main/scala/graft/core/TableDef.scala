package graft.core

/** In-code model of the reference's `CREATE TABLE` extraction DSL —
  * a table is a *parsing recipe* over raw text lines, not stored data
  * (reference `src/data_model.rs:35-41`, `README.md:100-124`).
  */

/** How a declared pattern consumes a line (`RegexMode`,
  * reference `src/data_model.rs:203-215`, split parse
  * `src/parsing/parser.rs:612-627`). */
sealed trait PatternMode
object PatternMode {
  /** `name = 'regex'` — capture groups, pattern run once per line. */
  case object Captures extends PatternMode
  /** `name = split 'regex'` — regex-split; the full line is inserted at
    * index 0 so parts are 1-based (reference `src/data_model.rs:181-185`). */
  case object Split extends PatternMode
}

final case class PatternDef(name: String, regex: String, mode: PatternMode = PatternMode.Captures)

/** Where a column's raw value comes from (`ColumnParsing`,
  * reference `src/data_model.rs:218-222`). */
sealed trait ColumnSource
object ColumnSource {
  /** `line[3] => col` — one capture group (or split part) of one pattern. */
  final case class Group(pattern: String, group: Int) extends ColumnSource
  /** `line[1], line[2] => col T[]` — several groups into a fixed-size array;
    * NULL if all elements are null (reference `src/data_model.rs:236-248`). */
  final case class MultiGroup(refs: Seq[Group]) extends ColumnSource
  /** Timestamp composition from groups in order year, month, day, hour,
    * minute, second, [fraction]; month numeric or an English name
    * (reference `src/data_model.rs:249-308`). */
  final case class TimestampGroups(refs: Seq[Group]) extends ColumnSource
  /** `{ .metadata.device_id } => col` — JSON path into the line
    * (reference `src/data_model.rs:369-420`). Path uses `$.a.b[0]` syntax
    * (array indexes 0-based, matching the reference's Vec::get). */
  final case class Json(path: String) extends ColumnSource
}

/** Column modifiers (`ColumnOptions`, reference `src/data_model.rs:422-456`):
  * @param notNull extracting NULL vetoes the whole row (`src/data_model.rs:88-94`)
  * @param trim strings only (`src/parsing/parser.rs:649-656`)
  * @param convert parse a JSON string into the declared type (`src/data_model.rs:313-319`)
  * @param default literal used instead of NULL (`src/data_model.rs:156-158`)
  * @param microseconds timestamp fraction is micros, not millis (`src/data_model.rs:269-276`)
  */
final case class ColumnDef(
    name: String,
    tpe: ValueType,
    source: ColumnSource,
    notNull: Boolean = false,
    trim: Boolean = false,
    convert: Boolean = false,
    default: Option[Any] = None,
    microseconds: Boolean = false)

final case class TableDef(
    name: String,
    patterns: Seq[PatternDef],
    columns: Seq[ColumnDef]) {
  def pattern(name: String): PatternDef =
    patterns.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"undefined pattern: $name"))
}
