package graft.sql

import graft.core.TableDef

/** AST for the reference's SQL dialect (grammar:
  * reference `src/parsing/parser.rs:216-610`; semantics
  * `src/parsing/parser_tree_converter.rs`). */
sealed trait Expr
object Expr {
  final case class Lit(v: Any) extends Expr // Long | Double | String | Boolean | null
  final case class ColRef(name: String, qualifier: Option[String] = None) extends Expr
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr
  final case class Neg(e: Expr) extends Expr
  final case class Not(e: Expr) extends Expr
  /** IS / IS NOT — total equality incl. NULL (reference P4). */
  final case class Is(l: Expr, r: Expr, negated: Boolean) extends Expr
  final case class In(e: Expr, list: Seq[Expr], negated: Boolean) extends Expr
  /** 1-based array index (reference P9). */
  final case class Index(arr: Expr, idx: Expr) extends Expr
  /** `expr::type` (reference P10). */
  final case class Cast(e: Expr, tpe: String) extends Expr
  final case class Call(name: String, args: Seq[Expr], distinct: Boolean = false) extends Expr
  final case class CaseWhen(clauses: Seq[(Expr, Expr)], otherwise: Expr) extends Expr
  final case class ArrayLit(items: Seq[Expr]) extends Expr
  /** EXTRACT(part FROM ts) sugar (reference parser.rs:966-988). */
  final case class Extract(part: String, from: Expr) extends Expr
  case object Wildcard extends Expr
}

final case class JoinClause(
    outer: Boolean, // reference: OUTER == LEFT OUTER
    table: String,
    file: Option[String],
    leftColumn: (String, String),  // (table, column)
    rightColumn: (String, String))

final case class SelectStmt(
    projections: Seq[(Option[String], Expr)], // (alias, expr)
    from: String,
    fromFile: Option[String],
    join: Option[JoinClause],
    where: Option[Expr],
    groupBy: Option[Seq[Expr]],
    having: Option[Expr],
    limit: Option[Int],
    distinct: Boolean)

sealed trait Statement
object Statement {
  final case class Select(stmt: SelectStmt) extends Statement
  final case class CreateTable(table: TableDef) extends Statement
  final case class Multiple(statements: Seq[Statement]) extends Statement
}
