package graft.spec

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiles the [[Cond]] boolean tree into a Catalyst [[Column]] so every
  * predicate stays inside Tungsten codegen and is eligible for parquet
  * pushdown — the declarative analogue of the reference's
  * `MLQueryFragment.to_sqlalchemy` (`/root/reference/dbcut/parser.py:71-109`).
  *
  * `resolve` maps a (possibly dotted `table.field`) reference to a Column of
  * the plan being filtered; the caller joins any referenced relations first
  * (see [[graft.operators.Subset.applyRootQuery]]).
  */
object FilterCompiler {

  def compile(cond: Cond, resolve: String => Column): Column = cond match {
    // empty conjunction/disjunction: SQL identity elements (an empty $and
    // constrains nothing, an empty $or admits nothing) — reduce on the
    // empty list would throw instead
    case And(cs) => cs.map(compile(_, resolve)).reduceOption(_ && _)
      .getOrElse(lit(true))
    case Or(cs)  => cs.map(compile(_, resolve)).reduceOption(_ || _)
      .getOrElse(lit(false))
    case Not(c)  => !compile(c, resolve)
    case Pred(field, op, value) =>
      val col = resolve(field)
      op match {
        // null compares as IS [NOT] NULL — the reference's SQLAlchemy
        // `col == None` semantics; `=== lit(null)` is never true and
        // would silently return zero rows
        case "eq" if value == null  => col.isNull
        case "neq" if value == null => col.isNotNull
        case "eq"   => col === lit(value)
        case "neq"  => col =!= lit(value)
        case "gt"   => col > lit(value)
        case "gte"  => col >= lit(value)
        case "lt"   => col < lit(value)
        case "lte"  => col <= lit(value)
        case "like" => col.like(String.valueOf(value))
        case "in"   => col.isin(seqOf(value): _*)
        case "nin"  => !col.isin(seqOf(value): _*)
        case other  => sys.error(s"unsupported operator: $$${other}")
      }
  }

  private def seqOf(value: Any): Seq[Any] = value match {
    case s: Seq[_] => s
    case other     => Seq(other)
  }

  /** All dotted `table.field` prefixes referenced by the tree — the relations
    * the caller must join before filtering.
    */
  def dottedTables(cond: Cond): Set[String] = cond match {
    case And(cs) => cs.flatMap(dottedTables).toSet
    case Or(cs)  => cs.flatMap(dottedTables).toSet
    case Not(c)  => dottedTables(c)
    case Pred(field, _, _) if field.contains(".") => Set(field.split('.').head)
    case _ => Set.empty
  }
}
