package graft.spec

/** Boolean filter tree — graft's form of the reference's mlalchemy where-tree
  * (`/root/reference/dbcut/parser.py:117-185`): `$and/$or/$not` over field
  * operators `$eq/$neq/$gt/$gte/$lt/$lte/$like/$in/$nin`, with dotted
  * `table.field` references resolved against joined relations.
  */
sealed trait Cond
final case class And(conds: Seq[Cond]) extends Cond
final case class Or(conds: Seq[Cond]) extends Cond
final case class Not(cond: Cond) extends Cond
/** op ∈ eq, neq, gt, gte, lt, lte, like, in, nin. `field` may be dotted. */
final case class Pred(field: String, op: String, value: Any) extends Cond

final case class OrderKey(field: String, desc: Boolean = false)

/** Declarative extraction query — dbcut's YAML query language re-expressed as
  * a Scala AST (`/root/reference/dbcut/parser.py` + extension keys
  * `join_depth/backref_depth/backref_limit/exclude/include`). Defaults mirror
  * `/root/reference/dbcut/configuration.py:16-26`.
  */
final case class QuerySpec(
    from: String,
    where: Option[Cond] = None,
    orderBy: Seq[OrderKey] = Nil,
    offset: Option[Long] = None,
    limit: Option[Long] = Some(QuerySpec.DefaultLimit),
    joinDepth: Int = QuerySpec.DefaultJoinDepth,
    backrefDepth: Int = QuerySpec.DefaultBackrefDepth,
    backrefLimit: Option[Long] = Some(QuerySpec.DefaultBackrefLimit),
    exclude: Seq[String] = Nil,
    include: Seq[String] = Nil)

object QuerySpec {
  val DefaultLimit = 10L
  val DefaultBackrefLimit = 10L
  val DefaultBackrefDepth = 2
  val DefaultJoinDepth = 5
}
