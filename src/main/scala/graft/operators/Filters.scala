package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's row-wise FilterProcessor re-expressed as Catalyst
  * `Column` predicates, so filters stay declarative: Catalyst pushes them
  * into the parquet scan (`PushedFilters`) and whole-stage codegen compiles
  * them — no per-row interpretation as in the reference.
  *
  * Covers all 21 operators of the reference registry
  * (memory_core/query/filter_processor.py:51-73, impls :283-424) plus the
  * second 14-operator dialect of the structured query language
  * (memory_core/orchestrator/query_language.py:32-48, :538-588) — both
  * dialects unify onto this one expression builder.
  *
  * Null-handling modes (filter_processor.py:24-30,151-157):
  *   - Exclude (default): null input fails the predicate (Spark's native
  *     three-valued logic already does this — a null comparison is never
  *     `true`, so the row is filtered out).
  *   - Include: null input passes (`col.isNull || pred`).
  *   - AsValue: null participates as a comparable value (null == null).
  */
object Filters {

  sealed trait NullMode
  object NullMode {
    case object Exclude extends NullMode
    case object Include extends NullMode
    case object AsValue extends NullMode
  }

  final case class Cond(
      field: String,
      op: String,
      value: Any = null,
      value2: Any = null,                 // for between / date_range
      caseSensitive: Boolean = true,      // filter_processor.py:171-175
      nullMode: NullMode = NullMode.Exclude)

  /** Nested field access: dot-path works natively in Spark for structs;
    * for maps the caller uses element_at — `col("a.b")` resolves both the
    * struct path and column named a.b (filter_processor.py:186-223). */
  private def fieldCol(c: Cond): Column = col(c.field)

  /** String-vs-string compare honoring case_sensitive. */
  private def s(c: Cond, x: Column): Column =
    if (c.caseSensitive) x else lower(x)
  private def sv(c: Cond, v: Any): Column =
    if (c.caseSensitive) lit(v) else lower(lit(v))

  /** Build the predicate for a single condition. Unknown operator ⇒
    * pass-through `true`, matching the reference's lenient behavior
    * (filter_processor.py:160-163). */
  def toColumn(c: Cond): Column = {
    val f = fieldCol(c)
    val base: Column = c.op match {
      case "eq"           => s(c, f) === sv(c, c.value)
      case "ne"           => s(c, f) =!= sv(c, c.value)
      case "gt"           => f > lit(c.value)
      case "gte"          => f >= lit(c.value)
      case "lt"           => f < lit(c.value)
      case "lte"          => f <= lit(c.value)
      case "in"           => s(c, f).isin(seqOf(c).map(v => ciVal(c, v)): _*)
      case "not_in"       => !s(c, f).isin(seqOf(c).map(v => ciVal(c, v)): _*)
      case "contains"     => s(c, f).contains(sv(c, c.value))
      case "not_contains" => !s(c, f).contains(sv(c, c.value))
      case "starts_with"  => s(c, f).startsWith(sv(c, c.value))
      case "ends_with"    => s(c, f).endsWith(sv(c, c.value))
      case "regex"        => f.rlike(String.valueOf(c.value))
      case "exists"       => f.isNotNull
      case "not_exists"   => f.isNull
      // string semantics here; array/map columns resolve through the
      // schema-aware overload (size-based), matching len(value)==0
      case "empty"        => f.isNull || length(f.cast("string")) === 0
      case "not_empty"    => f.isNotNull && length(f.cast("string")) > 0
      case "between"      => f.between(lit(c.value), lit(c.value2))
      // date_range: reference parses 6 datetime formats then compares
      // (filter_processor.py:259-280); on typed columns this is a plain
      // between on the timestamp/date domain.
      case "date_range"   => f.between(lit(c.value), lit(c.value2))
      case "array_contains" => array_contains(f, c.value)
      case "array_length" => size(f) === lit(c.value)
      case _              => lit(true) // unknown operator ⇒ pass-through
    }
    c.nullMode match {
      case NullMode.Exclude => base           // 3VL: null fails naturally
      case NullMode.Include => f.isNull || base
      // AsValue: null participates as a comparable value (null == null
      // holds, null != x holds) — null-safe equality for the equality
      // family; other operators keep three-valued exclusion (a null can't
      // be ordered/matched), per filter_processor.py as_value semantics.
      case NullMode.AsValue =>
        val fv = s(c, f)
        c.op match {
          case "eq"     => fv <=> sv(c, c.value)
          case "ne"     => !(fv <=> sv(c, c.value))
          case "in"     => seqOf(c).map(v => fv <=> lit(ciVal(c, v)))
            .reduceOption(_ || _).getOrElse(lit(false))
          case "not_in" => !seqOf(c).map(v => fv <=> lit(ciVal(c, v)))
            .reduceOption(_ || _).getOrElse(lit(false))
          case _        => coalesce(base, lit(false))
        }
    }
  }

  private def seqOf(c: Cond): Seq[Any] = c.value match {
    case xs: Seq[_]   => xs
    case xs: Array[_] => xs.toSeq
    case x            => Seq(x)
  }
  private def ciVal(c: Cond, v: Any): Any = v match {
    case str: String if !c.caseSensitive => str.toLowerCase
    case other                           => other
  }

  /** Schema-aware condition: array/map columns get size-based
    * empty/not_empty (the reference's len(value)==0 applies to lists and
    * dicts too); everything else delegates to the schema-less builder. */
  def toColumn(c: Cond, schema: org.apache.spark.sql.types.StructType): Column = {
    import org.apache.spark.sql.types.{ArrayType, MapType}
    val isComplex = schema.fields.find(_.name == c.field).map(_.dataType).exists {
      case _: ArrayType | _: MapType => true
      case _ => false
    }
    (c.op, isComplex) match {
      case ("empty", true)     => col(c.field).isNull || size(col(c.field)) === 0
      case ("not_empty", true) => col(c.field).isNotNull && size(col(c.field)) > 0
      case _                   => toColumn(c)
    }
  }

  /** AND-fold across conditions (filter_processor.py:114-131). */
  def all(conds: Seq[Cond]): Column =
    conds.map(toColumn).reduceOption(_ && _).getOrElse(lit(true))

  /** AND-fold resolved against a concrete DataFrame's schema. */
  def allFor(df: org.apache.spark.sql.DataFrame, conds: Seq[Cond]): Column =
    conds.map(toColumn(_, df.schema)).reduceOption(_ && _).getOrElse(lit(true))

  /** Type coercion helper: the reference coerces strings to booleans via
    * the word list true/1/yes/on (filter_processor.py:252-253). */
  def boolWords(c: Column): Column =
    lower(c.cast("string")).isin("true", "1", "yes", "on")
}
