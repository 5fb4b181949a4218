package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Presto bracket-subscript semantics: `a[i]` / `m[k]` with the
  * reference's LOUD failure modes, replacing the element_at mapping
  * (which returns NULL where Presto raises — the former ledger item 7).
  *
  * Reference: ArraySubscriptOperator.java:152-169 ("SQL array indices
  * start at 1" for 0, "Array subscript is negative", "Array subscript
  * out of bounds") and MapSubscriptOperator.java:233-238 ("Key not
  * present in map: <k>"). NULL receiver or NULL subscript returns NULL,
  * as in the reference's RETURN_NULL_ON_NULL convention.
  *
  * RuntimeReplaceable: the replacement is a composition of codegen'd
  * builtins (If/Size/ElementAt/RaiseError), dispatched on the resolved
  * receiver type — no interpreted path, stays inside whole-stage
  * codegen.
  */
case class PrestoSubscript(base: Expression, index: Expression)
    extends Expression with RuntimeReplaceable with BinaryLike[Expression] {

  override def left: Expression = base
  override def right: Expression = index
  override def prettyName: String = "presto_subscript"

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override lazy val replacement: Expression = base.dataType match {
    case ArrayType(elem, _) =>
      // reference rejects non-integer subscripts at analysis
      // (ArraySubscriptOperator type signature: bigint index) — a
      // silent Cast would truncate a[1.9] to a[1] and NULL a['x']
      if (!integral(index.dataType)) throw new IllegalArgumentException(
        s"Array subscript must be an integer type, " +
          s"got ${index.dataType.catalogString}")
      val idx = Cast(index, LongType)
      def err(msg: String): Expression =
        Cast(new RaiseError(Literal(msg)), elem)
      If(Or(IsNull(base), IsNull(idx)), Literal(null, elem),
        If(EqualTo(idx, Literal(0L)), err("SQL array indices start at 1"),
          If(LessThan(idx, Literal(0L)), err("Array subscript is negative"),
            If(GreaterThan(idx, Cast(Size(base), LongType)),
              err("Array subscript out of bounds"),
              // bounds already proven: idx <= size <= Int.MaxValue, so
              // the Int cast (ElementAt's required index type) is safe
              ElementAt(base, Cast(index, IntegerType))))))
    case MapType(kt, vt, _) =>
      // analysis-style key-type check (MapSubscriptOperator binds the
      // subscript to the key type; mistyped keys fail the analyzer, not
      // NULL out): exact match, a lossless upcast, or integral widths
      if (!(index.dataType == kt || Cast.canUpCast(index.dataType, kt) ||
          (integral(index.dataType) && integral(kt))))
        throw new IllegalArgumentException(
          s"Map subscript type ${index.dataType.catalogString} is not " +
            s"coercible to key type ${kt.catalogString}")
      val key = Cast(index, kt)
      val err = Cast(new RaiseError(Concat(Seq(
        Literal("Key not present in map: "), Cast(key, StringType)))), vt)
      If(Or(IsNull(base), IsNull(key)), Literal(null, vt),
        If(Not(ArrayContains(MapKeys(base), key)), err,
          ElementAt(base, key)))
    case other => throw new IllegalArgumentException(
      s"presto_subscript: receiver must be array or map, " +
        s"got ${other.catalogString}")
  }

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression): Expression = copy(base = a, index = b)
}

/** Presto's `typeof(x)` (TypeOfFunction.java): renders the PRESTO type
  * signature of the argument — varchar/bigint/array(double)/
  * map(varchar, integer)/row(...) — not Spark's angle-bracket names.
  * Folds to a literal at analysis (the reference computes it from the
  * static type too; the argument is never evaluated). */
case class PrestoTypeOf(child: Expression)
    extends Expression with RuntimeReplaceable
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def prettyName: String = "typeof"

  override lazy val replacement: Expression =
    Literal(PrestoStatements.prestoTypeName(child.dataType))

  override protected def withNewChildInternal(
      c: Expression): Expression = copy(child = c)
}

/** Presto's MAP constructor family (MapConstructor.java): `MAP()` empty,
  * `MAP(ARRAY[k...], ARRAY[v...])` zips key/value arrays, while Spark's
  * own varargs `map(k1, v1, ...)` spelling keeps working — dispatched on
  * the RESOLVED argument types (two array-typed args can only be the
  * Presto zip form; Presto has no varargs constructor to collide with). */
case class PrestoMapConstructor(children: Seq[Expression])
    extends Expression with RuntimeReplaceable {

  override def prettyName: String = "map"

  override lazy val replacement: Expression = children match {
    case Seq(k, v) if k.dataType.isInstanceOf[ArrayType] &&
        v.dataType.isInstanceOf[ArrayType] =>
      MapFromArrays(k, v)
    case _ => CreateMap(children)
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(children = c)
}
