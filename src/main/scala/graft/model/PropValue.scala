package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Variant encoding for the reference's dynamic `PropertyValue` union
  * (graph/core/src/lib.rs:107-120: String | Int64 | Float64 | Bool |
  * Vec<PropertyValue> | Null).
  *
  * Spark has no native open union, so a property value is a fixed
  * struct with a `kind` tag and one populated slot. Heterogeneous
  * arrays (`Vec`) carry one level of scalar variants — the reference's
  * own tests never nest deeper. Everything is a Column expression
  * (codegen'd); no UDFs anywhere on this path.
  *
  * Kinds: 0=null 1=string 2=int64 3=float64 4=bool 5=vec.
  */
object PropValue {
  val KNull: Byte = 0
  val KString: Byte = 1
  val KInt: Byte = 2
  val KFloat: Byte = 3
  val KBool: Byte = 4
  val KVec: Byte = 5

  /** Scalar slot struct (element type of `arr`). */
  val scalarSchema: StructType = StructType(Seq(
    StructField("kind", ByteType, nullable = false),
    StructField("s", StringType, nullable = true),
    StructField("i", LongType, nullable = true),
    StructField("d", DoubleType, nullable = true),
    StructField("b", BooleanType, nullable = true)))

  val schema: StructType = scalarSchema.add(
    StructField("arr", ArrayType(scalarSchema), nullable = true))

  val mapType: MapType = MapType(StringType, schema)

  private val nullArr: Column = lit(null).cast(ArrayType(scalarSchema))

  private def variant(kind: Byte, s: Column, i: Column, d: Column, b: Column,
      arr: Column = nullArr): Column =
    struct(
      lit(kind).cast(ByteType).as("kind"),
      s.cast(StringType).as("s"),
      i.cast(LongType).as("i"),
      d.cast(DoubleType).as("d"),
      b.cast(BooleanType).as("b"),
      arr.as("arr"))

  private val nullS = lit(null).cast(StringType)
  private val nullI = lit(null).cast(LongType)
  private val nullD = lit(null).cast(DoubleType)
  private val nullB = lit(null).cast(BooleanType)

  def ofString(c: Column): Column = variant(KString, c, nullI, nullD, nullB)
  def ofInt(c: Column): Column = variant(KInt, nullS, c, nullD, nullB)
  def ofFloat(c: Column): Column = variant(KFloat, nullS, nullI, c, nullB)
  def ofBool(c: Column): Column = variant(KBool, nullS, nullI, nullD, c)
  def ofNull: Column = variant(KNull, nullS, nullI, nullD, nullB)

  /** Heterogeneous vec from already-built scalar variant columns. */
  def ofVec(elems: Column*): Column =
    variant(KVec, nullS, nullI, nullD, nullB,
      array(elems.map(e => e.dropFields("arr")): _*))

  def scalarOfString(c: Column): Column =
    struct(lit(KString).cast(ByteType).as("kind"), c.cast(StringType).as("s"),
      nullI.as("i"), nullD.as("d"), nullB.as("b"))
  def scalarOfInt(c: Column): Column =
    struct(lit(KInt).cast(ByteType).as("kind"), nullS.as("s"),
      c.cast(LongType).as("i"), nullD.as("d"), nullB.as("b"))

  // ---- typed accessors over a variant column ----------------------

  /** String view: only kind=1 yields a value (no cross-kind coercion,
    * mirroring compare_values: cross-kind comparison = None).
    */
  def asString(v: Column): Column = when(v("kind") === KString, v("s"))

  /** Numeric view with the reference's Int64→Float64 coercion
    * (graph/core/src/lib.rs:183-189).
    */
  def asDouble(v: Column): Column =
    when(v("kind") === KInt, v("i").cast(DoubleType))
      .when(v("kind") === KFloat, v("d"))

  def asLong(v: Column): Column = when(v("kind") === KInt, v("i"))

  def asBool(v: Column): Column = when(v("kind") === KBool, v("b"))

  /** Render a variant as text the way the reference Displays values
    * (graph/core/src/lib.rs:225-243): bare scalar payloads.
    */
  def render(v: Column): Column =
    when(v("kind") === KString, v("s"))
      .when(v("kind") === KInt, v("i").cast(StringType))
      .when(v("kind") === KFloat, v("d").cast(StringType))
      .when(v("kind") === KBool, v("b").cast(StringType))
      .otherwise(lit(null).cast(StringType))

  /** GQL comparison semantics (graph/query/src/executor.rs:641-650):
    * numerics compare cross-type after float coercion, strings
    * lexicographically, bools by equality order, cross-kind yields
    * NULL → predicate false under SQL 3-valued logic (identical to
    * the reference's `None` → false).
    */
  def compare(v: Column, lit_ : Any, op: String): Column = {
    val cmp: (Column, Column) => Column = op match {
      case "=" => _ === _
      case "!=" => _ =!= _
      case "<" => _ < _
      case "<=" => _ <= _
      case ">" => _ > _
      case ">=" => _ >= _
    }
    lit_ match {
      case s: String => cmp(asString(v), lit(s))
      case i: Long => cmp(asDouble(v), lit(i.toDouble))
      case i: Int => cmp(asDouble(v), lit(i.toDouble))
      case d: Double => cmp(asDouble(v), lit(d))
      case b: Boolean => cmp(asBool(v), lit(b))
      case null => lit(null).cast(BooleanType)
    }
  }

  /** Bare `var.prop` truthiness: Bool(true) only
    * (executor.rs:387-391).
    */
  def truthy(v: Column): Column = asBool(v) === lit(true)
}
