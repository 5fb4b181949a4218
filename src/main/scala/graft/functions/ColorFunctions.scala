package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Presto's color/rendering pack (reference
  * `presto-main/.../operator/scalar/ColorFunctions.java:85-280`): a color
  * is a BIGINT — non-negative packed 0xRRGGBB, or -(index+1) for the 8
  * ANSI system colors — and `render`/`bar` emit ANSI 256-color escape
  * sequences (`ESC[38;5;<n>m`, n = 16 + 6x6x6 cube coordinates).
  *
  * Color interpolation replicates the reference bit-for-bit: clamp to
  * [0,1] as float, linear interpolation in HSB space via
  * `java.awt.Color.RGBtoHSB`/`HSBtoRGB` (the exact library the reference
  * calls), masked to 24 bits.
  *
  * These are presentation scalars (CLI rendering, not analytics hot
  * paths), so CodegenFallback is acceptable — they never sit under a
  * 100 TB aggregation.
  */
object ColorMath {

  /** ColorFunctions.SystemColor (ColorFunctions.java:44-53). */
  private val SystemColors = Map(
    "black" -> 0, "red" -> 1, "green" -> 2, "yellow" -> 3,
    "blue" -> 4, "magenta" -> 5, "cyan" -> 6, "white" -> 7)

  private val Reset = "\u001b[0m"

  /** ColorFunctions.rgb (ColorFunctions.java:109): range-checked pack. */
  def rgb(r: Long, g: Long, b: Long): Long = {
    require(r >= 0 && r <= 255, "red must be between 0 and 255")
    require(g >= 0 && g <= 255, "green must be between 0 and 255")
    require(b >= 0 && b <= 255, "blue must be between 0 and 255")
    (r << 16) | (g << 8) | b
  }

  /** ColorFunctions.color(varchar) (ColorFunctions.java:88): CSS short
    * form `#rgb` (nibble replication) or a system color name. */
  def parse(s: String): Long = {
    if (s.length == 4 && s.charAt(0) == '#') {
      val d = (1 to 3).map(i => Character.digit(s.charAt(i), 16))
      if (d.forall(_ >= 0)) {
        val Seq(r, g, b) = d.map(x => ((x << 4) | x).toLong)
        return rgb(r, g, b)
      }
    }
    SystemColors.get(s.toLowerCase) match {
      case Some(i) => -(i + 1L)
      case None =>
        throw new IllegalArgumentException(s"Invalid color: '$s'")
    }
  }

  private def red(c: Long): Int = ((c >> 16) & 0xFF).toInt
  private def green(c: Long): Int = ((c >> 8) & 0xFF).toInt
  private def blue(c: Long): Int = (c & 0xFF).toInt

  /** ColorFunctions.interpolate (ColorFunctions.java:234): linear in HSB
    * space at float precision, result masked to 24 bits. */
  def interpolate(fraction: Double, low: Long, high: Long): Long = {
    require(low >= 0, "lowColor not a valid RGB color")
    require(high >= 0, "highColor not a valid RGB color")
    val f = math.max(0.0, math.min(1.0, fraction)).toFloat
    val lo = java.awt.Color.RGBtoHSB(red(low), green(low), blue(low), null)
    val hi = java.awt.Color.RGBtoHSB(red(high), green(high), blue(high), null)
    val h = f * (hi(0) - lo(0)) + lo(0)
    val s = f * (hi(1) - lo(1)) + lo(1)
    val v = f * (hi(2) - lo(2)) + lo(2)
    (java.awt.Color.HSBtoRGB(h, s, v) & 0xFFFFFF).toLong
  }

  /** ColorFunctions.toAnsi (ColorFunctions.java:249-275). */
  private def toAnsi(c: Long): Int =
    if (c >= 0) {
      16 + (red(c) * 6 / 256) * 36 + (green(c) * 6 / 256) * 6 +
        (blue(c) * 6 / 256)
    } else (-c - 1).toInt

  private def escape(c: Long): String = "\u001b[38;5;" + toAnsi(c) + "m"

  /** ColorFunctions.render (ColorFunctions.java:161). */
  def render(value: String, color: Long): String =
    escape(color) + value + Reset

  /** ColorFunctions.render(boolean) (ColorFunctions.java:189). */
  def renderBool(value: Boolean): String =
    if (value) render("✓", parse("green"))
    else render("✗", parse("red"))

  /** ColorFunctions.bar (ColorFunctions.java:203): `count` full blocks
    * with per-block interpolated color, reset, then space padding to
    * `width`. */
  def bar(percent: Double, width: Long, low: Long, high: Long): String = {
    var count = (percent * width).toInt.toLong
    count = math.min(width, count)
    count = math.max(0, count)
    val b = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      val f = i * 1.0 / (width - 1)
      b.append(escape(interpolate(f, low, high))).append('█')
      i += 1
    }
    b.append(Reset)
    var j = count
    while (j < width) { b.append(' '); j += 1 }
    b.toString
  }
}

/** color('#f00') / color('red') → packed color bigint. */
case class ColorFromString(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "color"
  override def nullSafeEval(input: Any): Any =
    ColorMath.parse(input.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** rgb(r, g, b) → packed color bigint, loud on out-of-range. */
case class RgbColor(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "rgb"
  override def nullSafeEval(r: Any, g: Any, b: Any): Any =
    ColorMath.rgb(r.asInstanceOf[Long], g.asInstanceOf[Long],
      b.asInstanceOf[Long])
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** color(fraction, lowColor, highColor) → HSB-interpolated color. */
case class ColorInterpolate(first: Expression, second: Expression,
    third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "color"
  override def nullSafeEval(f: Any, lo: Any, hi: Any): Any =
    ColorMath.interpolate(f.asInstanceOf[Double], lo.asInstanceOf[Long],
      hi.asInstanceOf[Long])
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** render(value, color) → ANSI-wrapped string; render(bool) → ✓/✗. */
case class RenderColor(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "render"
  override def nullSafeEval(v: Any, c: Any): Any =
    UTF8String.fromString(ColorMath.render(
      v.asInstanceOf[UTF8String].toString, c.asInstanceOf[Long]))
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

case class RenderBoolean(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "render"
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(ColorMath.renderBool(v.asInstanceOf[Boolean]))
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** bar(percent, width, lowColor, highColor) → ANSI block bar. */
case class AnsiBar(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.length == 4, "bar expects (percent, width, low, high)")
  override def dataType: DataType = StringType
  override def prettyName: String = "bar"
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else UTF8String.fromString(ColorMath.bar(
      vs(0).asInstanceOf[Double], vs(1).asInstanceOf[Long],
      vs(2).asInstanceOf[Long], vs(3).asInstanceOf[Long]))
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
