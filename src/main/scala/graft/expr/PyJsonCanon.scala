package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Canonical-JSON rendering of a struct, BYTE-IDENTICAL to Python's
  * `json.dumps(payload, sort_keys=True, default=str)` — the reference's
  * identity-digest canonicalization (graflo/architecture/schema/
  * identity_digest.py:33-36). `sha2(PyJsonCanon(struct), 256)` therefore
  * reproduces the reference's vertex digests byte-for-byte, so stores
  * written by the two engines CAN be key-joined on hash ids (closing the
  * round-6 "What's missing #3" divergence).
  *
  * Faithful details (all executed-parity-tested against the reference in
  * `ReferenceDigestParitySpec`):
  *  - keys sorted by code point (`sort_keys=True`), separators `", "` /
  *    `": "` (json.dumps defaults);
  *  - strings escaped exactly like `ensure_ascii=True`: short escapes
  *    for `\b\t\n\f\r\"\\`, every other char outside 0x20–0x7E as
  *    lowercase `\uXXXX` (surrogate pairs stay split, as CPython emits);
  *  - long/int → decimal; bool → `true`/`false`; null → `null`;
  *  - double/float → CPython `repr(float)`: shortest correctly-rounded
  *    digits, fixed notation for decimal exponent in [-4, 16), else
  *    `e±XX` scientific with a ≥2-digit exponent ([[PyJsonCanon.pyFloatRepr]]);
  *  - date / timestamp / decimal → `default=str` quoted renderings
  *    (`str(date)`, `str(datetime)` with microseconds only when nonzero,
  *    `str(Decimal)` scale-preserving).
  *
  * Caveat carried in DIVERGENCES.md: byte parity also requires TYPE
  * parity — a field that was a Python int must be an integral Spark
  * column, not a string.
  *
  * Codegen emits one call to [[renderRow]] via a reference object —
  * whole-stage codegen is preserved (same shape as [[JaroWinkler]]).
  */
case class PyJsonCanon(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StructType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"py_json_canon expects a struct, got $other")
  }

  private lazy val schema = child.dataType.asInstanceOf[StructType]

  /** Field order: sorted by code point, matching Python's sort_keys over
    * str keys (Scala's String ordering is UTF-16 code-UNIT order, which
    * diverges from code-point order only when a supplementary-plane char
    * meets a char above 0xE000 — sort explicitly to be exact).
    */
  private lazy val order: Array[Int] = {
    def cmp(a: String, b: String): Boolean = {
      val ai = a.codePoints().toArray; val bi = b.codePoints().toArray
      val n = math.min(ai.length, bi.length)
      var i = 0
      while (i < n) {
        if (ai(i) != bi(i)) return ai(i) < bi(i)
        i += 1
      }
      ai.length < bi.length
    }
    schema.fieldNames.indices.sortWith((i, j) =>
      cmp(schema.fieldNames(i), schema.fieldNames(j))).toArray
  }

  def renderRow(row: InternalRow): UTF8String = {
    val sb = new java.lang.StringBuilder(64)
    sb.append('{')
    var first = true
    order.foreach { i =>
      if (!first) sb.append(", ")
      first = false
      PyJsonCanon.appendStr(sb, schema.fields(i).name)
      sb.append(": ")
      PyJsonCanon.appendValue(sb, row, i, schema.fields(i).dataType)
    }
    sb.append('}')
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(input: Any): Any =
    renderRow(input.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pyJsonCanon", this, classOf[PyJsonCanon].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.renderRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PyJsonCanon =
    copy(child = newChild)
}

object PyJsonCanon {

  /** Column wrapper: canonical Python-json text of a struct column. */
  def column(s: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(PyJsonCanon(GraftColumnBridge.expression(s)))
  }

  /** Python `json.dumps` string escaping with `ensure_ascii=True`:
    * CPython's `ESCAPE_ASCII` regex is `([\\"]|[^\ -~])` — backslash,
    * quote, and everything outside 0x20–0x7E; `ESCAPE_DCT` maps
    * `\b\t\n\f\r` to short escapes, the rest to lowercase `\u%04x` over
    * UTF-16 code units (so astral chars emit surrogate pairs).
    */
  private[expr] def appendStr(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c >= 0x20 && c <= 0x7e => sb.append(c)
        case c =>
          sb.append("\\u")
          val hex = Integer.toHexString(c.toInt)
          var p = hex.length
          while (p < 4) { sb.append('0'); p += 1 }
          sb.append(hex)
      }
      i += 1
    }
    sb.append('"')
  }

  private[expr] def appendValue(sb: java.lang.StringBuilder, row: InternalRow,
      i: Int, dt: DataType): Unit = {
    if (row.isNullAt(i)) { sb.append("null"); return }
    dt match {
      case StringType  => appendStr(sb, row.getUTF8String(i).toString)
      case LongType    => sb.append(row.getLong(i))
      case IntegerType => sb.append(row.getInt(i))
      case ShortType   => sb.append(row.getShort(i).toInt)
      case ByteType    => sb.append(row.getByte(i).toInt)
      case BooleanType => sb.append(if (row.getBoolean(i)) "true" else "false")
      case DoubleType  => sb.append(pyFloatRepr(row.getDouble(i)))
      case FloatType   => sb.append(pyFloatRepr(row.getFloat(i).toDouble))
      case DateType    => // default=str → str(datetime.date) → ISO, quoted
        appendStr(sb, java.time.LocalDate.ofEpochDay(row.getInt(i).toLong).toString)
      case TimestampType | TimestampNTZType =>
        appendStr(sb, pyDatetimeStr(row.getLong(i)))
      case d: DecimalType => // default=str → str(Decimal), scale-preserving
        appendStr(sb, pyDecimalStr(
          row.getDecimal(i, d.precision, d.scale).toJavaBigDecimal))
      case other =>
        throw new IllegalArgumentException(
          s"py_json_canon: unsupported field type $other")
    }
  }

  /** `str(datetime)` over epoch MICROS (naive/UTC): `YYYY-MM-DD HH:MM:SS`
    * with `.ffffff` appended only when the microsecond part is nonzero.
    */
  private[expr] def pyDatetimeStr(micros: Long): String = {
    val secs = Math.floorDiv(micros, 1000000L)
    val us = Math.floorMod(micros, 1000000L)
    val ldt = java.time.LocalDateTime.ofEpochSecond(secs, 0, java.time.ZoneOffset.UTC)
    val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02d " +
      f"${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d"
    if (us == 0) base else f"$base.$us%06d"
  }

  /** `str(Decimal)` — the "to-scientific-string" rule of the IBM decimal
    * spec CPython implements (Lib/_pydecimal.py `__str__`): plain notation
    * only when the exponent is ≤ 0 AND the adjusted exponent (exponent +
    * digits − 1) is ≥ −6; otherwise `<digit>[.<digits>]E<sign><adjusted>`
    * with uppercase E, an explicit sign, and no zero-padding — so
    * `Decimal('0.0000001')` renders `1E-7`, not `0.0000001`. Digits are
    * NOT normalized (scale is preserved), matching Python.
    */
  private[expr] def pyDecimalStr(bd: java.math.BigDecimal): String = {
    val digits = bd.unscaledValue.abs.toString
    val exponent = -bd.scale
    val adjusted = exponent + digits.length - 1
    if (exponent <= 0 && adjusted >= -6) {
      bd.toPlainString // Python's plain form == BigDecimal's for exp ≤ 0
    } else {
      val sb = new java.lang.StringBuilder(digits.length + 8)
      if (bd.signum < 0) sb.append('-')
      sb.append(digits.charAt(0))
      if (digits.length > 1) sb.append('.').append(digits, 1, digits.length)
      sb.append('E')
      if (adjusted >= 0) sb.append('+')
      sb.append(adjusted)
      sb.toString
    }
  }

  /** CPython `repr(float)`: the shortest correctly-rounded decimal that
    * round-trips, rendered fixed for decimal exponent −4 ≤ e < 16 and as
    * `<mantissa>e±XX` (exponent zero-padded to ≥2 digits) otherwise.
    * Shortest digits are found by rounding the EXACT binary value to
    * p = 1..17 significant digits (half-even — the correctly-rounded
    * p-digit decimal) and taking the first p that parses back equal.
    */
  def pyFloatRepr(d: Double): String = {
    if (java.lang.Double.isNaN(d)) return "NaN"             // json.dumps emits these
    if (d == Double.PositiveInfinity) return "Infinity"     // bare literals
    if (d == Double.NegativeInfinity) return "-Infinity"
    if (d == 0.0) return if (1.0 / d < 0) "-0.0" else "0.0"
    val neg = d < 0
    val a = math.abs(d)
    var bd: java.math.BigDecimal = null
    var p = 1
    while (bd == null && p <= 17) {
      val c = new java.math.BigDecimal(a).round(
        new java.math.MathContext(p, java.math.RoundingMode.HALF_EVEN))
      if (c.doubleValue() == a) bd = c else p += 1
    }
    if (bd == null) bd = new java.math.BigDecimal(a) // unreachable: 17 always round-trips
    val stripped = bd.stripTrailingZeros
    val digits = stripped.unscaledValue.toString
    val e10 = digits.length - 1 - stripped.scale // exponent of the leading digit
    val sb = new java.lang.StringBuilder(26)
    if (neg) sb.append('-')
    if (e10 >= -4 && e10 < 16) {
      if (e10 >= 0) {
        if (digits.length > e10 + 1) {
          sb.append(digits, 0, e10 + 1).append('.')
            .append(digits, e10 + 1, digits.length)
        } else {
          sb.append(digits)
          var z = digits.length
          while (z < e10 + 1) { sb.append('0'); z += 1 }
          sb.append(".0") // Python always shows a fractional part in fixed form
        }
      } else {
        sb.append("0.")
        var z = -1
        while (z > e10) { sb.append('0'); z -= 1 }
        sb.append(digits)
      }
    } else {
      sb.append(digits.charAt(0))
      if (digits.length > 1) sb.append('.').append(digits, 1, digits.length)
      sb.append('e').append(if (e10 < 0) '-' else '+')
      val ea = math.abs(e10).toString
      if (ea.length < 2) sb.append('0')
      sb.append(ea)
    }
    sb.toString
  }
}
