package graft.arrow

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.{ListVector, StructVector}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Arrow vector → Spark *internal* value getters (UTF8String, epoch
  * micros, days, Decimal, GenericArrayData) — the DSv2 row-based read
  * path for schemas that need conversion (unsigned widening, date64, ns
  * timestamps, dictionary decode). Exact-mapped schemas take the
  * zero-copy columnar path instead (ArrowColumnVector).
  */
object InternalGetters {

  def forField(vec: FieldVector, dt: DataType, orig: Option[String]): Int => Any = {
    def nn(f: Int => Any): Int => Any = i => if (vec.isNull(i)) null else f(i)
    (orig, dt) match {
      case (Some("uint8"), ShortType) =>
        val v = vec.asInstanceOf[UInt1Vector]; nn(i => ((v.get(i): Byte) & 0xff).toShort)
      case (Some("uint16"), IntegerType) =>
        val v = vec.asInstanceOf[UInt2Vector]; nn(i => v.get(i).toInt)
      case (Some("uint32"), LongType) =>
        val v = vec.asInstanceOf[UInt4Vector]; nn(i => java.lang.Integer.toUnsignedLong(v.get(i)))
      case (Some("uint64"), t: DecimalType) =>
        val v = vec.asInstanceOf[UInt8Vector]
        nn(i => Decimal(new java.math.BigDecimal(java.lang.Long.toUnsignedString(v.get(i))),
          t.precision, t.scale))
      case (Some("date64"), DateType) =>
        val v = vec.asInstanceOf[DateMilliVector]
        nn(i => Math.floorDiv(v.get(i), 86400000L).toInt)
      case (Some("timestamp_ns"), TimestampType) =>
        val v = vec.asInstanceOf[TimeStampNanoTZVector]
        nn(i => Math.floorDiv(v.get(i), 1000L))
      case (_, ByteType)    => val v = vec.asInstanceOf[TinyIntVector]; nn(v.get)
      case (_, ShortType)   => val v = vec.asInstanceOf[SmallIntVector]; nn(v.get)
      case (_, IntegerType) => val v = vec.asInstanceOf[IntVector]; nn(v.get)
      case (_, LongType)    => val v = vec.asInstanceOf[BigIntVector]; nn(v.get)
      case (_, FloatType)   => val v = vec.asInstanceOf[Float4Vector]; nn(v.get)
      case (_, DoubleType)  => val v = vec.asInstanceOf[Float8Vector]; nn(v.get)
      case (_, StringType)  =>
        val v = vec.asInstanceOf[VarCharVector]; nn(i => UTF8String.fromBytes(v.get(i)))
      case (_, BinaryType)  => val v = vec.asInstanceOf[VarBinaryVector]; nn(v.get)
      case (_, BooleanType) => val v = vec.asInstanceOf[BitVector]; nn(i => v.get(i) == 1)
      case (_, DateType)    => val v = vec.asInstanceOf[DateDayVector]; nn(v.get)
      case (_, TimestampType) => val v = vec.asInstanceOf[TimeStampMicroTZVector]; nn(v.get)
      case (_, TimestampNTZType) => val v = vec.asInstanceOf[TimeStampMicroVector]; nn(v.get)
      case (_, t: DecimalType) =>
        val v = vec.asInstanceOf[DecimalVector]
        nn(i => Decimal(v.getObject(i), t.precision, t.scale))
      case (_, NullType) => _ => null
      case (_, ArrayType(et, _)) =>
        val v = vec.asInstanceOf[ListVector]
        val child = forField(v.getDataVector.asInstanceOf[FieldVector], et, None)
        nn { i =>
          val start = v.getElementStartIndex(i)
          val end = v.getElementEndIndex(i)
          val arr = new Array[Any](end - start)
          var k = start
          while (k < end) { arr(k - start) = child(k); k += 1 }
          new GenericArrayData(arr)
        }
      case (_, st: StructType) =>
        val v = vec.asInstanceOf[StructVector]
        val children = st.fields.zipWithIndex.map { case (cf, ci) =>
          val tag = if (cf.metadata.contains(ArrowSchemas.OrigTypeKey))
            Some(cf.metadata.getString(ArrowSchemas.OrigTypeKey)) else None
          forField(v.getChildrenFromFields.get(ci), cf.dataType, tag)
        }
        nn { i =>
          val arr = new Array[Any](children.length)
          var k = 0
          while (k < children.length) { arr(k) = children(k)(i); k += 1 }
          new GenericInternalRow(arr)
        }
      case (_, other) => throw new UnsupportedOperationException(s"internal read: $other")
    }
  }

  /** String value getter for dictionary-decoded VarCharVector. */
  def utf8(vec: VarCharVector): Int => Any =
    i => if (vec.isNull(i)) null else UTF8String.fromBytes(vec.get(i))

  private def unusedSilence(): Unit = { val _ = UTF_8 }
}
