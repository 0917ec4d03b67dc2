package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{ArrayType, ByteType, IntegerType, LongType, MapType, NullType, ShortType, StructType}

/** Key-column handling shared by the extension operators (as-of join, dedup,
  * similarity, text analysis).
  *
  * Spark's hash partitioning, equality joins, and min/least orderings work on
  * any scalar type, so identifiers pass through with their own type — a string
  * doc_id is as good a key as a long one. Integral types are widened to long so
  * the operators' output id type is stable across byte/short/int/long inputs.
  * Nested types fail loudly: the earlier blanket `cast("long")` turned a
  * string-keyed call into all-null keys and silently empty joins.
  */
private[graft] object Keys {

  def id(df: DataFrame, name: String): Column = {
    val dt = df.select(col(name)).schema.head.dataType
    dt match {
      case ByteType | ShortType | IntegerType | LongType => col(name).cast("long")
      case _: ArrayType | _: MapType | _: StructType | NullType =>
        throw new IllegalArgumentException(
          s"key column '$name' has non-scalar type ${dt.simpleString}; " +
            "pass an orderable scalar key")
      case _ => col(name)
    }
  }
}
