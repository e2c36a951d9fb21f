package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType}

/** Shared analysis-time input checks for the SQL-registered kernels —
  * a wrong-typed argument must fail analysis, not throw a
  * ClassCastException on an executor. */
object TypeChecks {
  def requireArrayOfString(fn: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$fn requires array<string>, got ${other.catalogString}")
  }

  def requireString(fn: String, dt: DataType): TypeCheckResult = dt match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$fn requires string, got ${other.catalogString}")
  }

  def requireBinary(fn: String, dt: DataType): TypeCheckResult = dt match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$fn requires binary, got ${other.catalogString}")
  }

  def requireLong(fn: String, dt: DataType): TypeCheckResult = dt match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$fn requires bigint, got ${other.catalogString}")
  }
}
