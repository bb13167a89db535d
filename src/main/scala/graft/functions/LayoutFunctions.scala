package graft.functions

import org.apache.spark.sql.Column

/** Column API over the layout kernels. */
object LayoutFunctions {

  /** 2-D Z-order key of two integer-valued columns (wider types are
    * range-reduced by the caller — rank, bucket, or epoch-day them
    * first; blind truncation of a 64-bit id would fold distant values
    * onto each other).
    */
  def zOrder2(a: Column, b: Column): Column = {
    import org.apache.spark.sql.{GraftBridge, ZOrder2}
    GraftBridge.column(ZOrder2(
      GraftBridge.expression(a.cast("int")),
      GraftBridge.expression(b.cast("int"))))
  }
}
