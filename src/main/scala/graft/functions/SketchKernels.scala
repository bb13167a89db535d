package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Kernels over serialized sketches — the probe side of the
  * sketch-calibration queries (the build side is Spark's own
  * `count_min_sketch` aggregate).
  */
object SketchKernels {

  // The sketch reaches every probing row as the SAME one-row aggregate
  // result broadcast across the plan, so cache the deserialized sketch
  // per thread keyed by the byte payload — per-row cost is then the
  // Murmur hashing of the item, not a full deserialization. Thread-local
  // because CountMinSketch instances are not thread-safe to share.
  private val last =
    new ThreadLocal[(Array[Byte], CountMinSketch)]

  /** Point estimate from a `count_min_sketch(...)` binary for a string
    * item, hashing the item's UTF-8 bytes exactly as the aggregate's
    * update path did. CMS never under-counts: estimate >= true count
    * always, and <= true + eps*N with the sketch's confidence.
    */
  def cmsEstimate(sketch: Array[Byte], item: UTF8String): Long = {
    var e = last.get()
    if (e == null ||
        ((e._1 ne sketch) && !java.util.Arrays.equals(e._1, sketch))) {
      e = (sketch, CountMinSketch.readFrom(sketch))
      last.set(e)
    }
    e._2.estimateCount(item.getBytes)
  }
}
