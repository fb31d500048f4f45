package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) write layout — the multi-column file-skipping
  * discipline (public: Morton 1966; Delta/Iceberg `OPTIMIZE ZORDER BY`).
  *
  * The range-sorted layout (SourceSinkSpec "range-sorted write") gives
  * perfect pruning on ONE key and none on any other: each file spans a
  * thin slice of the sort key but the FULL extent of every other column.
  * Interleaving the bits of two keys into one Morton value and
  * range-sorting on THAT tiles the (a, b) plane into near-square blocks,
  * so a selective predicate on EITHER column intersects only the files
  * whose block touches it — at 100 TB the difference between "prune on
  * the partition key only" and "prune on both lookup dimensions".
  *
  * The z-value is a pure fold of builtin bitwise expressions (shift /
  * and / or) — whole-stage-codegen'd, no UDF — and the write is
  * `repartitionByRange(z) + sortWithinPartitions(z)`: the ONLY exchange
  * is the range partitioner itself, identical to the single-key layout's
  * cost. Readers need no knowledge of the curve; pruning falls out of
  * the ordinary per-file column min/max statistics.
  */
object ZOrderLayout {

  /** Morton interleave of the low `bits` bits of two NON-NEGATIVE
    * integer columns: bit i of `a` lands at position 2i, bit i of `b`
    * at 2i+1. 2·bits <= 62 keeps the result a positive Long. */
  def zOrderKey(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` tiled by the Morton order of (a, b) into `numFiles`
    * parquet files at `dir`. One exchange (the range partitioner); the
    * helper column never reaches the files. */
  def writeZOrdered(df: DataFrame, a: Column, b: Column, bits: Int,
                    numFiles: Int, dir: String): Unit =
    df.withColumn("__z", zOrderKey(a, b, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
}

/** Small-file compaction (the lakehouse OPTIMIZE maintenance op,
  * public: Delta/Iceberg `OPTIMIZE`/`rewrite_data_files`): streaming
  * ingest and fine-grained upserts leave thousands of undersized files
  * per partition; every later scan then pays per-file open/footer/task
  * overhead that dwarfs the data read. Compaction rewrites a directory
  * into ~target-size files while PRESERVING the sort-derived layout
  * property the readers rely on (disjoint per-file key ranges →
  * min/max file skipping keeps working after the rewrite).
  *
  * One exchange (the range partitioner) — the same cost the original
  * sorted write paid. Output goes to a fresh directory: in production
  * the swap is a transaction-log commit (Delta/Iceberg) or an atomic
  * rename; rewriting in place would leave readers a torn directory. */
object Compaction {

  /** Rewrite the parquet at `srcDir` into `targetFiles` range-sorted
    * files at `dstDir`; returns the row count written (action runs the
    * job — callers assert it matches the source). */
  def compactRangeSorted(spark: org.apache.spark.sql.SparkSession,
                         srcDir: String, key: String, targetFiles: Int,
                         dstDir: String): Long = {
    val src = spark.read.parquet(srcDir)
    src.repartitionByRange(targetFiles, col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(dstDir)
    spark.read.parquet(dstDir).count()
  }
}
