package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType}

/** Hive-style hash bucketing for edge-list tables — the storage half of
  * the connector's STORAGE-PARTITIONED JOIN story (the reference's
  * pay-the-shuffle-once `aggregate` idiom, `mapreduce.cpp:382-536`,
  * made durable in the table layout):
  *
  *  - writes with `.option("bucketBy", "src").option("numBuckets", 8)`
  *    route every row to its bucket's file (`…-b<k>.txt`) and persist
  *    the spec as a `_graft_buckets` sidecar;
  *  - reads of a fully-bucketed table report [[org.apache.spark.sql.
  *    connector.read.partitioning.KeyGroupedPartitioning]] over
  *    `bucket(n, col)`, each chunk carrying its bucket id as the
  *    partition key;
  *  - [[EdgeListCatalog]] exposes the bucket function (FunctionCatalog),
  *    so Catalyst resolves both sides' transforms to the SAME function
  *    and plans a co-located sort-merge join with ZERO Exchange
  *    (`spark.sql.sources.v2.bucketing.enabled`) — at 100 TB the join's
  *    shuffle is paid once at write time, then never again.
  */
private[graft] object BucketHash {
  private def mix64(x: Long): Long = {
    var h = x
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  /** Murmur3 fmix64 finalizer, then a nonneg modulo — a full-avalanche
    * mix so sequential vertex ids spread across buckets (a raw `id % n`
    * would alias arithmetic progressions in the data onto few buckets).
    * This function IS the contract between the writer and the reported
    * partitioning: [[BoundBucket.produceResult]] delegates here. */
  def bucket(key: Long, n: Int): Int =
    (((mix64(key) % n) + n) % n).toInt

  /** Compound-key GRID cell (round 13): `bucket(k1, n) * n +
    * bucket(k2, n)` — the two keys hash independently and the pair
    * indexes an n×n grid. A grid (not a combined hash) because Spark's
    * SPJ machinery accepts only SINGLE-argument transforms
    * (`KeyGroupedPartitioning.isSupportedTransform` requires
    * `children.size == 1` — verified against the 4.1.2 bytecode), so a
    * compound layout must be expressed as TWO reported transforms
    * `[bucket(n, c1), bucket(n, c2)]` whose partition key is the pair
    * `(b1, b2)`; the cell is just the pair flattened for the file tag.
    * Bonus over a combined hash: a filter on EITHER column prunes its
    * grid dimension alone, and the per-dimension width-reduction
    * algebra ([[BoundBucket]]'s ReducibleFunction) composes per
    * transform unchanged. */
  def cell(k1: Long, k2: Long, n: Int): Int =
    bucket(k1, n) * n + bucket(k2, n)
}

/** The persisted bucket layout of a table: `_graft_buckets` sidecar
  * holding `<col> <numBuckets>[ sorted]`. Absent file = unbucketed
  * (every pre-existing table). The optional third token records that
  * EVERY committed data file is internally sorted ascending by the
  * bucket column — the `SORTED BY` half of the layout contract
  * (the reference's `sort_keys`, `mapreduce.cpp:2007-2054`, amortized
  * into the write): reads of such a table report per-partition
  * ordering ([[org.apache.spark.sql.connector.read.SupportsReportOrdering]])
  * and merge-read each bucket's files, so a storage-partitioned
  * sort-merge join plans with zero Exchange AND zero Sort. Tables
  * written before the flag existed read as unsorted — a weaker plan,
  * never a wrong one. */
private[graft] object BucketSpecIO {
  def file(root: java.io.File): java.io.File =
    new java.io.File(root, "_graft_buckets")

  /** Valid bucket-column spec: a single key (`src`/`dst`) or the
    * compound pair (`src,dst` / `dst,src` — order fixes which key
    * indexes the grid's rows). */
  def validCols(c: String): Boolean =
    Set("src", "dst", "src,dst", "dst,src").contains(c)

  /** File-tag universe of a layout: `n` buckets for a single key,
    * `n × n` grid cells for a compound one (numBuckets is PER KEY
    * COLUMN — a compound `numBuckets=8` lays out 64 cells; the grid's
    * two reported transforms each carry n=8). */
  def totalCells(spec: (String, Int)): Int =
    if (spec._1.contains(",")) spec._2 * spec._2 else spec._2

  def read(path: String): Option[(String, Int)] = {
    val f = file(new java.io.File(path))
    if (!f.isFile) None
    else new String(java.nio.file.Files.readAllBytes(f.toPath),
      StandardCharsets.UTF_8).trim.split("\\s+") match {
      case Array(col, n) if validCols(col) &&
          scala.util.Try(n.toInt).toOption.exists(_ >= 1) =>
        Some((col, n.toInt))
      case Array(col, n, "sorted") if validCols(col) &&
          scala.util.Try(n.toInt).toOption.exists(_ >= 1) =>
        Some((col, n.toInt))
      case other => throw new IllegalStateException(
        s"corrupt _graft_buckets sidecar in $path: '${other.mkString(" ")}'" +
          " (expected '<src|dst|src,dst|dst,src> <numBuckets>[ sorted]')")
    }
  }

  /** Whether the sidecar carries the sorted-layout flag. Reading it
    * never throws on a corrupt sidecar — [[read]] owns that error. */
  def sortedOf(path: String): Boolean = {
    val f = file(new java.io.File(path))
    f.isFile && {
      val t = new String(java.nio.file.Files.readAllBytes(f.toPath),
        StandardCharsets.UTF_8).trim.split("\\s+")
      t.length == 3 && t(2) == "sorted"
    }
  }

  def write(root: java.io.File, spec: (String, Int),
      sorted: Boolean = false): Unit = {
    java.nio.file.Files.write(file(root).toPath,
      (s"${spec._1} ${spec._2}" + (if (sorted) " sorted" else "") + "\n")
        .getBytes(StandardCharsets.UTF_8))
    ()
  }

  /** The bucket id a committed data file was written under (`…-b<k>.txt`
    * naming), None for an unbucketed file. A table reports key-grouped
    * partitioning only when EVERY planned file carries a tag — a later
    * unbucketed append or a compaction/zorder rewrite degrades the read
    * to unknown partitioning, never to a wrong plan. */
  private val Tagged = """.*-b(\d+)\.txt""".r
  def bucketOf(name: String): Option[Int] = name match {
    case Tagged(b) => Some(b.toInt)
    case _ => None
  }
}

/** The V2 bucket function the catalog serves (FunctionCatalog): what
  * lets Catalyst resolve a reported `bucket(n, col)` transform and
  * prove two scans share a layout (`TransformExpression` compatibility
  * is by the bound function's `canonicalName`). Signature follows the
  * V2 bucket-transform convention: (numBuckets INT, key BIGINT) → INT.
  *
  * Sizing: the key-grouped join runs ONE task per bucket, so the
  * bucket count is the join's parallelism ceiling — size it to the
  * intended cluster width (measured locally: 8 buckets on 32 cores
  * lost the exchange saving to idle cores; 32 buckets won 2.5× —
  * SCALING.md round-11 section). */
private[graft] object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, key): Hive-style hash bucket id of a BIGINT key"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.size == 2 &&
        inputType.fields(0).dataType == IntegerType &&
        inputType.fields(1).dataType == LongType,
      s"bucket expects (INT numBuckets, BIGINT key); got ${inputType.simpleString}")
    BoundBucket
  }
}

private[graft] object BoundBucket extends ScalarFunction[Integer]
    with org.apache.spark.sql.connector.catalog.functions.ReducibleFunction[Integer, Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Integer =
    BucketHash.bucket(input.getLong(1), input.getInt(0))

  /** COMPATIBLE-WIDTH storage-partitioned joins ([[org.apache.spark.sql
    * .connector.catalog.functions.ReducibleFunction]], gated by
    * `spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled`):
    * two tables bucketed at DIFFERENT counts still join with zero
    * shuffle when one count divides the other, because the hash is a
    * plain nonneg modulo of one mixed value — `bucket(k, n1) % n2 ==
    * bucket(k, n2)` whenever `n2 | n1` — so the wider side's partition
    * values REDUCE onto the narrower side's (Spark groups the wider
    * side's buckets, `b % n2`). At 100 TB this is the difference
    * between joining a table bucketed 1024-wide against one bucketed
    * 256-wide in place, and re-bucketing a petabyte to match widths.
    * Returns null when this side is the narrower one (Spark then asks
    * the other side) or the counts don't divide. */
  override def reducer(thisNumBuckets: Int,
      otherFunc: org.apache.spark.sql.connector.catalog.functions.ReducibleFunction[_, _],
      otherNumBuckets: Int)
      : org.apache.spark.sql.connector.catalog.functions.Reducer[Integer, Integer] =
    if ((otherFunc eq BoundBucket) && thisNumBuckets != otherNumBuckets &&
        otherNumBuckets > 0 && thisNumBuckets % otherNumBuckets == 0)
      BucketReducer(otherNumBuckets)
    else null
}

/** Maps a wide layout's bucket id onto a narrower compatible one:
  * ids are nonneg, so `b % n` IS the mathematical modulo the hash
  * uses. */
private[graft] final case class BucketReducer(n: Int)
    extends org.apache.spark.sql.connector.catalog.functions.Reducer[Integer, Integer] {
  override def reduce(b: Integer): Integer = Integer.valueOf(b.intValue() % n)
}
