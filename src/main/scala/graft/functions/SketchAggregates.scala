package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sketch aggregates as native TypedImperativeAggregates.
  *
  * Why: the expression-only formulation of minhash/simhash explodes each
  * shingle/token into 64 (doc, k, hash) rows before aggregating — a 64×
  * shuffle amplification. These aggregates keep the 64-slot sketch in a
  * fixed-size buffer updated in place, so the shuffle carries ONE array per
  * group (classic partial-aggregation sketch pattern, same shape as Spark's
  * own HyperLogLog++).
  *
  * Hash parity: `hashK` reproduces the SQL `xxhash64(s, k)` chain (seed 42 →
  * string → int k) bit-for-bit, so signatures equal the exploded
  * formulation's.
  */
object Sketches {

  /** The SQL `xxhash64(s, k)` two-argument chain. */
  private[functions] def hashK(s: UTF8String, k: Int): Long = {
    val h1 = XxHash64Function.hash(s, StringType, 42L)
    XxHash64Function.hash(k, IntegerType, h1)
  }

  /** MinHash signature of a group of strings: array of `numHashes` minima. */
  case class MinHashAgg(child: Expression, numHashes: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

    override def createAggregationBuffer(): Array[Long] =
      Array.fill(numHashes)(Long.MaxValue)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val s = v.asInstanceOf[UTF8String]
        var k = 0
        while (k < numHashes) {
          val h = hashK(s, k)
          if (h < buf(k)) buf(k) = h
          k += 1
        }
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(buf.length * 8)
      buf.foreach(bb.putLong)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      Array.fill(bytes.length / 8)(bb.getLong)
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override def prettyName: String = "minhash_agg"
    override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c.head)
  }

  /** 64-bit SimHash of a group of PRE-HASHED tokens (BIGINT input):
    * sign-sum of the hash bits, emitted as the packed long (bit b set iff
    * the sum for b is positive). The hash is an input, not computed here,
    * so callers can choose an engine-portable hash — [[graft.pipeline.Dedup]]
    * feeds the first 60 bits of the token md5 as a BIGINT, which DuckDB
    * reproduces bit-for-bit (`('0x'||substr(md5(tok),1,15))::BIGINT`),
    * making the whole simhash pair set oracle-replayable. The sketch shape
    * is unchanged: one 64-counter buffer per group through the shuffle.
    */
  case class SimHashAgg(child: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

    override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

    override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
      val v = child.eval(input)
      if (v != null) {
        val h = v.asInstanceOf[Long]
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) buf(b) += 1 else buf(b) -= 1
          b += 1
        }
      }
      buf
    }

    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < 64) { a(i) += b(i); i += 1 }
      a
    }

    override def eval(buf: Array[Int]): Any = {
      var out = 0L
      var b = 0
      while (b < 64) { if (buf(b) > 0) out |= (1L << b); b += 1 }
      out
    }

    override def serialize(buf: Array[Int]): Array[Byte] = {
      val bb = ByteBuffer.allocate(buf.length * 4)
      buf.foreach(bb.putInt)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Int] = {
      val bb = ByteBuffer.wrap(bytes)
      Array.fill(bytes.length / 4)(bb.getInt)
    }

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case LongType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"simhash_agg takes a pre-hashed BIGINT token, got ${other.simpleString}")
      }

    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override def prettyName: String = "simhash_agg"
    override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c.head)
  }

  /** The md5-60-bit value of raw bytes — BYTE-level parity with the SQL
    * expression `('0x' || substr(md5(x), 1, 15))::BIGINT`
    * ([[PortableHash.md5Bits60]]): first 15 hex chars = high 60 bits of
    * the digest = (first 8 bytes big-endian) >>> 4.
    */
  private[functions] def md5Bits60(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    ByteBuffer.wrap(d).getLong >>> 4
  }

  /** Count-min sketch over a group of strings: `depth`×`width` counters,
    * row `j` bucketing by the PORTABLE hash md5₆₀(s ++ ":" ++ j) % width —
    * so the sketch contents (and therefore every estimate read from it)
    * are bit-reproducible in any engine with md5, unlike Spark's built-in
    * CountMinSketchAgg (xxhash/Murmur — engine-private). Point estimate =
    * min over rows of the addressed counter (biased high, never low).
    *
    * Scale shape: the buffer is one fixed d×w long array per group
    * through the shuffle — partial aggregation merges by elementwise add,
    * the same pattern as HLL++/MinHash. Estimating the full term
    * dictionary against the one-row sketch is a broadcast cross join.
    */
  case class CountMinAgg(child: Expression, depth: Int, width: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
    require(depth >= 1 && width >= 1, "depth and width must be positive")

    override def createAggregationBuffer(): Array[Long] =
      new Array[Long](depth * width)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val s = v.asInstanceOf[UTF8String]
        var j = 0
        while (j < depth) {
          val keyed = s.toString + ":" + j
          val b = (md5Bits60(keyed.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            % width).toInt
          buf(j * width + b) += 1L
          j += 1
        }
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(buf.length * 8)
      buf.foreach(bb.putLong)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      Array.fill(bytes.length / 8)(bb.getLong)
    }

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"count_min_agg takes a STRING term, got ${other.simpleString}")
      }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override def prettyName: String = "count_min_agg"
    override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c.head)
  }

  /** PACKED HyperLogLog register vector builder for HyperBall: buffer =
    * `m` bytes, byte b = max rank seen for bucket b (0 = empty). Input:
    * (bucket, rank) longs. The packed form is what lets neighborhood
    * propagation carry ONE m-byte blob per vertex through the shuffle
    * instead of up to m (vertex, bucket, rank) rows — measured 4×
    * end-to-end on hyperball_nf at sf0.1.
    */
  case class HllRegBuildAgg(bucket: Expression, rank: Expression, m: Int,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

    override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val b = bucket.eval(input)
      val r = rank.eval(input)
      if (b != null && r != null) {
        val bi = b.asInstanceOf[Long].toInt
        val ri = r.asInstanceOf[Long].toByte
        // a caller-supplied bucket outside [0, m) (negative modulo, wrong
        // m) must not crash mid-aggregation — out-of-range rows are
        // skipped, matching the null-input contract above
        if (bi >= 0 && bi < m && ri > buf(bi)) buf(bi) = ri
      }
      buf
    }

    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def eval(buf: Array[Byte]): Any = buf
    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
    override def dataType: DataType = org.apache.spark.sql.types.BinaryType
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(bucket, rank)
    override def prettyName: String = "hll_reg_build_agg"
    override def withNewMutableAggBufferOffset(o: Int): HllRegBuildAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): HllRegBuildAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(bucket = c.head, rank = c(1))
  }

  /** Bytewise-max merge of packed register vectors ([[HllRegBuildAgg]]'s
    * output) — the HyperBall gather step's aggregate: max-merge is the
    * HLL union, associative/commutative/idempotent, so partial (map-side)
    * aggregation reduces every partition to ≤ |V| m-byte rows pre-shuffle.
    */
  case class HllRegMergeAgg(child: Expression, m: Int,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

    override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) {
        val in = v.asInstanceOf[Array[Byte]]
        var i = 0
        while (i < m) { if (in(i) > buf(i)) buf(i) = in(i); i += 1 }
      }
      buf
    }

    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def eval(buf: Array[Byte]): Any = buf
    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
    override def dataType: DataType = org.apache.spark.sql.types.BinaryType
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override def prettyName: String = "hll_reg_merge_agg"
    override def withNewMutableAggBufferOffset(o: Int): HllRegMergeAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): HllRegMergeAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c.head)
  }

  def count_min_agg(c: Column, depth: Int, width: Int): Column =
    Bridge.column(CountMinAgg(Bridge.expression(c), depth, width).toAggregateExpression())

  def minhash_agg(c: Column, numHashes: Int): Column =
    Bridge.column(MinHashAgg(Bridge.expression(c), numHashes).toAggregateExpression())

  def simhash_agg(c: Column): Column =
    Bridge.column(SimHashAgg(Bridge.expression(c)).toAggregateExpression())

  def hll_reg_build_agg(bucket: Column, rank: Column, m: Int): Column =
    Bridge.column(HllRegBuildAgg(Bridge.expression(bucket),
      Bridge.expression(rank), m).toAggregateExpression())

  def hll_reg_merge_agg(c: Column, m: Int): Column =
    Bridge.column(HllRegMergeAgg(Bridge.expression(c), m).toAggregateExpression())
}
