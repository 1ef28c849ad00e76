package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded EXACT duplicate-cluster sketch over (digest, id) rows — the
  * aggregate that lets the exact-dup pre-collapse index ride an
  * existing job (the signature barrier write, via `Dataset.observe`)
  * instead of costing its own scan + shuffle + barrier.
  *
  * Semantics: an in-memory map digest → sorted member-id list. If the
  * whole input fits under the caps, the merged result is EXACT: every
  * digest with ≥ 2 members is emitted as struct(dg, rep = min id,
  * ids). If ANY task or merge exceeds `digestCap` distinct digests or
  * `idCap` stored ids, the result is NULL ("don't know") and the
  * caller falls back to the distributed aggregate — so the sketch can
  * be wrong in availability, never in content. The caps bound every
  * task buffer, the per-task metric payload, and the driver-side
  * merge, which is what makes an observed metric safe at 100 TB: a
  * big corpus overflows a few bytes per task, it does not ship its
  * digest table to the driver.
  *
  * This is the same mergeable-bounded-sketch contract as
  * `DataFrameStatFunctions.bloomFilter` or HLL, with exactness below
  * the cap instead of an error bound.
  */
case class DupClusterSketch(
    dgExpr: Expression, idExpr: Expression,
    digestCap: Int = DupSketchBuffer.DefaultDigestCap,
    idCap: Int = DupSketchBuffer.DefaultIdCap,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[DupSketchBuffer]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression]
  with ExpectsInputTypes {

  override def left: Expression = dgExpr
  override def right: Expression = idExpr
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, LongType)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("dg", StringType, nullable = false),
      StructField("rep", LongType, nullable = false),
      StructField("ids", ArrayType(LongType, containsNull = false),
        nullable = false))),
    containsNull = false)
  // null result = overflow ("don't know"); empty array = no dups
  override def nullable: Boolean = true

  override def createAggregationBuffer(): DupSketchBuffer =
    new DupSketchBuffer(digestCap, idCap)

  override def update(buf: DupSketchBuffer, input: InternalRow): DupSketchBuffer = {
    val dg = dgExpr.eval(input)
    val id = idExpr.eval(input)
    // null digests (null text) carry no dedup signal — skip, matching
    // the distributed aggregate where groupBy(dg) puts them in a null
    // group the CollapseThreshold filter never selects as content
    if (dg != null && id != null)
      buf.add(dg.asInstanceOf[UTF8String], id.asInstanceOf[Long])
    buf
  }

  override def merge(b1: DupSketchBuffer, b2: DupSketchBuffer): DupSketchBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buf: DupSketchBuffer): Any = {
    if (buf.overflowed) return null
    import scala.jdk.CollectionConverters._
    val dups = buf.map.entrySet().asScala.toArray
      .filter(_.getValue.size > 1)
      .sortBy(_.getKey.toString)
    new GenericArrayData(dups.map { e =>
      val ids = e.getValue.sorted().toArray
      new GenericInternalRow(Array[Any](
        e.getKey, ids.min, new GenericArrayData(ids)))
    }.toArray[Any])
  }

  override def serialize(buf: DupSketchBuffer): Array[Byte] = buf.serialized()
  override def deserialize(bytes: Array[Byte]): DupSketchBuffer =
    DupSketchBuffer.deserialize(digestCap, idCap, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): DupClusterSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DupClusterSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DupClusterSketch =
    copy(dgExpr = newLeft, idExpr = newRight)
}

/** Growable long list (no boxing). */
final class LongList {
  private[graft] var arr = new Array[Long](2)
  private[graft] var size = 0
  def add(v: Long): Unit = {
    if (size == arr.length) {
      val n = new Array[Long](arr.length * 2)
      System.arraycopy(arr, 0, n, 0, size); arr = n
    }
    arr(size) = v; size += 1
  }
  def sorted(): Array[Long] = {
    val out = java.util.Arrays.copyOf(arr, size)
    java.util.Arrays.sort(out)
    out
  }
  def foreach(f: Long => Unit): Unit = {
    var i = 0
    while (i < size) { f(arr(i)); i += 1 }
  }
}

final class DupSketchBuffer(val digestCap: Int, val idCap: Int) {
  var overflowed = false
  var idCount = 0
  val map = new java.util.HashMap[UTF8String, LongList]()

  def add(dg: UTF8String, id: Long): Unit = {
    if (overflowed) return
    if (idCount >= idCap) { overflow(); return }
    var l = map.get(dg)
    if (l == null) {
      if (map.size() >= digestCap) { overflow(); return }
      l = new LongList()
      // UTF8String from an unsafe row buffer may be transient — copy
      map.put(dg.clone(), l)
    }
    l.add(id)
    idCount += 1
  }

  private def overflow(): Unit = {
    overflowed = true
    map.clear() // free eagerly; content is dead once unknown
    idCount = 0
  }

  def mergeFrom(other: DupSketchBuffer): Unit = {
    if (overflowed) return
    if (other.overflowed) { overflow(); return }
    import scala.jdk.CollectionConverters._
    for (e <- other.map.entrySet().asScala) {
      if (overflowed) return
      val dg = e.getKey
      e.getValue.foreach { id => if (!overflowed) add(dg, id) }
    }
  }

  def serialized(): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBoolean(overflowed)
    if (!overflowed) {
      out.writeInt(map.size())
      import scala.jdk.CollectionConverters._
      for (e <- map.entrySet().asScala) {
        val b = e.getKey.getBytes
        out.writeInt(b.length)
        out.write(b)
        out.writeInt(e.getValue.size)
        e.getValue.foreach(out.writeLong)
      }
    }
    out.flush()
    bos.toByteArray
  }
}

object DupSketchBuffer {
  /** Caps sized so a full buffer is ~100 MB transient on the driver
    * merge — far above any gate corpus (sf0.1 has 5.5k distinct
    * contents; the 10× ScaleGen corpus 55k) and far below anything a
    * 100 TB corpus would hit before overflowing per task.
    */
  val DefaultDigestCap = 2000000
  val DefaultIdCap = 2000000

  def deserialize(digestCap: Int, idCap: Int,
      bytes: Array[Byte]): DupSketchBuffer = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val buf = new DupSketchBuffer(digestCap, idCap)
    if (in.readBoolean()) {
      buf.overflowed = true
    } else {
      val n = in.readInt()
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val b = new Array[Byte](len)
        in.readFully(b)
        val dg = UTF8String.fromBytes(b)
        val m = in.readInt()
        var j = 0
        while (j < m) { buf.add(dg, in.readLong()); j += 1 }
        i += 1
      }
    }
    buf
  }
}
