package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Pure-JVM Apache Arrow IPC STREAM codec (the ML dataloader
  * interchange format — what `pyarrow.ipc.new_stream`/`open_stream`
  * speak, and the inner payload of Feather-V2 `.arrow` files).
  *
  * Both directions are hand frameworks from the public spec, the
  * Tar/TfRecord/Zip convention:
  *
  *  - the ENCAPSULATED MESSAGE framing: `0xFFFFFFFF` continuation,
  *    int32 LE metadata length, a FlatBuffer `Message`, 8-byte padding,
  *    then `bodyLength` bytes of buffer body; the stream ends with the
  *    `0xFFFFFFFF 0x00000000` end-of-stream marker;
  *  - a minimal FlatBuffers layer (vtables, tables, offset/scalar
  *    fields, vectors, unions) — a reader that walks vtable-indirected
  *    fields and a writer that emits them, no generated code;
  *  - the columnar layout per batch: validity bitmap + data for fixed
  *    types, validity + int32 offsets + bytes for Utf8/Binary.
  *
  * Supported logical types: Int64, Float64, Utf8, Binary (the
  * tabular-corpus core). Nulls READ correctly (validity bitmaps
  * honored); the writer emits non-null columns with empty validity
  * buffers, exactly like pyarrow on null-free data. Dictionaries,
  * compression, big-endian payloads and nested types are rejected
  * loudly, never misread. Cross-validated both directions against
  * pyarrow in SourcesSpec.
  *
  * A stream shard is non-splittable for this reader (batch boundaries
  * are only discoverable by walking messages), so it rides the
  * one-task-per-shard [[Sources]] core like the other containers; one
  * record batch in memory at a time.
  */
object ArrowIpc {

  private def bad(msg: String): Nothing = throw new IllegalArgumentException(s"arrow: $msg")

  // ---- flatbuffer reader -------------------------------------------------

  private final class Fb(val buf: Array[Byte]) {
    def u8(p: Int): Int = buf(p) & 0xff
    def i16(p: Int): Int = (u8(p) | (u8(p + 1) << 8)).toShort.toInt
    def i32(p: Int): Int = u8(p) | (u8(p + 1) << 8) | (u8(p + 2) << 16) | (u8(p + 3) << 24)
    def i64(p: Int): Long = (i32(p).toLong & 0xffffffffL) | (i32(p + 4).toLong << 32)
    def root: Int = i32(0)
    /** absolute position of field `id` within `table`, or -1 if absent */
    def fieldPos(table: Int, id: Int): Int = {
      val vt = table - i32(table)
      val vtSize = i16(vt)
      val slot = 4 + 2 * id
      if (slot >= vtSize) -1
      else {
        val off = i16(vt + slot)
        if (off == 0) -1 else table + off
      }
    }
    def i64Field(table: Int, id: Int, dflt: Long): Long = {
      val p = fieldPos(table, id); if (p < 0) dflt else i64(p)
    }
    def i32Field(table: Int, id: Int, dflt: Int): Int = {
      val p = fieldPos(table, id); if (p < 0) dflt else i32(p)
    }
    def i16Field(table: Int, id: Int, dflt: Int): Int = {
      val p = fieldPos(table, id); if (p < 0) dflt else i16(p)
    }
    def u8Field(table: Int, id: Int, dflt: Int): Int = {
      val p = fieldPos(table, id); if (p < 0) dflt else u8(p)
    }
    def boolField(table: Int, id: Int, dflt: Boolean): Boolean = {
      val p = fieldPos(table, id); if (p < 0) dflt else buf(p) != 0
    }
    /** follow an offset field to the absolute position of its target */
    def offField(table: Int, id: Int): Int = {
      val p = fieldPos(table, id); if (p < 0) -1 else p + i32(p)
    }
    def stringField(table: Int, id: Int): String = {
      val v = offField(table, id)
      if (v < 0) null else new String(buf, v + 4, i32(v), "UTF-8")
    }
    def vecLen(v: Int): Int = i32(v)
    def vecElems(v: Int): Int = v + 4
    /** absolute position of offset-vector element i's target table */
    def vecTable(v: Int, i: Int): Int = {
      val slot = vecElems(v) + 4 * i
      slot + i32(slot)
    }
  }

  // ---- flatbuffer writer -------------------------------------------------

  /** Minimal bottom-up FlatBuffers builder: grows BACKWARD from the end
    * of a scratch array (the format's natural direction — later writes
    * land EARLIER in the final forward buffer). All positions are
    * distances from the buffer END ("pos"); `finish` pads so the final
    * total length is 8-aligned, which makes every end-relative
    * alignment below hold absolutely (abs = L - pos). One vtable per
    * table, no dedup — these messages hold a handful of tables.
    */
  private final class FbBuilder(cap: Int = 1 << 16) {
    private var b = new Array[Byte](cap)
    private var head = cap // grows downward; data lives in [head, b.length)
    private def ensure(n: Int): Unit =
      while (head - n < 0) {
        val grown = new Array[Byte](b.length * 2)
        System.arraycopy(b, head, grown, b.length + head, b.length - head)
        head += b.length; b = grown
      }
    private def pos: Int = b.length - head
    private def pad(align: Int): Unit = while (pos % align != 0) put8(0)
    private def put8(v: Int): Unit = { ensure(1); head -= 1; b(head) = v.toByte }
    // writing backward, high byte first → forward order is little-endian
    private def put16(v: Int): Unit = { put8(v >> 8); put8(v) }
    private def put32(v: Int): Unit = { put16(v >> 16); put16(v) }
    private def put64(v: Long): Unit = { put32((v >> 32).toInt); put32(v.toInt) }
    private def putBytes(a: Array[Byte]): Unit = {
      ensure(a.length); head -= a.length
      System.arraycopy(a, 0, b, head, a.length)
    }
    private def writeI32At(abs: Int, v: Int): Unit = {
      b(abs) = v.toByte; b(abs + 1) = (v >> 8).toByte
      b(abs + 2) = (v >> 16).toByte; b(abs + 3) = (v >> 24).toByte
    }

    /** [int32 len][bytes][NUL], len 4-aligned; inter-object padding is
      * written FIRST so it lands after the NUL in forward memory. */
    def createString(s: String): Int = {
      val bytes = s.getBytes("UTF-8")
      val needed = pos + bytes.length + 1 + 4
      var padN = (4 - needed % 4) % 4
      while (padN > 0) { put8(0); padN -= 1 }
      put8(0)
      putBytes(bytes)
      put32(bytes.length)
      pos
    }

    /** [int32 count][int32 offsets...]; element i's value is the forward
      * distance from its own slot to the target. */
    def createOffsetVector(offsets: Seq[Int]): Int = {
      val needed = pos + 4 * (offsets.length + 1)
      var padN = (4 - needed % 4) % 4
      while (padN > 0) { put8(0); padN -= 1 }
      offsets.reverse.foreach { o => put32(pos + 4 - o) }
      put32(offsets.length)
      pos
    }

    /** [int32 count][structs...] with the struct DATA `align`-aligned
      * (the count word sits immediately before it). */
    def createStructVector(count: Int, structBytes: Array[Byte], align: Int): Int = {
      // data start (count pos - 4 from the vector head) must be aligned:
      // pos_after_structs ≡ 0 (mod align)
      var padN = (align - (pos + structBytes.length) % align) % align
      while (padN > 0) { put8(0); padN -= 1 }
      putBytes(structBytes)
      put32(count)
      pos
    }

    sealed trait Slot { def id: Int }
    final case class I8(id: Int, v: Int) extends Slot
    final case class I16S(id: Int, v: Int) extends Slot
    final case class I32S(id: Int, v: Int) extends Slot
    final case class I64S(id: Int, v: Long) extends Slot
    final case class BoolS(id: Int, v: Boolean) extends Slot
    final case class Off(id: Int, target: Int) extends Slot

    def createTable(slots: Seq[Slot]): Int = {
      val maxId = if (slots.isEmpty) -1 else slots.map(_.id).max
      val voffs = new Array[Int](math.max(0, maxId + 1)) // field START pos per id
      val vsizes = new Array[Int](math.max(0, maxId + 1))
      var refs: List[(Int, Int)] = Nil
      slots.sortBy(-_.id).foreach {
        case I8(id, v)    => put8(v); voffs(id) = pos; vsizes(id) = 1
        case BoolS(id, v) => put8(if (v) 1 else 0); voffs(id) = pos; vsizes(id) = 1
        case I16S(id, v)  => pad(2); put16(v); voffs(id) = pos; vsizes(id) = 2
        case I32S(id, v)  => pad(4); put32(v); voffs(id) = pos; vsizes(id) = 4
        case I64S(id, v)  => pad(8); put64(v); voffs(id) = pos; vsizes(id) = 8
        case Off(id, t)   => pad(4); put32(0); voffs(id) = pos; vsizes(id) = 4
                             refs ::= (pos, t)
      }
      pad(4)
      put32(0) // soffset placeholder
      val tablePos = pos
      refs.foreach { case (slotPos, target) =>
        // offset field value = forward distance slot → target
        writeI32At(b.length - slotPos, slotPos - target)
      }
      // table size: soffset word through the farthest inline field's end
      val tableSize =
        if (maxId < 0) 4
        else 4 + (0 to maxId).filter(voffs(_) != 0)
          .map(id => (tablePos - 4) - (voffs(id) - vsizes(id))).max
      val vtLen = 4 + 2 * (maxId + 1)
      (0 to maxId).reverse.foreach { id =>
        put16(if (voffs(id) == 0) 0 else tablePos - voffs(id))
      }
      put16(tableSize)
      put16(vtLen)
      val vtPos = pos
      // soffset: vtable_abs = table_abs - soffset; the vtable (written
      // later) sits EARLIER in forward memory, so soffset is positive
      writeI32At(b.length - tablePos, vtPos - tablePos)
      tablePos
    }

    /** finish with the root table: pad so the final length (including
      * this 4-byte root offset) is 8-aligned, making every end-relative
      * alignment absolute. */
    def finish(root: Int): Array[Byte] = {
      while ((pos + 4) % 8 != 0) put8(0)
      put32(pos + 4 - root)
      java.util.Arrays.copyOfRange(b, head, b.length)
    }
  }

  // ---- schema mapping ----------------------------------------------------

  private val TYPE_INT = 2
  private val TYPE_FLOAT = 3
  private val TYPE_BINARY = 4
  private val TYPE_UTF8 = 5
  private val TYPE_LIST = 12
  private val HEADER_SCHEMA = 1
  private val HEADER_RECORD_BATCH = 3

  private def arrowTypeOf(dt: DataType): (Int, String) = dt match {
    case LongType => (TYPE_INT, "int64")
    case DoubleType => (TYPE_FLOAT, "float64")
    case StringType => (TYPE_UTF8, "utf8")
    case BinaryType => (TYPE_BINARY, "binary")
    case ArrayType(FloatType, _) => (TYPE_LIST, "list<float32>")
    case other => bad(s"unsupported Spark type $other (supported: long, double, string, binary, array<float>)")
  }

  // ---- reader --------------------------------------------------------------

  private def readFully(in: java.io.InputStream, n: Int): Array[Byte] = {
    val a = new Array[Byte](n); var off = 0
    while (off < n) {
      val k = in.read(a, off, n - off)
      if (k < 0) bad(s"truncated stream (wanted $n bytes, got $off)")
      off += k
    }
    a
  }
  private def i32le(a: Array[Byte], p: Int): Int =
    (a(p) & 0xff) | ((a(p + 1) & 0xff) << 8) | ((a(p + 2) & 0xff) << 16) | ((a(p + 3) & 0xff) << 24)

  /** Walk an Arrow IPC stream, validating its schema against the
    * expected Spark `schema` (names + mapped types, order-exact), and
    * emit one [[Row]] per record-batch row. One batch in memory at a
    * time. Accepts a leading Feather-V2 file magic ("ARROW1\0\0") so
    * `.arrow` FILES read through the same walk (their footer is
    * tail-only metadata a stream reader never reaches — the walk stops
    * at the end-of-stream marker).
    */
  def readStream(in0: java.io.InputStream, schema: StructType): Iterator[Row] =
    new Iterator[Row] {
      private val in = new java.io.PushbackInputStream(in0, 8)
      private var schemaSeen = false
      private var batch: Array[Row] = null
      private var idx = 0
      private var done = false
      locally {
        // optional file magic
        val first = readFully(in, 8)
        if (!(first.take(6).sameElements("ARROW1".getBytes) && first(6) == 0 && first(7) == 0))
          in.unread(first)
      }
      private def nextMessage(): Option[(Fb, Array[Byte])] = {
        val cont = readFully(in, 4)
        if (i32le(cont, 0) != -1) bad("missing continuation marker (pre-0.15 streams unsupported)")
        val metaLen = i32le(readFully(in, 4), 0)
        if (metaLen == 0) return None // end-of-stream marker
        val meta = readFully(in, metaLen)
        val fb = new Fb(meta)
        val msg = fb.root
        val bodyLen = fb.i64Field(msg, 3, 0L)
        if (bodyLen > Int.MaxValue - 8) bad(s"body of $bodyLen bytes exceeds the single-buffer bound")
        val body = if (bodyLen == 0) Array.emptyByteArray else readFully(in, bodyLen.toInt)
        Some((fb, body))
      }
      private def checkSchema(fb: Fb, schemaTable: Int): Unit = {
        val endP = fb.fieldPos(schemaTable, 0)
        if (endP >= 0 && fb.i16(endP) == 1) bad("big-endian stream")
        val fieldsVec = fb.offField(schemaTable, 1)
        if (fieldsVec < 0) bad("schema without fields")
        val n = fb.vecLen(fieldsVec)
        if (n != schema.length)
          bad(s"schema arity $n != expected ${schema.length}")
        (0 until n).foreach { i =>
          val f = fb.vecTable(fieldsVec, i)
          val name = fb.stringField(f, 0)
          val want = schema(i)
          if (name != want.name) bad(s"field $i named '$name', expected '${want.name}'")
          val tt = fb.u8Field(f, 2, 0)
          val (wantTt, label) = arrowTypeOf(want.dataType)
          if (tt != wantTt) bad(s"field '$name' has arrow type id $tt, expected $label")
          if (tt == TYPE_INT) {
            val t = fb.offField(f, 3)
            if (t < 0) bad(s"field '$name': Int type table missing")
            if (fb.i32Field(t, 0, 0) != 64 || !fb.boolField(t, 1, false))
              bad(s"field '$name': only signed 64-bit ints supported")
          }
          if (tt == TYPE_FLOAT) {
            // FloatingPoint.precision is an int16 enum (DOUBLE = 2)
            val t = fb.offField(f, 3)
            if (t < 0) bad(s"field '$name': FloatingPoint type table missing")
            if (fb.i16Field(t, 0, 0) != 2) bad(s"field '$name': only float64 supported")
          }
          if (tt == TYPE_LIST) {
            val kids = fb.offField(f, 5)
            if (kids < 0 || fb.vecLen(kids) != 1) bad(s"list field '$name' needs exactly one child")
            val kid = fb.vecTable(kids, 0)
            val kidT = fb.offField(kid, 3)
            if (kidT < 0) bad(s"list field '$name': child type table missing")
            if (fb.u8Field(kid, 2, 0) != TYPE_FLOAT ||
                fb.i16Field(kidT, 0, 0) != 1)
              bad(s"list field '$name': only list<float32> supported")
          }
          if (fb.offField(f, 4) >= 0) bad(s"field '$name' is dictionary-encoded (unsupported)")
        }
      }
      private def decodeBatch(fb: Fb, rb: Int, body: Array[Byte]): Array[Row] = {
        if (fb.fieldPos(rb, 3) >= 0 && fb.offField(rb, 3) >= 0) bad("compressed record batch (unsupported)")
        val nRows = fb.i64Field(rb, 0, 0L).toInt
        val nodesVec = fb.offField(rb, 1)
        val bufsVec = fb.offField(rb, 2)
        if (nodesVec < 0 || bufsVec < 0) bad("record batch missing nodes/buffers")
        // nodes walk the schema tree pre-order: a list field carries its
        // child's node too
        val wantNodes = schema.length + schema.count(_.dataType.isInstanceOf[ArrayType])
        val nodes = fb.vecLen(nodesVec)
        if (nodes != wantNodes) bad(s"record batch has $nodes nodes, expected $wantNodes")
        var bufIdx = 0
        var nodeIdx = 0
        def buffer(): (Long, Long) = {
          val p = fb.vecElems(bufsVec) + 16 * bufIdx
          bufIdx += 1
          (fb.i64(p), fb.i64(p + 8))
        }
        def node(): (Long, Long) = {
          val p = fb.vecElems(nodesVec) + 16 * nodeIdx
          nodeIdx += 1
          (fb.i64(p), fb.i64(p + 8))
        }
        val cols = new Array[Array[Any]](schema.length)
        (0 until schema.length).foreach { ci =>
          val (_, nullCount) = node()
          val (voff, vlen) = buffer()
          def isNull(r: Int): Boolean =
            nullCount > 0 && vlen > 0 &&
              (body(voff.toInt + (r >> 3)) & (1 << (r & 7))) == 0
          val out = new Array[Any](nRows)
          schema(ci).dataType match {
            case LongType =>
              val (doff, _) = buffer()
              var r = 0
              while (r < nRows) {
                out(r) = if (isNull(r)) null
                  else java.lang.Long.valueOf(leI64(body, doff.toInt + 8 * r))
                r += 1
              }
            case DoubleType =>
              val (doff, _) = buffer()
              var r = 0
              while (r < nRows) {
                out(r) = if (isNull(r)) null
                  else java.lang.Double.valueOf(
                    java.lang.Double.longBitsToDouble(leI64(body, doff.toInt + 8 * r)))
                r += 1
              }
            case StringType | BinaryType =>
              val (ooff, _) = buffer()
              val (doff, _) = buffer()
              var r = 0
              while (r < nRows) {
                out(r) =
                  if (isNull(r)) null
                  else {
                    val s = i32le(body, ooff.toInt + 4 * r)
                    val e = i32le(body, ooff.toInt + 4 * (r + 1))
                    val bytes = java.util.Arrays.copyOfRange(body, doff.toInt + s, doff.toInt + e)
                    if (schema(ci).dataType == StringType) new String(bytes, "UTF-8") else bytes
                  }
                r += 1
              }
            case ArrayType(FloatType, _) =>
              val (ooff, _) = buffer()
              val (_, childNulls) = node()
              val (cvoff, cvlen) = buffer() // child validity
              if (childNulls > 0 && cvlen > 0) bad("null list ELEMENTS unsupported")
              val (doff, _) = buffer() // child float32 data
              var r = 0
              while (r < nRows) {
                out(r) =
                  if (isNull(r)) null
                  else {
                    val s0 = i32le(body, ooff.toInt + 4 * r)
                    val e0 = i32le(body, ooff.toInt + 4 * (r + 1))
                    val a = new Array[Float](e0 - s0)
                    var j = 0
                    while (j < a.length) {
                      a(j) = java.lang.Float.intBitsToFloat(
                        i32le(body, doff.toInt + 4 * (s0 + j)))
                      j += 1
                    }
                    a
                  }
                r += 1
              }
              // silence the unused warning for the child validity offset
              val _ = cvoff
            case other => bad(s"unsupported type $other")
          }
          cols(ci) = out
        }
        Array.tabulate(nRows)(r => Row.fromSeq(cols.map(_(r)).toSeq))
      }
      private def leI64(a: Array[Byte], p: Int): Long =
        (i32le(a, p).toLong & 0xffffffffL) | (i32le(a, p + 4).toLong << 32)
      private def fetch(): Unit = {
        while (!done && (batch == null || idx >= batch.length)) {
          nextMessage() match {
            case None => done = true
            case Some((fb, body)) =>
              val msg = fb.root
              val headerType = fb.u8Field(msg, 1, 0)
              val header = fb.offField(msg, 2)
              if (headerType == HEADER_SCHEMA) {
                if (schemaSeen) bad("duplicate schema message")
                checkSchema(fb, header)
                schemaSeen = true
              } else if (headerType == HEADER_RECORD_BATCH) {
                if (!schemaSeen) bad("record batch before schema")
                batch = decodeBatch(fb, header, body)
                idx = 0
              } else bad(s"unsupported message header type $headerType")
          }
        }
      }
      override def hasNext: Boolean = { fetch(); batch != null && idx < batch.length }
      override def next(): Row = {
        fetch()
        if (!hasNext) throw new NoSuchElementException
        val r = batch(idx); idx += 1; r
      }
    }

  // ---- writer --------------------------------------------------------------

  private def w32(out: java.io.OutputStream, v: Int): Unit = {
    out.write(v); out.write(v >> 8); out.write(v >> 16); out.write(v >> 24)
  }

  private def writeMessage(out: java.io.OutputStream, meta: Array[Byte],
                           body: Array[Byte]): Unit = {
    w32(out, -1)
    val metaPadded = (meta.length + 7) & ~7
    w32(out, metaPadded)
    out.write(meta)
    var i = meta.length
    while (i < metaPadded) { out.write(0); i += 1 }
    out.write(body)
    pad8Body(out, body.length)
  }
  private def pad8Body(out: java.io.OutputStream, n: Int): Unit = {
    var i = n
    while (i % 8 != 0) { out.write(0); i += 1 }
  }

  /** Build the Schema TABLE inside an in-progress flatbuffer — shared
    * by the stream's schema message and the file footer. */
  private def buildSchemaTable(fbb: FbBuilder, schema: StructType): Int = {
    val fieldTables = schema.fields.map { f =>
      val (tt, _) = arrowTypeOf(f.dataType)
      val typeTable = f.dataType match {
        case LongType => fbb.createTable(Seq(fbb.I32S(0, 64), fbb.BoolS(1, true)))
        case DoubleType => fbb.createTable(Seq(fbb.I16S(0, 2))) // precision: int16 enum, DOUBLE
        case _ => fbb.createTable(Seq.empty) // Utf8/Binary/List are empty tables
      }
      val children: Option[Int] = f.dataType match {
        case ArrayType(FloatType, _) =>
          val childType = fbb.createTable(Seq(fbb.I16S(0, 1))) // SINGLE precision
          val childName = fbb.createString("item")
          val child = fbb.createTable(Seq(
            fbb.Off(0, childName), fbb.BoolS(1, true),
            fbb.I8(2, TYPE_FLOAT), fbb.Off(3, childType)))
          Some(fbb.createOffsetVector(Seq(child)))
        case _ => None
      }
      val name = fbb.createString(f.name)
      fbb.createTable(Seq(
        fbb.Off(0, name), fbb.BoolS(1, f.nullable),
        fbb.I8(2, tt), fbb.Off(3, typeTable)) ++
        children.map(fbb.Off(5, _)).toSeq)
    }.toSeq
    val fieldsVec = fbb.createOffsetVector(fieldTables)
    fbb.createTable(Seq(fbb.Off(1, fieldsVec))) // endianness defaults LE
  }

  private def schemaMessage(schema: StructType): Array[Byte] = {
    val fbb = new FbBuilder()
    val schemaTable = buildSchemaTable(fbb, schema)
    val msg = fbb.createTable(Seq(
      fbb.I16S(0, 4), // MetadataVersion V5
      fbb.I8(1, HEADER_SCHEMA), fbb.Off(2, schemaTable), fbb.I64S(3, 0L)))
    fbb.finish(msg)
  }

  private def batchMessage(schema: StructType, rows: Seq[Row]): (Array[Byte], Array[Byte]) = {
    val n = rows.length
    val body = new java.io.ByteArrayOutputStream()
    val buffers = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val childLens = scala.collection.mutable.Map.empty[Int, Long]
    def addBuffer(bytes: Array[Byte]): Unit = {
      val off = body.size()
      buffers += ((off.toLong, bytes.length.toLong))
      body.write(bytes)
      pad8Body(body, bytes.length)
    }
    schema.fields.zipWithIndex.foreach { case (f, ci) =>
      addBuffer(Array.emptyByteArray) // validity: empty (no nulls written)
      f.dataType match {
        case LongType =>
          val bb = java.nio.ByteBuffer.allocate(8 * n).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          rows.foreach { r =>
            if (r.isNullAt(ci)) bad(s"null in column '${f.name}' (writer is non-null only)")
            bb.putLong(r.getLong(ci))
          }
          addBuffer(bb.array())
        case DoubleType =>
          val bb = java.nio.ByteBuffer.allocate(8 * n).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          rows.foreach { r =>
            if (r.isNullAt(ci)) bad(s"null in column '${f.name}' (writer is non-null only)")
            bb.putDouble(r.getDouble(ci))
          }
          addBuffer(bb.array())
        case StringType | BinaryType =>
          val datas = rows.map { r =>
            if (r.isNullAt(ci)) bad(s"null in column '${f.name}' (writer is non-null only)")
            f.dataType match {
              case StringType => r.getString(ci).getBytes("UTF-8")
              case _ => r.getAs[Array[Byte]](ci)
            }
          }
          val offs = java.nio.ByteBuffer.allocate(4 * (n + 1)).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          var acc = 0
          offs.putInt(0)
          datas.foreach { d => acc += d.length; offs.putInt(acc) }
          addBuffer(offs.array())
          val data = new java.io.ByteArrayOutputStream(acc)
          datas.foreach(data.write)
          addBuffer(data.toByteArray)
        case ArrayType(FloatType, _) =>
          val arrays = rows.map { r =>
            if (r.isNullAt(ci)) bad(s"null in column '${f.name}' (writer is non-null only)")
            r.getAs[scala.collection.Seq[Float]](ci)
          }
          val offs = java.nio.ByteBuffer.allocate(4 * (n + 1)).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          var acc = 0
          offs.putInt(0)
          arrays.foreach { a => acc += a.length; offs.putInt(acc) }
          addBuffer(offs.array())
          addBuffer(Array.emptyByteArray) // child validity (no elem nulls)
          val data = java.nio.ByteBuffer.allocate(4 * acc).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          arrays.foreach(_.foreach(data.putFloat))
          addBuffer(data.array())
          childLens(ci) = acc.toLong
        case other => bad(s"unsupported type $other")
      }
    }
    val fbb = new FbBuilder()
    // FieldNode structs: (length, null_count), pre-order over the schema
    // tree — a list field carries its child's node right after its own
    val nNodes = schema.length + childLens.size
    val nodeBytes = java.nio.ByteBuffer.allocate(16 * nNodes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    schema.fields.zipWithIndex.foreach { case (_, ci) =>
      nodeBytes.putLong(n.toLong); nodeBytes.putLong(0L)
      childLens.get(ci).foreach { cl => nodeBytes.putLong(cl); nodeBytes.putLong(0L) }
    }
    val bufBytes = java.nio.ByteBuffer.allocate(16 * buffers.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buffers.foreach { case (o, l) => bufBytes.putLong(o); bufBytes.putLong(l) }
    val nodesVec = fbb.createStructVector(nNodes, nodeBytes.array(), 8)
    val bufsVec = fbb.createStructVector(buffers.length, bufBytes.array(), 8)
    val rb = fbb.createTable(Seq(
      fbb.I64S(0, n.toLong), fbb.Off(1, nodesVec), fbb.Off(2, bufsVec)))
    val msg = fbb.createTable(Seq(
      fbb.I16S(0, 4),
      fbb.I8(1, HEADER_RECORD_BATCH), fbb.Off(2, rb),
      fbb.I64S(3, body.size().toLong)))
    (fbb.finish(msg), body.toByteArray)
  }

  /** Write rows as one Arrow IPC stream: schema message, record batches
    * of `batchRows`, end-of-stream marker. */
  def writeStream(out: java.io.OutputStream, schema: StructType,
                  rows: Iterator[Row], batchRows: Int = 1024): Unit = {
    writeMessage(out, schemaMessage(schema), Array.emptyByteArray)
    rows.grouped(batchRows).foreach { group =>
      val (meta, body) = batchMessage(schema, group)
      writeMessage(out, meta, body)
    }
    w32(out, -1); w32(out, 0) // end-of-stream
  }

  /** Write rows as a Feather-V2 Arrow FILE: the stream content wrapped
    * in "ARROW1" magic plus a Footer flatbuffer carrying the schema and
    * per-batch Block locations — what `pyarrow.ipc.open_file` memory-
    * maps for random batch access (cross-validated in SourcesSpec).
    * [[readStream]] reads these files too (it skips the magic and stops
    * at the end-of-stream marker; the footer is tail-only metadata).
    */
  def writeFile(out0: java.io.OutputStream, schema: StructType,
                rows: Iterator[Row], batchRows: Int = 1024): Unit = {
    val magic = "ARROW1".getBytes("UTF-8")
    var pos = 0L
    val out = new java.io.OutputStream {
      override def write(b: Int): Unit = { out0.write(b); pos += 1 }
      override def write(a: Array[Byte], off: Int, len: Int): Unit = {
        out0.write(a, off, len); pos += len
      }
    }
    out.write(magic); out.write(0); out.write(0) // 8-byte-aligned prologue
    writeMessage(out, schemaMessage(schema), Array.emptyByteArray)
    // Block: {offset: long, metaDataLength: int (framing incl. the
    // 8-byte prefix and padding), bodyLength: long (padded)} — offsets
    // are absolute from the file start
    val blocks = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
    rows.grouped(batchRows).foreach { group =>
      val (meta, body) = batchMessage(schema, group)
      val off = pos
      val metaPadded = (meta.length + 7) & ~7
      val bodyPadded = (body.length + 7L) & ~7L
      writeMessage(out, meta, body)
      blocks += ((off, 8 + metaPadded, bodyPadded))
    }
    w32(out, -1); w32(out, 0) // end-of-stream
    val fbb = new FbBuilder()
    val schemaTable = buildSchemaTable(fbb, schema)
    // Block structs are 24 bytes: long + int + 4 pad + long
    val blockBytes = java.nio.ByteBuffer.allocate(24 * blocks.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    blocks.foreach { case (o, m, b) =>
      blockBytes.putLong(o); blockBytes.putInt(m); blockBytes.putInt(0); blockBytes.putLong(b)
    }
    val dictVec = fbb.createStructVector(0, Array.emptyByteArray, 8)
    val rbVec = fbb.createStructVector(blocks.length, blockBytes.array(), 8)
    val footer = fbb.createTable(Seq(
      fbb.I16S(0, 4), fbb.Off(1, schemaTable),
      fbb.Off(2, dictVec), fbb.Off(3, rbVec)))
    val fbytes = fbb.finish(footer)
    out.write(fbytes)
    w32(out, fbytes.length)
    out.write(magic)
  }
}
