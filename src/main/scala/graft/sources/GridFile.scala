package graft.sources

import java.io.{DataInputStream, DataOutputStream, FileInputStream, FileOutputStream, RandomAccessFile}
import java.nio.ByteBuffer

/** Minimal binary grid-file codec — the file-format boundary of the domain
  * layer. Mirrors the structure the reference reads from NetCDF: a dense
  * `[time, y, x]` cube for one variable plus the coordinate/fill metadata
  * needed to interpret it (`Gddp.scala:118-131` opens the file and reads
  * attributes; `Gddp.scala:224-226` reads a `[t, ymin..ymax, xmin..xmax]`
  * section). The layout is offset-addressable so a hyperslab read seeks —
  * it never streams the whole file:
  *
  *   magic "GRF1" | varNameLen:int varName:utf8 | T:int Y:int X:int
  *   | epochMicros:long stepMicros:long
  *   | lat0:double dlat:double lon0:double dlon:double fill:double
  *   | T*Y*X big-endian doubles, row-major [t][y][x]
  *
  * NODATA is stored as `fill` (NaN by convention) and surfaced as SQL NULL by
  * the reader — the reference's `_FillValue` contract.
  */
object GridFile {
  val Magic: Int = 0x47524631 // "GRF1"

  final case class Header(
    variable: String, t: Int, y: Int, x: Int,
    epochMicros: Long, stepMicros: Long,
    lat0: Double, dlat: Double, lon0: Double, dlon: Double,
    fill: Double, dataOffset: Long) {
    def isFill(v: Double): Boolean = if (fill.isNaN) v.isNaN else v == fill
  }

  /** Write one variable's cube; `value(t, y, x) = None` stores the fill. */
  def write(path: String, variable: String, tDim: Int, yDim: Int, xDim: Int,
      epochMicros: Long, stepMicros: Long,
      lat0: Double, dlat: Double, lon0: Double, dlon: Double,
      fill: Double = Double.NaN)(value: (Int, Int, Int) => Option[Double]): Unit = {
    val out = new DataOutputStream(new java.io.BufferedOutputStream(new FileOutputStream(path)))
    try {
      out.writeInt(Magic)
      val name = variable.getBytes("UTF-8")
      out.writeInt(name.length); out.write(name)
      out.writeInt(tDim); out.writeInt(yDim); out.writeInt(xDim)
      out.writeLong(epochMicros); out.writeLong(stepMicros)
      out.writeDouble(lat0); out.writeDouble(dlat)
      out.writeDouble(lon0); out.writeDouble(dlon)
      out.writeDouble(fill)
      for (t <- 0 until tDim; y <- 0 until yDim; x <- 0 until xDim)
        out.writeDouble(value(t, y, x).getOrElse(fill))
    } finally out.close()
  }

  /** Header-only read — the metadata open (`Gddp.scala:118-131`). */
  def readHeader(path: String): Header = {
    val in = new DataInputStream(new FileInputStream(path))
    try {
      require(in.readInt() == Magic, s"$path: not a GRF1 file")
      val name = new Array[Byte](in.readInt()); in.readFully(name)
      val (t, y, x) = (in.readInt(), in.readInt(), in.readInt())
      val (epoch, step) = (in.readLong(), in.readLong())
      val (lat0, dlat, lon0, dlon, fill) =
        (in.readDouble(), in.readDouble(), in.readDouble(), in.readDouble(), in.readDouble())
      val dataOffset = 4 + 4 + name.length + 3 * 4 + 2 * 8 + 5 * 8
      Header(new String(name, "UTF-8"), t, y, x, epoch, step, lat0, dlat, lon0, dlon,
        fill, dataOffset.toLong)
    } finally in.close()
  }

  /** Random-access section reader: one seek + one contiguous read per
    * `[t, y, x0..x1]` row — the byte-level hyperslab (`Gddp.scala:224-226`).
    */
  final class SectionReader(path: String, val header: Header) extends AutoCloseable {
    private val raf = new RandomAccessFile(path, "r")

    def readRow(t: Int, y: Int, x0: Int, x1: Int): Array[Double] = {
      val n = x1 - x0 + 1
      val buf = new Array[Byte](n * 8)
      raf.seek(header.dataOffset +
        ((t.toLong * header.y + y) * header.x + x0) * 8L)
      raf.readFully(buf)
      val out = new Array[Double](n)
      ByteBuffer.wrap(buf).asDoubleBuffer().get(out)
      out
    }

    override def close(): Unit = raf.close()
  }
}
