package graft.render

import java.io.{ByteArrayOutputStream, DataOutputStream, FileOutputStream}
import java.util.zip.{CRC32, Deflater}

/** Minimal dependency-free truecolor PNG encoder (spec: RFC 2083). The render
  * sink is deliberately outside the query engine — it is the output format
  * adapter mirroring the reference's per-timestep PNG write
  * (`Gddp.scala:232-236`), not an operator.
  */
object Png {

  /** pixels: row-major 0xRRGGBB ints, length width*height. */
  def encode(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(pixels.length == width * height, "pixel buffer size mismatch")
    // raw scanlines: filter byte 0 + RGB triples
    val raw = new Array[Byte](height * (1 + width * 3))
    var i = 0
    var p = 0
    for (y <- 0 until height) {
      raw(p) = 0; p += 1
      var x = 0
      while (x < width) {
        val c = pixels(i); i += 1; x += 1
        raw(p) = ((c >> 16) & 0xff).toByte
        raw(p + 1) = ((c >> 8) & 0xff).toByte
        raw(p + 2) = (c & 0xff).toByte
        p += 3
      }
    }
    val deflater = new Deflater(Deflater.BEST_SPEED)
    deflater.setInput(raw); deflater.finish()
    val compressed = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) compressed.write(buf, 0, deflater.deflate(buf))
    deflater.end()

    val out = new ByteArrayOutputStream()
    val dos = new DataOutputStream(out)
    dos.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    val ihdr = new ByteArrayOutputStream()
    val ih = new DataOutputStream(ihdr)
    ih.writeInt(width); ih.writeInt(height)
    ih.writeByte(8); ih.writeByte(2) // bit depth 8, truecolor
    ih.writeByte(0); ih.writeByte(0); ih.writeByte(0)
    writeChunk(dos, "IHDR", ihdr.toByteArray)
    writeChunk(dos, "IDAT", compressed.toByteArray)
    writeChunk(dos, "IEND", Array.empty)
    out.toByteArray
  }

  private def writeChunk(dos: DataOutputStream, typ: String, data: Array[Byte]): Unit = {
    dos.writeInt(data.length)
    val t = typ.getBytes("US-ASCII")
    dos.write(t); dos.write(data)
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    dos.writeInt(crc.getValue.toInt)
  }

  def write(path: String, width: Int, height: Int, pixels: Array[Int]): Unit = {
    val fos = new FileOutputStream(path)
    try fos.write(encode(width, height, pixels)) finally fos.close()
  }
}
