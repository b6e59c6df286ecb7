package graft.multimodal

/** Minimal RIFF/WAVE PCM encoder (16-bit little-endian mono), written from
  * the public WAVE container layout — the audio twin of [[graft.render.Png]]:
  * fixtures encode with this, and the engine decodes them back through the
  * JDK's independent `javax.sound.sampled` codec, cross-validating both
  * implementations byte for byte.
  */
object Wav {
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16) // PCM fmt chunk is 16 bytes
    b.putShort(1).putShort(1) // audio format: PCM, channels: mono
    b.putInt(sampleRate).putInt(sampleRate * 2) // byte rate = rate × block align
    b.putShort(2).putShort(16) // block align, bits per sample
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(b.putShort)
    b.array()
  }
}
