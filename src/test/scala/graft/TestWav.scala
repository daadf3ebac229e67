package graft

/** Shared WAV fixture builder for the audio specs: mono 16-bit PCM
  * whose amplitude is constant within each of 65 equal windows and
  * follows `pattern` across windows — the shape
  * `Multimodal.audioFingerprint` hashes. One definition so the RIFF
  * header layout can never drift between specs. */
object TestWav {
  def envWav(pattern: Int => Int, gain: Int, n: Int = 6500,
             rate: Int = 8000): Array[Byte] = {
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    // clamp the window divisor so n < 65 still builds a STRUCTURALLY
    // valid WAV (correct data-chunk size) — the short-clip fixtures
    // exercise audioFingerprint's frames<65 None branch, which only
    // fires when the parser accepts the payload
    val win = math.max(1, n / 65)
    (0 until n).foreach { i =>
      val a = gain * pattern(i / win)
      bb.putShort((if (i % 2 == 0) a else -a).toShort)
    }
    bb.array()
  }
}
