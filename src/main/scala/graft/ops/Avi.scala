package graft.ops

/** MJPEG-in-AVI — a REAL video lane with zero native libraries: the AVI
  * container is plain RIFF (the same chunk grammar the WAV walker speaks)
  * and Motion-JPEG frames are ordinary baseline JPEGs, which [[Jpeg]]
  * already encodes and decodes to pixels.
  *
  * Writer emits a standards-shaped AVI 1.0: `hdrl` (avih + a `vids`/MJPG
  * stream header + BITMAPINFOHEADER), a `movi` list of `00dc` frame
  * chunks (word-aligned, every frame a keyframe — MJPEG has no
  * inter-frame state, which is also why the format parallel-decodes so
  * well), and an `idx1` index. Reader walks the `movi` list and decodes
  * each frame; malformed size fields terminate the walk (fuzz contract:
  * None/empty, never a throw or a spin).
  */
object Avi {

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Encode same-sized frames as an MJPEG AVI at `fps`. */
  def encode(frames: Seq[Png.Image], fps: Int = 10,
             quality: Int = 90): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    require(fps > 0, "fps must be positive")
    val w = frames.head.width
    val h = frames.head.height
    require(frames.forall(f => f.width == w && f.height == h),
      "all frames must share dimensions")
    val jpegs = frames.map(f => Jpeg.encode(f, quality)).toArray
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit =
      (0 to 3).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    def chunk(id: String, payload: Array[Byte]): Unit = {
      out.write(fourcc(id)); w32(payload.length.toLong)
      out.write(payload)
      if ((payload.length & 1) == 1) out.write(0) // word alignment
    }
    def sub(body: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      body(b)
      b.toByteArray
    }
    // ---- hdrl ----
    val usPerFrame = 1000000L / fps
    val avih = sub { b =>
      def b32(v: Long) = (0 to 3).foreach(i => b.write(((v >> (8 * i)) & 0xff).toInt))
      b32(usPerFrame); b32(0L); b32(0L); b32(0x10L /* HASINDEX */)
      b32(jpegs.length.toLong); b32(0L); b32(1L /* streams */)
      b32(jpegs.map(_.length).max.toLong); b32(w.toLong); b32(h.toLong)
      (1 to 4).foreach(_ => b32(0L))
    }
    val strh = sub { b =>
      def b32(v: Long) = (0 to 3).foreach(i => b.write(((v >> (8 * i)) & 0xff).toInt))
      b.write(fourcc("vids")); b.write(fourcc("MJPG"))
      b32(0L); b32(0L) // flags, priority+language
      b32(0L) // initial frames
      b32(1L); b32(fps.toLong) // scale, rate → fps
      b32(0L); b32(jpegs.length.toLong) // start, length
      b32(jpegs.map(_.length).max.toLong); b32(0xffffffffL /* quality */)
      b32(0L) // sample size
      b32(0L); b32((w.toLong & 0xffffL) | ((h.toLong & 0xffffL) << 16)) // rcFrame
    }
    val strf = sub { b =>
      def b16(v: Int) = { b.write(v & 0xff); b.write((v >> 8) & 0xff) }
      def b32(v: Long) = (0 to 3).foreach(i => b.write(((v >> (8 * i)) & 0xff).toInt))
      b32(40L); b32(w.toLong); b32(h.toLong)
      b16(1); b16(24)
      b.write(fourcc("MJPG"))
      b32(w.toLong * h * 3); b32(0L); b32(0L); b32(0L); b32(0L)
    }
    def list(listType: String, payload: Array[Byte]): Array[Byte] = sub { b =>
      b.write(fourcc("LIST"))
      val sz = payload.length + 4
      (0 to 3).foreach(i => b.write((sz >> (8 * i)) & 0xff))
      b.write(fourcc(listType)); b.write(payload)
    }
    val strl = list("strl", sub { b =>
      b.write(fourcc("strh"))
      (0 to 3).foreach(i => b.write((strh.length >> (8 * i)) & 0xff))
      b.write(strh)
      b.write(fourcc("strf"))
      (0 to 3).foreach(i => b.write((strf.length >> (8 * i)) & 0xff))
      b.write(strf)
    })
    val hdrl = list("hdrl", sub { b =>
      b.write(fourcc("avih"))
      (0 to 3).foreach(i => b.write((avih.length >> (8 * i)) & 0xff))
      b.write(avih)
      b.write(strl)
    })
    // ---- movi (+ frame offsets for idx1, relative to the movi fourcc) ----
    val offsets = new Array[Long](jpegs.length)
    val movi = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(fourcc("movi"))
      jpegs.zipWithIndex.foreach { case (j, i) =>
        // idx1 offsets count from the 'movi' fourcc, which is b's byte 0
        offsets(i) = b.size().toLong
        b.write(fourcc("00dc"))
        (0 to 3).foreach(k => b.write((j.length >> (8 * k)) & 0xff))
        b.write(j)
        if ((j.length & 1) == 1) b.write(0)
      }
      val payload = b.toByteArray
      val o = new java.io.ByteArrayOutputStream()
      o.write(fourcc("LIST"))
      (0 to 3).foreach(i => o.write((payload.length >> (8 * i)) & 0xff))
      o.write(payload)
      o.toByteArray
    }
    val idx1 = sub { b =>
      def b32(v: Long) = (0 to 3).foreach(i => b.write(((v >> (8 * i)) & 0xff).toInt))
      jpegs.zipWithIndex.foreach { case (j, i) =>
        b.write(fourcc("00dc")); b32(0x10L /* KEYFRAME */)
        b32(offsets(i)); b32(j.length.toLong)
      }
    }
    // ---- assemble RIFF ----
    val body = sub { b =>
      b.write(fourcc("AVI "))
      b.write(hdrl)
      b.write(movi)
      b.write(fourcc("idx1"))
      (0 to 3).foreach(i => b.write((idx1.length >> (8 * i)) & 0xff))
      b.write(idx1)
    }
    out.write(fourcc("RIFF")); w32(body.length.toLong); out.write(body)
    out.toByteArray
  }

  private def u8(bytes: Array[Byte], i: Int) = bytes(i) & 0xff
  private def ascii(bytes: Array[Byte], i: Int, n: Int) =
    if (i + n <= bytes.length) new String(bytes, i, n, "US-ASCII") else ""
  private def u32le(bytes: Array[Byte], i: Int): Long =
    u8(bytes, i).toLong | (u8(bytes, i + 1).toLong << 8) |
      (u8(bytes, i + 2).toLong << 16) | (u8(bytes, i + 3).toLong << 24)

  private def isAvi(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      ascii(bytes, 0, 4) == "RIFF" && ascii(bytes, 8, 4) == "AVI "

  /** Walk chunks in [from, to), calling `f(id, listType, payloadStart,
    * payloadEnd)`; listType is non-empty only for LIST chunks. Malformed
    * sizes end the walk. */
  private def walk(bytes: Array[Byte], from: Int, to: Int)
                  (f: (String, String, Int, Int) => Unit): Unit = {
    var i = from
    var ok = true
    while (ok && i + 8 <= to) {
      val id = ascii(bytes, i, 4)
      val sz = u32le(bytes, i + 4)
      if (sz < 0 || sz > to - i - 8) ok = false
      else {
        val start = i + 8
        val end = start + sz.toInt
        if (id == "LIST" && sz >= 4)
          f(id, ascii(bytes, start, 4), start + 4, end)
        else f(id, "", start, end)
        i = end + (sz.toInt & 1)
      }
    }
  }

  /** (width, height, nFrames, durationMs) from the `avih` header. */
  def headerMeta(bytes: Array[Byte]): Option[(Int, Int, Long, Long)] = {
    if (!isAvi(bytes)) return None
    var result: Option[(Int, Int, Long, Long)] = None
    walk(bytes, 12, bytes.length) { (id, lt, s, e) =>
      if (id == "LIST" && lt == "hdrl" && result.isEmpty)
        walk(bytes, s, e) { (id2, _, s2, e2) =>
          if (id2 == "avih" && e2 - s2 >= 40 && result.isEmpty) {
            val usPerFrame = u32le(bytes, s2)
            val totalFrames = u32le(bytes, s2 + 16)
            val w = u32le(bytes, s2 + 32).toInt
            val h = u32le(bytes, s2 + 36).toInt
            result = Some((w, h, totalFrames, totalFrames * usPerFrame / 1000L))
          }
        }
    }
    result
  }

  /** Raw frame payloads (the JPEG byte streams), without pixel decode. */
  def framePayloads(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (!isAvi(bytes)) return None
    val frames = Seq.newBuilder[Array[Byte]]
    var sawMovi = false
    walk(bytes, 12, bytes.length) { (id, lt, s, e) =>
      if (id == "LIST" && lt == "movi") {
        sawMovi = true
        walk(bytes, s, e) { (id2, _, s2, e2) =>
          // ##dc = compressed video, ##db = uncompressed; MJPEG uses dc
          if (id2.length == 4 && id2.endsWith("dc") && e2 > s2)
            frames += java.util.Arrays.copyOfRange(bytes, s2, e2)
        }
      }
    }
    if (sawMovi) Some(frames.result()) else None
  }

  def countFrames(bytes: Array[Byte]): Option[Int] =
    framePayloads(bytes).map(_.length)

  /** Decode every frame to pixels (frames that fail JPEG decode are
    * skipped — one corrupt frame must not sink the clip). */
  def decodeFrames(bytes: Array[Byte]): Option[Seq[Png.Image]] =
    framePayloads(bytes).map(_.flatMap(Jpeg.decode))

  /** Evenly sample ≤ `n` decoded frames (first frame always included). */
  def frameSample(bytes: Array[Byte], n: Int): Option[Seq[Png.Image]] =
    decodeFrames(bytes).map { frames =>
      if (frames.isEmpty || n <= 0) Seq.empty
      else if (frames.length <= n) frames
      else (0 until n).map(i => frames(i * frames.length / n))
    }
}
