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

  private type Buf = java.io.ByteArrayOutputStream
  private def le16(b: Buf, v: Int): Unit = { b.write(v & 0xff); b.write((v >> 8) & 0xff) }
  private def le32(b: Buf, v: Long): Unit =
    (0 to 3).foreach(i => b.write(((v >> (8 * i)) & 0xff).toInt))
  private def sub(body: Buf => Unit): Array[Byte] = {
    val b = new Buf()
    body(b)
    b.toByteArray
  }
  private def chunkBytes(id: String, payload: Array[Byte]): Array[Byte] = sub { b =>
    b.write(fourcc(id)); le32(b, payload.length.toLong)
    b.write(payload)
    if ((payload.length & 1) == 1) b.write(0) // word alignment
  }
  private def listBytes(listType: String, payload: Array[Byte]): Array[Byte] =
    sub { b =>
      b.write(fourcc("LIST")); le32(b, payload.length.toLong + 4)
      b.write(fourcc(listType)); b.write(payload)
    }

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
    val maxJpeg = jpegs.map(_.length).max.toLong
    // ---- hdrl ----
    val usPerFrame = 1000000L / fps
    val avih = sub { b =>
      le32(b, usPerFrame); le32(b, 0L); le32(b, 0L); le32(b, 0x10L /* HASINDEX */)
      le32(b, jpegs.length.toLong); le32(b, 0L); le32(b, 1L /* streams */)
      le32(b, maxJpeg); le32(b, w.toLong); le32(b, h.toLong)
      (1 to 4).foreach(_ => le32(b, 0L))
    }
    val strh = sub { b =>
      b.write(fourcc("vids")); b.write(fourcc("MJPG"))
      le32(b, 0L); le32(b, 0L) // flags, priority+language
      le32(b, 0L) // initial frames
      le32(b, 1L); le32(b, fps.toLong) // scale, rate → fps
      le32(b, 0L); le32(b, jpegs.length.toLong) // start, length
      le32(b, maxJpeg); le32(b, 0xffffffffL /* quality */)
      le32(b, 0L) // sample size
      le32(b, 0L)
      le32(b, (w.toLong & 0xffffL) | ((h.toLong & 0xffffL) << 16)) // rcFrame
    }
    val strf = sub { b =>
      le32(b, 40L); le32(b, w.toLong); le32(b, h.toLong)
      le16(b, 1); le16(b, 24)
      b.write(fourcc("MJPG"))
      le32(b, w.toLong * h * 3); le32(b, 0L); le32(b, 0L); le32(b, 0L); le32(b, 0L)
    }
    val hdrl = listBytes("hdrl",
      chunkBytes("avih", avih) ++
        listBytes("strl", chunkBytes("strh", strh) ++ chunkBytes("strf", strf)))
    // ---- movi (+ frame offsets for idx1, relative to the movi fourcc) ----
    val offsets = new Array[Long](jpegs.length)
    val moviPayload = sub { b =>
      b.write(fourcc("movi"))
      jpegs.zipWithIndex.foreach { case (j, i) =>
        // idx1 offsets count from the 'movi' fourcc, which is b's byte 0
        offsets(i) = b.size().toLong
        b.write(chunkBytes("00dc", j))
      }
    }
    // moviPayload already leads with its 'movi' listType fourcc
    val movi = sub { b =>
      b.write(fourcc("LIST")); le32(b, moviPayload.length.toLong)
      b.write(moviPayload)
    }
    val idx1 = sub { b =>
      jpegs.zipWithIndex.foreach { case (j, i) =>
        b.write(fourcc("00dc")); le32(b, 0x10L /* KEYFRAME */)
        le32(b, offsets(i)); le32(b, j.length.toLong)
      }
    }
    // ---- assemble RIFF ----
    val body = sub { b =>
      b.write(fourcc("AVI "))
      b.write(hdrl)
      b.write(movi)
      b.write(chunkBytes("idx1", idx1))
    }
    sub { b =>
      b.write(fourcc("RIFF")); le32(b, body.length.toLong); b.write(body)
    }
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
            // both fields are untrusted u32s: the product can overflow a
            // Long on crafted headers — clamp instead of going negative
            val durMs =
              if (totalFrames > 0 && usPerFrame > Long.MaxValue / totalFrames)
                Long.MaxValue / 1000L
              else totalFrames * usPerFrame / 1000L
            result = Some((w, h, totalFrames, durMs))
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

  /** Source frame rate from the avih header (rounded), if sane. */
  def fps(bytes: Array[Byte]): Option[Int] = {
    if (!isAvi(bytes)) return None
    var result: Option[Int] = None
    walk(bytes, 12, bytes.length) { (id, lt, s, e) =>
      if (id == "LIST" && lt == "hdrl" && result.isEmpty)
        walk(bytes, s, e) { (id2, _, s2, e2) =>
          if (id2 == "avih" && e2 - s2 >= 4 && result.isEmpty) {
            val usPerFrame = u32le(bytes, s2)
            if (usPerFrame > 0 && usPerFrame <= 10000000L)
              result = Some(math.max(1,
                math.round(1000000.0 / usPerFrame).toInt))
          }
        }
    }
    result
  }

  /** Evenly sample ≤ `n` decoded frames (first frame always included). */
  def frameSample(bytes: Array[Byte], n: Int): Option[Seq[Png.Image]] =
    decodeFrames(bytes).map { frames =>
      if (frames.isEmpty || n <= 0) Seq.empty
      else if (frames.length <= n) frames
      else (0 until n).map(i => frames(i * frames.length / n))
    }
}
