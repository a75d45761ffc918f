package graft.multimodal

/** Minimal ISO-BMFF (MP4/MOV/M4A) container-metadata parser — pure JVM,
  * no codec. The JDK has no video decoder, but the CONTAINER metadata a
  * pipeline actually filters on (duration, dimensions, track layout) is
  * plain big-endian box structure, readable without one. This closes
  * most of the "video is a stub" gap honestly: frame DECODE remains out
  * of scope (no JDK codec), frame-level features still come from the
  * deterministic ladder, but duration/width/height/track-counts are
  * real for real files.
  *
  * Box grammar (ISO/IEC 14496-12): `[size:u32][type:4cc]` with
  * `size==1` meaning a u64 largesize follows and `size==0` meaning
  * "to end of enclosing box". We walk top-level boxes for `moov`, then
  * inside it `mvhd` (timescale/duration) and each `trak`'s `tkhd`
  * (16.16 fixed-point width/height) + `mdia/hdlr` (handler 4cc:
  * `vide`/`soun`). Any structural violation — truncated box, absurd
  * size, missing moov — returns None and the caller falls back; a
  * malformed payload must never fail a Spark task (same posture as
  * image/audio decode, Media.scala).
  */
object Mp4 {

  final case class Meta(durationSec: Double, timescale: Long,
                        nTracks: Int, nVideo: Int, nAudio: Int,
                        width: Double, height: Double,
                        majorBrand: String)

  private val FtypBrands = Set("isom", "iso2", "iso4", "iso5", "iso6",
    "mp41", "mp42", "avc1", "qt  ", "M4A ", "M4V ", "3gp4", "3gp5",
    "dash", "heic", "mif1")

  /** Parse container metadata; None unless the bytes are a
    * structurally-valid ISO-BMFF file with an ftyp and a moov/mvhd. */
  def parse(bytes: Array[Byte]): Option[Meta] =
    try parseImpl(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)

  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** (type, payloadStart, boxEnd) for each box in [from, to);
    * stops (returns what it has) on a malformed header. */
  private def boxes(b: Array[Byte], from: Int, to: Int)
      : List[(String, Int, Int)] = {
    val out = List.newBuilder[(String, Int, Int)]
    var o = from
    var ok = true
    while (ok && o + 8 <= to) {
      val size32 = u32(b, o)
      val tpe = fourcc(b, o + 4)
      val (size, hdr) =
        if (size32 == 1L && o + 16 <= to) (u64(b, o + 8), 16)
        else if (size32 == 0L) ((to - o).toLong, 8)
        else (size32, 8)
      if (size < hdr || o + size > to) ok = false // truncated/absurd
      else {
        out += ((tpe, o + hdr, o + size.toInt))
        o += size.toInt
      }
    }
    out.result()
  }

  private def find(bs: List[(String, Int, Int)], t: String) =
    bs.find(_._1 == t)

  private def parseImpl(b: Array[Byte]): Option[Meta] = {
    if (b.length < 16) return None
    val top = boxes(b, 0, b.length)
    val ftyp = find(top, "ftyp").filter { case (_, s, e) => e - s >= 4 }
    val brand = ftyp.map { case (_, s, _) => fourcc(b, s) }
    // require the signature box up front (offset 4 is "ftyp"): without
    // it any buffer whose first 8 bytes happen to look box-like would
    // "parse"
    if (ftyp.isEmpty || top.head._1 != "ftyp") return None
    if (!brand.exists(br => FtypBrands.contains(br) ||
        br.forall(c => c.isLetterOrDigit || c == ' '))) return None

    find(top, "moov").flatMap { case (_, ms, me) =>
      val inMoov = boxes(b, ms, me)
      find(inMoov, "mvhd").map { case (_, hs, he) =>
        val ver = b(hs) & 0xFF
        // the branches are exclusive ON VERSION: a truncated v1 box
        // must NOT fall through to the v0 layout — offsets 12/16 sit
        // inside v1's 64-bit creation/modification times, so the v0
        // read would fabricate a garbage timescale/duration instead of
        // the honest (0, 0)
        val (timescale, duration) =
          if (ver == 1)
            if (he - hs >= 4 + 8 + 8 + 4 + 8) (u32(b, hs + 20), u64(b, hs + 24))
            else (0L, 0L)
          else if (he - hs >= 4 + 4 + 4 + 4 + 4)
            (u32(b, hs + 12), u32(b, hs + 16))
          else (0L, 0L)
        val traks = inMoov.filter(_._1 == "trak")
        var (nV, nA) = (0, 0)
        var (w, h) = (0.0, 0.0)
        traks.foreach { case (_, ts, te) =>
          val inTrak = boxes(b, ts, te)
          val handler = for {
            (_, mds, mde) <- find(inTrak, "mdia")
            (_, hds, hde) <- find(boxes(b, mds, mde), "hdlr")
            if hde - hds >= 12
          } yield fourcc(b, hds + 8)
          handler match {
            case Some("vide") =>
              nV += 1
              find(inTrak, "tkhd").foreach { case (_, ks, ke) =>
                val tv = b(ks) & 0xFF
                // fixed-point 16.16 width/height are the LAST 8 bytes
                // of tkhd in both versions
                if (ke - ks >= (if (tv == 1) 96 else 84) && w == 0.0) {
                  w = u32(b, ke - 8).toDouble / 65536.0
                  h = u32(b, ke - 4).toDouble / 65536.0
                }
              }
            case Some("soun") => nA += 1
            case _ => ()
          }
        }
        Meta(
          durationSec =
            if (timescale > 0) duration.toDouble / timescale else 0.0,
          timescale = timescale, nTracks = traks.size,
          nVideo = nV, nAudio = nA, width = w, height = h,
          majorBrand = brand.get)
      }
    }
  }
}
