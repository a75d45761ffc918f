package graft.multimodal

/** Minimal ISO-BMFF (MP4/MOV/M4A) container parser — pure JVM, no
  * codec. The JDK has no inter-frame video decoder, but the CONTAINER
  * structure a pipeline actually needs — duration, dimensions, track
  * layout (metadata), and the sample table mapping frames to byte
  * ranges ([[videoSamples]]) — is plain big-endian box structure,
  * readable without one. The sample table is what makes MJPEG frame
  * decode fully real (each sample is a JPEG; Media.MjpegFrameDecoder);
  * inter-frame codecs still need an external decoder behind the
  * VideoFrameDecoder seam.
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

  /** Both products of the single box-tree walk: container metadata
    * (None unless structurally valid with ftyp brand + moov/mvhd) and
    * the first video trak's sample table (None when absent/malformed —
    * needs only the structural walk, not the brand check). */
  final case class Parsed(meta: Option[Meta], video: Option[SampleTable])

  /** ONE walk of the ISO-BMFF box tree yielding metadata AND the video
    * sample table — callers that need both (Media.decodeVideo: mvhd
    * fields for features, stbl for frame decode) must not pay two
    * parses of the same moov/trak/stbl. */
  def parseAll(bytes: Array[Byte]): Parsed =
    try parseAllImpl(bytes)
    catch { case scala.util.control.NonFatal(_) => Parsed(None, None) }

  /** Parse container metadata; None unless the bytes are a
    * structurally-valid ISO-BMFF file with an ftyp and a moov/mvhd. */
  def parse(bytes: Array[Byte]): Option[Meta] = parseAll(bytes).meta

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

  /** The first video track's sample table: codec fourcc (from stsd)
    * plus each sample's absolute byte offset and size in the file
    * (stsz sizes laid into stco/co64 chunks by the stsc mapping).
    * This is what turns "container metadata" into FRAME ACCESS: a
    * sample of an MJPEG track is a complete JPEG image, so offsets +
    * sizes + a JDK ImageIO read = real frame decode with no external
    * codec (see Media.MjpegFrameDecoder). None on any structural
    * violation, absurd table size, or sample extent outside the
    * buffer — malformed payloads fall back, never fail a task. */
  final case class SampleTable(codec: String, offsets: Array[Long],
                               sizes: Array[Long])

  def videoSamples(bytes: Array[Byte]): Option[SampleTable] =
    parseAll(bytes).video

  /** stsz -> per-sample byte sizes (fixed-size or per-sample list). */
  private def sampleSizes(b: Array[Byte],
      stbl: List[(String, Int, Int)]): Option[Array[Long]] =
    find(stbl, "stsz").flatMap { case (_, s, e) =>
      if (e - s < 12) None
      else {
        val fixed = u32(b, s + 4)
        val n = u32(b, s + 8)
        if (n <= 0 || n > 1000000) None // absurd count: malformed
        else if (fixed != 0) Some(Array.fill(n.toInt)(fixed))
        else if (e - s < 12 + 4 * n) None
        else Some(Array.tabulate(n.toInt)(i => u32(b, s + 12 + 4 * i)))
      }
    }

  /** stco (u32) or co64 (u64) -> chunk start offsets. */
  private def chunkOffsets(b: Array[Byte],
      stbl: List[(String, Int, Int)]): Option[Array[Long]] = {
    def table(t: String, w: Int, rd: (Array[Byte], Int) => Long) =
      find(stbl, t).flatMap { case (_, s, e) =>
        if (e - s < 8) None
        else {
          val n = u32(b, s + 4)
          if (n <= 0 || n > 1000000 || e - s < 8 + w * n) None
          else Some(Array.tabulate(n.toInt)(i => rd(b, s + 8 + w * i)))
        }
      }
    table("stco", 4, u32).orElse(table("co64", 8, u64))
  }

  /** stsc -> samples-per-chunk for each 1-based chunk index, as the
    * (firstChunk, samplesPerChunk) run-length entries. */
  private def samplesPerChunk(b: Array[Byte],
      stbl: List[(String, Int, Int)]): Option[Array[(Long, Long)]] =
    find(stbl, "stsc").flatMap { case (_, s, e) =>
      if (e - s < 8) None
      else {
        val n = u32(b, s + 4)
        if (n <= 0 || n > 1000000 || e - s < 8 + 12 * n) None
        else Some(Array.tabulate(n.toInt)(i =>
          (u32(b, s + 8 + 12 * i), u32(b, s + 12 + 12 * i))))
      }
    }

  /** Walk chunks in order, filling each with its stsc-mapped sample
    * count, accumulating sizes into absolute offsets. None if the
    * tables disagree (samples left over after the last chunk) or any
    * sample extent escapes the buffer. */
  private def layOut(sizes: Array[Long], chunkOffs: Array[Long],
      spcRuns: Array[(Long, Long)], fileLen: Long): Option[Array[Long]] = {
    val offsets = new Array[Long](sizes.length)
    var s = 0
    var ci = 0
    // runs are ascending by firstChunk and chunks are visited in
    // order, so the run pointer advances MONOTONICALLY — never rescan
    // from 0 per chunk: a crafted file with ~1e6 chunks x ~1e6 runs
    // (both inside the sanity caps) would otherwise spin ~1e12
    // iterations in an executor task instead of falling back
    var r = 0
    var spc = 0L
    while (s < sizes.length && ci < chunkOffs.length) {
      val chunk1 = ci + 1L
      while (r < spcRuns.length && spcRuns(r)._1 <= chunk1) {
        spc = spcRuns(r)._2; r += 1
      }
      var off = chunkOffs(ci)
      var j = 0L
      while (j < spc && s < sizes.length) {
        if (off < 0 || off + sizes(s) > fileLen) return None
        offsets(s) = off
        off += sizes(s)
        s += 1; j += 1
      }
      ci += 1
    }
    if (s < sizes.length) None else Some(offsets)
  }

  private def parseAllImpl(b: Array[Byte]): Parsed = {
    if (b.length < 8) return Parsed(None, None)
    val top = boxes(b, 0, b.length)
    // require the signature box up front (offset 4 is "ftyp"): without
    // it any buffer whose first 8 bytes happen to look box-like would
    // "parse"
    if (top.headOption.forall(_._1 != "ftyp")) return Parsed(None, None)
    val ftyp = find(top, "ftyp").filter { case (_, s, e) => e - s >= 4 }
    val brand = ftyp.map { case (_, s, _) => fourcc(b, s) }
    // metadata additionally requires a sane major brand; the sample
    // table needs only the structural walk (a file missing/odd on
    // brand or mvhd can still carry a decodable video trak)
    val brandOk = b.length >= 16 && brand.exists(br =>
      FtypBrands.contains(br) || br.forall(c => c.isLetterOrDigit || c == ' '))

    find(top, "moov") match {
      case None => Parsed(None, None)
      case Some((_, ms, me)) =>
        val inMoov = boxes(b, ms, me)
        val traks = inMoov.filter(_._1 == "trak")
        var (nV, nA) = (0, 0)
        var (w, h) = (0.0, 0.0)
        var video: Option[SampleTable] = None
        traks.foreach { case (_, ts, te) =>
          val inTrak = boxes(b, ts, te)
          val inMdia = find(inTrak, "mdia")
            .map { case (_, mds, mde) => boxes(b, mds, mde) }
          val handler = for {
            bs <- inMdia
            (_, hds, hde) <- find(bs, "hdlr")
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
              // FIRST video trak whose sample table BUILDS, from the
              // SAME walk: a vide trak with a malformed/truncated stbl
              // yields None here and a later video trak's valid table
              // is taken instead (deliberate fall-through — a playable
              // track beats faithfully reporting the broken first one;
              // pinned by "malformed first video trak falls through"
              // in MultimodalSpec). Dimensions still come from the
              // first vide tkhd (w == 0 guard above), matching how
              // players report presentation size.
              if (video.isEmpty) video = for {
                bs <- inMdia
                (_, mis, mie) <- find(bs, "minf")
                (_, sbs, sbe) <- find(boxes(b, mis, mie), "stbl")
                stbl = boxes(b, sbs, sbe)
                (_, sds, sde) <- find(stbl, "stsd") if sde - sds >= 16
                sizes <- sampleSizes(b, stbl)
                chunkOffs <- chunkOffsets(b, stbl)
                spc <- samplesPerChunk(b, stbl)
                offsets <- layOut(sizes, chunkOffs, spc, b.length)
              } yield SampleTable(fourcc(b, sds + 12), offsets, sizes)
            case Some("soun") => nA += 1
            case _ => ()
          }
        }
        val meta =
          if (!brandOk) None
          else find(inMoov, "mvhd").map { case (_, hs, he) =>
            val ver = b(hs) & 0xFF
            // the branches are exclusive ON VERSION: a truncated v1 box
            // must NOT fall through to the v0 layout — offsets 12/16 sit
            // inside v1's 64-bit creation/modification times, so the v0
            // read would fabricate a garbage timescale/duration instead
            // of the honest (0, 0)
            val (timescale, duration) =
              if (ver == 1)
                if (he - hs >= 4 + 8 + 8 + 4 + 8) (u32(b, hs + 20), u64(b, hs + 24))
                else (0L, 0L)
              else if (he - hs >= 4 + 4 + 4 + 4 + 4)
                (u32(b, hs + 12), u32(b, hs + 16))
              else (0L, 0L)
            Meta(
              durationSec =
                if (timescale > 0) duration.toDouble / timescale else 0.0,
              timescale = timescale, nTracks = traks.size,
              nVideo = nV, nAudio = nA, width = w, height = h,
              majorBrand = brand.get)
          }
        Parsed(meta, video)
    }
  }
}
