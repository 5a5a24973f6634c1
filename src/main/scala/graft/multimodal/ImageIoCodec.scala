package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** REAL image codec over the JDK's built-in `javax.imageio` readers
  * (PNG/BMP/GIF/JPEG/WBMP — no external libraries), satisfying the same
  * contract [[Multimodal.FakeCodec]] stubs for the formats the JDK cannot
  * read. Pure-JVM and headless-safe: decode and Graphics2D drawing on a
  * BufferedImage never touch a display.
  */
object ImageIoCodec {

  /** Formats the JDK decodes out of the box (lower-cased `meta.format`). */
  val formats: Set[String] = Set("png", "bmp", "gif", "jpg", "jpeg", "wbmp")

  def handles(format: String): Boolean =
    format != null && formats.contains(format.toLowerCase)

  private def decode(bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "bytes are not a decodable image")
    img
  }

  /** Real decode → feature vector: dim-bin normalized grayscale histogram
    * (bins sum to 1), a standard cheap image descriptor. Deterministic for
    * identical pixel content regardless of container encoding. */
  def features(bytes: Array[Byte], dim: Int): Array[Float] = {
    require(dim > 0)
    val img = decode(bytes)
    val hist = new Array[Float](dim)
    val (w, h) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val gray = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        hist(gray * dim / 256) += 1f
        x += 1
      }
      y += 1
    }
    val n = (w * h).toFloat
    var j = 0
    while (j < dim) { hist(j) /= n; j += 1 }
    hist
  }

  /** Real resize: redraw into a w×h canvas with bilinear interpolation and
    * re-encode as PNG (lossless, so resized output is itself decodable by
    * this codec). */
  def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0)
    val src = decode(bytes)
    val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, w, h, null)
    } finally g.dispose()
    val out = new ByteArrayOutputStream()
    ImageIO.write(dst, "png", out)
    out.toByteArray
  }

  /** Encode a BufferedImage as PNG bytes (test/fixture helper). */
  def toPng(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  // ───── perceptual hashing (aHash / dHash) ────────────────────────────
  //
  // Pure integer average-pooling — deliberately NOT Graphics2D resize:
  // rendering-hint interpolation is an implementation detail of the JDK's
  // raster pipeline, while integer cell sums are bit-deterministic on any
  // JVM, which is what a dedup fingerprint must be. Cell (i,j) covers the
  // half-open pixel box [i·w/gw, (i+1)·w/gw) × [j·h/gh, (j+1)·h/gh)
  // (bounds forced non-empty, so images smaller than the grid still hash).

  private def grayGrid(img: BufferedImage, gw: Int, gh: Int): Array[Long] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val g = new Array[Long](gw * gh)
    var j = 0
    while (j < gh) {
      val y0 = j * h / gh
      val y1 = math.max(y0 + 1, (j + 1) * h / gh)
      var i = 0
      while (i < gw) {
        val x0 = i * w / gw
        val x1 = math.max(x0 + 1, (i + 1) * w / gw)
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
            x += 1
          }
          y += 1
        }
        // scale-free cell value: average gray × 2^20, integer division —
        // enough precision that pooling twins land on the same side of
        // the mean, zero float ops
        g(j * gw + i) = (sum << 20) / ((y1 - y0).toLong * (x1 - x0))
        i += 1
      }
      j += 1
    }
    g
  }

  /** aHash: 8×8 average-pooled grayscale, bit k set iff cell k is above
    * the 64-cell mean (compared cross-multiplied in integers — no
    * division rounding). Robust to re-encoding, format conversion and
    * uniform rescaling; brittle to crops (that is dHash's regime). */
  def aHash(bytes: Array[Byte]): Long = {
    val g = grayGrid(decode(bytes), 8, 8)
    var total = 0L
    var i = 0
    while (i < 64) { total += g(i); i += 1 }
    var bits = 0L
    i = 0
    while (i < 64) {
      if (g(i) * 64 > total) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** dHash: 9×8 average-pooled grayscale, bit (row·8+col) set iff the
    * cell is strictly brighter than its right neighbor — a gradient
    * fingerprint, more crop/brightness-tolerant than aHash. */
  def dHash(bytes: Array[Byte]): Long = {
    val g = grayGrid(decode(bytes), 9, 8)
    var bits = 0L
    var row = 0
    while (row < 8) {
      var c = 0
      while (c < 8) {
        if (g(row * 9 + c) > g(row * 9 + c + 1)) bits |= (1L << (row * 8 + c))
        c += 1
      }
      row += 1
    }
    bits
  }

  /** Deterministic downsample: per-cell integer average pooling of the
    * three RGB channels into a w×h image, re-encoded as PNG. The
    * [[resize]] twin for pipelines that must reproduce bit-identically
    * across JVMs (Graphics2D interpolation is raster-pipeline-specific;
    * channel-sum division is not). */
  def downsample(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0)
    val src = decode(bytes)
    val (sw, sh) = (src.getWidth, src.getHeight)
    val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var j = 0
    while (j < h) {
      val y0 = j * sh / h
      val y1 = math.max(y0 + 1, (j + 1) * sh / h)
      var i = 0
      while (i < w) {
        val x0 = i * sw / w
        val x1 = math.max(x0 + 1, (i + 1) * sw / w)
        var (r, g, b) = (0L, 0L, 0L)
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = src.getRGB(x, y)
            r += (rgb >> 16) & 0xff; g += (rgb >> 8) & 0xff; b += rgb & 0xff
            x += 1
          }
          y += 1
        }
        val n = (y1 - y0).toLong * (x1 - x0)
        dst.setRGB(i, j,
          (((r / n).toInt << 16) | ((g / n).toInt << 8) | (b / n).toInt))
        i += 1
      }
      j += 1
    }
    toPng(dst)
  }
}
