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
}
