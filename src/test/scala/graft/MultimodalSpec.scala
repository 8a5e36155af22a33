package graft

import org.apache.spark.sql.functions._
import graft.multimodal.MultimodalOps

/** Real PNG/JPEG decode + deterministic resize (the image path of the
  * multimodal plumbing), golden-pixel checked against independent index
  * arithmetic. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** 16×8 RGB gradient encoded as PNG bytes. */
  private def gradientPng(w: Int = 16, h: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 16 << 16) | (y * 32 << 8) | (x + y))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  private def media(payload: Array[Byte]) =
    Seq((1L, payload)).toDF("media_id", "payload")

  test("decodeFeatures reads real PNG dimensions from the header") {
    val out = MultimodalOps.decodeFeatures(spark, media(gradientPng()))
      .collect().head
    assert(out.getInt(1) == 16 && out.getInt(2) == 8 && out.getInt(3) == 1)
  }

  test("decodeFeatures reads real JPEG dimensions") {
    val img = new java.awt.image.BufferedImage(
      10, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    val out = MultimodalOps.decodeFeatures(spark, media(baos.toByteArray))
      .collect().head
    assert(out.getInt(1) == 10 && out.getInt(2) == 6)
  }

  test("resize decodes, nearest-neighbor scales, and re-encodes PNG") {
    val out = MultimodalOps.resize(spark, media(gradientPng()), 8, 8)
      .collect().head
    // aspect-preserving fit of 16×8 into 8×8 → 8×4
    assert(out.getInt(1) == 8 && out.getInt(2) == 4)
    val bytes = out.getAs[Array[Byte]](3)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(back.getWidth == 8 && back.getHeight == 4)
    // golden pixels: independent index arithmetic — dst (x,y) must carry
    // src (x*16/8, y*8/4) = (2x, 2y) of the gradient formula
    for (y <- 0 until 4; x <- 0 until 8) {
      val expected = (2 * x * 16 << 16) | (2 * y * 32 << 8) | (2 * x + 2 * y)
      assert((back.getRGB(x, y) & 0xffffff) == expected,
        s"pixel ($x,$y): got ${back.getRGB(x, y) & 0xffffff}, want $expected")
    }
  }

  test("resize is deterministic: identical bytes out on re-run") {
    val a = MultimodalOps.resize(spark, media(gradientPng()), 8, 8)
      .collect().head.getAs[Array[Byte]](3)
    val b = MultimodalOps.resize(spark, media(gradientPng()), 8, 8)
      .collect().head.getAs[Array[Byte]](3)
    assert(java.util.Arrays.equals(a, b))
  }

  test("non-image bytes keep the stub fallback (oracle stability)") {
    val textPayload = "not an image at all, just text".getBytes("UTF-8")
    val out = MultimodalOps.resize(spark, media(textPayload), 64, 64)
      .collect().head
    val (w, h, _) = MultimodalOps.decodeStubPublic(textPayload)
    val scale = math.min(64.0 / w, 64.0 / h)
    assert(out.getInt(1) == math.max(1, (w * scale).toInt))
    assert(out.getInt(2) == math.max(1, (h * scale).toInt))
  }
}
