package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.operators.Multimodal.PpmCodec

/** Properties for the pure-JVM PPM codec: encode∘decode is the
  * identity on arbitrary images (any byte plane, not just synthesized
  * ASCII), synthesize is total and in-bounds on arbitrary byte input,
  * and halve never reads out of bounds.
  */
object PpmCodecProps extends Properties("PpmCodec") {

  private val imageGen: Gen[PpmCodec.Image] = for {
    w <- Gen.chooseNum(1, 40)
    h <- Gen.chooseNum(1, 40)
    pixels <- Gen.containerOfN[Array, Byte](w * h * 3, Gen.chooseNum(-128, 127).map(_.toByte))
  } yield PpmCodec.Image(w, h, pixels)

  property("decode(encode(img)) == img for arbitrary planes") =
    Prop.forAll(imageGen) { img =>
      val back = PpmCodec.decode(PpmCodec.encode(img))
      back.width == img.width && back.height == img.height &&
        java.util.Arrays.equals(back.pixels, img.pixels)
    }

  property("synthesize is total, in-bounds, and deterministic") =
    Prop.forAll(Gen.containerOf[Array, Byte](Gen.chooseNum(-128, 127).map(_.toByte))) { text =>
      val a = PpmCodec.synthesize(text)
      val b = PpmCodec.synthesize(text)
      a.width >= 16 && a.width < 64 && a.height >= 16 && a.height < 64 &&
        a.pixels.length == a.width * a.height * 3 &&
        a.width == b.width && java.util.Arrays.equals(a.pixels, b.pixels)
    }

  property("decode rejects a non-whitespace header/plane separator") =
    Prop.forAll(imageGen) { img =>
      // corrupt the single whitespace byte after maxval ("255\n" → "255X")
      val enc = PpmCodec.encode(img)
      val sep = enc.indexOfSlice("255\n".getBytes) + 3
      enc(sep) = 'X'.toByte
      Prop.throws(classOf[IllegalArgumentException])(PpmCodec.decode(enc))
    }

  property("halve round-trips through encode and keeps exact corners") =
    Prop.forAll(imageGen) { img =>
      val half = PpmCodec.halve(img)
      val expectedW = math.max(img.width / 2, 1)
      val expectedH = math.max(img.height / 2, 1)
      val enc = PpmCodec.decode(PpmCodec.encode(half))
      half.width == expectedW && half.height == expectedH &&
        half.pixels.length == expectedW * expectedH * 3 &&
        half.pixels(0) == img.pixels(0) &&
        java.util.Arrays.equals(enc.pixels, half.pixels)
    }
}
