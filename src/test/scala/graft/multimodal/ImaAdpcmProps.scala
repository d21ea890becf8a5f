package graft.multimodal

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck form of the codec's contracts: for ARBITRARY 16-bit
  * signals and block sizes, encode→decode preserves sample count and
  * rate, reproduces every block-header sample verbatim, never emits a
  * sample outside int16 range, and matches the encoder's own internal
  * reconstruction bit-for-bit (the property that makes the DuckDB
  * trajectory replay exact). No Spark session — the codec is plain JVM
  * code, so the properties run at ScalaCheck speed. */
object ImaAdpcmProps extends Properties("ImaAdpcm") {

  private val sampleGen: Gen[Int] = Gen.chooseNum(-32768, 32767)
  private val signalGen: Gen[Array[Int]] =
    Gen.chooseNum(0, 700).flatMap(n => Gen.listOfN(n, sampleGen)).map(_.toArray)
  // blockAlign >= 8, multiple of 4 (the encodeWav contract)
  private val blockGen: Gen[Int] = Gen.chooseNum(2, 64).map(_ * 4)

  property("round trip preserves count, rate, header samples, and " +
      "int16 range") = Prop.forAll(signalGen, blockGen) { (sig, ba) =>
    val (rate, dec) = ImaAdpcm.decodeWav(ImaAdpcm.encodeWav(sig, 8000, ba))
    val spb = ImaAdpcm.samplesPerBlock(ba)
    val headersExact = sig.indices.filter(_ % spb == 0)
      .forall(i => dec(i) == sig(i))
    rate == 8000 && dec.length == sig.length && headersExact &&
      dec.forall(s => s >= -32768 && s <= 32767)
  }

  property("decoded samples == the encoder's internal reconstruction " +
      "(state machines agree step for step); within-reach targets " +
      "quantize with error <= the current step size") =
    Prop.forAll(signalGen, blockGen) { (sig, ba) =>
      val spb = ImaAdpcm.samplesPerBlock(ba)
      val (_, dec) = ImaAdpcm.decodeWav(ImaAdpcm.encodeWav(sig, 8000, ba))
      // walk the encoder exactly as encodeWav does (running index
      // carries across blocks; padding of the final partial block
      // emits dead codes that never decode) and check the decoder
      // reproduces the reconstruction bit-for-bit
      var index = 0
      var ok = true
      var b = 0
      while (b * spb < sig.length && ok) {
        val base = b * spb
        var pred = sig(base)
        ok = dec(base) == pred
        var i = 1
        while (i < spb && base + i < sig.length && ok) {
          val step = ImaAdpcm.stepTable(index)
          val maxDelta = step + (step >> 1) + (step >> 2) + (step >> 3)
          val target = sig(base + i)
          val reachable = math.abs(target - pred) <= maxDelta
          val (_, p, ix) = ImaAdpcm.encodeStep(pred, index, target)
          ok = dec(base + i) == p &&
            (!reachable || math.abs(target - p) <= step)
          pred = p; index = ix
          i += 1
        }
        b += 1
      }
      ok
    }
}
