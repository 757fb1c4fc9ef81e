package graft

import graft.index.TrigramIndex
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck laws for the trigram index's pure kernels: extraction,
  * 48-bit packing, run codec chaining, the rarest-k planner, and the
  * conservativeness of required-trigram extraction from regexes. */
object TrigramProperties extends Properties("trigram") {

  private val texts = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
  private val smallTexts = Gen.resize(40, texts)

  property("every extracted trigram is a substring; set = distinct windows") =
    Prop.forAll(texts) { s =>
      val tris = TrigramIndex.trigramsOf(s)
      val windows = (0 to math.max(s.length - 3, -1))
        .map(i => s.substring(i, i + 3)).distinct
      tris.forall(t => t.length == 3 && s.contains(t)) &&
        tris.toSeq.sorted == windows.sorted
    }

  property("triPack/triUnpack roundtrip on arbitrary UTF-16 chars") =
    Prop.forAll(Gen.listOfN(3, Gen.chooseNum(Char.MinValue, Char.MaxValue))) { cs =>
      val t = cs.mkString
      TrigramIndex.triUnpack(TrigramIndex.triPack(t)) == t
    }

  property("chained runs decode back to the full sorted id list") =
    Prop.forAll(Gen.listOf(Gen.chooseNum(0, 1 << 24)).map(_.distinct.sorted)) { ids =>
      ids.isEmpty || {
        // emulate the builder: cut ascending ids into <=128 runs, each
        // seeding its delta base from the previous run's last id
        var prev = 0
        val decoded = ids.grouped(128).flatMap { run =>
          val arr = run.toArray
          val blob = graft.core.Varint.encodeAll(graft.core.Delta.encode(arr, prev))
          val out = TrigramIndex.decodeRun(prev, arr.length, blob)
          prev = arr.last
          out
        }.toSeq
        decoded == ids
      }
    }

  property("planner picks a subset, sorted by (df, tri), flags absences") =
    Prop.forAll(smallTexts, Gen.mapOf(Gen.zip(
      Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString),
      Gen.chooseNum(1L, 1000L)))) { (needle, stats) =>
      val (chosen, absent) = TrigramIndex.planTrigrams(stats, needle, 4)
      val tris = TrigramIndex.trigramsOf(needle)
      chosen.size <= math.min(4, tris.length) &&
        chosen.forall(tris.contains) &&
        chosen == chosen.sortBy(t => (stats.getOrElse(t, 0L), t)) &&
        absent == tris.exists(t => !stats.contains(t))
    }

  property("pure-literal regex requires exactly the literal's trigrams") =
    Prop.forAll(Gen.resize(20, Gen.listOf(Gen.alphaLowerChar).map(_.mkString))) { s =>
      TrigramIndex.regexLiteralTrigrams(s).toSet ==
        TrigramIndex.trigramsOf(s).toSet
    }

  property("required trigrams are present in every matching string") =
    Prop.forAll(
      Gen.listOfN(5, Gen.alphaLowerChar).map(_.mkString),
      Gen.resize(8, Gen.listOf(Gen.alphaLowerChar).map(_.mkString)),
      Gen.listOfN(5, Gen.alphaLowerChar).map(_.mkString)) { (a, mid, b) =>
      val pattern = a + "[a-z]*" + b
      val matching = a + mid + b
      matching.matches(".*" + pattern + ".*") ==> {
        val req = TrigramIndex.regexLiteralTrigrams(pattern)
        req.forall(matching.contains)
      }
    }

  property("quantified-group trigrams hold on zero-repetition matches") =
    Prop.forAll(
      Gen.listOfN(5, Gen.alphaLowerChar).map(_.mkString),
      Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString),
      Gen.listOfN(5, Gen.alphaLowerChar).map(_.mkString),
      Gen.oneOf("*", "?", "{0,2}")) { (a, g, b, q) =>
      val pattern = a + "(" + g + ")" + q + b
      val zeroRep = a + b // matches the pattern with zero group repetitions
      val req = TrigramIndex.regexLiteralTrigrams(pattern)
      zeroRep.matches(".*" + pattern + ".*") ==> req.forall(zeroRep.contains)
    }
}
