package graft

import graft.core._
import graft.index.PostingCodec
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property suite (run by sbt's scalacheck framework):
  * roundtrip laws for every codec plus the posting-block encoder. */
object CodecProperties extends Properties("codecs") {

  private val nonNegInts = Gen.listOf(Gen.chooseNum(0, Int.MaxValue))
  private val sortedIds = Gen.listOf(Gen.chooseNum(0, 1 << 28)).map(_.distinct.sorted)

  property("varint roundtrip") = Prop.forAll(nonNegInts) { l =>
    val a = l.toArray
    Varint.decodeAll(Varint.encodeAll(a), a.length).sameElements(a)
  }

  property("delta roundtrip preserves sorted sequences") = Prop.forAll(sortedIds) { l =>
    val a = l.toArray
    Delta.decode(Delta.encode(a)).sameElements(a)
  }

  property("bitpack roundtrip") = Prop.forAll(nonNegInts) { l =>
    val a = l.toArray
    BitPack.unpack(BitPack.pack(a)).sameElements(a)
  }

  property("lenByte: lossy is idempotent, bounded, monotone") =
    Prop.forAll(Gen.chooseNum(0L, 0xffffffffL), Gen.chooseNum(0L, 0xffffffffL)) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      LenByte.lossy(LenByte.lossy(lo)) == LenByte.lossy(lo) &&
        LenByte.lossy(lo) <= lo &&
        LenByte.lossy(lo) <= LenByte.lossy(hi)
    }

  property("positions blob roundtrip") =
    Prop.forAll(Gen.listOf(Gen.chooseNum(0, 1 << 20)).map(_.distinct.sorted)) { ps =>
      val a = ps.toArray
      val blob = PostingCodec.encodePositionsBlob(a)
      PostingCodec.decodePositions(1, blob).head.sameElements(a)
    }

  private val postingsGen: Gen[List[(Int, Int, List[Int])]] =
    Gen.listOf(Gen.zip(Gen.chooseNum(0, 1 << 27), Gen.chooseNum(1, 1000),
        Gen.nonEmptyListOf(Gen.chooseNum(0, 1 << 20))))
      .map(_.groupBy(_._1).toList.map { case (id, g) => g.head }
        .sortBy(_._1))

  property("block encode/decode roundtrip incl. 128-boundary framing") =
    Prop.forAll(postingsGen) { ps =>
      val input = ps.map { case (id, tf, pos) =>
        val sorted = pos.distinct.sorted.toArray
        PostingCodec.Posting(id, tf, PostingCodec.encodePositionsBlob(sorted),
          PostingCodec.encodeOffsetsBlob(sorted, sorted.map(_ + 1)))
      }
      val blocks = PostingCodec.encode("t", input.iterator).toList
      val decoded = blocks.flatMap(b => PostingCodec.decodeDocIdTf(b.prevDocId, b.n, b.docIds, b.tfs))
      val want = ps.map { case (id, tf, _) => (id, tf) }
      decoded == want &&
        blocks.forall(b => b.n <= PostingCodec.BlockSize) &&
        blocks.zip(blocks.drop(1)).forall { case (x, y) => y.prevDocId == x.lastDocId }
    }
}
