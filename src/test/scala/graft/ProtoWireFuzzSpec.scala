package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{EventModel, ProtoDescriptors}
import graft.model.ProtoWire._

/** Property-based robustness: every descriptor roundtrips arbitrary typed
  * values, and NO byte sequence makes a decoder throw (corrupt input must
  * decode to null / be dropped — a poison-pill record on a 100 TB run must
  * never fail a task).
  */
class ProtoWireFuzzSpec extends AnyFunSuite {

  /** Deterministic sampling (no scalatest-scalacheck bridge in this env):
    * draw `n` values from `gen` with fixed seeds and run `body` on each.
    */
  private def forSamples[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  private val genString = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(50)),
    Gen.const(""),
    Gen.oneOf("héllo wörld", "日本語テキスト", "emoji 🎉 text", "a\nb\tc"))

  private def genValue(k: PKind): Gen[Any] = k match {
    case PString => genString
    case PInt32 => Gen.chooseNum(Int.MinValue, Int.MaxValue)
    case PInt64 => Gen.chooseNum(Long.MinValue, Long.MaxValue)
    case PBool => Gen.oneOf(true, false)
    case PFloat => Gen.oneOf(Gen.chooseNum(-1e30f, 1e30f), Gen.oneOf(0.0f, Float.NaN, Float.NegativeInfinity))
    case PDouble => Gen.oneOf(Gen.chooseNum(-1e300, 1e300), Gen.oneOf(0.0, Double.NaN))
    case PEnum(names) => Gen.oneOf(names)
    case PStringList => Gen.listOfN(3, genString).map(_.toSeq)
    case PMessageList(desc) =>
      Gen.listOfN(2, Gen.sequence[Seq[Any], Any](desc.fields.map(f => genValue(f.kind)))).map(_.toSeq)
  }

  private def genValues(desc: MessageDesc): Gen[Seq[Any]] =
    Gen.sequence[Seq[Any], Any](desc.fields.map(f => genValue(f.kind)))

  test("roundtrip: arbitrary values survive encode→decode for every descriptor") {
    (ProtoDescriptors.byEventType.values.toSeq :+ ProtoDescriptors.header).foreach { desc =>
      forSamples(genValues(desc), 25) { values =>
        val row = desc.decode(desc.encode(values))
        assert(row != null, s"${desc.name} decode returned null")
        desc.fields.zipWithIndex.foreach { case (f, i) =>
          f.kind match {
            case PString | PEnum(_) => assert(row.getString(i) == values(i))
            case PInt32 => assert(row.getInt(i) == values(i))
            case PInt64 => assert(row.getLong(i) == values(i))
            case PBool => assert(row.getBoolean(i) == values(i))
            case PFloat =>
              val exp = values(i).asInstanceOf[Float]
              val got = row.getFloat(i)
              assert(got == exp || (got.isNaN && exp.isNaN) ||
                (exp == Float.NegativeInfinity && got == Float.NegativeInfinity))
            case PDouble =>
              val exp = values(i).asInstanceOf[Double]
              val got = row.getDouble(i)
              // -Inf clamps to -MaxValue by design (ProtoConcatenator.java:100)
              assert(got == exp || (got.isNaN && exp.isNaN) ||
                (exp == Double.NegativeInfinity && got == -java.lang.Double.MAX_VALUE))
            case PStringList =>
              assert(row.getArray(i).toArray[Any](org.apache.spark.sql.types.StringType)
                .map(_.toString).toSeq == values(i))
            case PMessageList(_) =>
              assert(row.getArray(i).numElements() == values(i).asInstanceOf[Seq[_]].length)
          }
        }
      }
    }
  }

  test("no byte sequence throws: random garbage decodes to null or a row") {
    val genBytes = Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    forSamples(genBytes, 500) { bytes =>
      ProtoDescriptors.byEventType.values.foreach(d => d.decode(bytes)) // must not throw
      ProtoDescriptors.header.decode(bytes)
      EventModel.decode(bytes) // envelope codec: Option, never throws
    }
  }

  test("truncations of valid frames never throw and never misreport") {
    val header = ProtoDescriptors.header.encode(Seq(
      "app", "1", "n", "u", "c", "h", "", "YARN", "EXECUTOR", "",
      Seq("YARN_APPLICATION"), "", "", "", 0, ""))
    val body = ProtoDescriptors.fsEvent.encode(Seq("/a", "/b", "RENAME", "u", 7L, "x", "SUCCESS"))
    val full = EventModel.encode(EventModel.Frame(1, 1700000000001L, header, body))
    (0 until full.length).foreach { cut =>
      val frame = EventModel.decode(java.util.Arrays.copyOfRange(full, 0, cut))
      // envelope length fields make any truncation detectable
      assert(frame.isEmpty, s"truncation at $cut must be rejected")
    }
    assert(EventModel.decode(full).isDefined)
  }
}
