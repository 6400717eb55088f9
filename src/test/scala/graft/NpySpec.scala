package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.{Fvecs, Npy}

/** .npy source/sink: golden-byte interop with numpy.save, round trips,
  * multi-file dense ids, cross-format equality with fvecs, loud rejects.
  */
class NpySpec extends SparkSpec {
  import spark.implicits._

  // numpy.save(np.array([[1.5, -2.25, 3.0], [0.0, 4.5, -1.0]], '<f4')),
  // captured verbatim — the interop ground truth
  private val golden: Array[Byte] =
    ("934e554d5059010076007b276465736372273a20273c6634272c2027666f7274" +
      "72616e5f6f72646572273a2046616c73652c20277368617065273a2028322c20" +
      "33292c207d202020202020202020202020202020202020202020202020202020" +
      "202020202020202020202020202020202020202020202020202020202020200a" +
      "0000c03f000010c0000040400000000000009040000080bf")
      .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private val goldenRows = Seq(
    Array(1.5f, -2.25f, 3.0f), Array(0.0f, 4.5f, -1.0f))

  test("decodes numpy.save bytes exactly") {
    val got = Npy.decode(golden).toSeq
    assert(got.length == 2)
    got.zip(goldenRows).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("encoder is byte-identical to numpy.save") {
    val enc = Npy.encodeBytes(goldenRows, 3)
    assert(enc.sameElements(golden),
      s"writer diverged from numpy: ${enc.length} vs ${golden.length} bytes")
  }

  test("round trip through files; multi-file ids stay dense in lexicographic order") {
    val dir = Files.createTempDirectory("npy").toString
    Files.write(Paths.get(s"$dir/a.npy"), golden)
    Files.write(Paths.get(s"$dir/b.npy"),
      Npy.encodeBytes(Seq(Array(7f, 8f, 9f)), 3))
    val got = Npy.read(spark, s"$dir/*.npy")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
      .toMap
    assert(got.keySet == Set(0L, 1L, 2L))
    assert(got(0L) == Seq(1.5f, -2.25f, 3.0f))
    assert(got(1L) == Seq(0.0f, 4.5f, -1.0f))
    assert(got(2L) == Seq(7f, 8f, 9f))
  }

  test("cross-format: the same vectors through npy and fvecs load identically") {
    val dir = Files.createTempDirectory("npyx").toString
    val vecs = (0L until 40L)
      .map(i => (i, Array.tabulate(8)(j => (i * 31 + j).toFloat / 7f)))
    val df = vecs.toDF("id", "vec")
    Npy.write(df, "id", "vec", s"$dir/x.npy")
    Fvecs.write(df, "id", "vec", s"$dir/x.fvecs")
    val a = Npy.read(spark, s"$dir/x.npy")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSet
    val b = Fvecs.read(spark, s"$dir/x.fvecs")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSet
    assert(a == b)
  }

  test("rejects: wrong dtype, fortran order, 1-D shape, truncation") {
    def header(dict: String): Array[Byte] = {
      val base = Npy.encodeBytes(Seq(Array(1f)), 1)
      // splice a custom dict into an otherwise valid v1.0 envelope
      val hlen = dict.length + 1
      val out = java.nio.ByteBuffer.allocate(10 + hlen + 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(base, 0, 8)
      out.put((hlen & 0xff).toByte).put(((hlen >> 8) & 0xff).toByte)
      out.put(dict.getBytes("ASCII")).put('\n'.toByte)
      out.putFloat(1f)
      out.array()
    }
    intercept[IllegalArgumentException](Npy.decode(header(
      "{'descr': '<f8', 'fortran_order': False, 'shape': (1, 1), }")).toSeq)
    intercept[IllegalArgumentException](Npy.decode(header(
      "{'descr': '<f4', 'fortran_order': True, 'shape': (1, 1), }")).toSeq)
    intercept[IllegalArgumentException](Npy.decode(header(
      "{'descr': '<f4', 'fortran_order': False, 'shape': (4,), }")).toSeq)
    intercept[IllegalArgumentException](Npy.decode(header(
      "{'descr': '<f4', 'fortran_order': False, 'shape': (9, 9), }")).toSeq)
    intercept[IllegalArgumentException](
      Npy.decode(Array[Byte](1, 2, 3)).toSeq)
  }
}
