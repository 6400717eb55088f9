package graft

import java.nio.file.Files

import graft.sources.{Bvecs, Fvecs, Ivecs}

/** fvecs source round-trip (SURVEY.md §2 A1; format per py/hnsw.ipynb
  * cell-1: int32 dim header + dim float32s, little-endian).
  */
class FvecsSpec extends SparkSpec {
  import spark.implicits._

  test("write/read round-trip preserves ids, dims and values") {
    val dir = Files.createTempDirectory("fvecs").toString
    val path = s"$dir/test.fvecs"
    val data = (0L until 20L).map(i =>
      (i, (0 until 8).map(j => (i * 8 + j).toFloat).toArray)
    )
    Fvecs.write(data.toDF("id", "vec"), "id", "vec", path)
    val back = Fvecs.read(spark, path).orderBy("id").collect()
    assert(back.length == 20)
    data.foreach { case (i, v) =>
      assert(back(i.toInt).getSeq[Float](1).toArray.toSeq == v.toSeq)
    }
  }

  test("decode rejects corrupt rows") {
    val bad = Array[Byte](5, 0, 0, 0, 1, 2) // dim=5 but only 2 bytes follow
    assertThrows[IllegalArgumentException] {
      Fvecs.decode(bad).toArray
    }
  }

  test("ivecs round-trip: ground-truth neighbor lists survive exactly") {
    val dir = Files.createTempDirectory("ivecs").toString
    val path = s"$dir/gt.ivecs"
    // shaped like a ground-truth file: top-10 neighbor ids per query
    val data = (0L until 15L).map(i =>
      (i, (0 until 10).map(j => (i * 31 + j * 7).toInt % 1000).toArray)
    )
    Ivecs.write(data.toDF("id", "vec"), "id", "vec", path)
    val back = Ivecs.read(spark, path).orderBy("id").collect()
    assert(back.length == 15)
    data.foreach { case (i, v) =>
      assert(back(i.toInt).getSeq[Int](1).toSeq == v.toSeq)
    }
  }

  test("bvecs round-trip widens uint8 to 0..255 smallint; rejects out-of-range writes") {
    val dir = Files.createTempDirectory("bvecs").toString
    val path = s"$dir/base.bvecs"
    // include values above 127 to pin the unsigned read
    val data = (0L until 12L).map(i =>
      (i, (0 until 16).map(j => ((i * 37 + j * 11) % 256).toShort).toArray)
    )
    Bvecs.write(data.toDF("id", "vec"), "id", "vec", path)
    val back = Bvecs.read(spark, path).orderBy("id").collect()
    assert(back.length == 12)
    data.foreach { case (i, v) =>
      assert(back(i.toInt).getSeq[Short](1).toSeq == v.toSeq)
    }
    assert(back.flatMap(_.getSeq[Short](1)).max > 127, "unsigned range exercised")
    val bad = Seq((0L, Array[Short](300))).toDF("id", "vec")
    assertThrows[IllegalArgumentException] {
      Bvecs.write(bad, "id", "vec", s"$dir/bad.bvecs")
    }
  }

  test("ivecs/bvecs decode reject corrupt rows") {
    val badI = Array[Byte](3, 0, 0, 0, 1, 2) // dim=3 but only 2 payload bytes
    assertThrows[IllegalArgumentException] { Ivecs.decode(badI).toArray }
    val badB = Array[Byte](9, 0, 0, 0, 1, 2) // dim=9 but only 2 payload bytes
    assertThrows[IllegalArgumentException] { Bvecs.decode(badB).toArray }
  }

  test("multi-file read assigns dense ids in file order") {
    val dir = Files.createTempDirectory("fvecs2").toString
    val a = (0L until 3L).map(i => (i, Array(i.toFloat)))
    val b = (0L until 2L).map(i => (i, Array((100 + i).toFloat)))
    Fvecs.write(a.toDF("id", "vec"), "id", "vec", s"$dir/a.fvecs")
    Fvecs.write(b.toDF("id", "vec"), "id", "vec", s"$dir/b.fvecs")
    val back = Fvecs.read(spark, dir).orderBy("id").collect()
    assert(back.map(_.getLong(0)).toSeq == (0L until 5L))
    assert(back(3).getSeq[Float](1).head == 100.0f)
  }
}
