package graft.io

import graft.testkit.SparkSpec
import java.nio.file.Files

class EdgeListIOSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(content: String): String = {
    val f = Files.createTempFile("edges", ".txt")
    Files.writeString(f, content)
    f.toString
  }

  test("readValidated aborts with 1-based line number on the FIRST bad line") {
    val p = tmp("0 1\n1 2\n01 2\nx y\n")
    val e = intercept[EdgeListIO.InvalidLine] {
      EdgeListIO.readValidated(spark, p)
    }
    assert(e.lineNumber == 3) // leading zero is invalid per the regex
  }

  test("readValidated accepts the reference grammar incl. id 0") {
    val p = tmp("0 0\n10 2\n999999999 0\n")
    val got = EdgeListIO.readValidated(spark, p).as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 0L), (10L, 2L), (999999999L, 0L)))
  }

  test("weighted/labeled/vertex variants parse their schemas") {
    val w = EdgeListIO.readWeighted(spark, tmp("0 1 0.5\n1 2 1.25\n"))
      .as[(Long, Long, Double)].collect().toSet
    assert(w == Set((0L, 1L, 0.5), (1L, 2L, 1.25)))
    val l = EdgeListIO.readLabeled(spark, tmp("3 4 7\n")).head()
    assert((l.getLong(0), l.getLong(1), l.getInt(2)) == ((3L, 4L, 7)))
    val vw = EdgeListIO.readVertexWeighted(spark, tmp("5 2.5\n")).head()
    assert((vw.getLong(0), vw.getDouble(1)) == ((5L, 2.5)))
  }

  test("readers walk directory trees recursively (file-list map semantics)") {
    val dir = Files.createTempDirectory("edgetree")
    Files.createDirectory(dir.resolve("sub"))
    Files.writeString(dir.resolve("a.txt"), "0 1\n1 2\n")
    Files.writeString(dir.resolve("sub").resolve("b.txt"), "2 3\n")
    val got = EdgeListIO.read(spark, dir.toString).as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L), (1L, 2L), (2L, 3L)))
    val words = EdgeListIO.readWords(spark, dir.toString).count()
    assert(words == 6L)
  }

  test("multi-file validation aborts with the PER-FILE line number") {
    val dir = Files.createTempDirectory("edgebad")
    Files.writeString(dir.resolve("a.txt"), "0 1\n1 2\n2 3\n")
    Files.writeString(dir.resolve("b.txt"), "5 6\nBAD LINE\n")
    val e = intercept[EdgeListIO.InvalidLine] {
      EdgeListIO.readValidated(spark, dir.toString)
    }
    assert(e.lineNumber == 2, s"expected line 2 of b.txt, got ${e.lineNumber}")
  }

  test("readWords tokenizes on whitespace runs") {
    val p = tmp("the  quick\tbrown\nfox the\n")
    val words = EdgeListIO.readWords(spark, p).as[String].collect().toSeq
    assert(words.sorted == Seq("brown", "fox", "quick", "the", "the"))
  }

  test("golden format round-trips through formatRank within checker tolerance") {
    for (x <- Seq(0.100073081953, 1.0 / 3.0, 1e-7, 0.25, 1.0))
      assert(math.abs(EdgeListIO.formatRank(x).toDouble - x) <= 1e-12 * math.max(1, x))
  }

  test("formatRank is byte-identical to the reference cpp golden notation") {
    // barabasi-100000 spans fixed and scientific notation (8021 e-05
    // lines, plus e-06/e-07): every value string must reproduce exactly.
    val src = scala.io.Source.fromFile(
      "/root/reference/result/barabasi-100000-pr-cpp.txt")
    try {
      var checked = 0
      var sci = 0
      src.getLines().foreach { line =>
        val v = line.split("\\s=\\s")(1)
        assert(EdgeListIO.formatRank(v.toDouble) == v, s"line: $line")
        checked += 1
        if (v.contains("e-")) sci += 1
      }
      assert(checked > 100000 && sci > 8000)
    } finally src.close()
  }
}
