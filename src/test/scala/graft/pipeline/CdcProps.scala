package graft.pipeline

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.Hashing

/** ScalaCheck properties for the CDC boundary rule (pure JVM — the same
  * arithmetic `Dedup.cdcChunkStats` evaluates as column expressions;
  * CdcSpec pins the Scala↔Spark agreement). The re-sync property is THE
  * reason CDC exists: chunk identity downstream of an edit must be
  * invariant to the edit. */
object CdcProps extends Properties("CdcBoundaries") {

  private val W = 4
  private val Div = 16

  private def boundaries(tk: Seq[String]): Seq[Int] =
    tk.indices.filter(i => i >= W - 1 &&
      Hashing.hash60Local(tk.slice(i - W + 1, i + 1).mkString(" ")) % Div == 0)

  private def chunks(tk: Seq[String]): Seq[Seq[String]] = {
    val bnd = boundaries(tk).toSet
    val cidx = tk.indices.map(i => (0 until i).count(bnd))
    tk.zip(cidx).groupBy(_._2).toSeq.sortBy(_._1).map(_._2.map(_._1))
  }

  private val soupGen: Gen[List[String]] =
    Gen.chooseNum(50, 400).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 96).map(i => s"w$i")))

  property("chunks partition the token stream in order") =
    forAll(soupGen) { tk =>
      chunks(tk).flatten == tk
    }

  property("every chunk after the first preserved boundary survives an insertion") =
    forAll(soupGen, Gen.chooseNum(0, 1000), Gen.chooseNum(0, 96)) {
      (tk, posRaw, wRaw) =>
        tk.isEmpty || {
          val pos = posRaw % tk.length
          val edited = tk.take(pos) ++ List(s"INS$wRaw") ++ tk.drop(pos)
          // a boundary at original position j >= pos + W reads a trailing
          // W-gram made entirely of post-edit-stable tokens, so it is
          // PRESERVED (shifted by one) in the edited stream; every
          // original chunk starting strictly after the first such
          // boundary must therefore reappear verbatim
          boundaries(tk).find(_ >= pos + W) match {
            case None => true // edit landed in the final chunk run
            case Some(b0) =>
              var off = 0
              val later = chunks(tk).filter { c =>
                val s = off; off += c.length; s > b0
              }.map(_.mkString(" "))
              val editedSet = chunks(edited).map(_.mkString(" ")).toSet
              later.forall(editedSet)
          }
        }
    }
}
