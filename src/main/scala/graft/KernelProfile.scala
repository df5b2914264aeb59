package graft

import graft.corpus.Synth
import graft.kernel.Extract
import graft.model.{Doc, Kinds, Span}

/** Single-threaded kernel microprofile: pages/sec by page-source type.
  * Run: sbt "runMain graft.KernelProfile" */
object KernelProfile {
  def main(args: Array[String]): Unit = {
    val r = new Synth.Rng(1)
    val json = (1 to 2000).map(_ => Synth.layoutJsonPage(r))
    val html = (1 to 2000).map(_ => Synth.htmlPage(r))
    val md = (1 to 2000).map(_ => Synth.markdownPage(r))
    def time(name: String, pages: Seq[String]): Unit = {
      val docs = pages.map(p => Doc("d", Seq(Span(Kinds.TextKind, p, "", 0))))
      (1 to 2).foreach(_ => docs.foreach(d => Extract.extractDoc(d))) // warm
      val t0 = System.nanoTime()
      var n = 0
      (1 to 5).foreach { _ => docs.foreach { d => Extract.extractDoc(d); n += 1 } }
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$name%-10s ${n / s}%10.0f pages/s  avg ${s / n * 1e6}%8.1f us/page  avgLen ${pages.map(_.length).sum / pages.size}%6d")
    }
    time("layoutJson", json)
    time("html", html)
    time("markdown", md)
  }
}
