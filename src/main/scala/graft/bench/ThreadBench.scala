package graft.bench
import java.util.concurrent.atomic.AtomicLong
import graft.fixtures.PageGen
import graft.functions.{CleanTextImpl, HtmlStripper}
import graft.ner.{FixtureGazetteer, NerExtractor}

object ThreadBench {
  def main(args: Array[String]): Unit = {
    val perThread = 30000
    val params = graft.SparkEntry.fixtureModel
    val trie = FixtureGazetteer.trie
    def work(tid: Int): Long = {
      var i = 0L
      var acc = 0L
      while (i < perThread) {
        val g = PageGen.generate(tid * perThread + i)
        val html = new String(g.html, java.nio.charset.StandardCharsets.UTF_8)
        val text = HtmlStripper.strip(html)
        // the String-twin clean — models the fused analyzer's actual hot
        // path (the UTF8String round trip it used to measure is gone)
        val clean = CleanTextImpl.cleanString(text)
        val ms = NerExtractor.detect(trie, g.url, clean, Some(FixtureGazetteer.keepLabels)).size
        val a = graft.topics.TopicScorer.score(params, g.url, clean)
        acc += ms + a.id_topic
        i += 1
      }
      acc
    }
    work(999) // warm JIT
    Seq(1, 8, 32).foreach { n =>
      val t0 = System.nanoTime()
      val threads = (0 until n).map { t =>
        val th = new Thread(() => { work(t); () }); th.start(); th
      }
      threads.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[tb] threads=$n pages=${n.toLong * perThread} sec=$sec%.2f pages_per_sec=${n.toLong * perThread / sec}%.0f")
    }
  }
}
