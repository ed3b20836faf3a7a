package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.topics.{LlmTopicNamer, LlmTransport}

/** Reference-shaped LLM namer (`topics_naming.py:41-125`): prompt
  * assembly, strict JSON response parse, cache fallback chain. All
  * driver-side — no SparkSession needed.
  */
class LlmNamerSpec extends AnyFunSuite {

  private final class Recorder(response: String) extends LlmTransport {
    var lastSystem: String = _
    var lastUser: String = _
    override def complete(sys: String, user: String): String = {
      lastSystem = sys; lastUser = user; response
    }
  }

  private def cacheFile() = {
    val d = Files.createTempDirectory("graft_namer_")
    d.resolve("topic_names.json")
  }

  test("prompt carries the topic's terms and representative texts; parse success names the topic") {
    val t = new Recorder("""{"2": "Climate Change"}""")
    val cache = cacheFile()
    val namer = new LlmTopicNamer(t, Some(cache))
    assert(namer.needsTexts)
    val got = namer.name(2, Seq("climate", "warming", "emissions"),
      Seq("Glaciers melt faster.", "Emissions \"peak\" expected."))
    assert(got === "Climate Change")
    // user prompt is the reference's JSON shape, escapes included
    assert(t.lastUser.contains(""""2": {"terms": ["climate", "warming", "emissions"]"""))
    assert(t.lastUser.contains(""""news_texts": ["Glaciers melt faster.", "Emissions \"peak\" expected."]"""))
    // system prompt states the output contract
    assert(t.lastSystem.contains("JSON object") && t.lastSystem.contains("Title Case"))
    // successful names are persisted to the cache file
    assert(Files.readString(cache).contains("Climate Change"))
  }

  test("malformed response falls back to the cache file; cache miss bottoms out at Topic N") {
    val cache = cacheFile()
    Files.writeString(cache, """{"3": "Cached Sports"}""")
    val bad = new LlmTopicNamer(new Recorder("Sure! Here are the labels: {\"3\": \"X\"}"), Some(cache))
    assert(bad.name(3, Seq("goal"), Seq("text")) === "Cached Sports")
    // topic absent from the cache → deterministic fallback
    assert(bad.name(9, Seq("goal"), Seq("text")) === "Topic 9")
    // a WELL-FORMED response that names the wrong topic degrades through
    // the same chain: cache first, not straight to Topic N
    val wrongKey = new LlmTopicNamer(new Recorder("""{"99": "Other"}"""), Some(cache))
    assert(wrongKey.name(3, Seq("goal"), Seq("text")) === "Cached Sports")
    // no cache configured at all
    val none = new LlmTopicNamer(new Recorder("not json"), None)
    assert(none.name(1, Seq("a"), Seq("b")) === "Topic 1")
  }

  test("transport failure degrades to cache, then to Topic N; cache survives later successes (merge)") {
    val cache = cacheFile()
    val boom = new LlmTransport {
      override def complete(s: String, u: String): String = throw new RuntimeException("api down")
    }
    assert(new LlmTopicNamer(boom, Some(cache)).name(5, Seq("t"), Seq()) === "Topic 5")
    // a success writes through; a later success for another topic MERGES
    new LlmTopicNamer(new Recorder("""{"5": "Finance"}"""), Some(cache)).name(5, Seq("t"), Seq())
    new LlmTopicNamer(new Recorder("""{"6": "Health"}"""), Some(cache)).name(6, Seq("t"), Seq())
    val merged = new LlmTopicNamer(boom, Some(cache))
    assert(merged.name(5, Seq("t"), Seq()) === "Finance")
    assert(merged.name(6, Seq("t"), Seq()) === "Health")
  }

  test("strict flat-object parser: accepts the contract, rejects everything else") {
    import LlmTopicNamer.parseFlatStringObject
    assert(parseFlatStringObject("""{"0": "A", "1": "B"}""") ===
      Some(Map("0" -> "A", "1" -> "B")))
    assert(parseFlatStringObject(""" { } """) === Some(Map.empty[String, String]))
    assert(parseFlatStringObject("""{"a": "x é \n \" y"}""") ===
      Some(Map("a" -> "x é \n \" y")))
    assert(parseFlatStringObject("""prose {"0": "A"}""") === None)
    assert(parseFlatStringObject("""{"0": "A"} trailing""") === None)
    assert(parseFlatStringObject("""{"0": {"nested": "x"}}""") === None)
    assert(parseFlatStringObject("""{"0": 42}""") === None)
    assert(parseFlatStringObject("""{"0": "A",}""") === None)
    assert(parseFlatStringObject("{") === None)
    assert(parseFlatStringObject(null) === None)
  }

  test("nameTopics wires the LLM namer end-to-end: texts collected iff needsTexts") {
    val spark = SparkSpec.session
    import spark.implicits._
    val terms = Seq((0, 1L, "alpha"), (0, 2L, "beta"), (1, 1L, "gamma"))
      .toDF("id_topic", "rank", "term")
    val sizes = Seq((0, 10L), (1, 5L)).toDF("id_topic", "topic_size")
    val reps = Seq((0, 1L, "u1", "text zero"), (1, 1L, "u2", "text one"))
      .toDF("id_topic", "rank", "url", "text")
    val rec = new Recorder("""{"0": "Zero Topic", "1": "One Topic"}""")
    val got = graft.topics.TopicNaming.nameTopics(terms, sizes,
        new LlmTopicNamer(rec, None), repTexts = Some(reps))
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((0, "Zero Topic", 10L), (1, "One Topic", 5L)))
    // the LAST call (topic 1) saw its representative text in the prompt
    assert(rec.lastUser.contains("text one"))
  }
}
