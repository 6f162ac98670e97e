package graft.extract

import graft.core._
import org.json4s._
import org.json4s.jackson.JsonMethods

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

/** HTTP-backed [[SpanExtractor]] — the production seam the reference fills
  * with its OpenAI client (eschergraph/agents/providers/openai.py:75-162;
  * pool size eschergraph/agents/llm.py:38 `max_threads=10`).
  *
  * Each extraction call POSTs one JSON request to `endpoint` and parses
  * the JSON response per the reference's prompt contracts:
  *
  *   - `build` / `table` (json_build.jinja / json_table.jinja):
  *     `{"entities": [{"name", "description"}],
  *       "relationships": [{"source", "target", "relationship"}]}`
  *   - `figure` (json_figure.jinja): entities additionally carry
  *     `"main_node": bool` — the first true entity is the main visual.
  *   - `property` (json_property.jinja):
  *     `{"entities": [{"<entity name>": ["<property>", ...]}]}`
  *   - `keywords` (json_keywords.jinja): `{"keywords": [...]}`
  *   - `summary` (summary.jinja): `{"summary": "..."}`
  *
  * Request body: `{"task": <one of the above>, "text": <chunk/markdown/
  * caption/full text>, "nodes": [<known entity names>]}` (`nodes` only on
  * `property`, mirroring the prompt's `current_nodes`).
  *
  * Operational behavior mirrors the reference client:
  *   - bounded concurrency 10 — the pipeline's [[BoundedExec]] fans calls
  *     out per partition exactly like the reference's ThreadPoolExecutor,
  *     hiding per-call latency;
  *   - retries with random exponential backoff (tenacity
  *     `wait_random_exponential(multiplier=1, max=40)` +
  *     `stop_after_attempt(3)`, openai.py:75): IO errors, HTTP 5xx and
  *     429 retry; other 4xx are a configuration error and fail loudly;
  *   - an unparseable response body fails loudly with a body snippet
  *     (silent empty extractions would corrupt the graph downstream);
  *     absent contract keys degrade to empty lists (a model may return
  *     entities only).
  *
  * Construct from the environment with [[HttpExtractor.fromEnv]]
  * (`GRAFT_EXTRACTOR_URL`, optional `GRAFT_EXTRACTOR_TOKEN` sent as a
  * bearer header). [[DeterministicExtractor]] remains the default
  * everywhere; this client is opt-in per deployment. */
class HttpExtractor(
    endpoint: String,
    authToken: Option[String] = None,
    maxAttempts: Int = 3,
    backoffMultiplierMs: Long = 1000L,
    maxBackoffMs: Long = 40000L,
    connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 120000) extends SpanExtractor {

  // fail fast with a real message: maxAttempts <= 0 would otherwise skip
  // the retry loop entirely and NPE on the never-assigned lastFailure
  require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")

  override def maxConcurrency: Int = 10

  // --- SpanExtractor surface --------------------------------------------

  override def extractChunk(text: String): (Seq[NodeExt], Seq[EdgeExt]) =
    parseBuild(call("build", text))

  override def extractTable(markdown: String): (Seq[NodeExt], Seq[EdgeExt]) =
    parseBuild(call("table", markdown))

  override def extractFigure(caption: String): (Seq[NodeExt], Seq[EdgeExt], String) = {
    val j = call("figure", caption)
    val (ns, es) = parseBuild(j)
    val main = arr(j \ "entities").collectFirst {
      case e if (e \ "main_node") == JBool(true) => str(e, "name")
    }.getOrElse("")
    (ns, es, main)
  }

  override def extractProperties(text: String, nodeNames: Seq[String]): Seq[PropertyExt] =
    arr(call("property", text, nodeNames) \ "entities").flatMap {
      case JObject(fields) => fields.collect {
        case (name, JArray(ps)) =>
          PropertyExt(name, ps.collect { case JString(p) => p })
      }
      case _ => Nil
    }

  override def keywords(fullText: String): Seq[String] =
    arr(call("keywords", fullText) \ "keywords").collect { case JString(s) => s }

  override def summary(fullText: String): String =
    call("summary", fullText) \ "summary" match {
      case JString(s) => s
      case _ => ""
    }

  // --- JSON helpers ------------------------------------------------------

  private def arr(v: JValue): List[JValue] = v match {
    case JArray(xs) => xs
    case _ => Nil
  }

  private def str(v: JValue, name: String): String = v \ name match {
    case JString(s) => s
    case _ => ""
  }

  private def parseBuild(j: JValue): (Seq[NodeExt], Seq[EdgeExt]) = {
    val nodes = arr(j \ "entities").map(e => NodeExt(str(e, "name"), str(e, "description")))
      .filter(_.name.nonEmpty)
    val edges = arr(j \ "relationships")
      .map(r => EdgeExt(str(r, "source"), str(r, "target"), str(r, "relationship")))
      .filter(e => e.source.nonEmpty && e.target.nonEmpty)
    (nodes, edges)
  }

  // --- transport ----------------------------------------------------------

  /** Retryable transport failure (IO, 5xx, 429). */
  private final class RetryableFailure(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

  private def call(task: String, text: String, nodes: Seq[String] = Nil): JValue = {
    val body = JsonMethods.compact(JsonMethods.render(
      JObject(List(
        "task" -> JString(task),
        "text" -> JString(text)) :::
        (if (nodes.nonEmpty) List("nodes" -> JArray(nodes.map(JString(_)).toList)) else Nil))))
    var attempt = 0
    var lastFailure: Throwable = null
    while (attempt < maxAttempts) {
      if (attempt > 0) {
        // tenacity wait_random_exponential: uniform in
        // [0, min(max, multiplier * 2^(attempt-1))]
        val cap = math.min(maxBackoffMs, backoffMultiplierMs << (attempt - 1))
        val sleep = (java.util.concurrent.ThreadLocalRandom.current().nextDouble() * cap).toLong
        // Spark cancels tasks with Thread.interrupt(); an interrupted
        // backoff must ABORT the retry loop, not continue into more
        // blocking HTTP calls (which ignore the interrupt flag and can
        // pin a killed task for connect+read timeouts per attempt)
        try Thread.sleep(sleep)
        catch {
          case e: InterruptedException =>
            Thread.currentThread().interrupt()
            throw new RuntimeException(
              s"extractor retry interrupted (task cancelled) after $attempt attempts", e)
        }
      }
      attempt += 1
      try return once(body)
      catch {
        case e: RetryableFailure => lastFailure = e
        case e: java.io.IOException => lastFailure = e
      }
    }
    throw new RuntimeException(
      s"extractor endpoint $endpoint failed after $maxAttempts attempts " +
        s"(task=$task): ${lastFailure.getMessage}", lastFailure)
  }

  private def once(body: String): JValue = {
    val conn = URI.create(endpoint).toURL.openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestProperty("Content-Type", "application/json")
      authToken.foreach(t => conn.setRequestProperty("Authorization", s"Bearer $t"))
      val out = conn.getOutputStream
      try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
      val code = conn.getResponseCode
      if (code / 100 == 2) {
        val text = new String(conn.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
        try JsonMethods.parse(text)
        catch {
          case e: Throwable => throw new RuntimeException(
            s"extractor returned unparseable JSON (HTTP $code): " +
              s"${text.take(200)}", e)
        }
      } else {
        val err = Option(conn.getErrorStream)
          .map(s => new String(s.readAllBytes(), StandardCharsets.UTF_8)).getOrElse("")
        if (code >= 500 || code == 429)
          throw new RetryableFailure(s"HTTP $code from extractor: ${err.take(200)}")
        else throw new RuntimeException(
          s"extractor rejected request (HTTP $code — not retryable): ${err.take(200)}")
      }
    } finally conn.disconnect()
  }
}

object HttpExtractor {
  val UrlEnv = "GRAFT_EXTRACTOR_URL"
  val TokenEnv = "GRAFT_EXTRACTOR_TOKEN"

  /** Env-configured client, when `GRAFT_EXTRACTOR_URL` is set. */
  def fromEnv(): Option[HttpExtractor] =
    sys.env.get(UrlEnv).map(u => new HttpExtractor(u, sys.env.get(TokenEnv)))
}
