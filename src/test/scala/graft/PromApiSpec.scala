package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.server.PromApi

/** HTTP API shapes (reference main.rs:227-424). */
class PromApiSpec extends SparkSpec {

  private def get(port: Int, path: String): (Int, String) = {
    val client = HttpClient.newHttpClient()
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def post(port: Int, path: String, form: String): (Int, String) = {
    val client = HttpClient.newHttpClient()
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(form)).build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("labels, label values, query_range, instant query") {
    val engine = new PromEngine(queries.TsQueries.events(spark, "/root/testdata/sf0.001"))
    val api = PromApi(engine, port = 0).start()
    try {
      val port = api.boundPort

      val (c1, labels) = get(port, "/api/v1/labels")
      assert(c1 == 200 && labels.contains("\"status\": \"success\""))
      assert(labels.contains("\"event_type\"") && labels.contains("\"__name__\""))

      val (c2, values) = get(port, "/api/v1/label/__name__/values")
      assert(c2 == 200 && values.contains("\"events_user_id\""))

      val (c3, qr) = get(port,
        "/api/v1/query_range?query=" +
          java.net.URLEncoder.encode("""sum by (event_type) (events{event_type="purchase"})""", "UTF-8") +
          "&start=1704067200&end=1704070800&step=15m")
      assert(c3 == 200, qr.take(300))
      assert(qr.contains("\"resultType\": \"matrix\""))
      assert(qr.contains("\"event_type\": \"purchase\""))
      assert(qr.contains("[1704067200, "))

      val (c4, bad) = get(port, "/api/v1/query_range?query=bogus%7B&start=0&end=1&step=1")
      assert(c4 == 400 && bad.contains("queryError"))

      // the reference's instant-query easter egg (main.rs:399-405)
      val (c5, two) = post(port, "/api/v1/query", "query=1%2B1&time=0")
      assert(c5 == 200 && two.contains("2.0"))

      // round-8 surface over the wire: @ pin composed with per-step scalar
      // normalization, and a per-step scalar serialized as a labelless series
      val (c6, pin) = get(port,
        "/api/v1/query_range?query=" +
          java.net.URLEncoder.encode(
            """sum by (event_type) (events @ 1704070800) / scalar(sum(events))""", "UTF-8") +
          "&start=1704067200&end=1704070800&step=15m")
      assert(c6 == 200, pin.take(300))
      assert(pin.contains("\"resultType\": \"matrix\"") && pin.contains("\"event_type\""))

      val (c7, th) = get(port,
        "/api/v1/query_range?query=" +
          java.net.URLEncoder.encode("hour(time())", "UTF-8") +
          "&start=1704067200&end=1704074400&step=1h")
      assert(c7 == 200 && th.contains("\"metric\": {}"), th.take(200))
      assert(th.contains("[1704070800, \"1\"]") || th.contains("[1704070800, \"1.0\"]"), th.take(400))

      // scalar-comparison bool rule surfaces as a query error, not a 500
      val (c8, sc) = get(port,
        "/api/v1/query_range?query=" +
          java.net.URLEncoder.encode("time() > 5", "UTF-8") +
          "&start=1704067200&end=1704070800&step=1h")
      assert(c8 == 400 && sc.contains("BOOL modifier"), sc.take(200))
    } finally api.stop()
  }
  test("instant query vector shape and /api/v1/series") {
    val engine = new PromEngine(queries.TsQueries.events(spark, "/root/testdata/sf0.001"))
    val api = PromApi(engine, port = 0).start()
    try {
      val port = api.boundPort
      val enc = (s: String) => java.net.URLEncoder.encode(s, "UTF-8")

      // real instant query → vector wire shape
      val (c1, iv) = get(port, "/api/v1/query?query=" +
        enc("""sum by (event_type) (events)""") + "&time=1704153600")
      assert(c1 == 200, iv.take(300))
      assert(iv.contains("\"resultType\": \"vector\""))
      assert(iv.contains("\"value\": [1704153600, "))

      // the reference's 1+1 quirk is preserved
      val (c2, quirk) = post(port, "/api/v1/query", "query=1%2B1")
      assert(c2 == 200 && quirk.contains("\"result\": 2.0"))

      // series: two selectors, distinct label sets
      val (c3, sr) = get(port, "/api/v1/series?match[]=" +
        enc("""events{event_type="purchase"}""") + "&match[]=" + enc("""events{event_type="click"}"""))
      assert(c3 == 200, sr.take(300))
      assert(sr.contains("\"event_type\": \"purchase\"") && sr.contains("\"event_type\": \"click\""))

      val (c4, _) = get(port, "/api/v1/series")
      assert(c4 == 400)
    } finally api.stop()
  }

  test("native-histogram quantile serves over query_range") {
    val nh = { // scoped: functions.get would shadow this suite's HTTP get
      import org.apache.spark.sql.functions.{lit, map}
      import spark.implicits._
      val obs = Seq((1704067200.0, 1.0), (1704067200.0, 3.0), (1704067200.0, 3.0))
        .toDF("ts", "value")
        .withColumn("labels", map(lit("__name__"), lit("lat_native")))
      graft.operators.NativeHistogram.fromSamples(Model.withSkey(obs), 0)
    }
    val engine = new PromEngine(
      queries.TsQueries.events(spark, "/root/testdata/sf0.001"))
      .withNativeHistograms(Map("lat_native" -> nh))
    val api = PromApi(engine, port = 0).start()
    try {
      val (c, body) = get(api.boundPort,
        "/api/v1/query_range?query=histogram_quantile(0.5,%20lat_native%7B%7D)" +
          "&start=1704067200&end=1704070800&step=1h")
      assert(c == 200 && body.contains("\"status\": \"success\""))
      // schema-0 buckets (0.5,1]=1, (2,4]=2; q=0.5 → rank 1.5 in (2,4]
      assert(body.contains("1704067200") && body.contains("2.5"))
    } finally api.stop()
  }

  test("favicon, POST body cap, error JSON shape (main.rs:104,300-318,349)") {
    val engine = new PromEngine(queries.TsQueries.events(spark, "/root/testdata/sf0.001"))
    val api = PromApi(engine, port = 0).start()
    try {
      val port = api.boundPort

      // embedded static favicon: 200 + image/x-icon + valid ICO magic
      val client = java.net.http.HttpClient.newHttpClient()
      val fav = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/favicon.ico")).GET().build(),
        HttpResponse.BodyHandlers.ofByteArray())
      assert(fav.statusCode() == 200)
      assert(fav.headers().firstValue("Content-Type").orElse("") == "image/x-icon")
      val ico = fav.body()
      assert(ico.length > 22 && ico(0) == 0 && ico(1) == 0 && ico(2) == 1 && ico(3) == 0)

      // labels POST: small body fine, >4096 bytes → 413 (ContentLengthLimit parity)
      val (cs, small) = post(port, "/api/v1/labels", "ignored=1")
      assert(cs == 200 && small.contains("\"__name__\""))
      val (cb, big) = post(port, "/api/v1/labels", "x=" + "a" * 5000)
      assert(cb == 413 && big.contains("payloadTooLarge"), s"$cb ${big.take(200)}")

      // error JSON shape: {"status": "error", "errorType": ..., "error": ...}
      val (ce, err) = get(port, "/api/v1/query_range?query=bogus%7B&start=0&end=1&step=1")
      assert(ce == 400)
      assert(err.contains("\"status\": \"error\""))
      assert(err.contains("\"errorType\": \"queryError\""))
      assert(err.contains("\"error\": "))
    } finally api.stop()
  }

}
