package graft.cli

/** Poll the reference-named live road-weather endpoint into a
  * JSON-Lines drop directory — the executable path for
  * [[graft.streaming.DigitrafficSource]]'s streaming adapters
  * (the reference names the real-time API as its data source,
  * `/root/reference/README.md:5`, but only ever bulk-loads dumps).
  *
  * {{{
  * runMain graft.cli.DigitrafficPoll --out /data/drops \
  *   [--url https://tie.digitraffic.fi/api/weather/v1/stations/data] \
  *   [--interval-ms 60000] [--count 0]       // 0 = poll forever
  * }}}
  *
  * A concurrent Spark job points `sensorDataStreamLines` at the same
  * directory; the poller's atomic landing guarantees the file source
  * never reads a partial payload.
  */
object DigitrafficPoll {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k -> v
    }.toMap
    val out = opts.getOrElse("--out",
      sys.error("--out <drop dir> is required"))
    val url = opts.getOrElse("--url",
      "https://tie.digitraffic.fi/api/weather/v1/stations/data")
    val intervalMs = opts.getOrElse("--interval-ms", "60000").toLong
    val count = opts.getOrElse("--count", "0").toInt
    val fetch = graft.streaming.DigitrafficSource.httpFetcher(url)
    if (count > 0)
      graft.streaming.DigitrafficSource.poll(fetch, out, intervalMs, count)
    else // forever: bounded inner loops so landed-file indexes restart
      while (true) {
        graft.streaming.DigitrafficSource.poll(fetch, out, intervalMs,
          Int.MaxValue)
      }
  }
}
