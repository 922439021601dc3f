package graft

/** Noise-defense logic for the per-round bench record (BASELINE.md
  * protocol). Three of seven driver rounds produced a load-contaminated
  * record (r4 490 s, r6 232 s, r7 597 s vs 165 s quiet on identical
  * code) that *looked* like an algorithmic regression each time; the
  * record now carries enough provenance to adjudicate itself:
  *
  *  - a 1-min load-average sample taken after every query,
  *  - a top-level `noisy` flag per the judge's rule (external load at
  *    start, or any per-query external-cores sample beyond cpus/8
  *    mid-run — 4 foreign cores on the 32-cpu protocol box),
  *  - an automatic re-time pass over queries that exceeded 3× their
  *    committed expected time, reporting BOTH raw and re-timed values
  *    (re-time = the minima protocol applied selectively).
  *
  * Pure functions, no Spark — BenchSpec pins the thresholds.
  */
object BenchProtocol {

  /** Noise rule: any per-query EXTERNAL-CPU sample above cpus/8 foreign
    * cores (4 on the 32-cpu protocol box); when the meter is
    * unavailable (non-Linux), fall back to the 1-min load_start > 2
    * precondition. The meter supersedes load_start because load average
    * cannot attribute: it integrates the bench's own launcher (an sbt
    * compile immediately before the run reads load ~3 on an otherwise
    * idle box) and the bench's own self-load (measured up to ~12 across
    * the heavy near-dup block), while foreign user-mode CPU during the
    * run — the thing that actually inflates timings — is exactly what
    * the per-query samples measure. Samples < 0 mean "unavailable".
    */
  def noisy(loadStart: Double, externalCoreSamples: Iterable[Double], cpus: Int): Boolean = {
    val usable = externalCoreSamples.exists(_ >= 0)
    if (usable) externalCoreSamples.exists(s => s >= 0 && s > cpus / 8.0)
    else loadStart > 2.0
  }

  /** One reading of the machine/process CPU accounting, in the shared
    * jiffy unit of /proc (so no HZ or wall-clock conversion is needed):
    * `userTicks`/`totalTicks` from the aggregate `cpu` line of
    * /proc/stat (user+nice ONLY — kernel time is deliberately excluded,
    * see [[externalCores]]), `procUserTicks` = utime of this JVM from
    * /proc/self/stat.
    */
  final case class CpuSnap(userTicks: Long, totalTicks: Long, procUserTicks: Long)

  /** Parse the aggregate `cpu  u n s i io irq sirq steal ...` line →
    * (userTicks = user+nice, totalTicks). totalTicks sums only the
    * first 8 fields (user..steal), the standard /proc/stat total:
    * Linux already folds guest/guest_nice into user/nice, so summing
    * all fields would double-count guest time and under-report
    * external contamination on hosts running VMs.
    */
  def parseProcStatCpu(line: String): (Long, Long) = {
    val f = line.trim.split("\\s+").drop(1).map(_.toLong)
    (f(0) + f(1), f.take(8).sum)
  }

  /** Parse /proc/self/stat → utime (field 14, 1-based; the comm field
    * may contain spaces but is parenthesized — split after the closing
    * paren).
    */
  def parseSelfStat(line: String): Long = {
    val rest = line.substring(line.lastIndexOf(')') + 2).split("\\s+")
    // after (comm) state, fields: state=1 ... utime=12 (0-based in rest)
    rest(11).toLong
  }

  /** Average FOREIGN user-mode cores busy between two snapshots: the
    * machine's user ticks minus this process's user ticks, as a share
    * of total ticks, scaled to the core count. User-mode only, on both
    * sides: an IO-heavy query's kernel writeback runs in unattributable
    * kworker threads, so a busy-ticks meter charges the bench's OWN
    * flushes as "external" (measured: 4-6.5 phantom cores on the three
    * store-writing queries of a solo sf1 run); a contaminating process
    * (another sbt/JVM/bench) burns user time and is caught. ≈0 on a
    * quiet box even while the bench saturates every core. Returns -1
    * when the accounting is unusable (no elapsed ticks, counter wrap).
    */
  def externalCores(a: CpuSnap, b: CpuSnap, cpus: Int): Double = {
    val total = b.totalTicks - a.totalTicks
    val user = b.userTicks - a.userTicks
    val proc = b.procUserTicks - a.procUserTicks
    if (total <= 0 || user < 0 || proc < 0) -1.0
    else math.max(0.0, (user - proc).toDouble / total * cpus)
  }

  /** Current CpuSnap from /proc, None off-Linux (flag then relies on
    * load_start only).
    */
  def cpuSnap(): Option[CpuSnap] =
    scala.util.Try {
      val statLine = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).get
      val selfLine = scala.io.Source.fromFile("/proc/self/stat").getLines().next()
      val (user, total) = parseProcStatCpu(statLine)
      CpuSnap(user, total, parseSelfStat(selfLine))
    }.toOption

  /** A query re-times when a committed expectation exists and the
    * measured pass exceeded 3× it. Queries without an expectation (new
    * this round, or a non-protocol sf dir) never re-time.
    */
  def needsRetime(sec: Double, expected: Option[Double]): Boolean =
    expected.exists(e => sec > 3.0 * e)

  /** One recorded protocol round: (round, nQueries, totalS, sPerQuery,
    * protocol description).
    */
  final case class TrendRow(round: Int, nQueries: Int, totalS: Double,
                            sPerQuery: Double, protocol: String)

  /** The committed round-over-round protocol trend
    * (`bench_trend.tsv` on the classpath) — eight rounds of recordable
    * numbers lived only in BASELINE.md prose before; the file makes a
    * rate regression a spec failure instead of an archaeology exercise.
    * Rows are append-only, one per round with a clean record.
    */
  def trend(): Seq[TrendRow] = {
    val in = getClass.getResourceAsStream("/bench_trend.tsv")
    if (in == null) Seq.empty
    else try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .flatMap { l =>
          l.split('\t') match {
            case Array(r, n, t, s, p) => scala.util.Try(
              TrendRow(r.toInt, n.toInt, t.toDouble, s.toDouble, p)).toOption
            case _ => None
          }
        }.toSeq
    } finally in.close()
  }

  /** Committed per-query expected seconds for the protocol sf dir —
    * `bench_expected_<basename>.tsv` on the classpath (quiet-machine
    * protocol run; regenerate via `graft.Bench` on a quiet box and
    * commit). Missing resource (non-protocol dirs like the sf1 drill
    * corpus) disables re-timing rather than mis-applying sf0.1 bounds.
    */
  def expectedFor(sfDir: String): Map[String, Double] = {
    val base = sfDir.replaceAll("/+$", "").split('/').last
    val in = getClass.getResourceAsStream(s"/bench_expected_$base.tsv")
    if (in == null) Map.empty
    else try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .flatMap { l =>
          l.split('\t') match {
            case Array(name, sec) => scala.util.Try(name -> sec.toDouble).toOption
            case _ => None
          }
        }.toMap
    } finally in.close()
  }
}
