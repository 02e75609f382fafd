package graft.stream

import com.fasterxml.jackson.databind.ObjectMapper
import graft.icelite.IceLiteTable
import org.apache.spark.sql.SparkSession

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** E7 — the signal channel: Debezium drives incremental/blocking
  * snapshots by inserting rows into a `debezium_signal` table that the
  * connector polls (`IncrementalSnapshotIT.java:42, 131-137`;
  * `InformixConnectorTask.java:173-177`). The lake-native analog is a
  * signal DIRECTORY polled between micro-batches: each JSON file is one
  * request; processed signals are renamed `*.done` (poor-man's exactly
  * once — re-delivery is harmless anyway because snapshot chunks are
  * version-conditional and channel-idempotent).
  *
  * Signal file: {"type":"incremental-snapshot"|"blocking-snapshot",
  *               "sourcePath": <parquet dir consistent at pinLsn>,
  *               "pinLsn": <long>, "chunks": <int>}
  */
object Signals {

  final case class Signal(signalType: String, sourcePath: String, pinLsn: Long, chunks: Int)

  private val mapper = new ObjectMapper()

  /** Write a signal request (what the reference does with an INSERT
    * into the signal table).
    */
  def request(signalDir: String, signal: Signal): Path = {
    Files.createDirectories(Paths.get(signalDir))
    val n = mapper.createObjectNode()
    n.put("type", signal.signalType)
    n.put("sourcePath", signal.sourcePath)
    n.put("pinLsn", signal.pinLsn)
    n.put("chunks", signal.chunks)
    val p = Paths.get(signalDir, s"signal-${System.nanoTime()}.json")
    Files.write(p, mapper.writeValueAsString(n).getBytes(StandardCharsets.UTF_8))
    p
  }

  def pending(signalDir: String): Seq[Path] = {
    val d = Paths.get(signalDir)
    if (!Files.isDirectory(d)) Seq.empty
    else Files.list(d).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".json"))
      .toSeq.sortBy(_.getFileName.toString)
  }

  def parse(p: Path): Signal = {
    val n = mapper.readTree(Files.readAllBytes(p))
    Signal(n.get("type").asText(), n.get("sourcePath").asText(),
      n.get("pinLsn").asLong(), if (n.has("chunks")) n.get("chunks").asInt() else 4)
  }

  /** Poll + execute all pending signals (called between micro-batches —
    * the reference likewise interleaves snapshot chunks with streaming).
    */
  def process(spark: SparkSession, table: IceLiteTable, signalDir: String,
      rowFilter: Option[org.apache.spark.sql.Column] = None): Int = {
    var n = 0
    pending(signalDir).foreach { p =>
      val sig = parse(p)
      // the configured Filter-SMT gate applies to snapshot READ events
      // too (Debezium SMTs see every record) — same rule as CdcJob.snapshot
      val source = CdcJob.gateSource(spark.read.parquet(sig.sourcePath), rowFilter)
      sig.signalType match {
        case "blocking-snapshot" =>
          IncrementalSnapshot.blocking(table, source, sig.pinLsn)
        case "incremental-snapshot" =>
          IncrementalSnapshot.run(table, source, sig.pinLsn, math.max(1, sig.chunks))
        case other =>
          System.err.println(s"[signals] unknown signal type '$other' in $p — skipped")
      }
      Files.move(p, p.resolveSibling(p.getFileName.toString + ".done"))
      n += 1
    }
    n
  }
}
