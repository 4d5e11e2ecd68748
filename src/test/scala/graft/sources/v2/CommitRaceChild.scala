package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Second-JVM half of the multi-process commit-safety tests
  * (V2InternalsSpec "two JVMs racing commits"; CasServiceSpec's race
  * through the TCP commit service): performs `n` append-style commits
  * against the table dir — each adds one unique name, retrying CAS
  * losses against the freshest state — then prints its win count.
  * Args beyond the third are `key=value` Hadoop conf entries (how the
  * TCP-service variant points this process at `tcp-cas` and the
  * object-store scheme). Runs with no Spark session: the manifest
  * protocol is pure Hadoop FS. */
object CommitRaceChild {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = args(1).toInt
    val id = args(2)
    val conf = new Configuration()
    args.drop(3).foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      conf.set(k, v)
    }
    val table = new Path(dir)
    val fs = table.getFileSystem(conf)
    var wins = 0
    var attempts = 0
    while (wins < n && attempts < n * 1000) {
      attempts += 1
      val live = GraftManifest.liveState(fs, table)
      if (GraftManifest.tryCommit(fs, table, live.version,
          live.names :+ f"f-$id-$wins%04d.parquet")) {
        wins += 1
      }
    }
    println(s"CHILD_WINS=$wins")
    if (wins < n) sys.exit(2)
  }
}
