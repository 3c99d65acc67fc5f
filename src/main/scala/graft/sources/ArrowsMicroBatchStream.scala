package graft.sources

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming over append-only directories of `.arrows`
  * files. Each `latestOffset` re-lists the directories; files are
  * assigned stable positions in arrival order (alphabetical within one
  * listing), and a micro-batch covers the files between two offsets.
  *
  * Limitation (round 1): the arrival-order map lives in this driver
  * object, so exact replay across a driver restart is not guaranteed
  * for files that arrived in the same listing interval.
  */
final class ArrowsMicroBatchStream(schema: StructType, dirs: Seq[String])
    extends MicroBatchStream {

  private case class ArrowsOffset(count: Int) extends Offset {
    override def json(): String = count.toString
  }

  /** Files in assigned order; grows monotonically. */
  private val known = scala.collection.mutable.ArrayBuffer[String]()
  private val knownSet = scala.collection.mutable.Set[String]()

  private def listNow(): Seq[String] = dirs.flatMap { d =>
    val f = new java.io.File(ArrowsTableProvider.stripScheme(d))
    if (f.isDirectory)
      f.listFiles().toSeq.map(_.getPath)
        .filter(n => n.endsWith(".arrows") || n.endsWith(".arrow")).sorted
    else if (f.isFile) Seq(f.getPath)
    else Nil
  }

  override def latestOffset(): Offset = synchronized {
    listNow().foreach { p =>
      if (!knownSet.contains(p)) { known += p; knownSet += p }
    }
    ArrowsOffset(known.size)
  }

  override def initialOffset(): Offset = ArrowsOffset(0)

  override def deserializeOffset(json: String): Offset = ArrowsOffset(json.toInt)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    synchronized {
      val s = start.asInstanceOf[ArrowsOffset].count
      val e = end.asInstanceOf[ArrowsOffset].count
      known.slice(s, e).map(p =>
        ArrowsInputPartition(p, -1, -1, -1): InputPartition).toArray
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new ArrowsReaderFactory(schema)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
