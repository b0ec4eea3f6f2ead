package graft.util

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Hadoop `Configuration` is not `java.io.Serializable`, so a task closure
  * cannot capture it directly; this holder ships it via Hadoop's own
  * `Writable` wire form (the same trick Spark uses internally). Executors
  * doing direct filesystem IO (the pb binlog segment writer) need the
  * DRIVER's configuration — fs.defaultFS, object-store credentials — not a
  * fresh empty one, or `FileSystem.get` would resolve a different
  * filesystem than the driver planned for. */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
