package graft.sources

import org.apache.hadoop.conf.Configuration

import java.io.{ObjectInputStream, ObjectOutputStream}

/** Serializable wrapper for a Hadoop `Configuration` so executor tasks
  * can open the same `FileSystem` the driver planned against
  * (`Configuration` is Writable, not java-Serializable). This is the
  * standard Spark-connector pattern; it is what makes the NPZ sinks
  * cluster-safe — on a real cluster the save dir is `s3a://`/`hdfs://`,
  * not the executor's local disk.
  */
class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
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
