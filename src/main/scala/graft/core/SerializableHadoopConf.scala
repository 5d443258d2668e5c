package graft.core

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Serializable wrapper for a Hadoop `Configuration` (which is
  * `Writable` but not `Serializable`), so tasks reading parquet footers
  * see the driver's filesystem settings (s3a credentials, endpoints…)
  * instead of a default-constructed config. Same shape as Spark's
  * internal `org.apache.spark.util.SerializableConfiguration`, which is
  * `private[spark]`. */
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
