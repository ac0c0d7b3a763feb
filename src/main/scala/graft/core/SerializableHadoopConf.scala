package graft.core

/** Hadoop `Configuration` isn't java-serializable; ship it to executors
  * via its own `write`/`readFields` (same trick as Spark's internal
  * `SerializableConfiguration`, which is `private[spark]`). */
private[graft] class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}
