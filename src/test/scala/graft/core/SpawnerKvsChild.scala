package graft.core

/** A spawned WORKER program for SpawnerKvsSpec — the analogue of a
  * user binary that calls kmr_create_dummy_context +
  * kmr_receive... / kmr_send_kvs_to_spawner (src/kmrmapms.c:2117-2152).
  * Runs as a real second JVM with no Spark on board: the child side of
  * the protocol must not require an engine, only the framing helpers.
  *
  * Modes:
  *  - swapdup   — per input pair emit TWO pairs: (v, k) and
  *                (k, uppercase v). Exercises the 0..n reply
  *                multiplicity a whole-KVS reply allows.
  *  - truncate  — reply with a valid magic + one frame but NO
  *                terminator, then exit 0: a child that died mid-send
  *                yet looks successful. The spawner must refuse it.
  *  - failafter — send a COMPLETE reply, then exit 3: the exit-code
  *                check must still fail the task.
  */
object SpawnerKvsChild {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("swapdup")
    val in = SpawnerKvs.receiveFromSpawner()
    mode match {
      case "swapdup" =>
        SpawnerKvs.sendToSpawner(in.iterator.flatMap { case (k, v) =>
          Iterator((v, k), (k, v.toUpperCase))
        })
      case "truncate" =>
        val o = new java.io.DataOutputStream(System.out)
        o.writeInt(0x4B565331)
        o.writeInt(1); o.writeInt(1); o.write('a'); o.write('b')
        o.flush() // no terminator, exit 0
      case "failafter" =>
        SpawnerKvs.sendToSpawner(in.iterator)
        System.out.flush()
        sys.exit(3)
      case other => sys.error(s"unknown mode $other")
    }
  }
}
