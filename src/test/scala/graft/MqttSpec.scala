package graft

import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Mqtt, MqttBroker, MqttClient}

/** MQTT 3.1.1 conformance of the hand-rolled broker/client pair: frame
  * round-trips, wildcard routing, QoS 1 at-least-once with DUP
  * retransmission, and protocol-violation handling. No Spark needed —
  * this is the wire layer under the MqttBus connector. */
class MqttSpec extends AnyFunSuite {

  private def withBroker(f: MqttBroker => Unit): Unit = {
    val b = new MqttBroker().start()
    try f(b) finally b.stop()
  }

  test("varint remaining-length encoder round-trips the spec examples") {
    // spec §2.2.3 boundary table
    val cases = Seq(0 -> 1, 127 -> 1, 128 -> 2, 16383 -> 2, 16384 -> 3,
      2097151 -> 3, 2097152 -> 4, 268435455 -> 4)
    cases.foreach { case (n, expectBytes) =>
      val enc = Mqtt.remainingLength(n)
      assert(enc.length == expectBytes, s"$n should encode in $expectBytes")
      // decode by hand
      var mult = 1; var len = 0
      enc.foreach { d => len += (d & 0x7f) * mult; mult *= 128 }
      assert(len == n)
    }
    intercept[IllegalArgumentException](Mqtt.remainingLength(268435456))
  }

  test("publish/subscribe round-trip at QoS 1: every payload arrives " +
      "exactly once on a healthy connection, topics intact") {
    withBroker { b =>
      val got = new ConcurrentLinkedQueue[(String, String)]()
      val n = 200
      val latch = new CountDownLatch(n)
      val sub = new MqttClient("127.0.0.1", b.boundPort, "sub").connect()
      sub.subscribe("graft/events/#") { (topic, payload) =>
        got.add((topic, new String(payload, UTF_8))); latch.countDown()
      }
      val pub = new MqttClient("127.0.0.1", b.boundPort, "pub").connect()
      (0 until n).foreach(i =>
        pub.publish(s"graft/events/t${i % 3}", s"m$i"))
      assert(latch.await(30, TimeUnit.SECONDS), s"got ${got.size} of $n")
      // healthy connection ⇒ no retransmit fired ⇒ exactly-once here
      Thread.sleep(700) // one retransmit period: late dups would show
      assert(got.size == n)
      val seen = got.toArray(Array.empty[(String, String)]).toSeq
      assert(seen.map(_._2).toSet == (0 until n).map(i => s"m$i").toSet)
      assert(seen.forall { case (t, m) =>
        t == s"graft/events/t${m.drop(1).toInt % 3}" })
      pub.disconnect(); sub.disconnect()
    }
  }

  test("broker routes by MQTT wildcards and delivers once per " +
      "connection for overlapping filters") {
    withBroker { b =>
      val hits = new ConcurrentLinkedQueue[String]()
      val sub = new MqttClient("127.0.0.1", b.boundPort, "w").connect()
      val one = new CountDownLatch(1)
      // overlapping filters on ONE connection: a/+/c and a/#
      sub.subscribe("a/+/c") { (t, _) => hits.add(s"plus:$t") }
      sub.subscribe("a/#") { (t, _) => hits.add(s"hash:$t"); one.countDown() }
      val pub = new MqttClient("127.0.0.1", b.boundPort, "p").connect()
      pub.publish("a/b/c", "x")
      pub.publish("a/b/d", "y") // matches a/# only
      pub.publish("z/b/c", "n") // matches nothing
      assert(one.await(10, TimeUnit.SECONDS))
      Thread.sleep(300) // let everything drain
      val seen = hits.toArray(Array.empty[String]).toSeq.sorted
      // the broker sends a/b/c ONCE; the client dispatches it to both
      // matching local callbacks; a/b/d reaches only the '#' callback
      assert(seen == Seq("hash:a/b/c", "hash:a/b/d", "plus:a/b/c"),
        s"got $seen")
      pub.disconnect(); sub.disconnect()
    }
  }

  test("QoS 1 at-least-once: a subscriber that withholds PUBACK gets a " +
      "DUP=1 retransmission with the same packet id; acking stops it") {
    withBroker { b =>
      // raw hand-rolled subscriber so we control the acks
      val sock = new Socket("127.0.0.1", b.boundPort)
      val out = sock.getOutputStream
      val in = sock.getInputStream
      out.write(Mqtt.packet(Mqtt.CONNECT << 4,
        Mqtt.utf8("MQTT") ++ Array[Byte](4, 2, 0, 60) ++ Mqtt.utf8("raw")))
      out.flush()
      assert((Mqtt.readPacket(in)._1 >> 4) == Mqtt.CONNACK)
      out.write(Mqtt.packet((Mqtt.SUBSCRIBE << 4) | 2,
        Array[Byte](0, 1) ++ Mqtt.utf8("dup/t") :+ 1.toByte))
      out.flush()
      assert((Mqtt.readPacket(in)._1 >> 4) == Mqtt.SUBACK)
      val pub = new MqttClient("127.0.0.1", b.boundPort, "p").connect()
      pub.publish("dup/t", "hello")
      // first delivery: DUP must be 0
      val (h1, b1) = Mqtt.readPacket(in)
      assert((h1 >> 4) == Mqtt.PUBLISH && ((h1 >> 3) & 1) == 0)
      val (topic1, o1) = Mqtt.readStr(b1, 0)
      val pid1 = Mqtt.readU16(b1, o1)
      assert(topic1 == "dup/t")
      // withhold the PUBACK: the retransmit MUST arrive, DUP=1, same id
      val (h2, b2) = Mqtt.readPacket(in)
      assert((h2 >> 4) == Mqtt.PUBLISH, "expected a retransmission")
      assert(((h2 >> 3) & 1) == 1, "retransmission must set DUP")
      val (_, o2) = Mqtt.readStr(b2, 0)
      assert(Mqtt.readU16(b2, o2) == pid1, "same packet id on redelivery")
      // now ack: no further copies within two retransmit periods
      out.write(Mqtt.packet(Mqtt.PUBACK << 4,
        Array[Byte]((pid1 >> 8).toByte, (pid1 & 0xff).toByte)))
      out.flush()
      sock.setSoTimeout(2 * Mqtt.RetransmitMs.toInt)
      intercept[java.io.IOException](Mqtt.readPacket(in)) // read times out
      pub.disconnect(); sock.close()
    }
  }

  test("protocol hygiene: PINGREQ gets PINGRESP; wrong protocol level " +
      "is refused rc=1; QoS 2 publish fails the connection; oversized " +
      "packets are rejected before allocation") {
    withBroker { b =>
      // ping over a raw connection
      val sock = new Socket("127.0.0.1", b.boundPort)
      val out = sock.getOutputStream
      val in = sock.getInputStream
      out.write(Mqtt.packet(Mqtt.CONNECT << 4,
        Mqtt.utf8("MQTT") ++ Array[Byte](4, 2, 0, 60) ++ Mqtt.utf8("c1")))
      out.flush()
      assert(Mqtt.readPacket(in)._2(1) == 0)
      out.write(Array[Byte]((Mqtt.PINGREQ << 4).toByte, 0)); out.flush()
      assert((Mqtt.readPacket(in)._1 >> 4) == Mqtt.PINGRESP)
      // QoS 2 publish → connection failed (EOF on next read)
      out.write(Mqtt.publishPacket("t", "x".getBytes(UTF_8), 2, 7,
        dup = false))
      out.flush()
      intercept[java.io.EOFException] {
        var i = 0
        while (i < 10) { Mqtt.readPacket(in); i += 1 } // drain until EOF
      }
      sock.close()
      // wrong protocol level: CONNACK rc=1
      val s2 = new Socket("127.0.0.1", b.boundPort)
      s2.getOutputStream.write(Mqtt.packet(Mqtt.CONNECT << 4,
        Mqtt.utf8("MQTT") ++ Array[Byte](9, 2, 0, 60) ++ Mqtt.utf8("c2")))
      s2.getOutputStream.flush()
      val (h, body) = Mqtt.readPacket(s2.getInputStream)
      assert((h >> 4) == Mqtt.CONNACK && body(1) == 1)
      s2.close()
      // a declared length over the 1 MiB cap throws before buffering
      val s3 = new Socket("127.0.0.1", b.boundPort)
      s3.getOutputStream.write(Array[Byte](0x30,
        0xff.toByte, 0xff.toByte, 0xff.toByte, 0x7f)) // 268 MB claim
      s3.getOutputStream.flush()
      // broker drops the connection without reading 268 MB
      s3.setSoTimeout(5000)
      assert(s3.getInputStream.read() == -1)
      s3.close()
    }
  }

  test("retained messages (spec §3.3.1.3): a late subscriber is primed " +
      "with the last retained payload per topic under RETAIN=1, live " +
      "fan-out carries RETAIN=0, last-writer-wins, and a zero-byte " +
      "retained publish clears the slot") {
    withBroker { b =>
      val pub = new MqttClient("127.0.0.1", b.boundPort, "rpub").connect()
      // retained announcements on two topics; t1 overwritten once
      pub.publish("graft/ann/t1", "v1-old".getBytes(UTF_8), qos = 1,
        retain = true)
      pub.publish("graft/ann/t1", "v1".getBytes(UTF_8), qos = 1,
        retain = true)
      pub.publish("graft/ann/t2", "v2".getBytes(UTF_8), qos = 1,
        retain = true)
      pub.publish("graft/ann/gone", "x".getBytes(UTF_8), qos = 1,
        retain = true)
      pub.publish("graft/ann/gone", Array.empty[Byte], qos = 1,
        retain = true) // zero-byte clears
      // late subscriber on a RAW socket so the RETAIN bit is observable
      val sock = new Socket("127.0.0.1", b.boundPort)
      val out = sock.getOutputStream
      val in = sock.getInputStream
      out.write(Mqtt.packet(Mqtt.CONNECT << 4,
        Mqtt.utf8("MQTT") ++ Array[Byte](4, 2, 0, 60) ++ Mqtt.utf8("late")))
      out.flush()
      assert(Mqtt.readPacket(in)._2(1) == 0)
      out.write(Mqtt.packet((Mqtt.SUBSCRIBE << 4) | 2,
        Array[Byte](0, 1) ++ Mqtt.utf8("graft/ann/#") :+ 1.toByte))
      out.flush()
      // SUBACK + exactly 2 retained deliveries (t1 current + t2), each
      // with RETAIN=1; ack them so retransmits don't muddy the count
      var suback = false
      var got = Map.empty[String, (String, Boolean)]
      sock.setSoTimeout(3000)
      while (got.size < 2 || !suback) {
        val (h, body) = Mqtt.readPacket(in)
        (h >> 4) match {
          case Mqtt.SUBACK => suback = true
          case Mqtt.PUBLISH =>
            val (topic, o) = Mqtt.readStr(body, 0)
            val pid = Mqtt.readU16(body, o)
            val payload = new String(body, o + 2, body.length - o - 2,
              UTF_8)
            got += topic -> (payload, (h & 0x01) != 0)
            out.write(Mqtt.packet(Mqtt.PUBACK << 4,
              Array[Byte]((pid >> 8).toByte, (pid & 0xff).toByte)))
            out.flush()
          case _ => ()
        }
      }
      assert(got == Map(
        "graft/ann/t1" -> ("v1", true),
        "graft/ann/t2" -> ("v2", true)),
        s"retained priming wrong: $got")
      // live publish to the same filter arrives with RETAIN=0
      pub.publish("graft/ann/t3", "live".getBytes(UTF_8), qos = 1,
        retain = false)
      var live: Option[(String, String, Boolean)] = None
      while (live.isEmpty) {
        val (h, body) = Mqtt.readPacket(in)
        if ((h >> 4) == Mqtt.PUBLISH) {
          val (topic, o) = Mqtt.readStr(body, 0)
          val pid = Mqtt.readU16(body, o)
          live = Some((topic,
            new String(body, o + 2, body.length - o - 2, UTF_8),
            (h & 0x01) != 0))
          out.write(Mqtt.packet(Mqtt.PUBACK << 4,
            Array[Byte]((pid >> 8).toByte, (pid & 0xff).toByte)))
          out.flush()
        }
      }
      assert(live.contains(("graft/ann/t3", "live", false)),
        s"live delivery must carry RETAIN=0: $live")
      sock.close()
      pub.disconnect()
    }
  }

  test("retained-topic cap: the publish creating topic 4097 fails its " +
      "connection loudly (no unbounded broker memory), overwrites under " +
      "the cap still succeed, and the broker keeps serving others") {
    withBroker { b =>
      val pub = new MqttClient("127.0.0.1", b.boundPort, "cap-pub")
        .connect()
      (0 until Mqtt.MaxRetainedTopics).foreach(i =>
        pub.publish(s"graft/cap/t$i", "x".getBytes(UTF_8), qos = 1,
          retain = true))
      // overwriting an EXISTING retained topic is always fine
      pub.publish("graft/cap/t0", "y".getBytes(UTF_8), qos = 1,
        retain = true)
      // the 4097th NEW retained topic kills the offending connection:
      // raw socket so the EOF is observable
      val sock = new Socket("127.0.0.1", b.boundPort)
      val out = sock.getOutputStream
      val in = sock.getInputStream
      out.write(Mqtt.packet(Mqtt.CONNECT << 4,
        Mqtt.utf8("MQTT") ++ Array[Byte](4, 2, 0, 60)
          ++ Mqtt.utf8("cap-over")))
      out.flush()
      assert(Mqtt.readPacket(in)._2(1) == 0)
      out.write(Mqtt.publishPacket("graft/cap/overflow",
        "z".getBytes(UTF_8), qos = 0, packetId = 0, dup = false,
        retain = true))
      out.flush()
      sock.setSoTimeout(5000)
      assert(in.read() == -1, "overflowing connection must be dropped")
      sock.close()
      // the healthy publisher and the store survive: a late subscriber
      // still gets the overwritten t0
      val got = new ConcurrentLinkedQueue[String]()
      val latch = new CountDownLatch(1)
      val sub = new MqttClient("127.0.0.1", b.boundPort, "cap-sub")
        .connect()
      sub.subscribe("graft/cap/t0") { (_, p) =>
        got.add(new String(p, UTF_8)); latch.countDown()
      }
      assert(latch.await(10, TimeUnit.SECONDS))
      assert(got.toArray(Array.empty[String]).toSeq == Seq("y"))
      sub.disconnect(); pub.disconnect()
    }
  }
}
