package graft

import graft.functions.AutoscaleClients
import graft.functions.AutoscaleClients.HttpReq
import graft.streaming.AutoscaleStream
import graft.streaming.AutoscaleStream._

/** Autoscale transport formatters (functions/AutoscaleClients) — the
  * byte shapes of the reference's k8s/swarm/ec2 clients
  * (services/k8s/client, services/swarm/client, services/ec2/client)
  * and the SetReplicas flows of autoscale.go:421-534, driven end-to-end
  * from FSM events through recording transports. */
class AutoscaleClientsSpec extends SparkSpec {
  import spark.implicits._

  test("k8s: scale GET path and JSON-Patch update bytes") {
    val get = AutoscaleClients.k8sScaleGetReq("prod", "deployments", "api")
    assert(get.method === "GET")
    assert(get.uri === "/apis/extensions/v1beta1/namespaces/prod/deployments/api/scale")
    val patch = AutoscaleClients.k8sScalePatchReq(
      "/apis/extensions/v1beta1/namespaces/prod/deployments/api/scale", 7)
    assert(patch.method === "PATCH")
    assert(patch.headers === Seq("Content-Type" -> "application/json-patch+json"))
    assert(patch.body === """[{"op":"replace","path":"/spec/replicas","value":7}]""")
  }

  test("k8s SetReplicas flow: GET the scale, PATCH its selfLink") {
    val log = scala.collection.mutable.ArrayBuffer.empty[HttpReq]
    val transport: AutoscaleClients.Transport = r => {
      log += r
      if (r.method == "GET")
        """{"metadata":{"selfLink":"/apis/extensions/v1beta1/namespaces/prod/deployments/api/scale"},"spec":{"replicas":3}}"""
      else ""
    }
    AutoscaleClients.k8sSetReplicas("prod", "deployments", transport)("api", 9L)
    assert(log.map(_.method).toSeq === Seq("GET", "PATCH"))
    assert(log(1).path.endsWith("/deployments/api/scale"))
    assert(log(1).body.contains("\"value\":9"))
    // selfLink absent → canonical path fallback
    log.clear()
    AutoscaleClients.k8sSetReplicas("prod", "deployments",
      (r: HttpReq) => { log += r; if (r.method == "GET") "{}" else "" })("api", 2L)
    assert(log(1).path === "/apis/extensions/v1beta1/namespaces/prod/deployments/api/scale")
  }

  test("swarm SetReplicas flow: version-tagged update with the rewritten Spec") {
    val log = scala.collection.mutable.ArrayBuffer.empty[HttpReq]
    val transport: AutoscaleClients.Transport = r => {
      log += r
      if (r.method == "GET")
        """{"ID":"web","Version":{"Index":42},"Spec":{"Name":"web","Mode":{"Replicated":{"Replicas":3}},"TaskTemplate":{"ContainerSpec":{"Image":"nginx"}}}}"""
      else ""
    }
    AutoscaleClients.swarmSetReplicas(transport)("web", 11L)
    assert(log.map(_.uri).toSeq === Seq(
      "/v1.30/services/web",
      "/v1.30/services/web/update?version=42"))
    val spec = new com.fasterxml.jackson.databind.ObjectMapper().readTree(log(1).body)
    assert(spec.path("Mode").path("Replicated").path("Replicas").asLong() === 11L)
    // the rest of the fetched Spec rides along unchanged
    assert(spec.path("TaskTemplate").path("ContainerSpec").path("Image").asText() === "nginx")
    assert(spec.path("Name").asText() === "web")
  }

  test("ec2: the SetDesiredCapacity query body with HonorCooldown pinned false") {
    val r = AutoscaleClients.ec2SetDesiredCapacityReq("my-asg", 5)
    assert(r.method === "POST" && r.path === "/")
    assert(r.body === "Action=SetDesiredCapacity&AutoScalingGroupName=my-asg" +
      "&DesiredCapacity=5&HonorCooldown=false&Version=2011-01-01")
    assert(r.headers.exists(_._2.startsWith("application/x-www-form-urlencoded")))
  }

  test("end-to-end: FSM events drive the k8s transport through applyEvents") {
    val s = 1000000L
    val pts = Seq(
      AutoscalePoint("api", 0 * s, 25), // 1 -> 3
      AutoscalePoint("api", 600 * s, 45), // 3 -> 5
      AutoscalePoint("web", 0 * s, 80)) // 1 -> 8
    val cfg = AutoscaleConfig(min = 1, max = 10,
      increaseCooldownUs = 0, decreaseCooldownUs = 0,
      replicas = (v, _) => math.ceil(v / 10.0).toLong,
      initialReplicas = _ => 1L)
    val events = AutoscaleStream.runBatch(pts.toDS(), cfg)
    // a driver-side recording transport: collect events first (the spec's
    // observation tap), then apply — in production the transport runs on
    // executors inside foreachPartition and needs only serializability
    val log = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(String, String)]())
    val collected = events.collect().toSeq
    val apply = AutoscaleClients.k8sSetReplicas("prod", "deployments", r => {
      log.add((r.method, r.uri)); if (r.method == "GET") "{}" else ""
    })
    collected.foreach(e => apply(e.resource, e.replicas))
    import scala.jdk.CollectionConverters._
    val patches = log.asScala.filter(_._1 == "PATCH").map(_._2)
    assert(patches.toSeq === Seq(
      "/apis/extensions/v1beta1/namespaces/prod/deployments/api/scale",
      "/apis/extensions/v1beta1/namespaces/prod/deployments/api/scale",
      "/apis/extensions/v1beta1/namespaces/prod/deployments/web/scale"))
  }
}
