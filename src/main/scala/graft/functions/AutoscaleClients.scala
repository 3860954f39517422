package graft.functions

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** The k8s / Docker Swarm / EC2 autoscale TRANSPORTS as byte-exact
  * request formatters with the I/O injected — the same split the 27
  * alert handlers use (payload shapes here, sockets in the caller), and
  * the missing half of the autoscale rows: the FSM emits events
  * (streaming/AutoscaleStream), these build the exact requests the
  * reference clients send, and `applyEvents` drives them through any
  * HTTP function.
  *
  * Request shapes mirrored line-for-line:
  *  - k8s (services/k8s/client/client.go:263-293, 197-215): GET
  *    `/apis/extensions/v1beta1/namespaces/{ns}/{kind}/{name}/scale`;
  *    update = PATCH to the fetched Scale's `metadata.selfLink` with a
  *    single-element JSON-Patch array replacing `/spec/replicas`,
  *    Content-Type `application/json-patch+json`;
  *  - swarm (services/swarm/client/client.go:139-206): GET
  *    `/v1.30/services/{id}`; update = POST
  *    `/v1.30/services/{id}/update?version={Version.Index}` with the
  *    service's Spec JSON, `Spec.Mode.Replicated.Replicas` rewritten
  *    (autoscale.go:525-534);
  *  - ec2 (services/ec2/client/client.go:79-87): the AWS Query call
  *    `SetDesiredCapacity` with `HonorCooldown=false` — the reference
  *    pins it false because the engine owns cooldowns; SigV4 signing is
  *    credential state and stays in the transport, exactly as the AWS
  *    SDK layers it.
  *
  * TLS, auth tokens, retries, and cluster endpoints are transport
  * concerns (the reference reads them from service configs); a transport
  * is one function `HttpReq => String` (response body).
  */
object AutoscaleClients {

  case class HttpReq(
      method: String,
      path: String,
      query: Seq[(String, String)],
      headers: Seq[(String, String)],
      body: String) {
    def uri: String =
      if (query.isEmpty) path
      else path + "?" + query.map { case (k, v) =>
        java.net.URLEncoder.encode(k, "UTF-8") + "=" +
          java.net.URLEncoder.encode(v, "UTF-8")
      }.mkString("&")
  }

  /** Injectable I/O: execute the request, return the response body. */
  type Transport = HttpReq => String

  @transient private lazy val mapper = new ObjectMapper

  // --------------------------------------------------------------- k8s

  def k8sScaleGetReq(namespace: String, kind: String, name: String): HttpReq =
    HttpReq("GET",
      s"/apis/extensions/v1beta1/namespaces/$namespace/$kind/$name/scale",
      Nil, Nil, "")

  def k8sScalePatchReq(selfLink: String, replicas: Long): HttpReq =
    HttpReq("PATCH", selfLink, Nil,
      Seq("Content-Type" -> "application/json-patch+json"),
      s"""[{"op":"replace","path":"/spec/replicas","value":$replicas}]""")

  /** The k8sAutoscaler.SetReplicas flow (autoscale.go:421-433): fetch the
    * Scale, PATCH its selfLink. Returns an `applyEvents`-shaped
    * (resourceName, replicas) => Unit. A Scale without a selfLink falls
    * back to the canonical scale path. */
  def k8sSetReplicas(namespace: String, kind: String,
      transport: Transport): (String, Long) => Unit = (name, replicas) => {
    val scaleJson = transport(k8sScaleGetReq(namespace, kind, name))
    val node = mapper.readTree(scaleJson)
    val selfLink = Option(node.path("metadata").path("selfLink").asText(""))
      .filter(_.nonEmpty)
      .getOrElse(k8sScaleGetReq(namespace, kind, name).path)
    transport(k8sScalePatchReq(selfLink, replicas))
    ()
  }

  // ------------------------------------------------------------- swarm

  private val swarmApiVersion = "v1.30" // client.go:26

  def swarmServiceGetReq(id: String): HttpReq =
    HttpReq("GET", s"/$swarmApiVersion/services/$id", Nil, Nil, "")

  def swarmServiceUpdateReq(id: String, versionIndex: Long,
      specJson: String): HttpReq =
    HttpReq("POST", s"/$swarmApiVersion/services/$id/update",
      Seq("version" -> versionIndex.toString),
      Seq("Content-Type" -> "application/json"),
      specJson)

  /** The swarmAutoscaler.SetReplicas flow (autoscale.go:525-534): fetch
    * the service, rewrite Spec.Mode.Replicated.Replicas, POST the Spec
    * with the optimistic-concurrency version from Version.Index. */
  def swarmSetReplicas(transport: Transport): (String, Long) => Unit =
    (id, replicas) => {
      val svc = mapper.readTree(transport(swarmServiceGetReq(id)))
      val version = svc.path("Version").path("Index").asLong(0L)
      val spec = svc.path("Spec") match {
        case o: ObjectNode => o.deepCopy[ObjectNode]()
        case _ => throw new IllegalStateException(s"service $id has no Spec")
      }
      def objAt(parent: ObjectNode, field: String): ObjectNode =
        parent.get(field) match {
          case o: ObjectNode => o
          case _ =>
            val n = mapper.createObjectNode()
            parent.set[ObjectNode](field, n)
            n
        }
      objAt(objAt(spec, "Mode"), "Replicated").put("Replicas", replicas)
      transport(swarmServiceUpdateReq(id, version, mapper.writeValueAsString(spec)))
      ()
    }

  // --------------------------------------------------------------- ec2

  /** The AWS Query request behind autoscaling.SetDesiredCapacity
    * (client.go:79-87). HonorCooldown is pinned false like the reference
    * ("kapacitor has the cooldown implementation"). The transport adds
    * Host + SigV4 headers. */
  def ec2SetDesiredCapacityReq(groupName: String, capacity: Long): HttpReq =
    HttpReq("POST", "/", Nil,
      Seq("Content-Type" -> "application/x-www-form-urlencoded; charset=utf-8"),
      Seq(
        "Action" -> "SetDesiredCapacity",
        "AutoScalingGroupName" -> groupName,
        "DesiredCapacity" -> capacity.toString,
        "HonorCooldown" -> "false",
        "Version" -> "2011-01-01")
        .map { case (k, v) =>
          java.net.URLEncoder.encode(k, "UTF-8") + "=" +
            java.net.URLEncoder.encode(v, "UTF-8")
        }.mkString("&"))

  def ec2SetReplicas(transport: Transport): (String, Long) => Unit =
    (group, replicas) => { transport(ec2SetDesiredCapacityReq(group, replicas)); () }
}
