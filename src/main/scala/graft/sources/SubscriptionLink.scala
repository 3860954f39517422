package graft.sources

/** InfluxDB subscription reconciliation as DATA — the pure set logic of
  * `linkSubscriptions` (reference services/influxdb/service.go:852-1060)
  * with the I/O shell (SHOW queries, UDP listeners, auth grants)
  * factored out. Given the discovered (db, rp) universe, the existing
  * subscriptions, and the config, [[plan]] computes exactly which
  * subscriptions the reference would DROP and CREATE, plus the rendered
  * InfluxQL statements (createSub/dropSub :1210-1241).
  *
  * Laws matched:
  *  - the subscription name is `kapacitor-` + cluster or server id by
  *    subscription-mode (getSubName :608-617);
  *  - legacy `kapacitor`-named and bare-cluster-id-named subscriptions
  *    migrate: drop + recreate under the new name with their mode and
  *    destinations preserved (:933-957);
  *  - an own-name subscription that is changed-or-invalid (no
  *    destinations; first destination's scheme ≠ protocol, host ≠
  *    hostname; for http(s): port ≠ httpPort, a user present with
  *    tokens disabled, or with tokens enabled a user that is not
  *    `~subscriber` / a token whose base64(`name;random`) cluster-name
  *    prefix does not match — changedOrInvalid :1116-1178, splitToken
  *    :1184-1195) is dropped and recreated;
  *  - shouldSubExist = (`subscriptions` config empty OR contains) AND
  *    NOT in `excluded-subscriptions` (:1111-1113; the default exclude
  *    list carries the internal stats dbrp `_kapacitor`.`autogen`,
  *    config.go:78-80); existing subs that should not exist drop;
  *  - every discovered (db, rp) that should exist and is absent is
  *    created with mode `ANY` and a single destination
  *    `protocol://hostname:httpPort/subscriptionPath` (http/https) or
  *    `udp://hostname:<allocated port>` (:1014-1047).
  */
object SubscriptionLink {

  val LegacySubName = "kapacitor"
  val SubNamePrefix = "kapacitor-"
  val SubscriptionUser = "~subscriber" // httpd handler.go:41

  final case class Sub(db: String, rp: String, name: String,
      mode: String, destinations: Seq[String])

  final case class Config(
      subName: String,
      clusterId: String,
      clusterName: String = "default",
      protocol: String = "http",
      hostname: String = "localhost",
      httpPort: Int = 9092,
      subscriptionPath: String = "",
      useTokens: Boolean = false,
      /** `subscriptions` config: empty = subscribe to everything. */
      includes: Set[(String, String)] = Set.empty,
      /** `excluded-subscriptions` config (default: the stats dbrp). */
      excludes: Set[(String, String)] = Set(("_kapacitor", "autogen")),
      disableSubs: Boolean = false)

  /** One reconciliation action with its rendered InfluxQL. */
  final case class Action(statement: String, sub: Sub)

  final case class Plan(drops: Seq[Action], creates: Seq[Action],
      subs: Seq[Sub])

  /** getSubName (service.go:608-617). `mode` is `"cluster"` or
    * `"server"` (config SubscriptionMode). */
  def subName(mode: String, clusterId: String, serverId: String): String =
    mode match {
      case "cluster" => SubNamePrefix + clusterId
      case "server"  => SubNamePrefix + serverId
      case other => throw new IllegalArgumentException(
        s"invalid subscription mode '$other'")
    }

  private def quoteIdent(s: String) = "\"" + s.replace("\"", "\\\"") + "\""

  private def createStatement(s: Sub): String =
    s"CREATE SUBSCRIPTION ${quoteIdent(s.name)} ON ${quoteIdent(s.db)}." +
      s"${quoteIdent(s.rp)} DESTINATIONS ${s.mode.toUpperCase} " +
      s.destinations.map(d => s"'$d'").mkString(", ")

  private def dropStatement(s: Sub): String =
    s"DROP SUBSCRIPTION ${quoteIdent(s.name)} ON ${quoteIdent(s.db)}.${quoteIdent(s.rp)}"

  /** splitToken (:1184-1195): base64url(`clusterName;random`). */
  private[sources] def tokenClusterName(token: String): Option[String] =
    try {
      val raw = new String(
        java.util.Base64.getUrlDecoder.decode(token), "ISO-8859-1")
      val i = raw.indexOf(';')
      if (i <= 0) None else Some(raw.substring(0, i))
    } catch { case _: IllegalArgumentException => None }

  /** changedOrInvalid (:1116-1178). */
  private[sources] def changedOrInvalid(si: Sub, cfg: Config): Boolean = {
    if (si.destinations.isEmpty) return true
    val u =
      try new java.net.URI(si.destinations.head)
      catch { case _: java.net.URISyntaxException => return true }
    if (u.getScheme != cfg.protocol) return true
    if (u.getHost != cfg.hostname) return true
    if (u.getScheme == "http" || u.getScheme == "https") {
      if (u.getPort != cfg.httpPort) return true
      val user = Option(u.getUserInfo)
      if (!cfg.useTokens && user.isDefined) return true
      if (cfg.useTokens) {
        user match {
          case None => return true
          case Some(info) =>
            val (name, pass) = info.indexOf(':') match {
              case -1 => (info, None)
              case i  => (info.substring(0, i), Some(info.substring(i + 1)))
            }
            if (name != SubscriptionUser) return true
            pass.flatMap(tokenClusterName) match {
              case Some(cn) if cn == cfg.clusterName => ()
              case _ => return true
            }
        }
      }
    }
    false
  }

  private def shouldExist(db: String, rp: String, cfg: Config): Boolean =
    (cfg.includes.isEmpty || cfg.includes(db -> rp)) && !cfg.excludes(db -> rp)

  /** The reconciliation fold. `udpPort` allocates the listener port for
    * udp-protocol creates (the startUDPListener seam); `token` supplies
    * the generated token for tokened http creates. */
  def plan(allDbrps: Seq[(String, String)], existing: Seq[Sub], cfg: Config,
      udpPort: (String, String) => Int = (_, _) => 0,
      token: (String, String) => String = (_, _) => ""): Plan = {
    if (cfg.disableSubs) return Plan(Nil, Nil, existing)
    val drops = Seq.newBuilder[Action]
    val creates = Seq.newBuilder[Action]
    // keyed like subEntry{db, rp, name}
    val current = scala.collection.mutable.LinkedHashMap.empty[(String, String, String), Sub]

    for (si <- existing) {
      val se = (si.db, si.rp, si.name)
      if (si.name == LegacySubName || si.name == cfg.clusterId) {
        // old-style subscription: drop and recreate with the new name
        drops += Action(dropStatement(si), si)
        val renamed = si.copy(name = cfg.subName)
        creates += Action(createStatement(renamed), renamed)
        current((si.db, si.rp, cfg.subName)) = renamed
      } else if (si.name == cfg.subName) {
        if (changedOrInvalid(si, cfg)) drops += Action(dropStatement(si), si)
        else current(se) = si
      }
      // foreign-named subscriptions are ignored entirely
    }

    // drop extra subs that should not exist
    for ((se, si) <- current.toSeq if !shouldExist(se._1, se._2, cfg)) {
      drops += Action(dropStatement(si), si)
      current.remove(se)
    }

    // create any missing subscriptions
    for ((db, rp) <- allDbrps) {
      val se = (db, rp, cfg.subName)
      if (shouldExist(db, rp, cfg) && !current.contains(se)) {
        val destination = cfg.protocol match {
          case "http" | "https" =>
            val userInfo =
              if (cfg.useTokens) s"$SubscriptionUser:${token(db, rp)}@" else ""
            s"${cfg.protocol}://$userInfo${cfg.hostname}:${cfg.httpPort}${cfg.subscriptionPath}"
          case "udp" => s"udp://${cfg.hostname}:${udpPort(db, rp)}"
          case other => throw new IllegalArgumentException(
            s"unsupported subscription protocol '$other'")
        }
        val sub = Sub(db, rp, cfg.subName, "ANY", Seq(destination))
        creates += Action(createStatement(sub), sub)
        current(se) = sub
      }
    }
    Plan(drops.result(), creates.result(), current.values.toSeq)
  }
}
