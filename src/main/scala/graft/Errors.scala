package graft

/** Error taxonomy mirroring the reference's exception hierarchy
  * (`polla_app/exceptions.py:13-75`): every failure carries an error code
  * and a sanitized context map; `RobotsDisallowedError` is also a
  * permission-style error (reference keeps `PermissionError` parentage,
  * pinned by `tests/test_errors.py:13-26` — here: extends both the app
  * trait and `SecurityException`).
  */
sealed trait GraftError { self: Throwable =>
  def errorCode: String
  def context: Map[String, String]
  def sanitizedContext: Map[String, String] =
    context.map { case (k, v) =>
      if (GraftError.sensitive(k)) k -> graft.functions.PollaParsers.redact(v)
      else k -> v
    }
}

object GraftError {
  /** Sensitive-key predicate (reference `obs.py:31-41`): match token/secret/
    * password/credential/auth anywhere, `key` as a word, but allow-list
    * fuente/source/url-ish names. */
  def sensitive(k: String): Boolean = {
    val lk = k.toLowerCase
    val allow = Set("fuente", "source", "url", "source_name", "source_url")
    if (allow.exists(lk.contains)) false
    else Seq("token", "secret", "password", "credential", "auth").exists(lk.contains) ||
      lk == "key" || lk.endsWith("_key") || lk.startsWith("key_")
  }
}

class ConfigError(msg: String, val context: Map[String, String] = Map.empty)
    extends IllegalArgumentException(msg) with GraftError {
  val errorCode = "CONFIG_ERROR"
}

class NetworkError(msg: String, val context: Map[String, String] = Map.empty,
    cause: Throwable = null)
    extends RuntimeException(msg, cause) with GraftError {
  val errorCode = "NETWORK_ERROR"
}

class ParseError(msg: String, val context: Map[String, String] = Map.empty,
    cause: Throwable = null)
    extends RuntimeException(msg, cause) with GraftError {
  val errorCode = "PARSE_ERROR"
}

class PublishError(msg: String, val context: Map[String, String] = Map.empty)
    extends RuntimeException(msg) with GraftError {
  val errorCode = "PUBLISH_ERROR"
}

class RobotsDisallowedError(msg: String, val context: Map[String, String] = Map.empty)
    extends SecurityException(msg) with GraftError {
  val errorCode = "ROBOTS_DISALLOWED"
}
