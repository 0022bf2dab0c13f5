package graft.operators

/** Environment parameterization — the library half of the reference's
  * variable library (`fabric/claims/orchestration/VL_claims
  * .VariableLibrary/variables.json` declares variables with default
  * values; `valueSets/Prod.json` overrides a subset per environment;
  * pipelines reference the variables and deployment picks the active
  * set). Here: declared defaults plus named value sets, validated at
  * construction — an override of an undeclared variable is a deploy
  * bug and fails fast, the same contract the platform's editor
  * enforces — resolved to one immutable view consumed by
  * [[graft.Medallion]] / [[PipelineRunner]] callers, so the same
  * pipeline code runs under any environment with zero code change.
  *
  * Values are strings at rest (the JSON wire shape) with typed
  * accessors at point of use; this is control-plane configuration —
  * nothing here touches a DataFrame or an executor.
  */
final case class ResolvedVariables(set: String, values: Map[String, String]) {
  /** The variable's value in this set; undeclared names throw (a
    * reference to a variable the library never declared is a bug in
    * the pipeline, not a missing override). */
  def apply(name: String): String = values.getOrElse(name,
    throw new NoSuchElementException(
      s"undeclared variable '$name' (value set '$set')"))
  def int(name: String): Int = apply(name).toInt
  def long(name: String): Long = apply(name).toLong
  def double(name: String): Double = apply(name).toDouble
  def bool(name: String): Boolean = apply(name).toBoolean
  /** Comma-separated list value (the JSON-array analog). */
  def list(name: String): Seq[String] =
    apply(name).split(",").map(_.trim).filter(_.nonEmpty).toSeq
}

/** @param variables declared variables with their default values
  * @param valueSets per-environment overrides, each a SUBSET of the
  *                  declared variables (validated at construction) */
final case class VariableLibrary(
    variables: Map[String, String],
    valueSets: Map[String, Map[String, String]] = Map.empty) {
  valueSets.foreach { case (set, overrides) =>
    val undeclared = overrides.keySet -- variables.keySet
    require(undeclared.isEmpty, s"value set '$set' overrides undeclared " +
      s"variables: ${undeclared.toSeq.sorted.mkString(", ")}")
  }
  require(!valueSets.contains("Default"),
    "'Default' is the declarations themselves, not an override set")

  /** The declarations with no overrides applied (the reference's
    * active-set default). */
  def default: ResolvedVariables = ResolvedVariables("Default", variables)

  /** Defaults with `set`'s overrides applied; unknown set names throw
    * (deploying against a value set that doesn't exist is a config
    * bug, not an empty override). */
  def resolve(set: String): ResolvedVariables =
    if (set == "Default") default
    else ResolvedVariables(set, variables ++ valueSets.getOrElse(set,
      throw new NoSuchElementException(s"no value set named '$set'")))
}

object VariableLibrary {

  /** Build a library from the JSON wire shape the reference deploys
    * (`variables.json` declares `{"variables": [{"name": …,
    * "value": …}, …]}`; each value-set file carries `{"name": …,
    * "variableOverrides": [{"name": …, "value": …}, …]}`) — so a repo
    * of checked-in environment files loads without hand-translation.
    * Values of any JSON scalar type flatten to their text form (the
    * typed accessors on [[ResolvedVariables]] re-interpret at use);
    * the same construction-time validation applies, so an override of
    * an undeclared variable fails at LOAD, not at 2 a.m. in Prod.
    * Parsing rides Spark's bundled Jackson — no new dependency. */
  def fromJson(variablesJson: String,
               valueSetJsons: Seq[String] = Nil): VariableLibrary = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def entries(node: com.fasterxml.jackson.databind.JsonNode,
                field: String, src: String): Map[String, String] = {
      val arr = node.get(field)
      require(arr != null && arr.isArray, s"$src: missing '$field' array")
      import scala.jdk.CollectionConverters._
      arr.elements().asScala.map { e =>
        val n = e.get("name"); val v = e.get("value")
        require(n != null && n.isTextual, s"$src: entry without a name")
        require(v != null && !v.isNull,
          s"$src: variable '${n.asText}' has no value")
        // Jackson's asText on an object/array node returns "" — a
        // malformed nested value would load as empty string instead of
        // failing at load, breaking the fail-fast contract.
        require(v.isValueNode,
          s"$src: variable '${n.asText}' has a non-scalar value")
        n.asText -> v.asText
      }.toMap
    }
    val vars = entries(om.readTree(variablesJson), "variables",
      "variables.json")
    val sets = valueSetJsons.map { s =>
      val node = om.readTree(s)
      val name = node.get("name")
      require(name != null && name.isTextual, "value set without a name")
      name.asText -> entries(node, "variableOverrides",
        s"value set '${name.asText}'")
    }.toMap
    VariableLibrary(vars, sets)
  }
}
