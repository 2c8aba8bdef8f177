package graft.sources

import org.apache.spark.sql.types._

/** Explicit StructTypes for the K8s snapshot tables (SURVEY §1.6,
  * FIXTURES.md §A). The reference declares decorative schemas and stores
  * raw JSON objects (`/root/reference/ksql.js:130-135,215-216`); we model
  * the commonly-queried subset as typed structs/maps — deterministic,
  * testable, prunable — and keep the full raw JSON text as an escape
  * hatch column (`_raw`) for fields outside the modeled schema
  * (queryable via get_json_object / variant).
  */
object K8sSchemas {

  val metadata: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("namespace", StringType),
    StructField("uid", StringType),
    StructField("creationTimestamp", StringType),
    StructField("labels", MapType(StringType, StringType)),
    StructField("annotations", MapType(StringType, StringType))))

  /** v1 Pod modeled subset (flatten inputs at ksql.js:202-211). */
  val pod: StructType = StructType(Seq(
    StructField("metadata", metadata),
    StructField("spec", StructType(Seq(
      StructField("nodeName", StringType),
      StructField("containers", ArrayType(StructType(Seq(
        StructField("name", StringType),
        StructField("image", StringType)))))))),
    StructField("status", StructType(Seq(
      StructField("phase", StringType),
      StructField("containerStatuses", ArrayType(StructType(Seq(
        StructField("name", StringType),
        StructField("restartCount", IntegerType),
        StructField("ready", BooleanType))))))))))

  /** v1 Node modeled subset (generic_load at ksql.js:223-239). */
  val node: StructType = StructType(Seq(
    StructField("metadata", metadata),
    StructField("spec", StructType(Seq(
      StructField("podCIDR", StringType),
      StructField("unschedulable", BooleanType)))),
    StructField("status", StructType(Seq(
      StructField("capacity", MapType(StringType, StringType)),
      StructField("allocatable", MapType(StringType, StringType)),
      StructField("conditions", ArrayType(StructType(Seq(
        StructField("type", StringType),
        StructField("status", StringType))))),
      StructField("nodeInfo", StructType(Seq(
        StructField("kubeletVersion", StringType),
        StructField("osImage", StringType)))))))))

  /** v1 Service modeled subset. */
  val service: StructType = StructType(Seq(
    StructField("metadata", metadata),
    StructField("spec", StructType(Seq(
      StructField("type", StringType),
      StructField("clusterIP", StringType),
      StructField("selector", MapType(StringType, StringType)),
      StructField("ports", ArrayType(StructType(Seq(
        StructField("name", StringType),
        StructField("port", IntegerType),
        StructField("targetPort", StringType),
        StructField("protocol", StringType)))))))),
    StructField("status", StructType(Seq(
      StructField("loadBalancer", StructType(Seq(
        StructField("ingress", ArrayType(StructType(Seq(
          StructField("ip", StringType)))))))))))))
}
