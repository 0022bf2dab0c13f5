package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII pseudonymization.
  *
  * Re-expresses the reference's salted hash
  * (fabric/claims/silver/NBclaims_silver.Notebook/notebook-content.py:160-166:
  * `sha2(concat(col(id), lit(pii_salt)), 256)`). Map-only and
  * codegen'd — scale free. The salt is a deploy-time secret; tests use
  * a fixed value.
  */
object Pii {
  def saltedSha256(c: Column, salt: String): Column =
    sha2(concat(c.cast("string"), lit(salt)), 256)
}
