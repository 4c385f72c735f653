package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only bridge to the private[sql] step a real session performs
  * at build time: applying an extensions object's injected functions
  * to a function registry. Lets the spec verify the injection without
  * constructing a second SparkSession (the suite shares one). */
object ExtensionsTestBridge {
  def applyFunctions(ext: SparkSessionExtensions,
                     reg: FunctionRegistry): FunctionRegistry =
    ext.registerFunctions(reg)
}
