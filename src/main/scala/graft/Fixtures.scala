package graft

import java.sql.Timestamp

/** Case-class views of the fixture tables (FIXTURES.md §A) for the typed
  * Dataset API surface (reference DataSet<T> operators, SURVEY §2.1). */
object Fixtures {
  case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
                      l_linenumber: Int, l_quantity: Double,
                      l_extendedprice: Double, l_discount: Double,
                      l_tax: Double, l_returnflag: String,
                      l_linestatus: String, l_shipdate: Timestamp)
  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                   o_totalprice: Double, o_orderdate: Timestamp,
                   o_orderpriority: String)
  case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
                      c_acctbal: Double, c_mktsegment: String)
  case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)
}
