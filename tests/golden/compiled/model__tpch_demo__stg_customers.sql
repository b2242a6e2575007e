select c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment as segment
from `tpch_raw`.`customer`
