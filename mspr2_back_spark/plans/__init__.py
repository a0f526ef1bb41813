from mspr2_back_spark.plans.queries import QUERIES
from mspr2_back_spark.plans.oracle import ORACLE_SQL

__all__ = ["QUERIES", "ORACLE_SQL"]
