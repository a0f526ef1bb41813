from mspr2_back_spark.plans.extensions import EXTENSION_QUERIES
from mspr2_back_spark.plans.extensions_oracle import EXTENSION_ORACLE_SQL
from mspr2_back_spark.plans.oracle import ORACLE_SQL as _RELATIONAL_SQL
from mspr2_back_spark.plans.pipeline_oracle import PIPELINE_ORACLE_SQL
from mspr2_back_spark.plans.pipeline_queries import PIPELINE_QUERIES
from mspr2_back_spark.plans.queries import QUERIES as _RELATIONAL_QUERIES

QUERIES = {**_RELATIONAL_QUERIES, **PIPELINE_QUERIES, **EXTENSION_QUERIES}
ORACLE_SQL = {**_RELATIONAL_SQL, **PIPELINE_ORACLE_SQL, **EXTENSION_ORACLE_SQL}

__all__ = ["QUERIES", "ORACLE_SQL"]
