"""mspr2_back_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference backend
(MSPRs-2024-2025-EPSI-B3-FS-C2-Gx/MSPR2-Back, surveyed in SURVEY.md):
batch ETL (star schema, lag-diff facts, explode), a serving query
surface (aggregations, joins, window functions, top-k, pagination),
and an ML forecast layer — plus the large-scale training-data-pipeline
operators (deduplication, similarity search, text analysis, multimodal
plumbing) that a 100 TB corpus engine needs.

Everything relational is declared with the DataFrame/SQL API so
Catalyst owns the physical plan (pushdown, pruning, broadcast,
partial aggregation, AQE). Python appears only behind Arrow-batched
Pandas UDFs where set semantics genuinely run out.
"""

__version__ = "0.1.0"
