"""etl_jlp_spark — PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference ETL platform
(Tramnddle/ETL-Japanese-Learning-Platform, ``dwh_lab/``): medallion
ingest (full + watermark-incremental), the browsing-history
preprocessing chain (dedup, time-windowing, keyword extraction,
sessionization, time-on-page), data-quality reporting, plus an
LLM-training-data operator suite (dedup families, similarity search,
text analysis, multimodal column plumbing).

Everything is declared through the DataFrame/SQL API so Catalyst picks
the physical plan; Python UDFs are avoided in all hot paths.
"""

from etl_jlp_spark.session import get_spark
from etl_jlp_spark.catalog import load_tables

__all__ = ["get_spark", "load_tables"]
__version__ = "0.1.0"
