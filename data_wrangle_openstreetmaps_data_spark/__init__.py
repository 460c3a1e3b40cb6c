"""data_wrangle_openstreetmaps_data_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference project
``hominid101/data-wrangle-openstreetmaps-data`` (an OSM XML audit / clean /
reshape / query pipeline; see ``/root/reference/openstreet_kolkata.py``),
plus the large-scale training-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal plumbing) described in SURVEY.md §2.7.

Design principles (SURVEY.md §7):
- DataFrame/SQL first: every reference operator is a native column
  expression or built-in aggregation; Catalyst does the optimizing.
- No driver-side accumulation: audits return DataFrames, not dicts.
- Small lookup tables are broadcast joins or constant-folded ``when`` chains.
- Deterministic outputs: explicit sort tiebreaks on every top-k, sorted
  joins of collect_set results, decimal-exact money sums.
"""

__version__ = "0.1.0"

from data_wrangle_openstreetmaps_data_spark.session import get_spark  # noqa: F401
from data_wrangle_openstreetmaps_data_spark.catalog import TABLES, load_tables  # noqa: F401
