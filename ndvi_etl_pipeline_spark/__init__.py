"""ndvi_etl_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference NDVI ETL pipeline (KofiAdu/ndvi-etl-pipeline):
scene catalogs, raster band math, spatial clips, masked aggregation,
overview pyramids, upsert sinks — plus the large-scale training-data
operators a 100 TB pipeline needs (dedup, similarity search, text
analysis, multimodal column plumbing).

Design stance (SURVEY.md §7): DataFrames as the universal IR, native
column expressions wherever possible (Catalyst codegen), vectorized
pandas UDFs only for genuinely custom kernels (geometry, raster codec),
no RDDs, no custom Catalyst rules.
"""

__version__ = "0.1.0"
