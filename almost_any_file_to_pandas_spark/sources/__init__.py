"""File-format sources.

Native Spark readers cover parquet/JSON/delimited text; xlsx and
SpreadsheetML XML are custom Python DataSources (Spark 4 DataSource
API) partitioned by sheet; pickle and PDF are driver-side bridges
(pickle is an inherently single-blob format; PDF requires tabula-java,
gated behind an import-try).
"""
