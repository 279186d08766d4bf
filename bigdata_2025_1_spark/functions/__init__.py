"""Reusable column-expression builders (pure ``pyspark.sql.functions``
compositions — JVM-side, whole-stage-codegen friendly) plus the one
sanctioned pandas-UDF surface (HTML→markdown)."""
