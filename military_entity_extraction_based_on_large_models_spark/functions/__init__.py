"""Scalar-function surface: text analysis, box geometry (IoU), vector math.

Everything here is built from pyspark.sql.functions column expressions — JVM
whole-stage-codegen territory, no Python UDFs — per the reference's scalar
surface catalogued in SURVEY.md §2.8.
"""
