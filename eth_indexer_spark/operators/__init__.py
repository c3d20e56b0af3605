"""Reusable relational operators the engine adds on top of built-in Spark.

Each operator is a pure DataFrame→DataFrame function, expressed with built-in
Catalyst operators wherever semantics allow (UDF-free hot paths), so plans
stay inside whole-stage codegen and scale with partitioning.
"""
