"""SQL planning layer: statement routing above Catalyst (SURVEY.md §3-4).

``frontend.Engine`` is the user-facing SQL session — the role the Flink
SQL client plays in the reference (Readme.md:38-46). Our layer resolves
table names / DDL / system-table syntax and delegates every relational
expression to Spark SQL (Catalyst owns parse → optimize → execute).
"""

from advent_of_code_flink_paimon_spark.plans.frontend import Engine, StatementResult

__all__ = ["Engine", "StatementResult"]
