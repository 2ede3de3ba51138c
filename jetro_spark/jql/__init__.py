"""JQL — the jetro expression language on Spark.

Pipeline: source text → lexer → recursive-descent parser (mirrors the
reference PEG, jetro-core/src/grammar.pest) → AST (mirrors
jetro-core/src/parse/ast.rs) → compiler → PySpark Column / DataFrame.

Two execution modes share the compiler (SURVEY.md §7.1):
- document mode: expressions over one JSON document compile to Column
  expressions using higher-order functions (array<struct> pipelines);
- relational mode: a pipeline rooted at a registered table compiles to
  DataFrame transformations (filter→where, map→select, group_by→groupBy,
  sort.take→orderBy.limit …) and inherits Spark's distributed execution.
"""

from jetro_spark.jql.parser import parse

__all__ = ["parse"]
