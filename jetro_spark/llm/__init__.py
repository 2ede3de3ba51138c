"""Large-scale training-data pipeline operators (brief extension beyond
the reference surface): dedup, similarity search, text analysis,
multimodal columns. All hot paths are built-in Column expressions
(JVM-side, whole-stage codegen); Python appears only in the multimodal
decode stubs via Arrow-batched mapInPandas."""
