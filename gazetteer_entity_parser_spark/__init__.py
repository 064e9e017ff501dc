"""gazetteer_entity_parser_spark — a PySpark-native knowledge-graph
construction engine whose entity-linking core re-expresses
snipsco/gazetteer-entity-parser (reference at /root/reference, Rust) as a
broadcast inverted index + Arrow-batched ``mapInPandas`` matching stage.

Layout:
- ``kernel/``     Spark-free matching kernel (tokenizer, registry, parser)
- ``sources/``    gazetteer/doc readers, distributed index build, persistence
- ``operators/``  extraction, triples, dedup, similarity, text analysis
- ``plans/``      end-to-end pipeline assembly, checkpoints, lineage
- ``functions/``  reusable pyspark column expressions
- ``streaming/``  Structured Streaming variant of the pipeline
"""

__version__ = "0.1.0"
