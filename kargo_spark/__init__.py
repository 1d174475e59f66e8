"""kargo_spark — a from-scratch, PySpark-native knowledge-graph construction engine.

Re-expresses the capabilities of the reference pipeline (yoseflaw/KArgo,
/root/reference) Spark-first: every stage is a ``DataFrame -> DataFrame``
function with an explicit schema; heavy per-row work runs in vectorized
pandas/Arrow UDFs (``mapInPandas`` / ``applyInPandas`` / scalar-iterator
``pandas_udf``); all relational work (dedup, joins, document frequency,
windows, top-k) is plain ``pyspark.sql`` so Catalyst handles pushdown,
pruning, broadcast and AQE.

Stage DAG (SURVEY.md §7):

    documents -> docs_clean -> sentences -> tokens -> candidates
      -> df_counts -> term_scores -> terms_topk -> mentions -> pairs
      -> pair_vectors -> clusters -> triples (+ entities, links) -> metrics

No code is copied from the reference — it is cited by ``file:line`` in
docstrings for semantic parity only.
"""

__version__ = "0.1.0"
