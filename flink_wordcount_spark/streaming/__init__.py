"""Structured Streaming surface — reference-parity streaming word count.

Reference pipeline (SURVEY §2.1, /root/reference/src/main/java/flinkwordcount/):
``RateControlledSourceFunction -> rebalance -> Tokenizer -> keyBy(word) ->
CountWords (stateful running count) -> DummyLatencyCountingSink``.

Spark re-expression:
- ``sentences``: rate-controlled seeded sentence generator (rate-micro-batch
  source or deterministic file replay) with the reference's sample-timestamp
  and skew knobs.
- ``wordcount``: tokenizer + stateful count pipelines (update/complete modes,
  plus transformWithStateInPandas emit-on-sample parity).
- ``metrics``: StreamingQueryListener + foreachBatch latency capture matching
  the reference's LATENCY/THROUGHPUT log schema.
"""
