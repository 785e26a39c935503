"""llmaix_spark — PySpark-native knowledge-graph construction pipeline.

A from-scratch rebuild (NOT a port) of the data-processing capabilities of
KatherLab/LLMAIx, recast per BASELINE.json as a transcript-to-triples
KG factory: stable turn ordering → vectorized extraction (mapInPandas,
micro-batched, grammar/JSON-schema-constrained) → tolerant JSON repair →
entity linking (MinHash-LSH blocking + similarity scoring) →
canonicalization (salted iterative connected components) → partitioned
nodes/edges materialization with per-partition lineage and exact resume.

Everything is DataFrame-API first; Python appears only inside Arrow-batched
pandas UDFs (the LLM-call harness and the char-level metric kernel).
"""

__version__ = "0.1.0"
