"""snowball_java_ray — a from-scratch Ray-Data-native inverted-index +
BM25 query engine serving the workload of davidsbatista/Snowball-Java.

NOT a port: the reference (`/root/reference/snowball/`) is a
single-threaded JVM batch program; this engine re-expresses its
computations (document-frequency statistics, TF-IDF context vectors,
bootstrapped relation extraction) plus a full inverted-index build and
BM25 top-k query path as idiomatic Ray Data pipelines:
``ray.data.Dataset`` -> ``map_batches`` over zero-copy Arrow batches,
actor pools for stateful stages, ``groupby`` shuffles for the wide
steps, streaming execution end-to-end.

Layout
------
- ``constants``   shared vocabulary: tokenizer regexes, stopwords,
                  BM25 parameters, the reference query set. The DuckDB
                  oracle SQL in ``sqlgen`` is generated from the SAME
                  constants so engine and oracle can never drift.
- ``functions``   pure vectorized kernels (tokenize, sha256, varbyte
                  codec, sparse-vector math).
- ``sources``     corpus synthesis + corpus readers.
- ``stages``      map_batches stages (tokenize, index encode, BM25
                  scorer actors, entity-pair extraction, TF-IDF).
- ``ops``         large-scale training-data operators (dedup families,
                  ANN search, text analysis, multimodal plumbing).
- ``pipelines``   end-to-end phase-chained pipelines (index build,
                  query serving, the Snowball bootstrap loop).
- ``state``       driver-side stateful pieces (single-pass clustering,
                  checkpoint manifests).
- ``oracle``      pure-Python single-process exact reference
                  implementation used by the pytest conformance gate.
"""

__version__ = "0.1.0"
