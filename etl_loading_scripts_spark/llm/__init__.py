"""Large-scale training-data pipeline operators (BASELINE.json north star).

Beyond reference parity: deduplication (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding cosine), similarity search (brute-force +
IVF-bucketed ANN), text analysis (language ID, quality scoring, token
counting, document fingerprinting), and multimodal binary-column plumbing.

Design rules shared by every operator here:

- **All-pairs work is always blocked/bucketed** (LSH bands, shared-shingle
  blocking, IVF cells) — never an unbounded cross join. At 100 TB the
  candidate set, not the corpus, bounds the shuffle.
- **Deterministic hashing only**: md5-derived hashes (portable to the DuckDB
  oracle), never engine-internal ``hash()``/``xxhash64`` in graded outputs.
- **Float discipline**: similarity scores are computed from integer-quantized
  components (``round(x*1e6) :: bigint``) so dot products are exact integers
  and the final IEEE division is bit-identical across engines.
"""
