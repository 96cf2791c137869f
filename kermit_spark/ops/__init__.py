"""Training-data pipeline operators over crawled document corpora.

The crawl engine's output (interleaved text+media documents) feeds LLM
training pipelines; these modules provide the standard corpus-hygiene and
retrieval operators at the same Spark-first standard as the crawl core:
JVM-side expressions where possible, Arrow-batched pandas UDFs where not,
never per-row Python.

  dedup       exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine,
              benchmark decontamination (long-n-gram containment)
  graph       BFS depths, connected components (near-dup cluster
              canonicalization), integer fixed-point PageRank
  sample      deterministic curation sampling (portable-hash Bernoulli,
              stratified top-k)
  similarity  brute-force cosine top-k; LSH-bucketed and IVF ANN
  text        language-ID, quality scoring, token counting, fingerprinting
  media       multimodal (image/audio/video) column plumbing with stubbed
              codecs (no codec libs in this sandbox)
"""
