"""Training-data pipeline operators over crawled document corpora.

The crawl engine's output (interleaved text+media documents) feeds LLM
training pipelines; these modules provide the standard corpus-hygiene and
retrieval operators at the same Spark-first standard as the crawl core:
JVM-side expressions where possible, Arrow-batched pandas UDFs where not,
never per-row Python.

  dedup       exact, MinHash+LSH (batch, persisted-index incremental, and
              streaming), SimHash, n-gram Jaccard, embedding-cosine,
              benchmark decontamination (long-n-gram containment)
  graph       BFS depths, connected components (near-dup cluster
              canonicalization), integer fixed-point PageRank / HITS /
              OPIC / TrustRank
  sample      deterministic curation sampling (portable-hash Bernoulli,
              stratified top-k, token-budget quota mixing, temperature)
  similarity  brute-force cosine top-k; LSH-bucketed and IVF ANN (transient
              and persisted cell-partitioned index); SemDeDup
  sketch      mergeable Count-Min frequency grid + HyperLogLog registers
              (portable md5 family, bit-identical contents)
  text        language-ID, script profiling/mojibake, quality scoring
              (Gopher, CCNet, unigram/bigram LM, DSIR, BM25, TF-IDF),
              token counting, BPE train/encode, fingerprinting, PII
              redaction, chunking/packing
  dust        DUST irrelevant-URL-parameter mining + canonicalization
  media       multimodal (image/audio/video) column plumbing with stubbed
              codecs (no codec libs in this sandbox); interleaved span
              packing / quality / boilerplate / span-level dedup
"""
