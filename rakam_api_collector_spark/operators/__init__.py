"""Scale-path operators for large training-data pipelines.

These go beyond the reference's ingestion surface (SURVEY.md §2) — they
are the operators a 100 TB text/embedding/multimodal corpus pipeline
needs: deduplication across every modality (exact / MinHash-LSH /
SimHash / n-gram Jaccard / embedding-cosine / duplicate-substring for
text, DCT pHash for images and frame-sampled video, Haitsma-Kalker
fingerprints for audio), similarity search (exact, LSH, IVF, IVF-PQ
with persisted cell-partitioned indexes and incremental append), text
analysis and curation (Gopher rules, boilerplate removal, PII scrub,
HTML→text extraction), tokenizer induction (BPE, unigram-LM), audio
feature extraction (log-mel spectrograms), and multimodal column
plumbing over real PNG/JPEG/WAV/MP4/MKV codecs. All are pure
DataFrame compositions or Arrow-batched pandas operators; nothing
collects to the driver unbounded.
"""
